package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WeightedMeanAgg
import graft.sources.Ingest

/** Typed Aggregator surface + quarantine-mode ingest. */
class TypedAggSpec extends AnyFunSuite with SparkTestSession {

  test("WeightedMeanAgg: typed column, SQL function, matches expression form") {
    import spark.implicits._
    import org.apache.spark.sql.Encoders
    val ds = spark.createDataset(Seq[(java.lang.Double, java.lang.Long)](
      (2.0, 1L), (4.0, 3L), (0.0, 0L), (null, 5L)))( // null row is SKIPPED
      Encoders.tuple(Encoders.DOUBLE, Encoders.LONG))
    val typed = ds.select(new WeightedMeanAgg().toColumn).head()
    assert(math.abs(typed - 14.0 / 4) < 1e-12)
    WeightedMeanAgg.register(spark)
    ds.toDF("v", "w").createOrReplaceTempView("wm_t")
    val viaSql = spark.sql("SELECT weighted_mean(v, w) FROM wm_t").head().getDouble(0)
    assert(viaSql == typed)
    // against the expression spelling on real data
    val media = operators.Multimodal.mm02MediaFeatures(spark, Sf)
      .select(col("media_type"), col("mean_byte").as("v"), col("byte_len").as("w"))
    media.createOrReplaceTempView("wm_media")
    val agg = spark.sql(
      """SELECT media_type, weighted_mean(v, w) AS wm FROM wm_media GROUP BY 1""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expr = media.groupBy("media_type")
      .agg((sum(col("v") * col("w")) / sum(col("w"))).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    agg.foreach { case (k, v) => assert(math.abs(v - expr(k)) < 1e-6, k) }
  }

  test("PERMISSIVE ingest quarantines malformed rows instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("perm_csv")
    java.nio.file.Files.writeString(dir.resolve("data.csv"),
      "id,amount\n1,10.5\n2,not_a_number\n3,30.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType)))
    val df = Ingest.readCsvPermissive(spark, dir.toString, schema).cache()
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
    assert(df.filter(col("_corrupt_record").isNull)
      .agg(sum("amount")).head.getDouble(0) == 40.75)
  }
}
