package graft

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.CreditCard

/** Golden-output pipeline tests (SURVEY.md §5.2) on the Kaggle-shaped
  * fixture (FIXTURES.md §A): the reference's four notebooks replayed
  * end-to-end — ingest/profile/assemble/split (1_data_cleaning), SQL
  * analytics (2_sql_analysis), GBT train/eval (3_ml_fraud), co-occurrence
  * graph (4_graphx) — asserting the invariants the reference's executed
  * outputs pin (counts, null audit, index-29 Amount extraction, split
  * determinism, AUC above chance on a signal-bearing fixture, edge
  * existence and symmetry, CC grouping).
  */
class GoldenPipelineSpec extends AnyFunSuite with SparkTestSession {

  private lazy val cc: DataFrame = CreditCard.df(spark).cache()

  test("1_data_cleaning: CSV ingest round-trip infers the golden schema") {
    val tmp = java.nio.file.Files.createTempDirectory("cc_csv").toString + "/cc"
    sources.Ingest.writeCsvSingle(cc, tmp)
    val back = sources.Ingest.readCsvInfer(spark, tmp)
    assert(back.count() == CreditCard.Rows)
    assert(back.schema("Time").dataType.typeName == "double")
    assert(back.schema("V13").dataType.typeName == "double")
    assert(back.schema("Amount").dataType.typeName == "double")
    assert(back.schema("Class").dataType.typeName == "integer")
    assert(back.columns.length == 31)
  }

  test("1_data_cleaning: profile goldens — counts, class split, null audit") {
    assert(cc.count() == CreditCard.Rows)
    val byClass = cc.groupBy("Class").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byClass(1) == CreditCard.FraudRows)
    assert(byClass(0) == CreditCard.Rows - CreditCard.FraudRows)
    // per-column null audit in one pass == 0 everywhere (reference golden)
    val audit = cc.select(cc.columns.toIndexedSeq.map(c =>
      sum(col(c).isNull.cast("int")).as(c)): _*).head()
    (0 until audit.length).foreach(i => assert(audit.getLong(i) == 0L))
    // describe() (A7) agrees with a direct aggregate
    val described = cc.describe("Amount").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val mean = cc.agg(avg("Amount")).head.getDouble(0)
    assert(math.abs(described("mean").toDouble - mean) < 1e-6)
    assert(described("count") == CreditCard.Rows.toString)
  }

  test("1_data_cleaning: assembler puts Amount at index 29; split is seeded") {
    val featureCols = Array("Time") ++ (1 to 28).map(i => s"V$i") :+ "Amount"
    val assembled = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
      .transform(cc)
      .withColumn("label", col("Class"))
    // the reference recovers Amount positionally: vector_to_array(...)[29]
    val mismatch = assembled
      .select(element_at(vector_to_array(col("features")), 30).as("a29"),
        col("Amount"))
      .filter(col("a29") =!= col("Amount")).count()
    assert(mismatch == 0)
    val Array(tr1, te1) = assembled.randomSplit(Array(0.8, 0.2), seed = 42)
    val Array(tr2, te2) = assembled.randomSplit(Array(0.8, 0.2), seed = 42)
    assert(tr1.count() + te1.count() == CreditCard.Rows)
    assert(tr1.count() == tr2.count() && te1.count() == te2.count())
    val ratio = tr1.count().toDouble / CreditCard.Rows
    assert(ratio > 0.7 && ratio < 0.9)
  }

  test("3_ml_fraud: GBT learns the planted signal (AUC above chance)") {
    val featureCols = Array("Time") ++ (1 to 28).map(i => s"V$i") :+ "Amount"
    val assembled = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("features")
      .transform(cc).withColumn("label", col("Class").cast("double"))
    val Array(train, test) = assembled.randomSplit(Array(0.8, 0.2), seed = 42)
    val model = new GBTClassifier().setMaxIter(5).setSeed(42)
      .fit(train.cache())
    val pred = model.transform(test).cache()
    val auc = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(pred)
    assert(auc > 0.6, s"AUC $auc not above chance on signal-bearing fixture")
    val confusion = pred.groupBy("label", "prediction").count()
    assert(confusion.agg(sum("count")).head.getLong(0) == test.count())
  }

  test("4_graphx: co-occurrence edges exist, are symmetric, and CC groups pairs") {
    // the reference's theta self-join on the fixture: both fraud, same hour
    // bucket, distinct V1 — idiomatic rewrite (pre-filter + hour column)
    val fraud = cc.filter(col("Class") === 1)
      .select((col("Time") / 3600).cast("int").as("hour"), col("V1"))
      .distinct().cache()
    val b = fraud.withColumnRenamed("V1", "V1b")
    val edges = fraud.join(b,
        fraud("hour") === b("hour") && fraud("V1") =!= b("V1b"))
      .select(col("V1").as("src"), col("V1b").as("dst"))
      .distinct().cache()
    assert(edges.count() >= 2, "generator must plant co-occurring fraud pairs")
    // symmetry: the != predicate produces both orientations
    val asym = edges.select(col("dst").as("src"), col("src").as("dst"))
      .except(edges).count()
    assert(asym == 0)
    // degrees: every connected vertex has degree >= 2 (in+out of a pair)
    val degrees = edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").count()
    assert(degrees.agg(min("count")).head.getLong(0) >= 2)
    // GraphX CC over double ids via a dictionary (reference stringifies;
    // GraphX needs Long — SURVEY §2.10 G1)
    val session = spark
    import session.implicits._
    val vids = edges.select(col("src").as("v")).unionAll(edges.select(col("dst")))
      .distinct().as[Double].rdd.zipWithIndex().collectAsMap()
    val edgeRdd = edges.as[(Double, Double)].rdd
      .map { case (a, bb) => Edge(vids(a): VertexId, vids(bb): VertexId, 1) }
    val g = Graph.fromEdges(edgeRdd, ())
    val comps = g.connectedComponents().vertices.map(_._2).distinct().count()
    assert(comps >= 1 && comps <= edges.count())
  }
}
