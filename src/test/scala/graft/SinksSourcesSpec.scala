package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{MartPipeline, ParquetSink}
import graft.sources.Ingest

/** Mart pipeline (SURVEY.md §2.11) and source/sink surface (§2.1). */
class SinksSourcesSpec extends AnyFunSuite with SparkTestSession {

  test("line-protocol V2 connector round-trips, prunes columns, pushes tag filters") {
    import graft.sources.LineProtocolSource
    import graft.streaming.StreamPipeline.lineProtocol
    val dir = java.nio.file.Files.createTempDirectory("lp_spec")
    def put(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        String.join("\n", lines: _*).getBytes)
    put("batch0.lp", Seq(
      lineProtocol("transactions", "error", 1L, 5.5, 1704103200000000L),
      lineProtocol("transactions", "click", 2L, 1.0, 1704103260000000L),
      "garbage line that must be skipped"))
    put("batch1.lp", Seq(
      lineProtocol("transactions", "error", 3L, 7.25, 1704103320000000L)))
    val fmt = classOf[LineProtocolSource].getName
    val df = spark.read.format(fmt).load(dir.toString)
    // one partition per file; malformed lines dropped, values round-trip
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.orderBy("event_id").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getDouble(3)).toSeq == Seq(5.5, 1.0, 7.25))
    // ns on the wire → micros in TimestampType, exactly
    assert(rows.head.getTimestamp(4).getTime == 1704103200000L)
    // column pruning reaches the scan: the leaf outputs only 2 columns
    val pruned = spark.read.format(fmt).load(dir.toString)
      .select("event_id", "value")
    val leaf = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name) == Seq("event_id", "value"), leaf.output)
    // tag-equality pushdown filters before row materialization; a
    // non-pushable predicate still applies as the residual
    val errs = spark.read.format(fmt).load(dir.toString)
      .filter(col("type_tag") === "error").filter(col("value") > 6.0)
    assert(errs.collect().map(_.getLong(2)).toSeq == Seq(3L))
  }

  test("mart pipeline writes six tables and the mart reconciles with level 1") {
    val tmp = java.nio.file.Files.createTempDirectory("mart_spec").toString
    val sink = new ParquetSink(tmp)
    val mart = MartPipeline.run(spark, Sf, sink).cache()
    for (t <- Seq("class_distribution", "hourly_transactions",
        "amount_analysis", "fraud_details", "global_stats",
        "grafana_dashboard"))
      assert(sink.read(spark, t).count() > 0, s"table $t empty")
    // mart totals must equal the hourly table re-aggregated
    val hourly = sink.read(spark, "hourly_transactions")
    assert(mart.agg(sum("total_tx")).head.getLong(0)
      == hourly.agg(sum("n_tx")).head.getLong(0))
    assert(mart.agg(sum("active_hours")).head.getLong(0) == hourly.count())
    // guarded percentage stays in [0, 100]
    val pcts = mart.select("fraud_pct").collect().map(_.getDouble(0))
    assert(pcts.forall(p => p >= 0.0 && p <= 100.0))
  }

  test("CSV round-trip: coalesce(1) header export re-reads identically") {
    val df = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber").limit(100)
    val tmp = java.nio.file.Files.createTempDirectory("csv_spec").toString + "/out"
    Ingest.writeCsvSingle(df, tmp)
    val files = new java.io.File(tmp).listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "coalesce(1) must produce a single csv")
    val inferred = Ingest.readCsvInfer(spark, tmp)
    assert(inferred.count() == 100)
    assert(inferred.schema("l_orderkey").dataType == IntegerType
      || inferred.schema("l_orderkey").dataType == LongType)
    assert(inferred.schema("l_extendedprice").dataType == DoubleType)
    val explicitSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_extendedprice", DoubleType), StructField("l_returnflag", StringType)))
    val explicitDf = Ingest.readCsv(spark, tmp, explicitSchema)
    assert(explicitDf.agg(sum("l_extendedprice")).head.getDouble(0)
      == df.agg(sum("l_extendedprice")).head.getDouble(0))
  }

  test("ORC round-trip preserves rows, schema, and pushes filters to the scan") {
    val df = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
    val tmp = java.nio.file.Files.createTempDirectory("orc_spec").toString + "/out"
    Ingest.writeOrc(df, tmp)
    val back = Ingest.readOrc(spark, tmp)
    assert(back.schema == df.schema, "ORC must round-trip the exact schema")
    assert(back.count() == df.count())
    assert(back.agg(sum("l_extendedprice")).head.getDouble(0)
      == df.agg(sum("l_extendedprice")).head.getDouble(0))
    // the same scan-side levers as parquet: pushed filters + pruned columns
    val plan = back.filter(col("l_returnflag") === "R")
      .select("l_orderkey").queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      plan.linesIterator.take(12).mkString("\n"))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_returnflag:string>"))
  }

  test("JSON-lines round-trip with explicit schema prunes the parsed fields") {
    val df = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
    val tmp = java.nio.file.Files.createTempDirectory("json_spec").toString + "/out"
    Ingest.writeJsonLines(df, tmp)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_extendedprice", DoubleType), StructField("l_returnflag", StringType)))
    val back = Ingest.readJsonLines(spark, schema, tmp)
    assert(back.count() == df.count())
    assert(back.agg(sum("l_extendedprice")).head.getDouble(0)
      == df.agg(sum("l_extendedprice")).head.getDouble(0),
      "doubles must survive the JSON round-trip exactly")
    // column pruning reaches the JSON parser: a 2-column projection reads
    // a 2-field schema, not all four
    val plan = back.filter(col("l_returnflag") === "R")
      .select("l_orderkey").queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_returnflag:string>"),
      plan.linesIterator.take(12).mkString("\n"))
  }

  test("partitionBy layout prunes partitions at read time") {
    val tmp = java.nio.file.Files.createTempDirectory("part_spec").toString + "/ev"
    val df = Tables.events(spark, Sf)
      .withColumn("day", to_date(col("ts")))
    Ingest.writePartitioned(df, tmp, "day")
    val days = new java.io.File(tmp).listFiles
      .filter(_.getName.startsWith("day=")).map(_.getName)
    assert(days.length > 1, "multiple day directories expected")
    val oneDay = days.sorted.head.stripPrefix("day=")
    val q = spark.read.parquet(tmp).filter(col("day") === lit(oneDay))
    q.count()
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString()
    assert(scan.contains("PartitionFilters") && scan.contains("day"), scan.take(500))
    // pruned read touches exactly the one directory's rows
    val expected = df.filter(col("day") === lit(oneDay)).count()
    assert(q.count() == expected)
  }

  test("observed write collects exact metrics in the write pass itself") {
    val tmp = java.nio.file.Files.createTempDirectory("obs_spec").toString + "/li"
    val df = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_extendedprice")
    val m = Ingest.writeObserved(df, tmp, "l_orderkey", "l_extendedprice")
    assert(m("n_rows") == df.count())
    assert(m("null_keys") == 0L)
    val recount = df.agg(sum(col("l_extendedprice").cast("decimal(28,4)"))
      .cast("double")).head.getDouble(0)
    assert(m("value_total") == recount, "metrics must equal a recount")
    // and the write itself landed intact
    assert(spark.read.parquet(tmp).count() == df.count())
  }

  test("dynamic partition overwrite backfills one day without touching the others") {
    val tmp = java.nio.file.Files.createTempDirectory("backfill_spec").toString + "/ev"
    val df = Tables.events(spark, Sf)
      .withColumn("day", to_date(col("ts")))
      .select("event_id", "user_id", "value", "day")
    Ingest.writePartitioned(df, tmp, "day")
    val days = df.select("day").distinct().collect().map(_.getDate(0)).sorted
    assert(days.length > 1)
    val target = days.head
    val before = spark.read.parquet(tmp)
    val otherCountBefore = before.filter(col("day") =!= lit(target)).count()
    // backfill: re-run the target day only, with corrected values
    val corrected = df.filter(col("day") === lit(target))
      .withColumn("value", coalesce(col("value"), lit(0.0)) + 1000.0)
    Ingest.backfillPartition(corrected, tmp, "day")
    val after = spark.read.parquet(tmp)
    // untouched partitions: identical row count and content
    assert(after.filter(col("day") =!= lit(target)).count() == otherCountBefore)
    // target partition: fully replaced by the corrected frame
    val vals = after.filter(col("day") === lit(target)).select("value")
    assert(vals.count() == corrected.count())
    assert(vals.agg(min("value")).head.getDouble(0) >= 1000.0,
      "backfilled day must contain only corrected rows")
  }

  test("mergeSchema reads additive schema evolution with NULL backfill") {
    val tmp = java.nio.file.Files.createTempDirectory("evolve_spec").toString + "/t"
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.mode("overwrite").parquet(tmp)
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(tmp)
    val merged = Ingest.readParquetMerged(spark, tmp)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    assert(merged.count() == 4)
    // rows from the pre-evolution batch surface v2 as NULL
    assert(merged.filter(col("v2").isNull).count() == 2)
    assert(merged.filter(col("v2").isNotNull).count() == 2)
  }

  test("compaction rewrites a fragmented table into the computed file count") {
    val base = java.nio.file.Files.createTempDirectory("compact_spec").toString
    // fragment: 64 tiny files
    Tables.lineitem(spark, Sf).repartition(64)
      .write.mode("overwrite").parquet(s"$base/frag")
    val fragFiles = new java.io.File(s"$base/frag").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 64)
    Ingest.compact(spark, s"$base/frag", s"$base/compact")
    val outFiles = new java.io.File(s"$base/compact").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles < 8, s"compacted to $outFiles files")
    assert(spark.read.parquet(s"$base/compact").count() ==
      Tables.lineitem(spark, Sf).count())
  }

  test("stratified sample keeps all fraud, downsamples majority ~20%") {
    val byClass = Tables.lineitem(spark, Sf)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Ingest.x02StratifiedSample(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("R") == byClass("R"), "fraction 1.0 keeps every fraud row")
    for (c <- Seq("A", "N")) {
      val frac = sampled(c).toDouble / byClass(c)
      assert(frac > 0.1 && frac < 0.3, s"$c sampled at $frac")
    }
  }

  test("unionByName aligns evolved schemas by NAME, missing columns null") {
    val v1 = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_extendedprice").limit(5)
    val v2 = Tables.lineitem(spark, Sf)
      .select(col("l_extendedprice"), col("l_orderkey"), // reordered
        col("l_quantity")) // new column in schema v2
      .limit(5)
    val merged = v1.unionByName(v2, allowMissingColumns = true)
    assert(merged.count() == 10)
    // positional union would have mangled orderkey/price; by-name must not
    assert(merged.filter(col("l_extendedprice") < 100).count() == 0)
    assert(merged.filter(col("l_quantity").isNull).count() == 5)
  }

  test("synthetic generator: seeded shape, bounded values, type partition") {
    val df = Ingest.syntheticTransactions(spark, 1000).cache()
    assert(df.count() == 1000)
    val amounts = df.agg(min("amount"), max("amount")).head()
    assert(amounts.getDouble(0) >= 0.0 && amounts.getDouble(1) <= 1000.0)
    val types = df.select("transaction_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(types == Set("purchase", "transfer", "withdrawal"))
    assert(df.filter(col("is_fraud") =!= (col("fraud_probability") > 0.85)).count() == 0)
  }
}
