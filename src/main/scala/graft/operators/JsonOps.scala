package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Semi-structured (JSON string column) operators — the batch counterpart of
  * the streaming envelope parse (SURVEY.md §2.2 P8): `from_json` with an
  * explicit schema over `events.props`, then relational ops on the extracted
  * fields. Schema-on-read stays a narrow projection — the parse is
  * codegen'd, no shuffle until the final bounded aggregate.
  */
object JsonOps {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  /** j01 — parse + extract + bucket + aggregate: distribution of the
    * extracted `k` field in deciles, null-parse rows counted separately.
    *
    * Executed-plan audit (round 3, BENCH_r02's 7.4 s flagged as anomalous):
    * the plan is already the intended one — `ReadSchema: struct<props:string>`
    * (the events loader's ts normalization is fully pruned), from_json →
    * partial agg → one 11-group exchange → sort. Steady-state 0.4-0.6 s at
    * sf0.1 on local[32]; the 7.4 s was container I/O noise hitting both
    * best-of-2 runs (cold page cache on first documents/embeddings reads),
    * fixed harness-side: Bench now warms every table and takes best-of-3.
    */
  def j01JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      // `%` (remainder), NOT pmod: DuckDB's % is remainder-signed, so for a
      // negative k the two would bucket differently under pmod
      .withColumn("k_bucket",
        when(col("k").isNull, lit(-1L)).otherwise(col("k") - col("k") % lit(10L)))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("cnt"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("k_bucket")

  private val j01Sql =
    """SELECT CASE WHEN k IS NULL THEN -1
      |            ELSE k - (k % 10) END AS k_bucket,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_id,
      |        CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY 1 ORDER BY k_bucket""".stripMargin

  /** j02 — Spark 4 VARIANT path for the same extraction: `parse_json`
    * builds the binary variant encoding ONCE, `variant_get` then reads
    * typed paths without re-tokenizing the text — the open-schema
    * semi-structured story Spark 4 ships for exactly the "props bag with
    * no fixed schema" shape. Same answer as j01's `from_json` (asserted
    * by sharing j01's oracle SQL shape), different engine path: variant
    * scales to heterogeneous keys where a `StructType` schema can't —
    * at 100 TB the win is shredding + lazy path access instead of a
    * full JSON re-parse per field read.
    */
  def j02VariantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .withColumn("k_bucket",
        when(col("k").isNull, lit(-1L)).otherwise(col("k") - col("k") % lit(10L)))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("cnt"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("k_bucket")

  // deliberately j01's oracle: the variant path must give the SAME answer
  private val j02Sql = j01Sql

  /** j03 — schema-drift union (`unionByName(allowMissingColumns)`): the
    * ingestion reality every long-lived pipeline hits — a "v2" feed adds
    * an extracted column, and historical "v1" batches must still union
    * cleanly, missing columns surfacing as NULL, matched BY NAME (a
    * positional `union` would silently misalign the moment either side
    * reorders). Modeled by hash-splitting events into a 3-column v1 era
    * and a v2 era that extracts `props.k`; the per-(era, type) audit shows
    * v1 rows carrying NULL k by construction. The oracle is DuckDB's own
    * `UNION ALL BY NAME` — the identical relational meaning, independently
    * implemented. Scale: union is plan-level (zero data movement); the
    * only exchange is the final bounded aggregate's.
    */
  def j03UnionDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val v1 = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"), lit("v1").as("era"))
    val v2 = ev.filter(col("event_id") % 2 =!= 0)
      .select(col("event_id"), col("event_type"), lit("v2").as("era"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy("era", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("k_nulls"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("era", "event_type")
  }

  private val j03Sql =
    """SELECT era, event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS k_nulls,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM (
      |  SELECT event_id, event_type, 'v1' AS era
      |  FROM events WHERE event_id % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT event_id, event_type, 'v2' AS era,
      |    CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |  FROM events WHERE event_id % 2 <> 0) u
      |GROUP BY 1, 2 ORDER BY era, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j01_json_extract" -> (j01JsonExtract _),
    "j02_variant_extract" -> (j02VariantExtract _),
    "j03_union_drift" -> (j03UnionDrift _))

  val oracles: Map[String, String] = Map(
    "j01_json_extract" -> j01Sql,
    "j02_variant_extract" -> j02Sql,
    "j03_union_drift" -> j03Sql)
}
