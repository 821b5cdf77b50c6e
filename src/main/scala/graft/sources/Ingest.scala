package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface of the reference beyond Parquet (SURVEY.md §2.1):
  * CSV ingest with header+inferSchema (S1, `notebooks/1_data_cleaning
  * .ipynb:40-43`) and with an explicit schema, CSV export with `coalesce(1)`
  * (S4, `notebooks/4_graphx.ipynb:1213-1217`), Parquet export with
  * `coalesce(5)` (S3, `:1204`), and the `spark.range`+`rand` synthetic
  * generator (S12, `streaming/spark_to_postgres.py:11-21`).
  *
  * Scale notes: `inferSchema` costs an extra full pass before the plan even
  * builds (SURVEY §3.2) — at 100 TB ALWAYS pass the explicit schema; the
  * inferring reader is kept for reference parity and ad-hoc work.
  * `coalesce(1)` serializes the write into one task — correct for a
  * top-100 export, catastrophic for bulk output; the bulk path keeps the
  * write parallelism of the upstream plan.
  */
object Ingest {

  /** S1 — the reference's ingest: header + inferSchema (extra pass!). */
  def readCsvInfer(s: SparkSession, path: String): DataFrame =
    s.read.option("header", true).option("inferSchema", true).csv(path)

  /** S1 at scale — explicit schema, single pass, no surprises. */
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.option("header", true).schema(schema).csv(path)

  /** S4 — bounded result export: single CSV file with header. */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)

  /** S3 — bounded parquet export, reference's `coalesce(5)`. */
  def writeParquetCoalesced(df: DataFrame, path: String, files: Int = 5): Unit =
    df.coalesce(files).write.mode("overwrite").parquet(path)

  /** S12 — seeded synthetic transaction generator (the reference's
    * `spark.range(0,50)` + `rand()` frame, `spark_to_postgres.py:11-21`).
    * `rand(seed)`/`randn(seed)` are deterministic per (seed, partition
    * layout) — stable within one environment, not across partitionings, so
    * this stays a rows-only check (SURVEY §7.4).
    */
  def syntheticTransactions(s: SparkSession, n: Long): DataFrame =
    s.range(0, n)
      .withColumn("amount", round(rand(42) * 1000, 2))
      .withColumn("fraud_probability", rand(43))
      .withColumn("is_fraud", col("fraud_probability") > 0.85)
      .withColumn("transaction_type",
        when(col("id") % 3 === 0, "purchase")
          .when(col("id") % 3 === 1, "transfer").otherwise("withdrawal"))
      .withColumn("created_at", current_timestamp())

  /** x01 — generator as a registered query (rows-only; `rand`,
    * `current_timestamp` are nondeterministic by contract).
    */
  def x01Synthetic(s: SparkSession, dir: String): DataFrame =
    syntheticTransactions(s, 1000)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_synthetic_transactions" -> (x01Synthetic _))

  val oracles: Map[String, String] = Map.empty
}
