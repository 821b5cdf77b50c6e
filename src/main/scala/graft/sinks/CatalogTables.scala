package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Catalog-table lifecycle via the DataFrameWriterV2 API (`df.writeTo`) —
  * the declarative successor to `df.write.saveAsTable` and the spelling a
  * lakehouse catalog (Iceberg/Delta/Unity-style) expects: create/replace,
  * append, and partition-level overwrite are EXPLICIT verbs instead of a
  * mode string, and the partitioning is part of the table definition the
  * catalog enforces, not a per-writer option a later writer can forget.
  *
  * Against the built-in session catalog these verbs resolve to Parquet
  * tables in the warehouse directory; against a V2 catalog plugin the same
  * code drives snapshot-isolated table formats unchanged — which is the
  * point: pipeline code should not change when the table format does.
  *
  * Scale notes: [[replaceWith]] defines day-partitioning once at the
  * table; every appended batch lands in its day directories and a reader's
  * `WHERE day = …` prunes at the catalog/file level. [[overwriteDay]] is
  * the backfill verb — it replaces ONLY the partitions present in the
  * incoming frame (same contract as `Ingest.backfillPartition`, but
  * table-addressed instead of path-addressed).
  */
object CatalogTables {

  /** Define-or-redefine `table` as a day-partitioned Parquet catalog table
    * holding `df`. The built-in session catalog supports CTAS but not the
    * atomic REPLACE TABLE AS SELECT, so redefinition is spelled drop +
    * `create()` here; against a real V2 catalog (Iceberg/Delta) the same
    * call site would use `createOrReplace()` and gain atomicity for free.
    * Clearing the orphaned warehouse directory first matters because the
    * in-memory catalog forgets tables across sessions but their files
    * survive, and CREATE refuses a location it never created.
    */
  def replaceWith(df: DataFrame, table: String, partCol: String): Unit = {
    dropWithLocation(df.sparkSession, table)
    df.writeTo(table).using("parquet")
      .partitionedBy(col(partCol))
      .create()
  }

  /** Append a batch into the table's existing partition layout.
    *
    * The session catalog hands back V1 tables, which `writeTo(...).append()`
    * rejects ("Cannot write into v1 table"), so the append routes through
    * `insertInto` — aligned BY NAME first, because `insertInto` is
    * positional and a catalog table stores partition columns last, not in
    * the frame's order. Against a V2 catalog this method becomes
    * `df.writeTo(table).append()` verbatim.
    */
  def appendTo(df: DataFrame, table: String): Unit = {
    val cols = df.sparkSession.table(table).columns
    df.select(cols.map(col).toIndexedSeq: _*).write.insertInto(table)
  }

  /** Replace exactly the day partitions present in `df` (dynamic
    * partition overwrite, table-addressed): the idempotent re-run of one
    * bad day against a catalog table. V2 spelling:
    * `df.writeTo(table).overwritePartitions()` — same V1 boundary as
    * [[appendTo]], so here it is the writer-scoped dynamic mode.
    */
  def overwriteDay(df: DataFrame, table: String): Unit = {
    val s = df.sparkSession
    val cols = s.table(table).columns
    // insertInto ignores writer-scoped options (unlike the path-based
    // writer Ingest.backfillPartition uses), so dynamic mode must come
    // from the session conf — set it for exactly this write and restore
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "dynamic")
    try df.select(cols.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Drop `table` from the catalog AND delete its warehouse directory
    * (shared hygiene with `Bucketing.writeBucketed`).
    */
  def dropWithLocation(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
  }
}
