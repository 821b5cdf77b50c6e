package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism floor for compute-heavy derivations over small or
  * unsplittable scans (r14 optimization; guide §2.5 "input skew:
  * repartition immediately after the read").
  *
  * The driver testdata is single-file single-row-group parquet, so every
  * scan yields ONE partition and every narrow chain above it — tokenize/
  * shingle explosion, vector norms, PQ sub-space encoding, broadcast-
  * nested-loop pair scoring — runs on one core until the first exchange.
  * At production input sizes scans split naturally and this helper must
  * cost nothing, so the repartition is GATED ON FILE METADATA: it fires
  * only when the source files are provably too small for the scan to
  * reach the session's configured parallelism (total bytes below
  * `shuffle.partitions x files.openCostInBytes`, the planner's own
  * per-file padding — at that size the split planner cannot produce more
  * than ~`shuffle.partitions` splits, and a single row group cannot be
  * split at all). A 100 TB table never triggers it; a tiny or
  * single-row-group one pays one narrow-row shuffle that is dominated by
  * the downstream compute it parallelizes.
  *
  * Hash-partitioning on the caller's key (never round-robin): retry-
  * deterministic with no sort-before-repartition pass, and downstream
  * groupBys on the same key can reuse the distribution. Frames without
  * resolvable input files (streaming twins, in-memory test frames)
  * no-op.
  */
object Par {
  def spread(df: DataFrame, key: Column): DataFrame = {
    val conf = df.sparkSession.conf
    val n = conf.get("spark.sql.shuffle.partitions").toInt
    val openCost =
      conf.get("spark.sql.files.openCostInBytes", (4L * 1024 * 1024).toString)
        .toLong
    val tiny = scala.util.Try {
      val files = df.inputFiles
      files.nonEmpty && files.map { f =>
        new java.io.File(new java.net.URI(f).getPath).length
      }.sum < n.toLong * openCost
    }.getOrElse(false)
    if (tiny) df.repartition(n, key) else df
  }
}
