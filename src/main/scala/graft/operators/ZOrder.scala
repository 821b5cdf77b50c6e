package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton) clustering key — the multi-column data-skipping
  * technique for 100 TB table layouts: quantize each clustering column to a
  * 16-bit bucket, interleave the bits, and range-partition + sort the
  * write by the interleaved key. Rows close in the key are close in EVERY
  * clustering dimension at once, so parquet row-group min/max statistics
  * prune multi-column box filters that a single-column sort can only prune
  * on its leading column.
  *
  * Everything is closed-form integer arithmetic (quantize → shift → mask →
  * weighted sum), identical in Spark and DuckDB, so the key itself is
  * exact-oracle-checkable; the locality guarantee (fixed top bits ⇒ narrow
  * per-dimension value range) is spec-asserted.
  */
object ZOrder {
  import TextFn.{r, rSql}

  private val Bits = 16

  /** Clamped 16-bit bucket of `x` over the fixed [lo, hi] domain. */
  private def quantize(x: Column, lo: Double, hi: Double): Column =
    least(lit((1 << Bits) - 1), greatest(lit(0),
      floor((x - lit(lo)) / lit(hi - lo) * lit(1 << Bits)).cast("long")))

  private def quantizeSql(x: String, lo: Double, hi: Double): String =
    s"least(${(1 << Bits) - 1}, greatest(0, " +
      s"CAST(floor(($x - $lo) / ${hi - lo} * ${1 << Bits}) AS BIGINT)))"

  /** 32-bit Morton interleave of two 16-bit buckets (a even bits, b odd). */
  def zKey(a: Column, b: Column): Column =
    (0 until Bits).map(j =>
      shiftright(a, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))
        + shiftright(b, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
      .reduce(_ + _)

  private def zKeySql(a: String, b: String): String =
    (0 until Bits).map(j =>
      s"((($a >> $j) & 1) * ${1L << (2 * j)} + " +
        s"(($b >> $j) & 1) * ${1L << (2 * j + 1)})")
      .mkString("(", " + ", ")")

  // fixed quantization domains for the lineitem clustering pair
  private val QLo = 1.0
  private val QHi = 50.0
  private val PLo = 900.0
  private val PHi = 105000.0

  /** z01 — Z-order cell profile: cluster lineitem on (quantity, price),
    * bucket rows by the top byte of the key (256 coarse cells) and report
    * each cell's row count and per-dimension value envelope. The envelopes
    * ARE the data-skipping story: a box filter on both columns touches
    * only cells whose envelope intersects it. Pure scan + one bounded
    * aggregate; at 100 TB this same key feeds
    * `repartitionByRange(zkey).sortWithinPartitions(zkey)` before the
    * write so row-group stats inherit the envelopes.
    */
  def z01ZorderCells(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_quantity"), col("l_extendedprice"),
        zKey(quantize(col("l_quantity"), QLo, QHi),
          quantize(col("l_extendedprice"), PLo, PHi)).as("zkey"))
      .withColumn("cell", shiftright(col("zkey"), 24))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_q"), max(col("l_quantity")).as("max_q"),
        r(min(col("l_extendedprice")), 2).as("min_p"),
        r(max(col("l_extendedprice")), 2).as("max_p"))
      .orderBy("cell")

  private def z01Sql = {
    val zk = zKeySql(quantizeSql("l_quantity", QLo, QHi),
      quantizeSql("l_extendedprice", PLo, PHi))
    s"""SELECT cell, CAST(count(*) AS BIGINT) AS n,
       |  min(l_quantity) AS min_q, max(l_quantity) AS max_q,
       |  ${rSql("min(l_extendedprice)", 2)} AS min_p,
       |  ${rSql("max(l_extendedprice)", 2)} AS max_p
       |FROM (SELECT l_quantity, l_extendedprice, $zk >> 24 AS cell
       |      FROM lineitem)
       |GROUP BY cell ORDER BY cell""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z01_zorder_cells" -> (z01ZorderCells _))

  val oracles: Map[String, String] = Map(
    "z01_zorder_cells" -> z01Sql)
}
