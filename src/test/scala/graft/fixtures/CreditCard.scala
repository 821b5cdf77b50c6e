package graft.fixtures

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.util.Random

/** Seeded Kaggle-shaped `creditcard` fixture (FIXTURES.md §A): `Time,
  * V1..V28, Amount, Class` with the generator guarantees the golden tests
  * need — ≥2 fraud pairs sharing an hour bucket with distinct V1 (so the
  * co-occurrence self-join yields edges), every amount bin populated, zero
  * nulls, known class ratio, and a REAL class signal (fraud shifts V1–V3
  * and Amount) so the GBT evaluation golden is meaningful, like the Kaggle
  * data's PCA features are.
  */
object CreditCard {
  val Rows = 10000
  val FraudRows = 60 // 0.6% — imbalanced like the reference's 0.17%

  val schema: StructType = StructType(
    StructField("Time", DoubleType) +:
      (1 to 28).map(i => StructField(s"V$i", DoubleType)) :+
      StructField("Amount", DoubleType) :+
      StructField("Class", IntegerType))

  /** Deterministic rows (seed 42). */
  def rows: Seq[Row] = {
    val rnd = new Random(42)
    // amounts covering all six reference bins: <10, <50, <100, <500, <1000, 1000+
    def amount(isFraud: Boolean): Double = {
      val base = rnd.nextInt(6) match {
        case 0 => rnd.nextDouble() * 9.99
        case 1 => 10 + rnd.nextDouble() * 39.99
        case 2 => 50 + rnd.nextDouble() * 49.99
        case 3 => 100 + rnd.nextDouble() * 399.99
        case 4 => 500 + rnd.nextDouble() * 499.99
        case _ => 1000 + rnd.nextDouble() * 5000
      }
      val shifted = if (isFraud) base * 1.5 + 50 else base
      math.floor(shifted * 100) / 100
    }
    (0 until Rows).map { i =>
      val isFraud = i < FraudRows
      // fraud pairs land in shared hour buckets: two frauds per hour
      val time: Double =
        if (isFraud) (i / 2) * 3600.0 + rnd.nextInt(3600)
        else rnd.nextDouble() * 172800.0
      val vs = (1 to 28).map { v =>
        val shift = if (isFraud && v <= 3) 2.5 else 0.0 // class signal
        rnd.nextGaussian() + shift
      }
      Row.fromSeq(time +: vs :+ amount(isFraud) :+ (if (isFraud) 1 else 0))
    }
  }

  def df(s: SparkSession): DataFrame =
    s.createDataFrame(
      s.sparkContext.parallelize(rows, 4), schema)
}
