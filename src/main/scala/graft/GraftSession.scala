package graft

import org.apache.spark.sql.SparkSession

/** One-call SQL surface: registers every testdata table as a temp view and
  * the library's custom functions (`vec_dot`, `weighted_mean`), so the
  * reference's SQL-first workflow (`createOrReplaceTempView` + `spark.sql`,
  * `notebooks/2_sql_analysis.ipynb:81-82`) ports as-is — including over the
  * extension surface (embeddings similarity in plain SQL).
  */
object GraftSession {
  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def init(s: SparkSession, dir: String): Unit = {
    TableNames.foreach { t =>
      val df = t match {
        case "events" => Tables.events(s, dir)
        case other => s.read.parquet(s"$dir/$other.parquet")
      }
      df.createOrReplaceTempView(t)
    }
    functions.VectorFunctions.register(s)
    functions.WeightedMeanAgg.register(s)
  }
}
