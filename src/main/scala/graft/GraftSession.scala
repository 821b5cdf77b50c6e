package graft

import org.apache.spark.sql.SparkSession

/** One-call SQL surface: registers every testdata table as a temp view and
  * the library's custom functions (`vec_dot`, `weighted_mean`), so the
  * reference's SQL-first workflow (`createOrReplaceTempView` + `spark.sql`,
  * `notebooks/2_sql_analysis.ipynb:81-82`) ports as-is — including over the
  * extension surface (embeddings similarity in plain SQL).
  */
object GraftSession {
  def init(s: SparkSession, dir: String): Unit = {
    // route through Tables.byName: the loaders own any load-time
    // normalization (events' nanos ts), so SQL views and the DataFrame
    // API always see the same data
    Tables.byName.foreach { case (name, load) =>
      load(s, dir).createOrReplaceTempView(name)
    }
    functions.VectorFunctions.register(s)
    functions.WeightedMeanAgg.register(s)
  }
}
