package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (getOrCreate singleton). */
trait SparkTestSession {
  val Sf: String = "/root/testdata/sf0.001"
  val SfMid: String = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run `body` with the streaming state-store provider pinned (e.g. to
    * RocksDB, which transformWithState requires), restoring the previous
    * setting — ONE definition of the save/set/restore dance for every
    * suite that needs a specific backend.
    */
  def withStateProvider[A](provider: String)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The RocksDB provider class name (required by transformWithState). */
  val RocksDbProvider: String = "org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider"
}
