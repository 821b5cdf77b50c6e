package graft

import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Session-scoped registry of operator-internal cached frames.
  *
  * Many graft operators `cache()` an intermediate on purpose — the hot-list
  * caches in [[operators.Dedup.capShingles]] / `LmOps.t10LineDedup` are
  * LOAD-BEARING for AQE (the TableCacheQueryStage boundary is what lets the
  * runtime price the TRUE post-filter size for its broadcast-vs-shuffle
  * call), and the shared-frame caches (shingle sets, centroid assignments,
  * pre-partitioned edge sets) are what make each operator a single-pass
  * query. But a returned DataFrame is lazy: the operator cannot unpersist
  * after "the final action" because the CALLER runs the action. Left alone,
  * every such cache outlives its query — Spark's CacheManager pins the
  * InMemoryRelation until an explicit unpersist — so a long-lived consumer
  * session accumulates one hot-list/shingle/edge cache per query run, each
  * bounded only linearly in corpus size. `spark.catalog.clearCache()` is
  * the blunt fix, but it also drops every cache the CONSUMER built.
  *
  * This registry is the scoped fix: each internal `cache()` goes through
  * [[mark]] (spelled `.tracked` at call sites), and [[release]] unpersists
  * exactly the graft-registered frames of one session, leaving consumer
  * caches alone. Call it between jobs in a long-lived session (see
  * docs/QUICKSTART.md); `Bench`/`Verify` drain it after every query.
  *
  * Lifetime notes:
  *   - References are STRONG, keyed by session identity. This adds no new
  *     leak class: Spark's own CacheManager already holds every cached
  *     plan strongly with exactly the same lifetime — the registry entry
  *     and the cache entry die together in [[release]].
  *   - Double-unpersist is a no-op, so operators that release their own
  *     intermediates early (c13's staged unpersists) still register here.
  *   - GraphX `Graph()` persists vertex/edge RDDs OUTSIDE the SQL cache;
  *     those are not Datasets and cannot register. [[releaseAll]] adds the
  *     harness sweep for them: every non-checkpointed persisted RDD in the
  *     context (checkpoint pins are exempt — their lineage is truncated,
  *     they cannot be recomputed; FraudML's memoized split lives there).
  *     It is session-wide by nature (an RDD has no owning session), so it
  *     can also drop consumer-persisted RDDs — documented, opt-in.
  */
object Caches {
  private val reg =
    new java.util.IdentityHashMap[SparkSession, ArrayBuffer[Dataset[_]]]()

  /** `ds.cache()` + register for scoped release. Internal spelling:
    * `frame.tracked` via [[Tracked]].
    */
  private[graft] def mark[T](ds: Dataset[T]): Dataset[T] = {
    ds.cache()
    reg.synchronized {
      var buf = reg.get(ds.sparkSession)
      if (buf == null) { buf = ArrayBuffer.empty; reg.put(ds.sparkSession, buf) }
      buf += ds
    }
    ds
  }

  /** Unpersist every graft-internal cached frame registered by `spark`'s
    * queries and drain the registry. Non-blocking; consumer caches and
    * checkpoint pins are untouched. Returns the number of frames released.
    */
  def release(spark: SparkSession): Int = {
    val drained = reg.synchronized {
      Option(reg.remove(spark)).map(_.toList).getOrElse(Nil)
    }
    drained.foreach(_.unpersist(blocking = false))
    drained.size
  }

  /** [[release]] plus the GraphX sweep: unpersist every non-checkpointed
    * persisted RDD in the context (graph-family queries persist vertex/edge
    * RDDs outside the SQL cache). Context-wide — consumer-persisted RDDs
    * are dropped too (they recompute lazily via lineage); checkpoint pins
    * survive because their truncated lineage CANNOT recompute.
    */
  def releaseAll(spark: SparkSession): Int = {
    val n = release(spark)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(r => if (!r.isCheckpointed) r.unpersist(false))
    n
  }

  /** `.tracked` = `.cache()` + registration with [[Caches]]. */
  private[graft] implicit final class Tracked[T](private val ds: Dataset[T])
      extends AnyVal {
    def tracked: Dataset[T] = mark(ds)
  }
}
