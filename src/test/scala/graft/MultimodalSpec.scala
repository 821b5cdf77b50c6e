package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Multimodal binary-column plumbing: payload/metadata schema, partition-
  * batched stub decode, metadata pruning.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  test("media table: binary payload with typed metadata, pruned meta view") {
    // pruning check FIRST, before anything caches the media table (a cached
    // InMemoryRelation would replace the parquet scan as the plan leaf):
    // the meta view must read only the source columns it derives from
    // (doc_id, text) — never lang/source/n_chars
    spark.catalog.clearCache()
    val meta = Multimodal.mm01MediaMeta(spark, Sf)
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec is itself a leaf
    // node and would hide the file scan
    val scanCols = meta.queryExecution.sparkPlan.collectLeaves()
      .flatMap(_.schema.fieldNames).toSet
    assert(scanCols.subsetOf(Set("doc_id", "text")), scanCols.toString)
    val mt = Multimodal.mediaTable(spark, Sf).cache()
    assert(mt.schema("payload").dataType.typeName == "binary")
    assert(mt.select("media_type").distinct().count() == 3)
    assert(meta.count() == mt.count())
  }

  test("mapPartitions stub decode matches a SQL byte-stat computation") {
    val feats = Multimodal.mm02MediaFeatures(spark, Sf).cache()
    val viaSql = Multimodal.mediaTable(spark, Sf)
      .select(col("doc_id"), length(col("payload")).cast("long").as("byte_len_sql"))
    val joined = feats.join(viaSql, "doc_id")
    assert(joined.filter(col("byte_len") =!= col("byte_len_sql")).count() == 0)
    val r = feats.head()
    assert(r.getDouble(3) > 0 && r.getDouble(3) < 256) // mean byte in range
    assert(feats.filter(col("n_frames") =!= (expr("byte_len div 256") + 1)).count() == 0)
  }

  test("media profile aggregates per type with weighted mean in byte range") {
    val prof = Multimodal.mm03MediaProfile(spark, Sf).collect()
    assert(prof.length == 3)
    assert(prof.forall(r => r.getDouble(4) > 0 && r.getDouble(4) < 256))
    assert(prof.map(_.getLong(1)).sum == 500)
  }
}
