package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Round-5 operators: d08 exact-dedup-then-near-dup composition and g22
  * capped neighbor features.
  */
class Round5OpsSpec extends AnyFunSuite with SparkTestSession {

  test("g22 == g19 where the caps do not bind (sf0.001: max bucket 3, max degree 9)") {
    val g19 = graph.NeighborAgg.g19NeighborFeatures(spark, Sf)
    val g22 = graph.NeighborAgg.g22CappedNeighborFeatures(spark, Sf)
    assert(g22.exceptAll(g19).isEmpty && g19.exceptAll(g22).isEmpty)
  }

  test("d08 == d02 on a duplicate-free corpus (canonical set is the corpus)") {
    // the driver corpora are exact-duplicate-free (d01 collapses only the
    // planted re-keyed copy), so dedup-first must change nothing
    val d02 = Dedup.d02NgramJaccardPairs(spark, Sf)
    val d08 = Dedup.d08NeardupAfterDedup(spark, Sf)
    assert(d08.exceptAll(d02).isEmpty && d02.exceptAll(d08).isEmpty)
  }

  test("d09 == d05 on a duplicate-free embedding table") {
    val d05 = operators.Similarity.d05EmbeddingNeardup(spark, Sf)
    val d09 = operators.Similarity.d09EmbeddingNeardupCanonical(spark, Sf)
    assert(d09.exceptAll(d05).isEmpty && d05.exceptAll(d09).isEmpty)
  }

  test("d08 pair ids are canonical: min doc_id per distinct text") {
    val canonIds = Tables.documents(spark, Sf)
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val pairs = Dedup.d08NeardupAfterDedup(spark, Sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(canonIds.contains(r.getLong(0)) && canonIds.contains(r.getLong(1)))
      assert(r.getLong(0) < r.getLong(1), "pairs canonical: id_a < id_b")
    }
  }
}
