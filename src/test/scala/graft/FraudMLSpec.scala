package graft

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.FraudML

/** Structural invariants of the ML surface (SURVEY.md §2.8). The reference's
  * golden metrics are Kaggle-data properties; the synthetic testdata has no
  * class signal, so we assert pipeline shape, metric ranges, and save/load
  * idempotence instead (SURVEY §5.2 adapted).
  */
class FraudMLSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.001"

  test("M1 assembler emits a dense numeric vector per row, label in {0,1}") {
    val df = FraudML.assemble(spark, dir).cache()
    assert(df.count() > 0)
    val r = df.head()
    assert(r.getAs[Vector]("features").size == FraudML.FeatureCols.length)
    val labels = df.select("label").distinct().collect().map(_.getDouble(0)).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
  }

  test("M2 split partitions the corpus: train + test = all, ratio ~80/20") {
    val all = FraudML.assemble(spark, dir).count()
    val (train, test) = FraudML.split(spark, dir)
    val (nTrain, nTest) = (train.count(), test.count())
    assert(nTrain + nTest == all)
    val ratio = nTrain.toDouble / all
    assert(ratio > 0.7 && ratio < 0.9, s"split ratio $ratio")
  }

  test("M3-M7 GBT trains, predicts {0,1}, confusion cells sum to test size") {
    val (model, pred) = FraudML.trained(spark, dir)
    assert(model.getMaxIter == 10)
    assert(model.trees.nonEmpty)
    val preds = pred.select("prediction").distinct().collect()
      .map(_.getDouble(0)).toSet
    assert(preds.subsetOf(Set(0.0, 1.0)))
    val confusion = FraudML.m03GbtConfusion(spark, dir)
    assert(confusion.agg(sum("cnt")).head.getLong(0) == pred.count())
    val m = FraudML.m04GbtMetrics(spark, dir).head()
    for (i <- 0 until 5) {
      val v = m.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"metric $i out of range: $v")
    }
  }

  test("m04 metrics are pinned goldens (seed 42, this session's partitioning)") {
    // the driver gate keeps m04 rows-only (split/training are partitioning-
    // sensitive, SURVEY §7.4) — but WITHIN one environment the whole chain
    // is deterministic: seed-42 split, seeded GBT, fixed evaluator. Pin the
    // values this suite's session produces so any regression in the ML path
    // (assembler change, split drift, evaluator swap) fails CI instead of
    // silently shifting metrics. The fixture has no class signal; these are
    // determinism goldens, not quality claims (see README scope note).
    val golden = Map(
      "auc_roc" -> 0.48154570056981255,
      "auc_pr" -> 0.3135238176195935,
      "weighted_precision" -> 0.5468956664985607,
      "weighted_recall" -> 0.6591500433651345,
      "weighted_f1" -> 0.5451714668757205)
    val m = FraudML.m04GbtMetrics(spark, dir).head()
    golden.foreach { case (name, want) =>
      val got = m.getAs[Double](name)
      assert(math.abs(got - want) <= 1e-6,
        s"$name drifted: got $got, pinned $want. If this follows a Spark " +
          "upgrade or testdata regeneration (randomSplit is partition-" +
          "sensitive), re-pin ALL five goldens from this suite's output; " +
          "a lone drift with unchanged environment is a real ML-path bug.")
    }
  }

  test("PipelineModel persists assembler+classifier as one raw-column artifact") {
    val tmp = java.nio.file.Files.createTempDirectory("gbt_pipe").toString
    val loaded = FraudML.fitPipeline(spark, dir, tmp)
    assert(loaded.stages.length == 2)
    // the loaded pipeline scores RAW rows - no manual assembly at serve time
    val raw = Tables.lineitem(spark, dir)
      .withColumn("ship_epoch", unix_timestamp(col("l_shipdate")).cast("double"))
      .limit(50)
    val scored = loaded.transform(raw)
    assert(scored.columns.contains("prediction"))
    assert(scored.count() == 50)
  }

  test("m05 CV grid reports one row per grid point with exactly one winner") {
    val rows = FraudML.m05CvGrid(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3))
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    assert(rows.count(_.getBoolean(2)) == 1, "exactly one best grid point")
  }

  test("m06 LR calibration bins are well-formed and cover the test set") {
    val rows = FraudML.m06LrCalibration(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val (_, test) = FraudML.split(spark, dir)
    assert(rows.map(_.getLong(1)).sum == test.count(),
      "bins must partition the test set")
    rows.foreach { r =>
      val (bin, mp, pr) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(bin >= 0 && bin <= 9)
      assert(mp >= 0.0 && mp <= 1.0 && pr >= 0.0 && pr <= 1.0)
      // mean predicted probability lies inside its own bin's range
      assert(mp >= bin / 10.0 - 1e-9 && mp <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean_pred $mp outside bin range")
    }
  }

  test("m07 feature importances form a named simplex over the feature set") {
    val rows = FraudML.m07FeatureImportances(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq
      == FraudML.FeatureCols.sorted.toSeq, "one row per named feature")
    val imps = rows.map(_.getDouble(1))
    assert(imps.forall(_ >= 0.0))
    // 6-dp rounding: the simplex sum holds to rounding tolerance
    assert(math.abs(imps.sum - 1.0) < 1e-5, s"sum ${imps.sum}")
    // descending order with name tie-break
    assert(imps.sameElements(imps.sortBy(-_)), "must be sorted by weight")
  }

  test("m07 importances are pinned goldens (seed 42, this session's partitioning)") {
    // same contract as the m04 golden: partitioning-sensitive via the
    // randomSplit+GBT chain (stays rows-only at the driver gate), but
    // deterministic WITHIN this suite's session — pin the vector ±1e-6 so
    // an ML-path regression fails CI instead of silently reshuffling
    // feature attributions (round-4 advice item 8).
    val golden = Map(
      "ship_epoch" -> 0.267931,
      "l_quantity" -> 0.254345,
      "l_extendedprice" -> 0.227538,
      "l_tax" -> 0.130297,
      "l_discount" -> 0.11989)
    val got = FraudML.m07FeatureImportances(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == golden.keySet)
    golden.foreach { case (name, want) =>
      assert(math.abs(got(name) - want) <= 1e-6,
        s"importance($name) drifted: got ${got(name)}, pinned $want. " +
          "If this follows a Spark upgrade or testdata regeneration, " +
          "re-pin ALL five (and the m04 goldens) from this suite's output.")
    }
  }

  test("M8 save/load round-trip predicts identically") {
    val tmp = java.nio.file.Files.createTempDirectory("gbt_model").toString
    val loaded = FraudML.saveLoad(spark, dir, tmp)
    val (model, _) = FraudML.trained(spark, dir)
    val (_, test) = FraudML.split(spark, dir)
    val a = model.transform(test).select("l_orderkey", "l_linenumber", "prediction")
    val b = loaded.transform(test).select("l_orderkey", "l_linenumber", "prediction")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
