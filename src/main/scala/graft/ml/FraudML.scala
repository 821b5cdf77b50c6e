package graft.ml

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ML operator surface of the reference (SURVEY.md §2.8 M1–M8), re-expressed
  * on the testdata: `l_returnflag = 'R'` plays the fraud label, the lineitem
  * numerics play the PCA features.
  *
  * Reference lineage: VectorAssembler + 80/20 seed-42 split
  * (`notebooks/1_data_cleaning.ipynb:309-337`), GBTClassifier maxIter=10
  * (`notebooks/3_ml_fraud.ipynb:103-110`), Binary/Multiclass evaluators
  * (`3_ml_fraud.ipynb:159-177`), confusion matrix (`:185`), model
  * save/overwrite (`:283-289`).
  *
  * The reference's golden metrics (ROC-AUC 0.9709 etc.) are properties of
  * the Kaggle dataset; the synthetic testdata carries no class signal, so
  * specs assert structural invariants (metric ranges, cell sums, save/load
  * idempotence), not those values.
  *
  * Scale: MLlib GBT trains on the distributed Dataset directly — each
  * iteration is a set of distributed aggregations over the feature columns;
  * nothing here collects to the driver. `randomSplit` is per-partition
  * Bernoulli: deterministic for a fixed (seed, partitioning) — which the
  * fixed parquet layout + fixed session config provide — but re-partitioning
  * shifts the split, so split-dependent outputs stay rows-only checks
  * (SURVEY §7.4).
  */
object FraudML {
  val Seed = 42L
  val FeatureCols: Array[String] = Array(
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "ship_epoch")

  /** Labeled, assembled feature frame (M1): label = 1.0 iff returnflag 'R'. */
  def assemble(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .withColumn("ship_epoch",
        unix_timestamp(col("l_shipdate")).cast("double"))
      .withColumn("label",
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    new VectorAssembler()
      .setInputCols(FeatureCols)
      .setOutputCol("features")
      .transform(base)
      .select("l_orderkey", "l_linenumber", "features", "label")
  }

  /** M2: the reference's 80/20 seed-42 split — memoized AND materialized
    * per (session, dir). `randomSplit` is seeded but PARTITIONING-
    * sensitive (the m02 rows-only contract): two evaluations under
    * different cache/AQE states can deal rows differently, so handing
    * callers lazy frames would let "the split" silently change between a
    * trainer and its evaluator. The pin is an EAGER `localCheckpoint`,
    * not `cache()`: cached frames live in the catalog's cache manager,
    * where any concurrent `clearCache()` evicts them and the next action
    * silently re-deals — a checkpoint cuts the lineage, so the deal can
    * never be recomputed, only read. Every consumer (m02–m07, specs)
    * observes the same train/test sets.
    */
  def split(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    splitMemo.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap())
      .computeIfAbsent(dir, _ => {
        val Array(train, test) = assemble(s, dir)
          .randomSplit(Array(0.8, 0.2), seed = Seed)
        (train.transform(graft.Cut.cut), test.transform(graft.Cut.cut))
      })

  private val splitMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame)]]())

  /** One trained model + its test predictions per (session, dir) — the m*
    * queries share a single training run, like the reference notebook keeps
    * one `gbt_model` across evaluation cells.
    */
  // Weak-keyed by SESSION (reference identity): a memoized DataFrame is
  // bound to its SparkContext — handing it to a later session would throw
  // on a stopped context instead of retraining. The weak key also lets a
  // dead session's models be collected instead of pinned forever.
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (GBTClassificationModel, DataFrame)]]())

  def trained(s: SparkSession, dir: String): (GBTClassificationModel, DataFrame) =
    memo.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap())
      .computeIfAbsent(dir, _ => {
      val (train, test) = split(s, dir)
      val model = new GBTClassifier() // M3
        .setLabelCol("label").setFeaturesCol("features")
        .setMaxIter(10).setSeed(Seed)
        .fit(train.cache())
      (model, model.transform(test).cache()) // M4
    })

  /** m01 — assembled feature vectors bridged back through `vector_to_array`
    * and positionally extracted to one scalar column per feature (M1 + the
    * reference's positional extraction, SURVEY §2.2 P14 —
    * `2_sql_analysis.ipynb:150-156` does exactly this with `getItem`).
    * Deterministic (no split/training involved) → full oracle check; the
    * output is all scalars so any downstream hash/sort canonicalization
    * works on it (an `array<double>` column is not hashable row-wise).
    */
  def m01FeatureVectors(s: SparkSession, dir: String): DataFrame =
    assemble(s, dir)
      .withColumn("f", vector_to_array(col("features")))
      .select(col("l_orderkey"), col("l_linenumber"),
        element_at(col("f"), 1).as("f_quantity"),
        element_at(col("f"), 2).as("f_price"),
        element_at(col("f"), 3).as("f_discount"),
        element_at(col("f"), 4).as("f_tax"),
        element_at(col("f"), 5).as("f_ship_epoch"),
        element_at(col("f"), 2).as("amount"), col("label"))
      .orderBy("l_orderkey", "l_linenumber")
      .limit(1000)

  private val m01Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_quantity AS DOUBLE) AS f_quantity,
      |  CAST(l_extendedprice AS DOUBLE) AS f_price,
      |  CAST(l_discount AS DOUBLE) AS f_discount,
      |  CAST(l_tax AS DOUBLE) AS f_tax,
      |  CAST(epoch(l_shipdate) AS DOUBLE) AS f_ship_epoch,
      |  CAST(l_extendedprice AS DOUBLE) AS amount,
      |  CAST(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label
      |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin

  /** m02 — train/test split row counts per class (M2; split-dependent →
    * rows-only check).
    */
  def m02SplitSizes(s: SparkSession, dir: String): DataFrame = {
    val (train, test) = split(s, dir)
    train.groupBy("label").agg(count(lit(1)).as("n_train"))
      .join(test.groupBy("label").agg(count(lit(1)).as("n_test")), Seq("label"))
      .orderBy("label")
  }

  /** m03 — confusion matrix (M7: `groupBy("label","prediction").count()`). */
  def m03GbtConfusion(s: SparkSession, dir: String): DataFrame = {
    val (_, pred) = trained(s, dir)
    pred.groupBy("label", "prediction").agg(count(lit(1)).as("cnt"))
      .orderBy("label", "prediction")
  }

  /** m04 — evaluator metrics as one row (M5 + M6). */
  def m04GbtMetrics(s: SparkSession, dir: String): DataFrame = {
    val (_, pred) = trained(s, dir)
    val roc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(pred)
    val pr = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderPR").evaluate(pred)
    def multi(m: String) = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName(m).evaluate(pred)
    import s.implicits._
    Seq((roc, pr, multi("weightedPrecision"), multi("weightedRecall"),
      multi("weightedFMeasure")))
      .toDF("auc_roc", "auc_pr", "weighted_precision", "weighted_recall",
        "weighted_f1")
  }

  /** M8 — persistence round-trip: save with overwrite, load, return the
    * loaded model (spec asserts prediction equivalence).
    */
  def saveLoad(s: SparkSession, dir: String, path: String): GBTClassificationModel = {
    val (model, _) = trained(s, dir)
    model.write.overwrite().save(path)
    GBTClassificationModel.load(path)
  }

  /** The idiomatic deployment form the reference stops short of: ONE
    * `spark.ml` Pipeline (assembler + classifier) fit and persisted as a
    * unit, so serving loads a single artifact that accepts RAW columns —
    * no out-of-band agreement about feature order between train and serve
    * (the exact bug class the reference's positional `getItem(29)` invites).
    */
  def fitPipeline(s: SparkSession, dir: String, path: String): org.apache.spark.ml.PipelineModel = {
    import org.apache.spark.ml.Pipeline
    val base = Tables.lineitem(s, dir)
      .withColumn("ship_epoch", unix_timestamp(col("l_shipdate")).cast("double"))
      .withColumn("label", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val Array(train, _) = base.randomSplit(Array(0.8, 0.2), seed = Seed)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(FeatureCols).setOutputCol("features"),
      new GBTClassifier().setLabelCol("label").setFeaturesCol("features")
        .setMaxIter(5).setSeed(Seed)))
    val model = pipe.fit(train)
    model.write.overwrite().save(path)
    org.apache.spark.ml.PipelineModel.load(path)
  }

  /** m05 — hyperparameter selection via CrossValidator (the step the
    * reference skips by hard-coding maxIter=10): a small maxDepth grid,
    * 2-fold, area-under-ROC, parallelism 2. Output: one row per grid
    * point with its mean CV metric plus the winner flag.
    *
    * Scale: `setParallelism(p)` fits p models concurrently, each a
    * distributed job — the grid axis and the data axis parallelize
    * independently, so a 1000-executor cluster walks a big grid at the
    * same wall clock as one fit. Rows-only (fold assignment is
    * partitioning-sensitive, like m02-m04).
    */
  def m05CvGrid(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val (train, _) = split(s, dir)
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(3).setSeed(Seed)
    val grid = new ParamGridBuilder()
      .addGrid(gbt.maxDepth, Array(2, 3))
      .build()
    val cv = new CrossValidator()
      .setEstimator(gbt)
      .setEvaluator(new BinaryClassificationEvaluator()
        .setLabelCol("label").setRawPredictionCol("rawPrediction")
        .setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2).setParallelism(2).setSeed(Seed)
    val model = cv.fit(train.cache())
    val best = model.avgMetrics.zipWithIndex.maxBy(_._1)._2
    import s.implicits._
    grid.zip(model.avgMetrics).zipWithIndex.map { case ((pm, m), i) =>
      (pm.get(gbt.maxDepth).get, m, i == best)
    }.toSeq.toDF("max_depth", "avg_auc_roc", "is_best")
      .orderBy("max_depth")
  }

  /** m06 — LogisticRegression baseline + CALIBRATION table: the linear
    * model every tree ensemble should be benchmarked against (when the
    * lift over LR is small, ship LR — faster to train, monotone,
    * explainable), plus the 10-bin reliability table (mean predicted
    * probability vs observed positive rate per bin) that tells a
    * consumer whether the scores are usable AS probabilities — GBT
    * margins notoriously aren't without calibration.
    *
    * Scale: LR trains via L-BFGS on `treeAggregate`d gradients — one
    * pass per iteration, no driver-side data; the calibration table is
    * one bounded groupBy over predictions. Rows-only like m02–m04
    * (training is partitioning-sensitive); the spec pins bin coverage
    * and probability bounds instead.
    */
  def m06LrCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    val (train, test) = split(s, dir)
    val fitted = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(20)
      .fit(train.cache())
    // score via NATIVE expressions from the model's coefficients instead of
    // model.transform: the fitted model object carries its trainingSummary
    // (copy() re-attaches it), whose captured SparkSession makes any task
    // closure shipping the model fail "Task not serializable". A binary-LR
    // probability is just sigmoid(coef·x + b) — spelled in Catalyst it
    // stays whole-stage-codegen'd and ships ~6 doubles, not a JVM object,
    // which is also the right scoring shape at 100 TB
    val fa = org.apache.spark.ml.functions.vector_to_array(col("features"))
    val margin = fitted.coefficients.toArray.zipWithIndex
      .map { case (c, i) => fa.getItem(i) * lit(c) }
      .reduce(_ + _) + lit(fitted.intercept)
    val p1 = lit(1.0) / (lit(1.0) + exp(-margin))
    test
      .select(col("label"), p1.as("p"))
      .withColumn("bin", least(floor(col("p") * 10).cast("long"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        graft.operators.Det.r(
          sum(col("p").cast("decimal(38,8)")).cast("double")
            / count(lit(1)), 4).as("mean_pred"),
        graft.operators.Det.r(
          sum(col("label").cast("decimal(38,8)")).cast("double")
            / count(lit(1)), 4).as("pos_rate"))
      .orderBy("bin")
  }

  /** m07 — GBT feature importances: the per-feature impurity-gain shares
    * (Hastie et al. §10.13 as MLlib computes them — summed over every
    * split that uses the feature, normalized to 1) joined back to the
    * feature NAMES, because an importance vector without names is the
    * table nobody can read. The model-introspection export every fraud
    * team publishes next to the AUC: which signals the ensemble actually
    * uses. Rows-only like every training-dependent query (same memoized
    * model as m03/m04); the spec pins the invariants (simplex: all ≥ 0,
    * sum = 1, one row per feature).
    *
    * Scale: the importance vector is `numFeatures` long and lives on the
    * driver — this is a metadata query; only training was distributed.
    */
  def m07FeatureImportances(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (model, _) = trained(s, dir)
    val imp = model.featureImportances.toArray
    FeatureCols.zip(imp).toSeq.toDF("feature", "importance")
      .select(col("feature"),
        org.apache.spark.sql.functions.round(col("importance"), 6)
          .as("importance"))
      .orderBy(col("importance").desc, col("feature"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m07_feature_importances" -> (m07FeatureImportances _),
    "m06_lr_calibration" -> (m06LrCalibration _),
    "m01_feature_vectors" -> (m01FeatureVectors _),
    "m02_split_sizes" -> (m02SplitSizes _),
    "m03_gbt_confusion" -> (m03GbtConfusion _),
    "m04_gbt_metrics" -> (m04GbtMetrics _),
    "m05_cv_grid" -> (m05CvGrid _))

  /** Only m01 is deterministic enough for a value oracle; m02–m04 depend on
    * the partitioning-sensitive split/training (SURVEY §7.4) → rows-only.
    */
  val oracles: Map[String, String] = Map(
    "m01_feature_vectors" -> m01Sql)
}
