package graft.ml

import org.apache.spark.ml.classification.{
  GBTClassificationModel, GBTClassifier, ProbabilisticClassificationModel,
  RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.ml.PredictionModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, NumericType}

/** sklearn-style distributed GBM API with the surface of the reference's
  * `dask_lightgbm.LGBMClassifier` / `LGBMRegressor`
  * (/root/reference/dask_lightgbm/core.py:187-246), re-expressed Spark-first.
  *
  * Mapping (SURVEY §2.A / §3.1): the reference's entire training
  * orchestration — partition zip for X/y/w co-locality (core.py:95-102),
  * who_has locality scheduling (core.py:113-117), per-worker socket
  * rendezvous (core.py:40-48,65-83) — dissolves into MLlib: one DataFrame
  * row holds features+label+weight (co-locality is structural), Spark
  * schedules tasks by preferred location, and GBT iterations communicate
  * through Spark aggregations instead of a private TCP ring. `fit` is eager
  * (an action, like the reference's `client.compute`); `predict` is a lazy
  * `transform` plan materialized by the caller's action.
  *
  * Param mapping: `n_estimators`→`maxIter`/`numTrees`, `seed`→`setSeed`,
  * `sample_weight`→`setWeightCol`, `objective='quantile', alpha`→the
  * native pinball-loss boosted trainer ([[Pinball]] — MLlib GBT has no
  * pinball loss, so the stages are composed from DecisionTreeRegressor
  * fits with exact per-leaf quantile line search; weighted quantile falls
  * back to absolute loss + residual-quantile calibration, documented at
  * [[LGBMRegressor]]). `tree_learner` is accepted and validated like
  * core.py:122-125 but has no effect (MLlib is always data-parallel).
  *
  * Feature input adapters (the reference's four `data_output` shapes,
  * tests/test_core.py:19): an `ml.linalg.Vector` column (dense or sparse —
  * the scipy-CSR/COO analogues), an `array<float|double>` column, or a list
  * of plain numeric columns (assembled). Scale note: training data never
  * collects to the driver; the model (KBs–MBs of trees) is driver-held and
  * broadcast into `transform`, exactly like the reference ships the booster
  * into each map task (core.py:165).
  */
object Featurize {
  /** Normalize any supported feature shape into a `features` vector col. */
  def apply(df: DataFrame, featuresCol: Seq[String]): DataFrame = {
    require(featuresCol.nonEmpty, "featuresCol must name at least one column")
    if (featuresCol.length > 1) {
      new VectorAssembler().setInputCols(featuresCol.toArray)
        .setOutputCol("features").transform(df)
    } else {
      val c = featuresCol.head
      df.schema(c).dataType match {
        case _: ArrayType =>
          df.withColumn("features",
            array_to_vector(col(c).cast("array<double>")))
        case _: NumericType =>
          new VectorAssembler().setInputCols(Array(c))
            .setOutputCol("features").transform(df)
        case _ => // already VectorUDT
          if (c == "features") df else df.withColumn("features", col(c))
      }
    }
  }

  /** array<double> feature accessor for the compiled scorers (r12, the
    * q72 attribution closure — tools/Q72Prof): when the caller's feature
    * column is ALREADY an array, score it directly with one exact
    * float→double widening cast. Routing the compiled Column through the
    * `features` vector instead implies `vector_to_array(array_to_vector
    * (cast(...)))` — two opaque per-row object conversions Catalyst
    * cannot elide (both are UDF-backed), measured at 3× the steady-state
    * scoring cost of the q72 pass (0.67 s vs 0.22 s at sf0.1). Values
    * are bitwise identical either way: the round trip is an identity and
    * float→double widening is exact, so the compiled SQL oracle
    * (`CAST(embedding[i] AS DOUBLE)`) replays this path term-for-term.
    * Non-array shapes (vector column, assembled plain columns) keep the
    * vector_to_array form over the Featurize output. */
  def farr(df: DataFrame, featuresCol: Seq[String]): org.apache.spark.sql.Column =
    featuresCol match {
      // c == "features" must NOT take the direct path: the Column is
      // resolved against the POST-Featurize frame, where Featurize has
      // replaced a caller's array column of that name with the vector —
      // the direct cast would be a UDT cast and fail analysis (review
      // finding, r12); such callers keep the vector_to_array form.
      case Seq(c) if c != "features" && df.schema.fieldNames.contains(c) &&
          df.schema(c).dataType.isInstanceOf[ArrayType] =>
        col(c).cast("array<double>")
      case _ => vector_to_array(col("features"))
    }
}

/** Two-frame adapter for the reference's `fit(dX, dy[, sample_weight])`
  * call shape (core.py:95-102): the reference zips the X/y/w delayeds
  * partition-by-partition and REQUIRES identical chunking — `RDD.zip`
  * enforces exactly that contract (same partition count AND same row
  * count per partition, runtime error otherwise), so misaligned frames
  * fail loudly here just as misaligned dask collections do there. The
  * single-DataFrame API remains the primary surface (co-locality is
  * structural, SURVEY §1.3); this adapter exists so a reference caller
  * holding separate frames can switch without re-keying their data. The
  * materialization cost is one pass with no shuffle — rows pair up
  * within co-located partitions.
  *
  * Alignment contract: both frames must have a DETERMINISTIC, identical
  * row order — derive them from a common hash-partitioned + key-sorted
  * parent and keep the key column in BOTH frames to assert alignment
  * (dask's index plays that role in the reference). `RDD.zip` catches
  * count/partition mismatches but cannot detect reordering; in
  * particular a round-robin `repartition()` orders by the WHOLE row for
  * its failure-determinism sort, so frames with different columns come
  * back in different orders (pinned by MLSpec's two-frame test).
  */
object ZipFrames {
  def zip(x: DataFrame, y: DataFrame): DataFrame = {
    val spark = x.sparkSession
    val outSchema = org.apache.spark.sql.types.StructType(
      x.schema.fields ++ y.schema.fields)
    val dup = x.schema.fieldNames.toSet.intersect(y.schema.fieldNames.toSet)
    require(dup.isEmpty, s"column name collision across frames: $dup")
    val rows = x.rdd.zip(y.rdd).map { case (a, b) =>
      org.apache.spark.sql.Row.fromSeq(a.toSeq ++ b.toSeq)
    }
    spark.createDataFrame(rows, outSchema)
  }
}

final case class LGBMParams(
    nEstimators: Int = 50,
    maxDepth: Int = 5,
    learningRate: Double = 0.1,
    seed: Long = 42L,
    objective: String = "",
    alpha: Double = 0.5,
    treeLearner: String = "data",
    featureFraction: Double = 1.0,
    multiclass: String = "rf") {
  require(featureFraction > 0.0 && featureFraction <= 1.0,
    s"feature_fraction must be in (0, 1], got $featureFraction")
  require(Seq("rf", "ovr_gbt").contains(multiclass),
    s"multiclass must be 'rf' or 'ovr_gbt', got '$multiclass'")
}

private[graft] object Params {
  /** LightGBM's `feature_fraction` (default 1.0 = consider every feature
    * at every split) → MLlib featureSubsetStrategy. Measured on the q71
    * workload (sf0.1, 20 trees × depth 6 × 64 features, local[32],
    * tools/P71): "all" fits in 2.7–5.4 s at train-acc 0.652, "auto"
    * (= sqrt for RF classification) 1.2–1.5 s at 0.626, "0.5" 1.9 s at
    * 0.651 — fractions buy back ~2× of the fit at equal accuracy, so the
    * default keeps LightGBM parity and callers opt into a fraction where
    * the tradeoff is measured. */
  def subsetStrategy(featureFraction: Double): String =
    if (featureFraction >= 1.0) "all" else featureFraction.toString

  /** core.py:122-125: warn+default any unsupported tree_learner to "data". */
  def validatedTreeLearner(t: String): String =
    if (Seq("data", "feature", "voting").contains(t)) t
    else {
      System.err.println(
        s"[graft.ml] tree_learner='$t' is not supported, using 'data'")
      "data"
    }

  /** Derive the class count from labels, with the failure modes the
    * reference's `classes_` (distinct label values) would surface:
    * empty/all-null labels fail fast with a clear message, and non-dense
    * label sets (e.g. {0, 5} or {-1, 1}) are rejected instead of silently
    * routing a binary problem to a multiclass estimator with phantom
    * classes. One distributed aggregate — no distinct shuffle, no collect.
    */
  def nClasses(data: org.apache.spark.sql.DataFrame): Int = {
    val row = data.agg(
      max(col("label")), min(col("label")),
      count_distinct(col("label")), count(col("label"))).head()
    require(row.getLong(3) > 0, "fit() needs at least one non-null label")
    val (mx, mn, k) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    require(mn == 0.0 && mx == math.floor(mx) && mx + 1 == k.toDouble,
      s"labels must be dense 0..k-1 (got min=$mn max=$mx distinct=$k)")
    mx.toInt + 1
  }
}

/** One-vs-rest GBT ensemble — LightGBM's `objective=multiclassova`
  * formulation (`num_class` independent one-vs-all boosters; the default
  * `multiclass` objective is coupled softmax, whose gradients depend on
  * all K scores and which K separate binary fits cannot reproduce)
  * re-expressed as K independent binary GBTs, each seeded `seed + k` to
  * decorrelate row subsampling. `transform` chains the K per-class
  * scorers in ONE plan — each is a broadcast model evaluated row-local,
  * so inference stays a single distributed pass — then L1
  * sum-normalizes the per-class sigmoid scores (argmax-preserving;
  * calibration differs from softmax, which is why MLSpec gates proba
  * behavior by sums-to-1 + sharpness, not cross-algorithm parity).
  */
final class OvRGBTModel private[graft] (val models: Array[GBTClassificationModel]) {
  def numClasses: Int = models.length

  /** Adds `prediction` (argmax, ties to the lowest class id — MLlib's
    * own argmax convention) and `probability` (normalized per-class
    * scores) to `df`, which must already carry `features`.
    *
    * r11: each per-class score is computed from the COMPILED margin
    * (TreeSql.gbtMarginCol) through the exact probability formula of
    * GBT's `raw2probabilityInPlace` (p = 1 − 1/(1+exp(2m)), both
    * `exp`s are java.lang.Math.exp) instead of K chained
    * `model.transform` calls: (a) the scorers stay inside whole-stage
    * codegen — no K per-row UDF closures; (b) the margins are the same
    * left-assoc expression trees the SQL oracle replays.
    *
    * r12: `prediction` argmaxes the MARGINS, not the sigmoid scores.
    * The sigmoid is strictly monotone, so the argmax is identical by
    * construction — but margins are pure comparisons over compiled
    * rational tree arithmetic, so `exp` leaves the prediction path
    * entirely and the last-ulp libm-vs-Java `exp` divergence (the one
    * residual the r11 oracle work documented) can never flip a hashed
    * prediction cross-engine, on any data. `exp` survives only in the
    * `probability` column, whose query projections are roundZ-quantized.
    * First-index ties: `array_position(arr, array_max(arr))` over the
    * margin array is the same first-strict-max rule as before. */
  def transform(df0: DataFrame): DataFrame =
    transform(df0, vector_to_array(col("features")))

  /** Scoring entry with an explicit feature-array accessor — the predict
    * path passes `Featurize.farr` so an array-column caller skips the
    * per-row vector round trip (see [[Featurize.farr]]). */
  private[ml] def transform(df0: DataFrame,
      farr: org.apache.spark.sql.Column): DataFrame = {
    val mcols = models.indices.map(k => s"__ovr_m$k")
    val pcols = models.indices.map(k => s"__ovr_p$k")
    var df = df0
    for ((m, k) <- models.zipWithIndex)
      df = df.withColumn(mcols(k),
        TreeSql.gbtMarginCol(m.trees, m.treeWeights, farr))
    for (k <- models.indices)
      df = df.withColumn(pcols(k),
        lit(1.0) - lit(1.0) / (lit(1.0) + exp(lit(2.0) * col(mcols(k))))) // P(y=k)
    df.withColumn("__ovr_marr", array(mcols.map(col): _*))
      .withColumn("__ovr_arr", array(pcols.map(col): _*))
      .withColumn("__ovr_sum", expr("aggregate(__ovr_arr, 0D, (a, x) -> a + x)"))
      .withColumn("probability",
        array_to_vector(expr("transform(__ovr_arr, x -> x / __ovr_sum)")))
      .withColumn("prediction",
        (expr("array_position(__ovr_marr, array_max(__ovr_marr))") - 1)
          .cast("double"))
      .drop(mcols ++ pcols: _*).drop("__ovr_marr", "__ovr_arr", "__ovr_sum")
  }

  /** Split-gain importances averaged over the K boosters, renormalized. */
  def featureImportances: Array[Double] = {
    val per = models.map(_.featureImportances.toArray)
    val avg = per.transpose.map(_.sum / models.length)
    val s = avg.sum
    if (s == 0.0) avg else avg.map(_ / s)
  }

  def save(path: String): Unit = {
    // Clear the whole target first (what MLlib's overwrite does for a
    // single flat model dir): per-class overwrite only replaces the c<k>
    // dirs this ensemble writes, so saving a K-class model over a path
    // that previously held K'>K classes would leave stale c<K>..c<K'-1>
    // dirs — and load() walks c0,c1,... takeWhile(exists), silently
    // assembling a mixed ensemble from two different fits.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    for ((m, k) <- models.zipWithIndex) m.write.save(s"$path/c$k")
  }
}

/** Classifier: binary → GBTClassifier; multiclass → RandomForestClassifier
  * by default, or K one-vs-rest GBTs with `multiclass = "ovr_gbt"`
  * (MLlib GBT is binary-only — SURVEY §7 hard part 1; see COVERAGE.md
  * §2.A for the default's rationale).
  */
class LGBMClassifier(val params: LGBMParams = LGBMParams()) {

  def fit(df: DataFrame, featuresCol: Seq[String] = Seq("features"),
      labelCol: String = "label",
      weightCol: Option[String] = None): LGBMClassifierModel = {
    Params.validatedTreeLearner(params.treeLearner) // core.py:122-125
    val labelType = df.schema(labelCol).dataType
    val data = Featurize(df, featuresCol)
      .withColumn("label", col(labelCol).cast("double"))
    // MLlib classification requires dense labels 0..k-1 — validated by
    // one distributed aggregate (fails fast on empty or non-dense labels)
    val nClasses = Params.nClasses(data)
    def gbt(seed: Long) = {
      val est = new GBTClassifier()
        .setMaxIter(params.nEstimators).setMaxDepth(params.maxDepth)
        .setStepSize(params.learningRate).setSeed(seed)
        .setFeatureSubsetStrategy(Params.subsetStrategy(params.featureFraction))
      weightCol.foreach(est.setWeightCol)
      est
    }
    val backend: Either[ProbabilisticClassificationModel[Vector, _], OvRGBTModel] =
      if (nClasses <= 2) Left(gbt(params.seed).fit(data))
      else if (params.multiclass == "ovr_gbt")
        // The K one-vs-rest fits are INDEPENDENT (separate relabelings of
        // the same frame, separate seeds) but each is a chain of tiny
        // boosting-iteration jobs whose tail leaves the cluster idle —
        // submit them from a small thread pool so fit k+1's iterations
        // back-fill fit k's scheduling gaps (actions are only sequential
        // because driver code calls them sequentially). Model k is still
        // produced by exactly the job sequence the sequential loop ran
        // (same data plan, same seed, k-indexed slot), so the ensemble is
        // bit-identical (q103 output diffed byte-equal pre/post). Measured
        // on q103 (K=3, sf0.1, interleaved A/B ×3): 7.6–9.3 s sequential
        // vs 3.6–4.0 s concurrent, ~2.3×.
        Right(new OvRGBTModel({
          // pool capped at 4 (ADVICE r13 #2): 2-3 jobs in flight already
          // fill the scheduling tail (guide §2.6), while an uncapped
          // nClasses-wide pool on a high-cardinality label would launch
          // that many concurrent fits, each persisting its own training
          // RDDs, contending on driver/scheduler/memory. Excess fits
          // queue FIFO in submission (= class) order, so the produced
          // ensemble stays the exact sequential job sequence per class.
          val pool = java.util.concurrent.Executors
            .newFixedThreadPool(math.min(nClasses, 4))
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutorService(pool)
          try {
            val fits = Array.tabulate(nClasses) { k =>
              scala.concurrent.Future {
                gbt(params.seed + k)
                  .fit(data.withColumn("label",
                    when(col("label") === k, 1.0).otherwise(0.0)))
              }
            }
            try fits.map(f => scala.concurrent.Await.result(
              f, scala.concurrent.duration.Duration.Inf))
            catch { case e: Throwable =>
              // a failed fit must not leave sibling fits running
              // uncancelled behind the rethrow: drop queued tasks and
              // interrupt in-flight ones before propagating
              pool.shutdownNow(); throw e
            }
          } finally pool.shutdown()
        }))
      else {
        val est = new RandomForestClassifier()
          .setNumTrees(params.nEstimators).setMaxDepth(params.maxDepth)
          // LightGBM's feature_fraction default is 1.0; MLlib RF's "auto"
          // would subsample sqrt(n) features per node and diverge from it
          .setFeatureSubsetStrategy(Params.subsetStrategy(params.featureFraction))
          .setSeed(params.seed)
        weightCol.foreach(est.setWeightCol)
        Left(est.fit(data))
      }
    new LGBMClassifierModel(backend, nClasses, labelType)
  }
}

class LGBMClassifierModel private[ml] (
    private[ml] val backend:
      Either[ProbabilisticClassificationModel[Vector, _], OvRGBTModel],
    val nClasses: Int,
    val labelType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.DoubleType) {

  def this(inner: ProbabilisticClassificationModel[Vector, _], nClasses: Int) =
    this(Left(inner), nClasses)

  /** classes_ analogue (reference core.py:206 passes classes_.dtype into
    * predict): the dense 0..k-1 label domain fit validated. */
  def classes_ : Array[Double] = Array.tabulate(nClasses)(_.toDouble)

  /** Lazy distributed inference (reference core.py:163-173 → transform).
    * The prediction column is cast back to the dtype of the label column
    * the model was fit on — the reference's `dtype=self.classes_.dtype`
    * (core.py:206): an int-labeled fit predicts ints, not doubles.
    *
    * r11: the binary-GBT path scores through the COMPILED margin Column
    * (TreeSql.gbtMarginCol) instead of `model.transform` — transform's
    * margin goes through netlib's fma-lane ddot, which no second engine
    * replays, so a margin within fma-rounding of 0 could flip the
    * hashed prediction between Spark and the compiled-SQL oracle on
    * regenerated data (review finding, r11). The compiled margin is the
    * exact expression the oracle replays, closing that flake class, and
    * the prediction rule is `raw2prediction`'s argmax([-m, m]) ≡ m > 0
    * verbatim; `probability` replays `raw2probabilityInPlace`
    * (p₀ = 1/(1+exp(2m)), p₁ = 1−p₀ — `-2.0·(-m)` is bitwise `2.0·m`).
    * RF multiclass keeps `transform`: its vote loop is exact scalar
    * Java arithmetic (no BLAS), already bitwise-replayable. */
  def predict(df: DataFrame, featuresCol: Seq[String] = Seq("features")): DataFrame = {
    val feat = Featurize(df, featuresCol)
    val scored = backend match {
      case Left(m: GBTClassificationModel) =>
        val margin = TreeSql.gbtMarginCol(m.trees, m.treeWeights,
          Featurize.farr(df, featuresCol))
        val p0 = lit(1.0) / (lit(1.0) + exp(lit(2.0) * margin))
        feat
          .withColumn("probability",
            array_to_vector(array(p0, lit(1.0) - p0)))
          .withColumn("prediction",
            when(margin > lit(0.0), lit(1.0)).otherwise(lit(0.0)))
      case Left(m)  => m.transform(feat)
      case Right(o) => o.transform(feat, Featurize.farr(df, featuresCol))
    }
    scored.withColumn("prediction", col("prediction").cast(labelType))
  }

  /** predict_proba: probability vector as array<double> (core.py:209-213). */
  def predictProba(df: DataFrame, featuresCol: Seq[String] = Seq("features")): DataFrame =
    predict(df, featuresCol)
      .withColumn("proba", vector_to_array(col("probability")))

  /** to_local (core.py:215-218): MLlib models are already driver-local.
    * Single-estimator backends (binary GBT, multiclass RF) return the raw
    * MLlib model; an `ovr_gbt` fit holds K boosters — use [[toLocalOvR]]. */
  def toLocal: ProbabilisticClassificationModel[Vector, _] = backend match {
    case Left(m) => m
    case Right(_) => throw new IllegalStateException(
      "ovr_gbt model holds one booster per class: use toLocalOvR")
  }

  /** The K-booster ensemble of an `ovr_gbt` fit (to_local analogue). */
  def toLocalOvR: OvRGBTModel = backend match {
    case Right(o) => o
    case Left(_) => throw new IllegalStateException(
      "single-estimator model: use toLocal")
  }

  /** feature_importances_ analogue (LightGBM sklearn surface): normalized
    * split-gain importances from the fitted ensemble. */
  def featureImportances: Array[Double] = backend match {
    case Left(m: GBTClassificationModel)          => m.featureImportances.toArray
    case Left(m: RandomForestClassificationModel) => m.featureImportances.toArray
    case Left(m) => throw new IllegalStateException(s"unexpected model $m")
    case Right(o) => o.featureImportances
  }

  /** Persist the fitted model (booster save/load analogue). A single
    * estimator saves flat; an OvR ensemble saves one `c<k>` dir per class
    * — [[LGBMClassifierModel.load]] dispatches on the layout. */
  def save(path: String): Unit = backend match {
    case Left(m: GBTClassificationModel)          => m.write.overwrite().save(path)
    case Left(m: RandomForestClassificationModel) => m.write.overwrite().save(path)
    case Left(m) => throw new IllegalStateException(s"unexpected model $m")
    case Right(o) => o.save(path)
  }
}

object LGBMClassifierModel {
  /** Reload a persisted model, dispatching on the saved layout: an OvR
    * ensemble is a row of `c<k>` dirs; a single estimator is a flat MLlib
    * dir, dispatched on the metadata's className rather than try-catch (a
    * corrupt GBT dir must surface its own error, not a confusing
    * RandomForest one); `nClasses` is recovered from the layout/model. */
  def load(path: String): LGBMClassifierModel = {
    val spark = org.apache.spark.sql.SparkSession.active
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/c0"))) {
      val models = Iterator.from(0)
        .map(k => new org.apache.hadoop.fs.Path(s"$path/c$k"))
        .takeWhile(fs.exists).map(p => GBTClassificationModel.load(p.toString))
        .toArray
      new LGBMClassifierModel(Right(new OvRGBTModel(models)), models.length)
    } else {
      val meta = spark.read.text(s"$path/metadata").head().getString(0)
      val m =
        if (meta.contains("RandomForestClassificationModel"))
          RandomForestClassificationModel.load(path)
        else GBTClassificationModel.load(path)
      new LGBMClassifierModel(Left(m), m.numClasses)
    }
  }
}

/** Regressor: GBTRegressor; `objective='quantile', alpha` trains NATIVE
  * pinball loss via [[Pinball]] (boosted trees on the pinball subgradient
  * with exact per-leaf quantile line search — the reference's LightGBM
  * semantics, tests/test_core.py:148-164). One documented exception: a
  * weighted quantile fit falls back to the r1–r9 absolute-loss +
  * global-residual-quantile calibration (MLlib has no weighted percentile
  * and the reference's quantile test is unweighted); its coverage holds
  * marginally (MLSpec property) but not conditionally on heteroscedastic
  * data — the limitation the native path removes.
  */
class LGBMRegressor(val params: LGBMParams = LGBMParams()) {

  def fit(df: DataFrame, featuresCol: Seq[String] = Seq("features"),
      labelCol: String = "label",
      weightCol: Option[String] = None): LGBMRegressorModel = {
    Params.validatedTreeLearner(params.treeLearner) // core.py:122-125
    val data = Featurize(df, featuresCol)
      .withColumn("label", col(labelCol).cast("double"))
    if (params.objective == "quantile" && weightCol.isEmpty) {
      // NO cast after vector_to_array: it already returns array<double>
      // with containsNull=false, and a cast to the DDL type (containsNull
      // =true) is a no-op SimplifyCasts removes during optimization —
      // leaving the analyzed and optimized plans disagreeing on the
      // ArrayType's containsNull, which is exactly the `WARN LogicalRDD:
      // output columns ... aren't the same` every Pinball localCheckpoint
      // then emits (r10 verdict item 4; root-caused via tools/PinWarnProbe).
      val pdata = data.withColumn("_farr",
        vector_to_array(col("features")))
      val pb = Pinball.fit(pdata, params.alpha, params.nEstimators,
        params.maxDepth, params.learningRate, params.seed)
      new LGBMRegressorModel(Right(pb))
    } else {
      val est = new GBTRegressor()
        .setMaxIter(params.nEstimators).setMaxDepth(params.maxDepth)
        .setStepSize(params.learningRate).setSeed(params.seed)
        .setFeatureSubsetStrategy(
          Params.subsetStrategy(params.featureFraction))
      if (params.objective == "quantile") est.setLossType("absolute")
      weightCol.foreach(est.setWeightCol)
      val model = est.fit(data)
      val offset =
        if (params.objective == "quantile") {
          // shift by the α-quantile of training residuals (distributed
          // Greenwald-Khanna sketch; never collects the residuals)
          val resid = model.transform(data)
            .select((col("label") - col("prediction")).as("r"))
          resid.stat.approxQuantile("r", Array(params.alpha), 0.001).head
        } else 0.0
      new LGBMRegressorModel(Left((model, offset)))
    }
  }
}

class LGBMRegressorModel private[graft] (
    private[graft] val backend: Either[(GBTRegressionModel, Double), PinballModel]) {

  def this(inner: GBTRegressionModel, offset: Double) =
    this(Left((inner, offset)))

  /** The GBT backend (absolute/L2 paths); a pinball model has no single
    * MLlib estimator inside — use [[toLocalPinball]]. */
  def inner: GBTRegressionModel = backend match {
    case Left((m, _)) => m
    case Right(_) => throw new IllegalStateException(
      "quantile models are pinball-GBT ensembles; use toLocalPinball")
  }

  /** Global additive calibration: the residual-quantile shift for the
    * legacy path, the f₀ init for the pinball path. */
  def offset: Double = backend match {
    case Left((_, o)) => o
    case Right(pb) => pb.f0
  }

  /** Inference compiles the fitted ensemble to a native Column over the
    * feature array (TreeSql.gbtMarginCol / Pinball.predictCol) instead of
    * calling `model.transform`: (a) the scorer stays inside whole-stage
    * codegen — `transform` wraps a per-row UDF closure; (b) the margin is
    * a fixed left-assoc expression tree, so predictions are bitwise
    * REPRODUCIBLE and portable — MLlib's own scorer routes the tree dot
    * through netlib's `Java11BLAS.ddotK`, whose 4-lane `Math.fma`
    * accumulation no second engine (or future JDK) is guaranteed to
    * replay. Values agree with `transform` to fma-lane rounding (≤ ulps;
    * MLSpec pins the equivalence). */
  def predict(df: DataFrame, featuresCol: Seq[String] = Seq("features")): DataFrame =
    backend match {
      case Left((m, off)) =>
        val margin = TreeSql.gbtMarginCol(m.trees, m.treeWeights,
          Featurize.farr(df, featuresCol))
        Featurize(df, featuresCol).withColumn("prediction",
          if (off != 0.0) margin + lit(off) else margin)
      case Right(pb) =>
        Featurize(df, featuresCol).withColumn("prediction",
          pb.predictCol(Featurize.farr(df, featuresCol)))
    }

  def toLocal: PredictionModel[Vector, _] = backend match {
    case Left((m, _)) => m
    case Right(_) => throw new IllegalStateException(
      "quantile models are pinball-GBT ensembles; use toLocalPinball")
  }

  /** to_local analogue for the native-quantile path. */
  def toLocalPinball: PinballModel = backend match {
    case Right(pb) => pb
    case Left(_) => throw new IllegalStateException(
      "not a quantile model; use toLocal")
  }

  /** feature_importances_ analogue; for the pinball ensemble the stage
    * trees' importance vectors are averaged (equal stage weight). */
  def featureImportances: Array[Double] = backend match {
    case Left((m, _)) => m.featureImportances.toArray
    case Right(pb) =>
      val dims = pb.stages.head._1.featureImportances.size
      val acc = new Array[Double](dims)
      pb.stages.foreach { case (t, _) =>
        t.featureImportances.foreachActive((i, v) => acc(i) += v)
      }
      val tot = acc.sum
      if (tot > 0) acc.map(_ / tot) else acc
  }

  /** Persist the fitted model. GBT path: MLlib trees + the quantile
    * offset sidecar (Hadoop FileSystem API so hdfs:///s3a:// paths work
    * like the trees writer, not just the local disk). Pinball path: one
    * tree dir per stage + the pinball_meta sidecar — load dispatches on
    * which layout it finds. */
  def save(path: String): Unit = backend match {
    case Left((m, off)) =>
      m.write.overwrite().save(s"$path/trees")
      val p = new org.apache.hadoop.fs.Path(s"$path/offset")
      val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(off.toString.getBytes("UTF-8")) finally out.close()
    case Right(pb) => pb.save(path)
  }
}

object LGBMRegressorModel {
  def load(path: String): LGBMRegressorModel = {
    val meta = new org.apache.hadoop.fs.Path(s"$path/pinball_meta")
    val fs = meta.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    if (fs.exists(meta))
      new LGBMRegressorModel(Right(PinballModel.load(path)))
    else {
      val p = new org.apache.hadoop.fs.Path(s"$path/offset")
      val in = fs.open(p)
      val off =
        try new String(in.readAllBytes(), "UTF-8").trim.toDouble
        finally in.close()
      new LGBMRegressorModel(
        Left((GBTRegressionModel.load(s"$path/trees"), off)))
    }
  }
}
