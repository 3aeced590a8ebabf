package graft.operators

import graft.{Num, QueryDef, Tables}
import graft.ml.{LGBMClassifier, LGBMClassifierModel, LGBMParams,
  LGBMRegressor, LGBMRegressorModel, TreeSql}
import org.apache.spark.ml.classification.{GBTClassificationModel,
  RandomForestClassificationModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML operator queries (SURVEY §2.A) over the `embeddings` table.
  *
  * r11: every query here is ORACLE-CHECKED. DuckDB cannot fit a tree
  * ensemble, but it can SCORE one: a fitted model is a closed-form
  * piecewise-constant expression, so each query compiles its fitted trees
  * into portable SQL ([[graft.ml.TreeSql]]) and registers it as a
  * FIT-DEPENDENT oracle (`QueryDef.oracleGen`). This is the reference's
  * own oracle discipline — train once, score the same rows in a second
  * engine, compare predictions (dask_lightgbm/tests/test_core.py:82-87) —
  * upgraded from atol-parity to the driver's bitwise hash gate. The
  * quality thresholds (accuracy/R² > 0.8) remain in MLSpec, mirroring
  * system_tests/test_fit_predict.py:39,59.
  *
  * r12: every `prediction` projection is TRANSCENDENTAL-FREE — compiled
  * rational tree arithmetic plus comparisons — in both engines (q103
  * argmaxes raw margins; sigmoid `exp` survives only in roundZ-quantized
  * probability projections, guarded at oracle-gen time by [[q103Guard]]).
  *
  * Train-time scale: GBT/RF fit never collects features to the driver;
  * each iteration is a distributed aggregation over the DataFrame, the
  * model (trees) lives on the driver and broadcasts into `transform` —
  * the same topology the reference engineers by hand (core.py:113-141).
  * The compiled oracle text is model-sized driver state; it never touches
  * the data path.
  */
object MLQueries {

  private def emb(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  private def features(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(
      col("vec_id"),
      col("embedding"),
      col("label").cast("double").as("label10"),
      (col("label") >= 5).cast("double").as("label_bin"))

  /** Fitted-model memo, keyed (query, sfDir) — r12 rework of the r11
    * scorer-SQL memo (ADVICE r11 item 4): the memo holds the fitted MODEL
    * and every query factors its fit into a standalone `fit` function, so
    * the oracle generator compiles its SQL from the model WITHOUT
    * executing the full query body (the r11 shape re-ran q185's staging
    * writes plus the whole streaming replay on a cold cache just to emit
    * oracle text). Query fns still REFIT on every call ([[memoPut]]
    * overwrites) — bench timings must keep paying each query's own
    * training cost — while generators ([[memoGet]]) reuse the exact model
    * that produced the dumped parquet in a full Verify run, refitting
    * (seeded, deterministic — MLlib tree aggregation merges per-partition
    * stats in partition order) only on a cold cache (subset runs,
    * standalone oracle dumps). */
  private val fitMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]

  private def memoPut[M <: AnyRef](name: String, d: String, m: M): M = {
    fitMemo.put((name, d), m); m
  }

  private def memoGet[M <: AnyRef](name: String, d: String, fit: () => M): M =
    fitMemo.computeIfAbsent((name, d), _ => fit()).asInstanceOf[M]

  /** Feature j of the embeddings table in DuckDB (1-based list indexing);
    * FLOAT→DOUBLE widening is exact, matching Featurize's array<double>
    * cast on the Spark side. */
  private def featE(j: Int): String = s"CAST(embedding[${j + 1}] AS DOUBLE)"

  /** Content fingerprint of the embeddings table (EventStreams'
    * eventsFingerprint pattern): keys q185's cross-JVM staging dir so an
    * in-place testdata regeneration invalidates the staged slices instead
    * of replaying stale rows against a fresh-fit oracle — q185 was
    * rows-only when its staging was written and is oracle-gated since
    * r11, which promoted staleness from a perf wart to a red row
    * (StagingSpec pins the regeneration scenario). */
  private val embFp =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private[graft] def resetStagingMemoForTest(): Unit = embFp.clear()

  private def embFingerprint(s: SparkSession, d: String): String =
    embFp.computeIfAbsent(d, _ => {
      val r = emb(s, d).agg(
        count(lit(1)), coalesce(max(col("vec_id")), lit(0L)),
        coalesce(sum(col("label").cast("long")), lit(0L)),
        coalesce(expr("bit_xor(xxhash64(vec_id, label, embedding))"),
          lit(0L))).first()
      s"${r.getLong(0)}_" + java.lang.Long.toHexString(
        r.getLong(1) ^ java.lang.Long.rotateLeft(r.getLong(2), 17) ^
          java.lang.Long.rotateLeft(r.getLong(3), 31))
    })

  /** NULL-propagating, matching the Spark side's `(label >= 5).cast
    * ("double")` exactly (ADVICE r11 item 3: the bare CASE mapped NULL →
    * 0.0 — latent, since fit's dense-label require rejects null labels
    * today, but the oracle text should not encode a divergence). */
  private val labelBinSql =
    "CASE WHEN label IS NULL THEN NULL " +
      "WHEN label >= 5 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"

  private def accSql(predEq: String): String =
    s"avg(CASE WHEN $predEq THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"

  /** Shared CTE text scoring the embeddings table with a fitted RF: `lv`
    * binds per-tree leaf vote lists, `v` binds raw votes v0..v{K-1} plus
    * `label` — the compiled form q71/q374/q375's oracles all build on. */
  private def rfVotesCte(rf: RandomForestClassificationModel): String = {
    val lists = TreeSql.rfTreeLists(rf, featE)
    val lvCols = lists.indices.map(i => s"l$i")
    s"""lv AS (SELECT vec_id, label, ${lists.zipWithIndex
         .map { case (sql, i) => s"($sql) AS l$i" }.mkString(", ")}
         FROM embeddings),
       v AS (SELECT vec_id, label, ${(0 until rf.numClasses)
         .map(k => s"${TreeSql.rfVoteSql(lvCols, k)} AS v$k").mkString(", ")}
         FROM lv)"""
  }

  // ---------------------------------------------------------------- q70
  private val q70Name = "q70_ml_gbt_binary_classifier"
  private def q70Fit(s: SparkSession, d: String): LGBMClassifierModel =
    new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label_bin")
  private def binPredictSql(m: LGBMClassifierModel): String = {
    val gbt = m.toLocal.asInstanceOf[GBTClassificationModel]
    s"""SELECT vec_id, $labelBinSql AS label_bin,
       ${TreeSql.gbtBinaryPredictionSql(gbt, featE)} AS prediction
       FROM embeddings ORDER BY vec_id"""
  }
  private val q70Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q70Name, d, q70Fit(s, d))
    m.predict(features(s, d), Seq("embedding"))
      .select(col("vec_id"), col("label_bin"), col("prediction"))
      .orderBy(col("vec_id"))
  }
  private val q70 = QueryDef(q70Name, q70Fn, None,
    Some((s, d) => binPredictSql(memoGet(q70Name, d, () => q70Fit(s, d)))))

  // ---------------------------------------------------------------- q71
  private val q71Name = "q71_ml_rf_multiclass_proba"
  private def q71Fit(s: SparkSession, d: String): LGBMClassifierModel =
    // feature_fraction 0.5: measured equal train accuracy to 1.0 on this
    // workload (0.6505 vs 0.6520) at ~half the fit cost (tools/P71,
    // sf0.1: 1.9 s vs 2.7–5.4 s) — the r2 "all" setting paid an
    // unmeasured 2× for parity the quality gates never needed
    new LGBMClassifier(
      LGBMParams(nEstimators = 20, maxDepth = 6, featureFraction = 0.5))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label10")
  private def q71Sql(m: LGBMClassifierModel): String = {
    val rf = m.toLocal.asInstanceOf[RandomForestClassificationModel]
    // Oracle: per-tree leaf vote LISTs bound once in a CTE, votes as
    // left-assoc sums in tree order (predictRaw's += loop), prediction =
    // first-index argmax of the raw votes (raw2prediction, thresholds
    // unset). proba itself is not projected (its per-row array would be
    // this same model state); n_classes pins the ensemble's class count.
    val vCols = (0 until rf.numClasses).map(k => s"v$k")
    s"""WITH ${rfVotesCte(rf)}
       SELECT vec_id, ${TreeSql.argmaxFirstSql(vCols)} AS prediction,
              CAST(${rf.numClasses} AS BIGINT) AS n_classes
       FROM v ORDER BY vec_id"""
  }
  private val q71Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q71Name, d, q71Fit(s, d))
    m.predictProba(features(s, d), Seq("embedding"))
      .select(col("vec_id"), col("prediction"),
        size(col("proba")).cast("long").as("n_classes"))
      .orderBy(col("vec_id"))
  }
  private val q71 = QueryDef(q71Name, q71Fn, None,
    Some((s, d) => q71Sql(memoGet(q71Name, d, () => q71Fit(s, d)))))

  // ---------------------------------------------------------------- q72
  private val q72Name = "q72_ml_gbt_regressor"
  private def q72Fit(s: SparkSession, d: String): LGBMRegressorModel =
    new LGBMRegressor(LGBMParams(nEstimators = 10, maxDepth = 4))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label10")
  private def q72Sql(m: LGBMRegressorModel): String = {
    val reg = m.inner
    // Full-precision prediction is oracle-safe: LGBMRegressorModel.predict
    // scores through the compiled gbtMarginCol expression (NOT MLlib's
    // fma-lane ddot — TreeSql scaladoc), and gbtMarginSql mirrors that
    // expression term-for-term, so both engines evaluate identical IEEE
    // operations and the hash matches bitwise without rounding.
    s"""SELECT vec_id, CAST(label AS DOUBLE) AS label10,
       ${TreeSql.gbtMarginSql(reg.trees, reg.treeWeights, featE)} AS prediction
       FROM embeddings ORDER BY vec_id"""
  }
  private val q72Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q72Name, d, q72Fit(s, d))
    m.predict(features(s, d), Seq("embedding"))
      .select(col("vec_id"), col("label10"), col("prediction"))
      .orderBy(col("vec_id"))
  }
  private val q72 = QueryDef(q72Name, q72Fn, None,
    Some((s, d) => q72Sql(memoGet(q72Name, d, () => q72Fit(s, d)))))

  // ---------------------------------------------------------------- q73
  private val q73Name = "q73_ml_quantile_coverage"
  private def q73Fit(s: SparkSession, d: String): LGBMRegressorModel =
    // r10: the quantile objective is the NATIVE pinball trainer (one
    // MLlib DecisionTreeRegressor fit per boosting stage — the K×
    // estimator-fit scheduling floor q103's OvR measurement
    // documents, ~0.6 s/stage at sf0.1). Marginal coverage holds from
    // the f₀ = global-quantile init by construction, and the
    // line-search stages converge the conditional shape fast, so the
    // gate demonstrates the trainer at 6 stages instead of paying the
    // floor 10×; MLSpec runs the full-budget coverage properties.
    new LGBMRegressor(
      LGBMParams(nEstimators = 6, maxDepth = 4,
        objective = "quantile", alpha = 0.9))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label10")
  private def q73Sql(m: LGBMRegressorModel): String = {
    val pb = m.toLocalPinball
    // The pinball predictor is already a pure expression (no ddot): the
    // SQL mirror reproduces the Column fold term-for-term, so the
    // coverage comparison `label <= f(x)` is bitwise cross-engine.
    s"""SELECT ${accSql(
         s"CAST(label AS DOUBLE) <= ${TreeSql.pinballSql(pb, featE)}")} AS coverage,
       COUNT(*) AS n FROM embeddings"""
  }
  private val q73Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q73Name, d, q73Fit(s, d))
    m.predict(features(s, d), Seq("embedding"))
      .agg(
        avg((col("label10") <= col("prediction")).cast("double"))
          .as("coverage"),
        count(lit(1)).as("n"))
  }
  private val q73 = QueryDef(q73Name, q73Fn, None,
    Some((s, d) => q73Sql(memoGet(q73Name, d, () => q73Fit(s, d)))))

  // ---------------------------------------------------------------- q74
  private val q74Name = "q74_ml_accuracy_metric"
  private def q74Fit(s: SparkSession, d: String): LGBMClassifierModel =
    new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label_bin")
  private def q74Sql(m: LGBMClassifierModel): String = {
    val gbt = m.toLocal.asInstanceOf[GBTClassificationModel]
    s"""SELECT ${accSql(
         s"$labelBinSql = ${TreeSql.gbtBinaryPredictionSql(gbt, featE)}")} AS accuracy,
       COUNT(*) AS n FROM embeddings"""
  }
  private val q74Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q74Name, d, q74Fit(s, d))
    // reference metric-as-query: (dy == dy_pred).sum() / len(dy)
    // (system_tests/test_fit_predict.py:35)
    m.predict(features(s, d), Seq("embedding"))
      .agg(
        avg((col("label_bin") === col("prediction")).cast("double"))
          .as("accuracy"),
        count(lit(1)).as("n"))
  }
  private val q74 = QueryDef(q74Name, q74Fn, None,
    Some((s, d) => q74Sql(memoGet(q74Name, d, () => q74Fit(s, d)))))

  // --------------------------------------------------------------- q103
  // The ovr_gbt multiclass path through the driver gate: 3 one-vs-rest
  // GBT fits (label % 3 keeps K — and the K× training cost — small) and
  // the chained single-pass inference. Class-count and proba-shape are
  // part of the projected output so a broken ensemble assembly fails the
  // gate; proba calibration itself is gated by MLSpec's atol=0.3 parity.
  //
  // Cost note (measured ~6.7 s warm at sf0.1 vs q71's RF ~2.2 s on the
  // same features): each boosting iteration is a distributed job, so K
  // sequential fits pay K× the per-iteration scheduling floor — at toy
  // scale that floor dominates (nEstimators 10→8 moved the time < 10%).
  // This bench line IS the documented reason `multiclass="rf"` stays the
  // default: the K× is structural, not an implementation accident, and
  // amortizes only when per-iteration work is GB-sized.
  private val q103Name = "q103_ml_ovr_gbt_multiclass"
  private def q103Fit(s: SparkSession, d: String): LGBMClassifierModel =
    // feature_fraction 0.5: the P71-measured ~2x fit-cost saving at
    // equal quality applies per ovr booster, so it compounds over K
    new LGBMClassifier(
      LGBMParams(nEstimators = 8, maxDepth = 4, featureFraction = 0.5,
        multiclass = "ovr_gbt"))
      .fit(features(s, d).withColumn("label3",
        (col("label10") % 3).cast("double")),
        featuresCol = Seq("embedding"), labelCol = "label3")
  private def q103Sql(m: LGBMClassifierModel): String = {
    val ovr = m.toLocalOvR
    // Oracle: per-class margins bound once; prediction = first-index
    // argmax over the RAW MARGINS (r12 — sigmoid is strictly monotone,
    // so this is OvRGBTModel.transform's argmax exactly, with `exp`
    // removed from the prediction path in both engines); p_k replays
    // GBT's raw2probabilityInPlace verbatim (TreeSql.ovrProbSql);
    // proba_sum re-normalizes and roundZ's — the scaled-BIGINT round
    // making the ≈1.0 sum hash-stable cross-engine, guarded by
    // [[q103Guard]] against boundary-adjacent sums.
    val K = ovr.numClasses
    val mCols = (0 until K).map(k => s"m$k")
    val pCols = (0 until K).map(k => s"p$k")
    val sm = pCols.map(c => s"($c)").reduce((a, b) => s"($a + $b)")
    val normSum = pCols.map(c => s"($c / sm)").reduce((a, b) => s"($a + $b)")
    s"""WITH mg AS (SELECT vec_id, ${ovr.models.zipWithIndex.map { case (mk, k) =>
         s"${TreeSql.gbtMarginSql(mk.trees, mk.treeWeights, featE)} AS m$k"
       }.mkString(", ")} FROM embeddings),
       p AS (SELECT vec_id, ${mCols.mkString(", ")}, ${mCols.zip(pCols)
         .map { case (mc, pc) =>
           s"${TreeSql.ovrProbSql(mc)} AS $pc" }.mkString(", ")} FROM mg),
       sp AS (SELECT vec_id, ${mCols.mkString(", ")}, ${pCols.mkString(", ")},
              $sm AS sm FROM p)
       SELECT vec_id, ${TreeSql.argmaxFirstSql(mCols)} AS prediction,
              CAST($K AS BIGINT) AS n_classes,
              ${Num.roundZSql(s"($normSum)", 6)} AS proba_sum
       FROM sp ORDER BY vec_id"""
  }
  /** ADVICE r11 item 1: `proba_sum` is the one projection where a 1-ulp
    * libm-vs-Java `exp` difference could still flip the bitwise gate —
    * when the normalized sum lands within an ulp of its 0.5e-6 round-half
    * boundary. Assert at oracle-gen time that no scored row sits within
    * 1e-8 of a boundary (the cross-engine drift bound is ~K·ulp(1)·1e6 ≈
    * 7e-10 for K=3); a violation throws, and `oracleSqlFor`'s catch
    * degrades q103 to the driver's rows-only check instead of risking a
    * red hash row on regenerated data. One extra scoring pass, oracle-gen
    * time only — never in the benched query path. */
  private def q103Guard(s: SparkSession, d: String,
      m: LGBMClassifierModel): Unit = {
    val distRow = m.predictProba(features(s, d), Seq("embedding"))
      .select(expr("aggregate(proba, 0D, (a, x) -> a + x)").as("sm"))
      .select((abs(col("sm") * lit(1e6) - floor(col("sm") * lit(1e6))
        - lit(0.5))).as("dist"))
      .agg(min(col("dist"))).head()
    // min() over zero rows is NULL (ADVICE r12): an empty embeddings
    // table has no rows to drift, so the guard passes vacuously instead
    // of throwing a misleading NPE into the rows-only fallback log.
    if (distRow.isNullAt(0)) return
    val dist = distRow.getDouble(0)
    require(dist > 1e-8,
      f"q103 proba_sum within $dist%.3g of a rounding boundary - " +
        "falling back to the rows-only check")
  }
  private val q103Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q103Name, d, q103Fit(s, d))
    m.predictProba(features(s, d), Seq("embedding"))
      .select(col("vec_id"), col("prediction"),
        size(col("proba")).cast("long").as("n_classes"),
        Num.roundZ(expr("aggregate(proba, 0D, (a, x) -> a + x)"), 6)
          .as("proba_sum"))
      .orderBy(col("vec_id"))
  }
  private val q103 = QueryDef(q103Name, q103Fn, None,
    Some((s, d) => {
      val m = memoGet(q103Name, d, () => q103Fit(s, d))
      q103Guard(s, d, m)
      q103Sql(m)
    }))

  // --------------------------------------------------------------- q185
  // Streaming model inference — the online half of the train-batch /
  // score-stream split every production ML pipeline runs: the classifier
  // is fit ONCE on the static table, then the same rows replayed as a
  // 4-file stream are scored per micro-batch by `model.transform` inside
  // the streaming query. The model is driver-held tree state broadcast
  // into each batch's tasks (a pure projection — no state store, no
  // shuffle, watermark-free), so scoring throughput scales with executor
  // count exactly like a stateless map. Gate: the compiled-scorer oracle
  // checks the streamed output against DuckDB scoring the STATIC table —
  // the cross-engine form of StreamingMLSpec's stream-scored ≡
  // batch-scored pin (batching boundaries cannot change a stateless
  // model's output).
  /** Stage the feature table as 4 mtime-ordered slice files — stable per
    * (tmpdir, sf-dir, CONTENT fingerprint): the [[embFingerprint]] in the
    * leaf name invalidates reuse when the table is regenerated in place
    * (StagingSpec pins the scenario); superseded stagings are removed;
    * _READY written last, the EventStreams staging contract. */
  private[graft] def stagedMlScore(s: SparkSession, d: String): String = synchronized {
    // synchronized: the check-then-build below is not atomic, and the test
    // suites now run query fns concurrently (ParSweep) — harmless today
    // (one query uses this staging) but cheap insurance against two
    // concurrent first calls corrupting the dir
    val df = features(s, d)
    val parent = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream",
      d.replaceAll("[^A-Za-z0-9.]", "_"))
    val dir = parent.resolve(s"ml_score_${embFingerprint(s, d)}")
    val ready = dir.resolve("_READY")
    if (!java.nio.file.Files.exists(ready)) {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(parent))
        java.nio.file.Files.list(parent).iterator.asScala.toSeq
          .filter(_.getFileName.toString.startsWith("ml_score"))
          .foreach { p =>
            java.nio.file.Files.walk(p)
              .sorted(java.util.Comparator.reverseOrder())
              .iterator.asScala.foreach(java.nio.file.Files.delete)
          }
      java.nio.file.Files.createDirectories(dir)
      val stage = dir.resolve("_work").toString
      df.withColumn("fid", (col("vec_id") % 4).cast("int"))
        .repartition(col("fid"))
        .write.mode("overwrite").partitionBy("fid").parquet(stage)
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .iterator.asScala.filter(_.getFileName.toString.startsWith("fid="))
        .toSeq.sortBy(_.getFileName.toString)
      parts.foreach { p =>
        val f = java.nio.file.Files.list(p).iterator.asScala
          .filter(_.toString.endsWith(".parquet")).toSeq.head
        java.nio.file.Files.move(f,
          dir.resolve(s"${p.getFileName.toString.replace("=", "_")}.parquet"))
      }
      java.nio.file.Files.walk(java.nio.file.Paths.get(stage))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(java.nio.file.Files.delete)
      java.nio.file.Files.createFile(ready)
    }
    dir.toString
  }

  private val q185Name = "q185_stream_ml_scoring"
  private def q185Fit(s: SparkSession, d: String): LGBMClassifierModel =
    new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label_bin")
  private val q185Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val df = features(s, d)
    val m = memoPut(q185Name, d, q185Fit(s, d))
    val dir = stagedMlScore(s, d)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val src = ss.readStream
      .schema(df.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val name = s"graft_ml_stream_${System.identityHashCode(src).toHexString}"
    val q = m.predict(src, Seq("embedding"))
      .select(col("vec_id"), col("label_bin"), col("prediction"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      var last = -2L; var cur = -1L
      while (cur != last) {
        last = cur
        q.processAllAvailable()
        cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      }
    } finally q.stop()
    ss.table(name).orderBy(col("vec_id"))
  }
  private val q185 = QueryDef(q185Name, q185Fn, None,
    // r12 (ADVICE item 4): the generator compiles the scorer from the
    // memoized fit alone — a cold cache refits the model but never
    // replays the staging writes or the streaming pipeline.
    Some((s, d) => binPredictSql(memoGet(q185Name, d, () => q185Fit(s, d)))))

  // --------------------------------------------------------------- q261
  // PERMUTATION feature importance ([EXT]) — the model-agnostic
  // importance measure (Breiman 2001) that complements the trained
  // model's internal `featureImportances`: break one feature's
  // relationship to the label by swapping its values across rows, and
  // measure the accuracy drop. Internal importances can mislead under
  // correlated features; the permutation form measures what the model
  // actually loses.
  //
  // Everything is deterministic and distributed: the "permutation" is
  // the XOR-pair swap vec_id ↔ vec_id^1 — a pure projection + one
  // equi-join (no global sort, no seeded RNG to reconcile), self-inverse,
  // and a valid permutation of the id space (odd ids missing a partner
  // keep their own value — at most one row). Eight probe dims bound the
  // cost: each scored pass is one broadcast-model transform over the
  // corpus (8 passes total; a production sweep batches all dims into one
  // pass by scoring a struct of permuted copies). The per-dim substitute
  // uses an indexed `transform` lambda in a PROJECTION (not a generator
  // — the q39 lambda-in-Generate trap does not apply).
  // Oracle: the compiled scorer runs over the SAME xor-paired frame in
  // DuckDB, one scorer instance per probed dim with feature i redirected
  // to the donor column.
  private val q261Name = "q261_ml_permutation_importance"
  private def q261Fit(s: SparkSession, d: String): LGBMClassifierModel =
    new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label_bin")
  private def q261Sql(m: LGBMClassifierModel): String = {
    val gbt = m.toLocal.asInstanceOf[GBTClassificationModel]
    def permFeat(i: Int)(j: Int): String =
      if (j == i) s"CAST(demb[${i + 1}] AS DOUBLE)" else featE(j)
    val dimSelects = (0 until 8).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS feature_idx, ${accSql(
           s"${TreeSql.gbtBinaryPredictionSql(gbt, permFeat(i))} = label_bin")} AS perm_acc
         FROM paired"""
    }
    s"""WITH paired AS (
         SELECT e.vec_id, e.embedding, $labelBinSql AS label_bin,
                COALESCE(dn.demb, e.embedding) AS demb
         FROM embeddings e
         LEFT JOIN (SELECT xor(vec_id, 1) AS vec_id, embedding AS demb
                    FROM embeddings) dn USING (vec_id)),
       base AS (SELECT ${accSql(
         s"${TreeSql.gbtBinaryPredictionSql(gbt, featE)} = label_bin")} AS base_acc
         FROM paired),
       dims AS (${dimSelects.mkString(" UNION ALL ")})
       SELECT feature_idx,
              ${Num.roundZSql("base_acc", 6)} AS base_acc,
              ${Num.roundZSql("perm_acc", 6)} AS perm_acc,
              ${Num.roundZSql("base_acc - perm_acc", 6)} AS importance
       FROM dims CROSS JOIN base ORDER BY feature_idx"""
  }
  private val q261Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val df = features(s, d)
    val m = memoPut(q261Name, d, q261Fit(s, d))
    // r13 (guide §2.3 "aggregate before you shuffle" / §1.2 fewer passes):
    // the r8 shape ran NINE corpus passes — base + one per probed dim,
    // each a scan + xor-pair join + compiled-scorer projection + its own
    // aggregate, unioned. All nine accuracies are sums over the SAME
    // paired frame, so one aggregate computes them in a single pass: per
    // row, score the base array and the 8 per-dim substituted arrays
    // (the exact expressions m.predict builds — margin > 0, compared to
    // label_bin), and sum the 9 exact longs + one count together. Long
    // sums are order-independent and the final double divisions see the
    // same operands, so every accuracy is bit-identical to the 9-pass
    // form (output diffed byte-equal pre/post; oracle text unchanged).
    // stack() then unpivots the single result row to the 8 output rows.
    // Measured (sf0.1, interleaved A/B ×3): a WASH at this SF — 5.3–7.4 s
    // vs 6.7–7.2 s — because the fit floor dominates and the 9 union
    // branches already overlapped on the scheduler; the win is the pass
    // count at scale (1 corpus scan + 1 xor-join instead of 9 of each —
    // 9× less I/O and shuffle where the corpus is the cost).
    val gbt = m.toLocal.asInstanceOf[GBTClassificationModel]
    val donor = df.select(
      expr("CAST(vec_id ^ 1 AS BIGINT)").as("vec_id"),
      col("embedding").as("demb"))
    val paired = df.join(donor, Seq("vec_id"), "left")
      .withColumn("demb", coalesce(col("demb"), col("embedding")))
    def okFlag(featArr: org.apache.spark.sql.Column) = {
      val margin = TreeSql.gbtMarginCol(gbt.trees, gbt.treeWeights, featArr)
      val pred = when(margin > lit(0.0), lit(1.0)).otherwise(lit(0.0))
        .cast("double") // labelType of the label_bin fit
      when(pred === col("label_bin"), 1L).otherwise(0L)
    }
    // q158 discipline: the per-row work is multiplied AFTER the join's
    // exchange (9 compiled scorers per row), which AQE cannot see — it
    // coalesces the ~30 MB join output to one partition and the scoring
    // runs single-task (measured 6.9 s). An explicit count pins the
    // spread; defaultParallelism scales with the cluster, not the SF.
    val spread = paired.repartition(
      paired.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
    // The substituted arrays are materialized as their OWN projection
    // level: a transform() lambda is CodegenFallback, which
    // subexpression elimination skips, so inlining it under a compiled
    // scorer re-evaluates the lambda at every leaf access (~300× per
    // tree walk — measured 23 s). As named columns each array is built
    // once per row, and CollapseProject keeps the level because each
    // alias is referenced ~300 times by the scorer above (non-cheap
    // duplication guard). The flags then live in a codegen'd projection
    // and the aggregate sums 9 plain longs.
    val arred = spread.select(
      col("label_bin") +:
        col("embedding").cast("array<double>").as("emb_base") +:
        (0 until 8).map(i =>
          expr(s"transform(embedding, (x, j) -> IF(j = $i, demb[$i], x))")
            .cast("array<double>").as(s"emb_$i")): _*)
    val flagged = arred.select(
      okFlag(col("emb_base")).as("okf_base") +:
        (0 until 8).map(i => okFlag(col(s"emb_$i")).as(s"okf_$i")): _*)
    val aggs =
      sum(col("okf_base")).as("ok_base") +:
        (0 until 8).map(i => sum(col(s"okf_$i")).as(s"ok_$i")) :+
        count(lit(1)).as("n")
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    one.select(
      expr("stack(8, " + (0 until 8)
        .map(i => s"CAST($i AS BIGINT), ok_$i").mkString(", ") +
        ") AS (feature_idx, ok_perm)"),
      col("ok_base"), col("n"))
      .select(col("feature_idx"),
        (col("ok_base").cast("double") / col("n").cast("double"))
          .as("base_acc"),
        (col("ok_perm").cast("double") / col("n").cast("double"))
          .as("perm_acc"))
      .select(col("feature_idx"),
        Num.roundZ(col("base_acc"), 6).as("base_acc"),
        Num.roundZ(col("perm_acc"), 6).as("perm_acc"),
        Num.roundZ(col("base_acc") - col("perm_acc"), 6).as("importance"))
      .orderBy(col("feature_idx"))
  }
  private val q261 = QueryDef(q261Name, q261Fn, None,
    Some((s, d) => q261Sql(memoGet(q261Name, d, () => q261Fit(s, d)))))

  // --------------------------------------------------------------- q374
  // Reliability diagram + expected calibration error (ECE, Naeini 2015 /
  // Guo 2017) for the RF multiclass classifier ([EXT]) — the calibration
  // member of the eval shelf: accuracy (q74), ranking (q102/q108), PR
  // sweep (q335) say nothing about whether a reported confidence of 0.8
  // is RIGHT 80% of the time, which is what a downstream filtering
  // pipeline consuming model scores actually relies on. Ten equal-width
  // confidence buckets; per bucket the mean confidence, empirical
  // accuracy and |gap|; ECE = Σ (n_b/N)·gap_b.
  //
  // This query exists BECAUSE of the r11 compiled-scorer mechanism: its
  // oracle needs per-row model CONFIDENCES in DuckDB, which only the
  // compiled RF vote lists provide (RF proba = votes/Σvotes — exact
  // rational arithmetic, no transcendentals, so conf / bucket / every
  // downstream ratio is bitwise cross-engine). Exactness: conf quantized
  // to 1e-9 BEFORE summing (partition-order-free); all ratios are
  // fixed-order double expressions of exact BIGINTs; per-bucket ECE
  // contributions quantized to 1e-9 before the final bucket-grid sum.
  // Scale: one corpus pass (broadcast model transform) + one 10-group
  // aggregate; everything after lives on the bucket grid.
  private val q374Name = "q374_ml_reliability_ece"
  private def q374Fit(s: SparkSession, d: String): LGBMClassifierModel =
    new LGBMClassifier(
      LGBMParams(nEstimators = 20, maxDepth = 6, featureFraction = 0.5))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label10")
  private def q374Sql(m: LGBMClassifierModel): String = {
    val rf = m.toLocal.asInstanceOf[RandomForestClassificationModel]
    val vCols = (0 until rf.numClasses).map(k => s"v$k")
    val sSql = vCols.map(c => s"($c)").reduce((a, b) => s"($a + $b)")
    val confSql = s"greatest(${vCols.map(c => s"($c / s)").mkString(", ")})"
    s"""WITH ${rfVotesCte(rf)},
       p AS (SELECT vec_id, label, ${vCols.mkString(", ")}, $sSql AS s
             FROM v),
       sc AS (SELECT
           CAST(round($confSql * 1e9) AS BIGINT) AS cq,
           CASE WHEN ${TreeSql.argmaxFirstSql(vCols)} = CAST(label AS DOUBLE)
             THEN 1 ELSE 0 END AS corr,
           CAST(least(floor($confSql * 10.0), 9) AS BIGINT) AS bucket
         FROM p),
       g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cq) AS BIGINT) AS scq,
               CAST(sum(corr) AS BIGINT) AS nc
             FROM sc GROUP BY 1),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM sc),
       gg AS (SELECT bucket, n, nn,
                CAST(scq AS DOUBLE) / (1e9 * CAST(n AS DOUBLE)) AS conf_mean,
                CAST(nc AS DOUBLE) / CAST(n AS DOUBLE) AS acc
              FROM g, tot),
       e AS (SELECT CAST(sum(CAST(round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
               * abs(acc - conf_mean) * 1e9) AS BIGINT)) AS BIGINT) AS eceq
             FROM gg)
       SELECT bucket, n,
              ${Num.roundZSql("conf_mean", 6)} AS conf_mean,
              ${Num.roundZSql("acc", 6)} AS acc,
              ${Num.roundZSql("abs(acc - conf_mean)", 6)} AS gap,
              ${Num.roundZSql("CAST(eceq AS DOUBLE) / 1e9", 6)} AS ece
       FROM gg, e ORDER BY bucket"""
  }
  private val q374Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q374Name, d, q374Fit(s, d))
    val scored = m.predictProba(features(s, d), Seq("embedding"))
      .withColumn("conf", array_max(col("proba")))
      .select(
        round(col("conf") * lit(1e9)).cast("long").as("cq"),
        (col("prediction") === col("label10")).cast("long").as("corr"),
        least(floor(col("conf") * lit(10.0)), lit(9L)).cast("long")
          .as("bucket"))
    // ONE corpus pass, guaranteed: the 10-row bucket aggregate is
    // localCheckpointed before being read twice (rows + the nn total) —
    // a separate count over `scored` would re-run the whole model
    // scoring pass (review finding, r11)
    val g = scored.groupBy(col("bucket")).agg(
      count(lit(1)).as("n"), sum(col("cq")).as("scq"),
      sum(col("corr")).as("nc")).localCheckpoint()
    val tot = g.agg(sum(col("n")).as("nn"))
    val gg = g.crossJoin(broadcast(tot))
      .withColumn("conf_mean",
        col("scq").cast("double") / (lit(1e9) * col("n").cast("double")))
      .withColumn("acc", col("nc").cast("double") / col("n").cast("double"))
    val ece = gg.agg(
      sum(round(col("n").cast("double") / col("nn").cast("double")
        * abs(col("acc") - col("conf_mean")) * lit(1e9)).cast("long"))
        .as("eceq"))
    gg.crossJoin(broadcast(ece))
      .select(col("bucket"), col("n"),
        Num.roundZ(col("conf_mean"), 6).as("conf_mean"),
        Num.roundZ(col("acc"), 6).as("acc"),
        Num.roundZ(abs(col("acc") - col("conf_mean")), 6).as("gap"),
        Num.roundZ(col("eceq").cast("double") / lit(1e9), 6).as("ece"))
      .orderBy(col("bucket"))
  }
  private val q374 = QueryDef(q374Name, q374Fn, None,
    Some((s, d) => q374Sql(memoGet(q374Name, d, () => q374Fit(s, d)))))

  // --------------------------------------------------------------- q375
  // Per-class one-vs-rest AUC of the RF's own probability scores ([EXT])
  // — q102's exact tie-aware Mann–Whitney, applied to MODEL scores
  // instead of a raw value column: the per-class ranking-quality report
  // (which classes the model separates well) that complements q374's
  // calibration and q74's accuracy. Scores are the exact-rational RF
  // vote fractions, quantized to the 1e-9 grid BEFORE grouping (the q108
  // treatment): the Mann–Whitney pass is then exact w.r.t. the quantized
  // scores and its ordered prefix-sum runs over the (class ×
  // distinct-score) grid — bounded by the quantization grid, never the
  // corpus — partitioned by class, so no single-partition corpus sort
  // exists at any SF. Oracle: compiled vote lists (r11 TreeSql), one
  // UNION ALL arm per class over a MATERIALIZED score CTE. The final
  // `auc` rounds through Num.roundZ/roundZSql (ADVICE r11 item 2: plain
  // round(x, 6) is decimal-exact HALF_UP BigDecimal in Spark but
  // multiply-round-divide in DuckDB — a latent last-ulp divergence on
  // arbitrary score ratios; the scaled-BIGINT quantization is the house
  // form precisely because both engines compute it identically).
  private val q375Name = "q375_ml_class_auc"
  private def q375Fit(s: SparkSession, d: String): LGBMClassifierModel =
    new LGBMClassifier(
      LGBMParams(nEstimators = 20, maxDepth = 6, featureFraction = 0.5))
      .fit(features(s, d), featuresCol = Seq("embedding"), labelCol = "label10")
  private def q375Sql(m: LGBMClassifierModel): String = {
    val rf = m.toLocal.asInstanceOf[RandomForestClassificationModel]
    val vCols = (0 until rf.numClasses).map(k => s"v$k")
    val sSql = vCols.map(c => s"($c)").reduce((a, b) => s"($a + $b)")
    val arms = (0 until rf.numClasses).map { k =>
      s"""SELECT label, CAST($k AS BIGINT) AS class_id,
            CAST(round((v$k / s) * 1e9) AS BIGINT) AS pq FROM ps"""
    }
    s"""WITH ${rfVotesCte(rf)},
       ps AS MATERIALIZED (SELECT vec_id, label, ${vCols.mkString(", ")},
           $sSql AS s FROM v),
       ex AS (${arms.mkString(" UNION ALL ")}),
       g AS (SELECT class_id, pq,
               CAST(count(*) FILTER (WHERE label = class_id) AS BIGINT) AS np,
               CAST(count(*) FILTER (WHERE label <> class_id) AS BIGINT) AS nn
             FROM ex GROUP BY 1, 2),
       c AS (SELECT class_id, np, nn,
               CAST(COALESCE(sum(nn) OVER (PARTITION BY class_id
                 ORDER BY pq ROWS BETWEEN UNBOUNDED PRECEDING AND 1
                 PRECEDING), 0) AS BIGINT) AS cumneg
             FROM g)
       SELECT class_id,
              CAST(sum(np) AS BIGINT) AS n_pos,
              CAST(sum(nn) AS BIGINT) AS n_neg,
              ${Num.roundZSql(
                "CAST(sum(np * (cumneg * 2 + nn)) AS DOUBLE) / " +
                  "CAST(NULLIF(sum(np) * sum(nn) * 2, 0) AS DOUBLE)", 6)}
                AS auc
       FROM c GROUP BY 1 ORDER BY 1"""
  }
  private val q375Fn: (SparkSession, String) => DataFrame = (s, d) => {
    val m = memoPut(q375Name, d, q375Fit(s, d))
    val ex = m.predictProba(features(s, d), Seq("embedding"))
      .select(col("label10"), expr("posexplode(proba) AS (k, p)"))
      .select(col("k").cast("long").as("class_id"),
        (col("label10") === col("k").cast("double")).cast("long").as("pos"),
        round(col("p") * lit(1e9)).cast("long").as("pq"))
    val g = ex.groupBy(col("class_id"), col("pq")).agg(
      sum(col("pos")).as("np"),
      (count(lit(1)) - sum(col("pos"))).as("nn"))
    val w = Window.partitionBy(col("class_id")).orderBy(col("pq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(col("class_id")).agg(
        sum(col("np") * (col("cumneg") * 2 + col("nn"))).as("num2"),
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      .select(col("class_id"), col("n_pos"), col("n_neg"),
        Num.roundZ(col("num2").cast("double") /
          expr("CAST(nullif(n_pos * n_neg * 2, 0) AS DOUBLE)"), 6).as("auc"))
      .orderBy(col("class_id"))
  }
  private val q375 = QueryDef(q375Name, q375Fn, None,
    Some((s, d) => q375Sql(memoGet(q375Name, d, () => q375Fit(s, d)))))

  val defs: Seq[QueryDef] =
    Seq(q70, q71, q72, q73, q74, q103, q185, q261, q374, q375)
}
