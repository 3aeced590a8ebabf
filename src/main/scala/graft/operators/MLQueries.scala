package graft.operators

import graft.{QueryDef, Tables}
import graft.ml.{LGBMClassifier, LGBMParams, LGBMRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML operator queries (SURVEY §2.A) over the `embeddings` table.
  *
  * No DuckDB oracle exists for tree ensembles, so these are registered
  * without `oracleSql` → the driver applies the rows-only check; the
  * quality/parity assertions live in MLSpec (mirroring the reference's
  * threshold tests, system_tests/test_fit_predict.py:39,59).
  *
  * Train-time scale: GBT/RF fit never collects features to the driver;
  * each iteration is a distributed aggregation over the DataFrame, the
  * model (trees) lives on the driver and broadcasts into `transform` —
  * the same topology the reference engineers by hand (core.py:113-141).
  */
object MLQueries {

  private def emb(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  private def features(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(
      col("vec_id"),
      col("embedding"),
      col("label").cast("double").as("label10"),
      (col("label") >= 5).cast("double").as("label_bin"))

  private val q70 = QueryDef(
    "q70_ml_gbt_binary_classifier",
    (s, d) => {
      val df = features(s, d)
      val m = new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label_bin")
      m.predict(df, Seq("embedding"))
        .select(col("vec_id"), col("label_bin"), col("prediction"))
        .orderBy(col("vec_id"))
    },
    None)

  private val q71 = QueryDef(
    "q71_ml_rf_multiclass_proba",
    (s, d) => {
      val df = features(s, d)
      // feature_fraction 0.5: measured equal train accuracy to 1.0 on this
      // workload (0.6505 vs 0.6520) at ~half the fit cost (tools/P71,
      // sf0.1: 1.9 s vs 2.7–5.4 s) — the r2 "all" setting paid an
      // unmeasured 2× for parity the quality gates never needed
      val m = new LGBMClassifier(
        LGBMParams(nEstimators = 20, maxDepth = 6, featureFraction = 0.5))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label10")
      m.predictProba(df, Seq("embedding"))
        .select(col("vec_id"), col("prediction"),
          size(col("proba")).cast("long").as("n_classes"))
        .orderBy(col("vec_id"))
    },
    None)

  private val q72 = QueryDef(
    "q72_ml_gbt_regressor",
    (s, d) => {
      val df = features(s, d)
      val m = new LGBMRegressor(LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label10")
      m.predict(df, Seq("embedding"))
        .select(col("vec_id"), col("label10"), col("prediction"))
        .orderBy(col("vec_id"))
    },
    None)

  private val q73 = QueryDef(
    "q73_ml_quantile_coverage",
    (s, d) => {
      val df = features(s, d)
      // r10: the quantile objective is the NATIVE pinball trainer (one
      // MLlib DecisionTreeRegressor fit per boosting stage — the K×
      // estimator-fit scheduling floor q103's OvR measurement
      // documents, ~0.6 s/stage at sf0.1). Marginal coverage holds from
      // the f₀ = global-quantile init by construction, and the
      // line-search stages converge the conditional shape fast, so the
      // gate demonstrates the trainer at 6 stages instead of paying the
      // floor 10×; MLSpec runs the full-budget coverage properties.
      val m = new LGBMRegressor(
        LGBMParams(nEstimators = 6, maxDepth = 4,
          objective = "quantile", alpha = 0.9))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label10")
      m.predict(df, Seq("embedding"))
        .agg(
          avg((col("label10") <= col("prediction")).cast("double"))
            .as("coverage"),
          count(lit(1)).as("n"))
    },
    None)

  private val q74 = QueryDef(
    "q74_ml_accuracy_metric",
    (s, d) => {
      val df = features(s, d)
      val m = new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label_bin")
      // reference metric-as-query: (dy == dy_pred).sum() / len(dy)
      // (system_tests/test_fit_predict.py:35)
      m.predict(df, Seq("embedding"))
        .agg(
          avg((col("label_bin") === col("prediction")).cast("double"))
            .as("accuracy"),
          count(lit(1)).as("n"))
    },
    None)

  // --------------------------------------------------------------- q103
  // The ovr_gbt multiclass path through the driver gate: 3 one-vs-rest
  // GBT fits (label % 3 keeps K — and the K× training cost — small) and
  // the chained single-pass inference. Class-count and proba-shape are
  // part of the projected output so a broken ensemble assembly fails the
  // rows-only gate, not just MLSpec; proba calibration itself is gated
  // by MLSpec's atol=0.3 parity case.
  //
  // Cost note (measured ~6.7 s warm at sf0.1 vs q71's RF ~2.2 s on the
  // same features): each boosting iteration is a distributed job, so K
  // sequential fits pay K× the per-iteration scheduling floor — at toy
  // scale that floor dominates (nEstimators 10→8 moved the time < 10%).
  // This bench line IS the documented reason `multiclass="rf"` stays the
  // default: the K× is structural, not an implementation accident, and
  // amortizes only when per-iteration work is GB-sized.
  private val q103 = QueryDef(
    "q103_ml_ovr_gbt_multiclass",
    (s, d) => {
      val df = features(s, d)
        .withColumn("label3", (col("label10") % 3).cast("double"))
      // feature_fraction 0.5: the P71-measured ~2x fit-cost saving at
      // equal quality applies per ovr booster, so it compounds over K
      val m = new LGBMClassifier(
        LGBMParams(nEstimators = 8, maxDepth = 4, featureFraction = 0.5,
          multiclass = "ovr_gbt"))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label3")
      m.predictProba(df, Seq("embedding"))
        .select(col("vec_id"), col("prediction"),
          size(col("proba")).cast("long").as("n_classes"),
          round(expr("aggregate(proba, 0D, (a, x) -> a + x)"), 6).as("proba_sum"))
        .orderBy(col("vec_id"))
    },
    None)

  // --------------------------------------------------------------- q185
  // Streaming model inference — the online half of the train-batch /
  // score-stream split every production ML pipeline runs: the classifier
  // is fit ONCE on the static table, then the same rows replayed as a
  // 4-file stream are scored per micro-batch by `model.transform` inside
  // the streaming query. The model is driver-held tree state broadcast
  // into each batch's tasks (a pure projection — no state store, no
  // shuffle, watermark-free), so scoring throughput scales with executor
  // count exactly like a stateless map. Gate: rows-only here (no SQL
  // oracle for tree ensembles, like q70–q74) + StreamingMLSpec pins
  // stream-scored ≡ batch-scored row-for-row — the claim that batching
  // boundaries cannot change a stateless model's output.
  private val q185 = QueryDef(
    "q185_stream_ml_scoring",
    (s, d) => {
      val df = features(s, d)
      val m = new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label_bin")
      // stage the feature table as 4 mtime-ordered slice files (stable
      // per (tmpdir, sf-dir); _READY written last, the EventStreams
      // staging contract)
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "ml_score")
      val ready = dir.resolve("_READY")
      if (!java.nio.file.Files.exists(ready)) {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.walk(dir)
            .sorted(java.util.Comparator.reverseOrder())
            .iterator.asScala.foreach(java.nio.file.Files.delete)
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
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val src = ss.readStream
        .schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
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
    },
    None)

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
  // No oracle (tree ensembles aren't SQL); rows-only + MLSpec bounds.
  private val q261 = QueryDef(
    "q261_ml_permutation_importance",
    (s, d) => {
      val df = features(s, d)
      val m = new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(df, featuresCol = Seq("embedding"), labelCol = "label_bin")
      def acc(scored: DataFrame): DataFrame =
        scored.agg((sum(when(col("prediction") === col("label_bin"), 1L)
          .otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("acc"))
      val donor = df.select(
        expr("CAST(vec_id ^ 1 AS BIGINT)").as("vec_id"),
        col("embedding").as("demb"))
      val paired = df.join(donor, Seq("vec_id"), "left")
        .withColumn("demb", coalesce(col("demb"), col("embedding")))
      val base = acc(m.predict(df, Seq("embedding")))
        .select(col("acc").as("base_acc"))
      val perDim = (0 until 8).map { i =>
        val permuted = paired.withColumn("embp",
          expr(s"transform(embedding, (x, j) -> IF(j = $i, demb[$i], x))"))
        acc(m.predict(permuted, Seq("embp")))
          .select(lit(i.toLong).as("feature_idx"), col("acc").as("perm_acc"))
      }.reduce(_ unionByName _)
      perDim.crossJoin(broadcast(base))
        .select(col("feature_idx"), round(col("base_acc"), 6).as("base_acc"),
          round(col("perm_acc"), 6).as("perm_acc"),
          round(col("base_acc") - col("perm_acc"), 6).as("importance"))
        .orderBy(col("feature_idx"))
    },
    None)

  val defs: Seq[QueryDef] = Seq(q70, q71, q72, q73, q74, q103, q185, q261)
}
