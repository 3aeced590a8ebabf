package graft

import graft.ml.{LGBMClassifier, LGBMParams, LGBMRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The four longest-running ML property tests, split out of MLSpec so the
  * suite-level test groups balance (r13 verdict task 1: the sequential
  * suite wall blew the driver's `sbt test` budget; these four alone were
  * ~204 s of MLSpec's 320 s). Fixtures duplicate MLSpec's tiny builders —
  * the two classes must stay runnable in isolation and in parallel JVMs.
  */
class MLQuantileSpec extends AnyFunSuite {
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

  test("ovr_gbt multiclass: boosted one-vs-rest proba parity (atol=0.3)") {
    // mirrors tests/test_core.py:90-104 — the distributed 3-class
    // predict_proba must agree with an independent implementation within
    // atol=0.3; the RF path plays the reference's local-lightgbm role.
    // Also pins the OvR-specific save layout (one c<k> dir per class).
    val df = blobs(3)
    val ovr = new LGBMClassifier(
      LGBMParams(nEstimators = 50, multiclass = "ovr_gbt")).fit(df, Seq("feats"))
    assert(ovr.nClasses == 3)
    val po = ovr.predictProba(df, Seq("feats"))
      .select($"id", $"label", $"prediction", $"proba")
    val acc = po.agg(avg(($"label" === $"prediction").cast("double")))
      .head.getDouble(0)
    assert(acc > 0.8, s"accuracy $acc")
    val sumErr = po
      .select(abs(expr("aggregate(proba, 0D, (a, x) -> a + x)") - 1.0).as("e"))
      .agg(max($"e")).head.getDouble(0)
    assert(sumErr < 1e-9, s"probas must sum to 1, max err $sumErr")
    // parity proper: the reference compares the DISTRIBUTED fit against a
    // LOCAL fit of the same algorithm at atol=0.3 — here that is the OvR
    // fit on 8 partitions vs 1 partition (cross-ALGORITHM max-proba-diff
    // vs RF is not comparable: on ambiguous boundary rows bootstrap vote
    // splits differ from boosted sigmoids by ~0.45 even when both are
    // sharp elsewhere — measured, tools/OvrDbg)
    val local = new LGBMClassifier(
      LGBMParams(nEstimators = 50, multiclass = "ovr_gbt"))
      .fit(df.repartition(1), Seq("feats"))
    val pl = local.predictProba(df, Seq("feats"))
      .select($"id", $"proba".as("proba_l"))
    val maxDiff = po.join(pl, "id")
      .select(expr(
        "aggregate(zip_with(proba, proba_l, (a, b) -> abs(a - b)), 0D," +
          " (m, x) -> greatest(m, x))").as("d"))
      .agg(max($"d")).head.getDouble(0)
    assert(maxDiff < 0.3, s"proba parity atol=0.3 violated: $maxDiff")
    // cross-algorithm sanity: OvR and RF agree on the predicted class for
    // nearly all rows (probability calibration differs by construction)
    val rf = new LGBMClassifier(LGBMParams(nEstimators = 30)).fit(df, Seq("feats"))
    val agree = po.select($"id", $"prediction".as("p_ovr"))
      .join(rf.predict(df, Seq("feats")).select($"id", $"prediction".as("p_rf")), "id")
      .agg(avg(($"p_ovr" === $"p_rf").cast("double"))).head.getDouble(0)
    assert(agree > 0.95, s"OvR/RF class agreement $agree")
    // save/load round-trips the per-class layout and predictions
    val dir = java.nio.file.Files.createTempDirectory("graft_ovr_").toString
    ovr.save(s"$dir/m")
    val re = graft.ml.LGBMClassifierModel.load(s"$dir/m")
    assert(re.nClasses == 3)
    val p1 = ovr.predict(df, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    val p2 = re.predict(df, Seq("feats")).orderBy("id")
      .select("prediction").collect().map(_.getDouble(0))
    assert(p1.sameElements(p2))
    assert(re.toLocalOvR.numClasses == 3)
    // overwrite with FEWER classes must not leave stale c<k> dirs: load()
    // walks c0,c1,... takeWhile(exists), so a surviving c2 from the 3-class
    // save would silently splice two fits into one ensemble
    new graft.ml.OvRGBTModel(re.toLocalOvR.models.take(2)).save(s"$dir/m")
    val re2 = graft.ml.LGBMClassifierModel.load(s"$dir/m")
    assert(re2.nClasses == 2,
      s"stale per-class dirs survived the overwrite: nClasses=${re2.nClasses}")
  }

  test("quantile objective: empirical coverage within atol=0.1 of alpha") {
    val df = regData()
    for (alpha <- Seq(0.1, 0.5, 0.9)) {
      val m = new LGBMRegressor(LGBMParams(nEstimators = 30,
        objective = "quantile", alpha = alpha)).fit(df, Seq("feats"))
      val cov = m.predict(df, Seq("feats"))
        .agg(avg(($"label" <= $"prediction").cast("double")))
        .head.getDouble(0)
      assert(math.abs(cov - alpha) < 0.1, s"alpha=$alpha coverage=$cov")
    }
  }

  test("quantile objective: coverage holds WITHIN prediction quartiles") {
    // the global residual-quantile offset passes marginal coverage by
    // construction; what it could get wrong is CONDITIONAL coverage —
    // over-covering where predictions are low and under-covering where
    // they are high (or vice versa) while the average still lands on α.
    // Slice the prediction range into quartiles and require coverage in
    // EACH (atol 0.15 at ~50 rows/slice; binomial sd ≈ 0.05). On
    // near-homoskedastic residuals (this data, mirroring the reference's
    // quantile test) the conditional quantile is signal + a constant,
    // and this pins that the trainer actually recovers it — not just on
    // average. Config note: the native pinball trainer must fit the
    // ±12-range signal itself from an f₀-constant start (unlike the old
    // absolute-GBT+offset arm, which piggy-backed on L1's signal fit),
    // so this test gives it enough boosting budget: 60 line-search
    // stages at shrinkage 0.3 leave (1−0.3)^60 ≈ 1e-9 of the initial
    // gap, while 30 stages at 0.1 would strand ~4% of a ±12 signal —
    // larger than the 0.1-scale noise being calibrated.
    val df = regData()
    val W = org.apache.spark.sql.expressions.Window.orderBy($"prediction")
    for (alpha <- Seq(0.1, 0.9)) {
      val m = new LGBMRegressor(LGBMParams(nEstimators = 60,
        learningRate = 0.3,
        objective = "quantile", alpha = alpha)).fit(df, Seq("feats"))
      val byQ = m.predict(df, Seq("feats"))
        .withColumn("q", ntile(4).over(W))
        .groupBy($"q")
        .agg(avg(($"label" <= $"prediction").cast("double")).as("cov"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(byQ.size == 4)
      byQ.foreach { case (qt, cov) =>
        assert(math.abs(cov - alpha) < 0.15,
          s"alpha=$alpha quartile=$qt coverage=$cov — global offset is " +
            "conditionally miscalibrated on this slice")
      }
    }
  }

  test("native pinball loss: conditional coverage on heteroscedastic data " +
      "tightens past the global-offset calibration") {
    // The r9 verdict's semantic-fidelity gap #1: the calibrated-offset
    // approximation covers α MARGINALLY by construction but cannot be
    // conditionally right when the noise scale varies with x — one
    // constant shift over-covers where noise is small and under-covers
    // where it is large. Fixture: y = 10 + 2·x₁ + ε·(0.5 + x₁), noise sd
    // spanning 0.5 → 10.5 over x₁ ∈ [0, 10). Both arms run through the
    // SAME public API: the native pinball trainer (unweighted quantile
    // fit) vs the legacy absolute-loss + global-residual-quantile path,
    // reconstructed verbatim via its documented weighted-quantile
    // fallback with weight ≡ 1. Coverage is sliced into four x₁ bins
    // (the noise driver, ~100 rows each): the native arm must be within
    // 0.12 of α in its WORST bin and strictly tighter than the legacy
    // arm's worst bin.
    val rng = new scala.util.Random(7)
    val df = (0 until 400).map { i =>
      val x1 = rng.nextDouble() * 10.0
      val x2 = rng.nextGaussian()
      (i.toLong, Array(x1, x2),
        10.0 + 2.0 * x1 + rng.nextGaussian() * (0.5 + x1))
    }.toDF("id", "feats", "label").repartition(2)
    val dfw = df.withColumn("w", lit(1.0))
    def worstDev(p: DataFrame, alpha: Double): Double = p
      .withColumn("bin", floor($"feats" (0) / 2.5).cast("int"))
      .groupBy($"bin")
      .agg(avg(($"label" <= $"prediction").cast("double")).as("cov"))
      .collect().map(r => math.abs(r.getDouble(1) - alpha)).max
    for (alpha <- Seq(0.1, 0.9)) {
      val params = LGBMParams(nEstimators = 40, maxDepth = 3,
        objective = "quantile", alpha = alpha)
      val nat = worstDev(new LGBMRegressor(params)
        .fit(df, Seq("feats")).predict(df, Seq("feats")), alpha)
      val leg = worstDev(new LGBMRegressor(params)
        .fit(dfw, Seq("feats"), weightCol = Some("w"))
        .predict(dfw, Seq("feats")), alpha)
      assert(nat < 0.12,
        s"alpha=$alpha native worst-bin coverage deviation $nat")
      assert(nat < leg,
        s"alpha=$alpha: native pinball ($nat) must tighten conditional " +
          s"coverage past the global-offset calibration ($leg)")
    }
  }
}
