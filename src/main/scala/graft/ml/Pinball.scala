package graft.ml

import org.apache.spark.ml.regression.{DecisionTreeRegressionModel,
  DecisionTreeRegressor}
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit,
  InternalNode, LeafNode, Node, Split}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native pinball-loss (quantile) gradient-boosted trees — the trainer the
  * reference gets from LightGBM's `objective='quantile', alpha`
  * (/root/reference/dask_lightgbm/tests/test_core.py:149-164) and MLlib
  * lacks. Until r9 the engine approximated it with absolute-loss GBT plus
  * a single global residual-quantile offset — marginally calibrated by
  * construction but CONDITIONALLY miscalibrated on heteroscedastic data
  * (one constant shift cannot be right both where the noise is small and
  * where it is large). This closes SURVEY §7 risk 2 with the real loss:
  *
  *   1. init f₀ = exact global α-quantile of the labels;
  *   2. per stage m: pseudo-residuals are the pinball subgradient
  *      gᵢ = α if yᵢ > f(xᵢ) else α−1; an MLlib [[DecisionTreeRegressor]]
  *      (variance impurity, seeded seed+m) fits g — its splits separate
  *      regions whose conditional P(y ≤ f | x) differs from α;
  *   3. line search per leaf: the update is the exact α-quantile of the
  *      residuals (y − f) landing in that leaf (sklearn's
  *      GradientBoostingRegressor quantile-loss step), scaled by the
  *      learning rate — self-scaling in y units, unlike a raw gradient
  *      step whose magnitude is capped at η·max(α, 1−α).
  *
  * The fixed point per leaf is conditional coverage α: a leaf whose
  * residual α-quantile is 0 already covers exactly α of its rows.
  *
  * Spark-first shape: trees train through MLlib (no socket ring, SURVEY
  * §3.1); leaf routing is re-expressed as a nested `when(...)` Column
  * compiled from the fitted tree (whole-stage codegen'd — no UDF, the C11
  * discipline), so both the training-time leaf assignment and inference
  * are pure projections. Per-leaf quantiles are ONE small aggregate
  * (≤ 2^depth groups) collected as model coefficients — driver-scale
  * constants like any model state, never the data. The running score
  * column is localCheckpointed per stage so stage m+1's tree fit scans a
  * materialized table instead of re-deriving m projections (the
  * q334/q343 iterative-plan discipline).
  */
object Pinball {

  /** Route a feature-array column through a fitted tree, emitting
    * `leafVal(leafId)` for the leaf each row lands in; leaf ids are
    * assigned pre-order (deterministic). MLlib split semantics: a
    * continuous split goes left iff value ≤ threshold; a categorical
    * split goes left iff the value is in leftCategories. */
  private[ml] def routeCol(root: Node, farr: Column,
      leafVal: Int => Column): Column = {
    def cond(s: Split): Column = s match {
      case c: ContinuousSplit => farr(c.featureIndex) <= c.threshold
      case c: CategoricalSplit =>
        if (c.leftCategories.isEmpty) lit(false)
        else c.leftCategories.map(v => farr(c.featureIndex) === v)
          .reduce(_ || _)
    }
    var next = 0
    def go(n: Node): Column = n match {
      case _: LeafNode =>
        val id = next; next += 1; leafVal(id)
      case i: InternalNode =>
        val l = go(i.leftChild); val r = go(i.rightChild)
        when(cond(i.split), l).otherwise(r)
    }
    go(root)
  }

  /** Fit on a frame carrying `features` (vector), `_farr` (array<double>
    * mirror of features for the codegen'd routing) and `label`.
    *
    * Quantile buffers are BOUNDED BY THE VALUE DOMAIN, not the corpus
    * (r11, closing the r10 `weak`): Spark's exact `percentile` buffers a
    * per-group counts map keyed by DISTINCT value — for a continuous
    * label that map is corpus-cardinality, an executor-OOM scale-killer
    * at 100×, even though the GROUP count (≤ 2^depth leaves) is tiny.
    * Both percentile sites (f₀ init, per-leaf line search) therefore
    * quantize to the house 1e-6 grid first: distinct keys are capped at
    * labelRange·10⁶ — a constant of the label domain, independent of row
    * count (10⁷ entries for a [0,10] label; labels spanning more than
    * ~10³ units should coarsen the grid or switch to approx_percentile).
    * Cost: each order statistic moves ≤ 5e-7 in label units — invisible
    * at the reference's atol=0.1 coverage gate (tests/test_core.py:
    * 149-164), A/B-pinned in MLSpec. Exact integer percentile also keeps
    * the fit ORDER-INDEPENDENT (counts maps merge associatively), which
    * approx_percentile's GK merge would not. */
  private[ml] def fit(data: DataFrame, alpha: Double, nStages: Int,
      depth: Int, eta: Double, seed: Long): PinballModel = {
    val f0 = data
      .agg((expr(s"percentile(CAST(round(label * 1e6) AS BIGINT), $alpha)")
        / lit(1e6)).cast("double"))
      .first().getDouble(0)
    var cur = pin(data.select(col("features"), col("_farr"), col("label"))
      .withColumn("f", lit(f0)))
    val stages = Array.newBuilder[(DecisionTreeRegressionModel, Map[Int, Double])]
    for (m <- 1 to nStages) {
      val withG = cur.withColumn("g",
        when(col("label") > col("f"), lit(alpha)).otherwise(lit(alpha - 1.0)))
      val tree = new DecisionTreeRegressor()
        .setMaxDepth(depth).setSeed(seed + m)
        .setFeaturesCol("features").setLabelCol("g")
        .fit(withG)
      val leafQ = cur
        .withColumn("leaf", routeCol(tree.rootNode, col("_farr"), lit(_)))
        .groupBy(col("leaf"))
        .agg((expr(s"percentile(CAST(round((label - f) * 1e6) AS BIGINT), $alpha)")
          / lit(1e6)).cast("double").as("u"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      stages += ((tree, leafQ))
      cur = cur.withColumn("f", col("f") + lit(eta) *
        routeCol(tree.rootNode, col("_farr"),
          id => lit(leafQ.getOrElse(id, 0.0))))
      // The inter-stage state is a pure projection chain (nested
      // codegen'd when-routes over the last pinned table), so pinning
      // EVERY stage pays a materialization job per stage for nothing —
      // measured 2.6× the whole q73 fit. Checkpoint every 4th stage:
      // plan depth and re-derivation both stay ≤ 4 projections while
      // the checkpoint count (the dominant per-stage fixed cost) drops
      // 4×. Values are unchanged — checkpoint placement cannot alter
      // deterministic projections.
      if (m % 4 == 0 && m < nStages) cur = pin(cur)
    }
    new PinballModel(f0, eta, stages.result())
  }

  /** localCheckpoint with the attribute hygiene the r10 verdict asked
    * for (the `WARN LogicalRDD: output columns ... aren't the same`
    * during every Pinball checkpoint). Root cause, found via
    * tools/PinWarnProbe: the `_farr` column used to be
    * `vector_to_array(features).cast("array<double>")`, whose cast
    * declares containsNull=true while `SimplifyCasts` REMOVES the no-op
    * cast in the optimized plan (vector_to_array already emits
    * containsNull=false) — so analyzed and optimized outputs disagreed
    * on the ArrayType and `LogicalRDD.fromDataset`'s name+type rewrite
    * check failed. Fixed at the source (no cast, LGBM.scala); this
    * helper additionally checkpoints under RENAMED columns and restores
    * after, so every checkpoint boundary starts from fresh, collision-
    * free attribute ids (a same-name re-select would NOT do that:
    * `RemoveRedundantAliases` strips name-identical aliases, re-exposing
    * the original ids — measured features#40 logical vs #6 optimized —
    * the same attribute-id family as the q373 conflicting-references
    * INTERNAL_ERROR documented on ScaleCheckpoint). */
  private def pin(df: DataFrame): DataFrame = {
    val cols = df.columns
    val ck = df.select(cols.map(c => col(c).as(s"__pin_$c")): _*)
      .localCheckpoint()
    ck.select(cols.map(c => col(s"__pin_$c").as(c)): _*)
  }
}

/** Fitted pinball-GBT: f(x) = f₀ + η·Σₘ u_{leafₘ(x)} — model state is the
  * stage trees plus their per-leaf quantile updates (driver-held,
  * broadcast into the projection like any MLlib model). */
final class PinballModel private[ml] (
    val f0: Double, val eta: Double,
    val stages: Array[(DecisionTreeRegressionModel, Map[Int, Double])]) {

  /** Prediction as one codegen'd Column over the feature-array mirror. */
  private[ml] def predictCol(farr: Column): Column =
    stages.foldLeft(lit(f0): Column) { case (acc, (t, lv)) =>
      acc + lit(eta) * Pinball.routeCol(t.rootNode, farr,
        id => lit(lv.getOrElse(id, 0.0)))
    }

  /** Persist: one MLlib tree dir per stage plus a text sidecar with f₀, η
    * and each stage's leaf map (leaf ids are pre-order, stable across
    * save/load because the tree structure round-trips exactly). */
  private[ml] def save(path: String): Unit = {
    stages.zipWithIndex.foreach { case ((t, _), k) =>
      t.write.overwrite().save(s"$path/stage$k")
    }
    val meta = new StringBuilder
    meta.append(f0).append('\n').append(eta).append('\n')
    stages.foreach { case (_, lv) =>
      meta.append(lv.toSeq.sorted
        .map { case (k, v) => s"$k:$v" }.mkString(",")).append('\n')
    }
    val p = new org.apache.hadoop.fs.Path(s"$path/pinball_meta")
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(meta.toString.getBytes("UTF-8")) finally out.close()
  }
}

private[ml] object PinballModel {
  def load(path: String): PinballModel = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pinball_meta")
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines =
      try new String(in.readAllBytes(), "UTF-8").split('\n').toSeq
      finally in.close()
    val (f0, eta) = (lines.head.toDouble, lines(1).toDouble)
    val stages = lines.drop(2).filter(_.nonEmpty).zipWithIndex.map {
      case (line, k) =>
        val lv = line.split(',').filter(_.nonEmpty).map { kv =>
          val Array(a, b) = kv.split(':'); a.toInt -> b.toDouble
        }.toMap
        (DecisionTreeRegressionModel.load(s"$path/stage$k"), lv)
    }.toArray
    new PinballModel(f0, eta, stages)
  }
}
