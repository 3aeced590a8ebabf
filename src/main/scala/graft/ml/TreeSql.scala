package graft.ml

import org.apache.spark.ml.classification.{GBTClassificationModel,
  RandomForestClassificationModel}
import org.apache.spark.ml.graftshim.TreeInternals
import org.apache.spark.ml.regression.DecisionTreeRegressionModel
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}

/** Compile FITTED MLlib tree models into portable SQL text the DuckDB
  * oracle can execute — the cross-engine check the reference applies to its
  * own predictions (train once, score the same rows in a second engine,
  * compare: dask_lightgbm/tests/test_core.py:82-87). Until r10 the ML
  * queries were rows-only ("no SQL oracle for tree ensembles"); this module
  * removes that excuse: a fitted tree IS a closed-form piecewise-constant
  * expression, so the oracle can score the identical parquet with the
  * identical model and the driver can hash-match predictions bitwise.
  *
  * Bitwise discipline (everything here is hashed bytewise by the driver):
  *   - Literals go through [[dlit]] = `java.lang.Double.toString`, the
  *     shortest decimal that round-trips in Java; DuckDB's parser is
  *     correctly-rounding, so both engines hold the identical 64-bit value.
  *   - Routing replicates `Node.predictImpl` exactly: a continuous split
  *     goes left iff `feature <= threshold` — pure comparisons, no float
  *     arithmetic, so routing can never diverge cross-engine.
  *   - Sums are emitted LEFT-ASSOCIATIVE in tree order, matching the
  *     sequential f2j `ddot` MLlib uses for ensembles under 256 trees
  *     (`BLAS.getBLAS`) and the `votes(i) += stats(i)/total` loop of RF's
  *     `predictRaw` — identical operand order ⇒ identical IEEE result.
  *   - RF per-leaf vote quotients `stats(k)/total` are precomputed on the
  *     driver (same JVM division `predictRaw` would do) and emitted as
  *     literals; `total` is the left-assoc `stats.sum` predictRaw takes.
  *   - The binary-GBT prediction rule is `argmax([-m, m])` with
  *     first-index ties (`DenseVector.argmax` keeps the FIRST strict max),
  *     which reduces to `m > 0` exactly, signed zeros included.
  *   - The only transcendental is the OvR sigmoid `1 − 1/(1+exp(2m))`
  *     (GBT `raw2probabilityInPlace` applies `LogLoss.computeProbability`
  *     to raw(0) = −m, then complements). r12: it is confined to the
  *     PROBABILITY projections, which are always roundZ-quantized —
  *     `prediction` argmaxes the raw MARGINS in both engines (sigmoid is
  *     strictly monotone, so the argmax is identical by construction),
  *     so a 1-ulp libm-vs-Java `exp` divergence can never flip a hashed
  *     prediction; the one remaining exposure (a quantized probability
  *     sum within an ulp of its round-half boundary) is guarded at
  *     oracle-gen time (MLQueries.q103Guard → rows-only fallback).
  *
  * Scale note: the compiled scorer is MODEL-sized text (KBs–hundreds of
  * KBs), a driver-side constant like the model itself; it never touches
  * the data path. The Spark side keeps scoring through `model.transform`
  * — this module only exists so a second engine can replay it.
  */
object TreeSql {

  /** Shortest decimal that round-trips to the same 64-bit double in both
    * Java and DuckDB; negatives parenthesized so emission can inline the
    * literal after any operator. The exponent suffix is REQUIRED, not
    * cosmetic: DuckDB types a bare decimal literal as DECIMAL and would
    * run the whole scorer in exact decimal arithmetic — close enough to
    * pass a tolerance check and fail a bitwise one (caught live: every
    * q72 margin off by 1 ulp). With an exponent the literal is DOUBLE and
    * every downstream op is IEEE. */
  def dlit(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite tree constant: $d")
    val s0 = java.lang.Double.toString(d)
    val s = if (s0.contains('E')) s0 else s0 + "E0"
    if (d < 0) s"($s)" else s
  }

  /** Pre-order leaves — the leaf-id order [[Pinball.routeCol]] assigns,
    * shared here so compiled SQL and the Column compiler agree on ids. */
  def leaves(root: Node): Array[LeafNode] = {
    val b = Array.newBuilder[LeafNode]
    def go(n: Node): Unit = n match {
      case l: LeafNode     => b += l
      case i: InternalNode => go(i.leftChild); go(i.rightChild)
    }
    go(root)
    b.result()
  }

  /** Leaf routing as a CASE chain: `Node.predictImpl`'s decision function
    * verbatim. `leafSql(leaf, preOrderId)` emits each leaf's value;
    * `featSql(i)` must be a DOUBLE-typed SQL expression for feature i. */
  def routeSql(root: Node, featSql: Int => String,
      leafSql: (LeafNode, Int) => String): String = {
    var next = 0
    def go(n: Node): String = n match {
      case l: LeafNode =>
        val id = next; next += 1; leafSql(l, id)
      case i: InternalNode => i.split match {
        case c: ContinuousSplit =>
          s"CASE WHEN ${featSql(c.featureIndex)} <= ${dlit(c.threshold)} " +
            s"THEN ${go(i.leftChild)} ELSE ${go(i.rightChild)} END"
        case s => throw new IllegalArgumentException(
          s"only continuous splits are compilable (got $s)")
      }
    }
    go(root)
  }

  /** GBT margin Σₘ treeₘ(x)·wₘ — left-assoc in tree order.
    *
    * NOT bitwise-equal to `model.transform`'s margin in general: MLlib
    * routes the dot through netlib, and on JDK ≥ 11 that is `Java11BLAS
    * .ddotK` — four strided accumulator lanes combined with `Math.fma`
    * (verified in bytecode), which no portable SQL can replay. That is
    * why EVERY GBT scoring path in this engine (regressor margin, binary
    * classifier prediction/probability, OvR per-class scores) goes
    * through [[gbtMarginCol]] — the same expression tree as this SQL —
    * so both engines evaluate identical IEEE operations; an fma-lane
    * margin within rounding of a decision boundary can then never hash
    * differently across engines (r11 review closure). */
  def gbtMarginSql(trees: Array[DecisionTreeRegressionModel],
      weights: Array[Double], featSql: Int => String): String =
    trees.zip(weights).map { case (t, w) =>
      s"(${routeSql(t.rootNode, featSql, (l, _) => dlit(l.prediction))}) * ${dlit(w)}"
    }.mkString("(", " + ", ")")

  /** The engine's own GBT-regression scorer: the fitted ensemble compiled
    * to ONE whole-stage-codegen'd Column over the feature array — no UDF,
    * no per-row `transform` closure, and (unlike MLlib's fma-lane ddot)
    * an expression tree [[gbtMarginSql]] mirrors term-for-term, so Spark
    * and the DuckDB oracle produce bitwise-identical predictions.
    * Structure: Σₘ routeₘ(x)·wₘ, left-assoc in tree order. */
  def gbtMarginCol(trees: Array[DecisionTreeRegressionModel],
      weights: Array[Double], farr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trees.zip(weights).map { case (t, w) =>
      Pinball.routeCol(t.rootNode, farr,
        { val lp = leaves(t.rootNode).map(_.prediction)
          (id: Int) => org.apache.spark.sql.functions.lit(lp(id)) }) *
        org.apache.spark.sql.functions.lit(w)
    }.reduce(_ + _)

  /** Binary GBT `transform` prediction: argmax([-m, m]) ≡ m > 0. */
  def gbtBinaryPredictionSql(m: GBTClassificationModel,
      featSql: Int => String): String =
    s"(CASE WHEN ${gbtMarginSql(m.trees, m.treeWeights, featSql)} > 0.0 " +
      "THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"

  /** RF per-tree vote list: each leaf emits its normalized class-count
    * LIST `[stats(0)/total, …]`; quotients are divided HERE (driver JVM ==
    * the division predictRaw performs) and emitted as literals. A
    * zero-total leaf votes nothing in predictRaw; emit all-zeros. */
  private def rfTreeListSql(root: Node, numClasses: Int,
      featSql: Int => String): String =
    routeSql(root, featSql, (l, _) => {
      val stats = TreeInternals.leafClassCounts(l)
      val total = stats.sum // left-assoc, same as predictRaw's stats.sum
      val q =
        if (total == 0.0) Array.fill(numClasses)(0.0)
        else Array.tabulate(numClasses)(k => stats(k) / total)
      q.map(dlit).mkString("[", ", ", "]")
    })

  /** RF votes: per-tree leaf-list expressions (to bind once in a CTE) —
    * vote k is then the left-assoc sum `l0[k+1] + l1[k+1] + …` in tree
    * order, exactly predictRaw's `votes(k) += stats(k)/total` loop. */
  def rfTreeLists(m: RandomForestClassificationModel,
      featSql: Int => String): Array[String] =
    m.trees.map(t => rfTreeListSql(t.rootNode, m.numClasses, featSql))

  /** votes_k from bound per-tree list columns (1-based DuckDB indexing). */
  def rfVoteSql(treeCols: Seq[String], k: Int): String =
    treeCols.map(c => s"$c[${k + 1}]").mkString("(", " + ", ")")

  /** First-index argmax over bound vote columns — `DenseVector.argmax`
    * keeps the first strict max, i.e. index k wins iff it is ≥ every LATER
    * candidate (earlier ones already failed their own WHEN). */
  def argmaxFirstSql(cols: Seq[String]): String = {
    val arms = (0 until cols.length - 1).map { k =>
      val conds = (k + 1 until cols.length)
        .map(j => s"${cols(k)} >= ${cols(j)}").mkString(" AND ")
      s"WHEN $conds THEN CAST($k AS DOUBLE)"
    }
    arms.mkString("CASE ", " ", s" ELSE CAST(${cols.length - 1} AS DOUBLE) END")
  }

  /** OvR per-class probability from a bound margin column: GBT
    * `raw2probabilityInPlace` computes p₀ = LogLoss.computeProbability(−m)
    * = 1/(1+exp(2m)) then p₁ = 1 − p₀ — emitted verbatim, NOT the
    * algebraically-equal sigmoid(2m), so the float path matches. */
  def ovrProbSql(marginCol: String): String =
    s"(1.0 - 1.0 / (1.0 + exp(2.0 * $marginCol)))"

  /** Pinball ensemble f(x) = f₀ + η·u₁ + η·u₂ + … — mirrors the
    * left-assoc Column fold of [[PinballModel.predictCol]] exactly. */
  def pinballSql(pb: PinballModel, featSql: Int => String): String =
    pb.stages.foldLeft(dlit(pb.f0)) { case (acc, (t, lv)) =>
      val route = routeSql(t.rootNode, featSql,
        (_, id) => dlit(lv.getOrElse(id, 0.0)))
      s"($acc + ${dlit(pb.eta)} * ($route))"
    }
}
