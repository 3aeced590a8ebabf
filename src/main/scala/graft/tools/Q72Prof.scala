package graft.tools

import graft.ml.{LGBMParams, LGBMRegressor, TreeSql}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: attribute q72_ml_gbt_regressor's r10→r11 move
  * (2.21 s → 3.65 s, the only >1.5× regression on the r11 board —
  * VERDICT r11 task 2). The r11 change replaced `model.transform`
  * scoring (netlib fma-lane ddot, not oracle-replayable) with the
  * compiled gbtMarginCol Column; per-row cost is the same
  * O(trees·depth), so the suspects are fixed per-QUERY costs:
  * (a) the fit floor itself, (b) analysis/codegen of the ~10-tree
  * compiled expression, (c) the scoring pass proper.
  *
  * Decomposition: fit alone; then on the SAME pre-fit model, the
  * compiled-Column scoring pass and the `transform` scoring pass, each
  * twice (first pass carries analysis + whole-stage-codegen compile of
  * the expression tree; the repeat is the steady-state per-pass cost);
  * then the full registered q72 twice, mirroring the bench harness.
  * Findings → BASELINE.md.
  */
object Q72Prof {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"Q72PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val feats = graft.Tables.t(spark, d, "embeddings").select(
      col("vec_id"), col("embedding"),
      col("label").cast("double").as("label10"))
    // warmup: JVM/codegen/scan paths hot before the first measured leg
    noop(feats)

    val m = time("fit (10 trees, depth 4)") {
      new LGBMRegressor(LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(feats, featuresCol = Seq("embedding"), labelCol = "label10")
    }
    val reg = m.inner

    // compiled-Column scoring (the r11 path): pass 1 pays analysis +
    // codegen of the ~310-node expression; pass 2 is steady state
    def compiledScore(): DataFrame =
      m.predict(feats, Seq("embedding"))
        .select(col("vec_id"), col("label10"), col("prediction"))
        .orderBy(col("vec_id"))
    time("compiled Column score, pass 1")(noop(compiledScore()))
    time("compiled Column score, pass 2")(noop(compiledScore()))

    // MLlib transform scoring (the r10 path, fma-lane ddot UDF)
    def transformScore(): DataFrame =
      reg.transform(graft.ml.Featurize(feats, Seq("embedding")))
        .select(col("vec_id"), col("label10"), col("prediction"))
        .orderBy(col("vec_id"))
    time("mllib transform score, pass 1")(noop(transformScore()))
    time("mllib transform score, pass 2")(noop(transformScore()))

    // driver-side expression construction alone (no Spark job)
    time("gbtMarginCol build (driver only)") {
      TreeSql.gbtMarginCol(reg.trees, reg.treeWeights,
        vector_to_array(col("features")))
    }

    // projection-only legs (no sort/exchange): isolate the per-row eval
    // cost of the scorer expression from the shared orderBy tail
    time("scan floor (no scorer)")(noop(feats.select(col("vec_id"))))
    def compiledProj(): DataFrame =
      m.predict(feats, Seq("embedding")).select(col("vec_id"), col("prediction"))
    time("compiled projection, pass 1")(noop(compiledProj()))
    time("compiled projection, pass 2")(noop(compiledProj()))
    def transformProj(): DataFrame =
      reg.transform(graft.ml.Featurize(feats, Seq("embedding")))
        .select(col("vec_id"), col("prediction"))
    time("transform projection, pass 1")(noop(transformProj()))
    time("transform projection, pass 2")(noop(transformProj()))
    if (sys.env.contains("Q72_EXPLAIN")) {
      val ep = compiledProj().queryExecution.executedPlan
      println("executedPlan (projection):\n" +
        ep.toString.linesIterator.take(2).map(_.take(120)).mkString("\n"))
      // CSE audit: the scorer references the feature array ~150 times; if
      // the cast/convert subexpression is NOT eliminated, every leaf
      // access copies the whole 64-float array per row — a real per-row
      // cost at scale, invisible in toy timings. Count cast sites in the
      // generated code: CSE ⇒ O(1) occurrences of the array conversion.
      val code = org.apache.spark.sql.execution.debug
        .codegenString(compiledProj().queryExecution.executedPlan)
      val nCast = "castArray|ArrayConverter|cast\\w* = ".r
        .findAllIn(code).length
      val nSub = "subExpr".r.findAllIn(code).length
      println(s"Q72PROF codegen: ${code.linesIterator.length} lines, " +
        s"cast-ish sites=$nCast, subExpr mentions=$nSub")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/q72_codegen.txt"), code)
    }

    // codegen audit: does the ~310-node compiled CaseWhen stay inside
    // whole-stage codegen, or does the stage fall back (huge-method /
    // compile-failure), leaving per-row eval interpreted?
    if (sys.env.contains("Q72_EXPLAIN")) {
      println("=== compiled score, formatted plan ===")
      compiledScore().explain("formatted")
      org.apache.log4j.Logger
        .getLogger("org.apache.spark.sql.catalyst.expressions.codegen")
        .setLevel(org.apache.log4j.Level.DEBUG)
    }

    // the registered query end-to-end, bench-style best-of-2
    val q72 = graft.SparkEntry.queries("q72_ml_gbt_regressor")
    time("registered q72, pass 1")(noop(q72(spark, d)))
    time("registered q72, pass 2")(noop(q72(spark, d)))
    spark.stop()
  }
}
