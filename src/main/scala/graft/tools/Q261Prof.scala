package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: decompose q261 (fit vs one-pass scoring vs codegen). */
object Q261Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q261prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warmup
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    t("fit alone (10x d4 GBT)") {
      new graft.ml.LGBMClassifier(graft.ml.LGBMParams(nEstimators = 10, maxDepth = 4))
        .fit(emb.select(col("vec_id"), col("embedding"),
          (col("label") >= 5).cast("double").as("label_bin")),
          featuresCol = Seq("embedding"), labelCol = "label_bin")
    }
    for (p <- 1 to 3)
      t(s"full q261 pass $p") {
        graft.SparkEntry.queries("q261_ml_permutation_importance")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
