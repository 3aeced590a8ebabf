package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shuffle-volume probe (measurement tool): runs each named query through
  * the noop sink and reports, from the executed plan's own metrics, how
  * many bytes were read from files vs written to shuffles. The ratio is
  * the first-order 100 TB cost driver — a query whose shuffle volume
  * tracks its INPUT is re-shuffling the corpus; one whose shuffle volume
  * tracks its OUTPUT (aggregates, dictionaries) scales. Numbers back the
  * per-operator scale notes in COVERAGE.md / BASELINE.md.
  */
object ShuffleProf {
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def sumMetric(p: SparkPlan, pred: String => Boolean): Long = {
    var total = 0L
    def walk(n: SparkPlan): Unit = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case qs: QueryStageExec => // AQE stage wrapper: real plan hangs off .plan
        qs.metrics.foreach { case (_, m) =>
          if (pred(m.name.getOrElse("").toLowerCase))
            total += math.max(0L, m.value)
        }
        walk(qs.plan)
      case nn =>
        nn.metrics.foreach { case (_, m) =>
          if (pred(m.name.getOrElse("").toLowerCase))
            total += math.max(0L, m.value)
        }
        nn.children.foreach(walk)
        nn.subqueries.foreach(walk)
    }
    walk(p)
    total
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q04_local_supplier_volume",
        "q29_skew_salted_agg", "q30_dedup_exact", "q31_dedup_ngram_jaccard",
        "q32_dedup_minhash_lsh", "q42_token_count", "q104_doc_chunking",
        "q105_decontamination", "q110_bm25_topk", "q117_source_cap",
        "q163_embedding_covariance")
    println(f"${"query"}%-32s ${"readMB"}%8s ${"shufMB"}%8s  shuf/read")
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      // act through THIS QueryExecution (a .write would plan a second
      // one and leave these metrics empty)
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan
      val read = sumMetric(plan, n => n.contains("size of files read"))
      val shuf = sumMetric(plan, n => n.contains("shuffle bytes written"))
      val ratio = if (read > 0) shuf.toDouble / read else Double.NaN
      println(f"$q%-32s ${read / 1e6}%8.1f ${shuf / 1e6}%8.2f  $ratio%.3f")
    }
    spark.stop()
  }
}
