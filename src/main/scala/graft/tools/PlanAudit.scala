package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-board physical-plan anti-pattern sweep (measurement probe).
  *
  * For every registered query, materializes the executed plan at the
  * given SF and flags scale anti-patterns: cartesian products,
  * sort-based aggregation fallbacks, corpus-side sort-merge joins where
  * a dimension should broadcast, and single-partition windows. Each flag
  * is a LEAD, not a verdict — queries print one line each so exceptions
  * can be reviewed against their documented rationale (e.g. q123's
  * global-CDF window is a documented limit, streaming queries return
  * memory-sink scans).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set[String]() ++ args
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names if !skip.contains(q)) {
      val flags = scala.collection.mutable.ListBuffer[String]()
      try {
        val p = graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        if (p.toLowerCase.contains("cartesianproduct"))
          flags += "CARTESIAN"
        if (p.contains("SortAggregate")) flags += "SORT_AGG"
        if (p.contains("ObjectHashAggregate")) flags += "OBJ_HASH_AGG"
        val winNoPart = p.linesIterator.exists(l =>
          l.contains("Window ") && l.contains("windowspecdefinition()") )
        if (p.contains("No Partition Defined")) flags += "GLOBAL_WINDOW"
        if (winNoPart) flags += "GLOBAL_WINDOW"
        // single-partition exchanges (SinglePartition) outside limits
        val sp = p.linesIterator.count(_.contains("Exchange SinglePartition"))
        if (sp > 0) flags += s"SINGLE_PART_EXCH=$sp"
        if (p.contains("BroadcastNestedLoopJoin")) flags += "BNLJ"
        println(f"$q%-40s ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(f"$q%-40s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
