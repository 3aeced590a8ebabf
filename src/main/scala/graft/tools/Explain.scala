package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for registered queries (plan QA). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // honor the bench's core count (r13): a plan captured at local[4]
    // hides partition-count-sensitive shapes — e.g. a pinned
    // repartition(defaultParallelism, k) over a child already
    // hash-partitioned on k collapses to a no-op at 4/4 but is a real
    // exchange under the bench's local[32]/32.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"========== $q ==========")
      graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
