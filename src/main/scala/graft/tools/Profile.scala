package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for hotspot queries (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (q <- args) {
      time(s"$q full")(graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      time(s"$q again")(graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
