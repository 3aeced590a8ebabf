package graft.tools

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.SparkSession

/** Deployment-shaped CONCURRENT bench (r12 verdict task 3): the tracked
  * BENCH numbers are serial per-plan timings, but a real cluster runs
  * this board many-queries-at-once against one long-lived session — the
  * regime the r11 StreamShared probe measured at 3.2× amortization and
  * that until r13 lived only in BASELINE.md prose. This main runs the
  * FULL registered board at fixed concurrency through ONE shared
  * SparkSession (per-query `newSession()` calls inside the bodies give
  * each stream/ML query its own conf without a new context):
  *
  *   - `SPARK_GRAFT_CONC` worker threads (default 4) pull query names
  *     from one queue — makespan scheduling, no per-family batching;
  *   - FAIR scheduler with one pool per worker, so a long ML fit cannot
  *     starve the short relational tail behind it (the cluster-side
  *     multi-tenant discipline, exercised locally);
  *   - same contamination discipline as graft.Bench: 1-min load
  *     markers at start/end, `contaminated` at load ≥ 2.0.
  *
  * One JSON line to stdout and BENCH_CONCURRENT.json (committed by the
  * builder): wall_sec (the makespan — the deployment-shaped headline),
  * sum_sec (Σ per-query wall inside the run), parallel_efficiency =
  * sum/wall/conc, per-family totals, per-query seconds, failures.
  * Compare wall_sec round-over-round at equal conc; sum_sec is NOT
  * comparable to the serial bench (queries contend for the 32 cores).
  */
object BenchConcurrent {
  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val conc = sys.env.getOrElse("SPARK_GRAFT_CONC", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val load0 = loadAvg
    val wall0 = System.nanoTime()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queue = new ConcurrentLinkedQueue[(String,
      (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach(queue.add)
    val times = new ConcurrentHashMap[String, Double]()
    val failed = new ConcurrentLinkedQueue[String]()

    val workers = (1 to conc).map { i =>
      new Thread(() => {
        // one FAIR pool per worker: pools share the context's cores
        // fairly, so worker i's long fit cannot monopolize the cluster
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"w$i")
        var next = queue.poll()
        while (next != null) {
          val (name, fn) = next
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            times.put(name, (System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              times.put(name, -1.0); failed.add(s"$name")
              System.err.println(s"[conc] $name failed: ${e.getMessage}")
          }
          next = queue.poll()
        }
      }, s"graft-conc-$i")
    }
    workers.foreach(_.start()); workers.foreach(_.join())

    val wall = (System.nanoTime() - wall0) / 1e9
    import scala.jdk.CollectionConverters._
    val res = times.asScala.toSeq.sortBy(_._1)
    val ok = res.filter(_._2 >= 0)
    val sum = ok.map(_._2).sum
    val famSec = ok
      .groupBy { case (n, _) =>
        graft.SparkEntry.families.getOrElse(n, "other") }
      .toSeq.sortBy(_._1)
      .map { case (f, qs) => "\"" + f + "\":" + f"${qs.map(_._2).sum}%.1f" }
      .mkString("{", ",", "}")
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.asScala.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val contaminated = load0 >= 2.0
    val line =
      f"""{"metric":"wall_concurrent","value":$wall%.1f,"unit":"sec","conc":$conc,""" +
      f""""n_queries":${res.size},"sum_sec":$sum%.1f,""" +
      f""""parallel_efficiency":${sum / wall / conc}%.3f,""" +
      s""""failed":$failedJson,"families":$famSec,"sf":"$sfDir",""" +
      f""""load_avg_start":$load0%.2f,"load_avg_end":$loadAvg%.2f,""" +
      s""""contaminated":$contaminated,"queries":$qs}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_CONCURRENT.json"), line + "\n")
    spark.stop()
  }
}
