package graft.tools

import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit}

/** r10 verdict item 7 A/B: can the streaming family's per-micro-batch
  * fixed cost be amortized by replaying ONE staged event feed into
  * several independent streaming queries at once?
  *
  * Design answer first: every registered streaming query already forks
  * its own session (`EventStreams.run` → `newSession`) with an isolated
  * memory sink + state store, and the staged slice dirs are memoized per
  * (tmpdir, sf) — so N queries CAN run concurrently over one shared
  * SparkContext and one shared staged feed with no isolation change.
  * What concurrency cannot do is keep the bench's per-query attribution:
  * timed together, each query's seconds include the others' scheduler
  * contention, so the tracked metric (SUM of per-query minima) must stay
  * serial. This tool measures what a shared replay would buy as FAMILY
  * WALL-CLOCK — the number a cluster operator cares about — next to the
  * serial sum the bench reports.
  *
  * Usage: sbt "runMain graft.tools.StreamShared [k]" (default 8 queries).
  */
object StreamShared {
  private val Names = Seq(
    "q80_stream_tumbling_window", "q81_stream_sliding_window",
    "q82_stream_session_window", "q83_stream_dedup",
    "q84_stream_stateful_per_user", "q85_stream_dedup_within_watermark",
    "q86_stream_multibatch_late_drop", "q87_stream_dedup_readmission")

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(Names.size)
    val names = Names.take(k)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runOne(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runOne(names.head) // stage the slice files + warm codegen once
    // A: serial (the bench's shape)
    val serial = names.map(n => n -> runOne(n))
    val serialSum = serial.map(_._2).sum
    // B: concurrent — same queries, same staged feed, one SparkContext
    val pool = Executors.newFixedThreadPool(names.size)
    val t0 = System.nanoTime()
    val futs = names.map(n => pool.submit(new Runnable {
      def run(): Unit = runOne(n)
    }))
    futs.foreach(_.get())
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    val concWall = (System.nanoTime() - t0) / 1e9
    val per = serial.map { case (n, t) => "\"" + n + "\":" + f"$t%.2f" }
      .mkString("{", ",", "}")
    println(f"""{"n":${names.size},"serial_sum_sec":$serialSum%.2f,""" +
      f""""concurrent_wall_sec":$concWall%.2f,""" +
      f""""speedup":${serialSum / concWall}%.2f,"serial_per_query":$per}""")
    spark.stop()
  }
}
