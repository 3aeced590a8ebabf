package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: decompose per-micro-batch fixed cost of the staged
  * replay — state-store checkpoint location (disk vs tmpfs), shuffle
  * partition count, and state size (windowed agg vs 100k-key dedup).
  */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage once via the real path (stable per-(tmpdir, sf) location);
    // the leaf is fingerprint-keyed since r9, so glob for sliced_*
    graft.SparkEntry.queries("q83_stream_dedup")(spark, sfDir).count()
    val parent = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream",
      sfDir.replaceAll("[^A-Za-z0-9.]", "_"))
    val staged = {
      // close the directory stream (ADVICE r13 #4) and take the NEWEST
      // sliced_* entry — a stale fingerprint-keyed staging from older
      // code must not be replayed silently
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(parent)
      try {
        val cands = ls.iterator.asScala
          .filter(_.getFileName.toString.startsWith("sliced_")).toSeq
        if (cands.isEmpty) sys.error(s"no sliced_* staging under $parent")
        cands.maxBy(p =>
          java.nio.file.Files.getLastModifiedTime(p).toMillis).toString
      } finally ls.close()
    }

    def replay(parts: String, ckpt: Option[String], label: String): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val st = spark.readStream
        .schema("event_id bigint, ts timestamp, user_id bigint, " +
          "event_type string, value double, props string")
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val name = s"probe_${label.replaceAll("[^a-zA-Z0-9]", "_")}"
      var w = st.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name).outputMode("append")
      ckpt.foreach(c => w = w.option("checkpointLocation",
        c + "/" + name + "_" + System.nanoTime()))
      val q = w.start()
      q.processAllAvailable(); q.stop()
      println(f"[cost] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    replay("4", None, "agg p4 default-ckpt (warmup)")
    replay("4", None, "agg p4 default-ckpt")
    replay("4", None, "agg p4 default-ckpt (2nd)")
    replay("4", Some("/dev/shm/graft_ck"), "agg p4 tmpfs-ckpt")
    replay("4", Some("/dev/shm/graft_ck"), "agg p4 tmpfs-ckpt (2nd)")
    replay("2", Some("/dev/shm/graft_ck"), "agg p2 tmpfs-ckpt")
    replay("2", None, "agg p2 default-ckpt")
    replay("1", None, "agg p1 default-ckpt")
    replay("8", None, "agg p8 default-ckpt")
    replay("32", None, "agg p32 default-ckpt")
    spark.stop()
  }
}
