package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: calibrate Structured Streaming's late-row drop semantics
  * for windowed aggregation in append mode under a file-per-trigger replay.
  * Questions: (1) is the drop predicate on window.end or on event ts;
  * (2) is the boundary <= or < the watermark; (3) does the final no-data
  * batch flush remaining windows after the sentinel file.
  */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = Files.createTempDirectory("wmprobe").toString
    def write(name: String, rows: Seq[(String, String)], mtime: Long): Unit = {
      val stage = s"$dir/_stage_$name"
      rows.toDF("tss", "k").select(to_timestamp($"tss").as("ts"), $"k")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      val dst = Paths.get(s"$dir/$name.parquet")
      Files.move(Paths.get(part), dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis() - 120000L
    // f0: on-time rows; f1: advances watermark to 12:00 (max 12:10 - 10m)
    write("b00", Seq(("2024-01-01 10:00:00", "a"), ("2024-01-01 10:40:00", "a")), base)
    write("b01", Seq(("2024-01-01 12:10:00", "a")), base + 10000)
    // f2: late rows. wm = 12:00.
    //  l1 ts 10:05 -> win [10:00,10:30) end << wm  (dropped by any rule)
    //  l2 ts 11:45 -> win [11:30,12:00) end == wm  (boundary case)
    //  l3 ts 11:55 -> win [11:30,12:00)... no: 11:55 -> [11:30,12:00) too.
    //     use 30-min windows; l3 ts 12:05 -> win [12:00,12:30) end > wm (kept; also ts > wm)
    //  l4 ts 11:59 -> win [11:30,12:00) end == wm but ts < wm — same window as l2
    write("b02", Seq(("2024-01-01 10:05:00", "late1"),
      ("2024-01-01 11:45:00", "late2"), ("2024-01-01 12:05:00", "late3")), base + 20000)
    // f3: sentinel far future -> flush everything
    write("b03", Seq(("2024-01-01 20:00:00", "_flush")), base + 30000)

    Files.list(Paths.get(dir)).toArray.map(_.toString).sorted.foreach { p =>
      val f = new java.io.File(p)
      println(s"STAGED: $p size=${f.length} mtime=${f.lastModified}" +
        (if (p.endsWith(".parquet"))
           s" rows=${spark.read.parquet(p).count()}" else ""))
    }

    val st = spark.readStream.schema("ts timestamp, k string")
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // NOTE: do NOT filter the sentinel inside the stream — predicate
    // pushdown moves the filter below the watermark node into the scan,
    // so the sentinel row never advances the watermark. Let it flow
    // through the aggregation (it forms its own group) and filter the
    // sink table instead.
    val q = st.withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "30 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"window.start", "HH:mm").as("ws"), $"k", $"n")
      .writeStream.format("memory").queryName("probe").outputMode("append")
      .start()
    var lastBatch = -2L
    var cur = -1L
    while (cur != lastBatch) {
      lastBatch = cur
      q.processAllAvailable()
      cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    }
    val prog = q.recentProgress.map(p =>
      s"batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}")
      .mkString("\n  ")
    q.stop()
    println("PROGRESS:\n  " + prog)
    println("RESULT:")
    spark.table("probe").filter($"k" =!= "_flush").orderBy("ws", "k").collect()
      .foreach(r => println(s"  ${r.getString(0)} ${r.getString(1)} ${r.getLong(2)}"))
    spark.stop()
  }
}
