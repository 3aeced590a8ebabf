package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q96/q97 dual-source assumption (EventStreams scaladoc): the
  * production staging advances both file sources in lockstep, and the
  * completeness argument leans on that. This suite deliberately BREAKS
  * lockstep — the purchase-side source lags two full slices behind the
  * view side — and asserts the stream–stream join still equals the batch
  * join: Spark's global watermark is the MIN over all sources'
  * watermarks (`multipleWatermarkPolicy=min`, the default, pinned
  * explicitly here), so a lagging source holds back eviction for
  * everyone and skew degrades STATE SIZE, never correctness. The
  * inverse policy (`max`) would evict views the slow purchase stream
  * still needs — exactly the failure the q96 scaladoc's lockstep wording
  * could be misread as depending on.
  */
class StreamingSkewSpec extends AnyFunSuite {
  import TestSpark._

  private val T0 = 1767225600000000L // 2026-01-01 00:00:00 UTC in µs
  private val DayUs = 86400L * 1000000L

  /** One parquet file per element of `slices`, named/mtime-stamped in
    * order so the file source replays them as ordered micro-batches. */
  private def stage(dir: java.nio.file.Path,
      slices: Seq[Seq[(Long, Long, Long)]]): Unit = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(dir)
    val base = System.currentTimeMillis() - 3600L * 1000
    slices.zipWithIndex.foreach { case (rows, i) =>
      val work = dir.resolve(s"_work$i")
      rows.toDF("id", "ts_us", "uid")
        .select(col("id"), expr("timestamp_micros(ts_us)").as("ts"), col("uid"))
        .repartition(1).write.mode("overwrite").parquet(work.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(work).iterator.asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(part.length == 1)
      val dst = dir.resolve(f"ev_$i%03d.parquet")
      java.nio.file.Files.move(part.head, dst)
      java.nio.file.Files.walk(work)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(java.nio.file.Files.delete)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
    }
  }

  private def readSlices(ss: SparkSession, dir: String): DataFrame =
    ss.readStream
      .schema("id bigint, ts timestamp, uid bigint")
      .option("maxFilesPerTrigger", "1").parquet(dir)

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    var last = -2L; var cur = -1L
    while (cur != last) {
      last = cur
      q.processAllAvailable()
      cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    }
  }

  test("2-slice source skew never evicts a needed view (inner + left outer)") {
    // 16 users; user u's view sits in day-slice u%4, its purchase (even u
    // only) 30 min later in the SAME slice. The purchase dir prepends two
    // filler files (far-past rows, non-joinable uid), so with
    // maxFilesPerTrigger=1 purchase slice i arrives two triggers after
    // view slice i — by which point the view side has already read event
    // times two DAYS past the awaiting views. Under min-policy the
    // global watermark trails the lagging purchase source, so those
    // views are still in state when their purchases arrive.
    val viewRows = (1 to 16).map { u =>
      (u.toLong, T0 + (u % 4) * DayUs + u * 7L * 60000000L, u.toLong)
    }
    val purchRows = viewRows.collect { case (id, ts, uid) if uid % 2 == 0 =>
      (100 + id, ts + 30L * 60000000L, uid)
    }
    val viewSlices = (0 until 4).map(i => viewRows.filter(_._3 % 4 == i)) :+
      Seq((-1L, T0 + 100 * DayUs, -1L)) // far-future sentinel
    val filler = (k: Int) => Seq((-500L - k, T0 - 10 * DayUs + k, -999L))
    val purchSlices = Seq(filler(0), filler(1)) ++
      (0 until 4).map(i => purchRows.filter(_._3 % 4 == i)) :+
      Seq((-2L, T0 + 100 * DayUs, -1L))

    val root = java.nio.file.Files.createTempDirectory("graft_skew_")
    stage(root.resolve("views"), viewSlices)
    stage(root.resolve("purch"), purchSlices)

    val expectInner = viewRows.collect { case (id, ts, uid) if uid % 2 == 0 =>
      (uid, id, 100 + id, 1800L)
    }.toSet
    val expectOuter: Set[(Long, Long, Any, Any)] =
      expectInner.map(t => (t._1, t._2, t._3: Any, t._4: Any)) ++
        viewRows.collect {
          case (id, _, uid) if uid % 2 == 1 => (uid, id, null: Any, null: Any)
        }

    for (joinType <- Seq("inner", "leftOuter")) {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "2")
      ss.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "min")
      val views = readSlices(ss, root.resolve("views").toString)
        .select(col("id").as("v_id"), col("ts").as("v_ts"), col("uid").as("v_uid"))
        .withWatermark("v_ts", "1 hour")
      val purch = readSlices(ss, root.resolve("purch").toString)
        .filter(col("uid") =!= -999L) // filler never joins nor appears
        .select(col("id").as("p_id"), col("ts").as("p_ts"), col("uid").as("p_uid"))
        .withWatermark("p_ts", "1 hour")
      val joined = views.join(purch,
        col("v_uid") === col("p_uid") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
        joinType)
        .select(col("v_uid").as("user_id"), col("v_id"), col("p_id"),
          ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) /
            lit(1000000L)).cast("long").as("lag_s"))
      val name = s"skew_$joinType"
      val q = joined.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try drain(q) finally q.stop()
      val got: Set[(Long, Long, Any, Any)] =
        ss.table(name).filter(col("v_id") =!= -1L)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            (if (r.isNullAt(2)) null else r.getLong(2)): Any,
            (if (r.isNullAt(3)) null else r.getLong(3)): Any)).toSet
      val expected =
        if (joinType == "inner")
          expectInner.map(t => (t._1, t._2, t._3: Any, t._4: Any))
        else expectOuter
      assert(got === expected,
        s"$joinType under 2-slice skew: missing=${expected -- got} " +
          s"extra=${got -- expected}")
    }
  }
}
