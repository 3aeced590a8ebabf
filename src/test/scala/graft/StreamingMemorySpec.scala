package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Staging-independence of the streaming operators (q98's property, pinned
  * on synthetic data): the tumbling-window aggregate must produce the same
  * result whether its input arrives as one batch or many — semantics live
  * in the operator + watermark, not in how the replay machinery slices the
  * backlog. MemoryStream is Spark's driver-fed test source, so this suite
  * exercises the operator with zero file-staging code in the loop.
  */
class StreamingMemorySpec extends AnyFunSuite {
  import TestSpark._

  private val T0 = 1767225600000000L // 2026-01-01 00:00:00 UTC in µs

  /** Run q80/q98's aggregation over `rows` fed in `nChunks` batches. */
  private def runChunked(rows: Seq[(Long, String, Double)],
      nChunks: Int): Array[(Long, String, Long, Double)] = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val in = MemoryStream[(Long, String, Double)]
    val agg = in.toDF().toDF("ts_us", "event_type", "value")
      .select(expr("timestamp_micros(ts_us)").as("ts"),
        col("event_type"), col("value"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.sumFixed(col("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
        col("event_type"), col("n"), col("sum_value"))
    val name = s"memspec_${System.nanoTime()}"
    val q = agg.writeStream.format("memory")
      .queryName(name).outputMode("complete").start()
    try {
      val chunk = math.max(1, rows.length / nChunks + 1)
      rows.grouped(chunk).foreach { c =>
        in.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    ss.table(name).orderBy(col("wstart_epoch"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
  }

  /** q197's property: the timer-session processor's interval merge must
    * be invariant to batch slicing AND to arrival order within a batch —
    * sessions are a function of the event-time set alone. Chunks are fed
    * in time order (nothing late), a far-future flush row drives the
    * final watermark past every close, and the result must equal plain
    * batch sessionization computed independently in Scala.
    */
  private def runTimerSessions(rows: Seq[(Long, Long)], nChunks: Int,
      shuffleSeed: Int): Array[(Long, Long, Long, Long)] = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val in = MemoryStream[(Long, Long)]
    val out = in.toDF().toDF("user_id", "ts_us")
      .select(col("user_id"), expr("timestamp_micros(ts_us)").as("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new graft.streaming.EventStreams.SessionTimerProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .toDF("user_id", "start_ms", "end_ms", "n_events")
    val name = s"tsess_${System.nanoTime()}"
    val q = out.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      val rng = new scala.util.Random(shuffleSeed)
      val ordered = rows.sortBy(_._2)
      val chunk = math.max(1, ordered.length / nChunks + 1)
      ordered.grouped(chunk).foreach { c =>
        in.addData(rng.shuffle(c)); q.processAllAvailable()
      }
      in.addData((999L, ordered.last._2 + 30L * 86400L * 1000000L)) // flush
      var last = -2L; var cur = -1L
      while (cur != last) {
        last = cur; q.processAllAvailable()
        cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      }
    } finally q.stop()
    ss.table(name).filter(col("user_id") =!= 999L)
      .orderBy(col("user_id"), col("start_ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("q197 timer sessions: invariant to chunking and intra-batch order; equals batch sessionization") {
    val rng = new scala.util.Random(11)
    // 6 users x ~40 events over 6 hours with real gaps
    val rows = for (u <- 0L until 6L; _ <- 0 until 40) yield
      (u, T0 + rng.nextInt(6 * 3600) * 1000000L)
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ms = es.map(_._2 / 1000).sorted
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var (s0, l, n) = (ms.head, ms.head, 1L)
      ms.tail.foreach { t =>
        if (t - l > 1800000L) { sessions += ((u, s0, l, n)); s0 = t; l = t; n = 1L }
        else { l = t; n += 1 }
      }
      sessions += ((u, s0, l, n))
      sessions
    }.sortBy(x => (x._1, x._2)).toArray
    val one = runTimerSessions(rows, 1, 1)
    val five = runTimerSessions(rows, 5, 2)
    val fiveOther = runTimerSessions(rows, 5, 99)
    assert(one.sameElements(expected), "1-batch result must equal batch sessionization")
    assert(five.sameElements(expected), "5-batch result must equal batch sessionization")
    assert(fiveOther.sameElements(expected), "intra-batch order must not matter")
  }

  test("window aggregate is invariant to input chunking (1 vs 7 batches)") {
    val rng = new scala.util.Random(7)
    val types = Array("view", "click", "purchase")
    val rows = (0 until 500).map { i =>
      (T0 + rng.nextInt(48 * 3600) * 1000000L,
        types(rng.nextInt(3)), rng.nextInt(1000) / 100.0)
    }
    val one = runChunked(rows, 1)
    val seven = runChunked(rows, 7)
    assert(one.nonEmpty && one.sameElements(seven),
      s"chunking changed the result: 1-batch=${one.length} rows, " +
        s"7-batch=${seven.length} rows")
    // and both equal the plain batch aggregate over the same rows
    import spark.implicits._
    val batch = rows.toDF("ts_us", "event_type", "value")
      .select(expr("timestamp_micros(ts_us)").as("ts"),
        col("event_type"), col("value"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Num.sumFixed(col("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart_epoch"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(one.sameElements(batch), "stream result must equal batch aggregate")
  }
}
