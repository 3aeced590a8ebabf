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
