package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Pins that `TTLConfig` genuinely bounds `transformWithState` state —
  * the knob that keeps arbitrary per-key state finite at 100 TB, where
  * key cardinality grows without bound. A counter with a short
  * processing-time TTL must forget its state across a pause longer than
  * the TTL and restart the count; `TTLConfig.NONE` (q88's running-
  * aggregate form, where unbounded retention is the point) would keep
  * accumulating.
  */
class StreamingTtlSpec extends AnyFunSuite {
  import TestSpark._

  test("ValueState TTL evicts state between micro-batches") {
    // forked session: RocksDB provider + small shuffle, without touching
    // the shared test session's conf
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._

    val in = MemoryStream[Long]
    val out = in.toDS()
      .groupByKey(identity)
      .transformWithState(
        new StreamingTtlSpec.TtlCounter(
          TTLConfig(java.time.Duration.ofMillis(400))),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("user", "n")
    val q = out.writeStream.format("memory")
      .queryName("ttl_probe").outputMode("append").start()
    try {
      in.addData(7L, 7L, 7L)
      q.processAllAvailable()
      Thread.sleep(1500) // let the 400 ms TTL lapse in processing time
      in.addData(7L, 7L)
      q.processAllAvailable()
    } finally q.stop()

    val rows = ss.table("ttl_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.contains((7L, 3L)), s"first batch must count 3: $rows")
    assert(rows.contains((7L, 2L)),
      s"expired state must restart the count at 2 (5 = never evicted): $rows")
    assert(!rows.contains((7L, 5L)), s"TTL failed to evict: $rows")
  }
}

object StreamingTtlSpec {
  /** Per-key running count whose ValueState carries a TTL. */
  final class TtlCounter(ttl: TTLConfig)
      extends StatefulProcessor[Long, Long, (Long, Long)] {
    @transient private var n: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong, ttl)
    override def handleInputRows(key: Long, rows: Iterator[Long],
        timers: TimerValues): Iterator[(Long, Long)] = {
      val c = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(c)
      Iterator.single((key, c))
    }
  }
}
