package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}
import org.scalatest.concurrent.{Signaler, TimeLimitedTests}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Minutes, Span}

/** Pins that `TTLConfig` genuinely bounds `transformWithState` state —
  * the knob that keeps arbitrary per-key state finite at 100 TB, where
  * key cardinality grows without bound. A counter with a short
  * processing-time TTL must forget its state across a pause longer than
  * the TTL and restart the count; `TTLConfig.NONE` (q88's running-
  * aggregate form, where unbounded retention is the point) would keep
  * accumulating.
  *
  * Driving note (the round-4 livelock): a processing-time-TTL query
  * schedules a TTL-cleanup micro-batch after every batch, and each
  * cleanup batch schedules another — quiescence NEVER latches, so both
  * `processAllAvailable()` and `Trigger.AvailableNow` hang forever
  * (observed 39k+ empty stages / 619 jobs in 2 min). This is inherent to
  * `transformWithState` + `TimeMode.ProcessingTime` + TTL in Spark 4.1
  * and matters for any production q88-with-TTL variant: drive such
  * queries by SINK PROGRESS (poll for expected output under a deadline),
  * never by quiescence. Eviction semantics are unaffected — TTL expiry
  * is enforced at state READ time, so results are exact even while the
  * scheduler spins maintenance batches.
  */
class StreamingTtlSpec extends AnyFunSuite with TimeLimitedTests {
  import TestSpark._
  // fail-fast guard: every wait below is deadline-polled, but if a future
  // edit reintroduces a quiescence wait the suite must fail, not wedge
  override val timeLimit: Span = Span(5, Minutes)
  override val defaultTestSignaler: Signaler = Signaler(_.interrupt())

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

    def sink(): Set[(Long, Long)] = ss.table("ttl_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // deadline-poll the SINK for an expected row — never wait for
    // quiescence (see scaladoc: it never comes under processing-time TTL)
    def awaitRow(what: String)(p: Set[(Long, Long)] => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!p(sink()) && System.nanoTime() < deadline) Thread.sleep(50)
      assert(p(sink()), s"$what; sink=${sink()}; state=${q.status}")
    }

    try {
      in.addData(7L, 7L, 7L)
      awaitRow("first batch must count 3")(_.contains((7L, 3L)))
      Thread.sleep(1500) // let the 400 ms TTL lapse in processing time
      in.addData(7L, 7L)
      // the second feed lands as either a fresh count (TTL evicted) or a
      // running count (TTL broken) — wait for whichever, then assert
      awaitRow("second feed never surfaced")(r =>
        r.contains((7L, 2L)) || r.contains((7L, 5L)))
    } finally q.stop()

    val rows = sink()
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
