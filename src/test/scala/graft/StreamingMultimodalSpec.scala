package graft

import graft.operators.Multimodal.FakeDecoder
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.{Signaler, TimeLimitedTests}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Minutes, Span}

class StreamingMultimodalSpec extends AnyFunSuite with TimeLimitedTests {
  import TestSpark._
  // fail-fast guard: a wedged streaming query (the round-4 TTL livelock
  // shape) must FAIL the test, not hang the whole suite run
  override val timeLimit: Span = Span(10, Minutes)
  override val defaultTestSignaler: Signaler = Signaler(_.interrupt())

  test("streaming tumbling window equals the batch aggregate") {
    val streamed = SparkEntry.queries("q80_stream_tumbling_window")(spark, sf)
    val batch = Tables.t(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() == batch.count())
    assert(streamed.agg(sum("n")).head.getLong(0) ==
      Tables.t(spark, sf, "events").count())
  }

  test("streaming dedup keeps one row per (user, event_type)") {
    val streamed = SparkEntry.queries("q83_stream_dedup")(spark, sf)
    val batch = Tables.t(spark, sf, "events")
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").count()
    val s = streamed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = batch.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(s == b)
  }

  test("session windows merge events within the 30-minute gap") {
    val sessions = SparkEntry.queries("q82_stream_session_window")(spark, sf)
    val nEvents = sessions.agg(sum("n_events")).head.getLong(0)
    assert(nEvents == Tables.t(spark, sf, "events").count())
  }

  test("multi-batch replay genuinely drops late rows by watermark") {
    // q86 replays ~12 micro-batches; late rows (event_id%7 one slice
    // late, %13 two slices late) whose window end fell below the
    // 2-batch-lagged watermark must be missing vs the no-drop aggregate.
    val streamed = SparkEntry.queries("q86_stream_multibatch_late_drop")(spark, sf)
    val noDrop = Tables.t(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count()
    val streamedRows = streamed.count()
    assert(streamedRows < noDrop.count(), "no late rows were dropped — replay was not multi-batch")
    assert(streamed.agg(sum("n")).head.getLong(0) <
      Tables.t(spark, sf, "events").count())
  }

  test("dedup-within-watermark re-admits duplicates after state expiry") {
    // q87's staging plants far duplicates (+6 days) whose dedup state
    // expired; plain dropDuplicates would drop all of them, so total
    // admitted must exceed the distinct-key count.
    val streamed = SparkEntry.queries("q87_stream_dedup_readmission")(spark, sf)
    val admitted = streamed.agg(sum("n_admitted")).head.getLong(0)
    val distinctKeys = Tables.t(spark, sf, "events").select("event_id").distinct().count()
    assert(admitted > distinctKeys,
      s"no duplicate was re-admitted ($admitted <= $distinctKeys) — state never expired")
    // and the same-batch near duplicates (event_id%11) must NOT inflate
    // counts: admitted <= originals + far dups
    val farDups = Tables.t(spark, sf, "events")
      .filter(col("event_id") % 9 === 0).count()
    assert(admitted <= distinctKeys + farDups)
  }

  test("fake decoder is deterministic and well-shaped") {
    val d1 = FakeDecoder.decode("hello world".getBytes)
    val d2 = FakeDecoder.decode("hello world".getBytes)
    assert(d1 == d2 || (d1.width == d2.width && d1.height == d2.height &&
      d1.nFrames == d2.nFrames && d1.features.sameElements(d2.features)))
    assert(d1.width >= 64 && d1.height >= 64 && d1.nFrames >= 1)
    assert(d1.features.length == 8 && d1.features.forall(f => f >= 0 && f < 1))
  }

  test("partition-wise decode yields one decoded row per document") {
    val out = SparkEntry.queries("q91_multimodal_decode_stub")(spark, sf)
    assert(out.count() == Tables.t(spark, sf, "documents").count())
    assert(out.columns.toSeq ==
      Seq("doc_id", "width", "height", "n_frames", "f0", "fsum"))
    // determinism across independent runs (stable partition-wise map)
    val again = SparkEntry.queries("q91_multimodal_decode_stub")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
