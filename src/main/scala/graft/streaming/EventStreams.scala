package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.{QueryDef, Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over `events` (SURVEY §2.C10): tumbling,
  * sliding, and session windows, watermarks, streaming dedup, and custom
  * state via flatMapGroupsWithState.
  *
  * Each query REPLAYS the events parquet through a real `readStream` →
  * transform → memory-sink pipeline, runs it to completion synchronously,
  * and returns the sink table. Because the replayed stream is bounded, the
  * result equals the equivalent batch query — which is exactly what the
  * DuckDB oracle runs. In production the source becomes Kafka/files-on-
  * arrival and the sink `foreachBatch` into a queryable table; the
  * transform plans are unchanged.
  *
  * Scale notes: windowed aggregations shuffle by (window, key) with state
  * kept in the state store — bounded by watermark eviction; streaming
  * dedup state is bounded by `dropDuplicates` key cardinality (at 100 TB,
  * use `dropDuplicatesWithinWatermark` to bound it by time instead).
  */
object EventStreams {
  import Num._

  private val runId = new AtomicInteger(0)

  /** Bounded replay of events.parquet as a stream (ns ts → µs timestamp). */
  private def readEventsStream(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$d/events.parquet").schema // ts: LongType (ns)
    // the file-stream source wants a directory: stream the sf dir filtered
    // down to the events file
    s.readStream.schema(raw).option("pathGlobFilter", "events.parquet")
      .parquet(d)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** Run a bounded stream to completion through a memory sink.
    *
    * Stateful operators create one state-store instance per shuffle
    * partition and pay a per-partition commit each micro-batch; for the
    * replay volume here 8 partitions is plenty (on a real cluster size
    * this to the executor count — it is fixed at the first batch of a
    * query and kept in the checkpoint).
    */
  private def run(s: SparkSession, out: DataFrame => DataFrame,
      src: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = out(src).writeStream.format("memory")
        .queryName(name).outputMode(mode).start()
      try { q.processAllAvailable() } finally { q.stop() }
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
    }
    s.table(name)
  }

  // ---------------------------------------------------------------- q80
  // Tumbling window + watermark. Oracle = batch time_bucket (both engines
  // epoch-align 1h windows on µs timestamps).
  private val q80 = QueryDef(
    "q80_stream_tumbling_window",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
            col("event_type"), col("n"), col("sum_value")),
        readEventsStream(s, d), "complete")
        .orderBy(col("wstart_epoch"), col("event_type")),
    Some(s"""
      SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS wstart_epoch,
             event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY wstart_epoch, event_type"""))

  // ---------------------------------------------------------------- q81
  // Sliding window (2h width, 1h slide): every event lands in 2 windows.
  // Oracle = union of two offset time_buckets.
  private val q81 = QueryDef(
    "q81_stream_sliding_window",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "2 hours", "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
            col("n")),
        readEventsStream(s, d), "complete")
        .orderBy(col("wstart_epoch")),
    Some("""
      SELECT wstart_epoch, count(*) AS n FROM (
        SELECT CAST(epoch(time_bucket(INTERVAL 2 HOURS, ts)) AS BIGINT) AS wstart_epoch
        FROM events
        UNION ALL
        SELECT CAST(epoch(time_bucket(INTERVAL 2 HOURS, ts, INTERVAL 1 HOUR)) AS BIGINT) AS wstart_epoch
        FROM events)
      GROUP BY 1
      ORDER BY wstart_epoch"""))

  // ---------------------------------------------------------------- q82
  // Session window (30 min gap) per user. Oracle = classic gaps-and-
  // islands SQL (lag + cumulative flag), identical session semantics.
  private val q82 = QueryDef(
    "q82_stream_session_window",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sumFixed(col("value"), 2).as("sum_value"))
          .select(
            unix_timestamp(col("session_window.start")).as("sess_start_epoch"),
            col("user_id"), col("n_events"), col("sum_value")),
        readEventsStream(s, d), "complete")
        .orderBy(col("user_id"), col("sess_start_epoch")),
    Some(s"""
      WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTES OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
      sess AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start_epoch,
             user_id, count(*) AS n_events,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, sess_start_epoch"""))

  // ---------------------------------------------------------------- q83
  // Streaming dedup (first arrival per (user_id, event_type)) feeding a
  // streaming aggregation. Deduped count per event_type = distinct users.
  private val q83 = QueryDef(
    "q83_stream_dedup",
    (s, d) =>
      run(s, st =>
        st.dropDuplicates(Seq("user_id", "event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_first_seen")),
        readEventsStream(s, d), "complete")
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_first_seen
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q84
  // Custom state: flatMapGroupsWithState tracking per-user running count /
  // max; bounded replay emits the final state per user, which equals the
  // batch aggregate the oracle runs.
  private val q84 = QueryDef(
    "q84_stream_stateful_per_user",
    (s, d) => {
      import s.implicits._
      run(s, st => {
        val typed = st.select(col("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong),
          col("value").as[Double](org.apache.spark.sql.Encoders.scalaDouble))
          .as[(Long, Double)]
        typed.groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (uid: Long, it: Iterator[(Long, Double)],
             state: GroupState[(Long, Double)]) =>
              val (c0, m0) = state.getOption.getOrElse((0L, Double.MinValue))
              var c = c0; var m = m0
              it.foreach { case (_, v) => c += 1; m = math.max(m, v) }
              state.update((c, m))
              Iterator((uid, c, m))
          }
          .toDF("user_id", "n_events", "max_value")
      }, readEventsStream(s, d), "append")
        // bounded replay = one micro-batch; keep the final row per user
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          max(col("max_value")).as("max_value"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, count(*) AS n_events, max(value) AS max_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  // ---------------------------------------------------------------- q85
  // Bounded-state streaming dedup: dropDuplicatesWithinWatermark keeps a
  // key's dedup state only until the watermark passes its event time, so
  // state size is bounded by (keys arriving per watermark window), not by
  // lifetime key cardinality — the REQUIRED variant at 100 TB where
  // (user, event_type) space grows without bound. q83 (plain
  // dropDuplicates) is the unbounded-state contrast. On this bounded
  // replay every duplicate lands inside the watermark, so the result
  // equals exact batch dedup and the oracle can hash-check it.
  private val q85 = QueryDef(
    "q85_stream_dedup_within_watermark",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_first_seen")),
        readEventsStream(s, d), "complete")
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_first_seen
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  val defs: Seq[QueryDef] = Seq(q80, q81, q82, q83, q84, q85)
}
