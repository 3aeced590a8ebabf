package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.{QueryDef, Num, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Structured Streaming operators over `events` (SURVEY §2.C10): tumbling,
  * sliding, and session windows, watermarks, streaming dedup, and custom
  * state via flatMapGroupsWithState.
  *
  * Each query REPLAYS the events parquet through a real `readStream` →
  * transform → sink pipeline as a staged MULTI-micro-batch backlog
  * (maxFilesPerTrigger=1 over time-sliced files, watermark advancing
  * between batches), runs it to completion synchronously, and returns the
  * sink table. Because the replayed stream is bounded, the result equals
  * the equivalent batch query — which is exactly what the DuckDB oracle
  * runs. In production the source becomes Kafka/files-on-arrival; the
  * production sink shape — `foreachBatch` into a queryable parquet
  * table — is q93; the transform plans are unchanged.
  *
  * Scale notes: windowed aggregations shuffle by (window, key) with state
  * kept in the state store — bounded by watermark eviction; streaming
  * dedup state is bounded by `dropDuplicates` key cardinality (at 100 TB,
  * use `dropDuplicatesWithinWatermark` to bound it by time instead).
  */
object EventStreams {
  import Num._

  private val runId = new AtomicInteger(0)

  // ------------------------------------------------------------------
  // Multi-batch replay (all queries).
  //
  // A single-file replay arrives in ONE micro-batch: the watermark never
  // advances mid-query, so late-row filtering and state expiry are never
  // exercised. Here events are staged as one parquet file per 6-day
  // event-time slice and read with maxFilesPerTrigger=1, giving ~8 real
  // micro-batches with the watermark advancing between them.
  //
  // Semantics pinned empirically (graft.tools.WmProbe + oracle diffing):
  //  - the watermark applied in batch j derives from data through batch
  //    j−2 (not j−1): the offset-log watermark for batch j is snapshotted
  //    right after batch j−1 completes but BEFORE batch j−1's event-time
  //    stats are folded into the tracker — a 2-batch lag, verified
  //    exactly (all 811 windows at sf0.001) against the lag-2 recursion;
  //  - event-time stats are milliseconds (µs floor-divided);
  //  - a late row is dropped iff its window.end < watermark (== is kept);
  //  - the file source age-filters backdated mtimes (default maxFileAge
  //    7d), so staged files get current-time mtimes, ascending in slice
  //    order so the backlog replays in event-time order;
  //  - a sentinel row with a far-future timestamp advances the final
  //    watermark so append-mode windows flush. It must flow THROUGH the
  //    aggregation: a filter inside the stream is pushed below the
  //    watermark node into the scan and the sentinel would never be seen.
  //
  // At 100 TB this staging step doesn't exist — data already arrives in
  // time-ordered files/offsets; staging is ONE partitionBy(fid) write job
  // plus a driver-side rename per slice, not a per-slice data pass.
  private val SliceUs  = 6L * 86400L * 1000000L // 6-day slices
  private val stageDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Write `df` (with a `fid` column) as one parquet file per fid, named
    * and mtime-stamped in fid order so the file source replays them as
    * ordered micro-batches. A single partitionBy write: repartitioning by
    * fid first guarantees exactly one part file per fid (the oracle's
    * file↔batch correspondence depends on it). */
  private def writeSliceFiles(s: SparkSession, df: DataFrame, dir: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val stage = dir.resolve("_work").toString
    df.select((eventCols.map(col) :+ col("fid")): _*)
      .repartition(col("fid"))
      .write.mode("overwrite").partitionBy("fid").parquet(stage)
    val parts = Files.list(Paths.get(stage)).iterator.asScala.toSeq
      .filter(_.getFileName.toString.startsWith("fid="))
      .map { d =>
        val fid = d.getFileName.toString.stripPrefix("fid=").toLong
        val part = Files.list(d).iterator.asScala
          .filter(_.toString.endsWith(".parquet")).toSeq
        require(part.length == 1, s"expected 1 file for fid=$fid, got ${part.length}")
        (fid, part.head)
      }.sortBy(_._1)
    parts.foreach { case (f, src) =>
      Files.move(src, dir.resolve(f"ev_$f%03d.parquet"))
    }
    deleteRecursively(Paths.get(stage))
    restampMtimes(dir)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(java.nio.file.Files.delete)
    }

  /** (Re)stamp staged-file mtimes ascending in name order: the file
    * source both age-filters (default maxFileAge 7d) and orders the
    * backlog by mtime, so a staging reused from an earlier run must be
    * freshened before replay. */
  private def restampMtimes(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(dir).iterator.asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    val base = System.currentTimeMillis() - 3600L * 1000
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
    }
  }

  /** Content fingerprint of the live events table (row count, max
    * event_id, min/max event-time µs, PLUS two payload terms: exact sum
    * of value-cents and a bit_xor of xxhash64 over the non-key columns)
    * — one tiny map-side-combinable aggregate per (JVM, sf-dir),
    * memoized. Keys every reusable staging dir so a regenerated-in-place
    * events table can never silently replay a stale staged copy across
    * JVM runs (the q210 doc-feed discipline, swept here per the r8
    * verdict: the driver HAS regenerated testdata mid-round — r7's
    * events.ts type change). The payload terms close the r9 ADVICE
    * residual: a regeneration that preserves count/ids/ts-extrema but
    * changes values, types, or props still re-keys (xor is
    * order-insensitive, so the fingerprint stays partition-order
    * deterministic). */
  private val evFp = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def eventsFingerprint(s: SparkSession, d: String): String =
    evFp.computeIfAbsent(d, _ => {
      val r = Tables.t(s, d, "events").agg(
        count(lit(1)), coalesce(max(col("event_id")), lit(0L)),
        coalesce(min(unix_micros(col("ts"))), lit(0L)),
        coalesce(max(unix_micros(col("ts"))), lit(0L)),
        coalesce(sum(round(col("value") * 100).cast("long")), lit(0L)),
        coalesce(expr("bit_xor(xxhash64(user_id, event_type, props))"),
          lit(0L))).first()
      s"${r.getLong(0)}_${r.getLong(1)}_" +
        java.lang.Long.toHexString(
          r.getLong(2) ^ java.lang.Long.rotateLeft(r.getLong(3), 17) ^
          java.lang.Long.rotateLeft(r.getLong(4), 31) ^
          java.lang.Long.rotateLeft(r.getLong(5), 47))
    })

  /** Stable staging path per (tmpdir, sf-dir, flavor, content
    * fingerprint), built once and reused across JVM runs — repeated
    * Bench/Verify runs re-stamp and replay the existing copy instead of
    * leaking a fresh temp dir per run (same scheme as the q25/q62/q63
    * source stagings, which instead rewrite from live data each JVM).
    * The [[eventsFingerprint]] in the dir name invalidates the reuse
    * when the source table changes; superseded same-flavor stagings are
    * removed on rebuild. `_READY` is written last so a partially-staged
    * dir from a killed run rebuilds; its underscore prefix keeps it
    * hidden from the file-stream source.
    */
  /** Test hook (StagingSpec): clear the per-JVM staging memo so a spec
    * can simulate a FRESH JVM observing a regenerated-in-place table —
    * the cross-run scenario the fingerprint keying defends against. */
  private[graft] def resetStagingMemoForTest(): Unit = {
    stageDirs.clear(); evFp.clear()
  }

  private[graft] def stageStable(s: SparkSession, key: String, leaf: String,
      d: String)(build: java.nio.file.Path => Unit): String =
    stageDirs.computeIfAbsent(s"$key:$d", _ => {
      import scala.jdk.CollectionConverters._
      val parent = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream",
        d.replaceAll("[^A-Za-z0-9.]", "_"))
      val dir = parent.resolve(s"${leaf}_${eventsFingerprint(s, d)}")
      val ready = dir.resolve("_READY")
      if (java.nio.file.Files.exists(ready)) restampMtimes(dir)
      else {
        if (java.nio.file.Files.exists(parent))
          java.nio.file.Files.list(parent).iterator.asScala.toSeq
            .filter(p => p.getFileName.toString.startsWith(leaf + "_") &&
              p != dir)
            .foreach(deleteRecursively)
        deleteRecursively(dir)
        java.nio.file.Files.createDirectories(dir)
        build(dir)
        java.nio.file.Files.createFile(ready)
      }
      dir.toString
    })

  /** fid assignment for the late-arrival staging: 6-day slice of the
    * event time, shifted +1 slice for event_id%7 rows and +2 for %13 —
    * deterministic, so the DuckDB oracle replays the same file layout. */
  private[graft] def slicedDir(s: SparkSession, d: String): String =
    stageStable(s, "sliced", "sliced", d) { dir =>
      val ev = Tables.t(s, d, "events")
      val bounds = ev.agg(
        min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      // EMPTY events (r12 degenerate-streaming sweep): stage ZERO slice
      // files — the file source then yields no batches and every
      // downstream query returns its empty shape, instead of this build
      // dying on a null min/max (MatchError). Applies to all three
      // staging flavors; DegenerateStreamingSpec pins the behavior.
      if (!bounds.isNullAt(0)) {
        val Row(t0: Long, tMax: Long) = bounds
        val withFid = ev.withColumn("fid",
          expr(s"(unix_micros(ts) - ${t0}L) DIV ${SliceUs}L") +
            expr("CASE WHEN event_id % 13 = 0 THEN 2L WHEN event_id % 7 = 0 THEN 1L ELSE 0L END"))
        val maxFid = withFid.agg(max(col("fid"))).head().getLong(0)
        val sentinel = s.range(1).select(
          lit(-1L).as("event_id"),
          expr(s"timestamp_micros(${tMax + 30L * 86400L * 1000000L}L)").as("ts"),
          lit(-1L).as("user_id"), lit("_sentinel").as("event_type"),
          lit(0.0).as("value"), lit(null).cast("string").as("props"),
          lit(maxFid + 1).as("fid"))
        writeSliceFiles(s, withFid.unionByName(sentinel), dir)
      }
    }

  /** Staging for dedup re-admission (q87): no late lag; instead each
    * event_id%11 row gets a same-slice duplicate (ts+5min → same batch,
    * always deduplicated) and each %9 row a duplicate two slices later
    * (ts+12d → its dedup state expired days of event time earlier, so it
    * is re-admitted regardless of eviction-timing details). */
  private def dupDir(s: SparkSession, d: String): String =
    stageStable(s, "dup", "dup", d) { dir =>
      val ev = Tables.t(s, d, "events")
      val t0Row = ev.agg(min(unix_micros(col("ts")))).head()
      if (!t0Row.isNullAt(0)) { // empty events → zero slice files
        val t0 = t0Row.getLong(0)
        val withFid = ev.withColumn("fid",
          expr(s"(unix_micros(ts) - ${t0}L) DIV ${SliceUs}L"))
        val near = withFid.filter(col("event_id") % 11 === 0)
          .withColumn("ts", expr("ts + INTERVAL 5 MINUTES"))
        val far = withFid.filter(col("event_id") % 9 === 0)
          .withColumn("ts", expr("ts + INTERVAL 12 DAYS"))
          .withColumn("fid", col("fid") + 2L)
        writeSliceFiles(s, withFid.unionByName(near).unionByName(far), dir)
      }
    }

  /** `private[graft]` so DegenerateStreamingSpec can compose the staged
    * replay with checkpoint stop/resume (r12 verdict task 6). */
  private[graft] def readStaged(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id bigint, ts timestamp, user_id bigint, " +
          "event_type string, value double, props string"))
      .option("maxFilesPerTrigger", "1").parquet(dir)

  /** Run a bounded stream to completion through a memory sink.
    *
    * Stateful operators create one state-store instance per shuffle
    * partition and pay a per-partition task + commit each micro-batch —
    * measured locally this fixed cost scales near-linearly with the
    * partition count (p2 ≈ 11 s, p8 ≈ 19 s, p32 ≈ 32 s for the same
    * 8-file replay), so the replay uses 4. On a real cluster size this
    * to the executor count — it is fixed at the first batch of a query
    * and kept in the checkpoint; per-batch overhead amortizes over
    * GB-sized batches instead of the KB-sized slices here.
    *
    * The query runs in a FORKED session (`newSession`: same
    * SparkContext, own SQLConf) so the 4-partition state sizing and any
    * per-query state-store conf never mutate the caller's session —
    * concurrent queries in one session cannot race on shared conf. The
    * source is therefore built by a `SparkSession => DataFrame` thunk
    * against the forked session.
    */
  private def run(s: SparkSession, out: DataFrame => DataFrame,
      src: SparkSession => DataFrame, mode: String,
      conf: Seq[(String, String)] = Nil): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    conf.foreach { case (k, v) => ss.conf.set(k, v) }
    val q = out(src(ss)).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try drain(q) finally q.stop()
    ss.table(name)
  }

  /** processAllAvailable looped until the batch id is quiescent: a
    * multi-file backlog can report "all available processed" between the
    * source's list calls (observed in WmProbe), and the trailing no-data
    * batch that flushes append-mode state arrives after the last file.
    */
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    var last = -2L; var cur = -1L
    while (cur != last) {
      last = cur
      q.processAllAvailable()
      cur = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    }
  }

  // ---------------------------------------------------------------- q80
  // Tumbling window + watermark over the multi-batch sliced replay
  // (~10 real micro-batches, watermark advancing between them). The
  // sentinel is filtered BEFORE the watermark node — complete mode keeps
  // all window state regardless of the watermark, so the result equals
  // the batch aggregate however the backlog is batched. Oracle = batch
  // time_bucket (both engines epoch-align 1h windows on µs timestamps).
  private val q80 = QueryDef(
    "q80_stream_tumbling_window",
    (s, d) =>
      run(s, st =>
        st.filter(col("event_id") =!= -1L)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
            col("event_type"), col("n"), col("sum_value")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
        .orderBy(col("wstart_epoch"), col("event_type")),
    Some(s"""
      SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS wstart_epoch,
             event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY wstart_epoch, event_type"""))

  // ---------------------------------------------------------------- q81
  // Sliding window (2h width, 1h slide) over the sliced replay: every
  // event lands in 2 windows. Oracle = union of two offset time_buckets.
  private val q81 = QueryDef(
    "q81_stream_sliding_window",
    (s, d) =>
      run(s, st =>
        st.filter(col("event_id") =!= -1L)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "2 hours", "1 hour"))
          .agg(count(lit(1)).as("n"))
          .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
            col("n")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
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
  // Session window (30 min gap) per user over the sliced replay —
  // sessions genuinely merge ACROSS micro-batches (complete mode keeps
  // all session state; merging is associative, so the final state equals
  // the batch result in any arrival order). Unlike plain window aggs,
  // the session operator filters late INPUT rows by watermark even in
  // complete mode (measured: 76/1000 events vanished at a 10-minute
  // delay), so the delay must cover the replay's max lateness — 31 days,
  // like q85; genuine late-drop semantics are pinned by q86. Oracle =
  // classic gaps-and-islands SQL (lag + cumulative flag), identical
  // session semantics.
  private val q82 = QueryDef(
    "q82_stream_session_window",
    (s, d) =>
      run(s, st =>
        st.filter(col("event_id") =!= -1L)
          .withWatermark("ts", "31 days")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sumFixed(col("value"), 2).as("sum_value"))
          .select(
            unix_timestamp(col("session_window.start")).as("sess_start_epoch"),
            col("user_id"), col("n_events"), col("sum_value")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
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

  // ---------------------------------------------------------------- q287
  // DYNAMIC-gap session window — the per-event gap variant of q82 that
  // fixed-gap sessionization cannot express: a purchase signals intent
  // completion, so it closes its session after 10 minutes of silence,
  // while views linger 45 — `session_window(ts, CASE event_type ...)`
  // evaluates the gap PER ROW and merges overlapping [ts, ts+gap)
  // windows. The oracle is the generalized gaps-and-islands: with
  // heterogeneous gaps the session end is NOT monotone in ts, so the
  // island break needs a RUNNING MAX of prior window ends (lag alone —
  // the q82/q285 form — is wrong here: a long-gap view can outlast a
  // later short-gap purchase). Spark merges strictly-overlapping
  // windows (an event arriving exactly at the previous end starts a NEW
  // session), hence `ts >= max(prev ends)` breaks. Same complete-mode
  // replay + 31-day delay discipline as q82; state per 100 TB argument
  // identical (watermark-evicted per-key session state).
  private val q287 = QueryDef(
    "q287_stream_dynamic_gap_sessions",
    (s, d) =>
      run(s, st =>
        st.filter(col("event_id") =!= -1L)
          .withWatermark("ts", "31 days")
          .groupBy(session_window(col("ts"),
            when(col("event_type") === "purchase", "10 minutes")
              .otherwise("45 minutes")), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purchases"),
            sumFixed(col("value"), 2).as("sum_value"))
          .select(
            unix_timestamp(col("session_window.start")).as("sess_start_epoch"),
            col("user_id"), col("n_events"), col("n_purchases"),
            col("sum_value")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
        .orderBy(col("user_id"), col("sess_start_epoch")),
    Some(s"""
      WITH ends AS (
        SELECT user_id, ts, event_id, event_type, value,
               ts + CASE WHEN event_type = 'purchase'
                         THEN INTERVAL 10 MINUTES
                         ELSE INTERVAL 45 MINUTES END AS w_end
        FROM events),
      marked AS (
        SELECT user_id, ts, event_type, value,
               CASE WHEN max(w_end) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                     OR ts >= max(w_end) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_sess,
               event_id
        FROM ends),
      sess AS (
        SELECT user_id, ts, event_type, value,
               sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start_epoch,
             user_id, count(*) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_purchases,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, sess_start_epoch"""))

  // ---------------------------------------------------------------- q83
  // Streaming dedup (first arrival per (user_id, event_type)) feeding a
  // streaming aggregation. Deduped count per event_type = distinct users.
  // Replays the sliced multi-batch staging: dedup state genuinely
  // persists across multiple micro-batches (no watermark → no eviction, so
  // the result still equals batch DISTINCT regardless of batching).
  private val q83 = QueryDef(
    "q83_stream_dedup",
    (s, d) =>
      run(s, st =>
        st.dropDuplicates(Seq("user_id", "event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_first_seen")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
        .filter(col("event_type") =!= "_sentinel")
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
      }, ss => readStaged(ss, slicedDir(s, d)), "append")
        // multi-batch replay emits a running row per (user, batch);
        // counts are monotone, so max over emissions = final state
        .filter(col("user_id") =!= -1L)
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
  // key's dedup state only until the watermark passes its event time +
  // delay, so state size is bounded by (keys arriving per watermark
  // window), not by lifetime key cardinality — the REQUIRED variant at
  // 100 TB where (user, event_type) space grows without bound. q83
  // (plain dropDuplicates) is the unbounded-state contrast.
  //
  // Runs over the multi-batch sliced replay with a genuinely advancing
  // watermark. The events replay spans 30 days of event time, so a
  // 31-day delay guarantees the watermark (max seen event time − delay)
  // never passes any key's expiry horizon: no state evicts mid-replay,
  // every natural duplicate is still in state when it arrives, and the
  // result equals exact batch dedup — hash-checkable. Short-delay expiry
  // and re-admission semantics are pinned exactly by q87; here the point
  // is the bounded-state API form under real multi-batch advancement.
  private val q85 = QueryDef(
    "q85_stream_dedup_within_watermark",
    (s, d) =>
      run(s, st =>
        st.filter(col("event_id") =!= -1L)
          .withWatermark("ts", "31 days")
          .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_first_seen")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_first_seen
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q86
  // Append-mode tumbling window over the ~12-batch sliced replay: late
  // rows (event_id%7 one slice late, %13 two slices late) are genuinely
  // dropped by the advancing watermark. The oracle replays Spark's exact
  // watermark recursion in SQL: per-file max event-time (ms) → running
  // max over earlier files − 10 min delay → drop iff window_end < wm
  // (semantics pinned by graft.tools.WmProbe). This is the semantic a
  // single-batch replay can never exercise — and at 100 TB it is the
  // semantic that bounds state: windows are flushed and evicted as the
  // watermark passes them instead of accumulating forever.
  private val q86 = QueryDef(
    "q86_stream_multibatch_late_drop",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
          .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
            col("event_type"), col("n"), col("sum_value")),
        ss => readStaged(ss, slicedDir(s, d)), "append")
        .filter(col("event_type") =!= "_sentinel")
        .orderBy(col("wstart_epoch"), col("event_type")),
    Some(s"""
      WITH e AS (
        SELECT event_type, value, epoch_us(ts) AS ts_us,
               ((epoch_us(ts) // 3600000000) + 1) * 3600000000 AS wend_us,
               (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) // 518400000000
                 + (CASE WHEN event_id % 13 = 0 THEN 2
                         WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS fid
        FROM events),
      fmax AS (SELECT fid, max(ts_us // 1000) AS fmax_ms FROM e GROUP BY fid),
      wm AS (SELECT fid,
               coalesce(max(fmax_ms) OVER (ORDER BY fid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) - 600000, 0) AS wm_ms
             FROM fmax),
      kept AS (SELECT e.event_type, e.value, e.wend_us
               FROM e JOIN wm USING (fid)
               WHERE e.wend_us >= wm.wm_ms * 1000)
      SELECT CAST((wend_us - 3600000000) // 1000000 AS BIGINT) AS wstart_epoch,
             event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM kept GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- q87
  // dropDuplicatesWithinWatermark with duplicates on BOTH sides of state
  // expiry — the semantic that distinguishes it from q83/q85's plain
  // dedup. Staging plants two duplicates per selected event_id key:
  // same-slice (+5 min → same micro-batch, state alive → always dropped)
  // and two-slices-later (+12 days → usually re-admitted). The oracle
  // models the expiry decision exactly: a far duplicate is re-admitted
  // iff the (2-batch-lagged) watermark at its batch has passed the
  // original's event time + the 10-minute delay; originals whose slice
  // ends within ~20 min of their timestamp stay in state long enough to
  // still dedup their far duplicate (3 such keys at sf0.001 — predicted
  // and observed identically). Under plain dropDuplicates every far
  // duplicate would be dropped, so a green hash proves state expiry
  // genuinely happened. At 100 TB this is the required dedup form:
  // state is bounded by keys per watermark window, not lifetime key
  // cardinality.
  private val q87 = QueryDef(
    "q87_stream_dedup_readmission",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark(Seq("event_id"))
          .select(col("event_type"), col("value")),
        ss => readStaged(ss, dupDir(s, d)), "append")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_admitted"), sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("event_type")),
    Some(s"""
      WITH t0 AS (SELECT min(epoch_us(ts)) AS v FROM events),
      rows_all AS (
        SELECT event_type, value, epoch_us(ts) AS ts_us,
               (epoch_us(ts) - (SELECT v FROM t0)) // 518400000000 AS fid,
               0 AS is_dup
        FROM events
        UNION ALL
        SELECT event_type, value, epoch_us(ts) + 300000000,
               (epoch_us(ts) - (SELECT v FROM t0)) // 518400000000, 1
        FROM events WHERE event_id % 11 = 0
        UNION ALL
        SELECT event_type, value, epoch_us(ts) + 1036800000000,
               (epoch_us(ts) - (SELECT v FROM t0)) // 518400000000 + 2, 2
        FROM events WHERE event_id % 9 = 0),
      fmax AS (SELECT fid, max(ts_us // 1000) AS fmax_ms FROM rows_all GROUP BY fid),
      wm AS (SELECT fid,
               coalesce(max(fmax_ms) OVER (ORDER BY fid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) - 600000, 0) AS wm_ms
             FROM fmax),
      admitted AS (
        SELECT event_type, value FROM rows_all WHERE is_dup = 0
        UNION ALL
        SELECT r.event_type, r.value
        FROM rows_all r JOIN wm w USING (fid)
        WHERE r.is_dup = 2
          AND w.wm_ms > (r.ts_us - 1036800000000) // 1000 + 600000)
      SELECT event_type, count(*) AS n_admitted,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM admitted GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q88
  // transformWithState (Spark 4's arbitrary-state API, the successor to
  // flatMapGroupsWithState): a StatefulProcessor with explicit ValueState
  // tracking per-user (count, cents) across the multi-batch replay.
  // Requires the RocksDB state-store provider — at 100 TB that is the
  // provider you want anyway (changelog checkpointing, state larger than
  // heap). Cents are exact longs (value is 2-decimal fixed), so running
  // totals are order- and partition-independent; each batch emits the
  // running row per active user and (count, cents) grows monotonically,
  // so max(struct(n, cents)) per user in the sink equals final state =
  // the batch aggregate the oracle runs.
  private class SpendProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var state: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("agg",
        org.apache.spark.sql.Encoders.product[(Long, Long)], ttl)
    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      state.update((n, cents))
      Iterator.single((key, n, cents))
    }
  }

  private val q88 = QueryDef(
    "q88_stream_transform_with_state",
    (s, d) =>
      run(s, st => {
        import s.implicits._
        st.filter(col("user_id") =!= -1L)
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("cents"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new SpendProcessor,
            TimeMode.None(), OutputMode.Append())
          .toDF("user_id", "n_events", "cents")
      }, ss => readStaged(ss, slicedDir(s, d)), "append",
        // RocksDB provider + per-batch changelogs instead of full
        // snapshots — the settings a 100 TB deployment runs with, and
        // ~2× less per-micro-batch commit cost here; set on the forked
        // session only (the caller's conf is never touched)
        conf = Seq(
          "spark.sql.streaming.stateStore.providerClass" ->
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
            "true"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("cents"))).as("fin"))
        .select(col("user_id"), col("fin.n_events").as("n_events"),
          (col("fin.cents").cast("double") / 100.0).as("sum_value"))
        .orderBy(col("user_id")),
    Some(s"""
      SELECT user_id, count(*) AS n_events,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  // ---------------------------------------------------------------- q94
  // TTL-BOUNDED arbitrary state: q88's running per-user aggregate with a
  // processing-time TTL on the ValueState — the knob that keeps per-key
  // state finite at 100 TB where key cardinality grows without bound
  // (q88's TTLConfig.NONE is the unbounded running-aggregate form; this
  // is the bounded production form). The 1-hour TTL is orders of
  // magnitude longer than the seconds-long replay, so no state expires
  // mid-run and the result deterministically equals the batch aggregate
  // — actual eviction semantics are pinned by StreamingTtlSpec.
  //
  // Driving: a TTL'd query NEVER QUIESCES — after every batch the
  // processing-time TTL schedules a cleanup batch, which schedules
  // another, so `processAllAvailable`/`drain` hang forever (the round-4
  // livelock, reproduced under Trigger.AvailableNow too). The production
  // pattern, used here: account for SOURCE PROGRESS via a
  // StreamingQueryListener and stop once every staged row has been read.
  // Append-mode emission happens inside each input batch, so when input
  // accounting closes, the sink is complete.
  private val q94 = QueryDef(
    "q94_stream_ttl_bounded_state",
    (s, d) => {
      val staged = slicedDir(s, d)
      // expected input = the POST-FILTER row count: the user_id != -1
      // predicate is pushed into the file scan, so `numInputRows` never
      // counts the filtered sentinel row — accounting against the raw
      // staged count would stall one row short forever
      // explicit schema: zero staged slices (degenerate sweep) would fail
      // inference; the count is legitimately 0 there
      val nStaged = s.read.schema(org.apache.spark.sql.types.StructType
          .fromDDL("event_id bigint, ts timestamp, user_id bigint, " +
            "event_type string, value double, props string"))
        .parquet(staged)
        .filter(col("user_id") =!= -1L).count()
      val name = s"graft_stream_${runId.incrementAndGet()}"
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.name == name) seen.addAndGet(e.progress.numInputRows)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
      ss.streams.addListener(listener)
      try {
        import ss.implicits._
        val q = readStaged(ss, staged)
          .filter(col("user_id") =!= -1L)
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("cents"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new SpendProcessor(TTLConfig(java.time.Duration.ofHours(1))),
            TimeMode.ProcessingTime(), OutputMode.Append())
          .toDF("user_id", "n_events", "cents")
          .writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        try {
          val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
          while (seen.get() < nStaged && q.exception.isEmpty &&
              System.nanoTime() < deadline) Thread.sleep(50)
          q.exception.foreach(throw _)
          require(seen.get() >= nStaged,
            s"q94: source stalled at ${seen.get()}/$nStaged rows")
        } finally q.stop()
      } finally ss.streams.removeListener(listener)
      ss.table(name)
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("cents"))).as("fin"))
        .select(col("user_id"), col("fin.n_events").as("n_events"),
          (col("fin.cents").cast("double") / 100.0).as("sum_value"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      SELECT user_id, count(*) AS n_events,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY user_id
      ORDER BY user_id"""))

  // ---------------------------------------------------------------- q89
  // Stream–static join (enrichment): each micro-batch joins against a
  // static dimension (user → segment), then aggregates per segment in
  // complete mode. The static side is broadcast — the standard shape for
  // enriching an event stream against a dimension at any scale (the
  // static side is re-read per batch, so at 100 TB it would be a compact
  // dim table or a broadcast-refreshed snapshot, never the fact table).
  // The oracle folds the join into the equivalent batch expression.
  private val q89 = QueryDef(
    "q89_stream_static_join",
    (s, d) => {
      // coalesce: empty events (degenerate sweep) would NPE the getLong;
      // a 1-row dim joined against an empty stream is still empty, so
      // the static oracle (plain GROUP BY over events) mirrors the guard
      val maxUid = Tables.t(s, d, "events")
        .agg(coalesce(max(col("user_id")), lit(0L))).head().getLong(0)
      val dim = s.range(0, maxUid + 1).select(col("id").as("user_id"),
        pmod(col("id"), lit(7L)).as("segment"))
      run(s, st =>
        st.filter(col("user_id") =!= -1L)
          .join(broadcast(dim), "user_id")
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value")),
        ss => readStaged(ss, slicedDir(s, d)), "complete")
        .orderBy(col("segment"))
    },
    Some(s"""
      SELECT user_id % 7 AS segment, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY segment"""))

  // ---------------------------------------------------------------- q93
  // foreachBatch production sink: the same bounded replay drained into a
  // PARQUET table per micro-batch instead of the memory sink — the shape
  // every production pipeline ends in (foreachBatch gives batch-side
  // sinks: file/table appends, MERGE targets, idempotent-by-batchId
  // writes). The sink table is then read back as the query result, so
  // the oracle hash-checks the full stream → foreachBatch → table path.
  // The output dir is cleared per invocation — append semantics must
  // start from empty, unlike the staging dirs which are content-stable
  // and reused across runs.
  private val q93 = QueryDef(
    "q93_stream_foreachbatch_sink",
    (s, d) => {
      val outDir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "fbsink_out")
      deleteRecursively(outDir)
      // pre-create: with zero staged slices no batch ever writes, and the
      // explicit-schema read below still needs an existing (empty) path
      java.nio.file.Files.createDirectories(outDir)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val q = readStaged(ss, slicedDir(s, d))
        .filter(col("event_id") =!= -1L &&
          col("event_type") === "purchase" && col("value") > lit(50.0))
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batch.write.mode("append").parquet(outDir.toString)
        }
        .start()
      try drain(q) finally q.stop()
      // explicit schema: zero staged slices (degenerate sweep) → zero
      // batches → no sink files; inference would throw on the empty dir
      s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          "event_id bigint, user_id bigint, value double"))
        .parquet(outDir.toString).orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, value
      FROM events
      WHERE event_type = 'purchase' AND value > 50.0
      ORDER BY event_id"""))

  /** Staging for the stream–stream join: pure event-time slices (no late
    * shifts) plus the flush sentinel. The join's correctness argument
    * needs arrivals in event-time order — see q96. */
  private def orderedDir(s: SparkSession, d: String): String =
    stageStable(s, "ordered", "ordered", d) { dir =>
      val ev = Tables.t(s, d, "events")
      val bounds = ev.agg(
        min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      if (!bounds.isNullAt(0)) { // empty events → zero slice files
        val Row(t0: Long, tMax: Long) = bounds
        val withFid = ev.withColumn("fid",
          expr(s"(unix_micros(ts) - ${t0}L) DIV ${SliceUs}L"))
        val maxFid = withFid.agg(max(col("fid"))).head().getLong(0)
        val sentinel = s.range(1).select(
          lit(-1L).as("event_id"),
          expr(s"timestamp_micros(${tMax + 30L * 86400L * 1000000L}L)").as("ts"),
          lit(-1L).as("user_id"), lit("_sentinel").as("event_type"),
          lit(0.0).as("value"), lit(null).cast("string").as("props"),
          lit(maxFid + 1).as("fid"))
        writeSliceFiles(s, withFid.unionByName(sentinel), dir)
      }
    }

  // ---------------------------------------------------------------- q96
  // Stream–stream interval join: purchases within 1 h after a view by
  // the same user, both sides real streams with watermarks. Inner joins
  // emit on arrival; the watermarks exist to EVICT state — each view is
  // droppable once the purchase-side watermark passes view.ts + 1 h, so
  // join state is bounded by (events within the watermark horizon), not
  // by the stream length: the property that makes stream–stream joins
  // feasible at 100 TB. Completeness over the bounded replay: slices are
  // 6 days, the pinned watermark lag is 2 batches, and a purchase can
  // only match views ≤ 1 h older, so a needed view is at most one slice
  // behind — far inside the horizon; no pair is ever evicted early. The
  // result therefore equals the batch interval join the oracle runs.
  // Two file sources list the same staged dir (1 file/trigger each, same
  // mtime order), so the sides advance in lockstep and the global
  // watermark is the min over both. Lockstep is a throughput nicety, NOT
  // a correctness dependency: StreamingSkewSpec replays the purchase
  // side two full slices behind the view side and the join still equals
  // the batch oracle — min-policy watermarking means a lagging source
  // holds back eviction for everyone, so skew costs state size, never
  // rows. (`multipleWatermarkPolicy=max` is the config that would break
  // this; the default `min` is what the 100 TB argument assumes.)
  private def streamStreamJoin(s: SparkSession, d: String,
      joinType: String): DataFrame = {
    val dir = orderedDir(s, d)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    // the sentinel passes BOTH pre-watermark filters (a plain event_type
    // predicate would be pushed below the watermark node and the final
    // watermark would never advance — the outer join's unmatched rows in
    // the last hour of the stream would then never flush); its -1 rows
    // are dropped from the sink table below
    val views = readStaged(ss, dir)
      .filter(col("event_type").isin("view", "_sentinel"))
      .select(col("event_id").as("v_id"), col("ts").as("v_ts"),
        col("user_id").as("v_uid"))
      .withWatermark("v_ts", "1 hour")
    val purchases = readStaged(ss, dir)
      .filter(col("event_type").isin("purchase", "_sentinel"))
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_uid"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("v_uid") === col("p_uid") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("v_uid").as("user_id"), col("v_id"), col("p_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) /
          lit(1000000L)).cast("long").as("lag_s"))
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try drain(q) finally q.stop()
    ss.table(name).filter(col("v_id") =!= -1L)
      .orderBy(col("user_id"), col("v_id"), col("p_id"))
  }

  // ---------------------------------------------------------------- q200
  // FULL OUTER stream–stream join — completes the streaming join-mode
  // matrix (q96 inner, q97 left outer): BOTH sides' unmatched rows must
  // flush with NULLs, each only once its own side's watermark proves no
  // future match can arrive. State and emission are symmetric — a
  // purchase with no qualifying view is as late-bound as a view with no
  // purchase — so this exercises the join operator's two-sided state
  // eviction at once. Same interval condition, same sentinel discipline
  // (it must pass BOTH pre-watermark filters); sentinel rows drop from
  // the sink with null-safe predicates (a plain =!= would silently drop
  // every half-null outer row — the classic three-valued-logic trap).
  // user_id comes from COALESCE across sides, since either can be null.
  private def streamStreamFullOuter(s: SparkSession, d: String): DataFrame = {
    val dir = orderedDir(s, d)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val views = readStaged(ss, dir)
      .filter(col("event_type").isin("view", "_sentinel"))
      .select(col("event_id").as("v_id"), col("ts").as("v_ts"),
        col("user_id").as("v_uid"))
      .withWatermark("v_ts", "1 hour")
    val purchases = readStaged(ss, dir)
      .filter(col("event_type").isin("purchase", "_sentinel"))
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_uid"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("v_uid") === col("p_uid") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "fullOuter")
      .select(coalesce(col("v_uid"), col("p_uid")).as("user_id"),
        col("v_id"), col("p_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) /
          lit(1000000L)).cast("long").as("lag_s"))
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try drain(q) finally q.stop()
    ss.table(name)
      .filter(coalesce(col("v_id"), lit(0L)) =!= -1L &&
        coalesce(col("p_id"), lit(0L)) =!= -1L)
      .orderBy(col("user_id"), col("v_id"), col("p_id"))
  }

  private val q200 = QueryDef(
    "q200_stream_stream_full_outer",
    (s, d) => streamStreamFullOuter(s, d),
    Some("""
      SELECT COALESCE(v.user_id, p.user_id) AS user_id,
             v.event_id AS v_id, p.event_id AS p_id,
             CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
               AS lag_s
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      ORDER BY user_id, v_id, p_id"""))

  // ---------------------------------------------------------------- q283
  // RIGHT OUTER stream–stream join — the last of Spark's five supported
  // stream–stream modes (inner q96, leftOuter q97, fullOuter q200,
  // leftSemi q260; leftAnti is unsupported by the engine, documented
  // here as the mode-matrix boundary). Symmetric to q97 with the
  // preserved side flipped: a purchase with no qualifying view in the
  // preceding hour emits with NULL view columns only once the VIEW
  // side's watermark passes purchase.ts (no earlier view can still
  // arrive) — i.e. the preserved side's flush is gated by the OTHER
  // side's watermark, the asymmetry this query pins that neither q97
  // nor q200 isolates. Same interval condition, same both-filter
  // sentinel discipline; user_id comes from the purchase side (never
  // null in right outer), null-safe sentinel drop on v_id. Scale: state
  // bounded by the 1 h horizon on both sides exactly as q96's scaladoc
  // argues; the preserved side adds no state beyond the inner join's.
  private def streamStreamRightOuter(s: SparkSession, d: String): DataFrame = {
    val dir = orderedDir(s, d)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val views = readStaged(ss, dir)
      .filter(col("event_type").isin("view", "_sentinel"))
      .select(col("event_id").as("v_id"), col("ts").as("v_ts"),
        col("user_id").as("v_uid"))
      .withWatermark("v_ts", "1 hour")
    val purchases = readStaged(ss, dir)
      .filter(col("event_type").isin("purchase", "_sentinel"))
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_uid"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("v_uid") === col("p_uid") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "rightOuter")
      .select(col("p_uid").as("user_id"), col("v_id"), col("p_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) /
          lit(1000000L)).cast("long").as("lag_s"))
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val q = joined.writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try drain(q) finally q.stop()
    ss.table(name)
      .filter(coalesce(col("v_id"), lit(0L)) =!= -1L &&
        col("p_id") =!= -1L)
      .orderBy(col("user_id"), col("p_id"), col("v_id"))
  }

  private val q283 = QueryDef(
    "q283_stream_stream_right_outer",
    (s, d) => streamStreamRightOuter(s, d),
    Some("""
      SELECT p.user_id AS user_id,
             v.event_id AS v_id, p.event_id AS p_id,
             CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
               AS lag_s
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      ORDER BY user_id, p_id, v_id"""))

  private val q96 = QueryDef(
    "q96_stream_stream_join",
    (s, d) => streamStreamJoin(s, d, "inner"),
    Some("""
      SELECT v.user_id, v.event_id AS v_id, p.event_id AS p_id,
             CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
               AS lag_s
      FROM events v
      JOIN events p
        ON v.user_id = p.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      WHERE v.event_type = 'view' AND p.event_type = 'purchase'
      ORDER BY v.user_id, v_id, p_id"""))

  // ---------------------------------------------------------------- q97
  // LEFT OUTER stream–stream join — the semantically hard variant: a
  // view with no purchase within its hour can only be emitted (with
  // NULLs) once the watermark proves no future match can arrive, i.e.
  // after it passes view.ts + 1 h. The staging's far-future sentinel
  // advances the final watermark past every view, so the bounded replay
  // flushes ALL unmatched rows and the result equals the batch LEFT
  // JOIN — hash-checked. Without that watermark-driven nulls mechanism
  // an outer stream join would have to buffer forever; with it, state
  // and emission are both bounded by the time horizon (same 100 TB
  // argument as q96).
  private val q97 = QueryDef(
    "q97_stream_stream_left_outer",
    (s, d) => streamStreamJoin(s, d, "leftOuter"),
    Some("""
      SELECT v.user_id, v.event_id AS v_id, p.event_id AS p_id,
             CAST((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS BIGINT)
               AS lag_s
      FROM (SELECT * FROM events WHERE event_type = 'view') v
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON v.user_id = p.user_id
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      ORDER BY v.user_id, v_id, p_id"""))

  // ---------------------------------------------------------------- q98
  // q80's tumbling-window aggregate over a MemoryStream instead of the
  // staged file source — the staging-independence probe: every other
  // streaming query replays through writeSliceFiles/readStaged, so a bug
  // in that machinery (mtime ordering, slice assignment, sentinel
  // handling) could in principle hide in all of them. Here the SAME
  // operator runs against Spark's driver-fed source with the sample
  // delivered in 8 arbitrary chunks, and must still match the batch
  // oracle — semantics come from the operator + watermark, not the
  // batching. The driver-side feed is the MemoryStream CONTRACT (it is
  // Spark's in-process test source), so this is the one query that holds
  // rows on the driver — bounded by the deterministic 1/97 event_id
  // sample (~10³ rows at sf0.1, invariant of SF only linearly); the
  // production path for unbounded data stays file/Kafka sources (q80).
  private val q98 = QueryDef(
    "q98_stream_memory_source",
    (s, d) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
      import ss.implicits._
      val rows = Tables.t(ss, d, "events")
        .filter(col("event_id") % 97 === 0)
        .select(unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
        .orderBy(col("ts_us"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val in = MemoryStream[(Long, String, Double)]
      val agg = in.toDF().toDF("ts_us", "event_type", "value")
        .select(expr("timestamp_micros(ts_us)").as("ts"),
          col("event_type"), col("value"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
          col("event_type"), col("n"), col("sum_value"))
      val name = s"graft_stream_${runId.incrementAndGet()}"
      val q = agg.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        val chunk = math.max(1, rows.length / 8 + 1)
        rows.grouped(chunk).foreach { c =>
          in.addData(c.toSeq); q.processAllAvailable()
        }
        drain(q)
      } finally q.stop()
      ss.table(name).orderBy(col("wstart_epoch"), col("event_type"))
    },
    Some(s"""
      SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS wstart_epoch,
             event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      WHERE event_id % 97 = 0
      GROUP BY 1, 2
      ORDER BY wstart_epoch, event_type"""))

  // ---------------------------------------------------------------- q178
  // Checkpoint restart / exactly-once resume — the production failure-and-
  // upgrade story no single-run query exercises: a streaming aggregation
  // is run to completion with Trigger.AvailableNow over HALF the staged
  // backlog and STOPPED; more files then arrive; a brand-new query object
  // with the SAME checkpointLocation resumes. The second run must (a) skip
  // every file the first run committed (offset-log recovery — re-reading
  // one would double-count `n`), and (b) restore the aggregation state
  // store (the first run's counts survive the restart — losing state
  // would under-count). Complete-mode foreachBatch overwrites the sink
  // parquet each micro-batch, so the table read back after run 2 is the
  // final restored+updated state, hash-checked against the one-shot batch
  // aggregate DuckDB runs over the whole table. At 100 TB this is the
  // mechanism that makes a streaming pipeline restartable at all:
  // checkpointed offsets + state mean a crash or planned upgrade costs
  // one micro-batch of recovery, never a reprocess of the stream.
  private val q178 = QueryDef(
    "q178_stream_restart_resume",
    (s, d) => {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      import scala.jdk.CollectionConverters._
      val all = Paths.get(slicedDir(s, d))
      val files = Files.list(all).iterator.asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      val base = Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "resume")
      deleteRecursively(base) // checkpoint semantics need a fresh lineage
      val live = base.resolve("live")
      val ckpt = base.resolve("ckpt").toString
      val sink = base.resolve("sink").toString
      Files.createDirectories(live)
      // COPY_ATTRIBUTES keeps the staged ascending mtimes, so the file
      // source's age filter and backlog ordering see the original layout
      def arrive(fs: Seq[java.nio.file.Path]): Unit = fs.foreach { f =>
        Files.copy(f, live.resolve(f.getFileName),
          StandardCopyOption.COPY_ATTRIBUTES)
      }
      def runToCompletion(): Unit = {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val q = readStaged(ss, live.toString)
          .filter(col("event_id") =!= -1L)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
            batch.coalesce(1).write.mode("overwrite").parquet(sink)
          }
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      val (firstHalf, rest) = files.splitAt(files.length / 2)
      arrive(firstHalf)
      runToCompletion() // run 1: commits offsets + state to the checkpoint
      arrive(rest)
      runToCompletion() // run 2: a NEW query resumes from the checkpoint
      // explicit schema + pre-created sink: zero staged slices (degenerate
      // sweep) run zero batches, so foreachBatch never writes
      Files.createDirectories(Paths.get(sink))
      s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          "event_type string, n bigint, sum_value double"))
        .parquet(sink).orderBy(col("event_type"))
    },
    Some(s"""
      SELECT event_type, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- q189
  // Update-mode streaming upsert — the third output mode (q80 complete,
  // q86 append), composed with q182's dynamic partition overwrite into
  // the "continuously materialized aggregate table" pattern: a running
  // per-segment aggregate emits ONLY the keys whose value changed each
  // micro-batch (update mode), and foreachBatch upserts exactly those
  // keys by dynamically overwriting their partitions of a segment-
  // partitioned parquet table. Per batch the write cost is
  // O(changed keys), never O(all keys); the final table read back equals
  // the batch aggregate — which is what the oracle checks. No watermark:
  // a running all-time aggregate keeps |keys| state by design (the
  // windowed+watermarked variant is q80's shape; TTL state is q94's).
  private val q189 = QueryDef(
    "q189_stream_update_upsert",
    (s, d) => {
      val outDir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "upsert_out")
      deleteRecursively(outDir)
      // pre-create: zero staged slices -> zero batches -> no sink files;
      // the explicit-schema read below still needs an existing path
      java.nio.file.Files.createDirectories(outDir)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val q = readStaged(ss, slicedDir(s, d))
        .filter(col("event_id") =!= -1L)
        .groupBy((col("user_id") % 100).as("segment"))
        .agg(count(lit(1)).as("n"), sumFixed(col("value"), 2).as("sum_value"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batch.write.mode("overwrite").partitionBy("segment")
            .parquet(outDir.toString)
        }
        .outputMode("update")
        .start()
      try drain(q) finally q.stop()
      s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
          "n bigint, sum_value double, segment int"))
        .parquet(outDir.toString)
        .select(col("segment").cast("long").as("segment"), col("n"),
          col("sum_value"))
        .orderBy(col("segment"))
    },
    Some(s"""
      SELECT user_id % 100 AS segment, count(*) AS n,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM events
      GROUP BY 1
      ORDER BY segment"""))

  // ---------------------------------------------------------------- q197
  // EVENT-TIME TIMERS — the transformWithState surface q88/q94 leave
  // unexercised: per-key timers that fire when the WATERMARK passes a
  // registered event-time, letting a processor act on keys that receive
  // no further input (the only way to close a session for a user who
  // simply went away). Workload: arbitrary-state reimplementation of
  // per-user session windows (30-min gap) — what Spark's built-in
  // session_window (q82) does internally, opened up:
  //  - state = ListState of open sessions (start_ms, last_ms, n);
  //  - input events below `timerValues.getCurrentWatermarkInMs()` are
  //    dropped. Pinned empirically (oracle diffing at sf0.001, exact
  //    session-count match 757 under lag-1 vs 875/946 under lag-2/3):
  //    the watermark transformWithState EXPOSES in batch j derives from
  //    data through batch j−1 — the EVICTION watermark, one batch LESS
  //    lagged than the lag-2 offset-log watermark the built-in
  //    operators apply to late rows (q86/q87's model). The two models
  //    genuinely differ; the oracle here uses 1 PRECEDING;
  //  - a kept event merges every open session within the 30-min gap of
  //    it (interval connected-components — ORDER-INDEPENDENT, so intra-
  //    batch arrival order and cross-batch splits cannot change the
  //    result);
  //  - ONE timer per key, at the earliest open-session close time; on
  //    expiry the processor emits+drops every session the watermark has
  //    passed and re-arms for the next — emission is single-shot by
  //    construction (a future kept event has ts ≥ wm > close+gap, so it
  //    can never merge into an emitted session).
  // The staged sentinel (+30 d) drives the final watermark past every
  // real close time, so ALL sessions of kept rows emit deterministically
  // — the oracle is plain batch sessionization over the kept set, with
  // no emission-timing term at all.
  // Scale: state per key = open sessions inside the watermark horizon
  // (bounded by lag × session rate, not history); timers are one per key;
  // everything shuffles once on user_id — the q82/q84 contract.
  private[graft] class SessionTimerProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp),
        (Long, Long, Long, Long)] {
    private val GapMs = 30L * 60 * 1000
    @transient private var open: ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[(Long, Long, Long)]("open",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)

    /** Persist the open-session set (the store rejects empty list PUTs —
      * an empty set is a clear()) and re-arm the single per-key timer at
      * the earliest close time. */
    private def save(sessions: Seq[(Long, Long, Long)]): Unit = {
      if (sessions.isEmpty) open.clear() else open.put(sessions.toArray)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (sessions.nonEmpty)
        getHandle.registerTimer(sessions.map(_._2).min + GapMs)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val wm = timers.getCurrentWatermarkInMs()
      var sessions = open.get().toList
      rows.foreach { case (_, t) =>
        val ms = t.getTime // µs floor-divided, the engine's event-time unit
        if (ms >= wm) {
          val (near, far) = sessions.partition { case (s0, l, _) =>
            ms >= s0 - GapMs && ms <= l + GapMs
          }
          val merged = near.foldLeft((ms, ms, 1L)) {
            case ((s0, l, n), (s1, l1, n1)) =>
              (math.min(s0, s1), math.max(l, l1), n + n1)
          }
          sessions = merged :: far
        }
      }
      save(sessions)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
      val wm = timers.getCurrentWatermarkInMs()
      val (due, still) = open.get().toList.partition(_._2 + GapMs <= wm)
      save(still)
      due.sortBy(_._1)
        .map { case (s0, l, n) => (key, s0, l, n) }.iterator
    }
  }

  private val q197 = QueryDef(
    "q197_stream_timer_sessions",
    (s, d) =>
      run(s, st => {
        import s.implicits._
        st.withWatermark("ts", "10 minutes")
          .select(col("user_id"), col("ts"))
          .as[(Long, java.sql.Timestamp)]
          .groupByKey(_._1)
          .transformWithState(new SessionTimerProcessor,
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "start_ms", "end_ms", "n_events")
      }, ss => readStaged(ss, slicedDir(s, d)), "append",
        // timers + ListState = multiple state column families — RocksDB
        // provider required (HDFS-backed refuses), changelogs as in q88
        conf = Seq(
          "spark.sql.streaming.stateStore.providerClass" ->
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
            "true"))
        .filter(col("user_id") =!= -1L)
        .orderBy(col("user_id"), col("start_ms")),
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events))
                 // ${SliceUs}
                 + (CASE WHEN event_id % 13 = 0 THEN 2
                         WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS fid
        FROM events),
      fmax AS (SELECT fid, max(ts_us // 1000) AS fmax_ms FROM e GROUP BY fid),
      wm AS (SELECT fid,
               coalesce(max(fmax_ms) OVER (ORDER BY fid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600000, 0)
                 AS wm_ms
             FROM fmax),
      kept AS (
        SELECT e.user_id, e.ts_us // 1000 AS ms
        FROM e JOIN wm USING (fid)
        WHERE e.ts_us // 1000 >= wm.wm_ms),
      flg AS (
        SELECT user_id, ms,
               CASE WHEN lag(ms) OVER w IS NULL
                      OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS brk
        FROM kept
        WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
      sess AS (
        SELECT user_id, ms,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM flg)
      SELECT user_id, min(ms) AS start_ms, max(ms) AS end_ms,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, start_ms"""))

  // --------------------------------------------------------------- q260
  // LEFT SEMI stream–stream join — the existence-check member of the
  // streaming join matrix (q96 inner, q97 left outer, q200 full outer):
  // "views that led to a purchase within the hour", emitted AT MOST ONCE
  // per view no matter how many purchases match — the fan-out-free form
  // a funnel counter wants (the inner join q96 would multiply a view by
  // its purchase count). Spark supports leftSemi between two streams
  // (leftAnti it does not — the documented gap; the batch NOT-EXISTS
  // q135/q206 family is the engine's answer there). Same interval
  // condition, watermark-bounded state, and sentinel discipline as q96;
  // a semi row carries only left-side columns by definition, so the
  // sink projection is the view side alone.
  private val q260 = QueryDef(
    "q260_stream_stream_semi",
    (s, d) => {
      val dir = orderedDir(s, d)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val views = readStaged(ss, dir)
        .filter(col("event_type").isin("view", "_sentinel"))
        .select(col("event_id").as("v_id"), col("ts").as("v_ts"),
          col("user_id").as("v_uid"))
        .withWatermark("v_ts", "1 hour")
      val purchases = readStaged(ss, dir)
        .filter(col("event_type").isin("purchase", "_sentinel"))
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
          col("user_id").as("p_uid"))
        .withWatermark("p_ts", "1 hour")
      val joined = views.join(purchases,
        col("v_uid") === col("p_uid") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
        "leftSemi")
        .select(col("v_uid").as("user_id"), col("v_id"),
          unix_timestamp(col("v_ts")).as("v_epoch"))
      val name = s"graft_stream_${runId.incrementAndGet()}"
      val q = joined.writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try drain(q) finally q.stop()
      ss.table(name).filter(col("v_id") =!= -1L)
        .orderBy(col("user_id"), col("v_id"))
    },
    Some("""
      SELECT v.user_id, v.event_id AS v_id,
             CAST(epoch_us(v.ts) // 1000000 AS BIGINT) AS v_epoch
      FROM events v
      WHERE v.event_type = 'view'
        AND EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase'
            AND p.user_id = v.user_id
            AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
      ORDER BY v.user_id, v_id"""))

  // --------------------------------------------------------------- q251
  // CHAINED time-window aggregation (the streaming rollup cascade,
  // Spark 3.4+ multiple-stateful-operator support): 5-minute tumbling
  // pre-aggregates re-aggregate into 1-hour windows INSIDE one streaming
  // query — `window(window_time(window), '1 hour')` — the standard
  // metrics topology (fine-grain pane → coarse rollup) that otherwise
  // costs a second query reading the first one's sink. At 100 TB this is
  // the state-bounding shape: the outer operator holds |1h windows| rows,
  // not events, and the inner panes evict as the watermark passes —
  // nothing re-reads or re-shuffles raw events for the coarse grain.
  //
  // Semantics under the ~12-batch replay: the inner aggregate drops late
  // input rows by the q86 watermark recursion (the oracle replays it: per
  // -file max event-time → running max lagged one batch − 10 min); inner
  // panes emit when the watermark passes their end, and Spark's
  // cross-operator watermark propagation delays the outer operator's
  // watermark so an emitted pane is never late downstream — the rollup is
  // LOSSLESS over surviving rows (this is the property this query pins
  // cross-engine). The sentinel advances the final watermark past every
  // real window; its own pane never finalizes, so it is absent from the
  // output by construction. n_panes counts the surviving 5-min panes per
  // hour — the fan-in observability a rollup dashboard shows.
  private val q251 = QueryDef(
    "q251_stream_chained_windows",
    (s, d) =>
      run(s, st =>
        st.withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "5 minutes"))
          .agg(count(lit(1)).as("n5"),
            sum(round(col("value") * 100).cast("long")).as("c5"))
          .groupBy(window(window_time(col("window")), "1 hour"))
          .agg(sum(col("n5")).as("n"), count(lit(1)).as("n_panes"),
            sum(col("c5")).as("cents"))
          .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
            col("n"), col("n_panes"),
            (col("cents").cast("double") / lit(100.0)).as("sum_value")),
        ss => readStaged(ss, slicedDir(s, d)), "append")
        .orderBy(col("wstart_epoch")),
    Some("""
      WITH e AS (
        SELECT value, epoch_us(ts) AS ts_us,
               ((epoch_us(ts) // 300000000) + 1) * 300000000 AS w5end_us,
               (epoch_us(ts) - (SELECT min(epoch_us(ts)) FROM events)) // 518400000000
                 + (CASE WHEN event_id % 13 = 0 THEN 2
                         WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS fid
        FROM events),
      fmax AS (SELECT fid, max(ts_us // 1000) AS fmax_ms FROM e GROUP BY fid),
      wm AS (SELECT fid,
               coalesce(max(fmax_ms) OVER (ORDER BY fid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING) - 600000, 0) AS wm_ms
             FROM fmax),
      kept AS (SELECT e.value, e.w5end_us
               FROM e JOIN wm USING (fid)
               WHERE e.w5end_us >= wm.wm_ms * 1000),
      pane AS (
        SELECT w5end_us, count(*) AS n5,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c5
        FROM kept GROUP BY 1)
      SELECT CAST(((w5end_us - 1) // 3600000000) * 3600 AS BIGINT)
               AS wstart_epoch,
             CAST(sum(n5) AS BIGINT) AS n, count(*) AS n_panes,
             CAST(sum(c5) AS DOUBLE) / 100.0 AS sum_value
      FROM pane
      GROUP BY 1
      ORDER BY wstart_epoch"""))

  val defs: Seq[QueryDef] =
    Seq(q80, q81, q82, q83, q84, q85, q86, q87, q88, q89, q93, q94, q96, q97,
      q98, q178, q189, q197, q200, q251, q260, q283, q287)
}
