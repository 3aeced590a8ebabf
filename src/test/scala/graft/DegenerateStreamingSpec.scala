package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input sweep for the STREAMING family (r11 verdict task 3):
  * DegenerateDataSpec's batch sweeps can't reach watermark or state-store
  * edges, so this spec drives every registered stream query through the
  * real staged-replay machinery against three adversarial event tables:
  *
  *   - EMPTY events/documents → ZERO slice files. The staging builders
  *     must stage nothing (not die on a null min/max — the pre-r12 state
  *     of slicedDir/dupDir/orderedDir), the file sources must yield zero
  *     batches, and the foreachBatch sinks must read back their empty
  *     shape (explicit schemas — inference over a fileless dir throws).
  *   - SINGLE-event table → single-row micro-batches: one slice plus the
  *     flush sentinel; every windowed/stateful operator sees exactly one
  *     data row, session windows have no second event, stream–stream
  *     joins have one side empty after the type split.
  *   - LATE-HEAVY table → every data-carrying row but two is assigned to
  *     the +2-slice late shift (event_id ≡ 0 mod 13) at the MINIMUM
  *     event time, with one row a full slice later that drives the
  *     watermark past them before they arrive: the watermark-drop path
  *     processes a batch consisting ENTIRELY of late rows. All late rows
  *     also share ONE instant (zero spans, identical dedup keys).
  *
  * Gate: every stream query must COMPLETE (any throw fails — unlike the
  * batch sweeps there is no legitimate driver-side .head-on-empty in the
  * streaming fns; they all return sink tables). q185 is excluded with the
  * other _ml_ fits (its classifier legitimately requires non-empty dense
  * labels). Guards this sweep forced are oracle-mirrored where semantics
  * could diverge (q89's coalesce(max(user_id), 0) dim bound — an empty
  * stream joins to empty either way).
  */
class DegenerateStreamingSpec extends AnyFunSuite {
  import TestSpark._

  /** Write one fixture dir: an events table plus the minimal companion
    * tables the streaming family touches (documents for q210/q341;
    * embeddings kept absent — ML fits are excluded from the sweep). */
  private def fixture(tag: String)(
      events: org.apache.spark.sql.DataFrame,
      docs: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_degstream_$tag").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def eventsDF(rows: Seq[(Long, String, Long, String, Double, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  private def docsDF(rows: Seq[(Long, String, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private lazy val emptyDir: String =
    fixture("empty")(eventsDF(Nil), docsDF(Nil))

  private lazy val singleDir: String = fixture("single")(
    eventsDF(Seq(
      (1L, "2024-01-02 00:00:00.000000", 1L, "purchase", 75.0,
        "{\"k\": 3}"))),
    // one sub-100-char doc: the q341 quality filter empties the feed
    // AFTER the file source has produced real single-row batches
    docsDF(Seq((5L, "tiny doc", "en", "src0"))))

  /** Late-heavy: ids 13/26/39/52 sit at t0 with the %13 ≡ 0 late shift
    * (+2 slices → they replay as batch index 2); ids 1 and 2 share slice
    * 0, id 2's t0+5d timestamp being the watermark anchor, and id 3 fills
    * slice 1 so the late batch arrives two batches after the anchor —
    * the replay's watermark lag is TWO batches (pinned empirically by
    * q86's oracle, `ROWS ... AND 2 PRECEDING`), so by batch 2 the
    * watermark sits ~5 days past t0 and the whole late batch is
    * droppable under every 10-minute/1-hour watermark on the board. The
    * four late rows share ONE instant (zero spans, identical dedup keys)
    * and split across view/purchase so the stream–stream joins and
    * type-filtered paths see late data. */
  private lazy val lateDir: String = fixture("late")(
    eventsDF(Seq(
      (1L, "2024-01-01 00:00:00.000000", 1L, "view", 10.0, "{\"k\": 1}"),
      (2L, "2024-01-06 00:00:00.000000", 2L, "purchase", 80.0, "{\"k\": 2}"),
      (3L, "2024-01-08 00:00:00.000000", 2L, "view", 5.0, "{\"k\": 9}"),
      (13L, "2024-01-01 00:00:00.000000", 3L, "view", 0.0, null),
      (26L, "2024-01-01 00:00:00.000000", 3L, "purchase", 60.0, "{}"),
      (39L, "2024-01-01 00:00:00.000000", 4L, "view", 0.0, "not json"),
      (52L, "2024-01-01 00:00:00.000000", 4L, "purchase", 55.0,
        "{\"k\": 50}"))),
    docsDF(Seq(
      (0L, ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim,
        "en", "src0"),
      (5L, ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim,
        "en", "src0"), // feed doc duplicating a corpus doc exactly
      (10L, "word " * 30, "de", "src1"))))

  private def sweep(dir: String): Seq[String] = {
    val skip = (n: String) => !n.contains("stream") || n.contains("_ml_")
    // concurrent sweep (ParSweep): each replay runs on its own newSession
    // with its own checkpoint temp dirs; the staged slice dirs are built
    // once behind stageStable's computeIfAbsent, so concurrent first
    // calls block on a single build
    ParSweep.sweep(spark,
      SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1)),
      par = 6) { (name, fn, ss) =>
      try { fn(ss, dir).write.format("noop").mode("overwrite").save(); None }
      catch {
        case e: Throwable =>
          val cause = Iterator.iterate(e)(_.getCause)
            .takeWhile(_ != null).take(5).toSeq.last
          Some(s"$name: ${cause.getClass.getSimpleName}: " +
            s"${Option(cause.getMessage).getOrElse("").take(300)}")
      }
    }
  }

  test("every stream query completes on EMPTY events (zero slice files)") {
    val f = sweep(emptyDir)
    assert(f.isEmpty, s"stream queries failed on empty events:\n${f.mkString("\n")}")
  }

  test("every stream query completes on a SINGLE event (single-row batches)") {
    val f = sweep(singleDir)
    assert(f.isEmpty, s"stream queries failed on single event:\n${f.mkString("\n")}")
  }

  test("every stream query completes on LATE-HEAVY events (all-late batch)") {
    val f = sweep(lateDir)
    assert(f.isEmpty, s"stream queries failed on late-heavy events:\n${f.mkString("\n")}")
  }

  /** r12 verdict task 6: compose the degenerate fixtures with CHECKPOINT
    * STOP/RESUME — the corner where recovery bugs live (state store with
    * ≤ 1 row; watermark restored ahead of all data). A q86-shaped
    * watermarked append-mode window aggregation runs as TWO successive
    * Trigger.AvailableNow queries sharing one checkpoint: the staged
    * slice files are split in half, the first query consumes the first
    * half and stops, the rest "arrive", and a brand-new query object
    * resumes. The sink is the native parquet streaming sink, so the
    * FileStreamSink metadata log's exactly-once discipline is under test
    * across the restart too. Returns (wstart_epoch, event_type, n) rows
    * excluding the flush sentinel. */
  private def restartReplay(fixtureDir: String, tag: String)
      : Seq[(Long, String, Long)] = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    import graft.streaming.EventStreams
    val staged = Paths.get(EventStreams.slicedDir(spark, fixtureDir))
    val files =
      (if (Files.exists(staged)) Files.list(staged).iterator.asScala.toSeq
       else Nil)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
    val base = Files.createTempDirectory(s"graft_degrestart_$tag")
    val live = base.resolve("live"); Files.createDirectories(live)
    val sink = base.resolve("sink"); Files.createDirectories(sink)
    val ckpt = base.resolve("ckpt").toString
    def arrive(fs: Seq[java.nio.file.Path]): Unit = fs.foreach { f =>
      Files.copy(f, live.resolve(f.getFileName),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    def runToCompletion(): Unit = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val q = EventStreams.readStaged(ss, live.toString)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("wstart_epoch"),
          col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val (firstHalf, rest) = files.splitAt(files.length / 2)
    arrive(firstHalf)
    runToCompletion() // run 1: offsets + window state + watermark committed
    arrive(rest)
    runToCompletion() // run 2: NEW query, same checkpoint
    spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
        "wstart_epoch bigint, event_type string, n bigint"))
      .parquet(sink.toString)
      .filter(col("event_type") =!= "_sentinel")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("checkpoint restart on EMPTY events: two zero-batch runs, empty sink") {
    assert(restartReplay(emptyDir, "empty").isEmpty)
  }

  test("checkpoint restart on a SINGLE event: ≤1-row state survives the stop") {
    // run 1 consumes the one data slice (append emits nothing — the
    // watermark hasn't passed the window); run 2 is ONLY the flush
    // sentinel, so the emitted row must come from the RESTORED state
    // store. Losing state across the restart yields an empty sink.
    val got = restartReplay(singleDir, "single")
    val wstart = java.time.Instant.parse("2024-01-02T00:00:00Z")
      .getEpochSecond
    assert(got == Seq((wstart, "purchase", 1L)),
      s"restored single-row window state must flush after resume: $got")
  }

  test("checkpoint restart on LATE-HEAVY events: restored watermark still drops") {
    // the late batch (4 rows at t0) arrives ONLY after the restart; the
    // resumed query must drop it under the watermark RESTORED from the
    // checkpoint (losing the watermark would re-open the already-flushed
    // t0 window and emit it twice; losing state would under-count).
    val got = restartReplay(lateDir, "late")
    assert(got.map(_._3).sum == 3L,
      s"only the 3 on-time rows may survive the restart: $got")
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(got.count(_._1 == t0) == 1 &&
      got.find(_._1 == t0).get._3 == 1L,
      s"the t0 window must appear once, with only the on-time row: $got")
  }

  test("late-heavy fixture drops the late batch where the plan says it must") {
    // sanity that the fixture exercises what it claims: the APPEND-mode
    // late-drop window (q86) must NOT count the four late rows (ts = t0,
    // arriving two slices after id 2 pushed the watermark ~5 days past
    // them), while the complete-mode window (q80 — complete mode keeps
    // all state regardless of the watermark) must count all seven.
    val q86 = SparkEntry.queries("q86_stream_multibatch_late_drop")(spark, lateDir)
    val kept = q86.agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    assert(kept == 3L,
      s"expected only the 3 on-time rows to survive the watermark, got $kept")
    val q80 = SparkEntry.queries("q80_stream_tumbling_window")(spark, lateDir)
    val all = q80.agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    assert(all == 7L, s"complete-mode path must keep all 7 rows, got $all")
  }
}
