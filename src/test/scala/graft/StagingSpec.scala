package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stale-staging defense (r8 verdict item 1, swept to every
  * reusable staging): the `_READY`-marked staging dirs that the streaming
  * queries replay across JVM runs are keyed by a CONTENT fingerprint of
  * the live source table, so a table regenerated IN PLACE (same path, new
  * data — the driver has done this to the testdata mid-round) forces a
  * re-stage instead of silently replaying the old corpus. The per-JVM
  * memo hooks simulate the "fresh JVM, same tmpdir" boundary where the
  * bug would have lived.
  */
class StagingSpec extends AnyFunSuite {
  import TestSpark._

  /** A private dataset-dir copy of the sf0.001 tables a test can mutate.
    * Copies go through Tables.t so a TIMESTAMP(NANOS) events layout is
    * normalized to a rereadable µs column before landing in the copy. */
  private def scratchDataset(tag: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_staging_spec_$tag").toString
    for (t <- Seq("documents", "events", "embeddings"))
      Tables.t(spark, sf, t)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    dir
  }

  /** Regenerate a table IN PLACE keeping rows matching `keep` — via a
    * driver-side materialized copy, because Spark cannot overwrite a
    * path it is lazily reading (tiny at sf0.001). */
  private def regenerateInPlace(path: String,
      keep: org.apache.spark.sql.Column): Unit = {
    import scala.jdk.CollectionConverters._
    val src = spark.read.parquet(path)
    val rows = src.filter(keep).collect().toSeq.asJava
    val schema = src.schema
    spark.createDataFrame(rows, schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  private def parquetCount(path: String): Long =
    spark.read.parquet(path).count()

  test("q210 doc feed re-stages when documents is regenerated in place") {
    val d = scratchDataset("docs")
    graft.operators.Dedup.resetFeedMemoForTest()
    val d1 = graft.operators.Dedup.stagedDocFeed(spark, d)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(d1, "_READY")), "first staging must be READY")
    val staged1 = parquetCount(d1)
    val liveFifth = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    assert(staged1 === liveFifth, "staged feed must equal the live fifth")

    // regenerate IN PLACE: drop half the corpus (fingerprint: count
    // moves — and usually max doc_id too)
    regenerateInPlace(s"$d/documents.parquet", col("doc_id") % 2 === 0)

    graft.operators.Dedup.resetFeedMemoForTest() // "fresh JVM"
    val d2 = graft.operators.Dedup.stagedDocFeed(spark, d)
    assert(d2 !== d1, "regenerated table must key a NEW staging dir")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)),
      "superseded staging must be removed")
    val staged2 = parquetCount(d2)
    val liveFifth2 = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    assert(staged2 === liveFifth2,
      "re-staged feed must reflect the regenerated table, not the old one")
    assert(staged2 < staged1, "the regeneration strictly shrank the fifth")

    // and an UNCHANGED table reuses the same staging (no rebuild churn)
    graft.operators.Dedup.resetFeedMemoForTest()
    assert(graft.operators.Dedup.stagedDocFeed(spark, d) === d2,
      "same content must resolve to the same staging dir")
  }

  test("event stagings re-stage when events is regenerated in place") {
    val d = scratchDataset("events")
    graft.streaming.EventStreams.resetStagingMemoForTest()
    val e1 = graft.streaming.EventStreams.slicedDir(spark, d)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(e1, "_READY")), "first staging must be READY")
    val live1 = parquetCount(s"$d/events.parquet")
    assert(parquetCount(e1) === live1 + 1, // + flush sentinel
      "staged slice files must carry the live events plus the sentinel")

    regenerateInPlace(s"$d/events.parquet", col("event_id") % 2 === 0)

    graft.streaming.EventStreams.resetStagingMemoForTest() // "fresh JVM"
    val e2 = graft.streaming.EventStreams.slicedDir(spark, d)
    assert(e2 !== e1, "regenerated table must key a NEW staging dir")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(e1)),
      "superseded staging must be removed")
    val live2 = parquetCount(s"$d/events.parquet")
    assert(parquetCount(e2) === live2 + 1,
      "re-staged slices must reflect the regenerated table")

    graft.streaming.EventStreams.resetStagingMemoForTest()
    assert(graft.streaming.EventStreams.slicedDir(spark, d) === e2,
      "same content must resolve to the same staging dir")
  }

  test("q185 ml-score staging re-stages when embeddings is regenerated " +
    "in place (oracle-gated since r11)") {
    val d = scratchDataset("emb")
    graft.operators.MLQueries.resetStagingMemoForTest()
    val m1 = graft.operators.MLQueries.stagedMlScore(spark, d)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(m1, "_READY")), "first staging must be READY")
    val live1 = parquetCount(s"$d/embeddings.parquet")
    assert(parquetCount(m1) === live1,
      "staged slices must carry exactly the live feature rows")

    regenerateInPlace(s"$d/embeddings.parquet", col("vec_id") % 2 === 0)

    graft.operators.MLQueries.resetStagingMemoForTest() // "fresh JVM"
    val m2 = graft.operators.MLQueries.stagedMlScore(spark, d)
    assert(m2 !== m1, "regenerated table must key a NEW staging dir")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(m1)),
      "superseded staging must be removed")
    val live2 = parquetCount(s"$d/embeddings.parquet")
    assert(parquetCount(m2) === live2,
      "re-staged slices must reflect the regenerated table — a stale " +
        "replay would score old rows against a fresh-fit oracle")

    graft.operators.MLQueries.resetStagingMemoForTest()
    assert(graft.operators.MLQueries.stagedMlScore(spark, d) === m2,
      "same content must resolve to the same staging dir")
  }
}
