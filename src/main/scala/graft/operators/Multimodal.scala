package graft.operators

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multimodal-column plumbing (SURVEY §2.C9): media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as a
  * partition-wise map over batches.
  *
  * The container has no image/audio codecs, so [[FakeDecoder.decode]] is a
  * clearly-marked deterministic stub — but the Spark-side plumbing is real
  * and tested: binary column construction, schema of the decoded struct,
  * partition-wise batched execution (`mapPartitions`, the reference's
  * `map_partitions`/`map_blocks` slot, core.py:165-171), and the
  * `array<float>` feature output that feeds [[Similarity]] / [[graft.ml]].
  *
  * Scale: decode is embarrassingly parallel per partition; batch size is
  * partition size (tune `spark.sql.files.maxPartitionBytes` so a batch of
  * decoded frames fits executor memory); no shuffle anywhere.
  */
object Multimodal {

  /** STUB decode: a real build links an image/audio codec here. Output is
    * a deterministic function of the payload's md5 digest — chosen so the
    * whole decode pipeline is bit-reproducible in ANSI SQL and the DuckDB
    * oracle can hash-check q91/q92 end-to-end (same portability trick as
    * the md5-derived shingle ids in [[Dedup]]). Every feature is a
    * byte/256 dyadic rational, so sums and averages are exact doubles in
    * both engines.
    */
  object FakeDecoder {
    final case class Decoded(
        width: Int, height: Int, nFrames: Int, features: Array[Float])

    def decode(payload: Array[Byte]): Decoded = {
      // ??? <- real codec goes here; deterministic md5-based fake below
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def b(i: Int): Int = md(i) & 0xff
      Decoded(
        width = 64 + ((b(0) * 256 + b(1)) % 193),
        height = 64 + ((b(2) * 256 + b(3)) % 129),
        nFrames = 1 + ((b(4) * 256 + b(5)) % 7),
        features = Array.tabulate(8)(i => b(6 + i) / 256.0f))
    }
  }

  /** SQL for byte `i` (0-based) of md5(text) — mirrors FakeDecoder. */
  private def mdByteSql(i: Int): String = {
    def nib(pos: Int) =
      s"(strpos('0123456789abcdef', substr(md5(text), $pos, 1)) - 1)"
    s"(16 * ${nib(2 * i + 1)} + ${nib(2 * i + 2)})"
  }

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  // ---------------------------------------------------------------- q90
  // Binary column + typed metadata, pure relational (oracle-checked):
  // payload bytes, length, first byte — the schema surface a media table
  // would expose.
  private val q90 = QueryDef(
    "q90_multimodal_binary_meta",
    (s, d) =>
      docs(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
          (octet_length(col("payload")) === col("n_chars")).as("len_matches"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
             octet_length(CAST(text AS BLOB)) = n_chars AS len_matches
      FROM documents
      ORDER BY doc_id"""))

  /** Decode pipeline shared by q91/q92: binary payloads → typed media
    * features via mapPartitions (batched, no per-row task overhead). The
    * `array<float>` feature column is kept here for downstream vector ops;
    * registered queries project SCALAR digests of it (f0, fsum) so the
    * harness's row-sorting compare never sees an unhashable array column.
    */
  private def decoded(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val payloads = docs(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val m = FakeDecoder.decode(bytes)
        // scalar digests computed partition-locally in array order —
        // deterministic regardless of partitioning
        val fsum = m.features.foldLeft(0.0)((a, f) => a + f.toDouble)
        (id, m.width, m.height, m.nFrames, m.features,
          m.features(0).toDouble, fsum)
      }
    }.toDF("doc_id", "width", "height", "n_frames", "features", "f0", "fsum")
  }

  // ---------------------------------------------------------------- q91
  // Partition-wise decode, scalar-digest projection — hash-checked: the
  // oracle recomputes the md5-derived decode byte-for-byte in SQL.
  // StreamingMultimodalSpec additionally pins schema and determinism.
  private val q91 = QueryDef(
    "q91_multimodal_decode_stub",
    (s, d) =>
      decoded(s, d)
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
          round(col("f0"), 6).as("f0"), round(col("fsum"), 6).as("fsum"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(64 + ((${mdByteSql(0)} * 256 + ${mdByteSql(1)}) % 193) AS BIGINT) AS width,
             CAST(64 + ((${mdByteSql(2)} * 256 + ${mdByteSql(3)}) % 129) AS BIGINT) AS height,
             CAST(1 + ((${mdByteSql(4)} * 256 + ${mdByteSql(5)}) % 7) AS BIGINT) AS n_frames,
             round(${mdByteSql(6)} / 256.0, 6) AS f0,
             round((${(6 to 13).map(mdByteSql).mkString(" + ")}) / 256.0, 6) AS fsum
      FROM documents
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q92
  // Decoded features → aggregate per synthetic shard: demonstrates the
  // decode → analyze pipeline (metadata stats over media batches), also
  // hash-checked via the SQL mirror of the decode.
  private val q92 = QueryDef(
    "q92_multimodal_feature_stats",
    (s, d) =>
      decoded(s, d)
        .withColumn("shard", col("doc_id") % 10)
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("width").cast("long")).as("total_width"),
          max(col("n_frames").cast("long")).as("max_frames"),
          round(avg(col("f0")), 6).as("avg_f0"))
        .orderBy(col("shard")),
    Some(s"""
      WITH dec AS (
        SELECT doc_id % 10 AS shard,
               64 + ((${mdByteSql(0)} * 256 + ${mdByteSql(1)}) % 193) AS width,
               1 + ((${mdByteSql(4)} * 256 + ${mdByteSql(5)}) % 7) AS n_frames,
               ${mdByteSql(6)} / 256.0 AS f0
        FROM documents)
      SELECT shard, count(*) AS n_media,
             CAST(sum(width) AS BIGINT) AS total_width,
             CAST(max(n_frames) AS BIGINT) AS max_frames,
             round(avg(f0), 6) AS avg_f0
      FROM dec GROUP BY shard ORDER BY shard"""))

  // ---------------------------------------------------------------- q95
  // Resize + frame sampling — the remaining two media ops of the
  // decode / feature-extract / resize / frame-sample family. Resize is
  // integer-exact (scale the longer edge to 224, `DIV` keeps aspect
  // ratio without float rounding); sampling takes every 2nd frame index
  // via an exploded `sequence`, so output size is ⌈n_frames/2⌉ per doc —
  // bounded, shuffle-free, embarrassingly parallel. The per-frame
  // feature indexes the decoded feature vector at the frame position,
  // which the oracle replays byte-for-byte from the md5 stub.
  private val q95 = QueryDef(
    "q95_multimodal_frame_sample",
    (s, d) =>
      decoded(s, d)
        .select(col("doc_id"), col("width"), col("height"),
          col("n_frames"), col("features"))
        .withColumn("out_w",
          expr("CAST(width * 224 AS BIGINT) DIV greatest(width, height)"))
        .withColumn("out_h",
          expr("CAST(height * 224 AS BIGINT) DIV greatest(width, height)"))
        .select(col("doc_id"), col("out_w"), col("out_h"),
          col("features"),
          explode(expr("sequence(0, n_frames - 1, 2)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("out_w"), col("out_h"),
          round(col("features")(col("frame_idx")).cast("double"), 6)
            .as("frame_feat"))
        .orderBy(col("doc_id"), col("frame_idx")),
    Some(s"""
      WITH dec AS (
        SELECT doc_id, md5(text) AS h,
               64 + ((${mdByteSql(0)} * 256 + ${mdByteSql(1)}) % 193) AS width,
               64 + ((${mdByteSql(2)} * 256 + ${mdByteSql(3)}) % 129) AS height,
               1 + ((${mdByteSql(4)} * 256 + ${mdByteSql(5)}) % 7) AS n_frames
        FROM documents),
      frames AS (
        SELECT doc_id, h, width, height,
               unnest(range(0, n_frames, 2)) AS frame_idx
        FROM dec)
      SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             CAST((width * 224) // greatest(width, height) AS BIGINT) AS out_w,
             CAST((height * 224) // greatest(width, height) AS BIGINT) AS out_h,
             round((16 * (strpos('0123456789abcdef',
                                 substr(h, 2 * (6 + frame_idx) + 1, 1)) - 1)
                      + (strpos('0123456789abcdef',
                                 substr(h, 2 * (6 + frame_idx) + 2, 1)) - 1))
                   / 256.0, 6) AS frame_feat
      FROM frames
      ORDER BY doc_id, frame_idx"""))

  // --------------------------------------------------------------- q118
  // Media near-dup: decode → 8-dim feature vector → brute-force cosine
  // top-5 of probe media against the media corpus — the visual-dedup /
  // reverse-image-search shape every multimodal pipeline needs, here
  // wired end-to-end through the decode stub so the WHOLE path (binary
  // payload → features → native FloatDot scoring → per-probe rank) is
  // hash-checked: the oracle recomputes the md5-derived features
  // byte-for-byte in SQL. Every feature is a dyadic rational (byte/256),
  // so dot products and norms are exact doubles in both engines.
  // Scale: the q50 design — probes broadcast, the media corpus never
  // shuffles, scoring is a per-partition codegen'd projection; swap in
  // [[graft.operators.Similarity.ivfTopK]] when the probe set grows.
  private val q118 = QueryDef(
    "q118_media_near_dup",
    (s, d) => {
      import graft.functions.VectorFunctions.{float_dot, float_norm}
      val feats = decoded(s, d).select(col("doc_id"), col("features"))
        .withColumn("nrm", float_norm(col("features")))
      val probes = feats.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("features").as("fa"),
          col("nrm").as("na"))
      val scored = feats
        .select(col("doc_id").as("cid"), col("features").as("fb"),
          col("nrm").as("nb"))
        .join(broadcast(probes), col("qid") =!= col("cid"))
        .withColumn("cos",
          Num.roundZ(float_dot(col("fa"), col("fb")) / (col("na") * col("nb")), 6))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("cid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
          col("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some {
      val featSql = (6 to 13).map(i => s"${mdByteSql(i)} / 256.0")
      val dot = featSql.zipWithIndex
        .map { case (f, i) => s"q.f$i * c.f$i" }.mkString(" + ")
      val nrm = featSql.indices.map(i => s"f$i * f$i").mkString(" + ")
      val cols = featSql.zipWithIndex
        .map { case (f, i) => s"$f AS f$i" }.mkString(", ")
      s"""
      WITH f AS (SELECT doc_id, $cols FROM documents),
      n AS (SELECT doc_id, sqrt($nrm) AS nrm FROM f),
      scored AS (
        SELECT q.doc_id AS qid, c.doc_id AS cid,
               (CAST(round((($dot) / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM f q
        JOIN f c ON q.doc_id < 3 AND q.doc_id <> c.doc_id
        JOIN n nq ON nq.doc_id = q.doc_id
        JOIN n nc ON nc.doc_id = c.doc_id)
      SELECT qid, CAST(rk AS BIGINT) AS rk, cid, cos FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        FROM scored) t
      WHERE rk <= 5
      ORDER BY qid, rk"""
    })

  // --------------------------------------------------------------- q340
  // Audio frame-energy windowing ([EXT], the audio sibling of q95's
  // video frame sampling): treat each document as an opaque audio clip,
  // window it into fixed-stride frames (1 frame per 16 chars — the
  // sample-rate:window-size ratio of a real pipeline), compute per-frame
  // amplitude → energy, and report the per-language silence ratio and
  // mean frame energy — the VAD-style (voice-activity) profiling pass an
  // audio-corpus pipeline runs before transcription. The PCM stand-in is
  // the house md5 trick (FakeDecoder's): amp(doc, f) = signed 56-bit
  // md5('pcm:'||doc||':'||f) % 20001 − 10000 — a real build swaps ONE
  // projection for a codec read; windowing, fan-out, and aggregation
  // shapes are exactly what the codec version would run.
  //
  // Exactness: amplitudes/energies are exact BIGINTs; silence ratio and
  // mean energy are single correctly-rounded divisions of exact sums
  // (frame counts ≥ 1 per doc — sequence(0, n) is never empty — and per
  // lang, so no zero denominators exist). Scale: per-row bounded
  // generator (frames ∝ doc length), one map-side-combinable aggregate;
  // no shuffle wider than |langs|.
  private val q340 = QueryDef(
    "q340_audio_energy_windows",
    (s, d) => {
      val frames = docs(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          explode(expr("sequence(0, n_chars DIV 16)")).as("f"))
        .withColumn("amp",
          conv(substring(md5(concat(lit("pcm:"),
            col("doc_id").cast("string"), lit(":"),
            col("f").cast("string")).cast("binary")), 1, 14), 16, 10)
            .cast("long") % 20001L - 10000L)
      frames.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_frames"),
          sum(when(abs(col("amp")) < 1000L, 1L).otherwise(0L))
            .as("n_silent"),
          sum(col("amp") * col("amp")).as("energy"))
        .select(col("lang"), col("n_docs"), col("n_frames"),
          col("n_silent"),
          Num.roundZ(col("n_silent").cast("double") /
            col("n_frames").cast("double"), 6).as("silence_ratio"),
          Num.roundZ(col("energy").cast("double") /
            col("n_frames").cast("double"), 4).as("mean_energy"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH frames AS (
        SELECT doc_id, lang,
               ((('0x' || substr(md5('pcm:' || CAST(doc_id AS VARCHAR)
                   || ':' || CAST(f AS VARCHAR)), 1, 14))::BIGINT)
                 % 20001) - 10000 AS amp
        FROM (
          SELECT doc_id, lang,
                 unnest(range(0, (n_chars // 16) + 1)) AS f
          FROM documents) t)
      SELECT lang,
             count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_frames,
             CAST(sum(CASE WHEN abs(amp) < 1000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_silent,
             (CAST(round((CAST(sum(CASE WHEN abs(amp) < 1000 THEN 1
                 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1e6)
               AS BIGINT) / 1e6) AS silence_ratio,
             (CAST(round((CAST(sum(amp * amp) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) * 1e4) AS BIGINT) / 1e4)
               AS mean_energy
      FROM frames
      GROUP BY lang
      ORDER BY lang"""))

  // --------------------------------------------------------------- q360
  // Scene-cut detection ([EXT], the video sibling of q340's audio VAD):
  // window each clip into fixed-stride frames, compute a per-frame
  // visual feature, and declare a CUT where the consecutive-frame
  // feature distance exceeds a threshold; shots are the islands between
  // cuts. Reports per clip: frame/cut/shot counts, mean and longest shot
  // length — the shot-boundary pass a video-corpus pipeline runs before
  // per-shot sampling (q95 then samples WITHIN shots instead of
  // uniformly). Feature stand-in is the house md5 trick (one projection
  // swaps for a codec read; the windowing/lag/island shapes are exactly
  // the codec version's).
  //
  // Exactness: features/deltas exact BIGINTs; the one division
  // (mean shot length) is guarded by construction — n_shots = cuts + 1
  // ≥ 1. Scale: per-row bounded frame generator, one per-clip window
  // chain (lag → cut flag → running shot id), two grid aggregates; no
  // shuffle wider than the clip key.
  private val q360 = QueryDef(
    "q360_video_scene_cuts",
    (s, d) => {
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      val wCum = Window.partitionBy(col("doc_id")).orderBy(col("f"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val frames = docs(s, d)
        .select(col("doc_id"), col("n_chars"),
          explode(expr("sequence(0, n_chars DIV 16)")).as("f"))
        .withColumn("feat",
          conv(substring(md5(concat(lit("vis:"),
            col("doc_id").cast("string"), lit(":"),
            col("f").cast("string")).cast("binary")), 1, 14), 16, 10)
            .cast("long") % 1000L)
        .withColumn("cut",
          when(abs(col("feat") - lag(col("feat"), 1).over(w)) > 600L, 1L)
            .otherwise(0L))
        .withColumn("shot", sum(col("cut")).over(wCum))
      val shots = frames.groupBy(col("doc_id"), col("shot"))
        .agg(count(lit(1)).as("slen"))
      shots.groupBy(col("doc_id"))
        .agg(sum(col("slen")).as("n_frames"),
          (count(lit(1)) - 1L).as("n_cuts"),
          count(lit(1)).as("n_shots"),
          max(col("slen")).as("longest_shot"))
        .select(col("doc_id"), col("n_frames"), col("n_cuts"),
          col("n_shots"), col("longest_shot"),
          Num.roundZ(col("n_frames").cast("double")
            / col("n_shots").cast("double"), 4).as("mean_shot_len"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH frames AS (
        SELECT doc_id, f,
               (('0x' || substr(md5('vis:' || CAST(doc_id AS VARCHAR)
                   || ':' || CAST(f AS VARCHAR)), 1, 14))::BIGINT)
                 % 1000 AS feat
        FROM (SELECT doc_id, unnest(range(0, (n_chars // 16) + 1)) AS f
              FROM documents) t),
      cuts AS (
        SELECT doc_id, f,
               CASE WHEN abs(feat - lag(feat) OVER (PARTITION BY doc_id
                 ORDER BY f)) > 600 THEN 1 ELSE 0 END AS cut
        FROM frames),
      sh AS (
        SELECT doc_id, f,
               sum(cut) OVER (PARTITION BY doc_id ORDER BY f
                 ROWS UNBOUNDED PRECEDING) AS shot
        FROM cuts),
      sl AS (SELECT doc_id, shot, CAST(count(*) AS BIGINT) AS slen
             FROM sh GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(slen) AS BIGINT) AS n_frames,
             CAST(count(*) - 1 AS BIGINT) AS n_cuts,
             CAST(count(*) AS BIGINT) AS n_shots,
             CAST(max(slen) AS BIGINT) AS longest_shot,
             (CAST(round((CAST(sum(slen) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) * 1e4) AS BIGINT) / 1e4)
               AS mean_shot_len
      FROM sl GROUP BY doc_id
      ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(q90, q91, q92, q95, q118, q340, q360)
}
