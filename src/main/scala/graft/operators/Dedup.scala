package graft.operators

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{float_dot, float_norm}

/** Deduplication operators over `documents` (SURVEY §2.C6/C7): exact dedup,
  * word-3-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design:
  *  - Candidate generation NEVER does an all-pairs join: exact dedup groups
  *    by content key; Jaccard/MinHash/SimHash meet only inside an LSH band
  *    bucket; embedding near-dup buckets on random-hyperplane SimHash bands.
  *    All-pairs at 100 TB is impossible; bucket joins shuffle each doc to
  *    O(#bands) reducers and the pair cardinality follows true duplicates.
  *  - Hashes are affine functions of a PORTABLE 56-bit content hash of the
  *    shingle (first 14 hex chars of md5 — computable bit-identically in
  *    Spark via `conv(substr(md5(x),1,14),16,10)` and in DuckDB via
  *    `('0x' || substr(md5(x),1,14))::BIGINT`). This is the production
  *    shape: a pure per-row projection — no dictionary join, no vocabulary
  *    shuffle, and no single-partition global-window id assignment. The
  *    56-bit id is reduced mod P before the affine step so products stay
  *    within 63 bits in both engines.
  *
  * Reference scope: the reference has no dedup; these are the [EXT]
  * operators mandated by BASELINE.json:6 (see SURVEY §2.C).
  */
object Dedup {
  private val P = 2147483647L // 2^31 - 1, Mersenne prime
  private val K = 16 // minhash signature length
  private val Bands = 8 // bands of 2 rows each
  private val SimBits = 60 // simhash width (4 bands x 15 bits, fits signed long)

  /** Affine hash constants, embedded identically in Spark exprs and SQL. */
  private def aK(k: Int): Long = (104729L * (k + 1) + 7L) % P
  private def bK(k: Int): Long = (15485863L * (k + 1) + 11L) % P

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")
  private def emb(s: SparkSession, d: String) = Tables.t(s, d, "embeddings")

  /** (doc_id, lang, shingle): DISTINCT word-3-gram shingles per document.
    *
    * Built by exploding integer POSITIONS (`sequence`) and concatenating in
    * a post-Generate projection — every expression codegen-able. The
    * obvious alternative, `explode(transform(toks, i -> concat(...)))`,
    * puts a lambda (CodegenFallback) under Generate and runs ~18× slower
    * (measured 6.3s → 0.34s on sf0.1): keep generators lambda-free.
    */
  /** Word-3-shingle set of any (doc_id, lang, text) frame. */
  private def shinglesOf(d0: DataFrame): DataFrame =
    rawShinglesOf(d0).distinct()

  /** Pre-distinct shingle stream — for pipelines that reduce shingles to
    * int64 ids BEFORE the first exchange (q31): mapping to [[md5Id]] on
    * the map side means the dedup exchange and every downstream shuffle
    * carry 8-byte ids instead of ~30-byte strings. */
  private def rawShinglesOf(d0: DataFrame): DataFrame =
    // r13: documents.parquet is ONE split at bench SFs (0.57 MB, one row
    // group — scan-split tuning cannot help), and the ~60×-per-doc
    // position explode + per-occurrence hashing fuse with the scan:
    // StageProf read q31's whole map side as a single 1.0 s task while
    // 31 cores idled. Scale.spreadForFanout spreads every shingle
    // pipeline (q31/q32/q33/q109/q213/q258...) ONLY while the scan is
    // under-split — at production scale the scan arrives pre-split and
    // the corpus text is never shuffled (an unconditional q158-style
    // repartition here would move the whole corpus once for nothing).
    graft.Scale.spreadForFanout(d0, col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("toks"),
        explode(expr("sequence(0, size(toks) - 3)")).as("i"))
      .select(col("doc_id"), col("lang"),
        concat(col("toks")(col("i")), lit("|"),
               col("toks")(col("i") + 1), lit("|"),
               col("toks")(col("i") + 2)).as("shingle"))

  private def shingles(s: SparkSession, d: String): DataFrame =
    shinglesOf(docs(s, d))

  /** SQL mirror of [[shingles]] (DuckDB list lambda, 1-based subscripts). */
  private val shinglesSql = """
    tok AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, lang, unnest(
        CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || '|' || toks[i+1] || '|' || toks[i+2])
             ELSE [] END) AS shingle
      FROM tok)"""

  /** Portable content id: 56-bit integer from md5's first 14 hex chars,
    * reduced mod P (< 2³¹, so `id * a` stays within 63 bits). A pure
    * projection — replaces the r1 dictionary join whose global row_number
    * forced the whole vocabulary through one task. Collisions (~birthday
    * at 2³¹) merely merge two shingles, identically in both engines.
    */
  private def md5Id(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (conv(substring(md5(c.cast("binary")), 1, 14), 16, 10).cast("long") % P)

  private def md5IdSql(e: String): String =
    s"((('0x' || substr(md5($e), 1, 14))::BIGINT) % $P)"

  /** Hot-bucket cap for the LSH families (q32/q33/q34): a bucket with
    * more than this many docs is DROPPED before pair generation. Without
    * it one adversarial corpus (every doc sharing a boilerplate band —
    * think a common header, an empty-ish template) re-creates the O(N²)
    * pair explosion the banding exists to prevent: a single bucket of
    * 10⁶ docs is 5·10¹¹ pairs. Oversized buckets are near-certain
    * mass-duplicates whose members still meet in their OTHER, more
    * selective bands; the cap is mirrored bit-identically in the oracles
    * so both engines skip exactly the same buckets. Headroom is ~6× the
    * largest observed real bucket (sf0.1 maxima: q32=10, q33=5, q34=5).
    * q31 is intentionally uncapped: its guard is prefix filtering, which
    * is spec-pinned LOSSLESS — a cap there would break that property.
    */
  private val MaxBucket = 64

  /** THE near-pair threshold expression, used identically at every Spark
    * verify site (q31, q32/minhashPairs, q100, q210) and mirrored raw in
    * every oracle: the UNROUNDED Jaccard of the per-doc shingle-id sets,
    * `ni / (|sa| + |sb| − ni)`, compared `>= 0.5` before any display
    * rounding. One expression everywhere means "exact Jaccard ≥ 0.5"
    * holds by construction — a boundary pair with true jac in
    * [0.4999995, 0.5) (which `round(·,6)` would admit) is classed 'below'
    * by all formulations, so q100's "exactly the mixed-membership subset
    * of q32's pairs" claim cannot be broken by rounding (r7 verdict §2).
    * Requires columns `ni`, `sa`, `sb` in scope.
    */
  private def jacRaw: Column =
    col("ni").cast("double") /
      (size(col("sa")) + size(col("sb")) - col("ni")).cast("double")

  /** All unordered id pairs (da < db) from a bucket's sorted `ids` array,
    * via two lambda-free positional explodes (see [[shingles]] on why
    * generators must not contain lambdas). Input must be pre-filtered to
    * `size(ids) > 1`; buckets larger than `maxBucket` are dropped (see
    * [[MaxBucket]]).
    */
  private def bucketPairs(buckets: DataFrame,
      maxBucket: Int = Int.MaxValue): DataFrame =
    buckets
      .filter(size(col("ids")) <= maxBucket)
      .select(col("ids"), explode(expr("sequence(0, size(ids) - 2)")).as("i"))
      .select(col("ids"), col("i"),
        explode(expr("sequence(i + 1, size(ids) - 1)")).as("j"))
      .select(col("ids")(col("i")).as("da"), col("ids")(col("j")).as("db"))
      .distinct()

  // ---------------------------------------------------------------- q30
  // Exact dedup, HASH-FIRST (the 100 TB shape): the shuffle key is the
  // 128-bit md5 of the text plus n_chars (a free second discriminator
  // already in the payload), and the text itself is projected away BEFORE
  // the exchange — the shuffle moves ~50-byte rows, not the corpus text
  // (the r2 formulation windowed on the raw `text` column, so at 100 TB
  // the whole corpus became shuffle-key bytes). Two different texts
  // collide only with identical md5 AND identical length — P ≈ 2⁻¹²⁸·C(N,2),
  // below hardware error rates at any corpus size; this is the standard
  // production treatment (content-hash identity), with the full-text
  // in-group compare as the documented escalation if a domain ever
  // demands it. Representative selection is min(struct(doc_id, lang)):
  // partial-aggregable map-side (duplicate texts collapse before the
  // shuffle — a window over text could never partial-agg), deterministic,
  // and identical to the oracle's row_number-by-doc_id choice.
  private val q30 = QueryDef(
    "q30_dedup_exact",
    (s, d) => {
      // representative = argmin(doc_id), carrying lang. min(struct(...))
      // would plan SortAggregate (struct buffers aren't hash-able) — a
      // per-task sort of the whole corpus before the partial agg, the
      // q122 trap. Instead pack (doc_id, lang) into ONE int64
      // (doc_id << 10 | 2-letter-code; doc_id is unique so the packed
      // min IS the argmin) and the aggregate stays a pure HashAggregate,
      // zero sorts. Contract: 2-letter lowercase lang codes and
      // doc_id < 2^53 (wider codes → dictionary-encode the lang first).
      val keyed = docs(s, d).select(
        md5(col("text").cast("binary")).as("h"),
        col("n_chars"),
        (col("doc_id") * 1024L +
          (ascii(substring(col("lang"), 1, 1)) - 97) * 26L +
          (ascii(substring(col("lang"), 2, 1)) - 97L)).as("packed"))
      val reps = keyed
        .groupBy(col("h"), col("n_chars"))
        .agg(min(col("packed")).as("p"))
        .select(expr("p DIV 1024").as("doc_id"),
          concat(char(lit(97) + expr("(p % 1024) DIV 26")),
            char(lit(97) + expr("(p % 1024) % 26"))).as("lang"),
          col("n_chars"))
      reps.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("chars_kept"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS chars_kept,
             min(doc_id) AS first_doc
      FROM (
        SELECT lang, n_chars, doc_id,
               row_number() OVER (PARTITION BY md5(text), n_chars
                                  ORDER BY doc_id) AS rn
        FROM documents) t
      WHERE rn = 1
      GROUP BY lang
      ORDER BY lang"""))

  // ---------------------------------------------------------------- q31
  // N-gram Jaccard near-dup: candidate pairs meet via a shared shingle
  // inside the same lang block (inverted-index join), never all-pairs.
  private val q31 = QueryDef(
    "q31_dedup_ngram_jaccard",
    (s, d) => {
      // NOT checkpointed, unlike minhashPairs' signature table: `sh` feeds
      // three branches, but they share the distinct's shuffle write via
      // exchange reuse and each needs its own re-aggregation regardless
      // (different grouping keys), so there is no repeated expensive
      // final-agg to pin. Measured (Profile, sf0.1): checkpointing sh+sets
      // here costs 8.7→16.3 s cold (materializing the corpus-sized
      // exploded shingle table) and saves nothing warm — the q32 fix does
      // not transfer because q32's branches repeat ONE expensive
      // aggregation where q31's each do different cheap ones.
      // shingles reduce to int64 ids ON THE MAP SIDE, before the first
      // exchange: every shuffle in this pipeline (dedup distinct, set
      // agg, frequency count, prefix join, inverted index) then carries
      // 8-byte ids instead of ~30-byte strings — ShuffleProf measured
      // the string form at 22.4 MB shuffled per 1.2 MB read (18.8×); ids
      // cut the exchanged volume ~3×. md5Id collisions merge shingles
      // IDENTICALLY in both engines because the oracle maps through the
      // same md5-derived id before its own distinct.
      val sh = rawShinglesOf(docs(s, d))
        .select(col("doc_id"), col("lang"), md5Id(col("shingle")).as("sid"))
        .distinct()
      // per-doc shingle set (one aggregation; reused for the verify side)
      val sets = sh.groupBy(col("doc_id"), col("lang"))
        .agg(collect_set(col("sid")).as("shs"))
      // PREFIX FILTERING (Chaudhuri et al.): for Jaccard ≥ t a pair must
      // share a shingle within each doc's prefix of size n−⌈t·n⌉+1 when
      // shingles are ordered by ascending global frequency. Indexing only
      // prefixes keeps inverted-index buckets rare-shingle-sized — the
      // hot-bucket pair explosion (quadratic in common-shingle frequency)
      // disappears, and the filter is LOSSLESS for the 0.5 threshold, so
      // the oracle's unfiltered formulation returns identical rows.
      val freq = sh.groupBy(col("sid")).agg(count(lit(1)).as("gf"))
      // per-doc prefix via array_sort + slice rather than window
      // row_number: one aggregation and ~50-element in-memory sorts per
      // doc instead of a partition-wide sort pass — same rows, ~3× less
      // single-shot cost, and no WindowExec buffering at scale
      val prefix = sh.join(freq, "sid")
        .groupBy(col("doc_id"), col("lang"))
        .agg(array_sort(collect_list(struct(col("gf"), col("sid")))).as("a"))
        .select(col("doc_id"), col("lang"),
          slice(col("a"), lit(1),
            (size(col("a")) - ceil(size(col("a")) * 0.5) + 1).cast("int")).as("a"))
        .select(col("doc_id"), col("lang"),
          explode(expr("sequence(0, size(a) - 1)")).as("i"), col("a"))
        .select(col("doc_id"), col("lang"),
          col("a")(col("i")).getField("sid").as("sid"))
      // inverted index over prefixes: docs sharing a rare (lang, shingle
      // id) become candidates; pairs generated in-bucket, no row self-join
      val cand = bucketPairs(prefix
        .groupBy(col("lang"), col("sid"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1))
      // verify joins UNHINTED: `sets` is corpus-sized (never broadcast it);
      // AQE builds on whichever side is small — usually the candidate pairs,
      // whose cardinality tracks true duplicates, not corpus size.
      // r13: but AQE also COALESCED each verify join to one partition
      // (the candidate table is ~13 MB of array payload) and the fused
      // array_intersect ran single-task (StageProf: 1.15 s + 1.11 s on
      // one core) — the q158 blindness, per-pair set-intersection work
      // AQE cannot see in the bytes. Pinned counts keep the verify
      // spread; the pinned exchanges carry candidates + one side's sets,
      // never the corpus.
      val np = s.sparkContext.defaultParallelism
      val sa = sets.select(col("doc_id").as("da"), col("shs").as("sa"))
      val sb = sets.select(col("doc_id").as("db"), col("shs").as("sb"))
      cand.repartition(np, col("da")).join(sa, "da")
        .repartition(np, col("db")).join(sb, "db")
        .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        // filter on the RAW ratio — the house near-pair threshold
        // (see [[jacRaw]]): every Spark site and every oracle uses the
        // unrounded expression, so "exact Jaccard ≥ 0.5" holds literally
        // and no [0.4999995, 0.5) boundary pair is classed differently
        // by two formulations. Round only for display.
        .withColumn("jacRaw", jacRaw)
        .filter(col("jacRaw") >= 0.5)
        .select(col("da"), col("db"), round(col("jacRaw"), 6).as("jac"))
        .orderBy(col("da"), col("db"))
    },
    Some(s"""
      WITH $shinglesSql,
      shid AS (
        SELECT DISTINCT doc_id, lang, ${md5IdSql("shingle")} AS shingle
        FROM sh),
      cnt AS (SELECT doc_id, count(*) AS n FROM shid GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        FROM shid a JOIN shid b
          ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT da, db,
             round(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE), 6) AS jac
      FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.5
      ORDER BY da, db"""))

  // ---------------------------------------------------------------- q32
  // MinHash + LSH: K=16 affine min-hashes over shingle ids, 8 bands × 2
  // rows; docs sharing any band bucket become candidates; candidates are
  // verified with exact Jaccard. The oracle replicates the banding, so
  // both engines miss exactly the same below-threshold pairs.
  /** MinHash+LSH verified near-dup pairs (da < db, exact Jaccard ≥ 0.5) —
    * the shared machinery of q32 and q35's duplicate-cluster assignment.
    */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    // map-side id reduction (the q31/q33 lesson): the shingle-dedup
    // exchange — hidden from ShuffleProf behind the localCheckpoint but
    // paid on every cold run — carries (doc_id, sid) int64 pairs instead
    // of strings. The oracle's ids CTE already distincts over the
    // md5-derived id, so this matches it even more directly.
    val sh = rawShinglesOf(docs(s, d))
      .select(col("doc_id"), md5Id(col("shingle")).as("sid"))
      .distinct()
    // one aggregation produces the 16 min-hashes AND the shingle-id set
    // per doc (the set feeds the exact-Jaccard verify without another
    // pass over the corpus)
    val sigCols = (0 until K).map(k =>
      min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k")) :+
      collect_set(col("sid")).as("sids")
    // localCheckpoint: `sig` feeds THREE plan branches (band buckets, and
    // both sides of the verify join). Exchange reuse only shares the
    // shuffle WRITE below the aggregation — the 16-minhash + collect_set
    // final aggregation would still run once per branch (measured: ~2.2×
    // the single-agg cost at sf0.1, Q32Prof). Pinning the signature table
    // (per-doc: 16 longs + the shingle-id set, a few % of corpus bytes)
    // runs the shingle scan + aggregation exactly once; at 100 TB this is
    // the standard production trade — persist the signatures, never
    // re-derive them from text. Blocks are freed by the ContextCleaner
    // when the frame exits, as in [[connectedComponents]].
    val sig = sh
      .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .localCheckpoint()
    // band buckets via groupBy + collect_set: ONE shuffle keyed by
    // (band, value); pairs generated in-bucket — no self-join; hot
    // buckets dropped at MaxBucket (mirrored in the oracle's bsz CTE).
    val bandExprs = (0 until Bands).map(j =>
      s"struct(${j}L as band, h${2 * j} * 2147483648L + h${2 * j + 1} as bv)")
    val cand = bucketPairs(sig
      .select(col("doc_id"), explode(array(bandExprs.map(expr): _*)).as("b"))
      .groupBy(col("b.band"), col("b.bv"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1), MaxBucket)
    // exact-Jaccard verify: two broadcast joins against the per-doc
    // shingle-id sets, intersection computed with array_intersect.
    // unhinted on purpose — `sig` is corpus-sized (see q31 note)
    val sa = sig.select(col("doc_id").as("da"), col("sids").as("sa"))
    val sb = sig.select(col("doc_id").as("db"), col("sids").as("sb"))
    cand.join(sa, "da").join(sb, "db")
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jacRaw", jacRaw) // the one house threshold expression
      .filter(col("jacRaw") >= 0.5)
      .select(col("da"), col("db"), round(col("jacRaw"), 6).as("jac"))
  }

  private val q32 = QueryDef(
    "q32_dedup_minhash_lsh",
    (s, d) => minhashPairs(s, d).orderBy(col("da"), col("db")),
    Some(s"""
      WITH $minhashCtes
      SELECT da, db, jac FROM mh_pairs
      ORDER BY da, db"""))

  /** Oracle CTE chain mirroring [[minhashPairs]], ending in
    * `mh_pairs(da, db, jac)` — shared by the q32 and q35 oracles.
    */
  private lazy val minhashCtes: String = {
      val minExprs = (0 until K)
        .map(k => s"min((sid * ${aK(k)} + ${bK(k)}) % $P) AS h$k")
        .mkString(",\n               ")
      val bandSelects = (0 until Bands)
        .map(j =>
          s"SELECT doc_id, $j AS band, h${2 * j} * 2147483648 + h${2 * j + 1} AS bv FROM sig")
        .mkString("\n        UNION ALL ")
      s"""$shinglesSql,
      -- DISTINCT sid: the verify below must live in the sid domain, like
      -- Spark's collect_set(sid) — an md5-id collision merges two
      -- shingles in BOTH engines (counting raw shingles instead would
      -- diverge on the first collision)
      ids AS (SELECT DISTINCT doc_id, ${md5IdSql("shingle")} AS sid FROM sh),
      sig AS (SELECT doc_id,
               $minExprs
              FROM ids GROUP BY doc_id),
      bands AS (
        $bandSelects),
      -- hot-bucket cap, mirroring Spark's MaxBucket drop
      bsz AS (SELECT band, bv FROM bands GROUP BY band, bv
              HAVING count(*) <= $MaxBucket),
      cand AS (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
        JOIN bsz s ON s.band = x.band AND s.bv = x.bv),
      cnt AS (SELECT doc_id, count(*) AS n FROM ids GROUP BY 1),
      inter AS (
        SELECT da, db, count(*) AS ni
        FROM cand
        JOIN ids a ON a.doc_id = da
        JOIN ids b ON b.doc_id = db AND a.sid = b.sid
        GROUP BY 1, 2),
      mh_pairs AS (
        SELECT da, db,
               round(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE), 6) AS jac
        FROM inter
        JOIN cnt ca ON da = ca.doc_id
        JOIN cnt cb ON db = cb.doc_id
        WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.5)"""
  }

  // ---------------------------------------------------------------- q33
  // SimHash: 60-bit signature from per-shingle pseudo-random bits; dup
  // candidates meet in 15-bit band buckets (pigeonhole: Hamming ≤ 3 ⇒ at
  // least one of 4 bands identical); pairs kept at Hamming ≤ 3. Band
  // width matters at scale: a 4-bit band has only 16 bucket values, so
  // every band bucket holds ~N/16 docs and pair generation goes quadratic
  // in corpus size; 15-bit bands (32k values) keep buckets true-dup-sized.
  private val q33 = QueryDef(
    "q33_dedup_simhash",
    (s, d) => {
      // map-side id reduction (the q31 lesson, measured 18.7 → ~6 MB
      // shuffled): the shingle-dedup exchange carries (doc_id, sid)
      // int64 pairs, never strings; the oracle's ids CTE applies the
      // same DISTINCT over md5-derived ids so collisions merge
      // identically in both engines
      val sh = rawShinglesOf(docs(s, d))
        .select(col("doc_id"), md5Id(col("shingle")).as("sid"))
        .distinct()
      val bitSums = (0 until SimBits).map(j =>
        sum(when((col("sid") * aK(j) + bK(j)) % P % 2 === 1, lit(1L))
          .otherwise(lit(-1L))).as(s"s$j"))
      val hashExpr = (0 until SimBits)
        .map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      val sig = sh
        .groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), expr(hashExpr).as("simhash"))
      // 15-bit band buckets → in-bucket pair generation (one shuffle),
      // then joins back to pick up each side's signature.
      val nibExprs = (0 until 4).map(b =>
        s"struct(${b}L as band, (simhash div ${1L << (15 * b)}) % 32768 as nib)")
      val cand = bucketPairs(sig
        .select(col("doc_id"), explode(array(nibExprs.map(expr): _*)).as("b"))
        .groupBy(col("b.band"), col("b.nib"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1), MaxBucket)
      // unhinted on purpose — `sig` is corpus-sized (see q31 note)
      cand
        .join(sig.select(col("doc_id").as("da"), col("simhash").as("ha")), "da")
        .join(sig.select(col("doc_id").as("db"), col("simhash").as("hb")), "db")
        .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("da"), col("db"), col("hamming"))
        .orderBy(col("da"), col("db"))
    },
    Some {
      val bitSums = (0 until SimBits)
        .map(j =>
          s"sum(CASE WHEN (sid * ${aK(j)} + ${bK(j)}) % $P % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(",\n               ")
      val hashExpr = (0 until SimBits)
        .map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      val nibbleSelects = (0 until 4)
        .map(b =>
          s"SELECT doc_id, simhash, $b AS band, (simhash // ${1L << (15 * b)}) % 32768 AS nib FROM sig")
        .mkString("\n        UNION ALL ")
      s"""
      WITH $shinglesSql,
      ids AS (SELECT DISTINCT doc_id, ${md5IdSql("shingle")} AS sid FROM sh),
      sums AS (SELECT doc_id,
               $bitSums
               FROM ids GROUP BY doc_id),
      sig AS (SELECT doc_id, $hashExpr AS simhash FROM sums),
      nib AS (
        $nibbleSelects),
      -- hot-bucket cap, mirroring Spark's MaxBucket drop
      bsz AS (SELECT band, nib FROM nib GROUP BY band, nib
              HAVING count(*) <= $MaxBucket),
      cand AS (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
               x.simhash AS ha, y.simhash AS hb
        FROM nib x JOIN nib y
          ON x.band = y.band AND x.nib = y.nib AND x.doc_id < y.doc_id
        JOIN bsz s ON s.band = x.band AND s.nib = x.nib)
      SELECT da, db, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand
      WHERE bit_count(xor(ha, hb)) <= 3
      ORDER BY da, db"""
    })

  // ---------------------------------------------------------------- q34
  // Embedding-cosine near-dup via random-hyperplane LSH (Charikar):
  // candidates meet ONLY inside a SimHash band bucket — one shuffle keyed
  // by (band, value), pair cardinality follows true near-dups, never an
  // all-pairs or within-block O(N²) join. Signatures come from the native
  // codegen'd EmbedSimHash expression (exact integer math, so the oracle
  // reproduces every bit); verification is the exact FloatDot cosine.
  // 14-bit bands keep buckets true-dup-sized (the q33 lesson: 2^14 values
  // per band, so random collisions stay O(N/16384) per bucket); at 100 TB
  // add a bucket-size cap as with q32. Recall < 1 by construction — the
  // oracle replicates the banding, so both engines miss exactly the same
  // pairs; DedupSpec pins recall on planted near-duplicates.
  private val EmbBits = 56 // 4 bands × 14 bits
  private val EmbBandBits = 14
  private val EmbBands = EmbBits / EmbBandBits

  /** Reusable embedding near-dup operator: LSH-bucketed candidate pairs
    * (id_a < id_b) with exact cosine ≥ `minCos`, over any frame with a
    * BIGINT id column and an `array<float>` embedding column. Used by q34
    * and by DedupSpec's planted-duplicate recall test.
    */
  def embeddingNearDup(e0: DataFrame, idCol: String, embCol: String,
      minCos: Double, maxBucket: Int = MaxBucket): DataFrame = {
    import graft.functions.VectorFunctions.embed_simhash
    val e = e0
      .select(col(idCol).as("vid"), col(embCol).as("embv"))
      .withColumn("norm", float_norm(col("embv")))
      .withColumn("sig", embed_simhash(col("embv"), EmbBits))
    val bandExprs = (0 until EmbBands).map(b =>
      s"struct(${b}L as band, (sig div ${1L << (EmbBandBits * b)}) % ${1 << EmbBandBits} as bv)")
    val cand = bucketPairs(e
      .select(col("vid"), explode(array(bandExprs.map(expr): _*)).as("b"))
      .groupBy(col("b.band"), col("b.bv"))
      .agg(sort_array(collect_set(col("vid"))).as("ids"))
      .filter(size(col("ids")) > 1), maxBucket)
      .select(col("da").as("ia"), col("db").as("ib"))
    // exact cosine verify; unhinted — `e` is corpus-sized (see q31 note)
    val ea = e.select(col("vid").as("ia"), col("embv").as("ea"),
      col("norm").as("na"))
    val eb = e.select(col("vid").as("ib"), col("embv").as("eb"),
      col("norm").as("nb"))
    cand.join(ea, "ia").join(eb, "ib")
      .withColumn("cos",
        Num.roundZ(float_dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= minCos)
      .select(col("ia"), col("ib"), col("cos"))
      .orderBy(col("ia"), col("ib"))
  }

  /** Oracle CTE chain mirroring [[embeddingNearDup]] at minCos = 0.3,
    * ending in `emb_pairs(ia, ib, cos)` — shared by the q34 and q277
    * oracles. */
  private[graft] lazy val embPairsCtes: String = {
    import graft.functions.EmbedSimHash.bitDotSql
    val bitSums = (0 until EmbBits)
      .map(j => s"${bitDotSql(j, "i", "q")} AS d$j")
      .mkString(",\n               ")
    val sigExpr = (0 until EmbBits)
      .map(j => s"CASE WHEN d$j >= 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    val bandSelects = (0 until EmbBands)
      .map(b =>
        s"SELECT vec_id, $b AS band, (sig // ${1L << (EmbBandBits * b)}) % ${1 << EmbBandBits} AS bv FROM sig")
      .mkString("\n        UNION ALL ")
    s"""eev AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      enorms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM eev GROUP BY 1),
      qv AS (SELECT vec_id, i, CAST(round(v * 1000) AS BIGINT) AS q FROM eev),
      sums AS (SELECT vec_id,
               $bitSums
               FROM qv GROUP BY vec_id),
      sig AS (SELECT vec_id, $sigExpr AS sig FROM sums),
      ebands AS (
        $bandSelects),
      -- hot-bucket cap, mirroring Spark's MaxBucket drop
      ebsz AS (SELECT band, bv FROM ebands GROUP BY band, bv
              HAVING count(*) <= $MaxBucket),
      ecand AS (
        SELECT DISTINCT x.vec_id AS ia, y.vec_id AS ib
        FROM ebands x JOIN ebands y
          ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id
        JOIN ebsz s ON s.band = x.band AND s.bv = x.bv),
      epairs AS (
        SELECT ia, ib, sum(a.v * b.v) AS dot
        FROM ecand
        JOIN eev a ON a.vec_id = ia
        JOIN eev b ON b.vec_id = ib AND a.i = b.i
        GROUP BY 1, 2),
      emb_pairs AS (
        SELECT ia, ib,
               (CAST(round((dot / (na.nrm * nb.nrm)) * 1e6) AS BIGINT) / 1e6)
                 AS cos
        FROM epairs
        JOIN enorms na ON ia = na.vec_id
        JOIN enorms nb ON ib = nb.vec_id
        WHERE (CAST(round((dot / (na.nrm * nb.nrm)) * 1e6) AS BIGINT) / 1e6)
              >= 0.3)"""
  }

  private val q34 = QueryDef(
    "q34_dedup_embedding_cosine",
    (s, d) => embeddingNearDup(emb(s, d), "vec_id", "embedding", 0.3),
    Some(s"""
      WITH $embPairsCtes
      SELECT ia, ib, cos FROM emb_pairs
      ORDER BY ia, ib"""))

  // ---------------------------------------------------------------- q35
  // Duplicate-CLUSTER assignment: pairwise near-dup output (q32's verified
  // MinHash pairs) is not yet a dedup decision — "A~B, B~C" must collapse
  // to one cluster {A,B,C} with one survivor. This is connected components
  // over the duplicate graph, computed by distributed min-label
  // propagation: every node starts labeled with its own id; each round,
  // labels flow across edges and each node keeps the minimum seen
  // (one edges⋈labels join + one min-aggregation per round — all
  // shuffle-parallel, nothing driver-side except a one-row convergence
  // aggregate). Rounds needed = duplicate-cluster diameter, which for
  // real near-dup graphs is tiny (dups of one document share most
  // shingles, so clusters are near-cliques); the alternating
  // large-star/small-star algorithm (Kiveris et al., "Connected
  // Components in MapReduce and Beyond") is the documented O(log²n)
  // fallback for adversarial chain graphs. The label frontier is
  // re-persisted per round and the fixpoint is detected by a strictly
  // decreasing integer invariant (Σ labels), so iteration count is
  // data-driven, capped, and deterministic: the fixpoint (min id per
  // component) is unique regardless of execution order.
  //
  // Oracle: DuckDB recursive CTE propagating labels to transitive
  // closure, then min per node — same unique fixpoint.
  /** Connected components by min-label propagation over undirected pair
    * edges `(da, db)` → `(id, comp)` with comp = min id in the component.
    * The unique fixpoint is reached after diameter rounds; `maxRounds`
    * caps adversarial chains (DedupSpec drives a worst-case path graph).
    */
  /** Alternating large-star/small-star connected components — the
    * diameter-independent fallback (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", 2014; public algorithm). Converges in
    * O(log² n) rounds on ANY graph, where min-label propagation needs
    * diameter rounds — the difference between 6 rounds and 10⁶ rounds on
    * an adversarial duplicate chain (templated docs with drifting
    * boilerplate, each ~similar only to its neighbors).
    *
    * large-star: each node links its LARGER neighbors to the minimum of
    * its closed neighborhood. small-star: each node links its SMALLER
    * neighbors (and itself) to their minimum. Both are one groupBy
    * shuffle each; edges only ever move toward smaller ids, and the
    * fixpoint is a forest of stars rooted at each component's min id.
    *
    * Convergence is detected structurally, not by set-diff: a star
    * forest is exactly "every src has ONE outgoing edge, and no node is
    * both a src and a dst" — one aggregate and one intersect per round
    * on the (duplicate-graph-sized, corpus-independent) edge table. The
    * known caveat at extreme scale: the final star's root has degree =
    * component size, so one task holds one component's member list —
    * same order as q35's members aggregation itself, acceptable; the
    * paper's secondary-key variant is the documented escalation.
    */
  private[graft] def starComponents(pairs0: DataFrame,
      maxRounds: Int = 30): DataFrame = {
    def largeStar(e: DataFrame): DataFrame =
      e.union(e.select(col("dst"), col("src")))
        .groupBy(col("src").as("u"))
        .agg(collect_set(col("dst")).as("vs"))
        .withColumn("m", least(col("u"), array_min(col("vs"))))
        .select(col("u"), col("m"), explode(col("vs")).as("v"))
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
    def smallStar(e: DataFrame): DataFrame =
      e.select(greatest(col("src"), col("dst")).as("u"),
          least(col("src"), col("dst")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .groupBy("u").agg(collect_set(col("v")).as("vs"))
        .withColumn("m", array_min(col("vs"))) // all vs < u by construction
        .select(col("m"), explode(concat(col("vs"), array(col("u")))).as("v"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
    val pairs = pairs0.toDF("src", "dst")
    // per-round localCheckpoint for the same reason as the propagation
    // loop below: each round references the previous edge set twice
    var e = pairs.filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val agg = e.agg(count(lit(1)), countDistinct(col("src"))).first()
      val oneEdgePerSrc = agg.getLong(0) == agg.getLong(1)
      converged = oneEdgePerSrc &&
        e.select(col("src")).intersect(e.select(col("dst"))).isEmpty
      rounds += 1
    }
    require(converged,
      s"starComponents: not a star forest after $maxRounds rounds " +
        "(theoretical bound is O(log² n); this indicates a bug, not data)")
    // star forest → labels: members point at their root; roots map to
    // themselves
    val labels = e.select(col("src").as("id"), col("dst").as("comp"))
      .unionByName(
        e.select(col("dst").as("id"), col("dst").as("comp")).distinct())
    // self-loop-only nodes: the star rounds drop (a,a) edges, but the
    // propagation formulation labels such a node a singleton — re-attach
    // them so both formulations agree on degenerate input (unreachable
    // from minhashPairs, which always emits da < db, but direct callers
    // may pass anything). Duplicate-graph-sized anti-join, corpus-free.
    val selfOnly = pairs.filter(col("src") === col("dst"))
      .select(col("src").as("id")).distinct()
      .join(labels, Seq("id"), "left_anti")
    labels.unionByName(selfOnly.withColumn("comp", col("id")))
  }

  def connectedComponents(pairs0: DataFrame, maxRounds: Int = 25): DataFrame = {
    val pairs = pairs0.toDF("da", "db")
    // localCheckpoint (not persist): the frontier is re-derived from
    // `edges` every round, so edges too must carry a TRUNCATED lineage —
    // otherwise each round's plan embeds the whole upstream minhash
    // pipeline and the per-round convergence aggregate replans it.
    val edges = pairs
      .union(pairs.select(col("db"), col("da")))
      .toDF("src", "dst").localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    def sumComp(df: DataFrame): Long = df
      .agg(coalesce(org.apache.spark.sql.functions.sum("comp"), lit(0L)))
      .first().getLong(0)
    var invariant = sumComp(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val msgs = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
      // CHECKPOINT EVERY ROUND: `next` references `labels` twice (once
      // directly, once through `msgs`), so without lineage truncation the
      // logical plan DOUBLES per round — at diameter ≳10 the driver dies
      // on plan strings alone (8 GiB heap OOM on a 12-node path graph)
      // long before any executor works. localCheckpoint pins the round's
      // result as RDD blocks and restarts the plan at O(1) size; blocks
      // from prior rounds are released by the ContextCleaner as their
      // frames go out of scope.
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min("comp").as("comp")).localCheckpoint()
      val nextSum = sumComp(next)
      labels = next
      converged = nextSum == invariant // labels only decrease: equal Σ ⇒ fixpoint
      invariant = nextSum
      rounds += 1
    }
    // a diameter->maxRounds graph must not silently return partially
    // propagated labels as if they were components: switch to the
    // diameter-independent large-star/small-star formulation instead
    // (real near-dup clusters are near-cliques, so propagation wins the
    // common case in ≤3 rounds; adversarial chains fall through here)
    if (!converged) starComponents(pairs) else labels
  }

  private val q35 = QueryDef(
    "q35_dedup_components",
    (s, d) =>
      connectedComponents(minhashPairs(s, d).select(col("da"), col("db")))
        .groupBy(col("comp").as("comp_id"))
        .agg(count(lit(1)).as("n_docs"),
          expr("array_join(transform(sort_array(collect_list(id))," +
            " x -> cast(x as string)), ',')").as("members"))
        .orderBy(col("comp_id")),
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
        UNION ALL
        SELECT db, da FROM mh_pairs),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp_id FROM reach GROUP BY id)
      SELECT comp_id, count(*) AS n_docs,
             string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
      FROM comp
      GROUP BY comp_id
      ORDER BY comp_id"""))

  // ---------------------------------------------------------------- q99
  // The large-star/small-star fallback run END-TO-END against q35's exact
  // oracle: both formulations must reach the same unique fixpoint (min id
  // per component), so forcing the real corpus pairs through the fallback
  // and hash-matching the recursive-CTE oracle gates the algorithm itself,
  // not just the DedupSpec toy graphs. (Distinct algorithm, same oracle —
  // this is the fallback's correctness gate, not a duplicate of q35.)
  private val q99 = QueryDef(
    "q99_dedup_components_star",
    (s, d) =>
      starComponents(minhashPairs(s, d).select(col("da"), col("db")))
        .groupBy(col("comp").as("comp_id"))
        .agg(count(lit(1)).as("n_docs"),
          expr("array_join(transform(sort_array(collect_list(id))," +
            " x -> cast(x as string)), ',')").as("members"))
        .orderBy(col("comp_id")),
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
        UNION ALL
        SELECT db, da FROM mh_pairs),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp_id FROM reach GROUP BY id)
      SELECT comp_id, count(*) AS n_docs,
             string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
      FROM comp
      GROUP BY comp_id
      ORDER BY comp_id"""))

  // --------------------------------------------------------------- q100
  // INCREMENTAL dedup — the production daily-refresh shape: a "new" batch
  // (doc_id % 10 = 7 stands in for today's crawl) is checked against the
  // already-ingested corpus, and each new doc gets a verdict: 'exact'
  // (content hash already present), 'near' (verified Jaccard ≥ 0.5
  // against some corpus doc), or 'new'. The 100 TB point is ASYMMETRY:
  // band buckets are built over both sides in one pass, but pairs are
  // generated ONLY across sides (new × corpus within a capped bucket) —
  // the corpus×corpus quadratic term, which full dedup must pay, never
  // exists here, so a |delta| ≪ |corpus| refresh costs O(|delta| ·
  // bucket-occupancy), not O(|corpus|²). Exact matches are one
  // hash-semi-join on (md5, n_chars), the q30 identity treatment.
  // Cross-side generation inside the SAME capped buckets makes the near
  // set exactly the mixed-membership subset of q32's mh_pairs, which is
  // how the oracle states it.
  private val q100 = QueryDef(
    "q100_dedup_incremental",
    (s, d) => {
      val isNew = col("doc_id") % 10 === 7
      val hashed = docs(s, d).select(col("doc_id"),
        md5(col("text").cast("binary")).as("h"), col("n_chars"), isNew.as("is_new"))
      val exact = hashed.filter(col("is_new"))
        .join(hashed.filter(!col("is_new"))
            .select(col("h"), col("n_chars")).distinct(),
          Seq("h", "n_chars"), "left_semi")
        .select(col("doc_id"), lit(true).as("ex"))
      // near: one minhash pass over the whole table, then cross-side
      // pairs from capped buckets (cap on TOTAL bucket size, matching
      // bucketPairs/minhashCtes semantics bit-for-bit)
      val sh = shingles(s, d)
      val sigCols = (0 until K).map(k =>
        min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k")) :+
        collect_set(col("sid")).as("sids")
      val sig = sh.withColumn("sid", md5Id(col("shingle")))
        .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        .localCheckpoint() // feeds buckets + both verify sides (q32 note)
      val bandExprs = (0 until Bands).map(j =>
        s"struct(${j}L as band, h${2 * j} * 2147483648L + h${2 * j + 1} as bv)")
      val cross = sig
        .select(col("doc_id"), explode(array(bandExprs.map(expr): _*)).as("b"))
        .groupBy(col("b.band"), col("b.bv"))
        .agg(
          sort_array(collect_set(when(col("doc_id") % 10 === 7,
            col("doc_id")))).as("new_ids"),
          sort_array(collect_set(when(col("doc_id") % 10 =!= 7,
            col("doc_id")))).as("old_ids"))
        .filter(size(col("new_ids")) > 0 && size(col("old_ids")) > 0 &&
          size(col("new_ids")) + size(col("old_ids")) <= MaxBucket)
        .select(col("new_ids"), col("old_ids"),
          explode(expr("sequence(0, size(new_ids) - 1)")).as("i"))
        .select(col("new_ids")(col("i")).as("new_id"), col("old_ids"),
          explode(expr("sequence(0, size(old_ids) - 1)")).as("j"))
        .select(col("new_id"), col("old_ids")(col("j")).as("old_id"))
        .distinct()
      val near = cross
        .join(sig.select(col("doc_id").as("new_id"), col("sids").as("sa")), "new_id")
        .join(sig.select(col("doc_id").as("old_id"), col("sids").as("sb")), "old_id")
        .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        // the SAME raw-ratio filter as minhashPairs / the mh_pairs oracle
        // CTE (see [[jacRaw]]) — so "near" is exactly the
        // mixed-membership subset of q32's pairs by construction, with no
        // boundary pair (true jac in [0.4999995, 0.5)) classed 'near' by
        // one formulation and 'new' by the other
        .filter(jacRaw >= 0.5)
        .groupBy(col("new_id"))
        .agg(count(lit(1)).as("n_near"), min(col("old_id")).as("near_min_old"))
      docs(s, d).filter(isNew).select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(near.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("ex"), "exact").when(col("n_near").isNotNull, "near")
            .otherwise("new").as("verdict"),
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          coalesce(col("near_min_old"), lit(-1L)).as("near_min_old"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $minhashCtes,
      near AS (
        SELECT CASE WHEN da % 10 = 7 THEN da ELSE db END AS new_id,
               CASE WHEN da % 10 = 7 THEN db ELSE da END AS old_id
        FROM mh_pairs
        WHERE (da % 10 = 7) <> (db % 10 = 7)),
      nearagg AS (
        SELECT new_id, count(*) AS n_near, min(old_id) AS near_min_old
        FROM near GROUP BY new_id),
      ex AS (
        SELECT DISTINCT n.doc_id
        FROM documents n JOIN documents o
          ON md5(n.text) = md5(o.text) AND n.n_chars = o.n_chars
        WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 <> 7)
      SELECT d.doc_id,
             CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                  WHEN a.new_id IS NOT NULL THEN 'near'
                  ELSE 'new' END AS verdict,
             CAST(COALESCE(a.n_near, 0) AS BIGINT) AS n_near,
             CAST(COALESCE(a.near_min_old, -1) AS BIGINT) AS near_min_old
      FROM documents d
      LEFT JOIN ex e ON e.doc_id = d.doc_id
      LEFT JOIN nearagg a ON a.new_id = d.doc_id
      WHERE d.doc_id % 10 = 7
      ORDER BY d.doc_id"""))

  // --------------------------------------------------------------- q109
  // Cluster-representative selection — the step every dedup pipeline runs
  // AFTER clustering: from each near-duplicate cluster keep exactly one
  // canonical copy (highest q41 quality score, doc_id as the tie-break)
  // and account for what deduplication saves. Detection (q32) and
  // clustering (q35) without this step leave the corpus un-deduplicated;
  // this closes the loop.
  //
  // Scale: the component table is duplicate-graph-sized, not corpus-sized;
  // joining it to the corpus on doc_id prunes the corpus to cluster
  // members before the quality projection is ever aggregated. The argmax
  // window partitions by component — each partition is ONE cluster
  // (near-dup clusters are small by nature; the hot-bucket cap bounds
  // pathological ones), so no corpus-scaled window partition exists. The
  // final aggregate is one hash agg over cluster members.
  private val q109 = QueryDef(
    "q109_dedup_keep_best",
    (s, d) => {
      val comp = connectedComponents(
        minhashPairs(s, d).select(col("da"), col("db")))
      // q41's blended quality score, shared stopword literal (TextAnalysis)
      // n_chars = 0 guard (q41's, DegenerateDataSpec): an empty doc can
      // never be a cluster member (no shingles → no pairs), but Spark
      // computes this projection scan-side BEFORE the join prunes it —
      // unguarded it throws ANSI DIVIDE_BY_ZERO on the corpus scan.
      // NULL-ordering note (r10 NullOrderAudit whitelist): the guard
      // makes `quality` NULL exactly for those n_chars = 0 docs, and
      // quality is the rank key below — safe because the same no-pairs
      // argument means the inner join on comp PRUNES every such doc
      // before the window, so a NULL key never reaches either engine's
      // rank (divergent NULL placement needs an actual NULL row).
      val qual = docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars"),
          when(col("n_chars") > 0L,
            round(lit(1.0) -
              (expr(s"size(filter(toks, w -> array_contains(${TextAnalysis.stopArr}, w)))")
                .cast("double") / size(col("toks")).cast("double")) * 0.5 -
              (length(regexp_replace(col("text"), "[^.,!?;]", "")).cast("double") /
                col("n_chars").cast("double")) * 0.5, 6)).as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("comp")).orderBy(col("quality").desc, col("doc_id"))
      comp.join(qual, comp("id") === qual("doc_id"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("comp").as("comp_id"))
        .agg(count(lit(1)).as("n_docs"),
          max(when(col("rk") === 1, col("doc_id"))).as("keep_id"),
          max(when(col("rk") === 1, col("quality"))).as("keep_quality"),
          sum(col("n_chars")).as("chars_total"),
          coalesce(sum(when(col("rk") > 1, col("n_chars"))), lit(0L))
            .as("chars_saved"))
        .orderBy(col("comp_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
        UNION ALL
        SELECT db, da FROM mh_pairs),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
      qual AS (
        SELECT doc_id, n_chars,
               round(1.0
                     - (CAST(len(list_filter(toks, w -> list_contains(${TextAnalysis.stopList}, w))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE)) * 0.5
                     - (CAST(length(regexp_replace(text, '[^.,!?;]', '', 'g')) AS DOUBLE)
                        / CAST(n_chars AS DOUBLE)) * 0.5, 6) AS quality
        FROM (SELECT doc_id, text, n_chars, string_split(text, ' ') AS toks
              FROM documents) t),
      ranked AS (
        SELECT c.comp, q.doc_id, q.n_chars, q.quality,
               row_number() OVER (PARTITION BY c.comp
                                  ORDER BY q.quality DESC, q.doc_id) AS rk
        FROM comp c JOIN qual q ON q.doc_id = c.id)
      SELECT comp AS comp_id,
             count(*) AS n_docs,
             max(CASE WHEN rk = 1 THEN doc_id END) AS keep_id,
             max(CASE WHEN rk = 1 THEN quality END) AS keep_quality,
             CAST(sum(n_chars) AS BIGINT) AS chars_total,
             CAST(COALESCE(sum(CASE WHEN rk > 1 THEN n_chars END), 0) AS BIGINT)
               AS chars_saved
      FROM ranked
      GROUP BY comp
      ORDER BY comp"""))

  // --------------------------------------------------------------- q120
  // Near-decontamination via CONTAINMENT: for each eval doc, the corpus
  // docs whose shingle overlap covers ≥ 50% of the EVAL doc's shingles —
  // the asymmetric |A∩B|/|A| score (GPT-3-style eval-in-train leakage),
  // which catches an eval snippet embedded in a longer training doc that
  // symmetric Jaccard (q32, denominator |A∪B|) dilutes below threshold
  // and exact 5-gram membership (q105/q112) only flags, not scores.
  // Scale: q100's cross-side shape with the eval split as the small
  // side — band buckets over both sides in one pass, pairs generated
  // ONLY eval × corpus inside capped buckets, so the corpus² term never
  // exists; the signature table is localCheckpointed (the q32/q100
  // precedent: it feeds buckets + both verify sides). The containment
  // verify runs in the same md5-id shingle-set domain as the oracle.
  // Honest limitation, mirrored in the oracle so both engines agree:
  // CANDIDATE recall uses symmetric minhash bands, whose collision
  // probability falls as the containing doc grows (a band needs the
  // whole-doc minhash to land inside the shared snippet) — a heavily
  // diluted containment pair can be missed by both engines identically.
  // The scale fix is a dedicated containment sketch over eval-side
  // partitioned minhashes; the exact-5-gram q105/q112 path is the
  // recall-1 backstop for verbatim leakage, which is why both ship.
  /** The q120 containment pipeline over any (doc_id, lang, text) frame —
    * the testable core. `isEval` marks the small side. */
  def containmentStats(d0: DataFrame,
      isEv: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val sigCols = (0 until K).map(k =>
        min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k")) :+
        collect_set(col("sid")).as("sids")
      val sig = shinglesOf(d0).withColumn("sid", md5Id(col("shingle")))
        .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        .localCheckpoint()
      val bandExprs = (0 until Bands).map(j =>
        s"struct(${j}L as band, h${2 * j} * 2147483648L + h${2 * j + 1} as bv)")
      val cross = sig
        .select(col("doc_id"), explode(array(bandExprs.map(expr): _*)).as("b"))
        .groupBy(col("b.band"), col("b.bv"))
        .agg(
          sort_array(collect_set(when(isEv(col("doc_id")), col("doc_id"))))
            .as("ev_ids"),
          sort_array(collect_set(when(!isEv(col("doc_id")), col("doc_id"))))
            .as("co_ids"))
        .filter(size(col("ev_ids")) > 0 && size(col("co_ids")) > 0 &&
          size(col("ev_ids")) + size(col("co_ids")) <= MaxBucket)
        .select(col("ev_ids"), col("co_ids"),
          explode(expr("sequence(0, size(ev_ids) - 1)")).as("i"))
        .select(col("ev_ids")(col("i")).as("eid"), col("co_ids"),
          explode(expr("sequence(0, size(co_ids) - 1)")).as("j"))
        .select(col("eid"), col("co_ids")(col("j")).as("cid"))
        .distinct()
      cross
        .join(sig.select(col("doc_id").as("eid"), col("sids").as("sa")), "eid")
        .join(sig.select(col("doc_id").as("cid"), col("sids").as("sb")), "cid")
        .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("cont",
          round(col("ni").cast("double") / size(col("sa")).cast("double"), 6))
        .filter(col("cont") >= 0.5)
        // best match = argmin over (−cont, cid) packed into one int64
        // ((1e6 − 1e6·cont) · 2^42 + cid; cont is round(·,6) so the
        // scaled value is exact, corpus ids < 2^42) — pure HashAggregate
        // instead of min(struct)'s SortAggregate (the nearestCell
        // discipline)
        .groupBy(col("eid"))
        .agg(count(lit(1)).as("n_hits"),
          min((lit(1000000L) - round(col("cont") * 1e6).cast("long")) *
            4398046511104L + col("cid")).as("p"))
        .select(col("eid").as("eval_id"), col("n_hits"),
          ((lit(1000000L) - expr("p DIV 4398046511104")).cast("double") /
            lit(1e6)).as("best_cont"),
          (col("p") % 4398046511104L).as("best_corpus_id"))
        .orderBy(col("eval_id"))
  }

  private val q120 = QueryDef(
    "q120_decontaminate_containment",
    (s, d) => containmentStats(docs(s, d), _ % 97 === 3),
    Some {
      val minExprs = (0 until K)
        .map(k => s"min((sid * ${aK(k)} + ${bK(k)}) % $P) AS h$k")
        .mkString(",\n               ")
      val bandSelects = (0 until Bands)
        .map(j =>
          s"SELECT doc_id, $j AS band, h${2 * j} * 2147483648 + h${2 * j + 1} AS bv FROM sig")
        .mkString("\n        UNION ALL ")
      s"""
      WITH $shinglesSql,
      ids AS (SELECT DISTINCT doc_id, ${md5IdSql("shingle")} AS sid FROM sh),
      sig AS (SELECT doc_id,
               $minExprs
              FROM ids GROUP BY doc_id),
      bands AS (
        $bandSelects),
      bsz AS (SELECT band, bv FROM bands GROUP BY band, bv
              HAVING count(*) <= $MaxBucket),
      cand AS (
        SELECT DISTINCT x.doc_id AS eid, y.doc_id AS cid
        FROM bands x
        JOIN bands y ON x.band = y.band AND x.bv = y.bv
        JOIN bsz s ON s.band = x.band AND s.bv = x.bv
        WHERE x.doc_id % 97 = 3 AND y.doc_id % 97 <> 3),
      cnt AS (SELECT doc_id, count(*) AS n FROM ids GROUP BY 1),
      inter AS (
        SELECT eid, cid, count(*) AS ni
        FROM cand
        JOIN ids a ON a.doc_id = eid
        JOIN ids b ON b.doc_id = cid AND a.sid = b.sid
        GROUP BY 1, 2),
      scored AS (
        SELECT eid, cid,
               round(CAST(ni AS DOUBLE) / CAST(ca.n AS DOUBLE), 6) AS cont
        FROM inter JOIN cnt ca ON eid = ca.doc_id
        WHERE round(CAST(ni AS DOUBLE) / CAST(ca.n AS DOUBLE), 6) >= 0.5)
      SELECT eid AS eval_id,
             count(*) AS n_hits,
             max(cont) AS best_cont,
             CAST(min(CASE WHEN rk = 1 THEN cid END) AS BIGINT)
               AS best_corpus_id
      FROM (SELECT eid, cid, cont,
                   row_number() OVER (PARTITION BY eid
                                      ORDER BY cont DESC, cid) AS rk
            FROM scored) t
      GROUP BY eid
      ORDER BY eval_id"""
    })

  // --------------------------------------------------------------- q122
  // Passage-level exact dedup (CCNet-style line dedup, adapted to this
  // corpus's single-line docs): split each doc into consecutive
  // non-overlapping 10-token passages, keep only the globally-first
  // occurrence (min (doc_id, pos)) of each distinct passage, and
  // reconstruct each document's surviving text.
  //
  // Scale shape: both heavy steps are PRE-COMBINED hash aggregations.
  // The per-passage argmin gets map-side partial aggregation, so a
  // boilerplate passage repeated 10^9 times collapses to one row per
  // input task BEFORE the exchange — the hot key never ships its copies
  // (this is why it is an agg, not a row_number window: a window sorts
  // every copy of the hot passage in one task). The per-doc counts and
  // the kept-text rebuild are likewise combiner-friendly aggs keyed by
  // doc_id, and the final join aligns two doc_id-partitioned sides.
  /** The q122 pipeline over any (doc_id, text) frame — the testable core. */
  def passageDedup(d0: DataFrame): DataFrame = {
      val p = d0
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, cast(ceil(size(toks) / 10.0) as int) - 1)"))
            .as("i"))
        .select(col("doc_id"), col("i").cast("long").as("pos"),
          concat_ws(" ", expr("slice(toks, i * 10 + 1, 10)")).as("pass"))
      // argmin packed into ONE int64 (doc_id * 2^20 + pos; pos < 2^20 —
      // a doc would need >10M tokens to overflow): min(struct(...)) plans
      // as SortAggregate + per-task sort, while min(BIGINT) stays in
      // whole-stage-codegen HashAggregate with map-side combine.
      val firsts = p
        .withColumn("mkey", col("doc_id") * 1048576L + col("pos"))
        .groupBy(col("pass"))
        .agg(min(col("mkey")).as("mkey"))
        .select(expr("mkey DIV 1048576").as("doc_id"),
          (col("mkey") % 1048576L).as("pos"), col("pass"))
      val keptAgg = firsts
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ",
            expr("transform(array_sort(collect_list(struct(pos, pass)))," +
                 " x -> x.pass)")).as("kept_text"))
      p.groupBy(col("doc_id")).agg(count(lit(1)).as("n_pass"))
        .join(keptAgg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_pass"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_text"), lit("")).as("kept_text"))
        .orderBy(col("doc_id"))
  }

  private val q122 = QueryDef(
    "q122_dedup_passages",
    (s, d) => passageDedup(docs(s, d)),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      px AS (SELECT doc_id, toks,
                    unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)))
                      AS pos
             FROM t),
      p AS (SELECT doc_id, pos,
                   array_to_string(toks[(pos * 10 + 1):(pos * 10 + 10)], ' ')
                     AS pass
            FROM px),
      r AS (SELECT doc_id, pos, pass,
                   row_number() OVER (PARTITION BY pass
                                      ORDER BY doc_id, pos) AS rk
            FROM p)
      SELECT doc_id, count(*) AS n_pass,
             CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             COALESCE(string_agg(CASE WHEN rk = 1 THEN pass END, ' '
                                 ORDER BY pos), '') AS kept_text
      FROM r GROUP BY doc_id ORDER BY doc_id"""))

  // --------------------------------------------------------------- q154
  // Duplicate-provenance matrix — q32's verified near-dup pairs rolled
  // up by (source, source): how much duplication lives WITHIN each data
  // source vs ACROSS source pairs. This is the dedup-observability
  // report that decides pipeline policy (a crawl duplicating itself is
  // re-crawl noise to drop; two sources duplicating each other means
  // one is a mirror and q49's mix double-counts it). Sources are
  // normalized with least/greatest so the matrix is upper-triangular
  // regardless of pair orientation; mean Jaccard aggregates the
  // already-rounded q32 similarity as scaled BIGINTs (order-independent,
  // one closing division).
  // Scale: the pair table is |near-dups|-sized — tiny relative to the
  // corpus — so it BROADCASTS into the two doc_id→source lookups; the
  // corpus-side projection carries only (doc_id, source). The matrix
  // aggregate is ≤ C(|sources|+1, 2) rows. Nothing here re-touches text
  // or signatures; the minhash signature table is reused via
  // [[minhashPairs]]'s localCheckpoint exactly once.
  private val q154 = QueryDef(
    "q154_dup_source_matrix",
    (s, d) => {
      val src = docs(s, d).select(col("doc_id"), col("source"))
      val pairs = minhashPairs(s, d)
      pairs
        .join(src.select(col("doc_id").as("da"), col("source").as("srca")),
          Seq("da"))
        .join(src.select(col("doc_id").as("db"), col("source").as("srcb")),
          Seq("db"))
        .select(least(col("srca"), col("srcb")).as("source_a"),
          greatest(col("srca"), col("srcb")).as("source_b"),
          col("jac"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(round(col("jac") * lit(1e6)).cast("long")).as("sj"))
        .select(col("source_a"), col("source_b"), col("n_pairs"),
          round(col("sj").cast("double") / lit(1e6) /
            col("n_pairs").cast("double"), 6).as("mean_jac"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(s"""
      WITH $minhashCtes,
      lab AS (
        SELECT least(x.source, y.source) AS source_a,
               greatest(x.source, y.source) AS source_b,
               p.jac
        FROM mh_pairs p
        JOIN documents x ON x.doc_id = p.da
        JOIN documents y ON y.doc_id = p.db)
      SELECT source_a, source_b,
             CAST(count(*) AS BIGINT) AS n_pairs,
             round(CAST(sum(CAST(round(jac * 1e6) AS BIGINT)) AS BIGINT)
                   / 1e6 / count(*), 6) AS mean_jac
      FROM lab
      GROUP BY source_a, source_b
      ORDER BY source_a, source_b"""))

  // --------------------------------------------------------------- q161
  // MinHash estimator calibration — the sketch-observability companion
  // to q32 (and the q159 pattern applied to similarity): for every
  // verified near-dup pair, compare the SKETCH's Jaccard estimate (the
  // fraction of the K=16 minhash components that agree — the unbiased
  // estimator LSH banding is built on) against the exact Jaccard the
  // verify step computed. Grouping by the match count yields the
  // 17-bucket reliability table you inspect before trusting banding
  // thresholds on a new corpus.
  // Scale: the verified pair table (q32's output, tiny) broadcasts onto
  // the signature table TWICE — the corpus-sized signatures never
  // reshuffle; the final aggregate has ≤ K+1 groups. Signatures are
  // recomputed here for self-containment; production would read the
  // persisted signature table q32's scaladoc already calls for.
  // Exactness: component equality is integer compare; mean exact-Jaccard
  // aggregates the already-6dp-rounded jac as 1e6-scaled BIGINTs.
  private val q161 = QueryDef(
    "q161_minhash_calibration",
    (s, d) => {
      val sigCols = (0 until K).map(k =>
        min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k"))
      val sig = shingles(s, d).withColumn("sid", md5Id(col("shingle")))
        .groupBy("doc_id")
        .agg(sigCols.head, sigCols.tail: _*)
      val sa = sig.select(col("doc_id").as("da") +:
        (0 until K).map(k => col(s"h$k").as(s"ha$k")): _*)
      val sb = sig.select(col("doc_id").as("db") +:
        (0 until K).map(k => col(s"h$k").as(s"hb$k")): _*)
      val est = (0 until K)
        .map(k => when(col(s"ha$k") === col(s"hb$k"), 1L).otherwise(0L))
        .reduce(_ + _)
      broadcast(minhashPairs(s, d))
        .join(sa, "da").join(sb, "db")
        .withColumn("n_match", est)
        .groupBy(col("n_match"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(round(col("jac") * lit(1e6)).cast("long")).as("sj"))
        .select(col("n_match"),
          (col("n_match").cast("double") / lit(16.0)).as("est_jac"),
          col("n_pairs"),
          round(col("sj").cast("double") /
            (lit(1e6) * col("n_pairs").cast("double")), 6).as("avg_jac"))
        .orderBy(col("n_match"))
    },
    Some {
      val eq = (0 until K)
        .map(k => s"(CASE WHEN a.h$k = b.h$k THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH $minhashCtes,
      scored AS (
        SELECT $eq AS n_match, p.jac
        FROM mh_pairs p
        JOIN sig a ON p.da = a.doc_id
        JOIN sig b ON p.db = b.doc_id)
      SELECT CAST(n_match AS BIGINT) AS n_match,
             CAST(n_match AS DOUBLE) / 16.0 AS est_jac,
             CAST(count(*) AS BIGINT) AS n_pairs,
             round(CAST(sum(CAST(round(jac * 1e6) AS BIGINT)) AS DOUBLE) /
                   (1e6 * CAST(count(*) AS DOUBLE)), 6) AS avg_jac
      FROM scored
      GROUP BY n_match
      ORDER BY n_match"""
    })

  // ---------------------------------------------------------------- q205
  // Cluster-safe (leakage-safe) train/eval split. q47 splits on a
  // per-document content hash, which keeps byte-identical duplicates on
  // one side but lets NEAR-duplicates straddle the split — the classic
  // eval-contamination leak: a paraphrase of a training document lands in
  // eval and inflates every metric. The fix is to make the split decision
  // per near-dup CLUSTER, not per document: q32's verified MinHash pairs →
  // connected components (q35's machinery) → each cluster keyed by its
  // minimum member content-hash (content-pure like q47: stable under
  // re-ingest and doc_id renumbering, because the key is derived from
  // member TEXTS, not ids) → one md5 bucket decides the side for the
  // whole cluster. Singletons (docs in no pair) are their own cluster via
  // coalesce. By construction no cluster straddles the split (DedupSpec
  // pins straddle = 0 end-to-end); the registered output is the per-side
  // distribution. Scale shape: text is reduced to md5+n_chars before any
  // exchange; beyond the pair generation the plan adds two narrow
  // shuffles (component join on doc_id, rep-key aggregate on comp_id) and
  // the side decision is a scalar expression — no corpus-sized windows,
  // no driver state, output is 2 rows.
  private val q205 = QueryDef(
    "q205_cluster_safe_split",
    (s, d) => {
      val comps = connectedComponents(
        minhashPairs(s, d).select(col("da"), col("db")))
      // hb: the 56-bit numeric md5 prefix (the q47 idiom). The cluster rep
      // key is min(hb) — NOT min(h) over the hex STRING, which would kick
      // the aggregate out of HashAggregate into a SortAggregate (string
      // min has no mutable agg buffer); fixed-length lowercase hex is
      // lexicographically monotone in its numeric prefix, so
      // min(prefix56(h)) ≡ prefix56(min(h)) and the bucket decision is
      // identical while the aggregate stays codegen'd.
      val dd = docs(s, d).select(col("doc_id"), col("n_chars"),
        conv(substring(md5(col("text").cast("binary")), 1, 14), 16, 10)
          .cast("long").as("hb"))
      val withComp = dd
        .join(comps, dd("doc_id") === comps("id"), "left")
        .select(col("doc_id"), col("n_chars"), col("hb"),
          coalesce(col("comp"), col("doc_id")).as("comp_id"))
      val repKey = withComp.groupBy(col("comp_id"))
        .agg(min(col("hb")).as("rep_hb"))
      withComp.join(repKey, "comp_id")
        .withColumn("bucket", col("rep_hb") % 1000L)
        .withColumn("side",
          when(col("bucket") < 800, "train").otherwise("eval"))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("comp_id")).as("n_clusters"),
          sum(col("n_chars")).as("n_chars_sum"))
        .orderBy(col("side"))
    },
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
        UNION ALL
        SELECT db, da FROM mh_pairs),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp_id FROM reach GROUP BY id),
      dd AS (SELECT doc_id, n_chars,
                    (('0x' || substr(md5(text), 1, 14))::BIGINT) AS hb
             FROM documents),
      wc AS (
        SELECT d.doc_id, d.n_chars, d.hb,
               coalesce(c.comp_id, d.doc_id) AS comp_id
        FROM dd d LEFT JOIN comp c ON c.id = d.doc_id),
      rep AS (SELECT comp_id, min(hb) AS rep_hb FROM wc GROUP BY comp_id),
      keyed AS (
        SELECT w.doc_id, w.n_chars, w.comp_id, r.rep_hb % 1000 AS bucket
        FROM wc w JOIN rep r ON w.comp_id = r.comp_id)
      SELECT CASE WHEN bucket < 800 THEN 'train' ELSE 'eval' END AS side,
             count(*) AS n_docs,
             count(DISTINCT comp_id) AS n_clusters,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
      FROM keyed
      GROUP BY 1
      ORDER BY side"""))

  // --------------------------------------------------------------- q210
  /** Staged document feed for q210: the doc_id % 5 == 0 fifth of the
    * corpus written as 4 parquet slices (by (doc_id/5) % 4) into a
    * stable per-SF temp dir, `_READY`-marked and mtime-stamped ascending
    * so a reused staging replays identically (same scheme as the
    * EventStreams stagings). The staging dir is keyed by a CONTENT
    * fingerprint of the live fifth (row count + max doc_id + a bit_xor
    * of xxhash64 over the payload columns), not just the dataset path
    * (ADVICE r7; payload term ADVICE r9): if the source table is
    * regenerated in place — even payload-only, same ids/count — the key
    * changes and a fresh staging is built instead of a stale feed
    * silently replaying across JVM runs; superseded sibling stagings
    * are removed on rebuild. */
  private val feedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** Test hook (StagingSpec): clear the per-JVM feed memo so a spec can
    * simulate a fresh JVM observing a regenerated-in-place table. */
  private[graft] def resetFeedMemoForTest(): Unit = feedDirs.clear()
  private[graft] def stagedDocFeed(s: SparkSession, d: String): String =
    feedDirs.computeIfAbsent(d, _ => {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val fp = docs(s, d).filter(col("doc_id") % 5 === 0)
        .agg(count(lit(1)).as("n"),
          coalesce(max(col("doc_id")), lit(0L)).as("mx"),
          coalesce(expr("bit_xor(xxhash64(text, lang, source, n_chars))"),
            lit(0L)).as("xh")).first()
      val parent = Paths.get(sys.props("java.io.tmpdir"), "graft_stream",
        d.replaceAll("[^A-Za-z0-9.]", "_"))
      val dir = parent.resolve(s"doc_feed_${fp.getLong(0)}_${fp.getLong(1)}_" +
        java.lang.Long.toHexString(fp.getLong(2)))
      val ready = dir.resolve("_READY")
      if (!Files.exists(ready)) {
        // drop superseded stagings of the same dataset path
        if (Files.exists(parent))
          Files.list(parent).iterator.asScala
            .filter(p => p.getFileName.toString.startsWith("doc_feed") &&
              p != dir)
            .foreach(p => Files.walk(p)
              .sorted(java.util.Comparator.reverseOrder())
              .iterator.asScala.foreach(Files.delete))
        if (Files.exists(dir))
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .iterator.asScala.foreach(Files.delete)
        Files.createDirectories(dir)
        val stage = dir.resolve("_work")
        docs(s, d).filter(col("doc_id") % 5 === 0)
          .withColumn("fid", (col("doc_id") / 5) % 4)
          .repartition(col("fid"))
          .write.mode("overwrite").partitionBy("fid").parquet(stage.toString)
        Files.list(stage).iterator.asScala
          .filter(_.getFileName.toString.startsWith("fid=")).toSeq
          .sortBy(_.getFileName.toString)
          .foreach { pd =>
            val fid = pd.getFileName.toString.stripPrefix("fid=")
            val part = Files.list(pd).iterator.asScala
              .filter(_.toString.endsWith(".parquet")).toSeq
            require(part.length == 1, s"one file expected for fid=$fid")
            Files.move(part.head, dir.resolve(s"feed_$fid.parquet"))
          }
        Files.walk(stage).sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(Files.delete)
        Files.createFile(ready)
      }
      // ascending mtimes, fresh enough for the source's maxFileAge filter
      val fs = Files.list(dir).iterator.asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.getFileName.toString)
      val base = System.currentTimeMillis() - 3600L * 1000
      fs.zipWithIndex.foreach { case (f, i) =>
        Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
      }
      dir.toString
    })

  /** Core of q210, parameterized on files-per-trigger so DedupSpec can
    * pin chunking invariance (1 file per micro-batch vs the whole feed
    * in one batch must yield identical verdicts). */
  private[graft] def streamAdmission(s: SparkSession, d: String,
      filesPerTrigger: Int): DataFrame = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val feedDir = stagedDocFeed(s, d)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    // ---- static corpus index, built once and pinned (localCheckpoint):
    // per-batch work must touch only the arriving feed slice, never
    // re-derive corpus state — the persisted-signatures production shape.
    val corpus = Tables.t(ss, d, "documents").filter(col("doc_id") % 5 =!= 0)
    val csh = rawShinglesOf(corpus)
      .select(col("doc_id"), md5Id(col("shingle")).as("sid")).distinct()
    val sigCols = (0 until K).map(k =>
      min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k")) :+
      collect_set(col("sid")).as("sids")
    val corpSig = csh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .localCheckpoint()
    val bandExprs = (0 until Bands).map(j =>
      s"struct(${j}L as band, h${2 * j} * 2147483648L + h${2 * j + 1} as bv)")
    val corpBands = corpSig
      .select(col("doc_id").as("old_id"),
        explode(array(bandExprs.map(expr): _*)).as("b"))
      .select(col("old_id"), col("b.band").as("band"), col("b.bv").as("bv"))
    // CORPUS-SIDE-ONLY hot-bucket cap: a static property of the index,
    // so per-doc verdicts cannot depend on how the feed is chunked into
    // micro-batches (a union-side cap like q100's would make a bucket's
    // fate depend on which feed docs share the batch — DedupSpec pins
    // the invariance this buys).
    val okBuckets = corpBands.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= MaxBucket)
      .select(col("band"), col("bv"))
    val corpProbe = corpBands.join(okBuckets, Seq("band", "bv"))
      .localCheckpoint()
    val corpSids = corpSig.select(col("doc_id").as("old_id"),
      col("sids").as("sb"))
    val corpHash = corpus
      .select(md5(col("text").cast("binary")).as("h"), col("n_chars"))
      .distinct().localCheckpoint()
    // ---- fresh sink + checkpoint per run (append sink would otherwise
    // double-count on reuse)
    val outDir = Files.createTempDirectory("graft_q210_out_").toString
    val ckpt = Files.createTempDirectory("graft_q210_ckpt_").toString
    val q = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"))
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(feedDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val fsig = rawShinglesOf(batch)
          .select(col("doc_id"), md5Id(col("shingle")).as("sid")).distinct()
          .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        val cand = fsig
          .select(col("doc_id").as("new_id"),
            explode(array(bandExprs.map(expr): _*)).as("b"))
          .select(col("new_id"), col("b.band").as("band"),
            col("b.bv").as("bv"))
          .join(corpProbe, Seq("band", "bv"))
          .select(col("new_id"), col("old_id")).distinct()
        val near = cand
          .join(fsig.select(col("doc_id").as("new_id"),
            col("sids").as("sa")), "new_id")
          .join(corpSids, "old_id")
          .withColumn("ni",
            size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .filter(jacRaw >= 0.5) // the one house threshold expression
          .groupBy(col("new_id"))
          .agg(count(lit(1)).as("n_near"), min(col("old_id")).as("near_min_old"))
        val ex = batch
          .select(col("doc_id"), md5(col("text").cast("binary")).as("h"),
            col("n_chars"))
          .join(corpHash, Seq("h", "n_chars"), "left_semi")
          .select(col("doc_id"), lit(true).as("ex"))
        batch.select(col("doc_id"))
          .join(ex, Seq("doc_id"), "left")
          .join(near.withColumnRenamed("new_id", "doc_id"),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("ex"), "exact")
              .when(col("n_near").isNotNull, "near")
              .otherwise("new").as("verdict"),
            coalesce(col("n_near"), lit(0L)).as("n_near"),
            coalesce(col("near_min_old"), lit(-1L)).as("near_min_old"))
          .write.mode("append").parquet(outDir)
        ()
      }
      .start()
    q.awaitTermination()
    // explicit schema: an empty feed (degenerate sweep) runs zero batches,
    // so foreachBatch writes no files and inference would throw — the
    // empty verdict table is the correct result there
    s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id bigint, verdict string, n_near bigint, near_min_old bigint"))
      .parquet(outDir).orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------- q210
  // Streaming near-dup ADMISSION CONTROL — q100's daily-refresh dedup
  // (new batch vs ingested corpus) run as a continuous pipeline: the
  // feed (every 5th doc) streams in 4 file micro-batches; each batch is
  // classified exact / near / new against a STATIC corpus index built
  // once (signatures + band buckets + content hashes, localCheckpointed
  // — persist-the-signatures, never re-derive). Each arriving doc's
  // verdict is independent of every other feed doc, so the operator
  // needs NO cross-batch state: per-batch work is minhash signatures of
  // the slice (scalar + one tiny aggregate), a band-key equi-join into
  // the corpus probe table, and the exact-Jaccard verify — O(|batch| ·
  // bucket-occupancy) per batch, the corpus term paid once at index
  // build. foreachBatch gives the batch the full batch-API surface
  // (groupBy et al. would be stateful operators in a pure streaming
  // plan) — the standard Kafka→dedup→store admission shape. The one
  // design decision that MAKES it streamable: the hot-bucket cap is
  // corpus-side-only (a static index property), never union-side like
  // q100's, so verdicts are chunking-invariant — DedupSpec pins
  // 1-file-per-trigger ≡ whole-feed-in-one-batch, and the oracle
  // expresses the same cap. At 100 TB: the index lives in a store
  // keyed by band value; each micro-batch probes only its own keys.
  private val q210 = QueryDef(
    "q210_stream_dedup_admission",
    (s, d) => streamAdmission(s, d, 1),
    Some(s"""
      WITH $shinglesSql,
      ids AS (SELECT DISTINCT doc_id, ${md5IdSql("shingle")} AS sid FROM sh),
      sig AS (SELECT doc_id,
               ${(0 until K).map(k =>
                 s"min((sid * ${aK(k)} + ${bK(k)}) % $P) AS h$k")
                 .mkString(",\n               ")}
              FROM ids GROUP BY doc_id),
      bands AS (
        ${(0 until Bands).map(j =>
          s"SELECT doc_id, $j AS band, h${2 * j} * 2147483648 + h${2 * j + 1} AS bv FROM sig")
          .mkString("\n        UNION ALL ")}),
      corp_bands AS (SELECT doc_id, band, bv FROM bands WHERE doc_id % 5 <> 0),
      ok AS (SELECT band, bv FROM corp_bands GROUP BY band, bv
             HAVING count(*) <= $MaxBucket),
      cand AS (
        SELECT DISTINCT f.doc_id AS new_id, c.doc_id AS old_id
        FROM bands f
        JOIN corp_bands c ON f.band = c.band AND f.bv = c.bv
        JOIN ok o ON o.band = f.band AND o.bv = f.bv
        WHERE f.doc_id % 5 = 0),
      cnt AS (SELECT doc_id, count(*) AS n FROM ids GROUP BY 1),
      inter AS (
        SELECT new_id, old_id, count(*) AS ni
        FROM cand
        JOIN ids a ON a.doc_id = new_id
        JOIN ids b ON b.doc_id = old_id AND a.sid = b.sid
        GROUP BY 1, 2),
      near AS (
        SELECT new_id, old_id
        FROM inter
        JOIN cnt ca ON new_id = ca.doc_id
        JOIN cnt cb ON old_id = cb.doc_id
        WHERE round(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE), 6)
              >= 0.5),
      nearagg AS (SELECT new_id, count(*) AS n_near,
                         min(old_id) AS near_min_old
                  FROM near GROUP BY 1),
      ex AS (
        SELECT DISTINCT f.doc_id
        FROM documents f JOIN documents c
          ON md5(f.text) = md5(c.text) AND f.n_chars = c.n_chars
        WHERE f.doc_id % 5 = 0 AND c.doc_id % 5 <> 0)
      SELECT d.doc_id,
             CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                  WHEN a.new_id IS NOT NULL THEN 'near'
                  ELSE 'new' END AS verdict,
             CAST(COALESCE(a.n_near, 0) AS BIGINT) AS n_near,
             CAST(COALESCE(a.near_min_old, -1) AS BIGINT) AS near_min_old
      FROM documents d
      LEFT JOIN ex e ON e.doc_id = d.doc_id
      LEFT JOIN nearagg a ON a.new_id = d.doc_id
      WHERE d.doc_id % 5 = 0
      ORDER BY d.doc_id"""))

  // --------------------------------------------------------------- q213
  // The curation FUNNEL — the operators composed into the pipeline they
  // exist for, as ONE declarative plan: raw corpus → language filter →
  // length-quality cut → near-dup cluster pruning (MinHash pairs
  // restricted to the surviving subgraph, connected components, keep the
  // min-id representative) → eval-set 5-gram decontamination → packed
  // 512-token training bins. Per q212's lesson, the funnel is NOT a
  // union of per-stage re-aggregations: every stage becomes a boolean
  // FLAG on one annotated frame (each flag implies its predecessor), a
  // single fused aggregate produces every stage's (docs, tokens) pair,
  // and stack() unpivots the one metrics row into the report. The two
  // genuinely non-row-local inputs — cluster reps and contaminated ids —
  // are computed once and localCheckpointed before annotation (each
  // embeds a corpus pass by construction; the checkpoint keeps it to
  // exactly one). Eval docs need no special-casing in training: an eval
  // doc that reaches the decon stage shares its own 5-grams and drops
  // itself. At 100 TB every stage is a shape already proven on this
  // board: q40's filter, q41's cut, q32+q35+q109's prune, q105's
  // broadcast-membership decon, q106's packing arithmetic.
  private val q213 = QueryDef(
    "q213_curation_funnel",
    (s, d) => {
      val raw = docs(s, d).select(col("doc_id"), col("lang"), col("source"),
        col("text"), size(split(col("text"), " ")).cast("long").as("ntok"))
      // stage-3 survivors (lang + length-quality), ids only
      val s3ids = raw.filter(col("lang") === "en" &&
        col("ntok").between(20, 95)).select(col("doc_id"))
      // near-dup components over the SURVIVING subgraph: corpus pairs
      // restricted to edges with both endpoints alive, so a cluster
      // whose min member was filtered upstream still keeps its best
      // surviving member (restricting edges, not re-labeling, is what
      // makes that work)
      val within = minhashPairs(s, d).select(col("da"), col("db"))
        .join(s3ids.withColumnRenamed("doc_id", "da"), "da")
        .join(s3ids.withColumnRenamed("doc_id", "db"), "db")
      val comps = connectedComponents(within).localCheckpoint()
      // eval split + contaminated survivors, one gram pass each side
      def grams5(df: DataFrame): DataFrame = df
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 5), i -> concat_ws(' '," +
            " toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))"))
          .as("gram"))
      val evalGrams = grams5(raw.filter(col("doc_id") % 50 === 3))
        .select(col("gram")).distinct()
      val contaminated = grams5(raw)
        .join(broadcast(evalGrams), Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct().localCheckpoint()
      // one annotated frame; each flag implies its predecessor
      val ann = raw
        .join(comps, raw("doc_id") === comps("id"), "left")
        .join(contaminated.withColumn("bad", lit(true)),
          Seq("doc_id"), "left")
        .withColumn("f2", col("lang") === "en")
        .withColumn("f3", col("f2") && col("ntok").between(20, 95))
        .withColumn("f4", col("f3") &&
          coalesce(col("comp"), col("doc_id")) === col("doc_id"))
        .withColumn("f5", col("f4") && col("bad").isNull)
      def cnt(f: String) = sum(when(col(f), 1L).otherwise(0L))
      def tok(f: String) = sum(when(col(f), col("ntok")).otherwise(0L))
      val one = ann.agg(
        count(lit(1)).as("n1"), sum(col("ntok")).as("t1"),
        cnt("f2").as("n2"), tok("f2").as("t2"),
        cnt("f3").as("n3"), tok("f3").as("t3"),
        cnt("f4").as("n4"), tok("f4").as("t4"),
        cnt("f5").as("n5"), tok("f5").as("t5"))
      val bins = ann.filter(col("f5"))
        .groupBy(col("source")).agg(sum(col("ntok")).as("t"))
        .agg(sum(expr("(t + 511) DIV 512")).as("n_bins"))
      one.crossJoin(broadcast(bins))
        .select(expr("""stack(6,
            1, 'raw',            n1, t1, 0L,
            2, 'lang_en',        n2, t2, 0L,
            3, 'quality_len',    n3, t3, 0L,
            4, 'near_dedup',     n4, t4, 0L,
            5, 'decontaminated', n5, t5, 0L,
            6, 'packed',         n5, t5, n_bins
          ) AS (stage, name, n_docs, n_tokens, n_bins)"""))
        .orderBy(col("stage"))
    },
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      raw AS (SELECT doc_id, lang, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
                     text
              FROM documents),
      s3 AS (SELECT doc_id FROM raw
             WHERE lang = 'en' AND ntok BETWEEN 20 AND 95),
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
          JOIN s3 a ON a.doc_id = da JOIN s3 b ON b.doc_id = db
        UNION ALL
        SELECT db, da FROM mh_pairs
          JOIN s3 a ON a.doc_id = da JOIN s3 b ON b.doc_id = db),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp_id FROM reach GROUP BY id),
      g5 AS (
        SELECT doc_id, unnest(
          CASE WHEN len(toks) >= 5
               THEN list_transform(range(1, len(toks) - 3),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                      || ' ' || toks[i+3] || ' ' || toks[i+4])
               ELSE [] END) AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
      evg AS (SELECT DISTINCT gram FROM g5 WHERE doc_id % 50 = 3),
      contaminated AS (
        SELECT DISTINCT g5.doc_id FROM g5 JOIN evg USING (gram)),
      -- MATERIALIZED: ann is consumed by two aggregates and the report
      -- rows; inlined it would re-run the recursive closure and the
      -- gram join once per consumer (the q212 trap, SQL edition)
      ann AS MATERIALIZED (
        SELECT r.doc_id, r.source, r.ntok,
               (r.lang = 'en') AS f2,
               (r.lang = 'en' AND r.ntok BETWEEN 20 AND 95) AS f3,
               (r.lang = 'en' AND r.ntok BETWEEN 20 AND 95
                AND coalesce(c.comp_id, r.doc_id) = r.doc_id) AS f4,
               (r.lang = 'en' AND r.ntok BETWEEN 20 AND 95
                AND coalesce(c.comp_id, r.doc_id) = r.doc_id
                AND x.doc_id IS NULL) AS f5
        FROM raw r
        LEFT JOIN comp c ON c.id = r.doc_id
        LEFT JOIN contaminated x ON x.doc_id = r.doc_id),
      one AS (
        SELECT count(*) AS n1, CAST(sum(ntok) AS BIGINT) AS t1,
               CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN f2 THEN ntok ELSE 0 END) AS BIGINT) AS t2,
               CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(sum(CASE WHEN f3 THEN ntok ELSE 0 END) AS BIGINT) AS t3,
               CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
               CAST(sum(CASE WHEN f4 THEN ntok ELSE 0 END) AS BIGINT) AS t4,
               CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
               CAST(sum(CASE WHEN f5 THEN ntok ELSE 0 END) AS BIGINT) AS t5
        FROM ann),
      bins AS (
        SELECT CAST(sum((t + 511) // 512) AS BIGINT) AS n_bins
        FROM (SELECT source, sum(ntok) AS t FROM ann
              WHERE f5 GROUP BY source)),
      m AS (SELECT * FROM one CROSS JOIN bins)
      SELECT s.stage, s.name,
             CASE s.stage WHEN 1 THEN n1 WHEN 2 THEN n2 WHEN 3 THEN n3
                          WHEN 4 THEN n4 ELSE n5 END AS n_docs,
             CASE s.stage WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
                          WHEN 4 THEN t4 ELSE t5 END AS n_tokens,
             CASE WHEN s.stage = 6 THEN n_bins
                  ELSE CAST(0 AS BIGINT) END AS n_bins
      FROM m, (VALUES (1, 'raw'), (2, 'lang_en'), (3, 'quality_len'),
                      (4, 'near_dedup'), (5, 'decontaminated'),
                      (6, 'packed')) AS s(stage, name)
      ORDER BY s.stage"""))

  // --------------------------------------------------------------- q258
  // MinHash-LSH RECALL evaluation against exact ground truth ([EXT]) —
  // the sketch-quality observability the similarity family already has
  // for ANN (q51/q194 recall) applied to the DEDUP sketch: q31's
  // prefix-filtered pipeline is LOSSLESS at the 0.5 threshold, so its
  // same-lang pair set IS exact ground truth; q32's banded MinHash is
  // probabilistic (a pair is found only if some band collides). The
  // query reports measured recall |found ∩ truth| / |truth| NEXT TO the
  // banding theory's expected recall E[1 − (1−j²)^8] over the same true
  // pairs (K=16, 8 bands × 2 rows) — measured ≈ theory is the evidence
  // that the signature pipeline is healthy; a gap means broken hashing
  // or hot-bucket capping bit real duplicates. n_extra counts verified
  // mh pairs outside the same-lang truth (cross-lang near-dups q31's
  // lang blocking excludes by design).
  //
  // Cost/scale: this runs BOTH pipelines (the price of an eval op — at
  // 100 TB you run it on a sampled slice, the estimator is unbiased per
  // pair); each pipeline keeps its own scale shape (bucketed candidates,
  // no all-pairs). The theory term is libm-free: (1−j²)^8 by explicit
  // squaring chain, quantized to 1e-9 pre-avg (q243 discipline).
  private val q258 = QueryDef(
    "q258_lsh_recall_eval",
    (s, d) => {
      val mh = minhashPairs(s, d).select(col("da"), col("db"))
        .withColumn("found", lit(1L))
      val truth = q31.fn(s, d)
        .select(col("da"), col("db"), col("jac"))
      val j = truth.join(mh, Seq("da", "db"), "left")
        .withColumn("f", coalesce(col("found"), lit(0L)))
        .withColumn("y", lit(1.0d) - col("jac") * col("jac"))
        .withColumn("y2", col("y") * col("y"))
        .withColumn("y4", col("y2") * col("y2"))
        .withColumn("p9",
          round(lit(1e9) * (lit(1.0d) - col("y4") * col("y4")))
            .cast("long"))
      val base = j.agg(count(lit(1)).as("n_true"),
        sum(col("f")).as("n_found"), sum(col("p9")).as("sp"))
      val extra = mh.join(truth.select(col("da"), col("db")),
          Seq("da", "db"), "left_anti")
        .agg(count(lit(1)).as("n_extra"))
      base.crossJoin(broadcast(extra))
        .select(col("n_true"), col("n_found"),
          round(col("n_found").cast("double") /
            col("n_true").cast("double"), 6).as("recall"),
          round(col("sp").cast("double") /
            col("n_true").cast("double") / lit(1e9), 6)
            .as("theory_recall"),
          col("n_extra"))
    },
    Some(s"""
      WITH $minhashCtes,
      tshid AS (
        SELECT DISTINCT doc_id, lang, ${md5IdSql("shingle")} AS shingle
        FROM sh),
      tcnt AS (SELECT doc_id, count(*) AS n FROM tshid GROUP BY 1),
      tinter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        FROM tshid a JOIN tshid b
          ON a.shingle = b.shingle AND a.lang = b.lang
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      truth AS (
        SELECT da, db,
               round(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE),
                 6) AS jac
        FROM tinter
        JOIN tcnt ca ON da = ca.doc_id
        JOIN tcnt cb ON db = cb.doc_id
        WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.5),
      joined AS (
        SELECT t.jac,
               CASE WHEN m.da IS NOT NULL THEN 1 ELSE 0 END AS f,
               CAST(round(1e9 * (1.0 -
                 ((1.0 - t.jac * t.jac) * (1.0 - t.jac * t.jac))
                 * ((1.0 - t.jac * t.jac) * (1.0 - t.jac * t.jac))
                 * (((1.0 - t.jac * t.jac) * (1.0 - t.jac * t.jac))
                 * ((1.0 - t.jac * t.jac) * (1.0 - t.jac * t.jac)))))
                 AS BIGINT) AS p9
        FROM truth t LEFT JOIN mh_pairs m
          ON t.da = m.da AND t.db = m.db),
      base AS (
        SELECT count(*) AS n_true, CAST(sum(f) AS BIGINT) AS n_found,
               CAST(sum(p9) AS BIGINT) AS sp
        FROM joined),
      extra AS (
        SELECT count(*) AS n_extra
        FROM mh_pairs m LEFT JOIN truth t
          ON t.da = m.da AND t.db = m.db
        WHERE t.da IS NULL)
      SELECT n_true, n_found,
             round(CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
               AS recall,
             round(CAST(sp AS DOUBLE) / CAST(n_true AS DOUBLE) / 1e9, 6)
               AS theory_recall,
             n_extra
      FROM base, extra"""))

  // --------------------------------------------------------------- q270
  // CONTENT-DEFINED chunking dedup ([EXT], the CDC/rsync/restic idea
  // applied to text): q122's passage dedup cuts FIXED 10-token windows,
  // so inserting one token near the top of a copied document shifts
  // every later window boundary and the copy stops deduplicating. CDC
  // cuts where the CONTENT says so — a chunk ends after any token whose
  // content hash ≡ 0 mod 16 (expected chunk ≈ 16 tokens) — so identical
  // passages chunk identically no matter where they sit in the host
  // document: the shift-resistant form of passage-level dedup. The
  // report: global chunk count, distinct chunks, the duplicated-token
  // mass (what chunk-level dedup would save), and mean chunk length.
  //
  // Scale: the boundary flag is a pure per-token projection (house md5
  // idiom); chunk ids are a PER-DOC running sum (window partitioned by
  // doc_id — partitions are document-sized, never corpus-sized); chunk
  // text re-assembles in the same doc-keyed aggregate (listagg WITHIN
  // GROUP, q217's idiom) and is immediately reduced to md5+len (q30's
  // hash-first contract) — the only global exchange carries ~50-byte
  // chunk-identity rows into one map-side-combined aggregate.
  /** CDC chunk identities for any (doc_id, text) frame: per-doc
    * content-defined chunks reduced to (doc_id, n_toks, h, clen) —
    * package-visible so DedupSpec can plant a shifted copy and pin the
    * shift-resistance claim the scaladoc makes. */
  private[graft] def cdcChunks(d0: DataFrame): DataFrame = {
    val tok = d0
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("w"))
      .withColumn("b",
        (expr("CAST(conv(substr(md5(concat('cdc:', w)), 1, 8), 16, 10)" +
          " AS BIGINT)") % 16L === 0L).cast("long"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    tok
      .withColumn("chunk", coalesce(sum(col("b")).over(wDoc), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("n_toks"),
        expr("listagg(w, ' ') WITHIN GROUP (ORDER BY pos)").as("ctext"))
      .select(col("doc_id"), col("n_toks"),
        md5(col("ctext").cast("binary")).as("h"),
        length(col("ctext")).as("clen"))
  }

  private val q270 = QueryDef(
    "q270_cdc_chunk_dedup",
    (s, d) => {
      val chunks = cdcChunks(docs(s, d))
      val perChunk = chunks.groupBy(col("h"), col("clen"))
        .agg(count(lit(1)).as("occ"), max(col("n_toks")).as("n_toks"))
      perChunk.agg(
          sum(col("occ")).as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          sum(col("occ") * col("n_toks")).as("toks_total"),
          sum((col("occ") - 1L) * col("n_toks")).as("toks_dup"))
        .select(col("n_chunks"), col("n_distinct"),
          col("toks_total"), col("toks_dup"),
          round(col("toks_dup").cast("double") /
            col("toks_total").cast("double"), 6).as("dup_ratio"),
          round(col("toks_total").cast("double") /
            col("n_chunks").cast("double"), 6).as("mean_chunk_toks"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS w
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
        LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u),
      b AS (
        SELECT doc_id, pos, w,
               CASE WHEN ('0x' || substr(md5('cdc:' || w), 1, 8))::BIGINT
                 % 16 = 0 THEN 1 ELSE 0 END AS b
        FROM tok),
      ch AS (
        SELECT doc_id, pos, w,
               coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS chunk
        FROM b),
      chunks AS (
        SELECT count(*) AS n_toks,
               md5(string_agg(w, ' ' ORDER BY pos)) AS h,
               length(string_agg(w, ' ' ORDER BY pos)) AS clen
        FROM ch GROUP BY doc_id, chunk),
      pc AS (
        SELECT h, clen, count(*) AS occ,
               CAST(max(n_toks) AS BIGINT) AS n_toks
        FROM chunks GROUP BY h, clen)
      SELECT CAST(sum(occ) AS BIGINT) AS n_chunks,
             count(*) AS n_distinct,
             CAST(sum(occ * n_toks) AS BIGINT) AS toks_total,
             CAST(sum((occ - 1) * n_toks) AS BIGINT) AS toks_dup,
             round(CAST(sum((occ - 1) * n_toks) AS DOUBLE)
               / CAST(sum(occ * n_toks) AS DOUBLE), 6) AS dup_ratio,
             round(CAST(sum(occ * n_toks) AS DOUBLE)
               / CAST(sum(occ) AS DOUBLE), 6) AS mean_chunk_toks
      FROM pc"""))

  // --------------------------------------------------------------- q247
  // Canonicalized ("fuzzy-exact") dedup ([EXT]) — the cheap middle rung
  // between q30's byte-exact dedup and q32's MinHash: normalize text to
  // a canonical form (lowercase, strip non-alphanumerics, collapse runs
  // of spaces, trim) and dedup on the HASH of that form. Catches the
  // case-diff / punctuation-diff / whitespace-diff near-copies that
  // dominate real crawl duplicates at a per-row projection's cost — the
  // C4/RefinedWeb first pass that runs BEFORE any LSH machinery. The
  // report: per source, raw-distinct vs canonical-distinct counts — the
  // gain column is exactly how many duplicates normalization alone
  // exposes, i.e. the evidence for whether the corpus even needs the
  // q32 pass.
  //
  // Normalization is regex on the guaranteed-common subset (character
  // class + space; Java regex and RE2 agree). Identity is md5(canon) +
  // length(canon) — q30's hash-first contract: the text is projected
  // away BEFORE any exchange, the shuffle moves ~50-byte rows. The two
  // distinct counts are two SEPARATE map-side-combinable aggregates
  // joined on source (q38's lesson: two countDistincts in one groupBy
  // plan a double distinct-expand over the corpus), and the join is a
  // |sources|-row broadcast.
  private val q247 = QueryDef(
    "q247_dedup_canonical",
    (s, d) => {
      val base = Tables.t(s, d, "documents").select(col("source"),
        md5(col("text").cast("binary")).as("hr"),
        length(col("text")).as("lr"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "),
          " +", " ")).as("canon"))
        .select(col("source"), col("hr"), col("lr"),
          md5(col("canon").cast("binary")).as("hc"),
          length(col("canon")).as("lc"))
      val raw = base.select(col("source"), col("hr"), col("lr")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("n_raw_distinct"))
      val can = base.select(col("source"), col("hc"), col("lc")).distinct()
        .groupBy(col("source")).agg(count(lit(1)).as("n_canon_distinct"))
      val n = base.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      n.join(broadcast(raw), Seq("source"))
        .join(broadcast(can), Seq("source"))
        .select(col("source"), col("n_docs"), col("n_raw_distinct"),
          col("n_canon_distinct"),
          (col("n_raw_distinct") - col("n_canon_distinct"))
            .as("canon_gain"))
        .orderBy(col("source"))
    },
    Some("""
      WITH base AS (
        SELECT source, md5(text) AS hr, length(text) AS lr,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'))) AS hc,
               length(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'))) AS lc
        FROM documents),
      raw AS (
        SELECT source, count(*) AS n_raw_distinct FROM (
          SELECT DISTINCT source, hr, lr FROM base) GROUP BY source),
      can AS (
        SELECT source, count(*) AS n_canon_distinct FROM (
          SELECT DISTINCT source, hc, lc FROM base) GROUP BY source),
      n AS (SELECT source, count(*) AS n_docs FROM base GROUP BY source)
      SELECT source, n_docs, n_raw_distinct, n_canon_distinct,
             n_raw_distinct - n_canon_distinct AS canon_gain
      FROM n JOIN raw USING (source) JOIN can USING (source)
      ORDER BY source"""))

  // --------------------------------------------------------------- q299
  // Dedup-index retraction ([EXT], the take-down path): q100 maintains
  // the dedup index under ADDS; this maintains it under DELETES — the
  // GDPR/take-down batch (doc_id % 6 = 3) retracts documents, and
  // every exact-dup cluster that contained one must re-elect its
  // representative among the survivors (or report itself deleted).
  // The % 6 batch straddles planted dup pairs at sf0.1, so all three
  // statuses fire there; sf0.01 holds no multi-member exact clusters
  // at all (its planted dups are near-dups only), so every affected
  // cluster there is a deleted singleton — a property of the corpus,
  // verified, not of the operator.
  // The output is the per-affected-cluster maintenance record: member
  // and retraction counts, old vs new representative, and the change
  // class — 'rep_changed' rows are where a naive "just delete the
  // rows" pipeline silently serves a retracted doc as the canonical
  // copy.
  //
  // Scale: the point IS the plan shape — the retraction batch's
  // cluster keys are CDC-batch-sized and BROADCAST; the corpus is
  // probed by ONE left-semi join on the content hash, so re-election
  // touches only affected clusters' members, never the index. Identity
  // is q30's hash-first contract (md5+length projected before any
  // exchange). min-based re-election is associative, so the same
  // aggregate merges map-side at any scale.
  private val q299 = QueryDef(
    "q299_dedup_retraction",
    (s, d) => {
      val base = Tables.t(s, d, "documents").select(col("doc_id"),
        concat(md5(col("text").cast("binary")), lit(":"),
          length(col("text")).cast("string")).as("h"),
        (col("doc_id") % 6L === 3L).as("retr"))
      val batch = base.filter(col("retr")).select(col("h")).distinct()
      base.join(broadcast(batch), Seq("h"), "left_semi")
        .groupBy(col("h"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("retr"), 1L).otherwise(0L)).as("n_retracted"),
          min(col("doc_id")).as("old_rep"),
          coalesce(min(when(!col("retr"), col("doc_id"))), lit(-1L))
            .as("new_rep"))
        .withColumn("status",
          when(col("new_rep") === -1L, "cluster_deleted")
            .when(col("new_rep") =!= col("old_rep"), "rep_changed")
            .otherwise("rep_unchanged"))
        .orderBy(col("h"))
    },
    Some("""
      WITH base AS (
        SELECT doc_id,
               md5(text) || ':' || CAST(length(text) AS VARCHAR) AS h,
               (doc_id % 6 = 3) AS retr
        FROM documents),
      batch AS (SELECT DISTINCT h FROM base WHERE retr)
      SELECT b.h, count(*) AS n_members,
             CAST(sum(CASE WHEN b.retr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retracted,
             min(b.doc_id) AS old_rep,
             COALESCE(min(CASE WHEN NOT b.retr THEN b.doc_id END), -1)
               AS new_rep,
             CASE WHEN COALESCE(min(CASE WHEN NOT b.retr
                          THEN b.doc_id END), -1) = -1
                    THEN 'cluster_deleted'
                  WHEN COALESCE(min(CASE WHEN NOT b.retr
                          THEN b.doc_id END), -1) <> min(b.doc_id)
                    THEN 'rep_changed'
                  ELSE 'rep_unchanged' END AS status
      FROM base b
      WHERE b.h IN (SELECT h FROM batch)
      GROUP BY b.h
      ORDER BY b.h"""))

  // --------------------------------------------------------------- q277
  // Cross-lingual near-duplicate recovery ([EXT]) — the pairs a
  // lang-blocked dedup pipeline structurally MISSES. q31 blocks shingle
  // buckets by (lang, shingle) — the standard per-language sharding that
  // keeps buckets small — so a translated/transliterated duplicate pair
  // never meets; q32's MinHash banding is language-agnostic and q258's
  // recall eval measured its `n_extra` (verified pairs outside same-lang
  // truth) at 177 pairs on sf0.1 — real mass, invisible to the blocked
  // pipeline. This operator materializes exactly those pairs as a
  // first-class report: verified cross-lang near-dups (exact trigram
  // Jaccard ≥ 0.5 via the house [[jacRaw]] threshold) CORROBORATED by the
  // embedding channel — each pair carries the exact cosine of its two
  // document embeddings (vec_id ≡ doc_id in the driver corpus), the
  // multimodal cross-check a curation pipeline uses to triage whether a
  // cross-lang match is a true translation (high cos) or a shingle
  // coincidence (low cos).
  //
  // Scale: minhashPairs is the bucketed LSH pipeline (no all-pairs); the
  // lang/embedding attachments are id-keyed equi-joins — pair-table-sized
  // probes against corpus-keyed tables, nothing quadratic. The dot
  // product is the codegen'd FloatDot over the pair table only.
  private val q277 = QueryDef(
    "q277_crosslingual_near_dup",
    (s, d) => {
      val dmeta = docs(s, d).select(col("doc_id"), col("lang"))
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
        .withColumn("nrm", float_norm(col("embedding")))
      minhashPairs(s, d)
        .join(dmeta.select(col("doc_id").as("da"), col("lang").as("lang_a")),
          "da")
        .join(dmeta.select(col("doc_id").as("db"), col("lang").as("lang_b")),
          "db")
        .filter(col("lang_a") =!= col("lang_b"))
        .join(e.select(col("vec_id").as("da"), col("embedding").as("ea"),
          col("nrm").as("na")), "da")
        .join(e.select(col("vec_id").as("db"), col("embedding").as("eb"),
          col("nrm").as("nb")), "db")
        .select(col("da"), col("db"), col("lang_a"), col("lang_b"),
          col("jac"),
          Num.roundZ(float_dot(col("ea"), col("eb")) /
            (col("na") * col("nb")), 6).as("emb_cos"))
        .orderBy(col("da"), col("db"))
    },
    Some(s"""
      WITH $minhashCtes,
      vev AS (
        SELECT vec_id,
               unnest(range(1, len(embedding) + 1)) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      vnorms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM vev GROUP BY 1),
      xp AS (
        SELECT p.da, p.db, xa.lang AS lang_a, xb.lang AS lang_b, p.jac
        FROM mh_pairs p
        JOIN documents xa ON xa.doc_id = p.da
        JOIN documents xb ON xb.doc_id = p.db
        WHERE xa.lang <> xb.lang),
      dots AS (
        SELECT xp.da, xp.db, sum(a.v * b.v) AS dot
        FROM xp
        JOIN vev a ON a.vec_id = xp.da
        JOIN vev b ON b.vec_id = xp.db AND a.i = b.i
        GROUP BY 1, 2)
      SELECT xp.da, xp.db, xp.lang_a, xp.lang_b, xp.jac,
             (CAST(round((dt.dot / (na.nrm * nb.nrm)) * 1e6) AS BIGINT) / 1e6)
               AS emb_cos
      FROM xp
      JOIN dots dt ON dt.da = xp.da AND dt.db = xp.db
      JOIN vnorms na ON na.vec_id = xp.da
      JOIN vnorms nb ON nb.vec_id = xp.db
      ORDER BY xp.da, xp.db"""))

  // --------------------------------------------------------------- q281
  // LSH band-collision provenance ([EXT]) — per verified q32 pair, HOW
  // the pair met: the number of its 8 bands whose (2-row) values agree,
  // next to the banding theory's expectation 8·jac² (P[band match] = jac²
  // for 2-row MinHash bands). The tuning observability a dedup operator
  // reads before changing band geometry: pairs found on exactly one band
  // with jac near threshold are the recall cliff — fewer bands or wider
  // rows would lose them first; q258 measures aggregate recall, this
  // explains it pair by pair.
  //
  // Scale: the band table is 8 fixed rows per doc (corpus-linear); the
  // provenance join probes it with the PAIR table on (doc, band) equi-
  // keys — nothing quadratic. Like q258, the query re-derives the
  // signature table beside minhashPairs' own (the price of an eval op).
  private val q281 = QueryDef(
    "q281_lsh_band_provenance",
    (s, d) => {
      val sh = rawShinglesOf(docs(s, d))
        .select(col("doc_id"), md5Id(col("shingle")).as("sid")).distinct()
      val sigCols = (0 until K).map(k =>
        min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k"))
      val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        .localCheckpoint()
      val bandExprs = (0 until Bands).map(j =>
        s"struct(${j}L as band, h${2 * j} * 2147483648L + h${2 * j + 1} as bv)")
      val bands = sig
        .select(col("doc_id"), explode(array(bandExprs.map(expr): _*)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bv").as("bv"))
      val pairs = minhashPairs(s, d)
      val bm = pairs.select(col("da"), col("db"))
        .join(bands.select(col("doc_id").as("da"), col("band"),
          col("bv").as("bva")), "da")
        .join(bands.select(col("doc_id").as("db"), col("band"),
          col("bv").as("bvb")), Seq("db", "band"))
        .filter(col("bva") === col("bvb"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("n_bands_equal"))
      pairs.join(bm, Seq("da", "db"), "left")
        .select(col("da"), col("db"), col("jac"),
          coalesce(col("n_bands_equal"), lit(0L)).as("n_bands_equal"),
          round(lit(8.0) * col("jac") * col("jac"), 6).as("exp_bands"))
        .orderBy(col("da"), col("db"))
    },
    Some(s"""
      WITH $minhashCtes,
      bm AS (
        SELECT p.da, p.db, count(*) AS n_bands_equal
        FROM mh_pairs p
        JOIN bands xa ON xa.doc_id = p.da
        JOIN bands xb ON xb.doc_id = p.db
          AND xb.band = xa.band AND xb.bv = xa.bv
        GROUP BY 1, 2)
      SELECT p.da, p.db, p.jac,
             CAST(coalesce(bm.n_bands_equal, 0) AS BIGINT) AS n_bands_equal,
             round(8.0 * p.jac * p.jac, 6) AS exp_bands
      FROM mh_pairs p
      LEFT JOIN bm ON bm.da = p.da AND bm.db = p.db
      ORDER BY p.da, p.db"""))

  // --------------------------------------------------------------- q282
  // Duplicate-cluster COHESION audit ([EXT]) — per q35 component: size,
  // verified-edge count, edge density 2E/(n(n−1)), and the min/mean
  // verified Jaccard. This is the chaining-risk report: transitive
  // closure happily merges A~B~C into {A,B,C} even when jac(A,C) is far
  // below threshold, and a low-density low-min-jac cluster is exactly a
  // chain — the case where q109's keep-one-per-cluster policy starts
  // deleting non-duplicates. Production pipelines gate cluster collapse
  // on this audit (dense tight clusters collapse; loose chains get
  // re-verified or split).
  //
  // Scale: clusters and their edges are duplicate-graph-sized, never
  // corpus-sized; one groupBy(comp) over each. Mean jac follows the
  // house exact-sum form (jac is a round(·,6) value, so 1e6·jac sums as
  // exact BIGINTs).
  private val q282 = QueryDef(
    "q282_dedup_cluster_cohesion",
    (s, d) => {
      val pairs = minhashPairs(s, d).localCheckpoint()
      val comp = connectedComponents(pairs.select(col("da"), col("db")))
      val edges = pairs
        .join(comp.select(col("id").as("da"), col("comp")), "da")
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_edges"),
          min(col("jac")).as("min_jac"),
          sum(round(col("jac") * lit(1e6)).cast("long")).as("sj"))
      comp.groupBy(col("comp")).agg(count(lit(1)).as("n_docs"))
        .join(edges, "comp")
        .select(col("comp").as("comp_id"), col("n_docs"), col("n_edges"),
          round((lit(2L) * col("n_edges")).cast("double") /
            (col("n_docs") * (col("n_docs") - 1L)).cast("double"), 6)
            .as("density"),
          col("min_jac"),
          round(col("sj").cast("double") / lit(1e6) /
            col("n_edges").cast("double"), 6).as("mean_jac"))
        .orderBy(col("comp_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
        UNION ALL
        SELECT db, da FROM mh_pairs),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp_id FROM reach GROUP BY id),
      csize AS (SELECT comp_id, count(*) AS n_docs FROM comp GROUP BY 1),
      cedges AS (
        SELECT c.comp_id, count(*) AS n_edges,
               min(p.jac) AS min_jac,
               CAST(sum(CAST(round(p.jac * 1e6) AS BIGINT)) AS BIGINT) AS sj
        FROM mh_pairs p JOIN comp c ON c.id = p.da
        GROUP BY 1)
      SELECT s.comp_id, s.n_docs, e.n_edges,
             round(CAST(2 * e.n_edges AS DOUBLE)
                   / CAST(s.n_docs * (s.n_docs - 1) AS DOUBLE), 6) AS density,
             e.min_jac,
             round(CAST(e.sj AS DOUBLE) / 1e6 / CAST(e.n_edges AS DOUBLE), 6)
               AS mean_jac
      FROM csize s JOIN cedges e USING (comp_id)
      ORDER BY s.comp_id"""))

  // --------------------------------------------------------------- q331
  // LSH bucket-occupancy census ([EXT] dedup observability, beside
  // q281's per-pair band provenance and q258's recall eval) — the
  // capacity audit behind the MaxBucket = 64 hot-bucket cap: per band,
  // the bucket-size distribution (buckets, pair-generating buckets,
  // capped buckets, max occupancy) and the PAIR MASS the cap actually
  // drops (Σ C(sz,2) above the cap vs kept below it). This is the
  // number that justifies — or re-sizes — the cap before a production
  // dedup run: a band with meaningful dropped_share needs more bands
  // or a bigger cap; zero dropped share means the cap is free.
  //
  // Scale: the signature build is q32's one corpus pass (map-side
  // int64 shingle ids, 16-minhash aggregate, NO per-doc set needed
  // here); the census is a (band, bucket) count aggregate and an
  // 8-row per-band rollup — bucket counts only, no pair is ever
  // generated, so the census is CHEAPER than the dedup it audits.
  //
  // Exactness: all counts and C(sz,2) masses are exact integers;
  // dropped_share is one division guarded symmetrically (when > 0 /
  // NULLIF) so a pairless band is NULL in both engines; roundZ final.
  private val q331 = QueryDef(
    "q331_lsh_bucket_census",
    (s, d) => {
      val sh = rawShinglesOf(docs(s, d))
        .select(col("doc_id"), md5Id(col("shingle")).as("sid"))
        .distinct()
      val sigCols = (0 until K).map(k =>
        min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k"))
      val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      val bandExprs = (0 until Bands).map(j =>
        s"struct(${j}L as band, h${2 * j} * 2147483648L + h${2 * j + 1} as bv)")
      val bs = sig
        .select(col("doc_id"), explode(array(bandExprs.map(expr): _*)).as("b"))
        .groupBy(col("b.band"), col("b.bv"))
        .agg(count(lit(1)).as("sz"))
      bs.groupBy(col("band"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("sz") >= 2L, 1L).otherwise(0L)).as("n_pairing"),
          sum(when(col("sz") > MaxBucket, 1L).otherwise(0L)).as("n_capped"),
          max(col("sz")).as("max_size"),
          sum(when(col("sz") >= 2L && col("sz") <= MaxBucket,
            expr("sz * (sz - 1) DIV 2")).otherwise(0L)).as("pairs_kept"),
          sum(when(col("sz") > MaxBucket, expr("sz * (sz - 1) DIV 2"))
            .otherwise(0L)).as("pairs_dropped"))
        .select(col("band"), col("n_buckets"), col("n_pairing"),
          col("n_capped"), col("max_size"), col("pairs_kept"),
          col("pairs_dropped"),
          Num.roundZ(when(col("pairs_kept") + col("pairs_dropped") > 0L,
            col("pairs_dropped").cast("double")
              / (col("pairs_kept") + col("pairs_dropped")).cast("double")),
            6).as("dropped_share"))
        .orderBy(col("band"))
    },
    Some(s"""
      WITH $minhashCtes,
      bs AS (SELECT band, bv, count(*) AS sz FROM bands GROUP BY 1, 2),
      census AS (
        SELECT band, count(*) AS n_buckets,
               CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pairing,
               CAST(sum(CASE WHEN sz > $MaxBucket THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_capped,
               CAST(max(sz) AS BIGINT) AS max_size,
               CAST(sum(CASE WHEN sz BETWEEN 2 AND $MaxBucket
                 THEN sz * (sz - 1) // 2 ELSE 0 END) AS BIGINT)
                 AS pairs_kept,
               CAST(sum(CASE WHEN sz > $MaxBucket
                 THEN sz * (sz - 1) // 2 ELSE 0 END) AS BIGINT)
                 AS pairs_dropped
        FROM bs GROUP BY 1)
      SELECT CAST(band AS BIGINT) AS band, n_buckets, n_pairing, n_capped,
             max_size, pairs_kept, pairs_dropped,
             (CAST(round(CAST(pairs_dropped AS DOUBLE)
               / CAST(NULLIF(pairs_kept + pairs_dropped, 0) AS DOUBLE)
               * 1e6) AS BIGINT) / 1e6) AS dropped_share
      FROM census
      ORDER BY band"""))

  // --------------------------------------------------------------- q341
  // STREAMING curation composition ([EXT]): the q48 batch pipeline's
  // first two stages (quality filter → exact dedup) run continuously
  // over the staged document feed — filter n_chars ≥ 100, then a
  // stateful streaming aggregate keyed on (lang, md5(text)) in complete
  // mode, post-processed to per-language unique/duplicate accounting.
  // Beside q210 (near-dup admission vs a static index) this is the
  // WITHIN-STREAM exact-dedup accounting a continuous ingest keeps.
  //
  // Determinism: only KEY-level facts ship (unique key counts, row
  // counts) — never "which duplicate row won", which would depend on
  // intra-batch arrival order. Dedup keys on (lang, content), so a text
  // shared across languages counts once per language in BOTH engines.
  // Scale: state is |unique (lang, text)| keys of ~50 bytes (hash +
  // counter) — the production form puts a TTL/watermark on the key
  // space (q94's shape); the bounded feed here declares complete mode.
  /** Core of q341, parameterized on files-per-trigger so DedupSpec can
    * pin chunking invariance (q210's discipline: per-file micro-batches
    * vs the whole feed in one batch must yield identical accounting —
    * guaranteed here because only KEY-level facts ship). */
  private[graft] def streamCuration(s: SparkSession, d: String,
      filesPerTrigger: Int): DataFrame = {
    val feedDir = stagedDocFeed(s, d)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val sink = s"graft_q341_${java.util.UUID.randomUUID.toString.take(8)}"
    val q = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"))
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(feedDir)
      .filter(col("n_chars") >= 100L)
      .select(col("lang"), md5(col("text").cast("binary")).as("h"))
      .groupBy(col("lang"), col("h")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    ss.table(sink)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_unique"), sum(col("n")).as("n_rows"),
        (sum(col("n")) - count(lit(1))).as("n_dup_rows"))
      .orderBy(col("lang"))
  }

  private val q341 = QueryDef(
    "q341_stream_doc_curation",
    (s, d) => streamCuration(s, d, 1),
    Some("""
      WITH fifth AS (
        SELECT lang, md5(text) AS h
        FROM documents
        WHERE doc_id % 5 = 0 AND n_chars >= 100)
      SELECT lang, count(DISTINCT h) AS n_unique, count(*) AS n_rows,
             CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_dup_rows
      FROM fifth
      GROUP BY lang
      ORDER BY lang"""))

  // --------------------------------------------------------------- q343
  // Golden-record survivorship ([EXT], the MDM step after q109's
  // keep-best): q109 keeps one WHOLE ROW per near-dup cluster; real
  // master-data pipelines instead merge FIELD-BY-FIELD — each attribute
  // takes its own survivorship rule (modal value for categoricals, max
  // for monotone quality fields, min id as the stable record key) and
  // the conflict counts ship as data-quality evidence. Rules here:
  // golden_id = min(doc_id); lang/source = modal value with
  // lexicographic tie-break; n_chars = max; n_lang_conflict /
  // n_source_conflict = distinct values seen.
  //
  // Scale: clusters are duplicate-graph-sized, never corpus-sized; the
  // modal selection runs on (cluster, value) count tables via a rank
  // window whose partitions are single clusters (bounded by MaxBucket
  // upstream). Determinism: modal ties break on the value itself, so
  // no arrival order exists anywhere.
  private val q343 = QueryDef(
    "q343_golden_record",
    (s, d) => {
      val comp = connectedComponents(
        minhashPairs(s, d).select(col("da"), col("db")))
      val members = comp.join(docs(s, d),
          comp("id") === col("doc_id"))
        .select(col("comp"), col("doc_id"), col("lang"), col("source"),
          col("n_chars"))
        .localCheckpoint() // feeds 3 aggregates below
      def modal(field: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("comp"))
          .orderBy(col("cnt").desc, col(field))
        members.groupBy(col("comp"), col(field))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("comp"), col(field).as(s"${field}_modal"))
      }
      members.groupBy(col("comp"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("golden_id"),
          max(col("n_chars")).as("n_chars_max"),
          countDistinct(col("lang")).as("n_lang_values"),
          countDistinct(col("source")).as("n_source_values"))
        .join(modal("lang"), "comp")
        .join(modal("source"), "comp")
        .select(col("comp").as("comp_id"), col("n_docs"), col("golden_id"),
          col("lang_modal"), col("source_modal"), col("n_chars_max"),
          col("n_lang_values"), col("n_source_values"))
        .orderBy(col("comp_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashCtes,
      edges AS (
        SELECT da AS src, db AS dst FROM mh_pairs
        UNION ALL
        SELECT db, da FROM mh_pairs),
      reach(id, comp) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
      members AS (
        SELECT c.comp, d.doc_id, d.lang, d.source, d.n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.id),
      lm AS (
        SELECT comp, lang AS lang_modal FROM (
          SELECT comp, lang,
                 row_number() OVER (PARTITION BY comp
                   ORDER BY count(*) DESC, lang) AS rk
          FROM members GROUP BY comp, lang) t
        WHERE rk = 1),
      sm AS (
        SELECT comp, source AS source_modal FROM (
          SELECT comp, source,
                 row_number() OVER (PARTITION BY comp
                   ORDER BY count(*) DESC, source) AS rk
          FROM members GROUP BY comp, source) t
        WHERE rk = 1)
      SELECT m.comp AS comp_id, count(*) AS n_docs,
             min(m.doc_id) AS golden_id,
             min(lm.lang_modal) AS lang_modal,
             min(sm.source_modal) AS source_modal,
             max(m.n_chars) AS n_chars_max,
             count(DISTINCT m.lang) AS n_lang_values,
             count(DISTINCT m.source) AS n_source_values
      FROM members m
      JOIN lm ON lm.comp = m.comp
      JOIN sm ON sm.comp = m.comp
      GROUP BY m.comp
      ORDER BY comp_id"""))

  // --------------------------------------------------------------- q348
  // Winnowing fingerprint matching (Schleimer–Wilkerson–Aiken, the MOSS
  // algorithm) — the fifth near-dup detector beside shingle-Jaccard
  // (q31), MinHash-LSH (q32), SimHash (q33) and CDC chunking (q270):
  // slide a window of W consecutive 3-gram hashes over each document
  // and keep each window's MINIMUM — the guarantee the others lack is
  // POSITIONAL: any shared run of ≥ W+2 tokens yields at least one
  // shared fingerprint, so partial overlaps (quoted passages, stitched
  // boilerplate) match even when whole-doc signatures diverge. Docs
  // sharing ≥ 5 selected prints are reported with their overlap count.
  //
  // Scale: gram hashes are md5-id 56-bit ints from the first projection
  // (nothing shuffles strings); the rolling min is a per-doc window
  // (doc-partitioned, W-row frame); selected prints collapse to
  // DISTINCT (doc, fp) map-side; pair generation is fp-bucketed with
  // the [[MaxBucket]] hot-bucket cap mirrored in the oracle — a
  // corpus-wide boilerplate fingerprint can never go quadratic. Every
  // step is exact integer arithmetic; counts compare exactly.
  private val WinnowW = 4
  private val q348 = QueryDef(
    "q348_dedup_winnowing",
    (s, d) => {
      val grams = docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3 + WinnowW - 1)
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, size(toks) - 3)")).as("i"))
        .select(col("doc_id"), col("i"),
          md5Id(concat(col("toks")(col("i")), lit("|"),
            col("toks")(col("i") + 1), lit("|"),
            col("toks")(col("i") + 2))).as("g"))
      val wWin = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("i"))
        .rowsBetween(0, WinnowW - 1)
      val prints = grams
        .withColumn("nMore", count(lit(1)).over(wWin))
        .withColumn("fp", min(col("g")).over(wWin))
        .filter(col("nMore") === WinnowW) // full windows only
        .select(col("doc_id"), col("fp")).distinct()
        .localCheckpoint() // feeds the cap census AND both join sides
      // the self-join runs ONLY over capped fingerprints (2..MaxBucket
      // holders): a corpus-wide boilerplate print would otherwise
      // explode the join quadratically, and a unique print contributes
      // no pair — both the candidacy AND the shared-count therefore see
      // exactly the capped print set, mirrored in the oracle
      val okFp = prints.groupBy(col("fp")).agg(count(lit(1)).as("nf"))
        .filter(col("nf") > 1L && col("nf") <= MaxBucket)
        .select(col("fp"))
      val p2 = prints.join(okFp, Seq("fp"), "left_semi")
      p2.select(col("doc_id").as("da"), col("fp"))
        .join(p2.select(col("doc_id").as("db"), col("fp")), Seq("fp"))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5L)
        .orderBy(col("da"), col("db"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      grams AS (
        SELECT doc_id, i,
               ${md5IdSql("toks[i+1] || '|' || toks[i+2] || '|' || toks[i+3]")}
                 AS g
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks) - 2)) AS i
              FROM tok WHERE len(toks) >= ${3 + WinnowW - 1}) t),
      win AS (
        SELECT doc_id,
               min(g) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW
                 AND ${WinnowW - 1} FOLLOWING) AS fp,
               count(*) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW
                 AND ${WinnowW - 1} FOLLOWING) AS nmore
        FROM grams),
      prints AS (
        SELECT DISTINCT doc_id, fp FROM win WHERE nmore = $WinnowW),
      ok AS (
        SELECT fp FROM prints GROUP BY fp
        HAVING count(*) > 1 AND count(*) <= $MaxBucket),
      p2 AS (SELECT p.doc_id, p.fp FROM prints p JOIN ok USING (fp))
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
      FROM p2 a
      JOIN p2 b ON b.fp = a.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 5
      ORDER BY da, db"""))

  // --------------------------------------------------------------- q350
  // Maximal shared token runs with EXACT extents (the Lee et al.
  // "Deduplicating Training Data Makes Language Models Better" exact-
  // substring-dedup class, there built on a suffix array) — the sixth
  // dedup detector, and the one that closes the family's last gap: q348
  // GUARANTEES detection of runs ≥ W+2 but reports fingerprint counts;
  // this operator reports each maximal shared run's precise span
  // (da, db, start_a, start_b, run_len), the contract an excision pass
  // needs. Distributed restatement of the suffix-array scan:
  //
  //   1. anchor every position with its L-token gram (L = RunL = 8):
  //      a shared run of length R ≥ L is EXACTLY a maximal set of
  //      R−L+1 consecutive shared anchors on one (da, db, diagonal);
  //   2. pair anchors cross-doc on the gram key (md5-id ints — nothing
  //      shuffles strings past the first projection), bucketed under
  //      [[MaxBucket]]: a boilerplate gram (> MaxBucket occurrences)
  //      is dropped before pair-gen on BOTH engines, so pair-gen can
  //      never go quadratic on template text (the q348 discipline; a
  //      dropped gram can split a boilerplate-spanning run — the
  //      documented cap semantic, mirrored in the oracle);
  //   3. gaps-and-islands per (da, db, diag): ia − row_number() groups
  //      consecutive anchors; min/max per island reconstruct the
  //      maximal extent — start_a = min ia, start_b = min ib,
  //      run_len = max ia − min ia + L. Maximality is exact: a run
  //      extendable one token left/right would contribute one more
  //      shared anchor to the same island.
  //
  // Scale: anchors are one projection of the corpus (no window); the
  // islands window partitions by (da, db, diag) — candidate-pair-
  // bounded, never corpus-global; every aggregate is exact BIGINT.
  // DedupSpec pins the positional contract on a planted passage.
  private val RunL = 8

  /** The q350 pipeline as a shared table: one row per maximal shared run
    * (da, db, start_a, start_b, run_len) — consumed by q350 (the report)
    * and q354 (the per-doc excision mass). */
  private[graft] def substringRuns(s: SparkSession, d: String): DataFrame = {
    val grams = docs(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= RunL)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - $RunL)")).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("i"),
        md5Id(expr(s"concat_ws('|', slice(toks, i + 1, $RunL))")).as("g"))
      .localCheckpoint() // feeds the cap census AND both join sides
    val okg = grams.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1L && col("n") <= MaxBucket)
      .select(col("g"))
    val g2 = grams.join(okg, Seq("g"), "left_semi")
    val cand = g2.select(col("g"), col("doc_id").as("da"), col("i").as("ia"))
      .join(g2.select(col("g"), col("doc_id").as("db"), col("i").as("ib")),
        Seq("g"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), col("ia"), col("ib"),
        (col("ia") - col("ib")).as("diag"))
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy(col("da"), col("db"), col("diag")).orderBy(col("ia"))
    cand.withColumn("grp", col("ia") - row_number().over(wI))
      .groupBy(col("da"), col("db"), col("diag"), col("grp"))
      .agg(min(col("ia")).as("start_a"), min(col("ib")).as("start_b"),
        (max(col("ia")) - min(col("ia")) + lit(RunL.toLong)).as("run_len"))
      .select(col("da"), col("db"), col("start_a"), col("start_b"),
        col("run_len"))
  }

  /** Oracle CTE chain mirroring [[substringRuns]], ending in
    * `runs(da, db, start_a, start_b, run_len)` — shared by q350/q354. */
  private lazy val substringRunsSql: String = s"""tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      grams AS MATERIALIZED (
        SELECT doc_id, i,
               ${md5IdSql(s"array_to_string(toks[i+1:i+$RunL], '|')")} AS g
        FROM (SELECT doc_id, toks,
                     unnest(range(0, len(toks) - ${RunL - 1})) AS i
              FROM tok WHERE len(toks) >= $RunL) t),
      ok AS (SELECT g FROM grams GROUP BY g
             HAVING count(*) > 1 AND count(*) <= $MaxBucket),
      g2 AS MATERIALIZED (SELECT doc_id, i, g FROM grams JOIN ok USING (g)),
      cand AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.i AS ia, b.i AS ib,
               a.i - b.i AS diag
        FROM g2 a JOIN g2 b ON b.g = a.g AND a.doc_id < b.doc_id),
      isl AS (
        SELECT da, db, diag, ia, ib,
               ia - row_number() OVER (PARTITION BY da, db, diag
                 ORDER BY ia) AS grp
        FROM cand),
      runs AS MATERIALIZED (
        SELECT da, db, CAST(min(ia) AS BIGINT) AS start_a,
               CAST(min(ib) AS BIGINT) AS start_b,
               CAST(max(ia) - min(ia) + $RunL AS BIGINT) AS run_len
        FROM isl GROUP BY da, db, diag, grp)"""

  private val q350 = QueryDef(
    "q350_dedup_substring_runs",
    (s, d) => substringRuns(s, d)
      .orderBy(col("da"), col("db"), col("start_a"), col("start_b")),
    Some(s"""
      WITH $substringRunsSql
      SELECT da, db, start_a, start_b, run_len
      FROM runs ORDER BY da, db, start_a, start_b"""))

  // --------------------------------------------------------------- q354
  // Duplicate-token-mass excision report — the planning table an actual
  // excision pass reads after q350 finds the runs: per document, the
  // UNION of all its shared-run token intervals (either side of any
  // pair), merged, as an exact covered-token count and fraction. This is
  // the number Lee et al. report ("X% of tokens are part of a duplicate
  // substring") and the threshold input for drop-vs-trim decisions.
  //
  // Interval union is the classic sweep, distributed per doc: sort a
  // doc's intervals by (start, end), an interval OPENS a new island iff
  // its start exceeds the running max end of everything before it,
  // islands aggregate to (min start, max end) — no position explosion,
  // cost is runs-per-doc log runs-per-doc, never O(covered tokens)
  // (at 100 TB the covered mass is the corpus's dup fraction; the
  // interval list is just the run count). Windows partition by doc.
  // All arithmetic exact BIGINT; the single fraction ships as one
  // correctly-rounded division (n_tokens ≥ RunL > 0 whenever a doc has
  // a run, so no zero guard is needed).
  private val q354 = QueryDef(
    "q354_dedup_excision_mass",
    (s, d) => {
      val runs = substringRuns(s, d).localCheckpoint() // feeds both sides
      val iv = runs.select(col("da").as("doc_id"), col("start_a").as("st"),
          (col("start_a") + col("run_len") - 1L).as("en"))
        .unionByName(runs.select(col("db").as("doc_id"),
          col("start_b").as("st"),
          (col("start_b") + col("run_len") - 1L).as("en")))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cov = iv
        .withColumn("brk",
          when(col("st") > coalesce(max(col("en")).over(wPrev), lit(-1L)),
            1L).otherwise(0L))
        .withColumn("isl", sum(col("brk")).over(wCum))
        .groupBy(col("doc_id"), col("isl"))
        .agg(min(col("st")).as("mn"), max(col("en")).as("mx"))
        .groupBy(col("doc_id"))
        .agg(sum(col("mx") - col("mn") + 1L).as("dup_tokens"))
      val nt = docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      cov.join(nt, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
          Num.roundZ(col("dup_tokens").cast("double")
            / col("n_tokens").cast("double"), 6).as("dup_fraction"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $substringRunsSql,
      iv AS (
        SELECT da AS doc_id, start_a AS st,
               start_a + run_len - 1 AS en FROM runs
        UNION ALL
        SELECT db, start_b, start_b + run_len - 1 FROM runs),
      brk AS (
        SELECT doc_id, st, en,
               CASE WHEN st > coalesce(max(en) OVER (PARTITION BY doc_id
                 ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
        FROM iv),
      isl2 AS (
        SELECT doc_id, st, en,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY st, en
                 ROWS UNBOUNDED PRECEDING) AS isl
        FROM brk),
      cov AS (
        SELECT doc_id, CAST(sum(mx - mn + 1) AS BIGINT) AS dup_tokens
        FROM (SELECT doc_id, isl, min(st) AS mn, max(en) AS mx
              FROM isl2 GROUP BY 1, 2) t
        GROUP BY 1),
      nt AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             FROM documents)
      SELECT c.doc_id, nt.n_tokens, c.dup_tokens,
             (CAST(round((CAST(c.dup_tokens AS DOUBLE)
               / CAST(nt.n_tokens AS DOUBLE)) * 1e6) AS BIGINT) / 1e6)
               AS dup_fraction
      FROM cov c JOIN nt ON nt.doc_id = c.doc_id
      ORDER BY c.doc_id"""))

  // --------------------------------------------------------------- q355
  // Asymmetric CONTAINMENT dedup ([EXT] near-dup family, the quoted/
  // excerpted-document detector): C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| —
  // unlike Jaccard it stays high when a small doc is embedded in a much
  // larger one (jac → |A|/|B| as B grows, so symmetric dedup goes blind
  // exactly where quoting lives). Reports ORDERED pairs (da contained in
  // db, da ≠ db) with C ≥ 0.8, carrying both metrics so the reader sees
  // which pairs symmetric dedup would have missed. Division of labor vs
  // q120 (containment DECONTAMINATION): q120 scores eval-vs-corpus
  // leakage through symmetric minhash-band candidates and documents
  // that banding's recall limitation; this is the corpus-internal
  // quoting detector, and its prefix-filter candidate generation is
  // LOSSLESS for the containment threshold — the recall gap q120's
  // comment concedes does not exist here.
  //
  // Candidate generation is prefix filtering adapted to the asymmetric
  // threshold: only the CONTAINED side prefixes (size n − ⌈0.8·n⌉ + 1 in
  // ascending global-frequency order; if B held ≥ 0.8·n of A's shingles
  // but none of A's prefix, B∩A would fit inside A's suffix of
  // ⌈0.8·n⌉ − 1 < 0.8·n shingles — contradiction, so the filter is
  // LOSSLESS for any shingle order and the oracle keeps q31's unfiltered
  // all-pairs formulation) — but the CONTAINER side must index its FULL
  // shingle set, so unlike q31 the posting lists are document-frequency-
  // sized. That is the honest scale cost of containment: at 100 TB, cap
  // the postings at a df bound and EXCLUDE the dropped stop-shingles
  // from both |A∩B| and |A| (the capped metric both engines would then
  // compute identically — the q32/q348 cap discipline); this corpus's
  // max shingle df is 4, so the exact uncapped form ships here.
  // Verification is exact: ni from array_intersect of the full sets,
  // both thresholds filtered on RAW ratios (jacRaw discipline).
  private val q355 = QueryDef(
    "q355_dedup_containment",
    (s, d) => {
      val sh = rawShinglesOf(docs(s, d))
        .select(col("doc_id"), col("lang"), md5Id(col("shingle")).as("sid"))
        .distinct()
        .localCheckpoint() // feeds freq, prefixes, the full index, sets
      val sets = sh.groupBy(col("doc_id"))
        .agg(collect_set(col("sid")).as("shs"))
      val freq = sh.groupBy(col("sid")).agg(count(lit(1)).as("gf"))
      val prefixA = sh.join(freq, "sid")
        .groupBy(col("doc_id"), col("lang"))
        .agg(array_sort(collect_list(struct(col("gf"), col("sid")))).as("a"))
        .select(col("doc_id"), col("lang"),
          slice(col("a"), lit(1),
            (size(col("a")) - ceil(size(col("a")) * 0.8) + 1).cast("int"))
            .as("a"))
        .select(col("doc_id"), col("lang"),
          explode(expr("sequence(0, size(a) - 1)")).as("i"), col("a"))
        .select(col("doc_id").as("da"), col("lang"),
          col("a")(col("i")).getField("sid").as("sid"))
      val cand = prefixA
        .join(sh.select(col("doc_id").as("db"), col("lang"), col("sid")),
          Seq("lang", "sid"))
        .filter(col("da") =!= col("db"))
        .select(col("da"), col("db")).distinct()
      val sa = sets.select(col("doc_id").as("da"), col("shs").as("sa"))
      val sb = sets.select(col("doc_id").as("db"), col("shs").as("sb"))
      cand.join(sa, "da").join(sb, "db")
        .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("contRaw",
          col("ni").cast("double") / size(col("sa")).cast("double"))
        .filter(col("contRaw") >= 0.8)
        .select(col("da"), col("db"),
          size(col("sa")).cast("long").as("n_a"),
          size(col("sb")).cast("long").as("n_b"),
          round(col("contRaw"), 6).as("containment"),
          round(jacRaw, 6).as("jac"))
        .orderBy(col("da"), col("db"))
    },
    Some(s"""
      WITH $shinglesSql,
      shid AS (
        SELECT DISTINCT doc_id, lang, ${md5IdSql("shingle")} AS shingle
        FROM sh),
      cnt AS (SELECT doc_id, count(*) AS n FROM shid GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        FROM shid a JOIN shid b
          ON a.shingle = b.shingle AND a.lang = b.lang
         AND a.doc_id <> b.doc_id
        GROUP BY 1, 2)
      SELECT da, db,
             CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
             round(CAST(ni AS DOUBLE) / CAST(ca.n AS DOUBLE), 6)
               AS containment,
             round(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE), 6)
               AS jac
      FROM inter
      JOIN cnt ca ON da = ca.doc_id
      JOIN cnt cb ON db = cb.doc_id
      WHERE CAST(ni AS DOUBLE) / CAST(ca.n AS DOUBLE) >= 0.8
      ORDER BY da, db"""))

  val defs: Seq[QueryDef] =
    Seq(q30, q31, q32, q33, q34, q35, q99, q100, q109, q120, q122, q154,
      q161, q205, q210, q213, q247, q258, q270, q277, q281, q282, q299,
      q331, q341, q343, q348, q350, q354, q355)
}
