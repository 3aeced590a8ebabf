package graft.operators

import graft.{QueryDef, Tables, Num}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators over `documents` (SURVEY §2.C8): per-language
  * stats, quality scoring, token counting (whitespace + regex "BPE-ish"),
  * document fingerprinting (positional polynomial hash), and an n-gram
  * frequency language-ID heuristic.
  *
  * Everything is a single-pass scan + hash aggregation (or one dictionary
  * join) — per-document work is done with codegen'd string/array functions,
  * never a driver loop, so each query scales linearly with documents.
  */
object TextAnalysis {
  import Num._

  private val P = 2147483647L

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** docs scan spread ahead of an n-gram fan-out whose consumer is
    * DISTINCT-heavy (r14). The r13 rawShinglesOf discipline was A/B'd
    * across the whole text family (16 sites, interleaved old/new ×4,
    * min-of-runs): plain tokenize explodes feeding map-side-combinable
    * counts came back 1.2–1.6× WORSE with the spread (q37 0.97,
    * q39 1.39, q44 1.25, q107 1.47, q110 1.27, q121 1.28, q133 1.03,
    * q253 1.37, q290 1.57, q327 1.04, q329 0.97) — partial aggregation
    * already compacts the token stream on the map side, so the explode
    * never materializes shuffle-sized output and the added exchange is
    * pure cost on this box. The spread only PAYS where the post-explode
    * consumer cannot pre-reduce — per-group count_distinct / listagg
    * streams that carry every occurrence into the shuffle: q46 (per-doc
    * distinct trigrams, 0.69×), q217 (per-(gram,doc) listagg postings,
    * 0.89×), q113's boilerplateTopK (per-gram distinct doc_ids, 0.85×).
    * Those three keep it; everything else keeps the plain scan. No-op at
    * production scale either way (Scale.spreadForFanout). */
  private def docsSpread(s: SparkSession, d: String): DataFrame =
    graft.Scale.spreadForFanout(docs(s, d), col("doc_id"))

  /** Literal stopword set shared by Spark and the oracle SQL. */
  private val Stop = Seq("the", "a", "of", "and", "to", "in")
  private[graft] val stopArr = s"array(${Stop.map(w => s"'$w'").mkString(", ")})"
  private[graft] val stopList = s"[${Stop.map(w => s"'$w'").mkString(", ")}]"

  // ---------------------------------------------------------------- q40
  // Per-language corpus stats (counts are exact; avg over BIGINT is an
  // exact-integer division → bit-identical across engines).
  private val q40 = QueryDef(
    "q40_lang_stats",
    (s, d) =>
      docs(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             count(DISTINCT source) AS n_sources
      FROM documents
      GROUP BY lang
      ORDER BY lang"""))

  // ---------------------------------------------------------------- q41
  // Quality scoring: token count, mean token length, stopword ratio,
  // punctuation ratio, composed into one score. All ratios are exact
  // integer divisions; the blended score is a handful of IEEE ops, so
  // round(…,6) is deterministic.
  private val q41 = QueryDef(
    "q41_quality_score",
    (s, d) =>
      docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("n_stop",
          expr(s"size(filter(toks, w -> array_contains($stopArr, w)))")
            .cast("long"))
        .withColumn("n_punct",
          length(regexp_replace(col("text"), "[^.,!?;]", "")).cast("long"))
        .select(
          col("doc_id"), col("n_tok"), col("n_stop"), col("n_punct"),
          round(col("n_stop").cast("double") / col("n_tok").cast("double"), 6)
            .as("stop_ratio"), // n_tok ≥ 1 by construction (split ≥ 1 elem)
          // n_chars = 0 (empty doc): Spark 4 ANSI throws on double/0
          // where DuckDB yields NULL — guard to the oracle's NULL
          // (DegenerateDataSpec pins the empty-document row)
          when(col("n_chars") > 0L,
            round(col("n_punct").cast("double") / col("n_chars").cast("double"), 6))
            .as("punct_ratio"),
          when(col("n_chars") > 0L,
            round(
              lit(1.0) -
                (col("n_stop").cast("double") / col("n_tok").cast("double")) * 0.5 -
                (col("n_punct").cast("double") / col("n_chars").cast("double")) * 0.5,
              6)).as("quality"))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tok,
             CAST(len(list_filter(toks, w -> list_contains($stopList, w))) AS BIGINT) AS n_stop,
             CAST(length(regexp_replace(text, '[^.,!?;]', '', 'g')) AS BIGINT) AS n_punct,
             round(CAST(len(list_filter(toks, w -> list_contains($stopList, w))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE), 6) AS stop_ratio,
             round(CAST(length(regexp_replace(text, '[^.,!?;]', '', 'g')) AS DOUBLE)
                   / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
             round(1.0
                   - (CAST(len(list_filter(toks, w -> list_contains($stopList, w))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)) * 0.5
                   - (CAST(length(regexp_replace(text, '[^.,!?;]', '', 'g')) AS DOUBLE)
                      / CAST(n_chars AS DOUBLE)) * 0.5, 6) AS quality
      FROM (SELECT doc_id, text, n_chars, string_split(text, ' ') AS toks
            FROM documents) t
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q42
  // Token counting two ways: whitespace split vs a BPE-ish regex
  // tokenizer ([a-z]+ runs / digit runs / single other chars).
  private val q42 = QueryDef(
    "q42_token_count",
    (s, d) =>
      docs(s, d)
        .withColumn("ws_tok", size(split(col("text"), " ")).cast("long"))
        .withColumn("re_tok",
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
            .cast("long"))
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ws_tok")).as("ws_tokens"),
          sum(col("re_tok")).as("re_tokens"))
        .orderBy(col("lang"), col("source")),
    Some("""
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS ws_tokens,
             CAST(sum(CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT) AS re_tokens
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source"""))

  // ---------------------------------------------------------------- q43
  // Document fingerprint: position-sensitive polynomial hash over word
  // ids (rolling-hash style). Word ids are a PORTABLE md5-derived 56-bit
  // content hash reduced mod P — a pure per-row projection, identical in
  // both engines, with no vocabulary join and no single-partition
  // dictionary window (the r1 shape). Pure 64-bit integer arithmetic with
  // a per-term mod keeps every product within 63 bits.
  private val q43 = QueryDef(
    "q43_fingerprint",
    (s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("i", col("pos").cast("long") + 1L)
      tok
        .withColumn("wid",
          conv(substring(md5(col("w").cast("binary")), 1, 14), 16, 10)
            .cast("long") % P)
        .withColumn("term", (col("i") * col("wid")) % P * 1000003L % P)
        .groupBy(col("doc_id"))
        .agg((sum(col("term")) % P).as("fingerprint"),
          count(lit(1)).as("n_tok"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
        FROM documents),
      terms AS (
        SELECT doc_id,
               (i * ((('0x' || substr(md5(w), 1, 14))::BIGINT) % $P)) % $P * 1000003 % $P AS term
        FROM tok)
      SELECT doc_id,
             CAST(sum(term) % $P AS BIGINT) AS fingerprint,
             count(*) AS n_tok
      FROM terms
      GROUP BY doc_id
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q44
  // Language-ID heuristic: build per-language token profiles from the
  // corpus (top-5 tokens by lift = in-lang frequency / global frequency),
  // score each document by profile hits, predict argmax. Output is the
  // confusion matrix. Profiles are tiny → broadcast; scoring is one
  // token join — the standard n-gram LID shape at any scale.
  /** q44/q356 shared: the LID predictions (doc_id, lang, p_lang). */
  private def langPredictions(s: SparkSession, d: String): DataFrame = {
    val tok = docs(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
    val langCnt = tok.groupBy(col("lang").as("p_lang"), col("w"))
      .agg(count(lit(1)).as("c_lang"))
    val langTot = tok.groupBy(col("lang").as("p_lang"))
      .agg(count(lit(1)).as("t_lang"))
    val globCnt = tok.groupBy(col("w")).agg(count(lit(1)).as("c_glob"))
    val globTot = tok.agg(count(lit(1)).as("t_glob")) // 1-row, stays lazy
    val lift = langCnt.join(langTot, "p_lang").join(globCnt, "w")
      .crossJoin(broadcast(globTot))
      .withColumn("lift",
        round((col("c_lang").cast("double") / col("t_lang").cast("double")) /
          (col("c_glob").cast("double") / col("t_glob").cast("double")), 9))
    val w5 = Window.partitionBy(col("p_lang"))
      .orderBy(col("lift").desc, col("w"))
    val profile = lift.withColumn("rn", row_number().over(w5))
      .filter(col("rn") <= 5)
      .select(col("p_lang"), col("w"))
    val scores = tok.join(broadcast(profile), "w")
      .groupBy(col("doc_id"), col("lang"), col("p_lang"))
      .agg(count(lit(1)).as("hits"))
    val wPred = Window.partitionBy(col("doc_id"))
      .orderBy(col("hits").desc, col("p_lang"))
    scores.withColumn("rn", row_number().over(wPred))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("p_lang"))
  }

  private val q44 = QueryDef(
    "q44_langid_ngram",
    (s, d) => langPredictions(s, d)
      .groupBy(col("lang"), col("p_lang").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang")),
    Some(s"""
      WITH $langPredSql
      SELECT lang, p_lang AS pred_lang, count(*) AS n
      FROM pred
      GROUP BY lang, p_lang
      ORDER BY lang, pred_lang"""))

  /** q44/q356 shared oracle prefix, ending in `pred(doc_id, lang,
    * p_lang)`. (lazy: referenced from q44's eager val above.) */
  private lazy val langPredSql = """tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents),
      lang_cnt AS (SELECT lang AS p_lang, w, count(*) AS c_lang FROM tok GROUP BY 1, 2),
      lang_tot AS (SELECT lang AS p_lang, count(*) AS t_lang FROM tok GROUP BY 1),
      glob_cnt AS (SELECT w, count(*) AS c_glob FROM tok GROUP BY 1),
      glob_tot AS (SELECT count(*) AS t_glob FROM tok),
      lift AS (
        SELECT p_lang, w,
               round((CAST(c_lang AS DOUBLE) / CAST(t_lang AS DOUBLE))
                     / (CAST(c_glob AS DOUBLE) / CAST(t_glob AS DOUBLE)), 9) AS lift
        FROM lang_cnt JOIN lang_tot USING (p_lang) JOIN glob_cnt USING (w), glob_tot),
      profile AS (
        SELECT p_lang, w FROM (
          SELECT p_lang, w, row_number() OVER (PARTITION BY p_lang ORDER BY lift DESC, w) AS rn
          FROM lift) t
        WHERE rn <= 5),
      scores AS (
        SELECT doc_id, lang, p_lang, count(*) AS hits
        FROM tok JOIN profile USING (w)
        GROUP BY 1, 2, 3),
      pred AS MATERIALIZED (
        SELECT doc_id, lang, p_lang FROM (
          SELECT doc_id, lang, p_lang,
                 row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, p_lang) AS rn
          FROM scores) t
        WHERE rn = 1)"""

  // ---------------------------------------------------------------- q45
  // Exact distribution stats per language: interpolated median/p90 and
  // standard deviation. stddev is computed from exact integer sums
  // (n_chars is a BIGINT: Σx and Σx² are exact longs, the single double
  // division happens last), so the value is independent of partitioning
  // and merge order — the same discipline as Num.sumFixed, extended to
  // second moments. percentile/quantile_cont share linear-interpolation
  // semantics between Spark and DuckDB.
  private val q45 = QueryDef(
    "q45_stats_moments",
    (s, d) =>
      docs(s, d)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(n_chars, 0.5D)").as("med_chars"),
          expr("percentile(n_chars, 0.9D)").as("p90_chars"),
          sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .select(col("lang"), col("n"), col("med_chars"), col("p90_chars"),
          // a single-document language has no sample sd (n−1 = 0):
          // DuckDB's /0.0 yields NULL, Spark ANSI throws — guard to NULL
          when(col("n") > 1L,
            round(sqrt(
              (col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double") /
                  col("n").cast("double")) /
                (col("n").cast("double") - 1.0)), 6)).as("sd_chars"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, count(*) AS n,
             quantile_cont(n_chars, 0.5) AS med_chars,
             quantile_cont(n_chars, 0.9) AS p90_chars,
             round(sqrt((CAST(sum(n_chars * n_chars) AS DOUBLE)
                         - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE))
                        / (CAST(count(*) AS DOUBLE) - 1.0)), 6) AS sd_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang"""))

  // ---------------------------------------------------------------- q46
  // Repetition ratio: fraction of repeated word-3-grams per language — a
  // standard pre-training quality filter (boilerplate/spam detectors key
  // on duplicated n-grams). Per-doc (unique, total) counts are exact
  // integers, aggregated as ratio-of-sums — order- and partition-
  // independent, unlike an average of per-doc double ratios. Scale: one
  // explode + two hash aggregations; no shuffle wider than (doc_id).
  private val q46 = QueryDef(
    "q46_repetition_ratio",
    (s, d) => {
      val grams = docsSpread(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("lang"), col("toks"),
          explode(expr("sequence(0, size(toks) - 3)")).as("i"))
        .select(col("doc_id"), col("lang"),
          concat(col("toks")(col("i")), lit("|"),
                 col("toks")(col("i") + 1), lit("|"),
                 col("toks")(col("i") + 2)).as("g"))
      grams.groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("total"), count_distinct(col("g")).as("uniq"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("total")).as("total_grams"),
          round(lit(1.0) -
            sum(col("uniq")).cast("double") /
              sum(col("total")).cast("double"), 6).as("rep_ratio"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
      grams AS (
        SELECT doc_id, lang, unnest(
          CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> toks[i] || '|' || toks[i+1] || '|' || toks[i+2])
               ELSE [] END) AS g
        FROM tok),
      per_doc AS (
        SELECT doc_id, lang, count(*) AS total, count(DISTINCT g) AS uniq
        FROM grams GROUP BY 1, 2)
      SELECT lang, count(*) AS n_docs,
             CAST(sum(total) AS BIGINT) AS total_grams,
             round(1.0 - CAST(sum(uniq) AS DOUBLE) / CAST(sum(total) AS DOUBLE), 6)
               AS rep_ratio
      FROM per_doc
      GROUP BY lang
      ORDER BY lang"""))

  // ---------------------------------------------------------------- q37
  // TF-IDF-style salient terms per language. The weight is the exact
  // integer ratio tf·N/df evaluated with ONE double division (both
  // engines correctly round the same exact integers → bit-identical) —
  // a log() would hit libm rounding differences. Plan shape: one explode
  // + two hash aggs + a broadcast of the 5-row per-language doc counts;
  // the row_number window runs over ≤ |vocab| rows per language.
  private val q37 = QueryDef(
    "q37_tfidf_terms",
    (s, d) => {
      val toks = docs(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term"))
      val stats = toks.groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      val nDocs = docs(s, d).groupBy(col("lang"))
        .agg(count_distinct(col("doc_id")).as("n_docs"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("weight").desc, col("term"))
      stats
        .join(broadcast(nDocs), "lang")
        .withColumn("weight",
          (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("term"), col("tf"), col("df"),
          col("weight"))
        .orderBy(col("lang"), col("rk"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        FROM documents),
      stats AS (
        SELECT lang, term, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM toks GROUP BY 1, 2),
      nd AS (
        SELECT lang, count(DISTINCT doc_id) AS n_docs
        FROM documents GROUP BY 1),
      ranked AS (
        SELECT s.lang, term, tf, df, n_docs,
               CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS weight
        FROM stats s JOIN nd ON s.lang = nd.lang)
      SELECT lang, rk, term, tf, df, weight FROM (
        SELECT lang, term, tf, df, weight,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY weight DESC, term) AS rk
        FROM ranked) t
      WHERE rk <= 5
      ORDER BY lang, rk"""))

  // ---------------------------------------------------------------- q39
  // Corpus-wide top bigrams per language — collocation mining, the same
  // explode + hash-agg + bounded-window shape as q37. Ties are broken by
  // the bigram string, so the top-10 cut is deterministic in both engines.
  // The generator explodes integer POSITIONS and projects the bigram
  // afterwards — explode over a transform(λ) result would fall off
  // whole-stage codegen (see COVERAGE scale notes).
  private val q39 = QueryDef(
    "q39_bigram_topk",
    (s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("bg"))
      docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), col("toks"),
          explode(expr("sequence(1, size(toks) - 1)")).as("i"))
        .select(col("lang"),
          concat(col("toks")(col("i") - 1), lit(" "),
                 col("toks")(col("i"))).as("bg"))
        .groupBy(col("lang"), col("bg"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk"), col("bg"), col("cnt"))
        .orderBy(col("lang"), col("rk"))
    },
    Some("""
      WITH tok AS (
        SELECT lang, string_split(text, ' ') AS toks FROM documents),
      grams AS (
        SELECT lang, unnest(
          CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])
               ELSE [] END) AS bg
        FROM tok)
      SELECT lang, rk, bg, cnt FROM (
        SELECT lang, bg, count(*) AS cnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY count(*) DESC, bg) AS rk
        FROM grams GROUP BY lang, bg) t
      WHERE rk <= 10
      ORDER BY lang, rk"""))

  // --------------------------------------------------------------- q107
  // Vocabulary coverage / OOV rate: build the top-V corpus vocabulary by
  // token frequency (V = 50, ties broken by token text so the cut is
  // deterministic), then measure each language's out-of-vocabulary token
  // rate against it — the primitive behind tokenizer training and the
  // "does my tokenizer cover this slice" audit run before adding a new
  // corpus to the mix.
  // Scale: tokens aggregate once into per-(lang, token) counts (Zipf skew
  // is absorbed by map-side partial aggregation — the hot token combines
  // within every partition before the exchange); global counts derive
  // from that same aggregate, NOT a second scan of the corpus. The top-V
  // cut is a TakeOrdered over the token dictionary (dictionary-sized, not
  // corpus-sized), and the vocabulary — V rows — broadcasts to the
  // per-language join, so the corpus-sized side never reshuffles.
  private val q107 = QueryDef(
    "q107_vocab_oov",
    (s, d) => {
      val perLang = docs(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("n"))
      val vocab = perLang
        .groupBy(col("tok")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(50)
        .select(col("tok"), lit(1).as("in_v"))
      perLang.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("lang"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(when(col("in_v").isNull, col("n")).otherwise(lit(0L))).as("n_oov"),
          round(sum(when(col("in_v").isNull, col("n")).otherwise(lit(0L)))
            .cast("double") / sum(col("n")).cast("double"), 6).as("oov_rate"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
      pl AS (
        SELECT lang, tok, count(*) AS n FROM tok GROUP BY 1, 2),
      vocab AS (
        SELECT tok FROM (
          SELECT tok, sum(n) AS c FROM pl GROUP BY 1
          ORDER BY c DESC, tok LIMIT 50)),
      j AS (
        SELECT pl.lang, pl.n, v.tok AS vtok
        FROM pl LEFT JOIN vocab v ON pl.tok = v.tok)
      SELECT lang,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN vtok IS NULL THEN n ELSE 0 END) AS BIGINT) AS n_oov,
             round(CAST(sum(CASE WHEN vtok IS NULL THEN n ELSE 0 END) AS DOUBLE)
                   / CAST(sum(n) AS DOUBLE), 6) AS oov_rate
      FROM j
      GROUP BY lang
      ORDER BY lang"""))

  // --------------------------------------------------------------- q110
  // BM25 top-k retrieval: the classic lexical ranking function, scoring
  // documents against a fixed query-term set. idf is the RATIONAL surrogate
  // (N − df + 0.5)/(df + 0.5) — BM25's idf without the log wrapper — for
  // the same reason q37 avoids log(): libm rounding differs between
  // engines, while +,·,/ are IEEE-correctly-rounded in both, so writing
  // the identical expression tree on both sides is bit-deterministic.
  // (Rankings differ from log-BM25 since the sum over terms is not
  // rank-preserved under a per-term monotone transform; the metric is
  // documented as rational-idf BM25 and used consistently on both sides.)
  //
  // Scale: the token stream is filtered to the |Q| query terms BEFORE any
  // aggregation — the per-(doc,term) tf table is |matching docs|·|Q|-sized,
  // never vocabulary-sized; df derives from that table; doc lengths are a
  // per-row projection; N/avgdl is a 1-row broadcast. The top-k cut is
  // TakeOrdered (per-partition heap + driver merge of k rows), and the
  // rank window then runs over exactly k rows — no global corpus sort.

  /** Query terms + constants, embedded identically in Spark and SQL.
    * k1 = 1.2, b = 0.75 (the standard Robertson defaults); literals are
    * written with the same decimal text in both engines so they parse to
    * identical doubles. */
  private[graft] val Bm25Terms = Seq("spark", "window", "merge")
  private val bm25TermArr = s"array(${Bm25Terms.map(t => s"'$t'").mkString(", ")})"
  private val bm25TermList = s"[${Bm25Terms.map(t => s"'$t'").mkString(", ")}]"

  /** Full rational-idf BM25 score per matching document — the shared core
    * of q110 and q111's lexical arm. Returns (doc_id, score). */
  private[graft] def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val dl = docs(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val glob = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl"))
    val tf = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(expr(s"array_contains($bm25TermArr, term)"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(glob))
      .withColumn("ts", round(
        (((col("n") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") /
                (col("sum_dl").cast("double") / col("n").cast("double"))))), 6))
      .groupBy(col("doc_id")).agg(sumFixed(col("ts"), 6).as("score"))
  }

  /** Oracle CTE chain mirroring [[bm25Scores]], ending in
    * `bm25(doc_id, score)` — shared by the q110 and q111 oracles. */
  private[graft] val bm25Ctes: String = s"""
      dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
             FROM documents),
      gstats AS (SELECT count(*) AS n, sum(dl) AS sum_dl FROM dl),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM (
               SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents) t
             WHERE list_contains($bm25TermList, term)
             GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      tscore AS (
        SELECT doc_id,
               round(((CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
                     * (CAST(tf AS DOUBLE) * 2.2)
                     / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                        * (CAST(dl AS DOUBLE)
                           / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))), 6) AS ts
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN gstats),
      bm25 AS (SELECT doc_id, ${sumFixedSql("ts", 6)} AS score
               FROM tscore GROUP BY doc_id)"""

  private val q110 = QueryDef(
    "q110_bm25_topk",
    (s, d) => {
      val top = bm25Scores(s, d)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
      // rank window runs over the 10 TakeOrdered survivors only
      val w = Window.orderBy(col("score").desc, col("doc_id"))
      top.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("rk"), col("doc_id"), col("score"))
        .orderBy(col("rk"))
    },
    Some(s"""
      WITH $bm25Ctes
      SELECT CAST(rk AS BIGINT) AS rk, doc_id, score FROM (
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        FROM bm25) t
      WHERE rk <= 10
      ORDER BY rk"""))

  // --------------------------------------------------------------- q290
  // Dirichlet-smoothed query likelihood ([EXT], Zhai & Lafferty 2001) —
  // the language-modeling retrieval scorer beside q110's BM25 (and
  // fused arms like q111): score(Q,D) = Σ_w ln((tf_w + μ·cf_w/T) /
  // (dl + μ)), μ = 300 (short-doc regime). Scored over the CANDIDATE
  // set (docs containing ≥ 1 query term, q110's convention — the
  // no-match score depends only on dl and ranks below matches at these
  // lengths); zero-tf query terms still contribute their smoothed mass
  // via the candidate × query-term grid completion (skipping them is
  // the classic QL bug — it breaks score comparability across docs).
  //
  // Determinism: this is the one scorer family where a log is the
  // semantics, so the q225 discipline applies — each ln term is
  // quantized to a 1e-12 BIGINT pre-sum (a ≤1-ulp libm disagreement is
  // ~1e-16 at these magnitudes, far below the grid), the per-doc sum is
  // exact, and the score is one exact-int division (negative by
  // construction, never −0.0: ln terms are strictly negative).
  // Scale: q110's exact shape — the token stream filters to |Q| terms
  // BEFORE any aggregation, collection stats are 1-row/|Q|-row
  // broadcasts, the grid is candidate×|Q|, and the cut is TakeOrdered.
  private val q290 = QueryDef(
    "q290_dirichlet_ql_topk",
    (s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val dl = docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
      val tTot = tok.agg(count(lit(1)).as("t_tot")) // 1 row
      val qtok = tok.filter(expr(s"array_contains($bm25TermArr, term)"))
      val cf = qtok.groupBy(col("term")).agg(count(lit(1)).as("cf"))
      val tf = qtok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val grid = tf.select(col("doc_id")).distinct()
        .crossJoin(broadcast(cf))
        .join(tf, Seq("doc_id", "term"), "left")
        .na.fill(0L, Seq("tf"))
        .join(dl, "doc_id")
        .crossJoin(broadcast(tTot))
        .withColumn("ltq", round(log(
          (col("tf").cast("double") + lit(300.0) *
            (col("cf").cast("double") / col("t_tot").cast("double"))) /
          (col("dl").cast("double") + lit(300.0))) * lit(1e12)).cast("long"))
      val scored = grid.groupBy(col("doc_id"))
        .agg((sum(col("ltq")).cast("double") / lit(1e12)).as("score"),
          sum(when(col("tf") > 0L, 1L).otherwise(0L)).as("matched"),
          max(col("dl")).as("dl"))
      val top = scored.orderBy(col("score").desc, col("doc_id")).limit(10)
      val w = Window.orderBy(col("score").desc, col("doc_id"))
      top.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("rk"), col("doc_id"), col("matched"), col("dl"),
          col("score"))
        .orderBy(col("rk"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
               AS dl FROM documents),
      ttot AS (SELECT count(*) AS t_tot FROM tok),
      qtok AS (SELECT doc_id, term FROM tok
               WHERE list_contains($bm25TermList, term)),
      cf AS (SELECT term, count(*) AS cf FROM qtok GROUP BY 1),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2),
      grid AS (
        SELECT c.doc_id, q.term, q.cf, COALESCE(t.tf, 0) AS tf
        FROM (SELECT DISTINCT doc_id FROM tf) c
        CROSS JOIN cf q
        LEFT JOIN tf t ON t.doc_id = c.doc_id AND t.term = q.term),
      terms AS (
        SELECT g.doc_id, g.tf, d.dl,
               CAST(round(ln((CAST(g.tf AS DOUBLE) + 300.0
                   * (CAST(g.cf AS DOUBLE) / CAST(s.t_tot AS DOUBLE)))
                 / (CAST(d.dl AS DOUBLE) + 300.0)) * 1e12) AS BIGINT)
                 AS ltq
        FROM grid g JOIN dl d USING (doc_id) CROSS JOIN ttot s),
      scored AS (
        SELECT doc_id,
               CAST(sum(ltq) AS DOUBLE) / 1e12 AS score,
               CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS matched,
               max(dl) AS dl
        FROM terms GROUP BY 1)
      SELECT CAST(rk AS BIGINT) AS rk, doc_id, matched, dl, score FROM (
        SELECT doc_id, matched, dl, score,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        FROM scored) t
      WHERE rk <= 10
      ORDER BY rk"""))

  // --------------------------------------------------------------- q121
  /** Misra–Gries frequency summary of one partition's item stream: returns
    * the ≤ k surviving keys. Guarantee: any item whose count in THIS
    * partition exceeds N_p/(k+1) survives (each decrement event removes
    * k+1 total mass, so ≤ N_p/(k+1) events can touch it). Pure streaming,
    * O(k) memory, amortized O(1) per item — no shuffle, no sort. */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { g =>
      m.get(g) match {
        case Some(c) => m.update(g, c + 1L)
        case None =>
          if (m.size < k) m.update(g, 1L)
          else {
            // decrement-all event: drop the incoming item and one count
            // from each stored key (k+1 mass removed per event)
            val keys = m.keysIterator.toArray
            var i = 0
            while (i < keys.length) {
              val c = m(keys(i))
              if (c == 1L) m.remove(keys(i)) else m.update(keys(i), c - 1L)
              i += 1
            }
          }
      }
    }
    m.keysIterator
  }

  // Heavy hitters with support φ = 1/500 over a boilerplate-weighted bigram
  // stream — the "find template lines that dominate the corpus" operator.
  // The corpus is synthetic-uniform (no natural skew; measured max bigram
  // frequency ≈ N/744 at sf0.1), so the skew is PLANTED deterministically,
  // mirrored in the oracle (q114 precedent): bigrams from template docs
  // (doc_id % 97 == 3) stream with multiplicity 201.
  //
  // Scale shape (the reason this query exists): candidate generation is a
  // per-partition Misra–Gries pass — ZERO shuffle of the token stream.
  // With capacity k = 1024 > 1/φ - 1 = 499, any item with global count
  // ≥ φN has count_p/N_p ≥ φ in some partition (weighted-average
  // argument), hence count_p > N_p/(k+1) there, hence survives → the
  // candidate union is a guaranteed superset of the true heavy hitters.
  // Only the ≤ partitions×k candidates are then exactly recounted via a
  // broadcast semi-join (at 1000+ executors with tiny φ, swap the
  // broadcast for a shuffle semi-join on the candidate table — the
  // candidate bound, not the broadcast, is the load-bearing part).
  // Correctness never depends on the sketch: the final counts are exact,
  // so the result hash-matches DuckDB's full GROUP BY.
  private val q121 = QueryDef(
    "q121_heavy_hitters_mg",
    (s, d) => {
      import s.implicits._
      val grams = docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(1, size(toks) - 1)")).as("i"))
        .select(col("doc_id"),
          concat(col("toks")(col("i") - 1), lit(" "),
                 col("toks")(col("i"))).as("g"))
        .select(col("g"),
          explode(expr("sequence(1, if(doc_id % 97 = 3, 201, 1))")).as("rep"))
        .select(col("g"))
      val cand = grams.as[String]
        .mapPartitions(it => misraGries(it, 1024))
        .toDF("g").distinct()
      val tot = grams.agg(count(lit(1)).as("n_stream"))
      grams.join(broadcast(cand), Seq("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .filter(col("cnt") * 500 >= col("n_stream"))
        .select(col("g").as("gram"), col("cnt"), col("n_stream"))
        .orderBy(col("cnt").desc, col("gram"))
    },
    Some("""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g0 AS (
        SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
          THEN list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i+1])
          ELSE [] END) AS g
        FROM tok),
      grams AS (
        SELECT g FROM g0,
          unnest(range(0, CASE WHEN doc_id % 97 = 3 THEN 201 ELSE 1 END)) u),
      tot AS (SELECT count(*) AS n_stream FROM grams)
      SELECT g AS gram, count(*) AS cnt,
             (SELECT n_stream FROM tot) AS n_stream
      FROM grams GROUP BY g
      HAVING count(*) * 500 >= (SELECT n_stream FROM tot)
      ORDER BY cnt DESC, gram"""))

  // --------------------------------------------------------------- q133
  // Token co-occurrence statistics over the top-20 document-frequency
  // tokens — the PMI-style prep pass embedding/word-vector training runs
  // over a corpus. Emits the exact ratio p(a,b)/(p(a)p(b)) as
  // N·c_ab/(c_a·c_b) instead of its log: every operand is an exact
  // integer, so the one double division is bit-identical cross-engine
  // (libm log is not a cross-engine contract).
  // Scale: the pair space is CAPPED by the dictionary (≤ C(20,2) keys),
  // never by the corpus — per-doc pair generation explodes positions over
  // the ≤20 within-doc top tokens (C(20,2)=190 pairs max per doc), and
  // the counts collapse in a map-side-combined hash agg. The top-20
  // dictionary and the per-token df table are broadcast (21 rows).
  private val q133 = QueryDef(
    "q133_token_cooccurrence",
    (s, d) => {
      val dt = docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .distinct()
      val dfCnt = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val wTop = Window.orderBy(col("df").desc, col("tok"))
      val top = dfCnt.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 20).select(col("tok"), col("df"))
      val nDocs = docs(s, d).agg(count(lit(1)).as("n_docs"))
      val pairs = dt.join(broadcast(top.select(col("tok"))), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("tok"))).as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("ts"), explode(expr("sequence(0, size(ts) - 2)")).as("i"))
        .select(col("ts"), col("i"),
          explode(expr("sequence(i + 1, size(ts) - 1)")).as("j"))
        .select(col("ts")(col("i")).as("ta"), col("ts")(col("j")).as("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(top.select(col("tok").as("ta"), col("df").as("n_a"))),
          Seq("ta"))
        .join(broadcast(top.select(col("tok").as("tb"), col("df").as("n_b"))),
          Seq("tb"))
        .crossJoin(broadcast(nDocs))
        .select(col("ta"), col("tb"), col("n_ab"), col("n_a"), col("n_b"),
          round((col("n_docs") * col("n_ab")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6).as("pmi_ratio"))
        .orderBy(col("ta"), col("tb"))
    },
    Some("""
      WITH dt AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)),
      dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
      top AS (
        SELECT tok, df FROM (
          SELECT tok, df,
                 row_number() OVER (ORDER BY df DESC, tok) AS rk
          FROM dfc) t
        WHERE rk <= 20),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      pairs AS (
        SELECT a.tok AS ta, b.tok AS tb, count(*) AS n_ab
        FROM dt a
        JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        JOIN top x ON x.tok = a.tok
        JOIN top y ON y.tok = b.tok
        GROUP BY a.tok, b.tok)
      SELECT ta, tb, n_ab, x.df AS n_a, y.df AS n_b,
             round(CAST((SELECT n_docs FROM nd) * n_ab AS DOUBLE) /
                   CAST(x.df * y.df AS DOUBLE), 6) AS pmi_ratio
      FROM pairs
      JOIN top x ON x.tok = ta
      JOIN top y ON y.tok = tb
      ORDER BY ta, tb"""))

  // --------------------------------------------------------------- q138
  // Source-vocabulary overlap matrix — pairwise Jaccard between the
  // distinct-token vocabularies of every source pair: the "how similar
  // are my data sources" report that drives mixture design (near-clone
  // crawls get merged; disjoint sources get their own q115 temperature
  // weight). Intersections come from ONE token-keyed self-join of the
  // deduplicated (source, token) vocabulary: a token joins at most
  // |sources| rows per side, so per-key fan-out is bounded by
  // C(|sources|, 2) — corpus size only enters through the one
  // (source, token)-keyed distinct, which partial-aggregates map-side.
  // Vocabulary sizes are a |sources|-row broadcast; union counts come
  // from inclusion–exclusion over exact BIGINTs, so the only IEEE op is
  // the final rounded division.
  private val q138 = QueryDef(
    "q138_vocab_overlap",
    (s, d) => {
      val vocab = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("v"))
      val inter = vocab.select(col("source").as("sa"), col("tok"))
        .join(vocab.select(col("source").as("sb"), col("tok")), Seq("tok"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(sizes.select(col("source").as("sa"), col("v").as("v_a"))), Seq("sa"))
        .join(broadcast(sizes.select(col("source").as("sb"), col("v").as("v_b"))), Seq("sb"))
        .select(col("sa"), col("sb"), col("n_inter"), col("v_a"), col("v_b"),
          round(col("n_inter").cast("double") /
            (col("v_a") + col("v_b") - col("n_inter")).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("sa"), col("sb"))
    },
    Some("""
      WITH vocab AS (
        SELECT DISTINCT source, tok FROM (
          SELECT source, unnest(string_split(text, ' ')) AS tok
          FROM documents) t),
      sizes AS (SELECT source, count(*) AS v FROM vocab GROUP BY 1),
      inter AS (
        SELECT a.source AS sa, b.source AS sb, count(*) AS n_inter
        FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2)
      SELECT sa, sb, n_inter, x.v AS v_a, y.v AS v_b,
             round(CAST(n_inter AS DOUBLE)
                   / CAST(x.v + y.v - n_inter AS DOUBLE), 6) AS jaccard
      FROM inter
      JOIN sizes x ON x.source = sa
      JOIN sizes y ON y.source = sb
      ORDER BY sa, sb"""))

  // --------------------------------------------------------------- q147
  // N-gram language-model quality scoring (the CCNet/RefinedWeb "score
  // each document with a model trained on the corpus" pass): an add-one-
  // smoothed bigram model is fit on the training partition (doc_id % 97
  // != 3, q105's split) and every held-out document is scored by its mean
  // per-token predicted probability p(w_i | w_{i-1}) = (c_bi + 1) /
  // (c_uni + V). Templated/boilerplate text scores high, noise scores
  // low — the same signal a perplexity filter thresholds on. The mean
  // replaces perplexity's geometric mean deliberately: every p here is a
  // ratio of exact BIGINTs, and IEEE division is correctly rounded, so
  // the score is bit-identical cross-engine with ZERO libm calls (q133's
  // rationale — log/exp are not a cross-engine contract). Per-token
  // probabilities round to 1e-9 and sum as scaled BIGINTs, making the
  // per-doc mean order- and partition-independent. A deployment wanting
  // true perplexity swaps the mean for exp(avg ln p) at the cost of that
  // contract.
  // Scale shape (q105's asymmetric-membership discipline): the corpus-
  // sized side is ONLY ever filtered and counted — the distinct eval
  // bigram/prefix dictionaries (held-out slice, 1/97 of the corpus)
  // broadcast as semi-join filters BEFORE the count aggregations, so the
  // model tables materialize just the rows the eval side will probe,
  // bounded by |eval grams|, never |train grams|. V is one map-side-
  // combined distinct over train tokens (dictionary-sized exchange). At
  // a scale where the eval slice itself outgrows broadcast, both
  // semi-joins become shuffle semi-joins on the gram key — the
  // filter-before-aggregate shape is the load-bearing part.
  private val q147 = QueryDef(
    "q147_lm_quality_score",
    (s, d) => {
      val toks = docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      val bi = toks
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(1, size(toks) - 1)")).as("i"))
        .select(col("doc_id"),
          concat(col("toks")(col("i") - 1), lit(" "),
                 col("toks")(col("i"))).as("g"),
          col("toks")(col("i") - 1).as("w1"))
      val train = bi.filter(col("doc_id") % 97 =!= 3)
      val evalB = bi.filter(col("doc_id") % 97 === 3)
      val vocabN = toks.filter(col("doc_id") % 97 =!= 3)
        .select(explode(col("toks")).as("t"))
        .agg(countDistinct(col("t")).as("v"))
      val cb = train
        .join(broadcast(evalB.select(col("g")).distinct()), Seq("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("cb"))
      val cu = train
        .join(broadcast(evalB.select(col("w1")).distinct()), Seq("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
      evalB
        .join(broadcast(cb), Seq("g"), "left")
        .join(broadcast(cu), Seq("w1"), "left")
        .crossJoin(broadcast(vocabN))
        .withColumn("p",
          (coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("cu"), lit(0L)) + col("v")).cast("double"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(round(col("p") * lit(1e9)).cast("long")).as("sp"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("sp").cast("double") / lit(1e9) /
            col("n_bigrams").cast("double"), 6).as("avg_p"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 2),
      bi AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i+1])) AS g
        FROM tok),
      bi2 AS (SELECT doc_id, g, string_split(g, ' ')[1] AS w1 FROM bi),
      vocab AS (
        SELECT count(DISTINCT t) AS v FROM (
          SELECT unnest(toks) AS t FROM tok WHERE doc_id % 97 <> 3)),
      cb AS (
        SELECT g, count(*) AS cb FROM bi2 WHERE doc_id % 97 <> 3 GROUP BY g),
      cu AS (
        SELECT w1, count(*) AS cu FROM bi2 WHERE doc_id % 97 <> 3 GROUP BY w1),
      scored AS (
        SELECT e.doc_id,
               CAST(round((COALESCE(cb.cb, 0) + 1)
                     / CAST(COALESCE(cu.cu, 0) + (SELECT v FROM vocab) AS DOUBLE)
                     * 1e9) AS BIGINT) AS sp9
        FROM bi2 e
        LEFT JOIN cb ON cb.g = e.g
        LEFT JOIN cu ON cu.w1 = e.w1
        WHERE e.doc_id % 97 = 3)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(CAST(sum(sp9) AS BIGINT) / 1e9 / count(*), 6) AS avg_p
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id"""))

  // --------------------------------------------------------------- q155
  // Token-length histogram over power-of-2 bins, per language — the
  // length-distribution report that drives q104's chunk size and q106's
  // packing budget (how much of the corpus is short-tail vs long-tail).
  // Log-spaced bins without libm: bin = floor(log2 n) + 1 computed as
  // the BIT LENGTH of the integer token count (length of its binary
  // rendering — exact integer arithmetic in both engines, no log2()
  // whose libm rounding is not a cross-engine contract); bin bounds
  // reconstruct exactly via shiftleft.
  // Scale: one corpus scan into a map-side-combined hash aggregate on
  // (lang, bin) — ≤ |langs| × 64 groups. Nothing else.
  private val q155 = QueryDef(
    "q155_length_histogram",
    (s, d) => {
      docs(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .withColumn("b", length(expr("bin(n)")).cast("long"))
        .groupBy(col("lang"), col("b"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n")).as("min_tok"), max(col("n")).as("max_tok"))
        .select(col("lang"), col("b").as("bin"),
          expr("shiftleft(1L, CAST(b AS INT) - 1)").as("bin_lo"),
          expr("shiftleft(1L, CAST(b AS INT)) - 1").as("bin_hi"),
          col("n_docs"), col("min_tok"), col("max_tok"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""
      WITH t AS (
        SELECT lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents),
      h AS (
        SELECT lang, CAST(length(bin(n)) AS BIGINT) AS bin,
               n
        FROM t)
      SELECT lang, bin,
             CAST(1::BIGINT << (bin - 1) AS BIGINT) AS bin_lo,
             CAST((1::BIGINT << bin) - 1 AS BIGINT) AS bin_hi,
             CAST(count(*) AS BIGINT) AS n_docs,
             min(n) AS min_tok, max(n) AS max_tok
      FROM h
      GROUP BY lang, bin
      ORDER BY lang, bin"""))

  // --------------------------------------------------------------- q159
  // Count-Min sketch — the third member of the mergeable-sketch family
  // (q38 HLL = distinct, q121 Misra–Gries = candidates, CM = frequency
  // ESTIMATES with a one-sided error bound est ∈ [true, true + εN]).
  // Depth d=4, width w=256: the counter table is a FIXED 1024 cells no
  // matter the corpus size, built by one map-side-combined hash
  // aggregate — the sketch is a sum, so 1000 executors each build a
  // partial table and the exchange carries 1024 rows per partition. The
  // row hashes are the house md5 idiom (8 hex chars → 32 bits → mod w),
  // identical integer arithmetic in both engines. The query estimates
  // the exact top-20 tokens (candidates from a TakeOrdered top-k; at
  // 100 TB they'd come from q121's shuffle-free MG pass) against the
  // sketch and reports the guaranteed-nonnegative overestimate — the
  // observability check you run before trusting a sketch in production.
  private val q159 = QueryDef(
    "q159_countmin_sketch",
    (s, d) => {
      val toks = docs(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
      val cand = exact.orderBy(col("exact_n").desc, col("tok")).limit(20)
      val bucketed = toks
        .withColumn("j", explode(expr("sequence(0, 3)")))
        .withColumn("bucket", expr(
          """CAST(conv(substr(md5(concat('cm', CAST(j AS STRING), ':', tok)),
             1, 8), 16, 10) AS BIGINT) % 256"""))
      val cells = bucketed.groupBy(col("j"), col("bucket"))
        .agg(count(lit(1)).as("cell_n"))
      cand
        .withColumn("j", explode(expr("sequence(0, 3)")))
        .withColumn("bucket", expr(
          """CAST(conv(substr(md5(concat('cm', CAST(j AS STRING), ':', tok)),
             1, 8), 16, 10) AS BIGINT) % 256"""))
        .join(broadcast(cells), Seq("j", "bucket"))
        .groupBy(col("tok"))
        .agg(max(col("exact_n")).as("exact_n"), min(col("cell_n")).as("cm_est"))
        .select(col("tok").as("token"), col("exact_n"), col("cm_est"),
          (col("cm_est") - col("exact_n")).as("overest"))
        .orderBy(col("exact_n").desc, col("token"))
    },
    Some("""
      WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      t AS (SELECT tok FROM toks WHERE length(tok) > 0),
      exact AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM t GROUP BY tok),
      cand AS (
        SELECT tok, exact_n FROM exact
        ORDER BY exact_n DESC, tok LIMIT 20),
      bucketed AS (
        SELECT j.j,
               ('0x' || substr(md5('cm' || CAST(j.j AS VARCHAR) || ':' || tok),
                               1, 8))::BIGINT % 256 AS bucket
        FROM t, range(4) AS j(j)),
      cells AS (
        SELECT j, bucket, CAST(count(*) AS BIGINT) AS cell_n
        FROM bucketed GROUP BY j, bucket),
      est AS (
        SELECT c.tok, c.exact_n, min(cl.cell_n) AS cm_est
        FROM cand c, range(4) AS j(j)
        JOIN cells cl
          ON cl.j = j.j
         AND cl.bucket = ('0x' || substr(md5('cm' || CAST(j.j AS VARCHAR)
                                             || ':' || c.tok), 1, 8))
                           ::BIGINT % 256
        GROUP BY c.tok, c.exact_n)
      SELECT tok AS token, exact_n, cm_est, cm_est - exact_n AS overest
      FROM est
      ORDER BY exact_n DESC, token"""))

  // --------------------------------------------------------------- q167
  // Retrieval-quality evaluation: graded nDCG@10 of the BM25 ranking
  // (q110's list) against term-frequency-graded relevance — the eval
  // harness every retrieval stack runs before shipping a ranker change.
  // Gains are 2^min(tf,4)−1 (exact shifts); the 1/log2(rank+1) position
  // discounts are PRECOMPUTED 1e6-scaled integer literals generated once
  // in Scala and inlined into BOTH engines (libm log2 is not a
  // cross-engine contract — the q158 threshold trick), so DCG and the
  // ideal-permutation IDCG are exact BIGINT sums; the one double
  // division happens at the end. All windows/joins run over the 10-row
  // retrieved list — corpus work is exactly q110's (scored scan + tf
  // recount for the ≤|terms| dictionary), nothing rank-quadratic.
  private val ndcgW6: Seq[Long] = (1 to 10)
    .map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  private val q167 = QueryDef(
    "q167_ndcg_eval",
    (s, d) => {
      val wAll = Window.orderBy(col("score").desc, col("doc_id"))
      val top = bm25Scores(s, d)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
        .withColumn("rk", row_number().over(wAll).cast("long"))
      val rel = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(expr(s"array_contains($bm25TermArr, term)"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
      val w6 = (1 to 10).map(i => when(col("rk") === i, lit(ndcgW6(i - 1))))
        .reduceRight(_.otherwise(_))
      val gained = top.join(rel, Seq("doc_id"), "left")
        .withColumn("gain",
          expr("shiftleft(1L, CAST(least(coalesce(tf, 0L), 4L) AS INT)) - 1L"))
        .withColumn("w6", w6)
        .withColumn("irk",
          row_number().over(Window.orderBy(col("gain").desc, col("rk"))).cast("long"))
      val iw6 = (1 to 10).map(i => when(col("irk") === i, lit(ndcgW6(i - 1))))
        .reduceRight(_.otherwise(_))
      gained.withColumn("iw6", iw6)
        .agg(sum(when(col("gain") > 0, 1L).otherwise(0L)).as("n_rel"),
          sum(col("gain") * col("w6")).as("dcg6"),
          sum(col("gain") * col("iw6")).as("idcg6"))
        .select(col("n_rel"),
          round(col("dcg6").cast("double") / lit(1e6), 6).as("dcg"),
          round(col("idcg6").cast("double") / lit(1e6), 6).as("idcg"),
          round(col("dcg6").cast("double") / col("idcg6").cast("double"), 6)
            .as("ndcg"))
    },
    Some {
      val wCase = (1 to 10)
        .map(i => s"WHEN rk = $i THEN ${ndcgW6(i - 1)}").mkString(" ")
      val iwCase = (1 to 10)
        .map(i => s"WHEN irk = $i THEN ${ndcgW6(i - 1)}").mkString(" ")
      s"""
      WITH $bm25Ctes,
      top AS (
        SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id)
                 AS rk
        FROM bm25
        ORDER BY score DESC, doc_id LIMIT 10),
      rel AS (
        SELECT doc_id, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents) t
        WHERE list_contains($bm25TermList, term)
        GROUP BY 1),
      gained AS (
        SELECT rk,
               (1::BIGINT << CAST(least(coalesce(tf, 0), 4) AS INT)) - 1
                 AS gain,
               CASE $wCase END AS w6
        FROM top LEFT JOIN rel USING (doc_id)),
      ideal AS (
        SELECT gain, w6,
               row_number() OVER (ORDER BY gain DESC, rk) AS irk
        FROM gained)
      SELECT CAST(sum(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel,
             round(CAST(sum(gain * w6) AS DOUBLE) / 1e6, 6) AS dcg,
             round(CAST(sum(gain * CASE $iwCase END) AS DOUBLE) / 1e6, 6)
               AS idcg,
             round(CAST(sum(gain * w6) AS DOUBLE) /
                   CAST(sum(gain * CASE $iwCase END) AS DOUBLE), 6) AS ndcg
      FROM ideal"""
    })

  // --------------------------------------------------------------- q186
  // Feature hashing (the hashing trick) — fixed-dimension sparse
  // featurization for linear/online models over an unbounded vocabulary:
  // every token maps to index md5(token) mod 4096, so the feature space
  // is a CONSTANT regardless of corpus vocabulary — no dictionary build,
  // no vocabulary broadcast, no OOV (the q107 dictionary pipeline's
  // trade-off partner). The query materializes the collision accounting
  // a user of the trick needs: for the 20 heaviest feature cells
  // (deterministic count-desc/index-asc cut), the total token mass,
  // document reach, and how many DISTINCT tokens share the cell
  // (collisions are the trick's quality cost; 4096 cells over this
  // corpus's vocabulary gives a visible, checkable collision rate).
  // One token-keyed pre-aggregate absorbs Zipf skew map-side before the
  // cell-keyed rollup (the q107 layout-independence discipline); the
  // top-20 cut is a TakeOrdered heap.
  private val q186 = QueryDef(
    "q186_feature_hashing",
    (s, d) => {
      val toks = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .select(col("doc_id"), col("tok"),
          (conv(substring(md5(col("tok")), 1, 14), 16, 10).cast("long")
            % 4096L).as("feat"))
      toks
        .groupBy(col("feat"), col("tok"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("doc_id")).as("nd"))
        .groupBy(col("feat"))
        .agg(sum(col("cnt")).as("token_mass"),
          count(lit(1)).as("n_distinct_tokens"),
          sum(col("nd")).as("doc_hits"))
        .orderBy(col("token_mass").desc, col("feat"))
        .limit(20)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, tok,
               ('0x' || substr(md5(tok), 1, 14))::BIGINT % 4096 AS feat
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE length(tok) > 0),
      per_tok AS (
        SELECT feat, tok, count(*) AS cnt,
               count(DISTINCT doc_id) AS nd
        FROM toks GROUP BY 1, 2)
      SELECT feat,
             CAST(sum(cnt) AS BIGINT) AS token_mass,
             count(*) AS n_distinct_tokens,
             CAST(sum(nd) AS BIGINT) AS doc_hits
      FROM per_tok
      GROUP BY feat
      ORDER BY token_mass DESC, feat
      LIMIT 20"""))

  // ---------------------------------------------------------------- q204
  // Intra-document repetition filter (Gopher-style, Rae et al. 2021
  // "Scaling Language Models", table A1): the fraction of a document's
  // word 3-grams that are repeats of an earlier 3-gram in the SAME
  // document. Degenerate generated/boilerplate text repeats itself
  // internally, which corpus-level dedup (q31–q35) and corpus-level
  // boilerplate mining (q113) cannot see — those compare ACROSS
  // documents; this scores repetition WITHIN one. The whole computation
  // is per-row scalar array algebra (split → sequence → transform →
  // array_distinct), so the n-gram bag never leaves its row: no explode,
  // no shuffle, perfectly data-parallel over a 100 TB corpus — the only
  // exchange in the plan is the presentation sort. Contrast with q113,
  // whose cross-document n-grams must shuffle by gram. Emits the 20 most
  // repetitive docs with their diagnostic counts — a deterministic
  // (dup_frac DESC, doc_id) top-k, which Spark plans as
  // TakeOrderedAndProject (per-partition heaps, no global sort), so the
  // presentation stage is O(k) per partition too (n≥3 guard keeps the
  // sequence() bounds legal on both engines; Spark's sequence(0,-1)
  // would DESCEND, DuckDB's range(1,0) is empty — the guard makes the
  // edge case unreachable rather than engine-dependent).
  private val q204 = QueryDef(
    "q204_doc_repetition",
    (s, d) =>
      docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") >= 3)
        .select(col("doc_id"), (col("n") - 2).as("n_tri"),
          size(array_distinct(expr(
            "transform(sequence(0, n - 3)," +
              " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
            .as("n_uniq"))
        .withColumn("dup_frac",
          round((col("n_tri") - col("n_uniq")).cast("double") /
            col("n_tri"), 6))
        .orderBy(col("dup_frac").desc, col("doc_id"))
        .limit(20),
    Some("""
      SELECT doc_id, n_tri, n_uniq, dup_frac FROM (
        SELECT doc_id, n_tri, n_uniq,
               round(CAST(n_tri - n_uniq AS DOUBLE) / n_tri, 6) AS dup_frac
        FROM (
          SELECT doc_id, n - 2 AS n_tri,
                 len(list_distinct(list_transform(range(1, n - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                   AS n_uniq
          FROM (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   len(string_split(text, ' ')) AS n
            FROM documents)
          WHERE n >= 3))
      ORDER BY dup_frac DESC, doc_id
      LIMIT 20"""))

  // --------------------------------------------------------------- q217
  // Positional inverted index ([EXT]): real posting lists —
  // "docId@pos1:pos2;docId@…", doc- and position-ordered — over BIGRAM
  // phrase terms (the unigram vocabulary of this corpus is ~31 words,
  // all stopword-hot; bigrams give a real df spectrum and make the
  // positions a usable phrase index). Indexed band: 3 ≤ df ≤ 40, the
  // mid-frequency range a retrieval index actually serves (rarer is
  // noise, hotter is effectively a stop-phrase). This is also the
  // board's ordered-string-aggregation surface: both levels use ANSI
  // `listagg(…) WITHIN GROUP (ORDER BY …)` (Spark 4) mirrored by
  // DuckDB's ordered string_agg, so the strings are deterministic
  // without any sort_array/collect_list nondeterminism. Bigrams explode
  // integer positions via `sequence` (q39's lambda-free generator
  // discipline — keeps whole-stage codegen).
  //
  // Scale discipline: df is computed FIRST on (gram, doc) counts and the
  // band filter joins back BEFORE any posting string is aggregated — a
  // stop-phrase's corpus-sized posting list is never materialized and
  // then discarded. The join keys the band's gram list (data-dependent,
  // not safely broadcastable at 100 TB) through a hash join on gram; the
  // final listagg reuses that partitioning, so giant-string work only
  // ever touches df-banded grams (each bounded at 40 docs). Presentation
  // cut (df desc, gram) is deterministic across engines.
  private val q217 = QueryDef(
    "q217_inverted_index",
    (s, d) => {
      val tokpos = docsSpread(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(1, size(toks) - 1)")).as("i"))
        .select(col("doc_id"),
          concat(col("toks")(col("i") - 1), lit(" "),
            col("toks")(col("i"))).as("g"),
          (col("i") - 1).cast("long").as("pos"))
      val perdoc = tokpos.groupBy(col("g"), col("doc_id"))
        .agg(count(lit(1)).as("tf"),
          expr("listagg(CAST(pos AS STRING), ':') " +
            "WITHIN GROUP (ORDER BY pos)").as("poss"))
      val band = perdoc.groupBy(col("g"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("ttf"))
        .filter(col("df").between(3, 40))
      perdoc.join(band, "g")
        .groupBy(col("g"), col("df"), col("ttf"))
        .agg(expr("listagg(CAST(doc_id AS STRING) || '@' || poss, ';') " +
          "WITHIN GROUP (ORDER BY doc_id)").as("postings"))
        .select(col("g"), col("df"), col("ttf"), col("postings"))
        .orderBy(col("df").desc, col("g"))
        .limit(100)
    },
    Some("""
      WITH tokpos AS (
        SELECT doc_id,
               toks[i] || ' ' || toks[i + 1] AS g,
               CAST(i - 1 AS BIGINT) AS pos
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
        WHERE len(toks) >= 2),
      perdoc AS (
        SELECT g, doc_id, count(*) AS tf,
               string_agg(CAST(pos AS VARCHAR), ':' ORDER BY pos) AS poss
        FROM tokpos GROUP BY g, doc_id),
      band AS (
        SELECT g, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf
        FROM perdoc GROUP BY g
        HAVING count(*) BETWEEN 3 AND 40)
      SELECT band.g, band.df, band.ttf,
             string_agg(CAST(perdoc.doc_id AS VARCHAR) || '@' || perdoc.poss,
                        ';' ORDER BY perdoc.doc_id) AS postings
      FROM perdoc JOIN band ON perdoc.g = band.g
      GROUP BY band.g, band.df, band.ttf
      ORDER BY band.df DESC, band.g
      LIMIT 100"""))

  // --------------------------------------------------------------- q225
  // Jensen–Shannon divergence of each source's language mix vs the
  // corpus ([EXT]): the symmetric, bounded (≤ ln 2) drift measure a
  // curation pipeline watches per ingest source — complements q187 (KS,
  // for CONTINUOUS distributions) and q150 (χ² independence test) with
  // the information-theoretic divergence over a CATEGORICAL axis.
  // JS(P‖Q) = ½ Σ_l [P·ln(P/M) + Q·ln(Q/M)], M = (P+Q)/2, over the
  // source × lang grid (absent languages contribute only the Q side).
  //
  // Determinism: P and Q are correctly-rounded quotients of exact
  // BIGINTs; M = (P+Q)/2 is two exact IEEE ops; each ln-term is
  // quantized to a BIGINT at 1e-12 BEFORE the per-source sum (q214's
  // integer-quantization discipline), so aggregation order is
  // irrelevant. Scale: three map-side-combinable counts off one corpus
  // scan shape; the grid is |sources|×|langs| — dictionary-sized — and
  // every join below the counts is a broadcast of tiny aggregates.
  private val q225 = QueryDef(
    "q225_js_divergence",
    (s, d) => {
      val base = docs(s, d).select(col("source"), col("lang"))
      val csl = base.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c_sl"))
      val ns = base.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val cl = base.groupBy(col("lang")).agg(count(lit(1)).as("c_l"))
      val nTot = base.agg(count(lit(1)).as("n_tot"))
      val grid = ns.crossJoin(broadcast(cl))
        .join(csl, Seq("source", "lang"), "left")
        .crossJoin(broadcast(nTot))
        .withColumn("p", coalesce(col("c_sl"), lit(0L)).cast("double") /
          col("n_s").cast("double"))
        .withColumn("q", col("c_l").cast("double") /
          col("n_tot").cast("double"))
        .withColumn("m", (col("p") + col("q")) / lit(2.0))
        .withColumn("tp", when(col("p") > 0,
          round(col("p") * log(col("p") / col("m")) * lit(1e12)).cast("long"))
          .otherwise(lit(0L)))
        .withColumn("tq",
          round(col("q") * log(col("q") / col("m")) * lit(1e12)).cast("long"))
      grid.groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"),
          round((sum(col("tp") + col("tq")).cast("double") / lit(1e12)) /
            lit(2.0), 6).as("js_nats"))
        .orderBy(col("source"))
    },
    Some("""
      WITH base AS (SELECT source, lang FROM documents),
      csl AS (SELECT source, lang, count(*) AS c_sl FROM base GROUP BY 1, 2),
      ns AS (SELECT source, count(*) AS n_s FROM base GROUP BY 1),
      cl AS (SELECT lang, count(*) AS c_l FROM base GROUP BY 1),
      nt AS (SELECT count(*) AS n_tot FROM base),
      grid AS (
        SELECT ns.source, ns.n_s, cl.lang, cl.c_l,
               coalesce(csl.c_sl, 0) AS c_sl, nt.n_tot
        FROM ns CROSS JOIN cl
        LEFT JOIN csl ON csl.source = ns.source AND csl.lang = cl.lang,
        nt),
      terms AS (
        SELECT source, n_s,
               CAST(c_sl AS DOUBLE) / CAST(n_s AS DOUBLE) AS p,
               CAST(c_l AS DOUBLE) / CAST(n_tot AS DOUBLE) AS q
        FROM grid),
      qt AS (
        SELECT source, n_s,
               CASE WHEN p > 0 THEN CAST(round(
                 p * ln(p / ((p + q) / 2.0)) * 1e12) AS BIGINT)
                    ELSE 0 END AS tp,
               CAST(round(q * ln(q / ((p + q) / 2.0)) * 1e12) AS BIGINT)
                 AS tq
        FROM terms)
      SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
             round((CAST(sum(tp + tq) AS DOUBLE) / 1e12) / 2.0, 6)
               AS js_nats
      FROM qt
      GROUP BY source
      ORDER BY source"""))

  // --------------------------------------------------------------- q227
  // RAKE keyword extraction ([EXT]): Rapid Automatic Keyword Extraction
  // (Rose et al. 2010) — candidate phrases are maximal runs of non-stop
  // words; each word scores deg(w)/freq(w) where deg(w) sums the lengths
  // of phrases containing w; a phrase scores the sum of its word scores.
  // A different beast from TF-IDF (q37) / BM25 (q110): no document
  // frequency at all, pure co-occurrence structure. Corpus rollup keeps
  // (phrase, n_occurrences, score) for the top 20.
  //
  // Phrase identity is derived POSITIONALLY: a per-doc running count of
  // stopwords splits token streams into phrases — one window partitioned
  // by doc_id (per-doc work, corpus-parallel, no global state). Word
  // scores are exact-integer ratios quantized at 1e-9 BEFORE the
  // per-phrase sum (q214 discipline), so phrase scores are
  // order-independent and identical cross-engine. Word/phrase aggregate
  // domains are vocabulary-bounded, not corpus-bounded.
  private val q227 = QueryDef(
    "q227_rake_keywords",
    (s, d) => {
      val toks = docs(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "w")
        .withColumn("is_stop", expr(s"array_contains($stopArr, w)"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val marked = toks
        .withColumn("ph", sum(when(col("is_stop"), 1L).otherwise(0L))
          .over(wDoc))
        .filter(!col("is_stop"))
      val wPh = Window.partitionBy(col("doc_id"), col("ph"))
      val rows = marked.withColumn("plen", count(lit(1)).over(wPh))
      val wordScore = rows.groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .select(col("w"),
          round(col("deg").cast("double") / col("freq").cast("double") *
            lit(1e9)).cast("long").as("ws_q"))
      val phrases = rows.join(wordScore, "w")
        .groupBy(col("doc_id"), col("ph"))
        .agg(expr("listagg(w, ' ') WITHIN GROUP (ORDER BY pos)")
          .as("phrase"),
          sum(col("ws_q")).as("score_q"))
      phrases.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occ"),
          round(max(col("score_q")).cast("double") / lit(1e9), 6)
            .as("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(20)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, u.pos, u.w,
               list_contains($stopList, u.w) AS is_stop
        FROM (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
        LATERAL (SELECT unnest(l) AS w,
                        generate_subscripts(l, 1) AS pos) u),
      marked AS (
        SELECT doc_id, pos, w,
               sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS ph
        FROM toks
        QUALIFY NOT is_stop),
      rows_ AS (
        SELECT doc_id, pos, w, ph,
               count(*) OVER (PARTITION BY doc_id, ph) AS plen
        FROM marked),
      ws AS (
        SELECT w, CAST(round(CAST(sum(plen) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE) * 1e9) AS BIGINT) AS ws_q
        FROM rows_ GROUP BY w),
      phrases AS (
        SELECT r.doc_id, r.ph,
               string_agg(r.w, ' ' ORDER BY r.pos) AS phrase,
               CAST(sum(ws.ws_q) AS BIGINT) AS score_q
        FROM rows_ r JOIN ws ON r.w = ws.w
        GROUP BY r.doc_id, r.ph)
      SELECT phrase, count(*) AS n_occ,
             round(CAST(max(score_q) AS DOUBLE) / 1e9, 6) AS score
      FROM phrases
      GROUP BY phrase
      ORDER BY score DESC, phrase
      LIMIT 20"""))

  // --------------------------------------------------------------- q233
  // Good–Turing frequency-of-frequencies per language ([EXT]): the
  // count-of-counts table n_r (how many word TRIGRAMS occur exactly r
  // times), the unseen-probability mass estimate p₀ = n₁/N, and the
  // discounted counts r* = (r+1)·n_{r+1}/n_r — the smoothing arithmetic
  // every n-gram LM (q147) builds on, and the standard "how much of the
  // distribution haven't we seen" diagnostic for corpus coverage.
  // Trigrams, not unigrams: this corpus's ~31-word vocabulary has no
  // singleton unigrams, while the trigram tail is rich at every SF.
  //
  // Determinism: n_r and N are exact integers; p₀ and r* ship as single
  // correctly-rounded divisions, unrounded (q226 lesson), with r* = 0
  // by convention where n_{r+1} = 0 (NULL would hash differently across
  // engines' parquet writers). Scale: trigram counts are one
  // gram-keyed map-side-combinable aggregate (Zipf skew absorbed in
  // partials); count-of-counts then runs on the (r) grid — bounded by
  // the max repeat count, not the corpus; output keeps r ≤ 5.
  private val q233 = QueryDef(
    "q233_good_turing",
    (s, d) => {
      val grams = docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("lang"), col("toks"),
          explode(expr("sequence(2, size(toks) - 1)")).as("i"))
        .select(col("lang"),
          concat_ws(" ", col("toks")(col("i") - 2),
            col("toks")(col("i") - 1), col("toks")(col("i"))).as("g"))
      val gc = grams.groupBy(col("lang"), col("g"))
        .agg(count(lit(1)).as("r"))
      val nr = gc.groupBy(col("lang"), col("r"))
        .agg(count(lit(1)).as("n_r"))
      val tot = gc.groupBy(col("lang"))
        .agg(sum(col("r")).as("n_tok"), count(lit(1)).as("vocab"))
      val nr1 = nr.select(col("lang"), (col("r") - 1).as("r"),
        col("n_r").as("n_r_next"))
      nr.join(nr1, Seq("lang", "r"), "left")
        .join(tot, "lang")
        .filter(col("r") <= 5)
        .select(col("lang"), col("r"), col("n_r"), col("n_tok"),
          col("vocab"),
          (when(col("r") === 1,
            col("n_r").cast("double") / col("n_tok").cast("double"))
            .otherwise(lit(0.0))).as("p0"),
          coalesce((col("r") + 1).cast("double") *
            col("n_r_next").cast("double") / col("n_r").cast("double"),
            lit(0.0)).as("r_star"))
        .orderBy(col("lang"), col("r"))
    },
    Some("""
      WITH grams AS (
        SELECT lang,
               toks[i - 1] || ' ' || toks[i] || ' ' || toks[i + 1] AS g
        FROM (SELECT lang, str_split(text, ' ') AS toks FROM documents),
        LATERAL (SELECT unnest(range(2, len(toks))) AS i) u
        WHERE len(toks) >= 3),
      gc AS (
        SELECT lang, g, count(*) AS r FROM grams GROUP BY 1, 2),
      nr AS (
        SELECT lang, r, count(*) AS n_r FROM gc GROUP BY 1, 2),
      tot AS (
        SELECT lang, CAST(sum(r) AS BIGINT) AS n_tok,
               count(*) AS vocab
        FROM gc GROUP BY 1)
      SELECT nr.lang, nr.r, nr.n_r, tot.n_tok, tot.vocab,
             CASE WHEN nr.r = 1
                  THEN CAST(nr.n_r AS DOUBLE) / CAST(tot.n_tok AS DOUBLE)
                  ELSE 0.0 END AS p0,
             coalesce(CAST(nr.r + 1 AS DOUBLE) *
                      CAST(n2.n_r AS DOUBLE) / CAST(nr.n_r AS DOUBLE),
                      0.0) AS r_star
      FROM nr
      LEFT JOIN nr n2 ON n2.lang = nr.lang AND n2.r = nr.r + 1
      JOIN tot ON tot.lang = nr.lang
      WHERE nr.r <= 5
      ORDER BY nr.lang, nr.r"""))

  // --------------------------------------------------------------- q236
  // BPE merge-pair statistics, two real merge rounds ([EXT]): the
  // tokenizer-induction arithmetic (Sennrich et al.) beside q107's
  // fixed-vocabulary OOV — count adjacent symbol pairs weighted by word
  // frequency, take the top merge, APPLY it, and re-count. Output =
  // top-3 pairs per (lang, round) with exact integer counts; round 2's
  // table contains pairs built on the round-1 merged symbol, proving
  // the application step is real, not just a ranking.
  //
  // Scale shape is the one every real BPE trainer uses: the corpus is
  // touched ONCE, by the map-side-combinable (lang, word) frequency
  // aggregate; all merge arithmetic runs on the vocabulary-bounded
  // dictionary, and the 1-row-per-lang winning merge broadcasts back.
  // The merge applies via literal replace of ' pa pb' (leading-space
  // anchor, NO trailing space): on round-1 single-char symbol streams
  // this equals token-level greedy leftmost non-overlapping BPE merging
  // — including chains like 'llll' → [ll, ll], where an anchored
  // trailing space would consume the separator and under-merge. The
  // spec recomputes both rounds with true token-level merging.
  private val q236 = QueryDef(
    "q236_bpe_merges",
    (s, d) => {
      val words = docs(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("f"))
        .withColumn("sym",
          concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
      def pairCounts(df: DataFrame): DataFrame = df
        .withColumn("toks", split(trim(col("sym")), " "))
        .select(col("lang"), col("f"), col("toks"),
          explode(expr("sequence(1, size(toks) - 1)")).as("i"))
        .groupBy(col("lang"), element_at(col("toks"), col("i")).as("pa"),
          element_at(col("toks"), col("i") + 1).as("pb"))
        .agg(sum(col("f")).as("cnt"))
      val r1 = pairCounts(words)
      val top1 = r1.withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("cnt").desc, col("pa"), col("pb"))))
        .filter(col("rn") === 1)
        .select(col("lang"), col("pa").as("p1a"), col("pb").as("p1b"))
      val r2 = pairCounts(words.join(broadcast(top1), "lang")
        .withColumn("sym",
          expr("replace(sym, ' ' || p1a || ' ' || p1b, ' ' || p1a || p1b)")))
      val allR = r1.withColumn("round", lit(1L))
        .unionByName(r2.withColumn("round", lit(2L)))
      allR.withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"), col("round"))
            .orderBy(col("cnt").desc, col("pa"), col("pb"))).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("lang"), col("round"), col("rk"),
          concat(col("pa"), lit("+"), col("pb")).as("pair"), col("cnt"))
        .orderBy(col("lang"), col("round"), col("rk"))
    },
    Some("""
      WITH words AS (
        SELECT lang, w AS word, count(*) AS f
        FROM (SELECT lang, unnest(str_split(text, ' ')) AS w
              FROM documents)
        WHERE len(w) >= 2 GROUP BY 1, 2),
      sym1 AS (
        SELECT lang, f,
               ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS sym
        FROM words),
      r1 AS (
        SELECT lang, toks[i] AS pa, toks[i + 1] AS pb,
               CAST(sum(f) AS BIGINT) AS cnt
        FROM (SELECT lang, f, str_split(trim(sym), ' ') AS toks
              FROM sym1),
             LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
        GROUP BY 1, 2, 3),
      t1 AS (
        SELECT lang, pa, pb FROM (
          SELECT lang, pa, pb,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY cnt DESC, pa, pb) AS rn
          FROM r1) WHERE rn = 1),
      sym2 AS (
        SELECT s.lang, s.f,
               replace(s.sym, ' ' || t.pa || ' ' || t.pb,
                 ' ' || t.pa || t.pb) AS sym
        FROM sym1 s JOIN t1 t ON s.lang = t.lang),
      r2 AS (
        SELECT lang, toks[i] AS pa, toks[i + 1] AS pb,
               CAST(sum(f) AS BIGINT) AS cnt
        FROM (SELECT lang, f, str_split(trim(sym), ' ') AS toks
              FROM sym2),
             LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
        GROUP BY 1, 2, 3),
      allr AS (
        SELECT lang, CAST(1 AS BIGINT) AS round, pa, pb, cnt FROM r1
        UNION ALL
        SELECT lang, CAST(2 AS BIGINT) AS round, pa, pb, cnt FROM r2)
      SELECT lang, round, rk, pair, cnt FROM (
        SELECT lang, round,
               row_number() OVER (PARTITION BY lang, round
                 ORDER BY cnt DESC, pa, pb) AS rk,
               pa || '+' || pb AS pair, cnt
        FROM allr) t
      WHERE rk <= 3
      ORDER BY lang, round, rk"""))

  // --------------------------------------------------------------- q228
  // Flesch reading-ease per source ([EXT]): the classic readability
  // screen 206.835 − 1.015·(W/S) − 84.6·(Y/W) over exact per-source
  // word (W), sentence (S) and syllable (Y) counts — syllables by the
  // standard vowel-group heuristic `[aeiouy]+`, sentences by terminal
  // punctuation runs `[.!?]+` floored at one per document. Complements
  // q41's length/stopword quality score with the psycholinguistic
  // standard every curation stack reports.
  //
  // Determinism: the three counts are exact integer sums (map-side
  // combinable); the formula is a fixed-order chain of
  // correctly-rounded IEEE ops on identical inputs, so no quantization
  // is needed. regexp_count (Spark) and len(regexp_extract_all)
  // (DuckDB) agree on these character-class-plus patterns. One corpus
  // scan, dictionary-sized output.
  private val q228 = QueryDef(
    "q228_readability",
    (s, d) => {
      docs(s, d).select(col("source"),
          size(split(col("text"), " ")).cast("long").as("w"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .cast("long").as("sent"),
          regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
            .as("syl"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
          sum(col("sent")).as("sentences"), sum(col("syl")).as("syllables"))
        .select(col("source"), col("n_docs"), col("words"),
          col("sentences"), col("syllables"),
          Num.roundZ(lit(206.835) -
            lit(1.015) * (col("words").cast("double") /
              col("sentences").cast("double")) -
            lit(84.6) * (col("syllables").cast("double") /
              col("words").cast("double")), 4).as("flesch"))
        .orderBy(col("source"))
    },
    Some("""
      SELECT source, count(*) AS n_docs,
             CAST(sum(w) AS BIGINT) AS words,
             CAST(sum(sent) AS BIGINT) AS sentences,
             CAST(sum(syl) AS BIGINT) AS syllables,
             (CAST(round((206.835
                   - 1.015 * (CAST(sum(w) AS DOUBLE) /
                              CAST(sum(sent) AS DOUBLE))
                   - 84.6 * (CAST(sum(syl) AS DOUBLE) /
                             CAST(sum(w) AS DOUBLE))) * 1e4) AS BIGINT) / 1e4) AS flesch
      FROM (
        SELECT source,
               len(str_split(text, ' ')) AS w,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sent,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
        FROM documents)
      GROUP BY source
      ORDER BY source"""))

  // --------------------------------------------------------------- q276
  // Vocabulary COVERAGE curve ([EXT]) — the sizing evidence behind
  // q107's fixed top-V cut: what fraction of total token MASS do the
  // top-100 / top-1k / top-10k vocabulary entries cover? On a Zipfian
  // corpus the curve saturates fast; where it crosses the product's
  // OOV budget is the vocab size to ship. Reported at each cut with
  // the realized cut rank (min(k, |V|), so small SFs keep all three
  // rows) and the mass share.
  //
  // Scale (q107/q253 discipline): ONE corpus scan into the map-side-
  // combined token count; ranking + cumulative mass run on the
  // VOCAB-sized grid (the q107 top-V window shape); the 3-row cut
  // table joins by equality on the realized rank. Exact integers
  // everywhere except the final rounded share.
  private val q276 = QueryDef(
    "q276_vocab_coverage",
    (s, d) => {
      val cnt = docs(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum(col("c")).as("mass"),
        count(lit(1)).as("v_size"))
      val wRank = Window.orderBy(col("c").desc, col("tok"))
      val ranked = cnt
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("cum",
          sum(col("c")).over(wRank.rowsBetween(Window.unboundedPreceding, 0)))
      val cuts = ranked.sparkSession.range(1)
        .select(explode(array(lit(100L), lit(1000L), lit(10000L))).as("k"))
      cuts.crossJoin(broadcast(tot))
        .withColumn("rk", least(col("k"), col("v_size")))
        .join(ranked.select(col("rk"), col("cum")), Seq("rk"))
        .select(col("k").as("vocab_cut"), col("rk").as("realized_rank"),
          col("v_size"), col("cum").as("mass_covered"), col("mass"),
          round(col("cum").cast("double") / col("mass").cast("double"), 6)
            .as("coverage"))
        .orderBy(col("vocab_cut"))
    },
    Some("""
      WITH cnt AS (
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS mass,
                     count(*) AS v_size FROM cnt),
      ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT)
                 AS rk,
               sum(c) OVER (ORDER BY c DESC, tok
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM cnt),
      cuts AS (SELECT unnest([100, 1000, 10000]) AS k)
      SELECT CAST(cuts.k AS BIGINT) AS vocab_cut,
             least(cuts.k, tot.v_size) AS realized_rank,
             tot.v_size, CAST(ranked.cum AS BIGINT) AS mass_covered,
             tot.mass,
             round(CAST(ranked.cum AS DOUBLE) / CAST(tot.mass AS DOUBLE), 6)
               AS coverage
      FROM cuts, tot
      JOIN ranked ON ranked.rk = least(cuts.k, tot.v_size)
      ORDER BY vocab_cut"""))

  // --------------------------------------------------------------- q275
  // TF-IDF lexical COSINE similarity, top-20 document pairs ([EXT]) —
  // the lexical-VECTOR member of the near-dup family: q31/q32 score SET
  // overlap (Jaccard), q34/q255 score dense embeddings; this scores the
  // classic sparse tf·idf vectors — the weighting that lets two
  // documents match on their RARE shared vocabulary while stopword
  // co-occurrence contributes ~nothing. Sparse dot products come from
  // ONE token-keyed self-join restricted to df ≤ 64 tokens (the
  // hot-token cap, same MaxBucket discipline as every LSH family here:
  // a df-10⁶ token contributes ~zero idf weight yet df² join rows, so
  // the cap trades vanishing score mass for bounded fan-out — and it is
  // mirrored in the oracle). idf = ln(N/df) rounds to the 1e-6 grid
  // immediately (q216's transcendental precedent), so every pair term
  // wa·wb is an exact BIGINT product; the one float step per pair is
  // the final normalize-and-round. Norms sum the SAME quantized
  // integers, so they are exact too. Top-20 is a TakeOrdered heap.
  private val q275 = QueryDef(
    "q275_tfidf_cosine_pairs",
    (s, d) => {
      val tf = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val nDocs = docs(s, d).agg(count(lit(1)).as("n"))
      val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 64L)
      val w = tf.join(dfc, Seq("tok")).crossJoin(broadcast(nDocs))
        .select(col("tok"), col("doc_id"),
          (col("tf") * round(lit(1e6) *
            log(col("n").cast("double") / col("df").cast("double")))
            .cast("long")).as("wq"))
      val norms = w.groupBy(col("doc_id"))
        .agg(sum(col("wq") * col("wq")).as("n2"))
      val pairs = w.select(col("tok"), col("doc_id").as("da"),
          col("wq").as("wa"))
        .join(w.select(col("tok"), col("doc_id").as("db"),
          col("wq").as("wb")), Seq("tok"))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db"))
        .agg(sum(col("wa") * col("wb")).as("dot"), count(lit(1)).as("n_shared"))
      pairs
        .join(norms.select(col("doc_id").as("da"), col("n2").as("na")),
          Seq("da"))
        .join(norms.select(col("doc_id").as("db"), col("n2").as("nb")),
          Seq("db"))
        .select(col("da"), col("db"), col("n_shared"),
          round(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
            6).as("cos"))
        .orderBy(col("cos").desc, col("da"), col("db"))
        .limit(20)
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
        GROUP BY 1, 2),
      nd AS (SELECT count(*) AS n FROM documents),
      dfc AS (
        SELECT tok, count(*) AS df FROM tf GROUP BY tok
        HAVING count(*) <= 64),
      w AS (
        SELECT tf.tok, tf.doc_id,
               CAST(tf.tf * CAST(round(1e6 * ln(CAST(nd.n AS DOUBLE)
                 / CAST(dfc.df AS DOUBLE))) AS BIGINT) AS BIGINT) AS wq
        FROM tf JOIN dfc USING (tok), nd),
      norms AS (
        SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS n2
        FROM w GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
               CAST(sum(a.wq * b.wq) AS BIGINT) AS dot,
               count(*) AS n_shared
        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT da, db, n_shared,
             round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
               6) AS cos
      FROM pairs
      JOIN norms na ON na.doc_id = da
      JOIN norms nb ON nb.doc_id = db
      ORDER BY cos DESC, da, db
      LIMIT 20"""))

  // --------------------------------------------------------------- q264
  // PROXIMITY-ranked retrieval ([EXT]) — the positional-query layer over
  // q217's positional inverted index: for a two-term query (the top-2
  // document-frequency tokens — data-derived so every SF has hits), rank
  // documents containing BOTH terms by their MINIMUM token span. BM25
  // (q110) is bag-of-words; "terms near each other" is the classic
  // second-stage signal (phrase/proximity scoring) a retrieval stack
  // adds next.
  //
  // The min-span is computed the SCALE-CORRECT way: merge both terms'
  // positions into one sorted per-doc array and take the min gap over
  // ADJACENT entries with different tags — LINEAR in occurrences (the
  // two-pointer algorithm as a sort + adjacent scan), identical to the
  // min over the occA×occB cross product the oracle's definition-form
  // self-join computes; the hash match proves the equivalence. Per-doc
  // arrays are occurrence-bounded; the only corpus exchange is the
  // doc-keyed aggregate; the dictionary/top-2 cut is vocab-sized
  // (q107/q253 discipline); top-20 is a TakeOrdered heap.
  private val q264 = QueryDef(
    "q264_proximity_rank",
    (s, d) => {
      val tokpos = docs(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("tok"))
      val dfc = tokpos.select(col("doc_id"), col("tok")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
      val wTop = Window.orderBy(col("dfc").desc, col("tok"))
      val top2 = dfc.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 2).select(col("tok"), col("rk").cast("long")
          .as("rk"))
      val hits = tokpos.join(broadcast(top2), Seq("tok"))
      val perdoc = hits.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("rk")))).as("arr"),
          sum(when(col("rk") === 1L, 1L).otherwise(0L)).as("tf_a"),
          sum(when(col("rk") === 2L, 1L).otherwise(0L)).as("tf_b"))
        .filter(col("tf_a") > 0L && col("tf_b") > 0L)
      perdoc
        .select(col("doc_id"), col("tf_a"), col("tf_b"), col("arr"),
          explode(expr("sequence(0, size(arr) - 2)")).as("i"))
        .filter(col("arr")(col("i")).getField("rk") =!=
          col("arr")(col("i") + 1).getField("rk"))
        .select(col("doc_id"), col("tf_a"), col("tf_b"),
          (col("arr")(col("i") + 1).getField("pos") -
            col("arr")(col("i")).getField("pos")).as("span"))
        .groupBy(col("doc_id"), col("tf_a"), col("tf_b"))
        .agg(min(col("span")).as("min_span"))
        .select(col("doc_id"), col("tf_a"), col("tf_b"), col("min_span"),
          round(lit(1.0) / (lit(1L) + col("min_span")).cast("double"), 6)
            .as("prox_score"))
        .orderBy(col("min_span"), col("doc_id"))
        .limit(20)
    },
    Some("""
      WITH tokpos AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
        LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) u),
      dfc AS (
        SELECT tok, count(*) AS dfc FROM (
          SELECT DISTINCT doc_id, tok FROM tokpos) GROUP BY 1),
      top2 AS (
        SELECT tok, CAST(rk AS BIGINT) AS rk FROM (
          SELECT tok, row_number() OVER (ORDER BY dfc DESC, tok) AS rk
          FROM dfc) t
        WHERE rk <= 2),
      hits AS (
        SELECT doc_id, pos, rk FROM tokpos JOIN top2 USING (tok)),
      tf AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS tf_a,
               CAST(sum(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS tf_b
        FROM hits GROUP BY 1),
      spans AS (
        SELECT a.doc_id, CAST(min(abs(a.pos - b.pos)) AS BIGINT)
                 AS min_span
        FROM hits a JOIN hits b
          ON a.doc_id = b.doc_id AND a.rk = 1 AND b.rk = 2
        GROUP BY 1)
      SELECT s.doc_id, tf.tf_a, tf.tf_b, s.min_span,
             round(1.0 / CAST(1 + s.min_span AS DOUBLE), 6) AS prox_score
      FROM spans s JOIN tf USING (doc_id)
      WHERE tf.tf_a > 0 AND tf.tf_b > 0
      ORDER BY s.min_span, s.doc_id
      LIMIT 20"""))

  // --------------------------------------------------------------- q253
  // Distinctive terms per source — smoothed odds-ratio keyness (the
  // log-odds-ratio report of Monroe et al. with the log dropped): for
  // each source, which tokens are over-represented vs the REST of the
  // corpus? OR(s,t) = ((c_st+1)/(n_s−c_st+1)) / ((c_rest+1)/(n_rest−
  // c_rest+1)) with add-one smoothing — the "what is this source
  // actually about" audit that drives q115's mixture weights and flags
  // template/boilerplate sources (their distinctive terms are markup).
  // The log is DELIBERATELY not taken: OR is a ratio of exact integer
  // ratios (monotone in the log — identical ranking), so the score is
  // one fixed-order double expression of BIGINTs, bit-identical
  // cross-engine (q133's rationale: libm is not a contract).
  //
  // Scale: one corpus scan → map-side-combined (source, token) counts;
  // everything downstream is DICTIONARY-sized — per-token totals re-
  // aggregate from the (source, token) table (vocab-keyed exchange, no
  // second corpus pass), per-source totals broadcast (|sources| rows),
  // the top-5 cut is a per-source window over vocab-sized rows (the
  // q107 top-V shape — bounded by the dictionary, never the corpus).
  private val q253 = QueryDef(
    "q253_distinctive_terms",
    (s, d) => {
      val st = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("c_st"))
      val tt = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
      val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
      val tot = ns.agg(sum(col("n_s")).as("nn"))
      val scored = st.join(tt, Seq("tok"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(tot))
        .withColumn("c_rest", col("c_t") - col("c_st"))
        .withColumn("n_rest", col("nn") - col("n_s"))
        .withColumn("or_ratio", round(
          ((col("c_st") + 1L).cast("double") /
            (col("n_s") - col("c_st") + 1L).cast("double")) /
            ((col("c_rest") + 1L).cast("double") /
              (col("n_rest") - col("c_rest") + 1L).cast("double")), 6))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("or_ratio").desc, col("tok"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk").cast("long").as("rk"), col("tok"),
          col("c_st"), col("or_ratio"))
        .orderBy(col("source"), col("rk"))
    },
    Some("""
      WITH st AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents),
      c AS (SELECT source, tok, count(*) AS c_st FROM st GROUP BY 1, 2),
      tt AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM c GROUP BY 1),
      ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM c GROUP BY 1),
      tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn FROM ns),
      scored AS (
        SELECT c.source, c.tok, c.c_st,
               round(((CAST(c.c_st + 1 AS DOUBLE))
                   / (CAST(ns.n_s - c.c_st + 1 AS DOUBLE)))
                 / ((CAST(tt.c_t - c.c_st + 1 AS DOUBLE))
                   / (CAST(tot.nn - ns.n_s - (tt.c_t - c.c_st) + 1
                      AS DOUBLE))), 6) AS or_ratio
        FROM c JOIN tt USING (tok) JOIN ns USING (source), tot)
      SELECT source, CAST(rk AS BIGINT) AS rk, tok, c_st, or_ratio FROM (
        SELECT source, tok, c_st, or_ratio,
               row_number() OVER (PARTITION BY source
                 ORDER BY or_ratio DESC, tok) AS rk
        FROM scored) t
      WHERE rk <= 5
      ORDER BY source, rk"""))

  // --------------------------------------------------------------- q278
  // Zipf-law slope of the corpus token distribution ([EXT]) — the
  // power-law diagnostic behind q276's coverage curve: OLS of ln(freq)
  // on ln(rank) over the top-1000 vocabulary entries. A healthy natural
  // corpus reads slope ≈ −1; template/boilerplate-heavy or synthetic
  // corpora flatten or steepen it, so the slope is the one-number
  // corpus-health screen a curation dashboard tracks per snapshot.
  //
  // Scale (q276 discipline): ONE corpus scan into the map-side-combined
  // token count; ranking runs on the VOCAB-sized grid and the regression
  // on its top-1000 survivors. Exactness: ln is libm (q216 precedent) so
  // each ln quantizes to a 1e-6 grid IMMEDIATELY (xq/yq BIGINTs — the
  // coarse grid makes a cross-engine ln ulp flipping a rounded cell
  // ~1e-9-improbable per value, and both engines then compute on
  // IDENTICAL quantized values); products re-quantize to 1e-9-scaled
  // BIGINTs pre-sum so the moment sums are exact and order-independent;
  // the closed-form slope/intercept are the same chained IEEE expression
  // in both engines, signed-zero-safe via roundZ.
  private val q278 = QueryDef(
    "q278_zipf_slope",
    (s, d) => {
      val cnt = docs(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val wRank = Window.orderBy(col("c").desc, col("tok"))
      val top = cnt.withColumn("rk", row_number().over(wRank).cast("long"))
        .filter(col("rk") <= 1000L)
        .withColumn("xq",
          round(log(col("rk").cast("double")) * lit(1e6)).cast("long"))
        .withColumn("yq",
          round(log(col("c").cast("double")) * lit(1e6)).cast("long"))
        .withColumn("xy9", round((col("xq").cast("double") / lit(1e6)) *
          (col("yq").cast("double") / lit(1e6)) * lit(1e9)).cast("long"))
        .withColumn("xx9", round((col("xq").cast("double") / lit(1e6)) *
          (col("xq").cast("double") / lit(1e6)) * lit(1e9)).cast("long"))
      val m = top.agg(count(lit(1)).as("n"),
        sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
        sum(col("xy9")).as("sxy"), sum(col("xx9")).as("sxx"))
      val slope = (col("n").cast("double") * (col("sxy").cast("double") / lit(1e9))
        - (col("sx").cast("double") / lit(1e6)) * (col("sy").cast("double") / lit(1e6)))
        .divide(col("n").cast("double") * (col("sxx").cast("double") / lit(1e9))
          - (col("sx").cast("double") / lit(1e6)) * (col("sx").cast("double") / lit(1e6)))
      m.select(col("n").as("n_ranks"),
        Num.roundZ(slope, 6).as("zipf_slope"),
        Num.roundZ(((col("sy").cast("double") / lit(1e6)) - slope *
          (col("sx").cast("double") / lit(1e6))) / col("n").cast("double"), 6)
          .as("zipf_intercept"))
    },
    Some("""
      WITH cnt AS (
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok),
      top AS (
        SELECT rk, c FROM (
          SELECT c, tok,
                 row_number() OVER (ORDER BY c DESC, tok) AS rk
          FROM cnt) t
        WHERE rk <= 1000),
      q AS (
        SELECT CAST(round(ln(CAST(rk AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
               CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS yq
        FROM top),
      t2 AS (
        SELECT xq, yq,
               CAST(round((CAST(xq AS DOUBLE) / 1e6)
                 * (CAST(yq AS DOUBLE) / 1e6) * 1e9) AS BIGINT) AS xy9,
               CAST(round((CAST(xq AS DOUBLE) / 1e6)
                 * (CAST(xq AS DOUBLE) / 1e6) * 1e9) AS BIGINT) AS xx9
        FROM q),
      m AS (
        SELECT count(*) AS n,
               CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
               CAST(sum(xy9) AS BIGINT) AS sxy,
               CAST(sum(xx9) AS BIGINT) AS sxx
        FROM t2)
      SELECT n AS n_ranks,
             (CAST(round(((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                 - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
                / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                 - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6)))
               * 1e6) AS BIGINT) / 1e6) AS zipf_slope,
             (CAST(round((((CAST(sy AS DOUBLE) / 1e6)
                 - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e9)
                     - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
                    / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e9)
                     - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6)))
                   * (CAST(sx AS DOUBLE) / 1e6)) / CAST(n AS DOUBLE))
               * 1e6) AS BIGINT) / 1e6) AS zipf_intercept
      FROM m"""))

  // --------------------------------------------------------------- q279
  // Good–Turing frequency-of-frequencies ([EXT]) — the unseen-mass
  // estimate that complements q276 (how much mass the KNOWN vocabulary
  // covers) with how much probability mass belongs to tokens NEVER seen:
  // P0 = N1/N (singleton share of token mass), plus the smoothed
  // Good–Turing adjusted counts r* = (r+1)·N_{r+1}/N_r for r = 1..5 —
  // the low-frequency reliability table a tokenizer/LM data audit reads
  // before trusting tail counts.
  //
  // Scale: the frequency-of-frequencies table is a VALUE-DOMAIN grid
  // (distinct freq values), derived from the one map-side-combined token
  // count by a second tiny hash agg; everything downstream runs on its
  // 5 rarest rows. All counts exact BIGINTs; the two ratios are single
  // correctly-rounded divisions of exact integers. The textbook table is
  // r = 1..5, but this driver corpus's frequency floor is high (min
  // observed freq 26 at sf0.01 — tiny vocab, heavy repetition), so the
  // report covers the 5 RAREST OBSERVED frequencies — identical
  // semantics on a natural-tail corpus, non-degenerate here; n_next and
  // r* honestly read 0 when r+1 is unoccupied, and p_unseen = N1/N reads
  // 0 when no singletons exist.
  private val q279 = QueryDef(
    "q279_unigram_good_turing",
    (s, d) => {
      val cnt = docs(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val fof = cnt.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
      val tots = cnt.agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("v_size"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"))
      val wR = Window.orderBy(col("r")) // fof-grid-sized, value domain
      fof.withColumn("rk", row_number().over(wR).cast("long"))
        .filter(col("rk") <= 5L)
        .join(fof.select((col("r") - 1L).as("r"), col("n_r").as("n_next")),
          Seq("r"), "left")
        .crossJoin(broadcast(tots))
        .select(col("rk"), col("r"), col("n_r"),
          coalesce(col("n_next"), lit(0L)).as("n_next"),
          round(((col("r") + 1L) * coalesce(col("n_next"), lit(0L)))
            .cast("double") / col("n_r").cast("double"), 6).as("r_star"),
          col("v_size"), col("n_tokens"),
          round(col("n1").cast("double") / col("n_tokens").cast("double"), 6)
            .as("p_unseen"))
        .orderBy(col("rk"))
    },
    Some("""
      WITH cnt AS (
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok),
      fof AS (SELECT c AS r, count(*) AS n_r FROM cnt GROUP BY c),
      low AS (
        SELECT r, n_r, rk FROM (
          SELECT r, n_r, row_number() OVER (ORDER BY r) AS rk FROM fof) t
        WHERE rk <= 5),
      tots AS (
        SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS v_size,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM cnt)
      SELECT CAST(f.rk AS BIGINT) AS rk, f.r, f.n_r,
             CAST(coalesce(f2.n_r, 0) AS BIGINT) AS n_next,
             round(CAST((f.r + 1) * coalesce(f2.n_r, 0) AS DOUBLE)
                   / CAST(f.n_r AS DOUBLE), 6) AS r_star,
             t.v_size, t.n_tokens,
             round(CAST(t.n1 AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 6)
               AS p_unseen
      FROM low f
      LEFT JOIN fof f2 ON f2.r = f.r + 1
      CROSS JOIN tots t
      ORDER BY f.rk"""))

  // --------------------------------------------------------------- q333
  // Dedup effect on evaluation ([EXT] — the experiment that justifies
  // the dedup family): train q327's bigram next-token predictor twice —
  // on the RAW train split and on its EXACT-DEDUPED form (md5 content
  // key, keep lowest doc_id — q30's discipline) — and score both on the
  // SAME held-out fifth. Duplicated training text over-weights its own
  // n-gram continuations; the accuracy delta measures how much of the
  // raw model's score is duplication-inflated memorization vs the
  // deduped model's honest estimate. The documents table carries
  // planted near/exact duplicates, so the two corpora genuinely differ.
  //
  // Scale: q327's shapes twice (token generator pass, sparse bigram
  // aggregate, struct-min argmax, w1-keyed test join) plus q30's
  // hash-keyed dedup exchange — every stage map-side combinable or
  // dimension-bounded; the two models share one test-side scan.
  //
  // Exactness: counts exact; the argmax tie rule ((−count, w2)
  // struct-min = count DESC, w2 ASC) is identical in both engines;
  // accuracies are single divisions, roundZ final.
  private val q333 = QueryDef(
    "q333_dedup_eval_effect",
    (s, d) => {
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("w2", lead(col("w"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .filter(col("w2").isNotNull)
        .select(col("w").as("w1"), col("w2"))
      def model(train: DataFrame) = bigrams(train)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .groupBy(col("w1"))
        .agg(min(struct((-col("c")).as("nc"), col("w2").as("p"))).as("m"))
        .select(col("w1"), col("m.p").as("pred"))
      val trainRaw = docs(s, d).filter(col("doc_id") % 5L =!= 0L)
      val trainDedup = trainRaw
        .withColumn("h", md5(col("text").cast("binary")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"))
      val test = bigrams(docs(s, d).filter(col("doc_id") % 5L === 0L))
        .localCheckpoint()
      def eval(m: DataFrame, name: String, nDocs: DataFrame) = test
        .join(m, Seq("w1"), "left")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("pred") === col("w2"), 1L).otherwise(0L))
            .as("n_correct"))
        .crossJoin(broadcast(nDocs))
        .select(lit(name).as("model"), col("n_docs"), col("n_test"),
          col("n_correct"),
          Num.roundZ(col("n_correct").cast("double")
            / col("n_test").cast("double"), 6).as("accuracy"))
      val nRaw = trainRaw.agg(count(lit(1)).as("n_docs"))
      val nDed = trainDedup.agg(count(lit(1)).as("n_docs"))
      eval(model(trainRaw), "raw", nRaw)
        .unionByName(eval(model(trainDedup), "dedup", nDed))
        .orderBy(col("model"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
      bg AS (
        SELECT doc_id, w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok),
      test AS (
        SELECT w1, w2 FROM bg WHERE doc_id % 5 = 0 AND w2 IS NOT NULL),
      keepdocs AS (
        SELECT doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY md5(text)
                   ORDER BY doc_id) AS rn
          FROM documents WHERE doc_id % 5 <> 0) t
        WHERE rn = 1),
      modela AS (
        SELECT w1, w2 AS pred FROM (
          SELECT w1, w2, row_number() OVER (PARTITION BY w1
            ORDER BY count(*) DESC, w2) AS rn
          FROM bg WHERE doc_id % 5 <> 0 AND w2 IS NOT NULL
          GROUP BY w1, w2) t
        WHERE rn = 1),
      modelb AS (
        SELECT w1, w2 AS pred FROM (
          SELECT w1, w2, row_number() OVER (PARTITION BY w1
            ORDER BY count(*) DESC, w2) AS rn
          FROM bg JOIN keepdocs USING (doc_id)
          WHERE w2 IS NOT NULL
          GROUP BY w1, w2) t
        WHERE rn = 1),
      na AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id % 5
        <> 0),
      nb AS (SELECT count(*) AS n_docs FROM keepdocs),
      ea AS (
        SELECT 'raw' AS model, na.n_docs, count(*) AS n_test,
               CAST(sum(CASE WHEN m.pred = t.w2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct
        FROM test t LEFT JOIN modela m ON m.w1 = t.w1, na
        GROUP BY na.n_docs),
      eb AS (
        SELECT 'dedup' AS model, nb.n_docs, count(*) AS n_test,
               CAST(sum(CASE WHEN m.pred = t.w2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_correct
        FROM test t LEFT JOIN modelb m ON m.w1 = t.w1, nb
        GROUP BY nb.n_docs),
      u AS (SELECT * FROM ea UNION ALL SELECT * FROM eb)
      SELECT model, n_docs, n_test, n_correct,
             (CAST(round(CAST(n_correct AS DOUBLE)
               / CAST(n_test AS DOUBLE) * 1e6) AS BIGINT) / 1e6)
               AS accuracy
      FROM u
      ORDER BY model"""))

  // --------------------------------------------------------------- q329
  // Term burstiness / dispersion audit ([EXT]) — for each high-df
  // term, the variance-to-mean ratio (VMR) of its per-document count:
  // VMR ≈ 1 is Poisson scatter (function words), VMR ≫ 1 is BURSTY
  // (topical terms clumping in few docs — the corpus-linguistics
  // dispersion signal q113's boilerplate detector and q253's keyness
  // don't capture). Zero-count docs are IN the distribution (mean and
  // variance over ALL docs, not just containing docs) via the
  // containing-doc moments + the known total doc count — no dense
  // term×doc grid is ever materialized.
  //
  // Scale: one generator pass + one (term, doc) hash aggregate
  // (vocab×containing-docs sparse); the df ≥ 64 filter bounds the
  // report to the high-df shelf and the final moments are one
  // aggregate per surviving term. No windows, no corpus sort; top-20
  // by VMR is a TakeOrdered heap.
  //
  // Exactness: counts exact; mean = Σc/N and
  // var = (Σc² − N·mean²)/(N−1) with the sparse-to-dense correction
  // folded in algebraically (zero rows contribute 0 to both sums);
  // fixed-order doubles of exact ints, roundZ final.
  private val q329 = QueryDef(
    "q329_term_burstiness",
    (s, d) => {
      val nDocs = docs(s, d).agg(count(lit(1)).as("nd"))
      val td = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("c"))
      val terms = td.groupBy(col("w"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("scc"))
        .filter(col("df") >= 64L)
        .crossJoin(broadcast(nDocs))
        .withColumn("mean", col("sc").cast("double") / col("nd").cast("double"))
        .withColumn("varr",
          (col("scc").cast("double")
            - col("nd").cast("double") * col("mean") * col("mean"))
            / (col("nd").cast("double") - lit(1.0)))
        .withColumn("vmr", col("varr") / col("mean"))
      terms
        .orderBy(col("vmr").desc, col("w")).limit(20)
        .select(col("w").as("term"), col("df"), col("sc").as("tf"),
          Num.roundZ(col("mean"), 6).as("mean_per_doc"),
          Num.roundZ(col("vmr"), 6).as("vmr"))
    },
    Some("""
      WITH nd AS (SELECT count(*) AS nd FROM documents),
      td AS (
        SELECT w, doc_id, count(*) AS c FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents)
        GROUP BY 1, 2),
      terms AS (
        SELECT w, count(*) AS df, CAST(sum(c) AS BIGINT) AS sc,
               CAST(sum(c * c) AS BIGINT) AS scc
        FROM td GROUP BY 1 HAVING count(*) >= 64),
      m AS (
        SELECT w, df, sc,
               CAST(sc AS DOUBLE) / CAST(nd.nd AS DOUBLE) AS mean,
               ((CAST(scc AS DOUBLE)
                  - CAST(nd.nd AS DOUBLE)
                    * (CAST(sc AS DOUBLE) / CAST(nd.nd AS DOUBLE))
                    * (CAST(sc AS DOUBLE) / CAST(nd.nd AS DOUBLE)))
                 / (CAST(nd.nd AS DOUBLE) - 1.0))
                 / (CAST(sc AS DOUBLE) / CAST(nd.nd AS DOUBLE)) AS vmr
        FROM terms, nd)
      SELECT w AS term, df, sc AS tf,
             (CAST(round(mean * 1e6) AS BIGINT) / 1e6) AS mean_per_doc,
             (CAST(round(vmr * 1e6) AS BIGINT) / 1e6) AS vmr
      FROM m
      ORDER BY vmr DESC, w LIMIT 20"""))

  // --------------------------------------------------------------- q327
  // Bigram next-token accuracy on a held-out split ([EXT] LM-eval
  // pack) — the simplest language-model evaluation, run end-to-end:
  // train a bigram predictor (per first token, the most frequent
  // successor — argmax count, ties to the lexicographically smallest)
  // on docs with doc_id % 5 ≠ 0, then score per-language next-token
  // accuracy and coverage on the held-out fifth. The harness shape of
  // every LM eval: deterministic train/test split by content id,
  // model = aggregate table, metric = exact counts.
  //
  // Scale: the token stream is one generator pass + one doc-keyed
  // exchange for the successor lead(); the bigram table is
  // a (w1, w2) hash aggregate (vocab²-sparse, corpus-independent per
  // unique pair); the argmax collapses it to the vocab grid via a
  // struct-min (no window); the test join is keyed on w1. No corpus
  // sort, no all-pairs.
  //
  // Exactness: counts exact; the (−count, w2) struct-min argmax is
  // mirrored by the oracle's (count DESC, w2) definition-form pick —
  // identical binary string ordering in both engines on these ASCII
  // tokens; accuracy/coverage are single divisions, roundZ final.
  private val q327 = QueryDef(
    "q327_bigram_next_token",
    (s, d) => {
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .withColumn("w2", lead(col("w"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .filter(col("w2").isNotNull)
        .select(col("lang"), col("w").as("w1"), col("w2"))
      val train = bigrams(docs(s, d).filter(col("doc_id") % 5L =!= 0L))
      val test = bigrams(docs(s, d).filter(col("doc_id") % 5L === 0L))
      val model = train.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("w1"))
        .agg(min(struct((-col("c")).as("nc"), col("w2").as("p"))).as("m"))
        .select(col("w1"), col("m.p").as("pred"))
      test.join(model, Seq("w1"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("pred").isNotNull, 1L).otherwise(0L)).as("n_covered"),
          sum(when(col("pred") === col("w2"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("lang"), col("n_test"), col("n_covered"),
          col("n_correct"),
          Num.roundZ(col("n_covered").cast("double")
            / col("n_test").cast("double"), 6).as("coverage"),
          Num.roundZ(col("n_correct").cast("double")
            / col("n_test").cast("double"), 6).as("accuracy"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
      bg AS (
        SELECT doc_id, lang, w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok),
      train AS (
        SELECT w1, w2 FROM bg WHERE doc_id % 5 <> 0 AND w2 IS NOT NULL),
      test AS (
        SELECT lang, w1, w2 FROM bg
        WHERE doc_id % 5 = 0 AND w2 IS NOT NULL),
      model AS (
        SELECT w1, w2 AS pred FROM (
          SELECT w1, w2,
                 row_number() OVER (PARTITION BY w1
                   ORDER BY count(*) DESC, w2) AS rn
          FROM train GROUP BY w1, w2) t
        WHERE rn = 1)
      SELECT t.lang, count(*) AS n_test,
             CAST(sum(CASE WHEN m.pred IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_covered,
             CAST(sum(CASE WHEN m.pred = t.w2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct,
             (CAST(round(CAST(sum(CASE WHEN m.pred IS NOT NULL THEN 1
                 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6) AS coverage,
             (CAST(round(CAST(sum(CASE WHEN m.pred = t.w2 THEN 1 ELSE 0
                 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6) AS accuracy
      FROM test t LEFT JOIN model m ON m.w1 = t.w1
      GROUP BY t.lang
      ORDER BY t.lang"""))

  // --------------------------------------------------------------- q342
  // Mutual information between language and source ([EXT], beside q150's
  // χ² independence test and q225's JS divergence): I(lang; source) in
  // nats plus both marginal entropies and the normalized MI — the
  // "which metadata column actually predicts which" screen a curation
  // pipeline runs before stratifying by one of them. Identities used:
  // I = ln n + (Σ c·ln c − Σ r·ln r − Σ s·ln s + n·ln n)/n rearranged
  // per-cell as (c/n)·ln(c·n/(r·s)); H(lang) = ln n − (Σ r·ln r)/n.
  //
  // Determinism: every x·ln(ratio-of-exact-ints) term is quantized to a
  // 1e-9 BIGINT grid BEFORE its sum (the q214/q219 transcendental
  // discipline) so hash-agg arrival order cannot move the result; all
  // final values are single divisions of exact integers. Scale: one
  // corpus pass onto the |lang|×|source| grid (≤ 100 cells); everything
  // after is grid arithmetic with broadcast totals.
  private val q342 = QueryDef(
    "q342_mutual_information",
    (s, d) => {
      val grid = docs(s, d).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("c"))
      val rl = grid.groupBy(col("lang")).agg(sum(col("c")).as("r"))
      val cs = grid.groupBy(col("source")).agg(sum(col("c")).as("v"))
      val n = grid.agg(sum(col("c")).as("n"))
      val miq = grid.join(broadcast(rl), "lang")
        .join(broadcast(cs), "source")
        .crossJoin(broadcast(n))
        .select(round(col("c").cast("double") *
          log((col("c") * col("n")).cast("double") /
            (col("r") * col("v")).cast("double")) * 1e9).cast("long")
          .as("tq"))
        .agg(sum(col("tq")).as("miq"))
      val hlq = rl.crossJoin(broadcast(n))
        .select(round(col("r").cast("double") *
          log(col("n").cast("double") / col("r").cast("double")) * 1e9)
          .cast("long").as("tq"))
        .agg(sum(col("tq")).as("hlq"))
      val hsq = cs.crossJoin(broadcast(n))
        .select(round(col("v").cast("double") *
          log(col("n").cast("double") / col("v").cast("double")) * 1e9)
          .cast("long").as("tq"))
        .agg(sum(col("tq")).as("hsq"))
      miq.crossJoin(broadcast(hlq)).crossJoin(broadcast(hsq))
        .crossJoin(broadcast(n))
        .select(col("n"),
          Num.roundZ(col("miq").cast("double") /
            (col("n").cast("double") * 1e9), 6).as("mi_nats"),
          Num.roundZ(col("hlq").cast("double") /
            (col("n").cast("double") * 1e9), 6).as("h_lang"),
          Num.roundZ(col("hsq").cast("double") /
            (col("n").cast("double") * 1e9), 6).as("h_source"),
          // a single-language (or single-source) corpus has zero
          // marginal entropy: normalized MI is undefined → NULL, as
          // DuckDB's /0 yields (DegenerateDataSpec class)
          when(least(col("hlq"), col("hsq")) > 0L,
            Num.roundZ(col("miq").cast("double") /
              least(col("hlq"), col("hsq")).cast("double"), 6))
            .as("nmi"))
    },
    Some("""
      WITH grid AS (
        SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
      rl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS r FROM grid GROUP BY 1),
      cs AS (SELECT source, CAST(sum(c) AS BIGINT) AS v
             FROM grid GROUP BY 1),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
      miq AS (
        SELECT CAST(sum(CAST(round(CAST(g.c AS DOUBLE) *
                 ln(CAST(g.c * n.n AS DOUBLE)
                    / CAST(rl.r * cs.v AS DOUBLE)) * 1e9) AS BIGINT))
               AS BIGINT) AS miq
        FROM grid g JOIN rl USING (lang) JOIN cs USING (source)
        CROSS JOIN n),
      hlq AS (
        SELECT CAST(sum(CAST(round(CAST(r AS DOUBLE) *
                 ln(CAST(n.n AS DOUBLE) / CAST(r AS DOUBLE)) * 1e9)
               AS BIGINT)) AS BIGINT) AS hlq
        FROM rl CROSS JOIN n),
      hsq AS (
        SELECT CAST(sum(CAST(round(CAST(v AS DOUBLE) *
                 ln(CAST(n.n AS DOUBLE) / CAST(v AS DOUBLE)) * 1e9)
               AS BIGINT)) AS BIGINT) AS hsq
        FROM cs CROSS JOIN n)
      SELECT n.n,
             (CAST(round((CAST(miq AS DOUBLE)
               / (CAST(n.n AS DOUBLE) * 1e9)) * 1e6) AS BIGINT) / 1e6)
               AS mi_nats,
             (CAST(round((CAST(hlq AS DOUBLE)
               / (CAST(n.n AS DOUBLE) * 1e9)) * 1e6) AS BIGINT) / 1e6)
               AS h_lang,
             (CAST(round((CAST(hsq AS DOUBLE)
               / (CAST(n.n AS DOUBLE) * 1e9)) * 1e6) AS BIGINT) / 1e6)
               AS h_source,
             CASE WHEN least(hlq, hsq) > 0 THEN
               (CAST(round((CAST(miq AS DOUBLE)
                 / CAST(least(hlq, hsq) AS DOUBLE)) * 1e6) AS BIGINT)
                 / 1e6) END AS nmi
      FROM miq CROSS JOIN hlq CROSS JOIN hsq CROSS JOIN n"""))

  // --------------------------------------------------------------- q344
  // N-gram novelty per ingest batch ([EXT] corpus-freshness pack):
  // attribute every distinct word-3-gram to the FIRST batch that
  // contributed it, then report per batch how much of its distinct gram
  // vocabulary is genuinely new — the "is this crawl adding anything"
  // screen run before paying to process a new drop (a batch whose
  // novelty collapses is re-crawling known content; complements q46's
  // within-doc repetition and q138's pairwise vocab overlap with a
  // SEQUENTIAL first-seen attribution). Batch = doc_id % 8, the
  // deterministic stand-in for ingest sequence on this testdata.
  //
  // Scale: gram-keyed hash aggregates only — (gram, batch) distinct →
  // min(batch) per gram → two batch-grid counts; the gram table never
  // sorts and nothing is corpus²; novelty is an exact integer ratio
  // (distinct-gram count per batch ≥ 1 for any batch that emits).
  private val q344 = QueryDef(
    "q344_ngram_novelty",
    (s, d) => {
      val grams = docs(s, d)
        .withColumn("b", col("doc_id") % 8L)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("b"), col("toks"),
          explode(expr("sequence(0, size(toks) - 3)")).as("i"))
        // the gram STRING is reduced to a portable 56-bit md5 id BEFORE
        // any exchange (the q31/q32/q43 map-side id-reduction lesson:
        // the first cut shuffled raw gram strings at 3.0x bytes-read;
        // ids shuffle ~0.3x). Counts are invariant under the injective
        // mapping; a 2^-56-probability collision merges two grams
        // IDENTICALLY in both engines (same hash both sides).
        .select(col("b"),
          conv(substring(md5(concat(col("toks")(col("i")), lit("|"),
                 col("toks")(col("i") + 1), lit("|"),
                 col("toks")(col("i") + 2)).cast("binary")), 1, 14), 16, 10)
            .cast("long").as("g"))
      // pinned once: feeds BOTH reductions below; the first cut joined
      // the corpus-scale (g, b) table back to its own g-grouped min —
      // re-shuffling everything by g — where both facts reduce to the
      // 8-row batch grid INDEPENDENTLY and join there (ShuffleProf:
      // 1.94 -> ~1.0x bytes-shuffled/read)
      val gb = grams.groupBy(col("g"), col("b"))
        .agg(count(lit(1)).as("occ"))
        .localCheckpoint()
      val perBatch = gb.groupBy(col("b").as("batch"))
        .agg(count(lit(1)).as("n_distinct_grams"),
          sum(col("occ")).as("n_gram_occurrences"))
      val novel = gb.groupBy(col("g")).agg(min(col("b")).as("fb"))
        .groupBy(col("fb").as("batch"))
        .agg(count(lit(1)).as("n_novel_grams"))
      perBatch.join(novel, Seq("batch"), "left")
        .select(col("batch"), col("n_distinct_grams"),
          col("n_gram_occurrences"),
          coalesce(col("n_novel_grams"), lit(0L)).as("n_novel_grams"),
          Num.roundZ(coalesce(col("n_novel_grams"), lit(0L)).cast("double") /
            col("n_distinct_grams").cast("double"), 6).as("novelty"))
        .orderBy(col("batch"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id % 8 AS b, string_split(text, ' ') AS toks
        FROM documents),
      grams AS (
        SELECT b, (('0x' || substr(md5(g0), 1, 14))::BIGINT) AS g
        FROM (
          SELECT b, unnest(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || '|' || toks[i+1] || '|' || toks[i+2])
                 ELSE [] END) AS g0
          FROM tok) t),
      gb AS (SELECT g, b, count(*) AS occ FROM grams GROUP BY 1, 2),
      per_batch AS (
        SELECT b AS batch, count(*) AS n_distinct_grams,
               CAST(sum(occ) AS BIGINT) AS n_gram_occurrences
        FROM gb GROUP BY 1),
      novel AS (
        SELECT fb AS batch, count(*) AS n_novel_grams
        FROM (SELECT g, min(b) AS fb FROM gb GROUP BY 1) t
        GROUP BY 1)
      SELECT p.batch, p.n_distinct_grams, p.n_gram_occurrences,
             CAST(coalesce(n.n_novel_grams, 0) AS BIGINT) AS n_novel_grams,
             (CAST(round((CAST(coalesce(n.n_novel_grams, 0) AS DOUBLE)
               / CAST(p.n_distinct_grams AS DOUBLE)) * 1e6) AS BIGINT)
               / 1e6) AS novelty
      FROM per_batch p LEFT JOIN novel n ON n.batch = p.batch
      ORDER BY p.batch"""))

  // --------------------------------------------------------------- q352
  // BPE subword token accounting ([EXT] text family, r9 verdict item 5):
  // q42 counts whitespace tokens, but LLM budget math is SUBWORD — this
  // learns a deterministic byte-pair-encoding merge table from the
  // corpus itself (BpeRounds greedy merges: per round, the globally
  // most frequent adjacent symbol pair — occurrence-weighted by word
  // frequency, ties lexicographic — is merged corpus-wide) and reports
  // per-document subword counts under that table. Division of labor vs
  // q236 (the trainer-statistics op): q236 proves the merge ARITHMETIC
  // on 2 rounds of top-pair tables per lang; this runs 6 rounds to a
  // usable table and delivers the per-doc ACCOUNTING — the number a
  // token-budget planner actually consumes.
  //
  // The 100 TB shape is the point: segmentation runs on the DISTINCT-
  // WORD GRID, never the corpus. One corpus pass builds (doc, word) and
  // the word-frequency table; all BpeRounds of pair counting, greedy
  // left-to-right application and renumbering operate on vocab-sized
  // tables (every window partitions by word over ≤ len(word) rows);
  // the corpus reappears only in the final broadcast join of per-word
  // subword counts. Greedy LEFT-TO-RIGHT overlap semantics ("aaa" +
  // merge a·a → [aa, a]) are exact: match positions form gaps-and-
  // islands per word, and a match applies iff its offset within its
  // island is even — the q350 island machinery, reused. The winning
  // pair rides each round as a broadcast 1-row table, so a degenerate
  // corpus with no adjacent pairs (all 1-char words, empty docs) makes
  // every round the identity instead of failing.
  //
  // Exactness: symbols are exact strings, counts exact BIGINTs; the
  // only orderings are (count, pair) and within-word positions — both
  // deterministic in both engines (ASCII byte order). TextAnalysisSpec
  // pins the round-trip decode (concat of a word's subwords == word)
  // and the monotone non-increase of total subword count per round.
  private val BpeRounds = 6

  /** Shared with TextAnalysisSpec: the vocab-grid segmentation after
    * `rounds` greedy merges — (word, i, sym) — plus the (doc, word)
    * token stream. */
  private[graft] def bpeSegments(s: SparkSession, d: String,
      rounds: Int): (DataFrame, DataFrame) = {
    val dw = docs(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val wf = dw.groupBy(col("word")).agg(count(lit(1)).as("nw"))
      .localCheckpoint() // vocab grid; weights every round's pair count
    var seg = wf
      .select(col("word"), posexplode(split(col("word"), "")))
      .select(col("word"), col("pos").cast("long").as("i"),
        col("col").as("sym"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val pairs = seg.select(col("word"), col("i"), col("sym").as("x"))
        .join(seg.select(col("word"), (col("i") - 1L).as("i"),
          col("sym").as("y")), Seq("word", "i"))
        .join(wf, Seq("word"))
        .groupBy(col("x"), col("y")).agg(sum(col("nw")).as("cnt"))
      val top1 = pairs
        .orderBy(col("cnt").desc, col("x").asc, col("y").asc).limit(1)
        .select(col("x"), col("y"))
      val mt = seg.select(col("word"), col("i"), col("sym").as("sa"))
        .join(seg.select(col("word"), (col("i") - 1L).as("i"),
          col("sym").as("sb")), Seq("word", "i"))
        .crossJoin(broadcast(top1))
        .filter(col("sa") === col("x") && col("sb") === col("y"))
        .select(col("word"), col("i"), col("y"))
      val wIsl = Window.partitionBy(col("word")).orderBy(col("i"))
      val ap = mt.withColumn("isl", col("i") - row_number().over(wIsl))
        .withColumn("off", col("i") - min(col("i"))
          .over(Window.partitionBy(col("word"), col("isl"))))
        .filter(col("off") % 2 === 0)
        .select(col("word"), col("i").as("ai"), col("y"))
      seg = seg
        .join(ap.select(col("word"), col("ai").as("i"), col("y")),
          Seq("word", "i"), "left")
        .join(ap.select(col("word"), (col("ai") + 1L).as("i"),
          lit(true).as("gone")), Seq("word", "i"), "left")
        .filter(col("gone").isNull)
        .select(col("word"), col("i"),
          when(col("y").isNotNull, concat(col("sym"), col("y")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("i",
          row_number().over(Window.partitionBy(col("word"))
            .orderBy(col("i"))).cast("long") - 1L)
        .localCheckpoint()
    }
    (seg, dw)
  }

  private val q352 = QueryDef(
    "q352_bpe_subword_counts",
    (s, d) => {
      val (seg, dw) = bpeSegments(s, d, BpeRounds)
      val wn = seg.groupBy(col("word")).agg(count(lit(1)).as("n_sub"))
      dw.join(broadcast(wn), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("n_sub")).as("n_subwords"))
        .orderBy(col("doc_id"))
    },
    Some {
      val rounds = (0 until BpeRounds).map { r => s""",
      top$r AS (SELECT x, y FROM (
          SELECT a.sym AS x, b.sym AS y, CAST(sum(f.nw) AS BIGINT) AS cnt
          FROM seg$r a JOIN seg$r b ON b.word = a.word AND b.i = a.i + 1
          JOIN wf f ON f.word = a.word
          GROUP BY 1, 2) t
        ORDER BY cnt DESC, x ASC, y ASC LIMIT 1),
      mt$r AS (SELECT a.word, a.i, t.y
         FROM seg$r a JOIN seg$r b ON b.word = a.word AND b.i = a.i + 1
         JOIN top$r t ON a.sym = t.x AND b.sym = t.y),
      ap$r AS (SELECT word, i, y FROM (
          SELECT word, i, y,
                 i - row_number() OVER (PARTITION BY word ORDER BY i) AS isl
          FROM mt$r) t
        QUALIFY (i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0),
      seg${r + 1} AS MATERIALIZED (
        SELECT word,
               row_number() OVER (PARTITION BY word ORDER BY i) - 1 AS i,
               sym
        FROM (
          SELECT s.word, s.i,
                 CASE WHEN a.i IS NOT NULL THEN s.sym || a.y
                      ELSE s.sym END AS sym
          FROM seg$r s
          LEFT JOIN ap$r a ON a.word = s.word AND a.i = s.i
          LEFT JOIN ap$r p ON p.word = s.word AND p.i = s.i - 1
          WHERE p.i IS NULL) t)"""
      }.mkString
      s"""
      WITH dw AS (
        SELECT doc_id, word FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents) t
        WHERE len(word) > 0),
      wf AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS nw FROM dw GROUP BY 1),
      seg0 AS MATERIALIZED (
        SELECT word, i, substr(word, CAST(i + 1 AS INT), 1) AS sym
        FROM (SELECT word, unnest(range(len(word))) AS i FROM wf) t)$rounds,
      wn AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sub
             FROM seg$BpeRounds GROUP BY 1)
      SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(wn.n_sub) AS BIGINT) AS n_subwords
      FROM dw d JOIN wn ON wn.word = d.word
      GROUP BY 1 ORDER BY d.doc_id"""
    })

  // --------------------------------------------------------------- q356
  // Classifier agreement statistics ([EXT] eval pack, beside q74's
  // accuracy / q335's PR sweep / q160's calibration — and the MULTICLASS
  // sibling of q239, which computes κ for a 2×2 rater-agreement table;
  // here κ generalizes to the K-class confusion of a real classifier
  // and ships with the per-class table q239 has no notion of): per-class
  // precision / recall / F1 and Cohen's κ for the q44 LID heuristic
  // against the true lang label — κ is the chance-corrected agreement a
  // raw accuracy can't give on imbalanced classes. One `__overall__` row
  // carries micro-accuracy and κ; per-class rows carry their own P/R/F1.
  //
  // Exactness: every metric is ONE guarded correctly-rounded division of
  // exact BIGINTs — F1 is computed as 2·tp/(n_true + n_pred) directly
  // (never composed from two float P/R divisions), and κ as
  // (N·Σtp − Σ n_true·n_pred) / (N² − Σ n_true·n_pred), both exact
  // integer operands; κ is NULL when the chance denominator is 0 (a
  // one-class corpus — the degenerate-data guard class). Scale: the
  // prediction pipeline is q44's (broadcast profiles, one token join);
  // the metrics are two grid aggregates on the class domain.
  private val q356 = QueryDef(
    "q356_langid_agreement",
    (s, d) => {
      val pred = langPredictions(s, d).localCheckpoint() // feeds 3 aggs
      val nTrue = pred.groupBy(col("lang")).agg(count(lit(1)).as("n_true"))
      val nPred = pred.groupBy(col("p_lang").as("lang"))
        .agg(count(lit(1)).as("n_pred"))
      val tp = pred.filter(col("lang") === col("p_lang"))
        .groupBy(col("lang")).agg(count(lit(1)).as("tp"))
      val cls = nTrue.join(nPred, Seq("lang"), "left")
        .join(tp, Seq("lang"), "left")
        .select(col("lang"), col("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("tp"), lit(0L)).as("tp"))
        .localCheckpoint() // feeds the per-class rows AND the κ sums
      val perClass = cls.select(col("lang").as("label"),
        col("n_true"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0L, Num.roundZ(col("tp").cast("double")
          / col("n_pred").cast("double"), 6)).as("precision"),
        Num.roundZ(col("tp").cast("double")
          / col("n_true").cast("double"), 6).as("recall"),
        Num.roundZ(col("tp").cast("double") * 2.0
          / (col("n_true") + col("n_pred")).cast("double"), 6).as("f1"),
        lit(null).cast("double").as("kappa"))
      val overall = cls.agg(sum(col("n_true")).as("n"),
          sum(col("tp")).as("stp"),
          sum(col("n_true") * col("n_pred")).as("chance"))
        .select(lit("__overall__").as("label"),
          col("n").as("n_true"), col("n").as("n_pred"),
          col("stp").as("tp"),
          Num.roundZ(col("stp").cast("double")
            / col("n").cast("double"), 6).as("precision"),
          Num.roundZ(col("stp").cast("double")
            / col("n").cast("double"), 6).as("recall"),
          Num.roundZ(col("stp").cast("double")
            / col("n").cast("double"), 6).as("f1"),
          when(col("n") * col("n") - col("chance") > 0L,
            Num.roundZ((col("n") * col("stp") - col("chance")).cast("double")
              / (col("n") * col("n") - col("chance")).cast("double"), 6))
            .as("kappa"))
      perClass.unionByName(overall).orderBy(col("label"))
    },
    Some(s"""
      WITH $langPredSql,
      nt2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_true
              FROM pred GROUP BY 1),
      np2 AS (SELECT p_lang AS lang, CAST(count(*) AS BIGINT) AS n_pred
              FROM pred GROUP BY 1),
      tp2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS tp
              FROM pred WHERE lang = p_lang GROUP BY 1),
      cls AS MATERIALIZED (
        SELECT nt2.lang, nt2.n_true,
               CAST(coalesce(np2.n_pred, 0) AS BIGINT) AS n_pred,
               CAST(coalesce(tp2.tp, 0) AS BIGINT) AS tp
        FROM nt2 LEFT JOIN np2 USING (lang) LEFT JOIN tp2 USING (lang)),
      o AS (
        SELECT lang AS label, n_true, n_pred, tp,
               CASE WHEN n_pred > 0 THEN CAST(round((CAST(tp AS DOUBLE)
                 / CAST(n_pred AS DOUBLE)) * 1e6) AS BIGINT) / 1e6 END
                 AS precision,
               CAST(round((CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE))
                 * 1e6) AS BIGINT) / 1e6 AS recall,
               CAST(round((CAST(tp AS DOUBLE) * 2.0
                 / CAST(n_true + n_pred AS DOUBLE)) * 1e6) AS BIGINT) / 1e6
                 AS f1,
               CAST(NULL AS DOUBLE) AS kappa
        FROM cls
        UNION ALL
        SELECT '__overall__', n, n, stp,
               CAST(round((CAST(stp AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
                 AS BIGINT) / 1e6,
               CAST(round((CAST(stp AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
                 AS BIGINT) / 1e6,
               CAST(round((CAST(stp AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
                 AS BIGINT) / 1e6,
               CASE WHEN n * n - chance > 0 THEN
                 CAST(round((CAST(n * stp - chance AS DOUBLE)
                   / CAST(n * n - chance AS DOUBLE)) * 1e6) AS BIGINT) / 1e6
               END
        FROM (SELECT CAST(sum(n_true) AS BIGINT) AS n,
                     CAST(sum(tp) AS BIGINT) AS stp,
                     CAST(sum(n_true * n_pred) AS BIGINT) AS chance
              FROM cls) t)
      SELECT label, n_true, n_pred, tp, precision, recall, f1, kappa
      FROM o ORDER BY label"""))

  // --------------------------------------------------------------- q364
  // LLM watermark detection ([EXT], Kirchenbauer et al. 2023 "A
  // Watermark for Large Language Models") — the provenance member of
  // the text-forensics shelf: q329 asks "is this text bursty like a
  // human's", q327 scores fluency under a corpus LM; this asks "was
  // this text GENERATED under a green-list watermark". Detection side
  // of the published scheme with γ = ½: each token is green iff a hash
  // seeded by its PREDECESSOR lands odd (the house md5 idiom — the
  // detector's re-derivation of the generator's seeded vocabulary
  // split); a watermarked generator over-picks green, so the one-sided
  // z-score of the per-doc green count against Binomial(T, ½),
  //   z = (2g − T)/√T,
  // flags machine text at z > 2. Natural corpora sit at z ≈ 0 with
  // ~2.3% false-flag mass — the per-lang flag_rate printed here IS that
  // null-calibration audit, the number you read before trusting the
  // detector on a crawl.
  //
  // Scale: one corpus pass; the predecessor pairing is INTRA-ROW array
  // indexing over the split tokens (no window — the first cut paired
  // via lead() and shuffled the exploded token stream at 5.7× bytes
  // read; ShuffleProf caught it, the rewrite reads 0.13×), so the only
  // exchange carries per-doc partial aggregates, then a lang-grid
  // rollup. Exactness: green bits and counts are exact
  // BIGINTs; z is (exact int)/√(exact int) — one correctly-rounded
  // sqrt + one division, identical doubles both engines (q301's
  // discipline) — quantized to 1e-6 BIGINTs before the grid sums, so
  // every cross-engine aggregate is integer arithmetic. Single-token
  // docs have no scored position and drop out (documented; they carry
  // no watermark evidence).
  /** q364 core, exposed for the spec's planted-document pins: per-doc
    * scored-position count, green count, and 1e-6-quantized z-score. */
  def watermarkZ(d0: DataFrame): DataFrame =
    d0.select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"), col("tk"),
        explode(expr("sequence(1, size(tk) - 1)")).as("i"))
      .withColumn("green", expr(
        "CAST(conv(substr(md5(concat('wm:', element_at(tk, i), ' ', " +
          "element_at(tk, i + 1))), 1, 14), 16, 10) AS BIGINT) % 2"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("t"), sum(col("green")).as("g"))
      .withColumn("zq", round((lit(2L) * col("g") - col("t"))
        .cast("double") / sqrt(col("t").cast("double")) * lit(1e6))
        .cast("long"))

  private val q364 = QueryDef(
    "q364_watermark_greenlist",
    (s, d) => {
      val sc = watermarkZ(docs(s, d))
      sc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("zq") > 2000000L, 1L).otherwise(0L))
            .as("n_flagged"),
          sum(col("zq")).as("sz"), max(col("zq")).as("mz"))
        .select(col("lang"), col("n_docs"), col("n_flagged"),
          Num.roundZ(col("n_flagged").cast("double")
            / col("n_docs").cast("double"), 6).as("flag_rate"),
          Num.roundZ(col("sz").cast("double")
            / (col("n_docs").cast("double") * lit(1e6)), 6).as("mean_z"),
          (col("mz").cast("double") / lit(1e6)).as("max_z"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
      bg AS (
        SELECT doc_id, lang, w AS w1,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok),
      sc AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS t,
               CAST(sum((('0x' || substr(md5('wm:' || w1 || ' ' || w2),
                 1, 14))::BIGINT) % 2) AS BIGINT) AS g
        FROM bg WHERE w2 IS NOT NULL
        GROUP BY doc_id, lang),
      z AS (
        SELECT lang,
               CAST(round((CAST(2 * g - t AS DOUBLE)
                 / sqrt(CAST(t AS DOUBLE))) * 1e6) AS BIGINT) AS zq
        FROM sc)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN zq > 2000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
             (CAST(round((CAST(sum(CASE WHEN zq > 2000000 THEN 1 ELSE 0
               END) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT)
               / 1e6) AS flag_rate,
             (CAST(round((CAST(sum(zq) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 1e6)) * 1e6) AS BIGINT)
               / 1e6) AS mean_z,
             (CAST(max(zq) AS DOUBLE) / 1e6) AS max_z
      FROM z
      GROUP BY lang
      ORDER BY lang"""))

  // --------------------------------------------------------------- q367
  // Periodic-loop (degenerate generation) detector ([EXT]) — the
  // model-collapse member of the text-forensics shelf beside q364
  // (watermark provenance) and q46 (repetition RATIO): q46 counts
  // duplicate tokens anywhere, this detects STRUCTURED repetition —
  // the "the cat the cat the cat…" failure mode of greedy decoding —
  // by measuring, per document and candidate period p ∈ 1..8, the
  // self-match rate |{i : tok_i = tok_{i+p}}| / (T − p) (≡ the
  // normalized token-level autocorrelation at lag p). The best period
  // is the packed argmax (rate desc, smaller p wins ties — the
  // fundamental period, not its multiples); a doc flags as a loop at
  // best rate ≥ 0.9. Per-(lang, best_p) report: doc counts, flags,
  // mean best rate — the period histogram a crawl-QA dashboard shows.
  //
  // Scale: ONE corpus pass; all 8 lags are INTRA-ROW try_element_at
  // probes against the split token array (q364's no-window lesson —
  // the lead() form shuffled the token stream at 5.7× bytes read,
  // the rewrite at 0.28×), then a ≤ |lang|·8 grid rollup. Exactness: match
  // counts are exact BIGINTs; each rate is one division quantized to
  // 1e-6; the argmax is the house packed-integer max (rateq·16 +
  // (15 − p), p ≤ 8 < 16); docs need T > 8 tokens (declared contract —
  // shorter docs can't vote all 8 lags and carry no loop evidence).
  /** q367 core, exposed for the spec's planted-loop pins: per-doc best
    * period and 1e-6-quantized best self-match rate (docs with > 8
    * tokens only — the declared contract). */
  def periodicBest(d0: DataFrame): DataFrame = {
    var tok = d0
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("lang"), col("tk"),
        explode(expr("sequence(1, size(tk))")).as("i"))
    for (p <- 1 to 8)
      tok = tok.withColumn(s"m$p",
        when(expr(s"try_element_at(tk, i + $p)")
          === expr("element_at(tk, i)"), 1L).otherwise(0L))
    val per = tok.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("t"),
        (1 to 8).map(p => sum(col(s"m$p")).as(s"s$p")): _*)
      .filter(col("t") > 8L)
    val packed = (1 to 8).map { p =>
      round(col(s"s$p").cast("double") / (col("t") - p.toLong)
        .cast("double") * lit(1e6)).cast("long") * 16L + lit(15L - p)
    }.reduce((a, b) => greatest(a, b))
    per.withColumn("pk", packed)
      .select(col("doc_id"), col("lang"),
        (lit(15L) - col("pk") % 16L).as("best_p"),
        expr("CAST(pk DIV 16 AS BIGINT)").as("rateq"))
  }

  private val q367 = QueryDef(
    "q367_periodic_loop",
    (s, d) => {
      val best = periodicBest(docs(s, d))
      best.groupBy(col("lang"), col("best_p"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rateq") >= 900000L, 1L).otherwise(0L))
            .as("n_flagged"),
          sum(col("rateq")).as("srq"))
        .select(col("lang"), col("best_p"), col("n_docs"), col("n_flagged"),
          Num.roundZ(col("srq").cast("double")
            / (col("n_docs").cast("double") * lit(1e6)), 6)
            .as("mean_best_rate"))
        .orderBy(col("lang"), col("best_p"))
    },
    Some {
      val ms = (1 to 8).map(p =>
        s"CASE WHEN lead(w, $p) OVER (PARTITION BY doc_id ORDER BY pos)" +
          s" = w THEN 1 ELSE 0 END AS m$p").mkString(",\n               ")
      val ss = (1 to 8).map(p =>
        s"CAST(sum(m$p) AS BIGINT) AS s$p").mkString(",\n               ")
      val pk = (1 to 8).map(p =>
        s"CAST(round((CAST(s$p AS DOUBLE) / CAST(t - $p AS DOUBLE)) * 1e6)" +
          s" AS BIGINT) * 16 + ${15 - p}").mkString(",\n                 ")
      s"""
      WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
      lag8 AS (
        SELECT doc_id, lang,
               $ms
        FROM tok),
      per AS (
        SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS t,
               $ss
        FROM lag8 GROUP BY doc_id, lang),
      best AS (
        SELECT lang,
               15 - greatest($pk) % 16 AS best_p,
               greatest($pk) // 16 AS rateq
        FROM per WHERE t > 8)
      SELECT lang, best_p, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN rateq >= 900000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_flagged,
             (CAST(round((CAST(sum(rateq) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 1e6)) * 1e6) AS BIGINT) / 1e6)
               AS mean_best_rate
      FROM best
      GROUP BY lang, best_p
      ORDER BY lang, best_p"""
    })

  // --------------------------------------------------------------- q371
  // Pairwise self-BLEU diversity audit ([EXT]; BLEU — Papineni et al.
  // 2002; self-BLEU as a corpus-diversity metric — Zhu et al. 2018) —
  // the GENERATION-quality member of the text-eval shelf: a corpus of
  // model outputs that all paraphrase each other scores high pairwise
  // BLEU even when exact/near-dup (q30/q31) and novelty (q344) passes
  // see nothing. Proper BLEU-2 per (doc, next same-lang doc) pair:
  // clipped unigram/bigram precisions p_n = Σ_g min(c_cand(g),
  // c_ref(g)) / #grams_cand, brevity penalty exp(1 − r/c) when the
  // candidate is shorter, score = BP·√(p₁p₂), no smoothing (zero bigram
  // overlap scores 0 — reported separately as the zero-overlap rate).
  // Pairing: (doc_id, doc_id+1) ONLY when that exact successor shares
  // the lang — a doc whose immediate id-successor is another lang gets
  // no pair, so per-lang pair counts depend on how langs interleave in
  // id order (a documented deterministic ≤-1-pair-per-doc surrogate
  // for the quadratic each-vs-all self-BLEU, mirrored identically in
  // the oracle; at this grain the mean over the surviving pairs is the
  // diversity signal, and no low-cardinality lang window is needed —
  // the pair join is an equi-join on doc_id).
  //
  // Scale: one corpus pass builds per-doc gram count tables keyed by
  // md5 gram ids (q344's lesson — raw gram strings never shuffle;
  // gram generation is intra-row array indexing, q364's no-window
  // lesson); the pair evaluation is two equi-joins keyed on (doc_id, gram_id)
  // with map-side-combinable clipped sums; the rollup is the lang
  // grid. Exactness: counts/clips exact BIGINTs; each pair's score is
  // a fixed-order double expression of exact-integer ratios (one exp,
  // one sqrt — identical in both engines) quantized to 1e-6 before the
  // grid sums.
  /** q371 core, exposed for the spec's crafted-pair pins: per-pair
    * 1e-6-quantized BLEU-2 and the zero-bigram-overlap flag. */
  def selfBleuPairs(dd: DataFrame): DataFrame = {
      val pairs = dd.select(col("doc_id").as("cid"), col("lang"))
        .join(dd.select((col("doc_id") - 1L).as("cid"),
          col("doc_id").as("rid"), col("lang")), Seq("cid", "lang"))
      val base = dd.select(col("doc_id"), split(col("text"), " ").as("tk"))
      val u1 = base
        .select(col("doc_id"), explode(col("tk")).as("w"))
        .groupBy(col("doc_id"), expr(
          "CAST(conv(substr(md5(concat('bl1:', w)), 1, 14), 16, 10)" +
            " AS BIGINT)").as("g"))
        .agg(count(lit(1)).as("n"))
      val u2 = base.filter(size(col("tk")) >= 2)
        .select(col("doc_id"), col("tk"),
          explode(expr("sequence(1, size(tk) - 1)")).as("i"))
        .groupBy(col("doc_id"), expr(
          "CAST(conv(substr(md5(concat('bl2:', element_at(tk, i), ' ', " +
            "element_at(tk, i + 1))), 1, 14), 16, 10) AS BIGINT)").as("g"))
        .agg(count(lit(1)).as("n"))
      val len = base.select(col("doc_id"),
        size(col("tk")).cast("long").as("t"))
      def clip(u: DataFrame, out: String) = pairs
        .join(u.select(col("doc_id").as("cid"), col("g"),
          col("n").as("nc")), "cid")
        .join(u.select(col("doc_id").as("rid"), col("g"),
          col("n").as("nr")), Seq("rid", "g"), "left")
        .groupBy(col("cid"), col("rid"), col("lang"))
        .agg(sum(least(col("nc"), coalesce(col("nr"), lit(0L)))).as(out))
      val per = clip(u1, "clip1")
        .join(clip(u2, "clip2").select(col("cid"), col("clip2")),
          Seq("cid"), "left")
        .join(len.select(col("doc_id").as("cid"), col("t").as("tc")), "cid")
        .join(len.select(col("doc_id").as("rid"), col("t").as("tr")), "rid")
        .select(col("cid"), col("lang"),
          when(coalesce(col("clip2"), lit(0L)) === 0L, 0L)
            .otherwise(round(
              when(col("tc") > col("tr"), lit(1.0))
                .otherwise(exp(lit(1.0) - col("tr").cast("double")
                  / col("tc").cast("double")))
              * sqrt((col("clip1").cast("double") / col("tc").cast("double"))
                * (col("clip2").cast("double")
                  / (col("tc") - 1L).cast("double"))) * lit(1e6))
              .cast("long")).as("bq"),
          when(coalesce(col("clip2"), lit(0L)) === 0L, 1L).otherwise(0L)
            .as("z"))
      per
  }

  private val q371 = QueryDef(
    "q371_self_bleu",
    (s, d) => {
      val per = selfBleuPairs(docs(s, d))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("bq")).as("sb"),
          sum(col("z")).as("sz"))
        .select(col("lang"), col("n_pairs"),
          Num.roundZ(col("sb").cast("double")
            / (col("n_pairs").cast("double") * lit(1e6)), 6)
            .as("mean_bleu2"),
          Num.roundZ(col("sz").cast("double")
            / col("n_pairs").cast("double"), 6).as("zero_overlap_rate"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH pairs AS (
        SELECT c.doc_id AS cid, r.doc_id AS rid, c.lang
        FROM documents c JOIN documents r
          ON r.doc_id = c.doc_id + 1 AND r.lang = c.lang),
      tok AS (
        SELECT doc_id, w, pos,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents)),
      u1 AS (
        SELECT doc_id,
               (('0x' || substr(md5('bl1:' || w), 1, 14))::BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY 1, 2),
      u2 AS (
        SELECT doc_id,
               (('0x' || substr(md5('bl2:' || w || ' ' || w2), 1, 14))
                 ::BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n
        FROM tok WHERE w2 IS NOT NULL GROUP BY 1, 2),
      len AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS t
              FROM tok GROUP BY 1),
      c1 AS (
        SELECT p.cid, p.rid, p.lang,
               CAST(sum(least(a.n, coalesce(b.n, 0))) AS BIGINT) AS clip1
        FROM pairs p JOIN u1 a ON a.doc_id = p.cid
        LEFT JOIN u1 b ON b.doc_id = p.rid AND b.g = a.g
        GROUP BY 1, 2, 3),
      c2 AS (
        SELECT p.cid,
               CAST(sum(least(a.n, coalesce(b.n, 0))) AS BIGINT) AS clip2
        FROM pairs p JOIN u2 a ON a.doc_id = p.cid
        LEFT JOIN u2 b ON b.doc_id = p.rid AND b.g = a.g
        GROUP BY 1),
      per AS (
        SELECT c1.lang,
               CASE WHEN coalesce(c2.clip2, 0) = 0 THEN 0
                 ELSE CAST(round(
                   (CASE WHEN lc.t > lr.t THEN 1.0
                         ELSE exp(1.0 - CAST(lr.t AS DOUBLE)
                           / CAST(lc.t AS DOUBLE)) END)
                   * sqrt((CAST(c1.clip1 AS DOUBLE) / CAST(lc.t AS DOUBLE))
                        * (CAST(c2.clip2 AS DOUBLE)
                           / CAST(lc.t - 1 AS DOUBLE))) * 1e6) AS BIGINT)
                 END AS bq,
               CASE WHEN coalesce(c2.clip2, 0) = 0 THEN 1 ELSE 0 END AS z
        FROM c1 LEFT JOIN c2 ON c2.cid = c1.cid
        JOIN len lc ON lc.doc_id = c1.cid
        JOIN len lr ON lr.doc_id = c1.rid)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs,
             (CAST(round((CAST(sum(bq) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * 1e6)) * 1e6) AS BIGINT) / 1e6)
               AS mean_bleu2,
             (CAST(round((CAST(sum(z) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6)
               AS zero_overlap_rate
      FROM per GROUP BY lang ORDER BY lang"""))

  val defs: Seq[QueryDef] =
    Seq(q37, q39, q40, q41, q42, q43, q44, q45, q46, q107, q110, q121, q133,
      q138, q147, q155, q159, q167, q186, q204, q217, q225, q227, q228,
      q233, q236, q253, q264, q275, q276, q278, q279, q290, q327, q329,
      q333, q342, q344, q352, q356, q364, q367, q371)
}
