package graft.operators

import graft.{QueryDef, Tables, Num, Scale}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Advanced analytics operators ([EXT], SURVEY §2.C depth): batch
  * sessionization, sketch aggregates (HLL distinct), and bivariate
  * correlation via exact moment sums.
  *
  * Scale notes, per query, live on each definition. The common thread:
  * every aggregate here is made ORDER- and PARTITION-INDEPENDENT either by
  * summing exact integers (Num.sumFixed / cent-scaled moments) or by using
  * intrinsically commutative sketches (HLL register-max), so results are
  * bit-identical from local[4] to a 1000-executor cluster.
  */
object Analytics {
  import Num._

  private def ev(s: SparkSession, d: String) = Tables.t(s, d, "events")
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  // ---------------------------------------------------------------- q52
  // Batch sessionization: a session breaks after a >12 h silence. ONE
  // shuffle on user_id serves both the lag() window and the per-session
  // aggregate (Catalyst keeps the hash partitioning), so at 100 TB this is
  // a single exchange + linear per-partition work. Ties on ts are broken
  // by event_id, making the session numbering deterministic.
  private val GapS = 43200L
  private val q52 = QueryDef(
    "q52_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull ||
               col("us") - col("prev_us") > GapS * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess"))
        .agg(
          count(lit(1)).as("n_events"),
          ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long")
            .as("dur_s"),
          sumFixed(col("value"), 2).as("sum_value"))
        .orderBy(col("user_id"), col("sess"))
    },
    Some(s"""
      SELECT user_id, CAST(sess AS BIGINT) AS sess, count(*) AS n_events,
             CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS dur_s,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM (
        SELECT user_id, value, us,
               sum(CASE WHEN prev_us IS NULL
                          OR us - prev_us > CAST(${GapS} AS BIGINT) * 1000000 THEN 1
                        ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess
        FROM (
          SELECT user_id, event_id, value, us,
                 lag(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS prev_us
          FROM (SELECT user_id, event_id, value, epoch_us(ts) AS us
                FROM events)))
      GROUP BY user_id, sess
      ORDER BY user_id, sess"""))

  // ---------------------------------------------------------------- q55
  // Pearson correlation from EXACT integer moment sums. corr()'s streaming
  // co-moment accumulation is order-dependent in IEEE arithmetic — results
  // drift with partitioning. Instead: sum n, Σx, Σy, Σxy, Σx², Σy² as
  // BIGINT (exact, associative), then one closed-form double expression.
  // Every intermediate stays < 2^53, each IEEE op is correctly rounded,
  // so the result is bit-identical in both engines at any parallelism.
  private val q55 = QueryDef(
    "q55_corr_moments",
    (s, d) =>
      docs(s, d)
        .select(
          col("lang"),
          col("n_chars").as("x"),
          size(split(col("text"), " ")).cast("long").as("y"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(
          col("lang"), col("n"),
          // zero-variance group (single doc / all-equal values): corr is
          // undefined — DuckDB's /0 yields NULL, Spark ANSI throws; the
          // exact-integer variance terms make the guard exact
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0L &&
               col("n") * col("syy") - col("sy") * col("sy") > 0L,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("corr_chars_toks"))
        .orderBy(col("lang")),
    Some("""
      SELECT lang, n,
             CAST(n * sxy - sx * sy AS DOUBLE) /
               (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_chars_toks
      FROM (
        SELECT lang, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM (SELECT lang, n_chars AS x,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS y
              FROM documents)
        GROUP BY lang)
      ORDER BY lang"""))

  // ---------------------------------------------------------------- q38
  // Sketch aggregate: HyperLogLog++ approximate distinct. The sketch merge
  // is register-wise max — commutative and associative — so the estimate
  // is deterministic under any partitioning. The harness pin: the estimate
  // must land within 5% of exact (HLL++ rsd default is 5%), emitted as a
  // boolean next to the exact count the oracle recomputes. At 100 TB the
  // sketch needs KBs of state where count(DISTINCT) needs a full shuffle
  // of every key — this is the scale path for cardinality metrics.
  // Implementation note: the exact and approx aggregates are SEPARATE
  // plans joined on the 3-row result. Combining countDistinct with the
  // HLL sketch in one .agg forces a distinct-expand + sort-based
  // fallback that copies the 2^p-register sketch buffer per input row
  // (measured 51 s at sf0.1 vs ~1 s split). The exact side is a
  // two-stage (key, value) → key hash agg — the partial-aggregable form
  // of DISTINCT; the approx side is a plain ObjectHashAggregate.
  private val q38 = QueryDef(
    "q38_hll_distinct",
    (s, d) => {
      val exact = li(s, d)
        .groupBy(col("l_returnflag"), col("l_orderkey")).agg(lit(1))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_distinct"))
      val approx = li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
      exact
        .join(broadcast(approx), "l_returnflag")
        .select(
          col("l_returnflag"), col("exact_distinct"),
          (abs(col("approx") - col("exact_distinct")).cast("double") <=
            col("exact_distinct").cast("double") * 0.05).as("hll_within_5pct"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS exact_distinct,
             TRUE AS hll_within_5pct
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- q102
  // Exact AUC as a query (metric-as-query, SURVEY §2.B B10 depth): how
  // well does `value` rank purchases above other events? Mann–Whitney
  // with exact tie handling, computed in the INTEGER domain so the
  // result is order- and partition-independent:
  //   AUC = [Σ_s np(s)·(2·cumneg(<s) + nn(s))] / (2·NP·NN)
  // where s ranges over DISTINCT score values (ties collapse into one
  // group, each pos–neg tie counting ½ — the ×2 keeps every term a
  // BIGINT until the final division). The plan: one distributed groupBy
  // on score (100k rows → 17.8k groups at sf0.1), then ONE ordered
  // prefix-sum pass over the collapsed groups. That ordered pass is a
  // single-partition window — acceptable because its input is the
  // distinct-score domain, not the corpus; at 100 TB with continuous
  // scores the production form first quantizes scores to a fixed grid
  // (the standard histogram-AUC treatment, resolution documented at the
  // call site), which caps the ordered pass at the grid size while
  // keeping exactness w.r.t. the quantized scores.
  private val q102 = QueryDef(
    "q102_auc_rank_metric",
    (s, d) => {
      val e = ev(s, d).select(
        (col("event_type") === "purchase").cast("long").as("pos"),
        col("value").as("score"))
      val g = e.groupBy(col("score")).agg(
        sum(col("pos")).as("np"),
        (count(lit(1)) - sum(col("pos"))).as("nn"))
      val w = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
        .agg(
          sum(col("np") * (col("cumneg") * 2 + col("nn"))).as("num2"),
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
        .select(
          round(col("num2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"), 6).as("auc"),
          col("n_pos"), col("n_neg"))
    },
    Some("""
      WITH g AS (
        SELECT value AS score,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS np,
               CAST(count(*) FILTER (WHERE event_type <> 'purchase') AS BIGINT) AS nn
        FROM events GROUP BY value),
      c AS (
        SELECT np, nn,
               CAST(COALESCE(sum(nn) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS cumneg
        FROM g)
      SELECT round(CAST(sum(np * (cumneg * 2 + nn)) AS DOUBLE) /
                   CAST(sum(np) * sum(nn) * 2 AS DOUBLE), 6) AS auc,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg
      FROM c"""))

  // --------------------------------------------------------------- q108
  // Quantized AUC — q102's documented production escalation, made real.
  // Scores snap to a fixed grid (eps = 0.25 → bin = floor(score·4); ×4 is
  // a power-of-two scale, so the double arithmetic is exact and engine-
  // independent). The Mann–Whitney computation is then EXACT w.r.t. the
  // quantized scores, and the single-partition ordered pass is capped at
  // the grid size — bounded by the VALUE RANGE (≈ 2.3k bins here), never
  // the corpus, so the final stage is constant-size at 100 TB no matter
  // how continuous the raw scores are. Quantization only reclassifies
  // pos–neg pairs whose scores differ by < eps (they become half-credit
  // ties), so |auc_q − auc| is bounded by half the near-tied pair mass;
  // AnalyticsSpec measures the two forms against each other.
  private val Q108Eps = 0.25
  private val q108 = QueryDef(
    "q108_auc_quantized",
    (s, d) => {
      val e = ev(s, d).select(
        (col("event_type") === "purchase").cast("long").as("pos"),
        floor(col("value") * lit(1.0 / Q108Eps)).cast("long").as("bin"))
      val g = e.groupBy(col("bin")).agg(
        sum(col("pos")).as("np"),
        (count(lit(1)) - sum(col("pos"))).as("nn"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cumneg", coalesce(sum(col("nn")).over(w), lit(0L)))
        .agg(
          sum(col("np") * (col("cumneg") * 2 + col("nn"))).as("num2"),
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
          count(lit(1)).as("nb"))
        .select(
          round(col("num2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"), 6).as("auc_q"),
          col("n_pos"), col("n_neg"), col("nb").as("n_bins"))
    },
    Some("""
      WITH g AS (
        SELECT CAST(floor(value * 4.0) AS BIGINT) AS bin,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS np,
               CAST(count(*) FILTER (WHERE event_type <> 'purchase') AS BIGINT) AS nn
        FROM events GROUP BY 1),
      c AS (
        SELECT np, nn,
               CAST(COALESCE(sum(nn) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                 AS cumneg
        FROM g)
      SELECT round(CAST(sum(np * (cumneg * 2 + nn)) AS DOUBLE) /
                   CAST(sum(np) * sum(nn) * 2 AS DOUBLE), 6) AS auc_q,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             count(*) AS n_bins
      FROM c"""))

  // --------------------------------------------------------------- q125
  // Ordered funnel conversion over the event stream: users who viewed,
  // then clicked strictly AFTER their first view, then purchased strictly
  // AFTER that first qualifying click — the classic product-analytics
  // funnel where step N must temporally follow step N-1 (a plain
  // GROUP BY event_type cannot express the ordering).
  // Shape: three min-aggregations chained by inner joins, every one keyed
  // by user_id — Catalyst plans ONE user_id exchange and reuses it across
  // all stages (no broadcast needed, no re-shuffle); per-user state is one
  // timestamp per step, so skewed users cost nothing. Conversion ratios
  // are exact-integer divisions → bit-identical doubles.
  private val q125 = QueryDef(
    "q125_funnel_conversion",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"), col("ts"), col("event_type"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n_view_users"))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_users")))
        .crossJoin(c.agg(count(lit(1)).as("n_click_users")))
        // empty-stage guards (DegenerateDataSpec): a funnel stage with
        // zero users makes the next ratio 0/0 — NULL in DuckDB, ANSI
        // throw in Spark without the when()s
        .select(col("n_view_users"), col("n_click_users"),
          col("n_purchase_users"),
          when(col("n_view_users") > 0L,
            col("n_click_users").cast("double") /
              col("n_view_users").cast("double")).as("conv_view_click"),
          when(col("n_click_users") > 0L,
            col("n_purchase_users").cast("double") /
              col("n_click_users").cast("double")).as("conv_click_purchase"))
    },
    Some("""
      WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM v) AS n_view_users,
             (SELECT count(*) FROM c) AS n_click_users,
             (SELECT count(*) FROM p) AS n_purchase_users,
             CAST((SELECT count(*) FROM c) AS DOUBLE) /
               CAST((SELECT count(*) FROM v) AS DOUBLE) AS conv_view_click,
             CAST((SELECT count(*) FROM p) AS DOUBLE) /
               CAST((SELECT count(*) FROM c) AS DOUBLE) AS conv_click_purchase"""))

  // --------------------------------------------------------------- q293
  // Timeout funnel ([EXT], the Amplitude/GA "within N minutes" funnel):
  // q125 orders steps temporally but lets a purchase count years after
  // the click; real conversion funnels bound every step — here click
  // WITHIN 24 HOURS of the first view, purchase WITHIN 72 HOURS of
  // that qualifying click (windows sized to this testbed's ~33
  // events/user/month density; a web-scale stream would use minutes). A user outside the window drops even though
  // the plain ordered funnel (q125) would count them, so the pair of
  // queries brackets attribution policy. Also reports mean step
  // latencies — the funnel-speed number product teams track beside
  // conversion.
  //
  // Shape: q125's min-aggregation chain with interval upper bounds —
  // still one user_id exchange reused across stages, per-user state one
  // timestamp per step. Latencies are exact integer seconds
  // (epoch-µs diff DIV 1e6, the truncating form both engines share);
  // their means are single exact-int divisions. Conversion ratios
  // likewise. Everything after the per-user minima is a 1-row cross of
  // broadcast aggregates.
  private val q293 = QueryDef(
    "q293_timeout_funnel",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"), col("ts"), col("event_type"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"),
          min(col("t1")).as("t1"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c.select(col("user_id"), col("t2")), Seq("user_id"))
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 72 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"),
          min(col("t2")).as("t2"))
      v.agg(count(lit(1)).as("n_view_users"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click_24h"),
          sum(expr("(unix_micros(t2) - unix_micros(t1)) DIV 1000000"))
            .as("lag_c"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase_72h"),
          sum(expr("(unix_micros(t3) - unix_micros(t2)) DIV 1000000"))
            .as("lag_p"))))
        // empty-stage guards (q125's, DegenerateDataSpec); a NULL lag sum
        // over an empty stage also needs the count guard, not coalesce —
        // DuckDB's NULL/0 is NULL either way
        .select(col("n_view_users"), col("n_click_24h"),
          col("n_purchase_72h"),
          when(col("n_view_users") > 0L,
            col("n_click_24h").cast("double") /
              col("n_view_users").cast("double")).as("conv_view_click"),
          when(col("n_click_24h") > 0L,
            col("n_purchase_72h").cast("double") /
              col("n_click_24h").cast("double")).as("conv_click_purchase"),
          when(col("n_click_24h") > 0L,
            col("lag_c").cast("double") /
              col("n_click_24h").cast("double")).as("avg_click_lag_s"),
          when(col("n_purchase_72h") > 0L,
            col("lag_p").cast("double") /
              col("n_purchase_72h").cast("double")).as("avg_purchase_lag_s"))
    },
    Some("""
      WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (
        SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
          AND e.ts <= v.t1 + INTERVAL 24 HOURS
        GROUP BY e.user_id),
      p AS (
        SELECT e.user_id, min(e.ts) AS t3, min(c.t2) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
          AND e.ts <= c.t2 + INTERVAL 72 HOURS
        GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM v) AS n_view_users,
             (SELECT count(*) FROM c) AS n_click_24h,
             (SELECT count(*) FROM p) AS n_purchase_72h,
             CAST((SELECT count(*) FROM c) AS DOUBLE) /
               CAST((SELECT count(*) FROM v) AS DOUBLE) AS conv_view_click,
             CAST((SELECT count(*) FROM p) AS DOUBLE) /
               CAST((SELECT count(*) FROM c) AS DOUBLE)
               AS conv_click_purchase,
             CAST((SELECT sum((epoch_us(t2) - epoch_us(t1)) // 1000000)
                   FROM c) AS DOUBLE) /
               CAST((SELECT count(*) FROM c) AS DOUBLE) AS avg_click_lag_s,
             CAST((SELECT sum((epoch_us(t3) - epoch_us(t2)) // 1000000)
                   FROM p) AS DOUBLE) /
               CAST((SELECT count(*) FROM p) AS DOUBLE)
               AS avg_purchase_lag_s"""))

  // --------------------------------------------------------------- q131
  // Incremental statistics maintenance via MERGEABLE aggregation state —
  // the pattern behind every "update corpus stats without rescanning
  // 100 TB" job: per-slice partial states (n, Σx, Σx²) are computed
  // independently (here: the standing corpus doc_id % 3 < 2 vs the new
  // batch doc_id % 3 = 2), then MERGED by plain addition, and mean /
  // population variance are derived only at the end from the merged
  // integers. The oracle computes the SAME statistics in one direct
  // pass — the hash match is therefore a PROOF that the merge path is
  // exact, not approximately right: merging loses nothing because every
  // state component is an exact BIGINT (token counts are integers; at
  // 100 TB promote Σx² to DECIMAL(38,0) — same algebra).
  // Catalyst detail: both groupBys are hash aggs with map-side combine;
  // the (source, slice) pre-agg output is tiny, so the merge is free.
  private val q131 = QueryDef(
    "q131_incremental_stats_merge",
    (s, d) => {
      val base = docs(s, d).select(col("source"),
        (col("doc_id") % 3 === 2).as("is_new"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      val partials = base
        .groupBy(col("source"), col("is_new"))
        .agg(count(lit(1)).as("n"), sum(col("nt")).as("s1"),
          sum(col("nt") * col("nt")).as("s2"))
      partials
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_docs"), sum(col("s1")).as("tok_total"),
          sum(col("s2")).as("s2"))
        .select(col("source"), col("n_docs"), col("tok_total"),
          (col("tok_total").cast("double") / col("n_docs").cast("double"))
            .as("mean_tok"),
          ((col("n_docs") * col("s2") - col("tok_total") * col("tok_total"))
            .cast("double") /
            (col("n_docs") * col("n_docs")).cast("double")).as("var_tok"))
        .orderBy(col("source"))
    },
    Some("""
      SELECT source, count(*) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS tok_total,
             CAST(sum(nt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tok,
             CAST(count(*) * sum(nt * nt) - sum(nt) * sum(nt) AS DOUBLE) /
               CAST(count(*) * count(*) AS DOUBLE) AS var_tok
      FROM (SELECT source, len(string_split(text, ' ')) AS nt
            FROM documents)
      GROUP BY source
      ORDER BY source"""))

  // --------------------------------------------------------------- q132
  // Last-touch attribution: each purchase is credited to the user's most
  // recent PRIOR non-purchase event (the marketing-attribution join that
  // is really a per-key ordered scan, not a join). last(..., ignoreNulls)
  // over ROWS UNBOUNDED PRECEDING..1 PRECEDING is a running O(1) state
  // per row — no self-join, no per-purchase backward probe.
  // Scale: ONE user_id exchange; the window sort is per-user and bounded.
  // Revenue sums integer cents (Num.sumFixed) — order-independent.
  private val q132 = QueryDef(
    "q132_last_touch_attribution",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(s, d)
        .withColumn("prior",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("prior"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sumFixed(col("value"), 2).as("revenue"))
        .orderBy(col("channel"))
    },
    Some(s"""
      WITH a AS (
        SELECT user_id, event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prior
        FROM events)
      SELECT COALESCE(prior, 'none') AS channel,
             count(*) AS n_purchases,
             ${sumFixedSql("value", 2)} AS revenue
      FROM a
      WHERE event_type = 'purchase'
      GROUP BY channel
      ORDER BY channel"""))

  // --------------------------------------------------------------- q134
  // Calendar gap-fill + last-observation-carried-forward: densify each
  // event type's daily revenue series over the full corpus date range
  // (missing days appear as rows), then fill gaps with the last observed
  // value — the timeseries-regularization op every downstream
  // forecasting/feature job needs before it can window by day.
  // Shape: daily agg (cents, exact) → one tiny min/max scalar → calendar
  // explode per type (sequence of days — generated, not joined from a
  // calendar table) → LEFT join observed days → LOCF via
  // last(ignoreNulls) over ROWS UNBOUNDED PRECEDING.
  // Scale: the dense grid is |types| × |days| — independent of event
  // count; the daily agg is a map-side-combined hash agg, and the LOCF
  // window sorts per type only. Everything after the first agg operates
  // on the GRID, so 100 TB of raw events never reaches the window.
  // The synthetic feed has NO missing days (every type reports daily), so
  // gaps are PLANTED deterministically and mirrored in the oracle (q114
  // precedent): days with day % 7 ∈ {3, 5} are dropped as "outages" —
  // without this the LOCF path would never execute.
  private val q134 = QueryDef(
    "q134_gapfill_locf",
    (s, d) => {
      val daily = ev(s, d)
        .select(col("event_type"),
          expr("unix_timestamp(ts) DIV 86400").as("day"),
          col("value"))
        .filter(col("day") % 7 =!= 3 && col("day") % 7 =!= 5)
        .groupBy(col("event_type"), col("day"))
        .agg(sumFixed(col("value"), 2).as("rev"))
      val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val grid = daily.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1)")).as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val filled = grid.join(daily, Seq("event_type", "day"), "left")
        .withColumn("rev_f", last(col("rev"), ignoreNulls = true).over(w))
      filled.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("rev").isNull, 1L).otherwise(0L)).as("n_gap_days"),
          sumFixed(col("rev_f"), 2).as("filled_total"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH daily AS (
        SELECT event_type, CAST(epoch(ts) AS BIGINT) // 86400 AS day,
               ${sumFixedSql("value", 2)} AS rev
        FROM events
        WHERE (CAST(epoch(ts) AS BIGINT) // 86400) % 7 NOT IN (3, 5)
        GROUP BY 1, 2),
      span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      grid AS (
        SELECT t.event_type, gs.day
        FROM (SELECT DISTINCT event_type FROM daily) t,
             (SELECT unnest(generate_series(d0, d1)) AS day FROM span) gs),
      filled AS (
        SELECT g.event_type, g.day, daily.rev,
               last_value(daily.rev IGNORE NULLS)
                 OVER (PARTITION BY g.event_type ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS rev_f
        FROM grid g
        LEFT JOIN daily ON daily.event_type = g.event_type
                       AND daily.day = g.day)
      SELECT event_type, count(*) AS n_days,
             CAST(sum(CASE WHEN rev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gap_days,
             ${sumFixedSql("rev_f", 2)} AS filled_total
      FROM filled
      GROUP BY event_type
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q126
  // Cohort retention matrix — the product-analytics staple: users are
  // grouped by the week of their FIRST event (cohort), then each
  // (cohort, weeks-since-signup) cell counts how many cohort members
  // were still active that week, plus the retention ratio against the
  // cohort's week-0 size.
  // Shape: distinct (user, week) activity → per-user min week (the
  // cohort) → grid-sized counts. Scale: ONE user_id exchange does all
  // the work — the distinct and the min-week agg share the same hash
  // partitioning (Catalyst reuses the exchange), the re-join of the
  // cohort label is user-keyed on that same layout, and everything
  // after is |cohorts| × |weeks| — independent of event volume. The
  // week-0 sizes come from the grid itself (filter offset = 0), not a
  // second scan, and broadcast into the ratio join.
  private val q126 = QueryDef(
    "q126_cohort_retention",
    (s, d) => {
      val uw = ev(s, d)
        .select(col("user_id"),
          expr("unix_timestamp(ts) DIV 604800").as("wk"))
        .distinct()
      val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
      val act = uw.join(cohort, "user_id")
        .groupBy(col("cwk").as("cohort_week"),
          (col("wk") - col("cwk")).as("offset_weeks"))
        .agg(count(lit(1)).as("n_active"))
      val sz = act.filter(col("offset_weeks") === 0)
        .select(col("cohort_week"), col("n_active").as("cohort_size"))
      act.join(broadcast(sz), "cohort_week")
        .select(col("cohort_week"), col("offset_weeks"), col("cohort_size"),
          col("n_active"),
          round(col("n_active").cast("double") / col("cohort_size"), 6)
            .as("retention"))
        .orderBy(col("cohort_week"), col("offset_weeks"))
    },
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(epoch(ts) AS BIGINT) // 604800 AS wk
        FROM events),
      ch AS (SELECT user_id, min(wk) AS cwk FROM uw GROUP BY 1),
      act AS (
        SELECT c.cwk AS cohort_week, u.wk - c.cwk AS offset_weeks,
               count(*) AS n_active
        FROM uw u JOIN ch c ON u.user_id = c.user_id
        GROUP BY 1, 2),
      sz AS (SELECT cohort_week, n_active AS cohort_size
             FROM act WHERE offset_weeks = 0)
      SELECT a.cohort_week, a.offset_weeks, s.cohort_size, a.n_active,
             round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6)
               AS retention
      FROM act a JOIN sz s ON a.cohort_week = s.cohort_week
      ORDER BY a.cohort_week, a.offset_weeks"""))

  // --------------------------------------------------------------- q298
  // One Dawid–Skene EM step ([EXT], Dawid & Skene 1979) — the
  // crowd-label aggregation that SUPERSEDES majority vote: q297 asks
  // "do the raters agree?", this asks "given HOW each rater errs, what
  // is the best consensus?". Init: majority vote over the q297 tier
  // raters (all-distinct ties → min label, deterministic); M-step:
  // Laplace(1)-smoothed per-rater confusion matrices T_r[k,l] and class
  // priors π_k against the majority init (smoothing kills both the
  // zero-cell and empty-class divisions — the documented MLE
  // deviation); E-step: posterior p_k ∝ π_k·Π_r T_r[k, l_ir], argmax
  // with (p desc, k) tiebreak. Everything after the corpus scan runs on
  // the K³ = 27 LABEL-PATTERN GRID (q249's pattern-domain trick) — the
  // output is one row per observed pattern with its item count,
  // majority and DS labels, normalized winning posterior, and whether
  // DS overturned the vote (the rows where rater quality matters).
  //
  // Exactness: confusions and priors are exact smoothed-integer ratios;
  // each pattern×class posterior is ONE fixed-order product of four
  // such ratios (scalar expression, not an aggregation — deterministic
  // without quantization); the 3-term normalizer is a fixed-order
  // scalar sum. Scale: one corpus scan to the pattern grid + one to the
  // per-rater confusion counts (both map-side-combined); all joins are
  // broadcasts of ≤ 27-row tables.
  private val q298 = QueryDef(
    "q298_dawid_skene",
    (s, d) => {
      def tier(lo: Int, hi: Int) = {
        val t = size(split(col("text"), " "))
        when(t < lo, 0L).when(t < hi, 1L).otherwise(2L)
      }
      val lab = docs(s, d).select(
        tier(40, 70).as("r1"), tier(45, 75).as("r2"), tier(35, 65).as("r3"))
        .withColumn("m",
          when(col("r1") === col("r2") || col("r1") === col("r3"),
            col("r1"))
            .when(col("r2") === col("r3"), col("r2"))
            .otherwise(least(col("r1"), col("r2"), col("r3"))))
      val pat = lab.groupBy(col("r1"), col("r2"), col("r3"), col("m"))
        .agg(count(lit(1)).as("n_items"))
      // per-rater confusion counts vs the majority init, long form
      val conf = lab.select(explode(array(
          struct(lit(1L).as("rater"), col("m").as("k"), col("r1").as("l")),
          struct(lit(2L).as("rater"), col("m").as("k"), col("r2").as("l")),
          struct(lit(3L).as("rater"), col("m").as("k"), col("r3").as("l"))))
          .as("e"))
        .select(col("e.rater"), col("e.k"), col("e.l"))
        .groupBy(col("rater"), col("k"), col("l"))
        .agg(count(lit(1)).as("c"))
      val ktot = conf.groupBy(col("rater"), col("k"))
        .agg(sum(col("c")).as("tot"))
      // complete the (rater, k, l) domain so absent cells smooth to
      // 1/(tot+3) instead of vanishing
      val dom = conf.select(col("rater")).distinct()
        .crossJoin(spark_domain3(s, "k")).crossJoin(spark_domain3(s, "l"))
      val t = dom.join(conf, Seq("rater", "k", "l"), "left")
        .na.fill(0L, Seq("c"))
        .join(ktot, Seq("rater", "k"), "left")
        .na.fill(0L, Seq("tot"))
        .withColumn("t", (col("c") + 1L).cast("double") /
          (col("tot") + 3L).cast("double"))
      val pri = lab.groupBy(col("m").as("k")).agg(count(lit(1)).as("nk"))
      val nTot = lab.agg(count(lit(1)).as("nn"))
      val prior = spark_domain3(s, "k")
        .join(pri, Seq("k"), "left").na.fill(0L, Seq("nk"))
        .crossJoin(broadcast(nTot))
        .withColumn("pi", (col("nk") + 1L).cast("double") /
          (col("nn") + 3L).cast("double"))
        .select(col("k"), col("pi"))
      val post = pat.crossJoin(broadcast(prior))
        .join(broadcast(t.filter(col("rater") === 1L)
          .select(col("k"), col("l").as("r1"), col("t").as("t1"))),
          Seq("k", "r1"))
        .join(broadcast(t.filter(col("rater") === 2L)
          .select(col("k"), col("l").as("r2"), col("t").as("t2"))),
          Seq("k", "r2"))
        .join(broadcast(t.filter(col("rater") === 3L)
          .select(col("k"), col("l").as("r3"), col("t").as("t3"))),
          Seq("k", "r3"))
        .withColumn("p", col("pi") * col("t1") * col("t2") * col("t3"))
      // wide pivot so the normalizer is a FIXED-ORDER scalar sum
      // (a 3-row window SUM would round in engine-internal row order)
      val wide = post.groupBy(col("r1"), col("r2"), col("r3"),
          col("n_items"), col("m"))
        .agg(max(when(col("k") === 0L, col("p"))).as("p0"),
          max(when(col("k") === 1L, col("p"))).as("p1"),
          max(when(col("k") === 2L, col("p"))).as("p2"))
      wide
        .withColumn("ds_label",
          when(col("p0") >= col("p1") && col("p0") >= col("p2"), 0L)
            .when(col("p1") >= col("p2"), 1L).otherwise(2L))
        .withColumn("pw",
          when(col("ds_label") === 0L, col("p0"))
            .when(col("ds_label") === 1L, col("p1")).otherwise(col("p2")))
        .select(col("r1"), col("r2"), col("r3"), col("n_items"),
          col("m").as("majority"), col("ds_label"),
          Num.roundZ(col("pw") / (col("p0") + col("p1") + col("p2")), 6)
            .as("posterior"),
          (col("ds_label") =!= col("m")).as("overturned"))
        .orderBy(col("r1"), col("r2"), col("r3"))
    },
    Some("""
      WITH lab AS (
        SELECT r1, r2, r3,
               CASE WHEN r1 = r2 OR r1 = r3 THEN r1
                    WHEN r2 = r3 THEN r2
                    ELSE least(r1, r2, r3) END AS m
        FROM (
          SELECT CASE WHEN len(str_split(text, ' ')) < 40 THEN 0
                      WHEN len(str_split(text, ' ')) < 70 THEN 1
                      ELSE 2 END AS r1,
                 CASE WHEN len(str_split(text, ' ')) < 45 THEN 0
                      WHEN len(str_split(text, ' ')) < 75 THEN 1
                      ELSE 2 END AS r2,
                 CASE WHEN len(str_split(text, ' ')) < 35 THEN 0
                      WHEN len(str_split(text, ' ')) < 65 THEN 1
                      ELSE 2 END AS r3
          FROM documents) x),
      pat AS (
        SELECT r1, r2, r3, m, count(*) AS n_items
        FROM lab GROUP BY 1, 2, 3, 4),
      confl AS (
        SELECT rater, k, l, count(*) AS c FROM (
          SELECT 1 AS rater, m AS k, r1 AS l FROM lab
          UNION ALL SELECT 2, m, r2 FROM lab
          UNION ALL SELECT 3, m, r3 FROM lab) u
        GROUP BY 1, 2, 3),
      ktot AS (
        SELECT rater, k, CAST(sum(c) AS BIGINT) AS tot
        FROM confl GROUP BY 1, 2),
      dom AS (
        SELECT r.rater, k.k, l.l
        FROM (SELECT DISTINCT rater FROM confl) r
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS l) l),
      t AS (
        SELECT d.rater, d.k, d.l,
               CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                 / CAST(COALESCE(kt.tot, 0) + 3 AS DOUBLE) AS t
        FROM dom d
        LEFT JOIN confl c ON c.rater = d.rater AND c.k = d.k
                         AND c.l = d.l
        LEFT JOIN ktot kt ON kt.rater = d.rater AND kt.k = d.k),
      prior AS (
        SELECT k.k,
               CAST(COALESCE(p.nk, 0) + 1 AS DOUBLE)
                 / CAST(t.nn + 3 AS DOUBLE) AS pi
        FROM (SELECT unnest([0, 1, 2]) AS k) k
        LEFT JOIN (SELECT m AS k, count(*) AS nk FROM lab GROUP BY 1) p
          ON p.k = k.k
        CROSS JOIN (SELECT count(*) AS nn FROM lab) t),
      post AS (
        SELECT p.r1, p.r2, p.r3, p.n_items, p.m, pr.k,
               pr.pi * t1.t * t2.t * t3.t AS p
        FROM pat p
        CROSS JOIN prior pr
        JOIN t t1 ON t1.rater = 1 AND t1.k = pr.k AND t1.l = p.r1
        JOIN t t2 ON t2.rater = 2 AND t2.k = pr.k AND t2.l = p.r2
        JOIN t t3 ON t3.rater = 3 AND t3.k = pr.k AND t3.l = p.r3),
      wide AS (
        SELECT r1, r2, r3, n_items, m,
               max(CASE WHEN k = 0 THEN p END) AS p0,
               max(CASE WHEN k = 1 THEN p END) AS p1,
               max(CASE WHEN k = 2 THEN p END) AS p2
        FROM post GROUP BY 1, 2, 3, 4, 5),
      win AS (
        SELECT r1, r2, r3, n_items, m, p0, p1, p2,
               CASE WHEN p0 >= p1 AND p0 >= p2 THEN 0
                    WHEN p1 >= p2 THEN 1 ELSE 2 END AS ds_label
        FROM wide)
      SELECT r1, r2, r3, n_items, m AS majority, ds_label,
             (CAST(round(((CASE WHEN ds_label = 0 THEN p0
                                WHEN ds_label = 1 THEN p1
                                ELSE p2 END) / (p0 + p1 + p2)) * 1e6)
               AS BIGINT) / 1e6) AS posterior,
             (ds_label <> m) AS overturned
      FROM win
      ORDER BY r1, r2, r3"""))

  /** Tiny 3-value integer domain (0, 1, 2) as a broadcastable frame. */
  private def spark_domain3(s: SparkSession, name: String): DataFrame = {
    import s.implicits._
    Seq(0L, 1L, 2L).toDF(name)
  }

  // --------------------------------------------------------------- q297
  // Fleiss' kappa for m = 3 raters × K = 3 categories ([EXT], Fleiss
  // 1971) — the multi-annotator generalization of q239's two-rater
  // Cohen's κ, the agreement gate a labeling pipeline runs before
  // trusting a pooled annotator crowd. The three deterministic raters
  // every corpus already has: length-tier labelers (short/medium/long)
  // with rater-specific token thresholds (40/70, 45/75, 35/65) —
  // correlated, boundary-disagreeing, exactly like human length
  // judgments. Per-item agreement needs only the pair-equality count:
  // Σ_j n_ij² = m + 2·(#equal pairs), so no per-item category pivot
  // materializes. κ = (P̄ − P̄ₑ)/(1 − P̄ₑ) is assembled from FOUR exact
  // BIGINTs (S₂ = Σᵢ Σ_j n_ij², the three per-category rating masses)
  // over common denominators: κ = (A·D − C·B)/(B·(D − C)) with
  // A = S₂ − Nm, B = Nm(m−1), C = Σ_j c_j², D = (Nm)² — ONE division
  // of exact integers, no quantization. Per-language rows, q239 style.
  // Scale: one corpus scan into a |langs|-row conditional aggregate.
  private val q297 = QueryDef(
    "q297_fleiss_kappa",
    (s, d) => {
      def tier(lo: Int, hi: Int) = {
        val t = size(split(col("text"), " "))
        when(t < lo, 0L).when(t < hi, 1L).otherwise(2L)
      }
      val lab = docs(s, d).select(col("lang"),
        tier(40, 70).as("r1"), tier(45, 75).as("r2"), tier(35, 65).as("r3"))
        .withColumn("s_i", lit(3L) + lit(2L) *
          (when(col("r1") === col("r2"), 1L).otherwise(0L) +
           when(col("r1") === col("r3"), 1L).otherwise(0L) +
           when(col("r2") === col("r3"), 1L).otherwise(0L)))
      def cj(j: Int) =
        sum(Seq("r1", "r2", "r3").map(r =>
          when(col(r) === j.toLong, 1L).otherwise(0L)).reduce(_ + _))
      val g = lab.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_items"), sum(col("s_i")).as("s2"),
          cj(0).as("c0"), cj(1).as("c1"), cj(2).as("c2"))
        .withColumn("nm", col("n_items") * 3L)
        .withColumn("a", col("s2") - col("nm"))
        .withColumn("b", col("nm") * 2L)
        .withColumn("c", col("c0") * col("c0") + col("c1") * col("c1") +
          col("c2") * col("c2"))
        .withColumn("dd", col("nm") * col("nm"))
      g.select(col("lang"), col("n_items"), col("c0"), col("c1"),
          col("c2"),
          (col("a").cast("double") / col("b").cast("double")).as("p_bar"),
          (col("c").cast("double") / col("dd").cast("double"))
            .as("p_bar_e"),
          // P̄ₑ = 1 (every rating in ONE category, e.g. a single-doc
          // language): the chance correction divides by zero — NULL in
          // DuckDB, guarded to NULL here (q239's condition, Fleiss form)
          when(col("dd") - col("c") > 0L,
            Num.roundZ((col("a") * col("dd") - col("c") * col("b"))
              .cast("double") /
              (col("b") * (col("dd") - col("c"))).cast("double"), 6))
            .as("kappa"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH lab AS (
        SELECT lang,
               CASE WHEN len(str_split(text, ' ')) < 40 THEN 0
                    WHEN len(str_split(text, ' ')) < 70 THEN 1
                    ELSE 2 END AS r1,
               CASE WHEN len(str_split(text, ' ')) < 45 THEN 0
                    WHEN len(str_split(text, ' ')) < 75 THEN 1
                    ELSE 2 END AS r2,
               CASE WHEN len(str_split(text, ' ')) < 35 THEN 0
                    WHEN len(str_split(text, ' ')) < 65 THEN 1
                    ELSE 2 END AS r3
        FROM documents),
      si AS (
        SELECT lang, r1, r2, r3,
               3 + 2 * ((CASE WHEN r1 = r2 THEN 1 ELSE 0 END)
                      + (CASE WHEN r1 = r3 THEN 1 ELSE 0 END)
                      + (CASE WHEN r2 = r3 THEN 1 ELSE 0 END)) AS s_i
        FROM lab),
      g AS (
        SELECT lang, count(*) AS n_items,
               CAST(sum(s_i) AS BIGINT) AS s2,
               CAST(sum((CASE WHEN r1 = 0 THEN 1 ELSE 0 END)
                      + (CASE WHEN r2 = 0 THEN 1 ELSE 0 END)
                      + (CASE WHEN r3 = 0 THEN 1 ELSE 0 END)) AS BIGINT)
                 AS c0,
               CAST(sum((CASE WHEN r1 = 1 THEN 1 ELSE 0 END)
                      + (CASE WHEN r2 = 1 THEN 1 ELSE 0 END)
                      + (CASE WHEN r3 = 1 THEN 1 ELSE 0 END)) AS BIGINT)
                 AS c1,
               CAST(sum((CASE WHEN r1 = 2 THEN 1 ELSE 0 END)
                      + (CASE WHEN r2 = 2 THEN 1 ELSE 0 END)
                      + (CASE WHEN r3 = 2 THEN 1 ELSE 0 END)) AS BIGINT)
                 AS c2
        FROM si GROUP BY 1)
      SELECT lang, n_items, c0, c1, c2,
             CAST(s2 - n_items * 3 AS DOUBLE)
               / CAST(n_items * 3 * 2 AS DOUBLE) AS p_bar,
             CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
               / CAST((n_items * 3) * (n_items * 3) AS DOUBLE) AS p_bar_e,
             (CAST(round((CAST((s2 - n_items * 3)
                   * ((n_items * 3) * (n_items * 3))
                 - (c0 * c0 + c1 * c1 + c2 * c2) * (n_items * 3 * 2)
                 AS DOUBLE)
               / CAST((n_items * 3 * 2) * ((n_items * 3) * (n_items * 3)
                 - (c0 * c0 + c1 * c1 + c2 * c2)) AS DOUBLE)) * 1e6)
               AS BIGINT) / 1e6) AS kappa
      FROM g
      ORDER BY lang"""))

  // --------------------------------------------------------------- q296
  // Sequential probability ratio test over the daily conversion stream
  // ([EXT], Wald 1945 — the always-monitoring primitive behind modern
  // "peeking-safe" experimentation): H₀ p = 0.40 vs H₁ p = 0.42 on the
  // per-user-day purchase conversion, log-likelihood ratio accumulated
  // day by day, decision at ±ln 19 (α = β = 0.05). Complements the
  // fixed-horizon family (q149 Welch, q241 CUPED, q263 DiD, q289
  // stratified ATE): those answer "what is the effect", this answers
  // "when may I stop looking". The full 30-day trajectory ships with
  // each day's standing and the first crossing day — at sf0.1 the test
  // accepts H₀ mid-series, at sf0.01 the 30 days end undecided
  // (stop_day −1): exactly the sample-size sensitivity SPRT exists to
  // expose, measured rather than asserted.
  //
  // Exactness: the two per-observation log-increments are computed ONCE
  // in Scala, quantized to 1e-12 BIGINTs, and interpolated into both
  // plans as integer literals (the q249 shared-literal discipline) — so
  // the running LLR is an exact integer cumulative sum (a window over
  // the 30-row day grid), the thresholds are integer literals, and the
  // reported llr is one exact-int division. Scale: one (user, day)
  // map-side-combined aggregate, one |days|-row grid; nothing else
  // touches the corpus.
  private val q296 = QueryDef(
    "q296_sprt_monitoring",
    (s, d) => {
      val l1q = math.round(math.log(0.42 / 0.40) * 1e12) // conv increment
      val l0q = math.round(math.log(0.58 / 0.60) * 1e12) // non-conv
      val bq = math.round(math.log(19.0) * 1e12)
      val ud = ev(s, d)
        .groupBy(expr(
          "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val daily = ud.groupBy(col("day"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val traj = daily
        .withColumn("llrq", sum(col("n_conv") * lit(l1q) +
          (col("n_users") - col("n_conv")) * lit(l0q)).over(wCum))
        .withColumn("state",
          when(col("llrq") >= bq, "accept_h1")
            .when(col("llrq") <= -bq, "accept_h0")
            .otherwise("continue"))
      val stop = traj.filter(col("state") =!= "continue")
        .agg(min(col("day")).as("sd")) // 1 row
      traj.crossJoin(broadcast(stop))
        .select(col("day"), col("n_users"), col("n_conv"),
          (col("llrq").cast("double") / lit(1e12)).as("llr"),
          col("state"), coalesce(col("sd"), lit(-1L)).as("stop_day"))
        .orderBy(col("day"))
    },
    Some({
      val l1q = math.round(math.log(0.42 / 0.40) * 1e12)
      val l0q = math.round(math.log(0.58 / 0.60) * 1e12)
      val bq = math.round(math.log(19.0) * 1e12)
      s"""
      WITH ud AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day, user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
        FROM events GROUP BY 1, 2),
      daily AS (
        SELECT day, count(*) AS n_users,
               CAST(sum(conv) AS BIGINT) AS n_conv
        FROM ud GROUP BY 1),
      traj AS (
        SELECT day, n_users, n_conv,
               CAST(sum(n_conv * $l1q + (n_users - n_conv) * $l0q)
                 OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS llrq
        FROM daily),
      st AS (
        SELECT day, n_users, n_conv, llrq,
               CASE WHEN llrq >= $bq THEN 'accept_h1'
                    WHEN llrq <= -$bq THEN 'accept_h0'
                    ELSE 'continue' END AS state
        FROM traj),
      stop AS (SELECT min(day) AS sd FROM st WHERE state <> 'continue')
      SELECT s.day, s.n_users, s.n_conv,
             CAST(s.llrq AS DOUBLE) / 1e12 AS llr, s.state,
             COALESCE(stop.sd, -1) AS stop_day
      FROM st s CROSS JOIN stop
      ORDER BY s.day"""
    }))

  // --------------------------------------------------------------- q294
  // Ordered-pair sequence support ([EXT], the length-2 sequential
  // pattern mining primitive): for every ordered type pair (a, b), the
  // number of users for whom SOME a precedes SOME b — q127 counts
  // CONSECUTIVE transitions (a Markov prior), this counts any-gap
  // precedence (the sequential-pattern support behind "users who X
  // eventually Y"), and q125/q293 are its 3-step funnel
  // specializations. exists(a before b) ⇔ min_ts(a) < max_ts(b), so
  // the whole pattern search collapses to per-(user, type) first/last
  // timestamps — no pairwise event scan, no subsequence enumeration.
  // Reports support share and lift n_ab·N/(n_a·n_b) (the q133
  // exact-rational discipline — no logs).
  //
  // Scale: ONE user_id-keyed aggregate (map-side combined to ≤ K rows
  // per user), a per-user K×K self-join bounded by the TYPE DOMAIN
  // (never by event count), then a |K|²-row aggregate; presence counts
  // and the user total broadcast back. Skewed users cost K rows like
  // everyone else.
  private val q294 = QueryDef(
    "q294_sequence_pair_support",
    (s, d) => {
      val ut = ev(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).as("ft"), max(col("ts")).as("lt"))
      val a = ut.select(col("user_id"), col("event_type").as("a"),
        col("ft"))
      val b = ut.select(col("user_id"), col("event_type").as("b"),
        col("lt"))
      val nAb = a.join(b, Seq("user_id"))
        .filter(col("a") =!= col("b") && col("ft") < col("lt"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      val pres = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_t"))
      val nU = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      nAb
        .join(broadcast(pres.select(col("event_type").as("a"),
          col("n_t").as("n_a"))), "a")
        .join(broadcast(pres.select(col("event_type").as("b"),
          col("n_t").as("n_b"))), "b")
        .crossJoin(broadcast(nU))
        .select(col("a"), col("b"), col("n_ab"),
          (col("n_ab").cast("double") / col("n_users").cast("double"))
            .as("support"),
          round((col("n_ab").cast("double") * col("n_users").cast("double"))
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
            .as("lift"))
        .orderBy(col("a"), col("b"))
    },
    Some("""
      WITH ut AS (
        SELECT user_id, event_type, min(ts) AS ft, max(ts) AS lt
        FROM events GROUP BY 1, 2),
      nab AS (
        SELECT a.event_type AS a, b.event_type AS b, count(*) AS n_ab
        FROM ut a JOIN ut b ON a.user_id = b.user_id
        WHERE a.event_type <> b.event_type AND a.ft < b.lt
        GROUP BY 1, 2),
      pres AS (
        SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
      nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut)
      SELECT n.a, n.b, n.n_ab,
             CAST(n.n_ab AS DOUBLE) / CAST(nu.n_users AS DOUBLE) AS support,
             round((CAST(n.n_ab AS DOUBLE) * CAST(nu.n_users AS DOUBLE))
               / (CAST(pa.n_t AS DOUBLE) * CAST(pb.n_t AS DOUBLE)), 6)
               AS lift
      FROM nab n
      JOIN pres pa ON pa.event_type = n.a
      JOIN pres pb ON pb.event_type = n.b
      CROSS JOIN nu
      ORDER BY n.a, n.b"""))

  // --------------------------------------------------------------- q127
  // Markov transition matrix over per-user event sequences: count every
  // adjacent (from → to) event-type pair in each user's timeline and
  // derive the empirical transition probability. This is the
  // sequence-model prior a behavioral pipeline estimates before any
  // training run, and the batch sibling of q88's streaming per-user
  // state: lead() over (user, ts) is the same "previous element of this
  // key's stream" recurrence, expressed as a window.
  // Scale: ONE user_id exchange + per-user bounded sort; the transition
  // agg is map-side combined down to |types|² rows, and the probability
  // normalization is a window over that tiny matrix — no second pass
  // over the events.
  private val q127 = QueryDef(
    "q127_markov_transitions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wf = Window.partitionBy(col("from_type"))
      ev(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .withColumn("n_from", sum(col("n_trans")).over(wf))
        .select(col("from_type"), col("to_type"), col("n_trans"),
          col("n_from"),
          round(col("n_trans").cast("double") / col("n_from"), 6)
            .as("prob"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH t AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events),
      m AS (
        SELECT from_type, to_type, count(*) AS n_trans
        FROM t WHERE to_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT from_type, to_type, n_trans,
             CAST(sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
               AS n_from,
             round(CAST(n_trans AS DOUBLE) /
                   sum(n_trans) OVER (PARTITION BY from_type), 6) AS prob
      FROM m
      ORDER BY from_type, to_type"""))

  // --------------------------------------------------------------- q144
  // Group-wise ordinary-least-squares trend — per event type, the
  // slope/intercept of daily value against days-since-corpus-start: the
  // "is this metric drifting" regression a monitoring pipeline fits per
  // series without any ML runtime. Sibling of q55's correlation: the
  // sufficient statistics (n, Σx, Σy, Σx², Σxy) are EXACT BIGINT sums of
  // cent-scaled values over mean-shiftable day offsets, so the moment
  // pass is order- and partition-independent; the closed-form solve
  // casts each exact moment to double ONCE and then applies the
  // identical IEEE expression in both engines — bit-identical without
  // needing the (overflow-prone) all-integer numerator.
  // Scale: one map-side-combined hash agg over the events scan (the day
  // offset needs min(day), a 1-row broadcast); the solve runs on
  // |types| rows. No window, no second scan.
  private val q144 = QueryDef(
    "q144_groupwise_ols",
    (s, d) => {
      val e = ev(s, d).select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val d0 = e.agg(min(col("day")).as("d0"))
      val m = e.crossJoin(broadcast(d0))
        .withColumn("x", col("day") - col("d0"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("cents")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("cents")).as("sxy"))
      // zero x-variance group (all events on ONE day): the OLS system is
      // singular — DuckDB's /0 yields NULL, Spark ANSI throws; the guard
      // compares the EXACT integer variance term (DegenerateDataSpec)
      val xvar = col("n") * col("sxx") - col("sx") * col("sx")
      m.select(col("event_type"), col("n"),
          when(xvar > 0L,
            Num.roundZ((col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) /
              lit(100.0), 6)).as("slope"),
          when(xvar > 0L,
            Num.roundZ((col("sy").cast("double") -
              (col("n").cast("double") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (col("n").cast("double") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double")) *
                col("sx").cast("double")) /
              col("n").cast("double") / lit(100.0), 6)).as("intercept"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      d0 AS (SELECT min(day) AS d0 FROM e),
      m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(day - d0) AS BIGINT) AS sx,
               CAST(sum(cents) AS BIGINT) AS sy,
               CAST(sum((day - d0) * (day - d0)) AS BIGINT) AS sxx,
               CAST(sum((day - d0) * cents) AS BIGINT) AS sxy
        FROM e CROSS JOIN d0
        GROUP BY event_type)
      SELECT event_type, n,
             (CAST(round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0) * 1e6) AS BIGINT) / 1e6)
               AS slope,
             (CAST(round(((CAST(sy AS DOUBLE) -
                    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                    CAST(sx AS DOUBLE)) /
                   CAST(n AS DOUBLE) / 100.0) * 1e6) AS BIGINT) / 1e6) AS intercept
      FROM m
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q145
  // Top navigation paths — sessionize each user's stream (q52's 30-min
  // gap rule), serialize every session to its ordered event-type path,
  // and keep the 20 most common paths: the clickstream-mining op behind
  // "what do users actually do" dashboards.
  // Shape: gap-flag window → running session counter (two windows, ONE
  // user-keyed sort — same frame, Catalyst plans a single sort) →
  // per-session path via sort_array(collect_list(struct)) — array_sort
  // on (ts, event_id) makes the serialization deterministic under any
  // partitioning, which string_agg-with-ORDER-BY pins on the oracle
  // side → path-keyed count → TakeOrdered 20.
  // Scale: sessions shrink the data before the path agg (the struct
  // list is bounded by session length, not user history); the final cut
  // is a heap, not a sort. At 100 TB the only big exchanges are the
  // user-keyed sessionize and the path-keyed count, both unavoidable
  // and both map-side combined.
  private val q145 = QueryDef(
    "q145_top_paths",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = ev(s, d)
        .withColumn("us", expr("unix_micros(ts)"))
        .withColumn("gap",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
            .otherwise(when(lag(col("us"), 1).over(w).isNull, 1L)
              .otherwise(0L)))
        .withColumn("sess", sum(col("gap")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val paths = sess
        .groupBy(col("user_id"), col("sess"))
        .agg(expr("array_join(transform(" +
          "array_sort(collect_list(struct(ts, event_id, event_type)))," +
          " x -> x.event_type), '>')").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      paths.orderBy(col("n_sessions").desc, col("path")).limit(20)
    },
    Some("""
      WITH g AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000 THEN 1 ELSE 0 END AS gap
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sg AS (
        SELECT user_id, ts, event_id, event_type,
               sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM g),
      p AS (
        SELECT user_id, sess,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sg GROUP BY user_id, sess)
      SELECT path, count(*) AS n_sessions
      FROM p
      GROUP BY path
      ORDER BY n_sessions DESC, path
      LIMIT 20"""))

  // --------------------------------------------------------------- q140
  // PageRank over the order↔part bipartite graph — the iterative graph
  // family beyond q35/q99's connected components: 3 unrolled power
  // iterations of r ← B + Σ_{u→v} d·r(u)/outdeg(u) with d = 0.85.
  // Every quantity is a SCALED BIGINT (total mass 1e12): the damping
  // step is (r·85) DIV (100·outdeg) and the base is (1e12·15) DIV
  // (100·N) — integer DIV truncation is part of the declared semantics,
  // which is what makes the recursion order- and partition-independent
  // and bit-identical across engines (floating-point PageRank is
  // neither). No dangling mass: the bipartite construction emits both
  // directions of every edge, so outdeg ≥ 1 for every node.
  // Scale: Pregel-in-SQL — each iteration is one src-keyed equi-join
  // (ranks are already hash-partitioned by node from the previous
  // dst-keyed aggregation; at 100 TB bucket the edge list by src so the
  // join side never re-shuffles) plus one dst-keyed partial+final sum.
  // The node dictionary and N are derived from the edge aggregation,
  // not a second scan; the final cut is a TakeOrdered heap, not a
  // global sort.
  private val PRScale = 1000000000000L
  private val PRIters = 3
  private val q140 = QueryDef(
    "q140_pagerank_bipartite",
    (s, d) => {
      val e0 = li(s, d)
        .select((col("l_orderkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      // r13: `edges` feeds deg + one join PER ITERATION and `deg` feeds
      // every ranks rebuild — unchecked, the corpus-scale scan+distinct
      // subtree is REPLICATED at every iteration level (the executed plan
      // was 210 nodes with 8 copies of the distinct; exchange reuse only
      // shares the shuffle write, each copy re-ran the final aggregation —
      // the q32 lesson). One localCheckpoint each materializes them once;
      // localCheckpoint (not ScaleCheckpoint) keeps the inherited size
      // stats, so the planner still broadcasts the node-level ranks side
      // of the iteration join — these are linear per-round joins, the
      // stats-safe class the ScaleCheckpoint scaladoc documents. Measured
      // (StageProf + interleaved A/B, sf0.1): total task time 35.9 ->
      // 17.5 s (2×); wall 4.9 -> 4.6 s median — locally the serial AQE
      // stage chain is the floor, so the CPU halving is the at-scale win.
      // Trade-offs accepted (ADVICE r13 #3): localCheckpoint is EAGER
      // (query construction runs two small jobs — a plan capture pays
      // them too) and NON-fault-tolerant (a lost executor fails the query
      // instead of recomputing; acceptable for a bounded 2·|E| edge list
      // whose recompute is itself one scan — rerun beats carrying 8
      // replicated subtree copies). Blocks are freed by the bench's
      // per-query unpersist; long-lived sessions should unpersist
      // explicitly when the query's consumers finish.
      val edges = e0
        .union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .select(col("src").as("node"), col("outdeg"))
        .localCheckpoint()
      val nN = deg.agg(count(lit(1)).as("n_nodes"))
      var ranks = deg.crossJoin(broadcast(nN))
        .select(col("node"), col("outdeg"), col("n_nodes"),
          expr(s"${PRScale}L DIV n_nodes").as("r"))
      for (_ <- 1 to PRIters) {
        val inflow = edges
          .join(ranks.select(col("node").as("src"), col("outdeg").as("od"),
            col("r")), "src")
          .groupBy(col("dst"))
          .agg(sum(expr("(r * 85) DIV (100 * od)")).as("inflow"))
        ranks = deg.crossJoin(broadcast(nN))
          .join(inflow.select(col("dst").as("node"), col("inflow")),
            Seq("node"), "left")
          .select(col("node"), col("outdeg"), col("n_nodes"),
            (expr(s"(${PRScale}L * 15) DIV (100 * n_nodes)") +
              coalesce(col("inflow"), lit(0L))).as("r"))
      }
      ranks.orderBy(col("r").desc, col("node")).limit(20)
        .select(
          when(col("node") % 2 === 0, lit("order")).otherwise(lit("part"))
            .as("kind"),
          expr("node DIV 2").as("key"), col("r").as("pr"))
    },
    Some {
      val iters = (1 to PRIters).map { t =>
        s"""r$t AS (
        SELECT d.node, d.outdeg,
               ($PRScale * 15) // (100 * nn.n_nodes)
                 + COALESCE(f.inflow, 0) AS r
        FROM deg d CROSS JOIN nn
        LEFT JOIN (
          SELECT e.dst AS node,
                 sum((p.r * 85) // (100 * p.outdeg)) AS inflow
          FROM edges e JOIN r${t - 1} p ON p.node = e.src
          GROUP BY 1) f ON f.node = d.node)"""
      }.mkString(",\n      ")
      s"""
      WITH e0 AS (
        SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
        FROM lineitem),
      edges AS (SELECT src, dst FROM e0
                UNION ALL SELECT dst, src FROM e0),
      deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
      nn AS (SELECT count(*) AS n_nodes FROM deg),
      r0 AS (SELECT node, outdeg, $PRScale // n_nodes AS r
             FROM deg CROSS JOIN nn),
      $iters
      SELECT CASE WHEN node % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
             CAST(node // 2 AS BIGINT) AS key,
             CAST(r AS BIGINT) AS pr
      FROM r$PRIters
      ORDER BY r DESC, node
      LIMIT 20"""
    })

  // --------------------------------------------------------------- q146
  // k-core peeling on the order↔part bipartite graph — the third
  // iterative-graph family member after connected components (q35/q99)
  // and PageRank (q140): repeatedly delete nodes with degree < k, the
  // standard densification step before community detection and the
  // graph analogue of q117's source capping. Semantics DECLARED as
  // exactly KCRounds rounds of simultaneous peeling with k = KCoreK
  // (full convergence would need a data-dependent round count, which no
  // cross-engine oracle can unroll) — each round recomputes degrees on
  // the surviving subgraph and drops every node below k at once.
  // Scale: each round is one src-keyed count (map-side combined) plus
  // two LEFT SEMI joins (src side reuses the degree agg's partitioning;
  // the dst side is the one real shuffle). The edge set only shrinks, so
  // round cost is monotone non-increasing; localCheckpoint after each
  // round truncates the doubling lineage (edges feed both the degree
  // agg and the filter — the q32/q35 lesson).
  private val KCoreK = 3
  private val KCRounds = 3
  private val q146 = QueryDef(
    "q146_kcore_peel",
    (s, d) => {
      val e0 = li(s, d)
        .select((col("l_orderkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      var edges = e0
        .union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      for (_ <- 1 to KCRounds) {
        val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= KCoreK)
          .select(col("src").as("node"))
        edges = edges
          .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst"))
          .localCheckpoint()
      }
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(when(col("src") % 2 === 0, lit("order"))
          .otherwise(lit("part")).as("kind"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(expr("src DIV 2")).as("key_checksum"),
          sum(col("deg")).as("n_edges"))
        .orderBy(col("kind"))
    },
    Some {
      val rounds = (1 to KCRounds).map { t =>
        s"""k$t AS (
        SELECT src AS node FROM e${t - 1}
        GROUP BY src HAVING count(*) >= $KCoreK),
      e$t AS (
        SELECT src, dst FROM e${t - 1}
        WHERE src IN (SELECT node FROM k$t)
          AND dst IN (SELECT node FROM k$t))"""
      }.mkString(",\n      ")
      s"""
      WITH b0 AS (
        SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
        FROM lineitem),
      e0 AS (SELECT src, dst FROM b0
             UNION ALL SELECT dst, src FROM b0),
      $rounds,
      sd AS (SELECT src, count(*) AS deg FROM e$KCRounds GROUP BY src)
      SELECT CASE WHEN src % 2 = 0 THEN 'order' ELSE 'part' END AS kind,
             count(*) AS n_nodes,
             CAST(sum(src // 2) AS BIGINT) AS key_checksum,
             CAST(sum(deg) AS BIGINT) AS n_edges
      FROM sd
      GROUP BY 1
      ORDER BY kind"""
    })

  // --------------------------------------------------------------- q149
  // Welch's two-sample t-test per event type — the A/B-experiment
  // readout: users split into arms by user_id parity (deterministic
  // assignment, the hash-bucket idiom), and for each event type the test
  // statistic t = (m̄_a − m̄_b) / √(v_a/n_a + v_b/n_b) plus the
  // Welch–Satterthwaite degrees of freedom are computed from EXACT
  // integer moments (Σcents, Σcents² as BIGINT — cents² ≤ 1e8 ×
  // corpus rows stays far inside 2^63). The closed-form solve uses only
  // +, −, ×, /, √ — all IEEE correctly-rounded operations, so unlike a
  // libm log/erf the result is bit-identical cross-engine (q144's
  // discipline); the p-value lookup (t-CDF, a libm call) is deliberately
  // left to the consumer.
  // Scale: ONE map-side-combined hash aggregation over the events scan —
  // both arms' five moments come from conditional aggregates in the same
  // groupBy(event_type), so adding an arm never adds a scan or a shuffle.
  // |event types| result rows.
  private val q149 = QueryDef(
    "q149_welch_ttest",
    (s, d) => {
      val e = ev(s, d).select(col("event_type"),
        (col("user_id") % 2).as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      val m = e.groupBy(col("event_type")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === 0, col("c") * col("c")).otherwise(0L)).as("qa"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 1, col("c") * col("c")).otherwise(0L)).as("qb"))
      val va = (col("na").cast("double") * col("qa").cast("double") -
        col("sa").cast("double") * col("sa").cast("double")) /
        (col("na").cast("double") * (col("na") - 1).cast("double")) / lit(1e4)
      val vb = (col("nb").cast("double") * col("qb").cast("double") -
        col("sb").cast("double") * col("sb").cast("double")) /
        (col("nb").cast("double") * (col("nb") - 1).cast("double")) / lit(1e4)
      val sea = va / col("na").cast("double")
      val seb = vb / col("nb").cast("double")
      val md = (col("sa").cast("double") / col("na").cast("double") -
        col("sb").cast("double") / col("nb").cast("double")) / lit(100.0)
      m.filter(col("na") > 1 && col("nb") > 1)
        .select(col("event_type"), col("na"), col("nb"),
          Num.roundZ(md, 6).as("mean_diff"),
          Num.roundZ(md / sqrt(sea + seb), 6).as("t_stat"),
          round((sea + seb) * (sea + seb) /
            (sea * sea / (col("na") - 1).cast("double") +
             seb * seb / (col("nb") - 1).cast("double")), 6).as("df"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, user_id % 2 AS arm,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      m AS (
        SELECT event_type,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
               CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS sa,
               CAST(sum(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS qa,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
               CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS sb,
               CAST(sum(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS qb
        FROM e GROUP BY event_type)
      SELECT event_type, na, nb,
             (CAST(round(((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100.0) * 1e6) AS BIGINT) / 1e6)
               AS mean_diff,
             (CAST(round((((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                   - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / 100.0)
               / sqrt(
                 (CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                 / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) / 1e4
                 / CAST(na AS DOUBLE)
               + (CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                  - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                 / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) / 1e4
                 / CAST(nb AS DOUBLE))) * 1e6) AS BIGINT) / 1e6) AS t_stat,
             round(
               ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) / 1e4
                / CAST(na AS DOUBLE)
              + (CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) / 1e4
                / CAST(nb AS DOUBLE))
             * ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) / 1e4
                / CAST(na AS DOUBLE)
              + (CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) / 1e4
                / CAST(nb AS DOUBLE))
             / (
               ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) / 1e4
                / CAST(na AS DOUBLE))
               * ((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) / 1e4
                / CAST(na AS DOUBLE))
               / CAST(na - 1 AS DOUBLE)
             + ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) / 1e4
                / CAST(nb AS DOUBLE))
               * ((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) / 1e4
                / CAST(nb AS DOUBLE))
               / CAST(nb - 1 AS DOUBLE)), 6) AS df
      FROM m
      WHERE na > 1 AND nb > 1
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q150
  // Chi-squared test of independence, lang × source over documents — the
  // "is language distribution independent of data source" audit every
  // multilingual corpus build runs before setting per-source mixture
  // weights. Emits the full contingency diagnostics: per-cell observed
  // count, expected count, and χ² contribution, each derived from exact
  // BIGINT counts. The contribution (o·N − r·c)² / (N·r·c) keeps the
  // numerator difference as an exact BIGINT (≤ N², safe in 2^63 at any
  // SF the driver ships; at 100 TB promote the squared term to DOUBLE —
  // both engines cast the SAME exact integers, so determinism survives),
  // and the one division is IEEE-correctly-rounded. Rounded per-cell
  // values mean the overall χ² = Σ contributions is reconstructible
  // exactly by the consumer; no libm anywhere.
  // Scale: three hash aggregations over one documents scan (cell, row,
  // column margins — the latter two derive from the cell counts, so the
  // corpus is scanned ONCE); the |langs|×|sources| grid then joins two
  // broadcast margin tables. Corpus size never enters the join graph.
  private val q150 = QueryDef(
    "q150_chi2_lang_source",
    (s, d) => {
      val cell = docs(s, d).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val rm = cell.groupBy(col("lang")).agg(sum(col("o")).as("r"))
      val cm = cell.groupBy(col("source")).agg(sum(col("o")).as("c"))
      val n = cell.agg(sum(col("o")).as("n"))
      cell.join(broadcast(rm), Seq("lang"))
        .join(broadcast(cm), Seq("source"))
        .crossJoin(broadcast(n))
        .withColumn("dnum", col("o") * col("n") - col("r") * col("c"))
        .select(col("lang"), col("source"), col("o"),
          round((col("r") * col("c")).cast("double") /
            col("n").cast("double"), 6).as("expected"),
          round((col("dnum") * col("dnum")).cast("double") /
            (col("n") * col("r") * col("c")).cast("double"), 6)
            .as("contrib"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""
      WITH cell AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source),
      rm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY lang),
      cm AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cell GROUP BY source),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cell)
      SELECT cell.lang, cell.source, o,
             round(CAST(r * c AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS expected,
             round(CAST((o * n.n - r * c) * (o * n.n - r * c) AS DOUBLE)
                   / CAST(n.n * r * c AS DOUBLE), 6) AS contrib
      FROM cell
      JOIN rm ON rm.lang = cell.lang
      JOIN cm ON cm.source = cell.source
      CROSS JOIN n
      ORDER BY cell.lang, cell.source"""))

  // --------------------------------------------------------------- q152
  // Time-weighted average — each user's `value` stream integrated over
  // the time it was in effect (value_i held from ts_i until ts_{i+1}),
  // divided by the observed span: the step-function mean behind billing
  // meters, IoT sensor rollups, and position-weighted exposure. Naive
  // avg(value) over-weights bursty periods; the TWA weights each reading
  // by its holding duration. Exactness: durations are integer seconds
  // (µs DIV 1e6 — both engines truncate the same way), values are exact
  // cents, and the cents×seconds products sum as BIGINTs (≤ 1e11 per
  // term — overflow needs a quadrillion-second span), so the single
  // closing division is the only IEEE op.
  // Scale: one user-keyed exchange feeds BOTH the lead() window and the
  // final per-user aggregate (group key = partition key, Catalyst reuses
  // the sort), map-side-combinable thereafter; per-user state is one
  // window row, never the history.
  private val q152 = QueryDef(
    "q152_time_weighted_avg",
    (s, d) => {
      // the window orders by the TRUNCATED second + event_id (not raw µs
      // ts) so intra-second pairing is identical in both engines
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("sec"), col("event_id"))
      ev(s, d)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts) DIV 1000000").as("sec"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .withColumn("nsec", lead(col("sec"), 1).over(w))
        .filter(col("nsec").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum((col("nsec") - col("sec")) * col("cents")).as("wsum"),
          sum(col("nsec") - col("sec")).as("dur"))
        .filter(col("dur") > 0)
        .select(col("user_id"), col("n_intervals"), col("dur").as("dur_s"),
          round(col("wsum").cast("double") /
            col("dur").cast("double") / lit(100.0), 6).as("twa"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, ts,
               epoch_us(ts) // 1000000 AS sec,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      iv AS (
        SELECT user_id, sec, cents,
               lead(sec) OVER (PARTITION BY user_id
                               ORDER BY sec, event_id) AS nsec
        FROM e),
      agg AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(sum((nsec - sec) * cents) AS BIGINT) AS wsum,
               CAST(sum(nsec - sec) AS BIGINT) AS dur_s
        FROM iv WHERE nsec IS NOT NULL
        GROUP BY user_id)
      SELECT user_id, n_intervals, dur_s,
             round(CAST(wsum AS DOUBLE) / CAST(dur_s AS DOUBLE) / 100.0, 6)
               AS twa
      FROM agg
      WHERE dur_s > 0
      ORDER BY user_id"""))

  // --------------------------------------------------------------- q153
  // Time-decay (exponential) multi-touch attribution — every purchase
  // distributes one unit of credit over the user's earlier touch events,
  // weighted by 2^-(days before conversion): the standard marketing-
  // attribution model between q132's last-touch (all credit to one
  // event) and linear (equal credit). The decay base is DELIBERATELY 2
  // with integer-day exponents: 2^-k is a dyadic rational that IEEE
  // doubles represent exactly (shiftleft + one exact division — no libm
  // exp/pow, q133's contract), and a per-conversion sum of multiples of
  // 2^-40 needs ≤ 50 mantissa bits, so even the window SUM is exact and
  // order-independent BEFORE any rounding. Shares are rounded to 1e-9
  // and summed as scaled BIGINTs per touch type.
  // Scale: one user-keyed join pairs conversions with their prior
  // touches (per-user quadratic, bounded by the 40-day horizon — the
  // skew knob is the horizon, and a pathological power-user key salts
  // like q29); one conversion-keyed window normalizes; the final
  // event-type aggregate is map-side combined. Three exchanges total,
  // none corpus²-sized.
  private val q153 = QueryDef(
    "q153_time_decay_attribution",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), expr("unix_micros(ts) DIV 1000000").as("sec"))
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("cid"),
          col("sec").as("csec"))
      val touch = e.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("touch_type"),
          col("sec").as("tsec"))
      val wNorm = Window.partitionBy(col("cid"))
      conv.join(touch, Seq("user_id"))
        .filter(col("tsec") < col("csec") &&
          col("csec") - col("tsec") < lit(86400L * 40))
        .withColumn("dk", expr("(csec - tsec) div 86400"))
        .withColumn("w",
          lit(1.0) / expr("CAST(shiftleft(1L, CAST(dk AS INT)) AS DOUBLE)"))
        .withColumn("share", col("w") / sum(col("w")).over(wNorm))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(round(col("share") * lit(1e9)).cast("long")).as("sc"))
        .select(col("touch_type"), col("n_touches"),
          round(col("sc").cast("double") / lit(1e9), 6).as("credit"))
        .orderBy(col("touch_type"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(ts) // 1000000 AS sec
        FROM events),
      conv AS (
        SELECT user_id, event_id AS cid, sec AS csec
        FROM e WHERE event_type = 'purchase'),
      touch AS (
        SELECT user_id, event_type AS touch_type, sec AS tsec
        FROM e WHERE event_type <> 'purchase'),
      pairs AS (
        SELECT c.cid, t.touch_type,
               1.0 / CAST(1::BIGINT << ((c.csec - t.tsec) // 86400)
                          AS DOUBLE) AS w
        FROM conv c JOIN touch t ON t.user_id = c.user_id
        WHERE t.tsec < c.csec AND c.csec - t.tsec < 86400 * 40),
      shared AS (
        SELECT touch_type,
               CAST(round(w / sum(w) OVER (PARTITION BY cid) * 1e9)
                    AS BIGINT) AS s9
        FROM pairs)
      SELECT touch_type,
             CAST(count(*) AS BIGINT) AS n_touches,
             round(CAST(sum(s9) AS BIGINT) / 1e9, 6) AS credit
      FROM shared
      GROUP BY touch_type
      ORDER BY touch_type"""))

  // --------------------------------------------------------------- q157
  // Per-key EWMA via an ordered fold — the bounded-state recursion
  // y_d = y_prev · 2^-gap + x_d over each user's daily purchase spend,
  // demonstrating the per-key sequential-recurrence operator (the shape
  // behind pattern matching, debouncing, online smoothing) that plain
  // window frames cannot express (the weight depends on BOTH endpoints).
  // Implementation: one hash aggregate collects each user's (day, cents)
  // series (state bounded by the DAY RANGE — ≤366/year — never by event
  // count, because the daily pre-aggregate collapses first), then a
  // higher-order `aggregate()` lambda folds it in day order, entirely
  // inside codegen, no second shuffle.
  // Exactness: the decay base is 2 with integer-day gaps, so the fold
  // runs in 2^40 fixed-point BIGINTs — y·2^-gap is `shiftright`, each
  // day's deposit is `cents << 40` — every step exact, order fixed by the
  // sorted array. The DuckDB oracle uses the closed form
  // Σ cents_d · 2^(40-(T-d)), also exact-integer; fold ≡ closed form
  // whenever the oldest in-horizon term is ≤ 40 days old (testdata spans
  // 30; for longer spans add an age cutoff to both sides — documented
  // contract, same shape as q153's 40-day horizon).
  // Overflow headroom: Σ ≤ 2·max_daily_cents·2^40 (geometric), with
  // max_daily_cents ≈ 6.2e4 at sf0.1 → ≈ 1.4e17 ≪ 2^63.
  private val q157 = QueryDef(
    "q157_ewma_fold",
    (s, d) => {
      val daily = ev(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      daily.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"),
          max(col("day")).as("last_day"),
          sort_array(collect_list(struct(col("day"), col("cents"))))
            .as("arr"))
        .withColumn("s", expr(
          """aggregate(arr,
               named_struct('d', CAST(-1 AS BIGINT), 's', CAST(0 AS BIGINT)),
               (acc, x) -> named_struct(
                 'd', x.day,
                 's', CASE WHEN acc.d < 0 THEN shiftleft(x.cents, 40)
                           ELSE shiftright(acc.s, CAST(x.day - acc.d AS INT))
                                + shiftleft(x.cents, 40) END),
               acc -> acc.s)"""))
        .select(col("user_id"), col("n_days"), col("last_day"),
          round(col("s").cast("double") / lit(1099511627776.0) / lit(100.0), 6)
            .as("ewma"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      m AS (SELECT user_id, max(day) AS t FROM daily GROUP BY 1)
      SELECT d.user_id,
             CAST(count(*) AS BIGINT) AS n_days,
             max(d.day) AS last_day,
             round(CAST(sum(d.cents
                            * (1::BIGINT << CAST(40 - (m.t - d.day) AS INT)))
                        AS DOUBLE) / 1099511627776.0 / 100.0, 6) AS ewma
      FROM daily d JOIN m USING (user_id)
      GROUP BY d.user_id
      ORDER BY d.user_id"""))

  // --------------------------------------------------------------- q289
  // Stratified ATE by direct standardization ([EXT]) — the confounder
  // adjustment that completes the causal family: q241 (CUPED) reduces
  // variance with a pre-period covariate, q263 (DiD) nets out a time
  // trend; this nets out a CONFOUNDED ASSIGNMENT. The synthetic campaign
  // treats customers at segment-dependent rates (20%–80%, deterministic
  // md5 bucket — the q47 hash-split convention on the customer key), so
  // the naive treated-vs-control spend difference mixes the treatment
  // effect with segment composition; the stratified estimator
  // ATE = Σ_s (n_s/N)·(ȳ_s,1 − ȳ_s,0) reweights every stratum's arm
  // difference by its POPULATION share, removing the composition bias
  // (here treatment is hash-random within stratum and spend is largely
  // segment-independent, so both estimates hover near the true null —
  // at sf0.1 the adjustment still moves the point estimate ~30% toward
  // it, the composition share of the naive row's sampling noise).
  // Output: one audited row per stratum plus both corpus-level
  // estimates side by side.
  //
  // Exactness: arm sums are exact cents BIGINTs; each stratum's
  // difference is a fixed-order expression of two exact-int divisions
  // (roundZ final — it can be negative and round to zero); the ATE's
  // weighted sum is order-sensitive, so each stratum term is quantized
  // to a 1e-9 BIGINT grid pre-sum (q225 discipline) and divided back
  // once. Strata missing an arm drop from BOTH the stratum rows and the
  // adjusted estimate (the div-by-zero/NULL cross-engine trap, q215) —
  // a documented estimator precondition, not data-dependent luck.
  // Scale: two map-side-combinable aggregates (per-customer spend, per-
  // stratum arms) and a |segments|-row grid; the summary rows broadcast.
  private val q289 = QueryDef(
    "q289_stratified_ate",
    (s, d) => {
      val base = Tables.t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("stratum"),
          (conv(substring(md5(col("c_custkey").cast("string")
            .cast("binary")), 1, 14), 16, 10).cast("long") % 100L).as("h"))
        .withColumn("thr",
          when(col("stratum") === "AUTOMOBILE", 20L)
            .when(col("stratum") === "BUILDING", 80L)
            .when(col("stratum") === "FURNITURE", 35L)
            .when(col("stratum") === "HOUSEHOLD", 65L)
            .otherwise(50L))
        .withColumn("tr", when(col("h") < col("thr"), 1L).otherwise(0L))
      val spend = Tables.t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val u = base.join(spend, col("c_custkey") === col("o_custkey"), "left")
        .na.fill(0L, Seq("cents"))
      val strata = u.groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_s"),
          sum(col("tr")).as("n_treat"),
          (count(lit(1)) - sum(col("tr"))).as("n_ctrl"),
          sum(when(col("tr") === 1L, col("cents")).otherwise(0L)).as("s1"),
          sum(when(col("tr") === 0L, col("cents")).otherwise(0L)).as("s0"))
        .filter(col("n_treat") > 0L && col("n_ctrl") > 0L)
      val diffC = (col("s1").cast("double") / col("n_treat").cast("double") -
        col("s0").cast("double") / col("n_ctrl").cast("double")) / lit(100.0)
      val perStratum = strata
        .select(col("stratum"), col("n_s"), col("n_treat"), col("n_ctrl"),
          Num.roundZ(diffC, 6).as("diff_usd"), lit("stratum").as("est"))
      val tot = strata.agg(sum(col("n_s")).as("nn")) // 1 row
      val adj = strata.crossJoin(broadcast(tot))
        .select(col("n_s"), col("n_treat"), col("n_ctrl"),
          round((col("n_s").cast("double") / col("nn").cast("double")
            * diffC) * lit(1e9)).cast("long").as("termq"), col("nn"))
        .groupBy(col("nn"))
        .agg(sum(col("n_s")).as("n_s"), sum(col("n_treat")).as("n_treat"),
          sum(col("n_ctrl")).as("n_ctrl"),
          (sum(col("termq")).cast("double") / lit(1e9)).as("diff_usd"))
        .select(lit("ALL").as("stratum"), col("n_s"), col("n_treat"),
          col("n_ctrl"), col("diff_usd"), lit("ate_stratified").as("est"))
      val naive = u.agg(count(lit(1)).as("n_s"),
          sum(col("tr")).as("n_treat"),
          (count(lit(1)) - sum(col("tr"))).as("n_ctrl"),
          sum(when(col("tr") === 1L, col("cents")).otherwise(0L)).as("s1"),
          sum(when(col("tr") === 0L, col("cents")).otherwise(0L)).as("s0"))
        .select(lit("ALL").as("stratum"), col("n_s"), col("n_treat"),
          col("n_ctrl"),
          // the naive row has no HAVING prefilter: an all-one-arm table
          // (possible on degenerate data) leaves its difference undefined
          // → NULL, as DuckDB's /0 yields
          when(col("n_treat") > 0L && col("n_ctrl") > 0L,
            Num.roundZ(diffC, 6)).as("diff_usd"),
          lit("ate_naive").as("est"))
      perStratum.unionByName(adj).unionByName(naive)
        .orderBy(col("est"), col("stratum"))
    },
    Some("""
      WITH base AS (
        SELECT c_custkey, c_mktsegment AS stratum,
               ((('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 14))::BIGINT)
                 % 100) AS h,
               CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 20
                 WHEN 'BUILDING' THEN 80 WHEN 'FURNITURE' THEN 35
                 WHEN 'HOUSEHOLD' THEN 65 ELSE 50 END AS thr
        FROM customer),
      u AS (
        SELECT b.stratum,
               CASE WHEN b.h < b.thr THEN 1 ELSE 0 END AS tr,
               COALESCE(sp.cents, 0) AS cents
        FROM base b LEFT JOIN (
          SELECT o_custkey,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
          FROM orders GROUP BY 1) sp ON sp.o_custkey = b.c_custkey),
      strata AS (
        SELECT stratum, count(*) AS n_s,
               CAST(sum(tr) AS BIGINT) AS n_treat,
               CAST(count(*) - sum(tr) AS BIGINT) AS n_ctrl,
               CAST(sum(CASE WHEN tr = 1 THEN cents ELSE 0 END) AS BIGINT)
                 AS s1,
               CAST(sum(CASE WHEN tr = 0 THEN cents ELSE 0 END) AS BIGINT)
                 AS s0
        FROM u GROUP BY 1
        HAVING sum(tr) > 0 AND count(*) - sum(tr) > 0),
      tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn FROM strata),
      per AS (
        SELECT stratum, n_s, n_treat, n_ctrl,
               (CAST(round(((CAST(s1 AS DOUBLE) / CAST(n_treat AS DOUBLE)
                  - CAST(s0 AS DOUBLE) / CAST(n_ctrl AS DOUBLE)) / 100.0)
                  * 1e6) AS BIGINT) / 1e6) AS diff_usd,
               'stratum' AS est
        FROM strata),
      adj AS (
        SELECT 'ALL' AS stratum, CAST(sum(n_s) AS BIGINT) AS n_s,
               CAST(sum(n_treat) AS BIGINT) AS n_treat,
               CAST(sum(n_ctrl) AS BIGINT) AS n_ctrl,
               CAST(sum(CAST(round((CAST(n_s AS DOUBLE) / CAST(nn AS DOUBLE)
                 * ((CAST(s1 AS DOUBLE) / CAST(n_treat AS DOUBLE)
                    - CAST(s0 AS DOUBLE) / CAST(n_ctrl AS DOUBLE)) / 100.0))
                 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS diff_usd,
               'ate_stratified' AS est
        FROM strata CROSS JOIN tot),
      naive AS (
        SELECT 'ALL' AS stratum, count(*) AS n_s,
               CAST(sum(tr) AS BIGINT) AS n_treat,
               CAST(count(*) - sum(tr) AS BIGINT) AS n_ctrl,
               (CAST(round(((CAST(sum(CASE WHEN tr = 1 THEN cents ELSE 0 END)
                    AS DOUBLE) / CAST(sum(tr) AS DOUBLE)
                  - CAST(sum(CASE WHEN tr = 0 THEN cents ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) - sum(tr) AS DOUBLE)) / 100.0)
                  * 1e6) AS BIGINT) / 1e6) AS diff_usd,
               'ate_naive' AS est
        FROM u)
      SELECT * FROM per
      UNION ALL SELECT * FROM adj
      UNION ALL SELECT * FROM naive
      ORDER BY est, stratum"""))

  // --------------------------------------------------------------- q288
  // Holt double exponential smoothing per user ([EXT], Holt 1957) — the
  // COUPLED level+trend recursion q157's single EWMA cannot express:
  //   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
  //   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
  // with α = β = ½ over each user's observation-indexed daily purchase
  // series (observation-indexed — the standard transaction-series form;
  // calendar gap-filling is q134's op and composes in front). Emits the
  // final level, trend, and the 3-step-ahead forecast l + 3b — the
  // lightweight per-entity forecast a spend-monitoring pipeline keeps.
  //
  // Exactness: state lives in exact micro-dollar BIGINTs; each step is
  // two round((int + int + int)/2.0) ops — the operands are exact
  // integers ≪ 2^52, /2.0 is correctly rounded, and both engines round
  // halves away from zero, so the folded state is bit-identical however
  // it's computed. Spark folds a sort_array'd (day, y) series inside one
  // codegen'd `aggregate()` lambda (state bounded by the day range,
  // q157's argument); the oracle runs the SAME recursion as a recursive
  // CTE stepping (user, rn) → rn+1, re-deriving l_t inline for the b_t
  // update so both sides use the POST-ROUND level (using the pre-round
  // value is the classic implementation divergence). Final values are
  // single divisions of exact integers. Scale: one map-side-combinable
  // daily aggregate, one per-user hash agg; no window over anything
  // unbounded; recursion depth = observations per user, state O(1).
  private val q288 = QueryDef(
    "q288_holt_linear_trend",
    (s, d) => {
      val daily = ev(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"))
        .agg((sum(round(col("value") * 100).cast("long")) * 10000L).as("y"))
      daily.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
          sort_array(collect_list(struct(col("day"), col("y")))).as("arr"))
        .withColumn("st", expr(
          """aggregate(arr,
               named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                            'k', CAST(0 AS BIGINT)),
               (acc, x) -> CASE WHEN acc.k = 0 THEN
                   named_struct('l', x.y, 'b', CAST(0 AS BIGINT),
                                'k', CAST(1 AS BIGINT))
                 ELSE named_struct(
                   'l', CAST(round((x.y + acc.l + acc.b) / 2.0D) AS BIGINT),
                   'b', CAST(round((CAST(round((x.y + acc.l + acc.b) / 2.0D)
                          AS BIGINT) - acc.l + acc.b) / 2.0D) AS BIGINT),
                   'k', acc.k + 1) END,
               acc -> named_struct('l', acc.l, 'b', acc.b))"""))
        .select(col("user_id"), col("n_days"), col("last_day"),
          (col("st.l").cast("double") / lit(1e6)).as("level_usd"),
          (col("st.b").cast("double") / lit(1e6)).as("trend_usd"),
          ((col("st.l") + lit(3L) * col("st.b")).cast("double") / lit(1e6))
            .as("forecast3_usd"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH RECURSIVE daily AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 * 10000 AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      obs AS (
        SELECT user_id, day, y,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily),
      lim AS (
        SELECT user_id, CAST(max(rn) AS BIGINT) AS n_days,
               max(day) AS last_day
        FROM obs GROUP BY 1),
      h AS (
        SELECT user_id, rn, y AS l, CAST(0 AS BIGINT) AS b
        FROM obs WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn,
               CAST(round((o.y + h.l + h.b) / 2.0) AS BIGINT),
               CAST(round((CAST(round((o.y + h.l + h.b) / 2.0) AS BIGINT)
                 - h.l + h.b) / 2.0) AS BIGINT)
        FROM h JOIN obs o ON o.user_id = h.user_id AND o.rn = h.rn + 1)
      SELECT h.user_id, lim.n_days, lim.last_day,
             CAST(h.l AS DOUBLE) / 1e6 AS level_usd,
             CAST(h.b AS DOUBLE) / 1e6 AS trend_usd,
             CAST(h.l + 3 * h.b AS DOUBLE) / 1e6 AS forecast3_usd
      FROM h JOIN lim ON lim.user_id = h.user_id AND h.rn = lim.n_days
      ORDER BY h.user_id"""))

  // --------------------------------------------------------------- q158
  // Poisson-bootstrap confidence interval for a mean — THE way to
  // bootstrap at 100 TB: instead of resampling-with-replacement (which
  // needs global coordination), each row independently draws a
  // Poisson(1) replication count per replica, so the whole B=64-replica
  // bootstrap is ONE scan with a map-side-combined 64-group aggregate.
  // Determinism: the per-(row, replica) uniform is the first 15 hex
  // digits of md5('bs'||b||':'||key) — the house cross-engine hash —
  // compared DIRECTLY as a fixed-width lowercase hex STRING against the
  // inverse-CDF thresholds rendered as the same 15-hex-digit literals
  // (⌊CDF_Poisson(1)(k)·2^60⌋, k=0..5, precomputed below): fixed-width
  // ASCII-hex compare ≡ the numeric compare, and dropping the hex→BIGINT
  // conversion (`conv`) halves the per-row hash-stage cost (measured
  // 2.3 → 1.1 s for the 9.6M-row stage at local[8]). No libm exp
  // anywhere. Replication counts are truncated at 6 (P[K>6] ≈ 6e-5,
  // absorbed into the documented truncation — identically on both sides).
  // CI: order statistics 2 and 63 of the 64 replica means ≈ the 2.5/97.5
  // percentile bootstrap interval. The rank window runs over B=64 rows —
  // replica-count-sized, a constant, never corpus-sized.
  // Parallelism: the ×64 explode multiplies work 64-fold, so the input is
  // hash-repartitioned FIRST — without it the whole 9.6M-hash stage
  // inherits the scan's file partitioning (one task on the single sf0.1
  // parquet file; measured 7.3 → 2.0 s alone at local[32]). At 100 TB the
  // scan has thousands of splits, but the principle stands: spread rows
  // before a work-multiplying generator, the shuffle moves 64× less data
  // than the generator emits. Production swap when cross-engine
  // reproducibility is not required: xxhash64(b, key) is ~7× cheaper than
  // md5 (measured 0.3 vs 2.1 s for the same stage) with the same
  // independence properties.
  private val bsThresholds: Seq[Long] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)
    .map(p => (p * 1152921504606846976.0).toLong)
  private val bsThresholdsHex: Seq[String] =
    bsThresholds.map(t => f"$t%015x")

  private val q158 = QueryDef(
    "q158_bootstrap_ci",
    (s, d) => {
      val o = Tables.t(s, d, "orders").select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val wExpr = bsThresholdsHex
        .map(t => when(col("v") >= lit(t), 1L).otherwise(0L))
        .reduce(_ + _)
      // explicit partition count: a bare repartition(col) is fair game
      // for AQE coalescing, which sizes on the (tiny) shuffle BYTES and
      // cannot see the 64× explode downstream — it folded this stage
      // back to ~1 task (measured 4.6 s vs 2.0 s with the count pinned)
      val rep = o
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("o_orderkey"))
        .withColumn("b", explode(expr("sequence(0, 63)")))
        .withColumn("v", expr(
          """substr(md5(concat('bs', CAST(b AS STRING), ':',
             CAST(o_orderkey AS STRING))), 1, 15)"""))
        .withColumn("w", wExpr)
        .groupBy(col("b"))
        .agg(sum(col("w")).as("ws"), sum(col("w") * col("cents")).as("wc"))
        // a replica whose Poisson weights are all zero (possible only on
        // a tiny table) has no mean — and a NULL rank key would sort
        // FIRST in Spark asc but LAST in DuckDB: exclude on both sides
        .filter(col("ws") > 0L)
        .withColumn("mean", col("wc").cast("double") / col("ws").cast("double"))
      val wRank = Window.orderBy(col("mean"), col("b"))
      val ci = rep.withColumn("rn", row_number().over(wRank))
        .agg(count(lit(1)).as("n_replicas"),
          min(when(col("rn") === 2, col("mean"))).as("lo"),
          min(when(col("rn") === 63, col("mean"))).as("hi"))
      val est = o.agg(
        (sum(col("cents")).cast("double") / count(lit(1)).cast("double"))
          .as("full_mean"))
      ci.crossJoin(broadcast(est))
        .select(col("n_replicas"),
          round(col("full_mean") / 100.0, 6).as("est_mean"),
          round(col("lo") / 100.0, 6).as("ci_lo"),
          round(col("hi") / 100.0, 6).as("ci_hi"))
    },
    Some(s"""
      WITH o AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      rep AS (
        SELECT t.b,
               substr(md5('bs' || CAST(t.b AS VARCHAR) || ':' ||
                          CAST(o.o_orderkey AS VARCHAR)), 1, 15) AS v,
               o.cents
        FROM o, range(64) AS t(b)),
      repw AS (
        SELECT b,
               ${bsThresholdsHex
                 .map(t => s"(CASE WHEN v >= '$t' THEN 1 ELSE 0 END)")
                 .mkString(" + ")} AS w,
               cents
        FROM rep),
      means AS (
        SELECT b, CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
                 AS mean
        FROM repw GROUP BY b HAVING sum(w) > 0),
      ranked AS (
        SELECT mean, row_number() OVER (ORDER BY mean, b) AS rn FROM means),
      est AS (
        SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 AS full_mean
        FROM o)
      SELECT CAST((SELECT count(*) FROM means) AS BIGINT) AS n_replicas,
             round((SELECT full_mean FROM est) / 100.0, 6) AS est_mean,
             round((SELECT mean FROM ranked WHERE rn = 2) / 100.0, 6)
               AS ci_lo,
             round((SELECT mean FROM ranked WHERE rn = 63) / 100.0, 6)
               AS ci_hi"""))

  // --------------------------------------------------------------- q160
  // Calibration report (reliability bins + ECE) — the model-observability
  // query every scoring pipeline runs: does a score's confidence match
  // the observed rate? Score here is the order's price percentile on a
  // FIXED $1000 grid (q139's two-phase exact-percentile pattern: the
  // cumulative window runs over the ≤500-row grid, never the corpus —
  // grid size is set by the value RANGE, not N, so the plan is unchanged
  // at 100 TB); outcome is o_orderstatus = 'F'. Rows join their bucket's
  // cumulative count back via broadcast (the grid is tiny), decile bins
  // come from exact integer arithmetic ((10·cum) DIV N — no double until
  // presentation), and ECE aggregates the per-bin |conf − acc| gaps as
  // 1e-6-scaled BIGINTs over the 10-row bin table, so every reported
  // number is order-independent and bit-identical cross-engine.
  private val q160 = QueryDef(
    "q160_calibration_bins",
    (s, d) => {
      val o = Tables.t(s, d, "orders").select(
        (floor(col("o_totalprice") / 1000.0)).cast("long").as("gb"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("label"))
      val wCum = Window.orderBy(col("gb"))
      val grid = o.groupBy(col("gb")).agg(count(lit(1)).as("cnt"))
        .withColumn("cumb",
          coalesce(sum(col("cnt"))
            .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = o.agg(count(lit(1)).as("n_total"))
      val binned = o.join(broadcast(grid.select(col("gb"), col("cumb"))), Seq("gb"))
        .crossJoin(broadcast(tot))
        .withColumn("bin", expr("(10 * cumb) DIV n_total"))
      val bins = binned.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"),
          sum(col("cumb")).as("sc"), max(col("n_total")).as("n_total"))
        .withColumn("conf",
          col("sc").cast("double") /
            (col("n").cast("double") * col("n_total").cast("double")))
        .withColumn("acc", col("n_pos").cast("double") / col("n").cast("double"))
        .withColumn("g6",
          round(abs(col("conf") - col("acc")) * lit(1e6)).cast("long"))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      bins
        .withColumn("ece_n", sum(col("n") * col("g6")).over(wAll))
        .select(col("bin"), col("n"), round(col("conf"), 6).as("conf"),
          round(col("acc"), 6).as("acc"),
          (col("g6").cast("double") / lit(1e6)).as("gap"),
          round(col("ece_n").cast("double") /
            (col("n_total").cast("double") * lit(1e6)), 6).as("ece"))
        .orderBy(col("bin"))
    },
    Some("""
      WITH o AS (
        SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS gb,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        FROM orders),
      grid AS (
        SELECT gb, count(*) AS cnt,
               coalesce(sum(count(*)) OVER (ORDER BY gb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cumb
        FROM o GROUP BY gb),
      tot AS (SELECT count(*) AS n_total FROM o),
      binned AS (
        SELECT o.label, g.cumb, t.n_total,
               CAST((10 * g.cumb) // t.n_total AS BIGINT) AS bin
        FROM o JOIN grid g USING (gb) CROSS JOIN tot t),
      bins AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(label) AS BIGINT) AS n_pos,
               CAST(sum(cumb) AS BIGINT) AS sc,
               max(n_total) AS n_total
        FROM binned GROUP BY bin),
      gapped AS (
        SELECT bin, n, n_total,
               CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) *
                                     CAST(n_total AS DOUBLE)) AS conf,
               CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
               CAST(round(abs(CAST(sc AS DOUBLE) /
                              (CAST(n AS DOUBLE) * CAST(n_total AS DOUBLE))
                              - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                          * 1e6) AS BIGINT) AS g6
        FROM bins)
      SELECT bin, n, round(conf, 6) AS conf, round(acc, 6) AS acc,
             CAST(g6 AS DOUBLE) / 1e6 AS gap,
             round(CAST(sum(n * g6) OVER () AS DOUBLE) /
                   (CAST(n_total AS DOUBLE) * 1e6), 6) AS ece
      FROM gapped
      ORDER BY bin"""))

  // --------------------------------------------------------------- q164
  // OHLC time-series downsampling — per (user, day) open/high/low/close
  // bars over purchase values, the canonical "compact a tick stream into
  // candles" operator every metrics store runs. Like q156 this is
  // deliberately a PURE HASH AGGREGATE: open/close are min_by/max_by on
  // an integer order key, so each partition reduces to one partial bar
  // per (user, day) map-side and the exchange carries bars, not ticks —
  // the window/sort formulation would shuffle every tick. The order key
  // packs (µs-within-day, event_id) into one BIGINT (8.64e10·2^22 ≈
  // 3.6e17 < 2^63; event_id < 2^22 at any SF the driver generates —
  // documented bound, widen the shift if ids outgrow it); ties are
  // impossible because event_id is unique.
  private val q164 = QueryDef(
    "q164_ohlc_bars",
    (s, d) => {
      val t = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"),
          expr("unix_micros(ts) % 86400000000").as("usod"),
          col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("ok", expr("usod * 4194304 + event_id"))
      t.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_trades"),
          expr("min_by(cents, ok)").as("o"), max(col("cents")).as("h"),
          min(col("cents")).as("l"), expr("max_by(cents, ok)").as("c"))
        .select(col("user_id"), col("day"), col("n_trades"),
          (col("o").cast("double") / 100.0).as("open"),
          (col("h").cast("double") / 100.0).as("high"),
          (col("l").cast("double") / 100.0).as("low"),
          (col("c").cast("double") / 100.0).as("close"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""
      WITH t AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               (epoch_us(ts) % 86400000000) * 4194304 + event_id AS ok,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase')
      SELECT user_id, day,
             CAST(count(*) AS BIGINT) AS n_trades,
             CAST(arg_min(cents, ok) AS DOUBLE) / 100.0 AS open,
             CAST(max(cents) AS DOUBLE) / 100.0 AS high,
             CAST(min(cents) AS DOUBLE) / 100.0 AS low,
             CAST(arg_max(cents, ok) AS DOUBLE) / 100.0 AS close
      FROM t
      GROUP BY user_id, day
      ORDER BY user_id, day"""))

  // --------------------------------------------------------------- q168
  // Exact percentile bands (p50/p90/p99) per event type — the SLO-report
  // operator, computed with q139's two-phase integer-grid pattern so it
  // scales: phase 1 collapses the corpus to (event_type, cents) counts
  // (map-side combined; the group count is bounded by the VALUE RANGE —
  // ≤ ~5e4 distinct cents — not by N), phase 2 runs the cumulative
  // window over that bounded grid partitioned by event_type. The
  // percentile definition is the lower exact quantile: the smallest
  // value with at least ⌈q·n⌉ mass at or below it, decided by the
  // integer comparison 100·cum ≥ q₁₀₀·n — no doubles until the final
  // cents→dollars presentation divide.
  private val q168 = QueryDef(
    "q168_percentile_bands",
    (s, d) => {
      val g = ev(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, 0)
      g.withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") * 100 >= col("n") * 50, col("cents"))).as("p50c"),
          min(when(col("cum") * 100 >= col("n") * 90, col("cents"))).as("p90c"),
          min(when(col("cum") * 100 >= col("n") * 99, col("cents"))).as("p99c"))
        .select(col("event_type"), col("n"),
          (col("p50c").cast("double") / 100.0).as("p50"),
          (col("p90c").cast("double") / 100.0).as("p90"),
          (col("p99c").cast("double") / 100.0).as("p99"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
               count(*) AS cnt
        FROM events GROUP BY 1, 2),
      c AS (
        SELECT event_type, cents,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM g)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             CAST(min(CASE WHEN cum * 100 >= n * 50 THEN cents END)
                  AS DOUBLE) / 100.0 AS p50,
             CAST(min(CASE WHEN cum * 100 >= n * 90 THEN cents END)
                  AS DOUBLE) / 100.0 AS p90,
             CAST(min(CASE WHEN cum * 100 >= n * 99 THEN cents END)
                  AS DOUBLE) / 100.0 AS p99
      FROM c
      GROUP BY event_type
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q162
  // Triangle counting on the part co-purchase graph — the clustering /
  // community-density primitive (graph family: q140 PageRank, q146
  // k-core, q35/q99 components). Edges are part pairs co-ordered in ≥ 2
  // orders (support pruning keeps the graph at affinity signal, not
  // one-off noise). The count uses the DEGREE-ORIENTED wedge algorithm
  // (Schank–Wagner / Cohen's MapReduce form): orient every edge from its
  // (degree, id)-smaller endpoint, generate wedges only from each
  // node's OUT-edges, and close them against the canonical edge table.
  // Orientation is the load-bearing scale choice: out-degrees are
  // O(√E) amortized, so wedge volume is O(E^1.5) instead of Σ deg² —
  // the difference between feasible and explosive on a skewed graph.
  // Shuffles: pair-gen keys on l_orderkey (bounded per order — ≤ C(17,2)
  // pairs here), then edge/degree/wedge joins key on node ids. Every
  // quantity is an exact integer.
  private val q162 = QueryDef(
    "q162_triangle_count",
    (s, d) => {
      val e0 = li(s, d).select(col("l_orderkey").as("o"),
        col("l_partkey").as("p")).distinct()
      val pr = e0.as("a").join(e0.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
        .select(col("u"), col("v"))
      val deg = pr.select(col("u").as("n"))
        .union(pr.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      val ort = pr
        .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")),
            col("u")).otherwise(col("v")).as("s"),
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")),
            col("v")).otherwise(col("u")).as("t"))
      val wedges = ort.as("o1").join(ort.as("o2"),
          col("o1.s") === col("o2.s") && col("o1.t") < col("o2.t"))
        .select(col("o1.t").as("a"), col("o2.t").as("b"))
      val tri = wedges.join(pr,
        col("u") === least(col("a"), col("b")) &&
          col("v") === greatest(col("a"), col("b")))
      val eCnt = pr.agg(count(lit(1)).as("n_edges"))
      val wCnt = wedges.agg(count(lit(1)).as("n_wedges"))
      val tCnt = tri.agg(count(lit(1)).as("n_triangles"))
      eCnt.crossJoin(broadcast(wCnt)).crossJoin(broadcast(tCnt))
    },
    Some("""
      WITH e0 AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      pr AS (
        SELECT a.p AS u, b.p AS v
        FROM e0 a JOIN e0 b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (
        SELECT n, count(*) AS dg FROM (
          SELECT u AS n FROM pr UNION ALL SELECT v FROM pr) t GROUP BY 1),
      ort AS (
        SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
                    THEN u ELSE v END AS s,
               CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
                    THEN v ELSE u END AS t
        FROM pr JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v),
      w AS (
        SELECT o1.t AS a, o2.t AS b
        FROM ort o1 JOIN ort o2 ON o1.s = o2.s AND o1.t < o2.t)
      SELECT (SELECT count(*) FROM pr) AS n_edges,
             (SELECT count(*) FROM w) AS n_wedges,
             count(*) AS n_triangles
      FROM w JOIN pr ON pr.u = least(a, b) AND pr.v = greatest(a, b)"""))

  // --------------------------------------------------------------- q165
  // Day-of-week seasonality profile — per (event_type, weekday): volume,
  // exact mean value, and the seasonal index mean_dow / mean_overall
  // that capacity planning and anomaly baselines consume. One corpus
  // scan into a ≤ 5×7-group aggregate; the per-type overall means come
  // from a second tiny aggregate over THOSE 35 rows (no second corpus
  // pass) and broadcast back. Weekday is Monday=0: Spark's weekday()
  // and DuckDB's isodow()-1 — pinned explicitly because the engines'
  // default dayofweek() disagree on week start. Means divide exact
  // cent-sums; the index divides the two exact rationals in one mirrored
  // expression.
  private val q165 = QueryDef(
    "q165_seasonal_profile",
    (s, d) => {
      val base = ev(s, d).select(col("event_type"),
        expr("CAST(weekday(ts) AS BIGINT)").as("dow"),
        round(col("value") * 100).cast("long").as("cents"))
      val byDow = base.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      val byType = byDow.groupBy(col("event_type"))
        .agg(sum(col("n")).as("nt"), sum(col("sc")).as("sct"))
      byDow.join(broadcast(byType), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          round(col("sc").cast("double") /
            (col("n").cast("double") * 100.0), 6).as("mean_value"),
          // an event type whose TOTAL value is 0 has no base rate to
          // index against: DuckDB's /0.0 yields NULL, Spark ANSI throws
          when(col("sct") =!= 0L,
            round((col("sc").cast("double") / col("n").cast("double")) /
              (col("sct").cast("double") / col("nt").cast("double")), 6))
            .as("seasonal_idx"))
        .orderBy(col("event_type"), col("dow"))
    },
    Some("""
      WITH base AS (
        SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      by_dow AS (
        SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS sc
        FROM base GROUP BY 1, 2),
      by_type AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS nt,
               CAST(sum(sc) AS BIGINT) AS sct
        FROM by_dow GROUP BY 1)
      SELECT event_type, dow, n,
             round(CAST(sc AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 6)
               AS mean_value,
             round((CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) /
                   (CAST(sct AS DOUBLE) / CAST(nt AS DOUBLE)), 6)
               AS seasonal_idx
      FROM by_dow JOIN by_type USING (event_type)
      ORDER BY event_type, dow"""))

  // --------------------------------------------------------------- q166
  // Spend-anomaly detection — flag each user's days whose daily purchase
  // total sits ≥ 2 population-σ from that user's own mean: the per-entity
  // z-score monitor every metrics pipeline runs. Two-level aggregation,
  // both map-side combined: (user, day) daily cents, then per-user exact
  // moments (n, Σx, Σx²) from those ≤366 rows — the q45 moment pattern,
  // so mean and variance come from exact BIGINTs and the only doubles
  // are the final mirrored expressions (sqrt is IEEE-correctly-rounded
  // in both engines, so z and the |z| ≥ 2 cut are bit-identical).
  // Users need ≥ 5 active days for a meaningful σ. Σx² bound: daily
  // cents ≤ ~6.2e4 at sf0.1 → x² ≤ 4e9, ×366 days ≪ 2^63.
  private val q166 = QueryDef(
    "q166_spend_anomalies",
    (s, d) => {
      val daily = ev(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val stats = daily.groupBy(col("user_id"))
        .agg(count(lit(1)).as("nd"), sum(col("cents")).as("sx"),
          sum(col("cents") * col("cents")).as("sxx"))
        .filter(col("nd") >= 5)
      daily.join(stats, "user_id")
        .withColumn("mu", col("sx").cast("double") / col("nd").cast("double"))
        .withColumn("sd", sqrt(
          (col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
            / col("nd").cast("double")) / col("nd").cast("double")))
        // sd = 0 (≥5 identical daily totals): z undefined → NULL, and
        // the |z| filter drops the row in both engines (latent q215-class
        // guard, swept r9)
        .withColumn("z", when(col("sd") > 0.0,
          (col("cents").cast("double") - col("mu")) / col("sd")))
        .filter(abs(col("z")) >= 2.0)
        .select(col("user_id"), col("day"), col("nd").as("n_days"),
          (col("cents").cast("double") / 100.0).as("spend"),
          round(col("z"), 4).as("z"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      stats AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(cents) AS BIGINT) AS sx,
               CAST(sum(cents * cents) AS BIGINT) AS sxx
        FROM daily GROUP BY 1
        HAVING count(*) >= 5),
      z AS (
        SELECT d.user_id, d.day, s.nd,
               CAST(d.cents AS DOUBLE) AS c,
               (CAST(d.cents AS DOUBLE)
                - CAST(s.sx AS DOUBLE) / CAST(s.nd AS DOUBLE))
               / sqrt((CAST(s.sxx AS DOUBLE)
                       - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)
                         / CAST(s.nd AS DOUBLE)) / CAST(s.nd AS DOUBLE))
                 AS zv
        FROM daily d JOIN stats s USING (user_id))
      SELECT user_id, day, nd AS n_days, c / 100.0 AS spend,
             round(zv, 4) AS z
      FROM z
      WHERE abs(zv) >= 2.0
      ORDER BY user_id, day"""))

  // --------------------------------------------------------------- q169
  // Rolling 7-day distinct users via HLL register MERGE — the reason
  // sketches exist at 100 TB: per-day registers are computed ONCE from
  // the corpus (one scan, 256 registers/day), and any trailing window's
  // distinct estimate is a register-wise max over the already-tiny
  // per-day tables — re-scanning the corpus per window (what the exact
  // rolling count below does, kept here as the accuracy reference and
  // droppable at scale) is exactly what the merge avoids. Unlike q38
  // (which trusts Spark's approx_count_distinct and oracle-checks only
  // a tolerance flag), the registers here are HAND-ROLLED from the
  // house md5-derived 60-bit hash: bucket = h % 256, rho = leading
  // zeros of the remaining 52 bits + 1 via the bin()-length idiom —
  // every register is bit-identical cross-engine, so the ESTIMATE
  // itself hash-matches. Σ 2^-reg is kept exact as Σ 2^(52-reg) in
  // BIGINT. Raw HLL estimate only — the standard small-range linear-
  // counting correction needs ln(), and libm is not a cross-engine
  // contract (q133/q158); the accuracy cost at low counts is visible in
  // the err_pct column by design.
  private val hllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0

  private val q169 = QueryDef(
    "q169_rolling_hll_users",
    (s, d) => {
      val base = ev(s, d).select(
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        col("user_id"))
      val h = base.withColumn("hv", expr(
        """CAST(conv(substr(md5(concat('hll', CAST(user_id AS STRING))),
           1, 15), 16, 10) AS BIGINT)"""))
        .withColumn("bucket", col("hv") % 256)
        .withColumn("rest", expr("hv DIV 256"))
        // rest = 0 (P ≈ 2^-52) capped at 52 so 52-reg is never a negative
        // shift — Java and DuckDB disagree on negative shift semantics
        .withColumn("rho", when(col("rest") === 0, lit(52L))
          .otherwise(lit(53L) - length(expr("bin(rest)")).cast("long")))
      val regs = h.groupBy(col("day"), col("bucket"))
        .agg(max(col("rho")).as("reg"))
      val days = base.select(col("day")).distinct()
      val grid = days
        .select(col("day"), explode(expr("sequence(0L, 255L)")).as("bucket"))
        .join(regs, Seq("day", "bucket"), "left")
        .withColumn("reg", coalesce(col("reg"), lit(0L)))
      val wRoll = Window.partitionBy(col("bucket")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      val est = grid
        .withColumn("mreg", max(col("reg")).over(wRoll))
        .groupBy(col("day"))
        .agg(sum(expr("shiftleft(1L, CAST(52 - mreg AS INT))")).as("s52"))
        .withColumn("hll_d", round(lit(hllAlphaM2) /
          (col("s52").cast("double") / lit(4503599627370496.0)), 4))
      val du = base.distinct()
      val exact = du.join(days.select(col("day").as("wd")),
          col("day").between(col("wd") - 6, col("wd")))
        .groupBy(col("wd")).agg(countDistinct(col("user_id")).as("exact_d"))
        .select(col("wd").as("day"), col("exact_d"))
      est.join(exact, "day")
        .select(col("day"), col("exact_d"), col("hll_d"),
          round(abs(col("hll_d") - col("exact_d").cast("double")) /
            col("exact_d").cast("double") * 100.0, 2).as("err_pct"))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH base AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               user_id
        FROM events),
      h AS (
        SELECT day,
               ('0x' || substr(md5('hll' || CAST(user_id AS VARCHAR)), 1, 15))
                 ::BIGINT AS hv
        FROM base),
      rr AS (
        SELECT day, hv % 256 AS bucket, hv // 256 AS rest FROM h),
      rho AS (
        SELECT day, bucket,
               CASE WHEN rest = 0 THEN 52
                    ELSE 53 - CAST(length(bin(rest)) AS BIGINT) END AS rho
        FROM rr),
      regs AS (
        SELECT day, bucket, max(rho) AS reg FROM rho GROUP BY 1, 2),
      days AS (SELECT DISTINCT day FROM base),
      grid AS (
        SELECT d.day, b.bucket, coalesce(r.reg, 0) AS reg
        FROM days d
        CROSS JOIN range(256) AS b(bucket)
        LEFT JOIN regs r ON r.day = d.day AND r.bucket = b.bucket),
      merged AS (
        SELECT day, bucket,
               max(reg) OVER (PARTITION BY bucket ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS mreg
        FROM grid),
      est AS (
        SELECT day,
               CAST(sum(1::BIGINT << CAST(52 - mreg AS INT)) AS BIGINT)
                 AS s52
        FROM merged GROUP BY day),
      du AS (SELECT DISTINCT day, user_id FROM base),
      exact AS (
        SELECT d.day AS day, count(DISTINCT u.user_id) AS exact_d
        FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1)
      SELECT e.day, CAST(x.exact_d AS BIGINT) AS exact_d,
             round($hllAlphaM2 /
                   (CAST(e.s52 AS DOUBLE) / 4503599627370496.0), 4) AS hll_d,
             round(abs(round($hllAlphaM2 /
                     (CAST(e.s52 AS DOUBLE) / 4503599627370496.0), 4)
                   - CAST(x.exact_d AS DOUBLE))
                   / CAST(x.exact_d AS DOUBLE) * 100.0, 2) AS err_pct
      FROM est e JOIN exact x ON e.day = x.day
      ORDER BY e.day"""))

  // --------------------------------------------------------------- q183
  // k-hop BFS frontier expansion over the customer↔part co-purchase
  // graph — the reachability member of the iterative-graph family
  // (components q35/q99, PageRank q140, k-core q146): which parts are
  // within 3 hops of a seed customer set, with hop = first-visit
  // distance. The frontier alternates sides on the bipartite graph, so
  // each round is ONE join keyed on the frontier's side plus an
  // anti-join against the visited set of that side — the frontier is the
  // small side and shrinks relative to the corpus as saturation sets in.
  // Bounded rounds (K=3, a declared contract like q146's) and a
  // localCheckpoint per round keep the plan O(1) in K — the q35 lesson.
  // First-visit ≡ min-hop because the anti-join never readmits a node;
  // the DuckDB oracle proves it against an UNBOUNDED recursive CTE
  // collapsed by min(hop). Output is per-(hop, side) frontier size +
  // id-range + checksum, so a single wrong node fails the hash.
  private val q183 = QueryDef(
    "q183_khop_frontier",
    (s, d) => {
      val e = Tables.t(s, d, "orders")
        .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint()
      var visited = Tables.t(s, d, "customer")
        .filter(col("c_custkey") < 10)
        .select(col("c_custkey").as("node"), lit("c").as("side"),
          lit(0).as("hop"))
        .localCheckpoint()
      var frontier = visited
      for (k <- 1 to 3) {
        val side = if (k % 2 == 1) "p" else "c"
        val stepped =
          if (k % 2 == 1)
            frontier.join(e, col("node") === col("c"))
              .select(col("p").as("node"))
          else
            frontier.join(e, col("node") === col("p"))
              .select(col("c").as("node"))
        frontier = stepped.distinct()
          .join(visited.filter(col("side") === side).select(col("node")),
            Seq("node"), "left_anti")
          .select(col("node"), lit(side).as("side"), lit(k).as("hop"))
          .localCheckpoint()
        visited = visited.union(frontier).localCheckpoint()
      }
      visited.groupBy(col("hop"), col("side"))
        .agg(count(lit(1)).as("n_nodes"),
          min(col("node")).as("node_min"), max(col("node")).as("node_max"),
          sum(col("node")).as("checksum"))
        .orderBy(col("hop"))
    },
    Some("""
      WITH RECURSIVE e AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      r AS (
        SELECT c_custkey AS node, 'c' AS side, 0 AS hop
        FROM customer WHERE c_custkey < 10
        UNION
        SELECT CASE WHEN r.side = 'c' THEN e.p ELSE e.c END,
               CASE WHEN r.side = 'c' THEN 'p' ELSE 'c' END,
               r.hop + 1
        FROM r JOIN e ON (r.side = 'c' AND e.c = r.node)
                      OR (r.side = 'p' AND e.p = r.node)
        WHERE r.hop < 3),
      mh AS (SELECT node, side, min(hop) AS hop FROM r GROUP BY 1, 2)
      SELECT hop, side, count(*) AS n_nodes,
             min(node) AS node_min, max(node) AS node_max,
             CAST(sum(node) AS BIGINT) AS checksum
      FROM mh
      GROUP BY 1, 2
      ORDER BY hop"""))

  // --------------------------------------------------------------- q184
  // K-fold cross-validation from ONE scan — the mergeable-moments trick
  // applied to model selection: per-fold OLS sufficient statistics
  // (n, Σx, Σy, Σx², Σxy as exact BIGINTs) are computed once, the
  // grand totals derive from the 5-row fold table, and each fold's
  // TRAINING moments are global − own (subtraction of exact integers) —
  // so K models cost one corpus pass + a 5-row solve, not K passes.
  // The closed-form solve and the per-row residual use only IEEE
  // +,−,×,/,√ on operands that are exact BIGINT→double conversions
  // (every sum < 2^53 or combined in double identically on both
  // engines), and squared residuals round to integer dollars² before
  // the final sum — order-independent, bit-identical cross-engine
  // (q144/q149's discipline). Eval joins its fold's 2 coefficients back
  // by broadcast; fold assignment is deterministic arithmetic (the
  // content-hash form of q47 is the reingest-stable production choice).
  private val q184 = QueryDef(
    "q184_kfold_cv",
    (s, d) => {
      val rows = li(s, d).select(
        ((col("l_orderkey") * 31 + col("l_linenumber")) % 5).as("fold"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("yc"))
      val folds = rows.groupBy(col("fold")).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("yc")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("yc")).as("sxy"))
      val tot = folds.agg(
        sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
        sum(col("sy")).as("tsy"), sum(col("sxx")).as("tsxx"),
        sum(col("sxy")).as("tsxy"))
      val params = folds.crossJoin(broadcast(tot))
        .select(col("fold"),
          (col("tn") - col("n")).cast("double").as("n_tr"),
          (col("tsx") - col("sx")).cast("double").as("sx_tr"),
          (col("tsy") - col("sy")).cast("double").as("sy_tr"),
          (col("tsxx") - col("sxx")).cast("double").as("sxx_tr"),
          (col("tsxy") - col("sxy")).cast("double").as("sxy_tr"))
        .select(col("fold"),
          // singular training fold (zero x-variance or empty): the OLS fit
          // is undefined → NULL, as DuckDB's /0 yields; the doubles are
          // exact integers < 2^53 so the guard compare is exact
          when(col("n_tr") * col("sxx_tr") - col("sx_tr") * col("sx_tr")
              > 0.0,
            (col("n_tr") * col("sxy_tr") - col("sx_tr") * col("sy_tr")) /
              (col("n_tr") * col("sxx_tr") - col("sx_tr") * col("sx_tr")))
            .as("b"),
          col("n_tr"), col("sx_tr"), col("sy_tr"))
        .select(col("fold"), col("b"),
          when(col("n_tr") > 0.0,
            (col("sy_tr") - col("b") * col("sx_tr")) / col("n_tr")).as("a"))
      rows.join(broadcast(params), Seq("fold"))
        .select(col("fold"),
          ((col("yc").cast("double") - col("a") - col("b") * col("x").cast("double")) / lit(100.0)).as("r"),
          col("a"), col("b"))
        .groupBy(col("fold"), col("a"), col("b"))
        .agg(count(lit(1)).as("n_eval"),
          sum(round(col("r") * col("r")).cast("long")).as("ssr"))
        .select(col("fold"), col("n_eval"),
          Num.roundZ(col("b"), 6).as("slope_cents"),
          Num.roundZ(col("a") / lit(100.0), 6).as("intercept_usd"),
          round(sqrt(col("ssr").cast("double") / col("n_eval").cast("double")), 6)
            .as("rmse_usd"))
        .orderBy(col("fold"))
    },
    Some("""
      WITH rows0 AS (
        SELECT (l_orderkey * 31 + l_linenumber) % 5 AS fold,
               CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
        FROM lineitem),
      folds AS (
        SELECT fold, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * yc) AS BIGINT) AS sxy
        FROM rows0 GROUP BY fold),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(sx) AS BIGINT) AS tsx,
               CAST(sum(sy) AS BIGINT) AS tsy,
               CAST(sum(sxx) AS BIGINT) AS tsxx,
               CAST(sum(sxy) AS BIGINT) AS tsxy
        FROM folds),
      params AS (
        SELECT fold,
               (CAST(tn - n AS DOUBLE) * CAST(tsxy - sxy AS DOUBLE)
                - CAST(tsx - sx AS DOUBLE) * CAST(tsy - sy AS DOUBLE))
               / (CAST(tn - n AS DOUBLE) * CAST(tsxx - sxx AS DOUBLE)
                  - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE))
                 AS b,
               CAST(tn - n AS DOUBLE) AS n_tr,
               CAST(tsx - sx AS DOUBLE) AS sx_tr,
               CAST(tsy - sy AS DOUBLE) AS sy_tr
        FROM folds, tot),
      params2 AS (
        SELECT fold, b, (sy_tr - b * sx_tr) / n_tr AS a FROM params),
      ev2 AS (
        SELECT r.fold, p.a, p.b,
               (CAST(r.yc AS DOUBLE) - p.a - p.b * CAST(r.x AS DOUBLE))
                 / 100.0 AS res
        FROM rows0 r JOIN params2 p ON r.fold = p.fold),
      agg AS (
        SELECT fold, a, b, count(*) AS n_eval,
               CAST(sum(CAST(round(res * res) AS BIGINT)) AS BIGINT) AS ssr
        FROM ev2 GROUP BY 1, 2, 3)
      SELECT fold, n_eval,
             (CAST(round((b) * 1e6) AS BIGINT) / 1e6) AS slope_cents,
             (CAST(round((a / 100.0) * 1e6) AS BIGINT) / 1e6) AS intercept_usd,
             round(sqrt(CAST(ssr AS DOUBLE) / CAST(n_eval AS DOUBLE)), 6)
               AS rmse_usd
      FROM agg
      ORDER BY fold"""))

  // --------------------------------------------------------------- q187
  // Two-sample Kolmogorov–Smirnov drift statistic — the distribution-
  // shift monitor between two slices (arms by user_id parity here; in
  // production: this week vs last week, source A vs source B). KS needs
  // a supremum over the merged CDF — naively a corpus-sized sort. The
  // shipped form is q168's bounded-grid two-phase: ONE conditional
  // aggregate collapses events to per-cents-bucket counts (grid ≤ the
  // VALUE RANGE — 56k cells max here — never corpus-sized), the
  // cumulative window runs over that grid, and the sup is
  // max |cum_a·n_b − cum_b·n_a| in exact BIGINTs (≤ 1e5·1e5 ≪ 2^63),
  // divided once at the end — order-independent, bit-identical
  // cross-engine, no libm (unlike PSI/KL, which need log and are
  // deliberately not the house drift metric).
  private val q187 = QueryDef(
    "q187_ks_drift",
    (s, d) => {
      val e = ev(s, d).select((col("user_id") % 2).as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      val grid = e.groupBy(col("c")).agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("da"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("db"))
      val tot = grid.agg(sum(col("da")).as("na"), sum(col("db")).as("nb"))
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("ca", sum(col("da")).over(w))
        .withColumn("cb", sum(col("db")).over(w))
        .crossJoin(broadcast(tot))
        .select(abs(col("ca") * col("nb") - col("cb") * col("na"))
          .as("diff"), col("na"), col("nb"))
        .groupBy(col("na"), col("nb"))
        .agg(max(col("diff")).as("mx"))
        .select(col("na"), col("nb"),
          round(col("mx").cast("double") /
            (col("na") * col("nb")).cast("double"), 6).as("ks"))
    },
    Some("""
      WITH e AS (
        SELECT user_id % 2 AS arm, CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      grid AS (
        SELECT c,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS da,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS db
        FROM e GROUP BY c),
      cum AS (
        SELECT c,
               CAST(sum(da) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS ca,
               CAST(sum(db) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cb
        FROM grid),
      tot AS (
        SELECT CAST(sum(da) AS BIGINT) AS na, CAST(sum(db) AS BIGINT) AS nb
        FROM grid)
      SELECT na, nb,
             round(CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
                   / CAST(na * nb AS DOUBLE), 6) AS ks
      FROM cum, tot
      GROUP BY na, nb"""))

  // --------------------------------------------------------------- q188
  // Item-item collaborative filtering — "customers who bought X also
  // bought Y" as co-occurrence cosine: sim(a,b) = n_ab / √(n_a·n_b)
  // over order baskets. Pair generation is WITHIN-basket (a < b), so the
  // pair space is Σ C(basket,2) — bounded by basket size, never
  // items² — and the degree table is a broadcastable |items|-row
  // dictionary joined back twice. Top-3 per anchor item runs as a rank
  // window over the anchor's candidate list (pairs per item are bounded
  // by co-purchase fan-out); the anchor filter (partkey < 50) keeps the
  // output presentation-sized. √ of an exact BIGINT product is one
  // correctly-rounded IEEE op, so the scores and the ranking are
  // bit-identical cross-engine (ties broken by item id).
  private val q188 = QueryDef(
    "q188_item_item_cf",
    (s, d) => {
      val bask = li(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val deg = bask.groupBy(col("item")).agg(count(lit(1)).as("n"))
      val pairs = bask.as("x")
        .join(bask.as("y"), col("x.ok") === col("y.ok") &&
          col("x.item") < col("y.item"))
        .groupBy(col("x.item").as("a"), col("y.item").as("b"))
        .agg(count(lit(1)).as("nab"))
      val sym = pairs.select(col("a"), col("b"), col("nab"))
        .union(pairs.select(col("b").as("a"), col("a").as("b"), col("nab")))
      val scored = sym.filter(col("a") < 50)
        .join(deg.select(col("item").as("a"), col("n").as("na")), Seq("a"))
        .join(deg.select(col("item").as("b"), col("n").as("nb")), Seq("b"))
        .select(col("a"), col("b"), col("nab"),
          (col("nab").cast("double") /
            sqrt((col("na") * col("nb")).cast("double"))).as("cos"))
      val wr = Window.partitionBy(col("a"))
        .orderBy(col("cos").desc, col("b"))
      scored.withColumn("rk", row_number().over(wr))
        .filter(col("rk") <= 3)
        .select(col("a"), col("rk"), col("b"), col("nab"),
          round(col("cos"), 6).as("cosine"))
        .orderBy(col("a"), col("rk"))
    },
    Some("""
      WITH bask AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
      deg AS (SELECT item, count(*) AS n FROM bask GROUP BY item),
      pairs AS (
        SELECT x.item AS a, y.item AS b, count(*) AS nab
        FROM bask x JOIN bask y ON x.ok = y.ok AND x.item < y.item
        GROUP BY 1, 2),
      sym AS (
        SELECT a, b, nab FROM pairs
        UNION ALL SELECT b, a, nab FROM pairs),
      scored AS (
        SELECT s.a, s.b, s.nab,
               CAST(s.nab AS DOUBLE)
                 / sqrt(CAST(da.n * db.n AS DOUBLE)) AS cos
        FROM sym s
        JOIN deg da ON s.a = da.item
        JOIN deg db ON s.b = db.item
        WHERE s.a < 50),
      ranked AS (
        SELECT a, b, nab, cos,
               row_number() OVER (PARTITION BY a ORDER BY cos DESC, b) AS rk
        FROM scored)
      SELECT a, rk, b, nab, round(cos, 6) AS cosine
      FROM ranked
      WHERE rk <= 3
      ORDER BY a, rk"""))

  // ---------------------------------------------------------------- q196
  // Time-grid resampling with forward-fill — the sparse→dense conversion
  // every time-series consumer (charting, feature windows, model input
  // tensors) runs over an event stream: build the full hourly grid per
  // key, mark the empty slots, and carry the last observed value forward.
  // A sparse user slice (user_id % 13 = 5) makes real gaps at every SF.
  // Scale shape: the ONLY corpus-scale stage is the (key, hour) hash
  // aggregate over raw events — canonical partial+final, map-side
  // combined. Everything after runs on the GRID, whose size is
  // |keys| × |hours| (time span × key cardinality — independent of event
  // volume): the per-key min/max bounds are a dimension-sized aggregate,
  // `sequence()` explodes the grid from 5 bound rows, the left join
  // hangs the sparse aggregates on it, and the forward-fill window
  // partitions by key over grid rows only — its per-task work is bounded
  // by the time span, never by the corpus. (A formulation that
  // forward-filled over raw events before aggregating would drag the
  // full stream through the window sort — the shape this query exists
  // to avoid.)
  private val q196 = QueryDef(
    "q196_resample_ffill",
    (s, d) => {
      val sparse = ev(s, d).filter(col("user_id") % 13 === 5)
        .select(col("event_type"),
          date_trunc("HOUR", col("ts")).as("hr"), col("value"))
      val hourly = sparse.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n_events"),
          sumFixed(col("value"), 2).as("hour_value"))
      val grid = sparse.groupBy(col("event_type"))
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "hr"), "left")
        .withColumn("is_gap", col("n_events").isNull)
        .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
        .withColumn("filled_value",
          last(col("hour_value"), ignoreNulls = true).over(w))
        .select(col("event_type"), col("hr"), col("n_events"),
          col("hour_value"), col("filled_value"), col("is_gap"))
        .orderBy(col("event_type"), col("hr"))
    },
    Some(s"""
      WITH sparse AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, value
        FROM events WHERE user_id % 13 = 5),
      hourly AS (
        SELECT event_type, hr,
               CAST(count(*) AS BIGINT) AS n_events,
               ${sumFixedSql("value", 2)} AS hour_value
        FROM sparse GROUP BY 1, 2),
      bounds AS (
        SELECT event_type, min(hr) AS lo, max(hr) AS hi
        FROM sparse GROUP BY 1),
      grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM bounds)
      SELECT g.event_type, g.hr,
             COALESCE(h.n_events, 0) AS n_events,
             h.hour_value,
             last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value,
             h.n_events IS NULL AS is_gap
      FROM grid g
      LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hr = g.hr
      ORDER BY g.event_type, g.hr"""))

  // ---------------------------------------------------------------- q209
  // Batch `session_window` — the built-in session operator (the one q82
  // uses in streaming) run over the batch corpus, closing the
  // sessionization matrix: q52 hand-builds gap sessions with lag/running
  // sum, q82 streams them, q197 reimplements them on arbitrary state;
  // this is the declarative batch form. Semantics: each event opens
  // [ts, ts+30min) and overlapping windows merge — identical session
  // membership to q52's gap>30min break rule; session END is
  // last_event + gap by definition, which the oracle mirrors as
  // max(ts) + INTERVAL 30 MINUTE over the same islands. Physical note:
  // a session aggregate cannot pre-merge map-side (session identity
  // isn't known until a key's events are sorted together), so the plan
  // is one user-keyed exchange + per-partition (user, ts) sort —
  // exactly q52's single-exchange shape with the sort moved inside the
  // aggregate. Output is capped at 40 sessions (deterministic
  // (user, start) order) so presentation stays scale-free.
  private val q209 = QueryDef(
    "q209_batch_session_window",
    (s, d) =>
      ev(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sumFixed(col("value"), 2).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("sess_start"))
        .limit(40),
    Some(s"""
      SELECT user_id, min(ts) AS sess_start,
             max(ts) + INTERVAL 30 MINUTE AS sess_end,
             count(*) AS n_events,
             ${sumFixedSql("value", 2)} AS sum_value
      FROM (
        SELECT user_id, ts, value,
               sum(CASE WHEN prev_us IS NULL
                          OR us - prev_us > 1800 * 1000000 THEN 1
                        ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess
        FROM (
          SELECT user_id, event_id, value, ts, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts), event_id)
                   AS prev_us
          FROM events))
      GROUP BY user_id, sess
      ORDER BY user_id, sess_start
      LIMIT 40"""))

  // --------------------------------------------------------------- q214
  // Kaplan–Meier survival over user lifetimes ([EXT] — churn/survival
  // analysis, a standard product-analytics operator the board lacked).
  // Observation model: a user "churns" (event observed) when their last
  // event is >24 HOURS before the corpus horizon (the events table spans
  // ~30 days with a median inter-event gap of hours, so hour granularity
  // is where the hazard lives; p90 of last-event→horizon gaps is ~24 h);
  // otherwise they are right-censored at the horizon. t = hours from
  // first event to last (churned) or to horizon (censored). KM
  // product-limit:
  // S(t) = Π_{death times t_j ≤ t} (n_j − d_j)/n_j with risk set
  // n_j = #{t_i ≥ t_j} (censored-at-t still at risk — standard tie rule).
  //
  // Determinism: the product is computed as exp(Σ ln-factors) where each
  // per-row ln((n−d)/n) — ln of an IDENTICAL double in both engines since
  // (n−d)/n is a correctly-rounded quotient of exact BIGINTs — is
  // quantized to a BIGINT at 1e-10 before the cumulative sum. Summing
  // integers is exact in ANY order, so DuckDB's segment-tree window sum
  // and Spark's sequential running sum agree bit-for-bit; only then does
  // one exp() + round(6) produce the double output. The d == n_risk
  // corner (everyone remaining dies) would be ln(0) = −∞; a cumulative
  // max flag pins S = 0 from that point on instead.
  //
  // Scale: the corpus-sized work is ONE user-keyed aggregate (first/last
  // event per user — map-side partials apply). Everything after operates
  // on the (t → counts) table, bounded by the CALENDAR (distinct
  // lifetime-hour values ≤ horizon span in hours, ~720 here), not the
  // corpus, so the unpartitioned windows downstream are O(few hundred
  // rows) at any SF — the same boundedness argument as q169's register
  // grid.
  private val q214 = QueryDef(
    "q214_survival_km",
    (s, d) => {
      val hr = expr("unix_micros(ts) DIV 3600000000")
      val pu = ev(s, d).groupBy(col("user_id"))
        .agg(min(hr).as("fd"), max(hr).as("ld"))
      val hz = ev(s, d).agg(max(hr).as("hz"))
      val obs = pu.crossJoin(broadcast(hz))
        .withColumn("died",
          when(col("hz") - col("ld") > 24L, 1L).otherwise(0L))
        .withColumn("t",
          when(col("died") === 1L, col("ld") - col("fd"))
            .otherwise(col("hz") - col("fd")).cast("long"))
      val byT = obs.groupBy(col("t"))
        .agg(sum(col("died")).as("d"),
          (count(lit(1)) - sum(col("died"))).as("cens"),
          count(lit(1)).as("cnt"))
      val wRisk = Window.orderBy(col("t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT
        .withColumn("n_risk", sum(col("cnt")).over(wRisk))
        .withColumn("zf", max(when(col("d") >= col("n_risk"), 1L)
          .otherwise(0L)).over(wCum))
        .withColumn("li",
          when(col("d") < col("n_risk"),
            round(log((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")) * lit(1e10)).cast("long"))
            .otherwise(lit(0L)))
        .withColumn("km",
          when(col("zf") === 1L, lit(0.0))
            .otherwise(round(exp(sum(col("li")).over(wCum).cast("double") /
              lit(1e10)), 6)))
        .select(col("t"), col("n_risk"), col("d"), col("cens"), col("km"))
        .orderBy(col("t"))
    },
    Some("""
      WITH pu AS (
        SELECT user_id, min(epoch_us(ts) // 3600000000) AS fd,
               max(epoch_us(ts) // 3600000000) AS ld
        FROM events GROUP BY user_id),
      hz AS (SELECT max(epoch_us(ts) // 3600000000) AS hz FROM events),
      obs AS (
        SELECT CASE WHEN hz - ld > 24 THEN 1 ELSE 0 END AS died,
               CAST(CASE WHEN hz - ld > 24 THEN ld - fd
                         ELSE hz - fd END AS BIGINT) AS t
        FROM pu, hz),
      byt AS (
        SELECT t, CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) - sum(died) AS BIGINT) AS cens,
               count(*) AS cnt
        FROM obs GROUP BY t),
      r AS (
        SELECT t, d, cens,
               CAST(sum(cnt) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        FROM byt),
      f AS (
        SELECT *,
               max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                 OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zf,
               CASE WHEN d < n_risk
                    THEN CAST(round(ln(CAST(n_risk - d AS DOUBLE) /
                           CAST(n_risk AS DOUBLE)) * 1e10) AS BIGINT)
                    ELSE 0 END AS li
        FROM r)
      SELECT t, n_risk, d, cens,
             CASE WHEN zf = 1 THEN 0.0
                  ELSE round(exp(CAST(sum(li) OVER (ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1e10), 6)
             END AS km
      FROM f
      ORDER BY t"""))

  // --------------------------------------------------------------- q215
  // Interval-union coverage (sweep-line) ([EXT]): each event opens a
  // half-open interval [ts, ts + 0.6s·cents(value)); per user, report
  // the UNION length of those overlapping intervals, the count of merged
  // disjoint blocks, and utilization vs the first→last span. The classic
  // formulation needs a sweep; declaratively it is one ordered window per
  // user: eff_start = max(start, running-max of prior ends), contribution
  // = max(0, end − eff_start) — summing contributions gives exactly the
  // union measure, and start > prior-max-end marks a new disjoint block.
  //
  // Determinism: everything is exact BIGINT µs (duration derives from the
  // 2-decimal `value` via its exact cent integer ×600000 µs); the only
  // double is the final utilization, a correctly-rounded quotient of two
  // exact integers. Scale: ONE exchange on user_id serves both the
  // running-max window and the per-user aggregate (Catalyst keeps the
  // hash partitioning — q52's single-exchange shape); per-partition work
  // is a linear scan after sort. No corpus-sized single-partition stage.
  private val q215 = QueryDef(
    "q215_interval_union",
    (s, d) => {
      val iv = ev(s, d).select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          greatest(round(col("value") * 100).cast("long"), lit(0L)) *
            lit(600000L)).as("en"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("st"), col("event_id"))
      iv
        .withColumn("pm",
          max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("contrib",
          greatest(lit(0L),
            col("en") - greatest(col("st"), coalesce(col("pm"), col("st")))))
        .withColumn("nb",
          when(col("pm").isNull || col("st") > col("pm"), 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_iv"),
          sum(col("nb")).as("blocks"),
          sum(col("contrib")).as("covered_us"),
          (max(col("en")) - min(col("st"))).as("span_us"))
        // zero-span guard (ADVICE r7): a user whose events are all
        // zero-length intervals at one timestamp has span_us = 0, where
        // Spark 4's ANSI mode THROWS DIVIDE_BY_ZERO even for doubles
        // (measured r8 on q330 — not NaN as previously assumed) while
        // DuckDB yields NULL — guard symmetrically (when(>0) here,
        // NULLIF in the oracle) so both emit NULL.
        .withColumn("util",
          when(col("span_us") > 0L,
            round(col("covered_us").cast("double") /
              col("span_us").cast("double"), 6)))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS st,
               epoch_us(ts) + greatest(CAST(round(value * 100) AS BIGINT), 0)
                 * 600000 AS en
        FROM events),
      sw AS (
        SELECT user_id, st, en,
               max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS pm
        FROM iv),
      c AS (
        SELECT user_id, st, en,
               greatest(0, en - greatest(st, coalesce(pm, st))) AS contrib,
               CASE WHEN pm IS NULL OR st > pm THEN 1 ELSE 0 END AS nb
        FROM sw)
      SELECT user_id, count(*) AS n_iv, CAST(sum(nb) AS BIGINT) AS blocks,
             CAST(sum(contrib) AS BIGINT) AS covered_us,
             CAST(max(en) - min(st) AS BIGINT) AS span_us,
             round(CAST(sum(contrib) AS DOUBLE) /
                   NULLIF(CAST(max(en) - min(st) AS DOUBLE), 0), 6) AS util
      FROM c
      GROUP BY user_id
      ORDER BY user_id"""))

  // --------------------------------------------------------------- q219
  // Benford first-digit audit ([EXT] data-quality): per order priority,
  // compare the first-significant-digit distribution of o_totalprice
  // against Benford's law and report a χ²-style distance — the standard
  // screen for fabricated/synthetic monetary columns (complements q212's
  // constraint suite, which checks declared invariants, with a
  // DISTRIBUTIONAL audit nothing has to declare).
  //
  // First digit comes from the exact cent integer's decimal string (same
  // leading digit as the price). Determinism: expected shares
  // log10(1+1/d) and each group's χ² term are doubles, but every term is
  // quantized to a BIGINT at 1e-12 BEFORE the 9-term sum, so Spark's
  // arrival-order hash-agg and DuckDB's order agree exactly (same
  // integer-quantization discipline as q214/q169). Scale: one map-side-
  // combinable (priority, digit) count — 45 cells total — then
  // dictionary-sized arithmetic; nothing downstream scales with rows.
  private val q219 = QueryDef(
    "q219_benford_digits",
    (s, d) => {
      val ord = Tables.t(s, d, "orders")
      val dig = ord.select(col("o_orderpriority").as("prio"),
        substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("dg"))
        .groupBy(col("prio"), col("dg")).agg(count(lit(1)).as("c"))
      val n = dig.groupBy(col("prio")).agg(sum(col("c")).as("n"))
      dig.join(n, "prio")
        .withColumn("e", round(log(10.0,
          lit(1.0) + lit(1.0) / col("dg").cast("double")), 10))
        .withColumn("term",
          round((((col("c").cast("double") / col("n").cast("double")) -
            col("e")) * ((col("c").cast("double") / col("n").cast("double")) -
            col("e")) / col("e")) * lit(1e12)).cast("long"))
        .groupBy(col("prio"), col("n"))
        .agg(round(sum(col("term")).cast("double") / lit(1e12), 6)
          .as("chi2"),
          max(when(col("dg") === 1,
            round(col("c").cast("double") / col("n").cast("double"), 6)))
            .as("share_d1"))
        .select(col("prio"), col("n"), col("chi2"), col("share_d1"))
        .orderBy(col("prio"))
    },
    Some("""
      WITH dig AS (
        SELECT o_orderpriority AS prio,
               CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                 AS VARCHAR), 1, 1) AS INT) AS dg,
               count(*) AS c
        FROM orders GROUP BY 1, 2),
      n AS (SELECT prio, CAST(sum(c) AS BIGINT) AS n FROM dig GROUP BY prio),
      t AS (
        SELECT dig.prio, n.n, dig.dg, dig.c,
               round(log10(1.0 + 1.0 / CAST(dg AS DOUBLE)), 10) AS e
        FROM dig JOIN n ON dig.prio = n.prio)
      SELECT prio, n,
             round(CAST(sum(CAST(round(
               ((CAST(c AS DOUBLE) / CAST(n AS DOUBLE) - e) *
                (CAST(c AS DOUBLE) / CAST(n AS DOUBLE) - e) / e) * 1e12)
               AS BIGINT)) AS DOUBLE) / 1e12, 6) AS chi2,
             max(CASE WHEN dg = 1 THEN
               round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) END)
               AS share_d1
      FROM t
      GROUP BY prio, n
      ORDER BY prio"""))

  // --------------------------------------------------------------- q220
  // Mergeable BINARY sketches via the built-in DataSketches HLL surface
  // ([EXT]): per-day `hll_sketch_agg` sketches (lgK=12, the portable
  // Apache DataSketches format — the interop story q169's hand-rolled
  // registers deliberately avoid), then a 7-day ROLLING `hll_union_agg`
  // window over the day-level sketch table. This is the production shape
  // for "rolling distinct" at 100 TB: the corpus is sketched ONCE per
  // day (mergeable, map-side combinable, KBs of state); every window
  // after that unions day-level blobs and never rescans history — the
  // same never-rescan argument as q169, but through Spark's own
  // serialized-sketch type so the blobs could be persisted and unioned
  // by ANY DataSketches-speaking system (Druid, Hive, datasketches-java).
  //
  // Oracle: DataSketches estimates are not reproducible in DuckDB, so
  // the q38 pattern applies — the oracle recomputes the EXACT rolling
  // distinct and pins a TRUE for the 5%-tolerance boolean; an estimate
  // drifting out of band flips the boolean and fails the hash gate.
  // The exact side reuses q169's bounded (day×window) join, fine at any
  // SF because `days` is calendar-sized.
  private val q220 = QueryDef(
    "q220_hll_sketch_union",
    (s, d) => {
      val base = ev(s, d).select(
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        col("user_id"))
      val daily = base.groupBy(col("day"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val wRoll = Window.orderBy(col("day")).rangeBetween(-6, 0)
      val est = daily
        .withColumn("usk", expr("hll_union_agg(sk, false)").over(wRoll))
        .select(col("day"),
          expr("hll_sketch_estimate(usk)").as("est"))
      val du = base.distinct()
      val days = base.select(col("day")).distinct()
      val exact = du.join(days.select(col("day").as("wd")),
          col("day").between(col("wd") - 6, col("wd")))
        .groupBy(col("wd")).agg(countDistinct(col("user_id")).as("exact_u"))
        .select(col("wd").as("day"), col("exact_u"))
      est.join(exact, "day")
        .select(col("day"), col("exact_u"),
          (abs(col("est") - col("exact_u").cast("double")) <=
            col("exact_u").cast("double") * 0.05).as("sketch_within_5pct"))
        .orderBy(col("day"))
    },
    Some("""
      WITH base AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               user_id
        FROM events),
      days AS (SELECT DISTINCT day FROM base),
      du AS (SELECT DISTINCT day, user_id FROM base)
      SELECT d.day AS day,
             CAST(count(DISTINCT u.user_id) AS BIGINT) AS exact_u,
             TRUE AS sketch_within_5pct
      FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
      ORDER BY d.day"""))

  // --------------------------------------------------------------- q221
  // Mann–Kendall trend test + Theil–Sen slope per event_type ([EXT]):
  // the standard nonparametric "is this metric trending?" pair, over the
  // DAILY revenue series. S = Σ_{i<j} sign(v_j − v_i) with the tie-
  // corrected variance Var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5); the
  // continuity-corrected Z = (S ∓ 1)/sqrt(Var18/18) is deterministic
  // because sqrt and division are IEEE-correctly-rounded on exact
  // integer inputs — no transcendental rounding needed anywhere.
  // Theil–Sen is the exact median of all pairwise slopes, computed by
  // rank (row_number with a full tiebreak), averaging the two middle
  // slopes for even counts via one (a+b)/2 — bit-identical cross-engine
  // since every slope is a correctly-rounded quotient of exact cents.
  //
  // Scale: the corpus collapses to (event_type, day) daily aggregates
  // FIRST (map-side combinable); the O(days²) pair join runs on the
  // calendar-bounded daily table (~30×30 per type) — the q102/q169
  // "heavy math only on the bounded domain" discipline.
  private val q221 = QueryDef(
    "q221_trend_mannkendall",
    (s, d) => {
      val daily = ev(s, d).select(col("event_type"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("v"))
      val a = daily.toDF("event_type", "d1", "v1")
      val b = daily.toDF("event_type", "d2", "v2")
      val pairs = a.join(b, Seq("event_type")).filter(col("d2") > col("d1"))
        .withColumn("sgn", signum((col("v2") - col("v1")).cast("double"))
          .cast("long"))
        .withColumn("slope", (col("v2") - col("v1")).cast("double") /
          (col("d2") - col("d1")).cast("double"))
      val sStat = pairs.groupBy(col("event_type"))
        .agg(sum(col("sgn")).as("s_stat"), count(lit(1)).as("n_pairs"))
      val nD = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("event_type"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie18"))
      val wRk = Window.partitionBy(col("event_type"))
        .orderBy(col("slope"), col("d1"), col("d2"))
      val med = pairs.withColumn("rk", row_number().over(wRk))
        .join(sStat.select(col("event_type"), col("n_pairs")), "event_type")
        .filter(col("rk") === expr("(n_pairs + 1) DIV 2") ||
          col("rk") === expr("n_pairs DIV 2 + 1"))
        .groupBy(col("event_type"))
        .agg(Num.roundZ((sum(col("slope")) / count(lit(1))) / lit(100.0), 6)
          .as("sen_slope"))
      sStat.join(nD, "event_type").join(ties, "event_type")
        .withColumn("var18",
          col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5)
            - col("tie18"))
        .withColumn("z", Num.roundZ(when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0)) /
            sqrt(col("var18").cast("double") / lit(18.0)), 6))
        .join(med, "event_type")
        .select(col("event_type"), col("n_days"), col("s_stat"),
          col("var18"), col("z"), col("sen_slope"),
          when(abs(col("z")) > 1.96,
            when(col("s_stat") > 0, "increasing").otherwise("decreasing"))
            .otherwise("no_trend").as("trend"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      pairs AS (
        SELECT a.event_type,
               CAST(sign(b.v - a.v) AS BIGINT) AS sgn,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
                 AS slope,
               a.day AS d1, b.day AS d2
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day > a.day),
      sstat AS (
        SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
               count(*) AS n_pairs
        FROM pairs GROUP BY 1),
      nd AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1),
      ties AS (
        SELECT event_type,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        FROM (SELECT event_type, v, count(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY 1),
      med AS (
        SELECT event_type,
               (CAST(round(((sum(slope) / count(*)) / 100.0) * 1e6) AS BIGINT) / 1e6) AS sen_slope
        FROM (
          SELECT p.event_type, p.slope,
                 row_number() OVER (PARTITION BY p.event_type
                   ORDER BY p.slope, p.d1, p.d2) AS rk,
                 s.n_pairs
          FROM pairs p JOIN sstat s ON p.event_type = s.event_type)
        WHERE rk = (n_pairs + 1) // 2 OR rk = n_pairs // 2 + 1
        GROUP BY event_type)
      SELECT s.event_type, CAST(n.n_days AS BIGINT) AS n_days, s.s_stat,
             CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie18
               AS BIGINT) AS var18,
             (CAST(round((CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                        WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                        ELSE 0.0 END /
                   sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                        - t.tie18 AS DOUBLE) / 18.0)) * 1e6) AS BIGINT) / 1e6) AS z,
             m.sen_slope,
             CASE WHEN abs(CASE WHEN s.s_stat > 0
                                THEN CAST(s.s_stat - 1 AS DOUBLE)
                                WHEN s.s_stat < 0
                                THEN CAST(s.s_stat + 1 AS DOUBLE)
                                ELSE 0.0 END /
                   sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                        - t.tie18 AS DOUBLE) / 18.0)) > 1.96
                  THEN CASE WHEN s.s_stat > 0 THEN 'increasing'
                            ELSE 'decreasing' END
                  ELSE 'no_trend' END AS trend
      FROM sstat s JOIN nd n ON s.event_type = n.event_type
      JOIN ties t ON s.event_type = t.event_type
      JOIN med m ON s.event_type = m.event_type
      ORDER BY s.event_type"""))

  // --------------------------------------------------------------- q222
  // Gini coefficient / Lorenz concentration of customer spend per market
  // segment ([EXT]): the standard inequality metric (how concentrated is
  // revenue across customers?), computed SCALE-SAFELY. The naive form
  // ranks every customer in one per-segment window — a corpus-sized
  // single-task sort. Instead ranks live on the VALUE DOMAIN: group
  // customers by exact spend cents, then over the (segment, cents) table
  // — bounded by the money grid, not the customer count — a cumulative
  // window gives each tied group its rank-sum in closed form:
  // Σ ranks(v) = c·F + c(c+1)/2 (F = customers below v), so
  // Σ i·x_i = Σ_v v·(c·F + c(c+1)/2) exactly, and
  // G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx). Every operand is an exact
  // BIGINT; one final correctly-rounded division. (At true 100 TB the
  // v·c·F products approach 2^63 — the documented escalation is the same
  // arithmetic in DECIMAL(38,0), which Spark and DuckDB both support;
  // the PLAN is unchanged.)
  private val q222 = QueryDef(
    "q222_gini_spend",
    (s, d) => {
      val spend = Tables.t(s, d, "orders")
        .join(Tables.t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val byV = spend.groupBy(col("seg"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("seg")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byV
        .withColumn("f", coalesce(sum(col("c")).over(wCum), lit(0L)))
        .withColumn("ranksum",
          col("c") * col("f") + expr("c * (c + 1) DIV 2"))
        .groupBy(col("seg"))
        .agg(sum(col("c")).as("n"),
          sum(col("cents") * col("c")).as("total_cents"),
          sum(col("cents") * col("ranksum")).as("six"))
        .select(col("seg"), col("n"), col("total_cents"),
          round((lit(2.0) * col("six").cast("double") -
            (col("n") + 1).cast("double") * col("total_cents").cast("double"))
            / (col("n").cast("double") * col("total_cents").cast("double")),
            6).as("gini"))
        .orderBy(col("seg"))
    },
    Some("""
      WITH spend AS (
        SELECT c.c_mktsegment AS seg, c.c_custkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
      byv AS (
        SELECT seg, cents, count(*) AS c FROM spend GROUP BY 1, 2),
      rk AS (
        SELECT seg, cents, c,
               coalesce(sum(c) OVER (PARTITION BY seg ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
        FROM byv)
      SELECT seg, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(cents * c) AS BIGINT) AS total_cents,
             round((2.0 * CAST(sum(cents * (c * f + c * (c + 1) // 2))
                     AS DOUBLE)
                    - CAST(sum(c) + 1 AS DOUBLE) *
                      CAST(sum(cents * c) AS DOUBLE))
                   / (CAST(sum(c) AS DOUBLE) *
                      CAST(sum(cents * c) AS DOUBLE)), 6) AS gini
      FROM rk
      GROUP BY seg
      ORDER BY seg"""))

  // --------------------------------------------------------------- q226
  // CUSUM changepoint detection per event_type ([EXT]): where does the
  // daily-revenue level SHIFT? The classic offline CUSUM statistic
  // C_k = Σ_{i≤k} (v_i − mean) peaks at the changepoint; the argmax of
  // |C_k| splits the series into before/after regimes. Completes the
  // trend-analysis trio: q221 asks IF there is a monotone trend, q166
  // flags outlier DAYS, this locates the level-shift POINT.
  //
  // Determinism: the mean subtraction is kept in the INTEGER domain by
  // scaling — C'_k = Σ_{i≤k} (n·v_i − T) = n·C_k with T = Σv — so the
  // cumulative window sums exact BIGINTs (any order, any engine);
  // doubles appear only in the final unscaled outputs. Argmax is a
  // row_number with a full (|C| desc, day asc) tiebreak. Scale: the
  // corpus collapses to calendar-bounded (type, day) aggregates first;
  // every window below runs on that bounded table.
  private val q226 = QueryDef(
    "q226_cusum_changepoint",
    (s, d) => {
      val daily = ev(s, d).select(col("event_type"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("v"))
      val wAll = Window.partitionBy(col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cus = daily
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("t", sum(col("v")).over(wAll))
        .withColumn("cus", sum(col("n") * col("v") - col("t")).over(wCum))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(abs(col("cus")).desc, col("day"))))
      // No round() on the output ratios: each is ONE correctly-rounded
      // IEEE division of exact integers, bit-identical cross-engine
      // (the Num.sumFixed pattern). Rounding would REINTRODUCE
      // nondeterminism here — with day-count denominators the true
      // quotient lands on exact decimal midpoints, where Spark's
      // BigDecimal(shortest-repr) rounding and DuckDB's scaled-multiply
      // rounding disagree (observed live: 3031.93875 → .9388 vs .9387).
      val cp = cus.filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("cp_day"),
          col("n").as("n_days"),
          (abs(col("cus")).cast("double") /
            (col("n").cast("double") * 100.0)).as("cusum_peak"))
      val regimes = daily.join(cp, "event_type")
        .groupBy(col("event_type"), col("cp_day"), col("n_days"),
          col("cusum_peak"))
        .agg(
          (sum(when(col("day") <= col("cp_day"), col("v"))).cast("double")
            / (sum(when(col("day") <= col("cp_day"), 1L)).cast("double") *
              100.0)).as("mean_before"),
          (sum(when(col("day") > col("cp_day"), col("v"))).cast("double")
            / (sum(when(col("day") > col("cp_day"), 1L)).cast("double") *
              100.0)).as("mean_after"))
      regimes.orderBy(col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      tot AS (
        SELECT event_type, day, v,
               count(*) OVER (PARTITION BY event_type) AS n,
               sum(v) OVER (PARTITION BY event_type) AS t
        FROM daily),
      cus AS (
        SELECT event_type, day, v, n, t,
               sum(n * v - t) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS UNBOUNDED PRECEDING) AS cus
        FROM tot),
      cp AS (
        SELECT event_type, day AS cp_day, CAST(n AS BIGINT) AS n_days,
               CAST(abs(cus) AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)
                 AS cusum_peak
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY abs(cus) DESC, day) AS rk FROM cus)
        WHERE rk = 1)
      SELECT d.event_type, cp.cp_day, cp.n_days, cp.cusum_peak,
             CAST(sum(CASE WHEN d.day <= cp.cp_day THEN d.v END)
                   AS DOUBLE)
                 / (CAST(sum(CASE WHEN d.day <= cp.cp_day THEN 1 END)
                     AS DOUBLE) * 100.0) AS mean_before,
             CAST(sum(CASE WHEN d.day > cp.cp_day THEN d.v END)
                   AS DOUBLE)
                 / (CAST(sum(CASE WHEN d.day > cp.cp_day THEN 1 END)
                     AS DOUBLE) * 100.0) AS mean_after
      FROM daily d JOIN cp ON d.event_type = cp.event_type
      GROUP BY 1, 2, 3, 4
      ORDER BY d.event_type"""))

  // --------------------------------------------------------------- q232
  // Split conformal prediction intervals ([EXT]): distribution-free
  // coverage for q144's per-type linear model. Splits by event_id
  // parity/quarter: TRAIN (even ids) fits OLS via exact moment sums;
  // CALIBRATION (id ≡ 1 mod 4) yields |residual| scores; q̂ = the
  // k = ceil((n_cal+1)·0.9)-th smallest; TEST (id ≡ 3 mod 4) reports
  // empirical coverage of pred ± q̂ — the finite-sample ≥ 90% guarantee,
  // checked in-query.
  //
  // The quantile is SELECTED, never interpolated, and on an INTEGER
  // domain: predictions quantize to whole cents (round(a+b·x) of
  // identical doubles), so residuals are exact BIGINTs and the k-th
  // smallest comes from a cumulative count over the (type, residual)
  // VALUE-DOMAIN grid — no corpus-sized per-type rank window, the same
  // two-phase trick as q139/q222/q224. (Conformal practice caps
  // calibration at a fixed quota anyway — q136's sampler composes here
  // — but the grid form removes even that need.) Coverage counts are
  // exact integers; the output ratio ships unrounded (q226 lesson).
  private val q232 = QueryDef(
    "q232_conformal_interval",
    (s, d) => {
      val e = ev(s, d).select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val d0 = e.agg(min(col("day")).as("d0"))
      val base = e.crossJoin(broadcast(d0))
        .withColumn("x", col("day") - col("d0"))
      val fit = base.filter(col("event_id") % 2 === 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("cents")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("cents")).as("sxy"))
        // singular fit split (zero x-variance): b, hence every residual,
        // is NULL in both engines (q144's guard; DuckDB /0 → NULL) — the
        // per-type grid then has ONE all-NULL r row, so no NULL-ordering
        // divergence can enter the cumulative window
        .withColumn("b",
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0L,
            (col("n").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double"))))
        .withColumn("a",
          (col("sy").cast("double") - col("b") * col("sx").cast("double")) /
            col("n").cast("double"))
        .select(col("event_type"), col("a"), col("b"))
      val withR = base.join(broadcast(fit), "event_type")
        .withColumn("r",
          abs(col("cents") - round(col("a") + col("b") *
            col("x").cast("double")).cast("long")))
      val cal = withR.filter(col("event_id") % 4 === 1)
      val calG = cal.groupBy(col("event_type"), col("r"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      val qhat = calG
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n_cal", sum(col("c")).over(wAll))
        // k = ceil((n+1)·0.9) = (9·(n+1) + 9) DIV 10 in exact integers
        .withColumn("k", expr("(9 * (n_cal + 1) + 9) DIV 10"))
        .filter(col("cum") >= least(col("k"), col("n_cal")))
        .groupBy(col("event_type"))
        .agg(min(col("r")).as("qhat"), max(col("n_cal")).as("n_cal"))
      withR.filter(col("event_id") % 4 === 3)
        .join(broadcast(qhat), "event_type")
        .groupBy(col("event_type"), col("qhat"), col("n_cal"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("r") <= col("qhat"), 1L).otherwise(0L))
            .as("covered"))
        .select(col("event_type"), col("n_cal"), col("qhat"),
          col("n_test"), col("covered"),
          (col("covered").cast("double") / col("n_test").cast("double"))
            .as("coverage"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, event_id,
               epoch_us(ts) // 86400000000 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      d0 AS (SELECT min(day) AS d0 FROM e),
      base AS (SELECT e.*, e.day - d0.d0 AS x FROM e, d0),
      fit AS (
        SELECT event_type,
               (CAST(count(*) AS DOUBLE) * CAST(sum(x * cents) AS DOUBLE)
                - CAST(sum(x) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)) /
               (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
                - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) AS b,
               count(*) AS n, CAST(sum(x) AS DOUBLE) AS sxd,
               CAST(sum(cents) AS DOUBLE) AS syd
        FROM base WHERE event_id % 2 = 0 GROUP BY event_type),
      fit2 AS (
        SELECT event_type, b,
               (syd - b * sxd) / CAST(n AS DOUBLE) AS a
        FROM fit),
      withr AS (
        SELECT base.event_type, base.event_id,
               abs(base.cents -
                 CAST(round(f.a + f.b * CAST(base.x AS DOUBLE)) AS BIGINT))
                 AS r
        FROM base JOIN fit2 f ON base.event_type = f.event_type),
      calg AS (
        SELECT event_type, r, count(*) AS c
        FROM withr WHERE event_id % 4 = 1 GROUP BY 1, 2),
      qh AS (
        SELECT event_type, min(r) AS qhat, max(n_cal) AS n_cal
        FROM (
          SELECT event_type, r,
                 sum(c) OVER (PARTITION BY event_type ORDER BY r
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n_cal
          FROM calg)
        WHERE cum >= least((9 * (n_cal + 1) + 9) // 10, n_cal)
        GROUP BY event_type)
      SELECT w.event_type, CAST(qh.n_cal AS BIGINT) AS n_cal,
             CAST(qh.qhat AS BIGINT) AS qhat,
             count(*) AS n_test,
             CAST(sum(CASE WHEN w.r <= qh.qhat THEN 1 ELSE 0 END)
               AS BIGINT) AS covered,
             CAST(sum(CASE WHEN w.r <= qh.qhat THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
      FROM withr w JOIN qh ON w.event_type = qh.event_type
      WHERE w.event_id % 4 = 3
      GROUP BY w.event_type, qh.n_cal, qh.qhat
      ORDER BY w.event_type"""))

  // --------------------------------------------------------------- q240
  // Interval-overlap join via time-grid bucketization ([EXT]): the
  // general two-sided overlap join (a.start < b.end AND b.start <
  // a.end) that q21's point-in-range and q28's as-of cannot express —
  // here correlating activity BURSTS across event types ("which types
  // burst together"). Burst intervals per type = ≥ 2-event minutes
  // padded ±15 min (the co-occurrence tolerance — unpadded minutes
  // almost never coincide across types at small SFs) and merged by
  // q215's sweep: one type-keyed exchange over the minute grid.
  //
  // The join itself is the scale point: a naive theta join is a
  // per-pair nested loop over all intervals. Instead each interval
  // explodes to the HOUR buckets it touches and candidates meet in an
  // EQUI-join on (bucket); a pair is kept exactly once — no dedup
  // shuffle — by the containing-bucket rule: only the bucket holding
  // max(a_start, b_start) emits it (the overlap's first instant lies
  // in both intervals, so both sides emitted that bucket, and no other
  // bucket passes the rule). The DuckDB oracle runs the definition
  // theta join, so the hash match proves the bucketization LOSSLESS.
  // Fan-out = interval length in hours (bursts are short); bucket
  // population is bounded by types × bursts-per-hour, never the
  // corpus.
  private val q240 = QueryDef(
    "q240_interval_overlap_join",
    (s, d) => {
      val pads = ev(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 60000000").as("mn"))
        .groupBy(col("event_type"), col("mn"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .select(col("event_type"), (col("mn") - 15L).as("pst"),
          (col("mn") + 16L).as("pen"))
      val wT = Window.partitionBy(col("event_type")).orderBy(col("pst"))
      val iv = pads
        // q215's sweep merges the ±15-min padded windows: a row opens a
        // new interval iff it starts past every earlier end. NULL
        // running-max (first row of a type) must open a run: the <=
        // form sends both false AND null to otherwise(1), mirroring
        // the oracle's CASE exactly
        .withColumn("brk",
          when(col("pst") <= max(col("pen")).over(
            wT.rowsBetween(Window.unboundedPreceding, -1)), 0L)
            .otherwise(lit(1L)))
        .withColumn("grp", sum(col("brk")).over(
          wT.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("event_type"), col("grp"))
        .agg(min(col("pst")).as("st"), max(col("pen")).as("en"))
        .select(col("event_type"), col("st"), col("en"))
      def buckets(p: String) = iv.toDF(s"${p}_type", s"${p}_st", s"${p}_en")
        .withColumn("bkt", explode(expr(
          s"sequence(${p}_st DIV 60, (${p}_en - 1) DIV 60)")))
      buckets("a").join(buckets("b"), "bkt")
        .filter(col("a_type") < col("b_type") &&
          col("a_st") < col("b_en") && col("b_st") < col("a_en") &&
          col("bkt") === expr("greatest(a_st, b_st) DIV 60"))
        .select(col("a_type"), col("b_type"), col("a_st"), col("a_en"),
          col("b_st"), col("b_en"),
          (least(col("a_en"), col("b_en")) -
            greatest(col("a_st"), col("b_st"))).as("overlap_min"))
        .orderBy(col("a_type"), col("b_type"), col("a_st"), col("b_st"))
    },
    Some("""
      WITH mc AS (
        SELECT event_type, epoch_us(ts) // 60000000 AS mn, count(*) AS c
        FROM events GROUP BY 1, 2 HAVING count(*) >= 2),
      pads AS (
        SELECT event_type, mn - 15 AS pst, mn + 16 AS pen FROM mc),
      runs AS (
        SELECT event_type, pst, pen,
               CASE WHEN pst <= max(pen) OVER (PARTITION BY event_type
                 ORDER BY pst ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING) THEN 0 ELSE 1 END AS brk
        FROM pads),
      grps AS (
        SELECT event_type, pst, pen,
               sum(brk) OVER (PARTITION BY event_type ORDER BY pst
                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM runs),
      iv AS (
        SELECT event_type, min(pst) AS st, max(pen) AS en
        FROM grps GROUP BY event_type, grp)
      SELECT a.event_type AS a_type, b.event_type AS b_type,
             a.st AS a_st, a.en AS a_en, b.st AS b_st, b.en AS b_en,
             least(a.en, b.en) - greatest(a.st, b.st) AS overlap_min
      FROM iv a JOIN iv b
        ON a.event_type < b.event_type
       AND a.st < b.en AND b.st < a.en
      ORDER BY a_type, b_type, a_st, b_st"""))

  // --------------------------------------------------------------- q243
  // Average precision / PR-AUC ([EXT]): the eval companion to q102's
  // ROC-AUC on the SAME task (purchase vs rest, scored by value) — the
  // metric of record when positives are rare, where ROC-AUC flatters.
  // AP = Σ_k ΔR_k · P_k over thresholds (sklearn's step definition,
  // ties grouped per distinct score).
  //
  // Same scale discipline as q102: the ordered pass runs over the
  // COLLAPSED distinct-score grid (value-domain bounded), never the
  // corpus — one grid aggregate, one grid window. Each AP term is one
  // division of exact BIGINTs (Δtp·tp over P·(tp+fp)), quantized to
  // the 1e-12 grid pre-sum (q214 discipline) so the sum is exact and
  // order-independent; the shipped ap is a single division by 1e12.
  private val q243 = QueryDef(
    "q243_average_precision",
    (s, d) => {
      val g = ev(s, d).select(
          (col("event_type") === "purchase").cast("long").as("pos"),
          col("value").as("score"))
        .groupBy(col("score")).agg(sum(col("pos")).as("np"),
          (count(lit(1)) - sum(col("pos"))).as("nn"))
      val w = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("tp", sum(col("np")).over(w))
        .withColumn("fp", sum(col("nn")).over(w))
        .withColumn("npos", sum(col("np")).over(wAll))
        // AP term at this threshold: ΔR·P = (np/npos)·(tp/(tp+fp)),
        // one exact-integer division quantized to the 1e-12 grid
        .withColumn("term_q",
          expr("CAST(round(1e12 * (CAST(np * tp AS DOUBLE)" +
            " / CAST(npos * (tp + fp) AS DOUBLE))) AS BIGINT)"))
        .agg((sum(col("term_q")).cast("double") / lit(1e12)).as("ap"),
          max(col("npos")).as("n_pos"), sum(col("nn")).as("n_neg"),
          count(lit(1)).as("n_thresholds"))
        .select(col("ap"), col("n_pos"), col("n_neg"),
          col("n_thresholds"))
    },
    Some("""
      WITH g AS (
        SELECT value AS score,
               CAST(count(*) FILTER (WHERE event_type = 'purchase')
                 AS BIGINT) AS np,
               CAST(count(*) FILTER (WHERE event_type <> 'purchase')
                 AS BIGINT) AS nn
        FROM events GROUP BY value),
      c AS (
        SELECT np, nn,
               sum(np) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS tp,
               sum(nn) OVER (ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS fp,
               sum(np) OVER () AS npos
        FROM g)
      SELECT CAST(sum(CAST(round(1e12 * (CAST(np * tp AS DOUBLE)
                 / CAST(npos * (tp + fp) AS DOUBLE))) AS BIGINT))
               AS DOUBLE) / 1e12 AS ap,
             CAST(max(npos) AS BIGINT) AS n_pos,
             CAST(sum(nn) AS BIGINT) AS n_neg,
             count(*) AS n_thresholds
      FROM c"""))

  // --------------------------------------------------------------- q242
  // Spearman rank correlation per event_type ([EXT]): the robust,
  // monotone-invariant complement to q55's Pearson (moment-based) and
  // q221's Mann–Kendall (sign-based) — ρ = Pearson of tie-averaged
  // ranks between event day and value cents, the standard "is the
  // relationship monotone" screen.
  //
  // Ranks are never computed per row by a corpus-sized sort: the
  // tie-averaged rank of a value is a VALUE-DOMAIN function,
  // F_before + (c+1)/2, so both rank maps come from grid tables (days;
  // cents — each bounded by its domain, not the corpus) and DOUBLE the
  // rank to r2 = 2F + c + 1 to stay in exact BIGINTs. Each event row
  // inherits (r2x, r2y) by two broadcast grid joins — the corpus is
  // scanned once and only the |types|-row co-moment aggregate
  // shuffles. ρ is one division of exact integer co-moments; the
  // BIGINT envelope holds to ~sf1 (n·Σr2x·r2y ≲ 6e17), past which
  // ranks get centered first (documented escalation).
  private val q242 = QueryDef(
    "q242_spearman_rank",
    (s, d) => {
      val base = ev(s, d).select(col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      def rankGrid(k: String) = {
        val g = base.groupBy(col("event_type"), col(k))
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy(col("event_type")).orderBy(col(k))
          .rowsBetween(Window.unboundedPreceding, -1)
        g.withColumn("f0", coalesce(sum(col("c")).over(wCum), lit(0L)))
          .select(col("event_type"), col(k),
            (lit(2L) * col("f0") + col("c") + 1L).as(s"r2$k"))
      }
      base.join(broadcast(rankGrid("day")), Seq("event_type", "day"))
        .join(broadcast(rankGrid("cents")), Seq("event_type", "cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("r2day")).as("sx"),
          sum(col("r2cents")).as("sy"),
          sum(col("r2day") * col("r2day")).as("sxx"),
          sum(col("r2cents") * col("r2cents")).as("syy"),
          sum(col("r2day") * col("r2cents")).as("sxy"))
        .select(col("event_type"), col("n"),
          // all-tied side (every event same day / same cents): rank
          // variance is exactly 0 → ρ undefined (NULL, as DuckDB's /0) —
          // q55's exact-integer guard
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0L &&
               col("n") * col("syy") - col("sy") * col("sy") > 0L,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                 .cast("double")))).as("rho"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      gd AS (
        SELECT event_type, day, count(*) AS c FROM base GROUP BY 1, 2),
      rd AS (
        SELECT event_type, day,
               2 * coalesce(sum(c) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) + c + 1 AS r2day
        FROM gd),
      gc AS (
        SELECT event_type, cents, count(*) AS c FROM base GROUP BY 1, 2),
      rc AS (
        SELECT event_type, cents,
               2 * coalesce(sum(c) OVER (PARTITION BY event_type
                 ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) + c + 1 AS r2cents
        FROM gc),
      m AS (
        SELECT b.event_type, count(*) AS n,
               CAST(sum(rd.r2day) AS BIGINT) AS sx,
               CAST(sum(rc.r2cents) AS BIGINT) AS sy,
               CAST(sum(rd.r2day * rd.r2day) AS BIGINT) AS sxx,
               CAST(sum(rc.r2cents * rc.r2cents) AS BIGINT) AS syy,
               CAST(sum(rd.r2day * rc.r2cents) AS BIGINT) AS sxy
        FROM base b
        JOIN rd ON rd.event_type = b.event_type AND rd.day = b.day
        JOIN rc ON rc.event_type = b.event_type AND rc.cents = b.cents
        GROUP BY 1)
      SELECT event_type, n,
             CAST(n * sxy - sx * sy AS DOUBLE) /
               (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
      FROM m
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q241
  // CUPED variance reduction ([EXT], Deng et al. 2013): the industry
  // A/B-test adjustment — regress the experiment-period metric y on the
  // PRE-period covariate x (θ = cov(x,y)/var(x), pooled) and report
  // per-arm adjusted means ŷ = ȳ − θ(x̄_arm − x̄) with the achieved
  // variance ratio var(y − θx)/var(y). Complements q149's Welch t-test
  // (which this adjustment would feed). Arms by user-id parity (q149
  // convention); x/y = per-user purchase cents in days <15 / ≥15 (the
  // q230 calendar split — the staged events span days 0–29).
  //
  // No per-user float pass exists: var(y − θx) expands analytically to
  // var(y) − 2θ·cov + θ²·var(x), so EVERYTHING derives from one
  // user-keyed conditional aggregate → 2-row arm moments (n, Σx, Σy,
  // Σx², Σxy, Σy² — all exact BIGINTs) + a broadcast pooled row. θ and
  // each variance are single divisions of exact integer co-moments
  // (q55/q149 discipline); the few chained float ops mirror the
  // oracle's parse order token-for-token, so the doubles are
  // bit-identical cross-engine. The BIGINT co-moment envelope holds to
  // ~sf1 (N·Σxy ≲ 2e18); past that, center on broadcast grand means
  // first — the documented escalation.
  private val q241 = QueryDef(
    "q241_cuped_adjustment",
    (s, d) => {
      val u = ev(s, d)
        .select(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
            " AS BIGINT)").as("day"),
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L)
            .as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < 15, col("cents")).otherwise(0L))
          .as("x"),
          sum(when(col("day") >= 15, col("cents")).otherwise(0L))
            .as("y"))
        .withColumn("arm", expr("user_id % 2"))
      val arms = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val pooled = arms.agg(sum(col("n")).as("nn"), sum(col("sx")).as("tx"),
        sum(col("sy")).as("ty"), sum(col("sxx")).as("txx"),
        sum(col("sxy")).as("txy"))
      arms.crossJoin(broadcast(pooled))
        // degenerate guards (all NULL-mirrored by DuckDB's /0): zero
        // pooled covariate variance → θ undefined; single-user arm
        // (n = 1) → sample variances undefined; var_y = 0 → ratio NULL
        .withColumn("theta",
          when(col("nn") * col("txx") - col("tx") * col("tx") > 0L,
            (col("nn") * col("txy") - col("tx") * col("ty")).cast("double") /
              (col("nn") * col("txx") - col("tx") * col("tx")).cast("double")))
        .withColumn("mean_y",
          col("sy").cast("double") / col("n").cast("double"))
        .withColumn("mean_y_adj",
          col("mean_y") - col("theta") *
            (col("sx").cast("double") / col("n").cast("double") -
              col("tx").cast("double") / col("nn").cast("double")))
        .withColumn("var_y",
          when(col("n") > 1L,
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double")))
        .withColumn("var_x",
          when(col("n") > 1L,
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double")))
        .withColumn("cov_xy",
          when(col("n") > 1L,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double")))
        .withColumn("var_y_cuped",
          col("var_y") - lit(2.0d) * col("theta") * col("cov_xy") +
            col("theta") * col("theta") * col("var_x"))
        .select(col("arm"), col("n"), col("theta"), col("mean_y"),
          col("mean_y_adj"), col("var_y"), col("var_y_cuped"),
          when(col("var_y") =!= 0.0,
            col("var_y_cuped") / col("var_y")).as("var_ratio"))
        .orderBy(col("arm"))
    },
    Some("""
      WITH u AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(sum(CASE WHEN day < 15 THEN cents ELSE 0 END)
                 AS BIGINT) AS x,
               CAST(sum(CASE WHEN day >= 15 THEN cents ELSE 0 END)
                 AS BIGINT) AS y
        FROM (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   ::BIGINT AS day,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END AS cents
          FROM events)
        GROUP BY 1, 2),
      arms AS (
        SELECT arm, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM u GROUP BY 1),
      pooled AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sx) AS BIGINT) AS tx,
               CAST(sum(sy) AS BIGINT) AS ty,
               CAST(sum(sxx) AS BIGINT) AS txx,
               CAST(sum(sxy) AS BIGINT) AS txy
        FROM arms),
      j AS (
        SELECT a.*, p.nn, p.tx, p.ty, p.txx, p.txy,
               CAST(p.nn * p.txy - p.tx * p.ty AS DOUBLE) /
                 CAST(p.nn * p.txx - p.tx * p.tx AS DOUBLE) AS theta,
               CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_y,
               CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE) /
                 CAST(a.n * (a.n - 1) AS DOUBLE) AS var_y,
               CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE) /
                 CAST(a.n * (a.n - 1) AS DOUBLE) AS var_x,
               CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE) /
                 CAST(a.n * (a.n - 1) AS DOUBLE) AS cov_xy
        FROM arms a, pooled p)
      SELECT arm, n, theta, mean_y,
             mean_y - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(tx AS DOUBLE) / CAST(nn AS DOUBLE)) AS mean_y_adj,
             var_y,
             var_y - 2.0 * theta * cov_xy + theta * theta * var_x
               AS var_y_cuped,
             (var_y - 2.0 * theta * cov_xy + theta * theta * var_x)
               / var_y AS var_ratio
      FROM j
      ORDER BY arm"""))

  // --------------------------------------------------------------- q239
  // Cohen's kappa between two label sources ([EXT]): chance-corrected
  // agreement — the standard before trusting auto-labels or merging
  // annotator pools. Here the two deterministic labelers every corpus
  // already has: A = "long enough" (≥ 50 whitespace tokens) and B =
  // "enough raw text" (≥ 280 chars); correlated but not identical, so
  // every lang keeps off-diagonal disagreement mass at the tested SFs
  // (κ < 1, chance correction non-trivial). κ = (pₒ − pₑ)/(1 − pₑ) is computed WITHOUT ever
  // materializing the probabilities: with n·(a+d) and the expected-
  // agreement mass (a+b)(a+c) + (c+d)(b+d) both exact BIGINTs, κ is
  // ONE correctly-rounded division of exact integers — bit-identical
  // cross-engine, no quantization needed. One corpus scan into a
  // |langs|-row conditional aggregate.
  private val q239 = QueryDef(
    "q239_cohens_kappa",
    (s, d) => {
      val lab = docs(s, d).select(col("lang"),
        (size(split(col("text"), " ")) >= 50).as("la"),
        (length(col("text")) >= 280).as("lb"))
      lab.groupBy(col("lang"))
        .agg(sum(when(col("la") && col("lb"), 1L).otherwise(0L)).as("a"),
          sum(when(col("la") && !col("lb"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("la") && col("lb"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("la") && !col("lb"), 1L).otherwise(0L)).as("d"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
        .withColumn("pe_mass",
          (col("a") + col("b")) * (col("a") + col("c")) +
            (col("c") + col("d")) * (col("b") + col("d")))
        .select(col("lang"), col("n"), col("a"), col("b"), col("c"),
          col("d"),
          // pe = 1 (all mass in one contingency cell — e.g. a single-doc
          // language): κ's chance correction is undefined → NULL, as
          // DuckDB's 0/0 yields (DegenerateDataSpec)
          when(col("n") * col("n") - col("pe_mass") > 0L,
            (col("n") * (col("a") + col("d")) - col("pe_mass"))
              .cast("double") /
              (col("n") * col("n") - col("pe_mass")).cast("double"))
            .as("kappa"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH lab AS (
        SELECT lang,
               len(str_split(text, ' ')) >= 50 AS la,
               len(text) >= 280 AS lb
        FROM documents),
      ct AS (
        SELECT lang,
               CAST(sum(CASE WHEN la AND lb THEN 1 ELSE 0 END)
                 AS BIGINT) AS a,
               CAST(sum(CASE WHEN la AND NOT lb THEN 1 ELSE 0 END)
                 AS BIGINT) AS b,
               CAST(sum(CASE WHEN NOT la AND lb THEN 1 ELSE 0 END)
                 AS BIGINT) AS c,
               CAST(sum(CASE WHEN NOT la AND NOT lb THEN 1 ELSE 0 END)
                 AS BIGINT) AS d
        FROM lab GROUP BY 1)
      SELECT lang, a + b + c + d AS n, a, b, c, d,
             CAST((a + b + c + d) * (a + d)
                  - ((a + b) * (a + c) + (c + d) * (b + d)) AS DOUBLE)
               / CAST((a + b + c + d) * (a + b + c + d)
                  - ((a + b) * (a + c) + (c + d) * (b + d)) AS DOUBLE)
               AS kappa
      FROM ct
      ORDER BY lang"""))

  // --------------------------------------------------------------- q235
  // MAD robust outlier screen per event_type ([EXT]): median absolute
  // deviation — the robust scale estimator that, unlike q129's
  // winsorized moments, is immune to ANY minority contamination (50%
  // breakdown). Flags |x − med| > 3.5 · 1.4826 · MAD, the standard
  // robust-z rule (1.4826 ≈ 1/Φ⁻¹(3/4) normal-consistency constant).
  //
  // Both medians are SELECTED lower medians (k = (n+1) DIV 2), never
  // interpolated, via cumulative counts over VALUE-DOMAIN grids (q222
  // trick): the cents grid for the median, then the |cents − med| grid
  // — derived by re-keying the SAME per-(type, cents) count table, no
  // second corpus scan — for the MAD. The outlier test stays in exact
  // integers: |dev|·10⁴ > 51891·MAD avoids ever materializing the
  // 5.1891 float threshold. One corpus-sized map-side-combinable
  // aggregate; every window runs on money-range-bounded grids.
  private val q235 = QueryDef(
    "q235_mad_outliers",
    (s, d) => {
      val g = ev(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
      val med = g
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .filter(col("cum") >= expr("(n + 1) DIV 2"))
        .groupBy(col("event_type"))
        .agg(min(col("cents")).as("med"), max(col("n")).as("n"))
      val dev = g.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), abs(col("cents") - col("med")).as("dv"))
        .agg(sum(col("c")).as("c"))
      val wDev = Window.partitionBy(col("event_type")).orderBy(col("dv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mad = dev
        .withColumn("cum", sum(col("c")).over(wDev))
        .withColumn("n", sum(col("c")).over(wAll))
        .filter(col("cum") >= expr("(n + 1) DIV 2"))
        .groupBy(col("event_type"))
        .agg(min(col("dv")).as("mad"))
      g.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("med"), col("mad"), col("n"))
        .agg(sum(when(
          abs(col("cents") - col("med")) * 10000L > lit(51891L) * col("mad"),
          col("c")).otherwise(0L)).as("n_out"))
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_out"),
          (col("n_out").cast("double") / col("n").cast("double"))
            .as("out_rate"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
               count(*) AS c
        FROM events GROUP BY 1, 2),
      med AS (
        SELECT event_type, min(cents) AS med, CAST(max(n) AS BIGINT) AS n
        FROM (
          SELECT event_type, cents,
                 sum(c) OVER (PARTITION BY event_type ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
          FROM g)
        WHERE cum >= (n + 1) // 2
        GROUP BY event_type),
      dev AS (
        SELECT g.event_type, abs(g.cents - med.med) AS dv,
               CAST(sum(g.c) AS BIGINT) AS c
        FROM g JOIN med ON g.event_type = med.event_type
        GROUP BY 1, 2),
      mad AS (
        SELECT event_type, min(dv) AS mad
        FROM (
          SELECT event_type, dv,
                 sum(c) OVER (PARTITION BY event_type ORDER BY dv
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
          FROM dev)
        WHERE cum >= (n + 1) // 2
        GROUP BY event_type)
      SELECT g.event_type, med.n, med.med, mad.mad,
             CAST(sum(CASE WHEN abs(g.cents - med.med) * 10000
                                > 51891 * mad.mad
                           THEN g.c ELSE 0 END) AS BIGINT) AS n_out,
             CAST(sum(CASE WHEN abs(g.cents - med.med) * 10000
                                > 51891 * mad.mad
                           THEN g.c ELSE 0 END) AS DOUBLE)
               / CAST(med.n AS DOUBLE) AS out_rate
      FROM g
      JOIN med ON g.event_type = med.event_type
      JOIN mad ON g.event_type = mad.event_type
      GROUP BY g.event_type, med.n, med.med, mad.mad
      ORDER BY g.event_type"""))

  // --------------------------------------------------------------- q230
  // Population Stability Index per event_type ([EXT]): THE industry
  // drift score for deployed-model inputs — PSI = Σ (p_i − q_i)·ln(p_i/q_i)
  // over 10 equal-frequency bins LEARNED ON THE REFERENCE window (days
  // 0–14), applied to the actual window (day 15+). Closes the drift
  // matrix: q187 KS (continuous, exact), q225 JS (categorical), q150 χ²
  // (independence), q230 PSI (binned, the model-monitoring standard with
  // its 0.1/0.25 action thresholds).
  //
  // Bin edges never exist as float quantiles: a reference value's decile
  // is 1 + floor(10·F_before/n) on the VALUE DOMAIN (q222/q224 trick,
  // exact integers, ties share a bin); actual values inherit the bin of
  // the largest reference value ≤ v (below-range → bin 1). Shares are
  // exact-integer ratios; each ln term is quantized to BIGINT at 1e-12
  // pre-sum (q214 discipline); empty bins contribute 0 by the documented
  // convention.
  //
  // The as-of assignment does NOT join actual values against the full
  // reference cents grid — that is a per-type grid×grid cartesian
  // (~100k × ~100k rows at sf0.1, measured at 135 s in BENCH; the
  // first shipped cut did exactly that). Because bin is monotone
  // non-decreasing in cents, "bin of the largest ref value ≤ v" equals
  // "largest bin whose MINIMUM ref value ≤ v", so the broadcast side
  // collapses to the ≤ 10-row-per-type edge table min(cents) per bin —
  // fan-out ≤ 10×, not grid×. The DuckDB oracle deliberately keeps the
  // definition-form join (largest ref VALUE ≤ v over the full grid), so
  // the hash match independently proves the edge-table rewrite
  // equivalent to the definition. Scale: two calendar-window count
  // aggregates (map-side combinable), then everything runs on
  // cents-grid tables bounded by the money range, not the corpus.
  private val q230 = QueryDef(
    "q230_psi_drift",
    (s, d) => {
      val base = ev(s, d).select(col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      val refG = base.filter(col("day") < 15)
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("cr"))
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy(col("event_type"))
      val refB = refG
        .withColumn("f0", coalesce(sum(col("cr")).over(wPrev), lit(0L)))
        .withColumn("n_ref", sum(col("cr")).over(wAll))
        .withColumn("bin", expr("1 + (f0 * 10) DIV n_ref"))
      val refBins = refB.groupBy(col("event_type"), col("bin"))
        .agg(sum(col("cr")).as("c_ref"), max(col("n_ref")).as("n_ref"))
      val actG = base.filter(col("day") >= 15)
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("ca"))
      // as-of bin assignment via the per-bin lower-edge table (see the
      // scaladoc): bin(v) = max bin whose min reference cents <= v.
      // Edges are <= 10 rows per event_type, so the broadcast join
      // fans out 10x, never grid x grid.
      val refEdges = refB.groupBy(col("event_type"), col("bin"))
        .agg(min(col("cents")).as("lo"))
      val assign = actG.join(broadcast(refEdges), Seq("event_type"), "left")
        .groupBy(col("event_type"), col("cents"), col("ca"))
        // lo > v rows become NULL which max() skips, so a value below
        // the whole reference range keeps its group and lands in bin 1
        // via the coalesce (a filter here would DROP the group)
        .agg(max(when(col("lo") <= col("cents"), col("bin"))).as("mb"))
        .select(col("event_type"), col("ca"),
          coalesce(col("mb"), lit(1L)).as("bin"))
      val actBins = assign.groupBy(col("event_type"), col("bin"))
        .agg(sum(col("ca")).as("c_act"))
      val nAct = actG.groupBy(col("event_type"))
        .agg(sum(col("ca")).as("n_act"))
      refBins.join(actBins, Seq("event_type", "bin"), "left")
        .join(nAct, "event_type")
        .withColumn("c_act", coalesce(col("c_act"), lit(0L)))
        .withColumn("term", when(col("c_act") > 0,
          round(((col("c_act").cast("double") / col("n_act").cast("double"))
            - (col("c_ref").cast("double") / col("n_ref").cast("double"))) *
            log((col("c_act").cast("double") / col("n_act").cast("double")) /
              (col("c_ref").cast("double") / col("n_ref").cast("double"))) *
            lit(1e12)).cast("long")).otherwise(lit(0L)))
        .groupBy(col("event_type"))
        .agg(max(col("n_ref")).as("n_ref"), max(col("n_act")).as("n_act"),
          round(sum(col("term")).cast("double") / lit(1e12), 6).as("psi"))
        .withColumn("action", when(col("psi") >= 0.25, "investigate")
          .when(col("psi") >= 0.1, "watch").otherwise("stable"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH base AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      refg AS (
        SELECT event_type, cents, count(*) AS cr
        FROM base WHERE day < 15 GROUP BY 1, 2),
      refb AS (
        SELECT event_type, cents, cr,
               1 + (coalesce(sum(cr) OVER (PARTITION BY event_type
                     ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 10)
                   // sum(cr) OVER (PARTITION BY event_type) AS bin,
               sum(cr) OVER (PARTITION BY event_type) AS n_ref
        FROM refg),
      refbins AS (
        SELECT event_type, bin, CAST(sum(cr) AS BIGINT) AS c_ref,
               CAST(max(n_ref) AS BIGINT) AS n_ref
        FROM refb GROUP BY 1, 2),
      actg AS (
        SELECT event_type, cents, count(*) AS ca
        FROM base WHERE day >= 15 GROUP BY 1, 2),
      assign AS (
        SELECT a.event_type, a.ca,
               coalesce(max_by(r.bin, r.cents), 1) AS bin
        FROM actg a LEFT JOIN refb r
          ON r.event_type = a.event_type AND r.cents <= a.cents
        GROUP BY a.event_type, a.cents, a.ca),
      actbins AS (
        SELECT event_type, bin, CAST(sum(ca) AS BIGINT) AS c_act
        FROM assign GROUP BY 1, 2),
      nact AS (
        SELECT event_type, CAST(sum(ca) AS BIGINT) AS n_act
        FROM actg GROUP BY 1),
      terms AS (
        SELECT rb.event_type, rb.n_ref, na.n_act,
               CASE WHEN coalesce(ab.c_act, 0) > 0 THEN
                 CAST(round(
                   ((CAST(ab.c_act AS DOUBLE) / CAST(na.n_act AS DOUBLE))
                    - (CAST(rb.c_ref AS DOUBLE) / CAST(rb.n_ref AS DOUBLE)))
                   * ln((CAST(ab.c_act AS DOUBLE) / CAST(na.n_act AS DOUBLE))
                        / (CAST(rb.c_ref AS DOUBLE) /
                           CAST(rb.n_ref AS DOUBLE)))
                   * 1e12) AS BIGINT)
               ELSE 0 END AS term
        FROM refbins rb
        LEFT JOIN actbins ab
          ON ab.event_type = rb.event_type AND ab.bin = rb.bin
        JOIN nact na ON na.event_type = rb.event_type)
      SELECT event_type, max(n_ref) AS n_ref, max(n_act) AS n_act,
             round(CAST(sum(term) AS DOUBLE) / 1e12, 6) AS psi,
             CASE WHEN round(CAST(sum(term) AS DOUBLE) / 1e12, 6) >= 0.25
                    THEN 'investigate'
                  WHEN round(CAST(sum(term) AS DOUBLE) / 1e12, 6) >= 0.1
                    THEN 'watch'
                  ELSE 'stable' END AS action
      FROM terms
      GROUP BY event_type
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q244
  // One-way ANOVA F-test of value across ALL event types ([EXT]) — the
  // k-group generalization of q149's two-arm Welch test: does the spend
  // distribution differ by event type at all, before any pairwise
  // comparison? Reports the between/within sum-of-squares decomposition,
  // the F statistic on (k−1, N−k) degrees of freedom, and η² (the
  // variance-explained effect size a dashboard actually plots).
  //
  // Exactness (q149 discipline): both SS terms derive from ONE map-side-
  // combined hash aggregate of exact integer cent moments (n, Σc, Σc² per
  // type — c² ≤ 1e10 × corpus rows stays far inside 2^63 at sf0.1; the
  // documented escalation past ~sf1 is centering on a broadcast grand
  // mean first). The k-row group grid folds into one global row: integer
  // sums stay BIGINT, and the one order-sensitive float reduction —
  // Σᵢ sᵢ²/nᵢ across groups — quantizes each correctly-rounded term to
  // the 1e6 grid pre-sum (q243 discipline), so F is bit-identical at any
  // partition count. Scale: one corpus scan, |types|-row exchange, 1 row
  // out. The p-value lookup (F CDF, a libm call) is left to the consumer
  // exactly as q149 leaves the t CDF.
  private val q244 = QueryDef(
    "q244_anova_oneway",
    (s, d) => {
      val g = ev(s, d)
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("q"))
      g.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"),
          sum(col("s")).as("ts"), sum(col("q")).as("tq"),
          sum(expr("CAST(round(1e6 * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)" +
            " / CAST(n AS DOUBLE) / 1e4)) AS BIGINT)")).as("tbq"))
        .withColumn("ssb",
          col("tbq").cast("double") / lit(1e6) -
            col("ts").cast("double") * col("ts").cast("double") /
              col("nn").cast("double") / lit(1e4))
        .withColumn("ssw",
          col("tq").cast("double") / lit(1e4) -
            col("tbq").cast("double") / lit(1e6))
        .select(col("nn").as("n"), col("k"),
          round(col("ssb"), 6).as("ss_between"),
          round(col("ssw"), 6).as("ss_within"),
          round((col("ssb") / (col("k") - 1).cast("double")) /
            (col("ssw") / (col("nn") - col("k")).cast("double")), 6)
            .as("f_stat"),
          round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta2"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS q
        FROM (SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events)
        GROUP BY event_type),
      t AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k,
               CAST(sum(s) AS BIGINT) AS ts,
               CAST(sum(q) AS BIGINT) AS tq,
               CAST(sum(CAST(round(1e6 * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(n AS DOUBLE) / 1e4)) AS BIGINT)) AS BIGINT) AS tbq
        FROM g),
      e AS (
        SELECT nn, k,
               CAST(tbq AS DOUBLE) / 1e6
                 - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE)
                   / CAST(nn AS DOUBLE) / 1e4 AS ssb,
               CAST(tq AS DOUBLE) / 1e4
                 - CAST(tbq AS DOUBLE) / 1e6 AS ssw
        FROM t)
      SELECT nn AS n, k, round(ssb, 6) AS ss_between,
             round(ssw, 6) AS ss_within,
             round((ssb / CAST(k - 1 AS DOUBLE))
                   / (ssw / CAST(nn - k AS DOUBLE)), 6) AS f_stat,
             round(ssb / (ssb + ssw), 6) AS eta2
      FROM e"""))

  // --------------------------------------------------------------- q245
  // Kruskal–Wallis H-test across event types ([EXT]) — the rank-based
  // (distribution-free) companion to q244's moment-based ANOVA, robust
  // to the heavy-tailed spend distributions where ANOVA's normality
  // premise fails. Reports H, the tie-correction factor C = 1 −
  // Σ(t³−t)/(N³−N), and the corrected H/C (χ²_{k−1} under H₀; the CDF
  // lookup is left to the consumer, q149/q244 discipline).
  //
  // Ranks are never a corpus sort (q242 discipline): the tie-averaged
  // rank of a cent value is a VALUE-DOMAIN function F_before + (t+1)/2,
  // so the rank map is a cents-grid table (doubled to r2 = 2F + t + 1 to
  // stay in exact BIGINTs) built by one grid aggregate + one grid-sized
  // window; each event row inherits r2 by a broadcast grid join, and only
  // the |types|-row rank-sum aggregate shuffles. The per-group H term
  // 3·R2ᵢ²/(nᵢ·N(N+1)) is O(1)-magnitude, quantized to the 1e9 grid
  // pre-sum, so the k-row float reduction is exact. Tie masses Σ(t³−t)
  // stay BIGINT to ~sf0.3 (t ≤ N ⇒ t³ ≤ 2e17 at sf0.1); past that the
  // tie sum escalates to the grid-quantized double, documented here.
  private val q245 = QueryDef(
    "q245_kruskal_wallis",
    (s, d) => {
      val base = ev(s, d).select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      val grid0 = base.groupBy(col("c")).agg(count(lit(1)).as("t"))
      val wCum = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val grid = grid0
        .withColumn("f0", coalesce(sum(col("t")).over(wCum), lit(0L)))
        .select(col("c"), (lit(2L) * col("f0") + col("t") + 1L).as("r2"),
          (col("t") * col("t") * col("t") - col("t")).as("t3"))
      val glob = grid.agg(sum(col("t3")).as("tie3"))
      val groups = base.join(broadcast(grid.select(col("c"), col("r2"))),
          Seq("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("r2s"))
      val tot = groups.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"))
      groups.crossJoin(broadcast(tot)).crossJoin(broadcast(glob))
        .withColumn("term_q",
          expr("CAST(round(1e9 * (3.0 * CAST(r2s AS DOUBLE)" +
            " * CAST(r2s AS DOUBLE) / (CAST(n AS DOUBLE)" +
            " * CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))))" +
            " AS BIGINT)"))
        .groupBy(col("nn"), col("k"), col("tie3"))
        .agg(sum(col("term_q")).as("hq"))
        .withColumn("h", col("hq").cast("double") / lit(1e9) -
          lit(3.0d) * (col("nn") + 1L).cast("double"))
        .withColumn("tie_c", lit(1.0d) -
          col("tie3").cast("double") /
            (col("nn").cast("double") * col("nn").cast("double") *
              col("nn").cast("double") - col("nn").cast("double")))
        .select(col("nn").as("n"), col("k"),
          round(col("h"), 6).as("h_stat"),
          round(col("tie_c"), 9).as("tie_c"),
          round(col("h") / col("tie_c"), 6).as("h_corrected"))
    },
    Some("""
      WITH base AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      g0 AS (SELECT c, count(*) AS t FROM base GROUP BY c),
      grid AS (
        SELECT c,
               2 * coalesce(sum(t) OVER (ORDER BY c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + t + 1 AS r2,
               t * t * t - t AS t3
        FROM g0),
      gtie AS (SELECT CAST(sum(t3) AS BIGINT) AS tie3 FROM grid),
      grp AS (
        SELECT event_type, count(*) AS n, CAST(sum(r2) AS BIGINT) AS r2s
        FROM base JOIN grid USING (c)
        GROUP BY event_type),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k FROM grp),
      terms AS (
        SELECT t.nn, t.k, gl.tie3,
               CAST(round(1e9 * (3.0 * CAST(g.r2s AS DOUBLE)
                 * CAST(g.r2s AS DOUBLE) / (CAST(g.n AS DOUBLE)
                 * CAST(t.nn AS DOUBLE) * CAST(t.nn + 1 AS DOUBLE))))
                 AS BIGINT) AS term_q
        FROM grp g, tot t, gtie gl),
      agg AS (
        SELECT nn, k, tie3, CAST(sum(term_q) AS BIGINT) AS hq
        FROM terms GROUP BY nn, k, tie3),
      e AS (
        SELECT nn, k,
               CAST(hq AS DOUBLE) / 1e9
                 - 3.0 * CAST(nn + 1 AS DOUBLE) AS h,
               1.0 - CAST(tie3 AS DOUBLE)
                 / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                    * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)) AS tie_c
        FROM agg)
      SELECT nn AS n, k, round(h, 6) AS h_stat,
             round(tie_c, 9) AS tie_c,
             round(h / tie_c, 6) AS h_corrected
      FROM e"""))

  // --------------------------------------------------------------- q254
  // Shapley-value channel attribution ([EXT], Zhao et al. 2018's
  // simplified game) — the principled alternative to q132's last-touch
  // and q153's time-decay heuristics: each user's journey is the SET of
  // non-purchase event types they touched, the coalition value v(S) is
  // the observed conversion rate of users with journey exactly S, and
  // channel i's credit is the Shapley value φᵢ = Σ_{S∌i} |S|!(k−1−|S|)!/k!
  // · (v(S∪i) − v(S)). Efficiency (Σφᵢ = v(full) − v(∅)) is pinned by
  // the spec.
  //
  // The game lives on the 2^k COALITION GRID, never the corpus: one
  // user-keyed aggregate builds (journey mask, converted) — bits from an
  // alphabetical channel dictionary (≤ |event types|, broadcast), OR as
  // a sum of DISTINCT bits — then v collapses to ≤ 2^k rows and the
  // Shapley sum is a self-join of the grid with itself (mask & bit = 0,
  // partner = mask + bit). Exactness: v quantizes to the 1e-9 grid;
  // |S|!(k−1−|S|)! is an exact integer (both engines' factorial/
  // bit_count agree — probed), so every φ numerator term is an exact
  // BIGINT product and the single division by k!·1e9 happens once. The
  // declared envelope is k ≤ 20 (grid 2^20; the factorial products stay
  // < 2^62 for k ≤ 20) — beyond that, channel attribution needs the
  // sampled-permutation estimator, documented here.
  private val q254 = QueryDef(
    "q254_shapley_attribution",
    (s, d) => {
      val e = ev(s, d)
      val touches = e.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type")).distinct()
      val dict = touches.select(col("event_type")).distinct()
        .withColumn("bit",
          expr("shiftleft(1L, CAST(row_number() OVER " +
            "(ORDER BY event_type) AS INT) - 1)"))
      val umask = touches.join(broadcast(dict), Seq("event_type"))
        .groupBy(col("user_id")).agg(sum(col("bit")).as("mask"))
      val uconv = e.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val vmask = uconv.join(umask, Seq("user_id"), "left")
        .withColumn("mask", coalesce(col("mask"), lit(0L)))
        .groupBy(col("mask"))
        .agg(count(lit(1)).as("n_u"), sum(col("conv")).as("n_c"))
      val kdf = dict.agg(count(lit(1)).cast("int").as("k"))
      val grid = kdf.select(col("k"),
          explode(expr("sequence(0L, shiftleft(1L, k) - 1)")).as("mask"))
        .join(vmask, Seq("mask"), "left")
        .withColumn("vq", coalesce(
          round(lit(1e9) * (col("n_c").cast("double") /
            col("n_u").cast("double"))).cast("long"), lit(0L)))
        .select(col("mask"), col("k"), col("vq"))
      val terms = dict
        .join(grid, (col("mask").bitwiseAND(col("bit"))) === 0L)
        .join(grid.select(col("mask").as("mask2"), col("vq").as("vq2")),
          col("mask2") === col("mask") + col("bit"))
        .withColumn("sz", expr("bit_count(mask)"))
        .withColumn("wnum",
          factorial(col("sz")) * factorial(col("k") - 1 - col("sz")))
        .groupBy(col("event_type"), col("k"))
        .agg(sum(col("wnum") * (col("vq2") - col("vq"))).as("num"))
      val nus = touches.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"))
      terms.join(broadcast(nus), Seq("event_type"))
        .select(col("event_type").as("channel"), col("n_users"),
          round(col("num").cast("double") /
            (factorial(col("k")).cast("double") * lit(1e9)), 6).as("phi"))
        .orderBy(col("channel"))
    },
    Some("""
      WITH touches AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE event_type <> 'purchase'),
      dict AS (
        SELECT event_type,
               (1::BIGINT << (CAST(row_number() OVER (ORDER BY event_type)
                 AS INT) - 1)) AS bit
        FROM (SELECT DISTINCT event_type FROM touches)),
      umask AS (
        SELECT t.user_id, CAST(sum(d.bit) AS BIGINT) AS mask
        FROM touches t JOIN dict d USING (event_type)
        GROUP BY t.user_id),
      uconv AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
        FROM events GROUP BY user_id),
      vmask AS (
        SELECT coalesce(m.mask, 0) AS mask, count(*) AS n_u,
               CAST(sum(c.conv) AS BIGINT) AS n_c
        FROM uconv c LEFT JOIN umask m USING (user_id)
        GROUP BY 1),
      kdf AS (SELECT CAST(count(*) AS INT) AS k FROM dict),
      grid AS (
        SELECT g.mask, kdf.k,
               coalesce(CAST(round(1e9 * (CAST(v.n_c AS DOUBLE)
                 / CAST(v.n_u AS DOUBLE))) AS BIGINT), 0) AS vq
        FROM (SELECT unnest(range(0, (1::BIGINT << (SELECT k FROM kdf))))
                AS mask) g
        LEFT JOIN vmask v USING (mask), kdf),
      terms AS (
        SELECT d.event_type, g.k,
               CAST(sum((factorial(bit_count(g.mask))
                 * factorial(g.k - 1 - bit_count(g.mask)))
                 * (g2.vq - g.vq)) AS BIGINT) AS num
        FROM dict d
        JOIN grid g ON (g.mask & d.bit) = 0
        JOIN grid g2 ON g2.mask = g.mask + d.bit
        GROUP BY 1, 2),
      nus AS (
        SELECT event_type, count(*) AS n_users FROM touches GROUP BY 1)
      SELECT t.event_type AS channel, n.n_users,
             round(CAST(t.num AS DOUBLE)
               / (CAST(factorial(t.k) AS DOUBLE) * 1e9), 6) AS phi
      FROM terms t JOIN nus n USING (event_type)
      ORDER BY channel"""))

  // --------------------------------------------------------------- q274
  // 7-day rolling MAU + DAU/MAU stickiness ([EXT]) — the windowed
  // COUNT DISTINCT no window function can express (distinct does not
  // decompose over sliding frames; Spark rejects countDistinct OVER).
  // The scalable identity: a user active on day d is a member of every
  // 7-day window ENDING on d..d+6, so distinct (user, day) presence
  // explodes into ≤ 7 covered window-ends, a second distinct collapses
  // multi-day users within a window, and a plain count per end-day is
  // exactly the rolling distinct. Fan-out is the window length — a
  // constant — never the corpus; both distincts are map-side-combinable
  // hash aggregates on (user, day) keys. Reported with same-day DAU and
  // the DAU/MAU stickiness ratio, full windows only.
  private val q274 = QueryDef(
    "q274_rolling_mau",
    (s, d) => {
      val pres = ev(s, d).select(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
            " AS BIGINT)").as("day"))
        .distinct()
      val span = pres.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val mau = pres
        .select(col("user_id"),
          explode(expr("sequence(day, day + 6)")).as("wday"))
        .distinct()
        .groupBy(col("wday")).agg(count(lit(1)).as("mau7"))
      val dau = pres.groupBy(col("day").as("wday"))
        .agg(count(lit(1)).as("dau"))
      // LEFT join dau onto mau (dau coalesced to 0): a window-end day can
      // have MAU>0 with zero same-day events (idle day inside an active
      // week) — an inner join would silently drop it from the report
      // (ADVICE r7). mau7 > 0 on every emitted row, so stickiness is a
      // well-defined 0.0 on idle days, never a division by zero.
      mau.join(dau, Seq("wday"), "left")
        .crossJoin(broadcast(span))
        .filter(col("wday") >= col("d0") + 6L && col("wday") <= col("d1"))
        .select(col("wday").as("window_end_day"), col("mau7"),
          coalesce(col("dau"), lit(0L)).as("dau"),
          round(coalesce(col("dau"), lit(0L)).cast("double")
            / col("mau7").cast("double"), 6).as("stickiness"))
        .orderBy(col("window_end_day"))
    },
    Some("""
      WITH pres AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day
        FROM events),
      span AS (SELECT min(day) AS d0, max(day) AS d1 FROM pres),
      cover AS (
        SELECT DISTINCT user_id, day + o.o AS wday
        FROM pres, range(0, 7) AS o(o)),
      mau AS (SELECT wday, count(*) AS mau7 FROM cover GROUP BY wday),
      dau AS (SELECT day AS wday, count(*) AS dau FROM pres GROUP BY day)
      SELECT mau.wday AS window_end_day, mau.mau7,
             CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
             round(CAST(coalesce(dau.dau, 0) AS DOUBLE)
                   / CAST(mau.mau7 AS DOUBLE), 6) AS stickiness
      FROM mau LEFT JOIN dau ON mau.wday = dau.wday, span
      WHERE mau.wday >= span.d0 + 6 AND mau.wday <= span.d1
      ORDER BY window_end_day"""))

  // --------------------------------------------------------------- q271
  // 1-D DENSITY clustering, DBSCAN-style, over the purchase-value domain
  // ([EXT]) — find the "price points": $1 bins with ≥ minPts purchases
  // are core bins; core bins within eps = 2 bins of each other merge
  // into one cluster (the classic gaps-and-islands collapse); border
  // mass (non-core bins adjacent to a cluster) attaches to it. The
  // density segmentation a pricing/fraud dashboard runs on any 1-D
  // metric — and the grid formulation IS the scale story: every step
  // after the one corpus aggregate runs on the VALUE-DOMAIN bin grid
  // (≤ distinct dollar values), so N never appears again. minPts scales
  // with corpus mass (0.2% of purchases) so the report is stable across
  // SFs.
  //
  // Exactness: bins by integer DIV on the cents grid; the island id is
  // a running sum over the bin grid ordered by bin (grid-sized window,
  // q242's discipline); all outputs exact integers except the two
  // rounded ratio columns.
  private val q271 = QueryDef(
    "q271_density_clusters_1d",
    (s, d) => {
      val p = ev(s, d).filter(col("event_type") === "purchase")
        .select(expr("CAST(round(value * 100) AS BIGINT) DIV 100").as("bin"))
      val bins = p.groupBy(col("bin")).agg(count(lit(1)).as("n"))
      val tot = bins.agg(sum(col("n")).as("np"))
      val core = bins.crossJoin(broadcast(tot))
        .filter(col("n") * 500L >= col("np")) // minPts = 0.2% of purchases
        .select(col("bin"), col("n"))
      val wBin = Window.orderBy(col("bin"))
      val isl = core
        .withColumn("prev", lag(col("bin"), 1).over(wBin))
        .withColumn("brk",
          when(col("prev").isNull || col("bin") - col("prev") > 2L, 1L)
            .otherwise(0L))
        .withColumn("cluster",
          sum(col("brk")).over(wBin.rowsBetween(Window.unboundedPreceding, 0)))
      isl.groupBy(col("cluster"))
        .agg(min(col("bin")).as("bin_lo"), max(col("bin")).as("bin_hi"),
          count(lit(1)).as("n_core_bins"), sum(col("n")).as("n_purchases"))
        .crossJoin(broadcast(tot))
        .select(col("cluster"), col("bin_lo"), col("bin_hi"),
          col("n_core_bins"), col("n_purchases"),
          round(col("n_purchases").cast("double") / col("np").cast("double"),
            6).as("mass_share"))
        .orderBy(col("cluster"))
    },
    Some("""
      WITH p AS (
        SELECT CAST(round(value * 100) AS BIGINT) // 100 AS bin
        FROM events WHERE event_type = 'purchase'),
      bins AS (SELECT bin, count(*) AS n FROM p GROUP BY bin),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS np FROM bins),
      core AS (
        SELECT bin, n FROM bins, tot WHERE n * 500 >= np),
      isl AS (
        SELECT bin, n,
               sum(CASE WHEN prev IS NULL OR bin - prev > 2 THEN 1 ELSE 0 END)
                 OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cluster
        FROM (
          SELECT bin, n, lag(bin, 1) OVER (ORDER BY bin) AS prev
          FROM core))
      SELECT CAST(cluster AS BIGINT) AS cluster,
             CAST(min(bin) AS BIGINT) AS bin_lo,
             CAST(max(bin) AS BIGINT) AS bin_hi,
             count(*) AS n_core_bins,
             CAST(sum(n) AS BIGINT) AS n_purchases,
             round(CAST(sum(n) AS DOUBLE)
               / CAST((SELECT np FROM tot) AS DOUBLE), 6) AS mass_share
      FROM isl
      GROUP BY cluster
      ORDER BY cluster"""))

  // --------------------------------------------------------------- q301
  // Cross-correlation function between the daily VIEW and PURCHASE
  // revenue series at lags −3…+3 ([EXT]) — the lead/lag diagnostic
  // beside q265's autocorrelogram: a peak at positive lag k means
  // views LEAD purchases by k days (the browse-to-buy delay read
  // directly off the correlogram), negative lags the reverse.
  // Statsmodels convention: numerator over the lag-overlap days,
  // normalized by the FULL series' own second moments.
  //
  // Exactness: q265's discipline verbatim — day totals are exact cents
  // BIGINTs, the centered numerator expands to integer co-moments with
  // the two grand means carried symbolically (fixed-order double ops
  // on exact operands), the denominator is one correctly-rounded sqrt
  // of their product, roundZ final. The lag join is a 7×30-row grid
  // self-join; the corpus is touched once per series by the day
  // aggregate.
  private val q301 = QueryDef(
    "q301_ccf_daily",
    (s, d) => {
      def series(t: String, nm: String) = ev(s, d)
        .filter(col("event_type") === t)
        .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as(nm))
      val dx = series("view", "x")
      val dy = series("purchase", "y")
      val tx = dx.agg(count(lit(1)).as("nx"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val ty = dy.agg(count(lit(1)).as("ny"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
      val lagged = (-3 to 3).map { k =>
        dx.join(dy.select((col("day") - k.toLong).as("day"),
            col("y").as("yk")), Seq("day"))
          .select(lit(k.toLong).as("lag"), col("x"), col("yk"))
      }.reduce(_ unionByName _)
      lagged.groupBy(col("lag"))
        .agg(count(lit(1)).as("nk"), sum(col("x")).as("sa"),
          sum(col("yk")).as("sb"), sum(col("x") * col("yk")).as("sab"))
        .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .withColumn("mx", col("sx").cast("double") / col("nx").cast("double"))
        .withColumn("my", col("sy").cast("double") / col("ny").cast("double"))
        .withColumn("num",
          col("sab").cast("double") - col("mx") * col("sb").cast("double") -
            col("my") * col("sa").cast("double") +
            col("nk").cast("double") * col("mx") * col("my"))
        .withColumn("den", sqrt(
          (col("sxx").cast("double") -
            col("nx").cast("double") * col("mx") * col("mx")) *
          (col("syy").cast("double") -
            col("ny").cast("double") * col("my") * col("my"))))
        .select(col("lag"), col("nk"),
          Num.roundZ(col("num") / col("den"), 6).as("ccf"))
        .orderBy(col("lag"))
    },
    Some("""
      WITH dx AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'view' GROUP BY 1),
      dy AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      tx AS (SELECT count(*) AS nx, CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(x * x) AS BIGINT) AS sxx FROM dx),
      ty AS (SELECT count(*) AS ny, CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(y * y) AS BIGINT) AS syy FROM dy),
      lagged AS (
        SELECT k.k AS lag, a.x, b.y AS yk
        FROM range(-3, 4) AS k(k)
        JOIN dx a ON TRUE
        JOIN dy b ON b.day = a.day + k.k),
      agg AS (
        SELECT lag, count(*) AS nk, CAST(sum(x) AS BIGINT) AS sa,
               CAST(sum(yk) AS BIGINT) AS sb,
               CAST(sum(x * yk) AS BIGINT) AS sab
        FROM lagged GROUP BY 1)
      SELECT a.lag, a.nk,
             (CAST(round(((CAST(a.sab AS DOUBLE)
                 - (CAST(tx.sx AS DOUBLE) / CAST(tx.nx AS DOUBLE))
                   * CAST(a.sb AS DOUBLE)
                 - (CAST(ty.sy AS DOUBLE) / CAST(ty.ny AS DOUBLE))
                   * CAST(a.sa AS DOUBLE)
                 + CAST(a.nk AS DOUBLE)
                   * (CAST(tx.sx AS DOUBLE) / CAST(tx.nx AS DOUBLE))
                   * (CAST(ty.sy AS DOUBLE) / CAST(ty.ny AS DOUBLE)))
               / sqrt((CAST(tx.sxx AS DOUBLE)
                 - CAST(tx.nx AS DOUBLE)
                   * (CAST(tx.sx AS DOUBLE) / CAST(tx.nx AS DOUBLE))
                   * (CAST(tx.sx AS DOUBLE) / CAST(tx.nx AS DOUBLE)))
                * (CAST(ty.syy AS DOUBLE)
                 - CAST(ty.ny AS DOUBLE)
                   * (CAST(ty.sy AS DOUBLE) / CAST(ty.ny AS DOUBLE))
                   * (CAST(ty.sy AS DOUBLE) / CAST(ty.ny AS DOUBLE)))))
               * 1e6) AS BIGINT) / 1e6) AS ccf
      FROM agg a CROSS JOIN tx CROSS JOIN ty
      ORDER BY a.lag"""))

  // --------------------------------------------------------------- q302
  // Monthly price-index triple — Laspeyres, Paasche, Fisher — over the
  // lineitem unit-price series ([EXT]): the canonical index-number
  // formulas a pricing/economics dashboard publishes. Base period = the
  // first ship month; for each later month t the index runs over the
  // COMMON part set (parts traded in both m0 and t). Laspeyres weights
  // by base quantities (Σp_t·q_0 / Σp_0·q_0), Paasche by current
  // (Σp_t·q_t / Σp_0·q_t), Fisher is their geometric mean.
  //
  // Scale: ONE corpus pass builds the (part, month) unit-price panel
  // (hash aggregate, map-side combinable); the base slice is
  // dimension-sized (≤ #parts) and BROADCAST to the panel join, and
  // every step after runs on the part×month grid — corpus size never
  // reappears. At 100 TB the panel aggregate is the only shuffle.
  //
  // Exactness: quantities and prices collapse to exact BIGINTs (qty
  // units, cents); each cross-period term (sc_t/sq_t)·sq_0 is a
  // fixed-order double over exact integers quantized to a 1e3 grid
  // pre-sum (house discipline: order-independent BIGINT sums), the
  // Laspeyres/Paasche denominators are exact cent sums by algebra
  // (Σ(sc_0/sq_0)·sq_0 = Σsc_0), Fisher is one correctly-rounded sqrt
  // of the two ratios' product, roundZ final.
  private val q302 = QueryDef(
    "q302_price_index",
    (s, d) => {
      val pm = li(s, d)
        .select(col("l_partkey").as("pk"),
          expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)")
            .as("ym"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          round(col("l_quantity")).cast("long").as("qty"))
        .groupBy(col("pk"), col("ym"))
        .agg(sum(col("cents")).as("sc"), sum(col("qty")).as("sq"))
      val m0 = pm.agg(min(col("ym")).as("m0"))
      val base = pm.crossJoin(broadcast(m0))
        .filter(col("ym") === col("m0"))
        .select(col("pk"), col("sc").as("sc0"), col("sq").as("sq0"))
      pm.join(broadcast(base), Seq("pk"))
        .groupBy(col("ym"))
        .agg(count(lit(1)).as("n_parts"),
          // Laspeyres numerator: Σ (p_t · q_0), 1e3-quantized pre-sum
          sum(round(col("sc").cast("double") / col("sq").cast("double")
            * col("sq0").cast("double") * lit(1e3)).cast("long")).as("ln"),
          sum(col("sc0")).as("ld"), // Σ p_0·q_0 = Σ sc_0 exactly
          sum(col("sc")).as("pn"), // Σ p_t·q_t = Σ sc_t exactly
          // Paasche denominator: Σ (p_0 · q_t), 1e3-quantized pre-sum
          sum(round(col("sc0").cast("double") / col("sq0").cast("double")
            * col("sq").cast("double") * lit(1e3)).cast("long")).as("pd"))
        .withColumn("lasp",
          col("ln").cast("double") / lit(1e3) / col("ld").cast("double"))
        .withColumn("paas",
          col("pn").cast("double") / (col("pd").cast("double") / lit(1e3)))
        .select(col("ym"), col("n_parts"),
          Num.roundZ(col("lasp"), 6).as("laspeyres"),
          Num.roundZ(col("paas"), 6).as("paasche"),
          Num.roundZ(sqrt(col("lasp") * col("paas")), 6).as("fisher"))
        .orderBy(col("ym"))
    },
    Some("""
      WITH pm AS (
        SELECT l_partkey AS pk,
               CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
                 AS ym,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS sc,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem GROUP BY 1, 2),
      base AS (
        SELECT pk, sc AS sc0, sq AS sq0 FROM pm
        WHERE ym = (SELECT min(ym) FROM pm)),
      agg AS (
        SELECT p.ym, count(*) AS n_parts,
               CAST(sum(CAST(round(CAST(p.sc AS DOUBLE)
                 / CAST(p.sq AS DOUBLE) * CAST(b.sq0 AS DOUBLE) * 1e3)
                 AS BIGINT)) AS BIGINT) AS ln,
               CAST(sum(b.sc0) AS BIGINT) AS ld,
               CAST(sum(p.sc) AS BIGINT) AS pn,
               CAST(sum(CAST(round(CAST(b.sc0 AS DOUBLE)
                 / CAST(b.sq0 AS DOUBLE) * CAST(p.sq AS DOUBLE) * 1e3)
                 AS BIGINT)) AS BIGINT) AS pd
        FROM pm p JOIN base b ON b.pk = p.pk
        GROUP BY 1)
      SELECT ym, n_parts,
             (CAST(round(CAST(ln AS DOUBLE) / 1e3 / CAST(ld AS DOUBLE)
               * 1e6) AS BIGINT) / 1e6) AS laspeyres,
             (CAST(round(CAST(pn AS DOUBLE) / (CAST(pd AS DOUBLE) / 1e3)
               * 1e6) AS BIGINT) / 1e6) AS paasche,
             (CAST(round(sqrt((CAST(ln AS DOUBLE) / 1e3
                 / CAST(ld AS DOUBLE))
               * (CAST(pn AS DOUBLE) / (CAST(pd AS DOUBLE) / 1e3)))
               * 1e6) AS BIGINT) / 1e6) AS fisher
      FROM agg
      ORDER BY ym"""))

  // --------------------------------------------------------------- q303
  // ABC / Pareto classification of parts by revenue ([EXT]) — the
  // inventory-management 80/15/5 cut: rank parts by net revenue, class
  // A = parts up to 80% cumulative revenue share, B = up to 95%, C =
  // the tail; report each class's size, revenue mass, and share. The
  // "which 20% of the catalog earns 80% of the money" report.
  //
  // Scale: ONE corpus pass collapses lineitem to per-part revenue (hash
  // aggregate); the ranked cumulative pass uses Scale.rangePrefixSum —
  // the part DOMAIN itself grows with the corpus (~10⁹ keys at true
  // 100 TB TPC-H grain), so unlike the value-grid windows elsewhere it
  // must NOT funnel through one task: range-partition on the rank order,
  // local prefix sums, partition-count-sized offset pass (r8 verdict
  // item 6; PlanSpec pins the no-dimension-through-one-task shape).
  //
  // Exactness: revenue is exact cents BIGINT (extendedprice·(1−disc)
  // is exact at 4 decimals); the class boundaries compare exact
  // integers (cum·5 ≤ tot·4, cum·20 ≤ tot·19) so no float threshold
  // exists anywhere; shares are single-rounded ratios of exact ints,
  // roundZ final. Ties in revenue are broken by partkey so the
  // cumulative order (hence classification) is fully deterministic.
  private val q303 = QueryDef(
    "q303_abc_pareto",
    (s, d) => {
      val rev = li(s, d)
        .select(col("l_partkey").as("pk"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long").as("cents"))
        .groupBy(col("pk")).agg(sum(col("cents")).as("rev"))
      val tot = rev.agg(sum(col("rev")).as("tot"))
      Scale.rangePrefixSum(rev, Seq(col("rev").desc, col("pk")),
          col("rev"), "cum")
        .crossJoin(broadcast(tot))
        .withColumn("cls",
          when(col("cum") * 5L <= col("tot") * 4L, "A")
            .when(col("cum") * 20L <= col("tot") * 19L, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev_cents"),
          max(col("tot")).as("tot"))
        .select(col("cls"), col("n_parts"), col("rev_cents"),
          Num.roundZ(col("rev_cents").cast("double")
            / col("tot").cast("double"), 6).as("rev_share"))
        .orderBy(col("cls"))
    },
    Some("""
      WITH rev AS (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                 * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem GROUP BY 1),
      ranked AS (
        SELECT pk, rev,
               CAST(sum(rev) OVER (ORDER BY rev DESC, pk
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
               CAST((SELECT sum(rev) FROM rev) AS BIGINT) AS tot
        FROM rev),
      cls AS (
        SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                    WHEN cum * 20 <= tot * 19 THEN 'B'
                    ELSE 'C' END AS cls,
               rev, tot
        FROM ranked)
      SELECT cls, count(*) AS n_parts, CAST(sum(rev) AS BIGINT) AS rev_cents,
             (CAST(round(CAST(sum(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE)
               * 1e6) AS BIGINT) / 1e6) AS rev_share
      FROM cls
      GROUP BY cls
      ORDER BY cls"""))

  // --------------------------------------------------------------- q305
  // Isotonic calibration via PAVA's minimax formula ([EXT]) — the
  // monotone-regression companion to q160's fixed-bin reliability
  // diagram: fit the best NON-DECREASING rate curve over score bins
  // (pool-adjacent-violators), the production recalibration step run on
  // a model's score→outcome table before serving. fit(i) =
  // max_{j≤i} min_{k≥i} rate(j..k) — the closed-form PAVA solution —
  // evaluated on the bin grid, so no sequential pooling loop exists.
  //
  // Scale: ONE corpus pass collapses orders to the ~20-row score-bin
  // grid; the minimax runs on the grid's j≤i≤k triples (B³ ≈ 8000
  // rows — constant in corpus size, broadcast joins). At 100 TB the
  // bin aggregate is the only corpus-scale stage.
  //
  // Exactness: segment rates are single correctly-rounded divisions of
  // exact BIGINT prefix-sum differences (identical doubles in both
  // engines), min/max over identical doubles are exact, roundZ final.
  // AnalyticsSpec pins monotonicity and the pooled-average property.
  private val q305 = QueryDef(
    "q305_isotonic_calibration",
    (s, d) => {
      val o = Tables.t(s, d, "orders").select(
        floor(col("o_totalprice") / 25000.0).cast("long").as("b"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val bins = o.groupBy(col("b"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val wb = Window.orderBy(col("b"))
      val pref = bins
        .withColumn("cn",
          sum(col("n")).over(wb.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cp",
          sum(col("pos")).over(wb.rowsBetween(Window.unboundedPreceding, 0)))
      val segs = pref.select(col("b").as("j"), col("n").as("nj"),
          col("pos").as("pj"), col("cn").as("cnj"), col("cp").as("cpj"))
        .join(pref.select(col("b").as("k"), col("cn").as("cnk"),
          col("cp").as("cpk")), col("j") <= col("k"))
        .select(col("j"), col("k"),
          ((col("cpk") - col("cpj") + col("pj")).cast("double") /
            (col("cnk") - col("cnj") + col("nj")).cast("double")).as("r"))
      val fit = bins.select(col("b").as("i"))
        .join(segs, col("j") <= col("i") && col("i") <= col("k"))
        .groupBy(col("i"), col("j")).agg(min(col("r")).as("mn"))
        .groupBy(col("i")).agg(max(col("mn")).as("iso"))
      bins.join(fit, col("b") === col("i"))
        .select(col("b").as("bin"), col("n"), col("pos"),
          Num.roundZ(col("pos").cast("double") / col("n").cast("double"), 6)
            .as("raw_rate"),
          Num.roundZ(col("iso"), 6).as("iso_rate"))
        .orderBy(col("bin"))
    },
    Some("""
      WITH o AS (
        SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS b,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      bins AS (
        SELECT b, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
        FROM o GROUP BY 1),
      pref AS (
        SELECT b, n, pos,
               CAST(sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cn,
               CAST(sum(pos) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cp
        FROM bins),
      segs AS (
        SELECT a.b AS j, z.b AS k,
               CAST(z.cp - a.cp + a.pos AS DOUBLE)
                 / CAST(z.cn - a.cn + a.n AS DOUBLE) AS r
        FROM pref a JOIN pref z ON a.b <= z.b),
      fit AS (
        SELECT i, max(mn) AS iso FROM (
          SELECT bi.b AS i, s.j, min(s.r) AS mn
          FROM bins bi JOIN segs s ON s.j <= bi.b AND bi.b <= s.k
          GROUP BY 1, 2)
        GROUP BY 1)
      SELECT b AS bin, n, pos,
             (CAST(round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6) AS raw_rate,
             (CAST(round(iso * 1e6) AS BIGINT) / 1e6) AS iso_rate
      FROM bins JOIN fit ON fit.i = bins.b
      ORDER BY bin"""))

  // --------------------------------------------------------------- q306
  // Watermark-lateness histogram ([EXT] streaming ops) — the
  // out-of-orderness audit a streaming engineer runs BEFORE choosing a
  // watermark delay for q85/q86's dedup/late-drop configs. The events
  // table is globally event-time-sorted (verified: zero native
  // disorder), so the audit models the canonical late-data source — a
  // BUFFER-AND-FLUSH cohort: odd-user devices sync at the top of the
  // next hour (arrival = ceil(ts, hour)), even users stream instantly
  // (arrival = ts). The watermark advances per arrival MICRO-BATCH
  // (one batch per arrival minute — Spark's actual per-batch watermark
  // semantics: events inside one batch are unordered), and an event's
  // lateness is watermark-at-arrival minus its event time. The
  // histogram's cumulative column reads off as "a W-minute watermark
  // delay keeps X% of events".
  //
  // Scale: ONE corpus hash aggregate collapses arrivals to the
  // arrival-minute grid (max event-ts per batch); the exclusive
  // running-max watermark runs on that GRID (time-span-sized, constant
  // in corpus density) and joins back BROADCAST on the minute key; the
  // histogram is a hash aggregate onto the ≤91-row minute-bucket grid.
  // Corpus size appears only in the two linear passes.
  //
  // Exactness: arrival/watermark/lateness are exact µs integer
  // arithmetic (integer DIV ceilings); shares are single-rounded
  // ratios of exact counts, roundZ final.
  private val q306 = QueryDef(
    "q306_watermark_lateness",
    (s, d) => {
      val e = ev(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("arr",
          when(col("user_id") % 2L === 1L,
            (expr("us DIV 3600000000") + 1L) * lit(3600000000L))
            .otherwise(col("us")))
        .withColumn("amin", expr("arr DIV 60000000"))
      val batches = e.groupBy(col("amin")).agg(max(col("us")).as("mx"))
      val wg = Window.orderBy(col("amin"))
      val wm = batches.withColumn("w",
        max(col("mx")).over(wg.rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("amin"), col("w"))
      val late = e.join(broadcast(wm), Seq("amin"))
        .withColumn("lus",
          greatest(coalesce(col("w") - col("us"), lit(0L)), lit(0L)))
        .select(least(expr("lus DIV 60000000"), lit(90L)).as("late_m"))
      val hist = late.groupBy(col("late_m")).agg(count(lit(1)).as("n"))
      val tot = hist.agg(sum(col("n")).as("nt"))
      val wh = Window.orderBy(col("late_m"))
      hist
        .withColumn("cum",
          sum(col("n")).over(wh.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(tot))
        .select(col("late_m"), col("n"),
          Num.roundZ(col("n").cast("double") / col("nt").cast("double"), 6)
            .as("share"),
          Num.roundZ(col("cum").cast("double") / col("nt").cast("double"), 6)
            .as("cum_share"))
        .orderBy(col("late_m"))
    },
    Some("""
      WITH e AS (
        SELECT epoch_us(ts) AS us,
               CASE WHEN user_id % 2 = 1
                 THEN (epoch_us(ts) // 3600000000 + 1) * 3600000000
                 ELSE epoch_us(ts) END AS arr
        FROM events),
      e2 AS (SELECT us, arr // 60000000 AS amin FROM e),
      wm AS (
        SELECT amin,
               max(mx) OVER (ORDER BY amin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS w
        FROM (SELECT amin, max(us) AS mx FROM e2 GROUP BY 1)),
      late AS (
        SELECT least(greatest(coalesce(w - us, 0), 0) // 60000000, 90)
                 AS late_m
        FROM e2 JOIN wm USING (amin)),
      hist AS (SELECT late_m, count(*) AS n FROM late GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM hist)
      SELECT late_m, n,
             (CAST(round(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6) AS share,
             (CAST(round(CAST(sum(n) OVER (ORDER BY late_m
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(nt AS DOUBLE) * 1e6) AS BIGINT) / 1e6) AS cum_share
      FROM hist, tot
      ORDER BY late_m"""))

  // --------------------------------------------------------------- q308
  // AMS (Alon–Matias–Szegedy) F₂ sketch with in-query ground truth
  // ([EXT] sketch family) — the second-moment estimator that completes
  // the sketch shelf (q38 HLL = F₀, q159 Count-Min = point counts,
  // q256 CM join-size): F₂ = Σ_k c_k² IS the self-join size, the
  // number a cost-based optimizer wants before planning a self-join.
  // Eight independent ±1 hash instances each accumulate Z = Σ sign(k);
  // E[Z²] = F₂, and the median of the eight Z² estimates is the
  // classic variance-bounded estimator — reported beside the exact F₂
  // so the query is its own accuracy gate.
  //
  // Scale: ONE corpus pass with ONE md5 per row — the 8 instance signs
  // are BIT-SLICED from the single 56-bit hash ((h>>i)&1), so the 8×
  // instance fan-out adds integer ops only, and the aggregate
  // collapses map-side to 8 groups (the sketch state is 8 integers —
  // THE point of AMS); the exact F₂ is a partkey-keyed hash aggregate
  // (dimension-sized). Both are single exchanges; the median runs on
  // the 8-row instance grid. (The first form hashed 8× per row and
  // measured 4.4 s at sf0.1; the bit-slice re-measurement is in the
  // BASELINE r8 close note.)
  //
  // Exactness: signs are md5-bit-derived integers (portable 56-bit
  // idiom), Z and Z² are exact BIGINTs, the median of 8 is
  // (e₄+e₅)/2.0 — a dyadic rational, exact in double; rel_err is a
  // single-rounded ratio, roundZ (it can be negative).
  private val q308 = QueryDef(
    "q308_ams_f2_sketch",
    (s, d) => {
      val keyed = li(s, d).select(col("l_partkey").as("k"))
      val zs = keyed
        .withColumn("h",
          conv(substring(md5(concat(lit("ams:"), col("k").cast("string"))),
            1, 14), 16, 10).cast("long"))
        .select(col("h"), explode(sequence(lit(0), lit(7))).as("i"))
        .groupBy(col("i"))
        .agg(sum(expr("((h >> i) & 1) * 2 - 1")).as("z"))
        .withColumn("est", col("z") * col("z"))
      val f2 = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("f2"), sum(col("c")).as("n"))
      val wE = Window.orderBy(col("est"), col("i"))
      zs.withColumn("rn", row_number().over(wE))
        .filter(col("rn") === 4 || col("rn") === 5)
        .agg(sum(col("est")).as("med2"))
        .crossJoin(broadcast(f2))
        .select(col("n").as("n_rows"), col("f2").as("f2_exact"),
          (col("med2").cast("double") / lit(2.0)).as("ams_est"),
          Num.roundZ((col("med2").cast("double") / lit(2.0)
            - col("f2").cast("double")) / col("f2").cast("double"), 6)
            .as("rel_err"))
    },
    Some("""
      WITH keyed AS (
        SELECT ('0x' || substr(md5('ams:' || CAST(l_partkey AS VARCHAR)),
          1, 14))::BIGINT AS h
        FROM lineitem),
      zs AS (
        SELECT i,
               CAST(sum(((h >> i) & 1) * 2 - 1) AS BIGINT) AS z
        FROM keyed CROSS JOIN range(0, 8) t(i)
        GROUP BY 1),
      ests AS (
        SELECT i, z * z AS est,
               row_number() OVER (ORDER BY z * z, i) AS rn
        FROM zs),
      med AS (
        SELECT CAST(sum(est) AS BIGINT) AS med2 FROM ests
        WHERE rn IN (4, 5)),
      f2 AS (
        SELECT CAST(sum(c * c) AS BIGINT) AS f2, CAST(sum(c) AS BIGINT) AS n
        FROM (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1))
      SELECT n AS n_rows, f2 AS f2_exact,
             CAST(med2 AS DOUBLE) / 2.0 AS ams_est,
             (CAST(round((CAST(med2 AS DOUBLE) / 2.0 - CAST(f2 AS DOUBLE))
               / CAST(f2 AS DOUBLE) * 1e6) AS BIGINT) / 1e6) AS rel_err
      FROM med, f2"""))

  // --------------------------------------------------------------- q309
  // KMV (k-minimum-values) distinct-count sketch with in-query ground
  // truth ([EXT] sketch family) — the OTHER mergeable F₀ estimator
  // beside q38's HLL: keep the k smallest hash values; the k-th
  // smallest h₍ₖ₎ of n uniform 56-bit hashes estimates n ≈
  // (k−1)·2⁵⁶/h₍ₖ₎. Mergeable by min-merging the k-sets, and unlike
  // HLL it supports set intersection estimates — reported per
  // event_type beside the exact distinct-hash count.
  //
  // Scale: the distinct-hash aggregate is the one corpus exchange; the
  // k-th order statistic is found WITHOUT a per-type global sort by
  // the q234 two-phase rank: 256 value-range buckets (hash-uniform ⇒
  // balanced) are counted on a grid, the cutoff bucket where the
  // cumulative count reaches k is grid-arithmetic, and the rank window
  // runs only over hashes at-or-below the cutoff bucket (≈ k + one
  // bucket's load, corpus-independent for fixed k). Fewer than k
  // distinct values ⇒ the sketch is exact by definition (est = count).
  //
  // Exactness: hashes are exact integers; 2⁵⁶ is exactly representable
  // in double; the estimate is one fixed-order double expression,
  // roundZ final.
  private val KmvK = 64L
  private val q309 = QueryDef(
    "q309_kmv_distinct",
    (s, d) => {
      val M = 72057594037927936.0 // 2^56
      val bw = 281474976710656L // 2^48: 256 buckets over the hash range
      val hs = ev(s, d)
        .select(col("event_type").as("et"),
          conv(substring(md5(concat(lit("kmv:"),
            col("user_id").cast("string"))), 1, 14), 16, 10)
            .cast("long").as("h"))
        .groupBy(col("et"), col("h")).agg(count(lit(1)).as("dup"))
        .withColumn("bkt", expr(s"h DIV ${bw}"))
      val grid = hs.groupBy(col("et"), col("bkt"))
        .agg(count(lit(1)).as("bn"))
      val wB = Window.partitionBy(col("et")).orderBy(col("bkt"))
      val cut = grid
        .withColumn("cum",
          sum(col("bn")).over(wB.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("et"))
        .agg(coalesce(min(when(col("cum") >= KmvK, col("bkt"))),
          max(col("bkt"))).as("cutoff"), sum(col("bn")).as("nd"))
      val wH = Window.partitionBy(col("et")).orderBy(col("h"))
      hs.join(broadcast(cut), Seq("et"))
        .filter(col("bkt") <= col("cutoff"))
        .withColumn("rn", row_number().over(wH))
        .groupBy(col("et"))
        .agg(max(col("nd")).as("n_distinct"),
          max(when(col("rn") === KmvK, col("h"))).as("kth_hash"))
        .select(col("et").as("event_type"), col("n_distinct"),
          col("kth_hash"),
          Num.roundZ(coalesce(
            lit((KmvK - 1).toDouble) * lit(M)
              / col("kth_hash").cast("double"),
            col("n_distinct").cast("double")), 6).as("kmv_est"))
        .orderBy(col("event_type"))
    },
    Some(s"""
      WITH hs AS (
        SELECT event_type AS et,
               ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                 1, 14))::BIGINT AS h
        FROM events
        GROUP BY 1, 2),
      ranked AS (
        SELECT et, h,
               row_number() OVER (PARTITION BY et ORDER BY h) AS rn,
               count(*) OVER (PARTITION BY et) AS nd
        FROM hs)
      SELECT et AS event_type, CAST(max(nd) AS BIGINT) AS n_distinct,
             CAST(max(CASE WHEN rn = ${KmvK} THEN h END) AS BIGINT)
               AS kth_hash,
             (CAST(round(coalesce(
                 CAST(${KmvK - 1} AS DOUBLE) * CAST(72057594037927936 AS DOUBLE)
                   / CAST(max(CASE WHEN rn = ${KmvK} THEN h END) AS DOUBLE),
                 CAST(max(nd) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6)
               AS kmv_est
      FROM ranked
      GROUP BY et
      ORDER BY et"""))

  // --------------------------------------------------------------- q311
  // Bradley–Terry preference strengths, two MM iterations ([EXT]) —
  // the pairwise-preference aggregation op (the batch form of Elo; the
  // model RLHF reward pipelines fit over A-vs-B comparisons). The
  // comparison data: within each (user, day), every pair of event
  // types the user performed is a "match" won by the type with the
  // higher max spend (ties by type name — deterministic). From uniform
  // strengths, the classic minorization–maximization update
  // wᵢ ← Wᵢ / Σⱼ nᵢⱼ/(wᵢ+wⱼ) runs twice: the first iteration is
  // exactly 2·Wᵢ/Nᵢ (rational), the second consumes the first's
  // strengths.
  //
  // Scale: the corpus collapses FIRST to the (user, day, type)
  // max-spend panel — users×days×(≤5 types) rows, dimension-bounded —
  // and the pair self-join runs panel-vs-panel with ≤ C(5,2) fan-out
  // per (user, day): at gate SFs Spark broadcasts one side (plan
  // audited), at cluster scale AQE plans an SMJ whose exchanges are
  // PANEL-sized, never event-sized. The panel aggregate is the only
  // corpus-scale stage (the two join branches re-run the same scan +
  // aggregate — predicate-identical, so a shared-scan rewrite or
  // storage cache collapses them; localCheckpoint is deliberately NOT
  // used because the panel outgrows single-node disk at 100 TB);
  // everything after lives on the 10-row unordered-pair grid and the
  // 5-row type grid.
  //
  // Exactness: spend maxima are exact cents; win/match counts are
  // exact BIGINTs; w¹ is a single division of exact ints; the w²
  // denominators Σⱼ nᵢⱼ/(w¹ᵢ+w¹ⱼ) quantize each term to a 1e9 grid
  // pre-sum (order-independent BIGINT sums), as does the final share
  // normalization; roundZ final.
  private val q311 = QueryDef(
    "q311_bradley_terry",
    (s, d) => {
      val panel = ev(s, d)
        .select(col("user_id").as("u"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
            " AS BIGINT)").as("day"),
          col("event_type").as("et"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("u"), col("day"), col("et"))
        .agg(max(col("cents")).as("mx"))
      val pairs = panel.as("a")
        .join(panel.as("b"),
          col("a.u") === col("b.u") && col("a.day") === col("b.day") &&
            col("a.et") < col("b.et"))
        .select(col("a.et").as("ea"), col("b.et").as("eb"),
          when(col("a.mx") > col("b.mx"), 1L).otherwise(0L).as("wa"))
      val grid = pairs.groupBy(col("ea"), col("eb"))
        .agg(count(lit(1)).as("n"), sum(col("wa")).as("wins_a"))
      // per-type totals: matches Ni and wins Wi (symmetrize the grid)
      val types = grid.select(col("ea").as("et"), col("n"),
          col("wins_a").as("w"))
        .unionByName(grid.select(col("eb").as("et"), col("n"),
          (col("n") - col("wins_a")).as("w")))
        .groupBy(col("et"))
        .agg(sum(col("n")).as("ni"), sum(col("w")).as("wi"))
        .withColumn("w1",
          lit(2.0) * col("wi").cast("double") / col("ni").cast("double"))
      // second MM iteration over the symmetrized pair grid
      val sym = grid.select(col("ea").as("et"), col("eb").as("ej"), col("n"))
        .unionByName(grid.select(col("eb").as("et"), col("ea").as("ej"),
          col("n")))
      val w1j = types.select(col("et").as("ej"), col("w1").as("w1j"))
      val den = sym.join(broadcast(types.select(col("et"), col("w1"))),
          Seq("et"))
        .join(broadcast(w1j), Seq("ej"))
        .groupBy(col("et"))
        .agg(sum(round(col("n").cast("double") / (col("w1") + col("w1j"))
          * lit(1e9)).cast("long")).as("dq"))
      val w2t = types.join(broadcast(den), Seq("et"))
        .withColumn("w2",
          col("wi").cast("double") / (col("dq").cast("double") / lit(1e9)))
      val tot = w2t.agg(sum(round(col("w2") * lit(1e9)).cast("long"))
        .as("sw"))
      w2t.crossJoin(broadcast(tot))
        .select(col("et").as("event_type"), col("ni").as("n_matches"),
          col("wi").as("n_wins"),
          Num.roundZ(col("w1"), 6).as("w1"),
          Num.roundZ(col("w2"), 6).as("w2"),
          Num.roundZ(col("w2") / (col("sw").cast("double") / lit(1e9)), 6)
            .as("share"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH panel AS (
        SELECT user_id AS u,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               event_type AS et,
               max(CAST(round(value * 100) AS BIGINT)) AS mx
        FROM events GROUP BY 1, 2, 3),
      pairs AS (
        SELECT a.et AS ea, b.et AS eb,
               CASE WHEN a.mx > b.mx THEN 1 ELSE 0 END AS wa
        FROM panel a JOIN panel b
          ON b.u = a.u AND b.day = a.day AND a.et < b.et),
      grid AS (
        SELECT ea, eb, count(*) AS n, CAST(sum(wa) AS BIGINT) AS wins_a
        FROM pairs GROUP BY 1, 2),
      types AS (
        SELECT et, CAST(sum(n) AS BIGINT) AS ni, CAST(sum(w) AS BIGINT)
                 AS wi,
               2.0 * CAST(sum(w) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS w1
        FROM (
          SELECT ea AS et, n, wins_a AS w FROM grid
          UNION ALL
          SELECT eb AS et, n, n - wins_a AS w FROM grid)
        GROUP BY 1),
      sym AS (
        SELECT ea AS et, eb AS ej, n FROM grid
        UNION ALL
        SELECT eb AS et, ea AS ej, n FROM grid),
      den AS (
        SELECT s.et,
               CAST(sum(CAST(round(CAST(s.n AS DOUBLE) / (ti.w1 + tj.w1)
                 * 1e9) AS BIGINT)) AS BIGINT) AS dq
        FROM sym s
        JOIN types ti ON ti.et = s.et
        JOIN types tj ON tj.et = s.ej
        GROUP BY 1),
      w2t AS (
        SELECT t.et, t.ni, t.wi, t.w1,
               CAST(t.wi AS DOUBLE) / (CAST(d.dq AS DOUBLE) / 1e9) AS w2
        FROM types t JOIN den d ON d.et = t.et),
      tot AS (
        SELECT CAST(sum(CAST(round(w2 * 1e9) AS BIGINT)) AS BIGINT) AS sw
        FROM w2t)
      SELECT et AS event_type, ni AS n_matches, wi AS n_wins,
             (CAST(round(w1 * 1e6) AS BIGINT) / 1e6) AS w1,
             (CAST(round(w2 * 1e6) AS BIGINT) / 1e6) AS w2,
             (CAST(round(w2 / (CAST(sw AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
               / 1e6) AS share
      FROM w2t, tot
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q332
  // New-vs-returning daily active users ([EXT] BI pack, beside q274's
  // rolling MAU and q126's cohort retention) — per day: DAU split into
  // first-ever-seen users (new) and returning, plus the cumulative
  // registered-user curve. The growth-accounting identity
  // dau = new + returning holds by construction and is visible in the
  // output.
  //
  // Scale: two hash aggregates — (user → first day) and (day, user) →
  // DAU — both map-side combinable; the cumulative pass runs on the
  // ~30-row day grid. No windows over the corpus.
  //
  // Exactness: pure exact counts; the returning share is one division,
  // roundZ final.
  private val q332 = QueryDef(
    "q332_new_vs_returning",
    (s, d) => {
      val days = ev(s, d).select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"))
      val dau = days.groupBy(col("day"), col("user_id")).agg(count(lit(1))
          .as("ne"))
        .groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val firstDay = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val wD = Window.orderBy(col("day"))
      dau.join(firstDay, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_users",
          sum(col("n_new")).over(wD.rowsBetween(Window.unboundedPreceding,
            0)))
        .select(col("day"), col("dau"), col("n_new"),
          (col("dau") - col("n_new")).as("n_returning"),
          col("cum_users"),
          Num.roundZ((col("dau") - col("n_new")).cast("double")
            / col("dau").cast("double"), 6).as("returning_share"))
        .orderBy(col("day"))
    },
    Some("""
      WITH days AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day
        FROM events),
      dau AS (
        SELECT day, count(*) AS dau FROM (
          SELECT DISTINCT day, user_id FROM days)
        GROUP BY 1),
      fd AS (
        SELECT day, count(*) AS n_new FROM (
          SELECT user_id, min(day) AS day FROM days GROUP BY 1)
        GROUP BY 1)
      SELECT d.day, d.dau, coalesce(f.n_new, 0) AS n_new,
             CAST(d.dau - coalesce(f.n_new, 0) AS BIGINT) AS n_returning,
             CAST(sum(coalesce(f.n_new, 0)) OVER (ORDER BY d.day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
             (CAST(round(CAST(d.dau - coalesce(f.n_new, 0) AS DOUBLE)
               / CAST(d.dau AS DOUBLE) * 1e6) AS BIGINT) / 1e6)
               AS returning_share
      FROM dau d LEFT JOIN fd f ON f.day = d.day
      ORDER BY d.day"""))

  // --------------------------------------------------------------- q330
  // Two-proportion z-test for conversion rates ([EXT]) — completes the
  // experimentation pack (q149 Welch t on means, q316 randomization,
  // q296 SPRT, q326 MDE): did arm B's view→purchase conversion differ
  // from arm A's? Arms are the q289-style deterministic md5 assignment
  // over user_id (a seeded A/A on this synthetic data — the expected
  // verdict is NOT significant, which is itself the sanity check);
  // z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) with the pooled p̂. The
  // conversion is HIGH-VALUE purchase (≥ $100): every user at these
  // SFs both views and purchases, so plain view→purchase is pp = 1
  // and the pooled variance is 0 — Spark 4's ANSI mode then throws
  // DIVIDE_BY_ZERO even for doubles (measured), so the degenerate-rate
  // guard is both statistical and mechanical; the division is ALSO
  // guarded symmetrically (when > 0 / NULLIF, q215's discipline).
  //
  // Scale: ONE user-keyed hash aggregate (two membership flags per
  // user, map-side combinable) then scalar math on four counts.
  //
  // Exactness: counts exact; rates and the pooled variance are
  // fixed-order doubles of exact ints; ONE sqrt; the significance
  // flag compares |z| to the same shared literal in both engines;
  // roundZ final.
  private val q330 = QueryDef(
    "q330_two_proportion_z",
    (s, d) => {
      val flags = ev(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("v"),
          max(when(col("event_type") === "purchase" &&
            col("value") >= 100.0, 1L).otherwise(0L)).as("p"))
        .filter(col("v") === 1L)
        .select((conv(substring(md5(concat(lit("arm:"),
          col("user_id").cast("string"))), 1, 14), 16, 10).cast("long")
          % 2L).as("arm"), col("p"))
      flags.agg(
          sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0L, col("p")).otherwise(0L)).as("x1"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1L, col("p")).otherwise(0L)).as("x2"))
        .withColumn("p1", col("x1").cast("double") / col("n1").cast("double"))
        .withColumn("p2", col("x2").cast("double") / col("n2").cast("double"))
        .withColumn("pp",
          (col("x1") + col("x2")).cast("double")
            / (col("n1") + col("n2")).cast("double"))
        .withColumn("den",
          sqrt(col("pp") * (lit(1.0) - col("pp"))
            * (lit(1.0) / col("n1").cast("double")
              + lit(1.0) / col("n2").cast("double"))))
        .withColumn("z",
          when(col("den") > 0.0, (col("p1") - col("p2")) / col("den")))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          Num.roundZ(col("p1"), 6).as("p1"),
          Num.roundZ(col("p2"), 6).as("p2"),
          Num.roundZ(col("z"), 6).as("z"),
          (abs(col("z")) > lit(1.959964)).as("significant"))
    },
    Some("""
      WITH flags AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
               max(CASE WHEN event_type = 'purchase' AND value >= 100.0
                 THEN 1 ELSE 0 END) AS p
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY 1),
      armed AS (
        SELECT ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)),
                 1, 14))::BIGINT % 2 AS arm, p
        FROM flags WHERE v = 1),
      agg AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN p ELSE 0 END) AS BIGINT)
                 AS x1,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n2,
               CAST(sum(CASE WHEN arm = 1 THEN p ELSE 0 END) AS BIGINT)
                 AS x2
        FROM armed),
      zc AS (
        SELECT n1, x1, n2, x2,
               CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
               CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
               CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS pp
        FROM agg),
      z AS (
        SELECT n1, x1, n2, x2, p1, p2,
               (p1 - p2) / NULLIF(sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))),
                 0) AS z
        FROM zc)
      SELECT n1, x1, n2, x2,
             (CAST(round(p1 * 1e6) AS BIGINT) / 1e6) AS p1,
             (CAST(round(p2 * 1e6) AS BIGINT) / 1e6) AS p2,
             (CAST(round(z * 1e6) AS BIGINT) / 1e6) AS z,
             abs(z) > 1.959964 AS significant
      FROM z"""))

  // --------------------------------------------------------------- q325
  // Decile gains/lift table ([EXT] model-eval pack) — the marketing
  // "gains chart" beside q102's AUC and q160's calibration: rank by
  // score (order value as the stand-in model score), cut into
  // equal-frequency deciles from the top, and report per-decile
  // positive capture and cumulative lift — "mailing the top 2 deciles
  // reaches X% of responders at Y× random".
  //
  // Scale: q160's grid binning — ONE corpus aggregate onto the $1000
  // score-value grid, the exclusive-prior cumulative runs on the GRID,
  // the decile id broadcasts back; no corpus sort anywhere (the
  // classic formulation sorts all N rows — this is the two-phase rank
  // discipline applied to gains charts).
  //
  // Exactness: all counts exact; deciles are integer arithmetic on
  // grid prefix sums; capture/lift are single divisions of exact ints,
  // roundZ final.
  private val q325 = QueryDef(
    "q325_decile_lift",
    (s, d) => {
      val o = Tables.t(s, d, "orders").select(
        floor(col("o_totalprice") / 1000.0).cast("long").as("gb"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val wCum = Window.orderBy(col("gb").desc)
      val grid = o.groupBy(col("gb")).agg(count(lit(1)).as("cnt"))
        .withColumn("cumb",
          coalesce(sum(col("cnt"))
            .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = o.agg(count(lit(1)).as("nt"), sum(col("y")).as("pt"))
      val dec = o.join(broadcast(grid.select(col("gb"), col("cumb"))),
          Seq("gb"))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("(10 * cumb) DIV nt"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
          max(col("nt")).as("nt"), max(col("pt")).as("pt"))
      val wD = Window.orderBy(col("decile"))
      dec
        .withColumn("cn",
          sum(col("n")).over(wD.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cp",
          sum(col("n_pos"))
            .over(wD.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("decile"), col("n"), col("n_pos"),
          Num.roundZ(col("cp").cast("double") / col("pt").cast("double"), 6)
            .as("capture"),
          Num.roundZ((col("n_pos") * col("nt")).cast("double")
            / (col("n") * col("pt")).cast("double"), 6).as("lift"),
          Num.roundZ((col("cp") * col("nt")).cast("double")
            / (col("cn") * col("pt")).cast("double"), 6).as("cum_lift"))
        .orderBy(col("decile"))
    },
    Some("""
      WITH o AS (
        SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS gb,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      grid AS (
        SELECT gb,
               coalesce(sum(count(*)) OVER (ORDER BY gb DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cumb
        FROM o GROUP BY gb),
      tot AS (SELECT count(*) AS nt, CAST(sum(y) AS BIGINT) AS pt FROM o),
      dec AS (
        SELECT CAST((10 * g.cumb) // t.nt AS BIGINT) AS decile,
               count(*) AS n, CAST(sum(o.y) AS BIGINT) AS n_pos,
               max(t.nt) AS nt, max(t.pt) AS pt
        FROM o JOIN grid g USING (gb) CROSS JOIN tot t
        GROUP BY 1),
      cum AS (
        SELECT decile, n, n_pos, nt, pt,
               CAST(sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cn,
               CAST(sum(n_pos) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
        FROM dec)
      SELECT decile, n, n_pos,
             (CAST(round(CAST(cp AS DOUBLE) / CAST(pt AS DOUBLE) * 1e6)
               AS BIGINT) / 1e6) AS capture,
             (CAST(round(CAST(n_pos * nt AS DOUBLE)
               / CAST(n * pt AS DOUBLE) * 1e6) AS BIGINT) / 1e6) AS lift,
             (CAST(round(CAST(cp * nt AS DOUBLE)
               / CAST(cn * pt AS DOUBLE) * 1e6) AS BIGINT) / 1e6)
               AS cum_lift
      FROM cum
      ORDER BY decile"""))

  // --------------------------------------------------------------- q326
  // Minimum detectable effect / power analysis ([EXT] experimentation
  // pack, beside q149's Welch test and q296's SPRT) — the question
  // asked BEFORE launching an A/B test: with this traffic and this
  // variance, what relative lift can a 50/50 split detect at α = 0.05
  // two-sided with 80% power? MDE = (z_{α/2}+z_β)·√(2σ²/n) per arm,
  // with the z constants as shared literals (1.959964, 0.841621).
  //
  // Scale: ONE map-side-combinable aggregate per event type (exact
  // cents moments); the formula is scalar math on the 5-row type grid.
  //
  // Exactness: moments are exact cent-scaled BIGINTs; the sample
  // variance is one fixed-order double expression; ONE sqrt; roundZ.
  private val q326 = QueryDef(
    "q326_mde_power",
    (s, d) => ev(s, d)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .withColumn("mean", col("sc").cast("double") / col("n").cast("double"))
      .withColumn("varr",
        (col("scc").cast("double")
          - col("n").cast("double") * col("mean") * col("mean"))
          / (col("n").cast("double") - lit(1.0)))
      .withColumn("narm", expr("n DIV 2"))
      .withColumn("mde_abs", // z_{α/2}+z_β as ONE shared literal: the
        // Scala-side SUM of two double literals need not equal the
        // SQL-parsed "2.801585" bit-for-bit (the q163 lesson); narm
        // guard (q215 class): a single-event type has no arm
        when(col("narm") > 0L, lit(2.801585)
          * sqrt(lit(2.0) * col("varr") / col("narm").cast("double"))))
      .select(col("event_type"), col("n"), col("narm").as("n_per_arm"),
        Num.roundZ(col("mean") / lit(100.0), 4).as("mean_dollars"),
        Num.roundZ(col("mde_abs") / lit(100.0), 4).as("mde_dollars"),
        Num.roundZ(when(col("mean") > 0.0, col("mde_abs") / col("mean")),
          6).as("mde_rel"))
      .orderBy(col("event_type")),
    Some("""
      WITH g AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS sc,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS scc
        FROM events GROUP BY 1),
      f AS (
        SELECT event_type, n, n // 2 AS narm,
               CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               (CAST(scc AS DOUBLE)
                 - CAST(n AS DOUBLE) * (CAST(sc AS DOUBLE) / CAST(n AS
                     DOUBLE)) * (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (CAST(n AS DOUBLE) - 1.0) AS varr
        FROM g),
      m AS (
        SELECT event_type, n, narm, mean,
               CASE WHEN narm > 0 THEN
                 2.801585 * sqrt(2.0 * varr / CAST(narm AS DOUBLE)) END
                 AS mde_abs
        FROM f)
      SELECT event_type, n, CAST(narm AS BIGINT) AS n_per_arm,
             (CAST(round(mean / 100.0 * 1e4) AS BIGINT) / 1e4)
               AS mean_dollars,
             (CAST(round(mde_abs / 100.0 * 1e4) AS BIGINT) / 1e4)
               AS mde_dollars,
             (CAST(round(mde_abs / NULLIF(mean, 0) * 1e6) AS BIGINT)
               / 1e6) AS mde_rel
      FROM m
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q323
  // Month-over-month and year-over-year growth ([EXT] BI pack, beside
  // q302's index numbers) — the first two numbers on any revenue
  // dashboard: monthly net revenue with lag-1 and lag-12 growth rates,
  // window-lagged on the MONTH GRID (≤ span months at any corpus
  // size; the corpus appears once in the panel aggregate).
  //
  // Exactness: revenue is exact cents; growth = rev/lag − 1 is one
  // division of exact integers (identical doubles both engines), NULL
  // where the lag month is absent — same three-valued arithmetic in
  // both engines. roundZ final (growth is signed).
  private val q323 = QueryDef(
    "q323_growth_mom_yoy",
    (s, d) => {
      val wm = Window.orderBy(col("ym"))
      li(s, d)
        .select(expr("CAST(year(l_shipdate) * 100 + month(l_shipdate)" +
          " AS BIGINT)").as("ym"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long").as("cents"))
        .groupBy(col("ym")).agg(sum(col("cents")).as("rev"))
        .withColumn("p1", lag(col("rev"), 1).over(wm))
        .withColumn("p12", lag(col("rev"), 12).over(wm))
        .select(col("ym"), col("rev").as("rev_cents"),
          Num.roundZ(col("rev").cast("double") / col("p1").cast("double")
            - lit(1.0), 6).as("mom"),
          Num.roundZ(col("rev").cast("double") / col("p12").cast("double")
            - lit(1.0), 6).as("yoy"))
        .orderBy(col("ym"))
    },
    Some("""
      WITH m AS (
        SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
                 AS ym,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                 * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem GROUP BY 1),
      lagged AS (
        SELECT ym, rev,
               lag(rev, 1) OVER (ORDER BY ym) AS p1,
               lag(rev, 12) OVER (ORDER BY ym) AS p12
        FROM m)
      SELECT ym, rev AS rev_cents,
             (CAST(round((CAST(rev AS DOUBLE) / CAST(p1 AS DOUBLE) - 1.0)
               * 1e6) AS BIGINT) / 1e6) AS mom,
             (CAST(round((CAST(rev AS DOUBLE) / CAST(p12 AS DOUBLE) - 1.0)
               * 1e6) AS BIGINT) / 1e6) AS yoy
      FROM lagged
      ORDER BY ym"""))

  // --------------------------------------------------------------- q324
  // Price–volume bridge (PVM waterfall) per brand, 1995 → 1996 ([EXT]
  // BI pack) — the finance decomposition of a revenue delta into WHY:
  // volume effect p₀·(q₁−q₀) (sold more units at old prices) and price
  // effect (p₁−p₀)·q₁ (new prices on new volume). With these two
  // definitions the bridge RECONCILES EXACTLY by algebra:
  // p₀(q₁−q₀) + (p₁−p₀)q₁ = r₁ − r₀ — no residual bucket — and the
  // output carries both sides so the reconciliation is visible
  // (within the 1e-3-cent term quantization).
  //
  // Scale: ONE corpus pass to the (brand, year) panel (hash agg after
  // a broadcast part-dim join); the bridge is brand-grid arithmetic.
  //
  // Exactness: quantities/revenues are exact BIGINTs; the two effects
  // are fixed-order doubles of exact ints quantized to a 1e3 grid at
  // the term level; roundZ final (all columns signed).
  private val q324 = QueryDef(
    "q324_pvm_bridge",
    (s, d) => {
      val panel = li(s, d)
        .filter(year(col("l_shipdate")).isin(1995, 1996))
        .join(broadcast(Tables.t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          (year(col("l_shipdate")) === 1996).cast("long").as("y"),
          round(col("l_quantity")).cast("long").as("qty"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * 100).cast("long").as("cents"))
        .groupBy(col("brand"), col("y"))
        .agg(sum(col("qty")).as("q"), sum(col("cents")).as("r"))
      val b = panel.filter(col("y") === 0L)
        .select(col("brand"), col("q").as("q0"), col("r").as("r0"))
        .join(panel.filter(col("y") === 1L)
          .select(col("brand"), col("q").as("q1"), col("r").as("r1")),
          Seq("brand"))
        .withColumn("p0", col("r0").cast("double") / col("q0").cast("double"))
        .withColumn("p1", col("r1").cast("double") / col("q1").cast("double"))
        .withColumn("vol6",
          round(col("p0") * (col("q1") - col("q0")).cast("double")
            * lit(1e3)).cast("long"))
        .withColumn("price6",
          round((col("p1") - col("p0")) * col("q1").cast("double")
            * lit(1e3)).cast("long"))
      b.select(col("brand"),
          col("q0"), col("q1"), (col("r1") - col("r0")).as("delta_cents"),
          Num.roundZ(col("vol6").cast("double") / lit(1e5), 2)
            .as("vol_eff_dollars"),
          Num.roundZ(col("price6").cast("double") / lit(1e5), 2)
            .as("price_eff_dollars"))
        .orderBy(col("brand"))
    },
    Some("""
      WITH panel AS (
        SELECT p.p_brand AS brand,
               CASE WHEN year(l.l_shipdate) = 1996 THEN 1 ELSE 0 END AS y,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
                 AS q,
               CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                 * 100) AS BIGINT)) AS BIGINT) AS r
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(l.l_shipdate) IN (1995, 1996)
        GROUP BY 1, 2),
      b AS (
        SELECT a.brand, a.q AS q0, a.r AS r0, z.q AS q1, z.r AS r1,
               CAST(a.r AS DOUBLE) / CAST(a.q AS DOUBLE) AS p0,
               CAST(z.r AS DOUBLE) / CAST(z.q AS DOUBLE) AS p1
        FROM panel a JOIN panel z ON z.brand = a.brand
        WHERE a.y = 0 AND z.y = 1)
      SELECT brand, q0, q1, CAST(r1 - r0 AS BIGINT) AS delta_cents,
             (CAST(round(CAST(round(p0 * CAST(q1 - q0 AS DOUBLE) * 1e3)
               AS BIGINT) / 1e5 * 1e2) AS BIGINT) / 1e2)
               AS vol_eff_dollars,
             (CAST(round(CAST(round((p1 - p0) * CAST(q1 AS DOUBLE) * 1e3)
               AS BIGINT) / 1e5 * 1e2) AS BIGINT) / 1e2)
               AS price_eff_dollars
      FROM b
      ORDER BY brand"""))

  // --------------------------------------------------------------- q319
  // Capture–recapture population estimate ([EXT]) — Lincoln–Petersen
  // and the bias-corrected Chapman estimator: treat the first and
  // second half-month of purchase activity as two "captures" of the
  // user population; the overlap m between the n₁ and n₂ captured sets
  // estimates the total active population N̂ = n₁·n₂/m even though no
  // single window sees it all. The estimator ecology/epidemiology uses
  // for hidden-population sizing; in a data platform it answers "how
  // many users exist given two partial snapshots" — reported beside
  // the true 30-day distinct count, so the query is its own accuracy
  // gate.
  //
  // Scale: ONE user-keyed hash aggregate (max of two membership flags
  // per user — map-side combinable) collapses the corpus; the
  // estimator is scalar arithmetic on four exact counts.
  //
  // Exactness: counts are exact BIGINTs; both estimates are
  // fixed-order ratios of exact integers, roundZ final.
  private val q319 = QueryDef(
    "q319_capture_recapture",
    (s, d) => {
      val flags = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"),
          when(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
            " AS BIGINT)") < 15L, 1L).otherwise(0L).as("w1"))
        .groupBy(col("user_id"))
        .agg(max(col("w1")).as("a"), max(lit(1L) - col("w1")).as("b"))
      flags.agg(
          sum(col("a")).as("n1"), sum(col("b")).as("n2"),
          sum(col("a") * col("b")).as("m"), count(lit(1)).as("n_true"))
        .select(col("n1"), col("n2"), col("m"), col("n_true"),
          // zero-overlap guard (q215 class): disjoint captures leave
          // LP undefined — NULL in both engines (Chapman stays finite)
          Num.roundZ(when(col("m") > 0L,
            (col("n1") * col("n2")).cast("double")
              / col("m").cast("double")), 6).as("lincoln_petersen"),
          Num.roundZ(((col("n1") + 1L) * (col("n2") + 1L)).cast("double")
            / (col("m") + 1L).cast("double") - lit(1.0), 6).as("chapman"))
    },
    Some("""
      WITH flags AS (
        SELECT user_id,
               max(CASE WHEN date_diff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) < 15 THEN 1 ELSE 0 END) AS a,
               max(CASE WHEN date_diff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) < 15 THEN 0 ELSE 1 END) AS b
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1)
      SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
             CAST(sum(a * b) AS BIGINT) AS m, count(*) AS n_true,
             (CAST(round(CAST(sum(a) * sum(b) AS DOUBLE)
               / CAST(NULLIF(sum(a * b), 0) AS DOUBLE) * 1e6) AS BIGINT)
               / 1e6) AS lincoln_petersen,
             (CAST(round((CAST((sum(a) + 1) * (sum(b) + 1) AS DOUBLE)
               / CAST(sum(a * b) + 1 AS DOUBLE) - 1.0) * 1e6) AS BIGINT)
               / 1e6) AS chapman
      FROM flags"""))

  // --------------------------------------------------------------- q314
  // Kendall τ-b rank correlation ([EXT]) — completes the correlation
  // trio (q55 Pearson = linear, q242 Spearman = monotone-by-ranks,
  // Kendall = pairwise concordance with tie correction) on the daily
  // view-vs-purchase revenue panel. τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)) over
  // all day pairs; the τ-b tie terms make it exact on cents data.
  //
  // Scale: the corpus collapses FIRST to the ~30-row day grid (one
  // hash aggregate); the pairwise concordance scan is grid² (≤ 435
  // pairs) — constant in corpus size. The day-grid self-join is the
  // definition-form; at any corpus scale the grid side stays
  // time-span-sized.
  //
  // Exactness: all pair counts are exact BIGINTs from exact-cents
  // comparisons; the denominator is ONE correctly-rounded sqrt of an
  // exact integer product, roundZ final (τ can be negative).
  private val q314 = QueryDef(
    "q314_kendall_tau",
    (s, d) => {
      def series(t: String, nm: String) = ev(s, d)
        .filter(col("event_type") === t)
        .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("day")).agg(sum(col("c")).as(nm))
      val g = series("view", "x").join(series("purchase", "y"), Seq("day"))
      val pairs = g.toDF("di", "xi", "yi")
        .join(g.toDF("dj", "xj", "yj"), col("di") < col("dj"))
      pairs.agg(
          count(lit(1)).as("n0"),
          sum(when((col("xi") < col("xj") && col("yi") < col("yj")) ||
            (col("xi") > col("xj") && col("yi") > col("yj")), 1L)
            .otherwise(0L)).as("nc"),
          sum(when(col("xi") =!= col("xj") && col("yi") =!= col("yj") &&
            !((col("xi") < col("xj") && col("yi") < col("yj")) ||
              (col("xi") > col("xj") && col("yi") > col("yj"))), 1L)
            .otherwise(0L)).as("nd"),
          sum(when(col("xi") === col("xj"), 1L).otherwise(0L)).as("tx"),
          sum(when(col("yi") === col("yj"), 1L).otherwise(0L)).as("ty"))
        .select(col("n0").as("n_pairs"), col("nc"), col("nd"),
          Num.roundZ((col("nc") - col("nd")).cast("double")
            / sqrt(((col("n0") - col("tx")) * (col("n0") - col("ty")))
              .cast("double")), 6).as("tau_b"))
    },
    Some("""
      WITH dx AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'view' GROUP BY 1),
      dy AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      g AS (SELECT dx.day, x, y FROM dx JOIN dy USING (day)),
      agg AS (
        SELECT count(*) AS n0,
               CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                   OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END)
                 AS BIGINT) AS nc,
               CAST(sum(CASE WHEN a.x <> b.x AND a.y <> b.y
                   AND NOT ((a.x < b.x AND a.y < b.y)
                     OR (a.x > b.x AND a.y > b.y)) THEN 1 ELSE 0 END)
                 AS BIGINT) AS nd,
               CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
                 AS tx,
               CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
                 AS ty
        FROM g a JOIN g b ON a.day < b.day)
      SELECT n0 AS n_pairs, nc, nd,
             (CAST(round(CAST(nc - nd AS DOUBLE)
               / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)) * 1e6)
               AS BIGINT) / 1e6) AS tau_b
      FROM agg"""))

  // --------------------------------------------------------------- q315
  // Theil–Sen robust slope ([EXT]) — the MAGNITUDE companion to q221's
  // Mann–Kendall direction test (the classic pairing): the median of
  // all pairwise slopes of the daily purchase-revenue series, immune
  // to ~29% outlier days where the OLS slope (reported beside it) is
  // not. The robust trend line a capacity-planning dashboard fits.
  //
  // Scale: corpus → 30-row day grid (one hash aggregate); the slope
  // pairs are grid² (≤ 435 rows) and the median is a grid-window
  // rank — all constant in corpus size.
  //
  // Exactness: slopes are single divisions of exact integers
  // (identical doubles cross-engine; ordering ties broken by day
  // pair); the even-count median averages two identical doubles
  // (exact halving); the OLS slope is a ratio of exact integer
  // moments; roundZ final.
  private val q315 = QueryDef(
    "q315_theil_sen",
    (s, d) => {
      val g = ev(s, d).filter(col("event_type") === "purchase")
        .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("day")).agg(sum(col("c")).as("y"))
      val slopes = g.toDF("di", "yi").join(g.toDF("dj", "yj"),
          col("di") < col("dj"))
        .select(col("di"), col("dj"),
          ((col("yj") - col("yi")).cast("double")
            / (col("dj") - col("di")).cast("double")).as("sl"))
      val wS = Window.orderBy(col("sl"), col("di"), col("dj"))
      val np = slopes.agg(count(lit(1)).as("np"))
      val med = slopes
        .withColumn("rn", row_number().over(wS))
        .crossJoin(broadcast(np))
        .filter(col("rn") * 2L === col("np") ||
          col("rn") * 2L === col("np") + 1L ||
          col("rn") * 2L === col("np") + 2L)
        .agg((sum(col("sl")) / count(lit(1)).cast("double")).as("ts_slope"),
          max(col("np")).as("n_pairs"))
      val ols = g.agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
          sum(col("y")).as("sy"), sum(col("day") * col("day")).as("sxx"),
          sum(col("day") * col("y")).as("sxy"))
        .select(col("n").as("n_days"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")).as("ols_slope"))
      med.crossJoin(broadcast(ols))
        .select(col("n_days"), col("n_pairs"),
          Num.roundZ(col("ts_slope"), 4).as("ts_slope"),
          Num.roundZ(col("ols_slope"), 4).as("ols_slope"))
    },
    Some("""
      WITH g AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      slopes AS (
        SELECT a.day AS di, b.day AS dj,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
                 AS sl
        FROM g a JOIN g b ON a.day < b.day),
      ranked AS (
        SELECT sl, row_number() OVER (ORDER BY sl, di, dj) AS rn,
               count(*) OVER () AS np
        FROM slopes),
      med AS (
        SELECT sum(sl) / CAST(count(*) AS DOUBLE) AS ts_slope,
               CAST(max(np) AS BIGINT) AS n_pairs
        FROM ranked
        WHERE rn * 2 = np OR rn * 2 = np + 1 OR rn * 2 = np + 2),
      ols AS (
        SELECT count(*) AS n_days,
               CAST(count(*) * sum(day * y) - sum(day) * sum(y) AS DOUBLE)
                 / CAST(count(*) * sum(day * day) - sum(day) * sum(day)
                   AS DOUBLE) AS ols_slope
        FROM g)
      SELECT n_days, n_pairs,
             (CAST(round(ts_slope * 1e4) AS BIGINT) / 1e4) AS ts_slope,
             (CAST(round(ols_slope * 1e4) AS BIGINT) / 1e4) AS ols_slope
      FROM med, ols"""))

  // --------------------------------------------------------------- q316
  // Randomization (permutation) test for a mean difference ([EXT]) —
  // the EXACT-null nonparametric companion to q149's Welch t: is the
  // weekday/weekend purchase-value gap explainable by chance? B = 200
  // deterministic md5-seeded relabelings (random-reassignment null,
  // the standard large-sample surrogate for exact label permutation —
  // documented) recompute the mean difference, and the p-value is the
  // rank of the observed |gap| among them, (1 + #{|T_b| ≥ |T_obs|}) /
  // (1 + B).
  //
  // Scale: the B× fan-out collapses MAP-SIDE to B groups (the
  // permutation state is 4 integers per replicate — the whole point);
  // one corpus pass with in-partition combine, then the comparison
  // runs on the 200-row replicate grid. No resample materializes.
  // Hash cost is FOUR md5 calls per row, not B: each replicate's
  // group bit is BIT-SLICED from one of four 56-bit hashes
  // (4·56 = 224 ≥ B bits — the first form hashed B× per row and
  // measured 4.0 s at sf0.1; see the BASELINE r8 close note).
  //
  // Exactness: group sums/counts are exact cents BIGINTs per
  // replicate; each mean difference is the same fixed-order double
  // expression; the |T_b| ≥ |T_obs| comparisons are over identical
  // doubles, so the counted rank is exact; p is a ratio of exact
  // small integers, roundZ final.
  private val q316 = QueryDef(
    "q316_permutation_test",
    (s, d) => {
      val base = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"),
          when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L).as("we"),
          round(col("value") * 100).cast("long").as("c"))
      val obs = base.agg(
          sum(when(col("we") === 1L, col("c"))).as("s1"),
          sum(when(col("we") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("we") === 0L, col("c"))).as("s0"),
          sum(when(col("we") === 0L, 1L).otherwise(0L)).as("n0"))
        .select(col("n1"), col("n0"),
          (col("s1").cast("double") / col("n1").cast("double")
            - col("s0").cast("double") / col("n0").cast("double"))
            .as("t_obs"))
      def h(j: Int) =
        conv(substring(md5(concat(lit(s"perm$j:"),
          col("event_id").cast("string"))), 1, 14), 16, 10)
          .cast("long").as(s"h$j")
      val perms = base
        .select(col("c"), array(h(0), h(1), h(2), h(3)).as("hs"))
        .select(col("c"), col("hs"),
          explode(sequence(lit(1), lit(200))).as("b"))
        .withColumn("g",
          expr("(element_at(hs, CAST((b - 1) DIV 56 AS INT) + 1)" +
            " >> CAST((b - 1) % 56 AS INT)) & 1"))
      val reps = perms.groupBy(col("b"))
        .agg(sum(when(col("g") === 1L, col("c"))).as("s1"),
          sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === 0L, col("c"))).as("s0"),
          sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n0"))
        .select(col("b"),
          (col("s1").cast("double") / col("n1").cast("double")
            - col("s0").cast("double") / col("n0").cast("double"))
            .as("t_b"))
      reps.crossJoin(broadcast(obs))
        .agg(max(col("n1")).as("n_weekend"), max(col("n0")).as("n_weekday"),
          max(col("t_obs")).as("t_obs"),
          sum(when(abs(col("t_b")) >= abs(col("t_obs")), 1L).otherwise(0L))
            .as("n_extreme"))
        .select(col("n_weekend"), col("n_weekday"),
          Num.roundZ(col("t_obs") / lit(100.0), 6).as("t_obs_dollars"),
          col("n_extreme"),
          Num.roundZ((col("n_extreme") + 1L).cast("double") / lit(201.0), 6)
            .as("p_value"))
    },
    Some("""
      WITH base AS (
        SELECT event_id,
               CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                 THEN 1 ELSE 0 END AS we,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'),
      obs AS (
        SELECT CAST(sum(we) AS BIGINT) AS n1,
               CAST(sum(1 - we) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN we = 1 THEN c END) AS DOUBLE)
                   / CAST(sum(we) AS DOUBLE)
                 - CAST(sum(CASE WHEN we = 0 THEN c END) AS DOUBLE)
                   / CAST(sum(1 - we) AS DOUBLE) AS t_obs
        FROM base),
      hashed AS (
        SELECT c,
               [('0x' || substr(md5('perm0:' || CAST(event_id AS VARCHAR)),
                  1, 14))::BIGINT,
                ('0x' || substr(md5('perm1:' || CAST(event_id AS VARCHAR)),
                  1, 14))::BIGINT,
                ('0x' || substr(md5('perm2:' || CAST(event_id AS VARCHAR)),
                  1, 14))::BIGINT,
                ('0x' || substr(md5('perm3:' || CAST(event_id AS VARCHAR)),
                  1, 14))::BIGINT] AS hs
        FROM base),
      perms AS (
        SELECT t.b, hashed.c,
               (hs[CAST((t.b - 1) // 56 AS INTEGER) + 1]
                 >> CAST((t.b - 1) % 56 AS INTEGER)) & 1 AS g
        FROM hashed CROSS JOIN range(1, 201) t(b)),
      reps AS (
        SELECT b,
               CAST(sum(CASE WHEN g = 1 THEN c END) AS DOUBLE)
                   / CAST(sum(g) AS DOUBLE)
                 - CAST(sum(CASE WHEN g = 0 THEN c END) AS DOUBLE)
                   / CAST(sum(1 - g) AS DOUBLE) AS t_b
        FROM perms GROUP BY 1)
      SELECT o.n1 AS n_weekend, o.n0 AS n_weekday,
             (CAST(round(o.t_obs / 100.0 * 1e6) AS BIGINT) / 1e6)
               AS t_obs_dollars,
             CAST(sum(CASE WHEN abs(r.t_b) >= abs(o.t_obs) THEN 1 ELSE 0
               END) AS BIGINT) AS n_extreme,
             (CAST(round(CAST(sum(CASE WHEN abs(r.t_b) >= abs(o.t_obs)
                 THEN 1 ELSE 0 END) + 1 AS DOUBLE) / 201.0 * 1e6)
               AS BIGINT) / 1e6) AS p_value
      FROM reps r CROSS JOIN obs o
      GROUP BY o.n1, o.n0, o.t_obs"""))

  // --------------------------------------------------------------- q313
  // Label-propagation community detection, 3 synchronous rounds ([EXT]
  // graph family) — the community operator beside q35/q99's
  // connectivity (components answer "reachable?", LPA answers "densely
  // tied?"). The raw brand co-purchase graph is near-complete and
  // near-uniform (LPA on it collapses to one community — measured), so
  // the graph is built the way production co-purchase graphs are: each
  // brand keeps its k = 3 STRONGEST-LIFT neighbors (lift = q223's
  // nab·N/(na·nb), ties by neighbor id) — the k-NN association graph.
  // Every node starts as its own label; each round adopts the
  // co-occurrence-weighted MODE of its neighbors' labels (ties to the
  // smallest label — fully deterministic synchronous LPA).
  //
  // Scale: ONE corpus pass builds baskets and the pair aggregate
  // (q223's bounded within-basket fan-out); the graph is the
  // brand-domain grid (≤ B² candidates, B = |brands|; the k-NN window
  // partitions by node over ≤ B−1 rows) and each round is grid-join +
  // packed-argmax hash agg — plan size is 3 fixed rounds, corpus
  // appears only in the first aggregate. The same shape runs on a
  // billion-edge graph: rounds are join+agg on (node, label), never
  // driver-side.
  //
  // Exactness: lift ranking divides exact integer products (identical
  // doubles both engines, id tie-break); everything after is exact
  // integer arithmetic — weights are counts, the mode is a packed max
  // (weight·1024 + (1023 − label), labels < 1024), community sizes are
  // counts.
  /** q313/q321 shared: the 3-NN strongest-lift brand co-purchase graph
    * (directed, w = co-occurrence count), checkpointed once.
    */
  private def knnLiftEdges(s: SparkSession, d: String): DataFrame = {
    val baskets = li(s, d)
      .join(Tables.t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"),
        expr("CAST(substring(p_brand, 7) AS BIGINT)").as("item"))
      .distinct()
    val nOrders = baskets.select(col("ok")).distinct()
      .agg(count(lit(1)).as("nn"))
    val itemN = baskets.groupBy(col("item")).agg(count(lit(1)).as("ni"))
    val pairN = baskets.toDF("ok", "a")
      .join(baskets.toDF("ok", "b"), Seq("ok"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("nab"))
    val wk = Window.partitionBy(col("a"))
      .orderBy(col("lift").desc, col("b"))
    pairN
      .join(itemN.toDF("a", "na"), "a")
      .join(itemN.toDF("b", "nb"), "b")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift", (col("nab") * col("nn")).cast("double")
        / (col("na") * col("nb")).cast("double"))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= 3)
      .select(col("a"), col("b"), col("nab").as("w"))
      .localCheckpoint()
  }

  /** q313/q321 shared: 3 synchronous LPA rounds over [[knnLiftEdges]]. */
  private def lpaLabels(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("a").as("node")).distinct()
    def prop(lbls: DataFrame): DataFrame = {
      val voted = edges
        .join(lbls.toDF("b", "nlbl"), Seq("b"))
        .groupBy(col("a"), col("nlbl")).agg(sum(col("w")).as("sw"))
        .groupBy(col("a"))
        .agg((lit(1023L) - max(col("sw") * 1024L + (lit(1023L)
          - col("nlbl"))) % 1024L).as("plbl"))
      nodes.join(voted.toDF("node", "plbl"), Seq("node"), "left")
        .join(lbls, Seq("node"))
        .select(col("node"), coalesce(col("plbl"), col("lbl")).as("lbl"))
    }
    val l0 = nodes.select(col("node"), col("node").as("lbl"))
    prop(prop(prop(l0)))
  }

  private val q313 = QueryDef(
    "q313_label_propagation",
    (s, d) => {
      val l3 = lpaLabels(knnLiftEdges(s, d))
      val sizes = l3.groupBy(col("lbl")).agg(count(lit(1)).as("comm_size"))
      l3.join(sizes, Seq("lbl"))
        .select(col("node").as("brand_id"), col("lbl").as("community"),
          col("comm_size"))
        .orderBy(col("brand_id"))
    },
    Some(s"""
      WITH $knnLpaSql,
      sizes AS (SELECT lbl, count(*) AS comm_size FROM l3 GROUP BY 1)
      SELECT l3.node AS brand_id, l3.lbl AS community,
             sizes.comm_size
      FROM l3 JOIN sizes ON sizes.lbl = l3.lbl
      ORDER BY brand_id"""))

  /** q313/q321 shared oracle CTE chain: 3-NN lift graph + 3 LPA rounds.
    * (lazy: referenced from q313's eager QueryDef above its declaration.)
    */
  /** q313/q321/q351 shared oracle prefix: the 3-NN strongest-lift brand
    * co-purchase edge list alone. */
  private lazy val knnEdgesSql = """baskets AS (
        SELECT DISTINCT l.l_orderkey AS ok,
               CAST(substr(p.p_brand, 7) AS BIGINT) AS item
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      n AS (SELECT count(DISTINCT ok) AS nn FROM baskets),
      itemn AS (SELECT item, count(*) AS ni FROM baskets GROUP BY 1),
      pairn AS (
        SELECT a.item AS a, b.item AS b, count(*) AS nab
        FROM baskets a JOIN baskets b ON b.ok = a.ok AND a.item <> b.item
        GROUP BY 1, 2),
      edges AS MATERIALIZED (
        SELECT a, b, nab AS w FROM (
          SELECT p.a, p.b, p.nab,
                 row_number() OVER (PARTITION BY p.a
                   ORDER BY CAST(p.nab * n.nn AS DOUBLE)
                     / CAST(ia.ni * ib.ni AS DOUBLE) DESC, p.b) AS rn
          FROM pairn p
          JOIN itemn ia ON ia.item = p.a
          JOIN itemn ib ON ib.item = p.b, n) t
        WHERE rn <= 3)"""

  private lazy val knnLpaSql = s"""$knnEdgesSql,
      nodes AS (SELECT DISTINCT a AS node FROM edges),
      l0 AS (SELECT node, node AS lbl FROM nodes),
      v1 AS MATERIALIZED (
        SELECT e.a AS node,
               1023 - max(sw * 1024 + (1023 - nlbl)) % 1024 AS plbl
        FROM (
          SELECT e.a, l.lbl AS nlbl, CAST(sum(e.w) AS BIGINT) AS sw
          FROM edges e JOIN l0 l ON l.node = e.b GROUP BY 1, 2) e
        GROUP BY 1),
      l1 AS MATERIALIZED (
        SELECT n.node, coalesce(v1.plbl, l0.lbl) AS lbl
        FROM nodes n LEFT JOIN v1 ON v1.node = n.node
        JOIN l0 ON l0.node = n.node),
      v2 AS MATERIALIZED (
        SELECT e.a AS node,
               1023 - max(sw * 1024 + (1023 - nlbl)) % 1024 AS plbl
        FROM (
          SELECT e.a, l.lbl AS nlbl, CAST(sum(e.w) AS BIGINT) AS sw
          FROM edges e JOIN l1 l ON l.node = e.b GROUP BY 1, 2) e
        GROUP BY 1),
      l2 AS MATERIALIZED (
        SELECT n.node, coalesce(v2.plbl, l1.lbl) AS lbl
        FROM nodes n LEFT JOIN v2 ON v2.node = n.node
        JOIN l1 ON l1.node = n.node),
      v3 AS MATERIALIZED (
        SELECT e.a AS node,
               1023 - max(sw * 1024 + (1023 - nlbl)) % 1024 AS plbl
        FROM (
          SELECT e.a, l.lbl AS nlbl, CAST(sum(e.w) AS BIGINT) AS sw
          FROM edges e JOIN l2 l ON l.node = e.b GROUP BY 1, 2) e
        GROUP BY 1),
      l3 AS MATERIALIZED (
        SELECT n.node, coalesce(v3.plbl, l2.lbl) AS lbl
        FROM nodes n LEFT JOIN v3 ON v3.node = n.node
        JOIN l2 ON l2.node = n.node)"""

  // --------------------------------------------------------------- q321
  // k-NN graph health metrics ([EXT] graph family capstone) — the two
  // numbers read before TRUSTING q313's communities: degree
  // ASSORTATIVITY (Pearson correlation of endpoint degrees over the
  // symmetrized edge list — positive = hubs link hubs) and Newman
  // MODULARITY of the LPA partition (Q = Σ_c [m_c/m − (D_c/2m)²] —
  // near 0 = the partition explains no more edge mass than chance, the
  // "are these communities real" gate). Same graph, same labels as
  // q313, plus the undirected projection both metrics are defined on.
  //
  // Scale: identical to q313 — one corpus pair-gen pass, then
  // everything on the brand-domain grid (undirected edges ≤ B·k,
  // degree/community reductions grid-sized).
  //
  // Exactness: degrees, edge counts and community masses are exact
  // BIGINTs; assortativity is exact integer moments with ONE
  // correctly-rounded sqrt of their product (q301's discipline);
  // modularity is the exact integer Σ_c(4·m·m_c − D_c²) over 4m²,
  // one division; roundZ final (both can be negative).
  private val q321 = QueryDef(
    "q321_knn_graph_metrics",
    (s, d) => {
      val edges = knnLiftEdges(s, d)
      val und = edges
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
      val deg = und.select(col("u").as("node"))
        .unionByName(und.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val dirSym = und.select(col("u").as("x"), col("v").as("y"))
        .unionByName(und.select(col("v").as("x"), col("u").as("y")))
      val mom = dirSym
        .join(deg.toDF("x", "dx"), Seq("x"))
        .join(deg.toDF("y", "dy"), Seq("y"))
        .agg(count(lit(1)).as("me"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"),
          sum(col("dx") * col("dy")).as("sxy"))
        .select(col("me"),
          ((col("me") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt(((col("me") * col("sxx") - col("sx") * col("sx"))
              * (col("me") * col("syy") - col("sy") * col("sy")))
              .cast("double"))).as("assort"))
      val l3 = lpaLabels(edges)
      val m = und.agg(count(lit(1)).as("m"))
      val mc = und
        .join(l3.toDF("u", "lu"), Seq("u"))
        .join(l3.toDF("v", "lv"), Seq("v"))
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("lbl")).agg(count(lit(1)).as("mc"))
      val dc = l3.join(deg, Seq("node"))
        .groupBy(col("lbl")).agg(sum(col("deg")).as("dcsum"))
      val qmod = dc.join(mc, Seq("lbl"), "left")
        .withColumn("mc0", coalesce(col("mc"), lit(0L)))
        .crossJoin(broadcast(m))
        .agg(count(lit(1)).as("n_comm"),
          sum(lit(4L) * col("m") * col("mc0")
            - col("dcsum") * col("dcsum")).as("qn"),
          max(col("m")).as("mm"))
      val nn = l3.agg(count(lit(1)).as("n_nodes"))
      qmod.crossJoin(broadcast(mom)).crossJoin(broadcast(nn))
        .select(col("n_nodes"), col("mm").as("n_und_edges"), col("n_comm"),
          Num.roundZ(col("assort"), 6).as("assortativity"),
          Num.roundZ(col("qn").cast("double")
            / (lit(4L) * col("mm") * col("mm")).cast("double"), 6)
            .as("modularity"))
    },
    Some(s"""
      WITH $knnLpaSql,
      und AS (
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM edges),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        GROUP BY 1),
      dirsym AS (
        SELECT u AS x, v AS y FROM und
        UNION ALL SELECT v AS x, u AS y FROM und),
      mom AS (
        SELECT count(*) AS me,
               CAST(sum(dx.deg) AS BIGINT) AS sx,
               CAST(sum(dy.deg) AS BIGINT) AS sy,
               CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx,
               CAST(sum(dy.deg * dy.deg) AS BIGINT) AS syy,
               CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy
        FROM dirsym
        JOIN deg dx ON dx.node = dirsym.x
        JOIN deg dy ON dy.node = dirsym.y),
      m AS (SELECT count(*) AS m FROM und),
      mc AS (
        SELECT lu.lbl, count(*) AS mc
        FROM und
        JOIN l3 lu ON lu.node = und.u
        JOIN l3 lv ON lv.node = und.v
        WHERE lu.lbl = lv.lbl
        GROUP BY 1),
      dc AS (
        SELECT l3.lbl, CAST(sum(deg.deg) AS BIGINT) AS dcsum
        FROM l3 JOIN deg ON deg.node = l3.node
        GROUP BY 1),
      qmod AS (
        SELECT count(*) AS n_comm,
               CAST(sum(4 * m.m * coalesce(mc.mc, 0)
                 - dc.dcsum * dc.dcsum) AS BIGINT) AS qn,
               CAST(max(m.m) AS BIGINT) AS mm
        FROM dc LEFT JOIN mc ON mc.lbl = dc.lbl, m),
      nn AS (SELECT count(*) AS n_nodes FROM l3)
      SELECT nn.n_nodes, qmod.mm AS n_und_edges, qmod.n_comm,
             (CAST(round(CAST(mom.me * mom.sxy - mom.sx * mom.sy AS DOUBLE)
               / sqrt(CAST((mom.me * mom.sxx - mom.sx * mom.sx)
                 * (mom.me * mom.syy - mom.sy * mom.sy) AS DOUBLE))
               * 1e6) AS BIGINT) / 1e6) AS assortativity,
             (CAST(round(CAST(qmod.qn AS DOUBLE)
               / CAST(4 * qmod.mm * qmod.mm AS DOUBLE) * 1e6) AS BIGINT)
               / 1e6) AS modularity
      FROM qmod, mom, nn"""))

  // --------------------------------------------------------------- q307
  // Binned 1-D Wasserstein (earth-mover) drift ([EXT]) — the
  // distribution-shift metric that complements q187's KS (sup-norm)
  // and q230's PSI (binned log-ratio): W₁ = ∫|F_A − F_B| integrates
  // HOW FAR mass moved, not just the worst gap, so a $5 uniform price
  // shift scores 5 even when the sup gap is small. Cohorts: purchase
  // values in the first half of the month vs the second — "did the
  // purchase-value distribution drift mid-month". Reported beside the
  // binned KS sup read off the same grid.
  //
  // Scale: ONE corpus pass bins purchases to the $1 VALUE-DOMAIN grid
  // (≤ price range in dollars, constant in corpus size); the CDF
  // window and the W₁ reduction run on the grid. The house
  // drift-metric shape: corpus → grid → grid-sized everything.
  //
  // Exactness: bin counts and cumulative sums are exact BIGINTs; each
  // |ΔCDF|·gap term is a fixed-order double over exact ints quantized
  // to a 1e9 grid pre-sum (order-independent), KS sup is a max over
  // identical doubles, roundZ final.
  private val q307 = QueryDef(
    "q307_wasserstein_drift",
    (s, d) => {
      val p = ev(s, d).filter(col("event_type") === "purchase")
        .select(
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
            " AS BIGINT)").as("day"),
          expr("CAST(round(value * 100) AS BIGINT) DIV 100").as("bin"))
        .select(col("bin"), when(col("day") < 15L, 1L).otherwise(0L).as("a"))
      val grid = p.groupBy(col("bin"))
        .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
      val tot = grid.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val wg = Window.orderBy(col("bin"))
      grid
        .withColumn("cuma",
          sum(col("ca")).over(wg.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cumb",
          sum(col("cb")).over(wg.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("gap", lead(col("bin"), 1).over(wg) - col("bin"))
        .crossJoin(broadcast(tot))
        // empty-cohort guard (q215 class): a regenerated events table
        // whose span sits entirely in one half would zero na or nb —
        // Spark 4 ANSI throws on double/0, DuckDB yields NULL; guard
        // symmetrically so both emit NULL (and the metric row shows it)
        .withColumn("dcdf",
          when(col("na") > 0L && col("nb") > 0L,
            abs(col("cuma").cast("double") / col("na").cast("double")
              - col("cumb").cast("double") / col("nb").cast("double"))))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          count(lit(1)).as("n_bins"),
          sum(round(col("dcdf") * coalesce(col("gap"), lit(0L)).cast("double")
            * lit(1e9)).cast("long")).as("w1n"),
          max(col("dcdf")).as("ks"))
        .select(col("n_a"), col("n_b"), col("n_bins"),
          Num.roundZ(col("w1n").cast("double") / lit(1e9), 6).as("w1_dollars"),
          Num.roundZ(col("ks"), 6).as("ks_binned"))
    },
    Some("""
      WITH p AS (
        SELECT CAST(round(value * 100) AS BIGINT) // 100 AS bin,
               CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 < 15 THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type = 'purchase'),
      grid AS (
        SELECT bin, CAST(sum(a) AS BIGINT) AS ca,
               CAST(sum(1 - a) AS BIGINT) AS cb
        FROM p GROUP BY 1),
      tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                     CAST(sum(cb) AS BIGINT) AS nb FROM grid),
      cdf AS (
        SELECT bin,
               CAST(sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cuma,
               CAST(sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cumb,
               lead(bin, 1) OVER (ORDER BY bin) - bin AS gap
        FROM grid),
      terms AS (
        SELECT CASE WHEN na > 0 AND nb > 0 THEN
                 abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE)
                   - CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE)) END
                 AS dcdf,
               gap, na, nb
        FROM cdf, tot)
      SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             count(*) AS n_bins,
             (CAST(round(CAST(sum(CAST(round(dcdf
                 * CAST(coalesce(gap, 0) AS DOUBLE) * 1e9) AS BIGINT))
                 AS DOUBLE) / 1e9 * 1e6) AS BIGINT) / 1e6) AS w1_dollars,
             (CAST(round(max(dcdf) * 1e6) AS BIGINT) / 1e6) AS ks_binned
      FROM terms"""))

  // --------------------------------------------------------------- q265
  // Autocorrelation function of the daily purchase series, lags 1–7
  // ([EXT]) — the time-series diagnostic that complements q221's trend
  // test and q226's changepoint detector: a spike at lag 7 is weekly
  // seasonality (q165's profile seen through the correlogram), slow
  // decay is drift. ACF(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², both
  // sums over the DAY GRID (the series is the per-day aggregate — 30
  // rows at any corpus size; the corpus is touched once by the day
  // aggregate).
  //
  // Exactness: per-day cents totals are exact BIGINTs; centering would
  // leave fractions, so both sums expand to integer co-moments — the
  // numerator Σx_t·x_{t+k} − x̄(Σx_t + Σx_{t+k}) + n_k·x̄² uses the
  // grand mean x̄ as an exact ratio carried symbolically: multiply
  // through by n² so every term is an exact BIGINT product (day totals
  // ≤ 1e10 cents at sf0.1; squared × 30 days ≲ 1e22 — OVER the BIGINT
  // envelope at sf1, so terms carry in DOUBLE from exact integer
  // operands, q149's discipline: correctly-rounded, fixed-order).
  // The lag join is a 30-row self-join on the grid.
  private val q265 = QueryDef(
    "q265_acf_daily",
    (s, d) => {
      val day = ev(s, d).filter(col("event_type") === "purchase")
        .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      val tot = day.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val lags = day.select(col("day"), col("x"))
        .join(day.select((col("day") - 1L).as("day"), col("x").as("x1")),
          Seq("day"), "inner").select(lit(1L).as("lag"), col("x"), col("x1"))
      val allLags = (2 to 7).foldLeft(lags) { (acc, k) =>
        acc.unionByName(day.select(col("day"), col("x"))
          .join(day.select((col("day") - k.toLong).as("day"),
            col("x").as("x1")), Seq("day"), "inner")
          .select(lit(k.toLong).as("lag"), col("x"), col("x1")))
      }
      allLags.groupBy(col("lag"))
        .agg(count(lit(1)).as("nk"), sum(col("x")).as("sa"),
          sum(col("x1")).as("sb"), sum(col("x") * col("x1")).as("sab"))
        .crossJoin(broadcast(tot))
        .withColumn("mean", col("sx").cast("double") / col("n").cast("double"))
        .withColumn("num",
          col("sab").cast("double") -
            col("mean") * (col("sa") + col("sb")).cast("double") +
            col("nk").cast("double") * col("mean") * col("mean"))
        .withColumn("den",
          col("sxx").cast("double") -
            col("n").cast("double") * col("mean") * col("mean"))
        .select(col("lag"), col("nk"),
          Num.roundZ(col("num") / col("den"), 6).as("acf"))
        .orderBy(col("lag"))
    },
    Some("""
      WITH day AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1),
      tot AS (
        SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM day),
      lags AS (
        SELECT k.k AS lag, a.x AS x, b.x AS x1
        FROM range(1, 8) AS k(k)
        JOIN day a ON TRUE
        JOIN day b ON b.day = a.day + k.k),
      agg AS (
        SELECT lag, count(*) AS nk, CAST(sum(x) AS BIGINT) AS sa,
               CAST(sum(x1) AS BIGINT) AS sb,
               CAST(sum(x * x1) AS BIGINT) AS sab
        FROM lags GROUP BY 1)
      SELECT lag, nk,
             (CAST(round(((CAST(sab AS DOUBLE)
                    - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                      * CAST(sa + sb AS DOUBLE)
                    + CAST(nk AS DOUBLE)
                      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                   / (CAST(sxx AS DOUBLE)
                      - CAST(n AS DOUBLE)
                        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6)
               AS acf
      FROM agg, tot
      ORDER BY lag"""))

  // --------------------------------------------------------------- q263
  // Difference-in-differences ([EXT]) — the quasi-experimental
  // estimator for when assignment isn't randomized: effect =
  // (treat_post − treat_pre) − (ctrl_post − ctrl_pre), with the
  // parallel-trends premise carried as evidence (the pre-period gap).
  // Completes the experimentation family: q149 Welch (randomized two-
  // arm), q241 CUPED (variance reduction), q263 DiD (observational).
  // Arms by user-id parity, periods by the day-15 calendar split (the
  // q241 convention); metric = per-user purchase cents. The
  // interaction-term standard error uses the four cells' exact integer
  // moments: SE² = Σ_cells var_cell/n_cell (the 2×2 OLS identity).
  //
  // Scale: ONE user-keyed aggregate (user × period cents), then one
  // |cells|-row conditional aggregate — same shape as q241; everything
  // after runs on 4 rows. All moments are exact BIGINTs; the divisions
  // mirror the oracle token-for-token (q149 discipline).
  private val q263 = QueryDef(
    "q263_did_estimator",
    (s, d) => {
      val u = ev(s, d)
        .select(col("user_id"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
            " AS BIGINT)").as("day"),
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L)
            .as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < 15, col("cents")).otherwise(0L)).as("pre"),
          sum(when(col("day") >= 15, col("cents")).otherwise(0L)).as("post"))
        .withColumn("arm", expr("user_id % 2"))
      val cells = u.select(col("arm"), lit(0L).as("period"),
          col("pre").as("y"))
        .unionByName(u.select(col("arm"), lit(1L).as("period"),
          col("post").as("y")))
        .groupBy(col("arm"), col("period"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("mean",
          col("sy").cast("double") / col("n").cast("double") / lit(100.0))
        .withColumn("varm",
          // single-user cell: sample variance undefined (n−1 = 0) → NULL
          // in both engines; the SE then ships NULL rather than throwing
          when(col("n") > 1L,
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
              (col("n") * (col("n") - 1)).cast("double") / lit(1e4)))
      val wide = cells.agg(
        sum(when(col("arm") === 1L && col("period") === 1L, col("mean")))
          .as("m_t1"),
        sum(when(col("arm") === 1L && col("period") === 0L, col("mean")))
          .as("m_t0"),
        sum(when(col("arm") === 0L && col("period") === 1L, col("mean")))
          .as("m_c1"),
        sum(when(col("arm") === 0L && col("period") === 0L, col("mean")))
          .as("m_c0"),
        sum(when(col("arm") === 1L && col("period") === 1L,
          col("varm") / col("n").cast("double"))).as("v_t1"),
        sum(when(col("arm") === 1L && col("period") === 0L,
          col("varm") / col("n").cast("double"))).as("v_t0"),
        sum(when(col("arm") === 0L && col("period") === 1L,
          col("varm") / col("n").cast("double"))).as("v_c1"),
        sum(when(col("arm") === 0L && col("period") === 0L,
          col("varm") / col("n").cast("double"))).as("v_c0"))
      wide.select(
        Num.roundZ(col("m_t0") - col("m_c0"), 6).as("pre_gap"),
        Num.roundZ(col("m_t1") - col("m_c1"), 6).as("post_gap"),
        Num.roundZ((col("m_t1") - col("m_t0")) - (col("m_c1") - col("m_c0")), 6)
          .as("did_effect"),
        round(sqrt(col("v_t1") + col("v_t0") + col("v_c1") + col("v_c0")), 6)
          .as("se"))
    },
    Some("""
      WITH u AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(sum(CASE WHEN day < 15 THEN cents ELSE 0 END)
                 AS BIGINT) AS pre,
               CAST(sum(CASE WHEN day >= 15 THEN cents ELSE 0 END)
                 AS BIGINT) AS post
        FROM (
          SELECT user_id,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   ::BIGINT AS day,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END AS cents
          FROM events)
        GROUP BY 1, 2),
      cells AS (
        SELECT arm, period, count(*) AS n,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM (
          SELECT arm, 0 AS period, pre AS y FROM u
          UNION ALL
          SELECT arm, 1 AS period, post AS y FROM u)
        GROUP BY 1, 2),
      m AS (
        SELECT arm, period, n,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
               CAST(n * syy - sy * sy AS DOUBLE)
                 / CAST(n * (n - 1) AS DOUBLE) / 1e4 AS varm
        FROM cells),
      wide AS (
        SELECT
          sum(CASE WHEN arm = 1 AND period = 1 THEN mean END) AS m_t1,
          sum(CASE WHEN arm = 1 AND period = 0 THEN mean END) AS m_t0,
          sum(CASE WHEN arm = 0 AND period = 1 THEN mean END) AS m_c1,
          sum(CASE WHEN arm = 0 AND period = 0 THEN mean END) AS m_c0,
          sum(CASE WHEN arm = 1 AND period = 1
            THEN varm / CAST(n AS DOUBLE) END) AS v_t1,
          sum(CASE WHEN arm = 1 AND period = 0
            THEN varm / CAST(n AS DOUBLE) END) AS v_t0,
          sum(CASE WHEN arm = 0 AND period = 1
            THEN varm / CAST(n AS DOUBLE) END) AS v_c1,
          sum(CASE WHEN arm = 0 AND period = 0
            THEN varm / CAST(n AS DOUBLE) END) AS v_c0
        FROM m)
      SELECT (CAST(round((m_t0 - m_c0) * 1e6) AS BIGINT) / 1e6) AS pre_gap,
             (CAST(round((m_t1 - m_c1) * 1e6) AS BIGINT) / 1e6) AS post_gap,
             (CAST(round(((m_t1 - m_t0) - (m_c1 - m_c0)) * 1e6) AS BIGINT) / 1e6) AS did_effect,
             round(sqrt(v_t1 + v_t0 + v_c1 + v_c0), 6) AS se
      FROM wide"""))

  // --------------------------------------------------------------- q262
  // Link prediction by RESOURCE-ALLOCATION index ([EXT], Zhou et al.
  // 2009) — "which customer pairs are most likely to connect next",
  // the graph-native recommendation complement to q188's item-item CF
  // cosine: RA(a,b) = Σ_{shared part p} 1/deg(p). RA is chosen over
  // Adamic-Adar DELIBERATELY: AA's 1/ln(deg) drags libm into the score;
  // RA's 1/deg is an exact integer reciprocal (quantized to 1e-9, summed
  // as BIGINT) with equal published benchmark standing — the q133
  // "exact ratio instead of its log" rationale applied to graphs.
  //
  // Scale: pair generation is IN-BUCKET per part (sorted member set →
  // index pairs), never a corpus self-join, and parts with > 64 distinct
  // buyers are dropped before pairing — the LSH MaxBucket discipline:
  // a hot part contributes ≤ 1/65 per pair (negligible signal) yet
  // deg²/2 pairs (the quadratic blowup), so the cap trades vanishing
  // score mass for bounded work; the cap is mirrored in the oracle so
  // both engines drop identically. Top-20 is a TakeOrdered heap.
  private val q262 = QueryDef(
    "q262_link_prediction_ra",
    (s, d) => {
      val bought = li(s, d)
        .join(Tables.t(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"),
            col("o_custkey")), Seq("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
      val deg = bought.groupBy(col("part"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2L && col("deg") <= 64L)
        .withColumn("wq", round(lit(1e9) / col("deg").cast("double"))
          .cast("long"))
      val members = bought.join(deg, Seq("part"))
        .groupBy(col("part"), col("wq"))
        .agg(sort_array(collect_set(col("cust"))).as("cs"))
      // r13, the q158 discipline: the double explode below multiplies
      // work up to deg²/2 ≈ 2000× per row AFTER the members aggregation,
      // whose output is tiny in BYTES — AQE coalesced it to 5 partitions
      // and the pair-gen stage ran 9.9 s of CPU on 5 tasks (StageProf).
      // Pin the spread with an explicit count before the fan-out;
      // defaultParallelism scales with the cluster, not the SF. Keyed on
      // (part, wq), NOT (part): the upstream join already outputs
      // hashpartitioning(part, N), and a repartition identical to the
      // child's static partitioning is elided at planning time — which
      // hands the stage back to AQE's byte-based coalescing, undoing the
      // pin (caught by diffing the captured plan: no REPARTITION_BY_NUM
      // node survived the (part)-keyed form).
      val pairs = members
        .repartition(members.sparkSession.sparkContext.defaultParallelism,
          col("part"), col("wq"))
        .select(col("wq"), col("cs"),
          explode(expr("sequence(0, size(cs) - 2)")).as("i"))
        .select(col("wq"), col("cs"), col("i"),
          explode(expr("sequence(i + 1, size(cs) - 1)")).as("j"))
        .select(col("cs")(col("i")).as("ca"), col("cs")(col("j")).as("cb"),
          col("wq"))
      pairs.groupBy(col("ca"), col("cb"))
        .agg(count(lit(1)).as("n_common"), sum(col("wq")).as("sw"))
        .select(col("ca"), col("cb"), col("n_common"),
          round(col("sw").cast("double") / lit(1e9), 6).as("ra"))
        .orderBy(col("ra").desc, col("ca"), col("cb"))
        .limit(20)
    },
    Some("""
      WITH bought AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      deg AS (
        SELECT part, count(*) AS deg,
               CAST(round(1e9 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS wq
        FROM bought GROUP BY part
        HAVING count(*) BETWEEN 2 AND 64),
      pairs AS (
        SELECT a.cust AS ca, b.cust AS cb, d.wq
        FROM bought a
        JOIN bought b ON a.part = b.part AND a.cust < b.cust
        JOIN deg d ON d.part = a.part)
      SELECT ca, cb, count(*) AS n_common,
             round(CAST(sum(wq) AS BIGINT) / 1e9, 6) AS ra
      FROM pairs
      GROUP BY ca, cb
      ORDER BY ra DESC, ca, cb
      LIMIT 20"""))

  // --------------------------------------------------------------- q259
  // Differentially-private count release ([EXT]) — the third member of
  // the privacy family (q237 k-anonymity audits group sizes, q252
  // l-diversity audits uniformity; this RELEASES a noised statistic):
  // per-event-type counts with Laplace(1/ε) noise, ε = 1, sensitivity 1.
  // Noise is SEEDED — the inverse-CDF transform of an md5-derived
  // uniform (u from the first 52 md5 bits of 'dp:'+key, noise =
  // −b·sign(u−½)·ln(1−2|u−½|)) — so the release is reproducible and
  // oracle-checkable while keeping the exact Laplace marginal a fresh
  // uniform would give. A production release swaps the md5 seed for a
  // secret one (same plan, same cost); the true count column is kept
  // here ONLY because this is the engine-correctness surface — a real
  // release drops it.
  //
  // Scale: one map-side-combined count aggregate; noise is a per-GROUP
  // projection over |event types| rows. The one libm call (ln) rounds to
  // 6 decimals immediately (the q216 log2/round-8 precedent — the
  // rounded value is identical cross-engine, then release = n + noise
  // is a single correctly-rounded add).
  private val q259 = QueryDef(
    "q259_dp_noised_counts",
    (s, d) => {
      ev(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_true"))
        .withColumn("u",
          (expr("CAST(conv(substr(md5(concat('dp:', event_type)), 1, 13)," +
            " 16, 10) AS BIGINT)").cast("double") + lit(0.5)) /
            lit(4503599627370496.0))
        .withColumn("noise", Num.roundZ(when(col("u") >= 0.5, lit(-1.0)).otherwise(lit(1.0)) *
            log(lit(1.0) - lit(2.0) * abs(col("u") - lit(0.5))), 6))
        .select(col("event_type"), col("n_true"),
          lit(1.0).as("epsilon"), col("noise"),
          round(col("n_true").cast("double") + col("noise"), 6)
            .as("released"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, count(*) AS n_true FROM events GROUP BY 1),
      u AS (
        SELECT event_type, n_true,
               (CAST(('0x' || substr(md5('dp:' || event_type), 1, 13))
                  ::BIGINT AS DOUBLE) + 0.5) / 4503599627370496.0 AS u
        FROM g),
      z AS (
        SELECT event_type, n_true,
               (CAST(round(((CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END)
                 * ln(1.0 - 2.0 * abs(u - 0.5))) * 1e6) AS BIGINT) / 1e6) AS noise
        FROM u)
      SELECT event_type, n_true, CAST(1.0 AS DOUBLE) AS epsilon, noise,
             round(CAST(n_true AS DOUBLE) + noise, 6) AS released
      FROM z
      ORDER BY event_type"""))

  // --------------------------------------------------------------- q292
  // Classical additive seasonal decomposition ([EXT], the
  // moving-average method behind seasonal_decompose): value = trend
  // (centered 7-day MA) + seasonal (day-of-week mean of the detrended
  // series) + residual, per event_type over daily revenue. q165 reports
  // raw day-of-week profiles and q235/q166 flag outliers on raw values;
  // this separates the components, so the seasonal index is net of
  // trend and the residual is what an anomaly detector SHOULD consume.
  // Output: per (event_type, dow) the seasonal index and the mean
  // absolute residual — the signal/noise split of the weekly cycle.
  //
  // Exactness: the centered MA is an exact 7-int sum with ONE division;
  // it is only defined where the 7-row frame is complete AND
  // day-contiguous (count = 7 and max−min = 6 over the frame — a ROWS
  // frame over a gapped series would silently average non-adjacent
  // days, the classic decomposition bug). Detrended values land on
  // doubles identically in both engines (same ints, same two ops), and
  // every subsequent mean quantizes to a 1e-6 grid pre-sum (avgFixed),
  // so aggregation order never matters. Seasonal joins back by
  // broadcast (|types|·7 grid). roundZ finals — indices and residual
  // means are signed. Scale: one map-side daily aggregate; windows
  // partition by event_type over the day grid; everything downstream is
  // grid-sized.
  private val q292 = QueryDef(
    "q292_seasonal_decompose",
    (s, d) => {
      val daily = ev(s, d)
        .groupBy(col("event_type"),
          expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
            .as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      val wMa = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val det = daily
        .withColumn("s7", sum(col("v")).over(wMa))
        .withColumn("c7", count(col("v")).over(wMa))
        .withColumn("span", max(col("day")).over(wMa) -
          min(col("day")).over(wMa))
        .filter(col("c7") === 7L && col("span") === 6L)
        .withColumn("detr", col("v").cast("double") -
          col("s7").cast("double") / lit(7.0))
        .withColumn("dow", col("day") % 7L)
      val seas = det.groupBy(col("event_type"), col("dow"))
        .agg(Num.avgFixed(col("detr"), 6).as("seasonal"),
          count(lit(1)).as("n_obs"))
      det.join(broadcast(seas), Seq("event_type", "dow"))
        .withColumn("resid", abs(col("detr") - col("seasonal")))
        .groupBy(col("event_type"), col("dow"))
        .agg(max(col("n_obs")).as("n_obs"),
          Num.roundZ(max(col("seasonal")) / lit(100.0), 6)
            .as("seasonal_usd"),
          Num.roundZ(Num.avgFixed(col("resid"), 6) / lit(100.0), 6)
            .as("mean_abs_resid_usd"))
        .orderBy(col("event_type"), col("dow"))
    },
    Some(s"""
      WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2),
      det AS (
        SELECT event_type, day, day % 7 AS dow,
               CAST(v AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0 AS detr
        FROM (
          SELECT event_type, day, v,
                 sum(v) OVER w AS s7, count(v) OVER w AS c7,
                 max(day) OVER w - min(day) OVER w AS span
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) t
        WHERE c7 = 7 AND span = 6),
      seas AS (
        SELECT event_type, dow,
               ${graft.Num.avgFixedSql("detr", 6)} AS seasonal,
               count(*) AS n_obs
        FROM det GROUP BY 1, 2)
      SELECT d.event_type, d.dow, max(s.n_obs) AS n_obs,
             (CAST(round((max(s.seasonal) / 100.0) * 1e6) AS BIGINT) / 1e6)
               AS seasonal_usd,
             (CAST(round((${graft.Num.avgFixedSql(
                 "abs(d.detr - s.seasonal)", 6)} / 100.0) * 1e6)
               AS BIGINT) / 1e6) AS mean_abs_resid_usd
      FROM det d JOIN seas s ON s.event_type = d.event_type
                            AND s.dow = d.dow
      GROUP BY d.event_type, d.dow
      ORDER BY d.event_type, d.dow"""))

  // --------------------------------------------------------------- q291
  // Local-DP frequency estimation via k-ary randomized response ([EXT],
  // Warner 1965 / generalized RR) — the LOCAL counterpart of q259's
  // central-DP release: there the aggregator holds true counts and
  // noises the output; here EVERY ROW is perturbed before aggregation
  // (the collector never sees a trustworthy record) and the estimator
  // inverts the known mechanism. Mechanism: each event reports its true
  // type with p = 0.7, else a uniform draw over the K types; the
  // unbiased inverse is est_k = (obs_k − (1−p)·N/K)/p. The report shows
  // the true count (engine-correctness surface, as in q259), the
  // perturbed observation, the debiased estimate, and the residual.
  //
  // Determinism: both coins are md5-derived per event_id (the q259
  // seeded-release discipline — swap the seed for a secret to deploy);
  // the uniform category is the u2-th entry of the SORTED type
  // dictionary, so both engines pick identical flips. The estimate is a
  // fixed-order expression of exact integers with one division; roundZ
  // because est and residual can round to zero from below. Scale: the
  // perturbation is a per-row projection + one broadcast join against
  // the K-row dictionary; aggregation stays map-side-combinable; the
  // K-row dictionary window is value-domain-sized.
  private val q291 = QueryDef(
    "q291_local_dp_frequency",
    (s, d) => {
      val types = ev(s, d).select(col("event_type")).distinct()
        .withColumn("idx", row_number()
          .over(Window.orderBy(col("event_type"))).cast("long") - 1L)
      val kRow = types.agg(count(lit(1)).as("k")) // 1 row
      val rep = ev(s, d).select(col("event_id"), col("event_type"))
        .withColumn("u1", expr("CAST(conv(substr(md5(concat('ldp1:', " +
          "CAST(event_id AS STRING))), 1, 13), 16, 10) AS BIGINT) % 1000"))
        .withColumn("u2", expr("CAST(conv(substr(md5(concat('ldp2:', " +
          "CAST(event_id AS STRING))), 1, 13), 16, 10) AS BIGINT)"))
        .crossJoin(broadcast(kRow))
        .withColumn("pick", col("u2") % col("k"))
        .join(broadcast(types.select(col("event_type").as("pick_type"),
          col("idx"))), col("pick") === col("idx"))
        .withColumn("reported", when(col("u1") < 700L,
          col("event_type")).otherwise(col("pick_type")))
      val obs = rep.groupBy(col("reported").as("event_type"))
        .agg(count(lit(1)).as("n_obs"))
      val truth = ev(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_true"))
      val tot = truth.agg(sum(col("n_true")).as("n")) // 1 row
      truth.join(obs, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_obs"))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(kRow))
        .withColumn("est", Num.roundZ(
          (col("n_obs").cast("double") - lit(0.3) *
            (col("n").cast("double") / col("k").cast("double"))) / lit(0.7),
          6))
        .withColumn("residual",
          Num.roundZ(col("est") - col("n_true").cast("double"), 6))
        .select(col("event_type"), col("n_true"), col("n_obs"),
          col("est"), col("residual"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH types AS (
        SELECT event_type,
               row_number() OVER (ORDER BY event_type) - 1 AS idx
        FROM (SELECT DISTINCT event_type FROM events)),
      kk AS (SELECT count(*) AS k FROM types),
      rep AS (
        SELECT e.event_type AS true_type,
               CASE WHEN ((('0x' || substr(md5('ldp1:'
                      || CAST(e.event_id AS VARCHAR)), 1, 13))::BIGINT)
                      % 1000) < 700
                    THEN e.event_type ELSE t.event_type END AS reported
        FROM events e
        CROSS JOIN kk
        JOIN types t ON t.idx = ((('0x' || substr(md5('ldp2:'
               || CAST(e.event_id AS VARCHAR)), 1, 13))::BIGINT) % kk.k)),
      obs AS (SELECT reported AS event_type, count(*) AS n_obs
              FROM rep GROUP BY 1),
      truth AS (SELECT event_type, count(*) AS n_true
                FROM events GROUP BY 1),
      tot AS (SELECT CAST(sum(n_true) AS BIGINT) AS n FROM truth)
      SELECT tr.event_type, tr.n_true,
             CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
             (CAST(round(((CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
                - 0.3 * (CAST(tot.n AS DOUBLE) / CAST(kk.k AS DOUBLE)))
                / 0.7) * 1e6) AS BIGINT) / 1e6) AS est,
             (CAST(round((((CAST(round(((CAST(COALESCE(o.n_obs, 0) AS DOUBLE)
                - 0.3 * (CAST(tot.n AS DOUBLE) / CAST(kk.k AS DOUBLE)))
                / 0.7) * 1e6) AS BIGINT) / 1e6))
                - CAST(tr.n_true AS DOUBLE)) * 1e6) AS BIGINT) / 1e6)
               AS residual
      FROM truth tr
      LEFT JOIN obs o ON o.event_type = tr.event_type
      CROSS JOIN tot CROSS JOIN kk
      ORDER BY tr.event_type"""))

  // --------------------------------------------------------------- q257
  // Join-key SKEW diagnosis ([EXT]) — the pre-flight report an engineer
  // (or an advisor rule) runs before shuffling 100 TB on a key: for each
  // candidate join key of lineitem, the key-distribution shape that
  // decides between a plain shuffle, AQE skew splitting, and q29's
  // explicit salting — key cardinality, the heaviest key's share of all
  // rows, the p99 key mass vs the mean, and the derived salt factor
  // ceil(max/mean) (1 = no salting needed; q29 applies exactly this).
  //
  // One corpus scan serves all three candidates: the key array explodes
  // 3× into a (key_name, key)-keyed map-side-combined aggregate. All
  // downstream work is KEY-DOMAIN-sized: the p99 cut runs on the
  // count-of-counts grid (distinct mass values, q139's two-phase
  // discipline — never a per-key sort), max/mean/salt are exact integer
  // arithmetic (ceil as (a+b−1) DIV b), and the report is 3 rows.
  private val q257 = QueryDef(
    "q257_skew_profile",
    (s, d) => {
      val keyed = li(s, d).select(explode(array(
          struct(lit("l_orderkey").as("key_name"),
            col("l_orderkey").as("k")),
          struct(lit("l_partkey").as("key_name"), col("l_partkey").as("k")),
          struct(lit("l_suppkey").as("key_name"), col("l_suppkey").as("k"))))
          .as("e"))
        .select(col("e.key_name").as("key_name"), col("e.k").as("k"))
      val perKey = keyed.groupBy(col("key_name"), col("k"))
        .agg(count(lit(1)).as("c"))
      val grid = perKey.groupBy(col("key_name"), col("c"))
        .agg(count(lit(1)).as("nk"))
      val wCum = Window.partitionBy(col("key_name")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = grid.groupBy(col("key_name"))
        .agg(sum(col("nk")).as("n_keys"), sum(col("c") * col("nk")).as("n"),
          max(col("c")).as("max_c"))
      val p99 = grid
        .withColumn("cum", sum(col("nk")).over(wCum))
        .join(broadcast(tot), Seq("key_name"))
        .filter(col("cum") * 100L >= col("n_keys") * 99L)
        .groupBy(col("key_name")).agg(min(col("c")).as("p99_c"))
      tot.join(broadcast(p99), Seq("key_name"))
        .select(col("key_name"), col("n_keys"), col("max_c"),
          round(col("max_c").cast("double") / col("n").cast("double"), 6)
            .as("max_share"),
          round(col("p99_c").cast("double") * col("n_keys").cast("double") /
            col("n").cast("double"), 6).as("p99_over_mean"),
          expr("(max_c * n_keys + n - 1) DIV n").as("salt_factor"))
        .orderBy(col("key_name"))
    },
    Some("""
      WITH keyed AS (
        SELECT 'l_orderkey' AS key_name, l_orderkey AS k FROM lineitem
        UNION ALL
        SELECT 'l_partkey', l_partkey FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', l_suppkey FROM lineitem),
      perkey AS (
        SELECT key_name, k, count(*) AS c FROM keyed GROUP BY 1, 2),
      grid AS (
        SELECT key_name, c, count(*) AS nk FROM perkey GROUP BY 1, 2),
      tot AS (
        SELECT key_name, CAST(sum(nk) AS BIGINT) AS n_keys,
               CAST(sum(c * nk) AS BIGINT) AS n,
               CAST(max(c) AS BIGINT) AS max_c
        FROM grid GROUP BY 1),
      cum AS (
        SELECT key_name, c,
               sum(nk) OVER (PARTITION BY key_name ORDER BY c
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM grid),
      p99 AS (
        SELECT c2.key_name, CAST(min(c2.c) AS BIGINT) AS p99_c
        FROM cum c2 JOIN tot USING (key_name)
        WHERE c2.cum * 100 >= tot.n_keys * 99
        GROUP BY c2.key_name)
      SELECT t.key_name, t.n_keys, t.max_c,
             round(CAST(t.max_c AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
               AS max_share,
             round(CAST(p.p99_c AS DOUBLE) * CAST(t.n_keys AS DOUBLE)
               / CAST(t.n AS DOUBLE), 6) AS p99_over_mean,
             (t.max_c * t.n_keys + t.n - 1) // t.n AS salt_factor
      FROM tot t JOIN p99 p USING (key_name)
      ORDER BY key_name"""))

  // --------------------------------------------------------------- q256
  // Count-Min INNER-PRODUCT join-size estimation ([EXT], Cormode &
  // Muthukrishnan §4.2) — the planning-time question "how big would this
  // join be?" answered from two fixed-size sketches without running the
  // join: for the supplier-keyed join between the even and odd order
  // streams (the shard-reconciliation shape), est = min_j Σ_w
  // cmA[j][w]·cmB[j][w] over depth-4 × width-4096 counter
  // tables, with the guarantee est ∈ [J, J + εN_A·N_B], ε = e/w. Width
  // is sized so the random-collision floor N_A·N_B/w sits BELOW the true
  // J at the bench scale (a 256-wide table measured a 3.8× overestimate
  // here — pure collision floor; 4096 cells is still a trivial 16k-cell
  // table). The query reports est against
  // the EXACT J = Σ_k c_A(k)·c_B(k) — the overestimate observability
  // check (q159's discipline applied to the binary estimator) that an
  // optimizer consults before picking a join strategy on skewed keys.
  //
  // Scale: each sketch is ONE map-side-combined aggregate into its
  // cells (16k per sketch; the sketch is a sum — 1000 executors each emit a partial
  // table, the exchange carries cells, never rows); the inner product
  // joins 1024-row tables. The exact side exists only as the oracle's
  // ground truth and shuffles key-sized aggregates — at 100 TB you ship
  // the sketch path and skip the exact pass; the est/J comparison is
  // precisely what licenses that.
  // Buckets are the house portable-hash idiom (md5 hex → 32-bit int mod
  // w), identical integer arithmetic cross-engine.
  private val q256 = QueryDef(
    "q256_cm_join_size",
    (s, d) => {
      // ONE scan builds BOTH sketches (conditional sums per half share
      // the (j, bucket) aggregate) and one more builds the exact ground
      // truth — the first cut ran 4 scans (2 per sketch + 2 exact sides)
      val base = li(s, d).select(col("l_suppkey").as("k"),
        (col("l_orderkey") % 2L).as("half"))
      val cells = base
        .withColumn("j", explode(expr("sequence(0, 3)")))
        .withColumn("bucket", expr(
          """CAST(conv(substr(md5(concat('cm', CAST(j AS STRING), ':',
             CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT) % 4096"""))
        .groupBy(col("j"), col("bucket"))
        .agg(sum(when(col("half") === 0L, 1L).otherwise(0L)).as("n0"),
          sum(when(col("half") === 1L, 1L).otherwise(0L)).as("n1"))
      val est = cells
        .groupBy(col("j"))
        .agg(sum(col("n0") * col("n1")).as("ip"))
        .agg(min(col("ip")).as("cm_est"))
      val exact = base.groupBy(col("k"))
        .agg(sum(when(col("half") === 0L, 1L).otherwise(0L)).as("c0"),
          sum(when(col("half") === 1L, 1L).otherwise(0L)).as("c1"))
        .agg(sum(col("c0") * col("c1")).as("join_size"))
      exact.crossJoin(broadcast(est))
        .select(col("join_size"), col("cm_est"),
          (col("cm_est") - col("join_size")).as("overest"),
          round((col("cm_est") - col("join_size")).cast("double") /
            col("join_size").cast("double"), 6).as("rel_err"))
    },
    Some("""
      WITH base AS (
        SELECT l_suppkey AS k, l_orderkey % 2 AS half FROM lineitem),
      bucketed AS (
        SELECT half, j.j,
               ('0x' || substr(md5('cm' || CAST(j.j AS VARCHAR) || ':'
                 || CAST(k AS VARCHAR)), 1, 8))::BIGINT % 4096 AS bucket
        FROM base, range(4) AS j(j)),
      cells AS (
        SELECT j, bucket,
               CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS n0,
               CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS n1
        FROM bucketed GROUP BY 1, 2),
      ip AS (
        SELECT j, CAST(sum(n0 * n1) AS BIGINT) AS ip
        FROM cells GROUP BY j),
      est AS (SELECT CAST(min(ip) AS BIGINT) AS cm_est FROM ip),
      sides AS (
        SELECT k,
               CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS c0,
               CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS c1
        FROM base GROUP BY k),
      exact AS (
        SELECT CAST(sum(c0 * c1) AS BIGINT) AS join_size FROM sides)
      SELECT join_size, cm_est, cm_est - join_size AS overest,
             round(CAST(cm_est - join_size AS DOUBLE)
               / CAST(join_size AS DOUBLE), 6) AS rel_err
      FROM exact, est"""))

  // --------------------------------------------------------------- q280
  // approx_percentile rank-error gate ([EXT]) — sketch observability for
  // Spark's built-in quantile sketch (Greenwald–Khanna/KLL family), the
  // production quantile path at 100 TB where q168's exact two-phase grid
  // would still work but the sketch is one pass and mergeable. The
  // estimate itself is sketch-internal (not reproducible in DuckDB), so
  // the q38/q220 boolean pattern applies: the query derives, from the
  // exact cents VALUE-DOMAIN grid, the values at ranks ⌈(p±0.02)·n⌉ —
  // accuracy=100 guarantees rank error ≤ n/100, the band doubles it for
  // rank-definition slack — and pins `within_rank_band` TRUE per
  // (event_type, p). A sketch drifting out of its guaranteed band flips
  // the boolean and fails the hash gate; the exact band edges are
  // hash-checked values in their own right.
  //
  // Scale (q168 discipline): one corpus aggregate to the (type, cents)
  // grid; cumulative ranks and band-edge selection run on the grid;
  // the sketch side is one map-side-combinable approx_percentile agg.
  private val q280 = QueryDef(
    "q280_approx_quantile_gate",
    (s, d) => {
      val ps = Seq(0.5, 0.9, 0.99)
      val e = ev(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val grid = e.groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = grid.withColumn("cum", sum(col("cnt")).over(wCum))
      val n = grid.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
      val targets = n
        .select(col("event_type"), col("n"),
          explode(array(ps.map(lit(_)): _*)).as("p"))
        .withColumn("klo",
          greatest(lit(1L), ceil((col("p") - lit(0.02)) * col("n").cast("double"))))
        .withColumn("khi",
          least(col("n"), ceil((col("p") + lit(0.02)) * col("n").cast("double"))))
      def valueAtRank(k: String, out: String) = targets
        .join(cum, "event_type")
        .filter(col("cum") >= col(k))
        .groupBy(col("event_type"), col("p"))
        .agg(min(col("cents")).as(out))
      val bands = valueAtRank("klo", "exact_lo")
        .join(valueAtRank("khi", "exact_hi"), Seq("event_type", "p"))
      val est = e.groupBy(col("event_type"))
        .agg(expr(s"approx_percentile(cents, array(${ps.mkString(", ")}), 100)")
          .as("ests"))
        .select(col("event_type"), posexplode(col("ests")).as(Seq("i", "est")))
        .select(col("event_type"),
          element_at(array(ps.map(lit(_)): _*), col("i") + 1).as("p"),
          col("est"))
      bands.join(est, Seq("event_type", "p"))
        .select(col("event_type"), col("p"), col("exact_lo"), col("exact_hi"),
          (col("est") >= col("exact_lo") && col("est") <= col("exact_hi"))
            .as("within_rank_band"))
        .orderBy(col("event_type"), col("p"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      grid AS (
        SELECT event_type, cents, count(*) AS cnt FROM e GROUP BY 1, 2),
      cum AS (
        SELECT event_type, cents,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM grid),
      n AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
            FROM grid GROUP BY 1),
      targets AS (
        SELECT event_type, n, CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p
        FROM n),
      bounds AS (
        SELECT event_type, n, p,
               greatest(1, CAST(ceil((p - 0.02) * CAST(n AS DOUBLE))
                 AS BIGINT)) AS klo,
               least(n, CAST(ceil((p + 0.02) * CAST(n AS DOUBLE))
                 AS BIGINT)) AS khi
        FROM targets),
      lo AS (
        SELECT b.event_type, b.p, min(c.cents) AS exact_lo
        FROM bounds b JOIN cum c ON c.event_type = b.event_type
        WHERE c.cum >= b.klo GROUP BY 1, 2),
      hi AS (
        SELECT b.event_type, b.p, min(c.cents) AS exact_hi
        FROM bounds b JOIN cum c ON c.event_type = b.event_type
        WHERE c.cum >= b.khi GROUP BY 1, 2)
      SELECT lo.event_type, lo.p, lo.exact_lo, hi.exact_hi,
             TRUE AS within_rank_band
      FROM lo JOIN hi ON hi.event_type = lo.event_type AND hi.p = lo.p
      ORDER BY lo.event_type, lo.p"""))

  // --------------------------------------------------------------- q334
  // HITS hubs & authorities on the order→part bipartite graph ([EXT]) —
  // the mutually-recursive ranking beside q140's PageRank: an order is a
  // good HUB if it buys authoritative parts; a part is a good AUTHORITY
  // if good hubs buy it. Two Kleinberg iterations, L1-normalized each
  // half-step, all in SCALED BIGINTs (S = 1e9): a ← S·(Σ_{o→p} h)/Σ and
  // h ← S·(Σ_{o→p} a)/Σ with integer DIV truncation DECLARED as the
  // semantics (q140's discipline) — bit-identical across engines, which
  // float HITS is not.
  //
  // Overflow envelope: after each normalization scores are ≤ S and raw
  // sums are ≤ maxdeg·S, so every product stays ≤ maxdeg·S² = 7e18 <
  // 2^63 under this schema's order-degree bound (≤ 7 lines/order). At a
  // degree scale beyond that, move the two products to DECIMAL(38)/
  // HUGEINT — S is a knob, not an assumption, BUT it has a LOWER bound
  // too: S ≫ |hubs| is required or the `S DIV n_hubs` seed truncates
  // every initial score to 0 (at n_hubs > S=1e9 — roughly the true
  // 100 TB hub grain — sa/sh underflow to 0). At that grain RAISE S
  // alongside the DECIMAL move; don't drop it. Belt-and-braces, the
  // two normalizations below are sa>0/sh>0-guarded so a zeroed
  // half-step degrades to NULL scores (DuckDB's own x DIV 0 result)
  // instead of an ANSI throw.
  //
  // Scale: per half-step ONE keyed equi-join + map-side-combinable sum
  // + a broadcast 1-row normalizer — Pregel-in-SQL like q140; final
  // cuts are TakeOrdered heaps.
  private val HitsScale = 1000000000L
  private val HitsIters = 2
  private val q334 = QueryDef(
    "q334_hits_scores",
    (s, d) => {
      // the edge table feeds BOTH half-steps of every iteration (4+
      // plan references): localCheckpoint pins it once — without it each
      // reference re-scans lineitem and re-runs the distinct (the
      // q32/q35 lineage lesson; measured 6.6 s → ~1 s at sf0.1)
      val edges = li(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint()
      val nH = edges.select(col("o")).distinct()
        .agg(count(lit(1)).as("n_hubs"))
      var h = edges.select(col("o")).distinct()
        .crossJoin(broadcast(nH))
        .select(col("o"), expr(s"${HitsScale}L DIV n_hubs").as("h"))
      var a: DataFrame = null
      for (_ <- 1 to HitsIters) {
        // each raw-score table feeds its own normalizer AND the
        // normalized projection — checkpoint so the edge join runs once
        // per half-step, not twice (node-dictionary-sized pins)
        val araw = edges.join(h, "o")
          .groupBy(col("p")).agg(sum(col("h")).as("araw"))
          .localCheckpoint()
        val sa = araw.agg(sum(col("araw")).as("sa"))
        a = araw.crossJoin(broadcast(sa))
          .select(col("p"), expr(
            s"CASE WHEN sa > 0 THEN (araw * ${HitsScale}L) DIV sa END")
            .as("a"))
        val hraw = edges.join(a, "p")
          .groupBy(col("o")).agg(sum(col("a")).as("hraw"))
          .localCheckpoint()
        val sh = hraw.agg(sum(col("hraw")).as("sh"))
        h = hraw.crossJoin(broadcast(sh))
          .select(col("o"), expr(
            s"CASE WHEN sh > 0 THEN (hraw * ${HitsScale}L) DIV sh END")
            .as("h"))
      }
      val topA = a.orderBy(col("a").desc, col("p")).limit(15)
        .select(lit("authority").as("kind"), col("p").as("key"),
          col("a").as("score"))
      val topH = h.orderBy(col("h").desc, col("o")).limit(15)
        .select(lit("hub").as("kind"), col("o").as("key"),
          col("h").as("score"))
      topA.unionByName(topH).orderBy(col("kind"), col("score").desc,
        col("key"))
    },
    Some {
      val steps = (1 to HitsIters).map { t =>
        s"""araw$t AS (
        SELECT e.p, sum(h.h) AS araw
        FROM edges e JOIN h${t - 1} h ON h.o = e.o GROUP BY 1),
      a$t AS (
        SELECT p, (araw * $HitsScale) // (SELECT sum(araw) FROM araw$t)
                 AS a
        FROM araw$t),
      hraw$t AS (
        SELECT e.o, sum(a.a) AS hraw
        FROM edges e JOIN a$t a ON a.p = e.p GROUP BY 1),
      h$t AS (
        SELECT o, (hraw * $HitsScale) // (SELECT sum(hraw) FROM hraw$t)
                 AS h
        FROM hraw$t)"""
      }.mkString(",\n      ")
      s"""
      WITH edges AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      h0 AS (
        SELECT o, $HitsScale // (SELECT count(DISTINCT o) FROM edges) AS h
        FROM (SELECT DISTINCT o FROM edges)),
      $steps,
      topa AS (
        SELECT 'authority' AS kind, p AS key, CAST(a AS BIGINT) AS score
        FROM a$HitsIters ORDER BY a DESC, p LIMIT 15),
      toph AS (
        SELECT 'hub' AS kind, o AS key, CAST(h AS BIGINT) AS score
        FROM h$HitsIters ORDER BY h DESC, o LIMIT 15)
      SELECT * FROM topa
      UNION ALL
      SELECT * FROM toph
      ORDER BY kind, score DESC, key"""
    })

  // --------------------------------------------------------------- q335
  // Precision–recall / F1 threshold sweep ([EXT] model-eval pack, beside
  // q102 AUC, q160 calibration, q325 gains): for every $1 score
  // threshold t, the confusion counts of "predict purchase if value ≥ t"
  // and the derived precision / recall / F1 — the curve a threshold
  // picker reads. Same two-phase grid discipline as q325: ONE corpus
  // aggregate onto the $1 bin grid, cumulative-from-the-top on the GRID,
  // no corpus sort.
  //
  // Exactness: counts exact; precision = TP/PP with PP ≥ 1 by grid
  // construction; recall guarded for the no-positives corpus (NULL, as
  // DuckDB's /0); F1 in its division-safe integer form 2TP/(PP+P)
  // (denominator ≥ 1 — PP ≥ 1 on every grid row).
  private val q335 = QueryDef(
    "q335_pr_curve",
    (s, d) => {
      val e = ev(s, d).select(
        expr("CAST(round(value * 100) AS BIGINT) DIV 100").as("thr_usd"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val grid = e.groupBy(col("thr_usd"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
      val wCum = Window.orderBy(col("thr_usd").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = grid.agg(sum(col("np")).as("p"))
      grid
        .withColumn("tp", sum(col("np")).over(wCum))
        .withColumn("pp", sum(col("n")).over(wCum))
        .crossJoin(broadcast(tot))
        .select(col("thr_usd"), col("n"), col("tp"), col("pp"),
          Num.roundZ(col("tp").cast("double") / col("pp").cast("double"), 6)
            .as("precision"),
          when(col("p") > 0L,
            Num.roundZ(col("tp").cast("double") / col("p").cast("double"), 6))
            .as("recall"),
          Num.roundZ((col("tp") * 2L).cast("double") /
            (col("pp") + col("p")).cast("double"), 6).as("f1"))
        .orderBy(col("thr_usd"))
    },
    Some("""
      WITH e AS (
        SELECT CAST(round(value * 100) AS BIGINT) // 100 AS thr_usd,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events),
      grid AS (
        SELECT thr_usd, count(*) AS n, CAST(sum(pos) AS BIGINT) AS np
        FROM e GROUP BY 1),
      cum AS (
        SELECT thr_usd, n,
               CAST(sum(np) OVER (ORDER BY thr_usd DESC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
               CAST(sum(n) OVER (ORDER BY thr_usd DESC
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pp,
               CAST((SELECT sum(np) FROM grid) AS BIGINT) AS p
        FROM grid)
      SELECT thr_usd, n, tp, pp,
             (CAST(round((CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE)) * 1e6)
               AS BIGINT) / 1e6) AS precision,
             CASE WHEN p > 0 THEN
               (CAST(round((CAST(tp AS DOUBLE) / CAST(p AS DOUBLE)) * 1e6)
                 AS BIGINT) / 1e6) END AS recall,
             (CAST(round((CAST(2 * tp AS DOUBLE)
               / CAST(pp + p AS DOUBLE)) * 1e6) AS BIGINT) / 1e6) AS f1
      FROM cum
      ORDER BY thr_usd"""))

  // --------------------------------------------------------------- q336
  // Sample-ratio-mismatch check ([EXT] experimentation pack) — the FIRST
  // gate any A/B readout must pass: with 50/50 assignment (user parity,
  // the q149/q241 convention), are the daily arm counts consistent with
  // the design? χ² against the 50/50 expectation collapses exactly to
  // (n₁−n₀)²/(n₁+n₀) — ONE division of exact integers per day — flagged
  // at the 1-df α=.05 critical value. An SRM day means the assignment
  // or logging is broken and every downstream estimate (q149/q241/q263/
  // q289) on that day is untrustworthy.
  // Scale: one (day, user) distinct + a day-grid conditional aggregate.
  private val q336 = QueryDef(
    "q336_srm_check",
    (s, d) => {
      val u = ev(s, d).select(
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
        col("user_id")).distinct()
      u.groupBy(col("day"))
        .agg(sum(expr("user_id % 2")).as("n_treat"),
          sum(expr("1 - user_id % 2")).as("n_ctrl"))
        .select(col("day"), col("n_treat"), col("n_ctrl"),
          Num.roundZ(((col("n_treat") - col("n_ctrl")) *
            (col("n_treat") - col("n_ctrl"))).cast("double") /
            (col("n_treat") + col("n_ctrl")).cast("double"), 6).as("chi2"),
          (((col("n_treat") - col("n_ctrl")) *
            (col("n_treat") - col("n_ctrl"))).cast("double") /
            (col("n_treat") + col("n_ctrl")).cast("double") > 3.841459)
            .as("srm_flag"))
        .orderBy(col("day"))
    },
    Some("""
      WITH u AS (
        SELECT DISTINCT
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               user_id
        FROM events),
      g AS (
        SELECT day, CAST(sum(user_id % 2) AS BIGINT) AS n_treat,
               CAST(sum(1 - user_id % 2) AS BIGINT) AS n_ctrl
        FROM u GROUP BY 1)
      SELECT day, n_treat, n_ctrl,
             (CAST(round((CAST((n_treat - n_ctrl) * (n_treat - n_ctrl)
               AS DOUBLE) / CAST(n_treat + n_ctrl AS DOUBLE)) * 1e6)
               AS BIGINT) / 1e6) AS chi2,
             (CAST((n_treat - n_ctrl) * (n_treat - n_ctrl) AS DOUBLE)
               / CAST(n_treat + n_ctrl AS DOUBLE)) > 3.841459 AS srm_flag
      FROM g
      ORDER BY day"""))

  // --------------------------------------------------------------- q337
  // KMV-sketch Jaccard between two behavioral cohorts ([EXT] sketch
  // family, beside q309's KMV distinct and q220's HLL union): estimate
  // |A∩B|/|A∪B| of (purchasers, viewers) from bottom-64 hash sketches —
  // the mergeable-summary way to ask "how much do two 10⁹-member
  // cohorts overlap" without ever joining them. Estimator: take the 64
  // smallest md5-56bit user hashes of A∪B; Ĵ = (members of that sketch
  // in BOTH cohorts)/|sketch| (Beyer et al.). The exact Jaccard ships
  // beside it — eval ops run both arms (q258's discipline).
  //
  // Determinism: md5 hashes, ranked with rank ≤ k — which compiles to
  // WindowGroupLimit, i.e. a 64-row heap per map partition BEFORE the
  // single-partition selection, so only 64·P rows ever cross (q218's
  // pinned shape; the exchange is top-k-survivor-sized, house-legal).
  // 56-bit hashes make ties impossible; the estimate is an exact
  // integer ratio.
  private val q337 = QueryDef(
    "q337_kmv_jaccard",
    (s, d) => {
      val flags = ev(s, d)
        .filter(col("event_type").isin("purchase", "view"))
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("in_a"),
          max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("in_b"))
        .withColumn("h",
          conv(substring(md5(concat(lit("kmv:"),
            col("user_id").cast("string")).cast("binary")), 1, 14), 16, 10)
            .cast("long"))
      val wH = Window.orderBy(col("h"))
      val sketch = flags.withColumn("rk", row_number().over(wH))
        .filter(col("rk") <= 64)
      val est = sketch.agg(count(lit(1)).as("n_sketch"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("n_both"))
      val exact = flags.agg(
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L)
          .otherwise(0L)).as("n_inter"),
        count(lit(1)).as("n_union"))
      est.crossJoin(broadcast(exact))
        .select(lit(64L).as("k"), col("n_sketch"), col("n_both"),
          col("n_inter"), col("n_union"),
          when(col("n_sketch") > 0L,
            Num.roundZ(col("n_both").cast("double") /
              col("n_sketch").cast("double"), 6)).as("est_jaccard"),
          when(col("n_union") > 0L,
            Num.roundZ(col("n_inter").cast("double") /
              col("n_union").cast("double"), 6)).as("true_jaccard"))
    },
    Some("""
      WITH flags AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS in_a,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS in_b,
               (('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
                 1, 14))::BIGINT) AS h
        FROM events
        WHERE event_type IN ('purchase', 'view')
        GROUP BY user_id),
      sk AS (
        SELECT * FROM (
          SELECT in_a, in_b,
                 row_number() OVER (ORDER BY h) AS rk
          FROM flags) t
        WHERE rk <= 64),
      est AS (
        SELECT count(*) AS n_sketch,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both
        FROM sk),
      ex AS (
        SELECT CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_inter,
               count(*) AS n_union
        FROM flags)
      SELECT 64 AS k, n_sketch, n_both, n_inter, n_union,
             CASE WHEN n_sketch > 0 THEN
               (CAST(round((CAST(n_both AS DOUBLE)
                 / CAST(n_sketch AS DOUBLE)) * 1e6) AS BIGINT) / 1e6) END
               AS est_jaccard,
             CASE WHEN n_union > 0 THEN
               (CAST(round((CAST(n_inter AS DOUBLE)
                 / CAST(n_union AS DOUBLE)) * 1e6) AS BIGINT) / 1e6) END
               AS true_jaccard
      FROM est, ex"""))

  // --------------------------------------------------------------- q338
  // Pinball (quantile) loss evaluation ([EXT] model-eval pack) — the
  // metric the reference's `objective='quantile'` minimizes, shipped as
  // a QUERY: for τ ∈ {0.1, 0.5, 0.9}, select the exact per-type
  // τ-quantile of purchase-value cents from the value grid (k = ⌈τn⌉
  // lower selection, q232/q235 discipline) and report its mean pinball
  // loss ρ_τ. Closes the loop on the engine's documented quantile-GBT
  // deviation: whatever produces quantile predictions, THIS measures
  // them — and the selected quantile is the in-sample minimizer, the
  // property AnalyticsSpec can pin against any rival predictor.
  //
  // Exactness: with τ in tenths and integer cents, 10·ρ_τ is an exact
  // BIGINT per row — τ10·(y−q) above, (10−τ10)·(q−y) below — summed
  // exactly; the mean is ONE correctly-rounded division. Scale: one
  // corpus aggregate onto the (type, cents) grid; quantile selection
  // and loss both run on the GRID (loss terms weighted by grid counts).
  private val q338 = QueryDef(
    "q338_pinball_eval",
    (s, d) => {
      val grid = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id") % 7L as "seg",
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy(col("seg"), col("cents")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("seg")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = grid.withColumn("cum", sum(col("cnt")).over(wCum))
      val n = grid.groupBy(col("seg")).agg(sum(col("cnt")).as("n"))
      val taus = n.select(col("seg"), col("n"),
        explode(expr("array(1L, 5L, 9L)")).as("tau10"))
        .withColumn("k", expr("(tau10 * n + 9) DIV 10"))
      val qhat = taus.join(cum, "seg")
        .filter(col("cum") >= col("k"))
        .groupBy(col("seg"), col("tau10"), col("n"))
        .agg(min(col("cents")).as("q"))
      qhat.join(grid, "seg")
        .withColumn("pin10",
          when(col("cents") > col("q"),
            col("tau10") * (col("cents") - col("q")))
            .otherwise((lit(10L) - col("tau10")) *
              (col("q") - col("cents"))) * col("cnt"))
        .groupBy(col("seg"), col("tau10"), col("n"), col("q"))
        .agg(sum(col("pin10")).as("s10"))
        .select(col("seg"), (col("tau10").cast("double") / 10.0).as("tau"),
          col("n"), (col("q").cast("double") / 100.0).as("qhat_usd"),
          round(col("s10").cast("double") /
            (col("n") * 1000L).cast("double"), 6).as("mean_pinball_usd"))
        .orderBy(col("seg"), col("tau"))
    },
    Some("""
      WITH p AS (
        SELECT user_id % 7 AS seg,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      grid AS (
        SELECT seg, cents, count(*) AS cnt FROM p GROUP BY 1, 2),
      cum AS (
        SELECT seg, cents, cnt,
               CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY cents
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM grid),
      n AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n FROM grid GROUP BY 1),
      taus AS (
        SELECT seg, n, CAST(unnest([1, 5, 9]) AS BIGINT) AS tau10 FROM n),
      qh AS (
        SELECT t.seg, t.tau10, t.n, min(c.cents) AS q
        FROM taus t JOIN cum c ON c.seg = t.seg
        WHERE c.cum >= (t.tau10 * t.n + 9) // 10
        GROUP BY 1, 2, 3),
      loss AS (
        SELECT qh.seg, qh.tau10, qh.n, qh.q,
               CAST(sum((CASE WHEN g.cents > qh.q
                 THEN qh.tau10 * (g.cents - qh.q)
                 ELSE (10 - qh.tau10) * (qh.q - g.cents) END) * g.cnt)
                 AS BIGINT) AS s10
        FROM qh JOIN grid g ON g.seg = qh.seg
        GROUP BY 1, 2, 3, 4)
      SELECT seg, CAST(tau10 AS DOUBLE) / 10.0 AS tau, n,
             CAST(q AS DOUBLE) / 100.0 AS qhat_usd,
             round(CAST(s10 AS DOUBLE) / CAST(n * 1000 AS DOUBLE), 6)
               AS mean_pinball_usd
      FROM loss
      ORDER BY seg, tau"""))

  // --------------------------------------------------------------- q345
  // Cohort LTV triangle ([EXT] BI pack, the revenue sibling of q126's
  // retention counts): users cohort by FIRST-event week; each cohort's
  // purchase revenue accumulates across week offsets, normalized per
  // cohort member — the lifetime-value curve a growth team reads as the
  // classic lower-triangular (cohort × age) matrix. Offsets with no
  // events simply don't emit a row (the cumulative carries across the
  // gap) — the triangle is sparse by construction.
  //
  // Exactness: cents BIGINTs end-to-end; the cumulative runs per cohort
  // over the ≤ (weeks)² triangle grid; LTV is one division by the exact
  // cohort size (≥ 1 — a cohort exists only via its members). Scale:
  // two user-keyed aggregates + a triangle-grid window; nothing
  // downstream of the grid scales with the corpus.
  private val q345 = QueryDef(
    "q345_cohort_ltv_triangle",
    (s, d) => {
      val e = ev(s, d).select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT) DIV 7").as("w"),
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
      val firstW = e.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      val cohort = firstW.groupBy(col("cw"))
        .agg(count(lit(1)).as("cohort_users"))
      val tri = e.join(firstW, "user_id")
        .groupBy(col("cw"), (col("w") - col("cw")).as("off"))
        .agg(sum(col("cents")).as("sc"))
      val wCum = Window.partitionBy(col("cw")).orderBy(col("off"))
        .rowsBetween(Window.unboundedPreceding, 0)
      tri.withColumn("cum", sum(col("sc")).over(wCum))
        .join(broadcast(cohort), "cw")
        .select(col("cw").as("cohort_week"), col("off").as("week_offset"),
          col("cohort_users"),
          (col("sc").cast("double") / 100.0).as("rev_usd"),
          (col("cum").cast("double") / 100.0).as("cum_rev_usd"),
          round(col("cum").cast("double") /
            (col("cohort_users") * 100L).cast("double"), 6).as("ltv_usd"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH e AS (
        SELECT user_id,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT // 7 AS w,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE 0 END AS cents
        FROM events),
      fw AS (SELECT user_id, min(w) AS cw FROM e GROUP BY 1),
      cohort AS (SELECT cw, count(*) AS cohort_users FROM fw GROUP BY 1),
      tri AS (
        SELECT fw.cw, e.w - fw.cw AS off,
               CAST(sum(e.cents) AS BIGINT) AS sc
        FROM e JOIN fw ON fw.user_id = e.user_id
        GROUP BY 1, 2),
      cum AS (
        SELECT cw, off, sc,
               CAST(sum(sc) OVER (PARTITION BY cw ORDER BY off
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM tri)
      SELECT c.cw AS cohort_week, c.off AS week_offset, co.cohort_users,
             CAST(c.sc AS DOUBLE) / 100.0 AS rev_usd,
             CAST(c.cum AS DOUBLE) / 100.0 AS cum_rev_usd,
             round(CAST(c.cum AS DOUBLE)
                   / CAST(co.cohort_users * 100 AS DOUBLE), 6) AS ltv_usd
      FROM cum c JOIN cohort co ON co.cw = c.cw
      ORDER BY cohort_week, week_offset"""))

  // --------------------------------------------------------------- q347
  // Standardized Pearson residuals of the lang × source contingency
  // table ([EXT], the cell-level drill-down of q150's χ² and q342's
  // MI): WHICH cells drive the association — r = (o − e)/√(e(1−r/n)
  // (1−c/n)), flagged at |r| > 2 (the ±2σ convention). The audit that
  // turns "lang and source are dependent" into "zh is over-represented
  // in src7".
  //
  // Exactness: o, row/col/total masses are exact BIGINTs; e and the
  // residual are ONE fixed-order double expression mirrored
  // token-for-token (single √, roundZ final). A full-mass row/column
  // (r = n or c = n — the other margin is singleton) has no residual
  // variance → NULL, as DuckDB's /0 yields (DegenerateDataSpec class).
  // Scale: one corpus pass onto the ≤ |langs|·|sources| grid.
  private val q347 = QueryDef(
    "q347_chi2_residuals",
    (s, d) => {
      val grid = Tables.t(s, d, "documents")
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      val rl = grid.groupBy(col("lang")).agg(sum(col("o")).as("r"))
      val cs = grid.groupBy(col("source")).agg(sum(col("o")).as("c"))
      val n = grid.agg(sum(col("o")).as("n"))
      grid.join(broadcast(rl), "lang").join(broadcast(cs), "source")
        .crossJoin(broadcast(n))
        .withColumn("e",
          col("r").cast("double") * col("c").cast("double") /
            col("n").cast("double"))
        .withColumn("std_resid",
          when(col("n") - col("r") > 0L && col("n") - col("c") > 0L,
            Num.roundZ((col("o").cast("double") - col("e")) /
              sqrt(col("e") *
                (lit(1.0) - col("r").cast("double") / col("n").cast("double")) *
                (lit(1.0) - col("c").cast("double") / col("n").cast("double"))),
              4)))
        .select(col("lang"), col("source"), col("o"),
          round(col("e"), 4).as("expected"), col("std_resid"),
          (abs(col("std_resid")) > 2.0).as("outlier"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""
      WITH grid AS (
        SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      rl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM grid GROUP BY 1),
      cs AS (SELECT source, CAST(sum(o) AS BIGINT) AS c
             FROM grid GROUP BY 1),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM grid),
      j AS (
        SELECT g.lang, g.source, g.o,
               CAST(rl.r AS DOUBLE) * CAST(cs.c AS DOUBLE)
                 / CAST(n.n AS DOUBLE) AS e,
               CASE WHEN n.n - rl.r > 0 AND n.n - cs.c > 0 THEN
                 (CAST(round(((CAST(g.o AS DOUBLE) -
                    CAST(rl.r AS DOUBLE) * CAST(cs.c AS DOUBLE)
                      / CAST(n.n AS DOUBLE)) /
                   sqrt((CAST(rl.r AS DOUBLE) * CAST(cs.c AS DOUBLE)
                      / CAST(n.n AS DOUBLE)) *
                     (1.0 - CAST(rl.r AS DOUBLE) / CAST(n.n AS DOUBLE)) *
                     (1.0 - CAST(cs.c AS DOUBLE) / CAST(n.n AS DOUBLE))))
                   * 1e4) AS BIGINT) / 1e4) END AS std_resid
        FROM grid g JOIN rl USING (lang) JOIN cs USING (source)
        CROSS JOIN n)
      SELECT lang, source, o, round(e, 4) AS expected, std_resid,
             abs(std_resid) > 2.0 AS outlier
      FROM j
      ORDER BY lang, source"""))

  // --------------------------------------------------------------- q349
  // Demand-peak detection on the daily purchase series ([EXT] time-
  // series ops, beside q226's CUSUM changepoints and q166's per-entity
  // z-anomalies): a day is a PEAK when it exceeds both calendar
  // neighbors (local maximum; on an equal-valued plateau the ≥prev/>next
  // pair awards the LATER day — only the plateau's last day has a
  // strictly-smaller next neighbor) AND carries 1.05× its
  // trailing-week mean — the
  // prominence guard that keeps sub-noise wiggles out of the report
  // (sized to this testbed's smooth synthetic series, whose local
  // maxima top out ~1.15×; a spikier domain raises the knob).
  //
  // Exactness: the 1.05× test never materializes a float threshold —
  // 20·cents·n7 > 21·sum7 in exact BIGINTs; lift ships as one guarded
  // correctly-rounded division. Requires ≥ 3 trailing days so the
  // series head cannot self-certify. Scale: ONE corpus aggregate onto
  // the day grid; every window runs on the ≤366-row calendar grid.
  private val q349 = QueryDef(
    "q349_series_peaks",
    (s, d) => {
      val daily = ev(s, d).filter(col("event_type") === "purchase")
        .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val wN = Window.orderBy(col("day"))
      val wT = Window.orderBy(col("day")).rangeBetween(-7, -1)
      daily
        .withColumn("prev", lag(col("cents"), 1).over(wN))
        .withColumn("next", lead(col("cents"), 1).over(wN))
        .withColumn("sum7", sum(col("cents")).over(wT))
        .withColumn("n7", count(lit(1)).over(wT))
        .filter(col("prev").isNotNull && col("next").isNotNull &&
          col("cents") >= col("prev") && col("cents") > col("next") &&
          col("n7") >= 3L &&
          col("cents") * 20L * col("n7") > col("sum7") * 21L)
        .select(col("day"),
          (col("cents").cast("double") / 100.0).as("spend"),
          (col("prev").cast("double") / 100.0).as("prev_spend"),
          (col("next").cast("double") / 100.0).as("next_spend"),
          when(col("sum7") > 0L,
            Num.roundZ(col("cents").cast("double") * col("n7").cast("double")
              / col("sum7").cast("double"), 4)).as("lift_vs_week"))
        .orderBy(col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      w AS (
        SELECT day, cents,
               lag(cents) OVER (ORDER BY day) AS prev,
               lead(cents) OVER (ORDER BY day) AS next,
               CAST(sum(cents) OVER (ORDER BY day
                 RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
                 AS sum7,
               CAST(count(*) OVER (ORDER BY day
                 RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
                 AS n7
        FROM daily)
      SELECT day, CAST(cents AS DOUBLE) / 100.0 AS spend,
             CAST(prev AS DOUBLE) / 100.0 AS prev_spend,
             CAST(next AS DOUBLE) / 100.0 AS next_spend,
             CASE WHEN sum7 > 0 THEN
               (CAST(round((CAST(cents AS DOUBLE) * CAST(n7 AS DOUBLE)
                 / CAST(sum7 AS DOUBLE)) * 1e4) AS BIGINT) / 1e4) END
               AS lift_vs_week
      FROM w
      WHERE prev IS NOT NULL AND next IS NOT NULL
        AND cents >= prev AND cents > next AND n7 >= 3
        AND cents * 20 * n7 > sum7 * 21
      ORDER BY day"""))

  // --------------------------------------------------------------- q351
  // Modularity-based community detection ([EXT] graph family, the r9
  // verdict's item 4) — the Louvain-family operator beside q313's LPA:
  // LPA answers "which label wins locally", modularity merging answers
  // "which grouping beats chance edge mass". Synchronous per-NODE moves
  // (textbook Louvain phase 1) provably oscillate under simultaneous
  // application (measured here: label swaps made Q *fall* every round),
  // so the distributed restatement is MUTUAL-BEST MERGE agglomeration
  // (the parallel CNM / graph-coarsening family): per round every
  // community elects the neighbor with the largest positive merge gain
  // ΔQ·(2m)² = 2m·w_ab − Σtot_a·Σtot_b (ties → smallest id), and only
  // MUTUAL elections merge. Mutual-best pairs form a matching, so the
  // merges are conflict-free and each round increases modularity by
  // EXACTLY the sum of the elected gains — monotonicity is a theorem,
  // not a hope, and AnalyticsSpec pins it per round. 4 bounded rounds.
  //
  // Exactness: degrees/weights/gains are exact BIGINTs; the reported
  // q_contrib_num is Q's per-community numerator over (2m)² — no float
  // ever forms. Overflow envelope: Σtot ≤ 2m, so gains need (2m)² <
  // 2^63 → 2m < 3·10⁹ total co-occurrence weight; beyond that grain,
  // pre-scale w (DIV by a documented decade) or move the two products
  // to DECIMAL(38) — same knob discipline as q334's HitsScale.
  //
  // Scale: ONE corpus pass builds the basket pairs (q313's bound); adj
  // is edge-domain and checkpointed once (feeds deg, every round's btw,
  // and the final Σin); each round is two label joins + grid aggregates
  // on the community domain — the best-partner window partitions by
  // community over its neighbor communities, never corpus-global; label
  // state is node-domain and checkpointed per round (q334's iterative
  // discipline, lineage stays O(1)).
  private val MergeRounds = 4

  /** Shared with AnalyticsSpec (per-round monotonicity pin): labels after
    * `rounds` mutual-best merge rounds, plus (adj, deg) for the
    * modularity evaluation. */
  private[graft] def modularityMerge(s: SparkSession, d: String,
      rounds: Int): (DataFrame, DataFrame, DataFrame) = {
    val e = knnLiftEdges(s, d)
    val adj = e.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v"), col("w")))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
      .localCheckpoint() // feeds deg, every round's btw, the final sin
    val deg = adj.groupBy(col("u")).agg(sum(col("w")).as("k"))
      .localCheckpoint() // node-domain; joined every round
    val m2 = deg.agg(sum(col("k")).as("m2"))
    var lab = deg.select(col("u").as("node"), col("u").as("cid"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val tot = lab.join(deg, lab("node") === deg("u"))
        .groupBy(col("cid")).agg(sum(col("k")).as("tot"))
      val btw = adj
        .join(lab.select(col("node").as("u"), col("cid").as("ca")), "u")
        .join(lab.select(col("node").as("v"), col("cid").as("cb")), "v")
        .filter(col("ca") =!= col("cb"))
        .groupBy(col("ca"), col("cb")).agg(sum(col("w")).as("wab"))
      val gain = btw
        .join(tot.select(col("cid").as("ca"), col("tot").as("ta")), "ca")
        .join(tot.select(col("cid").as("cb"), col("tot").as("tb")), "cb")
        .crossJoin(broadcast(m2))
        .select(col("ca"), col("cb"),
          (col("m2") * col("wab") - col("ta") * col("tb")).as("gn"))
        .filter(col("gn") > 0L)
      val wB = Window.partitionBy(col("ca"))
        .orderBy(col("gn").desc, col("cb").asc)
      val best = gain.withColumn("rn", row_number().over(wB))
        .filter(col("rn") === 1).select(col("ca"), col("cb"))
      val mrg = best
        .join(best.select(col("cb").as("ca2"), col("ca").as("cb2")),
          col("ca") === col("ca2") && col("cb") === col("cb2"))
        .filter(col("ca") < col("cb"))
        .select(col("ca").as("keep"), col("cb").as("gone"))
      lab = lab.join(broadcast(mrg), lab("cid") === mrg("gone"), "left")
        .select(col("node"), coalesce(col("keep"), col("cid")).as("cid"))
        .localCheckpoint()
    }
    (lab, adj, deg)
  }

  /** Exact modularity numerator Q·(2m)² of a labeling (spec helper). */
  private[graft] def modularityNum(lab: DataFrame, adj: DataFrame,
      deg: DataFrame): Long = {
    val m2 = deg.agg(sum(col("k")).as("m2"))
    val tot = lab.join(deg, lab("node") === deg("u"))
      .groupBy(col("cid")).agg(sum(col("k")).as("tot"))
    val sin = adj
      .join(lab.select(col("node").as("u"), col("cid").as("ca")), "u")
      .join(lab.select(col("node").as("v"), col("cid").as("cb")), "v")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca")).agg(sum(col("w")).as("sin"))
      .select(col("ca").as("cid"), col("sin"))
    tot.join(sin, Seq("cid"), "left")
      .crossJoin(broadcast(m2))
      .agg(sum(col("m2") * coalesce(col("sin"), lit(0L))
        - col("tot") * col("tot")))
      .first().getLong(0)
  }

  private val q351 = QueryDef(
    "q351_modularity_communities",
    (s, d) => {
      val (lab, adj, deg) = modularityMerge(s, d, MergeRounds)
      val m2 = deg.agg(sum(col("k")).as("m2"))
      val tot = lab.join(deg, lab("node") === deg("u"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("k")).as("sigma_tot"))
      val sin = adj
        .join(lab.select(col("node").as("u"), col("cid").as("ca")), "u")
        .join(lab.select(col("node").as("v"), col("cid").as("cb")), "v")
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca")).agg(sum(col("w")).as("sigma_in"))
        .select(col("ca").as("cid"), col("sigma_in"))
      tot.join(sin, Seq("cid"), "left")
        .crossJoin(broadcast(m2))
        .select(col("cid").as("community"), col("n_nodes"),
          coalesce(col("sigma_in"), lit(0L)).as("sigma_in"),
          col("sigma_tot"),
          (col("m2") * coalesce(col("sigma_in"), lit(0L))
            - col("sigma_tot") * col("sigma_tot")).as("q_contrib_num"))
        .orderBy(col("community"))
    },
    Some {
      val rounds = (0 until MergeRounds).map { r => s""",
      tot$r AS (SELECT l.cid, CAST(sum(d.k) AS BIGINT) AS tot
           FROM l$r l JOIN deg d ON d.u = l.node GROUP BY 1),
      btw$r AS (SELECT lu.cid AS a, lv.cid AS b,
             CAST(sum(adj.w) AS BIGINT) AS wab
           FROM adj JOIN l$r lu ON lu.node = adj.u
           JOIN l$r lv ON lv.node = adj.v AND lv.cid <> lu.cid
           GROUP BY 1, 2),
      gain$r AS (SELECT g.a, g.b, m2.m2 * g.wab - ta.tot * tb.tot AS gn
            FROM btw$r g JOIN tot$r ta ON ta.cid = g.a
            JOIN tot$r tb ON tb.cid = g.b, m2
            WHERE m2.m2 * g.wab - ta.tot * tb.tot > 0),
      best$r AS (SELECT a, b FROM (
          SELECT a, b, row_number() OVER (PARTITION BY a
            ORDER BY gn DESC, b ASC) AS rn FROM gain$r) t WHERE rn = 1),
      mrg$r AS (SELECT x.a AS keep, x.b AS gone FROM best$r x
           JOIN best$r y ON y.a = x.b AND y.b = x.a WHERE x.a < x.b),
      l${r + 1} AS MATERIALIZED (
        SELECT l.node, coalesce(m.keep, l.cid) AS cid
        FROM l$r l LEFT JOIN mrg$r m ON m.gone = l.cid)"""
      }.mkString
      s"""
      WITH $knnEdgesSql,
      adj AS MATERIALIZED (
        SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
          SELECT a AS u, b AS v, w FROM edges
          UNION ALL SELECT b AS u, a AS v, w FROM edges) t GROUP BY 1, 2),
      deg AS MATERIALIZED (
        SELECT u, CAST(sum(w) AS BIGINT) AS k FROM adj GROUP BY 1),
      m2 AS (SELECT CAST(sum(k) AS BIGINT) AS m2 FROM deg),
      l0 AS (SELECT u AS node, u AS cid FROM deg)$rounds,
      tot AS (SELECT l.cid, CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(sum(d.k) AS BIGINT) AS sigma_tot
              FROM l$MergeRounds l JOIN deg d ON d.u = l.node GROUP BY 1),
      sin AS (SELECT lu.cid, CAST(sum(a.w) AS BIGINT) AS sigma_in
              FROM adj a JOIN l$MergeRounds lu ON lu.node = a.u
              JOIN l$MergeRounds lv ON lv.node = a.v AND lv.cid = lu.cid
              GROUP BY 1)
      SELECT t.cid AS community, t.n_nodes,
             CAST(coalesce(s.sigma_in, 0) AS BIGINT) AS sigma_in,
             t.sigma_tot,
             CAST(m2.m2 * coalesce(s.sigma_in, 0)
               - t.sigma_tot * t.sigma_tot AS BIGINT) AS q_contrib_num
      FROM tot t LEFT JOIN sin s ON s.cid = t.cid, m2
      ORDER BY community"""
    })

  // --------------------------------------------------------------- q353
  // Seasonal-naive forecast evaluation with MASE ([EXT] time-series
  // family, r9 verdict item 6) — completes the eval shelf beside q349
  // peaks / q152 TWA / q196 resample: three one-step forecasters run
  // prequentially over the daily purchase series (naive-1 ŷ_t = y_{t−1},
  // seasonal-naive-7 ŷ_t = y_{t−7}, trailing-week mean) and each is
  // scored by MAE and MASE (Hyndman's scale-free error: Σ|y−ŷ| over the
  // seasonal-naive error mass — snaive7's own MASE is identically 1, the
  // reference point that makes the other rows readable).
  //
  // Idle days are REAL zeros, not missing rows: the series is densified
  // onto the full min..max calendar grid before any lag (q274's lesson —
  // a left-join gap would silently shift every lag past it; spec-pinned
  // on a crafted gapped series). Exactness: errors are exact cents
  // BIGINTs; the trailing-mean error keeps a ×7 scale so no division
  // happens before the final guarded correctly-rounded ones (mean7's
  // MASE is Σ|7y−sum7| / (7·Σ|y−y7|) — a ratio of exact integers).
  // Scale: ONE corpus aggregate onto the day grid; every window runs on
  // the ≤366-row calendar grid (house grid-window discipline).
  private val q353 = QueryDef(
    "q353_forecast_mase",
    (s, d) => {
      val daily = ev(s, d).filter(col("event_type") === "purchase")
        .groupBy(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val filled = grid.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("cents"), lit(0L)).as("cents"))
      val w = Window.orderBy(col("day"))
      val wT = Window.orderBy(col("day")).rowsBetween(-7, -1)
      val f = filled
        .withColumn("y1", lag(col("cents"), 1).over(w))
        .withColumn("y7", lag(col("cents"), 7).over(w))
        .withColumn("sum7", sum(col("cents")).over(wT))
        .withColumn("n7", count(lit(1)).over(wT))
        .filter(col("y7").isNotNull && col("n7") === 7L)
      val sums = f.agg(count(lit(1)).as("n"),
        sum(abs(col("cents") - col("y1"))).as("s1"),
        sum(abs(col("cents") - col("y7"))).as("s7"),
        sum(abs(col("cents") * 7L - col("sum7"))).as("sm"))
      def row(name: String, errNum: org.apache.spark.sql.Column,
          errDen: Double): DataFrame =
        sums.select(lit(name).as("method"), col("n").as("n_days"),
          when(col("n") > 0L, Num.roundZ(errNum.cast("double")
            / (col("n").cast("double") * errDen), 4)).as("mae"),
          when(col("s7") > 0L, Num.roundZ(errNum.cast("double")
            / (col("s7").cast("double") * (errDen / 100.0)), 4)).as("mase"))
      row("mean7", col("sm"), 700.0)
        .unionByName(row("naive1", col("s1"), 100.0))
        .unionByName(row("snaive7", col("s7"), 100.0))
        .orderBy(col("method"))
    },
    Some("""
      WITH daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                 ::BIGINT AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      grid AS (SELECT unnest(range(b.d0, b.d1 + 1)) AS day FROM b),
      filled AS (
        SELECT g.day, coalesce(d.cents, 0) AS cents
        FROM grid g LEFT JOIN daily d USING (day)),
      e AS (
        SELECT day, cents,
               lag(cents, 1) OVER (ORDER BY day) AS y1,
               lag(cents, 7) OVER (ORDER BY day) AS y7,
               sum(cents) OVER (ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sum7,
               count(*) OVER (ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n7
        FROM filled),
      f AS (SELECT * FROM e WHERE y7 IS NOT NULL AND n7 = 7),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(abs(cents - y1)) AS BIGINT) AS s1,
                   CAST(sum(abs(cents - y7)) AS BIGINT) AS s7,
                   CAST(sum(abs(7 * cents - sum7)) AS BIGINT) AS sm
            FROM f),
      o AS (
        SELECT 'mean7' AS method, n AS n_days,
               CASE WHEN n > 0 THEN CAST(round((CAST(sm AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 700.0)) * 1e4) AS BIGINT) / 1e4 END
                 AS mae,
               CASE WHEN s7 > 0 THEN CAST(round((CAST(sm AS DOUBLE)
                 / (CAST(s7 AS DOUBLE) * 7.0)) * 1e4) AS BIGINT) / 1e4 END
                 AS mase
        FROM s
        UNION ALL
        SELECT 'naive1', n,
               CASE WHEN n > 0 THEN CAST(round((CAST(s1 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 100.0)) * 1e4) AS BIGINT) / 1e4 END,
               CASE WHEN s7 > 0 THEN CAST(round((CAST(s1 AS DOUBLE)
                 / (CAST(s7 AS DOUBLE) * 1.0)) * 1e4) AS BIGINT) / 1e4 END
        FROM s
        UNION ALL
        SELECT 'snaive7', n,
               CASE WHEN n > 0 THEN CAST(round((CAST(s7 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 100.0)) * 1e4) AS BIGINT) / 1e4 END,
               CASE WHEN s7 > 0 THEN CAST(round((CAST(s7 AS DOUBLE)
                 / (CAST(s7 AS DOUBLE) * 1.0)) * 1e4) AS BIGINT) / 1e4 END
        FROM s)
      SELECT method, n_days, mae, mase FROM o ORDER BY method"""))

  // --------------------------------------------------------------- q363
  // Luby maximal-independent-set rounds ([EXT] graph family, Luby 1986)
  // — the SELECTION member beside connectivity (q35/q99), ranking
  // (q140/q334), reachability (q183), density (q146) and community
  // (q313/q351): pick a set of brands no two of which are co-purchase
  // neighbors, the distributed primitive behind conflict-free
  // scheduling, landmark picking and graph-coloring seeds. Classic
  // synchronous Luby on the q313 3-NN lift graph (symmetrized): every
  // node draws a DETERMINISTIC priority (the house md5 idiom — a fixed
  // random permutation, identical in both engines); each round, a
  // remaining node with priority strictly below every remaining
  // neighbor's joins the MIS, its remaining neighbors become dominated,
  // both leave the graph. Two mis nodes can never be adjacent (each
  // would need the smaller priority — the independence theorem the spec
  // pins); rounds are a DECLARED bounded contract (K = 4, the
  // q146/q183 discipline), with unconverged nodes reported as 'open'
  // (expected-round theory is O(log n); the spec pins convergence on
  // the test grain).
  //
  // Scale: the corpus appears once, in q313's basket pair aggregate;
  // the graph is the brand grid (≤ B·k directed edges). Each round is
  // two grid equi-joins + one grid min-aggregate + an anti-join, with
  // the shrinking remainder localCheckpointed per round so the plan
  // stays O(1) in K — the q35 lesson. On a billion-node graph the same
  // plan holds: rounds are join+agg keyed on node, never driver-side.
  // Exactness: priorities are 56-bit md5 integers (collision-free at
  // any plausible |B|, and a collision only delays a pair — both fail
  // the strict <, stay remaining, and resolve against other neighbors);
  // everything else is set membership. The sentinel for isolated
  // remaining nodes is Long.MaxValue, above any 56-bit priority.
  private val MisRounds = 4
  private val q363 = QueryDef(
    "q363_luby_mis",
    (s, d) => {
      val und = knnLiftEdges(s, d)
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val adj = und.select(col("u").as("x"), col("v").as("y"))
        .union(und.select(col("v").as("x"), col("u").as("y")))
        .localCheckpoint()
      val pri0 = adj.select(col("x").as("node")).distinct()
        .withColumn("pri", expr(
          "CAST(conv(substr(md5(concat('mis:', CAST(node AS STRING))), " +
            "1, 14), 16, 10) AS BIGINT)"))
        .localCheckpoint()
      var rem = pri0
      // seeded empty so a degenerate (edgeless) graph yields zero rows
      // instead of an unset accumulator once the early-exit skips round 1
      var out: DataFrame = pri0.select(col("node"))
        .withColumn("status", lit("mis"))
        .withColumn("sel_round", lit(0L))
        .filter(lit(false))
      // early-exit on an empty remainder is output-equivalent (an empty
      // round tags nothing and leaves labels unchanged — the SQL mirror's
      // trailing rounds are no-ops on the same empty sets) and skips the
      // converged rounds' fixed job cost
      for (r <- 1 to MisRounds if !rem.isEmpty) {
        val nbMin = adj
          .join(rem.select(col("node").as("x")), "x")
          .join(rem.select(col("node").as("y"), col("pri").as("ypri")), "y")
          .groupBy(col("x")).agg(min(col("ypri")).as("mn"))
          .select(col("x").as("node"), col("mn"))
        val mis = rem.join(nbMin, Seq("node"), "left")
          .filter(col("pri") < coalesce(col("mn"), lit(Long.MaxValue)))
          .select(col("node"))
        val dom = adj
          .join(mis.select(col("node").as("x")), "x")
          .join(rem.select(col("node").as("y")), "y")
          .select(col("y").as("node")).distinct()
        val tagged = mis
          .withColumn("status", lit("mis"))
          .withColumn("sel_round", lit(r.toLong))
          .union(dom.withColumn("status", lit("dominated"))
            .withColumn("sel_round", lit(r.toLong)))
        out = out.union(tagged)
        rem = rem.join(tagged.select(col("node")), Seq("node"), "left_anti")
          .localCheckpoint()
      }
      out
        .union(rem.select(col("node"))
          .withColumn("status", lit("open"))
          .withColumn("sel_round", lit(0L)))
        .select(col("node").as("brand_id"), col("status"), col("sel_round"))
        .orderBy(col("brand_id"))
    },
    Some {
      val rounds = (1 to MisRounds).map { r =>
        val prev = if (r == 1) "rem0" else s"rem${r - 1}"
        s"""m$r AS MATERIALIZED (
        SELECT r.node FROM $prev r
        LEFT JOIN (SELECT a.x, min(p.pri) AS mn
                   FROM adj a JOIN $prev rx ON rx.node = a.x
                              JOIN $prev p ON p.node = a.y
                   GROUP BY 1) nb ON nb.x = r.node
        WHERE r.pri < coalesce(nb.mn, 9223372036854775807)),
      d$r AS MATERIALIZED (
        SELECT DISTINCT a.y AS node FROM adj a
        JOIN m$r ON m$r.node = a.x
        JOIN $prev ry ON ry.node = a.y),
      rem$r AS MATERIALIZED (
        SELECT r.* FROM $prev r
        WHERE NOT EXISTS (SELECT 1 FROM m$r WHERE m$r.node = r.node)
          AND NOT EXISTS (SELECT 1 FROM d$r WHERE d$r.node = r.node))"""
      }.mkString(",\n      ")
      val unions = (1 to MisRounds).map { r =>
        s"""SELECT node, 'mis' AS status, CAST($r AS BIGINT) AS sel_round
        FROM m$r
        UNION ALL
        SELECT node, 'dominated', CAST($r AS BIGINT) FROM d$r"""
      }.mkString("\n        UNION ALL\n        ")
      s"""
      WITH $knnEdgesSql,
      und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM edges WHERE a <> b),
      adj AS MATERIALIZED (
        SELECT u AS x, v AS y FROM und
        UNION ALL SELECT v, u FROM und),
      rem0 AS MATERIALIZED (
        SELECT x AS node,
               ('0x' || substr(md5('mis:' || CAST(x AS VARCHAR)), 1, 14))
                 ::BIGINT AS pri
        FROM (SELECT DISTINCT x FROM adj)),
      $rounds
      SELECT node AS brand_id, status, sel_round FROM (
        $unions
        UNION ALL
        SELECT node, 'open', CAST(0 AS BIGINT) FROM rem$MisRounds)
      ORDER BY brand_id"""
    })

  // --------------------------------------------------------------- q365
  // Holt–Winters additive seasonal smoothing ([EXT], Winters 1960) —
  // the terminal member of the exponential-smoothing ladder the board
  // climbs: q157 (single EWMA: level), q288 (Holt: level+trend,
  // per-user), q353 (seasonal-NAIVE baseline + MASE). This is the
  // coupled level+trend+SEASON recursion on the global daily purchase
  // series with weekly period m = 7 and α = β = γ = ½:
  //   l_t = (y_t − s_{t−7} + l_{t−1} + b_{t−1})/2
  //   b_t = (l_t − l_{t−1} + b_{t−1})/2
  //   s_t = (y_t − l_t + s_{t−7})/2
  // over the DENSE day grid (gap days are genuine $0 revenue — zero
  // fill, not LOCF; q134 owns the imputation alternative). Init is the
  // declared classical contract: l₇ = mean of week 1, b₇ = 0,
  // s_i = y_i − l₇ (needs ≥ 7 observed days; the events table spans
  // ~30). Output: the 7 h-step-ahead forecasts l + h·b + s_{t+h−7}
  // with their seasonal components, plus the in-sample one-step MAE —
  // directly comparable against q353's seasonal-naive MAE (the "did
  // the smoothing earn its keep" read).
  //
  // Scale: one map-side-combinable daily aggregate is the only corpus
  // pass; the fold runs over the DAY-GRID array (≤ span days at any
  // corpus size, the q157/q288 boundedness argument) inside one
  // codegen'd aggregate() on a single row. Exactness: state is exact
  // micro-dollar BIGINTs; every step is round((int±int)/2.0) — ≪ 2^52
  // operands, correctly-rounded halving, halves away from zero in both
  // engines — and the oracle's recursive CTE re-derives l_t inline so
  // both sides update b_t/s_t from the POST-ROUND level (q288's
  // divergence lesson). MAE accumulates exact |int| sums.
  private val q365 = QueryDef(
    "q365_holt_winters",
    (s, d) => {
      val daily = ev(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(expr(
          "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"))
        .agg((sum(round(col("value") * 100).cast("long")) * 10000L).as("y"))
      val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("day"))
      val dense = grid.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
      // structural degenerate guard: the <7-day series produces ZERO rows
      // (the oracle's rn=7 anchor join does the same), and the filter
      // sits BELOW the fold projections so slice(ys, 8, t-7) never sees
      // a negative length
      val st = dense
        .agg(sort_array(collect_list(struct(col("day"), col("y")))).as("a"))
        .select(expr("transform(a, x -> x.y)").as("ys"))
        .withColumn("t", size(col("ys")).cast("long"))
        .filter(col("t") >= 7L)
        .withColumn("l0", expr("CAST(round(aggregate(slice(ys, 1, 7), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x) / 7.0D) AS BIGINT)"))
        .withColumn("p0", expr("transform(slice(ys, 1, 7), x -> x - l0)"))
        .withColumn("st", expr("""
          aggregate(slice(ys, 8, CAST(t AS INT) - 7),
            named_struct('l', l0, 'b', CAST(0 AS BIGINT), 'p', p0,
                         'e', CAST(0 AS BIGINT)),
            (acc, y) -> named_struct(
              'l', CAST(round((y - element_at(acc.p, 1) + acc.l + acc.b)
                     / 2.0D) AS BIGINT),
              'b', CAST(round((CAST(round((y - element_at(acc.p, 1) + acc.l
                     + acc.b) / 2.0D) AS BIGINT) - acc.l + acc.b) / 2.0D)
                     AS BIGINT),
              'p', concat(slice(acc.p, 2, 6),
                     array(CAST(round((y - CAST(round((y
                       - element_at(acc.p, 1) + acc.l + acc.b) / 2.0D)
                       AS BIGINT) + element_at(acc.p, 1)) / 2.0D)
                       AS BIGINT))),
              'e', acc.e + abs(y - (acc.l + acc.b
                     + element_at(acc.p, 1)))))"""))
      st.select(explode(expr("sequence(1, 7)")).as("h"),
          col("t"), col("st"))
        .select(col("h").cast("long").as("h"),
          (expr("element_at(st.p, CAST(h AS INT))").cast("double")
            / lit(1e6)).as("season_usd"),
          ((col("st.l") + col("h") * col("st.b")
            + expr("element_at(st.p, CAST(h AS INT))")).cast("double")
            / lit(1e6)).as("forecast_usd"),
          col("t").as("n_days"),
          when(col("t") > 7L, Num.roundZ(col("st.e").cast("double")
            / ((col("t") - 7L).cast("double") * lit(1e6)), 6))
            .as("mae_usd"))
        .orderBy(col("h"))
    },
    Some("""
      WITH RECURSIVE daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 * 10000 AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM bounds),
      dense AS (
        SELECT g.day, coalesce(d.y, 0) AS y,
               row_number() OVER (ORDER BY g.day) AS rn
        FROM grid g LEFT JOIN daily d ON d.day = g.day),
      lim AS (SELECT CAST(max(rn) AS BIGINT) AS t FROM dense),
      init AS (
        SELECT CAST(7 AS BIGINT) AS rn,
               CAST(round(sum(y) / 7.0) AS BIGINT) AS l,
               CAST(0 AS BIGINT) AS b,
               list_transform(list(y ORDER BY rn),
                 yy -> yy - CAST(round(sum(y) / 7.0) AS BIGINT)) AS p,
               CAST(0 AS BIGINT) AS e
        FROM dense WHERE rn <= 7),
      h AS (
        SELECT rn, l, b, p, e FROM init
        UNION ALL
        SELECT o.rn,
               CAST(round((o.y - h.p[1] + h.l + h.b) / 2.0) AS BIGINT),
               CAST(round((CAST(round((o.y - h.p[1] + h.l + h.b) / 2.0)
                 AS BIGINT) - h.l + h.b) / 2.0) AS BIGINT),
               list_append(h.p[2:7],
                 CAST(round((o.y - CAST(round((o.y - h.p[1] + h.l + h.b)
                   / 2.0) AS BIGINT) + h.p[1]) / 2.0) AS BIGINT)),
               h.e + abs(o.y - (h.l + h.b + h.p[1]))
        FROM h JOIN dense o ON o.rn = h.rn + 1),
      fin AS (
        SELECT h.l, h.b, h.p, h.e, lim.t FROM h JOIN lim ON h.rn = lim.t)
      SELECT hh AS h,
             CAST(fin.p[hh] AS DOUBLE) / 1e6 AS season_usd,
             CAST(fin.l + hh * fin.b + fin.p[hh] AS DOUBLE) / 1e6
               AS forecast_usd,
             fin.t AS n_days,
             CASE WHEN fin.t > 7 THEN
               (CAST(round((CAST(fin.e AS DOUBLE)
                 / (CAST(fin.t - 7 AS DOUBLE) * 1e6)) * 1e6) AS BIGINT)
                 / 1e6)
             END AS mae_usd
      FROM fin, (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT) AS hh)
      ORDER BY h"""))

  // --------------------------------------------------------------- q368
  // Borůvka maximum spanning forest ([EXT], Borůvka 1926 — THE parallel
  // MST algorithm) — the backbone member of the graph family: given the
  // weighted co-purchase graph, keep the strongest acyclic skeleton
  // (taxonomy building / backbone extraction; minimum-spanning is the
  // same op with w negated). Classic synchronous Borůvka on the
  // symmetrized q313 lift graph: each round, every component selects
  // its best incident cross-edge under the SHARED TOTAL ORDER
  // (w DESC, u, v) — the total order is what makes the chosen set
  // provably acyclic under ties (any cycle would need its order-worst
  // edge to be some component's best) — then components merge along
  // chosen edges. The merge is the textbook pointer machinery: the
  // chooser→other functional graph has only 2-cycles (both endpoints
  // of the order-best edge of a part choose it), collapsed to
  // min-labeled roots, then 5 pointer-jump rounds (doubling covers
  // chooser chains of depth ≤ 2⁵ = 32 — sufficient here because the
  // brand grid has ~25 nodes, so no chain can be deeper; a general
  // graph would loop jumps to fixpoint instead). Rounds are a
  // declared bounded contract (R = 4; components at least halve per
  // round, so unconverged parts simply stop growing the forest — same
  // honesty as q363's 'open').
  //
  // Scale: corpus appears once (q313's basket pair aggregate);
  // everything after is the brand grid. Each round: two grid equi-joins
  // (labels onto edges), one grid argmin, ≤ 6 label-sized self-joins
  // (collapse + jumps), labels localCheckpointed per round (the q35
  // plan-growth lesson). On a billion-node graph the same plan holds —
  // this is exactly how Borůvka runs on Pregel. Exactness: weights are
  // exact co-occurrence counts; choice is an integer struct-min;
  // labels are BIGINT ids.
  private val BorRounds = 4
  private val q368 = QueryDef(
    "q368_boruvka_msf",
    (s, d) => {
      val und = knnLiftEdges(s, d)
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"), col("w"))
        .filter(col("u") =!= col("v"))
        .groupBy(col("u"), col("v")).agg(max(col("w")).as("w"))
        .localCheckpoint()
      var lbl = und.select(col("u").as("node"))
        .union(und.select(col("v").as("node"))).distinct()
        .withColumn("lbl", col("node"))
        .localCheckpoint()
      // seeded empty for the degenerate edgeless graph (early-exit would
      // otherwise leave the accumulator unset)
      var forest: DataFrame = und.select(col("u"), col("v"), col("w"))
        .withColumn("add_round", lit(0L)).filter(lit(false))
      // early-exit when no cross edges remain: a converged round chooses
      // nothing and relabels nothing (the SQL mirror's trailing rounds are
      // the same no-op), so skipping it is output-equivalent and saves the
      // ~8 fixed grid jobs per spent round
      var live = true
      for (r <- 1 to BorRounds if live) {
        val cg = und
          .join(lbl.select(col("node").as("u"), col("lbl").as("cu")), "u")
          .join(lbl.select(col("node").as("v"), col("lbl").as("cv")), "v")
          .filter(col("cu") =!= col("cv"))
          .localCheckpoint()
        live = !cg.isEmpty
        if (live) {
        val inc = cg.select(col("cu").as("c"), col("cv").as("oc"),
            col("u"), col("v"), col("w"))
          .union(cg.select(col("cv").as("c"), col("cu").as("oc"),
            col("u"), col("v"), col("w")))
        val ch = graft.ScaleCheckpoint(inc.groupBy(col("c"))
          .agg(min(struct((-col("w")).as("nw"), col("u"), col("v"),
            col("oc"))).as("m"))
          .select(col("c"), col("m.u").as("u"), col("m.v").as("v"),
            (-col("m.nw")).as("w"), col("m.oc").as("t")))
        val chosen = ch.select(col("u"), col("v"), col("w")).distinct()
          .withColumn("add_round", lit(r.toLong))
        forest = forest.union(chosen)
        val ptr = ch.select(col("c"), col("t"))
        val ptrB = ch.select(col("c").as("bc"), col("t").as("bt"))
        val coll = ptr.join(ptrB, col("t") === col("bc"), "left")
          .select(col("c"),
            when(col("bt") === col("c"), least(col("c"), col("t")))
              .otherwise(col("t")).as("p"))
        // ScaleCheckpoint, not plain localCheckpoint: each jump is a
        // SELF-join, so inherited size stats would SQUARE per jump —
        // the exponential-planning trap documented on the helper
        var par = graft.ScaleCheckpoint(lbl.select(col("lbl").as("c"))
          .distinct()
          .join(coll, Seq("c"), "left")
          .select(col("c"), coalesce(col("p"), col("c")).as("p")))
        for (_ <- 1 to 5)
          par = graft.ScaleCheckpoint(
            par.join(par.select(col("c").as("p"), col("p").as("pp")),
              Seq("p"), "left")
            .select(col("c"), coalesce(col("pp"), col("p")).as("p")))
        lbl = graft.ScaleCheckpoint(
          lbl.join(par.select(col("c").as("lbl"), col("p")), Seq("lbl"))
          .select(col("node"), col("p").as("lbl")))
        }
      }
      forest.select(col("u").as("brand_u"), col("v").as("brand_v"),
          col("w").as("cooc_w"), col("add_round"))
        .orderBy(col("brand_u"), col("brand_v"))
    },
    Some {
      def round(r: Int): String = {
        val prev = if (r == 1) "lbl0" else s"lbl${r - 1}"
        s"""cg$r AS (
        SELECT e.u, e.v, e.w, lu.lbl AS cu, lv.lbl AS cv
        FROM und e JOIN $prev lu ON lu.node = e.u
                   JOIN $prev lv ON lv.node = e.v
        WHERE lu.lbl <> lv.lbl),
      inc$r AS (
        SELECT cu AS c, cv AS oc, u, v, w FROM cg$r
        UNION ALL SELECT cv, cu, u, v, w FROM cg$r),
      ch$r AS MATERIALIZED (
        SELECT c, u, v, w, oc AS t FROM (
          SELECT c, u, v, w, oc, row_number() OVER (PARTITION BY c
            ORDER BY w DESC, u, v, oc) AS rn
          FROM inc$r) WHERE rn = 1),
      coll$r AS (
        SELECT a.c,
               CASE WHEN b.t = a.c THEN least(a.c, a.t) ELSE a.t END AS p
        FROM ch$r a LEFT JOIN ch$r b ON b.c = a.t),
      par${r}_0 AS (
        SELECT l.c, coalesce(x.p, l.c) AS p
        FROM (SELECT DISTINCT lbl AS c FROM $prev) l
        LEFT JOIN coll$r x ON x.c = l.c),
      ${(1 to 5).map(j =>
          s"""par${r}_$j AS (
        SELECT a.c, coalesce(b.p, a.p) AS p
        FROM par${r}_${j - 1} a LEFT JOIN par${r}_${j - 1} b ON b.c = a.p)""")
          .mkString(",\n      ")},
      lbl$r AS MATERIALIZED (
        SELECT n.node, j.p AS lbl
        FROM $prev n JOIN par${r}_5 j ON j.c = n.lbl)"""
      }
      val unions = (1 to BorRounds).map(r =>
        s"""SELECT DISTINCT u, v, w, CAST($r AS BIGINT) AS add_round
        FROM ch$r""").mkString("\n        UNION ALL\n        ")
      s"""
      WITH $knnEdgesSql,
      und AS MATERIALIZED (
        SELECT least(a, b) AS u, greatest(a, b) AS v,
               CAST(max(w) AS BIGINT) AS w
        FROM edges WHERE a <> b GROUP BY 1, 2),
      lbl0 AS (
        SELECT node, node AS lbl FROM (
          SELECT DISTINCT u AS node FROM und
          UNION SELECT DISTINCT v FROM und)),
      ${(1 to BorRounds).map(round).mkString(",\n      ")}
      SELECT u AS brand_u, v AS brand_v, w AS cooc_w, add_round FROM (
        $unions)
      ORDER BY brand_u, brand_v"""
    })

  // --------------------------------------------------------------- q369
  // Benjamini–Hochberg FDR over a FAMILY of tests ([EXT], Benjamini &
  // Hochberg 1995) — the multiple-testing member that closes the A/B
  // shelf: q149 Welch, q150 χ², q316 single permutation test, q336 SRM,
  // q231 target-decoy FDR (score thresholding); this is the canonical
  // p-value STEP-UP over m simultaneous hypotheses — run the weekend-
  // effect test per market segment and you must correct for running it
  // five times. Each segment's test is q316's machinery verbatim
  // (B = 200 md5 bit-sliced relabelings of order totalprice, empirical
  // p = (1 + #extreme)/(1 + B)); BH then sorts the family's p-values
  // and rejects ranks 1..k* where k* = max{k : p_(k) ≤ q·k/m}, q = 0.10.
  //
  // Exactness — the reason BH fits this engine exactly: empirical
  // permutation p-values are RATIONALS (e+1)/201, so the step-up
  // condition is the integer inequality 10·m·(e+1) ≤ 201·k — no float
  // ever decides a rejection. The p-rank orders by (n_extreme, seg):
  // identical to the p-value order (p is monotone in n_extreme) and
  // fully tie-broken. Scale: one corpus pass fans out ×B but collapses
  // map-side to the (segment × B) grid (q316's argument per segment);
  // BH itself runs on the m-row family grid.
  private val q369 = QueryDef(
    "q369_bh_fdr",
    (s, d) => {
      val base = Tables.t(s, d, "orders")
        .join(broadcast(Tables.t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"), col("o_orderkey").as("k"),
          when(dayofweek(col("o_orderdate")).isin(1, 7), 1L)
            .otherwise(0L).as("we"),
          round(col("o_totalprice") * 100).cast("long").as("c"))
      val obs = base.groupBy(col("seg")).agg(
          sum(when(col("we") === 1L, col("c"))).as("s1"),
          sum(when(col("we") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("we") === 0L, col("c"))).as("s0"),
          sum(when(col("we") === 0L, 1L).otherwise(0L)).as("n0"))
        .select(col("seg"), col("n1"), col("n0"),
          (col("s1").cast("double") / col("n1").cast("double")
            - col("s0").cast("double") / col("n0").cast("double"))
            .as("t_obs"))
      def h(j: Int) =
        conv(substring(md5(concat(lit(s"bh$j:"),
          col("k").cast("string"))), 1, 14), 16, 10)
          .cast("long").as(s"h$j")
      // r13: the ×200 explode below multiplies work AFTER a scan that is
      // ONE split at this SF (orders is a single small file), so the
      // fan-out + grid aggregate ran as two single-task stages carrying
      // 5.8 s of CPU while the rest of the machine idled (StageProf).
      // Scale.spreadForFanout spreads only while the scan is under-split
      // — pre-split production scans skip the exchange entirely.
      // Measured (alone, back-to-back): 7.9 -> 3.5 s.
      val reps = graft.Scale.spreadForFanout(base, col("k"))
        .select(col("seg"), col("c"), array(h(0), h(1), h(2), h(3)).as("hs"))
        .select(col("seg"), col("c"), col("hs"),
          explode(sequence(lit(1), lit(200))).as("b"))
        .withColumn("g",
          expr("(element_at(hs, CAST((b - 1) DIV 56 AS INT) + 1)" +
            " >> CAST((b - 1) % 56 AS INT)) & 1"))
        .groupBy(col("seg"), col("b"))
        .agg(sum(when(col("g") === 1L, col("c"))).as("s1"),
          sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === 0L, col("c"))).as("s0"),
          sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n0"))
        .select(col("seg"),
          (col("s1").cast("double") / col("n1").cast("double")
            - col("s0").cast("double") / col("n0").cast("double"))
            .as("t_b"))
      val pv = reps.join(broadcast(obs), Seq("seg"))
        .groupBy(col("seg"))
        .agg(max(col("n1")).as("n_we"), max(col("n0")).as("n_wd"),
          max(col("t_obs")).as("t_obs"),
          sum(when(abs(col("t_b")) >= abs(col("t_obs")), 1L)
            .otherwise(0L)).as("n_extreme"))
      val m = pv.agg(count(lit(1)).as("m"))
      val wR = Window.orderBy(col("n_extreme"), col("seg"))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      pv.crossJoin(broadcast(m))
        .withColumn("rnk", row_number().over(wR).cast("long"))
        .withColumn("ok", when(
          lit(10L) * col("m") * (col("n_extreme") + 1L)
            <= lit(201L) * col("rnk"), col("rnk")))
        .withColumn("kstar", coalesce(max(col("ok")).over(wAll), lit(0L)))
        .select(col("seg"), col("n_we"), col("n_wd"),
          Num.roundZ(col("t_obs") / lit(100.0), 6).as("t_obs_dollars"),
          col("n_extreme"),
          Num.roundZ((col("n_extreme") + 1L).cast("double") / lit(201.0), 6)
            .as("p_value"),
          col("rnk"),
          when(col("rnk") <= col("kstar"), 1L).otherwise(0L).as("reject"))
        .orderBy(col("rnk"))
    },
    Some("""
      WITH base AS (
        SELECT c.c_mktsegment AS seg, o.o_orderkey AS k,
               CASE WHEN dayofweek(o.o_orderdate) IN (0, 6)
                 THEN 1 ELSE 0 END AS we,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS c
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      obs AS (
        SELECT seg, CAST(sum(we) AS BIGINT) AS n1,
               CAST(sum(1 - we) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN we = 1 THEN c END) AS DOUBLE)
                   / CAST(sum(we) AS DOUBLE)
                 - CAST(sum(CASE WHEN we = 0 THEN c END) AS DOUBLE)
                   / CAST(sum(1 - we) AS DOUBLE) AS t_obs
        FROM base GROUP BY seg),
      hashed AS (
        SELECT seg, c,
               [('0x' || substr(md5('bh0:' || CAST(k AS VARCHAR)),
                  1, 14))::BIGINT,
                ('0x' || substr(md5('bh1:' || CAST(k AS VARCHAR)),
                  1, 14))::BIGINT,
                ('0x' || substr(md5('bh2:' || CAST(k AS VARCHAR)),
                  1, 14))::BIGINT,
                ('0x' || substr(md5('bh3:' || CAST(k AS VARCHAR)),
                  1, 14))::BIGINT] AS hs
        FROM base),
      reps AS (
        SELECT seg, t.b,
               CAST(sum(CASE WHEN (hs[CAST((t.b - 1) // 56 AS INTEGER) + 1]
                   >> CAST((t.b - 1) % 56 AS INTEGER)) & 1 = 1
                 THEN c END) AS DOUBLE)
                 / CAST(sum((hs[CAST((t.b - 1) // 56 AS INTEGER) + 1]
                   >> CAST((t.b - 1) % 56 AS INTEGER)) & 1) AS DOUBLE)
               - CAST(sum(CASE WHEN (hs[CAST((t.b - 1) // 56 AS INTEGER) + 1]
                   >> CAST((t.b - 1) % 56 AS INTEGER)) & 1 = 0
                 THEN c END) AS DOUBLE)
                 / CAST(sum(1 - ((hs[CAST((t.b - 1) // 56 AS INTEGER) + 1]
                   >> CAST((t.b - 1) % 56 AS INTEGER)) & 1)) AS DOUBLE)
                 AS t_b
        FROM hashed CROSS JOIN range(1, 201) t(b)
        GROUP BY seg, t.b),
      pv AS (
        SELECT o.seg, max(o.n1) AS n_we, max(o.n0) AS n_wd,
               max(o.t_obs) AS t_obs,
               CAST(sum(CASE WHEN abs(r.t_b) >= abs(o.t_obs) THEN 1
                 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM reps r JOIN obs o ON o.seg = r.seg
        GROUP BY o.seg),
      m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pv),
      rk AS (
        SELECT pv.*, m.m,
               CAST(row_number() OVER (ORDER BY n_extreme, seg) AS BIGINT)
                 AS rnk
        FROM pv, m),
      ks AS (
        SELECT coalesce(max(CASE WHEN 10 * m * (n_extreme + 1) <= 201 * rnk
                 THEN rnk END), 0) AS kstar
        FROM rk)
      SELECT seg, n_we, n_wd,
             (CAST(round((t_obs / 100.0) * 1e6) AS BIGINT) / 1e6)
               AS t_obs_dollars,
             n_extreme,
             (CAST(round((CAST(n_extreme + 1 AS DOUBLE) / 201.0) * 1e6)
               AS BIGINT) / 1e6) AS p_value,
             rnk,
             CAST(CASE WHEN rnk <= ks.kstar THEN 1 ELSE 0 END AS BIGINT)
               AS reject
      FROM rk, ks
      ORDER BY rnk"""))

  // --------------------------------------------------------------- q370
  // Tukey median polish ([EXT], Tukey 1977 EDA) — the ROBUST two-way
  // decomposition of the (week × day-of-week) revenue table:
  // y ≈ overall + week_effect + dow_effect + residual, fit by
  // alternately sweeping MEDIANS out of rows and columns. Division of
  // labor on the seasonality shelf: q365 Holt–Winters fits an additive
  // seasonal model by SMOOTHING (outlier-sensitive), q347's χ² residuals
  // test a MULTIPLICATIVE independence model on counts; median polish is
  // the additive fit a single crazy day cannot drag. Two full sweeps
  // (declared contract, the EDA default), each sweep: row medians →
  // week effects, then median of week effects → overall; column medians
  // → dow effects, then their median → overall. Output: the effects
  // table plus the residual MAD — the robust "how much structure is
  // left" number.
  //
  // Exactness — the trick that keeps a MEDIAN pipeline bitwise
  // cross-engine: never divide. A median of an even count is
  // (lo + hi)/2, so every subtract step instead DOUBLES the working
  // scale: r' = 2r − med2 where med2 = v_lo + v_hi (twice the median,
  // exact BIGINT). Six median steps per two sweeps → everything lives
  // at cents·2⁶ and is exact integer arithmetic end-to-end; the single
  // final division renders USD identically in both engines. Ranks pick
  // VALUES (rank-k order statistics of a multiset are tie-insensitive,
  // even though row_number itself is not). Scale: one corpus aggregate
  // onto the day grid; the polish runs entirely on the ≤ (weeks × 7)
  // grid — bounded by the calendar, never the corpus.
  private val q370 = QueryDef(
    "q370_median_polish",
    (s, d) => {
      val daily = ev(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("ts").cast("date").as("dt"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val grid = daily
        .agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("dt"),
          col("d0"))
      // cells at cents (scale 2^0); zero-filled gap days participate —
      // the robustness point: medians shrug them off
      var cells = grid.join(daily, Seq("dt"), "left")
        .select(expr("CAST(datediff(dt, d0) DIV 7 AS BIGINT)").as("wk"),
          (dayofweek(col("dt")) - 1).cast("long").as("dow"),
          coalesce(col("cents"), lit(0L)).as("v"))
        .localCheckpoint()
      var wEff = cells.select(col("wk")).distinct()
        .withColumn("e", lit(0L)).localCheckpoint()
      var dEff = cells.select(col("dow")).distinct()
        .withColumn("e", lit(0L)).localCheckpoint()
      var overall = cells.sparkSession.range(1)
        .select(lit(0L).as("t")).localCheckpoint()
      // med2 of `v` grouped by `key`: v_lo + v_hi = twice the median
      def med2(df: DataFrame, key: org.apache.spark.sql.Column,
          out: String): DataFrame = {
        val w = Window.partitionBy(col("k")).orderBy(col("v"))
        df.select(key.as("k"), col("v"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy(col("k"))).cast("long"))
          .groupBy(col("k"))
          .agg((sum(when(col("rn") === expr("(n + 1) DIV 2"), col("v")))
            + sum(when(col("rn") === expr("(n + 2) DIV 2"), col("v"))))
            .as(out))
      }
      // every step doubles EVERY table's scale (subtracting a med2 needs
      // the operand at 2x), so all four tables stay mutually comparable;
      // 4 steps per sweep x 2 sweeps = scale 2^8 at the end
      for (_ <- 1 to 2) {
        // step 1 — row (week) medians out of the cells
        val rm = med2(cells, col("wk"), "m2")
        cells = cells.join(broadcast(rm.withColumnRenamed("k", "wk")), "wk")
          .select(col("wk"), col("dow"),
            (col("v") * 2L - col("m2")).as("v")).localCheckpoint()
        wEff = wEff.join(broadcast(rm.withColumnRenamed("k", "wk")), "wk")
          .select(col("wk"), (col("e") * 2L + col("m2")).as("e"))
          .localCheckpoint()
        dEff = dEff.select(col("dow"), (col("e") * 2L).as("e"))
        overall = overall.select((col("t") * 2L).as("t"))
        // step 2 — median of week effects moves to the overall term
        val wm = med2(wEff.select(col("e").as("v")), lit(1), "m2")
        overall = overall.crossJoin(broadcast(wm))
          .select((col("t") * 2L + col("m2")).as("t"))
        wEff = wEff.crossJoin(broadcast(wm))
          .select(col("wk"), (col("e") * 2L - col("m2")).as("e"))
          .localCheckpoint()
        cells = cells.select(col("wk"), col("dow"), (col("v") * 2L).as("v"))
        dEff = dEff.select(col("dow"), (col("e") * 2L).as("e"))
        // step 3 — column (dow) medians out of the cells
        val cm = med2(cells, col("dow"), "m2")
        cells = cells.join(broadcast(cm.withColumnRenamed("k", "dow")),
            "dow")
          .select(col("wk"), col("dow"),
            (col("v") * 2L - col("m2")).as("v")).localCheckpoint()
        dEff = dEff.join(broadcast(cm.withColumnRenamed("k", "dow")), "dow")
          .select(col("dow"), (col("e") * 2L + col("m2")).as("e"))
          .localCheckpoint()
        wEff = wEff.select(col("wk"), (col("e") * 2L).as("e"))
        overall = overall.select((col("t") * 2L).as("t"))
        // step 4 — median of dow effects moves to the overall term
        val dm = med2(dEff.select(col("e").as("v")), lit(1), "m2")
        overall = overall.crossJoin(broadcast(dm))
          .select((col("t") * 2L + col("m2")).as("t")).localCheckpoint()
        dEff = dEff.crossJoin(broadcast(dm))
          .select(col("dow"), (col("e") * 2L - col("m2")).as("e"))
          .localCheckpoint()
        cells = cells.select(col("wk"), col("dow"), (col("v") * 2L).as("v"))
          .localCheckpoint()
        wEff = wEff.select(col("wk"), (col("e") * 2L).as("e"))
          .localCheckpoint()
      }
      // after 2 sweeps everything sits at cents · 2^8 (8 doublings)
      val S = 100.0 * 256.0
      val mad2 = med2(cells.select(abs(col("v")).as("v")), lit(1), "m2")
      val out = overall.select(lit("overall").as("component"),
          lit(-1L).as("k"), (col("t").cast("double") / lit(S)).as("usd"))
        .union(wEff.select(lit("week").as("component"), col("wk").as("k"),
          (col("e").cast("double") / lit(S)).as("usd")))
        .union(dEff.select(lit("dow").as("component"), col("dow").as("k"),
          (col("e").cast("double") / lit(S)).as("usd")))
        .union(mad2.select(lit("resid_mad").as("component"),
          lit(-1L).as("k"),
          (col("m2").cast("double") / lit(2.0 * S)).as("usd")))
      out.orderBy(col("component"), col("k"))
    },
    Some {
      // one median-subtract step as SQL: med2 by key, then 2r - med2
      def med2Sql(src: String, key: String): String =
        s"""(SELECT $key AS k, sum(CASE WHEN rn = (n + 1) // 2 THEN v END)
             + sum(CASE WHEN rn = (n + 2) // 2 THEN v END) AS m2
        FROM (SELECT $key, v,
                     row_number() OVER (PARTITION BY $key ORDER BY v)
                       AS rn,
                     count(*) OVER (PARTITION BY $key) AS n
              FROM $src)
        GROUP BY 1)"""
      def sweep(i: Int, prev: String): String = {
        val (c0, w0, d0, t0) =
          (s"cells$prev", s"weff$prev", s"deff$prev", s"ov$prev")
        s"""rm$i AS ${med2Sql(c0, "wk")},
      cellsr$i AS (SELECT c.wk, c.dow, c.v * 2 - rm$i.m2 AS v
                   FROM $c0 c JOIN rm$i ON rm$i.k = c.wk),
      weffr$i AS (SELECT w.wk, w.e * 2 + rm$i.m2 AS e
                  FROM $w0 w JOIN rm$i ON rm$i.k = w.wk),
      deffr$i AS (SELECT dow, e * 2 AS e FROM $d0),
      ovr$i AS (SELECT t * 2 AS t FROM $t0),
      wm$i AS ${med2Sql(s"(SELECT 1 AS o, e AS v FROM weffr$i)", "o")},
      ovw$i AS (SELECT t * 2 + wm$i.m2 AS t FROM ovr$i, wm$i),
      weffw$i AS (SELECT wk, e * 2 - wm$i.m2 AS e FROM weffr$i, wm$i),
      cellsw$i AS (SELECT wk, dow, v * 2 AS v FROM cellsr$i),
      deffw$i AS (SELECT dow, e * 2 AS e FROM deffr$i),
      cm$i AS ${med2Sql(s"cellsw$i", "dow")},
      cellsc$i AS (SELECT c.wk, c.dow, c.v * 2 - cm$i.m2 AS v
                   FROM cellsw$i c JOIN cm$i ON cm$i.k = c.dow),
      deffc$i AS (SELECT d.dow, d.e * 2 + cm$i.m2 AS e
                  FROM deffw$i d JOIN cm$i ON cm$i.k = d.dow),
      weffc$i AS (SELECT wk, e * 2 AS e FROM weffw$i),
      ovc$i AS (SELECT t * 2 AS t FROM ovw$i),
      dm$i AS ${med2Sql(s"(SELECT 1 AS o, e AS v FROM deffc$i)", "o")},
      ov$i AS (SELECT t * 2 + dm$i.m2 AS t FROM ovc$i, dm$i),
      deff$i AS (SELECT dow, e * 2 - dm$i.m2 AS e FROM deffc$i, dm$i),
      cells$i AS (SELECT wk, dow, v * 2 AS v FROM cellsc$i),
      weff$i AS (SELECT wk, e * 2 AS e FROM weffc$i)"""
      }
      s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS dt,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      bounds AS (SELECT min(dt) AS d0, max(dt) AS d1 FROM daily),
      grid AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
          AS DATE) AS dt, d0 FROM bounds),
      cells0 AS (
        SELECT date_diff('day', g.d0, g.dt) // 7 AS wk,
               dayofweek(g.dt)::BIGINT AS dow,
               coalesce(d.cents, 0) AS v
        FROM grid g LEFT JOIN daily d ON d.dt = g.dt),
      weff0 AS (SELECT DISTINCT wk, CAST(0 AS BIGINT) AS e FROM cells0),
      deff0 AS (SELECT DISTINCT dow, CAST(0 AS BIGINT) AS e FROM cells0),
      ov0 AS (SELECT CAST(0 AS BIGINT) AS t),
      ${sweep(1, "0")},
      ${sweep(2, "1")},
      mad AS ${med2Sql("(SELECT 1 AS o, abs(v) AS v FROM cells2)", "o")}
      SELECT component, k, usd FROM (
        SELECT 'overall' AS component, CAST(-1 AS BIGINT) AS k,
               CAST(t AS DOUBLE) / 25600.0 AS usd FROM ov2
        UNION ALL
        SELECT 'week', wk, CAST(e AS DOUBLE) / 25600.0 FROM weff2
        UNION ALL
        SELECT 'dow', dow, CAST(e AS DOUBLE) / 25600.0 FROM deff2
        UNION ALL
        SELECT 'resid_mad', CAST(-1 AS BIGINT),
               CAST(m2 AS DOUBLE) / 51200.0 FROM mad)
      ORDER BY component, k"""
    })

  // --------------------------------------------------------------- q372
  // Log-rank test between two survival cohorts ([EXT], Mantel 1966) —
  // the COMPARISON member of the survival shelf: q214 estimates one
  // Kaplan–Meier curve; this asks the canonical follow-up, "do
  // purchasers and non-purchasers churn at the same rate?", without
  // any distributional assumption. q214's observation model verbatim
  // (churn = last event > 24 h before the corpus horizon; t = hours
  // from first event), cohort g = has ≥ 1 purchase. At every death
  // time: O₁ = observed cohort-1 deaths, E₁ = d·n₁/n expected under
  // the shared-hazard null, V = d(n₁/n)(n₀/n)(n−d)/(n−1) the
  // hypergeometric variance; the statistic (ΣO₁ − ΣE₁)²/ΣV is χ²(1)
  // under the null, flagged against the 0.95 critical value (a shared
  // literal — no CDF needed for the decision).
  //
  // Scale: one user-keyed aggregate is the corpus pass; everything
  // after lives on the death-time VALUE grid (≤ horizon-span hours —
  // q214's boundedness argument), where the risk-set windows run.
  // Exactness: per-time E₁ and V are fixed-order double expressions
  // of exact BIGINT counts, quantized to 1e-9 integers BEFORE the
  // sums (q214's ln-discipline), so the grid aggregation is exact in
  // any order; the final statistic is one double expression of three
  // exact sums, roundZ 6. The n = 1 tail row (variance denominator
  // n−1 = 0) contributes V = 0 by the standard convention, guarded
  // identically in both engines.
  private val q372 = QueryDef(
    "q372_logrank_test",
    (s, d) => {
      val hr = expr("unix_micros(ts) DIV 3600000000")
      val pu = ev(s, d).groupBy(col("user_id"))
        .agg(min(hr).as("fd"), max(hr).as("ld"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
      val hz = ev(s, d).agg(max(hr).as("hz"))
      // cohort split at the exact lower median of per-user purchase
      // counts — computed on the np VALUE grid (np spans ~5..25 at any
      // SF), so the split self-calibrates with scale and stays exact
      val nUsers = pu.agg(count(lit(1)).as("nu"))
      val wNp = Window.orderBy(col("np"))
      val med = pu.groupBy(col("np")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          wNp.rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(nUsers))
        .filter(col("cum") * 2L >= col("nu") + 1L)
        .agg(min(col("np")).as("med"))
      val obs = pu.crossJoin(broadcast(hz)).crossJoin(broadcast(med))
        .withColumn("g", when(col("np") > col("med"), 1L).otherwise(0L))
        .withColumn("died",
          when(col("hz") - col("ld") > 24L, 1L).otherwise(0L))
        .withColumn("t",
          when(col("died") === 1L, col("ld") - col("fd"))
            .otherwise(col("hz") - col("fd")).cast("long"))
      val byT = obs.groupBy(col("t"))
        .agg(sum(col("died") * col("g")).as("d1"),
          sum(col("died") * (lit(1L) - col("g"))).as("d0"),
          sum(col("g")).as("c1"),
          sum(lit(1L) - col("g")).as("c0"))
      val wRisk = Window.orderBy(col("t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val terms = byT
        .withColumn("n1", sum(col("c1")).over(wRisk))
        .withColumn("n0", sum(col("c0")).over(wRisk))
        .filter(col("d1") + col("d0") > 0L)
        .select(col("d1"),
          round((col("d1") + col("d0")).cast("double")
            * col("n1").cast("double")
            / (col("n1") + col("n0")).cast("double") * lit(1e9))
            .cast("long").as("e1q"),
          when(col("n1") + col("n0") > 1L,
            round(((col("d1") + col("d0")).cast("double")
              * (col("n1").cast("double")
                / (col("n1") + col("n0")).cast("double"))
              * (col("n0").cast("double")
                / (col("n1") + col("n0")).cast("double"))
              * (col("n1") + col("n0") - col("d1") - col("d0"))
                .cast("double")
              / (col("n1") + col("n0") - 1L).cast("double")) * lit(1e9))
              .cast("long")).otherwise(0L).as("vq"))
      val grp = obs.agg(
        sum(col("g")).as("n_grp1"),
        sum(lit(1L) - col("g")).as("n_grp0"),
        sum(col("died") * col("g")).as("churn1"),
        sum(col("died") * (lit(1L) - col("g"))).as("churn0"))
      // the guarded χ² is computed ONCE as a named column (r11 ADVICE
      // closure: the old form re-evaluated the division as the right
      // operand of reject95's &&, the duplicated-subexpression pattern
      // the r10 CSE finding flags); chi2 and reject95 both derive from
      // it — chi2raw is NULL when vq = 0, so `chi2raw > crit` is NULL →
      // otherwise(0), identical to the old vq-guard
      terms.agg(sum(col("d1")).as("o1"), sum(col("e1q")).as("e1q"),
          sum(col("vq")).as("vq"))
        .crossJoin(broadcast(grp))
        .withColumn("dev", col("o1").cast("double")
          - col("e1q").cast("double") / lit(1e9))
        .withColumn("chi2raw", when(col("vq") > 0L,
          col("dev") * col("dev") / (col("vq").cast("double") / lit(1e9))))
        .select(col("n_grp1"), col("n_grp0"), col("churn1"), col("churn0"),
          col("o1"),
          Num.roundZ(col("e1q").cast("double") / lit(1e9), 6).as("e1"),
          Num.roundZ(col("vq").cast("double") / lit(1e9), 6).as("v"),
          Num.roundZ(col("chi2raw"), 6).as("chi2"),
          when(col("chi2raw") > lit(3.8414588206941254), 1L)
            .otherwise(0L).as("reject95"))
    },
    Some("""
      WITH pu AS (
        SELECT user_id, min(epoch_us(ts) // 3600000000) AS fd,
               max(epoch_us(ts) // 3600000000) AS ld,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                 END) AS BIGINT) AS np
        FROM events GROUP BY user_id),
      hz AS (SELECT max(epoch_us(ts) // 3600000000) AS hz FROM events),
      nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM pu),
      med AS (
        SELECT CAST(min(np) AS BIGINT) AS med FROM (
          SELECT np, sum(c) OVER (ORDER BY np
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM (SELECT np, CAST(count(*) AS BIGINT) AS c
                FROM pu GROUP BY 1)) g, nu
        WHERE g.cum * 2 >= nu.nu + 1),
      obs AS (
        SELECT CASE WHEN np > med THEN 1 ELSE 0 END AS g,
               CASE WHEN hz - ld > 24 THEN 1 ELSE 0 END AS died,
               CAST(CASE WHEN hz - ld > 24 THEN ld - fd
                         ELSE hz - fd END AS BIGINT) AS t
        FROM pu, hz, med),
      byt AS (
        SELECT t, CAST(sum(died * g) AS BIGINT) AS d1,
               CAST(sum(died * (1 - g)) AS BIGINT) AS d0,
               CAST(sum(g) AS BIGINT) AS c1,
               CAST(sum(1 - g) AS BIGINT) AS c0
        FROM obs GROUP BY t),
      r AS (
        SELECT t, d1, d0,
               CAST(sum(c1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
               CAST(sum(c0) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS BIGINT) AS n0
        FROM byt),
      terms AS (
        SELECT d1,
               CAST(round(CAST(d1 + d0 AS DOUBLE) * CAST(n1 AS DOUBLE)
                 / CAST(n1 + n0 AS DOUBLE) * 1e9) AS BIGINT) AS e1q,
               CASE WHEN n1 + n0 > 1 THEN
                 CAST(round((CAST(d1 + d0 AS DOUBLE)
                   * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                   * (CAST(n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                   * CAST(n1 + n0 - d1 - d0 AS DOUBLE)
                   / CAST(n1 + n0 - 1 AS DOUBLE)) * 1e9) AS BIGINT)
                 ELSE 0 END AS vq
        FROM r WHERE d1 + d0 > 0),
      grp AS (
        SELECT CAST(sum(g) AS BIGINT) AS n_grp1,
               CAST(sum(1 - g) AS BIGINT) AS n_grp0,
               CAST(sum(died * g) AS BIGINT) AS churn1,
               CAST(sum(died * (1 - g)) AS BIGINT) AS churn0
        FROM obs),
      agg AS (
        SELECT CAST(sum(d1) AS BIGINT) AS o1,
               CAST(sum(e1q) AS BIGINT) AS e1q,
               CAST(sum(vq) AS BIGINT) AS vq
        FROM terms),
      chi AS (
        SELECT grp.n_grp1, grp.n_grp0, grp.churn1, grp.churn0,
               agg.o1, agg.e1q, agg.vq,
               CASE WHEN agg.vq > 0 THEN
                 (CAST(agg.o1 AS DOUBLE) - CAST(agg.e1q AS DOUBLE) / 1e9)
                 * (CAST(agg.o1 AS DOUBLE) - CAST(agg.e1q AS DOUBLE) / 1e9)
                 / (CAST(agg.vq AS DOUBLE) / 1e9) END AS chi2raw
        FROM grp, agg)
      SELECT n_grp1, n_grp0, churn1, churn0, o1,
             (CAST(round((CAST(e1q AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
               / 1e6) AS e1,
             (CAST(round((CAST(vq AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
               / 1e6) AS v,
             (CAST(round(chi2raw * 1e6) AS BIGINT) / 1e6) AS chi2,
             CAST(CASE WHEN chi2raw > 3.8414588206941254
               THEN 1 ELSE 0 END AS BIGINT) AS reject95
      FROM chi"""))

  // --------------------------------------------------------------- q373
  // Betweenness centrality, sampled Brandes ([EXT]; Brandes 2001,
  // sampling per Brandes–Pich 2007) — the broker-detection member of
  // the graph shelf: PageRank/HITS score VISIBILITY, k-core DENSITY,
  // this scores CHOKEPOINTS (how much shortest-path traffic crosses a
  // node — the "which brand bridges the co-purchase communities"
  // read). Exact Brandes from K = 3 deterministic pivot sources (the
  // smallest brand ids — the published estimator averages over pivots;
  // K and the BFS depth D = 4 are declared bounded contracts like
  // q183's): forward BFS accumulates shortest-path counts σ level by
  // level (σ(v) = Σ σ(u) over predecessors), the backward pass
  // accumulates dependencies δ(u) += (σu/σw)(1 + δw) from the deepest
  // level up, and bc(v) = Σ_sources δ_s(v), v ≠ s.
  //
  // Scale: the corpus appears once (q313's basket pass); BFS/σ/δ are
  // 3·D grid joins keyed on (source, node), each localCheckpointed
  // (linear per-round growth — plain checkpoints suffice, the q368
  // squaring trap needs a SELF-join). On a billion-node graph this is
  // textbook Pregel Brandes; sampling K pivots is exactly how it runs
  // at that grain. Exactness: σ are exact BIGINT path counts; δ lives
  // in 1e-9 integer units — each edge contribution is ONE correctly-
  // rounded division round(σu·(1e9 + δq_w)/σw) of exact integers
  // (products ≪ 2^53), and level sums are exact in any order; the
  // oracle's unrolled CTEs replay the identical arithmetic.
  private val BcDepth = 4
  private val q373 = QueryDef(
    "q373_betweenness_brandes",
    (s, d) => {
      val und = knnLiftEdges(s, d)
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val adj = und.select(col("u").as("x"), col("v").as("y"))
        .union(und.select(col("v").as("x"), col("u").as("y")))
        .localCheckpoint()
      val nodes = adj.select(col("x").as("node")).distinct()
        .localCheckpoint()
      val sources = nodes.orderBy(col("node")).limit(3)
        .select(col("node").as("src"))
      // ScaleCheckpoint (not plain localCheckpoint) for the loop
      // accumulators: the rewrap mints FRESH attribute ids, so the
      // level/accumulator frames never collide with their own lineage in
      // the anti-join (Catalyst cannot dedup conflicting references
      // against a LogicalRDD), and the inherited-stats growth resets too
      var level = sources
        .select(col("src"), col("src").as("node"), lit(1L).as("sigma"))
      var distSig = graft.ScaleCheckpoint(
        level.withColumn("lvl", lit(0L)))
      for (l <- 1 to BcDepth) {
        val cand = level.join(adj, col("node") === col("x"))
          .select(col("src"), col("y").as("nnode"), col("sigma"))
          .groupBy(col("src"), col("nnode"))
          .agg(sum(col("sigma")).as("sigma"))
          .select(col("src"), col("nnode").as("node"), col("sigma"))
        level = graft.ScaleCheckpoint(
          cand.join(distSig.select(col("src"), col("node")),
            Seq("src", "node"), "left_anti"))
        distSig = graft.ScaleCheckpoint(distSig
          .union(level.withColumn("lvl", lit(l.toLong))))
      }
      var delta = graft.ScaleCheckpoint(
        distSig.select(col("src"), col("node"), lit(0L).as("dq")))
      for (l <- BcDepth to 1 by -1) {
        val ws = distSig.filter(col("lvl") === l.toLong)
          .join(delta, Seq("src", "node"))
          .select(col("src"), col("node").as("w"), col("sigma").as("sw"),
            col("dq").as("dw"))
        val us = distSig.filter(col("lvl") === (l - 1).toLong)
          .select(col("src"), col("node").as("u"), col("sigma").as("su"))
        val contrib = us
          .join(adj.select(col("x").as("u"), col("y").as("w")), "u")
          .join(ws, Seq("src", "w"))
          .select(col("src"), col("u").as("node"),
            round(col("su").cast("double")
              * (lit(1000000000L) + col("dw")).cast("double")
              / col("sw").cast("double")).cast("long").as("add"))
          .groupBy(col("src"), col("node")).agg(sum(col("add")).as("add"))
        delta = graft.ScaleCheckpoint(
          delta.join(contrib, Seq("src", "node"), "left")
          .select(col("src"), col("node"),
            (col("dq") + coalesce(col("add"), lit(0L))).as("dq")))
      }
      val bc = delta.filter(col("node") =!= col("src"))
        .groupBy(col("node")).agg(sum(col("dq")).as("dsum"))
      nodes.join(bc, Seq("node"), "left")
        .select(col("node").as("brand_id"),
          Num.roundZ(coalesce(col("dsum"), lit(0L)).cast("double")
            / lit(1e9), 6).as("betweenness"))
        .orderBy(col("brand_id"))
    },
    Some {
      val fwd = (1 to BcDepth).map { l =>
        s"""lv$l AS MATERIALIZED (
        SELECT c.src, c.node, c.sigma FROM (
          SELECT p.src, a.y AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
          FROM lv${l - 1} p JOIN adj a ON a.x = p.node
          GROUP BY 1, 2) c
        WHERE NOT EXISTS (SELECT 1 FROM ds${l - 1} d
                          WHERE d.src = c.src AND d.node = c.node)),
      ds$l AS MATERIALIZED (
        SELECT src, node, sigma, lvl FROM ds${l - 1}
        UNION ALL
        SELECT src, node, sigma, CAST($l AS BIGINT) FROM lv$l)"""
      }.mkString(",\n      ")
      val bwd = (1 to BcDepth).reverse.map { l =>
        val prev = if (l == BcDepth) s"dl${BcDepth + 1}" else s"dl${l + 1}"
        s"""ctr$l AS (
        SELECT u.src, u.node,
               CAST(sum(CAST(round(CAST(u.sigma AS DOUBLE)
                 * CAST(1000000000 + w.dq AS DOUBLE)
                 / CAST(w.sigma AS DOUBLE)) AS BIGINT)) AS BIGINT) AS v
        FROM (SELECT src, node, sigma FROM ds$BcDepth
              WHERE lvl = ${l - 1}) u
        JOIN adj a ON a.x = u.node
        JOIN (SELECT d.src, d.node, d.sigma, p.dq
              FROM ds$BcDepth d JOIN $prev p
                ON p.src = d.src AND p.node = d.node
              WHERE d.lvl = $l) w
          ON w.src = u.src AND w.node = a.y
        GROUP BY 1, 2),
      dl$l AS MATERIALIZED (
        SELECT p.src, p.node, p.dq + coalesce(c.v, 0) AS dq
        FROM $prev p LEFT JOIN ctr$l c
          ON c.src = p.src AND c.node = p.node)"""
      }.mkString(",\n      ")
      s"""
      WITH $knnEdgesSql,
      und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM edges WHERE a <> b),
      adj AS MATERIALIZED (
        SELECT u AS x, v AS y FROM und
        UNION ALL SELECT v, u FROM und),
      nodes AS (SELECT DISTINCT x AS node FROM adj),
      srcs AS (SELECT node AS src FROM nodes ORDER BY node LIMIT 3),
      lv0 AS (SELECT src, src AS node, CAST(1 AS BIGINT) AS sigma
              FROM srcs),
      ds0 AS (SELECT src, node, sigma, CAST(0 AS BIGINT) AS lvl FROM lv0),
      $fwd,
      dl${BcDepth + 1} AS (
        SELECT src, node, CAST(0 AS BIGINT) AS dq FROM ds$BcDepth),
      $bwd,
      bc AS (
        SELECT node, CAST(sum(dq) AS BIGINT) AS dsum
        FROM dl1 WHERE node <> src GROUP BY 1)
      SELECT n.node AS brand_id,
             (CAST(round((CAST(coalesce(bc.dsum, 0) AS DOUBLE) / 1e9)
               * 1e6) AS BIGINT) / 1e6) AS betweenness
      FROM nodes n LEFT JOIN bc ON bc.node = n.node
      ORDER BY brand_id"""
    })

  val defs: Seq[QueryDef] =
    Seq(q38, q52, q55, q102, q108, q125, q126, q127, q131, q132, q134,
      q140, q144, q145, q146, q149, q150, q152, q153, q157, q158, q160,
      q162, q164, q165, q166, q168, q169, q183, q184, q187, q188, q196,
      q209, q214, q215, q219, q220, q221, q222, q226, q230, q232,
      q235, q239, q240, q241, q242, q243, q244, q245, q254, q256, q257,
      q259, q262, q263, q265, q271, q274, q280, q288, q289, q291, q292, q293, q294, q296, q297, q298, q301, q302, q303, q305, q306, q307,
      q308, q309, q311, q313, q314, q315, q316, q319, q321, q323, q324, q325, q326, q330, q332,
      q334, q335, q336, q337, q338, q345, q347, q349, q351, q353, q363,
      q365, q368, q369, q370, q372, q373)
}
