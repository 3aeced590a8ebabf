package graft.operators

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{float_dot, float_norm, long_dot}

/** Similarity search over the `embeddings` table (SURVEY §2.C7/C9):
  * brute-force cosine top-k as the exact baseline, and an IVF-style
  * (inverted-file) bucketed variant as the scale path.
  *
  * Scale design: brute-force is queries × corpus — fine for a handful of
  * probe vectors (the broadcast side) against any corpus size, since the
  * corpus never shuffles: the tiny query set is broadcast and each corpus
  * partition computes its local scores; top-k is a TakeOrdered-style
  * per-partition heap + driver merge of k rows. The IVF variant prunes the
  * corpus to the probed cells first (centroid assignment is a broadcast
  * join), which is how you bound work when the query set grows.
  *
  * Dot products use the native codegen'd [[graft.functions.FloatDot]]
  * expression (double accumulation) — ~20× the throughput of the
  * interpreted `aggregate(zip_with(...))` fallback chain, and the whole
  * scoring projection stays inside WholeStageCodegen.
  */
object Similarity {

  /** The embeddings table MINUS zero-norm vectors: a zero vector has no
    * direction, so no cosine against it is defined — left in, it turns
    * every `dot/(n1·n2)` into an ANSI DIVIDE_BY_ZERO throw where DuckDB
    * yields NULL (the r8-verdict divergence class, surfaced for this
    * whole file by DegenerateDataSpec's zero-vector row). Excluding at
    * the SOURCE (here + the `embn` oracle CTE / per-oracle WHERE) keeps
    * the two engines identical without NULL-ordering divergence in the
    * top-k windows (Spark sorts NULL cos last, DuckDB first). The filter
    * is one codegen'd norm per row at the scan — free next to scoring. */
  private def emb(s: SparkSession, d: String) =
    Tables.t(s, d, "embeddings")
      .filter(float_norm(col("embedding")) > lit(0.0))

  /** Oracle mirror of [[emb]]'s zero-norm exclusion. */
  private val embnSql = """
      embn AS (
        SELECT * FROM embeddings
        WHERE list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0)"""

  /** Shared oracle CTEs: positional explode + norms. */
  private val evSql = s"""
      $embnSql,
      ev AS (
        SELECT vec_id, label,
               unnest(range(1, len(embedding) + 1)) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embn),
      norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ev GROUP BY 1)"""

  // ---------------------------------------------------------------- q50
  // Brute-force cosine top-k: exact baseline; probe set broadcast.
  private val q50 = QueryDef(
    "q50_cosine_topk",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("ea"),
          col("norm").as("qn"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("eb"),
        col("norm").as("cn"))
      val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
        .withColumn("cos", Num.roundZ(float_dot(col("ea"), col("eb")) / (col("qn") * col("cn")), 6))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("cid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
          col("cos"))
        .orderBy(col("qid"), col("rk"))
    },
    Some(s"""
      WITH $evSql,
      pairs AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON q.i = c.i AND q.vec_id < 3 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      scored AS (
        SELECT qid, cid, (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM pairs JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id)
      SELECT qid, CAST(rk AS BIGINT) AS rk, cid, cos FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        FROM scored) t
      WHERE rk <= 10
      ORDER BY qid, rk"""))

  /** IVF-bucketed ANN core, callable on any `(id, array<float>)` frame
    * (q51 runs it on the embeddings table; SimilaritySpec pins its recall
    * against exact brute force on planted clusters).
    *
    * Coarse centroids are SEEDED K-MEANS, run as `lloydIters` Lloyd
    * refinements from a deterministic seed (the first `centK` vectors by
    * id): assign every vector to its nearest center by cosine, then
    * recompute each center as the per-dimension MEAN of its members.
    * Means use exact fixed-point sums ([[graft.Num.avgFixed]]) and are
    * cast to float, so the DuckDB oracle reproduces every center bit —
    * which is why this is hand-rolled Lloyd rather than MLlib KMeans
    * (whose float reductions are not oracle-replicable). Each iteration
    * is one O(N·K) broadcast assignment plus one per-dimension hash
    * aggregation — K is a CONSTANT, so nothing here is corpus-quadratic
    * and the only shuffles are K·dim-sized. Nearest-cell selection is an
    * aggregation (partial+final min over a (negcos, cent_id) struct),
    * not a window — no N·K-row sort, no WindowExec buffering at scale.
    * Rows matching `isQuery` probe their `nProbe` nearest cells; exact
    * rerank within the probed cells only. Recall < 1 by construction;
    * the oracle replicates the same pruning so both engines return
    * identical results.
    */
  private def withNorm(e0: DataFrame, idCol: String, embCol: String): DataFrame =
    e0.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .withColumn("norm", float_norm(col("embedding")))

  /** Nearest-cell selection — argmin over (−cos, cent_id) per vector —
    * as a packed-int64 HASH aggregate. The direct
    * `min(struct(negcos, cent))` plans SortAggregate (struct buffers are
    * not hash-able), i.e. a per-task SORT of the N·K assignment table
    * before the partial agg — the q122/q30 trap at the N·K scale. `cos`
    * is always a `round(·, 6)` value here, so `1e6·cos` is an exact
    * integer: pack `(1e6 − 1e6·cos)` into the high bits and `cent_id`
    * into the low 21 (cent ids < 2^21 — the K ≈ 10⁵ production regime
    * fits with a 20× margin), take ONE integer `min`, and unpack. The
    * reconstructed cos (k/1e6 by correctly-rounded IEEE division) is
    * bit-equal to the original `round(·, 6)` double, and the integer
    * order equals the (−cos, cent_id) struct order exactly.
    */
  private def nearestCell(asg: DataFrame): DataFrame =
    asg.groupBy(col("vec_id"))
      .agg(min(
        (lit(1000000L) - round(col("cos") * 1e6).cast("long")) * 2097152L +
          col("cent_id")).as("p"))
      .select(col("vec_id"), (col("p") % 2097152L).as("cell"),
        ((lit(1000000L) - expr("p DIV 2097152")).cast("double") /
          lit(1e6)).as("cos"))

  /** The shared front half of [[ivfTopK]] and q116's corpus profile: runs
    * `lloydIters` seeded Lloyd refinements and returns the full
    * vector × refined-centroid cosine table `(vec_id, cent_id, cos)`.
    * O(N·K) per iteration via a broadcast of the K centroids; the only
    * shuffles are the K·dim-sized mean recomputations.
    */
  def lloydAsg(e0: DataFrame, idCol: String, embCol: String, centK: Int,
      lloydIters: Int): DataFrame = {
    val e = withNorm(e0, idCol, embCol)
    // deterministic seed: first centK vectors by id (TakeOrdered top-k)
    var cent = e.orderBy(col("vec_id")).limit(centK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ea"),
        col("norm").as("cent_n"))
    def assign(c: DataFrame): DataFrame =
      e.select(col("vec_id"), col("embedding").as("eb"), col("norm").as("vn"))
        .join(broadcast(c), lit(true))
        .withColumn("cos",
          Num.roundZ(float_dot(col("ea"), col("eb")) / (col("cent_n") * col("vn")), 6))
    for (_ <- 1 to lloydIters) {
      val cells = nearestCell(assign(cent))
        .select(col("vec_id"), col("cell"))
      // Lloyd step: per-dimension exact fixed-point mean of the members,
      // reassembled into a float array (cells that lose all members
      // simply vanish — deterministic in both engines)
      cent = cells.join(e, "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("i", "v")))
        .groupBy(col("cell"), col("i"))
        .agg(graft.Num.avgFixed(col("v").cast("double"), 6).as("m"))
        .groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(i, m)))," +
          " x -> cast(x.m as float))").as("ea"))
        .select(col("cell").as("cent_id"), col("ea"),
          float_norm(col("ea")).as("cent_n"))
    }
    assign(cent)
  }

  def ivfTopK(e0: DataFrame, idCol: String, embCol: String,
      isQuery: Column => Column, centK: Int, nProbe: Int, k: Int,
      lloydIters: Int = 2): DataFrame = {
    val e = withNorm(e0, idCol, embCol)
    // every vector scored against its nearest refined centroid set
    val asg = lloydAsg(e0, idCol, embCol, centK, lloydIters)
    // nearest cell = min over (−cos, cent_id): max cos, ties → min id —
    // identical tie-break to the oracle's row_number ORDER BY
    val cells = nearestCell(asg)
      .select(col("vec_id").as("cid"), col("cell"))
    // queries probe their top-nProbe cells: window over nQueries·K rows
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cent_id"))
    val probes = asg.filter(isQuery(col("vec_id")))
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("qid"), col("cent_id").as("cell"))
    // exact rerank within probed cells
    val q = e.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("qid2"), col("embedding").as("ea"),
        col("norm").as("qn"))
    val cand = probes.join(cells, "cell")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid")).distinct()
    val scored = cand
      .join(broadcast(q), col("qid") === col("qid2"))
      .join(e.select(col("vec_id").as("cid"), col("embedding").as("eb"),
        col("norm").as("cn")), "cid")
      .withColumn("cos", Num.roundZ(float_dot(col("ea"), col("eb")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
        col("cos"))
      .orderBy(col("qid"), col("rk"))
  }

  // ---------------------------------------------------------------- q51
  // IVF ANN over the embeddings table: K=16 seeded-KMeans centroids
  // (2 Lloyd iterations from the first-16-by-id seed, fixed-point means),
  // 3 query vectors probing their 2 nearest cells, exact top-5 rerank —
  // see [[ivfTopK]].
  private val CentK = 16
  private val LloydIters = 2

  /** Oracle CTE chain mirroring [[ivfTopK]]'s Lloyd refinement: centers
    * live exploded as `cv<t>(cent_id, i, cv)` + norms `cn<t>`; each
    * iteration assigns (round-6 cosine, ties to min cent_id) and
    * recomputes per-dimension fixed-point means cast through FLOAT —
    * bit-identical to Spark's `avgFixed` + `cast(m as float)`.
    */
  private def lloydCtes(iters: Int): String = {
    val sb = new StringBuilder(s"""
      cent0 AS (SELECT vec_id AS cent_id FROM embn ORDER BY vec_id LIMIT $CentK),
      cv0 AS (SELECT c.cent_id, e.i, e.v AS cv
              FROM cent0 c JOIN ev e ON e.vec_id = c.cent_id),
      cn0 AS (SELECT cent_id, sqrt(sum(cv * cv)) AS cn FROM cv0 GROUP BY 1)""")
    for (t <- 0 until iters) {
      sb ++= s""",
      asg$t AS (
        SELECT e.vec_id, c.cent_id,
               (CAST(round((sum(e.v * c.cv) / (ne.nrm * n.cn)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cv$t c ON c.i = e.i
        JOIN norms ne ON ne.vec_id = e.vec_id
        JOIN cn$t n ON n.cent_id = c.cent_id
        GROUP BY e.vec_id, c.cent_id, ne.nrm, n.cn),
      cell$t AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
          FROM asg$t) t
        WHERE rn = 1),
      cv${t + 1} AS (
        SELECT l.cell AS cent_id, e.i,
               CAST(CAST(${graft.Num.avgFixedSql("e.v", 6)} AS FLOAT) AS DOUBLE) AS cv
        FROM cell$t l JOIN ev e ON e.vec_id = l.vec_id
        GROUP BY l.cell, e.i),
      cn${t + 1} AS (SELECT cent_id, sqrt(sum(cv * cv)) AS cn
                     FROM cv${t + 1} GROUP BY 1)"""
    }
    sb.toString
  }

  private val q51 = QueryDef(
    "q51_ann_ivf",
    (s, d) =>
      ivfTopK(emb(s, d), "vec_id", "embedding", _ < 3, CentK, 2, 5, LloydIters),
    Some(s"""
      WITH $evSql,
      ${lloydCtes(LloydIters)},
      asg AS (
        SELECT e.vec_id, c.cent_id,
               (CAST(round((sum(e.v * c.cv) / (ne.nrm * n.cn)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cv$LloydIters c ON c.i = e.i
        JOIN norms ne ON ne.vec_id = e.vec_id
        JOIN cn$LloydIters n ON n.cent_id = c.cent_id
        GROUP BY e.vec_id, c.cent_id, ne.nrm, n.cn),
      cells AS (
        SELECT vec_id AS cid, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
          FROM asg) t
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS qid, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
          FROM asg WHERE vec_id < 3) t
        WHERE rn <= 2),
      cand AS (
        SELECT DISTINCT qid, cid
        FROM probes JOIN cells USING (cell)
        WHERE qid <> cid),
      pairs AS (
        SELECT qid, cid, sum(q.v * c.v) AS dot
        FROM cand
        JOIN ev q ON q.vec_id = qid
        JOIN ev c ON c.vec_id = cid AND c.i = q.i
        GROUP BY 1, 2),
      scored AS (
        SELECT qid, cid, (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM pairs JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id)
      SELECT qid, CAST(rk AS BIGINT) AS rk, cid, cos FROM (
        SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
        FROM scored) t
      WHERE rk <= 5
      ORDER BY qid, rk"""))

  // --------------------------------------------------------------- q111
  // Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.):
  // fuse a lexical arm (q110's rational-idf BM25 over the query terms)
  // with a vector arm (cosine against a probe embedding) by summing
  // 1/(60 + rank) over the arms each document appears in — the standard
  // score-free fusion used when lexical and vector scores are not
  // calibrated against each other. The testbed treats embeddings.vec_id
  // as the embedding of documents.doc_id (same 0..N−1 id domain); vec 0
  // is the probe and doc 0 is excluded from both arms as "the query".
  //
  // Scale: each arm is already bounded — BM25 filters the token stream to
  // |Q| terms before aggregating and TakeOrders k=20 rows; the cosine arm
  // broadcasts ONE probe vector so the corpus never shuffles, then
  // TakeOrders 20. The rank windows and the full-outer fusion join run
  // over ≤ 20 rows per arm — driver-mergeable, corpus-independent. RRF
  // arithmetic is two IEEE divisions and one add on identically-written
  // literals, bit-deterministic across engines.
  private val q111 = QueryDef(
    "q111_hybrid_rrf",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("ea"), col("norm").as("qn"))
      val ctop = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("cid"), col("embedding").as("eb"),
          col("norm").as("cn"))
        .crossJoin(broadcast(q))
        .withColumn("cos",
          Num.roundZ(float_dot(col("ea"), col("eb")) / (col("qn") * col("cn")), 6))
        .orderBy(col("cos").desc, col("cid")).limit(20)
      val wc = Window.orderBy(col("cos").desc, col("cid"))
      val crank = ctop.withColumn("cos_rk", row_number().over(wc).cast("long"))
        .select(col("cid").as("doc_id"), col("cos_rk"))
      val btop = TextAnalysis.bm25Scores(s, d)
        .filter(col("doc_id") =!= 0)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
      val wb = Window.orderBy(col("score").desc, col("doc_id"))
      val brank = btop.withColumn("bm25_rk", row_number().over(wb).cast("long"))
        .select(col("doc_id"), col("bm25_rk"))
      brank.join(crank, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60L) + col("bm25_rk")).cast("double"),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + col("cos_rk")).cast("double"),
            lit(0.0)), 6))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), col("bm25_rk"), col("cos_rk"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
    },
    Some(s"""
      WITH $evSql,
      ${TextAnalysis.bm25Ctes},
      cpairs AS (
        SELECT c.vec_id AS cid, sum(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON q.i = c.i AND q.vec_id = 0 AND c.vec_id <> 0
        GROUP BY 1),
      cscore AS (
        SELECT cid, (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM cpairs
        JOIN norms nq ON nq.vec_id = 0
        JOIN norms nc ON nc.vec_id = cid),
      crank AS (
        SELECT cid AS doc_id, CAST(rn AS BIGINT) AS cos_rk FROM (
          SELECT cid, row_number() OVER (ORDER BY cos DESC, cid) AS rn
          FROM cscore) t
        WHERE rn <= 20),
      brank AS (
        SELECT doc_id, CAST(rn AS BIGINT) AS bm25_rk FROM (
          SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn
          FROM bm25 WHERE doc_id <> 0) t
        WHERE rn <= 20),
      fused AS (
        SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id, b.bm25_rk, c.cos_rk,
               round(COALESCE(1.0 / CAST(60 + b.bm25_rk AS DOUBLE), 0.0)
                     + COALESCE(1.0 / CAST(60 + c.cos_rk AS DOUBLE), 0.0), 6) AS rrf
        FROM brank b FULL OUTER JOIN crank c ON b.doc_id = c.doc_id)
      SELECT doc_id, bm25_rk, cos_rk, rrf FROM (
        SELECT doc_id, bm25_rk, cos_rk, rrf,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn
        FROM fused) t
      WHERE rn <= 10
      ORDER BY rrf DESC, doc_id"""))

  // --------------------------------------------------------------- q116
  // Corpus cluster profile — the "organize the corpus by topic" report:
  // assign EVERY embedding to its nearest refined centroid (the same
  // seeded-KMeans [[lloydAsg]] front half q51's index uses) and summarize
  // each cluster: size, mean cosine-to-centroid (cohesion), majority
  // label + its count (purity proxy), smallest member id. Where q51
  // answers point lookups, this is the full-corpus curation view — which
  // clusters are tight, which are junk drawers worth re-clustering.
  // Scale: assignment is a broadcast of K centroids against the corpus
  // (O(N·K), no corpus shuffle); the label attach is one co-keyed
  // equi-join on vec_id; every aggregate downstream is K- or
  // (K·|labels|)-sized. Mean cohesion uses the exact fixed-point
  // [[graft.Num.avgFixed]] so both engines emit identical bits; majority
  // label ties break to the smaller label via the same min-over-struct
  // idiom as nearest-cell selection.
  private val q116 = QueryDef(
    "q116_cluster_profile",
    (s, d) => {
      val asg = lloydAsg(emb(s, d), "vec_id", "embedding", CentK, LloydIters)
      // cells feeds two branches (sizes/cohesion + label purity); a
      // localCheckpoint here was measured (sf0.1, warm JVM) at 2.8 s vs
      // 2.2 s WITHOUT — exchange reuse already shares the Lloyd chain's
      // shuffles between the branches, so materialization only adds cost
      // (the q31 precedent, not the q32 one)
      val cells = nearestCell(asg)
      val withLab = cells
        .join(emb(s, d).select(col("vec_id"), col("label")), "vec_id")
      // majority label = argmin over (−count, label), packed into one
      // int64 ((2^42 − c) · 2^20 + label; counts < 2^42, labels < 2^20)
      // so the aggregate is a pure HashAggregate like [[nearestCell]] —
      // the input is only |cells|·|labels| rows, but the packed form
      // costs nothing and keeps the plan sort-free end to end
      val top = withLab.groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("cell"))
        .agg(min((lit(4398046511104L) - col("c")) * 1048576L +
          col("label").cast("long")).as("p"))
        .select(col("cell"), (col("p") % 1048576L).as("top_label"),
          (lit(4398046511104L) - expr("p DIV 1048576")).as("top_n"))
      withLab.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"),
          graft.Num.avgFixed(col("cos"), 6).as("mean_cos"),
          min(col("vec_id")).as("min_vec"))
        .join(top, "cell")
        .select(col("cell"), col("n_vecs"), col("mean_cos"), col("min_vec"),
          col("top_label"), col("top_n"))
        .orderBy(col("cell"))
    },
    Some(s"""
      WITH $evSql,
      ${lloydCtes(LloydIters)},
      asg AS (
        SELECT e.vec_id, c.cent_id,
               (CAST(round((sum(e.v * c.cv) / (ne.nrm * n.cn)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cv$LloydIters c ON c.i = e.i
        JOIN norms ne ON ne.vec_id = e.vec_id
        JOIN cn$LloydIters n ON n.cent_id = c.cent_id
        GROUP BY e.vec_id, c.cent_id, ne.nrm, n.cn),
      cells AS (
        SELECT vec_id, cent_id AS cell, cos FROM (
          SELECT vec_id, cent_id, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cent_id) AS rn
          FROM asg) t
        WHERE rn = 1),
      wl AS (
        SELECT c.vec_id, c.cell, c.cos, e.label
        FROM cells c JOIN embeddings e USING (vec_id)),
      top AS (
        SELECT cell, CAST(label AS BIGINT) AS top_label,
               CAST(c AS BIGINT) AS top_n FROM (
          SELECT cell, label, count(*) AS c,
                 row_number() OVER (PARTITION BY cell
                                    ORDER BY count(*) DESC, label) AS rn
          FROM wl GROUP BY cell, label) t
        WHERE rn = 1),
      agg AS (
        SELECT cell, count(*) AS n_vecs,
               ${graft.Num.avgFixedSql("cos", 6)} AS mean_cos,
               CAST(min(vec_id) AS BIGINT) AS min_vec
        FROM wl GROUP BY cell)
      SELECT a.cell, a.n_vecs, a.mean_cos, a.min_vec, t.top_label, t.top_n
      FROM agg a JOIN top t USING (cell)
      ORDER BY a.cell"""))

  // --------------------------------------------------------------- q137
  // Semantic dedup — cluster-then-prune (the SemDeDup recipe, Abbas et
  // al., arXiv:2303.09540): assign every embedding to a seeded-KMeans
  // cell (the same [[lloydAsg]] front half as q51/q116), then compare
  // pairs ONLY within a cell and drop every vector that has a
  // smaller-id cell-mate with cosine ≥ τ — one survivor per ε-ball,
  // deterministically the minimum id. Where q34 finds near-dups by LSH
  // banding (recall < 1 by construction), this is the embedding-space
  // curation pass that bounds the pair space by CLUSTERING: the
  // quadratic term is Σ|cell|², never N².
  //
  // Scale: the assignment is q51's broadcast O(N·K) pass — no corpus
  // shuffle. The pairwise stage shuffles members once, keyed by cell;
  // in-cell work is quadratic, which is exactly the SemDeDup contract —
  // K grows with the corpus (practical deployments use K ≈ 10⁵) so
  // |cell| ≈ N/K stays bounded; the testbed pins K=16 because the
  // oracle replays every Lloyd bit. The keeper choice min(struct(ia,
  // cos)) is an aggregation, not a window — partial+final hash agg, no
  // per-cell sort. Cosines are exact FloatDot/norm bits both engines.
  private val SemTau = 0.35
  private val q137 = QueryDef(
    "q137_semantic_dedup",
    (s, d) => {
      val e = withNorm(emb(s, d), "vec_id", "embedding")
      val asg = lloydAsg(emb(s, d), "vec_id", "embedding", CentK, LloydIters)
      val cells = nearestCell(asg).select(col("vec_id"), col("cell"))
      val m = cells.join(e, "vec_id")
      val a = m.select(col("cell"), col("vec_id").as("ia"),
        col("embedding").as("ea"), col("norm").as("na"))
      val b = m.select(col("cell").as("cellb"), col("vec_id").as("ib"),
        col("embedding").as("eb"), col("norm").as("nb"))
      a.join(b, col("cell") === col("cellb") && col("ia") < col("ib"))
        .withColumn("cos",
          Num.roundZ(float_dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6))
        .filter(col("cos") >= SemTau)
        // keeper = argmin by ia (each ia appears once per (cell, ib), so
        // cos never participates in the ordering — it just rides along):
        // pack ia into the high bits and the exact 1e6-scaled cos into
        // the low 21, one integer min, pure HashAggregate (the
        // [[nearestCell]] discipline; ia < 2^42 contract)
        .groupBy(col("cell"), col("ib").as("dropped_id"))
        .agg(min(col("ia") * 2097152L +
          (round(col("cos") * 1e6).cast("long") + 1000000L)).as("p"))
        .select(col("cell"), col("dropped_id"),
          expr("p DIV 2097152").as("keeper_id"),
          ((col("p") % 2097152L - 1000000L).cast("double") / lit(1e6))
            .as("keeper_cos"))
        .orderBy(col("dropped_id"))
    },
    Some(s"""
      WITH $evSql,
      ${lloydCtes(LloydIters)},
      asg AS (
        SELECT e.vec_id, c.cent_id,
               (CAST(round((sum(e.v * c.cv) / (ne.nrm * n.cn)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cv$LloydIters c ON c.i = e.i
        JOIN norms ne ON ne.vec_id = e.vec_id
        JOIN cn$LloydIters n ON n.cent_id = c.cent_id
        GROUP BY e.vec_id, c.cent_id, ne.nrm, n.cn),
      cells AS (
        SELECT vec_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cent_id) AS rn
          FROM asg) t
        WHERE rn = 1),
      pairs AS (
        SELECT x.cell, x.vec_id AS ia, y.vec_id AS ib, sum(a.v * b.v) AS dot
        FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id
        JOIN ev a ON a.vec_id = x.vec_id
        JOIN ev b ON b.vec_id = y.vec_id AND a.i = b.i
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT cell, ia, ib, (CAST(round((dot / (na.nrm * nb.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM pairs
        JOIN norms na ON ia = na.vec_id
        JOIN norms nb ON ib = nb.vec_id)
      SELECT cell, ib AS dropped_id, ia AS keeper_id, cos AS keeper_cos
      FROM (
        SELECT cell, ia, ib, cos,
               row_number() OVER (PARTITION BY ib ORDER BY ia) AS rn
        FROM scored WHERE cos >= $SemTau) t
      WHERE rn = 1
      ORDER BY dropped_id"""))

  // --------------------------------------------------------------- q128
  // Hard-negative mining for contrastive training: for each anchor
  // vector, the top-1 SAME-label neighbor (the positive) and the top-1
  // DIFFERENT-label neighbor (the hard negative — the most confusable
  // impostor), plus the cosine margin between them. This is the triplet
  // construction step of every embedding-model curriculum; anchors with
  // a small or negative margin are the valuable training examples.
  // Shape: q50's broadcast-anchor scoring with a label predicate fused
  // in — one scored pass, ranked per (anchor, pos|neg) group, then a
  // tiny conditional pivot to one row per anchor. Scale: the corpus
  // never shuffles (anchors broadcast; scoring is partition-local map
  // work inside WholeStageCodegen via FloatDot); the window ranks
  // |anchors| × corpus rows hash-partitioned by anchor, and everything
  // after is |anchors|-sized.
  private val q128 = QueryDef(
    "q128_hard_negatives",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("ea"), col("norm").as("qn"))
      val c = e.select(col("vec_id").as("cid"), col("label").as("clabel"),
        col("embedding").as("eb"), col("norm").as("cn"))
      val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
        .withColumn("grp",
          when(col("qlabel") === col("clabel"), "pos").otherwise("neg"))
        .withColumn("cos",
          Num.roundZ(float_dot(col("ea"), col("eb")) / (col("qn") * col("cn")), 6))
      val w = Window.partitionBy(col("qid"), col("grp"))
        .orderBy(col("cos").desc, col("cid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("qid"))
        .agg(
          max(when(col("grp") === "pos", col("cid"))).as("pos_cid"),
          max(when(col("grp") === "pos", col("cos"))).as("pos_cos"),
          max(when(col("grp") === "neg", col("cid"))).as("neg_cid"),
          max(when(col("grp") === "neg", col("cos"))).as("neg_cos"))
        .withColumn("margin", Num.roundZ(col("pos_cos") - col("neg_cos"), 6))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH $evSql,
      pairs AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON q.i = c.i
         AND q.vec_id < 20 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      scored AS (
        SELECT qid, cid,
               CASE WHEN ql.label = cl.label THEN 'pos' ELSE 'neg' END
                 AS grp,
               (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM pairs
        JOIN norms nq ON qid = nq.vec_id
        JOIN norms nc ON cid = nc.vec_id
        JOIN embeddings ql ON ql.vec_id = qid
        JOIN embeddings cl ON cl.vec_id = cid),
      top AS (
        SELECT qid, cid, grp, cos FROM (
          SELECT qid, cid, grp, cos,
                 row_number() OVER (PARTITION BY qid, grp
                                    ORDER BY cos DESC, cid) AS rk
          FROM scored) t
        WHERE rk = 1)
      SELECT qid,
             max(CASE WHEN grp = 'pos' THEN cid END) AS pos_cid,
             max(CASE WHEN grp = 'pos' THEN cos END) AS pos_cos,
             max(CASE WHEN grp = 'neg' THEN cid END) AS neg_cid,
             max(CASE WHEN grp = 'neg' THEN cos END) AS neg_cos,
             (CAST(round((max(CASE WHEN grp = 'pos' THEN cos END) -
                   max(CASE WHEN grp = 'neg' THEN cos END)) * 1e6) AS BIGINT) / 1e6) AS margin
      FROM top
      GROUP BY qid
      ORDER BY qid"""))

  // --------------------------------------------------------------- q163
  // Gram / covariance matrix of the embedding corpus — the one-pass
  // moment computation feeding PCA / whitening / drift detection over a
  // vector column. Spark side is deliberately JOIN-FREE: each row
  // generates its own upper-triangle (i ≤ j) coordinate pairs with two
  // chained `posexplode` generators (d(d+1)/2 pairs per row, a constant
  // in corpus size), and ONE map-side-combined hash aggregate collapses
  // to d(d+1)/2 groups — the exchange carries ≤ 2080 rows per partition
  // no matter how many vectors flow through. The oracle self-joins the
  // exploded form instead (fine single-node; the generator chain is the
  // distributed formulation).
  // Exactness: embedding floats widen to double (exact), products round
  // to 1e-8-scaled BIGINTs (sums exact, order-independent: |x| < 1 ⇒
  // scaled products < 1e8, corpus sums ≪ 2^63), and every double step
  // after the integer sums is the same single-rounding expression in
  // both engines. Within an (i,j) group Σxi IS the global Σ over
  // dimension i (every vector contributes exactly once), so the
  // covariance needs no second pass or broadcast of means.
  private val q163 = QueryDef(
    "q163_embedding_covariance",
    (s, d) => {
      // spread rows BEFORE the d(d+1)/2-amplifying generator chain: the
      // corpus file is small enough to scan as one split, and without the
      // explicit count AQE would size the shuffle on its (tiny) input
      // bytes, blind to the 2080× downstream fan-out (the q158 lesson)
      val pairs = emb(s, d)
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("vec_id"))
        .select(col("embedding"), posexplode(col("embedding")))
        .toDF("embedding", "i0", "xi")
        .select(col("i0"), col("xi").cast("double").as("xi"),
          posexplode(col("embedding")))
        .toDF("i0", "xi", "j0", "xj")
        .filter(col("i0") <= col("j0"))
        .select((col("i0") + 1).cast("long").as("i"),
          (col("j0") + 1).cast("long").as("j"),
          col("xi"), col("xj").cast("double").as("xj"))
      pairs.groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("xi") * lit(1e8)).cast("long")).as("si"),
          sum(round(col("xj") * lit(1e8)).cast("long")).as("sj"),
          sum(round(col("xi") * col("xj") * lit(1e8)).cast("long")).as("sij"))
        .select(col("i"), col("j"), col("n"),
          // roundZ, not round: the off-diagonal covariances (and in
          // principle the gram cells) of near-orthogonal dimensions are
          // tiny NEGATIVE values that round to zero — Spark's BigDecimal
          // round emits +0.0 while DuckDB keeps −0.0 (the r7 red row at
          // cell i=6,j=10). Quantize-then-divide forces +0.0 in both.
          Num.roundZ(col("sij").cast("double") / lit(1e8)
            / col("n").cast("double"), 6).as("gram"),
          Num.roundZ((col("sij").cast("double") / lit(1e8)
              - (col("si").cast("double") / lit(1e8))
                * (col("sj").cast("double") / lit(1e8))
                / col("n").cast("double"))
            / (col("n").cast("double") - lit(1.0)), 6).as("cov"))
        .orderBy(col("i"), col("j"))
    },
    Some(s"""
      WITH $evSql,
      p AS (
        SELECT a.i AS i, b.i AS j, a.v AS xi, b.v AS xj
        FROM ev a JOIN ev b
          ON a.vec_id = b.vec_id AND a.i <= b.i),
      agg AS (
        SELECT i, j, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(xi * 1e8) AS BIGINT)) AS BIGINT) AS si,
               CAST(sum(CAST(round(xj * 1e8) AS BIGINT)) AS BIGINT) AS sj,
               CAST(sum(CAST(round(xi * xj * 1e8) AS BIGINT)) AS BIGINT) AS sij
        FROM p GROUP BY i, j)
      SELECT i, j, n,
             (CAST(round(CAST(sij AS DOUBLE) / 1e8 / CAST(n AS DOUBLE)
                         * 1e6) AS BIGINT) / 1e6) AS gram,
             (CAST(round((CAST(sij AS DOUBLE) / 1e8
                    - (CAST(si AS DOUBLE) / 1e8) * (CAST(sj AS DOUBLE) / 1e8)
                      / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) * 1e6) AS BIGINT) / 1e6) AS cov
      FROM agg
      ORDER BY i, j"""))

  // ---------------------------------------------------------------- q194
  // Int8-quantized ANN with in-query recall — the memory/bandwidth lever
  // for vector search at 100 TB. Each vector is quantized to int8 by its
  // own max-abs scale (qᵢ = round(127·xᵢ / max|x|)): 4× less rerank IO
  // than fp32, and because cosine is scale-invariant the per-vector scale
  // CANCELS out of the score — quantized cosine is Σ qaᵢ·qbᵢ /
  // (√Σ qaᵢ²·√Σ qbᵢ²), pure 64-bit integer sums + two IEEE sqrt/div.
  // That exactness (no float accumulation anywhere) is what lets a hash
  // oracle certify a quantized index byte-for-byte — and it holds at any
  // partition count. Scoring is the native codegen'd [[graft.functions
  // .LongDot]]; the probe set broadcasts and the corpus never shuffles
  // (q50's contract). The query scores BOTH representations in one pass
  // and reports per-probe overlap@10 against the exact fp32 ranking —
  // the recall observability a production quantized index ships with.
  // (Both rankings share one qid-keyed exchange; the two in-partition
  // window sorts are 10-row-deep rank cuts, not corpus sorts.)
  private val q194 = QueryDef(
    "q194_quantized_ann",
    (s, d) => {
      val base = emb(s, d)
        .withColumn("gmax", expr(
          "CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE)"))
        .withColumn("qv", expr(
          """CASE WHEN gmax = 0D THEN transform(embedding, x -> CAST(0 AS BIGINT))
            |ELSE transform(embedding,
            |  x -> CAST(round(CAST(x AS DOUBLE) * 127.0D / gmax) AS BIGINT))
            |END""".stripMargin))
        .withColumn("qn2", long_dot(col("qv"), col("qv")))
        .withColumn("norm", float_norm(col("embedding")))
      val probes = base.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("qv").as("qa"),
          col("embedding").as("fa"), col("qn2").as("na"), col("norm").as("fna"))
      val cand = base.select(col("vec_id").as("cid"), col("qv").as("qb"),
        col("embedding").as("fb"), col("qn2").as("nb"), col("norm").as("fnb"))
      val scored = cand.join(broadcast(probes), col("qid") =!= col("cid"))
        .withColumn("cosq", Num.roundZ(long_dot(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6))
        .withColumn("cosf", Num.roundZ(float_dot(col("fa"), col("fb")) /
          (col("fna") * col("fnb")), 6))
      val wq = Window.partitionBy(col("qid")).orderBy(col("cosq").desc, col("cid"))
      val wf = Window.partitionBy(col("qid")).orderBy(col("cosf").desc, col("cid"))
      scored
        .select(col("qid"), col("cid"), col("cosq"), col("cosf"))
        .withColumn("rkq", row_number().over(wq))
        .withColumn("rkf", row_number().over(wf))
        .groupBy(col("qid"))
        .agg(sum(when(col("rkq") <= 10 && col("rkf") <= 10, 1L).otherwise(0L))
          .as("n_overlap"))
        .select(col("qid"), col("n_overlap"),
          (col("n_overlap").cast("double") / lit(10.0)).as("recall_at_10"))
        .orderBy(col("qid"))
    },
    Some(s"""
      WITH $evSql,
      g AS (SELECT vec_id, max(abs(v)) AS gm FROM ev GROUP BY 1),
      qv AS (
        SELECT ev.vec_id, i,
               CASE WHEN gm = 0 THEN 0
                    ELSE CAST(round(v * 127.0 / gm) AS BIGINT) END AS q
        FROM ev JOIN g USING (vec_id)),
      qn AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2 FROM qv GROUP BY 1),
      pq AS (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               CAST(sum(a.q * b.q) AS BIGINT) AS dotq
        FROM qv a JOIN qv b ON a.i = b.i AND a.vec_id < 3 AND a.vec_id <> b.vec_id
        GROUP BY 1, 2),
      pf AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON q.i = c.i AND q.vec_id < 3 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      sq AS (
        SELECT qid, cid,
               (CAST(round((CAST(dotq AS DOUBLE) /
                 (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6)
                 AS cosq
        FROM pq JOIN qn na ON qid = na.vec_id JOIN qn nb ON cid = nb.vec_id),
      sf AS (
        SELECT qid, cid, (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cosf
        FROM pf JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON cid = nc.vec_id),
      rk AS (
        SELECT sq.qid, sq.cid,
               row_number() OVER (PARTITION BY sq.qid
                                  ORDER BY cosq DESC, sq.cid) AS rkq,
               row_number() OVER (PARTITION BY sq.qid
                                  ORDER BY cosf DESC, sq.cid) AS rkf
        FROM sq JOIN sf ON sq.qid = sf.qid AND sq.cid = sf.cid)
      SELECT qid,
             CAST(sum(CASE WHEN rkq <= 10 AND rkf <= 10 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overlap,
             CAST(sum(CASE WHEN rkq <= 10 AND rkf <= 10 THEN 1 ELSE 0 END)
               AS DOUBLE) / 10.0 AS recall_at_10
      FROM rk
      GROUP BY qid
      ORDER BY qid"""))

  // --------------------------------------------------------------- q248
  // Top principal component by POWER ITERATION + per-label projection
  // ([EXT]) — the "apply" step q163's covariance feeds: 3 unrolled
  // iterations v ← C·v / max|C·v| on the d×d covariance, then every
  // embedding projects onto the resulting direction and the projections
  // aggregate per label — the 1-D PCA view that drives drift dashboards
  // and whitening decisions. Iteration count is a declared constant
  // (power iteration converges geometrically in λ₂/λ₁; production turns
  // the knob, each extra round costs one broadcast join over the d²
  // matrix, never a corpus pass).
  //
  // Exactness — the whole recursion is INTEGER linear algebra: the
  // covariance is rounded once onto the 1e-6 grid (micro-units BIGINT,
  // the declared matrix), the vector lives on the 1e-9 grid (nano-units
  // BIGINT), so each matvec term cq·vq ≤ 1e15 and a 64-term sum stays
  // exact in BIGINT — no float accumulation anywhere in the loop. The
  // L∞ re-normalization (max|uq|, an order-independent integer max —
  // deliberately not the L2 norm, whose 64-term float sum would need
  // its own quantization) is one correctly-rounded division per
  // component. Sign is fixed deterministically: flip so the
  // smallest-index component attaining max|v| is positive. λ₁ falls out
  // for free: with v at L∞ norm 1, max|C·v| IS the eigenvalue estimate
  // (covariance is PSD, so the sign is +). Projections quantize x to
  // the 1e-6 grid, making Σ xq·vq ≤ 6.4e16 exact, re-quantized to
  // nano-units so the per-label sum stays in BIGINT past sf1.
  //
  // Scale: ONE corpus scan builds the d(d+1)/2 covariance aggregate
  // (q163's generator shape), localCheckpoint'd — 3 iterations run over
  // the 4096-row matrix with the 64-row vector BROADCAST; ONE more
  // corpus scan projects against the broadcast final direction. Nothing
  // corpus-sized ever shuffles; the exchanges carry the matrix and
  // |labels| rows.
  private val q248 = QueryDef(
    "q248_pca_power_iteration",
    (s, d) => {
      val pairs = emb(s, d)
        .repartition(s.sessionState.conf.numShufflePartitions,
          col("vec_id"))
        .select(col("embedding"), posexplode(col("embedding")))
        .toDF("embedding", "i0", "xi")
        .select(col("i0"), col("xi").cast("double").as("xi"),
          posexplode(col("embedding")))
        .toDF("i0", "xi", "j0", "xj")
        .filter(col("i0") <= col("j0"))
        .select((col("i0") + 1).cast("long").as("i"),
          (col("j0") + 1).cast("long").as("j"),
          col("xi"), col("xj").cast("double").as("xj"))
      val upper = pairs.groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("xi") * lit(1e8)).cast("long")).as("si"),
          sum(round(col("xj") * lit(1e8)).cast("long")).as("sj"),
          sum(round(col("xi") * col("xj") * lit(1e8)).cast("long")).as("sij"))
        .select(col("i"), col("j"),
          expr("CAST(round(1e6 * ((CAST(sij AS DOUBLE) / 1e8" +
            " - (CAST(si AS DOUBLE) / 1e8) * (CAST(sj AS DOUBLE) / 1e8)" +
            " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))" +
            " AS BIGINT)").as("cq"))
      val cm = upper
        .union(upper.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("cq")))
        .localCheckpoint()
      var v = cm.select(col("i")).distinct()
        .select(col("i"), lit(1000000000L).as("vq"))
      var lastM: DataFrame = null
      for (_ <- 1 to 3) {
        val u = cm
          .join(broadcast(v.select(col("i").as("j"), col("vq"))), Seq("j"))
          .groupBy(col("i")).agg(sum(col("cq") * col("vq")).as("uq"))
        lastM = u.agg(max(abs(col("uq"))).as("m"))
        v = u.crossJoin(broadcast(lastM))
          .select(col("i"),
            expr("CAST(round(1e9 * CAST(uq AS DOUBLE)" +
              " / CAST(m AS DOUBLE)) AS BIGINT)").as("vq"))
          .localCheckpoint()
      }
      val mx = v.agg(max(abs(col("vq"))).as("ma"))
      val sgn = v.crossJoin(broadcast(mx))
        .filter(abs(col("vq")) === col("ma"))
        .select(col("i"), col("vq"))
        .agg(min(col("i")).as("istar"))
      val sgnRow = v.join(broadcast(sgn), col("i") === col("istar"))
        .select(when(col("vq") >= 0L, 1L).otherwise(-1L).as("s"))
      val vf = v.crossJoin(broadcast(sgnRow))
        .select(col("i"), (col("vq") * col("s")).as("vqf"))
      val proj = emb(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")))
        .select(col("vec_id"), col("label"),
          (col("pos") + 1).cast("long").as("i"),
          round(col("col").cast("double") * lit(1e6)).cast("long").as("xq"))
        .join(broadcast(vf), Seq("i"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("xq") * col("vqf")).as("pq"))
        .select(col("label"),
          expr("CAST(round(CAST(pq AS DOUBLE) / 1e6) AS BIGINT)").as("pq9"))
      proj.groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("pq9")).as("sp"),
          min(col("pq9")).as("mn"), max(col("pq9")).as("mxp"))
        .crossJoin(broadcast(lastM))
        .select(col("label"), col("n"),
          Num.roundZ(col("sp").cast("double") / col("n").cast("double") /
            lit(1e9), 6).as("mean_proj"),
          Num.roundZ(col("mn").cast("double") / lit(1e9), 6).as("min_proj"),
          Num.roundZ(col("mxp").cast("double") / lit(1e9), 6).as("max_proj"),
          round(col("m").cast("double") / lit(1e15), 6).as("lambda1"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH $evSql,
      agg AS (
        SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(a.v * 1e8) AS BIGINT)) AS BIGINT) AS si,
               CAST(sum(CAST(round(b.v * 1e8) AS BIGINT)) AS BIGINT) AS sj,
               CAST(sum(CAST(round(a.v * b.v * 1e8) AS BIGINT)) AS BIGINT) AS sij
        FROM ev a JOIN ev b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i),
      up AS (
        SELECT i, j,
               CAST(round(1e6 * ((CAST(sij AS DOUBLE) / 1e8
                 - (CAST(si AS DOUBLE) / 1e8) * (CAST(sj AS DOUBLE) / 1e8)
                 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))
                 AS BIGINT) AS cq
        FROM agg),
      cm AS (
        SELECT i, j, cq FROM up
        UNION ALL
        SELECT j AS i, i AS j, cq FROM up WHERE i <> j),
      v0 AS (SELECT DISTINCT i, CAST(1000000000 AS BIGINT) AS vq FROM cm),
      u1 AS (
        SELECT cm.i, CAST(sum(cm.cq * v0.vq) AS BIGINT) AS uq
        FROM cm JOIN v0 ON cm.j = v0.i GROUP BY cm.i),
      m1 AS (SELECT CAST(max(abs(uq)) AS BIGINT) AS m FROM u1),
      v1 AS (
        SELECT i, CAST(round(1e9 * CAST(uq AS DOUBLE)
          / CAST((SELECT m FROM m1) AS DOUBLE)) AS BIGINT) AS vq FROM u1),
      u2 AS (
        SELECT cm.i, CAST(sum(cm.cq * v1.vq) AS BIGINT) AS uq
        FROM cm JOIN v1 ON cm.j = v1.i GROUP BY cm.i),
      m2 AS (SELECT CAST(max(abs(uq)) AS BIGINT) AS m FROM u2),
      v2 AS (
        SELECT i, CAST(round(1e9 * CAST(uq AS DOUBLE)
          / CAST((SELECT m FROM m2) AS DOUBLE)) AS BIGINT) AS vq FROM u2),
      u3 AS (
        SELECT cm.i, CAST(sum(cm.cq * v2.vq) AS BIGINT) AS uq
        FROM cm JOIN v2 ON cm.j = v2.i GROUP BY cm.i),
      m3 AS (SELECT CAST(max(abs(uq)) AS BIGINT) AS m FROM u3),
      v3 AS (
        SELECT i, CAST(round(1e9 * CAST(uq AS DOUBLE)
          / CAST((SELECT m FROM m3) AS DOUBLE)) AS BIGINT) AS vq FROM u3),
      sgn AS (
        SELECT CASE WHEN vq >= 0 THEN 1 ELSE -1 END AS s FROM v3
        WHERE i = (SELECT min(i) FROM v3
                   WHERE abs(vq) = (SELECT max(abs(vq)) FROM v3))),
      vf AS (SELECT i, vq * (SELECT s FROM sgn) AS vqf FROM v3),
      proj AS (
        SELECT ev.vec_id, ev.label,
               CAST(round(CAST(sum(CAST(round(ev.v * 1e6) AS BIGINT)
                 * vf.vqf) AS DOUBLE) / 1e6) AS BIGINT) AS pq9
        FROM ev JOIN vf ON ev.i = vf.i
        GROUP BY ev.vec_id, ev.label)
      SELECT label, count(*) AS n,
             (CAST(round((CAST(sum(pq9) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               / 1e9) * 1e6) AS BIGINT) / 1e6) AS mean_proj,
             (CAST(round((CAST(min(pq9) AS DOUBLE) / 1e9) * 1e6) AS BIGINT) / 1e6) AS min_proj,
             (CAST(round((CAST(max(pq9) AS DOUBLE) / 1e9) * 1e6) AS BIGINT) / 1e6) AS max_proj,
             round(CAST((SELECT m FROM m3) AS DOUBLE) / 1e15, 6) AS lambda1
      FROM proj
      GROUP BY label
      ORDER BY label"""))

  // --------------------------------------------------------------- q250
  // Embedding-retrieval evaluation: MRR and recall@10 ([EXT]) — the
  // binary-relevance eval pair that complements q167's graded nDCG (which
  // grades the BM25 TEXT ranker; this grades the VECTOR ranker): for a
  // deterministic probe sample (vec_id ≡ 7 mod 97), rank the corpus by
  // exact cosine and score against label-match ground truth. MRR = mean
  // 1/rank-of-first-relevant (0 when none in the cut); recall@10 =
  // hits@10 / min(10, R) with R = corpus positives for the probe's label
  // (the standard truncated-recall normalization). Reported per label —
  // the per-class view that exposes a ranker failing on one slice while
  // the global mean looks fine.
  //
  // Scale (q50's contract): the probe set BROADCASTS (sampling rate is
  // the knob that keeps it broadcast-sized); the corpus never shuffles —
  // scoring is a map-side broadcast join with the native codegen'd
  // FloatDot, and the only exchange carries probe-keyed top-10 rows. The
  // per-label positive counts are a |labels|-row broadcast. Reciprocals
  // and recall ratios quantize to the 1e-9 grid pre-sum (q243
  // discipline) so the per-label means are order-independent.
  private val q250 = QueryDef(
    "q250_retrieval_mrr",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val q = e.filter(col("vec_id") % 97L === 7L)
        .select(col("vec_id").as("qid"), col("embedding").as("ea"),
          col("norm").as("qn"), col("label").as("qlabel"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("eb"),
        col("norm").as("cn"), col("label").as("clabel"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("cid"))
      val top = c.join(broadcast(q), col("qid") =!= col("cid"))
        .withColumn("cos", Num.roundZ(float_dot(col("ea"), col("eb")) /
          (col("qn") * col("cn")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("qlabel"), col("rk").cast("long").as("rk"),
          (col("clabel") === col("qlabel")).as("rel"))
      val per = top.groupBy(col("qid"), col("qlabel"))
        .agg(sum(when(col("rel"), 1L).otherwise(0L)).as("hits"),
          min(when(col("rel"), col("rk"))).as("frank"))
      val labn = e.groupBy(col("label")).agg(count(lit(1)).as("nlab"))
      per.join(broadcast(labn), col("qlabel") === col("label"))
        .withColumn("denom", least(lit(10L), col("nlab") - 1L))
        .withColumn("rr9", coalesce(
          round(lit(1e9) / col("frank").cast("double")).cast("long"),
          lit(0L)))
        .withColumn("rec9", round(lit(1e9) *
          (col("hits").cast("double") / col("denom").cast("double")))
          .cast("long"))
        .groupBy(col("qlabel"))
        .agg(count(lit(1)).as("n_probes"), sum(col("rr9")).as("srr"),
          sum(col("rec9")).as("srec"))
        .select(col("qlabel").as("label"), col("n_probes"),
          round(col("srr").cast("double") /
            col("n_probes").cast("double") / lit(1e9), 6).as("mrr"),
          round(col("srec").cast("double") /
            col("n_probes").cast("double") / lit(1e9), 6).as("recall_at_10"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH $evSql,
      pairs AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON q.i = c.i AND q.vec_id % 97 = 7
         AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      lab AS (SELECT DISTINCT vec_id, label FROM ev),
      labn AS (SELECT label, count(*) AS nlab FROM lab GROUP BY label),
      scored AS (
        SELECT qid, cid, (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6) AS cos
        FROM pairs JOIN norms nq ON qid = nq.vec_id
        JOIN norms nc ON cid = nc.vec_id),
      top AS (
        SELECT qid, cid, rk FROM (
          SELECT qid, cid,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY cos DESC, cid) AS rk
          FROM scored) t
        WHERE rk <= 10),
      per AS (
        SELECT t.qid, ql.label AS qlabel,
               CAST(sum(CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END)
                 AS BIGINT) AS hits,
               min(CASE WHEN cl.label = ql.label THEN t.rk END) AS frank
        FROM top t
        JOIN lab ql ON ql.vec_id = t.qid
        JOIN lab cl ON cl.vec_id = t.cid
        GROUP BY t.qid, ql.label),
      perx AS (
        SELECT qlabel,
               coalesce(CAST(round(1e9 / CAST(frank AS DOUBLE)) AS BIGINT),
                 0) AS rr9,
               CAST(round(1e9 * (CAST(hits AS DOUBLE)
                 / CAST(least(10, labn.nlab - 1) AS DOUBLE))) AS BIGINT)
                 AS rec9
        FROM per JOIN labn ON per.qlabel = labn.label)
      SELECT qlabel AS label, count(*) AS n_probes,
             round(CAST(sum(rr9) AS BIGINT) / CAST(count(*) AS DOUBLE)
               / 1e9, 6) AS mrr,
             round(CAST(sum(rec9) AS BIGINT) / CAST(count(*) AS DOUBLE)
               / 1e9, 6) AS recall_at_10
      FROM perx
      GROUP BY qlabel
      ORDER BY qlabel"""))

  // --------------------------------------------------------------- q255
  // SEMANTIC decontamination ([EXT]) — the embedding-space member of the
  // decontamination family: q105/q112 catch verbatim n-gram overlap with
  // the eval set, q120 catches containment, but a paraphrased eval
  // question shares no 5-gram — only its embedding is close. For every
  // corpus vector, the max cosine against ANY held-out eval vector
  // (vec_id ≡ 3 mod 97 plays the eval set), reported per label as a
  // multi-threshold contamination census (≥0.80 / ≥0.90 / ≥0.95) so the
  // curator picks the cut from evidence instead of tuning a single τ
  // blind.
  //
  // Scale (q105's asymmetric-membership discipline, vector edition): the
  // eval side BROADCASTS — the corpus is scanned once, scored map-side
  // with the codegen'd FloatDot, and reduced to one row per corpus
  // vector by a max aggregate; nothing corpus-sized ever shuffles (the
  // exchange carries (vec_id, max-cos) pairs). When the eval set
  // outgrows broadcast, the production escalation is q34's band-bucket
  // join (LSH on both sides); the threshold census shape is unchanged.
  private val q255 = QueryDef(
    "q255_semantic_decontamination",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val evalSet = e.filter(col("vec_id") % 97L === 3L)
        .select(col("vec_id").as("eid"), col("embedding").as("ea"),
          col("norm").as("en"))
      val corpus = e.filter(col("vec_id") % 97L =!= 3L)
        .select(col("vec_id").as("cid"), col("label"),
          col("embedding").as("eb"), col("norm").as("cn"))
      corpus.join(broadcast(evalSet), lit(true))
        .withColumn("cos", Num.roundZ(float_dot(col("ea"), col("eb")) /
          (col("en") * col("cn")), 6))
        .groupBy(col("cid"), col("label"))
        .agg(max(col("cos")).as("mx"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("mx") >= 0.80, 1L).otherwise(0L)).as("n_80"),
          sum(when(col("mx") >= 0.90, 1L).otherwise(0L)).as("n_90"),
          sum(when(col("mx") >= 0.95, 1L).otherwise(0L)).as("n_95"),
          max(col("mx")).as("max_cos"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH $evSql,
      pairs AS (
        SELECT c.vec_id AS cid, sum(q.v * c.v) AS dot, q.vec_id AS eid
        FROM ev q JOIN ev c ON q.i = c.i
          AND q.vec_id % 97 = 3 AND c.vec_id % 97 <> 3
        GROUP BY c.vec_id, q.vec_id),
      mx AS (
        SELECT cid, max((CAST(round((dot / (ne.nrm * nc.nrm)) * 1e6) AS BIGINT) / 1e6)) AS mx
        FROM pairs
        JOIN norms ne ON eid = ne.vec_id
        JOIN norms nc ON cid = nc.vec_id
        GROUP BY cid),
      lab AS (SELECT DISTINCT vec_id, label FROM ev)
      SELECT l.label, count(*) AS n_vecs,
             CAST(sum(CASE WHEN mx >= 0.80 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_80,
             CAST(sum(CASE WHEN mx >= 0.90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_90,
             CAST(sum(CASE WHEN mx >= 0.95 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_95,
             max(mx) AS max_cos
      FROM mx JOIN lab l ON l.vec_id = mx.cid
      GROUP BY l.label
      ORDER BY l.label"""))

  // --------------------------------------------------------------- q266
  // k-CENTER GREEDY coreset selection ([EXT], farthest-point sampling —
  // the 2-approximation of Gonzalez 1985, the diversity-sampling pass
  // SemDeDup-style curation runs AFTER dedup: pick K points that COVER
  // the embedding space, maximizing the minimum pairwise spread; the
  // per-round coverage radius sequence (monotone non-increasing) is the
  // "how much diversity is left" curve a curator reads to choose K).
  // K = 8 declared; seed = min vec_id (deterministic).
  //
  // Each round is ONE corpus pass against the single NEW center
  // (broadcast 1-row): cosine distance via codegen'd FloatDot rounded to
  // the 1e-6 grid, running min-distance folded with `least` (never
  // recomputed against the whole center set), argmax as the house
  // packed-int64 HASH aggregate (dist in the high bits, bitwise-NOT'd
  // vec_id in the low 40 so ties break to the SMALLEST id under integer
  // max — no SortAggregate, no window). The selection recursion is
  // localCheckpoint'd per round (q35 discipline: plan stays O(1) in K).
  // The oracle unrolls the same K−1 rounds as generated CTEs — same
  // grid, same packing, byte-identical selections.
  private val CoresetK = 8
  private val q266 = QueryDef(
    "q266_coreset_kcenter",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
        .select(col("vec_id"), col("embedding"), col("norm"))
        .localCheckpoint()
      val seed = e.agg(min(col("vec_id")).as("cid"))
      def distToCenter(cent: DataFrame): DataFrame =
        e.crossJoin(broadcast(cent
            .join(e.select(col("vec_id").as("cid"),
              col("embedding").as("ce"), col("norm").as("cn")), Seq("cid"))))
          .select(col("vec_id"), col("embedding"), col("norm"),
            (lit(1000000L) - round(float_dot(col("embedding"), col("ce")) /
              (col("norm") * col("cn")) * 1e6).cast("long")).as("d6"))
      // state: per-vec running min distance to the selected set
      var md = distToCenter(seed)
        .select(col("vec_id"), col("embedding"), col("norm"),
          col("d6").as("md6"))
        .localCheckpoint()
      val picks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      // seed "radius" = 2.0, the max cosine distance — nothing is covered
      // before the first center; keeps the column non-null for the gate
      picks += seed.select(lit(1L).as("round"), col("cid"),
        lit(2000000L).as("radius6"))
      for (k <- 2 to CoresetK) {
        val pick = md.agg(max(col("md6") * lit(1099511627776L) +
            (lit(1099511627775L) - col("vec_id"))).as("p"))
          .select(lit(k.toLong).as("round"),
            (lit(1099511627775L) - col("p") % lit(1099511627776L)).as("cid"),
            expr("p DIV 1099511627776").as("radius6"))
          .localCheckpoint()
        picks += pick
        if (k < CoresetK) {
          md = distToCenter(pick.select(col("cid")))
            .join(md.select(col("vec_id"), col("md6")), Seq("vec_id"))
            .select(col("vec_id"), col("embedding"), col("norm"),
              least(col("md6"), col("d6")).as("md6"))
            .localCheckpoint()
        }
      }
      picks.reduce(_ unionByName _)
        .select(col("round"), col("cid"),
          round(col("radius6").cast("double") / lit(1e6), 6).as("radius"))
        .orderBy(col("round"))
    },
    Some {
      val rounds = (2 to CoresetK).map { k =>
        val prev = k - 1
        val mdDef =
          if (k == 2)
            s"""md2 AS MATERIALIZED (
        SELECT e.vec_id, d.d6 AS md6 FROM base e
        JOIN dist1 d ON d.vec_id = e.vec_id)"""
          else
            s"""dist$prev AS MATERIALIZED (
        SELECT s.vec_id,
               1000000 - CAST(round(s.dot
                 / (n1.nrm * (SELECT nrm FROM norms
                              WHERE vec_id = (SELECT cid FROM pick$prev)))
                 * 1e6) AS BIGINT) AS d6
        FROM (SELECT a.vec_id, sum(a.v * b.v) AS dot
              FROM ev a JOIN ev b ON a.i = b.i
               AND b.vec_id = (SELECT cid FROM pick$prev)
              GROUP BY a.vec_id) s
        JOIN norms n1 ON n1.vec_id = s.vec_id),
      md$k AS MATERIALIZED (
        SELECT m.vec_id, least(m.md6, d.d6) AS md6
        FROM md$prev m JOIN dist$prev d ON d.vec_id = m.vec_id)"""
        s"""$mdDef,
      pick$k AS MATERIALIZED (
        SELECT 1099511627775 - (max(md6 * 1099511627776
                 + (1099511627775 - vec_id)) % 1099511627776) AS cid,
               max(md6 * 1099511627776 + (1099511627775 - vec_id))
                 // 1099511627776 AS radius6
        FROM md$k)"""
      }.mkString(",\n      ")
      val sel = (2 to CoresetK).map(k =>
        s"SELECT $k AS round, cid, radius6 FROM pick$k")
        .mkString("\n      UNION ALL ")
      s"""
      WITH $evSql,
      base AS (SELECT DISTINCT vec_id FROM ev),
      seed AS MATERIALIZED (SELECT min(vec_id) AS cid FROM base),
      dist1 AS MATERIALIZED (
        SELECT s.vec_id,
               1000000 - CAST(round(s.dot
                 / (n1.nrm * (SELECT nrm FROM norms
                              WHERE vec_id = (SELECT cid FROM seed)))
                 * 1e6) AS BIGINT) AS d6
        FROM (SELECT a.vec_id, sum(a.v * b.v) AS dot
              FROM ev a JOIN ev b ON a.i = b.i
               AND b.vec_id = (SELECT cid FROM seed)
              GROUP BY a.vec_id) s
        JOIN norms n1 ON n1.vec_id = s.vec_id),
      $rounds
      SELECT CAST(round AS BIGINT) AS round, cid,
             round(CAST(radius6 AS DOUBLE) / 1e6, 6) AS radius
      FROM (
      SELECT 1 AS round, cid, 2000000 AS radius6 FROM seed
      UNION ALL $sel)
      ORDER BY round"""
    })

  // --------------------------------------------------------------- q286
  // Product-quantization ANN with asymmetric distance computation
  // ([EXT], Jégou et al. 2011 — the standard billion-scale compression
  // path): the 64-dim float vector (256 B) is encoded as M = 4 subspace
  // codes into k = 8-entry codebooks (12 bits total, a 170× memory
  // compression), each codebook trained by one seeded Lloyd iteration
  // per subspace (first-8-by-id seed, the q51 discipline, independently
  // per 16-dim subspace). Queries stay UNQUANTIZED — ADC: the query
  // precomputes its partial distance to every codebook entry (M·k = 32
  // cells), and a corpus vector's distance is the sum of M table
  // lookups. The in-query recall@5 against the exact baseline makes the
  // compression loss measurable, q258-style. (On THIS corpus it reads
  // 0.0–0.2: the synthetic embeddings are isotropic, the worst case for
  // PQ — 12-bit codes cannot separate near-orthogonal random vectors.
  // That is a property of the data, honestly measured, not of the
  // operator; clustered real corpora are the regime the method targets,
  // and the in-query recall column is precisely the gauge a deployment
  // watches to size M·k.)
  //
  // Determinism: every distance lives on an exact integer grid — values
  // quantize to 1e-6 BIGINTs BEFORE any arithmetic, so squared
  // distances, Lloyd argmins (ties → min cent_id, the oracle's
  // row_number order), centroid means (exact int sum / count, rounded
  // back to the grid), ADC sums and the exact-baseline d² (via the
  // native codegen'd LongDot on quantized arrays: ssq_q + ssq_c −
  // 2·dot) are all exact-integer comparisons; the only float ops are
  // the two final single divisions (adc2/1e12, hits/5).
  // Scale: codebooks and the per-query LUT are tiny broadcasts; the
  // corpus is touched by (a) the encode pass — broadcast-join + one
  // (vec, sub)-partitioned 8-row argmin window, (b) the ADC probe —
  // broadcast LUT join + (qid, cid) hash agg over M rows each; nothing
  // shuffles the corpus on anything wider than its own id, and the
  // exact baseline (queries broadcast, corpus never moves) is the q50
  // shape. At 100 TB the codes table IS the index: 4 B/vector resident,
  // raw vectors only read to build it. Int64 bounds: |qv| ≲ 5e6 ⇒
  // squared-diff sums ≲ 1.6e15 per subspace — grid headroom of ~5e3×.
  /** The q286 PQ/ADC core over any (vec_id, embedding) frame — the
    * testable unit. `ds` = subspace width, `pqk` = codebook size, top-k
    * by ADC with in-query recall@k vs the exact quantized-L2 baseline.
    * SimilaritySpec feeds it a corpus whose vectors ARE codebook words
    * (zero quantization error ⇒ ADC ranking equals exact ranking,
    * recall 1.0) plus perturbed fixtures. */
  def pqAdcTopK(e: DataFrame, ds: Int, pqk: Int,
      isQuery: Column => Column, k: Int): DataFrame = {
      val DS = ds; val PQK = pqk
      val ev2 = e
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), expr(s"CAST(i DIV $DS AS BIGINT)").as("sub"),
          col("i"),
          expr("CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)").as("qv"))
      val seedIds = e.orderBy(col("vec_id")).limit(PQK)
        .select(col("vec_id").as("cent_id"))
      val c0 = ev2.join(broadcast(seedIds), col("vec_id") === col("cent_id"))
        .select(col("cent_id"), col("sub"), col("i"), col("qv").as("cq"))
      def assign(c: DataFrame): DataFrame = {
        val d2 = ev2.join(broadcast(c), Seq("sub", "i"))
          .groupBy(col("vec_id"), col("sub"), col("cent_id"))
          .agg(sum((col("qv") - col("cq")) * (col("qv") - col("cq")))
            .as("d2"))
        val w = Window.partitionBy(col("vec_id"), col("sub"))
          .orderBy(col("d2"), col("cent_id"))
        d2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("vec_id"), col("sub"), col("cent_id").as("cell"))
      }
      val c1 = assign(c0).join(ev2, Seq("vec_id", "sub"))
        .groupBy(col("cell"), col("sub"), col("i"))
        .agg(expr("CAST(round(CAST(sum(qv) AS DOUBLE) / " +
          "CAST(count(qv) AS DOUBLE)) AS BIGINT)").as("cq"))
        .select(col("cell").as("cent_id"), col("sub"), col("i"), col("cq"))
      val codes = assign(c1)
      val lut = ev2.filter(isQuery(col("vec_id")))
        .withColumnRenamed("vec_id", "qid")
        .join(broadcast(c1), Seq("sub", "i"))
        .groupBy(col("qid"), col("sub"), col("cent_id"))
        .agg(sum((col("qv") - col("cq")) * (col("qv") - col("cq")))
          .as("pd"))
      val wA = Window.partitionBy(col("qid"))
        .orderBy(col("adc2"), col("cid"))
      val adcTop = codes.select(col("vec_id").as("cid"), col("sub"),
          col("cell").as("cent_id"))
        .join(broadcast(lut), Seq("sub", "cent_id"))
        .filter(col("qid") =!= col("cid"))
        .groupBy(col("qid"), col("cid"))
        .agg(sum(col("pd")).as("adc2"))
        .withColumn("rk", row_number().over(wA)).filter(col("rk") <= k)
      val qarr = e.select(col("vec_id"),
          expr("transform(embedding, " +
            "x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))").as("qa"))
        .withColumn("ssq", long_dot(col("qa"), col("qa")))
      val qq = qarr.filter(isQuery(col("vec_id")))
        .select(col("vec_id").as("qid2"), col("qa").as("qaq"),
          col("ssq").as("ssq_q"))
      val wE = Window.partitionBy(col("qid2"))
        .orderBy(col("d2"), col("cid"))
      val exTop = qarr.select(col("vec_id").as("cid"), col("qa").as("qac"),
          col("ssq").as("ssq_c"))
        .join(broadcast(qq), col("qid2") =!= col("cid"))
        .withColumn("d2", col("ssq_q") + col("ssq_c") -
          lit(2L) * long_dot(col("qaq"), col("qac")))
        .withColumn("rk", row_number().over(wE)).filter(col("rk") <= k)
        .select(col("qid2").as("qid"), col("cid"), lit(1L).as("ex"))
      val wq = Window.partitionBy(col("qid"))
      adcTop.join(exTop, Seq("qid", "cid"), "left")
        .withColumn("hit", col("ex").isNotNull)
        .withColumn("recall5",
          sum(when(col("hit"), 1L).otherwise(0L)).over(wq).cast("double") /
            lit(k.toDouble))
        .select(col("qid"), col("rk").cast("long").as("rk"), col("cid"),
          (col("adc2").cast("double") / lit(1e12)).as("adc_dist"),
          col("hit"), col("recall5"))
        .orderBy(col("qid"), col("rk"))
  }

  private val q286 = QueryDef(
    "q286_pq_adc_ann",
    (s, d) => pqAdcTopK(emb(s, d), 16, 8, _ < 3, 5),
    Some(s"""
      WITH $evSql,
      ev2 AS (
        SELECT vec_id, (i - 1) // 16 AS sub, i,
               CAST(round(v * 1e6) AS BIGINT) AS qv
        FROM ev),
      seed AS (SELECT vec_id AS cent_id FROM embn
               ORDER BY vec_id LIMIT 8),
      c0 AS (SELECT s.cent_id, e.sub, e.i, e.qv AS cq
             FROM seed s JOIN ev2 e ON e.vec_id = s.cent_id),
      a0 AS (SELECT e.vec_id, e.sub, c.cent_id,
                    CAST(sum((e.qv - c.cq) * (e.qv - c.cq)) AS BIGINT) AS d2
             FROM ev2 e JOIN c0 c ON c.sub = e.sub AND c.i = e.i
             GROUP BY 1, 2, 3),
      cell0 AS (SELECT vec_id, sub, cent_id AS cell FROM (
        SELECT vec_id, sub, cent_id,
               row_number() OVER (PARTITION BY vec_id, sub
                 ORDER BY d2, cent_id) AS rn
        FROM a0) t WHERE rn = 1),
      c1 AS (SELECT l.cell AS cent_id, e.sub, e.i,
                    CAST(round(CAST(sum(e.qv) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cq
             FROM cell0 l
             JOIN ev2 e ON e.vec_id = l.vec_id AND e.sub = l.sub
             GROUP BY 1, 2, 3),
      a1 AS (SELECT e.vec_id, e.sub, c.cent_id,
                    CAST(sum((e.qv - c.cq) * (e.qv - c.cq)) AS BIGINT) AS d2
             FROM ev2 e JOIN c1 c ON c.sub = e.sub AND c.i = e.i
             GROUP BY 1, 2, 3),
      codes AS (SELECT vec_id, sub, cent_id AS cell FROM (
        SELECT vec_id, sub, cent_id,
               row_number() OVER (PARTITION BY vec_id, sub
                 ORDER BY d2, cent_id) AS rn
        FROM a1) t WHERE rn = 1),
      lut AS (SELECT e.vec_id AS qid, e.sub, c.cent_id,
                     CAST(sum((e.qv - c.cq) * (e.qv - c.cq)) AS BIGINT) AS pd
              FROM ev2 e JOIN c1 c ON c.sub = e.sub AND c.i = e.i
              WHERE e.vec_id < 3 GROUP BY 1, 2, 3),
      adc AS (SELECT l.qid, k.vec_id AS cid,
                     CAST(sum(l.pd) AS BIGINT) AS adc2
              FROM codes k
              JOIN lut l ON l.sub = k.sub AND l.cent_id = k.cell
              WHERE l.qid <> k.vec_id GROUP BY 1, 2),
      atop AS (SELECT qid, cid, adc2, rn AS rk FROM (
        SELECT qid, cid, adc2,
               row_number() OVER (PARTITION BY qid
                 ORDER BY adc2, cid) AS rn
        FROM adc) t WHERE rn <= 5),
      ssq AS (SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS ssq
              FROM ev2 GROUP BY 1),
      dots AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                      CAST(sum(q.qv * c.qv) AS BIGINT) AS dot
               FROM ev2 q JOIN ev2 c
                 ON c.i = q.i AND q.vec_id < 3 AND c.vec_id <> q.vec_id
               GROUP BY 1, 2),
      ex AS (SELECT d.qid, d.cid, sq.ssq + sc.ssq - 2 * d.dot AS d2
             FROM dots d JOIN ssq sq ON sq.vec_id = d.qid
             JOIN ssq sc ON sc.vec_id = d.cid),
      etop AS (SELECT qid, cid FROM (
        SELECT qid, cid,
               row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rn
        FROM ex) t WHERE rn <= 5),
      hits AS (SELECT a.qid, a.rk, a.cid, a.adc2,
                      (e.cid IS NOT NULL) AS hit
               FROM atop a
               LEFT JOIN etop e ON e.qid = a.qid AND e.cid = a.cid)
      SELECT qid, CAST(rk AS BIGINT) AS rk, cid,
             CAST(adc2 AS DOUBLE) / 1e12 AS adc_dist, hit,
             CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END)
               OVER (PARTITION BY qid) AS DOUBLE) / 5.0 AS recall5
      FROM hits ORDER BY qid, rk"""))

  // --------------------------------------------------------------- q304
  // Embedding-centroid drift between two deployment cohorts ([EXT]) —
  // the model-monitoring check run when an embedding model is upgraded
  // or a corpus refreshed: per label, compare the mean vector of cohort
  // A (even vec_id — the "before" index) against cohort B (odd — the
  // "after"), reporting centroid cosine and L2 distance. Cosine near 1
  // and small L2 = the space is stable; a drifted label is the one to
  // re-index first.
  //
  // Scale: ONE corpus pass (posexplode + hash aggregate, map-side
  // combinable) collapses any number of vectors to the label×dim×cohort
  // grid (10·64·2 rows here, constant in corpus size); the cohort
  // self-join and the final per-label reduction run entirely on that
  // grid. At 100 TB the per-dimension sum aggregate is the only
  // corpus-scale stage.
  //
  // Exactness: float components widen to double (exact) and quantize to
  // 1e-8-scaled BIGINTs pre-sum (q163's discipline — sums exact and
  // order-independent); each centroid component is one fixed-order
  // double expression of exact integers; the cross-centroid terms
  // (ca·cb, ca², cb², (ca−cb)²) quantize to a 1e-9 grid pre-sum so the
  // d-term reductions are exact BIGINT sums too; cosine divides by one
  // correctly-rounded sqrt of the norm product, L2 is one sqrt of an
  // exact-grid sum, roundZ final.
  private val q304 = QueryDef(
    "q304_centroid_drift",
    (s, d) => {
      val comps = emb(s, d)
        .select(col("label").cast("long").as("label"),
          (col("vec_id") % 2L).as("grp"),
          posexplode(col("embedding")))
        .select(col("label"), col("grp"), (col("pos") + 1).cast("long").as("i"),
          round(col("col").cast("double") * lit(1e8)).cast("long").as("sv"))
        .groupBy(col("label"), col("grp"), col("i"))
        .agg(count(lit(1)).as("n"), sum(col("sv")).as("sv"))
        .withColumn("c",
          col("sv").cast("double") / lit(1e8) / col("n").cast("double"))
      val a = comps.filter(col("grp") === 0L)
        .select(col("label"), col("i"), col("n").as("na"), col("c").as("ca"))
      val b = comps.filter(col("grp") === 1L)
        .select(col("label"), col("i"), col("n").as("nb"), col("c").as("cb"))
      a.join(b, Seq("label", "i"))
        .groupBy(col("label"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(round(col("ca") * col("cb") * lit(1e9)).cast("long")).as("dot"),
          sum(round(col("ca") * col("ca") * lit(1e9)).cast("long")).as("n2a"),
          sum(round(col("cb") * col("cb") * lit(1e9)).cast("long")).as("n2b"),
          sum(round((col("ca") - col("cb")) * (col("ca") - col("cb"))
            * lit(1e9)).cast("long")).as("sd"))
        .select(col("label"), col("n_a"), col("n_b"),
          Num.roundZ(col("dot").cast("double") / lit(1e9)
            / sqrt((col("n2a").cast("double") / lit(1e9))
              * (col("n2b").cast("double") / lit(1e9))), 6).as("cos_drift"),
          Num.roundZ(sqrt(col("sd").cast("double") / lit(1e9)), 6)
            .as("l2_dist"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH $evSql,
      comps AS (
        SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS grp, i, v
        FROM ev),
      cg AS (
        SELECT label, grp, i, count(*) AS n,
               CAST(sum(CAST(round(v * 1e8) AS BIGINT)) AS BIGINT) AS sv
        FROM comps GROUP BY 1, 2, 3),
      cc AS (
        SELECT label, grp, i, n,
               CAST(sv AS DOUBLE) / 1e8 / CAST(n AS DOUBLE) AS c
        FROM cg),
      j AS (
        SELECT a.label, a.i, a.n AS na, b.n AS nb, a.c AS ca, b.c AS cb
        FROM cc a JOIN cc b ON b.label = a.label AND b.i = a.i
        WHERE a.grp = 0 AND b.grp = 1),
      agg AS (
        SELECT label, CAST(max(na) AS BIGINT) AS n_a,
               CAST(max(nb) AS BIGINT) AS n_b,
               CAST(sum(CAST(round(ca * cb * 1e9) AS BIGINT)) AS BIGINT)
                 AS dot,
               CAST(sum(CAST(round(ca * ca * 1e9) AS BIGINT)) AS BIGINT)
                 AS n2a,
               CAST(sum(CAST(round(cb * cb * 1e9) AS BIGINT)) AS BIGINT)
                 AS n2b,
               CAST(sum(CAST(round((ca - cb) * (ca - cb) * 1e9) AS BIGINT))
                 AS BIGINT) AS sd
        FROM j GROUP BY 1)
      SELECT label, n_a, n_b,
             (CAST(round(CAST(dot AS DOUBLE) / 1e9
               / sqrt((CAST(n2a AS DOUBLE) / 1e9)
                 * (CAST(n2b AS DOUBLE) / 1e9)) * 1e6) AS BIGINT) / 1e6)
               AS cos_drift,
             (CAST(round(sqrt(CAST(sd AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
               / 1e6) AS l2_dist
      FROM agg
      ORDER BY label"""))

  // --------------------------------------------------------------- q310
  // Adjusted Rand Index cluster evaluation ([EXT]) — the EXTERNAL
  // clustering-quality gate beside q116's internal cluster profile:
  // score a clustering against gold labels by pair-counting agreement,
  // chance-corrected (ARI = 0 for random assignment, 1 for a perfect
  // match up to relabeling). The clustering under audit is the
  // cheapest production assigner — nearest of K = 10 seed centroids
  // (the first 10 vectors by vec_id, broadcast) by cosine — and the
  // gold standard is the embeddings' label column; the query answers
  // "is seed-nearest assignment recovering the label structure".
  //
  // Scale: centroid assignment is a BROADCAST join (10 rows) + packed
  // argmax — the corpus never shuffles for it (q51's discipline); the
  // contingency table is ONE hash aggregate onto the ≤ K×L grid, and
  // all pair-counting (Σ C(n,2) terms) is grid arithmetic.
  //
  // Exactness: cosines quantize to the 1e6 grid before the packed
  // argmax (ties broken by centroid id — deterministic assignment);
  // C(n,2) terms are exact BIGINTs; the ARI is one fixed-order double
  // expression of exact integers, roundZ final.
  private val q310 = QueryDef(
    "q310_ari_cluster_eval",
    (s, d) => {
      val e = emb(s, d).withColumn("nrm", float_norm(col("embedding")))
      val cents = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cent"), col("embedding").as("ce"),
          col("nrm").as("cn"))
      val cells = e
        .crossJoin(broadcast(cents))
        .withColumn("cos", Num.roundZ(
          float_dot(col("embedding"), col("ce")) / (col("nrm") * col("cn")),
          6))
        // packed argmax: (1e6 − 1e6·cos) is an exact small integer;
        // min over (gap·16 + cent) picks max cos, ties to lowest cent
        .withColumn("p",
          (lit(1000000L) - round(col("cos") * 1e6).cast("long")) * 16L
            + col("cent"))
        .groupBy(col("vec_id"), col("label"))
        .agg((min(col("p")) % 16L).as("cell"))
      val ct = cells.groupBy(col("cell"), col("label"))
        .agg(count(lit(1)).as("nij"))
      val sij = ct.agg(sum(col("nij") * (col("nij") - 1L)).as("s2ij"),
        sum(col("nij")).as("n"))
      val sa = ct.groupBy(col("cell")).agg(sum(col("nij")).as("a"))
        .agg(sum(col("a") * (col("a") - 1L)).as("s2a"),
          count(lit(1)).as("k_cells"))
      val sb = ct.groupBy(col("label")).agg(sum(col("nij")).as("b"))
        .agg(sum(col("b") * (col("b") - 1L)).as("s2b"),
          count(lit(1)).as("l_labels"))
      sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
        .withColumn("p2", (col("n") * (col("n") - 1L)).cast("double"))
        .withColumn("exp",
          col("s2a").cast("double") * col("s2b").cast("double") / col("p2"))
        .select(col("n").as("n_vecs"), col("k_cells"), col("l_labels"),
          expr("s2ij DIV 2").as("pairs_agree2"),
          Num.roundZ(
            (col("s2ij").cast("double") - col("exp"))
              / ((col("s2a").cast("double") + col("s2b").cast("double"))
                / lit(2.0) - col("exp")), 6).as("ari"))
    },
    Some(s"""
      WITH $evSql,
      cents AS (
        SELECT vec_id AS cent, i, v, nrm AS cn
        FROM ev JOIN norms USING (vec_id)
        WHERE vec_id < 10),
      asg AS (
        SELECT e.vec_id, c.cent,
               (CAST(round((sum(e.v * c.v) / (ne.nrm * max(c.cn))) * 1e6)
                 AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cents c ON c.i = e.i
        JOIN norms ne ON ne.vec_id = e.vec_id
        GROUP BY e.vec_id, c.cent, ne.nrm),
      cells AS (
        SELECT a.vec_id, emb.label,
               min((1000000 - CAST(round(cos * 1e6) AS BIGINT)) * 16 + cent)
                 % 16 AS cell
        FROM asg a JOIN embeddings emb ON emb.vec_id = a.vec_id
        GROUP BY 1, 2),
      ct AS (
        SELECT cell, label, count(*) AS nij FROM cells GROUP BY 1, 2),
      sij AS (
        SELECT CAST(sum(nij * (nij - 1)) AS BIGINT) AS s2ij,
               CAST(sum(nij) AS BIGINT) AS n FROM ct),
      sa AS (
        SELECT CAST(sum(a * (a - 1)) AS BIGINT) AS s2a,
               count(*) AS k_cells
        FROM (SELECT cell, CAST(sum(nij) AS BIGINT) AS a FROM ct
              GROUP BY 1)),
      sb AS (
        SELECT CAST(sum(b * (b - 1)) AS BIGINT) AS s2b,
               count(*) AS l_labels
        FROM (SELECT label, CAST(sum(nij) AS BIGINT) AS b FROM ct
              GROUP BY 1))
      SELECT n AS n_vecs, k_cells, l_labels,
             CAST(s2ij // 2 AS BIGINT) AS pairs_agree2,
             (CAST(round((CAST(s2ij AS DOUBLE)
                 - CAST(s2a AS DOUBLE) * CAST(s2b AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE))
               / ((CAST(s2a AS DOUBLE) + CAST(s2b AS DOUBLE)) / 2.0
                 - CAST(s2a AS DOUBLE) * CAST(s2b AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE)) * 1e6) AS BIGINT) / 1e6)
               AS ari
      FROM sij, sa, sb"""))

  // --------------------------------------------------------------- q320
  // Geometric median of the embedding cloud — two Weiszfeld iterations
  // ([EXT]) — the ROBUST centroid beside q304's arithmetic mean: the
  // point minimizing Σ‖x−y‖ (not Σ‖x−y‖²), immune to outlier vectors
  // that drag a mean centroid (the "poisoned embedding" failure mode).
  // Starting from the mean, each Weiszfeld step re-centers at the
  // inverse-distance-weighted average y ← Σ(x/‖x−y‖)/Σ(1/‖x−y‖).
  // Reported per dimension beside the mean, with each iterate's total
  // movement — the convergence read-out.
  //
  // Scale: each iteration is ONE corpus pass — explode, join the
  // BROADCAST 64-row current iterate, one hash aggregate back to the
  // dimension grid. Two fixed iterations ⇒ two exchanges, plan size
  // constant. Exactly how a 100 TB robust-centroid job runs: k passes,
  // each map-side-combinable.
  //
  // Exactness: component sums quantize to 1e-8 BIGINTs (q163); each
  // per-vector squared distance folds over dims as 1e-9-quantized
  // BIGINTs (order-independent), its sqrt is one correctly-rounded op;
  // the reweighted numerators/denominators quantize w·x and w to
  // 1e-6/1e-9 grids pre-sum. Vectors within 1e-6 of the iterate are
  // excluded from the re-centering (the standard Weiszfeld guard,
  // documented; no such vector exists at gate SFs). roundZ final.
  private val q320 = QueryDef(
    "q320_geometric_median",
    (s, d) => {
      val comps = emb(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
          col("col").cast("double").as("x"))
        .localCheckpoint()
      val mean = comps.groupBy(col("i"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x") * lit(1e8)).cast("long")).as("sx"))
        .select(col("i"),
          (col("sx").cast("double") / lit(1e8) / col("n").cast("double"))
            .as("y"))
      def step(y: DataFrame): DataFrame = {
        val w = comps.join(broadcast(y), Seq("i"))
          .groupBy(col("vec_id"))
          .agg(sum(round((col("x") - col("y")) * (col("x") - col("y"))
            * lit(1e9)).cast("long")).as("sd"))
          .filter(col("sd") > 1000L) // ‖x−y‖ > 1e-3: Weiszfeld guard
          .select(col("vec_id"),
            (lit(1.0) / sqrt(col("sd").cast("double") / lit(1e9)))
              .as("w"))
        comps.join(w, Seq("vec_id"))
          .groupBy(col("i"))
          .agg(sum(round(col("w") * col("x") * lit(1e6)).cast("long"))
            .as("swx"),
            sum(round(col("w") * lit(1e9)).cast("long")).as("sw"))
          .select(col("i"),
            (col("swx").cast("double") / lit(1e6)
              / (col("sw").cast("double") / lit(1e9))).as("y"))
      }
      val y2 = step(step(mean))
      mean.toDF("i", "mean")
        .join(y2.toDF("i", "gmed"), Seq("i"))
        .select(col("i"), Num.roundZ(col("mean"), 6).as("mean"),
          Num.roundZ(col("gmed"), 6).as("gmed"),
          Num.roundZ(col("gmed") - col("mean"), 6).as("shift"))
        .orderBy(col("i"))
    },
    Some(s"""
      WITH $evSql,
      mean AS (
        SELECT i,
               CAST(sum(CAST(round(v * 1e8) AS BIGINT)) AS DOUBLE) / 1e8
                 / CAST(count(*) AS DOUBLE) AS y
        FROM ev GROUP BY 1),
      w1 AS (
        SELECT e.vec_id,
               1.0 / sqrt(CAST(sum(CAST(round((e.v - m.y) * (e.v - m.y)
                 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9) AS w
        FROM ev e JOIN mean m ON m.i = e.i
        GROUP BY e.vec_id
        HAVING sum(CAST(round((e.v - m.y) * (e.v - m.y) * 1e9) AS BIGINT))
          > 1000),
      y1 AS (
        SELECT e.i,
               CAST(sum(CAST(round(w1.w * e.v * 1e6) AS BIGINT)) AS DOUBLE)
                   / 1e6
                 / (CAST(sum(CAST(round(w1.w * 1e9) AS BIGINT)) AS DOUBLE)
                   / 1e9) AS y
        FROM ev e JOIN w1 ON w1.vec_id = e.vec_id
        GROUP BY e.i),
      w2 AS (
        SELECT e.vec_id,
               1.0 / sqrt(CAST(sum(CAST(round((e.v - m.y) * (e.v - m.y)
                 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9) AS w
        FROM ev e JOIN y1 m ON m.i = e.i
        GROUP BY e.vec_id
        HAVING sum(CAST(round((e.v - m.y) * (e.v - m.y) * 1e9) AS BIGINT))
          > 1000),
      y2 AS (
        SELECT e.i,
               CAST(sum(CAST(round(w2.w * e.v * 1e6) AS BIGINT)) AS DOUBLE)
                   / 1e6
                 / (CAST(sum(CAST(round(w2.w * 1e9) AS BIGINT)) AS DOUBLE)
                   / 1e9) AS y
        FROM ev e JOIN w2 ON w2.vec_id = e.vec_id
        GROUP BY e.i)
      SELECT mean.i,
             (CAST(round(mean.y * 1e6) AS BIGINT) / 1e6) AS mean,
             (CAST(round(y2.y * 1e6) AS BIGINT) / 1e6) AS gmed,
             (CAST(round((y2.y - mean.y) * 1e6) AS BIGINT) / 1e6) AS shift
      FROM mean JOIN y2 ON y2.i = mean.i
      ORDER BY mean.i"""))

  // --------------------------------------------------------------- q322
  // Maximal Marginal Relevance reranking, λ = 0.7, K = 5 ([EXT]) — the
  // DIVERSIFICATION member of the retrieval family (q110 BM25, q111
  // RRF, q250 MRR, q290 Dirichlet QL, q264 proximity): from the top-20
  // cosine candidates for probe vec 0, greedily pick 5 results where
  // each pick maximizes λ·relevance − (1−λ)·max-similarity-to-already-
  // selected — near-duplicate results are pushed down in favor of
  // coverage, the standard fix for redundant retrieval.
  //
  // Scale: candidate generation is q50's broadcast-probe scan + top-k
  // heap (corpus never shuffles); the candidate×candidate similarity
  // grid and all 5 greedy rounds are 20-row grid arithmetic —
  // constant in corpus size. The candidate table and sim grid are
  // checkpointed once (5 rounds reuse them).
  //
  // Exactness: relevances and pairwise sims quantize to the 1e6 grid
  // (roundZ); each round's argmax compares the 1e6-QUANTIZED score
  // (packed int64, ties to lowest cid) and the oracle orders by the
  // same quantized key — so tie behavior is identical by construction,
  // not by luck. The reported score is the exact unpacked quantum.
  private val q322 = QueryDef(
    "q322_mmr_rerank",
    (s, d) => {
      val e = emb(s, d).withColumn("nrm", float_norm(col("embedding")))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("pe"), col("nrm").as("pn"))
      val cand = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("cid"), col("embedding"), col("nrm"),
          Num.roundZ(float_dot(col("embedding"), col("pe"))
            / (col("nrm") * col("pn")), 6).as("rel"))
        .orderBy(col("rel").desc, col("cid")).limit(20)
        .localCheckpoint()
      val sims = cand.select(col("cid").as("ci"),
          col("embedding").as("ei"), col("nrm").as("ni"))
        .join(cand.select(col("cid").as("cj"), col("embedding").as("ej"),
          col("nrm").as("nj")), col("ci") =!= col("cj"))
        .select(col("ci"), col("cj"),
          Num.roundZ(float_dot(col("ei"), col("ej"))
            / (col("ni") * col("nj")), 6).as("sim"))
        .localCheckpoint()
      val c = cand.select(col("cid"), col("rel"))
      // packed quantized argmax: ties to lowest cid (oracle mirrors)
      def pick(scored: DataFrame, rank: Int): DataFrame = scored
        .agg(max((round(col("score") * 1e6).cast("long") + 1000000L)
          * 2097152L + (lit(2097151L) - col("cid"))).as("p"))
        .select(lit(rank.toLong).as("rank"),
          (lit(2097151L) - col("p") % 2097152L).as("cid"),
          ((expr("p DIV 2097152") - 1000000L).cast("double") / lit(1e6))
            .as("score"))
      val s1 = pick(c.withColumn("score", col("rel")), 1)
      val rounds = (2 to 5).foldLeft(s1) { (sel, k) =>
        val msim = sims
          .join(broadcast(sel.select(col("cid").as("cj"))), Seq("cj"))
          .groupBy(col("ci")).agg(max(col("sim")).as("msim"))
        val scored = c.join(sel.select(col("cid")), Seq("cid"), "left_anti")
          .join(msim.toDF("cid", "msim"), Seq("cid"))
          .withColumn("score",
            lit(0.7) * col("rel") - lit(0.3) * col("msim"))
        sel.unionByName(pick(scored, k))
      }
      rounds.join(c, Seq("cid"))
        .select(col("rank"), col("cid"), col("rel"), col("score"))
        .orderBy(col("rank"))
    },
    Some(s"""
      WITH $evSql,
      cand AS MATERIALIZED (
        SELECT c.vec_id AS cid,
               (CAST(round((sum(q.v * c.v) / (nq.nrm * nc.nrm)) * 1e6)
                 AS BIGINT) / 1e6) AS rel
        FROM ev q
        JOIN ev c ON c.i = q.i AND c.vec_id <> 0
        JOIN norms nq ON nq.vec_id = q.vec_id
        JOIN norms nc ON nc.vec_id = c.vec_id
        WHERE q.vec_id = 0
        GROUP BY c.vec_id, nq.nrm, nc.nrm
        ORDER BY rel DESC, cid LIMIT 20),
      sims AS MATERIALIZED (
        SELECT a.vec_id AS ci, b.vec_id AS cj,
               (CAST(round((sum(a.v * b.v) / (na.nrm * nb.nrm)) * 1e6)
                 AS BIGINT) / 1e6) AS sim
        FROM ev a
        JOIN ev b ON b.i = a.i AND b.vec_id <> a.vec_id
        JOIN norms na ON na.vec_id = a.vec_id
        JOIN norms nb ON nb.vec_id = b.vec_id
        WHERE a.vec_id IN (SELECT cid FROM cand)
          AND b.vec_id IN (SELECT cid FROM cand)
        GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm),
      s1 AS MATERIALIZED (
        SELECT 1 AS rank, cid,
               CAST(round(rel * 1e6) AS BIGINT) AS s6
        FROM cand ORDER BY CAST(round(rel * 1e6) AS BIGINT) DESC, cid
        LIMIT 1),
      s2 AS MATERIALIZED (
        SELECT 2 AS rank, c.cid,
               CAST(round((0.7 * c.rel - 0.3 * m.msim) * 1e6) AS BIGINT)
                 AS s6
        FROM cand c
        JOIN (SELECT ci, max(sim) AS msim FROM sims
              WHERE cj IN (SELECT cid FROM s1) GROUP BY 1) m
          ON m.ci = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1)
        ORDER BY s6 DESC, c.cid LIMIT 1),
      s3 AS MATERIALIZED (
        SELECT 3 AS rank, c.cid,
               CAST(round((0.7 * c.rel - 0.3 * m.msim) * 1e6) AS BIGINT)
                 AS s6
        FROM cand c
        JOIN (SELECT ci, max(sim) AS msim FROM sims
              WHERE cj IN (SELECT cid FROM s1 UNION ALL
                           SELECT cid FROM s2) GROUP BY 1) m
          ON m.ci = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 UNION ALL
                            SELECT cid FROM s2)
        ORDER BY s6 DESC, c.cid LIMIT 1),
      s4 AS MATERIALIZED (
        SELECT 4 AS rank, c.cid,
               CAST(round((0.7 * c.rel - 0.3 * m.msim) * 1e6) AS BIGINT)
                 AS s6
        FROM cand c
        JOIN (SELECT ci, max(sim) AS msim FROM sims
              WHERE cj IN (SELECT cid FROM s1 UNION ALL
                           SELECT cid FROM s2 UNION ALL
                           SELECT cid FROM s3) GROUP BY 1) m
          ON m.ci = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 UNION ALL
                            SELECT cid FROM s2 UNION ALL
                            SELECT cid FROM s3)
        ORDER BY s6 DESC, c.cid LIMIT 1),
      s5 AS MATERIALIZED (
        SELECT 5 AS rank, c.cid,
               CAST(round((0.7 * c.rel - 0.3 * m.msim) * 1e6) AS BIGINT)
                 AS s6
        FROM cand c
        JOIN (SELECT ci, max(sim) AS msim FROM sims
              WHERE cj IN (SELECT cid FROM s1 UNION ALL
                           SELECT cid FROM s2 UNION ALL
                           SELECT cid FROM s3 UNION ALL
                           SELECT cid FROM s4) GROUP BY 1) m
          ON m.ci = c.cid
        WHERE c.cid NOT IN (SELECT cid FROM s1 UNION ALL
                            SELECT cid FROM s2 UNION ALL
                            SELECT cid FROM s3 UNION ALL
                            SELECT cid FROM s4)
        ORDER BY s6 DESC, c.cid LIMIT 1),
      sel AS (
        SELECT * FROM s1 UNION ALL SELECT * FROM s2
        UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
        UNION ALL SELECT * FROM s5)
      SELECT CAST(sel.rank AS BIGINT) AS rank, sel.cid, cand.rel,
             (sel.s6 / 1e6) AS score
      FROM sel JOIN cand ON cand.cid = sel.cid
      ORDER BY rank"""))

  // --------------------------------------------------------------- q328
  // IVF nprobe sweep — recall@5 and candidate cost at nprobe = 1, 2, 3
  // from ONE pipeline ([EXT] ANN observability, beside q258's LSH
  // recall eval and q194/q286's quantization gates): the tuning curve
  // an ANN operator reads to pick its probe count. Each candidate
  // carries the RANK of its cell in the query's probe ordering
  // (admit), so the three operating points are one explode over
  // p ∈ [admit, 3] — the assignment, probing, and scoring run once.
  // Ground truth is the exact brute-force top-5 (broadcast queries,
  // the eval op's documented cost — same framing as q258: an eval
  // runs both arms by design).
  //
  // Scale: q51's discipline end-to-end — centroid assignment is a
  // broadcast join, probing is a window over nQueries·K rows, the
  // rerank touches only probed-cell members; the exact arm scans the
  // corpus once per the broadcast query set. The sweep itself is
  // grid arithmetic on the candidate table.
  //
  // Exactness: cosines roundZ-quantized before every rank (ties by
  // id, mirrored ORDER BY); recall is an exact ratio over 15 = 3
  // queries × 5; roundZ final.
  private val q328 = QueryDef(
    "q328_ivf_nprobe_sweep",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val asg = lloydAsg(emb(s, d), "vec_id", "embedding", CentK,
        LloydIters).localCheckpoint()
      val cells = nearestCell(asg)
        .select(col("vec_id").as("cid"), col("cell"))
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("cent_id"))
      val probes = asg.filter(col("vec_id") < 3)
        .withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") <= 3)
        .select(col("vec_id").as("qid"), col("cent_id").as("cell"),
          col("rn").cast("long").as("admit"))
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid2"), col("embedding").as("ea"),
          col("norm").as("qn"))
      val cand = probes.join(cells, "cell")
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), col("admit"))
      val scored = cand
        .join(broadcast(q), col("qid") === col("qid2"))
        .join(e.select(col("vec_id").as("cid"), col("embedding").as("eb"),
          col("norm").as("cn")), "cid")
        .withColumn("cos", Num.roundZ(float_dot(col("ea"), col("eb"))
          / (col("qn") * col("cn")), 6))
        .select(col("qid"), col("cid"), col("admit"), col("cos"))
        .localCheckpoint()
      val wEx = Window.partitionBy(col("qid2"))
        .orderBy(col("cos").desc, col("cid"))
      val exact = e
        .select(col("vec_id").as("cid"), col("embedding").as("eb"),
          col("norm").as("cn"))
        .join(broadcast(q), col("cid") =!= col("qid2"))
        .withColumn("cos", Num.roundZ(float_dot(col("ea"), col("eb"))
          / (col("qn") * col("cn")), 6))
        .withColumn("rk", row_number().over(wEx))
        .filter(col("rk") <= 5)
        .select(col("qid2").as("qid"), col("cid"), lit(1L).as("hit"))
      val wP = Window.partitionBy(col("qid"), col("p"))
        .orderBy(col("cos").desc, col("cid"))
      val sweep = scored
        .select(col("qid"), col("cid"), col("cos"),
          explode(sequence(col("admit"), lit(3L))).as("p"))
        .withColumn("rk", row_number().over(wP))
        .filter(col("rk") <= 5)
      val hits = sweep
        .join(exact, Seq("qid", "cid"), "left")
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n_retrieved"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      val candN = cand
        .select(explode(sequence(col("admit"), lit(3L))).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n_cand"))
      hits.join(candN, Seq("p"))
        .select(col("p").as("nprobe"), col("n_cand"), col("n_retrieved"),
          col("n_hits"),
          Num.roundZ(col("n_hits").cast("double") / lit(15.0), 6)
            .as("recall_at_5"))
        .orderBy(col("nprobe"))
    },
    Some(s"""
      WITH $evSql,
      ${lloydCtes(LloydIters)},
      asg AS (
        SELECT e.vec_id, c.cent_id,
               (CAST(round((sum(e.v * c.cv) / (ne.nrm * n.cn)) * 1e6)
                 AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cv$LloydIters c ON c.i = e.i
        JOIN norms ne ON ne.vec_id = e.vec_id
        JOIN cn$LloydIters n ON n.cent_id = c.cent_id
        GROUP BY e.vec_id, c.cent_id, ne.nrm, n.cn),
      cells AS (
        SELECT vec_id AS cid, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, cent_id) AS rn
          FROM asg) t
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS qid, cent_id AS cell, CAST(rn AS BIGINT) AS admit
        FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, cent_id) AS rn
          FROM asg WHERE vec_id < 3) t
        WHERE rn <= 3),
      cand AS (
        SELECT qid, cid, admit
        FROM probes JOIN cells USING (cell)
        WHERE qid <> cid),
      pairs AS (
        SELECT qid, cid, admit, sum(q.v * c.v) AS dot
        FROM cand
        JOIN ev q ON q.vec_id = qid
        JOIN ev c ON c.vec_id = cid AND c.i = q.i
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT qid, cid, admit,
               (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT)
                 / 1e6) AS cos
        FROM pairs
        JOIN norms nq ON qid = nq.vec_id
        JOIN norms nc ON cid = nc.vec_id),
      expairs AS (
        SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON c.i = q.i AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 3
        GROUP BY 1, 2),
      exact AS (
        SELECT qid, cid, 1 AS hit FROM (
          SELECT qid, cid,
                 row_number() OVER (PARTITION BY qid ORDER BY
                   (CAST(round((dot / (nq.nrm * nc.nrm)) * 1e6) AS BIGINT)
                     / 1e6) DESC, cid) AS rk
          FROM expairs
          JOIN norms nq ON qid = nq.vec_id
          JOIN norms nc ON cid = nc.vec_id) t
        WHERE rk <= 5),
      sweep AS (
        SELECT qid, cid, p FROM (
          SELECT s.qid, s.cid, t.p,
                 row_number() OVER (PARTITION BY s.qid, t.p
                   ORDER BY s.cos DESC, s.cid) AS rk
          FROM scored s JOIN range(1, 4) t(p) ON t.p >= s.admit) u
        WHERE rk <= 5),
      hits AS (
        SELECT p, count(*) AS n_retrieved,
               CAST(sum(coalesce(e.hit, 0)) AS BIGINT) AS n_hits
        FROM sweep s LEFT JOIN exact e USING (qid, cid)
        GROUP BY 1),
      candn AS (
        SELECT t.p, count(*) AS n_cand
        FROM cand c JOIN range(1, 4) t(p) ON t.p >= c.admit
        GROUP BY 1)
      SELECT CAST(h.p AS BIGINT) AS nprobe, c.n_cand, h.n_retrieved,
             h.n_hits,
             (CAST(round(CAST(h.n_hits AS DOUBLE) / 15.0 * 1e6) AS BIGINT)
               / 1e6) AS recall_at_5
      FROM hits h JOIN candn c ON c.p = h.p
      ORDER BY nprobe"""))

  // --------------------------------------------------------------- q346
  // Nearest-centroid (Rocchio) classification of the embedding corpus
  // ([EXT] eval pack): per-label centroids via the q51 Lloyd-step
  // discipline (exact fixed-point per-dimension means reassembled
  // through FLOAT, so both engines hold bit-identical centroids),
  // every vector assigned to its max-cosine centroid (ties → min
  // label), and the full confusion matrix shipped — the 5-minute
  // baseline every embedding-quality audit runs before training
  // anything, and the in-query label-separability evidence beside
  // q163's covariance and q310's ARI.
  //
  // Scale: centroids are |labels| rows, BROADCAST; the argmax is a
  // map-side-combinable min_by over (−cos, label) — the corpus never
  // shuffles wider than (vec_id, true-label) collapse; confusion is a
  // |labels|² grid. Zero-norm centroids (members cancel exactly —
  // theoretical) are excluded symmetrically, same class as [[emb]]'s
  // zero-vector rule.
  private val q346 = QueryDef(
    "q346_centroid_classifier",
    (s, d) => {
      val e = emb(s, d).withColumn("norm", float_norm(col("embedding")))
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
        .groupBy(col("label"), col("i"))
        .agg(Num.avgFixed(col("v").cast("double"), 6).as("m"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(i, m)))," +
          " x -> cast(x.m as float))").as("ca"))
        .select(col("label").as("clab"), col("ca"),
          float_norm(col("ca")).as("cn"))
        .filter(col("cn") > 0.0)
      val scored = e.select(col("vec_id"), col("label"),
          col("embedding").as("eb"), col("norm").as("vn"))
        .join(broadcast(cent), lit(true))
        .withColumn("cos", Num.roundZ(
          float_dot(col("ca"), col("eb")) / (col("cn") * col("vn")), 6))
      // packed-int64 argmax (the q30/q48 discipline): cos already lives
      // on the 1e-6 grid, so (1e6 − cos·1e6)·2^20 + label orders by
      // (−cos, label) exactly and min() is a PLAIN hash aggregate — a
      // min_by(label, struct(−cos, label)) buffers a struct and planned
      // SortAggregate over the corpus-scale input (PlanAudit). Labels
      // must sit in [0, 2^20) — any denser domain dictionary-encodes.
      scored
        .withColumn("ic",
          (lit(1000000L) - round(col("cos") * 1e6).cast("long")) *
            1048576L + col("clab"))
        .groupBy(col("vec_id"), col("label"))
        .agg(min(col("ic")).as("m"))
        .select(col("label"), (col("m") % 1048576L).as("pred_label"))
        .groupBy(col("label"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("pred_label"))
    },
    Some(s"""
      WITH $evSql,
      cv AS (
        SELECT label AS clab, i,
               CAST(CAST(${graft.Num.avgFixedSql("v", 6)} AS FLOAT)
                 AS DOUBLE) AS cv
        FROM ev GROUP BY label, i),
      cn AS (
        SELECT clab, sqrt(sum(cv * cv)) AS cn FROM cv GROUP BY 1
        HAVING sqrt(sum(cv * cv)) > 0),
      sc AS (
        SELECT e.vec_id, e.label, c.clab,
               (CAST(round((sum(e.v * c.cv) / (n.cn * ne.nrm)) * 1e6)
                 AS BIGINT) / 1e6) AS cos
        FROM ev e
        JOIN cv c ON c.i = e.i
        JOIN cn n ON n.clab = c.clab
        JOIN norms ne ON ne.vec_id = e.vec_id
        GROUP BY e.vec_id, e.label, c.clab, n.cn, ne.nrm),
      pred AS (
        SELECT vec_id, label, clab AS pred_label FROM (
          SELECT vec_id, label, clab,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, clab) AS rn
          FROM sc) t
        WHERE rn = 1)
      SELECT label, pred_label, count(*) AS n
      FROM pred
      GROUP BY label, pred_label
      ORDER BY label, pred_label"""))

  // --------------------------------------------------------------- q358
  // Embedding-space dimension profile ([EXT] embedding QA, the vector
  // sibling of q151's column profile): per dimension, count / min / max /
  // mean / population variance over the WHOLE table (zero-norm rows
  // included — this is the diagnostics pass you run BEFORE trusting the
  // cosine family; a dead dimension, a scale outlier, or a variance
  // collapse shows up here first). Division of labor vs q163 (the Gram/
  // covariance matrix): q163 ships the d² second-moment structure for
  // PCA/whitening over the norm-filtered corpus; this is the d-row QA
  // profile with the extremes (min/max) a moment matrix cannot carry,
  // over the UNfiltered table — the pass that decides whether q163's
  // input filter fired correctly at all.
  //
  // Exactness: values quantize to the declared 1e-4 grid (both engines),
  // then moments are exact BIGINT sums — mean and variance each ship as
  // ONE correctly-rounded division: var·(n·1e8) = n·Σq² − (Σq)² exactly.
  // Overflow envelope: |q| ≤ 10⁴ ⇒ both n·Σq² and (Σq)² are ≤ n²·10⁸,
  // inside 2⁶³ for n < 3·10⁵ rows — beyond that grain drop the grid a
  // decade (n < 3·10⁷) or move the two products to DECIMAL(38) (the
  // HitsScale knob discipline). min/max stay exact
  // (float→double widening is value-preserving), rounded only at the
  // 1e-6 display grid.
  // Scale: one positional explode (64·N rows of (dim, int)) into a
  // 64-row grid aggregate — map-side combinable, no window, no join.
  private val q358 = QueryDef(
    "q358_embedding_dim_profile",
    (s, d) => {
      val ev = Tables.t(s, d, "embeddings")
        .select(posexplode(col("embedding")))
        .select((col("pos") + 1).cast("long").as("dim"),
          col("col").cast("double").as("v"))
        .withColumn("q", round(col("v") * 1e4).cast("long"))
      ev.groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).as("vmin0"), max(col("v")).as("vmax0"),
          sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sq2"))
        .select(col("dim"), col("n"),
          Num.roundZ(col("vmin0"), 6).as("vmin"),
          Num.roundZ(col("vmax0"), 6).as("vmax"),
          Num.roundZ(col("sq").cast("double")
            / (col("n").cast("double") * 1e4), 6).as("mean"),
          Num.roundZ((col("n") * col("sq2") - col("sq") * col("sq"))
            .cast("double")
            / (col("n").cast("double") * col("n").cast("double") * 1e8), 6)
            .as("variance"))
        .orderBy(col("dim"))
    },
    Some("""
      WITH ev AS (
        SELECT unnest(range(1, len(embedding) + 1)) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      q AS (SELECT dim, v, CAST(round(v * 1e4) AS BIGINT) AS q FROM ev),
      g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                   min(v) AS vmin0, max(v) AS vmax0,
                   CAST(sum(q) AS BIGINT) AS sq,
                   CAST(sum(q * q) AS BIGINT) AS sq2
            FROM q GROUP BY 1)
      SELECT dim, n,
             CAST(round(vmin0 * 1e6) AS BIGINT) / 1e6 AS vmin,
             CAST(round(vmax0 * 1e6) AS BIGINT) / 1e6 AS vmax,
             CAST(round((CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e4))
               * 1e6) AS BIGINT) / 1e6 AS mean,
             CAST(round((CAST(n * sq2 - sq * sq AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e8)) * 1e6)
               AS BIGINT) / 1e6 AS variance
      FROM g ORDER BY dim"""))

  val defs: Seq[QueryDef] = Seq(q50, q51, q111, q116, q128, q137, q163,
    q194, q248, q250, q255, q266, q286, q304, q310, q320, q322, q328,
    q346, q358)
}
