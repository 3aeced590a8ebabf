package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IVF ANN algorithm itself (not just its oracle mirror): on
  * planted well-separated clusters, probe-2-cells pruning must recover
  * ≥ 90% of the exact brute-force top-k, and every score it does return
  * must be the exact cosine (rerank is exact, so precision is 1).
  * Mirror of DedupSpec's planted-recall test for the q34 embedding LSH.
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)

  private val NClusters = 8

  /** 96 planted vectors in 8 well-separated clusters (id i → cluster
    * i % 8), so ids 0..15 — the fixed-K centroid seed for centK=16 —
    * hold exactly two anchors per cluster. Shared by the recall and
    * cell-purity tests. */
  private def planted(): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(11)
    val dim = 32
    val centers = Array.fill(NClusters)(Array.fill(dim)(rng.nextGaussian().toFloat))
    (0 until 96).map { i =>
      val c = centers(i % NClusters)
      (i.toLong, c.map(v => v + 0.05f * rng.nextGaussian().toFloat))
    }
  }

  test("IVF probe-2 recall >= 0.9 vs exact top-k on planted clusters") {
    import spark.implicits._
    val vecs = planted()
    val df = vecs.toDF("vid", "embv").repartition(4)

    val queries = Seq(2L, 9L, 17L, 40L)
    val k = 5
    val ivf = graft.operators.Similarity
      .ivfTopK(df, "vid", "embv", q => q.isin(queries: _*), 16, 2, k)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))

    // exact ground truth, driver-side (96 vectors), same round-6 +
    // cid-ascending tie-break as the distributed formulation
    val byId = vecs.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      BigDecimal(d / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exact: Map[Long, Seq[(Long, Double)]] = queries.map { qid =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (cid, v) => (cid, cos(byId(qid), v)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(k).toSeq
    }.toMap

    // precision 1 by exact rerank: every returned score is the true cosine
    ivf.foreach { case (qid, cid, c) =>
      assert(math.abs(c - cos(byId(qid), byId(cid))) < 1e-9,
        s"IVF returned a non-exact score for ($qid, $cid)")
    }
    // recall vs exact top-k, per query
    queries.foreach { qid =>
      val got = ivf.filter(_._1 == qid).map(_._2).toSet
      val want = exact(qid).map(_._1).toSet
      assert(got.size == k, s"query $qid returned ${got.size} of $k rows")
      val recall = got.intersect(want).size.toDouble / want.size
      assert(recall >= 0.9, s"query $qid recall $recall (got=$got want=$want)")
    }
  }

  test("q116 cluster profile partitions the corpus; cohesion/purity fields sane") {
    val rows = SparkEntry.queries("q116_cluster_profile")(spark, sf).collect()
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "cluster sizes must partition the corpus — every vector in exactly one cell")
    rows.foreach { r =>
      assert(r.getDouble(2) <= 1.0 + 1e-9, s"cell ${r.getLong(0)}: mean cos > 1")
      assert(r.getLong(5) >= 1L && r.getLong(5) <= r.getLong(1),
        s"cell ${r.getLong(0)}: majority-label count out of [1, n_vecs]")
    }
  }

  test("lloydAsg nearest cells are pure on planted separated clusters") {
    import spark.implicits._
    // with 16 seeds over 8 clusters a true cluster MAY split across two
    // cells, but no cell may MIX clusters — that is the property the
    // q116 profile's purity column rests on
    val df = planted().toDF("vid", "embv").repartition(4)
    val asg = graft.operators.Similarity.lloydAsg(df, "vid", "embv", 16, 2)
    val cells = asg.groupBy(col("vec_id"))
      .agg(min(struct((-col("cos")).as("negcos"), col("cent_id").as("cent"))).as("m"))
      .select(col("vec_id"), col("m.cent").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cells.length == 96, "every planted vector must be assigned")
    cells.groupBy(_._2).foreach { case (cell, members) =>
      val trueClusters = members.map(_._1 % NClusters).toSet
      assert(trueClusters.size == 1, s"cell $cell mixes true clusters $trueClusters")
    }
  }

  test("q248 power iteration: full integer-recursion mirror on the driver") {
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rq(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val rows = SparkEntry.queries("q248_pca_power_iteration")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(5))).sortBy(_._1)
    val vecs = Tables.t(spark, sf, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val d = vecs.head._3.length
    val n = vecs.length.toLong
    // covariance on the 1e-6 grid, exactly as the query computes it
    val cq = Array.ofDim[Long](d, d)
    for (i <- 0 until d; j <- i until d) {
      var si = 0L; var sj = 0L; var sij = 0L
      vecs.foreach { case (_, _, x) =>
        val xi = x(i).toDouble; val xj = x(j).toDouble
        si += rq(xi * 1e8); sj += rq(xj * 1e8); sij += rq(xi * xj * 1e8)
      }
      val cov = (sij.toDouble / 1e8 -
        (si.toDouble / 1e8) * (sj.toDouble / 1e8) / n.toDouble) /
        (n.toDouble - 1.0)
      cq(i)(j) = rq(1e6 * cov); cq(j)(i) = cq(i)(j)
    }
    var v = Array.fill(d)(1000000000L)
    var m = 0L
    for (_ <- 1 to 3) {
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => cq(i)(j) * v(j)).sum)
      m = u.map(math.abs).max
      v = u.map(x => rq(1e9 * x.toDouble / m.toDouble))
    }
    val ma = v.map(math.abs).max
    val istar = v.indices.find(i => math.abs(v(i)) == ma).get
    val sgn = if (v(istar) >= 0) 1L else -1L
    val vf = v.map(_ * sgn)
    val proj = vecs.map { case (_, lab, x) =>
      val pq = (0 until d).map(i => rq(x(i).toDouble * 1e6) * vf(i)).sum
      (lab, rq(pq.toDouble / 1e6))
    }
    val byLab = proj.groupBy(_._1)
    assert(rows.map(_._1).toSeq == byLab.keys.toSeq.sorted)
    rows.foreach { case (lab, np, meanP, lam) =>
      val ps = byLab(lab).map(_._2)
      assert(np == ps.length.toLong, s"label $lab count")
      val ref = r6(ps.sum.toDouble / ps.length.toDouble / 1e9)
      assert(meanP == ref, s"label $lab mean_proj $meanP vs $ref")
      assert(lam == r6(m.toDouble / 1e15), s"lambda $lam")
    }
  }

  test("q250 MRR/recall match a driver brute-force rerank; self-retrieval sanity") {
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rq(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val rows = SparkEntry.queries("q250_retrieval_mrr")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // embeddings schema order: (vec_id, embedding, label)
    val vecs = Tables.t(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val labCount = vecs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val probes = vecs.filter(v => v._1 % 97 == 7)
    val per = probes.map { case (qid, qa, qlab) =>
      val top = vecs.filter(_._1 != qid)
        .map { case (cid, cb, clab) =>
          (cid, clab, r6(dot(qa, cb) / (nrm(qa) * nrm(cb)))) }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(10)
      val hits = top.count(_._2 == qlab).toLong
      val frank = top.zipWithIndex.collectFirst {
        case ((_, cl, _), i) if cl == qlab => i + 1L }
      val denom = math.min(10L, labCount(qlab) - 1L)
      val rr9 = frank.map(fr => rq(1e9 / fr.toDouble)).getOrElse(0L)
      val rec9 = rq(1e9 * (hits.toDouble / denom.toDouble))
      (qlab, rr9, rec9)
    }
    val byLab = per.groupBy(_._1)
    assert(rows.map(_._1).toSeq.sorted == byLab.keys.toSeq.sorted)
    rows.foreach { case (lab, np, mrr, rec) =>
      val xs = byLab(lab)
      assert(np == xs.length.toLong, s"label $lab probes")
      assert(mrr == r6(xs.map(_._2).sum.toDouble / xs.length / 1e9),
        s"label $lab mrr")
      assert(rec == r6(xs.map(_._3).sum.toDouble / xs.length / 1e9),
        s"label $lab recall")
    }
  }

  test("q286 PQ/ADC: codebook-coincident corpus gives exact ranking, recall 1") {
    import spark.implicits._
    // corpus = 6 copies of each of 8 distinct codewords (dim 32, 4
    // subspaces of 8). The first-8-by-id seed IS the codeword set, the
    // Lloyd mean of identical copies reproduces each codeword, so
    // quantization error is zero: ADC distance equals exact distance
    // for every pair, the top-5 must be the 5 other copies of the
    // query's codeword at distance 0, and recall@5 is exactly 1.
    val rng = new scala.util.Random(7)
    val words = Array.fill(8)(Array.fill(32)(rng.nextGaussian().toFloat))
    val vecs = (0 until 48).map(i => (i.toLong, words(i % 8)))
    val df = vecs.toDF("vec_id", "embedding").repartition(3)
    val out = graft.operators.Similarity
      .pqAdcTopK(df, 8, 8, q => q.isin(3L, 12L), 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getDouble(5)))
    assert(out.length == 10, "two queries x top-5")
    assert(out.forall(_._5), "every ADC hit must be in the exact top-5")
    assert(out.forall(_._6 == 1.0), "recall@5 must be exactly 1.0")
    assert(out.forall(_._4 == 0.0), "all top-5 are exact copies: distance 0")
    val q3 = out.filter(_._1 == 3L).map(_._3).toSet
    assert(q3 == Set(11L, 19L, 27L, 35L, 43L),
      "query 3's top-5 = its other copies (self excluded), ties by cid")
  }

  test("q310 ARI matches a driver-side brute-force recompute on the real table") {
    // recompute the whole chain — seed-centroid cosine assignment with
    // the quantize+lowest-id tie rule, contingency, pair counts, ARI —
    // in plain Scala over the sf0.001 table, and pin the query's row
    def roundZ6(x: Double): Double =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong / 1e6
    val rows = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val cents = rows.filter(_._1 < 10)
    val cells = rows.map { case (id, e, lab) =>
      val best = cents.map { case (cid, ce, _) =>
        val c6 = math.round(roundZ6(dot(e, ce) / (nrm(e) * nrm(ce))) * 1e6)
        ((1000000L - c6) * 16L + cid, cid)
      }.minBy(_._1)._2
      (best, lab)
    }
    val ct = cells.groupBy(identity).map { case (_, xs) => xs.length.toLong }
    def c2(n: Long) = n * (n - 1)
    val s2ij = ct.map(c2).sum
    val s2a = cells.groupBy(_._1).map(g => c2(g._2.length.toLong)).sum
    val s2b = cells.groupBy(_._2).map(g => c2(g._2.length.toLong)).sum
    val n = cells.length.toLong
    val exp = s2a.toDouble * s2b.toDouble / (n * (n - 1)).toDouble
    val ari = roundZ6((s2ij.toDouble - exp) /
      ((s2a.toDouble + s2b.toDouble) / 2.0 - exp))
    val out = q("q310_ari_cluster_eval")(spark, sf).collect().head
    assert(out.getLong(0) == n, "n_vecs")
    assert(out.getLong(3) == s2ij / 2, "agreeing pair count")
    assert(out.getDouble(4) == ari, "ARI bit-equal to the brute recompute")
  }
}
