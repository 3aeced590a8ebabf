package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the Misra–Gries candidate pass behind q121 that the oracle
  * hash-match exercises only incidentally: the sketch must NEVER drop a true
  * heavy hitter (the superset guarantee is what makes the exact recount
  * correct), and its memory must stay bounded by the capacity k.
  */
class TextAnalysisSpec extends AnyFunSuite {
  import graft.operators.TextAnalysis.misraGries

  test("MG survives every item with partition count > N/(k+1), size <= k") {
    // adversarial interleave: one heavy item inside a flood of distinct
    // singletons (the worst case for counter eviction)
    val n = 10000
    val stream = (0 until n).map(i => if (i % 5 == 0) "HEAVY" else s"u$i")
    val out = misraGries(stream.iterator, 9).toSet
    // count(HEAVY) = 2000 > 10000/10 = N/(k+1) -> must survive
    assert(out.contains("HEAVY"))
    assert(out.size <= 9)
  }

  test("per-partition MG union is a superset of global heavy hitters") {
    // mirrors q121's shape: phi = 1/500, k = 1024 > 1/phi - 1, stream
    // split across 4 "partitions" by deterministic index hash
    val heavies = (1 to 5).map(h => s"h$h")
    val noise = (1 to 7000).map(i => s"n$i")
    val stream = heavies.flatMap(h => Seq.fill(600)(h)) ++ noise
    val parts = stream.zipWithIndex.groupBy { case (_, i) => (i * 2654435761L) % 4 }
      .values.map(_.map(_._1))
    val union = parts.flatMap(p => misraGries(p.iterator, 1024)).toSet
    val nTot = stream.size
    val exact = stream.groupBy(identity).collect {
      case (g, xs) if xs.size * 500L >= nTot => g
    }.toSet
    assert(exact.nonEmpty, "planted heavies must clear the threshold")
    assert(exact.subsetOf(union),
      s"missing heavy hitters: ${exact.diff(union)}")
  }

  test("MG exact-count phase equals a straight groupBy on a planted stream") {
    // end-to-end shape check without Spark: candidates from MG, then exact
    // recount restricted to candidates, must equal the full exact answer
    val stream = (1 to 3).flatMap(h => Seq.fill(100)(s"h$h")) ++
      (1 to 500).map(i => s"n$i")
    val nTot = stream.size // 800, T = ceil(800/500) -> cnt*500 >= 800
    val cand = misraGries(stream.iterator, 1024).toSet
    val fromCand = stream.filter(cand).groupBy(identity)
      .collect { case (g, xs) if xs.size * 500L >= nTot => g -> xs.size }
    val full = stream.groupBy(identity)
      .collect { case (g, xs) if xs.size * 500L >= nTot => g -> xs.size }
    assert(fromCand.toMap == full.toMap)
  }

  test("q217 posting lists parse back to exact (doc, positions) occurrences") {
    val rows = SparkEntry.queries("q217_inverted_index")(
      TestSpark.spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty, "empty index")
    // ground truth: every bigram occurrence with its 0-based first-word
    // position, recomputed directly from the corpus on the driver
    val truth = Tables.t(TestSpark.spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        toks.sliding(2).zipWithIndex.collect {
          case (Array(a, b), i) => (s"$a $b", r.getLong(0), i.toLong)
        }
      }.groupBy(_._1)
    rows.foreach { case (g, df, ttf, postings) =>
      val occ = truth(g).map(t => (t._2, t._3))
      val byDoc = occ.groupBy(_._1)
      assert(df == byDoc.size.toLong, s"$g df")
      assert(ttf == occ.length.toLong, s"$g ttf")
      assert(df >= 3 && df <= 40, s"$g df outside the indexed band")
      val parsed = postings.split(";").map { e =>
        val Array(docS, posS) = e.split("@")
        docS.toLong -> posS.split(":").map(_.toLong).toSeq
      }
      assert(parsed.map(_._1).toSeq == parsed.map(_._1).toSeq.sorted,
        s"$g docs not ordered")
      parsed.foreach { case (doc, ps) =>
        assert(ps == ps.sorted, s"$g doc $doc positions not ordered")
        assert(ps.toSet == byDoc(doc).map(_._2).toSet,
          s"$g doc $doc positions mismatch")
      }
    }
  }

  test("q227 RAKE scores match a direct reference implementation") {
    val rows = SparkEntry.queries("q227_rake_keywords")(
      TestSpark.spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val stop = Set("the", "a", "of", "and", "to", "in")
    val texts = Tables.t(TestSpark.spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map(_.getString(0))
    // reference RAKE: phrases by stop-split, deg/freq word scores
    val phrases = texts.flatMap { t =>
      val out = scala.collection.mutable.ArrayBuffer[List[String]]()
      var cur = List.newBuilder[String]
      t.split(" ", -1).foreach { w =>
        if (stop(w)) { val p = cur.result(); if (p.nonEmpty) out += p
          cur = List.newBuilder[String] }
        else cur += w
      }
      val p = cur.result(); if (p.nonEmpty) out += p
      out.toSeq
    }
    val freq = phrases.flatten.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong }
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    def wq(w: String): Long =
      math.round(deg(w).toDouble / freq(w).toDouble * 1e9)
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = phrases.map(p => (p.mkString(" "), p.map(wq).sum))
      .groupBy(_._1).map { case (ph, xs) =>
        (ph, xs.size.toLong, round6(xs.map(_._2).max / 1e9)) }
    val top = scored.toSeq.sortBy { case (ph, _, s) => (-s, ph) }.take(20)
    rows.zip(top).foreach { case ((ph, nOcc, sc), (eph, eN, eSc)) =>
      assert(ph == eph, s"phrase order: $ph vs $eph")
      assert(nOcc == eN, s"$ph occurrences")
      assert(math.abs(sc - eSc) < 1e-6, s"$ph score")
    }
  }

  test("q228 Flesch components recompute exactly per source") {
    val rows = SparkEntry.queries("q228_readability")(
      TestSpark.spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val docsL = Tables.t(TestSpark.spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = docsL.groupBy(_._1)
    rows.foreach { case (src, nd, w, sent, syl, flesch) =>
      val ts = bySrc(src).map(_._2)
      assert(nd == ts.length.toLong)
      val wRef = ts.map(_.split(" ", -1).length.toLong).sum
      val sentRef = ts.map(t =>
        math.max("[.!?]+".r.findAllIn(t).length, 1).toLong).sum
      val sylRef = ts.map(t =>
        "[aeiouy]+".r.findAllIn(t.toLowerCase).length.toLong).sum
      assert(w == wRef && sent == sentRef && syl == sylRef, s"$src counts")
      val f = 206.835 - 1.015 * (wRef.toDouble / sentRef.toDouble) -
        84.6 * (sylRef.toDouble / wRef.toDouble)
      assert(math.abs(flesch - f) < 1e-3, s"$src flesch")
    }
  }

  test("q233 Good–Turing count-of-counts recompute; mass identities hold") {
    val rows = SparkEntry.queries("q233_good_turing")(
      TestSpark.spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val docsL = Tables.t(TestSpark.spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = docsL.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (lang, xs) =>
      val grams = byLang(lang).flatMap { case (_, t) =>
        val toks = t.split(" ", -1)
        toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      }
      val counts = grams.groupBy(identity).map(_._2.size.toLong)
      val nr = counts.groupBy(identity).map { case (r, g) =>
        r -> g.size.toLong }
      val nTok = counts.sum
      val vocab = counts.size.toLong
      xs.foreach { case (_, r, nR, nT, v, p0, rStar) =>
        assert(nR == nr(r), s"$lang n_$r")
        assert(nT == nTok && v == vocab, s"$lang totals")
        if (r == 1)
          assert(p0 == nR.toDouble / nTok.toDouble, s"$lang p0")
        else assert(p0 == 0.0)
        val expect = nr.get(r + 1)
          .map(n2 => (r + 1).toDouble * n2.toDouble / nR.toDouble)
          .getOrElse(0.0)
        assert(rStar == expect, s"$lang r*($r)")
      }
      // Good–Turing mass identity: sum over ALL r of r·n_r = N
      assert(nr.map { case (r, n) => r * n }.sum == nTok, s"$lang mass")
    }
  }

  test("q236 BPE rounds match true token-level greedy merging") {
    val rows = SparkEntry.queries("q236_bpe_merges")(
      TestSpark.spark, TestSpark.sf).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)),
        (r.getString(3), r.getLong(4)))).toMap
    assert(rows.nonEmpty)
    val docsL = Tables.t(TestSpark.spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // token-level BPE reference: greedy leftmost non-overlapping merge
    def applyMerge(toks: List[String], pa: String, pb: String)
        : List[String] = toks match {
      case a :: b :: rest if a == pa && b == pb =>
        (pa + pb) :: applyMerge(rest, pa, pb)
      case a :: rest => a :: applyMerge(rest, pa, pb)
      case Nil => Nil
    }
    def pairCounts(words: Map[List[String], Long])
        : Map[(String, String), Long] =
      words.toSeq.flatMap { case (toks, f) =>
        toks.zip(toks.drop(1)).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    docsL.groupBy(_._1).foreach { case (lang, ds) =>
      var words = ds.flatMap(_._2.split(" ", -1)).filter(_.length >= 2)
        .groupBy(identity).map { case (w, g) =>
          w.map(_.toString).toList -> g.size.toLong }
      for (round <- 1L to 2L) {
        val pc = pairCounts(words)
        val top3 = pc.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.take(3)
        top3.zipWithIndex.foreach { case (((a, b), c), i) =>
          assert(rows((lang, round, i + 1L)) == ((s"$a+$b", c)),
            s"$lang round $round rank ${i + 1}")
        }
        val (pa, pb) = top3.head._1
        words = words.toSeq.map { case (toks, f) =>
          applyMerge(toks, pa, pb) -> f }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
  }

  test("q225 JS divergence: bounded by ln 2, zero iff mix matches corpus") {
    val rows = SparkEntry.queries("q225_js_divergence")(
      TestSpark.spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val docsL = Tables.t(TestSpark.spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nTot = docsL.length.toDouble
    val byLang = docsL.groupBy(_._2).map { case (l, xs) =>
      l -> xs.length.toDouble / nTot }
    val bySrc = docsL.groupBy(_._1)
    rows.foreach { case (src, nDocs, js) =>
      assert(nDocs == bySrc(src).length.toLong, s"$src doc count")
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"$src js bound")
      val nS = bySrc(src).length.toDouble
      val pSrc = bySrc(src).groupBy(_._2).map { case (l, xs) =>
        l -> xs.length.toDouble / nS }
      val ref = byLang.map { case (l, q) =>
        val p = pSrc.getOrElse(l, 0.0)
        val m = (p + q) / 2.0
        (if (p > 0) p * math.log(p / m) else 0.0) + q * math.log(q / m)
      }.sum / 2.0
      assert(math.abs(js - ref) < 1e-6, s"$src js $js vs $ref")
    }
  }

  test("q352: BPE segmentation round-trips and merge rounds only shrink") {
    // The two contracts the hash-compare can't see: (1) DECODE — for
    // every vocabulary word, concatenating its subwords in position
    // order reproduces the word exactly (no symbol lost, duplicated or
    // reordered by the island-parity overlap rule); (2) each merge round
    // is a pure contraction — total subword count is strictly
    // non-increasing per round and the segment count never drops below
    // one symbol per word.
    import TestSpark.{spark, sf}
    import org.apache.spark.sql.functions._
    val counts = (0 to 4).map { r =>
      val (seg, _) = operators.TextAnalysis.bpeSegments(spark, sf, r)
      if (r == 4) {
        // collect_list order is shuffle-dependent — sort the (i, sym)
        // structs (struct order = position order) before joining
        val bad = seg.groupBy(col("word"))
          .agg(array_join(transform(array_sort(collect_list(
            struct(col("i"), col("sym")))), x => x.getField("sym")), "")
            .as("back"))
          .filter(col("back") =!= col("word")).count()
        assert(bad == 0L, s"decode mismatch on $bad words")
      }
      seg.count()
    }
    (0 until 4).foreach { r =>
      assert(counts(r + 1) <= counts(r),
        s"round ${r + 1} grew the segmentation: ${counts.toList}")
    }
    assert(counts(4) < counts(0), "merges must actually contract")
  }

  private def md5green(prev: String, w: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"wm:$prev $w".getBytes("UTF-8"))
    val v = java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.substring(0, 14), 16)
    v % 2 == 1 // the operator's green parity (odd)
  }

  test("q364: constructed green-list text flags with z = sqrt(T); " +
    "red-list text anti-flags; zq matches a direct digest recompute") {
    import TestSpark._
    import spark.implicits._
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    // greedy watermarked generator: always pick a green successor
    // (detection must invert exactly the generator's seeded split)
    def gen(green: Boolean, steps: Int): String = {
      var cur = "alpha"
      val sb = new StringBuilder(cur)
      for (_ <- 1 to steps) {
        val next = vocab.find(w => md5green(cur, w) == green).get
        sb.append(' ').append(next); cur = next
      }
      sb.toString
    }
    val natural = "the merge sort of the data table is the slow key of the"
    val d = Seq((1L, gen(green = true, 40), "en"),
      (2L, gen(green = false, 40), "en"),
      (3L, natural, "en")).toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.watermarkZ(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // doc 1: every scored position green -> z = (2T - T)/sqrt(T) = sqrt(T)
    assert(got(1L)._2 == 40L && got(1L)._1 == 40L)
    assert(got(1L)._3 == math.round(math.sqrt(40.0) * 1e6))
    assert(got(1L)._3 > 2000000L, "watermarked text must flag at z > 2")
    // doc 2: every position red -> z = -sqrt(T)
    assert(got(2L)._2 == 0L)
    assert(got(2L)._3 == math.round(-math.sqrt(40.0) * 1e6))
    // doc 3: zq equals the straight-line digest recompute
    val toks = natural.split(" ")
    val g3 = toks.sliding(2).count(p => md5green(p(0), p(1)))
    val t3 = toks.length - 1
    assert(got(3L) == ((t3.toLong, g3.toLong,
      math.round((2.0 * g3 - t3) / math.sqrt(t3.toDouble) * 1e6))))
  }

  test("q367: planted loops recover their fundamental period; " +
    "distinct-token text reads rate 0 at period 1") {
    import TestSpark._
    import spark.implicits._
    val loop2 = Array.fill(20)("the cat").mkString(" ")
    val loop3 = Array.fill(13)("a b c").mkString(" ")
    val clean = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, loop2, "en"), (2L, loop3, "en"), (3L, clean, "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.periodicBest(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // period-2 loop: rates at p=2,4,6,8 are all 1.0; the packed argmax
    // must break the tie to the FUNDAMENTAL period 2
    assert(got(1L) == ((2L, 1000000L)), s"got ${got(1L)}")
    assert(got(2L) == ((3L, 1000000L)), s"got ${got(2L)}")
    assert(got(3L) == ((1L, 0L)), s"got ${got(3L)}")
  }

  test("q371 BLEU-2: identity pair scores 1, disjoint pair scores 0, " +
    "short candidate pays exactly exp(1 - r/c)") {
    import TestSpark._
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a", "en"), (2L, "a b c a", "en"), // identical
      (10L, "x y z w", "de"), (11L, "p q r s", "de"), // disjoint
      (20L, "a b", "fr"), (21L, "a b c d", "fr") // short candidate
    ).toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.selfBleuPairs(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1000000L, 0L)), "identical pair must score 1.0")
    assert(got(10L) == ((0L, 1L)), "disjoint pair must score 0 and flag")
    // p1 = p2 = 1, BP = exp(1 - 4/2) = e^-1
    assert(got(20L) == ((math.round(math.exp(-1.0) * 1e6), 0L)),
      "brevity penalty must be exactly exp(1 - r/c)")
  }
}
