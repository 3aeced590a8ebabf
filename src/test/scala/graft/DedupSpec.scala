package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the dedup operators that the oracle hash-match
  * alone doesn't isolate: in-bucket pair generation must be exactly
  * C(n,2), and prefix filtering must be LOSSLESS at the 0.5 threshold —
  * the optimized q31 must return the same pairs as the naive
  * all-shared-shingle formulation.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark._

  test("in-bucket pair generation yields exactly C(n,2) ordered pairs") {
    // mirrors Dedup.bucketPairs (private): double positional explode
    import spark.implicits._
    val buckets = Seq(
      (Seq(1L, 2L, 3L, 4L)), // C(4,2) = 6
      (Seq(7L, 9L)),         // 1
      (Seq(5L, 6L, 7L))      // 3, overlapping ids with bucket 2
    ).toDF("ids")
    val pairs = buckets
      .select(col("ids"), explode(expr("sequence(0, size(ids) - 2)")).as("i"))
      .select(col("ids"), col("i"),
        explode(expr("sequence(i + 1, size(ids) - 1)")).as("j"))
      .select(col("ids")(col("i")).as("da"), col("ids")(col("j")).as("db"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (7L, 9L),
      (5L, 6L), (5L, 7L), (6L, 7L))
    assert(pairs === expected)
    assert(pairs.forall { case (a, b) => a < b }, "pairs must be ordered da < db")
  }

  test("prefix filtering is lossless at the 0.5 Jaccard threshold (sf0.001)") {
    // naive reference: every doc pair sharing ANY (lang, shingle),
    // verified by exact Jaccard — no prefix pruning
    val optimized = SparkEntry.queries("q31_dedup_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val docs = Tables.t(spark, sf, "documents")
    val sh = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("toks"),
        explode(expr("sequence(0, size(toks) - 3)")).as("i"))
      .select(col("doc_id"), col("lang"),
        concat(col("toks")(col("i")), lit("|"),
               col("toks")(col("i") + 1), lit("|"),
               col("toks")(col("i") + 2)).as("shingle"))
      .distinct()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val naive = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ni"))
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("jac", round(col("ni").cast("double") /
        (col("na") + col("nb") - col("ni")).cast("double"), 6))
      .filter(col("jac") >= 0.5)
      .select(col("da"), col("db"), col("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(optimized === naive,
      s"prefix filtering dropped or added pairs: opt=${optimized.size} naive=${naive.size}")
  }

  test("connected components: unique min-label fixpoint on a worst-case graph") {
    // a 12-node path (maximum diameter — the propagation-round worst
    // case), one triangle with a bridge, two isolated edges; expected
    // components are known exactly
    import spark.implicits._
    val pairs = Seq.tabulate(11)(i => (i.toLong, i + 1L)) ++ // path 0..11
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L)) ++ // triangle+bridge
      Seq((30L, 31L), (40L, 41L))
    val cc = graft.operators.Dedup
      .connectedComponents(pairs.toDF("da", "db").repartition(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected =
      (0L to 11L).map(_ -> 0L).toMap ++
        (20L to 23L).map(_ -> 20L).toMap ++
        Map(30L -> 30L, 31L -> 30L, 40L -> 40L, 41L -> 40L)
    assert(cc === expected)
  }

  test("adversarial-diameter graph falls back to large-star/small-star") {
    // a 51-node path has diameter 50 > the propagation default of 25
    // rounds — before r6 this raised; now it must fall through to the
    // Kiveris star formulation and still produce the exact min-label
    // components. Mixed with a near-clique and a pair to pin that the
    // fallback handles heterogeneous shapes in one call.
    import spark.implicits._
    val pairs = Seq.tabulate(50)(i => (100L + i, 101L + i)) ++ // path 100..150
      Seq((7L, 8L), (8L, 9L), (7L, 9L)) ++                     // triangle
      Seq((1L, 2L))
    val cc = graft.operators.Dedup
      .connectedComponents(pairs.toDF("da", "db").repartition(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected =
      (100L to 150L).map(_ -> 100L).toMap ++
        (7L to 9L).map(_ -> 7L).toMap ++ Map(1L -> 1L, 2L -> 1L)
    assert(cc === expected)
  }

  test("starComponents alone matches min-label on the 12-node worst case") {
    // the fallback must agree with the propagation path on the graph the
    // propagation test pins (so the two formulations are interchangeable)
    import spark.implicits._
    val pairs = Seq.tabulate(11)(i => (i.toLong, i + 1L)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L)) ++
      Seq((30L, 31L), (40L, 41L))
    val cc = graft.operators.Dedup
      .starComponents(pairs.toDF("da", "db").repartition(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected =
      (0L to 11L).map(_ -> 0L).toMap ++
        (20L to 23L).map(_ -> 20L).toMap ++
        Map(30L -> 30L, 31L -> 30L, 40L -> 40L, 41L -> 40L)
    assert(cc === expected)
  }

  test("both formulations label a self-loop-only node a singleton") {
    // the star rounds drop (a,a) edges, so a node appearing ONLY as a
    // self-loop would vanish from starComponents while the propagation
    // path labels it a singleton — starComponents re-attaches such ids,
    // keeping the two formulations interchangeable on degenerate input
    import spark.implicits._
    val pairs = Seq((5L, 5L), (1L, 2L), (2L, 2L)).toDF("da", "db")
    val expected = Map(5L -> 5L, 1L -> 1L, 2L -> 1L)
    val star = graft.operators.Dedup.starComponents(pairs.repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val prop = graft.operators.Dedup.connectedComponents(pairs.repartition(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star === expected)
    assert(prop === expected)
  }

  test("hot-bucket cap bounds LSH pair generation") {
    // 200 copies of one boilerplate vector — the adversarial corpus where
    // every doc shares every band bucket. Without the cap this is
    // C(200,2) = 19,900 pairs from ONE bucket (and O(N²) at corpus
    // scale); with the default cap the bucket is dropped and pair output
    // stays bounded. Raising the cap restores the quadratic set, pinning
    // that the cap (not some other pruning) bounded the explosion.
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val base = Array.fill(32)(rng.nextGaussian().toFloat)
    val df = (0 until 200).map(i => (i.toLong, base.clone()))
      .toDF("vid", "embv").repartition(4)
    val capped = graft.operators.Dedup
      .embeddingNearDup(df, "vid", "embv", 0.95).count()
    assert(capped == 0, s"capped hot bucket must emit no pairs, got $capped")
    val uncapped = graft.operators.Dedup
      .embeddingNearDup(df, "vid", "embv", 0.95, maxBucket = 1000).count()
    assert(uncapped == 200L * 199 / 2,
      s"uncapped must be C(200,2) = 19900, got $uncapped")
  }

  test("q120 containment flags a contained snippet that Jaccard misses") {
    import spark.implicits._
    // eval doc 3 is a 12-token snippet embedded VERBATIM inside corpus
    // doc 10, whose 24 tokens of extra context push symmetric Jaccard to
    // 10/34 ≈ 0.29 while eval-side containment is exactly 1.0 — the
    // asymmetry that justifies q120 next to q32. (Band collision under
    // the fixed hash family was checked offline for THESE sizes; banding
    // recall for diluted containment pairs is probabilistic by design —
    // the scaladoc documents that limitation.) Doc 20 shares nothing.
    val snippet = (1 to 12).map(i => s"s$i").mkString(" ")
    val context = (1 to 24).map(i => s"c$i").mkString(" ")
    val d = Seq(
      (3L, "en", snippet),
      (10L, "en", s"$context $snippet"),
      (20L, "en", (1 to 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val rows = graft.operators.Dedup
      .containmentStats(d, _ % 97 === 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 1, s"exactly one flagged eval doc, got ${rows.toSeq}")
    val (eid, nHits, cont, cid) = rows.head
    assert(eid == 3L && cid == 10L && nHits == 1L)
    assert(cont == 1.0, s"snippet fully contained -> containment 1.0, got $cont")
    // and the symmetric Jaccard of the same pair is below the q32 bar:
    // |A| = 10 shingles, |B| = 34, A subset of B -> jac = 10/34 < 0.5
    assert(10.0 / 34.0 < 0.5)
  }

  test("embedding LSH recall >= 0.9 on planted near-duplicates") {
    // 60 random base vectors (seeded) + 40 planted near-dups (tiny
    // perturbation, cos ≈ 0.999). Brute force is the ground truth at
    // this scale; the LSH path must recover ≥90% of true pairs and must
    // never emit a pair below the threshold (precision 1 by verify).
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = (0 until 60).map { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat))
    }
    val planted = (0 until 40).map { i =>
      val src = base(i)._2
      (100L + i, src.map(v => v + 0.01f * rng.nextGaussian().toFloat))
    }
    val df = (base ++ planted).toDF("vid", "embv").repartition(4)
    val thresh = 0.95
    val lsh = graft.operators.Dedup
      .embeddingNearDup(df, "vid", "embv", thresh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth (driver-side: 100 vectors)
    val vecs = (base ++ planted).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toSeq.sorted
    val truth = (for {
      x <- ids; y <- ids if x < y
      if BigDecimal(cos(vecs(x), vecs(y)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= thresh
    } yield (x, y)).toSet
    assert(truth.size >= 40, s"expected all planted pairs in truth, got ${truth.size}")
    assert(lsh.subsetOf(truth), "LSH must not emit below-threshold pairs")
    val recall = lsh.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
  }
  test("q122 passage dedup keeps exactly the first occurrence (planted)") {
    import spark.implicits._
    // doc 1: two passages A=(w1..w10), B=(w11..w20)
    // doc 2: byte-identical to doc 1 -> both passages dropped, text ""
    // doc 3: passage B again, plus a unique 5-token tail -> keeps tail only
    val w = (1 to 20).map(i => s"w$i")
    val a = w.take(10).mkString(" "); val b = w.drop(10).mkString(" ")
    val tail = "t1 t2 t3 t4 t5"
    val d = Seq(
      (1L, s"$a $b"),
      (2L, s"$a $b"),
      (3L, s"$b $tail")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.passageDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, s"$a $b"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 1L, tail)))
  }

  test("q205: no near-dup pair and no cluster straddles the split (sf0.001)") {
    // End-to-end leakage pin for the cluster-safe split: recompute the
    // side assignment exactly as q205 does, from the REGISTERED q32 pair
    // output (the verified near-dup relation) + the public
    // connectedComponents, and assert the property the summary query
    // cannot show: (1) every duplicate cluster maps to exactly one side,
    // and (2) — the user-facing guarantee — no q32 pair has its two docs
    // on different sides. Also sanity-bound the eval share: the md5
    // bucket cut is 800/1000, so train should carry roughly 80% of docs.
    val pairs = SparkEntry.queries("q32_dedup_minhash_lsh")(spark, sf)
      .select(col("da"), col("db"))
    val comps = graft.operators.Dedup.connectedComponents(pairs)
    val dd = graft.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        conv(substring(md5(col("text").cast("binary")), 1, 14), 16, 10)
          .cast("long").as("hb"))
    val withComp = dd.join(comps, dd("doc_id") === comps("id"), "left")
      .select(col("doc_id"), col("hb"),
        coalesce(col("comp"), col("doc_id")).as("comp_id"))
    val repKey = withComp.groupBy(col("comp_id"))
      .agg(min(col("hb")).as("rep_hb"))
    val keyed = withComp.join(repKey, "comp_id")
      .withColumn("side",
        when(col("rep_hb") % 1000L < 800, "train").otherwise("eval"))
      .select(col("doc_id"), col("comp_id"), col("side"))
    val straddling = keyed.groupBy(col("comp_id"))
      .agg(countDistinct(col("side")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling == 0L, "a duplicate cluster straddles the split")
    val sideOf = keyed.select(col("doc_id"), col("side"))
    val pairSides = pairs
      .join(sideOf.withColumnRenamed("doc_id", "da")
        .withColumnRenamed("side", "side_a"), "da")
      .join(sideOf.withColumnRenamed("doc_id", "db")
        .withColumnRenamed("side", "side_b"), "db")
      .filter(col("side_a") =!= col("side_b")).count()
    assert(pairSides == 0L, "a near-dup pair straddles the split")
    val bysSide = keyed.groupBy(col("side")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bysSide.values.sum.toDouble
    val evalShare = bysSide.getOrElse("eval", 0L) / total
    assert(evalShare > 0.05 && evalShare < 0.40,
      s"eval share $evalShare outside the plausible band for an 80/20 cut")
  }

  test("q210: admission verdicts are invariant to micro-batch chunking") {
    // The design claim that makes q210 a legitimate STREAMING operator:
    // because the hot-bucket cap is a static corpus-index property
    // (never computed over corpus ∪ batch like q100's union-side cap),
    // each feed doc's verdict depends only on (doc, corpus) — so the
    // same feed processed one file per micro-batch (4 batches) and all
    // at once (1 batch) must emit byte-identical verdict rows. A
    // union-side cap would fail this: a bucket's fate would depend on
    // which feed docs happened to share the trigger.
    def run(fpt: Int) =
      graft.operators.Dedup.streamAdmission(spark, sf, fpt)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    val perFile = run(1)
    val oneShot = run(4)
    assert(perFile.length == oneShot.length && perFile.nonEmpty,
      s"row counts differ: ${perFile.length} vs ${oneShot.length}")
    assert(perFile.toSeq == oneShot.toSeq,
      "verdicts depend on micro-batch chunking")
  }

  test("q341: curation accounting is invariant to micro-batch chunking") {
    // q341 ships only KEY-level facts (unique (lang, content) counts,
    // row counts) precisely so intra-batch arrival order and batch
    // boundaries cannot leak into results — per-file replay vs the
    // whole feed in one batch must agree exactly.
    def run(fpt: Int) =
      graft.operators.Dedup.streamCuration(spark, sf, fpt)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    val perFile = run(1)
    val oneShot = run(4)
    assert(perFile.nonEmpty && perFile.toSeq == oneShot.toSeq,
      "curation accounting depends on micro-batch chunking")
  }

  test("q270 CDC chunks are shift-resistant; fixed windows are not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 2 = doc 1 with ONE token prepended: content-defined boundaries
    // re-align immediately, fixed 10-token windows never do
    val words = (1 to 400).map(i => s"w${(i * 7919) % 997}")
    val orig = words.mkString(" ")
    val shifted = ("zzz " + orig)
    val df = Seq((1L, orig), (2L, shifted)).toDF("doc_id", "text")
    val ch = graft.operators.Dedup.cdcChunks(df)
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = h1.intersect(h2).size.toDouble / h1.size.toDouble
    assert(shared > 0.8,
      s"CDC must re-align after an insertion: only ${100 * shared}%% shared")
    // the fixed-window formulation on the same pair: every 10-token
    // window after the insertion point is offset by one => ~zero overlap
    def fixedWindows(text: String): Set[String] =
      text.split(" ").grouped(10).map(_.mkString(" ")).toSet
    val fShared = fixedWindows(orig).intersect(fixedWindows(shifted)).size
    assert(fShared == 0,
      "fixture must be one where fixed windows fail completely")
  }

  test("near-pair threshold classifies the [0.4999995, 0.5) boundary as below") {
    // mirrors Dedup.jacRaw (private): the ONE house threshold expression
    // `ni / (sza + szb − ni) >= 0.5`, on the raw unrounded ratio. The r7
    // verdict's landmine: a pair whose true Jaccard is in [0.4999995, 0.5)
    // has round(jac, 6) == 0.5, so a site filtering the ROUNDED value
    // would admit it while the raw-filter sites (and every oracle) class
    // it below — breaking q100's "exactly the mixed-membership subset of
    // q32's pairs" claim. Pin: raw filter excludes it, the rounded filter
    // provably would not, and an exactly-0.5 pair passes both.
    import spark.implicits._
    val cases = Seq(
      // (ni, sza, szb): jac = ni/(sza+szb-ni)
      (999999L, 1499999L, 1499999L), // 999999/1999999 ≈ 0.49999975 — boundary
      (1L, 2L, 1L),                  // 1/2 = 0.5 exactly — in
      (2L, 3L, 3L),                  // 2/4 = 0.5 exactly — in
      (49L, 100L, 48L)               // 49/99 ≈ 0.4949 — clearly out
    ).toDF("ni", "sza", "szb")
    val jac = col("ni").cast("double") /
      (col("sza") + col("szb") - col("ni")).cast("double")
    val got = cases
      .select(col("ni"), (jac >= 0.5).as("raw_in"),
        (round(jac, 6) >= 0.5).as("rounded_in"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(got(999999L) == ((false, true)),
      "boundary pair: raw filter must exclude what the rounded filter admits")
    assert(got(1L) == ((true, true)) && got(2L) == ((true, true)),
      "exact-0.5 pairs are in under both forms")
    assert(got(49L) == ((false, false)))
  }

  test("q343 golden record: survivorship fields are cluster-consistent") {
    // the golden id must be the cluster's min doc_id; the modal values
    // and max n_chars must come from actual members — recompute the
    // member sets from q109's identical clustering inputs driver-side
    val rows = SparkEntry.queries("q343_golden_record")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2L, "a cluster has at least two members")
      assert(r.getLong(6) >= 1L && r.getLong(6) <= r.getLong(1),
        "distinct lang values bounded by member count")
      assert(r.getLong(7) >= 1L && r.getLong(7) <= r.getLong(1),
        "distinct source values bounded by member count")
    }
    // cross-check against q109 (same clustering): same cluster ids and
    // member counts
    val kb = SparkEntry.queries("q109_dedup_keep_best")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gr = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gr == kb,
      "q343 and q109 must agree on cluster ids and member counts")
  }

  test("q348: winnowing's positional guarantee on a crafted shared run") {
    // The property that distinguishes winnowing from whole-doc
    // signatures (SWA 2003): two documents sharing a run of ≥ W+2 = 6
    // tokens share at least one FULL window of 3-gram hashes, hence at
    // least one selected fingerprint. Build a scratch corpus where docs
    // 1 and 2 embed the same 16-token passage inside otherwise-disjoint
    // text, with enough repetitions (≥ 5 shared prints required by the
    // query's report threshold) — the pair MUST be reported. Docs 3/4
    // share nothing — they must NOT pair with anything.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_spec").toString
    val passage = (1 to 16).map(i => s"shared$i").mkString(" ")
    val shared = (passage + " ") * 4 // 64 shared tokens → ≥5 shared prints
    val s2 = spark
    import s2.implicits._
    Seq(
      (1L, s"alpha beta gamma $shared delta epsilon", "en", "src0"),
      (2L, s"zig zag zoom $shared quux corge grault", "en", "src0"),
      (3L, (1 to 40).map(i => s"uniqa$i").mkString(" "), "de", "src1"),
      (4L, (1 to 40).map(i => s"uniqb$i").mkString(" "), "fr", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q348_dedup_winnowing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 5L),
      s"the shared-passage pair (1,2) must be reported: ${pairs.toSeq}")
    assert(pairs.forall(p => p._1 == 1L && p._2 == 2L),
      s"disjoint docs must not pair: ${pairs.toSeq}")
  }

  test("q350: maximal shared run is reported with its exact planted extent") {
    // The contract that distinguishes q350 from every other detector in
    // the family: not "these docs overlap" but WHERE and HOW MUCH,
    // exactly. Plant one 20-token passage at token offset 3 of doc 1 and
    // offset 5 of doc 2, surrounded by disjoint text: the report must
    // contain exactly one run for the pair, with start_a=3, start_b=5,
    // run_len=20 — maximal (not a fragment), not over-extended (the
    // disjoint neighbors must not inflate it). Docs 3/4 share nothing
    // and must not appear.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_runs_spec").toString
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val s2 = spark
    import s2.implicits._
    Seq(
      (1L, s"pre1a pre1b pre1c $passage post1a post1b", "en", "src0"),
      (2L, s"pre2a pre2b pre2c pre2d pre2e $passage post2a", "en", "src0"),
      (3L, (1 to 40).map(i => s"uniqa$i").mkString(" "), "de", "src1"),
      (4L, (1 to 40).map(i => s"uniqb$i").mkString(" "), "fr", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val runs = SparkEntry.queries("q350_dedup_substring_runs")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(runs.toSeq == Seq((1L, 2L, 3L, 5L, 20L)),
      s"expected exactly the planted extent (1,2,3,5,20): ${runs.toSeq}")
  }

  test("q355: containment catches a quoted doc that symmetric Jaccard misses") {
    // The asymmetry q355 exists for: doc 1 (12 tokens) is quoted verbatim
    // inside doc 2 (62 tokens). Containment(1→2) = 1.0, but Jaccard =
    // 10/(10+60−10) ≈ 0.17 < 0.5 — the symmetric detector (q31) must NOT
    // pair them while q355 must, with the contained doc on the da side
    // only (2→1 containment ≈ 0.17 fails the 0.8 bar).
    val dir = java.nio.file.Files
      .createTempDirectory("graft_contain_spec").toString
    val quote = (1 to 12).map(i => s"quoted$i").mkString(" ")
    val filler = (1 to 25).map(i => s"fill$i").mkString(" ")
    val filler2 = (1 to 25).map(i => s"tail$i").mkString(" ")
    val s2 = spark
    import s2.implicits._
    Seq(
      (1L, quote, "en", "src0"),
      (2L, s"$filler $quote $filler2", "en", "src0"),
      (3L, (1 to 40).map(i => s"uniqc$i").mkString(" "), "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = SparkEntry.queries("q355_dedup_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)),
      s"expected exactly the (1 contained-in 2) pair: ${cont.toSeq}")
    val jacPairs = SparkEntry.queries("q31_dedup_ngram_jaccard")(spark, dir)
      .collect()
    assert(jacPairs.isEmpty,
      s"symmetric Jaccard must miss the quoted pair: ${jacPairs.toSeq}")
  }
}
