package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Analytics module that the DuckDB hash-match cannot
  * express: partition-independence (the property that makes the exact-
  * integer aggregation designs safe at cluster scale), sketch determinism,
  * and agreement with straight-line reference computations.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)

  test("q115 mixture weights are exact integer-mass ratios (driver recompute)") {
    // the α=1/2 temperature design holds only if every operand reaching
    // the one double division is an exact integer; recompute the whole
    // chain driver-side and demand bit equality
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = q("q115_mixture_weights")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val perDoc = Tables.t(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = perDoc.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val masses = bySrc.map { case (s, (_, t)) =>
      s -> math.floor(math.sqrt(t.toDouble)).toLong
    }
    val totMass = masses.values.sum
    val totToks = bySrc.values.map(_._2).sum
    assert(rows.length == bySrc.size)
    rows.foreach { case (s, nDocs, nToks, mass, w, ep) =>
      assert((nDocs, nToks) == bySrc(s), s"source $s counts")
      assert(mass == masses(s), s"source $s mass")
      assert(w == round6(mass.toDouble / totMass.toDouble), s"source $s weight")
      assert(ep == round6((mass.toDouble * totToks.toDouble) /
        (totMass.toDouble * nToks.toDouble)), s"source $s epochs")
    }
  }

  test("q112 decontamination drops exactly the gram-sharing docs (planted)") {
    import spark.implicits._
    // eval doc 3 carries the gram "a b c d e"; corpus docs 5 and 9
    // contain it verbatim; 6 shares only a 4-token prefix (no full
    // 5-gram); the rest are clean
    val d = Seq(
      (3L, "a b c d e", "src1"), // eval
      (5L, "x a b c d e y", "src1"), // contaminated
      (9L, "q r a b c d e", "src2"), // contaminated
      (6L, "a b c d x x x", "src1"), // 4-gram overlap only -> kept
      (7L, "u v w x y z t", "src2"), // clean
      (8L, "m n o p q r s", "src2") // clean
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Pipeline
      .decontaminateStats(d, col("doc_id") === 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("src1") == ((2L, 1L, 1L, 7L)), "src1: doc5 dropped, doc6 kept")
    assert(out("src2") == ((3L, 1L, 2L, 14L)), "src2: doc9 dropped, 7/8 kept")
  }

  test("q113 boilerplate surfaces the planted shared footer at rank 1") {
    import spark.implicits._
    // 5 docs share the exact footer "end of document footer line"; each
    // body is unique, so the only cross-document 5-gram is the footer —
    // df counts DOCUMENTS (the in-doc repeat in doc 40 must not inflate
    // it past 5)
    val footer = "end of document footer line"
    val d = ((0 until 5).map(i =>
      (i.toLong, s"body$i word$i token$i extra$i more$i " + footer)) :+
      (40L, s"$footer filler filler2 $footer"))
      .toDF("doc_id", "text")
    val rows = graft.operators.Pipeline.boilerplateTopK(d, 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.head._2 == footer,
      s"rank 1 must be the planted footer, got ${rows.head}")
    assert(rows.head._3 == 6L, "df counts distinct docs incl. doc 40 once")
    // no unique body gram may reach the board (df >= 2 floor)
    assert(rows.forall(_._3 >= 2L))
  }

  test("q117 two-phase source cap equals the naive single-window form") {
    val W = org.apache.spark.sql.expressions.Window
    val twoPhase = q("q117_source_cap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // the semantics the oracle states, computed the skew-trap way —
    // correct at this SF, corpus-sized-single-task at 100 TB
    val wAll = W.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val naive = Tables.t(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        md5(col("text").cast("binary")).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("n_docs",
        count(lit(1)).over(W.partitionBy(col("source"))))
      .withColumn("rn", row_number().over(wAll))
      .filter(col("rn") <= 15)
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("sum_kept_ids"), sum(col("n_tok")).as("tokens_kept"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(twoPhase.toSeq == naive.toSeq,
      "threshold prefilter must not change which docs survive the cap")
    twoPhase.foreach { case (s, nDocs, nKept, _, _) =>
      assert(nKept == math.min(nDocs, 15L), s"source $s kept-count")
    }
  }

  test("q52 sessionize is invariant under input repartitioning") {
    val base = q("q52_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // same logic over a deliberately scrambled layout: 13 hash partitions
    val ev = Tables.t(spark, sf, "events").repartition(13, col("event_id"))
    ev.createOrReplaceTempView("ev_scrambled")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val redo = ev
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull ||
             col("us") - col("prev_us") > 43200L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess", sum(col("brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("long").as("dur_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(base.map(x => (x._1, x._2, x._3, x._4)).toSeq == redo.toSeq)
    // sessions per user are contiguous 1..n
    val byUser = base.groupBy(_._1)
    byUser.foreach { case (_, ss) =>
      assert(ss.map(_._2).sorted.toSeq == (1L to ss.length.toLong))
    }
  }

  test("q55 moment-sum correlation matches a driver-side Pearson") {
    val rows = q("q55_corr_moments")(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
      .select(col("lang"), col("n_chars").cast("double"),
        size(split(col("text"), " ")).cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { r =>
      val lang = r.getString(0)
      val xs = docs.filter(_._1 == lang)
      val n = xs.length.toDouble
      val (mx, my) = (xs.map(_._2).sum / n, xs.map(_._3).sum / n)
      val cov = xs.map(t => (t._2 - mx) * (t._3 - my)).sum
      val ref = cov / math.sqrt(
        xs.map(t => (t._2 - mx) * (t._2 - mx)).sum *
        xs.map(t => (t._3 - my) * (t._3 - my)).sum)
      assert(math.abs(r.getDouble(2) - ref) < 1e-9, s"$lang corr mismatch")
    }
  }

  test("q38 HLL sketch is deterministic across partitionings and within 5%") {
    val a = q("q38_hll_distinct")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(a.forall(_._3), "HLL estimate outside 5% of exact")
    val li = Tables.t(spark, sf, "lineitem").repartition(17, col("l_partkey"))
    val b = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val c = Tables.t(spark, sf, "lineitem").repartition(3, col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(b.toSeq == c.toSeq, "HLL estimate depends on partitioning")
  }

  test("q36 stratified sample is a deterministic content-keyed subset") {
    val once = q("q36_stratified_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val again = q("q36_stratified_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(once.toSeq == again.toSeq)
    val perLang = Tables.t(spark, sf, "documents").groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    once.foreach { case (lang, n, _) => assert(n <= perLang(lang)) }
  }

  test("q106 packing is invariant under input repartitioning and conserves mass") {
    val W = org.apache.spark.sql.expressions.Window
    val base = q("q106_sequence_packing")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2, x._3))
    // same packing logic over a deliberately scrambled layout
    val w = W.partitionBy(col("source"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val redo = Tables.t(spark, sf, "documents").repartition(13, col("doc_id"))
      .select(col("source"), col("doc_id"),
        md5(col("text").cast("binary")).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("shard",
        conv(substring(col("h"), 1, 14), 16, 10).cast("long") % 16L)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", expr("(cum - n_tok) div 1024"))
      .groupBy(col("source"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2, x._3))
    assert(base.toSeq == redo.toSeq)
    // bins are contiguous 0..max per (source, shard) — per-shard offsets
    // leave no gaps — and the packed token mass equals the corpus count
    base.groupBy(x => (x._1, x._2)).foreach { case (_, bins) =>
      assert(bins.map(_._3).sorted.toSeq == (0L until bins.length.toLong))
    }
    val totalToks = Tables.t(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(base.map(_._5).sum == totalToks)
    // every shard's non-final bins are "full": a bin closes only once the
    // running offset crosses the 1024 boundary, so each bin except the
    // shard's last must carry ≥ 1 doc and the shard's bins partition its
    // token mass exactly (already implied by contiguity + conservation)
    base.groupBy(x => (x._1, x._2)).foreach { case (_, bins) =>
      assert(bins.forall(_._4 >= 1L))
    }
  }

  test("q108 quantized AUC agrees with q102's exact AUC to grid resolution") {
    val exact = q("q102_auc_rank_metric")(spark, sf).collect()(0)
    val grid  = q("q108_auc_quantized")(spark, sf).collect()(0)
    // same population either way
    assert(exact.getLong(1) == grid.getLong(1) &&
           exact.getLong(2) == grid.getLong(2))
    // quantization only turns near-tied (< eps apart) pos–neg pairs into
    // half-credit ties; with eps = 0.25 over a ~[0, 500] 2-decimal score
    // domain that mass is tiny — the two AUCs must agree well inside it
    assert(math.abs(exact.getDouble(0) - grid.getDouble(0)) < 0.005,
      s"grid AUC ${grid.getDouble(0)} vs exact ${exact.getDouble(0)}")
    // the scale property itself: the ordered pass's input is capped by the
    // VALUE RANGE (range/eps + 1 bins), independent of corpus size
    val mx = Tables.t(spark, sf, "events")
      .agg(max(col("value"))).collect()(0).getDouble(0)
    assert(grid.getLong(3) <= (mx * 4).toLong + 1,
      s"n_bins ${grid.getLong(3)} exceeds the range cap")
  }

  test("q107 vocab/OOV is internally consistent and layout-independent") {
    val rows = q("q107_vocab_oov")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // token mass: per-lang totals sum to the corpus token count
    val total = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t")).count()
    assert(rows.map(_._2).sum == total)
    // rate column agrees with the integer counts it summarizes
    rows.foreach { case (_, n, oov, rate) =>
      assert(oov <= n && math.abs(rate - oov.toDouble / n) < 1e-5)
    }
    // the vocabulary cut (count desc, token asc) is a total order, so a
    // scrambled layout must reproduce the same per-lang numbers
    val redo = {
      val perLang = Tables.t(spark, sf, "documents")
        .repartition(13, col("doc_id"))
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      val vocab = perLang.groupBy(col("tok")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(50)
        .select(col("tok"), lit(1).as("in_v"))
      perLang.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("lang"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(when(col("in_v").isNull, col("n")).otherwise(lit(0L))).as("n_oov"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    }
    assert(rows.map(x => (x._1, x._2, x._3)).toSeq == redo.toSeq)
  }

  test("q148 PPS sample: exactly k per stratum and every row crosses a stride") {
    val rows = SparkEntry.queries("q148_pps_systematic_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // systematic WOR draws exactly k = 5 per segment whenever no single
    // weight exceeds the stride (true on this data — verify, then count)
    val bySeg = rows.groupBy(_._1)
    val wk = Tables.t(spark, sf, "customer")
      .select(col("c_mktsegment"),
        greatest(lit(1L), round(col("c_acctbal") * 100).cast("long")).as("wt"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("wt")).as("tw"), max(col("wt")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    wk.foreach { case (seg, tw, mx) =>
      assert(mx <= tw / 5, s"$seg: a weight exceeds the stride — k not guaranteed")
      assert(bySeg(seg).length == 5, s"$seg: expected exactly 5 sampled rows")
    }
    // every selected row's interval really crosses a stride multiple
    val tws = wk.map(x => x._1 -> x._2).toMap
    rows.foreach { case (seg, _, wt, cum) =>
      val stride = tws(seg) / 5
      assert(cum / stride > (cum - wt) / stride && (cum - wt) / stride < 5,
        s"$seg: selected row does not cross a stride multiple")
    }
  }

  test("q147 LM score: probabilities in (0,1], eval split only, train unseen") {
    val rows = SparkEntry.queries("q147_lm_quality_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, p) =>
      assert(id % 97 == 3, "only held-out documents may be scored")
      assert(n >= 1 && p > 0.0 && p <= 1.0, s"doc $id: avg_p=$p out of range")
    }
  }

  test("q157 EWMA fold equals the closed form recomputed on the driver") {
    // The query computes the recursion y = y·2^-gap + x via the
    // higher-order fold; this recomputes Σ cents_d · 2^(40-(T-d)) from
    // the raw events per user in exact Long arithmetic and compares.
    val got = q("q157_ewma_fold")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val daily = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == daily.keySet)
    daily.foreach { case (u, rows) =>
      val t = rows.map(_._2).max
      val s = rows.map { case (_, d, c) => c << (40 - (t - d)).toInt }.sum
      val ewma = BigDecimal(s.toDouble / 1099511627776.0 / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nDays, lastDay, gotEwma) = got(u)
      assert(nDays == rows.size && lastDay == t)
      assert(math.abs(gotEwma - ewma) < 1e-9, s"user $u: $gotEwma vs $ewma")
    }
  }

  test("q158 bootstrap CI brackets the full-sample mean with 64 replicas") {
    val r = q("q158_bootstrap_ci")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val (n, est, lo, hi) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(n == 64L)
    assert(lo < hi, s"degenerate interval [$lo, $hi]")
    // deterministic data + deterministic hashes → this is a fixed fact of
    // the dataset, not a flaky statistical assertion
    assert(lo <= est && est <= hi, s"est $est outside [$lo, $hi]")
  }

  test("q159 Count-Min estimates are one-sided: est >= exact for every candidate") {
    val rows = q("q159_countmin_sketch")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"token ${r.getString(0)}: CM under-estimated")
      assert(over == est - exact)
    }
  }

  test("q160 calibration bins partition the table; conf stays inside its bin") {
    val rows = q("q160_calibration_bins")(spark, sf).collect()
    val total = Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total, "bins must partition all rows")
    rows.foreach { r =>
      val (bin, conf, acc) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      // score = cumb/N with bin = floor(10·score) ⇒ the bin's mean score
      // lies in [bin/10, (bin+1)/10) by construction
      assert(conf >= bin / 10.0 - 1e-9 && conf < (bin + 1) / 10.0 + 1e-9,
        s"bin $bin: conf $conf outside its decile")
      assert(acc >= 0.0 && acc <= 1.0)
      val gap = r.getDouble(4)
      assert(math.abs(gap - math.abs(conf - acc)) < 2e-6)
    }
    val eces = rows.map(_.getDouble(5)).distinct
    assert(eces.length == 1, "ECE is a single corpus-level number")
  }

  test("q164 OHLC bars: invariants hold and trades are conserved") {
    val rows = q("q164_ohlc_bars")(spark, sf).collect()
    val purchases = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(2)).sum == purchases,
      "every purchase lands in exactly one bar")
    rows.foreach { r =>
      val (n, o, h, l, c) = (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
      assert(l <= o && o <= h && l <= c && c <= h,
        s"bar ${r.getLong(0)}/${r.getLong(1)}: OHLC ordering violated")
      if (n == 1) assert(o == c && o == h && o == l)
    }
  }

  test("q168 percentile bands match a driver-side sorted-percentile recompute") {
    val rows = q("q168_percentile_bands")(spark, sf).collect()
    val byType = Tables.t(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val sorted = byType(et).map(_._2).sorted
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      def pct(q100: Int): Double = {
        // smallest value with ≥ ⌈q·n⌉ mass at or below — the query's
        // integer-compare definition, recomputed directly
        val need = (q100 * n + 99) / 100
        sorted(need - 1).toDouble / 100.0
      }
      assert(r.getDouble(2) == pct(50) && r.getDouble(3) == pct(90) &&
        r.getDouble(4) == pct(99), s"$et: bands disagree with recompute")
    }
  }

  test("q163 covariance agrees with a driver recompute on dimension (1,1) and (1,2)") {
    val rows = q("q163_embedding_covariance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val vecs = Tables.t(spark, sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    assert(rows.size == 64 * 65 / 2, "upper triangle of a 64-dim matrix")
    for ((i, j) <- Seq((1, 1), (1, 2))) {
      val si = vecs.map(v => math.round(v(i - 1) * 1e8)).sum
      val sj = vecs.map(v => math.round(v(j - 1) * 1e8)).sum
      val sij = vecs.map(v => math.round(v(i - 1) * v(j - 1) * 1e8)).sum
      val gram = BigDecimal(sij.toDouble / 1e8 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val cov = BigDecimal((sij.toDouble / 1e8 -
          (si.toDouble / 1e8) * (sj.toDouble / 1e8) / n) / (n - 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn, ggram, gcov) = rows((i.toLong, j.toLong))
      assert(gn == n.toLong)
      assert(math.abs(ggram - gram) < 1e-9 && math.abs(gcov - cov) < 1e-9,
        s"($i,$j): got ($ggram,$gcov) want ($gram,$cov)")
    }
    // diagonal covariance entries are variances — nonnegative by algebra,
    // so a negative one means the exact-integer plumbing broke
    (1 to 64).foreach { i =>
      assert(rows((i.toLong, i.toLong))._3 >= 0.0, s"negative variance at $i")
    }
  }

  test("q162 oriented-wedge triangle count equals a brute-force recompute") {
    val r = q("q162_triangle_count")(spark, sf).collect()(0)
    // independent path: collect the support-2 edge set and count
    // triangles by direct 3-way membership — no orientation involved
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("u", "v").collect().map(x => (x.getLong(0), x.getLong(1)))
    val eset = edges.toSet
    val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toArray }
    var tri = 0L
    for ((u, v) <- edges; w <- adj(u) if w > v)  // u < v < w canonical
      if (eset.contains((v, w))) tri += 1
    assert(r.getLong(0) == edges.length.toLong, "edge count mismatch")
    assert(r.getLong(2) == tri, s"triangles: got ${r.getLong(2)}, want $tri")
  }

  test("q165 seasonal indices average to 1 under volume weighting") {
    val rows = q("q165_seasonal_profile")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (et, dows) =>
      val nt = dows.map(_.getLong(2)).sum.toDouble
      val weighted = dows.map(r => r.getLong(2) * r.getDouble(4)).sum / nt
      assert(math.abs(weighted - 1.0) < 1e-4,
        s"$et: volume-weighted mean index $weighted != 1")
    }
  }

  test("q166 flags exactly the >=2-sigma days a driver recompute finds") {
    val got = q("q166_spend_anomalies")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val daily = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val want = daily.toSeq.filter(_._2.length >= 5).flatMap { case (u, rows) =>
      val n = rows.length.toDouble
      val mu = rows.map(_._3).sum / n
      val sd = math.sqrt(rows.map(x => (x._3 - mu) * (x._3 - mu)).sum / n)
      rows.filter(x => math.abs((x._3 - mu) / sd) >= 2.0).map(x => (u, x._2))
    }.toSet
    assert(got == want, s"missed ${want -- got}, spurious ${got -- want}")
  }

  test("q167 nDCG matches a driver recompute from the q110 list") {
    val r = q("q167_ndcg_eval")(spark, sf).collect()(0)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(2) >= r.getDouble(1), "IDCG >= DCG always")
    // recompute from q110's ranked list + raw term frequencies
    val terms = operators.TextAnalysis.Bm25Terms.toSet
    val top = q("q110_bm25_topk")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1)))           // (rk, doc_id)
    val tf = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) ->
        x.getString(1).split(" ").count(terms.contains)).toMap
    val w = (1 to 10).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))
    val gains = top.sortBy(_._1).map { case (_, id) =>
      (1L << math.min(tf.getOrElse(id, 0), 4)) - 1 }
    val dcg6 = gains.zip(w).map { case (g, wi) => g * wi }.sum
    val idcg6 = gains.sorted.reverse.zip(w).map { case (g, wi) => g * wi }.sum
    assert(math.abs(r.getDouble(1) - dcg6 / 1e6) < 1e-6)
    assert(math.abs(r.getDouble(3) - dcg6.toDouble / idcg6) < 1e-6)
  }

  test("q169 rolling HLL merge equals a from-scratch sketch of the window union") {
    // THE mergeability property: register-wise max over per-day sketches
    // must equal the sketch built directly from the union of those days'
    // users. Recomputed on the driver with the same hash/rho pipeline.
    val got = q("q169_rolling_hll_users")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rows = Tables.t(spark, sf, "events")
      .select(
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = rows.groupBy(_._1)
    val alphaM2 = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
    got.keys.foreach { d =>
      val users = (d - 6 to d).flatMap(byDay.get).flatten.map(_._2).distinct
      val regs = new Array[Long](256)
      users.foreach { u =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hll$u".getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(15)
        val hv = java.lang.Long.parseLong(hex, 16)
        val b = (hv % 256).toInt
        val rest = hv / 256
        val rho = if (rest == 0) 52L else 53L - java.lang.Long.toBinaryString(rest).length
        if (rho > regs(b)) regs(b) = rho
      }
      val s52 = regs.map(r => 1L << (52 - r).toInt).sum
      val est = BigDecimal(alphaM2 / (s52.toDouble / 4503599627370496.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(d) - est) < 1e-9,
        s"day $d: merged ${got(d)} != union-sketch $est")
    }
  }

  test("q170 integrity audit: zero orphans on generated data, counts match") {
    val rows = q("q170_fk_integrity")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 4)
    rows.values.foreach { case (_, orphans) => assert(orphans == 0L) }
    val nLi = Tables.t(spark, sf, "lineitem").count()
    assert(rows("lineitem->orders")._1 == nLi)
    assert(rows("orders->customer")._1 == Tables.t(spark, sf, "orders").count())
  }

  test("built-in approx sketches: bounded error under any partitioning") {
    // the board's exact percentile/distinct paths (q45/q168, q13) have a
    // documented 100 TB escalation to Spark's mergeable sketches
    // (GK approx_percentile, HLL++ approx_count_distinct). Pin the two
    // claims that make that swap safe: error stays inside the sketch's
    // contract, and the answer does not depend on how rows are
    // partitioned (sketch merge, not a single-node pass)
    val e = Tables.t(spark, sf, "events")
      .select(round(col("value") * 100).cast("long").as("c"), col("user_id"))
    val exact = e.selectExpr("percentile(c, 0.5) AS p50",
      "percentile(c, 0.95) AS p95").collect()(0)
    val exactD = e.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    for (parts <- Seq(1, 7)) {
      val ep = e.repartition(parts)
      val a = ep.selectExpr(
        "approx_percentile(c, 0.5, 10000) AS p50",
        "approx_percentile(c, 0.95, 10000) AS p95").collect()(0)
      assert(math.abs(a.getLong(0) - exact.getDouble(0)) <=
        0.01 * exact.getDouble(0) + 1,
        s"p50 off at parts=$parts: ${a.getLong(0)} vs ${exact.getDouble(0)}")
      assert(math.abs(a.getLong(1) - exact.getDouble(1)) <=
        0.01 * exact.getDouble(1) + 1,
        s"p95 off at parts=$parts: ${a.getLong(1)} vs ${exact.getDouble(1)}")
      val ad = ep.select(approx_count_distinct(col("user_id")))
        .collect()(0).getLong(0)
      assert(math.abs(ad - exactD).toDouble / exactD <= 0.05,
        s"approx distinct off >5% at parts=$parts: $ad vs $exactD")
    }
  }

  test("q209: built-in session_window equals manual lag-islands, full board") {
    // The registered query caps output at 40 rows for presentation; this
    // pins the FULL result: Spark's session_window (merge-on-overlap)
    // must produce byte-identical (user, start, end, n) sessions to the
    // q52-style gap>30min lag/running-sum formulation over every user at
    // sf0.001 — the two definitions of a session are equivalent, and the
    // built-in's end = last_event + gap convention is reproduced exactly.
    import org.apache.spark.sql.expressions.Window
    val e = graft.Tables.t(spark, sf, "events")
    val built = e
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("st"),
        col("session_window.end").as("en"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).sortBy(t => (t._1, t._2.getTime))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val manual = e
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull ||
          col("us") - col("prev") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts")).as("st"),
        (max(col("us")) + 1800L * 1000000L).as("en_us"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("st"),
        expr("timestamp_micros(en_us)").as("en"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).sortBy(t => (t._1, t._2.getTime))
    assert(built.length == manual.length,
      s"session counts differ: ${built.length} vs ${manual.length}")
    assert(built.toSeq == manual.toSeq,
      "session_window and lag-islands disagree on some session")
  }

  test("q214 Kaplan–Meier matches a driver-side product-limit recompute") {
    val rows = q("q214_survival_km")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // reference: straight product-limit over per-user (t, died) computed
    // from raw events on the driver
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) DIV 3600000000").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hz = ev.map(_._2).max
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val (fd, ld) = (xs.map(_._2).min, xs.map(_._2).max)
      val died = hz - ld > 24
      (if (died) ld - fd else hz - fd, died)
    }.toSeq
    val n = perUser.size.toLong
    val byT = perUser.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.size.toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = n; var s = 1.0; var zero = false
    val expect = byT.map { case (t, d, cnt) =>
      if (d >= atRisk) zero = true
      if (!zero) s *= (atRisk - d).toDouble / atRisk.toDouble
      val km = if (zero) 0.0 else s
      val row = (t, atRisk, d, cnt - d, km)
      atRisk -= cnt
      row
    }
    assert(rows.length == expect.length, "row count")
    rows.zip(expect).foreach { case ((t, nr, d, c, km), (et, enr, ed, ec, ekm)) =>
      assert((t, nr, d, c) == (et, enr, ed, ec), s"counts at t=$t")
      assert(math.abs(km - ekm) < 1e-5, s"km at t=$t: $km vs $ekm")
    }
    // product-limit shape: non-increasing, starts ≤ 1
    rows.toSeq.sliding(2).filter(_.size == 2).foreach { w =>
      assert(w(1)._5 <= w(0)._5 + 1e-12, s"km not monotone at t=${w(1)._1}") }
    assert(rows.head._2 == n, "first risk set must be the full cohort")
  }

  test("q215 interval union equals a brute-force merge per user") {
    val rows = q("q215_interval_union")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val iv = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) +
          greatest(round(col("value") * 100).cast("long"), lit(0L)) *
            lit(600000L)).as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = iv.groupBy(_._1)
    rows.foreach { case (u, nIv, blocks, covered, span) =>
      val xs = byUser(u).map(t => (t._2, t._3)).sortBy(identity)
      assert(nIv == xs.length.toLong, s"user $u n_iv")
      // classic merge sweep
      var (cov, blk) = (0L, 0L)
      var curS = Long.MinValue; var curE = Long.MinValue
      xs.foreach { case (s0, e0) =>
        if (curE == Long.MinValue || s0 > curE) {
          if (curE != Long.MinValue) cov += curE - curS
          curS = s0; curE = math.max(s0, e0); blk += 1
        } else curE = math.max(curE, e0)
      }
      if (curE != Long.MinValue) cov += curE - curS
      assert(blocks == blk, s"user $u blocks")
      assert(covered == cov, s"user $u covered_us")
      assert(span == xs.map(_._2).max - xs.map(_._1).min, s"user $u span")
      assert(covered <= span, s"user $u union exceeds span")
    }
  }

  test("q218 A-ES sample equals the u^(1/w) formulation recomputed driver-side") {
    // ln(u)/w ranking (shipped) and u^(1/w) ranking (the paper's key) are
    // monotone-equivalent; an independent MessageDigest-based recompute
    // must select the same documents in the same order per language
    import java.security.MessageDigest
    val rows = q("q218_weighted_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docsL = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val md = MessageDigest.getInstance("MD5")
    def u52(id: Long): Long = {
      val hex = md.digest(s"es$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16) + 1L
    }
    val expect = docsL.groupBy(_._2).toSeq.flatMap { case (lang, xs) =>
      xs.map { case (id, _, w) =>
        (lang, id, math.pow(u52(id).toDouble / 4503599627370496.0,
          1.0 / w.toDouble))
      }.sortBy { case (_, id, k) => (-k, id) }.take(10).zipWithIndex
        .map { case ((l, id, _), i) => (l, i.toLong + 1L, id) }
    }.toSet
    assert(rows.toSet == expect, "A-ES selection/order mismatch")
  }

  test("q221 Mann–Kendall S/var/slope match a brute-force driver recompute") {
    val rows = q("q221_trend_mannkendall")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))
    val daily = Tables.t(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    rows.foreach { case (et, nDays, sStat, var18, z, slope, trend) =>
      val xs = byType(et).map(t => (t._2, t._3)).sortBy(_._1)
      assert(nDays == xs.length.toLong)
      val pairs = for (i <- xs.indices; j <- i + 1 until xs.length)
        yield (xs(i), xs(j))
      val sRef = pairs.map { case ((_, v1), (_, v2)) =>
        java.lang.Long.signum(v2 - v1).toLong }.sum
      assert(sStat == sRef, s"$et S")
      val n = xs.length.toLong
      val tieRef = xs.groupBy(_._2).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(var18 == n * (n - 1) * (2 * n + 5) - tieRef, s"$et var18")
      val zRef =
        (if (sRef > 0) sRef - 1.0 else if (sRef < 0) sRef + 1.0 else 0.0) /
          math.sqrt(var18.toDouble / 18.0)
      assert(math.abs(z - zRef) < 1e-6, s"$et z")
      val slopes = pairs.map { case ((d1, v1), (d2, v2)) =>
        (v2 - v1).toDouble / (d2 - d1).toDouble }.sorted
      val m = slopes.length
      val medRef = if (m % 2 == 1) slopes(m / 2)
        else (slopes(m / 2 - 1) + slopes(m / 2)) / 2.0
      assert(math.abs(slope - medRef / 100.0) < 1e-6, s"$et sen slope")
      val expTrend = if (math.abs(zRef) > 1.96)
        (if (sRef > 0) "increasing" else "decreasing") else "no_trend"
      assert(trend == expTrend, s"$et trend label")
    }
  }

  test("q222 value-domain Gini equals the textbook sorted-rank formula") {
    val rows = q("q222_gini_spend")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val spend = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val bySeg = spend.groupBy(_._1)
    rows.foreach { case (seg, n, tot, gini) =>
      val xs = bySeg(seg).map(_._2).sorted
      assert(n == xs.length.toLong && tot == xs.sum, s"$seg mass")
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      val gRef = (2.0 * six - (n + 1.0) * tot) / (n.toDouble * tot)
      assert(math.abs(gini - gRef) < 1e-6, s"$seg gini $gini vs $gRef")
      assert(gini >= 0.0 && gini < 1.0, s"$seg gini range")
    }
  }

  test("q243 AP matches a sklearn-style step recompute; base-rate sanity") {
    import org.apache.spark.sql.functions.col
    val Array(row) = SparkEntry.queries("q243_average_precision")(spark, sf)
      .collect()
    val (ap, nPos, nNeg) = (row.getDouble(0), row.getLong(1), row.getLong(2))
    val ev = Tables.t(spark, sf, "events")
      .select((col("event_type") === "purchase").cast("long"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(nPos == ev.count(_._1 == 1L) && nNeg == ev.count(_._1 == 0L))
    // step AP over distinct thresholds descending, ties grouped
    val grid = ev.groupBy(_._2).map { case (s0, xs) =>
      (s0, xs.count(_._1 == 1L).toLong, xs.count(_._1 == 0L).toLong) }
      .toSeq.sortBy(-_._1)
    var tp = 0L; var fp = 0L; var sum = 0.0
    grid.foreach { case (_, np, nn) =>
      tp += np; fp += nn
      if (np > 0)
        sum += (np.toDouble / nPos.toDouble) *
          (tp.toDouble / (tp + fp).toDouble)
    }
    assert(math.abs(ap - sum) < 1e-6, s"ap=$ap vs step recompute $sum")
    // uncorrelated synthetic scores: AP should sit near the base rate
    val base = nPos.toDouble / (nPos + nNeg).toDouble
    assert(math.abs(ap - base) < 0.1, s"ap=$ap vs base rate $base")
  }

  test("q242 Spearman: grid ranks equal textbook tie-averaged ranks") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q242_spearman_rank")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_type"),
        org.apache.spark.sql.functions.expr(
          "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)"),
        org.apache.spark.sql.functions.round(col("value") * 100)
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // textbook: sort, assign average rank to tied runs, Pearson of ranks
    def avgRanks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1) }
      sorted.groupBy(_._1).view
        .mapValues(g => g.map(_._2).sum.toDouble / g.size).toMap
    }
    rows.foreach { case (t, n, rho) =>
      val es = ev.filter(_._1 == t)
      assert(n == es.size.toLong)
      val rx = avgRanks(es.map(_._2)); val ry = avgRanks(es.map(_._3))
      val prs = es.map(e => (rx(e._2), ry(e._3)))
      val nn = prs.size.toDouble
      val mx = prs.map(_._1).sum / nn; val my = prs.map(_._2).sum / nn
      val cov = prs.map(p => (p._1 - mx) * (p._2 - my)).sum
      val vx = prs.map(p => (p._1 - mx) * (p._1 - mx)).sum
      val vy = prs.map(p => (p._2 - my) * (p._2 - my)).sum
      val expect = cov / math.sqrt(vx * vy)
      assert(math.abs(rho - expect) < 1e-9, s"$t rho=$rho vs $expect")
      assert(math.abs(rho) < 0.5, s"$t sane range on synthetic data")
    }
  }

  test("q241 CUPED: theta and adjusted means recompute from raw user sums") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q241_cuped_adjustment")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == 2)
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("value"))
      .collect().map { r =>
        val day = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(2024, 1, 1),
          r.getAs[java.sql.Timestamp](2).toLocalDateTime.toLocalDate)
        val cents = if (r.getString(1) == "purchase")
          math.round(r.getDouble(3) * 100) else 0L
        (r.getLong(0), day, cents)
      }
    val users = ev.groupBy(_._1).map { case (uid, xs) =>
      (uid % 2, xs.filter(_._2 < 15).map(_._3).sum,
        xs.filter(_._2 >= 15).map(_._3).sum) }.toSeq
    val nn = users.size.toLong
    val tx = users.map(_._2).sum; val ty = users.map(_._3).sum
    val txx = users.map(u => u._2 * u._2).sum
    val txy = users.map(u => u._2 * u._3).sum
    val theta = (nn * txy - tx * ty).toDouble / (nn * txx - tx * tx).toDouble
    rows.foreach { case (arm, n, th, meanY, meanYAdj, varY, varCuped) =>
      assert(th == theta, s"arm $arm theta")
      val as = users.filter(_._1 == arm)
      assert(n == as.size.toLong, s"arm $arm n")
      val sy = as.map(_._3).sum; val sx = as.map(_._2).sum
      assert(meanY == sy.toDouble / n.toDouble, s"arm $arm mean_y")
      val expectAdj = meanY - theta *
        (sx.toDouble / n.toDouble - tx.toDouble / nn.toDouble)
      assert(meanYAdj == expectAdj, s"arm $arm adjusted mean")
      assert(varY > 0 && varCuped > 0, s"arm $arm variances positive")
    }
  }

  test("q238 HT: weighted-total estimate recovers tw; count term recomputes") {
    val rows = SparkEntry.queries("q238_ht_estimate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (seg, nTrue, tw, nSample, htN, htCents) =>
      assert(nSample == 5L, s"$seg draws")
      // HT on the weight variable itself: Σ wt·(1/π) ≈ 5·stride, within
      // the 1e-6 quantization grid of 5 clamped terms
      val stride = tw / 5
      assert(math.abs(htCents - 5.0 * stride) <= 5.0 * tw * 1e-6 + 5,
        s"$seg ht_cents=$htCents vs 5·stride=${5L * stride}")
      assert(htN > 0 && htN < 10.0 * nTrue, s"$seg ht_n sane")
    }
    // cross-check 1/π terms against the q148 sample directly
    val smp = SparkEntry.queries("q148_pps_systematic_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    val tws = rows.map(r => r._1 -> r._3).toMap
    val expect = smp.groupBy(_._1).map { case (seg, xs) =>
      seg -> xs.map { case (_, wt) =>
        math.max(1000000L, (1000000L * (tws(seg) / 5)) / wt) }.sum }
    rows.foreach { case (seg, _, _, _, htN, _) =>
      assert(htN == expect(seg).toDouble / 1e6, s"$seg ht_n exact") }
  }

  test("q240 overlap join: bucketization equals a brute-force theta sweep") {
    import org.apache.spark.sql.functions.col
    // sf0.001 has no >= 2-event minute anywhere, so this one runs on
    // sf0.01 where the padded intervals genuinely overlap (24 pairs)
    val d01 = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q240_interval_overlap_join")(spark, d01)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got.nonEmpty, "fixture must produce overlaps")
    // definition recompute: burst minutes -> padded merge -> theta sweep
    val mins = Tables.t(spark, d01, "events")
      .select(col("event_type"),
        org.apache.spark.sql.functions.expr(
          "unix_micros(ts) DIV 60000000").as("mn"))
      .groupBy(col("event_type"), col("mn")).count()
      .filter(col("count") >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ivs = mins.groupBy(_._1).flatMap { case (t, xs) =>
      val pads = xs.map(_._2).sorted.map(m => (m - 15L, m + 16L))
      pads.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((s0, e0) :: rest), (ps, pe)) =>
          if (ps <= e0) (s0, math.max(e0, pe)) :: rest
          else (ps, pe) :: acc
        case (Nil, p) => List(p)
      }.reverse.map { case (s0, e0) => (t, s0, e0) }
    }.toSeq
    val want = (for {
      a <- ivs; b <- ivs
      if a._1 < b._1 && a._2 < b._3 && b._2 < a._3
    } yield (a._1, b._1, a._2, a._3, b._2, b._3,
      math.min(a._3, b._3) - math.max(a._2, b._2))).toSet
    assert(got == want, "bucketized join must equal the theta definition")
  }

  test("q235 MAD: grid-selected medians equal driver-side sorted selection") {
    import org.apache.spark.sql.functions.{col, round => rnd}
    val got = SparkEntry.queries("q235_mad_outliers")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val byType = Tables.t(spark, sf, "events")
      .select(col("event_type"), rnd(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def lowerMedian(xs: Seq[Long]): Long = xs(((xs.size + 1) / 2) - 1)
    for ((t, xs) <- byType) {
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)).sorted)
      val nOut = xs.count(x => math.abs(x - med) * 10000L > 51891L * mad)
      assert(got(t) == ((xs.size.toLong, med, mad, nOut.toLong)),
        s"type $t: expected (n=${xs.size}, med=$med, mad=$mad, out=$nOut)")
      assert(nOut > 0, s"fixture must flag outliers for $t")
    }
  }

  test("q239 kappa: contingency recomputes; kappa is the exact ratio") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q239_cohens_kappa")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val ds = Tables.t(spark, sf, "documents")
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows.foreach { case (lang, n, a, b, c, d0, kappa) =>
      val ts = ds.filter(_._1 == lang).map(_._2)
      val cells = ts.map { t =>
        (t.split(" ", -1).length >= 50, t.length >= 280) }
      assert(a == cells.count(x => x._1 && x._2).toLong, s"$lang a")
      assert(b == cells.count(x => x._1 && !x._2).toLong, s"$lang b")
      assert(c == cells.count(x => !x._1 && x._2).toLong, s"$lang c")
      assert(d0 == cells.count(x => !x._1 && !x._2).toLong, s"$lang d")
      assert(n == ts.length.toLong, s"$lang n")
      val peMass = (a + b) * (a + c) + (c + d0) * (b + d0)
      val expect = (n * (a + d0) - peMass).toDouble /
        (n * n - peMass).toDouble
      assert(kappa == expect, s"$lang kappa exact")
      assert(kappa <= 1.0 && kappa > 0.0, s"$lang kappa range")
    }
    assert(rows.exists(_._7 < 1.0),
      "fixture must exercise the chance correction for some lang")
  }

  test("q232 conformal: q̂ selection and coverage recompute; guarantee holds") {
    val rows = q("q232_conformal_interval")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val e = Tables.t(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val d0 = e.map(_._3).min
    val byT = e.groupBy(_._1)
    rows.foreach { case (et, nCal, qhat, nTest, covered, coverage) =>
      val xs = byT(et).map(t => (t._2, t._3 - d0, t._4))
      val train = xs.filter(_._1 % 2 == 0)
      val n = train.length.toDouble
      val (sx, sy) = (train.map(_._2).sum.toDouble,
        train.map(_._3).sum.toDouble)
      val sxx = train.map(t => t._2 * t._2).sum.toDouble
      val sxy = train.map(t => t._2 * t._3).sum.toDouble
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      def resid(x: Long, y: Long): Long =
        math.abs(y - math.round(a + b * x.toDouble))
      val cal = xs.filter(_._1 % 4 == 1).map(t => resid(t._2, t._3)).sorted
      assert(nCal == cal.length.toLong, s"$et n_cal")
      val k = math.min((9 * (cal.length + 1) + 9) / 10, cal.length)
      assert(qhat == cal(k - 1), s"$et qhat selection")
      val test = xs.filter(_._1 % 4 == 3).map(t => resid(t._2, t._3))
      assert(nTest == test.length.toLong && covered ==
        test.count(_ <= qhat).toLong, s"$et coverage counts")
      assert(coverage == covered.toDouble / nTest.toDouble)
      // finite-sample guarantee: coverage ≥ 0.9 − slack for test noise
      assert(coverage > 0.85, s"$et conformal guarantee violated badly")
    }
  }

  test("q229 quantile normalization: exact CDF matching, monotone per source") {
    val rows = q("q229_quantile_normalize")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val scored = Tables.t(spark, sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pooled = scored.map(_._2).groupBy(identity).toSeq
      .map { case (v, xs) => (v, xs.size.toLong) }.sortBy(_._1)
    val nPool = scored.length.toLong
    val pCum = pooled.scanLeft((0L, 0L)) { case ((_, acc), (v, c)) =>
      (v, acc + c) }.drop(1)
    val bySrc = scored.groupBy(_._1)
    rows.groupBy(_._1).foreach { case (src, xs) =>
      val vals = bySrc(src).map(_._2)
      val nS = vals.length.toLong
      var cum = 0L
      val expect = vals.groupBy(identity).toSeq.sortBy(_._1).map {
        case (v, vv) =>
          cum += vv.size
          // exact rational comparison: F_w/N >= F_sv/n_s
          val mapped = pCum.find { case (_, fw) => fw * nS >= cum * nPool }
            .get._1
          (v, vv.size.toLong, mapped)
      }
      val got = xs.sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq
      assert(got == expect.toSeq, s"$src mapping mismatch")
      // monotone: mapped values never decrease as v increases
      got.map(_._3).sliding(2).filter(_.size == 2).foreach { w =>
        assert(w(1) >= w(0), s"$src mapping not monotone") }
    }
  }

  test("q230 PSI matches a driver recompute with reference-learned bins") {
    val rows = q("q230_psi_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
    val base = Tables.t(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byT = base.groupBy(_._1)
    rows.foreach { case (et, nRef, nAct, psi, action) =>
      val ref = byT(et).filter(_._2 < 15).map(_._3)
      val act = byT(et).filter(_._2 >= 15).map(_._3)
      assert(nRef == ref.length.toLong && nAct == act.length.toLong)
      val refByV = ref.groupBy(identity).toSeq
        .map { case (v, xs) => (v, xs.size.toLong) }.sortBy(_._1)
      var f0 = 0L
      val vBin = refByV.map { case (v, c) =>
        val b = 1L + (f0 * 10L) / nRef; f0 += c; (v, b, c) }
      val cRef = vBin.groupBy(_._2).map { case (b, xs) =>
        b -> xs.map(_._3).sum }
      val cAct = act.map { v =>
        vBin.filter(_._1 <= v).lastOption.map(_._2).getOrElse(1L)
      }.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
      val psiRef = cRef.toSeq.map { case (b, cr) =>
        val ca = cAct.getOrElse(b, 0L)
        if (ca == 0) 0L
        else {
          val p = ca.toDouble / nAct.toDouble
          val q0 = cr.toDouble / nRef.toDouble
          math.round((p - q0) * math.log(p / q0) * 1e12)
        }
      }.sum / 1e12
      assert(math.abs(psi - psiRef) < 1e-6, s"$et psi $psi vs $psiRef")
      val expAction = if (psi >= 0.25) "investigate"
        else if (psi >= 0.1) "watch" else "stable"
      assert(action == expAction, s"$et action")
    }
  }

  test("q226 CUSUM changepoint matches a driver-side argmax recompute") {
    val rows = q("q226_cusum_changepoint")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val daily = Tables.t(spark, sf, "events")
      .select(col("event_type"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
          .as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byT = daily.groupBy(_._1)
    rows.foreach { case (et, cpDay, nDays, peak, mb, ma) =>
      val xs = byT(et).map(t => (t._2, t._3)).sortBy(_._1)
      val n = xs.length.toLong
      assert(nDays == n)
      val tot = xs.map(_._2).sum
      var acc = 0L
      val cus = xs.map { case (day, v) => acc += n * v - tot; (day, acc) }
      val (cpRef, peakRef) = cus.maxBy { case (day, c) =>
        (math.abs(c), -day) }
      assert(cpDay == cpRef, s"$et changepoint")
      assert(math.abs(peak -
        math.abs(peakRef).toDouble / (n.toDouble * 100.0)) < 1e-9)
      val before = xs.filter(_._1 <= cpRef).map(_._2)
      val after = xs.filter(_._1 > cpRef).map(_._2)
      assert(mb == before.sum.toDouble / (before.length * 100.0), s"$et mb")
      assert(ma == after.sum.toDouble / (after.length * 100.0), s"$et ma")
    }
  }

  test("q219 Benford: chi2 non-negative, d1 share consistent, masses sum") {
    val rows = q("q219_benford_digits")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ord = Tables.t(spark, sf, "orders")
      .select(col("o_orderpriority"),
        substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("dg"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val byP = ord.groupBy(_._1)
    assert(rows.map(_._1).toSet == byP.keySet, "priority coverage")
    rows.foreach { case (p, n, chi2, shareD1) =>
      assert(n == byP(p).size.toLong, s"$p group size")
      assert(chi2 >= 0.0, s"$p chi2 negative")
      val d1 = byP(p).count(_._2 == 1).toDouble / n.toDouble
      assert(math.abs(shareD1 - d1) < 1e-6, s"$p share_d1")
    }
  }

  test("q244 ANOVA F matches a straight-line recompute; SSB+SSW = SST") {
    val Array(row) = q("q244_anova_oneway")(spark, sf).collect()
    val (n, k, ssb, ssw, f, eta2) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(n == ev.length.toLong && k == ev.map(_._1).distinct.length.toLong)
    val groups = ev.groupBy(_._1).values.map(_.map(_._2))
    val tot = ev.map(_._2)
    def mean(xs: Iterable[Long]) = xs.sum.toDouble / xs.size / 100.0
    val gm = mean(tot)
    val ssbRef = groups.map(g => g.size * math.pow(mean(g) - gm, 2)).sum
    val sswRef = groups.map(g => g.map(c =>
      math.pow(c / 100.0 - mean(g), 2)).sum).sum
    assert(math.abs(ssb - ssbRef) < 1e-3 * math.max(1.0, ssbRef),
      s"ssb=$ssb vs $ssbRef")
    assert(math.abs(ssw - sswRef) < 1e-3 * math.max(1.0, sswRef),
      s"ssw=$ssw vs $sswRef")
    val fRef = (ssbRef / (k - 1)) / (sswRef / (n - k))
    assert(math.abs(f - fRef) < 1e-3 * math.max(1.0, fRef), s"f=$f vs $fRef")
    assert(eta2 >= 0.0 && eta2 <= 1.0)
    // the decomposition identity: SST computed independently
    val sstRef = tot.map(c => math.pow(c / 100.0 - gm, 2)).sum
    assert(math.abs((ssb + ssw) - sstRef) < 1e-3 * math.max(1.0, sstRef),
      "SSB + SSW must equal SST")
  }

  test("q245 Kruskal-Wallis H matches textbook tie-averaged ranks") {
    val Array(row) = q("q245_kruskal_wallis")(spark, sf).collect()
    val (n, k, h, tieC, hc) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(n == ev.length.toLong && k == ev.map(_._1).distinct.length.toLong)
    // textbook tie-averaged ranks over the full sample
    val sorted = ev.map(_._2).sorted
    val rank: Map[Long, Double] = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) =>
        v -> (xs.map(_._2 + 1).sum.toDouble / xs.size) }
    val byG = ev.groupBy(_._1).values
    val nn = n.toDouble
    val hRef = 12.0 / (nn * (nn + 1)) *
      byG.map { g =>
        val r = g.map(x => rank(x._2)).sum
        r * r / g.size
      }.sum - 3.0 * (nn + 1)
    assert(math.abs(h - hRef) < 1e-4 * math.max(1.0, math.abs(hRef)),
      s"h=$h vs $hRef")
    val ties = ev.map(_._2).groupBy(identity).values.map(_.size.toLong)
    val cRef = 1.0 - ties.map(t => t * t * t - t).sum.toDouble /
      (nn * nn * nn - nn)
    assert(math.abs(tieC - cRef) < 1e-6, s"tie_c=$tieC vs $cRef")
    assert(math.abs(hc - h / tieC) < 1e-4, "h_corrected = h / tie_c")
  }

  test("q254 Shapley attribution: brute-force recompute + efficiency axiom") {
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rq(d: Double): Long =
      BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val rows = q("q254_shapley_attribution")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val chans = ev.map(_._2).filter(_ != "purchase").distinct.sorted
    val k = chans.length
    val bit = chans.zipWithIndex.map { case (c, i) => c -> (1L << i) }.toMap
    val byUser = ev.groupBy(_._1)
    val journeys = byUser.values.map { xs =>
      val mask = xs.map(_._2).filter(_ != "purchase").distinct
        .map(bit).sum
      val conv = if (xs.exists(_._2 == "purchase")) 1L else 0L
      (mask, conv)
    }.toSeq
    val vm = journeys.groupBy(_._1).map { case (m, xs) =>
      m -> rq(1e9 * (xs.map(_._2).sum.toDouble / xs.size.toDouble)) }
    def vq(m: Long): Long = vm.getOrElse(m, 0L)
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val phis = chans.map { c =>
      val b = bit(c)
      var num = 0L
      (0L until (1L << k)).foreach { m =>
        if ((m & b) == 0) {
          val sz = java.lang.Long.bitCount(m)
          num += fact(sz) * fact(k - 1 - sz) * (vq(m + b) - vq(m))
        }
      }
      c -> r6(num.toDouble / (fact(k).toDouble * 1e9))
    }.toMap
    assert(rows.map(_._1).toSeq == chans.toSeq)
    rows.foreach { case (c, nu, phi) =>
      assert(nu == byUser.values.count(_.exists(x =>
        x._2 == c)).toLong, s"$c n_users")
      assert(phi == phis(c), s"$c phi=$phi vs ${phis(c)}")
    }
    // efficiency: credits sum to v(grand coalition) - v(empty set)
    val eff = (vq((1L << k) - 1) - vq(0L)).toDouble / 1e9
    val sumPhi = rows.map(_._3).sum
    assert(math.abs(sumPhi - eff) < 1e-4,
      s"sum phi $sumPhi must equal v(full)-v(empty) $eff")
  }

  test("Num.roundZ forces +0.0 on negatives that round to zero (q163 class)") {
    // the r7 red row: a covariance of ≈ −3e-9 rounds to zero, and the
    // zero's SIGN diverges between Spark (BigDecimal, +0.0) and DuckDB
    // (libm, −0.0) under the driver's bytewise hash. roundZ must emit a
    // bitwise +0.0 for every input that rounds to zero — the whole class
    // the r8 board sweep normalized — and must reproduce plain rounding
    // on unambiguous non-zero values (decimal-tie inputs like 1.5e-6 are
    // deliberately absent: their IEEE product can land on either side of
    // the tie, which is exactly why every board query uses roundZ/roundZSql
    // as the SAME expression in both engines rather than mixing forms).
    import spark.implicits._
    val zeros = Seq(-3e-9, -4.9e-7, 4.9e-7, 0.0, -0.0)
    val nonZeros = Seq(-0.5 -> -0.5, 0.00125 -> 0.00125,
      -0.123456 -> -0.123456, 2.000001 -> 2.000001,
      -7.6543219e-1 -> -0.765432)
    val rows = (zeros ++ nonZeros.map(_._1)).toDF("x")
      .select(col("x"), Num.roundZ(col("x"), 6).as("rz"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    zeros.foreach { x =>
      // bitwise +0.0: raw bits must be exactly 0L, never the −0.0
      // pattern (1L << 63) that DuckDB's round leaks into the hash
      assert(java.lang.Double.doubleToRawLongBits(rows(x)) == 0L,
        s"roundZ($x) must be bitwise +0.0, got bits " +
          java.lang.Double.doubleToRawLongBits(rows(x)).toHexString)
    }
    nonZeros.foreach { case (x, want) =>
      assert(java.lang.Double.doubleToRawLongBits(rows(x)) ==
        java.lang.Double.doubleToRawLongBits(want),
        s"roundZ($x)=${rows(x)} must be bitwise $want")
    }
  }

  test("q285 span surgery merges overlapping hits, keeps disjoint spans apart") {
    import spark.implicits._
    // K = 3; eval doc 1 plants grams "a b c" and "x y z" (among others).
    // Train doc 10 hits at positions 1 and 5 - the gap (5 > 1+2) keeps
    // two separate spans 1-3 and 5-7. Train doc 11 hits at 0,1,2,3 -
    // each start within 2 of the previous, so ONE merged span 0-5.
    // Doc 12 is clean and must not appear; the eval doc itself must not
    // appear.
    val d = Seq(
      (1L, "a b c x y z"),
      (10L, "p a b c q x y z r"),
      (11L, "a b c x y z w"),
      (12L, "m n o p q")
    ).toDF("doc_id", "text")
    val out = graft.operators.Pipeline
      .spanDecon(d, col("doc_id") === 1, 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(10L, 11L), "only contaminated train docs")
    assert(out(10L) == ((9L, 2L, 6L, "1-3,5-7", 3.0 / 9.0)),
      "disjoint hits stay two spans")
    assert(out(11L) == ((7L, 1L, 6L, "0-5", 1.0 / 7.0)),
      "chained overlapping hits merge to one span")
  }

  test("q305 isotonic fit: monotone, equals classical stack PAVA, mass-preserving") {
    // the query evaluates PAVA through the closed-form minimax
    // max_{j<=i} min_{k>=i} rate(j..k); the classical algorithm pools
    // adjacent violators with a stack. They are provably equal — pin it.
    def roundZ6(x: Double): Double =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong / 1e6
    val rows = q("q305_isotonic_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // monotone non-decreasing
    rows.sliding(2).foreach {
      case Array((b0, _, _, _, i0), (b1, _, _, _, i1)) =>
        assert(i0 <= i1, s"iso must be non-decreasing at bins $b0->$b1")
      case _ =>
    }
    // classical stack PAVA on the same (n, pos) bins
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    rows.foreach { case (_, n, pos, _, _) =>
      var (cn, cp, cw) = (n, pos, 1)
      while (stack.nonEmpty &&
        stack.last._2.toDouble * cn.toDouble >=
          cp.toDouble * stack.last._1.toDouble) {
        val (pn, pp, pw) = stack.remove(stack.length - 1)
        cn += pn; cp += pp; cw += pw
      }
      stack += ((cn, cp, cw))
    }
    val fit = stack.flatMap { case (cn, cp, cw) =>
      Seq.fill(cw)(cp.toDouble / cn.toDouble)
    }
    assert(fit.length == rows.length)
    rows.zip(fit).foreach { case ((b, _, _, _, iso), f) =>
      assert(iso == roundZ6(f), s"bin $b: minimax vs stack PAVA")
    }
    // weighted-mass preservation: sum n*iso == sum pos (up to round6)
    val lhs = rows.map { case (_, n, _, _, iso) => n.toDouble * iso }.sum
    val rhs = rows.map(_._3).sum.toDouble
    val slack = rows.map(_._2).sum.toDouble * 5e-7
    assert(math.abs(lhs - rhs) <= slack, "PAVA preserves pooled mass")
  }

  test("q315 Theil-Sen slope equals the brute-force pairwise median") {
    def roundZ(x: Double, s: Int): Double = {
      val f = math.pow(10.0, s.toDouble)
      BigDecimal(x * f).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong / f
    }
    // rebuild the exact daily purchase-cents series driver-side
    val g = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
        " AS BIGINT)").as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = for {
      i <- g.indices; j <- (i + 1) until g.length
    } yield ((g(j)._2 - g(i)._2).toDouble / (g(j)._1 - g(i)._1).toDouble,
      g(i)._1, g(j)._1)
    val sorted = slopes.sortBy(s => (s._1, s._2, s._3)).map(_._1)
    val np = sorted.length
    val med = // the query's middle rule: rn*2 ∈ {np, np+1, np+2}
      if (np % 2 == 1) sorted((np - 1) / 2)
      else (sorted(np / 2 - 1) + sorted(np / 2)) / 2.0
    val ols = {
      val n = g.length.toDouble
      val sx = g.map(_._1).sum.toDouble; val sy = g.map(_._2).sum.toDouble
      val sxx = g.map(p => p._1 * p._1).sum.toDouble
      val sxy = g.map(p => p._1 * p._2).sum.toDouble
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val out = q("q315_theil_sen")(spark, sf).collect().head
    assert(out.getLong(0) == g.length, "n_days")
    assert(out.getLong(1) == np.toLong, "n_pairs = C(n,2)")
    assert(out.getDouble(2) == roundZ(med, 4), "Theil-Sen median slope")
    assert(out.getDouble(3) == roundZ(ols, 4), "OLS slope from moments")
  }

  test("q314 Kendall tau-b equals the brute-force pair classification") {
    def roundZ6(x: Double): Double =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong / 1e6
    def series(t: String) = Tables.t(spark, sf, "events")
      .filter(col("event_type") === t)
      .select(expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
        " AS BIGINT)").as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val vx = series("view"); val vy = series("purchase")
    val days = (vx.keySet & vy.keySet).toSeq.sorted
    var (nc, nd, tx, ty, n0) = (0L, 0L, 0L, 0L, 0L)
    for (i <- days.indices; j <- (i + 1) until days.length) {
      val (xi, yi) = (vx(days(i)), vy(days(i)))
      val (xj, yj) = (vx(days(j)), vy(days(j)))
      n0 += 1
      if ((xi < xj && yi < yj) || (xi > xj && yi > yj)) nc += 1
      else if (xi != xj && yi != yj) nd += 1
      if (xi == xj) tx += 1
      if (yi == yj) ty += 1
    }
    val tau = roundZ6((nc - nd).toDouble /
      math.sqrt(((n0 - tx) * (n0 - ty)).toDouble))
    val out = q("q314_kendall_tau")(spark, sf).collect().head
    assert(out.getLong(0) == n0 && out.getLong(1) == nc &&
      out.getLong(2) == nd, "pair classification counts")
    assert(out.getDouble(3) == tau, "tau-b bit-equal")
  }

  test("q311 Bradley-Terry strengths match a driver-side MM recompute") {
    def roundZ6(x: Double): Double =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong / 1e6
    def q9(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong
    val panel = Tables.t(spark, sf, "events")
      .select(col("user_id"),
        expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01')" +
          " AS BIGINT)").as("day"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("user_id"), col("day"), col("event_type"))
      .agg(max(col("c")).as("mx"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2), r.getLong(3)))
    // pairwise matches within (user, day); a<b lexicographic, a wins on >
    val grid = scala.collection.mutable.Map
      .empty[(String, String), (Long, Long)] // (n, winsA)
    panel.groupBy(_._1).values.foreach { xs =>
      val ts = xs.map(x => (x._2, x._3)).sortBy(_._1)
      for (i <- ts.indices; j <- (i + 1) until ts.length) {
        val ((ea, ma), (eb, mb)) = (ts(i), ts(j))
        val (n, w) = grid.getOrElse((ea, eb), (0L, 0L))
        grid((ea, eb)) = (n + 1, w + (if (ma > mb) 1L else 0L))
      }
    }
    val types = grid.toSeq.flatMap { case ((a, b), (n, wa)) =>
      Seq((a, n, wa), (b, n, n - wa))
    }.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.map(_._2).sum, xs.map(_._3).sum)
    }
    val w1 = types.map { case (t, (ni, wi)) =>
      t -> 2.0 * wi.toDouble / ni.toDouble
    }
    val dq = grid.toSeq.flatMap { case ((a, b), (n, _)) =>
      Seq((a, b, n), (b, a, n))
    }.groupBy(_._1).map { case (t, xs) =>
      t -> xs.map { case (_, j, n) => q9(n.toDouble / (w1(t) + w1(j))) }.sum
    }
    val w2 = types.map { case (t, (_, wi)) =>
      t -> wi.toDouble / (dq(t).toDouble / 1e9)
    }
    val sw = w2.values.map(v => q9(v)).sum
    val out = q("q311_bradley_terry")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == types.keySet)
    out.foreach { case (t, (ni, wi, o1, o2, os)) =>
      assert((ni, wi) == types(t), s"$t match/win counts")
      assert(o1 == roundZ6(w1(t)), s"$t w1")
      assert(o2 == roundZ6(w2(t)), s"$t w2")
      assert(os == roundZ6(w2(t) / (sw.toDouble / 1e9)), s"$t share")
    }
  }

  test("q334 HITS: each side's scores L1-normalize to HitsScale - truncation") {
    // every half-step renormalizes by integer DIV, so Σ score per side
    // must land in (S − n_side, S] — the truncation loses < 1 per node.
    // The TOP-15 cut means we recompute the full sums driver-side from
    // the same plan minus the limit: instead pin on the emitted rows that
    // scores are positive, strictly rank-ordered per kind, and bounded
    // by S (a normalized score can never exceed the whole mass).
    val rows = q("q334_hits_scores")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val S = 1000000000L
    assert(rows.nonEmpty)
    Seq("authority", "hub").foreach { k =>
      val side = rows.filter(_._1 == k).map(_._3)
      assert(side.nonEmpty && side.forall(v => v > 0L && v <= S), s"$k range")
      assert(side.sameElements(side.sorted(Ordering[Long].reverse)),
        s"$k rank order")
      assert(side.sum <= S, s"$k top-15 mass cannot exceed the whole")
    }
  }

  test("q336 SRM: chi2 equals the classic (o-e)^2/e form (driver recompute)") {
    // the query ships the algebraically collapsed (n1−n0)²/(n1+n0);
    // recompute the two-term textbook form per day and demand equality
    // up to the 1e-6 display quantization
    val rows = q("q336_srm_check")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nt = r.getLong(1).toDouble; val nc = r.getLong(2).toDouble
      val e = (nt + nc) / 2.0
      val classic = (nt - e) * (nt - e) / e + (nc - e) * (nc - e) / e
      assert(math.abs(r.getDouble(3) - classic) <= 1e-6,
        s"day ${r.getLong(0)}: ${r.getDouble(3)} vs $classic")
    }
  }

  test("q337 KMV sketch selects exactly the k smallest hashes (recompute)") {
    val row = q("q337_kmv_jaccard")(spark, sf).collect().head
    // recompute the cohort flags + hashes driver-side
    val flags = Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("a"),
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"),
        first(conv(substring(md5(concat(lit("kmv:"),
          col("user_id").cast("string")).cast("binary")), 1, 14), 16, 10)
          .cast("long")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val sketch = flags.sortBy(_._3).take(64)
    val nBoth = sketch.count(t => t._1 == 1L && t._2 == 1L).toLong
    val nInter = flags.count(t => t._1 == 1L && t._2 == 1L).toLong
    assert(row.getLong(1) == sketch.length.toLong, "sketch size")
    assert(row.getLong(2) == nBoth, "both-cohort members in sketch")
    assert(row.getLong(3) == nInter, "exact intersection")
    assert(row.getLong(4) == flags.length.toLong, "exact union")
  }

  test("q338: the selected quantile minimizes pinball loss in-sample") {
    // the defining property of the τ-quantile: no ±1-cent shift of the
    // predictor can strictly lower the (exact integer) pinball loss
    val purch = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 7L).as("seg"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def loss10(xs: Seq[Long], q: Long, tau10: Long): Long =
      xs.map(y => if (y > q) tau10 * (y - q) else (10 - tau10) * (q - y)).sum
    val rows = q("q338_pinball_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getLong(0); val tau10 = math.round(r.getDouble(1) * 10)
      val qc = math.round(r.getDouble(3) * 100)
      val xs = purch.filter(_._1 == seg).map(_._2).toSeq
      val at = loss10(xs, qc, tau10)
      assert(at <= loss10(xs, qc - 1, tau10) && at <= loss10(xs, qc + 1, tau10),
        s"seg $seg tau $tau10: $qc is not the in-sample minimizer")
      assert(math.abs(r.getDouble(4) - at.toDouble / (xs.length * 1000.0))
        <= 1e-6, s"seg $seg tau $tau10 loss value")
    }
  }

  test("q339: settlement is a business day, after the trade, within 3 days") {
    val rows = q("q339_business_day_asof")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sd = r.getLong(0); val first = r.getLong(4)
      assert(((sd % 7) + 7) % 7 <= 4, s"settle day $sd is a weekend")
      assert(sd > first && sd - first <= 3,
        s"settle $sd vs first trade $first: not the NEXT business day")
    }
  }

  test("q342: information identities hold up to quantization") {
    // 0 ≤ MI ≤ min(H_lang, H_source); NMI ∈ [0, 1] — each side of every
    // inequality is a 1e-9-quantized sum over ≤ 100 cells, so slack 1e-6
    val r = q("q342_mutual_information")(spark, sf).collect().head
    val (mi, hl, hs) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mi >= -1e-6, "MI must be non-negative")
    assert(mi <= math.min(hl, hs) + 1e-6, "MI cannot exceed min entropy")
    assert(hl > 0 && hs > 0, "testdata has multiple langs and sources")
    val nmi = r.getDouble(4)
    assert(nmi >= -1e-6 && nmi <= 1 + 1e-6, "NMI in [0,1]")
  }

  test("q345 LTV triangle: cumulative revenue is non-decreasing per cohort") {
    val rows = q("q345_cohort_ltv_triangle")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cw, xs) =>
      val byOff = xs.sortBy(_._2)
      assert(byOff.zip(byOff.tail).forall { case (a, b) => b._3 >= a._3 },
        s"cohort $cw: cum_rev must be non-decreasing across offsets")
      byOff.foreach { x =>
        assert(x._4 >= 0.0, s"cohort $cw offset ${x._2}: LTV negative") }
    }
  }

  test("q349 peaks: every reported day beats neighbors and its lift > 1.05") {
    val rows = q("q349_series_peaks")(spark, sf).collect()
    rows.foreach { r =>
      val (sp, prev, next) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(sp >= prev && sp > next,
        s"day ${r.getLong(0)} is not a local maximum")
      assert(r.getDouble(4) > 1.05 - 1e-4,
        s"day ${r.getLong(0)}: lift ${r.getDouble(4)} under the guard")
    }
  }

  test("q324 PVM bridge reconciles: vol+price effects == revenue delta") {
    // the no-residual algebra p0(q1-q0) + (p1-p0)q1 = r1-r0, up to the
    // two 1e-3-dollar term quantizations plus the 2-decimal display
    val rows = q("q324_pvm_bridge")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val delta = r.getLong(3).toDouble / 100.0
      val vol = r.getDouble(4); val price = r.getDouble(5)
      assert(math.abs(vol + price - delta) <= 0.021,
        s"brand ${r.getString(0)}: $vol + $price vs $delta")
    }
  }

  test("q351: modularity is non-decreasing across merge rounds and " +
      "strictly improves from singletons") {
    // The design theorem behind q351 (mutual-best merges form a matching,
    // each merge adds exactly its positive elected gain), checked on the
    // live graph: Q·(2m)² after r = 0..4 rounds must be non-decreasing,
    // and round 1 must strictly improve on the all-singletons start
    // (this graph has positive-gain neighbor pairs by construction —
    // every node keeps its 3 strongest-lift neighbors). Everything is
    // deterministic, so this is a stable pin, not a flaky sample.
    val qs = (0 to 4).map { r =>
      val (lab, adj, deg) = operators.Analytics.modularityMerge(spark, sf, r)
      operators.Analytics.modularityNum(lab, adj, deg)
    }
    (0 until 4).foreach { r =>
      assert(qs(r) <= qs(r + 1),
        s"round ${r + 1} decreased modularity: ${qs.toList}")
    }
    assert(qs(0) < qs(1), s"round 1 must strictly improve: ${qs.toList}")
  }

  test("q353: idle days are real zeros on the forecast grid (q274's lesson)") {
    // Craft a daily series of $1.00 purchases on days 0..11 with day 5
    // MISSING entirely. Densification must insert day 5 as cents = 0 —
    // otherwise every lag past the gap silently shifts one day and the
    // trailing-week error mass changes. With the zero-fill: eval days are
    // 7..11 (full 7-day history), naive-1 and snaive-7 errors are all 0
    // (the gap sits outside both lag targets), the trailing-week sum is
    // 600 on every eval day (six $1 days + the $0 gap rolling through),
    // so mean7's MAE = 5·|700−600| / (5·700) = 1/7 → 0.1429, and s7 = 0
    // makes every MASE NULL (the guarded-division contract).
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mase_spec").toString
    val s2 = spark
    import s2.implicits._
    (0 to 11).filter(_ != 5).map { day =>
      (day.toLong, f"2024-01-${day + 1}%02d 10:00:00.000000",
        1L, "purchase", 1.0, "{}")
    }.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = q("q353_forecast_mase")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toList
    assert(rows == List(
      ("mean7", 5L, 0.1429, null),
      ("naive1", 5L, 0.0, null),
      ("snaive7", 5L, 0.0, null)),
      s"gapped-series contract violated: $rows")
  }

  test("q362: Hamilton apportionment is exact — sum = B, every cell within " +
      "one token of its real share") {
    // The two theorems the hash-compare exercises only at one data point:
    // (1) Σ alloc_tokens == B exactly (largest-remainder distributes the
    // integer shortfall completely); (2) quota ≤ alloc ≤ quota + 1 and
    // |alloc − mass·B/T| < 1 for every cell (no cell is ever off by a
    // full token from exact proportionality).
    val B = 1000000L
    val rows = q("q362_token_apportionment")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(5)))
    val total = rows.map(_._1).sum
    assert(rows.map(_._3).sum == B, "allocation must sum to the budget")
    rows.foreach { case (mass, quota, alloc) =>
      assert(alloc == quota || alloc == quota + 1)
      val exact = mass.toDouble * B.toDouble / total.toDouble
      assert(math.abs(alloc - exact) < 1.0,
        s"cell off by a full token: mass=$mass alloc=$alloc exact=$exact")
    }
  }

  test("q361: shard token spread is bounded by one max-size document") {
    // The LPT-dealing guarantee the balance report relies on: dealing by
    // descending size rank keeps max(shard) − min(shard) within the
    // largest single document's token count.
    import org.apache.spark.sql.functions._
    val loads = q("q361_balanced_shards")(spark, sf).collect()
      .map(_.getLong(2))
    val maxDoc = Tables.t(spark, sf, "documents")
      .agg(max(size(split(col("text"), " ")).cast("long")))
      .first().getLong(0)
    assert(loads.max - loads.min <= maxDoc,
      s"spread ${loads.max - loads.min} exceeds max doc $maxDoc")
  }

  /** q363/q368 shared: straight-line rebuild of the 3-NN strongest-lift
    * brand graph (directed, with co-occurrence weights). */
  private def rebuildKnnEdges(): Seq[(Long, Long, Long)] = {
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = Tables.t(spark, sf, "part")
      .select(col("p_partkey"), expr("CAST(substring(p_brand, 7) AS BIGINT)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baskets = li.map { case (ok, pk) => (ok, brandOf(pk)) }.distinct
    val nn = baskets.map(_._1).distinct.length.toLong
    val ni = baskets.groupBy(_._2).map { case (i, xs) => i -> xs.length.toLong }
    val nab = baskets.groupBy(_._1).values.toSeq.flatMap { b =>
      val items = b.map(_._2).distinct.toSeq
      for (a <- items; c <- items if a != c) yield (a, c)
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    nab.keys.map(_._1).toSeq.distinct.flatMap { a =>
      nab.filter(_._1._1 == a).toSeq
        .map { case ((_, b), w) =>
          (b, w, (w * nn).toDouble / (ni(a) * ni(b)).toDouble) }
        .sortBy { case (b, _, lift) => (-lift, b) }
        .take(3).map { case (b, w, _) => (a, b, w) }
    }
  }

  test("q363 Luby MIS: full driver recompute + independence/maximality") {
    // Rebuild the 3-NN lift graph and replay all Luby rounds straight-line
    // driver-side (the q115 discipline), then demand the operator's
    // (status, round) labeling matches node-for-node; finish with the two
    // theorems the hash can't name: no edge inside the MIS, and — when no
    // node is left 'open' — every non-MIS node dominated by a MIS neighbor.
    val edges = rebuildKnnEdges().map { case (a, b, _) => (a, b) }
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (u, v) => u != v }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (x, xs) => x -> xs.map(_._2).toSet }
    def pri(n: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mis:$n".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 14), 16)
    }
    var rem = adj.keySet
    val expect = scala.collection.mutable.Map.empty[Long, (String, Long)]
    for (r <- 1 to 4) {
      val mis = rem.filter(n =>
        (adj(n) & rem).forall(m => pri(n) < pri(m)))
      val dom = rem.diff(mis).filter(n => (adj(n) & rem).exists(mis))
      mis.foreach(n => expect(n) = ("mis", r.toLong))
      dom.foreach(n => expect(n) = ("dominated", r.toLong))
      rem = rem.diff(mis).diff(dom)
    }
    rem.foreach(n => expect(n) = ("open", 0L))
    val got = q("q363_luby_mis")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == expect.toMap, "operator vs straight-line Luby replay")
    val mis = got.filter(_._2._1 == "mis").keySet
    und.foreach { case (u, v) =>
      assert(!(mis(u) && mis(v)), s"edge ($u,$v) inside the MIS")
    }
    if (!got.values.exists(_._1 == "open"))
      got.filter(_._2._1 != "mis").keys.foreach { n =>
        assert(adj(n).exists(mis), s"node $n neither mis nor dominated")
      }
  }

  test("q365 Holt-Winters: straight-line replay of the integer recursion") {
    // replay the whole coupled (l, b, s) recursion driver-side from the
    // raw events and demand the 7 forecasts match bit-for-bit — the
    // q288 divergence class (pre- vs post-round level) cannot hide
    val daily = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr(
        "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT)")
        .as("day"))
      .agg((sum(round(col("value") * 100).cast("long")) * 10000L).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ys = (daily.keys.min to daily.keys.max)
      .map(k => daily.getOrElse(k, 0L))
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val t = ys.length
    assert(t > 7, "the events table must span more than one week")
    var l = rnd(ys.take(7).sum / 7.0)
    var p = ys.take(7).map(_ - l).toArray
    var b = 0L
    var e = 0L
    for (i <- 7 until t) {
      val y = ys(i)
      e += math.abs(y - (l + b + p(0)))
      val l2 = rnd((y - p(0) + l + b) / 2.0)
      val b2 = rnd((l2 - l + b) / 2.0)
      val s2 = rnd((y - l2 + p(0)) / 2.0)
      p = p.drop(1) :+ s2
      l = l2; b = b2
    }
    val got = q("q365_holt_winters")(spark, sf).collect()
    assert(got.length == 7)
    got.foreach { r =>
      val h = r.getLong(0).toInt
      assert(r.getDouble(1) == p(h - 1) / 1e6, s"season h=$h")
      assert(r.getDouble(2) == (l + h * b + p(h - 1)) / 1e6,
        s"forecast h=$h")
      assert(r.getLong(3) == t.toLong)
      assert(r.getDouble(4) ==
        rnd(e.toDouble / ((t - 7).toDouble * 1e6) * 1e6) / 1e6, "mae")
    }
  }

  test("q368 Borůvka forest equals the unique Kruskal forest under the " +
    "shared total order") {
    // with ties broken into a total order, the maximum spanning forest is
    // UNIQUE — so bounded-round distributed Borůvka must reproduce
    // sequential Kruskal edge-for-edge (acyclicity and optimality come
    // free with equality)
    val undW = rebuildKnnEdges()
      .map { case (a, b, w) => ((math.min(a, b), math.max(a, b)), w) }
      .filter { case ((u, v), _) => u != v }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = undW.toSeq
      .map { case ((u, v), w) => (u, v, w) }
      .sortBy { case (u, v, w) => (-w, u, v) }
      .filter { case (u, v, _) =>
        val (ru, rv) = (find(u), find(v))
        if (ru == rv) false else { parent(ru) = rv; true }
      }
      .map { case (u, v, w) => (u, v, w) }.toSet
    val got = q("q368_boruvka_msf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == kruskal,
      s"Borůvka forest != Kruskal MSF (got ${got.size}, " +
        s"want ${kruskal.size})")
  }

  test("q369 BH: rejections are a p-rank prefix, contain Bonferroni, " +
    "and match the integer step-up replay") {
    val rows = q("q369_bh_fdr")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(6), r.getLong(7)))
      .sortBy(_._3)
    val m = rows.length.toLong
    // independent step-up replay from the raw extreme counts
    val kstar = rows.filter { case (_, e, k, _) =>
      10L * m * (e + 1L) <= 201L * k
    }.map(_._3).maxOption.getOrElse(0L)
    rows.foreach { case (seg, _, k, rej) =>
      assert(rej == (if (k <= kstar) 1L else 0L), s"step-up at $seg")
    }
    // rejection set must be a prefix of the p-order (step-up theorem)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 >= b._4, "rejections not a p-rank prefix")
      case _ =>
    }
    // BH dominates Bonferroni: p <= q/m  =>  rejected
    rows.foreach { case (seg, e, _, rej) =>
      if (10L * m * (e + 1L) <= 201L) assert(rej == 1L, s"Bonferroni $seg")
    }
  }

  test("q370 median polish: straight-line replay + additive identity") {
    // replay all eight median-subtract steps driver-side in the same
    // doubled-scale integer arithmetic, check every output row
    // bit-for-bit, and assert the decomposition identity the hash can't
    // name: 256*y = overall + week_e + dow_e + residual for every cell
    val daily = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("dt"))
      .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val d0 = daily.keys.min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val d1 = daily.keys.max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val days = (d0.toEpochDay to d1.toEpochDay).map(java.time.LocalDate.ofEpochDay)
    // duck convention: Sunday = 0
    def dowOf(dt: java.time.LocalDate): Long = dt.getDayOfWeek.getValue % 7
    var cells = days.map(dt => ((dt.toEpochDay - d0.toEpochDay) / 7,
      dowOf(dt)) -> daily.getOrElse(dt, 0L)).toMap
    val orig = cells
    var wE = cells.keys.map(_._1).toSeq.distinct.map(_ -> 0L).toMap
    var dE = cells.keys.map(_._2).toSeq.distinct.map(_ -> 0L).toMap
    var t = 0L
    def med2(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s(((s.length + 1) / 2) - 1) + s(((s.length + 2) / 2) - 1)
    }
    for (_ <- 1 to 2) {
      val rm = cells.groupBy(_._1._1).map { case (w, m) => w -> med2(m.values.toSeq) }
      cells = cells.map { case ((w, dd), v) => ((w, dd), 2 * v - rm(w)) }
      wE = wE.map { case (w, e) => w -> (2 * e + rm(w)) }
      dE = dE.map { case (dd, e) => dd -> 2 * e }; t *= 2
      val wm = med2(wE.values.toSeq)
      t = 2 * t + wm
      wE = wE.map { case (w, e) => w -> (2 * e - wm) }
      cells = cells.map { case (k, v) => k -> 2 * v }
      dE = dE.map { case (dd, e) => dd -> 2 * e }
      val cm = cells.groupBy(_._1._2).map { case (dd, m) => dd -> med2(m.values.toSeq) }
      cells = cells.map { case ((w, dd), v) => ((w, dd), 2 * v - cm(dd)) }
      dE = dE.map { case (dd, e) => dd -> (2 * e + cm(dd)) }
      wE = wE.map { case (w, e) => w -> 2 * e }; t *= 2
      val dm = med2(dE.values.toSeq)
      t = 2 * t + dm
      dE = dE.map { case (dd, e) => dd -> (2 * e - dm) }
      cells = cells.map { case (k, v) => k -> 2 * v }
      wE = wE.map { case (w, e) => w -> 2 * e }
    }
    // additive identity at the common scale 2^8
    orig.foreach { case (k, y) =>
      assert(256L * y == t + wE(k._1) + dE(k._2) + cells(k),
        s"identity fails at $k")
    }
    val mad = med2(cells.values.map(math.abs).toSeq)
    val got = q("q370_median_polish")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got(("overall", -1L)) == t.toDouble / 25600.0)
    assert(got(("resid_mad", -1L)) == mad.toDouble / 51200.0)
    wE.foreach { case (w, e) =>
      assert(got(("week", w)) == e.toDouble / 25600.0, s"week $w") }
    dE.foreach { case (dd, e) =>
      assert(got(("dow", dd)) == e.toDouble / 25600.0, s"dow $dd") }
  }

  test("q372 log-rank: straight-line replay of O/E/V and the statistic") {
    val pu = Tables.t(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(expr("min(unix_micros(ts) DIV 3600000000)").as("fd"),
        expr("max(unix_micros(ts) DIV 3600000000)").as("ld"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val hz = pu.map(_._2).max
    val nps = pu.map(_._3).sorted
    val med = nps(((nps.length + 1) / 2) - 1) // exact lower median
    val obs = pu.map { case (fd, ld, np) =>
      val died = if (hz - ld > 24) 1L else 0L
      val t = if (died == 1L) ld - fd else hz - fd
      (t, died, if (np > med) 1L else 0L)
    }
    def rnd9(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ts = obs.filter(_._2 == 1L).map(_._1).distinct.sorted
    var (o1, e1q, vq) = (0L, 0L, 0L)
    ts.foreach { t =>
      val at = obs.filter(_._1 >= t)
      val (n1, n0) = (at.count(_._3 == 1L).toLong,
        at.count(_._3 == 0L).toLong)
      val here = obs.filter(x => x._1 == t && x._2 == 1L)
      val (d1, d0) = (here.count(_._3 == 1L).toLong,
        here.count(_._3 == 0L).toLong)
      val (d, n) = (d1 + d0, n1 + n0)
      o1 += d1
      e1q += rnd9(d.toDouble * n1.toDouble / n.toDouble * 1e9)
      if (n > 1)
        vq += rnd9(d.toDouble * (n1.toDouble / n.toDouble)
          * (n0.toDouble / n.toDouble) * (n - d).toDouble
          / (n - 1).toDouble * 1e9)
    }
    val r = q("q372_logrank_test")(spark, sf).collect().head
    assert(r.getLong(4) == o1, "O1")
    assert(r.getDouble(5) == rnd9(e1q / 1e9 * 1e6) / 1e6, "E1")
    assert(r.getDouble(6) == rnd9(vq / 1e9 * 1e6) / 1e6, "V")
    val z = o1.toDouble - e1q.toDouble / 1e9
    assert(r.getDouble(7) == rnd9(z * z / (vq / 1e9) * 1e6) / 1e6, "chi2")
    assert(r.getLong(8) ==
      (if (z * z / (vq / 1e9) > 3.8414588206941254) 1L else 0L))
  }

  test("q373 Brandes betweenness: straight-line replay from the 3 pivots") {
    // replay BFS sigma counting and the backward dependency accumulation
    // driver-side in the same 1e-9 integer units and demand node-for-node
    // equality (the per-edge rounded division is the cross-engine
    // contract — any reordering or double drift would break it)
    val edges = rebuildKnnEdges().map { case (a, b, _) => (a, b) }
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (u, v) => u != v }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (x, xs) => x -> xs.map(_._2).toSet }
    val nodes = adj.keySet
    val sources = nodes.toSeq.sorted.take(3)
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val bcAcc = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    sources.foreach { s =>
      var dist = Map(s -> 0)
      var sigma = Map(s -> 1L)
      var frontier = Set(s)
      for (l <- 1 to 4) {
        val cand = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        frontier.foreach(u => adj(u).foreach { v =>
          if (!dist.contains(v)) cand(v) += sigma(u)
        })
        frontier = cand.keySet.toSet
        cand.foreach { case (v, sg) =>
          dist += v -> l; sigma += v -> sg
        }
      }
      var dq = dist.keys.map(_ -> 0L).toMap
      for (l <- 4 to 1 by -1) {
        val add = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        dist.filter(_._2 == l).keys.foreach { w =>
          adj(w).foreach { u =>
            if (dist.get(u).contains(l - 1))
              add(u) += rnd(sigma(u).toDouble
                * (1000000000L + dq(w)).toDouble / sigma(w).toDouble)
          }
        }
        dq = dq.map { case (n, v) => n -> (v + add(n)) }
      }
      dq.foreach { case (n, v) => if (n != s) bcAcc(n) += v }
    }
    val got = q("q373_betweenness_brandes")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == nodes, "every node must appear")
    nodes.foreach { n =>
      assert(got(n) == rnd(bcAcc(n) / 1e9 * 1e6) / 1e6, s"node $n")
    }
  }

  test("q366 DSIR: threshold covers >= 25%; the en target is enriched") {
    val rows = q("q366_dsir_selection")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val nAll = rows.map(_._2).sum
    val nSel = rows.map(_._3).sum
    assert(nSel * 4 >= nAll,
      s"top-25% tie-inclusive threshold must cover >= 25% ($nSel/$nAll)")
    val en = rows.find(_._1 == "en").get
    rows.filter(_._1 != "en").foreach { o =>
      assert(en._4 > o._4, s"en sel_rate must dominate ${o._1}")
      assert(en._5 > o._5, s"en mean_w must dominate ${o._1}")
    }
  }
}
