package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The "No Partition Defined for Window operation" WARN floods the test
    // log (thousands of lines — it drowned the r13 driver gate's captured
    // tail; VERDICT r13 item 1). Every such window in the query code sits
    // on a post-aggregation, dictionary- or top-k-sized frame (audited in
    // VERDICT r13 item 4), so the warning carries no signal here.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query plans and executes on sf0.001") {
    // q135 is legitimately empty at sf0.001: only 3 customers lapse after
    // the 1998-06-01 cutoff and none clears the above-average-balance bar.
    // q240 is too: a burst needs >= 2 same-type events in one minute, and
    // 1000 events over 30 days never collide — bursts (and the overlap
    // report) appear from sf0.01 up, where the oracle gate hash-checks it.
    val allowEmpty = Set("q08_anti_join_customers", "q135_lapsed_customers",
      "q240_interval_overlap_join")
    // concurrent sweep (ParSweep): one newSession per task isolates temp
    // views/session confs; assertions become collected failures
    val bad = ParSweep.sweep(spark, SparkEntry.queries.toSeq.sortBy(_._1)) {
      (name, fn, ss) =>
        try {
          val df = fn(ss, sf)
          if (df.columns.isEmpty) Some(s"$name has no columns")
          else {
            val n = df.count()
            if (n == 0 && !allowEmpty(name)) Some(s"$name returned 0 rows")
            else None
          }
        } catch { case e: Throwable =>
          Some(s"$name threw ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(300)}")
        }
    }
    assert(bad.isEmpty, s"queries failed on sf0.001:\n${bad.mkString("\n")}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q01 groups by (returnflag, linestatus)") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val qty = rows.map(_.getAs[Double]("sum_qty"))
    assert(qty.forall(_ > 0))
  }

  test("q20 theta join counts C(5,2) nation pairs per region") {
    val rows = SparkEntry.queries("q20_theta_join")(spark, sf).collect()
    assert(rows.length == 5 && rows.forall(_.getAs[Long]("pairs") == 10L))
  }

  test("q24 fraction is a valid ratio") {
    val r = SparkEntry.queries("q24_metric_scalar")(spark, sf).collect().head
    val f = r.getAs[Double]("frac_high")
    assert(f >= 0.0 && f <= 1.0)
  }

  test("q01 plan pushes the shipdate filter into the parquet scan") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filter in plan:\n$plan")
  }

  test("q25 CSV: schema inference agrees with the declared read") {
    // the reference's dd.read_csv INFERS its schema
    // (system_tests/test_fit_predict.py:26); q25 reads schema-first (the
    // right call at 100 TB — inference is a second full pass over
    // unsplittable gzip). This pins their equivalence: an inferred read
    // of the same staged gzip CSV must produce the identical aggregate,
    // so schema-first is an optimization, not a semantic divergence.
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q25_csv_scan")(spark, sf).collect() // stages the CSV
    val staged = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_csv",
      sf.replaceAll("[^A-Za-z0-9.]", "_"), "events_csv").toString
    val inferred = spark.read
      .option("header", "true").option("inferSchema", "true").csv(staged)
    // inference must land on workable numeric/string types (integral ids
    // may infer as INT where the declared read says BIGINT — values, not
    // physical widths, are the parity that matters)
    val byName = inferred.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("event_type").typeName == "string")
    assert(Set("integer", "long")(byName("event_id").typeName))
    assert(byName("value").typeName == "double")
    val agg = inferred.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Num.sumFixed(col("value"), 2).as("sum_value"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val declared = SparkEntry.queries("q25_csv_scan")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(agg.toSeq == declared.toSeq,
      "inferred-schema read must aggregate bit-identically to the declared read")
  }

  test("q156 max_by compaction equals the row_number-window formulation") {
    // two independent implementations of last-writer-wins must agree —
    // the shipped aggregate form (scales: map-side partial) and the
    // textbook window form (doesn't: full shuffle + per-key sort)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q156_cdc_compaction")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val ref = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) DIV 1000000").as("sec"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_versions",
        count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("n_versions"),
        col("event_id").as("last_lsn"), col("event_type").as("last_type"),
        col("sec").as("last_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == ref.toSeq)
  }

  test("observe: data-quality metrics ride the main pass, no second scan") {
    // The production shape for "count rows/nulls/max watermark while
    // writing 100 TB": df.observe attaches accumulator-backed metrics at
    // a point in the plan, collected DURING the one action — where a
    // naive pipeline runs a second full scan for its QA counters. The
    // metrics observe the pre-filter stream even though the action only
    // materializes the filtered one; values must equal an independent
    // second-pass computation, and the plan must contain the
    // CollectMetrics node over a single scan.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Observation
    val obs = Observation("dq")
    val df = Tables.t(spark, sf, "lineitem")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("n_null_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("price_e2"))
      .filter(col("l_quantity") > 25)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CollectMetrics"), "metrics node expected in the plan")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      "metrics must not add a scan")
    val kept = df.count()
    val m = obs.get
    val second = Tables.t(spark, sf, "lineitem")
      .agg(count(lit(1)), sum(round(col("l_extendedprice") * 100).cast("long")))
      .head()
    assert(m("n_rows") == second.getLong(0), "observed count != second pass")
    assert(m("n_null_qty") == 0L)
    assert(m("price_e2") == second.getLong(1), "observed sum != second pass")
    assert(kept > 0 && kept < second.getLong(0),
      "filter must keep a strict subset while metrics see the full stream")
  }

  /** Driver-side recompute of the r12 sorted-neighborhood candidate
    * pairs (Relational.snPairs): within each (brand, type) block, rows
    * ordered by (name, partkey) pair with their next `w` neighbors. */
  private def snPairsRef[T](rows: Seq[T],
      w: Int = graft.operators.Relational.SnW)(
      block: T => (String, String), name: T => String,
      key: T => Long): Seq[(T, T)] =
    rows.groupBy(block).values.flatMap { xs =>
      val sorted = xs.sortBy(x => (name(x), key(x)))
      for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + 1 + w, sorted.length)
      } yield (sorted(i), sorted(j))
    }.toSeq

  test("SN recall: shipped candidates retain the all-pairs matches (r13)") {
    // r12 verdict task 5: pin the sorted-neighborhood recall as a spec
    // bound, not prose. Truth = the pre-r12 all-pairs-per-block pairs
    // passing each query's own match predicate; shipped = the current
    // candidate generation (name-level two-pass SN for the fuzzy
    // matchers, row-level window population for FS scoring). Measured
    // 1.000 here and at sf0.01/sf0.1 for every query except q249's
    // documented population subsample at sf0.1 (0.64 — BASELINE.md r13).
    val m = graft.tools.SnRecall.measure(spark, sf).toMap
    def recall(q: String): Double = {
      val (t, k, _) = m(q); if (t == 0L) 1.0 else k.toDouble / t
    }
    Seq("q101_fuzzy_name_join", "q141_entity_resolution",
        "q142_jaro_winkler_match", "q216_fs_linkage").foreach { q =>
      assert(recall(q) == 1.0, s"$q recall ${recall(q)}")
    }
    // entity-level agreement must be exact, not just pairwise
    val Some(("entities_kept", ek)) = m("q141_entity_resolution")._3
    assert(ek.matches("""\{"truth":(\d+),"kept":\1\}"""),
      s"entity sets must survive intact: $ek")
  }

  test("q216 FS linkage: pair mass conserved, scores bounded by the weight sums") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q216_fs_linkage")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // independent SN candidate count per brand (r12: sorted-neighborhood
    // pairs, not the pre-r12 all-pairs-per-block square)
    val parts = Tables.t(spark, sf, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val pairsPerBrand = snPairsRef(parts.toSeq)(
      p => (p._3, p._4), _._2, _._1)
      .groupBy(_._1._3).map { case (b, xs) => b -> xs.size.toLong }
    rows.groupBy(_._1).foreach { case (b, xs) =>
      assert(xs.map(_._3).sum == pairsPerBrand.getOrElse(b, 0L),
        s"brand $b: classification must partition the SN candidate pairs")
    }
    // the priors bound every score: full agreement / full disagreement
    val n = Tables.t(spark, sf, "part").count().toDouble
    val sizes = Tables.t(spark, sf, "part").groupBy("p_size").count()
      .collect().map(_.getLong(1))
    val u = sizes.map(c => c.toDouble * (c - 1)).sum / (n * (n - 1))
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val hi = lg2(0.95 / u) + lg2(0.9 / 0.02) + lg2(0.85 / 0.05)
    val lo = lg2(0.05 / (1 - u)) + lg2(0.1 / 0.98) + lg2(0.15 / 0.95)
    rows.foreach { case (b, cls, _, mn, mx) =>
      assert(mn >= lo - 1e-6 && mx <= hi + 1e-6, s"$b/$cls score out of bounds")
      cls match {
        case "link"     => assert(mn >= 8.0)
        case "non_link" => assert(mx < 0.0)
        case "possible" => assert(mn >= 0.0 && mx < 8.0)
      }
    }
    assert(rows.map(_._3).sum > 0, "no candidate pairs at all")
  }

  test("q223 association rules: conf/lift recompute from raw baskets") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q223_assoc_rules")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val baskets = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val itemN = baskets.groupBy(_._2).map { case (b, xs) =>
      b -> xs.length.toLong }
    val pairN = baskets.groupBy(_._1).values.toSeq.flatMap { xs =>
      val items = xs.map(_._2).toSeq
      for (a <- items; b <- items if a != b) yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { case (a, b, nAb, nA, nB, conf, lift) =>
      assert(nAb == pairN((a, b)), s"$a->$b pair count")
      assert(nA == itemN(a) && nB == itemN(b), s"$a->$b item counts")
      assert(nAb * 200 >= nOrders, s"$a->$b below min support")
      assert(math.abs(conf - nAb.toDouble / nA.toDouble) < 1e-6)
      assert(math.abs(lift -
        (nAb * nOrders).toDouble / (nA * nB).toDouble) < 1e-6)
    }
    // top-50 cut is by lift desc: the weakest emitted lift must dominate
    // every qualifying rule left out
    val emitted = rows.map(r => (r._1, r._2)).toSet
    val minLift = rows.map(_._7).min
    pairN.foreach { case ((a, b), nAb) =>
      if (nAb * 200 >= nOrders && !emitted((a, b))) {
        val l = (nAb * nOrders).toDouble / (itemN(a) * itemN(b)).toDouble
        assert(l <= minLift + 1e-9, s"$a->$b lift $l beats emitted min")
      }
    }
  }

  test("q231 target-decoy FDR: masses match independent pair counts, sweep exact") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q231_target_decoy_fdr")(spark, sf)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    // thresholds strictly decreasing; cumulative counts nondecreasing
    rows.map(_._1).sliding(2).filter(_.size == 2).foreach { w =>
      assert(w(1) < w(0), "thresholds must strictly decrease") }
    rows.map(_._2).sliding(2).filter(_.size == 2).foreach { w =>
      assert(w(1) >= w(0), "t_ge must be cumulative") }
    val parts = Tables.t(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    // total targets = SN candidate count (r12)
    val nTargets = snPairsRef(parts.toSeq)(
      p => (p._2, p._3), _._4, _._1).size.toLong
    assert(rows.last._2 == nTargets, "target mass vs SN candidate pairs")
    // total decoys = derived-partner pairs that cross blocks
    val maxk = parts.map(_._1).max
    val byKey = parts.map(p => p._1 -> p).toMap
    val nDecoys = parts.count { case (k, b, t, _) =>
      byKey.get((k + maxk / 2) % maxk + 1)
        .exists(p => p._2 != b || p._3 != t)
    }.toLong
    // the lowest emitted threshold counts decoys AT OR ABOVE the lowest
    // target score, so its d_ge is bounded by (not equal to) the total
    assert(rows.last._3 <= nDecoys, "decoy mass bound")
    rows.foreach { case (_, tGe, dGe, fdr, accept) =>
      val expect = (dGe.toDouble * nTargets.toDouble) /
        (tGe.toDouble * nDecoys.toDouble)
      assert(fdr == expect, "fdr must be the exact ratio")
      assert(accept == (fdr <= 0.05), "accept flag")
    }
  }

  test("q234 SNM pairs equal a brute-force global-sort neighborhood sweep") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q234_sorted_neighborhood")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
      .toSet
    // reference: one driver-side global sort, compare each row to its
    // next 10 neighbors — the definition the two-phase rank must match
    val sorted = Tables.t(spark, sf, "part")
      .select(col("p_partkey"), col("p_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(p => (p._2, p._1))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val want = (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + 10, sorted.length - 1)
      if sorted(i)._2 != sorted(j)._2 &&
        math.abs(sorted(i)._2.length - sorted(j)._2.length) <= 3
      d = lev(sorted(i)._2, sorted(j)._2)
      if d <= 3
    } yield (sorted(i)._1, sorted(j)._1, (j - i).toLong, d.toLong)).toSet
    assert(got == want, "SNM neighborhood must match the definition sweep")
    assert(want.nonEmpty, "fixture must exercise the verify stage")
  }

  test("q237 k-anonymity: lattice monotone, counts recompute, k bar honored") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q237_k_anonymity")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // generalizing can only merge groups: group counts must not increase
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
    // recompute level 1 driver-side
    val n2r = Tables.t(spark, sf, "nation")
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    val cs = Tables.t(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        org.apache.spark.sql.functions.round(col("c_acctbal") * 100)
          .cast("long"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    def band(cents: Long, div: Long): Long = cents / div // JVM / truncates
    val l1 = cs.groupBy(c => (c._1, c._2, band(c._3, 100000L)))
      .values.map(_.size.toLong)
    assert(rows(1)._2 == l1.size.toLong, "L1 group count")
    assert(rows(1)._3 == l1.count(_ < 10).toLong, "L1 violating groups")
    assert(rows(1)._4 == l1.filter(_ < 10).sum, "L1 rows at risk")
    val l2 = cs.groupBy(c => (n2r(c._1), c._2, band(c._3, 100000L)))
      .values.map(_.size.toLong)
    assert(rows(2)._3 == l2.count(_ < 10).toLong, "L2 violating groups")
  }

  test("q224 RFM: scores in 1..5, ties share scores, customer mass conserved") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q224_rfm_segments")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nCust = Tables.t(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._4).sum == nCust, "every customer lands in a segment")
    rows.foreach { case (sr, sf2, sm, n, _, _) =>
      assert(sr >= 1 && sr <= 5 && sf2 >= 1 && sf2 <= 5 &&
        sm >= 1 && sm <= 5, "score out of range")
      assert(n > 0)
    }
    // determinism across runs (value-domain scoring has no arbitrary
    // tie-splitting, unlike ntile)
    val again = SparkEntry.queries("q224_rfm_segments")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == again.toSeq, "segment grid not deterministic")
  }

  test("q249 EM update matches a driver recompute over brute-force blocks") {
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val Array(row) = SparkEntry.queries("q249_linkage_em")(spark, sf).collect()
    val parts = Tables.t(spark, sf, "part").collect().map(r => (
      r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
      r.getInt(4), math.round(r.getDouble(5) * 100)))
    // r12: the candidate population is the SN window, not all pairs
    val pairs = snPairsRef(parts.toSeq)(p => (p._3, p._4), _._2, _._1)
      .map { case (a, b) => (
        if (a._5 == b._5) 1L else 0L,
        if (a._2.split(" ").toSet.intersect(b._2.split(" ").toSet).size
            >= graft.operators.Relational.fsTokMin)
          1L else 0L,
        if (math.abs(a._6 - b._6) <= 200) 1L else 0L)
      }
    val (p0, m0, u0) = (0.05, Seq(0.95, 0.9, 0.85), Seq(0.05, 0.02, 0.05))
    val pat = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var tn = 0L; var tw = 0L; var tu = 0L
    val mw = Array(0L, 0L, 0L); val uw = Array(0L, 0L, 0L)
    pat.foreach { case ((a1, a2, a3), n) =>
      val as = Seq(a1, a2, a3)
      val pm = as.zip(m0).foldLeft(p0) { case (acc, (a, m)) =>
        acc * (if (a == 1L) m else 1.0 - m) }
      val pu = as.zip(u0).foldLeft(1.0 - p0) { case (acc, (a, u)) =>
        acc * (if (a == 1L) u else 1.0 - u) }
      val wq = math.round(1e9 * (pm / (pm + pu)))
      tn += n; tw += n * wq; tu += n * (1000000000L - wq)
      for (j <- 0 until 3) {
        mw(j) += n * wq * as(j); uw(j) += n * (1000000000L - wq) * as(j)
      }
    }
    assert(row.getLong(0) == tn, "pair count")
    assert(row.getDouble(1) == r6(tw.toDouble / (1e9 * tn.toDouble)), "p_new")
    for (j <- 0 until 3) {
      assert(row.getDouble(2 + 2 * j) == r6(mw(j).toDouble / tw.toDouble),
        s"m${j + 1}_new")
      assert(row.getDouble(3 + 2 * j) == r6(uw(j).toDouble / tu.toDouble),
        s"u${j + 1}_new")
      // where agreement occurs at all, it must stay more likely under
      // match than non-match (r13: comparator 2 agrees at fsTokMin = 2 —
      // both tokens of the two-token names shared, i.e. same token set)
      if (mw(j) + uw(j) > 0)
        assert(row.getDouble(2 + 2 * j) > row.getDouble(3 + 2 * j),
          s"comparator ${j + 1}: m must exceed u after one EM round")
    }
  }

  test("q284 t-closeness closed forms: uniform group 0, pure group (S-1)/S") {
    import spark.implicits._
    // 12 rows, 2 segments globally balanced 6/6: group (1,0) holds
    // 2A+2B (its distribution IS the corpus distribution, t = 0
    // exactly), groups (2,0)/(3,0) hold 4A/4B (single-segment in a
    // balanced corpus: t = (S-1)/S = 1/2 exactly). The integer-numerator
    // formulation makes both values exact doubles, so == is legitimate.
    val base = (Seq.fill(2)("A") ++ Seq.fill(2)("B")).map((1L, 0L, _)) ++
      Seq.fill(4)((2L, 0L, "A")) ++ Seq.fill(4)((3L, 0L, "B"))
    val out = graft.operators.Relational
      .tClosenessOf(base.toDF("c_nationkey", "band", "c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getBoolean(5)))
      .toMap
    assert(out(1L) == ((4L, 2L, 0.0, false)), "uniform group: t = 0, l = 2")
    assert(out(2L) == ((4L, 1L, 0.5, true)), "pure-A group: t = 1/2, l = 1")
    assert(out(3L) == ((4L, 1L, 0.5, true)), "pure-B group: t = 1/2, l = 1")
  }
}
