package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver.
  *
  * Each query is fully materialized through the `noop` sink — unlike
  * `count()`, this cannot let Catalyst prune sorts/projections away, so the
  * timing covers the whole physical plan. One small warmup action absorbs
  * JVM/codegen startup so per-query numbers reflect steady state.
  */
object Bench {
  /** 1-minute system load average — recorded at run start and end so a
    * cross-session ratio can be read against the machine state that
    * produced it (two best-of-2 runs of near-identical code measured
    * 1.17× apart in r6; without markers that spread is uninterpretable
    * after the fact). */
  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val load0 = loadAvg
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch the fact table + one shuffle, then exercise the
    // HOF/explode/collect_set/window/array_intersect machinery on a tiny
    // document sample, so JIT/codegen paths are hot before the first
    // measured query (the dedup family is 4× slower on a cold JVM —
    // a single-JVM artifact irrelevant to a long-lived cluster)
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val sample = Tables.t(spark, sfDir, "documents").limit(500)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, size(toks) - 3)")).as("i"))
        .select(col("doc_id"),
          concat(col("toks")(col("i")), lit("|"),
                 col("toks")(col("i") + 1)).as("shingle"))
        .distinct()
      sample
        .groupBy("doc_id").agg(collect_set(col("shingle")).as("a"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number()
          .over(Window.partitionBy(col("doc_id")).orderBy(col("doc_id"))))
        .withColumn("n", size(array_intersect(col("a"), col("a"))))
        .write.format("noop").mode("overwrite").save()
    }

    // a failed query is recorded as -1 (never a near-zero "success" that
    // would silently improve the tracked total) and fails the run.
    //
    // Per-query state hygiene: the dedup/components family pins RDD blocks
    // via localCheckpoint (lineage truncation — see connectedComponents);
    // those blocks are only released when the ContextCleaner GC-detects the
    // dead frames, which over a 263-query single-JVM run lags far behind
    // accumulation. The retained storage squeezes the unified memory pool's
    // execution side and late-board heavy aggregations spill: the r7 driver
    // board read q151 at 22.1 s / q154 at 8.1 s while fresh-JVM alone-probes
    // read 3.55 s / 1.55 s (~6×). A real cluster job would not carry 200
    // unrelated queries' pinned blocks, so the bench explicitly unpersists
    // whatever a query left pinned before timing the next one — measuring
    // each plan, not the harness's leak. SPARK_GRAFT_BENCH_NOCLEAN=1
    // disables this (the StreamCost-style A/B knob that attributed the
    // amplification; see BASELINE.md).
    val keepState = sys.env.contains("SPARK_GRAFT_BENCH_NOCLEAN")
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      finally if (!keepState) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }
    // BEST-OF-2: two full passes, min per query. Single-shot timings made
    // driver rounds incomparable (r4 measured 1.42× r3 on byte-identical
    // code — pure scheduler/page-cache noise); the min of two warm runs
    // tracks the plan, not the machine. Pass order is pass-major (all
    // queries, then all again) so pass 2 never reuses pass 1's JIT-hot
    // loop body cache-resident data beyond what a steady-state cluster
    // would also have.
    // probe knob (unset in driver runs): SPARK_GRAFT_BENCH_ONLY restricts
    // the run to a comma-separated list of query-name prefixes, so a
    // family can be measured ALONE on a fresh JVM through the exact same
    // harness — the controlled A/B that attributes family-level growth
    // (in-bench context cost vs machine load) without a second code path
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSeq)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    val pass1 = ordered.map { case (name, fn) => name -> timeOnce(name, fn) }
    val pass2 = ordered.map { case (name, fn) => name -> timeOnce(name, fn) }
    val results = pass1.zip(pass2).map { case ((name, t1), (_, t2)) =>
      name -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    val failed = results.filter(_._2 < 0).map(_._1)
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // run-environment markers: 1-min load at start/end, total wall time,
    // and BOTH passes per query (the min alone hides the pass spread —
    // a large pass1/pass2 gap on one query is the machine, a consistent
    // pair is the plan)
    val env = f"""{"load_avg_start":$load0%.2f,"load_avg_end":$loadAvg%.2f,""" +
      f""""wall_sec":${(System.nanoTime() - wall0) / 1e9}%.1f,""" +
      s""""cpus":$cpus,"pass1":${jmap(pass1)},"pass2":${jmap(pass2)}}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","env":$env}"""
    println(line)
    // tail-survivable summary AFTER the big line: the driver's log capture
    // keeps only the last ~2000 chars, which truncated the full per-query
    // JSON mid-map in r8 (BENCH_r08.json `parsed: null`) — the gate's own
    // artifact lost the headline total. This short line carries the
    // headline numbers in the same shape, so any tail capture parses.
    // `contaminated` (r11 verdict task 5): machine-readable form of the
    // house env-marker convention — ONE threshold for both artifacts
    // (this summary line and BENCH_SUMMARY.json below); see BASELINE.md
    // for the band evidence behind 2.0.
    val contaminated = load0 >= 2.0
    val summary = f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""n_queries":${results.size},"failed":$failedJson,"sf":"$sfDir",""" +
      f""""load_avg_start":$load0%.2f,"load_avg_end":$loadAvg%.2f,""" +
      s""""contaminated":$contaminated,""" +
      f""""wall_sec":${(System.nanoTime() - wall0) / 1e9}%.1f,"summary":true}"""
    println(summary)
    // also persist the JSON so the result survives driver-log truncation
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.out"),
      line + "\n" + summary + "\n")
    // BENCH_SUMMARY.json (r9 verdict item 3): the harness itself writes the
    // headline artifact — total, counts, per-family seconds, env markers —
    // so NO driver-side capture (BENCH_r09.json was `parsed: null`) can
    // truncate the round's numbers. Committed to the repo by the builder.
    val famSec = results.filter(_._2 >= 0)
      .groupBy { case (n, _) => SparkEntry.families.getOrElse(n, "other") }
      .toSeq.sortBy(_._1)
      .map { case (f, qs2) => f -> qs2.map(_._2).sum }
    val famJson = famSec
      .map { case (f, v) => "\"" + f + "\":" + f"$v%.1f" }
      .mkString("{", ",", "}")
    // full runs only — a SPARK_GRAFT_BENCH_ONLY probe must not overwrite
    // the board's headline artifact
    //
    // a pass started at 1-min load ≥ 2.0 shares the machine with other
    // work and its total is not comparable across rounds (band evidence:
    // r6 measured 1.17× between two best-of-2 runs of near-identical
    // code; the r11 driver headline read 525 s at load 4.88 vs the
    // quiet-pass 418 s). Consumers should discard contaminated totals
    // rather than scale them.
    // r13 verdict item 2: the full per-query map (and both passes) must land
    // in a committed, capture-proof artifact — the driver's 2000-char tail
    // capture cannot hold the 360-query JSON line (PERF_r8..r13 `parsed:
    // null`), so round-over-round comparison needs the map HERE.
    if (only.isEmpty) java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SUMMARY.json"),
      f"""{"total_sec":$total%.1f,"n_queries":${results.size},""" +
        s""""failed":$failedJson,"sf":"$sfDir","families":$famJson,""" +
        f""""load_avg_start":$load0%.2f,"load_avg_end":$loadAvg%.2f,""" +
        s""""contaminated":$contaminated,""" +
        f""""wall_sec":${(System.nanoTime() - wall0) / 1e9}%.1f,""" +
        s""""cpus":$cpus,"queries":${jmap(results)},""" +
        s""""pass1":${jmap(pass1)},"pass2":${jmap(pass2)}}""" + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
