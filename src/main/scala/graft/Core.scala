package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered engine operator: a Spark query over the driver testdata plus
  * (when SQL-expressible) a DuckDB oracle that must hash-match it exactly.
  *
  * Scale discipline (SURVEY §4): every query here is a declarative Dataset
  * plan — Catalyst does pushdown/pruning/join-selection; nothing collects to
  * the driver except the final action taken by the harness.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** FIT-DEPENDENT oracle SQL (r11): queries whose oracle embeds a model
      * trained at run time (the compiled tree scorers, graft.ml.TreeSql)
      * can't carry static SQL — the text exists only after `fn` has fit.
      * Verify evaluates this AFTER running the queries, in the same JVM,
      * so the generator reads the exact fitted model the parquet was
      * scored with (each ML query memoizes its scorer SQL per (name, sf
      * dir) at fit time). Takes precedence over `oracle` when both set. */
    oracleGen: Option[(SparkSession, String) => String] = None)

object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan — columnar, vectorized, filter/column pushdown for free.
    *
    * `events.ts` normalization: the driver has generated this column two
    * ways across rounds — parquet TIMESTAMP(NANOS) (which Spark 4 refuses
    * to read natively; the legacy conf reads it as a nanosecond long that
    * we truncate to µs with integer `DIV` — no double round-trip, since
    * ns-since-2024 exceeds 2^53) and plain TIMESTAMP(MICROS) without UTC
    * adjustment (which Spark 4 reads as TIMESTAMP_NTZ). We dispatch on the
    * OBSERVED read schema, not an assumed writer layout, and normalize both
    * to a µs TimestampType. All graft sessions pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast relabels the
    * same wall-clock instant DuckDB sees when it reads the naive column —
    * every derived epoch/window value agrees across engines either way.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df0 = {
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events")
      df0.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) via legacy conf
          df0.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType => // TIMESTAMP(MICROS), naive
          df0.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df0 // already µs TimestampType
      }
    else df0
  }
}

/** Determinism helpers: make float aggregates ORDER-INDEPENDENT so the same
  * query hashes identically in Spark (partial+final agg over 32 partitions)
  * and in DuckDB (single-threaded or its own parallel order).
  *
  * Trick: the testdata money/quantity columns are fixed-decimal doubles
  * (2 decimals; products of two/three of them are exact at 4/6 decimals).
  * `round(x * 10^s)` recovers the exact integer numerator, which we sum as
  * BIGINT — exact, associative, commutative — then divide back in double.
  * Both engines round the SAME exact integer to double, so results are
  * bit-identical regardless of partitioning. This survives any scale-up:
  * correctness does not depend on the number of partitions.
  */
/** Scale-shape helpers: plan forms that stay safe when a "dimension"
  * grows with the corpus.
  */
object Scale {
  import org.apache.spark.sql.expressions.Window

  /** Range-partitioned two-pass prefix sum — the scale-safe form of
    * `sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`.
    *
    * A global-ORDER window plans as Exchange SinglePartition: sound when
    * its input is a bounded value grid or a top-k survivor set (the house
    * rule), but a cumulative pass over a DIMENSION domain (parts,
    * customers) funnels ~10⁹ rows through one task at true 100 TB TPC-H
    * grain. This helper is the classic two-pass scan instead:
    *
    *   1. `repartitionByRange` on the total order — each partition holds
    *      a contiguous key range, partition index ascending with the
    *      order (RangePartitioner's contract; AQE may only coalesce
    *      ADJACENT shuffle partitions, which preserves both properties);
    *   2. per-partition local prefix sums (parallel, no global exchange);
    *   3. per-partition totals — one row per partition, partition-COUNT-
    *      sized, constant in the data — prefix-summed on the driver-scale
    *      grid and broadcast back as offsets.
    *
    * The result is bit-identical to the single-partition window for any
    * associative exact sum (use integer/cents values): partial sums
    * regroup but never reorder. `order` must be a TOTAL order (include a
    * key tiebreaker) so the cumulative sequence — hence anything derived
    * from it — is deterministic.
    */
  /** Scale-ADAPTIVE spread ahead of a work-multiplying fan-out (explode,
    * per-row sketch loops, compiled-scorer batteries) — the r13 form of
    * the q158 discipline.
    *
    * The trap: AQE sizes stages on shuffle BYTES and a scan on task-count
    * heuristics over FILE bytes, and neither can see a downstream
    * work multiplier — at bench SFs a 0.6 MB single-row-group parquet
    * scan is ONE split, so a ~60×-per-row explode fused with it runs on
    * one core (StageProf: q31's whole map side was a single 1.0 s task).
    * The q158 fix (unconditional `repartition(n, key)`) is wrong for
    * corpus-payload frames at production scale: there the scan arrives
    * pre-split in thousands of partitions and the pinned exchange would
    * shuffle the whole corpus once for nothing. This helper spreads ONLY
    * when the physical scan is under-split (fewer partitions than the
    * session's parallelism) — a no-op exactly where the data is big
    * enough for the scan to parallelize itself, which is what "derive
    * the partitioning from the input, not from a constant tuned for one
    * deployment" means. Row set unchanged; hash-partitioning on `key` is
    * deterministic, so downstream results are byte-identical.
    */
  def spreadForFanout(df: DataFrame, key: Column): DataFrame = {
    val np = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedScanSplits(df) >= np) df
    else df.repartition(np, key)
  }

  /** Estimated split count of the widest file scan feeding `df`, from
    * FileIndex METADATA only — r14 hardening (ADVICE r13 #1): the previous
    * probe read `df.rdd.getNumPartitions`, and under AQE `Dataset.rdd`
    * finalizes the adaptive plan, EXECUTING upstream query stages — at the
    * q369 call site that ran a throwaway broadcast build of customer at
    * DataFrame-construction time, and a shuffle-bearing caller would have
    * executed its whole upstream subplan twice just to read a number.
    *
    * The estimate mirrors Spark's own split sizing
    * (`FilePartition.maxSplitBytes`: bytes-per-core vs openCost vs
    * maxPartitionBytes, open cost charged per file) over the leaf
    * HadoopFsRelations of the ANALYZED plan — pure driver metadata from
    * the cached FileIndex, no job. The decision only needs the right side
    * of one inequality (scan under-split vs the session's parallelism):
    * at bench SFs every table is a handful of MB → estimate ≈ 1–2 « np →
    * spread fires exactly as before; at production scale the same
    * arithmetic that makes the real scan pre-split pushes the estimate
    * past np → no-op, so corpus payloads are never shuffled. A frame with
    * no file-scan leaf (checkpointed RDD root) is treated as pre-split —
    * the conservative choice is to never add an exchange there.
    */
  private def estimatedScanSplits(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val sess = df.sparkSession
    val conf = sess.sessionState.conf
    val rels = df.queryExecution.analyzed.collectLeaves().flatMap {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation => Some(f)
        case _ => None
      }
      case _ => None
    }
    if (rels.isEmpty) Int.MaxValue
    else rels.map { rel =>
      val openCost = conf.filesOpenCostInBytes
      val minParts = conf.filesMinPartitionNum
        .getOrElse(sess.sparkContext.defaultParallelism)
      val totalBytes = rel.location.sizeInBytes
      val nFiles = math.max(1, rel.location.inputFiles.length)
      val totalWithOpen = totalBytes + nFiles.toLong * openCost
      val maxSplitBytes = math.min(conf.filesMaxPartitionBytes,
        math.max(openCost, totalWithOpen / math.max(1, minParts)))
      math.max(1L, (totalWithOpen + maxSplitBytes - 1) / maxSplitBytes)
    }.max.min(Int.MaxValue.toLong).toInt
  }

  def rangePrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String, numParts: Int = 32): DataFrame = {
    // BOTH consumers below (local prefix sums and per-partition totals)
    // reference `parted`, and the `_g_pid` join is only correct if the
    // two branches observe IDENTICAL range-partition assignments.
    // RangePartitioner samples its boundaries from hash-agg output whose
    // order is nondeterministic, so without a pin that identity holds
    // only via ReuseExchange — an optimizer choice, not a contract.
    // localCheckpoint materializes the ranged table once so the shared
    // partitioning is physical fact (same discipline as q334/q343/q344,
    // here load-bearing for CORRECTNESS, not perf).
    val parted = df.repartitionByRange(numParts, order: _*)
      .withColumn("_g_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("_g_pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = parted.withColumn("_g_local", sum(value).over(wLocal))
    val wOff = Window.orderBy(col("_g_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("_g_pid"))
      .agg(sum(value).as("_g_tot"))
      .withColumn("_g_off", coalesce(sum(col("_g_tot")).over(wOff), lit(0L)))
      .select(col("_g_pid"), col("_g_off"))
    local.join(broadcast(offsets), Seq("_g_pid"))
      .withColumn(out, col("_g_local") + col("_g_off"))
      .drop("_g_pid", "_g_local", "_g_off")
  }
}

object ScaleCheckpoint {
  /** localCheckpoint + DROP INHERITED STATS — for iterative SELF-JOIN
    * loops (pointer jumping, transitive squaring).
    *
    * `Dataset.localCheckpoint` truncates the logical plan to a
    * `LogicalRDD`, but that node INHERITS the size statistics of the
    * plan it replaced. A self-join then estimates size(left)·size(right)
    * = size², so the inherited BigInt DOUBLES ITS DIGITS on every
    * iteration; by ~20 squarings the driver spends minutes inside
    * `SizeInBytesOnlyStatsPlanVisitor` multiplying million-bit integers
    * (measured on q368's pointer jumps: 630 bits → 1.3e6 bits across two
    * rounds, 3× planning time per jump — the whole query stalled at any
    * SF before this helper). Linear per-round joins (q35 components,
    * q334 HITS) only ADD digits per round and stay harmless under
    * bounded rounds; squaring loops do not.
    *
    * Re-wrapping the checkpointed RDD through `createDataFrame` builds a
    * fresh `LogicalRDD` with the session-default size estimate, resetting
    * the growth at a one-deserialization-pass cost — fine for the
    * label-grid tables these loops iterate on. (The default estimate also
    * disables auto-broadcast of the wrapped side; the grid joins here
    * never rely on it.)
    */
  def apply(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }
}

object Num {
  private def pow10(scale: Int): Double = math.pow(10.0, scale.toDouble)

  /** Exact sum of a fixed-decimal(double) expression with `scale` decimals. */
  def sumFixed(c: Column, scale: Int): Column = {
    val f = pow10(scale)
    (sum(round(c * lit(f)).cast("long")).cast("double")) / lit(f)
  }

  /** SQL mirror of [[sumFixed]] for the DuckDB oracle. */
  def sumFixedSql(expr: String, scale: Int): String = {
    val f = s"1e$scale"
    s"CAST(sum(CAST(round(($expr) * $f) AS BIGINT)) AS DOUBLE) / $f"
  }

  /** Exact average of a fixed-decimal(double) expression. */
  def avgFixed(c: Column, scale: Int): Column = {
    val f = pow10(scale)
    sum(round(c * lit(f)).cast("long")).cast("double") /
      (lit(f) * count(c).cast("double"))
  }

  /** SQL mirror of [[avgFixed]]. */
  def avgFixedSql(expr: String, scale: Int): String = {
    val f = s"1e$scale"
    s"CAST(sum(CAST(round(($expr) * $f) AS BIGINT)) AS DOUBLE) / ($f * CAST(count($expr) AS DOUBLE))"
  }

  /** Signed-zero-safe final round: `round(x, scale)` re-expressed as
    * quantize-then-divide. A tiny NEGATIVE value that rounds to zero comes
    * out of Spark's `round` (BigDecimal, which has no signed zero) as +0.0
    * but out of DuckDB's (libm-style, sign-preserving) as −0.0 — one bit
    * apart, which the driver's bytewise hasher flags (the q163 r7 red row).
    * Routing through an integer makes the zero sign deterministic in BOTH
    * engines: `CAST(round(x·10^s) AS BIGINT)` is exactly 0 (unsigned), and
    * integer-0 ÷ 10^s is +0.0 under IEEE in Spark and DuckDB alike. Both
    * engines evaluate the same IEEE product x·10^s and both round halves
    * away from zero, so every non-zero value is unchanged and the pair
    * still agrees by construction. Use this (with [[roundZSql]] on the
    * oracle side) for any FINAL-projection round of a possibly-negative
    * expression — cosines, correlations, covariances, margins, deltas. */
  def roundZ(c: Column, scale: Int): Column = {
    val f = pow10(scale)
    round(c * lit(f)).cast("long").cast("double") / lit(f)
  }

  /** SQL mirror of [[roundZ]] for the DuckDB oracle. */
  def roundZSql(expr: String, scale: Int): String = {
    val f = s"1e$scale"
    s"(CAST(round(($expr) * $f) AS BIGINT) / $f)"
  }
}
