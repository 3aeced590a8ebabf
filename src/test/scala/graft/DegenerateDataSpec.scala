package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Board-wide degenerate-input gate for the ANSI divide-by-zero class
  * (r8 verdict item 2, executed as a sweep rather than a grep): Spark 4
  * ANSI mode THROWS DIVIDE_BY_ZERO — even for DOUBLE/0.0 (measured r8) —
  * where DuckDB yields NULL, so any ratio whose denominator can reach
  * zero on real-world-degenerate data is a future red row. Rather than
  * auditing 200+ division sites by eye, this spec RUNS every batch query
  * against an adversarial tiny dataset in which every zero-denominator
  * shape we know of actually occurs:
  *
  *   - a user whose events all share ONE timestamp (span_us = 0);
  *   - a user with a single event (no lag/lead neighbor, zero gaps);
  *   - value columns that are 0.0 and groups with ZERO variance;
  *   - a single-class label column (no negatives → rank/AUC denominators);
  *   - a ZERO embedding vector (cosine / norm denominators);
  *   - an empty document and a one-token document (no shingles/bigrams);
  *   - exact-duplicate documents and embeddings (zero distances);
  *   - props JSON hitting the k=50 div-zero path, malformed, empty, null.
  *
  * A query may legitimately return zero rows here, and driver-side
  * .head()s on empty frames may fail — only ARITHMETIC failures (the
  * cross-engine divergence class) fail the gate. Streaming and ML-fit
  * queries are exercised by their own suites on richer fixtures and are
  * excluded (the replay/fit harnesses assume non-trivial corpora).
  */
class DegenerateDataSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val deg: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_degenerate")
      .toString
    val s = spark
    import s.implicits._

    Seq((0, "AFRICA"), (1, "EUROPE"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")

    Seq((0, "KENYA", 0), (1, "FRANCE", 1), (2, "GERMANY", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

    Seq(
      (1L, "Customer#1", 0, 0.0, "BUILDING"),   // zero balance,
      (2L, "Customer#2", 0, 0.0, "BUILDING"),   // zero variance pair
      (3L, "Customer#3", 1, -5.0, "MACHINERY")) // negative balance
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    Seq((1L, "Supplier#1", 0, 10.0), (2L, "Supplier#2", 1, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    Seq(
      (1L, "green part", "Brand#1", "TYPE A", 5, 100.0),
      (2L, "green part", "Brand#1", "TYPE A", 5, 100.0)) // identical twin
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    // one customer, one status class, one priority, one DATE: zero spans
    // and single-class groups everywhere downstream
    Seq(
      (1L, 1L, "F", 100.0, "2024-01-05 00:00:00", "1-URGENT"),
      (2L, 1L, "F", 100.0, "2024-01-05 00:00:00", "1-URGENT"),
      (3L, 2L, "F", 100.0, "2024-01-05 00:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ods", "o_orderpriority")
      .withColumn("o_orderdate", col("ods").cast("timestamp")).drop("ods")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // equal quantities/prices, zero discount/tax, one flag/status/date
    Seq(
      (1L, 1L, 1L, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", "2024-01-10 00:00:00"),
      (1L, 2L, 2L, 2, 5.0, 50.0, 0.0, 0.0, "N", "O", "2024-01-10 00:00:00"),
      (2L, 1L, 1L, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", "2024-01-10 00:00:00"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "sds")
      .withColumn("l_shipdate", col("sds").cast("timestamp")).drop("sds")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // user 1: two events at the SAME instant (span 0), zero values;
    // user 2: a single event; user 3: a small normal-ish tail so
    // windowed queries still produce rows; props cover the k=50
    // div-zero path, k=0, malformed, empty object, and NULL.
    Seq(
      (1L, "2024-01-02 00:00:00.000000", 1L, "purchase", 0.0,
        "{\"k\": 50}"),
      (2L, "2024-01-02 00:00:00.000000", 1L, "purchase", 0.0,
        "{\"k\": 50}"),
      (3L, "2024-01-03 12:00:00.000000", 2L, "view", 10.0, "{\"k\": 0}"),
      (4L, "2024-01-04 08:00:00.000000", 3L, "purchase", 25.5, "not json"),
      (5L, "2024-01-04 09:00:00.000000", 3L, "click", 25.5, "{}"),
      (6L, "2024-01-05 10:00:00.000000", 3L, "error", 0.0, null),
      (7L, "2024-01-06 11:00:00.000000", 3L, "signup", 25.5,
        "{\"k\": 7}"),
      (8L, "2024-01-08 11:00:00.000000", 3L, "view", 3.25, "{\"k\": 87}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0"),
      (2L, "word", "de", "src1"),
      (3L, "", "fr", "src1"),
      (4L, "alpha alpha alpha alpha alpha", "zh", "src2"),
      (5L, "the quick brown fox jumps over the lazy dog", "en", "src3"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val zero = Array.fill(64)(0.0f)
    val a = Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.25f)
    val b = Array.tabulate(64)(i => (i % 5).toFloat / 10.0f)
    Seq((0L, zero, 0), (1L, a, 1), (2L, a, 1), (3L, b, 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def isArithmetic(e: Throwable): Boolean = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    chain.exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      t.isInstanceOf[ArithmeticException] ||
        m.contains("DIVIDE_BY_ZERO") || m.contains("Division by zero") ||
        m.contains("divide by zero") || m.contains("INTERVAL_DIVIDED_BY_ZERO")
    }
  }

  test("no batch query throws on zero-denominator-degenerate data") {
    // GRAFT_DEG_ONLY=q41,q55 restricts the gate to named prefixes — the
    // fast fix-verify loop while guarding a specific query
    val only = sys.env.get("GRAFT_DEG_ONLY").map(_.split(',').toSeq)
    // "_ml_" covers every ML-fit query (incl. q73_ml_quantile_coverage)
    val skip = (n: String) =>
      n.contains("stream") || n.contains("_ml_") ||
        !only.forall(_.exists(n.startsWith))
    // concurrent sweep (ParSweep) — each task plans/executes on its own
    // newSession; only arithmetic failures count, as before
    val failures = ParSweep.sweep(spark,
      SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1))) {
      (name, fn, ss) =>
        try { fn(ss, deg).write.format("noop").mode("overwrite").save(); None }
        catch {
          case e: Throwable if isArithmetic(e) =>
            Some(s"$name: ${e.getMessage}")
          case _: Throwable => None // empty-result/driver-side-head artifacts:
          // not the cross-engine arithmetic divergence this gate pins
        }
    }
    assert(failures.isEmpty,
      "ANSI divide-by-zero on degenerate data (DuckDB would yield NULL " +
        s"— guard with when(den>0)/NULLIF):\n${failures.mkString("\n")}")
  }

  /** Every table EMPTY (schema-correct, zero rows) — the r9 q151 class
    * (empty lineitem → coalesce(sum...) guard) swept board-wide instead
    * of lineitem-shaped only (r10 verdict item 6): documents, embeddings
    * and events empties were previously unswept. The dangerous pattern
    * is a NON-NULL numerator over count()=0 or a literal denominator
    * that an empty input drives to zero: sum-over-empty is NULL and NULL
    * ÷ 0 propagates NULL under ANSI, but lit ÷ count(empty) THROWS where
    * DuckDB yields NULL — the same cross-engine divergence class. Gate
    * semantics match the sweep above: only arithmetic failures fail;
    * empty-result artifacts (driver-side .head() on an empty frame) are
    * legitimate here. */
  private lazy val degEmpty: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_degenerate_empty").toString
    for (t <- Tables.all) {
      spark.read.parquet(s"$deg/$t.parquet")
        .filter(lit(false))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("no batch query throws arithmetic on fully EMPTY tables") {
    val only = sys.env.get("GRAFT_DEG_ONLY").map(_.split(',').toSeq)
    // "_ml_" covers every ML-fit query (incl. q73_ml_quantile_coverage)
    val skip = (n: String) =>
      n.contains("stream") || n.contains("_ml_") ||
        !only.forall(_.exists(n.startsWith))
    val emptyDir = degEmpty // force the lazy fixture before the pool
    val failures = ParSweep.sweep(spark,
      SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1))) {
      (name, fn, ss) =>
        try { fn(ss, emptyDir).write.format("noop").mode("overwrite").save(); None }
        catch {
          case e: Throwable if isArithmetic(e) =>
            Some(s"$name: ${e.getMessage}")
          case _: Throwable => None // empty-result/driver-side-head artifacts
        }
    }
    assert(failures.isEmpty,
      "ANSI divide-by-zero on EMPTY tables (DuckDB would yield NULL — " +
        s"guard with when(den>0)/NULLIF/coalesce):\n${failures.mkString("\n")}")
  }
}
