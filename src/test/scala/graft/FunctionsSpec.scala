package graft

import graft.functions.VectorFunctions.{float_dot, float_norm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native [[graft.functions.FloatDot]] Catalyst expression: the
  * codegen path must agree with the interpreted HOF formulation, handle
  * nulls like any binary expression, and truncate to the shorter array
  * (zip_with product semantics).
  */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.5f, -0.5f), Seq(2.0f, 2.0f)),
      (3L, Seq.empty[Float], Seq(1.0f))
    ).toDF("id", "a", "b")
  }

  test("float_dot matches the interpreted HOF result (codegen path)") {
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)")
    val rows = df
      .filter(size(col("a")) === size(col("b"))) // HOF zip_with pads with null
      .select(col("id"), float_dot(col("a"), col("b")).as("nat"), hof.as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) === r.getDouble(2), s"id=${r.getLong(0)}"))
  }

  test("float_dot exact values and shorter-array truncation") {
    val m = df.select(col("id"), float_dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) === 32.0) // 4 + 10 + 18
    assert(m(2L) === 0.0)  // 1 - 1
    assert(m(3L) === 0.0)  // empty side -> 0
  }

  test("float_dot is null on null input; float_norm is the L2 norm") {
    val withNull = df.withColumn("a2", when(col("id") === 1, col("a")))
    val rows = withNull
      .select(col("id"), float_dot(col("a2"), col("b")).as("d"),
        float_norm(col("b")).as("n"))
      .orderBy("id").collect()
    assert(!rows(0).isNullAt(1) && rows(1).isNullAt(1) && rows(2).isNullAt(1))
    assert(math.abs(rows(1).getDouble(2) - math.sqrt(8.0)) < 1e-12)
  }

  test("WeightedQuantile is exact and partition-count independent") {
    import spark.implicits._
    val wq = udaf(graft.functions.WeightedQuantile(0.5))
    // weighted median of {1×w9, 2×w1}: cum weight hits 5.0 at v=1
    val tiny = Seq((100L, 900L), (200L, 100L)).toDF("v", "w")
    assert(tiny.agg(wq(col("v"), col("w"))).collect().head.getDouble(0) === 1.0)
    // same data, different partitioning → identical result
    val data = (1 to 1000).map(i => ((i % 37) * 100L + 100L, (i % 11) * 10L + 1L))
    val r = (1 to 8 by 3).map { np =>
      data.toDF("v", "w").repartition(np)
        .agg(wq(col("v"), col("w"))).collect().head.getDouble(0)
    }
    assert(r.distinct.size === 1, s"partition-dependent results: $r")
  }

  test("float_dot survives both eval paths (interpreted fallback)") {
    // force interpreted eval through a non-codegen context: collect via RDD
    val v = df.filter(col("id") === 1)
      .select(float_dot(col("a"), col("b"))).rdd.map(_.getDouble(0)).collect()
    assert(v.head === 32.0)
  }

  test("long_dot: exact values, truncation, nulls, both eval paths") {
    import graft.functions.VectorFunctions.long_dot
    import spark.implicits._
    val d = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (2L, Seq(127L, -127L), Seq(127L, 127L, 99L)), // truncates to min length
      (3L, Seq.empty[Long], Seq(1L))
    ).toDF("id", "a", "b")
    val m = d.select(col("id"), long_dot(col("a"), col("b")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 32L && m(2L) === 0L && m(3L) === 0L)
    // null propagation + interpreted path (RDD collect bypasses codegen)
    val withNull = d.withColumn("a2", when(col("id") === 1, col("a")))
    val rows = withNull.select(long_dot(col("a2"), col("b"))).orderBy(col("id"))
      .rdd.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).collect()
    assert(rows.count(_.isDefined) == 1 && rows.flatten.head == 32L)
  }

  test("q114 PII redaction: exact replacements, near-miss negatives untouched") {
    import spark.implicits._
    val in = Seq(
      (0L, "reach jane.doe+spam@mail.example.org today"),
      (1L, "call 555-123-4567 or 55-123-4567"),
      (2L, "from 192.168.0.1 and 999.999.999.999"),
      (3L, "plain text with an @ sign but no address"),
      (4L, "x@y.io tight 1.2.3.4 and 000-000-0000")
    ).toDF("id", "t")
    val out = in
      .select(col("id"), graft.operators.Pipeline.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "reach <EMAIL> today")
    assert(out(1L) == "call <PHONE> or 55-123-4567") // 2-digit prefix: no match
    assert(out(2L) == "from <IP> and <IP>") // syntactic IPv4, not range-checked
    assert(out(3L) == "plain text with an @ sign but no address")
    assert(out(4L) == "<EMAIL> tight <IP> and <PHONE>")
  }

  test("jaro_winkler: known values, edge cases, both eval paths") {
    import graft.functions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    // classic textbook pairs (exact rational values)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    // DuckDB conventions this kernel is pinned to:
    assert(jw("", "") == 0.0)     // both-empty is 0, not the classic 1
    assert(jw("a", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0 => adjacent transposition no match
    // prefix boost caps at 4 shared chars and needs jaro > 0.7
    assert(math.abs(jw("aaaaaa", "aaaaab") -
      (1.0 - 2.0 / 18 + 4 * 0.1 * (2.0 / 18))) < 1e-15)
    // codegen path through a DataFrame filter agrees with the kernel
    import spark.implicits._
    import graft.functions.JaroWinkler.jaro_winkler
    val got = Seq(("martha", "marhta"), ("dixon", "dicksonx"))
      .toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.9611111111111111, 0.8133333333333332))
    // SQL registration via Bridge.registerFunction
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "jaro_winkler", { es =>
        require(es.length == 2); JaroWinkler(es.head, es(1))
      })
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .head().getDouble(0) == 0.9611111111111111)
  }

  test("morton32: known codes, bit layout, SQL registration, both eval paths") {
    import graft.functions.VectorFunctions.morton32
    import spark.implicits._
    // hand-computed: x=0b11, y=0b01 → x bits at odd positions (1,3),
    // y bit at position 0 → 0b1011 = 11; masking keeps only 16 bits
    val d = Seq((3L, 1L), (0L, 0L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (0x10000L + 3L, 1L)).toDF("x", "y")
    val got = d.select(morton32(col("x"), col("y"))).collect().map(_.getLong(0))
    assert(got(0) == 11L)
    assert(got(1) == 0L)
    assert(got(2) == 0xAAAAAAAAL, "x spreads to odd bits")
    assert(got(3) == 0x55555555L, "y spreads to even bits")
    assert(got(4) == 11L, "bits above 16 are masked off")
    // interpreted path agrees with codegen
    val interp = graft.functions.Morton32.interleave(3L, 1L)
    assert(interp == 11L)
    // SQL surface via Bridge registration (the GraftExtensions builder)
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark,
      "morton32", { es => graft.functions.Morton32(es.head, es(1)) })
    d.createOrReplaceTempView("v_m32")
    val sqlGot = spark.sql("SELECT morton32(x, y) FROM v_m32 WHERE x = 3")
      .collect().head.getLong(0)
    assert(sqlGot == 11L)
  }

  test("bloom_agg/bloom_contains: zero false negatives, bounded false positives") {
    import spark.implicits._
    GraftExtensions.register(spark)
    (0 until 20000).map(i => s"member-$i").toDF("s")
      .createOrReplaceTempView("v_bloom_members")
    (0 until 20000).map(i => s"absent-$i").toDF("s")
      .createOrReplaceTempView("v_bloom_probes")
    // losslessness (what makes q192's prefilter exact): a bloom filter has
    // NO false negatives — every inserted member must pass its own sketch
    val misses = spark.sql("""
      SELECT count(*) FROM v_bloom_members
      WHERE NOT bloom_contains(
        (SELECT bloom_agg(xxhash64(s), CAST(20000 AS BIGINT))
         FROM v_bloom_members),
        xxhash64(s))""").collect().head.getLong(0)
    assert(misses === 0L, "bloom filter produced a false negative")
    // effectiveness: default sizing is 8 bits/item (~2% FPR with optimal
    // k); a disjoint probe set must pass at well under 10%
    val fps = spark.sql("""
      SELECT count(*) FROM v_bloom_probes
      WHERE bloom_contains(
        (SELECT bloom_agg(xxhash64(s), CAST(20000 AS BIGINT))
         FROM v_bloom_members),
        xxhash64(s))""").collect().head.getLong(0)
    assert(fps < 2000L, s"false-positive rate ${fps / 20000.0} exceeds 10%")
  }

  test("q114 injection round-trip: every injected kind redacts to its marker") {
    import spark.implicits._
    val P = graft.operators.Pipeline
    val ids = (0L to 13L).toDF("doc_id").withColumn("t", lit("w"))
    val rows = ids
      .select(col("doc_id"), P.redactPii(P.injectPii(col("t"), col("doc_id"))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L to 13L).foreach { id =>
      val expected = (id % 7) match {
        case 0 => "w contact <EMAIL> now"
        case 1 => "w call <PHONE>"
        case 2 => "w from <IP> port"
        case _ => "w"
      }
      assert(rows(id) == expected, s"doc_id=$id")
    }
  }
}
