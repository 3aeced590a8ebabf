package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic sf1: scale the driver's sf0.1 tables 10× so the
  * scaling census (SCALING.json) gets a third decade for the top movers
  * (r11 verdict task 6 — testdata generation is driver-owned and stops at
  * sf0.1, so the builder scales the largest driver tables itself, exactly
  * and reproducibly, no RNG).
  *
  * Construction: 10 replicas per fact table, every key (and every foreign
  * key) offset by `replica · (max_key + 1)` so referential integrity and
  * per-replica join fan-outs are EXACTLY those of sf0.1 — joins never
  * cross replicas. region/nation stay fixed (TPC-H holds dimensions
  * constant across SFs). Payloads are adjusted only where duplication
  * would falsify join selectivity rather than scale it:
  *   - customer/supplier/part names get a replica suffix (r>0), keeping
  *     name-keyed fuzzy joins (q101/q141-class) at sf0.1 selectivity ×10
  *     instead of ×100 cross-replica self-matches;
  *   - document text is token-ROTATED per replica (length and vocabulary
  *     preserved, shingle sets disjoint up to wraparound) so near-dup
  *     structure scales like a 10×-bigger corpus, not like 10 exact
  *     copies of the same corpus;
  *   - embeddings shift by replica·0.001 per dimension — distinct
  *     vectors, same geometry class;
  *   - events keep their time range (same window grid, 10× density —
  *     "same period, more traffic") with user/event ids offset so
  *     sessions never merge across replicas.
  * Timestamps, labels, statuses, prices and all other payloads replicate
  * verbatim, so value distributions match sf0.1 per replica.
  */
object SynthSf1 {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val R = sys.env.getOrElse("SPARK_GRAFT_SF_REPS", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = graft.Tables.t(spark, src, t)
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0)
    def reps(df: DataFrame): DataFrame =
      df.withColumn("_r", explode(lit((0 until R).toArray)))
    def off(c: String, span: Long) = col(c) + col("_r").cast("long") * lit(span)
    def suffixed(c: String) = when(col("_r") === 0, col(c))
      .otherwise(concat(col(c), lit(" "), col("_r").cast("string")))
    def wr(df: DataFrame, t: String): Unit = {
      df.drop("_r").write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"SYNTH $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // fixed dimensions
    rd("region").write.mode("overwrite").parquet(s"$out/region.parquet")
    rd("nation").write.mode("overwrite").parquet(s"$out/nation.parquet")

    val (cust, ords, part, supp) =
      (rd("customer"), rd("orders"), rd("part"), rd("supplier"))
    val (cSpan, oSpan, pSpan, sSpan) = (
      maxOf(cust, "c_custkey") + 1, maxOf(ords, "o_orderkey") + 1,
      maxOf(part, "p_partkey") + 1, maxOf(supp, "s_suppkey") + 1)

    wr(reps(cust)
      .withColumn("c_custkey", off("c_custkey", cSpan))
      .withColumn("c_name", suffixed("c_name")), "customer")
    wr(reps(supp)
      .withColumn("s_suppkey", off("s_suppkey", sSpan))
      .withColumn("s_name", suffixed("s_name")), "supplier")
    wr(reps(part)
      .withColumn("p_partkey", off("p_partkey", pSpan))
      .withColumn("p_name", suffixed("p_name")), "part")
    wr(reps(ords)
      .withColumn("o_orderkey", off("o_orderkey", oSpan))
      .withColumn("o_custkey", off("o_custkey", cSpan)), "orders")
    wr(reps(rd("lineitem"))
      .withColumn("l_orderkey", off("l_orderkey", oSpan))
      .withColumn("l_partkey", off("l_partkey", pSpan))
      .withColumn("l_suppkey", off("l_suppkey", sSpan)), "lineitem")

    val ev = rd("events")
    val (eSpan, uSpan) =
      (maxOf(ev, "event_id") + 1, maxOf(ev, "user_id") + 1)
    wr(reps(ev)
      .withColumn("event_id", off("event_id", eSpan))
      .withColumn("user_id", off("user_id", uSpan)), "events")

    val docs = rd("documents")
    val dSpan = maxOf(docs, "doc_id") + 1
    // rotation offset 1 + _r % (n−1) is NONZERO for every replica (no
    // exact cross-replica copies) AND DISTINCT across replicas whenever
    // the doc has more tokens than there are replicas — the r12 form
    // 1 + (_r·7) % (n−1) collided across replicas whenever 7 | n−1
    // (every 8-token doc put all nine r>0 replicas at offset 1),
    // partially defeating the disjoint-shingle-set goal (ADVICE r12).
    // When the offset DOES wrap (_r ≥ n−1 — unavoidable once replicas
    // outnumber a doc's rotations, e.g. every ≤ 100-token doc at the
    // sf10 REPS=100 setting), a per-replica disambiguator token is
    // appended: without it the wrapped replicas are EXACT copies, and
    // exact-dup group sizes grow with R — which would bill a quadratic
    // pair-count artifact of this GENERATOR to the near-dup queries'
    // fourth-decade slope (measured before the fix: 500k sf10 docs held
    // only 270k distinct texts, groups up to 20 copies). One appended
    // token shifts a single shingle — near-dup structure is preserved,
    // duplication depth stays at its sf0.1 value.
    wr(reps(docs)
      .withColumn("doc_id", off("doc_id", dSpan))
      .withColumn("text", expr(
        """IF(_r = 0 OR size(split(text, ' ')) <= 1, text,
             CONCAT(
               array_join(concat(
                 slice(split(text, ' '),
                       1 + _r % (size(split(text, ' ')) - 1) + 1,
                       size(split(text, ' '))),
                 slice(split(text, ' '), 1,
                       1 + _r % (size(split(text, ' ')) - 1))),
               ' '),
               IF(_r >= size(split(text, ' ')) - 1,
                  concat(' zzrep', CAST(_r AS STRING)), '')))"""))
      .withColumn("n_chars", length(col("text")).cast("long")), "documents")

    val emb = rd("embeddings")
    val vSpan = maxOf(emb, "vec_id") + 1
    wr(reps(emb)
      .withColumn("vec_id", off("vec_id", vSpan))
      .withColumn("embedding", expr(
        "transform(embedding, x -> CAST(x + _r * CAST(0.001 AS FLOAT) AS FLOAT))")),
      "embeddings")

    spark.stop()
  }
}
