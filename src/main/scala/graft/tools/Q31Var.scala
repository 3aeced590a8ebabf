package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch A/B for q31 formulations (not part of the driver contract). */
object Q31Var {
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("toks"),
        explode(expr("sequence(0, size(toks) - 3)")).as("i"))
      .select(col("doc_id"), col("lang"),
        concat(col("toks")(col("i")), lit("|"),
               col("toks")(col("i") + 1), lit("|"),
               col("toks")(col("i") + 2)).as("shingle"))
      .distinct()

  private def bucketPairs(buckets: DataFrame): DataFrame =
    buckets
      .select(col("ids"), explode(expr("sequence(0, size(ids) - 2)")).as("i"))
      .select(col("ids"), col("i"),
        explode(expr("sequence(i + 1, size(ids) - 1)")).as("j"))
      .select(col("ids")(col("i")).as("da"), col("ids")(col("j")).as("db"))
      .distinct()

  /** Merged per-doc aggregation: one groupBy produces BOTH the full
    * shingle set (verify side) and the frequency-ordered prefix
    * (candidate side).
    */
  def merged(s: SparkSession, d: String, persist: Boolean): DataFrame = {
    val sh = shingles(s, d)
    val freq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("gf"))
    val per0 = sh.join(freq, "shingle")
      .groupBy(col("doc_id"), col("lang"))
      .agg(array_sort(collect_list(struct(col("gf"), col("shingle")))).as("a"))
      .select(col("doc_id"), col("lang"),
        expr("a.shingle").as("shs"),
        expr("slice(a, 1, CAST(size(a) - ceil(size(a) * 0.5) + 1 AS INT)).shingle")
          .as("prefix"))
    val per = if (persist) per0.persist() else per0
    val cand = bucketPairs(per
      .select(col("doc_id"), col("lang"), explode(col("prefix")).as("shingle"))
      .groupBy(col("lang"), col("shingle"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1))
    val sa = per.select(col("doc_id").as("da"), col("shs").as("sa"))
    val sb = per.select(col("doc_id").as("db"), col("shs").as("sb"))
    cand.join(sa, "da").join(sb, "db")
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac",
        round(col("ni").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("ni")).cast("double"), 6))
      .filter(col("jac") >= 0.5)
      .select(col("da"), col("db"), col("jac"))
      .orderBy(col("da"), col("db"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q31var] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm the JVM/scan once
    run(graft.SparkEntry.queries("q30_dedup_exact")(spark, sfDir))
    for (_ <- 1 to 2) {
      time("current")(run(
        graft.SparkEntry.queries("q31_dedup_ngram_jaccard")(spark, sfDir)))
      time("merged")(run(merged(spark, sfDir, persist = false)))
      time("merged+persist")(run(merged(spark, sfDir, persist = true)))
      spark.sharedState.cacheManager.clearCache()
    }
    // parity check vs current
    val cur = graft.SparkEntry.queries("q31_dedup_ngram_jaccard")(spark, sfDir)
      .collect().map(_.toString).toSet
    val mrg = merged(spark, sfDir, persist = false)
      .collect().map(_.toString).toSet
    println(s"[q31var] parity: ${cur == mrg} (cur=${cur.size} mrg=${mrg.size})")
    spark.stop()
  }
}
