package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe behind q192's scaladoc: how much of the corpus
  * 5-gram stream does the bloom prefilter pass (true hits + false
  * positives) vs the exact hit count — the candidate-reduction factor
  * the sketch buys before the exact confirm join.
  */
object P192 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    graft.operators.Pipeline
      .fiveGramsOf(graft.Tables.t(spark, sfDir, "documents"))
      .createOrReplaceTempView("v_grams")
    val row = spark.sql("""
      WITH ev AS (SELECT DISTINCT ng FROM v_grams WHERE doc_id % 97 = 3),
      tr AS (SELECT ng FROM v_grams WHERE doc_id % 97 <> 3)
      SELECT
        (SELECT count(*) FROM ev) AS eval_grams,
        (SELECT count(*) FROM tr) AS corpus_gram_rows,
        (SELECT count(*) FROM tr
         WHERE bloom_contains(
           (SELECT bloom_agg(xxhash64(ng), CAST(100000 AS BIGINT)) FROM ev),
           xxhash64(ng))) AS bloom_pass,
        (SELECT count(*) FROM tr LEFT SEMI JOIN ev ON tr.ng = ev.ng)
          AS exact_hit_rows""").collect().head
    println(s"P192 eval_grams=${row.getLong(0)} corpus_gram_rows=${row.getLong(1)} " +
      s"bloom_pass=${row.getLong(2)} exact_hit_rows=${row.getLong(3)}")
    spark.stop()
  }
}
