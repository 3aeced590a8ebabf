package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for q32 (minhash LSH): times the shingle
  * scan, the signature aggregation, candidate generation, and the full
  * verified query separately, under the SAME config as Bench (AQE on),
  * to attribute the r5 bench regression. Not part of the driver contract.
  */
object Q32Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q32prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // replicate q32's internal stages via the documents table directly
    val P = 2147483647L
    val K = 16
    val rng = new scala.util.Random(42)
    val aK = Array.fill(K)(math.abs(rng.nextLong()) % P)
    val bK = Array.fill(K)(math.abs(rng.nextLong()) % P)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
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

    for (round <- 1 to 2) {
      time(s"r$round shingles only")(noop(sh))
      val sigCols = (0 until K).map(k =>
        min((col("sid") * aK(k) + bK(k)) % P).as(s"h$k")) :+
        collect_set(col("sid")).as("sids")
      val sig = sh
        .withColumn("sid",
          (conv(substring(md5(col("shingle").cast("binary")), 1, 14), 16, 10)
            .cast("long") % P))
        .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      time(s"r$round sig agg once")(noop(sig))
      time(s"r$round full q32")(noop(
        graft.SparkEntry.queries("q32_dedup_minhash_lsh")(spark, sfDir)))
    }
    spark.stop()
  }
}
