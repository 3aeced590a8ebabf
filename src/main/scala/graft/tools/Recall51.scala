package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.{float_dot, float_norm}

/** Measures q51's IVF recall vs exact brute-force top-5 on the real
  * embeddings table (VERDICT r6 item 7: the recall >= 0.9 spec runs on
  * planted test data; this records the number on sf data so BASELINE.md
  * can track ANN quality per round alongside the perf numbers). */
object Recall51 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ivf = graft.SparkEntry.queries("q51_ann_ivf")(spark, sfDir)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))

    // exact top-5 over the same probe set (q50's shape with k=5)
    val e = graft.Tables.t(spark, sfDir, "embeddings")
      .withColumn("norm", float_norm(col("embedding")))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("ea"), col("norm").as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("eb"), col("norm").as("cn"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    val exact = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", round(float_dot(col("ea"), col("eb")) / (col("qn") * col("cn")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))

    val byQ = exact.groupBy(_._1)
    val got = ivf.groupBy(_._1)
    for ((qid, want) <- byQ.toSeq.sortBy(_._1)) {
      val hit = got.getOrElse(qid, Array.empty).toSet
      val r = want.count(hit.contains).toDouble / want.length
      println(f"[recall51] qid=$qid recall=$r%.2f (${want.count(hit.contains)}/${want.length})")
    }
    val overall = exact.count(p => got.getOrElse(p._1, Array.empty).toSet.contains(p)).toDouble / exact.length
    println(f"[recall51] sfDir=$sfDir overall=$overall%.3f over ${byQ.size} queries x top-5")
    spark.stop()
  }
}
