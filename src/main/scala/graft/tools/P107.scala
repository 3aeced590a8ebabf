package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object P107 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p107] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = graft.Tables.t(spark, sfDir, "documents")
    def perLang = docs.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
    for (i <- 1 to 2) {
      time(s"scan_only_$i")(docs.select(col("lang")).write.format("noop").mode("overwrite").save())
      time(s"explode_$i")(docs.select(col("lang"), explode(split(col("text"), " ")).as("tok")).write.format("noop").mode("overwrite").save())
      time(s"perLang_$i")(perLang.write.format("noop").mode("overwrite").save())
      time(s"vocab_$i")(perLang.groupBy(col("tok")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("tok")).limit(50).write.format("noop").mode("overwrite").save())
      time(s"full_q107_$i")(graft.SparkEntry.queries("q107_vocab_oov")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
