package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object P34 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r }
    val e = graft.Tables.t(spark, d, "embeddings")
    println("rows " + e.count() + " labels " + e.select("label").distinct().count())
    val en = e.withColumn("norm",
      expr("sqrt(aggregate(embedding, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"))
    val a = en.select(col("vec_id").as("ia"), col("label"), col("embedding").as("ea"), col("norm").as("na"))
    val b = en.select(col("vec_id").as("ib"), col("label").as("label_b"), col("embedding").as("eb"), col("norm").as("nb"))
    val pairs = a.join(b, col("label") === col("label_b") && col("ia") < col("ib"))
    def run(name: String, dotCol: org.apache.spark.sql.Column) = {
      val out = pairs.withColumn("dot", dotCol)
        .withColumn("cos", round(col("dot") / (col("na") * col("nb")), 6))
        .filter(col("cos") >= 0.3).select(col("ia"), col("ib"), col("label"), col("cos"))
      time(name)(out.write.format("noop").mode("overwrite").save())
      time(name + "2")(out.write.format("noop").mode("overwrite").save())
    }
    run("zipwith", expr("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"))
    run("fused", expr("aggregate(sequence(0, size(ea) - 1), 0.0D, (acc, i) -> acc + CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))"))
    val dotUdf = udf((x: Seq[Float], y: Seq[Float]) => {
      var s = 0.0; var i = 0; val n = x.length
      while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }; s })
    run("udf", dotUdf(col("ea"), col("eb")))
    spark.stop()
  }
}
