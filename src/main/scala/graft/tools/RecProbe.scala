package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: does this Spark build parse/execute WITH RECURSIVE? */
object RecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM r WHERE n < 5)
          |SELECT sum(n) AS s FROM r""".stripMargin)
      println("RECURSIVE-OK sum=" + df.collect().head.getLong(0))
    } catch {
      case e: Throwable => println("RECURSIVE-FAIL: " + e.getMessage.take(300))
    }
    try {
      val df2 = spark.sql(
        """WITH RECURSIVE r(n) AS (
          |  SELECT 1
          |  UNION
          |  SELECT (n % 3) + 1 FROM r)
          |SELECT count(*) AS c FROM r""".stripMargin)
      println("RECURSIVE-UNION-OK count=" + df2.collect().head.getLong(0))
    } catch {
      case e: Throwable => println("RECURSIVE-UNION-FAIL: " + e.getMessage.take(300))
    }
    spark.stop()
  }
}
