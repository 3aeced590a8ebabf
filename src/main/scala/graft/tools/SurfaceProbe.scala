package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: which Spark 4.1 API surfaces exist in this build —
  * built-in XML source, SQL-body scalar UDFs (CREATE FUNCTION ... RETURN).
  */
object SurfaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val dir = java.nio.file.Files.createTempDirectory("xmlprobe")
      java.nio.file.Files.writeString(dir.resolve("a.xml"),
        """<rows><row><id>1</id><name>x</name></row>
          |<row><id>2</id><name>y</name></row></rows>""".stripMargin)
      val df = spark.read.option("rowTag", "row").xml(dir.toString)
      println("XML-OK rows=" + df.count() + " schema=" + df.schema.simpleString)
    } catch { case e: Throwable => println("XML-FAIL: " + e.getMessage.take(200)) }
    try {
      spark.sql("CREATE TEMPORARY FUNCTION probe_f(x BIGINT) RETURNS BIGINT RETURN x * 2 + 1")
      val v = spark.sql("SELECT probe_f(20)").collect().head.getLong(0)
      println("SQLUDF-OK v=" + v)
    } catch { case e: Throwable => println("SQLUDF-FAIL: " + e.getMessage.take(200)) }
    try {
      spark.sql("CREATE TEMPORARY FUNCTION probe_t(n BIGINT) RETURNS TABLE (i BIGINT) RETURN SELECT id FROM range(n)")
      val c = spark.sql("SELECT count(*) FROM probe_t(5)").collect().head.getLong(0)
      println("SQLUDTF-OK c=" + c)
    } catch { case e: Throwable => println("SQLUDTF-FAIL: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
