package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: run one SQL statement from argv against a bare session
  * (temp view t with a few rows) — used to pin down built-in function
  * semantics (listagg/mode/max_by) before committing an oracle contract. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq((1, "b", 2L), (1, "a", 1L), (1, "b", 3L), (2, "c", 5L))
      .toDF("g", "s", "k").createOrReplaceTempView("t")
    spark.sql(args(0)).show(50, false)
    spark.stop()
  }
}
