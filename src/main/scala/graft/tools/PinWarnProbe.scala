package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** Root-cause probe for the r10 `WARN LogicalRDD: output columns ...
  * aren't the same` on every Pinball localCheckpoint (r11, closed).
  *
  * Finding: `vector_to_array(features).cast("array<double>")` declares
  * ArrayType(containsNull = TRUE) in the analyzed plan (DDL cast), but
  * `SimplifyCasts` removes the no-op cast during optimization —
  * vector_to_array already emits containsNull = FALSE — so the analyzed
  * and optimized outputs disagree on the `_farr` ArrayType, and
  * `LogicalRDD.fromDataset`'s name+dataType rewrite check fails (the
  * printed attribute lists LOOK identical because containsNull isn't in
  * the toString). Fix: drop the redundant cast (ml/LGBM.scala). This
  * probe keeps both variants side by side so a regression is a one-run
  * diagnosis.
  */
object PinWarnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        col("label").cast("double").as("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
    def census(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      val qe = d.queryExecution
      qe.analyzed.output.zip(qe.optimizedPlan.output).foreach { case (a, b) =>
        if (a != b) println(s"[$tag] MISMATCH ${a.name}: analyzed=${a.dataType} " +
          s"optimized=${b.dataType} (warn on checkpoint)")
        else println(s"[$tag] ok ${a.name}")
      }
    }
    census("cast   ", df.withColumn("_farr",
      vector_to_array(col("features")).cast("array<double>")))
    census("no-cast", df.withColumn("_farr", vector_to_array(col("features"))))
    spark.stop()
  }
}
