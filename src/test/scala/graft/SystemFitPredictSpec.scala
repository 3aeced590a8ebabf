package graft

import java.nio.file.{Files, Paths}

import graft.ml.{LGBMClassifier, LGBMParams, LGBMRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Covtype-scale system test, mirroring the reference's
  * system_tests/test_fit_predict.py:26-59 pipeline shape: N gzip CSV
  * shards → positional projection (all-but-last vs last column) →
  * fit(nEstimators=50) → predict → metric-as-aggregate, gated > 0.8.
  *
  * The reference trains on covtype: 581,012 rows × 54 features (10
  * continuous + 4 wilderness + 40 soil one-hots) from 12 gzip shards.
  * Here: 500,000 rows in the same 55-column layout, generated
  * deterministically from xxhash64(id) so the shards are identical on
  * every run. The class column is an axis-aligned function of
  * (c0, wilderness) — 28 rectangular cells, learnable by depth-5 trees —
  * and c0 is recoverable from (class, wilderness) to R²≈0.94, so both
  * gates sit well clear of 0.8 without being trivially 1.0.
  *
  * Scale path exercised for real: 12 unsplittable gzip streams scanned in
  * parallel (the reference's blocksize=None analogue), VectorAssembler
  * over 54 positional columns, distributed histogram aggregation in
  * tree fit, lazy transform for predict, metric as a single aggregate —
  * nothing but the fitted trees ever reaches the driver.
  */
class SystemFitPredictSpec extends AnyFunSuite {
  import TestSpark._

  private val nRows = 500000L
  private val dir = "/tmp/graft_covtype_csv"

  /** uniform [0,1) derived from xxhash64(id, k) — partition-independent. */
  private def u(k: Int) =
    (xxhash64(col("id"), lit(k)).cast("double") /
      lit(9.223372036854775807e18) + lit(1.0)) / lit(2.0)

  private def stage(): Unit = {
    if (Files.exists(Paths.get(s"$dir/_SUCCESS"))) return
    var df = spark.range(nRows).withColumn("c0", u(1) * 1000.0)
    (1 to 9).foreach(k => df = df.withColumn(s"c$k", u(k + 10) * 1000.0))
    df = df
      .withColumn("w", pmod(xxhash64(col("id"), lit(30)), lit(4)))
      .withColumn("s", pmod(xxhash64(col("id"), lit(31)), lit(40)))
    (0 to 3).foreach(k => df = df.withColumn(s"c${10 + k}",
      when(col("w") === k, 1.0).otherwise(0.0)))
    (0 to 39).foreach(k => df = df.withColumn(s"c${14 + k}",
      when(col("s") === k, 1.0).otherwise(0.0)))
    df = df.withColumn("c54",
      least(lit(6.0), floor((col("c0") + col("w") * 214.0) * 7.0 / 1642.0)))
    df.select((0 to 54).map(k => col(s"c$k")): _*)
      .repartition(12)
      .write.mode("overwrite").option("compression", "gzip").csv(dir)
  }

  private def readShards(): DataFrame = {
    stage()
    val ddl = (0 to 54).map(k => s"_c$k double").mkString(", ")
    spark.read.schema(ddl).csv(s"$dir/*.csv.gz")
  }

  test("covtype-scale classify: 500k x 54 from 12 gzip shards, accuracy > 0.8") {
    val data = readShards()
    val featCols = (0 to 53).map(k => s"_c$k") // iloc[:, :-1]
    val clf = new LGBMClassifier(LGBMParams(nEstimators = 50))
      .fit(data, featCols, labelCol = "_c54")
    assert(clf.nClasses == 7)
    val acc = clf.predict(data, featCols)
      .agg(avg((col("_c54") === col("prediction")).cast("double")))
      .head.getDouble(0)
    info(f"accuracy = $acc%.4f")
    assert(acc > 0.8, s"accuracy $acc")
  }

  test("covtype-scale regress: c0 from remaining 54 columns, R2 > 0.8") {
    val data = readShards()
    val featCols = (1 to 54).map(k => s"_c$k") // iloc[:, 1:]
    val reg = new LGBMRegressor(LGBMParams(nEstimators = 50))
      .fit(data, featCols, labelCol = "_c0")
    val r = reg.predict(data, featCols).agg(
      sum(pow(col("_c0") - col("prediction"), 2)).as("ss_res"),
      (var_pop(col("_c0")) * count(lit(1))).as("ss_tot")).head
    val r2 = 1.0 - r.getDouble(0) / r.getDouble(1)
    info(f"R2 = $r2%.4f")
    assert(r2 > 0.8, s"R2 $r2")
  }
}
