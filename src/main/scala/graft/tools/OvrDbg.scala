package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.{LGBMClassifier, LGBMParams}

/** Scratch: distribution of OvR-GBT vs RF proba diffs on 3-class blobs. */
object OvrDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val centers = Seq((0.0, 0.0), (6.0, 6.0), (0.0, 6.0))
    val rows = (0 until 150).map { i =>
      val c = i % 3
      val (cx, cy) = centers(c)
      (i.toLong, Array(cx + rng.nextGaussian(), cy + rng.nextGaussian()),
        c.toDouble, 0.01 * rng.nextDouble())
    }
    val df = rows.toDF("id", "feats", "label", "weight").repartition(2)
    val ovr = new LGBMClassifier(
      LGBMParams(nEstimators = 50, multiclass = "ovr_gbt")).fit(df, Seq("feats"))
    val rf = new LGBMClassifier(LGBMParams(nEstimators = 30)).fit(df, Seq("feats"))
    val po = ovr.predictProba(df, Seq("feats")).select($"id", $"label", $"proba")
    val pr = rf.predictProba(df, Seq("feats")).select($"id", $"proba".as("proba_rf"))
    po.join(pr, "id")
      .select($"id", $"label", $"proba", $"proba_rf", expr(
        "aggregate(zip_with(proba, proba_rf, (a, b) -> abs(a - b)), 0D," +
          " (m, x) -> greatest(m, x))").as("d"))
      .orderBy(desc("d")).show(8, false)
    spark.stop()
  }
}
