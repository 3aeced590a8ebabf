package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{LGBMClassifier, LGBMParams}

/** q185's claim, pinned: a stateless model scored over a micro-batched
  * stream must produce EXACTLY the batch-scored rows — batching
  * boundaries cannot change the output of a pure projection. The spec
  * re-fits the same deterministic model on the same features and
  * compares the registered streaming query's rows against the batch
  * `predict` row-for-row (same ids, same labels, same predictions).
  */
class StreamingMLSpec extends AnyFunSuite {
  import TestSpark._

  test("q185: stream-scored rows equal batch-scored rows exactly") {
    val streamed = SparkEntry.queries("q185_stream_ml_scoring")(spark, sf)
      .select(col("vec_id"), col("label_bin"), col("prediction"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet

    val df = Tables.t(spark, sf, "embeddings").select(
      col("vec_id"), col("embedding"),
      (col("label") >= 5).cast("double").as("label_bin"))
    val m = new LGBMClassifier(LGBMParams(nEstimators = 10, maxDepth = 4))
      .fit(df, featuresCol = Seq("embedding"), labelCol = "label_bin")
    val batch = m.predict(df, Seq("embedding"))
      .select(col("vec_id"), col("label_bin"), col("prediction"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .toSet

    assert(streamed.nonEmpty, "stream scored no rows")
    assert(streamed == batch,
      s"stream/batch scoring diverged: ${(streamed diff batch).take(3)} vs " +
        s"${(batch diff streamed).take(3)}")
  }
}
