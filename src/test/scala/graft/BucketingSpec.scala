package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffle you pay once. Two fact tables bucketed on
  * the join key co-locate matching rows at write time, so every
  * subsequent join/aggregation on that key plans with ZERO exchanges —
  * at 100 TB this converts the dominant recurring shuffle of a
  * fact-to-fact join into a one-time write cost. This spec pins the
  * planner behavior the claim rests on: the bucketed join's physical
  * plan contains no ShuffleExchange.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
      case a: AdaptiveSparkPlanExec =>
        return a.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
    }.size
  }

  test("join on the bucket key plans with no shuffle; unbucketed join shuffles") {
    val li = Tables.t(spark, sf, "lineitem")
    val ord = Tables.t(spark, sf, "orders")

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    ord.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")

    val bJoin = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    // disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      bJoin.write.format("noop").mode("overwrite").save()
      assert(shuffles(bJoin) === 0,
        "bucketed join + agg on the bucket key must not shuffle")

      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      plain.write.format("noop").mode("overwrite").save()
      assert(shuffles(plain) > 0, "unbucketed control should shuffle")

      // same rows either way
      assert(bJoin.count() === plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
