package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query plans and executes on sf0.001") {
    val allowEmpty = Set("q08_anti_join_customers")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      assert(n >= 0 && (n > 0 || allowEmpty(name)), s"$name returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q01 groups by (returnflag, linestatus)") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val qty = rows.map(_.getAs[Double]("sum_qty"))
    assert(qty.forall(_ > 0))
  }

  test("q20 theta join counts C(5,2) nation pairs per region") {
    val rows = SparkEntry.queries("q20_theta_join")(spark, sf).collect()
    assert(rows.length == 5 && rows.forall(_.getAs[Long]("pairs") == 10L))
  }

  test("q24 fraction is a valid ratio") {
    val r = SparkEntry.queries("q24_metric_scalar")(spark, sf).collect().head
    val f = r.getAs[Double]("frac_high")
    assert(f >= 0.0 && f <= 1.0)
  }

  test("q01 plan pushes the shipdate filter into the parquet scan") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filter in plan:\n$plan")
  }
}
