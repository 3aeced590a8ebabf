package graft

/** Concurrent sweep helper for the board-wide gate tests (r13 verdict
  * task 1: the driver's `sbt test` gate timed out at ~29 min wall).
  *
  * The heavy suites each run one query per registered name sequentially;
  * at sf0.001 every iteration is dominated by driver-side planning plus a
  * handful of micro-stage round-trips, so the loop parallelizes almost
  * perfectly across driver threads (guide §2.6 — actions are only
  * sequential because the calling code is). Each task gets its OWN
  * `newSession()`: temp views, session confs and SQL-conf mutations made
  * by query bodies stay isolated per thread, and the shared SparkContext
  * schedules the overlapping micro-jobs FIFO exactly as BenchConcurrent
  * already exercises.
  *
  * Failures are collected, never thrown mid-pool: the sweep semantics
  * (which names failed, with messages) match the sequential loops they
  * replace.
  */
object ParSweep {
  /** Run `body(name, fn, session)` for every query concurrently on
    * `par` threads; returns the non-None results in name order. */
  def sweep(
      spark: org.apache.spark.sql.SparkSession,
      queries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)],
      par: Int = 8)(
      body: (String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             org.apache.spark.sql.SparkSession) => Option[String]): Seq[String] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    try {
      val futs = queries.map { case (name, fn) =>
        name -> pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] = body(name, fn, spark.newSession())
        })
      }
      futs.flatMap { case (name, f) =>
        try f.get()
        catch { case e: Throwable =>
          Some(s"$name: unexpected harness failure: ${e.getMessage}")
        }
      }
    } finally pool.shutdown()
  }
}
