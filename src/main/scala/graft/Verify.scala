package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name prefixes (local subset runs)
    val keep: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(','); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nOk, nFail = 0
    val failedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try { fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name"); nOk += 1 }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        nFail += 1; failedNames += name
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // r11: includes fit-dependent oracles (compiled tree scorers) — the
    // generators run AFTER the query pass above, so in a full run they
    // reuse the memoized SQL of the exact models the parquet was scored
    // with; a subset run only generates for the kept queries (re-fitting
    // deterministically if the memo is cold).
    val oracles = SparkEntry.oracleSqlFor(spark, sfDir, keep)
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // VERIFY_SUMMARY.json (r9 verdict item 3): tail-proof headline written
    // by the harness itself — execution counts only; the value compare
    // lives in the driver's DuckDB pass / tools/check_oracle.py. Full runs
    // only, so a subset probe can't overwrite the board's numbers.
    if (args.length <= 2)
      Files.writeString(Paths.get("VERIFY_SUMMARY.json"),
        s"""{"n_executed":${nOk + nFail},"n_ok":$nOk,"n_failed":$nFail,""" +
          s""""failed":${failedNames.map("\"" + _ + "\"")
            .mkString("[", ",", "]")},""" +
          s""""n_oracle":${oracles.size},"sf":"$sfDir"}""" + "\n")
    spark.stop()
  }
}
