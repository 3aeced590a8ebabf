package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side (sink) coverage: the engine's output contract at 100 TB is
  * partitioned, size-bounded parquet — partition directories for
  * predicate pruning, `maxRecordsPerFile` so downstream readers never see
  * monster files, and lossless round-trips. The read side is pinned all
  * over PlanSpec; this suite pins the writer layout itself.
  */
class SinkSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(tag: String): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory(s"graft_sink_$tag").toFile
    f.deleteOnExit(); f
  }

  test("partitioned write: hive layout, bounded files, lossless round-trip") {
    val out = freshDir("part").getAbsolutePath
    val src = Tables.t(spark, sf, "events")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    src.repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("ts"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 500)
      .partitionBy("event_type")
      .parquet(out)

    // hive-style partition directories, one per event type
    val dirs = new java.io.File(out).listFiles
      .filter(_.isDirectory).map(_.getName).sorted
    val types = src.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).map(t => s"event_type=$t").sorted
    assert(dirs.toSeq == types.toSeq, "one directory per partition value")

    // every data file respects the maxRecordsPerFile bound
    def parquetFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(parquetFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    parquetFiles(new java.io.File(out)).foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 500, s"${f.getName}: $n rows exceeds maxRecordsPerFile")
    }

    // lossless: per-type counts and exact cent-sums survive the round-trip
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(digest(spark.read.parquet(out)) == digest(src))

    // the partition column prunes at the scan on read-back
    val plan = spark.read.parquet(out)
      .filter(col("event_type") === "purchase")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "partition filter must prune directories, not rows")
  }

  test("compressed write round-trips losslessly (zstd)") {
    val out = freshDir("zstd").getAbsolutePath
    val src = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    src.write.mode("overwrite").option("compression", "zstd").parquet(out)
    val back = spark.read.parquet(out)
    val a = back.agg(count(lit(1)),
      sum(round(col("l_quantity") * 100).cast("long"))).collect()(0)
    val b = src.agg(count(lit(1)),
      sum(round(col("l_quantity") * 100).cast("long"))).collect()(0)
    assert(a == b)
    assert(new java.io.File(out).listFiles
      .exists(_.getName.contains(".zstd.parquet")), "zstd codec in file name")
  }

  test("z-ordered write: per-file zval ranges are non-overlapping and 2-D-bounded") {
    // closes q179's loop with a real layout: repartitionByRange(zval) +
    // sortWithinPartitions(zval) must yield files whose zval ranges are
    // DISJOINT (range partitioning) — which is exactly what makes
    // per-file min/max stats selective on the interleaved key, and via
    // the Morton property bounds BOTH original dimensions per file
    val z = (0 until 16).map(i =>
      s"((((pk >> $i) & 1)) << ${2 * i + 1}) | ((((sk >> $i) & 1)) << ${2 * i})")
      .mkString(" | ")
    val out = freshDir("zorder").getAbsolutePath
    Tables.t(spark, sf, "lineitem")
      .selectExpr("CAST(l_partkey & 65535 AS BIGINT) AS pk",
        "CAST(l_suppkey & 65535 AS BIGINT) AS sk")
      .selectExpr(s"($z) AS zval", "pk", "sk")
      .repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(out)

    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zval")).as("zlo"), max(col("zval")).as("zhi"),
        min(col("pk")).as("plo"), max(col("pk")).as("phi"))
      .collect()
    assert(perFile.length >= 4, s"expected >=4 files, got ${perFile.length}")
    val ranges = perFile.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping zval ranges: $hi1 > $lo2")
      case _ =>
    }
    // 2-D locality: total pk-span across files must beat one global span
    // by a wide margin (each file covers a small pk window, not the table)
    val spans = perFile.map(r => r.getLong(4) - r.getLong(3))
    val globalSpan = perFile.map(_.getLong(4)).max - perFile.map(_.getLong(3)).min
    assert(spans.max < globalSpan,
      s"no file may span the whole pk domain (${spans.max} vs $globalSpan)")
  }
}
