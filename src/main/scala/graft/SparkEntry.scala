package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full operator inventory is assembled from per-module registries; each
  * module owns a SURVEY §2 slice:
  *   - [[graft.operators.Relational]] — §2.B substrate + §2.C1–C5
  *   - [[graft.operators.Dedup]]      — §2.C6 exact + near-dup dedup
  *   - [[graft.operators.Similarity]] — §2.C7 vector similarity search
  *   - [[graft.operators.TextAnalysis]] — §2.C8 text analysis
  *   - [[graft.operators.Pipeline]]   — training-data pipeline (split/mix/
  *     curation/chunking/packing/decontamination/redaction/capping)
  *   - [[graft.operators.Analytics]]  — sketches, sessionization, metrics
  *   - [[graft.operators.MLQueries]]  — §2.A queries through the gate
  *   - [[graft.operators.Multimodal]] — §2.C9 binary/multimodal plumbing
  *   - [[graft.streaming.EventStreams]] — §2.C10 Structured Streaming
  *   - [[graft.ml]]                   — §2.A LGBMClassifier/LGBMRegressor
  */
object SparkEntry {
  private def modules: Seq[QueryDef] =
    operators.Relational.defs ++ operators.Dedup.defs ++
      operators.TextAnalysis.defs ++ operators.Pipeline.defs ++
      operators.Analytics.defs ++
      operators.Similarity.defs ++ operators.MLQueries.defs ++
      operators.Multimodal.defs ++ streaming.EventStreams.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Static
    * entries only — fit-dependent oracles (compiled tree scorers) need a
    * live session + sf dir; see [[oracleSqlFor]]. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Full oracle map including FIT-DEPENDENT SQL (r11): for queries whose
    * oracle embeds a runtime-fitted model (graft.ml.TreeSql scorers), the
    * generator is evaluated against this session + sf dir. A generator
    * that throws drops its entry — the driver then records the weaker
    * rows-only check for that query instead of failing the dump. `keep`
    * limits which GENERATORS run (static SQL is always included — it is
    * free): a subset Verify probe must not re-fit every ML model and
    * replay q185's streaming pipeline just to dump oracle_sql.json
    * (review finding, r11). */
  def oracleSqlFor(spark: SparkSession, sfDir: String,
      keep: String => Boolean = _ => true): Map[String, String] =
    oracleSql ++ modules.filter(q => keep(q.name)).flatMap { q =>
      q.oracleGen.flatMap { gen =>
        try Some(q.name -> gen(spark, sfDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[oracleGen] ${q.name} failed: ${e.getMessage}")
            None
        }
      }
    }.toMap

  /** query name → owning-module family label, for the per-family rollup in
    * BENCH_SUMMARY.json (r9 verdict item 3: headline numbers must survive
    * driver-side tail truncation as harness-written artifacts). */
  def families: Map[String, String] = Seq(
    "relational" -> operators.Relational.defs,
    "dedup" -> operators.Dedup.defs,
    "text" -> operators.TextAnalysis.defs,
    "pipeline" -> operators.Pipeline.defs,
    "analytics" -> operators.Analytics.defs,
    "similarity" -> operators.Similarity.defs,
    "ml" -> operators.MLQueries.defs,
    "multimodal" -> operators.Multimodal.defs,
    "streaming" -> streaming.EventStreams.defs
  ).flatMap { case (fam, ds) => ds.map(_.name -> fam) }.toMap
}
