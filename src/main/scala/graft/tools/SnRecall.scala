package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational}

/** Measured recall of the sorted-neighborhood candidate generation
  * (r12 verdict task 5, and the r13 rework it triggered).
  *
  * r12 replaced the part-pair family's all-pairs-per-block candidate
  * generation (quadratic on the dictionary-bounded (brand, type) key;
  * sf1 slopes 1.73–1.87) with a ROW-level sorted-neighborhood window
  * (W = 15). Measuring its recall for this artifact showed the fuzzy
  * matchers starving: board part names are a small dictionary repeated
  * in short runs, so a ≤ 15-ROW window spans only ~6 distinct names —
  * q101 retained 9.4% of the all-pairs matches and q142 returned the
  * empty set at every SF. r13 moved the fuzzy matchers to NAME-level
  * two-pass SN ([[Relational.snNamePairs]]) and this tool now measures,
  * per affected query at a given SF:
  *
  *   recall = |shipped candidate pairs passing the query's own match
  *             predicate| / |all-pairs-per-block pairs passing it|
  *
  * Match predicates (each query's own acceptance threshold):
  *   q101/q141: |Δlen| ≤ 2, 1 ≤ levenshtein ≤ 2 (distinct names)
  *   q142:      names differ, jaro_winkler ≥ 0.93
  *   q216:      Fellegi–Sunter score ≥ 8 (the `link` class) — candidate
  *              POPULATION stays the row-level window by design (the
  *              identical-name pair mass must stay bounded; see the
  *              name-level SN block comment in Relational)
  *   q231:      same FS score ≥ 8 over the TARGET side
  *   q249:      EM posterior ≥ 0.5 under the declared priors
  * For q141 the tool also reports entity agreement: the fraction of
  * truth entities (connected components over all-pairs matches) whose
  * exact member set survives under the shipped edge set.
  *
  * All-pairs is quadratic per block — acceptable here because this is a
  * driver-side measurement instrument run at sf ≤ 0.1, never a query
  * path.
  *
  * Usage: runMain graft.tools.SnRecall [sfDir] — prints one JSON line.
  */
object SnRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = measure(spark, d)
    val qjson = m.map { case (k, (t, sn, extra)) =>
      val rec = if (t == 0L) 1.0 else sn.toDouble / t
      val ex = extra.map { case (ek, ev) => s""","$ek":$ev""" }.getOrElse("")
      s""""$k":{"truth":$t,"kept":$sn,"recall":${f"$rec%.4f"}$ex}"""
    }.mkString(",")
    println(s"""{"sf":"$d","sn_w":${Relational.SnW},"queries":{$qjson}}""")
    spark.stop()
  }

  /** name → (truth matches, shipped matches kept, optional extra). */
  def measure(s: SparkSession, d: String)
      : Seq[(String, (Long, Long, Option[(String, String)]))] = {
    val r = Relational.snRanked(s, d).cache()
    val a = r.select(col("p_brand").as("brand"), col("p_type").as("ptype"),
      col("p_partkey").as("da"), col("p_name").as("name_a"),
      col("p_size").as("size_a"), col("cents").as("cents_a"),
      col("rk").as("rk_a"))
    val b = r.select(col("p_brand").as("brand"), col("p_type").as("ptype"),
      col("p_partkey").as("db"), col("p_name").as("name_b"),
      col("p_size").as("size_b"), col("cents").as("cents_b"),
      col("rk").as("rk_b"))
    // the pre-r12 truth: EVERY ordered pair per block (rk_b > rk_a)
    val allPairs = a.join(b, Seq("brand", "ptype"))
      .filter(col("rk_b") > col("rk_a"))
    val inRowWin = col("rk_b") <= col("rk_a") + Relational.SnW

    def fuzzy(p: DataFrame): DataFrame = p
      .filter(col("name_a") =!= col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      .filter(levenshtein(col("name_a"), col("name_b"), 2) >= 1)

    def jw(p: DataFrame): DataFrame = {
      import graft.functions.JaroWinkler.jaro_winkler
      p.filter(col("name_a") =!= col("name_b"))
        .filter(jaro_winkler(col("name_a"), col("name_b")) >= 0.93)
    }

    // Fellegi–Sunter score with the SHARED constants and the same
    // data-estimated size-u weight as q216/q231
    val uSize = graft.Tables.t(s, d, "part")
      .groupBy(col("p_size")).agg(count(lit(1)).as("c"))
      .agg(when(sum(col("c")) > 1L,
        sum(col("c") * (col("c") - 1)).cast("double") /
          (sum(col("c")).cast("double") *
            (sum(col("c")) - 1).cast("double"))).as("u_size"))
      .select(
        when(col("u_size") > 0.0,
          round(log2(lit(Relational.fsMSize) / col("u_size")), 8))
          .as("wa_size"),
        when(col("u_size") < 1.0,
          round(log2(lit(1.0 - Relational.fsMSize) /
            (lit(1.0) - col("u_size"))), 8)).as("wd_size"))
    def fs(p: DataFrame): DataFrame = p
      .crossJoin(broadcast(uSize))
      .withColumn("score",
        when(col("size_a") === col("size_b"), col("wa_size"))
          .otherwise(col("wd_size")) +
        when(size(array_intersect(split(col("name_a"), " "),
            split(col("name_b"), " "))) >= Relational.fsTokMin,
          lit(Relational.lg2(
            Relational.fsMName / Relational.fsUName).toDouble))
          .otherwise(lit(Relational.lg2((1 - Relational.fsMName) /
            (1 - Relational.fsUName)).toDouble)) +
        when(abs(col("cents_a") - col("cents_b")) <= 200,
          lit(Relational.lg2(
            Relational.fsMPrice / Relational.fsUPrice).toDouble))
          .otherwise(lit(Relational.lg2((1 - Relational.fsMPrice) /
            (1 - Relational.fsUPrice)).toDouble)))
      .filter(col("score") >= 8.0)

    // EM posterior ≥ 0.5 under the declared priors (q249's wq ≥ 5e8)
    def em(p: DataFrame): DataFrame = {
      val pm = lit(Relational.emP0) *
        when(col("size_a") === col("size_b"), lit(Relational.emM0(0)))
          .otherwise(lit(1.0 - Relational.emM0(0))) *
        when(size(array_intersect(split(col("name_a"), " "),
          split(col("name_b"), " "))) >= Relational.fsTokMin,
          lit(Relational.emM0(1)))
          .otherwise(lit(1.0 - Relational.emM0(1))) *
        when(abs(col("cents_a") - col("cents_b")) <= 200,
          lit(Relational.emM0(2))).otherwise(lit(1.0 - Relational.emM0(2)))
      val pu = lit(1.0 - Relational.emP0) *
        when(col("size_a") === col("size_b"), lit(Relational.emU0(0)))
          .otherwise(lit(1.0 - Relational.emU0(0))) *
        when(size(array_intersect(split(col("name_a"), " "),
          split(col("name_b"), " "))) >= Relational.fsTokMin,
          lit(Relational.emU0(1)))
          .otherwise(lit(1.0 - Relational.emU0(1))) *
        when(abs(col("cents_a") - col("cents_b")) <= 200,
          lit(Relational.emU0(2))).otherwise(lit(1.0 - Relational.emU0(2)))
      p.filter(round(lit(1e9) * (pm / (pm + pu))) >= 5e8)
    }

    // row-window recall for the FS population queries (by-design subsample)
    def rowWinCounts(matches: DataFrame): (Long, Long) = {
      val r = matches.agg(count(lit(1)),
        sum(when(inRowWin, 1L).otherwise(0L))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // shipped-set recall for the fuzzy matchers: |shipped ∩ truth|/|truth|
    // via an exact (da, db) join
    def keptOf(truth: DataFrame, shipped: DataFrame): (Long, Long) = {
      val t = truth.select(col("da"), col("db"))
      val k = t.join(shipped.select(col("da"), col("db")).distinct(),
        Seq("da", "db"), "left_semi").count()
      (t.count(), k)
    }

    val fz = fuzzy(allPairs).cache()
    val fuzzyShipped = Relational.fuzzyPairs(s, d).cache()
    val (fT, fS) = keptOf(fz, fuzzyShipped)

    // q141 entity agreement: exact-member-set survival of truth entities
    val truthComp = Dedup.connectedComponents(
      fz.select(col("da"), col("db")))
    val snComp = Dedup.connectedComponents(
      fuzzyShipped.select(col("da"), col("db")))
    def entities(c: DataFrame): Set[String] =
      c.groupBy(col("comp"))
        .agg(sort_array(collect_list(col("id"))).cast("string").as("ms"))
        .select(col("ms")).collect().map(_.getString(0)).toSet
    val tEnt = entities(truthComp)
    val kept = (tEnt intersect entities(snComp)).size
    fuzzyShipped.unpersist(); fz.unpersist()

    import graft.functions.JaroWinkler.jaro_winkler
    val jwShipped = Relational.expandNamePairs(s, d,
      Relational.snNamePairs(s, d)
        .withColumn("jwv", jaro_winkler(col("name_a"), col("name_b")))
        .filter(col("jwv") >= 0.93))
    val (jT, jS) = keptOf(jw(allPairs), jwShipped)

    val (lT, lS) = rowWinCounts(fs(allPairs))
    val (eT, eS) = rowWinCounts(em(allPairs))
    r.unpersist()

    Seq(
      "q101_fuzzy_name_join" -> (fT, fS, None),
      "q141_entity_resolution" -> (fT, fS, Some("entities_kept" ->
        s"""{"truth":${tEnt.size},"kept":$kept}""")),
      "q142_jaro_winkler_match" -> (jT, jS, None),
      "q216_fs_linkage" -> (lT, lS, None),
      "q231_target_decoy_fdr" -> (lT, lS, None),
      "q249_linkage_em" -> (eT, eS, None))
  }
}
