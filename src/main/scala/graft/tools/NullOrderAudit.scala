package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  CaseWhen, Coalesce, Expression, If, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit,
  Join, LocalLimit, LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}

/** Board-wide static audit for the NULL-ordering divergence class (r9
  * verdict item 7): Spark orders NULL last on DESC where DuckDB orders it
  * first, so any rank/row_number/lag window — or any top-k Sort under a
  * Limit — whose ORDER BY key can actually BE null diverges between the
  * engines the moment a data regeneration produces one.
  *
  * Raw plan nullability is useless here (every parquet column reads as
  * nullable), so the audit traces each sort key back through
  * Project/Aggregate/Window aliases to its defining expression tree and
  * flags only genuine NULL INTRODUCERS on the path:
  *   - CaseWhen without an else (the `when(den > 0, x)` guard idiom —
  *     exactly what the r9 div-zero sweep added board-wide);
  *   - explicit null literals in any branch;
  *   - If with a null branch;
  *   - attributes supplied by the null-producing side of an outer join;
  * and suppresses the flag when the introducer sits under a Coalesce.
  * Output is a triage list; per-query dispositions live in COVERAGE.md.
  */
object NullOrderAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.contains("stream") || n.contains("_ml_"))
    var flagged = 0
    for (q <- names) {
      try {
        val hits = audit(graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.optimizedPlan)
        if (hits.nonEmpty) { flagged += 1
          println(s"$q:\n  ${hits.mkString("\n  ")}") }
      } catch {
        case e: Throwable => println(s"$q: AUDIT-ERROR ${e.getMessage}")
      }
    }
    println(s"[null-order-audit] $flagged queries with null-introducing sort keys")
    spark.stop()
  }

  /** Audit one optimized logical plan; also the PlanSpec board gate. */
  def audit(plan: LogicalPlan): Seq[String] = {
      val defMap = plan.collect {
        case p: Project =>
          p.projectList.collect { case a: Alias => a.exprId -> a.child }
        case a: Aggregate =>
          a.aggregateExpressions.collect {
            case al: Alias => al.exprId -> al.child }
        case w: Window =>
          w.windowExpressions.collect {
            case al: Alias => al.exprId -> al.child }
      }.flatten.toMap

      // outer-join-nullable attrs are computed PER CONSUMING NODE from its
      // own subtree: an outer join sitting ABOVE a window reuses the same
      // exprIds but cannot null that window's inputs (the q111/q328 false-
      // positive class found while triaging the first cut of this audit)
      def outerBelow(node: LogicalPlan): Set[Long] = node.collect {
        case j: Join => j.joinType match {
          case LeftOuter => j.right.output.map(_.exprId.id)
          case RightOuter => j.left.output.map(_.exprId.id)
          case FullOuter => j.output.map(_.exprId.id)
          case _ => Nil
        }
      }.flatten.toSet

      // walk an expression; returns the null-introducer descriptions found.
      // Coalesce repairs a null; CASE/IF *predicates* cannot surface one
      // (only the value branches can) — the q195 lag-isNull-test class.
      def introducers(e: Expression, depth: Int,
          outer: Set[Long]): Seq[String] = e match {
        case _ if depth > 12 => Nil
        case _: Coalesce => Nil
        case c: CaseWhen =>
          val noElse =
            if (c.elseValue.isEmpty ||
              c.elseValue.exists(_ == Literal(null, c.dataType)))
              Seq("guarded CASE (no else)") else Nil
          noElse ++ (c.branches.map(_._2) ++ c.elseValue)
            .flatMap(v => introducers(v, depth + 1, outer))
        case If(_, t, f) =>
          val nullBranch =
            if (t == Literal(null, t.dataType) || f == Literal(null, f.dataType))
              Seq("IF with null branch") else Nil
          nullBranch ++ Seq(t, f).flatMap(v => introducers(v, depth + 1, outer))
        case l: Literal if l.value == null => Seq("null literal")
        case ar: AttributeReference =>
          val here =
            if (outer.contains(ar.exprId.id))
              Seq(s"outer-join side attr ${ar.name}") else Nil
          here ++ defMap.get(ar.exprId).toSeq
            .flatMap(d => introducers(d, depth + 1, outer))
        case other =>
          other.children.flatMap(c => introducers(c, depth + 1, outer))
      }

      // an EXPLICIT non-default null placement (e.g. desc_nulls_first) is
      // an authored, engine-pinned choice — not a latent divergence
      def explicitNulls(o: SortOrder): Boolean =
        o.nullOrdering != o.direction.defaultNullOrdering

      def bad(node: LogicalPlan, os: Seq[SortOrder],
          kind: String): Seq[String] = {
        val outer = outerBelow(node)
        os.filterNot(explicitNulls)
          .flatMap(o => introducers(o.child, 0, outer).distinct
            .map(i => s"$kind key=${o.child.sql.take(60)} <- $i"))
      }
      plan.collect {
        case w: Window => bad(w, w.orderSpec, "window")
        case g @ GlobalLimit(_, LocalLimit(_, s: Sort)) =>
          bad(g, s.order, "topk")
      }.flatten.distinct
  }
}
