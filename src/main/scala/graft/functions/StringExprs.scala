package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over two string columns — the
  * fuzzy-match metric that rewards shared prefixes, complementing
  * `levenshtein` (which charges every transposition) in record-linkage
  * blocking→verify pipelines (q101/q141's machinery, reference
  * dedup-adjacent semantics).
  *
  * Why a native expression: Spark ships no Jaro–Winkler; a Scala UDF
  * would pay String materialization + boxing per pair and fall out of
  * whole-stage codegen. This expression works directly on the
  * `UTF8String` bytes (the candidate data is ASCII; byte-level matching
  * equals codepoint-level there) and the generated code is a single
  * static call, so the surrounding filter/projection stays inside
  * WholeStageCodegen.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (verified
  * bit-identical on 20k real pairs + edge cases, maxdiff 0.0):
  * standard Jaro with match window `max(l1,l2)/2 − 1`, transpositions
  * halved; Winkler prefix boost `+ min(4,prefix)·0.1·(1−jaro)` applied
  * only when jaro > 0.7; BOTH-empty returns 0.0 (DuckDB's convention,
  * not the classic 1.0).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs two string args, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.getBytes
    val s2 = u2.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (p < pmax && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column-level entry point. */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
