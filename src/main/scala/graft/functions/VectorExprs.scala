package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native dot product over two `array<float>` columns, accumulated in
  * double, with whole-stage codegen (`doGenCode`).
  *
  * Why not a higher-order function or a Scala UDF: `aggregate(zip_with(...))`
  * is a CodegenFallback chain evaluated interpretively per row (~13µs/pair
  * measured on 64-dim vectors at sf0.1), and a Scala UDF pays
  * `Seq[Float]` boxing on every element. This expression reads the
  * primitive `ArrayData` buffers directly inside generated code — the same
  * loop shape MLlib's BLAS.dot uses — and keeps the surrounding projection
  * inside WholeStageCodegen. Summation order is left-to-right, matching
  * both the HOF formulation and the DuckDB oracle's sequential sum.
  *
  * If the arrays differ in length the extra tail is ignored (min length),
  * mirroring `zip_with`'s null-padding-then-drop semantics for the product.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot needs two array<float> args, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot product over two `array<bigint>` columns — the
  * scoring kernel for int8-quantized embeddings (q194). Quantized cosine
  * is Σ qaᵢ·qbᵢ / (√Σ qaᵢ² · √Σ qbᵢ²): every sum is exact 64-bit integer
  * arithmetic (|q| ≤ 127 ⇒ a 4096-dim dot stays < 2²⁶ — overflow needs
  * dims ≈ 2⁴⁹), which is what makes a quantized ANN hash-checkable
  * against a SQL oracle. Same codegen shape as [[FloatDot]]: primitive
  * `ArrayData` reads inside WholeStageCodegen, shorter-array truncation.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot needs two array<bigint> args, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane SimHash over an `array<float>` embedding, as one
  * codegen'd pass — the LSH signature for embedding near-dup candidate
  * generation (Charikar 2002 shape).
  *
  * Determinism across engines is the design constraint: the DuckDB oracle
  * must reproduce every bit. So the "hyperplanes" are integer lattices and
  * the whole computation is exact 64-bit integer math:
  *
  *   q_i      = round(v_i * 1000)                 (the ONLY float op; ties
  *                                                 impossible for float
  *                                                 inputs — (k+.5)/1000 is
  *                                                 never a dyadic rational)
  *   g(j,i)   = (a_j * i + b_j) mod P             (P = 2^31-1, i is 1-based)
  *   r(j,i)   = (g² mod P) - (P-1)/2              (quadratic-residue mix —
  *                                                 a PLAIN affine lattice
  *                                                 leaves bits correlated
  *                                                 and buckets degenerate;
  *                                                 measured: 70k candidate
  *                                                 pairs vs 46 on sf0.01)
  *   bit_j    = [ Σ_i q_i · r(j,i) ≥ 0 ]
  *
  * No overflow: |q| ≤ ~10⁶, |r| < 2³⁰, n ≤ 4096 keeps the dot sum far from
  * 2⁶³. Bits ≤ 62 keeps the signature non-negative so band extraction can
  * use div/mod identically in Spark and DuckDB SQL.
  */
case class EmbedSimHash(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 62, s"bits must be in 1..62, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"embed_simhash needs an array<float> arg, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "embed_simhash"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = Math.round(arr.getFloat(i).toDouble * 1000.0)
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      val aj = (104729L * (j + 1) + 7L) % EmbedSimHash.P
      val bj = (15485863L * (j + 1) + 11L) % EmbedSimHash.P
      var dot = 0L
      i = 0
      while (i < n) {
        val g = (aj * (i + 1) + bj) % EmbedSimHash.P
        dot += q(i) * ((g * g % EmbedSimHash.P) - EmbedSimHash.Half)
        i += 1
      }
      if (dot >= 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val aj = ctx.freshName("aj")
      val bj = ctx.freshName("bj")
      val g = ctx.freshName("g")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $x.numElements();
         |final long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $q[$i] = java.lang.Math.round((double) $x.getFloat($i) * 1000.0);
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  final long $aj = (104729L * ($j + 1) + 7L) % ${EmbedSimHash.P}L;
         |  final long $bj = (15485863L * ($j + 1) + 11L) % ${EmbedSimHash.P}L;
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $g = ($aj * ($i + 1) + $bj) % ${EmbedSimHash.P}L;
         |    $dot += $q[$i] * (($g * $g % ${EmbedSimHash.P}L) - ${EmbedSimHash.Half}L);
         |  }
         |  if ($dot >= 0L) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbedSimHash {
  val P: Long = 2147483647L // 2^31 - 1, Mersenne prime
  val Half: Long = (P - 1) / 2

  /** SQL fragment for bit j's hyperplane dot — the DuckDB mirror of the
    * generated code above, over (i 1-based, q) exploded embedding rows.
    */
  def bitDotSql(j: Int, iCol: String, qCol: String): String = {
    val a = (104729L * (j + 1) + 7L) % P
    val b = (15485863L * (j + 1) + 11L) % P
    s"sum($qCol * ((((($a*$iCol+$b) % $P) * (($a*$iCol+$b) % $P)) % $P) - $Half))"
  }
}

/** Morton (z-order) interleave of the low 16 bits of two BIGINT keys —
  * the production form of q179's generated shift/mask SQL, as ONE
  * codegen'd expression: `morton32(x, y)` spreads each 16-bit input to
  * even/odd bit positions with four magic-mask rounds (O(log w), not the
  * SQL form's 32 shift terms) and ORs them into a 32-bit z-value. The
  * write path (`repartitionByRange(morton32(a, b)) .sortWithinPartitions`)
  * clusters files into 2-D key rectangles for min/max skipping —
  * SinkSpec pins the layout, and q179's DuckDB oracle (which keeps the
  * portable shift/mask formulation) hash-proves this expression
  * bit-equal to the reference arithmetic over the whole table.
  */
case class Morton32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton32 needs two bigint args, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton32"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Morton32.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.Morton32.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Morton32 {
  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…,30). */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code: bits of `x` at odd positions, `y` at even —
    * matching q179's `(x_bit << 2i+1) | (y_bit << 2i)` SQL layout.
    * Called from both the interpreted eval and the generated code, so
    * the two paths cannot diverge. */
  def interleave(x: Long, y: Long): Long =
    (spread(x) << 1) | spread(y)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** Σᵢ a[i]·b[i] in double; null if either array is null. */
  def float_dot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm of an `array<float>` column. */
  def float_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(float_dot(a, a))
  }

  /** `bits`-bit random-hyperplane SimHash of an `array<float>` column. */
  def embed_simhash(a: Column, bits: Int): Column =
    Bridge.column(EmbedSimHash(Bridge.expression(a), bits))

  /** 32-bit Morton interleave of two BIGINT key columns (low 16 bits). */
  def morton32(a: Column, b: Column): Column =
    Bridge.column(Morton32(Bridge.expression(a), Bridge.expression(b)))

  /** Σᵢ a[i]·b[i] as BIGINT over two `array<bigint>` columns (q194). */
  def long_dot(a: Column, b: Column): Column =
    Bridge.column(LongDot(Bridge.expression(a), Bridge.expression(b)))
}
