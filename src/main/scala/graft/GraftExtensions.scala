package graft

import graft.functions.{EmbedSimHash, FloatDot, JaroWinkler, LongDot, Morton32}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal, Sqrt}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Engine extension injector: registers the native expressions so SQL
  * users get them too (`SELECT float_dot(a, b)`), not just the Column
  * API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` on the session builder; for an
  * already-built session, [[graft.GraftExtensions.functions]] can be
  * registered through `Bridge.registerFunction` (extensions only apply at
  * session construction).
  *
  * Registered surface:
  *  - `float_dot(a, b)`        — native codegen'd Σ aᵢ·bᵢ over array<float>
  *  - `float_norm(a)`          — L2 norm, expands to sqrt(float_dot(a, a))
  *  - `embed_simhash(a, bits)` — random-hyperplane LSH signature; `bits`
  *                               must be a foldable integer literal (it
  *                               shapes the generated code, like the
  *                               Column API's Int parameter)
  *  - `jaro_winkler(a, b)`     — native Jaro–Winkler similarity, pinned
  *                               to DuckDB's semantics
  *  - `morton32(x, y)`         — z-order interleave of two BIGINT keys
  *                               (low 16 bits each), the layout key for
  *                               2-D min/max data skipping (q179)
  *  - `long_dot(a, b)`         — native codegen'd Σ aᵢ·bᵢ over
  *                               array<bigint> (int8-quantized scoring)
  *  - `bloom_agg(h[, n[, bits]])` — Spark's own `BloomFilterAggregate`
  *                               (the sketch `InjectRuntimeFilter` builds
  *                               for runtime row-filters), surfaced as a
  *                               SQL aggregate over xxhash64 longs
  *  - `bloom_contains(bf, h)`  — codegen'd `BloomFilterMightContain`
  *                               probe; `bf` must be a constant or a
  *                               scalar subquery (the engine inserts the
  *                               built sketch exactly once)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, clazz, build) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        build))
    }
    // optimizer surface: strength-reduce naive edit-distance predicates
    // (full-DP levenshtein <= k → length prefilter + k-banded DP)
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinPrefilter)
  }
}

object GraftExtensions {

  /** The SQL function surface: (name, implementing class, builder). */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("float_dot", classOf[FloatDot], { children: Seq[Expression] =>
      require(children.length == 2, "float_dot takes exactly 2 arguments")
      FloatDot(children.head, children(1))
    }),
    ("float_norm", classOf[FloatDot], { children: Seq[Expression] =>
      require(children.length == 1, "float_norm takes exactly 1 argument")
      Sqrt(FloatDot(children.head, children.head))
    }),
    ("embed_simhash", classOf[EmbedSimHash], { children: Seq[Expression] =>
      require(children.length == 2, "embed_simhash takes exactly 2 arguments")
      val bits = children(1) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case e if e.foldable => e.eval() match {
          case i: Int  => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"embed_simhash bits must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "embed_simhash bits must be a foldable integer literal")
      }
      EmbedSimHash(children.head, bits)
    }),
    ("jaro_winkler", classOf[JaroWinkler], { children: Seq[Expression] =>
      require(children.length == 2, "jaro_winkler takes exactly 2 arguments")
      JaroWinkler(children.head, children(1))
    }),
    ("morton32", classOf[Morton32], { children: Seq[Expression] =>
      require(children.length == 2, "morton32 takes exactly 2 arguments")
      Morton32(children.head, children(1))
    }),
    ("long_dot", classOf[LongDot], { children: Seq[Expression] =>
      require(children.length == 2, "long_dot takes exactly 2 arguments")
      LongDot(children.head, children(1))
    }),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain as the
    // internal machinery behind InjectRuntimeFilter but registers no SQL
    // names for them; surfacing the pair makes the asymmetric-membership
    // prefilter (q192) expressible as one declarative plan — sketch built
    // by an uncorrelated scalar subquery, probe codegen'd into the scan
    // projection, the exact mechanism of Spark's own runtime row-filters.
    ("bloom_agg", classOf[BloomFilterAggregate], { children: Seq[Expression] =>
      require(children.nonEmpty && children.length <= 3,
        "bloom_agg takes 1-3 arguments: value[, estimatedItems[, numBits]]")
      val agg = children.length match {
        case 1 => new BloomFilterAggregate(children.head)
        case 2 => new BloomFilterAggregate(children.head, children(1))
        case _ => new BloomFilterAggregate(children.head, children(1), children(2))
      }
      agg.toAggregateExpression()
    }),
    ("bloom_contains", classOf[BloomFilterMightContain], { children: Seq[Expression] =>
      require(children.length == 2, "bloom_contains takes exactly 2 arguments")
      BloomFilterMightContain(children.head, children(1))
    }))

  /** Idempotently install the SQL surface on an ALREADY-BUILT session
    * (the extensions injector only runs at session construction; queries
    * that go through the SQL names call this first so they work on any
    * driver-provided session).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, build) =>
      Bridge.registerFunction(spark, name, build)
    }
}
