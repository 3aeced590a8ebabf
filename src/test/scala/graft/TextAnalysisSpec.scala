package graft

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the Misra–Gries candidate pass behind q121 that the oracle
  * hash-match exercises only incidentally: the sketch must NEVER drop a true
  * heavy hitter (the superset guarantee is what makes the exact recount
  * correct), and its memory must stay bounded by the capacity k.
  */
class TextAnalysisSpec extends AnyFunSuite {
  import graft.operators.TextAnalysis.misraGries

  test("MG survives every item with partition count > N/(k+1), size <= k") {
    // adversarial interleave: one heavy item inside a flood of distinct
    // singletons (the worst case for counter eviction)
    val n = 10000
    val stream = (0 until n).map(i => if (i % 5 == 0) "HEAVY" else s"u$i")
    val out = misraGries(stream.iterator, 9).toSet
    // count(HEAVY) = 2000 > 10000/10 = N/(k+1) -> must survive
    assert(out.contains("HEAVY"))
    assert(out.size <= 9)
  }

  test("per-partition MG union is a superset of global heavy hitters") {
    // mirrors q121's shape: phi = 1/500, k = 1024 > 1/phi - 1, stream
    // split across 4 "partitions" by deterministic index hash
    val heavies = (1 to 5).map(h => s"h$h")
    val noise = (1 to 7000).map(i => s"n$i")
    val stream = heavies.flatMap(h => Seq.fill(600)(h)) ++ noise
    val parts = stream.zipWithIndex.groupBy { case (_, i) => (i * 2654435761L) % 4 }
      .values.map(_.map(_._1))
    val union = parts.flatMap(p => misraGries(p.iterator, 1024)).toSet
    val nTot = stream.size
    val exact = stream.groupBy(identity).collect {
      case (g, xs) if xs.size * 500L >= nTot => g
    }.toSet
    assert(exact.nonEmpty, "planted heavies must clear the threshold")
    assert(exact.subsetOf(union),
      s"missing heavy hitters: ${exact.diff(union)}")
  }

  test("MG exact-count phase equals a straight groupBy on a planted stream") {
    // end-to-end shape check without Spark: candidates from MG, then exact
    // recount restricted to candidates, must equal the full exact answer
    val stream = (1 to 3).flatMap(h => Seq.fill(100)(s"h$h")) ++
      (1 to 500).map(i => s"n$i")
    val nTot = stream.size // 800, T = ceil(800/500) -> cnt*500 >= 800
    val cand = misraGries(stream.iterator, 1024).toSet
    val fromCand = stream.filter(cand).groupBy(identity)
      .collect { case (g, xs) if xs.size * 500L >= nTot => g -> xs.size }
    val full = stream.groupBy(identity)
      .collect { case (g, xs) if xs.size * 500L >= nTot => g -> xs.size }
    assert(fromCand.toMap == full.toMap)
  }
}
