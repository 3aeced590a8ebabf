package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact weighted lower-quantile UDAF (SURVEY §7's custom
  * `Aggregator[IN,BUF,OUT]`): the smallest value v whose cumulative
  * weight reaches α of the total.
  *
  * Input is (value, weight) as integer fixed-point (cents) — the same
  * exactness discipline as [[graft.Num.sumFixed]]: the buffer is a
  * value→weight histogram of exact longs, merge is associative and
  * commutative, so the result is independent of partitioning. Buffer
  * size is bounded by the distinct-value count of the (fixed-decimal)
  * domain; for a continuous domain swap the histogram for a mergeable
  * quantile sketch (GK / t-digest) with the same reduce/merge shape —
  * the operator contract is unchanged.
  *
  * Output is the value rescaled to units (v / 100).
  */
case class WeightedQuantile(alpha: Double)
    extends Aggregator[(Long, Long), Map[Long, Long], Double] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], a: (Long, Long)): Map[Long, Long] =
    b.updated(a._1, b.getOrElse(a._1, 0L) + a._2)

  override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
    y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(m: Map[Long, Long]): Double = {
    val thr = alpha * m.values.sum.toDouble
    var c = 0L
    for ((k, w) <- m.toSeq.sortBy(_._1)) {
      c += w
      if (c.toDouble >= thr) return k / 100.0
    }
    Double.NaN
  }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
