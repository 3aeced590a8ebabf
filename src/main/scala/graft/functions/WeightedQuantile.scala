package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact weighted lower-quantile UDAF (SURVEY §7's custom
  * `Aggregator[IN,BUF,OUT]`): the smallest value v whose cumulative
  * weight reaches α of the total.
  *
  * Input is (value, weight) as integer fixed-point (cents) — the same
  * exactness discipline as [[graft.Num.sumFixed]]: the buffer is a
  * value→weight histogram of exact longs, merge is associative and
  * commutative, so the result is independent of partitioning.
  *
  * Buffer: a MUTABLE HashMap updated in place. Object aggregation holds
  * the buffer as a live JVM object between input rows, so per-row reduce
  * is one hash probe with zero allocation (the r2 immutable `Map.updated`
  * built a fresh map node per row — measurable churn on wide groups).
  * Kryo-encodes only at the partial→final exchange, where a histogram
  * serializes once per partition, not per row. Buffer size is bounded by
  * the distinct-value count of the (fixed-decimal) domain; for a
  * continuous domain swap the histogram for a mergeable quantile sketch
  * (GK / t-digest) with the same reduce/merge shape — the operator
  * contract is unchanged.
  *
  * Output is the value rescaled to units (v / 100).
  */
case class WeightedQuantile(alpha: Double)
    extends Aggregator[(Long, Long), mutable.HashMap[Long, Long], Double] {

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[Long, Long],
      a: (Long, Long)): mutable.HashMap[Long, Long] = {
    b.update(a._1, b.getOrElse(a._1, 0L) + a._2)
    b
  }

  override def merge(x: mutable.HashMap[Long, Long],
      y: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    // fold the smaller histogram into the larger: merge cost tracks the
    // smaller side regardless of partial-aggregation order
    val (into, from) = if (x.size >= y.size) (x, y) else (y, x)
    from.foreach { case (k, v) => into.update(k, into.getOrElse(k, 0L) + v) }
    into
  }

  override def finish(m: mutable.HashMap[Long, Long]): Double = {
    val thr = alpha * m.valuesIterator.sum.toDouble
    var c = 0L
    for ((k, w) <- m.toSeq.sortBy(_._1)) {
      c += w
      if (c.toDouble >= thr) return k / 100.0
    }
    Double.NaN
  }

  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
    Encoders.kryo[mutable.HashMap[Long, Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
