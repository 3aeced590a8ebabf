package org.apache.spark.ml.graftshim

import org.apache.spark.ml.tree.LeafNode

/** Read-only bridge to tree internals MLlib keeps `private[ml]`.
  *
  * [[org.apache.spark.ml.classification.RandomForestClassificationModel]]
  * votes with each leaf's class-count vector
  * (`leaf.impurityStats.stats`, normalized per tree — see `predictRaw`),
  * but both `LeafNode.impurityStats` and `ImpurityCalculator` are
  * package-private to `org.apache.spark.ml`. Compiling a fitted RF into a
  * portable SQL scorer (graft.ml.TreeSql) needs those counts, so this
  * object lives inside the `ml` package namespace purely to re-export
  * them as a plain `Array[Double]`. Nothing is mutated; the returned
  * array is a defensive copy.
  */
object TreeInternals {
  /** Per-class (weighted) instance counts at a leaf — the `stats` vector
    * RF's `predictRaw` divides by its own sum before summing over trees. */
  def leafClassCounts(l: LeafNode): Array[Double] = l.impurityStats.stats.clone()
}
