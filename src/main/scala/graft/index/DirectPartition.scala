package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Sample-free exact partition routing for Dataset shuffles.
  *
  * `repartitionByRange` runs a full sampling pass over its input to pick
  * boundaries — on the index build that re-executed the entire posting
  * stream once per build (measured ~18 s / +40% CPU at 1 M turns). When
  * the partition of a row is a CLOSED-FORM function of its columns (here:
  * dense docIds with known ranges), sampling buys nothing. Spark's
  * `repartition(n, expr)` places a row in `pmod(murmur3(expr), n)`; we
  * invert that map once (driver-side, no job) and route each desired
  * partition id through a key that hashes onto it. One shuffle, zero
  * extra passes, balance guaranteed by the pid formula instead of by a
  * sample.
  */
object DirectPartition {

  /** Hard cap on the inverse-key table (round-2 review: the coupon-
    * collector search is ~n·ln n hash evals and the lookup is one
    * n-element array literal in the plan — fine to 64k, a driver stall
    * beyond). Above this, route through a custom ShuffleExchangeExec
    * partitioner instead; callers (IndexBuilder) clamp their partition
    * counts to this and let the per-partition external sorter absorb the
    * larger slices by spilling.
    */
  val MaxParts: Int = 1 << 16

  /** keys(p) hashes to partition p under HashPartitioning(numParts).
    * The probe hash is the same Murmur3 kernel Catalyst's Murmur3Hash
    * dispatches to for an int column (seed 42) — pinned against the
    * interpreted expression by EngineSpec — so the coupon-collector
    * search is plain int ops, not interpreted expression evals.
    */
  def inverseHashKeys(numParts: Int): Array[Int] = {
    require(numParts <= MaxParts,
      s"numParts=$numParts > $MaxParts: use a custom shuffle partitioner above this")
    val keys = new Array[Int](numParts)
    val found = new Array[Boolean](numParts)
    var remaining = numParts
    var k = 0
    while (remaining > 0) {
      // exactly HashPartitioning.partitionIdExpression: pmod(murmur3(k, seed=42), n)
      val pid = java.lang.Math.floorMod(Murmur3_x86_32.hashInt(k, 42), numParts)
      if (!found(pid)) { found(pid) = true; keys(pid) = k; remaining -= 1 }
      k += 1
    }
    keys
  }

  /** Repartition `df` so every row lands exactly in partition `pidCol`
    * (values must be in [0, numParts)). The routing key is evaluated as a
    * bare partitioning expression — it is never materialized into the
    * shuffled rows — and the key table is ONE array literal (typedLit),
    * not numParts scalar literals.
    */
  def byComputedPid(df: DataFrame, pidCol: Column, numParts: Int): DataFrame = {
    val lookup = typedLit(inverseHashKeys(numParts).toSeq)
    df.repartition(numParts, element_at(lookup, pidCol.cast("int") + lit(1)))
  }
}
