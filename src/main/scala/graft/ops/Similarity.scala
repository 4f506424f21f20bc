package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Brute-force cosine top-k is the exactness baseline (one scan +
  * TakeOrderedAndProject — still the right plan when the query set is
  * small and the corpus is scanned once); the LSH-bucketed variant is
  * the scale path: random-hyperplane signatures partition the corpus so
  * a query probes only its bucket neighborhood.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, accumulated in double
    * left-to-right (deterministic order — functions.aggregate over
    * zip_with, all codegen'd).
    */
  def cosineCol(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")), lit(0.0), _ + _)
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na === lit(0.0) || nb === lit(0.0), lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Exact cosine top-k neighbours of `queryVec` (excluding exact self if
    * `excludeId` >= 0).
    */
  def bruteTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Float],
      k: Int,
      excludeId: Long = -1L
  ): DataFrame = {
    val q = typedLit(queryVec.toSeq)
    embeddings
      .filter(col(idCol) =!= lit(excludeId))
      .withColumn("cosine", cosineCol(col(vecCol), q))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes: nbits × dim in [-1, 1). */
  def hyperplanes(dim: Int, nbits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nbits)(i => Array.tabulate(dim) { j =>
      (splitmix64(seed ^ (i.toLong * 1048573L + j)) >>> 11) * (2.0 / (1L << 53)) - 1.0
    })

  def signatureOf(vec: Array[Float], planes: Array[Array[Double]]): Int = {
    var sig = 0
    var i = 0
    while (i < planes.length) {
      var d = 0.0
      var j = 0
      while (j < vec.length) { d += vec(j) * planes(i)(j); j += 1 }
      if (d > 0) sig |= (1 << i)
      i += 1
    }
    sig
  }

  /** Banded hyperplane signatures: `bands` ints of `bitsPerBand` sign
    * bits each (planes.length must be bands × bitsPerBand).
    */
  def bandSignatures(vec: Array[Float], planes: Array[Array[Double]],
      bands: Int, bitsPerBand: Int): Array[Int] = {
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var sig = 0
      var i = 0
      while (i < bitsPerBand) {
        val p = planes(b * bitsPerBand + i)
        var d = 0.0
        var j = 0
        while (j < vec.length) { d += vec(j) * p(j); j += 1 }
        if (d > 0) sig |= (1 << i)
        i += 1
      }
      out(b) = sig
      b += 1
    }
    out
  }

  /** LSH width sized to the corpus: bucket occupancy ~n/2^nbits stays
    * near `targetOccupancy` as the corpus grows (round-1 review finding:
    * a FIXED nbits under-partitions at 10^10 docs — occupancy, and so
    * per-bucket quadratic work, grows linearly with n).
    */
  def autoBits(n: Long, targetOccupancy: Long = 256L): Int = {
    var bits = 4
    while (bits < 24 && (n >> bits) > targetOccupancy) bits += 1
    bits
  }

  /** Probe set: every signature within Hamming distance ≤ h of `sig`,
    * enumerated combinatorially as the C(bits,1..h) bit-flip
    * combinations — Σⱼ C(bits,j) values, never a 0..2^bits scan
    * (round-2 review: the scan was 16M driver iterations at the 24-bit
    * autoBits cap).
    */
  def probeSignatures(sig: Int, bits: Int, h: Int): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer[Int](sig)
    def flips(start: Int, left: Int, cur: Int): Unit =
      if (left > 0) {
        var i = start
        while (i < bits) {
          val nxt = cur ^ (1 << i)
          out += nxt
          flips(i + 1, left - 1, nxt)
          i += 1
        }
      }
    flips(0, math.min(h, bits), sig)
    out.toSeq
  }

  /** Σⱼ₌₀..h C(bits, j), saturating — the probe-set size WITHOUT
    * enumerating it (so callers can decide isin-list vs scan-filter
    * before allocating anything).
    */
  def probeCount(bits: Int, h: Int): Long = {
    var total = 1L
    var c = 1L
    var j = 1
    while (j <= math.min(h, bits) && total <= Int.MaxValue) {
      c = c * (bits - j + 1) / j
      total += c
      j += 1
    }
    total
  }

  /** LSH-bucketed approximate top-k: probe the query's bucket plus all
    * buckets within `probeHamming` bits, exact-rerank inside. At scale
    * the bucket column is a partition/cluster key so a query touches a
    * small fraction of the corpus. `nbits = 0` derives the width from
    * the corpus size (see [[autoBits]]); `probeHamming >= nbits` probes
    * every bucket — recall exactly 1 (partitioned brute force).
    */
  def lshTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queryVec: Array[Float],
      k: Int,
      nbits: Int = 0,
      probeHamming: Int = 2,
      seed: Long = 42L,
      excludeId: Long = -1L
  ): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dim = queryVec.length
    val bits = if (nbits > 0) nbits else autoBits(embeddings.count())
    val planes = hyperplanes(dim, bits, seed)
    val bc = spark.sparkContext.broadcast(planes)
    val withSig = embeddings
      .filter(col(idCol) =!= lit(excludeId))
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, signatureOf(v, bc.value)) }
      .toDF(idCol, vecCol, "bucket")
    val qSig = signatureOf(queryVec, planes)
    // small probe sets become an isin list (partition/row-group prunable
    // when `bucket` is the table's cluster key); a wide radius degrades
    // to a bit_count scan filter — decided from the CLOSED-FORM count,
    // so the wide case never allocates the probe set at all (round-3
    // review: C(24, ≤6) ≈ 190k boxed ints built then thrown away)
    val probeFilter =
      if (probeHamming >= bits) lit(true)
      else if (probeCount(bits, probeHamming) <= 4096L)
        col("bucket").isin(probeSignatures(qSig, bits, probeHamming): _*)
      else bit_count(col("bucket").bitwiseXOR(lit(qSig))) <= lit(probeHamming)
    withSig
      .filter(probeFilter)
      .withColumn("cosine", cosineCol(col(vecCol), typedLit(queryVec.toSeq)))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
