package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Turn

/** Deterministic synthetic transcript corpus (FIXTURES.md §1): exact
  * `input_hint` shape, seed-42, Zipf(s≈1.07) vocabulary over 50k words,
  * counter-based splittable PRNG keyed on (conv, turn) so the generated
  * rows are identical regardless of partitioning/parallelism. Marker
  * phrases are planted at known (conv_id, turn_idx) so golden queries
  * have hand-checkable hits; edge-case rows (empty text, a 256-char
  * token, punctuation-only text) live in conv 0.
  */
object Transcripts {
  val Seed = 42L
  val VocabSize = 50000
  val ZipfS = 1.07
  private val BaseEpochSec = 1767225600L // 2026-01-01T00:00:00Z (UTC)

  // Top ranks are real high-frequency English words (keeps langid /
  // stopword ops meaningful); the tail is synthetic.
  private val headWords = Array(
    "the", "a", "of", "to", "and", "in", "is", "it", "you", "that",
    "was", "for", "on", "are", "with", "as", "be", "at", "one", "have")

  def word(rank: Int): String =
    if (rank < headWords.length) headWords(rank) else "t" + rank

  /** Marker phrases at fixed (convIdx, turnIdx) — all words OOV w.r.t.
    * the Zipf vocab, so marker queries have exactly-known postings.
    */
  val markers: Map[(Long, Int), String] = Map(
    (3L, 1) -> "zanzibar quasar lattice",
    (17L, 0) -> "zanzibar quasar lattice",
    (42L, 2) -> "cinnabar monolith",
    (99L, 1) -> "cinnabar monolith archipelago",
    (7L, 3) -> "perihelion vellum"
  )

  // --- counter-based PRNG -------------------------------------------------
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stateless draw k for (conv, turn). */
  def rnd(conv: Long, turn: Int, k: Int): Long =
    splitmix64(splitmix64(Seed + conv * 0x632be59bd9b4e019L) ^ (turn.toLong << 20) ^ k.toLong)

  private def toUnit(x: Long): Double = (x >>> 11) * (1.0 / (1L << 53))

  /** Zipf CDF, computed once per JVM (tiny: 50k doubles). */
  lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(r => 1.0 / math.pow(r + 1.0, ZipfS))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(VocabSize - 1) = 1.0
    cdf
  }

  /** First-level bucket index into the CDF: maps u·4096 to the narrow
    * CDF range containing u's insertion point, so each draw costs a ~2-4
    * step binary search instead of 17 over the full 50k array (the draw
    * was a measured hot frame of the timed corpus generation — round-9).
    * Results are IDENTICAL to the full binary search: the bracket always
    * contains the insertion point, and CDF values are strictly
    * increasing (exact-hit index unique).
    */
  private lazy val zipfBuckets: Array[Int] = {
    val b = new Array[Int](ZipfBucketN + 1)
    var r = 0
    var i = 0
    while (i <= ZipfBucketN) {
      val u = i.toDouble / ZipfBucketN
      while (r < VocabSize && zipfCdf(r) < u) r += 1
      b(i) = r
      i += 1
    }
    b
  }
  private val ZipfBucketN = 4096

  def zipfRank(u: Double): Int = {
    val bkt = {
      val x = (u * ZipfBucketN).toInt
      if (x < 0) 0 else if (x >= ZipfBucketN) ZipfBucketN - 1 else x
    }
    val lo = zipfBuckets(bkt)
    val hi = math.min(zipfBuckets(bkt + 1) + 1, VocabSize)
    val idx = java.util.Arrays.binarySearch(zipfCdf, lo, hi, u)
    if (idx >= 0) idx else math.min(-idx - 1, VocabSize - 1)
  }

  def turnsPerConv(conv: Long): Int = if (conv == 0L) 4 else 2 + (conv % 15).toInt

  private def textFor(conv: Long, turn: Int): String = {
    if (conv == 0L) {
      // Edge rows (FIXTURES.md §1): empty; single 256-char token
      // (exercises the 255 cap); punctuation-only (zero terms); normal.
      turn match {
        case 0 => ""
        case 1 => "x" * 256
        case 2 => "!!! ??? ... --- ***"
        case _ => "plain closing turn with the final answer"
      }
    } else {
      val nTok = 5 + (rnd(conv, turn, 0) % 116).toInt.abs
      val sb = new StringBuilder(nTok * 7)
      var j = 0
      while (j < nTok) {
        if (j > 0) sb.append(' ')
        sb.append(word(zipfRank(toUnit(rnd(conv, turn, j + 1)))))
        j += 1
      }
      markers.get((conv, turn)) match {
        case Some(m) => sb.append(' ').append(m).toString
        case None    => sb.toString
      }
    }
  }

  def turnFor(conv: Long, turn: Int): Turn = {
    val role = ((conv + turn) % 3) match {
      case 0 => "user"
      case 1 => "assistant"
      case _ => "tool"
    }
    val tool = if (role == "tool") Some("tool" + (rnd(conv, turn, 7777) % 8).abs) else None
    val tsSec = BaseEpochSec + conv * 3600L + turn * 30L
    Turn(f"conv-$conv%08d", turn, role, textFor(conv, turn), tool, new Timestamp(tsSec * 1000L))
  }

  /** The clean corpus: `(conv_id, turn_idx)` unique, deterministic. */
  def generate(spark: SparkSession, nConvs: Long, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0L, nConvs, 1L, p).flatMap { conv =>
      (0 until turnsPerConv(conv)).iterator.map(t => turnFor(conv, t))
    }
  }

  /** Dirty variant: every 50th conv (mod 50 == 7) gets a duplicated
    * turn 0 with a later ts — exercises dedup semantics ≙ the reference's
    * duplicate-path handling (CsvReader.java:361-376).
    */
  def generateDirty(spark: SparkSession, nConvs: Long, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val clean = generate(spark, nConvs, partitions)
    val dupes = spark.range(0L, nConvs).filter(_ % 50 == 7).map { conv =>
      val t = turnFor(conv, 0)
      t.copy(text = t.text + " duplicated later write", ts = new Timestamp(t.ts.getTime + 3600L * 1000L))
    }
    clean.union(dupes)
  }
}
