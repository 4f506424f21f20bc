package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.GraftHash

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale notes (100 TB): exact dedup is one hash aggregation on the
  * text (or a digest of it) — partial aggregation makes hot duplicates
  * combine map-side. MinHash/SimHash candidate generation is
  * explode-by-band + self-join on the band key: the join key space is
  * (band, signature) so skew only appears when a band bucket is huge —
  * i.e. a true duplicate cluster — which is exactly the output. Exact
  * pairwise Jaccard is quadratic per shingle bucket and exists as the
  * small-scale oracle for the sketch paths.
  */
object Dedup {

  /** Exact duplicate groups: survivor = min key per identical text. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))
      .select(col(idCol), col("copies"))

  /** Word k-shingles of the analyzed token stream, as a distinct set. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = Analyzer.tokensCol(col(textCol))
    df.select(col(idCol), toks.as("toks"))
      .withColumn(
        "sh",
        when(size(col("toks")) < lit(k), array())
          .otherwise(transform(
            sequence(lit(0), size(col("toks")) - lit(k)),
            i => concat_ws(" ", (0 until k).map(j => element_at(col("toks"), i + lit(j + 1))): _*)
          ))
      )
      .select(col(idCol), explode(array_distinct(col("sh"))).as("sh"))
  }

  /** Exact n-gram Jaccard near-dup pairs (the oracle path; quadratic in
    * bucket size — use the MinHash path at scale).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, k: Int, minJ: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, k).cache()
    val cnt = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = sh.toDF("ida", "sh")
    val b = sh.toDF("idb", "sh")
    val inter = a.join(b, Seq("sh")).filter(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("c"))
    val res = inter
      .join(cnt.toDF("ida", "na"), Seq("ida"))
      .join(cnt.toDF("idb", "nb"), Seq("idb"))
      .withColumn("jaccard", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= lit(minJ))
      .select(col("ida"), col("idb"), round(col("jaccard"), 4).as("jaccard"))
    res
  }

  // --- MinHash + LSH --------------------------------------------------------

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature of a shingle set: perm i = min over shingles of
    * splitmix64(fnv1a(shingle) ^ seed_i).
    */
  def minhashSignature(shingleSet: Iterable[String], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    shingleSet.foreach { s =>
      val x = GraftHash.fnv1a64(s)
      var i = 0
      while (i < numPerms) {
        val h = splitmix64(x ^ (0x5851f42d4c957f2dL * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash+LSH candidate pairs with estimated Jaccard (fraction of
    * matching signature components). bands × rowsPerBand = numPerms.
    * Shingle → signature → band-bucket join (SURVEY/spec: the scale path
    * for near-dup detection).
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numPerms: Int = 64,
      bands: Int = 16,
      minEstJ: Double = 0.5
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = bands
    val rpb = numPerms / bands
    require(rpb * bands == numPerms, "bands must divide numPerms")
    val sigs = shingles(df, idCol, textCol, shingleK)
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroups { (id, it) => (id, minhashSignature(it.map(_._2).toSeq, numPerms)) }
      .toDF(idCol, "sig")
      .cache()
    val banded = sigs.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * lit(rpb) + lit(1), lit(rpb)), b)
      ))
    ).toDF(idCol, "band", "bh")
    val a = banded.toDF("ida", "band", "bh")
    val b = banded.toDF("idb", "band", "bh")
    val cand = a.join(b, Seq("band", "bh")).filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    cand
      .join(sigs.toDF("ida", "siga"), Seq("ida"))
      .join(sigs.toDF("idb", "sigb"), Seq("idb"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), x => x))
          .cast("double") / lit(numPerms))
      .filter(col("est_jaccard") >= lit(minEstJ))
      .select(col("ida"), col("idb"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Embedding-cosine near-dup pairs: random-hyperplane LSH signatures
    * block the corpus; only same-bucket pairs are exact-checked, so the
    * join is linear in bucket occupancy, not quadratic in corpus size
    * (near-identical vectors share all signature bits w.h.p.).
    */
  def embeddingPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      nbits: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val first = emb.select(col(vecCol)).head().getSeq[Float](0)
    val planes = Similarity.hyperplanes(first.length, nbits, seed)
    val bc = spark.sparkContext.broadcast(planes)
    val sig = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, Similarity.signatureOf(v, bc.value)) }
      .toDF(idCol, vecCol, "bucket")
    val a = sig.toDF("ida", "va", "bucket")
    val b = sig.toDF("idb", "vb", "bucket")
    a.join(b, Seq("bucket")).filter(col("ida") < col("idb"))
      .withColumn("cosine", Similarity.cosineCol(col("va"), col("vb")))
      .filter(col("cosine") >= lit(minCosine))
      .select(col("ida"), col("idb"), round(col("cosine"), 4).as("cosine"))
  }

  // --- SimHash ---------------------------------------------------------------

  /** 64-bit SimHash over analyzed tokens weighted by tf. */
  def simhash(tokens: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = GraftHash.fnv1a64(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def simhashDF(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, simhash(Analyzer.tokenize(text))) }
      .toDF(idCol, "simhash")
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming, blocked on
    * 16-bit bands (a pair within distance 3 shares at least one of 4
    * bands exactly — pigeonhole).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sh = simhashDF(df, idCol, textCol).cache()
    val banded = sh.select(
      col(idCol),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
    ).toDF(idCol, "band", "bh")
    val a = banded.toDF("ida", "band", "bh")
    val b = banded.toDF("idb", "band", "bh")
    val cand = a.join(b, Seq("band", "bh")).filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    cand
      .join(sh.toDF("ida", "sha"), Seq("ida"))
      .join(sh.toDF("idb", "shb"), Seq("idb"))
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .filter(col("hamming") <= lit(maxHamming))
      .select(col("ida"), col("idb"), col("hamming"))
  }
}
