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

  /** Per-row k-shingle ARRAY (distinct, possibly empty) over an
    * ALREADY-MATERIALIZED token-array column. The token column must be
    * projected first (a named attribute): referencing the tokenizer
    * expression itself here would re-evaluate it per element_at inside
    * the lambda (no CSE across lambda boundaries — measured 4x
    * regression when inlined).
    */
  private def shingleArrayOf(toks: org.apache.spark.sql.Column, k: Int) =
    array_distinct(
      when(size(toks) < lit(k), array())
        .otherwise(transform(
          sequence(lit(0), size(toks) - lit(k)),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + lit(j + 1))): _*)
        )))

  /** Word k-shingles of the analyzed token stream, as a distinct set. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), Analyzer.tokensCol(col(textCol)).as("toks"))
      .select(col(idCol), explode(shingleArrayOf(col("toks"), k)).as("sh"))

  /** One row per doc with its distinct shingle SET as an array column
    * `shs` — docs with fewer than k tokens are absent (identical
    * membership to `shingles().groupBy().collect_set()`, which this
    * replaces: the explode → Exchange → collect_set round trip
    * rebuilt per doc exactly the array this computes in the scan, with
    * a shuffle of every shingle string in between — guide §2.4).
    * Set ORDER differs from collect_set's arbitrary order; every
    * consumer (min-hash over the set, array_intersect cardinality) is
    * order-insensitive.
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), Analyzer.tokensCol(col(textCol)).as("toks"))
      // membership filter BEFORE the shingle projection, phrased on the
      // token count (n ≥ k ⟺ ≥ 1 shingle ⟺ non-empty distinct set):
      // filtering on size(shs) instead gets predicate-pushed below the
      // projection with the alias substituted into the transform
      // lambda, re-evaluating the tokenizer per element (measured 10x)
      .filter(size(col("toks")) >= lit(k))
      .select(col(idCol), shingleArrayOf(col("toks"), k).as("shs"))

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

  /** Embedding-cosine near-dup pairs: banded random-hyperplane LSH.
    * The signature is `bands` independent bands of `bitsPerBand`
    * hyperplane sign bits; a pair is a candidate if ANY band matches
    * (explode-by-band + equi-join — same shape as MinHash banding), and
    * candidates are verified with the EXACT cosine. Output therefore
    * equals the all-pairs answer whenever recall holds; for a pair at
    * angle θ, P(miss) = (1 − (1 − θ/π)^bitsPerBand)^bands — at the
    * default (0.95 ⇒ θ/π ≈ 0.10, 8 bits × 16 bands) that is ~1e-4, and
    * tightening bands drives it to zero geometrically. Join cost is
    * linear in band-bucket occupancy, not quadratic in corpus size.
    */
  def embeddingPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      bitsPerBand: Int = 8,
      bands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val first = emb.select(col(vecCol)).head().getSeq[Float](0)
    val planes = Similarity.hyperplanes(first.length, bitsPerBand * bands, seed)
    val bc = spark.sparkContext.broadcast(planes)
    val nb = bitsPerBand
    val nBands = bands
    val sig = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, Similarity.bandSignatures(v, bc.value, nBands, nb)) }
      .toDF(idCol, vecCol, "bands")
      .cache()
    val banded = sig.select(col(idCol), posexplode(col("bands"))).toDF(idCol, "band", "bh")
    val a = banded.toDF("ida", "band", "bh")
    val b = banded.toDF("idb", "band", "bh")
    val cand = a.join(b, Seq("band", "bh")).filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    cand
      .join(sig.select(col(idCol).as("ida"), col(vecCol).as("va")), Seq("ida"))
      .join(sig.select(col(idCol).as("idb"), col(vecCol).as("vb")), Seq("idb"))
      .withColumn("cosine", Similarity.cosineCol(col("va"), col("vb")))
      .filter(col("cosine") >= lit(minCosine))
      .select(col("ida"), col("idb"), round(col("cosine"), 4).as("cosine"))
  }

  /** Largest rows-per-band r (dividing numPerms) whose banding still
    * recalls a pair at `minJ` with miss probability ≤ `maxMiss`:
    * P(miss | J) = (1 − J^r)^(numPerms/r), decreasing in J — so the bound
    * at minJ covers every pair the operator must emit. Bigger r ⇒
    * geometrically fewer random-pair candidates (P(candidate | J) ≈
    * bands · J^r), so the derived banding is the cheapest one that keeps
    * the stated recall.
    */
  def deriveBands(numPerms: Int, minJ: Double, maxMiss: Double = 0.05): Int = {
    val rs = (1 to numPerms).filter(numPerms % _ == 0)
    val r = rs.reverse.find { r =>
      math.pow(1.0 - math.pow(minJ, r), numPerms.toDouble / r) <= maxMiss
    }.getOrElse(1)
    numPerms / r
  }

  /** MinHash-blocked near-dup pairs verified with the EXACT Jaccard.
    * Three stages, each shrinking the pair stream before anything heavier
    * touches it (round-2 review: the verify join must never see the raw
    * candidate stream — at bands = numPerms that stream is near-all-pairs
    * and joining full shingle sets into it is the quadratic path in an
    * LSH costume):
    *
    *   1. banded candidates: bands of r = numPerms/bands signature rows;
    *      a pair collides on a band with probability J^r, so
    *      P(candidate | J) = 1 − (1 − J^r)^bands.
    *   2. sketch prefilter: estimated Jaccard from the SIGNATURES alone.
    *      At r = 1 the estimate is free — the band-collision count IS the
    *      number of matching components (no join); at r > 1 candidates
    *      are already sparse and the estimate comes from one join of the
    *      64-long signature arrays (never the shingle sets). The cut
    *      estCut = minJ − 4·sqrt(minJ(1−minJ)/numPerms) is 4σ below the
    *      Binomial(numPerms, J) mean, so a true pair at J ≥ minJ is
    *      dropped with probability ≤ Φ(−4) ≈ 3.2e-5.
    *   3. exact verify: only the prefilter survivors join their shingle
    *      sets; output = pairs with exact Jaccard ≥ minJ.
    *
    * `bands = 0` derives the banding from minJ (see [[deriveBands]] for
    * the recall bound) — the scale default. `bands = numPerms` (r = 1) is
    * the recall-≈1 oracle config (P(no candidate | J) = (1−J)^numPerms ≤
    * 1.2e-10 at J = 0.3, 64 perms) the harness checks against the exact
    * all-pairs SQL twin.
    */
  def minhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numPerms: Int = 64,
      minJ: Double = 0.3,
      bands: Int = 0
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nBands = if (bands > 0) bands else deriveBands(numPerms, minJ)
    require(numPerms % nBands == 0, s"bands=$nBands must divide numPerms=$numPerms")
    val rpb = numPerms / nBands
    val estCut = math.max(1.0 / numPerms,
      minJ - 4.0 * math.sqrt(minJ * (1.0 - minJ) / numPerms))
    // per-doc shingle sets straight off the scan — no explode, no
    // shuffle, no collect_set (see shingleSets)
    val sets = shingleSets(df, idCol, textCol, shingleK).cache()
    val np = numPerms
    // cache only when r > 1: that branch reads sigs three times (banded
    // + both sides of the signature join); the r = 1 branch reads it
    // ONCE (banded — the collision count IS the estimate), so caching
    // there was a pure extra materialization pass (round-9)
    val sigs0 = sets.as[(Long, Seq[String])]
      .map { case (id, s) => (id, minhashSignature(s, np)) }
      .toDF(idCol, "sig")
    val sigs = if (rpb == 1) sigs0 else sigs0.cache()
    val survivors: DataFrame =
      if (rpb == 1) {
        // r = 1: band key = (component index, value); the per-pair
        // collision count equals the number of matching components, so
        // est_jaccard needs NO signature join — one count aggregation
        // (map-side partials) on the collision stream.
        val banded = sigs.select(col(idCol), posexplode(col("sig"))).toDF(idCol, "band", "h")
        val a = banded.toDF("ida", "band", "h")
        val b = banded.toDF("idb", "band", "h")
        a.join(b, Seq("band", "h")).filter(col("ida") < col("idb"))
          .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("m"))
          .filter(col("m") >= lit(math.ceil(estCut * numPerms).toLong))
          .select("ida", "idb")
      } else {
        // r > 1: candidates are sparse by construction; estimate from one
        // signature-array join, then cut.
        val banded = sigs.select(
          col(idCol),
          posexplode(transform(
            sequence(lit(0), lit(nBands - 1)),
            bnd => xxhash64(slice(col("sig"), bnd * lit(rpb) + lit(1), lit(rpb)), bnd)
          ))
        ).toDF(idCol, "band", "bh")
        val a = banded.toDF("ida", "band", "bh")
        val b = banded.toDF("idb", "band", "bh")
        a.join(b, Seq("band", "bh")).filter(col("ida") < col("idb"))
          .select("ida", "idb").distinct()
          .join(sigs.toDF("ida", "siga"), Seq("ida"))
          .join(sigs.toDF("idb", "sigb"), Seq("idb"))
          .filter(
            size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), x => x))
              .cast("double") / lit(numPerms.toDouble) >= lit(estCut))
          .select("ida", "idb")
      }
    val out = survivors
      .join(sets.select(col(idCol).as("ida"), col("shs").as("sa")), Seq("ida"))
      .join(sets.select(col(idCol).as("idb"), col("shs").as("sb")), Seq("idb"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", col("inter") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= lit(minJ))
      .select(col("ida"), col("idb"), round(col("jaccard"), 4).as("jaccard"))
      // materialize the (small, verified) pair set so the big cached
      // intermediates — full shingle sets + signatures — can be released
      // NOW instead of pinning executor memory for the app lifetime
      // (round-3 review)
      .localCheckpoint(true)
    sets.unpersist(blocking = false)
    if (rpb != 1) sigs.unpersist(blocking = false)
    out
  }

  // --- SimHash ---------------------------------------------------------------

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Token hash for SimHash: high 64 bits of MD5 (big-endian). MD5 rather
    * than an engine-private hash so the whole SimHash computation has an
    * exact SQL twin — DuckDB: ('0x' || substr(md5(t), 1, 16))::UBIGINT
    * has the same bits.
    */
  def tokenHash64(t: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** 64-bit SimHash over analyzed tokens weighted by tf. */
  def simhash(tokens: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = tokenHash64(t)
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

  /** Near-dup pairs by SimHash hamming distance ≤ maxHamming. Blocking is
    * by pigeonhole: with `bands` disjoint equal-width bands, a pair within
    * hamming distance bands-1 must agree exactly on ≥1 band — so the band
    * count is DERIVED from maxHamming (smallest power-of-two band count >
    * maxHamming; round-1 hardcoded 4 bands, silently losing recall for
    * maxHamming ≥ 4). Recall is exactly 1 by construction, which is what
    * lets the harness check this operator against an all-pairs SQL twin.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
    val bands = Seq(1, 2, 4, 8, 16, 32, 64).find(_ >= maxHamming + 1).get
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sh = simhashDF(df, idCol, textCol).cache()
    val banded = sh.select(
      col(idCol),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask))): _*))
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
