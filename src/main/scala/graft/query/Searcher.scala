package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.GraftHash
import graft.model.{IndexStats, PostingBlock, Scored, TermStats}

/** BM25 top-k execution over a built index (SURVEY.md §3.3 — the query
  * lifecycle the reference delegates to Elasticsearch, Spark-native).
  *
  * Plan shape per query: (1) analyze the query with the SAME analyzer as
  * index time; (2) dictionary lookup restricted to the query terms —
  * a metadata-size read, broadcast to executors; (3) posting-block scan
  * pruned by term-shard partition dirs + term predicate pushed to
  * parquet; (4) block-max WAND per bucket (buckets = docId-disjoint
  * segments ⇒ embarrassingly parallel, exactly ES's shard-then-merge
  * topology); (5) tiny driver merge of per-bucket top-k.
  */
/** Execution mode of one query: OR (WAND), AND (intersection), or
  * phrase (intersection + position adjacency; `slots` = analyzed
  * phrase terms in order, possibly repeating). `filterClauses` are
  * required-but-unscored clauses (ES bool `filter` context): each
  * clause is a disjunction of fielded keyword terms
  * ([[graft.index.FieldTerms]]) — a single-value `term` filter is a
  * 1-element clause, a `terms`/`range` filter a multi-element one; a
  * doc must satisfy EVERY clause. `excludeTerms` veto their docs
  * (`must_not` — flat, since matching ANY exclude term vetoes). Both
  * are disjoint from the scored terms. `shouldTerms` are OPTIONAL
  * scoring terms (ES bool `should`): matched ones add score, and a doc
  * must match ≥ `minShould` of them (`minimum_should_match`). `after`
  * is the ES `search_after` cursor on the (score desc, docId asc) sort
  * key — only docs ranked strictly after it are returned.
  */
private[query] final case class SearchMode(
    conjunctive: Boolean,
    slots: Seq[String],
    filterClauses: Seq[Seq[String]] = Nil,
    excludeTerms: Seq[String] = Nil,
    shouldTerms: Seq[String] = Nil,
    minShould: Int = 0,
    after: Scored = null,
    slop: Int = 0,
    /** Per-term score multipliers (ES `multi_match` field boosts, keyed
      * by the namespaced term); absent terms score with boost 1.
      */
    boosts: Map[String, Double] = Map.empty,
    /** non-null = ES `multi_match` best_fields combination
      * ([[Wand.BestFields]]: score = best field's sum + tie_breaker ·
      * Σ others); null = the plain one-sum (most_fields) rule. OR-mode
      * only.
      */
    bestFields: Wand.BestFields = null,
    /** non-null = `match_phrase_prefix`: the dictionary terms the
      * phrase's LAST slot expanded to (capped, term-asc — the ES
      * rewrite); the slot matches when ANY of them occurs at the
      * phrase position ([[Wand.UnionPosIterator]]). `slots`' last
      * element is the [[Searcher.PrefixSlot]] placeholder.
      */
    prefixExpansions: Seq[String] = null,
    /** ≥ 0 = Lucene/ES `span_first`: the phrase (`slots`) must occur
      * with span end ≤ this bound — see [[Wand.topKPhrase]]. −1 = off.
      */
    spanFirstEnd: Int = -1)

/** One query of a batched `_msearch`-style request
  * ([[Searcher.searchManyBool]]): the FULL bool surface, including
  * lexicographic `rangeFilters` (all specs' ranges expand in ONE
  * batched dictionary scan — the one-job contract holds).
  */
final case class BoolQuerySpec(
    query: String = "",
    /** Analyzed field the `query` text matches over ("text" = the main
      * field) — per-field BM25 stats, same as `searchField`.
      */
    field: String = "text",
    /** ES `multi_match`: when non-empty, overrides `field` — the
      * query's terms score over every (field, boost) under that field's
      * stats, boost-scaled (OR mode; same semantics as `multiMatch`).
      */
    multiMatchFields: Seq[(String, Double)] = Nil,
    /** best_fields combination for `multiMatchFields` (ES's default
      * multi_match mode): score = best field's sum + tieBreaker · Σ
      * others; false = most_fields (summed).
      */
    multiMatchBest: Boolean = false,
    tieBreaker: Double = 0.0,
    conjunctive: Boolean = false,
    phrase: Boolean = false,
    filters: Seq[(String, String)] = Nil,
    mustNot: Seq[(String, String)] = Nil,
    anyFilters: Seq[(String, Seq[String])] = Nil,
    numericRangeFilters: Seq[(String, Long, Long)] = Nil,
    /** ES `range` clauses on keyword fields (lexicographic, inclusive —
      * same semantics as the standalone `searchBool` parameter).
      */
    rangeFilters: Seq[(String, String, String)] = Nil,
    /** ES `exists` clauses (doc must HAVE each field) / `must_not
      * exists` ("missing") — the `_field_names`-style marker terms.
      */
    exists: Seq[String] = Nil,
    missing: Seq[String] = Nil,
    /** ES bool `must_not` over ANALYZED text ((field, word) pairs,
      * field "text" = the main field; the Lucene `-term` clause): docs
      * containing the word's tokens in that field are vetoed. Same
      * exclude-cursor machinery as keyword mustNot.
      */
    mustNotText: Seq[(String, String)] = Nil,
    should: String = "",
    minShouldMatch: Int = 0,
    phraseSlop: Int = 0)

/** Pattern-compile helpers shared by the single-index and cross-segment
  * term-expansion paths (ES `wildcard` rewrite): the Scala regex and the
  * SQL LIKE pattern MUST stay equivalent (AnalyzerSpec-style parity is
  * covered by the expansion specs).
  */
private[query] object Expansion {
  def wildcardRegex(patLower: String): scala.util.matching.Regex =
    ("^" + patLower.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => "\\" + c
      case c => c.toString
    } + "$").r

  def wildcardLike(patLower: String): String =
    patLower.flatMap {
      case '*' => "%"
      case '?' => "_"
      case c if c == '%' || c == '_' || c == '\\' => "\\" + c
      case c => c.toString
    }

  /** Unit-cost Levenshtein — MUST agree with Spark's
    * functions.levenshtein and DuckDB's levenshtein (the oracle twins).
    */
  def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    var i = 1
    while (i <= a.length) {
      var prev = dp(0)
      dp(0) = i
      var j = 1
      while (j <= b.length) {
        val cur = dp(j)
        val sub = if (a.charAt(i - 1) == b.charAt(j - 1)) prev else prev + 1
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1), sub)
        prev = cur
        j += 1
      }
      i += 1
    }
    dp(b.length)
  }
}

/** ES `function_score` decay shapes (public — callers tune these). */
object FunctionScore {

  /** ES `function_score` DECAY multiplier (gauss | exp | linear) of a
    * numeric value column — the closed forms ES documents, with the
    * per-unit rate precomputed ONCE on the driver (StrictMath.log —
    * the deterministic fdlibm path, same rule as Bm25) so the
    * distributed expression is one subtract/abs/multiply chain:
    *   d      = max(0, |v − origin| − offset)
    *   gauss  = e^(d² · ln(decay) / scale²)      (≡ decay^((d/scale)²))
    *   exp    = e^(d · ln(decay) / scale)        (≡ decay^(d/scale))
    *   linear = max(0, 1 − d · (1 − decay)/scale)
    * so v = origin±offset ⇒ 1.0 and v at origin±(offset+scale) ⇒
    * exactly `decay` on every shape (the ES contract).
    */
  def decayMultiplier(v: Column, shape: String, origin: Double,
      scale: Double, offset: Double, decay: Double): Column = {
    require(scale > 0.0, s"decay scale must be > 0, got $scale")
    require(offset >= 0.0, s"decay offset must be >= 0, got $offset")
    require(decay > 0.0 && decay < 1.0, s"decay must be in (0, 1), got $decay")
    val d = greatest(abs(v - lit(origin)) - lit(offset), lit(0.0))
    shape match {
      case "gauss" => exp((d * d) * lit(StrictMath.log(decay) / (scale * scale)))
      case "exp" => exp(d * lit(StrictMath.log(decay) / scale))
      case "linear" => greatest(lit(1.0) - d * lit((1.0 - decay) / scale), lit(0.0))
      case other => throw new IllegalArgumentException(
        s"unknown decay shape '$other' (gauss | exp | linear)")
    }
  }
}

private[query] object Searcher {
  import graft.model.{PostingBlock => PB}

  /** Placeholder slot name of the `match_phrase_prefix` expanded last
    * position (the \u0001 control prefix precedes every analyzer-emitted and namespaced
    * term, so it can never collide with a real dictionary term).
    */
  val PrefixSlot = "\u0001prefix"

  /** ES JLH significance score over a (term, fg_count, bg_count) frame:
    * (fg% − bg%) · (fg% / bg%), positive-only (ES drops terms that are
    * rarer in the foreground). The arithmetic shape (each ratio one
    * division, then one subtraction/division/multiplication) is
    * mirrored verbatim in the DuckDB twin so the rounded scores
    * hash-match.
    */
  def jlhScore(joined: DataFrame, fgN: Long, n: Long): DataFrame = {
    val fgPct = col("fg_count").cast("double") / lit(fgN.toDouble)
    val bgPct = col("bg_count").cast("double") / lit(n.toDouble)
    joined.withColumn("score", (fgPct - bgPct) * (fgPct / bgPct))
      .filter(col("score") > lit(0.0))
  }

  /** Shared phrase-suggester tail (round-7, both searchers): enumerate
    * candidate phrases from the per-slot candidate lists (Cartesian
    * product in slot-rank order, capped at `maxPhrases` — deterministic),
    * score each as the SUM of its adjacent bigram doc-counts (integer —
    * the unsmoothed bigram-likelihood numerator; ES's phrase suggester
    * ranks by a smoothed bigram language model, deviation documented),
    * rank (score desc, phrase asc), top k.
    */
  def phraseSuggestFrom(spark: SparkSession, slotCands: Seq[Seq[String]],
      bigram: Map[(String, String), Long], k: Int,
      maxPhrases: Int = 1000): DataFrame = {
    import spark.implicits._
    val phrases = slotCands
      .foldLeft(Seq(Seq.empty[String])) { (acc, cs) =>
        (for (p <- acc.iterator; c <- cs.iterator) yield p :+ c).take(maxPhrases).toSeq
      }
    phrases.map { p =>
      val score = p.sliding(2)
        .map { case Seq(a, b) => bigram.getOrElse((a, b), 0L); case _ => 0L }.sum
      (p.mkString(" "), score)
    }.sortBy { case (s, sc) => (-sc, s) }
      .take(k)
      .toDF("suggestion", "score")
  }

  /** Adjacent candidate pairs of the slot lists (the bigrams whose
    * corpus doc-counts the phrase suggester needs).
    */
  def slotPairs(slotCands: Seq[Seq[String]]): Seq[(String, String)] =
    slotCands.sliding(2).flatMap {
      case Seq(a, b) => for (x <- a; y <- b) yield (x, y)
      case _ => Nil
    }.toSeq.distinct

  /** Doc-counts of the requested adjacent bigrams over an exploded
    * (term, docId, pos) position frame: equi-self-join on (docId,
    * pos + 1) restricted to the pair list (broadcast — it is tiny),
    * count distinct docs per pair. Shared by both searchers' phrase
    * suggesters.
    */
  def bigramCountsOf(exploded: DataFrame,
      pairs: Seq[(String, String)]): Map[(String, String), Long] = {
    val spark = exploded.sparkSession
    import spark.implicits._
    // the pair lists are driver-known and tiny (≤ slots × cap²), so
    // membership goes in as literal isin/equality predicates instead of
    // three broadcast joins — each broadcast was its own Spark job plus
    // an exchange in the plan (round-9: the phrase-suggest entry ran 17
    // jobs, 4 of them broadcast builds; guide §2.4)
    val aTerms = pairs.map(_._1).distinct
    val bTerms = pairs.map(_._2).distinct
    val lhs = exploded.filter(col("term").isin(aTerms: _*))
      .select(col("term").as("ta"), col("docId"), (col("pos") + lit(1)).as("nxt"))
    val rhs = exploded.filter(col("term").isin(bTerms: _*))
      .select(col("term").as("tb"), col("docId"), col("pos").as("nxt"))
    val pairPred = pairs
      .map { case (a, b) => col("ta") === lit(a) && col("tb") === lit(b) }
      .reduce(_ || _)
    lhs.join(rhs, Seq("docId", "nxt"))
      .filter(pairPred)
      .groupBy(col("ta"), col("tb"))
      .agg(countDistinct(col("docId")).as("n"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
  }

  /** Shared ES `filters`-aggregation body: one conditional count per
    * named (field = value) bucket in a single agg, `stack`-unpivoted
    * in request order.
    */
  def filtersAggOf(joined: DataFrame,
      buckets: Seq[(String, (String, String))]): DataFrame = {
    val aggs = buckets.zipWithIndex.map { case ((_, (f, v)), i) =>
      count(when(col(f) === lit(v), 1)).as(s"__b_$i")
    }
    val stackArgs = buckets.zipWithIndex.map { case ((name, _), i) =>
      require(!name.contains("'"), s"bucket name '$name' must not contain quotes")
      s"'$name', __b_$i"
    }.mkString(", ")
    joined.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${buckets.size}, $stackArgs) as (key, n_docs)")
  }

  /** Shared ES `range`-aggregation body: every [from, to) bucket is a
    * conditional count in ONE agg over the (docId, field) match-set
    * join, unpivoted to rows via `stack` — single pass, no driver
    * materialization, request order preserved.
    */
  def rangesAggOf(joined: DataFrame, v: Column,
      ranges: Seq[(Option[Long], Option[Long])]): DataFrame = {
    val aggs = ranges.zipWithIndex.map { case ((from, to), i) =>
      val cond = (from, to) match {
        case (Some(f), Some(t)) => v >= lit(f) && v < lit(t)
        case (Some(f), None) => v >= lit(f)
        case (None, Some(t)) => v < lit(t)
        case (None, None) => lit(true)
      }
      count(when(cond, 1)).as(s"__r_$i")
    }
    val stackArgs = ranges.zipWithIndex.map { case ((f, t), i) =>
      val key = s"${f.map(_.toString).getOrElse("*")}-${t.map(_.toString).getOrElse("*")}"
      s"'$key', __r_$i"
    }.mkString(", ")
    joined.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${ranges.size}, $stackArgs) as (key, n_docs)")
  }

  /** `function_score` field-value column as `__fv`: nulls substitute
    * the `missing` default when given, else fail LOUDLY on the first
    * null row (ES field_value_factor semantics — it errors without
    * `missing`; a silent NULL score would sort last yet still surface
    * when < k non-null hits exist, round-7 ADVICE). Shared by both
    * searchers' rescore paths.
    */
  def fvfValue(v: Column, field: String, missing: Option[Double]): Column =
    (missing match {
      case Some(m) => coalesce(v, lit(m))
      case None => when(v.isNull, raise_error(lit(
          s"function_score: doc has no value for field '$field' and no " +
            "`missing` default was given (ES field_value_factor contract)")))
        .otherwise(v)
    }).as("__fv")

  /** Shared collapse tail over the (docId, key, score) joined frame:
    * one `row_number` window (InferWindowGroupLimit ⇒ pre-shuffle
    * per-partition group limits of ≤ innerHits rows per key) ranks
    * within each group; the rank-1 rows pick the top-`k` GROUPS by
    * (best score desc, best docId asc) via TakeOrderedAndProject; the
    * kept groups' ≤ innerHits rows ride along broadcast-semi-joined
    * (k keys — tiny). Output: (key, hit_rank, doc_id, score), ordered
    * by (group best desc, group best docId asc, hit_rank asc) — the
    * ES collapse + inner_hits response flattened.
    */
  def collapseOf(joined: DataFrame, k: Int, innerHits: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("docId").asc)
    val ranked = joined
      .withColumn("hit_rank", row_number().over(w))
      .filter(col("hit_rank") <= lit(innerHits))
    if (innerHits == 1)
      ranked.select(col("key"), col("hit_rank"), col("docId").as("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(k)
    else {
      val best = ranked.filter(col("hit_rank") === lit(1))
        .orderBy(col("score").desc, col("docId").asc).limit(k)
        .select(col("key"), col("score").as("__best"), col("docId").as("__bestId"))
      ranked.join(broadcast(best), Seq("key"))
        .select(col("key"), col("hit_rank"), col("docId").as("doc_id"), col("score"),
          col("__best"), col("__bestId"))
        .orderBy(col("__best").desc, col("__bestId").asc, col("hit_rank").asc)
        .drop("__best", "__bestId")
    }
  }

  /** One bucket's WAND dispatch, shared by the distributed and the
    * driver-local serving paths (kept in the companion so Spark task
    * closures never capture a Searcher instance). `entries` carries the
    * dictionary rows of ALL the query's found terms — scored, filter,
    * and exclude; returns empty when the bucket is missing a required
    * term (any scored term under AND/phrase, or any filter term — a
    * bucket that lacks a filter value cannot contain matching docs).
    */
  def runBucket(
      byTerm: Map[Long, Array[PB]],
      entries: Seq[(String, TermStats)],
      mode: SearchMode,
      k: Int,
      n: Long,
      avgdl: Double,
      /** Per-field (docCount, avgdl) of the additional analyzed text
        * fields (`IndexConfig.textFieldCols`) — a `%field:token` term
        * scores under ITS field's stats (per-field BM25).
        */
      fieldStats: Map[String, (Long, Double)] = Map.empty
  ): Iterator[Scored] = {
    val fSet = mode.filterClauses.flatten.toSet
    val eSet = mode.excludeTerms.toSet
    val sSet = mode.shouldTerms.toSet
    // an expansion that IS one of the fixed phrase terms (query "the th")
    // must keep its scored iterator — the union slot builds its own fresh
    // member iterators, so only expansion-ONLY terms leave the scored set
    val pSet = if (mode.prefixExpansions == null) Set.empty[String]
      else mode.prefixExpansions.toSet -- Option(mode.slots).getOrElse(Nil)
    val byName = entries.toMap
    def iterOfG(t: String, s: TermStats, g: Int): Option[Wand.TermIterator] =
      byTerm.get(s.termId).map { bs =>
        val (nn, ad) = graft.index.FieldTerms.textFieldOf(t)
          .flatMap(fieldStats.get).getOrElse((n, avgdl))
        val boost = mode.boosts.getOrElse(t, 1.0)
        new Wand.TermIterator(t, bs, boost * s.maxScore, s.df, nn, ad,
          boost = boost, groupOrdinal = g)
      }
    def iterOf(t: String, s: TermStats): Option[Wand.TermIterator] =
      iterOfG(t, s, Int.MinValue)
    val scoredEntries = entries.filter { case (t, _) =>
      !fSet.contains(t) && !eSet.contains(t) && !sSet.contains(t) && !pSet.contains(t) }
    // shared-term dis_max: one FRESH iterator per (group, term), each
    // attributed to its group (cursors are mutable — never shared)
    val scored =
      if (mode.bestFields != null && mode.bestFields.groupsOf != null)
        scoredEntries.flatMap { case (t, s) =>
          mode.bestFields.groupsOf.getOrElse(t, Seq(-1)).flatMap(g => iterOfG(t, s, g))
        }
      else scoredEntries.flatMap { case (t, s) => iterOf(t, s) }
    val shoulds = entries.filter(e => sSet.contains(e._1)).flatMap { case (t, s) => iterOf(t, s) }
    // match_phrase_prefix last slot: union of the expansions present in
    // this bucket — a required slot with no member here ⇒ no hits
    val prefixUnion: Wand.UnionPosIterator =
      if (mode.prefixExpansions == null) null
      else {
        val members = mode.prefixExpansions
          .flatMap(t => byName.get(t).flatMap(s => iterOf(t, s)))
        if (members.isEmpty) return Iterator.empty
        new Wand.UnionPosIterator(Searcher.PrefixSlot, members.toArray)
      }
    val needAll = mode.conjunctive || mode.slots != null
    // required group present globally but absent here ⇒ no hits in this
    // bucket; a bucket with fewer should lists than minShould likewise
    if ((scoredEntries.nonEmpty && scored.isEmpty) ||
      (scored.isEmpty && shoulds.isEmpty && prefixUnion == null) ||
      (needAll && scored.size < scoredEntries.size) ||
      shoulds.size < mode.minShould) return Iterator.empty
    // each clause → one cursor (union of its values' lists); a clause
    // with NO member in this bucket is unsatisfiable here. Every clause
    // membership gets a FRESH iterator (never shared with another clause
    // or the exclude list — cursors are mutable).
    val clauseCursors: Seq[Option[Wand.DocCursor]] = mode.filterClauses.map { clause =>
      val members = clause.flatMap(t => byName.get(t).flatMap(s => iterOf(t, s)))
      if (members.isEmpty) None
      else if (members.size == 1) Some(members.head)
      else Some(new Wand.UnionCursor(members))
    }
    if (clauseCursors.exists(_.isEmpty)) return Iterator.empty
    val filters = clauseCursors.flatten
    val excludes = entries.filter(e => eSet.contains(e._1)).flatMap { case (t, s) => iterOf(t, s) }
    val top =
      if (mode.slots != null)
        Wand.topKPhrase(
          if (prefixUnion == null) scored else scored :+ prefixUnion,
          mode.slots, k, filters, excludes, shoulds, mode.minShould,
          mode.after, mode.slop, mode.spanFirstEnd)
      else if (mode.conjunctive)
        Wand.topKConjunctive(scored, k, filters, excludes, shoulds, mode.minShould, mode.after)
      else Wand.topK(scored, k, filters, excludes, shoulds, mode.minShould, mode.after,
        mode.bestFields)
    top.iterator
  }
}

class Searcher(spark: SparkSession, indexDir: String, numShards: Int) {
  import spark.implicits._

  lazy val stats: IndexStats =
    spark.read.parquet(s"$indexDir/stats").as[IndexStats].head()

  /** Per-field (docCount, avgdl) of the additional analyzed text fields
    * — a handful of rows, read once (empty for indexes built without
    * `textFieldCols`).
    */
  lazy val fieldStatsMap: Map[String, (Long, Double)] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/fieldstats")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) Map.empty
    else spark.read.parquet(s"$indexDir/fieldstats")
      .select(col("field"), col("ndocs"), col("sumdl"))
      .as[(String, Long, Long)].collect()
      .map { case (f, nf, sdl) => f -> (nf, if (nf == 0) 0.0 else sdl.toDouble / nf) }
      .toMap
  }
  private lazy val dict = spark.read.parquet(s"$indexDir/dict")
  private lazy val blocks = spark.read.parquet(s"$indexDir/blocks")
  lazy val docs: DataFrame = spark.read.parquet(s"$indexDir/docs")

  /** Format ≥ 2 = the index stores `_field_names`-style exists markers.
    * Checked once; `exists`/`missing` clauses on a legacy index throw
    * instead of silently returning inverted results (round-6 review).
    */
  private lazy val hasExistsMarkers: Boolean = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    graft.index.IndexFormat.version(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), indexDir) >=
      graft.index.IndexFormat.Version
  }
  private def guardExists(exists: Seq[String], missing: Seq[String]): Unit =
    graft.index.IndexFormat.requireExistsMarkers(hasExistsMarkers, indexDir, exists, missing)

  // driver-side dictionary (populated by warm() when the vocabulary fits;
  // otherwise lookups stay distributed — the 100 TB path)
  @volatile private var dictMap: Map[String, TermStats] = _
  // driver-local serving index: bucket -> termId -> blocks. Populated by
  // warm() ONLY when the compressed index fits `maxLocalBlockBytes`
  // (bounded collect — same guard pattern as dictMap); queries then run
  // WAND in-process with zero Spark jobs, which removes the ~100 ms
  // per-query job-scheduling floor. Large indexes keep the distributed
  // path (per-bucket WAND on executors) — identical results, same code.
  @volatile private var localIdx: Map[Int, Map[Long, Array[PostingBlock]]] = _

  /** Conservative encoded-bytes → driver-heap expansion factor for the
    * local serving index: each PostingBlock holds three byte arrays plus
    * object/array headers, boxed map keys, and per-term array wrappers —
    * measured small multiple of payload bytes (round-2 review).
    */
  private val LocalHeapExpansion = 4L

  /** Pin blocks in executor memory and the dictionary on the driver (the
    * "warm index" state a serving deployment runs in; spills to disk if
    * larger than memory). `maxDriverDictTerms` guards driver memory —
    * beyond it the dictionary stays a distributed lookup;
    * `maxLocalBlockBytes` additionally enables the in-process serving
    * path when the whole compressed index fits (0 disables it). The
    * budget is an estimated HEAP bound: encoded payload bytes ×
    * [[LocalHeapExpansion]], so the default admits ~256 MB of encoded
    * postings (~1 GB resident — size it to the serving driver's heap).
    */
  def warm(maxDriverDictTerms: Long = 5_000_000L,
      maxLocalBlockBytes: Long = 1L << 30): this.type = {
    // idempotent persist: a second searcher over the same dir (or a
    // re-warm) must not re-ask the CacheManager (noisy WARN, no-op)
    if (blocks.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      blocks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocks.count()
    if (dict.count() <= maxDriverDictTerms)
      dictMap = dict.as[TermStats].collect().map(t => t.term -> t).toMap
    else {
      if (dict.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        dict.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dict.count()
    }
    if (maxLocalBlockBytes > 0) {
      val bytes = blocks
        .agg(coalesce(sum((length(col("docs")) + length(col("tfs")) + length(col("dls"))
          + length(col("poss")) + lit(64)) * lit(LocalHeapExpansion)), lit(0L))).head().getLong(0)
      if (bytes <= maxLocalBlockBytes)
        localIdx = blocks.as[PostingBlock].collect()
          .groupBy(_.bucket).view.mapValues(_.groupBy(_.termId)).toMap
    }
    this
  }

  /** Dictionary rows for the query terms (tiny). */
  def lookupTerms(terms: Seq[String]): Map[String, TermStats] = {
    if (terms.isEmpty) return Map.empty
    if (dictMap != null) return terms.flatMap(t => dictMap.get(t).map(t -> _)).toMap
    val shards = terms.map(GraftHash.shardOf(_, numShards)).distinct
    dict
      .filter(col("shard").isin(shards: _*) && col("term").isin(terms: _*))
      .as[TermStats].collect().map(t => t.term -> t).toMap
  }

  /** Blocks for the found dictionary rows: shard is a partition dir =>
    * partition pruning; termId (int64) is pushed to parquet row groups
    * (blocks are termId-sorted within files — cheaper min/max pruning and
    * dictionary filtering than the round-1 term-string predicate).
    */
  private def selectBlocks(found: Iterable[TermStats]): DataFrame = {
    val shards = found.map(_.shard).toSeq.distinct
    val ids = found.map(_.termId).toSeq
    blocks.filter(col("shard").isin(shards: _*) && col("termId").isin(ids: _*))
  }

  private type Mode = SearchMode
  private def Mode(conjunctive: Boolean, slots: Seq[String] = null): Mode =
    SearchMode(conjunctive, slots)

  /** In-process WAND over the driver-local index (no Spark job).
    * Buckets run concurrently on the shared pool — the same
    * per-bucket-then-merge topology as the distributed path (buckets are
    * docId-disjoint), so results are identical and a hot-term query's
    * latency is bounded by one bucket's share, not the whole index.
    */
  private def runLocal(
      found: Map[String, TermStats],
      k: Int,
      mode: Mode
  ): Array[Scored] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val n = stats.n
    val avgdl = stats.avgdl
    val fStats = fieldStatsMap
    val foundSeq = found.toSeq
    val perBucket = localIdx.toSeq.map { case (_, byTerm) =>
      Future(Searcher.runBucket(byTerm, foundSeq, mode, k, n, avgdl, fStats).toArray)
    }
    val out = Await.result(Future.sequence(perBucket),
      scala.concurrent.duration.Duration.Inf).flatten.toArray
    out.sortBy(s => (-s.score, s.docId)).take(k)
  }

  private def runPerBucket(
      terms: Seq[String],
      k: Int,
      mode: Mode
  ): Array[Scored] = {
    val found = lookupTerms(terms)
    val needAll = mode.conjunctive || mode.slots != null
    if (needAll && found.size < terms.distinct.size) return Array.empty
    runFound(found, k, mode)
  }

  private def runFound(
      found: Map[String, TermStats],
      k: Int,
      mode: Mode
  ): Array[Scored] = {
    if (found.isEmpty) return Array.empty
    if (localIdx != null) return runLocal(found, k, mode)
    val n = stats.n
    val avgdl = stats.avgdl
    val fStats = fieldStatsMap
    val foundSeq = found.toSeq
    val md = mode
    // Searcher.runBucket is a companion method — the task closure
    // captures only (foundSeq, md, k, n, avgdl, fStats), never this
    // Searcher
    val perBucket = selectBlocks(found.values)
      .as[PostingBlock]
      .groupByKey(_.bucket)
      .flatMapGroups { (_, it) =>
        Searcher.runBucket(it.toArray.groupBy(_.termId), foundSeq, md, k, n, avgdl, fStats)
      }
    // per-bucket heaps (≤ k each) → global top-k merge: Catalyst plans
    // TakeOrderedAndProject (per-partition heap + driver merge).
    perBucket.orderBy(col("score").desc, col("docId").asc).limit(k).collect()
  }

  /** Disjunctive (OR / ES `match`) BM25 top-k. `from` = pagination
    * offset (skip the first `from` ranked hits; per-bucket heaps grow to
    * from + k — the documented ES deep-paging cost).
    */
  def search(query: String, k: Int, from: Int = 0): Array[Scored] = {
    val hits = runPerBucket(Analyzer.analyzeQuery(query).toSeq, from + k, Mode(conjunctive = false))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** Phrase top-k (ES `match_phrase`): docs whose analyzed token stream
    * contains the analyzed query tokens ADJACENTLY in order, ranked by
    * the BM25 sum of the phrase's distinct terms. Needs an index built
    * with storePositions (default).
    */
  def searchPhrase(query: String, k: Int, from: Int = 0,
      /** ES `slop` — full Lucene sloppy-phrase semantics: positional
        * moves over offset-adjusted positions, so reordered terms match
        * from slop ≥ 2 (a transposed bigram has width 2); 0 = exact
        * adjacency.
        */
      slop: Int = 0): Array[Scored] = {
    val slots = Analyzer.tokenize(query).toSeq // order + duplicates kept
    if (slots.isEmpty) return Array.empty
    val hits = runPerBucket(slots.distinct.sorted, from + k,
      SearchMode(conjunctive = false, slots = slots, slop = slop))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** Lucene/ES `span_first`: the analyzed query must occur — exact
    * adjacency for multi-token queries — with span END (last token's
    * 0-based position + 1) ≤ `end`, i.e. inside the field's first
    * `end` token positions (Lucene SpanFirstQuery's `end() ≤ end`
    * rule; transcripts: "conversations OPENING with …"). Scoring: the
    * engine's phrase rule — BM25 sum of the distinct query terms over
    * matching docs. Rides the positional phrase matcher (the span gate
    * evaluates per aligned candidate on the already-decoded positions,
    * so WAND pruning and block-max skipping apply unchanged); needs an
    * index built with storePositions. Sloppy spans are out of scope
    * (ES `span_near` slop is a different operator — not `match_phrase`
    * slop).
    */
  def searchSpanFirst(query: String, end: Int, k: Int): Array[Scored] = {
    require(end > 0, "span_first end must be positive")
    val slots = Analyzer.tokenize(query).toSeq
    if (slots.isEmpty) return Array.empty
    runPerBucket(slots.distinct.sorted, k,
      SearchMode(conjunctive = false, slots = slots, spanFirstEnd = end))
  }

  /** ES `min_score`: the plain disjunctive top-k with hits scoring
    * below `minScore` removed. Filtering AFTER the top-k is exact:
    * every doc beyond rank k scores ≤ the rank-k score, so a sub-
    * threshold doc inside the page implies every doc outside it is
    * sub-threshold too — filter(top-k) ≡ top-k(filter).
    */
  def searchMinScore(query: String, k: Int, minScore: Double): Array[Scored] =
    search(query, k).filter(_.score >= minScore)

  /** Lucene/ES `query_string` execution: [[QueryString.parse]]d into a
    * [[BoolQuerySpec]] and run through the batched bool path (one job).
    * Throws IllegalArgumentException on unsupported syntax — see
    * [[QueryString]] for the grammar.
    */
  def searchQueryString(q: String, k: Int,
      schema: QueryString.Schema = QueryString.Schema()): Array[Scored] =
    searchManyBool(Seq(QueryString.parse(q, schema)), k).head

  /** ES `match_phrase_prefix`: the analyzed query matched as a phrase
    * whose LAST token is a PREFIX — expanded against the dictionary
    * (term-asc, capped at `maxExpansions`, exactly the `searchPrefix`
    * rewrite) into one multi-term slot ([[Wand.UnionPosIterator]],
    * Lucene's MultiPhraseQuery position): the doc matches when the
    * fixed tokens are followed by ANY expansion at the phrase position.
    * Scoring: the engine's phrase rule — the BM25 sum of the FIXED
    * distinct terms (the expanded slot gates membership only; a
    * single-token query therefore ranks all prefix-matching docs at
    * score 0 — use [[searchPrefix]] for scored pure-prefix queries).
    * `slop` > 0 applies the sloppy model; with an expansion identical
    * to a fixed term the sloppy matcher may reuse a token occurrence
    * across those two slots (slop = 0 adjacency is always exact).
    * `field` expands and matches within that analyzed field.
    */
  def searchPhrasePrefix(query: String, k: Int, maxExpansions: Int = 50,
      slop: Int = 0, from: Int = 0, field: String = "text"): Array[Scored] = {
    val toks = Analyzer.tokenize(query).toSeq
    if (toks.isEmpty) return Array.empty
    val p = toks.last
    val fixed = toks.init.map(t => graft.index.FieldTerms.textTerm(field, t))
    val exp = expand(_.startsWith(p), _.startsWith(p), maxExpansions, field)
    if (exp.isEmpty) return Array.empty
    val fixedFound = lookupTerms(fixed.distinct)
    if (fixedFound.size < fixed.distinct.size) return Array.empty
    val slots = fixed :+ Searcher.PrefixSlot
    val hits = runFound(fixedFound ++ exp, from + k,
      SearchMode(conjunctive = false, slots = slots, slop = slop,
        prefixExpansions = exp.keys.toSeq.sorted))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** Batched execution: N queries in ONE Spark job — the throughput
    * (QPS) shape. Blocks for the union of all query terms are scanned
    * once; per bucket, each query runs WAND over that bucket's slice of
    * its own term lists; the tiny (≤ queries × buckets × k) result set
    * merges on the driver. Results are identical to per-query search
    * (tested).
    */
  def searchMany(queries: Seq[String], k: Int): Map[String, Array[Scored]] = {
    val analyzed: Map[String, Seq[String]] =
      queries.map(q => q -> Analyzer.analyzeQuery(q).toSeq).toMap
    val allTerms = analyzed.values.flatten.toSeq.distinct.sorted
    val found = lookupTerms(allTerms)
    if (found.isEmpty) return queries.map(_ -> Array.empty[Scored]).toMap
    if (localIdx != null)
      return queries.map { q =>
        q -> runLocal(analyzed(q).flatMap(t => found.get(t).map(t -> _)).toMap, k,
          Mode(conjunctive = false))
      }.toMap
    val n = stats.n
    val avgdl = stats.avgdl
    val idOf: Map[String, Long] = found.map { case (t, s) => t -> s.termId }
    val dfUb: Map[String, (Long, Double)] = found.map { case (t, s) => t -> (s.df, s.maxScore) }
    val perQueryTerms: Seq[(String, Seq[String])] =
      queries.map(q => q -> analyzed(q).filter(found.contains))
    import spark.implicits._
    val rows = selectBlocks(found.values)
      .as[PostingBlock]
      .groupByKey(_.bucket)
      .flatMapGroups { (_, it) =>
        val byTerm = it.toArray.groupBy(_.termId)
        perQueryTerms.iterator.flatMap { case (q, terms) =>
          val iters = terms.flatMap(t => byTerm.get(idOf(t)).map { bs =>
            val (df, ub) = dfUb(t)
            new Wand.TermIterator(t, bs, ub, df, n, avgdl)
          })
          Wand.topK(iters, k).iterator.map(s => (q, s.docId, s.score))
        }
      }
      .collect()
    val grouped = rows.groupBy(_._1)
    queries.map { q =>
      q -> grouped.getOrElse(q, Array.empty)
        .map(r => Scored(r._2, r._3))
        .sortBy(s => (-s.score, s.docId))
        .take(k)
    }.toMap
  }

  /** Batched execution of FULL bool queries — the ES `_msearch` shape:
    * N heterogeneous queries (OR / AND / phrase+slop / filters /
    * must_not / terms / trie ranges / should+minimum_should_match) in
    * ONE Spark job. One dictionary lookup and one pruned block scan
    * cover the union of every spec's terms; per bucket, each spec runs
    * through the same [[Searcher.runBucket]] dispatch as its standalone
    * API, so results are identical to issuing the specs one at a time
    * (test-pinned). Warm searchers answer each spec in-process with
    * zero jobs. Lexicographic `rangeFilters` batch too: every spec's
    * ranges expand off ONE OR-predicate dictionary scan.
    */
  def searchManyBool(specs: Seq[BoolQuerySpec], k: Int): Seq[Array[Scored]] = {
    specs.foreach(sp => guardExists(sp.exists, sp.missing))
    final case class Prep(scoredTerms: Seq[String], slots: Seq[String],
        clauses: Seq[Seq[String]], excludeTerms: Seq[String], shouldTerms: Seq[String],
        ranges: Seq[(String, String, String)], boosts: Map[String, Double],
        bestFields: Wand.BestFields)
    val preps = specs.map { sp =>
      require(sp.multiMatchFields.isEmpty || (!sp.phrase && !sp.conjunctive),
        "multiMatchFields is OR-mode only (like multiMatch)")
      val toks = Analyzer.tokenize(sp.query).toSeq
      val mm = sp.multiMatchFields
      val slots =
        if (sp.phrase) toks.map(t => graft.index.FieldTerms.textTerm(sp.field, t)) else null
      val scoredTerms =
        if (mm.nonEmpty)
          (for ((f, _) <- mm; t <- toks.distinct)
            yield graft.index.FieldTerms.textTerm(f, t)).distinct.sorted
        else if (sp.phrase) Option(slots).getOrElse(Nil).distinct.sorted
        else toks.distinct.sorted.map(t => graft.index.FieldTerms.textTerm(sp.field, t))
      val boosts: Map[String, Double] =
        if (mm.isEmpty) Map.empty
        else (for ((f, b) <- mm; t <- toks.distinct)
          yield graft.index.FieldTerms.textTerm(f, t) -> b).toMap
      val shouldTerms = Analyzer.analyzeQuery(sp.should).filterNot(scoredTerms.contains).toSeq
      val clauses: Seq[Seq[String]] =
        sp.filters.map { case (f, v) => Seq(graft.index.FieldTerms.term(f, v)) } ++
          sp.anyFilters.map { case (f, vs) =>
            vs.distinct.map(v => graft.index.FieldTerms.term(f, v)) } ++
          sp.numericRangeFilters.map { case (f, lo, hi) =>
            graft.index.FieldTerms.trieRangeTerms(f, lo, hi) } ++
          sp.exists.map(f => Seq(graft.index.FieldTerms.existsTerm(f)))
      val bf =
        if (mm.nonEmpty && sp.multiMatchBest)
          Wand.BestFields.of(mm.map(_._1), toks, sp.tieBreaker)
        else null
      Prep(scoredTerms, slots, clauses,
        (sp.mustNot.map { case (f, v) => graft.index.FieldTerms.term(f, v) } ++
          sp.missing.map(f => graft.index.FieldTerms.existsTerm(f)) ++
          sp.mustNotText.flatMap { case (f, w) =>
            Analyzer.tokenize(w).map(t => graft.index.FieldTerms.textTerm(f, t)) }).distinct,
        shouldTerms, sp.rangeFilters, boosts, bf)
    }
    // ALL specs' lexicographic ranges expand in ONE batched dict scan
    val rangeExp: Map[(String, String, String), Map[String, TermStats]] =
      expandFieldRanges(preps.flatMap(_.ranges).distinct)
    val allTerms = preps.flatMap(p =>
      p.scoredTerms ++ p.shouldTerms ++ p.clauses.flatten ++ p.excludeTerms).distinct.sorted
    val found = lookupTerms(allTerms) ++ rangeExp.valuesIterator.flatten
    // per-spec resolution mirrors searchBool's early-empty rules exactly
    val resolved: Seq[Option[(Seq[(String, TermStats)], SearchMode)]] =
      preps.zip(specs).map { case (p, sp) =>
        val needAll = sp.conjunctive || sp.phrase
        val foundClauses = p.clauses.map(_.filter(found.contains)) ++
          p.ranges.map(r => rangeExp(r).keys.toSeq.sorted)
        val shouldFound = p.shouldTerms.filter(found.contains)
        if ((p.scoredTerms.isEmpty && p.shouldTerms.isEmpty) ||
          (sp.phrase && (p.slots == null || p.slots.isEmpty)) ||
          foundClauses.exists(_.isEmpty) ||
          (needAll && p.scoredTerms.exists(t => !found.contains(t))) ||
          (p.scoredTerms.nonEmpty && !p.scoredTerms.exists(found.contains)) ||
          shouldFound.size < sp.minShouldMatch) None
        else {
          val terms = (p.scoredTerms ++ shouldFound ++ foundClauses.flatten ++
            p.excludeTerms).distinct.filter(found.contains)
          Some((terms.map(t => t -> found(t)),
            SearchMode(sp.conjunctive, p.slots, foundClauses,
              p.excludeTerms.filter(found.contains), shouldFound, sp.minShouldMatch,
              null, sp.phraseSlop, p.boosts, p.bestFields)))
        }
      }
    if (!resolved.exists(_.isDefined)) return specs.map(_ => Array.empty[Scored])
    if (localIdx != null)
      return resolved.map {
        case Some((fs, m)) => runLocal(fs.toMap, k, m)
        case None => Array.empty[Scored]
      }
    val nG = stats.n
    val avgdlG = stats.avgdl
    val fStats = fieldStatsMap
    val work: Seq[(Int, Seq[(String, TermStats)], SearchMode)] =
      resolved.zipWithIndex.collect { case (Some((f, m)), i) => (i, f, m) }
    val allStats = work.flatMap(_._2.map(_._2)).groupBy(_.termId).map(_._2.head)
    val rows = selectBlocks(allStats)
      .as[PostingBlock]
      .groupByKey(_.bucket)
      .flatMapGroups { (_, it) =>
        val byTerm = it.toArray.groupBy(_.termId)
        work.iterator.flatMap { case (i, foundSeq, mode) =>
          Searcher.runBucket(byTerm, foundSeq, mode, k, nG, avgdlG, fStats)
            .map(s => (i, s.docId, s.score))
        }
      }
      .collect()
    val grouped = rows.groupBy(_._1)
    specs.indices.map { i =>
      grouped.getOrElse(i, Array.empty)
        .map(r => Scored(r._2, r._3))
        .sortBy(s => (-s.score, s.docId))
        .take(k)
    }
  }

  /** Fielded `match` (ES `{"match": {"<field>": ...}}`): BM25 top-k over
    * ONE analyzed text field of an index built with
    * `IndexConfig.textFieldCols`. Scores use the FIELD's own statistics
    * — df per `%field:token` term, the field's dl in every posting,
    * (docCount, avgdl) from `fieldstats/` — exactly Lucene's per-field
    * model, so a doc's score depends only on that field's content.
    * `field = "text"` is the main field (≡ [[search]]). `phrase` matches
    * the tokens adjacently within the field (positions are per-field).
    */
  def searchField(field: String, query: String, k: Int,
      conjunctive: Boolean = false, phrase: Boolean = false,
      from: Int = 0, slop: Int = 0): Array[Scored] = {
    val toks = Analyzer.tokenize(query).toSeq
    if (toks.isEmpty) return Array.empty
    val slots = if (phrase) toks.map(t => graft.index.FieldTerms.textTerm(field, t)) else null
    val terms =
      if (phrase) slots.distinct.sorted
      else toks.distinct.sorted.map(t => graft.index.FieldTerms.textTerm(field, t))
    val hits = runPerBucket(terms, from + k,
      SearchMode(conjunctive, slots, slop = slop))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** ES `multi_match`: the query's terms score over EVERY listed field
    * under that field's own statistics, scaled by the field's boost.
    * Default mode is most_fields (summed): a doc qualifies by matching
    * ≥ 1 (field, term) pair and its score is ONE sum over all matched
    * pairs in ascending namespaced-term order (the engine-wide
    * determinism rule). `bestFields = true` switches to ES's DEFAULT
    * `best_fields` mode: score = the best field's (boost-scaled) sum +
    * `tieBreaker` · Σ the other fields' sums ([[Wand.BestFields]] —
    * tieBreaker = 0 is pure dis-max, tieBreaker = 1 ≡ most_fields
    * bit-exactly). `fields` are (field, boost) with `"text"` = the main
    * field.
    */
  def multiMatch(query: String, fields: Seq[(String, Double)], k: Int,
      from: Int = 0,
      bestFields: Boolean = false,
      tieBreaker: Double = 0.0): Array[Scored] = {
    require(fields.map(_._1).distinct.size == fields.size, "duplicate field in multiMatch")
    val toks = Analyzer.analyzeQuery(query).toSeq
    if (toks.isEmpty || fields.isEmpty) return Array.empty
    val termBoosts: Seq[(String, Double)] =
      for ((f, b) <- fields; t <- toks) yield graft.index.FieldTerms.textTerm(f, t) -> b
    val bf = if (bestFields) Wand.BestFields.of(fields.map(_._1), toks, tieBreaker) else null
    val hits = runPerBucket(termBoosts.map(_._1).sorted, from + k,
      SearchMode(conjunctive = false, slots = null, boosts = termBoosts.toMap,
        bestFields = bf))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** Conjunctive (AND) BM25 top-k. */
  def searchConjunctive(query: String, k: Int, from: Int = 0): Array[Scored] = {
    val hits = runPerBucket(Analyzer.analyzeQuery(query).toSeq, from + k, Mode(conjunctive = true))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** ES `bool` query: `query` scores (as OR / AND / phrase per the
    * flags), `filters` are filter-context clauses — docs must carry the
    * EXACT field value, matched against the fielded keyword terms an
    * index built with `IndexConfig.fieldCols` stores
    * ([[graft.index.FieldTerms]]) — and `mustNot` excludes docs carrying
    * a value. Filter/must_not clauses never contribute to the score
    * (exact ES filter-context semantics), so scores equal the plain
    * query's scores on the surviving docs.
    *
    * Scale shape: a filter clause is ONE extra posting list in the
    * per-bucket WAND — no doc-store scan, no post-filter of an oversized
    * top-k (which would be unsound), no broadcast of a docId set.
    */
  def searchBool(
      query: String,
      k: Int,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      conjunctive: Boolean = false,
      phrase: Boolean = false,
      /** ES `terms` filter clauses: doc must carry ANY of the values
        * (one union cursor per clause).
        */
      anyFilters: Seq[(String, Seq[String])] = Nil,
      /** ES `range` filter clauses on keyword fields: (field, lo, hi),
        * INCLUSIVE, LEXICOGRAPHIC value order (exact for fixed-width
        * encodings — zero-pad numerics at index time, ISO-8601 dates
        * sort naturally). Expanded against the dictionary (uncapped —
        * a silent expansion cap would drop matching docs), so use
        * [[numericRangeFilters]] for high-cardinality numeric fields.
        */
      rangeFilters: Seq[(String, String, String)] = Nil,
      /** ES `range` clauses on NUMERIC fields indexed via
        * `IndexConfig.numericFieldCols`: (field, lo, hi) inclusive,
        * answered by the tiered trie decomposition
        * ([[graft.index.FieldTerms.trieRangeTerms]]) — a BOUNDED term
        * clause (≤ 512) at ANY value cardinality; no dictionary range
        * scan, no driver-side per-value expansion.
        */
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      /** ES `exists` filter clauses: the doc must HAVE each listed
        * field (non-null keyword/numeric value, ≥ 1 token for analyzed
        * text fields) — answered by the `_field_names`-style exists
        * marker an index built with field columns stores
        * ([[graft.index.FieldTerms.existsTerm]]): one more posting
        * cursor, never a doc-store scan.
        */
      exists: Seq[String] = Nil,
      /** ES `must_not exists` ("missing"): docs carrying the field are
        * vetoed — the exists marker rides the must_not cursor set.
        */
      missing: Seq[String] = Nil,
      /** ES bool `must_not` over ANALYZED text ((field, token), "text"
        * = main field — the Lucene `-term` clause): the token's docs
        * are vetoed via the same exclude cursors as keyword mustNot.
        */
      mustNotText: Seq[(String, String)] = Nil,
      /** ES bool `should`: an analyzed query whose terms optionally add
        * score (terms already in the must query are dropped — groups
        * must be disjoint).
        */
      should: String = "",
      /** ES `minimum_should_match`: a doc must match ≥ this many
        * distinct should terms. With an empty `query`, shoulds alone
        * drive the search (pure m-of-n).
        */
      minShouldMatch: Int = 0,
      /** Pagination offset (ES `from`): skip the first `from` hits of
        * the (score desc, docId asc) ranking. Deep paging costs
        * from + k per bucket — the documented ES tradeoff; prefer
        * [[searchAfter]]-style cursors for deep pages.
        */
      from: Int = 0,
      /** ES `search_after` cursor: only hits ranked strictly after this
        * (score, docId) are returned. Composes with `from` (applied
        * after the cursor).
        */
      after: Scored = null,
      /** ES `slop` for `phrase = true` (full sloppy semantics —
        * reordered terms match from slop ≥ 2).
        */
      phraseSlop: Int = 0,
      /** Analyzed field the `query` matches over ("text" = main field) —
        * per-field BM25, same as [[searchField]]; a fielded match WITH
        * filter clauses no longer needs a batch-of-one (round-5 review
        * "What's missing #2").
        */
      field: String = "text",
      /** ES `multi_match` inside the bool `must`: when non-empty,
        * overrides `field` — the query's terms score over every (field,
        * boost) under that field's stats (OR mode; same semantics as
        * [[multiMatch]], incl. `multiMatchBest`/`tieBreaker`).
        */
      multiMatchFields: Seq[(String, Double)] = Nil,
      multiMatchBest: Boolean = false,
      tieBreaker: Double = 0.0
  ): Array[Scored] = {
    guardExists(exists, missing)
    val mm = multiMatchFields
    require(mm.isEmpty || (!phrase && !conjunctive),
      "multiMatchFields is OR-mode only (like multiMatch)")
    val toks = Analyzer.tokenize(query).toSeq
    val slots = if (phrase) toks.map(t => graft.index.FieldTerms.textTerm(field, t)) else null
    val scoredTerms =
      if (mm.nonEmpty)
        (for ((f, _) <- mm; t <- toks.distinct)
          yield graft.index.FieldTerms.textTerm(f, t)).distinct.sorted
      else if (phrase) Option(slots).getOrElse(Nil).distinct.sorted
      else toks.distinct.sorted.map(t => graft.index.FieldTerms.textTerm(field, t))
    val boosts: Map[String, Double] =
      if (mm.isEmpty) Map.empty
      else (for ((f, b) <- mm; t <- toks.distinct)
        yield graft.index.FieldTerms.textTerm(f, t) -> b).toMap
    val bf =
      if (mm.nonEmpty && multiMatchBest) Wand.BestFields.of(mm.map(_._1), toks, tieBreaker)
      else null
    val shouldTerms =
      Analyzer.analyzeQuery(should).filterNot(scoredTerms.contains).toSeq
    if ((scoredTerms.isEmpty && shouldTerms.isEmpty) || (phrase && slots.isEmpty))
      return Array.empty
    val clauses: Seq[Seq[String]] =
      filters.map { case (f, v) => Seq(graft.index.FieldTerms.term(f, v)) } ++
        anyFilters.map { case (f, vs) =>
          vs.distinct.map(v => graft.index.FieldTerms.term(f, v))
        } ++
        numericRangeFilters.map { case (f, lo, hi) =>
          graft.index.FieldTerms.trieRangeTerms(f, lo, hi)
        } ++
        exists.map(f => Seq(graft.index.FieldTerms.existsTerm(f)))
    // range expansion already returns the TermStats rows (one dict scan,
    // no second lookup job over the expanded term list)
    val rangeExp: Seq[Map[String, TermStats]] =
      rangeFilters.map { case (f, lo, hi) => expandFieldRange(f, lo, hi) }
    val excludeTerms = (mustNot.map { case (f, v) => graft.index.FieldTerms.term(f, v) } ++
      missing.map(f => graft.index.FieldTerms.existsTerm(f)) ++
      mustNotText.flatMap { case (f, w) =>
        Analyzer.tokenize(w).map(t => graft.index.FieldTerms.textTerm(f, t)) }).distinct
    val found = lookupTerms(
      scoredTerms ++ shouldTerms ++ clauses.flatten.distinct ++ excludeTerms) ++
      rangeExp.flatten
    // a clause with no value present anywhere in the index ⇒ no match.
    // (A trie range clause keeps only the cells some doc actually
    // carries — an all-absent decomposition means nothing is in range.)
    val foundClauses = clauses.map(_.filter(found.contains)) ++
      rangeExp.map(_.keys.toSeq.sorted)
    if (foundClauses.exists(_.isEmpty)) return Array.empty
    val needAll = conjunctive || phrase
    if (needAll && scoredTerms.exists(t => !found.contains(t))) return Array.empty
    if (scoredTerms.nonEmpty && !scoredTerms.exists(found.contains)) return Array.empty
    val shouldFound = shouldTerms.filter(found.contains)
    if (shouldFound.size < minShouldMatch) return Array.empty
    val hits = runFound(found, from + k,
      SearchMode(conjunctive, slots, foundClauses, excludeTerms.filter(found.contains),
        shouldFound, minShouldMatch, after, phraseSlop, boosts, bf))
    if (from == 0) hits else hits.slice(from, from + k)
  }

  /** ES `search_after` page continuation: the next k hits strictly after
    * the (score, docId) cursor — sound with WAND because the cursor only
    * filters offers; pruning still uses the page's own θ.
    */
  def searchAfter(query: String, k: Int, after: Scored): Array[Scored] =
    runPerBucket(Analyzer.analyzeQuery(query).toSeq, k,
      SearchMode(conjunctive = false, slots = null, after = after))

  /** Dictionary expansion of a lexicographic value range on a keyword
    * field: every stored `#field:value` term with lo ≤ value ≤ hi.
    * Warm dictMap filters on the driver (zero jobs); cold, ONE dict
    * scan (the term-sorted parquet makes the prefix a row-group range
    * scan, like searchPrefix). NOT capped: a range filter must see
    * every matching value or it silently drops docs.
    */
  private def expandFieldRange(field: String, lo: String, hi: String): Map[String, TermStats] = {
    val prefix = graft.index.FieldTerms.term(field, "")
    def inRange(v: String): Boolean = lo <= v && v <= hi
    if (dictMap != null)
      dictMap.view
        .filterKeys(t => t.startsWith(prefix) && inRange(t.substring(prefix.length)))
        .toMap
    else {
      val valueCol = col("term").substr(lit(prefix.length + 1), lit(Int.MaxValue))
      dict.filter(col("term").startsWith(prefix) &&
          valueCol >= lit(lo) && valueCol <= lit(hi))
        .as[TermStats].collect().map(ts => ts.term -> ts).toMap
    }
  }

  /** Batched variant for `searchManyBool`: EVERY range expands off one
    * dictionary scan (OR of the per-range predicates), partitioned back
    * per range on the driver — the batch keeps its one-job contract.
    */
  private def expandFieldRanges(ranges: Seq[(String, String, String)])
      : Map[(String, String, String), Map[String, TermStats]] = {
    val distinct = ranges.distinct
    if (distinct.isEmpty) return Map.empty
    def matches(r: (String, String, String), term: String): Boolean = {
      val prefix = graft.index.FieldTerms.term(r._1, "")
      term.startsWith(prefix) && {
        val v = term.substring(prefix.length)
        r._2 <= v && v <= r._3
      }
    }
    val rows: Seq[TermStats] =
      if (dictMap != null)
        dictMap.valuesIterator.filter(ts => distinct.exists(matches(_, ts.term))).toSeq
      else {
        val preds = distinct.map { case (f, lo, hi) =>
          val prefix = graft.index.FieldTerms.term(f, "")
          val valueCol = col("term").substr(lit(prefix.length + 1), lit(Int.MaxValue))
          col("term").startsWith(prefix) && valueCol >= lit(lo) && valueCol <= lit(hi)
        }
        dict.filter(preds.reduce(_ || _)).as[TermStats].collect().toSeq
      }
    distinct.map(r =>
      r -> rows.filter(ts => matches(r, ts.term)).map(ts => ts.term -> ts).toMap).toMap
  }

  // --- term-expansion queries (ES prefix / wildcard / fuzzy) --------------

  /** Unit-cost Levenshtein — MUST agree with Spark's
    * functions.levenshtein and DuckDB's levenshtein (the oracle twins).
    * Shared with the cross-segment searcher via [[Expansion]].
    */
  private[graft] def levenshtein(a: String, b: String): Int =
    Expansion.levenshtein(a, b)

  /** Matching dictionary terms for a predicate over the tokens of ONE
    * analyzed field (`"text"` = the main namespace; any other field
    * matches within its `%field:` namespace — ES expands prefix/
    * wildcard/fuzzy against the NAMED field's terms, round-5 review
    * "What's missing #3"): ascending term order, capped at
    * maxExpansions (the ES rewrite rule — deterministic, so the oracle
    * twin reproduces the same set whenever the cap is not hit). The
    * predicate always sees the BARE token (namespace stripped). Warm
    * dictMap filters on the driver; otherwise ONE distributed dict scan
    * (a prefix predicate cannot shard-prune — the dictionary's
    * term-sorted parquet makes it a row-group range scan instead).
    */
  private def expand(
      scalaPred: String => Boolean,
      sqlPredOf: Column => Column,
      maxExpansions: Int,
      field: String = "text",
      /** Bare-token length bounds implied by the predicate (edit-
        * distance queries: |len − |w|| ≤ maxDist). The cold dict scan
        * pushes it to the STORED `len` column (format v2 dicts — a
        * plain int range the parquet reader evaluates before any
        * levenshtein), so the per-row predicate only runs on length-
        * plausible survivors; legacy dicts without the column skip the
        * prune (the predicate already implies it — correctness
        * unchanged). Round-6 review "What's wrong #3".
        */
      lenRange: Option[(Int, Int)] = None
  ): Map[String, TermStats] = {
    def pruned(d: DataFrame): DataFrame = lenRange match {
      case Some((lo, hi)) if d.columns.contains("len") =>
        d.filter(col("len").between(lit(lo), lit(hi)))
      case _ => d
    }
    // the deterministic term-asc cap lives IN the plan on the cold path
    // (TakeOrderedAndProject: per-partition heaps of ≤ maxExpansions,
    // the driver sees ≤ maxExpansions rows) — a low-selectivity regexp /
    // infix wildcard on a 10^9-term dictionary must never collect the
    // whole match before capping (round-7 review "What's wrong #1")
    def capped(d: DataFrame): Seq[TermStats] =
      d.orderBy(col("term")).limit(maxExpansions).as[TermStats].collect().toSeq
    val all =
      if (field == "text") {
        // main-text namespace only: fielded keyword terms ('#field:v')
        // AND fielded text terms ('%field:tok') share the dictionary but
        // must never match a main-TEXT pattern — ES keeps sub-fields out
        // of analyzed-field term expansion; neither prefix can appear in
        // analyzer output, so the guard is exact
        val notField = !col("term").startsWith(graft.index.FieldTerms.Prefix) &&
          !col("term").startsWith(graft.index.FieldTerms.TextPrefix)
        if (dictMap != null)
          dictMap.valuesIterator
            .filter(ts => !graft.index.FieldTerms.isNamespaced(ts.term) && scalaPred(ts.term))
            .toSeq
        else capped(pruned(dict).filter(notField && sqlPredOf(col("term"))))
      } else {
        val pfx = graft.index.FieldTerms.textTerm(field, "")
        if (dictMap != null)
          dictMap.valuesIterator
            .filter(ts => ts.term.startsWith(pfx) && scalaPred(ts.term.substring(pfx.length)))
            .toSeq
        else capped(pruned(dict).filter(col("term").startsWith(pfx) &&
            sqlPredOf(col("term").substr(lit(pfx.length + 1), lit(Int.MaxValue)))))
      }
    all.sortBy(_.term).take(maxExpansions).map(ts => ts.term -> ts).toMap
  }

  /** Per-token capped edit-distance expansion — the multi-token rewrite
    * ([[searchMatchFuzzy]], [[phraseSuggest]]) with the cap IN the plan:
    * ONE len-pruned dictionary scan; each surviving row explodes to the
    * query tokens within `maxDist` of its bare token; a rank-≤-cap
    * window per token (Catalyst's InferWindowGroupLimit turns the
    * `row_number ≤ cap` filter into PRE-SHUFFLE per-partition group
    * limits), so the driver collects ≤ |tokens| × cap rows at ANY
    * vocabulary size — never the whole distance match (round-7 review
    * "What's wrong #1": the Int.MaxValue call sites). Ranking per token:
    * `byDistDf = false` → term asc (the match-fuzzy per-token rewrite);
    * `true` → (distance asc, df desc, term asc) — the term-suggester
    * rule the phrase suggester's slots use. Warm dictMap filters on the
    * driver (zero jobs), length-pre-filtered before any levenshtein.
    */
  private def expandPerToken(toks: Seq[String], maxDist: Int, perTokenCap: Int,
      field: String, byDistDf: Boolean): Map[String, Seq[TermStats]] = {
    if (toks.isEmpty) return Map.empty
    val lo = math.max(1, toks.map(_.length).min - maxDist)
    val hi = toks.map(_.length).max + maxDist
    val pfx = if (field == "text") "" else graft.index.FieldTerms.textTerm(field, "")
    val bareOf: String => String =
      t => if (pfx.isEmpty) t else t.substring(pfx.length)
    def rank(w: String, cands: Iterable[TermStats]): Seq[TermStats] = {
      val in = cands.iterator
        .map(ts => (ts, Expansion.levenshtein(w, bareOf(ts.term))))
        .filter(_._2 <= maxDist).toSeq
      val ordered =
        if (byDistDf) in.sortBy { case (ts, d) => (d, -ts.df, ts.term) }
        else in.sortBy(_._1.term)
      ordered.take(perTokenCap).map(_._1)
    }
    if (dictMap != null) {
      val pool = dictMap.valuesIterator.filter { ts =>
        (if (pfx.isEmpty) !graft.index.FieldTerms.isNamespaced(ts.term)
         else ts.term.startsWith(pfx)) && {
          val l = bareOf(ts.term).length; l >= lo && l <= hi
        }
      }.toSeq
      return toks.distinct.map(w => w -> rank(w, pool)).toMap
    }
    val nsPred =
      if (pfx.isEmpty)
        !col("term").startsWith(graft.index.FieldTerms.Prefix) &&
          !col("term").startsWith(graft.index.FieldTerms.TextPrefix)
      else col("term").startsWith(pfx)
    val bareCol =
      if (pfx.isEmpty) col("term")
      else col("term").substr(lit(pfx.length + 1), lit(Int.MaxValue))
    val lenPruned =
      if (dict.columns.contains("len"))
        dict.filter(col("len").between(lit(lo), lit(hi)))
      else dict
    val tokArr = array(toks.distinct.sorted.map(lit): _*)
    val ordCols =
      if (byDistDf)
        Seq(org.apache.spark.sql.functions.levenshtein(col("__tok"), bareCol).asc,
          col("df").desc, col("term").asc)
      else Seq(col("term").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__tok")).orderBy(ordCols: _*)
    val rows = lenPruned.filter(nsPred)
      .select(col("term"), col("termId"), col("shard"), col("df"), col("cf"),
        col("maxScore"),
        explode(org.apache.spark.sql.functions.filter(tokArr,
          t => org.apache.spark.sql.functions.levenshtein(t, bareCol) <= lit(maxDist)))
          .as("__tok"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(perTokenCap))
      .select(col("__tok"), col("term"), col("termId"), col("shard"), col("df"),
        col("cf"), col("maxScore"))
      .as[(String, String, Long, Int, Long, Long, Double)]
      .collect()
    val byTok = rows.toSeq.groupBy(_._1).view
      .mapValues(_.map { case (_, t, tid, sh, df, cf, ms) =>
        TermStats(t, tid, sh, df, cf, ms)
      }).toMap
    // re-rank the ≤ cap survivors on the driver (collect order is
    // partition-arbitrary; the window already selected the right SET)
    toks.distinct.map(w => w -> rank(w, byTok.getOrElse(w, Nil))).toMap
  }

  /** Prefix query (ES `prefix`, rewrite = scoring boolean): BM25 OR over
    * the ≤ maxExpansions index terms starting with the analyzed prefix;
    * `field` expands (and scores) within that analyzed field.
    */
  def searchPrefix(prefix: String, k: Int, maxExpansions: Int = 50,
      field: String = "text"): Array[Scored] = {
    val toks = Analyzer.tokenize(prefix)
    if (toks.isEmpty) return Array.empty
    val p = toks(0)
    runFound(expand(_.startsWith(p), _.startsWith(p), maxExpansions, field),
      k, Mode(conjunctive = false))
  }

  /** Wildcard query (ES `wildcard`): `*` = any run, `?` = one char,
    * matched against whole analyzed terms; BM25 OR over the expansion.
    */
  def searchWildcard(pattern: String, k: Int, maxExpansions: Int = 50,
      field: String = "text"): Array[Scored] = {
    val pat = pattern.toLowerCase(java.util.Locale.ROOT)
    val rx = Expansion.wildcardRegex(pat)
    val like = Expansion.wildcardLike(pat)
    runFound(expand(t => rx.findFirstIn(t).isDefined, _.like(like), maxExpansions, field),
      k, Mode(conjunctive = false))
  }

  /** Fuzzy query (ES `fuzziness`): BM25 OR over index terms within
    * edit distance maxDist of the analyzed term. Both scan paths prune
    * by bare-token length FIRST (levenshtein ≥ |len difference|, so the
    * bound is exact): the warm driver map with an int compare, the cold
    * dict scan with the stored `len` column's pushed range filter.
    * `prefixLength` > 0 (ES `prefix_length`) additionally requires
    * candidates to share the term's first N chars — and turns the cold
    * scan into a `startsWith` the TERM-SORTED dict parquet row-group
    * prunes (the cheap-fuzzy pattern ES recommends at scale).
    */
  def searchFuzzy(term: String, k: Int, maxDist: Int = 1,
      maxExpansions: Int = 50, field: String = "text",
      prefixLength: Int = 0): Array[Scored] = {
    val toks = Analyzer.tokenize(term)
    if (toks.isEmpty) return Array.empty
    val t0 = toks(0)
    // Lucene rule: prefix_length ≥ len(term) degrades FuzzyQuery to an
    // EXACT term query — without this, terms EXTENDING the input within
    // maxDist would still match (round-7 review)
    if (prefixLength >= t0.length)
      return runFound(
        expand(_ == t0, _ === lit(t0), maxExpansions, field,
          lenRange = Some((t0.length, t0.length))),
        k, Mode(conjunctive = false))
    val pfx = t0.take(prefixLength)
    runFound(
      expand(t => t.startsWith(pfx) && math.abs(t.length - t0.length) <= maxDist &&
          levenshtein(t0, t) <= maxDist,
        c => c.startsWith(pfx) &&
          org.apache.spark.sql.functions.levenshtein(lit(t0), c) <= lit(maxDist),
        maxExpansions, field,
        lenRange = Some((math.max(1, t0.length - maxDist), t0.length + maxDist))),
      k, Mode(conjunctive = false))
  }

  /** ES `constant_score`: every doc matching the bool membership
    * (scored terms OR'd + all filter-context clauses) scores exactly
    * `boost` — no BM25, no WAND; membership is the same decoded match
    * set every aggregation uses, ranked (docId asc — deterministic; ES
    * leaves constant-score ties arbitrary) via TakeOrderedAndProject.
    */
  def searchConstantScore(query: String, k: Int, boost: Double = 1.0,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame =
    matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
      rangeFilters, exists, missing)
      .orderBy(col("docId")).limit(k)
      .withColumn("score", lit(boost))

  /** ES `boosting` query: hits are the docs matching the POSITIVE
    * query (plain disjunctive BM25); a hit that ALSO matches the
    * negative query keeps its rank eligibility but its score is
    * multiplied by `negativeBoost` (< 1 demotes — ES requires
    * 0 ≤ negative_boost; matching negative alone never matches). Plan:
    * the exact scored match set of the positive terms
    * ([[scoredMatches]] — the collapse/aggs shape; WAND's bounds
    * don't survive per-doc demotion, so ES-exact top-k needs the full
    * match set) left-joined against the negative MEMBERSHIP set
    * (docIds only — no scoring work), one conditional multiply, then
    * TakeOrderedAndProject top-k. Returns (doc_id, score), score desc
    * / doc_id asc.
    */
  def boosting(positive: String, negative: String, k: Int,
      negativeBoost: Double = 0.5): DataFrame = {
    require(k > 0, "boosting size must be positive")
    require(negativeBoost >= 0, "negative_boost must be >= 0 (ES contract)")
    scoredMatches(Analyzer.analyzeQuery(positive).toSeq) match {
      case None =>
        Seq.empty[(Long, Double)].toDF("doc_id", "score")
      case Some(pos) =>
        val neg = matchingOrEmpty(negative)
          .select(col("docId"), lit(true).as("__neg"))
        pos.join(neg, Seq("docId"), "left")
          .select(col("docId").as("doc_id"),
            when(col("__neg").isNotNull, col("score") * lit(negativeBoost))
              .otherwise(col("score")).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(k)
    }
  }

  /** ES `function_score` `field_value_factor` applied as a RESCORE
    * window (the `rescore` pattern): the top `window` hits by plain
    * BM25 re-rank by score' = bm25 · (factor · fieldValue), top `k`.
    * ES itself applies function scores through bounded rescoring at
    * scale — WAND's score upper bounds do not survive arbitrary
    * per-doc multipliers, so the exact-top-k contract holds for the
    * WINDOW (any doc outside the BM25 top-`window` cannot enter, ES
    * rescore semantics). One broadcast join of `window` rows against
    * the column-pruned doc store; `modifier = "none"` (the linear ES
    * modifier) keeps the arithmetic one multiply — bit-reproducible in
    * the SQL twin.
    */
  def rescoreByFieldFactor(query: String, k: Int, window: Int,
      field: String, factor: Double,
      /** ES `field_value_factor.missing`: substituted for docs whose
        * field is NULL. None = fail loudly on the first null (ES
        * errors without `missing`) — a silent NULL score would sort
        * last yet still surface when < k non-null hits exist
        * (round-7 ADVICE).
        */
      missing: Option[Double] = None): DataFrame = {
    require(window >= k, "rescore window must be >= k")
    val top = runPerBucket(Analyzer.analyzeQuery(query).toSeq, window,
      Mode(conjunctive = false))
    val topDF = top.toSeq.map(h => (h.docId, h.score)).toDF("docId", "bm25")
    // window-bounded fetch: push In(docId, ...) to the doc-store scan
    // (row-group pruning) — round-7 review #8
    docs.filter(col("docId").isin(top.map(_.docId).toSeq: _*))
      .select(col("docId"), Searcher.fvfValue(col(field), field, missing))
      .join(broadcast(topDF), Seq("docId"))
      .select(col("docId"),
        (col("bm25") * (lit(factor) * col("__fv"))).as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** ES `function_score` decay (gauss/exp/linear on a numeric or date
    * field — round-7 review "What's missing #2": recency boosting on
    * the reference's `created`/`lastChanged` date mapping, here `ts`)
    * applied through the same bounded RESCORE window as
    * [[rescoreByFieldFactor]]: the top `window` hits by exact BM25
    * re-rank by score' = bm25 · decay(fieldValue), top `k` — ES rescore
    * semantics (a doc outside the BM25 top-window cannot enter; WAND
    * bounds don't survive arbitrary per-doc multipliers, so ES itself
    * bounds function scores this way at scale). Timestamp fields decay
    * on their epoch-millis; `origin`/`scale`/`offset` are in the
    * field's units (millis for dates). One broadcast join of `window`
    * rows against the column-pruned doc store.
    */
  def rescoreByDecay(query: String, k: Int, window: Int, field: String,
      shape: String, origin: Double, scale: Double,
      offset: Double = 0.0, decay: Double = 0.5,
      missing: Option[Double] = None): DataFrame = {
    require(window >= k, "rescore window must be >= k")
    val top = runPerBucket(Analyzer.analyzeQuery(query).toSeq, window,
      Mode(conjunctive = false))
    val topDF = top.toSeq.map(h => (h.docId, h.score)).toDF("docId", "bm25")
    val vCol = docs.schema(field).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        unix_millis(col(field)).cast("double")
      case _ => col(field).cast("double")
    }
    docs.filter(col("docId").isin(top.map(_.docId).toSeq: _*))
      .select(col("docId"), Searcher.fvfValue(vCol, field, missing))
      .join(broadcast(topDF), Seq("docId"))
      .select(col("docId"), (col("bm25") *
        FunctionScore.decayMultiplier(col("__fv"), shape, origin, scale, offset, decay))
        .as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** ES `regexp` query: the pattern anchors to the WHOLE analyzed term
    * (Lucene regexp semantics — `sp.rk` matches `spark`, never a term
    * merely containing it); BM25 OR over the ≤ maxExpansions matching
    * dictionary terms (term-asc — the deterministic rewrite). The
    * compiled predicate rides the same `expand` machinery as prefix/
    * wildcard/fuzzy; `field` expands within that analyzed field's
    * namespace. Cold path is one dict scan (`rlike` with the anchored
    * pattern); warm path matches the driver map.
    */
  def searchRegexp(pattern: String, k: Int, maxExpansions: Int = 50,
      field: String = "text"): Array[Scored] = {
    val p = java.util.regex.Pattern.compile(pattern)
    val anchored = "^(?:" + pattern + ")$"
    runFound(
      expand(t => p.matcher(t).matches(), _.rlike(anchored), maxExpansions, field),
      k, Mode(conjunctive = false))
  }

  /** ES `match` with `fuzziness` (round-6 review "What's missing #4"):
    * EVERY analyzed query token expands to the dictionary terms within
    * `maxDist` edits of it (per-token term-asc cap — the ES per-term
    * rewrite; dist 0 keeps the token itself when indexed), and the
    * union scores as ONE BM25 OR. Documented deviation from ES: each
    * expansion scores with its OWN df/idf (ES's blended rewrite reuses
    * the original term's df across its expansions) — the integer-exact
    * per-token selection keeps the SQL twin bit-reproducible. Cold path
    * is ONE dict scan for ALL tokens (length-pruned to the union of the
    * per-token `len` windows), never a scan per token.
    */
  def searchMatchFuzzy(query: String, k: Int, maxDist: Int = 1,
      maxExpansionsPerTerm: Int = 50, field: String = "text"): Array[Scored] = {
    val toks = Analyzer.analyzeQuery(query).toSeq.sorted
    if (toks.isEmpty) return Array.empty
    runFound(multiFuzzyExpand(toks, maxDist, maxExpansionsPerTerm, field),
      k, Mode(conjunctive = false))
  }

  /** Per-token capped fuzzy expansion of `toks`, ONE dictionary scan
    * with the per-token term-asc cap IN the plan ([[expandPerToken]]):
    * the driver sees ≤ |tokens| × cap dictionary rows at any vocabulary
    * size (round-7 review "What's wrong #1").
    */
  private def multiFuzzyExpand(toks: Seq[String], maxDist: Int,
      perTermCap: Int, field: String): Map[String, TermStats] =
    expandPerToken(toks, maxDist, perTermCap, field, byDistDf = false)
      .valuesIterator.flatten.map(ts => ts.term -> ts).toMap

  /** ES `dis_max` as a general combinator (round-6 review "What's
    * missing #4"): score = best-scoring sub-query's BM25 sum +
    * `tieBreaker` · Σ(the other matching sub-queries' sums) — the
    * [[Wand.BestFields]] fold generalized from multi_match fields to
    * arbitrary match sub-queries (tie_breaker = 1 degenerates to the
    * plain bool-OR sum, pinned by test). Sub-queries MAY share analyzed
    * terms (round-7 review "What's missing #5" — ES scores each
    * sub-query independently): a shared term gets one scored iterator
    * PER containing group, each attributed to its group's sum; sums
    * tie to the lowest group index. Docs matching ANY sub-query rank.
    */
  def searchDisMax(queries: Seq[String], k: Int,
      tieBreaker: Double = 0.0): Array[Scored] = {
    val groups = queries.map(q => Analyzer.analyzeQuery(q).toSeq.distinct.sorted)
    require(groups.exists(_.nonEmpty), "dis_max needs >= 1 non-empty sub-query")
    val groupsOf: Map[String, Seq[Int]] = groups.zipWithIndex
      .flatMap { case (ts, i) => ts.map(_ -> i) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    runPerBucket(groups.flatten.distinct.sorted, k, Mode(conjunctive = false).copy(
      bestFields = new Wand.BestFields(Map.empty, groups.size, tieBreaker, groupsOf)))
  }

  /** ES term suggester ("did you mean"): dictionary terms within
    * `maxDist` edits of the analyzed input word, ranked (distance asc,
    * df desc, term asc) — ES's default sort, deterministic. The
    * candidate set is the ≤ `maxCandidates` term-asc dictionary terms
    * matching the distance predicate (same deterministic cap rule as
    * every expansion); the input word itself is excluded (ES
    * suggest_mode=missing shape — you suggest for misspellings).
    * Returns (suggestion, dist, df) rows, top `k`.
    */
  def suggestTerms(word: String, k: Int, maxDist: Int = 1,
      maxCandidates: Int = 1000): DataFrame = {
    val toks = Analyzer.tokenize(word)
    if (toks.isEmpty) return Seq.empty[(String, Int, Long)].toDF("suggestion", "dist", "df")
    val w = toks(0)
    val cands = expand(
      t => t != w && math.abs(t.length - w.length) <= maxDist &&
        levenshtein(w, t) <= maxDist,
      c => c =!= lit(w) &&
        org.apache.spark.sql.functions.levenshtein(lit(w), c) <= lit(maxDist),
      maxCandidates,
      lenRange = Some((math.max(1, w.length - maxDist), w.length + maxDist)))
    cands.values.toSeq
      .map(ts => (ts.term, levenshtein(w, ts.term), ts.df))
      .sortBy { case (t, d, df) => (d, -df, t) }
      .take(k)
      .toDF("suggestion", "dist", "df")
  }

  /** ES completion-suggester analog (search-as-you-type): the top `k`
    * dictionary terms extending `prefix`, ranked by POPULARITY —
    * (df desc, term asc); df is the suggestion's weight, the natural
    * corpus-derived analog of ES's indexed completion weight. The cap
    * is IN the plan — `orderBy(df desc, term asc).limit(k)` on the
    * prefix-pruned dict scan (TakeOrderedAndProject: the driver sees ≤
    * k rows at any vocabulary size; the startsWith pushes to the
    * term-sorted dict parquet). Warm path filters the driver map.
    * Returns (suggestion, weight) rows.
    */
  def suggestCompletion(prefix: String, k: Int): DataFrame = {
    require(prefix.nonEmpty, "completion prefix must be non-empty")
    require(k > 0, "completion size must be positive")
    val p = Analyzer.analyzeQuery(prefix).headOption.getOrElse("")
    if (p.isEmpty) return Seq.empty[(String, Long)].toDF("suggestion", "weight")
    if (dictMap != null)
      return dictMap.valuesIterator
        .filter(ts => !graft.index.FieldTerms.isNamespaced(ts.term) &&
          ts.term.startsWith(p))
        .toSeq.sortBy(ts => (-ts.df, ts.term)).take(k)
        .map(ts => (ts.term, ts.df))
        .toDF("suggestion", "weight")
    dict
      .filter(!col("term").startsWith(graft.index.FieldTerms.Prefix) &&
        !col("term").startsWith(graft.index.FieldTerms.TextPrefix) &&
        col("term").startsWith(p))
      .orderBy(col("df").desc, col("term").asc).limit(k)
      .select(col("term").as("suggestion"), col("df").as("weight"))
  }

  /** ES phrase suggester ("did you mean" over whole queries, round-6
    * review "What's missing #5"): every analyzed input token expands to
    * its ≤ `maxPerSlot` best correction candidates (dist ≤ maxDist
    * INCLUDING the token itself when indexed, ranked dist asc / df desc
    * / term asc — the term-suggester rule), candidate phrases are the
    * slot product, and each phrase is scored by the SUM of its adjacent
    * bigram doc-counts — derived from the POSITIONAL POSTINGS already
    * stored (one pruned block scan + one self-join on (docId, pos+1);
    * never a corpus re-tokenize). Integer-exact and deterministic, so
    * the DuckDB twin reproduces scores bit-for-bit (ES ranks by a
    * smoothed bigram LM — deviation documented). Returns (suggestion,
    * score) rows, top `k` by (score desc, phrase asc).
    */
  def phraseSuggest(phrase: String, k: Int, maxDist: Int = 1,
      maxPerSlot: Int = 3): DataFrame = {
    val slots = Analyzer.tokenize(phrase).toSeq
    val empty = Seq.empty[(String, Long)].toDF("suggestion", "score")
    if (slots.length < 2) return empty
    // per-slot candidates with the (dist asc, df desc, term asc) ≤
    // maxPerSlot rank IN the plan — one dict scan, ≤ slots × maxPerSlot
    // rows to the driver (round-7 review "What's wrong #1")
    val candMap = expandPerToken(slots, maxDist, maxPerSlot, "text", byDistDf = true)
    val slotCands: Seq[Seq[String]] = slots.map(w =>
      candMap.getOrElse(w, Nil).map(_.term))
    if (slotCands.exists(_.isEmpty)) return empty
    val bigram = bigramDocCounts(Searcher.slotPairs(slotCands))
    Searcher.phraseSuggestFrom(spark, slotCands, bigram, k)
  }

  /** Corpus doc-counts of adjacent bigrams (a at position p, b at p+1)
    * for the requested (a, b) pairs, from the positional postings: ONE
    * shard+termId-pruned block scan over the pairs' terms, decoded to
    * (term, docId, pos), self-joined on the equi-key (docId, pos+1) —
    * both sides hash-partition on docId, no driver materialization of
    * position streams. Cost is bounded by the candidate terms' posting
    * sizes (exactly what ES's phrase suggester reads for its collate).
    */
  private def bigramDocCounts(pairs: Seq[(String, String)]): Map[(String, String), Long] = {
    if (pairs.isEmpty) return Map.empty
    val terms = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val found = lookupTerms(terms)
    val pairsFound = pairs.distinct.filter(p => found.contains(p._1) && found.contains(p._2))
    if (pairsFound.isEmpty) return Map.empty
    // termId → term resolved INSIDE the decode closure from the tiny
    // driver map (rides the task closure) — the broadcast join here was
    // one more job + exchange per call (round-9)
    val idToTerm: Map[Long, String] = found.map { case (t, ts) => (ts.termId, t) }
    val exploded = selectBlocks(found.values).as[PostingBlock]
      .flatMap { b =>
        val d = graft.index.Codec.decodeBlock(b)
        val poss = graft.index.Codec.decodePositions(b, d.tfs)
        // loud like the phrase executor — a silent empty would return
        // all-zero bigram scores (wrong ranking), not an obvious error
        if (poss == null) throw new IllegalStateException(
          "index stores no positions — phrase_suggest needs storePositions=true")
        val term = idToTerm(b.termId)
        for {
          i <- d.docIds.indices.iterator
          p <- poss(i).iterator
        } yield (term, d.docIds(i), p)
      }.toDF("term", "docId", "pos")
    Searcher.bigramCountsOf(exploded, pairsFound)
  }

  /** ES `more_like_this` (by document): the source doc's terms are
    * ranked by the deterministic rare-first rule (tf desc, df asc,
    * term asc — an integer-exact tf·idf proxy, so the oracle twin
    * reproduces the selection bit-for-bit), the top `maxQueryTerms`
    * become an OR query, and the source doc is excluded from the hits
    * (ES `include = false` default).
    */
  def moreLikeThis(docId: Long, k: Int, maxQueryTerms: Int = 25,
      minTermFreq: Int = 1): Array[Scored] = {
    val row = docs.filter(col("docId") === lit(docId))
      .select(col("text")).limit(1).collect()
    if (row.isEmpty) return Array.empty
    val tf = Analyzer.tokenize(row(0).getString(0))
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
      .filter(_._2 >= minTermFreq)
    val found = lookupTerms(tf.keys.toSeq.sorted)
    val selected = tf.toSeq
      .flatMap { case (t, f) => found.get(t).map(ts => (t, f, ts.df)) }
      .sortBy { case (t, f, df) => (-f, df, t) }
      .take(maxQueryTerms).map(_._1)
    if (selected.isEmpty) return Array.empty
    runFound(selected.map(t => t -> found(t)).toMap, k + 1,
      Mode(conjunctive = false))
      .filter(_.docId != docId).take(k)
  }

  /** Top-k resolved hits with ES-style highlighted fragments
    * ([[Highlight]]): ±`window` analyzed tokens around the first query
    * term, matches wrapped in `<em></em>`. Fragment building runs on
    * the k RESOLVED rows only (the lone UDF in the query path — k-row
    * post-processing of already-collected hits, not a corpus operator).
    * `field` ≠ "text" highlights a fielded match ([[searchField]]) in
    * the FIELD's own stored column (round-5 review "What's missing #3"):
    * the hit is ranked by per-field BM25 and the fragment is built from
    * that field's text.
    */
  def searchHighlighted(query: String, k: Int, window: Int = 5,
      field: String = "text",
      /** ES `number_of_fragments`: 1 (default) keeps the single
        * first-match `fragment` column; > 1 returns a `fragments`
        * array column instead — the best N non-overlapping windows
        * ([[Highlight.fragments]]).
        */
      numberOfFragments: Int = 1): DataFrame = {
    val terms = Analyzer.analyzeQuery(query).toSet
    val nf = numberOfFragments
    val frag =
      if (nf <= 1) udf((text: String) =>
        Highlight.fragment(if (text == null) "" else text, terms, window))
      else udf((text: String) =>
        Highlight.fragments(if (text == null) "" else text, terms, window, nf))
    val fragCol = if (nf <= 1) "fragment" else "fragments"
    if (field == "text")
      searchResolved(query, k).withColumn(fragCol, frag(col("text")))
    else {
      val hits = searchField(field, query, k)
      val hitsDF = hits.toSeq.zipWithIndex
        .map { case (s, i) => (s.docId, s.score, i + 1) }.toDF("docId", "score", "rank")
      docs.filter(col("docId").isin(hits.map(_.docId).toSeq: _*))
        .join(broadcast(hitsDF), Seq("docId"))
        .select(col("rank"), col("docId"), col("score"), col("conv_id"), col("turn_idx"),
          col("role"), col(field).cast("string").as(field))
        .orderBy(col("rank"))
        .withColumn(fragCol, frag(col(field)))
    }
  }

  /** ES `terms` aggregation over the FULL match set (facet counts —
    * what the reference's ES delegation gives its users for free): doc
    * counts per value of `field` among ALL docs containing ≥1 query
    * term — top-k plays no part. Index-side plan: posting blocks of the
    * query terms (shard-pruned scan) → distributed docId decode →
    * distinct → join the doc store on docId (column-pruned to (docId,
    * field)) → hash-agg count. No driver materialization of the match
    * set; the blocks:docs join shuffles only matching docIds. At 10^12
    * docs this is the plan you'd run — the match set is a fraction of
    * the corpus and both sides hash-partition on docId.
    */
  /** Distinct docIds containing ≥1 of the query's terms (the OR match
    * set) as a distributed frame — the shared membership scan under
    * facets / field-sort / hit-count. docIds-only decode: the block scan
    * reads three columns (column-pruned at the parquet level) and skips
    * the tf/dl varint streams entirely — these operators touch the FULL
    * match set, so decode waste scales with it. Returns None when no
    * query term exists in the index.
    */
  /** Distinct decoded docIds of a found term set (docIds-only block
    * read — three columns, parquet-pruned past the tf/dl/pos streams).
    */
  private def decodeDocIds(found: Iterable[TermStats]): DataFrame =
    decodeDocIdsRaw(found).distinct()

  /** Same decoded docId stream WITHOUT the distinct: the right side of
    * a left_semi/left_anti join needs no dedup (membership only), so
    * clause/exclude cursors skip the distinct's Exchange+HashAggregate
    * entirely (guide §2.4 — remove shuffles outright). Results are
    * identical: semi/anti join semantics are set-membership regardless
    * of right-side multiplicity.
    */
  private def decodeDocIdsRaw(found: Iterable[TermStats]): DataFrame =
    selectBlocks(found)
      .select(col("docs"), col("count"), col("firstDocId"))
      .as[(Array[Byte], Int, Long)]
      .flatMap { case (docs, n0, first) => graft.index.Codec.deltaDecode(docs, n0, first) }
      .toDF("docId")

  /** Membership of the FULL bool query (ES aggregations/counts run over
    * the filtered query, not just the scored terms): docs matching ≥1
    * scored term, restricted by every filter clause (semi-join per
    * clause — each clause's docIds come from its own pruned block scan)
    * and must_not (anti-join). All joins are docId-keyed — the match
    * set never touches the driver.
    */
  private def matchSet(query: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): Option[DataFrame] = {
    guardExists(exists, missing)
    val terms = Analyzer.analyzeQuery(query).toSeq
    val clauses: Seq[Seq[String]] =
      filters.map { case (f, v) => Seq(graft.index.FieldTerms.term(f, v)) } ++
        anyFilters.map { case (f, vs) => vs.distinct.map(v => graft.index.FieldTerms.term(f, v)) } ++
        numericRangeFilters.map { case (f, lo, hi) =>
          graft.index.FieldTerms.trieRangeTerms(f, lo, hi) } ++
        exists.map(f => Seq(graft.index.FieldTerms.existsTerm(f)))
    val excludeTerms = (mustNot.map { case (f, v) => graft.index.FieldTerms.term(f, v) } ++
      missing.map(f => graft.index.FieldTerms.existsTerm(f))).distinct
    // lexicographic ranges return their TermStats with the expansion —
    // one dict scan each, no second lookup job
    val rangeExp: Seq[Map[String, TermStats]] =
      rangeFilters.map { case (f, lo, hi) => expandFieldRange(f, lo, hi) }
    val found = lookupTerms(terms ++ clauses.flatten.distinct ++ excludeTerms) ++
      rangeExp.flatten
    val scoredFound = terms.filter(found.contains)
    if (scoredFound.isEmpty) return None
    val foundClauses = clauses.map(_.filter(found.contains)) ++
      rangeExp.map(_.keys.toSeq.sorted)
    if (foundClauses.exists(_.isEmpty)) return None
    var m = decodeDocIds(scoredFound.map(found))
    for (cl <- foundClauses)
      m = m.join(decodeDocIdsRaw(cl.map(found)), Seq("docId"), "left_semi")
    val exFound = excludeTerms.filter(found.contains)
    if (exFound.nonEmpty)
      m = m.join(decodeDocIdsRaw(exFound.map(found)), Seq("docId"), "left_anti")
    Some(m)
  }

  /** Exact BM25 score of EVERY matching doc as a distributed (docId,
    * score) frame — the scored match set field collapsing needs (top-k
    * alone cannot collapse: the global top k docs may all share one
    * key, ES runs a collapsing per-shard collector for the same
    * reason). Plan: full decode of the query terms' posting blocks
    * (docId+tf+dl, parquet-pruned past positions — cost ∝ the query
    * terms' posting sizes, never the corpus), broadcast join of the
    * tiny (termId, term, df) side, and a per-doc fold of contributions
    * in ASCENDING TERM ORDER (sort_array + aggregate) — the engine-wide
    * determinism rule, bit-identical to the WAND sum (Bm25.scoreCol ≡
    * Bm25.score by construction).
    */
  /** Decoded (docId, term, tf, dl, df) posting rows of the query's
    * terms — the shared distributed input of [[scoredMatches]] and
    * [[explain]]: term-pruned block scan → decode → broadcast join of
    * the tiny (term, df) frame.
    */
  private def postingRows(terms: Seq[String]): Option[DataFrame] = {
    val found = lookupTerms(terms.distinct)
    if (found.isEmpty) return None
    val termDf = found.values.toSeq.map(ts => (ts.termId, ts.term, ts.df))
      .toDF("termId", "term", "df")
    val posts = selectBlocks(found.values)
      .select(col("termId"), col("docs"), col("tfs"), col("dls"),
        col("count"), col("firstDocId"))
      .as[(Long, Array[Byte], Array[Byte], Array[Byte], Int, Long)]
      .flatMap { case (tid, ds, tfs, dls, cnt, first) =>
        val ids = graft.index.Codec.deltaDecode(ds, cnt, first)
        val tfA = graft.index.Codec.decodeVarInts(tfs, cnt)
        val dlA = graft.index.Codec.decodeVarInts(dls, cnt)
        Iterator.range(0, cnt).map(i => (tid, ids(i), tfA(i), dlA(i)))
      }.toDF("termId", "docId", "tf", "dl")
    Some(posts.join(broadcast(termDf), Seq("termId")))
  }

  private def scoredMatches(terms: Seq[String]): Option[DataFrame] = {
    val nG = stats.n
    val avgdlG = stats.avgdl
    postingRows(terms).map { rows =>
      rows.select(col("docId"), struct(col("term"),
          Bm25.scoreCol(col("tf"), col("df"), col("dl"), nG, avgdlG).as("s")).as("c"))
        .groupBy(col("docId"))
        .agg(aggregate(sort_array(collect_list(col("c"))), lit(0.0),
          (acc, x) => acc + x.getField("s")).as("score"))
    }
  }

  /** ES `_explain` (GET /index/_explain/{id}): the per-term BM25 score
    * breakdown of one (query, document) pair — (term, tf, df, dl, idf,
    * weight) rows, weight = the term's contribution under EXACTLY the
    * search formula/operation order ([[Bm25.scoreCol]]), so
    * sum(weight) over the rows is bit-identical to the hit's search
    * score (pinned in tests). Terms of the query absent from the doc
    * contribute no row (ES omits non-matching sub-explanations). Plan:
    * the term-pruned decode of [[postingRows]] filtered to the one
    * docId — never a corpus scan.
    */
  def explain(query: String, docId: Long): DataFrame = {
    val terms = Analyzer.analyzeQuery(query).toSeq
    val nG = stats.n
    val avgdlG = stats.avgdl
    postingRows(terms) match {
      case None =>
        Seq.empty[(String, Int, Long, Int, Double, Double)]
          .toDF("term", "tf", "df", "dl", "idf", "weight")
      case Some(rows) =>
        rows.filter(col("docId") === lit(docId))
          .select(col("term"), col("tf"), col("df"), col("dl"),
            Bm25.idfCol(col("df"), nG).as("idf"),
            Bm25.scoreCol(col("tf"), col("df"), col("dl"), nG, avgdlG).as("weight"))
          .orderBy(col("term"))
    }
  }

  /** ES scroll, the efficient `sort: _doc` bulk-export mode: the FULL
    * scored match set as a still-distributed (docId, score) frame — no
    * top-k, no global sort, nothing on the driver. ES pages this
    * through a stateful cursor because its client is a single process;
    * the Spark-native equivalent of "scroll every hit" IS the
    * DataFrame — callers write it out or join it onward, and any
    * page-sized consumption is a `searchAfter` (Q16/Q25). Scores are
    * the exact per-doc BM25 sums ([[scoredMatches]]); empty frame when
    * no query term is indexed.
    */
  def scrollAll(query: String): DataFrame =
    scoredMatches(Analyzer.analyzeQuery(query).toSeq)
      .getOrElse(Seq.empty[(Long, Double)].toDF("docId", "score"))

  /** ES `_termvectors` (GET /index/_termvectors/{id}, a 2.4-era API):
    * the document's own term statistics — one row per token occurrence,
    * (term, pos, start_offset, end_offset, tf, df), term asc / pos asc.
    * tf/positions/offsets are generated ON THE FLY from the stored text
    * (exactly ES's behavior when term vectors are not stored in the
    * mapping); df comes from the index dictionary. Plan: a point read
    * of the doc-store row (EqualTo(docId) pushed to the
    * docId-range-partitioned store) + one dict lookup bounded by the
    * doc's vocabulary — never a corpus pass. Unknown docId → 0 rows
    * (ES found=false).
    */
  def termVectors(docId: Long): DataFrame = {
    val empty = Seq.empty[(String, Int, Int, Int, Int, Long)]
      .toDF("term", "pos", "start_offset", "end_offset", "tf", "df")
    val row = docs.filter(col("docId") === lit(docId)).select("text").collect()
    if (row.isEmpty || row.head.isNullAt(0)) return empty
    val toks = Analyzer.tokenizeWithOffsets(row.head.getString(0))
    if (toks.isEmpty) return empty
    val tf = toks.groupBy(_._1).map { case (t, occ) => t -> occ.length }
    val dfs = lookupTerms(tf.keys.toSeq.sorted)
    toks.zipWithIndex
      .map { case ((t, s, e), i) =>
        (t, i, s, e, tf(t), dfs.get(t).map(_.df).getOrElse(0L))
      }
      .sortBy(r => (r._1, r._2)).toSeq
      .toDF("term", "pos", "start_offset", "end_offset", "tf", "df")
  }

  /** ES field collapsing (`collapse`, round-7 review "What's missing
    * #1"): ONE hit per distinct `field` value — the group's best doc by
    * (score desc, docId asc) — globally ranked by that best score, top
    * `k` groups. Plan: scored match set ([[scoredMatches]]) → key join
    * against the column-pruned doc store → per-key best via a
    * `row_number ≤ 1` window (InferWindowGroupLimit ⇒ pre-shuffle
    * per-partition group limits — a hot key never sorts more than one
    * row per upstream partition past the exchange) → global top-k
    * (TakeOrderedAndProject). Docs with a NULL key collapse into one
    * null group (ES doc-values semantics). Returns (key, doc_id,
    * score), score desc / doc_id asc.
    */
  def collapse(query: String, field: String, k: Int,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil,
      /** ES collapse `inner_hits.size`: 1 (default) returns the
        * group's best hit only; > 1 additionally returns the group's
        * next-best hits, ranked by `hit_rank` (same (score desc,
        * docId asc) order). Groups are ALWAYS selected and ordered by
        * their BEST hit — inner hits ride along (ES inner_hits
        * semantics).
        */
      innerHits: Int = 1): DataFrame = {
    require(k > 0, "collapse size must be positive")
    require(innerHits > 0, "inner_hits size must be positive")
    scoredMatches(Analyzer.analyzeQuery(query).toSeq) match {
      case None =>
        docs.select(col(field).as("key")).limit(0)
          .withColumn("hit_rank", lit(0)).withColumn("doc_id", lit(0L))
          .withColumn("score", lit(0.0))
      case Some(scored0) =>
        // bool context restricts MEMBERSHIP only (scores stay full-corpus
        // BM25 — the engine-wide filter-context rule)
        val scored =
          if (filters.isEmpty && mustNot.isEmpty && numericRangeFilters.isEmpty &&
            anyFilters.isEmpty && rangeFilters.isEmpty && exists.isEmpty && missing.isEmpty)
            scored0
          else scored0.join(matchingOrEmpty(query, filters, mustNot,
            numericRangeFilters, anyFilters, rangeFilters, exists, missing),
            Seq("docId"), "left_semi")
        Searcher.collapseOf(
          docs.select(col("docId"), col(field).as("key")).join(scored, Seq("docId")),
          k, innerHits)
    }
  }

  def facetCounts(query: String, field: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil,
      /** ES terms-agg `size`: > 0 returns only the top `size` buckets
        * by doc count desc (value asc tiebreak — deterministic), ES's
        * DEFAULT bucket ordering; plans as TakeOrderedAndProject over
        * the agg (per-partition heaps, never a global sort). 0 = every
        * bucket, value-ordered.
        */
      size: Int = 0): DataFrame =
    matchSet(query, filters, mustNot, anyFilters, numericRangeFilters, rangeFilters,
      exists, missing) match {
      case None =>
        docs.select(col(field).as("value")).limit(0).withColumn("n_docs", lit(0L))
      case Some(matching) =>
        val agged = docs.select(col("docId"), col(field).as("value"))
          .join(matching, Seq("docId"))
          .groupBy(col("value")).agg(count(lit(1)).as("n_docs"))
        if (size > 0) agged.orderBy(col("n_docs").desc, col("value").asc).limit(size)
        else agged.orderBy(col("value"))
    }

  /** ES `range` aggregation: one row per requested [from, to) bucket
    * (half-open, ES semantics; None = unbounded) with its doc count
    * over the match set. Overlapping ranges are independent counts —
    * ONE pass: every range is a conditional count in a single agg, so
    * the plan costs exactly one match-set join regardless of the range
    * count. Rows come back in request order with `key` "from-to".
    */
  def rangesAgg(query: String, field: String,
      ranges: Seq[(Option[Long], Option[Long])],
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame = {
    require(ranges.nonEmpty, "range aggregation needs >= 1 range")
    val joined = docs.select(col("docId"), col(field))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
    Searcher.rangesAggOf(joined, col(field), ranges)
  }

  /** Total hit count of the (optionally bool-filtered) match set (ES
    * `hits.total` / `_count`) — no top-k involved; one distributed
    * count over the decoded docId stream.
    */
  def matchCount(query: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): Long =
    matchSet(query, filters, mustNot, anyFilters, numericRangeFilters, rangeFilters,
      exists, missing)
      .map(_.count()).getOrElse(0L)

  /** The match set, or an empty docId frame when no query term exists —
    * so every aggregation below shares one plan shape with a correct
    * empty-result schema.
    */
  private def matchingOrEmpty(query: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame =
    matchSet(query, filters, mustNot, anyFilters, numericRangeFilters, rangeFilters,
      exists, missing)
      .getOrElse(Seq.empty[Long].toDF("docId"))

  /** ES `histogram` aggregation over the FULL match set: doc counts per
    * fixed-width bucket of a numeric field (bucket = floor(v/width)·
    * width; empty buckets omitted — ES min_doc_count=1 shape). Same
    * index-side plan as [[facetCounts]]: membership scan → docId join
    * against the column-pruned doc store → hash agg; the match set
    * never touches the driver.
    */
  def numericHistogram(query: String, field: String, width: Long,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame = {
    require(width > 0, "histogram width must be positive")
    docs.select(col("docId"), col(field))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
      .groupBy((floor(col(field) / lit(width)) * lit(width)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("bucket"))
  }

  /** ES `date_histogram` (calendar_interval) over the match set:
    * `interval` is a `date_trunc` unit — "day", "hour", "week",
    * "month", … Empty buckets omitted.
    */
  def dateHistogram(query: String, field: String, interval: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame =
    docs.select(col("docId"), col(field))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
      .groupBy(date_trunc(interval, col(field)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("bucket"))

  /** ES `stats` aggregation over the match set: count / min / max /
    * avg / sum of a numeric field among all docs matching ≥ 1 query
    * term. One distributed agg — no top-k, no driver materialization.
    */
  def fieldStats(query: String, field: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame =
    docs.select(col("docId"), col(field))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
      .agg(count(lit(1)).as("n_docs"), min(col(field)).as("min"),
        max(col(field)).as("max"), avg(col(field)).as("avg"),
        sum(col(field)).as("sum"))

  /** The matched (docId, field-value) frame — the DISTRIBUTED input
    * every value aggregation consumes, exposed (lazy, unexecuted) so
    * cross-index aggregations ([[Indices.percentiles]] / `cardinality`)
    * can union the per-index match sets into ONE job: a doc lives in
    * exactly one index, so the union IS the global match set and any
    * order-statistic over it is exact — no sketch-state merge needed.
    */
  def matchedField(query: String, field: String): DataFrame =
    docs.select(col("docId"), col(field))
      .join(matchingOrEmpty(query), Seq("docId"))

  /** Match set sorted by a FIELD instead of by score (ES `sort`): docs
    * containing ≥1 query term, ordered by `field` (desc/asc) with docId
    * as the deterministic tiebreak, top `k`. Plan: membership scan →
    * docId join against the column-pruned doc store →
    * TakeOrderedAndProject (per-partition heaps, driver merge of ≤k) —
    * never a global sort.
    */
  def searchSortedBy(query: String, field: String, k: Int,
      descending: Boolean = true,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil,
      /** Pagination offset on the field ordering (ES sort + from);
        * plans as TakeOrderedAndProject with limit+offset — still
        * per-partition heaps, never a global sort.
        */
      from: Int = 0,
      /** ES `search_after` on the FIELD ordering: the (fieldValue,
        * docId) sort key of the previous page's last hit — only rows
        * strictly after it are returned, so deep pages cost k (not
        * from + k) per partition heap. Composes with `from` (applied
        * after the cursor). Same offer-guard soundness as the
        * score-ranked cursor: the predicate only REMOVES candidates.
        */
      after: Option[(Any, Long)] = None): DataFrame = {
    val ord =
      if (descending) Seq(col(field).desc, col("docId").asc)
      else Seq(col(field).asc, col("docId").asc)
    matchSet(query, filters, mustNot, anyFilters, numericRangeFilters, rangeFilters,
      exists, missing) match {
      case None => docs.select(col("docId"), col(field)).limit(0)
      case Some(matching) =>
        val base = docs.select(col("docId"), col(field)).join(matching, Seq("docId"))
        val paged = after match {
          case None => base
          case Some((v, d)) =>
            val cur =
              if (descending) col(field) < lit(v) || (col(field) === lit(v) && col("docId") > lit(d))
              else col(field) > lit(v) || (col(field) === lit(v) && col("docId") > lit(d))
            base.filter(cur)
        }
        paged.orderBy(ord: _*).offset(from).limit(k)
    }
  }

  /** ES sub-aggregation: `terms` buckets over `bucketField` with a
    * nested `stats` over `statField` per bucket — one extra groupBy on
    * the same match-set join as [[facetCounts]] (the match set never
    * touches the driver; both fields are column-pruned at the scan).
    */
  def facetStats(query: String, bucketField: String, statField: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame =
    docs.select(col("docId"), col(bucketField).as("value"), col(statField))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
      .groupBy(col("value"))
      .agg(count(lit(1)).as("n_docs"), min(col(statField)).as("min"),
        max(col(statField)).as("max"), avg(col(statField)).as("avg"),
        sum(col(statField)).as("sum"))
      .orderBy(col("value"))

  /** Nested / composite aggregation tree over the match set (ES
    * multi-level sub-aggregations — terms→date_histogram→stats,
    * terms→terms→count, any [[BucketLevel]] composition): ONE match-set
    * join + ONE rollup pass computes every tree level — see
    * [[Aggs.nestedAggOf]] for the output contract (key columns, depth,
    * n_docs, optional min/max/avg/sum of `statField`) and the one-pass
    * scale argument.
    */
  def nestedAgg(query: String, levels: Seq[BucketLevel],
      statField: Option[String] = None,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame = {
    val srcCols = (levels.map(_.field) ++ statField.toSeq).distinct
    val joined = docs.select(col("docId") +: srcCols.map(col): _*)
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
    Aggs.nestedAggOf(joined, levels, statField)
  }

  /** ES `composite` aggregation with `after`-key paging over the match
    * set — see [[Aggs.compositeAggOf]] for the paging contract (flat
    * key tuples, keys-asc, exclusive cursor).
    */
  def compositeAgg(query: String, levels: Seq[BucketLevel], size: Int,
      after: Option[Seq[Any]] = None,
      statField: Option[String] = None,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame = {
    val srcCols = (levels.map(_.field) ++ statField.toSeq).distinct
    val joined = docs.select(col("docId") +: srcCols.map(col): _*)
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
    Aggs.compositeAggOf(joined, levels, statField, size, after)
  }

  /** ES `cardinality` aggregation: number of DISTINCT values of `field`
    * among the match set (docs missing the field don't count — ES
    * semantics; countDistinct ignores nulls). `approximate = false`
    * (default) is the exact distributed count-distinct (partial
    * aggregation per partition, one shuffle on the value); `true` is
    * the ES-shaped scale path — a fixed-size HyperLogLog++ sketch
    * (`approx_count_distinct`), constant memory per partition at any
    * cardinality, mergeable without re-scanning.
    */
  def cardinality(query: String, field: String,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil,
      approximate: Boolean = false): Long =
    matchSet(query, filters, mustNot, anyFilters, numericRangeFilters, rangeFilters,
      exists, missing) match {
      case None => 0L
      case Some(m) =>
        val joined = docs.select(col("docId"), col(field)).join(m, Seq("docId"))
        val agg =
          if (approximate) joined.agg(approx_count_distinct(col(field)).as("c"))
          else joined.agg(countDistinct(col(field)).as("c"))
        agg.head().getLong(0)
    }

  /** ES `percentiles` aggregation over the match set: one row per
    * requested percentile `(p, value)`, ps in [0, 1]. `approximate =
    * false` (default) evaluates Spark's EXACT `percentile` (linear
    * interpolation between closest ranks — the `quantile_cont` rule;
    * per-partition value-count maps merged in one agg, memory bounded
    * by the field's DISTINCT-value count); `true` is the ES-shaped
    * scale path — `percentile_approx`'s fixed-size QuantileSummaries
    * sketch, constant memory at any cardinality (ES uses t-digest).
    * Docs missing the field are ignored (ES semantics).
    */
  def percentiles(query: String, field: String, ps: Seq[Double],
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil,
      approximate: Boolean = false): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "percentiles must be in [0, 1]")
    // Column API, not an expr() SQL string — field names with special
    // characters must never reach a SQL parser (round-6 review)
    val pLits = array(ps.map(lit): _*)
    val aggExpr =
      if (approximate) percentile_approx(col(field), pLits, lit(10000))
      else percentile(col(field), pLits)
    docs.select(col("docId"), col(field))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
      .agg(aggExpr.as("vals"))
      .select(posexplode(col("vals")).as(Seq("pos", "value")))
      .select(element_at(pLits, col("pos").cast("int") + 1).as("p"),
        col("value").cast("double").as("value"))
      .orderBy(col("p"))
  }

  /** ES `top_hits` sub-aggregation: per `bucketField` bucket, the top
    * `k` matching docs by `sortField` (docId tiebreak — deterministic).
    * Plan: match-set join → row_number window partitioned by bucket —
    * Catalyst's InferWindowGroupLimit rewrites the `rank ≤ k` filter
    * into a pre-shuffle per-partition group-limit (the per-shard-heap
    * shape ES runs; verified in PLANS.md), so a hot bucket never sorts
    * more than k rows per upstream partition before the exchange.
    */
  def facetTopHits(query: String, bucketField: String, sortField: String,
      k: Int, descending: Boolean = true,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame = {
    require(k > 0, "top_hits size must be positive")
    val ord =
      if (descending) Seq(col(sortField).desc, col("docId").asc)
      else Seq(col(sortField).asc, col("docId").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("value")).orderBy(ord: _*)
    docs.select(col("docId"), col(bucketField).as("value"), col(sortField))
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(k))
      .select(col("value"), col("rank").cast("long").as("rank"),
        col("docId").as("doc_id"), col(sortField).cast("long").as("sort_value"))
      .orderBy(col("value"), col("rank"))
  }

  /** ES `filters` aggregation: one NAMED bucket per keyword
    * (field = value) predicate, each an independent doc count over the
    * match set (buckets may overlap — they're separate counters). ONE
    * pass: every bucket is a conditional count in a single agg over
    * the match-set join, unpivoted via `stack` in request order —
    * bucket count never multiplies scans.
    */
  def filtersAgg(query: String, buckets: Seq[(String, (String, String))],
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil): DataFrame = {
    require(buckets.nonEmpty, "filters aggregation needs >= 1 named bucket")
    val cols = buckets.map(_._2._1).distinct
    val joined = docs.select(col("docId") +: cols.map(col): _*)
      .join(matchingOrEmpty(query, filters, mustNot, numericRangeFilters, anyFilters,
        rangeFilters, exists, missing), Seq("docId"))
    Searcher.filtersAggOf(joined, buckets)
  }

  /** ES `significant_terms` aggregation: terms over-represented in the
    * match set relative to the whole corpus, scored with ES's JLH rule
    * — score = (fg% − bg%) · (fg% / bg%) where fg% = fgCount/fgN over
    * the match set and bg% = df/N from the DICTIONARY (no second
    * corpus scan for background stats). Plan: match-set join → one
    * re-tokenize pass over matching docs only → hash agg → broadcast-
    * size join with the dictionary rows of the surviving terms. Terms
    * below `minDocCount` foreground docs are dropped (ES default
    * shape); top `k` by (score desc, term asc) — deterministic.
    */
  def significantTerms(query: String, k: Int, minDocCount: Long = 3L,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      numericRangeFilters: Seq[(String, Long, Long)] = Nil,
      anyFilters: Seq[(String, Seq[String])] = Nil,
      rangeFilters: Seq[(String, String, String)] = Nil,
      exists: Seq[String] = Nil,
      missing: Seq[String] = Nil,
      /** ES `sampler`-agg cap on the foreground pass (round-6 review
        * "What's wrong #4"): > 0 bounds the re-tokenized match set to
        * the `sampleSize` LOWEST docIds (deterministic — ES samples by
        * shard score; the deviation is documented) so a broad query at
        * corpus scale never re-tokenizes the whole corpus. fg counts
        * and fg% then describe the SAMPLE (exact ES sampler semantics);
        * the cap is disclosed via log. 0 = off.
        */
      sampleSize: Int = 0): DataFrame = {
    val empty = Seq.empty[(String, Long, Long, Double)]
      .toDF("term", "fg_count", "bg_count", "score")
    matchSet(query, filters, mustNot, anyFilters, numericRangeFilters, rangeFilters,
      exists, missing) match {
      case None => empty
      case Some(m0) =>
        // TakeOrderedAndProject: per-partition heaps of ≤ sampleSize,
        // never a global sort of the match set
        val m = if (sampleSize > 0) m0.orderBy(col("docId")).limit(sampleSize) else m0
        val fgN = m.count()
        if (fgN == 0) return empty
        if (sampleSize > 0 && fgN == sampleSize)
          org.slf4j.LoggerFactory.getLogger(getClass)
            .info(s"significant_terms: foreground sampled to $sampleSize docs (sampler cap)")
        val fg = docs
          .select(col("docId"),
            explode(array_distinct(Analyzer.tokensCol(col("text")))).as("term"))
          .join(m, Seq("docId"))
          .groupBy(col("term")).agg(count(lit(1)).as("fg_count"))
          .filter(col("fg_count") >= lit(minDocCount))
        val bg = dict.filter(
          !col("term").startsWith(graft.index.FieldTerms.Prefix) &&
            !col("term").startsWith(graft.index.FieldTerms.TextPrefix))
          .select(col("term"), col("df").as("bg_count"))
        Searcher.jlhScore(fg.join(bg, Seq("term")), fgN, stats.n)
          .orderBy(col("score").desc, col("term").asc).limit(k)
    }
  }

  /** Top-k resolved back to turn metadata + text (SURVEY.md J4): the k
    * hits are broadcast against the doc store.
    */
  def searchResolved(query: String, k: Int): DataFrame = {
    val hits = runPerBucket(Analyzer.analyzeQuery(query).toSeq, k, Mode(conjunctive = false))
    // hits are already (score desc, docId asc)-sorted and tiny: rank here,
    // not via an unpartitioned window.
    val hitsDF = hits.toSeq.zipWithIndex
      .map { case (s, i) => (s.docId, s.score, i + 1) }.toDF("docId", "score", "rank")
    // k-bounded fetch: the literal In(docId, ...) pushes to the parquet
    // scan (row-group min/max pruning — the ES get-by-id shape) instead
    // of streaming the whole doc store through the broadcast join
    // (round-7 review #8). docs are docId-range-partitioned by build,
    // so most row groups prune away.
    docs.filter(col("docId").isin(hits.map(_.docId).toSeq: _*))
      .join(broadcast(hitsDF), Seq("docId"))
      .select(col("rank"), col("docId"), col("score"), col("conv_id"), col("turn_idx"),
        col("role"), col("text"))
      .orderBy(col("rank"))
  }
}

/** The in-repo exhaustive-scoring oracle (SURVEY.md §5.2.3): brute-force
  * BM25 from the raw docs, no index structures — defines rank-identity
  * truth for the golden tests. Per-doc score = sum of per-term
  * contributions in ascending term order, pinned via
  * sort_array(collect_list(struct(term, s))) + aggregate().
  */
object Oracle {

  /** Per-posting scored rows for a query term set. */
  private def scoredPostings(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val row = docs.agg(count(lit(1)), avg(Analyzer.dlCol(col("text")))).head()
    val n = row.getLong(0)
    val avgdl = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
    val postings = docs
      .select(col("docId"), Analyzer.dlCol(col("text")).as("dl"),
        explode(Analyzer.tokensCol(col("text"))).as("term"))
      .groupBy(col("term"), col("docId"), col("dl"))
      .agg(count(lit(1)).cast("int").as("tf"))
    val df = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    postings
      .filter(col("term").isin(terms: _*))
      .join(df, Seq("term"))
      .withColumn("s", Bm25.scoreCol(col("tf"), col("df"), col("dl"), n, avgdl))
  }

  private def orderedSum: Column =
    aggregate(
      sort_array(collect_list(struct(col("term"), col("s")))),
      lit(0.0),
      (acc, x) => acc + x.getField("s")
    )

  def topK(docs: DataFrame, query: String, k: Int): DataFrame = {
    val terms = Analyzer.analyzeQuery(query).toSeq
    if (terms.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    scoredPostings(docs, terms)
      .groupBy(col("docId"))
      .agg(orderedSum.as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** Exhaustive phrase oracle: conjunctive BM25 scoring restricted to
    * docs whose analyzed token stream contains the analyzed query tokens
    * adjacently in order — computed by substring search on the
    * space-joined token stream (tokens cannot contain spaces, so the
    * padded-substring test is exact).
    */
  def topKPhrase(docs: DataFrame, query: String, k: Int): DataFrame = {
    val slots = Analyzer.tokenize(query).toSeq
    if (slots.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    val terms = slots.distinct.sorted
    val stream = concat(lit(" "), array_join(Analyzer.tokensCol(col("text")), " "), lit(" "))
    val hasPhrase = docs
      .filter(instr(stream, " " + slots.mkString(" ") + " ") > lit(0))
      .select(col("docId"))
    scoredPostings(docs, terms)
      .groupBy(col("docId"))
      .agg(orderedSum.as("score"), count(lit(1)).as("nt"))
      .filter(col("nt") === lit(terms.size))
      .drop("nt")
      .join(hasPhrase, Seq("docId"), "left_semi")
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** Per-(field, term) scored contributions of `query`'s tokens in one
    * analyzed field, under the FIELD's own stats (docCount = docs with
    * ≥1 token; avgdl over those docs) — the exhaustive twin of the
    * engine's per-field BM25. Emits (docId, key, s) where `key` is the
    * namespaced term (sum-ordering key). field "text" = the main field
    * (corpus stats — N counts ALL docs, like [[scoredPostings]]).
    */
  private def fieldContribs(docs: DataFrame, field: String, toks: Seq[String],
      boost: Double): DataFrame = {
    if (field == "text")
      return scoredPostings(docs, toks)
        .select(col("docId"), col("term").as("key"), (col("s") * lit(boost)).as("s"))
    val fcol = col(field).cast("string")
    val dlc = coalesce(Analyzer.dlCol(fcol), lit(0))
    val row = docs.agg(count(when(dlc > lit(0), 1)),
      coalesce(sum(dlc.cast("long")), lit(0L))).head()
    val nF = row.getLong(0)
    val avgdlF = if (nF == 0) 0.0 else row.getLong(1).toDouble / nF
    val postings = docs
      .select(col("docId"), dlc.as("dl"), explode(Analyzer.tokensCol(fcol)).as("tok"))
      .groupBy(col("tok"), col("docId"), col("dl"))
      .agg(count(lit(1)).cast("int").as("tf"))
    val dfT = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    postings
      .filter(col("tok").isin(toks: _*))
      .join(dfT, Seq("tok"))
      .select(col("docId"),
        concat(lit(graft.index.FieldTerms.textTerm(field, "")), col("tok")).as("key"),
        (Bm25.scoreCol(col("tf"), col("df"), col("dl"), nF, avgdlF) * lit(boost)).as("s"))
  }

  private def orderedKeySum: Column =
    aggregate(
      sort_array(collect_list(struct(col("key"), col("s")))),
      lit(0.0),
      (acc, x) => acc + x.getField("s")
    )

  /** Exhaustive fielded-match oracle: BM25 top-k over one analyzed
    * field, per-field stats ([[fieldContribs]]); `conjunctive` requires
    * every term in the field.
    */
  def topKField(docs: DataFrame, field: String, query: String, k: Int,
      conjunctive: Boolean = false): DataFrame = {
    val toks = Analyzer.analyzeQuery(query).toSeq
    if (toks.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    val g = fieldContribs(docs, field, toks, 1.0)
      .groupBy(col("docId"))
      .agg(orderedKeySum.as("score"), count(lit(1)).as("nt"))
    (if (conjunctive) g.filter(col("nt") === lit(toks.size)) else g)
      .drop("nt")
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** Exhaustive `multi_match` oracle (most_fields, summed): every
    * (field, term) contribution boost-scaled and summed in ascending
    * namespaced-term order — the engine's exact rule.
    */
  def topKMulti(docs: DataFrame, query: String, fields: Seq[(String, Double)],
      k: Int): DataFrame = {
    val toks = Analyzer.analyzeQuery(query).toSeq
    if (toks.isEmpty || fields.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    fields.map { case (f, b) => fieldContribs(docs, f, toks, b) }
      .reduce(_ unionByName _)
      .groupBy(col("docId"))
      .agg(orderedKeySum.as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** Exhaustive `multi_match` best_fields oracle (ES's default mode):
    * per-field sums s_f fold in ascending namespaced-key order; score
    * re-folds every contribution in the SAME global order weighted 1 on
    * the best field (ties → the field whose namespace sorts first) and
    * `tieBreaker` elsewhere — exactly [[Wand.BestFields]]'s rule, so
    * tieBreaker = 1 is bit-identical to [[topKMulti]].
    */
  def topKMultiBest(docs: DataFrame, query: String, fields: Seq[(String, Double)],
      tieBreaker: Double, k: Int): DataFrame = {
    val toks = Analyzer.analyzeQuery(query).toSeq
    if (toks.isEmpty || fields.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    val ordered = fields.map(_._1).sortBy(f =>
      if (f == "text") "\uffff" else graft.index.FieldTerms.textTerm(f, ""))
    val ordOf: Map[String, Int] = ordered.zipWithIndex.toMap
    val contribs = fields.map { case (f, b) =>
      fieldContribs(docs, f, toks, b).withColumn("fld", lit(ordOf(f)))
    }.reduce(_ unionByName _)
    val per = contribs.groupBy(col("docId"), col("fld")).agg(orderedKeySum.as("sf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("docId")).orderBy(col("sf").desc, col("fld").asc)
    val best = per.withColumn("rn", row_number().over(w)).filter(col("rn") === lit(1))
      .select(col("docId"), col("fld").as("bfld"))
    contribs.join(best, Seq("docId"))
      .select(col("docId"), col("key"),
        (when(col("fld") === col("bfld"), lit(1.0)).otherwise(lit(tieBreaker)) * col("s"))
          .as("s"))
      .groupBy(col("docId"))
      .agg(orderedKeySum.as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** best_fields + bool `should` oracle (round-6 advice): the should
    * tokens' MAIN-TEXT contributions fold at weight 1 in the same
    * global ascending-key order and never enter any field's dis-max sum
    * (ES semantics — separate bool clauses add at full weight). Docs
    * matching only should terms are dropped (the must-group ≥ 1 rule).
    * `should` tokens must be disjoint from the query's scored terms.
    */
  def topKMultiBestShould(docs: DataFrame, query: String,
      fields: Seq[(String, Double)], tieBreaker: Double, should: String,
      k: Int): DataFrame = {
    val toks = Analyzer.analyzeQuery(query).toSeq
    val sToks = Analyzer.analyzeQuery(should).toSeq
    if (toks.isEmpty || fields.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    val ordered = fields.map(_._1).sortBy(f =>
      if (f == "text") "\uffff" else graft.index.FieldTerms.textTerm(f, ""))
    val ordOf: Map[String, Int] = ordered.zipWithIndex.toMap
    val mm = fields.map { case (f, b) =>
      fieldContribs(docs, f, toks, b).withColumn("fld", lit(ordOf(f)))
    }.reduce(_ unionByName _)
    val sh = fieldContribs(docs, "text", sToks, 1.0).withColumn("fld", lit(-1))
    val per = mm.groupBy(col("docId"), col("fld")).agg(orderedKeySum.as("sf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("docId")).orderBy(col("sf").desc, col("fld").asc)
    val best = per.withColumn("rn", row_number().over(w)).filter(col("rn") === lit(1))
      .select(col("docId"), col("fld").as("bfld"))
    mm.unionByName(sh).join(best, Seq("docId")) // inner: must-group ≥ 1
      .select(col("docId"), col("key"),
        (when(col("fld") === lit(-1) || col("fld") === col("bfld"), lit(1.0))
          .otherwise(lit(tieBreaker)) * col("s")).as("s"))
      .groupBy(col("docId"))
      .agg(orderedKeySum.as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** General `dis_max` oracle (round-7): per-sub-query group sums in
    * ascending term order pick the best group (sum desc, group ordinal
    * asc — the engine's first-max rule), then every term's contribution
    * is weighted (1 for the best group, tieBreaker otherwise) and the
    * final score sums in GLOBAL ascending term order — the exact FP
    * association of the WAND best-fields fold.
    */
  def topKDisMax(docs: DataFrame, subQueries: Seq[String], tieBreaker: Double,
      k: Int): DataFrame = {
    val groups = subQueries.map(q => Analyzer.analyzeQuery(q).toSeq.distinct)
    val toks = groups.flatten
    val spark = docs.sparkSession
    import spark.implicits._
    val gOf = groups.zipWithIndex.flatMap { case (ts, i) => ts.map(_ -> i) }
      .toDF("key", "g")
    val contribs = fieldContribs(docs, "text", toks, 1.0)
      .join(broadcast(gOf), Seq("key"))
    val per = contribs.groupBy(col("docId"), col("g")).agg(orderedKeySum.as("sg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("docId")).orderBy(col("sg").desc, col("g").asc)
    val best = per.withColumn("rn", row_number().over(w)).filter(col("rn") === lit(1))
      .select(col("docId"), col("g").as("bg"))
    contribs.join(best, Seq("docId"))
      .select(col("docId"), col("key"),
        (when(col("g") === col("bg"), lit(1.0)).otherwise(lit(tieBreaker)) * col("s")).as("s"))
      .groupBy(col("docId"))
      .agg(orderedKeySum.as("score"))
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  def topKConjunctive(docs: DataFrame, query: String, k: Int): DataFrame = {
    val terms = Analyzer.analyzeQuery(query).toSeq
    if (terms.isEmpty)
      return docs.sparkSession.emptyDataFrame
        .withColumn("docId", lit(0L)).withColumn("score", lit(0.0)).limit(0)
    scoredPostings(docs, terms)
      .groupBy(col("docId"))
      .agg(orderedSum.as("score"), count(lit(1)).as("nt"))
      .filter(col("nt") === lit(terms.size))
      .drop("nt")
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }
}
