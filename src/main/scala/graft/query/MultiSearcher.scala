package graft.query

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model.{IndexStats, PostingBlock, Scored, TermStats}

/** Cross-segment BM25 search with GLOBAL corpus statistics — the query
  * side of streaming ingest (StreamingIngest appends each micro-batch as
  * an independent `seg-<id>` index; reference behavior is one shared
  * index with shared stats, NeoFinderToES.java:184-192 append runs, so
  * queries must see the union as ONE corpus).
  *
  * Statistics merge associatively: N = Σ nᵢ, Σdl = Σ (nᵢ·avgdlᵢ)
  * (dl sums are integer-valued and < 2^52, so the per-segment product
  * rounds back to the exact integer sum), df(term) = Σ dfᵢ(term).
  * Per-segment docId ranges are disjoint by construction (appendSegment
  * offsets each batch past the current max docId), so per-(segment,
  * bucket) WAND results merge with a plain top-k.
  *
  * Stored per-block maxScore / dictionary maxScore encode the SEGMENT's
  * build-time stats and are not valid bounds under merged stats; block
  * bounds are re-derived from the stored stats-independent maxTf as
  * score(maxTf, dl = 0) (exact upper bound — BM25 is increasing in tf,
  * decreasing in dl). Exact per-posting rescoring from the stored
  * (tf, dl) streams with the global stats makes results rank-identical
  * to an exhaustive oracle over the union (StreamingSpec).
  */
class MultiSearcher(spark: SparkSession, indexDir: String) {
  import spark.implicits._

  private val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** seg-* sub-index directories (sorted for determinism). */
  val segments: Seq[String] = {
    val p = new Path(indexDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter(q => q.getName.startsWith("seg-"))
      .map(_.toString).sorted
  }
  require(segments.nonEmpty, s"no seg-* sub-indexes under $indexDir")

  private val segStats: Seq[IndexStats] =
    segments.map(s => spark.read.parquet(s"$s/stats").as[IndexStats].head())

  /** Global corpus stats over all segments. */
  val n: Long = segStats.map(_.n).sum
  val sumDl: Long = segStats.map(st => math.round(st.avgdl * st.n)).sum
  val avgdl: Double = if (n == 0) 0.0 else sumDl.toDouble / n

  /** Per-segment dictionary rows for the query terms + merged global df.
    * Returns (globalDf by term, per-segment termId by (segIdx, term)).
    * ONE unioned scan + one collect for ALL segments — query latency must
    * not grow one-Spark-job-per-segment with the micro-batch count
    * (round-2 review); the result stays ≤ |terms| × |segments| rows.
    */
  private def lookup(terms: Seq[String]): (Map[String, Long], Map[(Int, String), TermStats]) = {
    if (terms.isEmpty) return (Map.empty, Map.empty)
    val unioned = segments.zipWithIndex.map { case (seg, i) =>
      spark.read.parquet(s"$seg/dict")
        .filter(col("term").isin(terms: _*))
        .select(lit(i).as("seg"), col("term"), col("termId"), col("shard"),
          col("df"), col("cf"), col("maxScore"))
    }.reduce(_ unionByName _)
    val perSeg = unioned
      .as[(Int, String, Long, Int, Long, Long, Double)].collect()
      .map { case (i, t, tid, sh, df, cf, ms) => (i, t) -> TermStats(t, tid, sh, df, cf, ms) }
      .toMap
    val dfGlobal = perSeg.toSeq.groupBy(_._1._2)
      .map { case (t, xs) => t -> xs.map(_._2.df).sum }
    (dfGlobal, perSeg)
  }

  private def run(terms: Seq[String], k: Int, conjunctive: Boolean,
      slots: Seq[String] = null,
      filterClauses: Seq[Seq[String]] = Nil,
      excludeTerms: Seq[String] = Nil): Array[Scored] = {
    val distinctTerms = terms.distinct.sorted
    if (distinctTerms.isEmpty || k <= 0) return Array.empty
    val (dfGlobal, perSeg) =
      lookup((distinctTerms ++ filterClauses.flatten ++ excludeTerms).distinct.sorted)
    if (!distinctTerms.exists(dfGlobal.contains)) return Array.empty
    // a clause with no value present in any segment ⇒ nothing can match
    val clauses = filterClauses.map(_.filter(dfGlobal.contains))
    if (clauses.exists(_.isEmpty)) return Array.empty
    if ((conjunctive || slots != null) && distinctTerms.exists(t => !dfGlobal.contains(t)))
      return Array.empty
    val nTerms = distinctTerms.count(dfGlobal.contains)
    val fSet = clauses.flatten.toSet
    val eSet = excludeTerms.toSet
    val nG = n
    val avgdlG = avgdl
    // termId is segment-local: key block groups by (segIdx, termId)
    val idToTerm: Map[(Int, Long), (String, Long)] =
      perSeg.map { case ((i, t), ts) => (i, ts.termId) -> (t, dfGlobal(t)) }
    val segBlocks: Seq[DataFrame] = segments.zipWithIndex.flatMap { case (seg, i) =>
      val ids = perSeg.collect { case ((`i`, _), ts) => ts }.toSeq
      if (ids.isEmpty) None
      else {
        val shards = ids.map(_.shard).distinct
        Some(spark.read.parquet(s"$seg/blocks")
          .filter(col("shard").isin(shards: _*) && col("termId").isin(ids.map(_.termId): _*))
          .withColumn("seg", lit(i)))
      }
    }
    if (segBlocks.isEmpty) return Array.empty
    val all = segBlocks.reduce(_ unionByName _)
      .select(col("seg").as("_1"), col("bucket").as("_2"),
        struct(all_block_cols: _*).as("_3"))
      .as[(Int, Int, PostingBlock)]
    val sl = slots
    val cl = clauses
    val perGroup = all
      .groupByKey { case (seg, bucket, _) => (seg, bucket) }
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val segIdx = rows.head._1
        val grouped = rows.map(_._3).groupBy(_.termId).toSeq.map { case (tid, bs) =>
          val (t, df) = idToTerm((segIdx, tid))
          // bound from stats-independent maxTf (stored maxScore is
          // stale under global stats; filters never read bounds)
          lazy val ub = bs.iterator.map(b => Bm25.score(b.maxTf, df, 0, nG, avgdlG)).max
          val isScored = !fSet.contains(t) && !eSet.contains(t)
          (t, new Wand.TermIterator(t, bs, if (isScored) ub else 0.0, df, nG, avgdlG,
            staleBlockMax = true))
        }
        val iters = grouped.collect { case (t, it0) if !fSet.contains(t) && !eSet.contains(t) => it0 }
        val byName = grouped.toMap
        val clauseCursors: Seq[Option[Wand.DocCursor]] = cl.map { clause =>
          val members = clause.flatMap(byName.get)
          if (members.isEmpty) None
          else if (members.size == 1) Some(members.head)
          else Some(new Wand.UnionCursor(members))
        }
        val filters = clauseCursors.flatten
        val excludes = grouped.collect { case (t, it0) if eSet.contains(t) => it0 }
        // AND/phrase: every scored term must be present; filter context:
        // a (segment, bucket) where a clause has NO member value has no
        // matching docs
        if (iters.isEmpty || ((conjunctive || sl != null) && iters.size < nTerms) ||
          clauseCursors.exists(_.isEmpty)) Iterator.empty
        else {
          val top =
            if (sl != null) Wand.topKPhrase(iters, sl, k, filters, excludes)
            else if (conjunctive) Wand.topKConjunctive(iters, k, filters, excludes)
            else Wand.topK(iters, k, filters, excludes)
          top.iterator
        }
      }
    perGroup.orderBy(col("score").desc, col("docId").asc).limit(k).collect()
  }

  private def all_block_cols: Seq[org.apache.spark.sql.Column] =
    Seq("termId", "shard", "bucket", "blockId", "firstDocId", "lastDocId",
      "count", "docs", "tfs", "dls", "poss", "maxTf", "maxScore").map(col)

  /** Disjunctive (OR) BM25 top-k over the union of all segments. */
  def search(query: String, k: Int): Array[Scored] =
    run(Analyzer.analyzeQuery(query).toSeq, k, conjunctive = false)

  /** Conjunctive (AND) BM25 top-k over the union of all segments. */
  def searchConjunctive(query: String, k: Int): Array[Scored] =
    run(Analyzer.analyzeQuery(query).toSeq, k, conjunctive = true)

  /** Phrase top-k over the union of all segments (positions are stored
    * per posting, so adjacency needs no segment-level state; scores use
    * the merged global stats like every other path here).
    */
  def searchPhrase(query: String, k: Int): Array[Scored] = {
    val slots = Analyzer.tokenize(query).toSeq
    if (slots.isEmpty) return Array.empty
    run(slots.distinct.sorted, k, conjunctive = false, slots = slots)
  }

  /** ES bool query over the union of all segments: scoring clauses per
    * the flags, `filters`/`mustNot` against fielded keyword terms
    * ([[graft.index.FieldTerms]] — segments must be built with
    * `IndexConfig.fieldCols`, e.g. via StreamingIngest's cfg). Same
    * filter-context semantics as `Searcher.searchBool`: membership only,
    * scores = merged-global-stats BM25 of the scoring clauses.
    */
  def searchBool(
      query: String,
      k: Int,
      filters: Seq[(String, String)] = Nil,
      mustNot: Seq[(String, String)] = Nil,
      conjunctive: Boolean = false,
      phrase: Boolean = false,
      /** ES `terms` clauses: doc must carry ANY of the listed values. */
      anyFilters: Seq[(String, Seq[String])] = Nil,
      /** ES `range` clauses (lexicographic, inclusive): expanded with ONE
        * unioned dictionary scan across all segments — uncapped, like
        * `Searcher`'s (a capped expansion would silently drop docs).
        */
      rangeFilters: Seq[(String, String, String)] = Nil
  ): Array[Scored] = {
    val slots = if (phrase) Analyzer.tokenize(query).toSeq else null
    val scoredTerms =
      if (phrase) Option(slots).getOrElse(Nil).distinct.sorted
      else Analyzer.analyzeQuery(query).toSeq
    if (scoredTerms.isEmpty) return Array.empty
    run(scoredTerms, k, conjunctive, slots,
      filters.map { case (f, v) => Seq(graft.index.FieldTerms.term(f, v)) } ++
        anyFilters.map { case (f, vs) =>
          vs.distinct.map(v => graft.index.FieldTerms.term(f, v))
        } ++
        rangeFilters.map { case (f, lo, hi) => expandFieldRange(f, lo, hi) },
      mustNot.map { case (f, v) => graft.index.FieldTerms.term(f, v) }.distinct)
  }

  /** Stored `#field:value` terms with lo ≤ value ≤ hi across ALL
    * segments — one unioned, prefix-pruned dictionary scan (the same
    * one-job-per-lookup rule as [[lookup]]); an empty expansion makes
    * the clause unsatisfiable (run returns no hits).
    */
  private def expandFieldRange(field: String, lo: String, hi: String): Seq[String] = {
    val prefix = graft.index.FieldTerms.term(field, "")
    val valueCol = col("term").substr(lit(prefix.length + 1), lit(Int.MaxValue))
    segments.map { s =>
      spark.read.parquet(s"$s/dict")
        .filter(col("term").startsWith(prefix) &&
          valueCol >= lit(lo) && valueCol <= lit(hi))
        .select(col("term"))
    }.reduce(_ unionByName _).distinct().as[String].collect().toSeq.sorted
  }

  /** All segments' doc stores as one DataFrame (docIds globally unique). */
  def docs: DataFrame =
    segments.map(s => spark.read.parquet(s"$s/docs")).reduce(_ unionByName _)
}
