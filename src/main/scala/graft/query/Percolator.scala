package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.analysis.Analyzer

/** ES percolator — reverse search (a percolate API the ES 2.4-era
  * clusters the reference targets support; the reference code itself
  * only populates the index and does not call it): QUERIES are
  * stored, and a batch of incoming DOCUMENTS is matched against them —
  * the alerting/routing primitive ("which saved alert rules fire on
  * this new conversation turn?").
  *
  * Spark-first plan: the stored query set is small by nature (alert
  * rules — 10^2..10^6 rows) and the document batch is the big side, so
  * percolation is ONE embarrassingly-parallel pass over the docs with
  * the ANALYZED query set broadcast. Per partition, an inverted
  * term → candidate-queries map reproduces ES's extracted-terms
  * pre-filter: a query is scored only on docs sharing ≥ 1 of its terms,
  * so a doc touching none of the rule vocabulary costs one tokenize and
  * nothing per-query. Phrase rules verify exact adjacency against the
  * doc's in-memory position lists (built in the same tokenize pass, for
  * phrase terms only). No shuffle, no driver loop — cost is linear in
  * corpus bytes and independent of |queries| off the candidate path, so
  * the plan holds at 10^12 turns × 10^6 rules (per-partition imperative
  * logic — the documented legitimate `mapPartitions` use, same as
  * IndexBuilder.postingsOf).
  *
  * Semantics per mode (match-query family, the percolator's common
  * case): [[Percolator.Or]] = ES `match` operator=or with
  * `minimum_should_match` over the query's DISTINCT analyzed terms
  * (house rule, same as `searchBool(should)`); [[Percolator.And]] =
  * operator=and (every distinct term present); [[Percolator.Phrase]] =
  * `match_phrase` (exact adjacency, the engine phrase rule). A
  * minShouldMatch above the query's distinct-term count can never fire
  * (ES behavior) — constructing it throws instead, loudly.
  */
object Percolator {
  sealed trait Mode extends Serializable
  /** ES match, operator=or — fires on ≥ minShouldMatch distinct terms. */
  case object Or extends Mode
  /** ES match, operator=and — fires only with every distinct term. */
  case object And extends Mode
  /** ES match_phrase — terms exactly adjacent, in query order. */
  case object Phrase extends Mode

  /** One stored rule. `query` is analyzed with the corpus analyzer
    * (identical tokens to the indexed side — ES analyzes the percolator
    * query with the mapping's analyzer too).
    */
  final case class StoredQuery(id: String, query: String, mode: Mode = Or,
      minShouldMatch: Int = 1)

  private final case class Analyzed(id: String, tokens: Array[String],
      termSet: Array[String], mode: Mode, msm: Int)

  /** Match `queries` against every row of `docs` (needs `docId` long +
    * `text` string columns; null text never matches). Returns the
    * (docId, query_id) pairs that fire — unordered, as any distributed
    * frame; order downstream.
    */
  def percolate(spark: SparkSession, docs: DataFrame,
      queries: Seq[StoredQuery]): DataFrame = {
    require(queries.nonEmpty, "percolate needs >= 1 stored query")
    require(queries.map(_.id).distinct.size == queries.size,
      "stored query ids must be unique")
    val analyzed = queries.map { q =>
      val toks = Analyzer.tokenize(q.query)
      require(toks.nonEmpty, s"stored query '${q.id}' analyzes to no terms")
      require(q.minShouldMatch >= 1,
        s"stored query '${q.id}': minimumShouldMatch must be >= 1")
      // msm only has meaning in Or mode — accepting (and ignoring) it on
      // And/Phrase rules would contradict the file's loud-guard style
      // (r8 ADVICE)
      require(q.mode == Or || q.minShouldMatch == 1,
        s"stored query '${q.id}': minimumShouldMatch applies to Or-mode " +
          "rules only (And/Phrase would silently ignore it)")
      val terms = toks.distinct
      require(q.mode != Or || q.minShouldMatch <= terms.length,
        s"stored query '${q.id}': minimumShouldMatch ${q.minShouldMatch} " +
          s"exceeds its ${terms.length} distinct terms - it can never fire")
      Analyzed(q.id, toks, terms, q.mode, q.minShouldMatch)
    }.toArray
    val bc = spark.sparkContext.broadcast(analyzed)
    import spark.implicits._
    docs.select(col("docId").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val qs = bc.value
        // term -> indexes of queries carrying it (the ES extracted-terms
        // candidate filter), built once per partition from the broadcast
        val byTerm = new java.util.HashMap[String, java.util.ArrayList[Int]]()
        val phraseTerms = new java.util.HashSet[String]()
        for (qi <- qs.indices; t <- qs(qi).termSet) {
          var l = byTerm.get(t)
          if (l == null) { l = new java.util.ArrayList[Int](4); byTerm.put(t, l) }
          l.add(qi)
          if (qs(qi).mode == Phrase) phraseTerms.add(t)
        }
        val counts = new Array[Int](qs.length) // reset per doc via cand
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val toks = Analyzer.tokenize(text)
            val seen = new java.util.HashSet[String]()
            val pos = new java.util.HashMap[String, java.util.ArrayList[Int]]()
            val cand = new java.util.ArrayList[Int]()
            var i = 0
            while (i < toks.length) {
              val t = toks(i)
              if (phraseTerms.contains(t)) {
                var l = pos.get(t)
                if (l == null) { l = new java.util.ArrayList[Int](4); pos.put(t, l) }
                l.add(i)
              }
              if (seen.add(t)) {
                val l = byTerm.get(t)
                if (l != null) {
                  var j = 0
                  while (j < l.size) {
                    val qi = l.get(j)
                    if (counts(qi) == 0) cand.add(qi)
                    counts(qi) += 1
                    j += 1
                  }
                }
              }
              i += 1
            }
            val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
            var c = 0
            while (c < cand.size) {
              val qi = cand.get(c)
              val q = qs(qi)
              val fired = q.mode match {
                case Or => counts(qi) >= q.msm
                case And => counts(qi) == q.termSet.length
                case Phrase =>
                  counts(qi) == q.termSet.length && phraseFires(q.tokens, pos)
              }
              if (fired) hits += ((id, q.id))
              counts(qi) = 0
              c += 1
            }
            hits.iterator
          }
        }
      }
      .toDF("docId", "query_id")
  }

  /** Exact-adjacency check over the doc's position lists: some start p
    * of tokens(0) has tokens(j) at p + j for every j (repeated words in
    * the phrase fall out naturally — each slot checks its own list).
    */
  private def phraseFires(tokens: Array[String],
      pos: java.util.HashMap[String, java.util.ArrayList[Int]]): Boolean = {
    val sets = new Array[java.util.HashSet[Int]](tokens.length)
    var j = 1
    while (j < tokens.length) {
      val l = pos.get(tokens(j))
      if (l == null) return false
      sets(j) = new java.util.HashSet[Int](l)
      j += 1
    }
    val starts = pos.get(tokens(0))
    if (starts == null) return false
    var s = 0
    while (s < starts.size) {
      val p = starts.get(s)
      var k = 1
      var ok = true
      while (ok && k < tokens.length) {
        if (!sets(k).contains(p + k)) ok = false
        k += 1
      }
      if (ok) return true
      s += 1
    }
    false
  }
}
