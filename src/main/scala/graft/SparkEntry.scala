package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.compat.CatalogCompat
import graft.index.{IndexBuilder, IndexConfig}
import graft.model.Doc
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.query.{Bm25, Oracle, Searcher}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data-pipeline ops), each with a DuckDB
  * `oracleSql` twin where SQL-expressible. Column names are aligned
  * between both sides (the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Identical token rule on the DuckDB side (Analyzer parity). */
  private val SqlTokRegex = "[^\\p{L}\\p{N}]+"
  private def toksCte(table: String, id: String): String =
    s"WITH toks0 AS (SELECT $id, unnest(regexp_split_to_array(lower(text), '$SqlTokRegex')) AS term FROM $table), " +
      s"tok AS (SELECT $id, term FROM toks0 WHERE term <> '')"

  private def inList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString("(", ",", ")")

  // ---- documents → engine index (built once per (JVM, sfDir)) --------------
  private val idxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Streaming index exercising the cross-segment identity semantics:
    * batch 0 = the 300-conv transcript corpus, batch 1 RE-INGESTS
    * (conv-00000003, 1) with marker-free text (LWW upsert — the
    * reference's `_id = path` re-import), then (conv-00000099, 1) is
    * deleted. Built once per JVM; both mutations are applied in the
    * initializer so the two entries below are order-independent.
    */
  private def upsertIndex(s: SparkSession): String =
    idxCache.computeIfAbsent("__upsert__", _ => {
      import s.implicits._
      val out = java.nio.file.Files.createTempDirectory("graft-upsert-index").toString
      val cfg = IndexConfig(numBuckets = 1, partitions = 8)
      graft.streaming.StreamingIngest.appendSegment(s,
        graft.corpus.Transcripts.generate(s, 300L), out, batchId = 0L, cfg)
      val upd = Seq(graft.model.Turn("conv-00000003", 1, "user",
        "upserted sentinel payload row", None, new Timestamp(1767312000000L))).toDS()
      graft.streaming.StreamingIngest.appendSegment(s, upd, out, batchId = 1L, cfg)
      graft.streaming.StreamingIngest.deleteTurns(s, out, Seq(("conv-00000099", 1)))
      out
    })

  private[graft] def documentsDocs(spark: SparkSession, dir: String) = {
    import spark.implicits._
    table(spark, s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        Doc(id, f"doc-$id%08d", 0, "doc", t, None, new Timestamp(0L), Analyzer.tokenize(t).length)
      }
  }

  /** documentsDocs plus the table's keyword metadata columns (kept so
    * the index can store fielded filter terms — `IndexConfig.fieldCols`).
    */
  /** Memoized parquet table HANDLES (schema + file listing only — no
    * data is persisted, every action re-reads the files): the
    * relational entries re-opened their tables on every timed call,
    * re-reading footers for schema inference and re-listing the
    * directory each time (driver-side work plus listing jobs that are
    * not the query being measured).
    */
  private val tableCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def table(s: SparkSession, path: String): DataFrame =
    tableCache.computeIfAbsent(path, p => s.read.parquet(p))

  private val docsDFCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Memoized DataFrame HANDLE (plan + file listing — no persisted
    * data): q_percolate re-derives the frame per call, and rebuilding
    * it re-listed the parquet store each time.
    */
  private def documentsDocsDF(spark: SparkSession, dir: String): DataFrame =
    docsDFCache.computeIfAbsent(dir, d => documentsDocsDFUncached(spark, d))

  private def documentsDocsDFUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, String, Long)]
      // deterministic synthetic recency: ts = DecayEpochMs + (doc_id·37
      // mod 365) days — a date column the decay twins reproduce in SQL
      // arithmetic from doc_id alone (the documents table has no date)
      .map { case (id, t, lang, src, nc) =>
        (id, f"doc-$id%08d", 0, "doc", t, Option.empty[String],
          new Timestamp(DecayEpochMs + (id * 37 % 365) * DayMs),
          Analyzer.tokenize(t).length, lang, src, nc)
      }
      .toDF("docId", "conv_id", "turn_idx", "role", "text", "tool", "ts", "dl",
        "lang", "source", "n_chars")
      // a second ANALYZED text field (the reference's multi-field
      // mapping): deterministic derivation — the first (doc_id % 7)
      // tokens of the text — reproducible in DuckDB via list slicing,
      // with variable field length incl. empty titles (docCount < N)
      .withColumn("title",
        array_join(slice(Analyzer.tokensCol(col("text")), lit(1),
          pmod(col("docId"), lit(7)).cast("int")), " "))
  }

  private def documentsIndex(spark: SparkSession, dir: String): String =
    idxCache.computeIfAbsent(dir, _ => {
      val out = java.nio.file.Files.createTempDirectory("graft-docs-index").toString
      val docs = documentsDocsDF(spark, dir)
      // bucket count from the corpus-sizing rule (IndexConfig.sized);
      // lang/source are indexed as fielded keyword terms (filter
      // context) and n_chars with tiered numeric trie terms (bounded
      // range clauses at any cardinality) — text-term stats and all
      // BM25 scores are unaffected
      val cfg = IndexConfig.sized(docs.count(), spark.sparkContext.defaultParallelism)
        .copy(numShards = 8, fieldCols = Seq("lang", "source"),
          numericFieldCols = Seq("n_chars"), textFieldCols = Seq("title"))
      new IndexBuilder(spark, out, s"docs:$dir", cfg).buildFrom(docs)
      out
    })

  /** Two NAMED indexes over the documents table split by source
    * ('src1' vs the rest) under one root, plus an `all` alias — the
    * multi-index / alias surface fixture ([[graft.query.Indices]]).
    * Each index scores with its OWN stats (ES query_then_fetch).
    */
  private val multiIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def documentsMultiIndexRoot(spark: SparkSession, dir: String): String =
    multiIdxCache.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files.createTempDirectory("graft-docs-indices").toString
      val docs = documentsDocsDF(spark, dir)
      // null-safe split: a null source lands in idx-rest (the twin's
      // CASE WHEN ELSE branch) — `=!=` would route nulls to NEITHER
      // index (round-7 ADVICE)
      for ((name, pred) <- Seq(
          "idx-src1" -> (col("source") <=> lit("src1")),
          "idx-rest" -> !(col("source") <=> lit("src1")))) {
        val part = docs.filter(pred)
        val cfg = IndexConfig.sized(part.count(), spark.sparkContext.defaultParallelism)
          .copy(numShards = 8)
        new IndexBuilder(spark, s"$root/$name", s"docs:$dir:$name", cfg).buildFrom(part)
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.query.Aliases.add(fs, root, "all", Seq("idx-rest", "idx-src1"))
      root
    })

  /** Open serving handles, one per index dir — the state a serving
    * deployment holds across requests (round-7 review added exactly
    * this memoization inside [[graft.query.Indices]]; the harness
    * entries get the same contract). Reuses ONLY metadata/listing
    * state: the Searcher's lazy stats row, fieldstats map, and the
    * parquet DataFrame handles (file listings). No `warm()` is called —
    * no driver dictionary, no pinned blocks — so every query still runs
    * the cold distributed path, and nothing about any query's RESULT
    * depends on the reuse. Before this, every timed entry re-listed and
    * re-read the same four parquet stores (~8 extra Spark jobs per
    * query — round-9 job-breakdown measurement).
    */
  private val searcherCache = new java.util.concurrent.ConcurrentHashMap[String, Searcher]()
  private def searcherOf(s: SparkSession, indexDir: String): Searcher =
    searcherCache.computeIfAbsent(indexDir, d => new Searcher(s, d, 8))
  private val indicesCache = new java.util.concurrent.ConcurrentHashMap[String, graft.query.Indices]()
  private def indicesOf(s: SparkSession, root: String): graft.query.Indices =
    indicesCache.computeIfAbsent(root, r => new graft.query.Indices(s, r, 8))
  private val msCache = new java.util.concurrent.ConcurrentHashMap[String, graft.query.MultiSearcher]()
  private def msOf(s: SparkSession, dir: String): graft.query.MultiSearcher =
    msCache.computeIfAbsent(dir, d => new graft.query.MultiSearcher(s, d))

  private def rankHits(spark: SparkSession, hits: Array[graft.model.Scored],
      rankBase: Long = 0L): DataFrame = {
    import spark.implicits._
    hits.toSeq.zipWithIndex
      .map { case (h, i) => (rankBase + i + 1, h.docId, BigDecimal(h.score).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toDF("rank", "doc_id", "score")
  }

  private def wandTopK(spark: SparkSession, dir: String, q: String, k: Int,
      conjunctive: Boolean, phrase: Boolean = false): DataFrame = {
    val s = searcherOf(spark, documentsIndex(spark, dir))
    val hits =
      if (phrase) s.searchPhrase(q, k)
      else if (conjunctive) s.searchConjunctive(q, k)
      else s.search(q, k)
    rankHits(spark, hits)
  }

  /** BM25 oracle SQL over the documents table for a fixed query.
    * `phrase` non-null restricts to docs whose analyzed token stream
    * contains the phrase adjacently (substring of the space-joined
    * stream — exact, tokens cannot contain spaces).
    */
  /** 2-term SLOPPY-phrase membership subquery (the engine's Lucene
    * slop semantics for the bigram "a b": adjusted-position width
    * |p_b − p_a − 1| ≤ slop, so TRANSPOSED terms match from slop ≥ 2):
    * DuckDB positional token table via the 2-arg list_transform lambda.
    */
  private def proximitySubquery(a: String, b: String, slop: Int): String =
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
  pe AS (SELECT doc_id, tp.term AS term, tp.p AS p FROM (SELECT doc_id, unnest(list_transform(arr, (t, i) -> {'term': t, 'p': i})) AS tp FROM arrs))
  SELECT DISTINCT pa.doc_id FROM pe pa JOIN pe pb USING (doc_id)
  WHERE pa.term = '$a' AND pb.term = '$b' AND abs(pb.p - pa.p - 1) <= $slop"""

  /** match_phrase_prefix membership subquery: docs where `a` is
    * immediately followed by ANY of the ≤`cap` term-asc distinct corpus
    * terms starting with `p` — the engine's expansion rewrite verbatim.
    */
  private def phrasePrefixSubquery(a: String, p: String, cap: Int): String =
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
  pe AS (SELECT doc_id, tp.term AS term, tp.p AS p FROM (SELECT doc_id, unnest(list_transform(arr, (t, i) -> {'term': t, 'p': i})) AS tp FROM arrs)),
  exp AS (SELECT DISTINCT term FROM pe WHERE term LIKE '$p%' ORDER BY term ASC LIMIT $cap)
  SELECT DISTINCT pa.doc_id FROM pe pa JOIN pe pb USING (doc_id)
  WHERE pa.term = '$a' AND pb.term IN (SELECT term FROM exp) AND pb.p - pa.p = 1"""

  private def bm25Sql(terms: Seq[String], k: Int, conjunctive: Boolean,
      phrase: Seq[String] = null, termPred: String = null,
      docPred: String = null, havingExpr: String = null,
      offset: Int = 0, docIdIn: String = null,
      /** ES min_score twin: predicate over the summed `score` applied
        * BEFORE ranking/limit (WHERE on the scored CTE — row_number
        * then ranks the filtered ordering, the engine's rule).
        */
      scorePred: String = null): String = {
    val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
    val having =
      if (havingExpr != null) s"HAVING $havingExpr"
      else if (conjunctive) s"HAVING count(*) = ${terms.size}"
      else ""
    val pred = if (termPred != null) termPred else s"tf.term IN ${inList(terms)}"
    // filter/must_not context: restrict doc MEMBERSHIP only — scores stay
    // the full-corpus BM25 (exact ES bool filter semantics)
    val docAnd = if (docPred == null) "" else
      s" AND tf.doc_id IN (SELECT doc_id FROM documents WHERE $docPred)"
    val phraseAnd = (if (phrase == null) "" else
      s""" AND tf.doc_id IN (SELECT doc_id FROM documents
    WHERE contains(' ' || array_to_string(list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> ''), ' ') || ' ', ' ${phrase.mkString(" ")} '))""") +
      (if (docIdIn == null) "" else s" AND tf.doc_id IN ($docIdIn)") + docAnd
    // pagination twin: rank is computed over the FULL ordering, then the
    // page is cut — ranks on page p read offset+1 .. offset+k
    val page = if (offset == 0) "" else s" OFFSET $offset"
    s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE $pred$phraseAnd
  GROUP BY tf.doc_id $having)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored${if (scorePred == null) "" else s" WHERE $scorePred"} ORDER BY score DESC, doc_id ASC LIMIT $k$page"""
  }

  /** CTEs of the derived 'title' analyzed field (first doc_id % 7 text
    * tokens, exactly documentsDocsDF's derivation — DuckDB list slicing
    * arr[1:k] ≡ Spark slice(arr, 1, k)) with the engine's per-field
    * statistics: docCount = docs with a non-empty title, avgdl over
    * those docs.
    */
  private def titleCtes: String =
    s"""arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
ttl AS (SELECT doc_id, arr[1:CAST(doc_id % 7 AS INT)] AS farr FROM arrs),
fdl AS (SELECT doc_id, len(farr) AS fdl FROM ttl),
fst AS (SELECT count(*) FILTER (fdl > 0) AS n, CAST(sum(fdl) AS DOUBLE) / (count(*) FILTER (fdl > 0)) AS avgdl FROM fdl),
ftok AS (SELECT doc_id, unnest(farr) AS term FROM ttl),
ftf AS (SELECT term, doc_id, count(*) AS tf FROM ftok GROUP BY 1, 2),
fdf AS (SELECT term, count(*) AS df FROM ftf GROUP BY 1)"""

  /** Per-field BM25 twin ([[graft.query.Searcher.searchField]] on
    * 'title'): the FIELD's df/dl/docCount/avgdl, summed in ascending
    * term order. `termPred` overrides the IN-list (term-expansion
    * twins — the predicate sees the BARE token, like the engine's
    * namespace-stripped expansion); `conjunctive` requires every term;
    * `docIdIn` restricts membership (phrase twins).
    */
  private def fieldBm25Sql(terms: Seq[String], k: Int,
      conjunctive: Boolean = false, termPred: String = null,
      docIdIn: String = null): String = {
    val score = Bm25.scoreSql("ftf.tf", "fdf.df", "fdl.fdl", "fst.n", "fst.avgdl")
    val pred = if (termPred != null) termPred else s"ftf.term IN ${inList(terms)}"
    val having = if (conjunctive) s"HAVING count(*) = ${terms.size}" else ""
    val docAnd = if (docIdIn == null) "" else s" AND ftf.doc_id IN ($docIdIn)"
    s"""WITH $titleCtes,
scored AS (
  SELECT ftf.doc_id, sum($score ORDER BY ftf.term ASC) AS score
  FROM ftf JOIN fdf USING (term) JOIN fdl USING (doc_id) CROSS JOIN fst
  WHERE $pred$docAnd
  GROUP BY ftf.doc_id $having)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT $k"""
  }

  /** Adjacent-bigram membership within the derived TITLE field (the
    * engine's `searchField(phrase = true)` slop-0 adjacency over the
    * FIELD's own positions): DuckDB positional table over `farr`.
    */
  private def titlePhraseSubquery(a: String, b: String): String =
    s"""SELECT DISTINCT pa.doc_id FROM
  (SELECT doc_id, tp.term AS term, tp.p AS p FROM (SELECT doc_id, unnest(list_transform(farr, (t, i) -> {'term': t, 'p': i})) AS tp FROM ttl)) pa
  JOIN (SELECT doc_id, tp.term AS term, tp.p AS p FROM (SELECT doc_id, unnest(list_transform(farr, (t, i) -> {'term': t, 'p': i})) AS tp FROM ttl)) pb
  USING (doc_id)
  WHERE pa.term = '$a' AND pb.term = '$b' AND pb.p - pa.p = 1"""

  /** best_fields multi_match twin (ES's default mode): per-field sums
    * fold in ascending namespaced-key order; the final score re-folds
    * EVERY contribution in the same global order, weighted 1 on the
    * best field (ties → '%title:…' keys sort before plain tokens, so
    * the title field wins) and tie_breaker elsewhere — exactly
    * [[graft.query.Wand.BestFields]]'s evaluation rule.
    */
  private def multiMatchBestSql(terms: Seq[String], bText: Double, bTitle: Double,
      tieBreaker: Double, k: Int): String = {
    val sText = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
    val sTitle = Bm25.scoreSql("ftf.tf", "fdf.df", "fdl.fdl", "fst.n", "fst.avgdl")
    s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
$titleCtes,
contrib AS (
  SELECT tf.doc_id, tf.term AS key, ($sText) * $bText AS s, 1 AS fld
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(terms)}
  UNION ALL
  SELECT ftf.doc_id, '%title:' || ftf.term AS key, ($sTitle) * $bTitle AS s, 0 AS fld
  FROM ftf JOIN fdf USING (term) JOIN fdl USING (doc_id) CROSS JOIN fst
  WHERE ftf.term IN ${inList(terms)}),
per AS (SELECT doc_id, fld, sum(s ORDER BY key ASC) AS sf FROM contrib GROUP BY doc_id, fld),
best AS (SELECT doc_id, fld AS bfld FROM
  (SELECT doc_id, fld, row_number() OVER (PARTITION BY doc_id ORDER BY sf DESC, fld ASC) AS rn FROM per)
  WHERE rn = 1),
scored AS (
  SELECT c.doc_id, sum((CASE WHEN c.fld = b.bfld THEN 1.0 ELSE $tieBreaker END) * c.s ORDER BY c.key ASC) AS score
  FROM contrib c JOIN best b ON c.doc_id = b.doc_id GROUP BY c.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT $k"""
  }

  /** multi_match twin (most_fields, text×bText + title×bTitle): every
    * (field, term) contribution boost-scaled and summed in ascending
    * NAMESPACED-key order ('%title:…' sorts before plain tokens — the
    * engine's merged-iterator order).
    */
  private def multiMatchSql(terms: Seq[String], bText: Double, bTitle: Double,
      k: Int): String = {
    val sText = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
    val sTitle = Bm25.scoreSql("ftf.tf", "fdf.df", "fdl.fdl", "fst.n", "fst.avgdl")
    s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
$titleCtes,
contrib AS (
  SELECT tf.doc_id, tf.term AS key, ($sText) * $bText AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(terms)}
  UNION ALL
  SELECT ftf.doc_id, '%title:' || ftf.term AS key, ($sTitle) * $bTitle AS s
  FROM ftf JOIN fdf USING (term) JOIN fdl USING (doc_id) CROSS JOIN fst
  WHERE ftf.term IN ${inList(terms)}),
scored AS (SELECT doc_id, sum(s ORDER BY key ASC) AS score FROM contrib GROUP BY doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT $k"""
  }

  /** Synthetic-recency base + day length (millis) for the derived `ts`
    * column and the decay-rescore twins.
    */
  private val DecayEpochMs = 1700000000000L
  private val DayMs = 86400000L

  private val Bm25Query = "spark query window merge"
  private val AndQuery = "spark window customer"
  private val PhraseQuery = "merge sort" // adjacent bigram present at every sf

  /** Stored percolator rules (q_percolate) — shared with the twin so the
    * SQL VALUES lists are DERIVED from the same definition (no drift).
    * One rule per mode: or + minimum_should_match, and, phrase.
    */
  private val PercolateRules = Seq(
    graft.query.Percolator.StoredQuery("r-or", "stream scan"),
    graft.query.Percolator.StoredQuery("r-msm2", Bm25Query,
      graft.query.Percolator.Or, minShouldMatch = 3),
    graft.query.Percolator.StoredQuery("r-and", "slow query",
      graft.query.Percolator.And),
    graft.query.Percolator.StoredQuery("r-phrase", PhraseQuery,
      graft.query.Percolator.Phrase))

  /** Flagship: BM25 WAND top-10 over sf0.001 documents via the full
    * engine (index build + compressed blocks + block-max WAND).
    */
  def entry(spark: SparkSession): DataFrame =
    wandTopK(spark, "/root/testdata/sf0.001", Bm25Query, 10, conjunctive = false)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / filters / projections (SURVEY §2.1–2.2) ----
    "q_filter_keyword" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .filter(col("lang") === lit("en"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),
    "q_filter_range" -> ((s, dir) => {
      table(s, s"$dir/events.parquet")
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-01-20").cast("timestamp") && col("value") > lit(0.0))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    }),
    // ---- aggregation / join / top-k / window / set ops (§2.4–2.8) ----
    "q_agg_lineitem" -> ((s, dir) => {
      table(s, s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum((lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")) *
            col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q_join_broadcast" -> ((s, dir) => {
      val li = table(s, s"$dir/lineitem.parquet")
      val o = broadcast(table(s, s"$dir/orders.parquet"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),
    "q_topk_orders" -> ((s, dir) => {
      table(s, s"$dir/orders.parquet")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)
    }),
    "q_window_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id").asc)
      table(s, s"$dir/documents.parquet")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= lit(3))
        .select(col("source"), col("rank"), col("doc_id"), col("n_chars"))
        .orderBy(col("source"), col("rank"))
    }),
    "q_union_dedup" -> ((s, dir) => {
      val d = table(s, s"$dir/documents.parquet")
      d.filter(col("lang") === lit("en")).select(col("doc_id"))
        .unionByName(d.filter(col("source") === lit("src1")).select(col("doc_id")))
        .dropDuplicates("doc_id")
        .orderBy(col("doc_id"))
    }),
    "q_validation_counters" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet").agg(
        count(lit(1)).as("n_total"),
        sum(when(length(col("text")) === lit(0), 1L).otherwise(0L)).as("n_empty_text"),
        sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L)).as("n_bad_nchars"))
    }),
    // ---- compat scalar functions (§2.3) ----
    "q_date_multiformat" -> ((s, dir) => {
      val e = table(s, s"$dir/events.parquet").filter(col("event_id") < lit(1000))
      val str = when(pmod(col("event_id"), lit(3)) === lit(0), date_format(col("ts"), "dd.MM.yyyy HH:mm:ss"))
        .when(pmod(col("event_id"), lit(3)) === lit(1), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .otherwise(date_format(col("ts"), "MM/dd/yyyy HH:mm:ss"))
      e.withColumn("raw", str)
        .withColumn("normalized", CatalogCompat.formatRefDate(CatalogCompat.parseMultiDate(col("raw"))))
        .select(col("event_id"), col("normalized"))
        .orderBy(col("event_id"))
    }),
    "q_size_parse" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .withColumn("size_str",
          concat(lit("doc ("), (col("n_chars") * lit(1000)).cast("string"), lit(" Bytes)")))
        .select(col("doc_id"), CatalogCompat.sizeToBytes(col("size_str")).as("size_bytes"))
        .orderBy(col("doc_id"))
    }),
    // ---- fulltext: tokenize / tf / df / stats / BM25 (§2.1 S10, §2.4 A6–A8, §3.3) ----
    "q_tokenize_count" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"), Analyzer.dlCol(col("text")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),
    "q_tf" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"), explode(Analyzer.tokensCol(col("text"))).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .orderBy(col("term"), col("doc_id"))
    }),
    "q_df" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"), explode(Analyzer.tokensCol(col("text"))).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
        .orderBy(col("term"))
    }),
    "q_corpus_stats" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(Analyzer.dlCol(col("text")).as("dl"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("dl")), 6).as("avgdl"))
    }),
    "q_bm25_topk" -> ((s, dir) =>
      wandTopK(s, dir, Bm25Query, 10, conjunctive = false)),
    "q_bm25_and" -> ((s, dir) =>
      wandTopK(s, dir, AndQuery, 10, conjunctive = true)),
    "q_bm25_phrase" -> ((s, dir) =>
      // positional postings + adjacency check (ES match_phrase); the
      // DuckDB twin filters on exact substring of the analyzed stream
      wandTopK(s, dir, PhraseQuery, 10, conjunctive = false, phrase = true)),
    // term-expansion queries (ES prefix/wildcard/fuzzy): the dictionary
    // expansion is deterministic (term-asc, capped far above the actual
    // match counts here), so the DuckDB twin applies the same predicate
    // to the tf table directly
    "q_bm25_prefix" -> ((s, dir) => {
      import s.implicits._
      rankHits(s, searcherOf(s, documentsIndex(s, dir)).searchPrefix("s", 10))
    }),
    "q_bm25_wildcard" -> ((s, dir) => {
      import s.implicits._
      rankHits(s, searcherOf(s, documentsIndex(s, dir)).searchWildcard("s*a*", 10))
    }),
    "q_bm25_fuzzy" -> ((s, dir) => {
      import s.implicits._
      rankHits(s, searcherOf(s, documentsIndex(s, dir)).searchFuzzy("sprak", 10, maxDist = 2))
    }),
    "q_bm25_fuzzy_prefix" -> ((s, dir) => {
      // ES fuzzy prefix_length: candidates share the first 2 chars (the
      // cold dict scan becomes a row-group-prunable startsWith)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchFuzzy("sprak", 10, maxDist = 2, prefixLength = 2))
    }),
    "q_constant_score" -> ((s, dir) =>
      // ES constant_score: filter-context membership, score = boost,
      // deterministic docId-asc ties — no BM25, no WAND
      searcherOf(s, documentsIndex(s, dir))
        .searchConstantScore(Bm25Query, 10, boost = 2.5,
          filters = Seq("lang" -> "en"))
        .select(col("docId").as("doc_id"), col("score"))),
    "q_rescore" -> ((s, dir) =>
      // ES function_score field_value_factor via a rescore window:
      // top-50 BM25 hits re-ranked by bm25 * (0.001 * n_chars), top 10
      searcherOf(s, documentsIndex(s, dir))
        .rescoreByFieldFactor(Bm25Query, 10, window = 50, "n_chars", 0.001)
        .select(col("docId").as("doc_id"), round(col("score"), 4).as("score"))),
    "q_decay_recency" -> ((s, dir) =>
      // ES function_score gauss decay on the (derived) `ts` date field
      // through the rescore window: top-50 BM25 hits re-ranked by
      // bm25 · 0.5^((d/scale)²), d = |ts − origin| millis, scale = 90d
      // — the recency boost ES users run on the reference's
      // created/lastChanged date mapping
      searcherOf(s, documentsIndex(s, dir))
        .rescoreByDecay(Bm25Query, 10, window = 50, "ts", shape = "gauss",
          origin = (DecayEpochMs + 364L * DayMs).toDouble,
          scale = 90.0 * DayMs)
        .select(col("docId").as("doc_id"), round(col("score"), 4).as("score"))),
    "q_collapse" -> ((s, dir) =>
      // ES field collapsing: ONE best hit per `lang` (score desc, docId
      // asc within the group), groups ranked by their best hit, top 5 —
      // needs the SCORED match set (top-k alone cannot collapse)
      searcherOf(s, documentsIndex(s, dir))
        .collapse(Bm25Query, "lang", 5)
        .select(col("key"), col("doc_id"), round(col("score"), 4).as("score"))),
    "q_collapse_inner" -> ((s, dir) =>
      // ES collapse + inner_hits: top-3 groups by their best hit, each
      // returning its <=2 best hits in hit_rank order
      searcherOf(s, documentsIndex(s, dir))
        .collapse(Bm25Query, "lang", 3, innerHits = 2)
        .select(col("key"), col("hit_rank"), col("doc_id"),
          round(col("score"), 4).as("score"))),
    "q_bm25_regexp" -> ((s, dir) => {
      // ES `regexp` query: whole-term anchoring (Lucene), deterministic
      // term-asc capped expansion, BM25 OR — 'sp.rk|wind.w' expands to
      // {spark, window}
      rankHits(s, searcherOf(s, documentsIndex(s, dir)).searchRegexp("sp.rk|wind.w", 10))
    }),
    "q_bm25_match_fuzzy" -> ((s, dir) => {
      // ES match + fuzziness: EVERY query token expands (per-token cap)
      // and the union scores as one BM25 OR; each expansion scores with
      // its own idf (documented deviation from ES's blended rewrite)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchMatchFuzzy("sprak windoq", 10, maxDist = 2))
    }),
    "q_dis_max" -> ((s, dir) => {
      // ES dis_max as a general combinator: best sub-query's BM25 sum +
      // tie_breaker · the others (the best-fields fold over query groups)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchDisMax(Seq("spark window", "query merge"), 10, tieBreaker = 0.3))
    }),
    "q_dis_max_shared" -> ((s, dir) => {
      // ES dis_max with OVERLAPPING sub-queries (round-7 review "What's
      // missing #5"): 'window' belongs to BOTH groups and contributes
      // to each group's sum independently — one scored iterator per
      // (group, term), exactly ES's isolated sub-query scoring
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchDisMax(Seq("spark window", "window merge"), 10, tieBreaker = 0.3))
    }),
    "q_bm25_filtered" -> ((s, dir) => {
      // ES bool query, filter context: score = plain BM25 under FULL
      // corpus stats, membership restricted by the fielded keyword term
      // #lang:fr (one extra unscored posting list in the WAND)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, filters = Seq("lang" -> "fr")))
    }),
    "q_bm25_mustnot" -> ((s, dir) => {
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, mustNot = Seq("lang" -> "en", "source" -> "src1")))
    }),
    "q_bm25_terms" -> ((s, dir) => {
      // ES `terms` clause: one UnionCursor over the values' posting lists
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, anyFilters = Seq("lang" -> Seq("fr", "es"))))
    }),
    "q_bm25_range" -> ((s, dir) => {
      // ES `range` clause (lexicographic, inclusive): dictionary-expanded
      // to the stored #lang values in ['d','f'] = {de, en, es}
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, rangeFilters = Seq(("lang", "d", "f"))))
    }),
    "q_bm25_range_numeric" -> ((s, dir) => {
      // tiered numeric trie range on the HIGH-CARDINALITY n_chars field
      // (IndexConfig.numericFieldCols): the clause is a bounded set of
      // trie cells, never one dictionary term per distinct value
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, numericRangeFilters = Seq(("n_chars", 137L, 2741L))))
    }),
    "q_bm25_field" -> ((s, dir) => {
      // fielded match (ES {"match": {"title": ...}}): BM25 over the
      // 'title' analyzed field under the FIELD's own stats — df per
      // %title term, field dl, (docCount, avgdl) from fieldstats/
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchField("title", Bm25Query, 10))
    }),
    "q_bm25_multimatch" -> ((s, dir) => {
      // ES multi_match (most_fields): text×1 + title×2, every matched
      // (field, term) contribution boost-scaled, one ascending-key sum
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .multiMatch("spark query", Seq("text" -> 1.0, "title" -> 2.0), 10))
    }),
    "q_bm25_multimatch_best" -> ((s, dir) => {
      // ES multi_match DEFAULT mode (best_fields + tie_breaker):
      // score = best field's boost-scaled sum + 0.3 × the other
      // field's — evaluated as one ascending-namespaced-key weighted
      // fold (tb=1 ≡ most_fields bit-exactly)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .multiMatch("spark query", Seq("text" -> 1.0, "title" -> 2.0), 10,
          bestFields = true, tieBreaker = 0.3))
    }),
    "q_bm25_field_phrase" -> ((s, dir) => {
      // fielded match_phrase: adjacency over the FIELD's own positions,
      // conjunctive per-field BM25 scoring (round-5 review ask #4)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchField("title", "column vector", 10, phrase = true))
    }),
    "q_bm25_field_prefix" -> ((s, dir) => {
      // per-field term expansion (ES prefix on an analyzed sub-field):
      // expands within the %title: namespace, scores under field stats
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchPrefix("s", 10, field = "title"))
    }),
    "q_bm25_phrase_prefix" -> ((s, dir) => {
      // ES match_phrase_prefix: 'merge s*' — the last position expands
      // to the ≤50 term-asc dictionary terms starting 's' and rides the
      // phrase as ONE multi-term union slot (Lucene MultiPhraseQuery);
      // score = BM25 of the fixed terms (the slot gates membership)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchPhrasePrefix("merge s", 10))
    }),
    "q_facet_terms_range" -> ((s, dir) =>
      // aggregation over the FULL bool query incl. a `terms` clause and
      // a lexicographic keyword `range` clause (round-5 review ask #6)
      searcherOf(s, documentsIndex(s, dir))
        .facetCounts(Bm25Query, "source",
          anyFilters = Seq("lang" -> Seq("fr", "es", "de")),
          rangeFilters = Seq(("source", "src1", "src2")))),
    "q_bm25_exists" -> ((s, dir) => {
      // ES `exists` query: docs that HAVE the title field (≥1 token) —
      // the `_field_names`-style marker term rides the WAND as one more
      // filter cursor, never a doc-store scan
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, exists = Seq("title")))
    }),
    "q_bm25_missing" -> ((s, dir) => {
      // ES must_not exists ("missing"): docs WITHOUT the title field —
      // the exists marker rides the must_not cursor set
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool(Bm25Query, 10, missing = Seq("title")))
    }),
    "q_cardinality" -> ((s, dir) => {
      import s.implicits._
      // ES cardinality agg: distinct source values among the match set
      // (exact distributed count-distinct; approximate=true = HLL++)
      Seq(searcherOf(s, documentsIndex(s, dir))
        .cardinality(Bm25Query, "source")).toDF("n_distinct")
    }),
    "q_percentiles" -> ((s, dir) =>
      // ES percentiles agg over the match set (exact closest-ranks
      // linear interpolation — the quantile_cont rule both sides)
      searcherOf(s, documentsIndex(s, dir))
        .percentiles(Bm25Query, "n_chars", Seq(0.25, 0.5, 0.9))
        .select(col("p"), round(col("value"), 4).as("value"))),
    "q_facet_top" -> ((s, dir) =>
      // ES terms agg DEFAULT ordering: top `size` buckets by doc count
      // desc (value asc tiebreak) — TakeOrderedAndProject over the agg
      searcherOf(s, documentsIndex(s, dir))
        .facetCounts(Bm25Query, "source", size = 3)),
    "q_ranges_agg" -> ((s, dir) =>
      // ES range aggregation: half-open [from, to) buckets, each an
      // independent conditional count in ONE pass over the match set
      searcherOf(s, documentsIndex(s, dir))
        .rangesAgg(Bm25Query, "n_chars",
          Seq((None, Some(500L)), (Some(500L), Some(2000L)), (Some(2000L), None)))),
    "q_filters_agg" -> ((s, dir) =>
      // ES filters aggregation: named keyword-predicate buckets, each
      // an independent conditional count in ONE pass (overlap allowed)
      searcherOf(s, documentsIndex(s, dir))
        .filtersAgg(Bm25Query, Seq(
          "english" -> ("lang", "en"),
          "src1" -> ("source", "src1"),
          "german" -> ("lang", "de")))),
    "q_top_hits" -> ((s, dir) =>
      // ES top_hits sub-aggregation: per-lang top-3 matching docs by
      // n_chars (window group-limit — the per-shard-heap plan shape)
      searcherOf(s, documentsIndex(s, dir))
        .facetTopHits(Bm25Query, "lang", "n_chars", 3)),
    "q_significant_terms" -> ((s, dir) =>
      // ES significant_terms: JLH-scored over-represented terms of the
      // match set; background stats come from the DICTIONARY, never a
      // second corpus scan
      searcherOf(s, documentsIndex(s, dir))
        .significantTerms(Bm25Query, 10, minDocCount = 5L)
        .select(col("term"), col("fg_count"), col("bg_count"),
          round(col("score"), 4).as("score"))),
    "q_suggest" -> ((s, dir) =>
      // ES term suggester ("did you mean"): dictionary terms within 2
      // edits of the misspelling, ranked (dist asc, df desc, term asc)
      searcherOf(s, documentsIndex(s, dir))
        .suggestTerms("sprak", 5, maxDist = 2)),
    "q_multi_index_boost" -> ((s, dir) => {
      // ES indices_boost: one index's scores multiply by a constant
      // factor BEFORE the cross-index merge (per-index ranking is
      // preserved — the boosted global top-k stays exact)
      val root = documentsMultiIndexRoot(s, dir)
      indicesOf(s, root)
        .search("idx-*", Bm25Query, 10, indicesBoost = Map("idx-src1" -> 3.0))
        .select(col("index"), col("docId").as("doc_id"),
          round(col("score"), 4).as("score"))
    }),
    "q_multi_index" -> ((s, dir) => {
      // ES multi-index search (name patterns + aliases): per-index
      // LOCAL-stats top-k (query_then_fetch), merged (score desc,
      // index asc, docId asc) — alias 'all' ≡ pattern 'idx-*', pinned
      // in IndicesSpec
      val root = documentsMultiIndexRoot(s, dir)
      indicesOf(s, root).search("idx-*", Bm25Query, 10)
        .select(col("index"), col("docId").as("doc_id"),
          round(col("score"), 4).as("score"))
    }),
    "q_multi_index_facet" -> ((s, dir) => {
      // ES multi-index aggregation: per-index terms-agg plans union
      // into ONE job, counts merged by SUM (docs live in exactly one
      // index — the ES coordinating-node bucket merge); the two halves
      // partition documents, so the merge ≡ the whole-table facet
      val root = documentsMultiIndexRoot(s, dir)
      indicesOf(s, root).facetCounts("all", Bm25Query, "lang")
    }),
    "q_multi_index_stats" -> ((s, dir) => {
      // ES multi-index stats aggregation: per-index one-row stats
      // partials in ONE job, merged EXACTLY (counts/sums add, min/max
      // combine, avg re-derived from merged sum ÷ count); the halves
      // partition documents, so the merge ≡ the whole-table stats
      val root = documentsMultiIndexRoot(s, dir)
      indicesOf(s, root).fieldStats("all", Bm25Query, "n_chars")
        .select(col("n_docs"), col("min").cast("long").as("min"),
          col("max").cast("long").as("max"), round(col("avg"), 6).as("avg"),
          col("sum").cast("long").as("sum"))
    }),
    "q_multi_index_percentiles" -> ((s, dir) => {
      // ES multi-index percentiles: exact order statistic over the
      // UNIONED per-index match sets in ONE job (no sketch-state merge
      // needed — the indexes partition documents, so the union is the
      // global match set)
      val root = documentsMultiIndexRoot(s, dir)
      indicesOf(s, root)
        .percentiles("all", Bm25Query, "n_chars", Seq(0.25, 0.5, 0.9))
        .select(col("p"), round(col("value"), 4).as("value"))
    }),
    "q_multi_index_cardinality" -> ((s, dir) => {
      import s.implicits._
      // ES multi-index cardinality: distinct values de-dup ACROSS
      // indexes inside the unioned match set (per-index counts cannot
      // merge exactly — a value in both halves must count once)
      val root = documentsMultiIndexRoot(s, dir)
      Seq(indicesOf(s, root)
        .cardinality("idx-*", Bm25Query, "source")).toDF("n_distinct")
    }),
    "q_explain" -> ((s, dir) => {
      // ES _explain: per-term BM25 breakdown of the flagship query's
      // top-1 hit — sum(weight) is bit-identical to the search score
      val searcher = searcherOf(s, documentsIndex(s, dir))
      val top = searcher.search(Bm25Query, 1).head
      searcher.explain(Bm25Query, top.docId)
        .select(col("term"), col("tf").cast("long").as("tf"), col("df"),
          col("dl").cast("long").as("dl"), round(col("idf"), 6).as("idf"),
          round(col("weight"), 6).as("weight"))
    }),
    "q_scroll_all" -> ((s, dir) =>
      // ES scroll (sort=_doc bulk export): the FULL scored match set as
      // a distributed frame — no top-k, no global sort in the plan; the
      // doc_id ordering here exists only for the hash compare
      searcherOf(s, documentsIndex(s, dir)).scrollAll(Bm25Query)
        .select(col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"))),
    "q_termvectors" -> ((s, dir) =>
      // ES _termvectors: doc 42's on-the-fly term statistics — one row
      // per token occurrence (term, 0-based pos, tf, df-from-dict);
      // offsets stay in the API (no SQL derivation for char offsets)
      searcherOf(s, documentsIndex(s, dir)).termVectors(42L)
        .select(col("term"), col("pos").cast("long").as("pos"),
          col("tf").cast("long").as("tf"), col("df"))),
    "q_percolate" -> ((s, dir) =>
      // ES percolator (reverse search): which stored alert rules fire
      // on each document — the analyzed rule set broadcast, ONE
      // shuffle-free corpus pass with term->rule candidate pruning
      graft.query.Percolator.percolate(s, documentsDocsDF(s, dir), PercolateRules)
        .select(col("docId").as("doc_id"), col("query_id"))),
    "q_boosting" -> ((s, dir) =>
      // ES boosting query: hits = positive-query BM25 match set; hits
      // ALSO matching the negative query ('merge') keep their rank
      // eligibility with score × negative_boost = 0.5
      searcherOf(s, documentsIndex(s, dir))
        .boosting(Bm25Query, "merge", 10, negativeBoost = 0.5)
        .select(col("doc_id"), round(col("score"), 4).as("score"))),
    "q_span_first" -> ((s, dir) =>
      // Lucene/ES span_first: the phrase 'merge sort' occurring with
      // span end <= 8 — i.e. starting inside the field's first 8 token
      // positions; scored by the engine's phrase rule (BM25 sum of the
      // distinct terms)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchSpanFirst(PhraseQuery, 8, 10))),
    "q_min_score" -> ((s, dir) =>
      // ES min_score: the plain top-10 with sub-threshold hits removed
      // (filter(top-k) ≡ top-k(filter) — scores below rank k are ≤ the
      // rank-k score)
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchMinScore(Bm25Query, 10, 1.43))),
    "q_suggest_completion" -> ((s, dir) =>
      // ES completion-suggester analog: dictionary terms extending 's',
      // ranked by popularity (df desc, term asc), cap IN the plan
      searcherOf(s, documentsIndex(s, dir)).suggestCompletion("s", 5)),
    "q_phrase_suggest" -> ((s, dir) =>
      // ES phrase suggester: per-slot correction candidates (term-
      // suggester rank, incl. the token itself), candidate phrases
      // scored by adjacent-bigram doc-counts from POSITIONAL postings
      searcherOf(s, documentsIndex(s, dir))
        .phraseSuggest("marge sort", 5, maxDist = 2, maxPerSlot = 3)),
    "q_more_like_this" -> ((s, dir) => {
      // ES more_like_this: doc 7's terms ranked by the integer-exact
      // rare-first rule (tf desc, df asc, term asc), top 25 become an
      // OR query, the source doc excluded from the hits
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .moreLikeThis(7L, 10))
    }),
    "q_query_string" -> ((s, dir) => {
      // Lucene/ES query_string: the URI-search mini-language compiled
      // to the engine's bool query — scored OR words, a keyword filter,
      // an analyzed-text must_not, and a tiered numeric range clause
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchQueryString("spark query window lang:en -merge n_chars:[137 TO 2741]",
          10, graft.query.QueryString.Schema(keywordFields = Set("lang", "source"),
            numericFields = Set("n_chars"), textFields = Set("title"))))
    }),
    "q_bm25_should" -> ((s, dir) => {
      // ES bool should: optional scoring clause — matched should terms
      // add their BM25 contribution, membership still requires >=1 must
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool("spark query", 10, should = "window customer"))
    }),
    "q_bm25_minmatch" -> ((s, dir) => {
      // minimum_should_match over a pure should group: docs matching
      // >= 2 of the 4 terms, scored by their matched sum
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchBool("", 10, should = Bm25Query, minShouldMatch = 2))
    }),
    "q_bm25_proximity" -> ((s, dir) =>
      // sloppy phrase (full ES slop semantics): 'merge sort' within 2
      // positional moves — INCLUDING the transposed 'sort merge'
      // (width 2) — via positional postings + the Lucene width model,
      // conjunctive BM25 scoring
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .searchPhrase(PhraseQuery, 10, slop = 2))),
    "q_bm25_page2" -> ((s, dir) => {
      // ES from-pagination: hits 11..20 of the ranking
      rankHits(s, searcherOf(s, documentsIndex(s, dir))
        .search(Bm25Query, 10, from = 10), rankBase = 10L)
    }),
    "q_bm25_search_after" -> ((s, dir) => {
      // ES search_after: page 2 via the (score, docId) cursor of page
      // 1's last hit — identical rows to from=10 (twin shares the
      // OFFSET oracle)
      val se = searcherOf(s, documentsIndex(s, dir))
      val page1 = se.search(Bm25Query, 10)
      rankHits(s, se.searchAfter(Bm25Query, 10, page1.last), rankBase = 10L)
    }),
    "q_facet_histogram" -> ((s, dir) =>
      // ES histogram aggregation over the FULL match set (fixed-width
      // numeric buckets of n_chars among docs matching >=1 query term)
      searcherOf(s, documentsIndex(s, dir))
        .numericHistogram(Bm25Query, "n_chars", 200L)),
    "q_stats_field" -> ((s, dir) =>
      // ES stats aggregation over the match set
      searcherOf(s, documentsIndex(s, dir))
        .fieldStats(Bm25Query, "n_chars")
        .select(col("n_docs"), col("min").cast("long").as("min"),
          col("max").cast("long").as("max"), round(col("avg"), 6).as("avg"),
          col("sum").cast("long").as("sum"))),
    "q_nested_aggs" -> ((s, dir) =>
      // ES nested sub-aggregation tree, 3 levels (terms lang → terms
      // source → n_chars histogram) + stats, EVERY level from ONE
      // match-set join + ONE rollup pass; depth = defined key count
      searcherOf(s, documentsIndex(s, dir))
        .nestedAgg(Bm25Query, Seq(
          graft.query.TermsLevel("lang", "k1"),
          graft.query.TermsLevel("source", "k2"),
          graft.query.HistogramLevel("n_chars", 1000L, "k3")),
          statField = Some("n_chars"))),
    "q_composite_after" -> ((s, dir) =>
      // ES composite aggregation, page 2: flat (lang, source) key
      // tuples keys-asc, EXCLUSIVE after-cursor ('en', 'src2'), 5
      // buckets per page — the scalable bucket-export path
      searcherOf(s, documentsIndex(s, dir))
        .compositeAgg(Bm25Query, Seq(
          graft.query.TermsLevel("lang", "k1"),
          graft.query.TermsLevel("source", "k2")),
          size = 5, after = Some(Seq("en", "src2")))),
    "q_pipeline_agg" -> ((s, dir) => {
      // ES pipeline aggs (derivative + cumulative_sum + bucket_script)
      // over ONE composite bucket frame (lang → n_chars histogram):
      // window/arithmetic passes on the aggregated buckets, never a
      // second match-set pass
      val buckets = searcherOf(s, documentsIndex(s, dir))
        .compositeAgg(Bm25Query, Seq(
          graft.query.TermsLevel("lang", "lang"),
          graft.query.HistogramLevel("n_chars", 500L, "bucket")),
          size = 10000, statField = Some("n_chars"))
      val withDeriv = graft.query.Aggs.derivative(
        buckets, Seq("lang"), "bucket", "n_docs", "deriv")
      val withCum = graft.query.Aggs.cumulativeSum(
        withDeriv, Seq("lang"), "bucket", "n_docs", "cum")
      graft.query.Aggs.bucketScript(withCum, "avg_chars",
        round(col("sum") / col("n_docs"), 6))
        .select(col("lang"), col("bucket"), col("n_docs"), col("deriv"),
          col("cum"), col("avg_chars"))
        .orderBy(col("lang"), col("bucket"))
    }),
    "q_pipeline_moving" -> ((s, dir) => {
      // ES moving_avg + serial_diff over the same composite bucket
      // frame — trailing-window mean and lagged difference per parent
      val buckets = searcherOf(s, documentsIndex(s, dir))
        .compositeAgg(Bm25Query, Seq(
          graft.query.TermsLevel("lang", "lang"),
          graft.query.HistogramLevel("n_chars", 500L, "bucket")),
          size = 10000, statField = Some("n_chars"))
      val mv = graft.query.Aggs.movingAvg(
        buckets, Seq("lang"), "bucket", "n_docs", 3, "mov3")
      graft.query.Aggs.serialDiff(mv, Seq("lang"), "bucket", "n_docs", 2, "sdiff2")
        .select(col("lang"), col("bucket"), col("n_docs"),
          round(col("mov3"), 6).as("mov3"), col("sdiff2"))
        .orderBy(col("lang"), col("bucket"))
    }),
    "q_stats_bucket" -> ((s, dir) => {
      // ES stats_bucket (sibling pipeline agg): one row of stats over
      // the bucket frame's doc counts — subsumes max/min/sum/avg_bucket
      val buckets = searcherOf(s, documentsIndex(s, dir))
        .compositeAgg(Bm25Query, Seq(
          graft.query.TermsLevel("lang", "lang"),
          graft.query.HistogramLevel("n_chars", 500L, "bucket")),
          size = 10000, statField = Some("n_chars"))
      graft.query.Aggs.statsBucket(buckets, "n_docs")
        .select(col("n_buckets"), col("min").cast("long").as("min"),
          col("max").cast("long").as("max"), round(col("avg"), 6).as("avg"),
          col("sum").cast("long").as("sum"))
    }),
    "q_facet_stats" -> ((s, dir) =>
      // ES sub-aggregation: terms buckets over lang with nested stats of
      // n_chars per bucket — one groupBy on the match-set join
      searcherOf(s, documentsIndex(s, dir))
        .facetStats(Bm25Query, "lang", "n_chars")
        .select(col("value"), col("n_docs"), col("min").cast("long").as("min"),
          col("max").cast("long").as("max"), round(col("avg"), 6).as("avg"),
          col("sum").cast("long").as("sum"))),
    "q_facet_filtered" -> ((s, dir) =>
      // ES aggs run over the FULL bool query: facet restricted by a
      // filter clause (semi-join of the clause's posting docIds — no
      // doc-store predicate scan)
      searcherOf(s, documentsIndex(s, dir))
        .facetCounts(Bm25Query, "lang", filters = Seq("source" -> "src1"))),
    "q_count_range" -> ((s, dir) => {
      import s.implicits._
      // hits.total of a bool query with a numeric trie range clause
      Seq(searcherOf(s, documentsIndex(s, dir))
        .matchCount(Bm25Query, numericRangeFilters = Seq(("n_chars", 137L, 2741L))))
        .toDF("n_hits")
    }),
    "q_facet_lang" -> ((s, dir) =>
      // ES terms aggregation (facets) over the FULL match set: doc
      // counts per lang among docs containing >=1 query term — runs
      // index-side (block scan -> docId decode -> join -> hash agg)
      searcherOf(s, documentsIndex(s, dir)).facetCounts(Bm25Query, "lang")),
    "q_sort_by_field" -> ((s, dir) =>
      // ES `sort`: match set ordered by a stored field, not by score
      // (membership scan -> docId join -> TakeOrderedAndProject)
      searcherOf(s, documentsIndex(s, dir))
        .searchSortedBy(Bm25Query, "dl", 10)
        .select(col("docId").as("doc_id"), col("dl"))),
    "q_match_count" -> ((s, dir) => {
      import s.implicits._
      // ES hits.total / _count: one distributed count of the match set
      Seq(searcherOf(s, documentsIndex(s, dir)).matchCount(Bm25Query))
        .toDF("n_hits")
    }),
    "q_bm25_oracle" -> ((s, dir) => {
      import s.implicits._
      // exhaustive scorer, no index — the in-repo oracle as an operator
      val docs = documentsDocs(s, dir).toDF()
      val rows = Oracle.topK(docs, Bm25Query, 10)
        .select(col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .as[(Long, Double)].collect()
      rows.toSeq.zipWithIndex.map { case ((id, sc), i) => ((i + 1).toLong, id, sc) }
        .toDF("rank", "doc_id", "score")
    }),
    // ---- dedup family ----
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(table(s, s"$dir/documents.parquet"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),
    "q_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(table(s, s"$dir/documents.parquet"), "doc_id", "text", 3, 0.3)
        .select(col("ida"), col("idb"), col("jaccard"))
        .orderBy(col("ida"), col("idb"))
    }),
    "q_minhash_lsh" -> ((s, dir) => {
      // MinHash-blocked candidates + sketch prefilter + exact-Jaccard
      // verify at the recall-~1 oracle config (bands = numPerms ⇒
      // P(no candidate | J>=0.3) = 0.7^64 ~ 1e-10; the 4σ estimate cut
      // drops a true pair w.p. ≤ 3.2e-5): the output is the exact
      // all-pairs answer, so the DuckDB twin is the exact all-pairs
      // Jaccard. bands = 0 (derived r>1 banding) is the scale default.
      Dedup.minhashNearDup(table(s, s"$dir/documents.parquet"), "doc_id", "text",
        shingleK = 3, numPerms = 64, minJ = 0.3, bands = 64)
        .orderBy(col("ida"), col("idb"))
    }),
    "q_minhash_est" -> ((s, dir) => {
      // the estimated-Jaccard sketch variant (engine-defined hashes —
      // rows-only; recall/precision pinned by OpsSpec)
      Dedup.minhashPairs(table(s, s"$dir/documents.parquet"), "doc_id", "text",
        shingleK = 3, numPerms = 64, bands = 16, minEstJ = 0.3)
        .orderBy(col("ida"), col("idb"))
    }),
    "q_simhash_pairs" -> ((s, dir) => {
      // pigeonhole banding makes recall exactly 1, and the MD5-based
      // token hash makes the whole SimHash computable in DuckDB — the
      // twin is the exact all-pairs Hamming join
      Dedup.simhashPairs(table(s, s"$dir/documents.parquet"), "doc_id", "text", maxHamming = 3)
        .select(col("ida"), col("idb"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("ida"), col("idb"))
    }),
    "q_fingerprint" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"), TextOps.fingerprintCol(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),
    // ---- similarity search ----
    "q_ann_cosine" -> ((s, dir) => {
      import s.implicits._
      val emb = table(s, s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === lit(0))
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val ids = Similarity.bruteTopK(emb, "vec_id", "embedding", q, 10, excludeId = 0L)
        .select(col("vec_id")).as[Long].collect()
      ids.toSeq.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
        .toDF("vec_id", "rank")
    }),
    "q_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      // bucketed layout + probe enumeration with probeHamming = nbits
      // (probe every bucket): recall is exactly 1 by construction, so the
      // DuckDB twin is the brute-force ranking. The driver's embeddings
      // are isotropic (true neighbors near-orthogonal), so any smaller
      // radius would be corpus-dependent; OpsSpec pins the small-radius
      // recall behavior on planted near-dup vectors instead.
      val emb = table(s, s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === lit(0))
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val ids = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10,
          nbits = 4, probeHamming = 4, excludeId = 0L)
        .select(col("vec_id")).as[Long].collect()
      ids.toSeq.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
        .toDF("vec_id", "rank")
    }),
    // ---- text analysis ----
    "q_langid" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"), TextOps.langIdCol(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),
    "q_quality" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"),
          round(TextOps.stopRatioCol(col("text")), 4).as("stop_ratio"),
          round(TextOps.punctRatioCol(col("text")), 4).as("punct_ratio"),
          round(TextOps.qualityCol(col("text")), 4).as("quality"))
        .orderBy(col("doc_id"))
    }),
    "q_token_counts" -> ((s, dir) => {
      table(s, s"$dir/documents.parquet")
        .select(col("doc_id"),
          TextOps.wsTokensCol(col("text")).cast("long").as("ws_tokens"),
          TextOps.bpeTokensCol(col("text")).cast("long").as("bpe_tokens"))
        .orderBy(col("doc_id"))
    }),
    // ---- multimodal plumbing ----
    "q_multimodal_meta" -> ((s, dir) => {
      Multimodal.extractMeta(
        Multimodal.attachBinary(table(s, s"$dir/documents.parquet"), "doc_id", "text"))
        .toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes").cast("long").as("n_bytes"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    }),
    "q_embedding_dedup" -> ((s, dir) => {
      // banded hyperplane LSH candidates + exact-cosine verify. The
      // driver's embeddings are isotropic (no true near-dups), so the
      // demo threshold is low and the banding generous — P(miss at
      // cos>=0.3) = (1-0.597^2)^48 ~ 7e-10 — making the output equal the
      // exact all-pairs answer (the DuckDB twin). The defaults
      // (0.95, 8 bits x 16 bands) are the production near-dup config.
      Dedup.embeddingPairs(table(s, s"$dir/embeddings.parquet"),
        "vec_id", "embedding", minCosine = 0.3, bitsPerBand = 2, bands = 48)
        .orderBy(col("ida"), col("idb"))
    }),
    "q_catalog_ingest" -> ((s, _) => {
      // reference catalog-mode ETL end-to-end on an inline NeoFinder TSV
      // (S2/S3/P1-P6/F3/F4/F6/F7/A1/A3) — rows-only (no table in DuckDB)
      val fixture = Seq(
        Seq("Name", "Pfad", "Größe", "Erstelldatum", "Änderungsdatum", "Art", "Katalog", "Name des Volumes"),
        Seq("a.jpg", "/arch/a.jpg", "1.23 MB (1,289,748 Bytes)", "05.03.2021 10:11:12", "06.03.2021 11:12:13", "Bild", "K1", "Vol1"),
        Seq("b.tif", "/arch/b.tif", "4 KB (4.096 Bytes)", "2021-03-05", "garbage", "Bild", "K1", "Vol1"),
        Seq("c.pdf", "/arch/c.pdf", "(100 Bytes)", "03/05/2021 10:11:12", "03/06/2021 10:11:12", "Dokument", "K1", "Vol1"),
        Seq("a2.jpg", "/arch/a.jpg", "(1 Bytes)", "05.03.2021", "05.03.2021", "Bild", "K1", "Vol1")
      ).map(_.mkString("\t")).mkString("\r")
      val p = java.nio.file.Files.createTempFile("graft-catalog", ".txt")
      java.nio.file.Files.write(p, fixture.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // autocorrect (-A) mode: cross-repairs b.tif's garbage date and
      // keeps all 3 distinct paths (last duplicate occurrence wins)
      graft.compat.CatalogIngest.readCatalog(s, p.toString, autocorrect = true).records
        .orderBy(col("path"))
    }),
    // ---- cross-segment upsert / delete (LWW identity semantics) ----
    "q_upsert_lww" -> ((s, _) => {
      // re-ingesting (conv-00000003, 1) with marker-free text supersedes
      // the older segment's doc: the marker query keeps ONLY conv-17
      msOf(s, upsertIndex(s))
        .searchResolved("zanzibar quasar lattice", 10)
        .select(col("rank").cast("long").as("rank"), col("conv_id"),
          col("turn_idx").cast("long").as("turn_idx"))
    }),
    "q_delete_tombstone" -> ((s, _) => {
      // (conv-00000099, 1) — holder of the full 'cinnabar monolith
      // archipelago' marker — was deleted; only the partial marker at
      // (conv-00000042, 2) remains
      msOf(s, upsertIndex(s))
        .searchResolved("cinnabar monolith archipelago", 10)
        .select(col("rank").cast("long").as("rank"), col("conv_id"),
          col("turn_idx").cast("long").as("turn_idx"))
    }),
    // ---- transcript engine end-to-end (rows-only; primary payload) ----
    "q_transcript_bm25" -> ((s, _) => {
      import s.implicits._
      val dir = idxCache.computeIfAbsent("__transcripts__", _ => {
        val out = java.nio.file.Files.createTempDirectory("graft-transcript-index").toString
        val docs = graft.index.DocIds.dedupAndAssign(
          graft.corpus.Transcripts.generate(s, 300L), 8)
        new IndexBuilder(s, out, "verify-transcripts", IndexConfig(partitions = 8)).build(docs)
        out
      })
      searcherOf(s, dir).searchResolved("zanzibar quasar lattice", 10)
        .select(col("rank").cast("long").as("rank"), col("docId"),
          col("conv_id"), col("turn_idx").cast("long").as("turn_idx"))
    })
  )

  // --------------------------------------------------------------------------
  def oracleSql: Map[String, String] = {
    val langCase = {
      def cnt(set: Seq[String]) =
        s"count(*) FILTER (term IN ${inList(set)})"
      s"""${toksCte("documents", "doc_id")},
s AS (SELECT d.doc_id,
        ${cnt(TextOps.enStop)} AS en, ${cnt(TextOps.deStop)} AS de,
        ${cnt(TextOps.esStop)} AS es, ${cnt(TextOps.frStop)} AS fr
      FROM documents d LEFT JOIN tok ON tok.doc_id = d.doc_id GROUP BY d.doc_id)
SELECT doc_id,
  CASE WHEN greatest(en, de, es, fr) = 0 THEN 'und'
       WHEN en = greatest(en, de, es, fr) THEN 'en'
       WHEN de = greatest(en, de, es, fr) THEN 'de'
       WHEN es = greatest(en, de, es, fr) THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM s ORDER BY doc_id"""
    }
    Map(
      "q_filter_keyword" ->
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source",
      "q_filter_range" ->
        ("SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value FROM events " +
          "WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20' AND value > 0 " +
          "GROUP BY event_type ORDER BY event_type"),
      "q_agg_lineitem" ->
        ("SELECT l_returnflag, l_linestatus, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(sum((CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
          "CAST(count(*) AS BIGINT) AS n " +
          "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
      "q_join_broadcast" ->
        ("SELECT o_orderpriority, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(count(*) AS BIGINT) AS n " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1 ORDER BY 1"),
      "q_topk_orders" ->
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10",
      "q_window_rank" ->
        ("SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, n_chars FROM (" +
          "SELECT source, doc_id, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rank " +
          "FROM documents) WHERE rank <= 3 ORDER BY source, rank"),
      "q_union_dedup" ->
        ("SELECT DISTINCT doc_id FROM (SELECT doc_id FROM documents WHERE lang = 'en' " +
          "UNION ALL SELECT doc_id FROM documents WHERE source = 'src1') ORDER BY doc_id"),
      "q_validation_counters" ->
        ("SELECT CAST(count(*) AS BIGINT) AS n_total, " +
          "CAST(sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text, " +
          "CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_nchars " +
          "FROM documents"),
      "q_date_multiformat" ->
        ("SELECT event_id, strftime(coalesce(" +
          "try_strptime(raw, '%d.%m.%Y %H:%M:%S'), try_strptime(raw, '%Y-%m-%d %H:%M:%S'), " +
          "try_strptime(raw, '%m/%d/%Y %H:%M:%S')), '%d.%m.%Y %H:%M:%S') AS normalized FROM (" +
          "SELECT event_id, CASE CAST(event_id % 3 AS INT) " +
          "WHEN 0 THEN strftime(ts, '%d.%m.%Y %H:%M:%S') " +
          "WHEN 1 THEN strftime(ts, '%Y-%m-%d %H:%M:%S') " +
          "ELSE strftime(ts, '%m/%d/%Y %H:%M:%S') END AS raw " +
          "FROM events WHERE event_id < 1000) ORDER BY event_id"),
      "q_size_parse" ->
        ("SELECT doc_id, CAST(replace(replace(regexp_extract(" +
          "'doc (' || CAST(n_chars * 1000 AS VARCHAR) || ' Bytes)', '\\(([0-9.,]+) B', 1), '.', ''), ',', '') AS BIGINT) AS size_bytes " +
          "FROM documents ORDER BY doc_id"),
      "q_tokenize_count" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t
ON d.doc_id = t.doc_id ORDER BY d.doc_id""",
      "q_tf" ->
        s"""${toksCte("documents", "doc_id")}
SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2 ORDER BY term, doc_id""",
      "q_df" ->
        s"""${toksCte("documents", "doc_id")},
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1 ORDER BY term""",
      "q_corpus_stats" ->
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id)
SELECT CAST(count(*) AS BIGINT) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl""",
      "q_bm25_topk" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10, conjunctive = false),
      "q_bm25_and" -> bm25Sql(Analyzer.analyzeQuery(AndQuery).toSeq, 10, conjunctive = true),
      "q_bm25_phrase" -> bm25Sql(Analyzer.analyzeQuery(PhraseQuery).toSeq, 10,
        conjunctive = true, phrase = Analyzer.tokenize(PhraseQuery).toSeq),
      "q_bm25_prefix" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "tf.term LIKE 's%'"),
      "q_bm25_wildcard" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "tf.term LIKE 's%a%'"),
      "q_bm25_fuzzy" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "levenshtein(tf.term, 'sprak') <= 2"),
      "q_bm25_fuzzy_prefix" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "(tf.term LIKE 'sp%' AND levenshtein(tf.term, 'sprak') <= 2)"),
      "q_constant_score" ->
        s"""${toksCte("documents", "doc_id")}
SELECT doc_id, CAST(2.5 AS DOUBLE) AS score
FROM documents
WHERE lang = 'en'
  AND doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
ORDER BY doc_id ASC LIMIT 10""",
      // rescore twin: the UNROUNDED bm25 picks the top-50 window
      // (score desc, doc_id asc — the engine's rank order), then one
      // multiply re-ranks inside the window only
      "q_rescore" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS bm25
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY tf.doc_id),
win AS (SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 50)
SELECT w.doc_id, round(w.bm25 * (CAST(0.001 AS DOUBLE) * d.n_chars), 4) AS score
FROM win w JOIN documents d USING (doc_id)
ORDER BY w.bm25 * (CAST(0.001 AS DOUBLE) * d.n_chars) DESC, w.doc_id ASC LIMIT 10"""
      },
      // decay twin: the derived ts is pure doc_id arithmetic (epoch +
      // (doc_id·37 mod 365) days), so d and the gauss closed form
      // e^(d²·ln(decay)/scale²) reproduce in SQL without touching a
      // date column; window + re-rank shape identical to q_rescore
      "q_decay_recency" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        // CASTs everywhere: a bare 90.0 literal is DECIMAL in DuckDB and
        // scale² overflows DECIMAL(18) — the arithmetic must be DOUBLE
        val origin = s"(CAST($DecayEpochMs AS DOUBLE) + CAST(364 AS DOUBLE) * $DayMs)"
        val scale = s"(CAST(90 AS DOUBLE) * $DayMs)"
        val tsMs = s"(CAST($DecayEpochMs AS DOUBLE) + CAST((d.doc_id * 37) % 365 AS DOUBLE) * $DayMs)"
        val mult = s"exp((greatest(abs($tsMs - $origin) - 0.0, 0.0) * greatest(abs($tsMs - $origin) - 0.0, 0.0)) * (ln(0.5) / ($scale * $scale)))"
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS bm25
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY tf.doc_id),
win AS (SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 50)
SELECT w.doc_id, round(w.bm25 * $mult, 4) AS score
FROM win w JOIN documents d USING (doc_id)
ORDER BY w.bm25 * $mult DESC, w.doc_id ASC LIMIT 10"""
      },
      // collapse twin: per-doc FULL bm25 (no window — collapsing needs
      // every match), best row per lang via QUALIFY row_number = 1,
      // groups ranked by their best (score desc, doc_id asc), top 5
      "q_collapse" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY tf.doc_id),
best AS (
  SELECT d.lang AS key, s.doc_id, s.score
  FROM scored s JOIN documents d USING (doc_id)
  QUALIFY row_number() OVER (PARTITION BY d.lang ORDER BY s.score DESC, s.doc_id ASC) = 1)
SELECT key, doc_id, round(score, 4) AS score
FROM best ORDER BY score DESC, doc_id ASC LIMIT 5"""
      },
      // collapse + inner_hits twin: per-group rank prefix (QUALIFY
      // hit_rank <= M), groups picked and ordered by their rank-1 row
      "q_collapse_inner" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY tf.doc_id),
ranked AS (
  SELECT d.lang AS key, s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.lang ORDER BY s.score DESC, s.doc_id ASC) AS hit_rank
  FROM scored s JOIN documents d USING (doc_id)
  QUALIFY hit_rank <= 2),
gb AS (SELECT key FROM ranked WHERE hit_rank = 1
       ORDER BY score DESC, doc_id ASC LIMIT 3)
SELECT r.key, CAST(r.hit_rank AS INT) AS hit_rank, r.doc_id, round(r.score, 4) AS score
FROM ranked r JOIN gb USING (key)
ORDER BY r.key, r.hit_rank"""
      },
      "q_bm25_regexp" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "regexp_full_match(tf.term, 'sp.rk|wind.w')"),
      // the engine's PER-TOKEN term-asc cap (maxExpansionsPerTerm = 50)
      // is encoded verbatim: each token's candidate set is its ≤ 50
      // lowest matching dictionary terms (round-7 ADVICE — an uncapped
      // twin diverges the moment a token has > 50 candidates)
      "q_bm25_match_fuzzy" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "tf.term IN (" +
          "SELECT term FROM (SELECT term FROM df WHERE levenshtein(term, 'sprak') <= 2 ORDER BY term ASC LIMIT 50) " +
          "UNION SELECT term FROM (SELECT term FROM df WHERE levenshtein(term, 'windoq') <= 2 ORDER BY term ASC LIMIT 50))"),
      // dis_max twin: per-group ordered-term sums pick the best group
      // (sum desc, group asc — the engine's first-max rule), then every
      // term contribution re-sums weighted (1 best / 0.3 others) in
      // GLOBAL ascending term order — the exact FP association of the
      // engine's best-fields fold
      "q_dis_max" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         CASE WHEN tf.term IN ('spark','window') THEN 0 ELSE 1 END AS g,
         $score AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ('spark','window','query','merge')),
gs AS (SELECT doc_id, g, sum(s ORDER BY term ASC) AS sg FROM contrib GROUP BY 1, 2),
best AS (SELECT doc_id, g AS bg FROM (
           SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY sg DESC, g ASC) AS rn
           FROM gs) WHERE rn = 1),
scored AS (
  SELECT c.doc_id,
         sum((CASE WHEN c.g = b.bg THEN 1.0 ELSE 0.3 END) * c.s ORDER BY c.term ASC) AS score
  FROM contrib c JOIN best b USING (doc_id)
  GROUP BY c.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10"""
      },
      // shared-terms dis_max twin: an explicit (term, group) VALUES map
      // replaces the CASE attribution — 'window' joins to BOTH groups,
      // so it contributes to each group's ordered sum; the final fold
      // re-sums every (term, group) contribution weighted, in (term,
      // group) ascending order — the engine's instance fold verbatim
      "q_dis_max_shared" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
gm AS (SELECT * FROM (VALUES ('spark', 0), ('window', 0), ('window', 1), ('merge', 1)) AS v(term, g)),
contrib AS (
  SELECT tf.doc_id, tf.term, gm.g, $score AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  JOIN gm ON gm.term = tf.term),
gs AS (SELECT doc_id, g, sum(s ORDER BY term ASC) AS sg FROM contrib GROUP BY 1, 2),
best AS (SELECT doc_id, g AS bg FROM (
           SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY sg DESC, g ASC) AS rn
           FROM gs) WHERE rn = 1),
scored AS (
  SELECT c.doc_id,
         sum((CASE WHEN c.g = b.bg THEN 1.0 ELSE 0.3 END) * c.s ORDER BY c.term ASC, c.g ASC) AS score
  FROM contrib c JOIN best b USING (doc_id)
  GROUP BY c.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10"""
      },
      "q_bm25_filtered" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, docPred = "lang = 'fr'"),
      // IS DISTINCT FROM, not <>: the engine's must_not semantics (ES
      // parity) never vetoes a doc whose field is NULL (no #field
      // posting is emitted for nulls), and SQL NOT(x = v) would drop
      // NULL rows under three-valued logic
      "q_bm25_mustnot" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false,
        docPred = "lang IS DISTINCT FROM 'en' AND source IS DISTINCT FROM 'src1'"),
      "q_bm25_terms" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, docPred = "lang IN ('fr','es')"),
      "q_sort_by_field" ->
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, CAST(coalesce(t.n, 0) AS INTEGER) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id)
SELECT doc_id, dl FROM dl
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
ORDER BY dl DESC, doc_id ASC LIMIT 10""",
      "q_match_count" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_hits FROM tok
WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}""",
      "q_facet_lang" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.lang AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
GROUP BY 1 ORDER BY 1""",
      "q_bm25_range" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, docPred = "lang >= 'd' AND lang <= 'f'"),
      // tiered trie decomposition is an exact disjoint cover of the
      // range, so the twin is the plain numeric BETWEEN predicate
      "q_bm25_range_numeric" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, docPred = "n_chars BETWEEN 137 AND 2741"),
      "q_bm25_field" -> fieldBm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10),
      "q_bm25_multimatch" ->
        multiMatchSql(Analyzer.analyzeQuery("spark query").toSeq, 1.0, 2.0, 10),
      "q_bm25_multimatch_best" ->
        multiMatchBestSql(Analyzer.analyzeQuery("spark query").toSeq, 1.0, 2.0, 0.3, 10),
      "q_bm25_field_phrase" -> {
        val Seq(a, b) = Analyzer.tokenize("column vector").toSeq
        fieldBm25Sql(Analyzer.analyzeQuery("column vector").toSeq, 10,
          conjunctive = true, docIdIn = titlePhraseSubquery(a, b))
      },
      "q_bm25_field_prefix" -> fieldBm25Sql(Nil, 10, termPred = "ftf.term LIKE 's%'"),
      // phrase-prefix twin: membership = 'merge' adjacent to any capped
      // 's*' expansion; score = the FIXED term's BM25 (the engine's rule)
      "q_bm25_phrase_prefix" -> bm25Sql(Seq("merge"), 10, conjunctive = true,
        docIdIn = phrasePrefixSubquery("merge", "s", 50)),
      "q_facet_terms_range" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.source AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
  AND d.lang IN ('fr','es','de')
  AND d.source >= 'src1' AND d.source <= 'src2'
GROUP BY 1 ORDER BY 1""",
      // exists/missing twins: title nonempty ⇔ doc_id%7 > 0 AND the
      // text has ≥1 token (the derived field's membership rule)
      "q_bm25_exists" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false,
        docPred = s"(doc_id % 7) > 0 AND len(list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '')) >= 1"),
      "q_bm25_missing" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false,
        docPred = s"NOT ((doc_id % 7) > 0 AND len(list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '')) >= 1)"),
      "q_cardinality" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_distinct FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})""",
      "q_percentiles" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT n_chars FROM documents
      WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                       WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})),
sel AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.9]) AS vals FROM m)
SELECT CAST(t.p AS DOUBLE) AS p, round(CAST(t.v AS DOUBLE), 4) AS value
FROM (SELECT unnest([0.25, 0.5, 0.9]) AS p, unnest(vals) AS v FROM sel) t ORDER BY p""",
      "q_facet_top" ->
        s"""${toksCte("documents", "doc_id")}
SELECT source AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
GROUP BY 1 ORDER BY n_docs DESC, value ASC LIMIT 3""",
      "q_ranges_agg" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT n_chars FROM documents
      WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                       WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}))
SELECT '*-500' AS key, CAST(count(*) FILTER (n_chars < 500) AS BIGINT) AS n_docs FROM m
UNION ALL
SELECT '500-2000', CAST(count(*) FILTER (n_chars >= 500 AND n_chars < 2000) AS BIGINT) FROM m
UNION ALL
SELECT '2000-*', CAST(count(*) FILTER (n_chars >= 2000) AS BIGINT) FROM m""",
      "q_filters_agg" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT lang, source FROM documents
      WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                       WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}))
SELECT 'english' AS key, CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_docs FROM m
UNION ALL
SELECT 'src1', CAST(count(*) FILTER (source = 'src1') AS BIGINT) FROM m
UNION ALL
SELECT 'german', CAST(count(*) FILTER (lang = 'de') AS BIGINT) FROM m""",
      "q_top_hits" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT d.lang AS value, d.doc_id, d.n_chars FROM documents d
      WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                         WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})),
r AS (SELECT value, doc_id, n_chars,
             row_number() OVER (PARTITION BY value ORDER BY n_chars DESC, doc_id ASC) AS rank
      FROM m)
SELECT value, CAST(rank AS BIGINT) AS rank, doc_id, CAST(n_chars AS BIGINT) AS sort_value
FROM r WHERE rank <= 3 ORDER BY value, rank""",
      // significant_terms twin: same JLH arithmetic shape (one division
      // per ratio, then subtract/divide/multiply) over fg counts from
      // the match set and bg df = docs-containing-term
      "q_significant_terms" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT DISTINCT doc_id FROM tok
      WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}),
fgn AS (SELECT count(*) AS n FROM m),
nn AS (SELECT count(*) AS n FROM documents),
fg AS (SELECT term, count(DISTINCT doc_id) AS fg_count FROM tok
       WHERE doc_id IN (SELECT doc_id FROM m)
       GROUP BY 1 HAVING count(DISTINCT doc_id) >= 5),
bg AS (SELECT term, count(DISTINCT doc_id) AS bg_count FROM tok GROUP BY 1),
s AS (SELECT term, fg_count, bg_count,
             (CAST(fg_count AS DOUBLE) / fgn.n - CAST(bg_count AS DOUBLE) / nn.n)
             * ((CAST(fg_count AS DOUBLE) / fgn.n) / (CAST(bg_count AS DOUBLE) / nn.n)) AS score
      FROM fg JOIN bg USING (term) CROSS JOIN fgn CROSS JOIN nn)
SELECT term, CAST(fg_count AS BIGINT) AS fg_count, CAST(bg_count AS BIGINT) AS bg_count,
       round(score, 4) AS score
FROM s WHERE score > 0 ORDER BY score DESC, term ASC LIMIT 10""",
      "q_suggest" ->
        s"""${toksCte("documents", "doc_id")},
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
cand AS (SELECT term, df FROM df
         WHERE term <> 'sprak' AND levenshtein(term, 'sprak') <= 2
         ORDER BY term ASC LIMIT 1000)
SELECT term AS suggestion, CAST(levenshtein(term, 'sprak') AS INT) AS dist,
       CAST(df AS BIGINT) AS df
FROM cand ORDER BY dist ASC, df DESC, suggestion ASC LIMIT 5""",
      // multi-index twin: each index's half scores with its OWN
      // (n, avgdl, df) — ES query_then_fetch across indexes — then one
      // global (score desc, index asc, doc_id asc) merge
      "q_multi_index" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
h AS (SELECT doc_id, CASE WHEN source = 'src1' THEN 'idx-src1' ELSE 'idx-rest' END AS idx
      FROM documents),
tokh AS (SELECT t.doc_id, t.term, h.idx FROM tok t JOIN h USING (doc_id)),
dl AS (SELECT d.doc_id, h.idx, coalesce(t.n, 0) AS dl
       FROM documents d JOIN h USING (doc_id)
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t USING (doc_id)),
st AS (SELECT idx, count(*) AS n, avg(dl) AS avgdl FROM dl GROUP BY 1),
tf AS (SELECT idx, term, doc_id, count(*) AS tf FROM tokh GROUP BY 1, 2, 3),
df AS (SELECT idx, term, count(*) AS df FROM tf GROUP BY 1, 2),
scored AS (
  SELECT tf.doc_id, tf.idx, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (idx, term) JOIN dl USING (idx, doc_id) JOIN st USING (idx)
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY 1, 2)
SELECT idx AS "index", doc_id, round(score, 4) AS score
FROM scored ORDER BY scored.score DESC, idx ASC, doc_id ASC LIMIT 10"""
      },
      // indices_boost twin: same per-half own-stats scoring, boosted
      // half multiplied by the constant BEFORE the global merge
      "q_multi_index_boost" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
h AS (SELECT doc_id, CASE WHEN source = 'src1' THEN 'idx-src1' ELSE 'idx-rest' END AS idx
      FROM documents),
tokh AS (SELECT t.doc_id, t.term, h.idx FROM tok t JOIN h USING (doc_id)),
dl AS (SELECT d.doc_id, h.idx, coalesce(t.n, 0) AS dl
       FROM documents d JOIN h USING (doc_id)
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t USING (doc_id)),
st AS (SELECT idx, count(*) AS n, avg(dl) AS avgdl FROM dl GROUP BY 1),
tf AS (SELECT idx, term, doc_id, count(*) AS tf FROM tokh GROUP BY 1, 2, 3),
df AS (SELECT idx, term, count(*) AS df FROM tf GROUP BY 1, 2),
scored AS (
  SELECT tf.doc_id, tf.idx,
         (CASE WHEN tf.idx = 'idx-src1' THEN CAST(3.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END)
           * sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (idx, term) JOIN dl USING (idx, doc_id) JOIN st USING (idx)
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY 1, 2)
SELECT idx AS "index", doc_id, round(score, 4) AS score
FROM scored ORDER BY scored.score DESC, idx ASC, doc_id ASC LIMIT 10"""
      },
      // phrase-suggester twin: positions via zipped unnest, per-slot
      // candidate rank (dist asc, df desc, term asc) via QUALIFY, and
      // the integer bigram-doc-count scoring — bit-reproducible
      "q_phrase_suggest" ->
        s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
pos AS (SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS p FROM arrs),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos GROUP BY 1),
c1 AS (SELECT term FROM df WHERE levenshtein(term,'marge') <= 2
       QUALIFY row_number() OVER (ORDER BY levenshtein(term,'marge') ASC, df DESC, term ASC) <= 3),
c2 AS (SELECT term FROM df WHERE levenshtein(term,'sort') <= 2
       QUALIFY row_number() OVER (ORDER BY levenshtein(term,'sort') ASC, df DESC, term ASC) <= 3),
big AS (SELECT p1.term AS a, p2.term AS b, count(DISTINCT p1.doc_id) AS n
        FROM pos p1 JOIN pos p2 ON p1.doc_id = p2.doc_id AND p2.p = p1.p + 1
        WHERE p1.term IN (SELECT term FROM c1) AND p2.term IN (SELECT term FROM c2)
        GROUP BY 1, 2),
ph AS (SELECT c1.term || ' ' || c2.term AS suggestion, coalesce(big.n, 0) AS score
       FROM c1 CROSS JOIN c2 LEFT JOIN big ON big.a = c1.term AND big.b = c2.term)
SELECT suggestion, CAST(score AS BIGINT) AS score
FROM ph ORDER BY score DESC, suggestion ASC LIMIT 5""",
      // more_like_this twin: the engine's integer-exact term selection
      // (tf desc, df asc, term asc, top 25 of doc 7) inside the term
      // predicate; membership excludes the source doc, scores stay
      // full-corpus BM25
      "q_more_like_this" -> bm25Sql(Nil, 10, conjunctive = false,
        termPred = "tf.term IN (SELECT s.term FROM " +
          "(SELECT t2.term, count(*) AS f FROM tok t2 WHERE t2.doc_id = 7 GROUP BY 1) s " +
          "JOIN df USING (term) ORDER BY s.f DESC, df.df ASC, s.term ASC LIMIT 25)",
        docPred = "doc_id <> 7"),
      // query_string twin: the compiled bool query's membership rules —
      // keyword filter + numeric range + analyzed-term exclusion, scores
      // stay the full-corpus BM25 of the scored OR words
      "q_query_string" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq
          .filterNot(_ == "merge"), 10, conjunctive = false,
        docPred = "lang = 'en' AND n_chars BETWEEN 137 AND 2741 " +
          "AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'merge')"),
      // should semantics: score over must ∪ should matched terms, doc
      // qualifies via >=1 must; minShouldMatch counts distinct should
      // terms (tf has one row per (term, doc), so FILTER counts terms)
      "q_bm25_should" -> {
        val must = Analyzer.analyzeQuery("spark query").toSeq
        val should = Analyzer.analyzeQuery("window customer").toSeq
        bm25Sql((must ++ should).distinct.sorted, 10, conjunctive = false,
          havingExpr = s"count(*) FILTER (tf.term IN ${inList(must)}) >= 1")
      },
      "q_bm25_minmatch" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, havingExpr = "count(*) >= 2"),
      // ordered bigram proximity: positional twin via the 2-arg
      // list_transform position table, gap ≤ slop+1
      "q_bm25_proximity" -> {
        val Seq(a, b) = Analyzer.tokenize(PhraseQuery).toSeq
        bm25Sql(Analyzer.analyzeQuery(PhraseQuery).toSeq, 10, conjunctive = true,
          docIdIn = proximitySubquery(a, b, 2))
      },
      // pagination twins: rank over the full ordering, page cut by OFFSET
      "q_bm25_page2" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, offset = 10),
      "q_bm25_search_after" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, offset = 10),
      "q_facet_histogram" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(floor(n_chars / 200) * 200 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
GROUP BY 1 ORDER BY 1""",
      "q_stats_field" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(min(n_chars) AS BIGINT) AS "min",
       CAST(max(n_chars) AS BIGINT) AS "max", round(avg(n_chars), 6) AS "avg",
       CAST(sum(n_chars) AS BIGINT) AS "sum"
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})""",
      // nested-agg twin: DuckDB GROUP BY ROLLUP over the same projected
      // keys; depth = 3 − ΣGROUPING(k) bit-matches Spark's grouping()
      "q_nested_aggs" ->
        s"""${toksCte("documents", "doc_id")},
b AS (SELECT lang AS k1, source AS k2,
             CAST(floor(n_chars/1000)*1000 AS BIGINT) AS k3, n_chars
      FROM documents
      WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                       WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}))
SELECT k1, k2, k3,
       CAST(3 - (GROUPING(k1) + GROUPING(k2) + GROUPING(k3)) AS INT) AS depth,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS "min", CAST(max(n_chars) AS BIGINT) AS "max",
       round(avg(n_chars), 6) AS "avg", CAST(sum(n_chars) AS BIGINT) AS "sum"
FROM b GROUP BY ROLLUP (k1, k2, k3)
HAVING count(*) > 0
ORDER BY depth, k1, k2, k3""",
      // composite twin: flat tuples, EXCLUSIVE lexicographic cursor on
      // the group keys (predicate on raw rows ≡ on buckets — it touches
      // keys only), keys-asc LIMIT = the page
      "q_composite_after" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.lang AS k1, d.source AS k2, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
  AND d.lang IS NOT NULL AND d.source IS NOT NULL
  AND (d.lang > 'en' OR (d.lang = 'en' AND d.source > 'src2'))
GROUP BY 1, 2 ORDER BY k1, k2 LIMIT 5""",
      // pipeline twin: the SAME aggregated bucket frame, then window
      // math (lag / running sum / per-bucket arithmetic) over buckets
      "q_pipeline_agg" ->
        s"""${toksCte("documents", "doc_id")},
b AS (SELECT d.lang AS lang, CAST(floor(n_chars / 500) * 500 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs, sum(n_chars) AS s
      FROM documents d
      WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                         WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
        AND d.lang IS NOT NULL AND d.n_chars IS NOT NULL
      GROUP BY 1, 2)
SELECT lang, bucket, n_docs,
       n_docs - lag(n_docs) OVER (PARTITION BY lang ORDER BY bucket) AS deriv,
       CAST(sum(n_docs) OVER (PARTITION BY lang ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       round(CAST(s AS DOUBLE) / n_docs, 6) AS avg_chars
FROM b ORDER BY lang, bucket""",
      // moving_avg/serial_diff twin: the same bucket CTE, DuckDB window
      // math (trailing 3-row mean, lag-2 difference)
      "q_pipeline_moving" ->
        s"""${toksCte("documents", "doc_id")},
b AS (SELECT d.lang AS lang, CAST(floor(n_chars / 500) * 500 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents d
      WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                         WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
        AND d.lang IS NOT NULL AND d.n_chars IS NOT NULL
      GROUP BY 1, 2)
SELECT lang, bucket, n_docs,
       round(avg(n_docs) OVER (PARTITION BY lang ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov3,
       n_docs - lag(n_docs, 2) OVER (PARTITION BY lang ORDER BY bucket) AS sdiff2
FROM b ORDER BY lang, bucket""",
      // stats_bucket twin: plain stats over the bucket CTE's counts
      "q_stats_bucket" ->
        s"""${toksCte("documents", "doc_id")},
b AS (SELECT d.lang AS lang, CAST(floor(n_chars / 500) * 500 AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents d
      WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                         WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
        AND d.lang IS NOT NULL AND d.n_chars IS NOT NULL
      GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_buckets, CAST(min(n_docs) AS BIGINT) AS "min",
       CAST(max(n_docs) AS BIGINT) AS "max", round(avg(n_docs), 6) AS "avg",
       CAST(sum(n_docs) AS BIGINT) AS "sum"
FROM b""",
      // multi-index facet twin: the two named indexes PARTITION the
      // documents table (null-safe source split), and terms-agg counts
      // are score-free, so the SUM-merged buckets ≡ the whole-table
      // facet — the ES coordinating-node merge made checkable in SQL
      "q_multi_index_facet" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.lang AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
GROUP BY 1 ORDER BY 1""",
      // multi-index stats twin: the per-index partials merge exactly
      // (sum/count add, min/max combine, avg = merged sum ÷ count) and
      // the two indexes partition documents, so the merge ≡ the
      // whole-table stats over the same membership
      "q_multi_index_stats" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(min(n_chars) AS BIGINT) AS "min",
       CAST(max(n_chars) AS BIGINT) AS "max", round(avg(n_chars), 6) AS "avg",
       CAST(sum(n_chars) AS BIGINT) AS "sum"
FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})""",
      // multi-index percentiles/cardinality twins: the halves partition
      // documents, so the unioned match set ≡ the whole-table match set
      "q_multi_index_percentiles" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT n_chars FROM documents
      WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                       WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})),
sel AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.9]) AS vals FROM m)
SELECT CAST(t.p AS DOUBLE) AS p, round(CAST(t.v AS DOUBLE), 4) AS value
FROM (SELECT unnest([0.25, 0.5, 0.9]) AS p, unnest(vals) AS v FROM sel) t ORDER BY p""",
      "q_multi_index_cardinality" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_distinct FROM documents
WHERE doc_id IN (SELECT DISTINCT doc_id FROM tok
                 WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})""",
      // _explain twin: the scored CTE picks the same top-1 doc, then the
      // per-term components re-derive from tf/df/dl with the SAME
      // formula text (idfSql / scoreSql) — rounded 6, hash-identical
      "q_explain" -> {
        val terms = Analyzer.analyzeQuery(Bm25Query).toSeq
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(terms)} GROUP BY tf.doc_id),
top1 AS (SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT 1)
SELECT tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
       CAST(dl.dl AS BIGINT) AS dl,
       round(${Bm25.idfSql("df.df", "st.n")}, 6) AS idf,
       round($score, 6) AS weight
FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
WHERE tf.term IN ${inList(terms)} AND tf.doc_id IN (SELECT doc_id FROM top1)
ORDER BY tf.term"""
      },
      // scroll twin: the scored CTE with NO rank/limit — every matching
      // doc and its exact BM25 sum
      "q_scroll_all" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY tf.doc_id)
SELECT doc_id, round(score, 4) AS score FROM scored ORDER BY doc_id"""
      },
      // termvectors twin: positional unnest (1-based p → 0-based pos),
      // per-(doc, term) tf, corpus-wide df — all from the raw text
      "q_termvectors" ->
        s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
pos AS (SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS p FROM arrs),
tfd AS (SELECT doc_id, term, count(*) AS tf FROM pos GROUP BY 1, 2),
dfd AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos GROUP BY 1)
SELECT p.term, CAST(p.p - 1 AS BIGINT) AS pos, CAST(t.tf AS BIGINT) AS tf,
       CAST(d.df AS BIGINT) AS df
FROM pos p JOIN tfd t ON p.doc_id = t.doc_id AND p.term = t.term
JOIN dfd d ON p.term = d.term
WHERE p.doc_id = 42 ORDER BY p.term, pos""",
      // percolate twin: rule VALUES lists DERIVED from PercolateRules
      // (no drift). or/and unify as count(DISTINCT matched) >= need
      // (and: need = nterms; nm <= nterms makes >= an equality);
      // phrase rules are positional adjacency chains (1-based p)
      "q_percolate" -> {
        val flat = PercolateRules.filter(_.mode != graft.query.Percolator.Phrase)
        val qVals = flat.flatMap(r => Analyzer.analyzeQuery(r.query)
          .map(t => s"('${r.id}', '$t')")).mkString(", ")
        val metaVals = flat.map { r =>
          val n = Analyzer.analyzeQuery(r.query).length
          val need = if (r.mode == graft.query.Percolator.And) n else r.minShouldMatch
          s"('${r.id}', $need)"
        }.mkString(", ")
        val phraseSelects = PercolateRules
          .filter(_.mode == graft.query.Percolator.Phrase).map { r =>
            val ws = Analyzer.tokenize(r.query)
            val joins = (1 until ws.length)
              .map(j => s"JOIN pos p$j USING (doc_id)").mkString(" ")
            val conds = ws.zipWithIndex.map { case (w, j) => s"p$j.term = '$w'" } ++
              (1 until ws.length).map(j => s"p$j.p = p0.p + $j")
            s"""SELECT DISTINCT p0.doc_id, '${r.id}' AS query_id
FROM pos p0 $joins WHERE ${conds.mkString(" AND ")}"""
          }
        s"""${toksCte("documents", "doc_id")},
arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
pos AS (SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS p FROM arrs),
q(query_id, term) AS (VALUES $qVals),
meta(query_id, need) AS (VALUES $metaVals),
m AS (SELECT t.doc_id, q.query_id, count(DISTINCT t.term) AS nm
      FROM (SELECT DISTINCT doc_id, term FROM tok) t JOIN q USING (term)
      GROUP BY 1, 2)
SELECT m.doc_id, m.query_id FROM m JOIN meta USING (query_id) WHERE m.nm >= meta.need
${phraseSelects.map(s => s"UNION ALL\n$s").mkString("\n")}"""
      },
      // boosting twin: positive scored CTE, negative MEMBERSHIP demotes
      // by × 0.5 (0.5 is exact in binary — the multiply is
      // bit-reproducible); ordering over the ADJUSTED score
      "q_boosting" -> {
        val score = Bm25.scoreSql("tf.tf", "df.df", "dl.dl", "st.n", "st.avgdl")
        s"""${toksCte("documents", "doc_id")},
dl AS (SELECT d.doc_id, coalesce(t.n, 0) AS dl FROM documents d
       LEFT JOIN (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, sum($score ORDER BY tf.term ASC) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)}
  GROUP BY tf.doc_id),
adj AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (SELECT DISTINCT doc_id FROM tok WHERE term = 'merge')
              THEN score * 0.5 ELSE score END AS score
  FROM scored)
SELECT doc_id, round(score, 4) AS score
FROM adj ORDER BY score DESC, doc_id ASC LIMIT 10"""
      },
      // span_first twin: positional membership (1-based p via zipped
      // unnest; engine 0-based chain start st matches iff st + 2 <= end
      // ⇔ second slot's 1-based p <= end), scores = the phrase rule
      "q_span_first" -> bm25Sql(Seq("merge", "sort"), 10, conjunctive = true,
        docIdIn = s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
  pos AS (SELECT doc_id, unnest(arr) AS term, unnest(range(1, len(arr)+1)) AS p FROM arrs)
  SELECT DISTINCT pa.doc_id FROM pos pa JOIN pos pb USING (doc_id)
  WHERE pa.term = 'merge' AND pb.term = 'sort' AND pb.p - pa.p = 1 AND pb.p <= 8"""),
      "q_min_score" -> bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10,
        conjunctive = false, scorePred = "score >= 1.43"),
      "q_suggest_completion" ->
        s"""${toksCte("documents", "doc_id")}
SELECT term AS suggestion, CAST(count(DISTINCT doc_id) AS BIGINT) AS weight
FROM tok WHERE term LIKE 's%'
GROUP BY 1 ORDER BY weight DESC, suggestion ASC LIMIT 5""",
      "q_facet_stats" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.lang AS value, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS "min", CAST(max(n_chars) AS BIGINT) AS "max",
       round(avg(n_chars), 6) AS "avg", CAST(sum(n_chars) AS BIGINT) AS "sum"
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
GROUP BY 1 ORDER BY 1""",
      "q_facet_filtered" ->
        s"""${toksCte("documents", "doc_id")}
SELECT d.lang AS value, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
  AND d.source = 'src1'
GROUP BY 1 ORDER BY 1""",
      "q_count_range" ->
        s"""${toksCte("documents", "doc_id")}
SELECT CAST(count(*) AS BIGINT) AS n_hits FROM documents d
WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM tok
                   WHERE term IN ${inList(Analyzer.analyzeQuery(Bm25Query).toSeq)})
  AND d.n_chars BETWEEN 137 AND 2741""",
      "q_bm25_oracle" ->
        (bm25Sql(Analyzer.analyzeQuery(Bm25Query).toSeq, 10, conjunctive = false)),
      "q_dedup_exact" ->
        ("SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS copies " +
          "FROM documents GROUP BY text ORDER BY 1"),
      "q_jaccard_pairs" ->
        s"""WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] for i in range(1, greatest(len(arr) - 1, 1))]) AS sh FROM t),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT ida, idb, round(c * 1.0 / (ca.n + cb.n - c), 4) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = ida JOIN cnt cb ON cb.doc_id = idb
WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.3 ORDER BY ida, idb""",
      "q_ann_cosine" ->
        ("WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), " +
          "s AS (SELECT vec_id, list_cosine_similarity(embedding, (SELECT qv FROM q)) AS c " +
          "FROM embeddings WHERE vec_id <> 0) " +
          "SELECT vec_id, CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC) AS BIGINT) AS rank " +
          "FROM s ORDER BY c DESC, vec_id ASC LIMIT 10"),
      // q_ann_lsh probes every bucket (recall exactly 1) => brute twin
      "q_ann_lsh" ->
        ("WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), " +
          "s AS (SELECT vec_id, list_cosine_similarity(embedding, (SELECT qv FROM q)) AS c " +
          "FROM embeddings WHERE vec_id <> 0) " +
          "SELECT vec_id, CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC) AS BIGINT) AS rank " +
          "FROM s ORDER BY c DESC, vec_id ASC LIMIT 10"),
      // exact-verified sketch paths: output = exact all-pairs answer
      // (recall-1 parameters; see the queries() comments)
      "q_minhash_lsh" ->
        s"""WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents),
sh AS (SELECT DISTINCT doc_id, unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] for i in range(1, greatest(len(arr) - 1, 1))]) AS sh FROM t),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT ida, idb, round(c * 1.0 / (ca.n + cb.n - c), 4) AS jaccard
FROM inter JOIN cnt ca ON ca.doc_id = ida JOIN cnt cb ON cb.doc_id = idb
WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.3 ORDER BY ida, idb""",
      "q_simhash_pairs" ->
        s"""${toksCte("documents", "doc_id")},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM tf),
v AS (SELECT doc_id, r.j, sum(CASE WHEN (h >> CAST(r.j AS INT)) & 1 = 1 THEN tf ELSE -tf END) AS vote
      FROM h CROSS JOIN range(64) r(j) GROUP BY 1, 2),
sb AS (SELECT doc_id, CAST(sum(CASE WHEN vote > 0 THEN (1::UBIGINT << CAST(j AS INT)) ELSE 0::UBIGINT END) AS UBIGINT) AS sh FROM v GROUP BY 1),
sim AS (SELECT d.doc_id, coalesce(sb.sh, 0::UBIGINT) AS sh FROM documents d LEFT JOIN sb ON d.doc_id = sb.doc_id)
SELECT a.doc_id AS ida, b.doc_id AS idb, CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3 ORDER BY ida, idb""",
      "q_embedding_dedup" ->
        // DOUBLE[] cast: the engine accumulates cosine in double;
        // list_cosine_similarity over FLOAT[] would round in float32
        ("SELECT a.vec_id AS ida, b.vec_id AS idb, " +
          "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine " +
          "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
          "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3 " +
          "ORDER BY ida, idb"),
      "q_langid" -> langCase,
      "q_token_counts" ->
        ("SELECT doc_id, " +
          "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS ws_tokens, " +
          s"CAST(len(regexp_extract_all(lower(text), '${TextOps.BpePattern}')) AS BIGINT) AS bpe_tokens " +
          "FROM documents ORDER BY doc_id"),
      "q_quality" ->
        s"""${toksCte("documents", "doc_id")},
m AS (SELECT d.doc_id, d.text,
        coalesce(t.n, 0) AS n_tokens, coalesce(t.stop, 0) AS stop_n
      FROM documents d LEFT JOIN (
        SELECT doc_id, count(*) AS n,
               count(*) FILTER (term IN ${inList(TextOps.enStop)}) AS stop
        FROM tok GROUP BY doc_id) t ON d.doc_id = t.doc_id),
r AS (SELECT doc_id,
        CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(stop_n AS DOUBLE) / n_tokens END AS stop_ratio,
        CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
        n_tokens FROM m)
SELECT doc_id, round(stop_ratio, 4) AS stop_ratio, round(punct_ratio, 4) AS punct_ratio,
       round(least(1.0, n_tokens / 50.0) * (1.0 - punct_ratio) * least(1.0, 5.0 * stop_ratio), 4) AS quality
FROM r ORDER BY doc_id""",
      "q_multimodal_meta" ->
        ("SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'video/fake' END AS mime, " +
          "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
          "CAST(64 + octet_length(encode(text)) % 640 AS BIGINT) AS width, " +
          "CAST(64 + octet_length(encode(text)) % 480 AS BIGINT) AS height, " +
          "CAST(1 + octet_length(encode(text)) % 16 AS BIGINT) AS n_frames " +
          "FROM documents ORDER BY doc_id"),
      "q_fingerprint" ->
        s"""WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '$SqlTokRegex'), x -> x <> '') AS arr FROM documents)
SELECT doc_id,
  list_reduce(
    list_prepend(0::BIGINT, list_transform(arr, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)),
    (acc, x) -> (acc * 1000003 + x % 2147483647) % 2147483647) AS fp
FROM t ORDER BY doc_id""",
      // rows-only (no SQL-expressible oracle):
      //   q_minhash_est — emits the sketch ESTIMATE (engine-defined
      //     splitmix/fnv permutations); the exact-verified variant
      //     q_minhash_lsh is fully oracle-checked above, and OpsSpec pins
      //     the estimate's recall/precision.
      // golden-pinned oracles (deterministic fixtures → a VALUES literal
      // is the exact expected output; semantics additionally covered by
      // CatalogIngestSpec / GoldenSpec):
      "q_catalog_ingest" ->
        ("SELECT * FROM (VALUES " +
          "('a2.jpg', '/arch/a.jpg', '(1 Bytes)', '05.03.2021 00:00:00', '05.03.2021 00:00:00', 'Bild', 'K1', 'Vol1', CAST(1 AS BIGINT)), " +
          "('b.tif', '/arch/b.tif', '4 KB (4.096 Bytes)', '05.03.2021 00:00:00', '05.03.2021 00:00:00', 'Bild', 'K1', 'Vol1', CAST(4096 AS BIGINT)), " +
          "('c.pdf', '/arch/c.pdf', '(100 Bytes)', '05.03.2021 10:11:12', '06.03.2021 10:11:12', 'Dokument', 'K1', 'Vol1', CAST(100 AS BIGINT))" +
          ") AS t(name, path, size, created, lastChanged, resourceType, catalog, volume, sizeInBytes) ORDER BY path"),
      // cross-segment identity goldens (deterministic engine fixtures →
      // VALUES literals; semantics additionally pinned by StreamingSpec):
      // the (conv-3, 1) marker holder was REPLACED by a marker-free
      // re-ingest, the (conv-99, 1) holder DELETED
      "q_upsert_lww" ->
        ("SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'conv-00000017', CAST(0 AS BIGINT))" +
          ") AS t(rank, conv_id, turn_idx) ORDER BY rank"),
      "q_delete_tombstone" ->
        ("SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'conv-00000042', CAST(2 AS BIGINT))" +
          ") AS t(rank, conv_id, turn_idx) ORDER BY rank"),
      "q_transcript_bm25" ->
        ("SELECT * FROM (VALUES " +
          "(CAST(1 AS BIGINT), CAST(142 AS BIGINT), 'conv-00000017', CAST(0 AS BIGINT)), " +
          "(CAST(2 AS BIGINT), CAST(12 AS BIGINT), 'conv-00000003', CAST(1 AS BIGINT))" +
          ") AS t(rank, docId, conv_id, turn_idx) ORDER BY rank")
    )
  }
}
