package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.corpus.Transcripts
import graft.index.{DocIds, IndexBuilder, IndexConfig}
import graft.query.{Bm25, MultiSearcher, Searcher}
import graft.streaming.StreamingIngest

/** ES `_explain`: the per-term BM25 breakdown must re-derive from raw
  * corpus counts bit-exactly, and its weights must SUM to the very
  * score `search` ranks by — on the single index and across LWW
  * segments (where a tombstoned doc explains to nothing).
  */
class ExplainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val indexDir = s"${TestSpark.tmpRoot}/index-explain"
  private lazy val cfg = IndexConfig(numBuckets = 2, numShards = 8, blockSize = 32,
    partitions = 8)
  private lazy val built: graft.index.BuildReport = {
    val docs = DocIds.assign(DocIds.dedup(Transcripts.generate(spark, 300L)), 8)
    new IndexBuilder(spark, indexDir, "snap-explain-1", cfg).build(docs)
  }
  private lazy val searcher = { built; new Searcher(spark, indexDir, cfg.numShards) }
  private lazy val docsDF = { built; spark.read.parquet(s"$indexDir/docs") }

  test("explain re-derives tf/df/dl/idf/weight from the raw corpus, exactly") {
    val q = "the zanzibar quasar"
    val top = searcher.search(q, 1).head
    val got = searcher.explain(q, top.docId)
      .as[(String, Int, Long, Int, Double, Double)].collect().toSeq
    // independent recompute: counts straight off the doc store
    val n = docsDF.count()
    val avgdl = docsDF.agg(avg(col("dl"))).head().getDouble(0)
    val text = docsDF.filter(col("docId") === top.docId)
      .select("text").as[String].head()
    val toks = Analyzer.tokenize(text)
    val want = Analyzer.analyzeQuery(q).toSeq.flatMap { t =>
      val tf = toks.count(_ == t)
      if (tf == 0) None
      else {
        val df = docsDF.filter(array_contains(Analyzer.tokensCol(col("text")), t))
          .count()
        val dl = toks.length
        val idf = StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))
        Some((t, tf, df, dl, idf, Bm25.score(tf, df, dl, n, avgdl)))
      }
    }.sortBy(_._1)
    assert(got == want, s"\n got=$got\n want=$want")
    // a query term ABSENT from the doc contributes no row (ES omits
    // non-matching sub-explanations): explain the same query against a
    // doc that lacks the marker term
    val plain = docsDF
      .filter(!array_contains(Analyzer.tokensCol(col("text")), "zanzibar") &&
        array_contains(Analyzer.tokensCol(col("text")), "the"))
      .orderBy(col("docId")).select("docId").as[Long].head()
    val partial = searcher.explain(q, plain)
      .select("term").as[String].collect().toSet
    assert(partial.contains("the") && !partial.contains("zanzibar"))
  }

  test("sum(explain weights) is bit-identical to the search score") {
    val q = "spark window merge slow"
    for (hit <- searcher.search(q, 5)) {
      // search scores accumulate in term-ascending order; explain rows
      // are term-ordered, so a driver-side fold reproduces the sum
      // BIT-identically (same addition order)
      val fold = searcher.explain(q, hit.docId)
        .select("weight").as[Double].collect().foldLeft(0.0)(_ + _)
      assert(fold == hit.score, s"doc ${hit.docId}: fold=$fold search=${hit.score}")
    }
  }

  test("explain empty contracts: OOV query, unknown docId") {
    assert(searcher.explain("qqqzzz", 1L).count() == 0)
    assert(searcher.explain("the", -1L).count() == 0)
  }

  test("termvectors re-derive from the raw text; offsets slice to the token") {
    val victim = docsDF.filter(length(col("text")) > 50)
      .orderBy(col("docId")).select("docId", "text").head()
    val (id, text) = (victim.getLong(0), victim.getString(1))
    val got = searcher.termVectors(id)
      .as[(String, Int, Int, Int, Int, Long)].collect().toSeq
    val toks = Analyzer.tokenize(text)
    assert(got.size == toks.length)
    // independent recompute: tf by counting, df by scanning the store,
    // positions = token indexes in term-grouped ascending order
    val want = toks.zipWithIndex.map { case (t, i) =>
      (t, i, toks.count(_ == t).toLong,
        docsDF.filter(array_contains(Analyzer.tokensCol(col("text")), t)).count())
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(r => (r._1, r._2, r._5.toLong, r._6)) == want)
    // offsets slice the original text to exactly the token value
    for ((t, _, s, e, _, _) <- got)
      assert(text.substring(s, e).toLowerCase == t, s"offset [$s,$e) for '$t'")
    assert(searcher.termVectors(-1L).count() == 0)
  }

  test("cross-segment explain: merged stats, tombstoned doc explains to nothing") {
    val dir = s"${TestSpark.tmpRoot}/index-explain-stream"
    val scfg = IndexConfig(numBuckets = 1, partitions = 8)
    StreamingIngest.appendSegment(spark, Transcripts.generate(spark, 120L), dir, 0L, scfg)
    val extra = Seq(graft.model.Turn("conv-x", 0, "user",
      "zanzibar quasar lattice extra segment row", None, new Timestamp(1767312000000L))).toDS()
    StreamingIngest.appendSegment(spark, extra, dir, 1L, scfg)
    val ms = new MultiSearcher(spark, dir)
    val q = "zanzibar quasar"
    val top = ms.search(q, 3)
    assert(top.nonEmpty)
    for (hit <- top) {
      val fold = ms.explain(q, hit.docId)
        .select("weight").as[Double].collect().foldLeft(0.0)(_ + _)
      assert(fold == hit.score, s"doc ${hit.docId}: fold=$fold search=${hit.score}")
    }
    // delete the top hit's conversation -> its docs explain to zero rows
    val victim = top.head.docId
    val (conv, turn) = {
      val r = spark.read.parquet(s"$dir/seg-*/docs").filter(col("docId") === victim)
        .select("conv_id", "turn_idx").head()
      (r.getString(0), r.getInt(1))
    }
    // termvectors across segments: the batch-1 doc's text + merged df
    val tv = ms.termVectors(top.head.docId)
      .as[(String, Int, Int, Int, Int, Long)].collect().toSeq
    assert(tv.nonEmpty && tv.forall(_._6 > 0))
    val dfOfZanzibar = tv.find(_._1 == "zanzibar")
    for (row <- dfOfZanzibar) assert(row._6 >= 2) // corpus markers + extra row
    StreamingIngest.deleteTurns(spark, dir, Seq((conv, turn)))
    val ms2 = new MultiSearcher(spark, dir)
    assert(ms2.explain(q, victim).count() == 0)
    assert(!ms2.search(q, 3).exists(_.docId == victim))
    assert(ms2.termVectors(victim).count() == 0)
  }
}
