package graft

import org.apache.spark.sql.streaming.Trigger

import graft.corpus.Transcripts
import graft.index.IndexConfig
import graft.query.Searcher
import graft.streaming.StreamingIngest

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest: arriving files become query-able segments") {
    val src = s"${TestSpark.tmpRoot}/stream-src"
    val idx = s"${TestSpark.tmpRoot}/stream-idx"
    // two "arrivals" of transcript files
    Transcripts.generate(spark, 60L).filter($"conv_id" < "conv-00000030")
      .write.parquet(s"$src/part-a")
    Transcripts.generate(spark, 60L).filter($"conv_id" >= "conv-00000030")
      .write.parquet(s"$src/part-b")
    // fieldCols: segments also store #role:<v> keyword terms (bool
    // filter context) — text-term stats and every score are unaffected
    val q = StreamingIngest.ingestToIndex(spark, s"$src/part-*",
      idx, IndexConfig(numBuckets = 1, partitions = 4, fieldCols = Seq("role")),
      Trigger.AvailableNow())
    q.awaitTermination(120000)

    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(idx))
      .map(_.getPath.getName).filter(_.startsWith("seg-"))
    assert(segs.nonEmpty)

    // every turn is present exactly once across segments, disjoint docIds
    val all = segs.map(s => spark.read.parquet(s"$idx/$s/docs")).reduce(_ unionByName _)
    assert(all.count() == Transcripts.generate(spark, 60L).count())
    assert(all.select("docId").distinct().count() == all.count())
    assert(all.select("conv_id", "turn_idx").distinct().count() == all.count())

    // a marker query over the newest segment containing conv 17
    val segWithMarker = segs.find { s =>
      spark.read.parquet(s"$idx/$s/docs")
        .filter($"conv_id" === "conv-00000017" && $"turn_idx" === 0).count() > 0
    }.get
    val hits = new Searcher(spark, s"$idx/$segWithMarker", 8).search("zanzibar quasar", 10)
    assert(hits.nonEmpty)

    // cross-segment search with GLOBAL stats: rank-identical (docIds AND
    // scores) to the exhaustive oracle over the union of all segments —
    // the reference's one-index-shared-stats append behavior
    val multi = new graft.query.MultiSearcher(spark, idx)
    assert(multi.segments.size == segs.length && multi.n == all.count())
    val unionDocs = multi.docs
    for (q <- Seq("zanzibar quasar lattice", "the", "the zanzibar",
        "one have t999", "definitely-notavocab-word")) {
      val want = graft.query.Oracle.topK(unionDocs, q, 10)
        .as[graft.model.Scored].collect().toSeq
      val got = multi.search(q, 10).toSeq
      assert(got == want, s"multi-segment query '$q':\n got=$got\n want=$want")
    }
    // conjunctive across segments: both marker turns contain the phrase
    val andWant = graft.query.Oracle.topKConjunctive(unionDocs, "the zanzibar", 10)
      .as[graft.model.Scored].collect().toSeq
    assert(multi.searchConjunctive("the zanzibar", 10).toSeq == andWant)

    // edge cases: OOV → empty; analyzed-away → empty; k=0 → empty;
    // AND with one term missing corpus-wide → empty
    assert(multi.search("definitely-notavocab-word", 10).isEmpty)
    assert(multi.search("!!! ...", 10).isEmpty)
    assert(multi.search("the", 0).isEmpty)
    assert(multi.searchConjunctive("the definitely-notavocab-word", 10).isEmpty)

    // ---- compaction: segments merge into ONE plain index; a single
    // Searcher over it ≡ MultiSearcher over the segments ≡ oracle ----
    val compacted = s"${TestSpark.tmpRoot}/stream-idx-compacted"
    val report = graft.index.Compaction.compact(spark, idx, compacted)
    assert(report.segments == segs.length && report.n == all.count())
    val single = new Searcher(spark, compacted, 8)
    for (q <- Seq("zanzibar quasar lattice", "the", "the zanzibar",
        "one have t999", "definitely-notavocab-word")) {
      val want = graft.query.Oracle.topK(unionDocs, q, 10)
        .as[graft.model.Scored].collect().toSeq
      assert(single.search(q, 10).toSeq == want, s"compacted '$q'")
      assert(single.search(q, 10).toSeq == multi.search(q, 10).toSeq)
    }
    assert(single.searchConjunctive("the zanzibar", 10).toSeq == andWant)
    // positions survive the merge: phrase search works on the compacted
    // index (payload streams were carried verbatim)
    val phraseWant = graft.query.Oracle.topKPhrase(unionDocs, "zanzibar quasar", 10)
      .as[graft.model.Scored].collect().toSeq
    assert(phraseWant.nonEmpty)
    assert(single.searchPhrase("zanzibar quasar", 10).toSeq == phraseWant)
    // cross-segment phrase (no compaction needed): merged-stats scoring,
    // adjacency from the per-posting position streams
    assert(multi.searchPhrase("zanzibar quasar", 10).toSeq == phraseWant)
    assert(multi.searchPhrase("quasar zanzibar", 10).isEmpty)
    // bool filter/must_not across segments AND through compaction: the
    // #role terms merge like any other term; membership-only semantics
    // (scores = merged-global-stats BM25 — oracle ranks ALL docs, then
    // semi/anti-joins the predicate)
    def boolWant(q: String, anti: Boolean): Seq[graft.model.Scored] =
      graft.query.Oracle.topK(unionDocs, q, Int.MaxValue)
        .join(unionDocs.filter($"role" === "user").select("docId"),
          Seq("docId"), if (anti) "left_anti" else "left_semi")
        .orderBy($"score".desc, $"docId".asc).limit(10)
        .as[graft.model.Scored].collect().toSeq
    for (qq <- Seq("the", "one have t999")) {
      assert(multi.searchBool(qq, 10, filters = Seq("role" -> "user")).toSeq
        == boolWant(qq, anti = false), s"multi bool filter '$qq'")
      assert(multi.searchBool(qq, 10, mustNot = Seq("role" -> "user")).toSeq
        == boolWant(qq, anti = true), s"multi bool must_not '$qq'")
      assert(single.searchBool(qq, 10, filters = Seq("role" -> "user")).toSeq
        == boolWant(qq, anti = false), s"compacted bool filter '$qq'")
    }
    assert(multi.searchBool("the", 10, filters = Seq("role" -> "no-such")).isEmpty)
    // terms clause across segments: anyOf(assistant, tool) ≡ the
    // oracle-pinned must_not(user) on this 3-valued field
    assert(multi.searchBool("the", 10, anyFilters = Seq("role" -> Seq("assistant", "tool"))).toSeq
      == multi.searchBool("the", 10, mustNot = Seq("role" -> "user")).toSeq)
    // range clause across segments (one unioned dict expansion):
    // [a, u] lexicographically = {assistant, tool} on this field
    assert(multi.searchBool("the", 10, rangeFilters = Seq(("role", "a", "u"))).toSeq
      == multi.searchBool("the", 10, mustNot = Seq("role" -> "user")).toSeq)
    assert(multi.searchBool("the", 10, rangeFilters = Seq(("role", "zz", "zzz"))).isEmpty)

    // ---- in-place compaction + continued append: max docId comes from
    // the compacted segment's manifest (zero jobs), new batch stays
    // docId-disjoint, cross-segment search still oracle-identical ----
    val before = all.agg(org.apache.spark.sql.functions.max($"docId")).head().getLong(0)
    graft.index.Compaction.compactInPlace(spark, idx)
    val extra = Transcripts.generate(spark, 70L).filter($"conv_id" >= "conv-00000060")
    StreamingIngest.appendSegment(spark, extra, idx, batchId = 999L,
      IndexConfig(numBuckets = 1, partitions = 4))
    val multi2 = new graft.query.MultiSearcher(spark, idx)
    assert(multi2.segments.size == 2) // seg-compacted + seg-999
    val allDocs2 = multi2.docs
    assert(allDocs2.count() == Transcripts.generate(spark, 70L).count())
    assert(allDocs2.select("docId").distinct().count() == allDocs2.count())
    assert(allDocs2.agg(org.apache.spark.sql.functions.min($"docId")).head().getLong(0) == 0L)
    assert(allDocs2.filter($"docId" > before).count() == extra.count())
    for (q <- Seq("zanzibar quasar lattice", "the zanzibar")) {
      val want = graft.query.Oracle.topK(allDocs2, q, 10)
        .as[graft.model.Scored].collect().toSeq
      assert(multi2.search(q, 10).toSeq == want, s"post-compact append '$q'")
    }
  }

  test("many-segment ingest: query and compaction stay oracle-identical at 6 segments") {
    val idx = s"${TestSpark.tmpRoot}/stream-idx-many"
    val all = Transcripts.generate(spark, 90L).cache()
    val cfg = IndexConfig(numBuckets = 1, partitions = 4, fieldCols = Seq("role"))
    // 6 appends of 15 convs each — every batch becomes a segment
    for (b <- 0 until 6) {
      val lo = f"conv-${b * 15}%08d"
      val hi = f"conv-${(b + 1) * 15}%08d"
      val batch = all.filter($"conv_id" >= lo && $"conv_id" < hi).as[graft.model.Turn]
      StreamingIngest.appendSegment(spark, batch, idx, batchId = b.toLong, cfg)
    }
    val multi = new graft.query.MultiSearcher(spark, idx)
    assert(multi.segments.size == 6)
    val unionDocs = multi.docs.cache()
    assert(unionDocs.count() == all.count())
    for (q <- Seq("the", "zanzibar quasar lattice", "one have t999")) {
      val want = graft.query.Oracle.topK(unionDocs, q, 10)
        .as[graft.model.Scored].collect().toSeq
      assert(multi.search(q, 10).toSeq == want, s"6-seg '$q'")
    }
    // bool + phrase still hold across 6 segments
    val mnWant = graft.query.Oracle.topK(unionDocs, "the", Int.MaxValue)
      .join(unionDocs.filter($"role" === "user").select("docId"), Seq("docId"), "left_semi")
      .orderBy($"score".desc, $"docId".asc).limit(10)
      .as[graft.model.Scored].collect().toSeq
    assert(multi.searchBool("the", 10, filters = Seq("role" -> "user")).toSeq == mnWant)
    val phWant = graft.query.Oracle.topKPhrase(unionDocs, "zanzibar quasar", 10)
      .as[graft.model.Scored].collect().toSeq
    assert(multi.searchPhrase("zanzibar quasar", 10).toSeq == phWant)
    // one compaction collapses all six; a plain Searcher agrees
    val compacted = s"${TestSpark.tmpRoot}/stream-idx-many-compacted"
    val report = graft.index.Compaction.compact(spark, idx, compacted)
    assert(report.segments == 6 && report.n == all.count())
    val single = new Searcher(spark, compacted, 8)
    for (q <- Seq("the", "zanzibar quasar lattice", "one have t999"))
      assert(single.search(q, 10).toSeq == multi.search(q, 10).toSeq, s"compacted 6-seg '$q'")
    assert(single.searchBool("the", 10, filters = Seq("role" -> "user")).toSeq == mnWant)
    assert(single.searchPhrase("zanzibar quasar", 10).toSeq == phWant)
    unionDocs.unpersist(blocking = false)
    all.unpersist(blocking = false)
  }

  test("windowed streaming agg over the turn stream (memory sink)") {
    val src = s"${TestSpark.tmpRoot}/stream-agg-src"
    Transcripts.generate(spark, 40L).write.parquet(src)
    val schema = org.apache.spark.sql.Encoders.product[graft.model.Turn].schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = StreamingIngest.turnRates(stream, "1 hour", "2 hours")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("turn_rates").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; compare those
    // against the batch computation over the same data
    val got = spark.table("turn_rates")
    val batch = StreamingIngest.turnRates(spark.read.parquet(src), "1 hour", "2 hours")
    val gotRows = got.select($"window.start", $"role", $"n_turns").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    val batchRows = batch.select($"window.start", $"role", $"n_turns").as[(java.sql.Timestamp, String, Long)]
      .collect().toSet
    assert(gotRows.nonEmpty)
    assert(gotRows.subsetOf(batchRows))
  }
}
