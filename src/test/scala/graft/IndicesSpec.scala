package graft

import org.apache.spark.sql.functions._

import graft.corpus.Transcripts
import graft.index.{DocIds, IndexBuilder, IndexConfig}
import graft.query.{Aliases, Indices, MultiSearcher, Searcher}

/** Named indexes, aliases and multi-index search (round 7): resolution
  * (literals, globs, aliases, 404s), ES query_then_fetch scoring (each
  * index its OWN stats — single-index parity with a direct searcher),
  * deterministic cross-index merge, and the mixed built/streaming
  * layout.
  */
class IndicesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = s"${TestSpark.tmpRoot}/indices-root"
  private lazy val cfg = IndexConfig(numBuckets = 2, numShards = 8, blockSize = 32,
    partitions = 4)
  private lazy val fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // three named indexes over disjoint conv ranges: two plain builds and
  // one streaming seg-* index (exercises both searcher dispatches)
  private lazy val built: Unit = {
    val all = Transcripts.generate(spark, 240L)
    val third = 240L / 3
    def slice(i: Long) = all.filter(
      col("conv_id") >= f"conv-${i * third}%08d" &&
        col("conv_id") < f"conv-${(i + 1) * third}%08d").as[graft.model.Turn]
    new IndexBuilder(spark, s"$root/idx-a", "snap-ia", cfg)
      .build(DocIds.assign(DocIds.dedup(slice(0)), 4))
    new IndexBuilder(spark, s"$root/idx-b", "snap-ib", cfg)
      .build(DocIds.assign(DocIds.dedup(slice(1)), 4))
    graft.streaming.StreamingIngest.appendSegment(spark,
      slice(2), s"$root/idx-stream", 0L, cfg)
    Aliases.add(fs, root, "ab", Seq("idx-a", "idx-b"))
  }
  private lazy val ix = { built; new Indices(spark, root, cfg.numShards) }

  test("resolution: names, globs, aliases; unknown literal fails loudly") {
    built
    assert(ix.indexNames == Seq("idx-a", "idx-b", "idx-stream"))
    assert(ix.resolve("idx-a") == Seq("idx-a"))
    assert(ix.resolve("idx-*") == Seq("idx-a", "idx-b", "idx-stream"))
    assert(ix.resolve("idx-?") == Seq("idx-a", "idx-b"))
    assert(ix.resolve("ab") == Seq("idx-a", "idx-b"))
    assert(ix.resolve("ab,idx-stream") == Seq("idx-a", "idx-b", "idx-stream"))
    assert(ix.resolve("idx-a,idx-a") == Seq("idx-a")) // distinct
    assert(ix.resolve("nomatch-*").isEmpty)
    intercept[IllegalArgumentException] { ix.resolve("missing-index") }
    // alias CRUD round-trip
    Aliases.add(fs, root, "tmp", Seq("idx-b"))
    assert(ix.resolve("tmp") == Seq("idx-b"))
    Aliases.remove(fs, root, "tmp")
    intercept[IllegalArgumentException] { ix.resolve("tmp") }
    // guards (round-7 review): an alias may not shadow a real index or
    // a glob, targets are syntax-checked, and a DANGLING alias fails at
    // resolve time (not inside a later parquet read)
    intercept[IllegalArgumentException] { Aliases.add(fs, root, "idx-a", Seq("idx-b")) }
    intercept[IllegalArgumentException] { Aliases.add(fs, root, "idx-*", Seq("idx-b")) }
    intercept[IllegalArgumentException] { Aliases.add(fs, root, "bad", Seq("a,b")) }
    Aliases.add(fs, root, "dangling", Seq("idx-gone"))
    intercept[IllegalArgumentException] { ix.resolve("dangling") }
    Aliases.remove(fs, root, "dangling")
  }

  test("single-index search through Indices ≡ direct searcher (local stats)") {
    built
    for (q <- Seq("the", "zanzibar", "the a of")) {
      val direct = new Searcher(spark, s"$root/idx-a", cfg.numShards).search(q, 10)
      val viaIx = ix.search("idx-a", q, 10).as[(String, Long, Double)].collect()
      assert(viaIx.toSeq == direct.map(h => ("idx-a", h.docId, h.score)).toSeq, s"'$q'")
      val directSeg = new MultiSearcher(spark, s"$root/idx-stream").search(q, 10)
      assert(ix.search("idx-stream", q, 10).as[(String, Long, Double)].collect().toSeq
        == directSeg.map(h => ("idx-stream", h.docId, h.score)).toSeq, s"seg '$q'")
    }
  }

  test("multi-index merge: per-index top-k under OWN stats, (score, index, docId) order") {
    built
    val q = "the a"
    val perIndex = Seq(
      "idx-a" -> new Searcher(spark, s"$root/idx-a", cfg.numShards).search(q, 10),
      "idx-b" -> new Searcher(spark, s"$root/idx-b", cfg.numShards).search(q, 10),
      "idx-stream" -> new MultiSearcher(spark, s"$root/idx-stream").search(q, 10))
    val want = perIndex.flatMap { case (n, hs) => hs.map(h => (n, h.docId, h.score)) }
      .sortBy { case (n, id, s) => (-s, n, id) }.take(10)
    val got = ix.search("idx-*", q, 10).as[(String, Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // all three indexes hold 'the' docs, and scores differ across
    // indexes for the same corpus slice sizes — local stats are real
    assert(ix.counts("idx-*", "the").as[(String, Long)].collect()
      .forall(_._2 > 0))
    // alias + explicit name ≡ glob
    assert(ix.search("ab,idx-stream", q, 10).as[(String, Long, Double)].collect().toSeq
      == got)
    // indices_boost: one index's scores multiply BEFORE the merge;
    // per-index internal ranking is preserved
    val boosted = ix.search("idx-*", q, 10, indicesBoost = Map("idx-b" -> 4.0))
      .as[(String, Long, Double)].collect().toSeq
    val wantBoost = perIndex.flatMap { case (n, hs) =>
      hs.map(h => (n, h.docId, if (n == "idx-b") 4.0 * h.score else h.score)) }
      .sortBy { case (n, id, s) => (-s, n, id) }.take(10)
    assert(boosted == wantBoost && boosted.exists(_._1 == "idx-b"))
    assert(boosted != got) // the boost actually changed the merged page
    intercept[IllegalArgumentException] {
      ix.search("idx-*", q, 10, indicesBoost = Map("idx-b" -> 0.0))
    }
    // boost keys resolve like search expressions (round-7 review): an
    // alias key boosts its members; a typo'd literal key 404s loudly
    // instead of silently boosting nothing; conflicting factors on one
    // index are rejected
    val viaAlias = ix.search("idx-*", q, 10, indicesBoost = Map("ab" -> 4.0))
      .as[(String, Long, Double)].collect().toSeq
    val wantAlias = perIndex.flatMap { case (n, hs) =>
      hs.map(h => (n, h.docId,
        if (n == "idx-a" || n == "idx-b") 4.0 * h.score else h.score)) }
      .sortBy { case (n, id, s) => (-s, n, id) }.take(10)
    assert(viaAlias == wantAlias)
    intercept[IllegalArgumentException] {
      ix.search("idx-*", q, 10, indicesBoost = Map("idx-bb" -> 2.0))
    }
    intercept[IllegalArgumentException] {
      ix.search("idx-*", q, 10, indicesBoost = Map("ab" -> 2.0, "idx-a" -> 3.0))
    }

    // conjunctive dispatch
    val gotAnd = ix.search("idx-*", "the a", 10, conjunctive = true)
      .as[(String, Long, Double)].collect().toSeq
    val wantAnd = Seq(
      "idx-a" -> new Searcher(spark, s"$root/idx-a", cfg.numShards).searchConjunctive(q, 10),
      "idx-b" -> new Searcher(spark, s"$root/idx-b", cfg.numShards).searchConjunctive(q, 10),
      "idx-stream" -> new MultiSearcher(spark, s"$root/idx-stream").searchConjunctive(q, 10))
      .flatMap { case (n, hs) => hs.map(h => (n, h.docId, h.score)) }
      .sortBy { case (n, id, s) => (-s, n, id) }.take(10)
    assert(gotAnd == wantAnd && gotAnd.nonEmpty)
  }

  test("multi-index facet merge ≡ SUM of per-index buckets; size post-merge (round-8)") {
    built
    val q = "the zanzibar"
    val per = Seq(
      new Searcher(spark, s"$root/idx-a", cfg.numShards).facetCounts(q, "role"),
      new Searcher(spark, s"$root/idx-b", cfg.numShards).facetCounts(q, "role"),
      new MultiSearcher(spark, s"$root/idx-stream").facetCounts(q, "role"))
      .flatMap(_.as[(String, Long)].collect())
    val want = per.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1)
    val got = ix.facetCounts("idx-*", q, "role").as[(String, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // size applies AFTER the merge (coordinating-node rule)
    val capped = ix.facetCounts("idx-*", q, "role", size = 1)
      .as[(String, Long)].collect().toSeq
    assert(capped == want.sortBy { case (v, n) => (-n, v) }.take(1))
    intercept[IllegalArgumentException] { ix.facetCounts("nomatch-*", q, "role") }
  }

  test("multi-index stats merge: exact partial combine, avg re-derived (round-8)") {
    built
    val q = "the zanzibar"
    val per = Seq(
      new Searcher(spark, s"$root/idx-a", cfg.numShards).fieldStats(q, "dl"),
      new Searcher(spark, s"$root/idx-b", cfg.numShards).fieldStats(q, "dl"),
      new MultiSearcher(spark, s"$root/idx-stream").fieldStats(q, "dl"))
      .map(_.as[(Long, Int, Int, Double, Long)].collect().head)
    val n = per.map(_._1).sum
    assert(n > 0 && per.forall(_._1 > 0))
    val want = (n, per.map(_._2).min, per.map(_._3).max,
      per.map(_._5).sum.toDouble / n, per.map(_._5).sum)
    val got = ix.fieldStats("idx-*", q, "dl")
      .as[(Long, Int, Int, Double, Long)].collect().head
    assert(got == want)
    // avg is merged sum ÷ merged count — NEVER the mean of per-index
    // averages (the fixture's per-index counts differ, so they diverge)
    val naive = per.map(_._4).sum / per.size
    assert(per.map(_._1).distinct.size == 1 || math.abs(got._4 - naive) > 0)
    // alias expression resolves like search; no match fails loudly
    assert(ix.fieldStats("ab", q, "dl").as[(Long, Int, Int, Double, Long)]
      .collect().head._1 == per(0)._1 + per(1)._1)
    intercept[IllegalArgumentException] { ix.fieldStats("nomatch-*", q, "dl") }
  }

  test("multi-index percentiles/cardinality ride the unioned match set (round-8)") {
    built
    val qq = "the zanzibar"
    def frames(field: String) = Seq(
      new Searcher(spark, s"$root/idx-a", cfg.numShards).matchedField(qq, field),
      new Searcher(spark, s"$root/idx-b", cfg.numShards).matchedField(qq, field),
      new MultiSearcher(spark, s"$root/idx-stream").matchedField(qq, field))
    // exact percentiles ≡ closest-ranks linear interpolation over the
    // concatenated per-index matched values (independent construction)
    val values = frames("dl")
      .flatMap(_.select(col("dl").cast("double")).as[Double].collect()).sorted
    assert(values.nonEmpty)
    def quant(p: Double): Double = {
      val h = (values.size - 1) * p
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      values(lo) + (h - lo) * (values(hi) - values(lo))
    }
    val ps = Seq(0.25, 0.5, 0.9)
    val got = ix.percentiles("idx-*", qq, "dl", ps)
      .as[(Double, Double)].collect().toSeq
    assert(got.map(_._1) == ps)
    for ((p, v) <- got)
      assert(math.abs(v - quant(p)) < 1e-9, s"p=$p got=$v want=${quant(p)}")
    // cardinality de-dups ACROSS indexes: every index carries the same
    // role values, so the per-index sum strictly exceeds the union
    val perCard = Seq(
      new Searcher(spark, s"$root/idx-a", cfg.numShards).cardinality(qq, "role"),
      new Searcher(spark, s"$root/idx-b", cfg.numShards).cardinality(qq, "role"),
      new MultiSearcher(spark, s"$root/idx-stream").cardinality(qq, "role"))
    val gotC = ix.cardinality("idx-*", qq, "role")
    val wantC = frames("role")
      .flatMap(_.select("role").as[String].collect()).distinct.size.toLong
    assert(gotC == wantC && gotC > 0)
    assert(perCard.sum > gotC)
    intercept[IllegalArgumentException] { ix.percentiles("nomatch-*", qq, "dl", ps) }
  }

  test("an index directory created AFTER a same-named alias fails loudly (round-8 advice)") {
    built
    Aliases.add(fs, root, "shadow", Seq("idx-a"))
    // simulate an operator creating an index dir named like the alias
    val p = new org.apache.hadoop.fs.Path(s"$root/shadow/segments.props")
    val out = fs.create(p, true); out.close()
    try {
      val e = intercept[IllegalArgumentException] { ix.resolve("shadow") }
      assert(e.getMessage.contains("both an alias and a live index"))
      // the collision poisons EVERY resolution until repaired (ES
      // refuses the state outright)
      intercept[IllegalArgumentException] { ix.resolve("idx-a") }
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/shadow"), true)
      Aliases.remove(fs, root, "shadow")
    }
    assert(ix.resolve("idx-a") == Seq("idx-a")) // repaired
  }
}
