package graft

import graft.corpus.Transcripts
import graft.index.{DocIds, IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Checked-in golden outputs (FIXTURES.md §2): the engine must reproduce
  * the stored `(rank, docId, score)` per query EXACTLY — string-equal
  * scores (full double precision). Guards against drift in the analyzer,
  * corpus generator, BM25 formula, codec, or WAND all at once.
  */
class GoldenSpec extends SparkSpec {

  test("WAND engine reproduces the checked-in goldens exactly") {
    val res = getClass.getResourceAsStream("/goldens.csv")
    assert(res != null, "goldens.csv missing — run: sbt 'runMain graft.GoldenGen'")
    val lines = scala.io.Source.fromInputStream(res, "UTF-8").getLines()
      .filterNot(l => l.startsWith("#") || l.isEmpty).toSeq

    val indexDir = s"${TestSpark.tmpRoot}/index-goldenspec"
    val docs = DocIds.dedupAndAssign(Transcripts.generate(spark, GoldenGen.NConvs), 8)
    new IndexBuilder(spark, indexDir, "golden", IndexConfig(partitions = 8)).build(docs)
    val searcher = new Searcher(spark, indexDir, 8)

    val want = lines.map(_.split("\t")).groupBy(_.head)
    for ((qi, rows) <- want.toSeq.sortBy(_._1)) {
      val query = rows.head(1)
      val got = searcher.search(query, GoldenGen.K)
      val gotLines = got.zipWithIndex.map { case (s, r) => (r + 1, s.docId, s.score.toString) }
      val wantLines = rows.map(r => (r(2).toInt, r(3).toLong, r(4)))
      assert(gotLines.toSeq == wantLines.toSeq, s"golden mismatch for [$qi] '$query'")
    }
    // oracle drift guard: regenerating goldens now must give the same file
    val regen = GoldenGen.goldenLines(spark)
    assert(regen == lines, "oracle output drifted from checked-in goldens")
  }
}
