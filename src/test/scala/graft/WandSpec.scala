package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Codec, GraftHash}
import graft.model.{PostingBlock, Scored}
import graft.query.{Bm25, Wand}

/** Pure-Scala property test: block-max WAND top-k ≡ exhaustive scoring,
  * on randomized (seeded) synthetic posting sets — rank AND score
  * identity (SURVEY.md §5.2.2).
  */
class WandSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  /** Build a tiny corpus: docId → Map(term -> tf), with doc lengths. */
  private def randomCorpus(nDocs: Int, vocab: Int): (Array[Map[String, Int]], Array[Int]) = {
    val docs = Array.fill(nDocs) {
      val nTok = 1 + rnd.nextInt(30)
      val toks = Seq.fill(nTok)("t" + rnd.nextInt(vocab))
      toks.groupBy(identity).map { case (t, xs) => t -> xs.size }
    }
    val dls = docs.map(_.values.sum)
    (docs, dls)
  }

  private def check(nDocs: Int, vocab: Int, qTerms: Seq[String], k: Int, blockSize: Int,
      conjunctive: Boolean = false): Unit = {
    val (docs, dls) = randomCorpus(nDocs, vocab)
    val n = nDocs.toLong
    val avgdl = dls.sum.toDouble / nDocs
    val df: Map[String, Long] =
      docs.flatMap(_.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val terms = qTerms.distinct.sorted.filter(df.contains)

    // brute force: score in ascending term order
    val brute = (0L until n).flatMap { d =>
      val present = terms.filter(t => docs(d.toInt).contains(t))
      if (present.isEmpty || (conjunctive && present.size != terms.size)) None
      else {
        var s = 0.0
        present.foreach { t =>
          s += Bm25.score(docs(d.toInt)(t), df(t), dls(d.toInt), n, avgdl)
        }
        Some(Scored(d, s))
      }
    }.sortBy(s => (-s.score, s.docId)).take(k)

    // engine: blocks + WAND (termId = position in the sorted term list —
    // any unique id works; blocks are keyed by id, ordering by term string)
    val iters = terms.zipWithIndex.map { case (t, tid) =>
      val postings = (0 until nDocs).filter(d => docs(d).contains(t))
      val ids = postings.map(_.toLong).toArray
      val tfs = postings.map(d => docs(d)(t)).toArray
      val ds = postings.map(dls(_)).toArray
      val scores = postings.indices.map(i => Bm25.score(tfs(i), df(t), ds(i), n, avgdl)).toArray
      val blocks: Array[PostingBlock] =
        Codec.encodeBlocks(tid.toLong, GraftHash.shardOf(t, 8), 0, ids, tfs, ds, scores, blockSize).toArray
      val ub = if (scores.isEmpty) 0.0 else scores.max
      new Wand.TermIterator(t, blocks, ub, df(t), n, avgdl)
    }
    val got =
      if (conjunctive) Wand.topKConjunctive(iters, k) else Wand.topK(iters, k)
    assert(got.toSeq == brute,
      s"WAND mismatch: terms=$terms k=$k conj=$conjunctive\n got=${got.toSeq}\n want=$brute")
  }

  test("WAND top-k ≡ exhaustive on 200 random cases") {
    for (i <- 1 to 200) {
      val vocab = 3 + rnd.nextInt(30)
      val nDocs = 10 + rnd.nextInt(500)
      val nq = 1 + rnd.nextInt(4)
      val q = Seq.fill(nq)("t" + rnd.nextInt(vocab))
      val k = 1 + rnd.nextInt(20)
      val blockSize = Seq(4, 16, 128)(i % 3)
      check(nDocs, vocab, q, k, blockSize)
    }
  }

  test("conjunctive top-k ≡ exhaustive on 100 random cases") {
    for (i <- 1 to 100) {
      val vocab = 3 + rnd.nextInt(10)
      val nDocs = 10 + rnd.nextInt(400)
      val q = Seq.fill(1 + rnd.nextInt(3))("t" + rnd.nextInt(vocab))
      check(nDocs, vocab, q, 1 + rnd.nextInt(15), Seq(4, 16, 128)(i % 3), conjunctive = true)
    }
  }

  test("empty and missing-term queries") {
    check(50, 5, Seq("zzz-not-present"), 10, 16)
    check(50, 5, Seq.empty, 10, 16)
  }
}
