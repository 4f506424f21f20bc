package graft

import org.apache.spark.sql.functions.col

import graft.analysis.Analyzer
import graft.query.Percolator
import graft.query.Percolator.{And, Or, Phrase, StoredQuery}

/** Percolator (reverse search): engine results ≡ a brute-force
  * independent recompute (different code path: per-doc sliding-window
  * phrase scan, set algebra for or/and), plus the loud-guard contract.
  */
class PercolatorSpec extends SparkSpec {
  import spark.implicits._

  private val docRows = Seq(
    (1L, "merge sort beats bubble sort on large tables"),
    (2L, "sort merge join shuffles both sides"),            // reversed phrase
    (3L, "slow query on a small table"),
    (4L, "slow scan"),                                      // query absent
    (5L, "the stream window aggregates the stream"),
    (6L, "Merge  SORT, with punctuation! merge sort again"),
    (7L, ""),                                               // empty text
    (8L, null.asInstanceOf[String]),                        // null text
    (9L, "the the repeated words the the"))
  private def docsDF = docRows.toDF("docId", "text")

  private val rules = Seq(
    StoredQuery("r-or", "stream scan", Or),
    StoredQuery("r-msm2", "merge join shuffle", Or, minShouldMatch = 2),
    StoredQuery("r-and", "slow query", And),
    StoredQuery("r-phrase", "merge sort", Phrase),
    StoredQuery("r-phrase-rep", "the the", Phrase))

  /** Independent recompute: naive per-doc evaluation. */
  private def brute(): Set[(Long, String)] = {
    val out = Set.newBuilder[(Long, String)]
    for ((id, text) <- docRows if text != null) {
      val toks = Analyzer.tokenize(text)
      val tset = toks.toSet
      for (r <- rules) {
        val qToks = Analyzer.tokenize(r.query)
        val fired = r.mode match {
          case Or => qToks.distinct.count(tset.contains) >= r.minShouldMatch
          case And => qToks.distinct.forall(tset.contains)
          case Phrase => toks.toSeq.sliding(qToks.length).contains(qToks.toSeq)
        }
        if (fired) out += ((id, r.id))
      }
    }
    out.result()
  }

  test("percolate ≡ brute-force per-doc evaluation (or/msm/and/phrase/repeats)") {
    val got = Percolator.percolate(spark, docsDF, rules)
      .as[(Long, String)].collect().toSet
    val want = brute()
    assert(got == want)
    // shape pins: the phrase rule fires on adjacency only (docs 1, 6 —
    // not the reversed doc 2), and-mode needs both terms (doc 3, not 4),
    // msm=2 needs two of three (doc 2: merge + join)
    assert(got.filter(_._2 == "r-phrase").map(_._1) == Set(1L, 6L))
    assert(got.contains((3L, "r-and")) && !got.contains((4L, "r-and")))
    assert(got.contains((2L, "r-msm2")) && !got.contains((1L, "r-msm2")))
    assert(got.filter(_._2 == "r-phrase-rep").map(_._1) == Set(9L))
    assert(!got.exists(h => h._1 == 7L || h._1 == 8L))
  }

  test("percolate guards fire loudly") {
    intercept[IllegalArgumentException] {
      Percolator.percolate(spark, docsDF, Nil)
    }
    intercept[IllegalArgumentException] { // duplicate ids
      Percolator.percolate(spark, docsDF,
        Seq(StoredQuery("x", "merge"), StoredQuery("x", "sort")))
    }
    intercept[IllegalArgumentException] { // analyzes to nothing
      Percolator.percolate(spark, docsDF, Seq(StoredQuery("p", "!!! ...")))
    }
    intercept[IllegalArgumentException] { // msm can never fire
      Percolator.percolate(spark, docsDF,
        Seq(StoredQuery("m", "merge sort", Or, minShouldMatch = 3)))
    }
    intercept[IllegalArgumentException] { // msm < 1
      Percolator.percolate(spark, docsDF,
        Seq(StoredQuery("m", "merge", Or, minShouldMatch = 0)))
    }
  }

  test("percolation plan is a single shuffle-free pass") {
    val df = Percolator.percolate(spark, docsDF, rules)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
