package graft

import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("token rule: lowercase, split non-alnum, drop empties, 255 cap") {
    assert(Analyzer.tokenize("Hello, World!").toSeq == Seq("hello", "world"))
    assert(Analyzer.tokenize("a-b_c.d").toSeq == Seq("a", "b", "c", "d"))
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
    assert(Analyzer.tokenize("!!! ??? ...").isEmpty)
    assert(Analyzer.tokenize("année Über 日本語 123x").toSeq == Seq("année", "über", "日本語", "123x"))
    val long = "x" * 256
    assert(Analyzer.tokenize(long).toSeq == Seq("x" * 255))
  }

  test("query analysis dedupes and sorts") {
    assert(Analyzer.analyzeQuery("b a B a").toSeq == Seq("a", "b"))
    assert(Analyzer.analyzeQuery("... !!!").isEmpty)
  }

  test("column tokenizer agrees with the Scala tokenizer") {
    val samples = Seq(
      "Hello, World!", "", "!!! ??? ...", "a-b_c.d", "x" * 256,
      "Mixed CASE tokens 42 and-more", "année Über 日本語 123x",
      "tabs\tand\nnewlines  double  spaces"
    ).toDF("text")
    val got = samples.select(Analyzer.tokensCol(col("text"))).as[Seq[String]].collect()
    val want = samples.as[String].collect().map(Analyzer.tokenize(_).toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("dl column agrees with Scala token count") {
    val samples = Seq("one two three", "", "a b").toDF("text")
    assert(samples.select(Analyzer.dlCol(col("text"))).as[Int].collect().toSeq == Seq(3, 0, 2))
  }
}
