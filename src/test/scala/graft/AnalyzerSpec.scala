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

  test("native Tokenize expression ≡ regex column ≡ Scala fn (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019 ._-!?\t\näöβ日本é" // ascii + punct + unicode
    val fuzz = (1 to 300).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val hand = Seq("", "x" * 256, "a" * 255 + "Z" * 10, "ALLCAPS 42", "日本語テスト mixed ascii",
      "...", "_underscore_", "0a1b2c")
    val df = (fuzz ++ hand).toDF("text")
    val native = df.select(Analyzer.tokensCol(col("text"))).as[Seq[String]].collect().toSeq
    val regex = df.select(Analyzer.tokensColRegex(col("text"))).as[Seq[String]].collect().toSeq
    val scalaF = (fuzz ++ hand).map(Analyzer.tokenize(_).toSeq)
    assert(native == regex)
    assert(native == scalaF)
  }

  test("dl column agrees with Scala token count") {
    val samples = Seq("one two three", "", "a b").toDF("text")
    assert(samples.select(Analyzer.dlCol(col("text"))).as[Int].collect().toSeq == Seq(3, 0, 2))
  }
}
