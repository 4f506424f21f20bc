package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword heuristic), quality scoring, token counting,
  * document fingerprinting. All composed from codegen'd built-ins — no
  * UDFs — and each has an exact DuckDB-SQL twin in SparkEntry.oracleSql
  * built from the SAME constants below.
  *
  * ANSI-mode safe: every division is zero-guarded (Spark 4 default
  * spark.sql.ansi.enabled=true), and fingerprint arithmetic stays within
  * Long range (ANSI overflow would throw).
  */
object TextOps {

  // disjoint stopword sets (spec'd here; SQL twins generated from these)
  val enStop = Seq("the", "a", "is", "of", "and", "to", "in")
  val deStop = Seq("der", "die", "das", "und", "ein", "nicht")
  val esStop = Seq("el", "los", "las", "que", "una")
  val frStop = Seq("le", "les", "des", "une", "est")

  private def stopCount(tokens: Column, set: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(set)))

  /** Heuristic language ID: argmax of per-language stopword hits with
    * fixed priority en > de > es > fr; no hits → "und".
    */
  def langIdCol(text: Column): Column = {
    val toks = Analyzer.tokensCol(text)
    val en = stopCount(toks, enStop)
    val de = stopCount(toks, deStop)
    val es = stopCount(toks, esStop)
    val fr = stopCount(toks, frStop)
    val g = greatest(en, de, es, fr)
    when(g === lit(0), lit("und"))
      .when(en === g, lit("en"))
      .when(de === g, lit("de"))
      .when(es === g, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Whitespace token count. */
  def wsTokensCol(text: Column): Column =
    when(length(trim(text)) === lit(0), lit(0))
      .otherwise(size(split(trim(text), "\\s+", -1)))

  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** BPE-ish token count: letter runs, digit runs, single other glyphs. */
  def bpeTokensCol(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  val PunctKeepPattern = "[\\p{L}\\p{N}\\s]"

  /** Fraction of characters that are neither alphanumeric nor whitespace. */
  def punctRatioCol(text: Column): Column =
    when(length(text) === lit(0), lit(0.0))
      .otherwise(length(regexp_replace(text, PunctKeepPattern, "")).cast("double") / length(text))

  /** English stopword fraction of analyzed tokens. */
  def stopRatioCol(text: Column): Column = {
    val toks = Analyzer.tokensCol(text)
    when(size(toks) === lit(0), lit(0.0))
      .otherwise(stopCount(toks, enStop).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1] (spec: length factor × cleanliness
    * × stopword-presence factor).
    */
  def qualityCol(text: Column): Column = {
    val nTok = size(Analyzer.tokensCol(text))
    least(lit(1.0), nTok / lit(50.0)) * (lit(1.0) - punctRatioCol(text)) *
      least(lit(1.0), lit(5.0) * stopRatioCol(text))
  }

  /** Per-token 60-bit hash: the first 15 hex chars of MD5 as a long.
    * MD5-derived (like SimHash's tokenHash64) rather than engine-private
    * xxhash64 so the whole rolling fingerprint has an exact DuckDB twin:
    * ('0x' || substr(md5(t), 1, 15))::BIGINT has the same bits.
    * 60 bits < 63 so the conv→long cast can never overflow (ANSI-safe).
    */
  def tokenHash60Col(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Order-sensitive 31-bit rolling document fingerprint over analyzed
    * tokens: acc = (acc*1000003 + (h60(token) mod p)) mod p,
    * p = 2^31-1. Stays far from Long overflow (ANSI-safe); all codegen'd
    * built-ins.
    */
  def fingerprintCol(text: Column): Column =
    aggregate(
      Analyzer.tokensCol(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(tokenHash60Col(t), lit(2147483647L)), lit(2147483647L))
    )
}
