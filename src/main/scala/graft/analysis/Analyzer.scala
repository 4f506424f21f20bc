package graft.analysis

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fulltext analyzer — the single tokenization rule shared by the index
  * and query paths (ES parity rule: query analyzer ≡ index analyzer;
  * SURVEY.md §7.2).
  *
  * Spec (pinned by AnalyzerSpec): lowercase (Locale.ROOT) → split on runs
  * of non-alphanumeric (`[^\p{L}\p{N}]+`) → drop empties → truncate tokens
  * longer than 255 chars. This approximates the ES standard analyzer the
  * reference relies on for its dynamic-mapped fulltext fields
  * (reference mapping.json:12-17; UAX#29 + lowercase + max_token_length
  * 255, no stopwords).
  *
  * Two implementations that MUST agree (tested): a Catalyst column
  * composition (codegen'd, used on the hot index path) and a plain Scala
  * function (used inside typed mapPartitions and at query parse time).
  */
object Analyzer {
  val TokenRegex = "[^\\p{L}\\p{N}]+"
  val MaxTokenLen = 255
  private val pattern = java.util.regex.Pattern.compile(TokenRegex)

  /** Scala-side tokenizer — identical semantics to [[tokensCol]].
    *
    * ASCII fast path (the same single-scan kernel as
    * [[TokenizeKernel]], on chars): for pure-ASCII input,
    * `toLowerCase(Locale.ROOT)` only maps A-Z → a-z and the
    * `[^\p{L}\p{N}]+` split reduces to runs of [0-9A-Za-z], so one
    * char scan with inline lowercasing is exactly the regex result —
    * no full lowercased copy, no regex engine, no intermediate parts
    * array. This function runs inside the build's typed mapPartitions
    * (tf+positions fold, dl computation), where the regex was a
    * measured ~13% of executor CPU (round-9 thread-dump sampling).
    * Any non-ASCII char falls back to the regex path (Unicode
    * letter/digit classes). Equivalence is property-tested
    * (AnalyzerSpec).
    */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val n = text.length
    var i = 0
    while (i < n) {
      if (text.charAt(i) >= 0x80) return tokenizeRegex(text)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    i = 0
    while (i < n) {
      var c = text.charAt(i)
      if ((c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
        val start = i
        i += 1
        var needsLower = c >= 'A' && c <= 'Z'
        var run = true
        while (i < n && run) {
          c = text.charAt(i)
          if ((c >= '0' && c <= '9') || (c >= 'a' && c <= 'z')) i += 1
          else if (c >= 'A' && c <= 'Z') { needsLower = true; i += 1 }
          else run = false
        }
        val len = math.min(i - start, MaxTokenLen)
        if (!needsLower) out += text.substring(start, start + len)
        else {
          val arr = new Array[Char](len)
          var j = 0
          while (j < len) {
            val ch = text.charAt(start + j)
            arr(j) = if (ch >= 'A' && ch <= 'Z') (ch + 32).toChar else ch
            j += 1
          }
          out += new String(arr)
        }
      } else i += 1
    }
    out.toArray
  }

  /** The original regex implementation — the non-ASCII fallback and the
    * equivalence oracle for the fast path.
    */
  private[analysis] def tokenizeRegex(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val lowered = text.toLowerCase(Locale.ROOT)
    val parts = pattern.split(lowered, -1)
    val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty) out += (if (p.length > MaxTokenLen) p.substring(0, MaxTokenLen) else p)
      i += 1
    }
    out.toArray
  }

  /** Query analysis: tokenize, dedupe, ascending term order (spec: each
    * distinct query term scores once; summation order = term asc,
    * SURVEY.md §7.5).
    */
  def analyzeQuery(q: String): Array[String] = tokenize(q).distinct.sorted

  private val wordPattern = java.util.regex.Pattern.compile("[\\p{L}\\p{N}]+")

  /** Tokens with their [start, end) char offsets — the highlighter's
    * view. Token VALUES are identical to [[tokenize]] (same alphabet,
    * same truncation); offsets index the ORIGINAL string when
    * lowercasing preserves length (the overwhelmingly common case —
    * guaranteed for ASCII), else the lowercased twin, which keeps
    * slicing safe either way. A truncated token's end offset is capped
    * at start + MaxTokenLen so a highlight tag wraps exactly the token
    * VALUE, not the whole >255-char run (round-3 review).
    */
  def tokenizeWithOffsets(text: String): Array[(String, Int, Int)] = {
    if (text == null || text.isEmpty) return Array.empty
    val lowered = text.toLowerCase(Locale.ROOT)
    val m = wordPattern.matcher(lowered)
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    while (m.find()) {
      val tok = m.group()
      out += ((if (tok.length > MaxTokenLen) tok.substring(0, MaxTokenLen) else tok,
        m.start(), math.min(m.end(), m.start() + MaxTokenLen)))
    }
    out.toArray
  }

  /** Column tokenizer: ArrayType(StringType) of analyzed tokens — the
    * native byte-level expression (see [[Tokenize]]); equivalent to
    * [[tokensColRegex]] and [[tokenize]] (property-tested).
    */
  def tokensCol(c: Column): Column = Tokenize.col(c)

  /** Reference implementation composed from built-ins (regex path) —
    * kept as the equivalence oracle for the native expression.
    */
  def tokensColRegex(c: Column): Column =
    transform(
      filter(split(lower(c), TokenRegex, -1), t => t =!= lit("")),
      t => substring(t, 1, MaxTokenLen)
    )

  /** Token count column (BM25 `dl`). */
  def dlCol(c: Column): Column = size(tokensCol(c))
}
