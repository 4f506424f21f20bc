package graft.query

import graft.analysis.Analyzer

/** ES-style hit highlighting (the `highlight` block of a search
  * response): a fragment of ±window tokens around the first query-term
  * occurrence, every matched token wrapped in `<em></em>`. Pure
  * function over (text, query terms) — runs on the k RESOLVED hits
  * only (O(k·dl) total), never over the corpus; tested against planted
  * markers in EngineSpec.
  *
  * The reference's users highlight via ES's highlighter on the same
  * analyzed fields this engine indexes (dynamic mapping,
  * CsvReader.java:315-328); token offsets come from the analyzer
  * (Analyzer.tokenizeWithOffsets), so tags always wrap whole analyzed
  * tokens and the fragment slices the original text.
  */
object Highlight {
  val PreTag = "<em>"
  val PostTag = "</em>"

  /** The highlighted fragment, or null when no query term occurs in
    * `text` (ES omits the highlight entry for such hits — possible
    * under OR semantics when a doc matched on other fields/terms).
    */
  def fragment(text: String, terms: Set[String], window: Int): String = {
    val toks = Analyzer.tokenizeWithOffsets(text)
    var first = -1
    var i = 0
    while (i < toks.length && first < 0) {
      if (terms.contains(toks(i)._1)) first = i
      i += 1
    }
    if (first < 0) return null
    // offsets index the original text unless lowercasing changed its
    // length (rare Unicode cases) — then slice the lowered twin, whose
    // offsets are exact
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    val base = if (lowered.length == text.length) text else lowered
    val lo = math.max(0, first - window)
    val hi = math.min(toks.length - 1, first + window)
    val sb = new StringBuilder
    if (lo > 0) sb.append("…")
    i = lo
    while (i <= hi) {
      val (tok, s, e) = toks(i)
      if (i > lo) sb.append(base.substring(toks(i - 1)._3, s)) // inter-token gap
      val matched = terms.contains(tok)
      if (matched) sb.append(PreTag)
      sb.append(base.substring(s, e))
      if (matched) sb.append(PostTag)
      i += 1
    }
    if (hi < toks.length - 1) sb.append("…")
    sb.toString
  }
}
