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
    val base = sliceBase(text)
    val lo = math.max(0, first - window)
    val hi = math.min(toks.length - 1, first + window)
    render(base, toks, terms, lo, hi)
  }

  /** ES `number_of_fragments` > 1 (round-6 review "What's missing #3"):
    * the best ≤ `maxFragments` NON-OVERLAPPING ±`window`-token windows,
    * ranked by distinct matched query terms desc then earliest match
    * position asc (deterministic), selected greedily so a lower-ranked
    * window never overlaps a chosen one; returned in RANK order, each
    * with its own boundary ellipses (callers join with "…" like ES
    * clients concatenate fragments). Empty when no term matches.
    * `fragments(_, _, w, 1).headOption` is NOT always [[fragment]]:
    * the single-fragment API keeps ES's plain-highlighter first-match
    * window, this one ranks by coverage.
    */
  def fragments(text: String, terms: Set[String], window: Int,
      maxFragments: Int): Seq[String] = {
    if (maxFragments <= 0) return Nil
    val toks = Analyzer.tokenizeWithOffsets(text)
    val matchIdx = toks.indices.filter(i => terms.contains(toks(i)._1))
    if (matchIdx.isEmpty) return Nil
    val base = sliceBase(text)
    // one candidate window per match occurrence, scored by the distinct
    // matched terms it covers
    final case class Win(lo: Int, hi: Int, distinct: Int, first: Int)
    val cands = matchIdx.map { i =>
      val lo = math.max(0, i - window)
      val hi = math.min(toks.length - 1, i + window)
      val d = (lo to hi).iterator.map(j => toks(j)._1).filter(terms.contains).toSet.size
      Win(lo, hi, d, i)
    }
    val picked = scala.collection.mutable.ArrayBuffer[Win]()
    for (w <- cands.sortBy(w => (-w.distinct, w.first))
         if picked.size < maxFragments &&
           !picked.exists(p => w.lo <= p.hi && p.lo <= w.hi))
      picked += w
    picked.map(w => render(base, toks, terms, w.lo, w.hi)).toSeq
  }

  /** Offsets index the original text unless lowercasing changed its
    * length (rare Unicode cases) — then slice the lowered twin, whose
    * offsets are exact.
    */
  private def sliceBase(text: String): String = {
    val lowered = text.toLowerCase(java.util.Locale.ROOT)
    if (lowered.length == text.length) text else lowered
  }

  /** Render tokens [lo, hi] of `base` with matched tokens wrapped and
    * boundary ellipses when the window clips the text.
    */
  private def render(base: String, toks: Array[(String, Int, Int)],
      terms: Set[String], lo: Int, hi: Int): String = {
    val sb = new StringBuilder
    if (lo > 0) sb.append("…")
    var i = lo
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
