package graft.query

import graft.analysis.Analyzer

/** Lucene/ES `query_string` mini-language compiled to a [[BoolQuerySpec]]
  * (the URI-search surface the reference's users query Elasticsearch
  * with — Kibana's default search box; reference README.md usage).
  * Supported subset, flat like the engine's bool query:
  *
  *   - bare words score over the default field (`hello world` — OR);
  *     `AND` between words (or `defaultOperator = "AND"`) makes every
  *     scored word required
  *   - `+word` = required (must), remaining bare words stay optional
  *     (should) — the Lucene modifier semantics
  *   - `-word` / `NOT word` = must_not over the analyzed field
  *   - `"a phrase"` (optionally `"a phrase"~2`) = match_phrase with
  *     slop — the WHOLE scored part must be the one phrase
  *   - `field:value` = keyword `term` filter (field in
  *     `Schema.keywordFields`), or a scored fielded match (field in
  *     `Schema.textFields`); `-field:value` the corresponding must_not
  *   - `field:[lo TO hi]` = inclusive range — tiered-trie numeric
  *     clause for `Schema.numericFields` (both endpoints Long, or `*`
  *     for open ends), lexicographic for keyword fields
  *   - `_exists_:field` / `-_exists_:field` = exists / missing
  *
  * Deliberately NOT supported (throws IllegalArgumentException with a
  * pointer to the structured API): parentheses/nested boolean groups,
  * mixed AND+OR without parens (Lucene's precedence is a well-known
  * trap), wildcards/fuzziness inside the string (use
  * `searchWildcard`/`searchFuzzy`/`searchPhrasePrefix`), per-term
  * boosts (use `multiMatch`), and phrase + loose words in one query.
  * Scored words must target ONE field (the spec's `field`).
  */
object QueryString {

  /** What the parser knows about the index's fields — mirrors the
    * `IndexConfig` the index was built with ("text" is always a valid
    * text field; the default field scores there).
    */
  final case class Schema(
      keywordFields: Set[String] = Set.empty,
      numericFields: Set[String] = Set.empty,
      textFields: Set[String] = Set.empty,
      defaultOperator: String = "OR") {
    require(defaultOperator == "OR" || defaultOperator == "AND",
      s"defaultOperator must be OR or AND, got $defaultOperator")
  }

  private sealed trait Tok
  private case object And extends Tok
  private case object Or extends Tok
  private case object Not extends Tok
  private final case class Clause(
      neg: Boolean, req: Boolean, field: Option[String], kind: Kind) extends Tok
  private sealed trait Kind
  private final case class Word(w: String) extends Kind
  private final case class Phrase(words: String, slop: Int) extends Kind
  private final case class Range(lo: String, hi: String) extends Kind

  // one token: optional +/- modifier, optional field:, then a quoted
  // phrase (with optional ~slop), a [lo TO hi] range, or a bare word
  private val TokRx =
    """([+-])?(?:([A-Za-z0-9_.]+):)?(?:"([^"]*)"(?:~(\d+))?|\[([^\]\s]+)\s+TO\s+([^\]\s]+)\]|([^\s"\[\]()]+))""".r

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(
    s"query_string: $msg")

  private def lex(q: String): Seq[Tok] = {
    val toks = TokRx.findAllMatchIn(q).map { m =>
      val mod = Option(m.group(1))
      val field = Option(m.group(2))
      if (m.group(3) != null)
        Clause(mod.contains("-"), mod.contains("+"), field,
          Phrase(m.group(3), Option(m.group(4)).map(_.toInt).getOrElse(0)))
      else if (m.group(5) != null)
        Clause(mod.contains("-"), mod.contains("+"), field, Range(m.group(5), m.group(6)))
      else {
        val w = m.group(7)
        if (mod.isEmpty && field.isEmpty && w == "AND") And
        else if (mod.isEmpty && field.isEmpty && w == "OR") Or
        else if (mod.isEmpty && field.isEmpty && w == "NOT") Not
        else Clause(mod.contains("-"), mod.contains("+"), field, Word(w))
      }
    }.toSeq
    // reject what the flat grammar can't represent, loudly
    val stripped = q.replaceAll(TokRx.regex, " ")
    if (stripped.exists(c => c == '(' || c == ')'))
      fail("parentheses/nested groups are not supported — use searchBool/BoolQuerySpec")
    toks
  }

  /** Parse `q` into a [[BoolQuerySpec]] runnable via `searchManyBool`
    * (or [[run]]). Throws IllegalArgumentException on constructs the
    * flat bool surface can't represent.
    */
  def parse(q: String, schema: Schema = Schema()): BoolQuerySpec = {
    val toks = lex(q)
    var seenAnd = false
    var seenOr = false
    var negNext = false
    val clauses = Seq.newBuilder[Clause]
    toks.foreach {
      case And => seenAnd = true
      case Or => seenOr = true
      case Not => negNext = true
      case c: Clause =>
        clauses += (if (negNext) c.copy(neg = true) else c)
        negNext = false
    }
    if (negNext) fail("dangling NOT")
    if (seenAnd && seenOr)
      fail("mixed AND/OR without parentheses is ambiguous — use searchBool")

    var filters = Vector.empty[(String, String)]
    var mustNot = Vector.empty[(String, String)]
    var mustNotText = Vector.empty[(String, String)]
    var numericRanges = Vector.empty[(String, Long, Long)]
    var ranges = Vector.empty[(String, String, String)]
    var exists = Vector.empty[String]
    var missing = Vector.empty[String]
    var phrase: Option[(String, String, Int)] = None // (field, words, slop)
    var required = Vector.empty[(String, String)] // (field, word)
    var optional = Vector.empty[(String, String)]

    def textFieldOf(f: Option[String]): String = f match {
      case None => "text"
      case Some(x) if x == "text" || schema.textFields.contains(x) => x
      case Some(x) => fail(s"unknown field '$x' — declare it in Schema " +
        "(keywordFields/numericFields/textFields)")
    }

    clauses.result().foreach { c =>
      (c.field, c.kind) match {
        case (Some("_exists_"), Word(f)) =>
          if (c.neg) missing :+= f else exists :+= f
        case (Some(f), Word(w)) if schema.keywordFields.contains(f) =>
          if (c.neg) mustNot :+= (f -> w) else filters :+= (f -> w)
        case (Some(f), Range(lo, hi)) if schema.numericFields.contains(f) =>
          if (c.neg) fail("negated ranges are not supported")
          val l = if (lo == "*") 0L else lo.toLongOption.getOrElse(
            fail(s"numeric range endpoint '$lo' is not a Long"))
          val h = if (hi == "*") Long.MaxValue else hi.toLongOption.getOrElse(
            fail(s"numeric range endpoint '$hi' is not a Long"))
          numericRanges :+= ((f, l, h))
        case (Some(f), Range(lo, hi)) if schema.keywordFields.contains(f) =>
          if (c.neg) fail("negated ranges are not supported")
          ranges :+= ((f, lo, hi))
        case (None, Range(_, _)) => fail("a range needs a field: field:[lo TO hi]")
        case (f, Phrase(words, slop)) =>
          if (c.neg) fail("negated phrases are not supported")
          if (phrase.isDefined) fail("at most one phrase per query")
          phrase = Some((textFieldOf(f), words, slop))
        case (f, Word(w)) =>
          if (w.exists(ch => ch == '*' || ch == '?'))
            fail(s"wildcard '$w' — use searchWildcard/searchPhrasePrefix")
          if (w.contains("^")) fail(s"boost '$w' — use multiMatch field boosts")
          val tf = textFieldOf(f)
          if (c.neg) mustNotText :+= (tf -> w)
          else if (c.req) required :+= (tf -> w)
          else optional :+= (tf -> w)
        case (Some(f), Range(_, _)) =>
          fail(s"field '$f' has no declared range type — declare it in Schema")
      }
    }

    val allAnd = seenAnd || schema.defaultOperator == "AND"
    phrase match {
      case Some((f, words, slop)) =>
        if (required.nonEmpty || optional.nonEmpty)
          fail("a phrase cannot mix with loose scored words — use searchManyBool")
        BoolQuerySpec(words, field = f, phrase = true, phraseSlop = slop,
          filters = filters, mustNot = mustNot, mustNotText = mustNotText,
          numericRangeFilters = numericRanges, rangeFilters = ranges,
          exists = exists, missing = missing)
      case None =>
        // `+`-required words form a conjunctive must group, the rest
        // stay optional should clauses; AND (or defaultOperator AND)
        // makes everything required — the Lucene modifier model
        val (qWords, sWords, conj) =
          if (allAnd) (required ++ optional, Vector.empty[(String, String)], true)
          else if (required.nonEmpty) (required, optional, true)
          else (optional, Vector.empty[(String, String)], false)
        if (qWords.isEmpty)
          fail("no scoring clause — the engine's bool query needs ≥1 match " +
            "term (a filter-only query has no ranking)")
        val fields = (qWords ++ sWords).map(_._1).distinct
        if (fields.size > 1)
          fail(s"scored words target multiple fields ${fields.mkString(", ")} — " +
            "use multiMatch or searchManyBool")
        BoolQuerySpec(qWords.map(_._2).mkString(" "),
          field = fields.head,
          conjunctive = conj && qWords.size > 1,
          should = sWords.map(_._2).mkString(" "),
          filters = filters, mustNot = mustNot, mustNotText = mustNotText,
          numericRangeFilters = numericRanges, rangeFilters = ranges,
          exists = exists, missing = missing)
    }
  }
}
