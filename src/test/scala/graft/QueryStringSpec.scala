package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{BoolQuerySpec, QueryString}

/** Pure parser tests: the query_string mini-language compiles to
  * exactly the BoolQuerySpec the structured API would take.
  */
class QueryStringSpec extends AnyFunSuite {
  private val schema = QueryString.Schema(
    keywordFields = Set("role", "lang", "source"),
    numericFields = Set("dl", "n_chars"),
    textFields = Set("title"))

  test("bare words -> OR match on the main field") {
    assert(QueryString.parse("hello world", schema)
      == BoolQuerySpec("hello world"))
  }

  test("AND makes every word required; defaultOperator=AND likewise") {
    assert(QueryString.parse("hello AND world", schema)
      == BoolQuerySpec("hello world", conjunctive = true))
    assert(QueryString.parse("hello world", schema.copy(defaultOperator = "AND"))
      == BoolQuerySpec("hello world", conjunctive = true))
  }

  test("+required words form the must group, the rest stay should") {
    assert(QueryString.parse("+zanzibar the quasar", schema)
      == BoolQuerySpec("zanzibar", should = "the quasar"))
    assert(QueryString.parse("+a +b c", schema)
      == BoolQuerySpec("a b", conjunctive = true, should = "c"))
  }

  test("-word and NOT word exclude analyzed text") {
    assert(QueryString.parse("hello -world", schema)
      == BoolQuerySpec("hello", mustNotText = Seq("text" -> "world")))
    assert(QueryString.parse("hello NOT world", schema)
      == BoolQuerySpec("hello", mustNotText = Seq("text" -> "world")))
  }

  test("keyword/numeric field clauses compile to filter context") {
    assert(QueryString.parse("hello role:user -lang:fr", schema)
      == BoolQuerySpec("hello", filters = Seq("role" -> "user"),
        mustNot = Seq("lang" -> "fr")))
    assert(QueryString.parse("hello dl:[30 TO 80]", schema)
      == BoolQuerySpec("hello", numericRangeFilters = Seq(("dl", 30L, 80L))))
    assert(QueryString.parse("hello dl:[* TO 80]", schema)
      == BoolQuerySpec("hello", numericRangeFilters = Seq(("dl", 0L, 80L))))
    assert(QueryString.parse("hello role:[a TO u]", schema)
      == BoolQuerySpec("hello", rangeFilters = Seq(("role", "a", "u"))))
  }

  test("phrases, fielded matches, exists") {
    assert(QueryString.parse("\"merge sort\"~2 role:user", schema)
      == BoolQuerySpec("merge sort", phrase = true, phraseSlop = 2,
        filters = Seq("role" -> "user")))
    assert(QueryString.parse("title:hello title:world", schema)
      == BoolQuerySpec("hello world", field = "title"))
    assert(QueryString.parse("title:\"hello world\"", schema)
      == BoolQuerySpec("hello world", field = "title", phrase = true))
    assert(QueryString.parse("hello _exists_:title -_exists_:tool", schema)
      == BoolQuerySpec("hello", exists = Seq("title"), missing = Seq("tool")))
  }

  test("unsupported constructs fail loudly") {
    def bad(q: String): String =
      intercept[IllegalArgumentException](QueryString.parse(q, schema)).getMessage
    assert(bad("(a OR b) AND c").contains("parentheses"))
    assert(bad("a AND b OR c").contains("mixed AND/OR"))
    assert(bad("role:user").contains("no scoring clause"))
    assert(bad("wild*card").contains("wildcard"))
    assert(bad("hello title:world").contains("multiple fields"))
    assert(bad("\"a phrase\" loose").contains("phrase"))
    assert(bad("nosuch:value").contains("unknown field"))
    assert(bad("hello NOT").contains("dangling NOT"))
    assert(bad("[1 TO 2]").contains("range needs a field"))
    assert(bad("hello -dl:[1 TO 2]").contains("negated ranges"))
  }
}
