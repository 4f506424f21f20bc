package graft

/** The driver's smoke contract: entry() returns rows on sf0.001, and
  * every declared oracleSql key has a queries entry (never the reverse
  * situation where the driver tries to compare a missing result).
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; all names are well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle-only keys: ${o -- q}")
    assert(q.forall(_.matches("[a-z0-9_]+")))
  }

  test("every query runs and returns rows at sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
