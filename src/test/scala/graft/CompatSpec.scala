package graft

import org.apache.spark.sql.functions._

import graft.compat.CatalogCompat

/** Reference ETL compat semantics (SURVEY.md §2.3 F4/F6/F7, §2.2 P1) —
  * each reference format example as a case (FIXTURES.md §3).
  */
class CompatSpec extends SparkSpec {
  import spark.implicits._

  test("F4 size-string parse: '(N Bytes)' suffix, grouping stripped") {
    val got = Seq(
      "1.23 MB (1,289,748 Bytes)",
      "4 KB (4.096 Bytes)", // German grouping
      "Zero (0 Bytes)",
      "no size here",
      ""
    ).toDF("s").select(CatalogCompat.sizeToBytes($"s")).as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(1289748L), Some(4096L), Some(0L), None, None))
  }

  test("F6 multi-format date parse, date-only → midnight, normalized form") {
    val got = Seq(
      "05.03.2021 10:11:12",
      "2021-03-05 10:11:12",
      "03/05/2021 10:11:12",
      "05.03.2021",
      "2021-03-05",
      "03/05/2021",
      "garbage",
      ""
    ).toDF("s")
      .select(CatalogCompat.formatRefDate(CatalogCompat.parseMultiDate($"s")))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(
      Some("05.03.2021 10:11:12"), Some("05.03.2021 10:11:12"), Some("05.03.2021 10:11:12"),
      Some("05.03.2021 00:00:00"), Some("05.03.2021 00:00:00"), Some("05.03.2021 00:00:00"),
      None, None))
  }

  test("F7 cross-repair: one valid date fills the other; both invalid flagged") {
    val df = Seq(
      ("05.03.2021 10:11:12", "bad"),
      ("bad", "2021-03-05 10:11:12"),
      ("bad", "bad"),
      ("01.01.2020 00:00:01", "02.02.2020 00:00:02")
    ).toDF("created", "lastChanged")
    val (c, l, invalid) = CatalogCompat.crossRepair($"created", $"lastChanged")
    val got = df.select(CatalogCompat.formatRefDate(c), CatalogCompat.formatRefDate(l), invalid)
      .as[(Option[String], Option[String], Boolean)].collect().toSeq
    assert(got(0) == ((Some("05.03.2021 10:11:12"), Some("05.03.2021 10:11:12"), false)))
    assert(got(1) == ((Some("05.03.2021 10:11:12"), Some("05.03.2021 10:11:12"), false)))
    assert(got(2) == ((None, None, true)))
    assert(got(3) == ((Some("01.01.2020 00:00:01"), Some("02.02.2020 00:00:02"), false)))
  }

  test("P1 bilingual header binding: first matching synonym wins; missing field fails") {
    val de = Seq(("f.jpg", "/a/f.jpg", "1 KB (1.024 Bytes)", "01.01.2020", "02.02.2020",
      "Bild", "Kat", "Vol")).toDF(
      "Name", "Pfad", "Größe", "Erstelldatum", "Änderungsdatum", "Art", "Katalog", "Name des Volumes")
    val bound = CatalogCompat.bindHeaders(de)
    assert(bound.columns.toSeq == Seq("name", "path", "size", "created", "lastChanged",
      "resourceType", "catalog", "volume"))
    assert(bound.select("path").as[String].head() == "/a/f.jpg")

    val en = Seq(("f.jpg", "/a/f.jpg", "x", "d", "d2", "Kind", "Cat", "Vol", "extra"))
      .toDF("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume", "Junk")
    assert(CatalogCompat.bindHeaders(en).select("resourceType").as[String].head() == "Kind")

    val broken = Seq(("a", "b")).toDF("Name", "Junk")
    val e = intercept[IllegalArgumentException](CatalogCompat.bindHeaders(broken))
    assert(e.getMessage.contains("Invalid header"))
    // minimal path+volume import (--iknowiamonlyimportingpathandvolume)
    val minimal = Seq(("p", "v")).toDF("Pfad", "Volume")
    val mb = CatalogCompat.bindHeaders(minimal,
      optional = Set("name", "size", "created", "lastChanged", "resourceType", "catalog"))
    assert(mb.select("path").as[String].head() == "p")
  }

  test("human size formatting") {
    val got = Seq(512L, 2048L, 1289748L).toDF("b")
      .select(CatalogCompat.humanSize($"b")).as[String].collect().toSeq
    assert(got == Seq("512 B", "2.0 KB", "1.23 MB"))
  }
}
