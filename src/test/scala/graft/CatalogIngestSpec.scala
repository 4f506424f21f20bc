package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.compat.CatalogIngest

/** End-to-end reference ETL compat (FIXTURES.md §3): NeoFinder TSV
  * exports with bilingual headers, size strings, multi-format dates,
  * broken lines, duplicate paths.
  */
class CatalogIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(name: String, content: String): String = {
    val p = Paths.get(TestSpark.tmpRoot, name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private val germanCatalog = Seq(
    Seq("Name", "Pfad", "Größe", "Erstelldatum", "Änderungsdatum", "Art", "Katalog", "Name des Volumes"),
    Seq("a.jpg", "/arch/a.jpg", "1.23 MB (1,289,748 Bytes)", "05.03.2021 10:11:12", "06.03.2021 11:12:13", "Bild", "K1", "Vol1"),
    Seq("b.tif", "/arch/b.tif", "4 KB (4.096 Bytes)", "2021-03-05", "garbage", "Bild", "K1", "Vol1"),
    Seq("c.pdf", "/arch/c.pdf", "(100 Bytes)", "03/05/2021 10:11:12", "03/06/2021 10:11:12", "Dokument", "K1", "Vol1"),
    Seq("a2.jpg", "/arch/a.jpg", "(1 Bytes)", "05.03.2021", "05.03.2021", "Bild", "K1", "Vol1") // duplicate path
  ).map(_.mkString("\t")).mkString("\r")

  test("catalog mode: bilingual header, normalization, dedup, counters") {
    val path = writeFixture("catalog-de.txt", germanCatalog)
    val r = CatalogIngest.readCatalog(spark, path)
    assert(r.dataLines == 4)
    assert(r.invalidDataLines == 0)
    assert(r.lostLines == 1) // duplicate path dropped
    assert(r.importable)
    val rows = r.records.orderBy("name")
      .select("name", "path", "sizeInBytes", "created", "lastChanged", "resourceType")
      .as[(String, String, Long, String, String, String)].collect()
    assert(rows.map(_._1).toSeq.contains("c.pdf"))
    val a = rows.find(_._2 == "/arch/a.jpg").get
    assert(a._3 == 1289748L && a._4 == "05.03.2021 10:11:12")
    val b = rows.find(_._1 == "b.tif").get
    // F7 cross-repair: lastChanged unparseable → copied from created
    assert(b._4 == "05.03.2021 00:00:00" && b._5 == "05.03.2021 00:00:00")
    assert(b._3 == 4096L)
  }

  test("LF-stripping clean pass collapses multi-line quoted fields") {
    val content = Seq(
      Seq("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume").mkString("\t"),
      "multi\nline name\tp1\t(10 Bytes)\t05.03.2021\t05.03.2021\tk\tc\tv"
    ).mkString("\r")
    val path = writeFixture("catalog-lf.txt", content)
    val r = CatalogIngest.readCatalog(spark, path)
    assert(r.dataLines == 1 && r.importable)
    assert(r.records.select("name").as[String].head() == "multiline name")
  }

  test("autocorrect reassembles records broken across lines") {
    val content = Seq(
      Seq("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume").mkString("\t"),
      "ok.jpg\t/p/ok.jpg\t(10 Bytes)\t05.03.2021\t05.03.2021\tk\tc\tv",
      "broken.jpg\t/p/broken.jpg\t(20 Bytes)", // record continues on next lines
      "\t05.03.2021\t05.03.2021",
      "\tk\tc\tv"
    ).mkString("\r")
    val path = writeFixture("catalog-broken.txt", content)
    val strict = CatalogIngest.readCatalog(spark, path, autocorrect = false)
    assert(strict.dataLines == 1) // broken fragments fail the arity filter
    val fixed = CatalogIngest.readCatalog(spark, path, autocorrect = true)
    assert(fixed.dataLines == 2 && fixed.importable)
    assert(fixed.records.filter($"name" === "broken.jpg").count() == 1)
  }

  test("empty path is invalid and blocks the import (all-or-nothing gate)") {
    val content = Seq(
      Seq("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume").mkString("\t"),
      "x.jpg\t\t(10 Bytes)\t05.03.2021\t05.03.2021\tk\tc\tv"
    ).mkString("\r")
    val r = CatalogIngest.readCatalog(spark, writeFixture("catalog-bad.txt", content))
    assert(r.invalidDataLines == 1 && !r.importable)
  }

  test("minimal path+volume import mode") {
    val content = Seq(
      Seq("Pfad", "Volume").mkString("\t"),
      "/p/1\tV", "/p/2\tV"
    ).mkString("\r")
    val r = CatalogIngest.readCatalog(spark, writeFixture("catalog-min.txt", content),
      minimalPathVolume = true)
    assert(r.dataLines == 2 && r.importable && r.records.count() == 2)
  }

  test("scan mode: one record per file with size/type/date metadata") {
    val dir = Paths.get(TestSpark.tmpRoot, "scantree/sub")
    Files.createDirectories(dir)
    Files.write(dir.resolve("photo.JPG"), Array.fill[Byte](2048)(1))
    Files.write(dir.resolve("noext"), Array.fill[Byte](10)(2))
    val df = CatalogIngest.scanDirectory(spark, s"${TestSpark.tmpRoot}/scantree",
      catalog = "host1", volume = "vol1")
    val rows = df.select("name", "sizeInBytes", "resourceType", "catalog", "volume")
      .as[(String, Long, String, String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("noext", "photo.JPG"))
    assert(rows.find(_._1 == "photo.JPG").get._2 == 2048L)
    assert(rows.find(_._1 == "photo.JPG").get._3 == "jpg")
    assert(rows.find(_._1 == "noext").get._3 == "unknown")
    assert(rows.forall(r => r._4 == "host1" && r._5 == "vol1"))
  }
}
