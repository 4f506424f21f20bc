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

  test("strict mode (no -A): a non-empty unparseable date makes the line invalid") {
    // reference parity: without autocorrect, CsvReader counts 'garbage'
    // as a parsingError -> "No data imported" (CsvReader.java:331-339)
    val path = writeFixture("catalog-de.txt", germanCatalog)
    val r = CatalogIngest.readCatalog(spark, path)
    assert(r.dataLines == 4)
    assert(r.invalidDataLines == 1) // b.tif's 'garbage' lastChanged
    assert(!r.importable)
  }

  test("autocorrect: cross-repair, LAST duplicate occurrence wins, counters") {
    val path = writeFixture("catalog-de2.txt", germanCatalog)
    val r = CatalogIngest.readCatalog(spark, path, autocorrect = true)
    assert(r.dataLines == 4)
    assert(r.invalidDataLines == 0)
    assert(r.lostLines == 1) // duplicate path dropped
    assert(r.importable)
    val rows = r.records.orderBy("name")
      .select("name", "path", "sizeInBytes", "created", "lastChanged", "resourceType")
      .as[(String, String, Long, String, String, String)].collect()
    assert(rows.map(_._1).toSeq.contains("c.pdf"))
    // duplicate path /arch/a.jpg: the LAST line (a2.jpg) survives, as the
    // reference's upsert-by-_id=path would leave the last bulk write
    val a = rows.find(_._2 == "/arch/a.jpg").get
    assert(a._1 == "a2.jpg" && a._3 == 1L && a._4 == "05.03.2021 00:00:00")
    val b = rows.find(_._1 == "b.tif").get
    // F7 cross-repair: lastChanged unparseable → copied from created
    assert(b._4 == "05.03.2021 00:00:00" && b._5 == "05.03.2021 00:00:00")
    assert(b._3 == 4096L)
  }

  test("autocorrect keeps a both-unparseable-dates row with cleared dates") {
    val content = Seq(
      Seq("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume").mkString("\t"),
      "x.jpg\t/p/x.jpg\t(10 Bytes)\tgarbage1\tgarbage2\tk\tc\tv"
    ).mkString("\r")
    val r = CatalogIngest.readCatalog(spark, writeFixture("catalog-bothbad.txt", content),
      autocorrect = true)
    assert(r.dataLines == 1 && r.invalidDataLines == 0 && r.importable)
    val row = r.records.select("name", "created", "lastChanged")
      .as[(String, String, String)].head()
    assert(row._1 == "x.jpg" && row._2 == null && row._3 == null)
  }

  test("a data line equal to the header text survives (only line 1 is the header)") {
    val hdr = Seq("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume").mkString("\t")
    val content = Seq(
      hdr,
      "ok.jpg\t/p/ok.jpg\t(10 Bytes)\t05.03.2021\t05.03.2021\tk\tc\tv",
      hdr // a repeated header: a data row whose text equals the header
    ).mkString("\r")
    val r = CatalogIngest.readCatalog(spark, writeFixture("catalog-hdr2.txt", content))
    // the repeated header is a DATA line (arity matches) whose dates are
    // non-empty and unparseable -> invalid, not silently dropped
    assert(r.dataLines == 2 && r.invalidDataLines == 1)
  }

  test("failOnDuplicates reproduces the reference's duplicate-path hard stop") {
    val path = writeFixture("catalog-dup.txt", germanCatalog)
    val e = intercept[IllegalStateException] {
      CatalogIngest.readCatalog(spark, path, autocorrect = true, failOnDuplicates = true)
    }
    assert(e.getMessage.contains("Duplicate paths"))
  }

  test("empty non-path field counts potentiallyInvalid and blocks the import") {
    val content = Seq(
      Seq("Name", "Path", "Size", "Date Created", "Date Modified", "Kind", "Catalog", "Volume").mkString("\t"),
      "\t/p/1\t(10 Bytes)\t05.03.2021\t05.03.2021\tk\tc\tv" // empty Name
    ).mkString("\r")
    val r = CatalogIngest.readCatalog(spark, writeFixture("catalog-emptyname.txt", content))
    assert(r.invalidDataLines == 0 && r.potentiallyInvalidDataLines == 1 && !r.importable)
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

  test("scan mode content strategy: magic-byte MIME sniff (S6 strategy 2)") {
    val dir = Paths.get(TestSpark.tmpRoot, "sniff")
    Files.createDirectories(dir)
    // a real 1x1 PNG via ImageIO, a fake 'jpg' that is actually a PDF,
    // and an unknown blob
    val img = new java.awt.image.BufferedImage(1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    Files.write(dir.resolve("real.png"), bos.toByteArray)
    Files.write(dir.resolve("liar.jpg"), "%PDF-1.4 fake".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("blob.bin"), Array[Byte](1, 2, 3, 4))
    val rows = CatalogIngest.scanDirectory(spark, dir.toString, mimeStrategy = "content")
      .select("name", "mime", "resourceType").as[(String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("real.png") == (("image/png", "png")))
    assert(rows("liar.jpg") == (("application/pdf", "pdf"))) // content wins over extension
    assert(rows("blob.bin") == (("application/octet-stream", "octet-stream")))
  }
}
