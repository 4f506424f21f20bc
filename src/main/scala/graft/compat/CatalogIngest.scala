package graft.compat

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ETL half end-to-end, Spark-native (SURVEY.md §2.1–2.2,
  * §3.1–3.2): a user of NeoFinderToES can point this at the same
  * NeoFinder/CDFinder TSV catalog exports (or a directory tree) and get
  * the same normalized records the reference bulk-ships to Elasticsearch
  * — here as a DataFrame ready for any sink, including the fulltext
  * IndexBuilder.
  */
object CatalogIngest {

  /** Result of a catalog read: normalized records + validation counters
    * (≙ CsvReader's potentiallyInvalidDataLines / invalidDataLines /
    * lostLines and the all-or-nothing gate, CsvReader.java:264-282).
    */
  final case class IngestResult(
      records: DataFrame,
      dataLines: Long,
      invalidDataLines: Long,
      potentiallyInvalidDataLines: Long,
      lostLines: Long
  ) {
    /** Reference gate: any invalid OR potentially-invalid line refuses
      * the import ("No data imported", CsvReader.java:264-282 — the
      * potentiallyInvalid check is at CsvReader.java:268-272).
      */
    def importable: Boolean = invalidDataLines == 0 && potentiallyInvalidDataLines == 0
  }

  /** S3 (CsvReader.java:82-101): the reference strips every LF during its
    * pre-scan clean pass, leaving CR-terminated records — collapsing
    * multi-line quoted fields. Spark-native: read CR-or-LF-terminated
    * lines with a custom delimiter after dropping LFs inside text.
    */
  def cleanLines(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.option("lineSep", "\r").textFile(path)
      .map(_.replace("\n", ""))
      .filter(_.nonEmpty)
  }

  private def tabCount(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) { if (s.charAt(i) == '\t') n += 1; i += 1 }
    n
  }

  /** F3 (CsvReader.java:182-250): autocorrect line reassembly — records
    * broken across physical lines are concatenated until the tab arity
    * matches the header; a line with fewer tabs than needed absorbs the
    * following line(s). Sequential by nature within a file; files are
    * small (catalog exports), so each file is one partition and the merge
    * runs in a single mapPartitions pass — the distributed unit is the
    * file, as in the reference (one CsvReader per file).
    */
  def reassembleLines(lines: Dataset[String], headerTabs: Int): Dataset[String] = {
    import lines.sparkSession.implicits._
    lines.coalesce(1).mapPartitions { it =>
      new Iterator[String] {
        private val in = it.buffered
        override def hasNext: Boolean = in.hasNext
        override def next(): String = {
          var cur = in.next()
          while (tabCount(cur) < headerTabs && in.hasNext) cur = cur + in.next()
          cur
        }
      }
    }
  }

  /** Catalog-mode ingest (≙ `NeoFinderToES -c`, SURVEY.md §3.1): clean →
    * header synonym binding (P1/P2) → arity filters (P3/P4) → optional
    * reassembly (F3) → typed normalization (F4/F6; F7 cross-repair only
    * under autocorrect, matching the reference's -A flag) → per-field
    * validation (P5/P6) → dedup-by-path keeping the LAST occurrence (A3;
    * the reference bulk-indexes every duplicate with _id = path so the
    * final ES doc is the last write) → counters (A1) and the
    * all-or-nothing gate.
    *
    * `failOnDuplicates = true` reproduces the reference's default hard
    * stop on duplicate paths (exit 5 unless interactively confirmed,
    * CsvReader.java:361-376); false (default here — a library has no
    * interactive prompt) keeps the last occurrence and counts lostLines.
    */
  def readCatalog(
      spark: SparkSession,
      path: String,
      autocorrect: Boolean = false,
      ignoreFields: Set[String] = Set.empty,
      minimalPathVolume: Boolean = false,
      failOnDuplicates: Boolean = false
  ): IngestResult = {
    import spark.implicits._
    val cleaned = cleanLines(spark, path)
    val header = cleaned.head() // T2: first row = header
    val headerCols = header.split("\t", -1)
    val headerTabs = headerCols.length - 1
    // Drop exactly the FIRST line (reference skip(1)): a data row that
    // happens to equal the header text, or repeated headers from
    // concatenated exports, must remain data lines and face validation
    // (round-1 filtered every header-equal line out silently). offset(1)
    // skips exactly one row in partition order — the file's line order
    // for a lineSep text read (input_hint's no-RDD rule: the round-3
    // zipWithIndex dropped out of Dataset land for this one operation).
    val noHeader = cleaned.offset(1)
    val rawLines = if (autocorrect) reassembleLines(noHeader, headerTabs) else noHeader
    val optional: Set[String] =
      if (minimalPathVolume)
        Set("name", "size", "created", "lastChanged", "resourceType", "catalog")
      else Set.empty

    // __pos: line position for last-wins duplicate resolution (ordering
    // is partition-major = file order for a single export file)
    val cells = rawLines.map(_.split("\t", -1)).toDF("cells")
      .withColumn("__pos", monotonically_increasing_id())
    // P3/P4: only rows with exactly the header arity are data rows
    val arityOk = cells.withColumn("__arity_ok", size(col("cells")) === lit(headerCols.length))
    val wide = arityOk.filter(col("__arity_ok"))
      .select(col("__pos") +: headerCols.zipWithIndex.map { case (c, i) =>
        element_at(col("cells"), i + 1).as(c)
      }: _*)
    val bound = CatalogCompat.bindHeaders(wide, optional, passThrough = Seq("__pos"))

    val datesIgnored = minimalPathVolume ||
      ignoreFields.contains("created") || ignoreFields.contains("lastChanged")
    // Date semantics follow the reference's autocorrect flag
    // (CsvReader.java:331-339): with -A, a one-sided parse failure is
    // cross-repaired from the other date (F7) and a both-sided failure
    // KEEPS the row with cleared dates; without -A, any non-empty
    // unparseable date makes the line invalid (parsingErrors -> "No data
    // imported").
    val (createdFix, lastChangedFix, dateInvalid) =
      if (autocorrect) {
        val (c, l, _) = CatalogCompat.crossRepair(col("created"), col("lastChanged"))
        (c, l, lit(false))
      } else {
        val c = CatalogCompat.parseMultiDate(col("created"))
        val l = CatalogCompat.parseMultiDate(col("lastChanged"))
        (c, l,
          (coalesce(col("created"), lit("")) =!= lit("") && c.isNull) ||
          (coalesce(col("lastChanged"), lit("")) =!= lit("") && l.isNull))
      }
    val normalized = bound
      // empty-value checks look at the SOURCE fields (a date cleared by
      // autocorrect normalization is not an empty source value)
      .withColumn("__emptyPath", coalesce(col("path"), lit("")) === lit(""))
      .withColumn("__emptyAny",
        CatalogCompat.headerSynonyms.map(_._1).filterNot(optional.contains)
          .map(f => coalesce(col(f).cast("string"), lit("")) === lit(""))
          .reduce(_ || _))
      // __dateInvalid too: evaluated before created/lastChanged are
      // overwritten with their normalized forms
      .withColumn("__dateInvalid", if (datesIgnored) lit(false) else dateInvalid)
      .withColumn("sizeInBytes", CatalogCompat.sizeToBytes(col("size")))
      .withColumn("createdTs", if (datesIgnored) lit(null).cast("timestamp") else createdFix)
      .withColumn("lastChangedTs", if (datesIgnored) lit(null).cast("timestamp") else lastChangedFix)
      .withColumn("created", CatalogCompat.formatRefDate(col("createdTs")))
      .withColumn("lastChanged", CatalogCompat.formatRefDate(col("lastChangedTs")))
      .drop("createdTs", "lastChangedTs")
      .cache()

    val dataLines = normalized.count()
    val invalid = normalized.filter(col("__dateInvalid") || col("__emptyPath")).count()
    val potentiallyInvalid = normalized.filter(col("__emptyAny")).count()

    // A3: duplicate-path resolution — LAST occurrence wins, explicitly
    // by line position (reference parity: each dup is upserted with
    // _id = path, so the file's last write is the surviving document)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("__pos").desc)
    val deduped = normalized
      .filter(!col("__dateInvalid") && !col("__emptyPath"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === lit(1))
      .drop("__rn")
    val lost = dataLines - invalid - deduped.count()
    if (failOnDuplicates && lost > 0)
      throw new IllegalStateException(
        s"Duplicate paths in catalog ($lost lines) — reference exit-5 semantics " +
          "(CsvReader.java:361-376); pass failOnDuplicates = false to keep last occurrences")

    IngestResult(
      deduped.drop("__dateInvalid", "__emptyPath", "__emptyAny", "__arity_ok", "__pos"),
      dataLines, invalid, potentiallyInvalid, lost)
  }

  /** S6 strategy 2 (≙ reference DirectoryCrawler.java:120-134, Tika
    * content inspection): magic-byte MIME sniff over the binaryFile
    * `content` column — pure column comparisons, codegen'd.
    */
  def sniffMime(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def magic(bytes: Int*): org.apache.spark.sql.Column =
      substring(content, 1, bytes.length) === lit(bytes.map(_.toByte).toArray)
    when(magic(0x89, 'P', 'N', 'G'), "image/png")
      .when(magic(0xFF, 0xD8, 0xFF), "image/jpeg")
      .when(magic('G', 'I', 'F', '8'), "image/gif")
      .when(magic('%', 'P', 'D', 'F'), "application/pdf")
      .when(magic('P', 'K', 0x03, 0x04), "application/zip")
      .when(magic('I', 'I', 0x2A, 0x00) || magic('M', 'M', 0x00, 0x2A), "image/tiff")
      .otherwise("application/octet-stream")
  }

  /** Scan-mode ingest (≙ default mode, SURVEY.md §3.2): one record per
    * file under a directory tree, with name/path/size/dates and a
    * resource type (S5/S6/F5/F9). `binaryFile` lists distributedly.
    * `mimeStrategy`:
    *   "extension" (default) — type from the filename; the `content`
    *     column is never referenced, so Catalyst prunes it and no file
    *     bytes are read (a pure metadata crawl).
    *   "content" — magic-byte sniff of the leading bytes (reference
    *     strategy 2); adds a `mime` column and derives resourceType
    *     from it. Reads file contents.
    */
  def scanDirectory(spark: SparkSession, dir: String,
      catalog: String = "localhost", volume: String = "",
      mimeStrategy: String = "extension"): DataFrame = {
    val base = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir)
    val extType = lower(when(col("path").rlike("\\.[A-Za-z0-9]+$"),
      regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).otherwise(lit("unknown")))
    val common = Seq(
      element_at(split(col("path"), "/"), -1).as("name"),
      col("path"),
      CatalogCompat.humanSize(col("length")).as("size"),
      col("length").as("sizeInBytes"),
      CatalogCompat.formatRefDate(col("modificationTime")).as("lastChanged"),
      CatalogCompat.formatRefDate(col("modificationTime")).as("created"))
    val tail = Seq(lit(catalog).as("catalog"),
      (if (volume.nonEmpty) lit(volume) else lit(dir)).as("volume"))
    mimeStrategy match {
      case "content" =>
        val mime = sniffMime(col("content"))
        base.select(common ++ Seq(
          element_at(split(mime, "/"), -1).as("resourceType"), mime.as("mime")) ++ tail: _*)
      case _ =>
        base.select(common ++ Seq(extType.as("resourceType")) ++ tail: _*)
    }
  }
}
