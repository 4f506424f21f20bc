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
    /** Reference gate: any invalid line ⇒ "No data imported". */
    def importable: Boolean = invalidDataLines == 0
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
    * reassembly (F3) → typed normalization (F4/F6/F7) → per-field
    * validation (P5/P6) → dedup-by-path keeping first (A3) → counters
    * (A1) and the all-or-nothing gate.
    */
  def readCatalog(
      spark: SparkSession,
      path: String,
      autocorrect: Boolean = false,
      ignoreFields: Set[String] = Set.empty,
      minimalPathVolume: Boolean = false
  ): IngestResult = {
    import spark.implicits._
    val cleaned = cleanLines(spark, path)
    val header = cleaned.head() // T2: first row = header
    val headerCols = header.split("\t", -1)
    val headerTabs = headerCols.length - 1
    val rawLines = {
      val noHeader = cleaned.filter(l => l != header)
      if (autocorrect) reassembleLines(noHeader, headerTabs) else noHeader
    }
    val optional: Set[String] =
      if (minimalPathVolume)
        Set("name", "size", "created", "lastChanged", "resourceType", "catalog")
      else Set.empty

    val cells = rawLines.map(_.split("\t", -1)).toDF("cells")
    // P3/P4: only rows with exactly the header arity are data rows
    val arityOk = cells.withColumn("__arity_ok", size(col("cells")) === lit(headerCols.length))
    val wide = arityOk.filter(col("__arity_ok"))
      .select(headerCols.zipWithIndex.map { case (c, i) =>
        element_at(col("cells"), i + 1).as(c)
      }: _*)
    val bound = CatalogCompat.bindHeaders(wide, optional)

    val datesIgnored = minimalPathVolume ||
      ignoreFields.contains("created") || ignoreFields.contains("lastChanged")
    val (createdFix, lastChangedFix, bothBad) =
      CatalogCompat.crossRepair(col("created"), col("lastChanged"))
    val normalized = bound
      .withColumn("sizeInBytes", CatalogCompat.sizeToBytes(col("size")))
      .withColumn("createdTs", if (datesIgnored) lit(null).cast("timestamp") else createdFix)
      .withColumn("lastChangedTs", if (datesIgnored) lit(null).cast("timestamp") else lastChangedFix)
      .withColumn("created", CatalogCompat.formatRefDate(col("createdTs")))
      .withColumn("lastChanged", CatalogCompat.formatRefDate(col("lastChangedTs")))
      .drop("createdTs", "lastChangedTs")
      .withColumn("__dateInvalid", if (datesIgnored) lit(false) else bothBad)
      .withColumn("__emptyPath", coalesce(col("path"), lit("")) === lit(""))
      .withColumn("__emptyAny",
        CatalogCompat.headerSynonyms.map(_._1).filterNot(optional.contains)
          .map(f => coalesce(col(f).cast("string"), lit("")) === lit(""))
          .reduce(_ || _))
      .cache()

    val dataLines = normalized.count()
    val invalid = normalized.filter(col("__dateInvalid") || col("__emptyPath")).count()
    val potentiallyInvalid = normalized.filter(col("__emptyAny")).count()

    // A3: duplicate path detection — first-seen wins (file order ≙
    // ascending line position; here: deterministic min over the dup set)
    val deduped = normalized
      .filter(!col("__dateInvalid") && !col("__emptyPath"))
      .dropDuplicates("path")
    val lost = dataLines - invalid - deduped.count()

    IngestResult(
      deduped.drop("__dateInvalid", "__emptyPath", "__emptyAny", "__arity_ok"),
      dataLines, invalid, potentiallyInvalid, lost)
  }

  /** Scan-mode ingest (≙ default mode, SURVEY.md §3.2): one record per
    * file under a directory tree, with name/path/size/dates and an
    * extension-derived resource type (S5/S6/F5/F9). `binaryFile` lists
    * distributedly; content is NOT read (`content` column pruned away).
    */
  def scanDirectory(spark: SparkSession, dir: String,
      catalog: String = "localhost", volume: String = ""): DataFrame = {
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(dir)
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("path"),
        CatalogCompat.humanSize(col("length")).as("size"),
        col("length").as("sizeInBytes"),
        CatalogCompat.formatRefDate(col("modificationTime")).as("lastChanged"),
        CatalogCompat.formatRefDate(col("modificationTime")).as("created"),
        lower(when(col("path").rlike("\\.[A-Za-z0-9]+$"),
          regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).otherwise(lit("unknown")))
          .as("resourceType"),
        lit(catalog).as("catalog"),
        (if (volume.nonEmpty) lit(volume) else lit(dir)).as("volume"))
  }
}
