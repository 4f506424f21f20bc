package graft.compat

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalog-compat scalar functions — the reference's ETL data-processing
  * semantics re-expressed as Catalyst columns (SURVEY.md §2.3, kept as a
  * compat module per §7.5 decision 7; not on the transcript hot path).
  */
object CatalogCompat {

  /** F4 (ArchivedFileInfo.java:180-186): parse the "(N Bytes)" suffix of
    * NeoFinder size strings like "1.23 MB (1,289,748 Bytes)" — extract
    * the grouped number, strip '.'/',' grouping, cast long.
    */
  def sizeToBytes(c: Column): Column =
    nullif(translate(regexp_extract(c, "\\(([0-9.,]+) B", 1), ".,", ""), lit(""))
      .cast("long")

  /** F5-adjacent: human-readable byte size (display helper). */
  def humanSize(bytes: Column): Column =
    when(bytes < lit(1024L), concat(bytes.cast("string"), lit(" B")))
      .otherwise(concat(
        round(bytes / pow(lit(1024.0), floor(log(1024.0, bytes))), 2).cast("string"),
        lit(" "),
        element_at(typedLit(Seq("B", "KB", "MB", "GB", "TB", "PB", "EB")),
          floor(log(1024.0, bytes)).cast("int") + 1)))

  /** F6 (ArchivedFileInfo.java:17-23,188-204): multi-format date parse —
    * dd.MM.yyyy[ HH:mm:ss], yyyy-MM-dd[ HH:mm:ss], MM/dd/yyyy[ HH:mm:ss];
    * date-only → midnight. Returns TimestampType or null.
    */
  def parseMultiDate(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("dd.MM.yyyy HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("MM/dd/yyyy HH:mm:ss")),
      try_to_timestamp(c, lit("dd.MM.yyyy")),
      try_to_timestamp(c, lit("yyyy-MM-dd")),
      try_to_timestamp(c, lit("MM/dd/yyyy"))
    )

  /** The reference's normalized date-string form (dd.MM.yyyy HH:mm:ss). */
  def formatRefDate(ts: Column): Column = date_format(ts, "dd.MM.yyyy HH:mm:ss")

  /** F7 (ArchivedFileInfo.java:108-158): autocorrect cross-repair — if
    * exactly one of created/lastChanged parses, copy it to the other;
    * returns (created', lastChanged', bothInvalid).
    */
  def crossRepair(created: Column, lastChanged: Column): (Column, Column, Column) = {
    val c = parseMultiDate(created)
    val l = parseMultiDate(lastChanged)
    (coalesce(c, l), coalesce(l, c), c.isNull && l.isNull)
  }

  /** P1 (Mapping.java:13-31): bilingual header-synonym binding — the
    * first matching synonym per target field wins.
    */
  val headerSynonyms: Seq[(String, Seq[String])] = Seq(
    "name" -> Seq("Name"),
    "path" -> Seq("Pfad", "Path"),
    "size" -> Seq("Größe", "Size"),
    "created" -> Seq("Erstelldatum", "Date Created"),
    "lastChanged" -> Seq("Änderungsdatum", "Date Modified"),
    "resourceType" -> Seq("Art", "Kind", "Media-Info"),
    "catalog" -> Seq("Katalog", "Catalog"),
    "volume" -> Seq("Name des Volumes", "Volume")
  )

  /** Project a raw catalog DataFrame onto the target schema by synonym
    * binding (≙ CsvReader.java:117-145); unknown columns pruned by
    * Catalyst for free. Throws if a required field is unbound ("Invalid
    * header" semantics), unless listed in `optional`. `passThrough`
    * columns (bookkeeping like line position) are kept as-is.
    */
  def bindHeaders(df: DataFrame, optional: Set[String] = Set.empty,
      passThrough: Seq[String] = Seq.empty): DataFrame = {
    val present = df.columns.toSeq
    val bound = headerSynonyms.flatMap { case (field, syns) =>
      syns.find(present.contains) match {
        case Some(s) => Some(col(s).as(field))
        case None if optional.contains(field) => Some(lit(null).cast("string").as(field))
        case None => throw new IllegalArgumentException(s"Invalid header: no column for '$field'")
      }
    }
    df.select(passThrough.filter(present.contains).map(col) ++ bound: _*)
  }
}
