package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.model._
import graft.query.Bm25

/** Deterministic cross-side term hash (build writes shard in Scala; the
  * query path computes the same shard for pruning without a Spark job).
  * FNV-1a 64 over UTF-8 bytes.
  */
object GraftHash {
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  def shardOf(term: String, numShards: Int): Int =
    java.lang.Math.floorMod(fnv1a64(term), numShards.toLong).toInt
}

/** On-disk index format version flag (`format.props` next to the
  * stores). Version 2 = exists markers ([[FieldTerms.existsTerm]]) are
  * emitted for every configured field column; an index WITHOUT the flag
  * predates them — an `exists` clause against it would return ZERO hits
  * and a `missing` clause would be silently dropped (inverted results),
  * so both searchers fail loudly instead (round-6 review).
  */
object IndexFormat {
  /** Current writer version. */
  val Version = 2
  /** Version implied by a missing flag file (pre-marker index). */
  val Legacy = 1

  private def flagPath(indexDir: String) = new Path(indexDir, "format.props")

  /** Stamp `indexDir` with `version` — ATOMIC overwrite rename via
    * FileContext (the SegmentCatalog pointer recipe): a plain
    * delete-then-rename would have a crash window in which the flag is
    * GONE and a marker-bearing index reads Legacy (round-7 review).
    */
  def write(fs: org.apache.hadoop.fs.FileSystem, indexDir: String,
      version: Int = Version): Unit = {
    val p = flagPath(indexDir)
    val tmp = new Path(indexDir, "format.props.tmp")
    val out = fs.create(tmp, true)
    out.write(s"formatVersion=$version\n".getBytes(StandardCharsets.UTF_8))
    out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, fs.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(p),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The index's format version ([[Legacy]] when unflagged). */
  def version(fs: org.apache.hadoop.fs.FileSystem, indexDir: String): Int = {
    val p = flagPath(indexDir)
    if (!fs.exists(p)) return Legacy
    val in = fs.open(p)
    val bytes = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    var r = in.read(buf)
    while (r > 0) { bytes.write(buf, 0, r); r = in.read(buf) }
    in.close()
    bytes.toString("UTF-8").linesIterator
      .collectFirst { case l if l.startsWith("formatVersion=") =>
        l.stripPrefix("formatVersion=").trim.toInt }
      .getOrElse(Legacy)
  }

  /** Loud guard for `exists`/`missing` clauses: throws on an index whose
    * format predates the `_field_names`-style markers.
    */
  def requireExistsMarkers(hasMarkers: Boolean, indexDir: String,
      exists: Seq[String], missing: Seq[String]): Unit =
    if ((exists.nonEmpty || missing.nonEmpty) && !hasMarkers)
      throw new IllegalStateException(
        s"index at $indexDir predates exists markers (formatVersion < $Version): " +
          "an exists/missing clause would silently return wrong results — " +
          "rebuild the index (or compact from marker-bearing segments)")
}

/** Fielded keyword terms for ES bool-query filter context (the keyword
  * sub-field pattern: a metadata value is indexed as ONE posting per doc
  * in the same dictionary/postings as the text terms, namespaced so the
  * two can never collide — the analyzer emits only lowercase
  * alphanumeric tokens, never '#' or ':'). Values are indexed and
  * matched EXACTLY (not analyzed) — ES `keyword` / `term`-query
  * semantics. Enabled per-index via `IndexConfig.fieldCols`.
  */
object FieldTerms {
  /** Namespace marker — no analyzer token can start with it, so the
    * text and keyword namespaces are provably disjoint (and text-side
    * term expansion can exclude field terms with one prefix test).
    */
  val Prefix = "#"
  def term(field: String, value: String): String = Prefix + field + ":" + value

  /** Namespace marker of fielded ANALYZED text terms (`%field:token` —
    * the ES multi-field analyzed mapping: the reference indexes FOUR
    * analyzed text fields, mapping.json:12-17 catalog/volume plus
    * dynamic-mapped name/path populated at CsvReader.java:315-328, and
    * users query them independently or via `multi_match`). Like '#',
    * '%' cannot appear in analyzer output, so the main-text, keyword
    * and fielded-text namespaces are provably disjoint. The MAIN text
    * column's terms stay un-namespaced — [[textTerm]] maps field
    * "text" to the plain token, so `multi_match` can weight the main
    * field alongside the others.
    */
  val TextPrefix = "%"

  /** The dictionary term of analyzed `token` in `field` ("text" = the
    * main un-namespaced field).
    */
  def textTerm(field: String, token: String): String =
    if (field == "text") token else TextPrefix + field + ":" + token

  /** The text field a dictionary term belongs to: None = the main text
    * field (or a keyword/tier term — never scored per-field).
    */
  def textFieldOf(term: String): Option[String] =
    if (!term.startsWith(TextPrefix)) None
    else {
      val i = term.indexOf(':')
      if (i < 0) None else Some(term.substring(1, i))
    }

  /** Is the term in any fielded namespace (keyword '#' or text '%')?
    * Main-TEXT expansion (prefix/wildcard/fuzzy) must skip both — ES
    * keeps sub-fields out of analyzed-field term expansion.
    */
  def isNamespaced(term: String): Boolean =
    term.startsWith(Prefix) || term.startsWith(TextPrefix)

  /** Bare-token length of a dictionary term (the `len` dict column,
    * format v2+): namespaced terms (`#field:v` / `%field:tok`) measure
    * the part after the FIRST ':' (analyzer tokens never contain ':',
    * so that colon is always the namespace separator; exists markers
    * `#field!` have none and fall back to full length — they never
    * join an edit-distance expansion). Stored at write time so fuzzy/
    * suggest dictionary scans push a plain int range filter to the
    * parquet reader — levenshtein ≥ |length difference|, so pruning to
    * |len − |w|| ≤ maxDist is exact — instead of evaluating the
    * distance over the entire vocabulary (round-6 review).
    */
  def bareLenCol(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{instr, length, when}
    when(term.startsWith(Prefix) || term.startsWith(TextPrefix),
      length(term) - instr(term, ":")).otherwise(length(term))
  }

  /** The exists-marker term of an indexed field — ES's `_field_names`
    * meta-field pattern (the `exists`/`missing` query is a term lookup
    * on it, never a doc-store scan): one tf=1 posting per doc that HAS
    * the field (non-null keyword/numeric value, ≥ 1 token for analyzed
    * text fields). '!' cannot appear in analyzer output and never
    * terminates the field name in the value (':'), tier ('@') or text
    * ('%…:') encodings, so the marker collides with nothing.
    */
  def existsTerm(field: String): String = Prefix + field + "!"

  /** Zero-padded encoding for NUMERIC keyword values: range filters
    * compare values lexicographically, which is exact only for
    * fixed-width encodings — encode non-negative numerics with this at
    * BOTH index time (a derived column listed in `fieldCols`) and
    * query time (`rangeFilters` bounds) and lexicographic order equals
    * numeric order. 19 digits covers the full non-negative Long range.
    */
  def numericValue(v: Long, width: Int = 19): String = {
    require(v >= 0, s"numericValue encodes non-negative values, got $v")
    val s = v.toString
    require(s.length <= width, s"$v does not fit width $width")
    "0" * (width - s.length) + s
  }

  // --- tiered numeric terms (scale-safe range filters) ---------------------
  // The classic numeric-trie / precision-step technique (Schindler &
  // Diepenbroek, Computers & Geosciences 2008; Lucene's pre-BKD
  // NumericRangeQuery): a non-negative long value is indexed once per
  // tier — tier l holds the value's high bits (v >>> TierStep·l) — so
  // ANY [lo, hi] range decomposes into ≤ 2·2^TierStep·(levels+1)
  // dictionary terms regardless of the field's value cardinality. This
  // replaces the uncapped per-distinct-value dictionary expansion for
  // high-cardinality numeric fields (timestamps, byte sizes — the
  // reference's `sizeInBytes`/`created` mapping.json:4-11,26-28 at
  // 10^12-doc scale): the driver never holds one TermStats per value,
  // and the filter clause's UnionCursor has a BOUNDED member count.

  /** Bits per tier (fanout 16). 4 balances postings written per value
    * (15 tier postings) against worst-case query expansion (≤ 512).
    */
  val TierStep = 4

  /** Highest tier level: v >>> 60 still distinguishes values; level 16
    * would be the constant 0 for every value (useless).
    */
  val MaxTierLevel = 15

  /** The tier term of `prefix` (= value >>> TierStep·level) at `level`.
    * '@' cannot appear in analyzer output, and the level digit makes
    * tiers of the same field mutually disjoint namespaces.
    */
  def tierTerm(field: String, level: Int, prefix: Long): String =
    Prefix + field + "@" + level + ":" + java.lang.Long.toHexString(prefix)

  /** Every term a numeric value is indexed under: the exact zero-padded
    * level-0 term (shared with the lexicographic `rangeFilters` path and
    * exact `term` filters) + one tier term per level.
    */
  def numericValueTerms(field: String, v: Long): Array[String] = {
    val out = new Array[String](MaxTierLevel + 1)
    out(0) = term(field, numericValue(v))
    var l = 1
    while (l <= MaxTierLevel) {
      out(l) = tierTerm(field, l, v >>> (TierStep * l))
      l += 1
    }
    out
  }

  /** Canonical trie decomposition of [lo, hi] (inclusive, non-negative):
    * the minimal boundary cells at each level — level-0 cells as exact
    * value terms, higher cells as tier terms. Any doc whose value lies
    * in the range carries EXACTLY ONE of the returned terms (cells are
    * disjoint and cover the range), so a UnionCursor over them is the
    * exact range predicate. |result| ≤ 2·(2^TierStep)·(MaxTierLevel+1).
    */
  def trieRangeTerms(field: String, lo0: Long, hi0: Long): Seq[String] = {
    require(lo0 >= 0 && hi0 >= 0, "tiered numeric terms encode non-negative values")
    if (lo0 > hi0) return Nil
    val out = Seq.newBuilder[String]
    def emit(level: Int, a: Long, b: Long): Unit = {
      var v = a
      while (v <= b) {
        out += (if (level == 0) term(field, numericValue(v)) else tierTerm(field, level, v))
        v += 1
      }
    }
    val fan = 1L << TierStep
    val mask = fan - 1
    var lo = lo0
    var hi = hi0
    var level = 0
    var done = false
    while (!done) {
      val hasLower = (lo & mask) != 0
      val hasUpper = (hi & mask) != mask
      val nextLo = if (hasLower) (lo >>> TierStep) + 1 else lo >>> TierStep
      val nextHi = if (hasUpper) (hi >>> TierStep) - 1 else hi >>> TierStep
      if (nextLo > nextHi || level >= MaxTierLevel) {
        // the remaining span fits within two parent cells (or the top
        // tier): emit it at this level and stop
        emit(level, lo, hi)
        done = true
      } else {
        if (hasLower) emit(level, lo, lo | mask)
        if (hasUpper) emit(level, hi & ~mask, hi)
        lo = nextLo
        hi = nextHi
        level += 1
      }
    }
    out.result()
  }
}

final case class IndexConfig(
    numBuckets: Int = 4,
    numShards: Int = 8,
    blockSize: Int = 128,
    salt: Int = 16,
    partitions: Int = 32,
    /** true (default): encode ALL buckets' blocks in ONE job (single
      * range shuffle on (bucket, term, docId), single partitioned write)
      * — per-bucket manifest cells are still written, but resume
      * granularity for the block phase is all-buckets-or-none. false:
      * one job per bucket — fine-grained resume; right when each bucket
      * is hours of work (at 10^12 turns run fused GROUPS of buckets:
      * several builds over docId sub-ranges, each fused internally).
      */
    fusedBlocks: Boolean = true,
    /** true: write the tokenized postings to parquet as their own
      * checkpoint cell (resume never re-tokenizes — right when the
      * corpus⇒postings pass dwarfs everything, e.g. 10^12 turns on a
      * cluster with fast parallel storage). false (default): keep them
      * in a spillable cache for the duration of the build — one tokenize
      * pass either way, but no extra full write+read of the posting
      * stream through storage; a resumed build re-tokenizes once.
      */
    materializePostings: Boolean = false,
    /** Store per-posting token positions (varint gap streams) in the
      * blocks — what makes phrase queries answerable (ES analyzed fields
      * record positions by default; reference parity). Costs ~1-2 bytes
      * per term OCCURRENCE through the shuffle and on disk; turn off for
      * builds that will never serve phrase/proximity queries.
      */
    storePositions: Boolean = true,
    /** Doc columns to additionally index as fielded keyword terms
      * (`#field:value`, one tf=1 posting per doc — [[FieldTerms]]) so
      * `Searcher.searchBool` can apply ES filter-context / must_not
      * clauses as posting-list intersections. Text-term statistics
      * (df/cf/maxScore) and corpus stats (N, avgdl) are UNAFFECTED, so
      * scores with and without fieldCols are identical. Default off.
      */
    fieldCols: Seq[String] = Nil,
    /** NUMERIC doc columns (non-negative longs) to index with tiered
      * trie terms ([[FieldTerms.numericValueTerms]]): the exact
      * zero-padded `#field:value` term PLUS one `#field@l:prefix` term
      * per tier, so `searchBool(numericRangeFilters = …)` answers any
      * [lo, hi] range with a BOUNDED clause (≤ 2·16·16 terms) instead
      * of one dictionary term per distinct in-range value — the
      * scale-safe path for timestamps / byte sizes (round-3 review
      * "What's wrong #1"). Costs MaxTierLevel extra tf=1 postings per
      * doc per field; corpus/text stats remain untouched. Null or
      * negative values emit nothing (such docs never match a range
      * filter — ES missing-value semantics).
      */
    numericFieldCols: Seq[String] = Nil,
    /** Vocabulary gate for the blocks-phase term→termId TRANSLATE map
      * (round-9): when the dictionary has ≤ this many terms, the block
      * pass resolves (termId, df, fieldId) inside the tokenize closure
      * via a broadcast java map instead of a broadcast-hash JOIN on the
      * term string — the join probe (UnsafeRow key encode +
      * BytesToBytesMap lookup + arrayEquals per posting) was a measured
      * 24% of build executor CPU (round-9 JFR sampling). Same gated-
      * broadcast pattern as `Searcher.warm(maxDriverDictTerms)`: above
      * the gate (vocabularies that would not fit executor memory — the
      * 10^12-turn case) the path falls back to the join, which AQE
      * plans as broadcast or shuffle join by size as before. 0 disables
      * the translate map entirely (always join).
      */
    maxTranslateVocab: Long = 4_000_000L,
    /** Doc columns to index as ADDITIONAL analyzed text fields
      * (`%field:token` terms, [[FieldTerms.textTerm]]) — the ES
      * multi-field mapping (reference mapping.json:12-17 +
      * CsvReader.java:315-328). Each field gets its OWN BM25
      * statistics, exactly Lucene's per-field model: df per field
      * term, dl = the FIELD's token count (carried in the posting
      * payload), docCount = docs with ≥1 token in the field, avgdl =
      * Σ field dl / docCount — persisted under `fieldstats/` and used
      * both by the block encoder (block-max under field stats) and at
      * query time ([[graft.query.Searcher.searchField]] /
      * `multiMatch`). Main-text statistics and scores are UNAFFECTED
      * (the namespaces are disjoint; corpus N/avgdl come from the docs
      * phase alone). Default off.
      */
    textFieldCols: Seq[String] = Nil
)

object IndexConfig {
  /** Sizing rule (round-1 review: "name the rule"): buckets are the unit
    * of query parallelism AND of per-query-task block memory (a WAND
    * task materializes the query terms' blocks for ONE bucket), so they
    * must grow with the corpus — numBuckets = ceil(docs /
    * docsPerBucket), floored at min(4, cores) so small corpora still
    * exercise the per-bucket merge, capped at 4096. At 10^12 turns the
    * cap binds: 4096 buckets of ~244M docs each, with the (bucket ×
    * shard) grid — 4096 × 8 = 32k cells — and WAND's per-term docId
    * slices providing query fan-out beyond the bucket count; raising the
    * cap instead would push per-bucket dictionary/blockstats overhead
    * past its value. Results are bucket-count-invariant (EngineSpec pins
    * a 64-bucket build against the oracle).
    */
  def sized(nDocs: Long, cores: Int, docsPerBucket: Long = 16L << 20): IndexConfig = {
    val bySize = (nDocs + docsPerBucket - 1) / docsPerBucket
    val buckets = math.max(math.min(4, math.max(1, cores)), math.min(4096L, bySize).toInt)
    IndexConfig(numBuckets = buckets, partitions = math.max(1, cores))
  }
}

final case class BuildReport(
    n: Long,
    avgdl: Double,
    vocab: Long,
    postings: Long,
    bytesCompressed: Long,
    cellsBuilt: Seq[String],
    cellsSkipped: Seq[String]
)

/** Inverted-index build over `Dataset[Doc]` (SURVEY.md §2.1 S10 — the
  * index construction the reference delegates to Elasticsearch at bulk
  * time, BulkIndexer.java:48 + mapping.json, rebuilt Spark-native).
  *
  * Layout under `indexDir`:
  *   docs/                 docId-sorted doc store (meta + text)
  *   stats/                IndexStats singleton
  *   dict0/                term → (df, cf, shard)  [pre-finalize dictionary]
  *   blocks/bucket=i/shard=j/   compressed PostingBlocks (Parquet)
  *   termpartials/bucket=i/     per-bucket term max-score partials
  *   dict/                 finalized TermStats (df, cf, maxScore)
  *   manifest/             one checkpoint file per cell (lineage+metrics)
  *
  * Scale design: buckets are contiguous docId ranges (≙ Lucene segments)
  * so per-term posting runs from different buckets are docId-disjoint and
  * WAND can treat their block lists as one sorted list. Hot-term skew in
  * block building is defused structurally: block-encode partitions are
  * fixed docId slices of a bucket (closed-form routing — docIds are dense
  * with known bounds — so no range-sampling pass over the postings), and
  * a hot term therefore splits across ALL of its bucket's partitions (the
  * "salted-repartition merge" of the north rule — salt = docId range);
  * dictionary stats additionally go through an explicit two-phase salted
  * aggregation (groupBy(term, salt) partials → groupBy(term) final) so no
  * single reducer ever sees a whole hot term. Every cell write is an
  * idempotent per-directory overwrite; the manifest marks a cell done
  * only after the write commits, so a killed build resumes by skipping
  * done cells (north_rule resumability).
  *
  * At 10^12-turn scale the same plan holds: docs/blocks are partitioned
  * parquet/iceberg, every shuffle is keyed on (docId slice) or (term,
  * salt) — no global single-task stage and no sampling pass anywhere, and
  * the dictionary join is AQE-broadcast when the vocabulary is small
  * enough, shuffle join otherwise.
  */
class IndexBuilder(
    spark: SparkSession,
    indexDir: String,
    snapshotId: String,
    cfg: IndexConfig = IndexConfig()
) {
  import spark.implicits._

  private val root = new Path(indexDir)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def docsPath = s"$indexDir/docs"
  def statsPath = s"$indexDir/stats"
  def fieldStatsPath = s"$indexDir/fieldstats"
  def postings0Path = s"$indexDir/postings0"
  def dict0Path = s"$indexDir/dict0"
  def blocksPath = s"$indexDir/blocks"
  def partialsPath = s"$indexDir/termpartials"
  def dictPath = s"$indexDir/dict"
  private def manifestDir = new Path(root, "manifest")

  // --- manifest (checkpoint) ---------------------------------------------
  private def cellFile(cell: String) = new Path(manifestDir, cell.replace('=', '-') + ".props")

  private[index] def writeManifest(m: BuildManifest): Unit = {
    fs.mkdirs(manifestDir)
    val tmp = new Path(manifestDir, cellFile(m.cell).getName + ".tmp")
    val out = fs.create(tmp, true)
    val body =
      s"""cell=${m.cell}
         |bucket=${m.bucket}
         |docIdLo=${m.docIdLo}
         |docIdHi=${m.docIdHi}
         |sourceSnapshotId=${m.sourceSnapshotId}
         |postingsEmitted=${m.postingsEmitted}
         |bytesCompressed=${m.bytesCompressed}
         |status=${m.status}
         |wallSec=${m.wallSec}
         |""".stripMargin
    out.write(body.getBytes(StandardCharsets.UTF_8))
    out.close()
    fs.delete(cellFile(m.cell), false)
    fs.rename(tmp, cellFile(m.cell))
  }

  def readManifest(cell: String): Option[BuildManifest] = {
    val p = cellFile(cell)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var r = in.read(buf)
    while (r > 0) { bytes.write(buf, 0, r); r = in.read(buf) }
    in.close()
    val kv = bytes.toString("UTF-8").linesIterator.filter(_.contains('='))
      .map { l => val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1) }.toMap
    try Some(BuildManifest(kv("cell"), kv("bucket").toInt, kv("docIdLo").toLong,
      kv("docIdHi").toLong, kv("sourceSnapshotId"), kv("postingsEmitted").toLong,
      kv("bytesCompressed").toLong, kv("status"), kv("wallSec").toDouble))
    catch { case _: Exception => None }
  }

  def allManifests: Seq[BuildManifest] =
    if (!fs.exists(manifestDir)) Seq.empty
    else fs.listStatus(manifestDir).toSeq.filter(_.getPath.getName.endsWith(".props"))
      .flatMap(st => readManifest(st.getPath.getName.stripSuffix(".props").replaceFirst("^bucket-", "bucket=")))

  private def isDone(cell: String): Boolean =
    readManifest(cell).exists(m => m.status == "done" && m.sourceSnapshotId == snapshotId)

  // --- build phases --------------------------------------------------------

  /** (term, docId, tf, dl, pay) postings — one row per distinct (term,
    * doc). `dl` rides along so no big doc-side join is ever needed
    * (SURVEY.md A6). tf — and, when cfg.storePositions, the term's token
    * positions — are aggregated PER DOC inside a narrow map pass: a
    * document's tokens are by definition co-located, so neither needs a
    * shuffle or a corpus-wide hash table. `pay` is the PACKED per-posting
    * payload — varint(tf), varint(dl), then the position gap stream —
    * produced here so the block shuffle can carry ONE ~3-byte binary
    * instead of two 8-byte longs plus a separate position column (round-3
    * scaling finding: per-posting fixed-width fields dominated shuffle
    * bytes once positions landed — 986 → 1386 B/turn; packing restores
    * it). The separate tf/dl int columns exist for the dictionary
    * aggregation and are column-pruned out of the block path. (Round-1
    * shape — explode + groupBy(term, docId) — shuffled ~1 row per posting
    * and built a postings-cardinality hash aggregate for a ~1.35:1
    * reduction; measured 34 s of the 96 s build at 1 M turns. This pass
    * is per-partition imperative logic, the documented legitimate use of
    * typed mapPartitions.)
    */
  def postingsOf(docs: DataFrame, withPayload: Boolean = true,
      translate: IndexBuilder.Translate = None): DataFrame = {
    val withPos = cfg.storePositions && withPayload
    val src = docs.select(col("docId"), col("dl"), col("text"))
      .as[(Long, Int, String)]
    translate match {
      case Some(bc) =>
        // TRANSLATED stream (round-9, see IndexConfig.maxTranslateVocab):
        // (termId, df, fieldId) resolved against the broadcast dict0 map
        // IN this closure — term strings never leave it, so the blocks
        // pass needs no join and no per-posting string UnsafeRow
        src.mapPartitions { it =>
          val m = bc.value
          val acc = new java.util.HashMap[String, PosAcc](128)
          it.flatMap { case (id, dl, text) =>
            acc.clear()
            val toks = Analyzer.tokenize(text)
            var i = 0
            while (i < toks.length) {
              val prev = acc.get(toks(i))
              val a = if (prev == null) { val p = new PosAcc; acc.put(toks(i), p); p } else prev
              if (withPos) a.add(i) else a.n += 1
              i += 1
            }
            val out = new Array[(Long, Long, Long, Array[Byte], Int)](acc.size)
            val entries = acc.entrySet().iterator()
            var j = 0
            while (entries.hasNext) {
              val e = entries.next()
              val a = e.getValue
              val v = IndexBuilder.resolved(m, e.getKey)
              out(j) = (v(0), id, v(1),
                if (withPayload) a.payload(dl, withPos) else Array.emptyByteArray,
                v(2).toInt)
              j += 1
            }
            out.iterator
          }
        }.toDF("termId", "docId", "df", "pay", "fieldId")
      case None =>
        src.mapPartitions { it =>
          // per-doc term table; PosAcc is reused across docs via clear()
          val acc = new java.util.HashMap[String, PosAcc](128)
          it.flatMap { case (id, dl, text) =>
            acc.clear()
            val toks = Analyzer.tokenize(text)
            var i = 0
            while (i < toks.length) {
              val prev = acc.get(toks(i))
              val a = if (prev == null) { val p = new PosAcc; acc.put(toks(i), p); p } else prev
              if (withPos) a.add(i) else a.n += 1
              i += 1
            }
            // materialize eagerly: `acc` is reused for the next doc
            val out = new Array[(String, Long, Int, Int, Array[Byte])](acc.size)
            val entries = acc.entrySet().iterator()
            var j = 0
            while (entries.hasNext) {
              val e = entries.next()
              val a = e.getValue
              out(j) = (e.getKey, id, a.n, dl,
                if (withPayload) a.payload(dl, withPos) else Array.emptyByteArray)
              j += 1
            }
            out.iterator
          }
        }.toDF("term", "docId", "tf", "dl", "pay")
    }
  }

  /** One tf=1 posting per doc for a metadata column's exact value
    * ([[FieldTerms]] — ES keyword sub-field). Null/absent values emit
    * nothing (a filter on the field then simply never matches those
    * docs — ES semantics). Same output schema as [[postingsOf]], so the
    * streams union and flow through the identical dict/block phases.
    */
  def fieldPostingsOf(docs: DataFrame, field: String,
      withPayload: Boolean = true,
      translate: IndexBuilder.Translate = None): DataFrame = {
    val withPos = cfg.storePositions && withPayload
    val src = docs.select(col("docId"), col("dl"), col(field).cast("string"))
      .as[(Long, Int, String)]
    translate match {
      case Some(bc) =>
        src.mapPartitions { it =>
          val m = bc.value
          it.flatMap { case (id, dl, v) =>
            if (v == null) Iterator.empty
            else {
              val pay =
                if (!withPayload) Array.emptyByteArray
                else {
                  val a = new PosAcc
                  if (withPos) a.add(0) else a.n = 1
                  a.payload(dl, withPos)
                }
              val t1 = IndexBuilder.resolved(m, FieldTerms.term(field, v))
              val t2 = IndexBuilder.resolved(m, FieldTerms.existsTerm(field))
              Iterator((t1(0), id, t1(1), pay, t1(2).toInt),
                (t2(0), id, t2(1), pay, t2(2).toInt))
            }
          }
        }.toDF("termId", "docId", "df", "pay", "fieldId")
      case None =>
        src.mapPartitions { it =>
          it.flatMap { case (id, dl, v) =>
            if (v == null) Iterator.empty
            else {
              val pay =
                if (!withPayload) Array.emptyByteArray
                else {
                  val a = new PosAcc
                  if (withPos) a.add(0) else a.n = 1
                  a.payload(dl, withPos)
                }
              // value term + the `_field_names`-style exists marker
              Iterator((FieldTerms.term(field, v), id, 1, dl, pay),
                (FieldTerms.existsTerm(field), id, 1, dl, pay))
            }
          }
        }.toDF("term", "docId", "tf", "dl", "pay")
    }
  }

  /** One tf=1 posting per (doc, tier) for a numeric column: the exact
    * zero-padded term plus every tier term
    * ([[FieldTerms.numericValueTerms]]). Same schema as [[postingsOf]].
    */
  def numericFieldPostingsOf(docs: DataFrame, field: String,
      withPayload: Boolean = true,
      translate: IndexBuilder.Translate = None): DataFrame = {
    val withPos = cfg.storePositions && withPayload
    val src = docs.select(col("docId"), col("dl"), col(field).cast("long"))
      .as[(Long, Int, Option[Long])]
    translate match {
      case Some(bc) =>
        src.mapPartitions { it =>
          val m = bc.value
          it.flatMap {
            case (id, dl, Some(v)) if v >= 0 =>
              val pay =
                if (!withPayload) Array.emptyByteArray
                else {
                  val a = new PosAcc
                  if (withPos) a.add(0) else a.n = 1
                  a.payload(dl, withPos)
                }
              (FieldTerms.numericValueTerms(field, v).iterator ++
                Iterator.single(FieldTerms.existsTerm(field)))
                .map { t =>
                  val r = IndexBuilder.resolved(m, t)
                  (r(0), id, r(1), pay, r(2).toInt)
                }
            case _ => Iterator.empty
          }
        }.toDF("termId", "docId", "df", "pay", "fieldId")
      case None =>
        src.mapPartitions { it =>
          it.flatMap {
            case (id, dl, Some(v)) if v >= 0 =>
              val pay =
                if (!withPayload) Array.emptyByteArray
                else {
                  val a = new PosAcc
                  if (withPos) a.add(0) else a.n = 1
                  a.payload(dl, withPos)
                }
              (FieldTerms.numericValueTerms(field, v).iterator ++
                Iterator.single(FieldTerms.existsTerm(field)))
                .map(t => (t, id, 1, dl, pay))
            case _ => Iterator.empty
          }
        }.toDF("term", "docId", "tf", "dl", "pay")
    }
  }

  /** Analyzed postings of an ADDITIONAL text field ([[FieldTerms
    * .textTerm]] namespace): same per-doc tf+positions map pass as the
    * main text ([[postingsOf]]), but dl in the payload is the FIELD's
    * token count — the per-field BM25 length norm (Lucene's per-field
    * model). Null/empty values emit nothing (the doc is outside the
    * field's docCount).
    */
  def textFieldPostingsOf(docs: DataFrame, field: String,
      withPayload: Boolean = true,
      translate: IndexBuilder.Translate = None): DataFrame = {
    val withPos = cfg.storePositions && withPayload
    val prefix = FieldTerms.textTerm(field, "")
    val src = docs.select(col("docId"), col(field).cast("string"))
      .as[(Long, String)]
    translate match {
      case Some(bc) =>
        src.mapPartitions { it =>
          val m = bc.value
          val acc = new java.util.HashMap[String, PosAcc](32)
          it.flatMap { case (id, v) =>
            val toks = if (v == null) Array.empty[String] else Analyzer.tokenize(v)
            if (toks.isEmpty) Iterator.empty
            else {
              acc.clear()
              var i = 0
              while (i < toks.length) {
                val prev = acc.get(toks(i))
                val a = if (prev == null) { val p = new PosAcc; acc.put(toks(i), p); p } else prev
                if (withPos) a.add(i) else a.n += 1
                i += 1
              }
              val fdl = toks.length
              val out = new Array[(Long, Long, Long, Array[Byte], Int)](acc.size + 1)
              val entries = acc.entrySet().iterator()
              var j = 0
              while (entries.hasNext) {
                val e = entries.next()
                val a = e.getValue
                val r = IndexBuilder.resolved(m, prefix + e.getKey)
                out(j) = (r(0), id, r(1),
                  if (withPayload) a.payload(fdl, withPos) else Array.emptyByteArray,
                  r(2).toInt)
                j += 1
              }
              val epay =
                if (!withPayload) Array.emptyByteArray
                else {
                  val ea = new PosAcc
                  if (withPos) ea.add(0) else ea.n = 1
                  ea.payload(fdl, withPos)
                }
              val er = IndexBuilder.resolved(m, FieldTerms.existsTerm(field))
              out(j) = (er(0), id, er(1), epay, er(2).toInt)
              out.iterator
            }
          }
        }.toDF("termId", "docId", "df", "pay", "fieldId")
      case None =>
        src.mapPartitions { it =>
          val acc = new java.util.HashMap[String, PosAcc](32)
          it.flatMap { case (id, v) =>
            val toks = if (v == null) Array.empty[String] else Analyzer.tokenize(v)
            if (toks.isEmpty) Iterator.empty
            else {
              acc.clear()
              var i = 0
              while (i < toks.length) {
                val prev = acc.get(toks(i))
                val a = if (prev == null) { val p = new PosAcc; acc.put(toks(i), p); p } else prev
                if (withPos) a.add(i) else a.n += 1
                i += 1
              }
              val fdl = toks.length
              // +1: the exists marker (≥ 1 token ⇔ the doc is in the
              // field's docCount — same membership rule as fieldstats)
              val out = new Array[(String, Long, Int, Int, Array[Byte])](acc.size + 1)
              val entries = acc.entrySet().iterator()
              var j = 0
              while (entries.hasNext) {
                val e = entries.next()
                val a = e.getValue
                out(j) = (prefix + e.getKey, id, a.n, fdl,
                  if (withPayload) a.payload(fdl, withPos) else Array.emptyByteArray)
                j += 1
              }
              val epay =
                if (!withPayload) Array.emptyByteArray
                else {
                  val ea = new PosAcc
                  if (withPos) ea.add(0) else ea.n = 1
                  ea.payload(fdl, withPos)
                }
              out(j) = (FieldTerms.existsTerm(field), id, 1, fdl, epay)
              out.iterator
            }
          }
        }.toDF("term", "docId", "tf", "dl", "pay")
    }
  }

  /** Text postings plus any configured fielded keyword postings.
    * `withPayload = false` skips building the packed per-posting payload
    * (varint tf/dl + position gaps) — for consumers that only need the
    * (term, docId, tf, dl) columns (the dict0 aggregation): the payload
    * is produced inside typed closures, so Catalyst cannot column-prune
    * it away, and at ~40 M postings/M-turns the dead encode was a
    * measured allocation hot spot (round-9).
    */
  def allPostingsOf(docs: DataFrame, withPayload: Boolean = true,
      translate: IndexBuilder.Translate = None): DataFrame = {
    val withFields = cfg.fieldCols.foldLeft(postingsOf(docs, withPayload, translate))(
      (acc, f) => acc.unionByName(fieldPostingsOf(docs, f, withPayload, translate)))
    val withNumeric = cfg.numericFieldCols.foldLeft(withFields)(
      (acc, f) => acc.unionByName(numericFieldPostingsOf(docs, f, withPayload, translate)))
    cfg.textFieldCols.foldLeft(withNumeric)(
      (acc, f) => acc.unionByName(textFieldPostingsOf(docs, f, withPayload, translate)))
  }

  /** Direct per-term df/cf (single hash agg — partial+final via Catalyst). */
  def dictDirect(postings: DataFrame): DataFrame =
    postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

  /** Two-phase salted per-term df/cf: partial agg keyed on (term, salt)
    * bounds any reducer's share of a hot term to ~1/salt (north_rule
    * "salted-repartition merge"; SURVEY.md A9). Equality with dictDirect
    * is property-tested.
    */
  def dictSalted(postings: DataFrame, salt: Int): DataFrame =
    postings
      .groupBy(col("term"), pmod(hash(col("docId")), lit(salt)).as("s"))
      .agg(count(lit(1)).as("dfp"), sum(col("tf")).as("cfp"))
      .groupBy(col("term"))
      .agg(sum(col("dfp")).as("df"), sum(col("cfp")).as("cf"))

  def build(docsIn: Dataset[Doc], resume: Boolean = true): BuildReport =
    buildFrom(docsIn.toDF(), resume)

  /** Same build over an untyped frame: must carry the [[Doc]] columns
    * (docId, dl, text + metadata); extra columns ride the doc store and
    * become filterable when listed in `cfg.fieldCols`.
    */
  def buildFrom(docsFrame: DataFrame, resume: Boolean = true): BuildReport = {
    val docsIn = docsFrame
    val built = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    // Format-flag provenance (round-7 review): the flag must record the
    // writer of the cells that CARRY exists markers. A FRESH build (no
    // pre-existing manifest cells) stamps this writer's version up
    // front — the build's lineage then belongs to this writer, so any
    // same-version crash-resume keeps it. A resume over ANOTHER
    // writer's cells finds either that writer's flag or none (= Legacy)
    // and the finalize stamp below takes min(existing, Version):
    // postings an older writer emitted are never claimed as
    // marker-bearing (the silent-inversion hole the flag exists to
    // close).
    if (!resume || allManifests.isEmpty) IndexFormat.write(fs, indexDir)
    def phase[T](cell: String)(body: => BuildManifest): Unit =
      if (resume && isDone(cell)) skipped += cell
      else {
        val t0 = System.nanoTime()
        // label the cell's jobs (guide §1.5) — thread-local, cleared after
        spark.sparkContext.setJobDescription(s"graft build: $cell")
        try {
          val m = body
          writeManifest(m.copy(wallSec = (System.nanoTime() - t0) / 1e9))
          built += cell
        } finally spark.sparkContext.setJobDescription(null)
      }

    // Phase A — doc store + corpus stats. Stats (n, avgdl, max docId)
    // ride the write job itself via the Observation API — no second
    // job re-reading the store (fixed per-build driver cost is the term
    // that caps small-corpus scaling efficiency).
    phase("docs") {
      val obs = org.apache.spark.sql.Observation()
      docsIn.toDF()
        .observe(obs, count(lit(1)).as("n"), avg(col("dl")).as("avgdl"),
          max(col("docId")).as("mx"))
        .write.mode(SaveMode.Overwrite).parquet(docsPath)
      val row = obs.get
      val n = row("n").asInstanceOf[Long]
      val avgdl = Option(row("avgdl")).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val bound = Option(row("mx")).map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
      Seq(IndexStats(n, avgdl, snapshotId)).toDS()
        .write.mode(SaveMode.Overwrite).parquet(statsPath)
      // docIdHi of the "docs" cell = exclusive docId bound for bucketing
      // (docIds need not start at 0 or be dense for external corpora)
      BuildManifest("docs", -1, 0, bound, snapshotId, n, 0, "done", 0)
    }
    // Size file splits to the build parallelism: the tokenize stage's
    // task count is bounded by input splits, and its map-side partial
    // aggregation must fit each task's memory share. With the default
    // 128 MB splits, a ~1 GB doc store yields ~8 tasks regardless of
    // cores — measured as the scaling bottleneck (and the source of
    // nondeterministic hash-agg spills).
    val docsBytes = {
      val p = new Path(docsPath)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    val oldSplit = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val targetSplit = math.max(4L << 20, math.min(128L << 20, docsBytes / (cfg.partitions * 3L)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", targetSplit.toString)
    try {

    val docs = spark.read.parquet(docsPath)
    val stats = spark.read.parquet(statsPath).as[IndexStats].head()
    val n = stats.n
    val avgdl = stats.avgdl
    if (n == 0) {
      // even an empty index carries a format (an unflagged empty
      // segment would mark a whole multi-segment index legacy) — but
      // never a NEWER one than its lineage (min rule, see buildFrom top)
      IndexFormat.write(fs, indexDir,
        math.min(IndexFormat.version(fs, indexDir), IndexFormat.Version))
      return BuildReport(0, 0.0, 0, 0, 0, built.toSeq, skipped.toSeq)
    }
    val idBound = readManifest("docs").map(_.docIdHi).getOrElse(n)
    val bucketWidth = math.max(1L, (idBound + cfg.numBuckets - 1) / cfg.numBuckets)

    // Phase A2 — per-field stats of the additional analyzed text fields
    // (docCount = docs with ≥1 token, Σ field dl): ONE narrow agg job
    // over the column-pruned doc store, persisted so query time reads a
    // handful of rows. The block encoder below scores field postings
    // under THESE stats (per-field BM25 — Lucene's model).
    if (cfg.textFieldCols.nonEmpty) phase("fieldstats") {
      val aggs = cfg.textFieldCols.flatMap { f =>
        val d = coalesce(Analyzer.dlCol(col(f).cast("string")), lit(0))
        Seq(coalesce(sum(d.cast("long")), lit(0L)).as(s"sum_$f"),
          count(when(d > lit(0), 1)).as(s"n_$f"))
      }
      val row = docs.agg(aggs.head, aggs.tail: _*).head()
      cfg.textFieldCols.zipWithIndex.map { case (f, i) =>
        (f, i + 1, row.getAs[Long](s"n_$f"), row.getAs[Long](s"sum_$f"))
      }.toDF("field", "fieldId", "ndocs", "sumdl")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(fieldStatsPath)
      BuildManifest("fieldstats", -1, 0, n, snapshotId, 0, 0, "done", 0)
    }
    // encoder stats tables, index 0 = the main text field (corpus stats)
    val (fieldNs, fieldAvgdls) = {
      val ns = Array.fill(cfg.textFieldCols.length + 1)(n)
      val ads = Array.fill(cfg.textFieldCols.length + 1)(avgdl)
      if (cfg.textFieldCols.nonEmpty) {
        val byField = spark.read.parquet(fieldStatsPath)
          .select(col("fieldId"), col("ndocs"), col("sumdl"))
          .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
        for (i <- 1 to cfg.textFieldCols.length) {
          val (nf, sdl) = byField.getOrElse(i, (0L, 0L))
          ns(i) = nf
          ads(i) = if (nf == 0) 0.0 else sdl.toDouble / nf
        }
      }
      (ns, ads)
    }

    // Phase B0 — the posting stream. With per-doc tf folded into the
    // tokenize pass (postingsOf), producing postings is one narrow
    // codegen'd scan (~1-2 s/M turns measured); CACHING the ~50 rows/turn
    // stream costs more memory traffic than recomputing it, so by default
    // the two consumers (dict0, block encode) each re-derive it from the
    // columnar doc store. materializePostings=true instead checkpoints
    // the stream to parquet as its own resume cell — right when the
    // corpus scan itself is the dominant cost (e.g. remote storage).
    val withBucket = allPostingsOf(docs)
      .withColumn("bucket", least(floor(col("docId") / lit(bucketWidth)),
        lit(cfg.numBuckets - 1)).cast("int"))
    val postings0 =
      if (cfg.materializePostings) {
        phase("postings") {
          withBucket.write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(postings0Path)
          BuildManifest("postings", -1, 0, idBound, snapshotId, 0, 0, "done", 0)
        }
        spark.read.parquet(postings0Path)
      } else withBucket

    // Phase B — pre-finalize dictionary (global df/cf) via salted merge,
    // plus termId assignment (dictionary encoding). Every later
    // per-posting shuffle/sort/storage carries the 8-byte termId instead
    // of the term string — the round-1 scaling bottleneck was shuffle
    // bytes + string sort compares in the block range shuffle. Ids come
    // from monotonically_increasing_id(): unique (not dense — uniqueness
    // is all blocks need), assigned in the same codegen pass as the
    // aggregation, no extra job, no single-task stage; they are
    // materialized exactly once (this parquet write) so re-execution
    // nondeterminism cannot leak.
    // fieldId of a term (0 = main text / keyword namespaces, i+1 = the
    // i-th textFieldCol): derived from the term string ONCE here, so the
    // block shuffle carries a run-constant tiny int instead of re-parsing
    // strings, and the encoder can score each posting under its field's
    // stats
    val fieldIdExpr = cfg.textFieldCols.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (f, i)) =>
        when(col("term").startsWith(lit(FieldTerms.textTerm(f, ""))), lit(i + 1)).otherwise(acc)
    }
    // dict0 only consumes (term, docId, tf): when the postings are NOT
    // materialized to parquet (the default — each consumer re-derives
    // the stream), feed it a payload-free re-derivation so the dict
    // pass skips the packed-payload encode entirely (the payload is
    // built inside a typed closure — column pruning can't remove it)
    val dictSource =
      if (cfg.materializePostings) postings0
      else allPostingsOf(docs, withPayload = false)
    phase("dict0") {
      val numShards = cfg.numShards
      val obs = org.apache.spark.sql.Observation()
      val dict0 = dictSalted(dictSource, cfg.salt)
        .as[(String, Long, Long)]
        .map { case (t, df, cf) => (t, GraftHash.shardOf(t, numShards), df, cf) }
        .toDF("term", "shard", "df", "cf")
        // termId PACKS the shard into its low end (id·numShards + shard,
        // still unique/opaque): the block shuffle can then re-derive
        // shard from termId AFTER the exchange instead of carrying a
        // fifth 8-byte UnsafeRow slot per posting (guide §2.3 — shuffle
        // fewer bytes). monotonically_increasing_id < 2^49 (16-bit
        // partition id · 33-bit counter) so the product cannot overflow
        // for any sane shard count.
        .withColumn("termId",
          monotonically_increasing_id() * lit(numShards.toLong) + col("shard"))
        .withColumn("fieldId", fieldIdExpr)
        // `tidp`: marker that termId is shard-packed — a resume over a
        // pre-packing dict0 (column absent) keeps the legacy wide-row
        // block shuffle (termId % numShards would be garbage there)
        .withColumn("tidp", lit(true))
        .select(col("term"), col("termId"), col("shard"), col("df"), col("cf"),
          col("fieldId"), col("tidp"))
        // vocab + total postings ride the write job (Observation) — the
        // block phase needs Σdf for its hot-term threshold, and reading
        // it back from the manifest costs zero jobs on resume too
        .observe(obs, count(lit(1)).as("vocab"), coalesce(sum(col("df")), lit(0L)).as("p"))
      dict0.write.mode(SaveMode.Overwrite).parquet(dict0Path)
      val totalPostings = obs.get("p").asInstanceOf[Long]
      // dict0 cell: postingsEmitted = Σdf (the corpus posting count);
      // vocab is recorded by the finalize cell
      BuildManifest("dict0", -1, 0, n, snapshotId, totalPostings, 0, "done", 0)
    }
    val dict0 = {
      val d = spark.read.parquet(dict0Path)
      // resume over a dict0 cell written by a pre-fieldId build
      if (d.columns.contains("fieldId")) d else d.withColumn("fieldId", fieldIdExpr)
    }
    val totalPostings = readManifest("dict0").map(_.postingsEmitted).getOrElse(0L)

    // Phase C — compressed blocks per bucket (contiguous docId range).
    val numShards = cfg.numShards
    val blockSize = cfg.blockSize
    val bucketCells = (0 until cfg.numBuckets).map(b => s"bucket=$b")
    if (cfg.fusedBlocks) {
      if (resume && bucketCells.forall(isDone)) skipped ++= bucketCells
      else {
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription("graft build: blocks (fused)")
        // Shuffle schema is deliberately minimal: (termId, shard, docId,
        // df) + the packed payload binary (varint tf + dl + position
        // gaps, built in the tokenize pass). No term string
        // (dict-encoded), no per-posting score (recomputed inside the
        // encoder from the unpacked tf/dl and df — df is run-constant per
        // term, so it lz4-compresses to ~nothing in the sorted shuffle,
        // unlike the high-entropy double it replaces), no fixed-width
        // tf/dl fields (a posting's tf and dl are each ~1 varint byte in
        // the payload vs 8-byte UnsafeRow slots).
        //
        // Partition routing is CLOSED-FORM and df-AWARE — no
        // repartitionByRange sampling pass (which re-executed the whole
        // posting stream):
        //   cold terms (df < hotDf): term-major — all of a term's postings
        //     in a bucket land in ONE partition (pmod(hash(termId), ppb)),
        //     so block lists stay compact (~df/blockSize blocks). No cold
        //     term can skew a partition: its posting share is bounded by
        //     hotDf/totalPostings ≤ 1/(4·numParts).
        //   hot terms (df ≥ hotDf): docId-sliced across ALL of the
        //     bucket's partitions (the north-rule "salted-repartition
        //     merge", salt = docId range) — a stopword-class term can
        //     never serialize on one reducer, and with hotDf ≥
        //     numParts·blockSize every slice still fills whole blocks.
        // Within a partition, sort on (termId, docId) restores term runs;
        // across partitions a hot term's runs are docId-disjoint slices —
        // exactly the invariant WAND needs of its block lists.
        // Partition count is sized to per-task SORT memory, not to cores:
        // each partition's postings are sorted in executor memory, so a
        // partition must stay ~targetSortBytes regardless of parallelism
        // (round-2 finding: partitions = cores made high-core runs spill
        // — ~64 B/posting in the sorter — while low-core runs of the same
        // corpus fit, silently skewing the N-vs-4N comparison; at 10^12
        // turns "partitions = cores" would be off by orders of magnitude
        // anyway). cores only set the FLOOR so all slots stay busy.
        // clamped to the inverse-key-table cap (DirectPartition.MaxParts);
        // past it, partitions exceed targetSortBytes and the external
        // sorter spills — graceful, and 64k × 128 MB already covers ~10^11
        // postings per build (larger corpora run as several fused builds
        // over docId sub-ranges, per the fusedBlocks doc above)
        val sortBytesPerPosting = 64L
        val targetSortBytes = 128L << 20
        val neededParts = math.min(DirectPartition.MaxParts.toLong,
          1L + totalPostings * sortBytesPerPosting / targetSortBytes).toInt
        val partsPerBucket = math.max(1, math.min(
          DirectPartition.MaxParts / cfg.numBuckets,
          math.max(cfg.partitions, neededParts) / cfg.numBuckets))
        val subWidth = math.max(1L, (bucketWidth + partsPerBucket - 1) / partsPerBucket)
        val numParts = cfg.numBuckets * partsPerBucket
        val hotDf = math.max(numParts.toLong * blockSize,
          totalPostings / (4L * math.max(1, numParts)))
        // bucket never rides the shuffled rows: the pid expression derives
        // it from docId (closed form), every resulting partition is
        // single-bucket, and the encoder re-derives it from
        // docId/bucketWidth. The routing key is a bare expression too —
        // nothing but (termId, shard, docId, df, pay) enters the
        // shuffle/sort.
        // fieldId rides the shuffle ONLY when extra text fields exist:
        // a plain build re-derives the constant 0 AFTER the exchange
        // (projected above the sort), so its shuffle bytes/turn stay
        // exactly the round-4 shape (bench-tracked)
        val hasTextFields = cfg.textFieldCols.nonEmpty
        // shard-packed termIds (dict0 `tidp` marker): the shuffle rows
        // drop the shard slot entirely — it is re-derived from termId
        // AFTER the exchange (one projection over the sorted stream).
        // A resume over a pre-packing dict0 keeps the legacy wide row.
        val packedTid = dict0.columns.contains("tidp")
        // term→(termId, df, fieldId) TRANSLATE map (round-9, see
        // IndexConfig.maxTranslateVocab): when the vocabulary fits, the
        // posting generators resolve ids inside the tokenize closure and
        // the string join disappears from the plan (its probe was ~24%
        // of build executor CPU). Applies only to the default re-derive
        // mode over a shard-packed dict0; materialized postings and
        // legacy-resume keep the join (over-gate vocabularies fall back
        // to it too — AQE sizes that join as before).
        val translate: IndexBuilder.Translate =
          if (!packedTid || cfg.materializePostings || cfg.maxTranslateVocab <= 0) None
          else if (dict0.count() > cfg.maxTranslateVocab) None
          else {
            val rows = dict0.select(col("term"), col("termId"), col("df"), col("fieldId"))
              .as[(String, Long, Long, Int)].collect()
            val m = new java.util.HashMap[String, Array[Long]](rows.length * 2)
            rows.foreach { case (t, tid, df, fid) => m.put(t, Array(tid, df, fid.toLong)) }
            Some(spark.sparkContext.broadcast(m))
          }
        val scored = translate match {
          case Some(_) =>
            allPostingsOf(docs, withPayload = true, translate = translate)
              .select(Seq(col("termId"), col("docId"), col("df"), col("pay")) ++
                (if (hasTextFields) Seq(col("fieldId")) else Nil): _*)
          case None => postings0
            .join(dict0.select(Seq(col("term"), col("termId")) ++
              (if (packedTid) Nil else Seq(col("shard"))) ++ Seq(col("df")) ++
              (if (hasTextFields) Seq(col("fieldId")) else Nil): _*), Seq("term"))
            .select(Seq(col("termId")) ++
              (if (packedTid) Nil else Seq(col("shard"))) ++
              Seq(col("docId"), col("df"), col("pay")) ++
              (if (hasTextFields) Seq(col("fieldId")) else Nil): _*)
        }
        val bucketExpr = least(floor(col("docId") / lit(bucketWidth)), lit(cfg.numBuckets - 1L))
        val slicePid = least(
          floor((col("docId") - bucketExpr * lit(bucketWidth)) / lit(subWidth)),
          lit(partsPerBucket - 1L))
        val pid = bucketExpr * lit(partsPerBucket) +
          when(col("df") >= lit(hotDf), slicePid)
            .otherwise(pmod(hash(col("termId")), lit(partsPerBucket)))
        val nBuckets = cfg.numBuckets // local copy: the closure must not capture `this`
        val bw = bucketWidth
        val fNs = fieldNs
        val fAds = fieldAvgdls
        val sorted = DirectPartition.byComputedPid(scored, pid, numParts)
          .sortWithinPartitions(col("termId"), col("docId"))
        // re-attach shard post-exchange for packed termIds (a Project
        // above the sort — row order within partitions is preserved);
        // encoder tuple order is (termId, shard, docId, df, pay[, fieldId])
        val shuffled =
          if (!packedTid) sorted
          else sorted.select(Seq(col("termId"),
            pmod(col("termId"), lit(cfg.numShards.toLong)).cast("int").as("shard"),
            col("docId"), col("df"), col("pay")) ++
            (if (hasTextFields) Seq(col("fieldId")) else Nil): _*)
        val blocks = (if (hasTextFields) shuffled
          else shuffled.withColumn("fieldId", lit(0)))
          .as[(Long, Int, Long, Long, Array[Byte], Int)]
          .mapPartitions(rows => BlockEncoder.encodeFused(rows, blockSize, fNs, fAds,
            bw, nBuckets))
        // ONE pass, no cache: the encoded blocks flow straight into the
        // parquet write, carrying a precomputed per-block byte count
        // (`nbytes`), and the term partials aggregate from a
        // COLUMN-PRUNED read of the just-written store (bucket/termId/
        // maxScore/count/nbytes — a few MB) instead of a MEMORY_AND_DISK
        // persist of the whole encoded index (guide §5: cache only when
        // recompute is dearer — here "recompute" is a metadata-column
        // scan; the persist was a full extra copy of every payload byte
        // through the block manager inside the timed build). Readers
        // bind block columns by name, so the extra column is invisible
        // to them; compaction re-selects named columns and drops it.
        blocks
          .withColumn("nbytes", length(col("docs")) + length(col("tfs"))
            + length(col("dls")) + length(col("poss")))
          .write.partitionBy("bucket", "shard")
          .mode(SaveMode.Overwrite).parquet(blocksPath)
        spark.read.parquet(blocksPath)
          .groupBy(col("bucket"), col("termId"))
          .agg(max(col("maxScore")).as("maxScore"), sum(col("count")).as("dfb"),
            sum(col("nbytes")).as("bytesb"))
          .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(partialsPath)
        translate.foreach(_.unpersist(false))
        // per-bucket manifest metrics: one tiny groupBy over the just-
        // written partials (round-2 review: an Observation with
        // 2×numBuckets conditional sums is an 8192-expression
        // CollectMetrics at the sized() bucket cap — evaluated per row)
        val perBucket = spark.read.parquet(partialsPath)
          .groupBy(col("bucket"))
          .agg(coalesce(sum(col("dfb")), lit(0L)).as("p"),
            coalesce(sum(col("bytesb")), lit(0L)).as("y"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        val wall = (System.nanoTime() - t0) / 1e9
        for (b <- 0 until cfg.numBuckets) {
          val lo = b.toLong * bucketWidth
          val hi = math.min(idBound, lo + bucketWidth)
          val (p, y) = perBucket.getOrElse(b, (0L, 0L))
          writeManifest(BuildManifest(s"bucket=$b", b, lo, hi, snapshotId,
            p, y, "done", wall / cfg.numBuckets))
          built += s"bucket=$b"
        }
        spark.sparkContext.setJobDescription(null)
      }
    } else for (b <- 0 until cfg.numBuckets) {
      val lo = b.toLong * bucketWidth
      val hi = math.min(idBound, lo + bucketWidth)
      phase(s"bucket=$b") {
        val scored = postings0.filter(col("bucket") === lit(b))
          .join(dict0.select(col("term"), col("termId"), col("shard"), col("df"),
            col("fieldId")), Seq("term"))
          .select(col("termId"), col("shard"), col("docId"), col("df"), col("pay"),
            col("fieldId"))
        // same sample-free df-aware routing + sort-memory partition
        // sizing as the fused path (per-bucket share of the postings)
        val perBucketPostings = math.max(1L, totalPostings / cfg.numBuckets)
        val neededParts = math.min(DirectPartition.MaxParts.toLong,
          1L + perBucketPostings * 64L / (128L << 20)).toInt
        val nParts = math.min(DirectPartition.MaxParts, math.max(cfg.partitions, neededParts))
        val hotDf = math.max(nParts.toLong * blockSize,
          totalPostings / (4L * math.max(1, nParts)))
        val subWidth = math.max(1L, (bucketWidth + nParts - 1) / nParts)
        val pid = when(col("df") >= lit(hotDf),
            least(floor((col("docId") - lit(lo)) / lit(subWidth)), lit(nParts - 1L)))
          .otherwise(pmod(hash(col("termId")), lit(nParts)))
        val fNs = fieldNs
        val fAds = fieldAvgdls
        val blocks = DirectPartition.byComputedPid(scored, pid, nParts)
          .sortWithinPartitions(col("termId"), col("docId"))
          .as[(Long, Int, Long, Long, Array[Byte], Int)]
          .mapPartitions(rows => BlockEncoder.encode(rows, b, blockSize, fNs, fAds))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        blocks.drop("bucket").write.partitionBy("shard")
          .mode(SaveMode.Overwrite).parquet(s"$blocksPath/bucket=$b")
        // per-bucket term partials straight off the cached blocks (no
        // second pass over the postings): exact max block score + df/bytes
        blocks.groupBy(col("termId"))
          .agg(max(col("maxScore")).as("maxScore"), sum(col("count")).as("dfb"),
            sum(length(col("docs")) + length(col("tfs")) + length(col("dls")) + length(col("poss"))).as("bytesb"))
          .write.mode(SaveMode.Overwrite).parquet(s"$partialsPath/bucket=$b")
        blocks.unpersist(blocking = false)
        val mrow = spark.read.parquet(s"$partialsPath/bucket=$b")
          .agg(coalesce(sum(col("dfb")), lit(0L)), coalesce(sum(col("bytesb")), lit(0L))).head()
        BuildManifest(s"bucket=$b", b, lo, hi, snapshotId, mrow.getLong(0), mrow.getLong(1), "done", 0)
      }
    }

    // Phase D — finalize dictionary: df/cf from dict0, global max score
    // from the per-bucket block partials.
    phase("finalize") {
      val obs = org.apache.spark.sql.Observation()
      val maxs = spark.read.parquet(partialsPath)
        .groupBy(col("termId")).agg(max(col("maxScore")).as("maxScore"))
      val dict = dict0
        .join(maxs, Seq("termId"))
        .select(col("term"), col("termId"), col("shard"), col("df"), col("cf"), col("maxScore"))
        .observe(obs, count(lit(1)).as("vocab"))
        .as[TermStats]
      // `len` (bare-token length) rides along for edit-distance scan
      // pruning; TermStats readers ignore it by name-binding
      dict.withColumn("len", FieldTerms.bareLenCol(col("term")))
        .write.mode(SaveMode.Overwrite).parquet(dictPath)
      // provenance stamp: min(existing lineage, this writer) — a fresh
      // build's start-stamp makes this Version; a resume over an OLDER
      // writer's posting cells finds no flag (Legacy) and stays Legacy,
      // so exists/missing on those marker-less postings fails loudly
      // instead of silently inverting (round-7 review)
      IndexFormat.write(fs, indexDir,
        math.min(IndexFormat.version(fs, indexDir), IndexFormat.Version))
      BuildManifest("finalize", -1, 0, n, snapshotId,
        obs.get("vocab").asInstanceOf[Long], 0, "done", 0)
    }

    val ms = allManifests
    BuildReport(
      n, avgdl,
      readManifest("finalize").map(_.postingsEmitted).getOrElse(0L),
      ms.filter(_.cell.startsWith("bucket=")).map(_.postingsEmitted).sum,
      ms.filter(_.cell.startsWith("bucket=")).map(_.bytesCompressed).sum,
      built.toSeq, skipped.toSeq
    )

    } finally oldSplit match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }
}

object IndexBuilder {
  /** Broadcast dict0 translate map: term → [termId, df, fieldId]
    * (see IndexConfig.maxTranslateVocab). None = use the join path.
    */
  type Translate =
    Option[org.apache.spark.broadcast.Broadcast[java.util.HashMap[String, Array[Long]]]]

  /** Loud-guard translate lookup: every generated term MUST be in dict0
    * (both derive from the same deterministic posting stream); a miss
    * means the docs or config diverged from the dictionary's lineage,
    * and silently dropping the posting would corrupt the index.
    */
  def resolved(m: java.util.HashMap[String, Array[Long]], term: String): Array[Long] = {
    val v = m.get(term)
    if (v == null) throw new IllegalStateException(
      s"term '$term' is absent from the dict0 translate map — the posting stream " +
        "diverged from the dictionary lineage (rebuild without resume)")
    v
  }
}

/** Reusable per-(doc, term) position accumulator for the tokenize pass:
  * a growable int list with a direct packed-payload encoder.
  */
private[index] final class PosAcc {
  var n: Int = 0
  private var buf: Array[Int] = _
  def add(p: Int): Unit = {
    if (buf == null) buf = new Array[Int](4)
    else if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
    buf(n) = p
    n += 1
  }

  /** Packed posting payload: varint(tf), varint(dl), then the varint
    * position GAP stream (first absolute, then deltas — tf entries, so
    * no length prefix is needed; [[Codec.unpackPayload]] is the inverse).
    * Encoded here, in the tokenize pass, so the block shuffle carries one
    * ~3-byte binary per posting instead of fixed-width tf/dl columns plus
    * a separate position array.
    */
  def payload(dl: Int, withPos: Boolean): Array[Byte] = {
    // exact-size two-pass fill (Codec.varLen/putVar) — this runs once
    // per posting in the tokenize pass; the former per-call
    // ByteArrayOutputStream (synchronized writes + grow + toByteArray
    // copy) was measurable allocation churn at ~40 M postings/M-turns.
    // Bytes produced are identical.
    var sz = Codec.varLen(n.toLong) + Codec.varLen(dl.toLong)
    if (withPos) {
      var prev = 0
      var i = 0
      while (i < n) { sz += Codec.varLen((buf(i) - prev).toLong); prev = buf(i); i += 1 }
    }
    val a = new Array[Byte](sz)
    var off = Codec.putVar(a, 0, n.toLong)
    off = Codec.putVar(a, off, dl.toLong)
    if (withPos) {
      var prev = 0
      var i = 0
      while (i < n) {
        off = Codec.putVar(a, off, (buf(i) - prev).toLong)
        prev = buf(i)
        i += 1
      }
    }
    a
  }
}

/** Streaming run-grouping block encoder: consumes (termId, shard, docId,
  * df, pay) rows sorted by (termId, docId) and emits compressed blocks,
  * holding at most `blockSize` postings in memory at a time. `pay` is
  * the tokenize pass's packed payload (varint tf + dl + position gaps,
  * PosAcc.payload) — unpacked here, after the shuffle. Per-posting BM25
  * scores (for the exact block-max metadata) are computed HERE too, from
  * the unpacked (tf, dl) and (df, n, avgdl) — the high-entropy score
  * double never rides the shuffle.
  */
object BlockEncoder {

  /** One shuffled posting row: (termId, shard, docId, df, pay,
    * fieldId). fieldId (run-constant per term — lz4s to ~nothing in the
    * sorted shuffle) selects which (n, avgdl) pair scores the posting:
    * index 0 = the main text / corpus stats, i ≥ 1 = the i-th
    * additional analyzed text field's own stats (per-field BM25).
    */
  type Row = (Long, Int, Long, Long, Array[Byte], Int)

  /** Fused-mode encoder: rows sorted by (termId, docId). The bucket is
    * NOT carried in the rows — it is re-derived from docId (buckets are
    * fixed docId ranges). Runs are grouped on (termId, bucket);
    * docId-sorted order makes bucket monotonic within a termId run, so
    * both are contiguous.
    */
  def encodeFused(
      rows: Iterator[Row],
      blockSize: Int,
      fieldNs: Array[Long],
      fieldAvgdls: Array[Double],
      bucketWidth: Long,
      numBuckets: Int
  ): Iterator[PostingBlock] = {
    def bucketOf(docId: Long): Int =
      math.min(docId / bucketWidth, (numBuckets - 1).toLong).toInt
    val grouped = new Iterator[Iterator[PostingBlock]] {
      private val it = rows.buffered
      override def hasNext: Boolean = it.hasNext
      override def next(): Iterator[PostingBlock] = {
        val termId = it.head._1
        val bucket = bucketOf(it.head._3)
        val run = new scala.collection.mutable.ArrayBuffer[Row]()
        while (it.hasNext && it.head._1 == termId && bucketOf(it.head._3) == bucket)
          run += it.next()
        encode(run.iterator, bucket, blockSize, fieldNs, fieldAvgdls)
      }
    }
    grouped.flatten
  }

  def encode(
      rows: Iterator[Row],
      bucket: Int,
      blockSize: Int,
      fieldNs: Array[Long],
      fieldAvgdls: Array[Double]
  ): Iterator[PostingBlock] = new Iterator[PostingBlock] {
    private val it = rows.buffered
    private var out: Iterator[PostingBlock] = Iterator.empty

    private def fill(): Unit = {
      while (!out.hasNext && it.hasNext) {
        val termId = it.head._1
        val shard = it.head._2
        val ids = new scala.collection.mutable.ArrayBuffer[Long](blockSize)
        val tfs = new scala.collection.mutable.ArrayBuffer[Int](blockSize)
        val dls = new scala.collection.mutable.ArrayBuffer[Int](blockSize)
        val scs = new scala.collection.mutable.ArrayBuffer[Double](blockSize)
        val pss = new scala.collection.mutable.ArrayBuffer[Array[Byte]](blockSize)
        val acc = new scala.collection.mutable.ArrayBuffer[PostingBlock]()
        var blockId = 0
        def flush(): Unit = if (ids.nonEmpty) {
          acc ++= Codec.encodeBlocks(termId, shard, bucket,
            ids.toArray, tfs.toArray, dls.toArray, scs.toArray, pss.toArray, blockSize)
            .map(_.copy(blockId = blockId))
          blockId += 1
          ids.clear(); tfs.clear(); dls.clear(); scs.clear(); pss.clear()
        }
        while (it.hasNext && it.head._1 == termId) {
          val r = it.next()
          val (tf, dl, pos) = Codec.unpackPayload(r._5)
          val fid = if (r._6 >= 0 && r._6 < fieldNs.length) r._6 else 0
          ids += r._3; tfs += tf; dls += dl; pss += pos
          scs += Bm25.score(tf, r._4, dl, fieldNs(fid), fieldAvgdls(fid))
          if (ids.length == blockSize) flush()
        }
        flush()
        out = acc.iterator
      }
    }
    override def hasNext: Boolean = { fill(); out.hasNext }
    override def next(): PostingBlock = { fill(); out.next() }
  }
}
