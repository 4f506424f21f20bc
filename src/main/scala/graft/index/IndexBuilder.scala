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
    materializePostings: Boolean = false
)

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
  * block building is defused structurally: blocks are produced after a
  * `repartitionByRange(term, docId)`, which splits a hot term's postings
  * across partitions by docId range (the "salted-repartition merge" of
  * the north rule — salt = docId range); dictionary stats additionally go
  * through an explicit two-phase salted aggregation (groupBy(term, salt)
  * partials → groupBy(term) final) so no single reducer ever sees a whole
  * hot term. Every cell write is an idempotent per-directory overwrite;
  * the manifest marks a cell done only after the write commits, so a
  * killed build resumes by skipping done cells (north_rule resumability).
  *
  * At 10^12-turn scale the same plan holds: docs/blocks are partitioned
  * parquet/iceberg, every shuffle is keyed on (term, docId) or (term,
  * salt) — no global single-task stage anywhere, and the dictionary join
  * is AQE-broadcast when the vocabulary is small enough, shuffle join
  * otherwise.
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
  def postings0Path = s"$indexDir/postings0"
  def dict0Path = s"$indexDir/dict0"
  def blocksPath = s"$indexDir/blocks"
  def partialsPath = s"$indexDir/termpartials"
  def dictPath = s"$indexDir/dict"
  private def manifestDir = new Path(root, "manifest")

  // --- manifest (checkpoint) ---------------------------------------------
  private def cellFile(cell: String) = new Path(manifestDir, cell.replace('=', '-') + ".props")

  private def writeManifest(m: BuildManifest): Unit = {
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

  /** (term, docId, tf, dl) postings. `dl` rides through the explode so no
    * big doc-side join is ever needed (SURVEY.md A6).
    */
  def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("docId"), col("dl"), explode(Analyzer.tokensCol(col("text"))).as("term"))
      .groupBy(col("term"), col("docId"), col("dl"))
      .agg(count(lit(1)).cast("int").as("tf"))

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

  def build(docsIn: Dataset[Doc], resume: Boolean = true): BuildReport = {
    val built = scala.collection.mutable.ArrayBuffer[String]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    def phase[T](cell: String)(body: => BuildManifest): Unit =
      if (resume && isDone(cell)) skipped += cell
      else {
        val t0 = System.nanoTime()
        val m = body
        writeManifest(m.copy(wallSec = (System.nanoTime() - t0) / 1e9))
        built += cell
      }

    // Phase A — doc store + corpus stats.
    phase("docs") {
      docsIn.write.mode(SaveMode.Overwrite).parquet(docsPath)
      val d = spark.read.parquet(docsPath)
      val row = d.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"),
        max(col("docId")).as("mx")).head()
      val n = row.getLong(0)
      val avgdl = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      val bound = if (row.isNullAt(2)) 0L else row.getLong(2) + 1L
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
    if (n == 0)
      return BuildReport(0, 0.0, 0, 0, 0, built.toSeq, skipped.toSeq)
    val idBound = readManifest("docs").map(_.docIdHi).getOrElse(n)
    val bucketWidth = math.max(1L, (idBound + cfg.numBuckets - 1) / cfg.numBuckets)

    // Phase B0 — tokenize ONCE: postings either checkpointed to parquet
    // (own resume cell) or pinned in a spillable cache; the dictionary
    // pass and every bucket cell reuse them without re-scanning the
    // corpus (at 10^12 turns, tokenization is the dominant CPU cost —
    // one pass, not B+1).
    val withBucket = postingsOf(docs)
      .withColumn("bucket", least(floor(col("docId") / lit(bucketWidth)),
        lit(cfg.numBuckets - 1)).cast("int"))
    val postings0 =
      if (cfg.materializePostings) {
        phase("postings") {
          withBucket.write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(postings0Path)
          BuildManifest("postings", -1, 0, idBound, snapshotId, 0, 0, "done", 0)
        }
        spark.read.parquet(postings0Path)
      } else
        withBucket.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Phase B — pre-finalize dictionary (global df/cf) via salted merge.
    phase("dict0") {
      val numShards = cfg.numShards
      val dict0 = dictSalted(postings0, cfg.salt)
        .as[(String, Long, Long)]
        .map { case (t, df, cf) => (t, GraftHash.shardOf(t, numShards), df, cf) }
        .toDF("term", "shard", "df", "cf")
      dict0.write.mode(SaveMode.Overwrite).parquet(dict0Path)
      val vocab = spark.read.parquet(dict0Path).count()
      BuildManifest("dict0", -1, 0, n, snapshotId, vocab, 0, "done", 0)
    }
    val dict0 = spark.read.parquet(dict0Path)

    // Phase C — compressed blocks per bucket (contiguous docId range).
    val numShards = cfg.numShards
    val blockSize = cfg.blockSize
    val bucketCells = (0 until cfg.numBuckets).map(b => s"bucket=$b")
    if (cfg.fusedBlocks) {
      if (resume && bucketCells.forall(isDone)) skipped ++= bucketCells
      else {
        val t0 = System.nanoTime()
        val scored = postings0
          .join(dict0.select(col("term"), col("df")), Seq("term"))
          .withColumn("score", Bm25.scoreCol(col("tf"), col("df"), col("dl"), n, avgdl))
          .select(col("bucket"), col("term"), col("docId"), col("tf"), col("dl"), col("score"))
          .as[(Int, String, Long, Int, Int, Double)]
        val blocks = scored
          .repartitionByRange(cfg.partitions, col("bucket"), col("term"), col("docId"))
          .sortWithinPartitions(col("bucket"), col("term"), col("docId"))
          .mapPartitions(rows => BlockEncoder.encodeFused(rows, numShards, blockSize))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        blocks.write.partitionBy("bucket", "shard")
          .mode(SaveMode.Overwrite).parquet(blocksPath)
        blocks.groupBy(col("bucket"), col("term"))
          .agg(max(col("maxScore")).as("maxScore"), sum(col("count")).as("dfb"),
            sum(length(col("docs")) + length(col("tfs")) + length(col("dls"))).as("bytesb"))
          .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(partialsPath)
        blocks.unpersist(blocking = false)
        val wall = (System.nanoTime() - t0) / 1e9
        val byBucket = spark.read.parquet(partialsPath)
          .groupBy(col("bucket"))
          .agg(coalesce(sum(col("dfb")), lit(0L)), coalesce(sum(col("bytesb")), lit(0L)))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        for (b <- 0 until cfg.numBuckets) {
          val lo = b.toLong * bucketWidth
          val hi = math.min(idBound, lo + bucketWidth)
          val (p, bytes) = byBucket.getOrElse(b, (0L, 0L))
          writeManifest(BuildManifest(s"bucket=$b", b, lo, hi, snapshotId, p, bytes,
            "done", wall / cfg.numBuckets))
          built += s"bucket=$b"
        }
      }
    } else for (b <- 0 until cfg.numBuckets) {
      val lo = b.toLong * bucketWidth
      val hi = math.min(idBound, lo + bucketWidth)
      phase(s"bucket=$b") {
        val scored = postings0.filter(col("bucket") === lit(b))
          .join(dict0.select(col("term"), col("df")), Seq("term"))
          .withColumn("score", Bm25.scoreCol(col("tf"), col("df"), col("dl"), n, avgdl))
          .select(col("term"), col("docId"), col("tf"), col("dl"), col("score"))
          .as[(String, Long, Int, Int, Double)]
        val blocks = scored
          .repartitionByRange(cfg.partitions, col("term"), col("docId"))
          .sortWithinPartitions(col("term"), col("docId"))
          .mapPartitions(rows => BlockEncoder.encode(rows, b, numShards, blockSize))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        blocks.drop("bucket").write.partitionBy("shard")
          .mode(SaveMode.Overwrite).parquet(s"$blocksPath/bucket=$b")
        // per-bucket term partials straight off the cached blocks (no
        // second pass over the postings): exact max block score + df/bytes
        blocks.groupBy(col("term"))
          .agg(max(col("maxScore")).as("maxScore"), sum(col("count")).as("dfb"),
            sum(length(col("docs")) + length(col("tfs")) + length(col("dls"))).as("bytesb"))
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
      val maxs = spark.read.parquet(partialsPath)
        .groupBy(col("term")).agg(max(col("maxScore")).as("maxScore"))
      val dict = dict0.select(col("term"), col("df"), col("cf"))
        .join(maxs, Seq("term"))
        .select(col("term"), col("df"), col("cf"), col("maxScore"))
        .as[(String, Long, Long, Double)]
        .map { case (t, df, cf, ms) => TermStats(t, GraftHash.shardOf(t, numShards), df, cf, ms) }
      dict.write.mode(SaveMode.Overwrite).parquet(dictPath)
      val vocab = spark.read.parquet(dictPath).count()
      BuildManifest("finalize", -1, 0, n, snapshotId, vocab, 0, "done", 0)
    }

    if (!cfg.materializePostings) postings0.unpersist(blocking = false)
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

/** Streaming run-grouping block encoder: consumes (term, docId, tf, dl,
  * score) rows sorted by (term, docId) and emits compressed blocks,
  * holding at most `blockSize` postings in memory at a time.
  */
object BlockEncoder {

  /** Fused-mode encoder: rows sorted by (bucket, term, docId); runs are
    * grouped on (bucket, term).
    */
  def encodeFused(
      rows: Iterator[(Int, String, Long, Int, Int, Double)],
      numShards: Int,
      blockSize: Int
  ): Iterator[PostingBlock] = {
    val grouped = new Iterator[Iterator[PostingBlock]] {
      private val it = rows.buffered
      override def hasNext: Boolean = it.hasNext
      override def next(): Iterator[PostingBlock] = {
        val (bucket, term) = (it.head._1, it.head._2)
        val run = new scala.collection.mutable.ArrayBuffer[(String, Long, Int, Int, Double)]()
        while (it.hasNext && it.head._1 == bucket && it.head._2 == term) {
          val r = it.next()
          run += ((r._2, r._3, r._4, r._5, r._6))
        }
        encode(run.iterator, bucket, numShards, blockSize)
      }
    }
    grouped.flatten
  }

  def encode(
      rows: Iterator[(String, Long, Int, Int, Double)],
      bucket: Int,
      numShards: Int,
      blockSize: Int
  ): Iterator[PostingBlock] = new Iterator[PostingBlock] {
    private val it = rows.buffered
    private var out: Iterator[PostingBlock] = Iterator.empty

    private def fill(): Unit = {
      while (!out.hasNext && it.hasNext) {
        val term = it.head._1
        val shard = GraftHash.shardOf(term, numShards)
        val ids = new scala.collection.mutable.ArrayBuffer[Long](blockSize)
        val tfs = new scala.collection.mutable.ArrayBuffer[Int](blockSize)
        val dls = new scala.collection.mutable.ArrayBuffer[Int](blockSize)
        val scs = new scala.collection.mutable.ArrayBuffer[Double](blockSize)
        val acc = new scala.collection.mutable.ArrayBuffer[PostingBlock]()
        var blockId = 0
        def flush(): Unit = if (ids.nonEmpty) {
          acc ++= Codec.encodeBlocks(term, shard, bucket,
            ids.toArray, tfs.toArray, dls.toArray, scs.toArray, blockSize)
            .map(_.copy(blockId = blockId))
          blockId += 1
          ids.clear(); tfs.clear(); dls.clear(); scs.clear()
        }
        while (it.hasNext && it.head._1 == term) {
          val r = it.next()
          ids += r._2; tfs += r._3; dls += r._4; scs += r._5
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
