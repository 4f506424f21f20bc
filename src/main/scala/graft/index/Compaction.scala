package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{BuildManifest, IndexStats, PostingBlock, TermStats}
import graft.query.Bm25

final case class CompactionReport(segments: Int, n: Long, vocab: Long, buckets: Int)

/** Segment compaction: merge all `seg-*` sub-indexes under an index dir
  * into ONE ordinary index (readable by a single `Searcher`), WITHOUT
  * re-tokenizing the corpus — the reference's append runs land in one ES
  * index whose segments merge internally (NeoFinderToES.java:184-192);
  * here every micro-batch is a permanent segment until compacted, and
  * both query and ingest degrade O(segments) (round-2 review).
  *
  * What merging costs and why it's cheap: per-segment docId ranges are
  * DISJOINT by construction (StreamingIngest offsets each batch past the
  * previous max), so posting payload bytes (docs/tfs/dls/poss streams)
  * are carried over UNTOUCHED — cost ∝ compressed index size, never
  * corpus tokenize cost. Only three things change:
  *   1. termIds are segment-local → re-mapped through a merged global
  *      dictionary (df/cf summed per term). The re-map join moves only a
  *      dict-sized (segIdx, termIdOld) → (termIdNew, df) table against
  *      the block stream — one keyed shuffle, AQE-broadcast when small.
  *   2. buckets are segment-local docId ranges → shifted by a per-segment
  *      offset so they stay disjoint (WAND needs docId-disjoint block
  *      lists per term — preserved).
  *   3. stored maxScore encodes per-segment stats → re-derived EXACTLY
  *      under the merged (N, Σdl, df) by decoding the tf/dl streams and
  *      rescoring (the payload is not rewritten). The compacted index
  *      therefore serves a plain `Searcher` with tight bounds — no
  *      staleBlockMax mode, unlike `MultiSearcher` over raw segments.
  */
object Compaction {

  /** Merge `indexDir`'s seg-* into a self-contained index at `outDir`. */
  def compact(spark: SparkSession, indexDir: String, outDir: String): CompactionReport = {
    import spark.implicits._
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segments = fs.listStatus(new Path(indexDir)).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("seg-")).map(_.toString).sorted
    require(segments.nonEmpty, s"no seg-* sub-indexes under $indexDir")
    val snap = s"compact:${segments.map(_.split('/').last).mkString(",")}"

    // global stats merge associatively (same recovery as MultiSearcher:
    // per-segment Σdl is integer-valued, round(n·avgdl) is exact)
    val segStats = segments.map(s => spark.read.parquet(s"$s/stats").as[IndexStats].head())
    val n = segStats.map(_.n).sum
    val sumDl = segStats.map(st => math.round(st.avgdl * st.n)).sum
    val avgdl = if (n == 0) 0.0 else sumDl.toDouble / n

    // merged dictionary with fresh termIds — materialized exactly once
    // (monotonically_increasing_id must not be recomputed across the two
    // consumers; same rule as IndexBuilder's dict0 phase)
    val dictUnion = segments.zipWithIndex.map { case (s, i) =>
      spark.read.parquet(s"$s/dict").withColumn("seg", lit(i))
    }.reduce(_ unionByName _).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    dictUnion.groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"), first(col("shard")).as("shard"))
      .withColumn("termId", monotonically_increasing_id())
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/dict0")
    val gdict = spark.read.parquet(s"$outDir/dict0")

    // (seg, termIdOld) → (termIdNew, shard, global df): dict-sized, no
    // posting payload rides this join's build side
    val mapping = dictUnion
      .select(col("seg"), col("term"), col("termId").as("termIdOld"))
      .join(gdict.select(col("term"), col("termId").as("termIdNew"),
        col("shard").as("shardNew"), col("df").as("dfNew")), Seq("term"))
      .select("seg", "termIdOld", "termIdNew", "shardNew", "dfNew")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mapping.count()

    // per-segment bucket offsets (buckets stay disjoint docId ranges)
    val bucketCounts = segments.map { s =>
      new IndexBuilder(spark, s, snap).allManifests
        .filter(_.cell.startsWith("bucket=")).map(_.bucket)
        .maxOption.getOrElse(0) + 1
    }
    val offsets = bucketCounts.scanLeft(0)(_ + _)

    // blocks: re-map termId, shift bucket, rescore block-max under the
    // merged stats; payload byte streams are copied verbatim
    val nG = n
    val avgdlG = avgdl
    val rewritten = segments.zipWithIndex.map { case (s, i) =>
      val m = mapping.filter(col("seg") === lit(i)).drop("seg")
      val off = offsets(i)
      spark.read.parquet(s"$s/blocks")
        .join(m, col("termId") === col("termIdOld"))
        .select(col("termIdNew").as("_1"), col("shardNew").as("_2"),
          (col("bucket") + lit(off)).cast("int").as("_3"), col("blockId").as("_4"),
          col("firstDocId").as("_5"), col("lastDocId").as("_6"), col("count").as("_7"),
          col("docs").as("_8"), col("tfs").as("_9"), col("dls").as("_10"),
          col("poss").as("_11"), col("maxTf").as("_12"), col("dfNew").as("_13"))
    }.reduce(_ unionByName _)
      .as[(Long, Int, Int, Int, Long, Long, Int,
        Array[Byte], Array[Byte], Array[Byte], Array[Byte], Int, Long)]
      .map { r =>
        val blk = PostingBlock(r._1, r._2, r._3, r._4, r._5, r._6, r._7,
          r._8, r._9, r._10, r._11, r._12, 0.0)
        val dec = Codec.decodeBlock(blk)
        var mx = Double.NegativeInfinity
        var i = 0
        while (i < dec.docIds.length) {
          val sc = Bm25.score(dec.tfs(i), r._13, dec.dls(i), nG, avgdlG)
          if (sc > mx) mx = sc
          i += 1
        }
        blk.copy(maxScore = mx)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rewritten.write.partitionBy("bucket", "shard")
      .mode(SaveMode.Overwrite).parquet(s"$outDir/blocks")

    // finalize: dictionary max-score from the rescored blocks (exact
    // global upper bounds — a plain Searcher needs no stale-bound mode)
    val maxs = rewritten.groupBy(col("termId")).agg(max(col("maxScore")).as("maxScore"))
    gdict
      .join(maxs, Seq("termId"))
      .select(col("term"), col("termId"), col("shard"), col("df"), col("cf"), col("maxScore"))
      .as[TermStats]
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/dict")
    rewritten.unpersist(blocking = false)
    mapping.unpersist(blocking = false)
    dictUnion.unpersist(blocking = false)
    val nVocab = spark.read.parquet(s"$outDir/dict").count()

    // doc store union (docIds globally unique already) + stats + manifest
    val obs = org.apache.spark.sql.Observation()
    segments.map(s => spark.read.parquet(s"$s/docs")).reduce(_ unionByName _)
      .observe(obs, coalesce(max(col("docId")), lit(-1L)).as("mx"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/docs")
    val maxDocId = obs.get("mx").asInstanceOf[Long]
    Seq(IndexStats(n, avgdl, snap)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/stats")
    val out = new IndexBuilder(spark, outDir, snap)
    out.writeManifest(BuildManifest("docs", -1, 0, maxDocId + 1, snap, n, 0, "done", 0))
    out.writeManifest(BuildManifest("finalize", -1, 0, n, snap, nVocab, 0, "done", 0))
    CompactionReport(segments.size, n, nVocab, offsets.last)
  }

  /** Compact in place: merge seg-* into `$indexDir/seg-compacted` and
    * remove the source segments, so streaming ingest keeps appending to
    * the same directory (currentMaxDocId reads the compacted segment's
    * manifest) and `MultiSearcher` sees one segment. NOT crash-atomic:
    * the merged index is fully written to `.compact-tmp` before any
    * delete, so a crash mid-swap leaves either the old segments (plus the
    * tmp dir) or the finished swap — recover by re-running or renaming
    * the tmp dir; a production deployment would swap via a manifest
    * pointer instead.
    */
  def compactInPlace(spark: SparkSession, indexDir: String): CompactionReport = {
    val fs = new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$indexDir/.compact-tmp"
    val report = compact(spark, indexDir, tmp)
    val old = fs.listStatus(new Path(indexDir)).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("seg-"))
    old.foreach(p => fs.delete(p, true))
    fs.rename(new Path(tmp), new Path(s"$indexDir/seg-compacted"))
    report
  }
}
