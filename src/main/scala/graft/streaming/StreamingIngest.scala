package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexBuilder, IndexConfig}
import graft.model.{Doc, Turn}

/** Structured-Streaming front end for the engine (the reference's only
  * "incremental" behavior is append-to-existing-index batch runs,
  * NeoFinderToES.java:184-192; this is its streaming-native upgrade).
  *
  * Pattern: `readStream` over arriving transcript files → `foreachBatch`
  * → each micro-batch becomes one new index bucket/segment (exactly the
  * Lucene segment model: docId-disjoint ranges, query-time merge across
  * segments). docIds for batch b start at a per-batch base offset so
  * ranges never overlap; corpus stats/dictionary are refreshed by the
  * periodic finalize (or a full rebuild compaction — out of scope here).
  */
object StreamingIngest {

  /** Incremental ingest: every micro-batch of turns is assigned docIds
    * after the current max and appended as a new bucket segment.
    * Returns the running query; stop it via `.stop()`.
    */
  def ingestToIndex(
      spark: SparkSession,
      sourceDir: String,
      indexDir: String,
      cfg: IndexConfig = IndexConfig(numBuckets = 1),
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Turn].schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir).as[Turn]
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$indexDir/_stream_checkpoint")
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        appendSegment(spark, batch, indexDir, batchId, cfg)
      }
      .start()
  }

  /** One micro-batch → one segment directory under the index, with its
    * own manifest cells (lineage = snapshotId "stream-batch-<id>").
    */
  def appendSegment(
      spark: SparkSession,
      batch: Dataset[Turn],
      indexDir: String,
      batchId: Long,
      cfg: IndexConfig
  ): Unit = {
    import spark.implicits._
    if (batch.isEmpty) return
    val base = currentMaxDocId(spark, indexDir) + 1
    val docs = graft.index.DocIds.assign(graft.index.DocIds.dedup(batch), cfg.partitions)
      .map(d => d.copy(docId = d.docId + base))
    new IndexBuilder(spark, s"$indexDir/seg-$batchId", s"stream-batch-$batchId", cfg)
      .build(docs)
    docs.unpersist(blocking = false)
  }

  /** Max docId across segments — from each segment's `docs` manifest
    * cell (docIdHi is the exclusive bound the build records), so this is
    * pure filesystem metadata: ZERO Spark jobs per micro-batch (round-2
    * review: the per-segment max(docId) job made ingest degrade
    * O(segments)). Falls back to a scan only for a segment with a
    * missing/corrupt manifest.
    */
  private[streaming] def currentMaxDocId(spark: SparkSession, indexDir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(indexDir))) return -1L
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(indexDir))
      .filter(_.getPath.getName.startsWith("seg-")).map(_.getPath.toString)
    if (segs.isEmpty) -1L
    else segs.map { s =>
      new IndexBuilder(spark, s, "", IndexConfig()).readManifest("docs") match {
        case Some(m) => m.docIdHi - 1
        case None =>
          try spark.read.parquet(s"$s/docs").agg(max(col("docId"))).head().getLong(0)
          catch { case _: Exception => -1L }
      }
    }.max
  }

  /** Streaming analytics over the turn stream itself: per-role turn
    * counts in event-time windows with a watermark (SURVEY.md §2.10 —
    * the windowed-agg shape; demo of the engine's streaming surface).
    */
  def turnRates(turns: DataFrame, window: String, watermark: String): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("role"))
      .agg(count(lit(1)).as("n_turns"), approx_count_distinct(col("conv_id")).as("n_convs"))
}
