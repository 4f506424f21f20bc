package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches via
  * typed mapPartitions (the Scala analog of mapInPandas batch UDFs).
  *
  * The actual media decoders (JPEG/PNG/audio codecs) are NOT available
  * in this container, so `decodeStub` is a clearly-marked DETERMINISTIC
  * FAKE — it derives metadata purely from byte length/content so the
  * Spark-side plumbing (schema, batching, partitioning, frame sampling)
  * is real and testable. Swap `decodeStub` for a real decoder on a
  * cluster with codecs installed.
  */
object Multimodal {

  final case class MediaDoc(doc_id: Long, mime: String, media: Array[Byte])
  final case class MediaMeta(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)
  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Attach a deterministic binary payload to a text table (test stand-in
    * for real media bytes: UTF-8 of the text).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): Dataset[MediaDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        val bytes = Option(t).getOrElse("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaDoc(id, if (id % 2 == 0) "image/fake" else "video/fake", bytes)
      }
  }

  /** DETERMINISTIC FAKE decoder — stands in for codecs the JDK lacks
    * (video/audio). Real implementation would be: `??? // decode bytes`.
    */
  def decodeStub(d: MediaDoc): MediaMeta = {
    val n = d.media.length
    MediaMeta(d.doc_id, d.mime, n, 64 + n % 640, 64 + n % 480, 1 + n % 16)
  }

  /** Real decode for the JDK-supported raster formats (PNG/JPEG/GIF/BMP
    * via javax.imageio — ships with the JDK, no external codec needed):
    * true width/height from the image header. Payloads ImageIO cannot
    * parse (fake test payloads, video/audio) fall back to the stub.
    */
  def decode(d: MediaDoc): MediaMeta = {
    if (d.mime != null && d.mime.startsWith("image/")) {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d.media))
        catch { case _: Exception => null }
      if (img != null)
        return MediaMeta(d.doc_id, d.mime, d.media.length, img.getWidth, img.getHeight, 1)
    }
    decodeStub(d)
  }

  /** Batch decode: metadata extraction over partition iterators —
    * the batch shape a real decoder needs (amortized codec init per
    * partition, not per row).
    */
  def extractMeta(media: Dataset[MediaDoc]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // decoder/codec context init happens here, once per batch
      it.map(decode)
    }
  }

  /** Frame sampling: split the payload into n_frames equal byte slices
    * (a real implementation would seek keyframes).
    */
  def sampleFrames(media: Dataset[MediaDoc], everyNth: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { d =>
      val meta = decodeStub(d)
      val n = meta.n_frames
      val sz = math.max(1, d.media.length / math.max(1, n))
      (0 until n by math.max(1, everyNth)).iterator.map { f =>
        val lo = f * sz
        val hi = math.min(d.media.length, lo + sz)
        Frame(d.doc_id, f, java.util.Arrays.copyOfRange(d.media, math.min(lo, d.media.length), hi))
      }
    }
  }
}
