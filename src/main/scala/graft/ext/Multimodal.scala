package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to a typed metadata struct; decode / feature
  * extraction runs batch-wise inside mapPartitions.
  *
  * The decode itself is a STUB (no image/audio libraries in this
  * container): `stubDecode` derives deterministic fake dimensions from the
  * byte payload. The Spark-side plumbing — schema, case classes, batched
  * partition processing, partition sizing — is real and tested. At cluster
  * scale, binary payloads dominate row size: keep
  * spark.sql.files.maxPartitionBytes at its default 128 MB so a partition
  * holds a bounded number of blobs, and never collect() a binary column.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class DecodedMeta(doc_id: Long, format: String, byte_len: Int,
                         width: Int, height: Int, ok: Boolean)

  /** documents.text re-cast as a binary payload column with a format tag —
    * the shape a real image/audio table has. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** STUB decoder — stands in for an image library. Deterministic fake:
    * dimensions derived from payload length. A real deployment swaps ONLY
    * this function; the partition-batched plumbing stays. */
  def stubDecode(row: MediaRow): DecodedMeta = {
    val n = row.payload.length
    DecodedMeta(row.doc_id, row.format, n,
      width = (n % 640) + 1, height = (n % 480) + 1, ok = n > 0)
  }

  /** Formats the JRE's bundled ImageIO readers are guaranteed to decode
    * (javax.imageio ships png/jpeg/gif/bmp/wbmp readers — no external
    * library). */
  val jdkDecodableFormats: Set[String] = Set("png", "jpeg", "gif", "bmp")

  /** REAL image decode on the JDK's bundled ImageIO readers. Returns the
    * true pixel dimensions; an unparseable payload (wrong magic, truncated
    * file) reports ok=false with -1 dimensions rather than plausible
    * fakes. ImageIO sniffs the container from the payload's magic bytes,
    * so a mis-tagged but decodable payload still decodes — the format tag
    * only routes WHICH rows attempt a real decode. */
  def decodeImage(row: MediaRow): DecodedMeta = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
      catch { case _: Exception => null }
    if (img == null)
      DecodedMeta(row.doc_id, row.format, row.payload.length, -1, -1, ok = false)
    else
      DecodedMeta(row.doc_id, row.format, row.payload.length,
        img.getWidth, img.getHeight, ok = true)
  }

  /** Per-row dispatch: JDK-decodable formats decode for real, formats
    * without a guaranteed JDK reader (webp, video, audio) keep the
    * deterministic stub. */
  def decodeOne(row: MediaRow): DecodedMeta =
    if (jdkDecodableFormats(row.format)) decodeImage(row) else stubDecode(row)

  /** Batched decode over partitions: the real-decoder integration point
    * (mapPartitions so a JNI/native decoder initializes once per partition,
    * not once per row). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows => rows.map(decodeOne) }
  }

  case class ResizedMedia(doc_id: Long, format: String,
                          width: Int, height: Int, payload: Array[Byte])

  /** STUB resize — stands in for an image scaler. The fake clamps the
    * payload to width*height/8 bytes so output row size is bounded by the
    * TARGET dimensions, which is the property that matters at scale: a
    * resize-to-thumbnail stage must shrink shuffle/write volume no matter
    * how large the inputs are. Swap only this function for a real scaler. */
  def stubResize(row: MediaRow, width: Int, height: Int): ResizedMedia = {
    val target = math.max(1, width * height / 8)
    ResizedMedia(row.doc_id, row.format, width, height,
      java.util.Arrays.copyOf(row.payload, math.min(target, math.max(1, row.payload.length))))
  }

  /** Distributed resize: one scaler init per partition, bounded output rows. */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(stubResize(_, width, height)))
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: treat the payload as a sequence of fixed-size frame
    * chunks and keep every `stride`-th one — the Spark shape of video
    * frame-sampling (one input row explodes into a bounded number of frame
    * rows; the stride is the knob that keeps the exploded volume linear).
    * A real demuxer replaces the `grouped` chunking only. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 16, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => Frame(r.doc_id, i, chunk)
      }
    }
  }
}
