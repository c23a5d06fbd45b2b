package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, batch-decoded per partition.
  *
  * The container ships no image/audio codecs, so `stubDecode` is a
  * clearly-marked DETERMINISTIC FAKE (dims derived from byte length).
  * Everything around it is the real Spark shape a production decoder drops
  * into: a typed Dataset with a binary column, `mapPartitions` batch
  * iteration (the Scala analogue of mapInPandas — one JVM-side batch loop
  * per partition, amortizing decoder init), explicit repartitioning by
  * payload size so decode work balances, and a typed metadata schema out.
  */
final case class MediaRecord(media_id: Long, format: String, payload: Array[Byte])
final case class MediaMeta(media_id: Long, format: String, n_bytes: Long,
                           width: Long, height: Long, frames: Long)

object MediaPipeline {

  /** Wrap a text corpus as a binary media table (payload = UTF-8 bytes). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3L)) === 0L, "img")
        .when(pmod(col("doc_id"), lit(3L)) === 1L, "audio")
        .otherwise("video").as("format"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRecord]
  }

  /** STUB DECODER — deterministic fake (no codec libs in this container).
    * A real implementation replaces only this function; the Spark plumbing
    * (schema, partitioning, batch shape) is unchanged.
    */
  def stubDecode(r: MediaRecord): MediaMeta = {
    val n = r.payload.length.toLong
    MediaMeta(r.media_id, r.format, n,
      width = 64L + n % 577L,
      height = 64L + (n * 31L) % 577L,
      frames = if (r.format == "img") 1L else 1L + n % 24L)
  }

  /** Batch decode: one iterator pass per partition (decoder init once per
    * partition, not per record).
    */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder initialization would happen here
      it.map(stubDecode)
    }
  }

  /** Pure-column metadata path (no decode needed): byte length + the same
    * deterministic dim formulas — oracle-checkable twin of the stub.
    */
  def metaColumns(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      (lit(64L) + pmod(octet_length(col("text")).cast("long"), lit(577L))).as("width"),
      (lit(64L) + pmod(octet_length(col("text")).cast("long") * 31L, lit(577L))).as("height"),
      (lit(1L) + pmod(octet_length(col("text")).cast("long"), lit(24L))).as("frames"))
}
