package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (training-pipeline addition): media rides
  * as an opaque `binary` column + typed metadata; decode/feature steps
  * run per-partition over iterators so a real decoder (image/audio libs)
  * drops in without changing the plan shape.
  *
  * The decode itself is STUBBED deterministically (this container ships
  * no media codecs): "width/height/frames" derive from the byte length,
  * and the checksum is a real md5 over the bytes. The Spark-side
  * contract — binary schema in, typed metadata out, partition-batched
  * execution, no driver collection — is the real, tested part.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, data: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      n_frames: Long, checksum: String)

  /** STUB decoder: deterministic pseudo-metadata from the payload. A
    * production build replaces only this function with a codec call. */
  def decodeStub(blob: MediaBlob): MediaMeta = {
    val n = blob.data.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(blob.data).map("%02x".format(_)).mkString
    MediaMeta(
      doc_id = blob.doc_id,
      byte_len = n,
      width = 640L + n % 1280,
      height = 360L + (n * 7) % 720,
      n_frames = 1L + n % 100,
      checksum = hex)
  }

  /** Binary → metadata over partition iterators (the mapInPandas shape
    * in JVM form: stream batches, never materialize a partition). */
  def extractMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  /** documents.text → binary payload (stand-in for real media bytes). */
  def asBlobs(s: SparkSession, docsDf: DataFrame): Dataset[MediaBlob] = {
    import s.implicits._
    docsDf.select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
  }
}
