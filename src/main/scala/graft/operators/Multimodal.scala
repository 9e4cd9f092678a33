package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise in batches.
  *
  * The Spark-side machinery here — schema, partitioning, batch shape,
  * feature extraction pipeline — is real and tested. The media DECODE
  * step is a clearly-marked deterministic STUB (this container has no
  * image/audio codecs); swap [[MediaCodec.decodeStub]] for a real
  * JNI/codec call and nothing else changes.
  *
  * Scale shape: media blobs never shuffle — every stage below is a
  * map-only pass (mapPartitions batches ≙ Arrow-batch UDF shape), and
  * downstream analytics shuffle only the small extracted features.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata traveling together. */
  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Extracted features: fixed-size embedding + decode stats. */
  case class MediaFeatures(media_id: Long, media_type: String,
                           n_bytes: Long, feature: Array[Float])

  object MediaCodec {
    /** STUB: deterministic fake "decode + feature extract". A real
      * implementation would decode the payload (JPEG/PNG/WAV/...) and
      * run a feature extractor; here we derive a stable 16-dim
      * pseudo-feature from the payload bytes so the pipeline is
      * end-to-end testable. Deterministic: same bytes → same features.
      */
    def decodeStub(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](16)
      var i = 0
      while (i < payload.length) {
        out(i % 16) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, payload.length / 16)
      out.map(_ / n)
    }

    /** STUB: "resize" — a real impl would rescale pixels; the stub
      * truncates the payload deterministically preserving the batch
      * plumbing. */
    def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      payload.take(maxBytes)

    /** STUB: frame sampling — every nth chunk of the payload stands in
      * for every nth video frame. */
    def frameSampleStub(payload: Array[Byte], chunk: Int, every: Int): Array[Array[Byte]] =
      payload.grouped(chunk).zipWithIndex.collect {
        case (c, i) if i % every == 0 => c
      }.toArray
  }

  /** Build a synthetic media table from the documents table: payload =
    * UTF-8 bytes standing in for an encoded image; metadata derived
    * deterministically. (The driver testdata has no binary column, so
    * the pipeline manufactures one — the schema is the point.)
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(1024)) + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(768)) + 64).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, lit(16000)).otherwise(lit(0)).as("sample_rate"))
      .as[MediaRow]
  }

  /** Partition-wise feature extraction: the Scala analog of an
    * Arrow-batched decode UDF. Each partition streams its rows through
    * the (stub) codec — constant memory, no shuffle, linear scale-out.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded = MediaCodec.decodeStub(r.payload)
        MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong, decoded)
      }
    }
  }

  /** A transcoded media row: old/new payload sizes travel with the new
    * payload so accounting needs no second pass over the blobs. */
  case class TranscodedMedia(media_id: Long, media_type: String,
                             n_in: Long, n_out: Long, payload: Array[Byte])

  /** Type-dispatched transcode pass — the resize / frame-sample stage
    * of an ingest pipeline: images are resized (bounded bytes), videos
    * are frame-sampled (every `vidEvery`-th `vidChunk`-byte "frame"),
    * audio passes through. Same partition-wise batch shape as
    * [[extractFeatures]]: map-only over the scan, blobs never shuffle,
    * and the (stub) codec calls are the single swap point for real
    * JPEG/ffmpeg decoders.
    */
  def transcode(media: Dataset[MediaRow], imgMaxBytes: Int = 256,
                vidChunk: Int = 64, vidEvery: Int = 2): Dataset[TranscodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = r.media_type match {
          case "image" => MediaCodec.resizeStub(r.payload, imgMaxBytes)
          case "video" => MediaCodec.frameSampleStub(r.payload, vidChunk, vidEvery)
            .flatten
          case _ => r.payload
        }
        TranscodedMedia(r.media_id, r.media_type,
          r.payload.length.toLong, out.length.toLong, out)
      }
    }
  }

  /** Byte accounting of the transcode pass per media type — the
    * before/after sizes are pure functions of the payload length and
    * the (deterministic) stub policies, so a DuckDB oracle reproduces
    * them exactly from STRLEN(text): the gate proves the type
    * dispatch, chunk arithmetic, and batch plumbing — not the codec.
    */
  def transcodeStats(spark: SparkSession, dir: String): DataFrame =
    transcode(mediaTable(spark, dir)).toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_in")).as("bytes_in"),
        sum(col("n_out")).as("bytes_out"))
      .orderBy(asc("media_type"))

  /** End-to-end multimodal pipeline: manufacture media → batch decode →
    * per-type feature statistics. Only the 16-float features reach the
    * aggregate — payloads stay in their scan partitions.
    */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaTable(spark, dir))
    feats.toDF()
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        aggregate(col("feature"), lit(0.0), (s, x) => s + x.cast("double")).as("feat_sum"))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("n_bytes")).as("min_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(asc("media_type"))
  }
}
