package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-batches.
  *
  * The *Spark-side* machinery here is real and tested: schema, date-free
  * partition-parallel batch iteration (`mapPartitions` over a typed
  * Dataset — the Scala analogue of `mapInPandas` batch processing),
  * feature-vector columns, and aggregation over extracted features. The
  * actual media DECODE is a clearly-marked deterministic STUB (see
  * [[decodeStub]]) because no image/audio codecs exist in this
  * environment; swapping in a real decoder changes one function. */
object Multimodal {

  case class MediaRecord(media_id: Long, modality: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
      features: Array[Double])

  /** Build a deterministic multimodal frame from the documents table:
    * content = utf8 bytes of text (stands in for encoded media),
    * modality cycles image/audio/video by doc_id. */
  def fromDocuments(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.Tables
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("content"),
        (col("doc_id") % 64 + 16).cast("int").as("width"),
        (col("doc_id") % 48 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"))
  }

  /** >>> STUB DECODER <<<
    * Stands in for image/audio decode (PIL/ffmpeg equivalents are not in
    * this container). Deterministic: "decodes" the byte stream into an
    * 8-bin byte histogram normalized by length — shaped like a real
    * feature extractor (fixed-width Array[Double] per record) so the
    * downstream plumbing (batching, schema, aggregation) is the real
    * thing. */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](8)
    if (content.isEmpty) return hist
    content.foreach { b => hist(((b & 0xFF) >> 5)) += 1.0 }
    hist.map(_ / content.length)
  }

  /** Partition-batched feature extraction: one iterator pass per
    * partition (the mapInPandas batch shape — amortize any per-batch
    * model/codec setup across the partition, never per row). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition setup would go here (codec init, model load…)
      it.map { r =>
        MediaFeatures(r.media_id, r.modality, r.content.length.toLong,
          decodeStub(r.content))
      }
    }
  }

  /** "Resize": byte-domain downsample stub keeping every k-th byte —
    * exercises binary slicing through native expressions. */
  def resizeBytes(media: DataFrame, k: Int): DataFrame =
    media.withColumn("content_small",
      filter(
        transform(sequence(lit(1), octet_length(col("content"))),
          i => when(i % k === 0, col("content").substr(i, lit(1)))),
        x => x.isNotNull))

  /** Frame sampling for "video": fixed-size byte windows every stride
    * bytes (the batch shape of frame extraction). */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int,
      stride: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, math.max(bytes.length - frameBytes + 1, 0), stride)
          .map(off => (id, off.toLong, bytes.slice(off, off + frameBytes)))
      }.toDF("media_id", "frame_offset", "frame")
  }

  /** Aggregate extracted features per modality (deterministic output for
    * the driver's rows-only check). */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(spark, fromDocuments(spark, dir))
    feats.toDF()
      .select(Seq(col("modality"), col("n_bytes")) ++
        (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        // bins 1/3 are the populated ranges for the text stand-in
        // content (spaces land in bin 1, lowercase letters in bin 3)
        round(avg(col("f1")), 4).as("avg_f1"),
        round(avg(col("f3")), 4).as("avg_f3"))
      .orderBy(col("modality"))
  }
}
