package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-batched typed pipelines.
  *
  * IMAGE decode is REAL: [[Bmp]] is a from-scratch 24-bpp BMP codec —
  * [[decodeBmpStats]] parses actual headers/strides/bottom-up rows and
  * computes pixel statistics from the decoded bytes (oracle-verified
  * end-to-end). Audio/video remain a byte-statistics stand-in
  * ([[ByteStatsDecoder]], no codec libraries exist in this container):
  * the partition-batched plumbing — schema, binary handling, batch shape,
  * null policy — is identical to what a JNI/lib decoder would slot into.
  */
object Multimodal {

  /** Canonical media-asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)
  ))

  final case class Asset(
      asset_id: Long, media_type: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Long])

  final case class AssetFeature(
      asset_id: Long, media_type: String, n_bytes: Long,
      checksum: Long, feature: Array[Double])

  /** Byte-statistics decoder for the modalities WITHOUT a from-scratch
    * codec here (audio/video): deterministic feature extraction from raw
    * bytes. Replace `decode` with the real library call; everything around
    * it (batching, schema, null policy) stays. Image assets have the real
    * path: [[Bmp.decode]] via [[decodeBmpStats]].
    */
  object ByteStatsDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Double] = {
      // codec-library call would go here; until then: byte histogram moments
      val f = new Array[Double](featureDim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          f(b % featureDim) += 1.0
          i += 1
        }
        val n = math.max(payload.length, 1).toDouble
        var j = 0
        while (j < featureDim) { f(j) = f(j) / n; j += 1 }
      }
      f
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 0L
      if (payload != null) {
        var i = 0
        while (i < payload.length) { h = (h * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
      }
      h
    }
  }

  /** Partition-batched feature extraction: the Scala analog of a
    * `mapInPandas` batch UDF — one decoder instance per partition, streaming
    * over rows (constant memory), typed output schema.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init (model/codec load) happens once, here
      it.map { a =>
        AssetFeature(
          a.asset_id, a.media_type,
          if (a.payload == null) 0L else a.payload.length.toLong,
          ByteStatsDecoder.checksum(a.payload),
          ByteStatsDecoder.decode(a.payload))
      }
    }
  }

  /** Frame sampling stub for video: pick every `stride`-th chunk boundary of
    * the payload as a "frame" offset — real frame extraction would use the
    * container index; the partitioning/limit shape is what matters here.
    */
  def sampleFrameOffsets(payloadLen: org.apache.spark.sql.Column, stride: Int,
      maxFrames: Int): org.apache.spark.sql.Column =
    slice(sequence(lit(0L), greatest(payloadLen - 1, lit(0L)), lit(stride.toLong)),
      1, maxFrames)

  /** Build a deterministic asset table from any text table (dev/test input:
    * the text bytes ARE the payload — real pipelines read binary files).
    */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Deterministic REAL-format image fixtures: each row's text bytes become
    * the BGR pixel stream of a width×height 24-bpp BMP (bytes cycled to
    * fill the image; empty text → black frame), encoded through the real
    * [[Bmp.encode]] — so the payload column holds genuine on-disk BMP
    * bytes with headers, stride and bottom-up rows.
    */
  def bmpAssetsFromText(df: DataFrame, idCol: String, textCol: String,
      width: Int = 8, height: Int = 8): Dataset[Asset] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val tb = if (text == null) Array.empty[Byte] else text.getBytes("UTF-8")
        val n = tb.length
        val bgr = Array.tabulate[Byte](width * height * 3)(k =>
          if (n == 0) 0 else tb(k % n))
        Asset(id, "image", Bmp.encode(width, height, bgr),
          Some(width), Some(height), None)
      }
  }

  final case class BmpStats(
      asset_id: Long, width: Int, height: Int,
      mean_b: Double, mean_g: Double, mean_r: Double)

  /** REAL image decode in the partition-batched shape: parse each asset's
    * BMP (headers, declared data offset, stride, bottom-up rows) and emit
    * per-channel pixel means from the decoder's exact integer sums.
    */
  def decodeBmpStats(assets: Dataset[Asset]): Dataset[BmpStats] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val d = Bmp.decode(a.payload)
        val n = d.nPix.toDouble
        BmpStats(a.asset_id, d.width, d.height,
          d.sumB.toDouble / n, d.sumG.toDouble / n, d.sumR.toDouble / n)
      }
    }
  }
}
