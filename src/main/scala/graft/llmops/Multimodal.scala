package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and per-batch decode /
  * feature-extraction runs in `mapPartitions` with a per-partition
  * decoder instance (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The container has no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked deterministic fake — the Spark-side contract
  * (schema, partitioning, batch shape) is real and tested; swapping in
  * a JNI/FFI decoder changes one class.
  */
object Multimodal {

  /** Schema for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true)))

  final case class Asset(asset_id: Long, media_type: String,
                         content: Array[Byte], width: Option[Int],
                         height: Option[Int], duration_ms: Option[Long],
                         codec: Option[String])

  final case class AssetFeatures(asset_id: Long, media_type: String,
                                 n_bytes: Long, feature: Array[Float])

  /** Decoder abstraction — one instance per partition. */
  trait Decoder extends Serializable {
    def features(a: Asset): AssetFeatures
  }

  /** STUB: real decode needs codec libraries not present in this
    * container. Produces a deterministic 8-dim "embedding" from the
    * byte content so tests exercise the full distributed path.
    */
  final class StubDecoder extends Decoder {
    override def features(a: Asset): AssetFeatures = {
      val bytes = if (a.content == null) Array.emptyByteArray else a.content
      val f = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        f(i % 8) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      AssetFeatures(a.asset_id, a.media_type, bytes.length.toLong, f)
    }
  }

  /** Distributed feature extraction: batch-per-partition decode.
    * Binary payloads stay off the driver; only fixed-size features
    * shuffle afterwards.
    */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      mkDecoder: () => Decoder = () => new StubDecoder)
      : Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      val dec = mkDecoder() // one decoder per partition
      it.map(dec.features)
    }
  }

  /** Synthetic asset table derived from the documents corpus (the
    * testdata has no binary tables): deterministic pseudo-payloads so
    * the multimodal path is exercised end-to-end at any SF.
    */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8").take(256)
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, mt, bytes,
          width = if (mt == "image") Some(64) else None,
          height = if (mt == "image") Some(64) else None,
          duration_ms = if (mt != "image") Some(1000L + id) else None,
          codec = Some(if (mt == "image") "stub-png" else "stub-pcm"))
    }
  }
}
