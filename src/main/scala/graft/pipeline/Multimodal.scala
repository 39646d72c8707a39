package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media are opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per partition over an iterator (Arrow-batch-shaped: the Scala analog of
  * a `mapInPandas` batch UDF).
  *
  * NOTE: real codecs (JPEG/PNG/audio) are NOT available in this
  * environment, so [[MediaDecoder.real]] is a clearly-marked stub; the
  * deterministic [[MediaDecoder.fake]] exercises the full Spark-side
  * plumbing (schema, batching, partitioning) and is what tests use.
  */
object Multimodal {

  final case class DecodedMedia(width: Int, height: Int, channels: Int,
      featureNorm: Double)

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedMedia
  }

  object MediaDecoder {
    /** STUB — requires an image codec (javax.imageio / ffmpeg) that this
      * container does not ship. Wire a real decoder here in production. */
    val real: MediaDecoder = (_: Array[Byte]) =>
      throw new UnsupportedOperationException(
        "media codecs unavailable in this environment — use MediaDecoder.fake")

    /** Deterministic fake decode: dims/features derived from content bytes
      * so tests are stable and engine-portable. */
    val fake: MediaDecoder = (bytes: Array[Byte]) => {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      DecodedMedia(64 + (n % 512), 64 + ((n / 7) % 512), 3,
        (n % 1000) / 1000.0 + first / 1e6)
    }
  }

  val metadataSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("feature_norm", DoubleType, nullable = false)))

  /** Pure-expression metadata (no decode): byte length + content hash. */
  def withBinaryMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", F.octet_length(F.col(binCol)))
      .withColumn("content_sha256", F.sha2(F.col(binCol), 256))

  /** Decode stage: per-partition batch iteration (one decoder instance per
    * partition, rows streamed — the Spark-idiomatic shape for per-row
    * native-lib calls; swap `decoder` for the real codec in production). */
  def decodeMetadata(df: DataFrame, binCol: String,
      decoder: MediaDecoder = MediaDecoder.fake): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == binCol) ++
      metadataSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.indices.filterNot(_ == binIdx)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val d = if (bytes == null) DecodedMedia(0, 0, 0, 0.0) else decoder.decode(bytes)
        Row.fromSeq(keepIdx.map(row.get) ++
          Seq[Any](d.width, d.height, d.channels, d.featureNorm))
      }
    }(encoder)
  }

  /** Frame/chunk sampling over binary content: xxhash64 of `n` evenly-
    * spaced byte windows (expression-only; the binary never leaves the
    * executor). */
  def frameSampleHashes(df: DataFrame, binCol: String, n: Int = 4,
      window: Int = 64): DataFrame =
    df.withColumn("frame_hashes", F.expr(
      s"""transform(sequence(0, ${n - 1}),
         |  i -> xxhash64(substring($binCol,
         |         1 + cast(i * greatest(octet_length($binCol) - $window, 0) / ${math.max(n - 1, 1)} as int),
         |         $window)))""".stripMargin))
}
