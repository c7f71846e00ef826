package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, and per-batch transforms
  * (decode / feature-extract / resize / frame-sample) run as partition-local
  * stages over that schema.
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — with a clearly-marked deterministic fake
  * (`stubDecodeFeatures`), but the Spark-side contract is real and tested:
  * the asset schema, the partition-local batch shape (mapPartitions — the
  * Scala analog of mapInPandas batches), partitioning by asset id, and
  * pruning-friendly metadata columns that let filters skip payload bytes.
  */
object Multimodal {

  /** Canonical asset schema: payload + typed metadata. Parquet stores the
    * binary column page-compressed; metadata fields are plain columns so
    * predicate pushdown can select assets WITHOUT touching payload bytes. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Wrap a text table as fake binary assets (UTF-8 payload) so the
    * plumbing is exercisable against the synthetic corpus. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      lit("image").as("media_type"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        (octet_length(col(textCol)) % 1024 + 1).cast(IntegerType).as("width"),
        (octet_length(col(textCol)) % 768 + 1).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(IntegerType).as("n_frames")).as("meta"))

  /** STUB decode: a real implementation would invoke an image codec here.
    * The deterministic fake derives an 8-dim "feature vector" from payload
    * bytes (length + sampled byte values), so downstream stages (ANN over
    * features, dedup on feature hash) are fully testable. */
  def stubDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0f)
    val n = payload.length
    Array.tabulate(8) { i =>
      if (i == 0) n.toFloat
      else payload(((i.toLong * 2654435761L) % n).toInt.abs).toFloat
    }
  }

  /** Partition-local batch decode — the Scala analog of a mapInPandas
    * batch UDF: one task per partition, rows streamed through the stub
    * codec, output schema = id + media_type + features. Repartitioning by
    * asset_id first gives even codec work distribution regardless of input
    * file layout. */
  def decodeFeatures(spark: SparkSession, assets: DataFrame,
                     partitions: Int = 0): DataFrame = {
    val parts = if (partitions > 0) assets.repartition(partitions, col("asset_id"))
                else assets
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    val input = parts.select("asset_id", "media_type", "payload")
    input.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        Row(r.getLong(0), r.getString(1), stubDecodeFeatures(payload))
      }
    }(encoder)
  }

  /** "Frame sampling" on the binary payload: every `stride`-th byte chunk,
    * expressed with pure slicing expressions (a real video pipeline would
    * substitute keyframe extraction; the batch/partition shape is what
    * carries to that). */
  def sampleChunks(assets: DataFrame, chunkSize: Int, stride: Int): DataFrame =
    assets.select(col("asset_id"),
      posexplode(transform(
        sequence(lit(0), greatest(lit(0),
          floor(octet_length(col("payload")).cast("long") / (chunkSize * stride))
            .cast("int") - 1)),
        i => substring(col("payload"), i * lit(chunkSize * stride) + 1, lit(chunkSize)))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk")
      .withColumn("chunk_bytes", octet_length(col("chunk")))
      .drop("chunk")
}
