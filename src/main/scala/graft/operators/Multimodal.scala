package graft.operators

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for corpus pipelines.
  *
  * Media travels as opaque `binary` columns plus typed metadata; the
  * Spark-side plumbing — schema, batched per-partition decode, feature
  * extraction shape, resize, frame sampling — is real and tested, while the
  * codec itself is a STUB: this container has no image/audio libraries,
  * so `decode` parses a deterministic fake header (`Multimodal.MAGIC`,
  * kind, width, height, frame count) instead of calling libjpeg/ffmpeg.
  * Swapping in a real codec replaces only the body of
  * `decodeOne` — the operator shape (mapPartitions over binary,
  * per-partition codec init, bounded batches) is exactly what a real
  * decoder needs at 100 TB: codecs are heavyweight native objects that
  * must be constructed once per partition, never per row, and never
  * shipped from the driver.
  */
object Multimodal {

  val MAGIC: Short = 0x4752 // "GR"

  /** Header = magic(2) + kind(1) + width(4) + height(4) + nFrames(4). */
  val HeaderLen: Int = 15

  /** Fixed scratch path for the q38 parquet-backed corpus: the oracle
    * SQL is a static string, so Spark writes and DuckDB reads the same
    * absolute location (content is sf-independent and deterministic). */
  val scratchCorpusPath: String = "/tmp/graft_q38_media"

  /** Scratch paths for the q58/q76 parquet-backed pipeline corpora
    * (same trick as [[scratchCorpusPath]]; each query writes its own
    * path so the two stay independent under any execution order). */
  val scratchPipelinePath: String = "/tmp/graft_q58_media"
  val scratchResizePath: String = "/tmp/graft_q76_media"
  val scratchFramesPath: String = "/tmp/graft_q81_media"

  final case class MediaMeta(
      kind: String, // image | audio | video
      width: Int,
      height: Int,
      nFrames: Int,
      byteSize: Long,
      valid: Boolean)

  final case class Decoded(id: Long, meta: MediaMeta)
  final case class Features(id: Long, embedding: Array[Float])
  final case class Frame(id: Long, frameIdx: Int, frame: Array[Byte])
  final case class Resized(id: Long, width: Int, height: Int, content: Array[Byte])

  /** Build a fake media blob (test/data-gen helper): header + payload. */
  def encodeFake(kind: String, width: Int, height: Int, nFrames: Int,
      payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(2 + 1 + 4 + 4 + 4 + payload.length)
    buf.putShort(MAGIC)
    buf.put((kind match {
      case "image" => 0; case "audio" => 1; case "video" => 2
    }).toByte)
    buf.putInt(width); buf.putInt(height); buf.putInt(nFrames)
    buf.put(payload)
    buf.array()
  }

  /** STUB codec body — replace with a real decoder (libjpeg/ffmpeg
    * binding) in production. Deterministic; never throws (invalid
    * blobs yield valid=false, the quarantine pattern of F5). */
  private def decodeOne(id: Long, bytes: Array[Byte]): Decoded = {
    if (bytes == null || bytes.length < 15)
      return Decoded(id, MediaMeta("unknown", 0, 0, 0,
        if (bytes == null) 0L else bytes.length.toLong, valid = false))
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.getShort
    if (magic != MAGIC)
      return Decoded(id, MediaMeta("unknown", 0, 0, 0, bytes.length.toLong, valid = false))
    val kind = buf.get() match {
      case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
    }
    Decoded(id, MediaMeta(kind, buf.getInt, buf.getInt, buf.getInt,
      bytes.length.toLong, valid = kind != "unknown"))
  }

  /** Decode metadata for every blob: one codec per partition, rows
    * streamed (no per-row codec setup, no full-partition buffering). */
  def decode(df: DataFrame, idCol: String, binCol: String): Dataset[Decoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = NativeCodec.open() — once per partition
        it.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** STUB feature extractor: deterministic pseudo-embedding from the
    * payload bytes (a real impl runs a vision/audio model over the
    * decoded pixels in batches — same operator shape). */
  def features(df: DataFrame, idCol: String, binCol: String, dim: Int): Dataset[Features] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val v = new Array[Float](dim)
          if (bytes != null) {
            var i = 0
            while (i < bytes.length) {
              v(i % dim) += (bytes(i) & 0xff) / 255.0f
              i += 1
            }
          }
          Features(id, v)
        }
      }
  }

  /** STUB resize: nearest-neighbor over the payload viewed as a
    * height×width one-byte-per-pixel grid (a real impl calls the
    * codec's scaler over decoded pixels — same operator shape: one
    * codec per partition, rows streamed). The result is RE-ENCODED as
    * a valid blob with the new dimensions, so resized output flows
    * through the same decode/features/ANN pipeline unchanged —
    * the thumbnail/normalize step of a multimodal training corpus.
    * Non-image and invalid blobs are dropped (quarantine them upstream
    * via [[decode]]'s valid flag). */
  def resize(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): Dataset[Resized] = {
    require(outW > 0 && outH > 0, s"target dims must be positive: ${outW}x$outH")
    require(outW.toLong * outH <= Int.MaxValue, "target pixel count overflows")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val d = decodeOne(id, bytes)
        val w = d.meta.width; val h = d.meta.height
        if (!d.meta.valid || d.meta.kind != "image" || w <= 0 || h <= 0)
          Iterator.empty
        else {
          val payload = bytes.drop(HeaderLen)
          val out = new Array[Byte](outW * outH)
          var y = 0
          while (y < outH) {
            val py = (y.toLong * h / outH).toInt
            var x = 0
            while (x < outW) {
              val px = (x.toLong * w / outW).toInt
              // Long: a well-formed header may declare w*h past Int
              // range — Int math would wrap negative, slip past the
              // bound check and throw (the codec contract is
              // never-throw). Missing pixels (payload shorter than
              // w*h) read as 0 rather than failing the whole blob.
              val idx = py.toLong * w + px
              out(y * outW + x) =
                if (idx < payload.length) payload(idx.toInt) else 0
              x += 1
            }
            y += 1
          }
          Iterator.single(
            Resized(id, outW, outH, encodeFake("image", outW, outH, d.meta.nFrames, out)))
        }
      }
  }

  /** Frame sampling for video blobs: every `stride`-th fixed-size frame
    * from the payload — one row per sampled frame (the explode shape a
    * real ffmpeg frame iterator produces). */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val headerLen = 15
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val d = decodeOne(id, bytes)
        if (!d.meta.valid || d.meta.kind != "video") Iterator.empty
        else {
          val payload = bytes.drop(headerLen)
          val nFrames = payload.length / frameBytes
          Iterator.range(0, nFrames, stride).map { f =>
            Frame(id, f, payload.slice(f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }

  /** Expression-only header decode: the metadata half of the codec needs
    * no native library, so it is parsed with codegen'd binary/string
    * expressions instead of `mapPartitions` — the whole parse stays inside
    * WholeStageCodegen and is SQL-expressible, which puts it under the
    * DuckDB oracle gate (both engines slice the same parquet bytes).
    * Semantics match `decodeOne` for every blob with dims < 2³¹ (all
    * generated corpora): bad magic / short blob / unknown kind ⇒
    * kind="unknown", dims 0, valid=false (F5 quarantine). The one
    * deliberate divergence: dim fields here decode UNSIGNED into long
    * (oracle totality, see the comment below) while the stub
    * `decodeOne` reads signed `getInt` — a ≥ 2³¹ field differs
    * between the paths; a real codec would reject such headers.
    * The `mapPartitions` path in [[decode]] stays as the shape a real
    * pixel codec needs; this is the scale path for metadata-only queries.
    */
  def decodeMetaExpr(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val bin = col(binCol)
    // hex of just the header: 30 chars; Spark `substring` slices binary
    val hx = hex(substring(bin, 1, HeaderLen))
    // dims decode as LONG: a 8-nibble field can hold up to 2^32-1,
    // which would null under an int cast on Spark but error/wrap in
    // DuckDB's '0x'||…::INT — long keeps both engines total and equal
    // over the whole field domain (the kind byte is 2 nibbles, int-safe)
    def hexLong(pos1: Int, nibbles: Int): Column =
      conv(substring(hx, pos1, nibbles), 16, 10).cast("long")
    val lenOk = bin.isNotNull && length(bin) >= HeaderLen
    val magicOk = lenOk && substring(hx, 1, 4) === "4752"
    val kindCode = when(magicOk, conv(substring(hx, 5, 2), 16, 10).cast("int"))
    val valid = magicOk && kindCode.between(0, 2)
    def dim(pos1: Int): Column = when(valid, hexLong(pos1, 8)).otherwise(0L)
    df.select(
      col(idCol).cast("long").as("id"),
      when(kindCode === 0, "image").when(kindCode === 1, "audio")
        .when(kindCode === 2, "video").otherwise("unknown").as("kind"),
      dim(7).as("width"),
      dim(15).as("height"),
      dim(23).as("nFrames"),
      coalesce(length(bin).cast("long"), lit(0L)).as("byteSize"),
      valid.as("valid"))
  }

  /** Metadata-only projection pushdown helper: media tables should be
    * stored with metadata in separate parquet columns so queries that
    * never touch pixels never read them (column pruning does the work —
    * verify with `.explain` ReadSchema). */
  def metaTable(decoded: Dataset[Decoded]): DataFrame =
    decoded.select(col("id"), col("meta.*"))

  /** Deterministic fake corpus for tests/demos. */
  def fakeCorpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](64 + (i % 5) * 32)(j => ((i * 31 + j) % 251).toByte)
      (i.toLong, encodeFake(kind, 16 + i % 8, 9 + i % 4, if (kind == "video") 8 else 1, payload))
    }.toDF("media_id", "content")
  }

  /** [[fakeCorpus]] plus four deterministic reject blobs — null content,
    * truncated header, wrong magic, unknown kind byte — one per guard in
    * the decoder (the F5 quarantine paths under the oracle gate). */
  def fakeCorpusWithRejects(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val badMagic = {
      val b = encodeFake("image", 4, 4, 1, Array.fill[Byte](16)(7))
      b(0) = 0x00; b(1) = 0x00; b
    }
    val badKind = {
      val b = encodeFake("image", 4, 4, 1, Array.fill[Byte](16)(9))
      b(2) = 9; b
    }
    val rejects = Seq(
      (n.toLong, null: Array[Byte]),
      (n + 1L, Array[Byte](1, 2, 3)),
      (n + 2L, badMagic),
      (n + 3L, badKind)).toDF("media_id", "content")
    fakeCorpus(spark, n).unionAll(rejects)
  }

  /** The q58/q76 pipeline input: [[fakeCorpusWithRejects]] plus one
    * valid-but-degenerate image (width 0) — it must survive quarantine
    * yet skip the resize path, flowing through to feature extraction
    * unresized. Every decode/quarantine/resize branch is exercised by
    * exactly this corpus, all of it under the DuckDB oracle gate. */
  def pipelineCorpus(spark: SparkSession, n: Int = 120): DataFrame = {
    import spark.implicits._
    val degenerate = Seq(
      (n + 4L, encodeFake("image", 0, 5, 1, Array.fill[Byte](16)(3))))
      .toDF("media_id", "content")
    fakeCorpusWithRejects(spark, n).unionAll(degenerate)
  }
}
