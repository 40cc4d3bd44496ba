package graft.media

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads carried as opaque
  * `binary` columns with typed metadata, processed with pure Spark
  * plumbing (schema, partition-friendly projections, chunking).
  *
  * The actual codecs (JPEG decode, audio resample, …) are NOT available in
  * this environment; [[decodeStub]] parses a deterministic synthetic
  * container format instead (see [[MediaGen]]) so that everything Spark
  * owns — binary slicing, header parsing, chunk/frame sampling, feature
  * hashing, partitioning — is real and tested, and the codec call is an
  * isolated, clearly-marked seam (`REAL-CODEC-SEAM`) to swap for a native
  * library on a real cluster.
  *
  * Container format (all big-endian, offsets 1-based as in `substring`):
  *   bytes 1-4   magic  "GMV0" (video) | "GIM0" (image) | "GAU0" (audio)
  *   bytes 5-6   width / sample-rate-kHz
  *   bytes 7-8   height / channels
  *   bytes 9-..  payload (frames of FrameBytes each)
  */
object Media {

  val FrameBytes = 16

  /** hex of a binary slice → long (big-endian). */
  private def beUint(bin: Column, pos: Int, len: Int): Column =
    conv(hex(substring(bin, pos, len)), 16, 10).cast("long")

  /** media kind from the magic bytes; "unknown" for anything else. */
  def sniffKind(bin: Column): Column = {
    val magic = substring(bin, 1, 4).cast("string")
    when(magic === "GIM0", "image")
      .when(magic === "GAU0", "audio")
      .when(magic === "GMV0", "video")
      .otherwise("unknown")
  }

  /** REAL-CODEC-SEAM — header decode. On a real cluster this is where a
    * native decoder (e.g. javacv / pdfbox-rendered page raster) would be
    * invoked per row; here it parses the synthetic container header with
    * pure expressions. Unknown payloads yield null dims, not exceptions.
    */
  def decodeStub(bin: Column): Column = {
    // header fields decode only when the FULL 8-byte header survives: a
    // valid-magic blob truncated inside its header would otherwise read
    // a partial big-endian width and a negative n_frames (review finding
    // on the first clamp, which gated on magic alone). kind still
    // reports what the magic says — the sniff is honest about a
    // truncated-but-recognizable container.
    val known = sniffKind(bin) =!= "unknown" && length(bin) >= 8
    struct(
      sniffKind(bin).as("kind"),
      when(known, beUint(bin, 5, 2)).as("width"),
      when(known, beUint(bin, 7, 2)).as("height"),
      // clamped at 0 for header-truncated blobs, but NULL bin stays NULL
      // (greatest SKIPS nulls, so the bare clamp would silently turn
      // 'blob absent' into 'empty payload'); the x17 twin builds
      // payload_bytes from the generator's frame count (always >= 0 over
      // full headers), so both guards are value-transparent there
      when(bin.isNotNull, greatest(length(bin) - 8, lit(0)))
        .cast("long").as("payload_bytes"),
      // known implies length >= 8, so this floor is already >= 0
      when(known, floor((length(bin) - 8) / FrameBytes)).as("n_frames"))
  }

  /** Deterministic content fingerprint of the payload (post-header). */
  def payloadHash(bin: Column): Column =
    sha2(substring(bin, 9, 1 << 28), 256)

  /** Frame sampling: every `stride`-th FrameBytes-sized chunk of the
    * payload, as an array of binary frames — the plumbing for "sample
    * frames then feature-extract".
    */
  def frames(bin: Column, stride: Int): Column = {
    val nFrames = floor((length(bin) - 8) / FrameBytes).cast("int")
    when(nFrames > 0,
      transform(
        filter(sequence(lit(0), nFrames - 1), i => i % stride === 0),
        i => bin.substr(lit(9) + i * FrameBytes, lit(FrameBytes))))
      .otherwise(array().cast("array<binary>"))
  }

  /** REAL-CODEC-SEAM — per-frame feature vector stub: a deterministic
    * 4-dim pseudo-feature from the frame hash (stands in for an embedding
    * model's output; the array<double> shape and downstream plumbing are
    * what the pipeline owns).
    */
  def frameFeatures(frame: Column): Column =
    transform(sequence(lit(0), lit(3)), d =>
      (pmod(xxhash64(frame, d), lit(1000000L)).cast("double") / 500000.0)
        - 1.0)

  /** Full decode + sample + featurize projection over a media table
    * (media_id, bin [, ...]). Narrow, one pass, codegen-friendly.
    */
  def process(media: DataFrame, stride: Int = 4): DataFrame =
    media.select(
      col("media_id"),
      decodeStub(col("bin")).as("meta"),
      payloadHash(col("bin")).as("payload_sha256"),
      transform(frames(col("bin"), stride), f => frameFeatures(f))
        .as("frame_features"))
      .withColumn("n_sampled", size(col("frame_features")))
}

/** Deterministic synthetic media-table generator (seeded, distributed —
  * built with `spark.range` so generation scales with partitions).
  */
object MediaGen {

  /** n rows of (media_id, kind, bin): header + `frames` frames of 16
    * deterministic bytes each. Kind cycles image/audio/video with a
    * corrupt ("XXXX" magic) row every 17th.
    */
  def mediaDf(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val magic =
        if (i % 17 == 16) "XXXX"
        else Seq("GIM0", "GAU0", "GMV0")((i % 3).toInt)
      val w = (64 + (i * 7) % 192).toInt
      val h = (48 + (i * 11) % 144).toInt
      val nFrames = (1 + i % 9).toInt
      val rng = new scala.util.Random(0xABCDEF ^ i)
      val payload = Array.fill(nFrames * Media.FrameBytes)(rng.nextInt(256).toByte)
      val header = magic.getBytes("US-ASCII") ++
        Array(((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
          ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte)
      (i.toLong, magic, header ++ payload)
    }.toDF("media_id", "magic", "bin")
  }
}
