package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2 L6): media payloads ride
  * through the engine as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition over the raw bytes.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * STUB by design: it computes deterministic byte-level "features"
  * (a stand-in for a real decoder). Everything around it — the binary
  * column representation, schema contract, partition-parallel
  * execution shape, and the metadata join — is the real 100 TB
  * plumbing: payloads never reach the driver, the per-partition
  * iterator keeps one row in flight at a time, and feature rows are
  * small fixed-width records regardless of payload size.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("header_hex", StringType),
    StructField("byte_mean", DoubleType)))

  /** STUB decoder: stands in for image/audio decode + feature
    * extraction (codecs absent in this environment). Deterministic
    * byte-level features keep the plumbing testable; a real deployment
    * swaps only the body of this function. */
  def decodeStub(docId: Long, payload: Array[Byte]): Row = {
    val header = payload.take(4).map(b => f"$b%02x").mkString
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val mean =
      if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    Row(docId, payload.length.toLong, header, mean)
  }

  /** Byte-level features as pure Catalyst expressions — the production
    * path for everything a real decoder does NOT need: it stays inside
    * whole-stage codegen (the byte loop is the custom
    * [[graft.functions.ByteSum]] expression) and keeps filter pushdown
    * and column pruning flowing through to the scan, which the RDD
    * spelling below severs. Matches [[decodeStub]] value-for-value
    * (asserted in MultimodalSpec). */
  def featureColumns(binaryDocs: DataFrame): DataFrame =
    binaryDocs.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 4))).as("header_hex"),
      when(octet_length(col("payload")) === 0, lit(0.0))
        .otherwise(graft.functions.GraftFunctions.byte_sum(col("payload"))
          .cast("double") / octet_length(col("payload")))
        .as("byte_mean"))

  /** Frame sampling + "resize" over opaque binary payloads, as pure
    * Catalyst expressions — the video/image analogs of
    * [[featureColumns]] (a real deployment swaps the byte windows for
    * codec output; the partitioning, schema, and per-frame row shape
    * are the production plumbing):
    *
    *  - `nFrames` evenly-spaced fixed-width byte windows per payload
    *    ("frame sample"): frame i starts at
    *    `i * max(len - frameLen, 0) DIV (nFrames-1)`, one output ROW
    *    per frame (arrays of frames would defeat per-frame filtering
    *    and pushdown);
    *  - a `thumbBytes`-wide deterministic downsample ("resize"): byte
    *    j of the thumb is input byte `floor(j * len / thumbBytes)` —
    *    stride sampling, the byte-level stand-in for nearest-neighbor
    *    resize.
    *
    * The frame columns (`expr` over substring/DIV) run inside
    * whole-stage codegen; `thumb_hex`'s `transform` lambda is the one
    * interpreted piece — higher-order-function lambdas never codegen —
    * but it is bounded at `thumbBytes` (16) substr+hex evaluations per
    * row, not a per-byte loop, so it is not the ShingleHashSet-style
    * hot-loop trap (swap in a custom Expression if a profile ever says
    * otherwise). Both features are hex-encoded so the DuckDB oracle
    * can mirror them byte-for-byte (`binary_frames` row). */
  def frameColumns(binaryDocs: DataFrame, nFrames: Int = 4,
      frameLen: Int = 8, thumbBytes: Int = 16): DataFrame = {
    require(nFrames >= 2 && frameLen >= 1 && thumbBytes >= 1)
    val n = octet_length(col("payload"))
    binaryDocs
      .select(col("doc_id"), col("payload"), n.as("__n"),
        explode(sequence(lit(0L), lit(nFrames - 1L))).as("frame_no"))
      .select(
        col("doc_id"),
        col("frame_no"),
        expr(s"frame_no * greatest(__n - $frameLen, 0) DIV ${nFrames - 1}")
          .as("frame_off"),
        lower(hex(expr(s"substring(payload, " +
          s"frame_no * greatest(__n - $frameLen, 0) DIV ${nFrames - 1} + 1, " +
          s"$frameLen)"))).as("frame_hex"),
        // floor over exact-in-double products (len ≤ ~1e8 ≪ 2^52)
        array_join(transform(sequence(lit(0), lit(thumbBytes - 1)), j =>
          lower(hex(substr(col("payload"),
            floor(j.cast("double") * col("__n") / thumbBytes)
              .cast("int") + 1, lit(1))))), "").as("thumb_hex"))
  }

  /** Partition-parallel decode of a (doc_id, payload binary) relation:
    * the mapPartitions shape a REAL decoder (image/audio codec over the
    * raw bytes) needs — one payload in memory per task at a time, no
    * collect, no shuffle. This is the documented decoder extension
    * point only; byte-level features ship via [[featureColumns]], which
    * expresses them in Catalyst instead of dropping out of codegen. */
  def extractFeatures(binaryDocs: DataFrame): DataFrame = {
    val spark = binaryDocs.sparkSession
    val rdd = binaryDocs.select(col("doc_id"), col("payload")).rdd
      .map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
    spark.createDataFrame(rdd, featureSchema)
  }
}
