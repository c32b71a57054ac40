package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample are per-row transforms over those bytes.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked deterministic fake ([[fakeDecodeMeta]]) — byte-derived,
  * reproducible, oracle-testable — while the Spark-side plumbing (binary
  * schema, metadata struct, explode-per-frame layout, partitioning) is real.
  * A real implementation swaps the md5-derived header fields for a container
  * parse; nothing else changes.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction is
  * map-side; frame explosion multiplies rows but projects the payload away
  * in the same select. For real media at 100 TB, bucket by content-id so
  * decode+extract stay within one task per asset.
  */
object Multimodal {

  /** Attach a binary payload column built from text (stand-in for real media
    * bytes in the test tables).
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** STUB decode: "header" metadata derived deterministically from the
    * payload bytes — byte length, a fake width/height from the payload
    * hash, and the checksum. A real decoder parses the container header
    * here instead.
    */
  def fakeDecodeMeta(payload: Column): Column = struct(
    length(payload).cast("long").as("n_bytes"),
    (conv(substring(md5(payload), 1, 4), 16, 10) % 1920).cast("long").as("width"),
    (conv(substring(md5(payload), 5, 4), 16, 10) % 1080).cast("long").as("height"),
    md5(payload).as("checksum"))

  /** STUB feature extractor: a deterministic `dim`-component vector in
    * [-0.5, 0.5) derived from the payload checksum — component j is the
    * unsigned first-8-hex of md5(checksum || "_j") / 2^32 - 0.5 (the
    * [[graft.functions.VectorFunctions.planeComponent]] derivation, applied
    * per row). A real implementation swaps this for an image/audio embedding
    * model over the decoded media; everything downstream — ANN search,
    * embedding near-dup — composes unchanged (see the `mm_feature_knn`
    * query: payload → features → cosine top-k, oracle-verified end-to-end).
    * Pass an already-projected checksum column so the payload md5 is
    * computed once, not once per component.
    */
  def fakeFeaturesFromChecksum(checksum: Column, dim: Int): Column =
    array((0 until dim).map { j =>
      conv(substring(md5(concat(checksum, lit(s"_$j"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0) - lit(0.5)
    }: _*)

  /** STUB resize: target-box dimensions preserving aspect ratio (floor'd),
    * from the fake-decoded width/height. A real implementation resamples
    * pixels; the metadata contract — what a pipeline actually joins on — is
    * identical.
    */
  def fakeResizeMeta(meta: Column, targetW: Int, targetH: Int): Column = {
    // the stub decoder's md5-mod dims can be 0 — clamp so the scale never
    // divides by zero (a real decoder rejects zero-pixel media upstream)
    val w = greatest(meta.getField("width").cast("double"), lit(1.0))
    val h = greatest(meta.getField("height").cast("double"), lit(1.0))
    val scale = least(lit(targetW) / w, lit(targetH) / h)
    struct(
      floor(w * scale).cast("long").as("out_width"),
      floor(h * scale).cast("long").as("out_height"),
      meta.getField("checksum").as("checksum"))
  }

  /** STUB frame sampler: split the payload into fixed-size "frames"
    * (`frameBytes` chunks) and hash each — the layout a real video
    * frame-sampler produces: one row per frame, payload projected away.
    *
    * Frames are addressed by BYTES (binary semantics, multi-byte-safe); the
    * fingerprint is md5 over the frame's UPPERCASE HEX encoding — a 1:1
    * function of the frame bytes that both engines can compute byte-exactly
    * (this DuckDB build has no blob slicing or md5(BLOB), but hex is pure
    * ASCII, so the oracle's varchar substr IS a byte slice of hex pairs).
    */
  def frameHashes(df: DataFrame, frameBytes: Int = 256, idCol: String = "doc_id"): DataFrame =
    df.withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn(
        "frame_no",
        explode(sequence(
          lit(0),
          ceil(col("n_bytes").cast("double") / frameBytes).cast("int") - 1)))
      .withColumn(
        "frame_hash",
        md5(hex(expr(s"substring(payload, frame_no * $frameBytes + 1, $frameBytes)"))))
      .select(col(idCol), col("n_bytes"), col("frame_no").cast("long").as("frame_no"), col("frame_hash"))
}
