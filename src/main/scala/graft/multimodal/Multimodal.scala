package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md north star; the reference
  * has no media, its closest analog being the opaque free-text
  * `comment` column, buzzdb_lab1.cpp:75): media travels as an opaque
  * `binary` content column plus typed metadata, and the engine never
  * interprets the bytes itself — decode happens at a single, swappable
  * seam.
  *
  * This container ships no image/audio codecs, so [[fakeDecode]] is a
  * clearly-marked deterministic STUB. Everything around it is real
  * and tested: the schema convention, the typed `mapPartitions` batch
  * shape (iterator-per-partition, no driver involvement, partitioning
  * preserved — where a JNI/ffmpeg call would sit), the codegen'd
  * frame sampler, and the aspect-fit resize arithmetic. Swapping the
  * stub for an actual codec changes one function.
  */
object Multimodal {

  /** Media-table convention: (id, content binary, mime). Built here
    * from document text bytes — the testdata ships no real media, and
    * an engine must treat content as opaque bytes either way.
    */
  def mediaTable(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), encode(col(text), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"))

  /** Typed decode output: what a real codec would yield per media. */
  final case class Decoded(media_id: Long, n_bytes: Int, width: Int, height: Int)

  /** STUB decoder — a real implementation calls the codec here
    * (ImageIO, ffmpeg, ...). The deterministic fake derives dimensions
    * from the byte length so specs and SQL oracles reproduce it
    * exactly.
    */
  private[multimodal] def fakeDecode(bytes: Array[Byte]): (Int, Int) =
    (bytes.length % 640 + 1, bytes.length % 480 + 1)

  /** Batch decode over the binary column: one partition = one batch
    * of media, consumed iterator-style inside the executors. This is
    * the production shape for per-media native work — no collect, no
    * shuffle, partitioning preserved; only [[fakeDecode]] is fake.
    */
  def decodeMeta(media: DataFrame, id: String): Dataset[Decoded] =
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.map { case (i, bytes) =>
        val (w, h) = fakeDecode(bytes)
        Decoded(i, bytes.length, w, h)
      })(Encoders.product[Decoded])

  /** Frame sampling as pure codegen expressions: a `frameLen`-byte
    * frame every `stride` bytes, at most `maxFrames` per media —
    * positions are exploded first and each frame is a flat
    * `substring` slice, the same generator-then-project shape as
    * [[graft.operators.Dedup.shingleSet]] (no interpreted
    * higher-order functions in the per-byte path). `greatest(..., 0)`
    * runs BEFORE the division so both this and the DuckDB oracle
    * divide non-negative numbers (trunc == floor there).
    */
  def sampleFrames(media: DataFrame, id: String,
                   frameLen: Int, stride: Int, maxFrames: Int): DataFrame =
    media.select(col(id), col("content"),
        explode(sequence(lit(0),
          least(lit(maxFrames - 1),
            expr(s"greatest(octet_length(content) - $frameLen, 0) div $stride")
              .cast("int")))).as("f"))
      .select(col(id), col("f"),
        expr(s"substring(content, f * $stride + 1, $frameLen)").as("frame"))

  /** Aspect-preserving fit of (width, height) into a bounding box —
    * the resize arithmetic (the pixel resample itself would live in
    * the [[decodeMeta]] seam). Pure double/int expressions, identical
    * in SQL.
    */
  def fitWithin(width: org.apache.spark.sql.Column,
                height: org.apache.spark.sql.Column,
                maxW: Int, maxH: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val scale = least(lit(maxW.toDouble) / width, lit(maxH.toDouble) / height, lit(1.0))
    (greatest(floor(width * scale), lit(1)).cast("int"),
      greatest(floor(height * scale), lit(1)).cast("int"))
  }

  /** DuckDB twins, kept adjacent so both sides change together. */
  def fitWithinSql(w: String, h: String, maxW: Int, maxH: Int): (String, String) = {
    val scale = s"least($maxW.0 / $w, $maxH.0 / $h, 1.0)"
    (s"CAST(greatest(floor($w * $scale), 1) AS INT)",
      s"CAST(greatest(floor($h * $scale), 1) AS INT)")
  }

  def fakeDecodeSql(nBytes: String): (String, String) =
    (s"$nBytes % 640 + 1", s"$nBytes % 480 + 1")

  // ------------------------------------------------------ real WAV bytes
  //
  // The one place the engine DOES interpret media bytes end-to-end
  // (q244): a genuine little-endian RIFF/WAVE container — 44-byte
  // canonical header + 16-bit PCM payload, playable by any audio tool
  // — built and parsed with nothing but codegen'd string/binary
  // expressions. This proves the decode seam carries real bytes, not
  // substring stubs: the reader below recovers sample rate, data size
  // and every sample from the BYTES alone, and the q244 oracle
  // recomputes the expected values from the source data — a single
  // wrong byte (endianness, offset, two's complement) breaks parity.

  import org.apache.spark.sql.Column

  /** Little-endian hex of the low `n` bytes of a non-negative value —
    * the encoder's byte emitter (`unhex` turns the accumulated hex
    * into the final binary). Pure codegen: shift + mod + hex + pad.
    */
  def leHex(v: Column, n: Int): Column =
    concat((0 until n).map(k =>
      lpad(hex(shiftright(v.cast("long"), 8 * k) % 256), 2, "0")): _*)

  /** Little-endian unsigned read of `n` bytes at 1-based `pos` of a
    * binary column — the decoder's byte reader (substr → hex → conv,
    * one term per byte, all codegen).
    */
  def leRead(bin: Column, pos: Column, n: Int): Column =
    (0 until n).map(k =>
      conv(hex(bin.substr(pos + lit(k), lit(1))), 16, 10).cast("long") *
        lit(1L << (8 * k)))
      .reduce(_ + _)

  /** A complete RIFF/WAVE file as bytes: canonical 44-byte header
    * (PCM format 1, mono, 16-bit, little-endian throughout) followed
    * by `nSamples` s16le samples produced by `sample(i)` for
    * i = 1..nSamples (values in [-32768, 32767]; negatives stored as
    * two's complement). `rate` is the per-row sample-rate column.
    */
  def wavBytes(rate: Column, nSamples: Column,
               sample: Column => Column): Column = {
    val dataSize = nSamples * 2
    val header = concat(
      lit("52494646"), // "RIFF"
      leHex(dataSize + 36, 4), // chunk size
      lit("57415645"), // "WAVE"
      lit("666d7420"), // "fmt "
      lit("10000000"), // subchunk1 size = 16, LE32
      lit("0100"), // PCM = 1, LE16
      lit("0100"), // channels = 1, LE16
      leHex(rate, 4), // sample rate
      leHex(rate * 2, 4), // byte rate = rate * blockAlign
      lit("0200"), // block align = 2, LE16
      lit("1000"), // bits per sample = 16, LE16
      lit("64617461"), // "data"
      leHex(dataSize, 4)) // data size
    val data = array_join(
      transform(sequence(lit(1), nSamples),
        i => leHex(pmod(sample(i), lit(65536L)), 2)), "")
    unhex(concat(header, data))
  }

  /** A complete 24-bit BMP file as bytes: "BM" + 14-byte file header
    * + 40-byte BITMAPINFOHEADER, then pixel rows stored BOTTOM-UP
    * with each row zero-padded to a 4-byte boundary — the two details
    * (row order, stride padding) that make BMP a real decode test
    * rather than a flat array dump. `pixel(r, c)` returns the
    * (blue, green, red) byte values of IMAGE row r, column c; the
    * encoder handles the bottom-up storage and the file's B,G,R byte
    * order. All little-endian via [[leHex]].
    */
  def bmpBytes(w: Column, h: Column,
               pixel: (Column, Column) => (Column, Column, Column)): Column = {
    // integer stride: shiftright-by-2 is div-4 on the non-negative
    // width term (no float division anywhere in the byte math)
    val rowSize = shiftright((w * 3 + 3).cast("long"), 2) * 4
    val pad = rowSize - w * 3
    val imageSize = rowSize * h
    val header = concat(
      lit("424d"), // "BM"
      leHex(imageSize + 54, 4), // file size
      lit("00000000"), // reserved
      lit("36000000"), // pixel data offset = 54
      lit("28000000"), // DIB header size = 40
      leHex(w, 4), leHex(h, 4), // width, height (positive = bottom-up)
      lit("0100"), // planes = 1
      lit("1800"), // bits per pixel = 24
      lit("00000000"), // compression = none
      leHex(imageSize, 4),
      lit("00000000"), lit("00000000"), // x/y pixels-per-metre
      lit("00000000"), lit("00000000")) // palette sizes
    // stored row rp corresponds to image row h-1-rp (bottom-up); each
    // pixel is B,G,R bytes; the row tail is zero padding to the 4-byte
    // stride. Bounded nested transform — this is the encode seam.
    val data = array_join(
      transform(sequence(lit(0), h - 1), rp =>
        concat(
          array_join(
            transform(sequence(lit(0), w - 1), cc => {
              val (b, g, r) = pixel(h - 1 - rp, cc)
              concat(leHex(b, 1), leHex(g, 1), leHex(r, 1))
            }), ""),
          lit("000000").substr(lit(1), (pad * 2).cast("int")))), "")
    unhex(concat(header, data))
  }

  /** Per-frame energy fold at the decode seam — the native
    * [[graft.plans.CharEnergy]] expression over a decoded frame (one
    * fused byte loop per row; the windowed-RMS stand-in a real PCM
    * decoder would feed).
    */
  def frameEnergy(frame: org.apache.spark.sql.Column, k: Int,
                  center: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CharEnergy(
        org.apache.spark.sql.graft.ColumnBridge.expression(frame), k, center))
}
