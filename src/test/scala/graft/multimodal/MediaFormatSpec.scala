package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generated media bytes are REAL files, proven by real codecs:
  * the JDK's own WAV parser (javax.sound) and BMP reader
  * (javax.imageio) — not written by us, not char-level stubs — must
  * decode [[Multimodal.wavBytes]]/[[Multimodal.bmpBytes]] output and
  * recover exactly the samples/pixels the generating formula
  * produced. Together with q244/q248 (whose byte-level readers the
  * DuckDB oracle checks), this closes the loop: encoder, independent
  * codec, and in-plan decoder all agree on the same bytes.
  */
class MediaFormatSpec extends SparkSpec {
  import spark.implicits._

  private val text = "the quick brown fox jumps over the lazy dog 0123"
  private lazy val doc = Seq((7L, text)).toDF("doc_id", "text")

  test("wavBytes parses with javax.sound; samples match the formula") {
    val n = least(length(col("text")), lit(48))
    val rate = lit(8000L) + (col("doc_id") % 3) * 4000L
    def sample(i: Column): Column =
      ((ascii(col("text").substr(i, lit(1))) % 64) - 32) * 500
    val bytes = doc.select(Multimodal.wavBytes(rate, n, sample).as("w"))
      .head.getAs[Array[Byte]](0)
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getChannels == 1)
    assert(fmt.getSampleSizeInBits == 16)
    assert(!fmt.isBigEndian)
    assert(fmt.getSampleRate == 12000f) // 8000 + (7 % 3) * 4000
    assert(ais.getFrameLength == math.min(text.length, 48))
    val raw = ais.readAllBytes()
    val got = raw.grouped(2).map(p =>
      ((p(0) & 0xff) | (p(1) << 8)).toShort.toInt).toSeq
    val want = text.take(48).map(ch => ((ch.toInt % 64) - 32) * 500)
    assert(got == want, s"codec-decoded samples diverge:\n$got\n$want")
  }

  test("bmpBytes parses with javax.imageio; pixels match the formula") {
    val w = lit(3L) + col("doc_id") % 5 // doc 7 -> width 5
    def pixel(r: Column, c: Column): (Column, Column, Column) = {
      val cp = ascii(col("text").substr(
        (pmod(r * w + c, length(col("text")).cast("long")) + 1).cast("int"),
        lit(1)))
      (cp % 64 + 10, cp % 32 + 20, cp % 16 + 30)
    }
    val bytes = doc.select(Multimodal.bmpBytes(w, lit(4L), pixel).as("b"))
      .head.getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the generated BMP")
    assert(img.getWidth == 5 && img.getHeight == 4)
    for (r <- 0 until 4; c <- 0 until 5) {
      val cp = text.charAt((r * 5 + c) % text.length).toInt
      val (eb, eg, er) = (cp % 64 + 10, cp % 32 + 20, cp % 16 + 30)
      val argb = img.getRGB(c, r) // ImageIO resolves the bottom-up order
      val (gb, gg, gr) = (argb & 0xff, (argb >> 8) & 0xff, (argb >> 16) & 0xff)
      assert((gb, gg, gr) == ((eb, eg, er)),
        s"pixel ($r,$c): codec saw ($gr,$gg,$gb) RGB, formula ($er,$eg,$eb)")
    }
  }
}
