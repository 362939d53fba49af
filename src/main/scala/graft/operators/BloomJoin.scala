package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the pattern behind Spark's own
  * injected runtime filters (`spark.sql.optimizer.runtime.bloomFilter`),
  * reimplemented as an explicit operator so the build side, sizing and
  * probe cost are under the caller's control. The build side is
  * aggregated into an m-bit bitmap *distributedly* (per-word `bit_or`
  * partials — the same shape as a partial-aggregate count), and only
  * the finished ⌈m/64⌉-word array is collected, exactly as small as a
  * broadcast of the key set. The probe is k codegen'd hash-and-test
  * expressions — no UDF, no shuffle, applied before the join so the
  * exchange only carries surviving rows.
  *
  * Semantics are exactly the underlying join: the bloom admits false
  * positives, never false negatives, and the join removes the false
  * positives. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling the ~selectivity fraction of it.
  */
object BloomJoin {

  /** Distributed bloom build: k positions per distinct key, folded into
    * ⌈mBits/64⌉ words with `bit_or`. Returns the dense bitmap.
    */
  def buildBitmap(build: DataFrame, key: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be word-aligned, got $mBits")
    val words = build.select(col(key).as("k")).distinct()
      .select(col("k"), explode(sequence(lit(0), lit(k - 1))).as("s"))
      .select(pmod(xxhash64(col("k"), col("s")), lit(mBits.toLong)).as("pos"))
      .select(expr("cast(pos div 64 as int) as w"),
        expr("shiftleft(1L, cast(pos % 64 as int)) as b"))
      .groupBy("w").agg(expr("bit_or(b) as bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Probe predicate: all k bits set. Pure codegen expressions over an
    * array literal — evaluated before any exchange.
    */
  def mightContain(key: Column, bitmap: Array[Long], mBits: Int, k: Int): Column =
    (0 until k).map { s =>
      val pos = pmod(xxhash64(key, lit(s)), lit(mBits.toLong))
      val word = element_at(typedLit(bitmap.toSeq), (pos / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)

  /** Bloom-pruned left-semi join. Result is EXACTLY
    * `probe SEMI JOIN build` — the bitmap only prunes probe rows that
    * cannot match, so correctness never depends on bloom sizing; m and
    * k only steer how much of the probe side survives to the join.
    */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
               buildKey: String, mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    val bitmap = buildBitmap(build, buildKey, mBits, k)
    // no broadcast hint on the exact verify join: the build side is
    // usually small (that's why a bloom fits), but hint-forcing it
    // would bypass AQE's size check for callers with a larger build —
    // AQE picks BHJ by measured size where it's safe
    probe.filter(mightContain(col(probeKey), bitmap, mBits, k))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "leftsemi")
  }
}
