package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** [[ZOrder]]: morton-key correctness (bijective interleave) and the
  * property the layout exists for — a 2-D rectangle predicate
  * intersects far fewer curve-prefix "files" than linear-sort files,
  * measured on real file statistics from both layouts.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey interleaves bits (known values, bijective on the domain)") {
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (7, 7))
      .toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().toSeq
    // z(a,b) = interleave(a even bits, b odd bits):
    // (1,0)=1, (0,1)=2, (1,1)=3, (3,5)= a:11 b:101 -> 100111 = 39, (7,7)=63
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, 63L))
    // bijective over the full 3-bit × 3-bit domain
    val all = (for { a <- 0 to 7; b <- 0 to 7 } yield (a, b)).toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b"), 3).as("z"))
      .as[Long].collect()
    assert(all.toSet.size == 64 && all.min == 0L && all.max == 63L)
  }

  test("mortonSql mirrors mortonKey bit for bit") {
    // Spark 4 parses the same ::BIGINT cast syntax DuckDB does, so the
    // oracle string runs verbatim — including the pre-shift widening
    val df = (for { a <- 0 to 31; b <- 0 to 31 } yield (a, b)).toDF("a", "b")
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.mortonSql("a", "b", 5)} AS z FROM zin")
      .as[Long].collect().toSeq
    val viaCol = df.select(ZOrder.mortonKey(col("a"), col("b"), 5).as("z"))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("mortonKey is exact for bits ≥ 16 (long arithmetic, no int wrap)") {
    // int shifts mask the amount mod 32, so before the long-widening
    // fix any interleave position ≥ 32 silently aliased; bits=20 puts
    // the top term at position 39
    def ref(a: Long, b: Long): Long =
      (0 until 20).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val m = (1 << 20) - 1
    val cases = Seq((m, m), (m, 0), (0, m), (1 << 19, 1 << 19), (777777, 999999))
    val got = cases.toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b"), 20).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) })
    assert(got.head == (1L << 40) - 1)
    // and the SQL twin agrees on the widened domain too
    cases.toDF("a", "b").createOrReplaceTempView("zwide")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.mortonSql("a", "b", 20)} AS z FROM zwide")
      .as[Long].collect().toSeq
    assert(viaSql == got)
  }

  test("z-order files prune a rectangle predicate; linear-sort files cannot") {
    // 64×64 grid, one row per cell; 64 "files" of 64 rows each
    val grid = (for { a <- 0 until 64; b <- 0 until 64 } yield (a, b))
      .toDF("a", "b")
    val nFiles = 64

    // per-file min/max stats under each layout
    def stats(fileIdOf: org.apache.spark.sql.Column) = grid
      .withColumn("f", fileIdOf)
      .groupBy("f").agg(min("a").as("mina"), max("a").as("maxa"),
        min("b").as("minb"), max("b").as("maxb"))
      .as[(Long, Int, Int, Int, Int)].collect()

    // z-order: file = 6-bit prefix of the 12-bit morton key
    val zStats = stats(shiftright(
      ZOrder.mortonKey(col("a"), col("b"), 6), 6))
    // linear: sort by (a, b) → file = rank / 64 = a (64 rows per a)
    val linStats = stats(col("a").cast("long"))

    // rectangle predicate: a in [8,15] AND b in [8,15]
    def hit(s: (Long, Int, Int, Int, Int)) =
      s._3 >= 8 && s._2 <= 15 && s._5 >= 8 && s._4 <= 15
    val zHits = zStats.count(hit)
    val linHits = linStats.count(hit)
    // z-order: the 8×8 rectangle is one aligned curve quadrant — a
    // single file's span contains it; linear layout: every a-file
    // spans all of b, so all 8 a-matching files must be read
    assert(zHits <= 2, s"z-order read $zHits files")
    assert(linHits == 8, s"linear read $linHits files")
    // and the layouts carry identical data (pruning is metadata-only)
    assert(ZOrder.cluster(grid, "a", "b", 6, nFiles).count() == grid.count())
  }
}
