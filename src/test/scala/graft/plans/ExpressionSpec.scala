package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.VectorFunctions

/** The native [[CosineSimilarity]] expression must be a drop-in for
  * the HOF composition — same values to the last bit (both sum in
  * ascending element order), or the DuckDB oracles would drift.
  */
class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[Array[Float]] =
    Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-5f, 5f)).map(_.toArray))
      .apply(Gen.Parameters.default, Seed(7L)).get

  test("native cosine equals the HOF composition bit-for-bit") {
    val pairs = vecs(200, 64).grouped(2).map(p => (p(0), p(1))).toSeq
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      VectorFunctions.cosineNative(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
  }

  test("interpreted eval path (no codegen) agrees too") {
    // force the interpreted path by evaluating the expression directly
    val Seq((a, b)) = vecs(2, 8).grouped(2).map(p => (p(0), p(1))).toSeq
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val mk = (v: Array[Float]) => Literal.create(
      ArrayData.toArrayData(v),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val interpreted = CosineSimilarity(mk(a), mk(b)).eval(null)
      .asInstanceOf[Double]
    val viaSpark = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineNative(col("a"), col("b")))
      .as[Double].head()
    assert(interpreted == viaSpark)
  }

  test("native L2DistSq equals the HOF integer composition bit-for-bit") {
    import graft.operators.VectorQuantizer
    val pairs = vecs(200, 64).grouped(2).map(p => (p(0), p(1))).toSeq
    val toLongs = (c: org.apache.spark.sql.Column) =>
      transform(c, x => round(x.cast("double") * 1000000).cast("long"))
    val df = pairs.toDF("a", "b")
      .select(toLongs(col("a")).as("xa"), toLongs(col("b")).as("xb"))
    val rows = df.select(
      VectorQuantizer.l2DistSq(col("xa"), col("xb")).as("native"),
      aggregate(zip_with(col("xa"), col("xb"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, d) => acc + d).as("hof"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val mk = (v: Array[Long]) => Literal.create(ArrayData.toArrayData(v),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    assert(L2DistSq(mk(Array(3L, -2L)), mk(Array(-1L, 2L))).eval(null) == 32L)
  }

  test("native MultiTableBuckets equals a scala replay of the sigma mix") {
    val xs = Array(1000000L, -2000000L, 500000L, -250000L, 750000L)
    def replay(bits: Int, tables: Int): Seq[Long] =
      (0 until tables).map { t =>
        (0 until bits).foldLeft(0L) { (bucket, i) =>
          val acc = xs.indices.foldLeft(0L) { (a, j) =>
            val u = (t.toLong * 4096L + i) * 4096L + j
            val m = (u * MultiTableBuckets.MIX_MUL + MultiTableBuckets.MIX_ADD) %
              MultiTableBuckets.MIX_MOD
            a + (1L - 2L * (m % 2L)) * xs(j)
          }
          if (acc > 0L) bucket | (1L << i) else bucket
        }
      }
    val viaSpark = Seq(Tuple1(xs)).toDF("xs")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        MultiTableBuckets(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("xs")), 4, 3)))
      .as[Seq[Long]].head()
    assert(viaSpark == replay(4, 3))
    // DuckDB-prototype parity anchor (the values the oracle computes)
    assert(replay(4, 3) == Seq(4L, 10L, 4L))
  }

  test("native CharPolyHash equals the ascii∘substr fold bit-for-bit") {
    import graft.functions.Hashing
    // random printable-ASCII grams, including strings SHORTER than k
    // (the fold's ascii("") = 0 trailing terms) and longer ones
    val strs = Gen.listOfN(300,
        Gen.choose(0, 40).flatMap(n =>
          Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)))
      .apply(Gen.Parameters.default, Seed(11L)).get
    val df = strs.toDF("s")
    for (k <- Seq(1, 8, 32)) {
      val rows = df.select(
        Hashing.charHash(col("s"), k).as("native"),
        Hashing.charHashFold(col("s"), k).as("fold"))
        .as[(Long, Long)].collect()
      rows.foreach { case (n, f) => assert(n == f, s"k=$k: $n != $f") }
    }
    // null-transparent like the fold's chain
    val nulls = Seq(Option.empty[String], Some("abc")).toDF("s")
      .select(Hashing.charHash(col("s"), 8)).as[Option[Long]].collect()
    assert(nulls.head.isEmpty && nulls(1).nonEmpty)
    // the guard rides the same pass: a multibyte char in the read
    // prefix raises, same contract as asciiGuard
    val ex = intercept[Exception] {
      Seq("café").toDF("s")
        .select(Hashing.charHash(col("s"), 8)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("native CharEnergy equals a scala replay of the byte fold") {
    val strs = Gen.listOfN(200,
        Gen.choose(0, 40).flatMap(n =>
          Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)))
      .apply(Gen.Parameters.default, Seed(12L)).get
    def replay(s: String, k: Int, center: Int): Long =
      (0 until k).map { j =>
        val c = if (j < s.length) s.charAt(j).toLong else 0L
        val d = c - center
        d * d
      }.sum
    val df = strs.toDF("s")
    for (k <- Seq(1, 32)) {
      val got = df.select(col("s"),
          graft.multimodal.Multimodal.frameEnergy(col("s"), k, 96).as("e"))
        .as[(String, Long)].collect()
      got.foreach { case (s, e) =>
        assert(e == replay(s, k, 96), s"k=$k s='$s'") }
    }
    // null-transparent; non-ASCII prefix raises (asciiGuard contract)
    val nulls = Seq(Option.empty[String], Some("abc")).toDF("s")
      .select(graft.multimodal.Multimodal.frameEnergy(col("s"), 8, 96))
      .as[Option[Long]].collect()
    assert(nulls.head.isEmpty && nulls(1).nonEmpty)
    val ex = intercept[Exception] {
      Seq("café").toDF("s")
        .select(graft.multimodal.Multimodal.frameEnergy(col("s"), 8, 96))
        .collect()
    }
    assert(ex.getMessage != null)
    // SQL registration
    org.apache.spark.sql.graft.ColumnBridge.register(spark, CharEnergy.description)
    // 'ab' at k=2, center 96: (97−96)² + (98−96)² = 5
    assert(spark.sql("SELECT char_energy('ab', 2, 96) AS e")
      .as[Long].head() == 5L)
  }

  test("L2DistSq and mt_buckets register for SQL users") {
    org.apache.spark.sql.graft.ColumnBridge.register(spark, L2DistSq.description)
    org.apache.spark.sql.graft.ColumnBridge.register(
      spark, MultiTableBuckets.description)
    assert(spark.sql(
      "SELECT l2_dist_sq(array(3L, -2L), array(-1L, 2L)) AS d")
      .as[Long].head() == 32L)
    assert(spark.sql(
      "SELECT size(mt_buckets(array(1000000L), 4, 3)) AS n")
      .as[Int].head() == 3)
    org.apache.spark.sql.graft.ColumnBridge.register(
      spark, CharPolyHash.description)
    // 'ab' at k=2: (0·257+97)·257+98 mod (2^31−1) = 25027
    assert(spark.sql("SELECT char_poly_hash('ab', 2) AS h")
      .as[Long].head() == 97L * 257L + 98L)
  }

  test("handles nulls, mismatched lengths, and SQL registration") {
    val df = Seq(
      (Some(Array(1f, 0f)), Some(Array(1f, 0f, 9f))), // common-prefix compare
      (None, Some(Array(1f, 0f))))                    // null in -> null out
      .toDF("a", "b")
    val out = df.select(VectorFunctions.cosineNative(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(out.head.contains(1.0))
    assert(out(1).isEmpty)

    // the SparkSessionExtensions route: register and call from SQL
    org.apache.spark.sql.graft.ColumnBridge.register(
      spark, CosineSimilarity.description)
    val sqlVal = spark.sql(
      "SELECT cosine_sim(array(1.0f, 2.0f), array(2.0f, 4.0f)) AS c")
      .as[Double].head()
    assert(math.abs(sqlVal - 1.0) < 1e-15)
  }
}
