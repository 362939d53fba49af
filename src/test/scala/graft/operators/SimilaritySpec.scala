package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, -0.1f, 0f, 0f)),  // close to 0, same sign bucket
    (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 0
    (3L, Array(-1f, 0f, 0f, 0f)))      // opposite of 0
    .toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with correct values") {
    val out = Similarity.bruteForceTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 3)
      .select("vec_id", "cos_sim", "rnk").as[(Long, Double, Long)]
      .collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))      // by descending cosine
    assert(math.abs(out.head._2 - 0.993884) < 1e-6)
    assert(out(1)._2 == 0.0 && out(2)._2 == -1.0)
  }

  test("bucketedTopK only scores within the query's sign bucket") {
    val out = Similarity.bucketedTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", 3, bits = 4)
      .select("vec_id").as[Long].collect().toSet
    // vec 1 shares bucket "1000"; vec 2 ("0100") and 3 ("0000") do not
    assert(out == Set(1L))
  }

  test("cosine is symmetric and self-similarity is 1") {
    val a = VectorFunctions.cosine(col("x"), col("y"))
    val row = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f)))
      .toDF("x", "y").select(a.as("c")).as[Double].head()
    assert(math.abs(row - 1.0) < 1e-12)
  }
}
