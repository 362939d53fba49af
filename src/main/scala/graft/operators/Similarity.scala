package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, mirroring how ANN is actually deployed:
  *  - [[bruteForceTopK]] — exact cosine top-k via a query⨯corpus join.
  *    The query side is small and broadcast, so the corpus is scanned
  *    once with no shuffle of the big side; exact, and the baseline
  *    the approximate tier is measured against.
  *  - [[bucketedTopK]] — sign-bit LSH bucketing: corpus and queries
  *    are keyed by [[signBucket]], the join shuffles on the bucket key
  *    only, and scoring happens within buckets. Sub-linear probe cost
  *    at the price of recall — the 100 TB path.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (excluding self). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    val scored = corpus.select(col(id), col(vec))
      .join(q, col(id) =!= col("query_id"))
      .select(col("query_id"), col(id),
        round(cosine(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  /** Approximate top-k: score only within the query's sign bucket. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame,
                   id: String, vec: String, k: Int, bits: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(id), col(vec),
      signBucket(col(vec), bits).as("bucket"))
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv"),
      signBucket(col(vec), bits).as("bucket")))
    val scored = bucketed.join(q,
        bucketed("bucket") === q("bucket") && col(id) =!= col("query_id"))
      .select(col("query_id"), col(id),
        round(cosine(col("qv"), col(vec)), 6).as("cos_sim"))
    topK(scored, id, k)
  }

  private def topK(scored: DataFrame, id: String, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos_sim"), asc(id))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }
}
