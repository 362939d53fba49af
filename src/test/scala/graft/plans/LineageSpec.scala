package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Lineage]]: column-level provenance extracted from analyzed
  * plans — value lineage through projections/aggregates/generators/
  * windows, control lineage through filters/joins/grouping keys.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read
    .parquet(s"$sf0001/embeddings.parquet")

  test("projection and aggregate lineage grounds in scan columns") {
    val q = docs.filter(col("lang") === "en")
      .groupBy("source")
      .agg(sum(length(col("text"))).as("chars"),
        count(lit(1)).as("n"))
    val r = Lineage.of(q)
    assert(r.value("chars") == Set("documents.text"))
    assert(r.value("n") == Set.empty) // count(1) touches no column
    assert(r.value("source") == Set("documents.source"))
    // lang gates rows, source groups them: both are control lineage
    assert(r.control.contains("documents.lang"), r.control)
    assert(r.control.contains("documents.source"), r.control)
    assert(!r.control.contains("documents.text"), r.control)
  }

  test("lineage flows through joins, renames and derived columns") {
    val a = docs.select(col("doc_id"), col("n_chars").as("len"))
    val b = emb.select(col("vec_id").as("doc_id"), col("label"))
    val q = a.join(b, Seq("doc_id"))
      .select(col("label"), (col("len") * 2).as("len2"))
    val r = Lineage.of(q)
    assert(r.value("len2") == Set("documents.n_chars"))
    assert(r.value("label") == Set("embeddings.label"))
    // the join key gates rows from both sides
    assert(r.control.contains("documents.doc_id"), r.control)
    assert(r.control.contains("embeddings.vec_id"), r.control)
  }

  test("generators and windows propagate their inputs") {
    val q = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy("w")))
      .select(col("w"), col("rnk"))
    val r = Lineage.of(q)
    assert(r.value("w") == Set("documents.text"))
    // rnk is a window over (source, w) — both flow in as value inputs
    assert(r.value("rnk").contains("documents.text"), r.value("rnk"))
  }
}
