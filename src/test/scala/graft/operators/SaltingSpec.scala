package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  // one hot key owning ~90% of rows — the shape salting exists for
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toLong)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toLong)))
    .toDF("key", "v").repartition(8)

  test("saltedCount equals plain groupBy count") {
    val plain = skewed.groupBy("key").count()
      .as[(String, Long)].collect().toMap
    val salted = Salting.saltedCount(skewed, Seq("key"), salts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == 900L)
  }

  test("saltedSum equals plain groupBy sum") {
    val plain = skewed.groupBy("key").agg(sum("v")).as[(String, Long)]
      .collect().toMap
    val salted = Salting.saltedSum(skewed, Seq("key"), "v", salts = 4)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "tag")
    val plain = skewed.join(dim, Seq("key")).select("key", "v", "tag")
      .as[(String, Long, String)].collect().toSeq.sorted
    val salted = Salting.saltedJoin(skewed, dim, "key", salts = 4)
      .select("key", "v", "tag")
      .as[(String, Long, String)].collect().toSeq.sorted
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 900)
  }
}
