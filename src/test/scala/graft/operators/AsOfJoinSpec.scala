package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades pick up the latest quote at-or-before their timestamp
  private lazy val trades = Seq(
    ("A", 5, 100L),   // after quotes at 1 and 3 -> quote@3
    ("A", 3, 101L),   // equal ts -> inclusive match with quote@3
    ("A", 0, 102L),   // before any quote -> null
    ("B", 9, 103L),   // only B quote is at 2
    ("C", 9, 104L))   // no quotes for C at all -> null
    .toDF("sym", "ts", "trade_id")

  private lazy val quotes = Seq(
    ("A", 1, 10.0), ("A", 3, 30.0), ("A", 7, 70.0),
    ("B", 2, 20.0))
    .toDF("sym", "ts", "px")

  test("asOf attaches the most recent right row per key, inclusive at equal ts") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts")
      .select("trade_id", "px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(
      100L -> Some(30.0),
      101L -> Some(30.0),   // equal-ts quote visible
      102L -> None,         // no prior quote
      103L -> Some(20.0),
      104L -> None))        // key with no right rows
  }

  test("asOf preserves left cardinality and column surface") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", "ts")
    assert(out.count() == 5)
    assert(out.columns.toSet == Set("sym", "ts", "trade_id", "px"))
  }
}
