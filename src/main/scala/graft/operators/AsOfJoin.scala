package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single most recent right
  * row with the same key and `right.ts <= left.ts` — the time-series
  * operator Spark lacks natively (SURVEY.md §2.3 lists it as
  * extension-only). Composed from built-ins per the custom-operator
  * preference order — no custom SparkPlan needed:
  *
  * both sides are tagged and unioned, sorted per key by
  * `(ts, side)` with right rows before left rows at equal timestamps
  * (inclusive as-of semantics, matching DuckDB's ASOF JOIN), and the
  * latest right payload is carried forward by a running
  * `last(_, ignoreNulls)` window. Cost shape: ONE shuffle on the key
  * — identical to a regular sort-merge join at any scale, with none
  * of the row explosion a naive range-join (`l.ts >= r.ts` then
  * max-per-key) would produce on a 100 TB fact side.
  *
  * Requirements: column sets disjoint apart from `key`; right unique
  * per `(key, ts)` for a deterministic result (dedupe first). Left
  * rows with no prior right row keep null payloads (left-join
  * semantics; filter payload non-null for inner).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String): DataFrame = {
    val payload = right.schema.filterNot(f => f.name == key || f.name == rightTs)
    val leftOnly = left.schema.filterNot(_.name == key)

    val l = left.select(
      Seq(col(key), col(leftTs).as("_ts"), lit(1).as("_side")) ++
        leftOnly.filterNot(_.name == leftTs).map(f => col(f.name)) ++
        payload.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val r = right.select(
      Seq(col(key), col(rightTs).cast(l.schema("_ts").dataType).as("_ts"),
        lit(0).as("_side")) ++
        leftOnly.filterNot(_.name == leftTs)
          .map(f => lit(null).cast(f.dataType).as(f.name)) ++
        payload.map(f => col(f.name)): _*)

    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (df, f) =>
      df.withColumn(f.name, last(col(f.name), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .drop("_side")
      .withColumnRenamed("_ts", leftTs)
  }
}
