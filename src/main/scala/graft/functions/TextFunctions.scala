package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline
  * operators (tokenization, shingling, quality metrics, language ID,
  * fingerprinting). Pure `functions._` compositions — everything stays
  * inside whole-stage codegen; no UDFs.
  *
  * Each primitive that feeds an oracled query has a `...Sql` twin
  * producing the equivalent DuckDB expression, kept adjacent so the
  * two can only change together.
  */
object TextFunctions {

  /** Whitespace tokens (the corpus is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  def wordsSql(e: String): String = s"regexp_split_to_array($e, ' ')"

  /** DuckDB twin of [[graft.operators.Dedup.shingleSet]]'s word
    * n-gram construction, over a list expression `arr` (1-indexed
    * lists; `range(1, len-n+2)` yields starts 1..len-n+1, and an
    * empty list below n words — the same below-n semantics the Spark
    * side guards explicitly).
    */
  def shinglesSql(arr: String, n: Int = 3): String = {
    val gram = (0 until n).map(j => s"$arr[i + $j]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($arr) - ${n - 2}), i -> $gram)"
  }

  /** Stopword list used by quality scoring and language ID. */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Ratio of stopword tokens — high for prose, low for word-salad;
    * one of the standard quality-filter features.
    */
  def stopwordRatio(w: Column): Column =
    size(filter(w, x => x.isin(stopwordsEn: _*))) / size(w).cast("double")

  def stopwordRatioSql(arr: String): String = {
    val list = stopwordsEn.map(s => s"'$s'").mkString(", ")
    s"len(list_filter($arr, x -> x IN ($list))) / len($arr)::DOUBLE"
  }

  /** Type-token ratio (distinct words / words) — repetition detector. */
  def uniqueRatio(w: Column): Column =
    size(array_distinct(w)) / size(w).cast("double")

  def uniqueRatioSql(arr: String): String =
    s"len(list_distinct($arr)) / len($arr)::DOUBLE"

  /** Blended document quality score (length / stopword / type-token),
    * the single definition behind q29 scoring, q56's source means and
    * q60's adaptive thresholds — one formula, so a weight change
    * cannot reach some call sites (or some oracles) and not others.
    */
  def qualityScore(w: Column): Column =
    lit(0.4) * least(lit(1.0), size(w) / lit(50.0)) +
      lit(0.3) * stopwordRatio(w) + lit(0.3) * uniqueRatio(w)

  def qualityScoreSql(arr: String): String =
    s"0.4 * least(1.0, len($arr) / 50.0) " +
      s"+ 0.3 * (${stopwordRatioSql(arr)}) + 0.3 * (${uniqueRatioSql(arr)})"
}
