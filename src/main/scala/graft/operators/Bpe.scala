package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) tokenizer TRAINING — the classic
  * vocabulary-learning stage of an LLM data pipeline (q55 builds the
  * raw word vocab; this learns the subword merges). Fixed-round
  * iterative top-pair merging in the q53/q70 discipline: integer
  * counts, deterministic tie-breaks, one declarative plan per round,
  * nothing collected driver-side.
  *
  * Per round over the weighted symbol-sequence vocab:
  *  1. count every ADJACENT symbol pair, weighted by word frequency —
  *     a map-side slice/zip explode into one groupBy(pair) shuffle
  *     (the vocab is word-distinct, so this is vocab-sized work, not
  *     corpus-sized — the corpus is touched once, at pre-tokenization);
  *  2. pick the top pair: max count, ties to the lexicographically
  *     least (lhs, rhs) — bit-identical on both engines over
  *     single-byte text;
  *  3. merge every greedy LEFT-TO-RIGHT NON-OVERLAPPING occurrence
  *     inside each word, map-only: the chosen pair joins the plan as
  *     a broadcast 1-row table (never a collected scalar — the q70
  *     stance) and the rewrite is a codegen'd array fold. A fold that
  *     merges when `last(acc) = lhs ∧ x = rhs` IS the greedy scan: a
  *     merged token (lhs·rhs, strictly longer than lhs) can never
  *     re-match lhs, so overlapping runs merge at odd positions
  *     exactly like the textbook scan — the property the oracle's
  *     run-parity window replay mirrors.
  *
  * The round state (vocab-sized) is localCheckpointed per round, so
  * the executed plan stays O(1) in round count — same practice as
  * [[VectorQuantizer.fitCentroids]] / [[PageRank.ranks]] /
  * [[ConnectedComponents]].
  *
  * Returns one row per round: (round, lhs, rhs, merged, cnt).
  * Requires a vocab with at least one multi-symbol word per trained
  * round (any natural corpus; a degenerate single-char vocab would
  * exhaust pairs).
  */
object Bpe {

  /** Train `rounds` merges over `vocab` = (word: string, freq: long):
    * returns (merge log, segmented vocab). The merge log has one row
    * per round; the segmented vocab is the final (word, syms) state —
    * the subword segmentation of every vocab word under the learned
    * merges, which is what APPLYING the tokenizer means (q76 joins it
    * back to the corpus). Symbols start as the word's characters;
    * merges are word-internal (no end-of-word marker — documented
    * boundary choice).
    */
  def train(vocab: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"at least one merge round, got $rounds")
    var v = vocab.select(col("word"), col("freq"),
      filter(split(col("word"), ""), s => s =!= lit("")).as("syms"))
    val merges = Seq.newBuilder[DataFrame]
    for (i <- 1 to rounds) {
      val pairs = v.select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("pr"))
        .select(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"), col("freq"))
        .groupBy("lhs", "rhs").agg(sum("freq").as("cnt"))
      // top pair: TakeOrderedAndProject (no global sort), materialized
      // once — it feeds both the merge log and the rewrite broadcast
      val best = pairs.orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1)
        .localCheckpoint()
      merges += best.select(lit(i).as("round"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
      // greedy merge fold; get() (null past the end) keeps the
      // last-element probe ANSI-safe on the empty accumulator
      v = v.crossJoin(broadcast(
          best.select(col("lhs").as("mA"), col("rhs").as("mB"))))
        .select(col("word"), col("freq"), aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, x) =>
            when(get(acc, size(acc) - 1) === col("mA") && x === col("mB"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(col("mA"), col("mB")))))
              .otherwise(concat(acc, array(x)))).as("syms"))
        .localCheckpoint()
    }
    (merges.result().reduce(_ unionByName _).orderBy("round"),
      v.select(col("word"), col("syms")))
  }

  /** The merge log alone (the q72 surface). */
  def trainMerges(vocab: DataFrame, rounds: Int): DataFrame =
    train(vocab, rounds)._1
}
