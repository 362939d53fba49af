package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the textbook BPE corpus: low x5, lower x2, newest x6, widest x3
  private lazy val vocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("word", "freq")

  test("trainMerges learns the textbook merges with deterministic ties") {
    val out = Bpe.trainMerges(vocab, 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // r1: es/st tie at 9 -> lexicographic (e,s); r2: (es,t) 9;
    // r3: lo/ow tie at 7 -> (l,o)
    assert(out == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)))
  }

  test("train returns the segmented vocab under the learned merges") {
    val (_, seg) = Bpe.train(vocab, 3)
    val got = seg.as[(String, Seq[String])].collect().toMap
    // merges: (e,s) -> (es,t) -> (l,o)
    assert(got("newest") == Seq("n", "e", "w", "est"))
    assert(got("widest") == Seq("w", "i", "d", "est"))
    assert(got("low") == Seq("lo", "w"))
    assert(got("lower") == Seq("lo", "w", "e", "r"))
  }

  test("merge fold is greedy left-to-right on overlapping runs") {
    // 'aaaa' with top pair (a,a) must merge positions 1-2 and 3-4,
    // leaving no bare 'a' to seed an (aa,a) count inflation next round
    val runs = Seq(("aaaa", 10L), ("aaa", 1L)).toDF("word", "freq")
    val out = Bpe.trainMerges(runs, 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // r1 pairs: (a,a) = 3*10 + 2*1 = 32 -> merge
    //   aaaa -> [aa, aa]; aaa -> [aa, a]
    // r2 pairs: (aa,aa) = 10, (aa,a) = 1 -> top (aa,aa)
    assert(out == Seq(
      (1, "a", "a", "aa", 32L),
      (2, "aa", "aa", "aaaa", 10L)))
  }

  test("merges never cross word boundaries and plans stay join-free per word") {
    // two words sharing a frequent boundary bigram ('t'+'h' inside
    // words only): counts come from within-word adjacency alone
    val v = Seq(("cat", 4L), ("hat", 4L), ("th", 1L)).toDF("word", "freq")
    val r1 = Bpe.trainMerges(v, 1)
      .as[(Int, String, String, String, Long)].collect().head
    // within-word pairs: (c,a) 4, (a,t) 8, (h,a) 4, (t,h) 1 -> (a,t)
    assert(r1 == ((1, "a", "t", "at", 8L)))
  }
}
