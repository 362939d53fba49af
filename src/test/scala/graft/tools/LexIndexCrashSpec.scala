package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.LexIndex

/** PROCESS-level crash safety of the persisted-index lifecycle: a
  * writer JVM appending tagged deltas (with a merge-compaction every
  * third append) is SIGKILLed at an arbitrary point — mid-append,
  * mid-merge, or in the merge's commit→delete window — and a fresh
  * reader must see an index EXACTLY equal to a from-scratch publish
  * of some committed prefix of the batches: correct rows AND correct
  * collection statistics (BM25 scores depend on N/Σdl, so a torn
  * stats sidecar or a double-read folded delta would shift every
  * score, not just drop rows). The constructed-state twins live in
  * LexIndexSpec; this is the real-dead-JVM version, the reference's
  * fork()+kill scenario applied to the index family.
  */
class LexIndexCrashSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def docsDF(r: Range) =
    r.map(j => (j.toLong, CrashWriter.doc(j))).toDF("doc_id", "text")

  private def probeSet(root: String): Set[(Long, Long, Long, Long, Long)] =
    LexIndex.bm25TopK(spark,
        Seq((0L, "alpha"), (0L, "word5"), (1L, "zeta"), (1L, "token7"))
          .toDF("query_id", "term"),
        "query_id", "term", K, root)
      .select($"query_id", $"index_id", $"n_hit", $"score", $"rnk")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("SIGKILLed index writer leaves a committed batch prefix with exact stats") {
    val dir = Files.createTempDirectory("graft-lexcrash").toString
    val commits = KillHarness.runAndKill(Seq(dir, "lexindex"),
      minCommits = 4)
    assert(commits >= 4, s"writer made only $commits appends before timeout")

    val root = new java.io.File(dir, "lexroot").getAbsolutePath
    // a committed generation always resolves (never a torn dir)
    assert(LexIndex.resolve(root).isDefined)
    val got = probeSet(root)
    // the kill window allows exactly two corpus states: the writer
    // completed `commits` appends (kill landed after the println) or
    // one more (kill landed between an append's commit and its
    // println). Served content must equal a NEVER-CRASHED publish of
    // one of them — rows and statistics both, which is what scoring
    // through fresh roots proves.
    val candidates = Seq(commits, commits + 1).map { k =>
      val fresh = Files.createTempDirectory("graft-lexcrash").toString
      LexIndex.publish(docsDF(0 until 20 + 5 * k), "doc_id", "text",
        fresh)
      probeSet(fresh)
    }
    assert(candidates.contains(got),
      s"post-kill index matches no committed batch prefix " +
        s"($commits or ${commits + 1} appends)")

    // the next maintenance cycle heals in place: a merge from THIS
    // process folds whatever the kill left (live deltas, crash-leftover
    // folded dirs) without changing the served ranking
    LexIndex.mergeCompact(spark, root)
    assert(LexIndex.deltas(root).isEmpty)
    assert(probeSet(root) == got,
      "healing merge changed the served ranking")
  }
}
