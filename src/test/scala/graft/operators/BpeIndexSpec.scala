package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted tokenizer (sixth family): frozen-merge artifact,
  * bucket-pruned memo probe with a fold path for unseen words, memo
  * deltas, the word-level purge, and the fertility-drift re-train.
  */
class BpeIndexSpec extends SparkSpec {
  import spark.implicits._

  private val R = 4

  // a tiny corpus with heavy "ab"/"abc" mass so the learned merges
  // are predictable-ish and unseen words share trained pairs
  private lazy val train = Seq(
    (1L, "abab abc abc abab cab"),
    (2L, "abc abab bc bc cab"),
    (3L, "abab abc dd dd dd")).toDF("doc_id", "text")
  private lazy val batch = Seq(
    (10L, "abc abab zz"),       // known words + unseen zz
    (11L, "ababab cab qq abc")) // unseen ababab/qq
    .toDF("doc_id", "text")

  test("tokenize ≡ train-time segmentation for known AND unseen words") {
    val root = Files.createTempDirectory("bpeidx").toString
    BpeIndex.publish(train, "doc_id", "text", R, root)
    // ground truth: apply the committed merges to EVERY batch word
    // via the public fold — the memo path must agree with it exactly
    val merges = spark.read.parquet(
        new java.io.File(BpeIndex.resolve(root).get, "merges").toString)
      .orderBy("round").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val words = batch.select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0).distinct()
    val bySeg = BpeIndex.applyMerges(words, merges)
      .as[(String, Long)].collect().toMap
    val got = BpeIndex.tokenize(spark, batch, "doc_id", "text", root)
      .as[(Long, Long, Long)].collect()
      .map { case (d, w, s) => d -> ((w, s)) }.toMap
    val occ = batch.select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0).as[(Long, String)].collect()
    val want = occ.groupBy(_._1).map { case (d, ws) =>
      d -> ((ws.length.toLong, ws.map(w => bySeg(w._2)).sum))
    }
    assert(got == want, s"memo/fold split diverges: got $got want $want")
  }

  test("tokenize prunes the memo to touched word buckets") {
    val root = Files.createTempDirectory("bpeidx").toString
    BpeIndex.publish(train, "doc_id", "text", R, root)
    val one = Seq((20L, "abc")).toDF("doc_id", "text")
    val p = BpeIndex.tokenizePlan(spark, one, "doc_id", "text", root)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"tokenize scan lost its pbucket partition filter:\n${p.take(1500)}")
  }

  test("memoLookup prunes to the query words' buckets and matches memoAll membership") {
    val root = Files.createTempDirectory("bpeidx").toString
    BpeIndex.publish(train, "doc_id", "text", R, root)
    val q = Seq("abc", "zz", "cab").toDF("word") // 2 known, 1 absent
    // pruning: the lookup scan must carry a static pbucket filter
    val p = BpeIndex.memoLookupPlan(spark, q, root)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pbucket".r.findFirstIn(p).isDefined,
      s"memoLookup scan lost its pbucket partition filter:\n${p.take(1500)}")
    // membership + n_sub agree with the full-scan inventory
    val got = BpeIndex.memoLookup(spark, q, root)
      .as[(String, Long)].collect().toMap
    val want = BpeIndex.memoAll(spark, root)
      .select($"word", $"n_sub")
      .join(q, Seq("word"), "leftsemi")
      .as[(String, Long)].collect().toMap
    assert(got == want, s"memoLookup diverges from memoAll: $got vs $want")
    assert(got.keySet == Set("abc", "cab") && !got.contains("zz"))
  }

  test("memo deltas fold at batch cost and serve identically; purgeWords never changes results") {
    val root = Files.createTempDirectory("bpeidx").toString
    val basePath = BpeIndex.publish(train, "doc_id", "text", R, root)
    val before = BpeIndex.tokenize(spark, batch, "doc_id", "text", root)
      .as[(Long, Long, Long)].collect().toSet
    // fold the batch's unseen words into the memo (what a streaming
    // ingest does after tokenizing): results must not move
    val merges = spark.read.parquet(
        new java.io.File(basePath, "merges").toString)
      .orderBy("round").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val unseenSeg = BpeIndex.applyMerges(
      Seq("zz", "ababab", "qq").toDF("word"), merges)
    BpeIndex.foldMemo(spark, unseenSeg, root, tag = "b0")
    assert(BpeIndex.deltas(root).size == 1)
    // redelivered tagged fold absorbed
    BpeIndex.foldMemo(spark, unseenSeg, root, tag = "b0")
    assert(BpeIndex.deltas(root).size == 1)
    assert(BpeIndex.tokenize(spark, batch, "doc_id", "text", root)
      .as[(Long, Long, Long)].collect().toSet == before)
    // the committed base was not rewritten by the fold
    assert(BpeIndex.resolve(root).contains(basePath))
    // word-level purge: the literal token leaves the stored artifact,
    // tokenize results are unchanged (the word re-derives via fold)
    BpeIndex.purgeWords(spark, Seq("cab", "zz").toDF("word"), root)
    BpeIndex.vacuumOld(root)
    val memo = spark.read.parquet(
      new java.io.File(BpeIndex.resolve(root).get, "memo").toString)
    assert(memo.filter($"word".isin("cab", "zz")).count() == 0,
      "purged word string still stored in the memo")
    assert(BpeIndex.deltas(root).isEmpty, "purge must fold the delta log")
    assert(BpeIndex.tokenize(spark, batch, "doc_id", "text", root)
      .as[(Long, Long, Long)].collect().toSet == before,
      "purgeWords changed tokenize results — memo is cache, not truth")
  }

  test("re-publish invalidates the memo delta log: old-merge n_sub never served") {
    val root = Files.createTempDirectory("bpeidx").toString
    BpeIndex.publish(train, "doc_id", "text", R, root)
    // fold a word under the v1 merges
    val merges1 = spark.read.parquet(
        new java.io.File(BpeIndex.resolve(root).get, "merges").toString)
      .orderBy("round").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    BpeIndex.foldMemo(spark,
      BpeIndex.applyMerges(Seq("ababab").toDF("word"), merges1),
      root, tag = "b0")
    assert(BpeIndex.deltas(root).size == 1)
    // re-train on a drifted corpus: different merges, so the delta's
    // n_sub is derived from superseded state and must be invalidated
    val drifted = train.select($"doc_id", reverse($"text").as("text"))
    assert(BpeIndex.retrainOnFertility(spark, drifted, "doc_id", "text",
      root, factorMilli = 1050L).isDefined)
    assert(BpeIndex.deltas(root).isEmpty,
      "re-publish left old-merge memo deltas in the log")
    assert(BpeIndex.folded(root, "b0"),
      "invalidated delta lost its durable record — a redelivered fold " +
        "would re-commit old-merge rows")
    // memo-hit ≡ fold invariant under the NEW merges: tokenize of the
    // previously-folded word equals a fresh fold against v2
    val merges2 = spark.read.parquet(
        new java.io.File(BpeIndex.resolve(root).get, "merges").toString)
      .orderBy("round").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val want = BpeIndex.applyMerges(Seq("ababab").toDF("word"), merges2)
      .as[(String, Long)].collect().head._2
    val got = BpeIndex.tokenize(spark,
        Seq((90L, "ababab")).toDF("doc_id", "text"),
        "doc_id", "text", root)
      .select("n_subwords").as[Long].head()
    assert(got == want,
      s"stale delta served old-merge n_sub: got $got want $want")
  }

  test("a purge crash-leftover delta cannot resurrect the purged word") {
    val root = Files.createTempDirectory("bpeidx").toString
    BpeIndex.publish(train, "doc_id", "text", R, root)
    val merges = spark.read.parquet(
        new java.io.File(BpeIndex.resolve(root).get, "merges").toString)
      .orderBy("round").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    val deltaPath = BpeIndex.foldMemo(spark,
      BpeIndex.applyMerges(Seq("zz").toDF("word"), merges),
      root, tag = "b0")
    // snapshot the delta dir, purge, then restore the snapshot —
    // exactly the crash window between a purge's commit and its
    // delta cleanup
    val backup = Files.createTempDirectory("bpeidx-bak").toString
    def copy(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).getOrElse(Array.empty)
          .foreach(f => copy(f, new java.io.File(dst, f.getName)))
      } else {
        java.nio.file.Files.copy(src.toPath, dst.toPath); ()
      }
    }
    copy(new java.io.File(deltaPath), new java.io.File(backup, "batch-b0"))
    BpeIndex.purgeWords(spark, Seq("zz").toDF("word"), root)
    copy(new java.io.File(backup, "batch-b0"), new java.io.File(deltaPath))
    assert(BpeIndex.deltas(root).size == 1, "leftover not restored")
    // the leftover is named in _folded.json: reads skip it
    assert(BpeIndex.memoAll(spark, root)
      .filter($"word" === "zz").isEmpty,
      "crash-leftover delta resurrected the purged word on read")
    // and the NEXT purge must not write it back into the new base
    BpeIndex.purgeWords(spark, Seq("cab").toDF("word"), root)
    assert(BpeIndex.memoAll(spark, root)
      .filter($"word" === "zz").isEmpty,
      "next purge unioned the leftover and resurrected the word")
    assert(BpeIndex.deltas(root).isEmpty,
      "purge did not clean the already-folded leftover")
  }

  test("retrainOnFertility: absorbs a stable corpus, fires on a drifted one") {
    val root = Files.createTempDirectory("bpeidx").toString
    BpeIndex.publish(train, "doc_id", "text", R, root)
    assert(BpeIndex.publishFertility(root) > 0L)
    assert(BpeIndex.retrainOnFertility(spark, train, "doc_id", "text",
      root, factorMilli = 1050L).isEmpty,
      "trigger fired on the training corpus itself (ratio is 1000)")
    assert(VersionedDirs.versionsOf(root).size == 1)
    // reversed orthography: the learned merges stop firing
    val drifted = train.select($"doc_id", reverse($"text").as("text"))
    val fired = BpeIndex.retrainOnFertility(spark, drifted, "doc_id",
      "text", root, factorMilli = 1050L)
    assert(fired.isDefined, "trigger failed to fire on reversal")
    assert(BpeIndex.rounds(root) == R)
    // the re-published artifact fits the drifted corpus exactly as a
    // fresh publish: remeasuring lands on ratio 1000
    val f = BpeIndex.fertility(spark, drifted, "doc_id", "text", root)
    assert(f * 1000L / BpeIndex.publishFertility(root) == 1000L)
  }
}
