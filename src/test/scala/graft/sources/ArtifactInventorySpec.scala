package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.SimIndex

/** The cross-prefix artifact inventory ([[Artifacts.inventory]]): the
  * ops view of everything the derived-state subsystem has published —
  * versioned index roots, publish-once roots, and crash residue.
  */
class ArtifactInventorySpec extends SparkSpec {
  import spark.implicits._

  test("inventory reports versioned + publish-once roots with residue") {
    val base = Files.createTempDirectory("artinv").toString
    // build the layout directly (inventory is a pure dir reader):
    // one committed versioned root with a crash orphan + a stage,
    // one committed publish-once root with an orphaned sibling stage
    val b = new java.io.File(base)
    val vroot = new java.io.File(b, "graft-simidx-sf0.01-v1-aabbccdd")
    val v1 = new java.io.File(vroot, "index.v1")
    assert(v1.mkdirs())
    Files.writeString(v1.toPath.resolve("part-0.parquet"), "x")
    Files.createFile(v1.toPath.resolve("_SUCCESS"))
    assert(new java.io.File(vroot, "index.v2").mkdirs()) // crash orphan
    assert(new java.io.File(vroot, ".staging-xyz").mkdirs())
    val proot = new java.io.File(b, "graft-pairs-sf0.01-v2-11223344")
    assert(proot.mkdirs())
    Files.writeString(proot.toPath.resolve("part-0.parquet"), "yy")
    Files.createFile(proot.toPath.resolve("_SUCCESS"))
    assert(new java.io.File(b,
      "graft-pairs-sf0.01-v2-11223344.stage-ab12").mkdirs())

    val prev2 = sys.props.put("graft.artifacts.root", base)
    val inv =
      try Artifacts.inventory("/nonexistent-sf")
      finally prev2 match {
        case Some(v) => sys.props.put("graft.artifacts.root", v)
        case None => sys.props.remove("graft.artifacts.root")
      }
    val byName = inv.map(i => i.name -> i).toMap
    val vi = byName("graft-simidx-sf0.01-v1-aabbccdd")
    assert(vi.kind == "versioned")
    assert(vi.nCommitted == 1 && vi.headVersion.contains(1L))
    assert(vi.nResidue == 2, s"orphan v2 + staging dir: $vi")
    assert(vi.bytes >= 1 && vi.nFiles >= 2)
    val pi = byName("graft-pairs-sf0.01-v2-11223344")
    assert(pi.kind == "publish-once")
    assert(pi.nCommitted == 1 && pi.headVersion.contains(1L))
    assert(pi.nResidue == 1, s"orphaned sibling stage: $pi")
    // the sibling stage must NOT surface as an artifact of its own
    assert(!byName.contains("graft-pairs-sf0.01-v2-11223344.stage-ab12"))
  }

  test("inventory sees what SimIndex actually publishes") {
    val base = Files.createTempDirectory("artinv2").toString
    val prev = sys.props.put("graft.artifacts.root", base)
    try {
      // components must stay within the exact-arithmetic guard (|x| ≤ 23)
      val corpus = (0 until 10)
        .map(i => (i.toLong,
          Array.tabulate(8)(j => ((i * 8 + j) % 40).toFloat / 2.0f)))
        .toDF("vec_id", "embedding")
      val root = new java.io.File(base, "graft-simidx-test-v1-00").toString
      SimIndex.publish(corpus, "vec_id", "embedding", 4, 2, root)
      SimIndex.publish(corpus, "vec_id", "embedding", 4, 2, root)
      val inv = Artifacts.inventory("/nonexistent-sf")
      val vi = inv.find(_.name == "graft-simidx-test-v1-00").get
      assert(vi.kind == "versioned")
      assert(vi.nCommitted == 2 && vi.headVersion.contains(2L))
      assert(vi.nResidue == 0)
      assert(vi.bytes > 0 && vi.nFiles > 0)
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.artifacts.root", v)
        case None => sys.props.remove("graft.artifacts.root")
      }
    }
  }
}
