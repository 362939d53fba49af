package graft.sources

import java.io.File
import java.nio.file.Files

/** [[Artifacts]] publish-once protocol: configurable root, fingerprint
  * + logic-version keying, the retention floor (newest prior committed
  * generation survives a re-publish), and orphaned-stage vacuuming.
  */
class ArtifactsSpec extends graft.SparkSpec {

  private def withRoot[A](f: File => A): A = {
    val root = Files.createTempDirectory("graft-artifacts-spec").toFile
    val prev = sys.props.get("graft.artifacts.root")
    sys.props("graft.artifacts.root") = root.getAbsolutePath
    try f(root)
    finally prev match {
      case Some(v) => sys.props("graft.artifacts.root") = v
      case None => sys.props.remove("graft.artifacts.root"); ()
    }
  }

  /** A fake one-file "table" under a fake sf dir; returns the sf dir. */
  private def mkTable(content: String): File = {
    val sf = Files.createTempDirectory("graft-sf").toFile
    Files.writeString(new File(sf, "t.parquet").toPath, content)
    sf
  }

  private def publish(sfDir: File, tag: String, version: Int = 1): String =
    Artifacts.publishOnce("spec-art", sfDir.getAbsolutePath,
        Seq("t.parquet"), version) { stage =>
      val d = new File(stage)
      d.mkdirs()
      Files.writeString(new File(d, "part-0").toPath, tag)
      Files.writeString(new File(d, "_SUCCESS").toPath, "")
    }

  test("publishes once under the configured root and reuses the commit") {
    withRoot { root =>
      val sf = mkTable("v1")
      val p1 = publish(sf, "first")
      assert(new File(p1).getParentFile.getCanonicalPath ===
        root.getCanonicalPath, "artifact must land under the override root")
      assert(Files.readString(new File(p1, "part-0").toPath) === "first")
      // second call must NOT rewrite (the write fn would change the tag)
      val p2 = publish(sf, "second")
      assert(p2 === p1)
      assert(Files.readString(new File(p2, "part-0").toPath) === "first")
    }
  }

  test("data or logic change mints a fresh key; retention keeps only " +
      "the newest prior committed generation") {
    withRoot { root =>
      val sf = mkTable("gen1")
      val p1 = publish(sf, "g1")
      // change the table (length changes the fingerprint)
      Files.writeString(new File(sf, "t.parquet").toPath, "gen2-longer")
      // make generation mtimes strictly ordered for the retention rank
      assert(new File(p1).setLastModified(
        System.currentTimeMillis() - 20000))
      val p2 = publish(sf, "g2")
      assert(p2 !== p1)
      assert(new File(p2).setLastModified(
        System.currentTimeMillis() - 10000))
      // logic bump: same data, new version constant → new key
      val p3 = publish(sf, "g3", version = 2)
      assert(p3 !== p2)
      // floor: p2 (newest prior committed) survives for readers that
      // resolved before the p3 publish; p1 is vacuumed
      assert(new File(p2, "_SUCCESS").exists(),
        "newest prior committed generation must survive")
      assert(!new File(p1).exists(), "older generations must vacuum")
    }
  }

  test("orphaned stage dirs vacuum after the age floor; fresh ones stay") {
    withRoot { root =>
      val sf = mkTable("data")
      val old = new File(root, "spec-art-" + sf.getName + "-vX.stage-dead")
      old.mkdirs()
      assert(old.setLastModified(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
      val fresh = new File(root, "spec-art-" + sf.getName + "-vY.stage-live")
      fresh.mkdirs()
      publish(sf, "g1")
      assert(!old.exists(), "crashed-writer stage past the age floor vacuums")
      assert(fresh.exists(), "an in-flight writer's stage is left alone")
    }
  }

  test("baseDir prefers an existing writable _derived sibling, never " +
      "creates one") {
    val prev = sys.props.get("graft.artifacts.root")
    sys.props.remove("graft.artifacts.root")
    try {
      val parent = Files.createTempDirectory("graft-data").toFile
      val sf = new File(parent, "sf0.5"); sf.mkdirs()
      // no sibling yet → tmpdir fallback, and nothing is created
      assert(Artifacts.baseDir(sf.getAbsolutePath).getCanonicalPath ===
        new File(sys.props("java.io.tmpdir")).getCanonicalPath)
      assert(!new File(parent, "_derived").exists(),
        "baseDir must not create _derived implicitly")
      new File(parent, "_derived").mkdirs()
      assert(Artifacts.baseDir(sf.getAbsolutePath).getCanonicalPath ===
        new File(parent, "_derived").getCanonicalPath)
    } finally prev.foreach(v => sys.props("graft.artifacts.root") = v)
  }
}
