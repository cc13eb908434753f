package graft

import graft.operators.IndexManifest

/** The commit protocol behind q303/q304/q306: resolve returns the
  * LATEST committed generation set, in commit order, and never sees a
  * partial or uncommitted manifest. */
class IndexManifestSpec extends SparkSpec {

  private def withRoot(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    try f(dir)
    finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("resolve returns the latest committed set in commit order") {
    withRoot { root =>
      IndexManifest.commit(spark, root, Seq("/gen/a"))
      IndexManifest.commit(spark, root, Seq("/gen/a", "/gen/b"))
      assert(IndexManifest.resolve(spark, root) === Seq("/gen/a", "/gen/b"))
      // a compaction-style switch RETIRES prior generations
      IndexManifest.commit(spark, root, Seq("/gen/c"))
      assert(IndexManifest.resolve(spark, root) === Seq("/gen/c"))
    }
  }

  test("an uncommitted manifest dir (no _SUCCESS) is invisible to resolve") {
    withRoot { root =>
      IndexManifest.commit(spark, root, Seq("/gen/a"))
      // simulate a crashed commit: a higher-id manifest dir whose
      // _SUCCESS marker never landed
      val crashed = new java.io.File(s"$root/m_99")
      assert(crashed.mkdirs())
      assert(IndexManifest.resolve(spark, root) === Seq("/gen/a"))
      // id allocation SKIPS the orphan (a max-committed allocator
      // would collide with m_99 forever once ids reached it): the
      // next commit lands ABOVE it and resolve keeps working
      IndexManifest.commit(spark, root, Seq("/gen/b"))
      val m100 = new java.io.File(s"$root/m_100")
      assert(m100.isDirectory,
        "commit must allocate past the crashed m_99 orphan")
      assert(IndexManifest.resolve(spark, root) === Seq("/gen/b"))
    }
  }

  test("resolve on a manifest-less root is a loud error, not an empty set") {
    withRoot { root =>
      val e = intercept[IllegalArgumentException] {
        IndexManifest.resolve(spark, root)
      }
      assert(e.getMessage.contains("no committed manifest"))
    }
  }
}
