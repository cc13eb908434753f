package graft.operators

import org.apache.spark.sql.SparkSession

/** Scratch-artifact plumbing shared by the persisted-index / codebook
  * queries (q285–q293): digest-named scratch roots, per-invocation
  * generation subdirectories, and a write-once materialization memo.
  *
  * Three round-12 ADVICE findings are closed here:
  *
  *  - scratch keys were the 32-bit `Tuple.hashCode` of (dir, params) —
  *    two corpus dirs could collide and silently share one temp
  *    directory. Keys are now a SHA-256 digest of the canonical
  *    parameter string ([[digest]]);
  *  - same-tag invocations OVERWROTE one directory, so a lazily-held
  *    plan over the previous generation could read deleted files or a
  *    wrong-generation artifact. Every handed-out output dir is now a
  *    fresh `gen_<n>` subdirectory ([[invocationDir]]) — immutable
  *    once written, valid for the lifetime of the JVM;
  *  - fixture-setup writes (the day-1 index a refresh/scrub consumes)
  *    were re-run and re-billed on every invocation. [[materialized]]
  *    runs a given writer AT MOST ONCE per (session, family, params,
  *    corpus fingerprint) — the memo discipline the round-12 verdict
  *    asked for (#5) — so the measured operator pays only its own
  *    O(novel) work on warm invocations.
  *
  * All scratch roots are deleted by ONE JVM shutdown hook; generation
  * dirs accumulate within a run (a few MB each at bench scale) and
  * are never deleted mid-run precisely so handed-out plans stay
  * valid. At 100 TB the analogues are immutable object-store
  * generations with lifecycle policies — the same write-once,
  * compact-later design q289 exercises.
  */
private[graft] object ArtifactStore {

  /** Collision-resistant scratch key: 16 hex chars of SHA-256 over
    * the NUL-joined parts (round-12 ADVICE — `Tuple.hashCode` is
    * 32 bits and collides across corpus dirs).
    */
  def digest(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(parts.mkString("\u0000").getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }

  private val scratchRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchRoots.forEach { d =>
        try org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(d))
        catch { case _: Throwable => () }
      }))
  }

  private def root(family: String, key: String): java.nio.file.Path = {
    val p = java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), s"graft_${family}_$key")
    scratchRoots.add(p.toString)
    p
  }

  private val gen = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh per-invocation output directory under the family's
    * digest-named root. Never reused, never overwritten — a returned
    * lazy plan over it stays valid until JVM exit.
    */
  def invocationDir(family: String, parts: String*): String =
    root(family, digest(parts: _*))
      .resolve(s"gen_${gen.incrementAndGet()}").toString

  /** Write-once materialization: runs `write(dir)` at most once per
    * (session, family, params digest, fingerprint) and returns the
    * directory; concurrent same-key callers block on the first
    * writer's completion, and the write runs OUTSIDE any map lock
    * (the in-flight-future split the round-12 ADVICE asked for on the
    * memo family). A `None` fingerprint bypasses the memo — the
    * artifact is written to a fresh per-invocation dir and not
    * cached (never memoize under an error-derived key). A failed
    * write removes the reservation so a later call can retry.
    */
  private val matMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String, Long),
    java.util.concurrent.CompletableFuture[String]]()

  def materialized(s: SparkSession, family: String, fp: Option[Long],
                   parts: String*)(write: String => Unit): String =
    fp match {
      case None =>
        val d = invocationDir(family, parts: _*)
        write(d)
        d
      case Some(f) =>
        val key = (MemoKey.session(s), family, digest(parts: _*), f)
        val fut = new java.util.concurrent.CompletableFuture[String]()
        val prev = matMemo.putIfAbsent(key, fut)
        if (prev != null) prev.join()
        else {
          try {
            val d = invocationDir(family, (parts :+ f.toString): _*)
            write(d)
            fut.complete(d)
            d
          } catch {
            case t: Throwable =>
              matMemo.remove(key, fut)
              fut.completeExceptionally(t)
              throw t
          }
        }
    }

  /** Test hook: drop all write-once reservations (completed dirs stay
    * on disk — immutability is the contract — but the next call
    * re-materializes into a fresh generation).
    */
  private[graft] def clearMaterialized(): Unit = matMemo.clear()
}
