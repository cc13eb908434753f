package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared memo-key plumbing for the cross-query memos (Graph.lpMemo,
  * TextAnalysis.bpeMemo, Similarity.coresetMemo). Two round-11 ADVICE
  * items live here:
  *
  *  - keys are the session's UUID STRING, not the `SparkSession`
  *    reference — a reference key pins a stopped session (and, for
  *    DataFrame-valued memos, its checkpointed blocks' owner) from GC
  *    until LRU eviction happens to reach it;
  *  - filesystem fingerprints are `Option[Long]` — a listing failure
  *    returns None and the caller BYPASSES the memo (compute without
  *    caching) instead of memoizing under an error-derived key. The
  *    old error-class hash meant two transient failures straddling an
  *    in-place corpus rewrite produced IDENTICAL keys and served
  *    stale results.
  */
private[graft] object MemoKey {

  /** Stable string identity for a session. `sessionUUID` is on the
    * classic implementation, not the `sql-api` abstract class every
    * operator signature uses; any other implementation falls back to
    * applicationId + reference identity (still never pins the
    * session: the key holds no reference).
    */
  def session(s: SparkSession): String =
    try org.apache.spark.sql.graftshim.ColumnBridge.sessionUUID(s)
    catch {
      case _: ClassCastException =>
        s"${s.sparkContext.applicationId}#${System.identityHashCode(s)}"
    }

  /** Parquet-directory fingerprint from filesystem METADATA only
    * (names, lengths, mtimes — no scan): part of every memo key, so
    * an in-place data rewrite within one session misses the memo
    * instead of serving results computed from the old files. None on
    * any listing failure → the caller computes without caching.
    */
  def fingerprint(s: SparkSession, table: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(table)
    try {
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      Some(fs.listStatus(p).map(st =>
        (st.getPath.getName, st.getLen, st.getModificationTime).hashCode.toLong)
        .sorted.foldLeft(17L)((a, h) => a * 31 + h))
    } catch { case _: Throwable => None }
  }
}
