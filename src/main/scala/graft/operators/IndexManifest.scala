package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Atomic generation switching for the persisted-index families
  * (span index q285–q295, IVF postings q296–q301): the piece their
  * scaladocs hand-waved as "readers switch generations atomically by
  * path", made a real commit protocol.
  *
  * A manifest COMMIT writes ONE single-file parquet directory
  * `<root>/m_<id>` listing, in order, the generation dirs that are
  * live after the commit. RESOLVE lists the committed manifests and
  * reads the highest id. Readers therefore always see a COMPLETE
  * generation set — never a refresh's delta without its base, never a
  * half-retired pre-compaction layout — because the only mutation a
  * reader can observe is the appearance of a whole new manifest file:
  * Spark's parquet committer writes the `_SUCCESS` marker last, and
  * resolve ignores manifest dirs without it, so a crashed commit is
  * invisible (the standard object-store commit protocol; at 100 TB
  * the same shape is an Iceberg/Delta metadata-pointer swap, with the
  * id allocated by an atomic catalog CAS instead of a listing).
  *
  * Manifests are index metadata — a handful of path strings — so the
  * resolve collect is bounded by the live generation count, never
  * data-sized.
  */
object IndexManifest {

  /** Committed manifest ids under `root` (dirs named m_<id> whose
    * `_SUCCESS` marker exists). */
  private def committed(s: SparkSession, root: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("m_"))
      .flatMap { st =>
        val ok = fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS"))
        if (ok) st.getPath.getName.stripPrefix("m_").toLongOption
          .map(_ -> st.getPath)
        else None
      }
  }

  /** Every allocated manifest id under `root` — committed or not. Id
    * allocation must skip CRASHED commits too (a half-written m_<id>
    * dir without its marker): allocating from max(committed) would
    * make the next ErrorIfExists write collide with the orphan
    * forever, bricking the root — the opposite of the
    * crash-invisibility the protocol promises. Readers still see only
    * committed ids; orphans merely burn their number. */
  private def allocated(s: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("m_"))
      .flatMap(_.getPath.getName.stripPrefix("m_").toLongOption)
  }

  /** Commit a new live generation set: the next manifest id is
    * max(allocated) + 1, and the write is ErrorIfExists so two racing
    * writers cannot silently clobber one id (one of them fails loudly
    * — the single-JVM stand-in for the catalog CAS). The `_SUCCESS`
    * marker is verified after the write: resolve's visibility
    * contract depends on it, and a session configured with
    * success-markers disabled would otherwise commit silently while
    * every resolve fails. */
  def commit(s: SparkSession, root: String,
             generations: Seq[String]): Unit = {
    import s.implicits._
    val id = (allocated(s, root) :+ 0L).max + 1
    val dir = s"$root/m_$id"
    generations.zipWithIndex.map { case (g, i) => (i, g) }
      .toDF("pos", "gen")
      .coalesce(1).sortWithinPartitions(col("pos"))
      .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
      .parquet(dir)
    val marker = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    require(marker.getFileSystem(s.sessionState.newHadoopConf())
        .exists(marker),
      s"commit wrote $dir but its _SUCCESS marker is missing — " +
        "success markers must be enabled for the manifest protocol")
  }

  /** The generation dirs of the LATEST committed manifest, in commit
    * order. Loud error when nothing is committed — an index with no
    * manifest is a broken deployment, not an empty relation. */
  def resolve(s: SparkSession, root: String): Seq[String] = {
    val c = committed(s, root)
    require(c.nonEmpty, s"no committed manifest under $root")
    readManifest(s, c.maxBy(_._1)._2.toString)
      .orderBy(col("pos")).collect().map(_.getString(1)).toSeq
  }

  /** Explicit-schema manifest reader (test hook + resolve). */
  private[graft] def readManifest(s: SparkSession, dir: String): DataFrame =
    s.read.schema("pos INT, gen STRING").parquet(dir)
}
