package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned index roots — serve-under-maintenance for the persisted
  * serving stores ([[AnnIndex]], [[Bm25Index]], [[Retrieval]]). The
  * r9-flagged gap: in-place `compact` rewrites `postings`/codes under
  * a serving path, so a query racing the rewrite can read torn state,
  * and a drift-triggered retrain had no way to re-encode WITHOUT a
  * serving outage. A versioned root closes both:
  *
  * {{{
  *   root/v1/…        ← a complete, IMMUTABLE index directory
  *   root/v2/…        ← written whole by compact/retrain, then published
  *   root/_ptr/p000000001_v1   ← empty marker files; highest sequence
  *   root/_ptr/p000000002_v2   ←   names the CURRENT version
  * }}}
  *
  * Why marker FILES instead of a pointer file: publish = create ONE
  * new empty file, atomic on every Hadoop filesystem (local, HDFS,
  * object stores) with no rename-overwrite semantics and no torn
  * content — the version lives in the NAME. A reader either sees the
  * new marker (→ serves vN+1) or not (→ serves vN); there is no
  * intermediate state. Destructive maintenance never touches a
  * published version: it WRITES v(N+1) complete, THEN publishes, so a
  * serve that already resolved vN finishes against intact files and
  * the swap is a metadata flip, not a data rewrite.
  *
  * Version directories are immutable BY CONTRACT once published, with
  * one deliberate exception: additive `append`/tombstone-`delete`
  * writes, which only add files and keep every existing file valid
  * (the same append-while-serve contract the unversioned layouts
  * already carry). Rewrite-shaped maintenance (compact, retrain) must
  * go through a new version.
  *
  * [[prune]] garbage-collects old versions; `keep` must cover the
  * longest in-flight serve (a serve holds no lock — the pointer
  * resolution IS its snapshot).
  */
object VersionedIndex {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private val VersionDir = "^v(\\d+)$".r
  private val Marker = "^p(\\d{9})_v(\\d+)$".r

  def versionPath(root: String, v: Int): String = s"$root/v$v"

  /** Every version directory present (published or not), ascending. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val rp = new Path(root)
    if (!f.exists(rp)) Seq.empty
    else f.listStatus(rp).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionDir(n) => Some(n.toInt)
        case _ => None
      }).sorted
  }

  /** Markers in the pointer dir as (sequence, version), ascending. */
  private def markers(spark: SparkSession, root: String)
      : Seq[(Long, Int)] = {
    val f = fs(spark, root)
    val pp = new Path(s"$root/_ptr")
    if (!f.exists(pp)) Seq.empty
    else f.listStatus(pp).toSeq
      .flatMap(s => s.getPath.getName match {
        case Marker(seq, v) => Some((seq.toLong, v.toInt))
        case _ => None
      }).sortBy(_._1)
  }

  /** The published version, if any: the highest-sequence marker. */
  def current(spark: SparkSession, root: String): Option[Int] =
    markers(spark, root).lastOption.map(_._2)

  /** Every version ever published, ascending (manifest-aware callers
    * like [[graft.io.VersionedTable.prune]] need the full set, not
    * just the current pointer).
    */
  def published(spark: SparkSession, root: String): Seq[Int] =
    markers(spark, root).map(_._2).distinct.sorted

  /** The CURRENT version's directory — resolve this ONCE per query
    * batch and serve from the returned (immutable) path.
    */
  def currentPath(spark: SparkSession, root: String): String = {
    val v = current(spark, root).getOrElse(
      throw new IllegalStateException(
        s"$root has no published version — write one and publish it " +
          "(writeVersioned / buildIndexVersioned)"))
    versionPath(root, v)
  }

  /** The next free version number: above every existing directory
    * (published or not — a crashed, unpublished write keeps its dir
    * and is simply skipped) and every version ever published.
    */
  def next(spark: SparkSession, root: String): Int = {
    val dirs = versions(spark, root)
    val pointed = markers(spark, root).map(_._2)
    ((dirs ++ pointed) :+ 0).max + 1
  }

  /** Atomically make `v` the current version: one empty marker-file
    * creation. Requires the version directory to exist — publishing
    * before the data lands would serve a hole.
    */
  def publish(spark: SparkSession, root: String, v: Int): Unit = {
    val f = fs(spark, root)
    require(f.exists(new Path(versionPath(root, v))),
      s"cannot publish v$v: ${versionPath(root, v)} does not exist")
    val seq = markers(spark, root).lastOption.map(_._1).getOrElse(0L) + 1
    val marker = new Path(f"$root%s/_ptr/p$seq%09d_v$v%d")
    f.mkdirs(marker.getParent)
    require(f.createNewFile(marker), s"publish collision at $marker")
  }

  /** Delete the version directories of all but the newest `keep`
    * PUBLISHED versions (never the current one). `keep` counts
    * published versions only — an unpublished partial directory (a
    * crashed or still-in-flight write) must neither consume a keep
    * slot (it would push a superseded version an in-flight serve may
    * still be reading out of the window) nor be deleted (a concurrent
    * maintenance job may be mid-write; it publishes or stays garbage
    * for a later explicit cleanup). `keep` bounds how long an
    * in-flight serve may keep reading a superseded version.
    */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, "keep must be >= 1")
    val f = fs(spark, root)
    val published = markers(spark, root).map(_._2).distinct.sorted
    val protect = published.takeRight(keep).toSet ++
      current(spark, root)
    versions(spark, root)
      .filter(published.contains)
      .filterNot(protect)
      .foreach(v => f.delete(new Path(versionPath(root, v)), true))
  }
}
