package graft.streaming

import java.io.IOException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The committed-generation log shared by the text-index maintenance
  * ([[IndexMaintenance]]) and the IVF-PQ code-table maintenance
  * ([[graft.llm.IvfPqIndex]]): `gen=<batchId>` delta dirs and
  * `cgen=<throughId>` compaction dirs, each made visible by a
  * `_COMMITTED` marker written LAST. Exactly-once without a
  * transaction log — an unmarked dir is invisible garbage, a marked
  * dir is immutable, and readers base on the latest committed cgen
  * plus the generations beyond it.
  *
  * All I/O goes through Hadoop's [[FileSystem]] resolved from the root
  * path (never java.io.File): the contract holds on local disk, HDFS,
  * and object stores with atomic single-object PUTs and strongly
  * consistent listings. Nothing here renames.
  */
private[graft] object GenerationLog {

  def genDir(root: String, id: Long): String = f"$root/gen=$id%020d"
  def cgenDir(root: String, id: Long): String = f"$root/cgen=$id%020d"

  /** The protocol's filesystem, resolved from the root's scheme with
    * the active session's Hadoop conf (credentials, endpoints) when
    * one exists. */
  def fsOf(root: String): FileSystem =
    new Path(root).getFileSystem(
      SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration()))

  def marker(dir: String): Path = new Path(dir, "_COMMITTED")

  /** Write the commit marker, or raise. An `assert` here would be
    * elidable under -Xdisable-assertions — silently voiding the
    * exactly-once contract — so the failure is an explicit
    * IOException. */
  def commitMarker(fs: FileSystem, dir: String): Unit =
    if (!fs.createNewFile(marker(dir)) && !fs.exists(marker(dir)))
      throw new IOException(s"commit-marker write failed: ${marker(dir)}")

  private def listIds(root: String, prefix: String): Seq[Long] = {
    // ONE round trip: glob the markers directly instead of listing the
    // root and probing exists(_COMMITTED) per candidate dir — the
    // listing runs several times per micro-batch (covered check,
    // compaction trigger, state resolution), and with deferred GC the
    // superseded dirs accumulate between maintenance windows, so the
    // per-dir probe is O(generations) sequential RPCs on an object
    // store. globStatus returns null (not empty) for no matches.
    val fs = fsOf(root)
    Option(fs.globStatus(new Path(root, s"$prefix*/_COMMITTED")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.getParent.getName)
      .flatMap(_.stripPrefix(prefix).toLongOption)
      .sorted
  }

  /** Committed generation ids, ascending (compacted-away gens are
    * deleted by GC and drop out naturally). */
  def committedGens(root: String): Seq[Long] = listIds(root, "gen=")

  /** Committed compaction ids (each holds the FULL state through that
    * batchId), ascending. */
  def committedCgens(root: String): Seq[Long] = listIds(root, "cgen=")

  /** The current state's constituent dirs: (dirs to union, the newest
    * dir — whose superseding artifacts, e.g. the vocab df table, are
    * authoritative). Base = the latest committed compaction, if any;
    * plus every generation beyond it. */
  def stateDirs(root: String): Option[(Seq[String], String)] =
    stateDirsAt(root, Long.MaxValue)

  /** [[stateDirs]] PINNED to coverage point `throughId`: base = the
    * newest committed cgen ≤ throughId, plus committed generations in
    * (cgen, throughId]. The as-of view — valid as long as retention
    * keeps the pinned dirs (the deferred-GC default; a later
    * gcSuperseded pass may collect dirs an even-later compaction
    * superseded). */
  def stateDirsAt(root: String,
      throughId: Long): Option[(Seq[String], String)] = {
    val cg = committedCgens(root).filter(_ <= throughId)
    val base = cg.lastOption.map(cgenDir(root, _)).toSeq
    val tail = committedGens(root)
      .filter(g => cg.lastOption.forall(g > _))
      .filter(_ <= throughId)
      .map(genDir(root, _))
    val all = base ++ tail
    if (all.isEmpty) None else Some((all, all.last))
  }

  /** How many committed dirs a serving read unions — the number a
    * compaction resets to 1. */
  def readAmplification(root: String): Int =
    stateDirs(root).map(_._1.size).getOrElse(0)

  /** True when `batchId` is already covered — its own marker stands,
    * or a later compaction folded (and possibly GC'd) it. */
  def covered(root: String, batchId: Long): Boolean =
    fsOf(root).exists(marker(genDir(root, batchId))) ||
      committedCgens(root).lastOption.exists(_ >= batchId)

  /** GC everything the committed `cgen=<throughId>` supersedes: older
    * cgens and ALL generations ≤ throughId — including generations an
    * earlier interrupted GC left behind. Correctness never depends on
    * these deletes landing (readers base on the latest cgen), so a
    * crash anywhere in here just leaves garbage for the next call. */
  def gcThrough(root: String, throughId: Long): Unit = {
    val fs = fsOf(root)
    val garbage =
      committedCgens(root).filter(_ < throughId).map(cgenDir(root, _)) ++
        committedGens(root).filter(_ <= throughId).map(genDir(root, _)) ++
        // unmarked dirs at ids the committed cgen=throughId covers: a
        // compaction (or merge) that crashed between its data writes
        // and its marker, then was retried under a HIGHER id — the
        // orphan is invisible by construction (no marker, id covered),
        // so deleting it is safe, and nothing else ever would
        unmarkedDirsThrough(root, throughId)
    garbage.foreach(d => fs.delete(new Path(d), true))
  }

  /** gen=/cgen= dirs with NO `_COMMITTED` marker whose id ≤ throughId.
    * Uncommitted dirs ABOVE throughId are in-flight writers — never
    * touched. */
  private def unmarkedDirsThrough(root: String,
      throughId: Long): Seq[String] = {
    val fs = fsOf(root)
    val dirs = Option(fs.globStatus(new Path(root, "*gen=*")))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath)
      .filter(p => p.getName.startsWith("gen=") ||
        p.getName.startsWith("cgen="))
    dirs.filter { p =>
      val id = p.getName.dropWhile(_ != '=').drop(1).toLongOption
      id.exists(_ <= throughId) && !fs.exists(marker(p.toString))
    }.map(_.toString)
  }

  /** Collect everything the LATEST committed compaction supersedes —
    * the deferred-GC half of a `gcSuperseded = false` compaction. Run
    * after serving readers have re-resolved past the compaction. */
  def gcSuperseded(root: String): Unit =
    committedCgens(root).lastOption.foreach(gcThrough(root, _))

  /** The compaction skeleton: pick the fold target strictly beyond any
    * committed cgen, let `write` fill it, then commit. Returns the
    * folded-through id, or None when there was nothing to fold (in
    * which case, with `gc = true`, an earlier compaction's interrupted
    * GC is finished instead). */
  def compactWith(root: String, gc: Boolean)
      (write: (Seq[String], String) => Unit): Option[Long] = {
    val latestCg = committedCgens(root).lastOption
    val tailGens = committedGens(root).filter(g => latestCg.forall(g > _))
    if (tailGens.isEmpty) {
      if (gc) latestCg.foreach(gcThrough(root, _))
      return None
    }
    if (latestCg.isEmpty && tailGens.length == 1) return None // one dir
    val throughId = tailGens.max
    val dir = cgenDir(root, throughId)
    val (dirs, _) = stateDirs(root).get
    write(dirs, dir)
    commitMarker(fsOf(root), dir)
    if (gc) gcThrough(root, throughId)
    Some(throughId)
  }
}
