package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation-directory + manifest-promotion layout for object stores.
  *
  * [[IngestJob.compact]]'s staged-swap protocol promotes the rewrite
  * with two directory `rename`s — atomic and O(1) on HDFS/POSIX, but
  * on S3-semantics stores a directory rename is a non-atomic
  * per-object copy+delete that is O(data) and can be observed
  * half-done. This layout never renames: each compaction writes a
  * fresh immutable GENERATION directory and then promotes it with ONE
  * single-object manifest write — an atomic PUT on S3 (an object is
  * visible in full or not at all, and S3 listings are strongly
  * consistent since 2020), an atomic create on HDFS. The Iceberg/
  * Delta commit shape, reduced to the single-writer maintenance case:
  *
  * {{{
  * root/
  *   gens/gen-00000017/   exp_date=... /part-*.parquet   (immutable)
  *   manifests/m-00000017  (content: "gen-00000017")
  * }}}
  *
  * The live snapshot is the highest-numbered manifest's generation.
  * Crash windows:
  *  - during the gen-dir write: no manifest names it — readers never
  *    see it; the orphan is GC'd by the next [[IngestJob
  *    .compactManifested]] (which also picks a HIGHER gen number, so
  *    the half-written dir is never reused);
  *  - after the manifest PUT, before GC: both generations exist,
  *    readers already resolve the new one; GC of the old is
  *    idempotent and runs on every subsequent compact.
  * Readers hold no locks: a snapshot dir is immutable once named by a
  * manifest, so a query planned against gen N is unaffected by a
  * concurrent promotion of N+1 (GC keeps one retired generation for
  * exactly this reason — in-flight readers of N finish against intact
  * files; delete-on-read stores should raise `keepGenerations`).
  */
object ManifestStore {
  private val GenPrefix = "gen-"
  private val ManPrefix = "m-"

  private def gensDir(root: Path) = new Path(root, "gens")
  private def mansDir(root: Path) = new Path(root, "manifests")

  private def num(name: String, prefix: String): Option[Long] =
    if (name.startsWith(prefix)) name.stripPrefix(prefix).toLongOption
    else None

  private def listNums(fs: FileSystem, dir: Path, prefix: String): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => num(s.getPath.getName, prefix))

  /** The live generation number, if any manifest exists. */
  def currentGen(fs: FileSystem, root: Path): Option[Long] =
    listNums(fs, mansDir(root), ManPrefix).maxOption

  /** The live snapshot directory, resolved through the newest
    * manifest. Readers use this; never list `gens/` directly (an
    * unreferenced gen dir may be a half-written orphan). */
  def currentDataPath(fs: FileSystem, root: Path): Option[Path] =
    currentGen(fs, root).map(g => new Path(gensDir(root), f"$GenPrefix$g%08d"))

  /** Next generation number: past every manifest AND every gen dir —
    * a crashed writer's orphan dir must never be appended into. */
  def nextGen(fs: FileSystem, root: Path): Long = {
    val used = listNums(fs, gensDir(root), GenPrefix) ++
      listNums(fs, mansDir(root), ManPrefix)
    used.maxOption.getOrElse(0L) + 1L
  }

  /** The directory a writer should fill for generation `gen` (not yet
    * visible to readers — no manifest names it until [[promote]]). */
  def stagingPath(root: Path, gen: Long): Path =
    new Path(gensDir(root), f"$GenPrefix$gen%08d")

  /** Atomically promote a fully-written generation: one single-object
    * write. After this returns, readers resolve `gen`. */
  def promote(fs: FileSystem, root: Path, gen: Long): Unit = {
    fs.mkdirs(mansDir(root))
    val m = new Path(mansDir(root), f"$ManPrefix$gen%08d")
    val out = fs.create(m, true)
    try out.write(f"$GenPrefix$gen%08d\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Garbage-collect: drop orphan gen dirs (never promoted — crashed
    * writers) and retired generations beyond `keepGenerations`, plus
    * their manifests. Idempotent; safe after any crash because a gen
    * dir is only deleted when a NEWER promoted manifest exists. */
  def gc(fs: FileSystem, root: Path, keepGenerations: Int = 1): Unit = {
    val mans = listNums(fs, mansDir(root), ManPrefix).sorted
    if (mans.isEmpty) return // nothing promoted yet: nothing is retired
    // the newest keepGenerations+1 PROMOTED generations survive; every
    // other gen dir is either retired or an orphan (a crashed writer's
    // never-promoted staging dir — this is a single-writer maintenance
    // protocol, so an unreferenced dir cannot belong to a live writer)
    val keep = mans.takeRight(keepGenerations + 1).toSet
    for (g <- listNums(fs, gensDir(root), GenPrefix) if !keep.contains(g))
      fs.delete(new Path(gensDir(root), f"$GenPrefix$g%08d"), true)
    for (m <- mans if !keep.contains(m))
      fs.delete(new Path(mansDir(root), f"$ManPrefix$m%08d"), false)
  }
}
