package graft.llm

import org.apache.spark.sql.DataFrame

/** Lifetime registry for intermediate persisted frames.
  *
  * Several operators persist a corpus-scale intermediate (MinHash
  * signatures, the LM bigram-pair frame, exploded shingle frames)
  * because more than one downstream branch of the SAME returned plan
  * reads it — without the persist the dominant kernel cost re-runs per
  * branch. But the functions return LAZY frames, so they cannot
  * unpersist internally: the blocks must outlive the call and die only
  * after the caller's action materializes the result. A long-running
  * driver that never frees them leaks one cached frame per invocation.
  *
  * The contract (the cleanup-hook pattern the eager CC loop applies to
  * its checkpoints, TextDedup.freeCheckpoint): a caller that owns the
  * materialization passes a TempCache, runs its action(s), then calls
  * [[release]]. One-shot jobs (Verify/Bench — one JVM per run) keep
  * the default [[TempCache.noop]], which registers nothing, exactly
  * the pre-existing fire-and-forget behavior.
  */
class TempCache {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Record a persisted frame for later release; returns it unchanged. */
  def register(df: DataFrame): DataFrame = synchronized { frames += df; df }

  /** Unpersist every registered frame. Non-blocking by default: the
    * executors drop blocks asynchronously while the driver moves on. */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(_.unpersist(blocking))
    frames.clear()
  }

  def size: Int = synchronized(frames.size)
}

object TempCache {
  /** The fire-and-forget default: frames stay cached for the session
    * (correct for one-shot JVMs; long-running drivers should pass a
    * real TempCache and release it). Holds no references, so it also
    * never pins plan objects. */
  val noop: TempCache = new TempCache {
    override def register(df: DataFrame): DataFrame = df
    override def release(blocking: Boolean): Unit = ()
  }
}
