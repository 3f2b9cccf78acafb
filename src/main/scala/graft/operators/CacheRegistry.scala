package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.util.control.NonFatal

/** Tracked multi-consumer materialization — THE cache-lifecycle policy
  * for every operator that computes an expensive table read by two or
  * more downstream consumers (Dedup's shingle/token tables,
  * StreamExtract's per-batch committed-corpus projections).
  *
  * Policy (recoverability contract): `persist(MEMORY_AND_DISK)` + one
  * eager count(), NEVER localCheckpoint. Checkpoint blocks lost with a
  * dead executor kill the job (no lineage to rebuild from), while a
  * persisted partition recomputes from its — deliberately shallow —
  * lineage; at 10^9 docs with executor churn that difference is the
  * job surviving the night. The eager count matters too: persist alone
  * is LAZY, so two sibling consumers of a cold cache would each
  * compute the kernel.
  *
  * Persisted tables are tracked per-instance; the owner calls
  * `releaseAll()` after the consuming action completes (results
  * already computed or themselves persisted — a still-lazy downstream
  * plan would recompute its inputs from lineage, correct but slow).
  * Scope an instance to one unit of work: a micro-batch, a bench
  * query, a notebook cell. A process-global instance shared by
  * concurrent jobs would let one job's cleanup unpersist another's
  * in-flight tables — exactly the double-compute the eager persist
  * exists to prevent.
  */
final class CacheRegistry {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist + eagerly materialize `df`, tracking it for release. The
    * table is tracked BEFORE the eager count: persist() registers the
    * plan with the session's CacheManager immediately, so a count that
    * throws (per-query failures are designed outcomes in Verify/Bench)
    * must still leave the table releasable — tracked-after-count would
    * leak a persisted-but-untracked table into the shared session for
    * every query that follows.
    */
  def materialize(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    synchronized { tracked += p }
    p.count()
    p
  }

  /** Track an ALREADY-persisted (and already-materialized) table for
    * release, without re-persisting — for operators that persist
    * incrementally inside a loop and register only the survivor.
    */
  def track(df: DataFrame): Unit = synchronized { tracked += df }

  /** Unpersist every tracked table and forget it. Safe to call twice;
    * unpersist failures (session already stopped) are swallowed —
    * cleanup must never mask the job's own result.
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(df =>
      try df.unpersist()
      catch { case NonFatal(_) => () })
    tracked.clear()
  }
}
