package graft.core

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{coalesce, lit, sum}

/** Block-manager hygiene for long-lived sessions.
  *
  * The dedup/ANN plans materialize hot intermediate frames with
  * `localCheckpoint(true)` (hashed shingle sets, normalized embedding
  * frames, CC label frames). Those blocks are pinned in the executor
  * block manager for the LIFETIME OF THE SESSION unless explicitly
  * unpersisted — one query leaves its blocks behind, and a session
  * that runs many queries (a benchmark suite, a serving process)
  * accumulates gigabytes of dead blocks that evict/spill the live
  * query's working set. Measured: the round-6 scaling suite ran every
  * SF in one session with zero cleanup and the sf10 tail queries
  * failed on block-manager pressure while succeeding standalone.
  *
  * [[releaseAll]] is the corrective: call it BETWEEN units of work,
  * after the previous unit's results are fully consumed. It unpersists
  * every tracked persistent RDD — including localCheckpointed ones,
  * whose lineage is truncated, so any still-unconsumed DataFrame built
  * on them becomes unusable. Safe at a query boundary; wrong in the
  * middle of one.
  */
object Caching {

  private val ObsId = new java.util.concurrent.atomic.AtomicLong(0)

  /** Eager localCheckpoint with the row count OBSERVED on the
    * checkpoint job itself — the incremental folds' dominant shape is
    * `X.localCheckpoint(true)` immediately followed by `X.count()` (a
    * broadcast-budget bound), which pays a second driver barrier per
    * step just to read a number the materialization already knows.
    * Observed metrics are delivered on checkpoint actions (verified
    * for both localCheckpoint and durable checkpoint), so this fuses
    * the two jobs into one. Names draw from a global counter — safe
    * under concurrent chain futures. */
  def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
    val obs = Observation(s"ckpt-n-${ObsId.incrementAndGet()}")
    val out = df
      .observe(obs, coalesce(sum(lit(1L)), lit(0L)).as("n"))
      .localCheckpoint(true)
    (out, obs.get("n").asInstanceOf[Long])
  }

  /** Unpersist every persistent / localCheckpointed RDD in the
    * context (non-blocking). Returns the number of RDDs released. */
  def releaseAll(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
    rdds.size
  }

  /** Ids of the currently tracked persistent RDDs — snapshot around a
    * scoped computation, then [[releaseBetween]] to drop exactly the
    * blocks it pinned. `Dataset.unpersist` cannot do this for
    * localCheckpointed frames (they live in the RDD tracker, not the
    * plan-level cache manager), and [[releaseAll]] mid-query would
    * truncate frames the caller still needs. */
  def snapshot(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Unpersist the persistent RDDs created between two [[snapshot]]s
    * (non-blocking); anything outside the window is left pinned. */
  def releaseBetween(spark: SparkSession, before: Set[Int],
      after: Set[Int]): Int = {
    val dead = after -- before
    val rdds = spark.sparkContext.getPersistentRDDs
    dead.foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    dead.size
  }
}
