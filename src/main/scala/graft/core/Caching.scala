package graft.core

import org.apache.spark.sql.SparkSession

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

  /** Unpersist every persistent / localCheckpointed RDD in the
    * context (non-blocking). Returns the number of RDDs released. */
  def releaseAll(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
    rdds.size
  }
}
