package graft.core

import graft.SparkSpec
import graft.operators.Dedup

/** Block-manager hygiene contract: the dedup plans pin intermediates
  * via localCheckpoint(true); releaseAll at a query boundary must
  * actually free them (the round-6 scaling suite leaked these blocks
  * across ~50 queries and its sf10 tail failed on the accumulated
  * pressure), and the NEXT query must rebuild its own state cleanly. */
class CachingSpec extends SparkSpec {

  test("releaseAll frees pinned localCheckpoint blocks; next query rebuilds cleanly") {
    val before = Dedup.minhashLsh(spark, Sf001).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "dedup run should leave localCheckpoint blocks pinned")
    val released = Caching.releaseAll(spark)
    assert(released > 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releaseAll must empty the tracked persistent-RDD registry")
    // a fresh query materializes its own checkpoints and agrees
    assert(Dedup.minhashLsh(spark, Sf001).count() == before)
  }
}
