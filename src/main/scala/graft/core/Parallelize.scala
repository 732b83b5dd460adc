package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out for per-row-heavy map stages.
  *
  * The driver's test tables are single-row-group parquet files, so a
  * scan feeding an expensive partition-local stage (codec
  * synthesis/decode, fused signature kernels, shingle hashing) plans as
  * ONE task and serializes the dominant map work of the whole query on
  * one core while the rest idle — measured at sf0.1: imageSigFrame
  * 1.07 s, videoSigFrame 1.91 s, audioSigFrame 0.65 s, simhashSigFrame
  * 0.38 s, all on 1 of 32 slots (PartitionProbe). The optimization
  * guide's input-skew rule (§2.5 "one huge unsplittable file …
  * repartition immediately after the read") applied to the small end.
  *
  * [[spread]] hash-repartitions the frame to the session's
  * defaultParallelism BEFORE the heavy stage — but only when the frame
  * currently plans to fewer partitions, so at production scale (many
  * files / splits ≥ slots) it is a no-op and no exchange is added. The
  * gate also keeps the helper core-count-adaptive: the same binary
  * measured at SPARK_GRAFT_CPUS=8 spreads to 8, not a constant.
  * Hash partitioning on the given key is deterministic under retries
  * (guide §2.5: never round-robin over rand-derived keys), and every
  * caller's downstream is partitioning-insensitive (aggregations,
  * windows and joins re-shuffle by their own keys; final orderBys pin
  * result order).
  *
  * What it deliberately does NOT touch: decision-join corpus sides
  * (d10/d12/m05's anti-joins keep their corpus streams un-shuffled —
  * the 100 TB invariant), and relational scans whose plan pins
  * (pushdown, 1-partition point lookups) the spec suite asserts.
  */
object Parallelize {

  /** `df` hash-repartitioned on `key` to the session's task-slot count,
    * iff it currently plans to fewer partitions (else `df` unchanged).
    *
    * The partition-count probe (`df.rdd.getNumPartitions`) is only safe
    * on exchange-free scan slices: under AQE, `.rdd` on a frame whose
    * plan contains exchanges/joins MATERIALIZES the upstream query
    * stages as real Spark jobs at plan-construction time, and that work
    * is discarded rather than reused by the later execution (measured:
    * the p03 text chain re-ran its semi-join once per spread probe). A
    * frame that already passed a wide operator has had its parallelism
    * established there — a shuffle plans to spark.sql.shuffle.partitions
    * and a broadcast join preserves its (already-spread) big side's
    * partitioning — so such frames return unchanged without probing. */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (p <= 1) return df
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Window | _: Distinct |
           _: RepartitionOperation | _: Sort => true
      case _ => false
    }
    if (wide || df.rdd.getNumPartitions >= p) df
    else df.repartition(p, key)
  }
}
