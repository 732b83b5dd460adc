package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Sharded training-data export — the deterministic seeded global
  * shuffle + fixed-shard assignment every large-scale training run
  * needs between "curated corpus" and "data loader" (GPT-3 shuffles
  * and shards its filtered corpus before training, Brown et al.
  * NeurIPS'20 §2.2; the WebDataset/tar-shard convention and TFRecord
  * sharding are the same construction: a reproducible order, split
  * round-robin into N equal shard files).
  *
  * Semantics: each document gets a shuffle key `md5(doc_id ":" seed)`
  * — a reproducible unbiased permutation, the same device the mixture
  * operator uses for its per-source sample order. Documents are
  * ranked globally by (key, doc_id) and dealt round-robin into
  * `nShards` shards: shard = (rank−1) mod N, pos = (rank−1) div N.
  * Round-robin off one global rank (rather than hashing documents to
  * shards) keeps shard sizes equal BY CONSTRUCTION — at most one
  * document apart — which is what a data loader wants (hash sharding
  * leaves ±√(n/N) imbalance, i.e. straggler shards).
  *
  * Scale shape: the global rank is the [[Packing]]/[[Mixture]]
  * two-phase distributed prefix pattern with COUNT instead of SUM —
  * a global `row_number() OVER (ORDER BY k)` would collapse the
  * corpus into one window partition. The bucket id is the first 3 hex
  * chars of the key (4096 buckets, monotone in key order — a pure row
  * function, so every plan subtree agrees on it; see [[Mixture]]'s
  * scaladoc for why a range exchange's `spark_partition_id` is NOT
  * safe here). Per-bucket row_numbers run locally after one slim hash
  * exchange (16 B + 32 B key per row); the ≤4096 bucket counts
  * prefix-sum in one tiny window and broadcast back. Every
  * corpus-sized frame streams.
  */
object Sharding {

  /** Default shard count (a config at scale — 100 TB exports use
    * O(10k) shards; the arithmetic is shard-count-agnostic). */
  val DefaultShards = 16L

  /** Default shuffle seed. Changing the seed yields an independent
    * permutation — the standard between-epochs reshuffle device. */
  val DefaultSeed = "42"

  /** Per-document shard manifest: (shard, pos, doc_id, n_tokens) —
    * document `doc_id` is written at position `pos` (0-based) of shard
    * `shard` under the seeded deterministic shuffle. */
  def shardExport(docs: DataFrame, nShards: Long = DefaultShards,
      seed: String = DefaultSeed): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val slim = docs.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      md5(concat(col("doc_id").cast("string"), lit(":" + seed))).as("k"))
      // pid: deterministic bucket from the key's hex prefix — monotone
      // in k, identical in every plan subtree
      .withColumn("pid", conv(substring(col("k"), 1, 3), 16, 10).cast("int"))
    // local rank within bucket; (k, doc_id) breaks hypothetical md5 ties
    val local = slim.withColumn("lrn",
      row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("k"), col("doc_id"))).cast("long"))
    val pcnts = slim.groupBy(col("pid")).agg(count(lit(1)).as("pcnt"))
    // ≤4096 rows: the only single-partition window is bounded by the
    // bucket constant, not by data
    val poffs = pcnts.withColumn("poff",
      coalesce(sum(col("pcnt")).over(Window.orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    local.join(broadcast(poffs.select(col("pid"), col("poff"))), Seq("pid"))
      .withColumn("grank", col("poff") + col("lrn"))
      .select(
        ((col("grank") - 1L) % nShards).as("shard"),
        expr(s"(grank - 1L) DIV ${nShards}L").as("pos"),
        col("doc_id"), col("n_tokens"))
      .orderBy(col("shard"), col("pos"))
  }

  def shardExport(s: SparkSession, dir: String): DataFrame =
    shardExport(Tables.load(s, dir, "documents"))
}
