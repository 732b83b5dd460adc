package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** [[MediaHashIndex]] + [[Dedup.incrementalHamming64PairsFrames]]: the
  * decode-once media path must equal the batch hamming path — the
  * StreamingNearDup/d07 batch-equivalence contract for the 64-bit
  * signature family. Signatures are planted directly (the index is
  * codec-agnostic), so the suite controls bucket geometry precisely;
  * the real-decode end of the story is MultimodalSpec's m03b/m04b/m05b
  * tests. */
class MediaHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Planted signature corpus: families of 4 (id/4) whose member k
    * flips bits 1..k of a hash-picked sequence off the family base —
    * consecutive members differ by ≤1 bit, any intra-family pair by
    * ≤3, distinct families by ~32. */
  private def plantedSigs(n: Int): DataFrame =
    (0 until n).map { i =>
      val id = i.toLong
      val fam = id >> 2
      val member = (id & 3).toInt
      var sig = mix(fam)
      (1 to member).foreach { k =>
        sig ^= 1L << ((mix(fam * 7919 + k) & 63).toInt)
      }
      (id, sig)
    }.toDF("media_id", "sig")

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("media_a"), col("media_b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batchPairs(sigs: DataFrame): DataFrame =
    Dedup.hamming64Pairs(
      sigs.withColumnRenamed("media_id", "doc_id"), "sig", 5)
      .withColumnsRenamed(Map("doc_a" -> "media_a", "doc_b" -> "media_b"))

  test("incremental probe equals the batch pair set restricted to the delta") {
    val sigs = plantedSigs(600)
    val isDelta = col("media_id") % 3 === 0
    val path = tmpDir("graft-mediaidx")
    MediaHashIndex.build(sigs.filter(!isDelta), path)
    assert(MediaHashIndex.ready(spark, path))
    val incr = pairSet(Dedup.incrementalHamming64PairsFrames(
      sigs.filter(isDelta),
      MediaHashIndex.buckets(spark, path),
      MediaHashIndex.counts(spark, path), 5))
    val batch = pairSet(batchPairs(sigs)
      .filter(col("media_a") % 3 === 0 || col("media_b") % 3 === 0))
    assert(incr === batch)
    assert(incr.nonEmpty, "planted families must produce delta pairs")
  }

  test("append: a second batch sees the first as corpus; ledger stays exact") {
    val sigs = plantedSigs(600)
    val b0 = sigs.filter(col("media_id") % 3 === 1)
    val b1 = sigs.filter(col("media_id") % 3 === 2)
    val b2 = sigs.filter(col("media_id") % 3 === 0)
    val path = tmpDir("graft-mediaidx-append")
    MediaHashIndex.build(b0, path)
    MediaHashIndex.append(b1, path)
    assert(MediaHashIndex.ready(spark, path))
    // counts ledger after append == ledger recomputed from the
    // persisted buckets (width AND min-with-sig both exact)
    val recomputed = MediaHashIndex.buckets(spark, path)
      .groupBy(col("bk"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("media_id"), col("sig"))).as("mn"))
      .select(col("bk"), col("n"),
        col("mn.media_id").as("min_id"), col("mn.sig").as("min_sig"))
    val a = MediaHashIndex.counts(spark, path).collect()
      .map(_.toSeq).toSet
    assert(a === recomputed.collect().map(_.toSeq).toSet)
    // and the probe over the appended index equals a fresh build's
    val incr = pairSet(Dedup.incrementalHamming64PairsFrames(b2,
      MediaHashIndex.buckets(spark, path),
      MediaHashIndex.counts(spark, path), 5))
    val fresh = tmpDir("graft-mediaidx-fresh")
    MediaHashIndex.build(b0.unionByName(b1), fresh)
    val freshProbe = pairSet(Dedup.incrementalHamming64PairsFrames(b2,
      MediaHashIndex.buckets(spark, fresh),
      MediaHashIndex.counts(spark, fresh), 5))
    assert(incr === freshProbe)
    val batch = pairSet(batchPairs(sigs)
      .filter(col("media_a") % 3 === 0 || col("media_b") % 3 === 0))
    assert(incr === batch)
  }

  test("over-cap bucket: links verify against the ledger's min_sig and preserve connectivity") {
    // 100 identical corpus sigs (over MaxBucket=64 in every block
    // bucket) + 3 identical delta rows: the incremental path may only
    // emit links to the bucket min, and the maintained cluster frame
    // must still equal the full-recompute one (connectivity contract)
    val mega = (1000L until 1100L).map(id => (id, 0x0123456789ABCDEFL))
    val normal = plantedSigs(200).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val corpus = (mega ++ normal).toDF("media_id", "sig")
    val delta = Seq((2000L, 0x0123456789ABCDEFL),
      (2001L, 0x0123456789ABCDEFL), (2002L, 0x0123456789ABCDEFL))
      .toDF("media_id", "sig")
    val path = tmpDir("graft-mediaidx-hot")
    MediaHashIndex.build(corpus, path)
    val incr = Dedup.incrementalHamming64PairsFrames(delta,
      MediaHashIndex.buckets(spark, path),
      MediaHashIndex.counts(spark, path), 5).localCheckpoint(true)
    val got = pairSet(incr)
    // every delta row linked to the mega-bucket min, hamming verified
    assert(Seq(2000L, 2001L, 2002L).forall(d => got.contains((1000L, d, 0L))))
    // maintained clusters == full-recompute clusters over corpus∪delta
    val corpusClusters = Dedup.clustersFromPairs(
      MediaHashIndex.pairsFromIndex(spark, path, 5)
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
    val maintained = Dedup.mergeClusters(corpusClusters,
      incr.select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.clustersFromPairs(
      batchPairs(corpus.unionByName(delta))
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained === full)
    assert(full.exists { case (d, c) => d == 2002L && c == 1000L },
      "mega-cluster must absorb the delta under the corpus min label")
  }

  test("pairsFromIndex equals the batch path over the same corpus") {
    val sigs = plantedSigs(400)
    val path = tmpDir("graft-mediaidx-batch")
    MediaHashIndex.build(sigs, path)
    assert(pairSet(MediaHashIndex.pairsFromIndex(spark, path, 5)) ===
      pairSet(batchPairs(sigs)))
  }

  test("torn-write contract: marker gates readiness; rebuild restores it") {
    val sigs = plantedSigs(100)
    val path = tmpDir("graft-mediaidx-torn")
    MediaHashIndex.build(sigs, path)
    assert(MediaHashIndex.ready(spark, path))
    // simulate a torn write: the marker is the LAST thing a writer
    // creates, so its absence over present frames is the crash state
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_MEDIAIDX_READY"), false)
    assert(!MediaHashIndex.ready(spark, path))
    MediaHashIndex.build(sigs, path) // rebuild over torn state is legal
    assert(MediaHashIndex.ready(spark, path))
    assert(pairSet(MediaHashIndex.pairsFromIndex(spark, path, 5)) ===
      pairSet(batchPairs(sigs)))
  }

  test("remergeCounts: a bucket on both sides of a union becomes ONE summed row") {
    val idx = Seq((100L, 3L, 10L, 0x0FL), (200L, 2L, 40L, 0xF0L))
      .toDF("bk", "n", "min_id", "min_sig")
    val delta = Seq((100L, 2L, 5L, 0x07L), (300L, 1L, 70L, 0xFFL))
      .toDF("bk", "n", "min_id", "min_sig")
    val merged = MediaHashIndex.remergeCounts(idx.unionByName(delta))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(merged.size === 3)
    // widths SUM (the hot threshold must see the combined bucket) and
    // the (id, sig) min is picked atomically — append's merge semantics
    assert(merged(100L) === ((5L, 5L, 0x07L)))
    assert(merged(200L) === ((2L, 40L, 0xF0L)))
    assert(merged(300L) === ((1L, 70L, 0xFFL)))
  }
}
