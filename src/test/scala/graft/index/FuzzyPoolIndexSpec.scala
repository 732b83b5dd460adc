package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.{Dedup, TrainingCorpus}

/** Incremental fuzzy assembly ([[FuzzyPoolIndex]] +
  * [[TrainingCorpus.incrementalFuzzyPool]]): the delta path must equal
  * the full fuzzy recompute bit-for-bit — including exact-dup
  * RETRACTION re-keying a near-dup cluster (the maintenance case the
  * persisted edge graph exists for). The end-to-end value equality vs
  * DuckDB is the driver's p04 gate (p03's oracle verbatim). */
class FuzzyPoolIndexSpec extends SparkSpec {

  private def docsAt(dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

  private def poolSet(df: DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("incremental fuzzy pool equals the full fuzzy recompute (single batch)") {
    val docs = docsAt(Sf0001)
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val isDelta = col("doc_id") % 3 === 0
    val path = tmpDir("graft-fuzzyidx")
    FuzzyPoolIndex.build(train.filter(!isDelta), bench, path)
    assert(FuzzyPoolIndex.ready(spark, path))
    val inc = poolSet(
      TrainingCorpus.incrementalFuzzyPool(train.filter(isDelta), path))
    val full = poolSet(TrainingCorpus.fuzzyCleanPool(train, bench))
    assert(inc === full)
  }

  test("two ingested batches advance the state to the full recompute") {
    val docs = docsAt(Sf0001)
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val corpus = train.filter(col("doc_id") % 3 =!= 0)
    val b1 = train.filter(col("doc_id") % 6 === 0)
    val b2 = train.filter(col("doc_id") % 6 === 3)
    val path = tmpDir("graft-fuzzyidx2")
    FuzzyPoolIndex.build(corpus, bench, path)
    FuzzyPoolIndex.ingest(b1, path)
    assert(FuzzyPoolIndex.ready(spark, path))
    val inc = poolSet(TrainingCorpus.incrementalFuzzyPool(b2, path))
    val full = poolSet(TrainingCorpus.fuzzyCleanPool(train, bench))
    assert(inc === full)
  }

  test("compaction clears tombstones and preserves the next batch's decisions") {
    val docs = docsAt(Sf0001)
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val corpus = train.filter(col("doc_id") % 3 =!= 0)
    val b1 = train.filter(col("doc_id") % 6 === 0)
    val b2 = train.filter(col("doc_id") % 6 === 3)
    val path = tmpDir("graft-fuzzyidx4")
    FuzzyPoolIndex.build(corpus, path = path, benchmarkDocs = bench)
    FuzzyPoolIndex.ingest(b1, path)
    // compact with the full ingested-so-far corpus: tombstones clear,
    // and the NEXT batch computes the same pool as the uncompacted path
    FuzzyPoolIndex.compact(corpus.unionByName(b1), path)
    assert(FuzzyPoolIndex.ready(spark, path))
    assert(FuzzyPoolIndex.retired(spark, path).count() === 0)
    val inc = poolSet(TrainingCorpus.incrementalFuzzyPool(b2, path))
    val full = poolSet(TrainingCorpus.fuzzyCleanPool(train, bench))
    assert(inc === full)
  }

  test("a smaller-id delta duplicate retracts a fuzzy-cluster keeper and re-keys its cluster") {
    val docs = docsAt(Sf0001)
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    // a near-dup cluster with ≥2 gated members: keeper = min member
    val kept = TrainingCorpus.gatedKeepers(train)
    val keptText = train.join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val clusters = Dedup.clustersFromPairs(
        Dedup.minhashLsh(keptText).select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = clusters.groupBy(_._2).filter(_._2.length >= 2)
    assert(byCluster.nonEmpty, "testdata must plant a multi-member near-dup cluster")
    val (keeper, members) = byCluster.head
    val kRow = train.filter(col("doc_id") === keeper).collect().head
    import spark.implicits._
    // an exact text duplicate with a SMALLER id: the full recompute's
    // fp window retracts the keeper; the twin inherits its pair graph
    // (identical text ⇒ identical shingles) and, being the new
    // component min, takes the cluster over
    val delta = Seq((-5L, kRow.getString(1), kRow.getString(2)))
      .toDF("doc_id", "source", "text")
    val path = tmpDir("graft-fuzzyidx3")
    FuzzyPoolIndex.build(train, bench, path)
    val inc = poolSet(TrainingCorpus.incrementalFuzzyPool(delta, path))
    val full = poolSet(
      TrainingCorpus.fuzzyCleanPool(train.unionByName(delta), bench))
    assert(inc === full)
    // the retracted keeper is gone; its co-members stay dropped; the
    // twin is kept exactly when the full recompute keeps it
    assert(!inc.exists(_._1 == keeper))
    members.map(_._1).filter(_ != keeper)
      .foreach(m => assert(!inc.exists(_._1 == m)))
    assert(inc.exists(_._1 == -5L) === full.exists(_._1 == -5L))
  }
}
