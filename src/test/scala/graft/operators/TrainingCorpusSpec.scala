package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Composed corpus assembly ([[TrainingCorpus.assemble]]): every stage
  * gate must hold on the final manifest, the packing must be gapless,
  * and the composition must equal running the catalog stages by hand.
  * (The end-to-end value equality vs DuckDB is the driver's p01 gate.) */
class TrainingCorpusSpec extends SparkSpec {

  private lazy val manifest =
    TrainingCorpus.assemble(spark, Sf001).collect()

  test("manifest packing is gapless and in doc_id order") {
    val rows = manifest.map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    var off = 0L
    rows.foreach { case (_, n, start) =>
      assert(start === off); off += n
    }
  }

  test("every kept document passes the dedup, quality, length, and decontamination gates") {
    val docs = Tables.load(spark, Sf001, "documents")
    val keptIds = manifest.map(_.getLong(0)).toSet
    // no benchmark docs, no contaminated docs
    assert(keptIds.forall(_ % 23 != 0))
    val contaminated = TextAnalysis.decontaminate(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
      .collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(contaminated).isEmpty)
    // quality + length gates, via the catalog scoring query
    val q = TextAnalysis.qualityScoring(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val toks = TextAnalysis.textStats(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keptIds.foreach { id =>
      assert(q(id) >= TrainingCorpus.MinQuality)
      assert(toks(id) >= TrainingCorpus.MinTokens && toks(id) <= TrainingCorpus.MaxTokens)
    }
    // exact dedup: kept ids are fingerprint-minimal among the training split
    val fps = docs.filter(col("doc_id") % 23 =!= 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.md5Fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val minByFp = fps.groupBy(_._2).map { case (fp, xs) => fp -> xs.map(_._1).min }
    val fpOf = fps.toMap
    keptIds.foreach(id => assert(minByFp(fpOf(id)) === id))
  }

  test("mixture allocations are respected with overshoot under one document") {
    val bySource = manifest.groupBy(_.getString(1))
    // each source's kept token mass minus its boundary doc stays under
    // its allocation — recompute the allocation from the clean pool
    val docs = Tables.load(spark, Sf001, "documents")
    val keptTokens = bySource.map { case (src, rows) =>
      src -> rows.map(_.getLong(2)).sum
    }
    // allocations from the same integer arithmetic over the clean pool
    // the clean pool is a superset of the manifest; rebuild it the
    // same way assemble does, through the public stages
    val pool = {
      val scored = docs.filter(col("doc_id") % 23 =!= 0)
      val contaminated = TextAnalysis.decontaminate(
        scored, docs.filter(col("doc_id") % 23 === 0))
        .select(col("doc_id"))
      val fpkept = scored
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.md5Fingerprint(col("text")).as("fp"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
        .withColumn("keep_id", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id") &&
          col("quality") >= TrainingCorpus.MinQuality &&
          col("n_tokens").between(TrainingCorpus.MinTokens, TrainingCorpus.MaxTokens))
        .join(contaminated, Seq("doc_id"), "left_anti")
      fpkept.select(col("doc_id"), col("source"), col("n_tokens"))
    }
    val totals = pool.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    val wts = pool.select(col("source")).distinct().collect().map(_.getString(0))
      .map(src => src -> (1L + src.drop(3).toLong % 5L)).toMap
    val wsum = wts.values.sum
    val perSrcAlloc = wts.map { case (src, wt) =>
      src -> (totals * 50L / 100L * wt / wsum)
    }
    val maxDoc = bySource.map { case (src, rows) => src -> rows.map(_.getLong(2)).max }
    keptTokens.foreach { case (src, tot) =>
      assert(tot - maxDoc(src) < perSrcAlloc(src),
        s"$src: kept $tot vs alloc ${perSrcAlloc(src)}")
    }
  }

  test("no corpus-sized single-partition window; shingle explode is survivor-pruned") {
    val df = TrainingCorpus.assemble(spark, Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SPARK_PARTITION_ID"))
    // the decontamination branch joins the survivor id set before the
    // 5-gram explode: a LeftSemi against doc_id must appear in the
    // survivor-pool stage (assemble's eager checkpoint cuts that stage
    // out of the final frame's plan, so pin it on the un-cut form)
    val docs = Tables.load(spark, Sf001, "documents")
    val poolPlan = TrainingCorpus.cleanPool(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
      .queryExecution.executedPlan.toString
    assert(poolPlan.contains("LeftSemi"))
  }

  test("incremental assembly equals the full recompute (p02 = p01)") {
    val inc = TrainingCorpus.incrementalAssembleMod(spark, Sf001, 3).collect()
    assert(inc.length === manifest.length)
    inc.zip(manifest).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("a smaller-id delta duplicate retracts the indexed pool keeper") {
    val docs = Tables.load(spark, Sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    // a doc known to survive every gate: any manifest member
    val k = manifest.head.getLong(0)
    val kRow = train.filter(col("doc_id") === k).collect().head
    // the delta: an exact text duplicate with a SMALLER id — the full
    // recompute's fp window would make IT the keeper and drop doc k
    import spark.implicits._
    val delta = Seq((-5L, kRow.getString(1), kRow.getString(2)))
      .toDF("doc_id", "source", "text")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-poolidx-spec-${System.nanoTime()}"
    graft.index.CorpusPoolIndex.build(train, bench, path)
    val incPool = TrainingCorpus.incrementalPool(delta, path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // retraction happened: the delta doc replaced the old keeper
    assert(incPool.exists(_._1 === -5L))
    assert(!incPool.exists(_._1 === k))
    // and the incremental pool equals the full recompute over
    // corpus ∪ delta, row for row
    val full = TrainingCorpus.cleanPool(train.unionByName(delta), bench)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(incPool === full)
  }

  test("fuzzy assembly drops gate-surviving near-duplicates the exact stage misses") {
    val docs = Tables.load(spark, Sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    // plant a NEAR-duplicate of a known pool survivor: replace the last
    // token — the md5 fingerprint changes (exact stage blind) but only
    // one 3-gram shingle differs per side, so jaccard ≥ (n−3)/(n−1) ≥
    // 0.8 for the ≥20-token docs the gate keeps; larger id ⇒ the plant
    // is its component's non-min member and must be the one dropped
    val k = manifest.head.getLong(0)
    val kRow = train.filter(col("doc_id") === k).collect().head
    val words = kRow.getString(2).split(' ')
    val nearText = (words.dropRight(1) :+ "zzzneardupzzz").mkString(" ")
    import spark.implicits._
    val plant = Seq((900000L + k, kRow.getString(1), nearText))
      .toDF("doc_id", "source", "text")
    val planted = train.unionByName(plant)
    val exactPool = TrainingCorpus.cleanPool(planted, bench)
      .collect().map(_.getLong(0)).toSet
    val fuzzyPool = TrainingCorpus.fuzzyCleanPool(planted, bench)
      .collect().map(_.getLong(0)).toSet
    // the exact stage keeps the plant (distinct fingerprint, passes
    // gates); the fuzzy closure drops it as its cluster's non-min
    assert(exactPool.contains(900000L + k))
    assert(!fuzzyPool.contains(900000L + k))
    assert(fuzzyPool.contains(k))
    // and the fuzzy pool is exactly the exact pool minus the closure's
    // non-min members over the gated survivors
    assert(fuzzyPool.subsetOf(exactPool))
  }

  test("fuzzy assembly manifest packing is gapless; LSH pass is survivor-pruned") {
    val fm = TrainingCorpus.assembleFuzzy(spark, Sf001).collect()
    assert(fm.nonEmpty)
    var off = 0L
    fm.foreach { r =>
      assert(r.getLong(3) === off); off += r.getLong(2)
    }
    // the near-dup and decontamination stages shingle only gate
    // survivors. fuzzyCleanPool's overlapped branches are eagerly
    // checkpointed (lineage truncated), so the LeftSemi prune ahead of
    // the shingle explode is pinned on the un-materialized branch form
    val docs = Tables.load(spark, Sf001, "documents")
    val branchPlan = TrainingCorpus.fuzzyDecontamBranch(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
      .queryExecution.executedPlan.toString
    assert(branchPlan.contains("LeftSemi"))
  }

  test("multi-batch ingest advances the index: batch 2 sees corpus ∪ batch 1") {
    val docs = Tables.load(spark, Sf001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    val corpus = train.filter(col("doc_id") % 3 =!= 0)
    val d1 = train.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val d2 = train.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-poolidx-spec-${System.nanoTime()}"
    graft.index.CorpusPoolIndex.build(corpus, bench, path)
    graft.index.CorpusPoolIndex.ingest(d1, path)
    assert(graft.index.CorpusPoolIndex.ready(spark, path))
    // after the ingest, batch 2's incremental pool must equal the full
    // recompute over the whole train split
    val incPool = TrainingCorpus.incrementalPool(d2, path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val full = TrainingCorpus.cleanPool(train, bench)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(incPool === full)
  }
}
