package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Dedup, SemanticDedup, Similarity}

/** Persisted SemDeDup state — the d15 cadence index (the
  * [[SignatureIndex]]/[[EmbSignatureIndex]]/[[MediaHashIndex]] analogue
  * for semantic dedup): the corpus is ASSIGNED, PAIRED, AND DECIDED
  * EXACTLY ONCE; each ingest batch assigns only the delta under the
  * FROZEN centroids and compares it against its touched cells' members.
  * At 100 TB the full within-cell pair pass is Θ(n·cellWidth) corpus
  * dots per run — this index makes the per-batch cost
  * Θ(delta·cellWidth) instead, the same delta-proportional contract as
  * every other incremental index in the repo.
  *
  * Layout under `path`:
  *  - `cents/`   (lvl, idx, cv) — lvl 0 = coarse centroids, lvl 1 = the
  *    flat sub-centroid matrix (row c·subPerCell+j). Frozen at build;
  *    [[ensure]]'s staleness policy re-trains, never [[append]].
  *  - `meta/`    (n0, coarse, subPerCell, tau) — n0 is the corpus size
  *    the centroids were trained at (the staleness baseline, the
  *    [[PqIndex]] quantizer-snapshot convention).
  *  - `members/` (cell, vec_id, v, norm, csim) — cell-range-partitioned
  *    so a delta's probe prunes to touched cells by parquet footer
  *    min/max instead of scanning the corpus.
  *  - `drops/`   (vec_id) — append-only dup set: build's drop set plus
  *    each batch's new drops. Append-only because the policy only ever
  *    ADDS drops (a new vector can demote a keeper, never promote a
  *    dropped one), so decisions stay a read-time anti-join, never a
  *    corpus-sized rewrite.
  *
  * Retroactive drops: the published keep policy is (centroid_sim, id)
  * ORDER-based, not arrival-based — a delta vector ranking below an
  * existing keeper in its cell drops THAT KEEPER. [[probe]] therefore
  * emits corpus decision flips alongside the delta's own rows, and the
  * maintained [[decisions]] view equals the full recompute under the
  * same centroids ([[SemanticDedup.semanticDedupWithCents]]) — pinned
  * by SemDedupIndexSpec's two-batch equivalence test.
  *
  * Crash consistency (the index-family torn-write contract): the READY
  * marker drops before the first write of build/append and re-creates
  * after the last, so a torn write reads `ready() == false` and the
  * next builder rebuilds. Single-writer per index path. */
object SemDedupIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_SEMDEDUP_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  /** (n0, coarse, subPerCell, tau). */
  def meta(s: SparkSession, path: String): (Long, Int, Int, Double) = {
    val r = s.read.parquet(s"$path/meta").collect()(0)
    (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))
  }

  def members(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/members")

  def drops(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/drops").distinct()

  /** The frozen centroid matrices: (coarse, sub) — sub is null for a
    * single-level layout. */
  def centroids(s: SparkSession, path: String)
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val rows = s.read.parquet(s"$path/cents")
      .orderBy(col("lvl"), col("idx")).collect()
    val (c0, c1) = rows.partition(_.getInt(0) == 0)
    def mat(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getSeq[Double](2).toArray)
    (mat(c0), if (c1.isEmpty) null else mat(c1))
  }

  /** The maintained decision frame — identical in shape and content to
    * the batch [[SemanticDedup.semanticDedup]] output under the frozen
    * centroids: (vec_id, cell, centroid_sim, is_dup). */
  def decisions(s: SparkSession, path: String): DataFrame = {
    val m = members(s, path)
    m.select(col("vec_id"), col("cell"),
        round(col("csim"), 4).as("centroid_sim"))
      .join(drops(s, path).withColumn("is_dup", lit(1L)), Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      .orderBy(col("vec_id"))
  }

  private def writeCents(s: SparkSession, path: String,
      cents: Array[Array[Double]], subCents: Array[Array[Double]]): Unit = {
    import s.implicits._
    val rows =
      cents.zipWithIndex.map { case (c, i) => (0, i.toLong, c.toSeq) } ++
        (if (subCents == null) Array.empty[(Int, Long, Seq[Double])]
         else subCents.zipWithIndex.map { case (c, i) => (1, i.toLong, c.toSeq) })
    rows.toSeq.toDF("lvl", "idx", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cents")
  }

  /** Full build: train (one- or two-level per the corpus size, the
    * [[SemanticDedup.semanticDedup]] sizing), assign once, run the
    * within-cell pair pass once, persist members + drops + centroids.
    * `coarse`/`subPerCell` > 0 pin an explicit layout (spec hook). */
  def build(corpus: DataFrame, path: String,
      tau: Double = SemanticDedup.DefaultTau,
      coarse: Int = 0, subPerCell: Int = 0): Unit = {
    val s = corpus.sparkSession
    fs(s, path).delete(marker(path), false)
    val e = Similarity.withNorm(s, corpus)
    val n = e.count()
    val k = if (coarse > 0) coarse else Similarity.ivfConfig(n)._1
    val sub =
      if (subPerCell > 0) subPerCell
      else if (coarse > 0) 1
      else SemanticDedup.subPerCellFor(n, k)
    val cents = Similarity.kmeansCentroids(s, e, k)
    val subCents =
      if (sub <= 1) null
      else SemanticDedup.trainSubCentroids(s, e, cents, sub)
    SemanticDedup.assignFrame(e, cents, subCents, sub)
      .repartitionByRange(col("cell"), col("vec_id"))
      .sortWithinPartitions(col("cell"))
      .write.mode("overwrite").parquet(s"$path/members")
    // drops from the PERSISTED members so assignment runs exactly once
    SemanticDedup.dropsFrame(members(s, path), tau, n)
      .write.mode("overwrite").parquet(s"$path/drops")
    writeCents(s, path, cents, subCents)
    import s.implicits._
    Seq((n, k, sub, tau)).toDF("n0", "coarse", "subPerCell", "tau")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    fs(s, path).create(marker(path), true).close()
  }

  /** Assign a raw (vec_id, embedding) delta under the index's FROZEN
    * centroids — the shared entry of the batch probe and the streaming
    * scorer ([[graft.streaming.StreamingSemanticDedup]]): both must
    * assign with the index's own geometry or probe and state diverge. */
  private[graft] def assignDelta(delta: DataFrame, path: String): DataFrame = {
    val s = delta.sparkSession
    val (_, _, sub, _) = meta(s, path)
    val (cents, subCents) = centroids(s, path)
    SemanticDedup.assignFrame(Similarity.withNorm(s, delta), cents, subCents, sub)
  }

  /** The batch's NEW drop set: delta members dropped by corpus/delta
    * neighbors, and corpus keepers RETROACTIVELY dropped by delta
    * members — over an arbitrary `corpusMembers` frame, so the
    * streaming path can ride its pending log on the corpus side.
    * `dA` must be materialized (it is consumed twice). */
  private[graft] def newDropsAgainst(dA: DataFrame, nD: Long,
      corpusMembers: DataFrame, tau: Double): DataFrame = {
    val s = dA.sparkSession
    val a = dA.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("norm").as("na"), col("csim").as("ca"))
    // delta vs corpus: members STREAM (cell-pruned by the range layout),
    // the delta side hash-builds under the byte budget / broadcasts
    val b = corpusMembers.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("norm").as("nb"), col("csim").as("cb"))
    val cross = b
      .join(Dedup.bcastOrHashIf(SemanticDedup.MemberRowBytes, nD,
        Seq("cell"))(a), Seq("cell"))
      .filter(VectorFunctions.dot(s, col("va"), col("vb"))
        / (col("na") * col("nb")) >= tau)
    // delta vs delta (same batch): the batch self-join, delta-sized
    val bD = dA.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("norm").as("nb"), col("csim").as("cb"))
    val within = a
      .join(Dedup.bcastOrHashIf(SemanticDedup.MemberRowBytes, nD,
        Seq("cell"))(bD), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.dot(s, col("va"), col("vb"))
        / (col("na") * col("nb")) >= tau)
    cross.select(SemanticDedup.dupSide.as("vec_id"))
      .unionByName(within.select(SemanticDedup.dupSide.as("vec_id")))
      .distinct()
  }

  /** The delta's assigned frame plus the batch's NEW drops (delta
    * members dropped by corpus/delta neighbors, and corpus keepers
    * retroactively dropped by delta members). Pure — [[append]]
    * persists, [[probe]] only reports. */
  private def probeFrames(delta: DataFrame, path: String)
      : (DataFrame, DataFrame) = {
    val s = delta.sparkSession
    val (_, _, _, tau) = meta(s, path)
    // delta-sized; consumed 3 ways below — count observed on the ckpt
    val (dA, nDA) = graft.core.Caching.checkpointCounted(
      assignDelta(delta, path))
    (dA, newDropsAgainst(dA, nDA, members(s, path), tau))
  }

  /** The batch's decision-update frame: the delta's decision rows plus
    * every CORPUS row the delta retroactively drops. `corpusMembers`
    * must be the member frame as of BEFORE the batch.
    *
    * The drop set is delta-BOUNDED (each drop names a ≥τ pair side in
    * a delta-touched cell) but rides a localCheckpoint whose stats
    * Spark treats as unknown-size, so both joins must broadcast it
    * EXPLICITLY under the byte budget — without the hint the retro
    * lookup sort-merges, shuffling the CORPUS member table per batch
    * (caught in the PLANS.md audit; at 100 TB that is the one shuffle
    * this cadence exists to avoid). */
  private[graft] def decisionUpdates(dA: DataFrame, nd: DataFrame,
      corpusMembers: DataFrame): DataFrame = {
    val nDrops = nd.count() // once — the hint lambda runs per join below
    val bc = Dedup.bcastOrHashIf(16, nDrops, Seq("vec_id"))(_)
    val deltaDec = dA
      .select(col("vec_id"), col("cell"),
        round(col("csim"), 4).as("centroid_sim"))
      .join(bc(nd.withColumn("is_dup", lit(1L))), Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
    val retro = corpusMembers
      .join(bc(nd), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("cell"),
        round(col("csim"), 4).as("centroid_sim"), lit(1L).as("is_dup"))
    deltaDec.unionByName(retro).orderBy(col("vec_id"))
  }

  /** Decision updates for a batch WITHOUT mutating the index (the
    * scaling-ladder shape, like the m03b/d07b probes). */
  def probe(delta: DataFrame, path: String): DataFrame = {
    val s = delta.sparkSession
    val (dA, newDrops) = probeFrames(delta, path)
    decisionUpdates(dA, newDrops.localCheckpoint(true), members(s, path))
  }

  /** Ingest a batch: probe under the frozen centroids, then persist
    * the delta's members and the new drops (both delta-proportional
    * appends — the corpus is never rewritten). Returns the same
    * decision-update frame as [[probe]]. */
  def append(delta: DataFrame, path: String): DataFrame = {
    val s = delta.sparkSession
    val (dA, newDrops) = probeFrames(delta, path)
    val nd = newDrops.localCheckpoint(true)
    // the update frame reads the PRE-batch members; plan it before the
    // append lands (localCheckpoint pins the semi-join's row set)
    val updates = decisionUpdates(dA, nd, members(s, path))
      .localCheckpoint(true)
    fs(s, path).delete(marker(path), false)
    dA.sortWithinPartitions(col("cell"))
      .write.mode("append").parquet(s"$path/members")
    nd.write.mode("append").parquet(s"$path/drops")
    fs(s, path).create(marker(path), true).close()
    updates
  }

  /** Persist ALREADY-ASSIGNED members plus their drop set — the
    * compactor's entry ([[graft.streaming.StreamingSemanticDedup]]
    * folds its pending log in without re-assigning or re-pairing;
    * the stream already computed both under the frozen centroids).
    * Same torn-write contract as [[append]]. */
  def appendFrames(s: SparkSession, deltaMembers: DataFrame,
      deltaDrops: DataFrame, path: String): Unit = {
    fs(s, path).delete(marker(path), false)
    deltaMembers
      .select(col("cell"), col("vec_id"), col("v"), col("norm"), col("csim"))
      .sortWithinPartitions(col("cell"))
      .write.mode("append").parquet(s"$path/members")
    deltaDrops.select(col("vec_id")).distinct()
      .write.mode("append").parquet(s"$path/drops")
    fs(s, path).create(marker(path), true).close()
  }

  /** Build if absent; re-train + rebuild when the corpus has outgrown
    * the trained layout (n > 2·n0 — the [[PqIndex.ensure]] staleness
    * policy, with the same guard: a staleness rebuild from a frame
    * SMALLER than the indexed corpus would silently drop appended
    * vectors, so it is refused). */
  def ensure(corpus: DataFrame, path: String,
      tau: Double = SemanticDedup.DefaultTau): Unit = {
    val s = corpus.sparkSession
    if (!ready(s, path)) { build(corpus, path, tau); return }
    val (n0, _, _, _) = meta(s, path)
    val n = corpus.count()
    if (n > 2 * n0) {
      val indexed = members(s, path).count()
      require(n >= indexed,
        s"staleness rebuild from a frame of $n rows would drop " +
          s"already-indexed vectors ($indexed in the index) — pass the " +
          "full corpus-plus-appends frame")
      build(corpus, path, tau)
    }
  }
}
