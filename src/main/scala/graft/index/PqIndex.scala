package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PqFunctions, PqKernel, VectorFunctions}
import graft.operators.Similarity

/** Persisted IVF-PQ index — the serving-side state of
  * [[graft.operators.Similarity.annIvfPq]], the ANN analogue of the
  * BM25 postings index (t14) and the dedup signature indexes
  * (d07/d13): at 100 TB a query (or a daily delta) cannot re-train and
  * re-encode the corpus, and the whole point of 16 B/vector codes is
  * to build them ONCE and keep them hot.
  *
  *  - `codes/`  (vec_id, codes) parquet PARTITIONED BY cell — a query
  *    probing 3/8 of the cells prunes 5/8 of the files at the source
  *    (the on-disk realization of the inverted file).
  *  - `vecs/`   (vec_id, v, norm) — raw vectors, touched only for the
  *    bounded exact re-rank.
  *  - `cents/`  (cell, cv) ≤1024 rows; `books/` (sub, code, vals)
  *    8×256 rows — the trained quantizers, collected driver-side at
  *    query time (≈0.7 MB).
  *  - `meta/`   (cells, n) — the recorded coarse resolution and corpus
  *    size ([[ensure]]'s drift policy reads it).
  *
  * Append discipline matches [[EmbSignatureIndex]]: the quantizers are
  * FROZEN at build time (standard IVFADC serving practice — retraining
  * would re-encode the corpus), deltas encode at the recorded
  * centroids/codebooks as two projections and land as new files inside
  * their cell partitions; the READY marker drops before any write and
  * returns after meta lands, so a torn append reads as not-ready,
  * never as wrong. Coarse-resolution drift is [[ensure]]'s job: it
  * rebuilds when the projected corpus size pushes
  * [[Similarity.ivfConfig]] past the recorded cell count — the cap
  * (1024) makes that at most a handful of rebuilds over a corpus's
  * lifetime, none past ~65k vectors. */
object PqIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_PQIDX_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  /** (cells, n) recorded at build/append time. */
  def meta(s: SparkSession, path: String): (Int, Long) = {
    val (cells, n, _) = metaAll(s, path)
    (cells, n)
  }

  /** (cells, n, n0) in ONE meta read — `n0` is the corpus size at
    * quantizer-TRAIN time, the staleness denominator [[ensure]]'s
    * re-train policy divides by. Indexes written before the column
    * existed read `n0 = n` (their quantizers were trained on exactly
    * the recorded corpus). [[ensure]] needs all three, and reading the
    * tiny meta parquet once instead of three times drops two
    * driver-side jobs from every warm serving call. */
  private def metaAll(s: SparkSession, path: String): (Int, Long, Long) = {
    val df = s.read.parquet(s"$path/meta")
    val r = df.collect()(0)
    val n = r.getLong(df.columns.indexOf("n"))
    val i = df.columns.indexOf("n0")
    (r.getInt(df.columns.indexOf("cells")), n,
      if (i >= 0) r.getLong(i) else n)
  }

  /** Trained coarse centroids, driver-side (≤1024 × dim doubles). */
  def centroids(s: SparkSession, path: String): Array[Array[Double]] =
    s.read.parquet(s"$path/cents").orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Trained residual codebooks, driver-side (M × Ks × subdim). */
  def codebooks(s: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = s.read.parquet(s"$path/books").orderBy("sub", "code").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    Array.tabulate(PqKernel.M)(m => rows.filter(_._1 == m).map(_._2))
  }

  /** Encode a normalized (vec_id, v, norm) frame against frozen
    * quantizers: two projections, zero shuffle. */
  private def codeRows(e: DataFrame, cents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]]): DataFrame = {
    val s = e.sparkSession
    e.withColumn("cell", VectorFunctions.nearestCell(s, col("v"), cents))
      .select(col("vec_id"), col("cell"),
        PqFunctions.pqEncodeRes(s, col("v"), col("cell"), cents, cb).as("codes"))
  }

  /** Full build at the coarse resolution for `totalN` vectors
    * (defaults to the corpus's own count). */
  def build(embeddings: DataFrame, path: String, totalN: Long = -1L): Unit = {
    val s = embeddings.sparkSession
    import s.implicits._
    // torn-write contract: ensure()'s staleness re-train rebuilds over
    // a READY index — it must read not-ready mid-overwrite
    fs(s, path).delete(marker(path), false)
    val e = Similarity.withNorm(s, embeddings).localCheckpoint(true)
    val n = e.count()
    val cells = Similarity.ivfConfig(if (totalN > 0) totalN else n)._1
    // one shared sample collect for both quantizer trainings (the two
    // samples are prefixes of the same deterministic hash order)
    val shared = Similarity.trainSample(e,
      math.max(Similarity.centroidSampleN(cells), Similarity.PqSampleN))
    val cents = Similarity.kmeansCentroidsFrom(
      shared.take(Similarity.centroidSampleN(cells)), cells)
    val cb = Similarity.pqCodebooksFrom(
      shared.take(Similarity.PqSampleN), cents)
    // one file per cell: without the repartition every write task
    // emits a file into every cell dir it touches (tasks × cells files
    // — 32k at sf10, and the read pays per-file open cost that dwarfed
    // the query: first cut measured 16.7 s vs the batch path's 4.2 s)
    codeRows(e, cents, cb).repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    e.select(col("vec_id"), col("v"), col("norm"))
      .repartition(col("vec_id"))
      .write.mode("overwrite").parquet(s"$path/vecs")
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "cv").write.mode("overwrite").parquet(s"$path/cents")
    cb.zipWithIndex.flatMap { case (sub, m) =>
      sub.zipWithIndex.map { case (vals, c) => (m, c, vals) }
    }.toSeq.toDF("sub", "code", "vals")
      .write.mode("overwrite").parquet(s"$path/books")
    Seq((cents.length, n, n)).toDF("cells", "n", "n0")
      .write.mode("overwrite").parquet(s"$path/meta")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }

  /** Frozen-quantizer staleness bound: once appended mass doubles the
    * corpus the quantizers were trained on, [[ensure]] re-trains.
    * Under a STATIONARY append distribution recall barely moves (the
    * append probe measures it — hash-uniform appends re-use the same
    * cell geometry), so the trigger exists for the drift case:
    * appended vectors from a shifted distribution land in the frozen
    * cells' margins, residuals leave the codebooks' trained range, and
    * ADC error grows with the appended fraction. 2× bounds the stale
    * fraction at ≤ ½ of the corpus — and keeps rebuilds O(log n) over
    * a corpus's lifetime, amortized like the cell-drift rebuilds. */
  private val RetrainFactor = 2L

  /** Build if absent, if the recorded coarse resolution has drifted
    * below what `projectedN` total vectors need, or if appended mass
    * has passed the [[RetrainFactor]] staleness bound since the
    * quantizers were trained. Returns the cell count in effect.
    *
    * `embeddings` must be the FULL corpus-plus-appends frame: a
    * staleness rebuild overwrites codes/vecs from it alone, so a
    * caller handing only the original base frame would silently drop
    * every appended vector. Enforced (one count, paid only on the
    * rare rebuild path) rather than documented-only — quiet data loss
    * must not be one call away. */
  def ensure(embeddings: DataFrame, path: String, projectedN: Long): Int = {
    val s = embeddings.sparkSession
    val needed = Similarity.ivfConfig(projectedN)._1
    val recorded =
      if (ready(s, path)) Some(metaAll(s, path)) else None
    val stale = recorded.forall { case (cells, n, n0) =>
      cells < needed || n > RetrainFactor * n0
    }
    if (stale) {
      recorded.foreach { case (_, covered, _) =>
        val handed = embeddings.count()
        require(handed >= covered,
          s"PqIndex.ensure rebuild would drop vectors: handed frame has " +
            s"$handed rows but the index covers $covered — pass the full " +
            "corpus-plus-appends frame")
      }
      build(embeddings, path, projectedN)
      meta(s, path)._1
    } else recorded.get._1
  }

  /** Ingest a batch at the FROZEN quantizers: delta-sized projections
    * append into the cell partitions; only meta is rewritten (`n0`
    * rides unchanged — it marks the quantizer-training snapshot). */
  def append(deltaEmb: DataFrame, path: String): Unit = {
    val s = deltaEmb.sparkSession
    import s.implicits._
    val (cells, nCur, n0) = metaAll(s, path)
    val cents = centroids(s, path)
    val cb = codebooks(s, path)
    fs(s, path).delete(marker(path), false)
    val e = Similarity.withNorm(s, deltaEmb).localCheckpoint(true)
    val nD = e.count()
    codeRows(e, cents, cb).repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    e.select(col("vec_id"), col("v"), col("norm"))
      .write.mode("append").parquet(s"$path/vecs")
    Seq((cells, nCur + nD, n0)).toDF("cells", "n", "n0")
      .write.mode("overwrite").parquet(s"$path/meta")
    val out = fs(s, path).create(marker(path), true)
    out.close()
  }

  /** Top-k query against the persisted index — the SAME plan tail as
    * the batch path ([[Similarity.pqSearch]]) over the on-disk codes
    * (cell-partition-pruned by the probe join) and vectors. */
  def query(s: SparkSession, path: String, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true, rerank: Int = 0): DataFrame = {
    // the five setup reads are independent driver-side work — three
    // small-parquet collects (meta, cents, books) plus the two frame
    // reads whose file-listing/schema discovery walks the per-cell
    // partition tree (≈180 dirs). Sequential, they dominated the warm
    // query (measured ~0.9 s of the s05 1.5 s at sf0.1); overlapped
    // (guide §2.6) they cost max, not sum.
    import scala.concurrent.{Await, Future, blocking}
    import scala.concurrent.ExecutionContext.Implicits.global
    val metaF = Future(blocking(meta(s, path)))
    val centsF = Future(blocking(centroids(s, path)))
    val cbF = Future(blocking(codebooks(s, path)))
    val codesF = Future(blocking(s.read.parquet(s"$path/codes")))
    val vecsF = Future(blocking(s.read.parquet(s"$path/vecs")))
    def get[A](f: Future[A]): A =
      Await.result(f, scala.concurrent.duration.Duration.Inf)
    val (cells, n) = get(metaF)
    val cRerank = if (rerank > 0) rerank else Similarity.defaultRerank(k, n)
    Similarity.pqSearch(get(codesF), get(vecsF), queries, k, get(centsF),
      get(cbF), Similarity.probeFor(cells), cRerank, excludeSelf)
  }
}
