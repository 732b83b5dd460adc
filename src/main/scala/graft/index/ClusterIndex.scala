package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted duplicate-cluster frame — the corpus-side state an
  * INCREMENTAL cluster-maintenance pipeline keeps between ingest
  * batches (the decision-layer companion to [[SignatureIndex]]: that
  * index keeps what pair FORMATION needs, this one keeps what the
  * keep/drop DECISION needs).
  *
  * At 100 TB the cluster frame is the small, survivor-decision-sized
  * artifact (one row per doc in ≥1 near-dup pair); recomputing it per
  * daily batch means re-running connected components over the full
  * corpus pair graph, while maintaining it incrementally
  * ([[graft.operators.Dedup.mergeClusters]]) costs one delta-sized CC
  * over the contracted graph. Same single-writer and tmp-cache
  * contract as [[SignatureIndex]]; at cluster scale the path is a
  * durable index root instead of tmpdir. */
object ClusterIndex {

  private def fs(s: SparkSession, path: String) =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def marker(path: String) = new Path(path, "_CCIDX_READY")

  def ready(s: SparkSession, path: String): Boolean =
    fs(s, path).exists(marker(path))

  /** Persist a (doc_id, cluster_id) frame. One write — the frame is
    * decision-sized, already the product of the CC pass. */
  def build(clusters: DataFrame, path: String): Unit = {
    val s = clusters.sparkSession
    // torn-write contract: not-ready while the frame is mid-overwrite
    fs(s, path).delete(marker(path), false)
    clusters.write.mode("overwrite").parquet(s"$path/clusters")
    fs(s, path).create(marker(path), true).close()
  }

  def load(s: SparkSession, path: String): DataFrame =
    s.read.parquet(s"$path/clusters")
}
