package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase attribution for m05b's steady state (indexes pre-built):
  * per modality — delta decode+hash, incremental probe, cluster merge —
  * then the final decision join. Answers WHERE the maintained path's
  * time goes, since the ladder row only shows the total. One `mod`
  * value (arg 2, default 30 = the driver binding) threads through the
  * pre-build, the per-phase timers, AND the end-to-end call, so the
  * phases reconcile with the total. */
object M05bProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val mod = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val spark = graft.core.GraftSession.local("m05bprofile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val mm = graft.multimodal.Multimodal
    mm.ensureJointMediaIndexes(spark, dir, mod) // outside every timer
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val deltaDocs = docs.filter(col("doc_id") % mod === 0)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m05bprofile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    Seq(("img", mm.syntheticImageCorpus _, mm.imageSigFrame _),
        ("aud", mm.syntheticAudioCorpus _, mm.audioSigFrame _),
        ("vid8b", mm.syntheticVideoCorpus _, mm.videoSigFrame _)).foreach {
      case (tag, corpus, sigf) =>
        val hashPath = graft.index.IndexCache.pathFor(
          spark, s"$dir/documents.parquet", s"${tag}hash-mod=$mod")
        val ccPath = graft.index.IndexCache.pathFor(
          spark, s"$dir/documents.parquet", s"${tag}cc-mod=$mod")
        val sigs = t(s"$tag delta decode+hash") {
          sigf(corpus(deltaDocs)).localCheckpoint(true)
        }
        val pairs = t(s"$tag incremental probe") {
          graft.operators.Dedup.incrementalHamming64PairsFrames(sigs,
            graft.index.MediaHashIndex.buckets(spark, hashPath),
            graft.index.MediaHashIndex.counts(spark, hashPath), 5)
            .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
            .localCheckpoint(true)
        }
        println(s"[m05bprofile] $tag delta pairs: ${pairs.count()}")
        val merged: DataFrame = t(s"$tag mergeClusters") {
          val m = graft.operators.Dedup.mergeClusters(
            graft.index.ClusterIndex.load(spark, ccPath), pairs)
          m.count()
          m
        }
        t(s"$tag drop-id extraction") {
          merged.filter(col("doc_id") =!= col("cluster_id"))
            .select(col("doc_id")).count()
        }
        graft.core.Caching.releaseAll(spark)
    }

    t("full m05b steady (one call, end to end)") {
      mm.jointMediaSurvivorsIndexedMod(spark, dir, mod).count()
    }
    graft.core.Caching.releaseAll(spark)
    t("full m05 (contrast)") {
      mm.jointMediaSurvivors(spark, dir).count()
    }
    spark.stop()
  }
}
