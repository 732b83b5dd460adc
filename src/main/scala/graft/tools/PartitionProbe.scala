package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Measurement probe (optimization round): print the partition count of
  * the scan feeding each per-row-heavy pipeline stage, and time the
  * single-modality decode passes — evidence for whether the expensive
  * partition-local work (codec synthesis/decode, signature kernels) is
  * actually running in parallel at bench scale.
  *
  * Usage: runMain graft.tools.PartitionProbe [sfDir]
  */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-pprobe", cpus.toInt)
    def parts(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.getNumPartitions
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-32s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    println(s"[probe] documents scan partitions = ${parts(docs)}")
    println(s"[probe] doc_id-only scan partitions = ${parts(docs.select(col("doc_id")))}")
    val img = graft.multimodal.Multimodal.syntheticImageCorpus(docs)
    println(s"[probe] syntheticImageCorpus partitions = ${parts(img)}")
    println(s"[probe] defaultParallelism = ${spark.sparkContext.defaultParallelism}")
    // warm first (JIT), then timed
    time("warm imageSigFrame") {
      graft.multimodal.Multimodal.imageSigFrame(
        graft.multimodal.Multimodal.syntheticImageCorpus(docs)).count()
    }
    time("imageSigFrame (render+dHash)") {
      graft.multimodal.Multimodal.imageSigFrame(
        graft.multimodal.Multimodal.syntheticImageCorpus(docs)).count()
    }
    time("audioSigFrame (render+eHash)") {
      graft.multimodal.Multimodal.audioSigFrame(
        graft.multimodal.Multimodal.syntheticAudioCorpus(docs)).count()
    }
    time("videoSigFrame (render+vHash)") {
      graft.multimodal.Multimodal.videoSigFrame(
        graft.multimodal.Multimodal.syntheticVideoCorpus(docs)).count()
    }
    time("simhashSigFrame") {
      graft.operators.Dedup.simhashSigFrame(docs).count()
    }
    spark.stop()
  }
}
