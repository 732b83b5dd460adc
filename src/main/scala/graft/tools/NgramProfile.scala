package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Phase profile of the d04 exact n-gram jaccard pipeline at a given SF
  * dir: shingle checkpoint, candidate generation, exact verify — the
  * split that says whether the sf10 cost is the self-join or the
  * shingle kernel. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder("graft-ngram-profile", cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    val sh = time("shingle checkpoint")(Dedup.hashedShingleSets(docs))
    println(s"[profile] docs=${sh.count()}")
    val cand = time("candidates") {
      val c = Dedup.ngramCandidates(sh, 64).localCheckpoint(true)
      println(s"[profile] candidates=${c.count()}")
      c
    }
    time("full query (shared checkpoint)") {
      Dedup.ngramJaccard(docs).count()
    }
    spark.stop()
  }
}
