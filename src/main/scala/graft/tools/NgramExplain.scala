package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Phase profile of the d02/d04 candidate machinery at a given SF dir —
  * the split that attributes sf10 cost to kernel vs window vs join vs
  * verify (the evidence behind the round-9 join-strategy fixes). */
object NgramExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder("graft-ngram-explain", cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val sh = time("shingle checkpoint")(
      Dedup.hashedShingleSets(Tables.load(spark, dir, "documents")))
    println(s"docs=${sh.count()}")
    val bands = time("minhash band signatures") {
      val b = Dedup.bandedSignatures(sh)
      println(b.count()); b
    }
    time("bucketPairs (window + self-join)") {
      println(Dedup.bucketPairs(bands, Seq("band", "bh")).count())
    }
    time("full d02")(println(Dedup.minhashLsh(Tables.load(spark, dir, "documents")).count()))
    spark.stop()
  }
}
