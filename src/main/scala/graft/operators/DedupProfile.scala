package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Dev utility: phase-by-phase timing of the production embedding
  * dedup (d06) — candidate generation vs sketch screen vs exact
  * verify — to localize which stage moves when a scaling point shifts.
  * Usage: runMain graft.operators.DedupProfile [sfDir] */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession
      .builder("graft-dedup-profile", cpus).master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val corpus = Dedup.plantedProductionCorpus(Tables.load(spark, dir, "embeddings"))
    val e = time("normalize+checkpoint") {
      Dedup.embNormedPlan(corpus).localCheckpoint(true)
    }
    val n = e.count()
    val bits = Dedup.adaptiveEmbBits(n)
    println(s"[profile] n=$n bits=$bits")
    time("bucket width census") {
      val sigs = e.select(col("vec_id"),
        posexplode(graft.functions.LshFunctions.lshSigs(
          spark, col("v"), 1L, bits, 32)).as(Seq("tbl", "sig")))
      val widths = sigs.groupBy(col("tbl"), col("sig")).agg(count(lit(1)).as("w"))
      val hist = widths.select(
        when(col("w") === 1, "1").when(col("w") <= 4, "2-4")
          .when(col("w") <= 16, "5-16").when(col("w") <= 64, "17-64")
          .when(col("w") <= 256, "65-256").otherwise(">256").as("bucket"),
        col("w"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_buckets"), sum(col("w")).as("rows"),
          sum((col("w") * (col("w") - 1) / 2).cast("long")).as("pairs"))
        .orderBy("bucket")
      hist.collect().foreach(r => println(
        s"[profile]   width ${r.getString(0)}: buckets=${r.getLong(1)} rows=${r.getLong(2)} allpairs=${r.getLong(3)}"))
    }
    val cand = time("candidates (probed, count)") {
      val c = Dedup.embCandidatesProbed(e, bits)
      println(s"[profile]   candidate rows: ${c.count()}")
      c
    }
    time("full d06 (warm)") {
      Dedup.embeddingNearDup(corpus, Dedup.ProductionEmbTau).count()
    }
    time("full d06 (warm, repeat)") {
      Dedup.embeddingNearDup(corpus, Dedup.ProductionEmbTau).count()
    }
    spark.stop()
  }
}
