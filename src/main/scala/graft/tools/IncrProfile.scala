package graft.tools

// Scratch profiler for the incremental near-dup path — NOT part of the
// shipped surface; run via `sbt "runMain graft.tools.IncrProfile <dir> <mod>"`.
object IncrProfile {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args(0); val mod = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder("graft-incrprofile", cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"IP $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val isDelta = col("doc_id") % mod === 0
    // warm pass so the index exists and JIT is hot
    timed("full (cold)")(graft.operators.Dedup.incrementalNearDupMod(spark, dir, mod).count())
    graft.core.Caching.releaseAll(spark)
    timed("delta signatures")(
      graft.operators.Dedup.bandedSignatures(
        graft.operators.Dedup.hashedShingleSets(docs.filter(isDelta))).count())
    graft.core.Caching.releaseAll(spark)
    // corpus-side scans, in isolation (count() = scan + decode, no join)
    val idxPath = {
      // same fingerprint derivation as incrementalNearDupMod
      val src = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(src, true)
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) { val f = it.next(); parts += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}" }
      val fp = parts.sorted.mkString("|")
      val key = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$dir|$fp|mod=$mod".getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      s"${System.getProperty("java.io.tmpdir")}/graft-sigidx-$key"
    }
    timed("corpus bands scan")(graft.index.SignatureIndex.bands(spark, idxPath).count())
    timed("corpus counts scan")(graft.index.SignatureIndex.counts(spark, idxPath).count())
    timed("corpus shingles scan")(graft.index.SignatureIndex.shingles(spark, idxPath)
      .select(count(lit(1)), sum(size(col("hs")))).collect())
    graft.core.Caching.releaseAll(spark)
    timed("full (warm)")(graft.operators.Dedup.incrementalNearDupMod(spark, dir, mod).count())
    graft.core.Caching.releaseAll(spark)
    timed("full (warm 2)")(graft.operators.Dedup.incrementalNearDupMod(spark, dir, mod).count())
    spark.stop()
  }
}
