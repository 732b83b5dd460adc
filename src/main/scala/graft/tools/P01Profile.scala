package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Caching, GraftSession, Tables}
import graft.operators.{Mixture, Packing, TrainingCorpus}

/** Stage-level wall-clock attribution for the composed corpus-assembly
  * pipeline (p01) — which of gate-scan / decontamination / mixture /
  * packing actually owns the time at a given scale. Same spirit as
  * [[DedupProfile]]: a diagnostic main, not part of the driver
  * contract.
  *
  * Usage: runMain graft.tools.P01Profile <sfDir>
  */
object P01Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-p01profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[p01profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    val train = docs.filter(col("doc_id") % 23 =!= 0)
    val bench = docs.filter(col("doc_id") % 23 === 0)
    // sub-stage attribution: the gate scan alone, then decontamination
    // over the gated survivors, then the composed pool
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    val scored = train.select(
      col("doc_id"), col("source"),
      md5Fingerprint(col("text")).as("fp"),
      tokenCount(col("text")).as("n_tokens"),
      qualityScore(col("text")).as("quality"))
    t("scored scan only (count)")(System.err.println(s"  rows=${scored.count()}"))
    t("fp only (count)")(System.err.println("  rows=" + train.select(
      md5Fingerprint(col("text")).as("fp")).count()))
    t("quality only (count)")(System.err.println("  rows=" + train.select(
      qualityScore(col("text")).as("q")).filter(col("q") >= 0).count()))
    // (the round-9 diagnosis lives in TextFunctions.punctCounts'
    // scaladoc: the regex spelling of the punct count was ~29 s of the
    // scan; translate is sub-second with identical values)
    val kept = scored
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id") &&
        col("quality") >= TrainingCorpus.MinQuality &&
        col("n_tokens").between(TrainingCorpus.MinTokens,
          TrainingCorpus.MaxTokens))
      .select(col("doc_id"), col("source"), col("n_tokens"))
    t("gate scan (kept count)")(System.err.println(s"  rows=${kept.count()}"))
    val survivorText = train.join(
      kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
    t("decontaminate over survivors (count)") {
      System.err.println("  rows=" + graft.operators.TextAnalysis
        .decontaminate(survivorText, bench).count())
    }
    Caching.releaseAll(spark)
    val clean = t("cleanPool (scan+gates+decontam, checkpointed)") {
      TrainingCorpus.cleanPool(train, bench).localCheckpoint(true)
    }
    t("cleanPool rows")(System.err.println(s"  rows=${clean.count()}"))
    val selected = t("mixture (checkpointed)") {
      Mixture.domainMixtureCounts(clean)
        .select(col("doc_id"), col("source"), col("n_tokens"))
        .localCheckpoint(true)
    }
    t("selected rows")(System.err.println(s"  rows=${selected.count()}"))
    t("packing (count)") {
      System.err.println(s"  rows=${Packing.packCounts(selected).count()}")
    }
    Caching.releaseAll(spark)
    spark.stop()
  }
}
