package graft.tools

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

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
    val sh = Dedup.hashedShingleSets(Tables.load(spark, dir, "documents"))
    println(s"docs=${sh.count()}")
    val inv = sh.select(col("doc_id"), size(col("hs")).as("n_sh"),
      explode(col("hs")).as("h"))
    time("inv pass (explode+count)")(println(inv.count()))
    val hot = time("hot agg") {
      val h = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 64).select(col("h")).localCheckpoint(true)
      println(h.count()); h
    }
    val capped = inv.join(broadcast(hot), Seq("h"), "left_anti")
    time("self-join + pair agg") {
      val p = capped.select(col("doc_id").as("doc_a"), col("n_sh").as("na"), col("h"))
        .join(capped.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"), col("h")).hint("SHUFFLE_HASH"), "h")
        .filter(col("doc_a") < col("doc_b") &&
          least(col("na"), col("nb")) * 10 >= greatest(col("na"), col("nb")) * 8)
        .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("inter_c"))
      println(p.count())
    }
    spark.stop()
  }
}
