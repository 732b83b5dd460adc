package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries against arbitrary SF
  * dirs without running the whole Bench/ScalingBench suites.
  *
  *   sbt "runMain graft.tools.QuickTime <query> <dir> [<query> <dir> ...]"
  *
  * Each (query, dir) pair runs once with [[graft.core.Caching.releaseAll]]
  * at the boundary (same block hygiene as the recorded suites); a pair
  * can repeat to observe warm-cache variance. */
object QuickTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length % 2 == 0,
      "usage: QuickTime <query> <dir> [<query> <dir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = graft.core.GraftSession
      .builder("graft-quicktime", cpus)
      .master(s"local[$cpus]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.grouped(2).foreach { case Array(name, dir) =>
      val t0 = System.nanoTime()
      val res =
        try name match {
          // "recall:<s02_ann_lsh|s03_ann_ivf>" → mean recall vs brute
          case s if s.startsWith("recall:") =>
            val df = s.stripPrefix("recall:") match {
              case "s02_ann_lsh" => graft.operators.Similarity.annLsh(spark, dir)
              case "s03_ann_ivf" => graft.operators.Similarity.annIvf(spark, dir)
              case other => sys.error(s"no recall target $other")
            }
            f"recall=${graft.operators.Similarity.recallVsBrute(spark, dir, df)}%.3f"
          // "explain:<query>" → executed (AQE-final) formatted plan
          case s if s.startsWith("explain:") =>
            val q = s.stripPrefix("explain:")
            val fn = graft.SparkEntry.queries.getOrElse(q, graft.ScalingBench.Extra(q))
            val df = fn(spark, dir)
            val n = df.count() // materialize so AQE finalizes the plan
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            s"rows=$n (plan above)"
          case _ =>
            val fn = graft.SparkEntry.queries.getOrElse(name, graft.ScalingBench.Extra(name))
            s"rows=${fn(spark, dir).count()}"
        }
        catch { case e: Throwable => s"FAILED: ${e.getMessage}" }
      println(f"QT $name @ $dir: ${(System.nanoTime() - t0) / 1e9}%.1f s $res")
      graft.core.Caching.releaseAll(spark)
    }
    spark.stop()
  }
}
