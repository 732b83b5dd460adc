package graft.tools

import java.nio.file.{Files, Paths}

import graft.core.GraftSession

/** Optimization-round plan snapshots: write `.explain("formatted")` for a
  * list of bench queries to `<outDir>/<name>_<suffix>.txt` — the
  * before/after plan evidence the round's writeup points at.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-explain", 8)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.benchQueries.getOrElse(name,
        graft.ScalingBench.Extra(name))
      val df = fn(spark, sfDir)
      // initial plan (pre-execution AQE) — the shape explain("formatted")
      // reports; executed plan after collect for the AQE-final shape
      val sb = new StringBuilder
      sb.append(s"== $name @ $sfDir ==\n\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      df.collect()
      sb.append("\n\n== AQE-final executed plan ==\n\n")
      sb.append(df.queryExecution.executedPlan.toString)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), sb.toString)
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      graft.core.Caching.releaseAll(spark)
    }
    spark.stop()
  }
}
