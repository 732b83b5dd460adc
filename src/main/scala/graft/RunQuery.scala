package graft

import graft.core.GraftSession

/** Dev utility: run a single SparkEntry query and show its result + plan.
  * Usage: runMain graft.RunQuery <name> [sfDir] [--explain] */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-dev", 8)
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    if (args.contains("--show")) df.show(30, truncate = false)
    println(f"[runquery] $name rows=$n elapsed=$elapsed%.2fs")
    spark.stop()
  }
}
