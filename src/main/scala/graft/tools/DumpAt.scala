package graft.tools

import graft.core.GraftSession

/** Dumps named SparkEntry queries to parquet at an ARBITRARY scale
  * directory — the raw material for DuckDB cross-checks at corpus
  * sizes the driver's sf0.01 gate never exercises. This exists because
  * of a class of defect the small-SF gate is structurally blind to:
  * plans whose correctness depends on sampled physical properties
  * (range-exchange boundaries) are exact while the sampler sees every
  * row and silently wrong past that — the t17 mixture bug was caught
  * ONLY by `DumpAt` + DuckDB at the synthesized sf10
  * (tools/check_oracle.py compares; see SCALING.md).
  *
  * Usage: runMain graft.tools.DumpAt <sfDir> <outDir> <query> [query…]
  */
object DumpAt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpAt <sfDir> <outDir> <query>...")
    val (sfDir, outDir) = (args(0), args(1))
    val spark = GraftSession.local("graft-dumpat",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      System.err.println(s"[dumpat] wrote $outDir/$name")
    }
    spark.stop()
  }
}
