package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}

/** Measurement probe (optimization round): break s04/s05 into their
  * sub-steps and time each — index-metadata reads, codes scan, probe
  * join, re-rank — so the optimization targets the measured cost, not
  * the assumed one.
  *
  * Usage: runMain graft.tools.PqProfile [sfDir]
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = GraftSession.local("graft-pqprofile", cpus.toInt)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (q <- Seq("s03", "s04", "s05")) {
      val df = q match {
        case "s03" => graft.operators.Similarity.annIvf(s, sfDir)
        case "s04" => graft.operators.Similarity.annIvfPq(s, sfDir)
        case "s05" => graft.operators.Similarity.annIvfPqIndexed(s, sfDir)
      }
      println(f"[pq] recall $q = ${graft.operators.Similarity.recallVsBrute(s, sfDir, df)}%.3f")
      graft.core.Caching.releaseAll(s)
    }
    // warm the JVM/codegen once end to end
    time("warm s05 (may build index)") {
      graft.operators.Similarity.annIvfPqIndexed(s, sfDir).count()
    }
    graft.core.Caching.releaseAll(s)
    time("warm s04") {
      graft.operators.Similarity.annIvfPq(s, sfDir).count()
    }
    graft.core.Caching.releaseAll(s)

    for (round <- 1 to 2) {
      println(s"-- round $round --")
      val all = Tables.load(s, sfDir, "embeddings")
      val path = graft.index.IndexCache.pathFor(
        s, s"$sfDir/embeddings.parquet", "pqidx")
      val queries = all.filter(col("vec_id") < 5)
      time("s05 total") {
        val (cells, n) = time("  meta") {
          graft.index.PqIndex.meta(s, path)
        }
        val cents = time("  centroids collect") {
          graft.index.PqIndex.centroids(s, path)
        }
        val cb = time("  codebooks collect") {
          graft.index.PqIndex.codebooks(s, path)
        }
        val codes = s.read.parquet(s"$path/codes")
        val vecs = s.read.parquet(s"$path/vecs")
        val out = graft.operators.Similarity.pqSearch(codes, vecs, queries,
          10, cents, cb, graft.operators.Similarity.probeFor(cells),
          graft.operators.Similarity.defaultRerank(10, n), excludeSelf = true)
        time("  pqSearch count") { out.count() }
      }
      graft.core.Caching.releaseAll(s)
      time("s04 total") {
        val e = time("  withNorm ckpt") {
          graft.operators.Similarity.withNorm(s, all).localCheckpoint(true)
        }
        val n = time("  count") { all.count() }
        val cents = time("  kmeansCentroids") {
          graft.operators.Similarity.kmeansCentroids(s, e,
            graft.operators.Similarity.ivfConfig(n)._1)
        }
        val cb = time("  pqCodebooks") {
          graft.operators.Similarity.pqCodebooks(s, e, cents)
        }
        val out = time("  full s04 query") {
          graft.operators.Similarity.annIvfPq(all, queries, 10).count()
        }
        out
      }
      graft.core.Caching.releaseAll(s)
    }
    s.stop()
  }
}
