package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Scale-proof harness for the dedup/ANN suite and the headline
  * queries: times each query across a 1000× data range (sf0.001 →
  * sf0.01 → sf0.1 → a locally synthesized sf1) and reports per-decade
  * scaling exponents e = log10(t_hi / t_lo) — e ≈ 1 is linear, e ≫ 1
  * super-linear. The plans argue "bounded fan-out / no cross product";
  * this MEASURES it across 10× data steps.
  *
  * sf1 synthesis (deterministic, hash-derived, no RNG): 10 copies of
  * the sf0.1 tables with per-copy transforms that PRESERVE each copy's
  * internal near-dup structure while destroying cross-copy similarity
  * — so result sizes and candidate rates grow ~linearly, like a real
  * 10× corpus, instead of quadratically, like naive replication:
  *  - documents: per-copy token bijection (token → hash(token, copy));
  *    jaccard is set-algebra, so within-copy pair jaccard is preserved
  *    exactly while cross-copy token sets are disjoint.
  *  - embeddings: per-copy deterministic sign flip per dimension (a
  *    diagonal orthogonal transform — within-copy cosines EXACT;
  *    cross-copy cosines ~N(0, 1/√dims), far below every threshold).
  *  - events: id/user offsets per copy, timestamps kept (the b-suite's
  *    time windows must keep selecting the same fraction).
  * Unscaled dimension/fact tables are file-copied so view registration
  * still finds all 10 tables.
  */
object ScalingBench {

  private val Measured = Seq(
    "b01_simple_count", "b02_hourly_distinct", "b03_count_distinct",
    "d01_dedup_exact", "d02_minhash_lsh", "d03_simhash",
    "d04_ngram_jaccard", "d05_embedding_neardup",
    "d06_embedding_neardup_prod", "s02_ann_lsh", "s03_ann_ivf")

  /** The sf10 decade measures only the queries whose sf0.1→sf1
    * exponents were the highest (d02 0.77, s02 0.93) plus the two
    * embedding near-dup configs they bracket — one more decade answers
    * "does the trend hold" for the at-risk plans without re-running the
    * whole suite at 100× test SF. */
  private val MeasuredSf10 = Seq(
    "d02_minhash_lsh", "d05_embedding_neardup",
    "d06_embedding_neardup_prod", "s02_ann_lsh")

  private[graft] def ensureSf1(spark: SparkSession, src: String, out: String,
      copies: Int = 10): Unit = {
    val done = new java.io.File(out, "_DONE")
    if (done.exists()) return
    new java.io.File(out).mkdirs()
    val ks = 0 until copies

    val docs = spark.read.parquet(s"$src/documents.parquet")
    ks.map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(lit("w"), pmod(xxhash64(x, lit(k)), lit(1000000L)))),
          " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    ks.map { k =>
      if (k == 0) emb
      else emb.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> x * CASE WHEN " +
          s"pmod(xxhash64(i, $k), 2) = 0 THEN cast(1.0 AS float) " +
          "ELSE cast(-1.0 AS float) END)").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events.ts reads as long nanos (nanosAsLong) and writes back as
    // plain INT64 — Tables.load converts either encoding identically
    val ev = spark.read.parquet(s"$src/events.parquet")
    ks.map { k =>
      if (k == 0) ev
      else ev.select(
        (col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // remaining tables: straight file copies (registerAll needs all 10)
    graft.core.Tables.All
      .filterNot(Set("documents", "embeddings", "events"))
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$src/$t.parquet"),
          java.nio.file.Paths.get(s"$out/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    done.createNewFile()
    ()
  }

  /** sf10 = 10 similarity-preserved copies of the synthesized sf1, for
    * `documents` and `embeddings` only (the sf10 decade measures the
    * dedup/ANN suite alone).
    *
    * The per-copy seeds live in a DIFFERENT namespace (1000+k) than the
    * sf0.1→sf1 step's (k). This is load-bearing for the embeddings: a
    * sign-flip mask is its own inverse, so with a shared namespace,
    * copy k ∘ sub-copy j and copy j ∘ sub-copy k would compose to the
    * SAME total mask — two sub-corpora of identical vectors under
    * different vec_ids, i.e. millions of fake cosine-1.0 "near-dups"
    * that a real 100× corpus would not contain. Independent masks make
    * such a collision a 2^-dims event. Same reasoning for the token
    * bijection (hash-composition namespaces stay disjoint). Unscaled
    * tables come from the sf0.1 testdata files so `registerAll` still
    * resolves every view. */
  private[graft] def ensureSf10(spark: SparkSession, sf1: String, out: String,
      auxSrc: String, copies: Int = 10): Unit = {
    val done = new java.io.File(out, "_DONE")
    if (done.exists()) return
    new java.io.File(out).mkdirs()
    val ks = 0 until copies

    val docs = spark.read.parquet(s"$sf1/documents.parquet")
    ks.map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * 10000000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          x => concat(lit("w"), pmod(xxhash64(x, lit(1000 + k)), lit(1000000L)))),
          " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$sf1/embeddings.parquet")
    ks.map { k =>
      if (k == 0) emb
      else emb.select(
        (col("vec_id") + lit(k * 10000000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> x * CASE WHEN " +
          s"pmod(xxhash64(i, ${1000 + k}), 2) = 0 THEN cast(1.0 AS float) " +
          "ELSE cast(-1.0 AS float) END)").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    graft.core.Tables.All
      .filterNot(Set("documents", "embeddings"))
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$auxSrc/$t.parquet"),
          java.nio.file.Paths.get(s"$out/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    done.createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val spark: SparkSession = GraftSession
      .builder("graft-scaling", cpus)
      .master(s"local[$cpus]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ensureSf1(spark, "/root/testdata/sf0.1", sf1Dir)
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/tmp/graft_sf10")
    ensureSf10(spark, sf1Dir, sf10Dir, "/root/testdata/sf0.1")
    val dirs = Seq(
      "0.001" -> "/root/testdata/sf0.001",
      "0.01" -> "/root/testdata/sf0.01",
      "0.1" -> "/root/testdata/sf0.1",
      "1" -> sf1Dir,
      "10" -> sf10Dir)

    // JIT/codegen warmup (same rationale as Bench)
    Measured.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    val times = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.LinkedHashMap[String, Double]]()
    dirs.foreach { case (sf, dir) =>
      graft.core.Tables.registerAll(spark, dir)
      (if (sf == "10") MeasuredSf10 else Measured).foreach { name =>
        def once(): Double = {
          val t0 = System.nanoTime()
          try { SparkEntry.queries(name)(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[scaling] $name@$sf failed: ${e.getMessage}"); -1.0 }
        }
        val a = once(); val b = once()
        val best = if (a < 0 || b < 0) math.max(a, b) else math.min(a, b)
        times.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap[String, Double]()).put(sf, best)
        System.err.println(f"[scaling] $name @ sf$sf: $best%.3f s")
      }
    }

    val json = times.map { case (name, m) =>
      def e(lo: String, hi: String): String =
        (for { a <- m.get(lo); b <- m.get(hi) if a > 0 && b > 0 }
          yield f"${math.log10(b / a)}%.2f").getOrElse("null")
      val ts = m.map { case (sf, t) => f""""sf$sf":$t%.3f""" }.mkString(",")
      val xtop = if (m.contains("10")) s""","e_xtop":${e("1", "10")}""" else ""
      s""""$name":{$ts,"e_mid":${e("0.01", "0.1")},"e_top":${e("0.1", "1")}$xtop}"""
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"scaling","unit":"sec/decade-exponent","queries":$json}"""
    println(line)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "SCALING_r06.json")
    val pw = new java.io.PrintWriter(outFile)
    try pw.println(line) finally pw.close()
    spark.stop()
  }
}
