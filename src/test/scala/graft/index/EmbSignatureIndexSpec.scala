package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.operators.Dedup

class EmbSignatureIndexSpec extends SparkSpec {
  import spark.implicits._

  private def planted =
    Dedup.plantedDropCorpus(Tables.load(spark, Sf001, "embeddings"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("incremental emb pairs equal the batch pair set restricted to the delta") {
    val emb = planted
    val isDelta = col("vec_id") % 3 === 0
    val dir = tmpDir("graft-embidx-spec")
    EmbSignatureIndex.build(emb.filter(!isDelta), dir, emb.count())
    val incr = pairSet(Dedup.incrementalEmbPairs(emb.filter(isDelta), dir))
    val batch = pairSet(
      Dedup.embeddingNearDup(emb, Dedup.ProductionEmbTau)
        .filter(col("vec_a") % 3 === 0 || col("vec_b") % 3 === 0))
    assert(incr === batch)
  }

  test("append: a second batch sees the first as corpus") {
    val emb = planted
    // pmod, not %: planted ids are negative and Scala's % would leave
    // remainder −1/−2 rows out of every batch (an incomplete split)
    val b0 = emb.filter(pmod(col("vec_id"), lit(3)) === 1) // initial corpus
    val b1 = emb.filter(pmod(col("vec_id"), lit(3)) === 2) // first batch
    val b2 = emb.filter(pmod(col("vec_id"), lit(3)) === 0) // second batch
    val dir = tmpDir("graft-embidx-append")
    EmbSignatureIndex.build(b0, dir, emb.count())
    EmbSignatureIndex.append(b1, dir)
    val (_, n) = EmbSignatureIndex.meta(spark, dir)
    assert(n === b0.count() + b1.count())
    val incr = pairSet(Dedup.incrementalEmbPairs(b2, dir))
    val batch = pairSet(
      Dedup.embeddingNearDup(emb, Dedup.ProductionEmbTau)
        .filter(pmod(col("vec_a"), lit(3)) === 0 || pmod(col("vec_b"), lit(3)) === 0))
    assert(incr === batch)
  }

  test("depth-drift policy: growth past a doubling rebuilds at deeper bits") {
    val emb = planted
    val dir = tmpDir("graft-embidx-drift")
    val n = emb.count()
    EmbSignatureIndex.build(emb, dir, n) // small corpus → 16-bit floor
    assert(EmbSignatureIndex.meta(spark, dir)._1 === 16)
    // same index asked to serve a projected corpus past the floor's
    // doubling boundary: ensure() must rebuild at the deeper depth
    val projected = 1L << 17 // adaptiveEmbBits → 18
    val bits = EmbSignatureIndex.ensure(emb, dir, projected)
    assert(bits === 18)
    assert(EmbSignatureIndex.meta(spark, dir)._1 === 18)
    // and a projection the current depth already covers is a no-op
    val before = EmbSignatureIndex.meta(spark, dir)
    assert(EmbSignatureIndex.ensure(emb, dir, projected) === 18)
    assert(EmbSignatureIndex.meta(spark, dir) === before)
  }
}
