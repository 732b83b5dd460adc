package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused LSH kernels must be BIT-identical to the expression
  * compositions they replaced — candidates (and therefore results)
  * change if even one hash diverges. */
class LshKernelsSpec extends SparkSpec {

  test("MinHashSigs == array_min(transform(hs, xxhash64(lit(i), h))) slot-for-slot") {
    import spark.implicits._
    val n = 64
    // deterministic pseudo-random shingle sets incl. an empty one
    val data = (0 until 50).map { r =>
      (r.toLong, (0 until (r % 7) * 3).map(j => (r * 31L + j * 17L) ^ (j << 13)).toSeq)
    }.toDF("id", "hs")
    val kernel = data.select(col("id"),
      LshFunctions.minhashSigs(spark, col("hs"), n).as("ms"))
    val composed = data.select(col("id") +: (0 until n).map(i =>
      array_min(transform(col("hs"), h => xxhash64(lit(i), h))).as(s"m$i")): _*)
    val k = kernel.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1))
    val c = composed.orderBy("id").collect()
      .map(r => r.getLong(0) -> (1 to n).map(i => r.get(i)))
    k.zip(c).foreach { case ((ki, ks), (ci, cs)) =>
      assert(ki == ci)
      assert(ks.toSeq == cs.toSeq, s"row $ki: kernel=$ks composed=$cs")
    }
  }

  test("MinHashSigs matches the composed form on null shingle elements") {
    import spark.implicits._
    val n = 16
    // containsNull=true arrays: xxhash64 SKIPS a null arg, so the
    // composed hash for a null element is the folded seed alone — the
    // kernel must reproduce that, not read an undefined slot
    val data = Seq(
      (1L, Seq[Option[Long]](Some(7L), None, Some(99L))),
      (2L, Seq[Option[Long]](None)),
      (3L, Seq[Option[Long]](None, None, Some(-3L)))).toDF("id", "hs")
    val kernel = data.select(col("id"),
      LshFunctions.minhashSigs(spark, col("hs"), n).as("ms"))
      .orderBy("id").collect().map(r => r.getSeq[Any](1).toSeq)
    val composed = data.select(col("id") +: (0 until n).map(i =>
      array_min(transform(col("hs"), h => xxhash64(lit(i), h))).as(s"m$i")): _*)
      .orderBy("id").collect().map(r => (1 to n).map(i => r.get(i)))
    kernel.zip(composed).foreach { case (ks, cs) =>
      assert(ks == cs.toSeq, s"kernel=$ks composed=$cs")
    }
  }

  test("HashedShingles == shingle/array_join/array_distinct/xxhash64 composition") {
    import spark.implicits._
    val k = 3
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a a a a a a"), // heavy duplication → distinct matters
      (3L, "one two"), // shorter than k → empty
      (4L, ""),
      (5L, "alpha beta gamma delta alpha beta gamma delta")).toDF("id", "text")
    val toks = split(col("text"), " ")
    val kernel = docs.select(col("id"),
      LshFunctions.hashedShingles(spark, toks, k).as("hs"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq)
    val composed = docs
      .select(col("id"), toks.as("w"))
      .select(col("id"),
        graft.functions.TextFunctions.shinglesFromTokens(col("w"), k).as("sh"))
      .select(col("id"), transform(col("sh"), x => xxhash64(x)).as("hs"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq)
    kernel.zip(composed).foreach { case (ks, cs) =>
      assert(ks == cs, s"kernel=$ks composed=$cs")
    }
  }

  test("SimHashSig == explode + 64 bit-sum aggregate formulation") {
    import spark.implicits._
    val data = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, ""),
      (4L, "single")).toDF("id", "text")
    val toks = split(col("text"), " ")
    val kernel = data.select(col("id"), LshFunctions.simhashSig(spark, toks).as("sig"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val tok = data.select(col("id"), explode(toks).as("t")).withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val sim = (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
    }
    val composed = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), sim.as("sig"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kernel.toSeq == composed.toSeq)
  }
}
