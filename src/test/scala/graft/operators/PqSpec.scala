package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.{PqFunctions, PqKernel}

/** IVF-PQ ANN (s04): the candidate scan reads an 8-byte packed code
  * per vector; exactness comes from the re-rank, recall from the ADC
  * shortlist. */
class PqSpec extends SparkSpec {

  private def corpus = Tables.load(spark, Sf001, "embeddings")

  test("pq recall: ADC shortlist + exact re-rank reach >=80% of true top-10") {
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.annBrute(corpus, queries, 10)
    val pq = Similarity.annIvfPq(corpus, queries, 10)
    val r = Similarity.recallOf(exact, pq)
    info(f"ivf-pq recall: $r%.3f")
    assert(r >= 0.8, s"PQ recall too low: $r")
  }

  test("re-ranked cosines are TRUE cosines (subset of brute scores)") {
    // every (query, neighbor, cosine) the PQ path returns must carry the
    // same cosine the exact scorer computes — the approximation may only
    // change WHICH neighbors surface, never their scores
    val queries = corpus.filter(col("vec_id") < 3)
    val brute = Similarity.annBrute(corpus, queries, 200).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    Similarity.annIvfPq(corpus, queries, 10).collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach { exact =>
        assert(r.getAs[Double]("cosine") == exact,
          s"$key: pq=${r.getAs[Double]("cosine")} exact=$exact")
      }
    }
  }

  test("ADC approximates cosine within quantization error") {
    // encode + lut round-trip on real vectors: the 8×256 codebook on
    // 64-dim unit vectors should land ADC within ~0.1 of the true
    // cosine on average — loose bound, but it catches a broken packing
    // or a subspace misalignment outright
    val vecs = corpus.limit(64)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val e = vecs.withColumn("norm",
      graft.functions.VectorFunctions.norm(spark, col("v")))
    // zero centroid => residual == unit vector: exercises the same
    // kernels the query path uses, without the IVF coupling
    val cb = Similarity.pqCodebooks(spark, e, Array(Array.emptyDoubleArray))
    val rows = e.collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      val n = r.getDouble(2)
      (r.getLong(0), v, n)
    }.filter(_._3 > 0)
    val q = rows.head
    val qUnit = q._2.map(_ / q._3)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val lut = PqKernel.lut(new GenericArrayData(q._2), cb)
    val errs = rows.tail.map { case (_, v, n) =>
      val cos = v.zip(qUnit).map { case (a, b) => a / n * b }.sum
      val adc = PqKernel.adc(PqKernel.encode(new GenericArrayData(v), cb), lut)
      math.abs(cos - adc)
    }
    val mean = errs.sum / errs.length
    info(f"mean |cosine - adc| = $mean%.4f over ${errs.length} pairs")
    assert(mean < 0.1, f"ADC error too high: $mean%.4f")
  }

  test("deterministic across runs") {
    val queries = corpus.filter(col("vec_id") < 5)
    val a = Similarity.annIvfPq(corpus, queries, 10).collect().toSeq
    val b = Similarity.annIvfPq(corpus, queries, 10).collect().toSeq
    assert(a == b)
  }

  test("interpreted eval matches codegen for encode/adc") {
    // same kernel through both execution paths: a plan-level projection
    // (codegen) vs direct nullSafeEval calls on the driver
    val vecs = corpus.limit(32)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val e = vecs.withColumn("norm",
      graft.functions.VectorFunctions.norm(spark, col("v")))
    val cb = Similarity.pqCodebooks(spark, e, Array(Array.emptyDoubleArray))
    val viaPlan = vecs
      .select(col("vec_id"), PqFunctions.pqEncode(spark, col("v"), cb).as("codes"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val direct = vecs.orderBy("vec_id").collect().map { r =>
      (r.getLong(0),
        PqKernel.encode(new GenericArrayData(r.getSeq[Double](1).toArray), cb))
    }
    assert(viaPlan.toSeq == direct.toSeq)
  }

  test("codes frame is slim: the probe join input carries no raw vectors") {
    val queries = corpus.filter(col("vec_id") < 5)
    val plan = Similarity.annIvfPq(corpus, queries, 10)
      .queryExecution.executedPlan.toString
    // the ADC scorer must run over the packed-long codes column; raw
    // vectors may appear only in the bounded re-rank joins
    assert(plan.contains("graft_pq_adc"))
    assert(plan.contains("graft_pq_encode"))
  }
}
