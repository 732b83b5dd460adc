package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Domain mixture ([[Mixture.domainMixture]] / [[Mixture.mixtureEpochs]]):
  * the grouped two-phase prefix sum must equal the sequential per-source
  * take-until-budget definition exactly, and no domain's corpus-sized
  * frame may meet a single-partition window. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Sequential reference: per-source shuffle-ordered take-until-budget
    * with the exact integer allocation formula. */
  private def reference(sfDir: String, targetPct: Long)
      : Seq[(String, Long, Long, Long)] = {
    val rows = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long"))
      .as[(Long, String, Long)].collect()
    val wt = rows.map(_._2).distinct.map(s => s -> (1L + s.drop(3).toLong % 5L)).toMap
    val tot = rows.map(_._3).sum
    val wsum = wt.values.sum
    val allocOf = wt.map { case (s, w) => s -> tot * targetPct / 100L * w / wsum }
    rows.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy(d => md5hex(d._1.toString)).flatMap { case (id, _, n) =>
        val keep = cum < allocOf(src)
        val row = (src, id, n, cum)
        cum += n
        if (keep) Some(row) else None
      }
    }.sortBy(r => (r._1, r._2))
  }

  test("selection equals the sequential per-source take-until-budget") {
    val got = Mixture.domainMixture(Tables.load(spark, Sf0001, "documents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === reference(Sf0001, Mixture.DefaultTargetPct))
  }

  test("temperature mixture equals the sequential √share-weighted reference") {
    val rows = Tables.load(spark, Sf0001, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long"))
      .as[(Long, String, Long)].collect()
    val bySrc = rows.groupBy(_._2)
    val srcTok = bySrc.map { case (s, ds) => s -> ds.map(_._3).sum }
    val tot = rows.map(_._3).sum
    val wtE4 = srcTok.map { case (s, st) =>
      s -> math.round(math.sqrt(st.toDouble / tot.toDouble) * 10000)
    }
    val wsum = wtE4.values.sum
    val allocOf = wtE4.map { case (s, w) => s -> tot * 50L / 100L * w / wsum }
    val expected = bySrc.toSeq.flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy(d => md5hex(d._1.toString)).flatMap { case (id, _, n) =>
        val keep = cum < allocOf(src)
        val row = (src, id, n, cum)
        cum += n
        if (keep) Some(row) else None
      }
    }.sortBy(r => (r._1, r._2))
    val got = Mixture.temperatureMixture(Tables.load(spark, Sf0001, "documents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    // T=2 does what it exists for: the weight RATIO between any two
    // sources is the square root of their token-share ratio — small
    // sources end up upweighted relative to proportional sampling
    val st = srcTok.toSeq.sortBy(_._2)
    val (loS, loT) = st.head
    val (hiS, hiT) = st.last
    if (hiT > loT)
      assert(wtE4(hiS).toDouble / wtE4(loS) < hiT.toDouble / loT,
        "temperature weights failed to compress the share ratio")
  }

  test("every source fills its allocation with overshoot under one document") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val sel = Mixture.domainMixture(docs)
    val eps = Mixture.mixtureEpochs(docs)
    val perSrc = sel.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("kept"), max(col("n_tokens")).as("mx"))
      .join(eps.select(col("source"), col("src_tokens"), col("alloc")), Seq("source"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach { r =>
      val (kept, mx, natural, alloc) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // kept mass reaches the allocation (or the whole source when the
      // mixture oversamples it), and never overshoots by a full document
      assert(kept >= math.min(alloc, natural))
      assert(kept < alloc + mx || kept == natural)
    }
  }

  test("epochs: 1 when the allocation fits, ≥2 when the mixture oversamples") {
    // the driver binding: 150% token target, the regime epochs exist for
    val eps = Mixture.mixtureEpochs(spark, Sf0001).collect()
    assert(eps.length === 20)
    eps.foreach { r =>
      val (natural, alloc, epochs) = (r.getLong(2), r.getLong(4), r.getLong(5))
      if (alloc <= natural) assert(epochs === 1L)
      else assert(epochs >= 2L && (epochs - 1L) * natural < alloc
        && epochs * natural >= alloc)
    }
    // the weight spread (wt ∈ 1..5 over near-uniform sources) must
    // actually produce both regimes, or the test above is vacuous
    assert(eps.exists(_.getLong(5) === 1L))
    assert(eps.exists(_.getLong(5) >= 2L))
  }

  test("no corpus-sized single-partition window in the plan") {
    val plan = Mixture.domainMixture(Tables.load(spark, Sf0001, "documents"))
      .queryExecution.executedPlan.toString
    // the corpus window partitions by (source, pid); the only
    // single-partition work is the tiny totals frame + presentation sort
    assert(plan.contains("hashpartitioning(source"))
    // the bucket id must be the deterministic hex-prefix expression,
    // never spark_partition_id over a (per-subtree-sampled) range
    // exchange — see the Mixture scaladoc for the measured failure
    assert(!plan.contains("SPARK_PARTITION_ID"))
  }

  test("deterministic across runs") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val a = Mixture.domainMixture(docs).collect().toSeq
    val b = Mixture.domainMixture(docs).collect().toSeq
    assert(a === b)
  }
}
