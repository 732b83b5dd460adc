package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Token-window chunking (t19). */
class ChunkingSpec extends SparkSpec {

  private def docs = Tables.load(spark, Sf0001, "documents")

  test("windows tile every document: coverage, stride, and tail clamp") {
    val chunks = Chunking.tokenChunks(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == toks.keySet) // every doc chunked, even short ones
    chunks.foreach { case (id, cs) =>
      val n = toks(id)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") == i)
        assert(c.getAs[Long]("start_tok") == i * Chunking.Stride)
        assert(c.getAs[Long]("n_chunk_tokens") ==
          math.min(Chunking.Win, n - i * Chunking.Stride))
      }
      // the last window reaches the end of the document; one more would
      // start past a full window's worth of new tokens
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + Chunking.Win >= n)
      if (sorted.length > 1)
        assert(sorted(sorted.length - 2).getAs[Long]("start_tok") + Chunking.Win < n)
    }
  }

  test("fingerprints match a driver-side sequential chunker") {
    val expect = docs.select(col("doc_id"), col("text")).collect().flatMap { r =>
      val toks = r.getString(1).split(" ", -1)
      val n = toks.length
      val nchunks = if (n <= 32) 1 else (n - 32 + 23) / 24 + 1
      (0 until nchunks).map { i =>
        val s = i * 24
        val win = toks.slice(s, math.min(s + 32, n)).mkString(" ")
        ((r.getLong(0), i.toLong),
          java.security.MessageDigest.getInstance("MD5").digest(win.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
      }
    }.toMap
    val got = Chunking.tokenChunks(docs).collect().map { c =>
      ((c.getAs[Long]("doc_id"), c.getAs[Long]("chunk_idx")),
        c.getAs[String]("chunk_md5"))
    }.toMap
    assert(got == expect)
  }

  test("plan: chunks are produced where the doc row lives (no corpus shuffle)") {
    val plan = Chunking.tokenChunks(docs).queryExecution.executedPlan.toString
    // explode(sequence) + projection only; the single range exchange is
    // the presentation sort
    assert(plan.contains("Generate explode"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty)
  }

  test("deterministic across runs") {
    val a = Chunking.tokenChunks(docs).collect().toSeq
    val b = Chunking.tokenChunks(docs).collect().toSeq
    assert(a == b)
  }
}
