package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language id, quality scoring, token
  * statistics, fingerprinting). All pure-expression plans: one scan, no
  * shuffle except the final presentation sort. */
object TextAnalysis {

  // Every operator has a FRAME-parametric form (the library API: any
  // DataFrame carrying `doc_id`/`text`, plus the columns a specific
  // operator names) and a (SparkSession, dir) wrapper binding it to the
  // driver-contract benchmark table.

  /** Per-document token statistics. */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        subwordCount(col("text")).as("n_subwords"),
        length(col("text")).cast("long").as("n_chars_calc"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  def textStats(s: SparkSession, dir: String): DataFrame =
    textStats(Tables.load(s, dir, "documents"))

  /** Quality scoring: stopword ratio, punctuation ratio, composite. */
  def qualityScoring(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        stopwordRatio4(col("text")).as("stop_ratio"),
        punctRatio4(col("text")).as("punct_ratio"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  def qualityScoring(s: SparkSession, dir: String): DataFrame =
    qualityScoring(Tables.load(s, dir, "documents"))

  /** Deterministic language guess + corpus-level agreement stats. */
  def langId(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), langGuess(col("text")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_guess"))

  def langId(s: SparkSession, dir: String): DataFrame =
    langId(Tables.load(s, dir, "documents"))

  /** End-to-end curation pipeline — the flagship training-data shape:
    * score → filter (quality + length gates) → exact-dedup (keep lowest
    * doc_id per content fingerprint) → per-source corpus stats. One scan,
    * one window, one aggregation. */
  def curation(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs
      .select(
        col("doc_id"), col("source"),
        md5Fingerprint(col("text")).as("fp"),
        tokenCount(col("text")).as("n_tokens"),
        qualityScore(col("text")).as("quality"))
    scored
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id") &&
        col("quality") >= 0.5 && col("n_tokens").between(20, 400))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        // mean quality in integer ten-thousandths: per-doc quality is
        // 4-decimal, so float avg() lands exactly ON rounding boundaries
        // (sum/16 = 0.62995 …) where the SUMMATION ORDER decides the 4th
        // digit — a long sum is order-independent, so the value is
        // reproducible across engines and runs
        round(sum(round(col("quality") * 10000).cast("long"))
          / count(lit(1)).cast("double"), 0).cast("long").as("avg_quality_e4"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("source"))
  }

  def curation(s: SparkSession, dir: String): DataFrame =
    curation(Tables.load(s, dir, "documents"))

  /** Token search (the reference's inverted-index surface, SURVEY #35,
    * mapped to a tokenized-array membership predicate — at scale this
    * pairs with the materialized index below; the predicate form
    * benefits from parquet dictionary + bloom pruning). */
  /** Library form: rows of `docs` containing ANY of `anyOf` tokens OR
    * ALL of `allOf` tokens (either list may be empty; both empty
    * matches nothing). Returns the filtered frame — callers project. */
  def textSearch(docs: DataFrame, anyOf: Seq[String],
      allOf: Seq[String] = Nil): DataFrame = {
    val toks = tokens(col("text"))
    val anyPred = anyOf.map(t => array_contains(toks, t)).reduceOption(_ || _)
    val allPred =
      if (allOf.isEmpty) None
      else Some(allOf.map(t => array_contains(toks, t)).reduce(_ && _))
    val pred = (anyPred, allPred) match {
      case (Some(a), Some(b)) => a || b
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => lit(false)
    }
    docs.filter(pred)
  }

  def textSearch(s: SparkSession, dir: String): DataFrame =
    textSearch(Tables.load(s, dir, "documents"),
      anyOf = Seq("dup"), allOf = Seq("spark", "window"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** The same search through the PERSISTED inverted index
    * ([[graft.index.InvertedIndex]] — SURVEY #35's materialized form):
    * term lookups prune to token-clustered index files instead of
    * scanning the corpus, then a semi join fetches the rows. Builds the
    * index once per sf dir (cached in tmp); identical results to
    * [[textSearch]] — the oracle is the scan-form SQL. */
  def indexedSearch(s: SparkSession, dir: String): DataFrame = {
    import graft.index.InvertedIndex
    // collision-proof cache key (testdata dirs are immutable by contract
    // — TESTDATA.md; mutable tables go through index.InvertedIndex's
    // version-tracked freshness protocol instead of this cache)
    val dirKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-docidx-$dirKey"
    val success = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = success.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(success))
      InvertedIndex.buildFrame(s, Tables.load(s, dir, "documents"), "doc_id", "text", path)
    val any = InvertedIndex.lookupAt(s, path, Seq("dup"), requireAll = false)
    val both = InvertedIndex.lookupAt(s, path, Seq("spark", "window"), requireAll = true)
    val ids = any.unionByName(both).distinct().withColumnRenamed("id", "doc_id")
    Tables.load(s, dir, "documents")
      .join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // PII patterns chosen to mean the same thing in Java regex (Spark) and
  // RE2 (DuckDB oracle): character classes, bounded repetition, \b — no
  // backrefs or lookaround (RE2 has neither).
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction — scrub emails and IPs from document text, reporting
    * per-doc match counts and the redacted-content fingerprint.
    * Pure codegen expressions: one scan, no shuffle. */
  def piiRedaction(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text").as("aug"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(IpRe), lit(0))).cast("long").as("n_ips"),
        md5(regexp_replace(
          regexp_replace(col("aug"), EmailRe, "<EMAIL>"),
          IpRe, "<IP>").cast("binary")).as("redacted_fp"))
      .orderBy(col("doc_id"))

  /** Driver-contract wrapper: the benchmark corpus is synthetic and
    * PII-FREE, so every 7th doc is DETERMINISTICALLY augmented with
    * derived PII first (the DuckDB oracle builds the identical augmented
    * text) — the redaction path has real work at every SF. */
  def piiRedaction(s: SparkSession, dir: String): DataFrame =
    piiRedaction(Tables.load(s, dir, "documents")
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string")))
        .otherwise(col("text"))))

  /** Benchmark decontamination — flag training docs sharing any word
    * 5-gram with the benchmark/eval set (deterministic stand-in: every
    * 23rd doc). The benchmark shingle UNION is distinct'd and — when it
    * is actually small, the eval-suite norm — broadcast BY AQE at
    * runtime, so the training corpus streams one codegen'd hash-probe
    * pass with no corpus-side shuffle. Deliberately NO broadcast()
    * hint (same reasoning as the d04 hotPerDoc join): a hint would
    * force-broadcast an eval set of ANY size — an oversized benchmark
    * (or a misuse passing two corpora) would OOM the driver instead of
    * degrading to a shuffle join. Both directions are pinned in
    * PlanSpec. Shingle hashing uses the same fused kernel as dedup
    * ([[graft.functions.HashedShingles]]). */
  def decontaminate(trainDocs: DataFrame, benchmarkDocs: DataFrame): DataFrame = {
    def sh(df: DataFrame) = df.select(col("doc_id"),
      graft.functions.LshFunctions.hashedShingles(
        df.sparkSession, tokens(col("text")), 5).as("hs"))
    val bench = sh(benchmarkDocs).select(explode(col("hs")).as("h")).distinct()
    val train = sh(trainDocs).select(col("doc_id"), explode(col("hs")).as("h"))
    train.join(bench, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    decontaminate(docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
  }

  /** Bloom-accelerated decontamination — same contract as
    * [[decontaminate]] (and the same oracle: the final join is exact),
    * but shaped for the corpus size where even the hash-distinct'd
    * benchmark shingle set is too heavy to hash-join every corpus
    * shingle against: the benchmark set is distilled into a Bloom
    * filter built by a DISTRIBUTED partial→final aggregate
    * (`graft_bloom_agg`, ~10 bits/item ⇒ <1% false positives), whose
    * bytes ship to executors once as a literal; corpus shingles are
    * pruned by the codegen'd `graft_might_contain` probe INSIDE the
    * scan stage, so the only corpus-side rows that reach the exchange
    * are true matches plus <1% false positives — which the exact join
    * then removes. At 100 TB this turns the join's corpus-side shuffle
    * from all-shingles into matched-shingles; the bloom itself is
    * eval-set-sized (n·10 bits: 100M benchmark shingles ≈ 125 MB —
    * raise `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` past
    * its 8 MB default accordingly, as the probe-side task would for
    * Spark's own runtime filters). */
  def decontaminateBloom(trainDocs: DataFrame, benchmarkDocs: DataFrame): DataFrame = {
    def sh(df: DataFrame) = df.select(col("doc_id"),
      graft.functions.LshFunctions.hashedShingles(
        df.sparkSession, tokens(col("text")), 5).as("hs"))
    val bench = sh(benchmarkDocs).select(explode(col("hs")).as("h")).distinct()
    // both actions here are eval-set-sized, never corpus-sized
    val n = math.max(bench.count(), 1L)
    val bloomBytes = bench
      .select(call_function("graft_bloom_agg",
        xxhash64(col("h")), lit(n), lit(math.max(64L, n * 10L))).as("bf"))
      .head.getAs[Array[Byte]](0)
    val train = sh(trainDocs).select(col("doc_id"), explode(col("hs")).as("h"))
    val pruned =
      if (bloomBytes == null) train.limit(0) // empty benchmark ⇒ nothing contaminated
      else train.filter(
        call_function("graft_might_contain", lit(bloomBytes), xxhash64(col("h"))))
    pruned.join(bench, Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  def decontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    decontaminateBloom(docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
  }

  /** Graded decontamination — [[decontaminate]]'s per-doc overlap
    * FRACTION plus a threshold verdict, the way the large-model
    * training reports actually gate (a doc is contaminated when the
    * share of its distinct 5-grams found in the eval set crosses a
    * threshold, not when one shingle matches — GPT-3 appendix C /
    * PaLM-style n-gram overlap). Same plan shape as t09: the
    * benchmark shingle set AQE-broadcasts when eval-suite-sized, the
    * corpus streams one hash-probe pass, and the only additions are
    * the per-doc distinct-shingle denominator (free — the fused
    * shingle kernel already returns the distinct set) and two pure
    * projections. Threshold compare is integer-exact
    * (n_shared·5 ≥ n_total ⟺ ratio ≥ 0.2) so the verdict is
    * bit-reproducible across engines. */
  def contaminationRatio(trainDocs: DataFrame,
      benchmarkDocs: DataFrame): DataFrame = {
    def sh(df: DataFrame) = df.select(col("doc_id"),
      graft.functions.LshFunctions.hashedShingles(
        df.sparkSession, tokens(col("text")), 5).as("hs"))
    val bench = sh(benchmarkDocs).select(explode(col("hs")).as("h")).distinct()
    val train = sh(trainDocs).select(col("doc_id"),
      size(col("hs")).cast("long").as("n_total"), explode(col("hs")).as("h"))
    train.join(bench, Seq("h"))
      .groupBy(col("doc_id"), col("n_total"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"), col("n_total"),
        graft.functions.TextFunctions.ratio4(
          col("n_shared"), col("n_total")).as("overlap"),
        when(col("n_shared") * 5 >= col("n_total"), 1L).otherwise(0L)
          .as("contaminated"))
      .orderBy(col("doc_id"))
  }

  def contaminationRatio(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    contaminationRatio(docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
  }

  /** Intra-document repetition score: 1 − distinct/total word 3-grams —
    * the boilerplate/looping-text gate every curation pipeline runs.
    * One scan, pure expressions (the fused shingle kernel provides the
    * distinct count without materializing shingle strings). */
  def repetition(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        greatest(size(col("w")) - 2, lit(0)).cast("long").as("n_grams"),
        size(graft.functions.LshFunctions.hashedShingles(
          docs.sparkSession, col("w"), 3))
          .cast("long").as("n_distinct"))
      .filter(col("n_grams") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        // integer-exact 4-decimal ratio: 1 - d/g = (g-d)/g, same tie-safe
        // spelling as the quality/jaccard display columns
        graft.functions.TextFunctions.ratio4(
          col("n_grams") - col("n_distinct"), col("n_grams")).as("rep_ratio"))
      .orderBy(col("doc_id"))

  def repetition(s: SparkSession, dir: String): DataFrame =
    repetition(Tables.load(s, dir, "documents"))

  // BM25 constants (Robertson et al., TREC-3; the k1/b defaults every
  // Lucene-family engine ships)
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** BM25 ranked retrieval over the corpus for a fixed term set — the
    * scoring layer on top of the token-search surface (SURVEY #35 maps
    * the reference's inverted index; this adds the relevance ranking a
    * retrieval consumer actually wants).
    *
    * Plan shape (scale-first): per-doc term frequencies come from the
    * codegen'd `size(w) − size(array_remove(w, t))` identity — one
    * corpus scan, no per-token explode, no UDF. The corpus statistics
    * BM25 needs (N, Σdl, per-term df) reduce to a SINGLE ROW, which
    * broadcasts back over the scored scan — so the whole query is two
    * passes over the corpus with zero corpus-side shuffle at any scale
    * (the one-row cross join is a broadcast nested loop by
    * construction). idf uses the Lucene-standard
    * ln(1 + (N − df + ½)/(df + ½)) form — positive for any df, so a
    * term in >half the corpus degrades gracefully instead of scoring
    * negative.
    *
    * Determinism across engines: tf/dl/df are exact integers; Σdl is a
    * LONG sum (order-independent) cast to double only for the final
    * avgdl division; the per-term score sum runs in fixed term order on
    * both sides. The only libm call is ln() — ≤1-ulp engine drift,
    * invisible at the round(·,4) the oracle hashes. */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tf = terms.indices.map(i => col(s"tf$i"))
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(Seq(col("doc_id"), size(col("w")).cast("long").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          (size(col("w")) - size(array_remove(col("w"), t)))
            .cast("double").as(s"tf$i")
        }: _*)
    val aggs = Seq(
      count(lit(1)).cast("double").as("n"),
      sum(col("dl")).as("sumdl")) ++
      terms.indices.map(i =>
        sum(when(tf(i) > 0, 1L).otherwise(0L)).cast("double").as(s"df$i"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sumdl").cast("double") / col("n")
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      val denom = tf(i) +
        lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl)
      idf * (tf(i) * (Bm25K1 + 1)) / denom
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .filter(tf.reduce(_ + _) > 0)
      .select(col("doc_id"), round(score, 4).as("bm25"))
  }

  /** Driver binding (t11): the t06 query vocabulary, full matching set
    * ordered by doc_id (hash-stable across engines; ranking order is
    * score-tie-sensitive, so the ranked form is [[bm25TopK]] + spec). */
  def bm25Search(s: SparkSession, dir: String): DataFrame =
    bm25(Tables.load(s, dir, "documents"), Seq("spark", "window", "dup"))
      .orderBy(col("doc_id"))

  /** Ranked form: top-k by score (ties broken by doc_id so the result
    * is deterministic), the shape a retrieval caller consumes. TopK
    * compiles to TakeOrderedAndProject — per-partition heaps, no global
    * sort. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame =
    bm25(docs, terms).orderBy(col("bm25").desc, col("doc_id")).limit(k)

  /** Batch (multi-query) BM25 top-k — the serving shape: a query SET
    * scored against the corpus in ONE pass, top-k per query. Where
    * [[bm25]] hard-codes its terms into per-doc expressions, this form
    * takes queries as DATA ((query_id, term) rows), so a pipeline can
    * score thousands of queries per batch.
    *
    * Plan shape (scale-first): the corpus explodes to (doc_id, dl,
    * term) and is immediately pruned by a BROADCAST semi-join against
    * the distinct query terms — the corpus-sized stream flows through
    * a codegen'd hash probe and never shuffles; everything after
    * (per-doc tf, per-term df, per-query score, top-k window) operates
    * on the matched subset, which is query-selectivity-sized, not
    * corpus-sized. Corpus stats (N, Σdl) reduce to one broadcast row
    * off a second pure-map scan. Top-k per query is a rank window over
    * the per-query score frame with doc_id tie-break, deterministic
    * across engines (score sums are 2-term, hence order-independent
    * in IEEE doubles; cross-engine drift is the ≤1-ulp ln() as in
    * [[bm25]], far from the round(·,4) the oracle hashes).
    *
    * The query-term broadcast assumes the query SET's vocabulary fits
    * an executor (thousands of queries — the serving norm); a
    * corpus-sized query set would want the inverted-index join form
    * instead ([[graft.index.InvertedIndex]]). */
  def bm25MultiQuery(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val base = docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"), sum(col("dl")).as("sumdl"))
    val qTerms = queries.select(col("term")).distinct()
    val matched = base
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .join(broadcast(qTerms), Seq("term"), "left_semi")
    val tf = matched.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("dft"))
    val avgdl = col("sumdl").cast("double") / col("n")
    val contrib =
      log(lit(1.0) + (col("n") - col("dft") + 0.5) / (col("dft") + 0.5)) *
        (col("tf") * (Bm25K1 + 1)) /
        (col("tf") +
          lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .join(broadcast(queries), "term")
      .withColumn("c", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("sc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sc").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("sc"), 4).as("bm25"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver binding (t12): three 2-term queries over the t06
    * vocabulary, top-10 each. Two terms per query keeps the score sum
    * order-independent bit-for-bit (a+b is commutative in IEEE
    * doubles), so the per-query ranking hash-matches the oracle. */
  def bm25MultiSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Seq(
      (1L, "spark"), (1L, "window"),
      (2L, "dup"), (2L, "spark"),
      (3L, "window"), (3L, "dup")).toDF("query_id", "term")
    bm25MultiQuery(Tables.load(s, dir, "documents"), q, k = 10)
  }

  /** BM25 over the persisted [[graft.index.Bm25Index]] — identical
    * scores to [[bm25]] (same Catalyst expressions over the same
    * exact-integer tf/dl/df/N, so the indexed driver binding shares the
    * scan form's DuckDB oracle) with repeated-query cost bound by
    * POSTING LISTS, not the corpus: the term filter pushes into the
    * token-clustered postings scan, and the (n, Σdl, df…) statistics
    * row broadcasts from the persisted stats tables. The scan form's
    * `tf-sum > 0` filter is structural here — a doc enters the matched
    * frame only through one of its query-term postings. */
  def bm25FromIndex(s: SparkSession, path: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms == terms.distinct,
      "duplicate query terms would double-count in the scan form; dedup first")
    val idx = graft.index.Bm25Index
    val base = idx.matchedTf(s, path, terms)
    val statsRow = idx.statsRow(s, path, terms)
    val tf = terms.indices.map(i => col(s"tf$i"))
    val avgdl = col("sumdl").cast("double") / col("n")
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
      val denom = tf(i) +
        lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl)
      idf * (tf(i) * (Bm25K1 + 1)) / denom
    }.reduce(_ + _)
    base.crossJoin(broadcast(statsRow))
      .select(col("id").as("doc_id"), round(score, 4).as("bm25"))
  }

  /** Batch BM25 over the persisted index — [[bm25MultiQuery]]'s serving
    * form: per-(term, doc) tf and per-term df come from posting lists
    * (term filter pushed to the token-clustered scan) instead of a
    * corpus explode, so a repeated query batch costs O(matched
    * postings). The query vocabulary is collected to the driver to
    * drive scan pruning — bounded by the same fits-an-executor contract
    * the scan form's broadcast already assumes. Scores and ranking are
    * bit-identical to [[bm25MultiQuery]] (same contribution expression,
    * same order-independent per-query sums, same tie-break). */
  def bm25BatchFromIndex(s: SparkSession, path: String, queries: DataFrame,
      k: Int): DataFrame = {
    val idx = graft.index.Bm25Index
    val terms = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(terms.nonEmpty && terms.size <= 100000,
      s"query vocabulary (${terms.size}) must be non-empty and executor-sized")
    val tfFrame = idx.postings(s, path)
      .filter(col("token").isin(terms: _*))
      .select(col("id").as("doc_id"), col("dl"),
        col("token").as("term"), col("tf").cast("double").as("tf"))
    val dft = idx.termStats(s, path)
      .filter(col("token").isin(terms: _*))
      .select(col("token").as("term"), col("df").cast("double").as("dft"))
    val statsRow = idx.stats(s, path)
      .select(col("n").cast("double").as("n"), col("sumdl"))
    val avgdl = col("sumdl").cast("double") / col("n")
    val contrib =
      log(lit(1.0) + (col("n") - col("dft") + 0.5) / (col("dft") + 0.5)) *
        (col("tf") * (Bm25K1 + 1)) /
        (col("tf") +
          lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl").cast("double") / avgdl))
    val scored = tfFrame
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(statsRow))
      .join(broadcast(queries), "term")
      .withColumn("c", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("sc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sc").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("sc"), 4).as("bm25"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Content-addressed BM25 index for a dir's `documents` table, built
    * once per corpus content and reused across queries (the d07/t07
    * persisted-index precedent). */
  private def bm25IndexFor(s: SparkSession, dir: String): String = {
    val path = graft.index.IndexCache.pathFor(s, s"$dir/documents.parquet", "bm25")
    graft.index.Bm25Index.ensure(Tables.load(s, dir, "documents"), path)
    path
  }

  /** Driver binding (t14): t11's query served through the persisted
    * index — same oracle, posting-list-bound repeated cost. */
  def bm25SearchIndexed(s: SparkSession, dir: String): DataFrame =
    bm25FromIndex(s, bm25IndexFor(s, dir), Seq("spark", "window", "dup"))
      .orderBy(col("doc_id"))

  /** Driver binding (t15): t12's query batch through the persisted
    * index. */
  def bm25MultiSearchIndexed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Seq(
      (1L, "spark"), (1L, "window"),
      (2L, "dup"), (2L, "spark"),
      (3L, "window"), (3L, "dup")).toDF("query_id", "term")
    bm25BatchFromIndex(s, bm25IndexFor(s, dir), q, k = 10)
  }

  /** Per-document TF-IDF keyword extraction: the top-k terms of each
    * doc by tf·idf (idf = ln((N+1)/(df+1)), nonnegative, 0 for a term
    * in every doc) — the feature-extraction / dataset-card shape
    * (characteristic terms per document against corpus statistics).
    *
    * Plan shape: one corpus scan explodes tokens; per-(doc, term) tf is
    * a groupBy; per-term df rides a `count over Window.partitionBy
    * (term)` on the tf frame (the d11 single-pass shape — no vocab
    * join, no second corpus shuffle for df); the per-doc top-k is a
    * rank window on doc_id. Three corpus-proportional exchanges total,
    * each of slim (doc, term, counts) rows, all linear.
    *
    * Determinism: tf/df/N are exact integers; ties (equal tf AND df →
    * bit-identical score on both engines) break on term; distinct
    * (tf, df) pairs separate scores far beyond the ≤1-ulp ln() drift
    * (the s01 rank-on-double precedent). */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("s").desc, col("term"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n"))
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("df", count(lit(1)).over(wTerm).cast("double"))
      .crossJoin(broadcast(stats))
      .withColumn("s", col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)))
      .withColumn("rank", row_number().over(wDoc).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("s"), 4).as("tfidf"))
      .orderBy(col("doc_id"), col("rank"))
  }

  def keywords(s: SparkSession, dir: String): DataFrame =
    keywords(Tables.load(s, dir, "documents"))

  /** Content fingerprints: md5 (exact-dup key) + order-sensitive rolling
    * hash (cheap near-identity check for shifted content). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        md5Fingerprint(col("text")).as("fp_md5"),
        rollingFingerprint(col("text")).as("fp_roll"))
      .orderBy(col("doc_id"))

  def fingerprints(s: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.load(s, dir, "documents"))

  /** Tokenizer-vocabulary coverage table (t21): the top-`k` corpus
    * terms by occurrence count with each prefix's cumulative share of
    * ALL token occurrences — the truncation-analysis table a tokenizer
    * build reads ("how much of the corpus does a V-entry vocab cover").
    *
    * Scale shape: one explode→hash-agg over the corpus (map-side
    * combine; the only corpus-sized exchange), a TakeOrdered top-k of
    * the vocabulary-sized count table, and a single-partition window
    * over the ≤k survivors — bounded by construction, never the corpus
    * (the same bounded-frame precedent as the centroid tables). The
    * total-occurrence count rides the same scan as a one-row broadcast.
    *
    * Determinism: counts are exact integers; equal-count ties order on
    * term; coverage is the exact integer-rational [[TextFunctions.ratio4]]. */
  def vocabulary(docs: DataFrame, k: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("term"))
    val occ = docs.select(explode(tokens(col("text"))).as("term"))
    val tot = occ.agg(count(lit(1)).as("total_occ"))
    occ.groupBy(col("term")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("term")).limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_occ", sum(col("n_occ")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("term"), col("n_occ"),
        ratio4(col("cum_occ"), col("total_occ")).as("cum_coverage"))
      .orderBy(col("rank"))
  }

  def vocabulary(s: SparkSession, dir: String): DataFrame =
    vocabulary(Tables.load(s, dir, "documents"))

  /** Terms a fixed-size tokenizer vocabulary keeps: top `v` by corpus
    * occurrence count, ties on term. Driver-materialized — bounded by
    * `v` (≤ tens of thousands for any real tokenizer), the same
    * bounded-collect class as the k-means training sample. */
  private[graft] def vocabTerms(docs: DataFrame, v: Int): Seq[String] =
    docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("term")).limit(v)
      .select(col("term")).collect().map(_.getString(0)).toSeq

  /** Out-of-vocabulary quality ratio (t22): per-document fraction of
    * token occurrences falling outside the top-`v` corpus vocabulary —
    * the CCNet-style corpus-relative quality filter (a doc whose mass
    * is OOV under the corpus's own tokenizer vocab is boilerplate,
    * another language, or noise). `keep` applies the retention gate at
    * `maxOovE4` (an exact E4 integer threshold, not a float compare).
    *
    * Scale shape: the vocab build is one explode→hash-agg + top-v
    * (vocabulary-sized); scoring is then a PURE MAP — the ≤v terms
    * compile into a codegen'd set-membership filter over each row's
    * token array, so the corpus is scanned once with NO join and no
    * shuffle except the presentation sort. At 100 TB the vocab table
    * is the only thing that moves. */
  def oovRatio(docs: DataFrame, v: Int = 24,
      maxOovE4: Long = 3500L): DataFrame = {
    val vocab = vocabTerms(docs, v)
    val toks = tokens(col("text"))
    val oov = filter(toks, t => !t.isin(vocab.map(lit(_)): _*))
    docs
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(oov).cast("long").as("n_oov"))
      .withColumn("oov_ratio",
        ratio4(col("n_oov"), greatest(col("n_tokens"), lit(1L))))
      .withColumn("keep",
        (lit(10000L) * col("n_oov") <=
          lit(maxOovE4) * greatest(col("n_tokens"), lit(1L))).cast("boolean"))
      .orderBy(col("doc_id"))
  }

  def oovRatio(s: SparkSession, dir: String): DataFrame =
    oovRatio(Tables.load(s, dir, "documents"))

  /** Language-model perplexity scoring (t25) — the CCNet-style quality
    * filter (Wenzek et al., LREC 2020; the GPT-3 pipeline's quality
    * classifier plays the same role): train a bigram LM with add-one
    * smoothing on the CLEAN reference split (the benchmark docs, the
    * t09 convention — CCNet trains its LM on Wikipedia), then score
    * every training doc by its per-token negative log-likelihood.
    * High NLL = far from the clean-language distribution = candidate
    * for dropping.
    *
    *   P(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V)
    *   nll(doc) = −(Σ over the doc's bigrams ln P) / n_bigrams
    *
    * with C(·) the reference split's bigram/unigram occurrence counts
    * and V its vocabulary size. Output: (doc_id, n_bigrams, nll)
    * rounded to 4 dp (the BM25 float-compare convention).
    *
    * Scale shape — the r9 ladder measured the first cut of this plan
    * at e_xxtop 0.96 (84.4 s at 5M docs): its two LEFT joins put the
    * corpus×~40 exploded bigram frame through TWO vocabulary-keyed
    * exchanges once the LM tables outgrew AQE's broadcast threshold.
    * The restructure splits the per-bigram log-probability
    *
    *   −ln((cb+1)/(cu+V)) = ln(cu(w1)+V) − ln(cb+1)
    *
    * and exploits add-one smoothing: `ln(cb+1) = 0` for every bigram
    * ABSENT from the LM, so the bigram-count join only needs the
    * in-LM rows — the reference LM's bigram keys distill into a
    * distributed Bloom filter (the t20 `graft_bloom_agg` machinery)
    * probed INSIDE the scan stage, and only survivors (true matches
    * + <1% FPs, which the exact join removes) reach the bg join.
    * The unigram term re-bases to `(n−1)·ln(V) + Σ ln((cu+V)/V)`
    * over IN-VOCAB w1 positions only (OOV tokens contribute exactly
    * ln(V), folded into the closed-form rebase), so that join is
    * inner too, against the vocab-sized unigram table under a
    * [[Dedup.bcastOrHashIf]] budget. Net: at any corpus size the
    * only corpus-wide exchanges are the two per-doc partial→final
    * aggregates (doc-sized after map-side combine); the LM tables
    * broadcast when they fit and degrade to sized shuffled-hash
    * joins when they don't — never dragging the OOV majority of the
    * corpus through an exchange. Values unchanged: the regrouped sum
    * differs from the oracle's per-bigram order only in ulps, which
    * the shared round(…,4) convention absorbs (the BM25 precedent). */
  def lmPerplexity(trainDocs: DataFrame, referenceDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    val toks = tokens(col("text"))
    // bigram strings "w1 w2" via a codegen slide over the token array
    def bigrams(t: Column): Column =
      transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2)))
    val refToks = referenceDocs.select(explode(toks).as("tok"))
    // both LM tables materialized: each feeds a scalar action (V / the
    // bloom build) AND a scoring join — without the cut the reference
    // split tokenizes twice per table
    val uni = refToks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      .localCheckpoint(true)
    val vocabSize = uni.count().toDouble
    val bi = referenceDocs
      .select(explode(bigrams(toks)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      .localCheckpoint(true)
    val nBi = bi.count()
    val bloomBytes = bi
      .select(call_function("graft_bloom_agg", xxhash64(col("bg")),
        lit(math.max(nBi, 1L)), lit(math.max(64L, nBi * 10L))).as("bf"))
      .head().getAs[Array[Byte]](0)
    val scorable = trainDocs.filter(size(toks) >= 2)
    // per-doc bigram count straight off the token array — no explode
    val base = scorable
      .select(col("doc_id"), (size(toks) - 1).cast("long").as("n_bigrams"))
    // Σ ln(cb+1) over in-LM bigrams (OOV bigrams contribute 0): bloom
    // prune in-stage, exact inner join decides
    val trainBg = scorable
      .select(col("doc_id"), explode(bigrams(toks)).as("bg"))
    val prunedBg =
      if (bloomBytes == null) trainBg.limit(0) // empty reference LM
      else trainBg.filter(call_function("graft_might_contain",
        lit(bloomBytes), xxhash64(col("bg"))))
    val t1 = prunedBg
      .join(Dedup.bcastOrHashIf(48, nBi, Seq("bg"))(bi), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(log(col("cb") + lit(1.0))).as("s_bi"))
    // Σ ln((cu+V)/V) over in-vocab w1 positions (tokens 1..n−1); the
    // OOV positions' ln(V) lands via the n_bigrams·ln(V) rebase below
    val t2 = scorable
      .select(col("doc_id"),
        explode(slice(toks, lit(1), size(toks) - 1)).as("tok"))
      .join(Dedup.bcastOrHashIf(40, vocabSize.toLong, Seq("tok"))(uni),
        Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(log((col("cu") + lit(vocabSize)) / lit(vocabSize))).as("s_uni"))
    base
      .join(t1, Seq("doc_id"), "left_outer")
      .join(t2, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_bigrams"),
        round((coalesce(col("s_uni"), lit(0.0))
          + col("n_bigrams") * lit(math.log(vocabSize))
          - coalesce(col("s_bi"), lit(0.0))) / col("n_bigrams"), 4).as("nll"))
      .orderBy(col("doc_id"))
  }

  /** Segment-level exact dedup (t26) — CCNet's PARAGRAPH-dedup stage
    * (Wenzek et al., LREC 2020 §4.1: drop duplicated paragraphs by
    * hash before any model-based filter; the step that removes
    * boilerplate headers/navigation shared across pages), adapted to
    * the whitespace-token corpus: "paragraphs" are consecutive
    * `segTokens`-token blocks (the synthetic corpus carries no natural
    * paragraph marks), and a segment is a duplicate iff an identical
    * segment occurs at a strictly earlier global position — smaller
    * doc_id, or an earlier offset within the same document. The
    * per-doc report is what the pipeline acts on: segment count,
    * duplicated-segment count, surviving token mass.
    *
    * Scale shape: d11's single-pass window — one scan explodes
    * (doc_id, seg_idx, md5(segment), len); first-occurrence is
    * `min(pos) over Window.partitionBy(hash)`, so the corpus-sized
    * frame crosses the wire EXACTLY ONCE (the hash exchange feeding
    * the window) and the rollup is a slim per-doc shuffle. Global
    * position packs into one long (doc_id·2²⁰ + seg_idx — a ~10M-token
    * document before the packing aliases; the synthetic docs cap at
    * 400), making the window min a primitive comparison that both
    * engines evaluate identically; an assert_true guards the seg_idx
    * bound at runtime, because an aliased position would mis-attribute
    * first occurrence IDENTICALLY in the DuckDB oracle — the gate
    * cannot catch it. Segments travel as 16-byte md5 hashes, never
    * strings, past the scan. */
  def segmentDedup(docs: DataFrame, segTokens: Int = 10): DataFrame = {
    val toks = tokens(col("text"))
    val nSeg = ((size(toks) + lit(segTokens - 1)) / lit(segTokens)).cast("int")
    val segs = transform(sequence(lit(0), nSeg - 1), k =>
      struct(k.as("seg_idx"),
        md5(array_join(
          slice(toks, k * segTokens + 1, lit(segTokens)), " ")).as("h"),
        least(lit(segTokens), size(toks) - k * segTokens)
          .cast("long").as("slen")))
    docs
      .select(col("doc_id"), explode(segs).as("s"))
      .select(col("doc_id"), col("s.h").as("h"), col("s.slen").as("slen"),
        // assert_true is null on success, so the add is a no-op unless
        // a >2²⁰-segment document would alias into the next doc's range
        (col("doc_id") * lit(1L << 20) + col("s.seg_idx") +
          coalesce(assert_true(col("s.seg_idx") < lit(1L << 20)).cast("long"),
            lit(0L))).as("pos"))
      .withColumn("fp",
        min(col("pos")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("pos") =!= col("fp"), 1L).otherwise(0L)).as("n_dup_segments"),
        sum(when(col("pos") === col("fp"), col("slen")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("doc_id"))
  }

  def segmentDedup(s: SparkSession, dir: String): DataFrame =
    segmentDedup(Tables.load(s, dir, "documents"))

  /** Driver binding: reference split = every 23rd doc (the t09/p01
    * convention), training candidates the rest. */
  def lmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    lmPerplexity(docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0))
  }
}
