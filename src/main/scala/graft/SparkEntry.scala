package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Approx, Chunking, Dedup, Mixture, Packing, Relational, RelationalSql, SemanticDedup, Sharding, Similarity, TextAnalysis, TrainingCorpus}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one operator/capability from SURVEY.md §2
  * expressed as a Spark plan over the driver-provided parquet tables; the
  * matching key in [[oracleSql]] is the ANSI-SQL equivalent the driver
  * runs in DuckDB over the same files. Column names and value rounding
  * are kept identical on both sides (the driver hash-compares values
  * after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_filter_project"  -> (Relational.filterProject _),
    "q03_join_agg"        -> (Relational.joinAgg _),
    "q04_star_join"       -> (Relational.starJoin _),
    "q05_topn"            -> (Relational.topN _),
    "q06_window"          -> (Relational.windowFuncs _),
    "q07_distinct_agg"    -> (Relational.distinctAgg _),
    "q08_time_bucket"     -> (Relational.timeBucket _),
    "q09_cte"             -> (Relational.cteTopSpenders _),
    "q10_scalar_subquery" -> (Relational.scalarSubquery _),
    "q11_set_ops"         -> (Relational.setOps _),
    "q12_scalar_funcs"    -> (Relational.scalarFuncs _),
    "q13_grouping_sets"   -> (Relational.groupingSets _),
    "q14_having"          -> (Relational.havingFilter _),
    "q15_exists_semi"     -> (Relational.existsSemi _),
    "q16_not_exists_anti" -> (Relational.notExistsAnti _),
    "q17_like_in_between" -> (Relational.likeInBetween _),
    "q18_string_agg"      -> (Relational.stringAgg _),
    "q19_avg_decompose"   -> (Relational.avgDecompose _),
    "q20_date_parts"      -> (Relational.dateParts _),
    "q21_json_extract"    -> (Relational.jsonExtract _),
    "q22_range_join"      -> (Relational.rangeJoin _),
    "q23_point_lookup"    -> RelationalSql.q(RelationalSql.pointLookup),
    "q24_window_nav"      -> RelationalSql.q(RelationalSql.windowNavigation),
    "q25_cond_pivot"      -> RelationalSql.q(RelationalSql.conditionalPivot),
    "q26_correlated_subq" -> RelationalSql.q(RelationalSql.correlatedSubquery),
    "q27_date_arith"      -> RelationalSql.q(RelationalSql.dateArithmetic),
    "q28_math_funcs"      -> RelationalSql.q(RelationalSql.mathFuncs),
    "q29_string_funcs"    -> RelationalSql.q(RelationalSql.stringFuncs),
    "q30_nested_agg_subq" -> RelationalSql.q(RelationalSql.nestedAggSubquery),
    "q31_asof_join"       -> (Relational.asofJoin _),
    "q32_percentiles"     -> RelationalSql.q(RelationalSql.percentiles),
    "q33_stratified_sample" -> RelationalSql.q(RelationalSql.stratifiedSample),
    // the reference's own benchmark shapes (BASELINE.md targets)
    "b01_simple_count"    -> RelationalSql.q(RelationalSql.baselineSimpleCount),
    "b02_hourly_distinct" -> RelationalSql.q(RelationalSql.baselineHourlyDistinct),
    "b03_count_distinct"  -> RelationalSql.q(RelationalSql.baselineCountDistinct),
    // training-data pipeline: text analysis
    "t01_text_stats"      -> (TextAnalysis.textStats _),
    "t02_quality_scoring" -> (TextAnalysis.qualityScoring _),
    "t03_lang_id"         -> (TextAnalysis.langId _),
    "t04_fingerprints"    -> (TextAnalysis.fingerprints _),
    "t05_curation"        -> (TextAnalysis.curation _),
    "t06_text_search"     -> (TextAnalysis.textSearch _),
    "t07_indexed_search"  -> (TextAnalysis.indexedSearch _),
    "t08_pii_redaction"   -> (TextAnalysis.piiRedaction _),
    "t09_decontamination" -> (TextAnalysis.decontaminate _),
    "t10_repetition"      -> (TextAnalysis.repetition _),
    "t11_bm25_search"     -> (TextAnalysis.bm25Search _),
    "t12_multiquery_search" -> (TextAnalysis.bm25MultiSearch _),
    "t13_keyword_tfidf"   -> (TextAnalysis.keywords _),
    // t11/t12 served through the persisted BM25 postings index (same
    // oracles — the indexed path must reproduce the scan path exactly)
    "t14_bm25_index"      -> (TextAnalysis.bm25SearchIndexed _),
    "t15_batch_bm25_index" -> (TextAnalysis.bm25MultiSearchIndexed _),
    // training-data pipeline: deduplication
    "d01_dedup_exact"     -> (Dedup.exact _),
    "d02_minhash_lsh"     -> (Dedup.minhashLsh _),
    "d03_simhash"         -> (Dedup.simhash _),
    "d04_ngram_jaccard"   -> (Dedup.ngramJaccard _),
    "d05_embedding_neardup" -> (Dedup.embeddingNearDup _),
    "d06_embedding_neardup_prod" -> (Dedup.embeddingNearDupHi _),
    "d07_incremental_neardup" -> (Dedup.incrementalNearDup _),
    "d08_dedup_clusters"  -> (Dedup.dedupClusters _),
    "d09_emb_dedup_clusters" -> (Dedup.embDedupClusters _),
    "d10_dedup_survivors" -> (Dedup.dedupSurvivors _),
    "d11_substring_dedup" -> (Dedup.substringDedup _),
    "d12_joint_survivors" -> (Dedup.jointSurvivors _),
    "d13_incremental_emb_neardup" -> (Dedup.incrementalEmbNearDup _),
    // d08's decision maintained incrementally: corpus clusters from a
    // persisted index + one delta-sized contracted-CC merge
    "d14_incremental_clusters" -> (Dedup.incrementalClusters _),
    // SemDeDup: k-means-cell-scoped semantic redundancy pruning, keep
    // lowest-centroid-similarity member. Oracle-checked as of r14:
    // Verify exports the trained centroids and DuckDB re-derives
    // assignment + pairing + the keep policy (oracleExports)
    "d15_semantic_dedup"  -> (SemanticDedup.semanticDedup _),
    // training-data pipeline: sequence packing (corpus → fixed-budget
    // training sequences)
    "t16_sequence_packing" -> (Packing.sequencePacking _),
    // training-data pipeline: domain-weighted mixture (re-sample the
    // corpus to a target per-source token mixture) + oversampling epochs
    "t17_domain_mixture"  -> (Mixture.domainMixture _),
    "t18_mixture_epochs"  -> (Mixture.mixtureEpochs _),
    // training-data pipeline: context-window chunking (docs -> fixed
    // token windows with overlap)
    "t19_token_chunks"    -> (Chunking.tokenChunks _),
    // t09 served through a distributed-built bloom prune (same oracle —
    // the exact join removes the bloom's false positives)
    "t20_bloom_decontamination" -> (TextAnalysis.decontaminateBloom _),
    // graded decontamination: per-doc overlap fraction + threshold gate
    "t23_contamination_ratio" -> (TextAnalysis.contaminationRatio _),
    // training-data pipeline: tokenizer-vocabulary coverage + the
    // corpus-relative OOV quality gate derived from it
    "t21_vocab_coverage"  -> (TextAnalysis.vocabulary _),
    "t22_oov_ratio"       -> (TextAnalysis.oovRatio _),
    // training-data pipeline: deterministic seeded shuffle + round-robin
    // shard assignment (the corpus → data-loader export step)
    "t24_shard_export"    -> (Sharding.shardExport _),
    // CCNet-style LM-perplexity quality scoring: bigram LM with
    // add-one smoothing trained on the clean benchmark split, training
    // docs scored by per-token negative log-likelihood
    "t25_lm_perplexity"   -> (TextAnalysis.lmPerplexity _),
    // CCNet-style paragraph dedup over 10-token segments: first global
    // occurrence survives, per-doc dup/kept-token report
    "t26_segment_dedup"   -> (TextAnalysis.segmentDedup _),
    // temperature-scaled (T=2) source mixture: weights ∝ √token-share
    // in E4 fixed-point, allocations exact integer arithmetic
    "t27_temperature_mixture" -> (Mixture.temperatureMixture _),
    // the composed pipeline as ONE oracle-exact query: exact dedup →
    // quality gate → decontamination → mixture → packing
    "p01_training_corpus" -> (TrainingCorpus.assemble _),
    // p01 maintained INCREMENTALLY against a persisted pool index
    // (delta-proportional text cost) — by contract it must equal the
    // full recompute, so the oracle is p01's verbatim (d14 precedent)
    "p02_incremental_corpus" -> (TrainingCorpus.incrementalAssemble _),
    // p01 with a minhash-LSH NEAR-dup stage between the gates and
    // decontamination — the published-corpus pipeline shape (GPT-3
    // fuzzy dedup); oracle composes the d10 recursive-CTE closure
    // into p01's WITH-chain
    "p03_fuzzy_corpus"    -> (TrainingCorpus.assembleFuzzy _),
    // p03 maintained INCREMENTALLY against a persisted fuzzy pool
    // index (gated pool + LSH signature index + near-dup edge graph +
    // cluster frame): delta-proportional signing/probing, affected-
    // component-only CC maintenance, exact-dup retraction honored —
    // by contract equals the full fuzzy recompute, so the oracle is
    // p03's verbatim (the p02/d14 precedent)
    "p04_incremental_fuzzy" -> (TrainingCorpus.incrementalAssembleFuzzy _),
    // p01 under the TEMPERATURE mixture: t27's √share weights replace
    // the hand-weight table inside the composed assembly
    "p05_temperature_corpus" -> (TrainingCorpus.assembleTemperature _),
    // training-data pipeline: similarity search. s02–s05 are the
    // CHECKED forms as of r17 (oracle-green via the recall
    // bound-assertion: per query, recall vs the exact brute top-k +
    // the 0/1 above-floor gate; the oracle re-derives recall in SQL
    // from the exported approx neighbor sets against its own brute
    // top-k and pins the gate to 1). The raw top-k serving paths stay
    // the library API and the BENCH/SCALING timing forms
    // ([[benchQueries]]) so ladder rows remain cross-round comparable.
    "s01_ann_brute"       -> (Similarity.annBrute _),
    "s02_ann_lsh"         -> (Similarity.annLshChecked _),
    "s03_ann_ivf"         -> (Similarity.annIvfChecked _),
    "s04_ann_ivfpq"       -> (Similarity.annIvfPqChecked _),
    // s04 served from the persisted cell-partitioned PQ index (same
    // plan tail - the indexed path reproduces the batch path)
    "s05_ann_pq_index"    -> (Similarity.annIvfPqIndexedChecked _),
    // approximate/sketch operators — oracle-green as of r17 via the
    // bound-assertion encoding: the estimate itself is engine-specific,
    // so the query emits (exact side, 0/1 within-3σ gate) and the
    // oracle recomputes the exact side + pins the gate to literal 1; a
    // sketch regression flips a CORRECTNESS row, not a bench footnote
    "a01_approx_distinct" -> (Approx.approxDistinct _),
    "a02_hll_merge"       -> (Approx.hllMerge _),
    // multimodal plumbing (stubbed decode, real batching).
    // Oracle-green as of r17: the stub "decode" is a byte histogram of
    // the utf8 text stand-in content, which DuckDB re-derives in FULL
    // from the documents table (pure-ASCII corpus: regex char-class
    // counts = byte-bin masses) — no export needed
    "m01_multimodal_features" ->
      ((s, dir) => graft.multimodal.Multimodal.featureSummary(s, dir)),
    // real JDK codecs over synthesized containers for ALL THREE
    // modalities as of r14: ImageIO PNG, sampled-audio WAV, and
    // MJPEG-in-AVI video (RIFF walk + ImageIO JPEG frames); other
    // video containers stay the declared stub. Oracle-green as of r17:
    // the oracle re-derives counts + planted geometry
    // (dims/rates/durations) from documents, the image rows' decoded
    // bin-1 luma mass EXACTLY from the text bytes (PNG lossless, gray
    // luma = byte), and pins the per-modality feature-sanity gate to 1
    // (JPEG-lossy video rides the gate; see Multimodal.decodeSummary)
    "m02_media_decode" ->
      ((s, dir) => graft.multimodal.Multimodal.decodeSummary(s, dir)),
    // perceptual image dedup: real PNG decode → 64-bit dHash → the d03
    // block-LSH geometry. Oracle-checked as of r14 (exported sig frame
    // + brute hamming≤5 join in DuckDB, below the bucket-cap bound);
    // the spec pins brute set-equality at every scale
    "m03_image_neardup" ->
      ((s, dir) => graft.multimodal.Multimodal.imageNeardup(s, dir)),
    // audio dedup: real WAV decode → 64-bit energy-envelope hash → the
    // same block-LSH geometry. Oracle-checked as of r14 (same exported-
    // sig conversion and bucket-cap bound as m03)
    "m04_audio_neardup" ->
      ((s, dir) => graft.multimodal.Multimodal.audioNeardup(s, dir)),
    // video dedup (r14): REAL MJPEG-in-AVI decode (RIFF walk + ImageIO
    // JPEG frames — the one dependency-free video family) → 64-bit
    // middle-frame dHash → the same block-LSH geometry and brute-join
    // oracle as m03/m04
    "m06_video_neardup" ->
      ((s, dir) => graft.multimodal.Multimodal.videoNeardup(s, dir)),
    // joint media survivors: the d12 decision join over the
    // m03+m04+m06 cluster frames — ALL THREE perceptual modalities.
    // Oracle-checkable (unlike the raw pair frames): image/audio
    // closures equal the doc_id/4 family partition, video's the
    // COARSER doc_id/8 one (r16 geometry — renderFamilyAvi renders
    // 8-member one-patch-step families), so survivors = per-8-family mins and
    // the oracle provably flips if the video drop set is lost
    "m05_joint_media_survivors" ->
      ((s, dir) => graft.multimodal.Multimodal.jointMediaSurvivors(s, dir)),
    // m05 MAINTAINED against persisted frames (the d14 shape for
    // media): corpus decoded once into a MediaHashIndex + persisted
    // cluster frame per modality (image, audio, video), delta probed
    // incrementally and folded in with mergeClusters. Same result,
    // same oracle, same validity bound as m05 — but decode (which
    // video makes the dominant cost) is amortized instead of per-run
    "m05b_joint_media_survivors_indexed" ->
      ((s, dir) => graft.multimodal.Multimodal.jointMediaSurvivorsIndexed(s, dir)),
    // d15 MAINTAINED against the persisted SemDedupIndex (the d14
    // shape for semantic dedup): corpus assigned/paired/decided once,
    // the delta third assigned under the FROZEN centroids and compared
    // against its touched cells only. Returns the batch's decision
    // updates — delta rows plus retroactive corpus drops.
    // Oracle-checked as of r14: Verify exports the index's FROZEN
    // centroids and DuckDB re-derives the decision-update contract
    // in SQL; SemDedupIndexSpec additionally pins maintained ==
    // semanticDedupWithCents over corpus ∪ delta at every scale
    "d15b_semantic_dedup_indexed" ->
      ((s, dir) => SemanticDedup.semanticDedupIncrementalMod(s, dir, 3)),
  )

  /** Timing forms for Bench/ScalingBench. Where the driver-gate form
    * wraps the serving path in a gate-only checker (s02–s05's recall
    * bound-assertion adds an exact brute top-k + a tiny join that is
    * NOT part of the served query), the graded timing stays the RAW
    * serving path — ladder rows keep measuring the thing that scales,
    * and stay comparable with pre-r17 records. Everything else times
    * its [[queries]] form unchanged. */
  def benchQueries: Map[String, Q] = queries ++ Map[String, Q](
    "s02_ann_lsh"      -> (Similarity.annLsh _),
    "s03_ann_ivf"      -> (Similarity.annIvf _),
    "s04_ann_ivfpq"    -> (Similarity.annIvfPq _),
    "s05_ann_pq_index" -> (Similarity.annIvfPqIndexed _),
  )

  /** d08/d14 oracle — transitive closure of the exact jaccard≥0.8
    * pair graph by recursive CTE, min reachable id per node. Shared
    * by the full-recompute CC (d08) and the incremental
    * index+merge path (d14): the incremental result must equal the
    * full recompute bit-for-bit. */
  private val CcClosureOracleSql =
    """WITH RECURSIVE sh AS (
      | SELECT doc_id,
      |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                 for i in range(1, len(w)-1)]) AS sh
      | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
      |pairs AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      | WHERE len(list_intersect(a.sh,b.sh))
      |  / CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS DOUBLE) >= 0.8),
      |edges AS (
      | SELECT doc_a AS u, doc_b AS v FROM pairs
      | UNION
      | SELECT doc_b AS u, doc_a AS v FROM pairs),
      |reach AS (
      | SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
      | UNION
      | SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)
      |SELECT u AS doc_id, min(r) AS cluster_id
      |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin

  /** p01/p02 oracle — the five-stage corpus assembly end to end.
    * Shared by the full build (p01) and the incremental
    * index+delta path (p02): the incremental manifest must equal
    * the full recompute bit-for-bit (the d08/d14 precedent). */
  private val TrainingCorpusOracleSql =
    """WITH cnt AS (
        | SELECT doc_id, source, md5(lower(trim(text))) AS fp,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS t0,
        |  CAST(len(list_filter(string_split(text,' '),
        |       x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS s,
        |  CAST(length(text) AS BIGINT) AS c0,
        |  CAST(length(text)
        |   - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS p
        | FROM documents WHERE doc_id % 23 <> 0),
        |scored AS (
        | SELECT doc_id, source, fp, t0 AS n_tokens,
        |  ((2*(50*least(t0,100)*greatest(t0,1)*greatest(c0,1)
        |      + 2500*s*greatest(c0,1) + 2500*(greatest(c0,1)-p)*greatest(t0,1))
        |    + greatest(t0,1)*greatest(c0,1))
        |   // (2*greatest(t0,1)*greatest(c0,1))) / 10000.0 AS quality
        | FROM cnt),
        |kept AS (
        | SELECT doc_id, source, n_tokens FROM (
        |  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM scored)
        | WHERE doc_id = keep_id AND quality >= 0.5
        |  AND n_tokens BETWEEN 20 AND 400),
        |shx AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                 for i in range(1, len(w)-3)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS h FROM shx WHERE doc_id % 23 = 0),
        |contam AS (
        | SELECT DISTINCT t.doc_id
        | FROM (SELECT doc_id, unnest(sh) AS h FROM shx WHERE doc_id % 23 <> 0) t
        | JOIN bench USING (h)),
        |clean AS (
        | SELECT * FROM kept
        | WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |mw AS (
        | SELECT source, 1 + CAST(substring(source, 4) AS BIGINT) % 5 AS wt
        | FROM (SELECT DISTINCT source FROM clean)),
        |mg AS (SELECT (SELECT sum(n_tokens) FROM clean) AS tot,
        |              (SELECT sum(wt) FROM mw) AS wsum),
        |ma AS (SELECT source, ((tot * 50) // 100) * wt // wsum AS alloc
        |       FROM mw, mg),
        |mc AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |   ORDER BY md5(CAST(doc_id AS VARCHAR))
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS tokens_before
        | FROM clean),
        |sel AS (
        | SELECT mc.doc_id, mc.source, mc.n_tokens
        | FROM mc JOIN ma USING (source)
        | WHERE mc.tokens_before < ma.alloc),
        |pc AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        | FROM sel)
        |SELECT doc_id, source, n_tokens,
        | CAST(start_off AS BIGINT) AS start_off,
        | CAST(start_off // 2048 AS BIGINT) AS first_seq,
        | CAST((start_off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq
        |FROM pc ORDER BY doc_id""".stripMargin

  /** p05 oracle — p01's chain with the TEMPERATURE mixture stanza:
    * per-source weights √(clean-pool token share) in E4 fixed-point
    * (one correctly-rounded IEEE sqrt + round over identical
    * int64-derived doubles), every allocation integer DIV after it. */
  private val TemperatureCorpusOracleSql =
    """WITH cnt AS (
        | SELECT doc_id, source, md5(lower(trim(text))) AS fp,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS t0,
        |  CAST(len(list_filter(string_split(text,' '),
        |       x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS s,
        |  CAST(length(text) AS BIGINT) AS c0,
        |  CAST(length(text)
        |   - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS p
        | FROM documents WHERE doc_id % 23 <> 0),
        |scored AS (
        | SELECT doc_id, source, fp, t0 AS n_tokens,
        |  ((2*(50*least(t0,100)*greatest(t0,1)*greatest(c0,1)
        |      + 2500*s*greatest(c0,1) + 2500*(greatest(c0,1)-p)*greatest(t0,1))
        |    + greatest(t0,1)*greatest(c0,1))
        |   // (2*greatest(t0,1)*greatest(c0,1))) / 10000.0 AS quality
        | FROM cnt),
        |kept AS (
        | SELECT doc_id, source, n_tokens FROM (
        |  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM scored)
        | WHERE doc_id = keep_id AND quality >= 0.5
        |  AND n_tokens BETWEEN 20 AND 400),
        |shx AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                 for i in range(1, len(w)-3)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS h FROM shx WHERE doc_id % 23 = 0),
        |contam AS (
        | SELECT DISTINCT t.doc_id
        | FROM (SELECT doc_id, unnest(sh) AS h FROM shx WHERE doc_id % 23 <> 0) t
        | JOIN bench USING (h)),
        |clean AS (
        | SELECT * FROM kept
        | WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |mw AS (SELECT source, sum(n_tokens) AS st FROM clean GROUP BY source),
        |mg AS (SELECT CAST(sum(st) AS BIGINT) AS tot FROM mw),
        |mww AS (SELECT source,
        |  CAST(round(sqrt(CAST(st AS DOUBLE) / CAST(tot AS DOUBLE)) * 10000)
        |   AS BIGINT) AS wt
        | FROM mw, mg),
        |mws AS (SELECT CAST(sum(wt) AS BIGINT) AS wsum FROM mww),
        |ma AS (SELECT source, ((tot * 50) // 100) * wt // wsum AS alloc
        |       FROM mww, mg, mws),
        |mc AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |   ORDER BY md5(CAST(doc_id AS VARCHAR))
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS tokens_before
        | FROM clean),
        |sel AS (
        | SELECT mc.doc_id, mc.source, mc.n_tokens
        | FROM mc JOIN ma USING (source)
        | WHERE mc.tokens_before < ma.alloc),
        |pc AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        | FROM sel)
        |SELECT doc_id, source, n_tokens,
        | CAST(start_off AS BIGINT) AS start_off,
        | CAST(start_off // 2048 AS BIGINT) AS first_seq,
        | CAST((start_off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq
        |FROM pc ORDER BY doc_id""".stripMargin

  /** p03 oracle — p01's five-stage chain with the d10 near-dup
    * closure spliced between the gates and decontamination: the
    * recursive CTE walks the transitive closure of the exact
    * jaccard≥0.8 pair graph over GATE-SURVIVING docs and drops every
    * non-min component member before the decontamination filter. */
  private val FuzzyCorpusOracleSql =
    """WITH RECURSIVE cnt AS (
        | SELECT doc_id, source, md5(lower(trim(text))) AS fp,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS t0,
        |  CAST(len(list_filter(string_split(text,' '),
        |       x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS s,
        |  CAST(length(text) AS BIGINT) AS c0,
        |  CAST(length(text)
        |   - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS p
        | FROM documents WHERE doc_id % 23 <> 0),
        |scored AS (
        | SELECT doc_id, source, fp, t0 AS n_tokens,
        |  ((2*(50*least(t0,100)*greatest(t0,1)*greatest(c0,1)
        |      + 2500*s*greatest(c0,1) + 2500*(greatest(c0,1)-p)*greatest(t0,1))
        |    + greatest(t0,1)*greatest(c0,1))
        |   // (2*greatest(t0,1)*greatest(c0,1))) / 10000.0 AS quality
        | FROM cnt),
        |kept AS (
        | SELECT doc_id, source, n_tokens FROM (
        |  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM scored)
        | WHERE doc_id = keep_id AND quality >= 0.5
        |  AND n_tokens BETWEEN 20 AND 400),
        |fsh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                 for i in range(1, len(w)-1)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents
        |       WHERE doc_id IN (SELECT doc_id FROM kept))),
        |fpairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM fsh a JOIN fsh b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.sh,b.sh))
        |  / CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS DOUBLE) >= 0.8),
        |fedges AS (
        | SELECT doc_a AS u, doc_b AS v FROM fpairs
        | UNION
        | SELECT doc_b AS u, doc_a AS v FROM fpairs),
        |freach AS (
        | SELECT u, u AS r FROM (SELECT DISTINCT u FROM fedges)
        | UNION
        | SELECT e.u, freach.r FROM fedges e JOIN freach ON e.v = freach.u),
        |fdropped AS (
        | SELECT u AS doc_id FROM freach GROUP BY u HAVING min(r) <> u),
        |fuzzy AS (
        | SELECT * FROM kept
        | WHERE doc_id NOT IN (SELECT doc_id FROM fdropped)),
        |shx AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                 for i in range(1, len(w)-3)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS h FROM shx WHERE doc_id % 23 = 0),
        |contam AS (
        | SELECT DISTINCT t.doc_id
        | FROM (SELECT doc_id, unnest(sh) AS h FROM shx WHERE doc_id % 23 <> 0) t
        | JOIN bench USING (h)),
        |clean AS (
        | SELECT * FROM fuzzy
        | WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |mw AS (
        | SELECT source, 1 + CAST(substring(source, 4) AS BIGINT) % 5 AS wt
        | FROM (SELECT DISTINCT source FROM clean)),
        |mg AS (SELECT (SELECT sum(n_tokens) FROM clean) AS tot,
        |              (SELECT sum(wt) FROM mw) AS wsum),
        |ma AS (SELECT source, ((tot * 50) // 100) * wt // wsum AS alloc
        |       FROM mw, mg),
        |mc AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (PARTITION BY source
        |   ORDER BY md5(CAST(doc_id AS VARCHAR))
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS tokens_before
        | FROM clean),
        |sel AS (
        | SELECT mc.doc_id, mc.source, mc.n_tokens
        | FROM mc JOIN ma USING (source)
        | WHERE mc.tokens_before < ma.alloc),
        |pc AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        | FROM sel)
        |SELECT doc_id, source, n_tokens,
        | CAST(start_off AS BIGINT) AS start_off,
        | CAST(start_off // 2048 AS BIGINT) AS first_seq,
        | CAST((start_off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq
        |FROM pc ORDER BY doc_id""".stripMargin

  /** t09/t20 oracle — training docs sharing any word 5-gram with the
    * benchmark set (every 23rd doc). Shared by the hash-join path (t09)
    * and the bloom-pruned path (t20): the bloom is a prune, never a
    * decision, so both must produce identical rows. */
  private val DecontamOracleSql =
    """WITH sh AS (
      | SELECT doc_id,
      |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
      |                 for i in range(1, len(w)-3)]) AS sh
      | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
      |bench AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 23 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS h FROM sh WHERE doc_id % 23 <> 0)
      |SELECT tr.doc_id, count(*) AS n_shared
      |FROM tr JOIN bench USING (h)
      |GROUP BY tr.doc_id
      |ORDER BY doc_id""".stripMargin

  /** t11/t14 oracle — BM25 (k1=1.2, b=0.75, Lucene idf form) over the
    * t06 vocabulary, shared by the scan path and the persisted-index
    * path (the index must reproduce the scan bit-for-bit). */
  private val Bm25OracleSql =
    """WITH t AS (
      | SELECT doc_id, len(w) AS dl,
      |  CAST(len(list_filter(w, x -> x = 'spark'))  AS DOUBLE) AS tf0,
      |  CAST(len(list_filter(w, x -> x = 'window')) AS DOUBLE) AS tf1,
      |  CAST(len(list_filter(w, x -> x = 'dup'))    AS DOUBLE) AS tf2
      | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
      |s AS (
      | SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
      |  CAST(sum(CASE WHEN tf0>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
      |  CAST(sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
      |  CAST(sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      | FROM t)
      |SELECT doc_id,
      | round(
      |   ln(1.0 + (n - df0 + 0.5)/(df0 + 0.5))
      |    * (tf0 * 2.2) / (tf0 + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/(CAST(sumdl AS DOUBLE)/n)))
      | + ln(1.0 + (n - df1 + 0.5)/(df1 + 0.5))
      |    * (tf1 * 2.2) / (tf1 + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/(CAST(sumdl AS DOUBLE)/n)))
      | + ln(1.0 + (n - df2 + 0.5)/(df2 + 0.5))
      |    * (tf2 * 2.2) / (tf2 + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/(CAST(sumdl AS DOUBLE)/n)))
      | , 4) AS bm25
      |FROM t, s
      |WHERE tf0 + tf1 + tf2 > 0
      |ORDER BY doc_id""".stripMargin

  /** t12/t15 oracle — batch BM25, shared by scan and index paths. */
  private val Bm25BatchOracleSql =
    """WITH q(query_id, term) AS (VALUES
      |  (1,'spark'),(1,'window'),(2,'dup'),(2,'spark'),(3,'window'),(3,'dup')),
      |d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |base AS (SELECT doc_id, len(w) AS dl FROM d),
      |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl FROM base),
      |toks AS (SELECT doc_id, unnest(w) AS term FROM d),
      |tf AS (
      | SELECT t.doc_id, t.term, CAST(count(*) AS DOUBLE) AS tf
      | FROM toks t JOIN (SELECT DISTINCT term FROM q) qt USING (term)
      | GROUP BY 1, 2),
      |dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dft FROM tf GROUP BY 1),
      |score AS (
      | SELECT q.query_id, tf.doc_id,
      |  sum(ln(1.0 + (n - dft + 0.5)/(dft + 0.5)) * (tf * 2.2)
      |   / (tf + 1.2*(0.25 + 0.75*CAST(dl AS DOUBLE)/(CAST(sumdl AS DOUBLE)/n)))) AS sc
      | FROM tf JOIN q USING (term) JOIN dft USING (term)
      |   JOIN base USING (doc_id), s
      | GROUP BY 1, 2)
      |SELECT query_id, rank, doc_id, bm25 FROM (
      | SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, round(sc, 4) AS bm25,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, doc_id) AS BIGINT) AS rank
      | FROM score)
      |WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** Oracle VALIDITY ceilings, in `documents`-table rows: an oracle
    * listed here is exact only while the corpus stays under its bound,
    * because the oracle encodes a planted-data assumption that the
    * engine (correctly) outgrows. [[graft.Verify]] enforces the bound
    * machine-side — above it the oracle is omitted from
    * oracle_sql.json (the query degrades to a rows-only check) instead
    * of failing spuriously against a right answer.
    *
    * m05 (r17): the family-min oracle is REFINED by banded
    * cross-family edge discovery over the exported sig frames
    * ([[m05OracleSql]]), so the r16 divergence point — 12 real
    * cross-family hamming-5 pairs at 500k docs merging families,
    * engine right / unrefined oracle wrong — is now inside the
    * oracle's model. Validity through the Tier-2 sf10 corpus (500k
    * docs, r17-verified row-exact); the remaining model assumption is
    * within-family closure = the family itself (geometry invariant,
    * closure-level specs) and bucket-cap non-engagement (below). */
  val oracleValidMaxDocs: Map[String, Long] = Map(
    "m05_joint_media_survivors" -> 500000L,
    "m05b_joint_media_survivors_indexed" -> 500000L,
    // d03/m03/m04/m06's hamming≤5 pair oracles are exact only below
    // the BUCKET-CAP regime. The engine's over-cap buckets
    // (>MaxBucket=64 members — skewed key, the 100 TB skew contract)
    // emit chain+star CONNECTIVITY pairs, not all pairs, so above cap
    // engagement the engine correctly drops some true boundary pairs
    // the oracle's exhaustive join keeps (measured: d03 at the 5k-doc
    // sf0.1 loses exactly 39 hamming-5 pairs, every one inside a
    // single shared 68–100-wide bucket — verified by recomputing the
    // combination-key widths in DuckDB). Bounds = the largest corpus
    // where oracle equality was VERIFIED: d03 at 500 docs (sf0.01 —
    // its text families collide into wide 3-block buckets well before
    // the media hashes do); m03/m04/m06 at 500k docs (the Tier-2 sf10
    // corpus, r17: the banded — pigeonhole-exhaustive, = brute —
    // oracle made the check feasible there, and the media combo-key
    // buckets stay far below the cap at that density). The
    // engine-side contract above each bound stays pinned by the
    // in-suite closure-level specs.
    "d03_simhash" -> 500L,
    "m03_image_neardup" -> 500000L,
    "m04_audio_neardup" -> 500000L,
    "m06_video_neardup" -> 500000L,
    // d15/d15b oracles re-derive cell assignment with a FLAT argmax —
    // valid only in the single-level centroid regime (subPerCell = 1,
    // i.e. n ≤ DeepCellWidth·coarseCap ≈ 524k vectors); above it the
    // engine (correctly) goes two-level and the SQL would need the
    // hierarchical argmax. Bounded at 400k documents (embeddings rows
    // track documents rows in the driver tables, +20 planted).
    "d15_semantic_dedup" -> 400000L,
    "d15b_semantic_dedup_indexed" -> 400000L)

  /** Oracle-support exports: deterministic ENGINE-derived frames the
    * driver oracle reads back with `read_parquet()`. [[graft.Verify]]
    * writes each to `<outDir>/_exports/<name>` and substitutes the
    * literal `__EXPORTS__` in [[oracleSql]] with that directory's
    * absolute path. Keyed `export name -> (consuming query, frame)`
    * so the [[oracleValidMaxDocs]] gate skips an export exactly when
    * it omits the oracle that reads it.
    *
    * Division of labor (the r13 verdict's conversion recipe): the
    * export carries the frame whose derivation SQL cannot express
    * (image/audio decode, a trained k-means) — each pinned by an
    * in-suite spec (brute set-equality, planted recovery,
    * deterministic training) — while the oracle independently
    * re-derives everything downstream of it: the banded-LSH pair
    * machinery as a brute hamming self-join, the SemDeDup decision
    * frame as flat-argmax assignment + within-cell pairing + the
    * (centroid_sim, id) keep policy. */
  def oracleExports: Map[String, (String, (SparkSession, String) => DataFrame)] = Map(
    "d03_sigs" -> (("d03_simhash",
      (s, dir) => Dedup.simhashSigs(s, dir))),
    "m03_sigs" -> (("m03_image_neardup",
      (s, dir) => graft.multimodal.Multimodal.imageSigFrame(
        graft.multimodal.Multimodal.syntheticImageCorpus(
          graft.core.Tables.load(s, dir, "documents"))))),
    "m04_sigs" -> (("m04_audio_neardup",
      (s, dir) => graft.multimodal.Multimodal.audioSigFrame(
        graft.multimodal.Multimodal.syntheticAudioCorpus(
          graft.core.Tables.load(s, dir, "documents"))))),
    "m06_sigs" -> (("m06_video_neardup",
      (s, dir) => graft.multimodal.Multimodal.videoSigFrame(
        graft.multimodal.Multimodal.syntheticVideoCorpus(
          graft.core.Tables.load(s, dir, "documents"))))),
    "d15_cents" -> (("d15_semantic_dedup",
      (s, dir) => SemanticDedup.trainedCentFrame(s, dir))),
    "d15b_cents" -> (("d15b_semantic_dedup_indexed",
      (s, dir) => SemanticDedup.indexCentFrame(s, dir, 3))),
    // s02–s05: the approximate top-k NEIGHBOR SETS (the part SQL
    // cannot re-derive — LSH probing / IVF training), deterministic by
    // construction (hash-derived planes, seeded k-center training —
    // pinned in PipelineOpsSpec), re-scored by the oracle against ITS
    // OWN brute top-k to recompute each query's recall independently
    "s02_ann" -> (("s02_ann_lsh",
      (s, dir) => Similarity.annLsh(s, dir).select("query_id", "neighbor_id"))),
    "s03_ann" -> (("s03_ann_ivf",
      (s, dir) => Similarity.annIvf(s, dir).select("query_id", "neighbor_id"))),
    "s04_ann" -> (("s04_ann_ivfpq",
      (s, dir) => Similarity.annIvfPq(s, dir).select("query_id", "neighbor_id"))),
    "s05_ann" -> (("s05_ann_pq_index",
      (s, dir) => Similarity.annIvfPqIndexed(s, dir).select("query_id", "neighbor_id"))))

  /** DuckDB-runnable equivalents (same parquet tables registered under
    * their bare names). Keys absent here get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_agg" ->
      """SELECT o_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_star_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q05_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q06_window" ->
      """SELECT o_custkey, rn, o_orderkey, run_total FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_total
        | FROM orders
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q07_distinct_agg" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS h, event_type,
        | count(*) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,
    "q09_cte" ->
      """WITH spent AS (
        | SELECT o_custkey, round(sum(o_totalprice),2) AS spent
        | FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_name, spent
        |FROM customer JOIN spent ON c_custkey = o_custkey
        |ORDER BY spent DESC, c_custkey LIMIT 20""".stripMargin,
    "q10_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "q11_set_ops" ->
      """SELECT key FROM (
        | SELECT key FROM (
        |  SELECT c_custkey AS key FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000)
        | UNION ALL
        | SELECT key FROM (
        |  SELECT s_suppkey AS key FROM supplier
        |  INTERSECT
        |  SELECT c_custkey AS key FROM customer)
        |) ORDER BY key""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        | substr(p_name, 1, 10) AS name10,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS size_class,
        | round(p_retailprice*1.1, 2) AS marked_up
        |FROM part ORDER BY p_partkey LIMIT 100""".stripMargin,
    "q13_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf,
        | coalesce(l_linestatus,'ALL') AS ls,
        | count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q14_having" ->
      """SELECT l_suppkey, count(*) AS n,
        | round(sum(l_extendedprice),2) AS total
        |FROM lineitem GROUP BY l_suppkey
        |HAVING count(*) > 100 ORDER BY n DESC, l_suppkey""".stripMargin,
    "q15_exists_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c.c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q16_not_exists_anti" ->
      """SELECT DISTINCT user_id FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM events x
        |  WHERE x.event_type = 'error' AND x.value > 90
        |  AND x.user_id = e.user_id)
        |ORDER BY user_id""".stripMargin,
    "q17_like_in_between" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_name LIKE '%red%' AND p_size BETWEEN 10 AND 20
        | AND p_brand IN ('Brand#1','Brand#7','Brand#13')
        |ORDER BY p_partkey""".stripMargin,
    "q18_string_agg" ->
      """SELECT n_name,
        | string_agg(s_name, ',' ORDER BY s_name) AS suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q19_avg_decompose" ->
      """SELECT event_type,
        | round(sum(value)/count(value), 4) AS avg_manual,
        | round(avg(value), 4) AS avg_builtin
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q20_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "q21_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id LIMIT 200""".stripMargin,
    "q22_range_join" ->
      """WITH bands AS (
        | SELECT range AS band, range*10.0 AS lo, (range+1)*10.0 AS hi
        | FROM range(100))
        |SELECT band, count(*) AS n, round(avg(p_retailprice),2) AS avg_price
        |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    // q23–q30 reuse the Spark-dialect SQL verbatim — every construct is
    // dialect-shared with DuckDB (verified: INTERVAL '30' DAY, instr,
    // power, window frames, correlated/nested subqueries).
    "q23_point_lookup"    -> graft.operators.RelationalSql.pointLookup,
    "q24_window_nav"      -> graft.operators.RelationalSql.windowNavigation,
    "q25_cond_pivot"      -> graft.operators.RelationalSql.conditionalPivot,
    "q26_correlated_subq" -> graft.operators.RelationalSql.correlatedSubquery,
    "q27_date_arith"      -> graft.operators.RelationalSql.dateArithmetic,
    "q28_math_funcs"      -> graft.operators.RelationalSql.mathFuncs,
    "q29_string_funcs"    -> graft.operators.RelationalSql.stringFuncs,
    "q30_nested_agg_subq" -> graft.operators.RelationalSql.nestedAggSubquery,
    "q31_asof_join" ->
      """WITH clicks AS (
        | SELECT user_id, ts, CAST(max(event_id) AS BIGINT) AS click_id,
        |        max_by(value, event_id) AS click_value
        | FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |purch AS (
        | SELECT event_id, user_id, ts FROM events
        | WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        | ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "b01_simple_count" -> graft.operators.RelationalSql.baselineSimpleCount,
    "b02_hourly_distinct" -> graft.operators.RelationalSql.baselineHourlyDistinct,
    "b03_count_distinct" -> graft.operators.RelationalSql.baselineCountDistinct,
    "q32_percentiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q33_stratified_sample" -> graft.operators.RelationalSql.stratifiedSample,
    "t01_text_stats" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        | list_reduce(list_prepend(0::BIGINT,
        |   [CAST(1 + floor(greatest(length(x)-1,0)/4.0) AS BIGINT)
        |    for x in string_split(text,' ')]),
        |   (a,v) -> a+v) AS n_subwords,
        | CAST(length(text) AS BIGINT) AS n_chars_calc, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Ratios and quality are exact rationals rounded half-up to 4
    // decimals in INTEGER arithmetic on both engines (// here, DIV in
    // Spark): float round(x, 4) of a rational sitting exactly on a
    // decimal half (577/800 = 0.72125) is engine-dependent — the sf10
    // DuckDB gate measured two such docs disagreeing.
    "t02_quality_scoring" ->
      """WITH cnt AS (
        | SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS t0,
        |  CAST(len(list_filter(string_split(text,' '),
        |       x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS s,
        |  CAST(length(text) AS BIGINT) AS c0,
        |  CAST(length(text)
        |   - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS p
        | FROM documents),
        |g AS (SELECT doc_id, s, p, greatest(t0, 1) AS t, greatest(c0, 1) AS c,
        |  least(t0, 100) AS m FROM cnt)
        |SELECT doc_id,
        | ((20000*s + t) // (2*t)) / 10000.0 AS stop_ratio,
        | ((20000*p + c) // (2*c)) / 10000.0 AS punct_ratio,
        | ((2*(50*m*t*c + 2500*s*c + 2500*(c-p)*t) + t*c) // (2*t*c)) / 10000.0
        |  AS quality
        |FROM g ORDER BY doc_id""".stripMargin,
    "t03_lang_id" ->
      """SELECT lang,
        | CASE WHEN regexp_matches(text, '[一-龥]') THEN 'zh'
        |  WHEN regexp_matches(' '||text||' ', ' (el|los|las|una) ') THEN 'es'
        |  WHEN regexp_matches(' '||text||' ', ' (der|und|nicht|das) ') THEN 'de'
        |  WHEN regexp_matches(' '||text||' ', ' (le|et|les|une) ') THEN 'fr'
        |  ELSE 'en' END AS lang_guess,
        | count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY lang, lang_guess""".stripMargin,
    "t04_fingerprints" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
        | list_reduce(list_prepend(0::BIGINT,
        |   [CAST(length(x)+31*ascii(x) AS BIGINT) for x in string_split(text,' ')]),
        |   (acc,v) -> (acc*131+v) % 1000000007) AS fp_roll
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t05_curation" ->
      """WITH cnt AS (
        | SELECT doc_id, source, md5(lower(trim(text))) AS fp,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS t0,
        |  CAST(len(list_filter(string_split(text,' '),
        |       x -> x IN ('the','a','and','of','to','in','is'))) AS BIGINT) AS s,
        |  CAST(length(text) AS BIGINT) AS c0,
        |  CAST(length(text)
        |   - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS p
        | FROM documents),
        |scored AS (
        | SELECT doc_id, source, fp, t0 AS n_tokens,
        |  -- integer-exact 4-decimal quality: see the t02 oracle note
        |  ((2*(50*least(t0,100)*greatest(t0,1)*greatest(c0,1)
        |      + 2500*s*greatest(c0,1) + 2500*(greatest(c0,1)-p)*greatest(t0,1))
        |    + greatest(t0,1)*greatest(c0,1))
        |   // (2*greatest(t0,1)*greatest(c0,1))) / 10000.0 AS quality
        | FROM cnt),
        |kept AS (
        | SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id FROM scored)
        |SELECT source, count(*) AS n_docs,
        | CAST(round(sum(CAST(round(quality * 10000) AS BIGINT))
        |            / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS avg_quality_e4,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM kept
        |WHERE doc_id = keep_id AND quality >= 0.5 AND n_tokens BETWEEN 20 AND 400
        |GROUP BY source ORDER BY source""".stripMargin,
    "t06_text_search" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE list_contains(string_split(text,' '), 'dup')
        |   OR (list_contains(string_split(text,' '), 'spark')
        |       AND list_contains(string_split(text,' '), 'window'))
        |ORDER BY doc_id""".stripMargin,
    // t07 goes through the persisted inverted index; results must equal
    // the scan-form predicate, so the oracle is the same SQL
    "t07_indexed_search" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE list_contains(string_split(text,' '), 'dup')
        |   OR (list_contains(string_split(text,' '), 'spark')
        |       AND list_contains(string_split(text,' '), 'window'))
        |ORDER BY doc_id""".stripMargin,
    // regexes are written in the Java∩RE2 common subset; DuckDB needs
    // the 'g' flag for replace-all (Spark replaces all by default)
    "t08_pii_redaction" ->
      """WITH aug AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0
        |   THEN text || ' contact user' || doc_id || '@example.com ip 10.0.'
        |        || (doc_id % 256) || '.' || (doc_id % 100)
        |   ELSE text END AS aug
        | FROM documents)
        |SELECT doc_id,
        | len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        | len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        | md5(regexp_replace(
        |   regexp_replace(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_fp
        |FROM aug ORDER BY doc_id""".stripMargin,
    "t09_decontamination" -> DecontamOracleSql,
    // t20 is t09 through the distributed bloom prune — same oracle by
    // construction (the exact join removes the bloom's false positives)
    "t20_bloom_decontamination" -> DecontamOracleSql,
    // t23: t09's join plus an exact integer denominator/threshold —
    // overlap uses the shared E4 half-up rounding, the verdict the
    // integer form of ratio ≥ 0.2 (bit-reproducible across engines)
    "t23_contamination_ratio" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                 for i in range(1, len(w)-3)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE doc_id % 23 = 0),
        |tr AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_total, unnest(sh) AS h
        |       FROM sh WHERE doc_id % 23 <> 0)
        |SELECT tr.doc_id, count(*) AS n_shared, n_total,
        | ((20000*count(*) + n_total) // (2*n_total)) / 10000.0 AS overlap,
        | CAST(CASE WHEN count(*)*5 >= n_total THEN 1 ELSE 0 END AS BIGINT)
        |   AS contaminated
        |FROM tr JOIN bench USING (h)
        |GROUP BY tr.doc_id, tr.n_total
        |ORDER BY doc_id""".stripMargin,
    // t21: counts exact integers, equal-count ties order on term,
    // coverage the exact integer-rational E4 rounding — every column
    // bit-reproducible across engines. DuckDB sum() over BIGINT widens
    // to HUGEINT; the rounding arithmetic stays integral either way.
    "t21_vocab_coverage" ->
      """WITH occ AS (
        | SELECT unnest(string_split(text,' ')) AS term FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_occ FROM occ),
        |g AS (
        | SELECT term, CAST(count(*) AS BIGINT) AS n_occ FROM occ GROUP BY 1),
        |r AS (
        | SELECT term, n_occ,
        |  CAST(row_number() OVER (ORDER BY n_occ DESC, term) AS BIGINT) AS rank,
        |  CAST(sum(n_occ) OVER (ORDER BY n_occ DESC, term
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_occ
        | FROM g)
        |SELECT rank, term, n_occ,
        | ((20000*cum_occ + total_occ) // (2*total_occ)) / 10000.0 AS cum_coverage
        |FROM r, tot WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // t22: the vocab is the same top-24 (count desc, term) prefix on
    // both engines (24 < the corpus's 31-term vocabulary, so the OOV
    // tail is non-degenerate at every SF); the ratio and the keep gate
    // are pure integer arithmetic (cross-multiplied E4 threshold, not
    // a float compare)
    "t22_oov_ratio" ->
      """WITH occ AS (
        | SELECT unnest(string_split(text,' ')) AS term FROM documents),
        |v AS (
        | SELECT term FROM (
        |  SELECT term, count(*) AS n_occ FROM occ GROUP BY 1)
        | ORDER BY n_occ DESC, term LIMIT 24),
        |inv AS (
        | SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |o AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN term IN (SELECT term FROM v) THEN 0 ELSE 1 END)
        |   AS BIGINT) AS n_oov
        | FROM inv GROUP BY 1)
        |SELECT doc_id, n_tokens, n_oov,
        | ((20000*n_oov + greatest(n_tokens,1)) // (2*greatest(n_tokens,1)))
        |  / 10000.0 AS oov_ratio,
        | 10000*n_oov <= 3500*greatest(n_tokens,1) AS keep
        |FROM o ORDER BY doc_id""".stripMargin,
    "t10_repetition" ->
      """WITH g AS (
        | SELECT doc_id, greatest(len(w)-2, 0) AS n_grams,
        |  len(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                     for i in range(1, len(w)-1)])) AS n_distinct
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents))
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        | CAST(n_distinct AS BIGINT) AS n_distinct,
        | ((20000*(CAST(n_grams AS BIGINT) - CAST(n_distinct AS BIGINT))
        |   + CAST(n_grams AS BIGINT)) // (2*CAST(n_grams AS BIGINT))) / 10000.0
        |  AS rep_ratio
        |FROM g WHERE n_grams > 0 ORDER BY doc_id""".stripMargin,
    // BM25 (k1=1.2, b=0.75, Lucene idf form) over the t06 vocabulary.
    // Cross-engine float notes: tf/dl/df/N are exact integers, sumdl is
    // a BIGINT sum (order-independent), the 3-term score sum runs in
    // the same fixed order on both sides, and the only libm call is
    // ln() (≤1-ulp drift, invisible at round(·,4)).
    "t11_bm25_search" -> Bm25OracleSql,
    // t14 is t11 through the persisted postings index — same oracle by
    // construction (the indexed path must reproduce the scan path)
    "t14_bm25_index" -> Bm25OracleSql,
    // t15 is t12 through the index — same oracle
    "t15_batch_bm25_index" -> Bm25BatchOracleSql,
    // batch BM25: queries as data, top-10 per query. Ranking compares
    // across engines because 2-term score sums are order-independent
    // (IEEE a+b commutes) and distinct (tf, dl, df) combinations
    // separate scores by far more than the ≤1-ulp ln() drift (the s01
    // cosine-rank precedent); ties break on doc_id in both engines.
    "t12_multiquery_search" -> Bm25BatchOracleSql,
    // per-doc TF-IDF keywords: ties (equal tf and df) break on term;
    // distinct (tf, df) combinations separate scores far beyond ln()'s
    // 1-ulp engine drift (s01 rank-on-double precedent)
    "t13_keyword_tfidf" ->
      """WITH inv AS (
        | SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
        |tf AS (
        | SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        | FROM inv GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |wd AS (
        | SELECT doc_id, term, tf,
        |  CAST(count(*) OVER (PARTITION BY term) AS DOUBLE) AS df
        | FROM tf),
        |sc AS (SELECT doc_id, term, tf * ln((n + 1.0)/(df + 1.0)) AS s FROM wd, n),
        |r AS (
        | SELECT doc_id, term, s,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS BIGINT) AS rank
        | FROM sc)
        |SELECT doc_id, rank, term, round(s, 4) AS tfidf
        |FROM r WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    // GPT-style concat-and-split packing at budget 2048: a global
    // prefix sum of t01's whitespace token counts in doc_id order;
    // the Spark side computes it as a distributed two-phase prefix sum
    // (the single-window spelling here is fine for DuckDB, wrong for a
    // 1000-executor plan)
    "t16_sequence_packing" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        | FROM t)
        |SELECT doc_id, n_tokens,
        | CAST(start_off AS BIGINT) AS start_off,
        | CAST(start_off // 2048 AS BIGINT) AS first_seq,
        | CAST((start_off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq
        |FROM c ORDER BY doc_id""".stripMargin,
    "t24_shard_export" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  md5(CAST(doc_id AS VARCHAR) || ':42') AS k
        | FROM documents),
        |r AS (
        | SELECT doc_id, n_tokens,
        |  row_number() OVER (ORDER BY k, doc_id) AS rn
        | FROM t)
        |SELECT (rn - 1) % 16 AS shard, (rn - 1) // 16 AS pos,
        | doc_id, n_tokens
        |FROM r ORDER BY shard, pos""".stripMargin,
    // t25: ln/exp float terms → round(…,4) on both sides (the BM25
    // convention); counts + V are exact integers so the smoothed
    // probabilities agree to ulps across engines
    "t25_lm_perplexity" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |uni AS (
        | SELECT tok, CAST(count(*) AS BIGINT) AS cu
        | FROM (SELECT unnest(w) AS tok FROM d WHERE doc_id % 23 = 0)
        | GROUP BY tok),
        |v AS (SELECT CAST(count(*) AS DOUBLE) AS vsz FROM uni),
        |bi AS (
        | SELECT bg, CAST(count(*) AS BIGINT) AS cb
        | FROM (SELECT unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) AS bg
        |       FROM d WHERE doc_id % 23 = 0)
        | GROUP BY bg),
        |tb AS (
        | SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1
        | FROM (SELECT doc_id, unnest([w[i]||' '||w[i+1] for i in range(1, len(w))]) AS bg
        |       FROM d WHERE doc_id % 23 <> 0 AND len(w) >= 2))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        | round(-sum(ln((COALESCE(cb, 0) + 1.0) / (COALESCE(cu, 0) + vsz)))
        |   / count(*), 4) AS nll
        |FROM tb LEFT JOIN bi USING (bg) LEFT JOIN uni ON tb.w1 = uni.tok, v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t26: md5 over the identically-sliced token join, position packed
    // into one BIGINT (doc_id·2^20 + seg_idx, matching the Spark side's
    // widened packing) so the first-occurrence min is primitive on both
    // engines; counts CAST to dodge the HUGEINT widening
    "t26_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |x AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n,
        |       unnest(generate_series(0, (len(w)+9)//10 - 1)) AS k, w
        |      FROM t),
        |s AS (SELECT doc_id,
        |       md5(array_to_string(w[k*10+1 : k*10+10], ' ')) AS h,
        |       CAST(least(10, n - k*10) AS BIGINT) AS slen,
        |       doc_id*1048576 + CAST(k AS BIGINT) AS pos
        |      FROM x),
        |m AS (SELECT doc_id, slen, pos,
        |       min(pos) OVER (PARTITION BY h) AS fp FROM s)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
        | CAST(sum(CASE WHEN pos <> fp THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_dup_segments,
        | CAST(sum(CASE WHEN pos = fp THEN slen ELSE 0 END) AS BIGINT)
        |  AS kept_tokens
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t27: √share weights are one correctly-rounded IEEE sqrt + round
    // over identical int64-derived doubles — the E4 integer weight is
    // engine-exact, and everything after it is t17's DIV discipline
    "t27_temperature_mixture" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  md5(CAST(doc_id AS VARCHAR)) AS k
        | FROM documents),
        |p AS (SELECT source, sum(n_tokens) AS st FROM t GROUP BY source),
        |g AS (SELECT CAST(sum(st) AS BIGINT) AS tot FROM p),
        |w AS (SELECT source,
        |  CAST(round(sqrt(CAST(st AS DOUBLE) / CAST(tot AS DOUBLE)) * 10000)
        |   AS BIGINT) AS wt_e4
        | FROM p, g),
        |ws AS (SELECT CAST(sum(wt_e4) AS BIGINT) AS wsum FROM w),
        |a AS (SELECT source, ((tot * 50) // 100) * wt_e4 // wsum AS alloc
        |      FROM w, g, ws),
        |c AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY k
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS tokens_before
        | FROM t)
        |SELECT c.source, c.doc_id, c.n_tokens,
        | CAST(c.tokens_before AS BIGINT) AS tokens_before
        |FROM c JOIN a USING (source)
        |WHERE c.tokens_before < a.alloc
        |ORDER BY c.source, c.doc_id""".stripMargin,
    "p01_training_corpus" -> TrainingCorpusOracleSql,
    // p02 = p01 computed incrementally; equal output by contract
    "p02_incremental_corpus" -> TrainingCorpusOracleSql,
    "p03_fuzzy_corpus" -> FuzzyCorpusOracleSql,
    // p04 = p03 computed incrementally; equal output by contract
    "p04_incremental_fuzzy" -> FuzzyCorpusOracleSql,
    "p05_temperature_corpus" -> TemperatureCorpusOracleSql,
    // t17/t18: allocations are pure integer arithmetic (//), weights the
    // deterministic 1+(suffix%5), order the md5 shuffle key — every term
    // bit-reproducible across engines (the PARTITION BY source window is
    // the oracle spelling; the Spark plan runs the grouped two-phase
    // prefix sum so no domain ever meets a single window partition)
    "t17_domain_mixture" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  md5(CAST(doc_id AS VARCHAR)) AS k
        | FROM documents),
        |w AS (
        | SELECT source, 1 + CAST(substring(source, 4) AS BIGINT) % 5 AS wt
        | FROM (SELECT DISTINCT source FROM t)),
        |g AS (
        | SELECT (SELECT sum(n_tokens) FROM t) AS tot,
        |        (SELECT sum(wt) FROM w) AS wsum),
        |a AS (
        | SELECT source, ((tot * 50) // 100) * wt // wsum AS alloc
        | FROM w, g),
        |c AS (
        | SELECT doc_id, source, n_tokens,
        |  COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY k
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS tokens_before
        | FROM t)
        |SELECT c.source, c.doc_id, c.n_tokens,
        | CAST(c.tokens_before AS BIGINT) AS tokens_before
        |FROM c JOIN a USING (source)
        |WHERE c.tokens_before < a.alloc
        |ORDER BY c.source, c.doc_id""".stripMargin,
    "t18_mixture_epochs" ->
      """WITH t AS (
        | SELECT source,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |p AS (
        | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  sum(n_tokens) AS src_tokens,
        |  1 + CAST(substring(source, 4) AS BIGINT) % 5 AS wt
        | FROM t GROUP BY source),
        |g AS (
        | SELECT sum(src_tokens) AS tot, sum(wt) AS wsum FROM p)
        |SELECT source, n_docs, CAST(src_tokens AS BIGINT) AS src_tokens, wt,
        | CAST(((tot * 150) // 100) * wt // wsum AS BIGINT) AS alloc,
        | CAST((((tot * 150) // 100) * wt // wsum + src_tokens - 1) // src_tokens
        |  AS BIGINT) AS epochs
        |FROM p, g ORDER BY source""".stripMargin,
    // t19: chunk counts/offsets are integer DIV on both engines; the
    // window fingerprint is md5 over the identically-sliced token join
    "t19_token_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM t),
        |c AS (SELECT doc_id, w, n,
        |  CASE WHEN n <= 32 THEN 1
        |   ELSE (n - 32 + 23) // 24 + 1 END AS nchunks FROM n),
        |x AS (SELECT doc_id, w, n,
        |  unnest(generate_series(0, nchunks - 1)) AS chunk_idx FROM c)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        | CAST(chunk_idx * 24 AS BIGINT) AS start_tok,
        | CAST(least(32, n - chunk_idx * 24) AS BIGINT) AS n_chunk_tokens,
        | md5(array_to_string(w[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' '))
        |  AS chunk_md5
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,
    "d01_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // m05: the perceptual pair closure equals the doc_id/4 family
    // partition in the image and audio modalities, and the COARSER
    // doc_id/8 partition in video (8-member one-patch-step families —
    // Multimodal.renderFamilyAvi), so
    // joint survivors = per-8-family mins. Video is decision-effective
    // by construction: each 8-family's upper image-family min (doc_id
    // ≡ 4 mod 8) survives image and audio but is dropped by video, so
    // this oracle fails if the decision join loses videoDropIds.
    // Validity boundary (measured, graft.tools.M05Probe): at 500k docs
    // the perceptual space is dense enough that 12 cross-family pairs
    // land AT hamming 5 and merge a handful of families — REAL
    // near-dups by the hash's definition, dropped correctly by the
    // engine (m03/m04's set-equality specs pin LSH ≡ brute) but
    // invisible to this id-structured oracle; it is exact at the
    // driver gate's SF and diverges by 5 rows in 125k at sf10. The
    // boundary is machine-enforced: [[oracleValidMaxDocs]] makes
    // Verify omit this oracle above the verified corpus size.
    "m05_joint_media_survivors" -> m05OracleSql,
    // m05b: the maintained (index + mergeClusters) path must equal the
    // full-recompute m05 — same oracle, same validity bound
    "m05b_joint_media_survivors_indexed" -> m05OracleSql,
    "d02_minhash_lsh" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                 for i in range(1, len(w)-1)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents))
        |SELECT doc_a, doc_b, ((20000*i + u) // (2*u)) / 10000.0 AS jaccard
        |FROM (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh,b.sh)) AS BIGINT) AS i,
        |  CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS BIGINT) AS u
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |WHERE i / CAST(u AS DOUBLE) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d04_ngram_jaccard" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                 for i in range(1, len(w)-1)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents))
        |SELECT doc_a, doc_b, ((20000*i + u) // (2*u)) / 10000.0 AS jaccard
        |FROM (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh,b.sh)) AS BIGINT) AS i,
        |  CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS BIGINT) AS u
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |WHERE i / CAST(u AS DOUBLE) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    // d03: the engine's banded-LSH pair machinery vs a brute
    // hamming≤5 self-join over the EXPORTED signature frame (the
    // in-suite brute set-equality spec, moved into the driver gate).
    // bit_count over xor of BIGINTs is two's-complement on both
    // engines, so signed 64-bit signatures compare exactly. Valid
    // below the bucket-cap regime only (oracleValidMaxDocs): over-cap
    // buckets trade boundary pairs for connectivity by design.
    "d03_simhash" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM read_parquet('__EXPORTS__/d03_sigs/*.parquet') a
        |JOIN read_parquet('__EXPORTS__/d03_sigs/*.parquet') b
        | ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // m03/m04/m06: same conversion — the decode+hash pass is the
    // export (no DuckDB image/audio/video codec), the pair machinery
    // is the oracle. As of r17 the oracle join is the BANDED
    // (pigeonhole-exhaustive, provably = brute within hamming ≤5)
    // form, so it stays linear-ish and runs at the Tier-2 sf10 scale.
    "m03_image_neardup" -> bandedPairOracleSql("m03_sigs"),
    "m04_audio_neardup" -> bandedPairOracleSql("m04_sigs"),
    "m06_video_neardup" -> bandedPairOracleSql("m06_sigs"),
    "d05_embedding_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 2) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,
    // d15: the full SemDeDup decision frame re-derived in SQL from the
    // EXPORTED trained centroids (k-means has no DuckDB equivalent;
    // everything downstream does): the d06 planted-corpus CTE, flat
    // argmax assignment (ties -> lowest cell, matching the
    // NearestCentroid kernel), csim against the assigned cell,
    // within-cell >=tau pairing, and the published keep policy — each
    // pair drops its (centroid_sim, id)-greater member.
    "d15_semantic_dedup" ->
      """WITH corpus0 AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        | UNION ALL
        | SELECT vec_id + 1000000,
        |  [embedding[i] * (1.0 + 0.1*cos(i-1)) for i in range(1, len(embedding)+1)]
        | FROM embeddings WHERE vec_id < 20),
        |normed AS (
        | SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM corpus0),
        |cents AS (
        | SELECT cell, cv FROM read_parquet('__EXPORTS__/d15_cents/*.parquet')),
        |assigned AS (
        | SELECT vec_id, v, norm, cell, list_dot_product(v, cv)/norm AS csim,
        |  row_number() OVER (PARTITION BY vec_id
        |   ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
        | FROM normed, cents),
        |members AS (SELECT vec_id, v, norm, cell, csim FROM assigned WHERE rn = 1),
        |drops AS (
        | SELECT DISTINCT CASE WHEN a.csim > b.csim
        |    OR (a.csim = b.csim AND a.vec_id > b.vec_id)
        |   THEN a.vec_id ELSE b.vec_id END AS vec_id
        | FROM members a JOIN members b
        |  ON a.cell = b.cell AND a.vec_id < b.vec_id
        | WHERE list_dot_product(a.v, b.v)/(a.norm*b.norm) >= 0.7)
        |SELECT m.vec_id, m.cell, round(m.csim, 4) AS centroid_sim,
        | CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
        |FROM members m LEFT JOIN drops d ON m.vec_id = d.vec_id
        |ORDER BY m.vec_id""".stripMargin,
    // d15b: the incremental probe's decision-UPDATE frame from the
    // persisted index's exported frozen centroids — corpus (vec_id%3<>0)
    // and delta (%3=0) both assigned flat-argmax, new drops from
    // delta-vs-corpus and delta-vs-delta >=tau pairs only, output =
    // delta decision rows plus retroactively dropped corpus rows
    // (SemDedupIndex.decisionUpdates' exact contract).
    "d15b_semantic_dedup_indexed" ->
      """WITH corpus0 AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        | UNION ALL
        | SELECT vec_id + 1000000,
        |  [embedding[i] * (1.0 + 0.1*cos(i-1)) for i in range(1, len(embedding)+1)]
        | FROM embeddings WHERE vec_id < 20),
        |normed AS (
        | SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM corpus0),
        |cents AS (
        | SELECT cell, cv FROM read_parquet('__EXPORTS__/d15b_cents/*.parquet')),
        |assigned AS (
        | SELECT vec_id, v, norm, cell, list_dot_product(v, cv)/norm AS csim,
        |  row_number() OVER (PARTITION BY vec_id
        |   ORDER BY list_dot_product(v, cv) DESC, cell ASC) AS rn
        | FROM normed, cents),
        |members AS (SELECT vec_id, v, norm, cell, csim FROM assigned WHERE rn = 1),
        |corpus AS (SELECT * FROM members WHERE vec_id % 3 <> 0),
        |delta  AS (SELECT * FROM members WHERE vec_id % 3 = 0),
        |pairs AS (
        | SELECT d.vec_id AS id_a, d.csim AS ca, c.vec_id AS id_b, c.csim AS cb
        | FROM delta d JOIN corpus c ON d.cell = c.cell
        | WHERE list_dot_product(d.v, c.v)/(d.norm*c.norm) >= 0.7
        | UNION ALL
        | SELECT a.vec_id, a.csim, b.vec_id, b.csim
        | FROM delta a JOIN delta b ON a.cell = b.cell AND a.vec_id < b.vec_id
        | WHERE list_dot_product(a.v, b.v)/(a.norm*b.norm) >= 0.7),
        |newdrops AS (
        | SELECT DISTINCT CASE WHEN ca > cb OR (ca = cb AND id_a > id_b)
        |   THEN id_a ELSE id_b END AS vec_id FROM pairs)
        |SELECT vec_id, cell, centroid_sim, is_dup FROM (
        | SELECT d.vec_id, d.cell, round(d.csim, 4) AS centroid_sim,
        |  CAST(CASE WHEN nd.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
        | FROM delta d LEFT JOIN newdrops nd ON d.vec_id = nd.vec_id
        | UNION ALL
        | SELECT c.vec_id, c.cell, round(c.csim, 4) AS centroid_sim,
        |  CAST(1 AS BIGINT) AS is_dup
        | FROM corpus c JOIN newdrops nd ON c.vec_id = nd.vec_id)
        |ORDER BY vec_id""".stripMargin,
    // production near-dup threshold: same machinery, corpus-sized
    // signature depth (Dedup.adaptiveEmbBits — bucket count grows with
    // the corpus, so candidate volume stays O(n·tables) instead of the
    // Θ(n²/2^bits) a fixed depth gives). The corpus plants 20 perturbed
    // re-entries (cosine ≈ 0.99) IDENTICALLY on both engines
    // (Dedup.plantedProductionCorpus ↔ the CTE below): the synthetic
    // corpus's own max pair cosine is ~0.51, so without planting this
    // row compares 0 rows against 0 rows and proves nothing. Note the
    // family's recall is probabilistic at the exact τ=0.8 boundary
    // (collision ≈ 0.98 at the 12-bit floor, decaying with depth); the
    // planted pairs sit at ≈0.99 where collision ≈ 1 at every depth,
    // which is what lets an LSH result hash-match exact all-pairs SQL.
    "d06_embedding_neardup_prod" ->
      """WITH corpus AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
        | UNION ALL
        | SELECT vec_id + 1000000,
        |  [embedding[i] * (1.0 + 0.1*cos(i-1)) for i in range(1, len(embedding)+1)]
        | FROM embeddings WHERE vec_id < 20)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 2) AS cosine
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8
        |ORDER BY vec_a, vec_b""".stripMargin,
    // incremental form of d02: corpus (doc_id % 3 != 0) lives in a
    // persisted signature index; the delta (doc_id % 3 == 0) plays the
    // incoming batch — result = exact near-dup pairs touching the delta
    "d07_incremental_neardup" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                 for i in range(1, len(w)-1)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents))
        |SELECT doc_a, doc_b, ((20000*i + u) // (2*u)) / 10000.0 AS jaccard
        |FROM (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh,b.sh)) AS BIGINT) AS i,
        |  CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS BIGINT) AS u
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE a.doc_id % 3 = 0 OR b.doc_id % 3 = 0)
        |WHERE i / CAST(u AS DOUBLE) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    // connected components over the exact pair graph — the oracle walks
    // the transitive closure with a recursive CTE and takes each node's
    // min reachable id; Spark side is log-round pointer-jump propagation
    "d08_dedup_clusters" -> CcClosureOracleSql,
    // d14 is d08's decision maintained INCREMENTALLY (persisted corpus
    // cluster frame + delta contracted-CC merge) — by contract it must
    // equal the full recompute, so the oracle is d08's verbatim
    "d14_incremental_clusters" -> CcClosureOracleSql,
    // d08's closure semantics over the EMBEDDING pair graph (planted
    // corpus mirrored from d06 — same CTE, same non-vacuity argument)
    "d09_emb_dedup_clusters" ->
      """WITH RECURSIVE corpus AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
        | UNION ALL
        | SELECT vec_id + 1000000,
        |  [embedding[i] * (1.0 + 0.1*cos(i-1)) for i in range(1, len(embedding)+1)]
        | FROM embeddings WHERE vec_id < 20),
        |pairs AS (
        | SELECT a.vec_id AS va, b.vec_id AS vb
        | FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        | WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8),
        |edges AS (
        | SELECT va AS u, vb AS v FROM pairs
        | UNION
        | SELECT vb AS u, va AS v FROM pairs),
        |reach AS (
        | SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        | UNION
        | SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u)
        |SELECT u AS vec_id, min(r) AS cluster_id
        |FROM reach GROUP BY u ORDER BY vec_id""".stripMargin,
    // the corpus after dedup: drop non-min members of every closure
    // component (keep each cluster's min doc + all unpaired docs)
    "d10_dedup_survivors" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                 for i in range(1, len(w)-1)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.sh,b.sh))
        |  / CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS DOUBLE) >= 0.8),
        |edges AS (
        | SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION
        | SELECT doc_b AS u, doc_a AS v FROM pairs),
        |reach AS (
        | SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
        | UNION
        | SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u),
        |dropped AS (
        | SELECT u FROM reach GROUP BY u HAVING min(r) <> u)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT u FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    // substring dedup coverage: distinct 8-token windows per doc; df
    // counts DOCUMENTS sharing a window (per-doc windows are distinct);
    // counts compare exactly because the Spark side aggregates 64-bit
    // window hashes (collision ≈ 2⁻⁶⁴), the same argument as d02/d04
    "d11_substring_dedup" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                 ||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]
        |                 for i in range(1, len(w)-6)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |inv AS (SELECT doc_id, unnest(sh) AS h FROM sh),
        |dfh AS (SELECT h, count(*) AS dfh FROM inv GROUP BY h)
        |SELECT doc_id, count(*) AS n_windows,
        | CAST(sum(CASE WHEN dfh >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
        | ((20000*CAST(sum(CASE WHEN dfh >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |   + CAST(count(*) AS BIGINT))
        |  // (2*CAST(count(*) AS BIGINT))) / 10000.0 AS dup_ratio
        |FROM inv JOIN dfh USING (h)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // cross-modal survivors: the d10 text closure AND the embedding
    // closure over the drop-planted corpus (planted ids BELOW their
    // twins, so the real doc is the non-min drop), drop if non-min in
    // either modality
    "d12_joint_survivors" ->
      """WITH RECURSIVE sh AS (
        | SELECT doc_id,
        |  list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                 for i in range(1, len(w)-1)]) AS sh
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |tpairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        | WHERE len(list_intersect(a.sh,b.sh))
        |  / CAST(len(a.sh)+len(b.sh)-len(list_intersect(a.sh,b.sh)) AS DOUBLE) >= 0.8),
        |tedges AS (
        | SELECT doc_a AS u, doc_b AS v FROM tpairs
        | UNION
        | SELECT doc_b AS u, doc_a AS v FROM tpairs),
        |treach AS (
        | SELECT u, u AS r FROM (SELECT DISTINCT u FROM tedges)
        | UNION
        | SELECT e.u, treach.r FROM tedges e JOIN treach ON e.v = treach.u),
        |tdropped AS (
        | SELECT u FROM treach GROUP BY u HAVING min(r) <> u),
        |corpus AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
        | UNION ALL
        | SELECT -(vec_id + 1),
        |  [embedding[i] * (1.0 + 0.1*cos(i-1)) for i in range(1, len(embedding)+1)]
        | FROM embeddings WHERE vec_id < 20),
        |epairs AS (
        | SELECT a.vec_id AS va, b.vec_id AS vb
        | FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        | WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8),
        |eedges AS (
        | SELECT va AS u, vb AS v FROM epairs
        | UNION
        | SELECT vb AS u, va AS v FROM epairs),
        |ereach AS (
        | SELECT u, u AS r FROM (SELECT DISTINCT u FROM eedges)
        | UNION
        | SELECT e.u, ereach.r FROM eedges e JOIN ereach ON e.v = ereach.u),
        |edropped AS (
        | SELECT u FROM ereach GROUP BY u HAVING min(r) <> u)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT u FROM tdropped)
        |  AND doc_id NOT IN (SELECT u FROM edropped)
        |ORDER BY doc_id""".stripMargin,
    // incremental form of d06 over the drop-planted corpus: the corpus
    // (vec_id % 3 != 0) lives in a persisted embedding-LSH index; the
    // delta (vec_id % 3 == 0) plays the incoming batch — result =
    // exact production-τ pairs touching the delta (both engines use
    // C-style % so negative planted ids split identically)
    "d13_incremental_emb_neardup" ->
      """WITH corpus AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
        | UNION ALL
        | SELECT -(vec_id + 1),
        |  [embedding[i] * (1.0 + 0.1*cos(i-1)) for i in range(1, len(embedding)+1)]
        | FROM embeddings WHERE vec_id < 20)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 2) AS cosine
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE (a.vec_id % 3 = 0 OR b.vec_id % 3 = 0)
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.8
        |ORDER BY vec_a, vec_b""".stripMargin,
    // m01 — the stub-decode feature summary, re-derived in FULL by the
    // oracle: the stub's 8-bin byte histogram over the utf8 text
    // stand-in content reduces, on this pure-ASCII corpus, to regex
    // char-class counts (bin1 = bytes 0x20–0x3f, bin3 = 0x60–0x7f;
    // the corpus contains no other byte — probed at sf0.01/sf0.1)
    "m01_multimodal_features" ->
      """SELECT modality, count(*) AS n,
        | round(avg(CAST(strlen(text) AS DOUBLE)), 2) AS avg_bytes,
        | round(avg(length(regexp_replace(text, '[^\x20-\x3f]', '', 'g'))
        |           / CAST(strlen(text) AS DOUBLE)), 4) AS avg_f1,
        | round(avg(length(regexp_replace(text, '[^\x60-\x7f]', '', 'g'))
        |           / CAST(strlen(text) AS DOUBLE)), 4) AS avg_f3
        |FROM (SELECT CASE CAST(doc_id % 3 AS INT)
        |        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
        |        AS modality, text
        |      FROM documents) t
        |GROUP BY modality ORDER BY modality""".stripMargin,
    // m02 — real-codec decode summary: counts + planted geometry
    // re-derived from documents; the image rows' decoded bin-1 luma
    // mass recomputed EXACTLY from the text bytes the synthesizer
    // cycled into the 256 gray pixels (PNG lossless; BT.601 integer
    // luma of (v,v,v) = v); the lossy/analytic parts (JPEG video
    // histograms, sine RMS) ride the feat_ok gate pinned to 1
    "m02_media_decode" ->
      """WITH m AS (
        | SELECT doc_id, text,
        |  CASE CAST(doc_id % 3 AS INT)
        |   WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        | FROM documents),
        |imgf AS (
        | SELECT doc_id,
        |  len(list_filter(range(0, 256),
        |      i -> substr(text, CAST(i % strlen(text) AS INT) + 1, 1) <= '?'))
        |    / 256.0 AS f1
        | FROM m WHERE modality = 'image')
        |SELECT m.modality, count(*) AS n, count(*) AS n_decoded,
        | round(CASE m.modality WHEN 'audio' THEN 0.0 ELSE 16.0 END, 2) AS avg_width,
        | round(CASE m.modality WHEN 'audio' THEN 8000.0 ELSE 0.0 END, 2) AS avg_rate,
        | round(CASE m.modality WHEN 'image' THEN 0.0
        |        WHEN 'audio' THEN 0.05 ELSE 0.3 END, 4) AS avg_duration,
        | round(avg(imgf.f1), 4) AS img_f1,
        | CAST(1 AS BIGINT) AS feat_ok
        |FROM m LEFT JOIN imgf USING (doc_id)
        |GROUP BY m.modality ORDER BY m.modality""".stripMargin,
    // a01/a02 — bound-assertion encoding (r16 verdict #1): the oracle
    // recomputes the EXACT side and pins the within-3σ gate to literal
    // 1. If the engine's HLL estimate drifts past 3·rsd (p=12 →
    // 4.875 %), the engine emits 0, the oracle says 1, the row fails.
    "a01_approx_distinct" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS exact_users,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a02_hll_merge" ->
      """SELECT count(DISTINCT user_id) AS exact_users,
        | count(DISTINCT event_type) AS n_sketches,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM events""".stripMargin,
    "s01_ann_brute" ->
      """SELECT query_id, rank, neighbor_id, cosine FROM (
        | SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
        |             e.vec_id) AS BIGINT) AS rank,
        |  round(CAST(list_cosine_similarity(q.embedding, e.embedding) AS DOUBLE), 2) AS cosine
        | FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        | WHERE q.vec_id < 5) t
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // s02–s05 — recall bound-assertion (r16 verdict #2): DuckDB
    // recomputes the exact brute top-k itself (s01's machinery),
    // re-scores the engine's exported approx neighbor sets against it,
    // and pins the above-floor gate to literal 1. A recall regression
    // below 0.8 — or a buggy engine-side recall computation — fails
    // the row. Ties in the brute ranking are exact-equality ties
    // (planted duplicate vectors), broken by vec_id identically on
    // both engines (the 16-round-green s01 hash pins that agreement).
    "s02_ann_lsh" -> annRecallOracleSql("s02_ann"),
    "s03_ann_ivf" -> annRecallOracleSql("s03_ann"),
    "s04_ann_ivfpq" -> annRecallOracleSql("s04_ann"),
    "s05_ann_pq_index" -> annRecallOracleSql("s05_ann"),
  )

  /** The 56 combination-LSH bucket keys as DuckDB SQL — the EXACT
    * mirror of [[graft.operators.Dedup.hammingBlockKeys]] (8×8-bit
    * blocks, 3-of-8 combos, combo index disambiguating the key space).
    * By the pigeonhole argument (≤5 flips leave ≥3 of 8 blocks intact)
    * the banded self-join below is EXHAUSTIVE within hamming ≤5 — it
    * equals the brute all-pairs join at ANY corpus size (verified
    * empirically: identical row sets at sf0.01/sf0.1) while costing
    * O(n·56 + candidates) instead of O(n²), which is what lets the
    * media oracles ride the Tier-2 sf10 gate (500k docs) where a brute
    * join is 2.5e11 comparisons. `>>` sign-extension is masked off per
    * block, so signed 64-bit sigs key identically on both engines. */
  private def bandedKeysSql: String = {
    val combos = for {
      i <- 0 until 8; j <- i + 1 until 8; k <- j + 1 until 8
    } yield (i, j, k)
    combos.zipWithIndex.map { case ((i, j, k), t) =>
      s"(((sig >> ${8 * i}) & 255) | (((sig >> ${8 * j}) & 255) << 8)" +
        s" | (((sig >> ${8 * k}) & 255) << 16) | (CAST($t AS BIGINT) << 24))"
    }.mkString("[", ", ", "]")
  }

  /** Banded hamming-≤5 pair oracle over an exported 64-bit sig frame —
    * the m03/m04/m06 shape (media_a, media_b, hamming). */
  private def bandedPairOracleSql(export: String): String =
    s"""WITH k AS (
       | SELECT media_id, sig, unnest($bandedKeysSql) AS key
       | FROM read_parquet('__EXPORTS__/$export/*.parquet'))
       |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       | CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |FROM k a JOIN k b ON a.key = b.key AND a.media_id < b.media_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 5
       |ORDER BY media_a, media_b""".stripMargin

  /** One modality's per-doc KEEP set for the m05 oracle: its base
    * partition (doc_id//div — /4 families for image/audio, /8 for
    * video) REFINED by the cross-group hamming-≤5 edges the hash
    * density produces at scale (discovered from the exported sig frame
    * via the exhaustive banding), closed at the GROUP level (edges are
    * rare — 2 at 500k docs — so the recursion is family-count-sized),
    * keep = docs equal to their component's min doc. Group mins come
    * from the documents table itself, never from id arithmetic, so
    * partial/unaligned id ranges stay correct. */
  private def modalityKeepSql(name: String, export: String, div: Int): String =
    s"""xe_$name AS (
       | SELECT DISTINCT least(a.media_id // $div, b.media_id // $div) AS u,
       |        greatest(a.media_id // $div, b.media_id // $div) AS v
       | FROM (SELECT media_id, sig, unnest($bandedKeysSql) AS key
       |       FROM read_parquet('__EXPORTS__/$export/*.parquet')) a
       | JOIN (SELECT media_id, sig, unnest($bandedKeysSql) AS key
       |       FROM read_parquet('__EXPORTS__/$export/*.parquet')) b
       |  ON a.key = b.key AND a.media_id < b.media_id
       | WHERE bit_count(xor(a.sig, b.sig)) <= 5
       |   AND a.media_id // $div != b.media_id // $div),
       |gm_$name AS (SELECT doc_id // $div AS g, min(doc_id) AS gmin
       |             FROM documents GROUP BY 1),
       |e2_$name AS (SELECT u, v FROM xe_$name
       |             UNION SELECT v AS u, u AS v FROM xe_$name),
       |r_$name AS (
       | SELECT g AS u, g AS r FROM gm_$name
       | UNION
       | SELECT e.u, r_$name.r FROM e2_$name e JOIN r_$name ON e.v = r_$name.u),
       |c_$name AS (SELECT u AS g, min(r) AS root FROM r_$name GROUP BY u),
       |rootmin_$name AS (
       | SELECT c.root, min(gm.gmin) AS cmin
       | FROM c_$name c JOIN gm_$name gm ON c.g = gm.g GROUP BY c.root),
       |keep_$name AS (
       | SELECT d.doc_id FROM documents d
       | JOIN c_$name c ON d.doc_id // $div = c.g
       | JOIN rootmin_$name rm ON c.root = rm.root
       | WHERE d.doc_id = rm.cmin)""".stripMargin

  /** m05/m05b oracle — the engine's joint decision re-derived
    * per modality: a document survives iff it is the min member (or
    * unpaired) of its near-dup closure in EVERY modality — image and
    * audio close over the doc_id//4 base families, video over the
    * COARSER doc_id//8 chains, each refined by that modality's OWN
    * cross-family edges ([[modalityKeepSql]]). The union-graph
    * closure is NOT the decision semantics: an audio edge into the
    * far half of a /8 family must not drop the near half's min (the
    * one-row sf10 divergence that falsified the first r17 draft —
    * engine right, union-closure oracle wrong). At driver SFs the
    * edge sets are empty and this reduces to the r16 family-min
    * oracle; at the Tier-2 sf10 corpus (500k docs, 2 real
    * cross-family audio edges) it is r17-verified row-exact.
    * Within-family closure = the family itself remains the geometry
    * invariant the in-suite closure specs pin. */
  private def m05OracleSql: String =
    s"""WITH RECURSIVE
       |${modalityKeepSql("img", "m03_sigs", 4)},
       |${modalityKeepSql("aud", "m04_sigs", 4)},
       |${modalityKeepSql("vid", "m06_sigs", 8)}
       |SELECT d.doc_id, d.n_chars FROM documents d
       |JOIN keep_img USING (doc_id)
       |JOIN keep_aud USING (doc_id)
       |JOIN keep_vid USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** The shared s02–s05 oracle: brute top-10 per query in SQL, recall
    * of the exported approx set against it, gate pinned to 1. */
  private def annRecallOracleSql(export: String): String =
    s"""WITH brute AS (
       | SELECT query_id, neighbor_id FROM (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY q.vec_id
       |     ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
       |              e.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < 5) t
       | WHERE rank <= 10),
       |ap AS (
       | SELECT query_id, neighbor_id
       | FROM read_parquet('__EXPORTS__/$export/*.parquet')),
       |hit AS (
       | SELECT query_id, count(*) AS n_hit
       | FROM brute JOIN ap USING (query_id, neighbor_id) GROUP BY 1),
       |n AS (SELECT query_id, count(*) AS n_exact FROM brute GROUP BY 1)
       |SELECT n.query_id,
       | round(coalesce(n_hit, 0) / CAST(n_exact AS DOUBLE), 2) AS recall,
       | CAST(1 AS BIGINT) AS above_floor
       |FROM n LEFT JOIN hit USING (query_id)
       |ORDER BY query_id""".stripMargin
}
