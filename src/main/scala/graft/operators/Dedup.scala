package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, each built as a
  * shuffle-minimal distributed plan:
  *
  *  - exact:        one hash-groupBy on the content fingerprint
  *  - MinHash+LSH:  shingle→64-perm signature→banded bucket-join→exact
  *                  jaccard verify (candidates only, never O(n²))
  *  - SimHash:      64-bit signature in one groupBy, 4-block hamming LSH
  *  - n-gram:       exact jaccard via inverted-index (shared-shingle) join
  *  - embedding:    cosine near-dup pairs (brute at test SF; the LSH scale
  *                  path lives in Similarity.annLsh)
  *
  * Skew note (100 TB): every bucket-join here caps its bucket width
  * (`MaxBucket`) so a degenerate bucket (stop-shingle, all-zero band)
  * cannot produce a quadratic task; dropped buckets only lose candidates
  * that near-dup pairs would find in their 31 other bands.
  */
object Dedup {

  private val ShingleK = 3
  private val NumHashes = 64
  private val Bands = 32 // × rows-per-band 2 → P(miss | j=0.8) ≈ 1e-14
  private val JaccardThreshold = 0.8
  private val MaxBucket = 64

  // Every operator has a FRAME-parametric form (the library API: any
  // DataFrame carrying the canonical columns `doc_id`/`text`, or
  // `vec_id`/`embedding` for vectors — rename upstream if needed) and a
  // (SparkSession, dir) wrapper binding it to the driver-contract
  // benchmark table.

  /** Exact dedup: hash-groupBy on md5(text); survivor = min doc_id.
    * Reference analogue: delete-duplicates has no counterpart — minIODB
    * dedups only by record id; content dedup is the pipeline addition. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5Fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("fp"), col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  def exact(s: SparkSession, dir: String): DataFrame =
    exact(Tables.load(s, dir, "documents"))

  /** Distinct shingles as 64-bit hashes — the working representation for
    * signatures, inverted-index joins AND exact verification (8-byte
    * elements instead of ~20-byte strings; collisions ~2⁻⁶⁴). One fused
    * codegen kernel ([[graft.functions.HashedShingles]]) does
    * shingle→join→distinct→hash in a single pass per row — the 4-layer
    * HOF composition it replaced ran interpreted boxed lambdas per
    * element and materialized every shingle string (value-equivalence
    * pinned in LshKernelsSpec).
    *
    * Materialized via localCheckpoint: every consumer uses this frame
    * 2–3 times (self-joins, signature + verify) and Spark recomputes
    * shared subtrees per use — tokenize+shingle+hash is the single most
    * expensive map stage here (measured 3.5× end-to-end win). At cluster
    * scale the equivalent is a persisted/cached shingle table. */
  private[graft] def hashedShingleSets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.functions.LshFunctions.hashedShingles(
          docs.sparkSession, tokens(col("text")), ShingleK).as("hs"))
      .localCheckpoint(true)

  /** Candidate pairs from equal-width bucket join, skew-bounded.
    *
    * Small buckets emit all pairs. Buckets wider than MaxBucket are NOT
    * dropped — a mega-cluster of near-identical docs collides in EVERY
    * band, so dropping oversized buckets would lose exactly the heaviest
    * duplicate groups. Instead an oversized bucket emits a sorted CHAIN
    * (doc₁–doc₂, doc₂–doc₃, …) PLUS a STAR to the bucket minimum
    * (min–docᵢ): 2(w−1) links, still linear per bucket, and every member
    * gets TWO independently verified connections — a single chain
    * neighbor failing the exact verify (bucket co-location does not
    * imply pairwise near-dup) no longer disconnects the member; it
    * survives through the hub unless BOTH links fail. Residual
    * disclosure: pairs inside an oversized bucket beyond those 2(w−1)
    * links are never exact-verified, so a capped bucket whose members
    * are NOT mutually near-dup can still lose pairs — the price of
    * bounding a w²-degenerate bucket to linear work. */
  /** `dedupe=false` skips the pair-level distinct — right when the
    * verify predicate is a cheap codegen'd scalar (re-verifying a pair
    * once per colliding bucket costs less than shuffling every candidate
    * for dedup; survivors are distinct'd after the threshold filter).
    *
    * `rider` names a small fixed-width column (e.g. an 8-byte simhash
    * signature) carried THROUGH the bucket join and emitted per side as
    * `<rider>_a` / `<rider>_b` — verifying off the pair stream directly
    * instead of re-attaching per-doc state with two candidate-sized
    * joins afterward. Only worth it when the rider is a few bytes: it
    * widens every bucket row in the window sort and the self-join
    * shuffle, which is why the shingle-verified callers (set-valued
    * state) prune-and-join instead.
    *
    * (Measured alternative: deriving bucket sizes from a count
    * aggregate + join and emitting pairs via collect_list + double
    * explode replaces the window sort with TWO sort-merge-join sorts
    * and an ObjectHashAggregate — 2-4× slower on every caller at
    * sf0.1. The single window pass stays.) */
  private[graft] def bucketPairs(buckets: DataFrame, keyCols: Seq[String],
      cap: Int = MaxBucket, dedupe: Boolean = true,
      rider: Option[String] = None): DataFrame = {
    val key = keyCols.map(col)
    val carried = "doc_id" +: rider.toSeq // per-doc columns emitted per side
    def asSide(suffix: String) = carried.map(c => col(c).as(s"${c}_$suffix"))
    val outNames = carried.map(_ + "_a") ++ carried.map(_ + "_b")
    // The a/b join sides each recompute the slim bucket window from the
    // (checkpointed) signature frame rather than materializing it once:
    // eagerly checkpointing the windowed stream was measured 2-3× worse
    // (rounds 8 AND 9 — it serializes the full width), and replacing
    // the window with a hash-agg of over-cap keys + raw-side hash join
    // was ALSO measured worse for the rider-carrying d03 family (18 →
    // 25 s at sf10: the window's exchange amortizes the join's shuffle
    // and pre-sorts its inputs, which a hash build of the raw stream
    // forfeits). What DID survive measurement: the over-cap rows are
    // checkpointed once (tiny by construction — only skew buckets) so
    // the chain and star branches share one window pass instead of
    // recomputing two, and an empty over stream — the common corpus —
    // skips both branches' jobs entirely. 4 window passes → 3.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key: _*)
    val sized = buckets
      .withColumn("bucket_n", count(lit(1)).over(w))
    val small = sized.filter(col("bucket_n") <= cap)
    val a = small.select(asSide("a") ++ key: _*)
    val b = small.select(asSide("b") ++ key: _*)
    val allPairs = a.join(b, keyCols).filter(col("doc_id_a") < col("doc_id_b"))
      .select(outNames.map(col): _*)
    val over = sized.filter(col("bucket_n") > cap).localCheckpoint(true)
    val pairs = if (over.isEmpty) allPairs else {
      val wOrd = w.orderBy(col("doc_id"))
      val chained = carried
        .foldLeft(over) { (df, c) => df.withColumn(s"${c}_b", lead(col(c), 1).over(wOrd)) }
        .filter(col("doc_id_b").isNotNull)
        .select(asSide("a") ++ carried.map(c => col(s"${c}_b")): _*)
      val starred = over
        .withColumn("mn", min(struct(carried.map(col): _*)).over(w))
        .filter(col("doc_id") =!= col("mn.doc_id"))
        .select(carried.map(c => col(s"mn.$c").as(s"${c}_a")) ++ asSide("b"): _*)
      allPairs.unionByName(chained).unionByName(starred)
    }
    val renamed = pairs.withColumnsRenamed(Map("doc_id_a" -> "doc_a", "doc_id_b" -> "doc_b"))
    if (dedupe) renamed.distinct() else renamed
  }

  /** Exact-jaccard verification of candidate pairs against the shingle
    * table. The shingle side is semi-pruned to the candidate doc ids
    * BEFORE the pair joins: un-pruned, a corpus-sized shingle table
    * either gets broadcast whole into the verify (measured ~1.5 GB ×2
    * at the 500k-doc sf10 point — a non-plan for a real cluster) or shuffle-
    * joined twice; pruned, it is scanned once and only candidate rows
    * (collision-sized by LSH construction) enter any join. Pairs are
    * materialized because they feed both the prune and the verify, and
    * the [[bcastIf]] guard degrades the prune to a shuffle semi-join if
    * a pathological corpus makes the candidate set itself huge. */
  private def jaccardVerified(sh: DataFrame, pairs0: DataFrame): DataFrame = {
    // count observed on the checkpoint job itself (one barrier, not two)
    val (pairs, nPairs) = graft.core.Caching.checkpointCounted(pairs0)
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val candSh = sh.join(
      bcastIf(40, 2 * nPairs)(candDocs), Seq("doc_id"), "left_semi")
    pairs
      .join(candSh.select(col("doc_id").as("doc_a"), col("hs").as("sh_a")), "doc_a")
      .join(candSh.select(col("doc_id").as("doc_b"), col("hs").as("sh_b")), "doc_b")
      .withColumn("interI", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("unionI",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("interI"))
      // filter on the RAW double jaccard (same IEEE division as the
      // oracle's WHERE — threshold compares are tie-safe because both
      // engines divide the same integers); the DISPLAYED 4-decimal
      // value is integer-rounded like every rational display column
      // (a jaccard such as 5/32 = 0.15625 sits exactly on a decimal
      // half, where float round(x, 4) is engine-dependent)
      .withColumn("jaccard_raw",
        col("interI").cast("double") / col("unionI").cast("double"))
      .filter(col("jaccard_raw") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"),
        graft.functions.TextFunctions.ratio4(col("interI"), col("unionI")).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + banded LSH near-dup pairs, exact-verified.
    *
    * All 64 signature slots come from ONE fused codegen kernel
    * ([[graft.functions.MinHashSigs]] — bit-identical to the
    * `array_min(transform(hs, h_i))` composition, which ran 64
    * interpreted higher-order lambdas per row). The signature stage is
    * still a pure map with ZERO shuffle (the explode+groupBy
    * formulation shuffles every (doc, shingle) row; at 100 TB that
    * shuffle dwarfs the candidate join this feeds). The only shuffles
    * are the tiny band-bucket join and the verify join. */
  /** (doc_id, band, bh) — the banded MinHash signature rows the LSH
    * bucket join keys on; shared by the one-shot path ([[minhashLsh]])
    * and the persisted index ([[graft.index.SignatureIndex]]). Pure map,
    * zero shuffle. */
  private[graft] def bandedSignatures(hashed: DataFrame): DataFrame = {
    val s = hashed.sparkSession
    val sig = hashed.select(col("doc_id"),
      graft.functions.LshFunctions.minhashSigs(s, col("hs"), NumHashes).as("ms"))
    // element_at is 1-based: slot m_{2b} is element 2b+1
    val bandHashes: Seq[Column] = (0 until Bands).map(bnd =>
      xxhash64(lit(bnd),
        element_at(col("ms"), 2 * bnd + 1), element_at(col("ms"), 2 * bnd + 2)))
    sig.select(col("doc_id"), posexplode(array(bandHashes: _*)).as(Seq("band", "bh")))
  }

  def minhashLsh(docs: DataFrame): DataFrame =
    minhashLshFrames(hashedShingleSets(docs))

  /** [[minhashLsh]] over an ALREADY-materialized hashed-shingle frame —
    * a builder that also persists the shingles (the fuzzy pool index)
    * shares ONE corpus shingle pass instead of paying two
    * corpus-sized checkpoints side by side (the p04 sf100 OOM lesson:
    * block-manager peak is a budget like any other).
    *
    * Key the bucket join on bh ALONE: each band hash is already seeded
    * with its band index (xxhash64(bnd, m₂ᵦ, m₂ᵦ₊₁) above), so (band,
    * bh) and (bh) induce the same buckets up to 2⁻⁶⁴ cross-band
    * collisions — the collision class hashedShingles already accepts.
    * Column pruning then drops `band` before the exchange: the window
    * and self-join streams narrow 20 → 16 B/row and the key compare
    * halves (the d03 table-fusion precedent, one level simpler). */
  private[graft] def minhashLshFrames(hashed: DataFrame): DataFrame =
    jaccardVerified(hashed, bucketPairs(bandedSignatures(hashed), Seq("bh")))

  def minhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashLsh(graft.core.Parallelize.spread(
      Tables.load(s, dir, "documents"), col("doc_id")))

  /** Max hamming distance for SimHash near-dups. Short small-vocabulary
    * documents flip a few bits per token edit (measured: true near-dups
    * land at hamming ≤5, unrelated pairs concentrate at ≥6), so 5 is the
    * radius; the 8×8-bit block LSH guarantees recall up to hamming 7
    * (pigeonhole: ≤7 flips leave ≥1 block intact). */
  private val MaxHamming = 5
  private val SimBlocks = 8

  /** SimHash near-dup pairs: 64-bit signature per doc via the fused
    * [[graft.functions.SimHashSig]] kernel (one codegen pass per row —
    * bit-identical to the earlier explode + 64-bit-sum-aggregate
    * formulation, WITHOUT its per-token shuffle), then COMBINATORIAL
    * block LSH and exact hamming verify via bit_count.
    *
    * Bucket keys are 3-block combinations (Manku et al., WWW'07
    * §3.1.1 — the rotated-table scheme solves the same problem): a
    * pair at hamming ≤ [[MaxHamming]]=5 flips at most 5 of the 8
    * blocks, leaving ≥3 intact, so SOME C(8,3) combination key matches
    * DETERMINISTICALLY — the same exact-recall contract as the old
    * single-block keys. The difference is scale: single 8-bit blocks
    * give only 8×256 = 2048 buckets TOTAL, so bucket width grows ∝ n
    * and the self-join is Θ(n²/256) — measured 63 s at the 500k-doc sf10, pure
    * quadratic hidden by small test SFs. 56 tables × 24-bit keys give
    * ~10⁶× the key space: expected width O(1), candidate volume
    * O(n·tables), and the skew tail (identical-signature clusters)
    * rides the shared [[bucketPairs]] cap with the same chain+star
    * disclosure as the MinHash path.
    *
    * Verify runs ON the pair stream: the 8-byte signature rides the
    * bucket rows through the self-join (`rider` in [[bucketPairs]]),
    * so hamming is a codegen'd `bit_count` over columns already
    * present — no candidate-sized attach joins, and the only shuffles
    * touching the n·56-row stream are the bucket window and the
    * bucket self-join. Thresholds BEFORE the distinct so the dedup
    * shuffle carries survivors only. */
  def simhash(docs: DataFrame): DataFrame =
    hamming64Pairs(simhashSigFrame(docs), "simhash", MaxHamming)
      .orderBy(col("doc_a"), col("doc_b"))

  /** The d03 signature frame (doc_id, simhash) — one fused-kernel
    * pass, shared by [[simhash]] and the driver-oracle export:
    * [[graft.Verify]] writes this frame to parquet and the DuckDB
    * oracle re-derives the pair set by brute hamming≤5 self-join
    * (`bit_count(xor(...))`), turning the in-suite brute
    * set-equality spec into a driver-green CORRECTNESS row. The
    * signature kernel itself stays engine-derived (deterministic
    * function of `text`); what the oracle independently validates is
    * the whole pair machinery — bucketing, cap, verify, dedup. */
  def simhashSigFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.LshFunctions.simhashSig(
        docs.sparkSession, tokens(col("text"))).as("simhash"))

  def simhashSigs(s: SparkSession, dir: String): DataFrame =
    simhashSigFrame(graft.core.Parallelize.spread(
      Tables.load(s, dir, "documents"), col("doc_id")))

  /** Generic 64-bit-signature hamming near-dup: the d03 bucket geometry
    * over ANY (doc_id, 64-bit signature) frame — text SimHash (d03) and
    * image dHash (m03) share it. `sigs` must carry `doc_id` and
    * `sigCol`; `maxHamming` must stay ≤ 7 for the 3-of-8 block keys'
    * deterministic-recall pigeonhole to hold. Returns
    * (doc_a, doc_b, hamming), unsorted. */
  /** The 56 combination-LSH bucket keys (3-of-8 block combos, table
    * index fused into bits 24+) for one 64-bit signature, as an
    * array<long> column. SHARED between the batch pair path
    * ([[hamming64Pairs]]), the persisted media-hash index
    * ([[graft.index.MediaHashIndex]]) and the incremental probe
    * ([[incrementalHamming64PairsFrames]]) — one geometry, so
    * index-side buckets and probe-side buckets always agree.
    *
    * The table index is FUSED into the bucket key (bits 24+) instead
    * of riding as its own column: the n·56-row bucket stream crosses
    * two shuffles (count window + self-join), so one slim long key
    * instead of (tbl, bv) cuts the dominant exchange's row width —
    * measured 22.3 → 15.2 s warm standalone on the 500k-doc sf10
    * point. Distinct tables stay distinct buckets, so the cap/recall
    * contract is untouched. */
  private[graft] def hammingBlockKeys(sig: Column): Column = {
    val bitsPerBlock = 64 / SimBlocks
    val mask = (1L << bitsPerBlock) - 1
    val blk = (0 until SimBlocks).map(b =>
      shiftright(sig, b * bitsPerBlock).bitwiseAND(mask))
    val combos = (for {
      i <- 0 until SimBlocks; j <- i + 1 until SimBlocks; k <- j + 1 until SimBlocks
    } yield blk(i) + shiftleft(blk(j), bitsPerBlock) + shiftleft(blk(k), 2 * bitsPerBlock))
      .zipWithIndex.map { case (c, t) => c + lit(t.toLong << (3 * bitsPerBlock)) }
    array(combos: _*)
  }

  private[graft] def hamming64Pairs(sigFrame: DataFrame, sigCol: String,
      maxHamming: Int): DataFrame = {
    val sigs = sigFrame.localCheckpoint(true) // fans out 4 ways in bucketPairs
    hamming64PairsFromBuckets(
      sigs.select(col("doc_id"), col(sigCol),
        explode(hammingBlockKeys(col(sigCol))).as("bk")),
      sigCol, maxHamming)
  }

  /** [[hamming64Pairs]] entered at an already-derived (doc_id, sigCol,
    * bk) bucket frame — the persisted media-hash index stores exactly
    * this ([[graft.index.MediaHashIndex]]), so a maintained corpus
    * re-derives pairs without re-exploding (or, upstream, re-decoding)
    * anything. */
  private[graft] def hamming64PairsFromBuckets(buckets: DataFrame,
      sigCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= SimBlocks - 1,
      s"3-of-8 block keys guarantee recall only to hamming ${SimBlocks - 1}")
    bucketPairs(buckets, Seq("bk"), dedupe = false, rider = Some(sigCol))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col(s"${sigCol}_a").bitwiseXOR(col(s"${sigCol}_b")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  def simhash(s: SparkSession, dir: String): DataFrame =
    simhash(graft.core.Parallelize.spread(
      Tables.load(s, dir, "documents"), col("doc_id")))

  /** Hamming near-dup pairs TOUCHING a delta batch of 64-bit
    * signatures, probed against a PERSISTED bucket corpus
    * ([[graft.index.MediaHashIndex]]) — the d07 incremental shape for
    * the signature-hamming family (text SimHash, image dHash, audio
    * eHash). At 100 TB of media the decode+hash pass dominates all
    * downstream cost; this path hashes ONLY the delta and probes the
    * persisted buckets, so per-batch work is delta-proportional.
    *
    * Shuffle shape mirrors [[incrementalPairsFrames]]: the delta's 56
    * bucket keys are a zero-shuffle map; the candidate join reads the
    * persisted bucket table with the delta side small enough that AQE
    * broadcasts it (no hard hint — an oversized delta degrades to a
    * shuffle join, the t09 lesson); bucket widths come from the
    * persisted ledger semi-pruned by a broadcast of the delta's keys.
    * Unlike the MinHash path there is NO attach join at all: the
    * 8-byte signature rides the bucket rows, so the hamming verify is
    * a codegen'd bit_count over columns already present.
    *
    * Result = [[hamming64Pairs]] over corpus∪delta restricted to
    * pairs with ≥1 side in the delta, for every bucket at or under
    * the shared [[MaxBucket]] cap. Over-cap buckets emit CONNECTIVITY
    * LINKS only, in both paths — but not the same links (batch chains
    * adjacent sorted members + stars to the min; this path links each
    * delta row to the bucket min): equivalent for
    * [[clustersFromPairs]] connectivity, NOT pairwise identical —
    * equivalence specs restrict to uncapped buckets, the
    * [[incrementalPairs]] contract verbatim.
    *
    * `deltaSigs` carries (media_id, sig); `corpusBuckets` is the
    * persisted (media_id, sig, bk) frame; `corpusCounts` the
    * persisted (bk, n, min_id, min_sig) ledger. Returns
    * (media_a, media_b, hamming), unsorted. */
  private[graft] def incrementalHamming64PairsFrames(deltaSigs: DataFrame,
      corpusBuckets: DataFrame, corpusCounts: DataFrame,
      maxHamming: Int): DataFrame = {
    require(maxHamming <= SimBlocks - 1,
      s"3-of-8 block keys guarantee recall only to hamming ${SimBlocks - 1}")
    // delta-sized ×56; consumed 4 ways (counts, normal join both sides,
    // hot links) — materialize once
    val dB = deltaSigs
      .select(col("media_id"), col("sig"),
        explode(hammingBlockKeys(col("sig"))).as("bk"))
      .localCheckpoint(true)
    val dCounts = dB.groupBy(col("bk"))
      .agg(count(lit(1)).as("dn"),
        min(struct(col("media_id"), col("sig"))).as("dmn"))
    // semi-prune the corpus ledger to delta-touched buckets (broadcast
    // of delta keys; footer-pruned via the bk-sorted layout), THEN the
    // outer merge's build side is delta-sized by construction
    val touched = corpusCounts
      .join(broadcast(dCounts.select(col("bk"))), Seq("bk"), "left_semi")
      .select(col("bk"), col("n"),
        struct(col("min_id").as("media_id"), col("min_sig").as("sig")).as("mn"))
    val hotB = touched
      .join(dCounts, Seq("bk"), "right_outer")
      .filter(coalesce(col("n"), lit(0L)) + col("dn") > MaxBucket)
      .select(col("bk"),
        least(coalesce(col("mn"), col("dmn")),
          coalesce(col("dmn"), col("mn"))).as("mn"))
      .localCheckpoint(true) // tiny by construction; broadcast-joined 2×
    val hotKeys = broadcast(hotB.select(col("bk")))
    val dNorm = dB.join(hotKeys, Seq("bk"), "left_anti")
    val allNorm = corpusBuckets.unionByName(dB)
      .join(hotKeys, Seq("bk"), "left_anti")
    val cand = dNorm
      .select(col("media_id").as("da"), col("sig").as("sa"), col("bk"))
      .join(allNorm.select(col("media_id").as("ob"), col("sig").as("sb"),
        col("bk")), Seq("bk"))
      .filter(col("da") =!= col("ob"))
      .select(least(col("da"), col("ob")).as("media_a"),
        greatest(col("da"), col("ob")).as("media_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
    val hotPairs = dB.join(broadcast(hotB), Seq("bk"))
      .filter(col("media_id") =!= col("mn.media_id"))
      .select(least(col("media_id"), col("mn.media_id")).as("media_a"),
        greatest(col("media_id"), col("mn.media_id")).as("media_b"),
        bit_count(col("sig").bitwiseXOR(col("mn.sig")))
          .cast("long").as("hamming"))
    cand.unionByName(hotPairs)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Document-frequency cap for the n-gram inverted index. A shingle
    * shared by k documents emits k² pair hits in the self-join, so one
    * stop-shingle ("in the the", boilerplate headers) turns the join
    * quadratic at scale. Shingles with df > cap are dropped from
    * CANDIDATE GENERATION only — the exact array_intersect verify runs
    * on full shingle sets, so dropped shingles still count toward the
    * reported jaccard. A pair is lost only if EVERY shared shingle is a
    * stop-shingle; at τ=0.8 a pair shares ≥80% of its shingles, so its
    * overlap being all-stop means the documents are themselves
    * boilerplate (the chain-capped minhash path, which buckets on
    * signatures instead of raw shingles, still reports those). */
  private val NgramDfCap = 64

  /** Candidate pairs that can possibly reach the jaccard threshold,
    * from a df-capped inverted index. Package-visible for the planted
    * stop-shingle fan-out spec.
    *
    * Scheme (exact, no uncapped hot key):
    *  1. The CAPPED-OUT shingle set (df > dfCap) is tiny by definition —
    *     only stop-shingles exceed the cap — so it aggregates map-side
    *     into a small frame and is excluded from the self-join via
    *     broadcast anti-join (a codegen'd filter, no extra shuffle).
    *  2. Pair intersections counted over the capped index UNDERCOUNT by
    *     at most min(hot_a, hot_b) (per-doc hot-shingle counts — a tiny
    *     broadcast). j = I/(na+nb−I) is increasing in I, so the bound
    *     I + min(hot_a, hot_b) bounds the true jaccard from above:
    *     pairs below threshold at the bound are provably out.
    *  3. Survivors (≈ final result size) get the exact array_intersect
    *     verify in [[jaccardVerified]], which restores the capped
    *     shingles to the REPORTED jaccard value.
    * A pair whose ENTIRE overlap is stop-shingles shares no capped
    * shingle and stays invisible here — such documents are boilerplate
    * by construction; the minhash signature path (d02), which buckets
    * on signatures rather than raw shingles, still reports them.
    * The size-ratio prefilter (j ≤ min/max ⇒ min·10 ≥ max·8 at τ=0.8)
    * is exact-preserving and fused into the self-join.
    *
    * (Measured alternative: classic prefix filtering — index only each
    * doc's n−⌈τ·n⌉+1 rarest shingles — ran at parity at sf0.1 (the
    * df-join + per-doc ranking window overhead cancels the 5× smaller
    * self-join) and carries a float-arithmetic exactness trap in the
    * prefix-length computation; its asymptotic win only materializes
    * once the self-join dominates those two extra passes. A HASH-ordered
    * prefix variant — array_sort + slice per row, no df window at all —
    * was also measured at parity with identical results (candidates
    * 402k→82k at sf0.1, but the exact array_intersect verify on 82k
    * pairs costs what this intersection-count screen saves: the screen
    * passes ~hundreds to verify, not 82k). The positional PPJoin bound
    * prunes only ~25% of single-hit pairs at this corpus's shingle
    * collision rate, so it does not change the balance.) */
  private[graft] def ngramCandidates(sh: DataFrame, dfCap: Int): DataFrame = {
    val inv = sh.select(col("doc_id"), size(col("hs")).as("n_sh"),
      explode(col("hs")).as("h"))
    // hot and hotPerDoc are each consumed by multiple joins below; the
    // printed plan carries their corpus-sized input agg once per
    // consumer, and only runtime stage reuse deduplicates it. The
    // eager checkpoint makes the once-ness structural instead of an
    // optimizer courtesy (measured cost-neutral at sf10 — reuse was in
    // fact kicking in — but a plan-shape regression here would triple
    // a full corpus pass silently). Both frames are small by
    // construction: hot is the stop-shingle vocabulary, hotPerDoc is
    // 16 B per doc that carries one.
    val hot = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select(col("h"))
      .localCheckpoint(true)
    val capped = inv.join(broadcast(hot), Seq("h"), "left_anti")
    val hotPerDoc = inv.join(broadcast(hot), Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hot"))
      .localCheckpoint(true)
    // The inverted-index self-join must NOT sort-merge: both sides are
    // the corpus-sized (doc, shingle) stream, and the two 20M-row sorts
    // were the candidates phase's dominant cost at sf10 (measured
    // 20.3 → 11.6 s with a hash build). The build side is sized through
    // the shared per-partition byte budget, same contract as the
    // embedding family's verify joins.
    val invRows = sh.select(sum(size(col("hs")))).head.getLong(0)
    val pairHits = capped.select(col("doc_id").as("doc_a"), col("n_sh").as("na"), col("h"))
      .join(bcastOrHashIf(28, invRows, Seq("h"))(
        capped.select(col("doc_id").as("doc_b"), col("n_sh").as("nb"), col("h"))), "h")
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) * 10 >= greatest(col("na"), col("nb")) * 8)
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).cast("double").as("inter_c"))
    // NO broadcast hint on hotPerDoc: in the motivating boilerplate
    // corpus a stop-shingle appears in EVERY doc, making hotPerDoc
    // O(all docs) — AQE broadcasts it when it is actually small and
    // shuffle-joins otherwise. (`hot` above stays broadcast: it is
    // distinct stop-SHINGLES, bounded by the shingle vocabulary.)
    pairHits
      .join(hotPerDoc.select(col("doc_id").as("doc_a"), col("n_hot").as("hot_a")),
        Seq("doc_a"), "left")
      .join(hotPerDoc.select(col("doc_id").as("doc_b"), col("n_hot").as("hot_b")),
        Seq("doc_b"), "left")
      .withColumn("i_ub", col("inter_c") +
        least(coalesce(col("hot_a"), lit(0L)), coalesce(col("hot_b"), lit(0L))))
      .filter(col("i_ub") / (col("na") + col("nb") - col("i_ub")) >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram jaccard pairs: df-capped inverted-index join for
    * candidates (8-byte hash join keys; bounded per-shingle fan-out),
    * exact jaccard verify over the full hashed shingle sets — no O(n²)
    * cross join, no uncapped hot key. 64-bit hash collisions are ~2⁻⁶⁴
    * per shingle pair. */
  def ngramJaccard(docs: DataFrame): DataFrame = {
    val sh = hashedShingleSets(docs)
    jaccardVerified(sh, ngramCandidates(sh, NgramDfCap))
  }

  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccard(graft.core.Parallelize.spread(
      Tables.load(s, dir, "documents"), col("doc_id")))

  // ---- embedding near-dup: hyperplane-LSH candidates + exact verify ----

  /** Signature tables for embedding LSH: `EmbTables` tables of `EmbBits`
    * sign bits each, every bit the sign of a projection onto a
    * hash-derived hyperplane (component for plane i, dim d =
    * `xxhash64(EmbSeed, i, d)` scaled into [-1, 1) — deterministic, no
    * RNG, nothing driver-materialized).
    *
    * Tuning honesty: the d05 threshold (cosine 0.45 — bit-agreement
    * p = 1-acos(0.45)/π ≈ 0.648) sits deep inside the ambient-similarity
    * tail, where LSH prunes weakly no matter the parameters: 6 bits ×
    * 64 tables keeps ~63% of all pairs as candidates at test SF (the
    * win is the JOIN SHAPE — bucketed equi-join, never a materialized
    * cross product). At production near-dup thresholds (cosine ≥ 0.8)
    * the adaptive-depth family keeps candidate volume O(n·tables) —
    * see [[adaptiveEmbBits]]. `EmbSeed` is validated by exhaustive comparison
    * against the exact pair set at sf0.01 and sf0.1 (recall 1.0;
    * per-pair miss ≈ 0.7% per random seed at the exact threshold
    * boundary — the seed is pinned so the result is reproducible, and
    * PipelineOpsSpec re-asserts recall vs the brute pairs). */
  private val EmbSeed = 1L
  private val EmbBits = 6
  private val EmbTables = 64

  /** Production-threshold family (τ ≥ 0.8): 32 MULTI-PROBED tables of
    * corpus-sized depth ([[adaptiveEmbBits]]). Deeper bits at τ=0.45
    * would NOT help: ambient agreement (0.55) is too close to boundary
    * agreement (0.648) for any (bits, tables) to separate them — that τ
    * keeps ~63% of pairs by the geometry of the corpus, which is why
    * 0.45 is the labeled exact-sweep config and 0.8 the production
    * one. */
  private val EmbBitsFloor = 16
  private val EmbBitsMax = 26
  private[graft] val ProbeEmbTables = 32
  /** Production-family skew cap — larger than the MinHash [[MaxBucket]]
    * because an oversized bucket here means ≥256 vectors agreeing on
    * 16–26 sign projections: a genuinely correlated cluster whose
    * within-bucket pairs deserve the exact verify up to a bound (w ≤ 256
    * → ≤ 32,640 window-local pairs, a bounded single task). Beyond the
    * cap: chain + star links only (see [[bucketPairs]]' disclosure). */
  private[graft] val ProdMaxBucket = 256
  val ProductionEmbTau = 0.8

  /** Signature depth for the production family as a function of corpus
    * size — the load-bearing scale fix: FIXED bits fix the bucket count
    * (2^bits per table), so bucket width grows ∝ n and within-bucket
    * all-pairs candidate work grows Θ(n²/2^bits) — a constant-factor
    * reduction, not an asymptotic one (measured: a fixed-12-bit
    * config did not complete at the 200k-vector scaling point). Growing
    * bits with log₂(n) keeps buckets ∝ n, expected bucket width O(1),
    * and candidate volume O(n·tables·bits).
    *
    * bits = clamp(16, ⌈log₂ n⌉ + 1, 26) targets expected random-bucket
    * width ≈ 0.5. Boundary-pair recall is held up by MULTI-PROBING
    * ([[embCandidatesProbed]]): with single-bit probes the per-table
    * collision probability for a pair at agreement p is
    * p^bits + bits·p^(bits−1)(1−p) instead of p^bits, so at exactly
    * τ=0.8 (p ≈ 0.795) recall across 32 tables is ≈ 0.99 at 16 bits
    * and ≈ 0.92 at 19 bits (the 200k-vector regime — measured ≈ 0.73
    * in the r7 UN-probed 64-table family, the disclosed decay this
    * family exists to fix; pinned by the boundary-recall spec). True
    * near-dups (cosine ≥ 0.95, p ≥ 0.93) stay ≥ 0.999 through 26
    * bits. Past 19 bits the table count grows with depth
    * ([[adaptiveEmbTables]] — the tables ∝ p^−bits mitigation the r8
    * record disclosed as formula-only), holding family boundary
    * recall ≈ 0.92 through the 26-bit cap instead of letting it decay
    * to ≈ 0.75 at ~2M vectors. */
  private[graft] def adaptiveEmbBits(n: Long): Int = {
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))
    math.min(EmbBitsMax, math.max(EmbBitsFloor, ceilLog2 + 1))
  }

  /** Signature-table count as a function of depth — the deep-regime
    * recall mitigation. Per-table boundary collision at agreement p is
    * c(b) = p^b + b·p^(b−1)(1−p) (the ≤1-bit multi-probe geometry),
    * which decays ~p per extra bit; family recall 1−(1−c(b))^T holds
    * constant only if T grows ∝ 1/c(b). Policy: T = 32 through 19
    * bits (every config measured through the r8 ladder — 200k vectors
    * = 19 bits — is unchanged), then T(b) = ⌈32·c(19)/c(b)⌉ capped at
    * [[MaxProbeTables]]: ≈40 @ 20 bits, ≈57 @ 22 (the ~2M-vector
    * regime), ≈122 @ 26 — model recall ≥ 0.91 at exactly τ=0.8 at
    * every depth (spec-pinned; measured end-to-end by the deep-regime
    * RecallProbe point in the scaling record). Probe volume per vector
    * grows T·(b/2+1): 1.8× at 2M vectors, 5× at the 26-bit cap —
    * linear-in-n candidate work at a growing constant, the disclosed
    * price of flat recall. */
  private[graft] val ProbeTablesBaseBits = 19
  private[graft] val MaxProbeTables = 128
  private[graft] def adaptiveEmbTables(bits: Int): Int =
    if (bits <= ProbeTablesBaseBits) ProbeEmbTables
    else {
      val p = 1.0 - math.acos(ProductionEmbTau) / math.Pi
      def c(b: Int): Double =
        math.pow(p, b) + b * math.pow(p, b - 1) * (1 - p)
      math.min(MaxProbeTables,
        math.ceil(ProbeEmbTables * c(ProbeTablesBaseBits) / c(bits)).toInt)
    }

  /** (vec_id, tbl, sig) — one row per signature table per vector, via
    * the codegen'd [[graft.functions.HyperplaneSigs]] kernel (one fused
    * multiply-add loop per row against the process-cached plane matrix;
    * zero shuffle — the first shuffle in the dedup plan is the tiny
    * bucket join this feeds). */
  private[graft] def embSignatures(s: SparkSession, e: DataFrame, bits: Int,
      tables: Int = EmbTables): DataFrame =
    e.select(col("vec_id"),
      posexplode(graft.functions.LshFunctions.lshSigs(
        s, col("v"), EmbSeed, bits, tables)).as(Seq("tbl", "sig")))

  /** 63-bit sign signature for the rider screen: independent planes
    * ([[ScreenSeed]] ≠ [[EmbSeed]], so screen bits are independent of
    * the bucketing bits a candidate pair already agrees on), one long
    * per vector, computed by the same codegen kernel as the bucketing
    * signatures. */
  private[graft] val ScreenSeed = 2L
  private[graft] val ScreenBits = 63
  /** Max disagreeing screen bits for a candidate pair to survive. Per
    * bit, P(disagree) = acos(cosine)/π, so across 63 independent bits
    * (exact binomial tails): a pair at exactly τ=0.8 (p=0.205,
    * mean 12.9) passes w.p. 0.9996; true near-dups (cosine ≥0.95,
    * mean ≤6.5) pass w.p. ≈1−1e-9; ambient candidates — the probe
    * stream's bulk, cosine ~0–0.3 (mean 25–32 bits) — are killed at
    * 59–96%. The 4e-4 boundary loss is absorbed into the family's
    * disclosed probabilistic recall (the probe-decay term is 200×
    * larger); the boundary-recall spec measures the END-TO-END family,
    * screen included. */
  private[graft] val ScreenMaxDisagree = 24

  /** Multi-probe LSH candidate pairs for the production family.
    *
    * Base signatures go into buckets as usual; each vector additionally
    * PROBES every single-bit 0→1 flip of its signature. A pair whose
    * signatures differ in exactly one bit has a 0 on one side at the
    * differing position, so that side's flip probe lands exactly on the
    * other's base signature — all ≤1-bit-mismatch pairs are found by
    * the probe geometry deterministically, then subject to the rider
    * screen's 4e-4 boundary loss below — while emitting only
    * (bits/2 + 1) expected probes
    * per row instead of (bits + 1) (flipping 1→0 too would find each
    * such pair twice). This is the same recall mechanism as
    * [[Similarity.annLsh]]'s query probes, applied symmetrically to the
    * self-join: per-table boundary collision becomes
    * p^bits + bits·p^(bits−1)(1−p), which at 19 bits / τ=0.8 lifts
    * family recall from ≈0.73 (r7, un-probed) to ≈0.92.
    *
    * Probe volume is the family's cost center — O(n·tables·bits/2)
    * rows (57M at the 200k-vector point), each join hit emitting a
    * candidate pair. So the pair stream is screened IN-STAGE, the
    * instant pairs form: both join sides carry the vector's 63-bit
    * sign signature ([[ScreenSeed]] planes — the d03 simhash-rider
    * pattern), and a fused bit_count XOR kills pairs disagreeing on
    * more than [[ScreenMaxDisagree]] bits before anything downstream
    * — no join, no shuffle, three codegen ops per pair, ~6× fewer
    * rows reaching the sketch screen (measured at the 200k point).
    *
    * Skew shape: probes join only into buckets at or under
    * [[ProdMaxBucket]] (within-cap pairs — including same-bucket pairs,
    * via the un-flipped probe — are exact-verified downstream);
    * oversized buckets emit chain + star-to-min connectivity links,
    * same disclosure as [[bucketPairs]] — connectivity links BYPASS the
    * rider screen (they exist to keep capped clusters connected, and
    * the exact verify still applies to them). Output pairs are NOT
    * deduplicated — the caller screens at the sketch bound next, then
    * distincts survivors (collision multiplicity is ~1 for ambient
    * pairs, so screening before the distinct saves a full-width
    * shuffle). */
  private[operators] def embCandidatesProbed(e: DataFrame, bits: Int): DataFrame = {
    val s = e.sparkSession
    val tables = adaptiveEmbTables(bits)
    // materialized once (36 B/row with the rider): consumed by the
    // bucket census, the probe generator, and the join build side —
    // without the checkpoint the signature kernel would re-run per
    // consumer
    val n = e.count() // cheap: every caller hands a checkpointed frame
    val base = e.select(col("vec_id"),
        element_at(graft.functions.LshFunctions.lshSigs(
          s, col("v"), ScreenSeed, ScreenBits, 1), 1).as("ss"),
        posexplode(graft.functions.LshFunctions.lshSigs(
          s, col("v"), EmbSeed, bits, tables)).as(Seq("tbl", "sig")))
      .localCheckpoint(true)
    // bucket census via one slim groupBy instead of a window over every
    // base row: only the (rare) OVERSIZED keys flow back, broadcast —
    // the full signature stream never pays a window shuffle+sort
    val hot = base.groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") > ProdMaxBucket)
      .select(col("tbl"), col("sig"))
    val small = base.join(broadcast(hot), Seq("tbl", "sig"), "left_anti")
    // chain + star links for the oversized buckets; the window sort now
    // touches only their members, not the corpus
    val overW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tbl"), col("sig"))
    val over = base.join(broadcast(hot), Seq("tbl", "sig"), "left_semi")
    val chained = over
      .withColumn("nxt", lead(col("vec_id"), 1).over(overW.orderBy(col("vec_id"))))
      .filter(col("nxt").isNotNull)
      .select(col("vec_id").as("vec_a"), col("nxt").as("vec_b"))
    val starred = over
      .withColumn("mn", min(col("vec_id")).over(overW))
      .filter(col("vec_id") =!= col("mn"))
      .select(col("mn").as("vec_a"), col("vec_id").as("vec_b"))
    val flips = array((0 until bits).map(i =>
      when(col("sig").bitwiseAND(lit(1L << i)) === 0,
        col("sig").bitwiseOR(lit(1L << i)))): _*)
    val probes = base.select(col("vec_id").as("pa"), col("ss").as("ssa"), col("tbl"),
      explode(concat(array(col("sig")), array_compact(flips))).as("sig"))
    // the probe stream is the big side (bits/2+1 rows per signature);
    // under the byte budget the base side broadcasts and probes flow
    // through a codegen'd hash join with ZERO shuffle. The rider
    // screen fires in the SAME codegen stage the join output lives in:
    // a killed pair costs one popcount, never a downstream row.
    probes
      .join(bcastOrHashIf(36, n * tables, Seq("tbl", "sig"))(
        small.select(col("vec_id").as("pb"), col("ss").as("ssb"), col("tbl"), col("sig"))),
        Seq("tbl", "sig"))
      .filter(col("pa") =!= col("pb") &&
        bit_count(col("ssa").bitwiseXOR(col("ssb"))) <= ScreenMaxDisagree)
      .select(least(col("pa"), col("pb")).as("vec_a"),
        greatest(col("pa"), col("pb")).as("vec_b"))
      .unionByName(chained)
      .unionByName(starred)
  }

  /** Embedding frame normalized to (vec_id, v, norm) — the pre-checkpoint
    * plan, package-visible so PlanSpec-style pins can assert the parquet
    * scan prunes to (vec_id, embedding) (the checkpointed form truncates
    * lineage, hiding the scan from the executed plan). */
  private[graft] def embNormedPlan(e: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions
    e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", VectorFunctions.norm(e.sparkSession, col("v")))
  }

  /** [[embNormedPlan]] materialized once (signatures + verify reuse it
    * 2–3×). */
  private[graft] def embNormed(e: DataFrame): DataFrame =
    embNormedPlan(e).localCheckpoint(true)

  /** Un-probed LSH candidate pairs — the 6-bit exact-sweep family
    * (package-visible so the keep-rate spec can count candidates per
    * signature depth). The family has only 64 buckets/table and its
    * contract is keeping ~63% of all pairs, so its buckets are wide BY
    * DESIGN (cap 4096 = backstop for a degenerate all-equal-sign
    * bucket only). The production family goes through
    * [[embCandidatesProbed]] instead. */
  private[operators] def embCandidates(e: DataFrame, bits: Int): DataFrame =
    bucketPairs(
      embSignatures(e.sparkSession, e, bits)
        .select(col("vec_id").as("doc_id"), col("tbl"), col("sig")),
      Seq("tbl", "sig"),
      cap = 4096, dedupe = false)
      .withColumnRenamed("doc_a", "vec_a").withColumnRenamed("doc_b", "vec_b")

  /** Byte budget under which a per-vector side table (signatures,
    * sketches, full vectors) is explicitly broadcast instead of
    * shuffle-joined: the candidate stream then flows through codegen'd
    * broadcast-hash joins with ZERO shuffle. 32 MB is comfortably
    * executor-resident; the decision is per-TABLE (rows × est. row
    * bytes), so at the 200k-vector sf10 point the 136 B sketches still
    * broadcast while the 512 B full vectors correctly fall back to a
    * shuffle join — the fast path degrades per table, never masking a
    * scale problem wholesale. */
  private val BroadcastBytes = 32L << 20
  private[graft] def bcastIf(rowBytes: Long, rows: Long)(df: DataFrame): DataFrame =
    if (rows * rowBytes <= BroadcastBytes) broadcast(df) else df

  /** [[bcastIf]] whose over-budget fallback is a SHUFFLED HASH join
    * hint instead of Spark's default sort-merge: the per-vector side
    * tables this guards are corpus-sized (bounded rows/partition after
    * the shuffle — a few MB of hash map), while the candidate/probe
    * stream they join is 10–300× larger. Sort-merge sorts that stream
    * (at the 200k-vector point: a 67M-row sort whose spill-merge
    * read-ahead buffers can OOM a small heap); hash-building the
    * bounded side streams the big side with no sort at all. */
  /** Per-partition byte budget for a shuffled-hash BUILD side. A
    * shuffled-hash build cannot spill while the map is built, so the
    * per-task build is a hard memory bound: at the default 32 shuffle
    * partitions a 4 GB side (2M vectors × 57 tables at the 22-bit
    * regime) hands every task a ~128 MB build plus map overhead and
    * dies with "not enough memory to build hash map" — the first
    * deep-regime RecallProbe run found exactly this. Over-budget
    * sides repartition BY THE JOIN KEYS to ⌈bytes/budget⌉ partitions
    * (an explicit count AQE will not coalesce away); the probe side
    * co-partitions to the same count, so build memory per task stays
    * bounded at ANY corpus size — the property a 100 TB run needs.
    *
    * The budget must leave headroom for every CONCURRENTLY building
    * task: the first 5M-doc probe of d04 sized builds to a 64 MB
    * budget and died ("Can't acquire 67108864 bytes ... got 40810577")
    * because 32 parallel 64 MB acquisitions plus the probe-side read
    * buffers oversubscribed the execution pool. 16 MB × 32 tasks
    * = 512 MB of concurrent build memory — comfortable under any
    * executor sizing this engine targets — at the cost of more,
    * smaller tasks (which a cluster absorbs by scheduling).
    * `spark.graft.join.buildPartitionBytes` overrides.
    *
    * The fixed budget is additionally capped by the ACTUAL execution
    * pool (heap × spark.memory.fraction): Spark guarantees an active
    * task only pool/(2·slots), the hash map costs ~2× the estimated
    * row bytes (UnsafeRow padding + key entries), and the build shares
    * the slot with probe-side read buffers and key-skew overshoot — so
    * the budget degrades to pool/(16·slots), floor 1 MB. Found (and
    * the divisor calibrated) by the round-9 SpillProbe: d13/sn02 at
    * fraction 0.05 (≈107 MB pool, 8 slots) died with "not enough
    * memory to build hash map"; pool/8 builds (1.7 MB estimated ≈
    * 3.5 MB actual against a 6.7 MB share) STILL died, pool/16
    * completes — degrade, never OOM. At the default measurement sizing
    * (8 GB heap, fraction 0.6, 32 slots) the cap is 9.4 MB, which
    * re-partitions only builds past ~300 MB (the k>spp guard):
    * affected committed rows (d04, d13 family) were re-laddered.
    * An EXPLICIT `spark.graft.join.buildPartitionBytes` wins outright —
    * it is the cluster-tuning knob for operators who know their
    * executor sizing (local mode uses the driver JVM as the pool
    * proxy; cluster executors may out-size it). */
  private def buildPartitionBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.join.buildPartitionBytes") match {
      case Some(v) => v.toLong // the explicit cluster knob wins outright
      case None =>
        val frac = s.conf.getOption("spark.memory.fraction")
          .map(_.toDouble).getOrElse(0.6)
        val pool = (Runtime.getRuntime.maxMemory() * frac).toLong
        val slots = math.max(1, s.sparkContext.defaultParallelism)
        math.max(1L << 20, math.min(16L << 20, pool / (16L * slots)))
    }
  private[graft] def bcastOrHashIf(rowBytes: Long, rows: Long,
      keys: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val bytes = rows * rowBytes
    if (bytes <= BroadcastBytes) broadcast(df)
    else {
      val spp = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      val k = math.ceil(bytes.toDouble / buildPartitionBytes(df.sparkSession)).toInt
      val sized =
        if (keys.nonEmpty && k > spp) df.repartition(k, keys.map(col): _*)
        else df
      sized.hint("shuffle_hash")
    }
  }

  /** Cheap PRE-VERIFY screen sketch: norm-scaled prefix of the vector
    * plus the norm-scaled L2 mass of the remaining tail,
    * (pv = v[0:16]/‖v‖, pt = ‖v[16:]‖/‖v‖). For any pair,
    *   cosine(a,b) = ⟨pv_a, pv_b⟩ + ⟨tail_a, tail_b⟩/(‖a‖‖b‖)
    *               ≤ ⟨pv_a, pv_b⟩ + pt_a·pt_b            (Cauchy–Schwarz)
    * — a PROVABLE upper bound, so screening `ub ≥ τ` is
    * exact-preserving: no pair at or above the threshold is ever
    * dropped. For ambient pairs the bound sits near pt_a·pt_b ≈ the
    * tail energy fraction (≈ 0.75 for isotropic 64-dim vectors at a
    * 16-dim prefix) plus a ±0.06 prefix term — well under τ=0.8 — so
    * the screen kills most ambient candidates at 136 B/side instead of
    * the 512 B full vector (the verify-join traffic the r7 record
    * apportioned ~70% of d06's sf10 cost to). */
  private val ScreenPrefix = 16
  private[graft] def embSketch(e: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions
    val s = e.sparkSession
    val pv = slice(col("v"), 1, ScreenPrefix)
    e.select(col("vec_id"),
      transform(pv, x => x / col("norm")).as("pv"),
      (sqrt(greatest(lit(0.0),
        col("norm") * col("norm") - VectorFunctions.dot(s, pv, pv)))
        / col("norm")).as("pt"))
  }

  /** Embedding cosine near-dup pairs: LSH-bucketed candidates (equi-join
    * on (table, signature), skew-capped) + exact cosine verify — never
    * a cross product in the plan. Signature family follows the
    * threshold; the result-set guarantee is scoped per family:
    *  - τ < 0.8 → the 6-bit exact-sweep family ([[embCandidates]]),
    *    which keeps ~63% of all pairs as candidates: equal to the
    *    all-pairs result set, validated exhaustively at sf0.01/sf0.1
    *    under the pinned [[EmbSeed]] (recall 1.0; an unpinned seed
    *    misses ~0.7% of pairs sitting exactly at the threshold
    *    boundary).
    *  - τ ≥ 0.8 → the MULTI-PROBED production family
    *    ([[embCandidatesProbed]] at [[adaptiveEmbBits]] depth):
    *    PROBABILISTIC recall, not exact — a boundary pair at exactly
    *    τ=0.8 is found w.p. ≈0.99 at 16 bits, ≈0.92 at 19 bits (the
    *    200k-vector regime; boundary-recall spec pins the measured
    *    floor), decaying toward the 26-bit cap; true near-dups
    *    (cosine ≥ 0.95) stay ≥0.999 at every depth. PipelineOpsSpec
    *    pins result-set EQUALITY vs the brute all-pairs sweep on
    *    planted corpora, and the d06 DuckDB oracle re-checks it
    *    against exact SQL every round.
    *
    * Verify shape (the r7 record put ~70% of d06's sf10 cost in this
    * stage): the candidate stream is screened TWICE before the
    * expensive work — in-stage by the 63-bit sign rider
    * ([[ScreenMaxDisagree]]: one popcount per pair, kills the ambient
    * bulk at formation; probabilistic, 4e-4 boundary loss folded into
    * the family's disclosed recall), then by the provable
    * [[embSketch]] cosine upper bound — 136 B sketches attach instead
    * of 512 B vectors, and surviving ambient pairs die at the bound;
    * survivors are then distinct'd (result-sized) and only they pay
    * the full-vector exact-cosine join. Under the [[bcastIf]] byte
    * budget the sketch/vector sides broadcast and the candidate
    * stream never shuffles at all.
    * Per-query ANN over the same signatures is Similarity.annLsh. */
  def embeddingNearDup(embeddings: DataFrame,
      tau: Double = 0.45): DataFrame = {
    import graft.functions.VectorFunctions
    val s = embeddings.sparkSession
    val e = embNormed(embeddings)
    // e is eagerly checkpointed, so sizing the family costs one cheap
    // count over materialized blocks, not a second scan of the source
    val n = e.count()
    val production = tau >= ProductionEmbTau
    // sketch: 16 scaled doubles + pt; side: full vector + norm — keyed
    // by the pair column each join probes on
    val skSide = (k: String, df: DataFrame) => bcastOrHashIf(160, n, Seq(k))(df)
    val side = (k: String, df: DataFrame) => bcastOrHashIf(540, n, Seq(k))(df)
    def verified(cand: DataFrame): DataFrame = cand
      .join(side("vec_a", e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))), "vec_a")
      .join(side("vec_b", e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))), "vec_b")
      .withColumn("cosine", VectorFunctions.dot(s, col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 2).as("cosine"))
    val out =
      if (production) {
        // screen at the sketch bound BEFORE the distinct: ambient
        // multiplicity is ~1, so the distinct shuffle is survivor-sized
        // instead of candidate-sized, and the distinct means each
        // surviving pair pays its full-vector verify exactly once
        val sk = embSketch(e)
        verified(
          embCandidatesProbed(e, adaptiveEmbBits(n))
            .join(skSide("vec_a", sk.select(col("vec_id").as("vec_a"),
              col("pv").as("pva"), col("pt").as("pta"))), "vec_a")
            .join(skSide("vec_b", sk.select(col("vec_id").as("vec_b"),
              col("pv").as("pvb"), col("pt").as("ptb"))), "vec_b")
            .filter(VectorFunctions.dot(s, col("pva"), col("pvb"))
              + col("pta") * col("ptb") >= tau - 1e-9)
            .select(col("vec_a"), col("vec_b"))
            .distinct())
      } else {
        // sweep family: τ sits below the ambient tail-energy bound
        // (~0.75), so the sketch screen passes everything AND the
        // candidate set is a ~63% slice of ALL pairs — any pre-verify
        // distinct would shuffle that near-quadratic stream (measured
        // 57 s vs 6 s at the 20k-vector point). Instead candidates flow
        // straight through the broadcast verify (a pure codegen
        // pipeline, no shuffle) and only the tiny survivor set pays the
        // distinct that collision multiplicity (~4.7 tables/pair at 6
        // bits) makes necessary.
        verified(embCandidates(e, EmbBits)).distinct()
      }
    out.orderBy(col("vec_a"), col("vec_b"))
  }

  // No spread on the embeddings scan (r18 A/B, both sf0.1 and sf1:
  // spread 9.37/22.31 s vs raw 7.55/20.66 s on the d05/d06/d09/d12/d13
  // subset): the hyperplane-sig kernel is too cheap to amortize the
  // added exchange — the same cheap-kernel class as the t-family.
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    embeddingNearDup(Tables.load(s, dir, "embeddings"))

  /** The d06 demo corpus: `embeddings` plus a perturbed re-entry of the
    * first 20 vectors under `vec_id + 10⁶` (deterministic per-dimension
    * scaling, cosine(base, perturbed) ≈ 0.99 ≫ τ=0.8). The synthetic
    * corpus's own max pair cosine is ~0.51, so an UN-planted τ=0.8
    * result set is empty at every test SF and a correctness row over it
    * proves nothing; the planting is mirrored verbatim in the d06
    * DuckDB oracle SQL (same precedent as t08's injected PII), so the
    * oracle compares a NON-EMPTY production-threshold result. Double
    * arithmetic on both engines: float→double widening is exact, so
    * the only cross-engine drift is ≤1-ulp libm cos() — invisible at
    * the round(·,2) the oracle hashes and ~0.2 away from the τ
    * decision boundary. */
  def plantedProductionCorpus(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * (1.0 + 0.1*cos(i)))")
          .as("embedding"))
    base.unionByName(planted)
  }

  /** Production-threshold variant (τ=0.8, corpus-sized signature
    * depth): candidate volume stays O(n·tables) because the bucket
    * count grows with the corpus ([[adaptiveEmbBits]]) and the skew
    * tail is chain-capped — at the cost of boundary-pair recall
    * decaying with depth (disclosed in [[embeddingNearDup]]).
    * Demonstrated over [[plantedProductionCorpus]] so the result (and
    * its oracle row) is non-empty at test SFs. */
  def embeddingNearDupHi(s: SparkSession, dir: String): DataFrame =
    embeddingNearDup(plantedProductionCorpus(Tables.load(s, dir, "embeddings")),
      ProductionEmbTau)

  // ---- incremental near-dup against a persisted signature index ----

  /** Near-dup pairs TOUCHING a new ingest batch, against a persisted
    * corpus index ([[graft.index.SignatureIndex]]) — the daily-ingest
    * form of [[minhashLsh]]: a 100 TB corpus taking a 0.1% batch does
    * delta-sized signature work plus one candidate join, instead of
    * recomputing corpus-wide signatures per batch.
    *
    * Shuffle shape: the delta's signatures are a zero-shuffle map; the
    * candidate join reads the persisted band table but — the delta side
    * being small — AQE broadcasts it, so the CORPUS IS NEVER SHUFFLED
    * (no hard hint, per the t09 lesson: an oversized delta degrades to
    * a shuffle join instead of an OOM). Exact verify touches only
    * candidate rows: the candidate-pair doc ids are BROADCAST
    * semi-joined against the persisted shingle table first, so the
    * corpus shingles are scanned but never shuffled or broadcast —
    * without the prune the shingle union out-grows the broadcast
    * threshold with the corpus and the verify falls back to two
    * corpus-sized shuffle joins.
    * Bucket widths come from the index's persisted per-bucket counts,
    * first semi-joined against the BROADCAST set of delta bucket keys
    * (delta-sized; footer-pruned via the bh-sorted layout) — the
    * pruned frame is then small enough that the outer merge with the
    * delta's own counts builds on the pruned side, so corpus-wide
    * counts are scanned once and never shuffled.
    *
    * Result = the [[minhashLsh]] pair set restricted to pairs with ≥1
    * side in the delta, for every bucket at or under the SHARED
    * [[MaxBucket]] cap (P(band miss | j=0.8) ≈ 1e-14). Buckets wider
    * than the cap emit CONNECTIVITY LINKS only, in both paths — but
    * not the same links: the batch path chains adjacent sorted members,
    * the incremental path links each delta row to the bucket's min doc.
    * Equivalent for [[clustersFromPairs]] connectivity (both keep the
    * mega-cluster one component), NOT pairwise identical — callers
    * comparing pair sets across the two paths must restrict to
    * uncapped buckets (the batch-equivalence spec plants both
    * regimes). */
  def incrementalPairs(deltaDocs: DataFrame, indexPath: String): DataFrame = {
    val s = deltaDocs.sparkSession
    val idx = graft.index.SignatureIndex
    // Both materialized: deltaSh feeds the band derivation AND the
    // verify-side union — un-checkpointed, the verify job re-shingles
    // the whole delta from raw text a second time.
    val deltaSh = hashedShingleSets(deltaDocs).localCheckpoint(true)
    val deltaBands = bandedSignatures(deltaSh).localCheckpoint(true)
    incrementalPairsFrames(deltaSh, deltaBands,
      idx.bands(s, indexPath), idx.shingles(s, indexPath),
      idx.counts(s, indexPath))
  }

  /** Frame-level core of [[incrementalPairs]] — the corpus side arrives
    * as (bands, shingles, counts) frames instead of an index path, so a
    * caller can union extra corpus-side state onto the persisted index
    * (the streaming scorer unions its committed-but-uncompacted batch
    * log, [[graft.streaming.StreamingNearDup]]). `corpusCounts` may
    * carry more than one row per (band, bh) — e.g. index counts plus a
    * pending-log recount — they are merged after the delta-key
    * semi-prune, where the frame is delta-sized by construction. */
  private[graft] def incrementalPairsFrames(deltaSh: DataFrame,
      deltaBands: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, corpusCounts: DataFrame): DataFrame = {
    val deltaCounts = deltaBands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("dn"), min(col("doc_id")).as("dmin"))
    // Spark cannot build the STREAM (delta) side of a right-outer
    // broadcast join, so an un-pruned outer merge would broadcast or
    // shuffle the full corpus counts table — semi-prune it down to the
    // delta-touched buckets first (broadcast of delta keys), then the
    // outer merge's build side is delta-sized by construction.
    val touchedCounts = corpusCounts
      .join(broadcast(deltaCounts.select(col("band"), col("bh"))),
        Seq("band", "bh"), "left_semi")
      .groupBy(col("band"), col("bh"))
      .agg(sum(col("n")).as("n"), min(col("min_doc")).as("min_doc"))
    val hotB = touchedCounts
      .join(deltaCounts, Seq("band", "bh"), "right_outer")
      .filter(coalesce(col("n"), lit(0L)) + col("dn") > MaxBucket)
      .select(col("band"), col("bh"),
        least(coalesce(col("min_doc"), col("dmin")), col("dmin")).as("min_doc"))
      .localCheckpoint(true) // tiny by construction; broadcast-joined 3×

    val hotKeys = broadcast(hotB.select(col("band"), col("bh")))
    val dNorm = deltaBands.join(hotKeys, Seq("band", "bh"), "left_anti")
    val allNorm = corpusBands.unionByName(deltaBands)
      .join(hotKeys, Seq("band", "bh"), "left_anti")
    val cand = dNorm.select(col("doc_id").as("da"), col("band"), col("bh"))
      .join(allNorm.select(col("doc_id").as("ob"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("da") =!= col("ob"))
      .select(least(col("da"), col("ob")).as("doc_a"),
        greatest(col("da"), col("ob")).as("doc_b"))
    val hotPairs = deltaBands.join(broadcast(hotB), Seq("band", "bh"))
      .filter(col("doc_id") =!= col("min_doc"))
      .select(least(col("doc_id"), col("min_doc")).as("doc_a"),
        greatest(col("doc_id"), col("min_doc")).as("doc_b"))
    // The candidate-doc semi-prune of the corpus∪delta shingle union —
    // the step that keeps the verify delta-sized at any corpus size —
    // happens inside [[jaccardVerified]], shared with the batch paths.
    val pairs = cand.unionByName(hotPairs).distinct()
    jaccardVerified(corpusShingles.unionByName(deltaSh), pairs)
  }

  /** d07 driver binding: corpus = `doc_id % 3 != 0` (indexed once per
    * sf dir, tmp-cached — same immutable-testdata precedent as t07's
    * inverted index), delta = `doc_id % 3 == 0` played as the incoming
    * batch. Oracle: exact all-pairs jaccard restricted to pairs
    * touching the delta.
    *
    * The cache key hashes the dir path PLUS a content fingerprint of
    * the source parquet (per-file name/length/mtime): regenerated
    * testdata at the same path gets a fresh index instead of silently
    * reusing a stale one, and the marker-guarded build races only
    * between processes reading identical source data (where both
    * builds write identical content). */
  def incrementalNearDup(s: SparkSession, dir: String): DataFrame =
    incrementalNearDupMod(s, dir, 3)

  /** [[incrementalNearDup]] with the corpus/delta split parameterized:
    * delta = `doc_id % mod == 0`. The driver binding uses mod=3 (a
    * delta of a full THIRD of the corpus — an upper bound on any real
    * batch); the scaling ladder also measures mod=30 (a ~3% delta, the
    * realistic daily-ingest shape) to demonstrate the cost is
    * DELTA-proportional, not corpus-proportional. The index cache key
    * includes `mod`: the two bindings index different corpora and must
    * never share a build. */
  def incrementalNearDupMod(s: SparkSession, dir: String, mod: Int): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val path = ensureSignatureIndexMod(s, dir, mod)
    incrementalPairs(docs.filter(col("doc_id") % mod === 0), path)
  }

  /** Build (if absent) the corpus-side signature index behind
    * [[incrementalNearDupMod]] and return its path. Exposed so the
    * scaling harness can time the ONE-TIME corpus build as its own
    * `_build` row instead of charging it to the first delta probe
    * (the media-family attribution fix, applied to the text path). */
  def ensureSignatureIndexMod(s: SparkSession, dir: String, mod: Int): String = {
    val docs = Tables.load(s, dir, "documents")
    val path = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", s"sig-mod=$mod")
    if (!graft.index.SignatureIndex.ready(s, path))
      graft.index.SignatureIndex.build(
        docs.filter(!(col("doc_id") % mod === 0)), path)
    path
  }

  // ---- incremental embedding near-dup vs a persisted signature index ----

  /** Production-τ embedding near-dup pairs TOUCHING a new vector
    * batch, against a persisted corpus index
    * ([[graft.index.EmbSignatureIndex]]) — the vector-modality
    * analogue of [[incrementalPairs]]: a 100 TB corpus taking a daily
    * embedding delta does delta-sized signature work plus one
    * candidate join, instead of re-signing the corpus per query
    * (what the batch [[embeddingNearDup]] family does by design).
    *
    * Probe geometry: the batch path probes every row's single-bit
    * 0→1 flips symmetrically (either side's flip lands on the
    * other's base). Here only the DELTA side can probe, so delta
    * probes flip in BOTH directions — a pair differing at a bit
    * where the delta row holds 1 and the corpus row 0 is reached by
    * the delta's 1→0 flip (the corpus side cannot move). That keeps
    * the batch family's ≤1-bit-mismatch probe contract exactly, at
    * (bits+1) probes per delta signature instead of (bits/2+1) —
    * delta-sized, so the doubling is paid on the small side.
    *
    * Shuffle shape: under the [[BroadcastBytes]] budget the delta's
    * probe stream BROADCASTS and the corpus signature table streams
    * through a codegen'd hash join — the corpus is scanned once,
    * never shuffled (the design point for a realistic ≤1% daily
    * delta). An oversized delta degrades to a shuffled-hash join
    * (the t09 lesson: degrade, never OOM). The rider screen fires
    * in-stage off the persisted `ss` column; the sketch screen and
    * exact verify read corpus-side state semi-pruned to candidate
    * ids first (broadcast of the candidate-id set), so corpus
    * sketches/vectors are scanned but never shuffled or broadcast
    * wholesale. Hot buckets come from the persisted ledger merged
    * with the delta's own counts (right-outer on the delta side,
    * corpus ledger semi-pruned first) and emit star-to-min links,
    * the same capped-bucket disclosure as the batch path.
    *
    * Depth drift: callers [[graft.index.EmbSignatureIndex.ensure]]
    * the index BEFORE querying; this function signs the delta at the
    * index's recorded depth. */
  def incrementalEmbPairs(deltaEmb: DataFrame, indexPath: String,
      tau: Double = ProductionEmbTau): DataFrame = {
    val s = deltaEmb.sparkSession
    val idx = graft.index.EmbSignatureIndex
    val bits = idx.meta(s, indexPath)._1
    val e = embNormed(deltaEmb)
    val dBase = idx.signatureRows(e, bits).localCheckpoint(true)
    incrementalEmbPairsFrames(e, dBase, bits,
      idx.sigs(s, indexPath), idx.vecs(s, indexPath),
      idx.sketches(s, indexPath), idx.counts(s, indexPath), tau)
  }

  /** Frame-level core of [[incrementalEmbPairs]] — the corpus side
    * arrives as (sigs, vecs, sketches, counts) frames so a caller can
    * union extra corpus-side state onto the persisted index (the
    * streaming scorer's pending-batch log,
    * [[graft.streaming.StreamingEmbNearDup]]). `corpusCounts` may
    * carry more than one row per (tbl, sig) — merged after the
    * delta-key semi-prune, where the frame is delta-sized. `dBase`
    * must be the delta's [[graft.index.EmbSignatureIndex.signatureRows]]
    * at the SAME depth as the corpus signatures. */
  private[graft] def incrementalEmbPairsFrames(e: DataFrame,
      dBase: DataFrame, bits: Int, corpusSigs: DataFrame,
      corpusVecs: DataFrame, corpusSketches: DataFrame,
      corpusCounts: DataFrame, tau: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val s = e.sparkSession
    val nD = e.count()

    // hot-bucket ledger: corpus counts pruned to delta-touched keys
    // (broadcast of delta keys), then right-outer merged with the
    // delta's own counts — corpus ledger scanned once, never shuffled
    val dCounts = dBase.groupBy(col("tbl"), col("sig"))
      .agg(count(lit(1)).as("dn"), min(col("vec_id")).as("dmin"))
    val touched = corpusCounts
      .join(broadcast(dCounts.select(col("tbl"), col("sig"))),
        Seq("tbl", "sig"), "left_semi")
      .groupBy(col("tbl"), col("sig"))
      .agg(sum(col("n")).as("n"), min(col("min_vec")).as("min_vec"))
    val hotB = touched
      .join(dCounts, Seq("tbl", "sig"), "right_outer")
      .filter(coalesce(col("n"), lit(0L)) + col("dn") > ProdMaxBucket)
      .select(col("tbl"), col("sig"),
        least(coalesce(col("min_vec"), col("dmin")), col("dmin")).as("min_vec"))
      .localCheckpoint(true)
    val hotKeys = broadcast(hotB.select(col("tbl"), col("sig")))

    // candidate join: delta probes (both-direction single-bit flips)
    // against corpus∪delta base signatures, rider-screened in-stage
    val flips = array((0 until bits).map(i =>
      col("sig").bitwiseXOR(lit(1L << i))): _*)
    val dProbes = dBase.join(hotKeys, Seq("tbl", "sig"), "left_anti")
      .select(col("vec_id").as("pa"), col("ss").as("ssa"), col("tbl"),
        explode(concat(array(col("sig")), flips)).as("sig"))
    val allBase = corpusSigs.unionByName(dBase)
      .join(hotKeys, Seq("tbl", "sig"), "left_anti")
      .select(col("vec_id").as("pb"), col("ss").as("ssb"), col("tbl"), col("sig"))
    val cand = bcastOrHashIf(28, nD * adaptiveEmbTables(bits) * (bits + 1),
        Seq("tbl", "sig"))(dProbes)
      .join(allBase, Seq("tbl", "sig"))
      .filter(col("pa") =!= col("pb") &&
        bit_count(col("ssa").bitwiseXOR(col("ssb"))) <= ScreenMaxDisagree)
      .select(least(col("pa"), col("pb")).as("vec_a"),
        greatest(col("pa"), col("pb")).as("vec_b"))
    val hotPairs = dBase.join(broadcast(hotB), Seq("tbl", "sig"))
      .filter(col("vec_id") =!= col("min_vec"))
      .select(least(col("vec_id"), col("min_vec")).as("vec_a"),
        greatest(col("vec_id"), col("min_vec")).as("vec_b"))

    // sketch screen then exact verify, both against corpus∪delta state
    // semi-pruned to candidate ids (the jaccardVerified pattern: the
    // corpus-sized tables are scanned once, only candidate rows join)
    val (pairs, nP) = graft.core.Caching.checkpointCounted(
      cand.unionByName(hotPairs))
    val candIds = pairs.select(col("vec_a").as("vec_id"))
      .unionByName(pairs.select(col("vec_b").as("vec_id"))).distinct()
    val candIdsB = bcastIf(16, 2 * nP)(candIds)
    val sk = corpusSketches.unionByName(embSketch(e))
      .join(candIdsB, Seq("vec_id"), "left_semi")
    val screened = pairs
      .join(sk.select(col("vec_id").as("vec_a"), col("pv").as("pva"), col("pt").as("pta")), "vec_a")
      .join(sk.select(col("vec_id").as("vec_b"), col("pv").as("pvb"), col("pt").as("ptb")), "vec_b")
      .filter(VectorFunctions.dot(s, col("pva"), col("pvb"))
        + col("pta") * col("ptb") >= tau - 1e-9)
      .select(col("vec_a"), col("vec_b"))
      .distinct()
    val vv = corpusVecs
      .unionByName(e.select(col("vec_id"), col("v"), col("norm")))
      .join(candIdsB, Seq("vec_id"), "left_semi")
    screened
      .join(vv.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na")), "vec_a")
      .join(vv.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb")), "vec_b")
      .withColumn("cosine", VectorFunctions.dot(s, col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= tau)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 2).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** d13 driver binding: corpus = `vec_id % 3 != 0` of the
    * drop-planted corpus (indexed once per sf dir, tmp-cached with a
    * content fingerprint — the d07 precedent), delta = `vec_id % 3
    * == 0` played as the incoming batch. Oracle: exact all-pairs
    * cosine ≥ τ restricted to pairs touching the delta. Planted
    * pairs sit at cosine ≈ 0.99 (sign agreement ≈ 0.955), where the
    * ≤1-bit probe contract across 32 tables misses with probability
    * ~1e-25 — which is what lets an LSH result hash-match exact SQL,
    * the d06 argument. */
  def incrementalEmbNearDup(s: SparkSession, dir: String): DataFrame =
    incrementalEmbNearDupMod(s, dir, 3)

  /** [[incrementalEmbNearDup]] with the corpus/delta split
    * parameterized (delta = `vec_id % mod == 0`; mod=3 is the driver
    * binding's upper-bound batch, mod=30 the realistic daily-ingest
    * row the scaling ladder measures). Index cache key = dir content
    * fingerprint + mod, same staleness contract as
    * [[incrementalNearDupMod]]. */
  def incrementalEmbNearDupMod(s: SparkSession, dir: String, mod: Int): DataFrame = {
    val emb = plantedDropCorpus(Tables.load(s, dir, "embeddings"))
    val isDelta = col("vec_id") % mod === 0
    val path = graft.index.IndexCache.pathFor(
      s, s"$dir/embeddings.parquet", s"embmod=$mod")
    val corpus = emb.filter(!isDelta)
    val delta = emb.filter(isDelta)
    // depth policy: size the index for the corpus+delta total, so a
    // delta that pushes the corpus past a doubling re-indexes BEFORE
    // probing (adaptiveEmbBits is ⌈log₂ n⌉-driven: at most one
    // rebuild per doubling past the 16-bit floor)
    val total = emb.count()
    graft.index.EmbSignatureIndex.ensure(corpus, path, total)
    incrementalEmbPairs(delta, path)
  }

  // ---- substring (token-window) dedup coverage ----

  /** Window width for substring dedup. Wider than the 3-token jaccard
    * shingles on purpose: an 8-token window shared verbatim across
    * documents is copied text, not vocabulary overlap (the signal Lee
    * et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL'22, dedups on — their 50-token unit scaled to this
    * corpus's 20–400-token documents). */
  private val SubstrK = 8

  /** Per-document duplicated-substring coverage: for each doc, the
    * fraction of its distinct 8-token windows that appear verbatim in
    * at least one OTHER place in the corpus — the per-doc signal a
    * substring-level dedup pipeline thresholds on (docs that are mostly
    * copied text get dropped or trimmed; a low ratio means the overlap
    * is quotation-sized).
    *
    * Plan shape: one corpus scan explodes distinct hashed windows (the
    * fused [[graft.functions.HashedShingles]] kernel — 8-byte hashes,
    * never window strings); window df is a `count over
    * Window.partitionBy(h)` on that stream, so the corpus-sized frame
    * crosses the wire EXACTLY ONCE (the h exchange feeding the window
    * sort) and the per-doc rollup is a slim (doc_id, flag) shuffle.
    * The first cut of this operator computed df as a separate groupBy
    * and joined it back — two corpus-wide shuffles of the same 16-byte
    * rows plus a checkpoint between them, and its measured top decade
    * was e_xtop 1.14 (34 s at the 500k-doc sf10 point, storage-pressure-bound);
    * the single-pass window shape is the same trade [[bucketPairs]]
    * already measured in its favor. A boilerplate window shared by k
    * docs is one window group of k rows — counted linearly, never
    * joined quadratically.
    *
    * Distinct-window semantics: a window repeated INSIDE one doc counts
    * once (per-doc distinct is what the coverage denominator means);
    * its df counts DOCUMENTS sharing it, so intra-doc repetition alone
    * never marks a window duplicated. */
  def substringDedup(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    docs
      .select(col("doc_id"),
        explode(graft.functions.LshFunctions.hashedShingles(
          docs.sparkSession, tokens(col("text")), SubstrK)).as("h"))
      .withColumn("dfh", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("dfh") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio",
        graft.functions.TextFunctions.ratio4(col("n_dup_windows"), col("n_windows")))
      .orderBy(col("doc_id"))
  }

  def substringDedup(s: SparkSession, dir: String): DataFrame =
    substringDedup(graft.core.Parallelize.spread(
      Tables.load(s, dir, "documents"), col("doc_id")))

  // ---- duplicate-cluster extraction (connected components) ----

  /** Connected components over the undirected near-dup pair graph:
    * (doc_id, cluster_id = component-min doc_id) for every doc in ≥1
    * pair; the survivor set is `doc_id == cluster_id`. This is the step
    * that turns PAIRS into the keep/drop decision — pairs alone
    * over-delete transitive groups (a~b, b~c: dropping both b and c
    * loses c's only surviving representative if done pairwise).
    *
    * Algorithm: min-label propagation WITH pointer jumping, O(log n)
    * rounds — load-bearing here because [[bucketPairs]] emits CHAINS
    * for capped mega-buckets, and plain neighbor propagation needs
    * O(chain length) rounds on a path graph; jumping (label ←
    * label-of-label) halves distance-to-root per round. Each round is
    * two self-joins + one aggregate over the (node, label) frame,
    * lineage kept flat with an eager checkpoint per round. Fixpoint ⇒
    * every label is its component's min: the min labels itself, and
    * any frontier node adjacent to a min-labeled node would still
    * change — so no non-uniform fixpoint exists.
    *
    * Fixed-cost floor (small inputs): each round runs exactly TWO jobs
    * — the eager checkpoint of the round's label frame (which carries
    * the previous label alongside the new one) and a count() that
    * scans that materialized frame for changed labels. The earlier
    * shape paid a third edge-sized join per round just to compute
    * `changed`; convergence now reads the delta off the frame the
    * round materialized anyway. The edge list is pre-partitioned on
    * its join key once, so the per-round neighbor join re-shuffles
    * only the (small) label frame, never the edges.
    *
    * Checkpoint durability: rounds checkpoint via localCheckpoint
    * (executor blocks — right for one machine) unless
    * `spark.graft.cc.checkpointDir` is set, in which case rounds
    * checkpoint to that durable directory — the cluster-scale option:
    * localCheckpoint blocks die with an executor, and a lost block
    * kills the whole iterative job at depth. */
  /** Monotone id source for per-round CC observation names. */
  private val CcObsId = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def clustersFromPairs(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    val ccDir = s.conf.getOption("spark.graft.cc.checkpointDir")
    ccDir.foreach { d =>
      if (s.sparkContext.getCheckpointDir.isEmpty) s.sparkContext.setCheckpointDir(d)
    }
    def ck(df: DataFrame): DataFrame =
      if (ccDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    // both edge directions from ONE pass over `pairs` (explode, not a
    // two-branch union): Catalyst does not dedupe identical subplans
    // across union branches, so a caller handing a LAZY pair pipeline
    // (the index builds: minhashLsh / pairsFromIndex) paid its whole
    // pair formation twice inside this one job
    val edges = ck(pairs
      .select(explode(array(
        struct(col("doc_a").as("u"), col("doc_b").as("v")),
        struct(col("doc_b").as("u"), col("doc_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .repartition(col("v")))
    var p = ck(edges.groupBy(col("u"))
      .agg(min(col("v")).as("m"))
      .select(col("u").as("v"), least(col("u"), col("m")).as("p")))
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      // 64 pointer-jump rounds cover components of 2^64 nodes — a
      // non-converging loop is a bug, not a big graph
      require(rounds <= 64, "connected-components failed to converge")
      // DOUBLE pointer jump per round: label-of-label, then its label
      // again — two cheap label-frame self-joins inside the SAME
      // checkpointed job quarter the distance-to-root per round where
      // one jump halves it, so chain-shaped components (the capped
      // mega-bucket disclosure shape) converge in about half the
      // rounds. Each round is a full barrier (checkpoint job +
      // convergence count), so fewer rounds beats cheaper rounds at
      // every scale. jp2 ≤ jp always (a label never exceeds its node),
      // so the min over {p0, jp2, np} equals the min over all four.
      val jumped = p.as("x").join(p.as("y"), col("x.p") === col("y.v"))
        .select(col("x.v").as("v"), col("x.p").as("p0"), col("y.p").as("jp"))
      val jumped2 = jumped.as("j").join(p.as("z"), col("j.jp") === col("z.v"))
        .select(col("j.v").as("v"), col("j.p0").as("p0"), col("z.p").as("jp2"))
      val nbr = edges.join(p, "v")
        .groupBy(col("u")).agg(min(col("p")).as("np"))
        .withColumnRenamed("u", "v")
      // convergence rides the checkpoint job as an OBSERVED metric
      // (sum of changed labels) instead of a second count job over the
      // materialized frame: one barrier per round, not two — and the
      // checkpointed frame narrows to (v, p) since p0 no longer needs
      // to survive the round. Observed metrics are delivered on both
      // checkpoint flavors (verified: localCheckpoint and durable).
      // globally unique name: concurrent CC runs (the per-modality
      // chain futures) must not share an observation namespace
      val obs = org.apache.spark.sql.Observation(
        s"cc-${CcObsId.incrementAndGet()}")
      val next = ck(jumped2.join(nbr, Seq("v"))
        .select(col("v"), col("p0"), least(col("p0"), col("jp2"), col("np")).as("p"))
        .observe(obs, coalesce(sum((col("p") =!= col("p0")).cast("long")),
          lit(0L)).as("changed"))
        .select(col("v"), col("p")))
      changed = obs.get("changed").asInstanceOf[Long]
      p = next
    }
    // UNSORTED by contract: every caller either materializes this
    // frame for joins/counts (chains, index builds, merge folds —
    // where a sort is pure waste, 5M rows of it at the sf100 point) or
    // re-sorts at its public result surface (dedupClusters /
    // embDedupClusters / mergeClusters apply their own orderBy).
    p.select(col("v").as("doc_id"), col("p").as("cluster_id"))
  }

  /** Duplicate clusters from the MinHash near-dup pair graph (d08):
    * exact-verified pairs ([[minhashLsh]]) → connected components →
    * (doc_id, cluster_id). Oracle: transitive closure by recursive CTE
    * over the same exact pair predicate. Thin view over a fresh
    * [[DedupPipeline]] — hold a pipeline instance instead to share the
    * cluster frame across downstream derivations. */
  def dedupClusters(docs: DataFrame): DataFrame =
    DedupPipeline.text(docs).textClusters.orderBy(col("doc_id"))

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    dedupClusters(Tables.load(s, dir, "documents"))

  /** Incremental cluster maintenance (d14): fold a delta batch's
    * near-dup pairs into a PERSISTED cluster frame
    * ([[graft.index.ClusterIndex]]) without re-running connected
    * components over the corpus pair graph — the decision-layer
    * completion of the incremental story (d07 keeps pair FORMATION
    * delta-sized for text, d13 for embeddings; this keeps the
    * keep/drop DECISION delta-sized too).
    *
    * Contract: the result equals the full-recompute
    * [[dedupClusters]] over corpus∪delta — same oracle (recursive-CTE
    * closure over the full exact pair graph) as d08, reached via
    * corpus-index CC + [[mergeClusters]] instead of a corpus-wide CC.
    *
    * Correctness of the contraction: every corpus cluster's label IS
    * its member-min doc_id, so contracting each touched cluster to
    * its label preserves both connectivity (cluster members are
    * already mutually connected) and the min-label semantics (the
    * component min over {labels ∪ delta ids} is the component min
    * over all member docs). A delta pair bridging two corpus
    * clusters becomes a label–label edge and merges them; a delta
    * doc joining a cluster with a smaller id becomes the new min and
    * relabels it — both covered by the spec's synthetic graphs. */
  def incrementalClusters(s: SparkSession, dir: String): DataFrame =
    incrementalClustersMod(s, dir, 3)

  /** [[incrementalClusters]] with the corpus/delta split
    * parameterized, mirroring [[incrementalNearDupMod]] (the driver
    * binding uses mod=3, the ladder also measures mod=30). Reuses
    * d07's persisted signature index for delta pair formation and
    * persists the corpus-only cluster frame beside it. */
  def incrementalClustersMod(s: SparkSession, dir: String, mod: Int): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val isDelta = col("doc_id") % mod === 0
    val sigPath = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", s"sig-mod=$mod")
    if (!graft.index.SignatureIndex.ready(s, sigPath))
      graft.index.SignatureIndex.build(docs.filter(!isDelta), sigPath)
    val ccPath = graft.index.IndexCache.pathFor(
      s, s"$dir/documents.parquet", s"cc-mod=$mod")
    if (!graft.index.ClusterIndex.ready(s, ccPath))
      graft.index.ClusterIndex.build(
        clustersFromPairs(minhashLsh(docs.filter(!isDelta))
          .select(col("doc_a"), col("doc_b"))), ccPath)
    val deltaPairs = incrementalPairs(docs.filter(isDelta), sigPath)
      .select(col("doc_a"), col("doc_b"))
    mergeClusters(graft.index.ClusterIndex.load(s, ccPath), deltaPairs)
  }

  /** Fold `deltaPairs` into an existing `clusters` frame: contract
    * each touched cluster to its label, run the (delta-sized) CC over
    * the contracted graph, and expand the new labels back over the
    * frame.
    *
    * Shuffle shape — the reason this is delta-proportional at any
    * corpus size: the persisted cluster frame is scanned exactly
    * twice and shuffled NEVER. The touched-label lookup semi-prunes
    * it by a broadcast of the delta's endpoint ids; the contracted CC
    * runs over ≤2·|deltaPairs| nodes; the relabel pass streams the
    * frame through a broadcast join against the (delta-sized) remap.
    * Every frame that shuffles is delta-sized by construction. */
  def mergeClusters(clusters: DataFrame, deltaPairs: DataFrame): DataFrame = {
    // materialize the (delta-sized) pair frame ONCE: it feeds three
    // plan subtrees (both endpoint projections + the contraction), and
    // a lazy subtree re-runs the caller's whole pair-formation pipeline
    // per consumption — for the media path that meant re-DECODING the
    // delta three times (m05b's sf10 row read slower than the full
    // recompute it amortizes until this pin)
    val dp = deltaPairs.localCheckpoint(true)
    val ids = dp.select(col("doc_a").as("doc_id"))
      .unionByName(dp.select(col("doc_b").as("doc_id")))
      .distinct()
    // endpoint → its current label; endpoints in no existing cluster
    // (new delta docs, corpus docs with no prior pair) label themselves
    val lab = ids.join(
        clusters.join(broadcast(ids), Seq("doc_id"), "left_semi"),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("lab"),
        col("cluster_id").isNull.as("fresh"))
      .localCheckpoint(true)
    val la = lab.select(col("doc_id").as("doc_a"), col("lab").as("la"))
    val lb = lab.select(col("doc_id").as("doc_b"), col("lab").as("lb"))
    val contracted = dp.join(la, Seq("doc_a")).join(lb, Seq("doc_b"))
      .filter(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("doc_a"),
        greatest(col("la"), col("lb")).as("doc_b"))
      .distinct()
    // (node, newlab) over the contracted graph — delta-sized
    val merged = clustersFromPairs(contracted)
      .select(col("doc_id").as("node"), col("cluster_id").as("newlab"))
      .localCheckpoint(true)
    // label nodes relabel their whole cluster; fresh nodes (never in
    // the frame — their own label) emit directly. An isolated fresh
    // node (all its delta pairs stayed inside one existing cluster —
    // impossible for genuinely-new ids, possible for a caller feeding
    // arbitrary pairs) keeps its own id via the coalesce.
    val relabeled = clusters
      .join(broadcast(merged.withColumnRenamed("node", "cluster_id")),
        Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("newlab"), col("cluster_id")).as("cluster_id"))
    val freshRows = lab.filter(col("fresh"))
      .join(broadcast(merged), col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("newlab"), col("doc_id")).as("cluster_id"))
    relabeled.unionByName(freshRows).orderBy(col("doc_id"))
  }

  /** Duplicate clusters over the EMBEDDING modality (d09): the same
    * pairs→components step as [[dedupClusters]], driven by the
    * production-τ cosine pair graph instead of the text one — the two
    * modalities share [[clustersFromPairs]], so a pipeline that dedups
    * text and vectors gets one clustering semantics. Driver binding
    * runs over [[plantedProductionCorpus]] (same non-vacuity argument
    * as d06); oracle: recursive-CTE closure of the exact cosine≥τ pair
    * predicate. */
  def embDedupClusters(embeddings: DataFrame, tau: Double = ProductionEmbTau): DataFrame =
    DedupPipeline.emb(embeddings, tau).embClusters.orderBy(col("vec_id"))

  def embDedupClusters(s: SparkSession, dir: String): DataFrame =
    embDedupClusters(plantedProductionCorpus(Tables.load(s, dir, "embeddings")))

  /** The deduplicated corpus (d10) — the decision [[dedupClusters]]
    * feeds: keep every doc that is its component's min (the survivor)
    * or in no near-dup pair at all; drop the other cluster members.
    * One anti-join against the (small) non-survivor side of the
    * cluster frame, so the corpus streams through un-shuffled.
    * Pairwise dropping without the component step would over-delete
    * transitive groups (a~b, b~c: b and c both dropped leaves c's
    * cluster without its representative). */
  def dedupSurvivors(docs: DataFrame): DataFrame =
    DedupPipeline.text(docs).survivors

  def dedupSurvivors(s: SparkSession, dir: String): DataFrame =
    dedupSurvivors(Tables.load(s, dir, "documents"))

  /** Cross-modal deduplicated corpus (d12) — the pipeline capstone: a
    * document survives only if BOTH modalities keep it — it is its
    * component's min (or unpaired) in the text near-dup graph
    * ([[dedupClusters]]) AND in the embedding near-dup graph over the
    * row with the matching id ([[embDedupClusters]]). One decision
    * join: the two (small) drop sets union and anti-join the corpus,
    * which streams through un-shuffled exactly as in
    * [[dedupSurvivors]]. Ids present in only one modality are judged
    * by that modality alone (the anti-join ignores the absent side) —
    * the semantics a mixed-coverage corpus needs. */
  def jointSurvivors(docs: DataFrame, embeddings: DataFrame,
      tau: Double = ProductionEmbTau): DataFrame =
    DedupPipeline(docs, embeddings, tau).jointSurvivors

  /** The d12 demo corpus: like [[plantedProductionCorpus]] but the
    * perturbed re-entries carry ids BELOW their twins (−(vec_id+1) <
    * 0 ≤ vec_id), so the component MIN is the synthetic row and the
    * REAL document is the dropped member. Under the d06/d09 planting
    * (+10⁶) every embedding drop is a synthetic id that matches no
    * document, and the cross-modal join would be vacuously equal to
    * the text-only d10 — this variant makes the embedding modality
    * actually remove documents, which is what d12 exists to
    * demonstrate. Mirrored verbatim in the d12 oracle SQL. */
  def plantedDropCorpus(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") < 20)
      .select((-(col("vec_id") + 1L)).as("vec_id"),
        expr("transform(embedding, (x, i) -> x * (1.0 + 0.1*cos(i)))")
          .as("embedding"))
    base.unionByName(planted)
  }

  /** d12 driver binding: embeddings = [[plantedDropCorpus]], so the
    * embedding modality drops real docs 0–19 (where not already
    * text-dropped) on top of the text drops. */
  def jointSurvivors(s: SparkSession, dir: String): DataFrame =
    jointSurvivors(Tables.load(s, dir, "documents"),
      plantedDropCorpus(Tables.load(s, dir, "embeddings")))
}
