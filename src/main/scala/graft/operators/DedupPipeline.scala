package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared-intermediate dedup pipeline — the composable form of the
  * d08/d09/d10/d12 operator family.
  *
  * The per-query operators are self-contained by contract (each
  * driver binding recomputes from raw inputs), which is right for a
  * correctness catalog and wrong for a corpus pass: d10 re-derives the
  * text clusters d08 just built, and d12 re-runs BOTH modality
  * pipelines from scratch — the capstone query paying ~2× its
  * necessary cost. A real training-data pass (the pipeline shape in
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL'22) computes each modality's pair graph and cluster
  * frame ONCE and derives every keep/drop decision from them.
  *
  * This class is that pass: each intermediate is a `lazy val`
  * materialized (eager localCheckpoint) on first touch and shared by
  * every downstream derivation — ask for [[textClusters]] then
  * [[survivors]] and the corpus is shingled, signed, bucketed and
  * clustered exactly once; [[jointSurvivors]] after [[textClusters]]
  * and [[embClusters]] costs one anti-join. The one-shot operators in
  * [[Dedup]] are thin views over a fresh instance, so there is a
  * single code path for both API shapes and the oracle rows pin both.
  *
  * Lifetime: intermediates live in the session's block manager until
  * [[graft.core.Caching.releaseAll]] — hold the instance for the
  * duration of one corpus pass, release at its boundary (at cluster
  * scale the equivalent is persisting the cluster frames to durable
  * storage between stages; they are survivor-sized, not corpus-sized).
  */
final class DedupPipeline(
    docs: Option[DataFrame],
    embeddings: Option[DataFrame],
    tau: Double = Dedup.ProductionEmbTau,
    images: Option[DataFrame] = None,
    audio: Option[DataFrame] = None,
    video: Option[DataFrame] = None) {
  require(docs.nonEmpty || embeddings.nonEmpty || images.nonEmpty ||
    audio.nonEmpty || video.nonEmpty,
    "DedupPipeline needs at least one modality")

  private def docsF = docs.getOrElse(
    sys.error("text-modality derivation on a pipeline without documents"))
  private def embF = embeddings.getOrElse(
    sys.error("embedding-modality derivation on a pipeline without embeddings"))
  private def imagesF = images.getOrElse(
    sys.error("image-modality derivation on a pipeline without images"))
  private def audioF = audio.getOrElse(
    sys.error("audio-modality derivation on a pipeline without audio"))
  private def videoF = video.getOrElse(
    sys.error("video-modality derivation on a pipeline without video"))

  // ---- per-modality pair+cluster chains, one future each -------------
  //
  // Each modality's pairs→clusters chain is an INDEPENDENT job DAG.
  // Computing them on separate driver threads lets the scheduler
  // back-fill one chain's stragglers/barriers with another chain's
  // tasks (optimization guide §2.6 — actions are only sequential
  // because driver code calls them sequentially); the multi-modality
  // decisions (d12's jointSurvivors, m05's jointMediaSurvivors) kick
  // every chain they need BEFORE awaiting any. Results are unchanged:
  // every chain is a deterministic function materialized by eager
  // localCheckpoints, and the decision joins await all inputs.
  //
  // Deadlock note: a chain future must never touch this object's lazy
  // vals (Scala lazy-val init synchronizes on the instance, and the
  // awaiting accessor holds that monitor) — chain bodies close over
  // the constructor frames and library calls only.

  private def chainF[A](body: => A): scala.concurrent.Future[A] =
    scala.concurrent.Future(scala.concurrent.blocking(body))(
      scala.concurrent.ExecutionContext.global)
  private def await[A](f: scala.concurrent.Future[A]): A =
    scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)

  /** Text chain: minhash-LSH exact-verified pairs (d02) → connected
    * components (d08). Pair FORMATION gets the spread copy of the
    * corpus (the shingle/signature kernels are the expensive map
    * stage); the decision joins below keep the RAW frame so the corpus
    * side still streams un-shuffled. */
  private lazy val textChain: scala.concurrent.Future[(DataFrame, DataFrame, Long)] = {
    val in = graft.core.Parallelize.spread(docsF, col("doc_id"))
    chainF {
      val pairs = Dedup.minhashLsh(in).localCheckpoint(true)
      // cluster count observed on the chain's own checkpoint job — the
      // decision joins' dropHint bound costs no extra job
      val (clusters, n) = graft.core.Caching.checkpointCounted(
        Dedup.clustersFromPairs(pairs.select(col("doc_a"), col("doc_b"))))
      (pairs, clusters, n)
    }
  }

  /** Embedding chain: cosine≥τ exact-verified pairs (d06) → connected
    * components (d09). The embeddings frame is NOT spread (unlike the
    * text chain): the hyperplane-sig kernel is cheap and the r18 A/B
    * measured the added exchange a net loss at sf0.1 AND sf1. */
  private lazy val embChain: scala.concurrent.Future[(DataFrame, DataFrame, Long)] = {
    val in = embF
    chainF {
      val pairs = Dedup.embeddingNearDup(in, tau).localCheckpoint(true)
      val (clusters, n) = graft.core.Caching.checkpointCounted(
        Dedup.clustersFromPairs(
          pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
          .select(col("doc_id").as("vec_id"), col("cluster_id")))
      (pairs, clusters, n)
    }
  }

  /** A two-modality (text+emb) instance is one corpus pass: touching
    * either cluster frame submits BOTH independent DAGs so the
    * scheduler overlaps them (the dp_cluster_build shape — text and
    * emb chains are materialized back to back by every consumer of
    * such an instance). Media instances keep text lazy: their docs
    * frame only feeds the decision join, and kicking a never-used
    * text LSH pass would be pure waste. */
  private def kickSiblings(): Unit =
    if (docs.nonEmpty && embeddings.nonEmpty && images.isEmpty &&
        audio.isEmpty && video.isEmpty) { textChain; embChain; () }

  /** Exact-verified text near-dup pairs (the d02 result), computed and
    * materialized once per pipeline. Result-sized. */
  lazy val textPairs: DataFrame = { kickSiblings(); await(textChain)._1 }

  /** Text-modality duplicate clusters (the d08 result): connected
    * components over [[textPairs]]. Survivor-decision-sized. */
  lazy val textClusters: DataFrame = { kickSiblings(); await(textChain)._2 }

  /** Exact-verified embedding near-dup pairs at [[tau]] (the d06
    * result over the instance's embedding frame). */
  lazy val embPairs: DataFrame = { kickSiblings(); await(embChain)._1 }

  /** Embedding-modality duplicate clusters (the d09 result). */
  lazy val embClusters: DataFrame = { kickSiblings(); await(embChain)._2 }

  /** Doc ids the text modality drops: cluster members that are not
    * their component's min. */
  def textDropIds: DataFrame =
    textClusters.filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))

  /** Ids the embedding modality drops, as a doc_id frame (vec_id and
    * doc_id share the id space — the cross-modal join contract). */
  def embDropIds: DataFrame =
    embClusters.filter(col("vec_id") =!= col("cluster_id"))
      .select(col("vec_id").as("doc_id"))

  /** Budget-aware hint for a drop set riding checkpointed frames:
    * Spark sees a LogicalRDD's size as unknown, so without the
    * explicit hint the decision anti-join SORT-MERGES — shuffling AND
    * sorting the corpus (caught in the PLANS.md audit). Broadcast
    * under the byte budget (the decision-sized common case — corpus
    * streams un-shuffled); shuffled-hash above it (a corpus-sized
    * drop set must exchange, but never sort). `n` bounds the drop-set
    * rows by its source cluster frame's (cheap, checkpointed) count. */
  private def dropHint(n: => Long)(drops: DataFrame): DataFrame =
    Dedup.bcastOrHashIf(8, n)(drops)

  // cluster-frame counts, observed on each chain's checkpoint job —
  // shared by every decision join's dropHint at zero extra jobs
  private lazy val textClusterCount: Long = { kickSiblings(); await(textChain)._3 }
  private lazy val embClusterCount: Long = { kickSiblings(); await(embChain)._3 }
  private lazy val imageClusterCount: Long = await(imageChain)._3
  private lazy val audioClusterCount: Long = await(audioChain)._3
  private lazy val videoClusterCount: Long = await(videoChain)._3

  /** The deduplicated corpus (d10): one anti-join of the corpus
    * against the text drop set; the corpus streams through
    * un-shuffled. */
  def survivors: DataFrame =
    docsF.join(dropHint(textClusterCount)(textDropIds),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Cross-modal survivors (d12): both modalities' drop sets union
    * into one anti-join. Ids present in only one modality are judged
    * by that modality alone. */
  def jointSurvivors: DataFrame = {
    // kick BOTH modality chains before awaiting either — the scheduler
    // overlaps their independent job DAGs (guide §2.6)
    textChain; embChain
    docsF.join(dropHint(textClusterCount + embClusterCount)(
        textDropIds.unionByName(embDropIds).distinct()),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Media chain for one perceptual modality: synth/decode+hash+LSH
    * pairs → connected components, relabeled to (media_id,
    * cluster_id). Same future-per-chain shape as [[textChain]]. */
  private def mediaChainF(frame: DataFrame,
      neardup: DataFrame => DataFrame)
      : scala.concurrent.Future[(DataFrame, DataFrame, Long)] =
    chainF {
      val pairs = neardup(frame).localCheckpoint(true)
      val (clusters, n) = graft.core.Caching.checkpointCounted(
        Dedup.clustersFromPairs(pairs
            .select(col("media_a").as("doc_a"), col("media_b").as("doc_b")))
          .select(col("doc_id").as("media_id"), col("cluster_id")))
      (pairs, clusters, n)
    }

  private lazy val imageChain = mediaChainF(imagesF,
    graft.multimodal.Multimodal.imageNeardup)
  private lazy val audioChain = mediaChainF(audioF,
    graft.multimodal.Multimodal.audioNeardup)
  private lazy val videoChain = mediaChainF(videoF,
    graft.multimodal.Multimodal.videoNeardup)

  /** Perceptual image near-dup pairs (the m03 result over the
    * instance's image frame) — decode + dHash + combination-LSH. */
  lazy val imagePairs: DataFrame = await(imageChain)._1

  /** Image-modality duplicate clusters: [[Dedup.clustersFromPairs]] is
    * modality-agnostic, so media ids flow through the same CC step as
    * text/embeddings (media_id and doc_id share the id space — the
    * cross-modal join contract, as with vec_id). */
  lazy val imageClusters: DataFrame = await(imageChain)._2

  /** Perceptual audio near-dup pairs (the m04 result). */
  lazy val audioPairs: DataFrame = await(audioChain)._1

  /** Audio-modality duplicate clusters. */
  lazy val audioClusters: DataFrame = await(audioChain)._2

  /** Ids the image modality drops (cluster members that are not their
    * component's min), as a doc_id frame. */
  def imageDropIds: DataFrame =
    imageClusters.filter(col("media_id") =!= col("cluster_id"))
      .select(col("media_id").as("doc_id"))

  /** Ids the audio modality drops. */
  def audioDropIds: DataFrame =
    audioClusters.filter(col("media_id") =!= col("cluster_id"))
      .select(col("media_id").as("doc_id"))

  /** Perceptual video near-dup pairs (the m06 result over the
    * instance's clip frame) — AVI decode + middle-frame dHash +
    * combination-LSH; the pair machinery sees 8-byte sigs only. */
  lazy val videoPairs: DataFrame = await(videoChain)._1

  /** Video-modality duplicate clusters — the third member of the
    * perceptual family, through the same modality-agnostic CC step. */
  lazy val videoClusters: DataFrame = await(videoChain)._2

  /** Ids the video modality drops. */
  def videoDropIds: DataFrame =
    videoClusters.filter(col("media_id") =!= col("cluster_id"))
      .select(col("media_id").as("doc_id"))

  /** Joint MEDIA survivors (m05): a document survives only if EVERY
    * perceptual rendition it has — image, audio, and (when the
    * pipeline carries one) video — is its near-dup cluster's min
    * member (or unpaired); the d12 decision join extended to all
    * three media modalities. Same one-anti-join shape: the
    * decision-sized drop sets union, the corpus streams through
    * un-shuffled. */
  def jointMediaSurvivors: DataFrame = {
    // kick every present media chain before awaiting any (guide §2.6):
    // the three synth/decode+LSH+CC DAGs are independent until the
    // final decision join
    imageChain; audioChain; if (video.nonEmpty) videoChain
    val twoWay = imageDropIds.unionByName(audioDropIds)
    val drops =
      if (video.isEmpty) twoWay.distinct()
      else twoWay.unionByName(videoDropIds).distinct()
    val bound = imageClusterCount + audioClusterCount +
      (if (video.isEmpty) 0L else videoClusterCount)
    docsF.join(dropHint(bound)(drops), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }
}

object DedupPipeline {
  /** Text-modality-only pipeline (d02/d08/d10 derivations). */
  def text(docs: DataFrame): DedupPipeline =
    new DedupPipeline(Some(docs), None)

  /** Embedding-modality-only pipeline (d06/d09 derivations). */
  def emb(embeddings: DataFrame,
      tau: Double = Dedup.ProductionEmbTau): DedupPipeline =
    new DedupPipeline(None, Some(embeddings), tau)

  /** Full two-modality pipeline (everything through d12).
    *
    * EAGER-BOTH contract: an instance built through this factory runs
    * BOTH full LSH+CC chains on the first access to ANY per-modality
    * accessor (pairs or clusters of either modality) — the two
    * independent DAGs overlap on the scheduler (guide §2.6), which is
    * what a joint corpus pass wants. A consumer that needs only ONE
    * modality must use [[text]] or [[emb]] instead, or it silently
    * pays the other modality's full pass. */
  def apply(docs: DataFrame, embeddings: DataFrame,
      tau: Double = Dedup.ProductionEmbTau): DedupPipeline =
    new DedupPipeline(Some(docs), Some(embeddings), tau)

  /** Media-modality pipeline (m03/m04/m06 pair+cluster frames, m05
    * joint survivors) over (media_id, content) image, audio, and
    * optional video frames whose ids share the documents id space. */
  def media(docs: DataFrame, images: DataFrame, audio: DataFrame,
      video: Option[DataFrame] = None): DedupPipeline =
    new DedupPipeline(Some(docs), None,
      Dedup.ProductionEmbTau, Some(images), Some(audio), video)
}
