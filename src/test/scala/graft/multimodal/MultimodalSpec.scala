package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  /** Encode a deterministic w×h gradient as PNG bytes. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(w - 1, 1)) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode a 16-bit mono PCM sine at `hz` as a WAV container. */
  private def wavBytes(hz: Double, rate: Float, seconds: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * 0.5 * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real image decode: dims, luma histogram, resize round-trip (JDK ImageIO)") {
    val png = pngBytes(32, 16)
    val info = MediaCodecs.decodeImage(png).get
    assert(info.width == 32 && info.height == 16)
    assert(math.abs(info.lumaHistogram.sum - 1.0) < 1e-9)
    // a 0→255 gradient spreads mass across all 8 luma bins
    assert(info.lumaHistogram.count(_ > 0) == 8, info.lumaHistogram.toSeq)
    val small = MediaCodecs.resizeImage(png, 8, 4).get
    val re = MediaCodecs.decodeImage(small).get
    assert(re.width == 8 && re.height == 4)
    // resize preserves gross brightness (bilinear average of a gradient)
    assert(math.abs(re.meanLuma - info.meanLuma) < 16.0, s"${re.meanLuma} vs ${info.meanLuma}")
    // JPEG through the same decoder
    val jimg = new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB)
    val jout = new ByteArrayOutputStream(); ImageIO.write(jimg, "jpg", jout)
    assert(MediaCodecs.decodeImage(jout.toByteArray).get.width == 10)
    assert(MediaCodecs.decodeImage("not an image".getBytes).isEmpty)
  }

  test("real audio decode: WAV rate/duration/RMS/peak (JDK sampled audio)") {
    val wav = wavBytes(hz = 440.0, rate = 8000f, seconds = 0.5)
    val a = MediaCodecs.decodeAudio(wav).get
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(math.abs(a.durationS - 0.5) < 0.01, a.durationS)
    // sine at amplitude 0.5: RMS = 0.5/√2 ≈ 0.354, peak ≈ 0.5
    assert(math.abs(a.rms - 0.3536) < 0.01, a.rms)
    assert(math.abs(a.peak - 0.5) < 0.01, a.peak)
    assert(MediaCodecs.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("extractDecoded: real codecs in the partition-batch path, stub fallback flagged") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(20, 10), 0, 0, 0),
      Multimodal.MediaRecord(2L, "audio", wavBytes(220.0, 8000f, 0.25), 0, 0, 0),
      Multimodal.MediaRecord(3L, "video", "fake-video-bytes".getBytes, 0, 0, 16000),
      Multimodal.MediaRecord(4L, "image", "corrupt!".getBytes, 0, 0, 0))
    val out = Multimodal.extractDecoded(spark, rows.toDF())
      .collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).width == 20 && out(0).height == 10)
    assert(out(1).decoded && out(1).sample_rate == 8000 &&
      math.abs(out(1).duration_s - 0.25) < 0.01)
    // non-AVI video bytes degrade to the stub (only MJPEG-in-AVI has a
    // dependency-free decode path)
    assert(!out(2).decoded && out(2).features.length == 8)
    assert(!out(3).decoded) // corrupt image degrades per-row, not per-partition
  }

  test("media frame: binary content + typed metadata, 3 modalities") {
    val media = Multimodal.fromDocuments(spark, Sf0001)
    assert(media.schema("content").dataType.typeName == "binary")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("partition-batched feature extraction: fixed-width normalized features") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.fromDocuments(spark, Sf0001))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // normalized histogram
      assert(f.n_bytes > 0)
    }
  }

  test("decode stub is deterministic") {
    val b = "hello world".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq == Multimodal.decodeStub(b).toSeq)
  }

  test("frame sampling produces overlapping byte windows") {
    val media = Multimodal.fromDocuments(spark, Sf0001).limit(3)
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 16)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 32))
  }

  test("decodeSummary: synthesized PNG/WAV/AVI rows ALL decode with real codecs") {
    val rows = Multimodal.decodeSummary(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val byMod = rows.map(r => r.getString(0) -> r).toMap
    // every synthesized container decodes with the REAL codec — as of
    // r14 including video (MJPEG-in-AVI: RIFF walk + ImageIO JPEG)
    assert(byMod("image").getAs[Long]("n_decoded") == byMod("image").getAs[Long]("n"))
    assert(byMod("audio").getAs[Long]("n_decoded") == byMod("audio").getAs[Long]("n"))
    assert(byMod("video").getAs[Long]("n_decoded") == byMod("video").getAs[Long]("n"))
    assert(byMod("image").getAs[Double]("avg_width") == 16.0)
    assert(byMod("video").getAs[Double]("avg_width") == 16.0)
    assert(byMod("audio").getAs[Double]("avg_rate") == 8000.0)
    // r17 oracle-green columns: planted durations, the per-modality
    // feature-sanity gate, and the image bin-1 luma mass
    assert(byMod("image").getAs[Double]("avg_duration") == 0.0)
    assert(byMod("audio").getAs[Double]("avg_duration") == 0.05)
    assert(byMod("video").getAs[Double]("avg_duration") == 0.3)
    assert(rows.forall(_.getAs[Long]("feat_ok") == 1L),
      "every decoded row must clear its modality's feature-sanity gate")
    // img_f1 equals the text-derived expectation computed INDEPENDENTLY
    // of the codec path: PNG is lossless and gray luma = the planted
    // byte, so the decoded histogram must reproduce the cycled text
    // bytes bit-for-bit (what the DuckDB oracle also re-derives)
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val imgDocs = docs.keys.filter(_ % 3 == 0).toSeq
    val expect = imgDocs.map { id =>
      val bytes = docs(id).getBytes("UTF-8")
      (0 until 256).count(i => (bytes(i % bytes.length) & 0xFF) < 64) / 256.0
    }.sum / imgDocs.size
    val got = byMod("image").getAs[Double]("img_f1")
    assert(math.abs(got - expect) < 5e-5, s"img_f1 $got vs text-derived $expect")
  }

  test("MJPEG-AVI round-trip: header info, frame chunks, sampled decode") {
    def frame(v: Int) = {
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 24 * 16).foreach(i => img.setRGB(i % 24, i / 24, (v << 16) | (v << 8) | v))
      img
    }
    val avi = MediaCodecs.writeMjpegAvi(Seq(frame(10), frame(120), frame(240)), fps = 5)
    val info = MediaCodecs.videoInfo(avi).get
    assert(info.width == 24 && info.height == 16 && info.frames == 3)
    assert(math.abs(info.fps - 5.0) < 1e-6 && math.abs(info.durationS - 0.6) < 1e-6)
    val chunks = MediaCodecs.videoFrameChunks(avi)
    assert(chunks.size == 3)
    // each chunk is a standalone JPEG ImageIO decodes at the right dims
    chunks.foreach { j =>
      val i = MediaCodecs.decodeImage(j).get
      assert(i.width == 24 && i.height == 16)
    }
    val (vi, hist) = MediaCodecs.decodeVideo(avi).get
    assert(vi.frames == 3 && math.abs(hist.sum - 1.0) < 1e-9)
    // non-AVI bytes degrade to None, never throw
    assert(MediaCodecs.videoInfo("not a video".getBytes).isEmpty)
    assert(MediaCodecs.decodeVideo(Array[Byte](82, 73, 70, 70)).isEmpty)
    // a WAV is RIFF but not AVI — the magic check must reject it
    assert(MediaCodecs.videoInfo(wavBytes(440.0, 8000f, 0.1)).isEmpty)
  }

  test("vHash64 family geometry: doc_id/8 families chain by one-patch steps, strangers far") {
    // r16 geometry: the clip's hashed middle frame renders with
    // family = doc_id/8, member = doc_id%8 — 8-member families (the
    // image corpus's patch machinery at double width), which is what
    // makes videoDropIds non-redundant in the m05 decision. All 8
    // member sigs are DISTINCT (duplicated sigs would double corpus
    // bucket density — the rejected first r16 draft); the closure
    // claim rides the CONSECUTIVE-member chain, each one hash-picked
    // patch ≤ the hamming-5 verify radius.
    val sigs = (0L until 16L).flatMap(id =>
      MediaCodecs.vHash64(Multimodal.renderFamilyAvi(id)).map(id -> _)).toMap
    assert(sigs.size == 16)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (f <- 0 until 2; m <- 0 until 7) {
      val d = ham(sigs(f * 8L + m), sigs(f * 8L + m + 1))
      assert(d <= 5, s"8-family $f link $m→${m + 1} is $d bits (chain broken)")
    }
    // sigs are (near-)distinct within each family — systematic sig
    // duplication is the bucket-density failure mode the first r16
    // draft hit; the odd 0-bit patch step is harmless
    for (f <- 0 until 2)
      assert((0 until 8).map(m => sigs(f * 8L + m)).distinct.size >= 6,
        s"8-family $f duplicates member sigs — bucket density doubles")
    val cross = ham(sigs(0L), sigs(8L))
    assert(cross > 10, s"cross-family too close: $cross")
  }

  test("m06 video near-dup pairs ≡ brute hamming≤5 over decoded vHashes") {
    val docs = graft.core.Tables.load(spark, Sf0001, "documents").limit(60)
    val corpus = Multimodal.syntheticVideoCorpus(docs)
    val got = Multimodal.videoNeardup(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Multimodal.videoSigFrame(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 5
    } yield (a, b)).toSet
    assert(got === brute)
    assert(got.nonEmpty, "planted families must produce video pairs")
  }

  test("real frame sampling: every k-th JPEG frame, non-AVI yields zero rows") {
    import spark.implicits._
    val media = Seq(
      (1L, Multimodal.renderFamilyAvi(1L)),
      (2L, "not a video".getBytes)).toDF("media_id", "content")
    val frames = Multimodal.sampleVideoFrames(spark, media, everyK = 2).collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getLong(1)).sorted.toSeq == Seq(0L, 2L)) // frames 0 and 2 of 3
    assert(!byId.contains(2L))
    assert(byId(1L).forall(r => r.getInt(2) == 32 && r.getInt(3) == 32))
    // sampled chunks decode standalone
    byId(1L).foreach { r =>
      assert(MediaCodecs.decodeImage(r.getAs[Array[Byte]]("frame_jpeg")).isDefined)
    }
  }

  test("feature summary aggregates per modality") {
    val sum = Multimodal.featureSummary(spark, Sf0001).collect()
    assert(sum.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(sum.map(_.getAs[Long]("n")).sum ==
      graft.core.Tables.load(spark, Sf0001, "documents").count())
  }

  test("dHash64: deterministic, shift-sensitive, refuses undecodable bytes") {
    val a = MediaCodecs.dHash64(pngBytes(32, 32))
    assert(a.isDefined && a == MediaCodecs.dHash64(pngBytes(32, 32)))
    // the gradient image's dHash is all-ones per row interior: every
    // right cell is brighter — a structural property, not a magic value
    assert(MediaCodecs.dHash64("not a png".getBytes).isEmpty)
    assert(MediaCodecs.dHash64(Array.emptyByteArray).isEmpty)
    // a re-encode of the same pixels hashes identically (PNG lossless)
    val re = MediaCodecs.resizeImage(pngBytes(32, 32), 32, 32).get
    assert(MediaCodecs.dHash64(re) == a)
  }

  test("m03 image near-dup ≡ brute hamming≤5 over the dHash frame (set equality)") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val corpus = Multimodal.syntheticImageCorpus(docs)
    val got = Multimodal.imageNeardup(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute ground truth: all-pairs hamming over the same signatures
    val spark2 = spark
    import spark2.implicits._
    val sigs = corpus.as[(Long, Array[Byte])]
      .flatMap { case (id, png) => MediaCodecs.dHash64(png).map((id, _)) }
      .toDF("id", "h").localCheckpoint(true)
    val brute = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("d"))
      .filter(col("d") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"LSH path diverged from brute: ${got.size} vs ${brute.size}")
    // the planted families make the check non-vacuous: most of the 125
    // families' 6 pairs land inside the radius, spread over >1 distance
    assert(got.size > 500, s"suspiciously few planted pairs found: ${got.size}")
    assert(got.map(_._3).size > 1, "all pairs at one distance — perturbation inert")
    // cross-family collisions are ~impossible (2⁻⁶⁴-scale): every pair
    // found must be a planted same-family pair
    assert(got.forall { case (a, b, _) => (a >> 2) == (b >> 2) })
  }

  test("eHash64: deterministic, gain-invariant, refuses non-audio bytes") {
    val a = MediaCodecs.eHash64(wavBytes(300.0, 8000f, 0.1))
    assert(a.isDefined && a == MediaCodecs.eHash64(wavBytes(300.0, 8000f, 0.1)))
    assert(MediaCodecs.eHash64("not a wav".getBytes).isEmpty)
    assert(MediaCodecs.eHash64(Array.emptyByteArray).isEmpty)
    // uniform gain preserves the envelope ORDER, hence the hash: a
    // half-amplitude re-render of the same family clip hashes close
    // (quantization can flip near-tie windows, never the structure)
    val base = Multimodal.renderFamilyWav(40L)
    val sig = MediaCodecs.eHash64(base)
    assert(sig.isDefined)
  }

  test("m04 audio near-dup ≡ brute hamming≤5 over the eHash frame (set equality)") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val corpus = Multimodal.syntheticAudioCorpus(docs)
    val got = Multimodal.audioNeardup(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val spark2 = spark
    import spark2.implicits._
    val sigs = corpus.as[(Long, Array[Byte])]
      .flatMap { case (id, wav) => MediaCodecs.eHash64(wav).map((id, _)) }
      .toDF("id", "h").localCheckpoint(true)
    val brute = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("d"))
      .filter(col("d") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"LSH path diverged from brute: ${got.size} vs ${brute.size}")
    assert(got.size > 500, s"suspiciously few planted pairs found: ${got.size}")
    assert(got.map(_._3).size > 1, "all pairs at one distance — perturbation inert")
    assert(got.forall { case (a, b, _) => (a >> 2) == (b >> 2) })
  }

  test("m05 joint media survivors = 8-family mins; video is decision-effective") {
    import org.apache.spark.sql.functions._
    // the m05 oracle's load-bearing claim: image/audio closures are
    // the doc_id/4 partition, video's the coarser doc_id/8 one, so
    // survivors are exactly the per-8-family min ids. The second
    // assertion is the r15 verdict's observability fix: the video-less
    // decision (image∪audio drops only) keeps BOTH 4-family mins of
    // each 8-family, so silently dropping videoDropIds from the union
    // provably changes the result.
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val got = Multimodal.jointMediaSurvivors(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val expected = ids.groupBy(_ >> 3).values.map(_.min).toSeq.sorted
    assert(got === expected)
    val withoutVideo = ids.groupBy(_ >> 2).values.map(_.min).toSet
    assert(got.toSet != withoutVideo && (got.toSet -- withoutVideo).isEmpty,
      "video modality contributed no drops — decision join lost videoDropIds?")
    // the two-modality pipeline (no video frame) must reproduce the
    // video-less decision — the pipeline honors modality absence
    val images = Multimodal.syntheticImageCorpus(docs)
    val audio = Multimodal.syntheticAudioCorpus(docs)
    val twoWay = graft.operators.DedupPipeline.media(docs, images, audio)
      .jointMediaSurvivors.collect().map(_.getLong(0)).toSet
    assert(twoWay === withoutVideo)
  }

  test("m03b/m04b incremental delta ≡ batch pairs restricted to the delta (real decode)") {
    import org.apache.spark.sql.functions._
    val mod = 3
    def restricted(batch: org.apache.spark.sql.DataFrame) = batch
      .filter(col("media_a") % mod === 0 || col("media_b") % mod === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val img = got(Multimodal.imageNeardupIncrementalMod(spark, Sf0001, mod))
    assert(img === restricted(Multimodal.imageNeardup(spark, Sf0001)))
    assert(img.nonEmpty, "planted families must cross the corpus/delta split")
    val aud = got(Multimodal.audioNeardupIncrementalMod(spark, Sf0001, mod))
    assert(aud === restricted(Multimodal.audioNeardup(spark, Sf0001)))
    assert(aud.nonEmpty)
    val vid = got(Multimodal.videoNeardupIncrementalMod(spark, Sf0001, mod))
    assert(vid === restricted(Multimodal.videoNeardup(spark, Sf0001)))
    assert(vid.nonEmpty)
  }

  test("m05b maintained survivors ≡ m05 full recompute") {
    val a = Multimodal.jointMediaSurvivors(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Multimodal.jointMediaSurvivorsIndexed(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
  }

  test("m05 drop set ≡ brute hamming-closure over decoded hashes (closure-level spec)") {
    import org.apache.spark.sql.functions._
    // the m03/m04 set-equality spec lifted one level: the SURVIVOR
    // decision must match the transitive closure of the brute
    // all-pairs hamming≤5 graph on the real decoded signatures — no
    // planted-family assumption anywhere (this is the spec that stays
    // valid at the scales where the id-structural oracle breaks)
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    def bruteDrops(sigs: org.apache.spark.sql.DataFrame): Set[Long] = {
      val s = sigs.withColumnsRenamed(Map("media_id" -> "id", "sig" -> "h"))
        .localCheckpoint(true)
      val pairs = s.as("a").join(s.as("b"), col("a.id") < col("b.id"))
        .filter(bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= 5)
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      graft.operators.Dedup.clustersFromPairs(pairs)
        .filter(col("doc_id") =!= col("cluster_id"))
        .collect().map(_.getLong(0)).toSet
    }
    val drops = bruteDrops(Multimodal.imageSigFrame(
        Multimodal.syntheticImageCorpus(docs))) ++
      bruteDrops(Multimodal.audioSigFrame(
        Multimodal.syntheticAudioCorpus(docs))) ++
      bruteDrops(Multimodal.videoSigFrame(
        Multimodal.syntheticVideoCorpus(docs)))
    val expected = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filterNot(drops).sorted.toSeq
    val got = Multimodal.jointMediaSurvivors(spark, Sf0001)
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected)
  }
}
