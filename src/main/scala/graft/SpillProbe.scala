package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Memory-pressure evidence run: executes the shuffle/sort-heaviest
  * queries under deliberately starved execution memory
  * (`spark.memory.fraction` shrunk ~12× from the 0.6 default, driver
  * heap capped via SPARK_DRIVER_MEM) and reports per-query spill
  * bytes from task metrics. The point is to show the plans DEGRADE to
  * UnsafeExternalSorter/appender spills under pressure — completing
  * with nonzero spill — rather than OOM, which a 128 GiB dev box
  * never exercises. Prints one JSON line; the numbers land in
  * PLANS.md's scale-evidence section. */
object SpillProbe {

  /** SPARK_GRAFT_SPILL_ONLY=a,b,c restricts the probed set — for
    * adding rows for new queries without re-measuring the committed
    * ones (the ScalingBench ONLY precedent; output is a printed line,
    * so no record-merge is needed). */
  private def probed: Seq[String] =
    sys.env.get("SPARK_GRAFT_SPILL_ONLY") match {
      case Some(list) =>
        val keep = list.split(',').map(_.trim).toSet
        ProbedAll.filter(keep)
      case None => ProbedAll
    }

  private val ProbedAll = Seq("d02_minhash_lsh", "d03_simhash",
    "d04_ngram_jaccard", "d06_embedding_neardup_prod", "s02_ann_lsh",
    "q06_window", "d11_substring_dedup", "t12_multiquery_search",
    // round-9 additions: the prefix-sum family's window streams, the
    // chunk explode, and the PQ family's ADC shortlist + index build
    "t16_sequence_packing", "t17_domain_mixture", "t19_token_chunks",
    "s04_ann_ivfpq", "s05_ann_pq_index",
    // round-9 continuation: the bloom-pruned join and the media-dedup
    // signature streams (the decode side holds one image/clip at a
    // time; the pair side is the d03 geometry under a new signature)
    "t20_bloom_decontamination", "m03_image_neardup", "m04_audio_neardup",
    // the incremental emb path and its streaming micro-batch form
    // (index + pending-log union)
    "d13_incremental_emb_neardup",
    "sn01_stream_text_score", "sn02_stream_emb_score",
    // the fuzzy assembly's gated-LSH + CC stack and the LM scorer's
    // bigram join under pressure
    "p03_fuzzy_corpus", "t25_lm_perplexity",
    // round-11 additions: the incremental fuzzy path (index build +
    // affected-CC under pressure), the segment-hash window, the
    // temperature selection, and the joint media decision stack
    "p04_incremental_fuzzy", "t26_segment_dedup",
    "t27_temperature_mixture", "m05_joint_media_survivors",
    // round-13 additions: the incremental SemDeDup probe (frozen-cent
    // assignment + cell-scoped member join), its streaming micro-batch
    // form, and the maintained media decision stack — as of r14 the
    // DRIVER m05b binding IS the realistic 1/30 cadence (the retired
    // m05b_small_delta alias resolved to the same dataflow)
    "d15b_semantic_dedup_indexed", "sn06_stream_semantic_batch",
    "m05b_joint_media_survivors_indexed",
    // round-14 addition: the sessionization fold's per-user TreeMap
    // state under a starved executor pool (state is O(live sessions),
    // so the probe interrogates exactly that bound)
    "sn07_sessionize_batch",
    // round-15 additions: the video family joins the every-persisted-
    // index invariant — batch pairs (decode + block-LSH under
    // pressure) and the streaming micro-batch form (frozen video
    // index + pending-log union)
    "m06_video_neardup", "sn05b_stream_video_batch",
    // round-18 addition: the d08 text-graph stack (bucket window sort
    // + iterative CC) — the r17 record flagged its sf100 window sort
    // as sitting near the spill edge in crowded sessions; this row
    // pins that the plan DEGRADES to spill (zero TaskMemoryManager
    // escalation, zero failed tasks) rather than OOM. Run it at the
    // sf100d ladder dir for the scale pin.
    "d08_dedup_clusters")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val frac = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.05")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b0 = GraftSession
      .builder("graft-spill", cpus)
      .master(s"local[$cpus]")
      .config("spark.memory.fraction", frac)
    // optional override of the shuffled-hash build budget, so the probe
    // can test the build-sizing response to starvation directly
    val spark: SparkSession = sys.env.get("SPARK_GRAFT_BUILD_PARTITION_BYTES")
      .fold(b0)(v => b0.config("spark.graft.join.buildPartitionBytes", v))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mem = new java.util.concurrent.atomic.AtomicLong(0)
    val disk = new java.util.concurrent.atomic.AtomicLong(0)
    // GC-pressure escalation watch (the r15 verdict's sn05b ask):
    // TaskMemoryManager allocation retries are WARN-level and benign —
    // the probe's starvation sizing exists to trigger spills — but a
    // task FAILURE under memory pressure is an escalation the record
    // must not read as a clean "ok". Count failed tasks per probe and
    // count TaskMemoryManager log events by severity (log4j2 appender
    // on the root logger — error-level allocation failures mean the
    // retry loop gave up).
    val failedTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.reason != org.apache.spark.Success)
          failedTasks.incrementAndGet()
        Option(te.taskMetrics).foreach { m =>
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val tmmWarns = new java.util.concurrent.atomic.AtomicLong(0)
    val tmmErrors = new java.util.concurrent.atomic.AtomicLong(0)
    locally {
      import org.apache.logging.log4j.Level
      import org.apache.logging.log4j.core.LogEvent
      import org.apache.logging.log4j.core.appender.AbstractAppender
      import org.apache.logging.log4j.core.config.Property
      val counter = new AbstractAppender("graft-tmm-counter", null, null,
          true, Property.EMPTY_ARRAY) {
        override def append(e: LogEvent): Unit =
          if (e.getLoggerName.endsWith("TaskMemoryManager")) {
            if (e.getLevel == Level.WARN) { tmmWarns.incrementAndGet(); () }
            else if (e.getLevel.isMoreSpecificThan(Level.ERROR)) {
              tmmErrors.incrementAndGet(); ()
            }
          }
      }
      counter.start()
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      ctx.getConfiguration.getRootLogger.addAppender(counter, Level.ALL, null)
      // the counters must not depend on whatever level the session's
      // log4j2 config left the root at — a quieter config would
      // silently zero tmm_warns/tmm_errors and rest the escalation
      // watch on failed_tasks alone. Force the TaskMemoryManager
      // logger itself to WARN so its retry/failure events always
      // reach the appender, config notwithstanding.
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.memory.TaskMemoryManager", Level.WARN)
      ctx.updateLoggers()
    }

    val results = probed.map { name =>
      mem.set(0); disk.set(0); failedTasks.set(0)
      tmmWarns.set(0); tmmErrors.set(0)
      val t0 = System.nanoTime()
      val outcome =
        try {
          // benchQueries: probe the SERVING form where the driver-gate
          // form is a gate-only wrapper (s02–s05) — same reasoning as
          // Bench/ScalingBench, and it keeps spill rows comparable
          // with the committed pre-r17 record
          SparkEntry.benchQueries.getOrElse(name, ScalingBench.Extra(name))(
            spark, sfDir).count()
          "ok"
        }
        catch { case e: Throwable =>
          System.err.println(s"[spill] $name failed: ${e.getMessage}"); "fail" }
      val sec = (System.nanoTime() - t0) / 1e9
      graft.core.Caching.releaseAll(spark) // query boundary (see Caching)
      Thread.sleep(1500) // drain in-flight task-end events (bus is private)
      // a probe that completed only through task retries or gave up
      // allocating is an ESCALATION, not a clean pass — the record must
      // say so (the r15 sn05b GC-tail watch, made machine-checkable)
      val status =
        if (outcome != "ok") outcome
        else if (tmmErrors.get() > 0 || failedTasks.get() > 0) "retry_escalation"
        else "ok"
      name -> ((status, sec, mem.get(), disk.get(),
        tmmWarns.get(), tmmErrors.get(), failedTasks.get()))
    }
    val qs = results.map { case (n, (o, s, m, d, w, e, ft)) =>
      f""""$n":{"status":"$o","sec":$s%.2f,"spill_mem_mb":${m / 1048576L},"spill_disk_mb":${d / 1048576L},"tmm_warns":$w,"tmm_errors":$e,"failed_tasks":$ft}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"spill_probe","mem_fraction":$frac,"heap":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
