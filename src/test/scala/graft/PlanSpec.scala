package graft

import java.sql.Timestamp

import graft.catalog.TableStore
import graft.ingest.DynRecord
import graft.operators.Relational

/** Plan-shape assertions: the scale properties the engine depends on
  * (scan pushdown, partition pruning, broadcast of fixed-size dims)
  * must be visible in the physical plan, not assumed. */
class PlanSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  test("predicate and projection push into the parquet scan") {
    val df = Relational.filterProject(spark, Sf0001)
    val plan = executedPlan(df)
    assert(plan.contains("PushedFilters:") && plan.contains("l_quantity"),
      s"no pushed filters in:\n$plan")
    // projection pruning: scan schema carries only the 4 needed columns
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("l_extendedprice,l_discount") || !plan.contains("l_tax"))
  }

  test("date partition pruning reaches the TableStore scan") {
    val store = new TableStore(spark, tmpDir("plan"))
    store.write("t", Seq(
      DynRecord("a", Timestamp.valueOf("2024-01-01 00:00:00"), Map("v" -> 1)),
      DynRecord("b", Timestamp.valueOf("2024-02-01 00:00:00"), Map("v" -> 2))))
    store.flush("t")
    val df = store.read("t").filter("date = DATE'2024-01-01'")
    assert(df.count() == 1)
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.nonEmpty && scanned.forall(_ == 1),
      s"partition pruning failed: $scanned partitions scanned")
  }

  test("fixed-size dims broadcast in the star join") {
    val plan = executedPlan(Relational.starJoin(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("top-K plans as TakeOrderedAndProject (no full sort)") {
    val plan = executedPlan(Relational.topN(spark, Sf0001))
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("t09 bench side broadcasts via AQE when small, degrades to shuffle when not") {
    // small eval set (the driver wrapper's shape): AQE must convert the
    // probe join to broadcast at runtime — corpus side never shuffles
    val small = executedPlan(
      graft.operators.TextAnalysis.decontaminate(spark, Sf0001))
    assert(small.contains("BroadcastHashJoin"),
      s"small eval set not AQE-broadcast:\n$small")
    // an eval set too big to broadcast (simulated via the adaptive
    // threshold): the SAME code must degrade to a shuffle join — not
    // force a driver-sized broadcast, not error
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val big = graft.operators.TextAnalysis.decontaminate(
        docs.filter("doc_id % 23 != 0"), docs.filter("doc_id % 23 = 0"))
      val plan = executedPlan(big)
      assert(!plan.contains("BroadcastHashJoin"),
        s"join did not flip off broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"no shuffle-join fallback in:\n$plan")
      assert(big.count() > 0)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
    }
  }

  test("t20 bloom prune sits on the corpus scan stage, result ≡ t09 exactly") {
    val bloom = graft.operators.TextAnalysis.decontaminateBloom(spark, Sf0001)
    bloom.collect() // force AQE final plan
    // the codegen'd membership probe must gate corpus shingles BEFORE
    // any exchange: only matches + <1% false positives may shuffle.
    // Find the train-side bloom Filter (its output carries doc_id; the
    // bench side's inferred copy does not) and require its subtree to
    // be exchange-free — i.e. the probe runs inside the scan stage.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    val nodes = flatten(bloom.queryExecution.executedPlan)
    val bloomFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") &&
            f.output.exists(_.name == "doc_id") => f
    }
    assert(bloomFilters.nonEmpty, "no corpus-side bloom probe in the plan")
    assert(bloomFilters.forall(f => flatten(f.child).forall {
      case _: org.apache.spark.sql.execution.exchange.Exchange => false
      case _: QueryStageExec => false
      case _ => true
    }), "an exchange sits below the bloom probe — prune is not scan-local")
    // the bloom is a prune, never a decision: rows must equal the exact
    // hash-join path bit-for-bit (shared oracle in SparkEntry)
    val exact = graft.operators.TextAnalysis.decontaminate(spark, Sf0001)
    assert(bloom.collect().toSeq == exact.collect().toSeq,
      "bloom-pruned result diverged from the exact path")
    // empty benchmark set: nothing contaminated, no NPE on the null bloom
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val none = graft.operators.TextAnalysis.decontaminateBloom(
      docs, docs.filter("doc_id < 0"))
    assert(none.count() == 0)
  }

  test("t25 bloom prune gates the bigram join inside the scan stage") {
    val df = graft.operators.TextAnalysis.lmPerplexity(spark, Sf0001)
    df.collect() // force AQE final plan
    // the in-LM bigram filter must run BEFORE any exchange: OOV
    // bigrams (the corpus majority at scale) contribute ln(cb+1)=0 and
    // must never reach the bg join's shuffle
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    val nodes = flatten(df.queryExecution.executedPlan)
    val bloomFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no bloom probe on the bigram branch")
    assert(bloomFilters.forall(f => flatten(f.child).forall {
      case _: org.apache.spark.sql.execution.exchange.Exchange => false
      case _: QueryStageExec => false
      case _ => true
    }), "an exchange sits below the t25 bloom probe — prune is not scan-local")
  }

  test("d10 survivors: corpus anti-joins against a BROADCAST drop set, columns pruned") {
    val plan = executedPlan(graft.operators.Dedup.dedupSurvivors(spark, Sf0001))
    // the non-survivor side is small (cluster members only) → broadcast
    // anti join; the corpus must stream, not shuffle, through the drop
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"drop set not broadcast-anti-joined:\n$plan")
    // column pruning reaches the documents scan through the anti join:
    // d10 outputs (doc_id, n_chars), so the scan must not read text
    val docScans = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("documents"))
      .filter(l => l.contains("n_chars")).toSeq
    assert(docScans.nonEmpty && docScans.forall(!_.contains("text")),
      s"survivor scan reads pruned-away columns:\n${docScans.mkString("\n")}")
  }

  test("graft_dot is session-registered via extensions (SQL-usable)") {
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("aes field encryption round-trips and hides plaintext") {
    import graft.functions.FieldEncryption._
    import spark.implicits._
    val key = "0123456789abcdef" // 16-byte AES key
    val df = Seq(("u1", "alice@example.com"), ("u2", "bob@example.com"))
      .toDF("id", "email")
    val enc = encryptFields(df, Seq("email"), key)
    val encRows = enc.collect()
    assert(encRows.forall(r => !r.getAs[String]("email").contains("@")))
    val dec = decryptFields(enc, Seq("email"), key).orderBy("id").collect()
    assert(dec.map(_.getAs[String]("email")).toSeq ==
      Seq("alice@example.com", "bob@example.com"))
    // the key must not surface anywhere a plan is rendered
    val renderings = Seq(
      enc.queryExecution.executedPlan.toString,
      enc.queryExecution.optimizedPlan.toString,
      enc.queryExecution.logical.toString,
      enc.queryExecution.explainString(org.apache.spark.sql.execution.ExtendedMode))
    renderings.foreach(p =>
      assert(!p.contains(key), s"AES key leaked into plan rendering:\n$p"))
  }

  test("graft_secret_key is NOT SQL-callable (no key exfiltration via SELECT)") {
    import graft.functions.FieldEncryption._
    import spark.implicits._
    // exercise the encryption path first so at least one key id exists
    val df = Seq(("u1", "alice@example.com")).toDF("id", "email")
    decryptFields(encryptFields(df, Seq("email"), "0123456789abcdef"),
      Seq("email"), "0123456789abcdef").collect()
    // a SELECT-level principal must not be able to read raw key bytes:
    // the function is absent from every registry (session extensions
    // inject only the data kernels), so analysis fails
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_secret_key(1)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("unresolved")
      || ex.getMessage.contains("UNRESOLVED_ROUTINE")
      || ex.getMessage.toLowerCase.contains("cannot resolve"),
      s"expected unresolved-function failure, got: ${ex.getMessage}")
  }

  test("ts predicates push to the raw nanos parquet column (NanosTimePushdown)") {
    import org.apache.spark.sql.functions._
    // The driver has shipped events.ts under BOTH encodings across
    // rounds: parquet TIMESTAMP(NANOS) (read as raw long under
    // nanosAsLong, converted by Tables.load) and native micros
    // timestamps. The custom rule exists for the nanos encoding, so pin
    // it against a long-nanos fixture derived from the current testdata
    // — Tables.load takes the same conversion path for a plain INT64
    // ts, which is exactly how the scaling corpora round-trip it.
    val fixture = tmpDir("nanos_events")
    val raw = spark.read.parquet(s"$Sf0001/events.parquet")
    val asNanos =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType) raw
      else raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    asNanos.write.mode("overwrite").parquet(s"$fixture/events.parquet")
    graft.core.Tables.load(spark, fixture, "events").createOrReplaceTempView("events")
    try {
    // the reference's b01 shape: time-windowed count over events
    val df = spark.sql(
      "SELECT count(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'")
    val plan = executedPlan(df)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts,"),
      s"ts filter not pushed to parquet:\n$plan")
    // soundness: pushed plan agrees with an unpushable formulation of the
    // same predicate (abs(datediff) forms defeat both pushdown and the rule)
    val n = df.head().getLong(0)
    val ref = spark.sql(
      """SELECT count(*) AS n FROM events
        |WHERE unix_micros(ts) >= unix_micros(TIMESTAMP '2024-01-15 00:00:00')""".stripMargin)
      .head().getLong(0)
    assert(n == ref, s"pushed=$n unpushed=$ref")
    // boundary semantics across the whole operator family
    for ((op, cmp) <- Seq(
        (">=", "GreaterThanOrEqual"), (">", "GreaterThanOrEqual"),
        ("<", "LessThan"), ("<=", "LessThan"), ("=", "GreaterThanOrEqual"))) {
      val q = spark.sql(
        s"SELECT count(*) AS n FROM events WHERE ts $op TIMESTAMP '2024-01-15 06:30:00'")
      val p = executedPlan(q)
      assert(p.contains(s"$cmp(ts,"), s"'$op' not rewritten:\n$p")
      val r = spark.sql(
        s"""SELECT count(*) AS n FROM events
           |WHERE unix_micros(ts) $op unix_micros(TIMESTAMP '2024-01-15 06:30:00')""".stripMargin)
        .head().getLong(0)
      assert(q.head().getLong(0) == r, s"'$op': pushed=${q.head().getLong(0)} ref=$r")
    }
    } finally {
      // restore the real view: registerAll's per-session cache thinks
      // Sf0001 is registered, so it would never repair the fixture view
      graft.core.Tables.load(spark, Sf0001, "events")
        .createOrReplaceTempView("events")
    }
  }

  test("ts predicates push natively on timestamp-encoded events") {
    // the current testdata encoding, no custom rule involved: a scan
    // filter on a native timestamp column must still reach parquet
    val raw = spark.read.parquet(s"$Sf0001/events.parquet")
    assume(raw.schema("ts").dataType != org.apache.spark.sql.types.LongType)
    graft.core.Tables.registerAll(spark, Sf0001)
    val df = spark.sql(
      "SELECT count(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'")
    val plan = executedPlan(df)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts,"),
      s"native ts filter not pushed to parquet:\n$plan")
    assert(df.head().getLong(0) > 0)
  }
}
