package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Batch/stream equivalence: the same events fed through a MemoryStream
  * must produce the same windowed aggregates and session assignments as the
  * batch operators in graft.operators.Events.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts matches the batch windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(events)
    val q = StreamOps.windowedCounts(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win")
      .orderBy("window_start", "event_type").collect()
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("vocabTracker: the planted heavy token survives across trigger " +
       "batches within the n/k undercount; state is ONE sketch row, not " +
       "per-token") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val q = StreamOps.vocabTracker(stream.toDF().toDF("text"), k = 10)
      .writeStream.format("memory").queryName("vocab")
      .outputMode("complete").start()
    try {
      // batch 1: 60 tokens, "hot" is 20 of them (freq 1/3 >> n/k = 1/10)
      stream.addData(Seq.fill(20)("hot noise1 noise2").mkString(" "))
      q.processAllAvailable()
      // batch 2: different filler, "hot" stays heavy over the HISTORY
      stream.addData(Seq.tabulate(10)(i => s"hot fill$i").mkString(" "))
      q.processAllAvailable()
      val est = spark.table("vocab").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // 30 true occurrences over n=80 tokens; MG undercount <= n/k = 8
      assert(est.contains("hot"), est)
      assert(est("hot") >= 30 - 8 && est("hot") <= 30, est)
      // the aggregation state is one buffer row (the sketch), not one
      // row per distinct token (13 distinct so far)
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal == 1,
        state.map(_.numRowsTotal).mkString(","))
    } finally q.stop()
  }

  test("distinctTracker: incremental KMV estimate equals the batch " +
       "estimate over the concatenated history; state stays O(k)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val q = StreamOps.distinctTracker(
        stream.toDF().toDF("source", "doc_id"), "doc_id", "source", k = 64)
      .writeStream.format("memory").queryName("dcount")
      .outputMode("complete").start()
    try {
      // two batches with OVERLAPPING ids: true distinct for s0 is 600
      stream.addData((0L until 400L).map(i => ("s0", i)))
      q.processAllAvailable()
      stream.addData((200L until 600L).map(i => ("s0", i)))
      q.processAllAvailable()
      val est = spark.table("dcount").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      // exact same estimate as running the sketch over the full history
      // in one batch — union-merge has no incremental drift
      val batch = StreamOps.distinctTracker(
          ((0L until 400L) ++ (200L until 600L)).map(("s0", _))
            .toDF("source", "doc_id"),
          "doc_id", "source", k = 64)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(est == batch, s"stream=$est batch=$batch")
      // within KMV theory error of the true 600 (4 sigma)
      assert(math.abs(est("s0") - 600) < 4 * 600 / math.sqrt(62.0), est)
      // state is one sketch row per stratum, not one row per distinct id
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal == 1,
        state.map(_.numRowsTotal).mkString(","))
    } finally q.stop()
  }

  test("append mode: an event behind the watermark is dropped from its " +
       "already-closed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowedCounts(
        stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      // batch 1: one event in [10,11); a 13:30 event pushes the watermark
      // to 11:30 at batch end, past the window's close
      stream.addData(Seq(
        (ts("2024-01-01 10:00:00"), "click", 1.0),
        (ts("2024-01-01 13:30:00"), "click", 1.0)))
      q.processAllAvailable()
      // batch 2: a LATE event for the closed [10,11) window (behind the
      // 11:30 watermark -> dropped), plus a fresh event advancing time
      stream.addData(Seq(
        (ts("2024-01-01 10:15:00"), "click", 5.0),
        (ts("2024-01-01 16:00:00"), "click", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val w10 = spark.table("late")
      .filter(col("window_start") === ts("2024-01-01 10:00:00")).collect()
    assert(w10.length == 1, w10.mkString(";"))
    // the late 5.0-value event contributed nothing
    assert(w10.head.getAs[Long]("n_events") == 1L &&
      w10.head.getAs[Double]("total_value") == 1.0, w10.head)
  }

  test("stateful sessionize matches the batch window sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val events = raw.select(col("event_id"), col("user_id"), col("ts"))
      .as[StreamOps.SessionEvent].collect().toSeq

    val stream = MemoryStream[StreamOps.SessionEvent]
    stream.addData(events)
    val q = StreamOps.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sess")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val batch = graft.SparkEntry.queries("e_sessionize")(
        spark, "/root/testdata/sf0.001")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
  }

  test("sessionize state carries across trigger batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.SessionEvent]
    val q = StreamOps.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    try {
      // batch 1: two events 10 min apart -> one session
      stream.addData(
        StreamOps.SessionEvent(1L, 7L, ts("2024-01-01 10:00:00")),
        StreamOps.SessionEvent(2L, 7L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // batch 2: 20 min later (same session), then a 2h gap (new session)
      stream.addData(
        StreamOps.SessionEvent(3L, 7L, ts("2024-01-01 10:30:00")),
        StreamOps.SessionEvent(4L, 7L, ts("2024-01-01 12:31:00")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess2").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("streaming dedup drops redelivered event ids across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamOps.dedupEvents(
        stream.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:00:00"), 1.0), // same-batch duplicate
        (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      stream.addData((1L, ts("2024-01-01 10:00:00"), 1.0), // redelivery
        (3L, ts("2024-01-01 10:02:00"), 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("native session windows split on the gap and count per session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = StreamOps.sessionCounts(
        stream.toDF().toDF("user_id", "ts"), gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try {
      stream.addData(
        (7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 10:10:00")),
        (7L, ts("2024-01-01 12:00:00")), // >30min later -> new session
        (8L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess_win")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((7L, 2L), (7L, 1L), (8L, 1L)))
  }

  test("stream-stream attribution join pairs clicks with in-window " +
       "impressions only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamOps.attributeClicks(
        imps.toDF().toDF("impression_id", "user_id", "ts"),
        clks.toDF().toDF("click_id", "user_id", "ts"),
        within = "30 minutes")
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      imps.addData((100L, 7L, ts("2024-01-01 10:00:00")),
        (101L, 8L, ts("2024-01-01 10:00:00")))
      clks.addData(
        (1L, 7L, ts("2024-01-01 10:10:00")), // in window -> attributed
        (2L, 8L, ts("2024-01-01 11:10:00")), // >30min after -> dropped
        (3L, 9L, ts("2024-01-01 10:05:00"))) // no impression -> dropped
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("attr")
      .select("impression_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 1L)))
  }

  test("outer attribution: matched impressions emit with their click; " +
       "unmatched ones emit with null click once the watermark closes " +
       "their join window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val q = StreamOps.attributeClicksOuter(
        imps.toDF().toDF("impression_id", "user_id", "ts"),
        clks.toDF().toDF("click_id", "user_id", "ts"),
        within = "30 minutes")
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      imps.addData((100L, 7L, ts("2024-01-01 10:00:00")), // will match
        (101L, 8L, ts("2024-01-01 10:00:00")))            // never clicks
      clks.addData((1L, 7L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // late traffic on BOTH streams advances the global watermark past
      // 10:30 + the 1h delay, provably closing impression 101's window...
      imps.addData((200L, 99L, ts("2024-01-01 13:00:00")))
      clks.addData((9L, 98L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      // ...and the eviction lands in the NEXT trigger after the watermark
      // update (watermarks are computed at batch end)
      imps.addData((201L, 99L, ts("2024-01-01 13:01:00")))
      clks.addData((10L, 98L, ts("2024-01-01 13:01:00")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("attr_outer")
      .select("impression_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    // 100 matched; 101 emitted unmatched exactly once; the 13:00+ traffic
    // is still inside its own window, so it has not emitted yet
    assert(out == Set((100L, Some(1L)), (101L, None)), out.toString)
  }

  test("stream-static enrich matches the batch left join, dim-side " +
       "broadcast per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Long, Double)]
    val q = StreamOps.enrich(
        stream.toDF().toDF("event_id", "user_id", "value"), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      stream.addData((1L, 7L, 1.0), (2L, 8L, 2.0), (3L, 9L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    // join(Seq(key)) puts the key first: (user_id, event_id, value, tier)
    val out = spark.table("enriched").orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    // unmatched key keeps the row with a NULL tier (left-join semantics)
    assert(out == Seq((7L, Some("gold")), (8L, Some("basic")), (9L, None)))
  }

  test("dedupIngest: intra-batch dups rejected, later batches dedup " +
       "against the stored index, corpus and rejects grow correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest")
    def dir(n: String) = root.resolve(n).toString

    // 40-token texts; a near-dup appends ONE token -> Jaccard ~ 38/39
    val textA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 40).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 40).map(i => s"gamma$i").mkString(" ")

    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngest(stream.toDF().toDF("doc_id", "text"),
      dir("corpus"), dir("index"), dir("rejects"), dir("ckpt"))
    try {
      // batch 0: A, B, and an intra-batch near-dup of A
      stream.addData((1L, textA), (2L, textB), (3L, textA + " extra"))
      q.processAllAvailable()
      val afterB0 = spark.read.parquet(dir("corpus"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(afterB0 == Set(1L, 2L), afterB0)

      // batch 1: a near-dup of corpus doc B, plus genuinely new C
      stream.addData((4L, textB + " tail"), (5L, textC))
      q.processAllAvailable()
    } finally q.stop()

    val corpus = spark.read.parquet(dir("corpus"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 2L, 5L), corpus)

    val rejects = spark.read.parquet(dir("rejects"))
      .select("doc_id", "dup_of", "reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rejects == Set((3L, 1L, "intra_batch"), (4L, 2L, "corpus")),
      rejects)

    // the stored band index covers exactly the accepted corpus
    val indexed = spark.read.parquet(dir("index"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 5L), indexed)
  }

  test("embeddingIngest: intra-batch semantic twins collapse, a stored-" +
       "corpus twin rejects via the reloaded bucket index, the store and " +
       "index stay consistent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_vec_ingest")
    def dir(n: String) = root.resolve(n).toString
    def axis(i: Int, s: Double) = Seq.tabulate(8)(j =>
      if (j == i) s else 0.0)

    val stream = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.embeddingIngest(
      stream.toDF().toDF("vec_id", "embedding"),
      dir("store"), dir("index"), dir("rejects"), dir("ckpt"),
      planes = 4, tables = 8, threshold = 0.95, dim = 8)
    try {
      // batch 0: two directions + an intra-batch twin of vec 1 (cos = 1)
      stream.addData((1L, axis(0, 1.0)), (2L, axis(1, 1.0)),
        (3L, axis(0, 2.0)))
      q.processAllAvailable()
      val afterB0 = spark.read.parquet(dir("store"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(afterB0 == Set(1L, 2L), afterB0)

      // batch 1: a twin of STORED vec 2, plus a genuinely new direction
      stream.addData((4L, axis(1, 3.0)), (5L, axis(2, 1.0)))
      q.processAllAvailable()
    } finally q.stop()

    val store = spark.read.parquet(dir("store"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(store == Set(1L, 2L, 5L), store)
    val rejects = spark.read.parquet(dir("rejects"))
      .select("vec_id", "dup_of", "reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rejects == Set((3L, 1L, "intra_batch"), (4L, 2L, "corpus")),
      rejects)
    // the corpus-twin audit row carries the exact cosine
    val cos4 = spark.read.parquet(dir("rejects"))
      .filter(col("vec_id") === 4L).select("cos").head().getDouble(0)
    assert(math.abs(cos4 - 1.0) < 1e-12, cos4.toString)
    // the stored bucket index covers exactly the accepted store
    val indexed = spark.read.parquet(dir("index"))
      .select("vid").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 5L), indexed)
  }

  test("dedupIngest full pipeline: quality gate rejects junk with its own " +
       "reason, accepted docs are PII-redacted before storage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_q")
    def dir(n: String) = root.resolve(n).toString
    // fluent text with planted PII vs sub-threshold junk (short + puncty)
    val good = (1 to 30).map(i => s"word$i").mkString(" ") +
      " the and of contact me at someone@example.com please"
    val junk = "@@@ ###"

    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.dedupIngest(stream.toDF().toDF("doc_id", "text"),
      dir("corpus"), dir("index"), dir("rejects"), dir("ckpt"),
      minQuality = 0.5, redactPii = true)
    try {
      stream.addData((1L, good), (2L, junk))
      q.processAllAvailable()
    } finally q.stop()

    val corpus = spark.read.parquet(dir("corpus"))
      .select("doc_id", "text").collect()
    assert(corpus.map(_.getLong(0)).toSet == Set(1L))
    val stored = corpus(0).getString(1)
    assert(stored.contains("<EMAIL>") && !stored.contains("@example.com"),
      stored) // redacted BEFORE storage
    val rejects = spark.read.parquet(dir("rejects"))
      .select("doc_id", "reason").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rejects == Set((2L, "quality")), rejects)
  }

  test("dedupIngest restarts from its checkpoint: committed batches are " +
       "not reprocessed, state carries via the stored index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_rs")
    def dir(n: String) = root.resolve(n).toString
    val textA = (1 to 40).map(i => s"resta$i").mkString(" ")
    val textB = (1 to 40).map(i => s"restb$i").mkString(" ")

    val stream = MemoryStream[(Long, String)]
    def start() = StreamOps.dedupIngest(stream.toDF().toDF("doc_id", "text"),
      dir("corpus"), dir("index"), dir("rejects"), dir("ckpt"))

    val q1 = start()
    try {
      stream.addData((1L, textA))
      q1.processAllAvailable()
    } finally q1.stop()
    val batchesBefore = spark.read.parquet(dir("corpus"))
      .select("ingest_batch").distinct().count()

    // RESTART: a new query over the same checkpoint + stores. The next
    // batch must dedup against doc 1 purely via the on-disk band index.
    val q2 = start()
    try {
      stream.addData((2L, textA + " again"), (3L, textB))
      q2.processAllAvailable()
    } finally q2.stop()

    val corpus = spark.read.parquet(dir("corpus"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 3L), corpus) // 2 rejected vs restored state
    val rejects = spark.read.parquet(dir("rejects"))
      .select("doc_id", "dup_of", "reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rejects == Set((2L, 1L, "corpus")), rejects)
    // doc 1's partition was committed once and not rewritten on restart
    val batchesAfter = spark.read.parquet(dir("corpus"))
      .select("ingest_batch").distinct().count()
    assert(batchesBefore == 1 && batchesAfter == 2)
  }

  test("dedupIngest replay idempotency: re-running a committed batch with " +
       "the same batchId (the at-least-once foreachBatch retry) leaves " +
       "corpus, index, and rejects bit-identical — accepted docs do NOT " +
       "self-match against their own already-written partition") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_rp")
    def dir(n: String) = root.resolve(n).toString
    val textA = (1 to 40).map(i => s"rpa$i").mkString(" ")
    val textB = (1 to 40).map(i => s"rpb$i").mkString(" ")
    def run(batch: Seq[(Long, String)], id: Long) =
      StreamOps.dedupIngestBatch(batch.toDF("doc_id", "text"), id,
        dir("corpus"), dir("index"), dir("rejects"),
        bands = 16, rows = 4, threshold = 0.8,
        minQuality = 0.0, redactPii = false)
    def snap(d: String, cols: String*) = spark.read.parquet(dir(d))
      .selectExpr(cols: _*).collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))

    run(Seq(1L -> textA), 0L)
    // batch 1: one corpus dup (of A) and one genuinely new doc
    val b1 = Seq(2L -> (textA + " tail"), 3L -> textB)
    run(b1, 1L)
    val (c1, i1, r1) = (snap("corpus", "doc_id", "text", "ingest_batch"),
      snap("index", "doc_id", "band", "ingest_batch"),
      snap("rejects", "doc_id", "dup_of", "reason", "ingest_batch"))
    assert(c1.map(_.head) == Seq(1L, 3L), c1)

    // the retry: same rows, same batchId. Before the ingest_batch <
    // batchId read guard, doc 3 self-matched its own stored copy
    // (jaccard 1.0), was rejected as a corpus dup, and the empty
    // accepted write left a stale corpus partition with no index rows.
    run(b1, 1L)
    assert(snap("corpus", "doc_id", "text", "ingest_batch") == c1)
    assert(snap("index", "doc_id", "band", "ingest_batch") == i1)
    assert(snap("rejects", "doc_id", "dup_of", "reason", "ingest_batch") == r1)
  }

  test("embeddingIngest replay idempotency: a same-batchId retry leaves " +
       "store, bucket index, and rejects identical (no self-match via " +
       "the batch's own written partition)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vec_rp")
    def dir(n: String) = root.resolve(n).toString
    def axis(i: Int, s: Double) = Seq.tabulate(8)(j => if (j == i) s else 0.0)
    def run(batch: Seq[(Long, Seq[Double])], id: Long) =
      StreamOps.embeddingIngestBatch(batch.toDF("vec_id", "embedding"), id,
        dir("store"), dir("index"), dir("rejects"),
        planes = 4, tables = 8, threshold = 0.95, dim = 8)
    def snap(d: String, cols: String*) = spark.read.parquet(dir(d))
      .selectExpr(cols: _*).collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))

    run(Seq(1L -> axis(0, 1.0), 2L -> axis(1, 1.0)), 0L)
    // batch 1: a twin of stored vec 2 plus a new direction
    val b1 = Seq(4L -> axis(1, 3.0), 5L -> axis(2, 1.0))
    run(b1, 1L)
    val (s1, i1, r1) = (snap("store", "vec_id", "ingest_batch"),
      snap("index", "vid", "table", "bucket", "ingest_batch"),
      snap("rejects", "vec_id", "dup_of", "reason", "ingest_batch"))
    assert(s1.map(_.head) == Seq(1L, 2L, 5L), s1)

    run(b1, 1L) // the at-least-once retry
    assert(snap("store", "vec_id", "ingest_batch") == s1)
    assert(snap("index", "vid", "table", "bucket", "ingest_batch") == i1)
    assert(snap("rejects", "vec_id", "dup_of", "reason", "ingest_batch") == r1)
  }

  test("stateful debounce resets only on KEPT events and carries state " +
       "across trigger batches — diverging from the batch gap form " +
       "exactly where the semantics differ") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000L
    def ev(id: Long, user: Long, tpe: String, millis: Long) =
      StreamOps.BeaconEvent(id, user, tpe, new Timestamp(millis))
    val stream = MemoryStream[StreamOps.BeaconEvent]
    val q = StreamOps.debounce(stream.toDS(), windowMillis = 6 * h)
      .writeStream.format("memory").queryName("deb")
      .outputMode("append").start()
    try {
      // batch 1: 0h kept; 5h within 6h of KEPT 0h -> dropped; 9h is 9h
      // after the kept 0h -> KEPT (the raw-gap batch op would drop it:
      // 9h-5h = 4h). Other user independent.
      stream.addData(ev(1, 1, "click", 0), ev(2, 1, "click", 5 * h),
        ev(3, 1, "click", 9 * h), ev(4, 2, "click", 5 * h))
      q.processAllAvailable()
      // batch 2: state carries — 13h is 4h after kept 9h -> dropped;
      // 16h is 7h after kept 9h -> kept
      stream.addData(ev(5, 1, "click", 13 * h), ev(6, 1, "click", 16 * h))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("deb").select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 6L), kept)
    // the sequential reference over the merged stream agrees
    val all = Seq((1L, 0L), (2L, 5 * h), (3L, 9 * h), (5L, 13 * h),
      (6L, 16 * h))
    var last = Long.MinValue
    val ref = all.flatMap { case (id, t) =>
      if (last == Long.MinValue || t - last > 6 * h) { last = t; Some(id) }
      else None
    }.toSet + 4L
    assert(kept == ref)
  }

  test("CUSUM drift: state carries across trigger batches, alarms match " +
       "a sequential fold, and both sides reset after an alarm") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def rd(id: Long, key: String, millis: Long, cents: Long) =
      StreamOps.DriftReading(key, id, new Timestamp(millis), cents)
    val stream = MemoryStream[StreamOps.DriftReading]
    // mu0 = 1000, slack 0, threshold 500
    val q = StreamOps.cusumDrift(stream.toDS(), mu0 = 1000L, h = 500L)
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").start()
    try {
      // batch 1: 1000 -> s=(0,0); 1300 -> (300,0); 1400 -> (700,0) ALARM
      // (resets); out-of-order input inside the batch must not matter
      stream.addData(rd(3, "a", 3000, 1400), rd(1, "a", 1000, 1000),
        rd(2, "a", 2000, 1300))
      q.processAllAvailable()
      // batch 2: state resumed at (0,0) after the alarm: 700 -> (0,300);
      // 600 -> (0,700) ALARM; independent key untouched
      stream.addData(rd(4, "a", 4000, 700), rd(5, "a", 5000, 600),
        rd(6, "b", 5000, 1200))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("drift")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(("a", 1L)) == (0L, 0L, false))
    assert(got(("a", 2L)) == (300L, 0L, false))
    assert(got(("a", 3L)) == (700L, 0L, true), "alarm at threshold cross")
    assert(got(("a", 4L)) == (0L, 300L, false), "reset after alarm")
    assert(got(("a", 5L)) == (0L, 700L, true))
    assert(got(("b", 6L)) == (200L, 0L, false), "keys independent")
    // sequential fold over the merged per-key stream replays the signals
    var (sp, sn) = (0L, 0L)
    Seq((1L, 1000L), (2L, 1300L), (3L, 1400L), (4L, 700L), (5L, 600L))
      .foreach { case (id, x) =>
        val up = math.max(0L, sp + (x - 1000L))
        val dn = math.max(0L, sn + (1000L - x))
        val alarm = up > 500L || dn > 500L
        assert(got(("a", id)) == (up, dn, alarm), s"fold mismatch at $id")
        if (alarm) { sp = 0L; sn = 0L } else { sp = up; sn = dn }
      }
  }

  test("streaming KLL quantiles: exact below the compaction budget, " +
       "state carries across batches, and stays bounded far past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def rd(id: Long, key: String, cents: Long) =
      StreamOps.DriftReading(key, id, new Timestamp(id), cents)
    val stream = MemoryStream[StreamOps.DriftReading]
    val q = StreamOps.quantileTracker(stream.toDS(), k = 64,
        probes = Seq(0.5, 0.95))
      .writeStream.format("memory").queryName("quant")
      .outputMode("update").start()
    try {
      // batch 1: values 1..10 — far below any compaction, so the sketch
      // holds the raw data and quantiles are EXACT order statistics
      stream.addData((1L to 10L).map(i => rd(i, "a", i)))
      q.processAllAvailable()
      val b1 = spark.table("quant").collect()
        .map(r => r.getDouble(1) -> (r.getLong(2), r.getLong(3))).toMap
      assert(b1(0.5) == (5L, 10L), s"p50 of 1..10: $b1")   // ceil(.5*10)=5
      assert(b1(0.95) == (10L, 10L))                        // ceil(9.5)=10
      // batch 2: values 11..20 — state carried, quantiles now over 1..20
      stream.addData((11L to 20L).map(i => rd(i, "a", i)))
      q.processAllAvailable()
      // batch 3: a long tail pushes far past the budget; state must stay
      // bounded and n must count every reading
      stream.addData((21L to 2000L).map(i => rd(i, "a", i)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("quant").collect()
      .filter(_.getLong(3) == 2000L)
      .map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(last.nonEmpty, "final batch must emit")
    // KLL rank error on a 0..2000 uniform ramp: estimate within 5% rank
    assert(math.abs(last(0.5) - 1000L) <= 100L, s"p50 drifted: $last")
    assert(math.abs(last(0.95) - 1900L) <= 100L, s"p95 drifted: $last")
  }

  test("merge sink: latest version per key wins, replayed batches are " +
       "idempotent, and the table survives stop/resume") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_msink")
    val store = new graft.olist.Warehouse(spark, dir.toString)
    val ck = dir.resolve("ck").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val updates = stream.toDS()
      .toDF("user_id", "ts", "event_id", "value")
    val q = StreamOps.mergeSink(updates, store, "profile", "user_id", ck)
    try {
      stream.addData((7L, t("2024-01-01 10:00:00"), 1L, 1.0),
        (8L, t("2024-01-01 10:01:00"), 2L, 2.0),
        (7L, t("2024-01-01 10:05:00"), 3L, 7.5)) // in-batch newer wins
      q.processAllAvailable()
      val afterB1 = store.load("profile")
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet
      assert(afterB1 == Set((7L, 3L, 7.5), (8L, 2L, 2.0)), s"$afterB1")
      // batch 2: update key 8, add key 9
      stream.addData((8L, t("2024-01-01 11:00:00"), 4L, 8.0),
        (9L, t("2024-01-01 11:01:00"), 5L, 9.0))
      q.processAllAvailable()
      // at-least-once replay: the SAME rows arrive again
      stream.addData((8L, t("2024-01-01 11:00:00"), 4L, 8.0),
        (9L, t("2024-01-01 11:01:00"), 5L, 9.0))
      q.processAllAvailable()
      val fin = store.load("profile")
        .select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet
      assert(fin == Set((7L, 3L, 7.5), (8L, 4L, 8.0), (9L, 5L, 9.0)),
        s"merge must converge under replay: $fin")
    } finally q.stop()
  }

  test("cohort tracker emits exactly the batch (user, cohort, week) " +
       "relation of e_retention_weekly's substrate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val raw = graft.Tables.events(spark, sf)
    // in-order delivery: the sessionize test's ordering contract
    val events = raw.select(col("user_id"), col("ts"))
      .as[StreamOps.CohortEvent].collect().sortBy(_.ts.getTime).toSeq
    val stream = MemoryStream[StreamOps.CohortEvent]
    // two batches to prove state carries across triggers
    val (b1, b2) = events.splitAt(events.length / 2)
    val q = StreamOps.cohortTracker(stream.toDS())
      .writeStream.format("memory").queryName("cohorts")
      .outputMode("append").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cohorts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch substrate: per-user (distinct week ⋈ first week), in
    // Monday-aligned epoch days exactly like the tracker
    val batch = raw
      .select(col("user_id"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
          lit("1970-01-01").cast("date"))).cast("long").as("w"))
      .distinct()
      .withColumn("cw", min(col("w"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))))
      .select(col("user_id"), col("cw"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }
}
