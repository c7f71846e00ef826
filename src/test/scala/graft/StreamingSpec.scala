package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** A document arriving on an ingestion stream (minhash index probe). */
case class StreamDoc(ts: Timestamp, doc_id: Long, text: String)

/** Structured Streaming behavior: windowed aggregation under a watermark
  * (late data dropped, windows finalize) and stateful gap sessionization. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("index-served minhash probe streams: stream ≡ batch, multi-band matches collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Dedup, MinHashIndex}
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "colorless green ideas sleep furiously at night"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("mh_stream").toString + "/idx"
    val art = MinHashIndex.buildAndSave(corpus, "doc_id", "text", path = path)

    val docs = Seq(
      // near-dup of corpus 1 (one token changed → many shared bands:
      // the pair matches in several buckets, the watermark dedup must
      // collapse it to ONE row, like the batch dropDuplicates)
      StreamDoc(ts(0), 101L, "the quick brown fox jumps over the lazy dog yesterday"),
      StreamDoc(ts(0), 103L, "nothing here resembles anything stored at all"),
      // second micro-batch: an exact copy of corpus 2
      StreamDoc(ts(1), 102L, "pack my box with five dozen liquor jugs"))

    val input = MemoryStream[StreamDoc]
    val query = Dedup.minhashPairsAgainstIndexStream(input.toDF(),
      "doc_id", "text", "ts", "10 minutes", art, threshold = 0.5)
      .writeStream.format("memory").queryName("mh_stream_pairs")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs(0), docs(1))
      query.processAllAvailable()
      input.addData(docs(2))
      query.processAllAvailable()
      val got = spark.table("mh_stream_pairs")
        .orderBy("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // the batch twin over the union of everything streamed
      val expected = Dedup.minhashPairsAgainstIndex(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", art, threshold = 0.5)
        .orderBy("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expected)
      assert(got.map(_._1).toSet == Set(101L, 102L))
      assert(got.map(_._1).distinct.size == got.size,
        "multi-band matches of one pair must collapse to a single row")
      // the exact copy estimates J=1 through the signatures
      assert(got.find(_._1 == 102L).exists(_._3 == 1.0))
      // the static side persists by default: after two triggers the
      // micro-batch plan serves signatures from the in-memory relation
      // — no per-trigger parquet re-scan, and the oversized-bucket
      // aggregation (already resolved once at stream build) has no
      // reason to ever rerun
      assert(art.sigs.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "persistStatic=true must persist the signature relation")
      val exec = query.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      assert(exec.collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
      }.nonEmpty, "static signatures must be served from cache")
      assert(exec.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.isEmpty, "no per-trigger parquet re-scan of the signature relation")
    } finally { query.stop(); art.sigs.unpersist() }
  }

  test("index-served streaming admission ≡ batch admission across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Dedup, MinHashIndex}
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "colorless green ideas sleep furiously at night"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("mh_admit").toString + "/idx"
    val art = MinHashIndex.buildAndSave(corpus, "doc_id", "text", path = path)

    val docs = Seq(
      StreamDoc(ts(0), 101L, "the quick brown fox jumps over the lazy dog yesterday"),
      StreamDoc(ts(0), 103L, "nothing here resembles anything stored at all"),
      StreamDoc(ts(1), 102L, "pack my box with five dozen liquor jugs"))

    val input = MemoryStream[StreamDoc]
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val query = Dedup.dropNearDuplicatesAgainstIndexStream(input.toDF(),
      "doc_id", "text", art, threshold = 0.5) { (b, epoch) =>
        epochs += epoch
        // the admitted frame keeps the batch's original schema
        assert(b.columns.toSeq == Seq("ts", "doc_id", "text"))
        admitted ++= b.select("doc_id").collect().map(_.getLong(0))
      }.start()
    try {
      input.addData(docs(0), docs(1))
      query.processAllAvailable()
      input.addData(docs(2))
      query.processAllAvailable()
      // the sink ran once per micro-batch, including the all-dropped one
      assert(epochs.distinct.size == 2)
      // only the novel document survives; the near-dup of corpus 1 and
      // the exact copy of corpus 2 are both dropped — exactly what ONE
      // batch admission over the union admits
      val batchIds = Dedup.dropNearDuplicatesAgainstIndex(
        docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", art, threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(admitted.sorted.toSeq == batchIds)
      assert(admitted.toSeq == Seq(103L))
    } finally { query.stop(); art.sigs.unpersist() }
  }

  test("windowed counts finalize once the watermark passes, late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.windowedTypeCounts(input.toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("windowed")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0, 10), 1, "click", 1.0),
        Event(2, ts(0, 40), 2, "click", 2.0),
        Event(3, ts(1, 10), 1, "view", 5.0))
      query.processAllAvailable()
      // watermark: max(ts)=10:01:10 - 2min => 09:59:10: nothing finalized yet
      input.addData(Event(4, ts(5, 0), 3, "click", 1.0)) // advances watermark to 10:03
      query.processAllAvailable()
      input.addData(Event(5, ts(0, 50), 9, "click", 99.0)) // LATE: before watermark
      input.addData(Event(6, ts(9, 0), 3, "click", 1.0))   // advances further
      query.processAllAvailable()
      val rows = spark.table("windowed")
        .orderBy("window_start", "event_type").collect()
      val clicks = rows.filter(_.getAs[String]("event_type") == "click")
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[Long]("n_events"))).toSeq
      assert(clicks.contains((ts(0), 2L)))       // late event 5 NOT counted
      assert(rows.exists(r => r.getAs[String]("event_type") == "view" &&
        r.getAs[Long]("n_events") == 1L))
    } finally query.stop()
  }

  test("gap sessionization closes sessions on event-time silence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 30s apart (one session), then silence
      input.addData(
        Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 30), 1, "view", 2.0))
      query.processAllAvailable()
      // user 1 again after a 5-minute gap: closes the first session in-batch
      // or via timeout once the watermark passes
      input.addData(Event(3, ts(5, 0), 1, "click", 3.0))
      query.processAllAvailable()
      input.addData(Event(4, ts(20, 0), 2, "click", 1.0)) // push watermark far out
      query.processAllAvailable()
      val sessions = spark.table("sessions")
        .filter($"user_id" === 1).orderBy("session_start").collect()
      assert(sessions.nonEmpty)
      val first = sessions.head
      assert(first.getAs[Long]("n_events") == 2L)
      assert(first.getAs[Double]("total_value") == 3.0)
      assert(first.getAs[Timestamp]("session_end") == ts(0, 30))
    } finally query.stop()
  }

  test("session emitted via the timeout branch equals the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 gets NO events after their session, so the session can only
    // close through the state-timeout branch (state.hasTimedOut) once
    // user 2's event advances the watermark past lastSeen + gap.
    val user1 = Seq(
      Event(1, ts(0, 0), 1, "click", 1.0),
      Event(2, ts(0, 45), 1, "view", 2.5))
    val pusher = Event(9, ts(30, 0), 2, "click", 0.5)
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("timeout_sessions")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      input.addData(user1: _*)
      query.processAllAvailable()
      // nothing emitted yet: no gap-jump and the watermark hasn't moved
      assert(spark.table("timeout_sessions").isEmpty)
      input.addData(pusher)
      query.processAllAvailable()
      spark.table("timeout_sessions").filter($"user_id" === 1).collect()
    } finally query.stop()
    assert(streamed.length == 1, "session must be emitted by the timeout path")
    // oracle: the batch operator over the same events
    val batch = EventStreams.sessionizeBatch((user1 :+ pusher).toDF(), 60)
      .filter($"user_id" === 1).collect()
    assert(batch.length == 1)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))
    assert(key(streamed.head) == key(batch.head))
  }

  test("dedupStream drops in-watermark duplicate ids, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.dedupStream(input.toDF(), "event_id", "2 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 10), 2, "view", 2.0),
        Event(1, ts(0, 5), 1, "click", 1.0)) // duplicate id in-batch
      query.processAllAvailable()
      input.addData(Event(1, ts(0, 20), 1, "click", 1.0)) // dup, later batch
      input.addData(Event(3, ts(9, 0), 3, "click", 3.0))  // watermark forward
      query.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) == 1, s"id 1 emitted once, got $ids")
      assert(ids.toSet == Set(1L, 2L, 3L))
    } finally query.stop()
  }

  test("propsRollup runs on a stream (map-only parse + streaming agg)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double, String)]
    val query = EventStreams.propsRollup(
        input.toDF().toDF("event_id", "ts", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("props_rollup")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        (1L, ts(0, 0), "click", 1.5, """{"k": 4}"""),
        (2L, ts(0, 10), "click", 2.5, """{"k": 6}"""),
        (3L, ts(0, 20), "view", 1.0, "oops"))
      query.processAllAvailable()
      val rows = spark.table("props_rollup").orderBy("event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("sum_k") == 10L &&
        rows(0).getAs[Double]("avg_k") == 5.0)
      assert(rows(1).getAs[Long]("n_with_k") == 0L)
    } finally query.stop()
  }

  test("map-only text ops (line quality, PII, chunking) run unchanged on a stream") {
    // the stateless curation stages are plain projections, so the SAME
    // operator code composes with readStream — no batch/stream fork
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cleaned = graft.ops.TextOps.filterLines(
      graft.ops.TextOps.redactPii(
        input.toDF().toDF("id", "text"), "text"),
      "redacted", minWords = 2)
    val query = cleaned.writeStream.format("memory").queryName("stream_clean")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, "Contact bob@example.com for details.\nok\nA second good line here."),
        (2L, "no terminal punctuation on this line"))
      query.processAllAvailable()
      val rows = spark.table("stream_clean").orderBy("id").collect()
      assert(rows.length == 2)
      val d1 = rows.head
      assert(d1.getAs[Int]("n_emails") == 1)
      assert(d1.getAs[String]("clean_text") ==
        "Contact <EMAIL> for details.\nA second good line here.")
      assert(rows(1).getAs[Long]("n_kept") == 0L)
    } finally query.stop()
  }

  test("batch sessionization matches the streaming operator's semantics") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0, 0), 1, "click", 1.0),
      Event(2, ts(0, 30), 1, "view", 2.0),
      Event(3, ts(5, 0), 1, "click", 3.0),  // > 60s gap ⇒ new session
      Event(4, ts(0, 10), 2, "click", 4.0)
    ).toDF()
    val out = EventStreams.sessionizeBatch(events, gapSeconds = 60)
      .orderBy("user_id", "session_start").collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
      r.getAs[Double]("total_value"), r.getAs[Timestamp]("session_end"))).toSeq ==
      Seq((1L, 2L, 3.0, ts(0, 30)), (1L, 1L, 3.0, ts(5, 0)), (2L, 1L, 4.0, ts(0, 10))))
  }

  test("funnel matches ordered completions greedily and stops at the first missing step") {
    import spark.implicits._
    val events = Seq(
      // user 1 completes: signup@0 → click@1 → purchase@2 (the extra
      // early purchase@0:30 must NOT match — it precedes the click)
      Event(1, ts(0, 0), 1, "signup", 0.0),
      Event(2, ts(0, 30), 1, "purchase", 0.0),
      Event(3, ts(1, 0), 1, "click", 0.0),
      Event(4, ts(2, 0), 1, "purchase", 0.0),
      // user 2 stops at signup (its click is simultaneous — strictly
      // AFTER is required, so it does not count)
      Event(5, ts(3, 0), 2, "signup", 0.0),
      Event(6, ts(3, 0), 2, "click", 0.0),
      // user 3 never signs up → absent from the output entirely
      Event(7, ts(4, 0), 3, "click", 0.0)
    ).toDF()
    val got = EventStreams.funnel(events, "user_id",
        Seq("signup", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime),
        Option(r.getTimestamp(2)).map(_.getTime),
        Option(r.getTimestamp(3)).map(_.getTime),
        r.getInt(4))).toSeq
    assert(got == Seq(
      (1L, Some(ts(0, 0).getTime), Some(ts(1, 0).getTime),
        Some(ts(2, 0).getTime), 3),
      (2L, Some(ts(3, 0).getTime), None, None, 1)))
  }

  test("funnel with repeated step types requires strictly increasing matches") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0, 0), 1, "click", 0.0),
      Event(2, ts(1, 0), 1, "click", 0.0),
      Event(3, ts(0, 0), 2, "click", 0.0) // only one click → depth 1
    ).toDF()
    val got = EventStreams.funnel(events, "user_id", Seq("click", "click"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getInt(3))).toSeq
    assert(got == Seq((1L, 2), (2L, 1)))
  }

  test("sessionizeNative equals sessionizeBatch, including the exact-gap tie") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0, 0), 1, "click", 1.0),
      Event(2, ts(1, 0), 1, "view", 2.0),   // EXACTLY 60s after: continues in both
      Event(3, ts(2, 1), 1, "click", 3.0),  // 61s after: breaks in both
      Event(4, ts(0, 10), 2, "click", 4.0)
    ).toDF()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3), r.getDouble(4))).toSeq.sorted
    val batch = rows(EventStreams.sessionizeBatch(events, gapSeconds = 60))
    val native = rows(EventStreams.sessionizeNative(events, gapSeconds = 60))
    assert(batch == Seq(
      (1L, ts(0, 0).getTime, ts(1, 0).getTime, 2L, 3.0),
      (1L, ts(2, 1).getTime, ts(2, 1).getTime, 1L, 3.0),
      (2L, ts(0, 10).getTime, ts(0, 10).getTime, 1L, 4.0)))
    assert(native == batch)
  }

  // interval-join fixture: errors (anchors) and clicks (matches) with
  // boundary hits on BOTH inclusive ends, a same-user out-of-horizon
  // click, a wrong-user in-horizon click, and a matchless anchor
  private val ijErrors = Seq(
    Event(100, ts(2, 0), 1, "error", 0.0),   // horizon [10:01:00, 10:02:00]
    Event(101, ts(9, 0), 1, "error", 0.0),   // matches nothing (click at 10:02:30 too old)
    Event(102, ts(3, 0), 2, "error", 0.0))   // user 2
  private val ijClicks = Seq(
    Event(200, ts(1, 0), 1, "click", 1.0),   // exactly horizon start: matches 100
    Event(201, ts(2, 0), 1, "click", 2.0),   // exactly anchor ts: matches 100
    Event(202, ts(0, 59), 1, "click", 4.0),  // 1s before horizon: no match
    Event(203, ts(2, 30), 1, "click", 8.0),  // after 100, >60s before 101: no match
    Event(204, ts(2, 30), 2, "click", 16.0)) // user 2: matches 102 only

  private def ijRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("anchor_id", "user_id", "match_ts", "match_value")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Timestamp]("match_ts").getTime, r.getDouble(3))).toSeq.sorted

  test("intervalJoinBatch matches on the closed horizon per key") {
    import spark.implicits._
    val got = ijRows(EventStreams.intervalJoinBatch(
      ijErrors.toDF(), ijClicks.toDF(), "user_id", horizonSeconds = 60))
    assert(got == Seq(
      (100L, 1L, ts(1, 0).getTime, 1.0),
      (100L, 1L, ts(2, 0).getTime, 2.0),
      (102L, 2L, ts(2, 30).getTime, 16.0)))
  }

  test("intervalJoinBatch how=left keeps matchless anchors with null match fields") {
    import spark.implicits._
    val got = EventStreams.intervalJoinBatch(
        ijErrors.toDF(), ijClicks.toDF(), "user_id", horizonSeconds = 60,
        how = "left")
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(3)).map(_.getTime), // null for matchless
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq.sortBy(r => (r._1, r._2))
    assert(got == Seq(
      (100L, Some(ts(1, 0).getTime), Some(1.0)),
      (100L, Some(ts(2, 0).getTime), Some(2.0)),
      (101L, None, None), // matchless anchor survives with nulls
      (102L, Some(ts(2, 30).getTime), Some(16.0))))
  }

  test("intervalJoinBatch how=left survives duplicate anchor ids (anti-join keys on full identity)") {
    import spark.implicits._
    // two anchors SHARE event_id 100: user 1's has a match, user 2's has
    // none — an id-only anti-join would drop user 2's row entirely
    val anchors = Seq(
      Event(100, ts(2, 0), 1, "error", 0.0),
      Event(100, ts(2, 0), 2, "error", 0.0))
    val clicks = Seq(Event(200, ts(1, 30), 1, "click", 7.0))
    val got = EventStreams.intervalJoinBatch(
        anchors.toDF(), clicks.toDF(), "user_id", horizonSeconds = 60,
        how = "left")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq.sortBy(_._2)
    assert(got == Seq(
      (100L, 1L, Some(7.0)),
      (100L, 2L, None))) // the colliding matchless anchor still surfaces
  }

  test("stream-stream interval join how=left flushes matchless anchors once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val query = EventStreams.intervalJoinStream(errs.toDF(), clicks.toDF(),
        "user_id", horizonSeconds = 60, how = "left")
      .writeStream.format("memory").queryName("ijl")
      .outputMode(OutputMode.Append).start()
    try {
      errs.addData(ijErrors: _*)
      clicks.addData(ijClicks: _*)
      query.processAllAvailable()
      // watermark-advancing events on a key no fixture anchor holds: the
      // GLOBAL watermark is the min across both inputs, so BOTH sides
      // must advance; the second round triggers the follow-up batch that
      // emits the expired outer rows. The dummy anchor (900) never
      // flushes itself (the watermark stops short of it) — excluded.
      errs.addData(Event(900, ts(30, 0), 99, "error", 0.0))
      clicks.addData(Event(901, ts(30, 0), 99, "click", 0.0))
      query.processAllAvailable()
      errs.addData(Event(902, ts(40, 0), 99, "error", 0.0))
      clicks.addData(Event(903, ts(40, 0), 99, "click", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("ijl").filter("anchor_id < 900").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.getTime),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
        .sortBy(r => (r._1, r._2))
      val batch = EventStreams.intervalJoinBatch(
          ijErrors.toDF(), ijClicks.toDF(), "user_id", horizonSeconds = 60,
          how = "left")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.getTime),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toSeq
        .sortBy(r => (r._1, r._2))
      assert(streamed == batch)
    } finally query.stop()
  }

  test("funnelStream equals the batch funnel on a shared fixture, incl. watermark-flushed partials") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "click", "purchase")
    // user 1 completes across two micro-batches; user 2 stays partial
    // (signup only — flushes via the timeout path); user 3 never reaches
    // step 1 (absent from BOTH outputs); the early purchase@0:30 must not
    // match (precedes the click). Pushers (type outside the funnel, user
    // 99) advance the watermark without creating output rows.
    val batch1 = Seq(
      Event(1, ts(0, 0), 1, "signup", 0.0),
      Event(2, ts(0, 30), 1, "purchase", 0.0),
      Event(3, ts(1, 0), 1, "click", 0.0),
      Event(4, ts(0, 30), 2, "signup", 0.0),
      Event(5, ts(0, 45), 3, "click", 0.0))
    val batch2 = Seq(Event(6, ts(2, 0), 1, "purchase", 0.0))
    val pushers = Seq(Event(900, ts(10, 0), 99, "noop", 0.0),
      Event(901, ts(20, 0), 99, "noop", 0.0))
    val input = MemoryStream[Event]
    val query = EventStreams.funnelStream(input.toDS(), steps,
        timeoutSeconds = 300, watermark = "2 minutes")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      // completion emits IMMEDIATELY — before any watermark movement
      assert(spark.table("funnel_stream").count() == 1)
      // two pusher rounds: the first advances the watermark past user
      // 2's lastSeen+timeout, the second runs the batch that fires it
      pushers.foreach { p => input.addData(p); query.processAllAvailable() }
      spark.table("funnel_stream")
    } finally query.stop()
    val all = (batch1 ++ batch2 ++ pushers).toDF()
    val batch = EventStreams.funnel(all, "user_id", steps)
    assert(streamed.schema == batch.schema)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime),
        Option(r.getTimestamp(2)).map(_.getTime),
        Option(r.getTimestamp(3)).map(_.getTime),
        r.getInt(4))).toSeq.sortBy(_._1)
    assert(rows(streamed) == rows(batch))
    assert(rows(streamed) == Seq(
      (1L, Some(ts(0, 0).getTime), Some(ts(1, 0).getTime),
        Some(ts(2, 0).getTime), 3),
      (2L, Some(ts(0, 30).getTime), None, None, 1)))
  }

  test("strict funnelStream buffers to the watermark: exact under cross-batch disorder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // steps [signup, click]; the click arrives FIRST, the earlier signup
    // one micro-batch later — legal within-watermark disorder. The eager
    // mode processes arrival order and can only reach depth 1; strict
    // drains in exact time order once the watermark passes, matching the
    // batch operator's depth-2 completion.
    val b1 = Seq(Event(1, ts(2, 0), 1, "click", 0.0))
    val b2 = Seq(Event(2, ts(1, 0), 1, "signup", 0.0))
    val pushers = Seq(Event(900, ts(30, 0), 99, "noop", 0.0),
      Event(901, ts(40, 0), 99, "noop", 0.0))
    def runMode(strict: Boolean, name: String) = {
      val input = MemoryStream[Event]
      val query = EventStreams.funnelStream(input.toDS(), Seq("signup", "click"),
          timeoutSeconds = 300, watermark = "5 minutes", strict = strict)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(b1: _*); query.processAllAvailable()
        input.addData(b2: _*); query.processAllAvailable()
        pushers.foreach { p => input.addData(p); query.processAllAvailable() }
        spark.table(name).collect().map(r => (r.getLong(0),
          Option(r.getTimestamp(1)).map(_.getTime),
          Option(r.getTimestamp(2)).map(_.getTime),
          r.getInt(3))).toSeq.sortBy(_._1)
      } finally query.stop()
    }
    val strictRows = runMode(strict = true, "funnel_strict")
    val batch = EventStreams.funnel((b1 ++ b2 ++ pushers).toDF(),
        "user_id", Seq("signup", "click"))
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime),
        Option(r.getTimestamp(2)).map(_.getTime),
        r.getInt(3))).toSeq.sortBy(_._1)
    assert(strictRows == batch)
    assert(strictRows == Seq((1L, Some(ts(1, 0).getTime),
      Some(ts(2, 0).getTime), 2)))
    // the eager mode's documented limitation on the same fixture
    assert(runMode(strict = false, "funnel_eager") ==
      Seq((1L, Some(ts(1, 0).getTime), None, 1)))
  }

  test("both sessionize strategies return the INPUT's ts flavor (NTZ schema parity)") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0, 0), 1, "click", 1.0),
      Event(2, ts(5, 0), 1, "view", 2.0),
      Event(3, ts(0, 10), 2, "click", 4.0)
    ).toDF().withColumn("ts",
      org.apache.spark.sql.functions.col("ts")
        .cast(org.apache.spark.sql.types.TimestampNTZType))
    val batch = EventStreams.sessionizeBatch(events, gapSeconds = 60)
    val native = EventStreams.sessionizeNative(events, gapSeconds = 60)
    assert(batch.schema == native.schema,
      s"strategy switch changed the schema: ${batch.schema} vs ${native.schema}")
    assert(batch.schema("session_start").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(rows(batch) == rows(native))
  }

  test("eventsFrame floors a negative-epoch long-nanos ts like the timestamp branch") {
    import spark.implicits._
    val dirL = java.nio.file.Files.createTempDirectory("graft_ev_nanos").toString
    val dirT = java.nio.file.Files.createTempDirectory("graft_ev_ts").toString
    // -1.5 s in nanos: floor → -2 s; `div` (toward zero) would give -1 s
    Seq((1L, -1500000000L, 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dirL/events.parquet")
    Seq((1L, new Timestamp(-1500L), 1L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dirT/events.parquet")
    val fromNanos = EventStreams.eventsFrame(spark, dirL)
      .select("ts").head().getTimestamp(0)
    val fromTs = EventStreams.eventsFrame(spark, dirT)
      .select("ts").head().getTimestamp(0)
    assert(fromNanos == new Timestamp(-2000L))
    assert(fromNanos == fromTs)
  }

  test("stream-stream interval join equals the batch twin on the shared fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val query = EventStreams.intervalJoinStream(errs.toDF(), clicks.toDF(),
        "user_id", horizonSeconds = 60)
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches with interleaved arrival: the join must buffer
      // each side's state and still produce the full batch-equal result
      errs.addData(ijErrors.take(1): _*)
      clicks.addData(ijClicks.take(3): _*)
      query.processAllAvailable()
      errs.addData(ijErrors.drop(1): _*)
      clicks.addData(ijClicks.drop(3): _*)
      query.processAllAvailable()
      val streamed = ijRows(spark.table("ij"))
      val batch = ijRows(EventStreams.intervalJoinBatch(
        ijErrors.toDF(), ijClicks.toDF(), "user_id", horizonSeconds = 60))
      assert(streamed == batch)
    } finally query.stop()
  }

  test("retentionStream refreshes the exact batch triangle as periods finalize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // minute-sized periods: user 1 active in periods 0, 1 and 3; user 2
    // cohorts in period 1; user 3 active only in period 0. Pusher A
    // (user 99, period 6) finalizes the fixture's periods; pusher B
    // (period 9) finalizes pusher A's own pair — the last triangle must
    // then equal the batch operator over fixture + pusher A exactly.
    val fixture = Seq(
      Event(1, ts(0, 10), 1, "click", 0.0), Event(2, ts(0, 40), 1, "view", 0.0),
      Event(3, ts(1, 10), 1, "click", 0.0),
      Event(4, ts(3, 20), 1, "click", 0.0),
      Event(5, ts(1, 30), 2, "click", 0.0),
      Event(6, ts(0, 50), 3, "view", 0.0))
    val pusherA = Event(900, ts(6, 10), 99, "click", 0.0)
    val pusherB = Event(901, ts(9, 30), 99, "click", 0.0)
    val triangles = scala.collection.mutable.ListBuffer[
      (Long, Seq[(Long, Long, Long)])]()
    def drain(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
      triangles += epoch -> df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val input = MemoryStream[Event]
    val query = EventStreams.retentionStream(input.toDF(),
        periodSeconds = 60L, maxOffset = 7, watermark = "2 minutes")(drain)
      .start()
    try {
      input.addData(fixture: _*)
      query.processAllAvailable()
      input.addData(pusherA); query.processAllAvailable()
      input.addData(pusherB); query.processAllAvailable()
    } finally query.stop()
    assert(triangles.nonEmpty)
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    val streamedLast = triangles.last._2.sortBy(t => (t._1, t._2))
    val batch = cells(EventStreams.retention(
      (fixture :+ pusherA).toDF(), periodSeconds = 60L, maxOffset = 7))
    assert(streamedLast == batch,
      s"streamed $streamedLast != batch $batch")
    // the refresh property: an EARLIER triangle (before pusher A's pair
    // finalized) is the batch operator over the fixture alone
    val earlier = triangles.init.lastOption.map(_._2.sortBy(t => (t._1, t._2)))
    val batchFixture = cells(EventStreams.retention(
      fixture.toDF(), periodSeconds = 60L, maxOffset = 7))
    earlier.foreach(tr => assert(tr == batchFixture,
      s"pre-pusher triangle $tr != batch-over-fixture $batchFixture"))
    // duplicate-delivery idempotence: re-folding the SAME pairs changes
    // nothing (the mask OR absorbs replays by construction) — pinned by
    // the final triangle equaling the batch run despite every period
    // having been re-merged from state across three epochs
  }

  test("rateAnomalyStream equals the batch scorer, incl. the empty-window spine") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // clicks every minute w0..w3 (flat 2,2,2 then a jump to 8 — the
    // zero-variance flatJump anomaly); views only in w0 and w3, so the
    // SPINE must supply view zeros at w1/w2 — the silent-window case the
    // streaming twin exists to keep watching. Pushers are ordinary
    // clicks far ahead: each advances the watermark (2 min delay), and
    // the second finalizes the first pusher's own window, exercising the
    // multi-epoch horizon slice (its epoch emits only the w4.. rows).
    val fixture = Seq(
      Event(1, ts(0, 10), 1, "click", 0.0), Event(2, ts(0, 40), 2, "click", 0.0),
      Event(3, ts(1, 10), 1, "click", 0.0), Event(4, ts(1, 40), 2, "click", 0.0),
      Event(5, ts(2, 10), 1, "click", 0.0), Event(6, ts(2, 40), 2, "click", 0.0),
      Event(7, ts(3, 0), 1, "click", 0.0), Event(8, ts(3, 10), 2, "click", 0.0),
      Event(9, ts(3, 20), 3, "click", 0.0), Event(10, ts(3, 30), 4, "click", 0.0),
      Event(11, ts(3, 40), 5, "click", 0.0), Event(12, ts(3, 45), 6, "click", 0.0),
      Event(13, ts(3, 50), 7, "click", 0.0), Event(14, ts(3, 55), 8, "click", 0.0),
      Event(20, ts(0, 20), 1, "view", 0.0),
      Event(21, ts(3, 20), 1, "view", 0.0))
    val pusherA = Event(900, ts(6, 10), 99, "click", 0.0)
    val pusherB = Event(901, ts(9, 30), 99, "click", 0.0)
    // pusher C's epoch scores AFTER the bounded-state prune first
    // engages (pusher B's epoch prunes w0..w2 away, trailing=2): its
    // fresh rows — including the silent-type view spine at w7/w8 —
    // must still equal the batch twin computed over the FULL history
    val pusherC = Event(902, ts(12, 30), 99, "click", 0.0)
    val emitted = scala.collection.mutable.ListBuffer[
      (java.sql.Timestamp, String, Long, Option[Double], Option[Double], Boolean)]()
    def drain(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
      emitted ++= df.collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
    val input = MemoryStream[Event]
    val query = EventStreams.rateAnomalyStream(input.toDF(),
        windowLength = "1 minute", trailing = 2, zThreshold = 1.5,
        watermark = "2 minutes")(drain).start()
    try {
      input.addData(fixture: _*)
      query.processAllAvailable()
      input.addData(pusherA); query.processAllAvailable()
      input.addData(pusherB); query.processAllAvailable()
      input.addData(pusherC); query.processAllAvailable()
    } finally query.stop()
    val streamed = emitted.toSeq.sortBy(r => (r._1.getTime, r._2))
    assert(streamed.nonEmpty)
    val hi = streamed.map(_._1.getTime).max
    // batch twin over the identical input, restricted to the windows the
    // stream could finalize (append mode's tail caveat)
    val batch = EventStreams.rateAnomaly((fixture :+ pusherA :+ pusherB :+ pusherC).toDF(),
        windowLength = "1 minute", trailing = 2, zThreshold = 1.5)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
      .toSeq.filter(_._1.getTime <= hi).sortBy(r => (r._1.getTime, r._2))
    assert(streamed == batch)
    // the spine rows the stream must have invented: silent view windows
    // (w1 has only one trailing window → null stats; w2 has both)
    assert(streamed.contains((ts(1, 0), "view", 0L, None, None, false)))
    assert(streamed.contains((ts(2, 0), "view", 0L, Some(0.5), Some(-0.7071), false)))
    // the flat-jump anomaly on clicks at w3 (trailing variance 0, count moved)
    val w3click = streamed.find(r => r._2 == "click" && r._1 == ts(3, 0)).get
    assert(w3click._3 == 8L && w3click._6, s"flat-jump anomaly expected: $w3click")
    // multi-epoch horizon: pusher A's own window (w6) arrived in a LATER
    // epoch than w0..w3 and still scored exactly once
    assert(streamed.count(r => r._1 == ts(6, 0) && r._2 == "click") == 1)
    // post-prune exactness: pusher C's epoch ran against the PRUNED
    // state (w0..w2 dropped after pusher B's epoch) and its rows —
    // silent-type view spine at w7/w8 included — are in the
    // batch-equality above; pin their presence explicitly
    assert(streamed.contains((ts(7, 0), "view", 0L, Some(0.0), None, false)) ||
      streamed.exists(r => r._1 == ts(7, 0) && r._2 == "view" && r._3 == 0L),
      s"view spine row at w7 missing after prune: ${streamed.filter(_._1 == ts(7, 0))}")
    assert(streamed.count(r => r._1 == ts(9, 0) && r._2 == "click") == 1)
  }

  test("retentionStream: cohorts settle at first arrival across an adversarial epoch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1's periods 0, 2, 5 finalize in THREE separate epochs (each
    // pusher advances the watermark just far enough); user 2 cohorts in
    // period 1. The property under test: once a user's FIRST period
    // finalizes, their cohort is settled — every later triangle keeps
    // them in that cohort (later periods fold in as offsets; no
    // cohort-2 or cohort-5 rows ever appear for user 1). This is the
    // exactness argument's load-bearing Spark behavior (append-mode
    // windows finalize in window-end order): if a future Spark version
    // finalized out of order, the mid-stream cohort sets below would
    // churn and this test would fail.
    val triangles = scala.collection.mutable.ListBuffer[Seq[(Long, Long, Long)]]()
    def drain(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
      triangles += df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val input = MemoryStream[Event]
    val query = EventStreams.retentionStream(input.toDF(),
        periodSeconds = 60L, maxOffset = 7, watermark = "2 minutes")(drain)
      .start()
    // cohorts are ABSOLUTE periods (floor(epoch/60)); p0 is the
    // fixture's minute-0 period. The fixture's cohorts are exactly p0
    // (user 1) and p0+1 (user 2); pusher user 99 cohorts at p0+4 with
    // its own offsets — sliced away so the asserted sets stay the
    // fixture's own cells
    val p0 = ts(0, 0).getTime / 60000L
    def fixtureCells(t: Seq[(Long, Long, Long)]) =
      t.filter(c => c._1 == p0 || c._1 == p0 + 1)
        .map(c => (c._1 - p0, c._2, c._3)).toSet
    try {
      input.addData(Event(1, ts(0, 10), 1, "click", 0.0),
        Event(2, ts(1, 20), 2, "view", 0.0),
        Event(900, ts(4, 10), 99, "click", 0.0)) // watermark → min 2
      query.processAllAvailable()
      assert(fixtureCells(triangles.last) ==
        Set((0L, 0L, 1L), (1L, 0L, 1L)),
        s"after epoch A: ${triangles.last}")
      // user 1's period 2 arrives in a LATER epoch than their cohort
      input.addData(Event(3, ts(2, 30), 1, "click", 0.0),
        Event(901, ts(6, 10), 99, "click", 0.0)) // watermark → min 4
      query.processAllAvailable()
      assert(fixtureCells(triangles.last) ==
        Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)),
        s"after epoch B: ${triangles.last}")
      // and period 5 in a third epoch — cohort STILL 0, offset 5 folds in
      input.addData(Event(4, ts(5, 30), 1, "click", 0.0),
        Event(902, ts(8, 10), 99, "click", 0.0)) // watermark → min 6
      query.processAllAvailable()
      assert(fixtureCells(triangles.last) ==
        Set((0L, 0L, 1L), (0L, 2L, 1L), (0L, 5L, 1L), (1L, 0L, 1L)),
        s"after epoch C: ${triangles.last}")
    } finally query.stop()
    // and the settled triangles agree with the batch operator
    val batch = EventStreams.retention(Seq(
        Event(1, ts(0, 10), 1, "click", 0.0),
        Event(2, ts(1, 20), 2, "view", 0.0),
        Event(3, ts(2, 30), 1, "click", 0.0),
        Event(4, ts(5, 30), 1, "click", 0.0)).toDF(),
      periodSeconds = 60L, maxOffset = 7)
      .collect().map(r => (r.getLong(0) - p0, r.getLong(1), r.getLong(2))).toSet
    assert(fixtureCells(triangles.last.toSeq) == batch)
  }

  test("streaming twins fail fast on restart from an existing checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the driver-held accumulator dies with the process while the
    // watermark aggregation's state store survives in the checkpoint —
    // a resumed run would silently score/refold against an empty
    // history, so attaching a fresh sink to a progressed checkpoint
    // must throw, not diverge
    val cp = java.nio.file.Files.createTempDirectory("rate_restart").toString
    val input = MemoryStream[Event]
    val sink1 = (df: org.apache.spark.sql.DataFrame, e: Long) => { df.count(); () }
    val q1 = EventStreams.rateAnomalyStream(input.toDF(),
        windowLength = "1 minute", trailing = 2, watermark = "2 minutes")(sink1)
      .option("checkpointLocation", cp)
      .start()
    try {
      input.addData(Event(1, ts(0, 10), 1, "click", 0.0),
        Event(900, ts(6, 10), 99, "click", 0.0))
      q1.processAllAvailable()
      input.addData(Event(901, ts(9, 10), 99, "click", 0.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // "restart": a NEW writer (fresh accumulator vars) on the SAME
    // checkpoint — its first observed epoch is > 0
    val q2 = EventStreams.rateAnomalyStream(input.toDF(),
        windowLength = "1 minute", trailing = 2, watermark = "2 minutes")(sink1)
      .option("checkpointLocation", cp)
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      input.addData(Event(902, ts(12, 10), 99, "click", 0.0))
      q2.processAllAvailable()
    }
    try assert(e.getMessage.contains("cannot resume from an existing checkpoint"),
      e.getMessage)
    finally q2.stop()

    val cpR = java.nio.file.Files.createTempDirectory("ret_restart").toString
    val input2 = MemoryStream[Event]
    val r1 = EventStreams.retentionStream(input2.toDF(),
        periodSeconds = 60L, maxOffset = 7, watermark = "2 minutes")(sink1)
      .option("checkpointLocation", cpR)
      .start()
    try {
      input2.addData(Event(1, ts(0, 10), 1, "click", 0.0),
        Event(900, ts(6, 10), 99, "click", 0.0))
      r1.processAllAvailable()
    } finally r1.stop()
    val r2 = EventStreams.retentionStream(input2.toDF(),
        periodSeconds = 60L, maxOffset = 7, watermark = "2 minutes")(sink1)
      .option("checkpointLocation", cpR)
      .start()
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      input2.addData(Event(901, ts(9, 10), 99, "click", 0.0))
      r2.processAllAvailable()
    }
    try assert(e2.getMessage.contains("cannot resume from an existing checkpoint"),
      e2.getMessage)
    finally r2.stop()
  }

  test("rateAnomalyStream resumes exactly from a persisted accumulator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the stream≡batch fixture, split across a PROCESS RESTART: run 1
    // finalizes w0..w3 (+ the view spine), run 2 attaches a brand-new
    // writer (fresh accumulator vars) to the same checkpoint + state
    // dir and must keep scoring against the FULL history — including
    // the bounded-state prune engaging post-restart (pusher B's epoch
    // prunes w0..w2 off the RESTORED state, pusher C scores after it).
    val fixture = Seq(
      Event(1, ts(0, 10), 1, "click", 0.0), Event(2, ts(0, 40), 2, "click", 0.0),
      Event(3, ts(1, 10), 1, "click", 0.0), Event(4, ts(1, 40), 2, "click", 0.0),
      Event(5, ts(2, 10), 1, "click", 0.0), Event(6, ts(2, 40), 2, "click", 0.0),
      Event(7, ts(3, 0), 1, "click", 0.0), Event(8, ts(3, 10), 2, "click", 0.0),
      Event(9, ts(3, 20), 3, "click", 0.0), Event(10, ts(3, 30), 4, "click", 0.0),
      Event(11, ts(3, 40), 5, "click", 0.0), Event(12, ts(3, 45), 6, "click", 0.0),
      Event(13, ts(3, 50), 7, "click", 0.0), Event(14, ts(3, 55), 8, "click", 0.0),
      Event(20, ts(0, 20), 1, "view", 0.0),
      Event(21, ts(3, 20), 1, "view", 0.0))
    val pusherA = Event(900, ts(6, 10), 99, "click", 0.0)
    val pusherB = Event(901, ts(9, 30), 99, "click", 0.0)
    val pusherC = Event(902, ts(12, 30), 99, "click", 0.0)
    val cp = java.nio.file.Files.createTempDirectory("rate_resume_cp").toString
    val sd = java.nio.file.Files.createTempDirectory("rate_resume_state").toString
    val emitted = scala.collection.mutable.ListBuffer[
      (Timestamp, String, Long, Option[Double], Option[Double], Boolean)]()
    def drain(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
      emitted ++= df.collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
    def writer(input: MemoryStream[Event]) =
      EventStreams.rateAnomalyStream(input.toDF(), windowLength = "1 minute",
          trailing = 2, zThreshold = 1.5, watermark = "2 minutes",
          stateDir = Some(sd))(drain)
        .option("checkpointLocation", cp)
    val input = MemoryStream[Event]
    val q1 = writer(input).start()
    try {
      input.addData(fixture: _*); q1.processAllAvailable()
      input.addData(pusherA); q1.processAllAvailable()
    } finally q1.stop()
    val beforeRestart = emitted.size
    assert(beforeRestart > 0, "run 1 finalized nothing — fixture broken")
    val q2 = writer(input).start()
    try {
      input.addData(pusherB); q2.processAllAvailable()
      input.addData(pusherC); q2.processAllAvailable()
    } finally q2.stop()
    assert(emitted.size > beforeRestart, "run 2 emitted nothing after resume")
    val streamed = emitted.toSeq.sortBy(r => (r._1.getTime, r._2))
    val hi = streamed.map(_._1.getTime).max
    val batch = EventStreams.rateAnomaly(
        (fixture :+ pusherA :+ pusherB :+ pusherC).toDF(),
        windowLength = "1 minute", trailing = 2, zThreshold = 1.5)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5)))
      .toSeq.filter(_._1.getTime <= hi).sortBy(r => (r._1.getTime, r._2))
    assert(streamed == batch,
      s"resumed stream diverged from batch:\n$streamed\nvs\n$batch")
    // the post-restart epochs really scored against restored history:
    // pusher A's window (w6, finalized in run 2) has trailing stats that
    // need w4/w5 spine rows derived from run-1 state, and no duplicates
    assert(streamed.count(r => r._1 == ts(6, 0) && r._2 == "click") == 1)
    assert(streamed.count(r => r._1 == ts(9, 0) && r._2 == "click") == 1)
  }

  test("retentionStream resumes exactly from a persisted accumulator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // run 1 folds the fixture cohorts; an empty-output epoch (an event
    // inside pusher A's still-open period) exercises the manifest-only
    // epoch bump; run 2 attaches fresh vars to the same checkpoint +
    // state dir — the resume's epoch cross-check passes BECAUSE of the
    // bump, and the final triangle equals the batch operator over
    // everything that finalized.
    val fixture = Seq(
      Event(1, ts(0, 10), 1, "click", 0.0), Event(2, ts(0, 40), 1, "view", 0.0),
      Event(3, ts(1, 10), 1, "click", 0.0),
      Event(4, ts(3, 20), 1, "click", 0.0),
      Event(5, ts(1, 30), 2, "click", 0.0),
      Event(6, ts(0, 50), 3, "view", 0.0))
    val pusherA = Event(900, ts(6, 10), 99, "click", 0.0)
    val quiet = Event(950, ts(6, 20), 99, "click", 0.0) // same period, no finalize
    val pusherB = Event(901, ts(9, 30), 99, "click", 0.0)
    val cp = java.nio.file.Files.createTempDirectory("ret_resume_cp").toString
    val sd = java.nio.file.Files.createTempDirectory("ret_resume_state").toString
    val triangles = scala.collection.mutable.ListBuffer[Seq[(Long, Long, Long)]]()
    def drain(df: org.apache.spark.sql.DataFrame, epoch: Long): Unit =
      triangles += df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def writer(input: MemoryStream[Event]) =
      EventStreams.retentionStream(input.toDF(), periodSeconds = 60L,
          maxOffset = 7, watermark = "2 minutes", stateDir = Some(sd))(drain)
        .option("checkpointLocation", cp)
    val input = MemoryStream[Event]
    val q1 = writer(input).start()
    try {
      input.addData(fixture: _*); q1.processAllAvailable()
      input.addData(pusherA); q1.processAllAvailable()
      input.addData(quiet); q1.processAllAvailable()
    } finally q1.stop()
    assert(triangles.nonEmpty, "run 1 finalized nothing — fixture broken")
    val q2 = writer(input).start()
    try {
      input.addData(pusherB); q2.processAllAvailable()
    } finally q2.stop()
    val streamedLast = triangles.last.sortBy(t => (t._1, t._2))
    // pusher B finalizes pusher A's and quiet's shared period 6 pair —
    // the batch twin covers fixture + both period-6 users' events
    val batch = EventStreams.retention(
        (fixture :+ pusherA :+ quiet).toDF(), periodSeconds = 60L, maxOffset = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(streamedLast == batch,
      s"resumed triangle $streamedLast != batch $batch")
  }

  test("resume fails fast when checkpoint and state dir are not a pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a state dir persisted by some OTHER run (its epoch is far ahead
    // of what this checkpoint replays) must not look like a clean
    // resume — scoring against the wrong accumulator would silently
    // diverge, so the epoch cross-check throws instead
    val cp = java.nio.file.Files.createTempDirectory("pair_cp").toString
    val sd = java.nio.file.Files.createTempDirectory("pair_state").toString
    val sink = (df: org.apache.spark.sql.DataFrame, e: Long) => { df.count(); () }
    val input = MemoryStream[Event]
    val q1 = EventStreams.rateAnomalyStream(input.toDF(),
        windowLength = "1 minute", trailing = 2, watermark = "2 minutes",
        stateDir = Some(sd))(sink)
      .option("checkpointLocation", cp).start()
    try {
      input.addData(Event(1, ts(0, 10), 1, "click", 0.0),
        Event(900, ts(6, 10), 99, "click", 0.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // forge the "other run": jump the snapshot's epoch far ahead
    graft.streaming.StreamState.bumpEpoch(spark, sd,
      "rate_anomaly_stream_state", 99L)
    val q2 = EventStreams.rateAnomalyStream(input.toDF(),
        windowLength = "1 minute", trailing = 2, watermark = "2 minutes",
        stateDir = Some(sd))(sink)
      .option("checkpointLocation", cp).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      input.addData(Event(901, ts(9, 30), 99, "click", 0.0))
      q2.processAllAvailable()
    }
    try assert(e.getMessage.contains("not from the same run"), e.getMessage)
    finally q2.stop()
  }

  test("epoch-partitioned sink: replays overwrite in place, both readers exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamSinks
    // rate twin → disjoint-slices reader: the union of epoch dirs must
    // equal everything the sink was handed, and a simulated replay
    // (re-invoking the sink with an epoch's own settled rows) must
    // leave the directory content IDENTICAL, not doubled
    val outDir = java.nio.file.Files.createTempDirectory("sink_rate").toString
    val handed = scala.collection.mutable.ListBuffer[(Timestamp, String, Long)]()
    val epochs = scala.collection.mutable.ListBuffer[Long]()
    val disk = StreamSinks.epochPartitionedParquet(outDir)
    val sink = (df: org.apache.spark.sql.DataFrame, e: Long) => {
      val rows = df.localCheckpoint() // sink consumes df twice
      handed ++= rows.collect().map(r =>
        (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      epochs += e
      disk(rows, e)
      rows.unpersist(); ()
    }
    val input = MemoryStream[Event]
    val q = EventStreams.rateAnomalyStream(input.toDF(),
        windowLength = "1 minute", trailing = 2, watermark = "2 minutes")(sink)
      .start()
    try {
      input.addData(Event(1, ts(0, 10), 1, "click", 0.0),
        Event(2, ts(1, 20), 2, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(900, ts(6, 10), 99, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(901, ts(9, 30), 99, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(handed.nonEmpty && epochs.nonEmpty)
    def allRows() = StreamSinks.readAllEpochs(spark, outDir)
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1.getTime, t._2, t._3))
    val settled = allRows()
    assert(settled == handed.toSeq.sortBy(t => (t._1.getTime, t._2, t._3)),
      s"disk ${settled.size} rows != handed ${handed.size}")
    // replay: the twins recompute an epoch's rows deterministically, so
    // re-handing the settled rows to the sink is the real replay shape
    // (materialized first — the real path recomputes from the
    // accumulator and never reads its own output dir mid-overwrite)
    val e = epochs.last
    val replayRows = spark.read.parquet(s"$outDir/epoch=$e").localCheckpoint()
    disk(replayRows, e)
    replayRows.unpersist()
    assert(allRows() == settled, "replayed epoch changed the settled content")

    // retention twin → snapshot reader: the latest epoch dir holds the
    // final triangle exactly
    val triDir = java.nio.file.Files.createTempDirectory("sink_tri").toString
    val triangles = scala.collection.mutable.ListBuffer[Seq[(Long, Long, Long)]]()
    val triDisk = StreamSinks.epochPartitionedParquet(triDir)
    val triSink = (df: org.apache.spark.sql.DataFrame, e: Long) => {
      val rows = df.localCheckpoint()
      triangles += rows.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      triDisk(rows, e)
      rows.unpersist(); ()
    }
    val input2 = MemoryStream[Event]
    val q2 = EventStreams.retentionStream(input2.toDF(), periodSeconds = 60L,
        maxOffset = 7, watermark = "2 minutes")(triSink)
      .start()
    try {
      input2.addData(Event(1, ts(0, 10), 1, "click", 0.0),
        Event(2, ts(1, 20), 1, "click", 0.0))
      q2.processAllAvailable()
      input2.addData(Event(900, ts(6, 10), 99, "click", 0.0))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(triangles.nonEmpty)
    val latest = StreamSinks.readLatestEpoch(spark, triDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(latest == triangles.last.sortBy(t => (t._1, t._2)),
      s"latest-epoch dir $latest != final triangle ${triangles.last}")
  }

  test("state-store ops are restart-native: an open session survives a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the twins need StreamState because their accumulators are
    // driver-held; sessionize/funnel/dedupStream keep state in the
    // STATE STORE, which the checkpoint recovers by itself — pin that
    // claim: a session left OPEN by run 1 must absorb run 2's in-gap
    // event and close with counts spanning both processes
    val cp = java.nio.file.Files.createTempDirectory("sess_restart").toString
    // the memory sink cannot recover from a checkpoint; foreachBatch can
    val closed = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Timestamp, Timestamp, Long, Double)]()
    def writer(input: MemoryStream[Event]) =
      EventStreams.sessionize(input.toDS(), gapSeconds = 60)
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EventStreams.Session], _: Long) =>
            b.collect().foreach(s => closed.add((s.user_id, s.session_start,
              s.session_end, s.n_events, s.total_value)))
        }
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Append)
    val input = MemoryStream[Event]
    val q1 = writer(input).start()
    try {
      input.addData(Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 30), 1, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = writer(input).start()
    try {
      input.addData(Event(3, ts(0, 50), 1, "click", 3.0)) // in-gap: same session
      q2.processAllAvailable()
      input.addData(Event(9, ts(30, 0), 2, "click", 0.5)) // pusher closes it
      q2.processAllAvailable()
    } finally q2.stop()
    val s = closed.toArray(Array.empty[(Long, Timestamp, Timestamp, Long, Double)])
      .filter(_._1 == 1L)
    assert(s.length == 1, s"expected one closed session, got ${s.toSeq}")
    assert(s.head._4 == 3L, s"session lost pre-restart events: ${s.head}")
    assert(s.head._2 == ts(0, 0))
    assert(s.head._3 == ts(0, 50))
    assert(s.head._5 == 6.0)
    // stream ≡ batch across the restart: the closed session must equal
    // the batch twin's row for the restart-spanning user exactly (user
    // 2's own session stays OPEN in the stream — batch emits it, append
    // mode cannot; the comparison is per-closed-entity by contract)
    val batchRow = EventStreams.sessionizeBatch(Seq(
        Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 30), 1, "view", 2.0),
        Event(3, ts(0, 50), 1, "click", 3.0),
        Event(9, ts(30, 0), 2, "click", 0.5)).toDF(), gapSeconds = 60)
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSeq
    assert(batchRow == Seq(s.head),
      s"restart-spanning session diverges from batch: $batchRow vs ${s.head}")
  }

  test("funnelStream survives a writer restart: stream ≡ batch across the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the funnel's per-entity state lives in the STATE STORE — resume
    // correctness is Spark's checkpoint recovery, pinned here the same
    // way the retention/rate twins pin theirs: stop the writer with
    // user 1 mid-funnel (depth 2) and user 2 partial, finish both in a
    // SECOND process attached to the same checkpoint, and require the
    // union of emitted rows to equal the batch twin over everything
    val steps = Seq("signup", "click", "purchase")
    val cp = java.nio.file.Files.createTempDirectory("funnel_restart").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Long], Option[Long], Int)]()
    def writer(input: MemoryStream[Event]) =
      EventStreams.funnelStream(input.toDS(), steps,
          timeoutSeconds = 300, watermark = "2 minutes")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => emitted.add((r.getLong(0),
            Option(r.getTimestamp(1)).map(_.getTime),
            Option(r.getTimestamp(2)).map(_.getTime),
            Option(r.getTimestamp(3)).map(_.getTime),
            r.getInt(4))))
        }
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Append)
    val batch1 = Seq(
      Event(1, ts(0, 0), 1, "signup", 0.0),
      Event(2, ts(1, 0), 1, "click", 0.0),
      Event(3, ts(0, 30), 2, "signup", 0.0))
    val batch2 = Seq(Event(4, ts(2, 0), 1, "purchase", 0.0))
    val pushers = Seq(Event(900, ts(10, 0), 99, "noop", 0.0),
      Event(901, ts(20, 0), 99, "noop", 0.0))
    val input = MemoryStream[Event]
    val q1 = writer(input).start()
    try { input.addData(batch1: _*); q1.processAllAvailable() }
    finally q1.stop()
    assert(emitted.isEmpty, "nothing completes or flushes before the restart")
    val q2 = writer(input).start()
    try {
      // user 1's purchase can only complete if the recovered state
      // still holds its signup+click matches from before the restart
      input.addData(batch2: _*); q2.processAllAvailable()
      pushers.foreach { p => input.addData(p); q2.processAllAvailable() }
    } finally q2.stop()
    val streamed = emitted.toArray(
        Array.empty[(Long, Option[Long], Option[Long], Option[Long], Int)])
      .toSeq.sortBy(_._1)
    val batch = EventStreams.funnel(
        (batch1 ++ batch2 ++ pushers).toDF(), "user_id", steps)
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime),
        Option(r.getTimestamp(2)).map(_.getTime),
        Option(r.getTimestamp(3)).map(_.getTime),
        r.getInt(4))).toSeq.sortBy(_._1)
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.map(_._1) == Seq(1L, 2L))
    assert(streamed.head._5 == 3 && streamed(1)._5 == 1)
  }

  test("dedupStream survives a writer restart: duplicates straddling the checkpoint collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // dropDuplicatesWithinWatermark keeps seen ids in the state store;
    // a duplicate arriving AFTER the restart must still be recognized
    val cp = java.nio.file.Files.createTempDirectory("dedup_restart").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def writer(input: MemoryStream[Event]) =
      EventStreams.dedupStream(input.toDF(), "event_id", "10 minutes")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("event_id").collect().foreach(r => emitted.add(r.getLong(0)))
        }
        .option("checkpointLocation", cp)
        .outputMode(OutputMode.Append)
    val input = MemoryStream[Event]
    val q1 = writer(input).start()
    try {
      input.addData(Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 10), 2, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = writer(input).start()
    try {
      input.addData(Event(1, ts(0, 20), 1, "click", 1.0), // dup across restart
        Event(3, ts(1, 0), 3, "click", 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val ids = { import scala.jdk.CollectionConverters._
      emitted.asScala.toSeq }
    assert(ids.count(_ == 1L) == 1,
      s"id 1 must survive the restart as a known duplicate, got $ids")
    assert(ids.sorted == Seq(1L, 2L, 3L))
  }

  test("StreamSinks readers skip a torn epoch (_SUCCESS gate)") {
    import spark.implicits._
    import graft.streaming.StreamSinks
    // a writer crash mid-job leaves a partial epoch=N (files but no
    // _SUCCESS, possibly a _temporary subtree) next to a settled
    // epoch=N−1; until the restarted stream rewrites N whole, BOTH
    // readers must treat N as invisible — the snapshot reader must not
    // serve a partial triangle, the slices reader must not union it
    val dir = java.nio.file.Files.createTempDirectory("torn_epoch").toString
    val sink = StreamSinks.epochPartitionedParquet(dir)
    sink(Seq((1L, 10L)).toDF("k", "v"), 0L)
    sink(Seq((1L, 11L), (2L, 20L)).toDF("k", "v"), 1L)
    // forge the crash: a complete write whose _SUCCESS is then removed
    // (the committer drops the marker LAST, so any crash before job
    // commit looks exactly like this), plus a leftover _temporary dir
    sink(Seq((9L, 99L)).toDF("k", "v"), 2L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/epoch=2/_SUCCESS"), false))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/epoch=2/_temporary/0"))
    val latest = StreamSinks.readLatestEpoch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(latest == Seq((1L, 11L), (2L, 20L)),
      s"latest must be the settled epoch 1, got $latest")
    val all = StreamSinks.readAllEpochs(spark, dir)
      .selectExpr("cast(epoch as long) epoch", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(all.map(_._1).toSet == Set(0L, 1L),
      s"torn epoch 2 must be excluded, got epochs ${all.map(_._1).distinct}")
    // repair: the restarted stream's replay rewrites epoch 2 whole —
    // it then becomes visible to both readers
    sink(Seq((9L, 99L)).toDF("k", "v"), 2L)
    assert(StreamSinks.readLatestEpoch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((9L, 99L)))
    assert(StreamSinks.readAllEpochs(spark, dir)
      .selectExpr("cast(epoch as long) epoch").distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
  }

  test("a stale state dir with a FRESH checkpoint fails fast on query identity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the epoch cross-check is blind when the leftover snapshot's epoch
    // is 0 or 1 (a fresh query's first epoch 0 passes it) — the
    // manifest's stamped query id closes that window: a brand-new
    // checkpoint means a brand-new stable query id, which cannot match
    // the id persisted by the previous run
    val sd = java.nio.file.Files.createTempDirectory("ident_state").toString
    val cp1 = java.nio.file.Files.createTempDirectory("ident_cp1").toString
    val cp2 = java.nio.file.Files.createTempDirectory("ident_cp2").toString
    val sink = (df: org.apache.spark.sql.DataFrame, e: Long) => { df.count(); () }
    def writer(input: MemoryStream[Event], cp: String) =
      EventStreams.rateAnomalyStream(input.toDF(), windowLength = "1 minute",
          trailing = 2, watermark = "2 minutes", stateDir = Some(sd))(sink)
        .option("checkpointLocation", cp)
    val input1 = MemoryStream[Event]
    val q1 = writer(input1, cp1).start()
    try {
      input1.addData(Event(1, ts(0, 10), 1, "click", 0.0))
      q1.processAllAvailable() // persists the snapshot at epoch 0
    } finally q1.stop()
    val input2 = MemoryStream[Event]
    val q2 = writer(input2, cp2).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      input2.addData(Event(2, ts(0, 20), 2, "click", 0.0))
      q2.processAllAvailable() // first epoch 0 — epoch check alone passes
    }
    try assert(e.getMessage.contains("not from the same run"), e.getMessage)
    finally q2.stop()
  }

  test("stream-state manifest round-trips unmodeled meta through bumpEpoch") {
    import spark.implicits._
    import graft.streaming.StreamState
    // bumpEpoch rewrites the manifest by echoing every key it read —
    // pin that a key the writer added via extraMeta (which bumpEpoch
    // does not model) survives the round trip, so an operator can hang
    // auxiliary state (e.g. the sink horizon) off the manifest safely
    val sd = java.nio.file.Files.createTempDirectory("meta_rt").toString
    StreamState.persist(spark, sd, "meta_rt_kind", epoch = 3L,
      Seq("counts" -> Seq((1L, 2L)).toDF("a", "b")),
      Seq("horizon_ms" -> 12345L, "custom_note" -> "kept"))
    StreamState.bumpEpoch(spark, sd, "meta_rt_kind", epoch = 4L)
    val snap = StreamState.load(spark, sd, "meta_rt_kind", Seq("counts"))
      .getOrElse(fail("snapshot missing after bump"))
    assert(snap.epoch == 4L)
    assert(snap.meta.get("horizon_ms").contains(12345L),
      s"horizon lost in bump round-trip: ${snap.meta}")
    assert(snap.meta.get("custom_note").contains("kept"),
      s"unmodeled key lost in bump round-trip: ${snap.meta}")
    assert(snap.relations("counts").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }
}
