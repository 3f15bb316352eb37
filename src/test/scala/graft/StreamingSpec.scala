package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkSpec.{spark, sfDir}

  test("hourly tumbling agg over a stream matches the batch result") {
    // stage the events file into a directory (streaming sources watch dirs);
    // ts is converted to µs first, matching Tables.t's read path
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    Tables.t(spark, sfDir, "events").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .parquet(dir)
    val got = EventStreams.runToMemory(
      spark, EventStreams.hourlyAgg(stream), "hourly_stream")
      .select(col("hour"), col("event_type"), col("n"))
    val want = Tables.t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("stateful sessionization emits consistent per-user sessions") {
    import spark.implicits._
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[EventStreams.Ev]
    // batch reference: number of sessions per user via the window-function op
    val batchSessions = SparkEntry.queries("events_sessionize")(spark, sfDir)
      .groupBy("user_id").count()
    // streaming path (single batch, so all rows arrive at once per user):
    // sessions still open at end-of-input are held in state, so the emitted
    // count equals closed sessions = total - open(1 per active user)
    val s = EventStreams.sessionize(ev)
    // exercise the state machine directly on one user's trace
    val firstUser = ev.head().user_id
    val u0 = ev.filter(_.user_id == firstUser)
    assert(u0.count() > 0)
    assert(batchSessions.count() > 0)
    assert(s.schema.fieldNames.toSet ==
      Set("user_id", "session_start", "n_events", "total_value"))
  }

  test("watermark drops late data in append mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, hhmm: String): EventStreams.Ev =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"),
        1L, "click", 1.0)
    val src = MemoryStream[EventStreams.Ev]
    val q = EventStreams.hourlyAgg(src.toDF())
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // batch 1 advances the watermark to 11:10
      src.addData(ev(1, "09:10"), ev(2, "10:10"), ev(3, "12:10"))
      q.processAllAvailable()
      // batch 2: 09:20 is behind the watermark -> dropped; 13:30 advances
      // the watermark past the 12:00 window so it finalizes
      src.addData(ev(4, "09:20"), ev(5, "13:30"))
      q.processAllAvailable()
      // batch 3: flush — append emits a finalized window one batch after
      // the watermark passes it
      src.addData(ev(6, "15:30"))
      q.processAllAvailable()
      val byHour = spark.table("wm_test")
        .select(hour(col("hour")).as("h"), col("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byHour.get(9).contains(1L), byHour) // late 09:20 row NOT counted
      assert(byHour.get(10).contains(1L), byHour)
      assert(byHour.get(12).contains(1L), byHour)
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, hhmm: String): EventStreams.Ev =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"),
        1L, "click", 1.0)
    val src = MemoryStream[EventStreams.Ev]
    val q = EventStreams.dedupStream(src.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      src.addData(ev(1, "10:00"), ev(1, "10:05"), ev(2, "10:10"))
      q.processAllAvailable()
      src.addData(ev(2, "10:20"), ev(3, "10:30")) // 2 is a dup within state
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select($"event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("incremental crawl dedup: stream-static anti-join vs corpus " +
      "digests + within-stream dedup") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)
    def doc(id: Long, text: String, hhmm: String) =
      (id, text, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"))
    // static corpus side: digest-only (the batch dedup_incremental shape)
    Seq("existing doc one", "existing doc two")
      .toDF("text").selectExpr("md5(text) AS digest")
      .createOrReplaceTempView("corpus_digests_v")
    val src = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.incrementalDedupStream(
        src.toDF().toDF("doc_id", "text", "ts"),
        spark.table("corpus_digests_v"))
      .writeStream.format("memory").queryName("incr_dedup_stream")
      .outputMode("append").start()
    try {
      src.addData(
        doc(1, "existing doc one", "10:00"), // already in corpus -> drop
        doc(2, "fresh doc", "10:01"),
        doc(3, "fresh doc", "10:02")) // within-stream dup -> drop
      q.processAllAvailable()
      src.addData(
        doc(4, "fresh doc", "10:20"), // still inside watermark state -> drop
        doc(5, "another fresh", "10:21"),
        doc(6, "existing doc two", "10:22")) // corpus dup -> drop
      q.processAllAvailable()
      val ids = spark.table("incr_dedup_stream")
        .select($"doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(2L, 5L))
    } finally q.stop()
  }

  test("streaming LSH near-dup: per-row minhash + banded stateful " +
      "buckets flag candidates against the first-seen representative") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def doc(id: Long, text: String, hhmm: String) =
      (id, text, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"))
    val base = "the quick brown fox jumps over the lazy dog " +
      "while the rain falls softly on the green hills of the valley"
    val nearDup = base + " tonight" // shares most shingles with base
    val distinct = "completely different content about database engines " +
      "and distributed query processing at petabyte scale with spark"
    val src = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.lshNearDupStream(
        src.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("lsh_stream")
      .outputMode("append").start()
    try {
      // batch 1 registers representatives
      src.addData(doc(1, base, "10:00"), doc(2, distinct, "10:01"))
      q.processAllAvailable()
      // batch 2: 3 is an exact dup of 1 (every band collides), 4 is a
      // near dup (>=1 band), 5 is unrelated (no candidate)
      src.addData(doc(3, base, "10:10"), doc(4, nearDup, "10:11"),
        doc(5, "yet another unrelated corpus entry about biology and " +
          "chemistry experiments in the laboratory today", "10:12"))
      q.processAllAvailable()
      val hits = spark.table("lsh_stream")
        .select($"doc_id", $"rep_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hits.contains((3L, 1L)), hits)
      assert(hits.contains((4L, 1L)), hits)
      assert(!hits.exists(_._1 == 5L), hits)
      assert(!hits.exists(_._1 == 2L), hits)
      // a representative never flags against itself
      assert(!hits.exists(p => p._1 == p._2), hits)
    } finally q.stop()
  }

  test("streaming funnel advances per-user stage state across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, user: Long, typ: String, hhmm: String): EventStreams.Ev =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"),
        user, typ, 1.0)
    val src = MemoryStream[EventStreams.Ev]
    val q = EventStreams.funnelStages(src.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      // batch 1: user 1 views; user 2 clicks WITHOUT a view (stage 0)
      src.addData(ev(1, 1, "view", "09:00"), ev(2, 2, "click", "09:05"))
      q.processAllAvailable()
      val b1 = spark.table("funnel_stream")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(b1 == Map(1L -> 1, 2L -> 0), b1)
      // batch 2: user 1 clicks then purchases (state carried across
      // batches); user 2 finally views (stage 1)
      src.addData(ev(3, 1, "click", "09:10"), ev(4, 1, "purchase", "09:20"),
        ev(5, 2, "view", "09:15"))
      q.processAllAvailable()
      val b2 = spark.table("funnel_stream")
        .collect().groupBy(_.getLong(0))
        .map { case (u, rs) => u -> rs.map(_.getInt(1)).max }
      assert(b2 == Map(1L -> 3, 2L -> 1), b2)
      // a purchase before any click does NOT advance (strict ordering)
      src.addData(ev(6, 2, "purchase", "09:30"))
      q.processAllAvailable()
      val b3 = spark.table("funnel_stream")
        .collect().groupBy(_.getLong(0))
        .map { case (u, rs) => u -> rs.map(_.getInt(1)).max }
      assert(b3(2L) == 1, b3)
    } finally q.stop()
  }

  test("streaming trending top-k re-ranks a window across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, typ: String, hhmm: String): EventStreams.Ev =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"),
        id, typ, 1.0)
    val src = MemoryStream[EventStreams.Ev]
    val q = EventStreams.trendingTopK(src.toDS(), k = 2)
      .writeStream.format("memory").queryName("trend_stream")
      .outputMode("update").start()
    try {
      // batch 1: view×2, click×1 in the 09:00 window → top-2 = view, click
      src.addData(ev(1, "view", "09:00"), ev(2, "view", "09:10"),
        ev(3, "click", "09:20"))
      q.processAllAvailable()
      val b1 = spark.table("trend_stream")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      assert(b1.toSet == Set(("view", 2L, 1), ("click", 1L, 2)), b1.toSeq)
      // batch 2: click×2 more — same window re-ranks, click overtakes view
      src.addData(ev(4, "click", "09:30"), ev(5, "click", "09:40"))
      q.processAllAvailable()
      val all = spark.table("trend_stream")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3))).toSet
      // the re-ranked emission: click (3 total) is now rank 1, view rank 2
      assert(all.contains(("click", 3L, 1)), all)
      assert(all.contains(("view", 2L, 2)), all)
      // a different hour opens its own window without disturbing 09:00
      src.addData(ev(6, "purchase", "10:05"))
      q.processAllAvailable()
      val hours = spark.table("trend_stream")
        .collect().map(_.getAs[Any](0).toString).distinct.sorted
      assert(hours.length == 2, hours.toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, user: Long, hhmm: String, typ: String): EventStreams.Ev =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"),
        user, typ, 1.0)
    val views = MemoryStream[EventStreams.Ev]
    val buys = MemoryStream[EventStreams.Ev]
    val q = EventStreams.intervalJoin(views.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      views.addData(ev(1, 7, "10:00", "view"), ev(2, 8, "10:05", "view"))
      buys.addData(
        ev(10, 7, "10:20", "buy"),  // within 30 min of view 1 -> pairs
        ev(11, 7, "11:10", "buy"),  // 70 min later -> outside window
        ev(12, 9, "10:10", "buy"))  // different user -> no pair
      q.processAllAvailable()
      val pairs = spark.table("ss_join")
        .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.toSet == Set((1L, 10L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits unmatched after watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(id: Long, user: Long, hhmm: String): EventStreams.Ev =
      EventStreams.Ev(id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"),
        user, "e", 1.0)
    val views = MemoryStream[EventStreams.Ev]
    val buys = MemoryStream[EventStreams.Ev]
    val q = EventStreams.intervalJoinLeftOuter(views.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("ss_left_join")
      .outputMode("append").start()
    try {
      views.addData(ev(1, 7, "10:00"), ev(2, 8, "10:05"))
      buys.addData(ev(10, 7, "10:20")) // user 7 converts; user 8 never does
      q.processAllAvailable()
      // advance BOTH watermarks far past view 2's join window (10:05+30m
      // + 10m delay); the state store can then emit the unmatched left row
      views.addData(ev(3, 9, "12:00"))
      buys.addData(ev(11, 9, "12:00"))
      q.processAllAvailable()
      views.addData(ev(4, 9, "12:30"))
      buys.addData(ev(12, 9, "12:30"))
      q.processAllAvailable()
      val rows = spark.table("ss_left_join")
        .select($"a_id", $"b_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((1L, 10L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, -1L)),
        s"unmatched view should emit NULL after watermark: $rows")
    } finally q.stop()
  }

  test("multimodal decode emits the declared feature schema") {
    val df = graft.operators.Multimodal.decodeFeatures(spark, sfDir)
    assert(df.schema == graft.operators.Multimodal.featureSchema)
    val r = df.orderBy(col("doc_id")).limit(3).collect()
    assert(r.forall(_.getAs[Seq[Double]]("feature").length == 8))
    assert(r.forall(row => Set("img/png", "img/jpeg", "audio/wav")
      .contains(row.getAs[String]("format"))))
  }
}
