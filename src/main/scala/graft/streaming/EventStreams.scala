package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming versions of the event-analytics shapes.
  *
  * The reference has no streaming subsystem (SURVEY.md §2.10) — this is the
  * post-parity extension mapped 1:1 onto Spark concepts: `readStream` over
  * the events schema, `withWatermark` for late-data bounds, `window()` for
  * tumbling aggregation, and `flatMapGroupsWithState` for sessionization
  * state the way the batch operator does it with window functions.
  *
  * Scale: watermark + windowed agg is incrementally maintained per
  * micro-batch and shuffles only by (window, event_type); session state is
  * partitioned by user_id with per-key timeout — both shapes are the
  * standard 1000-executor streaming topologies.
  */
object EventStreams {

  /** events schema as produced by the testdata (ts surfaced at µs). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly tumbling counts/sums with a 1h watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("total_value"))

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, total_value: Double)
  private case class SessState(start: Long, last: Long, n: Long, total: Double)

  /** Gap-based sessionization with explicit state: a session closes after
    * 30 minutes of inactivity (processing-time timeout drives emission). */
  def sessionize(events: Dataset[Ev]): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
          var st = state.getOption.orNull
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            if (st == null) st = SessState(t, t, 1, e.value)
            else if (t - st.last > gapMs) {
              out += SessionAgg(user, new java.sql.Timestamp(st.start), st.n, st.total)
              st = SessState(t, t, 1, e.value)
            } else st = st.copy(last = t, n = st.n + 1, total = st.total + e.value)
          }
          if (st != null) state.update(st)
          if (state.hasTimedOut && st != null) {
            out += SessionAgg(user, new java.sql.Timestamp(st.start), st.n, st.total)
            state.remove()
          } else state.setTimeoutDuration(gapMs)
          out.iterator
      }
  }

  /** Streaming exact dedup: drops events whose `event_id` was already
    * seen, with state bounded by the watermark (the streaming face of the
    * batch `dedup_exact` operator — state holds only ids newer than
    * watermark-delay, so it is O(arrival rate × delay), not O(history)). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming twin of the batch `dedup_incremental` operator: the
    * incoming document stream drops rows whose content digest already
    * exists in the STATIC corpus digest table (stream-static left_anti
    * join — the static side is storage-resident and re-read per
    * micro-batch, never executor state), then
    * dropDuplicatesWithinWatermark removes within-stream re-crawls.
    * Total state = digests inside the watermark window only, so a year
    * of crawl history costs nothing at runtime — exactly how continuous
    * crawl-dedup should be shaped at 100 TB. Expects (doc_id, text, ts)
    * on the stream and a `digest` column on the static side. */
  def incrementalDedupStream(docs: DataFrame,
      corpusDigests: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .join(corpusDigests, Seq("digest"), "left_anti")
      .dropDuplicatesWithinWatermark("digest")
      .select(col("doc_id"), col("digest"), col("ts"))

  /** near-dup candidate emitted by the streaming LSH twin. */
  case class NearDup(doc_id: Long, rep_id: Long, band: Int)
  case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
  case class BandHit(band: Int, bkey: Long, doc_id: Long,
                     ts: java.sql.Timestamp)

  /** Streaming twin of the batch MinHash-LSH near-dup pipeline
    * (operators/Dedup.scala): each arriving document computes its K=8
    * minhash values PER ROW — shingle array → one md5-derived 28-bit
    * hash per shingle → 8 universal-hash `aggregate` folds, all inside
    * expressions, zero shuffles — then folds them into 4 band keys.
    * One `flatMapGroupsWithState` keyed by (band, bkey) keeps the FIRST
    * document seen per bucket; later arrivals sharing the bucket emit
    * as (doc_id, representative, band) candidates, exactly the pairs
    * the batch `dedup_lsh_pairs` join would produce. State is ONE row
    * per active bucket with an event-time timeout, so a continuous
    * crawl holds arrival-rate × window state, never corpus-size state —
    * the incremental form of the bucketed-LSH shape at 100 TB. */
  def lshNearDupStream(docs: DataFrame): Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val P61 = 2305843009213693951L
    val M9 = 1000000007L
    def seedA(j: Int): Long = 2654435761L + 2 * j
    def seedB(j: Int): Long = 1013904223L * (j + 1)
    val K = 8
    // per-row signature: no explode, no shuffle — the same math as the
    // batch signatures, folded with higher-order functions
    val hs = expr(
      """transform(
           transform(sequence(1, greatest(size(split(text, ' '))-2, 0)),
                     i -> array_join(slice(split(text, ' '), i, 3), ' ')),
           s -> CAST(conv(substr(md5(CAST(s AS BINARY)), 1, 7), 16, 10)
                     AS BIGINT))""")
    val withSig = (0 until K).foldLeft(
        docs.withColumn("__hs", hs)) { (d, j) =>
      d.withColumn(s"mh$j", expr(
        s"aggregate(__hs, CAST(${P61} AS BIGINT), " +
          s"(acc, h) -> least(acc, (h * ${seedA(j)}L + ${seedB(j)}L) % ${P61}L))"))
    }
    val banded = withSig.select(col("doc_id"), col("ts"),
        posexplode(array((0 until K / 2).map(b =>
          (col(s"mh${2 * b}") % M9) * M9 + (col(s"mh${2 * b + 1}") % M9)): _*)))
      .toDF("doc_id", "ts", "band", "bkey")
      .withWatermark("ts", "1 hour")
      .select(col("band").cast("int").as("band"), col("bkey"),
        col("doc_id"), col("ts")).as[BandHit]
    banded
      .groupByKey(h => (h.band, h.bkey))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[BandHit],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDup]
            sorted.foreach { h =>
              if (!state.exists) state.update(h.doc_id)
              else if (state.get != h.doc_id)
                out += NearDup(h.doc_id, state.get, h.band)
            }
            // bucket representative lives until the watermark passes its
            // last activity + 1h — bounded state, late re-crawls still match
            state.setTimeoutTimestamp(
              sorted.map(_.ts.getTime).max, "1 hour")
            out.iterator
          }
      }
  }

  /** Stream-stream interval join: pair each event of stream `a` with the
    * events of stream `b` for the same user within the next `withinMinutes`
    * minutes (attribution/conversion shape). Both sides carry watermarks,
    * so join state is bounded: Spark retains only rows inside
    * watermark ± interval — O(arrival rate × window), not O(history) —
    * and the join shuffles both streams by user_id once. */
  def intervalJoin(a: DataFrame, b: DataFrame, withinMinutes: Int = 30): DataFrame = {
    val left = a.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("a_ts"), col("event_id").as("a_id"),
        col("event_type").as("a_type"))
    val right = b.withWatermark("ts", "1 hour")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"), col("event_type").as("b_type"))
    left.join(right,
      col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_type"),
        col("b_type"), col("a_ts"), col("b_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: views that never convert
    * within the window still emit (with NULL buy columns) once the
    * watermark passes the join window's end — Spark's state store holds
    * each left row only until `b_ts <= a_ts + within` can no longer
    * match (reference has no streaming surface; this is the Spark-native
    * conversion-funnel shape at 100 TB/day event volumes). */
  def intervalJoinLeftOuter(a: DataFrame, b: DataFrame,
                            withinMinutes: Int = 30): DataFrame = {
    val left = a.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("a_ts"), col("event_id").as("a_id"))
    val right = b.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_id"))
    left.join(right,
      col("user_id") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
      "leftOuter")
      .select(col("user_id"), col("a_id"), col("b_id"), col("a_ts"),
        col("b_ts"))
  }

  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)
  case class FunnelUpdate(user_id: Long, stage: Int)

  /** Streaming funnel: per-user view -> click -> purchase progression as
    * mapGroupsWithState (the streaming face of the batch `events_funnel`
    * operator). State is three epoch-millis per user — O(users), not
    * O(events) — and each micro-batch advances the stage machine with the
    * same strictly-increasing-timestamp rule the batch operator enforces
    * with per-stage min-ts joins. Emits the user's highest reached stage
    * in Update mode. */
  def funnelStages(events: Dataset[Ev]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" if st.tView < 0 =>
                st = st.copy(tView = t)
              case "click" if st.tView >= 0 && st.tClick < 0 && t > st.tView =>
                st = st.copy(tClick = t)
              case "purchase"
                  if st.tClick >= 0 && st.tPurchase < 0 && t > st.tClick =>
                st = st.copy(tPurchase = t)
              case _ =>
            }
          }
          state.update(st)
          FunnelUpdate(user,
            if (st.tPurchase >= 0) 3
            else if (st.tClick >= 0) 2
            else if (st.tView >= 0) 1
            else 0)
      }
  }

  case class TrendUpdate(window_start: java.sql.Timestamp,
      event_type: String, n: Long, rank: Int)

  /** Streaming per-window top-k "trending" (windowed rank is not
    * expressible over a streaming aggregate, so this is the canonical
    * stateful shape): key by the hour bucket, hold ONE count map per
    * window — state is O(distinct event types), not O(events) — and
    * re-emit that window's top-k whenever a micro-batch touches it
    * (Update mode). The event-time timeout purges a window's state once
    * the watermark passes its close, so total state is
    * O(active windows × type cardinality) at any event volume. */
  def trendingTopK(events: Dataset[Ev], k: Int = 3): Dataset[TrendUpdate] = {
    import events.sparkSession.implicits._
    val hourMs = 3600000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(e => e.ts.getTime / hourMs * hourMs)
      .flatMapGroupsWithState[Map[String, Long], TrendUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (hour: Long, rows: Iterator[Ev], state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var counts = state.getOption.getOrElse(Map.empty[String, Long])
            rows.foreach { e =>
              counts = counts.updated(e.event_type,
                counts.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(counts)
            // hold the window one extra hour past its close for late data,
            // then drop it
            state.setTimeoutTimestamp(hour + 2 * hourMs)
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
              .zipWithIndex.iterator.map { case ((t, n), i) =>
                TrendUpdate(new java.sql.Timestamp(hour), t, n, i + 1)
              }
          }
      }
  }

  /** Drive a streaming DataFrame synchronously to a memory sink; returns
    * the materialized result (for tests/local smoke — production writes
    * to a real sink with a trigger). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      mode: String = "update"): DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
