package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.EventAnalytics

/** Windowed aggregation + sessionization, batch and streaming forms. */
class EventAnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsDf(rows: (Long, String, String, Double)*) = {
    import spark.implicits._
    rows.map { case (u, t, et, v) => (u, ts(t), et, v) }
      .toDF("user_id", "ts", "event_type", "value")
  }

  test("batch windowedCounts buckets into epoch-aligned tumbling windows") {
    val df = eventsDf(
      (1L, "2024-01-01 00:01:00", "click", 1.0),
      (1L, "2024-01-01 00:04:59", "click", 2.0),
      (2L, "2024-01-01 00:05:00", "click", 4.0),
      (2L, "2024-01-01 00:06:00", "view", 8.0))
    val got = EventAnalytics.windowedCounts(df, "5 minutes")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("2024-01-01 00:00:00.0", "click", 2L, 300L),
      ("2024-01-01 00:05:00.0", "click", 1L, 400L),
      ("2024-01-01 00:05:00.0", "view", 1L, 800L)))
  }

  test("batch sessionize splits on gaps, fractional seconds respected") {
    val df = eventsDf(
      (1L, "2024-01-01 00:00:00", "e", 0),
      (1L, "2024-01-01 00:10:00", "e", 0),  // same session (gap 600 ≤ 1800)
      (1L, "2024-01-01 01:00:00", "e", 0),  // new session (gap 3000)
      (2L, "2024-01-01 00:00:00", "e", 0))
    val got = EventAnalytics.sessionize(df, gapSeconds = 1800)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0", 2L),
      (1L, "2024-01-01 01:00:00.0", "2024-01-01 01:00:00.0", 1L),
      (2L, "2024-01-01 00:00:00.0", "2024-01-01 00:00:00.0", 1L)))
    // boundary: a gap of exactly gapSeconds stays in-session; +1µs splits
    val edge = eventsDf(
      (3L, "2024-01-01 00:00:00", "e", 0),
      (3L, "2024-01-01 00:30:00", "e", 0))
      .union(eventsDf((4L, "2024-01-01 00:00:00", "e", 0))
        .select(col("user_id"),
          (col("ts").cast("double") + 1800.000001).cast("timestamp").as("ts"),
          col("event_type"), col("value"))
        .union(eventsDf((4L, "2024-01-01 00:00:00", "e", 0))))
    val n = EventAnalytics.sessionize(edge, 1800)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(3L -> 1L, 4L -> 2L))
  }

  test("streaming windowedCounts with watermark emits closed windows (append)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = EventAnalytics.streamingWindowedCounts(df, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:01:00"), "click", 1.0),
        (1L, ts("2024-01-01 00:02:00"), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("win_counts").count() == 0) // window still open
      // advance watermark past 00:05 + 10min lateness
      mem.addData((9L, ts("2024-01-01 00:20:00"), "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(rows.toSet == Set(("2024-01-01 00:00:00.0", "click", 2L)))
      // a too-late event for the closed window is dropped
      mem.addData((1L, ts("2024-01-01 00:03:00"), "click", 5.0))
      q.processAllAvailable()
      assert(spark.table("win_counts").count() == 1)
    } finally q.stop()
  }

  test("streaming sessionize closes on gap-break and on event-time timeout") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("user_id", "ts")
    val q = EventAnalytics.streamingSessionize(df, gapSeconds = 60,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // session open
      // same-group event far beyond the gap → closes session 1 inline
      mem.addData((1L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val s1 = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(s1.toSet == Set(
        (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:00:10.0", 2L)))
      // another user's event advances the watermark → session 2 times out
      mem.addData((2L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      val all = spark.table("sessions").collect().map(_.getLong(0)).toSeq
      assert(all.count(_ == 1L) == 2, s"user1 sessions: $all")
    } finally q.stop()
  }
}
