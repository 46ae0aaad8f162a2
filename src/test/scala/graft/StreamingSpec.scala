package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingEval
import graft.streaming.StreamingEval.{SessionEvent, SessionOut}

/** Structured Streaming specs via MemoryStream: stateless scoring with
  * frozen stats, tumbling-window aggregation with watermark, and stateful
  * sessionization. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("stateless streaming scoring with frozen stats") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val stream = input.toDF().toDF("vendor", "amount")

    // freeze stats from a reference batch
    val batch = Seq(("A", 10.0), ("B", 20.0), ("C", 30.0)).toDF("vendor", "amount")
    val ev = new Evaluator().linear("amount", 1.0, name = "amount_score")
    // statistics come back keyed by criterion NAME; scoreStream accepts that
    val frozen = ev.evaluateResult(batch).statistics

    val scored = StreamingEval.scoreStream(stream, ev, frozen)
    val query = scored.writeStream.format("memory").queryName("scored_stream")
      .outputMode("append").start()
    try {
      input.addData(("X", 10.0), ("Y", 25.0), ("Z", 40.0))
      query.processAllAvailable()
      val out = spark.table("scored_stream").collect()
        .map(r => r.getAs[String]("vendor") -> r.getAs[Double]("final_score")).toMap
      assert(spark.table("scored_stream").columns.contains("score_amount_score"))
      // frozen min=10 max=30: X=0, Y=75, Z=150 (out-of-range extrapolates, no clip in linear)
      assert(out("X") == 0.0)
      assert(out("Y") == 75.0)
      assert(out("Z") == 150.0)
    } finally query.stop()
  }

  test("tumbling window aggregation with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")

    val windowed = StreamingEval.windowedEventStats(stream, windowLen = "1 hour")
    val query = windowed.writeStream.format("memory").queryName("win_stream")
      .outputMode("complete").start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      input.addData(
        (ts(0, 10), "click", 1.0), (ts(0, 50), "click", 2.0),
        (ts(1, 5), "click", 4.0), (ts(0, 30), "view", 8.0))
      query.processAllAvailable()
      val out = spark.table("win_stream")
        .select(col("window.start").cast("string"), col("event_type"),
          col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Long](2), r.getAs[Double](3)))
        .toMap
      assert(out(("2024-01-01 00:00:00", "click")) == ((2L, 3.0)))
      assert(out(("2024-01-01 01:00:00", "click")) == ((1L, 4.0)))
      assert(out(("2024-01-01 00:00:00", "view")) == ((1L, 8.0)))
    } finally query.stop()
  }

  test("stateful sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val gap = 1800L * 1000000L

    val sessions = StreamingEval.sessionize(input.toDS(), gapUs = gap)
    val query = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      val t0us = 1700000000000000L
      def ts(offsetUs: Long) = new Timestamp((t0us + offsetUs) / 1000L)
      // user 1: two events 10 min apart (one session), then an event 2h
      // later -> closes the first session on arrival
      input.addData(
        SessionEvent(1L, 1L, ts(0L), 1.0),
        SessionEvent(1L, 2L, ts(600L * 1000000L), 2.0))
      query.processAllAvailable()
      input.addData(SessionEvent(1L, 3L, ts(7200L * 1000000L), 4.0))
      query.processAllAvailable()
      val out = spark.table("sess_stream").as[SessionOut].collect()
      assert(out.length == 1)
      assert(out.head.user_id == 1L)
      assert(out.head.n_events == 2L)
      assert(out.head.sum_value == 3.0)
      assert(out.head.session_start_us == t0us)
      assert(out.head.session_end_us == t0us + 600L * 1000000L)
    } finally query.stop()
  }
}
