package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamSessionsSpec extends SparkSpec {
  import StreamSessions._
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("stateful streaming sessionization: gap close, cross-batch extend, timeout emit") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sessions = sessionize(in.toDS(), gapSeconds = 60, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .start()
    try {
      // batch 1: user 1 has two events 30s apart (one session), user 2 one event
      in.addData(Ev(1, 1, ts(100)), Ev(1, 2, ts(130)), Ev(2, 3, ts(100)))
      q.processAllAvailable()
      // batch 2: user 1's third event arrives 30s later → still same session;
      // a 4th event 5 min later closes it mid-stream
      in.addData(Ev(1, 4, ts(160)), Ev(1, 5, ts(460)))
      q.processAllAvailable()
      val closedMid = spark.table("sessions_out").as[Session].collect()
      assert(closedMid.exists(s => s.user_id == 1 &&
        s.session_start == ts(100) && s.session_end == ts(160) && s.n_events == 3),
        s"gap-closed session missing: ${closedMid.mkString(", ")}")

      // batch 3: advance the watermark far past everyone's gap horizon —
      // the open sessions (user 1's second, user 2's only) emit via timeout
      in.addData(Ev(99, 6, ts(10000)))
      q.processAllAvailable()
      in.addData(Ev(99, 7, ts(20000))) // one more advance so 99's first can't linger ambiguity
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[Session].collect()
      assert(all.exists(s => s.user_id == 1 && s.session_start == ts(460) && s.n_events == 1),
        s"timeout session for user 1 missing: ${all.mkString(", ")}")
      assert(all.exists(s => s.user_id == 2 && s.session_start == ts(100) && s.n_events == 1),
        s"timeout session for user 2 missing: ${all.mkString(", ")}")
      // exactly-once emission: no duplicate sessions
      assert(all.map(s => (s.user_id, s.session_start)).distinct.length == all.length)
    } finally q.stop()
  }
}
