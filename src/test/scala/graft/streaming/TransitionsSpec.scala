package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming Markov-transition semantics: pairs emit only once both
  * ends are below the watermark (so out-of-order arrival cannot
  * misorder a journey), each pair emits exactly once, and an idle
  * user's bridge is TTL-evicted so no transition spans a silence
  * longer than the horizon.
  */
class TransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(sec: Int, typ: String, uid: String = "u1"): String = {
    val ts = f"2024-01-01T00:${sec / 60}%02d:${sec % 60}%02d.000000"
    s"""{"timestamp":"$ts","user_id":"$uid","user_name":"$uid","event_type":"$typ"}"""
  }

  test("out-of-order arrivals finalize in event-time order; TTL bounds journey gaps") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val q = Transitions.start(EventCodec.parse(input.toDF()),
      "transitions_out", lateness = "1 minute", idleTtl = "10 minutes")
    def rows() = spark.table("transitions_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toList
    try {
      // batch 1: u1's first two events arrive REVERSED
      input.addData(Seq(ev(3, "click"), ev(1, "view")))
      q.processAllAvailable()
      assert(rows().isEmpty) // watermark still below them — nothing provable

      // batch 2: a late-but-admissible event lands BETWEEN them, plus
      // a later anchor that pulls the watermark to 40s — the drain's
      // timeout batch then finalizes 1..3s in EVENT-TIME order, while
      // the 100s purchase stays unprovable
      input.addData(Seq(ev(2, "signup"), ev(100, "purchase")))
      q.processAllAvailable()
      val afterB2 = rows().filter(_._1 == "u1")
      assert(afterB2 === List(("u1", "view", "signup"), ("u1", "signup", "click")))

      // batch 3: watermark passes 100s → the bridge links to purchase
      input.addData(Seq(ev(300, "view", "u9")))
      q.processAllAvailable()
      assert(rows().filter(_._1 == "u1") ===
        List(("u1", "view", "signup"), ("u1", "signup", "click"),
          ("u1", "click", "purchase")))

      // advance far past the 10-minute TTL → u1's bridge evicts
      input.addData(Seq(ev(1500, "view", "u9")))
      q.processAllAvailable()
      // u1 returns: two fresh events — their mutual transition emits,
      // but NOTHING links back across the evicted gap
      input.addData(Seq(ev(1600, "view"), ev(1601, "click")))
      q.processAllAvailable()
      input.addData(Seq(ev(1900, "view", "u9")))
      q.processAllAvailable()
      val u1 = rows().filter(_._1 == "u1")
      assert(u1.length === 4)
      assert(u1.last === (("u1", "view", "click")))
      assert(!u1.contains(("u1", "purchase", "view"))) // the TTL-severed link
    } finally q.stop()
  }
}
