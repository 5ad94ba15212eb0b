package graft

import org.scalatest.funsuite.AnyFunSuite

/** The memoization contract the Bench index waves lean on: concurrent
  * first-touchers of ONE key must run the (side-effecting: persist /
  * saveAsTable) build exactly once, everyone gets the same value, and
  * distinct tags never share a build.
  */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("concurrent first calls on one key evaluate the build exactly once") {
    val cache = new SessionCache[Long]
    val builds = new java.util.concurrent.atomic.AtomicLong(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 8).map(_ => Future {
        barrier.await() // maximize the race window
        cache.getOrElseUpdate(spark, "race-key") {
          Thread.sleep(50) // widen the evaluation window
          builds.incrementAndGet()
        }
      })), 30.seconds)
    assert(builds.get() === 1L, "side-effecting build ran more than once")
    assert(results.toSet === Set(1L))
    assert(cache.size === 1)
  }

  test("distinct tags build independently; repeat calls hit the memo") {
    val cache = new SessionCache[String]
    val builds = new java.util.concurrent.atomic.AtomicLong(0)
    def get(tag: String): String =
      cache.getOrElseUpdate(spark, tag) { builds.incrementAndGet(); tag.toUpperCase }
    assert(get("a") === "A")
    assert(get("b") === "B")
    assert(get("a") === "A")
    assert(builds.get() === 2L)
  }
}
