package graft.ops

import graft.SparkTestBase
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The session-level derived-dataset cache: one derivation per (session,
  * key), entries survive Bench.resetState (which unpersists everything
  * else), and the Pin.disabled plan-inspection path bypasses it.
  */
class SessionCacheSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  behavior of "SessionCache"

  it should "derive once per key and survive resetState" in {
    val s = spark
    import s.implicits._
    SessionCache.clear()
    var derived = 0
    def get() = SessionCache.getOrElsePin(s, "spec_k1") {
      derived += 1
      Seq(1, 2, 3).toDF("x")
    }
    val a = get()
    val b = get()
    derived shouldBe 1
    (b eq a) shouldBe true
    // resetState unpersists every NON-protected RDD; the cached
    // localCheckpoint must stay alive and computable afterwards.
    graft.Bench.resetState(s)
    a.count() shouldBe 3L
    get().count() shouldBe 3L
    derived shouldBe 1
    // clear() drops protection; re-derive on next access.
    SessionCache.clear()
    get()
    derived shouldBe 2
    SessionCache.clear()
  }

  it should "bypass the cache when Pin.disabled (plan inspection)" in {
    val s = spark
    import s.implicits._
    SessionCache.clear()
    var derived = 0
    def get() = SessionCache.getOrElsePin(s, "spec_k2") {
      derived += 1
      Seq(1).toDF("x")
    }
    Pin.disabled = true
    try {
      get(); get()
      derived shouldBe 2 // no caching, full plan returned each time
    } finally Pin.disabled = false
    SessionCache.clear()
  }
}
