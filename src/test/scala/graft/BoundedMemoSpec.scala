package graft

import org.scalatest.funsuite.AnyFunSuite

/** The artifact-cache memo contract (round-11 advice, LRU per round-12):
  * check-then-put, single-LRU eviction — arrival of an over-cap key must
  * NOT flush the other live entries, and a HIT refreshes recency. */
class BoundedMemoSpec extends AnyFunSuite {

  test("caches on first build, returns cached value without rebuilding") {
    val m = new BoundedMemo[Int](4)
    var builds = 0
    def get(k: String) = m.get(k) { builds += 1; builds }
    assert(get("a") == 1 && get("a") == 1 && builds == 1)
  }

  test("eviction removes only the single oldest entry") {
    val m = new BoundedMemo[String](2)
    var builds = 0
    def get(k: String) = m.get(k) { builds += 1; s"$k#$builds" }
    val a = get("a"); val b = get("b")
    val c = get("c") // cap reached: evicts ONLY "a"
    assert(builds == 3)
    assert(get("b") == b && get("c") == c && builds == 3) // both survived
    assert(get("a") != a && builds == 4)                  // "a" re-derives
  }

  test("a hit refreshes recency: the hot first-inserted entry survives") {
    val m = new BoundedMemo[String](2)
    var builds = 0
    def get(k: String) = m.get(k) { builds += 1; s"$k#$builds" }
    val a = get("a"); get("b")
    assert(get("a") == a)     // hit moves "a" to the back
    get("c")                  // evicts "b" (now the LRU), not "a"
    assert(get("a") == a && builds == 3) // hot entry survived the arrival
    assert(builds == 3)
    get("b")                  // "b" was evicted → re-derives
    assert(builds == 4)
  }

  test("cap must be positive") {
    intercept[IllegalArgumentException](new BoundedMemo[Int](0))
  }
}
