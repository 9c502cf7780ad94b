package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for [[KeyedLazyCache]]'s three lifecycle promises:
  * once-only building, LRU eviction bounded at maxEntries, and BOUNDED
  * DEFERRED retirement — evicted values reach `onRetire` only after
  * `retireKeep` further evictions, in FIFO order, and never while still
  * unbuilt. The Spark-integration side (a held lazy IVF query surviving
  * eviction, a fully-retired index directory really deleted) lives in
  * LlmOpsSpec.
  */
class KeyedLazyCacheSpec extends AnyFunSuite {

  test("builds once per residency; hits never rebuild") {
    var builds = 0
    val c = new KeyedLazyCache[String, Int](2)
    assert(c.getOrBuild("a") { builds += 1; 10 } == 10)
    assert(c.getOrBuild("a") { builds += 1; 99 } == 10)
    assert(builds == 1 && c.size == 1)
  }

  test("eviction is LRU: a hit promotes its key past older residents") {
    val c = new KeyedLazyCache[String, Int](2)
    c.getOrBuild("a")(1); c.getOrBuild("b")(2)
    c.getOrBuild("a")(-1) // hit — promotes a over b
    c.getOrBuild("c")(3)  // evicts b, the least recently used
    assert(c.contains("a") && !c.contains("b") && c.contains("c"))
    assert(c.size == 2)
  }

  test("retirement is deferred by retireKeep evictions and fires in FIFO order") {
    val retired = scala.collection.mutable.ArrayBuffer.empty[Int]
    val c = new KeyedLazyCache[Int, Int](2, retireKeep = 1, onRetire = retired += _)
    (1 to 5).foreach(k => c.getOrBuild(k)(k * 10))
    // evictions: 1 (at insert 3), 2 (at 4), 3 (at 5); queue keeps the
    // newest retireKeep=1, so 1 then 2 were handed to onRetire, in order
    assert(retired.toSeq == Seq(10, 20))
    assert(c.retiredPending == 1)
    assert(c.size == 2 && c.contains(4) && c.contains(5))
  }

  test("default retireKeep never retires (owner-managed resource lifetime)") {
    var calls = 0
    val c = new KeyedLazyCache[Int, Int](1, onRetire = (_: Int) => calls += 1)
    (1 to 5).foreach(k => c.getOrBuild(k)(k))
    assert(calls == 0 && c.retiredPending == 0 && c.size == 1)
  }

  test("a slot whose builder threw is skipped by retirement, not force-built") {
    val retired = scala.collection.mutable.ArrayBuffer.empty[Int]
    val c = new KeyedLazyCache[Int, Int](1, retireKeep = 0, onRetire = retired += _)
    intercept[IllegalStateException] {
      c.getOrBuild(1)(throw new IllegalStateException("boom"))
    }
    c.getOrBuild(2)(20) // evicts the failed slot; retiring it must not rebuild
    c.getOrBuild(3)(30) // evicts 2, which WAS built — retired normally
    assert(retired.toSeq == Seq(20))
  }
}
