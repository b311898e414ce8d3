package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the codec intern pool's post-cap behavior: LRU eviction, not
  * the old stop-deduplicating-forever cliff (a long-lived multi-tenant
  * executor would otherwise hand every NEW merge table a cold per-task
  * codec — cold rank index + cold word cache — once 64 tables had ever
  * been seen).
  */
class BpeCodecInternSpec extends AnyFunSuite {

  private def mk(i: Int) = new BpeCodec(Seq((s"x$i", s"y$i")))

  test("intern pool evicts LRU past the cap instead of going cold") {
    val first = BpeCodec.intern(mk(0))
    (1 to 70).foreach(i => BpeCodec.intern(mk(i)))
    assert(BpeCodec.internedCount <= 64)
    // post-cap interning still deduplicates: a NEW equal table gets the
    // canonical instance back (the old behavior returned the fresh
    // per-task copy once the pool filled)
    val c70 = BpeCodec.intern(mk(70))
    assert(BpeCodec.intern(mk(70)) eq c70)
    // the long-unused table 0 was evicted — re-interning installs a new
    // canonical instance rather than resurrecting the stale reference
    assert(BpeCodec.intern(mk(0)) ne first)
    // and a just-used table survives the next insertions (access-order)
    val c0b = BpeCodec.intern(mk(0))
    (100 to 110).foreach(i => BpeCodec.intern(mk(i)))
    assert(BpeCodec.intern(mk(0)) eq c0b)
  }
}
