package graft

import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the r13 bench-accounting seam: ArtifactTimer wraps
  * every Shared* cache getter's build expression, so it must (a) pass
  * the build value through unchanged, (b) accumulate repeated builds
  * under one name (parameterised getters), and (c) reset on clear —
  * the properties Bench.scala's "artifacts" JSON field relies on. */
class ArtifactTimerSpec extends AnyFunSuite {

  test("timed passes the build value through and records a duration") {
    ArtifactTimer.clear()
    val r = ArtifactTimer.timed("spec.one") { 42 }
    assert(r == 42)
    val snap = ArtifactTimer.snapshot
    assert(snap.contains("spec.one"))
    assert(snap("spec.one") >= 0.0)
  }

  test("repeated builds under one name accumulate, not overwrite") {
    ArtifactTimer.clear()
    ArtifactTimer.timed("spec.acc") { Thread.sleep(5); 1 }
    val t1 = ArtifactTimer.snapshot("spec.acc")
    ArtifactTimer.timed("spec.acc") { Thread.sleep(5); 2 }
    val t2 = ArtifactTimer.snapshot("spec.acc")
    assert(t2 > t1, s"expected accumulation, got $t1 -> $t2")
  }

  test("clear empties the ledger (Bench's per-run reset)") {
    ArtifactTimer.timed("spec.gone") { 0 }
    ArtifactTimer.clear()
    assert(ArtifactTimer.snapshot.isEmpty)
  }

  test("a throwing build records nothing and propagates") {
    ArtifactTimer.clear()
    intercept[RuntimeException] {
      ArtifactTimer.timed("spec.boom") {
        throw new RuntimeException("build failed")
      }
    }
    assert(!ArtifactTimer.snapshot.contains("spec.boom"))
  }
}
