package graft.extract

import graft.extract.Zones._
import org.scalatest.funsuite.AnyFunSuite

/** Zone operators vs reference semantics (layout_engine.py). */
class ZonesSpec extends AnyFunSuite {

  test("confidence filter keeps >= 0.5 (layout_engine.py:131)") {
    val zs = Seq(
      Zone(0, 0, 10, 10, "text", 0.4),
      Zone(0, 0, 10, 10, "text", 0.5),
      Zone(0, 0, 10, 10, "text", 0.9))
    assert(filterConfident(zs).map(_.confidence) == Seq(0.5, 0.9))
  }

  test("reading order = (y1 // 50, x1) buckets (layout_engine.py:195-206)") {
    val zs = Seq(
      Zone(300, 10, 350, 40, "text", 1), // line 0, right
      Zone(0, 60, 50, 90, "text", 1),    // line 1, left
      Zone(0, 20, 50, 45, "text", 1))    // line 0, left
    assert(readingOrder(zs).map(_.x1) == Seq(0, 300, 0))
  }

  test("zone merge: bbox union + area-weighted confidence (A5/A6)") {
    val a = Zone(0, 0, 10, 10, "text", 1.0)   // area 100
    val b = Zone(10, 0, 40, 10, "text", 0.5)  // area 300
    val m = mergeZones(Seq(a, b))
    assert((m.x1, m.y1, m.x2, m.y2) == (0, 0, 40, 10))
    assert(math.abs(m.confidence - (1.0 * 100 + 0.5 * 300) / 400) < 1e-12)
  }

  test("adjacent text zones merge (gap <= 20px), others untouched (U4)") {
    val zs = Seq(
      Zone(0, 0, 100, 40, "text", 0.9),
      Zone(0, 55, 100, 95, "text", 0.8),   // vGap 15 <= 20 -> merges
      Zone(0, 200, 100, 240, "text", 0.7), // far -> separate
      Zone(0, 100, 100, 140, "figure", 0.9)) // non-text: untouched
    val out = mergeAdjacentTextZones(zs)
    assert(out.count(_.zone_type == "text") == 2)
    assert(out.count(_.zone_type == "figure") == 1)
    val merged = out.find(z => z.zone_type == "text" && z.y1 == 0).get
    assert(merged.y2 == 95)
    // transitive agglomeration
    val chain = Seq(
      Zone(0, 0, 10, 40, "text", 1),
      Zone(0, 50, 10, 90, "text", 1),
      Zone(0, 100, 10, 140, "text", 1))
    assert(mergeAdjacentTextZones(chain).size == 1)
  }

  test("empty and degenerate zones") {
    assert(mergeAdjacentTextZones(Nil) == Nil)
    val degenerate = Zone(5, 5, 5, 5, "text", 0.9) // zero area
    assert(mergeZones(Seq(degenerate)).confidence == 0.9)
  }
}
