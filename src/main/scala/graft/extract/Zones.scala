package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Zone model + zone-level operators, re-expressing the reference's
  * layout-engine semantics as pure array-local functions (SURVEY.md §2:
  * U2/U4/A5/A6/F2/O1). These run inside extractors / `aggregate()` HOFs —
  * no shuffle, no custom Catalyst needed (SURVEY.md §7.4).
  */
object Zones {

  /** Zone (reference core/models/layout_engine.py:14-30):
    * bbox = (x1, y1, x2, y2); zoneType ∈ {text, title, figure, table,
    * formula} (layout_engine.py:42-48).
    */
  final case class Zone(x1: Int, y1: Int, x2: Int, y2: Int,
      zone_type: String, confidence: Double) {
    /** layout_engine.py:22-25 */
    def area: Long = math.max(0, x2 - x1).toLong * math.max(0, y2 - y1)
  }

  /** Confidence threshold filter (reference layout_engine.py:131,
    * threshold defined :39 — keep zones with score >= 0.5).
    */
  val ConfidenceThreshold = 0.5
  def filterConfident(zones: Seq[Zone]): Seq[Zone] =
    zones.filter(_.confidence >= ConfidenceThreshold)

  /** Reading-order sort key (reference layout_engine.py:195-206):
    * bucket rows into 50px lines top-to-bottom, then left-to-right.
    */
  def readingOrder(zones: Seq[Zone]): Seq[Zone] =
    zones.sortBy(z => (z.y1 / 50, z.x1))

  /** Adjacency predicate (reference layout_engine.py:219-245
    * `_zones_adjacent`): vertical gap <= 20px with horizontal overlap,
    * or horizontal gap <= 20px with vertical overlap.
    */
  val AdjacencyGap = 20
  def adjacent(a: Zone, b: Zone): Boolean = {
    val hOverlap = a.x1 < b.x2 && b.x1 < a.x2
    val vOverlap = a.y1 < b.y2 && b.y1 < a.y2
    val vGap = math.max(a.y1, b.y1) - math.min(a.y2, b.y2)
    val hGap = math.max(a.x1, b.x1) - math.min(a.x2, b.x2)
    (hOverlap && vGap <= AdjacencyGap) || (vOverlap && hGap <= AdjacencyGap)
  }

  /** Merge a group of zones into one (reference layout_engine.py:259-278
    * `_merge_zones`): bbox union (min x1/y1, max x2/y2 — A6) +
    * area-weighted confidence Σ(conf*area)/Σ(area) (A5,
    * layout_engine.py:270-272).
    */
  def mergeZones(zones: Seq[Zone]): Zone = {
    require(zones.nonEmpty)
    val x1 = zones.map(_.x1).min
    val y1 = zones.map(_.y1).min
    val x2 = zones.map(_.x2).max
    val y2 = zones.map(_.y2).max
    val totalArea = zones.map(_.area).sum
    val conf =
      if (totalArea == 0) zones.map(_.confidence).max
      else zones.map(z => z.confidence * z.area).sum / totalArea
    Zone(x1, y1, x2, y2, zones.head.zone_type, conf)
  }

  /** Merge adjacent text zones, leave other types untouched (reference
    * layout_engine.py:208-257 `merge_adjacent_text_zones`): greedy
    * agglomeration over the text-zone subset using a `used` index set,
    * non-text zones appended after (layout_engine.py:245), final result
    * re-sorted into reading order.
    */
  def mergeAdjacentTextZones(zones: Seq[Zone]): Seq[Zone] = {
    val (text, other) = zones.partition(_.zone_type == "text") // F4 split
    val used = new Array[Boolean](text.length)
    val merged = ArrayBuffer.empty[Zone]
    var i = 0
    while (i < text.length) {
      if (!used(i)) {
        used(i) = true
        val group = ArrayBuffer(text(i))
        var grew = true
        while (grew) {
          grew = false
          var j = 0
          while (j < text.length) {
            if (!used(j) && group.exists(g => adjacent(g, text(j)))) {
              used(j) = true
              group += text(j)
              grew = true
            }
            j += 1
          }
        }
        merged += mergeZones(group.toSeq)
      }
      i += 1
    }
    readingOrder(merged.toSeq ++ other)
  }
}
