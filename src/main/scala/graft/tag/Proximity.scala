package graft.tag

import graft.model.OcrDoc
import org.apache.spark.sql.{DataFrame, Dataset}

/** W6 — per-document spatial proximity grouping
  * (vlm/utils/geometry_utils.py:139-204 `group_elements_by_proximity`):
  * elements whose bbox centers are within `threshold` euclidean distance
  * are grouped.
  *
  * REFERENCE-EXACT SEMANTICS, quirk included: the reference is a SINGLE-PASS
  * greedy, not a transitive closure. It seeds a group with the first
  * remaining element and scans the rest once, absorbing any element close
  * to a CURRENT group member — an element skipped early is never revisited,
  * so a chain ordered (far-link, seed, middle-link) splits where a true
  * connected-components pass would join it (ProximitySpec pins one such
  * case). On inputs whose clusters have diameter ≤ threshold and mutual
  * separation > threshold the greedy equals connected components
  * (property-tested against ConnectedComponents.run on the exploded edge
  * list).
  *
  * Scale shape: one narrow mapPartitions — each doc's grouping is an
  * in-row O(spans²) computation (spans/doc is tens, not millions), the
  * corpus dimension stays embarrassingly parallel, no shuffle. The
  * corpus-LEVEL transitive closure (entity graphs) is the separate
  * distributed operator (canon.ConnectedComponents).
  */
object Proximity {

  /** Greedy grouping over element centers in LIST ORDER; returns the group
    * id per element index (group ids numbered in creation order). */
  def groupGreedy(centers: IndexedSeq[(Double, Double)], threshold: Double): Array[Int] = {
    val n = centers.length
    val group = Array.fill(n)(-1)
    def close(i: Int, j: Int): Boolean = {
      val dx = centers(i)._1 - centers(j)._1
      val dy = centers(i)._2 - centers(j)._2
      math.sqrt(dx * dx + dy * dy) <= threshold
    }
    var g = 0
    var seed = 0
    while (seed < n) {
      if (group(seed) == -1) {
        group(seed) = g
        val members = scala.collection.mutable.ArrayBuffer(seed)
        var i = seed + 1
        while (i < n) {
          if (group(i) == -1 && members.exists(m => close(i, m))) {
            // absorbed elements join the member list, so LATER elements can
            // chain through them — but earlier-skipped ones are not
            // revisited (the reference's single-pass contract)
            group(i) = g
            members += i
          }
          i += 1
        }
        g += 1
      }
      seed += 1
    }
    group
  }

  /** (doc_id, offset, group_id) for every span of every document, greedy
    * per-doc grouping in span (offset) order — the reference processes its
    * element list in reading order. */
  def proximityGroups(docs: Dataset[OcrDoc], threshold: Double = 50.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { d =>
      val spans = d.spans.sortBy(_.offset).toIndexedSeq
      val centers = spans.map(s =>
        (s.bbox.x + s.bbox.w / 2.0, s.bbox.y + s.bbox.h / 2.0))
      val groups = groupGreedy(centers, threshold)
      spans.zip(groups).map { case (s, g) => (d.doc_id, s.offset, g) }
    }).toDF("doc_id", "offset", "group_id")
  }

  /** The edge list "center distance ≤ threshold" per doc, for oracle
    * comparison against the distributed CC operator in tests. */
  def proximityEdges(docs: Dataset[OcrDoc], threshold: Double = 50.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { d =>
      val spans = d.spans.sortBy(_.offset).toIndexedSeq
      val centers = spans.map(s =>
        (s.bbox.x + s.bbox.w / 2.0, s.bbox.y + s.bbox.h / 2.0))
      for {
        i <- spans.indices.iterator
        j <- (i + 1) until spans.length
        dx = centers(i)._1 - centers(j)._1
        dy = centers(i)._2 - centers(j)._2
        if math.sqrt(dx * dx + dy * dy) <= threshold
      } yield (s"${d.doc_id}/${spans(i).offset}", s"${d.doc_id}/${spans(j).offset}")
    }).toDF("src", "dst")
  }
}
