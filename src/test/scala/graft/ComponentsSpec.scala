package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Components

/** Connected components (large-star/small-star) on graphs the LSH
  * fixtures don't produce: long chains (many rounds), merged stars,
  * duplicate/reversed edges, self loops.
  */
class ComponentsSpec extends SparkTestBase {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to its minimum") {
    // 1-2-3-...-10 as a path: worst case for label propagation,
    // logarithmic here
    val m = cc((1L to 9L).map(i => i -> (i + 1)))
    assert(m == (1L to 10L).map(_ -> 1L).toMap)
  }

  test("two components, reversed and duplicate edges, self loops") {
    val m = cc(Seq(5L -> 3L, 3L -> 5L, 3L -> 3L, 5L -> 9L,
      20L -> 30L, 30L -> 20L, 40L -> 20L))
    assert(m == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 30L -> 20L, 40L -> 20L))
  }

  test("bridge edge merges two stars") {
    // stars rooted at 1 and 100, bridged by 7-103
    val m = cc(Seq(1L -> 5L, 1L -> 7L, 100L -> 103L, 100L -> 105L,
      7L -> 103L))
    assert(m.values.toSet == Set(1L))
    assert(m.keySet == Set(1L, 5L, 7L, 100L, 103L, 105L))
  }

  test("empty edge list yields empty mapping") {
    import spark.implicits._
    val out = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(out.count() == 0)
  }

  test("roots map to themselves and every component id is its minimum") {
    val edges = Seq(2L -> 4L, 4L -> 6L, 6L -> 8L, 11L -> 13L, 13L -> 15L)
    val m = cc(edges)
    val comps = m.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    comps.foreach { case (root, members) =>
      assert(members.min == root)
      assert(m(root) == root)
    }
    assert(comps.keySet == Set(2L, 11L))
  }
}
