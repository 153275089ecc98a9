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

  test("isolated pairs and pure stars bypass the contraction loop") {
    import spark.implicits._
    // pairs and single-bucket min-stars are complete components: the
    // pure-star bypass answers without a single contraction round
    val (out, rounds) = Components.connectedComponentsWithRounds(
      Seq(1L -> 2L, 30L -> 4L, 50L -> 60L,
        10L -> 11L, 10L -> 12L, 10L -> 13L).toDF("src", "dst"))
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds == 0)
    assert(m == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 30L -> 4L,
      50L -> 50L, 60L -> 50L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("a star bridged to another bucket is NOT bypassed") {
    // star at 1 shares node 5 with the pair (5,9): the shared doc
    // disqualifies both from the bypass and the loop must merge them
    val m = cc(Seq(1L -> 5L, 1L -> 7L, 5L -> 9L, 20L -> 21L))
    assert(m == Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("isolated pairs and a chain mix: both paths agree on components") {
    // pair (100,200) rides the bypass; the 1-..-5 chain (internal
    // degrees 2) and the star at 7 ride the loop; a duplicate +
    // reversed rendering of the pair must not defeat its degree count
    val m = cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      7L -> 8L, 7L -> 9L, 100L -> 200L, 200L -> 100L, 100L -> 200L))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 100L -> 100L, 200L -> 100L))
  }

  test("distributed loop (driver fast path disabled) matches") {
    import spark.implicits._
    // driverMaxEdges = 0 forces the contraction loop on the residual:
    // same graph as the chain test plus a bridged star and a pair
    val edges = ((1L to 9L).map(i => i -> (i + 1)) ++
      Seq(100L -> 5L, 100L -> 101L, 200L -> 201L)).toDF("src", "dst")
    val (out, rounds) = Components.connectedComponentsWithRounds(
      edges, driverMaxEdges = 0L)
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds > 0)
    val expect = ((1L to 10L) ++ Seq(100L, 101L)).map(_ -> 1L).toMap ++
      Map(200L -> 200L, 201L -> 200L)
    assert(m == expect)
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
