package graft

import graft.pipeline.Bpe

/** BPE trainer semantics, pinned on the classic corpus from Sennrich
  * et al. 2016 (low/lower/newest/widest) — the merges, their order,
  * their counts, and the deterministic tie-break are all asserted, so
  * any drift in the iterative loop fails here even though the operator
  * has no SQL oracle (iterated argmax + rewrite is not expressible as
  * one DuckDB query).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("applyMerge is greedy left-to-right; overlaps consume left-first") {
    assert(Bpe.applyMerge(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    // consecutive overlap: the first pair wins, the tail survives
    assert(Bpe.applyMerge(Seq("b", "b", "b"), "b", "b") == Seq("bb", "b"))
    assert(Bpe.applyMerge(Seq("a", "b", "b", "c"), "b", "b") ==
      Seq("a", "bb", "c"))
    // no match → unchanged
    assert(Bpe.applyMerge(Seq("x", "y"), "a", "b") == Seq("x", "y"))
  }

  test("train learns the Sennrich merges in order with exact counts") {
    // corpus: low x5, lower x2, newest x6, widest x3 — one doc per
    // occurrence so the vocabulary rollup carries the frequencies
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).toDF("text")
    val merges = Bpe.train(docs, "text", 3)
    // iteration 1: e-s appears in newest(6) + widest(3) = 9; s-t ties
    // at 9 and loses the lexicographic tie-break
    // iteration 2: es-t = 9
    // iteration 3: l-o (7) ties o-w (7) and wins lexicographically
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L)))
  }

  test("train matches the independent golden merge list on the sf0.01 corpus") {
    // cross-engine pin for the rows-only pipe_bpe_train gate: 64 merges
    // (order, symbols, counts) vs tools/gen_bpe_golden.py — a from-
    // scratch python trainer sharing no code with Bpe.scala
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/bpe_golden.json"))
    val golden = try TestJson.parse(src.mkString).asInstanceOf[Map[String, Any]]
    finally src.close()
    val sfDir = golden("sf_dir").asInstanceOf[String]
    val n = golden("n_merges").asInstanceOf[Double].toInt
    val expected = golden("merges").asInstanceOf[List[Any]].map { m =>
      val o = m.asInstanceOf[Map[String, Any]]
      (o("l").asInstanceOf[String], o("r").asInstanceOf[String],
        o("n").asInstanceOf[Double].toLong)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Bpe.train(docs, "text", n).map(m => (m.left, m.right, m.count))
    assert(got.size == expected.size)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"merge ${i + 1} drifted")
    }
  }

  test("tokenCounts applies the learned merges per document") {
    val docs = Seq((1L, "lowest newest"), (2L, "low")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("e", "s", 0), Bpe.Merge("es", "t", 0))
    val out = Bpe.tokenCounts(docs, "text", "doc_id", merges)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    // lowest: l o w est (4), newest: n e w est (4); low: l o w (3)
    assert(out.toSeq == Seq((1L, 8), (2L, 3)))
  }
}
