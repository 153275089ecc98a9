package graft

import org.apache.spark.sql.functions._

import graft.queries.QueriesPipeline5

/** Semantics behind `pipe_cdc_dedup`: the content-defined chunker's
  * defining property is SHIFT ROBUSTNESS — boundaries depend only on
  * a 4-token local window, so a single-token insertion re-chunks the
  * chunk it lands in and nothing else, where a fixed 16-token grid
  * shifts every downstream block. All generated cases ride ONE
  * DataFrame per test (each ScalaCheck-style case as a row group), so
  * the property sweep costs one Spark job, not one per case.
  */
class CdcChunkingSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-corpus: `n` tokens from a small vocabulary
    * (repetition makes chunk-level duplication realistic).
    */
  private def tokens(seed: Long, n: Int): Vector[String] = {
    val rnd = new scala.util.Random(seed)
    Vector.fill(n)(s"w${rnd.nextInt(97)}")
  }

  private def chunkDigests(docs: Seq[(Long, String)]): Map[Long, Seq[String]] =
    QueriesPipeline5.cdcChunks(docs.toDF("doc_id", "text"))
      .groupBy($"doc_id").agg(sort_array(collect_list($"digest")).as("ds"))
      .as[(Long, Seq[String])].collect().toMap

  private def preserved(a: Seq[String], b: Seq[String]): Int = {
    // multiset intersection size
    val bc = scala.collection.mutable.Map.empty[String, Int]
    b.foreach(d => bc(d) = bc.getOrElse(d, 0) + 1)
    a.count { d =>
      val c = bc.getOrElse(d, 0)
      if (c > 0) { bc(d) = c - 1; true } else false
    }
  }

  test("single-token insertion re-chunks only the edited neighborhood (50 cases, one job)") {
    val cases = (0 until 50).map { k =>
      val toks = tokens(seed = 1000 + k, n = 300 + 7 * k)
      val at = 50 + (k * 13) % 200
      val edited = (toks.take(at) :+ s"INS$k") ++ toks.drop(at)
      (k, toks.mkString(" "), edited.mkString(" "))
    }
    val docs = cases.flatMap { case (k, orig, edit) =>
      Seq((2L * k, orig), (2L * k + 1, edit))
    }
    val byDoc = chunkDigests(docs)
    cases.foreach { case (k, _, _) =>
      val a = byDoc(2L * k)
      val b = byDoc(2L * k + 1)
      val kept = preserved(a, b)
      // only the ≤4 hash windows covering the inserted token can
      // change a boundary, so at most ~4 chunks around the edit are
      // disturbed — bounded by the WINDOW, not the document
      assert(kept >= a.size - 5,
        s"case $k: only $kept of ${a.size} chunks preserved")
      assert(math.abs(b.size - a.size) <= 4,
        s"case $k: chunk count moved ${a.size} -> ${b.size}")
    }
  }

  test("fixed 16-token grid loses the downstream half on the same edit; CDC does not") {
    val toks = tokens(seed = 7, n = 640)
    val edited = (toks.take(320) :+ "INSERTED") ++ toks.drop(320)
    val docs = Seq((0L, toks.mkString(" ")), (1L, edited.mkString(" ")))
    val cdc = chunkDigests(docs)
    val cdcKept = preserved(cdc(0L), cdc(1L))

    // the blockDedup grid, digested the same way
    val grid = docs.toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ", -1).as("t"))
      .select($"doc_id",
        explode(expr("sequence(0, cast(ceil(size(t) / 16.0) as int) - 1)")).as("i"),
        $"t")
      .select($"doc_id", md5(expr("array_join(slice(t, i * 16 + 1, 16), ' ')")).as("digest"))
      .groupBy($"doc_id").agg(sort_array(collect_list($"digest")).as("ds"))
      .as[(Long, Seq[String])].collect().toMap
    val gridKept = preserved(grid(0L), grid(1L))

    assert(cdcKept >= cdc(0L).size - 5, s"CDC kept $cdcKept of ${cdc(0L).size}")
    // mid-document insertion shifts every downstream 16-token block:
    // the grid can keep at most the prefix (~half) plus hash luck
    assert(gridKept <= grid(0L).size * 6 / 10,
      s"grid kept $gridKept of ${grid(0L).size} — expected the downstream half lost")
    assert(cdcKept.toDouble / cdc(0L).size > gridKept.toDouble / grid(0L).size)
  }

  test("chunks partition the document exactly (token counts reassemble)") {
    val docs = (0 until 8).map(k => (k.toLong, tokens(seed = 40 + k, n = 30 * (k + 1)).mkString(" ")))
    val sums = QueriesPipeline5.cdcChunks(docs.toDF("doc_id", "text"))
      .groupBy($"doc_id").agg(sum($"n_tok").as("n"), count(lit(1)).as("chunks"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    docs.foreach { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      assert(sums(id)._1 == n, s"doc $id: chunk tokens ${sums(id)._1} != $n")
      assert(sums(id)._2 >= 1L)
    }
  }

  test("shared suffix across different documents yields shared chunk digests") {
    val shared = tokens(seed = 99, n = 400)
    val a = tokens(seed = 1, n = 120) ++ shared
    val b = tokens(seed = 2, n = 57) ++ shared
    val byDoc = chunkDigests(Seq((0L, a.mkString(" ")), (1L, b.mkString(" "))))
    val common = preserved(byDoc(0L), byDoc(1L))
    // boundaries re-sync within one 4-token window of the splice, so
    // nearly all of the ~25 shared-region chunks align; 15 is a
    // conservative floor (chunk sizes are geometric around 16)
    assert(common >= 15, s"only $common shared chunk digests")
  }

  test("pipe_cdc_dedup flags the cloned paragraph corpus-wide (sf0.001)") {
    val out = QueriesPipeline5.cdcDedup.run(spark, "/root/testdata/sf0.001")
    val rows = out.select($"doc_id", $"n_chunks", $"n_dup_chunks", $"dup_ppm").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (n, dup, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dup <= n)
      assert(ppm == dup * 1000000L / n)
    }
  }
}
