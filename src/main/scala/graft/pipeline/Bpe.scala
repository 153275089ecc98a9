package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the iterative loop `pipe_bpe_pairs` is one step of.
  *
  * Scale shape (100 TB): the classic reduction makes this tractable —
  * the corpus collapses to (word, count) ONCE (vocabulary-sized, the
  * only corpus-wide shuffle); the merge loop then runs DRIVER-LOCAL
  * over that table with incrementally-maintained pair counts, because
  * per-merge work is vocabulary-bounded and a Spark job per merge
  * would be pure scheduler floor (~0.2 s × 32k merges ≈ 2 h for KBs
  * of state). Application back to the corpus ([[tokenCounts]]) is the
  * distributed narrow map.
  */
object Bpe {

  /** One learned merge: adjacent (left, right) → left+right. */
  final case class Merge(left: String, right: String, count: Long)

  /** Greedy left-to-right application of one merge to a symbol
    * sequence — upstream BPE semantics (consecutive overlaps consume
    * left-first: a b b with merge (b,b) leaves a b b unchanged only
    * if no adjacent pair matches; a b b c with (b,b) → a bb c).
    */
  private[graft] def applyMerge(
      syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` merge rules from a corpus of documents
    * (`textCol` whitespace-tokenized). Deterministic: ties on pair
    * count break lexicographically, so the rule list is reproducible
    * on any engine and partitioning.
    *
    * Scale split: the CORPUS pass (vocabulary rollup) is the only
    * distributed work — one map-side-combined shuffle regardless of
    * corpus size. The merge LOOP then runs driver-local over the
    * collected (word, count) table: after the rollup the state is
    * vocabulary-sized (MBs at web scale), and running each of a
    * production run's ~32k merges as a Spark job would pay the ~0.2 s
    * scheduler floor per merge (~2 h of pure scheduling) for work that
    * touches kilobytes. Pair counts are maintained INCREMENTALLY (only
    * words containing the merged pair are reindexed), so a merge costs
    * O(affected words), not O(vocabulary).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    // the one corpus-wide pass: vocabulary with frequencies
    val vocab = docs
      .select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainLocal(vocab.toSeq, numMerges)
  }

  /** Driver-local merge loop over a (word, count) vocabulary. Public
    * within graft so the golden-pin harness can drive it with an
    * explicit vocabulary. Result is independent of input order (counts
    * aggregate into a map; the argmax scan breaks ties by (l, r)).
    */
  private[graft] def trainLocal(
      vocab: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words: Array[Array[String]] =
      vocab.map(_._1.split("").filter(_.nonEmpty)).toArray
    val counts: Array[Long] = vocab.map(_._2).toArray
    val pairN = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val n = pairN.getOrElse(p, 0L) + sign * counts(i)
        if (n == 0L) pairN.remove(p) else pairN(p) = n
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
      if (sign < 0) {
        var j2 = 0
        while (j2 + 1 < s.length) {
          val p = (s(j2), s(j2 + 1))
          pairWords.get(p).foreach { ws =>
            ws -= i; if (ws.isEmpty) pairWords.remove(p)
          }
          j2 += 1
        }
      }
    }
    words.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[Merge]
    var it = 0
    while (it < numMerges && pairN.nonEmpty) {
      // deterministic argmax: highest count, ties break on (l, r) —
      // the same ORDER BY n DESC, l, r the distributed loop ran
      var best: ((String, String), Long) = null
      for (e <- pairN) {
        if (best == null || e._2 > best._2 ||
          (e._2 == best._2 &&
            (e._1._1 < best._1._1 ||
              (e._1._1 == best._1._1 && e._1._2 < best._1._2)))) best = e
      }
      val ((l, r), n) = best
      merges += Merge(l, r, n)
      // reindex ONLY the words that contain the merged pair
      val affected = pairWords.getOrElse((l, r), mutable.Set.empty).toArray
      java.util.Arrays.sort(affected)
      for (i <- affected) {
        addWord(i, -1L)
        words(i) = applyMerge(words(i).toSeq, l, r).toArray
        addWord(i, 1L)
      }
      it += 1
    }
    merges.toSeq
  }

  /** Tokenize a corpus with a learned merge list: token counts per
    * document under the subword vocabulary (the compression the merges
    * bought). Merges broadcast as plain driver state; application is
    * the same narrow map, run once over the corpus.
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = merges.map(m => (m.left, m.right))
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val n = t.split(" ").iterator.filter(_.nonEmpty).map { w =>
          var s: Seq[String] = w.split("").toSeq.filter(_.nonEmpty)
          rules.foreach { case (l, r) => s = applyMerge(s, l, r) }
          s.length
        }.sum
        (id, n)
      }
      .toDF("id", "bpe_tokens")
  }
}
