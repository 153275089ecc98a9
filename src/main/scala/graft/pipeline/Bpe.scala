package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the iterative loop `pipe_bpe_pairs` is one step of.
  *
  * Scale shape (100 TB): the classic reduction makes this tractable —
  * the corpus collapses to (word, count) ONCE (vocabulary-sized, the
  * only corpus-wide shuffle), and every merge iteration then runs over
  * the vocabulary: one map-side-combined pair aggregation + a 1-row
  * argmax to the driver + one narrow typed map applying the merge.
  * The driver state is just the learned merge list (KBs). Iterations
  * cache the symbolized vocabulary and re-cache every few merges so
  * the lineage never deepens unboundedly.
  */
object Bpe {

  /** One learned merge: adjacent (left, right) → left+right. */
  final case class Merge(left: String, right: String, count: Long)

  /** Symbolized vocabulary row (public: Encoder codegen instantiates it). */
  final case class WordSyms(syms: Seq[String], wn: Long)

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
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the one corpus-wide pass: vocabulary with frequencies
    val vocab = docs
      .select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
    var syms: Dataset[WordSyms] = vocab
      .select(expr("filter(split(w, ''), c -> c <> '')").as("syms"), col("wn"))
      .as[WordSyms]
    syms.cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var it = 0
    while (it < numMerges) {
      // pair counts over the vocabulary (map-side combined), then the
      // deterministic argmax: ONE row to the driver
      val top = syms
        // Spark's sequence(1, 0) counts DOWN — single-symbol words
        // must not reach the pair explode at all
        .filter(size(col("syms")) > 1)
        .select(col("wn"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(syms[i - 1] AS l, syms[i] AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("wn")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) it = numMerges
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += m
        val prev = syms
        // narrow typed map — no shuffle; re-cache to keep lineage flat
        syms = prev.map(ws => ws.copy(syms = applyMerge(ws.syms, m.left, m.right)))
        syms.cache()
        syms.count() // materialize before unpersisting the parent
        prev.unpersist()
        it += 1
      }
    }
    syms.unpersist()
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
