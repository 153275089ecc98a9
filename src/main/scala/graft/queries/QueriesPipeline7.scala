package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Training-data pipeline operators, part 7: DSIR-style importance
  * resampling (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling" — hashed n-gram features, target/raw
  * bucket distributions, per-document log importance weights) and a
  * unigram-entropy quality signal.
  *
  * Scale notes (100 TB):
  *   - The DSIR model is a BUCKET HISTOGRAM (B = 128 hashed-feature
  *     buckets): the target and raw feature distributions collapse to
  *     one B-row table in a single map-side-combined aggregation over
  *     the corpus (per-(bucket, source) counts — the target histogram
  *     and the min(source) target choice derive from that tiny frame,
  *     NOT from second scans), then MATERIALIZED next to the corpus
  *     ([[Fixtures.materialized]]) and BROADCAST back for the
  *     per-document weight join: the model is corpus metadata built
  *     once, and every re-weighting query (weights, selection report)
  *     reads it instead of re-deriving it. Nothing document-sized ever
  *     shuffles — the same broadcast-back-summary shape as
  *     decontaminate and the quality percentile.
  *   - Features are hashed occurrences (unigrams + bigrams, md5-bucket
  *     mod B), so the feature space is CONSTANT regardless of corpus
  *     vocabulary — the property that makes DSIR run where an exact
  *     n-gram LM wouldn't.
  *   - Unigram entropy is one groupBy(doc, token) + one groupBy(doc) —
  *     both keyed on doc_id, so AQE coalesces them onto the same
  *     exchange; constant state per document.
  */
object QueriesPipeline7 extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  private val B = 128

  /** md5-derived feature bucket, 0..B-1 (first hex byte mod B) —
    * deterministic across engines, the same nibble arithmetic the
    * fingerprint/simhash entries pin.
    */
  private def bucketCol(f: org.apache.spark.sql.Column) =
    (conv(substring(md5(f), 1, 2), 16, 10).cast("int") % B)

  private def oracleBucket(f: String): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5($f), $i, 1)) - 1)"
    s"((${nib(1)} * 16 + ${nib(2)}) % $B)"
  }

  /** Per-doc hashed features: every unigram occurrence + every bigram
    * occurrence ("w1 w2"). Bigrams guard the 1-token doc (Spark's
    * sequence(1, 0) would DESCEND).
    */
  private def docFeatures(td: Testdata): DataFrame =
    td.documents
      .select(col("doc_id"), col("source"),
        split(col("text"), " ", -1).as("t"))
      .select(col("doc_id"), col("source"), explode(concat(
        col("t"),
        when(size(col("t")) >= 2, expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
          .otherwise(array().cast("array<string>")))).as(Seq("f")))

  private val oracleFeatures =
    """feats AS (
      |  SELECT doc_id, source, w AS f
      |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  UNION ALL
      |  SELECT doc_id, source, t[i] || ' ' || t[i + 1] AS f
      |  FROM (SELECT doc_id, source, string_split(text, ' ') AS t
      |        FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s)""".stripMargin

  // the target domain: the lexicographically first source — stable at
  // any scale factor, no magic constant tied to one generation
  private val oracleTarget = "(SELECT MIN(source) FROM documents)"

  private def oracleWeights: String =
    s"""WITH $oracleFeatures,
       |tgt AS (SELECT $oracleTarget AS src),
       |hist AS (
       |  SELECT ${oracleBucket("f")} AS b,
       |    COUNT(*) AS raw_c,
       |    SUM(CASE WHEN source = (SELECT src FROM tgt) THEN 1 ELSE 0 END) AS tgt_c
       |  FROM feats GROUP BY 1),
       |tot AS (SELECT SUM(raw_c) AS nr, SUM(tgt_c) AS nt FROM hist),
       |ratio AS (
       |  SELECT b, ln(((tgt_c + 1.0) * (nr + $B)) / ((raw_c + 1.0) * (nt + $B)))
       |    AS lr
       |  FROM hist CROSS JOIN tot),
       |w AS (
       |  SELECT f.doc_id, f.source, COUNT(*) AS n_feats,
       |    ROUND(SUM(r.lr), 6) AS weight
       |  FROM feats f JOIN ratio r ON r.b = ${oracleBucket("f.f")}
       |  GROUP BY f.doc_id, f.source)""".stripMargin

  /** The B-row log-likelihood-ratio model, built ONCE per corpus and
    * stored beside it ([[Fixtures.materialized]]) — the deployment
    * shape the scale note above describes: the model is corpus-derived
    * metadata, and both DSIR queries re-weight on read instead of each
    * re-deriving it. The build itself is ONE corpus aggregation per
    * (b, source): the target source (lexicographic min), the per-b
    * target counts, and the raw/target totals all derive from that
    * ≤B×|sources| frame via unpartitioned windows — neither the
    * min(source) scalar agg nor the target histogram is a second
    * corpus pass.
    */
  private def ratioModel(s: SparkSession, dir: String): DataFrame =
    Fixtures.materialized(s, dir, "dsir_ratio", "b", parts = 1) {
      val bySrc = docFeatures(Testdata(s, dir))
        .withColumn("b", bucketCol(col("f")))
        .groupBy(col("b"), col("source"))
        .agg(count(lit(1)).as("c"))
      val wAll = Window
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      bySrc
        .withColumn("src", min(col("source")).over(wAll))
        .groupBy(col("b"))
        .agg(sum(col("c")).as("raw_c"),
          sum(when(col("source") === col("src"), col("c")).otherwise(0L))
            .as("tgt_c"))
        .withColumn("nr", sum(col("raw_c")).over(wAll))
        .withColumn("nt", sum(col("tgt_c")).over(wAll))
        .select(col("b"), log(
          ((col("tgt_c") + lit(1.0)) * (col("nr") + lit(B))) /
            ((col("raw_c") + lit(1.0)) * (col("nt") + lit(B)))).as("lr"))
    }

  /** Per-doc log importance weights over the stored broadcast model. */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame =
    docFeatures(Testdata(s, dir)).withColumn("b", bucketCol(col("f")))
      .join(broadcast(ratioModel(s, dir)), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      // Det playbook note (`round` of a double sum): the per-doc sum
      // accumulates ≤ a-few-hundred lr terms, each |lr| < ln(nr + B)
      // ≈ 20, in partition order — vs DuckDB's own order. The orders
      // differ by ≤ n·ε·Σ|lr| ≈ 1e3 · 2e-16 · 2e4 ≈ 4e-9, so round-6
      // flips only if the true sum sits within ~4e-9 of a .5e-6
      // boundary — ln-of-rational operands make an exact tie
      // measure-zero (the perplexity precedent), and unlike entropy
      // the weight is legitimately signed, so no -0.0 clamp applies:
      // a -0.0 would need the sum to be EXACTLY zero, impossible for
      // a nonempty doc since every lr term is an ln of a ratio ≠ 1
      // (tgt_c+1 ≠ raw_c+1 scaled — the +1/+B smoothing de-rationalizes
      // equal counts only when nt == nr, i.e. a single-source corpus,
      // where lr ≡ ln(1) = +0.0 exactly and both engines agree).
      .agg(count(lit(1)).as("n_feats"), round(sum(col("lr")), 6).as("weight"))

  /** DSIR importance weights: the 100 most target-like documents.
    * The resampler's raw material — `weight` is the hashed-n-gram
    * log-likelihood ratio target vs raw.
    */
  val dsirWeightsQ: Q = Q(
    "pipe_dsir_weights",
    (s, dir) => dsirWeights(s, dir)
      .select(col("doc_id"), col("source"), col("n_feats"), col("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(100),
    Some(s"""$oracleWeights
       |SELECT doc_id, source, CAST(n_feats AS BIGINT) AS n_feats, weight
       |FROM w ORDER BY weight DESC, doc_id LIMIT 100""".stripMargin))

  /** DSIR selection summary: per source, how many documents the
    * weight>0 rule keeps — the mixture-shift report a curation run
    * reads before committing to a resample (the target domain should
    * dominate; contaminated look-alike domains surface here).
    */
  val dsirSelect: Q = Q(
    "pipe_dsir_select",
    (s, dir) => dsirWeights(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("weight") > 0, 1L).otherwise(0L)).as("n_selected"))
      .orderBy("source"),
    Some(s"""$oracleWeights
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN weight > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_selected
       |FROM w GROUP BY source ORDER BY source""".stripMargin))

  /** Unigram entropy per document — the token-diversity quality signal
    * (low entropy = repetitive/templated text; filters of this family
    * sit next to the repetition and perplexity gates).
    */
  val unigramEntropy: Q = q(
    "pipe_unigram_entropy",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w),
      |n AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id)
      |SELECT cnt.doc_id, CAST(MAX(n.n) AS BIGINT) AS n_tokens,
      |  GREATEST(0, ROUND(-SUM((c / n.n) * ln(c / n.n)), 6)) AS entropy
      |FROM cnt JOIN n ON n.doc_id = cnt.doc_id
      |GROUP BY cnt.doc_id ORDER BY cnt.doc_id""".stripMargin
  ) { td =>
    // doc total via a window over the SAME doc_id key the final rollup
    // groups on — one exchange end to end (a join formulation shuffles
    // both sides and re-exchanges)
    val w = Window.partitionBy(col("doc_id"))
    td.documents
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(w))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"),
        // GREATEST(0, …) on both sides: a single-distinct-token doc
        // sums to an IEEE -0.0 (and fp noise to -1e-17 → -0.0 after
        // round), whose sign DuckDB's ROUND preserves and Spark's
        // drops — a latent cross-engine hash flip; entropy is ≥ 0 by
        // definition, so the clamp is semantics, not a fudge
        greatest(lit(0.0),
          round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 6))
          .as("entropy"))
      .orderBy("doc_id")
  }

  override def queries: Seq[Q] =
    Seq(dsirWeightsQ, dsirSelect, unigramEntropy)
}
