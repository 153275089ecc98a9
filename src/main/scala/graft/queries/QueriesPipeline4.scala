package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Training-data pipeline operators, part 4: domain mixture sampling,
  * hashed-linear quality classification, and product-quantization ANN.
  *
  * Scale notes (100 TB):
  *   - domain mixture reduces the corpus to a SOURCE-sized summary
  *     table (dozens of rows), broadcasts the derived per-source rates
  *     back, and keeps/drops with one codegen hash filter — the corpus
  *     is scanned twice (stats, filter), shuffled never;
  *   - the quality classifier is a hashed-feature linear model: the
  *     "model" is a pure expression over the token hash, so scoring is
  *     an in-row projection plus ONE doc_id-keyed count/sum shuffle —
  *     no weight table is joined at all (feature hashing is exactly
  *     what makes fastText-style filters tractable at corpus scale);
  *   - PQ assignment broadcasts the codebook (M × k sub-centroids, KBs
  *     even for production k = 256) and reduces per (vec, subspace)
  *     with a partial-aggregable min_by argmin; the asymmetric-distance
  *     scan against a query is then a LOOKUP-TABLE sum — the memory
  *     shape that lets 100 TB of float vectors fit as 16-byte codes.
  *
  * Cross-engine determinism follows the [[Det]] playbook: weights,
  * targets, and rates are exact integers (sqrt → ×1e6 → floor is one
  * identical IEEE op before integerization); classifier logits divide
  * exact integer sums; PQ distances fold sub-vector lists sequentially
  * in both engines and ties break on the centroid id.
  */
object QueriesPipeline4 extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** DOMAIN MIXTURE sampling: temperature-weighted per-source rates
    * (w_s ∝ n_tokens_s^0.5, the standard α = 0.5 up/down-sampling that
    * flattens a source-skewed corpus), a global budget of half the
    * corpus, and deterministic hash-of-id keep decisions. Every
    * intermediate is integerized (ppm) so both engines agree exactly:
    * re-running reproduces the same mixture with no RNG state.
    */
  val domainMixture: Q = q(
    "pipe_domain_mixture",
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT *, CAST(FLOOR(sqrt(n_tokens) * 1000000) AS BIGINT) AS weight FROM s),
      |tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS tot_w,
      |               CAST(SUM(n_docs) AS BIGINT) // 2 AS budget FROM w),
      |r AS (
      |  SELECT w.*, (w.weight * tot.budget) // tot.tot_w AS target,
      |    LEAST(1000000, ((w.weight * tot.budget) // tot.tot_w) * 1000000 // w.n_docs) AS rate_ppm
      |  FROM w CROSS JOIN tot),
      |k AS (
      |  SELECT d.source,
      |    CAST(SUM(CASE WHEN
      |        CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000
      |          < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |  FROM documents d JOIN r ON d.source = r.source
      |  GROUP BY d.source)
      |SELECT r.source, r.n_docs, r.n_tokens, r.weight, r.target, r.rate_ppm, k.n_kept
      |FROM r JOIN k ON r.source = k.source
      |ORDER BY r.source""".stripMargin
  ) { td =>
    val docs = td.documents
    val s = docs
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ", -1)).cast("long")).as("n_tokens"))
    val w = s.withColumn("weight",
      floor(sqrt(col("n_tokens")) * 1000000L).cast("long"))
    val tot = w.agg(sum(col("weight")).as("tot_w"),
      (sum(col("n_docs")) / 2).cast("long").as("budget"))
    val r = w.crossJoin(broadcast(tot))
      .withColumn("target", expr("(weight * budget) div tot_w"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(target * 1000000L) div n_docs")))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target"), col("rate_ppm"))
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 1000000L
    val k = docs
      .join(broadcast(r.select(col("source"), col("rate_ppm"))), "source")
      .groupBy(col("source"))
      .agg(sum(when(bucket < col("rate_ppm"), 1L).otherwise(0L)).as("n_kept"))
    r.join(k, "source").orderBy("source")
  }

  /** QUALITY CLASSIFIER (hashed linear model, fastText-style): each
    * token hashes to one of 4096 feature buckets whose weight is a
    * deterministic integer in [-500, 500] (a Knuth multiplicative mix
    * of the bucket id — standing in for trained weights, which a real
    * pipeline would derive the same in-expression way from a broadcast
    * array). Doc score = Σ w / (100 · n_tokens), kept above sigmoid
    * 0.5. Model-based filtering is the curation stage heuristic
    * length/stopword scores (pipe_quality_score) cannot replace.
    */
  val qualityClassifier: Q = q(
    "pipe_quality_classifier",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    (CAST('0x' || substr(md5(term), 1, 4) AS BIGINT) % 4096) AS b
      |  FROM toks),
      |scored AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM((b * 2654435761) % 1001 - 500) AS BIGINT) AS w_sum
      |  FROM f GROUP BY doc_id)
      |SELECT doc_id, n_tokens, w_sum,
      |  ROUND(1.0 / (1.0 + exp(-(CAST(w_sum AS DOUBLE) / (100.0 * n_tokens)))), 6) AS prob,
      |  (CAST(w_sum AS DOUBLE) / (100.0 * n_tokens)) > 0.0 AS keep
      |FROM scored ORDER BY doc_id""".stripMargin
  ) { td =>
    val b = conv(substring(md5(col("term")), 1, 4), 16, 10)
      .cast("long") % 4096L
    val logit = col("w_sum").cast("double") / (lit(100.0) * col("n_tokens"))
    td.documents
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))
      .select(col("doc_id"), ((b * 2654435761L) % 1001L - 500L).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("w_sum"))
      .select(col("doc_id"), col("n_tokens"), col("w_sum"),
        round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("prob"),
        (logit > 0.0).as("keep"))
      .orderBy("doc_id")
  }

  /** PRODUCT QUANTIZATION: 64-dim embeddings split into M = 4
    * sub-spaces of 16 dims; each sub-vector is assigned to the nearest
    * of k = 4 sub-centroids (L2², argmin, ties to the lower centroid
    * id), giving a 4-byte code per vector. The asymmetric distance to
    * a query (vec_id 100) is then the fixed-order sum of the four
    * query-to-assigned-centroid sub-distances — the table-lookup scan
    * PQ exists for. Centroids are the sub-vectors of vec_id < 4 (a
    * deterministic seed; production uses trained sub-codebooks).
    */
  val pqAnn: Q = q(
    "pipe_pq_ann",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sub AS (
      |  SELECT vec_id, m, (v)[m * 16 + 1 : m * 16 + 16] AS sv
      |  FROM e, LATERAL (SELECT unnest([0, 1, 2, 3]) AS m) t),
      |cent AS (SELECT vec_id AS cid, m, sv AS cv FROM sub WHERE vec_id < 4),
      |d AS (
      |  SELECT s.vec_id, s.m, c.cid,
      |    list_sum(list_transform(list_zip(s.sv, c.cv), z -> (z[1] - z[2]) ** 2)) AS dist,
      |    row_number() OVER (PARTITION BY s.vec_id, s.m
      |      ORDER BY list_sum(list_transform(list_zip(s.sv, c.cv), z -> (z[1] - z[2]) ** 2)), c.cid) AS rn
      |  FROM sub s JOIN cent c ON s.m = c.m),
      |codes AS (SELECT vec_id, m, cid FROM d WHERE rn = 1),
      |qd AS (
      |  SELECT c.m, c.cid,
      |    list_sum(list_transform(list_zip(q.sv, c.cv), z -> (z[1] - z[2]) ** 2)) AS qdist
      |  FROM cent c JOIN (SELECT m, sv FROM sub WHERE vec_id = 100) q ON q.m = c.m),
      |adc AS (
      |  SELECT codes.vec_id, codes.m, codes.cid, qd.qdist
      |  FROM codes JOIN qd ON codes.m = qd.m AND codes.cid = qd.cid)
      |SELECT vec_id,
      |  CAST(MAX(CASE WHEN m = 0 THEN cid END) AS BIGINT) AS code0,
      |  CAST(MAX(CASE WHEN m = 1 THEN cid END) AS BIGINT) AS code1,
      |  CAST(MAX(CASE WHEN m = 2 THEN cid END) AS BIGINT) AS code2,
      |  CAST(MAX(CASE WHEN m = 3 THEN cid END) AS BIGINT) AS code3,
      |  ROUND(MAX(CASE WHEN m = 0 THEN qdist END) + MAX(CASE WHEN m = 1 THEN qdist END)
      |    + MAX(CASE WHEN m = 2 THEN qdist END) + MAX(CASE WHEN m = 3 THEN qdist END), 6) AS approx_l2
      |FROM adc GROUP BY vec_id ORDER BY vec_id""".stripMargin
  ) { td =>
    def l2(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
    val e = td.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val sub = e
      .select(col("vec_id"), explode(expr("sequence(0, 3)")).as("m"), col("v"))
      .select(col("vec_id"), col("m"),
        expr("slice(v, m * 16 + 1, 16)").as("sv"))
    val cent = sub.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("m").as("cm"), col("sv").as("cv"))
    val codes = sub
      .join(broadcast(cent), col("m") === col("cm"))
      .withColumn("dist", l2("sv", "cv"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))
    val qd = cent
      .join(broadcast(sub.filter(col("vec_id") === 100)
        .select(col("m").as("qm"), col("sv").as("qv"))), col("cm") === col("qm"))
      .withColumn("qdist", l2("qv", "cv"))
      .select(col("cm").as("m"), col("cid"), col("qdist"))
    def codeAt(m: Int) =
      max(when(col("m") === m, col("cid"))).cast("long").as(s"code$m")
    def qdAt(m: Int) = max(when(col("m") === m, col("qdist")))
    codes
      .join(broadcast(qd), Seq("m", "cid"))
      .groupBy(col("vec_id"))
      .agg(codeAt(0), codeAt(1), codeAt(2), codeAt(3),
        round(qdAt(0) + qdAt(1) + qdAt(2) + qdAt(3), 6).as("approx_l2"))
      .orderBy("vec_id")
  }

  /** ADAPTIVE quality gate: keep documents above the global 20th
    * PERCENTILE of the quality score — the "keep the top 80 %"
    * curation rule, where the threshold is learned from the corpus
    * itself rather than fixed (the [[QueriesPipeline2.qualityScore]]
    * sibling uses a constant).
    *
    * Scale shape (100 TB): exact percentiles over a continuous column
    * would need a global sort (or an unbounded value→count map, which
    * is what Spark's exact `percentile` builds), so the operator
    * quantizes the score to 2 decimals and computes the EXACT
    * percentile of the quantized distribution from a histogram rollup:
    * one groupBy over a BOUNDED key space (score range / 0.01 buckets
    * — thousands of rows at any corpus size), one single-partition
    * window over that tiny histogram for the cumulative rank, and the
    * threshold broadcasts back for the keep/drop filter. Corpus scanned
    * twice, shuffled never. Same discipline as the domain-mixture
    * summary table; DuckDB replays the identical rank arithmetic (the
    * discrete inverse-CDF: smallest quantized score whose cumulative
    * count exceeds ⌊0.2·(n−1)⌋).
    */
  val qualityPercentileFilter: Q = q(
    "pipe_quality_percentile",
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    round(n_chars * 0.01 + len(string_split(text, ' ')) * 0.1
      |      - ((length(text) - length(replace(text, ' the ', ''))) / 5) * 0.5,
      |      2) AS s
      |  FROM documents),
      |hist AS (SELECT s, COUNT(*) AS c FROM scored GROUP BY s),
      |cum AS (
      |  SELECT s, SUM(c) OVER (ORDER BY s) AS cum,
      |    SUM(c) OVER () AS n FROM hist),
      |thr AS (
      |  SELECT MIN(s) AS threshold FROM cum
      |  WHERE cum > CAST(FLOOR(0.2 * (n - 1)) AS BIGINT))
      |SELECT lang, COUNT(*) AS n_kept,
      |  CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_score,
      |  MAX(t.threshold) AS threshold
      |FROM scored, thr t WHERE s >= t.threshold
      |GROUP BY lang ORDER BY lang""".stripMargin
  ) { td =>
    val stop = (length(col("text")) - length(regexp_replace(col("text"),
      java.util.regex.Pattern.quote(" the "), ""))) / 5
    val score = round(col("n_chars") * 0.01 +
      size(split(col("text"), " ", -1)) * 0.1 - stop * 0.5, 2)
    val scored = td.documents.select(col("doc_id"), col("lang"),
      score.as("s"))
    val hist = scored.groupBy(col("s")).agg(count(lit(1)).as("c"))
    // threshold via ONE 1-row aggregate: the histogram (bounded by the
    // score vocabulary, never data-sized) packs into a sorted array and
    // a linear fold finds the smallest score whose cumulative count
    // clears the 20th-percentile rank — no unpartitioned WindowExec,
    // same single-reduce boundedness
    val thr = hist
      .agg(sort_array(collect_list(struct(col("s"), col("c")))).as("h"))
      .select(expr(
        """aggregate(
          |  h,
          |  struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS DOUBLE) AS thr,
          |         aggregate(h, CAST(0 AS BIGINT), (a, x) -> a + x.c) AS n),
          |  (a, x) -> struct(
          |    a.cum + x.c,
          |    CASE WHEN a.thr IS NULL
          |           AND a.cum + x.c > CAST(FLOOR(0.2 * (a.n - 1)) AS BIGINT)
          |         THEN x.s ELSE a.thr END,
          |    a.n),
          |  a -> a.thr)""".stripMargin).as("threshold"))
    scored.crossJoin(broadcast(thr))
      .filter(col("s") >= col("threshold"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        (sum(col("s").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("avg_score"),
        max(col("threshold")).as("threshold"))
      .orderBy("lang")
  }

  override def queries: Seq[Q] =
    Seq(domainMixture, qualityClassifier, pqAnn, qualityPercentileFilter)
}
