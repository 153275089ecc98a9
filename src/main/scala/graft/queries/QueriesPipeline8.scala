package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Training-data pipeline operators, part 8: corpus-level source
  * auditing — the cross-SOURCE contamination matrix and per-source
  * vocabulary statistics a curation run reads before fixing a mixture
  * (the reference's pipeline ends at per-document signals; these are
  * the corpus-level rollups built on the same shingle/token frames).
  *
  * Scale notes (100 TB):
  *   - The source-overlap matrix never joins document-sized sides: the
  *     corpus rolls up per GRAM to a source SET (collect_set dedups,
  *     so no separate DISTINCT pass) whose size is bounded by the
  *     source catalog (a fixed deployment property, like the label
  *     space), and pairs explode from those ≤|sources| sets —
  *     C(|sources|, 2) output rows total, one gram-keyed exchange end
  *     to end shared by the pair counts AND the per-source totals
  *     (ReusedExchange). A gram-keyed SELF-join would
  *     carry the same information but square the hot stop-grams;
  *     the set rollup caps them at one row each. With a large source
  *     catalog (thousands), the standard practice this operator
  *     inherits is to pre-filter grams by document frequency (drop
  *     df > threshold) before the rollup — the matrix is about
  *     distinctive overlap, and the filter is one map-side predicate.
  *   - Vocabulary stats are two stacked aggregations on one
  *     (source, token) exchange: the distinct-token counting happens
  *     in the first groupBy (map-side combinable), so no count_distinct
  *     expand and nothing wider than the vocabulary ever shuffles.
  *     The mergeable-sketch twin for approximate type counts at
  *     extreme cardinality is `pipe_distinct_sketch`.
  */
object QueriesPipeline8 extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** Per-gram source sets over the corpus 3-gram shingles: collect_set
    * dedups, so no separate DISTINCT pass — ONE gram-keyed exchange
    * carries both downstream branches (pair counts and per-source
    * totals share this subtree via ReusedExchange).
    */
  private def gramSourceSets(td: Testdata): DataFrame =
    td.documents
      .withColumn("toks", split(col("text"), " ", -1))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
      )).as("gram"))
      .groupBy(col("gram"))
      .agg(collect_set(col("source")).as("ss"))

  private val oracleSourceGrams =
    """g AS (
      |  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
      |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
      |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s)"""
      .stripMargin

  /** Cross-source contamination matrix: pairwise 3-gram Jaccard
    * between sources — the audit a curation run reads to find
    * look-alike domains before trusting a mixture (DSIR's
    * selection report surfaces WHERE weight mass lands; this says
    * WHY: which sources share surface text).
    */
  val sourceOverlap: Q = q(
    "pipe_source_overlap",
    s"""WITH $oracleSourceGrams,
       |per AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
       |inter AS (
       |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
       |  ROUND(n_common / (pa.n + pb.n - n_common), 6) AS jaccard
       |FROM inter
       |JOIN per pa ON pa.source = src_a
       |JOIN per pb ON pb.source = src_b
       |ORDER BY src_a, src_b""".stripMargin
  ) { td =>
    val sets = gramSourceSets(td)
    // per-source distinct gram counts, derived from the SAME sets
    // frame (a gram counts once per source it appears in): a
    // |sources|-row broadcast side sharing the gram exchange
    val per = sets.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    // i<j pair explode from each gram's source SET (bounded by the
    // source catalog) — the self-join-free intersection count
    val pairs = sets
      .filter(size(col("ss")) >= 2)
      .withColumn("ss", sort_array(col("ss")))
      .select(explode(expr(
        """flatten(transform(ss, (x, i) ->
          |  transform(slice(ss, i + 2, size(ss)), y ->
          |    struct(x AS src_a, y AS src_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    // both totals from ONE broadcast source→n map (r20; two aliased
    // broadcast joins built two hash relations, each recomputing the
    // per-aggregation — one broadcast-build job each): pair endpoints
    // come FROM the source sets, so the lookups can never miss
    val perMap = per.agg(
      map_from_entries(collect_list(struct(col("source"), col("n"))))
        .as("__per"))
    pairs
      .crossJoin(broadcast(perMap))
      // long / long is true division (double) in BOTH engines, on the
      // same integer operands — IEEE-identical before the round
      .withColumn("na", element_at(col("__per"), col("src_a")))
      .withColumn("nb", element_at(col("__per"), col("src_b")))
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(col("n_common") / (col("na") + col("nb") - col("n_common")), 6)
          .as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** MinHash components per source-signature (the sketch twin's
    * accuracy knob: estimator std ≈ √(J(1−J)/K) ≈ 0.09 at J = 0.5 —
    * the ranking signal a contamination audit needs; the hash chain is
    * md5-deterministic, so the oracle reproduces it bit-exactly).
    */
  private val K = 32

  /** Sketch twin of [[sourceOverlap]]: per-source K-component MinHash
    * signatures instead of gram sets — at extreme gram cardinality the
    * exact matrix's per-gram rollup still moves every distinct gram
    * once, while this moves K hashes per source, period. Same
    * estimator family as `pipe_minhash_lsh` (doc-level) lifted to the
    * corpus level; agreement fraction estimates Jaccard.
    */
  val sourceOverlapSketch: Q = q(
    "pipe_source_overlap_sketch",
    s"""WITH g AS (
       |  SELECT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
       |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
       |    LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) s),
       |mh AS (
       |  SELECT source, seed, MIN(md5(seed || ':' || gram)) AS m
       |  FROM g CROSS JOIN (SELECT unnest(range($K)) AS seed)
       |  GROUP BY source, seed),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    COUNT(*) AS agree
       |  FROM mh a JOIN mh b
       |    ON a.seed = b.seed AND a.m = b.m AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, CAST(agree AS BIGINT) AS agree,
       |  ROUND(agree / $K, 6) AS est_jaccard
       |FROM pairs ORDER BY src_a, src_b""".stripMargin
  ) { td =>
    // md5 ONCE PER DISTINCT GRAM (r19): MIN(md5(k:gram)) over a
    // source's gram OCCURRENCES equals the MIN over its DISTINCT grams
    // (md5 is pure; duplicates never move MIN), and distinct grams are
    // ~10× rarer than occurrences (sf0.1: 27 213 vs 260 704, and the
    // Zipf head only grows that ratio with corpus size) — so the
    // kernel rolls grams up to their source SET first (the exact
    // matrix's pinned shape: partial-agg dedup map-side, every
    // distinct gram moves once), hashes each distinct gram K times
    // AFTER the exchange (naturally core-spread — this replaced the
    // explicit repartition; the scan side is core-count-wide from the
    // stored layout), re-explodes the bounded source set, and takes
    // the per-source MIN map-side. The K min(...) columns stay one
    // codegen'd aggregation (a higher-order transform would run
    // interpreted at 3× the cpu — r18 measurement, still binding).
    // Same exchange count as the occurrence-level form, ~10× fewer
    // md5s: isolated compute 6.29 → 0.15 s, wall 6.85 → 1.42 s (r19;
    // the compute drop exceeds the 9.6× dedup ratio because the
    // repartition's full-text serialization went with it).
    val hashCols = (0 until K).map(k =>
      md5(concat(lit(s"$k:"), col("gram"))).as(s"h$k"))
    val minAggs = (0 until K).map(k => min(col(s"h$k")).as(s"m$k"))
    val sig = td.documents
      .withColumn("toks", split(col("text"), " ", -1))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
      )).as("gram"))
      .groupBy(col("gram"))
      .agg(collect_set(col("source")).as("srcs"))
      .select(col("srcs") +: hashCols: _*)
      .select(explode(col("srcs")).as("source") +:
        (0 until K).map(k => col(s"h$k")): _*)
      .groupBy(col("source"))
      .agg(minAggs.head, minAggs.tail: _*)
    sig
      .select(col("source"), explode(array((0 until K).map(k =>
        struct(lit(k).as("seed"), col(s"m$k").as("m"))): _*)).as("sm"))
      .select(col("source"), col("sm.seed").as("seed"), col("sm.m").as("m"))
      .groupBy(col("seed"), col("m"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        """flatten(transform(ss, (x, i) ->
          |  transform(slice(ss, i + 2, size(ss)), y ->
          |    struct(x AS src_a, y AS src_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("agree"))
      .select(col("src_a"), col("src_b"), col("agree"),
        round(col("agree") / lit(K), 6).as("est_jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** Per-source vocabulary statistics: token/type counts, hapax count
    * (tokens seen once — the long-tail mass), and type-token ratio —
    * the lexical-diversity fingerprint next to the per-document
    * entropy signal.
    */
  val vocabStats: Q = q(
    "pipe_vocab_stats",
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |cnt AS (SELECT source, w, COUNT(*) AS c FROM toks GROUP BY source, w)
      |SELECT source,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  ROUND(COUNT(*) / SUM(c), 6) AS ttr
      |FROM cnt GROUP BY source ORDER BY source""".stripMargin
  ) { td =>
    td.documents
      .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types") / col("n_tokens"), 6).as("ttr"))
      .orderBy("source")
  }

  /** EMBEDDING-SPACE diagnostics: per-dimension mean and variance of
    * the corpus embeddings — the audit a pipeline reads before the ANN
    * family (a far-from-zero mean vector means cosine similarities are
    * dominated by the common component: center before `pipe_semdedup`/
    * `pipe_ann_ivf`; a near-zero-variance dimension is dead weight in
    * every distance call: a candidate for the `pipe_embed_quantize`
    * trim). Determinism: components are quantized with the TIE-FREE
    * `floor(x · 10⁴)` (a decimal cast rounds, and a binary float CAN
    * sit exactly on the half boundary — 2⁻⁵ = 0.03125 — where Spark
    * and DuckDB tie-break differently), all aggregation happens in
    * exact integer space, and the single final double formula is
    * written with the identical operation order on both engines.
    *
    * Scale: the (vector × dim) explode never leaves its partition —
    * the per-dim aggregation is map-side combinable, so each partition
    * ships D partial rows and the one exchange carries
    * partitions × D rows, corpus-size-independent. The HOF
    * alternative (aggregate() over the array, no explode) runs
    * interpreted — the measured 3× cpu lesson from the overlap sketch
    * says keep the kernel in codegen'd explode + hash-agg form.
    */
  val embedStats: Q = q(
    "pipe_embed_stats",
    """WITH comp AS (
      |  SELECT i - 1 AS dim,
      |    CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS qv
      |  FROM (SELECT unnest(embedding) AS x,
      |          generate_subscripts(embedding, 1) AS i
      |        FROM embeddings) u),
      |per AS (SELECT dim, COUNT(*) AS n, SUM(qv) AS s, SUM(qv * qv) AS ss
      |        FROM comp GROUP BY dim)
      |SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_vecs,
      |  ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0, 6) AS mean,
      |  ROUND(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) / 100000000.0 -
      |    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0) *
      |    (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0), 6) AS variance
      |FROM per ORDER BY dim""".stripMargin
  ) { td =>
    td.embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("x").cast("double") * lit(10000)).cast("long").as("qv"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("qv")).as("s"),
        sum(col("qv") * col("qv")).as("ss"))
      .select(col("dim"), col("n").as("n_vecs"),
        round(col("s").cast("double") / col("n").cast("double") / lit(10000.0), 6)
          .as("mean"),
        round(col("ss").cast("double") / col("n").cast("double") / lit(100000000.0) -
          (col("s").cast("double") / col("n").cast("double") / lit(10000.0)) *
          (col("s").cast("double") / col("n").cast("double") / lit(10000.0)), 6)
          .as("variance"))
      .orderBy("dim")
  }

  override def queries: Seq[Q] =
    Seq(sourceOverlap, sourceOverlapSketch, vocabStats, embedStats)
}
