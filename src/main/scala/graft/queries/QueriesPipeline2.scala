package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Training-data pipeline operators, part 2 (builder contract): near-dup
  * dedup (MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine),
  * text analysis (language-ID heuristic, quality scoring, document
  * fingerprinting).
  *
  * Scale notes: the LSH path is the 100 TB design — shingle → minhash
  * signature → band bucket → bucket-equi-join; only same-bucket pairs
  * are compared, never the n² cross join. Shingling uses a window lead
  * over tokens (in production this materializes at ingest). The
  * embedding near-dup prunes via an 8-bit hyperplane-sign bucket, the
  * standard sign-LSH, so the pair join is bucket-local.
  */
object QueriesPipeline2 extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** Tokens with positions (doc_id, pos, w). */
  private def tokens(td: Testdata): DataFrame =
    td.documents.select(col("doc_id"),
      posexplode(split(col("text"), " ", -1)).as(Seq("pos", "w")))

  /** 3-word shingles computed inside the row via an array transform —
    * no explode-then-window shuffle; the whole shingling is one narrow
    * codegen projection (the window-lead formulation stays in the
    * oracle SQL, producing identical shingles).
    *
    * Materialized ONCE per sfDir through [[Fixtures.materialized]]:
    * the dedup chain references the shingle set up to six times
    * (minhash aggregation, distinct, sizes, both verify-join sides) —
    * without a stored table Spark recomputes the documents scan +
    * explode per reference. At 100 TB shingling is write-time feature
    * extraction, stored next to the corpus, keyed on doc_id (every
    * downstream join's key).
    */
  private def shingles3(td: Testdata): DataFrame =
    Fixtures.materialized(td.spark, td.dir, "shingles3", "doc_id") {
      td.documents
        .withColumn("toks", split(col("text"), " ", -1))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))"
        )).as("sh"))
    }

  private val oracleShingles3 =
    """SELECT doc_id, sh FROM (
      |  SELECT doc_id,
      |    w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS sh
      |  FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |      generate_subscripts(string_split(text, ' '), 1) AS pos
      |    FROM documents)
      |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
      |WHERE sh IS NOT NULL""".stripMargin

  /** MinHash + LSH near-dup candidates: 4 md5-seeded minhashes per doc,
    * one band per hash; pairs = docs agreeing on ANY band. Output is the
    * first 100 candidate pairs — the shape a dedup job feeds into exact
    * Jaccard verification.
    */
  val minhashLsh: Q = q(
    "pipe_minhash_lsh",
    s"""WITH sh AS ($oracleShingles3),
       |mh AS (
       |  SELECT doc_id, seed, MIN(md5(seed || ':' || sh)) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest([0,1,2,3]) AS seed)
       |  GROUP BY doc_id, seed)
       |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |FROM mh a JOIN mh b ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id
       |ORDER BY a, b LIMIT 100""".stripMargin
  ) { td =>
    // all 4 seeded minhashes in ONE aggregation pass over the shingles
    // (no 4x row explosion), then stacked to (doc_id, seed, mh) rows.
    val sh = shingles3(td)
    val mhAggs = (0 to 3).map(k =>
      min(md5(concat(lit(s"$k:"), col("sh")))).as(s"mh$k"))
    val wide = sh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
    val mh = wide.select(col("doc_id"),
      explode(array((0 to 3).map(k =>
        struct(lit(k).as("seed"), col(s"mh$k").as("mh"))): _*)).as("sm"))
      .select(col("doc_id"), col("sm.seed").as("seed"), col("sm.mh").as("mh"))
    val a = mh.alias("a")
    val b = mh.alias("b")
    a.join(b, col("a.seed") === col("b.seed") && col("a.mh") === col("b.mh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct()
      .orderBy("a", "b")
      .limit(100)
  }

  /** SimHash (8-bit, md5-nibble hyperplanes): per-bit majority vote over
    * tokens; bucket histogram = near-dup cluster candidates.
    */
  val simhash: Q = {
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val oracleBits = (0 until 8).map { i =>
      s"CASE WHEN SUM(CASE WHEN substr(md5(w), ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")
    q(
      "pipe_simhash",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |fp AS (SELECT doc_id, $oracleBits AS fingerprint FROM toks GROUP BY doc_id)
         |SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
         |FROM fp GROUP BY fingerprint ORDER BY fingerprint""".stripMargin
    ) { td =>
      val bits = (0 until 8).map { i =>
        when(sum(when(substring(md5(col("w")), i + 1, 1).isin(hexHigh: _*), 1)
          .otherwise(-1)) > 0, 1 << i).otherwise(0)
      }.reduce(_ + _)
      tokens(td)
        .groupBy(col("doc_id"))
        .agg(bits.as("fingerprint"))
        .groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
        .orderBy("fingerprint")
    }
  }

  /** Exact n-gram Jaccard for adjacent-id candidate pairs: the verify
    * stage after LSH (inter/union over distinct 3-shingle sets).
    */
  val ngramJaccard: Q = q(
    "pipe_ngram_jaccard",
    s"""WITH sh AS ($oracleShingles3),
       |d AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS a, COUNT(*) AS i
       |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND b.sh = a.sh
       |  GROUP BY a.doc_id)
       |SELECT a, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
       |FROM inter JOIN sizes sa ON sa.doc_id = a
       |           JOIN sizes sb ON sb.doc_id = a + 1
       |ORDER BY jaccard DESC, a LIMIT 50""".stripMargin
  ) { td =>
    // doc-level shingle SETS (one groupBy, dedup inside the agg) so
    // the pair comparison joins 1 row per doc and intersects in-row —
    // the (doc, shingle)-exploded self-join shuffled the whole shingle
    // table twice for the same integers. Per-doc sets are bounded by
    // doc length, so the array payload is a document-sized record,
    // which is exactly what a 100 TB pair-verify stage wants to move.
    val packs = shinglePacks(td)
    packs.select(col("doc_id").as("a"), col("shs").as("sha"),
        size(col("shs")).as("na"))
      .join(packs.select((col("doc_id") - 1).as("a"), col("shs").as("shb"),
        size(col("shs")).as("nb")), Seq("a"))
      .select(col("a"),
        size(array_intersect(col("sha"), col("shb"))).as("i"),
        col("na"), col("nb"))
      // empty intersections never surfaced from the exploded inner
      // join; keep that contract (and the oracle's)
      .filter(col("i") > 0)
      .select(col("a"),
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a"))
      .limit(50)
  }

  /** (doc_id, shs: array) — each doc's DISTINCT 3-shingle set packed
    * into one row (collect_set dedups inside the aggregation: one
    * shuffle replaces the distinct + per-doc count pair). Shared by
    * the Jaccard verify stages.
    */
  private def shinglePacks(td: Testdata): DataFrame =
    shingles3(td).groupBy(col("doc_id"))
      .agg(collect_set(col("sh")).as("shs"))

  /** LSH band-collision candidate pairs (a < b): b=2 bands × r=2
    * minhashes per band — the shared head of the dedup chain (verify
    * and clustering both consume it). The all-pairs space never
    * materializes; only band-bucket collisions join.
    */
  /** (doc_id, band, sig) band-signature rows — the shared banding head
    * of the LSH chain.
    */
  private def bandRows(td: Testdata): DataFrame = {
    val sh = shingles3(td)
    // both bands in one aggregation pass: 4 minhash aggs, paired
    val mhAggs = (0 to 3).map(k =>
      min(md5(concat(lit(s"$k:"), col("sh")))).as(s"mh$k"))
    val wide = sh.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
    wide.select(col("doc_id"),
      explode(array(
        struct(lit(0).as("band"),
          concat(col("mh0"), lit("|"), col("mh1")).as("sig")),
        struct(lit(1).as("band"),
          concat(col("mh2"), lit("|"), col("mh3")).as("sig")))).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private[graft] def bandCandidates(td: Testdata): DataFrame = {
    val bands = bandRows(td)
    bands.alias("ba")
      .join(bands.alias("bb"),
        col("ba.band") === col("bb.band") && col("ba.sig") === col("bb.sig") &&
          col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("a"), col("bb.doc_id").as("b"))
      .distinct()
  }

  /** Star-reduced LSH candidate edges: each doc in a collision bucket
    * links to the bucket's MINIMUM doc — m−1 edges per m-doc bucket
    * instead of the m(m−1)/2 clique [[bandCandidates]] emits, with
    * identical connected components (every clique member reaches the
    * bucket min). This is the edge set the CLUSTERING stage wants: the
    * graph is a union of per-bucket stars, so single-bucket components
    * take [[graft.pipeline.Components]]'s pure-star bypass and only
    * docs shared across buckets pay contraction rounds. The verify
    * stage keeps the full pair set (it scores every candidate pair).
    */
  private[graft] def bandStarEdges(td: Testdata): DataFrame = {
    val w = Window.partitionBy(col("band"), col("sig"))
    bandRows(td)
      .withColumn("mn", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("mn"))
      .select(col("mn").as("src"), col("doc_id").as("dst"))
      .distinct()
  }

  /** The banding CTE chain of [[bandCandidates]] in oracle SQL
    * (ends with `cand(a, b)`), shared by the verify and clustering
    * oracles.
    */
  private val oracleCand =
    s"""sh AS ($oracleShingles3),
       |mh AS (
       |  SELECT doc_id, seed, MIN(md5(seed || ':' || sh)) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest([0,1,2,3]) AS seed)
       |  GROUP BY doc_id, seed),
       |bands AS (
       |  SELECT doc_id, seed // 2 AS band,
       |    string_agg(mh, '|' ORDER BY seed) AS sig
       |  FROM mh GROUP BY doc_id, seed // 2),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  /** END-TO-END dedup pipeline: MinHash banding (b=2 bands × r=2
    * hashes — the real banding structure, unlike the single-hash bands
    * of the candidate demo above) → exact n-gram Jaccard verification
    * of the LSH candidates. This is the production shape: the
    * all-pairs space (12.5M at sf0.1) never materializes; the verify
    * join runs only over the ~600 band-collision pairs.
    *
    * Det: i/(na+nb-i) is one IEEE division of exact integers; round 6
    * on both sides; total ORDER BY (jaccard DESC, a, b).
    */
  val lshJaccardVerify: Q = q(
    "pipe_lsh_jaccard_verify",
    s"""WITH $oracleCand,
       |d AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
       |inter AS (
       |  SELECT c.a, c.b, COUNT(*) AS i
       |  FROM cand c
       |  JOIN d da ON da.doc_id = c.a
       |  JOIN d db ON db.doc_id = c.b AND db.sh = da.sh
       |  GROUP BY c.a, c.b)
       |SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = a
       |JOIN sizes sb ON sb.doc_id = b
       |ORDER BY jaccard DESC, a, b LIMIT 50""".stripMargin
  ) { td =>
    // the verify stage joins the CANDIDATE PAIRS (band-bounded, tiny)
    // against doc-level shingle sets and intersects in-row — the
    // exploded formulation shuffled the corpus's whole (doc, shingle)
    // table on (b, sh) to count the same integers. NO broadcast hints:
    // the candidate list grows with the corpus's duplicate rate, so
    // both joins are left to AQE's runtime conversion — small-regime
    // runs broadcast at runtime, a 100 TB candidate flood degrades to
    // a shuffle instead of failing the driver. Per-doc sets are
    // document-sized — the record a pair verify wants to move.
    val packs = shinglePacks(td)
    val cand = bandCandidates(td)
    packs.select(col("doc_id").as("a"), col("shs").as("sha"),
        size(col("shs")).as("na"))
      .join(cand, Seq("a"))
      .join(packs.select(col("doc_id").as("b"), col("shs").as("shb"),
        size(col("shs")).as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sha"), col("shb"))).as("i"),
        col("na"), col("nb"))
      // a band collision implies a shared min-shingle today, but that
      // is a property of the hash scheme, not of this stage — keep the
      // oracle's inner-join no-empty-intersection contract explicit
      .filter(col("i") > 0)
      .select(col("a"), col("b"),
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(50)
  }

  /** Dedup CLUSTERING: LSH candidates → connected components →
    * canonical keep/drop per doc ([[graft.pipeline.Components]],
    * alternating large-star/small-star). The missing last stage of the
    * dedup chain: pairs only say "a~b"; the drop decision needs the
    * transitive closure (a~b, b~c ⇒ keep ONE of three). The CC input
    * is the star-reduced edge set ([[bandStarEdges]]): same components
    * as the full pair clique, linearly fewer edges, and single-bucket
    * collision groups resolve in the pure-star bypass with zero
    * contraction rounds. The oracle computes the closure over the FULL
    * pair set with a recursive CTE — tractable there because sf
    * components are small; the Spark side is the O(log n) rounds
    * formulation that holds at 100 TB.
    */
  val dedupClusters: Q = q(
    "pipe_dedup_clusters",
    s"""WITH RECURSIVE $oracleCand,
       |sym AS (SELECT a AS src, b AS dst FROM cand
       |        UNION SELECT b, a FROM cand),
       |nodes AS (SELECT DISTINCT src AS id FROM sym),
       |reach(a, b) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT r.a, s.dst FROM reach r JOIN sym s ON s.src = r.b),
       |cc AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a),
       |sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM cc GROUP BY cluster)
       |SELECT cc.doc_id, cc.cluster, sz.cluster_size,
       |  cc.doc_id = cc.cluster AS keep
       |FROM cc JOIN sz ON sz.cluster = cc.cluster
       |ORDER BY cc.doc_id""".stripMargin
  ) { td =>
    val cc = graft.pipeline.Components.connectedComponents(
      bandStarEdges(td))
    // size via a window over the component partition: one shuffle, no
    // join, and no driver/broadcast bound on the number of clusters
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    cc.withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("id").as("doc_id"), col("component").as("cluster"),
        col("cluster_size"), (col("id") === col("component")).as("keep"))
      .orderBy("doc_id")
  }

  /** Embedding near-dup via sign-LSH: 8-bit bucket from the signs of the
    * first 8 dims, then bucket-local cosine > 0.3 pairs.
    */
  val embeddingNeardup: Q = q(
    "pipe_embedding_neardup",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |b AS (SELECT vec_id, v,
      |  (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
      |  + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END) + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
      |  + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END) + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
      |  + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END) + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END)
      |  AS bucket FROM e)
      |SELECT a.vec_id AS a, c.vec_id AS b,
      |  ROUND(list_cosine_similarity(a.v, c.v), 6) AS sim
      |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
      |WHERE ROUND(list_cosine_similarity(a.v, c.v), 6) > 0.3
      |ORDER BY sim DESC, a, b""".stripMargin
  ) { td =>
    val e = td.embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val bucket = (1 to 8).map(i =>
      when(element_at(col("v"), i) > 0, 1 << (i - 1)).otherwise(0)).reduce(_ + _)
    val b = e.withColumn("bucket", bucket)
    val x = b.alias("x")
    val y = b.alias("y")
    val sim = round(
      graft.functions.GraftFunctions.cosine_sim(col("x.v"), col("y.v")), 6)
    x.join(y, col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"), sim.as("sim"))
      .filter(col("sim") > 0.3)
      .orderBy(col("sim").desc, col("a"), col("b"))
  }

  /** Language-ID heuristic: marker-word scores with a fixed tie order —
    * the n-gram-scoring shape of real langid, portable to any corpus.
    */
  val langid: Q = {
    def occ(txt: String, w: String) =
      s"(length($txt) - length(replace($txt, '$w', ''))) / ${w.length}"
    q(
      "pipe_langid",
      s"""SELECT predicted, COUNT(*) AS n FROM (
         |  SELECT CASE
         |    WHEN ${occ("text", "table")} >= ${occ("text", "join")}
         |     AND ${occ("text", "table")} >= ${occ("text", "window")} THEN 'tabular'
         |    WHEN ${occ("text", "join")} >= ${occ("text", "window")} THEN 'relational'
         |    ELSE 'analytic' END AS predicted
         |  FROM documents)
         |GROUP BY predicted ORDER BY predicted""".stripMargin
    ) { td =>
      def occC(w: String): Column =
        (length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(w), ""))) / w.length
      val predicted = when(occC("table") >= occC("join") && occC("table") >= occC("window"), "tabular")
        .when(occC("join") >= occC("window"), "relational")
        .otherwise("analytic")
      td.documents
        .select(predicted.as("predicted"))
        .groupBy(col("predicted")).agg(count(lit(1)).as("n"))
        .orderBy("predicted")
    }
  }

  /** Quality scoring: char/word/stopword features → linear score →
    * threshold filter, rollup per lang (decimal-exact average).
    */
  val qualityScore: Q = q(
    "pipe_quality_score",
    """SELECT lang, COUNT(*) AS n_kept,
      |  CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_score
      |FROM (
      |  SELECT lang,
      |    n_chars * 0.01 + len(string_split(text, ' ')) * 0.1
      |      - ((length(text) - length(replace(text, ' the ', ''))) / 5) * 0.5 AS score
      |  FROM documents)
      |WHERE score > 6.0 GROUP BY lang ORDER BY lang""".stripMargin
  ) { td =>
    val stop = (length(col("text")) - length(regexp_replace(col("text"), java.util.regex.Pattern.quote(" the "), ""))) / 5
    val score = col("n_chars") * 0.01 + size(split(col("text"), " ", -1)) * 0.1 - stop * 0.5
    td.documents
      .withColumn("score", score)
      .filter(col("score") > 6.0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        (sum(col("score").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("avg_score"))
      .orderBy("lang")
  }

  /** CURATION COMPOSITION — the full selection funnel a training-data
    * pipeline runs, as ONE query: quality gate → exact-dedup keep-list
    * (md5 digest, keep min doc_id) → deterministic hash sampling →
    * per-language funnel stats + surviving token count. Every stage is
    * the same operator the standalone queries verify; this entry
    * proves they compose — and the whole funnel stays one scan + one
    * digest-keyed semi-join + one aggregation (no stage materializes a
    * candidate set).
    */
  val curationE2e: Q = q(
    "pipe_curation_funnel",
    """WITH scored AS (
      |  SELECT doc_id, lang, text,
      |    n_chars * 0.01 + len(string_split(text, ' ')) * 0.1
      |      - ((length(text) - length(replace(text, ' the ', ''))) / 5) * 0.5 AS score
      |  FROM documents),
      |quality AS (SELECT * FROM scored WHERE score > 6.0),
      |keepers AS (
      |  SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
      |deduped AS (
      |  SELECT q.* FROM quality q JOIN keepers k ON k.doc_id = q.doc_id),
      |sampled AS (
      |  SELECT * FROM deduped
      |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100
      |    < (CASE WHEN lang = 'en' THEN 60 ELSE 90 END))
      |SELECT d.lang,
      |  (SELECT COUNT(*) FROM scored s WHERE s.lang = d.lang) AS n_total,
      |  COUNT(*) AS n_quality,
      |  CAST(SUM(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN s.doc_id IS NOT NULL
      |    THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT) AS tokens_out
      |FROM deduped d LEFT JOIN sampled s ON s.doc_id = d.doc_id
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  ) { td =>
    val stop = (length(col("text")) - length(regexp_replace(col("text"),
      java.util.regex.Pattern.quote(" the "), ""))) / 5
    val score = col("n_chars") * 0.01 +
      size(split(col("text"), " ", -1)) * 0.1 - stop * 0.5
    val scored = td.documents.withColumn("score", score)
    val quality = scored.filter(col("score") > 6.0)
    val keepers = quality.groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = quality.join(keepers, Seq("doc_id"), "left_semi")
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    val rate = when(col("lang") === "en", 60).otherwise(90)
    val totals = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    deduped
      .withColumn("__keep", bucket < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_quality"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("__keep"), size(split(col("text"), " ", -1)).cast("long"))
          .otherwise(0L)).as("tokens_out"))
      .join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("n_total"), col("n_quality"),
        col("n_sampled"), col("tokens_out"))
      .orderBy("lang")
  }

  /** Document fingerprinting (winnowing-lite): min-md5 over 2-shingles
    * per doc; per-source dedup accounting (docs vs distinct prints).
    */
  val fingerprint: Q = q(
    "pipe_fingerprint",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, sh FROM (
      |    SELECT doc_id, w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS sh
      |    FROM toks) WHERE sh IS NOT NULL),
      |fp AS (SELECT doc_id, MIN(md5(sh)) AS fp FROM sh GROUP BY doc_id),
      |j AS (SELECT d.doc_id, d.source, fp.fp FROM documents d JOIN fp ON fp.doc_id = d.doc_id)
      |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_prints
      |FROM j GROUP BY source ORDER BY source""".stripMargin
  ) { td =>
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh2 = tokens(td)
      .withColumn("sh", concat(col("w"), lit(" "), lead(col("w"), 1).over(w)))
      .filter(col("sh").isNotNull)
    val fp = sh2.groupBy(col("doc_id")).agg(min(md5(col("sh"))).as("fp"))
    td.documents.select(col("doc_id"), col("source"))
      .join(fp, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_prints"))
      .orderBy("source")
  }

  /** Multimodal feature extraction through the real Dataset plumbing
    * (graft.pipeline.Multimodal: binary payloads + mapPartitions batch
    * decode via the stub codec); the oracle recomputes the stub's
    * arithmetic from md5 hex directly.
    */
  val mediaFeatures: Q = {
    def hexByte(off: Int): String = {
      val d1 = s"(strpos('0123456789abcdef', substr(md5(text), ${off * 2 + 1}, 1)) - 1)"
      val d2 = s"(strpos('0123456789abcdef', substr(md5(text), ${off * 2 + 2}, 1)) - 1)"
      s"($d1 * 16 + $d2)"
    }
    Q(
      "pipe_media_features",
      (s: SparkSession, dir: String) => {
        val td = graft.sources.Testdata(s, dir)
        val media = graft.pipeline.Multimodal.mediaFromDocuments(s, td.documents)
        graft.pipeline.Multimodal.featurize(media, graft.pipeline.Multimodal.StubDecoder)
          .toDF()
          .groupBy(col("kind"), col("source"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("width")).as("sum_width"),
            sum(col("height")).as("sum_height"))
          .orderBy("kind", "source")
      },
      Some(
        s"""WITH m AS (
           |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind, source,
           |    ${hexByte(0)} AS b0, ${hexByte(1)} AS b1
           |  FROM documents)
           |SELECT kind, source, COUNT(*) AS n_items,
           |  CAST(SUM(b0 % 64 + 16) AS BIGINT) AS sum_width,
           |  CAST(SUM(b1 % 64 + 16) AS BIGINT) AS sum_height
           |FROM m GROUP BY kind, source ORDER BY kind, source""".stripMargin)
    )
  }

  /** Payload-rewriting media transforms end-to-end: deterministic REAL
    * BMP/AVI payloads built per document, resized (nearest-neighbor →
    * 8x5) and frame-sampled (stride 2, ceil(n/2) frames survive), then
    * re-decoded through the codec seam — the oracle pins the
    * post-transform geometry from the construction arithmetic alone.
    */
  val mediaTransform: Q = Q(
    "pipe_media_transform",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.pipeline.{Codecs, Multimodal}
      val media = Testdata(s, dir).documents
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          val payload =
            if (id % 2 == 0) {
              val w = 3 + (id % 5).toInt
              val h = 2 + (id % 4).toInt
              Codecs.encodeBmp(Codecs.Image(w, h,
                Array.tabulate(w * h)(i => ((id * 31 + i) % 0xFFFFFF).toInt)))
            } else {
              val n = 1 + (id % 6).toInt
              Codecs.encodeAvi(Codecs.Video(4, 2, 40000,
                Array.tabulate(n)(f => Codecs.Image(4, 2,
                  Array.tabulate(8)(i => ((id + f * 7 + i) % 0xFFFFFF).toInt)))))
            }
          Multimodal.MediaItem(id,
            if (id % 2 == 0) "image" else "video", payload, src)
        }
      Multimodal.featurize(
          Multimodal.sampleVideoFrames(
            Multimodal.resizeImages(media, 8, 5), 2),
          Multimodal.CodecDecoder)
        .toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          sum(col("n_frames")).as("sum_frames"))
        .orderBy("kind")
    },
    Some(
      """SELECT CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 4 END) AS BIGINT) AS sum_width,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 2 END) AS BIGINT) AS sum_height,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1
        |           ELSE CAST(CEIL((1 + doc_id % 6) / 2.0) AS BIGINT) END) AS BIGINT)
        |    AS sum_frames
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** PNG end-to-end through the REAL codec: per document a truecolor
    * PNG is encoded (zlib IDAT, filter types cycling per row so every
    * defilter path runs) and decoded back; the decoded geometry and an
    * integer luma checksum roll up per source. The oracle recomputes
    * both from the construction arithmetic alone — byte-exact pixel
    * recovery through deflate + all five PNG filters is what the
    * luma-sum hash actually certifies.
    */
  val mediaPng: Q = Q(
    "pipe_media_png",
    (s: SparkSession, dir: String) => {
      import s.implicits._
      import graft.pipeline.Codecs
      Testdata(s, dir).documents
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .mapPartitions(_.map { case (id, src) =>
          val w = (3 + id % 6).toInt
          val h = (2 + id % 5).toInt
          val img = Codecs.Image(w, h,
            Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 0x1000000).toInt))
          val dec = Codecs.decodePng(Codecs.encodePng(img))
          val luma = dec.pixels.map { p =>
            val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
            (299L * r + 587L * g + 114L * b) / 1000L
          }.sum
          (src, dec.width.toLong, dec.height.toLong, luma)
        })
        .toDF("source", "w", "h", "luma")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_items"), sum(col("w")).as("sum_width"),
          sum(col("h")).as("sum_height"), sum(col("luma")).as("sum_luma"))
        .orderBy("source")
    },
    Some(
      """WITH d AS (
        |  SELECT doc_id, source, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
        |  FROM documents),
        |lum AS (
        |  SELECT doc_id, source, l FROM (
        |    SELECT doc_id, source,
        |      ((doc_id * 31 + unnest(generate_series(0, w * h - 1)) * 7)
        |        % 16777216) AS p
        |    FROM d)
        |  , LATERAL (SELECT (299 * (p // 65536)
        |      + 587 * ((p // 256) % 256) + 114 * (p % 256)) // 1000 AS l))
        |SELECT d.source, COUNT(*) AS n_items,
        |  CAST(SUM(w) AS BIGINT) AS sum_width,
        |  CAST(SUM(h) AS BIGINT) AS sum_height,
        |  (SELECT CAST(SUM(l) AS BIGINT) FROM lum WHERE lum.source = d.source)
        |    AS sum_luma
        |FROM d GROUP BY d.source ORDER BY d.source""".stripMargin))

  override def queries: Seq[Q] = Seq(
    minhashLsh, simhash, ngramJaccard, lshJaccardVerify, dedupClusters, mediaTransform,
    embeddingNeardup, langid, qualityScore, curationE2e, fingerprint,
    mediaFeatures, mediaPng
  )
}
