package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Training-data pipeline operators over documents/embeddings
  * (builder contract: dedup, similarity search, text analysis).
  *
  * Scale notes: exact dedup is a single hash-keyed aggregation (one
  * shuffle on the digest); cosine top-k broadcasts the query vector and
  * computes the similarity in a single codegen'd projection, so the scan
  * parallelizes embarrassingly and only the tiny top-k result is
  * collected.
  */
object QueriesPipeline extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** Exact dedup via content digest: keep-first representative per
    * digest group (md5 is identical across Spark and DuckDB).
    */
  val dedupExact: Q = q(
    "pipe_dedup_exact",
    """SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY digest ORDER BY keep_id""".stripMargin
  ) { td =>
    td.documents
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
  }

  /** Whitespace token counting per language. */
  val tokenCount: Q = q(
    "pipe_token_count",
    s"""SELECT lang, ${Det.oISum("len(string_split(text, ' '))")} AS tokens, COUNT(*) AS docs
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  ) { td =>
    td.documents
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ", -1))).as("tokens"), count(lit(1)).as("docs"))
      .orderBy("lang")
  }

  /** Brute-force cosine top-k against a query vector (the ANN baseline).
    * Float arrays are widened to double before the fold on BOTH sides;
    * the result is rounded to 6 decimals to absorb formula-shape ulp
    * differences, with vec_id as the total tie-break.
    */
  val cosineTopk: Q = q(
    "pipe_cosine_topk",
    """WITH qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe), 6) AS sim
      |FROM embeddings, qv
      |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  ) { td =>
    val emb = td.embeddings
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    emb.crossJoin(broadcast(qv))
      .select(
        col("vec_id"),
        round(graft.functions.GraftFunctions.cosine_sim(
          col("embedding"), col("qe")), 6).as("sim")
      )
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** IVF-style ANN — the scale path beyond brute force: a coarse
    * quantizer (every 50th vector as a centroid) partitions the corpus
    * into inverted lists; the query probes ONLY its nearest centroid's
    * list. Assignment is one broadcast-centroid pass (linear, no n²);
    * at 100 TB the assignment is materialized at ingest and the probe
    * reads one list ≈ corpus/K. Rounding to 6 decimals before ranking
    * absorbs formula-shape ulp differences; (sim, id) ordering makes
    * the ranks total.
    */
  val annIvf: Q = q(
    "pipe_ann_ivf",
    """WITH cents AS (
      |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |sims AS (
      |  SELECT e.vec_id, c.cid,
      |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.ce), 6) AS sim
      |  FROM embeddings e, cents c),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
      |    FROM sims)
      |  WHERE rn = 1),
      |qcid AS (SELECT cid FROM assigned WHERE vec_id = 0),
      |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qe), 6) AS sim
      |FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id, qcid, qv
      |WHERE a.cid = qcid.cid
      |ORDER BY sim DESC, e.vec_id LIMIT 5""".stripMargin
  ) { td =>
    import org.apache.spark.sql.expressions.Window
    val emb = td.embeddings
    // fused codegen cosine (one pass: dot + both norms) — the
    // interpreted aggregate(zip_with(...)) fold this replaces was the
    // assignment pass's bottleneck
    def cos(x: Column, y: Column): Column =
      round(graft.functions.GraftFunctions.cosine_sim(x, y), 6)
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cid"))
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"),
        col("cid"), cos(col("embedding"), col("ce")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    // the query's own centroid comes from a 1×K mini-assignment —
    // referencing `assigned` twice would recompute the full table
    val qcid = emb.filter(col("vec_id") === 0).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cos(col("embedding"), col("ce")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cid").as("qcid"))
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    assigned
      .join(broadcast(qcid), col("cid") === col("qcid"), "inner") // probe ONE list
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cos(col("embedding"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** PII redaction sweep — emails and IPv4 literals replaced with
    * typed placeholders, verified gone. One narrow projection pass
    * (two codegen'd regexp_replace), no shuffle before the rollup —
    * the shape a 100 TB scrub job runs per partition.
    */
  val redact: Q = {
    val emailRe = "[a-zA-Z0-9_.]+@[a-zA-Z0-9.]+"
    val ipRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
    Q(
      "pipe_redact",
      (s: SparkSession, dir: String) => {
        val td = Testdata(s, dir)
        val tainted = td.documents.withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com at 10.1.2.3"))).otherwise(col("text")))
        val redacted = tainted.withColumn("clean",
          regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
            ipRe, "<IP>"))
        redacted.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("clean") =!= col("text"), 1L).otherwise(0L)).as("n_redacted"),
            sum(when(col("clean").rlike(emailRe) || col("clean").rlike(ipRe), 1L)
              .otherwise(0L)).as("n_residual"))
          .orderBy("lang")
      },
      Some(
        s"""SELECT lang, COUNT(*) AS n_docs,
           |  CAST(COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS n_redacted,
           |  CAST(0 AS BIGINT) AS n_residual
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))
  }

  /** Deterministic stratified sampling: per-language keep rates from a
    * hash of the doc id (md5 renders identically in both engines), the
    * reproducible downsampling a curation pipeline uses — re-running
    * selects the SAME docs, no RNG state, no driver coordination, and
    * the filter is a one-pass codegen projection at any scale. Here the
    * dominant language keeps 5%, the rest 20%.
    */
  val sampleStratified: Q = q(
    "pipe_sample_stratified",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN
      |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) % 100
      |        < (CASE WHEN lang = 'en' THEN 5 ELSE 20 END)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  ) { td =>
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    val rate = when(col("lang") === "en", 5).otherwise(20)
    td.documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(bucket < rate, 1L).otherwise(0L)).as("n_kept"))
      .orderBy("lang")
  }

  /** Int8 scalar quantization + quantized dot product: per-vector
    * scale = max|x|/127, q = round(x/scale) — the memory-bound ANN
    * path (4× smaller vectors, integer dot products; rescoring happens
    * in float on the top candidates). The dot product core is EXACT
    * integer arithmetic, so both engines agree bit-for-bit; only the
    * final dequantization multiplies floats (identical shape, round 6).
    */
  val embedQuantize: Q = q(
    "pipe_embed_quantize",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
      |q AS (SELECT vec_id, scale,
      |  list_transform(v, x -> CAST(round(x / scale) AS INT)) AS qv FROM s)
      |SELECT a.vec_id,
      |  CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
      |    z -> CAST(z[1] AS BIGINT) * z[2])) AS BIGINT) AS qdot,
      |  round(CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
      |    z -> CAST(z[1] AS BIGINT) * z[2])) AS BIGINT)
      |    * a.scale * b.scale, 6) AS approx_dot
      |FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
      |ORDER BY a.vec_id""".stripMargin
  ) { td =>
    val quant = td.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", expr(
        "aggregate(v, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x))) / 127.0"))
      .withColumn("qv", expr("transform(v, x -> CAST(round(x / scale) AS INT))"))
      .select(col("vec_id"), col("scale"), col("qv"))
    val a = quant.alias("a")
    val b = quant.alias("b")
    a.join(b, col("b.vec_id") === col("a.vec_id") + 1)
      .withColumn("qdot", expr(
        """aggregate(zip_with(a.qv, b.qv, (x, y) -> CAST(x AS BIGINT) * y),
          |  CAST(0 AS BIGINT), (acc, p) -> acc + p)""".stripMargin))
      .select(col("a.vec_id").as("vec_id"), col("qdot"),
        round(col("qdot") * col("a.scale") * col("b.scale"), 6).as("approx_dot"))
      .orderBy("vec_id")
  }

  override def queries: Seq[Q] = Seq(dedupExact, tokenCount, cosineTopk, annIvf,
    redact, sampleStratified, embedQuantize)
}
