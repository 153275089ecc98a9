package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Testdata

/** Training-data pipeline operators, part 6: tokenizer-training pair
  * counts (the BPE merge step), deterministic train/val/test splits,
  * and hard-negative mining for contrastive embedding training.
  *
  * Scale notes (100 TB):
  *   - BPE pair counting uses the classic word-frequency reduction:
  *     identical words collapse to (word, count) FIRST, so the pair
  *     explosion runs over the vocabulary (millions) instead of the
  *     corpus (trillions of tokens). Two shuffles total — one
  *     vocabulary rollup, one pair rollup — both map-side combined;
  *     each BPE merge iteration repeats the second shuffle only.
  *   - the split assignment is a pure hash projection (md5 of the
  *     stable doc id), so membership is reproducible from the id alone
  *     on any engine — no sampling state, no shuffle beyond the
  *     audit's source rollup.
  *   - hard negatives bound the pair space by the (tiny, broadcast)
  *     query-set side, exactly like the cosine-top-k baseline: the
  *     corpus is scanned once, the similarity band filter runs fused
  *     in codegen before anything shuffles, and only band survivors
  *     reach the per-query top-k rank.
  */
object QueriesPipeline6 extends QueryPack {

  private def q(name: String, oracle: String)(f: Testdata => DataFrame): Q =
    Q(name, (s: SparkSession, dir: String) => f(Testdata(s, dir)), Some(oracle))

  /** BPE MERGE STEP (tokenizer training, Sennrich et al. 2016): count
    * adjacent symbol pairs across the corpus, weighted by word
    * frequency — the argmax pair is the next merge rule. Iterating
    * this op trains the tokenizer; one iteration is the oracle-gated
    * unit. Top-20 pairs by count, (count, pair) total order.
    */
  val bpePairs: Q = q(
    "pipe_bpe_pairs",
    """WITH words AS (
      |  SELECT w, COUNT(*) AS wn FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0 GROUP BY w),
      |pairs AS (
      |  SELECT substring(w, CAST(i AS INT), 1) AS lsym,
      |         substring(w, CAST(i AS INT) + 1, 1) AS rsym, wn
      |  FROM (SELECT w, wn, unnest(generate_series(1, length(w) - 1)) AS i
      |        FROM words WHERE length(w) > 1))
      |SELECT lsym, rsym, CAST(SUM(wn) AS BIGINT) AS n
      |FROM pairs GROUP BY lsym, rsym
      |ORDER BY n DESC, lsym, rsym LIMIT 20""".stripMargin
  ) { td =>
    val words = td.documents
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
    words
      .filter(length(col("w")) > 1)
      .select(col("wn"), explode(expr(
        """transform(sequence(1, length(w) - 1),
          |  i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.l").as("lsym"), col("p.r").as("rsym"))
      .agg(sum(col("wn")).as("n"))
      .orderBy(col("n").desc, col("lsym"), col("rsym"))
      .limit(20)
  }

  /** DETERMINISTIC DATASET SPLIT: train/val/test membership from a
    * hash of the stable doc id (90/5/5) — reproducible anywhere,
    * re-runnable incrementally (new docs hash into the same bands),
    * and leakage-free by construction. The audit rolls up docs and
    * chars per (source, split).
    */
  val datasetSplit: Q = q(
    "pipe_dataset_split",
    """SELECT source, split, CAST(COUNT(*) AS BIGINT) AS docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS chars
      |FROM (
      |  SELECT source, n_chars,
      |    CASE WHEN h < 900000 THEN 'train'
      |         WHEN h < 950000 THEN 'val' ELSE 'test' END AS split
      |  FROM (
      |    SELECT source, n_chars,
      |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |        % 1000000 AS h
      |    FROM documents))
      |GROUP BY source, split ORDER BY source, split""".stripMargin
  ) { td =>
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000000L
    td.documents
      .select(col("source"), col("n_chars"),
        when(h < 900000L, "train").when(h < 950000L, "val")
          .otherwise("test").as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy("source", "split")
  }

  /** HARD-NEGATIVE MINING (contrastive embedding training): for each
    * query vector, the top-5 corpus vectors whose cosine lands in the
    * "similar but not duplicate" band [0.25, 0.75] — the negatives
    * that actually teach a retriever. Query set broadcasts; the band
    * filter runs fused in the scan so only survivors reach the rank.
    */
  val hardNegatives: Q = q(
    "pipe_hard_negatives",
    """WITH qs AS (
      |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id < 3),
      |sims AS (
      |  SELECT q.qid, e.vec_id,
      |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS sim
      |  FROM embeddings e, qs q WHERE e.vec_id <> q.qid),
      |band AS (SELECT * FROM sims WHERE sim BETWEEN 0.25 AND 0.75)
      |SELECT qid, vec_id, sim FROM (
      |  SELECT qid, vec_id, sim,
      |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      |  FROM band)
      |WHERE rn <= 5 ORDER BY qid, sim DESC, vec_id""".stripMargin
  ) { td =>
    val emb = td.embeddings
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(graft.functions.GraftFunctions.cosine_sim(
          col("embedding"), col("qe")), 6).as("sim"))
      .filter(col("sim") >= 0.25 && col("sim") <= 0.75)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"), col("sim"))
      .orderBy(col("qid"), col("sim").desc, col("vec_id"))
  }

  /** UNICODE NFC NORMALIZATION: canonical composition of combining
    * sequences — the byte-level cleanup a multilingual corpus needs
    * before any hash-keyed dedup (the same logical text differs
    * byte-wise when a source emits decomposed forms, so digests and
    * MinHash shingles silently miss duplicates). Runs as the native
    * codegen expression [[graft.functions.GraftFunctions.nfc_normalize]]
    * fused into the scan; DuckDB's nfc_normalize pins the semantics.
    * The corpus is ASCII, so a decomposed suffix (" caf" + e +
    * U+0301 combining acute) is appended on BOTH engines to make the
    * normalization observable: NFC composes it to é, saving one byte.
    */
  val textNormalize: Q = q(
    "pipe_text_normalize",
    """SELECT doc_id,
      |  md5(nfc_normalize(text || ' caf' || decode(from_hex('65CC81')))) AS digest,
      |  CAST(strlen(text || ' caf' || decode(from_hex('65CC81')))
      |    - strlen(nfc_normalize(text || ' caf' || decode(from_hex('65CC81')))) AS BIGINT)
      |    AS bytes_saved
      |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
  ) { td =>
    val deco = concat(col("text"), lit(" caf"),
      decode(unhex(lit("65CC81")), "UTF-8"))
    val normed = graft.functions.GraftFunctions.nfc_normalize(deco)
    td.documents
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), md5(normed).as("digest"),
        (octet_length(deco) - octet_length(normed)).cast("long")
          .as("bytes_saved"))
      .orderBy("doc_id")
  }

  /** IVF MULTI-PROBE ANN (nprobe = 3): the recall knob the recall@k
    * measurement (`pipe_ann_recall`, 0.2–0.9 single-probe) motivates —
    * the query probes its THREE nearest centroids' lists instead of
    * one, trading 3× the probed fraction for the recall the
    * single-probe variant leaves behind. The assignment pass is the
    * same broadcast-centroid scan as `pipe_ann_ivf`; the probe-list
    * filter is a 3-row broadcast semi-join, so the corpus still moves
    * only through its stored inverted lists.
    */
  val annIvfMultiprobe: Q = q(
    "pipe_ann_ivf_multiprobe",
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
      |qcids AS (
      |  SELECT cid FROM (
      |    SELECT cid, row_number() OVER (ORDER BY sim DESC, cid) AS rn
      |    FROM sims WHERE vec_id = 0)
      |  WHERE rn <= 3),
      |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qe), 6) AS sim
      |FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id, qv
      |WHERE a.cid IN (SELECT cid FROM qcids)
      |ORDER BY sim DESC, e.vec_id LIMIT 5""".stripMargin
  ) { td =>
    val emb = td.embeddings
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
    val qcids = emb.filter(col("vec_id") === 0).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        cos(col("embedding"), col("ce")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("cid").as("qcid"))
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    assigned
      .join(broadcast(qcids), col("cid") === col("qcid"), "left_semi")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), cos(col("embedding"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** BPE TRAINING (the full iterative loop `pipe_bpe_pairs` is one
    * step of): 8 merge rules learned from the corpus — each iteration
    * is one vocabulary-sized pair aggregation + a 1-row argmax + a
    * narrow merge map ([[graft.pipeline.Bpe]]). No SQL oracle (an
    * iterated argmax-and-rewrite is not one DuckDB query): the gate is
    * rows-only and BpeSpec pins the semantics on the Sennrich corpus
    * (merge order, counts, tie-break).
    */
  val bpeTrain: Q = Q(
    "pipe_bpe_train",
    (s: SparkSession, dir: String) => {
      val merges = graft.pipeline.Bpe.train(Testdata(s, dir).documents, "text", 8)
      import s.implicits._
      merges.zipWithIndex
        .map { case (m, i) => (i + 1, m.left, m.right, m.count) }
        .toDF("rank", "lsym", "rsym", "n")
    },
    oracle = None,
    // 8 sequential (agg + argmax + map) iterations = 8 job floors by
    // construction — a training loop, not a query; excluded from the
    // headline timing set, still in the Verify gate
    bench = false)

  /** BPE ENCODING with a FIXED merge table — the deployment-realistic
    * op: a tokenizer ships with the model and is APPLIED to every new
    * corpus, not retrained per corpus. Application is
    * [[graft.pipeline.Bpe.tokenCounts]]'s narrow map (merge rules are
    * driver-broadcast plain state; no shuffle at all, any scale). The
    * oracle replays greedy left-to-right merging EXACTLY via a
    * recursive CTE that replaces the LEFTMOST `|l|r|` occurrence one at
    * a time, advancing to the next rule only at fixpoint.
    * Replace-first-to-fixpoint ≡ [[Bpe.applyMerge]]'s one-pass greedy
    * scan: merging the leftmost pair can never create a NEW (l,r)
    * adjacency earlier in the word (the merged symbol `lr` equals
    * neither `l` nor `r`), so the next leftmost occurrence is the same
    * one the single-pass scan visits next. A single non-overlapping
    * `replace()` per rule — the previous oracle — diverges on
    * back-to-back occurrences (`tata`: the shared delimiter is consumed
    * and only one merge lands), which this replay handles correctly.
    */
  val bpeEncode: Q = {
    val rules = Seq(
      "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
      "s" -> "c", "sc" -> "a", "sca" -> "n", "a" -> "g")
    val ruleRows = rules.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1}, '|$l|$r|', '|$l$r|')" }
      .mkString(", ")
    Q(
      "pipe_bpe_encode",
      (s: SparkSession, dir: String) =>
        graft.pipeline.Bpe.tokenCounts(
            Testdata(s, dir).documents, "text", "doc_id",
            rules.map { case (l, r) => graft.pipeline.Bpe.Merge(l, r, 0L) })
          .select(col("id").as("doc_id"),
            col("bpe_tokens").cast("long").as("bpe_tokens"))
          .orderBy("doc_id"),
      Some(
        s"""WITH RECURSIVE rules(ri, pat, rep) AS (
           |  VALUES $ruleRows),
           |words AS (
           |  SELECT doc_id,
           |    '|' || array_to_string(string_split_regex(w, ''), '|') || '|' AS s
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           |        FROM documents)
           |  WHERE length(w) > 0),
           |enc AS (
           |  SELECT doc_id, s, 1 AS ri FROM words
           |  UNION ALL
           |  SELECT e.doc_id,
           |    CASE WHEN instr(e.s, r.pat) > 0
           |      THEN substr(e.s, 1, instr(e.s, r.pat) - 1) || r.rep
           |           || substr(e.s, instr(e.s, r.pat) + length(r.pat))
           |      ELSE e.s END AS s,
           |    CASE WHEN instr(e.s, r.pat) > 0 THEN e.ri ELSE e.ri + 1 END AS ri
           |  FROM enc e JOIN rules r ON r.ri = e.ri)
           |SELECT doc_id,
           |  CAST(SUM((length(s) - length(replace(s, '|', ''))) - 1) AS BIGINT)
           |    AS bpe_tokens
           |FROM enc WHERE ri = ${rules.size + 1}
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  }

  override def queries: Seq[Q] =
    Seq(bpePairs, datasetSplit, hardNegatives, textNormalize,
      annIvfMultiprobe, bpeTrain, bpeEncode)
}
