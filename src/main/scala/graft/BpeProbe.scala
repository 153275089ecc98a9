package graft

import graft.util.GraftSession

/** BPE trainer throughput: one distributed (word, count) rollup over
  * the corpus, then the driver-local merge loop at production depth —
  * reports merges/s at 1k merges (the number SCALE.md carries; a 32k
  * vocabulary extrapolates linearly in merges since per-merge work is
  * bounded by affected words).
  *
  *   sbt "runMain graft.BpeProbe /root/testdata/sf0.1 1000"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "bpeprobe")
    val docs = graft.sources.Testdata(spark, dir).documents
    // (a) the real corpus end-to-end (the synthetic vocabulary is 31
    // words and saturates at 89 merges — confirmed by the independent
    // python trainer — so the wall here is ≈ the one Spark rollup)
    val t0 = System.nanoTime()
    val merges = graft.pipeline.Bpe.train(docs, "text", nMerges)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"PROBE bpe_train corpus merges=${merges.size} wall=$dt%.2f s " +
      "(incl. the one distributed (word,count) rollup)")
    // (b) the driver-local merge LOOP at web-scale vocabulary size:
    // 50k distinct pseudo-words (seeded, deterministic), 1k merges —
    // the number a 32k-merge production vocabulary extrapolates from
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val vocab = (1 to 50000).map { _ =>
      val len = 4 + rnd.nextInt(10)
      (Seq.fill(len)(alpha(rnd.nextInt(26))).mkString,
        1L + rnd.nextInt(1000))
    }.distinct
    val t1 = System.nanoTime()
    val local = graft.pipeline.Bpe.trainLocal(vocab, nMerges)
    val dt1 = (System.nanoTime() - t1) / 1e9
    println(f"PROBE bpe_train loop vocab=${vocab.size} merges=${local.size} " +
      f"wall=$dt1%.2f s (${local.size / dt1}%.0f merges/s driver-local)")
    spark.stop()
  }
}
