package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the round-10 additions: BM25 ranking (ts3), the
  * n-gram-Jaccard evaluation (ev4) and the numeric-drift monitor
  * (cd3). Value-level correctness is pinned by the DuckDB oracle
  * gate; these pin the algorithmic properties the oracle can't
  * express — ts3 against a from-scratch driver-side BM25, ev4
  * against ll6's own pair output, cd3's quarter-bit log against its
  * integer twin.
  */
class SearchDriftSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = {
    assume(new java.io.File(sfDir).exists())
    SparkEntry.queries(name)(spark, sfDir)
  }

  test("ts3 BM25: engine scores match a from-scratch driver-side BM25") {
    assume(new java.io.File(sfDir).exists())
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val terms = Set("spark", "merge", "vector")
    val toks = docs.view.mapValues(_.split(" ", -1).toSeq).toMap
    val nDocs = docs.size.toLong
    val total = toks.valuesIterator.map(_.size.toLong).sum
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val expected = toks.flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val contribs = terms.toSeq.flatMap { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0L) None
        else {
          val idfq = (nDocs * 1000000L) / (df(t) + 1L)
          val sat = (tf.toDouble * 2.2) /
            (tf.toDouble + (1.2 * (0.25 + (0.75 * ((dl.toDouble * nDocs.toDouble) / total.toDouble)))))
          Some(math.floor(idfq.toDouble * sat).toLong)
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> (contribs.sum, contribs.size.toLong))
    }
    val top = expected.toSeq.sortBy { case (id, (sc, _)) => (-sc, id) }.take(20)
    val got = run("ts3_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length === top.length)
    top.zipWithIndex.foreach { case ((id, (sc, nt)), i) =>
      assert(got(i) === ((i + 1L, id, sc, nt)),
        s"rank ${i + 1}: engine ${got(i)} vs driver-side BM25 ($id, $sc, $nt)")
    }
  }

  test("ev4 jaccard eval: counts reconcile with ll6's pair output and the planted truth") {
    val pairs = run("ll6_ngram_jaccard")
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nTruth = Tables.documents(spark, sfDir).count()
    val nHit = pairs.count { case (a, b) => b == a + 100000000L }
    val row = run("ev4_jaccard_eval").collect().head
    assert(row.getLong(0) === nTruth)
    assert(row.getLong(1) === pairs.length.toLong)
    assert(row.getLong(2) === nHit.toLong)
    assert(row.getLong(4) === (pairs.length - nHit).toLong)
    val recall = row.getDouble(3)
    assert(recall >= 0.0 && recall <= 1.0)
    // the planted copies only drop the first word, which removes a
    // single 3-gram shingle — exact Jaccard at 0.6 must recover most
    // of them, or the pipeline is broken
    assert(recall > 0.5, s"planted-copy recall collapsed to $recall")
  }

  test("cd3 drift: ppm/quarter-bit columns reconcile with integer twins; totals conserve") {
    val rows = run("cd3_value_drift").collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7))
    }
    assert(rows.nonEmpty)
    val na = rows.map(_._2).sum
    val nb = rows.map(_._3).sum
    val nbins = rows.length.toLong
    assert(na + nb === Tables.events(spark, sfDir).count(),
      "every event lands in exactly one (bin, half) cell")
    def q4(x: Long): Long = TextAnalysis.q4At(x)
    rows.foreach { case (bin, ca, cb, paPpm, pbPpm, deltaQb, contribQ, drifted) =>
      assert(ca + cb > 0L, s"empty bin $bin emitted")
      assert(paPpm === (ca + 1L) * 1000000L / (na + nbins))
      assert(pbPpm === (cb + 1L) * 1000000L / (nb + nbins))
      assert(deltaQb === (q4(ca + 1L) - q4(cb + 1L)) + (q4(nb + nbins) - q4(na + nbins)),
        s"bin $bin: quarter-bit log drifted from the integer twin")
      assert(contribQ === (paPpm - pbPpm) * deltaQb)
      assert(drifted === (contribQ >= 1000L))
    }
  }

  test("ev15 scores the fusion on planted truth: fused coverage is the UNION of " +
    "the legs' and the fused MRR dominates the lossy text leg") {
    assume(new java.io.File(sfDir).exists())
    val rows = run("ev15_hybrid_retrieval_eval").collect().map(r => (
      r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.map(_._1).sorted.toSeq === (0L to 9L), "one row per ann query")
    // structural RRF property: a twin found by EITHER leg has a fused
    // rank, so fused coverage ≥ each leg's
    rows.foreach { case (q, t, v, f) =>
      assert((t.isDefined || v.isDefined) === f.isDefined,
        s"query $q: fused coverage must be the union of the legs'")
    }
    // on the gate corpus: BM25 misses/demotes some reordered or
    // first-word-dropped twins, the embedding leg anchors them, and
    // the fused ranking stays at the top — the number that justifies
    // running both legs
    def mrr(ranks: Seq[Option[Long]]): Long =
      ranks.map(_.fold(0L)(r => 1000000L / r)).sum / ranks.size
    val (ts, vs, fs) = (rows.map(_._2).toSeq, rows.map(_._3).toSeq, rows.map(_._4).toSeq)
    assert(fs.forall(_.exists(_ <= 3L)),
      s"every planted twin must fuse into the top-3, got $fs")
    assert(mrr(fs) > mrr(ts),
      s"fused MRR must dominate the lossy text leg: fused=${mrr(fs)} text=${mrr(ts)}")
    assert(vs.forall(_.contains(1L)),
      "the crawl-aligned embedding twin is each query's nearest vector")
  }

  test("ts8 hybrid fusion BEATS each leg alone on planted relevance: the twin " +
    "each leg ranks second fuses to rank one") {
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ts8").toString
    // query doc 0; relevant twin 100 shares TWO rare terms AND a close
    // embedding (second in both legs); lexical distractor 200 shares
    // THREE rare terms but its vector is orthogonal (text rank 1, off
    // the vec top-5); semantic distractor 300 has the closest vector
    // but no shared vocabulary (vec rank 1, off the text ranking);
    // fillers 301-303 pad the vec top-5 so 200 stays out of it
    val docs = Seq(
      0L -> "alpha beta gamma delta eps q01 q02 q03 q04 q05",
      100L -> "alpha beta r01 r02 r03 r04 r05 r06 r07 r08",
      200L -> "gamma delta eps d01 d02 d03 d04 d05 d06 d07",
      300L -> "v01 v02 v03 v04 v05 v06 v07 v08 v09 v10",
      301L -> "f11 f12 f13 f14 f15 f16 f17 f18 f19 f20",
      302L -> "g11 g12 g13 g14 g15 g16 g17 g18 g19 g20",
      303L -> "h11 h12 h13 h14 h15 h16 h17 h18 h19 h20")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def v(xs: Float*): Seq[Float] = xs.toSeq
    val vecs = Seq(
      (0L, v(1f, 0f, 0f, 0f)),
      (100L, v(10f, 3f, 0f, 0f)), // cos ≈ 0.958 — second
      (200L, v(0f, 0f, 1f, 0f)),  // cos 0 — off the top-5
      (300L, v(10f, 1f, 0f, 0f)), // cos ≈ 0.995 — first
      (301L, v(10f, 4f, 0f, 0f)), // ≈ 0.928
      (302L, v(10f, 5f, 0f, 0f)), // ≈ 0.894
      (303L, v(10f, 6f, 0f, 0f))) // ≈ 0.857
    vecs.map { case (id, e) => (id, e, 1) }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("ts8_hybrid_rrf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(out.forall(_._1 === 0L), "only doc 0 is in the query id range")
    val byDoc = out.map(r => r._3 -> r).toMap
    // each leg alone puts its own distractor first…
    assert(byDoc(200L)._5 === Some(1L) && byDoc(200L)._6 === None,
      "lexical leg alone must rank the vocabulary distractor first")
    assert(byDoc(300L)._6 === Some(1L) && byDoc(300L)._5 === None,
      "semantic leg alone must rank the embedding distractor first")
    assert(byDoc(100L)._5 === Some(2L) && byDoc(100L)._6 === Some(2L),
      "the planted twin is second in BOTH legs")
    // …and the fusion recovers the twin: recall@1 goes 0/0 -> 1
    val first = out.find(_._2 === 1L).get
    assert(first._3 === 100L,
      s"hybrid rank 1 must be the planted twin, got doc ${first._3}")
    // 2/62nds beat 1/61st exactly as RRF intends
    assert(first._4 === 2L * (1000000L / 62L) &&
      byDoc(200L)._4 === 1000000L / 61L && byDoc(300L)._4 === 1000000L / 61L)
  }
}
