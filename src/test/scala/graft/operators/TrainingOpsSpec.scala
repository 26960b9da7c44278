package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariants for the round-5 training-pipeline operators: quantized
  * two-stage ANN, semantic dedup, classifier inference, domain mixing.
  * (Value-level correctness is pinned by the DuckDB oracle gate; these
  * pin the algorithmic properties the oracle can't express.)
  */
class TrainingOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = {
    assume(new java.io.File(sfDir).exists())
    SparkEntry.queries(name)(spark, sfDir)
  }

  test("ll4b sampled k-means trainer: assignment covers the full corpus, training only reads the sample") {
    assume(new java.io.File(sfDir).exists())
    val sess = spark
    import sess.implicits._
    val qe = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
    val n = qe.count()
    // step > 1: the trainer must see only every 3rd vector yet still
    // assign EVERY corpus vector to one of the k cells
    val cells = Similarity.trainCells(qe, 4, 2, 64, sampleStep = 3L)
    val out = cells.select(col("vec_id"), col("cell")).collect()
    assert(out.length == n, "every corpus vector gets a cell")
    assert(out.map(_.getLong(1)).forall(c => c >= 0 && c < 4), "cells in [0, k)")
    // sampled training is deterministic: a second run agrees exactly
    val again = Similarity.trainCells(qe, 4, 2, 64, sampleStep = 3L)
      .select(col("vec_id"), col("cell")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      again.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("ll26 distributed Lloyd == driver-side Lloyd when the sample is the full corpus") {
    assume(new java.io.File(sfDir).exists())
    val qe = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
    // trainCells(sampleStep=1) runs the SAME init (8 lowest ids) and
    // the same 2 integer Lloyd iterations, just driver-side over the
    // collected corpus — the distributed aggregate must agree on
    // every final cell assignment
    val init = qe.orderBy(col("vec_id")).limit(8)
      .collect().map(_.getSeq[Long](1).toArray)
    val distributed = Similarity
      .assignCells(qe, Similarity.lloydRefine(qe, init, iters = 2, dim = 64))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val driverSide = Similarity.trainCells(qe, 8, 2, 64, sampleStep = 1L)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(distributed === driverSide)
  }

  test("q40 label propagation: distributed rounds equal a driver-side reference LPA") {
    val sess = spark
    import sess.implicits._
    // seeded random graph; the reference is an independent plain-Scala
    // synchronous LPA with the same (count desc, label asc) pick, so
    // any divergence in the join/agg pipeline (vote counting, tie
    // order, isolated-vertex carry) surfaces as a label mismatch
    val rnd = new scala.util.Random(11)
    val verts = (0 until 10).map(i => f"v$i%02d")
    val edgeSet = (for {
      i <- verts.indices; j <- (i + 1) until verts.length
      if rnd.nextDouble() < 0.3
    } yield (verts(i), verts(j))).toSeq
    val vertices = (verts :+ "lone").toDF("domain")
    val got = Linkage.labelPropagation(edgeSet.toDF("a", "b"), vertices, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val adj = (edgeSet ++ edgeSet.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var ref = (verts :+ "lone").map(v => v -> v).toMap
    for (_ <- 1 to 3) ref = ref.map { case (v, old) =>
      adj.get(v) match {
        case None => v -> old
        case Some(nbs) =>
          val votes = nbs.groupBy(ref).view.mapValues(_.size).toSeq
          v -> votes.minBy { case (lbl, c) => (-c, lbl) }._1
      }
    }
    assert(got === ref)
    assert(got("lone") === "lone", "isolated vertex keeps its own label")
  }

  test("prof12 equi-depth: buckets conserve the corpus and are value-ordered") {
    val out = run("prof12_equidepth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val n = graft.Tables.events(spark, sfDir).count()
    assert(out.map(_._2).sum === n, "bucket counts conserve the corpus")
    assert(out.forall(b => b._1 >= 0 && b._1 <= 7))
    out.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo._4 <= hi._3, s"bucket ${lo._1} range overlaps ${hi._1}")
      case _ =>
    }
  }

  test("ll16 quantized ANN: high recall@5 against the exact brute-force baseline") {
    val exact = run("ll3_ann_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq = run("ll16_quantized_ann").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & sq).size.toDouble / exact.size
    // int8-range codes + top-20 rerank keep nearly all true neighbors;
    // anything below 0.8 means the quantizer or rerank regressed
    assert(recall >= 0.8, s"recall@5 = $recall")
    // two-stage output is still exactly 5 per query
    assert(sq.size === exact.size)
  }

  test("ll34 IVF-PQ ANN: useful recall@5 vs brute force, near-lossless vs its " +
    "own coarse pruning") {
    val exact = run("ll3_ann_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfpq = run("ll34_ivfpq_ann").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // vs brute force the loss is dominated by nprobe=1 cell misses
    // (ll4b shares them); measured 0.74 at sf0.01 — 0.5 is the
    // regressed-to-garbage floor
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 vs brute = $recall")
    // vs the SAME cells searched exactly (ll4b), the PQ codes + top-50
    // rerank must be near-lossless — this isolates the residual-coding
    // quality from the shared coarse-pruning loss
    val ivf = run("ll4b_ann_ivf_trained").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val vsIvf = (ivf & ivfpq).size.toDouble / ivf.size
    assert(vsIvf >= 0.85, s"recall@5 vs exact-within-cell = $vsIvf")
    assert(ivfpq.size === exact.size)
  }

  test("ll35 nprobe=2: widening the probed cells is recall-MONOTONE over " +
    "ll34's nprobe=1 read of the same maintained index") {
    val exact = run("ll3_ann_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val np1 = run("ll34_ivfpq_ann").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val np2 = run("ll35_ivfpq_nprobe").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val r1 = (exact & np1).size.toDouble / exact.size
    val r2 = (exact & np2).size.toDouble / exact.size
    // the second-nearest cell recovers neighbors the coarse quantizer
    // put across the boundary. (Not a theorem — the ADC top-50 cut
    // sees more candidates under nprobe=2 and could in principle
    // displace a true neighbor past 50 — but the pipeline is fully
    // deterministic, so this pin is stable on the gate corpus and a
    // failure after an algorithm change is a real recall question.)
    assert(r2 >= r1, s"nprobe=2 recall $r2 must be >= nprobe=1 recall $r1")
    assert(r2 >= 0.5, s"recall@5 vs brute = $r2")
    assert(np2.size === exact.size)
  }

  test("ll24 PQ ANN: useful recall@5 against the exact brute-force baseline") {
    val exact = run("ll3_ann_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = run("ll24_pq_ann").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // 32-bit PQ codes are a 64x compression — recall is necessarily
    // below ll16's 512-bit SQ8 (measured: 0.8 at sf0.01, and the
    // sf0.001 corpus trains on ~60 samples); below 0.5 means the
    // trainer, encoder, or ADC ranking regressed
    assert(recall >= 0.5, s"recall@5 = $recall")
    assert(pq.size === exact.size)
  }

  test("ll17 semantic dedup: reps always kept, drops only above-threshold members") {
    val out = run("ll17_semantic_dedup")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // every row's representative is the min vec_id of its bucket
    val minByBucket = rows.groupBy(_._2).map { case (b, rs) => b -> rs.map(_._1).min }
    rows.foreach { case (_, b, rep, _) => assert(rep === minByBucket(b)) }
    // representatives themselves are kept
    rows.filter(r => r._1 == r._3).foreach { case (v, _, _, kept) =>
      assert(kept, s"rep $v dropped")
    }
    // the perturbed twin construction guarantees some semantic dups exist
    assert(rows.exists(!_._4), "no member was ever dropped — corpus construction broken")
  }

  test("ta10 classifier: feature count is exactly unigrams + adjacent bigrams") {
    val nWords = run("ta10_quality_classifier")
      .join(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw")),
        "doc_id")
      .select(col("n_feats"), col("nw")).collect()
    nWords.foreach { r =>
      val (nf, nw) = (r.getLong(0), r.getLong(1))
      assert(nf === (if (nw >= 2) 2 * nw - 1 else nw))
    }
  }

  test("ta11 domain mix: per-stratum output fills min(quota, stratum size)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val strata = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = run("ta11_domain_mix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byLang = out.groupBy(_._2)
    byLang.foreach { case (lang, rs) =>
      val quota = rs.head._4
      assert(rs.length.toLong === math.min(quota, strata(lang)))
      // ranks are exactly 1..kept with no gaps
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // sqrt temperature upsamples small strata: the sampled fraction of
    // the smallest stratum is >= that of the largest
    val smallest = strata.minBy(_._2)._1
    val largest = strata.maxBy(_._2)._1
    if (smallest != largest && byLang.contains(smallest) && byLang.contains(largest)) {
      val fSmall = byLang(smallest).length.toDouble / strata(smallest)
      val fLarge = byLang(largest).length.toDouble / strata(largest)
      assert(fSmall >= fLarge)
    }
  }

  test("cd1 snapshot diff emits exactly the delta implied by the slice rules") {
    val ids = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected =
      ids.filter(id => id % 11 == 7 && id % 13 != 5).map(_ -> "added") ++
      ids.filter(id => id % 13 == 5 && id % 11 != 7).map(_ -> "removed") ++
      ids.filter(id => id % 7 == 2 && id % 11 != 7 && id % 13 != 5).map(_ -> "changed")
    val got = run("cd1_snapshot_diff")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got === expected, "delta manifest must match the slice rules; unchanged docs never appear")
  }

  test("cp5 release: tokens are conserved across the attrition ledger, every gate fires") {
    val rows = run("cp5_pretraining_release").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val input = rows.filter(_._1 == "input")
    assert(input.length === 1)
    val rest = rows.filterNot(_._1 == "input")
    // CONSERVATION: every input doc and token is either in a shard or
    // attributed to exactly one gate — nothing vanishes, nothing
    // double-counts
    assert(rest.map(_._2).sum === input.head._2, "docs must be conserved")
    assert(rest.map(_._3).sum === input.head._3, "tokens must be conserved")
    // no hollow arms: each curation gate must actually drop documents
    // on the mixed-crawl fixture (identical re-crawls for exact,
    // drifted twins for MinHash, reordered templates for semantic,
    // the bench holdout for decon)
    val gates = rest.filter(_._1.startsWith("gate:")).map(r => r._1 -> r._2).toMap
    for (g <- Seq("gate:exact_dedup", "gate:near_dedup", "gate:semantic_dedup",
        "gate:decontamination", "gate:quality", "gate:perplexity"))
      assert(gates.getOrElse(g, 0L) > 0L, s"$g dropped nothing — hollow gate")
    // the release itself is non-empty and split across train/val/test
    val shards = rest.filter(_._1.startsWith("shard:"))
    assert(shards.nonEmpty && shards.map(_._3).sum > 0L)
    assert(shards.map(_._1.split(":")(1)).distinct.length === 3,
      "all three splits must receive shards")
  }

  test("cp6 release: the substring rewrite cuts tokens that flow through " +
    "sampling and packing, and conservation holds with the cut row") {
    val rows = run("cp6_release_substr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val input = rows.filter(_._1 == "input")
    assert(input.length === 1)
    val cut = rows.filter(_._1 == "cut:substr")
    assert(cut.length === 1)
    // the rewrite actually fired: the planted boilerplate passage is
    // shared by multiple gate SURVIVORS, each losing exactly its
    // 24-token occurrence (doc-level gates cannot see these)
    assert(cut.head._2 >= 2L, s"at least two planted survivors must be cut: $cut")
    // every planted survivor loses at least its 24-token occurrence;
    // naturally-duplicated >= 15-grams in the corpus may add more
    assert(cut.head._3 >= cut.head._2 * 24L,
      s"each cut survivor loses at least the 24-token passage: $cut")
    // TOKEN conservation includes the cut row (removed tokens are
    // attributed, not vanished); DOC conservation excludes it (a cut
    // doc still ships through sampling/packing)
    val rest = rows.filterNot(r => r._1 == "input" || r._1 == "cut:substr")
    assert(rest.map(_._3).sum + cut.head._3 === input.head._3,
      "tokens must conserve: gates + cut + sampled_out + shards = input")
    assert(rest.map(_._2).sum === input.head._2,
      "docs must conserve over gates + sampled_out + shards (cut row excluded)")
    // downstream stages really run on POST-CUT counts: the same corpus
    // released WITHOUT the rewrite ships more tokens
    val cp5Like = graft.operators.Pipeline.cp5ReleaseOf(spark, sfDir,
        graft.operators.Pipeline.cp6AttributionOf(spark, sfDir,
          graft.operators.Pipeline.cp6Corpus(spark, sfDir),
          graft.operators.Pipeline.cp5TwinVecs(spark, sfDir)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val shippedWith = rows.filter(r =>
      r._1.startsWith("shard:") || r._1 == "gate:pps_sampled_out").map(_._3).sum
    val shippedWithout = cp5Like.filter(r =>
      r._1.startsWith("shard:") || r._1 == "gate:pps_sampled_out").map(_._3).sum
    assert(shippedWith === shippedWithout - cut.head._3,
      "survivor tokens downstream of the rewrite must drop by exactly the cut total")
  }

  test("ev16 rebuild verdict FLIPS on the planted drift: identity re-embedding " +
    "reads rebuild=false, cd2's drift fires the dim leg, a raised floor fires " +
    "the recall leg alone") {
    assume(new java.io.File(sfDir).exists())
    // identity re-embedding: nothing moved, the frozen index serves its
    // own corpus — no rebuild
    val same = Similarity.ivfPqRebuildCheckOf(spark, sfDir, None).collect()
    assert(same.forall(!_.getAs[Boolean]("rebuild")),
      "identity re-embedding must not demand a rebuild")
    assert(same.forall(_.getAs[Long]("n_drifted_dims") == 0L))
    val sameRecall = same.head.getAs[Long]("mean_recall_ppm")
    assert(sameRecall >= 600000L,
      s"undrifted frozen-index recall must clear the floor: $sameRecall")
    // cd2's planted drift: 32 of 64 dims move -> the dim leg fires
    // regardless of recall
    val drifted = SparkEntry.queries("ev16_index_rebuild_check")(spark, sfDir).collect()
    assert(drifted.forall(_.getAs[Boolean]("rebuild")),
      "the planted 32-dim drift must demand a rebuild")
    assert(drifted.forall(_.getAs[Long]("n_drifted_dims") == 32L))
    // recall leg alone: same corpus, floor raised above any achievable
    // recall — the OR's second arm must flip the verdict by itself
    val floored = Similarity.ivfPqRebuildCheckOf(spark, sfDir, None,
      recallFloorPpm = 1000001L).collect()
    assert(floored.forall(_.getAs[Boolean]("rebuild")),
      "a recall floor above 1.0 must flip the verdict via the recall leg")
    assert(floored.forall(_.getAs[Long]("n_drifted_dims") == 0L))
  }

  test("ll36 graph-walk ANN equals an independent driver-side beam replay, " +
    "and the walk actually improves on the entry point") {
    assume(new java.io.File(sfDir).exists())
    val out = run("ll36_graph_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val edges = run("ll28_knn_graph").collect().map(r => (r.getLong(0), r.getLong(2)))
    val sym = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // same accumulation as dot_native: Σ double(a_i)·double(b_i), in order
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def sim(q: Long, n: Long): Double =
      dot(emb(q), emb(n)) / math.sqrt(dot(emb(q), emb(q)) * dot(emb(n), emb(n)))
    // the coarse router, replayed independently: bucket = the 8
    // hyperplane dot signs; entry = min id in the query's bucket
    val planes = (0 until 8).map(j => Similarity.hyperplane(j, 64).map(_.toDouble))
    def bucketOf(v: Array[Float]): Long =
      (0 until 8).map { j =>
        val d = v.indices.foldLeft(0.0)((s, i) => s + v(i).toDouble * planes(j)(i))
        if (d >= 0) 1L << j else 0L
      }.sum
    val buckets = emb.map { case (id, v) => id -> bucketOf(v) }
    val entryOf = buckets.groupBy(_._2).view.mapValues(_.keys.min).toMap
    var answered = 0
    for (q <- emb.keys.filter(_ < 10).toSeq.sorted) {
      val entry = entryOf(buckets(q))
      var beam = Seq(entry)
      for (_ <- 1 to 3) {
        val cand = (beam ++ beam.flatMap(n => sym.getOrElse(n, Set.empty[Long]))).distinct
        beam = cand.map(n => (n, sim(q, n)))
          .sortBy { case (n, sm) => (-sm, n) }.take(4).map(_._1)
      }
      val expect = beam.filter(_ != q).map(n => (n, sim(q, n)))
        .sortBy { case (n, sm) => (-sm, n) }.take(3).map(_._1)
      val got = out.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(got == expect, s"walk diverged from the driver replay for query $q")
      if (got.nonEmpty) answered += 1
    }
    // non-vacuity only — on this tiny corpus a routed entry is often
    // already its bucket's best; that the walk MOVES is pinned by the
    // planted-twin test below
    assert(answered > 0, "the walk must answer at least one query")
  }

  test("ll38 widened beam: per-query top-hit similarity and recall@3 vs brute " +
    "never drop against the beam-4 walk on this corpus") {
    assume(new java.io.File(sfDir).exists())
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def sim(q: Long, n: Long): Double =
      dot(emb(q), emb(n)) / math.sqrt(dot(emb(q), emb(q)) * dot(emb(n), emb(n)))
    def byQuery(name: String): Map[Long, Seq[Long]] =
      run(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val b4 = byQuery("ll36_graph_ann")
    val b8 = byQuery("ll38_graph_ann_beam8")
    // exact top-3 per query (the brute truth)
    val queries = emb.keys.filter(_ < 10).toSeq.sorted
    val truth = queries.map(q => q -> emb.keys.filter(_ != q).toSeq
      .map(n => (n, sim(q, n))).sortBy { case (n, s) => (-s, n) }
      .take(3).map(_._1).toSet).toMap
    var (hits4, hits8) = (0, 0)
    for (q <- queries) {
      val (n4, n8) = (b4.getOrElse(q, Seq.empty), b8.getOrElse(q, Seq.empty))
      if (n4.nonEmpty && n8.nonEmpty)
        assert(sim(q, n8.head) >= sim(q, n4.head),
          s"query $q: the widened beam's top hit must not be worse")
      hits4 += n4.count(truth(q)); hits8 += n8.count(truth(q))
    }
    assert(hits8 >= hits4,
      s"recall@3 must not drop when the beam widens: beam8=$hits8 < beam4=$hits4")
  }

  test("the routed walk retrieves planted twins — graph ANN works when the " +
    "data HAS structure (the raw corpus is near-orthogonal noise: ev1's IVF " +
    "recall reads ~0.1 there too, so twins are the meaningful exhibit)") {
    assume(new java.io.File(sfDir).exists())
    val sess = spark
    import sess.implicits._
    // corpus = base ∪ exact ×2-scaled twins: doubling every float is
    // exact, so a twin lands in its base's bucket deterministically
    // with cosine ~1 — a planted nearest neighbor the walk MUST find
    val base = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val twins = base.select((col("vec_id") + 100000L).as("vec_id"),
      expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))").as("embedding"))
    val corpus = base.unionByName(twins)
    val g = Similarity.bucketTop3(Similarity.lshBucketed(corpus))
    val e = Similarity.withNorm(corpus)
      .select(col("vec_id").as("node"), col("embedding"), col("nrm"))
    val queries = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val q = Similarity.withNorm(
        queries.select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val entries = Similarity.lshBucketed(corpus)
      .groupBy(col("bucket")).agg(min(col("vec_id")).as("entry"))
    val out = Similarity.graphWalk(e, g, q,
        Similarity.routeOf(entries, queries)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nQueries = queries.count()
    val found = out.count { case (qid, _, nb) => nb == qid + 100000L }
    assert(found == nQueries,
      s"every query's planted twin must surface in its top-3: $found/$nQueries")
    out.filter { case (qid, _, nb) => nb == qid + 100000L }.foreach {
      case (qid, rank, _) =>
        assert(rank == 1L, s"query $qid: the twin (cosine ~1) must rank first")
    }
  }
}
