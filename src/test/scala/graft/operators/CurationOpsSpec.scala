package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariants for the round-10 curation operators: DSIR importance
  * resampling, char-bigram entropy filtering, cluster quality
  * propagation, and histogram profiling. (Value-level correctness is
  * pinned by the DuckDB oracle gate; these pin the algorithmic laws
  * and the hand-computable fixtures the oracle can't express.)
  */
class CurationOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = {
    assume(new java.io.File(sfDir).exists())
    SparkEntry.queries(name)(spark, sfDir)
  }

  test("ta18 entropy stage: hand-computed fixtures (runs, empty, keep threshold)") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      (1L, "aaaa"),     // 3x "aa": zero entropy -> flag
      (2L, "abab"),     // counts [2,1]: 1 bit -> flag
      (3L, "abcdefgh"), // 7 distinct bigrams: 7*ilog2(7)=14 >= 2*7 -> keep
      (4L, ""),         // no bigrams -> flag
      (5L, "x")         // single char -> no bigrams -> flag
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withCharBigramEntropy(df)
      .select("doc_id", "n_bigrams", "n_distinct", "entropy_bits", "verdict")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((3L, 1L, 0L, "flag")))
    assert(out(2L) === ((3L, 2L, 1L, "flag")))
    assert(out(3L) === ((7L, 7L, 14L, "keep")))
    assert(out(4L) === ((0L, 0L, 0L, "flag")))
    assert(out(5L) === ((0L, 0L, 0L, "flag")))
  }

  test("ta18 plan is exchange-free: the entropy filter is a pure scan") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try run("ta18_entropy_quality").queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(flatten)
    val exchanges = flatten(plan).filter(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(exchanges.isEmpty, "row-local entropy must not shuffle")
  }

  test("ta17 DSIR: selection law and token conservation on the gate corpus") {
    val out = run("ta17_dsir_sample").collect()
    // selected <=> weight_bits >= 0
    out.foreach { r =>
      assert(r.getBoolean(3) === (r.getLong(2) >= 0L),
        s"doc ${r.getLong(0)}: selected flag disagrees with weight_bits")
    }
    // every corpus token scores exactly once
    val totalTokens = graft.Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")))).first().getLong(0)
    assert(out.map(_.getLong(1)).sum === totalTokens)
  }

  test("ta17 DSIR discriminates on a two-domain fixture (gate corpus shares one vocab)") {
    val sess = spark
    import sess.implicits._
    // distinct vocabularies: the importance ratio must favor the
    // target domain and reject the off-target one
    val docs = Seq(
      (1L, "apple banana cherry apple banana", true),
      (2L, "banana cherry apple cherry apple", true),
      (3L, "dog emu fox dog emu", false),
      (4L, "fox dog emu fox dog", false)
    ).toDF("doc_id", "text", "is_tgt")
    val out = TextAnalysis.dsirScore(docs, col("is_tgt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L)._2 && out(2L)._2, "target-vocab docs must be selected")
    assert(!out(3L)._2 && !out(4L)._2, "off-target docs must be rejected")
    val minTgt = Seq(out(1L)._1, out(2L)._1).min
    val maxOff = Seq(out(3L)._1, out(4L)._1).max
    assert(minTgt > maxOff, "target docs must outscore off-target docs")
  }

  test("ll23 propagation: cluster verdict = flag iff any member flags; sizes exact") {
    val rows = run("ll23_quality_propagation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (canon, members) =>
      val expect = if (members.exists(_._3 == "flag")) "flag" else "keep"
      members.foreach { m =>
        assert(m._4 === expect, s"cluster $canon: wrong propagated verdict")
        assert(m._5 === members.length.toLong, s"cluster $canon: wrong n_members")
      }
    }
    // same partition of the corpus as ll9's clustering
    val ll9 = run("ll9_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (doc, canon, _, _, _) =>
      assert(ll9(doc) === canon, s"doc $doc: canon disagrees with ll9")
    }
  }

  test("ta19 sequence packing: spans conserve tokens, sequences fill to exactly 512") {
    val rows = run("ta19_sequence_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per doc: spans are contiguous from offset 0 and sum to the count
    val sess = spark
    import sess.implicits._
    val tokCounts = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (doc, spans) =>
      val s = spans.sortBy(_._1)
      assert(s.head._3 === 0L, s"doc $doc: first span must start at offset 0")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + a._4, s"doc $doc: spans must be contiguous")
          assert(b._1 === a._1 + 1, s"doc $doc: split spans must hit adjacent sequences")
        case _ =>
      }
      assert(s.map(_._4).sum === tokCounts(doc), s"doc $doc: spans must cover every token")
    }
    // per sequence: every sequence is exactly full except the last
    val bySeq = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, total) =>
      if (seq != lastSeq) assert(total === 512L, s"seq $seq must hold exactly 512 tokens")
      else assert(total <= 512L)
    }
  }

  test("prof5 histograms: counts conserve rows, buckets ordered and bounded") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val n = li.count()
    val rows = run("prof5_histograms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (cn, bs) =>
      assert(bs.map(_._3).sum === n, s"$cn: histogram loses rows")
      assert(bs.forall(b => b._2 >= 0L && b._2 <= 15L), s"$cn: bucket out of range")
      // equi-width buckets partition the range: value spans don't overlap
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4,
          s"$cn: bucket ${a._2} max ${a._5} overlaps bucket ${b._2} min ${b._4}")
        case _ =>
      }
      val colMin = li.agg(min(col(cn).cast("double"))).first().getDouble(0)
      val colMax = li.agg(max(col(cn).cast("double"))).first().getDouble(0)
      assert(sorted.head._4 === colMin && sorted.last._5 === colMax)
    }
  }

  test("prof10 FK integrity: counts reconcile with direct key-set arithmetic") {
    val rows = run("prof10_fk_integrity").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.size === 4)
    // independent recomputation for one fact-sized and one dim-sized pair
    val li = graft.Tables.lineitem(spark, sfDir)
    val ok = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val childKeys = li.select("l_orderkey").collect().map(_.getLong(0))
    val (nChild, nOrphan, nUsed, maxFan) = rows("lineitem.orderkey->orders")
    assert(nChild === childKeys.length.toLong)
    assert(nOrphan === childKeys.count(k => !ok.contains(k)).toLong)
    assert(nUsed === childKeys.filter(ok.contains).distinct.length.toLong)
    assert(maxFan === childKeys.groupBy(identity).values.map(_.length).max.toLong)
    val ev = graft.Tables.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
    val ck = graft.Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val (eChild, eOrphan, _, _) = rows("events.user_id->customer")
    assert(eChild === ev.length.toLong)
    assert(eOrphan === ev.count(k => !ck.contains(k)).toLong)
  }

  test("dq1 quality rules: one aggregate pass, clean TPC-H columns pass, planted dirt fails") {
    val report = run("dq1_quality_rules").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(report.size === 7)
    val n = graft.Tables.lineitem(spark, sfDir).count()
    report.values.foreach { case (_, nRows, _, _) => assert(nRows === n) }
    // generator data is clean on the row-level constraints
    (1L to 6L).foreach { id =>
      val (_, _, viol, passed) = report(id)
      assert(passed && viol === 0L, s"rule $id flagged $viol violations on clean data")
    }
    // ...but NOT on the (orderkey, linenumber) key — the synthetic
    // generator draws linenumber randomly, so duplicates exist and the
    // rule must count exactly count - distinct-keys of them
    val keys = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("concat_ws('|', l_orderkey, l_linenumber)")
      .collect().map(_.getString(0))
    val expectedDups = keys.length.toLong - keys.distinct.length.toLong
    val (_, _, dupViol, dupPassed) = report(7L)
    assert(dupViol === expectedDups)
    assert(dupPassed === (expectedDups == 0L))
  }

  test("prof11 FD discovery: verdicts match direct determination checks") {
    val rows = run("prof11_fd_discovery").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.size === 5)
    def check(fd: String, df: org.apache.spark.sql.DataFrame, a: String, b: String) = {
      val pairs = df.select(a, b).collect()
        .map(r => (r.get(0).toString, r.get(1).toString))
      val grouped = pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
      val (nGroups, nExtra, holds) = rows(fd)
      assert(nGroups === grouped.size.toLong, s"$fd group count")
      assert(nExtra === grouped.values.map(_ - 1L).sum, s"$fd extra pairs")
      assert(holds === grouped.values.forall(_ == 1), s"$fd verdict")
    }
    check("nation.nationkey->name", graft.Tables.nation(spark, sfDir),
      "n_nationkey", "n_name")
    check("lineitem.orderkey->partkey", graft.Tables.lineitem(spark, sfDir),
      "l_orderkey", "l_partkey")
    // a true key FD must hold, a fact FD must not (data sanity)
    assert(rows("nation.nationkey->name")._3)
    assert(!rows("lineitem.orderkey->partkey")._3)
    // the registry drives detection: a corrupted frame flips the verdict
    val sess = spark
    import sess.implicits._
    val dirty = Seq(
      (1L, 1, 5.0, 0.05, "A", "O"),      // clean
      (1L, 1, 99.0, 0.5, "X", "Z"),      // dup key + range + set violations
      (2L, 1, 5.0, 0.05, null, "O"))     // null returnflag
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_linestatus")
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    dirty.withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(1L))
      .withColumn("l_extendedprice", lit(1.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_shipdate", lit(null).cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val dr = graft.SparkEntry.queries("dq1_quality_rules")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(dr(2L) === 1L) // null returnflag
    assert(dr(3L) === 1L) // quantity out of range
    assert(dr(4L) === 1L) // discount out of range
    assert(dr(5L) === 1L) // returnflag not in set (null isin -> null -> not counted)
    assert(dr(6L) === 1L) // linestatus not in set
    assert(dr(7L) === 1L) // one duplicated key
  }

  test("w11 SCD2 merge: versions partition time, exactly one current row per key") {
    val rows = run("w11_scd2_merge").collect().map { r =>
      (r.getLong(0), r.getDouble(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5))
    }
    val byKey = rows.groupBy(_._1)
    val nKeys = graft.Tables.customer(spark, sfDir).count()
    assert(byKey.size.toLong === nKeys, "every dimension key survives the merge")
    byKey.foreach { case (k, vs) =>
      val current = vs.filter(_._5)
      assert(current.length === 1, s"key $k must have exactly one current row")
      assert(current.head._4 === -1L, "current row is open-ended")
      if (k % 7 == 3) {
        assert(vs.length === 2, s"changed key $k keeps its closed history row")
        val closed = vs.filter(!_._5).head
        // the closed interval ends where the new one begins
        assert(closed._4 === current.head._3)
        assert(current.head._2 === closed._2 + 100.5)
      } else {
        assert(vs.length === 1, s"unchanged key $k must not grow a version")
      }
    }
  }

  test("ll31 decontamination: equals a literal 13-gram replay; eval copies and twins surface") {
    val rows = run("ll31_decontamination").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows.nonEmpty)
    // literal replay of the rule on the gate corpus (the generator
    // plants real boilerplate, so NON-benchmark docs legitimately
    // surface with partial 'scrub' hits — the operator's whole point)
    val base = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS ws").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector)
    val train = base ++ base.map { case (id, ws) => (id + 100000000L) -> ws.drop(1) }
    def grams(ws: Vector[String]) =
      if (ws.length < 13) Set.empty[String]
      else ws.sliding(13).map(_.mkString(" ")).toSet
    val bench = base.filter(_._1 % 41 == 0).flatMap(d => grams(d._2)).toSet
    val expected = train.flatMap { case (id, ws) =>
      val g = grams(ws)
      val hit = g.count(bench.contains)
      if (hit == 0) None
      else Some(id -> ((g.size.toLong, hit.toLong,
        if (hit * 5 >= g.size * 4) "drop" else "scrub")))
    }.toMap
    assert(rows === expected, "engine result must equal the literal gram replay")
    // the benchmark docs themselves are verbatim in training -> 'drop'
    val benchIds = base.filter(d => d._1 % 41 == 0 && d._2.length >= 13).map(_._1)
    benchIds.foreach { id =>
      val (ng, nc, action) = rows(id)
      assert(nc === ng && action === "drop",
        s"exact eval copy $id must be fully contaminated")
    }
    // every >= 14-word benchmark doc's perturbed twin surfaces too
    base.filter(d => d._1 % 41 == 0 && d._2.length >= 14).foreach { case (id, _) =>
      assert(rows.contains(id + 100000000L), s"twin of $id missing")
    }
  }

  test("ev12 BLEU legs: order-preserving copy scores 1e6 at every n, sorted bag only at n=1") {
    val rows = run("ev12_bleu_precision").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(rows.size === 6)
    Seq(1L, 2L, 3L).foreach(n => assert(rows(("shifted", n)) === 1000000L,
      s"a suffix copy must have perfect clipped precision at n=$n"))
    assert(rows(("sorted", 1L)) === 1000000L,
      "sorting preserves the unigram multiset exactly")
    assert(rows(("sorted", 2L)) < 500000L && rows(("sorted", 3L)) < rows(("sorted", 2L)),
      "destroyed order must collapse the higher-n legs monotonically")
  }

  test("ta26 perplexity: surprisal equals a driver-side LM replay on the gate corpus") {
    val got = run("ta26_perplexity_filter").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // literal replay: KN ppm estimates + milli-bit log2 quantization
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS ws").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).filter(_._2.length >= 2)
    val bgs = docs.flatMap { case (_, ws) => ws.sliding(2).map(p => (p(0), p(1))) }
    val c12 = bgs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1f = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1b = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val b = c12.size.toLong
    val frac = Vector(0L, 169L, 321L, 459L, 584L, 700L, 807L, 906L)
    def surprisal(w1: String, w2: String): Long = {
      val p = (4 * c12((w1, w2)) - 3) * 250000L / c1(w1) +
        (750000L * n1f(w1) / c1(w1)) * (n1b(w2) * 1000000L / b) / 1000000L
      // the engine clamps the PROBABILITY (p=0 → max surprisal), not
      // the quotient — mirror it exactly
      val x = math.max(1L, 1000000L / math.max(1L, p))
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      e * 1000L + frac(((x * 8) >> e).toInt - 8)
    }
    docs.foreach { case (id, ws) =>
      val mbs = ws.sliding(2).map(p => surprisal(p(0), p(1))).toVector
      assert(got(id) === ((mbs.length.toLong, mbs.sum)),
        s"doc $id surprisal diverges from the literal fold")
    }
  }

  test("ta27 tokenizer: the marker-replace chain is EXACTLY Bpe.encodeWord " +
    "on the static merges, and the fertility accounting closes") {
    val sess = spark
    import sess.implicits._
    // adversarial words: second-level merges ("at"+"a", "th"+"e"),
    // overlapping candidates, repeated patterns, marker composition
    val words = Seq("data", "the", "batch", "fast", "window", "customer",
      "thethe", "atat", "aaat", "thee", "stream", "a", "x", "theater")
    val viaChain = words.toDF("w")
      .withColumn("n", expr(s"length(${TextAnalysis.ta27Chain("w")})"))
      .withColumn("marked", expr(TextAnalysis.ta27Chain("w")))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    words.foreach { w =>
      val toks = graft.functions.Bpe.encodeWord(w, TextAnalysis.ta27BpeMerges)
      assert(viaChain(w)._1 === toks.size,
        s"'$w': chain ${viaChain(w)} vs encodeWord $toks")
      // the marked string's chars map 1:1 onto the BPE symbols
      assert(toks.map(_.length).sum === w.length,
        s"'$w': tokens must conserve characters")
    }
    // fertility report: accounting closes on the gate corpus
    val rows = run("ta27_tokenizer_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nBytes, nToks) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nToks >= nWords, "every word is at least one token")
      assert(nToks <= nBytes, "merges only shrink the char tokenization")
      assert(r.getLong(5) === nToks * 1000 / nWords)
      assert(r.getLong(6) === nBytes * 1000 / nToks)
    }
  }

  test("ta26 clamp: a zero-probability bigram scores MAX surprisal, never the minimum") {
    // the web-scale regime (c1 > 250000, singleton continuation,
    // >1e6 bigram types) floors p_kn_ppm to 0; the surprisal
    // expression must map that to x = 1e6 (~19.9 bits), not to 1
    // (0 bits) via NULL-swallowing greatest — the exact expression
    // strings the ta26 plan uses, evaluated at the boundary
    val row = spark.sql(
      """SELECT greatest(1L, 1000000 DIV greatest(1L, p_kn_ppm)) AS x
         FROM VALUES (0L), (1L), (1000000L) AS t(p_kn_ppm)
         ORDER BY p_kn_ppm""").collect().map(_.getLong(0))
    assert(row(0) === 1000000L, "p=0 must clamp to max surprisal, not min")
    assert(row(1) === 1000000L)
    assert(row(2) === 1L, "a certain bigram has zero surprisal")
  }

  test("prof15 skew advisor: salt recommendation levels the heavy key, identity keys salt-free") {
    val rows = run("prof15_skew_advisor").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6)))).toMap
    val (nk, nr, mx, salt) = rows("event_type")
    assert(nk <= 8 && salt >= 2, "the 5-type key must recommend a real salt")
    // the recommendation's contract: max/salt fits a 32-way even split
    assert(mx <= salt * ((nr + 31) / 32),
      "salted heavy key must fit the per-partition budget")
    assert(rows("user_day")._4 === 1L, "fine-grain keys need no salt")
  }

  test("ta30 mixture design: weights sum to ~1e6, rates invert shares, isqrt is exact at boundaries") {
    val sess = spark
    import sess.implicits._
    // the Newton-guarded integer sqrt must be exact AT perfect-square
    // boundaries — the regime where floor(sqrt(double)) can flip
    // across engines: isqrt(x*x) = x and isqrt(x*x - 1) = x - 1
    val probe = Seq(1L, 2L, 699L, 700L, 31622L, 31623L)
      .flatMap(x => Seq(x * x -> x, x * x - 1 -> (x - 1)))
      .toDF("share_ppm", "expect")
      .withColumn("r0", expr("CAST(floor(sqrt(CAST(share_ppm AS DOUBLE))) AS BIGINT)"))
      .withColumn("w", expr(
        "CASE WHEN (r0 + 1) * (r0 + 1) <= share_ppm THEN r0 + 1 " +
          "WHEN r0 * r0 > share_ppm THEN r0 - 1 ELSE r0 END"))
    assert(probe.filter(col("w") =!= col("expect")).count() === 0L,
      "guarded isqrt must be exact around perfect squares")
    val rows = run("ta30_mixture_weights").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // targets renormalize to ~1 (ppm truncation loses < strata ppm)
    val tsum = rows.map(_._3).sum
    assert(tsum > 1000000L - rows.length && tsum <= 1000000L,
      s"targets must sum to ~1e6 ppm, got $tsum")
    // temperature < 1 flattens: the largest-share stratum downsamples,
    // the smallest oversamples
    val byShare = rows.sortBy(_._2)
    assert(byShare.last._4 < 1000000L, "head stratum must downsample")
    assert(byShare.head._4 > 1000000L, "tail stratum must oversample")
  }

  test("ta30 at realistic skew: a Zipfian 30-language corpus keeps every tail " +
    "rate finite and the downsample monotone in share") {
    val sess = spark
    import sess.implicits._
    // web-crawl reality: token mass ~ Zipf over languages, en >> tail.
    // lang k (rank k) carries floor(60000 / k) tokens — a ~25x
    // head-to-tail ratio across 30 strata
    val docs = (1 to 30).map { k =>
      (k.toLong, Seq.fill(60000 / k)("tok").mkString(" "), f"lang$k%02d")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    docs.toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("ta30_mixture_weights")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("share_ppm")),
        r.getLong(r.fieldIndex("target_ppm")), r.getLong(r.fieldIndex("rate_ppm")),
        r.getBoolean(r.fieldIndex("oversampled"))))
    assert(rows.length === 30)
    // every tail language's rate stays finite and positive — the
    // share_ppm=0-guard (DIV by greatest(1, share)) must never NULL or
    // zero a stratum out, however thin
    assert(rows.forall(r => r._4 > 0L),
      s"every rate_ppm must be finite and positive: ${rows.filter(_._4 <= 0L).toSeq}")
    // tau = 0.5 flattening is MONOTONE: strictly more share never earns
    // a strictly higher sampling rate (rate ~ share^-0.5; Zipf rank
    // gaps dwarf the +-1 integer-floor error at ppm scale)
    val byShare = rows.sortBy(_._2)
    byShare.sliding(2).foreach { pair =>
      val (lo, hi) = (pair(0), pair(1))
      assert(hi._4 <= lo._4,
        s"downsample must be monotone in share: $lo vs $hi")
    }
    // the head (en-analog) downsamples, the whole tail half oversamples
    assert(!byShare.last._5 && byShare.last._4 < 1000000L,
      "the Zipf head must downsample")
    assert(byShare.take(15).forall(_._5),
      "the tail half must oversample under tau=0.5")
    // design stays a proper distribution at 30 strata
    val tsum = rows.map(_._3).sum
    assert(tsum > 1000000L - 30 && tsum <= 1000000L,
      s"targets must renormalize to ~1e6 ppm at 30 strata, got $tsum")
  }

  private def bucketOf(word: String, k: Int = 64): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(word.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % k
  }

  test("ta32 trainer LEARNS: keep-only buckets end above flag-only buckets, " +
    "and the loss decreases every round on the gate corpus") {
    val sess = spark
    import sess.implicits._
    // keep docs: 25 words incl. a stopword (passes ta2's keep rule),
    // all sharing marker word 'qualitymarker'; flag docs: 5 words
    // (too short -> flag), all sharing 'junkmarker'. The two vocabs
    // are disjoint; verify their BUCKETS are too, so the separation
    // assertion can't be washed out by hash collisions.
    val keepWords = Seq("the", "qualitymarker") ++ (1 to 23).map(i => f"kw$i%02d")
    val keepBuckets = keepWords.map(bucketOf(_)).toSet
    // pick flag words deterministically from a candidate stream,
    // skipping any whose bucket collides with the keep vocab's — the
    // separation assertion must not be washed out by hash collisions
    val flagWords = ("junkmarker" +: (1 to 200).map(i => f"fw$i%03d"))
      .filter(w => !keepBuckets.contains(bucketOf(w)))
      .take(5)
    val flagMarker = flagWords.head
    assert(flagWords.size == 5,
      s"candidate stream must yield a collision-free flag vocab: $flagWords")
    val docs = ((1 to 10).map(i => (i.toLong, keepWords.mkString(" "))) ++
      (11 to 20).map(i => (i.toLong, flagWords.mkString(" "))))
    val dir = java.nio.file.Files.createTempDirectory("graft-ta32").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.trainQualityProbe(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap // bucket -> w3
    val wKeep = out(bucketOf("qualitymarker"))
    val wFlag = out(bucketOf(flagMarker))
    assert(wKeep > wFlag && wFlag <= 0L,
      s"keep-only feature must earn a higher weight: keep=$wKeep flag=$wFlag")
    assert(wKeep > 0L, "keep-only features must move toward the 1000-milli label")
    // and on the real gate corpus the pre-update loss shrinks each round
    assume(new java.io.File(sfDir).exists())
    val sae = run("ta32_quality_trainer").select("sae1", "sae2", "sae3")
      .head()
    assert(sae.getLong(0) > sae.getLong(1) && sae.getLong(1) > sae.getLong(2),
      s"GD must descend: ${sae.toSeq}")
    // and the trained probe beats chance as a classifier of the rule
    // it was fit to (ev14's rollup must not be degenerate)
    val ev = run("ev14_probe_eval").head()
    val acc = ev.getLong(ev.fieldIndex("accuracy_permille"))
    assert(acc > 500L, s"trained probe must beat chance, got $acc permille")
    assert(ev.getLong(ev.fieldIndex("tp")) > 0L && ev.getLong(ev.fieldIndex("tn")) > 0L,
      "the confusion matrix must have mass on both classes")
  }

  test("ta32 depth is an argument: a 5-round run keeps descending, its prefix " +
    "equals the 3-round trajectory, and the pivot reproduces ta32's schema") {
    assume(new java.io.File(sfDir).exists())
    val t5 = TextAnalysis.trainQualityProbeTrajectory(spark, sfDir, iters = 5)
    val saes = t5.select("round", "sae").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(saes.map(_._1).toSeq === (1L to 5L),
      "one sae per round, rounds 1..5")
    assert(saes.sliding(2).forall { case Array(a, b) => b._2 < a._2 },
      s"GD must keep descending past round 3: ${saes.toSeq}")
    // deterministic prefix: deeper training extends, never rewrites
    val t3 = TextAnalysis.trainQualityProbeTrajectory(spark, sfDir, iters = 3)
    assert(t5.filter(org.apache.spark.sql.functions.col("round") <= 3)
        .collect().toSet === t3.collect().toSet,
      "rounds 1..3 of the 5-round run must equal the 3-round run")
    // the pivot at depth 3 is exactly the ta32 query's schema
    assert(TextAnalysis.trainQualityProbe(spark, sfDir).columns.toSeq ===
      Seq("bucket", "df", "w1", "w2", "w3", "sae1", "sae2", "sae3"))
    assert(TextAnalysis.trainQualityProbe(spark, sfDir, iters = 5).columns.toSeq ===
      Seq("bucket", "df") ++ (1 to 5).map(t => s"w$t") ++ (1 to 5).map(t => s"sae$t"))
  }
}
