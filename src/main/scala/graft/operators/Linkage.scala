package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage — entity resolution across tables whose join
  * keys don't match exactly (the dirty-data cousin of L8's identity
  * graph; the reference resolves identities only on exact merge-rule
  * equality, identity.go:79-141, so this is the approximate extension
  * a warehouse team layers on top).
  *
  * The engine is BLOCKED edit-distance join, the similarity-join
  * pattern ll6 uses for Jaccard applied to Levenshtein: for edit
  * distance ≤ 1, split every key into two halves — any single edit
  * leaves at least one half intact (pigeonhole), so equality on
  * either half is a complete candidate generator. Candidates are two
  * equi-joins on half-keys (hash-partitioned, bucket sizes ~n/16^6 on
  * high-entropy keys), unioned and de-duplicated, then verified with
  * one codegen'd `levenshtein` per pair. No all-pairs comparison at
  * any scale; text never shuffles beyond the 12-char keys.
  */
object Linkage {

  /** rl1's blocked fuzzy-link pair pipeline (shared with ev7's
    * evaluation): deterministic single-deletion corruption, half-key
    * pigeonhole blocking, levenshtein <= 1 verify.
    */
  private def fuzzyLinkPairs(s: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame = {
    val master = Tables.customer(s, dir)
      .select(col("c_custkey"),
        substring(md5(col("c_custkey").cast("string")), 1, 12).as("name"))
    val dirty = master.select(
      col("c_custkey").as("d_key"),
      expr("concat(substring(name, 1, CAST(c_custkey % 12 AS INT)), " +
        "substring(name, CAST(c_custkey % 12 AS INT) + 2, 12))").as("d_name"))
    // candidate blocks: first-6 OR last-6 chars equal (a deletion in
    // one half leaves the other half's 6 chars aligned and intact)
    val m = master
      .withColumn("pre", substring(col("name"), 1, 6))
      .withColumn("suf", substring(col("name"), 7, 6))
    val d = dirty
      .withColumn("pre", substring(col("d_name"), 1, 6))
      .withColumn("suf", substring(col("d_name"), 6, 6))
    val byPre = d.select(col("d_key"), col("d_name"), col("pre"))
      .join(m.select(col("c_custkey"), col("name"), col("pre")), "pre")
    val bySuf = d.select(col("d_key"), col("d_name"), col("suf"))
      .join(m.select(col("c_custkey"), col("name"), col("suf")), "suf")
    byPre.select(col("d_key"), col("d_name"), col("c_custkey"), col("name"))
      .union(bySuf.select(col("d_key"), col("d_name"), col("c_custkey"), col("name")))
      .distinct()
      .withColumn("dist", levenshtein(col("d_name"), col("name")))
      .filter(col("dist") <= 1)
      .select(col("d_key"), col("c_custkey").as("matched_key"), col("dist").cast("long"))
  }

  val defs: Map[String, Q] = Map(

    // Link a "dirty" feed (one char deterministically dropped from a
    // 12-hex-char record key) back to its master records. Recall is 1
    // by the pigeonhole split; precision comes from the verify step.
    "rl1_fuzzy_link" -> ((s, dir) => fuzzyLinkPairs(s, dir)),

    // LINKAGE EVALUATION against the planted single-deletion
    // corruption — the eval harness (ev2..ev6) applied to record
    // linkage: every dirty record's truth match is its own master, so
    // recall = self-matches recovered and n_extra counts collision
    // blocks that also verified at distance <= 1. Union-tagged single
    // aggregate over the shared pair pipeline.
    "ev7_linkage_eval" -> ((s, dir) => {
      val pairs = fuzzyLinkPairs(s, dir)
        .select(lit(1L).as("is_pair"), col("d_key"), col("matched_key"))
      val masters = Tables.customer(s, dir)
        .select(lit(0L).as("is_pair"), col("c_custkey").as("d_key"),
          lit(null).cast("long").as("matched_key"))
      val hit = col("is_pair") === 1L && col("matched_key") === col("d_key")
      pairs.unionByName(masters).agg(
          sum(lit(1L) - col("is_pair")).as("n_truth"),
          sum(col("is_pair")).as("n_found"),
          sum(when(hit, 1L).otherwise(0L)).as("n_hit"))
        .select(col("n_truth"), col("n_found"), col("n_hit"),
          (col("n_hit") / col("n_truth")).as("recall"),
          (col("n_found") - col("n_hit")).as("n_extra"))
    }),

    // Domain-AUTHORITY scoring (see fuzzyLinkPairs above for rl1's
    // pair pipeline shared with ev7) — PageRank power iteration over the
    // cross-domain link graph: the crawl-prioritization signal a
    // training-data pipeline uses to weight sources. Three damped
    // iterations in EXACT fixed-point integer arithmetic (rank unit
    // 1e12, damping 85/100, every division a floor DIV), so the
    // oracle replays the iteration bit-for-bit where float PageRank
    // would drift under parallel summation. Plan shape per iteration:
    // one (src)-keyed join carrying a single long per edge + one
    // (dst)-keyed aggregate — the standard distributed PageRank
    // shuffle pair, linear in edges at any scale (domain-count-sized
    // rank vectors; at web scale the rank table co-partitions with
    // the edge list on src). Links derive deterministically: doc d
    // links its domain to the domain of doc (d*13 + 7) mod N.
    "q21_domain_rank" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val n = docs.count() // doc-count modulus: metadata statistic, same in the oracle
      val unit = 1000000000000L
      val links = docs.join(
          docs.select(col("doc_id").as("tid"), col("source").as("dst")),
          ((col("doc_id") * 13L + 7L) % n) === col("tid"))
        .select(col("source").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val domains = docs.select(col("source").as("domain")).distinct()
      val outdeg = links.groupBy(col("src")).agg(count(lit(1)).as("od"))
      var rank = domains.withColumn("r", lit(unit))
      for (_ <- 1 to 3) {
        val contrib = links.join(outdeg, "src")
          .join(rank.select(col("domain").as("src"), col("r")), "src")
          .withColumn("c", expr("r DIV od"))
          .groupBy(col("dst").as("domain")).agg(sum(col("c")).as("cs"))
        rank = domains.join(contrib, Seq("domain"), "left")
          .withColumn("r",
            expr(s"${15L * unit / 100L} + (85 * coalesce(cs, 0)) DIV 100"))
          .select(col("domain"), col("r"))
      }
      rank.select(col("domain"), col("r").as("rank_fp"))
    }),

    // TRIANGLE ENUMERATION over the same cross-domain link graph —
    // the second graph primitive (community density / clustering-
    // coefficient input; PageRank q21 is the first). The classic
    // scalable shape: canonicalize every undirected edge to (a < b),
    // wedge-join e1(a,b)⋈e2(b,c) on the shared middle vertex, then
    // close each wedge against the edge set with one more equi-join —
    // never a cartesian, and each triangle is emitted exactly once as
    // its sorted (a, b, c). At web scale the orientation key swaps to
    // degree order so high-degree hubs don't own every wedge; the
    // shape is identical.
    "q33_triangle_count" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val n = Tables.countStat(s, dir, "documents")
      // two link families: q21's (13x+7) plus an even-offset (7x+4) —
      // with only odd offsets every link flips doc-id parity and the
      // domain graph is BIPARTITE (zero triangles by construction)
      def fam(mult: Long, off: Long) = docs.join(
          docs.select(col("doc_id").as("tid"), col("source").as("dst")),
          ((col("doc_id") * mult + off) % n) === col("tid"))
        .select(col("source").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      val raw = fam(13L, 7L).unionByName(fam(7L, 4L))
      val edges = raw.select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val wedges = edges.as("e1").join(edges.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
      wedges.join(edges.as("e3"),
          col("wa") === col("e3.a") && col("wc") === col("e3.b"))
        .select(col("wa").as("a"), col("wb").as("b"), col("wc").as("c"))
    }),

    // LOCAL CLUSTERING COEFFICIENT — q33's triangles normalized per
    // node: coeff(v) = triangles through v / wedges centered at v
    // (deg·(deg−1)/2), reported in exact parts-per-million (single
    // integer DIV — no float ratio to drift). Triangles attribute to
    // all three corners via one explode; degrees come from the same
    // canonical edge set. The density signal crawl prioritization
    // reads next to q21's authority score.
    "q34_clustering_coeff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val n = Tables.countStat(s, dir, "documents")
      def fam(mult: Long, off: Long) = docs.join(
          docs.select(col("doc_id").as("tid"), col("source").as("dst")),
          ((col("doc_id") * mult + off) % n) === col("tid"))
        .select(col("source").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = fam(13L, 7L).unionByName(fam(7L, 4L))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val deg = edges.select(col("a").as("v")).unionByName(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      val wedges = edges.as("e1").join(edges.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
      val tris = wedges.join(edges.as("e3"),
          col("wa") === col("e3.a") && col("wc") === col("e3.b"))
        .select(explode(array(col("wa"), col("wb"), col("wc"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
      deg.join(tris, Seq("v"), "left")
        .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
        .withColumn("coeff_ppm", expr(
          "IF(degree < 2, 0L, n_triangles * 1000000L DIV (degree * (degree - 1) DIV 2))"))
        .select(col("v").as("domain"), col("degree"), col("n_triangles"), col("coeff_ppm"))
    }),

    // LABEL-PROPAGATION COMMUNITIES (Raghavan et al. 2007) over the
    // q33 link graph — the third graph primitive beside authority
    // (q21) and density (q34): topical source communities for
    // domain-mix curation (ta11 weights by source; this groups
    // sources first). SYNCHRONOUS deterministic LPA: every node
    // starts as its own label; each of 3 rounds takes, per node, the
    // most frequent neighbor label with ties broken lexicographically
    // (min), so the result is engine-independent — async/random LPA
    // would not be oracle-able. Plan shape per round: one edge⋈label
    // equi-join + one (node, label) count + one per-node min(struct)
    // pick — two key-partitioned shuffles, linear in edges, state =
    // one label per node (never centralized; the iteration count is
    // the only driver-side loop, the q21 contract).
    "q40_label_propagation" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val n = Tables.countStat(s, dir, "documents")
      def fam(mult: Long, off: Long) = docs.join(
          docs.select(col("doc_id").as("tid"), col("source").as("dst")),
          ((col("doc_id") * mult + off) % n) === col("tid"))
        .select(col("source").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = fam(13L, 7L).unionByName(fam(7L, 4L))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val domains = docs.select(col("source").as("domain")).distinct()
      labelPropagation(edges, domains, rounds = 3)
        .select(col("domain"), col("lbl").as("community"))
    }),

    // Q43: LINK PREDICTION by the RESOURCE-ALLOCATION index (Zhou,
    // Lü & Zhang, EPJ B 2009) over the q33/q34/q40 domain link graph
    // — the fourth graph primitive: which NOT-yet-linked domain pairs
    // the graph's wedge structure predicts (crawl-frontier
    // prioritization for corpus growth). RA = Σ_w 1/deg(w) over
    // common neighbors w — like Adamic-Adar but with 1/deg instead of
    // 1/log(deg), which keeps the score in exact integer ppm
    // (1000000 DIV deg — no transcendental in either engine). Plan:
    // the two-path enumeration is ONE neighbor-keyed self equi-join
    // of the adjacency list (cost Σ_w deg(w)², bounded because nodes
    // are DOMAINS — metadata scale, the corpus only feeds the edge
    // dedup); existing edges leave via one anti-join; top-20 rides
    // the q28 TakeOrdered shape, the rank window touching only the
    // 20 survivors.
    "q43_link_prediction" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val n = Tables.countStat(s, dir, "documents")
      def fam(mult: Long, off: Long) = docs.join(
          docs.select(col("doc_id").as("tid"), col("source").as("dst")),
          ((col("doc_id") * mult + off) % n) === col("tid"))
        .select(col("source").as("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = fam(13L, 7L).unionByName(fam(7L, 4L))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val adj = edges.select(col("a").as("v"), col("b").as("nb"))
        .unionByName(edges.select(col("b").as("v"), col("a").as("nb")))
      val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("d"))
      val twoPath = adj.as("l")
        .join(adj.as("r"), col("l.nb") === col("r.nb") && col("l.v") < col("r.v"))
        .select(col("l.v").as("na"), col("r.v").as("nb2"), col("l.nb").as("w"))
      val scored = twoPath
        .join(broadcast(deg).withColumnRenamed("v", "w"), "w")
        .groupBy(col("na"), col("nb2"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000L DIV d")).as("score_ppm"))
        .join(edges, col("na") === col("a") && col("nb2") === col("b"), "left_anti")
        .orderBy(col("score_ppm").desc, col("na").asc, col("nb2").asc)
        .limit(20)
      scored.withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("score_ppm").desc, col("na").asc, col("nb2").asc))
            .cast("long"))
        .select(col("rank"), col("na").as("node_a"), col("nb2").as("node_b"),
          col("n_common"), col("score_ppm"))
    })
  )

  /** Synchronous deterministic label propagation over canonical
    * undirected edges (a, b): `rounds` iterations of most-frequent-
    * neighbor-label with lexicographic-min tie-break; vertices with
    * no edge keep their own label. See q40 above for the scale
    * argument. Returns (domain, lbl).
    */
  private[operators] def labelPropagation(edges: DataFrame, vertices: DataFrame,
                                          rounds: Int): DataFrame = {
    val adj = edges.select(col("a").as("v"), col("b").as("nb"))
      .unionByName(edges.select(col("b").as("v"), col("a").as("nb")))
    var labels = vertices.withColumn("lbl", col("domain"))
    for (_ <- 1 to rounds) {
      val picked = adj
        .join(labels.select(col("domain").as("nb"), col("lbl")), "nb")
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        .withColumn("neg", -col("c"))
        .groupBy(col("v"))
        .agg(min(struct(col("neg"), col("lbl"))).as("m"))
        .select(col("v").as("domain"), col("m.lbl").as("new_lbl"))
      labels = labels.join(picked, Seq("domain"), "left")
        .withColumn("lbl", coalesce(col("new_lbl"), col("lbl"))) // isolated nodes keep theirs
        .select(col("domain"), col("lbl"))
    }
    labels
  }

  val oracles: Map[String, String] = Map(
    // Same construction, same two-block candidate generation, same
    // verify — DuckDB's levenshtein agrees with Spark's (both classic
    // unit-cost edit distance on unicode code points).
    "rl1_fuzzy_link" ->
      """WITH master AS (
           SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS name
           FROM customer),
         dirty AS (
           SELECT c_custkey AS d_key,
             substr(name, 1, CAST(c_custkey % 12 AS INT)) ||
             substr(name, CAST(c_custkey % 12 AS INT) + 2, 12) AS d_name
           FROM master),
         cand AS (
           SELECT d.d_key, d.d_name, m.c_custkey, m.name
           FROM dirty d JOIN master m
             ON substr(d.d_name, 1, 6) = substr(m.name, 1, 6)
           UNION
           SELECT d.d_key, d.d_name, m.c_custkey, m.name
           FROM dirty d JOIN master m
             ON substr(d.d_name, 6, 6) = substr(m.name, 7, 6))
         SELECT d_key, c_custkey AS matched_key,
           CAST(levenshtein(d_name, name) AS BIGINT) AS dist
         FROM cand
         WHERE levenshtein(d_name, name) <= 1""",
    // rl1's CTE chain wrapped in the ev-family union-tagged aggregate
    "ev7_linkage_eval" ->
      """WITH master AS (
           SELECT c_custkey, substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS name
           FROM customer),
         dirty AS (
           SELECT c_custkey AS d_key,
             substr(name, 1, CAST(c_custkey % 12 AS INT)) ||
             substr(name, CAST(c_custkey % 12 AS INT) + 2, 12) AS d_name
           FROM master),
         cand AS (
           SELECT d.d_key, d.d_name, m.c_custkey, m.name
           FROM dirty d JOIN master m
             ON substr(d.d_name, 1, 6) = substr(m.name, 1, 6)
           UNION
           SELECT d.d_key, d.d_name, m.c_custkey, m.name
           FROM dirty d JOIN master m
             ON substr(d.d_name, 6, 6) = substr(m.name, 7, 6)),
         pairs AS (SELECT d_key, c_custkey AS matched_key FROM cand
                   WHERE levenshtein(d_name, name) <= 1),
         u AS (SELECT 1 AS is_pair, d_key, matched_key FROM pairs
               UNION ALL SELECT 0, c_custkey, NULL FROM customer)
         SELECT CAST(SUM(1 - is_pair) AS BIGINT) AS n_truth,
           CAST(SUM(is_pair) AS BIGINT) AS n_found,
           CAST(SUM(CASE WHEN is_pair = 1 AND matched_key = d_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN is_pair = 1 AND matched_key = d_key
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(1 - is_pair) AS BIGINT) AS recall,
           CAST(SUM(is_pair) AS BIGINT)
             - CAST(SUM(CASE WHEN is_pair = 1 AND matched_key = d_key
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extra
         FROM u""",
    // same canonical-edge wedge-close; the scalar-subquery count
    // mirrors the memoized doc-count stat
    "q33_triangle_count" ->
      """WITH docs AS (SELECT doc_id, source FROM documents),
          nn AS (SELECT COUNT(*) AS n FROM docs),
          raw AS (SELECT d.source AS src, t.source AS dst
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 13 + 7) % nn.n
                  WHERE d.source <> t.source
                  UNION ALL
                  SELECT d.source, t.source
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 7 + 4) % nn.n
                  WHERE d.source <> t.source),
          e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw)
          SELECT e1.a, e1.b, e2.b AS c
          FROM e e1
          JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""",
    // q33's edge/wedge CTEs plus corner attribution and the ppm DIV
    "q34_clustering_coeff" ->
      """WITH docs AS (SELECT doc_id, source FROM documents),
          nn AS (SELECT COUNT(*) AS n FROM docs),
          raw AS (SELECT d.source AS src, t.source AS dst
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 13 + 7) % nn.n
                  WHERE d.source <> t.source
                  UNION ALL
                  SELECT d.source, t.source
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 7 + 4) % nn.n
                  WHERE d.source <> t.source),
          e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw),
          deg AS (SELECT v, COUNT(*) AS degree
                  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
          tri AS (SELECT e1.a, e1.b, e2.b AS c
                  FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
          tc AS (SELECT v, COUNT(*) AS n_triangles
                 FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
                       UNION ALL SELECT c FROM tri) GROUP BY v)
          SELECT deg.v AS domain, deg.degree,
            CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
            CAST(CASE WHEN deg.degree < 2 THEN 0
                 ELSE COALESCE(tc.n_triangles, 0) * 1000000
                      // (deg.degree * (deg.degree - 1) // 2) END AS BIGINT) AS coeff_ppm
          FROM deg LEFT JOIN tc ON deg.v = tc.v""",
    // three synchronous LPA rounds, the deterministic (count DESC,
    // label ASC) pick as a ROW_NUMBER, isolated nodes carried by
    // COALESCE — identical labels to the Spark loop
    "q40_label_propagation" -> {
      def round(i: Int) =
        s"""v$i AS (SELECT adj.v, l.lbl, COUNT(*) AS c
              FROM adj JOIN l${i - 1} l ON adj.nb = l.domain
              GROUP BY 1, 2),
            p$i AS (SELECT v, lbl FROM (
              SELECT v, lbl, ROW_NUMBER() OVER (PARTITION BY v
                ORDER BY c DESC, lbl ASC) AS rn FROM v$i) WHERE rn = 1),
            l$i AS (SELECT l.domain, COALESCE(p$i.lbl, l.lbl) AS lbl
              FROM l${i - 1} l LEFT JOIN p$i ON l.domain = p$i.v)"""
      s"""WITH docs AS (SELECT doc_id, source FROM documents),
          nn AS (SELECT COUNT(*) AS n FROM docs),
          raw AS (SELECT d.source AS src, t.source AS dst
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 13 + 7) % nn.n
                  WHERE d.source <> t.source
                  UNION ALL
                  SELECT d.source, t.source
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 7 + 4) % nn.n
                  WHERE d.source <> t.source),
          e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw),
          adj AS (SELECT a AS v, b AS nb FROM e UNION ALL SELECT b, a FROM e),
          l0 AS (SELECT DISTINCT source AS domain, source AS lbl FROM docs),
          ${round(1)}, ${round(2)}, ${round(3)}
          SELECT domain, lbl AS community FROM l3"""
    },
    // three chained fixed-point iterations, floor // everywhere —
    // identical integers to the Spark loop
    "q21_domain_rank" -> {
      def iter(i: Int) =
        s"""c$i AS (SELECT l.dst AS domain, SUM(r.r // o.od) AS cs
              FROM links l JOIN od o ON l.src = o.src
              JOIN r${i - 1} r ON r.domain = l.src
              GROUP BY 1),
            r$i AS (SELECT d.domain,
                150000000000 + (85 * COALESCE(c$i.cs, 0)) // 100 AS r
              FROM domains d LEFT JOIN c$i ON d.domain = c$i.domain)"""
      s"""WITH docs AS (SELECT doc_id, source FROM documents),
          nn AS (SELECT COUNT(*) AS n FROM docs),
          links AS (SELECT DISTINCT d.source AS src, t.source AS dst
                    FROM docs d CROSS JOIN nn
                    JOIN docs t ON t.doc_id = (d.doc_id * 13 + 7) % nn.n
                    WHERE d.source <> t.source),
          domains AS (SELECT DISTINCT source AS domain FROM docs),
          od AS (SELECT src, COUNT(*) AS od FROM links GROUP BY src),
          r0 AS (SELECT domain, CAST(1000000000000 AS BIGINT) AS r FROM domains),
          ${iter(1)}, ${iter(2)}, ${iter(3)}
          SELECT domain, CAST(r AS BIGINT) AS rank_fp FROM r3"""
    },
    // q33's edge CTEs + the wedge self-join; 1000000 // deg keeps the
    // RA score in exact integers both engines agree on
    "q43_link_prediction" ->
      """WITH docs AS (SELECT doc_id, source FROM documents),
          nn AS (SELECT COUNT(*) AS n FROM docs),
          raw AS (SELECT d.source AS src, t.source AS dst
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 13 + 7) % nn.n
                  WHERE d.source <> t.source
                  UNION ALL
                  SELECT d.source, t.source
                  FROM docs d CROSS JOIN nn
                  JOIN docs t ON t.doc_id = (d.doc_id * 7 + 4) % nn.n
                  WHERE d.source <> t.source),
          e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw),
          adj AS (SELECT a AS v, b AS nb FROM e UNION ALL SELECT b, a FROM e),
          deg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
          tp AS (SELECT l.v AS na, r.v AS nb2, l.nb AS w
                 FROM adj l JOIN adj r ON l.nb = r.nb AND l.v < r.v),
          sc AS (SELECT na, nb2, COUNT(*) AS n_common,
                   CAST(SUM(1000000 // d) AS BIGINT) AS score_ppm
                 FROM tp JOIN deg ON tp.w = deg.v GROUP BY 1, 2),
          pred AS (SELECT * FROM sc WHERE NOT EXISTS (
                     SELECT 1 FROM e WHERE e.a = sc.na AND e.b = sc.nb2))
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, na, nb2)
                   AS BIGINT) AS rank,
                 na AS node_a, nb2 AS node_b, n_common, score_ppm
          FROM pred ORDER BY score_ppm DESC, na, nb2 LIMIT 20"""
  )
}
