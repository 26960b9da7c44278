package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Identity resolution — connected components over the merge-rule edge
  * list (reference: warehouse/identity/identity.go:79-262, L8: an
  * incremental union-find over rudder_identity_merge_rules producing
  * the rudder_identity_mappings table).
  *
  * Spark-first re-expression: min-label propagation with pointer
  * jumping over the edge DataFrame. Cluster-grade harness:
  *   - merge-property strings are dictionary-encoded to dense longs up
  *     front (one sort + row_number), so every CC shuffle carries
  *     8-byte keys instead of strings — the right layout for a 100 TB
  *     identity graph — and the original values are joined back once
  *     at the end;
  *   - per-round label tables are RELIABLY checkpointed
  *     (sc.setCheckpointDir + checkpoint(), not localCheckpoint, which
  *     stores blocks on executors and dies with one executor loss);
  *   - `gathered` is persisted before the shortcut self-join (it feeds
  *     the join twice) and unpersisted after the round, so executor
  *     storage stays O(1) in the iteration count;
  *   - convergence is read from the SAME action that materializes the
  *     round: labels only decrease under min-propagation, so
  *     sum(comp) is strictly monotone until fixpoint — no extra
  *     join-and-count job per round.
  * Pointer jumping halves label-chain length per round →
  * O(log diameter) shuffles (IdentitySpec asserts ≤ 14 rounds on a
  * 1000-hop path).
  */
object Identity {

  /** Min-label connected components over any orderable node type.
    * @param edges two-column DataFrame (src, dst), undirected.
    * @return ((node, comp) DataFrame in the input value domain where
    *         comp = min reachable node, iterations run)
    */
  def connectedComponentsWithStats(edges: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    def prof[T](label: String)(f: => T): T =
      if (sys.props.contains("graft.cc.profile")) {
        val t0 = System.nanoTime(); val r = f
        println(f"[ccprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      } else f
    val spark = edges.sparkSession
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-cc-checkpoints")

    // The input edge plan is typically expensive (a distinct over the
    // raw event scan, or a verified near-dup join) and feeds several
    // downstream plans here (node dictionary builds, the encode join,
    // the symmetrization) — each a separate action that would recompute
    // it from scratch. Materialize it once.
    val e = edges.toDF("sa", "sb").persist(StorageLevel.MEMORY_AND_DISK)
    // Numeric node ids propagate as-is; everything else (merge-
    // property strings) is dictionary-encoded to longs so every CC
    // shuffle carries 8-byte keys. The ids carry NO order — they come
    // from monotonically_increasing_id on the distinct node set, which
    // costs one hash shuffle and no global sort (a sort-based dense
    // encoding range-partitions every node — needless at any scale,
    // dominant at 100 TB). The value-domain `comp = min(original)`
    // contract is restored at decode time by one min-string aggregate
    // per component. The dictionary is eagerly checkpointed to
    // reliable storage because the ids are partition-layout-dependent:
    // a lazy cache rebuilt after block loss could re-number nodes
    // mid-run.
    val numericInput = e.schema.fields.forall(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val nodes =
      if (numericInput) null
      else prof("node dict")(
        e.select(col("sa").as("s"))
          .union(e.select(col("sb").as("s"))).distinct()
          .withColumn("nid", monotonically_increasing_id() + 1L)
          .checkpoint())
    val enc =
      if (numericInput)
        e.select(col("sa").cast("long").as("a"), col("sb").cast("long").as("b"))
      else e
        .join(nodes.withColumnRenamed("s", "sa").withColumnRenamed("nid", "a"), "sa")
        .join(nodes.withColumnRenamed("s", "sb").withColumnRenamed("nid", "b"), "sb")
        .select(col("a"), col("b"))
    val sym = enc.union(enc.select(col("b").as("a"), col("a").as("b"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Initial labels already fold in the first gather round:
    // comp0(n) = min(n, neighbors(n)) — one fewer loop iteration.
    // Size the per-round shuffles to the graph, not the session: a
    // 10k-edge graph over 32 session partitions runs ~100 near-empty
    // tasks per round; a 100 TB graph keeps full parallelism
    // (~500k edges per partition target).
    val edgeCount = prof("sym count")(sym.count())
    val parts = math.max(2, math.min(
      spark.sparkContext.defaultParallelism * 2,
      (edgeCount / 500000L).toInt + 1))
    val prevShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)

    // null-safe: an EMPTY edge set (a clean corpus in ll9's cluster
    // resolution) sums to null, not 0 — the loop below then converges
    // immediately on the empty label table instead of throwing
    def compSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("comp"))).first()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var labels = sym.select(col("a").as("node"), col("b").as("comp"))
      .union(sym.select(col("a").as("node"), col("a").as("comp")))
      .groupBy(col("node")).agg(min(col("comp")).as("comp"))
      .checkpoint()
    var prevSum = prof("labels0 + sum")(compSum(labels))
    var prevCached: DataFrame = null
    var converged = false
    var i = 0
    val ckptInterval = 3 // reliable checkpoint every N rounds (GraphX-style);
                         // persisted rounds in between keep lineage <= 2N joins
    while (!converged && i < maxIter) {
      // gather: candidate label = min(own, neighbors' labels)
      val gathered = sym
        .join(labels.withColumnRenamed("node", "b_node"), col("b") === col("b_node"))
        .select(col("a").as("node"), col("comp"))
        .union(labels)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // shortcut (pointer jumping): comp(n) := comp(comp(n))
      val nextRaw = gathered.alias("l")
        .join(gathered.select(col("node").as("c_node"), col("comp").as("c_comp")),
          col("l.comp") === col("c_node"), "left")
        .select(col("l.node").as("node"),
          least(col("l.comp"), coalesce(col("c_comp"), col("l.comp"))).as("comp"))
      val next =
        if ((i + 1) % ckptInterval == 0) nextRaw.checkpoint()
        else nextRaw.persist(StorageLevel.MEMORY_AND_DISK)
      val newSum = prof("round")(compSum(next)) // materializes next
      gathered.unpersist()
      if (prevCached != null) { prevCached.unpersist(); prevCached = null }
      if ((i + 1) % ckptInterval != 0) prevCached = next
      labels = next
      converged = newSum == prevSum // min-propagation: sum strictly decreases until fixpoint
      prevSum = newSum
      i += 1
    }
    val decoded =
      if (numericInput) labels
      else {
        // decode AND canonicalize: the internal component id is
        // order-free, so the value-domain label is recomputed as the
        // min original string over each component's members — one
        // groupBy on the mappings (linear, same key as the final join)
        val members = labels.join(nodes.withColumnRenamed("nid", "node"), "node")
        val canon = members.groupBy(col("comp")).agg(min(col("s")).as("comp_s"))
        members.join(canon, "comp")
          .select(col("s").as("node"), col("comp_s").as("comp"))
      }
    val out = prof("decode+ckpt")(decoded.checkpoint()) // reliable; materialize before freeing inputs
    spark.conf.set("spark.sql.shuffle.partitions", prevShufflePartitions)
    e.unpersist()
    sym.unpersist()
    // `nodes` is checkpointed, not cached; its files are reclaimed by
    // the reference-tracking checkpoint cleaner
    if (prevCached != null) prevCached.unpersist()
    (out, i)
  }

  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame =
    connectedComponentsWithStats(edges, maxIter)._1

  /** Incremental identity resolution — the reference's applyRule/
    * addRules contract (identity.go:79-262): fold a batch of new merge
    * rules into an existing mappings table WITHOUT re-running CC over
    * the whole graph. Only components touched by the new edges are
    * recomputed: each affected member contributes a star edge to its
    * old representative (preserving prior connectivity), the new edges
    * are unioned in, and CC runs on that (small) delta subgraph.
    * Untouched components pass through unchanged — at 100 TB the cost
    * scales with the batch's neighborhood, not the graph.
    *
    * @param mappings existing (node, comp) table; comp = min member.
    * @param newEdges batch of new merge-rule edges (src, dst).
    * @return updated (node, comp) table.
    */
  def addRules(mappings: DataFrame, newEdges: DataFrame): DataFrame = {
    val m = mappings.toDF("node", "comp")
    val e = newEdges.toDF("src", "dst")
    val touched = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val touchedComps = m.join(touched, "node").select(col("comp")).distinct()
    val affected = m.join(touchedComps, "comp") // all members of touched comps
    val starEdges = affected.select(col("node").as("src"), col("comp").as("dst"))
    val delta = connectedComponents(e.union(starEdges)).toDF("node", "comp")
    val untouched = m.join(touchedComps, Seq("comp"), "left_anti")
    untouched.unionByName(delta).select(col("node"), col("comp"))
  }

  val defs: Map[String, Q] = Map(
    // l8: edges derived deterministically from events — each user links
    // to two synthetic device/email hash nodes (%37, %53), chaining
    // users into multi-hop components like real anon/user merge graphs.
    "l8_identity_resolution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val e1 = ev.select((col("user_id") + 100000L).as("src"), (col("user_id") % 37).as("dst"))
      val e2 = ev.select((col("user_id") + 100000L).as("src"), (col("user_id") % 53 + 1000L).as("dst"))
      val edges = e1.union(e2).distinct()
      connectedComponents(edges)
        .groupBy(col("comp"))
        .agg(count(lit(1)).as("n_nodes"), max(col("node")).as("max_node"))
    }),

    // l8b: CC over REAL string merge-property edges (the W8
    // rudder_identity_merge_rules shape: anonymousId <-> userId string
    // pairs, idresolution.go:15-141), producing the
    // rudder_identity_mappings rollup per resolved rudder_id.
    "l8b_identity_mappings" -> ((s, dir) => {
      val edges = Tables.events(s, dir)
        .select(
          concat(lit("anon_"), (col("user_id") % 37).cast("string")).as("src"),
          concat(lit("user_"), col("user_id").cast("string")).as("dst"))
        .distinct()
      connectedComponents(edges)
        .groupBy(col("comp").as("rudder_id"))
        .agg(count(lit(1)).as("n_properties"), max(col("node")).as("max_property"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Transitive closure via recursive CTE, then component = min
    // reachable node (including self); same grouping as the Spark side.
    "l8_identity_resolution" ->
      """WITH RECURSIVE
         base_edges AS (
           SELECT DISTINCT user_id + 100000 AS src, user_id % 37 AS dst FROM events
           UNION
           SELECT DISTINCT user_id + 100000 AS src, user_id % 53 + 1000 AS dst FROM events),
         sym AS (SELECT src AS a, dst AS b FROM base_edges
                 UNION SELECT dst AS a, src AS b FROM base_edges),
         reach(a, b) AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         labels AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a)
         SELECT comp, COUNT(*) AS n_nodes, MAX(node) AS max_node
         FROM labels GROUP BY comp""",
    "l8b_identity_mappings" ->
      """WITH RECURSIVE
         base_edges AS (
           SELECT DISTINCT 'anon_' || CAST(user_id % 37 AS VARCHAR) AS src,
                           'user_' || CAST(user_id AS VARCHAR) AS dst
           FROM events),
         sym AS (SELECT src AS a, dst AS b FROM base_edges
                 UNION SELECT dst AS a, src AS b FROM base_edges),
         reach(a, b) AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         labels AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a)
         SELECT comp AS rudder_id, COUNT(*) AS n_properties, MAX(node) AS max_property
         FROM labels GROUP BY comp"""
  )
}
