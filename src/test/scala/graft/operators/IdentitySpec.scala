package graft.operators

import graft.SparkSpec

/** Connected-components invariants: known graphs, the FIXTURES.md §6
  * merge semantics, the large-star/small-star round bound on a
  * 1000-hop path (diameter-independent, unlike label propagation),
  * and a skewed hub.
  */
class IdentitySpec extends SparkSpec {

  private def comps(edges: Seq[(String, String)]): (Map[String, String], Int) = {
    val sess = spark
    import sess.implicits._
    val (df, iters) = Identity.connectedComponentsWithStats(edges.toDF("src", "dst"))
    (df.collect().map(r => r.getString(0) -> r.getString(1)).toMap, iters)
  }

  test("two components resolve to their min nodes") {
    val (m, _) = comps(Seq("1" -> "2", "2" -> "3", "x" -> "y"))
    assert(m("1") === "1" && m("2") === "1" && m("3") === "1")
    assert(m("x") === "x" && m("y") === "x")
  }

  test("FIXTURES §6: anon/user/alias merge rules") {
    val (m, _) = comps(Seq("a1" -> "u1", "a1" -> "u2", "u3" -> "u3_prev"))
    assert(Set(m("a1"), m("u1"), m("u2")).size === 1)
    assert(m("u3") === m("u3_prev"))
    assert(m("a1") !== m("u3"))
  }

  test("1000-hop path: single component within O(log diameter) rounds") {
    val sess = spark
    import sess.implicits._
    val edges = (0 until 1000).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val (df, iters) = Identity.connectedComponentsWithStats(edges, smallGraphMax = 0L)
    val labels = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length === 1001)
    assert(labels.forall(_._2 === 0L))
    assert(iters <= 14, s"large/small-star should converge in ~log²-ish rounds, took $iters")
  }

  test("20k-hop chain: round count stays logarithmic (diameter independence)") {
    val sess = spark
    import sess.implicits._
    // a min-label propagation engine would need ~20,000 rounds here;
    // large/small-star must stay in the low tens (log^2-ish)
    val edges = (0 until 20000).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val (df, iters) = Identity.connectedComponentsWithStats(edges, smallGraphMax = 0L)
    assert(iters <= 20, s"alternation rounds must not scale with diameter, took $iters")
    val labels = df.collect()
    assert(labels.length === 20001)
    assert(labels.forall(_.getLong(1) === 0L))
  }

  test("incremental addRules merges touched components, leaves the rest alone") {
    val sess = spark
    import sess.implicits._
    // existing graph: {a1,u1,u2} | {u3,u3p} | {x,y}
    val base = Identity.connectedComponents(
      Seq("a1" -> "u1", "a1" -> "u2", "u3" -> "u3p", "x" -> "y").toDF("src", "dst"))
    // new rule bridges u2 and u3 -> first two components merge; {x,y} untouched
    val updated = Identity.addRules(base, Seq("u2" -> "u3").toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Set("a1", "u1", "u2", "u3", "u3p").map(updated) === Set("a1"))
    assert(updated("x") === "x" && updated("y") === "x")
    assert(updated.size === 7)
    // brand-new nodes in a later batch form their own component
    val withNew = Identity.addRules(
      Seq("a1" -> "u1", "a1" -> "u2").toDF("src", "dst")
        .transform(Identity.connectedComponents(_)),
      Seq("p" -> "q").toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(withNew("p") === "p" && withNew("q") === "p")
    assert(withNew("a1") === "a1")
  }

  test("skewed hub: star with 500 leaves converges fast") {
    val sess = spark
    import sess.implicits._
    val edges = (1 to 500).map(i => (0L, i.toLong)).toDF("src", "dst")
    val (df, iters) = Identity.connectedComponentsWithStats(edges, smallGraphMax = 0L)
    assert(df.collect().forall(_.getLong(1) === 0L))
    assert(iters <= 4, s"star graph has diameter 2, took $iters rounds")
  }

  test("union-find fast path equals the distributed engine") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(23)
    val edges = (1 to 400).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .toDF("src", "dst")
    def run(thr: Long) =
      Identity.connectedComponentsWithStats(edges, smallGraphMax = thr)._1
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = run(100000L) // union-find
    val dist = run(0L)      // star contraction
    assert(fast === dist)
  }

  test("empty edge set yields an empty mapping, not a crash") {
    val sess = spark
    import sess.implicits._
    // a clean corpus produces zero near-dup pairs — cluster resolution
    // must degrade to "every doc keeps itself"
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Identity.connectedComponents(none).count() === 0L)
  }
}
