package graft.functions

import graft.SparkSpec

/** BPE trainer/encoder against a hand-computed merge sequence (the
  * Sennrich et al. running example reshaped to this tokenizer's
  * conventions: char-level start symbols, no end-of-word marker,
  * count-desc + lexicographic tie-break).
  */
class BpeSpec extends SparkSpec {

  private def fixture = {
    val sess = spark
    import sess.implicits._
    Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest newest widest")
    ).toDF("id", "text")
  }

  test("training reproduces the hand-computed merge sequence") {
    val merges = Bpe.train(fixture, "text", 4)
    // word types: low x3, lower x2, newest x4, widest x1
    // r0: (w,e) 6 [4 newest + 2 lower]
    // r1: (l,o) 5 ties (s,t) 5 -> lexicographic
    // r2: (s,t) 5
    // r3: (e,we) 4 ties (n,e) 4 -> 'e' < 'n'
    assert(merges.map(m => (m.left, m.right, m.pairCount)) === Seq(
      ("w", "e", 6L), ("l", "o", 5L), ("s", "t", 5L), ("e", "we", 4L)))
  }

  test("training stops early when no pair repeats") {
    val sess = spark
    import sess.implicits._
    val tiny = Seq((1L, "ab cd")).toDF("id", "text")
    assert(Bpe.train(tiny, "text", 10).isEmpty)
  }

  test("encodeWord applies merges greedily left-to-right in rank order") {
    val merges = Bpe.train(fixture, "text", 4)
    assert(Bpe.encodeWord("newest", merges) === Vector("n", "ewe", "st"))
    assert(Bpe.encodeWord("lower", merges) === Vector("lo", "we", "r"))
    assert(Bpe.encodeWord("widest", merges) === Vector("w", "i", "d", "e", "st"))
    // overlapping pair fuses left-to-right: aaa -> [aa, a]
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
  }

  test("round-trip invariant: concatenated tokens rebuild every word, any merge set") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val words = Vector.fill(200)(
      (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val sess = spark
    import sess.implicits._
    val corpus = words.grouped(20).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq.toDF("id", "text")
    val merges = Bpe.train(corpus, "text", 12)
    assert(merges.nonEmpty, "a 5-letter alphabet over 200 words must repeat pairs")
    words.foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(toks.mkString === w, s"lossy encode of '$w': $toks")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("bounded vocab: default cap is a no-op below the cap (capped ≡ uncapped)") {
    val a = Bpe.train(fixture, "text", 4)
    val b = Bpe.train(fixture, "text", 4, maxVocab = Int.MaxValue)
    assert(a === b)
  }

  test("bounded vocab: the cap prunes the LOW-frequency tail deterministically") {
    // word types: newest x4, low x3, lower x2, widest x1 — cap 3 drops
    // widest, so (s,t) loses widest's count (4, not 5), falls out of
    // the r1 tie, and r2's four-way 4-count tie resolves to (e,we)
    val merges = Bpe.train(fixture, "text", 3, maxVocab = 3)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) === Seq(
      ("w", "e", 6L), ("l", "o", 5L), ("e", "we", 4L)))
    // minFreq floor prunes the same tail by count
    assert(Bpe.train(fixture, "text", 3, minFreq = 2L) === merges)
  }

  test("bounded encode dictionary: OOV fallback makes any cap output-identical") {
    val merges = Bpe.train(fixture, "text", 4)
    val full = Bpe.encode(spark, fixture, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // cap 1: only the single most frequent word type rides the
    // broadcast dictionary; every other occurrence takes the
    // executor-side merge-fold path — results must not change
    val capped = Bpe.encode(spark, fixture, "id", "text", merges, maxVocab = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(capped === full)
  }

  test("distributed encode preserves word order through the broadcast dictionary") {
    val merges = Bpe.train(fixture, "text", 4)
    val out = Bpe.encode(spark, fixture, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("lo", "w", "lo", "w", "lo", "w", "lo", "we", "r", "lo", "we", "r"))
    assert(out(2L) === Seq.fill(4)(Seq("n", "ewe", "st")).flatten ++
      Seq("w", "i", "d", "e", "st"))
  }
}
