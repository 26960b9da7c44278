package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based suites in the spirit of the reference's fuzz
  * differential tests (transformer_fuzz_test.go): random nested JSON
  * through the flatten vs an independent naive reference walk, plus
  * algebraic invariants of the name mangling and HLL sketches.
  * Deterministic seeds — failures reproduce.
  */
class PropertySpec extends AnyFunSuite {

  /** Drive a Gen deterministically without the scalatest bridge. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 4) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced samples")
  }

  // --- generators ---------------------------------------------------

  private val keyGen: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty),
      Gen.const(""), Gen.const("a_b"))

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-1000000L, 1000000L),
    Gen.chooseNum(-1000.0, 1000.0),
    Gen.oneOf(true, false),
    Gen.alphaNumStr.map(_.take(10)),
    Gen.const(null))

  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      5 -> scalarGen,
      2 -> Gen.mapOf(Gen.zip(keyGen, valueGen(depth - 1))).map(_.take(4)),
      1 -> Gen.listOf(scalarGen).map(_.take(3)))

  private val docGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(keyGen, valueGen(3))).map(_.take(6))

  private def render(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s + "\""
    case m: Map[_, _] =>
      m.map { case (k, mv) => "\"" + k + "\":" + render(mv) }.mkString("{", ",", "}")
    case xs: List[_] => xs.map(render).mkString("[", ",", "]")
    case other => other.toString
  }

  /** Independent reference walk over the in-memory structure (not the
    * JSON text) — the differential oracle.
    */
  private def naiveFlatten(m: Map[String, Any], prefix: String, depth: Int,
                           maxDepth: Int): Map[String, String] =
    m.flatMap {
      case ("", _) => Map.empty[String, String]
      case (_, null) => Map.empty[String, String]
      case (k, vm: Map[_, _]) if depth < maxDepth =>
        naiveFlatten(vm.asInstanceOf[Map[String, Any]],
          s"$prefix${k}_", depth + 1, maxDepth)
      case (k, vm: Map[_, _]) => Map(prefix + k -> render(vm))
      case (k, xs: List[_]) => Map(prefix + k -> render(xs))
      case (k, s: String) => Map(prefix + k -> s)
      case (k, v) => Map(prefix + k -> v.toString)
    }

  test("flatten agrees with an independent naive walk on random nested docs") {
    forAllSamples(docGen) { doc =>
      val viaJson = JsonFlatten.flatten(render(doc))
      val naive = naiveFlatten(doc, "", 1, 3)
      assert(viaJson === naive, s"for ${render(doc)}")
    }
  }

  test("toSafeName is idempotent and always emits a safe identifier") {
    forAllSamples(Gen.asciiPrintableStr.map(_.take(40))) { s =>
      val once = SafeNames.toSafeName(s)
      assert(once.matches("^[a-z0-9_]*$"), s"for $s")
      assert(SafeNames.toSafeName(once) === once, s"not idempotent for $s -> $once")
    }
  }

  test("HLL merge is commutative and order-insensitive") {
    val agg = new HllAggregator(10)
    def sk(xs: Seq[String]) = xs.foldLeft(agg.zero)(agg.reduce)
    // the commutativity invariant is about the densified REGISTERS —
    // the sparse buffer's entry-log ORDER legitimately differs between
    // merge(a,b) and merge(b,a)
    forAllSamples(Gen.listOf(Gen.alphaNumStr.map(_.take(8))).map(_.take(200)), n = 60) { vs =>
      val a = vs.take(vs.size / 2)
      val b = vs.drop(vs.size / 2)
      val ab = agg.registersOf(agg.merge(sk(a), sk(b))).toSeq
      val ba = agg.registersOf(agg.merge(sk(b), sk(a))).toSeq
      val shuffled = agg.registersOf(
        sk(new scala.util.Random(7).shuffle(vs))).toSeq
      assert(ab === ba)
      assert(ab === shuffled)
    }
  }
}
