package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Spec for the MaxMind-format binary reader against its fixture
  * writer: metadata parse, point lookups across tree depths, full
  * network enumeration, and the no-data path.
  */
class MmdbGeoSpec extends AnyFunSuite {

  private val bytes = MmdbGeo.fixtureBytes

  private def ip(a: Int, b: Int, c: Int, d: Int): Long =
    (a.toLong << 24) | (b.toLong << 16) | (c.toLong << 8) | d.toLong

  test("metadata map parses") {
    val md = MmdbGeo.metadata(bytes)
    assert(md("record_size") === 24L)
    assert(md("ip_version") === 4L)
    assert(md("binary_format_major_version") === 2L)
    assert(md("node_count").asInstanceOf[Long] > 0L)
  }

  test("point lookups resolve through the tree walk") {
    assert(MmdbGeo.lookup(bytes, ip(10, 1, 2, 3)) === Some("US"))
    assert(MmdbGeo.lookup(bytes, ip(20, 255, 0, 1)) === Some("DE"))
    assert(MmdbGeo.lookup(bytes, ip(50, 0, 0, 0)) === Some("JP"))
    assert(MmdbGeo.lookup(bytes, ip(60, 9, 9, 9)) === Some("US")) // cycle wrap
    // the /9 split: bit 23 decides
    assert(MmdbGeo.lookup(bytes, ip(80, 127, 255, 255)) === Some("IN"))
    assert(MmdbGeo.lookup(bytes, ip(80, 128, 0, 0)) === Some("FR"))
    // uncovered space: no data
    assert(MmdbGeo.lookup(bytes, ip(11, 0, 0, 1)) === None)
    assert(MmdbGeo.lookup(bytes, ip(90, 0, 0, 1)) === None)
  }

  test("network enumeration matches the inserted tree") {
    val nets = MmdbGeo.networks(bytes)
    assert(nets.size === 9)
    assert(nets.head === ((ip(10, 0, 0, 0), ip(10, 255, 255, 255), "US")))
    assert(nets.contains((ip(80, 0, 0, 0), ip(80, 127, 255, 255), "IN")))
    assert(nets.contains((ip(80, 128, 0, 0), ip(80, 255, 255, 255), "FR")))
    // ranges are disjoint and sorted
    nets.sliding(2).foreach { case Seq(a, b) => assert(a._2 < b._1) }
  }
}
