package graft.sources

import scala.collection.mutable.ArrayBuffer

/** A real (subset) MaxMind DB binary reader + a fixture writer, per
  * the PUBLIC MaxMind DB file format spec (the reference opens these
  * files via the public maxminddb-golang lib:
  * services/geolocation/maxmind.go:21-36,
  * enterprise/reporting/maxmind.go).
  *
  * Layout handled: an IPv4 binary search tree of fixed-size nodes
  * (record_size 24 → 6 bytes/node, each half a big-endian record), a
  * 16-byte zero separator, a data section of typed values (strings,
  * uints, maps), and a metadata map located by scanning backwards for
  * the \\xab\\xcd\\xef"MaxMind.com" marker. Tree records resolve per
  * spec: value < node_count → child node; value == node_count → no
  * data; value > node_count → data-section offset value - node_count
  * - 16.
  *
  * The decoder is config-plane code: a production pipeline parses the
  * (megabytes-sized) mmdb once driver-side into a range table and
  * broadcast-joins it — exactly the t5 join shape; t5b proves the
  * binary decode itself against a closed-form oracle.
  */
object MmdbGeo {

  // ---- data-section / metadata value decoder (types 2, 5, 6, 7) ----

  private def ub(b: Byte): Int = b & 0xff

  /** Decode one typed value at `off`; returns (value, next offset). */
  private[sources] def decodeValue(bytes: Array[Byte], off: Int): (Any, Int) = {
    val ctrl = ub(bytes(off))
    val typ = ctrl >>> 5
    val size = ctrl & 0x1f
    typ match {
      case 2 => // UTF-8 string
        (new String(bytes, off + 1, size, "UTF-8"), off + 1 + size)
      case 5 | 6 => // uint16 / uint32, `size` bytes big-endian
        var v = 0L
        var i = 0
        while (i < size) { v = (v << 8) | ub(bytes(off + 1 + i)); i += 1 }
        (v, off + 1 + size)
      case 7 => // map of `size` entries
        var o = off + 1
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        var i = 0
        while (i < size) {
          val (k, o1) = decodeValue(bytes, o)
          val (v, o2) = decodeValue(bytes, o1)
          m += k.asInstanceOf[String] -> v
          o = o2
          i += 1
        }
        (m.toMap, o)
      case other =>
        throw new IllegalArgumentException(s"unsupported mmdb type $other at offset $off")
    }
  }

  private val marker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes("UTF-8")

  /** Parse the metadata map by scanning backwards for the marker. */
  private[sources] def metadata(bytes: Array[Byte]): Map[String, Any] = {
    var i = bytes.length - marker.length
    while (i >= 0 && !bytes.slice(i, i + marker.length).sameElements(marker)) i -= 1
    require(i >= 0, "mmdb metadata marker not found")
    decodeValue(bytes, i + marker.length)._1.asInstanceOf[Map[String, Any]]
  }

  private def nodeCount(md: Map[String, Any]): Int = md("node_count").asInstanceOf[Long].toInt

  private def readRecord(bytes: Array[Byte], node: Int, right: Boolean): Int = {
    val base = node * 6 + (if (right) 3 else 0) // record_size 24
    (ub(bytes(base)) << 16) | (ub(bytes(base + 1)) << 8) | ub(bytes(base + 2))
  }

  private def dataAt(bytes: Array[Byte], nc: Int, record: Int): Map[String, Any] = {
    val dataStart = nc * 6 + 16 // tree + separator
    decodeValue(bytes, dataStart + (record - nc - 16))._1.asInstanceOf[Map[String, Any]]
  }

  /** Locate one IPv4 address (the reference's Locate): walk the tree
    * MSB-first; returns the record's country_code if the path ends in
    * data.
    */
  def lookup(bytes: Array[Byte], ip: Long): Option[String] = {
    val nc = nodeCount(metadata(bytes))
    var node = 0
    var bit = 31
    while (bit >= 0) {
      val rec = readRecord(bytes, node, ((ip >> bit) & 1) == 1)
      if (rec == nc) return None
      if (rec > nc) return dataAt(bytes, nc, rec).get("country_code").map(_.toString)
      node = rec
      bit -= 1
    }
    None
  }

  /** Enumerate every network in the tree as inclusive IPv4 ranges —
    * the one-time driver-side decode that feeds the broadcast range
    * join.
    */
  def networks(bytes: Array[Byte]): Seq[(Long, Long, String)] = {
    val nc = nodeCount(metadata(bytes))
    val out = ArrayBuffer.empty[(Long, Long, String)]
    def walk(node: Int, prefix: Long, depth: Int): Unit = {
      for (rightSide <- Seq(false, true)) {
        val p = (prefix << 1) | (if (rightSide) 1L else 0L)
        val rec = readRecord(bytes, node, rightSide)
        if (rec > nc) {
          val lo = p << (32 - depth - 1)
          val hi = lo + (1L << (32 - depth - 1)) - 1
          out += ((lo, hi, dataAt(bytes, nc, rec)("country_code").toString))
        } else if (rec < nc) walk(rec, p, depth + 1)
      }
    }
    walk(0, 0L, 0)
    out.toSeq.sortBy(_._1)
  }

  // ---- fixture writer (the hand-built synthetic tree) ----

  private sealed trait Rec
  private case object Empty extends Rec
  private final case class Child(idx: Int) extends Rec
  private final case class Data(cc: String) extends Rec
  private final class BNode { var l: Rec = Empty; var r: Rec = Empty }

  private def encStr(s: String): Array[Byte] = {
    require(s.length < 29)
    (0x40 | s.length).toByte +: s.getBytes("UTF-8")
  }

  private def encUint(v: Long): Array[Byte] = {
    val payload = ArrayBuffer.empty[Byte]
    var x = v
    while (x > 0) { payload.prepend((x & 0xff).toByte); x >>= 8 }
    if (payload.isEmpty) payload += 0.toByte
    ((5 << 5) | payload.length).toByte +: payload.toArray
  }

  private def encMap(entries: Seq[(String, Array[Byte])]): Array[Byte] =
    ((7 << 5) | entries.length).toByte +:
      entries.flatMap { case (k, v) => encStr(k) ++ v }.toArray

  /** Serialize a set of (prefix bits, prefix length, country) networks
    * into a spec-shaped IPv4 mmdb with 24-bit records.
    */
  def buildFixture(nets: Seq[(Long, Int, String)]): Array[Byte] = {
    val nodes = ArrayBuffer(new BNode)
    nets.foreach { case (prefix, len, cc) =>
      var cur = 0
      for (i <- 0 until len) {
        val bit = (prefix >> (len - 1 - i)) & 1
        val last = i == len - 1
        def get(n: BNode) = if (bit == 1) n.r else n.l
        def set(n: BNode, v: Rec) = if (bit == 1) n.r = v else n.l = v
        if (last) set(nodes(cur), Data(cc))
        else get(nodes(cur)) match {
          case Child(idx) => cur = idx
          case Empty =>
            nodes += new BNode
            set(nodes(cur), Child(nodes.length - 1))
            cur = nodes.length - 1
          case Data(_) => throw new IllegalArgumentException("overlapping networks")
        }
      }
    }
    val nc = nodes.length
    val countries = nets.map(_._3).distinct
    val records = countries.map(cc => encMap(Seq("country_code" -> encStr(cc))))
    val offsets = records.scanLeft(0)(_ + _.length)
    val dataOffset = countries.zip(offsets).toMap
    def recordValue(r: Rec): Int = r match {
      case Empty => nc
      case Child(i) => i
      case Data(cc) => nc + 16 + dataOffset(cc)
    }
    def be3(v: Int) = Array(((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tree = nodes.toArray.flatMap(n => be3(recordValue(n.l)) ++ be3(recordValue(n.r)))
    val md = encMap(Seq(
      "node_count" -> encUint(nc),
      "record_size" -> encUint(24),
      "ip_version" -> encUint(4),
      "binary_format_major_version" -> encUint(2),
      "binary_format_minor_version" -> encUint(0)))
    tree ++ Array.fill(16)(0.toByte) ++ records.flatten ++ marker ++ md
  }

  /** The t5b synthetic tree: /8 blocks at octets 10..70 cycling
    * through 5 countries, plus octet 80 split at /9 (IN below
    * 80.128.0.0, FR above) to force a bit-9 tree walk.
    */
  lazy val fixtureBytes: Array[Byte] = {
    val cycle = Seq("US", "DE", "IN", "BR", "JP")
    val eights = (1 to 7).map(k => ((k * 10).toLong, 8, cycle((k - 1) % 5)))
    buildFixture(eights ++ Seq((160L, 9, "IN"), (161L, 9, "FR")))
  }
}
