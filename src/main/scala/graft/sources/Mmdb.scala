package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MaxMind DB (.mmdb) binary reader — F1's production input format (ref
  * `libs/core-functions/src/functions/lib/index.ts` fills the geo
  * context from a MaxMind lookup). The format is publicly specified
  * (MaxMind DB File Format Specification 2.0): a binary search tree
  * over IP bits, a typed data section, and a metadata map after the
  * `\xAB\xCD\xEFMaxMind.com` marker.
  *
  * Spark-first shape: the tree is NOT probed per event row. [[readRanges]]
  * walks the tree ONCE driver-side (a GeoLite2 country tree is ~a few
  * hundred thousand leaves — driver-trivial), flattens every leaf to an
  * `(ip_lo, ip_hi, attrs)` range, and [[dim]] hands the result to
  * [[graft.operators.GeoIp.lookup]]'s broadcast bucketed equi-join: the
  * per-event work stays a codegen'd hash probe, and the mmdb file is
  * read exactly once per job, not once per executor.
  *
  * Supports record sizes 24/28/32 and ip_version 4 or 6 (IPv4 ranges in
  * a v6 tree sit under ::/96 per the spec; [[readRanges]] descends those
  * 96 zero bits first). The data decoder covers pointers, strings,
  * doubles, bytes, uint16/32/64, int32, maps, arrays, booleans, floats.
  */
object Mmdb {

  private val Marker: Array[Byte] =
    Array[Byte](0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes(StandardCharsets.US_ASCII)

  final case class Meta(nodeCount: Int, recordSize: Int, ipVersion: Int)

  /** Decoded leaf: inclusive IPv4 range + dot-flattened attributes
    * (`country.iso_code` -> "US"). */
  final case class IpRange(ipLo: Long, ipHi: Long,
                           attrs: Map[String, String])

  // ---- public API -----------------------------------------------------

  /** All IPv4 ranges in the database, driver-side. */
  def readRanges(path: String): Seq[IpRange] = {
    val buf = Files.readAllBytes(Paths.get(path))
    val meta = readMeta(buf)
    val nodeBytes = meta.recordSize * 2 / 8
    val dataStart = meta.nodeCount * nodeBytes + 16
    val dec = new Decoder(buf, dataStart)
    // v6 trees hold v4 under ::/96: follow 96 zero bits to the v4 root
    var root = 0
    if (meta.ipVersion == 6) {
      var i = 0
      while (i < 96 && root < meta.nodeCount) {
        root = record(buf, meta, root, 0); i += 1
      }
    }
    if (root >= meta.nodeCount) return Seq.empty
    val out = Seq.newBuilder[IpRange]
    def walk(node: Int, depth: Int, prefix: Long): Unit = {
      var side = 0
      while (side < 2) {
        val r = record(buf, meta, node, side)
        val p = (prefix << 1) | side
        if (r < meta.nodeCount) {
          if (depth < 32) walk(r, depth + 1, p)
        } else if (r > meta.nodeCount) {
          // data record: leaf covering the whole remaining prefix
          val lo = p << (32 - depth - 1)
          val hi = lo + (1L << (32 - depth - 1)) - 1L
          val dataOff = dataStart + (r - meta.nodeCount - 16)
          val value = dec.decode(dataOff)._1
          out += IpRange(lo, hi, flatten(value))
        } // == nodeCount: empty subtree
        side += 1
      }
    }
    walk(root, 0, 0L)
    out.result()
  }

  /** Single-IP tree walk (the per-request shape; used by the spec to
    * cross-check the range enumeration). */
  def lookupIp(path: String, ipv4: Long): Option[Map[String, String]] = {
    val buf = Files.readAllBytes(Paths.get(path))
    val meta = readMeta(buf)
    val nodeBytes = meta.recordSize * 2 / 8
    val dataStart = meta.nodeCount * nodeBytes + 16
    var node = 0
    if (meta.ipVersion == 6) {
      var i = 0
      while (i < 96 && node < meta.nodeCount) {
        node = record(buf, meta, node, 0); i += 1
      }
    }
    var bit = 31
    while (bit >= 0 && node < meta.nodeCount) {
      val side = ((ipv4 >> bit) & 1L).toInt
      node = record(buf, meta, node, side)
      bit -= 1
    }
    if (node <= meta.nodeCount) None
    else {
      val dec = new Decoder(buf, dataStart)
      Some(flatten(dec.decode(dataStart + (node - meta.nodeCount - 16))._1))
    }
  }

  /** Broadcastable geo dim: `(ip_lo, ip_hi)` + one column per requested
    * `(dotted.attr.path -> columnName)`; feed to [[graft.operators.GeoIp.lookup]]. */
  def dim(spark: SparkSession, path: String,
          attrs: Seq[(String, String)]): DataFrame = {
    val ranges = readRanges(path)
    import spark.implicits._
    val rows = ranges.map(r =>
      (r.ipLo, r.ipHi, attrs.map { case (k, _) => r.attrs.get(k) }))
    rows.toDF("ip_lo", "ip_hi", "_attrs")
      .select(col("ip_lo") :: col("ip_hi") ::
        attrs.zipWithIndex.map { case ((_, name), i) =>
          col("_attrs").getItem(i).as(name)
        }.toList: _*)
  }

  // ---- tree + metadata ------------------------------------------------

  private def u8(b: Byte): Int = b & 0xff

  /** Record `side` (0=left, 1=right) of `node` for 24/28/32-bit layouts. */
  private def record(buf: Array[Byte], meta: Meta, node: Int,
                     side: Int): Int = {
    val base = node * (meta.recordSize * 2 / 8)
    meta.recordSize match {
      case 24 =>
        val o = base + side * 3
        (u8(buf(o)) << 16) | (u8(buf(o + 1)) << 8) | u8(buf(o + 2))
      case 28 =>
        if (side == 0)
          ((u8(buf(base + 3)) >> 4) << 24) | (u8(buf(base)) << 16) |
            (u8(buf(base + 1)) << 8) | u8(buf(base + 2))
        else
          ((u8(buf(base + 3)) & 0x0f) << 24) | (u8(buf(base + 4)) << 16) |
            (u8(buf(base + 5)) << 8) | u8(buf(base + 6))
      case 32 =>
        val o = base + side * 4
        (u8(buf(o)) << 24) | (u8(buf(o + 1)) << 16) |
          (u8(buf(o + 2)) << 8) | u8(buf(o + 3))
      case other =>
        throw new IllegalArgumentException(s"record_size $other")
    }
  }

  /** Test hook: decode the value at `off` against a data section
    * starting at `sectionStart` (pointer targets resolve relative to
    * it). */
  private[graft] def decodeValue(buf: Array[Byte], sectionStart: Int,
                                 off: Int): Any =
    new Decoder(buf, sectionStart).decode(off)._1

  private[graft] def readMeta(buf: Array[Byte]): Meta = {
    val idx = lastIndexOf(buf, Marker)
    require(idx >= 0, "not an mmdb file: metadata marker missing")
    val metaStart = idx + Marker.length
    // metadata is self-contained: pointers (if any) resolve within it
    val dec = new Decoder(buf, metaStart)
    val m = dec.decode(metaStart)._1.asInstanceOf[Map[String, Any]]
    Meta(
      nodeCount = m("node_count").asInstanceOf[Long].toInt,
      recordSize = m("record_size").asInstanceOf[Long].toInt,
      ipVersion = m("ip_version").asInstanceOf[Long].toInt)
  }

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = hay.length - needle.length
    while (i >= 0) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i -= 1
    }
    -1
  }

  private def flatten(v: Any): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    def go(prefix: String, x: Any): Unit = x match {
      case m: Map[_, _] => m.foreach { case (k, v2) =>
        go(if (prefix.isEmpty) k.toString else s"$prefix.$k", v2)
      }
      case a: Seq[_] => a.zipWithIndex.foreach { case (v2, i) =>
        go(s"$prefix.$i", v2)
      }
      case other => out += prefix -> String.valueOf(other)
    }
    go("", v)
    out.result()
  }

  // ---- data-section decoder (spec §"Data Section") ---------------------

  private final class Decoder(buf: Array[Byte], sectionStart: Int) {

    /** Decode the value at `off`; returns (value, offsetAfter). */
    def decode(off: Int): (Any, Int) = {
      val ctrl = u8(buf(off))
      var typ = ctrl >> 5
      var p = off + 1
      if (typ == 0) { typ = 7 + u8(buf(p)); p += 1 } // extended
      if (typ == 1) return decodePointer(ctrl, p)
      val (size, q) = decodeSize(ctrl & 0x1f, p)
      typ match {
        case 2 => // UTF-8 string
          (new String(buf, q, size, StandardCharsets.UTF_8), q + size)
        case 3 => // double
          (java.lang.Double.longBitsToDouble(beLong(q, 8)), q + 8)
        case 4 => // bytes
          (buf.slice(q, q + size).toSeq, q + size)
        case 5 | 6 => (beLong(q, size), q + size) // uint16/uint32
        case 7 => // map
          var o = q
          val m = Map.newBuilder[String, Any]
          var i = 0
          while (i < size) {
            val (k, o1) = decode(o)
            val (v, o2) = decode(o1)
            m += k.toString -> v; o = o2; i += 1
          }
          (m.result(), o)
        case 8 => // int32
          val raw = beLong(q, size)
          val v = if (size == 4 && (raw & 0x80000000L) != 0)
            raw - 0x100000000L else raw
          (v, q + size)
        case 9 | 10 => (beLong(q, size), q + size) // uint64/uint128 (as long)
        case 11 => // array
          var o = q
          val a = Seq.newBuilder[Any]
          var i = 0
          while (i < size) { val (v, o1) = decode(o); a += v; o = o1; i += 1 }
          (a.result(), o)
        case 14 => (size == 1, q) // boolean: size IS the value
        case 15 => // float
          (java.lang.Float.intBitsToFloat(beLong(q, 4).toInt).toDouble, q + 4)
        case other =>
          throw new IllegalArgumentException(s"mmdb type $other @ $off")
      }
    }

    private def decodeSize(s5: Int, p: Int): (Int, Int) = s5 match {
      case 29 => (29 + u8(buf(p)), p + 1)
      case 30 => (285 + ((u8(buf(p)) << 8) | u8(buf(p + 1))), p + 2)
      case 31 => (65821 + ((u8(buf(p)) << 16) | (u8(buf(p + 1)) << 8) |
        u8(buf(p + 2))), p + 3)
      case n => (n, p)
    }

    private def decodePointer(ctrl: Int, p: Int): (Any, Int) = {
      val ss = (ctrl >> 3) & 0x3
      val v3 = ctrl & 0x7
      val (ptr, after) = ss match {
        case 0 => ((v3 << 8) | u8(buf(p)), p + 1)
        case 1 => (((v3 << 16) | (u8(buf(p)) << 8) | u8(buf(p + 1))) + 2048,
          p + 2)
        case 2 => (((v3 << 24) | (u8(buf(p)) << 16) | (u8(buf(p + 1)) << 8) |
          u8(buf(p + 2))) + 526336, p + 3)
        case _ => ((u8(buf(p)) << 24) | (u8(buf(p + 1)) << 16) |
          (u8(buf(p + 2)) << 8) | u8(buf(p + 3)), p + 4)
      }
      (decode(sectionStart + ptr)._1, after)
    }

    private def beLong(off: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(buf(off + i)); i += 1 }
      v
    }
  }

  // ---- fixture encoder ------------------------------------------------

  /** Write a tiny, spec-conformant .mmdb (record_size 24, ip_version 4)
    * from `(prefixBase, prefixLen, data)` entries — the test/gate
    * fixture generator (production reads real MaxMind files; this
    * exists because the format spec is public and a fixture must be
    * built in-sandbox). Data values may be String, Long (uint32),
    * Double, Boolean, Map[String, Any], Seq[Any]. */
  def write(path: String,
            entries: Seq[(Long, Int, Map[String, Any])]): Unit = {
    // 1. data section: encode each entry's map once, DEDUPED — ranges
    // with identical data share one record (the real-world shape: a
    // country database has millions of ranges over ~250 distinct data
    // records; tree records point at the same offset)
    val data = new java.io.ByteArrayOutputStream()
    val seen = scala.collection.mutable.HashMap[Seq[Byte], Int]()
    val offsets = entries.map { case (_, _, m) =>
      val bytes = encodeValue(m)
      seen.getOrElseUpdate(bytes.toSeq, {
        val off = data.size()
        data.write(bytes)
        off
      })
    }
    // 2. binary trie over the prefixes
    sealed trait N
    final class Internal(var left: Option[N] = None,
                         var right: Option[N] = None) extends N
    final case class Leaf(dataIdx: Int) extends N
    val root = new Internal()
    entries.zipWithIndex.foreach { case ((base, len, _), idx) =>
      var node = root
      var bit = 31
      while (bit > 32 - len) {
        val side = ((base >> bit) & 1L).toInt
        val next = (if (side == 0) node.left else node.right) match {
          case Some(n: Internal) => n
          case Some(_: Leaf) =>
            throw new IllegalArgumentException("overlapping prefixes")
          case None =>
            val n = new Internal()
            if (side == 0) node.left = Some(n) else node.right = Some(n)
            n
          case _ => throw new IllegalStateException()
        }
        node = next
        bit -= 1
      }
      val side = ((base >> bit) & 1L).toInt
      if (side == 0) node.left = Some(Leaf(idx)) else node.right = Some(Leaf(idx))
    }
    // 3. number internal nodes (preorder), then emit 24-bit records
    val nodes = scala.collection.mutable.ArrayBuffer[Internal]()
    def collect(n: Internal): Unit = {
      nodes += n
      n.left.foreach { case i: Internal => collect(i); case _ => }
      n.right.foreach { case i: Internal => collect(i); case _ => }
    }
    collect(root)
    val index = nodes.zipWithIndex.toMap
    val nodeCount = nodes.length
    val tree = new java.io.ByteArrayOutputStream()
    def recordValue(child: Option[N]): Int = child match {
      case None => nodeCount
      case Some(i: Internal) => index(i)
      case Some(Leaf(di)) => nodeCount + 16 + offsets(di)
    }
    def put24(v: Int): Unit = {
      tree.write((v >> 16) & 0xff); tree.write((v >> 8) & 0xff)
      tree.write(v & 0xff)
    }
    nodes.foreach { n => put24(recordValue(n.left)); put24(recordValue(n.right)) }
    // 4. assemble: tree + 16-byte separator + data + marker + metadata
    val out = new java.io.ByteArrayOutputStream()
    out.write(tree.toByteArray)
    out.write(new Array[Byte](16))
    out.write(data.toByteArray)
    out.write(Marker)
    out.write(encodeValue(Map(
      "binary_format_major_version" -> 2L,
      "binary_format_minor_version" -> 0L,
      "build_epoch" -> 0L,
      "database_type" -> "graft-fixture",
      "description" -> Map("en" -> "graft test fixture"),
      "ip_version" -> 4L,
      "languages" -> Seq("en"),
      "node_count" -> nodeCount.toLong,
      "record_size" -> 24L)))
    Files.write(Paths.get(path), out.toByteArray): Unit
  }

  private def encodeValue(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ctrl(typ: Int, size: Int): Unit = {
      // sizes < 29 only — fixture values are small
      require(size < 29, "fixture encoder supports sizes < 29")
      if (typ <= 7) out.write((typ << 5) | size)
      else { out.write(size); out.write(typ - 7) }
    }
    def beBytes(v: Long): Array[Byte] = {
      if (v == 0L) Array.empty
      else {
        var n = 8
        while (n > 1 && (v >> ((n - 1) * 8)) == 0L) n -= 1
        Array.tabulate(n)(i => ((v >> ((n - 1 - i) * 8)) & 0xff).toByte)
      }
    }
    def enc(x: Any): Unit = x match {
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        ctrl(2, b.length); out.write(b)
      case d: Double =>
        ctrl(3, 8)
        val bits = java.lang.Double.doubleToLongBits(d)
        (7 to 0 by -1).foreach(i => out.write(((bits >> (i * 8)) & 0xff).toInt))
      case n: Long =>
        val b = beBytes(n)
        if (b.length <= 4) { ctrl(6, b.length); out.write(b) }
        else { ctrl(9, b.length); out.write(b) } // uint64
      case n: Int => enc(n.toLong)
      case b: Boolean => ctrl(14, if (b) 1 else 0)
      case m: Map[_, _] =>
        ctrl(7, m.size)
        m.toSeq.sortBy(_._1.toString).foreach { case (k, v2) =>
          enc(k.toString); enc(v2)
        }
      case a: Seq[_] =>
        ctrl(11, a.size) // array
        a.foreach(enc)
      case other =>
        throw new IllegalArgumentException(s"unsupported ${other.getClass}")
    }
    enc(v)
    out.toByteArray
  }
}
