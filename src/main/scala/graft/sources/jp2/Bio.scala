package graft.sources.jp2

import scala.collection.mutable.ArrayBuffer

/** Packet-header bit I/O with 0xFF stuffing — ISO/IEC 15444-1 B.10.1:
  * inside a packet header a 0xFF byte is followed by a byte whose MSB is
  * 0 (7 payload bits), so the header can never emulate a marker; a
  * header whose final byte is 0xFF gets a 0x00 stuffing byte appended.
  * Bits are MSB-first. */
final class BioWriter {
  private val out = new ArrayBuffer[Byte](32)
  private var acc = 0
  private var nb = 0
  private var prevFF = false

  private def cap: Int = if (prevFF) 7 else 8

  def bit(b: Int): Unit = {
    acc = (acc << 1) | (b & 1)
    nb += 1
    if (nb == cap) {
      out += acc.toByte
      prevFF = acc == 0xFF
      acc = 0
      nb = 0
    }
  }

  /** MSB-first fixed-width field. */
  def bits(v: Int, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { bit((v >> i) & 1); i -= 1 }
  }

  /** Pad the open byte with 0 bits and close the header (appending the
    * 0x00 stuffing byte if it would otherwise end on 0xFF). */
  def flush(): Array[Byte] = {
    if (nb > 0) {
      acc <<= (cap - nb)
      out += acc.toByte
      prevFF = acc == 0xFF
      acc = 0
      nb = 0
    }
    if (prevFF) { out += 0x00.toByte; prevFF = false }
    out.toArray
  }
}

/** Mirror of [[BioWriter]]: reads MSB-first bits from `data` starting at
  * `start`; [[endPos]] is the first byte past the header once all fields
  * are consumed (accounting for padding and the 0x00 stuffing byte). */
final class BioReader(data: Array[Byte], start: Int) {
  private var pos = start
  private var acc = 0
  private var nb = 0
  private var curFF = false

  def bit(): Int = {
    if (nb == 0) {
      val stuffed = curFF
      val v = if (pos < data.length) data(pos) & 0xFF else 0
      pos += 1
      nb = if (stuffed) 7 else 8
      curFF = v == 0xFF
      acc = v
    }
    nb -= 1
    (acc >> nb) & 1
  }

  def bits(n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | bit(); i += 1 }
    v
  }

  /** First byte offset past the header. */
  def endPos: Int = if (curFF) pos + 1 else pos
}

/** Tag tree — ISO/IEC 15444-1 B.10.2. A quad-tree over a `w`×`h` leaf
  * grid whose node values are the min over their children; coding emits
  * one bit per "is the value still above the running lower bound"
  * question, shared across the ancestor path. Used for code-block
  * inclusion and missing-bit-plane signalling in packet headers. */
final class TagTree(val w: Int, val h: Int) {
  require(w > 0 && h > 0)
  // level dims: level 0 = leaves, halving (ceil) until 1x1
  private val dims: Array[(Int, Int)] = {
    val b = ArrayBuffer((w, h))
    while (b.last._1 > 1 || b.last._2 > 1)
      b += (((b.last._1 + 1) / 2, (b.last._2 + 1) / 2))
    b.toArray
  }
  private val offs: Array[Int] = dims.scanLeft(0)((a, d) => a + d._1 * d._2)
  private val n = offs.last
  private val value = new Array[Int](n)
  private val low = new Array[Int](n)
  private val known = new Array[Boolean](n)

  private def idx(lvl: Int, x: Int, y: Int): Int = offs(lvl) + y * dims(lvl)._1 + x

  /** Reset for encoding: all values "unset" (Int.MaxValue placeholder). */
  def reset(): Unit = {
    java.util.Arrays.fill(value, Int.MaxValue)
    java.util.Arrays.fill(low, 0)
    java.util.Arrays.fill(known, false)
  }
  reset()

  /** Encoder side: set a leaf value and propagate the min up the tree. */
  def setValue(x: Int, y: Int, v: Int): Unit = {
    var lvl = 0
    var cx = x
    var cy = y
    var cv = v
    while (lvl < dims.length) {
      val i = idx(lvl, cx, cy)
      if (cv < value(i)) value(i) = cv else cv = value(i)
      lvl += 1
      cx /= 2
      cy /= 2
    }
  }

  private def path(x: Int, y: Int): Array[Int] = {
    val p = new Array[Int](dims.length)
    var lvl = 0
    var cx = x
    var cy = y
    while (lvl < dims.length) {
      p(dims.length - 1 - lvl) = idx(lvl, cx, cy) // root first
      lvl += 1
      cx /= 2
      cy /= 2
    }
    p
  }

  /** Emit the bits that decide whether leaf (x,y)'s value is below
    * `threshold`, reusing whatever ancestors already told the decoder. */
  def encode(bio: BioWriter, x: Int, y: Int, threshold: Int): Unit = {
    val p = path(x, y)
    var lo = 0
    var k = 0
    while (k < p.length) {
      val i = p(k)
      if (lo > low(i)) low(i) = lo else lo = low(i)
      var continue = true
      while (continue && lo < threshold) {
        if (lo >= value(i)) {
          if (!known(i)) { bio.bit(1); known(i) = true }
          continue = false
        } else {
          bio.bit(0)
          lo += 1
        }
      }
      low(i) = lo
      k += 1
    }
  }

  /** Decoder side: returns true when the leaf value is < threshold; node
    * values start unknown (Int.MaxValue) and are pinned by 1-bits. */
  def decode(bio: BioReader, x: Int, y: Int, threshold: Int): Boolean = {
    val p = path(x, y)
    var lo = 0
    var k = 0
    var leafI = -1
    while (k < p.length) {
      val i = p(k)
      leafI = i
      if (lo > low(i)) low(i) = lo else lo = low(i)
      var continue = true
      while (continue && lo < threshold && lo < value(i)) {
        if (bio.bit() == 1) { value(i) = lo; continue = false }
        else lo += 1
      }
      low(i) = lo
      k += 1
    }
    value(leafI) < threshold
  }

  /** Decoded leaf value (valid once [[decode]] returned true). */
  def leafValue(x: Int, y: Int): Int = value(idx(0, x, y))
}
