package graft.sources

/** Minimal JPEG 2000 header codec, pure JDK byte arithmetic — no codec
  * library exists in this environment and none is needed for header
  * truth: the reference only ever routes `.jp2` files by name
  * (`/root/reference/src/01-scrape-images.py:340`), while a 100 TB image
  * pipeline wants at least validated dimensions before paying a decode.
  *
  * Two public layouts are supported (both from ISO/IEC 15444-1):
  *   - JP2 container: signature box (`jP  `), then a `jp2h` superbox
  *     whose `ihdr` box carries height and width as big-endian u32;
  *   - raw codestream: SOC marker (FF4F) followed by the SIZ segment
  *     (FF51) carrying Xsiz/Ysiz/XOsiz/YOsiz — image size is the grid
  *     minus the offsets.
  *
  * Header fields here are exact and cheap — the right first gate before
  * paying a decode. Full pixel decode of the entropy-coded payload lives
  * in [[graft.sources.jp2.Jp2Codec]] (the engine's own ISO/IEC 15444-1
  * lossless codec, round 14); it accepts both raw codestreams and JP2
  * containers built by [[buildContainer]].
  */
object Jp2Box {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private val SignatureType = 0x6a502020L // "jP  "
  private val Jp2hType = 0x6a703268L // "jp2h"
  private val IhdrType = 0x69686472L // "ihdr"

  /** Width and height from a JP2 container or raw codestream; None when
    * the bytes are neither (callers flag, never fake). */
  def parseDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0x4f)
      parseCodestream(bytes)
    else if (bytes.length >= 12 && be32(bytes, 0) == 12L &&
      be32(bytes, 4) == SignatureType)
      findIhdr(bytes, 12, bytes.length)
    else None

  /** Walk sibling boxes in [from, to); recurse into jp2h. */
  @annotation.tailrec
  private def findIhdr(b: Array[Byte], from: Int, to: Int): Option[(Int, Int)] = {
    if (from + 8 > to) None
    else {
      val len0 = be32(b, from)
      val typ = be32(b, from + 4)
      // lbox 0 = "to end of file"; lbox 1 = 64-bit xlbox (not emitted by
      // anything this engine reads — treat as unparseable, not a guess)
      val len = if (len0 == 0L) (to - from).toLong else len0
      if (len0 == 1L || len < 8L || from + len > to) None
      else if (typ == IhdrType && len >= 16L) {
        val height = be32(b, from + 8)
        val width = be32(b, from + 12)
        if (width > 0 && height > 0 && width <= Int.MaxValue && height <= Int.MaxValue)
          Some((width.toInt, height.toInt))
        else None
      }
      else if (typ == Jp2hType) findIhdr(b, from + 8, (from + len).toInt)
      else findIhdr(b, (from + len).toInt, to)
    }
  }

  /** SOC (FF4F) then marker segments until SIZ (FF51). */
  private def parseCodestream(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0x51) { // SIZ: len(2) Rsiz(2) Xsiz(4) Ysiz(4) XOsiz(4) YOsiz(4) ...
        if (i + 22 > b.length) return None
        val xsiz = be32(b, i + 6)
        val ysiz = be32(b, i + 10)
        val xo = be32(b, i + 14)
        val yo = be32(b, i + 18)
        val (w, h) = (xsiz - xo, ysiz - yo)
        // same overflow guard as findIhdr: u32 sizes above Int.MaxValue
        // must read as unparseable, not truncate into wrong Ints
        return if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some((w.toInt, h.toInt))
        else None
      }
      i += 2 + be16(b, i + 2) // next marker: 2-byte marker + segment length
    }
    None
  }

  /** Component count (Csiz) and per-component Ssiz bytes from a raw
    * codestream's SIZ segment; None when the bytes don't start with SOC
    * or SIZ never arrives. Ssiz carries depth-1 in bits 0..6 and the
    * signed flag in bit 7 — exactly the encoding ihdr BPC / bpcc reuse
    * (ISO/IEC 15444-1 I.5.3.1), so the values pass through unchanged. */
  private def parseSiz(b: Array[Byte]): Option[(Int, Seq[Int])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0x4f) return None
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      if ((b(i + 1) & 0xff) == 0x51) { // SIZ: Csiz is 34 bytes past Lsiz
        if (i + 40 > b.length) return None
        val nc = be16(b, i + 38)
        // per-component triplets (Ssiz, XRsiz, YRsiz) follow Csiz
        if (i + 40 + 3 * nc > b.length) return None
        val ssiz = (0 until nc).map(c => b(i + 40 + 3 * c) & 0xff)
        return Some((nc, ssiz))
      }
      i += 2 + be16(b, i + 2)
    }
    None
  }

  /** Build a header-true JP2 container: real signature/ftyp/jp2h/ihdr
    * boxes around the jp2c payload. The payload may be a real codestream
    * (e.g. from [[graft.sources.jp2.Jp2Codec.encode]]) — then the ihdr
    * component count AND bit depth are read from its SIZ so container
    * and codestream can never disagree (I.5.3.1: ihdr BPC must equal the
    * SIZ Ssiz, or be 0xFF with a bpcc box when components differ) — or
    * opaque bytes (header-only fixtures for tests and docs), which
    * default to 3 components of 8-bit unsigned. */
  def buildContainer(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0)
    val (nc, ssiz) = parseSiz(payload).getOrElse((3, Seq(7, 7, 7)))
    val uniform = ssiz.distinct.size == 1
    val bpc = if (uniform) ssiz.head else 0xff
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    // signature box
    u32(12L); ascii("jP  "); u32(0x0d0a870aL)
    // ftyp box: brand jp2, minor 0, compatible jp2
    u32(20L); ascii("ftyp"); ascii("jp2 "); u32(0L); ascii("jp2 ")
    // jp2h superbox: one ihdr child (8 + 22), plus a bpcc child when
    // component depths differ and ihdr BPC must signal 0xFF
    val bpccLen = if (uniform) 0 else 8 + nc
    u32(30L + bpccLen); ascii("jp2h")
    u32(22L); ascii("ihdr"); u32(height.toLong); u32(width.toLong)
    out.write((nc >> 8) & 0xff); out.write(nc & 0xff) // nc from SIZ (or 3)
    out.write(bpc) // BPC: Ssiz passthrough (depth-1, bit 7 = signed)
    out.write(7) // compression type (wavelet)
    out.write(0); out.write(0) // unkC, IPR
    if (!uniform) {
      u32(8L + nc); ascii("bpcc"); ssiz.foreach(out.write)
    }
    // jp2c box with the opaque payload
    u32(8L + payload.length); ascii("jp2c"); out.write(payload)
    out.toByteArray
  }
}
