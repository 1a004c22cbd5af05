package graft.sources.jp2

/** MQ arithmetic coder — ISO/IEC 15444-1 Annex C (the same coder as
  * JBIG2 Annex E). Pure JDK arithmetic, built from the published
  * flowcharts: ENCODE/CODEMPS/CODELPS/RENORME/BYTEOUT/FLUSH on the
  * encoder side, INITDEC/DECODE/BYTEIN/RENORMD on the decoder side,
  * with the 47-entry Qe probability state table (Table C.2).
  *
  * Why hand-rolled: no JPEG 2000 codec ships with the JDK or this
  * environment, and the reference pipeline
  * (/root/reference/src/01-scrape-images.py:340) routes `.jp2` payloads
  * it never decodes — [[Jp2Codec]] closes that gap engine-side so a
  * 100 TB image corpus can be validated and decoded on executors.
  *
  * Carry handling follows the standard software convention: a zero
  * pre-byte absorbs a first-byte carry and is dropped from the emitted
  * codeword (the same convention every public implementation of the
  * spec flowcharts uses).
  */
object MQ {
  // Qe, NMPS, NLPS, SWITCH — Table C.2, flattened row-major.
  private[jp2] val Qe: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private[jp2] val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private[jp2] val Nlps: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private[jp2] val Switch: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** JPEG 2000 Tier-1 context count: 9 ZC + 5 SC + 3 MR + RL + UNIFORM. */
  val NumContexts = 19
  val CtxRl = 17
  val CtxUni = 18

  /** Initial (state, MPS) per Tier-1 contract (Table D.7): everything at
    * state 0 except ZC context 0 → 4, run-length → 3, UNIFORM → 46. */
  private[jp2] def initStates(states: Array[Int], mps: Array[Int]): Unit = {
    java.util.Arrays.fill(states, 0)
    java.util.Arrays.fill(mps, 0)
    states(0) = 4
    states(CtxRl) = 3
    states(CtxUni) = 46
  }
}

/** MQ encoder over `numCtx` adaptive contexts. Emits the codeword for
  * one code-block; [[flush]] terminates and returns the bytes (trailing
  * 0xFF dropped, as the decoder's past-the-end convention re-supplies
  * 1-bits). */
final class MQEncoder(numCtx: Int = MQ.NumContexts) {
  private var a: Int = 0x8000
  private var c: Long = 0L
  private var ct: Int = 12
  // bytes(0) is the carry-absorbing pre-byte, dropped at flush.
  private val bytes = new scala.collection.mutable.ArrayBuffer[Int](64)
  bytes += 0
  private var bp: Int = 0
  private val states = new Array[Int](numCtx)
  private val mps = new Array[Int](numCtx)
  MQ.initStates(states, mps)

  /** Re-initialize every context to Table D.7 (the RESET code-block
    * style option applies this at each coding-pass boundary). The
    * arithmetic registers (A/C/CT) are untouched — only the adaptive
    * probability states reset. */
  def resetContexts(): Unit = MQ.initStates(states, mps)

  /** Terminate the current codeword SEGMENT (C.2.9 flush) and restart
    * the arithmetic per INITENC — contexts persist across segments
    * (D.4.1: only RESET touches them). Returns the segment's bytes;
    * the encoder is immediately ready for the next segment. Used by
    * the per-pass-termination and bypass code-block styles, whose
    * codewords are sequences of individually-decodable segments. */
  def terminate(): Array[Byte] = {
    val seg = flush()
    a = 0x8000; c = 0L; ct = 12
    bytes.clear(); bytes += 0; bp = 0
    seg
  }

  def encode(bit: Int, cx: Int): Unit = {
    val s = states(cx)
    val qe = MQ.Qe(s)
    if (bit == mps(cx)) { // CODEMPS
      a -= qe
      if ((a & 0x8000) == 0) {
        if (a < qe) a = qe else c += qe
        states(cx) = MQ.Nmps(s)
        renorm()
      } else c += qe
    } else { // CODELPS
      a -= qe
      if (a < qe) c += qe else a = qe
      if (MQ.Switch(s) == 1) mps(cx) = 1 - mps(cx)
      states(cx) = MQ.Nlps(s)
      renorm()
    }
  }

  private def renorm(): Unit = {
    do {
      a <<= 1
      c <<= 1
      ct -= 1
      if (ct == 0) byteout() // BYTEOUT sets CT itself (7 after a 0xFF byte)
    } while ((a & 0x8000) == 0)
  }

  private def byteout(): Unit = {
    if (bytes(bp) == 0xFF) {
      bp += 1
      bytes += ((c >> 20) & 0xFF).toInt
      c &= 0xFFFFFL
      ct = 7
    } else if (c < 0x8000000L) {
      bp += 1
      bytes += ((c >> 19) & 0xFF).toInt
      c &= 0x7FFFFL
      ct = 8
    } else {
      bytes(bp) += 1 // carry
      if (bytes(bp) == 0xFF) {
        c &= 0x7FFFFFFL
        bp += 1
        bytes += ((c >> 20) & 0xFF).toInt
        c &= 0xFFFFFL
        ct = 7
      } else {
        bp += 1
        bytes += ((c >> 19) & 0xFF).toInt
        c &= 0x7FFFFL
        ct = 8
      }
    }
  }

  /** Bytes emitted so far (excluding the carry pre-byte). Used by Tier-1
    * to place conservative truncation lengths at coding-pass boundaries:
    * every decision through the current pass consumed at most these bytes
    * plus the small flush tail, so `emitted + guard` is a spec-valid
    * prefix length for a decoder stopping at this pass. */
  def emitted: Int = bp

  /** FLUSH (C.2.9, software convention): set as many C bits to 1 as the
    * final interval allows, push out two bytes, drop a trailing 0xFF. */
  def flush(): Array[Byte] = {
    val tempc = c + a
    c |= 0xFFFFL
    if (c >= tempc) c -= 0x8000L
    c <<= ct
    byteout()
    c <<= ct
    byteout()
    val last = if (bytes(bp) == 0xFF) bp - 1 else bp
    val out = new Array[Byte](math.max(0, last)) // drop pre-byte at 0
    var i = 1
    while (i <= last) { out(i - 1) = bytes(i).toByte; i += 1 }
    out
  }
}

/** MQ decoder over the same contexts; reads past the end of `data` as
  * 0xFF bytes per the spec's termination convention. */
final class MQDecoder(data: Array[Byte], numCtx: Int = MQ.NumContexts) {
  private var bp: Int = 0
  private var c: Long = 0L
  private var ct: Int = 0
  private var a: Int = 0
  private val states = new Array[Int](numCtx)
  private val mps = new Array[Int](numCtx)
  MQ.initStates(states, mps)

  /** Mirror of [[MQEncoder.resetContexts]] for the RESET style option. */
  def resetContexts(): Unit = MQ.initStates(states, mps)

  /** Adopt another decoder's adaptive context states — segment N+1 of a
    * multi-segment codeword continues where segment N's contexts left
    * off (a fresh MQDecoder per segment restarts only the arithmetic,
    * mirroring [[MQEncoder.terminate]]). */
  private[jp2] def importContexts(s: Array[Int], m: Array[Int]): Unit = {
    System.arraycopy(s, 0, states, 0, states.length)
    System.arraycopy(m, 0, mps, 0, mps.length)
  }

  /** Export the adaptive context states for the next segment's decoder. */
  private[jp2] def exportContexts(s: Array[Int], m: Array[Int]): Unit = {
    System.arraycopy(states, 0, s, 0, states.length)
    System.arraycopy(mps, 0, m, 0, mps.length)
  }

  private def byteAt(i: Int): Int =
    if (i < data.length) data(i) & 0xFF else 0xFF

  // INITDEC
  c = byteAt(0).toLong << 16
  bytein()
  c <<= 7
  ct -= 7
  a = 0x8000

  private def bytein(): Unit = {
    if (byteAt(bp) == 0xFF) {
      if (byteAt(bp + 1) > 0x8F) { c += 0xFF00L; ct = 8 }
      else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
    } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
  }

  def decode(cx: Int): Int = {
    val s = states(cx)
    val qe = MQ.Qe(s)
    a -= qe
    var d = 0
    if (((c >> 16) & 0xFFFFL) < qe) {
      // LPS exchange path
      if (a < qe) { d = mps(cx); states(cx) = MQ.Nmps(s) }
      else {
        d = 1 - mps(cx)
        if (MQ.Switch(s) == 1) mps(cx) = 1 - mps(cx)
        states(cx) = MQ.Nlps(s)
      }
      a = qe
      renorm()
    } else {
      c -= qe.toLong << 16
      if ((a & 0x8000) == 0) {
        // MPS exchange path
        if (a < qe) {
          d = 1 - mps(cx)
          if (MQ.Switch(s) == 1) mps(cx) = 1 - mps(cx)
          states(cx) = MQ.Nlps(s)
        } else { d = mps(cx); states(cx) = MQ.Nmps(s) }
        renorm()
      } else d = mps(cx)
    }
    d
  }

  private def renorm(): Unit = {
    do {
      if (ct == 0) bytein()
      a <<= 1
      c = (c << 1) & 0xFFFFFFFFL
      ct -= 1
    } while ((a & 0x8000) == 0)
  }
}
