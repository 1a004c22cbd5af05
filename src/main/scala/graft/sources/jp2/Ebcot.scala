package graft.sources.jp2

/** EBCOT Tier-1 code-block coder — ISO/IEC 15444-1 Annex D. Codes one
  * code-block of sign-magnitude wavelet coefficients bit-plane by
  * bit-plane with three passes per plane (significance propagation,
  * magnitude refinement, cleanup; the top plane is cleanup-only), a
  * 4-row stripe scan, and the Annex-D context model: 9 zero-coding
  * contexts (band-orientation dependent), 5 sign contexts, 3 magnitude
  * refinement contexts, run-length and UNIFORM contexts — all driving
  * one [[MQEncoder]]/[[MQDecoder]] per code-block.
  *
  * Code-block style options (r17, SPcod/SPcoc bit values, Table A.19):
  * BYPASS ("lazy" coding, D.7) codes SPP/MRP passes after the 10-pass
  * MQ prefix raw, RESET re-initializes every MQ context at each
  * coding-pass boundary (D.2 option), RESTART terminates the coder on
  * every pass, CAUSAL makes context formation vertically causal —
  * a sample in stripe row 3 sees the stripe below as insignificant
  * (D.3.3), SEGSYM codes the four-bit symbol 1010 in the UNIFORM
  * context at the end of every cleanup pass and the decoder verifies it
  * (D.4.2 error resilience). BYPASS/RESTART make the codeword a
  * sequence of terminated SEGMENTS with a layout ([[segmentEnds]])
  * both codec sides compute from (numbps, opts); Tier-2 signals one
  * length per segment. Only predictable termination (0x10) stays
  * outside the ENCODER's profile (it changes the flush arithmetic) and
  * is rejected at encode ([[graft.sources.jp2.Jp2Codec.encode]]); on
  * DECODE it is tolerated since r17 — a predictably-terminated foreign
  * stream decodes identically because the decoder never depends on the
  * flush style (hand fixture U pins this).
  *
  * Encoder and decoder are exact mirrors; [[Jp2CodecSpec]] round-trips
  * random blocks through both.
  */
object Ebcot {

  /** Band orientations (indexing the ZC context tables). */
  final val LL = 0; final val HL = 1; final val LH = 2; final val HH = 3

  /** Code-block style option bits — the SPcod byte's own values. */
  final val OptBypass = 0x01
  final val OptReset = 0x02
  final val OptRestart = 0x04
  final val OptCausal = 0x08
  final val OptSegSym = 0x20

  /** Is 1-based coding pass `k` RAW under these options? Selective
    * bypass (D.7 "lazy" coding) arithmetic-codes the first 10 passes
    * (the cleanup of the top plane plus three full triplets), then
    * codes every significance-propagation and magnitude-refinement
    * pass raw; cleanup passes stay MQ-coded throughout. */
  def isRawPass(k: Int, opts: Int): Boolean =
    (opts & OptBypass) != 0 && k > 10 && ((k - 11) % 3) != 2

  /** Cumulative 1-based pass counts at which a codeword SEGMENT
    * terminates, for a block of `numbps` planes (total passes
    * 3*numbps-2) under `opts` — identical on both codec sides, so
    * Tier-2 can signal and parse one length per segment (B.10.7.4/5):
    *  - per-pass termination: every pass is a segment;
    *  - bypass: the 10-pass MQ prefix, then alternating raw (SPP+MRP)
    *    and MQ (cleanup) segments — the coder terminates at every mode
    *    switch;
    *  - otherwise one segment spanning the whole codeword. */
  def segmentEnds(numbps: Int, opts: Int): Array[Int] = {
    val total = 3 * numbps - 2
    if ((opts & OptRestart) != 0) Array.tabulate(total)(_ + 1)
    else if ((opts & OptBypass) != 0 && total > 10) {
      val ends = scala.collection.mutable.ArrayBuffer[Int](10)
      var k = 10
      while (k < total) {
        k = math.min(total, k + 2); ends += k // raw SPP+MRP
        if (k < total) { k += 1; ends += k }  // MQ cleanup
      }
      ends.toArray
    } else Array(total)
  }

  /** Does this block's codeword have more than one segment? Multi-
    * segment blocks restrict quality-layer boundaries to segment ends
    * (every one an exactly-terminated, verified truncation point). */
  def multiSeg(numbps: Int, opts: Int): Boolean =
    (opts & OptRestart) != 0 || ((opts & OptBypass) != 0 && 3 * numbps - 2 > 10)

  /** RAW (bypass) bit writer — D.7: MSB-first; after an emitted 0xFF
    * byte the next byte carries only 7 bits (its MSB is stuffed 0). */
  private final class RawEnc {
    private val bytes = scala.collection.mutable.ArrayBuffer.empty[Int]
    private var acc = 0
    private var free = 8
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1)
      free -= 1
      if (free == 0) {
        bytes += acc
        free = if (acc == 0xFF) 7 else 8
        acc = 0
      }
    }
    /** Pad the partial byte with 0s and return the segment. A pad byte
      * can never be 0xFF, but a naturally complete final 0xFF gets one
      * stuffed 0x00 after it — no codeword segment may end in 0xFF
      * (B.10.7), and the appended byte is exactly the stuffing the
      * reader would skip anyway. */
    def terminate(): Array[Byte] = {
      if (free < 8) bytes += (acc << free) & 0xFF
      if (bytes.nonEmpty && bytes.last == 0xFF) bytes += 0x00
      val r = new Array[Byte](bytes.length)
      var i = 0
      while (i < r.length) { r(i) = bytes(i).toByte; i += 1 }
      r
    }
  }

  /** RAW (bypass) bit reader over `data[from, until)` — mirror of
    * [[RawEnc]]'s stuffing; reads past the segment end as 0 bits (a
    * truncated quality decode may legitimately stop mid-plane). */
  private final class RawDec(data: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var acc = 0
    private var avail = 0
    private var lastFF = false
    def bit(): Int = {
      if (avail == 0) {
        val b = if (pos < until) data(pos) & 0xFF else 0
        pos += 1
        if (lastFF) { acc = b & 0x7F; avail = 7 } else { acc = b; avail = 8 }
        lastFF = b == 0xFF
      }
      avail -= 1
      (acc >>> avail) & 1
    }
  }

  /** One encoded code-block: the concatenated terminated segments, pass
    * and plane counts, per-pass truncation CANDIDATES (single-segment
    * blocks only — see [[encodeBlockLayered]]; null for multi-segment),
    * and the segment layout (cumulative passes / bytes per segment —
    * single-entry for one-segment blocks). */
  final case class BlockCode(data: Array[Byte], passes: Int, numbps: Int,
      truncs: Array[Int], segEndPasses: Array[Int], segEndBytes: Array[Int])

  /** Zero-coding context from neighbor significance counts h (0-2),
    * v (0-2), d (0-4) — Tables D.1: LL/LH keyed on horizontal first, HL
    * transposed, HH keyed on the diagonals. */
  private[jp2] def zcContext(h0: Int, v0: Int, d: Int, band: Int): Int = {
    val (h, v) = if (band == HL) (v0, h0) else (h0, v0)
    if (band == HH) {
      val hv = h + v
      if (d >= 3) 8
      else if (d == 2) { if (hv >= 1) 7 else 6 }
      else if (d == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
      else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else {
        if (v == 2) 4 else if (v == 1) 3
        else if (d >= 2) 2 else if (d == 1) 1 else 0
      }
    }
  }

  /** Sign-coding context and XOR bit from the clamped horizontal and
    * vertical sign contributions (Table D.3). Packed as ctx*2 + xor. */
  private[jp2] def scContext(hc: Int, vc: Int): Int = (hc: @annotation.switch) match {
    case 1 =>
      if (vc == 1) 13 * 2 else if (vc == 0) 12 * 2 else 11 * 2
    case 0 =>
      if (vc == 1) 10 * 2 else if (vc == 0) 9 * 2 else 10 * 2 + 1
    case _ =>
      if (vc == 1) 11 * 2 + 1 else if (vc == 0) 12 * 2 + 1 else 13 * 2 + 1
  }

  /** Shared per-block scan state for encode and decode. With `causal`
    * (vertically causal context formation, D.3.3) a sample in the last
    * row of its 4-row stripe treats every stripe-below neighbor — the
    * three lower significance neighbors AND the lower sign
    * contribution — as insignificant. */
  private final class State(val w: Int, val h: Int, val causal: Boolean) {
    val n = w * h
    val sigma = new Array[Boolean](n) // significant
    val visited = new Array[Boolean](n) // coded in this plane's SPP
    val refined = new Array[Boolean](n) // has had a refinement bit

    def sig(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else if (sigma(y * w + x)) 1 else 0

    /** The stripe below `cy` is hidden from context formation. */
    @inline private def hideBelow(cy: Int): Boolean = causal && (cy & 3) == 3

    def hCount(x: Int, y: Int): Int = sig(x - 1, y) + sig(x + 1, y)
    def vCount(x: Int, y: Int): Int =
      sig(x, y - 1) + (if (hideBelow(y)) 0 else sig(x, y + 1))
    def dCount(x: Int, y: Int): Int =
      sig(x - 1, y - 1) + sig(x + 1, y - 1) +
        (if (hideBelow(y)) 0 else sig(x - 1, y + 1) + sig(x + 1, y + 1))

    private def signAt(sgn: Array[Int], x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else {
        val i = y * w + x
        if (!sigma(i)) 0 else if (sgn(i) == 0) 1 else -1
      }

    /** Clamped horizontal sign contribution for sign coding. */
    def signContribH(sgn: Array[Int], x: Int, y: Int): Int =
      math.max(-1, math.min(1, signAt(sgn, x - 1, y) + signAt(sgn, x + 1, y)))

    /** Clamped vertical sign contribution (stripe-below hidden when
      * vertically causal). */
    def signContribV(sgn: Array[Int], x: Int, y: Int): Int =
      math.max(-1, math.min(1, signAt(sgn, x, y - 1) +
        (if (hideBelow(y)) 0 else signAt(sgn, x, y + 1))))
  }

  /** Encode a code-block. `coeffs` holds signed coefficients row-major.
    * Returns (codeword bytes, number of coding passes, numbps); an
    * all-zero block returns (empty, 0, 0) and is simply not included in
    * its packet. */
  def encodeBlock(w: Int, h: Int, coeffs: Array[Int], band: Int,
      opts: Int = 0): (Array[Byte], Int, Int) = {
    val (data, passes, numbps, _) = encodeBlockLayered(w, h, coeffs, band, opts)
    (data, passes, numbps)
  }

  /** [[encodeBlock]] plus per-pass truncation-length CANDIDATES for
    * quality-layer splitting: `truncs(k)` is the encoder's emitted-byte
    * count at the pass-k boundary plus a small guard for the
    * not-yet-pushed flush tail. The guard is empirical — the MQ coder's
    * pending C-register bits mean a candidate can in principle fall a
    * byte or two short of decodability — so every candidate that
    * actually becomes a layer boundary MUST be verified/adjusted through
    * [[verifiedTrunc]] before use (the Tier-2 encoder does). The final
    * entry is the exact codeword length. */
  def encodeBlockLayered(w: Int, h: Int, coeffs: Array[Int],
      band: Int, opts: Int = 0): (Array[Byte], Int, Int, Array[Int]) = {
    val c = encodeBlockCode(w, h, coeffs, band, opts)
    (c.data, c.passes, c.numbps, c.truncs)
  }

  /** Full encode: [[encodeBlockLayered]] plus the segment layout for
    * multi-segment codewords (bypass / per-pass termination). */
  def encodeBlockCode(w: Int, h: Int, coeffs: Array[Int],
      band: Int, opts: Int = 0): BlockCode = {
    val n = w * h
    val mag = new Array[Int](n)
    val sgn = new Array[Int](n)
    var maxMag = 0
    var i = 0
    while (i < n) {
      val v = coeffs(i)
      val m = math.abs(v)
      mag(i) = m
      sgn(i) = if (v < 0) 1 else 0
      if (m > maxMag) maxMag = m
      i += 1
    }
    if (maxMag == 0) return BlockCode(Array.emptyByteArray, 0, 0,
      Array.emptyIntArray, Array.emptyIntArray, Array.emptyIntArray)
    val numbps = 32 - Integer.numberOfLeadingZeros(maxMag)
    val st = new State(w, h, (opts & OptCausal) != 0)
    val mq = new MQEncoder()

    /** Sign coding: contexted through the MQ coder, or (raw passes,
      * D.7) the bare sign bit with no context or XOR. */
    def codeSign(x: Int, y: Int, raw: RawEnc): Unit = {
      if (raw != null) raw.bit(sgn(y * w + x))
      else {
        val hc = st.signContribH(sgn, x, y)
        val vc = st.signContribV(sgn, x, y)
        val packed = scContext(hc, vc)
        mq.encode(sgn(y * w + x) ^ (packed & 1), packed >> 1)
      }
    }

    def spp(p: Int, raw: RawEnc): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val i = y * w + x
            if (!st.sigma(i)) {
              val hn = st.hCount(x, y); val vn = st.vCount(x, y); val dn = st.dCount(x, y)
              if (hn + vn + dn > 0) {
                val bit = (mag(i) >>> p) & 1
                if (raw != null) raw.bit(bit)
                else mq.encode(bit, zcContext(hn, vn, dn, band))
                if (bit == 1) { st.sigma(i) = true; codeSign(x, y, raw) }
                st.visited(i) = true
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def mrp(p: Int, raw: RawEnc): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val i = y * w + x
            if (st.sigma(i) && !st.visited(i)) {
              if (raw != null) raw.bit((mag(i) >>> p) & 1)
              else {
                val ctx =
                  if (st.refined(i)) 16
                  else if (st.hCount(x, y) + st.vCount(x, y) + st.dCount(x, y) > 0) 15
                  else 14
                mq.encode((mag(i) >>> p) & 1, ctx)
              }
              st.refined(i) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val stripeH = math.min(4, h - y0)
          var y = y0
          // run-length mode: a full 4-sample column, nothing significant,
          // nothing visited, all four contexts zero
          var rl = stripeH == 4
          if (rl) {
            var k = 0
            while (rl && k < 4) {
              val i = (y0 + k) * w + x
              if (st.sigma(i) || st.visited(i) ||
                st.hCount(x, y0 + k) + st.vCount(x, y0 + k) + st.dCount(x, y0 + k) > 0) rl = false
              k += 1
            }
          }
          if (rl) {
            var k = -1
            var j = 0
            while (k < 0 && j < 4) {
              if (((mag((y0 + j) * w + x) >>> p) & 1) == 1) k = j
              j += 1
            }
            if (k < 0) {
              mq.encode(0, MQ.CtxRl)
              y = y0 + stripeH // whole column stays insignificant
            } else {
              mq.encode(1, MQ.CtxRl)
              mq.encode((k >> 1) & 1, MQ.CtxUni)
              mq.encode(k & 1, MQ.CtxUni)
              val i = (y0 + k) * w + x
              st.sigma(i) = true
              codeSign(x, y0 + k, null)
              y = y0 + k + 1
            }
          }
          while (y < y0 + stripeH) {
            val i = y * w + x
            if (!st.sigma(i) && !st.visited(i)) {
              val hn = st.hCount(x, y); val vn = st.vCount(x, y); val dn = st.dCount(x, y)
              val bit = (mag(i) >>> p) & 1
              mq.encode(bit, zcContext(hn, vn, dn, band))
              if (bit == 1) { st.sigma(i) = true; codeSign(x, y, null) }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      // D.4.2: the segmentation symbol 1010 closes every cleanup pass
      if ((opts & OptSegSym) != 0) {
        mq.encode(1, MQ.CtxUni); mq.encode(0, MQ.CtxUni)
        mq.encode(1, MQ.CtxUni); mq.encode(0, MQ.CtxUni)
      }
      java.util.Arrays.fill(st.visited, false)
    }

    // segment-aware pass sequence: one MQ coder lives across the whole
    // block (terminate() restarts only its arithmetic, D.4.1); a RawEnc
    // exists only inside a raw segment. RESET (D.2) re-initializes the
    // adaptive contexts at every coding-pass boundary.
    val total = 3 * numbps - 2
    val ends = segmentEnds(numbps, opts)
    val single = ends.length == 1
    val out = new java.io.ByteArrayOutputStream()
    val segEndBytes = new Array[Int](ends.length)
    val passEnds = if (single) new Array[Int](total) else null
    var rawSink: RawEnc = null
    var endIdx = 0
    var k = 0 // 1-based after the increment below

    def runPass(body: RawEnc => Unit): Unit = {
      k += 1
      val isRaw = isRawPass(k, opts)
      if (isRaw && rawSink == null) rawSink = new RawEnc
      body(if (isRaw) rawSink else null)
      if ((opts & OptReset) != 0) mq.resetContexts()
      if (single) passEnds(k - 1) = mq.emitted
      else if (k == ends(endIdx)) {
        val seg = if (isRaw) { val s = rawSink.terminate(); rawSink = null; s }
                  else mq.terminate()
        out.write(seg, 0, seg.length)
        segEndBytes(endIdx) = out.size
        endIdx += 1
      }
    }

    var p = numbps - 1
    runPass(_ => cup(p))
    p -= 1
    while (p >= 0) {
      val pp = p
      runPass(r => spp(pp, r))
      runPass(r => mrp(pp, r))
      runPass(_ => cup(pp))
      p -= 1
    }

    if (single) {
      val data = mq.flush()
      // conservative guard: the flush tail is at most a handful of bytes
      val truncs = passEnds.map(e => math.min(data.length, e + 4))
      truncs(truncs.length - 1) = data.length
      BlockCode(data, total, numbps, truncs, Array(total), Array(data.length))
    } else BlockCode(out.toByteArray, total, numbps, null, ends, segEndBytes)
  }

  /** The smallest VERIFIED truncation length >= `startLen` for decoding
    * exactly `passes` coding passes from a prefix of `data`: proven at
    * encode time by actually decoding the candidate prefix and comparing
    * against the full-codeword decode of the same pass count — the
    * rate-control discipline is "verify, don't bound", so a quality-
    * truncated decode can never silently diverge no matter how the MQ
    * coder's pending C-register bits fall. Also refuses a length whose
    * last byte is 0xFF (B.10.7: a codeword segment may not end in 0xFF —
    * and the decoder's past-the-end convention would re-interpret it).
    * Terminates: at `data.length` the prefix IS the codeword (and
    * [[MQEncoder.flush]] never emits a trailing 0xFF). O(block) decodes
    * per probe, paid once per layer boundary at encode time only. */
  def verifiedTrunc(w: Int, h: Int, data: Array[Byte], passes: Int, numbps: Int,
      band: Int, startLen: Int, opts: Int = 0): Int = {
    // precondition, not just convention: passes > 0 implies a nonempty
    // codeword, and the max(1, …) clamp below would otherwise return an
    // out-of-range length 1 for empty data — fail here instead
    require(data.nonEmpty && passes > 0,
      s"verifiedTrunc needs a nonempty codeword with passes > 0 (got ${data.length} B, $passes passes)")
    val want = decodeBlock(w, h, data, passes, numbps, band, opts)
    // a too-short prefix may not merely mis-decode but fail a typed
    // contract (segmentation-symbol mismatch) — both mean "not this len"
    def prefixOk(len: Int): Boolean =
      try java.util.Arrays.equals(
        decodeBlock(w, h, java.util.Arrays.copyOf(data, len), passes, numbps, band, opts),
        want)
      catch { case _: IllegalArgumentException => false }
    var len = math.max(1, math.min(startLen, data.length))
    while (len < data.length && ((data(len - 1) & 0xFF) == 0xFF || !prefixOk(len)))
      len += 1
    len
  }

  /** Decode a code-block codeword back to signed coefficients. Mirrors
    * [[encodeBlock]] pass for pass. */
  def decodeBlock(w: Int, h: Int, data: Array[Byte], numPasses: Int, numbps: Int,
      band: Int, opts: Int = 0): Array[Int] =
    decodeBlockDepth(w, h, data, numPasses, numbps, band, null, opts)

  /** [[decodeBlock]] that also reports each coefficient's LOWEST decoded
    * bit-plane into `depth` (when non-null, length w*h): a coefficient
    * whose last significance/refinement bit landed at plane p has its
    * magnitude known only down to 2^p, so a quality-truncated
    * dequantizer must reconstruct at the mid-point of the EFFECTIVE step
    * delta·2^p, not the finest step — reconstructing every coefficient
    * at (|q|+0.5)·delta biases truncated decodes low (the r16 ADVICE
    * item). Full decodes drive every coefficient to plane 0, so depth is
    * all zeros there and the mid-point rule degenerates to the familiar
    * (|q|+0.5)·delta. Never-significant coefficients keep depth = numbps
    * (value 0 reconstructs to 0 regardless — deadzone convention). */
  def decodeBlockDepth(w: Int, h: Int, data: Array[Byte], numPasses: Int, numbps: Int,
      band: Int, depth: Array[Int], opts: Int = 0): Array[Int] = {
    require(!multiSeg(numbps, opts),
      "multi-segment codeword (bypass/per-pass termination): use decodeBlockSegDepth with the segment layout")
    decodeBlockSegDepth(w, h, data, Array(data.length), numPasses, numbps, band, depth, opts)
  }

  /** [[decodeBlockDepth]] for a (possibly) multi-segment codeword:
    * `data` is the concatenation of the terminated segments present and
    * `segEndBytes` their cumulative end offsets within it (a truncated
    * quality decode passes only the kept segments). MQ segments share
    * adaptive contexts across segment boundaries (only the arithmetic
    * restarts — the mirror of [[MQEncoder.terminate]]); raw segments
    * are read with the D.7 stuffing rules. */
  def decodeBlockSegDepth(w: Int, h: Int, data: Array[Byte], segEndBytes: Array[Int],
      numPasses: Int, numbps: Int, band: Int, depth: Array[Int], opts: Int = 0): Array[Int] = {
    val n = w * h
    val mag = new Array[Int](n)
    val sgn = new Array[Int](n)
    if (depth != null) java.util.Arrays.fill(depth, numbps)
    if (numPasses == 0 || numbps == 0) return new Array[Int](n)
    val st = new State(w, h, (opts & OptCausal) != 0)

    // one reader at a time: an MQDecoder or a RawDec over the current
    // segment's slice, opened lazily at the first bit of the segment
    val ends = segmentEnds(numbps, opts)
    var segIdx = 0
    var segStart = 0
    var mq: MQDecoder = null
    var raw: RawDec = null
    val ctxS = new Array[Int](MQ.NumContexts)
    val ctxM = new Array[Int](MQ.NumContexts)
    MQ.initStates(ctxS, ctxM)
    def segEnd: Int =
      if (segIdx < segEndBytes.length) math.min(segEndBytes(segIdx), data.length)
      else data.length
    def mqd(): MQDecoder = {
      if (mq == null) {
        mq = new MQDecoder(java.util.Arrays.copyOfRange(data, math.min(segStart, data.length),
          math.max(segEnd, math.min(segStart, data.length))))
        mq.importContexts(ctxS, ctxM)
      }
      mq
    }
    def rawBit(): Int = {
      if (raw == null) raw = new RawDec(data, math.min(segStart, data.length), segEnd)
      raw.bit()
    }

    def decodeSign(x: Int, y: Int, isRaw: Boolean): Unit = {
      if (isRaw) sgn(y * w + x) = rawBit()
      else {
        val hc = st.signContribH(sgn, x, y)
        val vc = st.signContribV(sgn, x, y)
        val packed = scContext(hc, vc)
        sgn(y * w + x) = mqd().decode(packed >> 1) ^ (packed & 1)
      }
    }

    def spp(p: Int, isRaw: Boolean): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val i = y * w + x
            if (!st.sigma(i)) {
              val hn = st.hCount(x, y); val vn = st.vCount(x, y); val dn = st.dCount(x, y)
              if (hn + vn + dn > 0) {
                val bit = if (isRaw) rawBit() else mqd().decode(zcContext(hn, vn, dn, band))
                if (bit == 1) {
                  st.sigma(i) = true
                  mag(i) |= 1 << p
                  if (depth != null) depth(i) = p
                  decodeSign(x, y, isRaw)
                }
                st.visited(i) = true
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def mrp(p: Int, isRaw: Boolean): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val i = y * w + x
            if (st.sigma(i) && !st.visited(i)) {
              val bit =
                if (isRaw) rawBit()
                else {
                  val ctx =
                    if (st.refined(i)) 16
                    else if (st.hCount(x, y) + st.vCount(x, y) + st.dCount(x, y) > 0) 15
                    else 14
                  mqd().decode(ctx)
                }
              if (bit == 1) mag(i) |= 1 << p
              if (depth != null) depth(i) = p
              st.refined(i) = true
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val stripeH = math.min(4, h - y0)
          var y = y0
          var rl = stripeH == 4
          if (rl) {
            var k = 0
            while (rl && k < 4) {
              val i = (y0 + k) * w + x
              if (st.sigma(i) || st.visited(i) ||
                st.hCount(x, y0 + k) + st.vCount(x, y0 + k) + st.dCount(x, y0 + k) > 0) rl = false
              k += 1
            }
          }
          if (rl) {
            if (mqd().decode(MQ.CtxRl) == 0) {
              y = y0 + stripeH
            } else {
              val k = (mqd().decode(MQ.CtxUni) << 1) | mqd().decode(MQ.CtxUni)
              val i = (y0 + k) * w + x
              st.sigma(i) = true
              mag(i) |= 1 << p
              if (depth != null) depth(i) = p
              decodeSign(x, y0 + k, isRaw = false)
              y = y0 + k + 1
            }
          }
          while (y < y0 + stripeH) {
            val i = y * w + x
            if (!st.sigma(i) && !st.visited(i)) {
              val hn = st.hCount(x, y); val vn = st.vCount(x, y); val dn = st.dCount(x, y)
              if (mqd().decode(zcContext(hn, vn, dn, band)) == 1) {
                st.sigma(i) = true
                mag(i) |= 1 << p
                if (depth != null) depth(i) = p
                decodeSign(x, y, isRaw = false)
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      // D.4.2: verify the segmentation symbol — four UNIFORM-context
      // bits that must read 1010; anything else means the codeword is
      // corrupt (the error-resilience point of the option)
      if ((opts & OptSegSym) != 0) {
        val sym = (mqd().decode(MQ.CtxUni) << 3) | (mqd().decode(MQ.CtxUni) << 2) |
          (mqd().decode(MQ.CtxUni) << 1) | mqd().decode(MQ.CtxUni)
        require(sym == 0xA,
          f"segmentation symbol mismatch at plane $p%d: read $sym%X, want A — corrupt codeword")
      }
      java.util.Arrays.fill(st.visited, false)
    }

    // pass sequence with segment bookkeeping: close the reader (saving
    // MQ contexts) when the 1-based pass count hits a segment end;
    // RESET re-initializes contexts everywhere it could carry from
    var k = 0
    def endPass(): Unit = {
      if ((opts & OptReset) != 0) {
        if (mq != null) mq.resetContexts()
        MQ.initStates(ctxS, ctxM)
      }
      if (segIdx < ends.length && k == ends(segIdx)) {
        if (mq != null) { mq.exportContexts(ctxS, ctxM); mq = null }
        raw = null
        segStart = segEnd
        segIdx += 1
      }
    }

    var p = numbps - 1
    var passes = numPasses
    k += 1; cup(p); endPass()
    passes -= 1
    p -= 1
    while (p >= 0 && passes > 0) {
      k += 1; spp(p, isRawPass(k, opts)); endPass(); passes -= 1
      if (passes > 0) { k += 1; mrp(p, isRawPass(k, opts)); endPass(); passes -= 1 }
      if (passes > 0) { k += 1; cup(p); endPass(); passes -= 1 }
      p -= 1
    }
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = if (sgn(i) == 1) -mag(i) else mag(i)
      i += 1
    }
    out
  }
}
