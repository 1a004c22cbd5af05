package graft.sources.jp2

/** Reversible 5/3 lifting DWT — ISO/IEC 15444-1 Annex F (the lossless
  * filter). Integer lifting with whole-sample symmetric extension:
  *
  *   high: y(2n+1) = x(2n+1) − ⌊(x(2n) + x(2n+2)) / 2⌋
  *   low:  y(2n)   = x(2n)   + ⌊(y(2n−1) + y(2n+1) + 2) / 4⌋
  *
  * applied per row then per column on the running LL (Mallat layout,
  * origin 0: low half keeps the even samples, so LL at level l spans
  * ⌈w/2ˡ⌉ × ⌈h/2ˡ⌉). The inverse mirrors the order exactly, giving
  * bit-exact reconstruction (property-tested in Jp2CodecSpec). */
object Dwt53 {

  /** Whole-sample symmetric index reflection into [0, n). */
  private def ext(i: Int, n: Int): Int = {
    if (n == 1) 0
    else {
      val p = 2 * (n - 1)
      val m = ((i % p) + p) % p
      if (m >= n) p - m else m
    }
  }

  /** Forward 1-D lifting on a strided view; deinterleaves into
    * scratch (lows first), then copies back. */
  private def fwd1d(a: Array[Int], off: Int, stride: Int, n: Int, scratch: Array[Int]): Unit = {
    if (n <= 1) return
    @inline def get(i: Int): Int = a(off + ext(i, n) * stride)
    @inline def set(i: Int, v: Int): Unit = a(off + i * stride) = v
    // predict (odd samples read original evens)
    var j = 1
    while (j < n) {
      set(j, get(j) - ((get(j - 1) + get(j + 1)) >> 1))
      j += 2
    }
    // update (even samples read lifted odds)
    j = 0
    while (j < n) {
      set(j, get(j) + ((get(j - 1) + get(j + 1) + 2) >> 2))
      j += 2
    }
    // deinterleave: evens -> low half, odds -> high half
    val nLow = (n + 1) / 2
    var i = 0
    while (i < n) {
      scratch(if ((i & 1) == 0) i / 2 else nLow + i / 2) = a(off + i * stride)
      i += 1
    }
    i = 0
    while (i < n) { a(off + i * stride) = scratch(i); i += 1 }
  }

  /** Inverse of [[fwd1d]]. */
  private def inv1d(a: Array[Int], off: Int, stride: Int, n: Int, scratch: Array[Int]): Unit = {
    if (n <= 1) return
    // interleave: low half -> evens, high half -> odds
    val nLow = (n + 1) / 2
    var i = 0
    while (i < n) {
      scratch(i) = a(off + (if ((i & 1) == 0) i / 2 else nLow + i / 2) * stride)
      i += 1
    }
    i = 0
    while (i < n) { a(off + i * stride) = scratch(i); i += 1 }
    @inline def get(j: Int): Int = a(off + ext(j, n) * stride)
    @inline def set(j: Int, v: Int): Unit = a(off + j * stride) = v
    // un-update then un-predict (mirror of fwd order)
    var j = 0
    while (j < n) {
      set(j, get(j) - ((get(j - 1) + get(j + 1) + 2) >> 2))
      j += 2
    }
    j = 1
    while (j < n) {
      set(j, get(j) + ((get(j - 1) + get(j + 1)) >> 1))
      j += 2
    }
  }

  /** Forward multi-level 2-D transform in place on a full-width `w`×`h`
    * row-major array (Mallat layout). */
  def forward(a: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Int](math.max(w, h))
    var l = 0
    var cw = w
    var ch = h
    while (l < levels) {
      // rows then columns; inverse mirrors with columns then rows
      var y = 0
      while (y < ch) { fwd1d(a, y * w, 1, cw, scratch); y += 1 }
      var x = 0
      while (x < cw) { fwd1d(a, x, w, ch, scratch); x += 1 }
      cw = (cw + 1) / 2
      ch = (ch + 1) / 2
      l += 1
    }
  }

  /** Inverse multi-level 2-D transform in place. */
  def inverse(a: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Int](math.max(w, h))
    var l = levels - 1
    while (l >= 0) {
      val cw = (w + (1 << l) - 1) >> l
      val ch = (h + (1 << l) - 1) >> l
      var x = 0
      while (x < cw) { inv1d(a, x, w, ch, scratch); x += 1 }
      var y = 0
      while (y < ch) { inv1d(a, y * w, 1, cw, scratch); y += 1 }
      l -= 1
    }
  }

  /** Reversible color transform (RCT, Annex G.2) in place over three
    * equal-length component planes. */
  def rctForward(c0: Array[Int], c1: Array[Int], c2: Array[Int]): Unit = {
    var i = 0
    val n = c0.length
    while (i < n) {
      val r = c0(i); val g = c1(i); val b = c2(i)
      c0(i) = (r + 2 * g + b) >> 2
      c1(i) = b - g
      c2(i) = r - g
      i += 1
    }
  }

  /** Inverse RCT. */
  def rctInverse(c0: Array[Int], c1: Array[Int], c2: Array[Int]): Unit = {
    var i = 0
    val n = c0.length
    while (i < n) {
      val y = c0(i); val cb = c1(i); val cr = c2(i)
      val g = y - ((cb + cr) >> 2)
      c0(i) = cr + g
      c1(i) = g
      c2(i) = cb + g
      i += 1
    }
  }
}
