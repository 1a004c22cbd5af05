package graft.sources.jp2

/** Irreversible 9/7 lifting DWT + ICT — ISO/IEC 15444-1 Annex F (the
  * lossy CDF 9/7 filter, Table F.4 lifting constants) and Annex G.1
  * (the irreversible YCbCr color transform). This is the transform pair
  * of real lossy archival masters — the dominant profile national-
  * library digitization pipelines emit (visually-lossless JP2) — and
  * the r16 widening axis of [[Jp2Codec]]'s ingest contract.
  *
  * Double-precision lifting with whole-sample symmetric extension, four
  * lifting steps then the K-scaling. Normalization convention (shared
  * by encoder and decoder, and the basis of the quantizer's Rb
  * convention in [[Jp2Codec]]): lows scaled by 1/K (DC gain 1), highs
  * by K (Nyquist gain 2) — the same per-level gains as the reversible
  * 5/3, so one band-gain table serves both transforms.
  *
  * 9/7 is NOT bit-exact by design; [[Jp2CodecSpec]] pins forward∘inverse
  * to ~1e-9 numerical identity and the full lossy codec to
  * max-error/PSNR tolerance bounds instead of bit equality.
  */
object Dwt97 {

  // Table F.4 lifting constants
  private final val Alpha = -1.586134342059924
  private final val Beta = -0.052980118572961
  private final val Gamma = 0.882911075530934
  private final val Delta = 0.443506852043971
  private final val K = 1.230174104914001

  /** Whole-sample symmetric index reflection into [0, n). */
  private def ext(i: Int, n: Int): Int = {
    if (n == 1) 0
    else {
      val p = 2 * (n - 1)
      val m = ((i % p) + p) % p
      if (m >= n) p - m else m
    }
  }

  /** One lifting step: samples of parity `par` gain c*(left + right). */
  private def lift(a: Array[Double], off: Int, stride: Int, n: Int,
      par: Int, c: Double): Unit = {
    var j = par
    while (j < n) {
      a(off + j * stride) +=
        c * (a(off + ext(j - 1, n) * stride) + a(off + ext(j + 1, n) * stride))
      j += 2
    }
  }

  /** Forward 1-D 9/7 on a strided view; deinterleaves (lows first). */
  private def fwd1d(a: Array[Double], off: Int, stride: Int, n: Int,
      scratch: Array[Double]): Unit = {
    if (n <= 1) return
    lift(a, off, stride, n, 1, Alpha)
    lift(a, off, stride, n, 0, Beta)
    lift(a, off, stride, n, 1, Gamma)
    lift(a, off, stride, n, 0, Delta)
    var j = 0
    while (j < n) {
      a(off + j * stride) *= (if ((j & 1) == 0) 1.0 / K else K)
      j += 1
    }
    val nLow = (n + 1) / 2
    var i = 0
    while (i < n) {
      scratch(if ((i & 1) == 0) i / 2 else nLow + i / 2) = a(off + i * stride)
      i += 1
    }
    i = 0
    while (i < n) { a(off + i * stride) = scratch(i); i += 1 }
  }

  /** Inverse of [[fwd1d]] — exact mirror. */
  private def inv1d(a: Array[Double], off: Int, stride: Int, n: Int,
      scratch: Array[Double]): Unit = {
    if (n <= 1) return
    val nLow = (n + 1) / 2
    var i = 0
    while (i < n) {
      scratch(i) = a(off + (if ((i & 1) == 0) i / 2 else nLow + i / 2) * stride)
      i += 1
    }
    i = 0
    while (i < n) { a(off + i * stride) = scratch(i); i += 1 }
    var j = 0
    while (j < n) {
      a(off + j * stride) *= (if ((j & 1) == 0) K else 1.0 / K)
      j += 1
    }
    lift(a, off, stride, n, 0, -Delta)
    lift(a, off, stride, n, 1, -Gamma)
    lift(a, off, stride, n, 0, -Beta)
    lift(a, off, stride, n, 1, -Alpha)
  }

  /** Forward multi-level 2-D transform in place (Mallat layout, same
    * geometry as [[Dwt53.forward]]). */
  def forward(a: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Double](math.max(w, h))
    var l = 0
    var cw = w
    var ch = h
    while (l < levels) {
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
  def inverse(a: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Double](math.max(w, h))
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

  /** Irreversible color transform (ICT, Annex G.1) in place: RGB →
    * Y/Cb/Cr on DC-shifted samples. Cb/Cr are computed in their exact
    * chroma-difference form Cb = (B−Y)/1.772, Cr = (R−Y)/1.402 (the
    * published matrix entries are 6-digit roundings of exactly these),
    * so [[ictInverse]] is the machine-precision algebraic inverse. */
  def ictForward(c0: Array[Double], c1: Array[Double], c2: Array[Double]): Unit = {
    var i = 0
    val n = c0.length
    while (i < n) {
      val r = c0(i); val g = c1(i); val b = c2(i)
      val y = 0.299 * r + 0.587 * g + 0.114 * b
      c0(i) = y
      c1(i) = (b - y) / (2.0 - 2.0 * 0.114)
      c2(i) = (r - y) / (2.0 - 2.0 * 0.299)
      i += 1
    }
  }

  /** Inverse ICT — the EXACT algebraic inverse of [[ictForward]]'s
    * matrix (G solved from the Y row), not the textbook 5-digit
    * roundings, so forward∘inverse is machine-precision identity. */
  def ictInverse(c0: Array[Double], c1: Array[Double], c2: Array[Double]): Unit = {
    var i = 0
    val n = c0.length
    while (i < n) {
      val y = c0(i); val cb = c1(i); val cr = c2(i)
      val r = y + (2.0 - 2.0 * 0.299) * cr
      val b = y + (2.0 - 2.0 * 0.114) * cb
      c0(i) = r
      c1(i) = (y - 0.299 * r - 0.114 * b) / 0.587
      c2(i) = b
      i += 1
    }
  }
}
