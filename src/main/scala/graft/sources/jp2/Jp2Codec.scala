package graft.sources.jp2

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala JPEG 2000 Part-1 codec (lossless path) — ISO/IEC 15444-1.
  *
  * Closes the one gap the engine carried since round 8: the reference
  * pipeline routes `.jp2` newspaper scans it never decodes
  * (/root/reference/src/01-scrape-images.py:340), and no JPEG 2000
  * codec ships with the JDK or this sandbox — so the entropy-coded
  * payload was a documented stub. This codec implements the actual
  * spec algorithms end to end:
  *
  *   - reversible 5/3 DWT + RCT ([[Dwt53]], Annex F/G),
  *   - EBCOT Tier-1 block coding over the MQ coder ([[Ebcot]], [[MQ]],
  *     Annexes C/D),
  *   - Tier-2 packet headers with tag trees and bit stuffing
  *     ([[TagTree]], [[Bio]], Annex B),
  *   - the codestream marker syntax (SOC/SIZ/COD/QCD/SOT/SOD/EOC,
  *     Annex A), wrapped by the existing [[graft.sources.Jp2Box]]
  *     container when a `.jp2` file (not a raw codestream) is wanted.
  *
  * Profile written by the encoder (all within the spec; the decoder
  * checks and rejects what it does not implement rather than guessing):
  * tile grid at origin 0 (tiles in raster order, each split across
  * 1..levels+1 tile-parts cut at resolution boundaries — see
  * [[encode]]; tile dims must be multiples of 2^levels), 1..65535
  * quality layers (LRCP when single-layer, RLCP when multi-layer so the
  * low-resolution packets stay a contiguous prefix — see [[encode]]),
  * one precinct per resolution (default 2^15 precincts), code-block
  * style 0 (no bypass/reset/termination options), the reversible 5/3 +
  * RCT transform pair OR the irreversible 9/7 + ICT pair with scalar
  * quantization (any spec-legal style 0/1/2 QCD shape on decode since
  * r17 — see [[Dwt97]] and [[Quant]]; the encoder writes the uniform,
  * norm-derived, or derived shape per `quantMode`),
  * 1 or 3 components at 8 bpp. Reversible: decode(encode(img)) is
  * bit-exact (property-tested); irreversible: bounded max-error/PSNR
  * (property-tested — 9/7 is lossy by design). The sandbox's
  * conformance limit is documented in COVERAGE.md —
  * no third-party codec exists here to cross-check the bitstream, so
  * the tests pin round-trip, marker structure, and every layer's own
  * spec invariants instead.
  *
  * Tiling is the scale lever: each tile is DC-shifted/RCT'd/DWT'd and
  * entropy-coded INDEPENDENTLY, so encode and decode working state is
  * one tile's samples — a 100k x 100k scan streams through in
  * tile-sized memory instead of materializing the full plane.
  */
object Jp2Codec {

  final case class Image(width: Int, height: Int, comps: Array[Array[Int]])

  /** One subband's placement inside the Mallat-layout array. */
  private final case class Band(orient: Int, x0: Int, y0: Int, w: Int, h: Int) {
    def gain: Int = orient match {
      case Ebcot.LL => 0
      case Ebcot.HH => 2
      case _ => 1
    }
  }

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  /** Bands of resolution r (0 = LL only; r>=1 = HL/LH/HH of level
    * nl-r+1), with Mallat-array offsets. Zero-area bands are kept (the
    * packet walk needs the slot) but carry no code-blocks. */
  private def bandsAt(w: Int, h: Int, nl: Int, r: Int): Seq[Band] = {
    def wl(l: Int) = ceilDiv(w, 1 << l)
    def hl(l: Int) = ceilDiv(h, 1 << l)
    if (r == 0) Seq(Band(Ebcot.LL, 0, 0, wl(nl), hl(nl)))
    else {
      val l = nl - r + 1
      val wp = wl(l - 1); val hp = hl(l - 1)
      val lw = ceilDiv(wp, 2); val lh = ceilDiv(hp, 2)
      val hw = wp - lw; val hh = hp - lh
      Seq(
        Band(Ebcot.HL, lw, 0, hw, lh),
        Band(Ebcot.LH, 0, lh, lw, hh),
        Band(Ebcot.HH, lw, lh, hw, hh))
    }
  }

  private val GuardBits = 2
  // generous reversible exponent: Mb = eps + guard - 1 must cover the
  // worst 5/3 coefficient growth of (prec+1)-bit RCT chroma over <=5
  // levels — a factor 2^4 of headroom over the sample range, i.e.
  // prec + 5 (13 for the 8-bit profile, byte-stable with pre-r18c)
  private def baseExp(prec: Int): Int = prec + 5

  /** DEFAULT component bit depth (SIZ Ssiz = 7, 8-bit unsigned) — the
    * dominant archival profile; since r18c any 8..16-bit unsigned
    * depth is admitted and `prec` is threaded through the quantizer
    * arithmetic. E.1.1 defines the nominal dynamic range of subband b
    * as Rb = prec + gain_b, and the quantizer step as
    * Delta_b = 2^(Rb - eps_b) * (1 + mu_b / 2^11) — the formula every
    * conformant decoder applies, so the QCD this encoder writes must be
    * read back at the SAME amplitude by OpenJPEG/Kakadu. (Until r17 the
    * encoder signaled eps against a 9-bit "headroom" range, which a
    * spec decoder would have reconstructed at double amplitude.) */
  private val Prec = 8

  /** Guard bits the IRREVERSIBLE path signals: with the spec's
    * Rb = Prec + gain, Mb = eps + G - 1 needs G = 3 to keep the two
    * headroom bit-planes that cover the 9/7 lifting overshoot above the
    * nominal range (the reversible path keeps G = 2 over its generous
    * BaseExp). Mb values are unchanged from the pre-r17 convention —
    * only the signaled (eps, guard) split moved to the spec's. */
  private val LossyGuardBits = 3

  /** QCD band index: 0 = LL, then 3 per resolution in HL,LH,HH order
    * (the A.6.4 / E.1 signalling sequence). `ord` is the band's
    * position within resolution r's [[bandsAt]] list. */
  private def bandIndex(r: Int, ord: Int): Int = if (r == 0) 0 else 3 * (r - 1) + 1 + ord

  /** Scalar quantization parsed from QCD (Annex E), generalized in r17
    * from the former uniform-step-only shape to ANY spec-legal scalar
    * QCD: per-band (eps_b, mu_b) — style 2 signals them expounded,
    * style 1 signals (eps_0, mu_0) and derives eps_b = eps_0 - (r - 1)
    * with mu_b = mu_0 (E-5, bands grouped by resolution), style 0 (the
    * reversible path) signals exponents that only feed Mb. Indexed by
    * [[bandIndex]]. Vectors (not arrays) so Header stays structurally
    * comparable. */
  final case class Quant(guard: Int, eps: IndexedSeq[Int], mu: IndexedSeq[Int]) {
    /** Magnitude bit-planes of band b: Mb = eps_b + G - 1 (E-2). */
    def mb(bandIdx: Int): Int = eps(bandIdx) + guard - 1
    /** Step in sample units: Delta_b = 2^(prec + gain - eps_b) *
      * (1 + mu_b / 2^11) (E-3 with Rb = prec + gain). */
    def delta(bandIdx: Int, gain: Int, prec: Int = Prec): Double =
      math.pow(2.0, (prec + gain - eps(bandIdx)).toDouble) * (1.0 + mu(bandIdx) / 2048.0)
  }

  object Quant {
    /** The profile this encoder writes by default: reversible bands at
      * eps = BaseExp + gain (Mb = BaseExp + gain + 1, Delta unused);
      * irreversible at eps = Prec + gain + qShift, mu = 0 — a uniform
      * step 2^(-qShift) in sample units for every band. */
    def uniform(levels: Int, irreversible: Boolean, qShift: Int,
        prec: Int = Prec): Quant = {
      val n = 3 * levels + 1
      val gains = Vector.tabulate(n)(gainOf)
      if (irreversible)
        Quant(LossyGuardBits, gains.map(g => prec + g + qShift), Vector.fill(n)(0))
      else
        Quant(GuardBits, gains.map(g => baseExp(prec) + g), Vector.fill(n)(0))
    }
    /** Table E-1 gain of QCD band index i: LL 0; HL/LH 1; HH 2. */
    def gainOf(i: Int): Int = if (i == 0) 0 else ((i - 1) % 3) match {
      case 0 | 1 => 1
      case _ => 2
    }
    /** E-5 derived expansion: eps_b = eps_0 - (r - 1), mu_b = mu_0 for
      * every band of resolution r >= 1 (LL keeps eps_0 exactly). */
    def derived(levels: Int, guard: Int, eps0: Int, mu0: Int): Quant = {
      val eps = Vector.tabulate(3 * levels + 1) { i =>
        if (i == 0) eps0 else eps0 - ((i - 1) / 3)
      }
      Quant(guard, eps, Vector.fill(3 * levels + 1)(mu0))
    }
  }

  /** Mantissa the "derived" quantMode signals: step x1.5 over the pure
    * power of two, so style-1 streams exercise the mu arithmetic. */
  private val DerivedMu0 = 1024

  /** Invert E-3: the (eps, mu) pair whose step best approximates
    * `delta` (sample units) for a band of the given gain — eps is the
    * unique exponent with 2^(Prec+gain-eps) <= delta < 2^(..+1), mu the
    * rounded 11-bit mantissa (rounding up to 2048 carries into eps). */
  private def stepToEpsMu(delta: Double, gain: Int, prec: Int = Prec): (Int, Int) = {
    require(delta > 0.0, s"non-positive step $delta")
    var e = math.floor(math.log(delta) / math.log(2.0)).toInt
    // guard against log rounding at exact powers of two
    if (math.pow(2.0, (e + 1).toDouble) <= delta) e += 1
    if (math.pow(2.0, e.toDouble) > delta) e -= 1
    var mu = math.round((delta / math.pow(2.0, e.toDouble) - 1.0) * 2048.0).toInt
    if (mu == 2048) { mu = 0; e += 1 }
    val eps = prec + gain - e
    require(eps >= 1 && eps <= 31, s"quantizer exponent $eps out of QCD range for step $delta")
    (eps, mu)
  }

  /** L2 norm of the SYNTHESIS basis function of band (r, ord) under
    * [[Dwt97.inverse]] at `levels` decompositions — measured numerically
    * (unit impulse at the band's center, inverse transform, L2) rather
    * than tabulated, so it is exact for THIS implementation's filter
    * normalization. quantMode = "norms" sets delta_b ~ 1/norm_b, making
    * every band's quantization error contribute equally to pixel-domain
    * MSE — the per-band QCD shape real archival encoders produce. */
  private val synthNormCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), java.lang.Double]()
  private def synthNorm(levels: Int, r: Int, ord: Int): Double = {
    val key = (levels, r, ord)
    val hit = synthNormCache.get(key)
    if (hit != null) return hit.doubleValue()
    val s = math.max(64, 1 << (levels + 4))
    val a = new Array[Double](s * s)
    val b = bandsAt(s, s, levels, r)(ord)
    a((b.y0 + b.h / 2) * s + (b.x0 + b.w / 2)) = 1.0
    Dwt97.inverse(a, s, s, levels)
    var sum = 0.0
    var i = 0
    while (i < a.length) { sum += a(i) * a(i); i += 1 }
    val n = math.sqrt(sum)
    synthNormCache.put(key, n)
    n
  }

  private final val CodeBlockExp = 6 // 64x64 code-blocks

  /** Sentinel for [[encode]]'s `chromaQShift`: no QCC chroma override.
    * A named constant (not a bare 99) so the no-override case reads as
    * what it is at every call site and comparison. */
  final val NoChromaOverride = 99

  // ---------------------------------------------------------------- encode

  /** Encode to a raw JPEG 2000 codestream (SOC..EOC). `comps` are 8-bit
    * sample planes (row-major, length w*h); 3 planes get the RCT.
    *
    * `tileSize = 0` (default) writes one image-sized tile. A positive
    * `tileSize` writes a square tile grid, one tile-part per tile in
    * raster order, each tile transformed and entropy-coded independently
    * (bounded working memory). It must be a multiple of `2^levels`: the
    * spec computes subband geometry from ABSOLUTE tile coordinates
    * (B.5 — a tile whose scaled origin is odd splits low/high on the
    * opposite parity), and keeping every `tileOrigin / 2^l` even is what
    * lets each tile reuse the origin-0 [[Dwt53]] geometry unchanged.
    * Spec-legal: the encoder is free to choose tile dimensions.
    *
    * `layers > 1` splits every code-block's coding passes across that
    * many quality layers at spec-valid truncation points
    * ([[Ebcot.encodeBlockLayered]]), with the packet-header layer
    * machinery (incremental inclusion tag trees, first-inclusion
    * thresholds, per-layer pass counts and lengths — B.10). `prog`
    * picks the A.6.1 progression (see [[packetOrder]]); the -1 default
    * keeps the pre-r18 auto choice byte-for-byte: multi-layer streams
    * in RLCP (resolution outermost — it keeps each tile-part's
    * low-resolution packets a contiguous PREFIX across all layers, so
    * [[decodeReduced]] and the PLT-ranged thumbnail walk
    * ([[tilePartsReduced]]) work unchanged), `layers = 1` in LRCP
    * (coinciding with RLCP byte-for-byte at one layer).
    *
    * `partsPerTile > 1` splits every tile's packet sequence across that
    * many tile-parts (TNsot = N, TPsot = 0..N-1, each with its own SOT /
    * PLT / SOD — A.4.2), cut at RESOLUTION boundaries so the RLCP
    * low-res-prefix property survives the split: real archival encoders
    * bound tile-part length this way (progression interleaving, 32-bit
    * Psot limits), and the walkers/decoders group the parts back
    * together ([[decodeTileParts]]). Must be <= levels + 1 (one
    * resolution group per part at minimum).
    *
    * `irreversible = true` encodes the LOSSY archival profile (r16):
    * ICT + 9/7 DWT ([[Dwt97]]) + deadzone scalar quantization (Annex
    * E). `quantMode` picks the QCD shape — "uniform" (default, style 2,
    * one step 2^(-qShift) in sample units for every band), "norms"
    * (style 2, per-band steps weighted by the measured synthesis-basis
    * norms — see [[synthNorm]]), or "derived" (style 1, one signaled
    * (eps_0, mu_0 = 1024) expanded per E-5). `qShift` <= 0 compresses
    * (qShift = -2 -> LL step 4, visually-lossy); qShift > 0 refines
    * below integer precision. The Tier-1/Tier-2/layer/tile-part/PLT
    * machinery is transform-agnostic and carries over unchanged — only
    * the sample<->coefficient ends differ. */
  def encode(w: Int, h: Int, comps: Array[Array[Int]], levels: Int = 3,
      tileSize: Int = 0, layers: Int = 1, partsPerTile: Int = 1,
      irreversible: Boolean = false, qShift: Int = 0,
      precinctExp: Int = 15, sop: Boolean = false, eph: Boolean = false,
      quantMode: String = "uniform", blockStyle: Int = 0,
      chromaQShift: Int = NoChromaOverride, prog: Int = -1,
      chromaLevels: Int = -1, tileQShifts: Seq[Int] = null,
      bitDepth: Int = 8, poc: Seq[PocEntry] = Nil,
      packedHeaders: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    require(bitDepth >= 8 && bitDepth <= 16, s"bitDepth $bitDepth out of 8..16")
    require(comps.length == 1 || comps.length == 3, "1 or 3 components")
    require(comps.forall(_.length == w * h), "component size mismatch")
    require(levels >= 0 && levels <= 5, "0..5 decomposition levels")
    require(tileSize >= 0, "negative tile size")
    require(tileSize == 0 || tileSize % (1 << levels) == 0,
      s"tile size $tileSize not a multiple of 2^$levels")
    require(layers >= 1 && layers <= 65535, "1..65535 quality layers")
    require(partsPerTile >= 1 && partsPerTile <= levels + 1,
      s"partsPerTile $partsPerTile out of 1..${levels + 1} (split at resolution boundaries)")
    require(irreversible || qShift == 0, "qShift only applies to the irreversible path")
    require(qShift >= -6 && qShift <= 3, s"qShift $qShift out of -6..3")
    require(quantMode == "uniform" || quantMode == "norms" || quantMode == "derived",
      s"quantMode $quantMode not one of uniform|norms|derived")
    require(irreversible || quantMode == "uniform",
      "norm-derived / derived quantization only applies to the irreversible path")
    require((blockStyle & 0x10) == 0 && (blockStyle & ~0x3F) == 0,
      f"code-block style $blockStyle%02x outside the profile (predictable termination unsupported)")
    // chromaQShift (r17): quantize the two ICT chroma components at
    // their own uniform step 2^(-chromaQShift), signaled via QCC
    // markers — the common archival RGB shape (chroma coarser than
    // luma). NoChromaOverride = no override.
    require(chromaQShift == NoChromaOverride ||
      (irreversible && comps.length == 3 && quantMode == "uniform"),
      "chromaQShift needs the irreversible 3-component uniform profile")
    require(chromaQShift == NoChromaOverride || (chromaQShift >= -6 && chromaQShift <= 3),
      s"chromaQShift $chromaQShift out of -6..3")
    // pp = 15 is the spec default ("no precinct subdivision" in practice:
    // 2^15 precincts, Scod bit 0 clear); smaller values partition every
    // resolution into 2^pp x 2^pp precincts (uniform square — the common
    // archival-encoder shape). pp >= 1 keeps the band-coordinate exponent
    // pp-1 >= 0 for r > 0 (B.6).
    require(precinctExp >= 1 && precinctExp <= 15,
      s"precinctExp $precinctExp out of 1..15")
    // prog = -1 (default) keeps the pre-r18 auto choice byte-for-byte:
    // LRCP for one layer, RLCP for multi-layer (resolution outermost
    // either way — this engine's access pattern). Any of the five
    // A.6.1 orders may be forced explicitly (r18: RPCL is what real
    // Kakadu-style random-access masters pair with precincts); the
    // packet CONTENT is order-independent, only emission order and the
    // ranged-walk properties change.
    require(prog == -1 || (prog >= LRCP && prog <= CPRL),
      s"progression order $prog not one of -1 (auto), 0..4 (LRCP/RLCP/RPCL/PCRL/CPRL)")
    val progV = if (prog == -1) { if (layers > 1) RLCP else LRCP } else prog
    // the resolution-boundary tile-part split needs resolution outermost
    require(partsPerTile == 1 || resMajor(progV, layers),
      s"partsPerTile $partsPerTile needs a resolution-major progression (got $progV)")
    // poc (r19): emit a main-header POC whose progression volumes drive
    // the packet sequence (the COD's order is then overridden, A.6.6).
    // The emission [[packetOrder]] itself rejects a POC that fails to
    // cover every packet, so an incomplete spec dies typed at encode.
    require(poc.isEmpty || partsPerTile == 1,
      "POC with partsPerTile > 1 not supported (the resolution-boundary split needs one global resolution-major order)")
    // packedHeaders (r19, A.7.5): pack every packet header into PPT
    // segments in the tile-part header, bodies alone in the bitstream —
    // the error-resilience / streaming delivery shape. One tile-part
    // per tile and no SOP (SOP would ride the body stream; keep the
    // authored shape minimal), no PLT (the ranged walkers typed-reject
    // PPT anyway — whole-file decode only).
    require(!packedHeaders || (!sop && partsPerTile == 1),
      "packedHeaders (PPT) needs partsPerTile = 1 and no SOP markers")
    for ((e, i) <- poc.zipWithIndex) {
      require(e.prog >= LRCP && e.prog <= CPRL, s"poc entry $i: progression ${e.prog} not in 0..4")
      require(e.rs >= 0 && e.rs < e.re && e.re <= 33, s"poc entry $i: resolutions [${e.rs}, ${e.re}) invalid")
      require(e.cs >= 0 && e.cs < e.ce && e.cs < comps.length && e.ce <= 255,
        s"poc entry $i: components [${e.cs}, ${e.ce}) invalid for ${comps.length} components")
      require(e.lye >= 1 && e.lye <= 65535, s"poc entry $i: layer bound ${e.lye} out of 1..65535")
    }
    // chromaLevels (r18b): give the two chroma components a SHALLOWER
    // decomposition pyramid, signaled by main-header COC markers with
    // per-component QCC (the sizing rule: a COC'd component's band
    // list is its own) — the real-corpus "chroma coarser than luma"
    // shape on the LEVELS axis, the sibling of chromaQShift's STEP axis
    require(chromaLevels == -1 ||
      (comps.length == 3 && chromaLevels >= 0 && chromaLevels <= levels &&
        quantMode == "uniform"),
      "chromaLevels (COC) needs 3 components, 0..levels, uniform quantMode")
    // tileQShifts (r18b): per-tile uniform quantizer retune, signaled by
    // a tile-part-0 QCD override (A.6.4 allows QCD in the first
    // tile-part of a tile; precedence: tile QCD > main QCD) — the
    // "retune busy pages coarser" shape real archival encoders produce
    require(tileQShifts == null ||
      (irreversible && quantMode == "uniform" && chromaLevels == -1 &&
        chromaQShift == NoChromaOverride &&
        tileQShifts.forall(v => v >= -6 && v <= 3)),
      "tileQShifts (per-tile QCD) needs the irreversible uniform profile without chroma overrides, values in -6..3")
    val nc = comps.length
    val useRct = nc == 3
    val xt = if (tileSize == 0) w else tileSize
    val yt = if (tileSize == 0) h else tileSize
    val ntx = ceilDiv(w, xt); val nty = ceilDiv(h, yt)
    // Isot is a 16-bit field (A.4.2, max 65534): past it the index would
    // wrap and the distributed decode would silently place tile 65535's
    // pixels at tile 0 — reject at encode time instead
    require(ntx.toLong * nty <= 65535L,
      s"tile grid ${ntx}x$nty exceeds the 16-bit Isot space; use a larger tileSize")
    require(tileQShifts == null || tileQShifts.length == ntx * nty,
      s"tileQShifts has ${if (tileQShifts == null) 0 else tileQShifts.length} entries for a ${ntx * nty}-tile grid")
    def levelsOfC(c: Int): Int = if (c > 0 && chromaLevels >= 0) chromaLevels else levels

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit = { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }

    // SOC + SIZ
    u16(0xFF4F)
    u16(0xFF51); u16(38 + 3 * nc); u16(0)
    u32(w.toLong); u32(h.toLong); u32(0); u32(0)
    u32(xt.toLong); u32(yt.toLong); u32(0); u32(0)
    u16(nc)
    for (_ <- 0 until nc) { u8(bitDepth - 1); u8(1); u8(1) } // unsigned, no subsampling
    // COD — Scod bit 0 flags explicit precinct sizes (one SPcod byte per
    // resolution, PPy<<4 | PPx), bits 1/2 flag SOP/EPH markers (A.6.1)
    val explicitPrec = precinctExp < 15
    val scod = (if (explicitPrec) 1 else 0) | (if (sop) 2 else 0) | (if (eph) 4 else 0)
    u16(0xFF52); u16(12 + (if (explicitPrec) levels + 1 else 0)); u8(scod)
    u8(progV) // SGcod progression order (auto: RLCP multi-layer, else LRCP)
    u16(layers)
    u8(if (useRct) 1 else 0)
    u8(levels)
    u8(CodeBlockExp - 2); u8(CodeBlockExp - 2)
    u8(blockStyle) // code-block style (reset/causal/segsym within profile)
    u8(if (irreversible) 0 else 1) // SPcod transform: 0 = 9/7, 1 = 5/3
    if (explicitPrec) for (_ <- 0 to levels) u8(precinctExp | (precinctExp << 4))
    // QCD — exponents depend only on band gain/level, so one main-header
    // QCD covers every tile regardless of tile dimensions. Reversible:
    // style 0 (no quantization), one exponent byte per subband.
    // Irreversible: the quantMode picks the spec shape —
    //   "uniform" (default): style 2, eps_b = Prec + gain + qShift,
    //     mu = 0 — one step 2^(-qShift) in sample units for every band;
    //   "norms":   style 2, per-band steps 2^(-qShift)/norm_b from the
    //     measured synthesis-basis L2 norms ([[synthNorm]]) — each
    //     band's quantization error contributes equally to pixel-domain
    //     MSE, the shape real archival encoders (Kakadu -Qstep,
    //     OpenJPEG -r) produce;
    //   "derived": style 1, only (eps_0, mu_0) signaled and the decoder
    //     expands eps_b = eps_0 - (r-1), mu_b = mu_0 (E-5); mu_0 = 1024
    //     exercises the mantissa arithmetic (step x1.5).
    val nBands = 3 * levels + 1
    val qspec: Quant = quantMode match {
      case "uniform" => Quant.uniform(levels, irreversible, qShift, bitDepth)
      case "norms" =>
        val base = math.pow(2.0, -qShift.toDouble)
        val em = Vector.tabulate(nBands) { i =>
          val r = if (i == 0) 0 else (i - 1) / 3 + 1
          val ord = if (i == 0) 0 else (i - 1) % 3
          stepToEpsMu(base / synthNorm(levels, r, ord), Quant.gainOf(i), bitDepth)
        }
        Quant(LossyGuardBits, em.map(_._1), em.map(_._2))
      case "derived" => Quant.derived(levels, LossyGuardBits, bitDepth + qShift, DerivedMu0)
    }
    if (irreversible) {
      val style = if (quantMode == "derived") 1 else 2
      val nSig = if (style == 1) 1 else nBands
      u16(0xFF5C); u16(3 + 2 * nSig); u8((qspec.guard << 5) | style)
      for (i <- 0 until nSig) u16((qspec.eps(i) << 11) | qspec.mu(i))
    } else {
      u16(0xFF5C); u16(3 + nBands); u8(qspec.guard << 5)
      for (i <- 0 until nBands) u8(qspec.eps(i) << 3)
    }
    // COC (A.6.2, r18b) for the chroma-levels override: one marker per
    // chroma component carrying its own SPcoc — levels differ, every
    // other axis (code-blocks, style, transform, precincts) repeats the
    // COD's, which is exactly what the decoder requires
    if (chromaLevels >= 0) for (c <- 1 to 2) {
      val lv = levelsOfC(c)
      u16(0xFF53); u16(2 + 7 + (if (explicitPrec) lv + 1 else 0))
      u8(c); u8(if (explicitPrec) 1 else 0)
      u8(lv); u8(CodeBlockExp - 2); u8(CodeBlockExp - 2); u8(blockStyle)
      u8(if (irreversible) 0 else 1)
      if (explicitPrec) for (_ <- 0 to lv) u8(precinctExp | (precinctExp << 4))
    }
    // QCC (A.6.5) for the chroma overrides: written whenever chroma
    // quantization OR levels differ — a COC'd component's band list is
    // its own (the decoder's sizing rule), so the QCC is sized for the
    // chroma pyramid. Shape per transform: style 0 (reversible, Mb
    // exponents only) or style 2 expounded at
    // eps_b = Prec + gain + (chromaQShift | qShift).
    val chromaSpec: Quant =
      if (chromaQShift == NoChromaOverride && chromaLevels == -1) null
      else {
        val nb = 3 * levelsOfC(1) + 1
        if (irreversible) {
          val shift = if (chromaQShift == NoChromaOverride) qShift else chromaQShift
          Quant(LossyGuardBits,
            Vector.tabulate(nb)(i => bitDepth + Quant.gainOf(i) + shift),
            Vector.fill(nb)(0))
        } else
          Quant(GuardBits,
            Vector.tabulate(nb)(i => baseExp(bitDepth) + Quant.gainOf(i)),
            Vector.fill(nb)(0))
      }
    if (chromaSpec != null) for (c <- 1 to 2) {
      val nb = chromaSpec.eps.length
      if (irreversible) {
        u16(0xFF5D); u16(4 + 2 * nb); u8(c); u8((chromaSpec.guard << 5) | 2)
        for (i <- 0 until nb) u16((chromaSpec.eps(i) << 11) | chromaSpec.mu(i))
      } else {
        u16(0xFF5D); u16(4 + nb); u8(c); u8(chromaSpec.guard << 5)
        for (i <- 0 until nb) u8(chromaSpec.eps(i) << 3)
      }
    }
    // POC (A.6.6, r19): RSpoc CSpoc LYEpoc(2) REpoc CEpoc Ppoc per
    // entry (1-byte component form, Csiz < 257 always holds here)
    if (poc.nonEmpty) {
      u16(0xFF5F); u16(2 + 7 * poc.length)
      for (e <- poc) { u8(e.rs); u8(e.cs); u16(e.lye); u8(e.re); u8(e.ce); u8(e.prog) }
    }
    def qspecFor(c: Int): Quant = if (chromaSpec != null && c > 0) chromaSpec else qspec
    // per-tile effective quantization: tile t's retune (or null = main)
    def tileSpec(t: Int): Quant =
      if (tileQShifts == null || tileQShifts(t) == qShift) null
      else Quant.uniform(levels, irreversible = true, tileQShifts(t), bitDepth)
    def qspecForTile(t: Int, c: Int): Quant = {
      val ts = tileSpec(t)
      if (ts != null) ts else qspecFor(c)
    }

    for (t <- 0 until ntx * nty) {
      val x0 = (t % ntx) * xt; val y0 = (t / ntx) * yt
      val tw = math.min(xt, w - x0); val th = math.min(yt, h - y0)
      // tile-local planes: DC level shift, then RCT+5/3 (reversible) or
      // ICT+9/7+deadzone quantization (irreversible) — either way Tier-1
      // sees integer sign-magnitude coefficients and everything
      // downstream (layers, PLT, tile-parts) is transform-agnostic
      val planes =
        if (!irreversible) {
          val ps = comps.map { src =>
            val a = new Array[Int](tw * th)
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) { a(y * tw + x) = src((y0 + y) * w + (x0 + x)) - (1 << (bitDepth - 1)); x += 1 }
              y += 1
            }
            a
          }
          if (useRct) Dwt53.rctForward(ps(0), ps(1), ps(2))
          for ((a, c) <- ps.zipWithIndex) Dwt53.forward(a, tw, th, levelsOfC(c))
          ps
        } else {
          val ds = comps.map { src =>
            val a = new Array[Double](tw * th)
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) { a(y * tw + x) = src((y0 + y) * w + (x0 + x)) - (1 << (bitDepth - 1)).toDouble; x += 1 }
              y += 1
            }
            a
          }
          if (useRct) Dwt97.ictForward(ds(0), ds(1), ds(2))
          for ((a, c) <- ds.zipWithIndex) Dwt97.forward(a, tw, th, levelsOfC(c))
          // deadzone scalar quantization, E.1: q = sign * floor(|v|/delta_b)
          // per band — the bands of resolutions 0..levels tile the
          // Mallat array exactly once, so this is the same single pass
          // as the old uniform-step loop, just with a per-rect step
          ds.zipWithIndex.map { case (d, c) =>
            val cq = qspecForTile(t, c)
            val a = new Array[Int](d.length)
            for (r <- 0 to levelsOfC(c); (b, ord) <- bandsAt(tw, th, levelsOfC(c), r).zipWithIndex) {
              val delta = cq.delta(bandIndex(r, ord), b.gain, bitDepth)
              var y = 0
              while (y < b.h) {
                var x = 0
                while (x < b.w) {
                  val i = (b.y0 + y) * tw + (b.x0 + x)
                  val v = d(i)
                  a(i) = if (v >= 0) math.floor(v / delta).toInt
                         else -math.floor(-v / delta).toInt
                  x += 1
                }
                y += 1
              }
            }
            a
          }
        }

      // tile body: packets in the chosen progression order (B.12.1 via
      // [[packetOrder]] — the same sequence the decoder walks), lengths
      // kept for PLT. Tier-1 runs once per (component, resolution);
      // layers slice its passes; encodeLayer sees each (c, r, p)'s
      // layers in ascending order under EVERY A.6.1 progression (l is a
      // sort key in all five), which the persistent tag trees need.
      // Nsop numbers packets per tile across all its tile-parts in
      // stream order (A.8.1).
      val encs = Array.tabulate(nc)(c => Array.tabulate(levelsOfC(c) + 1)(r =>
        new ResEncoder(planes(c), tw, th, levelsOfC(c), r, layers,
          qspecForTile(t, c), x0, y0, precinctExp, blockStyle)))
      val order = packetOrder(progV, layers, nc, levelsOfC _, tw, th, x0, y0, precinctExp, poc)
      if (packedHeaders) {
        // PPT (A.7.5): one tile-part per tile — packet headers (incl.
        // EPH) concatenated into PPT segments riding the tile-part
        // header (Zppt-chunked at the 16-bit Lppt bound), bodies alone
        // after SOD. The decoder walks the two streams on separate
        // cursors ([[ResDecoder.readPacketFrom]]).
        val split = order.map(k => encs(k.c)(k.r).encodeLayerSplit(k.l, k.p, eph))
        val pptPayload = split.toArray.flatMap(_._1)
        val bodyBytes = split.toArray.flatMap(_._2)
        val pptSegs = pptPayload.grouped(65532).toSeq
        require(pptSegs.length <= 256, "PPT payload overflows the 8-bit Zppt index space")
        val pptLen = pptSegs.map(5L + _.length).sum
        val tq = tileSpec(t)
        val tqLen = if (tq == null) 0L else 5L + 2L * (3 * levels + 1)
        u16(0xFF90); u16(10); u16(t)
        u32(12L + tqLen + pptLen + 2L + bodyBytes.length) // Psot
        u8(0); u8(1) // TPsot, TNsot
        if (tq != null) {
          u16(0xFF5C); u16(3 + 2 * (3 * levels + 1)); u8((tq.guard << 5) | 2)
          for (i <- 0 until 3 * levels + 1) u16((tq.eps(i) << 11) | tq.mu(i))
        }
        for ((seg, z) <- pptSegs.zipWithIndex) {
          u16(0xFF61); u16(3 + seg.length); u8(z); out.write(seg)
        }
        u16(0xFF93)
        out.write(bodyBytes)
      } else {
      var nsop = 0
      val emitted: IndexedSeq[Array[Byte]] = order.map { k =>
        val pkt = encs(k.c)(k.r).encodeLayer(k.l, k.p, eph)
        val out =
          if (!sop) pkt
          else {
            val o = new Array[Byte](6 + pkt.length)
            o(0) = 0xFF.toByte; o(1) = 0x91.toByte; o(2) = 0; o(3) = 4
            o(4) = ((nsop >> 8) & 0xFF).toByte; o(5) = (nsop & 0xFF).toByte
            System.arraycopy(pkt, 0, o, 6, pkt.length)
            o
          }
        nsop = (nsop + 1) & 0xFFFF
        out
      }

      // split the resolution groups across tile-parts as evenly as
      // possible; part j carries resolutions [j*(levels+1)/N, (j+1)*...)
      // — a contiguous packet run because partsPerTile > 1 requires a
      // resolution-major order (checked above)
      for (part <- 0 until partsPerTile) {
        val rFrom = part * (levels + 1) / partsPerTile
        val rUntil = (part + 1) * (levels + 1) / partsPerTile
        val packets = order.zip(emitted).collect {
          case (k, b) if k.r >= rFrom && k.r < rUntil => b
        }
        val bodyBytes = packets.toArray.flatten

        // PLT (A.7.3): per-packet lengths as 7-bit-varint Iplt entries.
        // This is what lets a reduced-resolution reader compute each
        // tile-part's low-res PREFIX length and ranged-read only those
        // bytes ([[tilePartsReduced]]) — without it a thumbnail job must
        // fetch the whole tile-part just to skip the high-res packets.
        val plt = new java.io.ByteArrayOutputStream()
        packets.foreach { pk =>
          val n = pk.length
          val bits = 32 - Integer.numberOfLeadingZeros(math.max(1, n))
          var shift = ((bits - 1) / 7) * 7
          while (shift > 0) { plt.write(0x80 | ((n >> shift) & 0x7F)); shift -= 7 }
          plt.write(n & 0x7F)
        }
        val pltBytes = plt.toByteArray
        // Lplt is a 16-bit field: a silent wrap would emit a stream whose
        // own header walk misparses (the Isot guard's sibling). One PLT
        // segment bounds packets-per-tile-part at ~32k varint bytes — far
        // above any profile this encoder writes; reject rather than
        // split Zplt.
        require(3 + pltBytes.length <= 0xFFFF,
          s"PLT for ${packets.length} packets (${pltBytes.length} B) overflows the 16-bit Lplt; reduce layers")

        // SOT [+ tile QCD retune, part 0 only — A.6.4] + PLT + SOD + body
        val tq = if (part == 0) tileSpec(t) else null
        // marker(2) + Lqcd(2) + Sqcd(1) + 2 B per band
        val tqLen = if (tq == null) 0L else 5L + 2L * (3 * levels + 1)
        u16(0xFF90); u16(10); u16(t)
        u32(12L + tqLen + (5L + pltBytes.length) + 2L + bodyBytes.length) // Psot
        u8(part); u8(partsPerTile) // TPsot, TNsot
        if (tq != null) {
          u16(0xFF5C); u16(3 + 2 * (3 * levels + 1)); u8((tq.guard << 5) | 2)
          for (i <- 0 until 3 * levels + 1) u16((tq.eps(i) << 11) | tq.mu(i))
        }
        u16(0xFF58); u16(3 + pltBytes.length); u8(0) // PLT, Lplt, Zplt = 0
        out.write(pltBytes)
        u16(0xFF93)
        out.write(bodyBytes)
      }
      }
    }
    u16(0xFFD9)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Parsed main header — everything a tile-part needs to decode
    * standalone. Small and flat on purpose: a distributed decode ships
    * THIS (a handful of ints) per tile task, never the pixel planes.
    * `irreversible` selects the transform pair; `quant` carries the
    * per-band scalar quantization parsed from QCD (any spec-legal
    * style 0/1/2 shape since r17 — see [[Quant]]); `qShift` remains as
    * the LL band's step exponent offset (eps_LL - Prec for the
    * irreversible path, 0 otherwise) — the scalar the uniform-profile
    * queries assert on, and exactly the old uniform-profile knob. */
  /** Per-component coding-style override parsed from COC (A.6.2, r18b):
    * the axes this profile lets a COC change are the DECOMPOSITION
    * LEVELS (the real-corpus case — chroma pyramids shallower than
    * luma) and the code-block style; everything else (64x64 blocks,
    * transform, precinct shape) must match the COD and is rejected
    * typed at parse. */
  final case class CompCoding(levels: Int, blockStyle: Int)

  /** One POC progression volume (A.6.6, Table A-32): packets of
    * resolutions [rs, re), components [cs, ce), layers [0, lye) follow
    * progression `prog`, each entry claiming only packets no earlier
    * entry already emitted (B.12.1.7's "not previously included"). The
    * marker overrides the COD's progression outright — real encoders
    * (rate-allocated Kakadu masters) emit it when the allocation
    * changes progression mid-stream. */
  final case class PocEntry(rs: Int, cs: Int, lye: Int, re: Int, ce: Int, prog: Int)

  final case class Header(width: Int, height: Int, nc: Int, xt: Int, yt: Int,
      useRct: Boolean, levels: Int, layers: Int = 1,
      irreversible: Boolean = false, qShift: Int = 0,
      pp: Int = 15, sop: Boolean = false, eph: Boolean = false,
      quant: Quant = null, blockStyle: Int = 0,
      qcc: Map[Int, Quant] = Map.empty, prog: Int = RLCP,
      coc: Map[Int, CompCoding] = Map.empty, prec: Int = 8,
      poc: Seq[PocEntry] = Nil) {
    def ntx: Int = ceilDiv(width, xt)
    def nty: Int = ceilDiv(height, yt)
    /** The quantization in force — a Header built without one (tests,
      * query staging) gets the uniform profile its qShift implies. */
    def q: Quant = if (quant ne null) quant else Quant.uniform(levels, irreversible, qShift, prec)
    /** Component c's quantization: its QCC override, else the QCD. */
    def qFor(c: Int): Quant = qcc.getOrElse(c, q)
    /** Component c's decomposition levels: its COC override, else COD's. */
    def levelsFor(c: Int): Int = coc.get(c).map(_.levels).getOrElse(levels)
    /** Smallest level count across components — the bound on `discard`
      * for reduced decodes of COC'd streams. */
    def minLevels: Int = (0 until nc).map(levelsFor).min
    /** Do all components share the COD's decomposition levels? The
      * byte-prefix reduced walkers stand on this: with per-component
      * levels a component's top-resolution packets sit INSIDE a lower
      * global resolution group, so the kept set is not a prefix. */
    def uniformLevels: Boolean = coc.valuesIterator.forall(_.levels == levels)
    /** The style bits Tier-1 acts on for component c (COC override,
      * else COD), with the behavior-neutral 0x10 masked as in
      * [[tier1Style]]. */
    def tier1StyleFor(c: Int): Int =
      coc.get(c).map(_.blockStyle).getOrElse(blockStyle) & ~0x10
    /** The style bits Tier-1 acts on: `blockStyle` keeps the RAW
      * signaled SPcod byte (a foreign stream's predictable-termination
      * flag 0x10 must survive into diagnostics/re-encode), but 0x10
      * changes only the encoder's flush spare bits (C.2.10), so the
      * decoding machinery masks it off HERE — the one consumption
      * point — rather than at parse time. */
    def tier1Style: Int = blockStyle & ~0x10
  }

  /** One decoded tile: its grid position and clamped 8-bit pixel planes
    * (row-major, length width*height). */
  final case class Tile(index: Int, x0: Int, y0: Int, width: Int, height: Int,
      comps: Array[Array[Int]])

  /** Byte span of one tile-part within the input passed to
    * [[tileParts]] — `pos` is absolute, so a ranged read of
    * [pos, pos+len) hands [[decodeTilePart]] exactly its slice.
    * Offsets are Long: archival scans are gigabytes, and the split
    * walk never materializes the file, so nothing caps at Int.
    * `part`/`nparts` are the SOT's TPsot/TNsot: a tile split across
    * several tile-parts decodes from ALL its parts' slices in TPsot
    * order ([[decodeTileParts]]) — a distributed split groups spans by
    * `index` before handing a tile to a task. */
  final case class TilePartSpan(index: Int, pos: Long, len: Long,
      part: Int = 0, nparts: Int = 1)

  /** Ranged-read abstraction for the header/Psot walks: implementations
    * fetch exactly [pos, pos+len) and nothing else, so a split step over
    * a gigabyte file reads O(main header + 12 B per SOT), not the file.
    * Callers keep at most a few-KB segment in memory at a time. Every
    * read is bounds-checked against `length` and fails with a typed
    * IllegalArgumentException — truncated input gets the same loud
    * contract as any other malformed codestream. */
  trait RangedInput {
    def length: Long
    /** Fetch exactly [pos, pos+len); must throw IllegalArgumentException
      * (not a raw index error) when the range leaves [0, length). */
    def read(pos: Long, len: Int): Array[Byte]
    protected final def checkRange(pos: Long, len: Int): Unit =
      require(pos >= 0 && len >= 0 && pos + len <= length,
        s"read [$pos, ${pos + len}) out of bounds (input length $length) — truncated or malformed codestream")
  }

  /** In-memory [[RangedInput]] — the full-decode paths and tests. */
  final class BytesInput(b: Array[Byte]) extends RangedInput {
    def length: Long = b.length.toLong
    def read(pos: Long, len: Int): Array[Byte] = {
      checkRange(pos, len)
      java.util.Arrays.copyOfRange(b, pos.toInt, pos.toInt + len)
    }
  }

  /** Wrapper that counts fetched bytes, so a query can REQUIRE (not just
    * document) that its split stage read only headers. */
  final class CountingInput(underlying: RangedInput) extends RangedInput {
    private var n = 0L
    def bytesRead: Long = n
    def length: Long = underlying.length
    def read(pos: Long, len: Int): Array[Byte] = {
      n += len
      underlying.read(pos, len)
    }
  }

  private def readU16(in: RangedInput, pos: Long): Int = beU16(in.read(pos, 2), 0)

  /** Decode a raw codestream or a JP2 container (jp2c box located via
    * [[graft.sources.Jp2Box]] conventions). */
  def decode(bytes: Array[Byte]): Image = decodeReduced(bytes, 0)

  /** Decode at reduced resolution: drop the `discard` highest
    * resolutions (OpenJPEG's `-r`), yielding a ceil(w/2^d) x ceil(h/2^d)
    * image — the standard JPEG 2000 "reduce" reconstruction (the LL
    * pyramid, NOT a resample of the full decode). A resolution-major
    * layout (RLCP/RPCL, or 1-layer LRCP — required here, typed) puts
    * each tile's low-resolution packets FIRST, and Psot gives the
    * tile-part end, so the high-resolution packets are never read, let
    * alone entropy-decoded: a thumbnail of an archival scan costs the
    * low-res fraction of the bytes. Subband geometry nests (the reduced
    * Mallat array is the full array's top-left corner), so the reduced
    * decode is bit-exactly the encoder's own subbands r <= levels-d
    * inverse-transformed d levels short. */
  def decodeReduced(bytes: Array[Byte], discard: Int): Image = {
    val (hdr, spans) = tileParts(new BytesInput(bytes))
    require(discard >= 0 && discard <= hdr.levels,
      s"discard $discard out of 0..${hdr.levels}")
    val rW = ceilDiv(hdr.width, 1 << discard)
    val rH = ceilDiv(hdr.height, 1 << discard)
    val planes = Array.fill(hdr.nc)(new Array[Int](rW * rH))
    val seen = new Array[Boolean](hdr.ntx * hdr.nty)
    // group each tile's parts (a tile may span several tile-parts);
    // decodeTileParts enforces TPsot order/completeness per tile
    for ((_, parts) <- spans.groupBy(_.index).toSeq.sortBy(_._1)) {
      val slices = parts.sortBy(_.part).map(s =>
        java.util.Arrays.copyOfRange(bytes, s.pos.toInt, (s.pos + s.len).toInt))
      // duplicate tile-parts are rejected inside decodeTileParts (the
      // TPsot 0..k contiguity check); `seen` only backs the missing-tiles
      // check below
      val t = decodeTileParts(slices, hdr, discard)
      seen(t.index) = true
      for (c <- 0 until hdr.nc) {
        val src = t.comps(c); val dst = planes(c)
        var y = 0
        while (y < t.height) {
          System.arraycopy(src, y * t.width, dst, (t.y0 + y) * rW + t.x0, t.width)
          y += 1
        }
      }
    }
    require(seen.forall(identity),
      s"missing tile-parts: ${seen.zipWithIndex.collect { case (false, i) => i }.mkString(",")}")
    Image(rW, rH, planes)
  }

  /** Main header of a codestream or JP2 container — cheap (marker walk,
    * no entropy work). */
  def header(bytes: Array[Byte]): Header = header(new BytesInput(bytes))

  /** Streamed [[header]]: reads only the container boxes and main-header
    * marker segments via ranged reads — a split task over a gigabyte
    * file never materializes it. */
  def header(in: RangedInput): Header = parseMainHeader(in)._1

  /** Walk the Psot chain and return every tile-part's absolute byte span
    * within `bytes` — cheap (no entropy work): this is the split step of
    * a distributed single-scan decode, after which each task
    * ranged-reads only its own span. */
  def tileParts(bytes: Array[Byte]): Seq[TilePartSpan] =
    tileParts(new BytesInput(bytes))._2

  /** Streamed [[tileParts]] over ranged reads — the split step for files
    * too big (or too expensive) to materialize: it fetches the main
    * header once plus 12 bytes per SOT, seek-hopping the Psot chain, and
    * returns the parsed [[Header]] alongside the spans so callers don't
    * pay a second header walk. */
  def tileParts(in: RangedInput): (Header, Seq[TilePartSpan]) = {
    val (hdr, sot0, csEnd) = parseMainHeader(in)
    val spans = ArrayBuffer.empty[TilePartSpan]
    var pos = sot0
    var marker = readU16(in, pos)
    while (marker == 0xFF90) {
      val sot = in.read(pos, 12) // SOT: marker Lsot Isot Psot TPsot TNsot
      val isot = beU16(sot, 4)
      val psot = beU32(sot, 6)
      // Psot = 0 (spec-legal only for a last tile-part streamed to EOC,
      // never written by this profile) or a huge value would loop the
      // walk or run off the input — reject loudly instead of guessing.
      // Bounded against the CODESTREAM end, not the container: in a JP2
      // file the jp2c box ends before the trailing container bytes, and
      // a Psot overrunning into those must fail HERE with the precise
      // bounds error, not later on the vaguer missing-EOC path.
      require(psot >= 14L && pos + psot <= csEnd,
        s"Psot $psot at $pos out of bounds (codestream ends at $csEnd)")
      require(isot < hdr.ntx * hdr.nty, s"tile index $isot out of grid")
      val tpsot = sot(10) & 0xFF
      val tnsot = sot(11) & 0xFF
      // TNsot = 0 is spec-legal ("number of tile-parts not specified in
      // this header", A.4.2 — streaming writers emit it because the
      // count is unknown when the SOT goes out). Admitted since r19:
      // this walk runs the Psot chain to EOC anyway, so the unknown
      // resolves to the OBSERVED per-tile count below, and a full
      // decode's completeness is additionally backed by Tier-2's exact
      // packet accounting (decodeTileCore consumes the body to the last
      // byte) — a spliced-away tail part cannot pass silently.
      require(tpsot <= 254, s"TPsot $tpsot out of 0..254 at $pos")
      require(tnsot == 0 || tpsot < tnsot, s"TPsot $tpsot >= TNsot $tnsot at $pos")
      spans += TilePartSpan(isot, pos, psot, tpsot, tnsot)
      pos += psot
      marker = readU16(in, pos)
    }
    require(marker == 0xFFD9, "missing EOC after tile data")
    // resolve TNsot = 0 to each tile's effective part count, so every
    // downstream completeness check works off ONE authoritative number;
    // a tile mixing zero and non-zero signals must agree on one value
    val resolved =
      if (spans.forall(_.nparts >= 1)) spans.toSeq
      else {
        val byTile = spans.groupBy(_.index)
        spans.toSeq.map { s =>
          if (s.nparts >= 1) s
          else {
            val sibs = byTile(s.index)
            val signaled = sibs.map(_.nparts).filter(_ >= 1).distinct
            require(signaled.size <= 1,
              s"tile ${s.index}: inconsistent TNsot values ${signaled.sorted.mkString(",")}")
            s.copy(nparts = signaled.headOption.getOrElse(sibs.length))
          }
        }
      }
    (hdr, resolved)
  }

  /** Author a FOREIGN "streaming writer" stream: rewrite every SOT's
    * TNsot byte to 0 ("number of tile-parts not specified", A.4.2).
    * Fixture/staging utility — this encoder always signals the count;
    * real incremental writers cannot. Accepts raw codestreams and JP2
    * containers (span positions are input-absolute). */
  def eraseTnsot(cs: Array[Byte]): Array[Byte] = {
    val out = cs.clone()
    for (s <- tileParts(out)) out((s.pos + 11).toInt) = 0
    out
  }

  /** Like [[tileParts]], but each span is TRUNCATED to the bytes a
    * `discard`-reduced decode actually needs: the tile-part header plus
    * the first (levels-discard+1)·nc packets, whose lengths come from
    * the PLT marker the encoder writes — no entropy work. This is the
    * byte-level half of the thumbnail story: a distributed reduced
    * decode ranged-reads ONLY the low-resolution prefix of every
    * tile-part, so a thumbnail job over a 100 TB archive fetches the
    * low-res fraction of the bytes from storage, not just decodes less.
    * Falls back to the full span for a tile-part without PLT. */
  def tilePartsReduced(bytes: Array[Byte], discard: Int): Seq[TilePartSpan] =
    tilePartsReduced(new BytesInput(bytes), discard)._2

  /** Streamed [[tilePartsReduced]] — adds one tile-part-header read
    * (SOT + PLT segment, a few dozen bytes) per tile-part to the
    * [[tileParts]] walk; still O(headers), never the bodies. For a tile
    * split across several tile-parts the kept-packet prefix is counted
    * ACROSS its parts in TPsot order: parts wholly inside the prefix
    * keep their full span, the boundary part is PLT-truncated, later
    * parts are dropped — a distributed reduced decode then hands each
    * tile's remaining slices to [[decodeTileParts]]. */
  def tilePartsReduced(in: RangedInput, discard: Int): (Header, Seq[TilePartSpan]) = {
    val (hdr, spans) = tileParts(in)
    require(discard >= 0 && discard <= hdr.levels,
      s"discard $discard out of 0..${hdr.levels}")
    // the reduced walk truncates each tile to a byte PREFIX, which holds
    // the kept resolutions only when resolution is the outermost axis —
    // LRCP(multi-layer)/PCRL/CPRL streams get this RANGED-use rejection
    // (distinct from whole-file decode, which admits all five orders)
    require(resMajor(hdr.prog, hdr.layers),
      s"progression order ${hdr.prog} is not resolution-major: the ranged reduced-resolution walk needs RLCP/RPCL (or 1-layer LRCP); whole-file decode still admits this stream")
    // POC replaces the global order with per-volume progressions, so no
    // byte prefix holds the kept resolutions — RANGED-use rejection
    // (the ranged QUALITY/REGION walkers, which keep packets by ranges
    // from [[packetOrder]], admit POC)
    require(hdr.poc.isEmpty,
      "POC (progression order change): the ranged reduced-resolution walk is unsupported (kept packets are not a byte prefix); whole-file decode still admits this stream")
    // same prefix argument per component: a COC'd component's own top
    // resolutions sit INSIDE lower global groups, so the kept set is
    // not a byte prefix — RANGED-use rejection, whole-file decode fine
    require(hdr.uniformLevels,
      "per-component COC decomposition levels: the ranged reduced-resolution walk is unsupported (kept packets are not a byte prefix); whole-file decode still admits this stream")
    // packets per kept resolution = layers * components * precincts(r)
    // (RLCP keeps them a contiguous prefix of every tile's packet
    // sequence regardless of layer count); precinct counts are per tile,
    // so the kept-prefix length is too
    // per-tile packet counters across the stream-order walk; the spec
    // requires a tile's parts to appear in TPsot order (A.4.2), which the
    // accumulation stands on — enforced, not assumed. Per-tile override
    // markers (r18b) resolve an EFFECTIVE header per tile whose
    // progression/layer count drives the kept-prefix arithmetic.
    val pktSeen = new Array[Int](hdr.ntx * hdr.nty)
    val partSeen = new Array[Int](hdr.ntx * hdr.nty)
    val keepTarget = new Array[Int](hdr.ntx * hdr.nty)
    val out = spans.flatMap { s =>
      require(s.part == partSeen(s.index),
        s"tile ${s.index}: tile-part ${s.part} out of TPsot order (expected ${partSeen(s.index)})")
      partSeen(s.index) += 1
      val th = tilePartHeader(in, s.pos)
      require(th.ppt.isEmpty,
        s"tile ${s.index}: PPT (packed packet headers) — ranged reduced walk unsupported; whole-file decode admits this stream")
      if (s.part == 0) {
        val eff = applyTileOverrides(hdr, th)
        require(resMajor(eff.prog, eff.layers),
          s"tile ${s.index}: effective progression order ${eff.prog} is not resolution-major — ranged reduced walk unsupported")
        require(eff.poc.isEmpty,
          s"tile ${s.index}: POC in effect — ranged reduced walk unsupported")
        require(eff.uniformLevels,
          s"tile ${s.index}: per-component COC levels — ranged reduced walk unsupported")
        keepTarget(s.index) = packetsPerRes(eff, s.index).take(eff.levels - discard + 1).sum
      } else require(!th.hasOverrides,
        s"tile ${s.index}: COD/COC/QCD/QCC/POC outside the first tile-part not allowed (A.6)")
      val bodyStart = th.bodyStart; val lens = th.plt
      if (lens == null) {
        require(s.nparts == 1,
          s"tile ${s.index}: no PLT on a multi-tile-part tile — cannot compute the reduced prefix")
        Some(s) // no PLT: fall back to the full span
      } else {
        val keep = keepTarget(s.index)
        val before = pktSeen(s.index)
        pktSeen(s.index) = before + lens.length
        if (before >= keep) None // wholly past the prefix: dropped
        else if (before + lens.length <= keep) Some(s) // wholly inside
        else {
          val prefix = (bodyStart - s.pos) + lens.take(keep - before).map(_.toLong).sum
          Some(s.copy(len = math.min(s.len, prefix)))
        }
      }
    }
    for (t <- 0 until hdr.ntx * hdr.nty)
      require(pktSeen(t) == 0 || pktSeen(t) >= keepTarget(t),
        s"tile $t: PLT lists ${pktSeen(t)} packets across its parts, need ${keepTarget(t)}")
    (hdr, out)
  }

  /** Decode ONE tile-part from exactly its slice (SOT..tile-part end as
    * spanned by [[tileParts]], or the truncated low-res prefix from
    * [[tilePartsReduced]]) given the parsed [[Header]] — the
    * executor-side step of a distributed single-scan decode. Fully
    * standalone: inverse DWT, RCT, DC unshift and clamp are tile-local
    * by construction. `discard` > 0 returns the tile at reduced
    * resolution with reduced-grid coordinates (see [[decodeReduced]]) —
    * only the slice's low-resolution packet prefix is entropy-decoded.
    * For a tile split across several tile-parts use [[decodeTileParts]]
    * with every part's slice. */
  def decodeTilePart(slice: Array[Byte], hdr: Header, discard: Int = 0): Tile =
    decodeTileParts(Seq(slice), hdr, discard)

  /** Decode one TILE from its tile-parts' slices, in TPsot order — the
    * executor-side step when a tile spans several tile-parts (TNsot > 1;
    * real archival encoders split tiles to bound tile-part length). The
    * slices must be the tile's parts 0..k contiguously: a full decode
    * (discard = 0) requires ALL TNsot parts; a reduced decode accepts
    * the prefix of parts that carry the kept resolutions, each possibly
    * PLT-truncated ([[tilePartsReduced]]). Packet walk state is
    * per-resolution, so concatenating the part bodies in TPsot order
    * reconstructs exactly the single-part packet sequence. */
  def decodeTileParts(slices: Seq[Array[Byte]], hdr: Header, discard: Int = 0): Tile = {
    require(slices.nonEmpty, "no tile-part slices")
    require(discard >= 0 && discard <= hdr.levels,
      s"discard $discard out of 0..${hdr.levels}")
    val sots = slices.map(parseSliceSot)
    val isot = sots.head.isot
    require(sots.forall(_.isot == isot),
      s"slices from different tiles: ${sots.map(_.isot).distinct.mkString(",")}")
    val signaled = sots.map(_.nparts).filter(_ >= 1).distinct
    require(signaled.size <= 1,
      s"tile $isot: inconsistent TNsot values ${signaled.sorted.mkString(",")}")
    // all-TNsot=0 slices leave the count unsignaled: the slice SET is
    // then the count (the walk that grouped the slices ran the Psot
    // chain to EOC), and Tier-2's exact body accounting in
    // decodeTileCore catches a missing tail part — the completeness
    // check this profile used to reject TNsot = 0 to keep is preserved,
    // carried by packets instead of the header field
    val nparts = signaled.headOption.getOrElse(sots.length)
    require(sots.map(_.part) == (0 until sots.length),
      s"tile $isot: slices must be tile-parts 0..k in TPsot order, got ${sots.map(_.part).mkString(",")}")
    if (discard == 0)
      require(sots.length == nparts,
        s"tile $isot: full decode needs all $nparts tile-parts, got ${sots.length}")
    // a PLT-truncated (reduced-prefix) slice ends before its Psot; only
    // an all-full-slices decode can assert byte-exact body consumption
    var truncated = false
    val bodyLen = slices.zip(sots).map { case (s, i) =>
      require(s.length <= i.psot, s"tile $isot part ${i.part}: slice longer than Psot")
      if (s.length < i.psot) truncated = true
      s.length - i.bodyStart
    }.sum
    val body = new Array[Byte](bodyLen)
    var at = 0
    for ((s, i) <- slices.zip(sots)) {
      System.arraycopy(s, i.bodyStart, body, at, s.length - i.bodyStart)
      at += s.length - i.bodyStart
    }
    // per-tile COD/COC/QCD/QCC (r18b): first tile-part only (A.6)
    for (i <- sots.drop(1)) require(!i.head.hasOverrides,
      s"tile $isot: COD/COC/QCD/QCC/POC outside the first tile-part not allowed (A.6)")
    // PPT (r19, A.7.5): the tile's packed packet headers are the
    // concatenation of its PPT payloads in Zppt order (they may ride
    // any of the tile's parts); duplicates are typed
    val ppts = sots.flatMap(_.head.ppt)
    val packed: Array[Byte] =
      if (ppts.isEmpty) null
      else {
        require(ppts.map(_._1).distinct.size == ppts.size,
          s"tile $isot: duplicate Zppt index")
        require(discard == 0 && !truncated,
          "PPT (packed packet headers): truncated/reduced decode unsupported — whole-file decode admits this stream")
        ppts.sortBy(_._1).toArray.flatMap(_._2)
      }
    val eff = applyTileOverrides(hdr, sots.head.head)
    decodeTileCore(isot, body, eff, discard, eff.layers,
      exact = discard == 0 && !truncated, packedHdrs = packed)
  }

  /** Decode ONE tile from a COMPACTED quality slice — the concatenated
    * bytes of [[tilePartsQuality]]'s ranges (the FIRST tile-part's
    * header, then per resolution only the first keepLayers layers'
    * packets across all the tile's parts, back to back) — the spec's
    * progressive-by-quality reconstruction: every code-block truncated
    * at its layer boundary (a verified pass-boundary truncation point by
    * construction), full resolution, reduced fidelity. A separate entry
    * point on purpose: on a FULL tile-part slice the dropped layer
    * packets sit between resolutions, so a keepLayers-truncated walk
    * only parses correctly on the compacted layout — this method exists
    * so the two cannot be mixed up. */
  def decodeTilePartQuality(slice: Array[Byte], hdr: Header, keepLayers: Int): Tile = {
    require(keepLayers >= 1 && keepLayers <= hdr.layers,
      s"keepLayers $keepLayers out of 1..${hdr.layers}")
    val sot = parseSliceSot(slice)
    require(sot.part == 0, "compacted quality slice must start at tile-part 0")
    require(sot.head.ppt.isEmpty,
      "PPT (packed packet headers): quality truncation unsupported — whole-file decode admits this stream")
    val body = java.util.Arrays.copyOfRange(slice, sot.bodyStart, slice.length)
    // the compacted layout contains EXACTLY the kept packets (or, for the
    // single-part no-PLT fallback with keepLayers == layers, the full
    // body), so the walk must consume the slice to the last byte
    decodeTileCore(sot.isot, body, applyTileOverrides(hdr, sot.head), 0,
      keepLayers, exact = true)
  }

  /** Parsed SOT + tile-part header of one slice (offsets slice-local);
    * carries the override markers for [[applyTileOverrides]]. */
  private final case class SliceSot(isot: Int, psot: Long, part: Int, nparts: Int,
      bodyStart: Int, head: TileHead)

  private def parseSliceSot(slice: Array[Byte]): SliceSot = {
    def u8(i: Int): Int = slice(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    require(slice.length >= 14, "tile-part slice shorter than its SOT")
    require(u16(0) == 0xFF90, "expected SOT")
    require(u16(2) == 10, s"Lsot ${u16(2)} != 10")
    val nparts = u8(11) // 0 = "count not specified" (resolved by the caller)
    require(nparts == 0 || u8(10) < nparts, s"TPsot ${u8(10)} >= TNsot $nparts")
    val th = tilePartHeader(new BytesInput(slice), 0L)
    SliceSot(u16(4), beU32(slice, 6), u8(10), nparts, th.bodyStart.toInt, th)
  }

  /** Byte ranges of one tile-part that a `keepLayers`-quality decode
    * needs: the tile-part header, then per resolution the first
    * keepLayers·nc packets (adjacent ranges merged). `fullLen` is the
    * whole tile-part's Psot for fraction accounting. */
  final case class RangedTilePart(index: Int, ranges: Seq[(Long, Long)], fullLen: Long) {
    def fetchBytes: Long = ranges.map { case (a, b) => b - a }.sum
  }

  /** The quality axis of the ranged-fetch story (the layer analog of
    * [[tilePartsReduced]]'s resolution axis): per TILE, the byte ranges
    * holding the first tile-part's header and the first keepLayers
    * quality layers of EVERY resolution across all the tile's parts,
    * computed from the PLT packet lengths — streamed header walk, no
    * entropy work, never a body byte. Under RLCP each resolution's layer
    * packets are consecutive, so kept packets merge into one range per
    * resolution (adjacent ranges coalesced); a distributed progressive
    * fetch reads only these and hands the concatenated (compacted) slice
    * to [[decodeTilePartQuality]] with the same keepLayers —
    * full-resolution output at reduced fidelity for the first-layer
    * fraction of the archive's bytes. A single-part tile without PLT
    * falls back to the full span (legal only at keepLayers == layers);
    * a MULTI-part tile without PLT is rejected outright. */
  def tilePartsQuality(in: RangedInput, keepLayers: Int): (Header, Seq[RangedTilePart]) = {
    val (hdr, spans) = tileParts(in)
    require(keepLayers >= 1 && keepLayers <= hdr.layers,
      s"keepLayers $keepLayers out of 1..${hdr.layers}")
    // group spans per tile in stream order (= TPsot order, enforced)
    val byTile = scala.collection.mutable.LinkedHashMap.empty[Int, ArrayBuffer[TilePartSpan]]
    for (s <- spans) byTile.getOrElseUpdate(s.index, ArrayBuffer.empty) += s
    val out = byTile.iterator.map { case (isot, parts) =>
      require(parts.map(_.part).toSeq == (0 until parts.length),
        s"tile $isot: tile-parts out of TPsot order or incomplete: ${parts.map(_.part).mkString(",")}")
      require(parts.length == parts.head.nparts,
        s"tile $isot: ${parts.length} tile-parts present, TNsot says ${parts.head.nparts}")
      val fullLen = parts.map(_.len).sum
      val headers = parts.map(s => tilePartHeader(in, s.pos))
      for (th <- headers.drop(1)) require(!th.hasOverrides,
        s"tile $isot: COD/COC/QCD/QCC/POC outside the first tile-part not allowed (A.6)")
      require(headers.forall(_.ppt.isEmpty),
        s"tile $isot: PPT (packed packet headers) — ranged quality walk unsupported; whole-file decode admits this stream")
      val eff = applyTileOverrides(hdr, headers.head)
      if (headers.exists(_.plt == null)) {
        // a full span IS the compacted layout only when nothing is
        // dropped AND the tile is one part (no inner headers); a
        // keepLayers-truncated walk cannot parse the full layout
        // (dropped layer packets sit between resolutions) — reject
        // loudly rather than hand the decoder a layout it would misparse
        require(parts.length == 1,
          s"tile $isot: no PLT on a multi-tile-part tile — cannot assemble a quality slice")
        require(keepLayers == eff.layers,
          s"tile-part $isot has no PLT: cannot quality-truncate to $keepLayers of ${eff.layers} layers")
        val s = parts.head
        RangedTilePart(isot, Seq((s.pos, s.pos + s.len)), fullLen)
      } else {
        // the compacted slice: part-0 header, then every kept packet in
        // STREAM order across the parts. Packet gp of the tile is
        // [[packetOrder]] entry gp (any of the five A.6.1 orders since
        // r18 — the generator and [[decodeTileCore]] share one
        // sequence), and a packet is kept iff its layer index is under
        // keepLayers. Under RLCP the kept packets of a resolution are
        // one consecutive run; under RPCL/PCRL/CPRL they interleave per
        // precinct and the adjacent-range merge just yields more,
        // shorter ranges — same contract, same decoder.
        val order = packetOrder(eff, isot)
        val totalPackets = order.length
        val ranges = ArrayBuffer[(Long, Long)]((parts.head.pos, headers.head.bodyStart))
        def addRange(from: Long, until: Long): Unit = {
          val (lastFrom, lastUntil) = ranges.last
          if (lastUntil == from) ranges(ranges.length - 1) = (lastFrom, until)
          else ranges += ((from, until))
        }
        var gp = 0 // global packet index across the tile's parts
        for ((s, th) <- parts.zip(headers)) {
          var at = th.bodyStart
          val lens = th.plt
          for (len <- lens) {
            require(gp < totalPackets,
              s"tile $isot: PLT lists more than $totalPackets packets")
            if (order(gp).l < keepLayers) addRange(at, at + len)
            at += len
            gp += 1
          }
          require(at == s.pos + s.len,
            s"tile $isot part ${s.part}: PLT lengths end at $at, Psot says ${s.pos + s.len}")
        }
        require(gp == totalPackets,
          s"tile $isot: PLT lists $gp packets across its parts, expected $totalPackets")
        RangedTilePart(isot, ranges.toSeq, fullLen)
      }
    }.toSeq
    (hdr, out)
  }

  /** Inverse-DWT dependency margin, RESOLUTION-grid samples: a pixel in
    * the crop depends on level-l coefficients within radius <= 4 of the
    * crop's level-l footprint per lifting stage chain (9/7, the wider
    * filter; 5/3 needs 2), compounding down the pyramid as
    * R/2^l + 4 + 4/2 + ... < R/2^l + 8 in band coords — so 16 on the
    * resolution grid covers every band of every resolution. Shared by
    * [[tilePartsRegion]] and [[decodeTileRegion]]: the two MUST agree or
    * the compacted slice would misparse. */
  private val RegionMargin = 16

  /** Does precinct `p` of (tile dims tw x th at absolute (atx, aty),
    * resolution r) intersect the crop dilated by [[RegionMargin]]? */
  private def precinctInRegion(tw: Int, th: Int, nl: Int, r: Int, atx: Int, aty: Int,
      pp: Int, p: Int, cx0: Int, cy0: Int, cx1: Int, cy1: Int): Boolean = {
    val g = precGrid(tw, th, nl, r, atx, aty, pp)
    val px = g.p0x + p % g.npx; val py = g.p0y + p / g.npx
    val shift = nl - r
    val rx0 = (cx0 >> shift) - RegionMargin
    val ry0 = (cy0 >> shift) - RegionMargin
    val rx1 = ceilDiv(cx1, 1 << shift) + RegionMargin
    val ry1 = ceilDiv(cy1, 1 << shift) + RegionMargin
    (px << pp) < rx1 && rx0 < ((px + 1) << pp) &&
      (py << pp) < ry1 && ry0 < ((py + 1) << pp)
  }

  /** The SPATIAL axis of the ranged-fetch story at PRECINCT granularity
    * (what precincts exist for — B.6): per tile INTERSECTING the crop,
    * the byte ranges holding the first tile-part's header plus only the
    * packets of precincts whose resolution-grid rectangle intersects the
    * crop dilated by the inverse-DWT dependency margin — computed from
    * the PLT packet lengths, streamed header walk, never a body byte.
    * Tiles are transformed independently, so tile SELECTION needs no
    * margin; within a tile the margin makes the filtered decode
    * bit-exact inside the crop. Hand the concatenated ranges to
    * [[decodeTileRegion]] with the same crop. A crop of a precinct-
    * partitioned gigapixel page thus fetches the crop's fraction of
    * BYTES, not the tile's — tile-granular fetch ([[tileParts]] + span
    * filter, the l5l shape) is the degenerate pp = 15 case. Requires
    * PLT (this profile always writes it). */
  def tilePartsRegion(in: RangedInput, cx0: Int, cy0: Int, cx1: Int,
      cy1: Int): (Header, Seq[RangedTilePart]) = {
    val (hdr, spans) = tileParts(in)
    require(cx0 >= 0 && cy0 >= 0 && cx0 < cx1 && cy0 < cy1 &&
      cx1 <= hdr.width && cy1 <= hdr.height,
      s"crop [$cx0,$cx1)x[$cy0,$cy1) outside the ${hdr.width}x${hdr.height} image")
    val byTile = scala.collection.mutable.LinkedHashMap.empty[Int, ArrayBuffer[TilePartSpan]]
    for (s <- spans) byTile.getOrElseUpdate(s.index, ArrayBuffer.empty) += s
    val out = byTile.iterator.flatMap { case (isot, parts) =>
      val tx0 = (isot % hdr.ntx) * hdr.xt; val ty0 = (isot / hdr.ntx) * hdr.yt
      val tw = math.min(hdr.xt, hdr.width - tx0); val th = math.min(hdr.yt, hdr.height - ty0)
      if (!(tx0 < cx1 && cx0 < tx0 + tw && ty0 < cy1 && cy0 < ty0 + th)) None
      else {
        require(parts.map(_.part).toSeq == (0 until parts.length),
          s"tile $isot: tile-parts out of TPsot order or incomplete: ${parts.map(_.part).mkString(",")}")
        require(parts.length == parts.head.nparts,
          s"tile $isot: ${parts.length} tile-parts present, TNsot says ${parts.head.nparts}")
        val fullLen = parts.map(_.len).sum
        val headers = parts.map(s => tilePartHeader(in, s.pos))
        for (h2 <- headers.drop(1)) require(!h2.hasOverrides,
          s"tile $isot: COD/COC/QCD/QCC/POC outside the first tile-part not allowed (A.6)")
        require(headers.forall(_.ppt.isEmpty),
          s"tile $isot: PPT (packed packet headers) — ranged region walk unsupported; whole-file decode admits this stream")
        val eff = applyTileOverrides(hdr, headers.head)
        require(headers.forall(_.plt != null),
          s"tile $isot: no PLT — cannot region-truncate to precinct ranges")
        // packet gp's precinct comes from the shared [[packetOrder]]
        // sequence (any A.6.1 order since r18), replacing the former
        // RLCP-only index arithmetic
        val order = packetOrder(eff, isot)
        val totalPackets = order.length
        val ranges = ArrayBuffer[(Long, Long)]((parts.head.pos, headers.head.bodyStart))
        def addRange(from: Long, until: Long): Unit = {
          val (lastFrom, lastUntil) = ranges.last
          if (lastUntil == from) ranges(ranges.length - 1) = (lastFrom, until)
          else ranges += ((from, until))
        }
        var gp = 0
        for ((s, h2) <- parts.zip(headers)) {
          var at = h2.bodyStart
          val lens = h2.plt
          for (len <- lens) {
            require(gp < totalPackets, s"tile $isot: PLT lists more than $totalPackets packets")
            val k = order(gp)
            if (precinctInRegion(tw, th, eff.levelsFor(k.c), k.r, tx0, ty0,
                eff.pp, k.p, cx0, cy0, cx1, cy1)) addRange(at, at + len)
            at += len
            gp += 1
          }
          require(at == s.pos + s.len,
            s"tile $isot part ${s.part}: PLT lengths end at $at, Psot says ${s.pos + s.len}")
        }
        require(gp == totalPackets,
          s"tile $isot: PLT lists $gp packets across its parts, expected $totalPackets")
        Some(RangedTilePart(isot, ranges.toSeq, fullLen))
      }
    }.toSeq
    (hdr, out)
  }

  /** Decode ONE tile from a COMPACTED region slice (the concatenated
    * bytes of [[tilePartsRegion]]'s ranges) — the packet walk visits
    * exactly the precincts the walker kept (same crop, same margin), so
    * the slice is consumed to the last byte; coefficients of skipped
    * precincts stay zero, and the [[RegionMargin]] dependency bound
    * makes every pixel INSIDE the crop bit-exact (outside it, margin
    * pixels decay — callers clip to the crop). */
  def decodeTileRegion(slice: Array[Byte], hdr: Header, cx0: Int, cy0: Int,
      cx1: Int, cy1: Int): Tile = {
    val sot = parseSliceSot(slice)
    require(sot.part == 0, "compacted region slice must start at tile-part 0")
    val tx0 = (sot.isot % hdr.ntx) * hdr.xt; val ty0 = (sot.isot / hdr.ntx) * hdr.yt
    val tw = math.min(hdr.xt, hdr.width - tx0); val th = math.min(hdr.yt, hdr.height - ty0)
    val body = java.util.Arrays.copyOfRange(slice, sot.bodyStart, slice.length)
    val eff = applyTileOverrides(hdr, sot.head)
    decodeTileCore(sot.isot, body, eff, 0, eff.layers, exact = true,
      keepPrec = (r, c, p) => precinctInRegion(tw, th, eff.levelsFor(c), r,
        tx0, ty0, eff.pp, p, cx0, cy0, cx1, cy1))
  }

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** Parsed tile-part header: offset just past SOD, PLT packet lengths
    * (null if no PLT), and the raw override marker bodies (r18b —
    * per-tile COD/QCD/COC/QCC, legal only in a tile's FIRST tile-part
    * per A.6.1-A.6.5; resolved against the main header by
    * [[applyTileOverrides]]). */
  private[jp2] final case class TileHead(bodyStart: Long, plt: Array[Int],
      cod: Option[Array[Byte]], coc: Seq[Array[Byte]],
      qcd: Option[Array[Byte]], qcc: Seq[Array[Byte]],
      poc: Option[Array[Byte]] = None,
      ppt: Seq[(Int, Array[Byte])] = Nil) {
    // ppt (r19, A.7.5) is NOT an A.6 override — it may legally ride any
    // tile-part of the tile — so it stays outside hasOverrides
    def hasOverrides: Boolean =
      cod.nonEmpty || coc.nonEmpty || qcd.nonEmpty || qcc.nonEmpty || poc.nonEmpty
  }

  /** Walk the tile-part header segments between the 12-byte SOT and SOD.
    * COM is skipped; per-tile COD/COC/QCD/QCC override markers are
    * COLLECTED (admitted since r18b) for [[applyTileOverrides]];
    * anything else is rejected loudly. Ranged reads: 4 bytes per marker
    * plus each parsed payload, never the tile body. */
  private def tilePartHeader(in: RangedInput, pos: Long): TileHead = {
    var p = pos + 12
    var lens: Array[Int] = null
    var codB: Option[Array[Byte]] = None
    var qcdB: Option[Array[Byte]] = None
    var pocB: Option[Array[Byte]] = None
    val pptB = ArrayBuffer.empty[(Int, Array[Byte])]
    val cocB = ArrayBuffer.empty[Array[Byte]]
    val qccB = ArrayBuffer.empty[Array[Byte]]
    var marker = readU16(in, p)
    while (marker != 0xFF93) {
      require((marker >> 8) == 0xFF, f"bad marker at $p%d: $marker%04x")
      val lseg = readU16(in, p + 2)
      require(lseg >= 2, s"marker segment length $lseg at $p too short")
      def seg(min: Int): Array[Byte] = {
        require(lseg - 2 >= min,
          f"marker $marker%04x payload ${lseg - 2} B at $p shorter than the $min B its fields need")
        in.read(p + 4, lseg - 2)
      }
      marker match {
        case 0xFF58 => // PLT: Zplt then big-endian 7-bit varints, one per packet
          val body = seg(1)
          require(body(0) == 0, "split PLT (Zplt != 0) not supported")
          val buf = ArrayBuffer.empty[Int]
          var i = 1
          var v = 0
          while (i < body.length) {
            val x = body(i) & 0xFF
            v = (v << 7) | (x & 0x7F)
            if ((x & 0x80) == 0) { buf += v; v = 0 }
            i += 1
          }
          lens = buf.toArray
        case 0xFF52 =>
          require(codB.isEmpty, "duplicate tile-part COD")
          codB = Some(seg(10))
        case 0xFF53 => cocB += seg(7)
        case 0xFF5C =>
          require(qcdB.isEmpty, "duplicate tile-part QCD")
          qcdB = Some(seg(1))
        case 0xFF5D => qccB += seg(2)
        case 0xFF5F => // POC (r19): tile progression override, stashed
          require(pocB.isEmpty, "duplicate tile-part POC")
          pocB = Some(seg(7))
        case 0xFF61 => // PPT (r19): packed packet headers, Zppt + payload
          val b = seg(1)
          pptB += ((b(0) & 0xFF, java.util.Arrays.copyOfRange(b, 1, b.length)))
        case 0xFF64 => () // COM: informational, skip
        case m => throw new IllegalArgumentException(
          f"tile-part header marker $m%04x not supported")
      }
      p += 2 + lseg
      marker = readU16(in, p)
    }
    TileHead(p + 2, lens, codB, cocB.toSeq, qcdB, qccB.toSeq, pocB, pptB.toSeq)
  }

  /** Resolve one tile's EFFECTIVE header from the main header and its
    * first tile-part's override markers — the A.6 precedence rules:
    * coding, per component: tile COC > tile COD > main COC > main COD;
    * quantization, per component: tile QCC > tile QCD > main QCC >
    * main QCD (a tile QCD beats a MAIN QCC — the precedence real
    * decoders get wrong first). A tile COD may retune the progression,
    * layer count and block style; the geometry the ranged walkers
    * share (levels, code-blocks, precincts, transform, MCT) must match
    * the main header's — typed rejections otherwise. */
  private[jp2] def applyTileOverrides(hdr: Header, th: TileHead): Header = {
    if (!th.hasOverrides) return hdr
    var eff = hdr
    for (b <- th.cod) {
      val scod = b(0) & 0xFF
      require((scod & ~0x07) == 0, f"tile COD Scod options $scod%02x not supported")
      val prog = b(1) & 0xFF
      require(prog >= LRCP && prog <= CPRL, s"tile COD progression order $prog not supported")
      val layers = beU16(b, 2)
      require(layers >= 1, "tile COD: zero quality layers")
      require(((b(4) & 0xFF) == 1) == hdr.useRct,
        "tile COD toggles the MCT — not supported")
      require((b(5) & 0xFF) == hdr.levels,
        s"tile COD decomposition levels ${b(5) & 0xFF} differ from the main header's ${hdr.levels} — not supported")
      require((b(6) & 0xFF) == CodeBlockExp - 2 && (b(7) & 0xFF) == CodeBlockExp - 2,
        "tile COD: only 64x64 code-blocks")
      val style = b(8) & 0xFF
      require((style & ~0x3F) == 0, f"tile COD code-block style $style%02x not supported")
      require((b(9) & 0xFF) == (if (hdr.irreversible) 0 else 1),
        "tile COD transform differs from the main header's — not supported")
      val pe =
        if ((scod & 1) != 0) {
          require(b.length == 10 + hdr.levels + 1,
            s"tile COD payload ${b.length} B != ${10 + hdr.levels + 1} B with explicit precincts")
          val p0 = b(10) & 0x0F
          require((0 to hdr.levels).forall { i =>
            val v = b(10 + i) & 0xFF
            (v & 0x0F) == p0 && (v >> 4) == p0
          }, "tile COD: non-uniform or non-square precinct sizes not supported")
          p0
        } else { require(b.length == 10, s"tile COD payload ${b.length} B != 10 B"); 15 }
      require(pe == hdr.pp,
        s"tile COD precinct exponent $pe differs from the main header's ${hdr.pp} — not supported")
      require(((scod & 2) != 0) == hdr.sop && ((scod & 4) != 0) == hdr.eph,
        "tile COD toggles SOP/EPH — not supported")
      eff = eff.copy(prog = prog, layers = layers, blockStyle = style)
    }
    // tile COC: per-component coding for THIS tile (beats tile COD)
    val tileCoc = th.coc.map(parseCocBody(_, hdr.nc, hdr.pp, hdr.irreversible))
    require(tileCoc.map(_._1).distinct.size == tileCoc.size, "duplicate tile COC for one component")
    if (th.cod.nonEmpty || tileCoc.nonEmpty) {
      // STRICT A.6 precedence: a tile COD shadows every main COC (a
      // main-COC'd component without a tile COC reverts to the tile
      // COD's parameters wholesale — levels included); a tile COC wins
      // outright over both
      val base = if (th.cod.nonEmpty) Map.empty[Int, CompCoding] else hdr.coc
      eff = eff.copy(coc = base ++ tileCoc.toMap)
    }
    // quantization precedence: tile QCC > tile QCD > main QCC > main QCD
    def lvlOf(c: Int): Int = eff.levelsFor(c)
    val tileQcd = th.qcd.map(b => (parseQuantSeg(b, 0, "tile QCD", hdr.levels, hdr.irreversible), b(0) & 0x1F))
    val tileQcc: Map[Int, Quant] = th.qcc.map { b =>
      val c = b(0) & 0xFF
      require(c < hdr.nc, s"tile QCC component $c out of range (Csiz ${hdr.nc})")
      c -> parseQuantSeg(b, 1, s"tile QCC(c=$c)", lvlOf(c), hdr.irreversible)
    }.toMap
    require(tileQcc.size == th.qcc.size, "duplicate tile QCC for one component")
    if (tileQcd.nonEmpty || tileQcc.nonEmpty) {
      val (baseQ, baseStyle) = tileQcd.getOrElse((eff.q, if (hdr.irreversible) 2 else 0))
      // with a tile QCD present, main QCCs are out-ranked for every
      // component; without one they remain the fallback under tile QCCs
      val qccBase = if (tileQcd.nonEmpty) Map.empty[Int, Quant] else eff.qcc
      val qccEff = resolveQuantSizing(hdr.nc, hdr.levels, eff.coc, baseQ, baseStyle,
        qccBase ++ tileQcc, hdr.irreversible, "tile-part header")
      eff = eff.copy(quant = baseQ, qcc = qccEff)
    } else if (th.cod.nonEmpty || tileCoc.nonEmpty)
      // the effective coc map changed (a tile COD clears main COCs, a
      // tile COC re-levels a component) with no tile quant markers to
      // re-signal sizing — main quant entries may now be sized for the
      // wrong pyramid depth; re-validate instead of indexing past an
      // eps vector at decode
      eff = eff.copy(qcc = resolveQuantSizing(hdr.nc, hdr.levels, eff.coc, eff.q,
        if (hdr.irreversible) 2 else 0, eff.qcc, hdr.irreversible, "tile-part header"))
    // tile POC (A.6.6): a tile-part POC REPLACES the main header's POC
    // (and the COD progression) for this tile's packet sequence
    for (b <- th.poc)
      eff = eff.copy(poc = parsePocBody(b, hdr.nc, "tile-part header"))
    eff.copy(qShift = if (hdr.irreversible) eff.qFor(0).eps(0) - hdr.prec else 0)
  }

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Raw codestream passthrough, or walk the JP2 boxes to jp2c; returns
    * the codestream's absolute [start, end) within the input. Ranged
    * reads: 8 bytes per box header. */
  private[jp2] def codestreamSpan(in: RangedInput): Option[(Long, Long)] = {
    if (in.length < 12) {
      if (in.length >= 2) {
        val h2 = in.read(0, 2)
        if ((h2(0) & 0xFF) == 0xFF && (h2(1) & 0xFF) == 0x4F) return Some((0L, in.length))
      }
      return None
    }
    val sig = in.read(0, 12)
    if ((sig(0) & 0xFF) == 0xFF && (sig(1) & 0xFF) == 0x4F)
      return Some((0L, in.length))
    if (beU32(sig, 0) != 12L || beU32(sig, 4) != 0x6a502020L) return None
    var from = 12L
    while (from + 8 <= in.length) {
      val bh = in.read(from, 8)
      val len0 = beU32(bh, 0)
      val typ = beU32(bh, 4)
      val len = if (len0 == 0L) in.length - from else len0
      if (len0 == 1L || len < 8L || from + len > in.length) return None
      if (typ == 0x6a703263L) // jp2c
        return Some((from + 8, from + len))
      from += len
    }
    None
  }

  private[jp2] def extractCodestream(b: Array[Byte]): Option[Array[Byte]] =
    codestreamSpan(new BytesInput(b)).map { case (s, e) =>
      java.util.Arrays.copyOfRange(b, s.toInt, e.toInt)
    }

  /** Main-header markers that are informational and safely skippable:
    * TLM/PLM (pointer hints), CRG (registration hint), COM (comment).
    * Everything else unknown is REJECTED — in particular the spec's
    * segment-less marker range 0xFF30-0xFF3F, which carries no length
    * field: "skip by length" would read payload bytes as a length and
    * walk into garbage. Reject what we do not implement, never guess. */
  private val SkippableMainMarkers = Set(0xFF55, 0xFF57, 0xFF63, 0xFF64)

  /** Parse the main header (SOC .. first SOT) of a codestream or JP2
    * container; returns the [[Header]], the first SOT's absolute offset,
    * and the codestream's end offset (the jp2c box end for a container —
    * the bound the Psot walk must stay inside). Ranged reads: 4 bytes per
    * marker plus each parsed segment's payload — a split task over a
    * gigabyte file reads a few hundred bytes here, never the file. */
  private def parseMainHeader(in: RangedInput): (Header, Long, Long) = {
    val (start, csEnd) = codestreamSpan(in).getOrElse(
      throw new IllegalArgumentException("not a JPEG 2000 codestream or JP2 container"))
    require(readU16(in, start) == 0xFF4F, "missing SOC")

    var w = 0; var h = 0; var nc = 0; var xt = 0; var yt = 0
    var useRct = false; var levels = -1; var layersV = 1
    var irrev = false
    var ppV = 15; var sopV = false; var ephV = false
    var blockStyleV = 0
    var progV = RLCP
    var precV = 8
    // QCD is validated AFTER the loop: its per-band shape needs `levels`
    // and the transform, and the spec fixes no marker order within the
    // main header
    var qcdBody: Array[Byte] = null
    var pocBody: Array[Byte] = null
    val qccBodies = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val cocBodies = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = start + 2
    var atSot = false
    while (!atSot) {
      val marker = readU16(in, pos)
      require((marker >> 8) == 0xFF, f"bad marker at $pos%d: $marker%04x")
      marker match {
        case 0xFF90 => // SOT
          atSot = true
        case 0xFFD9 =>
          throw new IllegalArgumentException("EOC before any tile")
        case m if m >= 0xFF30 && m <= 0xFF3F =>
          throw new IllegalArgumentException(
            f"segment-less marker $m%04x in main header not supported")
        case m =>
          val lseg = readU16(in, pos + 2)
          require(lseg >= 2, s"marker segment length $lseg at $pos too short")
          // segment payload after the 2-byte length field, with the
          // marker's own minimum length enforced as the same typed
          // contract as every other malformed-input path — fixed-offset
          // reads below must never surface a raw index error
          def body(min: Int): Array[Byte] = {
            require(lseg - 2 >= min,
              f"marker $m%04x payload ${lseg - 2} B at $pos shorter than the $min B its fields need")
            in.read(pos + 4, lseg - 2)
          }
          m match {
            case 0xFF51 => // SIZ: Rsiz X Y XO YO XT YT XTO YTO Csiz comps
              val b = body(36)
              def u32(i: Int): Long = beU32(b, i)
              val xo = u32(10); val yo = u32(14)
              require(xo == 0 && yo == 0 && u32(26) == 0 && u32(30) == 0,
                "nonzero image/tile origin not supported")
              w = u32(2).toInt; h = u32(6).toInt
              xt = u32(18).toInt; yt = u32(22).toInt
              require(xt > 0 && yt > 0, "empty tile grid")
              nc = beU16(b, 34)
              require(nc == 1 || nc == 3, s"unsupported component count $nc")
              require(b.length >= 36 + 3 * nc,
                s"SIZ payload ${b.length} B lists $nc components but is too short for them")
              // Ssiz: bit 7 flags SIGNED samples (rejected — the DC
              // shift/clamp pipeline is unsigned); low bits = depth-1.
              // 8..16-bit unsigned admitted since r18c, uniform across
              // components (mixed depths would fork the RCT/clamp per
              // component — typed rejection, not a real archival shape)
              for (c <- 0 until nc) {
                val sb = b(36 + 3 * c) & 0xFF
                require((sb & 0x80) == 0, "signed components not supported")
                val d = (sb & 0x7F) + 1
                require(d >= 8 && d <= 16, s"component depth $d out of 8..16 bits")
                require(d == (b(36) & 0x7F) + 1,
                  "mixed per-component bit depths not supported")
                require(b(37 + 3 * c) == 1 && b(38 + 3 * c) == 1, "no subsampling")
              }
              precV = (b(36) & 0x7F) + 1
            case 0xFF52 => // COD: Scod SGcod(prog layers mct) SPcod [+precincts]
              val b = body(10)
              val scod = b(0) & 0xFF
              // bit 0 = explicit precinct sizes, bit 1 = SOP, bit 2 = EPH;
              // anything above is outside Part 1 — reject, don't guess
              require((scod & ~0x07) == 0, f"Scod options $scod%02x not supported")
              // all five Part-1 progression orders are admitted on
              // whole-file decode since r18 (the packet walk follows
              // [[packetOrder]]); the byte-prefix REDUCED walkers
              // additionally require a resolution-major order and
              // reject the rest with their own typed error
              progV = b(1) & 0xFF
              require(progV >= LRCP && progV <= CPRL,
                s"progression order $progV not supported (LRCP/RLCP/RPCL/PCRL/CPRL)")
              layersV = beU16(b, 2)
              require(layersV >= 1, "zero quality layers")
              useRct = (b(4) & 0xFF) == 1
              levels = b(5) & 0xFF
              require((b(6) & 0xFF) == CodeBlockExp - 2 && (b(7) & 0xFF) == CodeBlockExp - 2,
                "only 64x64 code-blocks")
              blockStyleV = b(8) & 0xFF
              // r17: selective bypass (0x01), RESET (0x02), per-pass
              // termination (0x04), vertically-causal (0x08) and
              // segmentation symbols (0x20) are all in the profile —
              // bypass/termination codewords are multi-segment and the
              // packet parser reads one length per segment. Predictable
              // termination (0x10) is TOLERATED on decode: the option
              // constrains only the ENCODER's choice of spare bits at
              // each flush (C.2.10) so that resilient decoders MAY
              // detect errors — the decoding procedure is identical,
              // and this decoder simply doesn't exploit the detection
              // opportunity (the same stance OpenJPEG takes). This
              // encoder never writes it. The Header keeps the RAW
              // signaled style (diagnostics must reflect the stream);
              // the 0x10 bit is masked off where Tier-1 consumes the
              // options ([[tier1Style]]) so the segment layout and pass
              // machinery see only the bits that change behavior.
              require((blockStyleV & ~0x3F) == 0,
                f"code-block style options $blockStyleV%02x not supported")
              val transform = b(9) & 0xFF
              require(transform == 0 || transform == 1,
                s"unknown wavelet transform $transform")
              irrev = transform == 0 // 0 = irreversible 9/7, 1 = reversible 5/3
              sopV = (scod & 2) != 0
              ephV = (scod & 4) != 0
              if ((scod & 1) != 0) {
                // one precinct-size byte per resolution (PPy<<4 | PPx).
                // This profile decodes UNIFORM SQUARE precincts (the
                // common archival shape) — per-resolution or rectangular
                // sizes are rejected loudly rather than walked wrong.
                require(b.length == 10 + levels + 1,
                  s"COD payload ${b.length} B != ${10 + levels + 1} B with explicit precincts")
                val pe = b(10) & 0x0F
                require((0 to levels).forall { i =>
                  val v = b(10 + i) & 0xFF
                  (v & 0x0F) == pe && (v >> 4) == pe
                }, "non-uniform or non-square precinct sizes not supported")
                require(pe >= 1 && pe <= 15, s"precinct exponent $pe out of 1..15")
                ppV = pe
              } else {
                require(b.length == 10, s"COD payload ${b.length} B != 10 B")
                ppV = 15
              }
            case 0xFF53 => // COC (r18b) — per-component coding, stashed
              cocBodies += body(7)
            case 0xFF5C => // QCD — stashed, validated once levels are known
              qcdBody = body(1)
            case 0xFF5D => // QCC (r17) — per-component override, stashed too
              qccBodies += body(2)
            case 0xFF5F => // POC (r19) — progression order change, stashed
              require(pocBody == null, "duplicate POC in main header (A.6.6)")
              pocBody = body(7)
            case 0xFF60 => throw new IllegalArgumentException(
              "PPM (packed packet headers in the MAIN header) not supported — " +
                "it makes every tile-part non-self-describing and collapses the " +
                "ranged split's byte contract (see COVERAGE; tile-local PPT is admitted)")
            case mm if SkippableMainMarkers(mm) => () // informational, skip by length
            case mm => throw new IllegalArgumentException(
              f"main header marker $mm%04x not supported")
          }
          pos += 2 + lseg
      }
    }
    require(w > 0 && h > 0 && nc > 0 && levels >= 0, "incomplete header")
    require(qcdBody != null, "missing QCD marker")
    // COC (A.6.2, r18b) — per-component decomposition levels and block
    // style, every other axis pinned to the COD's; parsed before the
    // quantization so QCC sizing can follow each component's own level
    // count
    val cocV: Map[Int, CompCoding] = {
      val pairs = cocBodies.map(parseCocBody(_, nc, ppV, irrev))
      require(pairs.map(_._1).distinct.size == pairs.length,
        "duplicate COC for one component")
      pairs.toMap
    }
    def levelsOfC(c: Int): Int = cocV.get(c).map(_.levels).getOrElse(levels)
    val quantV = parseQuantSeg(qcdBody, 0, "QCD", levels, irrev)
    // QCC (A.6.5): per-component quantization overrides — the common
    // archival RGB shape quantizes chroma coarser than luma; a COC'd
    // component's QCC is sized for ITS OWN subband count
    val qccV0: Map[Int, Quant] = qccBodies.map { b =>
      val c = b(0) & 0xFF
      require(c < nc, s"QCC component $c out of range (Csiz $nc)")
      c -> parseQuantSeg(b, 1, s"QCC(c=$c)", levelsOfC(c), irrev)
    }.toMap
    require(qccV0.size == qccBodies.length, "duplicate QCC for one component")
    val qccV = resolveQuantSizing(nc, levels, cocV, quantV, qcdBody(0) & 0x1F,
      qccV0, irrev, "main header")
    // LL step exponent offset — the uniform-profile knob the staged
    // queries assert on; well-defined for every stream (it is simply
    // component 0's eps_LL - Prec), equal to the encoder's qShift on
    // uniform streams
    val qShiftV = if (irrev) qccV.getOrElse(0, quantV).eps(0) - precV else 0
    val pocV = if (pocBody == null) Nil else parsePocBody(pocBody, nc, "main header")
    val hdr = Header(w, h, nc, xt, yt, useRct, levels, layersV, irrev, qShiftV,
      ppV, sopV, ephV, quantV, blockStyleV, qccV, progV, cocV, precV, pocV)
    val maxL = (0 until nc).map(hdr.levelsFor).max
    require(hdr.ntx * hdr.nty == 1 || (xt % (1 << maxL) == 0 && yt % (1 << maxL) == 0),
      s"multi-tile grid with tile dims not multiples of 2^$maxL (absolute-" +
        "parity subband geometry) not supported")
    (hdr, pos, csEnd)
  }

  /** Parse one quantization segment body sized for `lvl` decomposition
    * levels (QCD at off 0; QCC at off 1, past Cqcc) — any spec-legal
    * scalar shape since r17 (Annex E): style 0 with the 5/3 transform
    * (exponents feed only Mb), style 1 derived or style 2 expounded
    * with the 9/7 — per-band (eps, mu) with
    * Delta_b = 2^(Prec + gain - eps)(1 + mu/2^11) and Mb = eps+G-1.
    * Lengths are checked EXACTLY: trailing garbage inside the segment
    * is rejected, not silently accepted — the same "reject loudly
    * rather than guess" contract as every other malformed-header path. */
  private def parseQuantSeg(body: Array[Byte], off: Int, what: String,
      lvl: Int, irrev: Boolean): Quant = {
    val guard = (body(off) & 0xFF) >> 5
    require(guard >= 1 && guard <= 7, s"guard bits $guard out of 1..7")
    val style = body(off) & 0x1F
    val nBands = 3 * lvl + 1
    val payload = body.length - off
    val q: Quant =
      if (!irrev) {
        require(style == 0, s"quantization style $style with the 5/3 transform not supported")
        require(payload == 1 + nBands,
          s"$what payload $payload B != ${1 + nBands} B for $nBands subbands (style 0)")
        val eps = Vector.tabulate(nBands)(i => ((body(off + 1 + i) & 0xFF) >> 3))
        Quant(guard, eps, Vector.fill(nBands)(0))
      } else if (style == 1) {
        require(payload == 3,
          s"$what payload $payload B != 3 B (style 1 signals one value)")
        val v = beU16(body, off + 1)
        Quant.derived(lvl, guard, (v >> 11) & 0x1F, v & 0x7FF)
      } else {
        require(style == 2, s"quantization style $style with the 9/7 transform not supported")
        require(payload == 1 + 2 * nBands,
          s"$what payload $payload B != ${1 + 2 * nBands} B for $nBands subbands (style 2)")
        val vs = Vector.tabulate(nBands)(i => beU16(body, off + 1 + 2 * i))
        Quant(guard, vs.map(v => (v >> 11) & 0x1F), vs.map(_ & 0x7FF))
      }
    for (i <- 0 until nBands) {
      require(q.eps(i) >= 1 && q.eps(i) <= 31,
        s"$what quantizer exponent ${q.eps(i)} of band $i out of 1..31")
      require(q.mb(i) >= 1 && q.mb(i) <= 30,
        s"$what Mb ${q.mb(i)} of band $i out of 1..30 (eps=${q.eps(i)}, G=$guard)")
    }
    q
  }

  /** Parse one COC body (A.6.2): Ccoc, Scoc, SPcoc — the axes this
    * profile lets a COC change are decomposition levels and block
    * style; code-block size, transform and precinct shape must match
    * the COD (typed rejections — the packet geometry the ranged
    * walkers share would otherwise fork per component). */
  /** Parse a POC segment body (A.6.6, Table A-32): 7 bytes per entry
    * with Csiz < 257 — RSpoc(1) CSpoc(1) LYEpoc(2) REpoc(1) CEpoc(1)
    * Ppoc(1). Validation is the spec's own loop bounds: the B.12.1.7
    * iterations clamp REpoc/CEpoc to what exists (so an REpoc of 33
    * over a 5-level stream is legal and means "all"), but an EMPTY
    * volume or a backwards range is an authoring error — rejected.
    * CEpoc = 0 is rejected outright: Table A-32 gives the 1-byte form a
    * 1..255 range (the "0 means 256" reading is an encoder-convention
    * leniency this profile does not extend — with Csiz <= 3 such a
    * stream would be out of range either way). */
  private def parsePocBody(b: Array[Byte], nc: Int, what: String): Seq[PocEntry] = {
    require(b.length % 7 == 0 && b.length >= 7,
      s"$what POC payload ${b.length} B is not a positive multiple of 7 (one-byte component form)")
    (0 until b.length / 7).map { i =>
      val o = i * 7
      val rs = b(o) & 0xFF
      val cs = b(o + 1) & 0xFF
      val lye = beU16(b, o + 2)
      val re = b(o + 4) & 0xFF
      val ce = b(o + 5) & 0xFF
      require(ce >= 1, s"$what POC entry $i: CEpoc 0 outside Table A-32's 1..255 range")
      val pr = b(o + 6) & 0xFF
      require(pr >= LRCP && pr <= CPRL, s"$what POC entry $i progression $pr not supported")
      require(rs < re && re <= 33, s"$what POC entry $i resolutions [$rs, $re) invalid")
      require(cs < ce && cs < nc, s"$what POC entry $i components [$cs, $ce) empty for Csiz $nc")
      require(lye >= 1, s"$what POC entry $i: zero layers")
      PocEntry(rs, cs, lye, re, ce, pr)
    }
  }

  private def parseCocBody(b: Array[Byte], nc: Int, codPp: Int,
      codIrrev: Boolean): (Int, CompCoding) = {
    val c = b(0) & 0xFF
    require(c < nc, s"COC component $c out of range (Csiz $nc)")
    val scoc = b(1) & 0xFF
    require((scoc & ~0x01) == 0, f"Scoc options $scoc%02x not supported")
    val lv = b(2) & 0xFF
    require((b(3) & 0xFF) == CodeBlockExp - 2 && (b(4) & 0xFF) == CodeBlockExp - 2,
      "COC: only 64x64 code-blocks")
    val style = b(5) & 0xFF
    require((style & ~0x3F) == 0, f"COC code-block style options $style%02x not supported")
    val transform = b(6) & 0xFF
    require(transform == 0 || transform == 1, s"COC: unknown wavelet transform $transform")
    require((transform == 0) == codIrrev,
      "COC transform differs from the COD's — mixed transforms per component not supported")
    val pe =
      if ((scoc & 1) != 0) {
        require(b.length == 7 + lv + 1,
          s"COC payload ${b.length} B != ${7 + lv + 1} B with explicit precincts")
        val p0 = b(7) & 0x0F
        require((0 to lv).forall { i =>
          val v = b(7 + i) & 0xFF
          (v & 0x0F) == p0 && (v >> 4) == p0
        }, "COC: non-uniform or non-square precinct sizes not supported")
        require(p0 >= 1 && p0 <= 15, s"COC precinct exponent $p0 out of 1..15")
        p0
      } else {
        require(b.length == 7, s"COC payload ${b.length} B != 7 B")
        15
      }
    require(pe == codPp,
      s"COC precinct exponent $pe differs from the COD's $codPp — per-component precincts not supported")
    (c, CompCoding(lv, style))
  }

  /** The COC/quantization sizing rule: a component whose decomposition
    * level count differs from the QCD's sizing has an ambiguous band
    * mapping onto the QCD's eps list, so it needs its OWN QCC — except
    * under a style-1 (derived) QCD, whose E-5 expansion is naturally
    * per-component. Returns the qcc map with derived expansions
    * synthesized in; rejects typed otherwise. */
  private def resolveQuantSizing(nc: Int, codLevels: Int,
      coc: Map[Int, CompCoding], quant: Quant, qcdStyle: Int,
      qcc: Map[Int, Quant], irrev: Boolean, what: String): Map[Int, Quant] = {
    var out = qcc
    for (c <- 0 until nc) {
      val lc = coc.get(c).map(_.levels).getOrElse(codLevels)
      // a quant entry sized for a different pyramid depth (e.g. a main
      // QCC surviving a tile COD that cleared the main COCs) would index
      // past its eps vector at decode — typed rejection, never an IOOBE
      out.get(c).foreach { q =>
        require(q.eps.length == 3 * lc + 1,
          s"$what: component $c QCC signals ${(q.eps.length - 1) / 3} decomposition levels " +
            s"but the effective coding signals $lc — needs a re-signaled QCC")
      }
      if (lc != codLevels && !out.contains(c)) {
        if (irrev && qcdStyle == 1)
          out += c -> Quant.derived(lc, quant.guard, quant.eps(0), quant.mu(0))
        else throw new IllegalArgumentException(
          s"$what: component $c has COC decomposition levels $lc but the QCD is sized for $codLevels levels — needs a QCC")
      }
    }
    out
  }

  /** Decode one tile from its concatenated packet BODY (all slices'
    * tile-part headers already stripped) and run the tile-local inverse
    * transform chain. `discard` > 0 decodes only resolutions
    * 0..levels-discard and never reads past their packets — legal
    * because the subband geometry nests: the reduced Mallat array
    * (ceil(tw/2^d) x ceil(th/2^d), levels-d decompositions) has
    * byte-for-byte the band layout of the full array's top-left corner,
    * so the SAME packet walk runs with reduced dims. `exact` asserts the
    * walk consumed the body to the last byte (full decodes and compacted
    * quality slices); prefix decodes assert it stayed inside. */
  private def decodeTileCore(isot: Int, body: Array[Byte], hdr: Header, discard: Int,
      keepLayers: Int, exact: Boolean,
      keepPrec: (Int, Int, Int) => Boolean = null,
      packedHdrs: Array[Byte] = null): Tile = {
    // PPT (r19): header bits come from the packed stream, bodies from
    // the bitstream. Skipping packets is UNSOUND under PPT (the packed
    // stream still carries the skipped packets' headers and the parse
    // is stateful), so every truncating walk is a typed rejection —
    // whole-file decode only.
    require(packedHdrs == null ||
      (discard == 0 && keepLayers >= hdr.layers && keepPrec == null),
      "PPT (packed packet headers): reduced/quality/region truncation unsupported — whole-file decode admits this stream")
    require(discard >= 0 && discard <= hdr.minLevels,
      s"discard $discard out of 0..${hdr.minLevels}")
    // a discard-truncated body drops each component's own finest
    // resolutions, which form a byte SUFFIX only when every component
    // shares the COD's level count (a COC'd component's top packets
    // sit inside a lower global resolution group) — typed, like the
    // progression-order rule below
    require(discard == 0 || hdr.uniformLevels,
      "reduced (discard > 0) decode of a stream with per-component COC decomposition levels not supported")
    require(keepLayers >= 1, s"keepLayers $keepLayers out of range")
    val keep = math.min(hdr.layers, keepLayers)
    require(isot < hdr.ntx * hdr.nty, s"tile index $isot out of grid")
    val x0 = (isot % hdr.ntx) * hdr.xt; val y0 = (isot / hdr.ntx) * hdr.yt
    val tw = math.min(hdr.xt, hdr.width - x0); val th = math.min(hdr.yt, hdr.height - y0)
    // reduced-grid placement: exact because multi-tile grids require
    // xt/yt multiples of 2^levels >= 2^discard (single tiles sit at 0)
    val rx0 = x0 >> discard; val ry0 = y0 >> discard
    val rw = ceilDiv(tw, 1 << discard); val rh = ceilDiv(th, 1 << discard)
    // per-component reduced level count (COC, r18b): component c keeps
    // its own pyramid minus the discarded top — same output dims for
    // every component because each drops d of ITS finest resolutions
    def rlOf(c: Int): Int = hdr.levelsFor(c) - discard
    val tile = Array.fill(hdr.nc)(new Array[Int](rw * rh))
    // per-coefficient decoded bit-plane depth, tracked only when a LOSSY
    // stream is quality-truncated: dropped layers leave low bit-planes
    // undecoded, so the dequantizer below must widen its mid-point to the
    // effective step delta·2^depth — at keep == layers every depth is 0
    // and the reconstruction is the familiar (|q|+0.5)·delta
    val quantDepth =
      if (hdr.irreversible && keep < hdr.layers) Array.fill(hdr.nc)(new Array[Int](rw * rh))
      else null
    // a discard-truncated body is the stream's byte PREFIX, which drops
    // exactly the r > rl packets only when resolution is the outermost
    // axis — reject the other orders here with the decode-side typed
    // error (the ranged walker has its own)
    require(discard == 0 || resMajor(hdr.prog, hdr.layers),
      s"progression order ${hdr.prog} is not resolution-major: reduced (discard > 0) decode needs RLCP/RPCL (or 1-layer LRCP)")
    // a POC stream's packet sequence follows its progression volumes,
    // not one global order — the byte-prefix argument above has no
    // analogue, so reduced decode is a typed RANGED-style rejection
    // while whole-file decode (discard 0) admits POC
    require(discard == 0 || hdr.poc.isEmpty,
      "POC (progression order change): reduced (discard > 0) decode unsupported — the kept packets are not a byte prefix; whole-file decode admits this stream")
    // packet walk in the header's progression order — the SAME
    // [[packetOrder]] sequence the encoder emitted and the ranged
    // walkers kept, filtered identically (layers beyond `keep` and
    // precincts outside `keepPrec` were removed from the body by the
    // compacting walker, so skipping them here keeps the two aligned).
    // The reduced geometry reproduces the full stream's precinct grid
    // exactly (origins and dims all scale by 2^discard), so generating
    // the order from the reduced dims yields the surviving prefix.
    val decs = Array.tabulate(hdr.nc)(c => Array.tabulate(rlOf(c) + 1)(r =>
      new ResDecoder(rw, rh, rlOf(c), r,
        hdr.qFor(c), rx0, ry0, hdr.pp, hdr.sop, hdr.eph, hdr.tier1StyleFor(c))))
    var p = 0
    var hp = 0 // packed-header cursor (PPT streams only)
    for (pkt <- packetOrder(hdr.prog, hdr.layers, hdr.nc, rlOf _, rw, rh, rx0, ry0, hdr.pp, hdr.poc)) {
      if (pkt.l < keep && (keepPrec == null || keepPrec(pkt.r, pkt.c, pkt.p))) {
        if (packedHdrs == null) {
          require(p < body.length,
            s"tile $isot body exhausted at packet (r=${pkt.r},l=${pkt.l},c=${pkt.c},p=${pkt.p}) — missing tile-part slices?")
          p = decs(pkt.c)(pkt.r).readPacket(body, p, pkt.l, pkt.p)
        } else {
          require(hp < packedHdrs.length,
            s"tile $isot packed headers exhausted at packet (r=${pkt.r},l=${pkt.l},c=${pkt.c},p=${pkt.p})")
          val (nh, nb) = decs(pkt.c)(pkt.r).readPacketFrom(packedHdrs, hp, body, p, pkt.l, pkt.p)
          hp = nh; p = nb
        }
      }
    }
    for (c <- 0 until hdr.nc; r <- 0 to rlOf(c))
      decs(c)(r).finishInto(tile(c), if (quantDepth == null) null else quantDepth(c))
    if (exact) {
      require(p == body.length, s"tile $isot body ended at $p of ${body.length}")
      require(packedHdrs == null || hp == packedHdrs.length,
        s"tile $isot packed headers ended at $hp of ${packedHdrs.length}")
    } else
      require(p <= body.length, s"tile $isot truncated walk overran its slices")
    if (hdr.irreversible) {
      // E.1 mid-point dequantization (r = 1/2) at each band's own step
      // Delta_b (per-band since r17 — the Mallat rects of resolutions
      // 0..rl tile the array exactly once; in a reduced decode the kept
      // bands keep their ORIGINAL QCD indices because discard drops the
      // finest resolutions), then inverse 9/7 + ICT and rounded clamp.
      // For a quality-truncated decode the mid-point is taken at the
      // EFFECTIVE step Delta_b·2^depth (depth = lowest decoded
      // bit-plane, 0 on a full decode): |v| is known only to lie in
      // [|q|·Delta_b, (|q|+2^depth)·Delta_b), and reconstructing at the
      // finest step's mid-point would bias every truncated coefficient
      // toward zero.
      val ds = tile.zipWithIndex.map { case (q, c) =>
        val qspec = hdr.qFor(c)
        val dep = if (quantDepth == null) null else quantDepth(c)
        val d = new Array[Double](q.length)
        for (r <- 0 to rlOf(c); (b, ord) <- bandsAt(rw, rh, rlOf(c), r).zipWithIndex) {
          val delta = qspec.delta(bandIndex(r, ord), b.gain, hdr.prec)
          var y = 0
          while (y < b.h) {
            var x = 0
            while (x < b.w) {
              val i = (b.y0 + y) * rw + (b.x0 + x)
              val v = q(i)
              val half = if (dep == null) 0.5 else 0.5 * (1 << dep(i))
              d(i) = if (v == 0) 0.0
                     else if (v > 0) (v + half) * delta
                     else -((-v + half) * delta)
              x += 1
            }
            y += 1
          }
        }
        d
      }
      for ((d, c) <- ds.zipWithIndex) Dwt97.inverse(d, rw, rh, rlOf(c))
      if (hdr.useRct) Dwt97.ictInverse(ds(0), ds(1), ds(2))
      val dc = 1 << (hdr.prec - 1); val maxV = (1 << hdr.prec) - 1
      var c = 0
      while (c < hdr.nc) {
        val d = ds(c); val a = tile(c)
        var i = 0
        while (i < a.length) {
          val v = math.rint(d(i)).toInt + dc
          a(i) = if (v < 0) 0 else if (v > maxV) maxV else v
          i += 1
        }
        c += 1
      }
    } else {
      for ((a, c) <- tile.zipWithIndex) Dwt53.inverse(a, rw, rh, rlOf(c))
      if (hdr.useRct) Dwt53.rctInverse(tile(0), tile(1), tile(2))
      val dc = 1 << (hdr.prec - 1); val maxV = (1 << hdr.prec) - 1
      tile.foreach { a =>
        var i = 0
        while (i < a.length) {
          val v = a(i) + dc
          a(i) = if (v < 0) 0 else if (v > maxV) maxV else v
          i += 1
        }
      }
    }
    Tile(isot, rx0, ry0, rw, rh, tile)
  }

  // --------------------------------------------- packet encode/decode pair

  /** Progression orders (A.6.1, Table A-16). All five are admitted on
    * whole-file decode since r18; the byte-prefix REDUCED-resolution
    * walkers additionally need resolution outermost ([[resMajor]]). */
  final val LRCP = 0
  final val RLCP = 1
  final val RPCL = 2
  final val PCRL = 3
  final val CPRL = 4

  /** Does this (progression, layers) keep every tile's low-resolution
    * packets a byte PREFIX of its packet sequence? That is the property
    * [[tilePartsReduced]] / [[decodeReduced]]'s discard walk stands on:
    * true for the two resolution-major orders, and for LRCP with one
    * layer (where it coincides with RLCP packet-for-packet). */
  private[jp2] def resMajor(prog: Int, layers: Int): Boolean =
    prog == RLCP || prog == RPCL || (prog == LRCP && layers == 1)

  /** One packet's coordinates within a tile: resolution, layer,
    * component, precinct (raster index within the tile's precinct grid
    * at that resolution). */
  private[jp2] final case class PktRef(r: Int, l: Int, c: Int, p: Int)

  /** The within-tile packet sequence under `prog` — the ONE place the
    * B.12.1 progression iterations live, consumed by the encoder's
    * emission loop, [[decodeTileCore]]'s walk, and the ranged
    * quality/region walkers (so the four can never disagree on order).
    *
    * B.12.1.2-6 define each order as nested loops; position-major
    * orders (RPCL/PCRL/CPRL) iterate the tile's reference-grid points
    * y-major and emit a precinct when the point hits its upper-left
    * corner OR the tile origin (a precinct clipped by the tile edge is
    * visited at the tile origin, B.12.1.3's x == tx0 arm). With this
    * profile's uniform square precincts and unsubsampled components
    * that reduces to sorting all (r, l, c, p) tuples by the order's
    * key, with each precinct positioned at
    * max(tileOrigin, precinctOrigin << (pp + levels - r)) on the
    * reference grid:
    *   LRCP (l, r, c, pos) | RLCP (r, l, c, pos) | RPCL (r, pos, c, l)
    *   PCRL (pos, c, r, l) | CPRL (c, pos, r, l),  pos = (y, x).
    * For one layer LRCP and RLCP coincide; for one precinct per
    * resolution RLCP and RPCL coincide — the degenerate shapes the
    * pre-r18 hard-coded RLCP walk covered. */
  private[jp2] def packetOrder(prog: Int, layers: Int, nc: Int, levels: Int,
      tw: Int, th: Int, atx: Int, aty: Int, pp: Int): IndexedSeq[PktRef] =
    packetOrder(prog, layers, nc, (_: Int) => levels, tw, th, atx, aty, pp)

  /** Per-component-levels [[packetOrder]] (r18b, COC): component c has
    * levelsOf(c)+1 resolutions of its OWN pyramid, so packets (r, c)
    * exist only for r <= levelsOf(c) and each component's precinct
    * grid/position scaling comes from its own level count — exactly
    * B.12.1's per-component N_L. */
  private[jp2] def packetOrder(prog: Int, layers: Int, nc: Int, levelsOf: Int => Int,
      tw: Int, th: Int, atx: Int, aty: Int, pp: Int,
      poc: Seq[PocEntry] = Nil): IndexedSeq[PktRef] = {
    require(poc.nonEmpty || (prog >= LRCP && prog <= CPRL),
      s"progression order $prog not supported")
    val entries = ArrayBuffer.empty[(PktRef, Long, Long)] // pkt, posY, posX
    for (c <- 0 until nc; r <- 0 to levelsOf(c)) {
      val g = precGrid(tw, th, levelsOf(c), r, atx, aty, pp)
      val shift = pp + (levelsOf(c) - r)
      for (p <- 0 until g.num) {
        val px = math.max(atx.toLong, (g.p0x + p % g.npx).toLong << shift)
        val py = math.max(aty.toLong, (g.p0y + p / g.npx).toLong << shift)
        for (l <- 0 until layers)
          entries += ((PktRef(r, l, c, p), py, px))
      }
    }
    def sortedBy(es: ArrayBuffer[(PktRef, Long, Long)], p: Int) = p match {
      case LRCP => es.sortBy { case (k, _, _) => (k.l.toLong, k.r.toLong, k.c.toLong, k.p.toLong, 0L) }
      case RLCP => es.sortBy { case (k, _, _) => (k.r.toLong, k.l.toLong, k.c.toLong, k.p.toLong, 0L) }
      case RPCL => es.sortBy { case (k, y, x) => (k.r.toLong, y, x, k.c.toLong, k.l.toLong) }
      case PCRL => es.sortBy { case (k, y, x) => (y, x, k.c.toLong, k.r.toLong, k.l.toLong) }
      case CPRL => es.sortBy { case (k, y, x) => (k.c.toLong, y, x, k.r.toLong, k.l.toLong) }
    }
    if (poc.isEmpty) sortedBy(entries, prog).map(_._1).toIndexedSeq
    else {
      // POC (A.6.6 / B.12.1.7): the entries apply IN ORDER, each one
      // iterating its own progression over its volume — resolutions
      // [rs, re), components [cs, ce), layers [0, lye), bounds clamped
      // to what exists — and claiming only packets no earlier entry
      // already emitted. A POC that leaves packets unclaimed describes
      // a codestream whose tail order is UNDEFINED for this decoder —
      // typed rejection, never a guess.
      val out = ArrayBuffer.empty[PktRef]
      val seen = scala.collection.mutable.HashSet.empty[PktRef]
      for (e <- poc) {
        val vol = entries.filter { case (k, _, _) =>
          k.r >= e.rs && k.r < e.re && k.c >= e.cs && k.c < e.ce &&
            k.l < e.lye && !seen(k)
        }
        for ((k, _, _) <- sortedBy(vol, e.prog)) { out += k; seen += k }
      }
      require(seen.size == entries.size,
        s"POC progression volumes cover ${seen.size} of ${entries.size} packets — incomplete POC not supported")
      out.toIndexedSeq
    }
  }

  /** [[packetOrder]] for tile `tIdx` under the header's own profile —
    * the walkers' entry point (per-tile dims/origin from the grid). */
  private[jp2] def packetOrder(hdr: Header, tIdx: Int): IndexedSeq[PktRef] = {
    val x0 = (tIdx % hdr.ntx) * hdr.xt; val y0 = (tIdx / hdr.ntx) * hdr.yt
    val tw = math.min(hdr.xt, hdr.width - x0); val th = math.min(hdr.yt, hdr.height - y0)
    packetOrder(hdr.prog, hdr.layers, hdr.nc, hdr.levelsFor _, tw, th, x0, y0, hdr.pp, hdr.poc)
  }

  /** Precinct grid of one (tile, resolution) — ISO 15444-1 B.6: precincts
    * of size 2^pp × 2^pp partition the RESOLUTION grid anchored at (0,0)
    * ABSOLUTE, so the tile's precinct indices run from floor(tr0/2^pp)
    * to ceil(tr1/2^pp) and edge precincts may be partial. All subbands
    * of the resolution share this grid (band coords are the resolution
    * coords halved for r > 0, hence the ppb = pp-1 exponent there). */
  private final case class PrecGrid(p0x: Int, p0y: Int, npx: Int, npy: Int) {
    def num: Int = npx * npy
  }

  private def precGrid(tw: Int, th: Int, nl: Int, r: Int, atx: Int, aty: Int,
      pp: Int): PrecGrid = {
    val shift = nl - r
    val trx0 = atx >> shift; val try0 = aty >> shift
    val resW = ceilDiv(tw, 1 << shift); val resH = ceilDiv(th, 1 << shift)
    val p0x = trx0 >> pp; val p0y = try0 >> pp
    val npx = if (resW == 0) 0 else ceilDiv(trx0 + resW, 1 << pp) - p0x
    val npy = if (resH == 0) 0 else ceilDiv(try0 + resH, 1 << pp) - p0y
    PrecGrid(p0x, p0y, npx, npy)
  }

  /** Packets per resolution of tile `tIdx` under the header's profile:
    * layers * components * precincts(r), precinct counts from the same
    * absolute grid the coders use — this is what keeps the ranged
    * header-only walkers ([[tilePartsReduced]], [[tilePartsQuality]])
    * exact on precinct-partitioned streams. */
  private[jp2] def packetsPerRes(hdr: Header, tIdx: Int): IndexedSeq[Int] = {
    val x0 = (tIdx % hdr.ntx) * hdr.xt; val y0 = (tIdx / hdr.ntx) * hdr.yt
    val tw = math.min(hdr.xt, hdr.width - x0); val th = math.min(hdr.yt, hdr.height - y0)
    val maxL = (0 until hdr.nc).map(hdr.levelsFor).max
    (0 to maxL).map { r =>
      hdr.layers * (0 until hdr.nc).map { c =>
        if (r > hdr.levelsFor(c)) 0
        else precGrid(tw, th, hdr.levelsFor(c), r, x0, y0, hdr.pp).num
      }.sum
    }
  }

  /** One code-block's place in the Tier-2 layout: its precinct (raster
    * index within the tile's precinct grid), its tag-tree coordinates
    * WITHIN that precinct, and its band-LOCAL pixel rectangle. */
  private final case class BlkRect(prec: Int, tx: Int, ty: Int,
      lx0: Int, ly0: Int, cw: Int, ch: Int)

  /** Code-block and tag-tree layout of one subband under the precinct
    * partition — B.7: the code-block grid has size 2^min(xcb, ppb),
    * anchored at (0,0) of the ABSOLUTE band coordinate system (NOT the
    * tile-local band origin: a tile whose band origin is off-grid gets a
    * partial FIRST block — the multi-tile anchoring this codec got
    * wrong before round 17). Returns the blocks grouped per precinct in
    * precinct-local raster order, plus each precinct's tag-tree dims. */
  private final case class BandLayout(treeDims: Array[(Int, Int)],
      blocks: Array[ArrayBuffer[BlkRect]])

  private def bandLayout(b: Band, nl: Int, r: Int, atx: Int, aty: Int, pp: Int,
      g: PrecGrid): BandLayout = {
    val l = if (r == 0) nl else nl - r + 1
    val ax0 = atx >> l; val ay0 = aty >> l
    val ppb = if (r == 0) pp else pp - 1
    val cbe = math.min(CodeBlockExp, ppb)
    val dims = Array.fill(g.num)((0, 0))
    val blocks = Array.fill(g.num)(ArrayBuffer.empty[BlkRect])
    if (b.w > 0 && b.h > 0) {
      val gx0 = ax0 >> cbe; val gx1 = ceilDiv(ax0 + b.w, 1 << cbe)
      val gy0 = ay0 >> cbe; val gy1 = ceilDiv(ay0 + b.h, 1 << cbe)
      // per-precinct first-block index and count along each axis
      def firstIn(p: Int, g0: Int): Int = math.max(g0, (p << ppb) >> cbe)
      def lastIn(p: Int, g1: Int): Int = math.min(g1, ((p + 1) << ppb) >> cbe)
      var gy = gy0
      while (gy < gy1) {
        val prow = (gy << cbe) >> ppb
        var gx = gx0
        while (gx < gx1) {
          val pcol = (gx << cbe) >> ppb
          require(pcol >= g.p0x && pcol < g.p0x + g.npx &&
            prow >= g.p0y && prow < g.p0y + g.npy,
            s"code-block ($gx,$gy) outside the precinct grid — geometry bug")
          val p = (prow - g.p0y) * g.npx + (pcol - g.p0x)
          dims(p) = (lastIn(pcol, gx1) - firstIn(pcol, gx0),
            lastIn(prow, gy1) - firstIn(prow, gy0))
          val lx0 = math.max(ax0, gx << cbe) - ax0
          val ly0 = math.max(ay0, gy << cbe) - ay0
          val lx1 = math.min(ax0 + b.w, (gx + 1) << cbe) - ax0
          val ly1 = math.min(ay0 + b.h, (gy + 1) << cbe) - ay0
          blocks(p) += BlkRect(p, gx - firstIn(pcol, gx0), gy - firstIn(prow, gy0),
            lx0, ly0, lx1 - lx0, ly1 - ly0)
          gx += 1
        }
        gy += 1
      }
    }
    BandLayout(dims, blocks)
  }

  /** Encoder-side Tier-2 state for one (component, resolution): Tier-1
    * runs once per code-block ([[Ebcot.encodeBlockLayered]], which also
    * yields the pass-boundary truncation points), then [[encodeLayer]]
    * emits one packet per quality layer against PERSISTENT tag trees —
    * B.10.2: inclusion and zero-bit-plane trees span a precinct's
    * layers, emitting only the increment each layer. Pass split: layer l
    * carries passes (cum(l-1), cum(l)] chosen BYTE-balanced at the
    * pass-boundary truncation points (see the cumP computation below),
    * so blocks whose codeword exceeds the layer-0 byte target first
    * contribute in a LATER layer — exercising the first-inclusion
    * threshold path — and the final layer always completes the block
    * (lossless). */
  private final class ResEncoder(plane: Array[Int], w: Int, h: Int, nl: Int,
      r: Int, layers: Int, quant: Quant, atx: Int, aty: Int, pp: Int,
      opts: Int) {

    val grid: PrecGrid = precGrid(w, h, nl, r, atx, aty, pp)

    private final class Blk(val bx: Int, val by: Int, val data: Array[Byte],
        val passes: Int, val zbp: Int, val cumPasses: Array[Int],
        val cumBytes: Array[Int], val firstLayer: Int,
        val segEndPasses: Array[Int], val segEndBytes: Array[Int],
        val mseg: Boolean) {
      var lblock = 3
      def npAt(l: Int): Int = cumPasses(l) - (if (l == 0) 0 else cumPasses(l - 1))
    }

    // per band, per precinct: inclusion + zero-bitplane tag trees (B.10.2:
    // tag trees span a PRECINCT's layers, one pair per band-precinct) and
    // the precinct's code-blocks in precinct-local raster order
    private val perBand: Seq[(Band, Array[(TagTree, TagTree, Array[Blk])])] =
      bandsAt(w, h, nl, r).zipWithIndex.filter(_._1.w > 0).filter(_._1.h > 0).map { case (b, ord) =>
        val layout = bandLayout(b, nl, r, atx, aty, pp, grid)
        val mb = quant.mb(bandIndex(r, ord))
        val perPrec = Array.tabulate(grid.num) { p =>
          val (tw, th) = layout.treeDims(p)
          if (tw == 0 || th == 0) (null: TagTree, null: TagTree, Array.empty[Blk])
          else {
            val incl = new TagTree(tw, th)
            val zbps = new TagTree(tw, th)
            val blks = layout.blocks(p).toArray.map { rect =>
              mkBlk(b, rect, mb, incl, zbps)
            }
            (incl, zbps, blks)
          }
        }
        (b, perPrec)
      }

    private def mkBlk(b: Band, rect: BlkRect, mb: Int,
        incl: TagTree, zbps: TagTree): Blk = {
      val bx = rect.tx; val by = rect.ty
      val cw = rect.cw; val ch = rect.ch
      val coeffs = new Array[Int](cw * ch)
      var cy = 0
      while (cy < ch) {
        var cx = 0
        while (cx < cw) {
          coeffs(cy * cw + cx) = plane((b.y0 + rect.ly0 + cy) * w + (b.x0 + rect.lx0 + cx))
          cx += 1
        }
        cy += 1
      }
          val code = Ebcot.encodeBlockCode(cw, ch, coeffs, b.orient, opts)
          val data = code.data; val passes = code.passes; val numbps = code.numbps
          require(numbps <= mb, s"coefficient magnitude overflows Mb=$mb (numbps=$numbps)")
          val mseg = passes > 0 && Ebcot.multiSeg(numbps, opts)
          // byte-balanced layer split (floor): layer l keeps the most
          // passes whose truncation length stays within (l+1)/L of the
          // codeword bytes — layers are RATE tiers, as real encoders
          // allocate them, not pass-count tiers (early passes carry most
          // of a block's bytes, so an even pass split would leave the
          // last layers nearly empty). Floor keeps layer 0 at <= 1/L of
          // the bytes, so a first-layer quality fetch reads ~1/L of the
          // archive; blocks whose whole codeword exceeds the target
          // defer their first inclusion to a later layer. Multi-segment
          // codewords (bypass / per-pass termination) snap the split to
          // SEGMENT boundaries — each one exactly terminated, so the
          // lengths are exact by construction.
          val cumP =
            if (passes == 0) new Array[Int](layers)
            else if (mseg) {
              val total = data.length.toLong
              Array.tabulate(layers) { l =>
                if (l == layers - 1) passes
                else {
                  val target = total * (l + 1) / layers
                  var si = -1
                  while (si + 1 < code.segEndBytes.length &&
                    code.segEndBytes(si + 1) <= target) si += 1
                  if (si < 0) 0 else code.segEndPasses(si)
                }
              }
            } else {
              val truncs = code.truncs
              val total = truncs(passes - 1).toLong
              val arr = new Array[Int](layers)
              var prev = 0
              for (l <- 0 until layers) {
                if (l == layers - 1) arr(l) = passes
                else {
                  val target = total * (l + 1) / layers
                  var k = prev
                  while (k < passes && truncs(k) <= target) k += 1
                  arr(l) = k
                }
                prev = arr(l)
              }
              arr
            }
          // layer-boundary byte lengths. Multi-segment: exact terminated
          // offsets. Single-segment: the candidate from the encoder's
          // emitted-byte count is VERIFIED (decode the prefix, compare
          // against the exact pass-k reconstruction) and bumped until
          // provably decodable — rigorous, not empirical — and never
          // ends on 0xFF ([[Ebcot.verifiedTrunc]])
          val cumB = new Array[Int](layers)
          for (l <- 0 until layers) {
            val cp = cumP(l)
            cumB(l) =
              if (cp == 0) 0
              else if (mseg)
                code.segEndBytes(java.util.Arrays.binarySearch(code.segEndPasses, cp))
              else if (l > 0 && cp == cumP(l - 1)) cumB(l - 1) // no new passes: nothing to verify
              else Ebcot.verifiedTrunc(cw, ch, data, cp, numbps, b.orient,
                math.max(code.truncs(cp - 1), if (l == 0) 0 else cumB(l - 1)), opts)
          }
          val firstLayer = cumP.indexWhere(_ > 0) match {
            case -1 => layers // never included: >= every threshold used
            case i => i
          }
          // zbp values only for included blocks: excluded leaves stay at
          // the "unset" sentinel so they cannot distort the ancestor
          // minima the decoder reconstructs (it never walks them)
          incl.setValue(bx, by, firstLayer)
          if (passes > 0) zbps.setValue(bx, by, mb - numbps)
          new Blk(bx, by, data, passes, if (passes == 0) 0 else mb - numbps,
            cumP, cumB, firstLayer, code.segEndPasses, code.segEndBytes, mseg)
    }

    /** One packet: layer `l` of precinct `p`'s code-blocks across every
      * band of this (component, resolution). `eph` appends the
      * end-of-packet-header marker after the header bits (A.8.2). */
    def encodeLayer(l: Int, p: Int, eph: Boolean): Array[Byte] = {
      val (h, b) = encodeLayerSplit(l, p, eph)
      if (b.isEmpty) h
      else {
        val o = new Array[Byte](h.length + b.length)
        System.arraycopy(h, 0, o, 0, h.length)
        System.arraycopy(b, 0, o, h.length, b.length)
        o
      }
    }

    /** [[encodeLayer]] with the packet HEADER (incl. EPH) and the
      * code-block BODIES returned separately — the PPT emission shape
      * (r19, A.7.5): headers packed into the tile-part header, bodies
      * alone in the bitstream. Inline emission concatenates the two. */
    def encodeLayerSplit(l: Int, p: Int, eph: Boolean): (Array[Byte], Array[Byte]) = {
      val bio = new BioWriter
      val anyContrib = perBand.exists(_._2(p)._3.exists(_.npAt(l) > 0))
      if (!anyContrib) {
        bio.bit(0) // empty packet
        val header = bio.flush()
        if (!eph) return (header, Array.emptyByteArray)
        val out = new java.io.ByteArrayOutputStream(header.length + 2)
        out.write(header); out.write(0xFF); out.write(0x92)
        return (out.toByteArray, Array.emptyByteArray)
      }
      bio.bit(1)
      val chunks = ArrayBuffer.empty[(Array[Byte], Int, Int)] // (data, from, until)
      for ((_, perPrec) <- perBand; c <- perPrec(p)._3) {
        val incl = perPrec(p)._1; val zbps = perPrec(p)._2
        val np = c.npAt(l)
        def contribution(): Unit = {
          writeNumPasses(bio, np)
          val from = if (l == 0) 0 else c.cumBytes(l - 1)
          if (!c.mseg) {
            val clen = c.cumBytes(l) - from
            // Lblock length signalling (single codeword segment split at
            // pass-boundary truncation points; Lblock persists per block)
            val lenBitsNeeded = 32 - Integer.numberOfLeadingZeros(math.max(1, clen))
            val extra = 31 - Integer.numberOfLeadingZeros(np) // floor(log2(np))
            while (c.lblock + extra < lenBitsNeeded) { bio.bit(1); c.lblock += 1 }
            bio.bit(0)
            bio.bits(clen, c.lblock + extra)
          } else {
            // multi-segment codeword: ONE length per segment in this
            // contribution (B.10.7.4/5), each signalled with
            // Lblock + floor(log2(passes in that segment)) bits; the
            // Lblock update run is shared by the whole contribution.
            // Layer boundaries sit on segment ends by construction, so
            // every signalled length is a whole terminated segment.
            val fromP = if (l == 0) 0 else c.cumPasses(l - 1)
            val toP = c.cumPasses(l)
            val segs = c.segEndPasses.indices.filter(i =>
              c.segEndPasses(i) > fromP && c.segEndPasses(i) <= toP)
            val lens = segs.map { i =>
              val sb = if (i == 0) 0 else c.segEndBytes(i - 1)
              val sp = if (i == 0) 0 else c.segEndPasses(i - 1)
              (c.segEndBytes(i) - sb, c.segEndPasses(i) - sp)
            }
            var need = c.lblock
            for ((len, snp) <- lens) {
              val bitsNeeded = 32 - Integer.numberOfLeadingZeros(math.max(1, len))
              val extra = 31 - Integer.numberOfLeadingZeros(snp)
              need = math.max(need, bitsNeeded - extra)
            }
            while (c.lblock < need) { bio.bit(1); c.lblock += 1 }
            bio.bit(0)
            for ((len, snp) <- lens)
              bio.bits(len, c.lblock + (31 - Integer.numberOfLeadingZeros(snp)))
          }
          chunks += ((c.data, from, c.cumBytes(l)))
        }
        if (c.firstLayer >= l) { // not included in any earlier layer
          incl.encode(bio, c.bx, c.by, l + 1)
          if (c.firstLayer == l) {
            zbps.encode(bio, c.bx, c.by, Int.MaxValue - 1) // to full knowledge
            contribution()
          }
        } else { // included before: 1 raw bit = contributes this layer
          bio.bit(if (np > 0) 1 else 0)
          if (np > 0) contribution()
        }
      }
      val header = bio.flush()
      val hOut = new java.io.ByteArrayOutputStream(header.length + 2)
      hOut.write(header)
      if (eph) { hOut.write(0xFF); hOut.write(0x92) }
      val bOut = new java.io.ByteArrayOutputStream(256)
      for ((d, from, until) <- chunks) bOut.write(d, from, until - from)
      (hOut.toByteArray, bOut.toByteArray)
    }
  }

  private def writeNumPasses(bio: BioWriter, np: Int): Unit = {
    require(np >= 1 && np <= 164, s"pass count $np out of range")
    if (np == 1) bio.bit(0)
    else if (np == 2) { bio.bit(1); bio.bit(0) }
    else if (np <= 5) { bio.bits(3, 2); bio.bits(np - 3, 2) }
    else if (np <= 36) { bio.bits(0xF, 4); bio.bits(np - 6, 5) }
    else { bio.bits(0x1FF, 9); bio.bits(np - 37, 7) }
  }

  private def readNumPasses(bio: BioReader): Int = {
    if (bio.bit() == 0) 1
    else if (bio.bit() == 0) 2
    else {
      val t = bio.bits(2)
      if (t < 3) 3 + t
      else {
        val t2 = bio.bits(5)
        if (t2 < 31) 6 + t2
        else 37 + bio.bits(7)
      }
    }
  }

  /** Decoder-side mirror of [[ResEncoder]]: per-(component, resolution)
    * packet state — persistent tag trees, per-block Lblock / pass / chunk
    * accumulation across layers — then one Tier-1 decode per included
    * block over the concatenated chunks once every layer is read. */
  private final class ResDecoder(w: Int, h: Int, nl: Int, r: Int, quant: Quant,
      atx: Int, aty: Int, pp: Int, sop: Boolean, eph: Boolean, opts: Int) {

    val grid: PrecGrid = precGrid(w, h, nl, r, atx, aty, pp)

    private final class BlkState(val rect: BlkRect) {
      var included = false
      var zbp = 0
      var lblock = 3
      var passes = 0
      val chunks = ArrayBuffer.empty[Array[Byte]]
      // per-SEGMENT lengths parsed so far (multi-segment codewords only):
      // chunk bytes arrive layer by layer, but Tier-1 needs the segment
      // boundaries within their concatenation
      val segLens = ArrayBuffer.empty[Int]
    }

    // mirror of the encoder's layout: per band (with its QCD-indexed
    // Mb), per precinct
    private val perBand: Seq[(Band, Int, Array[(TagTree, TagTree, Array[BlkState])])] =
      bandsAt(w, h, nl, r).zipWithIndex.filter(_._1.w > 0).filter(_._1.h > 0).map { case (b, ord) =>
        val layout = bandLayout(b, nl, r, atx, aty, pp, grid)
        val perPrec = Array.tabulate(grid.num) { p =>
          val (tw, th) = layout.treeDims(p)
          if (tw == 0 || th == 0) (null: TagTree, null: TagTree, Array.empty[BlkState])
          else (new TagTree(tw, th), new TagTree(tw, th),
            layout.blocks(p).toArray.map(new BlkState(_)))
        }
        (b, quant.mb(bandIndex(r, ord)), perPrec)
      }

    /** Read layer `l`'s packet for precinct `p` (header + body) starting
      * at `pos`; returns the offset just past it. An SOP segment before
      * the packet is skipped when the COD flags it (its structure is
      * checked; Nsop continuity is NOT — compacted quality slices and
      * reduced prefixes legitimately skip packets). EPH after the header
      * is REQUIRED when flagged (A.8.2 "shall"). */
    def readPacket(cs: Array[Byte], pos: Int, l: Int, p: Int): Int =
      readPacketFrom(cs, pos, cs, -1, l, p)._2

    /** One packet, with the header bits and the code-block bodies read
      * from SEPARATE cursors — the PPT shape (r19, A.7.5): packed
      * packet headers live in the tile-part header, the bitstream
      * carries only the bodies. `bPos < 0` selects the inline layout
      * (bodies follow the header in `hdrCs`; `bodyCs` is then ignored).
      * Returns (header cursor after this packet, body cursor after
      * this packet); inline callers use the second. SOP markers ride
      * the BITSTREAM (body side when packed), EPH ends the packet
      * header (packed side). */
    def readPacketFrom(hdrCs: Array[Byte], hPos: Int, bodyCs: Array[Byte],
        bPos: Int, l: Int, p: Int): (Int, Int) = {
      val packed = bPos >= 0
      var at = hPos
      var bAt = bPos
      def skipSop(arr: Array[Byte], i: Int): Int =
        if (sop && i + 6 <= arr.length && (arr(i) & 0xFF) == 0xFF &&
            (arr(i + 1) & 0xFF) == 0x91) {
          // SOP is optional per packet even when flagged (A.8.1 "may")
          require(((arr(i + 2) & 0xFF) << 8 | (arr(i + 3) & 0xFF)) == 4,
            s"SOP marker at $i with Lsop != 4")
          i + 6
        } else i
      if (packed) bAt = skipSop(bodyCs, bAt) else at = skipSop(hdrCs, at)
      val cs = hdrCs
      val bio = new BioReader(cs, at)
      var end = -1
      if (bio.bit() == 0) { // empty packet
        end = bio.endPos
        if (eph) {
          require(end + 2 <= cs.length && (cs(end) & 0xFF) == 0xFF &&
            (cs(end + 1) & 0xFF) == 0x92, s"missing EPH after empty packet header at $end")
          end += 2
        }
        return if (packed) (end, bAt) else (end, end)
      }
      val pending = ArrayBuffer.empty[(BlkState, Int)] // (state, len)
      for ((_, mb, perPrec) <- perBand) {
        val (incl, zbps, states) = perPrec(p)
        for (s <- states) {
          val bx = s.rect.tx; val by = s.rect.ty
          var contributes = false
          if (!s.included) {
            if (incl.decode(bio, bx, by, l + 1)) { // first inclusion
              var t = 0
              while (!zbps.decode(bio, bx, by, t + 1)) t += 1
              s.zbp = zbps.leafValue(bx, by)
              s.included = true
              contributes = true
            }
          } else contributes = bio.bit() == 1
          if (contributes) {
            val np = readNumPasses(bio)
            while (bio.bit() == 1) s.lblock += 1
            val numbps = mb - s.zbp
            if (!Ebcot.multiSeg(numbps, opts)) {
              val extra = 31 - Integer.numberOfLeadingZeros(np)
              val len = bio.bits(s.lblock + extra)
              s.passes += np
              pending += ((s, len))
            } else {
              // multi-segment codeword (bypass / per-pass termination):
              // one length per segment in (passes, passes+np], each with
              // Lblock + floor(log2(segment's own pass count)) bits
              // (B.10.7.4/5). This profile's packets carry whole
              // terminated segments — a contribution whose boundaries
              // fall mid-segment is spec-legal but rejected loudly.
              val ends = Ebcot.segmentEnds(numbps, opts)
              val fromP = s.passes; val toP = s.passes + np
              require(fromP == 0 || ends.contains(fromP),
                s"contribution starts mid-segment (pass $fromP) — not supported")
              require(ends.contains(toP),
                s"contribution ends mid-segment (pass $toP) — not supported")
              var total = 0
              var prevP = fromP
              for (i <- ends.indices if ends(i) > fromP && ends(i) <= toP) {
                val snp = ends(i) - prevP
                val extra = 31 - Integer.numberOfLeadingZeros(snp)
                val len = bio.bits(s.lblock + extra)
                s.segLens += len
                total += len
                prevP = ends(i)
              }
              s.passes = toP
              pending += ((s, total))
            }
          }
        }
      }
      var q = bio.endPos
      if (eph) {
        require(q + 2 <= cs.length && (cs(q) & 0xFF) == 0xFF &&
          (cs(q + 1) & 0xFF) == 0x92, s"missing EPH after packet header at $q")
        q += 2
      }
      var b = if (packed) bAt else q
      for ((s, len) <- pending) {
        require(b + len <= bodyCs.length,
          s"packet bodies at $b overrun the bitstream (${bodyCs.length} B)")
        s.chunks += java.util.Arrays.copyOfRange(bodyCs, b, b + len)
        b += len
      }
      if (packed) (q, b) else (b, b)
    }

    /** Tier-1 decode every included block (all layers' chunks
      * concatenated — one codeword segment) into the component plane.
      * When `depthPlane` is non-null it receives each coefficient's
      * lowest decoded bit-plane ([[Ebcot.decodeBlockDepth]]) so a
      * quality-truncated lossy dequantizer can reconstruct at the
      * EFFECTIVE step's mid-point instead of biasing low. */
    def finishInto(plane: Array[Int], depthPlane: Array[Int] = null): Unit = {
      for ((b, mb, perPrec) <- perBand; (_, _, states) <- perPrec; s <- states) {
        if (s.included && s.passes > 0) {
          val data = s.chunks.toArray.flatten
          val cw = s.rect.cw; val ch = s.rect.ch
          val numbps = mb - s.zbp
          val depth = if (depthPlane == null) null else new Array[Int](cw * ch)
          val coeffs =
            if (Ebcot.multiSeg(numbps, opts)) {
              val segB = new Array[Int](s.segLens.length)
              var acc = 0; var i = 0
              while (i < segB.length) { acc += s.segLens(i); segB(i) = acc; i += 1 }
              Ebcot.decodeBlockSegDepth(cw, ch, data, segB, s.passes, numbps, b.orient, depth, opts)
            } else Ebcot.decodeBlockDepth(cw, ch, data, s.passes, numbps, b.orient, depth, opts)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              val dst = (b.y0 + s.rect.ly0 + y) * w + (b.x0 + s.rect.lx0 + x)
              plane(dst) = coeffs(y * cw + x)
              if (depthPlane != null) depthPlane(dst) = depth(y * cw + x)
              x += 1
            }
            y += 1
          }
        }
      }
    }
  }
}
