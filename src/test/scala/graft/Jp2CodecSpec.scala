package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jp2Box
import graft.sources.jp2._

/** Layered verification of the pure-Scala JPEG 2000 codec: each stage
  * (MQ coder, bit I/O, tag trees, DWT/RCT, EBCOT Tier-1, full
  * codestream) is round-tripped independently, so an end-to-end failure
  * localizes and a "symmetric but wrong" implementation of any single
  * layer cannot hide behind the others. The sandbox has no third-party
  * JPEG 2000 codec to cross-check bitstreams against (that limit is
  * recorded in COVERAGE.md); what is pinned here is bit-exact lossless
  * round-trip, spec marker structure, and per-layer invariants. */
class Jp2CodecSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  // ------------------------------------------------------------------ MQ

  test("MQ coder round-trips random bit/context sequences") {
    for (seed <- 1 to 8; n <- Seq(0, 1, 5, 100, 5000)) {
      val r = rng(seed * 1000L + n)
      val bits = Array.fill(n)(r.nextInt(2))
      // bias some contexts to exercise MPS/LPS paths and state walks
      val ctxs = Array.fill(n)(r.nextInt(MQ.NumContexts))
      val enc = new MQEncoder()
      var i = 0
      while (i < n) { enc.encode(bits(i), ctxs(i)); i += 1 }
      val data = enc.flush()
      val dec = new MQDecoder(data)
      i = 0
      while (i < n) {
        assert(dec.decode(ctxs(i)) == bits(i), s"seed=$seed n=$n bit $i")
        i += 1
      }
    }
  }

  test("MQ coder compresses a heavily biased source") {
    val n = 10000
    val enc = new MQEncoder()
    val r = rng(7)
    val bits = Array.fill(n)(if (r.nextInt(100) == 0) 1 else 0)
    bits.foreach(enc.encode(_, 0))
    val data = enc.flush()
    // ~1% ones should code far below 1 bit/symbol
    assert(data.length < n / 10, s"no compression: ${data.length} bytes for $n bits")
    val dec = new MQDecoder(data)
    bits.foreach(b => assert(dec.decode(0) == b))
  }

  // ----------------------------------------------------------------- Bio

  test("Bio writer/reader round-trip with 0xFF stuffing") {
    for (seed <- 1 to 10) {
      val r = rng(seed)
      val n = r.nextInt(200)
      // runs of ones provoke 0xFF bytes and the stuffing path
      val bits = Array.fill(n)(if (r.nextInt(3) == 0) r.nextInt(2) else 1)
      val w = new BioWriter
      bits.foreach(w.bit)
      val data = w.flush()
      // stuffing invariant: no byte after a 0xFF may have its MSB set
      data.sliding(2).foreach {
        case Array(a, b) => if ((a & 0xFF) == 0xFF) assert((b & 0x80) == 0)
        case _ => ()
      }
      assert(data.isEmpty || (data.last & 0xFF) != 0xFF, "header may not end on 0xFF")
      val rd = new BioReader(data, 0)
      bits.foreach(b => assert(rd.bit() == b))
      assert(rd.endPos <= data.length)
    }
  }

  // ------------------------------------------------------------ tag trees

  test("tag tree round-trips random grids at incremental thresholds") {
    for (seed <- 1 to 6; (w, h) <- Seq((1, 1), (3, 2), (4, 4), (7, 5))) {
      val r = rng(seed * 37L + w * 100 + h)
      val vals = Array.fill(h, w)(r.nextInt(8))
      val enc = new TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w) enc.setValue(x, y, vals(y)(x))
      val bio = new BioWriter
      for (y <- 0 until h; x <- 0 until w) enc.encode(bio, x, y, Int.MaxValue - 1)
      val data = bio.flush()
      val dec = new TagTree(w, h)
      val rd = new BioReader(data, 0)
      for (y <- 0 until h; x <- 0 until w) {
        var t = 0
        while (!dec.decode(rd, x, y, t + 1)) t += 1
        assert(dec.leafValue(x, y) == vals(y)(x), s"($x,$y) seed=$seed")
      }
    }
  }

  // ------------------------------------------------------------- DWT/RCT

  test("5/3 DWT reconstructs bit-exactly at every size parity and level") {
    for (seed <- 1 to 4; (w, h) <- Seq((1, 1), (1, 7), (8, 1), (5, 7), (8, 8), (13, 9), (64, 64), (113, 89))) {
      val r = rng(seed * 11L + w * 1000 + h)
      val orig = Array.fill(w * h)(r.nextInt(512) - 256)
      for (levels <- 0 to 5) {
        val a = orig.clone()
        Dwt53.forward(a, w, h, levels)
        Dwt53.inverse(a, w, h, levels)
        assert(java.util.Arrays.equals(a, orig), s"($w x $h) levels=$levels seed=$seed")
      }
    }
  }

  test("RCT is integer-exact invertible including negatives") {
    val r = rng(99)
    val n = 4096
    val c0 = Array.fill(n)(r.nextInt(512) - 256)
    val c1 = Array.fill(n)(r.nextInt(512) - 256)
    val c2 = Array.fill(n)(r.nextInt(512) - 256)
    val (o0, o1, o2) = (c0.clone(), c1.clone(), c2.clone())
    Dwt53.rctForward(c0, c1, c2)
    Dwt53.rctInverse(c0, c1, c2)
    assert(java.util.Arrays.equals(c0, o0))
    assert(java.util.Arrays.equals(c1, o1))
    assert(java.util.Arrays.equals(c2, o2))
  }

  // ---------------------------------------------------------- EBCOT Tier-1

  test("EBCOT round-trips random code-blocks across shapes and bands") {
    for {
      band <- Seq(Ebcot.LL, Ebcot.HL, Ebcot.LH, Ebcot.HH)
      (w, h) <- Seq((1, 1), (3, 2), (4, 4), (5, 7), (16, 16), (64, 64))
      seed <- 1 to 3
    } {
      val r = rng(band * 7919L + w * 131 + h * 17 + seed)
      // mix of sparse and dense blocks with signed values
      val dense = r.nextBoolean()
      val coeffs = Array.fill(w * h) {
        if (dense || r.nextInt(4) == 0) r.nextInt(2048) - 1024 else 0
      }
      val (data, passes, numbps) = Ebcot.encodeBlock(w, h, coeffs, band)
      if (coeffs.forall(_ == 0)) assert(passes == 0)
      else {
        val back = Ebcot.decodeBlock(w, h, data, passes, numbps, band)
        assert(java.util.Arrays.equals(back, coeffs),
          s"band=$band ${w}x$h seed=$seed passes=$passes numbps=$numbps")
      }
    }
  }

  test("EBCOT multi-segment codewords (bypass / per-pass termination) round-trip") {
    for {
      band <- Seq(Ebcot.LL, Ebcot.HL, Ebcot.LH, Ebcot.HH)
      opts <- Seq(Ebcot.OptBypass, Ebcot.OptRestart,
        Ebcot.OptBypass | Ebcot.OptRestart,
        Ebcot.OptBypass | Ebcot.OptReset | Ebcot.OptCausal | Ebcot.OptSegSym)
      seed <- 1 to 3
    } {
      val (w, h) = (32, 24)
      val r = rng(band * 50021L + opts * 7 + seed)
      val dense = r.nextBoolean()
      val coeffs = Array.fill(w * h) {
        if (dense || r.nextInt(3) == 0) r.nextInt(4096) - 2048 else 0
      }
      val code = Ebcot.encodeBlockCode(w, h, coeffs, band, opts)
      val label = s"band=$band opts=$opts seed=$seed numbps=${code.numbps}"
      // the layout is the shared contract: segment ends must match the
      // closed-form layout both codec sides compute
      assert(code.segEndPasses.sameElements(Ebcot.segmentEnds(code.numbps, opts)), label)
      assert(code.segEndBytes.last == code.data.length, label)
      val back = Ebcot.decodeBlockSegDepth(w, h, code.data, code.segEndBytes,
        code.passes, code.numbps, band, null, opts)
      assert(java.util.Arrays.equals(back, coeffs), label)
      // every SEGMENT boundary is an exactly-terminated truncation
      // point: decoding only the first s segments' bytes and passes
      // reproduces the full decode of that pass count
      for (s <- code.segEndPasses.indices) {
        val passes = code.segEndPasses(s)
        val bytes = java.util.Arrays.copyOf(code.data, code.segEndBytes(s))
        val wantFull = Ebcot.decodeBlockSegDepth(w, h, code.data, code.segEndBytes,
          passes, code.numbps, band, null, opts)
        val got = Ebcot.decodeBlockSegDepth(w, h, bytes,
          java.util.Arrays.copyOf(code.segEndBytes, s + 1),
          passes, code.numbps, band, null, opts)
        assert(java.util.Arrays.equals(got, wantFull), s"$label seg=$s passes=$passes")
      }
    }
  }

  test("bypass raw segments: layout and bytes pinned BY HAND against D.7") {
    // the segment layout is a closed-form spec rule — pin it against
    // hand-written vectors, not the codec's own expander
    assert(Ebcot.segmentEnds(5, Ebcot.OptBypass).toSeq == Seq(10, 12, 13))
    assert(Ebcot.segmentEnds(6, Ebcot.OptBypass).toSeq == Seq(10, 12, 13, 15, 16))
    assert(Ebcot.segmentEnds(2, Ebcot.OptBypass).toSeq == Seq(4)) // never activates
    assert(Ebcot.segmentEnds(3, Ebcot.OptRestart).toSeq == (1 to 7))
    // 2x1 block, coefficients (+16, -1), numbps 5, bypass: the MQ prefix
    // carries passes 1-10 (planes 4..1); pass 11 is the RAW significance
    // pass of plane 0 — sample 1 (neighbor significant) codes bit 1 and
    // then its RAW sign 1 (negative, no context/XOR per D.7); pass 12 is
    // the RAW refinement of sample 0: bit (16 >> 0) & 1 = 0. Raw bits
    // 1,1,0 packed MSB-first and zero-padded -> the raw segment is
    // EXACTLY [0xC0] — sign polarity, bit order, significance-then-sign
    // order and padding all derived on paper, not from the codec.
    val code = Ebcot.encodeBlockCode(2, 1, Array(16, -1), Ebcot.LL, Ebcot.OptBypass)
    assert(code.numbps == 5 && code.passes == 13)
    assert(code.segEndPasses.toSeq == Seq(10, 12, 13))
    val rawSeg = java.util.Arrays.copyOfRange(code.data, code.segEndBytes(0), code.segEndBytes(1))
    assert(rawSeg.toSeq == Seq(0xC0.toByte), s"raw segment ${rawSeg.map(b => f"$b%02X").mkString}")
    val back = Ebcot.decodeBlockSegDepth(2, 1, code.data, code.segEndBytes,
      code.passes, code.numbps, Ebcot.LL, null, Ebcot.OptBypass)
    assert(back.toSeq == Seq(16, -1))
    // flipping the raw sign bit must decode to (+16, +1)
    val bad = code.data.clone()
    bad(code.segEndBytes(0)) = 0x80.toByte // bits 1,0,0: sign positive
    val flipped = Ebcot.decodeBlockSegDepth(2, 1, bad, code.segEndBytes,
      code.passes, code.numbps, Ebcot.LL, null, Ebcot.OptBypass)
    assert(flipped.toSeq == Seq(16, 1))
  }

  test("EBCOT truncation lengths are VALID: each prefix reproduces its passes exactly") {
    // the contract every quality-layer boundary stands on (l5k decodes
    // blocks from layer-truncated prefixes): for every pass boundary k,
    // decoding truncs(k) bytes with k+1 passes must yield EXACTLY the
    // coefficients that decoding the full codeword with k+1 passes
    // yields — if the conservative emitted+guard bound were ever too
    // short, the truncated decode would silently diverge here
    for (band <- Seq(Ebcot.LL, Ebcot.HL, Ebcot.LH, Ebcot.HH); seed <- 1 to 4) {
      val (w, h) = (32, 24)
      val r = rng(band * 104729L + seed)
      val dense = seed % 2 == 0
      val coeffs = Array.fill(w * h) {
        if (dense || r.nextInt(4) == 0) r.nextInt(512) - 256 else 0
      }
      val (data, passes, numbps, truncs) = Ebcot.encodeBlockLayered(w, h, coeffs, band)
      if (passes > 0) {
        assert(truncs.length == passes && truncs(passes - 1) == data.length)
        assert(truncs.zip(truncs.tail).forall { case (a, b) => a <= b }, "non-monotone")
        for (k <- 0 until passes) {
          val prefix = java.util.Arrays.copyOf(data, truncs(k))
          val fromPrefix = Ebcot.decodeBlock(w, h, prefix, k + 1, numbps, band)
          val fromFull = Ebcot.decodeBlock(w, h, data, k + 1, numbps, band)
          assert(java.util.Arrays.equals(fromPrefix, fromFull),
            s"band=$band seed=$seed pass $k: truncated prefix diverges")
        }
        // and the full-pass decode over the final trunc is still lossless
        assert(java.util.Arrays.equals(
          Ebcot.decodeBlock(w, h, data, passes, numbps, band), coeffs))
      }
    }
  }

  test("verifiedTrunc proves truncation points by decode, even from a too-short start") {
    // the structural guarantee the quality layers stand on: start the
    // probe BELOW the emitted-byte candidate (where the MQ coder's
    // pending C-register bits usually make the prefix undecodable) and
    // verifiedTrunc must still land on a length whose prefix decode is
    // exactly the full-codeword decode of the same passes — and that
    // never ends on a 0xFF byte
    for (band <- Seq(Ebcot.LL, Ebcot.HH); seed <- 1 to 3) {
      val (w, h) = (32, 24)
      val r = rng(band * 31L + seed)
      val coeffs = Array.fill(w * h)(if (r.nextInt(3) == 0) r.nextInt(512) - 256 else 0)
      val (data, passes, numbps, truncs) = Ebcot.encodeBlockLayered(w, h, coeffs, band)
      if (passes > 2) {
        for (k <- Seq(passes / 3, passes / 2, passes - 2)) {
          val len = Ebcot.verifiedTrunc(w, h, data, k + 1, numbps, band,
            math.max(1, truncs(k) - 6))
          assert(len <= data.length)
          assert((data(len - 1) & 0xFF) != 0xFF, "may not end on 0xFF")
          val fromPrefix = Ebcot.decodeBlock(
            w, h, java.util.Arrays.copyOf(data, len), k + 1, numbps, band)
          val fromFull = Ebcot.decodeBlock(w, h, data, k + 1, numbps, band)
          assert(java.util.Arrays.equals(fromPrefix, fromFull),
            s"band=$band seed=$seed pass $k len=$len")
        }
      }
    }
  }

  test("EBCOT all-zero block is excluded, single-coefficient block survives") {
    val (d0, p0, n0) = Ebcot.encodeBlock(8, 8, new Array[Int](64), Ebcot.HH)
    assert(d0.isEmpty && p0 == 0 && n0 == 0)
    val one = new Array[Int](64)
    one(37) = -5
    val (d1, p1, n1) = Ebcot.encodeBlock(8, 8, one, Ebcot.LH)
    val back = Ebcot.decodeBlock(8, 8, d1, p1, n1, Ebcot.LH)
    assert(java.util.Arrays.equals(back, one))
  }

  // ------------------------------------------------------------ full codec

  private def pattern(w: Int, h: Int, k: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 11 + k) % 256)

  test("codestream encode/decode is lossless for gray and RGB across sizes") {
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5), (16, 16), (64, 64), (65, 33), (113, 89), (152, 118))) {
      // gray
      val g = Array(pattern(w, h, 3))
      val csG = Jp2Codec.encode(w, h, g)
      val outG = Jp2Codec.decode(csG)
      assert(outG.width == w && outG.height == h && outG.comps.length == 1)
      assert(java.util.Arrays.equals(outG.comps(0), g(0)), s"gray ${w}x$h")
      // RGB (exercises RCT)
      val rgb = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
      val cs = Jp2Codec.encode(w, h, rgb)
      val out = Jp2Codec.decode(cs)
      assert(out.comps.length == 3)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), rgb(c)), s"rgb c=$c ${w}x$h")
    }
  }

  test("random-noise images round-trip at every decomposition level") {
    for (levels <- 0 to 5; seed <- 1 to 2) {
      val r = rng(levels * 100L + seed)
      val (w, h) = (37 + r.nextInt(60), 23 + r.nextInt(60))
      val comps = Array.fill(3)(Array.fill(w * h)(r.nextInt(256)))
      val cs = Jp2Codec.encode(w, h, comps, levels)
      val out = Jp2Codec.decode(cs)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"levels=$levels seed=$seed")
    }
  }

  test("structured images actually compress; the codestream is marker-correct") {
    val (w, h) = (128, 128)
    // smooth gradient: the DWT should concentrate energy in LL
    val comps = Array(Array.tabulate(w * h)(i => ((i % w) + (i / w)) / 2))
    val cs = Jp2Codec.encode(w, h, comps)
    assert(cs.length < w * h / 2, s"no compression: ${cs.length} bytes for ${w * h} samples")
    // marker skeleton: SOC, SIZ, COD, QCD present; ends with EOC
    assert((cs(0) & 0xFF) == 0xFF && (cs(1) & 0xFF) == 0x4F)
    assert((cs(2) & 0xFF) == 0xFF && (cs(3) & 0xFF) == 0x51)
    assert((cs(cs.length - 2) & 0xFF) == 0xFF && (cs(cs.length - 1) & 0xFF) == 0xD9)
    // SIZ dims parse back through the existing header reader
    assert(Jp2Box.parseDims(cs).contains((w, h)))
  }

  test("JP2 container round-trip: build -> decode, and header dims agree") {
    val (w, h) = (61, 47)
    val comps = Array(pattern(w, h, 1), pattern(w, h, 2), pattern(w, h, 3))
    val cs = Jp2Codec.encode(w, h, comps)
    val container = Jp2Box.buildContainer(w, h, cs)
    assert(Jp2Box.parseDims(container).contains((w, h)))
    val out = Jp2Codec.decode(container)
    assert(out.width == w && out.height == h)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), comps(c)))
  }

  test("256x256 RGB spans a multi-codeblock grid at every level and stays lossless") {
    // Largest end-to-end case: a 4x4 grid of 64x64 code-blocks at level 0
    // and multi-block subbands through all 5 decomposition levels — the
    // tag-tree inclusion/zero-bitplane signalling over a non-trivial grid
    // that the <=152x118 cases only partially reach. Half structured, half
    // noise, so both the RLC fast path and dense coding passes run.
    val (w, h) = (256, 256)
    val r = rng(77)
    val comps = Array.tabulate(3) { c =>
      Array.tabulate(w * h) { i =>
        if ((i / w) < h / 2) ((i % w) * 3 + (i / w) * 5 + c * 41) % 256
        else r.nextInt(256)
      }
    }
    val t0 = System.nanoTime()
    val cs = Jp2Codec.encode(w, h, comps)
    val t1 = System.nanoTime()
    val out = Jp2Codec.decode(cs)
    val t2 = System.nanoTime()
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"c=$c")
    val px = w.toLong * h
    info(f"encode ${px * 1e3 / (t1 - t0)}%.1f Mpx/s, decode ${px * 1e3 / (t2 - t1)}%.1f Mpx/s, ${cs.length} bytes")
  }

  test("tiled codestreams round-trip, carry one SOT per tile, and match the untiled pixels") {
    def sotCount(cs: Array[Byte]): Int =
      (0 until cs.length - 1).count(i => (cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x90)
    for (((w, h), expectTiles) <- Seq(
        ((57, 53), 1),   // tile larger than the image: grid degenerates to 1
        ((91, 99), 4),   // 2x2 with ragged right/bottom edges
        ((125, 56), 2),  // 2x1
        ((130, 130), 9)) // 3x3, center tile full 64x64
    ) {
      val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
      val tiled = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64)
      assert(sotCount(tiled) == expectTiles, s"${w}x$h SOT count")
      val out = Jp2Codec.decode(tiled)
      assert(out.width == w && out.height == h)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"tiled ${w}x$h c=$c")
      // tiling is a layout choice, not a semantic one: same pixels untiled
      val flat = Jp2Codec.decode(Jp2Codec.encode(w, h, comps, levels = 3))
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), flat.comps(c)))
    }
  }

  test("tiled noise round-trips at every level with a spec-legal tile size") {
    for (levels <- 0 to 5) {
      val r = rng(9000L + levels)
      val (w, h) = (70 + r.nextInt(60), 70 + r.nextInt(60))
      val comps = Array.fill(3)(Array.fill(w * h)(r.nextInt(256)))
      // smallest tile that keeps every scaled tile origin even at this depth
      val tile = math.max(64, 1 << levels)
      val out = Jp2Codec.decode(Jp2Codec.encode(w, h, comps, levels, tileSize = tile))
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"levels=$levels")
    }
  }

  test("tileParts spans + standalone slice decode reassemble the full image") {
    // the distributed-decode contract: ranged-read each span, decode it
    // with ONLY the parsed header, and the tiles tile the image exactly
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val container = Jp2Box.buildContainer(
      w, h, Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64))
    val hdr = Jp2Codec.header(container)
    assert(hdr.width == w && hdr.height == h && hdr.ntx == 3 && hdr.nty == 2)
    val spans = Jp2Codec.tileParts(container)
    assert(spans.map(_.index).sorted == (0 until 6))
    val rebuilt = Array.fill(3)(new Array[Int](w * h))
    var covered = 0
    for (s <- spans) {
      val slice = java.util.Arrays.copyOfRange(container, s.pos.toInt, (s.pos + s.len).toInt)
      val t = Jp2Codec.decodeTilePart(slice, hdr)
      assert(t.index == s.index)
      covered += t.width * t.height
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        rebuilt(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
    }
    assert(covered == w * h, "tiles must tile the image exactly")
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(rebuilt(c), comps(c)), s"c=$c")
  }

  /** The decoder's reduced output must equal the encoder's own subbands
    * r <= levels-d inverse-transformed d levels short — computed here
    * INDEPENDENTLY by re-running the forward transform and slicing the
    * reduced Mallat corner. */
  private def expectedReduced(w: Int, h: Int, comps: Array[Array[Int]],
      levels: Int, d: Int): Array[Array[Int]] = {
    val planes = comps.map(_.map(_ - 128))
    if (planes.length == 3) Dwt53.rctForward(planes(0), planes(1), planes(2))
    planes.foreach(Dwt53.forward(_, w, h, levels))
    val rw = (w + (1 << d) - 1) >> d; val rh = (h + (1 << d) - 1) >> d
    val red = planes.map { a =>
      val r = new Array[Int](rw * rh)
      for (y <- 0 until rh; x <- 0 until rw) r(y * rw + x) = a(y * w + x)
      r
    }
    red.foreach(Dwt53.inverse(_, rw, rh, levels - d))
    if (red.length == 3) Dwt53.rctInverse(red(0), red(1), red(2))
    red.map(_.map(v => math.max(0, math.min(255, v + 128))))
  }

  test("reduced decode is bit-exactly the encoder's own low-resolution pyramid") {
    for ((w, h) <- Seq((113, 89), (128, 96), (57, 42)); d <- 1 to 3) {
      val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
      val cs = Jp2Codec.encode(w, h, comps, levels = 3)
      val out = Jp2Codec.decodeReduced(cs, d)
      val rw = (w + (1 << d) - 1) >> d; val rh = (h + (1 << d) - 1) >> d
      assert(out.width == rw && out.height == rh, s"${w}x$h d=$d dims")
      val exp = expectedReduced(w, h, comps, 3, d)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), exp(c)), s"${w}x$h d=$d c=$c")
    }
  }

  test("tiled reduced decode assembles per-tile pyramids on the reduced grid") {
    val (w, h) = (130, 97) // 3x2 tiles of 64, ragged edges
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64)
    for (d <- 1 to 3) {
      val out = Jp2Codec.decodeReduced(cs, d)
      val rw = (w + (1 << d) - 1) >> d; val rh = (h + (1 << d) - 1) >> d
      assert(out.width == rw && out.height == rh)
      // expected: the reduction is TILE-LOCAL (each tile carries its own
      // pyramid), so compute it per 64-px tile and place on the reduced grid
      for (ty <- 0 to 1; tx <- 0 to 2) {
        val x0 = tx * 64; val y0 = ty * 64
        val tw = math.min(64, w - x0); val th = math.min(64, h - y0)
        val sub = comps.map { a =>
          Array.tabulate(tw * th)(j => a((y0 + j / tw) * w + (x0 + j % tw)))
        }
        val exp = expectedReduced(tw, th, sub, 3, d)
        val (rx0, ry0) = (x0 >> d, y0 >> d)
        val (rtw, rth) = ((tw + (1 << d) - 1) >> d, (th + (1 << d) - 1) >> d)
        for (c <- 0 until 3; y <- 0 until rth; x <- 0 until rtw)
          assert(out.comps(c)((ry0 + y) * rw + (rx0 + x)) == exp(c)(y * rtw + x),
            s"d=$d tile($tx,$ty) c=$c px($x,$y)")
      }
    }
  }

  test("reduced decode never reads the high-resolution packets") {
    // corrupt the tail of every tile-part (the highest-resolution packets
    // come last in LRCP); the reduced decode must be bit-identical to the
    // pristine stream because it jumps to the next tile via Psot without
    // touching those bytes
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64)
    val pristine = Jp2Codec.decodeReduced(cs, 2)
    val vandalized = cs.clone()
    for (s <- Jp2Codec.tileParts(cs)) {
      // flip the last quarter of the tile-part body (safely past the
      // d=2-needed r<=1 packets, which are a small prefix)
      for (i <- (s.pos + s.len - s.len / 4).toInt until (s.pos + s.len).toInt)
        vandalized(i) = (~vandalized(i)).toByte
    }
    assert(!java.util.Arrays.equals(vandalized, cs))
    val out = Jp2Codec.decodeReduced(vandalized, 2)
    assert(out.width == pristine.width && out.height == pristine.height)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), pristine.comps(c)), s"c=$c")
  }

  test("encoder rejects tile sizes that break absolute-parity subband geometry") {
    val comps = Array(pattern(96, 96, 1))
    intercept[IllegalArgumentException](
      Jp2Codec.encode(96, 96, comps, levels = 3, tileSize = 60)) // 60 % 8 != 0
    intercept[IllegalArgumentException](
      Jp2Codec.encode(96, 96, comps, levels = 3, tileSize = -1))
  }

  test("PLT-truncated spans decode the exact thumbnail from a fraction of the bytes") {
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64)
    val hdr = Jp2Codec.header(cs)
    val full = Jp2Codec.tileParts(cs)
    val reduced = Jp2Codec.tilePartsReduced(cs, 2)
    assert(reduced.map(_.index) == full.map(_.index))
    val (rBytes, fBytes) = (reduced.map(_.len.toLong).sum, full.map(_.len.toLong).sum)
    // the whole point: the low-res prefix is a small fraction of the tile
    assert(rBytes * 2 < fBytes, s"reduced $rBytes vs full $fBytes bytes")
    // decoding ONLY the truncated slices reassembles decodeReduced exactly
    val whole = Jp2Codec.decodeReduced(cs, 2)
    for (s <- reduced) {
      val slice = java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
      val t = Jp2Codec.decodeTilePart(slice, hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          whole.comps(c)((t.y0 + y) * whole.width + (t.x0 + x)),
          s"tile ${s.index} c=$c px($x,$y)")
    }
  }

  test("encoder rejects tile grids past the 16-bit Isot space; walkers reject bad Psot") {
    // 300x300 at tileSize=1 (legal for levels=0) would need 90000 > 65535
    // tile indices — the wrap would silently place tile 65536 at tile 0
    intercept[IllegalArgumentException](
      Jp2Codec.encode(300, 300, Array(pattern(300, 300, 1)), levels = 0, tileSize = 1))
    // a zeroed Psot must reject, not loop the tile walk forever
    val cs = Jp2Codec.encode(130, 97, Array(pattern(130, 97, 2)), levels = 3, tileSize = 64)
    val first = Jp2Codec.tileParts(cs).head
    val bad = cs.clone()
    for (i <- 0 until 4) bad(first.pos.toInt + 6 + i) = 0
    intercept[IllegalArgumentException](Jp2Codec.tileParts(bad))
    intercept[IllegalArgumentException](Jp2Codec.decodeReduced(bad, 1))
  }

  test("streamed walk reads only headers: main header + 14 B per SOT, never bodies") {
    // the split-stage contract for gigabyte files: tileParts over a
    // RangedInput fetches O(header) bytes, and the counting wrapper
    // proves it — this is what l5h/l5j REQUIRE per file at runtime
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val container = Jp2Box.buildContainer(
      w, h, Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64))
    val in = new Jp2Codec.CountingInput(new Jp2Codec.BytesInput(container))
    val (hdr, spans) = Jp2Codec.tileParts(in)
    // identical results to the array walk
    assert(hdr == Jp2Codec.header(container))
    assert(spans == Jp2Codec.tileParts(container))
    assert(spans.map(_.index).sorted == (0 until 6))
    // byte contract: a small fraction of the file, independent of body size
    assert(in.bytesRead * 8 < container.length,
      s"walk read ${in.bytesRead} B of ${container.length} B")

    // the reduced walk adds only the tile-part headers (SOT + PLT)
    val in2 = new Jp2Codec.CountingInput(new Jp2Codec.BytesInput(container))
    val (hdr2, reduced) = Jp2Codec.tilePartsReduced(in2, 2)
    assert(hdr2 == hdr)
    assert(reduced == Jp2Codec.tilePartsReduced(container, 2))
    val prefixBytes = reduced.map(_.len).sum
    assert((in2.bytesRead + prefixBytes) * 2 < container.length,
      s"walk ${in2.bytesRead} B + prefixes $prefixBytes B of ${container.length} B")
  }

  test("Psot overrunning the codestream but inside the container fails with the bounds error") {
    // a JP2 container's codestream ends BEFORE the container does; a
    // corrupt Psot that stays inside trailing container bytes must trip
    // the precise Psot bounds check, not the vaguer missing-EOC path
    val (w, h) = (64, 48)
    val cs = Jp2Codec.encode(w, h, Array(pattern(w, h, 2)), levels = 2)
    // pad the container with trailing bytes via an extra opaque box
    val base = Jp2Box.buildContainer(w, h, cs)
    val padded = new java.io.ByteArrayOutputStream()
    padded.write(base)
    val padLen = 64
    padded.write((padLen + 8) >> 24); padded.write(0); padded.write(0); padded.write(padLen + 8)
    padded.write("xml ".getBytes("ASCII")) // a spec-legal trailing box type
    padded.write(new Array[Byte](padLen))
    val container = padded.toByteArray
    assert(Jp2Codec.decode(container).width == w, "padded container must still decode")
    val s = Jp2Codec.tileParts(container).head
    val bad = container.clone()
    // bump Psot so the span overruns the jp2c box but stays in the file
    val np = s.len + 32
    bad(s.pos.toInt + 6) = ((np >> 24) & 0xff).toByte
    bad(s.pos.toInt + 7) = ((np >> 16) & 0xff).toByte
    bad(s.pos.toInt + 8) = ((np >> 8) & 0xff).toByte
    bad(s.pos.toInt + 9) = (np & 0xff).toByte
    val e = intercept[IllegalArgumentException](Jp2Codec.tileParts(bad))
    assert(e.getMessage.contains("codestream ends"), e.getMessage)
  }

  test("streamed walk fails typed on truncated input, never a raw index error") {
    val cs = Jp2Codec.encode(130, 97, Array(pattern(130, 97, 3)), levels = 3, tileSize = 64)
    for (cut <- Seq(1, 2, 11, 40, cs.length / 3, cs.length - 1)) {
      val short = new Jp2Codec.BytesInput(java.util.Arrays.copyOf(cs, cut))
      val e = intercept[IllegalArgumentException](Jp2Codec.tileParts(short))
      assert(e.getMessage != null, s"cut=$cut")
    }
  }

  test("main-header walk whitelists informational markers and rejects the rest") {
    val cs = Jp2Codec.encode(32, 32, Array(pattern(32, 32, 7)))
    // splice a marker segment right after SIZ (whose segment ends before COD)
    def splice(marker: Int, payload: Array[Byte]): Array[Byte] = {
      val sizLen = ((cs(4) & 0xFF) << 8) | (cs(5) & 0xFF)
      val at = 4 + sizLen // SOC(2) + SIZ marker(2) + Lsiz..payload
      val out = new java.io.ByteArrayOutputStream()
      out.write(cs, 0, at)
      out.write(marker >> 8); out.write(marker & 0xFF)
      val lseg = 2 + payload.length
      out.write(lseg >> 8); out.write(lseg & 0xFF)
      out.write(payload)
      out.write(cs, at, cs.length - at)
      out.toByteArray
    }
    val base = Jp2Codec.decode(cs)
    // COM (comment) and CRG (registration hint) are informational: skipped
    for (m <- Seq(0xFF64, 0xFF63)) {
      val out = Jp2Codec.decode(splice(m, Array[Byte](0, 1, 2, 3)))
      for (c <- base.comps.indices)
        assert(java.util.Arrays.equals(out.comps(c), base.comps(c)), f"marker $m%04x")
    }
    // POC changes the progression this decoder assumes — must reject
    intercept[IllegalArgumentException](Jp2Codec.decode(splice(0xFF5F, Array[Byte](0))))
    // segment-less marker range (0xFF30-0xFF3F) carries NO length field:
    // "skip by length" would read payload bytes as a length — must reject,
    // not mis-skip (here 0xFF35 is followed by COD whose bytes would be
    // misread as a huge segment length)
    val sizLen = ((cs(4) & 0xFF) << 8) | (cs(5) & 0xFF)
    val at = 4 + sizLen
    val segless = new java.io.ByteArrayOutputStream()
    segless.write(cs, 0, at); segless.write(0xFF); segless.write(0x35)
    segless.write(cs, at, cs.length - at)
    intercept[IllegalArgumentException](Jp2Codec.decode(segless.toByteArray))
  }

  test("buildContainer ihdr component count follows the codestream's SIZ") {
    // 1-component codestream -> ihdr must say 1, not a hard-coded 3
    val mono = Jp2Codec.encode(40, 30, Array(pattern(40, 30, 9)))
    val c1 = Jp2Box.buildContainer(40, 30, mono)
    val rgb = Jp2Codec.encode(40, 30,
      Array(pattern(40, 30, 0), pattern(40, 30, 29), pattern(40, 30, 58)))
    val c3 = Jp2Box.buildContainer(40, 30, rgb)
    def ihdrNc(b: Array[Byte]): Int = {
      // ihdr at fixed offsets in our container: sig(12)+ftyp(20)+jp2h hdr(8)+ihdr hdr(8)+h(4)+w(4)
      ((b(56) & 0xFF) << 8) | (b(57) & 0xFF)
    }
    assert(ihdrNc(c1) == 1)
    assert(ihdrNc(c3) == 3)
    // and both containers still decode (container walk unaffected)
    assert(Jp2Codec.decode(c1).comps.length == 1)
    assert(Jp2Codec.decode(c3).comps.length == 3)
  }

  test("buildContainer ihdr BPC follows the codestream's SIZ Ssiz") {
    // ihdr BPC must equal the SIZ Ssiz (I.5.3.1) — 8-bit writes 7,
    // 16-bit writes 15; a container disagreeing with its codestream
    // would hand conformant external decoders the wrong depth
    def ihdrBpc(b: Array[Byte]): Int = b(58) & 0xFF // right after the 2-byte NC
    val p8 = Array(pattern(40, 30, 9))
    val c8 = Jp2Box.buildContainer(40, 30, Jp2Codec.encode(40, 30, p8))
    assert(ihdrBpc(c8) == 7)
    val p16 = Array(Array.tabulate(40 * 30)(i => (i * 257) % 65536))
    val cs16 = Jp2Codec.encode(40, 30, p16, bitDepth = 16)
    val c16 = Jp2Box.buildContainer(40, 30, cs16)
    assert(ihdrBpc(c16) == 15)
    val d16 = Jp2Codec.decode(c16)
    assert(d16.comps(0).sameElements(p16(0)))
    // opaque payload (no SIZ): the documented 3-component 8-bit default
    val fix = Jp2Box.buildContainer(4, 4, Array.fill(10)(0x5a.toByte))
    assert(ihdrBpc(fix) == 7)
  }

  test("buildContainer non-uniform depths: ihdr BPC = 0xFF with a bpcc box (I.5.3.1)") {
    // the engine's own encoder applies ONE bitDepth to every component,
    // so this branch can only be reached by a foreign codestream — a
    // hand-built SIZ with mixed Ssiz (depths 8/12/16), derived on paper:
    // SOC, then SIZ with Lsiz = 38 + 3*nc = 47
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def u32(v: Int): Unit = { u16(v >> 16); u16(v & 0xFFFF) }
    u16(0xFF4F); u16(0xFF51); u16(47); u16(0) // SOC, SIZ, Lsiz, Rsiz
    u32(40); u32(30); u32(0); u32(0) // Xsiz Ysiz XOsiz YOsiz
    u32(40); u32(30); u32(0); u32(0) // XTsiz YTsiz XTOsiz YTOsiz
    u16(3) // Csiz
    for (ss <- Seq(7, 11, 15)) { out.write(ss); out.write(1); out.write(1) }
    val payload = out.toByteArray
    val c = Jp2Box.buildContainer(40, 30, payload)
    def be(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    def typ(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")
    // jp2h at 32 (sig 12 + ftyp 20): length must cover ihdr + bpcc
    assert(be(c, 32) == 30L + 8 + 3 && typ(c, 36) == "jp2h")
    // ihdr: nc 3, BPC 0xFF = "components differ, see bpcc"
    assert(be(c, 40) == 22L && typ(c, 44) == "ihdr")
    assert((((c(56) & 0xFF) << 8) | (c(57) & 0xFF)) == 3)
    assert((c(58) & 0xFF) == 0xFF)
    // bpcc child right after ihdr: one Ssiz passthrough byte per component
    assert(be(c, 62) == 8L + 3 && typ(c, 66) == "bpcc")
    assert((c(70) & 0xFF) == 7 && (c(71) & 0xFF) == 11 && (c(72) & 0xFF) == 15)
    // jp2c follows the grown jp2h; the container still parses
    assert(be(c, 73) == 8L + payload.length && typ(c, 77) == "jp2c")
    assert(Jp2Box.parseDims(c).contains((40, 30)))
  }

  test("POC round-trips losslessly; volumes drive the walk; ranged reduced rejects typed") {
    import Jp2Codec.PocEntry
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    // two real-corpus shapes: a rate-allocation change (layer-bounded
    // first volume) and a resolution handoff RLCP -> LRCP
    val pocs = Seq(
      Seq(PocEntry(0, 0, 1, 4, 3, Jp2Codec.RLCP), PocEntry(0, 0, 2, 4, 3, Jp2Codec.LRCP)),
      Seq(PocEntry(0, 0, 2, 2, 3, Jp2Codec.RLCP), PocEntry(2, 0, 2, 4, 3, Jp2Codec.LRCP)))
    for (poc <- pocs; tile <- Seq(0, 64)) {
      val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile,
        layers = 2, poc = poc)
      val hdr = Jp2Codec.header(cs)
      assert(hdr.poc == poc, "POC must survive the marker round-trip")
      val img = Jp2Codec.decode(cs)
      for (c <- 0 until 3) assert(img.comps(c).sameElements(comps(c)), s"comp $c")
      // byte-prefix walkers: typed POC rejection, whole-file fine
      val e = intercept[IllegalArgumentException](Jp2Codec.tilePartsReduced(cs, 1))
      assert(e.getMessage.contains("POC"), e.getMessage)
      val e2 = intercept[IllegalArgumentException](Jp2Codec.decodeReduced(cs, 1))
      assert(e2.getMessage.contains("POC"), e2.getMessage)
    }
    // the quality-ranged walk keeps packets by PLT ranges from the same
    // POC-aware packetOrder, so it admits POC: keep=layers is exact
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      poc = pocs.head)
    val hdr = Jp2Codec.header(cs)
    for (keep <- Seq(1, 2)) {
      val (h2, parts) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), keep)
      val planes = Array.fill(3)(new Array[Int](w * h))
      for (part <- parts) {
        val slice = new java.io.ByteArrayOutputStream()
        for ((from, until) <- part.ranges) slice.write(cs, from.toInt, (until - from).toInt)
        val t = Jp2Codec.decodeTilePartQuality(slice.toByteArray, h2, keep)
        for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
          planes(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
      }
      if (keep == 2) // reversible + all layers = exact
        for (c <- 0 until 3) assert(planes(c).sameElements(comps(c)), s"quality comp $c")
    }
    assert(hdr.layers == 2)
    // the region-ranged walk keeps precinct packets off the same
    // POC-aware packetOrder, so it admits POC too: crop pixels must be
    // bit-exact (precincted so the walk actually drops packets)
    val pcs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64,
      layers = 2, precinctExp = 5, poc = pocs.head)
    val (cx0, cy0, cx1, cy1) = (40, 30, 100, 80)
    val (rh, rparts) = Jp2Codec.tilePartsRegion(new Jp2Codec.BytesInput(pcs),
      cx0, cy0, cx1, cy1)
    assert(rh.poc == pocs.head)
    var covered = 0
    for (part <- rparts) {
      val slice = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) slice.write(pcs, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTileRegion(slice.toByteArray, rh, cx0, cy0, cx1, cy1)
      val ix0 = math.max(cx0, t.x0); val ix1 = math.min(cx1, t.x0 + t.width)
      val iy0 = math.max(cy0, t.y0); val iy1 = math.min(cy1, t.y0 + t.height)
      for (c <- 0 until 3; y <- iy0 until iy1; x <- ix0 until ix1) {
        assert(t.comps(c)((y - t.y0) * t.width + (x - t.x0)) == comps(c)(y * w + x),
          s"region comp $c at ($x,$y)")
        if (c == 0) covered += 1
      }
    }
    assert(covered == (cx1 - cx0) * (cy1 - cy0), "crop fully covered")
    // an incomplete POC dies typed at ENCODE (the emission order is the
    // same POC-aware generator the decoder walks)
    val e3 = intercept[IllegalArgumentException](Jp2Codec.encode(w, h, comps,
      levels = 3, layers = 2, poc = Seq(PocEntry(0, 0, 1, 4, 3, Jp2Codec.RLCP))))
    assert(e3.getMessage.contains("incomplete POC"), e3.getMessage)
  }

  test("PPT (packed headers) round-trips losslessly; bitstream carries only bodies") {
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    for (tile <- Seq(0, 64); eph <- Seq(false, true); layers <- Seq(1, 2)) {
      val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile,
        layers = layers, eph = eph, packedHeaders = true)
      val img = Jp2Codec.decode(cs)
      for (c <- 0 until 3)
        assert(img.comps(c).sameElements(comps(c)), s"comp $c tile=$tile eph=$eph l=$layers")
      // the packed stream and the inline stream decode identically
      val inline = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile,
        layers = layers, eph = eph)
      val ref = Jp2Codec.decode(inline)
      for (c <- 0 until 3) assert(img.comps(c).sameElements(ref.comps(c)))
      // ranged walks: typed PPT rejections; container walk unaffected
      val e = intercept[IllegalArgumentException](Jp2Codec.tilePartsReduced(cs, 1))
      assert(e.getMessage.contains("PPT"), e.getMessage)
      val e2 = intercept[IllegalArgumentException](Jp2Codec.decodeReduced(cs, 1))
      assert(e2.getMessage.contains("PPT"), e2.getMessage)
      val boxed = Jp2Box.buildContainer(w, h, cs)
      assert(Jp2Codec.decode(boxed).comps(0).sameElements(comps(0)))
    }
    // lossy path through the packed layout
    val lossy = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64,
      irreversible = true, qShift = -2, packedHeaders = true)
    val lref = Jp2Codec.decode(Jp2Codec.encode(w, h, comps, levels = 3,
      tileSize = 64, irreversible = true, qShift = -2))
    val limg = Jp2Codec.decode(lossy)
    for (c <- 0 until 3) assert(limg.comps(c).sameElements(lref.comps(c)),
      s"lossy PPT decode diverges from the inline twin (comp $c)")
  }

  test("multi-layer encode round-trips losslessly, tiled and untiled") {
    for (layers <- Seq(2, 3, 5); (w, h, tile) <- Seq((113, 89, 0), (130, 97, 64))) {
      val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
      val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile, layers = layers)
      val hdr = Jp2Codec.header(cs)
      assert(hdr.layers == layers)
      val out = Jp2Codec.decode(cs)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), comps(c)),
          s"layers=$layers ${w}x$h tile=$tile c=$c")
    }
    // noise too — exercises dense pass splits across every band
    val r = rng(4242L)
    val noise = Array.fill(3)(Array.fill(96 * 80)(r.nextInt(256)))
    val cs = Jp2Codec.encode(96, 80, noise, levels = 3, tileSize = 0, layers = 3)
    val out = Jp2Codec.decode(cs)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), noise(c)), s"noise c=$c")
  }

  test("multi-layer first-inclusion in a later layer round-trips") {
    // near-zero content: most blocks carry 1-3 passes, so the integer
    // pass split defers their first contribution past layer 0 — the
    // tag-tree threshold path that single-layer streams never take
    val (w, h) = (64, 48)
    val r = rng(99L)
    val comps = Array(Array.tabulate(w * h)(i =>
      128 + (if (r.nextInt(17) == 0) r.nextInt(3) - 1 else 0)))
    for (layers <- Seq(2, 4)) {
      val cs = Jp2Codec.encode(w, h, comps, levels = 2, layers = layers)
      val out = Jp2Codec.decode(cs)
      assert(java.util.Arrays.equals(out.comps(0), comps(0)), s"layers=$layers")
    }
  }

  test("multi-layer reduced decode and PLT-ranged slices stay exact (RLCP prefix)") {
    // RLCP keeps every tile's low-resolution packets — ALL layers of
    // them — a contiguous prefix, so the reduced walk, the PLT span
    // truncation, and the vandalized-tail skip-proof all carry over
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2)
    val hdr = Jp2Codec.header(cs)
    // reduced output == the single-layer encoder's reduced output (the
    // subband data is identical; layering only re-packets it)
    val ref = Jp2Codec.decodeReduced(
      Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64), 2)
    val red = Jp2Codec.decodeReduced(cs, 2)
    assert(red.width == ref.width && red.height == ref.height)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(red.comps(c), ref.comps(c)), s"c=$c")
    // PLT-truncated spans: a fraction of the bytes, bit-exact decode
    val full = Jp2Codec.tileParts(cs)
    val reduced = Jp2Codec.tilePartsReduced(cs, 2)
    val (rBytes, fBytes) = (reduced.map(_.len).sum, full.map(_.len).sum)
    assert(rBytes * 2 < fBytes, s"reduced $rBytes vs full $fBytes bytes")
    for (s <- reduced) {
      val slice = java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
      val t = Jp2Codec.decodeTilePart(slice, hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          red.comps(c)((t.y0 + y) * red.width + (t.x0 + x)),
          s"tile ${s.index} c=$c px($x,$y)")
    }
    // vandalize the tail of every tile-part: thumbnail bit-identical
    val vandalized = cs.clone()
    for (s <- full; i <- (s.pos + s.len - s.len / 4).toInt until (s.pos + s.len).toInt)
      vandalized(i) = (~vandalized(i)).toByte
    val out = Jp2Codec.decodeReduced(vandalized, 2)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), red.comps(c)), s"vandalized c=$c")
  }

  test("quality-ranged slices decode progressively: fewer bytes, monotone fidelity") {
    // the quality axis of the ranged-fetch story: fetch only the first
    // keepLayers layers' packets of every resolution (PLT arithmetic,
    // no entropy work), decode full-resolution at reduced fidelity
    val (w, h) = (130, 97)
    val r = rng(777L)
    // noise content so dropped refinement passes carry real information
    val comps = Array.fill(3)(Array.fill(w * h)(r.nextInt(256)))
    val layers = 3
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = layers)
    val full = Jp2Codec.decode(cs)

    def qualityDecode(keep: Int): (Array[Array[Int]], Long) = {
      val in = new Jp2Codec.CountingInput(new Jp2Codec.BytesInput(cs))
      val (hdr, parts) = Jp2Codec.tilePartsQuality(in, keep)
      // the split walk itself reads only headers
      assert(in.bytesRead * 4 < cs.length, s"walk read ${in.bytesRead} of ${cs.length}")
      val planes = Array.fill(3)(new Array[Int](w * h))
      var fetched = 0L
      for (part <- parts) {
        fetched += part.fetchBytes
        val slice = new java.io.ByteArrayOutputStream()
        for ((from, until) <- part.ranges)
          slice.write(cs, from.toInt, (until - from).toInt)
        val t = Jp2Codec.decodeTilePartQuality(slice.toByteArray, hdr, keep)
        for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
          planes(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
      }
      (planes, fetched)
    }

    def err(a: Array[Array[Int]]): Long =
      (0 until 3).map(c => a(c).zip(full.comps(c)).map { case (x, y) =>
        math.abs(x - y).toLong }.sum).sum

    val (q1, b1) = qualityDecode(1)
    val (q2, b2) = qualityDecode(2)
    val (q3, b3) = qualityDecode(3)
    // keep == layers reproduces the full decode from the full bytes
    assert(err(q3) == 0, "keep=layers must be exact")
    assert(b3 == Jp2Codec.tileParts(cs).map(_.len).sum, "keep=layers fetches everything")
    // fewer layers -> strictly fewer bytes; fidelity monotone, lossy at 1
    assert(b1 < b2 && b2 < b3, s"bytes not monotone: $b1 $b2 $b3")
    assert(b1 * 2 < b3, s"first layer not a fraction: $b1 of $b3")
    assert(err(q1) >= err(q2), s"fidelity not monotone: ${err(q1)} < ${err(q2)}")
    assert(err(q1) > 0, "keep=1 on noise must actually be lossy")
    // full-resolution output regardless of quality truncation
    assert(q1(0).length == w * h)
  }

  // ------------------------------------------------------- 9/7 lossy path

  test("9/7 DWT inverts to numerical identity at every size parity and level") {
    for (seed <- 1 to 3; (w, h) <- Seq((1, 1), (1, 7), (8, 1), (5, 7), (13, 9), (64, 64), (113, 89))) {
      val r = rng(seed * 31L + w * 1000 + h)
      val orig = Array.fill(w * h)(r.nextDouble() * 512 - 256)
      for (levels <- 0 to 5) {
        val a = orig.clone()
        Dwt97.forward(a, w, h, levels)
        Dwt97.inverse(a, w, h, levels)
        val maxErr = a.zip(orig).map { case (x, y) => math.abs(x - y) }.max
        assert(maxErr < 1e-9, s"($w x $h) levels=$levels seed=$seed maxErr=$maxErr")
      }
    }
  }

  test("9/7 DWT has the declared DC/Nyquist gains (quantizer Rb convention)") {
    // lows 1/K-scaled -> DC gain 1; highs K-scaled -> Nyquist gain 2:
    // the convention the QCD exponents (Rb = 9 + gain) stand on
    val n = 64
    val dc = Array.fill(n)(100.0)
    Dwt97.forward(dc, n, 1, 1)
    for (i <- 0 until 32) assert(math.abs(dc(i) - 100.0) < 1e-9, s"low($i)=${dc(i)}")
    for (i <- 32 until 64) assert(math.abs(dc(i)) < 1e-9, s"high($i)=${dc(i)}")
    val nyq = Array.tabulate(n)(i => if (i % 2 == 0) 100.0 else -100.0)
    Dwt97.forward(nyq, n, 1, 1)
    for (i <- 32 until 64)
      assert(math.abs(math.abs(nyq(i)) - 200.0) < 0.1, s"high($i)=${nyq(i)}")
  }

  test("ICT round-trips within numerical tolerance") {
    val r = rng(123)
    val n = 4096
    val c0 = Array.fill(n)(r.nextDouble() * 256 - 128)
    val c1 = Array.fill(n)(r.nextDouble() * 256 - 128)
    val c2 = Array.fill(n)(r.nextDouble() * 256 - 128)
    val (o0, o1, o2) = (c0.clone(), c1.clone(), c2.clone())
    Dwt97.ictForward(c0, c1, c2)
    Dwt97.ictInverse(c0, c1, c2)
    for (i <- 0 until n) {
      assert(math.abs(c0(i) - o0(i)) < 1e-6)
      assert(math.abs(c1(i) - o1(i)) < 1e-6)
      assert(math.abs(c2(i) - o2(i)) < 1e-6)
    }
  }

  private def errStats(out: Jp2Codec.Image, comps: Array[Array[Int]]): (Int, Double) = {
    var maxErr = 0
    var sq = 0.0
    var n = 0L
    for (c <- comps.indices; i <- comps(c).indices) {
      val e = math.abs(out.comps(c)(i) - comps(c)(i))
      if (e > maxErr) maxErr = e
      sq += e.toDouble * e
      n += 1
    }
    val mse = sq / n
    val psnr = if (mse == 0) Double.PositiveInfinity else 10 * math.log10(255.0 * 255.0 / mse)
    (maxErr, psnr)
  }

  test("irreversible 9/7 codec round-trips within tolerance; coarser steps compress more, lose more") {
    // 9/7 is lossy BY DESIGN: the pins are error bounds and monotone
    // rate/distortion, not bit equality (COVERAGE.md documents the
    // sandbox's no-third-party-codec conformance limit)
    for ((w, h, tile) <- Seq((113, 89, 0), (130, 97, 64))) {
      val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
      val lossless = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile)
      val near = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile,
        irreversible = true, qShift = 0)
      val lossy = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile,
        irreversible = true, qShift = -2)
      val hdrN = Jp2Codec.header(near)
      assert(hdrN.irreversible && hdrN.qShift == 0, s"$hdrN")
      assert(Jp2Codec.header(lossy).qShift == -2)
      val (errN, psnrN) = errStats(Jp2Codec.decode(near), comps)
      val (errL, psnrL) = errStats(Jp2Codec.decode(lossy), comps)
      // step 1 (qShift=0) is near-lossless; step 4 (qShift=-2) is visually
      // lossy but bounded; bytes must fall as the step coarsens
      assert(errN <= 8, s"tile=$tile qShift=0 maxErr=$errN")
      assert(psnrN >= 40, s"tile=$tile qShift=0 psnr=$psnrN")
      assert(errL <= 32, s"tile=$tile qShift=-2 maxErr=$errL")
      assert(psnrL >= 28, s"tile=$tile qShift=-2 psnr=$psnrL")
      assert(errL >= errN, s"error not monotone in step: $errL < $errN")
      assert(lossy.length < near.length,
        s"tile=$tile lossy ${lossy.length} B !< near ${near.length} B")
      assert(lossy.length < lossless.length,
        s"tile=$tile lossy ${lossy.length} B !< lossless ${lossless.length} B")
    }
    // grayscale too (no ICT)
    val g = Array(pattern(96, 80, 5))
    val (errG, psnrG) = errStats(
      Jp2Codec.decode(Jp2Codec.encode(96, 80, g, levels = 2, irreversible = true,
        qShift = -2)), g)
    assert(errG <= 32 && psnrG >= 28, s"gray maxErr=$errG psnr=$psnrG")
  }

  test("tampered QCD: mantissas are honored, illegal styles/exponents reject") {
    val comps = Array(pattern(64, 48, 3))
    val cs = Jp2Codec.encode(64, 48, comps, levels = 2, irreversible = true, qShift = -1)
    // locate QCD (0xFF5C); layout FF 5C len16 Sqcd [eps<<11|mu]...
    val qcdAt = (0 until cs.length - 1).indexWhere(i =>
      (cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x5C)
    assert(qcdAt > 0)
    val style = cs(qcdAt + 4) & 0x1F
    assert(style == 2, s"expected scalar-expounded QCD, got style $style")
    // a non-uniform mantissa is spec-legal since r17 — the decoder must
    // APPLY it (LL step x2 here), not ignore it: pixels must move
    val bad = cs.clone()
    bad(qcdAt + 5) = (bad(qcdAt + 5) | 0x07).toByte
    bad(qcdAt + 6) = 0xFF.toByte // band 0 mu = 2047
    val base = Jp2Codec.decode(cs).comps.map(_.toSeq).toSeq
    val wider = Jp2Codec.decode(bad).comps.map(_.toSeq).toSeq
    assert(base != wider, "a ~2x LL step must change the reconstruction")
    // style 3 does not exist
    val bad2 = cs.clone()
    bad2(qcdAt + 4) = ((bad2(qcdAt + 4) & 0xE0) | 3).toByte
    val e2 = intercept[IllegalArgumentException](Jp2Codec.decode(bad2))
    assert(e2.getMessage.contains("quantization style"), e2.getMessage)
    // style 1 carrying an expounded-length payload is a length error
    val bad3 = cs.clone()
    bad3(qcdAt + 4) = ((bad3(qcdAt + 4) & 0xE0) | 1).toByte
    val e3 = intercept[IllegalArgumentException](Jp2Codec.decode(bad3))
    assert(e3.getMessage.contains("QCD payload"), e3.getMessage)
    // eps = 0 is outside E.1's 1..31
    val bad4 = cs.clone()
    bad4(qcdAt + 5) = (bad4(qcdAt + 5) & 0x07).toByte
    val e4 = intercept[IllegalArgumentException](Jp2Codec.decode(bad4))
    assert(e4.getMessage.contains("quantizer exponent"), e4.getMessage)
    // qShift outside the profile fails at encode time
    intercept[IllegalArgumentException](
      Jp2Codec.encode(64, 48, comps, levels = 2, irreversible = true, qShift = 4))
    intercept[IllegalArgumentException](
      Jp2Codec.encode(64, 48, comps, levels = 2, qShift = -1)) // reversible + qShift
  }

  test("ranged machinery carries over to lossy streams: reduced, quality, multi-part") {
    // the PLT arithmetic is transform-agnostic: the 9/7 stream supports
    // the same three scalability axes as the lossless one
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      partsPerTile = 2, irreversible = true, qShift = -2)
    val hdr = Jp2Codec.header(cs)
    assert(hdr.irreversible && hdr.layers == 2)
    val full = Jp2Codec.decode(cs)
    val (errF, _) = errStats(full, comps)
    assert(errF <= 32, s"full lossy decode maxErr=$errF")

    // REDUCED: truncated spans decode the exact reduced pyramid and cost
    // a fraction of the bytes
    val ref = Jp2Codec.decodeReduced(cs, 2)
    val fullSpans = Jp2Codec.tileParts(cs)
    val reduced = Jp2Codec.tilePartsReduced(cs, 2)
    assert(reduced.map(_.len).sum * 2 < fullSpans.map(_.len).sum)
    def slice(s: Jp2Codec.TilePartSpan): Array[Byte] =
      java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
    for ((_, parts) <- reduced.groupBy(_.index)) {
      val t = Jp2Codec.decodeTileParts(parts.sortBy(_.part).map(slice), hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          ref.comps(c)((t.y0 + y) * ref.width + (t.x0 + x)))
    }

    // QUALITY: keep = layers reproduces the full lossy decode EXACTLY
    // (same quantized coefficients, just re-fetched), keep = 1 is a
    // byte fraction
    val (_, q2) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 2)
    for (part <- q2) {
      val sl = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) sl.write(cs, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTilePartQuality(sl.toByteArray, hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          full.comps(c)((t.y0 + y) * full.width + (t.x0 + x)))
    }
    val (_, q1) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 1)
    assert(q1.map(_.fetchBytes).sum < q2.map(_.fetchBytes).sum)
  }

  test("multi-tile-part streams (TNsot > 1) round-trip and match the single-part pixels") {
    // real archival encoders split tiles across tile-parts to bound
    // tile-part length; the split is pure layout — same packets, more
    // SOT/PLT/SOD framing — so pixels must be identical to 1-part streams
    def sotCount(cs: Array[Byte]): Int =
      (0 until cs.length - 1).count(i => (cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x90)
    for (parts <- Seq(2, 3, 4); (w, h, tile, tiles) <- Seq((113, 89, 0, 1), (130, 97, 64, 6))) {
      val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
      val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = tile, partsPerTile = parts)
      assert(sotCount(cs) == tiles * parts, s"parts=$parts tile=$tile SOT count")
      val out = Jp2Codec.decode(cs)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"parts=$parts tile=$tile c=$c")
    }
    // multi-layer AND multi-part together (the archival combination)
    val comps = Array(pattern(130, 97, 0), pattern(130, 97, 29), pattern(130, 97, 58))
    val cs = Jp2Codec.encode(130, 97, comps, levels = 3, tileSize = 64, layers = 2,
      partsPerTile = 2)
    val out = Jp2Codec.decode(cs)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"layers+parts c=$c")
    // encoder rejects more parts than resolution groups
    intercept[IllegalArgumentException](
      Jp2Codec.encode(64, 64, Array(pattern(64, 64, 1)), levels = 2, partsPerTile = 4))
  }

  test("tileParts spans carry TPsot/TNsot; decodeTileParts groups and validates them") {
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, partsPerTile = 2)
    val hdr = Jp2Codec.header(cs)
    val spans = Jp2Codec.tileParts(cs)
    assert(spans.length == 12 && spans.forall(_.nparts == 2))
    assert(spans.groupBy(_.index).forall { case (_, ps) => ps.map(_.part).sorted == Seq(0, 1) })
    def slice(s: Jp2Codec.TilePartSpan): Array[Byte] =
      java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
    // grouped slices reassemble the image exactly
    val rebuilt = Array.fill(3)(new Array[Int](w * h))
    for ((_, parts) <- spans.groupBy(_.index)) {
      val t = Jp2Codec.decodeTileParts(parts.sortBy(_.part).map(slice), hdr)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        rebuilt(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
    }
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(rebuilt(c), comps(c)), s"c=$c")
    // a full decode missing a part must fail typed, not decode garbage
    val tile0 = spans.filter(_.index == 0).sortBy(_.part)
    val e1 = intercept[IllegalArgumentException](
      Jp2Codec.decodeTileParts(Seq(slice(tile0.head)), hdr))
    assert(e1.getMessage.contains("needs all"), e1.getMessage)
    // out-of-order or mixed-tile slices fail typed
    val e2 = intercept[IllegalArgumentException](
      Jp2Codec.decodeTileParts(tile0.reverse.map(slice), hdr))
    assert(e2.getMessage.contains("TPsot order"), e2.getMessage)
    val other = spans.filter(_.index == 1).sortBy(_.part)
    val e3 = intercept[IllegalArgumentException](
      Jp2Codec.decodeTileParts(Seq(slice(tile0.head), slice(other.last)), hdr))
    assert(e3.getMessage.contains("different tiles"), e3.getMessage)
  }

  test("reduced and quality ranged walks group multi-tile-part tiles correctly") {
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      partsPerTile = 2)
    val hdr = Jp2Codec.header(cs)
    val ref = Jp2Codec.decodeReduced(cs, 2)

    // REDUCED: parts past the kept-resolution prefix are DROPPED from the
    // span list entirely (the byte win of the tile-part split), and the
    // remaining (possibly truncated) slices decode the exact thumbnail
    val reduced = Jp2Codec.tilePartsReduced(cs, 2)
    val full = Jp2Codec.tileParts(cs)
    assert(reduced.length < full.length, "high-res-only parts must be dropped")
    val (rBytes, fBytes) = (reduced.map(_.len).sum, full.map(_.len).sum)
    assert(rBytes * 2 < fBytes, s"reduced $rBytes vs full $fBytes bytes")
    def slice(s: Jp2Codec.TilePartSpan): Array[Byte] =
      java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
    for ((_, parts) <- reduced.groupBy(_.index)) {
      val t = Jp2Codec.decodeTileParts(parts.sortBy(_.part).map(slice), hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          ref.comps(c)((t.y0 + y) * ref.width + (t.x0 + x)),
          s"tile ${parts.head.index} c=$c px($x,$y)")
    }

    // QUALITY: per-TILE compacted ranges across the parts; keep=layers is
    // exact, keep=1 fetches a fraction
    val fullD = Jp2Codec.decode(cs)
    val (_, q2) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 2)
    assert(q2.map(_.index).sorted == (0 until 6), "one RangedTilePart per TILE")
    for (part <- q2) {
      val sl = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) sl.write(cs, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTilePartQuality(sl.toByteArray, hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          fullD.comps(c)((t.y0 + y) * fullD.width + (t.x0 + x)),
          s"tile ${part.index} c=$c px($x,$y)")
    }
    val (_, q1) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 1)
    assert(q1.map(_.fetchBytes).sum < q2.map(_.fetchBytes).sum)
    for (part <- q1) {
      val sl = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) sl.write(cs, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTilePartQuality(sl.toByteArray, hdr, 1)
      assert(t.width > 0 && t.height > 0) // full-res decode from layer-1 bytes
    }
  }

  test("single-layer streams keep the LRCP byte; LRCP multi-layer decodes whole-file, rejects ranged") {
    val comps = Array(pattern(48, 40, 3))
    val one = Jp2Codec.encode(48, 40, comps, levels = 2)
    // COD progression byte: offset SOC(2) + SIZ(2+41 for nc=1) + COD marker(2)+len(2)+Scod(1)
    val codAt = 2 + 2 + (38 + 3) + 2 + 2 + 1
    assert(one(codAt) == 0, "single-layer must stay LRCP (byte-stable streams)")
    val two = Jp2Codec.encode(48, 40, comps, levels = 2, layers = 2)
    assert(two(codAt) == 1, "multi-layer must default to RLCP (low-res prefix)")
    // r18 (general progression iterator): true LRCP multi-layer is
    // ADMITTED on whole-file decode — layer-outermost interleaves
    // resolutions, which the packetOrder-driven walk follows exactly
    val lrcp2 = Jp2Codec.encode(48, 40, comps, levels = 2, layers = 2,
      prog = Jp2Codec.LRCP)
    assert(lrcp2(codAt) == 0 && !lrcp2.sameElements(two),
      "explicit LRCP multi-layer must reorder packets")
    assert(java.util.Arrays.equals(Jp2Codec.decode(lrcp2).comps(0), comps(0)))
    // ...but the byte-prefix REDUCED walk needs resolution outermost:
    // RANGED use rejects with its own typed error, distinct from decode
    val e = intercept[IllegalArgumentException](Jp2Codec.decodeReduced(lrcp2, 1))
    assert(e.getMessage.contains("not resolution-major"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Jp2Codec.tilePartsReduced(lrcp2, 1))
    assert(e2.getMessage.contains("not resolution-major"), e2.getMessage)
  }

  test("review-hardened rejections: no-PLT quality truncation, Lplt overflow, short segments") {
    // quality truncation REQUIRES PLT: a no-PLT tile-part's full span is
    // the one layout the truncated walk cannot parse — reject, not decode
    val cs2 = Jp2Codec.encode(64, 48, Array(pattern(64, 48, 4)), levels = 2, layers = 2)
    // strip the PLT segment from the (single) tile-part: splice bytes out
    val spans = Jp2Codec.tileParts(cs2)
    val sotAt = spans.head.pos.toInt
    // tile-part header: SOT(12) then PLT marker(2)+Lplt(2)+payload
    assert(((cs2(sotAt + 12) & 0xFF) << 8 | (cs2(sotAt + 13) & 0xFF)) == 0xFF58)
    val lplt = ((cs2(sotAt + 14) & 0xFF) << 8) | (cs2(sotAt + 15) & 0xFF)
    val cut = 2 + lplt
    val noPlt = new java.io.ByteArrayOutputStream()
    noPlt.write(cs2, 0, sotAt + 12)
    noPlt.write(cs2, sotAt + 12 + cut, cs2.length - sotAt - 12 - cut)
    val stripped = noPlt.toByteArray
    // patch Psot down by the removed bytes (u32 at sot+6)
    val psot = ((stripped(sotAt + 6) & 0xffL) << 24) | ((stripped(sotAt + 7) & 0xffL) << 16) |
      ((stripped(sotAt + 8) & 0xffL) << 8) | (stripped(sotAt + 9) & 0xffL)
    val np = psot - cut
    stripped(sotAt + 6) = ((np >> 24) & 0xff).toByte
    stripped(sotAt + 7) = ((np >> 16) & 0xff).toByte
    stripped(sotAt + 8) = ((np >> 8) & 0xff).toByte
    stripped(sotAt + 9) = (np & 0xff).toByte
    assert(Jp2Codec.decode(stripped).width == 64, "stripped stream must still full-decode")
    val e1 = intercept[IllegalArgumentException](
      Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(stripped), 1))
    assert(e1.getMessage.contains("no PLT"))
    // keep == layers is fine without PLT (full span == compacted layout)
    assert(Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(stripped), 2)._2.nonEmpty)

    // Lplt is 16-bit: a layer count whose PLT would overflow must fail
    // at ENCODE time, not emit a stream whose own header walk misparses
    val e2 = intercept[IllegalArgumentException](
      Jp2Codec.encode(32, 32, Array(pattern(32, 32, 6)), levels = 3, layers = 17000))
    assert(e2.getMessage.contains("Lplt"))

    // an in-bounds but too-short COD payload fails TYPED, not with a raw
    // index error (lseg=4 -> 2-byte payload, fields need 10)
    val cs3 = Jp2Codec.encode(32, 32, Array(pattern(32, 32, 8)))
    val sizLen = ((cs3(4) & 0xFF) << 8) | (cs3(5) & 0xFF)
    val codAt = 4 + sizLen // COD marker offset
    val bad = new java.io.ByteArrayOutputStream()
    bad.write(cs3, 0, codAt + 2)
    bad.write(0); bad.write(4) // Lcod = 4
    bad.write(cs3, codAt + 4, 2) // keep 2 payload bytes
    bad.write(cs3, codAt + 2 + 14, cs3.length - codAt - 16) // skip the rest of real COD
    val e3 = intercept[IllegalArgumentException](Jp2Codec.decode(bad.toByteArray))
    assert(e3.getMessage.contains("shorter than"))
  }

  test("property: random profile combinations round-trip across the full encoder surface") {
    // the cross-product the fixed-size tests only sample: random dims x
    // levels x tile grid x layers x tile-parts x channels x transform.
    // Reversible must be bit-exact; irreversible bounded by the step
    // (coefficient error <= delta, amplified by the bounded synthesis
    // l1 norms -> maxErr <= 8*delta + 4 is generous but meaningful).
    for (seed <- 1 to 14) {
      val r = rng(77000L + seed)
      val levels = r.nextInt(4) // 0..3
      val w = 20 + r.nextInt(100)
      val h = 20 + r.nextInt(100)
      val tileSize = if (r.nextBoolean()) 0 else (1 << levels) * (1 + r.nextInt(6))
      val layers = 1 + r.nextInt(3)
      val parts = 1 + r.nextInt(math.min(levels + 1, 3))
      val nc = if (r.nextBoolean()) 3 else 1
      val irrev = r.nextBoolean()
      val qShift = if (!irrev) 0 else Seq(-3, -1, 0, 1)(r.nextInt(4))
      // r17: precincts (explicit small sizes force multi-precinct grids
      // and capped code-blocks), SOP/EPH markers
      val precinctExp = Seq(15, 15, 3, 4, 5, 6, 7)(r.nextInt(7))
      val sop = r.nextInt(3) == 0
      val eph = r.nextInt(3) == 0
      // r17: the QCD shape axis — norm-weighted expounded steps and the
      // style-1 derived signalling join the uniform profile
      val quantMode = if (!irrev) "uniform"
                      else Seq("uniform", "uniform", "norms", "derived")(r.nextInt(4))
      // r17: code-block style options (bypass / reset / per-pass
      // termination / vertically-causal / segsym, alone and combined)
      val blockStyle = Seq(0, 0, 0x02, 0x08, 0x20, 0x2A, 0x01, 0x04, 0x05, 0x2F)(r.nextInt(10))
      // r17: per-component QCC chroma override (uniform 3-comp lossy only)
      val chromaQ = if (irrev && nc == 3 && quantMode == "uniform" && r.nextBoolean())
        Seq(-4, -2, 1)(r.nextInt(3)) else 99
      val comps = Array.tabulate(nc) { c =>
        Array.tabulate(w * h) { j =>
          if (r.nextInt(3) == 0) r.nextInt(256)
          else ((j % w) * (3 + c) + (j / w) * (5 + c)) % 256
        }
      }
      val label = s"seed=$seed ${w}x$h levels=$levels tile=$tileSize " +
        s"layers=$layers parts=$parts nc=$nc irrev=$irrev q=$qShift " +
        s"pp=$precinctExp sop=$sop eph=$eph quant=$quantMode style=$blockStyle cq=$chromaQ"
      val cs = Jp2Codec.encode(w, h, comps, levels, tileSize, layers, parts,
        irrev, qShift, precinctExp, sop, eph, quantMode, blockStyle, chromaQ)
      val hdr = Jp2Codec.header(cs)
      assert(hdr.layers == layers && hdr.irreversible == irrev &&
        hdr.pp == precinctExp && hdr.sop == sop && hdr.eph == eph &&
        hdr.blockStyle == blockStyle, label)
      // hdr.qShift is the LL step exponent offset: the encoder knob for
      // uniform AND derived (eps_0 = Prec + qShift both ways); norms
      // weights the LL by its synthesis norm so only a range holds
      if (quantMode != "norms") assert(hdr.qShift == qShift, label)
      else assert(hdr.qShift >= qShift, s"$label llShift=${hdr.qShift}")
      val out = Jp2Codec.decode(cs)
      assert(out.width == w && out.height == h && out.comps.length == nc, label)
      if (!irrev) {
        for (c <- 0 until nc)
          assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"$label c=$c")
      } else {
        // per-band steps from the PARSED header (style-1 expansion and
        // the mu arithmetic included), so the bound itself exercises the
        // QCD read-back: coefficient error <= delta_b, amplified by the
        // bounded synthesis l1 norms -> 8*deltaMax + 4 (generous but
        // catches any amplitude/sign/indexing slip)
        val deltaMax = (for (c <- 0 until nc; i <- 0 until 3 * levels + 1)
          yield hdr.qFor(c).delta(i, graft.sources.jp2.Jp2Codec.Quant.gainOf(i))).max
        val bound = (8 * deltaMax + 4).toInt
        val maxErr = (0 until nc).map(c =>
          out.comps(c).zip(comps(c)).map { case (x, y) => math.abs(x - y) }.max).max
        assert(maxErr <= bound, s"$label maxErr=$maxErr > $bound")
      }
      // the reduced walk holds for every combination too (dims only —
      // pixel exactness is pinned by the dedicated tests)
      if (levels > 0) {
        val red = Jp2Codec.decodeReduced(cs, 1)
        assert(red.width == (w + 1) / 2 && red.height == (h + 1) / 2, label)
      }
    }
  }

  test("code-block style options: round-trips, segsym error detection, rejections") {
    val (w, h) = (96, 80)
    val comps = Array(pattern(w, h, 7), pattern(w, h, 31), pattern(w, h, 63))
    val base = Jp2Codec.decode(Jp2Codec.encode(w, h, comps, levels = 2))
    for (style <- Seq(0x02, 0x08, 0x20, 0x2A, 0x01, 0x04, 0x05, 0x2F)) {
      // reversible + any in-profile style combination stays bit-exact
      // AND equals the style-0 decode (options change the coded bits,
      // never the coefficients)
      val cs = Jp2Codec.encode(w, h, comps, levels = 2, layers = 2, blockStyle = style)
      assert(Jp2Codec.header(cs).blockStyle == style)
      val out = Jp2Codec.decode(cs)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), base.comps(c)), s"style=$style c=$c")
      // quality truncation (verifiedTrunc under the style's own decode
      // semantics) still reconstructs something bounded, not garbage
      val red = Jp2Codec.decodeReduced(cs, 1)
      assert(red.width == (w + 1) / 2)
    }
    // the segmentation symbol has teeth: corrupting a codeword byte in a
    // segsym stream is DETECTED as the typed contract error (a plain
    // stream would silently decode different pixels)
    val segCs = Jp2Codec.encode(w, h, comps, levels = 0, blockStyle = 0x20)
    val sodAt = (0 until segCs.length - 1).indexWhere(i =>
      (segCs(i) & 0xFF) == 0xFF && (segCs(i + 1) & 0xFF) == 0x93)
    val bad = segCs.clone()
    bad(sodAt + 20) = (bad(sodAt + 20) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](Jp2Codec.decode(bad))
    assert(e.getMessage.contains("segmentation symbol"), e.getMessage)
    // predictable termination (0x10): the encoder never writes it, but
    // the DECODING procedure is defined to be identical (C.2.10 only
    // constrains the encoder's flush spare bits for error resilience),
    // so a foreign stream carrying the flag decodes to the same pixels
    intercept[IllegalArgumentException](
      Jp2Codec.encode(w, h, comps, levels = 2, blockStyle = 0x10))
    val cs0 = Jp2Codec.encode(w, h, comps, levels = 2)
    val codAt = (0 until cs0.length - 1).indexWhere(i =>
      (cs0(i) & 0xFF) == 0xFF && (cs0(i + 1) & 0xFF) == 0x52)
    val tol = cs0.clone()
    tol(codAt + 12) = 0x10.toByte
    // the RAW signaled style survives into the Header (r18, advice):
    // diagnostics/re-encode must reflect the stream, and only the
    // Tier-1 view masks the behavior-neutral bit
    val tolHdr = Jp2Codec.header(tol)
    assert(tolHdr.blockStyle == 0x10 && tolHdr.tier1Style == 0x00)
    val outTol = Jp2Codec.decode(tol)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(outTol.comps(c), base.comps(c)),
        "predictable-termination flag must not change the decode")
    // undefined style bits (0x40+) still reject loudly
    val t = cs0.clone()
    t(codAt + 12) = 0x40.toByte
    val e2 = intercept[IllegalArgumentException](Jp2Codec.decode(t))
    assert(e2.getMessage.contains("code-block style"), e2.getMessage)
  }

  test("QCC per-component overrides: chroma quantized coarser, parsed and applied") {
    val (w, h) = (96, 80)
    val comps = Array(pattern(w, h, 7), pattern(w, h, 31), pattern(w, h, 63))
    val cs = Jp2Codec.encode(w, h, comps, levels = 2, irreversible = true,
      qShift = 0, chromaQShift = -3)
    val hdr = Jp2Codec.header(cs)
    // structural contract: two QCC markers, luma untouched, chroma at
    // the coarser uniform shape
    assert(hdr.qcc.keySet == Set(1, 2))
    assert(hdr.qFor(0).eps(0) == 8 && hdr.qFor(1).eps(0) == 5 && hdr.qFor(2).eps(0) == 5)
    assert(hdr.qShift == 0, "Header.qShift is component 0's LL offset")
    val out = Jp2Codec.decode(cs)
    val (err, psnr) = errStats(out, comps)
    // chroma step 8 in ICT space spreads across RGB via the inverse —
    // bounded, clearly lossier than luma-only, still structured
    assert(err <= 48 && psnr >= 22, s"qcc maxErr=$err psnr=$psnr")
    // the override must actually be APPLIED: dropping the QCC markers
    // (decode believing chroma used the luma step) must change pixels
    val noQcc = Jp2Codec.encode(w, h, comps, levels = 2, irreversible = true, qShift = 0)
    assert(!java.util.Arrays.equals(out.comps(2), Jp2Codec.decode(noQcc).comps(2)))
    // a QCC naming a component outside Csiz rejects loudly
    val qccAt = (0 until cs.length - 1).indexWhere(i =>
      (cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x5D)
    val bad = cs.clone()
    bad(qccAt + 4) = 7 // Cqcc = 7 > nc
    val e = intercept[IllegalArgumentException](Jp2Codec.decode(bad))
    assert(e.getMessage.contains("QCC component"), e.getMessage)
    // reversible + chromaQShift is a contradiction the encoder refuses
    intercept[IllegalArgumentException](
      Jp2Codec.encode(w, h, comps, levels = 2, chromaQShift = -2))
  }

  test("norm-weighted and derived quantization: QCD shapes, expansion, round-trip") {
    val (w, h) = (96, 80)
    val comps = Array(pattern(w, h, 3))

    // "norms": style 2 with genuinely non-uniform per-band steps — the
    // signaled exponents must differ across bands, at least one band
    // must carry a nonzero mantissa, and the reconstruction must stay
    // archival-quality at qShift = -2 (same PSNR floor as the uniform
    // profile's dedicated test)
    val csN = Jp2Codec.encode(w, h, comps, levels = 3, irreversible = true,
      qShift = -2, quantMode = "norms")
    val qN = Jp2Codec.header(csN).q
    assert(qN.eps.distinct.size >= 2, s"norms eps not non-uniform: ${qN.eps}")
    assert(qN.mu.exists(_ != 0), s"norms mantissas all zero: ${qN.mu}")
    val outN = Jp2Codec.decode(csN)
    val (errN, psnrN) = errStats(outN, comps)
    assert(errN <= 32 && psnrN >= 28, s"norms maxErr=$errN psnr=$psnrN")

    // "derived": style 1 signals ONE (eps_0, mu_0) in a 5-byte QCD; the
    // parsed header must carry the E-5 expansion eps_b = eps_0 - (r-1),
    // mu_b = mu_0 — pinned against a hand-written vector, not the
    // codec's own expander
    val csD = Jp2Codec.encode(w, h, comps, levels = 2, irreversible = true,
      qShift = 0, quantMode = "derived")
    val qcdAt = (0 until csD.length - 1).indexWhere(i =>
      (csD(i) & 0xFF) == 0xFF && (csD(i + 1) & 0xFF) == 0x5C)
    assert(((csD(qcdAt + 2) & 0xFF) << 8 | (csD(qcdAt + 3) & 0xFF)) == 5,
      "style-1 QCD must signal exactly one (eps, mu)")
    assert((csD(qcdAt + 4) & 0x1F) == 1, "Sqcd style must be 1")
    val qD = Jp2Codec.header(csD).q
    // levels=2 bands: LL, (HL1,LH1,HH1) at r=1, (HL2,LH2,HH2) at r=2;
    // eps_0 = 8, so E-5 gives 8, 8,8,8, 7,7,7 with mu = 1024 everywhere
    assert(qD.eps == Vector(8, 8, 8, 8, 7, 7, 7), s"derived eps ${qD.eps}")
    assert(qD.mu == Vector.fill(7)(1024), s"derived mu ${qD.mu}")
    val outD = Jp2Codec.decode(csD)
    val (errD, psnrD) = errStats(outD, comps)
    // derived quantizes fine detail coarsely by design (step doubles per
    // finer resolution, x1.5 mantissa): bounded, not near-lossless
    assert(errD <= 48 && psnrD >= 22, s"derived maxErr=$errD psnr=$psnrD")
  }

  test("precinct streams round-trip and keep the full ranged machinery exact") {
    // r17: explicit precincts (B.6) — 32x32 on every resolution grid, so
    // r=3 of a 64-tile has 2x2 precincts and the band code-blocks are
    // capped at 16x16 (ppb = 4). Pixels must equal the one-precinct
    // stream's decode bit-for-bit (precincts only re-packet the same
    // subband data), and both ranged walkers must stay exact on the
    // precinct-dependent per-tile packet counts.
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val base = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2)
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      precinctExp = 5)
    val hdr = Jp2Codec.header(cs)
    assert(hdr.pp == 5)
    val ref = Jp2Codec.decode(base)
    val out = Jp2Codec.decode(cs)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), ref.comps(c)), s"c=$c")
    // reduced walk: PLT-truncated spans decode the exact thumbnail
    val red = Jp2Codec.decodeReduced(cs, 2)
    val redRef = Jp2Codec.decodeReduced(base, 2)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(red.comps(c), redRef.comps(c)), s"red c=$c")
    val reduced = Jp2Codec.tilePartsReduced(cs, 2)
    assert(reduced.map(_.len).sum * 2 < Jp2Codec.tileParts(cs).map(_.len).sum)
    for (s <- reduced) {
      val slice = java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
      val t = Jp2Codec.decodeTilePart(slice, hdr, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          red.comps(c)((t.y0 + y) * red.width + (t.x0 + x)), s"tile ${s.index}")
    }
    // quality walk: keep = layers is exact from compacted precinct slices
    val (qh, parts) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 2)
    val planes = Array.fill(3)(new Array[Int](w * h))
    for (part <- parts) {
      val slice = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) slice.write(cs, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTilePartQuality(slice.toByteArray, qh, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        planes(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
    }
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(planes(c), ref.comps(c)), s"quality c=$c")
    // keep=1 fetches a fraction and still parses the precinct layout
    val (q1h, p1) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 1)
    assert(p1.map(_.fetchBytes).sum < parts.map(_.fetchBytes).sum)
    for (part <- p1) {
      val slice = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) slice.write(cs, from.toInt, (until - from).toInt)
      Jp2Codec.decodeTilePartQuality(slice.toByteArray, q1h, 1) // must parse exactly
    }
    // multi tile-part + precincts compose
    val mp = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      partsPerTile = 2, precinctExp = 5)
    val mpOut = Jp2Codec.decode(mp)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(mpOut.comps(c), ref.comps(c)), s"mp c=$c")
  }

  test("16-bit components (r18c): reversible bit-exact, lossy bounded, walkers unchanged") {
    val (w, h) = (96, 70)
    // 16-bit gray master — the deep-scan archival shape; values span
    // the full unsigned range
    val deep = Array(Array.tabulate(w * h)(j => (j * 523 + 11) % 65536))
    val rev = Jp2Codec.encode(w, h, Array(deep(0)), levels = 3, tileSize = 64,
      bitDepth = 16)
    val hdr = Jp2Codec.header(rev)
    assert(hdr.prec == 16)
    assert(java.util.Arrays.equals(Jp2Codec.decode(rev).comps(0), deep(0)),
      "16-bit reversible must round-trip bit-exactly")
    // reduced walk: the PLT prefix machinery is depth-agnostic
    val red = Jp2Codec.decodeReduced(rev, 2)
    assert(red.width == 24 && red.height == 18)
    // 16-bit RGB through the RCT, with layers + quality walk
    val rgb = Array.tabulate(3)(c => Array.tabulate(w * h)(j => (j * (523 + 2 * c) + c) % 65536))
    val rgbCs = Jp2Codec.encode(w, h, rgb, levels = 2, layers = 2, bitDepth = 16)
    val out = Jp2Codec.decode(rgbCs)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), rgb(c)), s"rgb16 c=$c")
    // lossy 16-bit: E.1.1 steps against Rb = 16 + gain; qShift -2 is a
    // step of 4 SIXTEEN-BIT units — same relative shape as 8-bit
    val lossy = Jp2Codec.encode(w, h, Array(deep(0)), levels = 3,
      irreversible = true, qShift = -2, bitDepth = 16)
    assert(Jp2Codec.header(lossy).prec == 16 &&
      Jp2Codec.header(lossy).qShift == -2)
    val lout = Jp2Codec.decode(lossy)
    var maxE = 0
    for (i <- 0 until w * h)
      maxE = math.max(maxE, math.abs(lout.comps(0)(i) - deep(0)(i)))
    assert(maxE <= 32, s"16-bit lossy step-4 max err $maxE out of the calibrated envelope")
    // signed components stay rejected typed
    val signedSiz = rev.clone()
    // SOC(2) + SIZ marker(2) + Lsiz(2) + Rsiz(2) + 8 u32 + Csiz(2) = offset of Ssiz_0
    val ssizAt = 2 + 2 + 2 + 2 + 32 + 2
    assert((signedSiz(ssizAt) & 0xFF) == 15, "Ssiz byte aim")
    signedSiz(ssizAt) = (0x80 | 15).toByte
    val e = intercept[IllegalArgumentException](Jp2Codec.decode(signedSiz))
    assert(e.getMessage.contains("signed"), e.getMessage)
  }

  test("per-tile QCD retunes (r18b): each tile reconstructs at its own step; walkers ride the overrides") {
    val (w, h) = (128, 96)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    // 2x2 64-tile grid, per-tile steps 8 / 1 / 4 / 2 (tile 0 keeps the
    // main QCD's -3? no: main qShift -2 = step 4; tiles 1..3 retuned)
    val shifts = Seq(-3, 0, -2, -1)
    val cs = Jp2Codec.encode(w, h, comps, levels = 2, tileSize = 64,
      irreversible = true, qShift = -2, tileQShifts = shifts)
    val hdr = Jp2Codec.header(cs)
    assert(hdr.qShift == -2, "main header keeps the COD-level qShift")
    val out = Jp2Codec.decode(cs)
    def maxErrIn(tx: Int, ty: Int): Int = {
      var m = 0
      for (c <- 0 until 3; y <- ty * 64 until math.min(h, (ty + 1) * 64);
           x <- tx * 64 until math.min(w, (tx + 1) * 64))
        m = math.max(m, math.abs(out.comps(c)(y * w + x) - comps(c)(y * w + x)))
      m
    }
    // per-tile error tracks each tile's OWN step: the step-1 tile must
    // beat the step-8 tile, and a decoder ignoring the tile QCD would
    // reconstruct tile 0 at 2x amplitude (err >> 8)
    assert(maxErrIn(1, 0) < maxErrIn(0, 0),
      s"retuned steps must order the per-tile error (${maxErrIn(1, 0)} vs ${maxErrIn(0, 0)})")
    // bound per tile at 4x its step — the l5m-calibrated envelope for
    // 9/7 multi-band error accumulation (step 4 decodes to max err
    // ~13-28 across this corpus family, never 2x-amplitude territory)
    assert(maxErrIn(0, 0) <= 32 && maxErrIn(1, 0) <= 4 &&
      maxErrIn(0, 1) <= 16 && maxErrIn(1, 1) <= 8,
      s"per-tile max errors ${Seq(maxErrIn(0,0), maxErrIn(1,0), maxErrIn(0,1), maxErrIn(1,1))} exceed 4x their steps")
    // the ranged walkers resolve the per-tile effective header from the
    // first tile-part's markers: reduced spans decode the exact thumbnail
    val red = Jp2Codec.decodeReduced(cs, 1)
    val spans = Jp2Codec.tilePartsReduced(cs, 1)
    for (s <- spans) {
      val slice = java.util.Arrays.copyOfRange(cs, s.pos.toInt, (s.pos + s.len).toInt)
      val t = Jp2Codec.decodeTilePart(slice, hdr, 1)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        assert(t.comps(c)(y * t.width + x) ==
          red.comps(c)((t.y0 + y) * red.width + (t.x0 + x)), s"tile ${s.index}")
    }
    // override markers outside the first tile-part reject typed
    val mp = Jp2Codec.encode(w, h, comps, levels = 2, tileSize = 64,
      irreversible = true, qShift = -2, tileQShifts = shifts, partsPerTile = 2)
    assert(java.util.Arrays.equals(Jp2Codec.decode(mp).comps(0), out.comps(0)),
      "tile QCD + multi tile-part must compose")
  }

  test("COC chroma decomposition levels (r18b): lossless round-trip, sizing rule, ranged rejection") {
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    // reversible: fewer chroma levels is still LOSSLESS — bit-exact
    val rev = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, chromaLevels = 1)
    val hdr = Jp2Codec.header(rev)
    assert(hdr.coc == Map(1 -> Jp2Codec.CompCoding(1, 0), 2 -> Jp2Codec.CompCoding(1, 0)))
    assert(hdr.qcc.keySet == Set(1, 2) && hdr.qcc(1).eps.length == 4,
      "COC'd components need a QCC sized for their own pyramid")
    assert(hdr.levelsFor(0) == 3 && hdr.levelsFor(1) == 1 && !hdr.uniformLevels)
    val out = Jp2Codec.decode(rev)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(out.comps(c), comps(c)), s"c=$c")
    // the byte-prefix reduced walk rejects typed (a chroma top-res
    // packet sits inside a lower global group); whole-file decode fine
    val e = intercept[IllegalArgumentException](Jp2Codec.tilePartsReduced(rev, 1))
    assert(e.getMessage.contains("COC"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](Jp2Codec.decodeReduced(rev, 1))
    assert(e2.getMessage.contains("COC"), e2.getMessage)
    // lossy + layers: quality walker rides per-component pyramids
    val lossy = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64,
      irreversible = true, qShift = -2, layers = 2, chromaLevels = 2)
    val ref = Jp2Codec.decode(lossy)
    // step-4 quantization: pixel-domain error accumulates across bands
    // through the inverse DWT + ICT — the l5m-calibrated envelope for
    // this step is max err 32 (a 2x-amplitude bug would show ~250)
    for (c <- 0 until 3; i <- 0 until w * h)
      assert(math.abs(ref.comps(c)(i) - comps(c)(i)) <= 32, s"lossy COC err at c=$c i=$i")
    val (qh, qparts) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(lossy), 2)
    val planes = Array.fill(3)(new Array[Int](w * h))
    for (part <- qparts) {
      val slice = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) slice.write(lossy, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTilePartQuality(slice.toByteArray, qh, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        planes(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
    }
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(planes(c), ref.comps(c)), s"quality c=$c")
    // a QCD mis-sized for a COC'd component (no QCC) rejects typed:
    // strip both QCC markers from the reversible stream
    val stripped = {
      val outB = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < rev.length) {
        if (i + 1 < rev.length && (rev(i) & 0xFF) == 0xFF && (rev(i + 1) & 0xFF) == 0x5D) {
          val l = ((rev(i + 2) & 0xFF) << 8) | (rev(i + 3) & 0xFF)
          i += 2 + l
        } else { outB.write(rev(i)); i += 1 }
      }
      outB.toByteArray
    }
    val e3 = intercept[IllegalArgumentException](Jp2Codec.decode(stripped))
    assert(e3.getMessage.contains("needs a QCC"), e3.getMessage)
  }

  test("progression orders (r18): RPCL/PCRL/CPRL reorder the same packets; walkers follow or reject typed") {
    val (w, h) = (130, 97)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    val base = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      precinctExp = 5)
    val ref = Jp2Codec.decode(base)

    // RPCL — the pairing real Kakadu-style random-access masters ship
    // (precincts + resolution-major position order). Packet CONTENT is
    // order-independent (tag-tree/Lblock state is per-precinct and each
    // precinct's layers stay ascending under every A.6.1 order), so the
    // stream is the same bytes re-ordered: same length, same pixels.
    val rpcl = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
      precinctExp = 5, prog = Jp2Codec.RPCL)
    assert(Jp2Codec.header(rpcl).prog == Jp2Codec.RPCL)
    assert(!rpcl.sameElements(base) && rpcl.length == base.length,
      "RPCL must emit the same packets in a different order")
    val outR = Jp2Codec.decode(rpcl)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(outR.comps(c), ref.comps(c)), s"rpcl c=$c")
    // RPCL is resolution-major: the byte-prefix reduced walk stays exact
    val redR = Jp2Codec.decodeReduced(rpcl, 2)
    val redRef = Jp2Codec.decodeReduced(base, 2)
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(redR.comps(c), redRef.comps(c)), s"rpcl red c=$c")
    // quality walker on RPCL: kept layer-0 packets interleave per
    // precinct (NOT one run per resolution) — keep=2 exact, keep=1 parses
    val (qh, parts) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(rpcl), 2)
    val planes = Array.fill(3)(new Array[Int](w * h))
    for (part <- parts) {
      val slice = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) slice.write(rpcl, from.toInt, (until - from).toInt)
      val t = Jp2Codec.decodeTilePartQuality(slice.toByteArray, qh, 2)
      for (c <- 0 until 3; y <- 0 until t.height; x <- 0 until t.width)
        planes(c)((t.y0 + y) * w + (t.x0 + x)) = t.comps(c)(y * t.width + x)
    }
    for (c <- 0 until 3)
      assert(java.util.Arrays.equals(planes(c), ref.comps(c)), s"rpcl quality c=$c")
    val (q1h, p1) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(rpcl), 1)
    assert(p1.map(_.fetchBytes).sum < parts.map(_.fetchBytes).sum)
    for (part <- p1) {
      val slice = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) slice.write(rpcl, from.toInt, (until - from).toInt)
      Jp2Codec.decodeTilePartQuality(slice.toByteArray, q1h, 1) // must parse exactly
    }
    // region walker on RPCL: crop pixels bit-exact vs the RLCP fetch
    val crop = (40, 30, 100, 80)
    def cropSum(cs: Array[Byte]): Seq[Long] = {
      val hdr2 = Jp2Codec.header(cs)
      val (_, rps) = Jp2Codec.tilePartsRegion(new Jp2Codec.BytesInput(cs),
        crop._1, crop._2, crop._3, crop._4)
      val sums = Array.fill(3)(0L)
      for (part <- rps) {
        val slice = new java.io.ByteArrayOutputStream()
        for ((from, until) <- part.ranges) slice.write(cs, from.toInt, (until - from).toInt)
        val t = Jp2Codec.decodeTileRegion(slice.toByteArray, hdr2,
          crop._1, crop._2, crop._3, crop._4)
        val ix0 = math.max(crop._1, t.x0); val ix1 = math.min(crop._3, t.x0 + t.width)
        val iy0 = math.max(crop._2, t.y0); val iy1 = math.min(crop._4, t.y0 + t.height)
        for (c <- 0 until 3; y <- iy0 until iy1; x <- ix0 until ix1)
          sums(c) += t.comps(c)((y - t.y0) * t.width + (x - t.x0))
      }
      sums.toSeq
    }
    assert(cropSum(rpcl) == cropSum(base), "RPCL region fetch must match RLCP's")

    // PCRL / CPRL: admitted whole-file (the general iterator), but NOT
    // resolution-major — the ranged reduced walk rejects with the typed
    // RANGED-use error while full decode stays exact
    for (prog <- Seq(Jp2Codec.PCRL, Jp2Codec.CPRL)) {
      val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
        precinctExp = 5, prog = prog)
      assert(Jp2Codec.header(cs).prog == prog)
      val out = Jp2Codec.decode(cs)
      for (c <- 0 until 3)
        assert(java.util.Arrays.equals(out.comps(c), ref.comps(c)), s"prog=$prog c=$c")
      val e = intercept[IllegalArgumentException](Jp2Codec.tilePartsReduced(cs, 1))
      assert(e.getMessage.contains("not resolution-major"), e.getMessage)
      // quality truncation keeps working position-major: the kept set
      // comes from the shared packetOrder, not a prefix assumption
      val (qh3, p3) = Jp2Codec.tilePartsQuality(new Jp2Codec.BytesInput(cs), 1)
      for (part <- p3) {
        val slice = new java.io.ByteArrayOutputStream()
        for ((from, until) <- part.ranges) slice.write(cs, from.toInt, (until - from).toInt)
        Jp2Codec.decodeTilePartQuality(slice.toByteArray, qh3, 1)
      }
    }
    // tile-part splits need resolution outermost — typed encoder reject
    val eTp = intercept[IllegalArgumentException](
      Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 64, layers = 2,
        partsPerTile = 2, prog = Jp2Codec.PCRL))
    assert(eTp.getMessage.contains("resolution-major"), eTp.getMessage)
  }

  test("SOP/EPH streams round-trip; a missing flagged EPH fails loudly") {
    val (w, h) = (67, 41)
    val comps = Array(pattern(w, h, 7))
    val plain = Jp2Codec.encode(w, h, comps, levels = 2)
    val cs = Jp2Codec.encode(w, h, comps, levels = 2, sop = true, eph = true)
    assert(cs.length > plain.length) // the markers are really in there
    val hdr = Jp2Codec.header(cs)
    assert(hdr.sop && hdr.eph)
    assert(java.util.Arrays.equals(Jp2Codec.decode(cs).comps(0), comps(0)))
    // reduced + quality walks span SOP/EPH bytes via the PLT lengths
    assert(java.util.Arrays.equals(Jp2Codec.decodeReduced(cs, 1).comps(0),
      Jp2Codec.decodeReduced(plain, 1).comps(0)))
    // flip the first EPH marker's second byte: the decoder must refuse
    val ephAt = {
      var i = 0
      while (i + 1 < cs.length && !((cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x92)) i += 1
      i
    }
    val bad = cs.clone(); bad(ephAt + 1) = 0x7F
    intercept[Exception](Jp2Codec.decode(bad))
  }

  test("precinct-granular region fetch: crop pixels bit-exact from a fraction of the bytes") {
    // the point of precincts: a crop fetch reads only the packets of
    // precincts inside the dilated crop, NOT whole tiles. The margin
    // (RegionMargin resolution samples) must make every pixel inside the
    // crop bit-exact even though out-of-region coefficients stay zero.
    val (w, h) = (384, 192)
    val comps = Array(pattern(w, h, 0), pattern(w, h, 29), pattern(w, h, 58))
    // one big tile + 32x32 precincts: tile-granular fetch would read the
    // whole file, precinct-granular reads the crop's neighborhood
    val cs = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 0, layers = 2,
      precinctExp = 5)
    val full = Jp2Codec.decode(cs)
    val (cx0, cy0, cx1, cy1) = (200, 80, 280, 140)
    val in = new Jp2Codec.CountingInput(new Jp2Codec.BytesInput(cs))
    val (hdr, parts) = Jp2Codec.tilePartsRegion(in, cx0, cy0, cx1, cy1)
    assert(in.bytesRead * 4 < cs.length, "walk not header-only")
    assert(parts.length == 1)
    val fetched = parts.head.fetchBytes
    assert(fetched * 2 < parts.head.fullLen,
      s"region fetch $fetched B of ${parts.head.fullLen} B — not precinct-granular")
    val slice = new java.io.ByteArrayOutputStream()
    for ((from, until) <- parts.head.ranges) slice.write(cs, from.toInt, (until - from).toInt)
    val t = Jp2Codec.decodeTileRegion(slice.toByteArray, hdr, cx0, cy0, cx1, cy1)
    for (c <- 0 until 3; y <- cy0 until cy1; x <- cx0 until cx1)
      assert(t.comps(c)((y - t.y0) * t.width + (x - t.x0)) ==
        full.comps(c)(y * w + x), s"c=$c px($x,$y)")
    // tiled + multi-part + precincts: the region walk groups per tile
    val tiled = Jp2Codec.encode(w, h, comps, levels = 3, tileSize = 128,
      layers = 2, partsPerTile = 2, precinctExp = 5)
    val th2 = Jp2Codec.header(tiled)
    val (_, tparts) = Jp2Codec.tilePartsRegion(new Jp2Codec.BytesInput(tiled),
      cx0, cy0, cx1, cy1)
    assert(tparts.map(_.index).toSet == Set(1, 2, 4, 5),
      "crop [200,280)x[80,140) touches tile cols 1-2 of both 128-tile rows")
    for (part <- tparts) {
      val sl = new java.io.ByteArrayOutputStream()
      for ((from, until) <- part.ranges) sl.write(tiled, from.toInt, (until - from).toInt)
      val tt = Jp2Codec.decodeTileRegion(sl.toByteArray, th2, cx0, cy0, cx1, cy1)
      val ix0 = math.max(cx0, tt.x0); val ix1 = math.min(cx1, tt.x0 + tt.width)
      val iy0 = math.max(cy0, tt.y0); val iy1 = math.min(cy1, tt.y0 + tt.height)
      for (c <- 0 until 3; y <- iy0 until iy1; x <- ix0 until ix1)
        assert(tt.comps(c)((y - tt.y0) * tt.width + (x - tt.x0)) ==
          full.comps(c)(y * w + x), s"tiled c=$c px($x,$y)")
    }
  }

  test("review-hardened precinct rejections: non-square, zero, unknown Scod bits") {
    val cs = Jp2Codec.encode(32, 32, Array(pattern(32, 32, 3)), levels = 1,
      precinctExp = 4)
    // locate COD (FF52); its precinct bytes sit at payload offset 10+
    var cod = 0
    while (!((cs(cod) & 0xFF) == 0xFF && (cs(cod + 1) & 0xFF) == 0x52)) cod += 1
    val precAt = cod + 4 + 10
    assert((cs(precAt) & 0xFF) == 0x44 && (cs(precAt + 1) & 0xFF) == 0x44)
    def tampered(f: Array[Byte] => Unit): Array[Byte] = { val b = cs.clone(); f(b); b }
    // rectangular precincts: PPy != PPx
    intercept[IllegalArgumentException](Jp2Codec.header(
      tampered(_(precAt) = 0x54)))
    // per-resolution sizes: second byte differs
    intercept[IllegalArgumentException](Jp2Codec.header(
      tampered(_(precAt + 1) = 0x55)))
    // zero exponent (r>0 band exponent would be -1)
    intercept[IllegalArgumentException](Jp2Codec.header(
      tampered(b => { b(precAt) = 0x00; b(precAt + 1) = 0x00 })))
    // Scod bits above SOP/EPH are outside Part 1
    intercept[IllegalArgumentException](Jp2Codec.header(
      tampered(_(cod + 4) = 0x09)))
  }

  test("decoder rejects garbage and truncated inputs rather than guessing") {
    intercept[IllegalArgumentException](Jp2Codec.decode(Array[Byte](1, 2, 3)))
    val cs = Jp2Codec.encode(16, 16, Array(pattern(16, 16, 5)))
    // truncation fails through the SAME typed contract as other malformed
    // input: the bounds-checked ranged reads, not a raw index error
    intercept[IllegalArgumentException](
      Jp2Codec.decode(java.util.Arrays.copyOf(cs, cs.length / 2)))
    intercept[IllegalArgumentException](
      Jp2Codec.tileParts(java.util.Arrays.copyOf(cs, cs.length / 2)))
  }
}
