package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests promised by SURVEY §5.3 (beyond the incremental-sink
  * idempotence property in IncrementalWriterSpec): the extraction fallback
  * chain is exactly first-non-null-non-empty, the anti-join obeys its set
  * algebra, and the engine's md5 agrees with the JDK digest on arbitrary
  * input. Each property evaluates one small Spark job per sample.
  */
class PropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)

  // tokens that may be "misses" (empty string) like a failed regex group
  private val tokenGen: Gen[String] =
    Gen.oneOf(Gen.const(""), Gen.alphaNumStr.map(_.take(8)))

  test("property: fallback chain returns the first non-empty candidate (P1-P3)") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.zip(tokenGen, tokenGen, tokenGen))) { rows =>
      val df = rows.toDF("a", "b", "c").select($"a", $"b", $"c",
        coalesce(nullif($"a", lit("")), nullif($"b", lit("")), nullif($"c", lit("")))
          .as("got"))
      df.collect().forall { r =>
        val expected = Seq(r.getString(0), r.getString(1), r.getString(2))
          .find(_.nonEmpty).orNull
        r.getAs[String]("got") == expected
      }
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: nano-narrowing rewrite preserves filter semantics for ANY literal/raw") {
    import spark.implicits._
    // The injected PushFilterThroughNanoNarrowing rule fires on every
    // session; soundness means: for arbitrary raw nanos (either sign) and
    // arbitrary timestamp literals (negative / zero / positive micros),
    // filtering the narrowed timestamp gives exactly the rows a plain
    // Scala evaluation of `raw div 1000 <op> m` keeps (div = Spark's
    // truncate-toward-zero semantics, which for Long is Scala's /).
    val rawGen: Gen[Long] = Gen.oneOf(
      Gen.choose(-2000L, 2000L), // straddle the epoch at ns granularity
      Gen.choose(-5L, 5L).map(_ * 1000L), // exact µs boundaries
      Gen.choose(-316224000000000000L, 316224000000000000L)) // ±10 years
    val microsGen: Gen[Long] = Gen.oneOf(
      Gen.const(0L), Gen.choose(-3L, 3L), Gen.choose(-5L, 5L).map(_ * 1000000L),
      Gen.choose(-316224000000000L, 316224000000000L))
    val ops: Seq[(String, (Long, Long) => Boolean)] = Seq(
      (">=", _ >= _), (">", _ > _), ("<", _ < _), ("<=", _ <= _), ("=", _ == _))
    val prop = Prop.forAll(Gen.zip(Gen.nonEmptyListOf(rawGen), microsGen)) {
      case (raws, m) =>
        val df = raws.toDF("ts_raw")
          .select($"ts_raw", timestamp_micros(expr("ts_raw div 1000")).as("ts"))
        ops.forall { case (op, pred) =>
          val got = df
            .filter(expr(s"ts $op timestamp_micros(${m}L)"))
            .select("ts_raw").as[Long].collect().toSet
          val expect = raws.filter(n => pred(n / 1000, m)).toSet
          got == expect
        }
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: anti-join output is disjoint from existing and preserves the rest (J1)") {
    import spark.implicits._
    val keySet = Gen.listOf(Gen.choose(1L, 50L)).map(_.distinct)
    val prop = Prop.forAll(Gen.zip(keySet, keySet)) { case (cand, existing) =>
      val c = cand.toDF("k")
      val e = existing.toDF("k")
      val out = c.join(e, Seq("k"), "left_anti").as[Long].collect().toSet
      val candS = cand.toSet
      val existS = existing.toSet
      out.intersect(existS).isEmpty && // nothing already present survives
        out.union(candS.intersect(existS)) == candS // nothing else is lost
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: engine md5 equals the JDK digest on arbitrary strings (P17)") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.nonEmptyListOf(Gen.asciiPrintableStr.map(_.take(64)))) { xs =>
      val got = xs.toDF("s")
        .select(md5($"s".cast("binary")).as("h")).as[String].collect()
      val expected = xs.map { s =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      got.toSeq == expected
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: sessionization splits exactly at gaps > threshold (W9)") {
    import spark.implicits._
    val gapUs = 100L
    // arbitrary per-user timelines, duplicates and unsorted order included
    val timelineGen = Gen.nonEmptyListOf(Gen.choose(0L, 2000L))
    val prop = Prop.forAll(Gen.nonEmptyListOf(timelineGen)) { users =>
      val rows = users.zipWithIndex.flatMap { case (ts, uid) =>
        ts.zipWithIndex.map { case (t, i) => (uid.toLong, (uid * 10000 + i).toLong, t) }
      }
      val got = graft.queries.Relational
        .sessionize(rows.toDF("user_id", "event_id", "us"), gapUs)
        .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
          sum($"n_events").as("n_events"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      users.zipWithIndex.forall { case (ts, uid) =>
        val sorted = ts.sorted
        val expectedSessions =
          1L + sorted.sliding(2).count(p => p.length == 2 && p(1) - p(0) > gapUs)
        got(uid.toLong) == ((expectedSessions, ts.length.toLong))
      }
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: day-bucketed interval join equals the theta join (J13)") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hourMs = 3600L * 1000
    // arbitrary event times and arbitrary (possibly overlapping) intervals
    // with intra-day boundaries — the residual predicate must do real work
    val tsGen = Gen.choose(0L, 60L * 24).map(h => new Timestamp(base + h * hourMs))
    val ivGen = Gen.zip(Gen.choose(0L, 50L * 24), Gen.choose(1L, 10L * 24))
      .map { case (s, len) =>
        (new Timestamp(base + s * hourMs), new Timestamp(base + (s + len) * hourMs))
      }
    val prop = Prop.forAll(Gen.zip(
      Gen.nonEmptyListOf(tsGen), Gen.nonEmptyListOf(ivGen))) { case (ts, ivs) =>
      val ev = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("event_id", "ts")
      val camp = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("campaign_id", "start_ts", "end_ts")
      val got = graft.queries.Relational.intervalJoinCore(ev, camp)
        .select("event_id", "campaign_id").as[(Long, Long)].collect().sorted.toSeq
      val expect = (for {
        ((t, ei), _) <- ts.zipWithIndex.map(x => (x, ()))
        ((s, e), ci) <- ivs.zipWithIndex
        if !t.before(s) && t.before(e)
      } yield (ei.toLong, ci.toLong)).sorted
      got == expect
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: degree-ordered triangle count equals brute force (G6)") {
    import spark.implicits._
    val edgeGen = Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val prop = Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { rawEdges =>
      val edges = rawEdges.distinct
      val got = graft.queries.Nested.triangles(edges.toDF("u", "v"))
        .collect().head.getLong(0)
      val set = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expected = (for {
        a <- nodes; b <- nodes if a < b && set((a, b))
        c <- nodes if b < c && set((b, c)) && set((a, c))
      } yield 1).size.toLong
      got == expected
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: min-label propagation converges below cap on path graphs " +
    "and labels every node with its component minimum (l17)") {
    import spark.implicits._
    // a path is the worst case for a given node count (diameter = n-1),
    // so convergence on random-length paths up to the cap bounds every
    // realistic dedup graph of that size
    val prop = Prop.forAll(Gen.choose(2, 16)) { n =>
      val ids = (0 until n).map(i => f"d$i%03d")
      val undirected = (0 until n - 1).flatMap { i =>
        Seq((ids(i), ids(i + 1)), (ids(i + 1), ids(i)))
      }
      val labels = graft.queries.Llm
        .minLabelPropagate(undirected.toDF("src", "dst"), maxIter = 40)
        .collect()
      labels.length == n && labels.forall(_.getString(1) == "d000")
    }
    val result = SCTest.check(params.withMinSuccessfulTests(4), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: funnel stage counts equal brute force on adversarial timelines (W12)") {
    import spark.implicits._
    // tiny timestamp domain forces the tie cases the strict ordering is
    // about: view and click at the same instant must NOT convert
    val evGen = Gen.zip(Gen.choose(0L, 2L),
      Gen.oneOf("view", "click", "purchase", "error"), Gen.choose(0L, 5L))
    val prop = Prop.forAll(Gen.nonEmptyListOf(evGen)) { raw =>
      val events = raw.zipWithIndex.map { case ((u, t, us), i) =>
        (u, i.toLong, t, us)
      }
      val got = graft.queries.Relational
        .funnelCore(events.toDF("user_id", "event_id", "event_type", "us"))
        .as[(Long, Long, Long)].collect().head
      val expected = {
        var v = 0L; var c = 0L; var p = 0L
        events.groupBy(_._1).values.foreach { es =>
          val tv = es.filter(_._3 == "view").map(_._4).minOption
          if (tv.isDefined) v += 1
          val tc = es.filter(_._3 == "click").map(_._4)
            .filter(us => tv.exists(_ < us)).minOption
          if (tc.isDefined) c += 1
          if (es.filter(_._3 == "purchase").map(_._4)
            .exists(us => tc.exists(_ < us))) p += 1
        }
        (v, c, p)
      }
      got == expected
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: chunking covers every token and reconstructs the text (L31)") {
    import spark.implicits._
    // invariants over arbitrary token counts: first chunk starts at 0,
    // consecutive chunk starts differ by the stride, every token appears
    // in at least one chunk, and de-overlapped chunks rebuild the text
    val textGen = Gen.choose(0, 130).map(n => (0 until n).map(i => s"t$i").mkString(" "))
    val prop = Prop.forAll(Gen.zip(Gen.choose(0L, 3L), textGen)) { case (id, text) =>
      val chunks = graft.queries.Llm
        .l31ChunkCore(Seq((id, text)).toDF("doc_id", "text"))
        .orderBy($"chunk_idx")
        .as[(Long, Long, String, Long)].collect().toSeq
      val toks = text.split(" ", -1)
      val nTok = toks.length
      val starts = chunks.map(_._2 * 30)
      val sizesOk = chunks.forall { case (_, idx, t, n) =>
        val want = toks.slice((idx * 30).toInt, (idx * 30).toInt + 40)
        t == want.mkString(" ") && n == want.length
      }
      val coverage = starts.nonEmpty &&
        starts.head == 0 && (starts.last + 40 >= nTok) &&
        starts.sliding(2).forall(w => w.length < 2 || w(1) - w(0) == 30)
      sizesOk && coverage
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: packing conserves tokens and fills bins contiguously (L32)") {
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(Gen.choose(1, 900))
    val prop = Prop.forAll(docsGen) { sizes =>
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        ("s0", f"d$i%04d", (0 until n).map(_ => "x").mkString(" "))
      }
      val bins = graft.queries.Llm
        .l32PackCore(docs.toDF("source", "doc_id", "text"))
        .orderBy($"bin")
        .as[(String, Long, Long, Long, String, String)].collect().toSeq
      val total = sizes.map(_.toLong).sum
      val conserved = bins.map(_._4).sum == total && bins.map(_._3).sum == sizes.length
      // bin ids are exactly the distinct values of cum_before div 500 —
      // contiguity means no bin id is skipped past the first
      val ids = bins.map(_._2)
      val contiguous = ids.zip(ids.drop(1)).forall { case (a, b) => b > a }
      // doc ranges must not interleave across bins (contiguous fill)
      val ordered = bins.sortBy(_._2).sliding(2).forall {
        case Seq(a, b) => a._6 <= b._5 // last_doc of bin k <= first_doc of k+1
        case _ => true
      }
      conserved && contiguous && ordered
    }
    val result = SCTest.check(params.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("min-label propagation FAILS LOUDLY past the round cap (l17)") {
    import spark.implicits._
    // diameter 19 > cap 10: must throw, never return a wrong clustering.
    // (The cap is a parameter, so a small cap exercises the identical
    // failure path the production cap of 40 guards.)
    val n = 20
    val ids = (0 until n).map(i => f"d$i%03d")
    val undirected = (0 until n - 1).flatMap { i =>
      Seq((ids(i), ids(i + 1)), (ids(i + 1), ids(i)))
    }
    val e = intercept[IllegalArgumentException] {
      graft.queries.Llm
        .minLabelPropagate(undirected.toDF("src", "dst"), maxIter = 10)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("property: linear interpolation brackets gaps and is exact on ramps (W15)") {
    import java.sql.Date
    import spark.implicits._
    // arbitrary observed subset of a 20-day axis with arbitrary counts
    val obsGen = Gen.mapOf(Gen.zip(Gen.choose(0, 19), Gen.choose(0L, 50L)))
    val prop = Prop.forAll(obsGen) { obs =>
      val grid = (0 until 20).map { d =>
        ("k", Date.valueOf(s"2024-01-${"%02d".format(d + 1)}"),
          obs.get(d).map(long2Long).orNull)
      }.toDF("event_type", "day", "pn")
      val out = graft.queries.Relational.interpolateCore(grid)
        .as[(String, Date, Option[Long])].collect()
        .map(r => (r._2.toLocalDate.getDayOfMonth - 1, r._3)).toMap
      (0 until 20).forall { d =>
        out(d) match {
          case Some(v) if obs.contains(d) => v == obs(d) * 1000 // observed kept
          case v =>
            val prev = (d to 0 by -1).find(obs.contains).map(obs)
            val next = (d until 20).find(obs.contains).map(obs)
            (prev, next) match {
              case (Some(p), Some(n)) => // bracketed by the neighbor values
                val (lo, hi) = (math.min(p, n) * 1000, math.max(p, n) * 1000)
                v.exists(x => x >= lo && x <= hi)
              case (p, n) => v == p.orElse(n).map(_ * 1000) // edge fallback
            }
        }
      }
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
    // exactness: anchors every 5th day carry the linear value d*4 — the
    // interpolated days in between must land exactly on the same line
    val grid = (0 until 16).map { d =>
      ("k", Date.valueOf(s"2024-01-${"%02d".format(d + 1)}"),
        if (d % 5 == 0) long2Long(d * 4L) else null)
    }.toDF("event_type", "day", "pn")
    val out = graft.queries.Relational.interpolateCore(grid)
      .as[(String, Date, Long)].collect()
      .map(r => (r._2.toLocalDate.getDayOfMonth - 1, r._3)).toMap
    (0 until 16).foreach { d =>
      assert(out(d) == d * 4000L, s"day $d: ${out(d)} != ${d * 4000L}")
    }
  }

  // shared series generator for the w16/w17/w18 cores: an arbitrary
  // dense run of daily counts, including planted spikes so the outlier
  // branch actually fires. Capped at 35 days: w17's dyadic-exactness
  // window (sum range must stay inside the 53-bit mantissa) covers ~43
  // days — past that, production rebases the exponent per 30-day block.
  private val seriesGen: Gen[List[Long]] = (for {
    base <- Gen.nonEmptyListOf(Gen.choose(0L, 40L))
    spikes <- Gen.someOf(base.indices)
  } yield base.zipWithIndex.map { case (v, i) =>
    if (spikes.contains(i)) v + 500L else v
  }).map(_.take(35))

  private def seriesDf(xs: List[Long]) = {
    import java.sql.Date
    import spark.implicits._
    xs.zipWithIndex.map { case (v, d) =>
      ("k", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)), v)
    }.toDF("event_type", "day", "cnt")
  }

  test("property: integer z-score flags exactly the >1-sigma days (W16)") {
    import spark.implicits._
    val prop = Prop.forAll(seriesGen) { xs =>
      // brute force |x − μ| > σ in EXACT rational arithmetic:
      // n²(x−μ)² > n²σ² ⟺ (n·x − s)² > n·(n·ss − s²), evaluated in BigInt
      // so the comparison has no rounding at all
      val n = BigInt(xs.size)
      val s = BigInt(xs.sum)
      val ss = xs.map(x => BigInt(x) * BigInt(x)).sum
      val expect = xs.map { x =>
        val d = n * BigInt(x) - s
        d * d > n * (n * ss - s * s)
      }
      val got = graft.queries.Relational.zscoreCore(seriesDf(xs))
        .orderBy($"day")
        .as[(String, java.sql.Date, Long, Boolean)].collect().map(_._4)
      got.toList == expect
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: dyadic EWMA equals the direct recurrence bit-for-bit (W17)") {
    import spark.implicits._
    val prop = Prop.forAll(seriesGen) { xs =>
      // y_n = (x_n + y_{n-1}) / 2 with y_0 = 0 — the textbook recurrence,
      // evaluated sequentially in plain doubles
      val expect = xs.scanLeft(0.0)((y, x) => (x + y) / 2.0).drop(1)
      val got = graft.queries.Relational.ewmaCore(seriesDf(xs))
        .orderBy($"day")
        .as[(String, java.sql.Date, Long, Double)].collect().map(_._4)
      got.toList == expect // bit-exact, not approximate
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: shingles equal the naive sliding window for ANY text") {
    import spark.implicits._
    // Text.shingles was rewritten (r9) from the per-element-slice lambda to
    // zipped shifted slices for O(tokens) cost; this pins value-identity
    // with the obvious Scala sliding-window spec on adversarial inputs:
    // empty strings, repeated/leading/trailing spaces (split keeps empty
    // tokens!), unicode, and token counts straddling every n.
    val textGen: Gen[String] = Gen.oneOf(
      Gen.const(""), Gen.const(" "), Gen.const("  a  b "),
      Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const(""),
        Gen.const("日本語"), Gen.const("a-b"))).map(_.mkString(" ")))
    val nGen: Gen[Int] = Gen.choose(1, 4)
    val prop = Prop.forAll(Gen.nonEmptyListOf(textGen), nGen) { (texts, n) =>
      val got = texts.toDF("text")
        .select(graft.functions.Text.shingles($"text", n).as("sh"))
        .as[Seq[String]].collect()
      val expect = texts.map { t =>
        val toks = t.split(" ", -1).toSeq // Spark split keeps empty tokens
        if (toks.size < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      }
      got.map(_.toList).toList == expect.map(_.toList).toList
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: rolling med2 equals brute-force 2x median over each frame (W18)") {
    import spark.implicits._
    val prop = Prop.forAll(seriesGen) { xs =>
      val got = graft.queries.Relational.medianCore(seriesDf(xs))
        .orderBy($"day")
        .as[(String, java.sql.Date, Long, Long)].collect().map(_._4)
      val expect = xs.indices.map { i =>
        val frame = xs.slice(math.max(0, i - 6), i + 1).sorted
        frame((frame.size - 1) / 2) + frame(frame.size / 2)
      }
      got.toList == expect.toList
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: l57 line dedup equals the first-occurrence reference on any corpus") {
    import spark.implicits._
    import graft.queries.Llm
    // sentences stay under 5 words so l57's sentence synthesis is the
    // identity on them — the property then controls line boundaries
    // exactly and drives real cross-doc collisions from a small pool
    val sentPool = (1 to 12).map(i => s"tok${i}a tok${i}b.")
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(sentPool)).map(_.take(6))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(8).zipWithIndex
      .map { case (sents, i) => (i.toLong, sents) })
    val prop = Prop.forAll(corpusGen) { corpus =>
      val df = corpus.map { case (id, ss) => (id, ss.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Llm.l57LineDedupCore(df).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      // reference: global first occurrence by (doc_id, position)
      val seen = scala.collection.mutable.Set.empty[String]
      val expect = corpus.flatMap { case (id, ss) =>
        val kept = ss.filter(s => seen.add(s))
        if (kept.isEmpty) None
        else Some(id -> (kept.mkString(" "), kept.size.toLong))
      }.toMap
      got == expect
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("property: the BM25 term score never wraps int64 and is tf-monotone at ANY magnitude") {
    import spark.implicits._
    // The r12 hardening contract, r13-extended past the old wrap point:
    // with ctf = least(tf, 4e5), the avgdl-division rel_ppm AND its 10^15
    // saturation (ADVICE r12: the unclamped 9·rel_ppm term wrapped past
    // dl/avgdl ≈ 1.02e12, just beyond this generator's former 1e12 cap),
    // the integer term score stays non-negative (a wrap would flip it
    // negative — and under the pinned ANSI mode, THROW), bounded by
    // idf_k * 2_200_000 (the (k1+1) asymptote), and non-decreasing in tf
    // with everything else fixed — for adversarial magnitudes far past
    // any fixture: tf/dl to 9e12 (the documented residual bound is
    // dl ≤ 9.2e12, where dl·10^6 itself overflows), n_docs to 4·10^9,
    // total_len to ~9e17, including the degenerate empty-doc corpus
    // where avgdl floors to 0 and the greatest(...,1) guard must hold —
    // there rel_ppm rides the clamp, the exact regime the old expression
    // wrapped in.
    val caseGen: Gen[(Long, Long, Long, Long, Long, Long)] = for {
      nDocs <- Gen.oneOf(Gen.choose(1L, 100L), Gen.choose(1L, 4000000000L))
      df <- Gen.choose(1L, nDocs)
      tf1 <- Gen.oneOf(Gen.choose(1L, 500L), Gen.choose(1L, 9000000000000L))
      tf2 <- Gen.oneOf(Gen.choose(1L, 500L), Gen.choose(1L, 9000000000000L))
      dl <- Gen.oneOf(Gen.choose(math.max(tf1, tf2), math.max(tf1, tf2) + 1000L),
        Gen.choose(math.max(tf1, tf2), 9000000000000L))
      totalLen <- Gen.oneOf(
        Gen.const(0L), // every other doc empty-ish: avgdl can floor to 0
        Gen.choose(dl, math.max(dl, 900000000000000000L)))
    } yield (math.min(tf1, tf2), math.max(tf1, tf2), df, dl, nDocs,
      math.max(totalLen, dl))
    val prop = Prop.forAll(caseGen) { case (tfLo, tfHi, df, dl, nDocs, totalLen) =>
      val rows = Seq((tfLo, df, dl, nDocs, totalLen), (tfHi, df, dl, nDocs, totalLen))
        .toDF("tf", "df", "dl", "n_docs", "total_len")
        .select(expr(graft.queries.Llm.bm25TermScore.replace('\n', ' ')).as("s"))
        .as[Long].collect()
      val idfK = (BigInt(nDocs) - df + 1) * 1000 / (BigInt(df) + 1)
      rows.forall(s => s >= 0L && BigInt(s) <= idfK * 2200000) &&
        rows(1) >= rows(0) // monotone in tf (rows ordered tfLo, tfHi)
    }
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
