package graft.queries

import graft.Engine._
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY §2.10 + north star):
  * dedup (exact / banded MinHash / SimHash / n-gram Jaccard / embedding
  * near-dup), similarity search (brute-force cosine top-k + LSH scale path),
  * text analysis (metrics, language-ID, token counting, fingerprinting) and
  * quality filtering.
  *
  * Scale design notes (100 TB):
  *  - Near-dedup is banded: docs shuffle by band signature (|bands| keys),
  *    candidate pairs only form inside a bucket — never all-pairs.
  *  - Top-k similarity broadcasts the (small) probe set and computes
  *    per-partition scores; only k rows per probe survive the window.
  *  - All text metrics are single-pass projections (no shuffle).
  */
object Llm {

  /** Fixed-schema document record (typed-Dataset surface). */
  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  /** Dedup candidate set: every document plus a same-text copy under a
    * shifted id — gives the exact-dedup operator real duplicates to kill. */
  private def dupCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir).select($"doc_id", $"text", $"source")
    d.unionByName(d.select(($"doc_id" + 1000000).as("doc_id"), $"text", $"source"))
  }

  /** L1: exact dedup — group by content hash, keep min id (hash-groupBy;
    * at scale this is one shuffle on the 128-bit digest). */
  def l1ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dupCandidates(spark, dir)
      .groupBy(md5($"text".cast("binary")).as("content_key"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .select($"keeper", $"n_copies")
  }

  /** Near-dup candidate set: originals plus a perturbed copy (first token
    * dropped) under a shifted id. */
  private def nearDupCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir)
    d.select($"doc_id".as("id"), $"text")
      .unionByName(d.select(($"doc_id" + 1000000).as("id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }

  /** L2: banded MinHash near-dedup, fully deterministic (md5-based minhash,
    * 2 bands x 3 rows) so DuckDB derives identical buckets. Pairs only form
    * within a band bucket — the 100 TB-safe shape (no all-pairs join). */
  def l2MinhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bandedPairsFromShingles(nearDupCandidates(spark, dir)
      .filter($"id" % 5 === 0) // bounded probe subset, proportional at any SF
      .select($"id", explode(Text.shingles($"text", 3)).as("shingle")))
  }

  /** Banded pairs from an (id, shingle) frame — split out so l63's two
    * calibration legs share the same shingle DERIVATION (one code path;
    * physically each leg recomputes the cheap fused scan→shingle pipeline —
    * see l63's doc for why recomputation measured faster than caching).
    * Duplicate shingles are harmless
    * (min-aggregation is idempotent), so distinct-ed and raw frames give
    * identical signatures. */
  private[graft] def bandedPairsFromShingles(sh0: DataFrame): DataFrame = {
    import sh0.sparkSession.implicits._
    // one digest per shingle; the 6 minhash functions are its 6 disjoint
    // 5-hex-char slices (standard cheap-family trick: 6x fewer hashes)
    val sh = sh0.withColumn("d", md5($"shingle".cast("binary")))
    def h(i: Int): Column =
      min(substring($"d", 1 + (i - 1) * 5, 5)).as(s"h$i")
    bandedPairs(sh.groupBy($"id").agg(h(1), h(2), h(3), h(4), h(5), h(6)))
  }

  /** L2c: the same banded near-dedup with the signature phase fused into
    * [[graft.functions.MinhashSigExpr]] — ONE map-only pass per document
    * instead of a corpus-sized shingle explode plus a corpus-sized
    * groupBy shuffle. Signatures are byte-identical to l2's, so the pairs
    * hash-match the SAME oracle; MinhashExprSpec pins the equivalence
    * per document and the plan test pins that the signature phase carries
    * no Generate and no extra exchange. */
  def l2cMinhashNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = nearDupCandidates(spark, dir)
      .filter($"id" % 5 === 0)
      .select($"id",
        graft.functions.MinhashSigExpr.minhashSigNative(spark, $"text").as("sig"))
      .filter($"sig".isNotNull)
      .select($"id", element_at($"sig", 1).as("h1"), element_at($"sig", 2).as("h2"),
        element_at($"sig", 3).as("h3"), element_at($"sig", 4).as("h4"),
        element_at($"sig", 5).as("h5"), element_at($"sig", 6).as("h6"))
    bandedPairs(sigs)
  }

  /** Banded candidate pairing over per-doc signatures (id, h1..h6):
    * 2 bands x 3 rows, pairs only within a band bucket — the
    * 100 TB-safe shape (no all-pairs join). */
  private def bandedPairs(sigs: DataFrame): DataFrame = {
    import sigs.sparkSession.implicits._
    val bands = sigs.select($"id",
        md5(concat_ws("|", $"h1", $"h2", $"h3").cast("binary")).as("band"), lit(1).as("bi"))
      .unionByName(sigs.select($"id",
        md5(concat_ws("|", $"h4", $"h5", $"h6").cast("binary")).as("band"), lit(2).as("bi")))
    val b2 = bands.select($"id".as("b_id"), $"band", $"bi")
    bands.join(b2, Seq("band", "bi")).filter($"id" < $"b_id")
      .groupBy($"id".as("a_id"), $"b_id")
      .agg(count(lit(1)).cast("long").as("shared_bands"))
  }

  /** L2b: MLlib MinHashLSH scale path — bucketed approxSimilarityJoin with a
    * fixed seed (rows-only check; MLlib hash coefficients are not
    * reproducible in SQL). */
  def l2MinhashLshMllib(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    import spark.implicits._
    val docs = nearDupCandidates(spark, dir).filter($"id" % 25 === 0)
      .select($"id", split($"text", " ").as("toks"))
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 14).setBinary(true)
    val feat = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, 0.5, "jaccard_dist")
      .select(col("datasetA.id").as("a_id"), col("datasetB.id").as("b_id"),
        col("jaccard_dist"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id")
  }

  /** L3/J8: brute-force cosine top-k — broadcast probe set, partition-local
    * scoring, per-probe window keeps k. Only ranks are output (the score is
    * engine-internal float detail). */
  def l3CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val probes = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id")
    emb.join(broadcast(probes), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        Text.cosine($"q_emb", $"embedding").as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"rank")
  }

  /** L3 (native): same top-k as [[l3CosineTopk]] but scored by the fused
    * codegen'd [[graft.functions.CosineSimilarityExpr]] — one pass, no
    * per-pair array allocation. Bit-identical to the HOF version and the
    * oracle, so it shares the same DuckDB SQL. */
  def l3CosineTopkNative(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CosineSimilarityExpr.cosineNative
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val probes = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id")
    emb.join(broadcast(probes), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosineNative(spark, $"q_emb", $"embedding").as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"rank")
  }

  /** L3b: ANN scale path — BucketedRandomProjectionLSH with fixed seed
    * (rows-only; hash planes are not SQL-reproducible). */
  def l3AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val emb = embeddings(spark, dir)
      .select($"vec_id", array_to_vector($"embedding").as("features"))
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"features".as("q_features"))
    val lsh = new BucketedRandomProjectionLSH().setInputCol("features")
      .setOutputCol("hashes").setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(emb)
    model.approxSimilarityJoin(
        emb, probes.select($"query_id".as("vec_id"), $"q_features".as("features")),
        5.0, "dist")
      .select(col("datasetB.vec_id").as("query_id"), col("datasetA.vec_id").as("neighbor_id"),
        col("dist"))
      .filter($"query_id" =!= $"neighbor_id")
      .withColumn("rank",
        row_number().over(Window.partitionBy($"query_id").orderBy($"dist", $"neighbor_id"))
          .cast("long"))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", $"rank")
  }

  /** L3c: IVF-bucketed ANN — the inverted-file pruning pattern, fully
    * deterministic (data vectors as coarse centroids, cosine assignment,
    * ties by centroid id) so it IS oracle-checkable, unlike the
    * random-plane LSH variant. Scale shape: assignment is a broadcast of C
    * centroids + one partition-local argmax per vector; the probe join
    * touches only the probe's cell (1/C of the corpus per probe instead of
    * all of it), which is the IVF speedup. nprobe=1 here; recall/cost
    * trades by probing more cells. */
  def l3IvfTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val cents = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent"))
    val wAssign = Window.partitionBy($"vec_id").orderBy($"cscore".desc, $"cent_id")
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"cent_id",
        Text.cosine($"embedding", $"cent").as("cscore"))
      .withColumn("rn", row_number().over(wAssign))
      .filter($"rn" === 1)
      .select($"vec_id", $"embedding", $"cent_id")
    val probes = assigned.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"cent_id")
    val wRank = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id")
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        Text.cosine($"q_emb", $"embedding").as("score"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id", $"rank")
  }

  /** L9: embedding near-dup — originals vs exactly-colinear copies (2x
    * scaling preserves cosine bit-for-bit), threshold join inside a bounded
    * probe set. */
  def l9EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val cands = emb.select($"vec_id", $"embedding")
      .unionByName(emb.select(($"vec_id" + 1000000).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding")))
    val probes = cands.filter($"vec_id" < 50)
      .select($"vec_id".as("a_id"), $"embedding".as("a_emb"))
    cands.join(broadcast(probes), $"a_id" < $"vec_id")
      // fused native scorer: 5x over the HOF formulation in the pair loop
      .filter(graft.functions.CosineSimilarityExpr.cosineNative(spark, $"a_emb", $"embedding") > 0.999)
      .select($"a_id", $"vec_id".as("b_id"))
  }

  /** L4: text metrics — lengths, token counts, uniq ratio, stopword ratio. */
  def l4TextMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = split($"text", " ")
    documents(spark, dir).select($"doc_id",
      length($"text").cast("long").as("n_chars_actual"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_uniq"),
      (size(array_distinct(t)).cast("double") / size(t)).as("uniq_ratio"),
      Text.stopwordRatio($"text").as("stop_ratio"))
  }

  /** L4b: language-ID by stopword-hit scoring (n-gram heuristic; ties break
    * by a fixed language priority). */
  def l4LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = split($"text", " ")
    def hits(ws: Seq[String]): Column =
      size(filter(t, x => x.isInCollection(ws))).cast("long")
    documents(spark, dir).select($"doc_id", $"lang",
        hits(Seq("the", "of", "and", "a")).as("en_score"),
        hits(Seq("der", "die", "das", "und")).as("de_score"),
        hits(Seq("el", "la", "de", "y")).as("es_score"))
      .withColumn("predicted_lang",
        when($"de_score" > $"en_score" && $"de_score" >= $"es_score", "de")
          .when($"es_score" > $"en_score" && $"es_score" > $"de_score", "es")
          .otherwise("en"))
  }

  /** L10: BPE-ish token counting — letter runs, digit runs, punctuation. */
  def l10TokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    documents(spark, dir).select($"doc_id",
      size(regexp_extract_all($"text", lit(pat), lit(0))).cast("long").as("n_bpe_tokens"),
      size(split($"text", " ")).cast("long").as("n_ws_tokens"))
  }

  /** L11: rolling-hash document fingerprint (winnowing-style). */
  def l11RollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id", Text.rollingFingerprint($"text").as("fingerprint"))
  }

  /** L7: 16-bit SimHash fingerprint per document. */
  def l7Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val bitSums = (1 to 16).map(i => sum(Text.simhashBitContribution($"token", i)).as(s"s$i"))
    val sums = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (1 to 16).map(i => when(col(s"s$i") > 0, lit(1L << (i - 1))).otherwise(0L))
      .reduce(_ + _)
    sums.select($"doc_id", fp.as("simhash"))
  }

  /** L8: n-gram Jaccard similarity — |A∩B| / |A∪B| over 3-shingle sets
    * from exact distinct counts. EXECUTES via the prefix-filtered
    * candidate plan (identical code path to [[l46PrefixFilterJoin]]): the
    * textbook join-on-every-shared-shingle formulation is only the
    * semantic SPEC here — at corpus scale one frequent shingle makes its
    * candidate set quadratic, so no registered query may run it. The
    * naive form survives as [[ngramJaccardDirect]] (test-only), and
    * PipelineOpsSpec pins that the two are row-identical while the
    * candidate set strictly shrinks. */
  def l8NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    l46PrefixFilterJoin(spark, dir)

  /** The naive every-shared-shingle join — the semantic specification of
    * l8/l46, NOT a registered execution path (quadratic on frequent
    * shingles). Kept only for PipelineOpsSpec's equality proof. */
  private[graft] def ngramJaccardDirect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = nearDupCandidates(spark, dir).filter($"id" % 10 === 0)
      .select($"id", explode(Text.shingles($"text", 3)).as("shingle"))
      .distinct()
    val sizes = sh.groupBy($"id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.join(sh.select($"id".as("b_id"), $"shingle"), Seq("shingle"))
      .filter($"id" < $"b_id")
      .groupBy($"id".as("a_id"), $"b_id").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select($"id".as("a_id"), $"n_sh".as("n_a")), Seq("a_id"))
      .join(sizes.select($"id".as("b_id"), $"n_sh".as("n_b")), Seq("b_id"))
      .select($"a_id", $"b_id",
        ($"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common")).as("jaccard"))
      .filter($"jaccard" >= 0.5)
  }

  /** L46: prefix-filtered set-similarity join — l8's threshold join made
    * scale-safe by the prefix-filter principle (Chaudhuri/Bayardo): under
    * ANY global token order, two sets with overlap ≥ α must share a token
    * within the first n−α+1 tokens of each. Ordering shingles
    * rarest-first (df, then shingle as tiebreak) means candidate pairs
    * can only form on RARE shingles, killing the frequent-shingle
    * quadratic blowup that l8's join-on-every-shared-shingle risks at
    * corpus scale; for Jaccard ≥ t the per-doc α is ⌈t·n⌉, so the probed
    * prefix shrinks as t rises. Survivors verify with the exact Jaccard.
    * Output is IDENTICAL to l8 (same oracle; PipelineOpsSpec pins
    * row-for-row equality and that the candidate set genuinely shrinks). */
  def l46PrefixFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = nearDupCandidates(spark, dir).filter($"id" % 10 === 0)
      .select($"id", explode(Text.shingles($"text", 3)).as("shingle"))
      .distinct()
    val cand = prefixCandidates(sh, 0.5)
    val sizes = sh.groupBy($"id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select($"id".as("a_id"), $"shingle"), Seq("a_id"))
      .join(sh.select($"id".as("b_id"), $"shingle"), Seq("b_id", "shingle"))
      .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select($"id".as("a_id"), $"n_sh".as("n_a")), Seq("a_id"))
      .join(sizes.select($"id".as("b_id"), $"n_sh".as("n_b")), Seq("b_id"))
      .select($"a_id", $"b_id",
        ($"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common")).as("jaccard"))
      .filter($"jaccard" >= 0.5)
  }

  /** Candidate pairs that can reach Jaccard ≥ t, by prefix filtering:
    * rank each doc's tokens rarest-first, keep the first n − ⌈t·n⌉ + 1,
    * and pair docs sharing a kept token. Sound (never drops a true pair)
    * because overlap ≥ ⌈t·max(na,nb)⌉ ≥ both per-doc α's. */
  private[graft] def prefixCandidates(sh: DataFrame, t: Double): DataFrame = {
    import sh.sparkSession.implicits._
    val dfreq = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"id")
    val ranked = sh.join(dfreq, Seq("shingle"))
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rk",
        row_number().over(wDoc.orderBy($"df", $"shingle")))
      .filter($"rk" <= $"n" - expr(s"cast(ceil(n * $t) as bigint)") + 1)
      .select($"id", $"shingle")
    ranked.join(ranked.select($"id".as("b_id"), $"shingle"), Seq("shingle"))
      .filter($"id" < $"b_id")
      .select($"id".as("a_id"), $"b_id").distinct()
  }

  /** L12: fuzzy text match — Levenshtein distance between neighboring docs'
    * prefixes (the cheap edit-distance screen that precedes expensive
    * near-dup scoring in text pipelines). */
  def l12EditDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir).filter($"doc_id" < 100)
      .select($"doc_id", substring($"text", 1, 40).as("p"))
    val d2 = d.select(($"doc_id" - 1).as("doc_id"), $"p".as("p_next"))
    d.join(d2, Seq("doc_id"))
      .select($"doc_id", levenshtein($"p", $"p_next").cast("long").as("edit_dist"))
  }

  /** L17: dedup clustering — connected components over the near-dup pair
    * graph (the step that turns L2's candidate PAIRS into canonical
    * GROUPS, which is what a dedup pipeline actually keys its keep/drop
    * decision on). Iterative min-label propagation to fixpoint: each round
    * every node takes the min label among itself and its neighbors — the
    * unique fixpoint is the component minimum, so the result is
    * deterministic no matter how iterations interleave. Rounds are
    * O(graph diameter) ≤ log-ish for dedup graphs; each round is one
    * shuffle-bounded join, lineage truncated per round (localCheckpoint)
    * so plans don't grow unboundedly — the standard Pregel-style loop at
    * any scale. Oracle: DuckDB recursive CTE over the same pairs. */
  def l17DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r20 (guide §4.1): consume the pairs through the FUSED native
    // signature path — MinhashExprSpec pins l2c's signatures byte-identical
    // to l2's, so the pair set (and thus the clustering) is unchanged while
    // the corpus-sized shingle explode + groupBy shuffle drops out of this
    // query's plan. l2_minhash_neardup itself stays on the SQL-derivable
    // shape (that is the operator it demonstrates).
    val pairs = l2cMinhashNative(spark, dir).select($"a_id", $"b_id")
    val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
      .unionByName(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
      .localCheckpoint(true)
    val labels = minLabelPropagate(edges, maxIter = 40)
      .select($"id".as("doc_id"), $"label".as("cluster_id"))
    // propagation ran eagerly (per-round checkpoints), and the returned
    // view reads only the final labels checkpoint — the edge set is dead
    graft.plans.Checkpoints.unpersist(edges)
    labels
  }

  /** Min-label propagation core over undirected edges (`src`,`dst` with
    * both directions present): each round every node takes the min label
    * among itself and its neighbors, to fixpoint — the unique fixpoint is
    * the component minimum. Split out so PropertySpec can drive it with
    * generated graphs of arbitrary diameter (the registered l17 fixture
    * graph converges in a handful of rounds and never stresses the cap).
    *
    * Convergence is a driver-side count(), i.e. one extra job — so it is
    * checked only every 2 propagation rounds (labels decrease
    * monotonically, so "unchanged across 2 rounds" implies each round was
    * a no-op). Hitting the cap without converging is an explicit error,
    * never a silently wrong clustering: a diameter > cap graph fails
    * loudly here. */
  private[graft] def minLabelPropagate(edges: DataFrame, maxIter: Int): DataFrame = {
    import edges.sparkSession.implicits._
    var labels = edges.select($"src".as("id")).distinct()
      .withColumn("label", $"id").localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val before = labels
      var r = 0
      while (r < 2 && iter < maxIter) {
        val prev = labels
        val neighborMin = edges
          .join(labels.select($"id".as("dst"), $"label".as("dlabel")), Seq("dst"))
          .groupBy($"src".as("id")).agg(min($"dlabel").as("nlabel"))
        labels = labels.join(neighborMin, Seq("id"), "left")
          .select($"id", least($"label", coalesce($"nlabel", $"label")).as("label"))
          .localCheckpoint(true)
        // the superseded round's blocks are dead once the new checkpoint
        // materializes — except `before`, which the convergence count
        // below still reads (graft.plans.Checkpoints scaladoc)
        if (prev ne before) graft.plans.Checkpoints.unpersist(prev)
        r += 1; iter += 1
      }
      changed = labels.join(before.select($"id", $"label".as("old")), Seq("id"))
        .filter($"label" =!= $"old").count()
      graft.plans.Checkpoints.unpersist(before)
    }
    require(changed == 0,
      s"min-label propagation did not converge within $maxIter rounds (graph diameter > cap)")
    labels
  }

  /** L29: document-length histogram by language — the distribution a
    * curation pass reads BEFORE choosing its length filter thresholds
    * (l6 applies them). Integer bucketing (`len div 250`, capped at 15)
    * instead of a float histogram function so every engine computes the
    * identical bucket; pure map + one (lang,bucket) agg shuffle — the
    * whole 100 TB corpus reduces to |langs|×16 rows. */
  def l29LengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"lang", least(expr("length(text) div 250"), lit(15L)).as("bucket"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** L30: vocabulary coverage — per-doc out-of-vocabulary rate against
    * the corpus top-50 vocabulary (the cheap LM-free proxy for perplexity
    * filtering: junk text has low coverage of the head vocabulary). The
    * vocab is a deterministic top-k (freq desc, token asc — same rule as
    * l14) and BROADCASTS to the token stream: one explode, one broadcast
    * left join, one per-doc agg; never a doc×vocab shuffle. The rate is a
    * single bigint division, so the double hash-matches any IEEE engine. */
  def l30VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val vocab = toks.groupBy($"token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token").limit(50)
      .select($"token", lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", $"n_oov".cast("double") / $"n_tokens")
  }

  /** L31: document chunking — long documents split into fixed 40-token
    * windows with a 10-token overlap (stride 30), the step every training
    * pipeline runs between curation and tokenization. Pure
    * generate-and-slice: sequence → explode → slice/array_join, shuffle
    * count ZERO (plan test) — chunking 100 TB is map-only, so it scales
    * with input bandwidth, not cluster coordination. Chunk text and
    * boundaries are exact string matches against the oracle. */
  def l31DocChunking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    l31ChunkCore(documents(spark, dir).select($"doc_id", $"text"))
  }

  /** Chunking core over (doc_id, text), split out so PropertySpec can
    * drive it with arbitrary generated token counts. */
  private[graft] def l31ChunkCore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks",
        explode(sequence(lit(0), greatest(size($"toks") - 1, lit(0)), lit(30)))
          .as("start"))
      .filter($"start" < size($"toks"))
      .select($"doc_id",
        ($"start" / 30).cast("long").as("chunk_idx"),
        array_join(slice($"toks", $"start" + 1, lit(40)), " ").as("chunk_text"),
        least(size($"toks") - $"start", lit(40)).cast("long").as("n_chunk"))
  }

  /** L32: sequence packing — documents packed into 500-token context
    * bins by contiguous fill in deterministic doc order, PER SOURCE
    * SHARD: the scalable form of training-batch packing (a global
    * greedy FFD is inherently sequential; per-shard contiguous fill is
    * what large pipelines actually run, and it parallelizes as one
    * window pass per shard + one agg — both on the same source
    * partitioning, so ONE shuffle total). Bin id is an integer division
    * of the running token count, so the whole layout hash-matches the
    * oracle. */
  def l32SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    l32PackCore(documents(spark, dir).select($"source", $"doc_id", $"text"))
  }

  /** Packing core over (source, doc_id, text), split out so PropertySpec
    * can drive it with arbitrary generated document sizes. */
  private[graft] def l32PackCore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("bin", expr("cum_before div 500"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("bin_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
  }

  /** L33: leakage-free train/val/test split — the split key is a CONTENT
    * hash (md5 of the text), not the doc id, so byte-identical documents
    * can never straddle split boundaries: the eval set stays clean even
    * when the corpus still carries exact duplicates (dedup-aware
    * splitting, the assignment every training run needs before anything
    * else). 90/5/5 by hash bucket — deterministic, resumable, RNG-free
    * (same property as l19's sampler), and a pure map-only projection:
    * splitting 100 TB costs one scan, zero shuffles. PipelineOpsSpec pins
    * the leakage guarantee (equal text ⇒ equal split) and that the splits
    * partition the corpus. */
  def l33TrainSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    l33SplitCore(documents(spark, dir).select($"doc_id", $"lang", $"text"))
  }

  /** Split core over (doc_id, lang, text), split out for the property
    * test. */
  private[graft] def l33SplitCore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val bucket = Text.md5Bucket($"text", 100)
    docs.select($"doc_id", $"lang",
      when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        .as("split"))
  }

  /** L34: unicode normalization (accent stripping) through the native
    * [[graft.functions.UnaccentExpr]] — NFD-decompose + drop combining
    * marks, the per-row cleanup multilingual corpora run before
    * tokenization. The fixture text is ASCII, so the query first plants
    * accents deterministically (`translate` vowels → accented forms, the
    * same call in DuckDB) and then strips them back: the oracle computes
    * the identical plant+strip with its own `strip_accents`, and
    * `roundtrip_ok` pins that strip∘plant is the identity on this corpus.
    * Map-only: zero shuffles at any scale; ASCII rows take the zero-copy
    * fast path inside the expression. */
  def l34UnicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val accented = translate($"text", "aeiou", "áéíóú")
    // ONE unaccent tree; roundtrip_ok derives from the named column, so
    // the NFD+regex work is never double-evaluated even where codegen
    // subexpression elimination doesn't reach
    documents(spark, dir)
      .select($"doc_id", $"text",
        graft.functions.UnaccentExpr.unaccentNative(spark, accented).as("clean"))
      .withColumn("roundtrip_ok", $"clean" === $"text")
      .drop("text")
  }

  /** L35: bigram-LM quality score — the LM-free stand-in for perplexity
    * filtering one rung above l30's OOV rate: score each document by the
    * mean MLE conditional probability of its token bigrams,
    * P(w2|w1) = count(w1 w2) / count(w1 ·), estimated from the corpus
    * itself and kept in scaled-integer arithmetic (×1e6, integer
    * division) so every score hash-matches the oracle exactly.
    * Fluent/common phrasing scores high; shuffled or boilerplate-glued
    * text scores low. Scale shape: bigram and prefix counts are two
    * partial-agg shuffles on token keys (vocabulary-sized, not
    * corpus-sized output), then the stats JOIN BACK to the bigram stream
    * by key — the "ship statistics to the data" pattern; nothing is ever
    * collected, and no doc×doc or doc×vocab product exists anywhere. */
  def l35BigramLmScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    l35ScoreCore(documents(spark, dir).select($"doc_id", $"text"))
  }

  /** Scoring core over (doc_id, text), split out so PipelineOpsSpec can
    * plant fluent vs scrambled documents and assert the ordering. */
  private[graft] def l35ScoreCore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val bi = docs
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 2) // sequence(1,0) would run DESCENDING, not empty
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("z"))
      .select($"doc_id", $"z.w1".as("w1"), $"z.w2".as("w2"))
    val uni = bi.groupBy($"w1").agg(count(lit(1)).as("uc"))
    val big = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("bc"))
    bi.join(big, Seq("w1", "w2")).join(uni, Seq("w1"))
      .select($"doc_id", expr("bc * 1000000 div uc").as("s"))
      .groupBy($"doc_id")
      .agg(expr("sum(s) div count(*)").as("lm_score"))
  }

  /** L36: incremental near-dedup — a NEW batch deduplicated against the
    * EXISTING corpus, the shape production ingest actually runs (l2
    * dedups a corpus against itself; a daily crawl must ask "which of
    * these N new docs near-duplicate the 100 TB already ingested?").
    * Signatures on both sides come from the fused native
    * [[graft.functions.MinhashSigExpr]] (map-only, byte-identical to the
    * md5-slice family the oracle derives); candidate pairs form ONLY via
    * the banded bucket join of batch bands against corpus bands — cost
    * scales with |batch| + matching buckets, never |corpus|², and the
    * corpus side's signatures are exactly what an ingest pipeline keeps
    * as its persistent dedup index (store 6 hashes per doc, not the
    * text). The planted batch (first token dropped) must land on its
    * source doc. */
  def l36IncrementalNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir).filter($"doc_id" % 5 === 0)
    val corpus = d.select($"doc_id".as("id"), $"text")
    val batch = d.select(($"doc_id" + 1000000).as("id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpusIdx = minhashBands(corpus).select($"id".as("dup_of"), $"band", $"bi")
    minhashBands(batch).join(corpusIdx, Seq("band", "bi"))
      .groupBy($"id".as("batch_id"))
      .agg(min($"dup_of").as("dup_of"))
  }

  /** Banded-MinHash index rows for (id, text) documents: 2 bands × 3 rows
    * over the fused native signature (same family as l2/l2c, so any
    * consumer hash-matches the md5-slice oracle). Docs with too few
    * shingles emit no bands (they can never near-dup match). Shared by
    * l36 and the streaming twin st17. Both band rows are derived from ONE
    * signature pass via an array explode — a unionByName of two selects
    * over the projection would execute the fused signature expression
    * (and its source scan) twice. */
  private[graft] def minhashBands(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    def bandOf(sig: Column, lo: Int, bi: Int): Column = struct(
      md5(concat_ws("|", (lo to lo + 2).map(i => element_at(sig, i)): _*)
        .cast("binary")).as("band"),
      lit(bi).as("bi"))
    docs
      .select($"id", graft.functions.MinhashSigExpr
        .minhashSigNative(docs.sparkSession, $"text").as("sig"))
      .filter($"sig".isNotNull)
      .select($"id", explode(array(bandOf($"sig", 1, 1), bandOf($"sig", 4, 2))).as("bb"))
      .select($"id", $"bb.band".as("band"), $"bb.bi".as("bi"))
  }

  /** L38: mixture execution — l20 PLANS per-domain repeat factors; this
    * op EXECUTES them: every doc is emitted floor(r) times, plus one more
    * copy for the deterministic md5-bucket fraction of docs that covers
    * the fractional part — "2.4× domain X" becomes 2 copies of every doc
    * and a 3rd for the 40% of docs whose content bucket falls below the
    * cutoff. No RNG anywhere (resumable, reproducible, same property as
    * l19), and the repeat factor is computed in EXACT integer arithmetic
    * (target weights as rationals over a common denominator), so the full
    * replicated layout hash-matches the oracle. Scale shape: the domain
    * stats collapse first (tiny agg), broadcast back to the doc stream,
    * then a map-side sequence explode — fan-out happens AFTER the join,
    * so nothing corpus-sized ever shuffles. */
  def l38MixtureExecute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // target weights over denominator 180: src0=36/180, src1=18/180,
    // the remaining 18 domains share 0.7 evenly = 7/180 each (l20's plan)
    val num = when($"source" === "src0", 36L)
      .when($"source" === "src1", 18L).otherwise(7L)
    val d = documents(spark, dir)
    val counts = d.groupBy($"source").agg(count(lit(1)).as("n_d"))
      .withColumn("total", sum($"n_d").over())
      .withColumn("num", num)
      // copies*10000 in basis points, all-integer: floor == trunc, exact
      .withColumn("bp", expr("(total * num * 10000) div (180 * n_d)"))
      .select($"source", expr("bp div 10000").as("n_full"),
        expr("bp % 10000").as("frac_bp"))
    val bucket = Text.md5Bucket($"doc_id".cast("string"), 10000)
    d.select($"doc_id", $"source")
      .join(broadcast(counts), Seq("source"))
      .withColumn("copies",
        $"n_full" + when(bucket < $"frac_bp", 1L).otherwise(0L))
      .filter($"copies" >= 1) // sequence(1,0) runs DESCENDING, never empty
      .select($"source", $"doc_id",
        explode(sequence(lit(1L), $"copies")).as("copy_idx"))
  }

  /** L37: HTML boilerplate stripping — the markup-removal pass between
    * crawl and every text operator above: drop script/style blocks
    * WITH their contents, replace remaining tags with spaces, collapse
    * whitespace, decode the common entities. The fixture wraps each doc
    * in a deterministic page skeleton (nav div, script, footer) so the
    * whole extract chain is oracle-checkable. Regex subset chosen to
    * mean the same thing in Java regex and RE2: NO backreferences
    * (`</\1>` silently matches nothing in DuckDB's RE2 — the
    * script-block pattern is spelled as an explicit alternation) and
    * dotall via Java's inline `(?s)` = RE2's `s` flag. Map-only: one
    * codegen'd projection chain, zero exchanges at any scale. */
  def l37HtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val markup = expr(
      """concat('<html><head><title>doc</title><script>var x=1;</script></head>',
        |'<body><div class="nav">menu &amp; links</div><p>',
        |replace(text, ' ', ' &nbsp;'),
        |'</p><footer>&copy; 2024</footer></body></html>')""".stripMargin)
    documents(spark, dir)
      .select($"doc_id", markup.as("markup"))
      .select($"doc_id", trim(regexp_replace(regexp_replace(regexp_replace(
        $"markup",
        "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", ""),
        "<[^>]+>", " "),
        "\\s+", " ")).as("no_tags"))
      .select($"doc_id", expr(
        "replace(replace(replace(no_tags, '&nbsp;', ''), '&amp;', '&'), '&copy;', '(c)')")
        .as("clean"))
  }

  /** L14: vocabulary table — token frequencies with a deterministic top-k
    * (the tokenizer-training / frequency-filter input). Partial map-side
    * counts before the one shuffle; top-k is TakeOrderedAndProject. */
  def l14Vocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token").limit(50)
  }

  /** L15: benchmark decontamination — flag corpus docs sharing any word
    * 8-gram with a held-out benchmark set (doc_id < 20 here). The overlap
    * probe is a semi-join on the shingle key: the benchmark shingle set is
    * small and broadcasts; the corpus side streams — never a doc×doc
    * comparison. */
  def l15Contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val benchShingles = documents(spark, dir).filter($"doc_id" < 20)
      .select(explode(Text.shingles($"text", 8)).as("shingle")).distinct()
    documents(spark, dir).filter($"doc_id" >= 20)
      .select($"doc_id", explode(Text.shingles($"text", 8)).as("shingle"))
      .join(benchShingles, Seq("shingle"), "left_semi")
      .select($"doc_id").distinct()
  }

  /** L16: PII scrub — replace email-shaped and long-digit-run substrings
    * before training (single-pass projection, codegen'd regex). */
  def l16PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scrubbed = regexp_replace(
      regexp_replace($"text", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{6,}", "<NUM>")
    documents(spark, dir).select($"doc_id",
      (scrubbed =!= $"text").as("was_scrubbed"),
      length(scrubbed).cast("long").as("n_chars_scrubbed"))
  }

  /** F-bits: bitwise and/or/xor/shift surface. */
  def fBits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).select($"event_id",
      ($"event_id".bitwiseAND(255L)).as("low8"),
      ($"event_id".bitwiseOR(16L)).as("or16"),
      ($"event_id".bitwiseXOR($"user_id")).as("xored"),
      expr("shiftleft(event_id, 2)").as("shl2"),
      expr("shiftright(event_id, 3)").as("shr3"))
  }

  /** F-bitagg: bitwise AGGREGATES — the order-independent reductions that
    * build per-group membership bitmaps (bit_or) and common-mask checks
    * (bit_and) distributively: each is a partial-merge agg, so the bitmap
    * assembles map-side at 100 TB like any sum. */
  def fBitagg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_type", pmod($"user_id", lit(60L)).as("slot"))
      .withColumn("mask", expr("shiftleft(1L, cast(slot AS INT))"))
      .groupBy($"event_type")
      .agg(expr("bit_or(mask)").as("user_bitmap"),
        expr("bit_and(mask)").as("common_mask"),
        expr("bit_count(bit_or(mask))").cast("long").as("n_slots"))
  }

  /** L6: quality filtering — predicate stack over the L4 metrics. */
  def l6QualityFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    l4TextMetrics(spark, dir)
      .join(documents(spark, dir).select($"doc_id", $"lang", $"n_chars"), Seq("doc_id"))
      .withColumn("q_score",
        (when($"n_chars".between(100, 2000), 1L).otherwise(0L) +
          when($"n_tokens" >= 10, 1L).otherwise(0L) +
          when($"uniq_ratio" > 0.2, 1L).otherwise(0L) +
          when($"lang".isInCollection(Seq("en", "de", "es", "fr")), 1L).otherwise(0L)))
      .filter($"q_score" >= 3)
      .select($"doc_id", $"q_score")
  }

  /** L18: repetition metrics — the Gopher-rule family of quality signals
    * (duplicate-token and duplicate-bigram fractions; heavily repetitive
    * documents are boilerplate/spam in a pretraining corpus). Pure
    * codegen'd column functions: bigrams come from a `transform` over the
    * token index range, no explode and no shuffle — per-row work that
    * scales linearly at 100 TB. */
  def l18Repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialize the token array ONCE: a lambda body re-evaluates its
    // subexpressions per element, so indexing split(text) inside transform
    // would re-split the whole string per bigram — O(n²) per doc
    val bigrams = expr("transform(sequence(0, size(t) - 2), " +
      "i -> concat(t[i], ' ', t[i + 1]))")
    documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .select($"doc_id",
        size($"t").cast("long").as("n_tokens"),
        (lit(1.0) - size(array_distinct($"t")).cast("double") / size($"t"))
          .as("dup_token_frac"),
        // sequence(0, -1) would count DOWN for a 1-token doc; guard to 0.0
        when(size($"t") >= 2,
          lit(1.0) - size(array_distinct(bigrams)).cast("double") / size(bigrams))
          .otherwise(0.0).as("dup_bigram_frac"))
  }

  /** L27: character-diversity quality score — Gini impurity of the
    * document's letter distribution (1 − Σ p², the no-log cousin of
    * entropy): gibberish and run-on boilerplate collapse toward 0, natural
    * prose sits high. Counts come from 27 length(replace(...)) probes over
    * a bounded alphabet — a single codegen'd projection pass, no explode,
    * no shuffle (the per-char-row explode formulation would shuffle
    * |corpus-chars| rows at 100 TB). Rational arithmetic only: integer
    * counts and one exactly-rounded division, so the score hash-matches
    * any engine — a log-based entropy would differ in the last ulp. */
  def l27CharDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one fused byte-loop pass (native codegen expression) instead of 27
    // length(regexp_replace(...)) probes — 6× at sf0.1, same exact counts
    // (ExtractionSpec pins bit-equality against the composed formulation)
    val s = graft.functions.CharStatsExpr.charStatsNative(spark, lower($"text"))
    documents(spark, dir).select($"doc_id", s.as("s"))
      .select($"doc_id",
        $"s.n_alpha".as("n_alpha"),
        when($"s.n_alpha" > 0, lit(1.0) -
          $"s.sum_sq".cast("double") / ($"s.n_alpha" * $"s.n_alpha").cast("double"))
          .otherwise(0.0).as("char_diversity"))
  }

  /** The composed 27-probe formulation l27 replaced — kept (unregistered)
    * as the differential-test partner for the native expression. */
  private[graft] def l27Composed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val alphabet = ('a' to 'z').map(_.toString) :+ " "
    val lo = lower($"text")
    val counts = alphabet.map(c =>
      (length(lo) - length(regexp_replace(lo, if (c == " ") "\\ " else c, "")))
        .cast("long"))
    val n = counts.reduce(_ + _)
    val sumSq = counts.map(c => c * c).reduce(_ + _)
    documents(spark, dir).select($"doc_id",
      n.as("n_alpha"),
      when(n > 0, lit(1.0) - sumSq.cast("double") / (n * n).cast("double"))
        .otherwise(0.0).as("char_diversity"))
  }

  /** L28: the curation pipeline END TO END — the nightly corpus build as
    * one registered query: token/uniqueness quality gate (L4/L6) → exact
    * dedup keeping the lowest doc id per content digest (L1) →
    * deterministic per-language stratified sample (L19's md5-bucket
    * convention) → per-language corpus stats. Every stage is an operator
    * proven elsewhere; registering the composition proves they CHAIN with
    * the same shuffle economics as the pieces — one digest exchange for
    * the dedup window, one lang exchange for the final agg, nothing
    * driver-side between stages. The corpus-level uniqueness ratio is
    * computed as exact integer sums divided once, so the whole chain
    * hash-matches the oracle. */
  def l28CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    val metrics = documents(spark, dir).select($"doc_id", $"lang", $"text",
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq"))
    val quality = metrics.filter($"n_tokens" >= 20 &&
      $"n_uniq".cast("double") / $"n_tokens" >= 0.3)
    val deduped = quality
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5($"text".cast("binary"))).orderBy($"doc_id")))
      .filter($"rn" === 1)
    val bucket = Text.md5Bucket($"doc_id".cast("string"), 100)
    val rate = when($"lang" === "en", 50L).when($"lang" === "de", 25L).otherwise(10L)
    deduped.filter(bucket < rate)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("total_tokens"),
        (sum($"n_uniq").cast("double") / sum($"n_tokens")).as("corpus_uniq_ratio"))
  }

  /** L19: deterministic stratified sampling — per-language keep rates
    * applied via an md5 bucket of the doc id (content-addressed, so the
    * SAME docs are kept on every run, on any cluster, with no RNG state to
    * coordinate: the property that makes a 100 TB sampling job resumable
    * and its output reproducible). Rates: en 50%, de 25%, rest 10%. */
  def l19StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = Text.md5Bucket($"doc_id".cast("string"), 100)
    val rate = when($"lang" === "en", 50L).when($"lang" === "de", 25L).otherwise(10L)
    documents(spark, dir)
      .withColumn("bucket", bucket)
      .filter($"bucket" < rate)
      .select($"doc_id", $"lang", $"bucket")
  }

  /** L20: domain-mixture planner — given target mixture weights per source
    * domain, derive each domain's sampling/repetition factor from its
    * actual share of the corpus (the "data recipe" step of a pretraining
    * run). One tiny aggregate plus arithmetic; the factor is what a
    * downstream weighted sampler (L19-style) would consume. */
  def l20MixturePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val target = when($"source" === "src0", 0.2)
      .when($"source" === "src1", 0.1)
      .otherwise(lit(0.7) / 18) // remaining 18 domains share the rest evenly
    val counts = documents(spark, dir).groupBy($"source")
      .agg(count(lit(1)).as("n_docs"))
    // the global window runs over the ALREADY-AGGREGATED per-domain rows
    // (tens of rows at any corpus size), not the corpus itself
    counts
      .withColumn("actual_frac",
        $"n_docs".cast("double") / sum($"n_docs").over())
      .withColumn("target_w", target)
      .withColumn("repeat_factor", $"target_w" / $"actual_frac")
  }

  /** L21: symmetric int8 embedding quantization — the memory side of
    * similarity search at scale: 4× smaller vectors means 4× more corpus
    * per executor before the ANN index spills. Per-vector scale =
    * max|x_i| (guarded against all-zero vectors), q_i = round(x_i · 127 /
    * scale) ∈ [-127, 127]; everything is codegen'd array HOFs, one pass,
    * no shuffle. Values are emitted as a joined string so the oracle can
    * compare them exactly; RecallSpec bounds the reconstruction error and
    * cosine distortion. */
  def l21Quantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scaleSql =
      "greatest(array_max(transform(embedding, y -> abs(cast(y as double)))), 1e-12d)"
    embeddings(spark, dir).select($"vec_id",
      expr(scaleSql).as("scale"),
      expr("array_join(transform(embedding, x -> cast(cast(round(" +
        s"cast(x as double) * 127 / $scaleSql) as int) as string)), ',')").as("q8"))
  }

  /** L24: SimHash-banded near-dedup — the third dedup family beside banded
    * MinHash (L2) and embedding cosine (L9): band the per-doc SimHash into
    * 4 nibbles, candidate pairs form ONLY inside same-(band, value)
    * buckets (pigeonhole: hamming ≤ 3 guarantees one intact band), then an
    * exact `bit_count(xor)` filter keeps pairs within distance 2 — which
    * recovers the planted near-duplicates, whose one-word edit flips few
    * fingerprint bits. The fixture fingerprint is 16-bit for oracle
    * parity, so buckets are n/16 and the probe set is bounded (id%10)
    * like L8; a production deployment uses a 64-bit SimHash with 16-bit
    * bands (buckets ≈ n/65536) — same plan shape, never all-pairs. */
  def l24SimhashBandedDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = nearDupCandidates(spark, dir).filter($"id" % 10 === 0)
      .select($"id", explode(split($"text", " ")).as("token"))
    val bitSums = (1 to 16).map(i => sum(Text.simhashBitContribution($"token", i)).as(s"s$i"))
    val sums = tok.groupBy($"id").agg(bitSums.head, bitSums.tail: _*)
    val fpCol = (1 to 16).map(i => when(col(s"s$i") > 0, lit(1L << (i - 1))).otherwise(0L))
      .reduce(_ + _)
    val fp = sums.select($"id", fpCol.as("fp"))
    val banded = fp.select($"id", $"fp",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), expr(s"shiftright(fp, ${b * 4}) & 15").as("bval"))): _*))
        .as("bd"))
      .select($"id", $"fp", $"bd.band".as("band"), $"bd.bval".as("bval"))
    banded.join(
        banded.select($"id".as("b_id"), $"fp".as("b_fp"), $"band", $"bval"),
        Seq("band", "bval"))
      .filter($"id" < $"b_id")
      .select($"id".as("a_id"), $"b_id", $"fp".as("a_fp"), $"b_fp")
      .distinct()
      .select($"a_id", $"b_id",
        expr("bit_count(a_fp ^ b_fp)").cast("long").as("hamming"))
      .filter($"hamming" <= 2)
  }

  /** L25: ranked full-text retrieval over an inverted index — the
    * tokenize → postings → document-frequency → weighted-overlap shape of
    * a search engine (the query side of the reference's newspaper corpus:
    * reference searches data.kb.se by query term, 01-scrape-images.py:72),
    * expressed relationally. Term weights are integer TF-IDF
    * (`1e6 div df`) and the score is length-normalized with one integer
    * division, so ranking is bit-reproducible in any engine — no
    * float-summation order sensitivity, which is what lets a relevance
    * score be oracle-checked exactly.
    *
    * Scale: postings shuffle once on token (the inverted index); the
    * query-term set is tiny and broadcast; df comes from the postings
    * already restricted to query terms (never a full-vocabulary agg); only
    * k rows per query survive the rank window. */
  def l25RankedRetrieval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qTerms = Seq(
      (1L, "spark window merge"),
      (2L, "vector hash join"),
      (3L, "slow filter scan"))
      .toDF("query_id", "q_text")
      .select($"query_id", explode(split($"q_text", " ")).as("token"))
      .distinct()
    val postings = documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    // per-(doc, term) frequency, restricted to query terms up front — the
    // broadcast semi-ish join prunes the postings before any wide agg
    val hits = postings.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
      .join(broadcast(qTerms.select($"token").distinct()), Seq("token"))
    val dfreq = hits.groupBy($"token").agg(count(lit(1)).as("df"))
    val dl = postings.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"doc_id")
    hits
      .join(broadcast(qTerms), Seq("token"))
      .join(broadcast(dfreq), Seq("token"))
      .groupBy($"query_id", $"doc_id")
      .agg(expr("sum(tf * (1000000 div df))").as("tfw"))
      .join(dl, Seq("doc_id"))
      .select($"query_id", $"doc_id", expr("(tfw * 1000) div dl").as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
      .select($"query_id", $"doc_id", $"score", $"rnk")
  }

  /** L26: semantic clustering — Lloyd's k-means over the embedding column
    * with DETERMINISTIC seeding (initial centroids = the k lowest vec_ids)
    * and a fixed iteration count, the grouping step of semantic dedup /
    * corpus mixing. Each iteration is one broadcast of k centroids + one
    * shuffle-bounded average per cluster — never point×point. Rows-only vs
    * the oracle (float centroid math has no exact SQL twin); bounded by a
    * KMeansSpec test: assignment is total, cluster count = k, and inertia
    * is non-increasing across iterations. */
  /** Squared distance `v` ↔ literal centroid, as the SAME index-ordered
    * zip_with/aggregate fold the pre-r20 crossJoin form evaluated — the
    * double result is bit-identical, only the plan shape changed. */
  private def d2To(v: Column, c: Seq[Double]): Column =
    aggregate(
      zip_with(v, typedlit(c), (x, y) => (x - y) * (x - y)),
      lit(0d), (acc, e) => acc + e)

  /** Argmin over a bounded centroid set as ONE map-side expression:
    * an array of (d2, cid) structs reduced by array_min — struct ordering
    * compares d2 first, then cid, exactly the old window's
    * `orderBy(d2, cid)` tie-break. r20 (guide §2.4): the previous shape
    * crossJoined each vector against the k-row broadcast set and picked
    * the minimum with a row_number window — i.e. a k× row explosion
    * pushed through a full exchange on vec_id plus a per-vector sort,
    * PER LLOYD ITERATION. The centroid set is already bounded
    * driver-side state (k·|dims| scalars — k-means' documented contract),
    * so the assignment needs no join and no shuffle at ANY corpus size:
    * map-only over the vectors, which is the 100 TB-correct shape. */
  private def argminCentroid(v: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cid, c) =>
      struct(d2To(v, c).as("d2"), lit(cid).as("cid"))
    }: _*))

  /** Nearest-centroid assignment: (vec_id, v, cid, d2) — one row per
    * vector, map-only (see [[argminCentroid]]). */
  private def kmeansAssign(
      emb: DataFrame, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    import emb.sparkSession.implicits._
    emb.withColumn("best", argminCentroid($"v", centroids))
      .select($"vec_id", $"v", $"best.cid".as("cid"), $"best.d2".as("d2"))
  }

  /** Run `iters` Lloyd's rounds from the deterministic seed (the k lowest
    * vec_ids) and return the final assignment. Exposed at this granularity
    * so KMeansSpec can bound quality: inertia(3 rounds) <= inertia(seed). */
  private[graft] def kmeansAssignment(
      spark: SparkSession, dir: String, iters: Int): DataFrame = {
    import spark.implicits._
    val k = 4
    val emb = embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    var centroids: Seq[(Int, Seq[Double])] = emb.filter($"vec_id" < k)
      .orderBy($"vec_id").collect().toSeq
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iters)
      centroids = kmeansAssign(emb, centroids).groupBy($"cid")
        .agg(array((0 until 64).map(i => avg($"v"(i))): _*).as("c"))
        .collect().toSeq.map(r => (r.getInt(0), r.getSeq[Double](1)))
    kmeansAssign(emb, centroids)
  }

  /** Per-subspace PQ state after `iters` Lloyd's rounds: (vec_id, sub,
    * cid, d2). All m subspaces train in ONE DataFrame (sub is just a key
    * column), so the rounds cost the same shuffles as plain k-means; the
    * codebook (m·k rows of sd doubles) broadcasts. Deterministic: seeds
    * are the k lowest vec_ids' subvectors, ties in assignment break by
    * cid. */
  private[graft] def pqAssignment(
      spark: SparkSession, dir: String, iters: Int): DataFrame = {
    import spark.implicits._
    val m = 4; val sd = 16; val k = 16
    val subs = embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .select($"vec_id", explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), slice($"v", s * sd + 1, sd).as("sv"))): _*)))
      .select($"vec_id", $"col.sub".as("sub"), $"col.sv".as("sv"))

    // r20 (guide §2.4): per-subspace argmin as one map-side CASE over the
    // m bounded codebook slices instead of a k× join explosion + window
    // exchange per iteration — same [[argminCentroid]] rationale, keyed by
    // the `sub` column (m is a compile-time constant, so the CASE is m
    // branches of k struct expressions)
    def assign(code: Seq[(Int, Int, Seq[Double])]): DataFrame = {
      val bySub = code.groupBy(_._1).map { case (s, cs) =>
        s -> cs.map(c => (c._2, c._3)).sortBy(_._1)
      }
      val best = bySub.toSeq.sortBy(_._1).map { case (s, cs) =>
        (s, argminCentroid($"sv", cs))
      }.foldLeft(lit(null).cast("struct<d2:double,cid:int>")) {
        case (acc, (s, am)) => when($"sub" === s, am).otherwise(acc)
      }
      subs.withColumn("best", best)
        .select($"vec_id", $"sub", $"sv", $"best.cid".as("cid"), $"best.d2".as("d2"))
    }

    var code: Seq[(Int, Int, Seq[Double])] = subs.filter($"vec_id" < k)
      .orderBy($"sub", $"vec_id").collect().toSeq
      .map(r => (r.getInt(1), r.getLong(0).toInt, r.getSeq[Double](2)))
    for (_ <- 1 to iters)
      code = assign(code).groupBy($"sub", $"cid")
        .agg(array((0 until sd).map(i => avg($"sv"(i))): _*).as("c"))
        .collect().toSeq.map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assign(code).select($"vec_id", $"sub", $"cid", $"d2")
  }

  /** L47: product quantization — the embedding-compression step that makes
    * billion-vector ANN serving feasible: each 64-dim vector becomes m=4
    * one-byte codes (one per 16-dim subspace, k=16 centroids each), a
    * 64× compression with distances approximable from per-subspace
    * lookup tables. Training is l26's deterministic Lloyd's run per
    * subspace, all subspaces as one keyed DataFrame (no per-subspace
    * jobs); the bounded driver step is the m·k-row codebook, exactly
    * k-means' contract. Rows-only by design (codebooks aren't SQL);
    * PipelineOpsSpec pins determinism, totality, inertia descent AND
    * that PQ beats the k=1 (subspace-mean) quantizer — the invariant
    * form of 'the codes actually carry information'. */
  def l47PqQuantize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pqAssignment(spark, dir, 2)
      .groupBy($"vec_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct($"sub", $"cid"))),
          x => x.getField("cid").cast("string")), ",").as("codes"),
        sum($"d2").as("recon_err"))
  }

  def l26KmeansClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kmeansAssignment(spark, dir, 3)
      .groupBy($"cid").agg(count(lit(1)).as("n_members"))
      .select($"cid".cast("long").as("cluster_id"), $"n_members")
  }

  /** L22: deterministic per-group top-k sampling — exactly k docs per
    * language, chosen by content-hash order (the fixed-size-per-stratum
    * complement of [[l19StratifiedSample]]'s fixed-rate sampling; same
    * reproducible, RNG-free property). One shuffle on the group key plus a
    * per-partition sort; a skewed stratum lands on one reducer, so at
    * 100 TB pair it with the salted two-phase pattern (a4_salted_agg) or
    * pre-filter with an l19-style rate to bound group size first. */
  def l22GroupTopkSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .withColumn("h", md5($"doc_id".cast("string").cast("binary")))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"lang").orderBy($"h", $"doc_id")))
      .filter($"rn" <= 20)
      .select($"doc_id", $"lang", $"rn".cast("long").as("rn"))
  }

  /** Typed Dataset[T] surface (SURVEY §1.3): case-class encoder, typed
    * filter, then back to the relational plan — compile-time field checks
    * where the record shape is fixed (the NewspaperIssue analog). */
  def tTypedDataset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .as[Llm.Doc]
      .filter(d => d.n_chars > 500 && d.lang != "zh")
      .map(d => (d.doc_id, d.source, d.text.split(' ').length.toLong))
      .toDF("doc_id", "source", "n_tokens")
  }

  /** L39: repeated-span detection — the exact-substring-dedup shape from
    * the dedup-training-data literature (find spans of ≥ k tokens that
    * recur across documents, so the repeated region itself can be cut
    * rather than dropping whole near-dup docs). Plan: positional 8-gram
    * hashes (map-only rolling projection, one md5 per position), one
    * shuffle keyed by gram hash to find grams seen in ≥ 2 distinct docs,
    * an equi semi-join back to the positions, then a per-doc window that
    * merges overlapping hits into maximal spans via the pos − row_number
    * island trick. No all-pairs join anywhere: candidate volume is
    * O(total tokens) and every shuffle key (gram hash, doc id) is
    * uniformly distributed, so the shape holds at corpus scale. Operates
    * on the near-dup candidate corpus (originals + first-token-dropped
    * copies) so real multi-token spans exist to find. */
  def l39SpanDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grams = nearDupCandidates(spark, dir)
      .filter($"id" % 4 === 0) // bounded subset; 1e6 ≡ 0 (mod 4) keeps orig+copy together
      .select($"id", posexplode(Text.shingles($"text", 8)))
      .select($"id", ($"pos" + 1).cast("long").as("pos"),
        md5($"col".cast("binary")).as("g"))
    val dup = grams.groupBy($"g")
      .agg(countDistinct($"id").as("nd"))
      .filter($"nd" >= 2)
      .select($"g")
    val hits = grams.join(dup, "g").select($"id", $"pos")
    val w = Window.partitionBy($"id").orderBy($"pos")
    hits.withColumn("k", $"pos" - row_number().over(w))
      .groupBy($"id", $"k")
      .agg(min($"pos").as("span_start"), (max($"pos") + 7).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select($"id".as("doc_id"), $"span_start", $"span_end", $"n_grams")
  }

  /** L40: deterministic global shuffle + shard assignment — the "shuffle
    * the corpus before training" step. Shard = hash-prefix of a seeded
    * per-doc md5 (uniform, resumable, RNG-free — re-running yields byte-
    * identical shards); position-in-shard = row_number over the full hash
    * WITHIN the shard, so there is ONE exchange keyed by shard and a
    * partition-local sort, never a global total order. At 100 TB this is
    * exactly the write shape wanted: shard count = output file count,
    * each reducer sorts only its own shard. The fixture uses 8 shards; a
    * real deployment raises the constant to thousands. */
  def l40ShuffleShard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val key = md5(concat($"doc_id".cast("string"), lit(":42")).cast("binary"))
    documents(spark, dir)
      .select($"doc_id", key.as("skey"))
      .withColumn("shard", conv(substring($"skey", 1, 4), 16, 10).cast("long") % 8)
      .withColumn("pos_in_shard", row_number()
        .over(Window.partitionBy($"shard").orderBy($"skey", $"doc_id")).cast("long"))
      .select($"doc_id", $"shard", $"pos_in_shard")
  }

  /** L41: BPE merge learning — the tokenizer-training step of a data
    * pipeline, shaped the way production BPE trainers work at scale: ONE
    * corpus-sized job counts word frequencies (map-side partial agg, one
    * shuffle on the word), and every merge round after that runs on the
    * small distinct-vocab table, never rescanning the corpus. Each round
    * counts adjacent symbol pairs weighted by word frequency, takes the
    * globally most frequent pair (ties broken lexicographically, so the
    * learned merges are fully deterministic), collects that ONE row to the
    * driver (the k-means-style bounded driver step) and applies the merge
    * with a left-to-right non-overlapping string replace — identical
    * greedy semantics in Spark and DuckDB, so the whole 4-round learn is
    * oracle-checked. */
  def l41BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wf = documents(spark, dir)
      .select(explode(Text.tokens($"text")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
    bpeCore(wf, 4)
  }

  /** L42: BPE encode — applying l41's learned merges back to the corpus
    * vocabulary (the tokenizer's encode step) and reporting the corpus
    * compression it buys per language: token counts shrink from
    * chars-per-word to merged-symbols-per-word. All integer sums, so the
    * result is oracle-exact; the encode itself is the same 4 replaces the
    * learner applied, run map-only over the vocab table — at corpus scale
    * the encode broadcasts the (tiny) merge list and never shuffles. */
  def l42BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wf = documents(spark, dir)
      .select(explode(Text.tokens($"text")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
    val encoded = bpeEncoded(wf, 4)
    encoded.agg(
      sum($"cnt" * length($"word")).as("total_chars"),
      sum($"cnt" * size(split($"sym", "\\|"))).as("total_tokens"),
      count(lit(1)).as("n_words"))
  }

  /** The merge-learning loop over a (word, cnt) frequency table; symbols
    * are '|'-joined so a merge is a plain non-overlapping replace. */
  private[graft] def bpeCore(wordFreq: DataFrame, rounds: Int): DataFrame =
    bpeLearn(wordFreq, rounds)._1

  private[graft] def bpeEncoded(wordFreq: DataFrame, rounds: Int): DataFrame =
    bpeLearn(wordFreq, rounds)._2

  /** Returns (merge table, encoded vocab (word, cnt, sym)). */
  private def bpeLearn(wordFreq: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    // the vocab table is small by construction — pin it so each round's
    // pair count reads a local snapshot instead of re-running the corpus agg
    var syms = wordFreq
      .select($"word", $"cnt", array_join(split($"word", ""), "|").as("sym"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = syms.select($"cnt", split($"sym", "\\|").as("t"))
        .filter(size($"t") >= 2)
        .select($"cnt", explode(transform(
          sequence(lit(1), size($"t") - 1, lit(1)),
          i => struct(element_at($"t", i).as("l"),
            element_at($"t", i + 1).as("r")))).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"cnt").as("weight"))
        .orderBy(desc("weight"), $"lhs", $"rhs")
        .limit(1)
        .take(1).headOption
        .getOrElse(sys.error(
          s"BPE round $r: no adjacent pairs left — lower `rounds` for this corpus"))
      val (l, rr, w) = (top.getString(0), top.getString(1), top.getLong(2))
      // symbols here are fixture-alphanumeric; fail loudly before splicing
      // anything surprising into an expression
      require((l + rr).matches("[A-Za-z0-9]+"), s"unexpected symbol chars: '$l'+'$rr'")
      merges += ((r.toLong, l, rr, l + rr, w))
      // exact greedy left-to-right merge as a fold over the SYMBOLS, not a
      // substring replace: a plain replace(sym, 'h|e', 'he') also matches
      // where 'h' is merely the tail of a longer symbol ('th|e' would glue
      // into 'the'), merging a pair that was never counted. The fold keys
      // on the separator-delimited last symbol (acc ends with '|h') so
      // boundaries can't be crossed, and appending without a separator
      // makes the merged symbol immune to re-matching within the pass.
      syms = syms.select($"word", $"cnt",
        expr(s"substring(aggregate(split(sym, '\\\\|'), '', (acc, x) -> " +
          s"CASE WHEN endswith(acc, '|$l') AND x = '$rr' THEN concat(acc, x) " +
          s"ELSE concat(acc, '|', x) END), 2)").as("sym"))
    }
    (merges.result().toDF("round", "lhs", "rhs", "merged", "weight"), syms)
  }

  /** L43: per-label embedding centroids in mergeable partial-sum form —
    * the coarse-quantizer training step behind l3_ivf's probe lists (and
    * k-means' update step) as a first-class relational op. posexplode
    * turns each vector into (dim, value) rows, map-side partial sums
    * combine before the one shuffle on (label, dim), and the output keeps
    * (sum, n) rather than the mean: partial sums are exactly mergeable
    * across shards/days (the a14 incremental-agg property) and avoid the
    * integer-division floor-vs-trunc oracle trap on negative sums. Values
    * are scaled 1e6 in double then rounded to long, so the result
    * hash-matches bit-for-bit. */
  def l43LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embeddings(spark, dir)
      .select($"label", posexplode($"embedding"))
      .select($"label", ($"pos" + 1).cast("long").as("dim"),
        round($"col".cast("double") * 1000000).cast("long").as("v"))
      .groupBy($"label", $"dim")
      .agg(sum($"v").as("sum_scaled"), count(lit(1)).as("n"))
  }

  /** L44: corpus-overlap estimation via a bottom-k (KMV) sketch — "how
    * much does corpus B duplicate corpus A?" answered WITHOUT the exact
    * distinct-intersection, whose shuffle is the size of both corpora.
    * Each corpus is reduced to its k smallest content hashes (md5 order;
    * distinct-then-TakeOrdered = map-side partial top-k, so each mapper
    * ships at most k rows); the k smallest of the union form an unbiased
    * uniform sample of A ∪ B, and the fraction of them present in both
    * sides estimates Jaccard within ~1/√k. Everything is deterministic
    * (hashes, not RNG), so the ESTIMATE ITSELF hash-matches the DuckDB
    * oracle — rare for a sketch (contrast the rows-only HLL rows).
    * RecallSpec bounds the estimate against the exact Jaccard. */
  def l44KmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    kmvOverlapCore(
      documents(spark, dir).filter($"doc_id" % 3 =!= 0).select($"text"),
      documents(spark, dir).filter($"doc_id" % 2 =!= 0).select($"text"),
      k = 256)
  }

  private[graft] def kmvOverlapCore(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    import a.sparkSession.implicits._
    val ha = a.select(md5($"text").as("h")).distinct()
      .select($"h", lit(1L).as("ina"), lit(0L).as("inb"))
    val hb = b.select(md5($"text").as("h")).distinct()
      .select($"h", lit(0L).as("ina"), lit(1L).as("inb"))
    ha.union(hb)
      .groupBy($"h").agg(max($"ina").as("ina"), max($"inb").as("inb"))
      .orderBy($"h").limit(k) // TakeOrderedAndProject: partial top-k per mapper
      .agg(count(lit(1)).as("k_actual"),
        sum($"ina" * $"inb").as("n_both"),
        sum($"ina").as("n_a"), sum($"inb").as("n_b"))
      .select($"k_actual", $"n_both", $"n_a", $"n_b",
        expr(s"1000000 * n_both div $k").as("jaccard_ppm"))
  }

  /** L45: sentence-aware chunking — l31 cuts every 40 tokens mid-thought;
    * RAG/embedding pipelines want chunks that never split a sentence.
    * The fixture text has no punctuation, so a deterministic prologue
    * plants a period every 5 words (fixed-shape regex, identical
    * non-overlapping global-replace semantics in Java regex and RE2);
    * the operator itself then splits on sentence enders and assigns each
    * sentence to the chunk its STARTING character offset falls in
    * (offset div 400) — a pure window + groupBy with no sequential scan:
    * one exchange on doc_id serves the offset window and the ordered
    * reassembly (a7's sorted-collect), map-parallel at any corpus size.
    * Chunk text is compared exactly, so a boundary off by one character
    * fails the oracle. */
  def l45SentenceChunk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sented = documents(spark, dir).select($"doc_id",
      regexp_replace($"text", "(\\w+ \\w+ \\w+ \\w+ \\w+) ", "$1. ").as("t2"))
    val sents = sented.select($"doc_id",
      posexplode(split($"t2", "(?<=\\.) "))) // sentence list, enders kept
      .select($"doc_id", ($"pos" + 1).as("sidx"), $"col".as("sent"))
    val w = Window.partitionBy($"doc_id").orderBy($"sidx")
      .rowsBetween(Window.unboundedPreceding, -1)
    sents
      .withColumn("before_chars",
        coalesce(sum(length($"sent") + 1).over(w), lit(0L)))
      .withColumn("chunk_id", expr("before_chars div 400"))
      .groupBy($"doc_id", $"chunk_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct($"sidx", $"sent"))),
          x => x.getField("sent")), " ").as("chunk_text"),
        count(lit(1)).as("n_sentences"))
  }

  /** L48: TF-IDF top terms per document — the keyword-extraction pass a
    * corpus pipeline runs for indexing/labeling, expressed so EVERY stage
    * is the scale shape: tf is one (doc, token) partial+final agg, df is
    * a WINDOW count over tf by token (one tf-sized exchange; never a
    * doc×vocab product, and never a second tokenize pass — see the
    * in-body comment), and the per-doc top-3 runs on the native
    * [[graft.plans.TopKPerKey]] operator — bounded k-buffers after one
    * hash exchange, no per-doc sort (the same operator w13 proves
    * relationally, here doing real pipeline work). Scoring uses the
    * integer idf surrogate
    * `tf × (N div df)` (the l35 integer-MLE discipline): floor division
    * agrees between Spark `div` and DuckDB `//` on non-negatives, so the
    * result hash-matches exactly where float ln() would flake at the ulp.
    * Ordering (score desc, token asc) is total within a doc (tokens are
    * distinct per group), the w13 determinism contract. */
  def l48TfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    // corpus size as a broadcast 1-row frame, not a driver count(): no
    // extra synchronous scan, and the join stays a broadcast nested-loop
    // over one row
    val nDf = docs.agg(count_distinct($"doc_id").as("n_docs"))
    val tf = docs
      .select($"doc_id", explode(Text.tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    // df as a window count over tf (rows per token == docs containing the
    // token, since tf is one row per (doc, token)), NOT a separate
    // groupBy(token) aggregate joined back: the agg-then-join spelling
    // looks like it reuses tf, but column pruning slims the df subtree's
    // aggregate (no count needed) so ReuseExchange cannot fire, and the
    // physical plan TOKENIZED AND EXPLODED THE WHOLE CORPUS TWICE — at
    // sf1 the r14 byte decomposition measured 2x the (doc,token)
    // exchange and double the tokenize CPU (BATCH_METRICS_r14.md). The
    // window spelling tokenizes once and pays one tf-sized exchange by
    // token — the same exchange the join's shuffle side cost — for
    // strictly less total work. Hot-token skew lands one reducer with
    // that token's tf rows, same as the join spelling's shuffle side;
    // at 100 TB either spelling salts the token key the j11 way.
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"token")))
      .crossJoin(broadcast(nDf))
      .select($"doc_id", $"token",
        ($"tf" * expr("n_docs div df")).as("score"))
    graft.plans.TopKPerKey.topKPerKey(
      scored,
      keys = Seq($"doc_id"),
      order = Seq($"score".desc, $"token".asc),
      k = 3)
  }

  /** L49: canonical selection — the step that turns l17's dup CLUSTERS
    * into a deduped CORPUS: per cluster, keep the member with the richest
    * content (here: distinct-token count, the l6-style quality axis) and
    * report the cluster size the keep decision collapsed. This is the
    * keep/drop policy every production dedup ends with — clustering alone
    * only names the groups. Scale shape: the member scores are a map-side
    * projection; ranking and the member count share ONE cluster_id
    * exchange (same partitioning, no re-shuffle); ties break on doc_id so
    * the keeper is total-order deterministic, oracle-exact against the
    * same recursive-CTE clustering + window rank in DuckDB. */
  def l49ClusterCanonical(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clusters = l17DedupClusters(spark, dir) // (doc_id, cluster_id)
    val quality = nearDupCandidates(spark, dir)
      .select($"id",
        size(array_distinct(Text.tokens($"text"))).cast("long").as("n_uniq"))
    val scored = clusters.join(quality, clusters("doc_id") === quality("id"))
      .select($"cluster_id", $"doc_id", $"n_uniq")
    val wRank = Window.partitionBy($"cluster_id").orderBy(desc("n_uniq"), $"doc_id")
    val wAll = Window.partitionBy($"cluster_id")
    scored
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .filter($"rn" === 1)
      .select($"cluster_id", $"doc_id".as("keeper_id"),
        $"n_uniq".as("keeper_uniq"), $"n_members")
  }

  /** L50: temperature-scaled language sampling — the multilingual
    * rebalancing step of a pretraining data recipe (the α-smoothed
    * multinomial of XLM-R/mT5): low-resource languages are upsampled by
    * p_l^α / p_l with α = 1/2, flattening the language distribution
    * without driver-side state. Exponent 1/2 is deliberate: `sqrt` and a
    * single `/` are the two IEEE-754 operations guaranteed correctly
    * rounded by BOTH the JVM and DuckDB, so every emitted double is
    * bit-identical to the oracle — a fractional `pow()` would flake at
    * the ulp between libm implementations (the l48 integer-idf discipline
    * applied to floats). The per-language share divides integer sums
    * exactly once; the normalizing constant over the |langs|-row result is
    * left to the (trivially small) consumer, like l20's repeat factors.
    * Scale shape: ONE partial+final count agg over the corpus — the
    * upsample math runs on |langs| rows. */
  def l50TemperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    val nDf = docs.agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(nDf))
      .select($"lang", $"n_docs",
        ($"n_docs".cast("double") / $"n_total").as("p"),
        sqrt($"n_docs".cast("double") / $"n_total").as("w_temp"))
      .withColumn("upsample_factor", $"w_temp" / $"p")
  }

  /** L51: stop-gram boilerplate detection — the CCNet-style pass that
    * finds n-grams repeated across a large share of the corpus (nav bars,
    * footers, license blurbs) and scores each document by how much of it
    * is boilerplate. The gram stream is exploded ONCE and immediately
    * reduced to per-(doc, gram) occurrence counts — both consumers (the
    * document-frequency table and the per-doc scoring pass) read that same
    * aggregation, so the plan reuses one exchange instead of exploding the
    * corpus twice (the naive two-branch formulation re-shingled every doc
    * for the flag-back; at sf0.1 that was ~2× the query's cost, and at
    * 100 TB it is a second full-corpus tokenize). DF is then a
    * partial+final agg over the already-deduped (doc, gram) pairs, and the
    * threshold (DF ≥ 8% of docs) keeps the boilerplate set small by
    * construction — frequent grams are few — so the flag-back join
    * broadcasts at any corpus size. The threshold is RELATIVE (computed
    * from the same corpus count, broadcast as a 1-row frame), so the
    * operator is scale-invariant: the sf0.01 fixture and a 100 TB crawl
    * flag "in ≥8% of documents" identically. Ratio = one exact integer
    * division per doc (hash-exact, l28 discipline). */
  def l51StopgramBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, dir)
    val nDf = docs.agg(count(lit(1)).as("n_total"))
    // one explode, one shuffle: every later stage reads this exchange
    val gramCounts = docs
      .select($"doc_id", explode(Text.shingles($"text", 2)).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("cnt"))
    val boiler = gramCounts
      .groupBy($"gram").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDf))
      .filter($"df" * 100 >= $"n_total" * 8)
      .select($"gram")
    gramCounts
      .join(broadcast(boiler.withColumn("is_boiler", lit(1L))), Seq("gram"), "left")
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_grams"),
        sum(when($"is_boiler".isNotNull, $"cnt").otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        $"n_boiler".cast("double") / $"n_grams")
  }

  /** L52: perplexity-tercile bucketing — the CCNet head/middle/tail
    * split that downstream recipes sample from (head = most fluent third
    * by LM score, tail = least): every doc gets its l35 bigram-LM score
    * and a bucket from EXACT global terciles. The quantiles come from
    * COUNTING, not sorting — the scale-correct exact-quantile shape: a
    * histogram keyed by score (domain bounded in [0, 1e6] by l35's
    * scaled-integer arithmetic, so the cumulative window runs over a
    * BOUNDED set no matter the corpus size), a cumulative ≥-count, and
    * two boundary scores broadcast back onto the doc stream as a map-side
    * CASE. Boundary rule is value-based (3·ge ≥ k·n, integer-only, ties
    * share a bucket), so the split is deterministic and hash-matches the
    * oracle — no global sort, no sampling, no approx. */
  def l52PerplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scores = l35ScoreCore(documents(spark, dir).select($"doc_id", $"text"))
    val wDesc = Window.orderBy($"lm_score".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // r20 (guide §1.2 "don't compute things twice"): n_total used to be a
    // separate count() branch over `scores`, whose expensive map-only
    // scoring subtree shares no exchange with the histogram branch — so
    // the corpus was SCORED a third time just to count it. The total is
    // already in the histogram: the same single-partition window extended
    // to unbounded-following sums every cnt (same sort, no extra
    // exchange), so the scoring now runs exactly twice (histogram pass +
    // the final bucket projection), the 2-pass floor of the no-cache
    // shape — pinning the corpus-sized score frame instead would be the
    // wrong default at 100 TB (the l63 lesson).
    val wAll = Window.orderBy($"lm_score".desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hist = scores.groupBy($"lm_score").agg(count(lit(1)).as("cnt"))
      .withColumn("ge", sum($"cnt").over(wDesc))
      .withColumn("n_total", sum($"cnt").over(wAll))
    val bounds = hist
      .agg(
        max(when($"ge" * 3 >= $"n_total", $"lm_score")).as("b_head"),
        max(when($"ge" * 3 >= $"n_total" * 2, $"lm_score")).as("b_mid"))
    scores.crossJoin(broadcast(bounds))
      .select($"doc_id", $"lm_score",
        when($"lm_score" >= $"b_head", "head")
          .when($"lm_score" >= $"b_mid", "middle")
          .otherwise("tail").as("bucket"))
  }

  /** L53: corpus distribution drift — the pre-mixing shift check a
    * training pipeline runs at every snapshot refresh: bucket a feature
    * (doc length) into fixed-width bins on a reference snapshot and a
    * candidate snapshot, and report per-bucket rates plus the absolute
    * rate drift. Everything is exact scaled-integer arithmetic (rates in
    * ppm via integer division — the l35/l28 hash-exact discipline; PSI's
    * `ln` would make the oracle compare float-fragile, and Σ|Δppm|/2 is
    * the total-variation distance, the standard drift statistic). Scale
    * shape: one union + one partial-agg shuffle on the BOUNDED bucket key
    * (10 rows out regardless of corpus size), then the totals ride an
    * unpartitioned window over those ≤10 rows — at 100 TB the only
    * data-sized work is the map-side bucketing projection. Snapshots are
    * simulated by doc_id parity (the fixtures carry one corpus); real use
    * passes two scans. */
  def l53DistributionDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir)
    l53DriftCore(
      d.filter($"doc_id" % 2 === 0).select($"n_chars".as("v")),
      d.filter($"doc_id" % 2 =!= 0).select($"n_chars".as("v")))
  }

  /** Drift core over two (v: long) snapshots, split out so
    * PipelineOpsSpec can plant a known shift and assert it is flagged. */
  private[graft] def l53DriftCore(ref: DataFrame, cand: DataFrame): DataFrame = {
    import ref.sparkSession.implicits._
    def bucketed(df: DataFrame, side: String) = df.select(
      least(expr("v div 200"), lit(9L)).as("bucket"), lit(side).as("side"))
    driftFromCounts(
      bucketed(ref, "ref").unionByName(bucketed(cand, "cand"))
        .groupBy($"bucket")
        .agg(sum(when($"side" === "ref", 1L).otherwise(0L)).as("ref_n"),
          sum(when($"side" === "cand", 1L).otherwise(0L)).as("cand_n")))
  }

  /** The ppm-drift tail of the drift check over an already-bucketed
    * (bucket, ref_n, cand_n) count table — shared with the streaming
    * monitor (st24), whose candidate histogram arrives from a streaming
    * aggregate instead of a batch one. */
  private[graft] def driftFromCounts(counts: DataFrame): DataFrame = {
    import counts.sparkSession.implicits._
    counts
      // totals over the bounded (≤10-row) bucket table, not the corpus.
      // An EMPTY side (ref_t or cand_t = 0) fails loudly on both engines:
      // the sessions run ANSI mode (Spark 4 default), where `div 0`
      // raises DIVIDE_BY_ZERO exactly like DuckDB's integer division —
      // the drift monitor must not silently report "no drift" when the
      // input pipeline is broken
      .withColumn("ref_t", sum($"ref_n").over(Window.partitionBy()))
      .withColumn("cand_t", sum($"cand_n").over(Window.partitionBy()))
      .select($"bucket", $"ref_n", $"cand_n",
        expr("ref_n * 1000000 div ref_t").as("ref_ppm"),
        expr("cand_n * 1000000 div cand_t").as("cand_ppm"),
        expr("abs(ref_n * 1000000 div ref_t - cand_n * 1000000 div cand_t)")
          .as("drift_ppm"))
  }

  /** L54: SemDeDup-style cluster-scoped embedding near-dedup (Abbas et al.
    * 2023, arXiv:2303.09540): assign every vector to its nearest centroid,
    * then search for near-duplicate pairs ONLY within a cluster — the
    * pairwise cosine work is bounded by cluster size instead of corpus
    * size. Candidate set plants a same-direction scaled copy of every
    * vector (cosine ≈ 1) so the dedup has real semantic duplicates to
    * kill, mirroring l1/l9's planted-duplicate convention.
    *
    * Scale (100 TB): the centroid table is tiny and broadcast (here the
    * first 32 vectors stand in for one k-means round — in production K
    * grows ∝ N so per-cluster membership stays bounded, which is the
    * SemDeDup contract; K also sets the pair-join parallelism, so it is
    * sized well above the core count at scale); assignment is a map-only
    * broadcast loop, and the
    * only shuffle is the equi-join on `cluster_id`, never all-pairs.
    * Scoring is the fused codegen [[graft.functions.CosineSimilarityExpr]]
    * on both the assign and the pair legs.
    * Ref behavior anchor: the reference dedups scraped pages by exact id
    * before download (/root/reference/src/01-scrape-images.py:214); this
    * is the embedding-space analogue required by the charter's
    * training-data-pipeline mandate. */
  def l54Semdedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = embeddings(spark, dir)
    val cands = emb.select($"vec_id", $"embedding")
      .unionByName(emb.select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x * lit(2.0f)).as("embedding")))
    // K grows with corpus size so per-cluster membership (and with it the
    // within-cluster pair volume) stays BOUNDED — the SemDeDup scale
    // contract made executable instead of narrated. n/156 keeps K = 32 at
    // both oracle-checked fixture scales; at 100 TB it puts K in the
    // hundreds of thousands, i.e. clusters of ~300 regardless of N. The
    // count is a metadata-cheap single agg on the (already tiny) vec table.
    val k = math.max(32L, emb.count() / 156L)
    val cents = emb.filter($"vec_id" < k)
      .select($"vec_id".as("cent_id"), $"embedding".as("cent_emb"))
    l54SemdedupCore(spark, cands, cents)
  }

  /** The nearest-centroid assignment stage on its own (pre-checkpoint), so
    * PlanShapeSpec can assert its broadcast shape — the checkpoint in
    * [[l54SemdedupCore]] truncates lineage and hides it from the final
    * plan. Ties in the argmax break to the lower cent_id (explicit ORDER
    * BY, same on the DuckDB side). */
  private[graft] def l54Assign(
      spark: SparkSession, cands: DataFrame, cents: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.functions.CosineSimilarityExpr.cosineNative
    cands.join(broadcast(cents))
      .withColumn("sim", cosineNative(spark, $"embedding", $"cent_emb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cent_id".asc)))
      .filter($"rn" === 1)
      .select($"vec_id", $"cent_id".as("cluster_id"), $"embedding")
  }

  /** Core split out so PipelineOpsSpec can plant known duplicates.
    * `cands`: (vec_id, embedding); `cents`: (cent_id, cent_emb). Returns
    * the KEPT rows (vec_id, cluster_id): a row is dropped iff some
    * same-cluster row with a smaller vec_id scores cosine > 0.99
    * against it. */
  private[graft] def l54SemdedupCore(
      spark: SparkSession, cands: DataFrame, cents: DataFrame): DataFrame = {
    import spark.implicits._
    import graft.functions.CosineSimilarityExpr.cosineNative
    // consumed by BOTH pair-join legs and the anti-join probe: pin the
    // (id, cluster, vector)-sized assignment once instead of re-running
    // the broadcast×window assignment three times
    val assigned = l54Assign(spark, cands, cents).localCheckpoint(true)
    val dominated = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(cosineNative(spark, col("a.embedding"), col("b.embedding")) > 0.99)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.join(dominated, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cluster_id".cast("long").as("cluster_id"))
  }

  /** L55: distribution-matching rejection resampling — downsample each
    * language to a uniform target share with a DETERMINISTIC per-row
    * accept test (Knuth multiplicative hash of doc_id mod 1e6 against a
    * per-group acceptance rate in ppm), the standard trick for rebalancing
    * a web-scale corpus without a global sort or RNG state.
    *
    * Scale (100 TB): one partial-agg pass builds the per-lang count table
    * (≤ |langs| rows), the rate calc rides a window over that tiny table,
    * and the rate joins back via broadcast — the corpus itself is touched
    * by exactly one map-side filter. Acceptance is reproducible row-local
    * arithmetic, so retries/backfills accept the same rows (same property
    * the idempotent sinks rely on). All-integer ppm math hash-matches the
    * oracle exactly. */
  def l55RejectionResample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir)
    val rates = d.groupBy($"lang").agg(count(lit(1)).as("group_n"))
      .withColumn("total", sum($"group_n").over(Window.partitionBy()))
      .withColumn("n_groups", count(lit(1)).over(Window.partitionBy()))
      .select($"lang",
        least(lit(1000000L), expr("total * 1000000 div (n_groups * group_n)"))
          .as("accept_ppm"))
    // (doc_id % 1e6) first: congruent to (doc_id * 2654435761) % 1e6 for
    // every id, but the product stays <= ~4.4e11 — no Long overflow at any
    // corpus size (the naive product wraps negative past doc_id ~3.5e9,
    // which would silently accept every row; DuckDB errors instead)
    d.join(broadcast(rates), Seq("lang"))
      .filter((($"doc_id" % 1000000L) * lit(435761L)) % 1000000L < $"accept_ppm")
      .select($"doc_id", $"lang", $"accept_ppm")
  }

  /** L56: cross-snapshot n-gram novelty scoring — for each candidate
    * document (odd doc_id), the fraction of its distinct 5-gram shingles
    * NOT present anywhere in the reference snapshot (even doc_id), in
    * exact ppm. The dual of l15's contamination check: l15 flags overlap
    * with a benchmark set, this scores how much NEW text a crawl snapshot
    * contributes — the curation signal for incremental corpus growth.
    *
    * Scale (100 TB): shingling is the O(tokens) [[Text.shingles]] slice
    * zip; the ref side is distinct-ed before the join so the shuffle keys
    * are unique shingles, and the novelty test is one shuffled left join
    * on the shingle key + a per-doc partial agg — never doc×doc. */
  def l56NoveltyScoring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir)
    l56NoveltyCore(
      d.filter($"doc_id" % 2 === 0).select($"doc_id", $"text"),
      d.filter($"doc_id" % 2 =!= 0).select($"doc_id", $"text"))
  }

  /** Novelty core over (doc_id, text) snapshots, split out so
    * PipelineOpsSpec can plant all-seen and all-novel candidates. */
  private[graft] def l56NoveltyCore(ref: DataFrame, cand: DataFrame): DataFrame = {
    import ref.sparkSession.implicits._
    val refShingles = ref
      .select(explode(Text.shingles($"text", 5)).as("shingle")).distinct()
      .withColumn("seen", lit(1))
    cand.select($"doc_id", explode(Text.shingles($"text", 5)).as("shingle"))
      .distinct()
      .join(refShingles, Seq("shingle"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("total_grams"),
        sum(when($"seen".isNull, 1L).otherwise(0L)).as("novel_grams"))
      .withColumn("novelty_ppm", expr("novel_grams * 1000000 div total_grams"))
  }

  /** L57: C4-style corpus-global line dedup (Raffel et al. 2020, §2.2 of
    * the C4 paper: "we discarded all but one of any three-sentence span
    * occurring more than once" — here at single-line granularity): every
    * line keeps only its FIRST occurrence corpus-wide (min (doc_id, idx)),
    * and documents are reassembled from their surviving lines in order.
    * Planted full-text copies (doc_id + 1e6) lose every line and vanish,
    * mirroring the l1 convention. Lines are the same synthesized
    * sentence split l45 uses (the fixture text has no natural newlines).
    *
    * Scale (100 TB): one shuffle PARTITIONED on the line's md5 elects the
    * first occurrence (the 128-bit key makes exchange hashing and the
    * window's sort comparisons fixed-width instead of arbitrary-length
    * text comparisons; the line text itself still rides both exchanges —
    * it must, since survivors are reassembled); reassembly is a second
    * shuffle on doc_id + an ordered collect, the a7/l45
    * deterministic-collect pattern. No all-pairs, no driver state. */
  def l57LineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, dir).select($"doc_id", $"text")
    l57LineDedupCore(d.unionByName(
      d.select(($"doc_id" + 1000000L).as("doc_id"), $"text")))
  }

  /** Line-dedup core over (doc_id, text), split out so PipelineOpsSpec
    * can plant shared and fully-duplicated documents. */
  private[graft] def l57LineDedupCore(cand: DataFrame): DataFrame = {
    import cand.sparkSession.implicits._
    val sents = cand
      .select($"doc_id",
        regexp_replace($"text", "(\\w+ \\w+ \\w+ \\w+ \\w+) ", "$1. ").as("t2"))
      .select($"doc_id", posexplode(split($"t2", "(?<=\\.) ")))
      .select($"doc_id", ($"pos" + 1).cast("long").as("sidx"), $"col".as("sent"))
    val first = sents
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5($"sent")).orderBy($"doc_id", $"sidx")))
      .filter($"rn" === 1)
    first.groupBy($"doc_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct($"sidx", $"sent"))),
          x => x.getField("sent")), " ").as("kept_text"),
        count(lit(1)).as("n_kept"))
  }

  /** L58: quality-signal ensemble with per-source rank calibration — the
    * score-fusion step of a multi-classifier curation pipeline: raw
    * signals (token count, distinct-token count, char length) are
    * incomparable across sources, so each is converted to a within-source
    * rank (row_number, doc_id tie-break → deterministic), summed into an
    * ensemble score, and the best half of each source is kept. Rank-based
    * per-domain calibration is how mixed-quality web corpora fuse
    * classifier outputs without cross-domain score drift.
    *
    * Scale (100 TB): three window ranks + the final keep share ONE
    * exchange on `source`; all-integer arithmetic hash-matches exactly.
    * (Production variant: percentile-bucket ranks via approx quantiles to
    * avoid a per-source total sort; at fixture scale the exact rank is
    * the oracle-checkable formulation.) */
  def l58QualityEnsemble(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = split($"text", " ")
    val sig = documents(spark, dir).select($"doc_id", $"source",
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_uniq"),
      length($"text").cast("long").as("n_chars_actual"))
    def rk(c: Column) = row_number().over(
      Window.partitionBy($"source").orderBy(c.desc, $"doc_id".asc)).cast("long")
    val scored = sig
      .withColumn("score", rk($"n_tokens") + rk($"n_uniq") + rk($"n_chars_actual"))
    scored
      .withColumn("pick", row_number().over(
        Window.partitionBy($"source").orderBy($"score".asc, $"doc_id".asc)))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("half", expr("n_src div 2"))
      .filter($"pick" <= $"half")
      .select($"doc_id", $"source", $"score")
  }

  /** L59: DSIR-style hashed-feature importance scoring (Xie et al. 2023,
    * arXiv:2302.03169 "Data Selection for Language Models via Importance
    * Resampling", shape only): score every document by how target-like its
    * hashed token features are. Tokens hash into 64 feature buckets (the
    * l33 cross-engine md5 bucket); the target domain (lang = 'en') and the
    * full pool each get per-bucket rates in exact ppm; a document's
    * importance is the sum over its tokens of (target_ppm − pool_ppm) —
    * the integer-exact analogue of DSIR's log-likelihood-ratio sum (no
    * `ln`, so the score hash-matches the oracle bit-for-bit; ordering is
    * monotone in the same direction for near-1 ratios).
    *
    * Scale (100 TB): the token stream partial-aggs into a 64-row rate
    * table (map-side combine does almost all the work), rates broadcast
    * back onto the token stream, and the per-doc score is one doc_id
    * exchange — two corpus-sized shuffles total, no doc×doc work. */
  def l59ImportanceScoring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("token"))
      .withColumn("feat", Text.md5Bucket($"token", 64))
    val rates = toks.groupBy($"feat")
      .agg(sum(when($"lang" === "en", 1L).otherwise(0L)).as("t_n"),
        count(lit(1)).as("p_n"))
      .withColumn("t_tot", sum($"t_n").over(Window.partitionBy()))
      .withColumn("p_tot", sum($"p_n").over(Window.partitionBy()))
      .select($"feat",
        expr("t_n * 1000000 div t_tot").as("t_ppm"),
        expr("p_n * 1000000 div p_tot").as("p_ppm"))
    toks.join(broadcast(rates), Seq("feat"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum($"t_ppm" - $"p_ppm").as("importance"))
  }

  /** L60: record linkage via dictionary-level fuzzy matching — the
    * near-duplicate-KEY problem (merging "acme corp" / "acme corp.") that
    * precedes any keyed join over scraped metadata. The join key column is
    * first collapsed to its distinct-value dictionary (64 names here; key
    * cardinality ≪ row count is the defining property of the problem),
    * then the dictionary fuzzy-matches AGAINST ITSELF under a blocking
    * scheme — same first token, length within ±2 — and only blocked
    * candidates pay the Levenshtein comparison (codegen'd builtin; the
    * bounded 3-arg form runs the banded DP in O(radius·len), same classic
    * distance both engines). Blocking intentionally trades cross-block
    * recall for the candidate bound, as in standard record linkage —
    * a first-token edit crosses blocks and is out of scope by design.
    * Matched pairs carry
    * both sides' row counts so downstream canonicalization (l49 pattern)
    * knows the merge weight. Threshold 4: the fixture's two-word names
    * draw their second word from a small vocab whose closest distinct
    * pairs sit at distance 3-4, so ≤4 is the smallest radius that links
    * same-block name variants here (≤2 matches nothing at any SF).
    *
    * Scale (100 TB): the corpus-sized work is ONE partial-agg to the key
    * dictionary (map-side combine collapses to |keys| rows); blocking
    * bounds the candidate set to Σ_block n_b² over dictionary rows, not
    * data rows, and the edit distance never touches the corpus. At 2 000
    * parts the dictionary is 64 rows / 8 blocks — broadcast trivially;
    * with a 10⁸-key dictionary the same plan shuffles on the block key. */
  def l60FuzzyBlockedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = part(spark, dir)
      .groupBy($"p_name").agg(count(lit(1)).as("n_rows"))
      .select($"p_name", $"n_rows",
        split($"p_name", " ")(0).as("w1"), length($"p_name").as("ln"))
    val a = names.select($"p_name".as("name_a"), $"n_rows".as("rows_a"),
      $"w1", $"ln".as("ln_a"))
    val b = names.select($"p_name".as("name_b"), $"n_rows".as("rows_b"),
      $"w1", $"ln".as("ln_b"))
    // bounded variant: levenshtein(a, b, k) runs the banded DP — O(k·len)
    // per pair instead of O(len²) — and returns -1 past the bound, which
    // the radius filter drops; within the bound the distance is exact, so
    // the result matches the unbounded oracle
    a.join(b, "w1")
      .filter($"name_a" < $"name_b" && abs($"ln_a" - $"ln_b") <= 2)
      .withColumn("lev", levenshtein($"name_a", $"name_b", 4).cast("long"))
      .filter($"lev" >= 0 && $"lev" <= 4)
      .select($"name_a", $"name_b", $"lev", $"rows_a", $"rows_b")
  }

  /** L61: cross-source contamination matrix — for every pair of corpus
    * sources, how many distinct word 3-grams they share. The audit that
    * tells a training-data pipeline which scrapes overlap (mirror sites,
    * syndicated content, re-crawls) BEFORE committing to a mixture plan;
    * the per-pair counts feed the same dedup-priority decisions l20/l38
    * execute.
    *
    * Scale (100 TB): never a gram×gram or doc×doc join — the corpus
    * reduces to distinct (source, gram) pairs (partial-agg), then ONE
    * exchange on gram groups each gram's source set (bounded by |sources|,
    * 20 here), and pairs are expanded per-gram with an index-aware HOF
    * (i<j, so each unordered pair once) before a final |sources|²-keyed
    * count. A hot gram shared by all sources costs |sources|²/2 rows, not
    * n_docs². */
  def l61CrossSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // no pre-distinct: collect_set dedups sources map-side inside the ONE
    // gram-keyed exchange — a prior (source, gram) distinct would just add
    // a second corpus-sized shuffle for work the set-agg partials do free
    val perGram = documents(spark, dir)
      .select($"source", explode(Text.shingles($"text", 3)).as("gram"))
      .groupBy($"gram")
      .agg(sort_array(collect_set($"source")).as("srcs"))
      .filter(size($"srcs") >= 2)
    perGram
      .select(explode(flatten(transform($"srcs", (x, i) =>
        transform(slice($"srcs", i + lit(2), size($"srcs")),
          y => struct(x.as("src_a"), y.as("src_b")))))).as("p"))
      .groupBy($"p.src_a".as("src_a"), $"p.src_b".as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** L62: tokenizer fertility by language — encode the corpus with the
    * l41-learned BPE merges and report pieces-per-word per language, the
    * standard metric for how well a tokenizer serves each slice of a
    * multilingual corpus (fertility ≫ 1 for a language means its text
    * costs proportionally more context window). Reuses the 4-round global
    * BPE (l41/l42 chain) so the three queries agree on one tokenizer;
    * fertility is reported in exact integer ppm (pieces·10⁶ div words) so
    * the hash compare is bit-exact.
    *
    * Scale (100 TB): token stream partial-aggs to (lang, word) freqs —
    * vocabulary-sized, not corpus-sized; the global learn runs on the
    * word dictionary (l41's contract); encodings join back word-to-word
    * (dictionary×dictionary, broadcastable) and the final agg is |langs|
    * rows. No per-document BPE execution anywhere. */
  def l62TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byLang = documents(spark, dir)
      .select($"lang", explode(Text.tokens($"text")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"lang", $"word").agg(count(lit(1)).as("cnt"))
    val globalWf = byLang.groupBy($"word").agg(sum($"cnt").as("cnt"))
    val encoded = bpeEncoded(globalWf, 4)
      .select($"word", size(split($"sym", "\\|")).cast("long").as("n_pieces"))
    // ppm via quotient decomposition, not `pieces * 1e6 div words`: the
    // direct form overflows Long once a language holds > 9.2e12 pieces
    // (DuckDB's sum widens to HUGEINT and would diverge instead of
    // failing). q*1e6 + (r*1e6 div words) is algebraically identical
    // (pieces = q*words + r, r < words) and every intermediate stays
    // below words*1e6 — exact until a single language exceeds 9.2e12
    // WORDS (~50 TB of text in one language), with the sums themselves
    // good to 9.2e18.
    byLang.join(encoded, Seq("word"))
      .groupBy($"lang")
      .agg(sum($"cnt").as("n_words"),
        sum($"cnt" * $"n_pieces").as("total_pieces"),
        expr("""sum(cnt * n_pieces) div sum(cnt) * 1000000
              + sum(cnt * n_pieces) % sum(cnt) * 1000000 div sum(cnt)""")
          .as("fertility_ppm"))
  }

  /** L63: LSH calibration curve — the measured s-curve behind the banded
    * MinHash dedup (l2): for each exact-Jaccard decile over the probe
    * subset's candidate pairs, how many pairs the 2-band×3-row scheme
    * actually detects. This is the audit a pipeline runs BEFORE trusting
    * banding parameters at corpus scale: detection should be ~0 in low
    * bins (few false candidates) and ~1 in high bins (few misses), and
    * the transition bin locates the scheme's effective threshold. Both
    * legs share one shingle DERIVATION (the same probe-bounded
    * scan→shingle→distinct code path feeds the exact equi-join, l8's
    * shape, and the banded join, l2 itself), fused by a left join on the
    * pair key into decile counts. Physically the derivation is
    * recomputed per leg, and that is a MEASURED choice, not an
    * oversight: persisting the distinct shingle frame (tried in r11)
    * moved steady-state cost from 1.11 s to 1.94 s at sf0.1 — the
    * columnar-cache scan loses the WholeStageCodegen fusion with the
    * parquet scan, and the materialization barrier serializes the two
    * legs — and at 100 TB pinning a corpus-derived frame in executor
    * storage memory is the wrong default besides. Cheap fused map work
    * re-derived per consumer beats cached state here.
    *
    * Scale (100 TB): calibration runs on the SAME bounded proportional
    * probe subset (id % 5) the banded path uses — it is a quality audit,
    * not a corpus pass; pair volume is bounded by shared-shingle
    * candidates within the probe, and the result is ≤11 rows. */
  def l63LshCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shd = nearDupCandidates(spark, dir)
      .filter($"id" % 5 === 0)
      .select($"id", explode(Text.shingles($"text", 3)).as("shingle"))
      .distinct()
    val sizes = shd.groupBy($"id").agg(count(lit(1)).as("n_sh"))
    val exact = shd.join(shd.select($"id".as("b_id"), $"shingle"), Seq("shingle"))
      .filter($"id" < $"b_id")
      .groupBy($"id".as("a_id"), $"b_id").agg(count(lit(1)).as("n_common"))
      .join(sizes.select($"id".as("a_id"), $"n_sh".as("sa")), Seq("a_id"))
      .join(sizes.select($"id".as("b_id"), $"n_sh".as("sb")), Seq("b_id"))
      .withColumn("j_pct", expr("n_common * 100 div (sa + sb - n_common)"))
    val banded = bandedPairsFromShingles(shd)
      .select($"a_id", $"b_id", lit(1L).as("hit"))
    exact.join(banded, Seq("a_id", "b_id"), "left")
      .groupBy(expr("j_pct div 10").as("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce($"hit", lit(0L))).as("n_detected"))
  }

  /** L64: dedup survivorship report — the pre-flight audit answering "how
    * much will dedup shrink each source?" before the expensive pass runs:
    * per source, candidate volume, exact-unique volume (distinct content
    * digest, l1's key), and banded near-dup pair count on the probe
    * subset (l2's pairs, attributed to the pair's lower id). Sources with
    * high dup ratios get dedup priority; the same numbers sanity-check a
    * finished dedup run (survivors must equal n_unique for exact).
    *
    * Scale (100 TB): two partial-agg passes over the candidate set (count
    * + distinct-digest count share one source-keyed agg) plus the l2
    * banded join, which is already probe-bounded; the report is |sources|
    * rows. */
  def l64DedupSurvivorship(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cand = dupCandidates(spark, dir)
    val per = cand.groupBy($"source").agg(count(lit(1)).as("n_docs"),
      countDistinct(md5($"text".cast("binary"))).as("n_unique"))
    // r20: fused signature path, pairs byte-identical to l2's (see l17)
    val np = l2cMinhashNative(spark, dir)
      .join(cand.select($"doc_id".as("a_id"), $"source"), "a_id")
      .groupBy($"source").agg(count(lit(1)).as("n_near_pairs"))
    per.join(np, Seq("source"), "left")
      .select($"source", $"n_docs", $"n_unique",
        coalesce($"n_near_pairs", lit(0L)).as("n_near_pairs"))
  }

  /** L65: content-defined chunking — split every document at CONTENT-
    * derived boundaries (tokens whose md5 bucket ≡ 0 mod 8, ~1-in-8) and
    * fingerprint each chunk, the storage-dedup technique that makes chunk
    * hashes survive INSERTIONS AND SHIFTS: the probe corpus pairs every
    * doc with its first-word-dropped twin (the l2 candidate set), and
    * because boundaries depend on content rather than position, the twin
    * reproduces most chunk hashes verbatim where fixed-size windows would
    * lose alignment after the shift and share none (the spec measures
    * both). Output per original doc: distinct chunk count and how many
    * the twin shares.
    *
    * Scale (100 TB): tokenize + boundary-mark is map-only; chunk
    * assembly is one doc-keyed window + agg (the a7 ordered-collect
    * pattern); the twin compare is a digest equi-join. Chunk-level dedup
    * across a corpus (group by chunk hash) rides the same partial-agg
    * shape as l1. */
  def l65CdcChunking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = nearDupCandidates(spark, dir)
      .select($"id", posexplode(Text.tokens($"text")))
      .select($"id", ($"pos" + 1).cast("long").as("pos"), $"col".as("token"))
    val w = Window.partitionBy($"id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = toks
      .withColumn("b",
        when(Text.md5Bucket($"token", 8) === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum($"b").over(w))
      .groupBy($"id", $"chunk_id")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct($"pos", $"token"))),
          x => x.getField("token")), " ").cast("binary")).as("h"))
    val a = chunks.filter($"id" < 1000000L).select($"id", $"h").distinct()
    val b = chunks.filter($"id" >= 1000000L)
      .select(($"id" - 1000000L).as("id"), $"h".as("bh")).distinct()
    a.join(b, a("id") === b("id") && $"h" === $"bh", "left")
      .groupBy(a("id").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"bh".isNotNull, 1L).otherwise(0L)).as("n_shared"))
  }

  /** L66: BM25 ranked retrieval — the saturating upgrade of l25's linear
    * TF-IDF: Okapi BM25 with k1 = 6/5 and b = 3/4, the scorer production
    * search and RAG retrieval actually run (term-frequency saturation so
    * a 100-hit doc doesn't dwarf a 10-hit doc, pivoted length
    * normalization so long docs aren't auto-relevant). Every factor is
    * integer-exact (the l48/l35 discipline): with k1 and b rational, the
    * per-term score multiplies out to
    *   idf_k × (22·ctf·10¹² div (10·ctf·10⁶ + 3·10⁶ + 9·rel_ppm))
    * where ctf = least(tf, 4·10⁵) (the saturating factor is within
    * 1/1800 of its (k1+1) asymptote there, so the clamp is
    * ranking-neutral and keeps the 22·ctf·10¹² numerator ≤ 8.8·10¹⁸ <
    * 2⁶³−1 for ANY tf), rel_ppm = least(dl·10⁶ div max(total_len div N,
    * 1), 10¹⁵) is the pivoted relative length — dividing by the integer
    * average doc length instead of multiplying dl·N removes corpus size
    * from the bound, and the 10¹⁵ saturation (a doc 10⁹× the average
    * length; past it tfpart is already ≤ 0.05% of its asymptote — 0 for
    * tf ≲ 100 — so the clamp can only reorder docs whose scores are
    * noise) keeps the 9·rel_ppm denominator term ≤
    * 9·10¹⁵ even in the degenerate avgdl=1 corpus, where the unclamped
    * term wrapped past dl ≈ 1.02·10¹². The one residual length bound is
    * the dl·10⁶ product inside the clamp: dl ≤ 9.2·10¹² tokens per doc
    * (a single ~36 TB document) — under the engine's pinned ANSI mode
    * that limit ERRORS rather than mis-ranks — and
    * idf_k = (N − df + 1)·1000 div (df + 1) the monotone integer idf
    * surrogate. Floor division agrees between Spark `div` and DuckDB
    * `//` on non-negatives, so the ranking hash-matches where float
    * ln() would flake at the ulp. Remaining int64 headroom: the
    * idf_k·tfpart product caps at ~2.2·10⁹·N, i.e. safe to N ≈ 4·10⁹
    * docs per index — past that, shard the index by corpus partition
    * (the standard practice) or drop the idf scale to ×100.
    *
    * Scale (100 TB): the query set is a bounded broadcast literal; the
    * postings prune to query terms BEFORE any wide agg (broadcast
    * semi-join, l25's shape); df/dl are token- and doc-sized partial
    * aggs; corpus-global N and total_len ride one broadcast 1-row frame
    * (no driver count); the per-query top-5 runs on the native
    * [[graft.plans.TopKPerKey]] operator — bounded k-buffers after one
    * hash exchange, no per-query sort. */
  def l66Bm25Retrieval(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      bm25PerDoc(spark, dir),
      keys = Seq(org.apache.spark.sql.functions.col("query_id")),
      order = Seq(org.apache.spark.sql.functions.col("score").desc,
        org.apache.spark.sql.functions.col("doc_id").asc),
      k = 5)

  /** The (query_id, doc_id, score) BM25 frame behind l66, shared with
    * l67's lexical leg so both queries score identically by
    * construction. */
  /** The fixed retrieval query set shared by l66/l67/l68 and the
    * streaming index (st28) — and mirrored literally in the oracle SQL's
    * VALUES list. */
  private[graft] def retrievalQueryTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "spark window merge"),
      (2L, "vector hash join"),
      (3L, "slow filter scan"))
      .toDF("query_id", "q_text")
      .select($"query_id", explode(split($"q_text", " ")).as("token"))
      .distinct()
  }

  private[graft] def bm25PerDoc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = retrievalQueryTerms(spark)
    val postings = documents(spark, dir)
      .select($"doc_id", explode(Text.tokens($"text")).as("token"))
    val tfc = postings.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val dl = postings.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    // corpus totals as ONE broadcast row derived from dl (already
    // doc-sized), not a second corpus scan
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_len"))
    val hits = tfc.join(broadcast(q.select($"token").distinct()), Seq("token"))
    val dfreq = hits.groupBy($"token").agg(count(lit(1)).as("df"))
    hits
      .join(broadcast(q), Seq("token"))
      .join(broadcast(dfreq), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select($"query_id", $"doc_id", expr(bm25TermScore).as("term_score"))
      .groupBy($"query_id", $"doc_id")
      .agg(sum($"term_score").as("score"))
  }

  /** The integer-rational BM25 per-term score over columns
    * (tf, df, dl, n_docs, total_len) — shared by l66's batch scorer and
    * st28's incremental-index scorer so the two compute identically by
    * construction (and both hash-match the same oracle SQL). */
  private[graft] val bm25TermScore: String =
    """((n_docs - df + 1) * 1000 div (df + 1)) *
      |(22 * least(tf, 400000) * 1000000000000 div
      | (10 * least(tf, 400000) * 1000000 + 3000000 +
      |  9 * least(dl * 1000000 div greatest(total_len div n_docs, 1),
      |            1000000000000000)))""".stripMargin

  /** L67: hybrid retrieval via Reciprocal Rank Fusion — the standard way
    * production RAG stacks combine a lexical ranker (BM25, l66) with a
    * semantic one (embedding cosine, l3) without comparable score scales:
    * each leg contributes 1/(60 + rank) per doc, summed. Ranks are
    * integers and 60 the canonical RRF constant, so the fused score is
    * exactly `10⁶ div (60 + rank)` summed over legs — pure integer
    * arithmetic, hash-exact, no score normalization needed (that
    * scale-freeness is WHY RRF won in practice). Query mapping is
    * explicit: text query q ∈ {1,2,3} pairs with probe embedding
    * vec_id = q; embedding vec_id doubles as doc_id (the fixture's
    * aligned id space — in production the join key is the document key
    * both stores share).
    *
    * Scale (100 TB): each leg caps at top-20 per query BEFORE fusion
    * (bounded TopKPerKey buffers — fusion state is |queries| × 40 rows
    * max, never corpus-sized); the legs reuse l66's pruned-postings and
    * l3's broadcast-probe shapes unchanged; the full-outer fuse join and
    * final top-10 run on per-query-bounded frames. */
  def l67HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wLex = Window.partitionBy($"query_id")
      .orderBy($"score".desc, $"doc_id".asc)
    val lex = graft.plans.TopKPerKey.topKPerKey(
      bm25PerDoc(spark, dir),
      keys = Seq($"query_id"), order = Seq($"score".desc, $"doc_id".asc),
      k = 20)
      .select($"query_id", $"doc_id",
        row_number().over(wLex).cast("long").as("lex_rank"))
    val emb = embeddings(spark, dir)
    val probes = emb.filter($"vec_id".isin(1L, 2L, 3L))
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val semScored = emb.join(broadcast(probes), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("doc_id"),
        Text.cosine($"q_emb", $"embedding").as("cos"))
    val wSem = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"doc_id".asc)
    val sem = graft.plans.TopKPerKey.topKPerKey(
      semScored,
      keys = Seq($"query_id"), order = Seq($"cos".desc, $"doc_id".asc),
      k = 20)
      .select($"query_id", $"doc_id",
        row_number().over(wSem).cast("long").as("sem_rank"))
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .select($"query_id", $"doc_id",
        (coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + sem_rank)"), lit(0L))).as("rrf_ppm"))
    graft.plans.TopKPerKey.topKPerKey(
      fused,
      keys = Seq($"query_id"),
      order = Seq($"rrf_ppm".desc, $"doc_id".asc),
      k = 10)
  }

  /** L68: MMR diversified re-ranking — the last stage of the retrieval
    * stack (l66 BM25 → l67 RRF fusion → THIS): Maximal Marginal
    * Relevance greedily re-picks k=5 of the fused top-10 so results
    * balance relevance against redundancy with what's already picked —
    * the step that stops a RAG context window filling with five copies
    * of the same passage. Score: `7·rrf_ppm·100 − 3·max_sim` (λ = 0.7;
    * the ×100 bridge puts the two integer axes on comparable scale, a
    * fixed calibration documented here, not tuned at runtime).
    * Similarity is the dot product of ×1000-quantized embeddings (l43's
    * hash-proven round↔round parity), so the greedy argmax — where a
    * float ulp could flip a pick and cascade through every later round —
    * is pure int64 arithmetic, hash-exact against an oracle that unrolls
    * the same five greedy stages in SQL.
    *
    * Scale (100 TB): MMR is quadratic ONLY in the candidate list, never
    * the corpus — so the whole greedy runs INSIDE one exchange: each
    * query's ≤10 candidates collapse to a single row (one groupBy), the
    * 10×10 sim matrix and all five argmax rounds are pure array
    * expressions over that row, and the result explodes back out. No
    * per-round jobs, no iterative joins — |queries|-way parallel map
    * work after one corpus-side candidate join. (The first cut unrolled
    * the rounds as DataFrame joins: 108 s at sf0.1 from re-executing the
    * candidate pipeline per reference, still ~5 s checkpointed from
    * ~20 tiny scheduled jobs. This shape measures ~1.5 s — the greedy
    * belongs in a row, not a DAG.) */
  def l68MmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cand = l67HybridRrf(spark, dir) // (query_id, doc_id, rrf_ppm)
    // left join: a candidate without an embedding (possible once the two
    // stores' id spaces drift at scale) keeps a null vector -> sim 0,
    // not a silent drop from the pool. Quantization runs AFTER the join,
    // on the ≤10-per-query survivors — not on the whole embedding corpus
    val perQ = cand
      .join(embeddings(spark, dir).select($"vec_id".as("doc_id"), $"embedding"),
        Seq("doc_id"), "left")
      .groupBy($"query_id")
      .agg(array_sort(collect_list(struct($"doc_id", $"rrf_ppm",
        transform($"embedding",
          v => round(v.cast("double") * 1000).cast("long")).as("qv"))))
        .as("cs"))
      .withColumn("n", size($"cs"))
      // flattened n×n integer sim matrix; entry (i, j) sits at 1-based
      // index i*n+j+1. ≤100 dot products of 64-long vectors per query.
      .withColumn("simf", flatten(transform($"cs", a =>
        transform($"cs", b =>
          when(a.getField("qv").isNull || b.getField("qv").isNull, lit(0L))
            .otherwise(aggregate(
              zip_with(a.getField("qv"), b.getField("qv"), (u, v) => u * v),
              lit(0L), (acc, e) => acc + e))))))
    // One greedy argmax: (score, -doc_id, idx) structs make array_max
    // pick highest score, then lowest doc_id — already-selected indices
    // sink to Long.MinValue so they can never win again
    def pickNext(selCol: Column): Column = {
      val scores = transform(sequence(lit(0), $"n" - 1), i => {
        val c = element_at($"cs", i + 1)
        val pen = when(size(selCol) === 0, lit(0L)).otherwise(
          array_max(transform(selCol, s =>
            element_at($"simf", i * $"n" + s + 1))))
        struct(
          when(array_contains(selCol, i), lit(Long.MinValue))
            .otherwise(c.getField("rrf_ppm") * 700 - pen * 3).as("s"),
          (-c.getField("doc_id")).as("t"),
          i.as("idx"))
      })
      array_max(scores).getField("idx")
    }
    // The five rounds run inside ONE aggregate() accumulator: `acc` is a
    // lambda VARIABLE, so each round's selection is evaluated once per
    // step by the HOF evaluator — unrolling the rounds as withColumns
    // instead made `sel` reference itself ~4 times per step and
    // CollapseProject grew the expression tree 4^k-fold (first cut:
    // 8.5 MiB task binaries, minute-long codegen).
    val selected = perQ.withColumn("sel",
      aggregate(sequence(lit(1), lit(5)), typedlit(Array.empty[Int]),
        (acc, _) =>
          when(size($"cs") > size(acc),
            concat(acc, array(pickNext(acc)))).otherwise(acc)))
    selected.select($"query_id", $"cs", posexplode($"sel"))
      .select($"query_id",
        element_at($"cs", $"col" + 1).getField("doc_id").as("doc_id"),
        ($"pos" + 1).cast("long").as("mmr_rank"))
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_exact_dedup" -> (l1ExactDedup _),
    "l2_minhash_neardup" -> (l2MinhashNearDup _),
    "l2c_minhash_native" -> (l2cMinhashNative _),
    "l2_minhash_lsh_mllib" -> (l2MinhashLshMllib _),
    "l3_cosine_topk" -> (l3CosineTopk _),
    "j8_similarity_topk_join" -> (l3CosineTopkNative _), // SURVEY J8, native scorer
    "l3_cosine_topk_native" -> (l3CosineTopkNative _),
    "l3_ann_lsh" -> (l3AnnLsh _),
    "l3_ivf_topk" -> (l3IvfTopk _),
    "l4_text_metrics" -> (l4TextMetrics _),
    "l4_lang_id" -> (l4LangId _),
    "l6_quality_filter" -> (l6QualityFilter _),
    "l7_simhash" -> (l7Simhash _),
    "l8_ngram_jaccard" -> (l8NgramJaccard _),
    "l9_embedding_neardup" -> (l9EmbeddingNearDup _),
    "l10_token_count" -> (l10TokenCount _),
    "t_typed_dataset" -> (tTypedDataset _),
    "l12_edit_distance" -> (l12EditDistance _),
    "l14_vocab" -> (l14Vocab _),
    "l15_contamination" -> (l15Contamination _),
    "l17_dedup_clusters" -> (l17DedupClusters _),
    "l16_pii_scrub" -> (l16PiiScrub _),
    "l18_repetition" -> (l18Repetition _),
    "l27_char_diversity" -> (l27CharDiversity _),
    "l19_stratified_sample" -> (l19StratifiedSample _),
    "l28_curation_pipeline" -> (l28CurationPipeline _),
    "l20_mixture_plan" -> (l20MixturePlan _),
    "l21_quantize" -> (l21Quantize _),
    "l22_group_topk_sample" -> (l22GroupTopkSample _),
    "l24_simhash_banded_dedup" -> (l24SimhashBandedDedup _),
    "l25_ranked_retrieval" -> (l25RankedRetrieval _),
    "l26_kmeans_clusters" -> (l26KmeansClusters _),
    "f_bits" -> (fBits _),
    "f_bitagg" -> (fBitagg _),
    "l11_rolling_fingerprint" -> (l11RollingFingerprint _),
    "l29_length_histogram" -> (l29LengthHistogram _),
    "l30_vocab_coverage" -> (l30VocabCoverage _),
    "l31_doc_chunking" -> (l31DocChunking _),
    "l32_sequence_packing" -> (l32SequencePacking _),
    "l33_train_split" -> (l33TrainSplit _),
    "l34_unicode_normalize" -> (l34UnicodeNormalize _),
    "l35_bigram_lm_score" -> (l35BigramLmScore _),
    "l36_incremental_neardup" -> (l36IncrementalNeardup _),
    "l37_html_extract" -> (l37HtmlExtract _),
    "l38_mixture_execute" -> (l38MixtureExecute _),
    "l39_span_dedup" -> (l39SpanDedup _),
    "l40_shuffle_shard" -> (l40ShuffleShard _),
    "l41_bpe_merges" -> (l41BpeMerges _),
    "l42_bpe_encode" -> (l42BpeEncode _),
    "l48_tfidf_topterms" -> (l48TfidfTopTerms _),
    "l49_cluster_canonical" -> (l49ClusterCanonical _),
    "l50_temperature_mixture" -> (l50TemperatureMixture _),
    "l51_stopgram_boilerplate" -> (l51StopgramBoilerplate _),
    "l52_perplexity_buckets" -> (l52PerplexityBuckets _),
    "l53_distribution_drift" -> (l53DistributionDrift _),
    "l54_semdedup" -> (l54Semdedup _),
    "l55_rejection_resample" -> (l55RejectionResample _),
    "l56_novelty_scoring" -> (l56NoveltyScoring _),
    "l57_line_dedup" -> (l57LineDedup _),
    "l58_quality_ensemble" -> (l58QualityEnsemble _),
    "l59_importance_scoring" -> (l59ImportanceScoring _),
    "l60_fuzzy_blocked_join" -> (l60FuzzyBlockedJoin _),
    "l61_cross_source_overlap" -> (l61CrossSourceOverlap _),
    "l62_tokenizer_fertility" -> (l62TokenizerFertility _),
    "l63_lsh_calibration" -> (l63LshCalibration _),
    "l64_dedup_survivorship" -> (l64DedupSurvivorship _),
    "l65_cdc_chunking" -> (l65CdcChunking _),
    "l66_bm25_retrieval" -> (l66Bm25Retrieval _),
    "l67_hybrid_rrf" -> (l67HybridRrf _),
    "l68_mmr_rerank" -> (l68MmrRerank _),
    "l43_label_centroids" -> (l43LabelCentroids _),
    "l44_kmv_overlap" -> (l44KmvOverlap _),
    "l45_sentence_chunk" -> (l45SentenceChunk _),
    "l46_prefix_filter_join" -> (l46PrefixFilterJoin _),
    "l47_pq_quantize" -> (l47PqQuantize _)
  )

  private val candSql =
    """cand AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1) FROM documents)""".stripMargin

  private val shingleSql = (filterMod: Int) =>
    s"""sh AS (
       |  SELECT id, unnest(list_transform(
       |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
       |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS shingle
       |  FROM cand WHERE id % $filterMod = 0)""".stripMargin

  // shared by l8 and l46: the prefix filter changes the JOIN STRATEGY,
  // never the result, so both hash-match the same direct-join oracle
  private lazy val l8JaccardOracle =
    s"WITH $candSql,\n${shingleSql(10)},\n" +
      """shd AS (SELECT DISTINCT id, shingle FROM sh),
        |sizes AS (SELECT id, count(*) AS n_sh FROM shd GROUP BY id),
        |inter AS (
        |  SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
        |  FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT a_id, b_id,
        |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.id = a_id
        |JOIN sizes sb ON sb.id = b_id
        |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5""".stripMargin

  private val simhashSums = (1 to 16).map(i =>
    s"CAST(sum(CASE WHEN substr(md5(token), $i, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS BIGINT) AS s$i")
    .mkString(",\n")
  private val simhashFp = (1 to 16).map(i =>
    s"(CASE WHEN s$i > 0 THEN ${1L << (i - 1)} ELSE 0 END)").mkString(" + ")

  /** The banded-minhash pair query (l2's oracle body) — also embedded as a
    * subquery by the l17 clustering oracle. */
  private val l2PairsSql: String =
    s"WITH $candSql,\n${shingleSql(5)},\n" +
      """mh AS (SELECT id,
        |  min(substr(md5(shingle), 1, 5)) AS h1, min(substr(md5(shingle), 6, 5)) AS h2,
        |  min(substr(md5(shingle), 11, 5)) AS h3, min(substr(md5(shingle), 16, 5)) AS h4,
        |  min(substr(md5(shingle), 21, 5)) AS h5, min(substr(md5(shingle), 26, 5)) AS h6
        |  FROM sh GROUP BY id),
        |bands AS (
        |  SELECT id, md5(h1 || '|' || h2 || '|' || h3) AS band, 1 AS bi FROM mh
        |  UNION ALL
        |  SELECT id, md5(h4 || '|' || h5 || '|' || h6), 2 FROM mh)
        |SELECT a.id AS a_id, b.id AS b_id, count(*) AS shared_bands
        |FROM bands a JOIN bands b ON a.band = b.band AND a.bi = b.bi AND a.id < b.id
        |GROUP BY a.id, b.id""".stripMargin

  /** The 4-round BPE learn, unrolled: each round recounts pairs over the
    * current symbol table, keeps the (weight DESC, lhs, rhs) top-1, and
    * applies it with the same non-overlapping replace Spark uses. The
    * chain is shared by l41 (reads the merge CTEs) and l42 (reads the
    * final encoded vocab s4). */
  private val bpeOracleChain: String = {
    val s0 =
      """s0 AS (
        |  SELECT word, count(*) AS cnt,
        |    array_to_string(string_split(word, ''), '|') AS sym
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE len(word) >= 2 GROUP BY word)""".stripMargin
    val rounds = (1 to 4).map { i =>
      s"""p$i AS (
         |  SELECT q.cnt,
         |    unnest(list_transform(generate_series(1, len(q.t) - 1), k -> q.t[k])) AS lhs,
         |    unnest(list_transform(generate_series(1, len(q.t) - 1), k -> q.t[k+1])) AS rhs
         |  FROM (SELECT cnt, string_split(sym, '|') AS t FROM s${i - 1}) q
         |  WHERE len(q.t) >= 2),
         |t$i AS (
         |  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS weight
         |  FROM p$i GROUP BY lhs, rhs
         |  ORDER BY weight DESC, lhs, rhs LIMIT 1),
         |s$i AS (
         |  SELECT word, cnt,
         |    substr(list_reduce(list_prepend('', string_split(sym, '|')),
         |      (acc, x) -> CASE WHEN ends_with(acc, '|' || lhs) AND x = rhs
         |                  THEN acc || x ELSE acc || '|' || x END), 2) AS sym
         |  FROM s${i - 1}, t$i)""".stripMargin
    }
    s"WITH $s0,\n${rounds.mkString(",\n")}"
  }

  /** Min-reachable-label clustering oracle over the banded-minhash pair
    * graph — shared by l17 (label propagation) and g8 (star contraction),
    * which compute the same answer by different strategies. */
  private lazy val l17ClusterSql: String =
    "WITH RECURSIVE pairs AS (SELECT a_id, b_id FROM (\n" + l2PairsSql + "\n) lp),\n" +
      """edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT src AS id, src AS label FROM edges
        |  UNION
        |  SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst)
        |SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin

  private val l41OracleSql: String = {
    val finals = (1 to 4).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, lhs, rhs, lhs || rhs AS merged, weight FROM t$i")
    s"$bpeOracleChain\n${finals.mkString("\nUNION ALL\n")}"
  }

  private val l42OracleSql: String =
    s"""$bpeOracleChain
       |SELECT CAST(sum(cnt * len(word)) AS BIGINT) AS total_chars,
       |  CAST(sum(cnt * len(string_split(sym, '|'))) AS BIGINT) AS total_tokens,
       |  count(*) AS n_words
       |FROM s4""".stripMargin

  /** Per-language fertility over the shared 4-round BPE chain: the word
    * dictionary s4 (word → encoded sym) joins back to per-(lang, word)
    * frequencies; fertility is exact integer ppm so the hash compare is
    * bit-for-bit. */
  private lazy val l62OracleSql: String =
    s"""$bpeOracleChain,
       |wl AS (
       |  SELECT lang, word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  WHERE len(word) >= 2 GROUP BY lang, word)
       |SELECT lang,
       |  CAST(sum(wl.cnt) AS BIGINT) AS n_words,
       |  CAST(sum(wl.cnt * len(string_split(s4.sym, '|'))) AS BIGINT)
       |    AS total_pieces,
       |  CAST(sum(wl.cnt * len(string_split(s4.sym, '|'))) * 1000000
       |    // sum(wl.cnt) AS BIGINT) AS fertility_ppm
       |FROM wl JOIN s4 ON wl.word = s4.word
       |GROUP BY lang""".stripMargin

  /** Calibration decile counts: exact-Jaccard pairs (l8's shingle join at
    * filterMod 5, the l2 probe subset) left-joined to the banded pair set
    * (l2PairsSql embedded as a derived table, the l17 trick). */
  private lazy val l63OracleSql: String =
    s"WITH $candSql,\n${shingleSql(5)},\n" +
      """shd AS (SELECT DISTINCT id, shingle FROM sh),
        |sizes AS (SELECT id, count(*) AS n_sh FROM shd GROUP BY id),
        |ex AS (
        |  SELECT a_id, b_id,
        |    n_common * 100 // (sa.n_sh + sb.n_sh - n_common) AS j_pct
        |  FROM (
        |    SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
        |    FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.id < b.id
        |    GROUP BY a.id, b.id)
        |  JOIN sizes sa ON sa.id = a_id
        |  JOIN sizes sb ON sb.id = b_id),
        |banded AS (SELECT a_id, b_id FROM (
        |""".stripMargin + l2PairsSql + """
        |) bp)
        |SELECT j_pct // 10 AS bin, count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN banded.a_id IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_detected
        |FROM ex LEFT JOIN banded USING (a_id, b_id)
        |GROUP BY 1""".stripMargin

  /** The shared WITH-chain behind l67/l68: BM25 leg (l66's arithmetic),
    * cosine leg (l3's shape), RRF fusion — ends at the `fused`
    * (query_id, doc_id, rrf_ppm) relation. */
  private lazy val rrfCtes: String =
    """postings AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tfc AS (
      |  SELECT doc_id, token, count(*) AS tf FROM postings GROUP BY 1, 2),
      |dlen AS (SELECT doc_id, count(*) AS dl FROM postings GROUP BY 1),
      |tot AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
      |        FROM dlen),
      |q(query_id, token) AS (VALUES
      |  (1, 'spark'), (1, 'window'), (1, 'merge'),
      |  (2, 'vector'), (2, 'hash'), (2, 'join'),
      |  (3, 'slow'), (3, 'filter'), (3, 'scan')),
      |hits AS (
      |  SELECT tfc.* FROM tfc
      |  WHERE token IN (SELECT DISTINCT token FROM q)),
      |dfreq AS (SELECT token, count(*) AS df FROM hits GROUP BY 1),
      |bm AS (
      |  SELECT q.query_id, hits.doc_id,
      |    CAST(sum(
      |      ((tot.n_docs - dfreq.df + 1) * 1000 // (dfreq.df + 1)) *
      |      (22 * least(hits.tf, 400000) * 1000000000000 //
      |       (10 * least(hits.tf, 400000) * 1000000 + 3000000 +
      |        9 * least(dlen.dl * 1000000 //
      |                  greatest(tot.total_len // tot.n_docs, 1),
      |                  1000000000000000))))
      |      AS BIGINT) AS score
      |  FROM hits JOIN q USING (token) JOIN dfreq USING (token)
      |    JOIN dlen USING (doc_id) CROSS JOIN tot
      |  GROUP BY 1, 2),
      |lex AS (
      |  SELECT query_id, doc_id, CAST(rn AS BIGINT) AS lex_rank FROM (
      |    SELECT query_id, doc_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY score DESC, doc_id) AS rn
      |    FROM bm) WHERE rn <= 20),
      |probes AS (
      |  SELECT vec_id AS query_id, embedding FROM embeddings
      |  WHERE vec_id IN (1, 2, 3)),
      |cosed AS (
      |  SELECT p.query_id, c.vec_id AS doc_id,
      |    list_dot_product(CAST(p.embedding AS DOUBLE[]),
      |                     CAST(c.embedding AS DOUBLE[])) /
      |    (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]),
      |                           CAST(p.embedding AS DOUBLE[]))) *
      |     sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
      |                           CAST(c.embedding AS DOUBLE[])))) AS cos
      |  FROM probes p JOIN embeddings c ON c.vec_id <> p.query_id),
      |sem AS (
      |  SELECT query_id, doc_id, CAST(rn AS BIGINT) AS sem_rank FROM (
      |    SELECT query_id, doc_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, doc_id) AS rn
      |    FROM cosed) WHERE rn <= 20),
      |fused AS (
      |  SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
      |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
      |    coalesce(1000000 // (60 + lex.lex_rank), 0) +
      |    coalesce(1000000 // (60 + sem.sem_rank), 0) AS rrf_ppm
      |  FROM lex FULL OUTER JOIN sem
      |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)""".stripMargin

  private lazy val l67OracleSql: String =
    s"WITH $rrfCtes\n" +
      """SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |  CAST(rrf_ppm AS BIGINT) AS rrf_ppm FROM (
        |  SELECT query_id, doc_id, rrf_ppm,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_ppm DESC, doc_id) AS rn
        |  FROM fused)
        |WHERE rn <= 10""".stripMargin

  /** The MMR greedy unrolled in SQL: five selection stages, each an
    * argmax over the candidates not yet picked with the max-similarity
    * penalty against everything picked so far — the same five rounds the
    * Spark side folds, stage for stage. */
  private lazy val l68OracleSql: String = {
    // sK: the stage-K pick given the union of stages 1..K-1
    def stage(k: Int): String = {
      val prev = (1 until k).map(i => s"s$i").mkString(" UNION ALL SELECT * FROM ")
      s"""s$k AS (
         |  SELECT c.query_id, c.doc_id, c.rrf_ppm, $k AS r FROM (
         |    SELECT c0.query_id, c0.doc_id, c0.rrf_ppm,
         |      row_number() OVER (PARTITION BY c0.query_id
         |        ORDER BY c0.rrf_ppm * 700 - coalesce(p.pen, 0) * 3 DESC,
         |                 c0.doc_id) AS rn
         |    FROM cand c0
         |    LEFT JOIN (
         |      SELECT sims.query_id, sims.da AS doc_id, max(sims.sim) AS pen
         |      FROM sims JOIN (SELECT * FROM $prev) sel
         |        ON sel.query_id = sims.query_id AND sel.doc_id = sims.db
         |      GROUP BY 1, 2) p
         |      ON p.query_id = c0.query_id AND p.doc_id = c0.doc_id
         |    WHERE NOT EXISTS (SELECT 1 FROM (SELECT * FROM $prev) s0
         |      WHERE s0.query_id = c0.query_id AND s0.doc_id = c0.doc_id)
         |  ) c WHERE c.rn = 1)""".stripMargin
    }
    s"WITH $rrfCtes,\n" +
      """cand AS (
        |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
        |    CAST(rrf_ppm AS BIGINT) AS rrf_ppm FROM (
        |    SELECT query_id, doc_id, rrf_ppm,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf_ppm DESC, doc_id) AS rn
        |    FROM fused)
        |  WHERE rn <= 10),
        |qe AS (
        |  SELECT vec_id AS doc_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      v -> round(v * 1000)) AS qv
        |  FROM embeddings),
        |sims AS (
        |  SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
        |    CAST(list_dot_product(qa.qv, qb.qv) AS BIGINT) AS sim
        |  FROM cand a
        |  JOIN cand b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
        |  JOIN qe qa ON qa.doc_id = a.doc_id
        |  JOIN qe qb ON qb.doc_id = b.doc_id),
        |s1 AS (
        |  SELECT query_id, doc_id, rrf_ppm, 1 AS r FROM (
        |    SELECT query_id, doc_id, rrf_ppm,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf_ppm DESC, doc_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |""".stripMargin +
      (2 to 5).map(stage).mkString(",\n") + "\n" +
      """SELECT query_id, doc_id, CAST(r AS BIGINT) AS mmr_rank
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
        |      UNION ALL SELECT * FROM s5)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "l1_exact_dedup" ->
      """SELECT min(id) AS keeper, count(*) AS n_copies FROM (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |GROUP BY md5(text)""".stripMargin,
    "l50_temperature_mixture" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
        |SELECT lang, n_docs,
        |  CAST(n_docs AS DOUBLE) / n_total AS p,
        |  sqrt(CAST(n_docs AS DOUBLE) / n_total) AS w_temp,
        |  sqrt(CAST(n_docs AS DOUBLE) / n_total)
        |    / (CAST(n_docs AS DOUBLE) / n_total) AS upsample_factor
        |FROM c, n""".stripMargin,
    "l51_stopgram_boilerplate" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 1, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+1], ' '))) AS gram
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
        |b AS (SELECT gram
        |      FROM (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1), n
        |      WHERE df * 100 >= n_total * 8)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN gram IN (SELECT gram FROM b) THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_boiler,
        |  CAST(sum(CASE WHEN gram IN (SELECT gram FROM b) THEN 1 ELSE 0 END)
        |       AS DOUBLE) / count(*) AS boiler_ratio
        |FROM g GROUP BY 1""".stripMargin,
    "l52_perplexity_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> {'w1': t[i], 'w2': t[i+1]})) AS z
        |  FROM t),
        |b2 AS (SELECT doc_id, z.w1 AS w1, z.w2 AS w2 FROM bi),
        |uni AS (SELECT w1, count(*) AS uc FROM b2 GROUP BY 1),
        |big AS (SELECT w1, w2, count(*) AS bc FROM b2 GROUP BY 1, 2),
        |sc AS (
        |  SELECT b2.doc_id, bg.bc * 1000000 // un.uc AS s
        |  FROM b2 JOIN big bg USING (w1, w2) JOIN uni un USING (w1)),
        |scores AS (
        |  SELECT doc_id, CAST(sum(s) // count(*) AS BIGINT) AS lm_score
        |  FROM sc GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM scores),
        |hist AS (SELECT lm_score, CAST(count(*) AS BIGINT) AS cnt
        |         FROM scores GROUP BY 1),
        |cum AS (SELECT lm_score,
        |  sum(cnt) OVER (ORDER BY lm_score DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ge
        |  FROM hist),
        |bounds AS (
        |  SELECT max(CASE WHEN ge * 3 >= n_total THEN lm_score END) AS b_head,
        |    max(CASE WHEN ge * 3 >= n_total * 2 THEN lm_score END) AS b_mid
        |  FROM cum, n)
        |SELECT doc_id, lm_score,
        |  CASE WHEN lm_score >= b_head THEN 'head'
        |       WHEN lm_score >= b_mid THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM scores, bounds""".stripMargin,
    "l53_distribution_drift" ->
      """WITH b AS (
        |  SELECT least(n_chars // 200, 9) AS bucket,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
        |  FROM documents),
        |c AS (
        |  SELECT bucket, sum(is_ref) AS ref_n, sum(1 - is_ref) AS cand_n
        |  FROM b GROUP BY bucket)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(ref_n AS BIGINT) AS ref_n,
        |  CAST(cand_n AS BIGINT) AS cand_n,
        |  CAST(ref_n * 1000000 // sum(ref_n) OVER () AS BIGINT) AS ref_ppm,
        |  CAST(cand_n * 1000000 // sum(cand_n) OVER () AS BIGINT) AS cand_ppm,
        |  CAST(abs(ref_n * 1000000 // sum(ref_n) OVER ()
        |    - cand_n * 1000000 // sum(cand_n) OVER ()) AS BIGINT) AS drift_ppm
        |FROM c""".stripMargin,
    "l54_semdedup" ->
      """WITH cand AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)
        |  FROM embeddings),
        |cents AS (
        |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cemb
        |  FROM embeddings
        |  WHERE vec_id < (SELECT greatest(32, count(*) // 156) FROM embeddings)),
        |assigned AS (
        |  SELECT vec_id, cent_id AS cluster_id, emb FROM (
        |    SELECT c.vec_id, k.cent_id, c.emb,
        |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(c.emb, k.cemb) /
        |          (sqrt(list_dot_product(c.emb, c.emb)) *
        |           sqrt(list_dot_product(k.cemb, k.cemb))) DESC,
        |        k.cent_id) AS rn
        |    FROM cand c CROSS JOIN cents k)
        |  WHERE rn = 1),
        |dominated AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assigned a JOIN assigned b
        |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.emb, b.emb) /
        |    (sqrt(list_dot_product(a.emb, a.emb)) *
        |     sqrt(list_dot_product(b.emb, b.emb))) > 0.99)
        |SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id
        |FROM assigned
        |WHERE vec_id NOT IN (SELECT vec_id FROM dominated)""".stripMargin,
    "l55_rejection_resample" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS group_n FROM documents GROUP BY lang),
        |rates AS (
        |  SELECT lang,
        |    least(1000000, (sum(group_n) OVER ()) * 1000000
        |      // ((count(*) OVER ()) * group_n)) AS accept_ppm
        |  FROM counts)
        |SELECT d.doc_id, d.lang, CAST(r.accept_ppm AS BIGINT) AS accept_ppm
        |FROM documents d JOIN rates r USING (lang)
        |WHERE ((d.doc_id % 1000000) * 435761) % 1000000 < r.accept_ppm""".stripMargin,
    "l56_novelty_scoring" ->
      """WITH refs AS (
        |  SELECT DISTINCT unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 4, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+4], ' '))) AS shingle
        |  FROM documents WHERE doc_id % 2 = 0),
        |cs AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, greatest(len(string_split(text,' ')) - 4, 0)),
        |      i -> array_to_string((string_split(text,' '))[i:i+4], ' '))) AS shingle
        |    FROM documents WHERE doc_id % 2 = 1))
        |SELECT doc_id, count(*) AS total_grams,
        |  CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM refs)
        |           THEN 0 ELSE 1 END) AS BIGINT) AS novel_grams,
        |  CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM refs)
        |           THEN 0 ELSE 1 END) * 1000000 // count(*) AS BIGINT) AS novelty_ppm
        |FROM cs GROUP BY doc_id""".stripMargin,
    "l57_line_dedup" ->
      """WITH cand AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |sented AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g') AS t2
        |  FROM cand),
        |sents AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(t2, '\. ', '.' || chr(1), 'g'), chr(1))
        |      AS ss
        |  FROM sented),
        |e AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ss))) AS sidx, ss
        |  FROM sents),
        |x AS (SELECT doc_id, CAST(sidx AS BIGINT) AS sidx, ss[sidx] AS sent FROM e),
        |first AS (
        |  SELECT doc_id, sidx, sent,
        |    row_number() OVER (PARTITION BY sent ORDER BY doc_id, sidx) AS rn
        |  FROM x)
        |SELECT doc_id,
        |  string_agg(sent, ' ' ORDER BY sidx) AS kept_text,
        |  count(*) AS n_kept
        |FROM first WHERE rn = 1 GROUP BY doc_id""".stripMargin,
    "l58_quality_ensemble" ->
      """WITH sig AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |    CAST(length(text) AS BIGINT) AS n_chars_actual
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id)
        |      + row_number() OVER (PARTITION BY source ORDER BY n_uniq DESC, doc_id)
        |      + row_number() OVER (PARTITION BY source ORDER BY n_chars_actual DESC, doc_id)
        |      AS BIGINT) AS score
        |  FROM sig),
        |picked AS (
        |  SELECT doc_id, source, score,
        |    row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS pick,
        |    count(*) OVER (PARTITION BY source) // 2 AS half
        |  FROM scored)
        |SELECT doc_id, source, score FROM picked WHERE pick <= half""".stripMargin,
    "l59_importance_scoring" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(token), 1, 4))::BIGINT % 64 AS feat
        |  FROM toks),
        |rates AS (
        |  SELECT feat,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
        |    count(*) AS p_n
        |  FROM f GROUP BY feat),
        |r2 AS (
        |  SELECT feat,
        |    t_n * 1000000 // (sum(t_n) OVER ()) AS t_ppm,
        |    p_n * 1000000 // (sum(p_n) OVER ()) AS p_ppm
        |  FROM rates)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(t_ppm - p_ppm) AS BIGINT) AS importance
        |FROM f JOIN r2 USING (feat)
        |GROUP BY doc_id""".stripMargin,
    "l60_fuzzy_blocked_join" ->
      """WITH n AS (
        |  SELECT p_name, count(*) AS n_rows,
        |    string_split(p_name, ' ')[1] AS w1, length(p_name) AS ln
        |  FROM part GROUP BY p_name)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
        |  a.n_rows AS rows_a, b.n_rows AS rows_b
        |FROM n a JOIN n b
        |  ON a.w1 = b.w1 AND a.p_name < b.p_name AND abs(a.ln - b.ln) <= 2
        |WHERE levenshtein(a.p_name, b.p_name) <= 4""".stripMargin,
    "l61_cross_source_overlap" ->
      """WITH sh AS (
        |  SELECT source, unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS gram
        |  FROM documents),
        |d AS (SELECT DISTINCT source, gram FROM sh)
        |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |FROM d a JOIN d b ON a.gram = b.gram AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "l62_tokenizer_fertility" -> l62OracleSql,
    "l63_lsh_calibration" -> l63OracleSql,
    "l66_bm25_retrieval" ->
      """WITH postings AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tfc AS (
        |  SELECT doc_id, token, count(*) AS tf FROM postings GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM postings GROUP BY 1),
        |tot AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
        |        FROM dl),
        |q(query_id, token) AS (VALUES
        |  (1, 'spark'), (1, 'window'), (1, 'merge'),
        |  (2, 'vector'), (2, 'hash'), (2, 'join'),
        |  (3, 'slow'), (3, 'filter'), (3, 'scan')),
        |hits AS (
        |  SELECT tfc.* FROM tfc
        |  WHERE token IN (SELECT DISTINCT token FROM q)),
        |dfreq AS (SELECT token, count(*) AS df FROM hits GROUP BY 1),
        |scored AS (
        |  SELECT q.query_id, hits.doc_id,
        |    ((tot.n_docs - dfreq.df + 1) * 1000 // (dfreq.df + 1)) *
        |    (22 * least(hits.tf, 400000) * 1000000000000 //
        |     (10 * least(hits.tf, 400000) * 1000000 + 3000000 +
        |      9 * least(dl.dl * 1000000 //
        |                greatest(tot.total_len // tot.n_docs, 1),
        |                1000000000000000)))
        |      AS term_score
        |  FROM hits JOIN q USING (token) JOIN dfreq USING (token)
        |    JOIN dl USING (doc_id) CROSS JOIN tot),
        |s AS (
        |  SELECT query_id, doc_id, CAST(sum(term_score) AS BIGINT) AS score
        |  FROM scored GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score FROM (
        |  SELECT query_id, doc_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rn
        |  FROM s)
        |WHERE rn <= 5""".stripMargin,
    "l67_hybrid_rrf" -> l67OracleSql,
    "l68_mmr_rerank" -> l68OracleSql,
    "l65_cdc_chunking" ->
      (s"WITH $candSql,\n" +
        """toks AS (
          |  SELECT id,
          |    unnest(generate_series(1, len(string_split(text, ' ')))) AS pos,
          |    unnest(string_split(text, ' ')) AS token
          |  FROM cand),
          |seg AS (
          |  SELECT id, pos, token,
          |    sum(CASE WHEN ('0x' || substr(md5(token), 1, 4))::BIGINT % 8 = 0
          |        THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY id ORDER BY pos) AS chunk_id
          |  FROM toks),
          |ch AS (
          |  SELECT id, chunk_id, md5(string_agg(token, ' ' ORDER BY pos)) AS h
          |  FROM seg GROUP BY id, chunk_id),
          |a AS (SELECT DISTINCT id, h FROM ch WHERE id < 1000000),
          |bb AS (SELECT DISTINCT id - 1000000 AS id, h FROM ch
          |       WHERE id >= 1000000)
          |SELECT a.id AS doc_id, count(*) AS n_chunks,
          |  CAST(sum(CASE WHEN bb.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_shared
          |FROM a LEFT JOIN bb ON a.id = bb.id AND a.h = bb.h
          |GROUP BY a.id""".stripMargin),
    "l64_dedup_survivorship" ->
      (s"""WITH c AS (
         |  SELECT doc_id AS id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text, source FROM documents),
         |per AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
         |  FROM c GROUP BY source),
         |np AS (
         |  SELECT c.source, count(*) AS n_near_pairs
         |  FROM (
         |""".stripMargin + l2PairsSql + """
         |) p JOIN c ON p.a_id = c.id GROUP BY c.source)
         |SELECT source, n_docs, n_unique,
         |  COALESCE(n_near_pairs, CAST(0 AS BIGINT)) AS n_near_pairs
         |FROM per LEFT JOIN np USING (source)""".stripMargin),
    "l2_minhash_neardup" -> l2PairsSql,
    "l2c_minhash_native" -> l2PairsSql,
    "l17_dedup_clusters" -> l17ClusterSql,
    // same graph, same answer, different strategy (star contraction vs
    // label propagation) — shared oracle, the l8/l46 convention
    "g8_connected_components" -> l17ClusterSql,
    "l49_cluster_canonical" ->
      ("WITH RECURSIVE pairs AS (SELECT a_id, b_id FROM (\n" + l2PairsSql + "\n) lp),\n" +
        """edges AS (
          |  SELECT a_id AS src, b_id AS dst FROM pairs
          |  UNION SELECT b_id, a_id FROM pairs),
          |reach AS (
          |  SELECT src AS id, src AS label FROM edges
          |  UNION
          |  SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst),
          |clusters AS (
          |  SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
          |cand AS (
          |  SELECT doc_id AS id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
          |  FROM documents),
          |q AS (
          |  SELECT id,
          |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
          |  FROM cand),
          |scored AS (
          |  SELECT c.cluster_id, c.doc_id, q.n_uniq
          |  FROM clusters c JOIN q ON q.id = c.doc_id)
          |SELECT cluster_id, keeper_id, keeper_uniq, n_members FROM (
          |  SELECT cluster_id, doc_id AS keeper_id, n_uniq AS keeper_uniq,
          |    row_number() OVER (PARTITION BY cluster_id
          |      ORDER BY n_uniq DESC, doc_id) AS rn,
          |    count(*) OVER (PARTITION BY cluster_id) AS n_members
          |  FROM scored)
          |WHERE rn = 1""".stripMargin),
    "j8_similarity_topk_join" ->
      """WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS score
        |  FROM probes p JOIN embeddings c ON c.vec_id <> p.vec_id)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin,
    "l3_cosine_topk_native" ->
      """WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS score
        |  FROM probes p JOIN embeddings c ON c.vec_id <> p.vec_id)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin,
    "l3_cosine_topk" ->
      """WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS score
        |  FROM probes p JOIN embeddings c ON c.vec_id <> p.vec_id)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) WHERE rn <= 5""".stripMargin,
    "l3_ivf_topk" ->
      """WITH cents AS (
        |  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS cent
        |  FROM embeddings WHERE vec_id < 4),
        |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |scored AS (
        |  SELECT v.vec_id, v.emb, c.cent_id,
        |    list_dot_product(v.emb, c.cent) /
        |    (sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(c.cent, c.cent))) AS cscore
        |  FROM vecs v CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, emb, cent_id FROM (
        |    SELECT vec_id, emb, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cscore DESC, cent_id) AS rn
        |    FROM scored) WHERE rn = 1),
        |probes AS (SELECT vec_id AS query_id, emb AS q_emb, cent_id FROM assigned WHERE vec_id < 10),
        |cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    list_dot_product(p.q_emb, a.emb) /
        |    (sqrt(list_dot_product(p.q_emb, p.q_emb)) * sqrt(list_dot_product(a.emb, a.emb))) AS score
        |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id)
        |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM cand) WHERE rn <= 3""".stripMargin,
    "l4_text_metrics" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_actual,
        |CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq,
        |CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) AS uniq_ratio,
        |CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','in','to'))) AS DOUBLE)
        |  / len(string_split(text,' ')) AS stop_ratio
        |FROM documents""".stripMargin,
    "l4_lang_id" ->
      """SELECT doc_id, lang,
        |CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','of','and','a'))) AS BIGINT) AS en_score,
        |CAST(len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und'))) AS BIGINT) AS de_score,
        |CAST(len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y'))) AS BIGINT) AS es_score,
        |CASE WHEN len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und'))) > len(list_filter(string_split(text,' '), t -> t IN ('the','of','and','a')))
        |      AND len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und'))) >= len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y'))) THEN 'de'
        |     WHEN len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y'))) > len(list_filter(string_split(text,' '), t -> t IN ('the','of','and','a')))
        |      AND len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y'))) > len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und'))) THEN 'es'
        |     ELSE 'en' END AS predicted_lang
        |FROM documents""".stripMargin,
    "l6_quality_filter" ->
      """SELECT doc_id,
        |CAST((CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END)
        | + (CASE WHEN len(string_split(text,' ')) >= 10 THEN 1 ELSE 0 END)
        | + (CASE WHEN CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) > 0.2 THEN 1 ELSE 0 END)
        | + (CASE WHEN lang IN ('en','de','es','fr') THEN 1 ELSE 0 END) AS BIGINT) AS q_score
        |FROM documents
        |WHERE (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END)
        | + (CASE WHEN len(string_split(text,' ')) >= 10 THEN 1 ELSE 0 END)
        | + (CASE WHEN CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) / len(string_split(text,' ')) > 0.2 THEN 1 ELSE 0 END)
        | + (CASE WHEN lang IN ('en','de','es','fr') THEN 1 ELSE 0 END) >= 3""".stripMargin,
    "l7_simhash" ->
      (s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
          |sums AS (SELECT doc_id,
          |$simhashSums
          |FROM tok GROUP BY doc_id)
          |SELECT doc_id, CAST($simhashFp AS BIGINT) AS simhash FROM sums""".stripMargin),
    "l8_ngram_jaccard" -> l8JaccardOracle,
    "l46_prefix_filter_join" -> l8JaccardOracle,
    "l32_sequence_packing" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM d)
        |SELECT source, cum_before // 500 AS bin, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,
    "l31_doc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, greatest(len(toks) - 1, 0), 30)) AS start
        |  FROM t)
        |SELECT doc_id, CAST(start // 30 AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[start + 1 : start + 40], ' ') AS chunk_text,
        |  CAST(least(len(toks) - start, 40) AS BIGINT) AS n_chunk
        |FROM s WHERE start < len(toks)""".stripMargin,
    "l33_train_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END
        |    AS split
        |FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(text), 1, 4))::BIGINT % 100 AS b
        |  FROM documents)""".stripMargin,
    "l34_unicode_normalize" ->
      """SELECT doc_id,
        |  strip_accents(translate(text, 'aeiou', 'áéíóú')) AS clean,
        |  strip_accents(translate(text, 'aeiou', 'áéíóú')) = text AS roundtrip_ok
        |FROM documents""".stripMargin,
    "l35_bigram_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> {'w1': t[i], 'w2': t[i+1]})) AS z
        |  FROM t),
        |b2 AS (SELECT doc_id, z.w1 AS w1, z.w2 AS w2 FROM bi),
        |uni AS (SELECT w1, count(*) AS uc FROM b2 GROUP BY 1),
        |big AS (SELECT w1, w2, count(*) AS bc FROM b2 GROUP BY 1, 2),
        |sc AS (
        |  SELECT b2.doc_id, bg.bc * 1000000 // un.uc AS s
        |  FROM b2 JOIN big bg USING (w1, w2) JOIN uni un USING (w1))
        |SELECT doc_id, CAST(sum(s) // count(*) AS BIGINT) AS lm_score
        |FROM sc GROUP BY 1""".stripMargin,
    "l36_incremental_neardup" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 = 0),
        |batch AS (
        |  SELECT doc_id + 1000000 AS id, substr(text, strpos(text, ' ') + 1) AS text
        |  FROM documents WHERE doc_id % 5 = 0),
        |csh AS (
        |  SELECT id, unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS shingle
        |  FROM corpus),
        |bsh AS (
        |  SELECT id, unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS shingle
        |  FROM batch),
        |cmh AS (SELECT id,
        |  min(substr(md5(shingle), 1, 5)) AS h1, min(substr(md5(shingle), 6, 5)) AS h2,
        |  min(substr(md5(shingle), 11, 5)) AS h3, min(substr(md5(shingle), 16, 5)) AS h4,
        |  min(substr(md5(shingle), 21, 5)) AS h5, min(substr(md5(shingle), 26, 5)) AS h6
        |  FROM csh GROUP BY id),
        |bmh AS (SELECT id,
        |  min(substr(md5(shingle), 1, 5)) AS h1, min(substr(md5(shingle), 6, 5)) AS h2,
        |  min(substr(md5(shingle), 11, 5)) AS h3, min(substr(md5(shingle), 16, 5)) AS h4,
        |  min(substr(md5(shingle), 21, 5)) AS h5, min(substr(md5(shingle), 26, 5)) AS h6
        |  FROM bsh GROUP BY id),
        |cbands AS (
        |  SELECT id, md5(h1 || '|' || h2 || '|' || h3) AS band, 1 AS bi FROM cmh
        |  UNION ALL SELECT id, md5(h4 || '|' || h5 || '|' || h6), 2 FROM cmh),
        |bbands AS (
        |  SELECT id, md5(h1 || '|' || h2 || '|' || h3) AS band, 1 AS bi FROM bmh
        |  UNION ALL SELECT id, md5(h4 || '|' || h5 || '|' || h6), 2 FROM bmh)
        |SELECT b.id AS batch_id, min(c.id) AS dup_of
        |FROM bbands b JOIN cbands c ON b.band = c.band AND b.bi = c.bi
        |GROUP BY b.id""".stripMargin,
    "l38_mixture_execute" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_d,
        |    (SELECT count(*) FROM documents) AS total,
        |    CASE source WHEN 'src0' THEN 36 WHEN 'src1' THEN 18 ELSE 7 END AS num
        |  FROM documents GROUP BY source),
        |factors AS (
        |  SELECT source,
        |    ((total * num * 10000) // (180 * n_d)) // 10000 AS n_full,
        |    ((total * num * 10000) // (180 * n_d)) % 10000 AS frac_bp
        |  FROM counts),
        |docs AS (
        |  SELECT d.source, d.doc_id,
        |    f.n_full + CASE WHEN
        |      ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000
        |        < f.frac_bp THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN factors f USING (source))
        |SELECT source, doc_id,
        |  CAST(unnest(generate_series(1, CAST(copies AS INTEGER))) AS BIGINT)
        |    AS copy_idx
        |FROM docs WHERE copies >= 1""".stripMargin,
    "l39_span_dedup" ->
      (s"WITH $candSql,\n" +
        """toks AS (SELECT id, string_split(text, ' ') AS t FROM cand WHERE id % 4 = 0),
          |grams AS (
          |  SELECT id,
          |    unnest(generate_series(1, greatest(len(t) - 7, 0))) AS pos,
          |    unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
          |      i -> md5(array_to_string(t[i:i+7], ' ')))) AS g
          |  FROM toks),
          |dup AS (SELECT g FROM grams GROUP BY g HAVING count(DISTINCT id) >= 2),
          |hits AS (SELECT id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
          |isl AS (SELECT id, pos,
          |          pos - row_number() OVER (PARTITION BY id ORDER BY pos) AS k
          |        FROM hits)
          |SELECT id AS doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
          |  count(*) AS n_grams
          |FROM isl GROUP BY id, k""".stripMargin),
    "l41_bpe_merges" -> l41OracleSql,
    "l42_bpe_encode" -> l42OracleSql,
    "l48_tfidf_topterms" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tfc AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tf GROUP BY doc_id, token),
        |dfc AS (
        |  SELECT token, count(*) AS df FROM tfc GROUP BY token),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |scored AS (
        |  SELECT tfc.doc_id, tfc.token, tfc.tf * (n.n // dfc.df) AS score
        |  FROM tfc JOIN dfc USING (token) CROSS JOIN n)
        |SELECT doc_id, token, score FROM (
        |  SELECT doc_id, token, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, token) AS rn
        |  FROM scored)
        |WHERE rn <= 3""".stripMargin,
    "l43_label_centroids" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |x AS (SELECT label,
        |        unnest(generate_series(1, len(emb))) AS dim,
        |        unnest(list_transform(emb, v -> CAST(round(v * 1000000) AS BIGINT))) AS v
        |      FROM e)
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  CAST(sum(v) AS BIGINT) AS sum_scaled, count(*) AS n
        |FROM x GROUP BY label, dim""".stripMargin,
    "l44_kmv_overlap" ->
      """WITH ha AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 3 <> 0),
        |hb AS (
        |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 <> 0),
        |u AS (
        |  SELECT h, max(ina) AS ina, max(inb) AS inb FROM (
        |    SELECT h, 1 AS ina, 0 AS inb FROM ha
        |    UNION ALL SELECT h, 0, 1 FROM hb) t
        |  GROUP BY h),
        |k AS (SELECT * FROM u ORDER BY h LIMIT 256)
        |SELECT count(*) AS k_actual,
        |  CAST(sum(ina * inb) AS BIGINT) AS n_both,
        |  CAST(sum(ina) AS BIGINT) AS n_a,
        |  CAST(sum(inb) AS BIGINT) AS n_b,
        |  CAST(1000000 * sum(ina * inb) // 256 AS BIGINT) AS jaccard_ppm
        |FROM k""".stripMargin,
    "l45_sentence_chunk" ->
      """WITH sented AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g') AS t2
        |  FROM documents),
        |sents AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(t2, '\. ', '.' || chr(1), 'g'), chr(1))
        |      AS ss
        |  FROM sented),
        |e AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ss))) AS sidx, ss
        |  FROM sents),
        |x AS (
        |  SELECT doc_id, sidx, ss[sidx] AS sent,
        |    CAST(COALESCE(sum(length(ss[sidx]) + 1) OVER (
        |      PARTITION BY doc_id ORDER BY sidx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS before_chars
        |  FROM e)
        |SELECT doc_id, CAST(before_chars // 400 AS BIGINT) AS chunk_id,
        |  string_agg(sent, ' ' ORDER BY sidx) AS chunk_text,
        |  count(*) AS n_sentences
        |FROM x GROUP BY doc_id, CAST(before_chars // 400 AS BIGINT)""".stripMargin,
    "l40_shuffle_shard" ->
      """SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
        |    AS BIGINT) AS pos_in_shard
        |FROM (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS skey,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 4))::BIGINT % 8
        |      AS shard
        |  FROM documents)""".stripMargin,
    "l37_html_extract" ->
      """WITH html AS (
        |  SELECT doc_id,
        |    '<html><head><title>doc</title><script>var x=1;</script></head>' ||
        |    '<body><div class="nav">menu &amp; links</div><p>' ||
        |    replace(text, ' ', ' &nbsp;') ||
        |    '</p><footer>&copy; 2024</footer></body></html>' AS markup
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(markup,
        |      '<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', '', 'gs'),
        |      '<[^>]+>', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS no_tags
        |  FROM html)
        |SELECT doc_id,
        |  replace(replace(replace(no_tags, '&nbsp;', ''), '&amp;', '&'),
        |    '&copy;', '(c)') AS clean
        |FROM stripped""".stripMargin,
    "l29_length_histogram" ->
      """SELECT lang, least(length(text) // 250, 15) AS bucket,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "l30_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS freq FROM toks GROUP BY 1
        |    ORDER BY freq DESC, token LIMIT 50)),
        |per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM toks t LEFT JOIN vocab v ON t.token = v.token
        |  GROUP BY 1)
        |SELECT doc_id, n_tokens, n_oov,
        |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate FROM per""".stripMargin,
    "l9_embedding_neardup" ->
      """WITH cand AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2) FROM embeddings),
        |probes AS (SELECT vec_id AS a_id, emb AS a_emb FROM cand WHERE vec_id < 50)
        |SELECT a_id, c.vec_id AS b_id
        |FROM probes p JOIN cand c ON p.a_id < c.vec_id
        |WHERE list_dot_product(p.a_emb, c.emb) /
        |  (sqrt(list_dot_product(p.a_emb, p.a_emb)) * sqrt(list_dot_product(c.emb, c.emb))) > 0.999""".stripMargin,
    "l12_edit_distance" ->
      """SELECT a.doc_id, CAST(levenshtein(substr(a.text,1,40), substr(b.text,1,40)) AS BIGINT) AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id < 100 AND b.doc_id < 100""".stripMargin,
    "l14_vocab" ->
      """SELECT token, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin,
    "l15_contamination" ->
      """WITH bs AS (
        |  SELECT DISTINCT unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 7, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+7], ' '))) AS shingle
        |  FROM documents WHERE doc_id < 20),
        |cs AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, greatest(len(string_split(text,' ')) - 7, 0)),
        |    i -> array_to_string((string_split(text,' '))[i:i+7], ' '))) AS shingle
        |  FROM documents WHERE doc_id >= 20)
        |SELECT DISTINCT doc_id FROM cs WHERE shingle IN (SELECT shingle FROM bs)""".stripMargin,
    "l16_pii_scrub" ->
      """SELECT doc_id,
        |regexp_replace(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]{6,}', '<NUM>', 'g') <> text AS was_scrubbed,
        |CAST(length(regexp_replace(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]{6,}', '<NUM>', 'g')) AS BIGINT) AS n_chars_scrubbed
        |FROM documents""".stripMargin,
    "l27_char_diversity" -> {
      val alphabet = ('a' to 'z').map(_.toString) :+ " "
      val terms = alphabet.map(c =>
        s"(length(lower(text)) - length(replace(lower(text), '$c', '')))")
      val n = terms.mkString("(", " + ", ")")
      val sumSq = terms.map(t => s"$t * $t").mkString("(", " + ", ")")
      s"""SELECT doc_id, CAST($n AS BIGINT) AS n_alpha,
         |  CASE WHEN $n > 0
         |       THEN CAST(1 AS DOUBLE) - CAST($sumSq AS DOUBLE) / CAST($n * $n AS DOUBLE)
         |       ELSE 0.0 END AS char_diversity
         |FROM documents""".stripMargin
    },
    "l18_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, toks,
        |        list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS bg
        |      FROM t)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS dup_token_frac,
        |  CASE WHEN len(toks) >= 2
        |       THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |       ELSE 0.0 END AS dup_bigram_frac
        |FROM b""".stripMargin,
    "l28_curation_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
        |  FROM documents),
        |q AS (SELECT * FROM m
        |      WHERE n_tokens >= 20 AND CAST(n_uniq AS DOUBLE) / n_tokens >= 0.3),
        |d AS (SELECT *, row_number() OVER (
        |        PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q),
        |u AS (SELECT * FROM d WHERE rn = 1),
        |s AS (SELECT * FROM u
        |      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100
        |            < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE 10 END)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_uniq) AS DOUBLE) / sum(n_tokens) AS corpus_uniq_ratio
        |FROM s GROUP BY lang""".stripMargin,
    "l19_stratified_sample" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
        |  FROM documents)
        |WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE 10 END""".stripMargin,
    "l20_mixture_plan" ->
      """SELECT source, n_docs, actual_frac, target_w, target_w / actual_frac AS repeat_factor
        |FROM (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS actual_frac,
        |    CAST(CASE source WHEN 'src0' THEN 0.2 WHEN 'src1' THEN 0.1
        |         ELSE CAST(0.7 AS DOUBLE) / 18 END AS DOUBLE) AS target_w
        |  FROM documents GROUP BY source)""".stripMargin,
    "l21_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |s AS (SELECT vec_id, emb,
        |        greatest(list_max(list_transform(emb, y -> abs(y))), 1e-12) AS scale
        |      FROM e)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(emb,
        |    x -> CAST(CAST(round(x * 127 / scale) AS INTEGER) AS VARCHAR)), ',') AS q8
        |FROM s""".stripMargin,
    "l24_simhash_banded_dedup" ->
      (s"WITH $candSql,\n" +
        s"""tok AS (SELECT id, unnest(string_split(text, ' ')) AS token
           |        FROM cand WHERE id % 10 = 0),
           |sums AS (SELECT id,
           |$simhashSums
           |FROM tok GROUP BY id),
           |fp AS (SELECT id, CAST($simhashFp AS BIGINT) AS fp FROM sums),
           |banded AS (
           |  SELECT id, fp, b.band, (fp >> (b.band * 4)) & 15 AS bval
           |  FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) b(band)),
           |cands AS (
           |  SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.fp AS a_fp, b.fp AS b_fp
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bval = b.bval AND a.id < b.id)
           |SELECT a_id, b_id, CAST(bit_count(xor(a_fp, b_fp)) AS BIGINT) AS hamming
           |FROM cands WHERE bit_count(xor(a_fp, b_fp)) <= 2""".stripMargin),
    "l25_ranked_retrieval" ->
      """WITH q(query_id, q_text) AS (VALUES
        |  (1, 'spark window merge'), (2, 'vector hash join'), (3, 'slow filter scan')),
        |qt AS (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id,
        |         unnest(string_split(q_text, ' ')) AS token FROM q),
        |postings AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM postings GROUP BY 1, 2),
        |hits AS (SELECT tf.* FROM tf
        |         JOIN (SELECT DISTINCT token FROM qt) t USING (token)),
        |dfreq AS (SELECT token, count(*) AS df FROM hits GROUP BY 1),
        |dl AS (SELECT doc_id, count(*) AS dl FROM postings GROUP BY 1),
        |scored AS (
        |  SELECT qt.query_id, h.doc_id,
        |         CAST(sum(h.tf * (1000000 // d.df)) AS BIGINT) AS tfw
        |  FROM hits h JOIN qt USING (token) JOIN dfreq d USING (token)
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT s.query_id, s.doc_id, (s.tfw * 1000) // dl.dl AS score,
        |         row_number() OVER (PARTITION BY s.query_id
        |           ORDER BY (s.tfw * 1000) // dl.dl DESC, s.doc_id) AS rnk
        |  FROM scored s JOIN dl USING (doc_id))
        |SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rnk
        |FROM ranked WHERE rnk <= 5""".stripMargin,
    "l22_group_topk_sample" ->
      """SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin,
    "f_bitagg" ->
      """WITH m AS (
        |  SELECT event_type,
        |    (1::BIGINT << CAST(user_id % 60 AS INTEGER)) AS mask
        |  FROM events)
        |SELECT event_type,
        |  bit_or(mask) AS user_bitmap,
        |  bit_and(mask) AS common_mask,
        |  CAST(bit_count(bit_or(mask)) AS BIGINT) AS n_slots
        |FROM m GROUP BY event_type""".stripMargin,
    "f_bits" ->
      """SELECT event_id,
        |event_id & 255 AS low8,
        |event_id | 16 AS or16,
        |xor(event_id, user_id) AS xored,
        |event_id << 2 AS shl2,
        |event_id >> 3 AS shr3
        |FROM events""".stripMargin,
    "t_typed_dataset" ->
      """SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents WHERE n_chars > 500 AND lang <> 'zh'""".stripMargin,
    "l10_token_count" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
        |FROM documents""".stripMargin,
    "l11_rolling_fingerprint" ->
      """SELECT doc_id,
        |CASE WHEN length(text) < 32 THEN md5(text)
        |     ELSE list_aggregate(list_transform(
        |            generate_series(1, greatest(length(text) - 31, 1), 16),
        |            i -> md5(substr(text, i, 32))), 'min')
        |END AS fingerprint
        |FROM documents""".stripMargin
  )
}
