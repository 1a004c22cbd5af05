package graft

import graft.queries.Llm
import org.apache.spark.sql.functions._

/** Quality bounds for the no-oracle LSH scale paths (SURVEY §2.10 L2/L3):
  * the approximate variants are rows-only in the driver compare (their hash
  * coefficients are not SQL-reproducible), so these tests bound their
  * QUALITY against exact ground truth instead — the ANN path must overlap
  * brute-force top-k, and the MinHash LSH path must recover the planted
  * near-duplicate pairs. Without this, "the scale path exists" would be
  * unfalsifiable.
  */
class RecallSpec extends SparkSpec {

  test("L21: int8 quantization bounds per-element error and preserves cosine") {
    // Reconstruction x̂ = q · scale / 127 can be off by at most half a
    // quantization step (scale / 254) per element; cosine between the
    // original and reconstructed vector must stay essentially 1 — the
    // property that makes searching over int8 vectors sound.
    val stats = Engine.embeddings(spark, sfDir)
      .selectExpr(
        "transform(embedding, x -> cast(x as double)) AS ed",
        "greatest(array_max(transform(embedding, y -> abs(cast(y as double)))), 1e-12d) AS scale")
      .selectExpr("ed", "scale",
        "transform(ed, x -> round(x * 127 / scale) * scale / 127) AS dq")
      .selectExpr(
        "array_max(zip_with(ed, dq, (a, b) -> abs(a - b))) / (scale / 254) AS err_steps",
        "aggregate(zip_with(ed, dq, (a, b) -> a * b), 0d, (s, x) -> s + x) / " +
          "(sqrt(aggregate(transform(ed, x -> x * x), 0d, (s, x) -> s + x)) * " +
          " sqrt(aggregate(transform(dq, x -> x * x), 0d, (s, x) -> s + x))) AS cos")
      .agg(max(col("err_steps")).as("max_err_steps"), min(col("cos")).as("min_cos"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    assert(stats._1 <= 1.0 + 1e-9, s"max error ${stats._1} half-steps")
    assert(stats._2 >= 0.995, s"worst cosine ${stats._2}")
  }

  test("L3b: ANN LSH achieves recall@3 >= 0.7 vs brute-force ground truth") {
    import spark.implicits._
    val ann = Llm.l3AnnLsh(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // Exact ground truth over the same probe set (query_id < 10), same
    // metric the ANN ranks by (euclidean), brute force.
    val emb = Engine.embeddings(spark, sfDir)
    val probes = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val dist = aggregate(
      zip_with($"q_emb", $"embedding", (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x.cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"d", $"neighbor_id")
    val exact = emb.join(broadcast(probes), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), dist.as("d"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.7, s"ANN recall@3 = $recall (ann=${ann.size}, exact=${exact.size})")
  }

  test("L2b: MinHash LSH recovers the planted near-duplicate pairs") {
    import spark.implicits._
    val found = Llm.l2MinhashLshMllib(spark, sfDir)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // The candidate set plants, for every doc id ≡ 0 (mod 25), a copy under
    // id+1000000 with only the first token dropped — a near-duplicate the
    // LSH join at jaccard-distance 0.5 must surface.
    val planted = Engine.documents(spark, sfDir)
      .filter($"doc_id" % 25 === 0)
      .select($"doc_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(planted.nonEmpty)
    val recovered = planted.count(found.contains).toDouble / planted.size
    assert(recovered >= 0.8,
      s"planted near-dup recovery = $recovered (found=${found.size}, planted=${planted.size})")
  }

  test("L44: KMV overlap estimate lands within the sketch's error bound") {
    import spark.implicits._
    // exact Jaccard of the two corpora's distinct-text sets, computed the
    // expensive way the sketch exists to avoid
    val a = Engine.documents(spark, sfDir).filter($"doc_id" % 3 =!= 0)
      .select(md5($"text").as("h")).distinct()
    val b = Engine.documents(spark, sfDir).filter($"doc_id" % 2 =!= 0)
      .select(md5($"text").as("h")).distinct()
    val nBoth = a.join(b, Seq("h"), "left_semi").count().toDouble
    val nUnion = a.union(b).distinct().count().toDouble
    val exact = nBoth / nUnion
    val est = Llm.l44KmvOverlap(spark, sfDir)
      .select($"jaccard_ppm").as[Long].head() / 1e6
    // k = 256 → standard error ~ sqrt(J(1-J)/k) ≈ 0.03; allow 5 sigma
    assert(math.abs(est - exact) < 0.16,
      s"KMV estimate $est vs exact $exact")
    // and the sketch never invents overlap on disjoint corpora
    val disjoint = Llm.kmvOverlapCore(
      Engine.documents(spark, sfDir).select(concat(lit("A:"), $"text").as("text")),
      Engine.documents(spark, sfDir).select(concat(lit("B:"), $"text").as("text")),
      k = 64)
      .select($"n_both").as[Long].head()
    assert(disjoint == 0L, s"disjoint corpora reported $disjoint shared hashes")
  }

  test("L5e: perceptual hash pairs exactly the re-encoded image duplicates") {
    import spark.implicits._
    val pairs = graft.queries.Sources.l5eImagePhash(spark, sfDir)
      .select($"a_name", $"b_name").as[(String, String)].collect().toSet
    // staging plants dup_i.jpg as the decode->re-encode (pixel-drifted,
    // NOT byte-identical) twin of img_i.jpg; the block patterns of
    // different i sit ~32 bits apart, so the matcher must return exactly
    // the 8 planted pairs — no misses, no false positives
    val planted = (0 until 8).map(i => (s"dup_$i.jpg", s"img_$i.jpg")).toSet
    assert(pairs == planted, s"got $pairs")
  }
}
