package graft.queries

import graft.Engine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extraction / projection layer (SURVEY §2.2 P1-P18 + §2.7 scalar function
  * families): typed columns derived from semi-structured text by regex
  * fallback chains, mirroring /root/reference/src/01-scrape-images.py:270-317
  * (manifest id :270-279, 3-way date fallback :281-294, findall :296-299,
  * sanitize/defaults :414-420, url handling :342,:365,:458, md5 :78-83,
  * MIME dispatch :110-116).
  *
  * Input: a deterministic HTML corpus synthesized from the `documents`
  * fixture — built identically in the oracle SQL (CTE below), so DuckDB
  * independently derives the expected extraction results.
  */
object Extraction {

  /** HTML corpus: one page-source string per document, with the reference's
    * three extraction shapes (data-src id / src id / none; date tag /
    * title-tag date / filename-embedded date / missing). */
  def corpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", $"source", $"lang", $"text")
      .withColumn("mid", ($"doc_id" * 7 + 13).cast("string"))
      .withColumn("iso", format_string("%04d-%02d-%02d",
        lit(1860) + $"doc_id" % 40, lit(1) + $"doc_id" % 12, lit(1) + $"doc_id" % 28))
      .withColumn("ymd", format_string("%04d%02d%02d",
        lit(1860) + $"doc_id" % 40, lit(1) + $"doc_id" % 12, lit(1) + $"doc_id" % 28))
      .withColumn("fn1", concat(lit("bib13991099_"), $"ymd", lit("_0_1_"),
        format_string("%04d", lit(1) + $"doc_id" % 9999), lit(".jp2")))
      .withColumn("fnjpg", concat(lit("thumb_"), $"mid", lit(".jpg")))
      .withColumn("id_part",
        when($"doc_id" % 3 === 0, concat(lit("<img data-src=\"https://data.kb.se/iiif/2/"),
          $"mid", lit("/full/full/0/default.jpg\">")))
          .when($"doc_id" % 3 === 1, concat(lit("<img src=\"https://data.kb.se/iiif/2/"),
            $"mid", lit("/x.jpg\">")))
          .otherwise(lit("<div>no id</div>")))
      .withColumn("date_part",
        when($"doc_id" % 4 === 0, concat(lit("<p class=\"search-result-item-date\">"),
          $"iso", lit("</p>")))
          .when($"doc_id" % 4 === 1, concat(lit("<title>Paper "), $"source", lit(" | "),
            $"iso", lit("</title>")))
          .when($"doc_id" % 4 === 2, concat(lit("<span>"), $"fn1", lit("</span>")))
          .otherwise(lit("")))
      .withColumn("files_part", concat(lit("<a href=\""), $"fn1", lit("\">"), $"fn1", lit("</a>")))
      .withColumn("html", concat_ws(" ", $"id_part", $"date_part", $"files_part"))
  }

  /** Same corpus as a DuckDB CTE, prefixed to every oracle below. */
  val corpusSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, source, lang, text,
      |    CAST(doc_id*7+13 AS VARCHAR) AS mid,
      |    printf('%04d-%02d-%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28) AS iso,
      |    'bib13991099_' || printf('%04d%02d%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28)
      |      || '_0_1_' || printf('%04d', 1+doc_id%9999) || '.jp2' AS fn1,
      |    'thumb_' || CAST(doc_id*7+13 AS VARCHAR) || '.jpg' AS fnjpg,
      |    (CASE WHEN doc_id%3=0 THEN '<img data-src="https://data.kb.se/iiif/2/' || CAST(doc_id*7+13 AS VARCHAR) || '/full/full/0/default.jpg">'
      |          WHEN doc_id%3=1 THEN '<img src="https://data.kb.se/iiif/2/' || CAST(doc_id*7+13 AS VARCHAR) || '/x.jpg">'
      |          ELSE '<div>no id</div>' END)
      |    || ' ' ||
      |    (CASE WHEN doc_id%4=0 THEN '<p class="search-result-item-date">' || printf('%04d-%02d-%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28) || '</p>'
      |          WHEN doc_id%4=1 THEN '<title>Paper ' || source || ' | ' || printf('%04d-%02d-%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28) || '</title>'
      |          WHEN doc_id%4=2 THEN '<span>' || 'bib13991099_' || printf('%04d%02d%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28) || '_0_1_' || printf('%04d', 1+doc_id%9999) || '.jp2' || '</span>'
      |          ELSE '' END)
      |    || ' ' ||
      |    '<a href="' || 'bib13991099_' || printf('%04d%02d%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28) || '_0_1_' || printf('%04d', 1+doc_id%9999) || '.jp2' || '">'
      |      || 'bib13991099_' || printf('%04d%02d%02d', 1860+doc_id%40, 1+doc_id%12, 1+doc_id%28) || '_0_1_' || printf('%04d', 1+doc_id%9999) || '.jp2' || '</a>' AS html
      |  FROM documents
      |)
      |""".stripMargin

  // regex patterns (RE2-safe: shared verbatim by Spark and DuckDB)
  private val patIdA = "data-src=\"https://data\\.kb\\.se/iiif/2/([0-9]+)/"
  private val patIdB = "src=\"https://data\\.kb\\.se/iiif/2/([0-9]+)/"
  private val patDateTag = "<p class=\"search-result-item-date\">([0-9]{4}-[0-9]{2}-[0-9]{2})</p>"
  private val patDateTitle = "\\| ([0-9]{4}-[0-9]{2}-[0-9]{2})</title>"
  // date-from-filename fallback is anchored to the <span> block: the same
  // filename also appears in every row's <a> tag, and the reference's date
  // fallback (:290-293) only fires when no explicit date source exists.
  private val patFnDate = "<span>bib[0-9]+_([0-9]{4})([0-9]{2})([0-9]{2})_"
  private val patFindall = "bib[0-9]+_[0-9]+_[0-9]+_[0-9]+_[0-9]+\\.jp2"
  // same patterns as DuckDB string literals (no escape processing there)
  private val sqlIdA = """data-src="https://data\.kb\.se/iiif/2/([0-9]+)/"""
  private val sqlIdB = """src="https://data\.kb\.se/iiif/2/([0-9]+)/"""
  private val sqlDateTag = """<p class="search-result-item-date">([0-9]{4}-[0-9]{2}-[0-9]{2})</p>"""
  private val sqlDateTitle = """\| ([0-9]{4}-[0-9]{2}-[0-9]{2})</title>"""
  private val sqlFnDate = """<span>bib[0-9]+_([0-9]{4})([0-9]{2})([0-9]{2})_"""
  private val sqlFindall = """bib[0-9]+_[0-9]+_[0-9]+_[0-9]+_[0-9]+\.jp2"""
  private val sqlTitlePat = """<title>([^|<]+)\|"""

  /** First-non-null regex fallback chain; empty match counts as a miss
    * (reference: `if match: return` — empty string never returned). */
  private def rxChain(c: org.apache.spark.sql.Column, pats: Seq[String]) =
    coalesce(pats.map(p => nullif(regexp_extract(c, p, 1), lit(""))): _*)

  /** P1: manifest-id extraction, pattern A else B (reference :270-279). */
  def p1RegexFallback(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir).select($"doc_id", rxChain($"html", Seq(patIdA, patIdB)).as("manifest_id"))
  }

  /** P2: 3-way date fallback incl. group reassembly (reference :281-294)
    * with the P13 "Unknown_Date" default (:418-420). */
  def p2DateFallback(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir).select($"doc_id",
      coalesce(
        nullif(regexp_extract($"html", patDateTag, 1), lit("")),
        nullif(regexp_extract($"html", patDateTitle, 1), lit("")),
        nullif(concat_ws("-",
          regexp_extract($"html", patFnDate, 1),
          regexp_extract($"html", patFnDate, 2),
          regexp_extract($"html", patFnDate, 3)), lit("--")),
        lit("Unknown_Date")).as("pub_date"))
  }

  /** P3: multi-group extract to struct (title tag → paper + date, :301-317). */
  def p3StructExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .withColumn("parsed", struct(
        nullif(trim(regexp_extract($"html", "<title>([^|<]+)\\|", 1)), lit("")).as("paper"),
        nullif(regexp_extract($"html", patDateTitle, 1), lit("")).as("pdate")))
      .select($"doc_id", $"parsed.paper".as("paper"), $"parsed.pdate".as("pdate"))
  }

  /** P4 + A5: extract-all + array-local distinct + explode (:296-299). */
  def p4ExtractAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .select($"doc_id",
        explode(array_distinct(regexp_extract_all($"html", lit(patFindall), lit(0)))).as("fname"))
  }

  /** P5: rlike validation predicate (:483-485). */
  def p5RlikeValidate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    p2DateFallback(spark, dir)
      .select($"doc_id", $"pub_date",
        $"pub_date".rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$").as("is_valid"))
  }

  /** P7: equality predicate with default literal (:488-491). */
  def p7EqDefault(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .filter($"lang" === coalesce(lit(null).cast("string"), lit("en")))
      .select($"doc_id", $"lang")
  }

  /** P8: suffix predicate (.jp2 filter, :340). */
  def p8SuffixFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fileNames(spark, dir).filter(lower($"file_name").endsWith(".jp2"))
      .select($"doc_id", $"file_name")
  }

  /** P9: null/failure filter — drop rows whose extraction failed (:411-429). */
  def p9NullFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    p1RegexFallback(spark, dir).filter($"manifest_id".isNotNull)
  }

  /** P10: sanitize — strip all chars not [\w\s-] (:414). */
  def p10Sanitize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .select($"doc_id", concat(lit("Paper #"), $"source", lit("!")).as("raw_title"))
      .withColumn("clean_title", regexp_replace($"raw_title", "[^\\w\\s-]", ""))
  }

  /** P11: char translate ('/' to '-', :418). */
  def p11Translate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .select($"doc_id", translate($"iso", "-", "/").as("slashed"))
      .withColumn("dashed", translate($"slashed", "/", "-"))
  }

  /** P12: trim (:285,:289,:393,:396). */
  def p12Trim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id", concat(lit("  "), $"source", lit("  ")).as("padded"))
      .select($"doc_id", trim($"padded").as("trimmed"), ltrim($"padded").as("l"),
        rtrim($"padded").as("r"))
  }

  /** P13: default-value projection (:415-420). */
  def p13Default(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select($"doc_id",
        coalesce(when($"doc_id" % 10 === 0, lit(null).cast("string")).otherwise($"lang"),
          lit("Unknown")).as("lang_or_default"))
  }

  /** P14: url decode + basename (:342,:458). */
  def p14UrlBasename(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .select($"doc_id",
        concat(lit("https://data.kb.se/some%20dir/"), $"fn1").as("url"))
      .withColumn("base_name", element_at(split(url_decode($"url"), "/"), -1))
  }

  /** P15: url cleanup — backslash artifacts removed (:365). */
  def p15UrlCleanup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir)
      .select($"doc_id",
        regexp_replace(concat(lit("https://data.kb.se/"), $"fn1"), "/", "\\\\/").as("messy"))
      .withColumn("clean", translate($"messy", "\\", ""))
  }

  /** P16: concat / interpolation (:440,:487-491). */
  def p16Concat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpus(spark, dir).select($"doc_id",
      concat(lit("https://data.kb.se/"), $"mid", lit("/manifest")).as("manifest_url"),
      format_string("https://tidningar.kb.se/search?q=%s&from=%s", $"source", $"iso")
        .as("search_url"))
  }

  /** P17 / F-hash (oracle-checkable part): md5 + sha256 (:78-83,:126-129). */
  def p17Md5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id",
      md5($"text".cast("binary")).as("md5_hex"),
      sha2($"text".cast("binary"), 256).as("sha256_hex"))
  }

  /** F-hash (Spark-native hashes, no DuckDB equivalents): rows-only check. */
  def fHashNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id",
      xxhash64($"text").as("xx64"),
      crc32($"text".cast("binary")).as("crc"),
      hash($"text").as("h32"))
  }

  /** P18 + F-json: JSON field access via from_json and get_json_object with
    * nested-schema pruning (only `k` is parsed). */
  def p18JsonPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).select($"event_id",
      get_json_object($"props", "$.k").cast("long").as("k_str"),
      from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
        .getField("k").as("k_parsed"))
  }

  /** P19: error-safe arithmetic/cast surface (`try_*`) — the robustness
    * the reference gets from its try/except wrappers (:54-74), expressed as
    * null-on-failure expressions instead of task-killing exceptions: a bad
    * row yields a null to filter or default, never a failed 100 TB job.
    * try_divide is null on a zero divisor, try_cast on a non-numeric
    * string, try_add on long overflow. The fixture fails ~2% of rows —
    * the realistic shape; the failure path materializes a caught exception
    * (~20 µs/row), so an ALL-bad column costs ~100× the happy path and a
    * quality gate should drop pathological inputs before, not inside, the
    * hot projection. */
  def p19TrySurface(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir).select($"o_orderkey",
      expr("try_divide(cast(o_totalprice as double), cast(o_orderkey % 3 as double))")
        .as("per_bucket"),
      expr("try_cast(CASE WHEN o_orderkey % 50 = 0 THEN o_orderstatus " +
        "ELSE CAST(o_orderkey AS STRING) END AS BIGINT)").as("mixed_num"),
      expr("try_add(9223372036854775800L, CAST(o_orderkey % 50 = 0 AS LONG) * 100 + 1)")
        .as("near_overflow"))
  }

  /** F-variant: semi-structured data through the VARIANT type — parse
    * once into Spark's binary variant encoding, then typed path access
    * (`variant_get`) without re-parsing per field: the scale answer to
    * "json string column extracted five times per query". Missing paths
    * yield SQL NULL, not an error. */
  def fVariant(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).select($"event_id",
      expr("variant_get(parse_json(props), '$.k', 'long')").as("k_long"),
      expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
      expr("variant_get(parse_json(props), '$.absent', 'long')").as("absent_long"),
      expr("schema_of_variant(parse_json(props))").as("v_schema"))
  }

  /** S10: MIME dispatch by (lowercased) extension (:110-116). */
  def s10MimeDispatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fileNames(spark, dir).select($"doc_id", $"file_name",
      when(lower($"file_name").endsWith(".jp2"), "image/jp2")
        .when(lower($"file_name").endsWith(".jpeg") || lower($"file_name").endsWith(".jpg"),
          "image/jpeg")
        .otherwise("application/octet-stream").as("mime"))
  }

  /** Synthetic filename column shared by P8/S10 (mixed-case extensions). */
  private def fileNames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id",
      concat(lit("file_"), $"doc_id",
        when($"doc_id" % 6 === 0, ".JP2")
          .when($"doc_id" % 3 === 0, ".jp2")
          .when($"doc_id" % 3 === 1, ".jpeg")
          .otherwise(".bin")).as("file_name"))
  }

  private val fileNamesSql =
    """SELECT doc_id, 'file_' || CAST(doc_id AS VARCHAR) ||
      |  (CASE WHEN doc_id%6=0 THEN '.JP2' WHEN doc_id%3=0 THEN '.jp2'
      |        WHEN doc_id%3=1 THEN '.jpeg' ELSE '.bin' END) AS file_name
      |FROM documents""".stripMargin

  /** F-string family: length/case/substr/pad/position/predicates. */
  def fString(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id",
      length($"text").cast("long").as("n_len"),
      upper($"source").as("src_up"),
      lower($"source").as("src_lo"),
      substring($"text", 1, 12).as("head12"),
      lpad($"doc_id".cast("string"), 8, "0").as("padded_id"),
      instr($"text", "data").cast("long").as("pos_data"),
      $"text".contains("spark").as("has_spark"),
      $"source".startsWith("src1").as("is_src1x"),
      $"text".endsWith("e").as("ends_e"),
      reverse($"source").as("src_rev"),
      concat_ws("|", $"source", $"lang").as("joined"))
  }

  /** F-date family (portable subset; weekday uses Monday=0 on both sides). */
  def fDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).select($"event_id",
      year($"ts").cast("long").as("y"),
      month($"ts").cast("long").as("mo"),
      dayofmonth($"ts").cast("long").as("dom"),
      weekday($"ts").cast("long").as("wd"),
      date_add(to_date($"ts"), 1).as("next_day"),
      last_day(to_date($"ts")).as("month_end"),
      datediff(to_date($"ts"), lit("2024-01-01").cast("date")).cast("long").as("days_in"),
      unix_timestamp($"ts").as("epoch_s"),
      date_format($"ts", "yyyy-MM-dd HH:mm").as("fmt"))
  }

  /** F-math family (IEEE-exact ops only, so bits match DuckDB). */
  def fMath(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir).select($"l_orderkey", $"l_linenumber",
      // no round() on decimal-structured doubles: Spark rounds the shortest
      // decimal repr (x.xx5 → up) while DuckDB rounds the binary value —
      // they disagree on exactly the halfway cases 2-dp money math produces.
      ($"l_extendedprice" / $"l_quantity").as("unit_price"),
      round(sqrt($"l_quantity") * 1000, 2).as("sqrt_rounded"),
      pow($"l_quantity", 2).as("qty_sq"),
      abs($"l_discount" - 0.05).as("disc_dev"),
      greatest($"l_tax", $"l_discount").as("max_rate"),
      least($"l_tax", $"l_discount").as("min_rate"),
      floor($"l_extendedprice" / 1000).cast("long").as("price_k"),
      ceil($"l_extendedprice" / 1000).cast("long").as("price_k_up"),
      sqrt($"l_quantity").as("qty_sqrt"))
  }

  /** F-array family over embeddings + tokenized text (higher-order fns).
    * Array-valued intermediates (slice) are probed down to scalars in the
    * final projection: the driver's canonicalizer sorts every output
    * column and cannot hash array cells, and scalar floats hash
    * bit-identically across engines where decimal renderings would not. */
  def fArray(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embeddings(spark, dir).select($"vec_id",
      size($"embedding").cast("long").as("dim"),
      element_at($"embedding", 1).as("first_elem"),
      element_at(slice($"embedding", 1, 3), 3).as("head3_last"),
      aggregate($"embedding", lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq_norm"),
      array_contains(sequence(lit(0L), $"vec_id" % 10), lit(3L)).as("has_3"))
  }

  /** F-string (extended): split_part/left/right/ascii/chr/repeat. */
  def fString2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).select($"doc_id",
      expr("split_part(source, 'c', 2)").as("after_c"),
      expr("left(text, 8)").as("l8"),
      expr("right(text, 8)").as("r8"),
      ascii($"source").cast("long").as("first_code"),
      expr("char(65 + cast(doc_id % 26 as int))").as("letter"),
      expr("repeat(lang, 3)").as("lang3"))
  }

  /** F-date (extended): add_months/trunc/quarter/weekofyear. */
  def fDate2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).select($"event_id",
      add_months(to_date($"ts"), 1).as("next_month"),
      trunc(to_date($"ts"), "month").as("month_start"),
      months_between(trunc(to_date($"ts"), "month"),
        lit("2023-01-01").cast("date")).as("months_since"),
      quarter($"ts").cast("long").as("q"),
      weekofyear($"ts").cast("long").as("iso_week"))
  }

  /** F-array (extended): exists/forall/filter/array_max/array_min HOFs. */
  def fArray2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embeddings(spark, dir).select($"vec_id",
      size(filter($"embedding", x => x > 0)).cast("long").as("n_pos"),
      exists($"embedding", x => abs(x) > lit(0.3f)).as("has_big"),
      forall($"embedding", x => abs(x) < lit(1.0f)).as("all_small"),
      array_max($"embedding").as("max_elem"),
      array_min($"embedding").as("min_elem"))
  }

  /** F-array (set ops): array_intersect/except/union with canonical
    * (sorted, distinct, '|'-joined) rendering so both engines agree on
    * order AND the driver canonicalizer gets a hashable string cell. */
  def fArraySetops(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = array(graft.functions.Text.stopwordsEn.map(lit): _*)
    val t = split($"text", " ")
    documents(spark, dir).filter($"doc_id" < 200).select($"doc_id",
      array_join(array_sort(array_intersect(t, stop)), "|").as("stop_present"),
      size(array_except(t, stop)).cast("long").as("n_nonstop_distinct"),
      size(array_union(t, stop)).cast("long").as("n_union_distinct"))
  }

  /** Seeded sampling (rows-only: engine RNG streams differ by design). */
  def oSampleSeeded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir).sample(withReplacement = false, 0.1, seed = 42L)
      .select($"doc_id", $"source")
  }

  /** F-json/array (extended): json_tuple, to_json, map_values, flatten. */
  def fJson2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir)
      .select($"event_id", $"props", $"user_id",
        from_json($"props", org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"))
      .select($"event_id",
        json_tuple($"props", "k").as("k_jt"),
        to_json(struct($"event_id", $"user_id")).as("as_json"),
        element_at(map_values($"m"), 1).cast("long").as("first_val"))
  }

  /** F-array (flatten): rebuilding a vector from its halves. The full
    * array equality is asserted in-engine (`roundtrips`); the cross-engine
    * check probes scalars because the driver canonicalizer can't hash
    * array cells. */
  def fArrayFlatten(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rebuilt = flatten(array(slice($"embedding", 1, 32), slice($"embedding", 33, 32)))
    embeddings(spark, dir).filter($"vec_id" < 100).select($"vec_id",
      size(rebuilt).cast("long").as("rebuilt_dim"),
      element_at(rebuilt, 1).as("rebuilt_first"),
      element_at(rebuilt, 64).as("rebuilt_last"),
      (rebuilt === $"embedding").as("roundtrips"))
  }

  /** A8b: exact interpolated percentiles (linear, matches quantile_cont). */
  def a8Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        min($"value").as("p0"), max($"value").as("p100"))
      .orderBy($"event_type")
  }

  /** F-stat family: dispersion/association aggregates (stddev/variance/
    * corr/covar). Rounded to 4dp on both sides: the one-pass merge order
    * differs between engines, so raw doubles can differ in the last ulps
    * while agreeing to any printable precision. */
  def fStat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir).groupBy($"l_returnflag")
      .agg(round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
        round(var_samp($"l_quantity"), 4).as("var_qty"),
        round(stddev_pop($"l_discount"), 4).as("sdp_disc"),
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"),
        round(covar_pop($"l_quantity", $"l_discount"), 4).as("covp_qty_disc"))
      .orderBy($"l_returnflag")
  }

  /** A8c: approximate percentiles (t-digest-style sketch; rows-only — the
    * sketch has no DuckDB analog). Accuracy vs the exact interpolated
    * percentile is bounded in ExtractionSpec. */
  def a8ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    events(spark, dir).groupBy($"event_type")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("ap50"),
        expr("approx_percentile(value, 0.9, 1000)").as("ap90"))
      .orderBy($"event_type")
  }

  /** F-cond family: case/nullif/coalesce (:270-294,:415-420,:110-116). */
  def fCond(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    orders(spark, dir).select($"o_orderkey",
      when($"o_orderstatus" === "F", "done")
        .when($"o_orderstatus" === "O", "open")
        .otherwise("other").as("status_label"),
      coalesce(nullif($"o_orderpriority", lit("3-MEDIUM")), lit("MED")).as("prio"),
      expr("nvl(nullif(o_orderstatus, 'P'), 'PENDING')").as("status_nvl"))
  }

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_regex_fallback" -> (p1RegexFallback _),
    "p2_date_fallback" -> (p2DateFallback _),
    "p3_struct_extract" -> (p3StructExtract _),
    "p4_extract_all" -> (p4ExtractAll _),
    "p5_rlike_validate" -> (p5RlikeValidate _),
    "p7_eq_default" -> (p7EqDefault _),
    "p8_suffix_filter" -> (p8SuffixFilter _),
    "p9_null_filter" -> (p9NullFilter _),
    "p10_sanitize" -> (p10Sanitize _),
    "p11_translate" -> (p11Translate _),
    "p12_trim" -> (p12Trim _),
    "p13_default" -> (p13Default _),
    "p14_url_basename" -> (p14UrlBasename _),
    "p15_url_cleanup" -> (p15UrlCleanup _),
    "p16_concat" -> (p16Concat _),
    "p17_md5" -> (p17Md5 _),
    "f_hash_native" -> (fHashNative _),
    "p18_json_prune" -> (p18JsonPrune _),
    "p19_try_surface" -> (p19TrySurface _),
    "f_variant" -> (fVariant _),
    "s10_mime_dispatch" -> (s10MimeDispatch _),
    "f_string" -> (fString _),
    "f_string2" -> (fString2 _),
    "f_date" -> (fDate _),
    "f_date2" -> (fDate2 _),
    "f_array2" -> (fArray2 _),
    "f_array_setops" -> (fArraySetops _),
    "f_json2" -> (fJson2 _),
    "f_array_flatten" -> (fArrayFlatten _),
    "o_sample_seeded" -> (oSampleSeeded _),
    "a8_percentiles" -> (a8Percentiles _),
    "f_math" -> (fMath _),
    "f_array" -> (fArray _),
    "f_cond" -> (fCond _),
    "f_stat" -> (fStat _),
    "a8_approx_percentiles" -> (a8ApproxPercentiles _)
  )

  val oracle: Map[String, String] = Map(
    "p1_regex_fallback" -> (corpusSql +
      s"""SELECT doc_id,
         |COALESCE(NULLIF(regexp_extract(html, '$sqlIdA', 1), ''),
         |         NULLIF(regexp_extract(html, '$sqlIdB', 1), '')) AS manifest_id
         |FROM corpus""".stripMargin),
    "p2_date_fallback" -> (corpusSql +
      s"""SELECT doc_id,
         |COALESCE(NULLIF(regexp_extract(html, '$sqlDateTag', 1), ''),
         |         NULLIF(regexp_extract(html, '$sqlDateTitle', 1), ''),
         |         NULLIF(regexp_extract(html, '$sqlFnDate', 1) || '-' ||
         |                regexp_extract(html, '$sqlFnDate', 2) || '-' ||
         |                regexp_extract(html, '$sqlFnDate', 3), '--'),
         |         'Unknown_Date') AS pub_date
         |FROM corpus""".stripMargin),
    "p3_struct_extract" -> (corpusSql +
      s"""SELECT doc_id,
         |NULLIF(trim(regexp_extract(html, '$sqlTitlePat', 1)), '') AS paper,
         |NULLIF(regexp_extract(html, '$sqlDateTitle', 1), '') AS pdate
         |FROM corpus""".stripMargin),
    "p4_extract_all" -> (corpusSql +
      s"""SELECT DISTINCT doc_id, unnest(regexp_extract_all(html, '$sqlFindall')) AS fname
         |FROM corpus""".stripMargin),
    "p5_rlike_validate" -> (corpusSql +
      s"""SELECT doc_id, pub_date,
         |regexp_matches(pub_date, '^[0-9]{4}-[0-9]{2}-[0-9]{2}$$') AS is_valid
         |FROM (SELECT doc_id,
         |  COALESCE(NULLIF(regexp_extract(html, '$sqlDateTag', 1), ''),
         |           NULLIF(regexp_extract(html, '$sqlDateTitle', 1), ''),
         |           NULLIF(regexp_extract(html, '$sqlFnDate', 1) || '-' ||
         |                  regexp_extract(html, '$sqlFnDate', 2) || '-' ||
         |                  regexp_extract(html, '$sqlFnDate', 3), '--'),
         |           'Unknown_Date') AS pub_date FROM corpus)""".stripMargin),
    "p7_eq_default" -> "SELECT doc_id, lang FROM documents WHERE lang = 'en'",
    "p8_suffix_filter" ->
      s"""SELECT doc_id, file_name FROM ($fileNamesSql)
         |WHERE lower(file_name) LIKE '%.jp2'""".stripMargin,
    "p9_null_filter" -> (corpusSql +
      s"""SELECT doc_id,
         |COALESCE(NULLIF(regexp_extract(html, '$sqlIdA', 1), ''),
         |         NULLIF(regexp_extract(html, '$sqlIdB', 1), '')) AS manifest_id
         |FROM corpus
         |WHERE COALESCE(NULLIF(regexp_extract(html, '$sqlIdA', 1), ''),
         |               NULLIF(regexp_extract(html, '$sqlIdB', 1), '')) IS NOT NULL""".stripMargin),
    "p10_sanitize" ->
      """SELECT doc_id, 'Paper #' || source || '!' AS raw_title,
        |regexp_replace('Paper #' || source || '!', '[^\w\s-]', '', 'g') AS clean_title
        |FROM documents""".stripMargin,
    "p11_translate" -> (corpusSql +
      """SELECT doc_id, translate(iso, '-', '/') AS slashed,
        |translate(translate(iso, '-', '/'), '/', '-') AS dashed
        |FROM corpus""".stripMargin),
    "p12_trim" ->
      """SELECT doc_id, trim('  ' || source || '  ') AS trimmed,
        |ltrim('  ' || source || '  ') AS l, rtrim('  ' || source || '  ') AS r
        |FROM documents""".stripMargin,
    "p13_default" ->
      """SELECT doc_id,
        |COALESCE(CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END, 'Unknown') AS lang_or_default
        |FROM documents""".stripMargin,
    "p14_url_basename" -> (corpusSql +
      """SELECT doc_id, 'https://data.kb.se/some%20dir/' || fn1 AS url,
        |(string_split(replace('https://data.kb.se/some%20dir/' || fn1, '%20', ' '), '/'))[-1] AS base_name
        |FROM corpus""".stripMargin),
    "p15_url_cleanup" -> (corpusSql +
      """SELECT doc_id,
        |replace('https://data.kb.se/' || fn1, '/', '\/') AS messy,
        |'https://data.kb.se/' || fn1 AS clean
        |FROM corpus""".stripMargin),
    "p16_concat" -> (corpusSql +
      """SELECT doc_id, 'https://data.kb.se/' || mid || '/manifest' AS manifest_url,
        |printf('https://tidningar.kb.se/search?q=%s&from=%s', source, iso) AS search_url
        |FROM corpus""".stripMargin),
    "p17_md5" ->
      "SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex FROM documents",
    "p18_json_prune" ->
      """SELECT event_id,
        |CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k_str,
        |CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k_parsed
        |FROM events""".stripMargin,
    "f_variant" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k_long,
        |  regexp_extract(props, '"k": (-?[0-9]+)', 1) AS k_str,
        |  CAST(NULL AS BIGINT) AS absent_long,
        |  'OBJECT<k: BIGINT>' AS v_schema
        |FROM events""".stripMargin,
    "p19_try_surface" ->
      """SELECT o_orderkey,
        |  CAST(o_totalprice AS DOUBLE) / CAST(o_orderkey % 3 AS DOUBLE) AS per_bucket,
        |  CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_orderkey END AS mixed_num,
        |  CASE WHEN o_orderkey % 50 = 0 THEN NULL
        |       ELSE 9223372036854775801 END AS near_overflow
        |FROM orders""".stripMargin,
    "s10_mime_dispatch" ->
      s"""SELECT doc_id, file_name,
         |CASE WHEN lower(file_name) LIKE '%.jp2' THEN 'image/jp2'
         |     WHEN lower(file_name) LIKE '%.jpeg' OR lower(file_name) LIKE '%.jpg' THEN 'image/jpeg'
         |     ELSE 'application/octet-stream' END AS mime
         |FROM ($fileNamesSql)""".stripMargin,
    "f_string" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_len,
        |upper(source) AS src_up, lower(source) AS src_lo,
        |substr(text, 1, 12) AS head12,
        |lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
        |CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
        |contains(text, 'spark') AS has_spark,
        |starts_with(source, 'src1') AS is_src1x,
        |ends_with(text, 'e') AS ends_e,
        |reverse(source) AS src_rev,
        |source || '|' || lang AS joined
        |FROM documents""".stripMargin,
    "f_string2" ->
      """SELECT doc_id,
        |split_part(source, 'c', 2) AS after_c,
        |left(text, 8) AS l8, right(text, 8) AS r8,
        |CAST(ascii(source) AS BIGINT) AS first_code,
        |chr(65 + CAST(doc_id % 26 AS INTEGER)) AS letter,
        |repeat(lang, 3) AS lang3
        |FROM documents""".stripMargin,
    "f_date2" ->
      """SELECT event_id,
        |CAST(CAST(date_trunc('day', ts) AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
        |CAST(date_trunc('month', ts) AS DATE) AS month_start,
        |CAST((year(ts) - 2023) * 12 + month(ts) - 1 AS DOUBLE) AS months_since,
        |CAST(quarter(ts) AS BIGINT) AS q,
        |CAST(week(ts) AS BIGINT) AS iso_week
        |FROM events""".stripMargin,
    "f_array2" ->
      """SELECT vec_id,
        |CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |len(list_filter(embedding, x -> abs(x) > 0.3)) > 0 AS has_big,
        |len(list_filter(embedding, x -> abs(x) >= 1.0)) = 0 AS all_small,
        |list_aggregate(embedding, 'max') AS max_elem,
        |list_aggregate(embedding, 'min') AS min_elem
        |FROM embeddings""".stripMargin,
    "f_json2" ->
      """SELECT event_id,
        |regexp_extract(props, '"k": (-?[0-9]+)', 1) AS k_jt,
        |printf('{"event_id":%d,"user_id":%d}', event_id, user_id) AS as_json,
        |CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS first_val
        |FROM events""".stripMargin,
    "f_array_flatten" ->
      """SELECT vec_id,
        |CAST(len(flatten([embedding[1:32], embedding[33:64]])) AS BIGINT) AS rebuilt_dim,
        |(flatten([embedding[1:32], embedding[33:64]]))[1] AS rebuilt_first,
        |(flatten([embedding[1:32], embedding[33:64]]))[64] AS rebuilt_last,
        |flatten([embedding[1:32], embedding[33:64]]) = embedding AS roundtrips
        |FROM embeddings WHERE vec_id < 100""".stripMargin,
    "f_array_setops" ->
      """SELECT doc_id,
        |COALESCE(array_to_string(list_sort(list_distinct(list_filter(string_split(text,' '),
        |  x -> x IN ('the','a','of','and','in','to')))), '|'), '') AS stop_present,
        |CAST(len(list_distinct(list_filter(string_split(text,' '),
        |  x -> x NOT IN ('the','a','of','and','in','to')))) AS BIGINT) AS n_nonstop_distinct,
        |CAST(len(list_distinct(string_split(text,' ') || ['the','a','of','and','in','to'])) AS BIGINT) AS n_union_distinct
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "a8_percentiles" ->
      """SELECT event_type,
        |quantile_cont(value, 0.5) AS p50, quantile_cont(value, 0.9) AS p90,
        |min(value) AS p0, max(value) AS p100
        |FROM events GROUP BY event_type""".stripMargin,
    "f_date" ->
      """SELECT event_id,
        |CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
        |CAST(day(ts) AS BIGINT) AS dom, CAST(isodow(ts) - 1 AS BIGINT) AS wd,
        |CAST(date_trunc('day', ts) AS DATE) + 1 AS next_day,
        |last_day(CAST(date_trunc('day', ts) AS DATE)) AS month_end,
        |CAST(date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS days_in,
        |CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |strftime(ts, '%Y-%m-%d %H:%M') AS fmt
        |FROM events""".stripMargin,
    "f_math" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice / l_quantity AS unit_price,
        |round(sqrt(l_quantity) * 1000, 2) AS sqrt_rounded,
        |pow(l_quantity, 2) AS qty_sq,
        |abs(l_discount - 0.05) AS disc_dev,
        |greatest(l_tax, l_discount) AS max_rate,
        |least(l_tax, l_discount) AS min_rate,
        |CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
        |CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_up,
        |sqrt(l_quantity) AS qty_sqrt
        |FROM lineitem""".stripMargin,
    "f_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |embedding[1] AS first_elem,
        |(embedding[1:3])[3] AS head3_last,
        |list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS sq_norm,
        |list_contains(generate_series(0, vec_id % 10), 3) AS has_3
        |FROM embeddings""".stripMargin,
    "f_cond" ->
      """SELECT o_orderkey,
        |CASE WHEN o_orderstatus = 'F' THEN 'done' WHEN o_orderstatus = 'O' THEN 'open'
        |     ELSE 'other' END AS status_label,
        |COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'MED') AS prio,
        |COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_nvl
        |FROM orders""".stripMargin,
    "f_stat" ->
      """SELECT l_returnflag,
        |round(stddev_samp(l_quantity), 4) AS sd_qty,
        |round(var_samp(l_quantity), 4) AS var_qty,
        |round(stddev_pop(l_discount), 4) AS sdp_disc,
        |round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |round(covar_pop(l_quantity, l_discount), 4) AS covp_qty_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
