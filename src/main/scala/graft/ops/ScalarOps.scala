package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function packs (SURVEY.md §2.3 "scalar:*" + "conditional";
  * reference D9-D14 string/array chain, D19 when/otherwise, date paths at
  * 01_classification_pipeline.py:21).
  *
  * Everything here is a builtin column expression → whole-stage codegen,
  * no UDFs on the hot path (100 TB rule). Oracle SQL is written in DuckDB's
  * dialect where names differ (strftime, list_*, json_extract_string, ln).
  */
object ScalarOps extends graft.QueryModule {

  /** String pack: lower/upper/trim/length/substring/concat_ws/
    * regexp_extract/regexp_replace/split-size. */
  def stringPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.part(spark, sfDir)
      .select($"p_partkey",
        lower($"p_name").as("lo"),
        upper($"p_brand").as("up"),
        length($"p_name").as("len"),
        substring($"p_name", 1, 5).as("sub5"),
        concat_ws("|", $"p_name", $"p_type").as("joined"),
        regexp_extract($"p_brand", "#(\\d+)", 1).as("brand_num"),
        regexp_replace($"p_name", "\\s+", "_").as("snake"),
        size(split($"p_name", " ")).as("n_words"))
      .orderBy($"p_partkey")
  }

  /** Date/time pack on orders (D2 epoch window, MM-dd-yyyy paths). */
  def datePack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        date_format($"o_orderdate", "MM-dd-yyyy").as("mdy"),
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        date_format(date_add($"o_orderdate", 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate").as("days_to_2002"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  /** Math pack on part. ln is rounded to 6dp before compare (libm parity). */
  def mathPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.part(spark, sfDir)
      .select($"p_partkey",
        abs($"p_size" - 25).as("abs_off"),
        ceil($"p_retailprice").as("ceil_price"),
        floor($"p_retailprice").as("floor_price"),
        pmod($"p_partkey", lit(7)).as("mod7"),
        round(sqrt($"p_size"), 6).as("sqrt_size"),
        round(log($"p_retailprice"), 6).as("ln_price"))
      .orderBy($"p_partkey")
  }

  /** Array pack over whitespace tokens of documents.text (D10-D14 family). */
  def arrayPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_unique"),
        array_contains($"toks", "spark").as("has_spark"),
        size(filter($"toks", t => length(t) > 4)).as("n_long"),
        array_join(transform(slice($"toks", 1, 3), t => upper(t)), " ")
          .as("first3_upper"))
      .orderBy($"doc_id")
  }

  /** JSON pack on events.props (north-star multimodal metadata; §7.3-7). */
  def jsonPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"),
        get_json_object($"props", "$.missing").as("absent"))
      .orderBy($"event_id")
  }

  /** Map/struct JSON pack: from_json with explicit schemas (§7.3-7 —
    * events.props is a JSON string) — struct field access + map_keys. */
  def mapPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .withColumn("st", from_json($"props", lit("k INT")))
      .withColumn("m", from_json($"props", lit("map<string,string>")))
      .select($"event_id",
        $"st.k".as("k_typed"),
        array_join(map_keys($"m"), ",").as("keys_csv"),
        size(map_keys($"m")).as("n_keys"))
      .orderBy($"event_id")
  }

  /** Conditional pack: when/otherwise chain (D19), coalesce/nullif (D8). */
  def conditionalPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .select($"event_id",
        when($"event_type" === "purchase", "buy")
          .when($"event_type" === "signup", "join")
          .otherwise("other").as("kind"),
        coalesce(nullif($"event_type", lit("error")), lit("(err)")).as("nn"),
        when($"value" > 100, $"value").otherwise(lit(0.0)).as("big_value"))
      .orderBy($"event_id")
  }

  /** Bitwise scalar pack: and/xor/shifts/popcount on key columns. All
    * outputs pinned to BIGINT on both sides (DuckDB's bit_count returns a
    * narrow int; the driver hash-compares typed values). */
  def bitwisePack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        $"o_orderkey".bitwiseAND(lit(255L)).as("key_and"),
        $"o_orderkey".bitwiseXOR($"o_custkey").as("key_xor"),
        shiftleft($"o_orderkey", 2).as("key_shl"),
        shiftright($"o_orderkey", 3).as("key_shr"),
        bit_count($"o_orderkey").cast("long").as("key_bits"))
      .orderBy($"o_orderkey")
  }

  /** ANSI-safe arithmetic pack: try_divide / TRY_CAST degrade to NULL
    * instead of throwing — the error-tolerant spelling a pipeline
    * needs when ANSI mode is on (Spark 4 default) and a poison row
    * must not kill a 100 TB job. Division-by-zero and malformed
    * numeric text land as NULLs the downstream quarantine counts
    * (same philosophy as the PERMISSIVE corrupt-record scan). DuckDB
    * twin: TRY_CAST + NULLIF, the portable equivalents. */
  def tryArith(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .withColumn("maybe_num",
        when($"event_type" === "error", lit("oops"))
          .otherwise(round($"value", 2).cast("string")))
      .select($"event_id",
        try_divide($"value", pmod($"user_id", lit(7))).as("per_bucket"),
        expr("try_cast(maybe_num AS DOUBLE)").as("parsed_value"),
        try_divide(lit(1.0), $"value" - $"value").as("div_zero"))
      .orderBy($"event_id")
  }

  /** URL parse/normalize pack — the web-crawl pipeline primitive
    * (CCNet/RefinedWeb-style: extract host, strip www + fragment,
    * registered-domain key for per-domain caps and blocklist joins).
    * The fixture has no URL column, so one is DERIVED deterministically
    * from (source, lang, doc_id) — same discipline as the domain-mix
    * config dim — exercising the variants that break naive parsers: a
    * www. prefix (doc_id%3), an explicit port (%5, which HOST must
    * exclude), a fragment (%2, which QUERY must exclude). Extraction is
    * Spark's native `parse_url` (codegen'd, java.net.URI semantics);
    * the canonical key `norm` drops protocol-irrelevant parts
    * (www, port, query, fragment) — the dedup key a crawl pipeline
    * groups by. DuckDB twin: anchored regexps over the same derived
    * URL. Pure per-row expressions: one narrow map at any scale. */
  def urlPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .withColumn("url", concat(
        lit("https://"),
        when(pmod($"doc_id", lit(3)) === 0, "www.").otherwise(""),
        $"source", lit(".example.com"),
        when(pmod($"doc_id", lit(5)) === 0, ":8080").otherwise(""),
        lit("/"), $"lang", lit("/doc-"), $"doc_id",
        lit("?ref="), $"source", lit("&page="), pmod($"doc_id", lit(7)),
        when(pmod($"doc_id", lit(2)) === 0, "#top").otherwise("")))
      .select($"doc_id", $"url",
        parse_url($"url", lit("PROTOCOL")).as("protocol"),
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY")).as("query"),
        parse_url($"url", lit("REF")).as("frag"),
        parse_url($"url", lit("QUERY"), lit("page")).as("page"),
        regexp_replace(parse_url($"url", lit("HOST")), "^www\\.", "")
          .as("domain"),
        substring_index(parse_url($"url", lit("HOST")), ".", -1).as("tld"),
        concat(regexp_replace(parse_url($"url", lit("HOST")), "^www\\.", ""),
          parse_url($"url", lit("PATH"))).as("norm"))
      .orderBy($"doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_url" -> (urlPack _),
    "q_scalar_try_arith" -> (tryArith _),
    "q_scalar_bitwise" -> (bitwisePack _),
    "q_scalar_string" -> (stringPack _),
    "q_scalar_date" -> (datePack _),
    "q_scalar_math" -> (mathPack _),
    "q_scalar_array" -> (arrayPack _),
    "q_scalar_json" -> (jsonPack _),
    "q_scalar_map" -> (mapPack _),
    "q_scalar_conditional" -> (conditionalPack _))

  def oracle: Map[String, String] = Map(
    "q_scalar_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
        |    source || '.example.com' ||
        |    CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END ||
        |    '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) ||
        |    '?ref=' || source || '&page=' || CAST(doc_id % 7 AS VARCHAR) ||
        |    CASE WHEN doc_id % 2 = 0 THEN '#top' ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
        |    regexp_extract(url, '^https://([^/:?#]+)', 1) AS host,
        |    regexp_extract(url, '^https://[^/?#]+(/[^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query,
        |    CASE WHEN url LIKE '%#%'
        |         THEN regexp_extract(url, '#(.*)$', 1) END AS frag,
        |    regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page
        |  FROM u)
        |SELECT doc_id, url, protocol, host, path, query, frag, page,
        |  regexp_replace(host, '^www\.', '') AS domain,
        |  regexp_extract(host, '([^.]+)$', 1) AS tld,
        |  regexp_replace(host, '^www\.', '') || path AS norm
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_scalar_try_arith" ->
      """SELECT event_id,
        |  value / NULLIF(user_id % 7, 0) AS per_bucket,
        |  TRY_CAST(CASE WHEN event_type = 'error' THEN 'oops'
        |                ELSE CAST(round(value, 2) AS VARCHAR) END
        |           AS DOUBLE) AS parsed_value,
        |  1.0 / NULLIF(value - value, 0) AS div_zero
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS key_and,
        |  xor(o_orderkey, o_custkey) AS key_xor,
        |  o_orderkey << 2 AS key_shl,
        |  o_orderkey >> 3 AS key_shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS key_bits
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_brand) AS up,
        |  length(p_name) AS len, substring(p_name, 1, 5) AS sub5,
        |  concat_ws('|', p_name, p_type) AS joined,
        |  regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |  regexp_replace(p_name, '\s+', '_', 'g') AS snake,
        |  len(string_split(p_name, ' ')) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%m-%d-%Y') AS mdy,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
        |  datediff('day', o_orderdate, DATE '2002-01-01') AS days_to_2002,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_scalar_math" ->
      """SELECT p_partkey,
        |  abs(p_size - 25) AS abs_off,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |  p_partkey % 7 AS mod7,
        |  round(sqrt(p_size), 6) AS sqrt_size,
        |  round(ln(p_retailprice), 6) AS ln_price
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_array" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_unique,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long,
        |  array_to_string(list_transform(string_split(text, ' ')[1:3],
        |                                 t -> upper(t)), ' ') AS first3_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scalar_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_map" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
        |  array_to_string(json_keys(props), ',') AS keys_csv,
        |  len(json_keys(props)) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_conditional" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'purchase' THEN 'buy'
        |       WHEN event_type = 'signup' THEN 'join'
        |       ELSE 'other' END AS kind,
        |  COALESCE(NULLIF(event_type, 'error'), '(err)') AS nn,
        |  CASE WHEN value > 100 THEN value ELSE 0.0 END AS big_value
        |FROM events ORDER BY event_id""".stripMargin)
}
