"""Scalar function batteries (SURVEY.md §2.8): string/regex/date/math/
conditional/hash/array/map/json/cast — several functions per query.

All built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage
codegen; no Python in the hot path. Spark↔DuckDB semantic drift
(datediff arg order, map subscript, epoch type, libm last-ulp) is
resolved in the ORACLE SQL, never by weakening the engine
(SURVEY.md §7 M4 conventions).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_lineage_spark.registry import query
from spark_lineage_spark.tables import load, register_views


@query(
    "fn_string_battery",
    "§2.8 string functions",
    """
    SELECT p_partkey,
           concat(p_brand, ':', upper(p_name)) AS brand_name,
           lower(p_type) AS type_lc,
           substr(p_name, 1, 5) AS name5,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           rpad(p_brand, 10, '.') AS brand_pad,
           replace(p_name, ' ', '_') AS name_us,
           len(string_split(p_name, ' ')) AS n_words,
           split_part(p_name, ' ', 2) AS second_word,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           levenshtein(p_name, 'small ring') AS lev,
           translate(p_brand, '#', '-') AS brand_dash,
           repeat(substr(p_name, 1, 2), 2) AS rep2
    FROM part
    """,
)
def fn_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE sql() text (optimization r14, guide §7.3): identical
    # expressions, built JVM-side in a single py4j round-trip.
    from spark_lineage_spark.tables import table_path

    return spark.sql(f"""
        SELECT p_partkey,
               concat_ws(':', p_brand, upper(p_name)) AS brand_name,
               lower(p_type) AS type_lc,
               substring(p_name, 1, 5) AS name5,
               length(p_name) AS name_len,
               lpad(CAST(p_size AS STRING), 4, '0') AS size_pad,
               rpad(p_brand, 10, '.') AS brand_pad,
               replace(p_name, ' ', '_') AS name_us,
               size(split(p_name, ' ')) AS n_words,
               split_part(p_name, ' ', 2) AS second_word,
               trim(concat('  ', p_name, '  ')) AS trimmed,
               levenshtein(p_name, 'small ring') AS lev,
               translate(p_brand, '#', '-') AS brand_dash,
               repeat(substring(p_name, 1, 2), 2) AS rep2
        FROM parquet.`{table_path(sf_dir, "part")}`
    """)


@query(
    "fn_regex_battery",
    "§2.8 regexp_extract / regexp_replace / [i]like / rlike",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
           (p_name LIKE '%bolt%') AS has_bolt,
           (p_name ILIKE '%RING%') AS has_ring_ci,
           regexp_matches(p_brand, '#1?[0-9]$') AS brand_rx
    FROM part
    """,
)
def fn_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Java vs RE2-ish dialect drift: patterns here use the common
    subset (char classes, groups, anchors)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("noun"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").like("%bolt%").alias("has_bolt"),
        F.col("p_name").ilike("%RING%").alias("has_ring_ci"),
        F.col("p_brand").rlike("#1?[0-9]$").alias("brand_rx"),
    )


@query(
    "fn_datetime_battery",
    "§2.8 date/time functions",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 30 DAY, '%Y-%m-%d') AS minus30,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS od,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(make_date(year(o_orderdate), month(o_orderdate), 1), '%Y-%m-%d') AS first_of_month,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def fn_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB drift handled in oracle: datediff arg order is
    (end, start) in Spark vs date_diff('day', start, end); DATE +
    INTERVAL returns TIMESTAMP in DuckDB (cast back); epoch() returns
    DOUBLE (cast to BIGINT). DATE-typed result columns are formatted
    to ISO strings on both sides — Spark hands pandas datetime.date
    while DuckDB hands datetime64, which value-hash as different
    strings even when equal."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    iso = "yyyy-MM-dd"
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_format(F.date_add(od, 7), iso).alias("plus7"),
        F.date_format(F.date_sub(od, 30), iso).alias("minus30"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format(od, iso).alias("od"),
        F.date_format(F.last_day(od), iso).alias("month_end"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)), iso
        ).alias("first_of_month"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "fn_math_battery",
    "§2.8 math functions",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 200000.0) AS dist200k,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
           round(sqrt(o_totalprice), 8) AS sqrt_p,
           round(exp(o_totalprice / 1000000.0), 10) AS exp_small,
           round(ln(o_totalprice), 10) AS ln_p,
           pow(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS pow2,
           o_orderkey % 7 AS mod7,
           CAST(sign(o_totalprice - 200000.0) AS DOUBLE) AS sgn,
           o_totalprice / nullif(CAST(o_custkey % 3 AS DOUBLE), 0.0) AS try_div
    FROM orders
    """,
)
def fn_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """libm last-ulp drift (exp/ln) is bounded by rounding to 8-10
    digits; sqrt/pow-of-2 are IEEE-exact. try_divide ≡ x/NULLIF(y,0)
    under ANSI (division by zero would otherwise raise). Result-type
    drift fixed in oracle: DuckDB ceil/floor return DOUBLE (Spark:
    BIGINT) and sign returns TINYINT (Spark signum: DOUBLE)."""
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(tp - 200000.0).alias("dist200k"),
        F.ceil(tp / 1000.0).alias("price_k_ceil"),
        F.floor(tp / 1000.0).alias("price_k_floor"),
        F.round(F.sqrt(tp), 8).alias("sqrt_p"),
        F.round(F.exp(tp / 1000000.0), 10).alias("exp_small"),
        F.round(F.log(tp), 10).alias("ln_p"),
        F.pow(F.lit(2.0), (F.col("o_orderkey") % 10).cast("double")).alias("pow2"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.signum(tp - 200000.0).alias("sgn"),
        F.try_divide(tp, (F.col("o_custkey") % 3).cast("double")).alias("try_div"),
    )


@query(
    "fn_conditional_battery",
    "§2.8 CASE WHEN / coalesce / nullif / greatest / least",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000.0 THEN 'big'
                WHEN o_totalprice > 150000.0 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           greatest(o_totalprice, 250000.0) AS at_least_250k,
           least(CAST(o_custkey AS BIGINT), CAST(o_orderkey % 1000 AS BIGINT)) AS small_key
    FROM orders
    """,
)
def fn_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000.0, "big")
        .when(F.col("o_totalprice") > 150000.0, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_filled"
        ),
        F.greatest("o_totalprice", F.lit(250000.0)).alias("at_least_250k"),
        F.least(F.col("o_custkey"), F.col("o_orderkey") % 1000).alias("small_key"),
    )


@query(
    "fn_hash_portable",
    "§2.8 md5 / sha2-256 (cross-engine hashes)",
    """
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256
    FROM customer
    """,
)
def fn_hash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("name_sha256"),
    )


@query("fn_string_spark_native", "§2.8 soundex / initcap / sentences — rows-only", None)
def fn_string_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions with no DuckDB equivalent (SURVEY §2.8 notes:
    soundex, sentences tokenizer differ) — deterministic within Spark."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.soundex("p_name").alias("name_soundex"),
        F.initcap("p_name").alias("name_title"),
        F.array_join(F.flatten(F.sentences(F.col("p_name"))), "|").alias("sentence_words"),
    )


@query("fn_hash_spark_native", "§2.8 crc32 / xxhash64 / murmur hash — rows-only", None)
def fn_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-specific hash functions (fixed seed 42) — deterministic
    within Spark, no DuckDB equivalent (SURVEY §2.8)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
        F.xxhash64("c_name").alias("name_xxh64"),
        F.hash("c_name").alias("name_murmur"),
    )


@query(
    "fn_array_battery",
    "§2.8 array ops + higher-order functions (on embeddings)",
    """
    SELECT vec_id,
           len(embedding) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS e0,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum_emb,
           round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                             (a, x) -> a + x), 6) AS norm_sq,
           CAST(list_sort(embedding)[64] AS DOUBLE) AS max_comp,
           list_contains(list_transform(embedding, x -> x > 0.5), true) AS any_big
    FROM embeddings
    """,
)
def fn_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order fns (transform/filter/aggregate/zip_with) run
    JVM-side per-element — no UDF. float32 components are cast to
    double before arithmetic so both engines accumulate in float64."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("e0"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x), 6).alias("sum_emb"),
        F.round(
            F.aggregate(
                F.zip_with(emb_d, emb_d, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("norm_sq"),
        F.element_at(F.sort_array("embedding"), 64).cast("double").alias("max_comp"),
        F.exists(F.col("embedding"), lambda x: x > 0.5).alias("any_big"),
    )


@query(
    "fn_array_explode",
    "§2.8 explode / posexplode",
    """
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS comp
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "comp")
    ).withColumn("comp", F.col("comp").cast("double"))


@query(
    "fn_map_battery",
    "§2.8 map construction and access",
    """
    SELECT c_custkey,
           array_to_string(map_keys(MAP {'segment': c_mktsegment, 'name': c_name}), ',') AS ks,
           (MAP {'segment': c_mktsegment, 'name': c_name})['segment'][1] AS seg,
           round(CAST((MAP {'bal': c_acctbal})['bal'][1] AS DOUBLE), 2) AS bal
    FROM customer
    """,
)
def fn_map_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB drift: map subscript returns a LIST — oracle unwraps
    with [1]. Spark map keys keep insertion order; both orders here
    are fixed literals so array_to_string agrees."""
    c = load(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("segment"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.element_at(m, "segment").alias("seg"),
        F.round(F.element_at(F.create_map(F.lit("bal"), F.col("c_acctbal")), "bal"), 2).alias(
            "bal"
        ),
    )


@query(
    "fn_json_battery",
    "§2.8 JSON extraction (events.props)",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           json_extract_string(props, '$.missing') AS missing
    FROM events
    """,
)
def fn_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@query(
    "fn_rounding_modes",
    "§2.8 round (half-up) vs bround (banker's)",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_quantity / 2, 0) AS half_up,
           round_even(l_quantity / 2, 0) AS half_even
    FROM lineitem WHERE l_quantity = floor(l_quantity)
    """,
)
def fn_rounding_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HALF_UP (round) vs HALF_EVEN (bround / DuckDB round_even) on
    BINARY-EXACT .5 boundaries: integer quantities halve to x.0/x.5
    exactly, so both engines see the same boundary value — decimal
    boundaries like 12.65 are not representable and the engines'
    rounding would diverge on representation, not mode."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") == F.floor("l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / 2, 0).alias("half_up"),
        F.bround(F.col("l_quantity") / 2, 0).alias("half_even"),
    )


@query(
    "fn_variant_json",
    "§1.2/§2.8 VariantType semi-structured (Spark 4) — full oracle",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CASE WHEN json_structure(props) = '{"k":"UBIGINT"}'
                THEN 'OBJECT<k: BIGINT>' END AS variant_schema
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType: parse_json into a variant column, then
    typed field extraction with variant_get.  Upgraded rows-only ->
    hash-gated (VERDICT r12 item 4): both output columns are
    deterministic — k_int is a typed path extraction DuckDB replays
    with json_extract, and schema_of_variant's rendering is a pure
    function of the JSON structure, which DuckDB computes with
    json_structure and maps to Spark's spelling (the per-engine
    rendering translation every template oracle does; an unexpected
    structure yields NULL on the oracle side and a mismatch, so the
    mapping is checked, not assumed)."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.schema_of_variant(v).alias("variant_schema"),
    )


@query(
    "fn_cast_battery",
    "§2.8 casts across numeric/string/timestamp/decimal",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS od,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(o_totalprice AS DECIMAL(18, 2)) AS DOUBLE) AS price_dec2,
           CAST(substr(CAST(o_orderkey AS VARCHAR), 1, 2) AS INTEGER) AS first2
    FROM orders
    """,
)
def fn_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI mode on both engines: overflow/bad casts raise rather than
    returning NULL (SURVEY §2.8 decision). Drift handled in oracle:
    Spark double→bigint truncates toward zero, DuckDB rounds
    (oracle uses trunc()); DATE columns formatted as ISO strings."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("od"),
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec2"),
        F.substring(F.col("o_orderkey").cast("string"), 1, 2).cast("int").alias("first2"),
    )


@query(
    "fn_bitwise_battery",
    "§2.8 bitwise ops (and/or/xor, shifts, popcount, hex)",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 15 AS bor,
           xor(o_orderkey, 255) AS bxor,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS bits,
           lower(to_hex(o_orderkey)) AS hex_s
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression battery — all JVM codegen scalar exprs (the
    building blocks behind hash partitioners, bloom filters, and the
    banding tricks in dedup.py). Spark ``hex`` is uppercase and DuckDB
    ``to_hex`` lowercase, so both sides normalize with lower()."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(15)).alias("bor"),
        k.bitwiseXOR(F.lit(255)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("bits"),
        F.lower(F.hex(k)).alias("hex_s"),
    )


@query(
    "fn_url_battery",
    "§2.8 URL parsing (parse_url vs independent regex oracle)",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || lang || '.example.com/docs/' || doc_id ||
             '?q=' || source || '&page=2' AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query_s,
           regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param
    FROM u
    """,
)
def fn_url_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction. Spark side uses the dedicated
    ``parse_url`` expression (JVM, java.net.URI-based); the oracle
    parses the same synthesized URLs with plain regexes — an
    independent implementation cross-check, not a shared one. The
    regex subset (anchors, classes, captures) is Java/RE2-portable."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("lang"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?q="), F.col("source"),
        F.lit("&page=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("scheme"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_s"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
    )


@query(
    "fn_struct_battery",
    "§2.8 struct create / field access / compare / to_json",
    """
    SELECT c_custkey,
           struct_pack(seg := c_mktsegment, name := c_name).seg AS seg,
           round(struct_pack(bal := c_acctbal).bal, 2) AS bal,
           to_json(struct_pack(k := c_custkey, seg := c_mktsegment)) AS js,
           CASE WHEN struct_pack(seg := c_mktsegment, k := c_custkey)
                     < struct_pack(seg := 'HOUSEHOLD', k := CAST(500 AS BIGINT))
                THEN 1 ELSE 0 END AS lt_probe
    FROM customer
    """,
)
def fn_struct_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct surface: named construction, field access, lexicographic
    struct comparison (field order, then value — identical semantics in
    both engines), and to_json serialization. The JSON probe keeps to
    int/string fields: float formatting inside JSON is engine-specific,
    values outside it are compared numerically as usual."""
    c = load(spark, sf_dir, "customer")
    s = F.struct(F.col("c_mktsegment").alias("seg"), F.col("c_name").alias("name"))
    cmp_l = F.struct(F.col("c_mktsegment").alias("seg"), F.col("c_custkey").alias("k"))
    cmp_r = F.struct(F.lit("HOUSEHOLD").alias("seg"), F.lit(500).cast("bigint").alias("k"))
    return c.select(
        "c_custkey",
        s.getField("seg").alias("seg"),
        F.round(F.struct(F.col("c_acctbal").alias("bal")).getField("bal"), 2).alias("bal"),
        F.to_json(F.struct(F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"))).alias("js"),
        F.when(cmp_l < cmp_r, 1).otherwise(0).alias("lt_probe"),
    )


@query(
    "fn_explode_outer_nulls",
    "§2.8 explode_outer (empty-array rows preserved as NULL)",
    """
    WITH s AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 40
                  THEN [array_to_string(string_split(text, ' ')[1:40], ' ')]
                  ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM documents
    )
    SELECT doc_id, unnest(CASE WHEN len(grams) = 0 THEN [NULL] ELSE grams END) AS gram
    FROM s
    """,
)
def fn_explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: a 40-token prefix shingle exists only
    for long docs; short docs produce an EMPTY array, and explode_outer
    must keep their row with a NULL — plain explode would silently drop
    them (the classic lost-rows bug in flattening pipelines). DuckDB
    has no outer unnest, so the oracle pads empty lists with [NULL]."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= 40, F.array(F.array_join(F.slice(toks, 1, 40), " "))
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode_outer(grams).alias("gram"))


@query(
    "fn_collation_battery",
    "§2.8 collation-aware comparison (Spark 4 UTF8_LCASE vs binary)",
    """
    SELECT c_custkey, c_mktsegment,
           CASE WHEN upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
                     = c_mktsegment THEN 1 ELSE 0 END AS eq_binary,
           CASE WHEN lower(upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)))
                     = lower(c_mktsegment) THEN 1 ELSE 0 END AS eq_lcase,
           CASE WHEN lower(c_mktsegment) LIKE 'bu%' THEN 1 ELSE 0 END AS pre_lcase
    FROM customer
    """,
)
def fn_collation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: the same comparison under binary (default)
    vs UTF8_LCASE collation — case-insensitive equality and prefix
    match expressed DECLARATIVELY (the collation rides the type, so
    Catalyst can still push/optimize) rather than wrapping every
    operand in lower(). DuckDB has no session collations in this
    harness, so the oracle states the lower()-normalized equivalent —
    semantically identical for ASCII segment names."""
    c = load(spark, sf_dir, "customer")
    seg_l = F.collate(F.col("c_mktsegment"), "UTF8_LCASE")
    cap_l = F.collate(F.initcap(F.col("c_mktsegment")), "UTF8_LCASE")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.initcap(F.col("c_mktsegment")) == F.col("c_mktsegment"), 1)
        .otherwise(0)
        .alias("eq_binary"),
        F.when(cap_l == seg_l, 1).otherwise(0).alias("eq_lcase"),
        F.when(seg_l.startswith(F.collate(F.lit("Bu"), "UTF8_LCASE")), 1)
        .otherwise(0)
        .alias("pre_lcase"),
    )


@query(
    "fn_try_arithmetic",
    "§2.8 error-safe arithmetic (try_divide / try_add / try_to_number under ANSI)",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / nullif(l_discount, 0.0), 4) AS safe_ratio,
           CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END AS was_div0,
           l_quantity + l_tax AS plain_add,
           TRY_CAST(l_returnflag AS INTEGER) AS not_a_number
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI escape hatches: this engine runs with
    spark.sql.ansi.enabled=true (division by zero is an ERROR, the
    safer default at scale), so pipelines use try_divide/try_cast where
    NULL-on-failure is intended. try_divide(x, 0) → NULL maps to
    DuckDB's nullif-guarded division; try_cast of a non-numeric string
    → NULL matches TRY_CAST. All scalar expressions — map-only,
    codegen, no shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias("safe_ratio"),
        F.when(F.col("l_discount") == 0.0, 1).otherwise(0).alias("was_div0"),
        F.try_add("l_quantity", "l_tax").alias("plain_add"),
        F.try_to_number("l_returnflag", F.lit("999")).cast("int").alias("not_a_number"),
    )


@query(
    "fn_levenshtein_battery",
    "§2.8 edit-distance functions (levenshtein, similarity ratio)",
    """
    WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 200)
    SELECT a.p_partkey AS k,
           levenshtein(a.p_name, b.p_name) AS lev,
           round(1.0 - levenshtein(a.p_name, b.p_name) * 1.0
                 / greatest(length(a.p_name), length(b.p_name)), 6) AS sim,
           levenshtein(a.p_name, upper(a.p_name)) AS lev_case
    FROM p a JOIN p b ON b.p_partkey = a.p_partkey + 1
    """,
    doc="Levenshtein distance + normalized similarity over adjacent part names.",
)
def fn_levenshtein_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance battery: unit-cost Levenshtein between adjacent
    part names (same definition in Spark and DuckDB), the normalized
    similarity ratio 1 - lev/max(len), and distance-to-uppercased as a
    case-sensitivity probe. All integer/exact arithmetic until one
    final division — deterministic at any partitioning. The bounded
    key filter keeps the demo small; the function itself is a
    JVM-codegen scalar and costs O(len^2) per row at any scale.
    """
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 200)
        .select("p_partkey", "p_name")
    )
    a, b = p.alias("a"), p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, F.col("b.p_partkey") == F.col("a.p_partkey") + 1)
        .select(
            F.col("a.p_partkey").alias("k"),
            lev.alias("lev"),
            F.round(
                F.lit(1.0)
                - lev / F.greatest(F.length("a.p_name"), F.length("b.p_name")),
                6,
            ).alias("sim"),
            F.levenshtein(F.col("a.p_name"), F.upper(F.col("a.p_name"))).alias(
                "lev_case"
            ),
        )
    )


@query(
    "fn_mask_redact",
    "§2.8 data masking (mask() governance function)",
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '*', 'g')
             AS masked_star_digits,
           regexp_replace(c_name, '[0-9]', 'n', 'g') AS masked_digits_only
    FROM customer WHERE c_custkey <= 100
    """,
    doc="Spark mask() vs its regexp expansion: X/x/n character classes.",
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data masking — the governance function every PII pipeline needs:
    Spark's built-in ``mask()`` replaces uppercase with X, lowercase
    with x, digits with n (and takes per-class overrides); DuckDB has
    no mask(), so the oracle expands it into the equivalent regexp
    chain, proving the semantics rather than assuming them. Other
    characters ('#') pass through in both. Pure map-side codegen;
    ASCII classes only, so Java-vs-RE2 dialect differences don't
    bite.
    """
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", "c_name")
    )
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name",
            upperChar=F.lit("X"),
            lowerChar=F.lit("x"),
            digitChar=F.lit("*"),
        ).alias("masked_star_digits"),
        F.mask(
            "c_name",
            upperChar=F.lit(None),
            lowerChar=F.lit(None),
            digitChar=F.lit("n"),
        ).alias("masked_digits_only"),
    )


@query(
    "fn_encoding_battery",
    "§2.8 binary encodings (base64 / hex roundtrips)",
    """
    SELECT n_nationkey,
           to_base64(encode(n_name)) AS b64,
           decode(from_base64(to_base64(encode(n_name)))) AS b64_roundtrip,
           lower(hex(encode(n_name))) AS hex_name,
           decode(unhex(lower(hex(encode(n_name))))) AS hex_roundtrip,
           octet_length(encode(n_name)) AS n_bytes
    FROM nation
    """,
    doc="base64/hex encode-decode roundtrips over nation names.",
)
def fn_encoding_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-encoding surface: base64 and hex of the UTF-8 bytes,
    decoded back to prove both roundtrips. Spark's base64()/hex()
    operate on binary and return padded-base64 / uppercase-hex;
    DuckDB's to_base64/hex agree on padding, and the shared lower()
    normalizes the one casing difference so the oracle is exact. All
    map-side codegen.
    """
    n = load(spark, sf_dir, "nation")
    raw = F.encode(F.col("n_name"), "utf-8")
    b64 = F.base64(raw)
    hx = F.lower(F.hex(raw))
    return n.select(
        "n_nationkey",
        b64.alias("b64"),
        F.decode(F.unbase64(b64), "utf-8").alias("b64_roundtrip"),
        hx.alias("hex_name"),
        F.decode(F.unhex(hx), "utf-8").alias("hex_roundtrip"),
        F.length(raw).alias("n_bytes"),
    )


@query(
    "fn_format_string_battery",
    "§2.8 printf-style formatting (format_string / printf parity)",
    """
    SELECT s_suppkey,
           printf('%s#%05d', s_name, s_suppkey) AS tagged,
           printf('bal=%09.2f', s_acctbal) AS bal_padded,
           printf('%x', s_suppkey) AS key_hex,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS key_lpad
    FROM supplier WHERE s_suppkey <= 100
    """,
    doc="C-style %s/%05d/%09.2f/%x formatting over supplier rows.",
)
def fn_format_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting: Spark format_string() (java.util
    Formatter) vs DuckDB printf() (fmt) agree on the C core —
    %s, zero-padded %05d, fixed-width %09.2f (floats print from the
    same doubles), lowercase %x — plus lpad as the SQL-native
    padding. The %f case rounds half-even from the double in both
    implementations; values here are 2-decimal money so no midpoint
    ambiguity. Map-side codegen only.
    """
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 100)
    return s.select(
        "s_suppkey",
        F.format_string("%s#%05d", "s_name", "s_suppkey").alias("tagged"),
        F.format_string("bal=%09.2f", "s_acctbal").alias("bal_padded"),
        F.format_string("%x", "s_suppkey").alias("key_hex"),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("key_lpad"),
    )


@query(
    "fn_interval_battery",
    "§2.8 interval arithmetic (month-clamped add_months, day-time intervals, ISO week fields)",
    """
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 14 MONTH, '%Y-%m-%d') AS minus14mo,
           strftime(last_day(CAST(o_orderdate AS DATE)) + INTERVAL 1 MONTH, '%Y-%m-%d') AS eom_plus1mo,
           strftime(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus36h,
           strftime(o_orderdate - INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS minus90min,
           strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS qtr_start,
           strftime(date_trunc('week', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS week_start,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd_mon0,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week
    FROM orders
    """,
)
def fn_interval_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic beyond fn_datetime_battery's day offsets:
    calendar-month addition with end-of-month CLAMPING (Jan 31 + 3 mo =
    Apr 30 — both engines clamp, and the eom_plus1mo column pins the
    clamp case for every row), negative year-crossing month offsets,
    and day-time intervals applied to timestamps (``make_dt_interval``
    on the Spark side == INTERVAL literals in DuckDB). Week fields pin
    the Monday-based conventions: Spark ``weekday()`` (Mon=0) ==
    DuckDB isodow-1, and both weekofyear()s are ISO weeks. All date /
    timestamp results travel as formatted strings (see
    fn_datetime_battery's dtype note). Map-only, codegen'd — no
    shuffle, nothing for AQE to do."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    ts = F.col("o_orderdate")
    iso, isots = "yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss"
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(od, 3), iso).alias("plus3mo"),
        F.date_format(F.add_months(od, -14), iso).alias("minus14mo"),
        F.date_format(F.add_months(F.last_day(od), 1), iso).alias("eom_plus1mo"),
        F.date_format(
            ts + F.make_dt_interval(F.lit(0), F.lit(36), F.lit(0), F.lit(0)), isots
        ).alias("plus36h"),
        F.date_format(
            ts - F.make_dt_interval(F.lit(0), F.lit(0), F.lit(90), F.lit(0)), isots
        ).alias("minus90min"),
        F.date_format(F.date_trunc("quarter", od), iso).alias("qtr_start"),
        F.date_format(F.date_trunc("week", od), iso).alias("week_start"),
        F.weekday(od).alias("wd_mon0"),
        F.dayofyear(od).alias("doy"),
        F.weekofyear(od).alias("iso_week"),
    )


@query(
    "fn_aes_roundtrip",
    "§2.8 column encryption (aes_encrypt/aes_decrypt ECB round-trip, try_ variant)",
    """
    SELECT c_custkey,
           c_name AS plaintext,
           c_name AS roundtrip,
           CAST((strlen(c_name) // 16 + 1) * 16 AS INTEGER) AS cipher_len,
           CAST(NULL AS VARCHAR) AS bad_key
    FROM customer
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption — the at-rest PII protection pattern
    (encrypt before the sink, decrypt behind an entitlement check).
    AES-128-ECB is the deterministic mode (no IV), so
    decrypt(encrypt(x)) is value-stable and the PKCS#7 ciphertext
    length is exactly (len div 16 + 1)*16 bytes — both facts the
    DuckDB oracle checks arithmetically without implementing AES:
    roundtrip must equal the plaintext, cipher_len is closed-form.
    ``try_aes_decrypt`` with a WRONG key returns NULL instead of
    raising (the try_* error-safe discipline of fn_try_arithmetic) —
    under ANSI mode the non-try form would kill the whole job at
    100 TB for one bad row. All map-side codegen'd JVM crypto; no
    UDF, no shuffle."""
    c = load(spark, sf_dir, "customer")
    key = F.lit("0123456789abcdef")
    wrong = F.lit("fedcba9876543210")
    cipher = F.expr("aes_encrypt(c_name, '0123456789abcdef', 'ECB')")
    return c.select(
        "c_custkey",
        F.col("c_name").alias("plaintext"),
        F.decode(
            F.expr(
                "aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', 'ECB'),"
                " '0123456789abcdef', 'ECB')"
            ),
            "UTF-8",
        ).alias("roundtrip"),
        F.octet_length(cipher).alias("cipher_len"),
        F.decode(
            F.expr(
                "try_aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', 'ECB'),"
                " 'fedcba9876543210', 'ECB')"
            ),
            "UTF-8",
        ).alias("bad_key"),
    )


@query(
    "fn_variant_typed_get",
    "§2.8 VariantType typed-path extraction (variant_get / try_variant_get, full oracle)",
    """
    SELECT event_id,
           CAST(json_extract(j, '$.u') AS BIGINT) AS u,
           json_extract_string(j, '$.t') AS t,
           round(CAST(json_extract(j, '$.vals[1]') AS DOUBLE), 6) AS second_val,
           CAST(json_extract(j, '$.k') AS INTEGER) AS k,
           CAST(NULL AS INTEGER) AS missing
    FROM (
      SELECT event_id,
             to_json(struct_pack(
               u := user_id, t := event_type,
               vals := [round(value, 6), round(value * 2, 6)],
               k := CAST(json_extract(props, '$.k') AS INTEGER)
             )) AS j
      FROM events
    )
    """,
)
def fn_variant_typed_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType with TYPED extraction — unlike
    fn_variant_json (rows-only: variant's display form is
    engine-specific), ``variant_get(v, path, type)`` returns plain
    SQL-typed columns, so the whole encode->shred->extract pipeline is
    value-hash-checked against DuckDB's JSON path functions: a nested
    object (scalars + array + a field lifted from the props JSON) is
    built per event, parsed to VARIANT once, then read back by path
    with target types, including array indexing ($.vals[1]) and
    ``try_variant_get`` on a missing path returning NULL instead of
    raising (the error-safe variant the ingest path needs when 100 TB
    of semi-structured rows disagree about schema). Map-only, no
    shuffle; variant decode happens once per row for all five
    extractions."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr(f"variant_get({_V}, '$.u', 'bigint')").alias("u"),
        F.expr(f"variant_get({_V}, '$.t', 'string')").alias("t"),
        F.round(F.expr(f"variant_get({_V}, '$.vals[1]', 'double')"), 6).alias(
            "second_val"
        ),
        F.expr(f"variant_get({_V}, '$.k', 'int')").alias("k"),
        F.expr(f"try_variant_get({_V}, '$.nope', 'int')").alias("missing"),
    )


# the variant column expression, inlined as SQL text so each extraction
# call references the same named struct build (common-subexpression
# eliminated by Catalyst into one parse_json per row)
_V = (
    "parse_json(to_json(named_struct("
    "'u', user_id, 't', event_type, "
    "'vals', array(round(value, 6), round(value * 2, 6)), "
    "'k', CAST(get_json_object(props, '$.k') AS INT))))"
)


@query(
    "fn_nested_struct_array",
    "§2.8 nested array-of-struct pipeline (collect sorted structs, HOF transform, re-flatten)",
    """
    SELECT l_orderkey AS o_orderkey,
           count(*) AS n_lines,
           round(first(l_quantity ORDER BY l_linenumber, l_quantity), 2) AS first_qty,
           round(CAST(sum(CAST(round(l_quantity * l_extendedprice, 2)
                               AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_net,
           round(CAST(max(CAST(round(l_quantity * l_extendedprice, 2)
                               AS DECIMAL(18,2))) AS DOUBLE), 2) AS max_net
    FROM lineitem GROUP BY l_orderkey
    """,
)
def fn_nested_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nest -> enrich -> unnest cycle of document-shaped data: per
    order, lines become an ORDER-PINNED array of structs
    (array_sort on the linenumber field — collect_list alone has
    nondeterministic arrival order), each struct gains a computed
    ``net`` field via a higher-order transform (withField inside
    F.transform — the struct is rebuilt JVM-side, no explode), and
    the answers are read from the nested value directly: positional
    access lines[0], and F.aggregate folds for sum/max over the
    array. The fold accumulates DECIMAL(18,2) (each net rounded to
    cents first), so nesting cost nothing in exactness — the oracle
    computes the same numbers relationally without ever building the
    array. One shuffle (the groupBy); everything after is map-side
    array algebra — at 100 TB this is why you enrich INSIDE the
    nested form instead of exploding 6 rows per order back out."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").alias("price"),
                )
            )
        ).alias("lines")
    )
    enriched = nested.withColumn(
        "lines",
        F.transform(
            "lines",
            lambda s: s.withField(
                "net", F.round(s["qty"] * s["price"], 2).cast("decimal(18,2)")
            ),
        ),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return enriched.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.size("lines").alias("n_lines"),
        F.round(F.col("lines")[0]["qty"], 2).alias("first_qty"),
        F.round(
            F.aggregate(
                "lines", zero, lambda acc, s: (acc + s["net"]).cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("total_net"),
        F.round(
            F.aggregate(
                "lines", zero, lambda acc, s: F.greatest(acc, s["net"])
            ).cast("double"),
            2,
        ).alias("max_net"),
    )


@query(
    "fn_sql_misc_battery",
    "§2.8 SQL-misc battery: width_bucket / str_to_map / from_csv",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_extendedprice < 0 THEN 0
                WHEN l_extendedprice >= 104000 THEN 14
                ELSE CAST(floor(l_extendedprice / 8000) AS BIGINT) + 1
           END AS price_bucket,
           CAST(l_quantity AS INT) AS qty_from_map,
           CAST(l_linenumber AS INT) AS line_from_map,
           CAST(l_quantity AS INT) AS qty_from_csv,
           l_returnflag AS flag_from_csv
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
)
def fn_sql_misc_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-misc row functions with 0 prior coverage (VERDICT r7 item
    5): ``width_bucket`` (equi-width histogram assignment; bounds 0 /
    104000 with 13 buckets give an exact-double 8000 width so the
    bucket edge arithmetic is bit-identical cross-engine),
    ``str_to_map`` (k:v,k:v parsing — the classic tag-string decoder),
    and ``from_csv`` (schema-ful parsing of a delimited string column).
    The map/CSV payloads are built from the row's own columns, so the
    oracle recomputes the round-trip directly. All map-side; the only
    plan cost is the scan."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "width_bucket(l_extendedprice, 0, 104000, 13) AS price_bucket",
        "str_to_map(concat('qty:', cast(l_quantity AS INT), ',line:', l_linenumber),"
        " ',', ':') AS m",
        "from_csv(concat(cast(l_quantity AS INT), ';', l_returnflag),"
        " 'q INT, f STRING', map('sep', ';')) AS s",
    ).selectExpr(
        "l_orderkey",
        "l_linenumber",
        "price_bucket",
        "CAST(m['qty'] AS INT) AS qty_from_map",
        "CAST(m['line'] AS INT) AS line_from_map",
        "s.q AS qty_from_csv",
        "s.f AS flag_from_csv",
    )


@query(
    "fn_variant_explode",
    "§2.8 variant_explode lateral expansion of a VariantType array",
    """
    SELECT l_orderkey, l_linenumber, 0 AS pos,
           CAST(CAST(l_quantity AS INT) AS VARCHAR) AS val
    FROM lineitem WHERE l_orderkey % 20 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 1 AS pos,
           CAST(l_linenumber AS VARCHAR) AS val
    FROM lineitem WHERE l_orderkey % 20 = 0
    """,
)
def fn_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``variant_explode`` — the Spark-4 table function that unnests a
    VariantType array/object into (pos, key, value) rows; the
    semi-structured analogue of posexplode and the missing half of the
    VariantType rows (fn_variant_json / fn_variant_typed_get cover
    scalar extraction). Only the comma-LATERAL SQL form resolves the
    routine on this build (selectExpr and LATERAL VIEW both fail
    lookup), so the query goes through a temp view. Each row's variant
    is built from its own columns via parse_json, and value is
    re-serialized with to_json — so the DuckDB oracle is a plain
    2-way UNION reconstructing (pos, val)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    v = li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "parse_json(concat('[', cast(l_quantity AS INT), ',', l_linenumber, ']'))"
        " AS var",
    )
    name = f"sls_variant_src_{uuid.uuid4().hex[:8]}"
    v.createOrReplaceTempView(name)
    out = spark.sql(
        f"""
        SELECT l_orderkey, l_linenumber, pos, to_json(value) AS val
        FROM {name}, LATERAL variant_explode(var)
        """
    )
    spark.catalog.dropTempView(name)
    return out


@query(
    "fn_regex_extended",
    "§2.8 extended regex battery: regexp_extract_all / count / instr / substr",
    """
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS all_words,
           CAST(len(regexp_extract_all(p_name, 'o[a-z]')) AS INT) AS n_o_pairs,
           CASE WHEN regexp_matches(p_name, 'la') THEN strpos(p_name, 'la')
                ELSE 0 END AS first_la_pos,
           coalesce(regexp_extract(p_name, '[a-z]*o[a-z]*'), '')
             AS first_o_word
    FROM part WHERE p_partkey % 3 = 0
    """,
)
def fn_regex_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-3.4 regex function family beyond fn_regex_battery's
    extract/replace/like: ``regexp_extract_all`` (every match as an
    array), ``regexp_count`` (match count), ``regexp_instr``
    (1-based position of first match, 0 if none), ``regexp_substr``
    (first matching substring, NULL → coalesced for the oracle).
    The oracle rebuilds each from DuckDB's regexp primitives —
    strpos stands in for regexp_instr on the literal pattern. All
    map-side expressions inside whole-stage codegen.

    ``all_words`` is serialized with ``array_join`` (oracle:
    ``array_to_string``): the driver's canonicalizer sorts the pandas
    frame and cannot hash a raw numpy array column — the CSV string
    still pins every match and its order (CORRECTNESS_r08 failure)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 0)
    return p.select(
        "p_partkey",
        F.array_join(
            F.expr("regexp_extract_all(p_name, '[a-z]+', 0)"), ","
        ).alias("all_words"),
        F.expr("CAST(regexp_count(p_name, 'o[a-z]') AS INT)").alias("n_o_pairs"),
        F.expr("CAST(regexp_instr(p_name, 'la') AS INT)").alias("first_la_pos"),
        F.expr("coalesce(regexp_substr(p_name, '[a-z]*o[a-z]*'), '')").alias(
            "first_o_word"
        ),
    )


@query(
    "fn_map_hof_battery",
    "§2.8 map higher-order functions (transform_keys/values, map_filter, map_zip_with)",
    """
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
      FROM lineitem WHERE l_orderkey % 40 = 0
    )
    SELECT l_orderkey, l_linenumber, 'QTY' AS k, qty * 2 AS doubled,
           qty + disc_pct AS zipped
    FROM base WHERE qty > 25
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'PRICE_CENTS', price_cents * 2,
           price_cents + 0
    FROM base WHERE price_cents > 25
    """,
)
def fn_map_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions over a per-row metrics map:
    ``transform_keys`` (upper-case the keys), ``transform_values``
    (double the values), ``map_filter`` (drop small entries),
    ``map_zip_with`` (merge two maps key-wise), ``map_concat`` +
    ``map_entries``/explode to land deterministic rows. Map column
    ORDER is engine-internal, so the battery never compares maps
    directly — entries explode to rows and the driver's
    order-insensitive hash does the rest (the same discipline as the
    array batteries). All JVM-side; zero shuffles beyond the scan."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    base = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "map('qty', CAST(l_quantity AS BIGINT),"
            " 'price_cents', CAST(round(l_extendedprice * 100) AS BIGINT))"
        ).alias("m"),
        F.expr(
            "map('qty', CAST(round(l_discount * 100) AS BIGINT),"
            " 'price_cents', CAST(0 AS BIGINT))"
        ).alias("m2"),
    )
    shaped = base.select(
        "l_orderkey",
        "l_linenumber",
        F.explode(
            F.map_filter(
                F.transform_keys(F.col("m"), lambda k, v: F.upper(k)),
                lambda k, v: v > 25,
            )
        ).alias("k", "v"),
        F.map_zip_with(
            F.col("m"), F.col("m2"), lambda k, v1, v2: v1 + v2
        ).alias("zm"),
    )
    return shaped.select(
        "l_orderkey",
        "l_linenumber",
        "k",
        (F.col("v") * 2).alias("doubled"),
        F.element_at("zm", F.lower("k")).alias("zipped"),
    )


@query(
    "fn_try_collection_access",
    "§2.8 error-safe collection access (try_element_at / get / try_cast) under ANSI",
    """
    SELECT doc_id,
           ws[1] AS first_word,
           CASE WHEN len(ws) >= 999 THEN ws[999] END AS oob_try,
           CASE WHEN len(ws) >= 3 THEN ws[3] END AS third_get,
           TRY_CAST(ws[1] AS INTEGER) AS first_as_int,
           TRY_CAST(CAST(len(ws) AS VARCHAR) AS INTEGER) AS len_roundtrip
    FROM (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE text IS NOT NULL)
    WHERE doc_id % 4 = 0
    """,
)
def fn_try_collection_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI mode turns out-of-bounds ``element_at`` and bad casts into
    runtime ERRORS — the error-safe accessors are what production SQL
    uses instead: ``try_element_at`` (OOB → NULL, 1-based),
    ``get`` (0-based, OOB → NULL by design), and ``try_cast``
    (unparseable → NULL). fn_try_arithmetic covers the arithmetic
    family; this row pins the collection/cast family. The oracle maps
    each to DuckDB's native semantics (1-based list index with CASE
    guards, TRY_CAST)."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("doc_id") % 4 == 0)
    )
    ws = F.split("text", " ")
    return d.select(
        "doc_id",
        F.try_element_at(ws, F.lit(1)).alias("first_word"),
        F.try_element_at(ws, F.lit(999)).alias("oob_try"),
        F.get(ws, 2).alias("third_get"),
        F.expr("TRY_CAST(split(text, ' ')[0] AS INT)").alias("first_as_int"),
        F.expr("TRY_CAST(CAST(size(split(text, ' ')) AS STRING) AS INT)").alias(
            "len_roundtrip"
        ),
    )


@query(
    "fn_datetime_construct_battery",
    "§2.8 datetime constructors: make_date / make_timestamp / unix epoch round-trips",
    """
    SELECT o_orderkey,
           strftime(make_date(CAST(year(o_orderdate) AS INT),
                              CAST(month(o_orderdate) AS INT),
                              CAST(day(o_orderdate) AS INT)), '%Y-%m-%d')
             AS rebuilt_date,
           make_timestamp(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT),
                          CAST(day(o_orderdate) AS INT), 12, 30,
                          CAST(o_orderkey % 60 AS DOUBLE)) AS noon_ts,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
           CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_ms,
           CAST(to_timestamp(CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT))
                AS TIMESTAMP) AS from_epoch
    FROM orders WHERE o_orderkey % 30 = 0
    """,
)
def fn_datetime_construct_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datetime CONSTRUCTOR family (fn_datetime_battery covers
    extraction/arithmetic): ``make_date`` / ``make_timestamp`` build
    temporals from numeric fields (the parse-free path ETL uses when
    year/month/day arrive as columns), and the unix-epoch round-trips
    (``unix_seconds``/``unix_millis`` ↔ ``timestamp_seconds``) pin the
    integer epoch encodings both engines agree on exactly. Rebuilding
    each row's own date and recovering it from its own epoch makes
    every output self-checking. Map-side only."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 30 == 0)
    return o.select(
        "o_orderkey",
        F.make_date(F.year("o_orderdate"), F.month("o_orderdate"),
                    F.dayofmonth("o_orderdate"))
        .cast("string")
        .alias("rebuilt_date"),
        F.expr(
            "make_timestamp(year(o_orderdate), month(o_orderdate),"
            " day(o_orderdate), 12, 30, CAST(o_orderkey % 60 AS DOUBLE))"
        ).alias("noon_ts"),
        F.unix_seconds(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_ms"),
        F.timestamp_seconds(
            F.unix_seconds(F.col("o_orderdate").cast("timestamp"))
        ).alias("from_epoch"),
    )


@query(
    "fn_string_helpers_battery",
    "§2.8 string helpers: split_part / substring_index / overlay / translate / repeat / left / right",
    """
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS cust_num,
           array_to_string((string_split(c_name, '#'))[1:1], '#') AS before_hash,
           substr(c_name, 1, 8) || 'XXXX'
             || substr(c_name, 13) AS overlaid,
           translate(c_name, '#0', '-O') AS translated,
           repeat('ab', 3) AS repeated,
           left(c_name, 8) AS l8,
           right(c_name, 3) AS r3
    FROM customer WHERE c_custkey % 5 = 0
    """,
)
def fn_string_helpers_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The everyday string helpers the main battery skips:
    ``split_part`` (1-based field extraction), ``substring_index``
    (everything before the Nth delimiter — oracled via list slicing),
    ``overlay`` (in-place replacement at a position — oracled as the
    substr/concat identity it desugars to), ``translate`` (per-char
    mapping), ``repeat``, ``left``/``right``. All map-side
    expressions; each output is rebuilt independently in DuckDB so
    the battery pins 1-based/negative-index conventions
    cross-engine."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 5 == 0)
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.substring_index(F.col("c_name"), "#", 1).alias("before_hash"),
        F.overlay(F.col("c_name"), F.lit("XXXX"), F.lit(9)).alias("overlaid"),
        F.translate(F.col("c_name"), "#0", "-O").alias("translated"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.expr("left(c_name, 8)").alias("l8"),
        F.expr("right(c_name, 3)").alias("r3"),
    )


@query(
    "fn_generator_inline",
    "§2.8 inline / inline_outer (array-of-struct row generator)",
    """
    SELECT o_orderkey, t.metric, t.v
    FROM (
      SELECT o_orderkey,
             [{'metric': 'total_cents',
               'v': CAST(round(o_totalprice * 100) AS BIGINT)},
              {'metric': 'cust_key', 'v': CAST(o_custkey AS BIGINT)}]
               AS arr
      FROM orders WHERE o_orderkey % 15 = 0
    ), LATERAL unnest(arr) AS u(t)
    """,
)
def fn_generator_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``inline`` — the array-of-STRUCT generator (explode unpacks one
    column per call; inline fans a struct array into its fields as
    columns in one go), the idiomatic unnest for nested parquet at
    scale because no intermediate struct column survives into the
    shuffle. Built per-row from the row's own values so the DuckDB
    oracle (LATERAL unnest of an equivalent struct list) reconstructs
    the exact rows."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 15 == 0)
    return o.select(
        "o_orderkey",
        F.inline(
            F.array(
                F.struct(
                    F.lit("total_cents").alias("metric"),
                    F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v"),
                ),
                F.struct(
                    F.lit("cust_key").alias("metric"),
                    F.col("o_custkey").cast("long").alias("v"),
                ),
            )
        ),
    )


@query(
    "fn_xpath_battery",
    "§2.8 XPath extraction over XML strings (xpath_string/long/boolean, node-set size)",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS id_attr,
           o_orderpriority AS prio,
           CAST(floor(o_totalprice) AS BIGINT) AS total_floor,
           CAST(o_orderkey % 4 AS INTEGER) AS n_lines,
           (o_orderkey % 4) > 0 AS has_lines
    FROM orders WHERE o_orderkey % 11 = 0
    """,
)
def fn_xpath_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's Hive-inherited XPath family over XML payloads built
    row-side: xpath_string (element text + @attribute access),
    xpath_long (numeric leaf), xpath_boolean (node existence), and
    xpath() returning the node-set as an array (counted with size).
    The XML is constructed from order columns, so the DuckDB oracle
    recomputes every expected value directly from the SAME columns —
    an independent oracle in the fn_url_battery style (DuckDB has no
    XPath). All five extractions run JVM-side inside one projection
    over a pruned 3-column scan; at 100 TB this is the map-only
    'parse the XML event payload' shape with zero shuffles."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    xml = F.concat(
        F.lit('<order id="'), F.col("o_orderkey").cast("string"),
        F.lit('"><prio>'), F.col("o_orderpriority"),
        F.lit("</prio><lines>"),
        F.expr("repeat('<l/>', CAST(o_orderkey % 4 AS INT))"),
        F.lit("</lines><total>"),
        F.floor("o_totalprice").cast("bigint").cast("string"),
        F.lit("</total></order>"),
    )
    return o.select("o_orderkey", xml.alias("xml")).select(
        "o_orderkey",
        F.expr("xpath_string(xml, 'order/@id')").alias("id_attr"),
        F.expr("xpath_string(xml, 'order/prio')").alias("prio"),
        F.expr("xpath_long(xml, 'order/total')").alias("total_floor"),
        F.expr("size(xpath(xml, 'order/lines/l'))").alias("n_lines"),
        F.expr("xpath_boolean(xml, 'order/lines/l')").alias("has_lines"),
    )


@query(
    "fn_utf8_validation",
    "§2.8 UTF-8 validation functions (is_valid_utf8 / try_validate_utf8 / make_valid_utf8, Spark 4)",
    """
    SELECT doc_id,
           doc_id % 3 != 0 AS is_valid,
           doc_id % 3 = 0 AS try_is_null,
           CAST(length(text) + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_chars_repaired
    FROM documents WHERE doc_id < 300
    """,
)
def fn_utf8_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's UTF-8 hygiene trio over BINARY payloads — the first
    gate of any web-crawl ingest: is_valid_utf8 (boolean probe),
    try_validate_utf8 (NULL instead of error on bad bytes — the
    filter-don't-fail form), make_valid_utf8 (replace invalid
    sequences with U+FFFD — the repair form). Every third document is
    corrupted by appending a lone 0xFF continuation byte to its
    encoded text, so expectations derive purely from doc_id and the
    original char length: the repaired string gains exactly ONE
    replacement char. All three run JVM-side in one projection; at
    100 TB this replaces the per-row Python try/decode UDF that
    dominates naive crawl pipelines."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    bad = F.expr("concat(encode(text, 'UTF-8'), X'FF')")
    b = F.when(F.col("doc_id") % 3 == 0, bad).otherwise(F.expr("encode(text, 'UTF-8')"))
    return d.withColumn("b", b).select(
        "doc_id",
        F.expr("is_valid_utf8(b)").alias("is_valid"),
        F.expr("try_validate_utf8(b) IS NULL").alias("try_is_null"),
        F.expr("length(make_valid_utf8(b))").cast("bigint").alias("n_chars_repaired"),
    )


@query(
    "fn_to_char_number_roundtrip",
    "§2.8 to_char / to_number format round-trip (Oracle-style numeric format models)",
    """
    SELECT o_orderkey,
           concat(lpad(CAST(cents // 100 AS VARCHAR), 9, '0'), '.',
                  lpad(CAST(cents % 100 AS VARCHAR), 2, '0')) AS formatted,
           cents AS roundtrip_cents
    FROM (
      SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 13 = 0
    )
    """,
)
def fn_to_char_number_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-style numeric format models, Spark 4's to_char/to_number:
    an exact DECIMAL built from integer cents renders through the
    zero-padded model '000000000.00' (no double ever enters the
    formatter, so no rounding mode can diverge), and to_number parses
    the rendered string back under the same model — the round-trip
    returns to integer cents bit-exactly. The oracle renders the SAME
    string with pure integer ops (lpad of cents div/mod 100), so the
    format-model semantics are pinned cross-engine without DuckDB
    needing to_char at all. The export-to-fixed-width-feed shape
    (banking interchange files) that otherwise hides half-up/half-
    even drift."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
        )
    )
    dec = F.expr("CAST(cents AS DECIMAL(14,2)) / 100")
    return (
        o.withColumn("dec", dec)
        .withColumn("formatted", F.expr("to_char(dec, '000000000.00')"))
        .withColumn(
            "roundtrip_cents",
            F.expr("CAST(to_number(formatted, '000000000.00') * 100 AS BIGINT)"),
        )
        .select("o_orderkey", "formatted", "roundtrip_cents")
    )


@query(
    "fn_timezone_battery",
    "§2.8 timezone conversion (from/to_utc_timestamp, convert_timezone; fixed-offset zones)",
    """
    SELECT event_id,
           strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M') AS tokyo_wall,
           strftime(ts + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M') AS kolkata_wall,
           true AS roundtrip_ok
    FROM events WHERE event_id % 17 = 0
    """,
)
def fn_timezone_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-zone conversions on UTC event instants: from_utc_timestamp
    to Asia/Tokyo (+9) and Asia/Kolkata (+5:30 — the half-hour offset
    that breaks hour-granularity assumptions), convert_timezone as the
    Spark-4 three-argument spelling (must agree with from_utc_timestamp
    — asserted in-plan by rendering both), and the to_utc_timestamp
    inverse proving the round trip is lossless. The oracle uses FIXED
    interval arithmetic, which is exactly right for these two zones
    (no DST in Japan since 1951, none in India) — DST-dependent zones
    are deliberately excluded here and pinned instead by the
    America/New_York spring-forward property test in
    tests/test_round8_ops.py, keeping the oracle engine-portable (no
    ICU dependency). Session timezone is UTC (session.py), so wall
    strings are unambiguous."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    tokyo = F.expr("from_utc_timestamp(ts, 'Asia/Tokyo')")
    kolkata = F.expr("from_utc_timestamp(ts, 'Asia/Kolkata')")
    kolkata2 = F.expr(
        "convert_timezone('UTC', 'Asia/Kolkata', CAST(ts AS TIMESTAMP_NTZ))"
    )
    return ev.select(
        "event_id",
        F.date_format(tokyo, "yyyy-MM-dd HH:mm").alias("tokyo_wall"),
        F.date_format(kolkata, "yyyy-MM-dd HH:mm").alias("kolkata_wall"),
        (
            (F.expr("to_utc_timestamp(from_utc_timestamp(ts, 'Asia/Tokyo'), 'Asia/Tokyo')") == F.col("ts"))
            & (F.date_format(kolkata2, "yyyy-MM-dd HH:mm") == F.date_format(kolkata, "yyyy-MM-dd HH:mm"))
        ).alias("roundtrip_ok"),
    )


@query(
    "fn_luhn_check",
    "§2.8 luhn_check (checksum validation) pinned against an explicit digit-fold",
    """
    SELECT o_orderkey, card12,
           (list_sum(list_transform(range(1, 13), j ->
              CASE WHEN j % 2 = 0
                   THEN CASE WHEN CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) * 2 > 9
                             THEN CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) * 2 - 9
                             ELSE CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) * 2 END
                   ELSE CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) END
           )) % 10 = 0) AS luhn_native,
           (list_sum(list_transform(range(1, 13), j ->
              CASE WHEN j % 2 = 0
                   THEN CASE WHEN CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) * 2 > 9
                             THEN CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) * 2 - 9
                             ELSE CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) * 2 END
                   ELSE CAST(substr(card12, CAST(13 - j AS INT), 1) AS INT) END
           )) % 10 = 0) AS luhn_manual
    FROM (
      SELECT o_orderkey,
             lpad(CAST(o_orderkey * 7919 % 1000000000000 AS VARCHAR), 12, '0') AS card12
      FROM orders WHERE o_orderkey % 19 = 0
    )
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in luhn_check (the PII/card-number validator that
    pairs with llm_pii_redact's detectors) pinned against an EXPLICIT
    Luhn fold written with aggregate()+sequence() — double every 2nd
    digit from the right, subtract 9 on overflow, sum % 10 == 0. The
    oracle implements the same fold with DuckDB list_transform, so the
    checksum algorithm itself is cross-engine verified, and the
    builtin must agree with the fold row-for-row (luhn_native vs
    luhn_manual — the oracle states the fold for both columns).
    Synthetic 12-digit 'cards' derive from orderkeys (×7919 spreads
    the low digits), giving ~10% valid by chance. Both paths are
    JVM-side HOF projections: no UDF, no explode."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 19 == 0)
        .select(
            "o_orderkey",
            F.lpad(
                (F.col("o_orderkey") * 7919 % 1000000000000).cast("string"), 12, "0"
            ).alias("card12"),
        )
    )
    fold = F.expr(
        """
        aggregate(sequence(1, 12), 0, (acc, j) -> acc +
          CASE WHEN j % 2 = 0
               THEN IF(CAST(substring(card12, 13 - j, 1) AS INT) * 2 > 9,
                       CAST(substring(card12, 13 - j, 1) AS INT) * 2 - 9,
                       CAST(substring(card12, 13 - j, 1) AS INT) * 2)
               ELSE CAST(substring(card12, 13 - j, 1) AS INT) END
        ) % 10 = 0
        """
    )
    return o.select(
        "o_orderkey",
        "card12",
        F.expr("luhn_check(card12)").alias("luhn_native"),
        fold.alias("luhn_manual"),
    )


@query(
    "fn_months_between_identities",
    "§2.8 months_between semantics (last-day rule, 31-day fraction denominator)",
    """
    SELECT o_orderkey,
           CAST(o_orderkey % 7 AS DOUBLE) AS k,
           true AS eq_lastday,
           true AS eq_midmonth,
           round(6.0 / 31, 6) AS frac_6d,
           0.0 AS zero_self
    FROM orders WHERE o_orderkey % 23 = 0
    """,
)
def fn_months_between_identities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """months_between's two famously non-obvious rules, asserted as
    per-row identities over real order dates: (1) the LAST-DAY rule —
    when both endpoints are month-ends the result is an exact integer,
    so mb(last_day(add_months(d,k)), last_day(d)) == k for every k
    even when the months are shorter than d's month (Spark clamps,
    then the last-day rule kicks in); mid-month anchors (the 15th)
    give the same exact k with no clamping in play; (2) the fraction
    denominator is ALWAYS 31 regardless of month length, so a 6-day
    offset from the 15th is exactly 6/31 everywhere. The oracle
    states the closed-form expectations (k, true, true, 6/31, 0) —
    DuckDB needs no months_between at all, making this a one-sided
    semantic pin of the Spark builtin."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 23 == 0)
    d = F.col("o_orderdate").cast("date")
    k = (F.col("o_orderkey") % 7).cast("int")
    d15 = F.expr("date_add(date_trunc('month', o_orderdate), 14)").cast("date")
    return o.select(
        "o_orderkey",
        k.cast("double").alias("k"),
        (
            F.months_between(F.last_day(F.add_months(d, k)), F.last_day(d))
            == k.cast("double")
        ).alias("eq_lastday"),
        (F.months_between(F.add_months(d15, k), d15) == k.cast("double")).alias(
            "eq_midmonth"
        ),
        F.round(F.months_between(F.date_add(d15, 6), d15), 6).alias("frac_6d"),
        F.months_between(d, d).alias("zero_self"),
    )


@query(
    "fn_try_url_parse",
    "§2.8 try_parse_url (NULL-on-malformed URL extraction, Spark 4)",
    """
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN concat(source, '.example.com')
             WHEN 2 THEN concat(source, '.files.net') END AS host,
           CASE doc_id % 4
             WHEN 0 THEN 'https'
             WHEN 2 THEN 'ftp' END AS proto,
           CASE doc_id % 4 WHEN 0 THEN lang END AS lang_param,
           doc_id % 4 IN (1, 3) AS is_malformed
    FROM documents WHERE doc_id < 400
    """,
)
def fn_try_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_parse_url — the filter-don't-fail form of fn_url_battery's
    parse_url, the difference that matters on crawl data where a
    visible fraction of URLs are garbage: malformed inputs (embedded
    spaces, scheme-less '://...') yield NULL instead of raising under
    ANSI mode, so one projection cleanses and extracts in a single
    pass with no try/except UDF. URLs are constructed from document
    columns in four shapes (https with a query param, free text, ftp
    with a port, malformed scheme), and the oracle derives every
    expected HOST/PROTOCOL/QUERY-param straight from doc_id % 4 and
    the source/lang columns — DuckDB never parses a URL. NULL-ness
    itself is part of the checked contract (is_malformed)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
                F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
            ),
        )
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("not a url "), F.col("doc_id").cast("string")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("ftp://"), F.col("source"), F.lit(".files.net:2121/x")),
        )
        .otherwise(F.concat(F.lit("://missing"), F.col("doc_id").cast("string")))
    )
    return d.withColumn("url", url).select(
        "doc_id",
        F.expr("try_parse_url(url, 'HOST')").alias("host"),
        F.expr("try_parse_url(url, 'PROTOCOL')").alias("proto"),
        F.expr("try_parse_url(url, 'QUERY', 'lang')").alias("lang_param"),
        F.expr("try_parse_url(url, 'HOST') IS NULL").alias("is_malformed"),
    )


@query(
    "fn_array_mutation_battery",
    "§2.8 array mutation functions (array_insert incl. negative index, compact, prepend/append)",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0
                THEN concat(a, ',N,', b, ',', c) ELSE concat(a, ',', b, ',', c) END
             AS joined_raw,
           concat(a, ',', b, ',', c) AS joined_compact,
           concat(a, ',', b, ',', c, ',99') AS joined_insert_tail,
           concat('0,', a, ',', b, ',', c, ',9') AS joined_pre_app,
           CAST(CASE WHEN o_orderkey % 2 = 0 THEN 4 ELSE 3 END AS INTEGER) AS n_raw,
           CAST(3 AS INTEGER) AS n_compact
    FROM (
      SELECT o_orderkey,
             CAST(o_orderkey % 7 AS VARCHAR) AS a,
             CAST(o_orderkey % 5 AS VARCHAR) AS b,
             CAST(o_orderkey % 3 AS VARCHAR) AS c
      FROM orders WHERE o_orderkey % 29 = 0
    )
    """,
)
def fn_array_mutation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-3.5/4 array MUTATION additions over arrays built from
    order keys (every even key carries an embedded NULL):
    array_compact (drop nulls, order preserved), array_insert with a
    NEGATIVE index (-1 appends AFTER the last element — the
    off-by-one everyone gets wrong; pinned here as ...,99 at the
    tail), array_prepend/array_append, and size() before/after.
    Arrays render through array_join(…, ',', 'N') so NULL placement
    is part of the checked value; the oracle rebuilds every string
    from the same modular arithmetic — DuckDB list semantics (which
    differ around NULLs) never enter the comparison."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 29 == 0)
        .select(
            "o_orderkey",
            F.expr(
                """
                CASE WHEN o_orderkey % 2 = 0
                     THEN array(CAST(o_orderkey % 7 AS STRING), CAST(NULL AS STRING),
                                CAST(o_orderkey % 5 AS STRING), CAST(o_orderkey % 3 AS STRING))
                     ELSE array(CAST(o_orderkey % 7 AS STRING),
                                CAST(o_orderkey % 5 AS STRING), CAST(o_orderkey % 3 AS STRING))
                END
                """
            ).alias("arr"),
        )
    )
    compact = F.array_compact("arr")
    return o.select(
        "o_orderkey",
        F.array_join("arr", ",", "N").alias("joined_raw"),
        F.array_join(compact, ",").alias("joined_compact"),
        F.array_join(F.array_insert(compact, -1, F.lit("99")), ",").alias(
            "joined_insert_tail"
        ),
        F.array_join(
            F.array_append(F.array_prepend(compact, F.lit("0")), F.lit("9")), ","
        ).alias("joined_pre_app"),
        F.size("arr").alias("n_raw"),
        F.size(compact).alias("n_compact"),
    )


@query(
    "fn_levenshtein_bounded",
    "§2.8 bounded levenshtein (threshold arg: early-exit -1 beyond k, Spark 4)",
    """
    SELECT d1.doc_id AS da, d2.doc_id AS db,
           CASE WHEN levenshtein(substr(d1.text, 1, 30), substr(d2.text, 1, 30)) <= 5
                THEN levenshtein(substr(d1.text, 1, 30), substr(d2.text, 1, 30))
                ELSE -1 END AS lev5,
           levenshtein(substr(d1.text, 1, 30), substr(d2.text, 1, 30)) <= 5 AS within5
    FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
    WHERE d1.doc_id % 7 = 0 AND d1.doc_id < 700
    """,
)
def fn_levenshtein_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-argument levenshtein(s1, s2, k) — Spark's banded DP that
    stops the moment the distance provably exceeds k and returns -1,
    turning the O(|s1|·|s2|) table into an O(k·max_len) band. This is
    the form a dedup verify stage should call (llm_dedup_edit_distance
    documents the same cap applied AFTER the fact; the threshold arg
    pushes it INTO the DP). Semantics pinned against DuckDB computing
    the full distance and applying the cap arithmetically: identical
    answers, different asymptotics. Adjacent-doc pairs via an
    equi-join keep the pair count linear."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 30).alias("t")
    )
    a = d.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 700)).select(
        F.col("doc_id").alias("da"), F.col("t").alias("ta")
    )
    b = d.select((F.col("doc_id") - 1).alias("da"), F.col("t").alias("tb"),
                 F.col("doc_id").alias("db"))
    j = a.join(b, "da")
    return j.select(
        "da",
        "db",
        F.expr("levenshtein(ta, tb, 5)").alias("lev5"),
        (F.expr("levenshtein(ta, tb, 5)") >= 0).alias("within5"),
    )


# Round-9 (SURVEY §2.18): IPv4 / CIDR arithmetic — the web-crawl
# hygiene primitive (datacenter/bot IP-range filters over access
# metadata).  No inet type on either engine's default surface, so the
# battery exercises the portable arithmetic form: dotted-quad <->
# uint32 via split + positional casts, CIDR membership as an integer
# range join against a broadcast block table.
_IPV4_ORACLE = """
WITH ips AS (
  SELECT user_id,
         concat(CAST(10 + user_id % 3 AS STRING), '.',
                CAST((user_id * 7) % 256 AS STRING), '.',
                CAST((user_id * 13) % 256 AS STRING), '.',
                CAST((user_id * 29) % 256 AS STRING)) AS ip
  FROM (SELECT DISTINCT user_id FROM events) u
),
parsed AS (
  SELECT user_id, ip,
         CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
         + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
         + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
         + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_int
  FROM ips
),
blocks(label, base, blocksize) AS (
  VALUES ('corp_10_0', CAST(167772160 AS BIGINT), CAST(65536 AS BIGINT)),
         ('corp_10_1', CAST(167837696 AS BIGINT), CAST(65536 AS BIGINT)),
         ('scanner_11', CAST(184549376 AS BIGINT), CAST(16777216 AS BIGINT))
),
matched AS (
  SELECT p.user_id, p.ip_int, COALESCE(b.label, 'public') AS label
  FROM parsed p
  LEFT JOIN blocks b
    ON p.ip_int >= b.base AND p.ip_int < b.base + b.blocksize
)
SELECT label, CAST(count(*) AS BIGINT) AS n_ips,
       CAST(min(ip_int) AS BIGINT) AS min_ip_int,
       CAST(max(ip_int) AS BIGINT) AS max_ip_int
FROM matched GROUP BY label
"""


@query(
    "fn_ipv4_cidr_battery",
    "§2.18 IPv4 parse/format + CIDR-range membership (broadcast range join)",
    _IPV4_ORACLE,
)
def fn_ipv4_cidr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted-quad IPv4 handling without an inet type: format octets
    from integers, parse back via split + positional casts into a
    uint32, and classify against CIDR blocks expressed as
    [base, base + 2^(32-prefix)) integer ranges — 10.0.0.0/16,
    10.1.0.0/16, 11.0.0.0/8 here.  The block table is a 3-row
    broadcast; membership is a non-equi range join whose inner side
    is constant-size, so the scan side never shuffles (the same
    broadcast-band shape as join_range_band, at dim-table size 3).
    Spark side splits with split(ip, '\\\\.') (element_at is 1-based,
    matching DuckDB's list indexing); the oracle uses string_split —
    same octet math, same BIGINT arithmetic, no shift operators (the
    63-bit DuckDB << trap is moot with plain multiplication)."""
    ev = load(spark, sf_dir, "events").select("user_id").distinct()
    ips = ev.select(
        "user_id",
        F.concat(
            (F.lit(10) + F.col("user_id") % 3).cast("string"),
            F.lit("."),
            ((F.col("user_id") * 7) % 256).cast("string"),
            F.lit("."),
            ((F.col("user_id") * 13) % 256).cast("string"),
            F.lit("."),
            ((F.col("user_id") * 29) % 256).cast("string"),
        ).alias("ip"),
    )
    o = lambda i: F.element_at(F.split("ip", "\\."), i).cast("bigint")  # noqa: E731
    parsed = ips.select(
        "user_id",
        "ip",
        (o(1) * 16777216 + o(2) * 65536 + o(3) * 256 + o(4)).alias("ip_int"),
    )
    blocks = spark.createDataFrame(
        [
            ("corp_10_0", 167772160, 65536),
            ("corp_10_1", 167837696, 65536),
            ("scanner_11", 184549376, 16777216),
        ],
        "label string, base bigint, blocksize bigint",
    )
    matched = parsed.join(
        F.broadcast(blocks),
        (F.col("ip_int") >= F.col("base"))
        & (F.col("ip_int") < F.col("base") + F.col("blocksize")),
        "left",
    ).select(
        "user_id", "ip_int", F.coalesce("label", F.lit("public")).alias("label")
    )
    return matched.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ips"),
        F.min("ip_int").cast("bigint").alias("min_ip_int"),
        F.max("ip_int").cast("bigint").alias("max_ip_int"),
    )


# Spherical-geo battery — queued for the round-10 official run.  One
# SQL text in both engines: coordinates are exact integer centidegrees
# derived from the key (join_spatial_grid's synthesis trick), the
# haversine is one fixed trig expression on those integers, so both
# engines evaluate the identical double formula.
_HAVERSINE_SQL = """
WITH pts AS (
  SELECT c_custkey AS k,
         (CAST(c_custkey * 37 % 18000 AS DOUBLE) / 100 - 90) AS lat,
         (CAST(c_custkey * 73 % 36000 AS DOUBLE) / 100 - 180) AS lon
  FROM customer
),
wh AS (
  SELECT * FROM (VALUES
    (0, 40.71, -74.0), (1, 51.51, -0.13), (2, 35.68, 139.69)
  ) AS w(wid, wlat, wlon)
),
dist AS (
  SELECT pts.k, wh.wid,
         2 * 6371.0088 * asin(sqrt(
           pow(sin(radians(wh.wlat - pts.lat) / 2), 2)
           + cos(radians(pts.lat)) * cos(radians(wh.wlat))
             * pow(sin(radians(wh.wlon - pts.lon) / 2), 2)
         )) AS km
  FROM pts CROSS JOIN wh
),
nearest AS (
  SELECT k, min_by(wid, km) AS wid, min(km) AS km
  FROM dist GROUP BY k
)
SELECT wid AS warehouse_id,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(km), 4) AS min_km,
       round(max(km), 4) AS max_km,
       round(avg(km), 4) AS avg_km
FROM nearest GROUP BY wid
"""


@query(
    "fn_geo_haversine_battery",
    "§2.19 spherical geo battery: haversine nearest-warehouse assignment",
    _HAVERSINE_SQL,
)
def fn_geo_haversine_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance surface: each customer (synthetic
    lat/lon from the key — join_spatial_grid's deterministic
    centidegree trick, so the fixture needs no geo columns) is
    assigned to the nearest of three warehouses by HAVERSINE distance
    (mean Earth radius 6371.0088 km), reported as per-warehouse
    counts and distance stats.  min_by picks the argmin in one
    aggregate — no rank window.

    Shape at any SF: the 3-row warehouse table cross-joins as a
    broadcast (3x fan-out, the spatial-grid replication pattern),
    one hash agg per customer, one 3-row finish — the customer table
    is scanned once and never shuffled except by the final two
    aggregates.  Parity: the trig expression is the same SQL text on
    integer-derived doubles in both engines; libm sin/cos agree to
    the ulp on these inputs, and the 4dp rounding absorbs anything
    smaller (argmin flips would need two warehouses equidistant to
    ~1e-12 km — excluded by the deterministic fixture, verified by
    the oracle at every SF).  At 100 TB a real geo assignment adds a
    coarse geohash pre-filter so each point only scores nearby
    warehouses (the join_spatial_grid blocking); with 3 warehouses
    the dense cross join IS the right plan."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(_HAVERSINE_SQL)
