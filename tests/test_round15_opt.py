"""Focused tests for the round-15 OPTIMIZATION changes (ADVICE r14
hardening + scale-knob parameterization). Same discipline as
test_round14_opt.py: every behavior-adjacent change gets a fast
in-unit pin so a future edit that breaks the equivalence argument
fails before the oracle gate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# -- session.py: spark.sql.shuffle.partitions "auto" sentinel ----------


def test_shuffle_partitions_auto_resolves_to_parallelism(spark):
    from spark_lineage_spark.session import RUNTIME_CONFS, _resolve_conf

    assert RUNTIME_CONFS["spark.sql.shuffle.partitions"] == "auto"
    assert os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") is None
    assert _resolve_conf(spark, "spark.sql.shuffle.partitions", "auto") == str(
        spark.sparkContext.defaultParallelism
    )
    # non-sentinel values pass through untouched (the determinism test
    # patches explicit counts through RUNTIME_CONFS)
    assert _resolve_conf(spark, "spark.sql.shuffle.partitions", "3") == "3"


def test_shuffle_partitions_env_override(spark, monkeypatch):
    from spark_lineage_spark.session import _resolve_conf

    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "7")
    assert _resolve_conf(spark, "spark.sql.shuffle.partitions", "auto") == "7"


def test_tune_runtime_sets_numeric_shuffle_partitions(spark):
    from spark_lineage_spark.session import tune_runtime

    tune_runtime(spark)
    val = spark.conf.get("spark.sql.shuffle.partitions")
    assert val == str(spark.sparkContext.defaultParallelism)
    int(val)  # must be numeric — the sentinel itself must never land


# -- dedup.py: input-size helpers handle URI schemes (ADVICE r14) ------


def test_local_input_bytes_handles_file_uris(tmp_path):
    from spark_lineage_spark.operators.dedup import _local_input_bytes

    p = tmp_path / "x.bin"
    p.write_bytes(b"abcde")
    for form in (str(p), f"file:{p}", f"file://{p}"):
        assert _local_input_bytes([form]) == 5, form


def test_local_input_bytes_remote_scheme_returns_none():
    from spark_lineage_spark.operators.dedup import _local_input_bytes

    assert _local_input_bytes(["hdfs://nn:8020/warehouse/t/part-0.parquet"]) is None
    assert _local_input_bytes(["s3a://bucket/key.parquet"]) is None
    # mixed local+remote must not silently under-count
    assert _local_input_bytes(["/tmp/nope_local.parquet", "s3a://b/k"]) is None


def test_est_scan_partitions_still_sized_from_local_files(spark):
    from spark_lineage_spark.operators.dedup import est_scan_partitions
    from spark_lineage_spark.tables import load

    docs = load(spark, SF, "documents")
    # one small local parquet file -> exactly one estimated partition
    assert est_scan_partitions(docs) == 1


# -- aggregates.py: agg_count_distinct NULL-key semantics (ADVICE r14) -


def test_count_distinct_split_ignores_null_keys(spark, tmp_path):
    """count(DISTINCT l_orderkey) ignores NULLs; the split form's
    group-then-count must not count a NULL-key group (latent on the
    non-null fixtures — exercised here with an injected NULL)."""
    from spark_lineage_spark.registry import load_all

    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    with_null = li.unionByName(
        li.limit(3).withColumn("l_orderkey", F.lit(None).cast("bigint"))
    )
    d = str(tmp_path / "sfnull")
    os.makedirs(d, exist_ok=True)
    with_null.write.parquet(os.path.join(d, "lineitem.parquet"))

    out = load_all()["agg_count_distinct"].builder(spark, d)
    ref = (
        spark.read.parquet(os.path.join(d, "lineitem.parquet"))
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    key = lambda df: sorted(
        (r["l_returnflag"], r["n_orders"], r["n_supp"], r["n_rows"])
        for r in df.collect()
    )
    assert key(out) == key(ref)


# -- aggregates.py: MAD deviation pass in exact cents-as-long ----------


def test_mad_cents_path_matches_decimal_reference(spark):
    """The r15 rewrite replaced the decimal(18,2) deviation arithmetic
    with exact cents-as-long (guide §2.3 narrower types; the decimal
    abs measured 0.90 s vs 0.31 s per fact pass). Pin the equivalence
    on the full sf0.001 fixture: the shipped op must equal a direct
    decimal-path reference computed the pre-rewrite way, including the
    rounding/tie discipline (same selected row under the monotone
    cents bijection)."""
    import math

    import numpy as np
    import pandas as pd

    from spark_lineage_spark.registry import load_all

    got = {
        r.l_returnflag: r
        for r in load_all()["agg_median_abs_deviation"].builder(spark, SF).collect()
    }
    li = pd.read_parquet(os.path.join(SF, "lineitem.parquet"))
    for flag, grp in li.groupby("l_returnflag"):
        x = np.sort(grp.l_extendedprice.to_numpy())
        n = len(x)
        med = x[math.ceil(0.5 * n) - 1]
        # decimal-path reference: exact 2dp arithmetic in integer cents
        cents = np.rint(x * 100).astype(np.int64)
        med_c = int(round(med * 100))
        ad = np.sort(np.abs(cents - med_c))
        mad_c = int(ad[math.ceil(0.5 * n) - 1])
        r = got[flag]
        assert r.n == n
        assert r.median == round(float(med), 2)
        # bit-identical, not approx: cents/100.0 and decimal->double
        # both produce the nearest double to the same exact 2dp value
        assert r.mad == round(mad_c / 100.0, 2)


# -- multimodal.py: alignment text fold -> explode + conditional sums --


def test_multimodal_alignment_matches_hof_fold_reference(spark):
    """The r15 rewrite replaced the per-token HOF array fold with
    explode + one 8-way conditional-sum aggregation (guide §4.1: the
    fold allocated an 8-long array per token in the interpreted
    evaluator; A/B 1.87 s -> 1.06 s). Pin equivalence against the
    pre-rewrite fold computed inline, including the zero-vector
    drop semantics (a doc whose tokens cancel, or that has none,
    must stay absent either way)."""
    from pyspark.sql import functions as F

    from spark_lineage_spark.operators.multimodal import ALIGN_DIMS, _media_chunk_vec
    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.tables import load

    got = (
        load_all()["llm_multimodal_alignment"].builder(spark, SF).toPandas()
    )

    d = load(spark, SF, "documents").filter(F.col("text").isNotNull())
    hashes = F.expr(
        "transform(filter(split(text, ' '), t -> length(t) > 0),"
        " t -> cast(conv(substring(md5(cast(t AS BINARY)), 1, 15), 16, 10)"
        " AS BIGINT))"
    )
    tvec = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), ALIGN_DIMS),
        lambda acc, h: F.transform(
            acc,
            lambda x, i: x
            + F.when(
                h % ALIGN_DIMS == i.cast("long"),
                F.when(h.bitwiseAND(F.lit(8)) != 0, F.lit(1)).otherwise(F.lit(-1)),
            ).otherwise(F.lit(0)),
        ),
    )
    t = d.select("doc_id", tvec.alias("tvec"))
    mv = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("blob")).mapInPandas(
        _media_chunk_vec, schema="doc_id long, mvec array<long>"
    )

    def ldot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    ref = (
        t.join(mv, "doc_id")
        .select(
            "doc_id",
            ldot(F.col("tvec"), F.col("mvec")).alias("tc"),
            ldot(F.col("tvec"), F.col("tvec")).alias("tt"),
            ldot(F.col("mvec"), F.col("mvec")).alias("cc"),
        )
        .filter((F.col("tt") > 0) & (F.col("cc") > 0))
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0, F.lit("image/png"))
            .when(F.col("doc_id") % 10 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("text/plain"))
            .alias("media_type"),
            F.round(
                F.col("tc").cast("double")
                / (
                    F.sqrt(F.col("tt").cast("double"))
                    * F.sqrt(F.col("cc").cast("double"))
                ),
                6,
            ).alias("align_cos"),
        )
        .orderBy("align_cos", "doc_id")
        .limit(10)
        .toPandas()
    )
    assert got.equals(ref)


# -- analytics.py: AD close with literal scalars + fused harmonic job --


def test_ad_close_template_recomposes_exactly():
    """The r15 split of _AD_CLOSE_SQL into _AD_TOT_SQL + _AD_CLOSE_TAIL
    must keep the oracle text byte-identical (the oracle composes the
    relational tot; the Spark builder substitutes literal 1-row
    relations)."""
    from spark_lineage_spark.operators.analytics import (
        _AD_CLOSE_SQL,
        _AD_CLOSE_TAIL,
        _AD_TOT_SQL,
    )

    assert _AD_CLOSE_SQL == _AD_TOT_SQL + _AD_CLOSE_TAIL
    assert _AD_CLOSE_SQL.lstrip().startswith("tot AS (")
    assert "{cum}" in _AD_TOT_SQL and "{har}" in _AD_CLOSE_TAIL


def test_ad_two_sample_literal_close_matches_relational(spark):
    """The rewritten builder inlines n1/n2/n/h2n1/g2 as literal 1-row
    relations and fuses the h2n1+g2 collects into one job. Pin the
    result against the pre-rewrite form (relational tot from cum,
    separate h2n1 collect, har temp view) on sf0.001."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_lineage_spark.operators.analytics import (
        _AD_CLOSE_SQL,
        _two_sample_cum_df,
    )
    from spark_lineage_spark.registry import load_all

    got = load_all()["stats_ad_two_sample"].builder(spark, SF).toPandas()

    cum = _two_sample_cum_df(spark, SF, "purchase", "click")
    cum.createOrReplaceTempView("t15_ad_cum_ref")
    n1, n2 = cum.agg(
        F.sum("ca").cast("bigint"), F.sum("cv").cast("bigint")
    ).collect()[0]
    n = int(n1) + int(n2)
    ser = spark.range(1, n).select(
        F.col("id").alias("m"),
        F.expr("CAST(round(1e15 / id) AS BIGINT)").alias("tm"),
        F.expr("id div 65536").alias("bucket"),
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        ser.groupBy("bucket")
        .agg(F.sum("tm").alias("bt"))
        .select("bucket", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("off"))
    )
    w = Window.partitionBy("bucket").orderBy("m")
    hcum = ser.join(F.broadcast(boff), "bucket").select(
        "m", (F.sum("tm").over(w) + F.col("off")).cast("bigint").alias("h2")
    )
    h2n1 = int(ser.agg(F.sum("tm")).collect()[0][0])
    g2 = int(
        hcum.filter(F.col("m") <= n - 2)
        .select(
            F.expr(
                f"CAST(round((CAST({h2n1} - h2 AS DOUBLE) / 1000000000000000)"
                f" / ({n} - m) * 1000000000000) AS BIGINT)"
            ).alias("gt")
        )
        .agg(F.sum("gt"))
        .collect()[0][0]
    )
    spark.createDataFrame(
        [(h2n1, g2)], "h2n1 BIGINT, g2 BIGINT"
    ).createOrReplaceTempView("t15_ad_har_ref")
    ref = spark.sql(
        "WITH " + _AD_CLOSE_SQL.format(cum="t15_ad_cum_ref", har="t15_ad_har_ref")
    ).toPandas()
    assert got.equals(ref)


# -- dedup.py: rarity prefixes keyed on xxhash64 internally ------------


def test_hash_ordered_prefixes_same_verified_pairs(spark):
    """_rarity_prefixes now aggregates/joins/sorts on xxhash64(shingle)
    (guide §2.3 narrower types; most shingles tie at df=1 so the old
    (df, shingle) sort compared strings on nearly every row). The
    candidate set may shift under the new total order (df, hash,
    shingle) — recall stays exactly 1 by the order-agnostic prefix
    theorem — and the exact verify stage must make the DECLARED output
    identical to the old string-ordered path."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_lineage_spark.operators import dedup as D

    sh = D._shingle_index(spark, SF)

    def pref_string_order(sh, threshold):
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
        w = Window.partitionBy("doc_id").orderBy("df", "shingle")
        return (
            sh.join(df_counts, "shingle")
            .withColumn("pos", F.row_number().over(w))
            .join(sizes, "doc_id")
            .filter(
                F.col("pos")
                <= F.floor(
                    (1 - threshold) * F.col("n") + F.col("n") * 1e-12 + 1e-9
                )
                + 1
            )
            .select("doc_id", "shingle", "n")
        )

    def pairs_from(pref, threshold=0.8):
        a, b = pref.alias("a"), pref.alias("b")
        t10 = int(round(threshold * 10))
        size_ok = ((F.lit(10) * F.col("a.n")) >= (F.lit(t10) * F.col("b.n"))) & (
            (F.lit(10) * F.col("b.n")) >= (F.lit(t10) * F.col("a.n"))
        )
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & size_ok,
            )
            .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .distinct()
            .transform(D._stage_candidates)
        )
        return D._verify_exact_jaccard(sh, cand, threshold)

    got = (
        D._jaccard_pairs_from_shingles(sh)
        .toPandas()
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    ref = (
        pairs_from(pref_string_order(sh, 0.8))
        .toPandas()
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    assert got.equals(ref)
    # and the new-order candidates still form a superset of the
    # verified pairs (recall 1): every verified pair is a candidate
    new_cand = set(
        map(
            tuple,
            D._jaccard_pairs_from_shingles(sh).select("da", "db").collect(),
        )
    )
    assert set(map(tuple, ref[["da", "db"]].itertuples(index=False))) <= new_cand


# -- streaming: flush sentinels as JVM literals ------------------------


def test_flush_sentinel_matches_createdataframe_row(spark):
    """The r15 sentinel helper builds the flush row from range(1) +
    literals (a createDataFrame local relation pays a multi-second
    handshake per file write). Pin value-and-schema equality against
    the old positional createDataFrame construction."""
    import datetime

    from pyspark.sql import functions as F

    from spark_lineage_spark.streaming.queries import _flush_sentinel
    from spark_lineage_spark.tables import load

    ev = load(spark, SF, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    for hours, uid, etype in ((48, 0, "flush"), (48, -1, "purchase"), (96, -1, "click")):
        new = _flush_sentinel(spark, ev.schema, max_ts, hours, uid, etype)
        old = spark.createDataFrame(
            [(int(-1), max_ts, int(uid), etype, float(0.0), None)], ev.schema
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {hours} HOURS"))
        # literal columns come out non-nullable — stricter than the
        # createDataFrame row and safe under the streaming read schema
        # (taken from the b0 data file); names/types/values must match.
        assert [(f.name, f.dataType) for f in new.schema.fields] == [
            (f.name, f.dataType) for f in old.schema.fields
        ]
        assert new.collect() == old.collect()


# -- text.py: llm_text_repetition explode floor ------------------------


def test_text_repetition_explode_floored_at_core_width(spark):
    """The byte-derived explode sizing collapses to 1 on the
    single-file fixture, serializing the whole tokenize+explode+agg
    pipeline on one task (measured 1.13 s vs 0.39 s at core width).
    Pin that the plan repartitions by doc_id at >= defaultParallelism
    before the explode."""
    from spark_lineage_spark.registry import load_all

    df = load_all()["llm_text_repetition"].builder(spark, SF)
    plan = df._jdf.queryExecution().toString()
    par = spark.sparkContext.defaultParallelism
    assert f"hashpartitioning(doc_id" in plan
    assert f", {par})" in plan


# -- analytics.py: VAR close normalizes the sign of zero ---------------


def test_var_stability_no_negative_zero(spark):
    """The shared VAR close rounds four near-zero coefficients; DuckDB's
    round keeps -0.0 while Spark's BigDecimal round cannot produce it,
    so a tiny-negative coefficient diverged as '0.0' vs '-0.0' under
    the driver's string compare (observed at sf0.001). The `+ 0` in the
    final SELECT normalizes both engines to +0.0 and is the exact
    identity for every other double. Spark-side outputs are
    bit-identical with and without it."""
    from spark_lineage_spark.operators.analytics import _VAR_SQL
    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.tables import register_views

    assert "round(a21, 6) + 0 AS a_cnt_rev" in _VAR_SQL
    register_views(spark, SF, ["orders"])
    with_fix = spark.sql(_VAR_SQL.format(prev="date_add(b.d, 1)")).collect()
    without = spark.sql(
        _VAR_SQL.replace(" + 0 AS a_", " AS a_").format(prev="date_add(b.d, 1)")
    ).collect()
    assert with_fix == without
    row = load_all()["ts_var_stability"].builder(spark, SF).collect()[0]
    import math

    for c in ("a_rev_rev", "a_rev_cnt", "a_cnt_rev", "a_cnt_cnt"):
        v = row[c]
        assert not (v == 0.0 and math.copysign(1.0, v) < 0), c


# -- similarity.py: PQ self-norms precomputed outside the join ---------


def test_pq_adc_matches_inline_norm_reference(spark):
    """The r15 change hoists dot(sub,sub)/dot(cent,cent) out of the
    (vector-subspace) x centroid distance join. Same folds over the
    same operands combined in the same a - b + c order, so every
    rounded d2 and the final ranking must be bit-identical to the old
    inline form, replicated here."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_lineage_spark.functions.arrays import (
        dot,
        l2_normalize,
        to_double_array,
    )
    from spark_lineage_spark.operators import similarity as S
    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.tables import load

    got = (
        load_all()["llm_ann_pq_adc"].builder(spark, SF)
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )

    e = (
        S._parallel_corpus(spark, load(spark, SF, "embeddings"))
        .select("vec_id", to_double_array("embedding").alias("emb0"))
        .select("vec_id", l2_normalize(F.col("emb0")).alias("emb"))
    )
    h = F.md5(F.concat(F.lit("pqseed:"), F.col("vec_id").cast("string")))
    seeds = e.select("vec_id", "emb", h.alias("h")).orderBy("h", "vec_id").limit(S.PQ_K)
    jw = Window.orderBy("h", "vec_id")
    subspaces = spark.range(S.PQ_M).select(F.col("id").cast("int").alias("s"))
    cents = (
        seeds.withColumn("j", F.row_number().over(jw) - 1)
        .crossJoin(F.broadcast(subspaces))
        .select(
            "s", "j",
            F.slice("emb", F.col("s") * S.PQ_SUBDIM + 1, S.PQ_SUBDIM).alias("cent"),
        )
    )
    subs = e.crossJoin(F.broadcast(subspaces)).select(
        "vec_id", "s",
        F.slice("emb", F.col("s") * S.PQ_SUBDIM + 1, S.PQ_SUBDIM).alias("sub"),
    )
    d2 = F.round(
        dot(F.col("sub"), F.col("sub"))
        - 2 * dot(F.col("sub"), F.col("cent"))
        + dot(F.col("cent"), F.col("cent")),
        6,
    )
    dists = subs.join(F.broadcast(cents), "s").select("vec_id", "s", "j", d2.alias("d2"))
    codes = dists.groupBy("vec_id", "s").agg(
        F.min_by("j", F.struct("d2", "j")).alias("code")
    )
    qtab = dists.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("s").alias("qs"), "j",
        F.col("d2").alias("qd2"),
    )
    adc = (
        codes.join(
            F.broadcast(qtab),
            (F.col("s") == F.col("qs")) & (F.col("code") == F.col("j")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("qd2"), 6).alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= S.PQ_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qvec = e.filter(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    rerank = (
        F.broadcast(shortlist)
        .join(F.broadcast(qvec), "query_id")
        .join(e.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            F.round(dot(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    ref = (
        rerank.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") <= S.TOP_K)
        .select("query_id", "neighbor_id", "cos_sim")
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    assert got.equals(ref)


def test_knn_cosine_hoisted_norms_match_inline_cosine(spark):
    """llm_knn_cosine_exact hoists both self-norms out of the
    broadcast pair join (the PQ-ADC precedent). The division keeps the
    exact norm(a)*norm(b) operand order, so the full scored set — not
    just the top-k — must be bit-identical to the inline cosine()."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_lineage_spark.functions.arrays import cosine, to_double_array
    from spark_lineage_spark.operators import similarity as S
    from spark_lineage_spark.registry import load_all
    from spark_lineage_spark.tables import load

    got = (
        load_all()["llm_knn_cosine_exact"].builder(spark, SF)
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    e = S._parallel_corpus(spark, load(spark, SF, "embeddings")).select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < S.N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
        )
    )
    scored = q.join(e, F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.round(cosine(F.col("qemb"), F.col("emb")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    ref = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= S.TOP_K)
        .drop("rn")
        .toPandas()
        .sort_values(["query_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    assert got.equals(ref)
