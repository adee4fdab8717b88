"""t1-style smoke: entry() runs, registry loads, lineage emits."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "o_orderstatus",
        "l_returnflag",
        "sum_qty",
        "sum_disc_price",
        "avg_disc",
        "count_order",
    }


def test_registry_contract(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 9
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str), name
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_flagship_lineage_report(spark, sf_dir):
    from spark_lineage_spark import InMemoryReporter, LineageSession
    from spark_lineage_spark.operators.relational import flagship_df

    rep = InMemoryReporter()
    engine = LineageSession(spark, reporter=rep)
    engine._wrap(flagship_df(spark, sf_dir)).count()
    report = rep.last()
    assert report.input_names() == ["lineitem", "orders"]
    kinds = {i.kind for i in report.inputs}
    assert kinds == {"path"}
    assert report.run.func_name == "count"
    # column lineage: sum_qty derives from lineitem.l_quantity only
    by_out = {c.output: c.inputs for c in report.columns}
    assert by_out["sum_qty"] == ["lineitem.l_quantity"]
    assert by_out["count_order"] == []
    assert by_out["sum_disc_price"] == ["lineitem.l_discount", "lineitem.l_extendedprice"]
    assert by_out["o_orderstatus"] == ["orders.o_orderstatus"]
