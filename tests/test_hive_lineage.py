"""Hive-metastore table lineage (VERDICT r1 'what's missing' item 5):
`CreateHiveTableAsSelectCommand` and `InsertIntoHiveTable` plan shapes
through the facade, against an embedded Hive metastore (Derby-backed,
ships with the Spark distro).

`spark.sql.catalogImplementation` is a static conf, so this runs in a
subprocess with its own JVM rather than the shared session fixture.
"""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, os, sys, tempfile
sys.path.insert(0, %(repo)r)
os.chdir(tempfile.mkdtemp(prefix="sls_hive_cwd_"))  # derby.log etc.
from pyspark.sql import SparkSession
wh = tempfile.mkdtemp(prefix="sls_hive_wh_")
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.warehouse.dir", wh)
    .config("spark.ui.enabled", "false")
    .enableHiveSupport()
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from spark_lineage_spark import InMemoryReporter, LineageSession

rep = InMemoryReporter()
eng = LineageSession(spark, reporter=rep)

spark.range(10).selectExpr("id", "id * 2 AS v").createOrReplaceTempView("src_v")
eng.sql("CREATE TABLE hive_ctas STORED AS PARQUET AS SELECT id, v FROM src_v WHERE id > 3")
ctas = rep.last().to_dict()

# parquet-stored hive tables are converted to datasource writes
# (convertMetastoreParquet=true default); a TEXTFILE serde table keeps
# the InsertIntoHiveTable plan shape
eng.sql("CREATE TABLE hive_serde (id BIGINT, v BIGINT) STORED AS TEXTFILE")
eng.sql("INSERT INTO hive_serde SELECT id + 100, v FROM src_v")
ins = rep.last().to_dict()
ins_cls = (
    spark.sql("EXPLAIN EXTENDED INSERT INTO hive_serde SELECT id, v FROM src_v LIMIT 0")
    .collect()[0][0]
)

n = eng._wrap(spark.table("hive_serde")).count()
read = rep.last().to_dict()

print("RESULT:" + json.dumps({"ctas": ctas, "ins": ins, "read": read, "rows": n,
                              "ins_cls": "InsertIntoHiveTable" in ins_cls}))
spark.stop()
"""


def test_hive_ctas_and_insert_lineage():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": repo}],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    res = json.loads(line[len("RESULT:"):])

    ctas = res["ctas"]
    assert ctas["output"]["kind"] == "table"
    assert "hive_ctas" in ctas["output"]["name"]
    assert {f["name"] for f in ctas["output"]["fields"]} == {"id", "v"}

    assert res["ins_cls"], "expected InsertIntoHiveTable in the analyzed plan"
    ins = res["ins"]
    assert ins["output"]["kind"] == "table"
    assert "hive_serde" in ins["output"]["name"]

    read = res["read"]
    assert res["rows"] == 10  # the 10 inserted rows
    assert any(
        i["kind"] == "table" and "hive_serde" in (i["name"] or "") for i in read["inputs"]
    )
