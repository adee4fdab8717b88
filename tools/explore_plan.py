from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]").appName("explore")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
j = df.join(o, df.l_orderkey==o.o_orderkey).groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("sq"))
qe = j._jdf.queryExecution()
plan = qe.analyzed()
print("plan class:", plan.getClass().getName())
print("children size:", plan.children().size())
def walk(node, depth=0):
    name = node.getClass().getSimpleName()
    print("  "*depth + name)
    if name == "LogicalRelation":
        rel = node.relation()
        print("  "*depth, " relation:", rel.getClass().getSimpleName())
        try:
            loc = rel.location()
            rp = loc.rootPaths()
            print("  "*depth, " rootPaths:", [rp.apply(i).toString() for i in range(rp.size())])
            print("  "*depth, " format:", rel.fileFormat().toString())
        except Exception as e:
            print("  "*depth, " loc err:", e)
        ct = node.catalogTable()
        print("  "*depth, " catalogTable defined:", ct.isDefined())
        out = node.output()
        print("  "*depth, " output:", [(out.apply(i).name(), out.apply(i).dataType().simpleString(), out.apply(i).exprId().id()) for i in range(min(3,out.size()))])
    ch = node.children()
    for i in range(ch.size()):
        walk(ch.apply(i), depth+1)
walk(plan)
# Project node expressions
print("=== project/aggregate expression access ===")
p = df.select((F.col("l_quantity")*2).alias("q2"), "l_orderkey")
pn = p._jdf.queryExecution().analyzed()
print(pn.getClass().getSimpleName())
pl = pn.projectList()
for i in range(pl.size()):
    ne = pl.apply(i)
    refs = ne.references()
    it = refs.iterator()
    rr = []
    while it.hasNext():
        a = it.next()
        rr.append((a.name(), a.exprId().id()))
    print(ne.name(), ne.exprId().id(), "<-", rr)
# aggregate node
an = j._jdf.queryExecution().analyzed()
print(an.getClass().getSimpleName())
ae = an.aggregateExpressions()
for i in range(ae.size()):
    ne = ae.apply(i)
    it = ne.references().iterator()
    rr=[]
    while it.hasNext():
        a=it.next(); rr.append((a.name(), a.exprId().id()))
    print(ne.name(), "<-", rr)
print("inputFiles:", j.inputFiles()[:2])
spark.stop()
