"""Time registry queries from a given repo tree: probe_tree.py <tree> <reps> <q1,q2,...>"""
import json, sys, time
tree, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(",")
sys.path.insert(0, tree)
from tlcn_oer_lakehouse_spark.session import get_spark
from tlcn_oer_lakehouse_spark.queries import REGISTRY
spark = get_spark(app_name=f"tree_probe")
SF = "/root/testdata/sf0.1"
out = {"tree": tree}
for q in names:
    REGISTRY[q].builder(spark, SF).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    ts = []
    for _ in range(reps):
        spark.catalog.clearCache()
        df = REGISTRY[q].builder(spark, SF)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
    out[q] = sorted(ts)
print(json.dumps(out))
spark.stop()
