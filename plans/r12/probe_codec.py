"""One process: time shuffle-heavy queries min-of-N under a given
spark.io.compression.codec (immutable at runtime -> process-level A/B).
Usage: probe_codec.py <codec> <cpus> [reps]
Prints one JSON line."""
import json, os, sys, time

codec, cpus = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
os.environ["SPARK_GRAFT_CPUS"] = cpus
sys.path.insert(0, "/root/repo")
from tlcn_oer_lakehouse_spark.session import get_spark
from tlcn_oer_lakehouse_spark.queries import REGISTRY

spark = get_spark(app_name=f"codec_{codec}_{cpus}",
                  extra_conf={"spark.io.compression.codec": codec})
SF = "/root/testdata/sf0.1"
QUERIES = ["dedup_ngram_jaccard", "rec_item_item_cf", "dedup_minhash_incremental"]
out = {"codec": codec, "cpus": cpus}
for q in QUERIES:
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
