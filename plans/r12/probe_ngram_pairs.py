"""Interleaved A/B/C: dedup_ngram_jaccard rare-shingle pair generation.

A: current — sh join rare (df<=max_df) then self-join on shingle + dropDuplicates.
B: sh join rare, then groupBy(shingle).collect_set(doc) (bounded <= max_df
   per group by the rare filter) -> sorted array -> packed C(k,2) combos
   -> distinct on one long -> unpack.
C: B, but rare selection via broadcast LEFT ANTI join against the small
   HOT set (df > max_df) instead of the corpus-scale inner join on rare.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tlcn_oer_lakehouse_spark.session import get_spark
from tlcn_oer_lakehouse_spark.operators.dedup import (
    minhash_doc_arrays, jaccard_verify_arrays,
)
from tlcn_oer_lakehouse_spark.queries.textops import augmented_corpus

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="r12_probe_ngram")
MAX_DF, THRESH, N = 100, 0.5, 3

_persisted = []

def build(variant):
    corpus = augmented_corpus(spark, SF)
    base = minhash_doc_arrays(corpus, "doc_id", "text", N).persist()
    _persisted.append(base)
    docs_arr = base.filter(F.size("tok_arr") > 0).select(
        "doc", "tok_arr", F.size("tok_arr").alias("n_shingles")
    )
    sh = docs_arr.select("doc", F.explode("tok_arr").alias("shingle"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    if variant == "A":
        rare = dfreq.filter(F.col("df") <= MAX_DF).select("shingle")
        sh_rare = sh.join(rare, "shingle")
        pairs = (
            sh_rare.alias("a")
            .join(
                sh_rare.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .dropDuplicates()
        )
    else:
        if variant == "B":
            rare = dfreq.filter(F.col("df") <= MAX_DF).select("shingle")
            sh_rare = sh.join(rare, "shingle")
        else:  # C
            hot = dfreq.filter(F.col("df") > MAX_DF).select("shingle")
            sh_rare = sh.join(F.broadcast(hot), "shingle", "left_anti")
        groups = sh_rare.groupBy("shingle").agg(
            F.array_sort(F.collect_set("doc")).alias("ds")
        )
        if variant == "C":
            # anti-join keeps every rare group; sizes already <= MAX_DF
            groups = groups
        packed = (
            groups.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ds"),
                            lambda x, i: F.transform(
                                F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                                lambda y: F.shiftleft(x, 32).bitwiseOR(y),
                            ),
                        )
                    )
                ).alias("p")
            )
            .distinct()
        )
        pairs = packed.select(
            F.shiftrightunsigned("p", 32).alias("doc_a"),
            F.col("p").bitwiseAND(F.lit((1 << 32) - 1)).alias("doc_b"),
        )
    return jaccard_verify_arrays(pairs, docs_arr).filter(F.col("jaccard") >= THRESH)


def checksum(df):
    r = df.agg(
        F.count(F.lit(1)), F.sum("doc_a"), F.sum("doc_b"),
        F.sum(F.round(F.col("jaccard") * 1e9, 0)),
    ).collect()[0]
    return tuple(r)


def clear():
    spark.catalog.clearCache()
    while _persisted:
        try:
            _persisted.pop().unpersist()
        except Exception:
            pass

VARIANTS = sys.argv[2] if len(sys.argv) > 2 else "ABC"
for v in VARIANTS:
    print(f"checksum {v}:", checksum(build(v)), flush=True)
    clear()

for v in VARIANTS:
    build(v).write.format("noop").mode("overwrite").save()
    clear()
times = {v: [] for v in VARIANTS}
for i in range(4):
    for v in VARIANTS:
        clear()
        df = build(v)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[v].append(time.perf_counter() - t0)
        clear()
for v, ts in times.items():
    ts2 = sorted(ts)
    print(f"RESULT {v}: min {ts2[0]:.3f} med {ts2[len(ts2)//2]:.3f} all {[round(t,3) for t in ts]}")
spark.stop()
