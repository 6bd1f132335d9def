"""Focused pins for the r11 continuation-pass operator rewrites: each
rewritten internal is compared against a reference implementation of
the OLD form on constructed inputs, so a future edit that changes
values (not just plans) fails here rather than at the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_symmetric_edges_matches_union_form(spark):
    """_symmetric_edges must emit exactly the old `p ∪ swap(p)` row
    multiset — including duplicate orientations already present in the
    input (no distinct is applied inside the helper)."""
    from tlcn_oer_lakehouse_spark.operators.components import _symmetric_edges

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4), (3, 4), (5, 5)], ["a", "b"]
    )
    old = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
    )
    new = _symmetric_edges(pairs, "a", "b")
    old_rows = sorted(map(tuple, old.collect()))
    new_rows = sorted(map(tuple, new.collect()))
    assert new_rows == old_rows


def test_lexical_subject_match_matches_two_pass_reference(spark):
    """The single-pass match (size rides the explode; explode_outer +
    inner-join null drop) must equal the old two-pass + re-join form,
    including docs with empty token arrays."""
    from tlcn_oer_lakehouse_spark.functions.text import shingles, tokens
    from tlcn_oer_lakehouse_spark.operators.matching import (
        lexical_subject_match,
    )
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [
            (1, "spark merge spark merge vector"),
            (2, "vector batch vector batch vector batch"),
            (3, ""),          # empty text → empty shingle array
            (4, "spark"),     # single token → no 2-grams
        ],
        ["doc_id", "text"],
    )
    subjects = spark.createDataFrame(
        [(1, "spark merge"), (2, "vector batch")],
        ["subject_id", "subject_name"],
    )

    def old_match(docs, subjects, shingle_n=2, threshold=0.0, top_k=3):
        doc_shingles = docs.select(
            F.col("doc_id"),
            F.explode(shingles(tokens(F.col("text")), shingle_n)).alias("shingle"),
        )
        doc_sizes = doc_shingles.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_shingles")
        )
        hits = (
            doc_shingles.join(
                F.broadcast(
                    subjects.select(
                        "subject_id", F.col("subject_name").alias("shingle")
                    )
                ),
                "shingle",
            )
            .groupBy("doc_id", "subject_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        scored = (
            hits.join(doc_sizes, "doc_id")
            .select(
                "doc_id",
                "subject_id",
                F.round(F.col("n_hits") / F.col("n_shingles"), 9).alias(
                    "similarity"
                ),
            )
            .filter(F.col("similarity") > threshold)
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("similarity").desc(), F.col("subject_id").asc()
        )
        return scored.withColumn("match_rank", F.row_number().over(w)).filter(
            F.col("match_rank") <= top_k
        )

    cols = ["doc_id", "subject_id", "similarity", "match_rank"]
    old_rows = sorted(map(tuple, old_match(docs, subjects).select(cols).collect()))
    new_rows = sorted(
        map(tuple, lexical_subject_match(docs, subjects).select(cols).collect())
    )
    assert new_rows == old_rows


def test_pq_adc_one_pass_matches_chained_join_reference(spark, sf_dir):
    """The one-corpus-pass PQ-ADC must return exactly the old chained
    per-subspace join form's rows (same est_dist, true_dist, order)."""
    from tlcn_oer_lakehouse_spark.operators.clustering import (
        _sq_l2,
        kmeans_assign_once,
        kmeans_fit,
        pq_adc_topk,
    )
    from tlcn_oer_lakehouse_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") != 0)
    query = emb.filter(F.col("vec_id") == 0)
    id_col, vec_col, m, sub_dim, k, n_iter, topk = (
        "vec_id", "embedding", 4, 16, 4, 1, 10,
    )

    def _sub(df, i, out):
        return df.select(
            *df.columns, F.slice(F.col(vec_col), i * sub_dim + 1, sub_dim).alias(out)
        )

    est = None
    for i in range(m):
        cents = kmeans_fit(
            _sub(emb, i, "__sub").select(id_col, "__sub"), id_col, "__sub", k, n_iter
        )
        codes = kmeans_assign_once(
            _sub(corpus, i, "__sub").select(
                F.col(id_col),
                F.transform(F.col("__sub"), lambda x: x.cast("double")).alias(
                    "__sub"
                ),
            ),
            cents, id_col, "__sub",
        ).select(id_col, F.col("cluster_id"))
        dtab = (
            _sub(query, i, "__qsub")
            .crossJoin(F.broadcast(cents))
            .select(
                F.col("centroid_id").alias("cluster_id"),
                F.round(
                    _sq_l2(
                        F.transform(F.col("__qsub"), lambda x: x.cast("double")),
                        F.col("centroid_vec"),
                    ),
                    9,
                ).alias(f"d{i}"),
            )
        )
        contrib = codes.join(F.broadcast(dtab), "cluster_id").select(id_col, f"d{i}")
        est = contrib if est is None else est.join(contrib, id_col)
    total = F.lit(0.0)
    for i in range(m):
        total = total + F.col(f"d{i}")
    q_full = query.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qv")
    )
    true_d = corpus.crossJoin(F.broadcast(q_full)).select(
        F.col(id_col),
        F.round(
            _sq_l2(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.col("__qv"),
            ),
            9,
        ).alias("true_dist"),
    )
    old = (
        est.select(F.col(id_col), F.round(total, 9).alias("est_dist"))
        .join(true_d, id_col)
        .orderBy(F.col("est_dist").asc(), F.col(id_col).asc())
        .limit(topk)
    )
    new = pq_adc_topk(
        corpus, query, id_col, vec_col,
        train=emb, m=m, sub_dim=sub_dim, k=k, n_iter=n_iter, topk=topk,
    )
    assert [tuple(r) for r in new.collect()] == [tuple(r) for r in old.collect()]


def test_shared_shingle_count_equals_array_intersect(spark):
    """The recall-eval truth rewrite's core claim: for per-doc DISTINCT
    shingle arrays, the shared-shingle join's per-pair row count equals
    size(array_intersect)."""
    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "c"]),
            (2, ["b", "c", "d"]),
            (3, ["x"]),
            (4, ["a", "b", "c"]),
        ],
        ["doc", "tok_arr"],
    )
    sh = docs.select("doc", F.explode("tok_arr").alias("shingle"))
    counted = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    arr = (
        docs.alias("x")
        .crossJoin(docs.alias("y"))
        .where(F.col("x.doc") < F.col("y.doc"))
        .select(
            F.col("x.doc").alias("doc_a"),
            F.col("y.doc").alias("doc_b"),
            F.size(F.array_intersect("x.tok_arr", "y.tok_arr")).alias("inter"),
        )
        .filter(F.col("inter") > 0)
    )
    assert sorted(map(tuple, counted.collect())) == sorted(
        map(tuple, arr.collect())
    )
