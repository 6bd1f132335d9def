"""Repo-side deterministic testdata generator — the sf1.0 hardening
corpus (VERDICT r05 task 1).

Reproduces the driver corpus's SCHEMAS exactly (column names, arrow
types, including timestamp[us] date columns) and its distribution
SHAPES (per-order line-count mixture, 1995-2001 date envelope, 5-lang
document mix, 20-source round-robin, 10-cluster embeddings, exact- and
near-duplicate documents) at any scale factor, under the repo's OWN
seed — /root/testdata/ stays untouched and read-only.

The strict-parity sweep (tools/driver_sim.py with SPARK_GRAFT_SF_DIR
pointed here) compares the repo's Spark plans against its DuckDB
oracles ON THIS DATA, so parity is generator-independent; what the
bigger corpus adds is the scale-calibrated bug class: fixed iteration
budgets, driver-side collects that stop being O(1), skew that only
materializes at volume (the class the sf0.1 sweep caught in
g_pointer_doubling_depth).

Usage:
    python tools/gen_testdata.py --sf 1.0 --out testdata_local/sf1.0
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260814  # repo seed — deliberately NOT the driver's seed=42

VOCAB = (
    "spark merge vector batch part line column order small sort fast value "
    "scan hash slow group agg filter query big key window row table stream "
    "data join customer a the"
).split()

LANGS = ("en", "en", "en", "en", "de", "es", "fr", "zh")  # ~50% en
MKT = ("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
PRIO = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
STATUS = ("F", "O", "P")
PTYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
PNAME_ADJ = ("large", "hot", "blue", "old", "cold", "small", "dark", "new")
# includes "widget": the driver corpus has widget-named parts, and
# without them q9's p_name filter matches ZERO local rows — the r8 sf10
# sweep first ran q9 as a vacuous 0-row probe (parity-green but
# join-stress-free) before this was caught
PNAME_NOUN = ("ring", "bolt", "plate", "case", "wheel", "box", "cap",
              "rod", "widget", "gear")
ETYPES = ("click", "error", "purchase", "signup", "view")
DAY_US = 86_400_000_000


def _ts_us(days_from_epoch):
    return (np.asarray(days_from_epoch, dtype=np.int64) * DAY_US).astype(
        "datetime64[us]"
    )


def gen(sf: float, out: str) -> None:
    rng = np.random.default_rng(SEED)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    os.makedirs(out, exist_ok=True)

    def w(name: str, table: pa.Table) -> None:
        # Bounded row groups: pyarrow's default writes one row group per
        # call (sf1.0 documents = ONE 50k-row group), and Spark cannot
        # split a row group — every scan-heavy plan over such a file
        # runs single-threaded regardless of maxPartitionBytes, which is
        # both a throughput floor and a variance amplifier (one straggler
        # task IS the stage).  4096 rows/group lets the scan fan out the
        # way a real multi-file 100 TB table would.
        pq.write_table(
            table, os.path.join(out, f"{name}.parquet"), row_group_size=4096
        )
        print(f"  {name}: {table.num_rows} rows")

    # -- region / nation ---------------------------------------------------
    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # -- customer / supplier ----------------------------------------------
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(MKT)[rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    # -- part --------------------------------------------------------------
    adj = np.array(PNAME_ADJ)[rng.integers(0, len(PNAME_ADJ), n_part)]
    noun = np.array(PNAME_NOUN)[rng.integers(0, len(PNAME_NOUN), n_part)]
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) % 1000 / 10.0, 2),
    }))

    # -- orders ------------------------------------------------------------
    # 1995-01-01 .. 2001-08-01 (driver envelope)
    d0, d1 = 9131, 11535  # days from epoch
    odate_days = rng.integers(d0, d1 + 1, n_ord)
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUS)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(850.0, 400_000.0, n_ord), 2),
        "o_orderdate": pa.array(_ts_us(odate_days), pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIO)[rng.integers(0, 5, n_ord)]),
    }))

    # -- lineitem: per-order line-count mixture (mean ~4, tail to ~17) -----
    nlines = np.clip(1 + rng.poisson(3.0, n_ord), 1, 17)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    n_li = len(l_orderkey)
    # vectorized 1..k per order: global index minus each order's start
    order_starts = np.concatenate(([0], np.cumsum(nlines)[:-1]))
    l_linenumber = (
        np.arange(n_li, dtype=np.int64) - np.repeat(order_starts, nlines) + 1
    ).astype(np.int32)
    # ship lag: mostly 1-94 days, plus a ~2% multi-year late tail.  The
    # driver corpus has ship-lags out to ~2400 days; without the tail
    # q21's late-shipper predicate (lag > 365) is VACUOUSLY empty at
    # every local sf — the first r8 sf10 sweep ran q21 as a 0-row
    # "probe" that exercised none of its three self-join legs.
    ship_off = rng.integers(1, 95, n_li)
    late_mask = rng.random(n_li) < 0.02
    ship_off = np.where(late_mask, rng.integers(366, 2400, n_li), ship_off)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[
            rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            _ts_us(np.repeat(odate_days, nlines) + ship_off),
            pa.timestamp("us")),
    }))

    # -- events: sorted us-timestamps over 30 days of 2024-01 --------------
    t0 = 19723 * DAY_US  # 2024-01-01 in µs
    span = 30 * DAY_US
    ts = np.sort(rng.integers(0, span, n_ev)) + t0
    w("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(80.0, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_ev)]),
    }))

    # -- documents: vocab bag-of-words, exact dups + near-dups -------------
    # Vocabulary realism matters at scale: a fixed 30-word vocab makes
    # 3-gram shingles df≈N/27k — at 50k docs EVERY shingle sits just
    # under a df-cap and shingle-blocked dedup degenerates to Σdf² ≈
    # 10⁸ candidate pairs (measured: the first sf1.0 sweep filled 75 GB
    # of spill).  Real corpora grow vocabulary with corpus size (Heaps'
    # law) and are Zipf-distributed, which keeps most shingles rare.
    # Core 30 words stay frequent (BM25 query terms, textops density);
    # a Zipfian tail scales with sf.
    doc_len = rng.integers(8, 91, n_doc)
    n_tail = max(200, int(5000 * sf ** 0.5))
    vocab = np.array(VOCAB + [f"w{i:05d}" for i in range(n_tail)])
    weights = np.concatenate([
        np.full(len(VOCAB), 0.6 / len(VOCAB)),          # 60% core mass
        0.4 * (1.0 / np.arange(1, n_tail + 1) ** 1.1)    # Zipf(1.1) tail
        / np.sum(1.0 / np.arange(1, n_tail + 1) ** 1.1),
    ])
    weights /= weights.sum()
    all_toks = rng.choice(len(vocab), size=int(doc_len.sum()), p=weights)
    # per-doc topical skew: rotate each doc's TAIL draws by a doc-specific
    # offset, so unrelated docs favor different tail words (real documents
    # have distinct content words; without this every doc shares one token
    # distribution and distribution-similarity near-dup measures like
    # SimHash correctly — but uselessly — flag most pairs)
    doc_topic_offset = rng.integers(0, n_tail, n_doc)  # reused for embeddings
    doc_offset = np.repeat(doc_topic_offset, doc_len)
    is_tail = all_toks >= len(VOCAB)
    all_toks[is_tail] = (
        (all_toks[is_tail] - len(VOCAB) + doc_offset[is_tail]) % n_tail
        + len(VOCAB)
    )
    bounds = np.concatenate(([0], np.cumsum(doc_len)))
    texts = [
        " ".join(vocab[all_toks[bounds[i]:bounds[i + 1]]])
        for i in range(n_doc)
    ]
    # ~0.2% exact duplicates and ~0.5% near-duplicates (1-2 token edits)
    # of earlier docs — the dedup family needs real positives at scale
    n_dup = max(2, n_doc // 500)
    n_near = max(3, n_doc // 200)
    dup_src = rng.integers(0, n_doc // 2, n_dup)
    dup_dst = rng.integers(n_doc // 2, n_doc, n_dup)
    for s_i, t_i in zip(dup_src, dup_dst):
        texts[t_i] = texts[s_i]
    near_src = rng.integers(0, n_doc // 2, n_near)
    near_dst = rng.integers(n_doc // 2, n_doc, n_near)
    for s_i, t_i in zip(near_src, near_dst):
        tk = texts[s_i].split()
        for _ in range(rng.integers(1, 3)):
            # resample until the replacement actually differs — drawing
            # from the full vocab can pick the identical token (likely
            # for the 30-word core), silently degenerating an intended
            # 1-2-edit near-dup into a 0-edit exact duplicate
            j = rng.integers(0, len(tk))
            repl = vocab[rng.integers(0, len(vocab))]
            while repl == tk[j]:
                repl = vocab[rng.integers(0, len(vocab))]
            tk[j] = repl
        texts[t_i] = " ".join(tk)
    w("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # -- embeddings: topic-correlated planted-neighbor structure -----------
    # (round 8, VERDICT r7 #7).  vec_id i embeds document i; its topical
    # identity is the document's tail-vocab rotation offset, so vector
    # geometry is CORRELATED WITH DOC CONTENT.  Three scales:
    #   coarse topic (10)   = subgroup // m        -> the IVF layer;
    #   planted subgroup    = offset quantized to ~12-member groups ->
    #       a vector's exact top-k IS its subgroup (cos ≈ .98 within,
    #       ≈ .69 same-topic/other-group, ≈ 0 cross-topic); n_sub is a
    #       multiple of 10 and topic = sub // m, so every planted
    #       neighbor set nests inside exactly one coarse topic;
    #   small iid noise     -> deterministic tie-breaks, nothing more.
    # ANN recall now measures the INDEX (does probing reach the planted
    # neighbors?), not a noise floor: the previous iid-noise-dominated
    # vectors made every exact neighbor set an arbitrary noise direction,
    # saturating recall@k near the random baseline regardless of index
    # quality (the r7 rag_serve_ann vector branch read 0.56@100).
    m_sub = max(2, n_emb // 120)
    n_sub = 10 * m_sub
    offs = doc_topic_offset[:n_emb].astype(np.int64)
    sub = (offs * n_sub // n_tail).astype(np.int64)
    topic = (sub // m_sub).astype(np.int32)
    centers = rng.normal(0.0, 0.12, (10, 64))
    subcenters = rng.normal(0.0, 0.08, (n_sub, 64))
    emb = (
        centers[topic] + subcenters[sub] + rng.normal(0.0, 0.02, (n_emb, 64))
    ).astype(np.float32)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(topic, pa.int32()),
    }))

    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": SEED, "lineitem_rows": int(n_li)}, f)
    print(f"done: sf={sf} lineitem={n_li} → {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    gen(a.sf, a.out)
