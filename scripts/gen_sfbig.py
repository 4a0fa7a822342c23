#!/usr/bin/env python
"""Generate an sf1.0-SCALE synthetic dataset for local perf measurement.

The driver's round-end bench runs at a driver-generated sf (BENCH_r05
recorded sf=1.0 — 10x the checked-in sf0.1).  /root/testdata is
read-only and the driver's generator is not in-repo, so this script
produces a *statistically equivalent* 10x dataset (same schemas, same
cardinality ratios, same value distributions, seeded numpy — no wall
clock) under /tmp/sfbig so optimizations can be measured at the scale
the driver actually times.  Measurement-only: nothing in the query
path reads this directory unless $SPARK_GRAFT_SF_DIR points at it.

Usage: python scripts/gen_sfbig.py [--scale 10] [--out /tmp/sfbig]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
])
LANGS = np.array(["en", "en", "en", "en", "zh", "es", "fr", "de"])
PNAME_ADJ = np.array(["large", "small", "new", "old", "hot", "cold", "red", "blue"])
PNAME_NOUN = np.array(["ring", "bolt", "gear", "anvil", "widget", "gizmo",
                       "plate", "rod"])
PTYPES = np.array(["LARGE", "MEDIUM", "ECONOMY", "PROMO", "SMALL", "STANDARD"])
SEGMENTS = np.array(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"])
ETYPES = np.array(["signup", "purchase", "view", "click", "error"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])


def write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=10.0,
                    help="multiplier vs sf0.1 (10 => sf1.0 scale)")
    ap.add_argument("--out", default="/tmp/sfbig")
    args = ap.parse_args()
    s = args.scale
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(20260822)

    n_doc = int(5000 * s)
    n_emb = int(2000 * s)
    n_cust = int(15000 * s)
    n_part = int(20000 * s)
    n_supp = int(1000 * s)
    n_ord = int(150000 * s)
    n_li = int(600000 * s)
    n_ev = int(100000 * s)
    n_users = int(1500 * s)

    # region / nation: fixed tiny dims, copy from sf0.1
    import pyarrow.dataset as ds
    for t in ("region", "nation"):
        write(args.out, t, ds.dataset(f"{BASE}/{t}.parquet").to_table())

    # documents: 8-100 words drawn from the vocab (same shape as the
    # driver's corpus: ~50 words/doc, ~300 chars)
    lens = rng.integers(8, 101, n_doc)
    tot = int(lens.sum())
    words = VOCAB[rng.integers(0, len(VOCAB), tot)]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    write(args.out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(LANGS[rng.integers(0, len(LANGS), n_doc)], pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit 64-dim float vectors, 10 labels
    v = rng.standard_normal((n_emb, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    write(args.out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(SEGMENTS[rng.integers(0, 5, n_cust)]),
    }))
    write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 10000, n_supp), 2)),
    }))
    write(args.out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(
            PNAME_ADJ[rng.integers(0, 8, n_part)], " "),
            PNAME_NOUN[rng.integers(0, 8, n_part)])),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(PTYPES[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900.0 + 0.1 * np.arange(n_part) % 1200, 2)),
    }))

    day_us = 86_400_000_000
    base_day = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    odate = base_day + rng.integers(0, 2404, n_ord) * day_us
    write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 450000, n_ord), 2)),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(PRIORITIES[rng.integers(0, 5, n_ord)]),
    }))

    lkey = rng.integers(0, n_ord, n_li)
    sdate = base_day + rng.integers(1, 2500, n_li) * day_us
    write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    ev_base = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ts = ev_base + np.sort(rng.integers(0, 45 * day_us, n_ev))
    write(args.out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(ETYPES[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.uniform(0, 200, n_ev), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))
    # marker so bench_extra can label results
    with open(os.path.join(args.out, "_DONE"), "w") as f:
        f.write("ok\n")


if __name__ == "__main__":
    main()
