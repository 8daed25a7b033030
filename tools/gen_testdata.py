#!/usr/bin/env python3
"""Deterministic synthetic test-data generator for CI (dev tool only —
the library itself has no Python).

Produces the same ten-table star schema the round driver generates
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet each, schema-compatible with
/root/testdata/sf*/. Values are deterministic (seed 42) but NOT
byte-identical to the driver's data — they don't need to be: the
localcheck oracle compares Spark output against DuckDB run over the
SAME parquet files, so any schema-correct dataset exercises the
contract.

Usage: python3 tools/gen_testdata.py <outDir> <sf>
  e.g.  python3 tools/gen_testdata.py /tmp/sf0.001 0.001
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["small", "blue", "cold", "new", "hot", "big", "red", "old"]
PNOUN = ["widget", "rod", "ring", "anvil", "bolt", "gear", "plate", "cog"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "de", "zh"]
VOCAB = ("the a spark join table scan filter sort merge window batch "
         "stream row column key value data query agg group order line "
         "part customer hash vector slow fast small big dup").split()


def write(out_dir, name, table):
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main():
    out_dir, sf = sys.argv[1], float(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = max(int(150_000 * sf), 30)
    n_supp = max(int(10_000 * sf), 5)
    n_part = max(int(200_000 * sf), 40)
    n_ord = max(int(1_500_000 * sf), 300)
    n_li = max(int(6_000_000 * sf), 1200)
    n_ev = max(int(1_000_000 * sf), 200)
    n_doc = max(int(500_000 * sf), 100)
    n_users = max(int(15_000 * sf), 5)

    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))

    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]}))

    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}"
                   for i in rng.integers(0, 64, n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 200) / 10.0, 2)}))

    day_us = 86_400_000_000
    o_date = (np.datetime64("1995-01-01", "us").astype(np.int64)
              + rng.integers(0, 2405, n_ord) * day_us)
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("F", "O", "P")[i] for i in
                          rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]}))

    # shipdate follows the row's OWN order's date (o_date indexed by
    # the generated l_orderkey), like the driver dataset — sampling a
    # random order's date instead let shipdate precede o_orderdate,
    # giving date-lag-shaped queries degenerate negative lags here
    l_ok = np.sort(rng.integers(0, n_ord, n_li))
    ship = o_date[l_ok] + rng.integers(1, 122, n_li) * day_us
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 95000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in
                         rng.choice(3, n_li, p=[0.25, 0.5, 0.25])],
        "l_linestatus": [("F", "O")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(ship, pa.timestamp("us"))}))

    # events: per-user streams over one month, microsecond jitter so
    # (user_id, ts) is unique — window specs stay deterministic
    ev_ts = (np.datetime64("2024-01-01", "us").astype(np.int64)
             + rng.integers(0, 30 * day_us // 1000, n_ev) * 1000
             + rng.integers(0, 1000, n_ev))
    write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(np.sort(ev_ts), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in
                       rng.choice(5, n_ev, p=[0.5, 0.25, 0.1, 0.05, 0.1])],
        # heavy-tailed (lognormal-ish) like the driver's data, so
        # >3-sigma outliers EXIST and value_outliers checks real rows
        "value": np.round(np.minimum(rng.lognormal(3.0, 1.0, n_ev), 400.0)
                          + 0.01, 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    # documents: bag-of-VOCAB texts; ~5% exact dups and ~5% near-dups
    # (one word changed) so dedup operators have real work
    texts = [" ".join(VOCAB[w] for w in rng.integers(0, len(VOCAB),
                                                     rng.integers(20, 110)))
             for _ in range(n_doc)]
    for i in range(0, n_doc, 20):
        j = int(rng.integers(0, n_doc))
        if j != i:
            texts[i] = texts[j]
    for i in range(10, n_doc, 20):
        j = int(rng.integers(0, n_doc))
        ws = texts[j].split()
        ws[int(rng.integers(0, len(ws)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
        texts[i] = " ".join(ws)
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in
                 rng.choice(5, n_doc, p=[0.6, 0.1, 0.1, 0.1, 0.1])],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: 64-dim, 10 gaussian clusters keyed by label so ANN
    # recall/top-k queries see real neighborhood structure
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_doc)
    vecs = (centers[labels] + rng.normal(0, 0.3, (n_doc, 64))).astype(np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_doc), pa.int64()),
        "embedding": pa.array([v for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


if __name__ == "__main__":
    main()
