#!/usr/bin/env python3
"""Deterministic synthetic testdata generator for scale factors beyond
the driver-provided sf{0.001,0.01,0.1} (which are READ-ONLY and never
regenerated here).

Purpose (r14 verdict directive 1): run the full oracle suite at sf1 —
10x the bench SF — to flush the next decade of SF-dependent overflow /
vacuity bugs. The driver never shipped sf1 data, so this generator
extrapolates the SAME generative family measured from the shipped SFs
(distribution notes inline per table). The correctness gate compares
Spark vs DuckDB on the SAME files, so bit-parity with the driver's
(unavailable) generator is not required — only schema identity and a
faithful 10x of the distribution SHAPES, including the planted
structure the dedup families need (exact-dup texts) and the fixed value
domains operators key on (NATION_*, event types, src*, lang mix).

Usage: python3 tools/gen_sf.py 1 /root/repo/testdata_sf1
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 4242


def write(outdir, name, table):
    pq.write_table(table, f"{outdir}/{name}.parquet")
    print(f"wrote {name}: {table.num_rows}")


def main(sf, outdir):
    rng = np.random.default_rng(SEED)
    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_ev = int(1000000 * sf)
    n_doc = int(50000 * sf)
    n_vec = int(20000 * sf)

    import os
    os.makedirs(outdir, exist_ok=True)

    # region / nation: fixed dimensions at every SF
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": regions}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    # customer: acctbal ~ U[-1000, 10000] (2dp), segment/nation uniform
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [segs[i] for i in rng.integers(0, 5, n_cust)]}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    # part: name = adjective+noun (the SHIPPED word lists — fuzzy_join
    # needs levenshtein-1..2 adjective pairs like cold/old within a
    # shared-noun block), retailprice = 900 + (key % 1000)/10
    adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
             "widget"]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    ai = rng.integers(0, len(adjs), n_part)
    ni = rng.integers(0, len(nouns), n_part)
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(ai, ni)],
        "p_brand": [f"Brand#{k}" for k in rng.integers(1, 26, n_part)],
        "p_type": [types[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 2)}))

    # orders: totalprice ~ U[1000, 500000] (independent of lineitems —
    # measured: 100% of joined orders mismatch their line sums),
    # orderdate uniform midnight days over [1995-01-01, 2001-08-01]
    day = np.int64(86400 * 1000000)
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    o_days = rng.integers(0, 2405, n_ord)
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [statuses[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(d0 + o_days * day, pa.timestamp("us")),
        "o_orderpriority": [prios[i] for i in rng.integers(0, 5, n_ord)]}))

    # lineitem: per-order count ~ Poisson(4) (zeros allowed — ~1.8% of
    # orders carry no lines, as measured), linenumber uniform 1..7,
    # quantity integral 1..50, unit price U[900, 2100] (extendedprice =
    # qty*unit), discount 0..0.10 and tax 0..0.08 on 1-cent grids,
    # shipdate uniform days over [1995-01-02, 2001-11-04] independent
    # of the order date (measured diff range −2399..+2496 days)
    per = rng.poisson(4.0, n_ord)
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), per)
    m = len(okeys)
    qty = rng.integers(1, 51, m).astype(np.float64)
    unit = np.round(rng.uniform(900, 2100, m), 2)
    s0 = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, m), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, m), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, m), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.integers(0, 11, m) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, m) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, m)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, m)],
        "l_shipdate": pa.array(s0 + rng.integers(0, 2499, m) * day,
                               pa.timestamp("us"))}))

    # events: arrival times sorted over 30 days (ts ordered by id, as
    # shipped), users = customers/10, value ~ Exp(mean 50) at 2dp,
    # props = {"k": 0..99}
    e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = np.int64(30) * day
    ts = np.sort(rng.integers(0, span, n_ev))
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    write(outdir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(e0 + ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(1, n_cust // 10), n_ev),
                            pa.int64()),
        "event_type": etypes[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)]}))

    # documents: 10..100 words from the fixed 31-word vocabulary,
    # lang en-heavy (~40/15/15/15/15), source = 20 uniform src* labels,
    # n_chars = exact text length; ~0.16% EXACT dup texts planted (the
    # shipped corpora carry the same — the dedup families' non-vacuity
    # depends on them) plus a few near-dups (copy + short tail)
    vocab = np.array([
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window"])
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lweights = np.array([0.4, 0.15, 0.15, 0.15, 0.15])
    texts = []
    for i in range(n_doc):
        nw = rng.integers(10, 101)
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), nw)]))
    sources = [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)]
    # plants carry the BASE's source (ngram_jaccard blocks pairs by
    # source; boilerplate_detect groups shared 32-char prefixes within
    # a source) and alternate the copy's id ≡ 7 (mod 10) so several
    # (indexed, new) pairs straddle dedup_incremental's batch slice
    def plant_dst(j):
        lo, hi = n_doc // 2, n_doc
        d = int(rng.integers(lo, hi))
        if j % 2 == 0:
            d -= d % 10 - 7 if d % 10 >= 7 else d % 10 - 7 + 10
            d = max(lo, min(hi - 1, d))
        return d
    n_exact = max(2, int(n_doc * 0.0016))
    n_near = max(6, int(n_doc * 0.005))
    for j in range(n_exact):
        src = int(rng.integers(0, n_doc // 2))
        dst = plant_dst(j)
        texts[dst] = texts[src]
        sources[dst] = sources[src]
    for j in range(n_near):
        src = int(rng.integers(0, n_doc // 2))
        while src % 10 == 7:
            src = int(rng.integers(0, n_doc // 2))
        dst = plant_dst(j)
        texts[dst] = texts[src] + " dup"
        sources[dst] = sources[src]
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": langs[rng.choice(5, n_doc, p=lweights)],
        "source": sources,
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: isotropic random UNIT vectors in 64-dim (measured:
    # same-label and cross-label cosines both center on 0 — labels are
    # independent of geometry), float32, labels uniform 0..9
    emb = rng.standard_normal((n_vec, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([e for e in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32())}))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    main(sf, outdir)
