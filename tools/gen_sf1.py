#!/usr/bin/env python
"""Generate an sf1 rehearsal dataset (10x the sf0.1 bench scale) for the
scale-axis measurements recorded in docs/SCALE.md.

The driver-provided testdata stops at sf0.1 (TESTDATA.md), so the 10x
scaling point is generated locally, schema-identical to the driver
tables and distribution-matched on the axes the headline plans are
sensitive to:

- ``events`` scales along the LONGER-HISTORY axis: 10x the rows over a
  10x time span (300 days), same 1,500 users and per-user event rate —
  so instantaneous session concurrency (what drives
  ``events_interval_overlap``'s candidate-pair volume and the sweep's
  per-day counts) stays constant and the expected cost/output of the
  interval queries scales linearly, the property the rehearsal is
  trying to measure. (Scaling users at fixed span instead would grow
  concurrency 10x and the overlap OUTPUT ~100x — a workload-cardinality
  effect, not a plan effect.)
- ``documents`` scales the corpus 10x (50,000 docs), reusing the exact
  per-language vocabularies of the driver tables (tokenization, shingle
  and BM25 df behavior match) with the same length spread, and plants
  ~5% near-duplicates (a copy of an earlier doc with ~10% of words
  resampled) so MinHash/LSH has a realistic candidate load.
- ``embeddings`` scales to 20,000 vectors: 10 well-separated cluster
  centers in R^64, unit-normalized points like the driver table.

Only the three tables the five rehearsal queries read are generated;
everything is written with a fixed seed so reruns are reproducible.

Usage: python tools/gen_sf1.py [out_dir [events_mult [--relational]]]
    out_dir      default /tmp/sf1
    events_mult  scale the EVENTS axis a further N× beyond sf1 (rows
                 and time span together, users fixed — the same
                 longer-history axis), e.g. 10 → an sf10 events table
                 (10M rows / 3000 days) for a second, 100×-of-bench
                 scaling point on the events family. documents and
                 embeddings stay at sf1 scale (symlink or regenerate
                 separately if needed).
    --relational generate the TPC-H-ish star (lineitem 600k x mult,
                 orders 1.5M x mult, customer 15k x mult, supplier
                 1k x mult + copied nation/region) in the 1995-2001
                 date epoch the relational queries target — the
                 q1/q3/q4/q5/q10 rehearsal dataset. events_mult is
                 the star's scale (1 = bench grain, 10 = the 10x
                 rehearsal point).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 4242

N_EVENTS = 1_000_000
N_USERS = 1_500
SPAN_DAYS = 300
T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
EVENT_TYPES = np.array(["signup", "purchase", "view", "click", "error"])

N_DOCS = 50_000
NEAR_DUP_FRAC = 0.05
LANG_WEIGHTS = {"en": 0.41, "es": 0.15, "fr": 0.15, "zh": 0.15, "de": 0.14}

N_VECS = 20_000
DIM = 64
N_CLUSTERS = 10


def gen_events(rng: np.random.Generator, mult: int = 1) -> pa.Table:
    n = N_EVENTS * mult
    span_us = SPAN_DAYS * mult * 86_400_000_000
    ts = np.sort(rng.integers(0, span_us, n)) + T0_US
    value = np.round(rng.exponential(50.0, n).clip(0, 560.0), 2)
    props = np.array([json.dumps({"k": int(k)}) for k in range(100)])
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, N_USERS, n), pa.int64()),
            "event_type": pa.array(EVENT_TYPES[rng.integers(0, 5, n)]),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(props[rng.integers(0, 100, n)]),
        }
    )


def lang_vocabs() -> dict[str, list[str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT lang, list(DISTINCT w) FROM (
              SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM '{SRC}/documents.parquet') GROUP BY lang"""
    ).fetchall()
    return {lang: sorted(ws) for lang, ws in rows}


def gen_documents(rng: np.random.Generator, n_docs: int = N_DOCS) -> pa.Table:
    vocabs = lang_vocabs()
    langs = list(LANG_WEIGHTS)
    lang_pick = rng.choice(len(langs), n_docs, p=list(LANG_WEIGHTS.values()))
    n_words = rng.integers(8, 96, n_docs)
    texts: list[str] = []
    doc_langs: list[str] = []
    for i in range(n_docs):
        lang = langs[lang_pick[i]]
        vocab = vocabs[lang]
        if i > 0 and rng.random() < NEAR_DUP_FRAC:
            # near-dup: copy an earlier same-run doc, resample ~10% words
            j = int(rng.integers(0, i))
            words = texts[j].split(" ")
            lang = doc_langs[j]
            vocab = vocabs[lang]
            k = max(1, len(words) // 10)
            for pos in rng.choice(len(words), k, replace=False):
                words[pos] = vocab[rng.integers(0, len(vocab))]
        else:
            idx = rng.integers(0, len(vocab), n_words[i])
            words = [vocab[w] for w in idx]
        texts.append(" ".join(words))
        doc_langs.append(lang)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(doc_langs),
            "source": pa.array([f"src{i % 20}" for i in rng.integers(0, 20, n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


N_ORDERS = 1_500_000  # 10x the round-8 sf0.1 orders table (150k then;
# the driver regenerated sf0.1 orders at this size mid-round-9)
N_CUSTOMERS = 15_000
ORDER_PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
ORDER_STATUSES = np.array(["F", "O", "P"])


def gen_orders(
    rng: np.random.Generator, n: int = N_ORDERS, n_customers: int = N_CUSTOMERS
) -> pa.Table:
    """10x orders on the MORE-ORDERS axis (driver schema, uniform
    priorities like TPC-H): the scaling point for the rank-by-priority
    migrations (orders_percentile_cont / median_disc_by_priority),
    whose former per-priority windows were the 5-task funnel class."""
    span_us = 7 * 365 * 86_400_000_000
    dates = rng.integers(0, span_us, n) + T0_US - span_us
    price = np.round(rng.uniform(1000.0, 500_000.0, n), 2)
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
            "o_custkey": pa.array(rng.integers(1, n_customers + 1, n), pa.int64()),
            "o_orderstatus": pa.array(ORDER_STATUSES[rng.integers(0, 3, n)]),
            "o_totalprice": pa.array(price, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(ORDER_PRIORITIES[rng.integers(0, 5, n)]),
        }
    )


# --- relational (TPC-H-ish) rehearsal tables.
# Base (scale=1) matches the sf0.1 bench grain: lineitem 600k, orders
# 1.5M, customer 15k, supplier 1k; scale=10 is the 10x rehearsal point.
# Both points come from THIS generator (the driver's own sf0.1 orders
# table switched to a 2017-2023 date epoch mid-build, which makes the
# 1996/1997 predicates of q3/q4/q5/q10 select nothing there — a
# degenerate baseline), with o_orderdate/l_shipdate in the 1995-2001
# epoch the queries target. lineitem.l_orderkey spans only the first
# 10% of o_orderkey — the structural join selectivity the driver data
# has at sf0.01. Value domains match the driver marginals (quantity
# 1..50, discount 0..0.10, tax 0..0.08, flags uniform over the
# observed combos).
REL_LINEITEM = 600_000
REL_ORDERS = 1_500_000
REL_CUSTOMERS = 15_000
REL_SUPPLIERS = 1_000
REL_PARTS = 20_000
SHIP_T0_US = 788_918_400_000_000  # 1995-01-02T00:00:00Z
ORDER_T0_US = 788_832_000_000_000  # 1995-01-01T00:00:00Z
RETURN_FLAGS = np.array(["A", "N", "R"])
LINE_STATUSES = np.array(["F", "O"])
MKT_SEGMENTS = np.array(
    ["MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
)


def gen_rel_orders(rng: np.random.Generator, scale: int = 1) -> pa.Table:
    """Orders for the relational rehearsal star: same schema as
    gen_orders but in the 1995-2001 epoch so the q3/q4/q5/q10 date
    predicates select real windows."""
    n = REL_ORDERS * scale
    span_us = int(6.6 * 365 * 86_400_000_000)
    dates = rng.integers(0, span_us, n) + ORDER_T0_US
    price = np.round(rng.uniform(1000.0, 500_000.0, n), 2)
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
            "o_custkey": pa.array(
                rng.integers(1, REL_CUSTOMERS * scale + 1, n), pa.int64()
            ),
            "o_orderstatus": pa.array(ORDER_STATUSES[rng.integers(0, 3, n)]),
            "o_totalprice": pa.array(price, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(ORDER_PRIORITIES[rng.integers(0, 5, n)]),
        }
    )


def gen_lineitem(rng: np.random.Generator, scale: int = 1) -> pa.Table:
    n = REL_LINEITEM * scale
    ship_span_us = int(6.8 * 365 * 86_400_000_000)
    return pa.table(
        {
            "l_orderkey": pa.array(
                rng.integers(0, REL_ORDERS * scale // 10, n), pa.int64()
            ),
            "l_partkey": pa.array(
                rng.integers(0, REL_PARTS * scale, n), pa.int64()
            ),
            "l_suppkey": pa.array(
                rng.integers(0, REL_SUPPLIERS * scale, n), pa.int64()
            ),
            "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
            "l_quantity": pa.array(
                rng.integers(1, 51, n).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105_000.0, n), 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, n) / 100.0, 2), pa.float64()
            ),
            "l_tax": pa.array(
                np.round(rng.integers(0, 9, n) / 100.0, 2), pa.float64()
            ),
            "l_returnflag": pa.array(RETURN_FLAGS[rng.integers(0, 3, n)]),
            "l_linestatus": pa.array(LINE_STATUSES[rng.integers(0, 2, n)]),
            "l_shipdate": pa.array(
                rng.integers(0, ship_span_us, n) + SHIP_T0_US, pa.timestamp("us")
            ),
        }
    )


def gen_customer(rng: np.random.Generator, scale: int = 1) -> pa.Table:
    n = REL_CUSTOMERS * scale
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n + 1), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n + 1)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, n), 2), pa.float64()
            ),
            "c_mktsegment": pa.array(MKT_SEGMENTS[rng.integers(0, 5, n)]),
        }
    )


def gen_supplier(rng: np.random.Generator, scale: int = 1) -> pa.Table:
    n = REL_SUPPLIERS * scale
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, n), 2), pa.float64()
            ),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> pa.Table:
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, N_CLUSTERS, N_VECS)
    vec = centers[label] * 0.8 + rng.standard_normal((N_VECS, DIM)) * 0.25
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
            "embedding": pa.array(list(vec.astype(np.float32)), pa.list_(pa.float32())),
            "label": pa.array(label, pa.int32()),
        }
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    relational = len(sys.argv) > 3 and sys.argv[3] == "--relational"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    if relational:
        # a self-consistent 10x TPC-H-ish star for q1/q3/q4/q5/q10:
        # nation/region are domain-bounded — copy the driver files.
        import shutil

        scale = mult
        tables = [
            ("lineitem", gen_lineitem(rng, scale)),
            ("orders", gen_rel_orders(rng, scale)),
            ("customer", gen_customer(rng, scale)),
            ("supplier", gen_supplier(rng, scale)),
        ]
        for dim in ("nation", "region"):
            shutil.copy(f"{SRC}/{dim}.parquet", os.path.join(out, f"{dim}.parquet"))
            print(f"copied {dim}.parquet from {SRC}")
    else:
        tables = [("events", gen_events(rng, mult))]
        if mult == 1:  # docs/embeddings/orders only at the base sf1 scale
            tables += [
                ("documents", gen_documents(rng)),
                ("embeddings", gen_embeddings(rng)),
                ("orders", gen_orders(rng)),
            ]
    for name, tbl in tables:
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"wrote {path}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
