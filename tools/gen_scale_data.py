#!/usr/bin/env python
"""Deterministic one-decade scale-up of the driver testdata.

Builds sf1 (10x sf0.1) under ``.scaledata/sf1/`` by replicating the
driver's sf0.1 parquet with structure-preserving transforms.  The goal
is a dataset whose *per-query work* is an honest 10x of sf0.1 — so the
scaling bench (tools/bench_scaling.py) can measure empirical time
ratios instead of arguing from plan shapes.

Replication rules (replica r in 0..9; r=0 is the original data):

Relational tables (TPC-H-ish):
  * region / nation — fixed dimensions, copied once (TPC-H semantics:
    they do not scale with sf).
  * customer / supplier / part / orders / lineitem — every surrogate
    and foreign key is offset by ``r * (max_key + 1)`` consistently
    across tables, so FK join fan-outs, orphan rates, group
    cardinalities, and key distributions all scale linearly and
    referential structure is preserved exactly.
  * events — event_id and user_id offset (user cardinality scales
    10x); timestamps keep the original one-month window (more traffic
    in the same window, the realistic way an event stream grows).

documents:
  * doc_id offset; every whitespace token of replica r>0 gets a
    ``-r{r}`` suffix.  Token bijection per replica => within-replica
    Jaccard/shingle/dup structure is IDENTICAL to the base corpus,
    while cross-replica shingle sets are provably disjoint (disjoint
    vocabularies) — so near-dup pair counts scale linearly, not
    quadratically, exactly like ten independent crawl shards.
    Vocabulary grows 10x (realistic for a 10x corpus).  n_chars is
    recomputed from the rewritten text.

embeddings:
  * vec_id offset; replica r>0 vectors are ``normalize(v + noise)``
    with zero-mean hash-seeded noise of norm ~0.6 (cosine vs the
    source vector ~0.86, below every near-dup threshold in the
    catalog) — neighbor/cluster structure stays realistic without
    manufacturing 10 exact copies of every point.  Labels kept, so
    cluster count is constant and cluster sizes scale 10x.

Everything is seeded (numpy default_rng(42) per replica) — two runs
produce byte-identical logical content.

Usage:  python tools/gen_scale_data.py [--src /root/testdata/sf0.1]
                                       [--out .scaledata/sf1]
                                       [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pandas as pd

REL_OFFSETS = {
    # table -> [(column, key_space)] ; key_space names the table whose
    # max key defines the offset stride, keeping FKs consistent.
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events_id"), ("user_id", "events_user")],
}


def _strides(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    q = lambda sql: con.sql(sql).fetchone()[0] + 1  # noqa: E731
    return {
        "customer": q(f"select max(c_custkey) from '{src}/customer.parquet'"),
        "supplier": q(f"select max(s_suppkey) from '{src}/supplier.parquet'"),
        "part": q(f"select max(p_partkey) from '{src}/part.parquet'"),
        "orders": q(f"select max(o_orderkey) from '{src}/orders.parquet'"),
        "events_id": q(f"select max(event_id) from '{src}/events.parquet'"),
        "events_user": q(f"select max(user_id) from '{src}/events.parquet'"),
    }


def gen_relational(src: str, out: str, replicas: int) -> None:
    con = duckdb.connect()
    strides = _strides(con, src)
    for tbl in ("region", "nation"):
        con.sql(
            f"copy (select * from '{src}/{tbl}.parquet') to "
            f"'{out}/{tbl}.parquet' (format parquet, compression snappy)"
        )
    for tbl, cols in REL_OFFSETS.items():
        offset_cols = {c: ks for c, ks in cols}
        schema = [r[0] for r in con.sql(
            f"describe select * from '{src}/{tbl}.parquet'").fetchall()]
        sel = ", ".join(
            f"({c} + r.r * {strides[offset_cols[c]]})::BIGINT as {c}"
            if c in offset_cols else c
            for c in schema
        )
        con.sql(
            f"copy (select {sel} from '{src}/{tbl}.parquet', "
            f"(select unnest(range({replicas})) as r) r) to "
            f"'{out}/{tbl}.parquet' (format parquet, compression snappy)"
        )
        n = con.sql(f"select count(*) from '{out}/{tbl}.parquet'").fetchone()[0]
        print(f"  {tbl}: {n} rows")


def gen_documents(src: str, out: str, replicas: int) -> None:
    base = pd.read_parquet(f"{src}/documents.parquet")
    stride = int(base["doc_id"].max()) + 1
    frames = [base]
    for r in range(1, replicas):
        rep = base.copy()
        rep["doc_id"] = rep["doc_id"] + r * stride
        suffix = f"-r{r}"
        rep["text"] = rep["text"].map(
            lambda t, s=suffix: " ".join(w + s for w in t.split())
        )
        rep["n_chars"] = rep["text"].str.len().astype("int64")
        frames.append(rep)
    allf = pd.concat(frames, ignore_index=True)
    allf.to_parquet(f"{out}/documents.parquet", index=False)
    print(f"  documents: {len(allf)} rows")


def gen_embeddings(src: str, out: str, replicas: int) -> None:
    base = pd.read_parquet(f"{src}/embeddings.parquet")
    stride = int(base["vec_id"].max()) + 1
    mat = np.stack(base["embedding"].to_numpy())  # (n, d) float32
    frames = [base]
    for r in range(1, replicas):
        rng = np.random.default_rng(42 + r)
        noise = rng.standard_normal(mat.shape).astype(np.float32)
        noise *= 0.6 / np.linalg.norm(noise, axis=1, keepdims=True)
        pert = mat + noise
        pert /= np.linalg.norm(pert, axis=1, keepdims=True)
        rep = base.copy()
        rep["vec_id"] = rep["vec_id"] + r * stride
        rep["embedding"] = list(pert)
        frames.append(rep)
    allf = pd.concat(frames, ignore_index=True)
    allf.to_parquet(f"{out}/embeddings.parquet", index=False)
    print(f"  embeddings: {len(allf)} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaledata", "sf1",
        ),
    )
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    print(f"generating {args.replicas}x of {args.src} -> {args.out}")
    gen_relational(args.src, args.out, args.replicas)
    gen_documents(args.src, args.out, args.replicas)
    gen_embeddings(args.src, args.out, args.replicas)
    print("done")


if __name__ == "__main__":
    main()
