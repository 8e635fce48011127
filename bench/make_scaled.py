#!/usr/bin/env python
"""Generate a ~10x scale-up of /root/testdata/sf0.1 for LOCAL perf
measurement only (the driver generates its own sf1.0; this one merely
matches its statistical shape so optimizations can be validated at the
scale the driver times).

* ``documents``: 50k fresh docs drawn from the sf0.1 token vocabulary
  with the same length/lang/source distributions (the sf0.1 corpus is
  random token sequences over a ~30-word vocab, so the trigram shingle
  space saturates and df scales ~10x — mirroring the driver's observed
  sf1.0 ngram stats: 27,865 shingles, max_df 138, 71M capped pairs).
* ``embeddings``: 20k random 64-dim float vectors, labels 0..9.
* fact/dim tables: replicated 10x with consistent key shifts so join
  relationships (orders↔customer, lineitem↔orders/part/supplier,
  events↔user) are preserved; timestamps untouched (replica users are
  new users with identical histories — fine for asof/SCD2/sessionize).

Output: single parquet file per table (same layout as the driver's
dirs). Usage: python bench/make_scaled.py [outdir]  (default
/root/scaled_testdata/sf1.0)
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPS = 10

PADS = {
    "l_orderkey": 10_000_000, "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "l_partkey": 1_000_000, "p_partkey": 1_000_000,
    "l_suppkey": 100_000, "s_suppkey": 100_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
}


def replicate(name: str, out: str) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(REPS):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in PADS and r > 0:
                col = pa.compute.add(col, PADS[field.name] * r)
            cols.append(col)
        parts.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {big.num_rows}")


def gen_documents(out: str) -> None:
    src = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    vocab = sorted({w for txt in src.text for w in txt.split()})
    langs, lang_p = np.unique(src.lang, return_counts=True)
    lang_p = lang_p / lang_p.sum()
    n = 50_000
    rng = np.random.default_rng(7)
    lens = rng.integers(10, 101, size=n)
    tok_ids = rng.integers(0, len(vocab), size=int(lens.sum()))
    bounds = np.concatenate(([0], np.cumsum(lens)))
    va = np.array(vocab)
    texts = [" ".join(va[tok_ids[bounds[i]:bounds[i + 1]]]) for i in range(n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs, size=n, p=lang_p), pa.string()),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, size=n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: generated {n}")


def gen_embeddings(out: str) -> None:
    n, dim = 20_000, 64
    rng = np.random.default_rng(11)
    vecs = (rng.standard_normal((n, dim)) * 0.125).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: generated {n}")


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/scaled_testdata/sf1.0"
    os.makedirs(out, exist_ok=True)
    gen_documents(out)
    gen_embeddings(out)
    for name in ["lineitem", "orders", "customer", "part", "supplier", "events"]:
        replicate(name, out)
    for name in ["nation", "region"]:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{out}/{name}.parquet")
        print(f"{name}: copied")
    open(f"{out}/_DONE", "w").close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
