#!/usr/bin/env python
"""Adversarial-scale connected-components evidence (round-4 verdict #7).

Two topologies, two algorithms, measured rounds + wall seconds:

* **power-law graph** (default 1M edges over 100k nodes, source ids
  log-uniform -> zipf-1-ish degree distribution with a ~60k-degree hub):
  the realistic alias-graph shape. Both algorithms converge in a few
  rounds (small diameter); this leg evidences that the star steps'
  per-node ``collect_set`` neighborhoods survive a real hub at 1M-edge
  scale, not just toy fixtures.
* **deep chain** (default 256 nodes): the adversarial diameter case.
  hash-min label propagation moves the min label ONE hop per round —
  O(diameter) rounds — while alternating big-star/small-star contracts
  paths to O(log n). The round-count gap is the point of the star
  variant (canonicalize.connected_components_star docstring).

Edges are generated DISTRIBUTED and deterministically (xxhash64 of the
edge index — no RNG state, no driver-side materialization). Labels are
cross-checked between the two algorithms on the chain leg.

Usage: python bench/cc_scale.py [--edges 1000000] [--nodes 100000]
       [--chain 256] [--cpus 8]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--chain", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pagerank-iters", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kgforge.session import get_spark
    from kgforge.stages.canonicalize import (
        connected_components,
        connected_components_star,
    )

    spark = get_spark(
        master=f"local[{args.cpus}]", app_name="cc-scale",
        shuffle_partitions=args.cpus,
    )

    # power-law edges: src log-uniform over [1, nodes] (P(src<=x) ~ log x
    # => zipf-1 density, node 1 becomes a ~edges/ln(nodes)-degree hub),
    # dst uniform. Deterministic: both coordinates are xxhash64 folds of
    # the edge index.
    def u01(col, salt):
        return (F.xxhash64(col, F.lit(salt)).cast("double") / F.lit(2.0**64)) + 0.5

    ids = spark.range(args.edges).repartition(args.cpus)
    power = ids.select(
        F.floor(F.pow(F.lit(float(args.nodes)), u01(F.col("id"), 1))).alias("a"),
        F.floor(u01(F.col("id"), 2) * args.nodes).alias("b"),
    ).where(F.col("a") != F.col("b"))

    # deep chain, id-offset into its own component space
    base = 10_000_000_000
    chain = spark.range(args.chain - 1).select(
        (F.col("id") + base).alias("a"), (F.col("id") + base + 1).alias("b")
    )

    results = {}

    def run(tag, fn, edges, max_iter):
        stats: dict = {}
        t0 = time.time()
        out = fn(edges, max_iter=max_iter, stats=stats)
        n_comp = out.select("component").distinct().count()
        wall = time.time() - t0
        results[tag] = {
            "rounds": stats.get("rounds"),
            "wall_sec": round(wall, 2),
            "n_components": n_comp,
        }
        return out

    run("power_star", connected_components_star, power, 30)
    run("power_hashmin", connected_components, power, 50)

    # PageRank on the same 1M-edge graph: the other iterative-join
    # consumer of this machinery (weighted recursion, no min-fixpoint —
    # the case CC convergence tests can't cover), at hub-scale
    if args.pagerank_iters > 0:
        from kgforge.graphstats import pagerank

        t0 = time.time()
        pr = pagerank(
            power.select(F.col("a").alias("h"), F.col("b").alias("t")),
            n_iter=args.pagerank_iters,
        )
        top = pr.orderBy(F.col("rank").desc()).limit(3).collect()
        results["power_pagerank"] = {
            "iters": args.pagerank_iters,
            "wall_sec": round(time.time() - t0, 2),
            "top_rank_entity": int(top[0]["e"]),
            "top_rank": top[0]["rank"],
        }
    s = run("chain_star", connected_components_star, chain, 60)
    h = run("chain_hashmin", connected_components, chain, args.chain + 10)
    # correctness cross-check on the adversarial leg
    diff = (
        s.select("node", "component")
        .exceptAll(h.select("node", "component"))
        .count()
    )
    assert diff == 0, "star and hash-min disagree on the chain"

    out = {
        "metric": "cc_star_vs_hashmin",
        "edges_powerlaw": args.edges,
        "nodes_powerlaw": args.nodes,
        "chain_len": args.chain,
        "cpus": args.cpus,
        "results": results,
        "round_gap_chain": (
            results["chain_hashmin"]["rounds"] / max(results["chain_star"]["rounds"], 1)
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
