"""DeepWalk stage 3: SGNS embeddings from walk-corpus pair counts —
community separation through the full distributed (param-averaged)
path, plus determinism."""

import numpy as np
import pandas as pd

from kgforge import graphembed, graphstats


def _clique_graph():
    rows = []
    for base in (0, 8, 16):
        for i in range(8):
            for j in range(i + 1, 8):
                rows.append((base + i, base + j, 0))
    rows += [(0, 8, 0), (8, 16, 0)]
    return pd.DataFrame(rows, columns=["h", "t", "r"])


def test_deepwalk_separates_cliques_and_is_deterministic(spark):
    df = spark.createDataFrame(_clique_graph())
    walks = graphstats.random_walks(df, num_walks=4, walk_length=6)
    pairs = graphstats.walk_skipgram_pairs(walks, window=2)

    def run():
        return graphembed.train_deepwalk(
            spark, pairs, n_nodes=24, dim=16, rounds=5,
            epochs_per_round=12, lr=0.05, neg=3, n_shards=4, seed=9,
        )

    emb = run()
    e = emb["in"] / np.maximum(
        np.linalg.norm(emb["in"], axis=1, keepdims=True), 1e-12
    )
    within = np.mean(
        [(e[b + i] * e[b + j]).sum() for b in (0, 8, 16)
         for i in range(8) for j in range(8) if i != j]
    )
    cross = np.mean([(e[i] * e[16 + j]).sum() for i in range(8) for j in range(8)])
    assert within > cross + 0.1, (within, cross)
    ppd = pairs.toPandas()
    pos, rand = graphembed.embedding_quality(emb["in"], ppd, 24)
    assert pos > rand, (pos, rand)
    # NOTE: frequency_ordering_gate is NOT asserted here — on a
    # clustered graph, structure dominates co-walk counts (low-count
    # same-clique pairs still embed close); that gate's regime is the
    # dense golden KG, where the contract query asserts it.
    # deterministic end to end (hash shards + counter-seeded local work)
    emb2 = run()
    assert np.array_equal(emb["in"], emb2["in"])
    assert np.array_equal(emb["out"], emb2["out"])


def test_sgns_weight_damping_does_not_diverge():
    """Frequent pairs (large n_pairs) must not blow up the step: all
    outputs finite even with count-3000 pairs at lr 0.1."""
    from kgforge.training import _xavier

    rng = np.random.default_rng(3)
    pairs = pd.DataFrame(
        {"center": [0, 1] * 10, "context": [1, 0] * 10, "n_pairs": [3000] * 20}
    )
    u = _xavier(rng, 4, 8).astype("float64")
    v = _xavier(rng, 4, 8).astype("float64")
    u1, v1 = graphembed.sgns_epochs(pairs, u, v, epochs=20, lr=0.1, neg=3, seed=1)
    assert np.isfinite(u1).all() and np.isfinite(v1).all()
