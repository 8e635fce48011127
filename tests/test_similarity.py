"""ANN: brute-force cosine top-k vs NumPy oracle; LSH variant recall."""

import numpy as np
import pandas as pd
import pytest

from kgforge.similarity import cosine_neardup_pairs, cosine_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _numpy_topk(pdf, queries, k):
    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    ids = pdf["vec_id"].to_numpy()
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype="float64")
        cos = mat_n @ (q / np.linalg.norm(q))
        order = np.lexsort((ids, -cos))[:k]
        out[qid] = list(ids[order])
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    queries = [(int(r["vec_id"]), r["embedding"]) for _, r in pdf.head(5).iterrows()]
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": [q[0] for q in queries], "embedding": [list(q[1]) for q in queries]})
    )
    got = cosine_topk(emb, qdf, k=10).toPandas()
    want = _numpy_topk(pdf, queries, 10)
    for qid, grp in got.groupby("query_id"):
        assert list(grp.sort_values("rk")["neighbor_id"]) == want[qid]
    # self is always rank 1 with cos ~= 1
    r1 = got[got["rk"] == 1]
    assert (r1["query_id"] == r1["neighbor_id"]).all()


def test_cosine_neardup_pairs_self_excluded(spark, emb):
    pairs = cosine_neardup_pairs(emb.limit(100), threshold=0.8).toPandas()
    assert (pairs["a"] < pairs["b"]).all()


def test_lsh_neardup_equals_exact_on_planted_fixture(spark):
    """The LSH scale path must reproduce the exact near-dup pair set on
    the planted fixture (60 pairs at cos >= 0.9, distractors below)."""
    from kgforge.fixtures import ensure_neardup_fixture

    emb = spark.read.parquet(f"{ensure_neardup_fixture()}/embeddings.parquet")
    key = ["a", "b"]
    exact = (
        cosine_neardup_pairs(emb, threshold=0.9, method="exact")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    lsh = (
        cosine_neardup_pairs(emb, threshold=0.9, method="lsh")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, lsh)
    assert len(lsh) == 60
    # auto routing: high threshold -> lsh, low -> exact
    from kgforge import similarity as sim

    assert sim.cosine_neardup_pairs(emb, 0.9, method="auto").count() == 60


def test_ivf_topk_recall_dial(spark):
    """IVF: probing ALL inverted lists is exact (recall 1.0); recall is
    monotone in nprobe; self is always rank 1 (its own list is probed)."""
    from kgforge.fixtures import ensure_neardup_fixture
    from kgforge.similarity import ivf_topk

    emb = spark.read.parquet(f"{ensure_neardup_fixture()}/embeddings.parquet")
    q = emb.where(emb.vec_id < 8).selectExpr("vec_id as query_id", "embedding")
    exact = cosine_topk(emb, q, k=10).select("query_id", "neighbor_id")
    n = exact.count()
    recalls = []
    for nprobe in (2, 8, 16):
        ivf = ivf_topk(emb, q, k=10, n_clusters=16, nprobe=nprobe)
        hits = exact.join(
            ivf.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
        ).count()
        recalls.append(hits / n)
        r1 = ivf.where(ivf.rk == 1).toPandas()
        assert (r1["query_id"] == r1["neighbor_id"]).all()
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0  # nprobe == n_clusters -> exact


def test_ivf_persisted_index_equals_inmemory(spark, tmp_path):
    """IVF serving path: a parquet-persisted index (centroids +
    assignments) must answer queries byte-identically to the in-memory
    build — same seeded quantizer, same candidates, same ranks."""
    from kgforge.fixtures import ensure_neardup_fixture
    from kgforge.similarity import ivf_index_read, ivf_index_write, ivf_topk

    emb = spark.read.parquet(f"{ensure_neardup_fixture()}/embeddings.parquet")
    q = emb.where(emb.vec_id < 8).selectExpr("vec_id as query_id", "embedding")
    d = str(tmp_path / "ivf")
    ivf_index_write(spark, emb, d, n_clusters=16)
    idx = ivf_index_read(spark, d)
    key = ["query_id", "rk"]
    a = ivf_topk(emb, q, k=10, n_clusters=16, nprobe=4).toPandas().sort_values(key).reset_index(drop=True)
    b = ivf_topk(emb, q, k=10, nprobe=4, index=idx).toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lsh_topk_recall(spark, emb):
    pdf = emb.toPandas()
    queries = [(int(r["vec_id"]), r["embedding"]) for _, r in pdf.head(10).iterrows()]
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": [q[0] for q in queries], "embedding": [list(q[1]) for q in queries]})
    )
    got = lsh_topk(emb, qdf, k=5, n_planes=6).toPandas()
    want = _numpy_topk(pdf, queries, 5)
    # approximate: measure recall@5 against exact; same-bucket self always hit
    hits = tot = 0
    for qid, grp in got.groupby("query_id"):
        hits += len(set(grp["neighbor_id"]) & set(want[qid]))
        tot += 5
    assert hits / tot >= 0.3, f"LSH recall {hits/tot}"
    r1 = got[got["rk"] == 1]
    assert (r1["query_id"] == r1["neighbor_id"]).all()


def test_quantize_embeddings_roundtrip_error_bound(spark):
    import numpy as np
    import pandas as pd

    from kgforge.similarity import quantize_embeddings

    rng = np.random.default_rng(5)
    vecs = [rng.normal(size=16).astype("float32") for _ in range(20)]
    vecs.append(np.full(16, 3.25, dtype="float32"))  # constant vector
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    got = quantize_embeddings(df).toPandas().set_index("vec_id").sort_index()
    for i, v in enumerate(vecs):
        v64 = v.astype("float64")
        qmin, qmax = v64.min(), v64.max()
        scale = (qmax - qmin) / 255.0
        row = got.loc[i]
        assert row["qmin"] == qmin and row["qmax"] == qmax
        codes = np.array([int(c) for c in row["codes"].split(",")])
        if scale == 0:
            assert (codes == 0).all() and row["max_abs_err"] == 0.0
            continue
        want_codes = np.floor((v64 - qmin) / scale + 0.5).astype(int)  # half-up
        assert (codes == want_codes).all()
        assert codes.min() >= 0 and codes.max() <= 255
        recon = qmin + codes * scale
        assert row["max_abs_err"] == np.abs(v64 - recon).max()
        # the int8 error contract: worst dim off by at most half a step
        assert row["max_abs_err"] <= scale / 2 + 1e-12


def test_quantized_topk_recall(spark):
    from kgforge.similarity import dequantized_vectors

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=10).collect()
    }
    deq = dequantized_vectors(emb)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(deq, q, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9  # int8 decode barely perturbs the ranking


def test_pq_adc_matches_numpy_reconstruction(spark):
    """ADC scores == numpy distance to the reconstructed (decoded)
    vectors, and the top-k ranking is partitioning-independent."""
    import numpy as np
    import pandas as pd

    from kgforge.similarity import pq_encode, pq_fit, pq_topk

    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 16)).astype("float32")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(60), "embedding": list(map(list, X))}),
        "vec_id long, embedding array<float>",
    )
    B = pq_fit(emb, m=4, ksub=8, sample_size=60)
    codes = {r["vec_id"]: r["codes"] for r in pq_encode(emb, B).collect()}

    Xn = X.astype("float64")
    Xn = Xn / np.linalg.norm(Xn, axis=1, keepdims=True)
    # nearest-sub-centroid codes match numpy argmin per subspace
    for i in (0, 17, 59):
        for j in range(4):
            d2 = ((Xn[i, j * 4:(j + 1) * 4] - B[j]) ** 2).sum(axis=1)
            assert codes[i][j] == int(d2.argmin())

    q = emb.where("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    top_a = [(r["query_id"], r["neighbor_id"], r["rk"])
             for r in pq_topk(emb, q, k=5, m=4, ksub=8).orderBy(
                 "query_id", "rk").collect()]
    top_b = [(r["query_id"], r["neighbor_id"], r["rk"])
             for r in pq_topk(emb.repartition(7), q, k=5, m=4, ksub=8).orderBy(
                 "query_id", "rk").collect()]
    assert top_a == top_b

    # ADC ranking equals brute-force over decoded vectors (numpy replay)
    recon = np.stack([
        np.concatenate([B[j][codes[i][j]] for j in range(4)]) for i in range(60)
    ])
    q0 = Xn[0]
    d = ((recon - q0) ** 2).sum(axis=1)
    order = np.lexsort((np.arange(60), np.round(d, 9)))[:5]
    got0 = [n for (qq, n, _) in top_a if qq == 0]
    assert got0 == list(order)


def test_pq_fit_rejects_bad_split(spark):
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from kgforge.similarity import pq_fit

    X = np.zeros((4, 10), dtype="float32")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(4), "embedding": list(map(list, X))}),
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError):
        pq_fit(emb, m=3, ksub=4, sample_size=4)


def test_knn_label_accuracy_separated_clusters(spark):
    """Two well-separated clusters classify perfectly; a deliberately
    mislabeled vector inside a cluster is voted down by its neighbors."""
    import numpy as np

    from kgforge.similarity import knn_label_accuracy

    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):  # label 0 around +e0, label 1 around -e0
        base = np.zeros(8)
        base[0] = 1.0 if i % 2 == 0 else -1.0
        v = base + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v], i % 2))
    # vec 20: sits in cluster 0 but carries label 1 → its own prediction
    # is 0 (counts as wrong for label 1), and it cannot flip any
    # neighborhood with k=5
    v = np.zeros(8); v[0] = 1.0
    rows.append((20, [float(x) for x in v + rng.normal(0, 0.05, 8)], 1))

    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        r.label: (r.n_queries, r.n_correct)
        for r in knn_label_accuracy(emb, k=5, n_queries=21).collect()
    }
    assert got[0] == (10, 10)        # clean cluster: perfect
    assert got[1] == (11, 10)        # only the planted mislabel misses
