"""End-to-end pipeline: P/R gate, per-turn invariant, resume semantics,
determinism (BASELINE.md target table)."""

import json
import os

import pandas as pd
import pytest

from kgforge.fixtures import ensure_fixtures
from kgforge.pipeline import Pipeline

STAGES = ["reassemble", "extract", "canonicalize", "dicts", "link", "materialize"]


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    fdir = ensure_fixtures("sf0.001")
    work = str(tmp_path_factory.mktemp("pipe"))
    pipe = Pipeline(
        spark,
        input_path=os.path.join(fdir, "transcripts.parquet"),
        work_dir=work,
        gazetteer_path=os.path.join(fdir, "gazetteer.parquet"),
        patterns_path=os.path.join(fdir, "patterns.parquet"),
        out_partitions=4,
        bucket_table="kg_triples_e2e",
        export_ntriples=True,
    )
    pipe.run(STAGES)
    return work, fdir, pipe


def _read_triples_txt(path):
    lines = open(path).read().splitlines()
    n = int(lines[0])
    rows = [tuple(map(int, line.split(" "))) for line in lines[1:]]
    assert len(rows) == n
    return rows


def test_pr_gate_vs_golden(spark, run_dir):
    """North-rule gate: emitted (s,p,o) P/R >= 0.95 vs generator intent."""
    work, fdir, _ = run_dir
    exp = os.path.join(work, "materialize", "openke")
    e2id = {}
    for line in open(os.path.join(exp, "entity2id.txt")).read().splitlines()[1:]:
        name, i = line.split("\t")
        e2id[name] = int(i)
    r2id = {}
    for line in open(os.path.join(exp, "relation2id.txt")).read().splitlines()[1:]:
        name, i = line.split("\t")
        r2id[name] = int(i)
    golden = pd.read_parquet(os.path.join(fdir, "golden_triples.parquet"))
    want = {
        (e2id[s], r2id[p], e2id[o])
        for s, p, o in golden[["subj_canon", "pred", "obj_canon"]]
        .drop_duplicates()
        .itertuples(index=False)
    }
    got = {(h, r, t) for h, t, r in _read_triples_txt(os.path.join(exp, "train2id.txt"))}
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95, precision
    assert recall >= 0.95, recall


def test_per_turn_invariant(spark, run_dir):
    """100% per-turn text equality under stable ordering (input_hint)."""
    work, fdir, _ = run_dir
    got = (
        spark.read.parquet(os.path.join(work, "reassemble"))
        .select("conv_id", "turn_idx", "turn_rank", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = (
        pd.read_parquet(os.path.join(fdir, "transcripts.parquet"))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(src)
    assert (got["text"].to_numpy() == src["text"].to_numpy()).all()
    assert (got["turn_rank"] == got["turn_idx"] + 1).all()


def test_resume_skips_done_and_recomputes_invalidated(spark, run_dir):
    work, fdir, pipe = run_dir
    # resume run: everything skipped
    pipe2 = Pipeline(
        spark,
        input_path=os.path.join(fdir, "transcripts.parquet"),
        work_dir=work,
        gazetteer_path=os.path.join(fdir, "gazetteer.parquet"),
        patterns_path=os.path.join(fdir, "patterns.parquet"),
        out_partitions=4,
        resume=True,
        bucket_table="kg_triples_e2e",
        export_ntriples=True,  # must match run_dir's config (cfg fingerprint)
    )
    pipe2.run(STAGES)
    assert all(v == 0.0 for v in pipe2.timings.values()), pipe2.timings

    # interrupt simulation: drop the link stage manifest -> only link and
    # downstream recompute; output equal to the uninterrupted run
    before = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(work, "materialize", "triples"))
            .toPandas()[["s", "p", "o", "part"]]  # incl. salted partition:
            .itertuples(index=False),             # resume must reproduce layout
        )
    )
    pipe2.manifest.invalidate("link")
    pipe3 = Pipeline(
        spark,
        input_path=os.path.join(fdir, "transcripts.parquet"),
        work_dir=work,
        gazetteer_path=os.path.join(fdir, "gazetteer.parquet"),
        patterns_path=os.path.join(fdir, "patterns.parquet"),
        out_partitions=4,
        resume=True,
        bucket_table="kg_triples_e2e",
        export_ntriples=True,  # must match run_dir's config (cfg fingerprint)
    )
    pipe3.run(STAGES)
    assert pipe3.timings["reassemble"] == 0.0
    assert pipe3.timings["extract"] == 0.0
    assert pipe3.timings["link"] > 0.0
    after = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(work, "materialize", "triples"))
            .toPandas()[["s", "p", "o", "part"]]
            .itertuples(index=False),
        )
    )
    assert before == after  # data AND partition layout byte-identical


def test_evaluate_gate_scores_constructed_kg(spark, run_dir):
    """B12: eval_metrics.json must reflect the pipeline's OWN KG — a
    content-hash test bucket of the materialized triples, not a synthetic
    fixture split."""
    work, fdir, pipe = run_dir
    pipe.run(["evaluate"])
    metrics = json.load(open(os.path.join(work, "eval_metrics.json")))
    assert metrics["n_gate_triples"] > 0
    n_mat = pipe.manifest.get("materialize")["row_count"]
    # gate bucket is ~10% of materialized triples (capped at 500)
    assert metrics["n_gate_triples"] <= min(500, n_mat)
    for k in ("mrr_filt", "hits10_filt", "mr_raw"):
        assert metrics[k] == metrics[k] and metrics[k] > 0  # finite, nonzero


def test_lineage_counters_recorded(run_dir):
    work, _, pipe = run_dir
    entry = pipe.manifest.get("materialize")
    assert entry["row_count"] > 0
    assert entry["extra"]["lineage"]["row_count"] == entry["row_count"]


def test_two_phase_dense_ids_pipeline_identical(spark, tmp_path):
    """dense_ids_impl='two_phase' (the no-global-sort scale path) must
    produce byte-identical dictionaries and triples to the sort impl."""
    fdir = ensure_fixtures("unit")
    outs = {}
    for impl in ("sort", "two_phase"):
        work = str(tmp_path / impl)
        Pipeline(
            spark,
            input_path=os.path.join(fdir, "transcripts.parquet"),
            work_dir=work,
            gazetteer_path=os.path.join(fdir, "gazetteer.parquet"),
            patterns_path=os.path.join(fdir, "patterns.parquet"),
            out_partitions=2,
            dense_ids_impl=impl,
        ).run(STAGES)
        outs[impl] = (
            open(os.path.join(work, "materialize", "openke", "train2id.txt")).read(),
            open(os.path.join(work, "materialize", "openke", "entity2id.txt")).read(),
        )
    assert outs["sort"] == outs["two_phase"]


def test_entry_and_contract_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"relation", "n_triples", "n_subjects"}
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_bucketed_fact_table_zero_exchange(spark, run_dir):
    """The pipeline's bucket_table output: row-set identical to the
    parquet fact table, and the subject-degree consumer's physical plan
    contains NO Exchange (the write-time bucketing replaces the per-query
    shuffle) while the same query over plain parquet does shuffle."""
    from kgforge.graphstats import subject_out_degrees

    work, _fdir, _pipe = run_dir
    tbl = spark.table("kg_triples_e2e")
    parq = spark.read.parquet(os.path.join(work, "materialize", "triples")).select(
        "s", "p", "o"
    )
    assert sorted(map(tuple, tbl.collect())) == sorted(map(tuple, parq.collect()))
    plan = subject_out_degrees(tbl)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    plan2 = subject_out_degrees(parq)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan2
    assert (
        subject_out_degrees(tbl).count() == subject_out_degrees(parq).count()
    )


def test_canonicalize_recovers_unseen_aliases(spark, run_dir):
    """The point of B7/B8: hyphen-corrupted alias variants (absent from
    the gazetteer) are linkable ONLY via the LSH+CC alias map —
    dictionary-only linking provably loses that recall."""
    work, fdir, _ = run_dir
    golden = pd.read_parquet(os.path.join(fdir, "golden_triples.parquet"))
    corrupted = golden[
        golden["subj"].str.contains("-") | golden["obj"].str.contains("-")
    ]
    assert len(corrupted) > 0, "fixture must contain unseen alias variants"

    alias_map = spark.read.parquet(os.path.join(work, "canonicalize", "alias_map")).toPandas()
    amap = dict(zip(alias_map["surface"], alias_map["canonical"]))
    gaz = pd.read_parquet(os.path.join(fdir, "gazetteer.parquet"))
    gmap = dict(zip(gaz["surface"], gaz["canonical"]))

    hyph_surfaces = set(corrupted["subj"][corrupted["subj"].str.contains("-")]) | set(
        corrupted["obj"][corrupted["obj"].str.contains("-")]
    )
    cc_hits = sum(1 for s in hyph_surfaces if amap.get(s) is not None and "-" not in amap[s])
    dict_hits = sum(1 for s in hyph_surfaces if s in gmap)
    assert dict_hits == 0, "corrupted variants must NOT be in the dictionary"
    assert cc_hits / len(hyph_surfaces) >= 0.95, (
        f"CC linked only {cc_hits}/{len(hyph_surfaces)} unseen aliases"
    )
    # and they resolve to the RIGHT canonical
    want = {}
    for _, row in corrupted.iterrows():
        if "-" in row["subj"]:
            want[row["subj"]] = row["subj_canon"]
        if "-" in row["obj"]:
            want[row["obj"]] = row["obj_canon"]
    wrong = {s: (amap.get(s), c) for s, c in want.items() if amap.get(s) != c}
    assert not wrong, f"mis-canonicalized: {dict(list(wrong.items())[:3])}"


def test_ntriples_export_matches_fact_table(spark, run_dir):
    """--export-ntriples: the W3C interchange copy written by
    materialize parses back to exactly the canonical STRING triples —
    the id fact table mapped through entity2id/relation2id — with no
    encode/decode loss."""
    from kgforge.io_rdf import read_ntriples

    work, _fdir, _pipe = run_dir
    exp = os.path.join(work, "materialize", "openke")
    e2id, r2id = {}, {}
    for line in open(os.path.join(exp, "entity2id.txt")).read().splitlines()[1:]:
        name, i = line.rsplit("\t", 1)
        e2id[int(i)] = name
    for line in open(os.path.join(exp, "relation2id.txt")).read().splitlines()[1:]:
        name, i = line.rsplit("\t", 1)
        r2id[int(i)] = name
    fact = spark.read.parquet(os.path.join(work, "materialize", "triples"))
    expected = sorted(
        (e2id[r.s], r2id[r.p], e2id[r.o])
        for r in fact.select("s", "p", "o").collect()
    )
    back = read_ntriples(spark, os.path.join(exp, "ntriples"))
    assert sorted(map(tuple, back.collect())) == expected
