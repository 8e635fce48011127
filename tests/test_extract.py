"""B2/B3: mention detection + triple extraction vs the generator-intent
golden set (the P/R >= 0.95 gate; deterministic rules hit 1.0 here)."""

import pandas as pd

from kgforge.fixtures import gazetteer, gen_transcripts, patterns_df
from kgforge.stages.extract import detect_mentions, extract_triples, surface_triples_dedup


def _pr(got: pd.DataFrame, want: pd.DataFrame, keys: list[str]) -> tuple[float, float]:
    g = set(map(tuple, got[keys].itertuples(index=False)))
    w = set(map(tuple, want[keys].itertuples(index=False)))
    tp = len(g & w)
    return (tp / len(g) if g else 0.0, tp / len(w) if w else 0.0)


def test_triple_extraction_pr_gate(spark):
    t, golden, _m = gen_transcripts(60)
    df = spark.createDataFrame(t)
    got = extract_triples(df, gazetteer(), patterns_df()).toPandas()
    keys = ["conv_id", "turn_idx", "subj", "pred", "obj"]
    precision, recall = _pr(got.drop_duplicates(keys), golden, keys)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_mentions_cover_golden_arguments(spark):
    t, golden, _m = gen_transcripts(30)
    df = spark.createDataFrame(t)
    m = detect_mentions(df, gazetteer()).toPandas()
    # every golden subject/object surface is detected on its turn
    m_set = set(map(tuple, m[["conv_id", "turn_idx", "surface"]].itertuples(index=False)))
    for col in ("subj", "obj"):
        want = set(map(tuple, golden[["conv_id", "turn_idx", col]].itertuples(index=False)))
        missing = want - m_set
        assert not missing, f"missing mentions: {list(missing)[:5]}"
    # spans point at the surface
    sample = m.head(200)
    texts = t.set_index(["conv_id", "turn_idx"])["text"]
    for _, r in sample.iterrows():
        txt = texts.loc[(r["conv_id"], r["turn_idx"])]
        assert txt[r["start"]:r["end"]] == r["surface"]


def test_detected_mentions_match_golden_spans(spark):
    """B2 vs generator intent: every intended mention is detected at its
    exact character span (and nothing else matches intended surfaces)."""
    t, _g, golden_m = gen_transcripts(40)
    got = detect_mentions(spark.createDataFrame(t), gazetteer()).toPandas()
    got = got[got["surface"].isin(set(golden_m["surface"]))]
    key = ["conv_id", "turn_idx", "start"]
    cols = ["conv_id", "turn_idx", "surface", "start", "end", "mtype"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True).astype({"start": "int32", "end": "int32"}),
        golden_m[cols].sort_values(key).reset_index(drop=True),
    )


def test_trie_alternation_equals_flat_longest_first():
    """The trie-factored surface alternation must produce exactly the
    matches of a flat longest-first alternation (incl. spans), on real
    gazetteer surfaces and on adversarial prefix-nested words."""
    import re

    from kgforge.stages.extract import _B_L, _B_R, _HYPH_TOKEN, _entity_alt, _trie_pattern

    cases = [
        (gazetteer()["surface"].tolist(),
         "Acme Corp bought Acme-Corp and ACME yesterday; acme corp inc too."),
        (["a", "ab", "abc", "abd", "b", "ba"], "ab abc abd ba b a abcd"),
        (["data", "database", "data base"], "the database holds data base rows"),
    ]
    for surfaces, extra_text in cases:
        flat = "(?:" + "|".join(
            [re.escape(s) for s in sorted(surfaces, key=len, reverse=True)] + [_HYPH_TOKEN]
        ) + ")"
        rx_flat = re.compile(_B_L + "(" + flat + ")" + _B_R)
        rx_trie = re.compile(_B_L + "(" + _entity_alt(surfaces) + ")" + _B_R)
        texts = [extra_text] + [f"x {s} y" for s in surfaces]
        for t in texts:
            a = [(m.group(1), m.start(1)) for m in rx_flat.finditer(t)]
            b = [(m.group(1), m.start(1)) for m in rx_trie.finditer(t)]
            assert a == b, (t, a, b)


def test_dedup_idempotent(spark):
    t, _, _m = gen_transcripts(20)
    df = spark.createDataFrame(t)
    tri = extract_triples(df, gazetteer(), patterns_df())
    once = surface_triples_dedup(tri)
    assert once.count() == surface_triples_dedup(once).count()


def test_trie_alternation_property_random():
    """Property (hypothesis): for ANY surface set and text over the
    working alphabet, the trie-factored alternation matches the flat
    longest-first alternation exactly, including spans — prefix-nested
    and substring-nested surfaces are the regression surface here."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgforge.stages.extract import _B_L, _B_R, _HYPH_TOKEN, _entity_alt

    surfaces_s = st.lists(
        st.text(alphabet="abAB12", min_size=1, max_size=6), min_size=1, max_size=12
    )
    text_s = st.text(alphabet="abAB12 -.", max_size=60)

    @given(surfaces=surfaces_s, text=text_s)
    @settings(max_examples=250, deadline=None)
    def check(surfaces, text):
        flat = "(?:" + "|".join(
            [re.escape(s) for s in sorted(set(surfaces), key=lambda x: (-len(x), x))]
            + [_HYPH_TOKEN]
        ) + ")"
        rx_flat = re.compile(_B_L + "(" + flat + ")" + _B_R)
        rx_trie = re.compile(_B_L + "(" + _entity_alt(surfaces) + ")" + _B_R)
        a = [(m.group(1), m.start(1)) for m in rx_flat.finditer(text)]
        b = [(m.group(1), m.start(1)) for m in rx_trie.finditer(text)]
        assert a == b, (surfaces, text, a, b)

    check()


def test_null_text_rows_skip_silently(spark):
    """Null/NaN text rows must be skipped, not raise TypeError in the
    finditer fast path (parity with the old str.contains behavior)."""
    t, _g, _m = gen_transcripts(4)
    df = spark.createDataFrame(t)
    nulled = df.limit(0).unionByName(
        spark.createDataFrame(
            [("cnull", 0, None), ("cempty", 0, "")],
            df.select("conv_id", "turn_idx", "text").schema,
        ),
        allowMissingColumns=True,
    )
    both = df.unionByName(nulled, allowMissingColumns=True)
    base_m = detect_mentions(df, gazetteer()).count()
    base_t = extract_triples(df, gazetteer(), patterns_df()).count()
    assert detect_mentions(both, gazetteer()).count() == base_m
    assert extract_triples(both, gazetteer(), patterns_df()).count() == base_t
