"""The driver's correctness gate snapshots only the FIRST 50
``queries()`` entries (CORRECTNESS_r01..r03 key sets). These guards pin
the curated window so an innocent dict insertion can't silently push an
operator family out of the driver's sight (it happened twice while
building round 4)."""

WINDOW = {
    "b1_turn_ordering", "b2_detect_mentions", "b3_extract_triples",
    "b5_link_triples", "b7_lsh_covers_exact_jaccard",
    "b8_connected_components", "b9_dense_ids", "b10_id_triples",
    "a2_triple_dedup", "a3_bern_stats", "a4_negative_properties",
    "a5_bern_properties", "a6_batch_properties", "a7_transe_scores",
    "a8_transh_scores", "a9_transr_scores", "a10_transd_scores",
    "a11_margin_loss", "a14_train_eval_metrics",
    "a15_link_prediction_ranks", "a15_ranks_blocked",
    "a17_link_prediction_metrics", "a18_accuracy", "a19_topk_completions",
    "a20_checkpoint_scores", "a21_incremental_training",
    "a1_dict_roundtrip", "b11_resume_manifest", "b12_eval_gate",
    "dedup_exact", "dedup_minhash_containment", "dedup_ngram_jaccard",
    "dedup_simhash_pigeonhole",
    "txt_token_counts", "txt_quality_scores", "txt_lang_id",
    "txt_tfidf_top_terms",
    "ann_cosine_topk", "ann_lsh_topk_recall", "ann_ivf_topk_recall",
    "str_windowed_triples", "str_session_windows", "str_dedup_docs",
    "str_stateful_counts", "str_enriched_segments",
    "cat_time_travel", "mm_features", "asof_purchases",
    "q1_pricing_summary", "q_rollup_lineitem",
}


def test_first_50_is_the_curated_window():
    import __spark_entry__ as m

    first50 = list(m.queries())[:50]
    assert len(WINDOW) == 50
    assert set(first50) == WINDOW, (
        f"window drifted: +{set(first50) - WINDOW} -{WINDOW - set(first50)}"
    )


def test_every_window_query_has_an_oracle():
    import __spark_entry__ as m

    oracles = m.oracle_sql()
    first50 = list(m.queries())[:50]
    missing = [k for k in first50 if k not in oracles]
    assert not missing, missing


def test_every_oracle_key_has_a_query():
    import __spark_entry__ as m

    qs = m.queries()
    orphans = [k for k in m.oracle_sql() if k not in qs]
    assert not orphans, orphans
