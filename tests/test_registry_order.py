"""Registry-ordering contract: the driver checks only the FIRST 50 entries of
``queries()``, so that window must span every operator family (SURVEY §2 +
the LLM-data [EXT] surface). Round 1 lost all 36 [EXT] rows to raw import
order; these tests pin the curated prefix so it can't regress.
"""

from __future__ import annotations

import warnings

import my_favorite_etl_pipeline_spark as engine
from my_favorite_etl_pipeline_spark.registry import CURATED_FIRST, REGISTRY

DRIVER_CAP = 50

# One representative per family that MUST sit inside the driver-checked window.
# The window ROTATES every round to catch fixture/environment drift, never
# freezes (decimal_surface proved why: six rounds of local green, red on
# first driver contact). r8 burned the never-checked backlog to zero.
FAMILY_SENTINELS = {
    # r10 window (VERDICT r9 item 6): drift re-detection — the nine green
    # r9 day-ones rotated OUT, the five flagships they displaced RETURN
    # (q5/q18/pivot/asof/dedup_cluster_components), both r9 hash-red graph
    # rows stay IN for the fix re-check, and every r10 operator checks
    # from day one (18 by round end — the six late-r10 additions each
    # displaced a named long-green returnee). 32 of the 50 slots are
    # returning entries (>=10 required).
    "pipeline-parity": ["incremental_extract", "merge_upsert", "dq_gate", "reconciliation"],
    "relational": ["q3_shipping_priority", "q1_pricing_summary", "q5_region_revenue",
                   "q18_large_orders", "pivot_status_by_segment",
                   "asof_last_click_before_purchase"],
    "transform-chains": ["transform_chain", "typed_struct_props_chain", "variant_props_chain"],
    "timeseries": ["continuous_aggregate_rollup", "gapfill_interpolate_hourly"],
    # r10: the sketch sentinel upgrades to the KMV theta entry — the
    # family's first FULL value-hash oracle (HLL bytes are engine-specific,
    # so hll_sketch_merge could only ever get the weaker rows-only check)
    "sketch": ["theta_sketch_user_overlap", "countmin_frequency_estimates"],
    "model-filters": ["quality_classifier_train_gd", "quality_classifier_gd_scores"],
    "X1-exact-dedup": ["dedup_exact_groups", "dedup_fingerprint_groups",
                       "exact_span_dedup_20tok"],
    # embedding_topk_pandas_udf rotated out (UDF surface stays pinned by
    # the pandas/JVM equivalence test); lang_id_heuristic rotated out
    # (X4 keeps four other members in-window)
    "X2-near-dup": ["minhash_near_dups",
                    "semdedup_cluster_pairs", "dedup_cluster_components"],
    "X3-similarity": ["embedding_topk_bruteforce",
                      "tfidf_topk_similar_docs", "bm25_topk_docs"],
    "X4-text": ["gopher_quality_flags", "contamination_13gram"],
    "X5-multimodal": ["multimodal_resize_8x8", "image_dhash_near_dups",
                      "audio_envelope_near_dups"],
    "S1b-docstore": ["docstore_lang_source_stats"],
    "assembly": ["training_data_prep"],
    "X6-streaming": ["stream_tumbling_hourly", "stream_stream_attribution_join"],
    # the r9 REDS held in-window until CORRECTNESS_r10 shows them green
    # (VERDICT r9 item 1)
    "r9-reds-recheck": ["knn_graph_nn_descent", "graph_ann_search_topk"],
    # brand-new r10 operators, driver-checked from day one
    "r10-new": ["semdedup_cluster_pairs_auto_k", "knn_graph_topk_auto_k",
                "graph_ann_search_durable", "knn_graph_pagerank",
                "quality_classifier_train_gd", "quality_classifier_gd_scores",
                "unigram_lm_train_model",
                "unigram_lm_encode_fertility", "topic_cluster_cards", "theta_sketch_user_overlap",
                "image_dhash_near_dups", "exact_percentiles_two_phase",
                "anomalous_hours_3sigma", "gapfill_interpolate_hourly",
                "audio_envelope_near_dups", "countmin_frequency_estimates",
                "event_type_correlation_matrix",
                "stream_psi_windowed_append"],
}



def test_first_50_covers_every_family():
    first = list(engine.queries())[:DRIVER_CAP]
    for family, sentinels in FAMILY_SENTINELS.items():
        missing = [s for s in sentinels if s not in first]
        assert not missing, f"family {family}: {missing} fell outside the driver's first {DRIVER_CAP}"


def test_curated_names_all_registered_or_known_pending():
    # Every curated name must exist in the registry (a typo here silently
    # shrinks the prefix). Names may lead the code only while their task is
    # actively in flight — keep this list empty at commit time.
    known_pending: set[str] = set()
    missing = [n for n in CURATED_FIRST if n not in REGISTRY and n not in known_pending]
    assert not missing, f"CURATED_FIRST names not registered: {missing}"


def test_ordering_is_stable_and_complete():
    names = list(engine.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(REGISTRY)
    # oracle_sql keys follow the same curated order and are a subset
    oracle_names = list(engine.oracle_sql())
    pos = {n: i for i, n in enumerate(names)}
    assert oracle_names == sorted(oracle_names, key=pos.__getitem__)


def test_missing_optional_dep_warns_loudly(monkeypatch):
    """A missing numpy/pandas must emit RuntimeWarning, never silently pass."""
    import importlib

    from my_favorite_etl_pipeline_spark import plans

    real_import = importlib.import_module

    def fake_import(name, package=None):
        if name == ".llm_ext":
            raise ImportError("No module named 'numpy'", name="numpy")
        return real_import(name, package=package)

    monkeypatch.setattr(importlib, "import_module", fake_import)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        plans._import_or_warn("llm_ext")
    assert any("NOT registered" in str(w.message) for w in caught)


def test_unexpected_import_error_reraises(monkeypatch):
    import importlib

    import pytest

    from my_favorite_etl_pipeline_spark import plans

    def fake_import(name, package=None):
        raise ImportError("No module named 'left_pad'", name="left_pad")

    monkeypatch.setattr(importlib, "import_module", fake_import)
    with pytest.raises(ImportError):
        plans._import_or_warn("llm_ext")
