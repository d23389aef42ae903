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
    # r9 window (VERDICT r8 item 7): backlog is zero, so the window's job
    # is DRIFT RE-DETECTION — every family sentinel below is in-window at
    # HEAD, and the bulk of the 50 slots are RETURNING entries (>=10
    # required; this window carries ~40), including the r1-only relational
    # tail (8 rounds since last driver contact) and the r6/r7 flagships
    # the r8 verdict named. r9's two new operators check from day one.
    "pipeline-parity": ["incremental_extract", "merge_upsert", "dq_gate", "reconciliation"],
    "relational": ["q3_shipping_priority", "q1_pricing_summary", "grouping_sets_revenue",
                   "cube_events", "scd2_status_history"],
    "transform-chains": ["transform_chain", "typed_struct_props_chain", "variant_props_chain"],
    "timeseries": ["continuous_aggregate_rollup", "rolling_1h_user_stats"],
    # approx_distinct_users rotated out for graph_ann_search_topk (r9's
    # third operator, landed after the rotation commit); hll_sketch_merge
    # keeps the sketch band in-window
    "sketch": ["hll_sketch_merge"],
    "model-filters": ["quality_classifier_linear"],
    "X1-exact-dedup": ["dedup_exact_groups", "dedup_fingerprint_groups",
                       "exact_span_dedup_20tok"],
    "X2-near-dup": ["minhash_near_dups", "simhash_near_dups_portable", "semdedup_cluster_pairs"],
    "X3-similarity": ["embedding_topk_bruteforce", "embedding_topk_pandas_udf",
                      "embedding_topk_ivf_kmeans", "tfidf_topk_similar_docs", "bm25_topk_docs"],
    "X4-text": ["winnowing_fingerprints", "lang_id_heuristic", "gopher_quality_flags",
                "contamination_13gram"],
    "X5-multimodal": ["multimodal_resize_8x8"],
    "S1b-docstore": ["docstore_lang_source_stats"],
    "assembly": ["training_data_prep"],
    "X6-streaming": ["stream_tumbling_hourly", "stream_stream_attribution_join"],
    # brand-new r9 operators, driver-checked from day one (the late trio
    # displaced dedup_excise_spans_20tok / ssjoin_prefix_filter /
    # simhash_signatures_portable — each family keeps another sentinel)
    "r9-new": ["knn_graph_nn_descent", "dsir_gumbel_topk_sample",
               "graph_ann_search_topk", "bpe_train_merges",
               "bpe_encode_fertility", "corpus_js_divergence_by_source",
               "embedding_topk_ivf_batch",
               # late r9 pair (KN smoothing, PSI drift) — displaced
               # q5_region_revenue / asof_last_click_before_purchase,
               # whose families keep 9 / 1 other in-window members
               "bigram_kn_logprob_scores", "psi_drift_by_window",
               # streaming PSI twin displaced dedup_cluster_components
               # (X2 keeps minhash/simhash-portable/semdedup in-window);
               # overlap matrix displaced q18 (shape covered by q1/q3/q8/q9)
               "stream_psi_drift_monitor", "source_overlap_matrix"],
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
