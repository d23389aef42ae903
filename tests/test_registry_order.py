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
    # r11 window (VERDICT r10 items 1/4/5): the divergence-forensics
    # round — all 4 two-round reds stay IN (now under the pure-integer
    # quantized-cosine contract), the full graph family re-enters because
    # its VALUES changed (quantization + rounds 2→3), and 11 forensic
    # entries (6 trajectory stages + 5 engine-behavior probes) join them
    # so CORRECTNESS_r11 localizes the driver divergence. The 18 green
    # r10 day-ones rotate OUT; the VERDICT-named displaced band RETURNS
    # (q8, range_join, scd2, winnowing, simhash_portable, ivf_kmeans,
    # grouping_sets, quality_classifier_linear, lang_id_heuristic,
    # hll/pandas_udf sentinels). 21 of 50 slots are returning entries.
    "pipeline-parity": ["incremental_extract", "merge_upsert", "dq_gate", "reconciliation"],
    "relational": ["q3_shipping_priority", "q1_pricing_summary", "q8_market_share",
                   "grouping_sets_revenue", "range_join_ship_latency",
                   "scd2_status_history"],
    "transform-chains": ["transform_chain"],
    "timeseries": ["continuous_aggregate_rollup"],
    "model-filters": ["quality_classifier_linear", "quality_classifier_train_gd",
                      "quality_classifier_gd_scores"],
    "X1-exact-dedup": ["dedup_exact_groups"],
    "X2-near-dup": ["minhash_near_dups", "simhash_near_dups_portable",
                    "semdedup_cluster_pairs", "dedup_canonical_pagerank"],
    "X3-similarity": ["embedding_topk_bruteforce", "tfidf_topk_similar_docs",
                      "semantic_decontaminate_topk", "hnsw_two_layer_search"],
    # brand-new r11 operators, driver-checked from day one
    "r11-new": ["semantic_decontaminate_topk", "token_budget_select",
                "dedup_canonical_pagerank", "hnsw_two_layer_search"],
    "X4-text": ["gopher_quality_flags", "contamination_13gram", "lang_id_heuristic"],
    "X5-multimodal": ["multimodal_resize_8x8"],
    "S1b-docstore": ["docstore_lang_source_stats"],
    "assembly": ["training_data_prep"],
    "X6-streaming": ["stream_tumbling_hourly", "stream_stream_attribution_join"],
    # the 4 two-round reds held in-window until driver-green (VERDICT r10)
    "reds-recheck": ["knn_graph_nn_descent", "graph_ann_search_topk",
                     "graph_ann_search_durable", "quality_classifier_train_gd"],
    # the graph family re-checks in full — every value changed r11
    "graph-integer-contract": ["knn_graph_topk", "knn_graph_topk_auto_k",
                               "knn_graph_pagerank", "knn_graph_nn_descent",
                               "graph_ann_search_topk", "graph_ann_search_durable"],
    # r11 forensic instrumentation, driver-checked from day one
    "r11-forensics": ["qc_features_checksum", "qc_train_epoch1_weights",
                      "qc_train_epoch8_weights", "knn_assign_cells",
                      "knn_seed_edges", "knn_nn_descent_round1",
                      "oracle_probe_data_fingerprint", "oracle_probe_tokenize_md5",
                      "oracle_probe_round_half", "oracle_probe_float_sum_order",
                      "oracle_probe_float_cosine_x1e4"],
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
