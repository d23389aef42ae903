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
    # r12 window (VERDICT r11 items 1-2/6-8): the HUGEINT-fix confirmation
    # round — the 5 red operator entries stay IN under re-typed oracles,
    # the two named regression detectors and the smoking-gun probe pair
    # join them, the other 9 r11 forensics rotate OUT, the displaced band
    # returns (q5/q18/pivot/asof/variant/typed_struct/cube/q9/winnowing/
    # hll/pandas_udf), and the three r12 operators enter day-one.
    "pipeline-parity": ["incremental_extract", "merge_upsert", "dq_gate", "reconciliation"],
    "relational": ["q3_shipping_priority", "q1_pricing_summary", "q5_region_revenue",
                   "q9_profit_by_nation_year", "q18_large_orders",
                   "pivot_status_by_segment", "cube_events",
                   "asof_last_click_before_purchase"],
    "transform-chains": ["transform_chain", "typed_struct_props_chain",
                         "variant_props_chain"],
    "timeseries": ["continuous_aggregate_rollup"],
    "model-filters": ["quality_classifier_linear", "quality_classifier_train_gd",
                      "quality_classifier_gd_scores"],
    "X1-exact-dedup": ["dedup_exact_groups"],
    "X2-near-dup": ["minhash_near_dups", "semdedup_cluster_pairs",
                    "dedup_canonical_pagerank", "winnowing_fingerprints"],
    "X3-similarity": ["embedding_topk_bruteforce", "tfidf_topk_similar_docs",
                      "embedding_topk_pandas_udf", "hnsw_two_layer_search"],
    # brand-new r12 operators, driver-checked from day one
    "r12-new": ["hnsw_three_layer_search", "graph_ann_search_batch",
                "hnsw_batch_routed_search", "stream_merge_into_mart",
                "pack_efficiency_report"],
    "X4-text": ["gopher_quality_flags", "contamination_13gram", "lang_id_heuristic"],
    "X5-multimodal": ["multimodal_resize_8x8"],
    "S1b-docstore": ["docstore_lang_source_stats"],
    "assembly": ["pack_efficiency_report"],
    "sketches": ["hll_sketch_merge"],
    "X6-streaming": ["stream_tumbling_hourly", "stream_stream_attribution_join",
                     "stream_merge_into_mart"],
    # the r9-r11 reds held in-window until driver-green (VERDICT r11 item 1)
    "reds-recheck": ["knn_graph_nn_descent", "graph_ann_search_topk",
                     "graph_ann_search_durable", "hnsw_two_layer_search",
                     "quality_classifier_train_gd"],
    # the graph family re-checks in full — every oracle's TEXT changed r12
    # (md5 CAST + small-norm guard); the fixed-k flagship yielded its slot
    # to the batched router (auto-k ≡ flagship at the driver's sf0.01)
    "graph-integer-contract": ["knn_graph_topk_auto_k",
                               "knn_graph_pagerank", "knn_graph_nn_descent",
                               "graph_ann_search_topk", "graph_ann_search_durable",
                               "graph_ann_search_batch", "hnsw_three_layer_search",
                               "hnsw_batch_routed_search"],
    # r12 divergence instrumentation: the named regression detectors +
    # the HUGEINT smoking-gun pair (VERDICT r11 items 2 and 6)
    "r12-forensics": ["knn_seed_edges", "qc_train_epoch1_weights",
                      "oracle_probe_hugeint_passthrough",
                      "oracle_probe_hugeint_cast"],
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
