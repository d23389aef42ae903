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
    # r14 window (VERDICT r13 item 2): seat the only two driver-unseen
    # entries (the r13 assembly seams) + return the 13-entry band with no
    # row since r12 (q5/q9/q18/pivot/cube/asof/typed_struct/variant/
    # winnowing/pandas_udf/durable/two_layer/hll); drop 15 r13-green
    # veterans whose families stay represented. 49/50 oracle-checked
    # (hll_sketch_merge is the one rows-only row, returning per the
    # verdict; its values are invariant-tested).
    "pipeline-parity": ["incremental_extract", "merge_upsert", "dq_gate", "reconciliation"],
    "relational": ["q3_shipping_priority", "q1_pricing_summary", "q5_region_revenue",
                   "q9_profit_by_nation_year", "q18_large_orders",
                   "pivot_status_by_segment", "cube_events"],
    "asof": ["asof_last_click_before_purchase"],
    "transform-chains": ["transform_chain", "typed_struct_props_chain",
                         "variant_props_chain"],
    "timeseries": ["continuous_aggregate_rollup"],
    "model-filters": ["quality_classifier_linear", "quality_classifier_train_gd"],
    "X1-exact-dedup": ["dedup_exact_groups"],
    "X2-near-dup": ["minhash_near_dups", "semdedup_cluster_pairs",
                    "dedup_canonical_pagerank", "edit_distance_near_dups",
                    "winnowing_fingerprints"],
    "X3-similarity": ["embedding_topk_bruteforce", "embedding_topk_pandas_udf",
                      "tfidf_topk_similar_docs"],
    # the round's only verification debt: the two r13 seam operators
    "r14-new": ["epoch_repeat_shard_assignment", "semantic_pack_shard_assignment"],
    "X4-text": ["gopher_quality_flags", "contamination_13gram"],
    "X5-multimodal": ["multimodal_resize_8x8"],
    "S1b-docstore": ["docstore_lang_source_stats"],
    "sketches": ["hll_sketch_merge"],
    "mixture-sampling": ["token_budget_select"],
    "assembly": ["epoch_repeat_shard_assignment", "semantic_pack_shard_assignment",
                 "pack_docs_histogram", "pack_efficiency_report",
                 "shard_manifest_checksums"],
    "M4-time-travel": ["mart_snapshot_diff"],
    "X6-streaming": ["stream_tumbling_hourly", "stream_stream_attribution_join",
                     "stream_merge_into_mart", "stream_shard_manifest"],
    # the (W, CAP) = (24, 24) joint flip changes every refined-graph
    # consumer's VALUES this round, so all 7 re-prove in-window; the two
    # base-graph entries (topk_auto_k, pagerank) are the only
    # flip-UNaffected graph entries and yield their slots
    "graph-integer-contract": ["knn_graph_nn_descent", "graph_ann_search_topk",
                               "graph_ann_search_batch", "graph_ann_search_durable",
                               "hnsw_two_layer_search", "hnsw_three_layer_search",
                               "hnsw_batch_routed_search"],
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
