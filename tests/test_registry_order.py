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
FAMILY_SENTINELS = {
    "pipeline-parity": ["incremental_extract", "transform_chain", "merge_upsert", "dq_gate", "reconciliation"],
    "relational": ["q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue"],
    "window/rollup/pivot": ["top_orders_per_customer", "rollup_order_status", "pivot_status_by_segment"],
    # anti_join_customers rotated out r6 (five green rounds); the anti-join
    # shape stays covered by merge_upsert's anti arm
    "join-surface": ["range_join_ship_latency", "asof_last_click_before_purchase"],
    "X1-exact-dedup": ["dedup_keep_best", "dedup_normalized_text"],
    "X2-near-dup": ["minhash_near_dups", "ssjoin_prefix_filter", "embedding_cosine_near_dups"],
    "X3-similarity": ["embedding_topk_bruteforce", "tfidf_topk_similar_docs"],
    # lang_id / bpe counts / pii scrub rotated out r6 (4-5 green rounds)
    "X4-text": ["chunk_documents_50tok", "exact_span_dedup_20tok"],
    "X4-curation": ["contamination_13gram"],
    "X5-multimodal": ["multimodal_features", "multimodal_audio_features"],
    "assembly": ["training_shard_assignment", "dedup_cluster_components"],
    # r5 entries still accruing driver rounds — hold until 2+ green
    "r5-rotated-in": [
        "semdedup_cluster_pairs",
        "dedup_cluster_components_star",
        "sessionize_events_gap30m",
        "zorder_events_morton",
        "embedding_cosine_near_dups_lsh",
        "embedding_topk_ivf_kmeans",
    ],
    # r6 rotation: nine never-driver-checked entries take the slots of
    # multi-round-green ones (sorted_extract, anti_join, lang_id, bpe
    # counts, pii scrub, dataset_split_hash, quality_median, gopher flags,
    # stream dedup) — the window must ROTATE to catch fixture drift, not
    # freeze (r4 verdict item 2)
    "r6-rotated-in": [
        "typed_struct_props_chain",
        "variant_props_chain",
        "funnel_view_to_purchase",
        "retention_cohorts",
        "gapfill_locf_hourly",
        "simhash_signatures_portable",
        "simhash_near_dups_portable",
        "training_shard_assignment",
        "dedup_excise_spans_20tok",
        # brand-new mid-r6, driver-checked from day one
        "bm25_topk_docs",
        "multimodal_resize_8x8",
        "decontaminate_excise_13gram",
    ],
    "X6-streaming": ["stream_tumbling_hourly", "stream_stateful_user_stats", "session_window_30m"],
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
