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
    "join-surface": ["anti_join_customers", "range_join_ship_latency", "asof_last_click_before_purchase"],
    # dedup_exact_groups / text_quality_scores rotated past the cap mid-r5
    # after four green rounds each; their families stay represented below
    "X1-exact-dedup": ["dedup_keep_best", "dedup_normalized_text"],
    "X2-near-dup": ["minhash_near_dups", "ssjoin_prefix_filter", "embedding_cosine_near_dups"],
    "X3-similarity": ["embedding_topk_bruteforce", "tfidf_topk_similar_docs"],
    "X4-text": ["lang_id_heuristic", "chunk_documents_50tok", "training_data_prep"],
    "X4-curation": ["contamination_13gram", "gopher_quality_flags", "repetition_filter"],
    "X5-multimodal": ["multimodal_features", "multimodal_audio_features"],
    # r5 rotation: pack_sequences_1024 / corpus_mix_temperature moved past
    # the cap after two green driver rounds, making room for
    # never-driver-checked entries (semdedup, normalized-text dedup, star
    # CC, sessionize, z-order) — the window must ROTATE to catch fixture
    # drift, not freeze (r4 verdict item 2)
    "assembly": ["dataset_split_hash", "quota_sample_per_source", "dedup_cluster_components"],
    "r5-rotated-in": [
        "semdedup_cluster_pairs",
        "dedup_normalized_text",
        "dedup_cluster_components_star",
        "sessionize_events_gap30m",
        "zorder_events_morton",
        # mid-r5 second wave: earned oracles (were rows-only), never
        # driver-checked before
        "embedding_cosine_near_dups_lsh",
        "embedding_topk_ivf_kmeans",
        # brand-new mid-r5 (Lee et al. exact-substring span dedup),
        # driver-checked from day one
        "exact_span_dedup_20tok",
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
