"""Registry-wide oracle OUTPUT-TYPE lint (VERDICT r11 item 3).

DuckDB silently promotes ``SUM(BIGINT)`` / ``LIST_SUM(BIGINT[])`` — and any
arithmetic or UNION ALL branch containing them — to HUGEINT. The local
harness hashes ``str()`` of fetched Python values and is type-blind, but the
driver's harness is not: every r9–r11 hash-red row (graph-ANN family, GD
classifier weights) partitioned exactly on "does the oracle's final SELECT
carry an un-CAST HUGEINT column". This test makes the whole bug class
unrepresentable: every registered oracle's result schema is DESCRIBEd in
DuckDB (bind/plan only — nothing executes) and no output column may type as
HUGEINT or DECIMAL. It would have fired on the first red in round 9.

The one allowlisted entry is the deliberate smoking-gun probe
(``oracle_probe_hugeint_passthrough``) whose whole purpose is to carry a raw
HUGEINT column to the driver next to its CAST twin.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import my_favorite_etl_pipeline_spark as engine

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Entries whose oracle is INTENTIONALLY un-CAST (diagnostic probes only —
# never an operator surface). Each needs a one-line justification here.
ALLOW_HUGEINT = {
    # the r12 root-cause probe: raw SUM(1) HUGEINT passthrough, paired with
    # oracle_probe_hugeint_cast — red/green contrast proves the driver-side
    # rendering divergence in one CORRECTNESS row (VERDICT r11 item 2).
    "oracle_probe_hugeint_passthrough",
}

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _result_types(con, sql: str) -> list[tuple[str, str]]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows]


def test_every_oracle_output_column_has_portable_type(con):
    oracles = engine.oracle_sql()
    assert oracles, "registry produced no oracles"
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in oracles.items():
        if name in ALLOW_HUGEINT:
            continue
        cols = _result_types(con, sql)
        bad = [(c, t) for c, t in cols if any(b in t.upper() for b in BANNED)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output columns with non-portable (HUGEINT/DECIMAL) types — "
        "CAST them in the final SELECT (or at the generating CTE): "
        f"{offenders}"
    )


def test_allowlisted_probe_is_actually_hugeint(con):
    """The passthrough probe must KEEP its raw HUGEINT column — if DuckDB
    ever changes the promotion rule the probe (and the diagnosis it pins)
    silently stops probing anything."""
    oracles = engine.oracle_sql()
    if "oracle_probe_hugeint_passthrough" not in oracles:
        pytest.skip("probe not registered")
    cols = _result_types(con, oracles["oracle_probe_hugeint_passthrough"])
    assert any("HUGEINT" in t.upper() for _, t in cols), cols
