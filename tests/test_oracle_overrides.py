"""Equivalence proofs for scripts/oracle_overrides.py (r8 verdict ask #3
lever c): every materialized-CTE rewrite must return EXACTLY the original
oracle's result.

DuckDB-only (no Spark) — both texts run on the same connection over the
same sf0.01 views, results canonicalized with the harness's %.10g cell
normalization (the same tolerance compare() grants the real sweep) and
diffed as sorted multisets. A rewrite that drifts in a rounding point, a
tie-break, or a panel modulus fails HERE, at seconds of cost, instead of
silently mis-verifying the sf10 sweep.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.oracle_overrides import (  # noqa: E402
    MATERIALIZATIONS,
    OVERRIDE_SQL,
    get_materializations,
    get_overrides,
)
from tests.oracle_harness import canonicalize, duckdb_connection  # noqa: E402

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def mat_con(tmp_path_factory):
    """One connection + all family files materialized into a tmp dir."""
    mat_dir = str(tmp_path_factory.mktemp("sweep_mat"))
    con = duckdb_connection(SF)
    for key, sql in get_materializations(mat_dir).items():
        con.sql(f"COPY ({sql}) TO '{mat_dir}/{key}.parquet' (FORMAT PARQUET)")
    return con, mat_dir


def _canon(rel):
    cols = list(rel.columns)
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(canonicalize(sorted(cols), rows))


@pytest.mark.parametrize("name", sorted(OVERRIDE_SQL))
def test_override_matches_original(name, mat_con):
    import __spark_entry__ as entry

    con, mat_dir = mat_con
    original = entry.oracle_sql()[name]
    _keys, rewritten = get_overrides(mat_dir)[name]
    cols_a, rows_a = _canon(con.sql(original))
    cols_b, rows_b = _canon(con.sql(rewritten))
    assert cols_a == cols_b, f"{name}: column mismatch {cols_a} vs {cols_b}"
    assert len(rows_a) == len(rows_b), (
        f"{name}: row count {len(rows_a)} vs {len(rows_b)}"
    )
    assert rows_a == rows_b, f"{name}: value drift between override and original"


def test_every_override_key_is_materializable():
    for name, (keys, _sql) in OVERRIDE_SQL.items():
        for k in keys:
            assert k in MATERIALIZATIONS, f"{name} needs unknown key {k}"
    # chained materializations must appear AFTER their inputs (build order)
    order = list(MATERIALIZATIONS)
    for k, sql in MATERIALIZATIONS.items():
        for other in order[order.index(k) + 1 :]:
            assert f"/{other}.parquet" not in sql, (
                f"materialization {k} reads {other} which builds later"
            )
