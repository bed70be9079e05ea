"""docs/OPERATORS.md is generated; a stale copy fails here (VERDICT r6
ask #7 — one command regenerates, CI catches drift)."""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_operator_index_is_fresh():
    sys.path.insert(0, str(REPO / "scripts"))
    import gen_operator_docs

    committed = (REPO / "docs" / "OPERATORS.md").read_text()
    assert committed == gen_operator_docs.render(), (
        "docs/OPERATORS.md is stale — run "
        "`python scripts/gen_operator_docs.py`"
    )
