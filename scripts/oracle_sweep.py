"""Full-catalog Spark-vs-DuckDB oracle sweep at an arbitrary scale factor.

The driver's CORRECTNESS gate samples 50 queries per round at sf0.01; the
judge's round-5 sweep ran all oracled queries, also at sf0.01. This script
runs the SAME comparison (tests/oracle_harness.compare: row count + schema
names + type categories + order-insensitive %.10g values) for every oracled
catalog query at any sf directory — the point is sf0.1 and above, where
scale-DEPENDENT value bugs (sampling determinism, approximation bounds,
accumulation order) would hide from the sf0.01 gates.

Usage:
    python scripts/oracle_sweep.py --sf /root/testdata/sf0.1 \
        [--only name1,name2] [--skip name1,...] [--out /tmp/sweep.json]

Prints one line per query (PASS/FAIL + seconds per engine) and a final
JSON summary; exit code 1 if any query fails.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from etl_bigquery_pipeline_spark.session import get_session

    spark = get_session("oracle-sweep")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs if n in oracles]
    if args.only:
        keep = {s.strip() for s in args.only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    if args.skip:
        drop = {s.strip() for s in args.skip.split(",") if s.strip()}
        names = [n for n in names if n not in drop]

    con = duckdb_connection(args.sf)
    results: dict[str, dict] = {}
    n_fail = 0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            ok, msg = compare(df, con, oracles[name])
        except Exception as e:  # noqa: BLE001 — sweep must not die mid-run
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t0
        results[name] = {"ok": ok, "msg": msg[:500], "sec": round(dt, 2)}
        if not ok:
            n_fail += 1
        print(
            f"[{i + 1}/{len(names)}] {'PASS' if ok else 'FAIL'} "
            f"{name} ({dt:.1f}s)" + ("" if ok else f"\n    {msg[:400]}"),
            flush=True,
        )
    summary = {
        "sf": args.sf,
        "total": len(names),
        "fail": n_fail,
        "failed": [n for n, r in results.items() if not r["ok"]],
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        Path(args.out).write_text(
            json.dumps({"summary": summary, "results": results}, indent=1)
        )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
