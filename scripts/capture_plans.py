#!/usr/bin/env python
"""Capture .explain('formatted') output for named catalog queries into
plans/r11/<name>_<suffix>.txt (the optimization round's plan evidence).

Usage: python scripts/capture_plans.py --queries a,b,c --suffix before
"""

from __future__ import annotations

import argparse
import io
import pathlib
import sys
from contextlib import redirect_stdout

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r11")
    args = ap.parse_args()

    from etl_bigquery_pipeline_spark.operators.caching import cache_scope
    from etl_bigquery_pipeline_spark.plans import catalog
    from etl_bigquery_pipeline_spark.session import get_session

    spark = get_session("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.queries.split(","):
        name = name.strip()
        if not name:
            continue
        fn = catalog.QUERIES[name]
        buf = io.StringIO()
        # queries that run driver-side actions while building (gates with
        # scalar reads) still produce a final frame whose plan we capture;
        # cache_scope releases whatever they cached while planning
        with cache_scope():
            df = fn(spark, args.sf)
            with redirect_stdout(buf):
                df.explain("formatted")
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
