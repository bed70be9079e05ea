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
        [--only name1,name2] [--skip name1,...] [--out /tmp/sweep.json] \
        [--per-query-timeout SECONDS]

Prints one line per query (PASS/FAIL/TIMEOUT + seconds) and a final
JSON summary. Exit codes: 0 = every comparison verified; 1 = at least
one FAIL; 2 = no failures but at least one TIMEOUT (budget exclusions
are recorded, not failures — at sf10 a handful of ORACLES are
corpus-heavy DuckDB CTEs whose cost is the oracle's, not the engine's —
but a cut comparison is NOT a verification, so automation must be able
to tell the two apart).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from tests.oracle_harness import (  # noqa: E402
    DigestUnsupported,
    compare,
    digest_compare,
    duckdb_connection,
)

# Queries whose sf10 cost is the COMPARISON (full-output collect +
# Python %.10g canonicalization of up to 60M rows), not the computation.
# With --digest these run the engine-side digest (oracle_harness.
# digest_compare: per-column canonical strings -> row md5 -> COUNT +
# 2x4 32-bit lane sums, all computed inside each engine) so only 9
# numbers cross the engine boundary. Digest mode is sound only for
# PER-ROW-DETERMINISTIC outputs — every name here is a projection,
# join, or pre-rounded per-row computation (no parallel float
# accumulation whose cross-engine ulps could straddle both
# quantization grids).
DIGEST_SAFE = {
    # 60M-row full-output projections / joins (r7 timeout or skip class
    # (b): comparison-side collects)
    "zorder_lineitem_keys",       # 5 bigint cols, pure bit-interleave
    "scd2_point_in_time_join",    # 15M-row temporal join, pass-through vals
    "scd2_customer_history",      # SCD2 reconstruction, per-row determin.
    # scalar-surface full-table projections (r7 skips: "comparison
    # collect is infeasible at sf10"; all outputs are per-row exprs)
    "string_functions_part",
    "date_functions_orders",
    "math_functions_lineitem",    # sqrt/ln per-row; dual grids absorb ulps
    "map_functions_events",       # keys pre-sorted to a string column
    "json_extract_events",
    # per-doc full outputs (500k rows/doc-table decade; values are
    # pre-rounded per-row computations)
    "simhash_fingerprints",       # md5 bit table, exact
    "ngram_novelty_scores",       # counts + round(,6)
    "char_entropy_quality",       # within-row entropy, round(,6)
    "minhash_cluster_canonicals",  # (doc_id, cluster_id) ints
    "deterministic_random_walks",  # md5-coin walks, all ints
    "graph_negative_samples",      # md5-ranked ints
    "minhash_near_dup_pairs",      # pair ids + round(,6) jaccard
    "ngram_jaccard_pairs",
    "shingle_containment_pairs",
    "embedding_near_dup_pairs",    # round(,6) cosine of same parquet floats
    "similarity_topk",
    "lang_id_confusion",           # grouped counts of per-row argmax
    "knn_distance_outliers",       # round(,6) sims + rank
    "duplicate_ngram_spans",       # 4 global counts
    "cross_source_contamination",  # gram-overlap counts
    # r9: 15M-row lag/lead projection + DECIMAL(18,4)-exact running sum
    # over a tie-broken total order per customer — per-row deterministic
    # on both engines (the double cast happens after the exact sum);
    # its sf10 cost was the full-output collect, exactly digest's case
    "window_lag_running_orders",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--per-query-timeout",
        type=float,
        default=0,
        help="seconds before a query's comparison is interrupted and "
        "recorded as TIMEOUT (0 = no limit). Interrupts the DuckDB "
        "connection and cancels Spark jobs; the sweep continues.",
    )
    ap.add_argument(
        "--spark-restart-every",
        type=int,
        default=60,
        help="recycle the local JVM every N queries (0 = never): a "
        "single 8g driver accumulates heap pressure over a long sf10 "
        "sweep and a task-level OutOfMemoryError kills every "
        "subsequent query on the dead gateway.",
    )
    ap.add_argument(
        "--duck-memory-limit",
        default="48GB",
        help="DuckDB allocator cap — a runaway oracle spills (see "
        "--duck-temp) or fails ALONE instead of malloc-killing the "
        "whole sweep process.",
    )
    ap.add_argument(
        "--duck-temp",
        default="/tmp/duckdb_spill",
        help="DuckDB spill directory once the memory limit is hit.",
    )
    ap.add_argument(
        "--digest",
        action="store_true",
        help="use the engine-side digest comparison (O(1) output) for "
        "the DIGEST_SAFE names — the comparison-bound full-output "
        "queries whose collect + Python canonicalization, not their "
        "computation, exceeds the sf10 budget.",
    )
    ap.add_argument(
        "--retry-timed-out",
        type=float,
        default=0,
        help="after the sweep, re-run each budget timeout ONCE at this "
        "factor x the per-query budget (0 = off). The tail retry runs "
        "with no concurrent heavyweights — the regime in which r8's "
        "hll gate converted a 240s timeout into a 183s idle PASS.",
    )
    ap.add_argument(
        "--materialize",
        action="store_true",
        help="use scripts/oracle_overrides.ORACLE_OVERRIDES: equivalent "
        "oracle rewrites that materialize each family's shared "
        "monolithic CTE (co-purchase edges, embedding dot products, "
        "document shingle sets) into a DuckDB temp table ONCE, so N "
        "family members stop paying the same corpus-sized CTE N times. "
        "Every override is equivalence-tested against its original "
        "oracle at sf0.01 (tests/test_oracle_overrides.py).",
    )
    ap.add_argument(
        "--mat-dir",
        default="",
        help="directory for the --materialize parquet files (default "
        "/tmp/sweep_mat_<basename of --sf>; files are keyed by sf so "
        "two sweeps at different scales never share them).",
    )
    args = ap.parse_args()

    if args.materialize:
        from scripts.oracle_overrides import (
            get_materializations,
            get_overrides,
        )

        mat_dir = args.mat_dir or (
            "/tmp/sweep_mat_" + os.path.basename(args.sf.rstrip("/"))
        )
        os.makedirs(mat_dir, exist_ok=True)
        ORACLE_OVERRIDES = get_overrides(mat_dir)
        MATERIALIZATIONS = get_materializations(mat_dir)
    else:
        mat_dir = ""
        ORACLE_OVERRIDES = {}
        MATERIALIZATIONS = {}

    def ensure_materialized(con, keys: list[str]) -> None:
        """Build any missing family parquet files (write-to-temp +
        os.replace: an interrupted build never leaves a half-written
        file that a later query would silently read). Normally a no-op:
        the PRE-PASS below builds everything before the sweep starts,
        outside any per-query budget (the big panels — 819M cosine
        pairs at sf10 — cannot finish inside one 240s budget, and an
        in-budget build would bill the first family member for work
        all members share). This per-query path remains as the repair
        hook if a pre-pass file was deleted mid-sweep. Files survive
        connection/JVM recycling and even a sweep restart."""
        for key in keys:
            path = os.path.join(mat_dir, key + ".parquet")
            if os.path.exists(path):
                continue
            tmp = path + ".building"
            t0 = time.time()
            con.sql(f"COPY ({MATERIALIZATIONS[key]}) TO '{tmp}' (FORMAT PARQUET)")
            os.replace(tmp, path)
            print(
                f"    materialized {key}.parquet ({time.time() - t0:.1f}s)",
                flush=True,
            )

    from etl_bigquery_pipeline_spark.session import get_session

    def fresh_spark():
        """(Re)build the SparkSession in a NEW JVM. A single 8g local
        JVM accumulates heap pressure over a 200+-query sf10 sweep
        (r7 and r8 both lost a segment to a task-level
        java.lang.OutOfMemoryError ~160 queries in, after which every
        remaining query failed on the dead gateway) — so the sweep
        recycles the JVM every --spark-restart-every queries and on
        any dead-gateway exception, instead of praying over one.

        The COMPARISON collects both engines' full results; row-
        proportional outputs at sf10 (e.g. a 15M-row temporal join)
        blow the 1g default maxResultSize long before the query itself
        is in any trouble — the harness must not masquerade as an
        engine wall; hence maxResultSize=8g."""
        from pyspark import SparkContext
        from pyspark.sql import SparkSession

        active = SparkContext._active_spark_context
        if active is not None:
            try:
                active.stop()
            except Exception:  # noqa: BLE001 — JVM may already be dead
                pass
        # clear EVERY cached handle so getOrCreate launches a new
        # gateway/JVM rather than re-serving the dead one
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        s = get_session(
            "oracle-sweep",
            extra_conf={"spark.driver.maxResultSize": "8g"},
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = fresh_spark()
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs if n in oracles]
    if args.only:
        keep = {s.strip() for s in args.only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    if args.skip:
        drop = {s.strip() for s in args.skip.split(",") if s.strip()}
        names = [n for n in names if n not in drop]

    def fresh_con():
        """DuckDB connection with a BOUNDED allocator: an unbounded
        oracle CTE at sf10 can malloc the machine to death (r8 observed
        the process die with 'bad allocation' while a zombie heavyweight
        still held its memory). With a limit + spill dir, a heavy oracle
        spills to disk or raises OutOfMemoryException for ITSELF —
        recorded as that query's failure, never process death."""
        c = duckdb_connection(args.sf)
        c.sql(f"SET memory_limit='{args.duck_memory_limit}'")
        os.makedirs(args.duck_temp, exist_ok=True)
        c.sql(f"SET temp_directory='{args.duck_temp}'")
        return c

    con = fresh_con()
    results: dict[str, dict] = {}
    n_fail = 0
    n_timeout = 0
    timeout = args.per_query_timeout
    engines = {"spark": spark, "con": con}

    if args.materialize:
        # pre-pass: build every family file up front, unbudgeted (the
        # DuckDB allocator cap + spill dir bound each build; the cost
        # is the whole point — paid once here instead of N times
        # inside member budgets)
        print(f"-- materialization pre-pass ({mat_dir}) --", flush=True)
        ensure_materialized(con, list(MATERIALIZATIONS))

    def checkpoint_out():
        # crash-durable: the record survives a mid-sweep process death
        # (r8's first attempt died at 107/278 with --out never written)
        if args.out:
            Path(args.out).write_text(
                json.dumps({"results": results, "partial": True}, indent=1)
            )

    def run_one(name: str) -> tuple[bool, str]:
        spark, con = engines["spark"], engines["con"]
        sql = oracles[name]
        tag = ""
        if args.materialize and name in ORACLE_OVERRIDES:
            keys, sql = ORACLE_OVERRIDES[name]
            ensure_materialized(con, keys)
            tag = "[materialized] "
        if args.digest and name in DIGEST_SAFE:
            df = qs[name](spark, args.sf)
            try:
                ok, msg = digest_compare(df, con, sql)
                return ok, tag + "[digest] " + msg
            except DigestUnsupported as e:
                # schema has a category the digest can't canonicalize
                # identically in both engines — honest fallback
                ok, msg = compare(df, con, sql)
                return ok, f"{tag}[digest unsupported: {e}; full compare] {msg}"
        df = qs[name](spark, args.sf)
        ok, msg = compare(df, con, sql)
        return ok, tag + msg

    def _jvm_dead(message: str) -> bool:
        # dead-gateway / heap-death signatures: the QUERY didn't fail,
        # the JVM did — recycle and retry once instead of cascading
        return any(
            s in message
            for s in (
                "Connection refused",
                "Py4JNetworkError",
                "Java heap space",
                "Answer from Java side is empty",
                "SparkContext was shut down",
                "Cannot call methods on a stopped SparkContext",
            )
        )

    def _duck_env_dead(message: str) -> bool:
        # DuckDB allocator exhaustion is usually the ENVIRONMENT, not
        # the query: a zombie connection leaked after an interrupted
        # heavyweight still holds (up to) its own memory_limit, so the
        # next oracle's allocation fails at process level ("bad
        # allocation" — observed r9: two copurchase oracles failed
        # right after hard_negative_mining's interrupt left a zombie).
        # Recycle the connection and retry once; a query whose oracle
        # genuinely exceeds the cap fails the retry too and is recorded.
        return "Out of Memory Error" in message or "bad allocation" in message

    def execute(name: str, budget: float) -> tuple[bool, bool, str, float]:
        """One query's comparison under ``budget`` seconds (0 = no limit).
        Returns (ok, timed_out, msg, seconds). Mutates engines['spark'] /
        engines['con'] on interrupt/JVM-death recovery."""
        attempt = 0
        t0 = time.time()
        while True:
            timed_out = False
            interrupted = False
            zombie = False
            if budget:
                import concurrent.futures as cf

                ex = cf.ThreadPoolExecutor(max_workers=1)
                fut = ex.submit(run_one, name)
                try:
                    ok, msg = fut.result(timeout=budget)
                except cf.TimeoutError:
                    timed_out = True
                    interrupted = True
                    ok, msg = False, f"TIMEOUT after {budget:.0f}s"
                    # interrupt BOTH engines repeatedly until the worker
                    # yields: a single interrupt can land between engine
                    # calls and miss (engine calls themselves are
                    # interruptible; the python between them is short)
                    for _ in range(24):  # up to ~2 min of nudging
                        engines["con"].interrupt()
                        engines["spark"].sparkContext.cancelAllJobs()
                        try:
                            r = fut.result(timeout=5)
                        except cf.TimeoutError:
                            continue
                        except Exception:  # noqa: BLE001 — our cancel
                            break
                        else:
                            ok, msg = r  # finished late: a real result
                            timed_out = False
                            break
                    else:
                        # worker stuck despite interrupts: abandon the
                        # thread (the zombie may still hold the
                        # connection)
                        ex.shutdown(wait=False)
                        ex = None
                        zombie = True
                    # an interrupted connection can carry residual
                    # allocator/interrupt state (observed: a trivial
                    # oracle OOMing right after two interrupted
                    # heavyweights; a late-finishing worker leaves a
                    # pending interrupt that would spuriously abort the
                    # NEXT query) — refresh whenever ANY interrupt()
                    # was issued, even if the worker ultimately
                    # returned a real result
                    if interrupted:
                        if not zombie:
                            try:
                                engines["con"].close()
                            except Exception:  # noqa: BLE001
                                pass
                        # a ZOMBIE's connection is deliberately LEAKED:
                        # closing a connection another thread is still
                        # executing on can take down the process; the
                        # memory_limit bounds what the leak can hold
                        # until the interrupt lands
                        engines["con"] = fresh_con()
                except Exception as e:  # noqa: BLE001
                    ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
                finally:
                    if ex is not None:
                        ex.shutdown(wait=False)
            else:
                try:
                    ok, msg = run_one(name)
                except Exception as e:  # noqa: BLE001 — sweep continues
                    ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
            if (
                not ok
                and not timed_out
                and attempt == 0
                and (_jvm_dead(msg) or _duck_env_dead(msg))
            ):
                # the ENGINE ENVIRONMENT died, not the query (dead JVM
                # gateway, or a zombie DuckDB connection's allocator
                # starving the process): new JVM + connection, one
                # retry — without this a single environment death
                # records as a value failure (or cascades)
                print(
                    f"    engine-environment death on {name}; "
                    "recycling and retrying",
                    flush=True,
                )
                attempt = 1
                engines["spark"] = fresh_spark()
                engines["con"] = fresh_con()
                continue
            break
        # operators scoped_cache intermediates; without an explicit
        # release they accumulate across the sweep until the shared
        # local-mode heap dies (two JVM OOM cascades at sf10, ~60-100
        # queries in, both following an interrupted heavyweight whose
        # cache cleanup never ran)
        try:
            engines["spark"].catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        return ok, timed_out, msg, time.time() - t0

    def record(name, ok, timed_out, msg, dt, pos, total, retried=False):
        status = "TIMEOUT" if timed_out else ("PASS" if ok else "FAIL")
        results[name] = {
            "ok": ok,
            "timeout": timed_out,
            "msg": msg[:500],
            "sec": round(dt, 2),
            "digest": bool(args.digest and name in DIGEST_SAFE),
            "materialized": bool(
                args.materialize and name in ORACLE_OVERRIDES
            ),
            "retried": retried,
        }
        checkpoint_out()
        print(
            f"[{pos}/{total}] {status} {name} ({dt:.1f}s)"
            + (" [retry]" if retried else "")
            + ("" if ok or timed_out else f"\n    {msg[:400]}"),
            flush=True,
        )

    for i, name in enumerate(names):
        if i and args.spark_restart_every and i % args.spark_restart_every == 0:
            engines["spark"] = fresh_spark()
        ok, timed_out, msg, dt = execute(name, timeout)
        record(name, ok, timed_out, msg, dt, i + 1, len(names))

    # ---- tail retry pass (r8 verdict ask #3 lever b) ----
    # Budget timeouts get ONE more attempt at retry-factor x budget,
    # AFTER the whole sweep: the tail runs with no concurrent
    # heavyweight contention — the same conditions under which
    # hll_intersection_estimate_gate's 183.1s idle PASS converted an
    # r7 exclusion. A retry PASS is a full verification (same compare);
    # a retry timeout stays an exclusion, now attributed at the bigger
    # budget.
    if args.retry_timed_out and timeout:
        retry_names = [n for n, r in results.items() if r.get("timeout")]
        big = timeout * args.retry_timed_out
        if retry_names:
            print(
                f"-- retry pass: {len(retry_names)} budget timeouts at "
                f"{big:.0f}s --",
                flush=True,
            )
            engines["spark"] = fresh_spark()
        for j, name in enumerate(retry_names):
            ok, timed_out, msg, dt = execute(name, big)
            record(
                name, ok, timed_out, msg, dt, j + 1, len(retry_names),
                retried=True,
            )

    n_fail = sum(
        1 for r in results.values() if not r["ok"] and not r.get("timeout")
    )
    n_timeout = sum(1 for r in results.values() if r.get("timeout"))
    summary = {
        "sf": args.sf,
        "total": len(names),
        "fail": n_fail,
        "timeout": n_timeout,
        "failed": [
            n
            for n, r in results.items()
            if not r["ok"] and not r.get("timeout")
        ],
        "timed_out": [n for n, r in results.items() if r.get("timeout")],
        "digest_verified": [
            n
            for n, r in results.items()
            if r["ok"] and r.get("digest") and "[digest]" in r["msg"]
        ],
        "retry_converted": [
            n for n, r in results.items() if r["ok"] and r.get("retried")
        ],
        "materialized": [
            n for n, r in results.items() if r.get("materialized")
        ],
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        Path(args.out).write_text(
            json.dumps({"summary": summary, "results": results}, indent=1)
        )
    # distinct exit codes so automation can't mistake a sweep with cut
    # comparisons for a fully-green one: 0 = all verified, 1 = value/
    # schema failure, 2 = no failures but >=1 comparison was cut by the
    # per-query budget (those names still need verification somewhere)
    if n_fail:
        return 1
    return 2 if n_timeout else 0


if __name__ == "__main__":
    sys.exit(main())
