#!/usr/bin/env python
"""Streaming-tier scale rehearsal: micro-batch throughput at 10x bench.

The batch tier's 10x/100x behavior is measured (SCALE.md); the
streaming twins had only pytest-scale evidence before round 7. This
script drives the two production streaming paths with real micro-batch
cadence at an arbitrary scale factor and records PER-BATCH costs — the
number that must stay flat as history accumulates:

1. events -> incremental_events_sink_with_dlq: the full-volume ingest
   path (validate -> DLQ route -> watermark dedup -> partitioned
   parquet), N micro-batches via maxFilesPerTrigger=1. Metrics per
   batch: rows, seconds, rows/s, state-store rows + bytes (the
   dropDuplicatesWithinWatermark key store).
2. documents -> incremental_dedup_sink: near-dup dedup against the
   persisted band index (corpus = the first 1 - holdout of documents,
   stream = the rest with planted near-copies), K micro-batches.
   Metrics per batch: docs, seconds, docs/s, plus band-index growth
   (rows and on-disk bytes before/after).
3. embeddings -> incremental_ann_sink: per-batch LSH-index appends +
   a post-stream probe of appended vectors (the serving contract).
4. images -> incremental_image_dedup_sink: synthetic PPM corpus into
   the persisted dHash band index, feed with planted one-pixel-flip
   near-copies + junk payloads; per-batch decode+hash+probe+append
   cost, index growth, routing counts.
5. events kill-mid-stream + restart-from-checkpoint: the same DLQ
   pipeline stopped hard after ~half the micro-batches and restarted
   from its checkpoint; exactly-once is asserted on the final totals
   (accepted + DLQ == planted input, no loss, no dups).

Usage:
    python scripts/streaming_rehearsal.py --sf /tmp/sf1.0 \
        [--batches 10] [--doc-batches 5] [--cpus 16] [--out FILE.json]

Prints a markdown table per path (paste into SCALE.md) and one JSON
summary line. Nothing here mutates the input sf directory.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _progress_rows(query) -> list[dict]:
    """Per-batch metrics from the finished query's progress history."""
    rows = []
    for p in query.recentProgress:
        if p is None or p.get("numInputRows", 0) == 0:
            continue
        dur_ms = p["durationMs"].get("triggerExecution", 0)
        state = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batch_id": p["batchId"],
                "rows": p["numInputRows"],
                "sec": round(dur_ms / 1000.0, 3),
                "rows_per_sec": round(
                    p["numInputRows"] / max(dur_ms / 1000.0, 1e-9), 1
                ),
                "state_rows": state.get("numRowsTotal"),
                "state_bytes": state.get("memoryUsedBytes"),
            }
        )
    return rows


def _md_table(rows: list[dict], cols: list[str]) -> str:
    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        out.append(
            "| " + " | ".join(str(r.get(c, "")) for c in cols) + " |"
        )
    return "\n".join(out)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def rehearse_events(spark, sf_dir: str, work: str, batches: int) -> list[dict]:
    from etl_bigquery_pipeline_spark.streaming.incremental import (
        incremental_events_sink_with_dlq,
    )

    import glob as globmod

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_bigquery_pipeline_spark.sources.readers import read_table

    src = f"{work}/src_events"
    os.makedirs(src)
    # read_table normalizes the generator's timestamp encoding (NANOS /
    # NTZ -> session-TZ TIMESTAMP) — the same gotcha the batch tier hits
    ev = read_table(spark, sf_dir, "events")
    # plant ~0.1% invalid rows (negative value) so the DLQ route does
    # real per-batch work instead of writing empty reject files
    bad = (
        ev.filter(F.col("event_id") % 1000 == 0)
        .withColumn("value", -F.abs(F.col("value")) - F.lit(1.0))
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000_000))
    )
    ev = ev.unionByName(bad)
    # one file per micro-batch, in PRODUCTION ARRIVAL ORDER: the slices
    # must be time-contiguous, because a random split makes every batch
    # span the whole time range and the advancing watermark silently
    # discards later batches as late — measuring a drop, not a pipeline.
    # (ntile is a single-partition window: rehearsal tooling, <=10M rows.)
    sliced = ev.withColumn(
        "__b", F.ntile(batches).over(Window.orderBy(F.col("ts").asc_nulls_first()))
    )
    now = time.time()
    for i in range(1, batches + 1):
        tmp = f"{work}/__evslice"
        (
            sliced.filter(F.col("__b") == i)
            .drop("__b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        dst = f"{src}/{i:05d}.parquet"
        shutil.move(globmod.glob(f"{tmp}/part-*.parquet")[0], dst)
        # FileStreamSource orders by modification time; sequence them
        os.utime(dst, (now - batches + i, now - batches + i))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_events_sink_with_dlq(
        stream,
        out_path=f"{work}/events_out",
        dlq_path=f"{work}/events_dlq",
        checkpoint=f"{work}/ckpt_events",
    )
    q.awaitTermination()
    totals = {
        "input_rows": ev.count(),
        "accepted_rows": spark.read.parquet(f"{work}/events_out").count(),
        "dlq_rows": spark.read.parquet(f"{work}/events_dlq").count(),
    }
    return _progress_rows(q), totals


def rehearse_dedup(
    spark, sf_dir: str, work: str, doc_batches: int, holdout: float = 0.2
) -> tuple[list[dict], dict]:
    from pyspark.sql import functions as F

    from etl_bigquery_pipeline_spark.operators import dedup
    from etl_bigquery_pipeline_spark.streaming.dedup_stream import (
        incremental_dedup_sink,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    cut = int(n * (1 - holdout))
    corpus = docs.filter(F.col("doc_id") < cut)
    feed = docs.filter(F.col("doc_id") >= cut)
    # plant near-copies of corpus docs in the feed (1 per 1000 feed
    # docs) so the duplicate route does real work, like production
    planted = (
        corpus.filter(F.col("doc_id") % 997 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zz")))
    )
    feed = feed.unionByName(planted)

    table = "rehearsal_band_index"
    t0 = time.perf_counter()
    dedup.build_band_index(corpus, table)
    build_sec = round(time.perf_counter() - t0, 1)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    idx_dir = os.path.join(warehouse, table)
    before_rows = spark.table(table).count()
    before_bytes = _du(idx_dir)

    src = f"{work}/src_docs"
    feed.repartition(doc_batches).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_dedup_sink(
        stream,
        index_table=table,
        checkpoint=f"{work}/ckpt_docs",
        out_dir=f"{work}/docs_out",
        dup_dir=f"{work}/docs_dup",
    )
    q.awaitTermination()
    spark.catalog.refreshTable(table)
    after_rows = spark.table(table).count()
    index = {
        "corpus_docs": cut,
        "index_build_sec": build_sec,
        "index_rows_before": before_rows,
        "index_rows_after": after_rows,
        "index_bytes_before": before_bytes,
        "index_bytes_after": _du(idx_dir),
        "dup_routed": spark.read.parquet(f"{work}/docs_dup").count(),
        "novel_routed": spark.read.parquet(f"{work}/docs_out").count(),
    }
    return _progress_rows(q), index


def rehearse_events_kill_restart(
    spark, sf_dir: str, work: str, batches: int
) -> dict:
    """Exactly-once at scale, demonstrated the unpleasant way: start the
    SAME events->DLQ pipeline, kill the query mid-stream (after ~half
    the micro-batches), restart from the checkpoint, and verify the
    totals are exactly the planted input split — no loss, no dups.
    Reuses the time-contiguous slices `rehearse_events` builds (call it
    first; this phase reads its source dir with a fresh checkpoint)."""
    import glob as globmod

    from etl_bigquery_pipeline_spark.streaming.incremental import (
        incremental_events_sink_with_dlq,
    )

    src = f"{work}/src_events"
    n_files = len(globmod.glob(f"{src}/*.parquet"))
    assert n_files >= 4, "run rehearse_events first"
    schema = spark.read.parquet(src).schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return incremental_events_sink_with_dlq(
            stream,
            out_path=f"{work}/kr_out",
            dlq_path=f"{work}/kr_dlq",
            checkpoint=f"{work}/ckpt_kr",
        )

    q = start()
    # kill mid-stream: wait until ~half the batches committed, then
    # stop() hard (the in-flight batch may be abandoned uncommitted —
    # that's the point)
    target = batches // 2
    t0 = time.time()
    while time.time() - t0 < 600:
        done = len([p for p in q.recentProgress if p])
        if done >= target:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    batches_before_kill = len([p for p in q.recentProgress if p])

    t0 = time.perf_counter()
    q2 = start()  # restart from the same checkpoint
    q2.awaitTermination()
    restart_sec = round(time.perf_counter() - t0, 1)
    batches_after_restart = len([p for p in q2.recentProgress if p])

    total_in = spark.read.parquet(src).count()
    accepted = spark.read.parquet(f"{work}/kr_out").count()
    dlq = spark.read.parquet(f"{work}/kr_dlq").count()
    return {
        "batches_before_kill": batches_before_kill,
        "batches_after_restart": batches_after_restart,
        "restart_sec": restart_sec,
        "input_rows": total_in,
        "accepted_rows": accepted,
        "dlq_rows": dlq,
        "exactly_once": accepted + dlq == total_in,
    }


def _synth_images(spark, n: int, *, seed_base: int = 0, id_base: int = 0):
    """(id, payload) of deterministic 48x48 PPM images — the rehearsal's
    stand-in for a real image corpus (pure numpy + the repo's own PPM
    encoder; payload ~7 KB each). seed = seed_base + i so near-copies
    can be planted by re-generating a seed and flipping a pixel."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        import numpy as np

        from etl_bigquery_pipeline_spark.multimodal import binary_ops

        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["id"]:
                arr = np.random.RandomState(seed_base + int(i)).randint(
                    0, 256, size=(48, 48, 3), dtype=np.uint8
                )
                ids.append(id_base + int(i))
                payloads.append(binary_ops.encode_ppm(arr))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return spark.range(n).mapInPandas(gen, schema)


def rehearse_image_dedup(
    spark, work: str, *, corpus_n: int, feed_n: int, batches: int
) -> tuple[list[dict], dict]:
    """Image feed -> incremental_image_dedup_sink: per-batch decode+
    dHash+probe+append cost against the persisted dHash band index —
    the multimodal twin of rehearse_dedup, planted the same way (1
    near-copy per ~100 feed images, regenerated from corpus seeds with
    one pixel flipped) plus 1 junk payload per ~500 to keep the reject
    route real."""
    import pandas as pd
    from pyspark.sql import types as T

    from etl_bigquery_pipeline_spark.multimodal import dhash_index
    from etl_bigquery_pipeline_spark.streaming.image_dedup_stream import (
        incremental_image_dedup_sink,
    )

    corpus = _synth_images(spark, corpus_n)
    table = "rehearsal_dhash_index"
    t0 = time.perf_counter()
    dhash_index.build_dhash_index(corpus, table)
    build_sec = round(time.perf_counter() - t0, 1)
    before_rows = spark.table(table).count()

    # feed: novel images (fresh seeds), planted near-copies of corpus
    # seeds (flip one pixel), junk payloads
    novel = _synth_images(
        spark, feed_n, seed_base=10_000_000, id_base=10_000_000
    )
    n_planted = max(feed_n // 100, batches)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen_copies(batches_iter):
        import numpy as np

        from etl_bigquery_pipeline_spark.multimodal import binary_ops

        for pdf in batches_iter:
            ids, payloads = [], []
            for i in pdf["id"]:
                arr = np.random.RandomState(int(i)).randint(
                    0, 256, size=(48, 48, 3), dtype=np.uint8
                )
                arr[0, 0] = 255 - arr[0, 0]  # near-copy, hamming <= 3
                ids.append(20_000_000 + int(i))
                payloads.append(binary_ops.encode_ppm(arr))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    copies = spark.range(n_planted).mapInPandas(gen_copies, schema)
    junk = spark.range(max(feed_n // 500, 1)).selectExpr(
        "id + 30000000 AS id",
        "CAST(concat('junkpayload', id) AS BINARY) AS payload",
    )
    feed = novel.unionByName(copies).unionByName(junk)

    src = f"{work}/src_imgs"
    feed.repartition(batches).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_image_dedup_sink(
        stream,
        index_table=table,
        checkpoint=f"{work}/ckpt_imgs",
        out_dir=f"{work}/imgs_out",
        dup_dir=f"{work}/imgs_dup",
        reject_dir=f"{work}/imgs_rej",
    )
    q.awaitTermination()
    spark.catalog.refreshTable(table)
    stats = {
        "corpus_images": corpus_n,
        "index_build_sec": build_sec,
        "index_rows_before": before_rows,
        "index_rows_after": spark.table(table).count(),
        "planted_near_copies": n_planted,
        "dup_routed": spark.read.parquet(f"{work}/imgs_dup").count(),
        "novel_routed": spark.read.parquet(f"{work}/imgs_out").count(),
        "rejects_routed": spark.read.parquet(f"{work}/imgs_rej").count(),
    }
    return _progress_rows(q), stats


def rehearse_ann(
    spark, sf_dir: str, work: str, batches: int, holdout: float = 0.2
) -> tuple[list[dict], dict]:
    """Embedding feed -> incremental_ann_sink: per-batch append cost
    into the persisted LSH index, plus a post-stream probe to show the
    appended vectors are searchable (the serving-loop contract)."""
    from pyspark.sql import functions as F

    from etl_bigquery_pipeline_spark.operators import ann_index
    from etl_bigquery_pipeline_spark.streaming.ann_stream import (
        incremental_ann_sink,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    cut = int(n * (1 - holdout))
    corpus = emb.filter(F.col("vec_id") < cut)
    feed = emb.filter(F.col("vec_id") >= cut)

    table = "rehearsal_lsh_index"
    t0 = time.perf_counter()
    ann_index.build_lsh_index(corpus, table, dim=64, bits=4, seed=42)
    build_sec = round(time.perf_counter() - t0, 1)
    before_rows = spark.table(table).count()

    src = f"{work}/src_vecs"
    feed.repartition(batches).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_ann_sink(
        stream, table=table, checkpoint=f"{work}/ckpt_vecs"
    )
    q.awaitTermination()
    spark.catalog.refreshTable(table)
    after_rows = spark.table(table).count()
    # probe with an appended vector: it must be findable post-append
    probe = feed.limit(8).select("vec_id", "embedding")
    t0 = time.perf_counter()
    hits = ann_index.probe_lsh_index(spark, table, probe, k=5).count()
    probe_sec = round(time.perf_counter() - t0, 2)
    index = {
        "corpus_vecs": cut,
        "index_build_sec": build_sec,
        "index_rows_before": before_rows,
        "index_rows_after": after_rows,
        "post_append_probe_hits": hits,
        "probe_sec": probe_sec,
    }
    return _progress_rows(q), index


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1.0")
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--doc-batches", type=int, default=5)
    ap.add_argument(
        "--images",
        type=int,
        default=20000,
        help="synthetic image-corpus size for the dHash rehearsal "
        "(feed = half that, planted near-copies 1 per 100)",
    )
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--out", default="")
    ap.add_argument("--work", default="")
    args = ap.parse_args()
    if os.path.realpath(args.sf).startswith("/root/testdata"):
        # reading is fine; make sure work dir never lands there
        pass

    work = args.work or f"/tmp/streaming_rehearsal_{Path(args.sf).name}"
    assert not os.path.realpath(work).startswith("/root/testdata")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from etl_bigquery_pipeline_spark.session import get_session

    spark = get_session(
        "streaming-rehearsal", master=f"local[{args.cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev_rows, ev_totals = rehearse_events(spark, args.sf, work, args.batches)
    print("\n### events -> incremental_events_sink_with_dlq")
    print(
        _md_table(
            ev_rows,
            ["batch_id", "rows", "sec", "rows_per_sec", "state_rows",
             "state_bytes"],
        )
    )
    print(f"totals: {json.dumps(ev_totals)}")

    doc_rows, index = rehearse_dedup(
        spark, args.sf, work, args.doc_batches
    )
    print("\n### documents -> incremental_dedup_sink (band-index probe)")
    print(_md_table(doc_rows, ["batch_id", "rows", "sec", "rows_per_sec"]))
    print(f"\nindex: {json.dumps(index)}")

    ann_rows, ann_index_stats = rehearse_ann(
        spark, args.sf, work, args.doc_batches
    )
    print("\n### embeddings -> incremental_ann_sink (LSH index maintenance)")
    print(_md_table(ann_rows, ["batch_id", "rows", "sec", "rows_per_sec"]))
    print(f"\nindex: {json.dumps(ann_index_stats)}")

    img_rows, img_stats = rehearse_image_dedup(
        spark,
        work,
        corpus_n=args.images,
        feed_n=max(args.images // 2, args.doc_batches),
        batches=args.doc_batches,
    )
    print("\n### images -> incremental_image_dedup_sink (dHash band index)")
    print(_md_table(img_rows, ["batch_id", "rows", "sec", "rows_per_sec"]))
    print(f"\nindex: {json.dumps(img_stats)}")

    kr = rehearse_events_kill_restart(spark, args.sf, work, args.batches)
    print("\n### events kill-mid-stream + restart-from-checkpoint")
    print(json.dumps(kr))

    summary = {
        "metric": "streaming_rehearsal",
        "sf": args.sf,
        "cpus": args.cpus,
        "events": ev_rows,
        "events_totals": ev_totals,
        "events_kill_restart": kr,
        "dedup": doc_rows,
        "dedup_index": index,
        "ann": ann_rows,
        "ann_index": ann_index_stats,
        "image_dedup": img_rows,
        "image_dedup_index": img_stats,
    }
    line = json.dumps(summary)
    print(line)
    if args.out:
        Path(args.out).write_text(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
