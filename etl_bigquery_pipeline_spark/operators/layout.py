"""Data-layout optimization: Z-order (Morton) clustering for scans.

At 100 TB the cheapest query is the one that never reads the file: parquet
keeps per-file / per-row-group min-max statistics, and a scan prunes any
file whose range can't match the filter. A table sorted by one column
prunes beautifully on that column and not at all on any other. Z-ordering
interleaves the bits of several columns into one sort key, so sorting by
it clusters rows that are close in EVERY dimension — each file then covers
a small bounding box in (col_a, col_b) space and filters on either column
(or both) prune most files. This is the same layout device Delta/Iceberg
``OPTIMIZE ZORDER BY`` applies under the hood.

The bit-spread uses the classic magic-number construction (shift-or then
mask, log2(bits) rounds) — pure integer arithmetic on JVM-side columns, so
the key is engine-reproducible and the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) rounds that spread a 16-bit int so one zero bit follows
# every data bit: 0bxyz -> 0b0x0y0z. Masks are the standard Morton-code
# magic numbers.
_SPREAD_ROUNDS_16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits_16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions (Morton
    part1by1). Values must be in [0, 65535] — caller guarantees range."""
    x = col.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_ROUNDS_16:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(col_a: Column | str, col_b: Column | str) -> Column:
    """Morton key interleaving two 16-bit non-negative int columns:
    bit i of a -> bit 2i, bit i of b -> bit 2i+1."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    return spread_bits_16(a).bitwiseOR(
        F.shiftleft(spread_bits_16(b), 1)
    ).alias("zkey")


def zorder_repartition(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-column pruning: range-partition on the
    Morton key of (col_a, col_b) and sort within partitions, so each
    output file covers a compact bounding box in both columns. One range
    shuffle — the same cost as any global sort — amortized over every
    future pruned scan. Write the result with ``write.parquet`` and both
    columns' min-max file statistics become selective."""
    n = (
        num_files
        if num_files is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    keyed = df.withColumn("__zkey", zorder_key(col_a, col_b))
    return (
        keyed.repartitionByRange(n, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def compact_small_files(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` (the OPTIMIZE/bin-packing maintenance op).

    Small files are the silent scan killer at 100 TB — a million 1 MB
    files cost a million open/footer-read round trips and defeat row-group
    pruning. The rewrite sizes the file count from the directory's actual
    bytes, repartitions to exactly that many partitions (range-partitioned
    on ``order_by`` when given, so clustering — e.g. a prior Z-order — is
    preserved; round-robin otherwise), and swaps the result in via a
    staging directory + os.replace, with the previous generation parked
    until the swap lands (same crash posture as ParquetWarehouse.upsert).
    Local-filesystem paths only, like every rename-based op in this repo;
    on object stores this belongs to a table format's OPTIMIZE.

    Hive-partitioned directories (``key=value`` subdirectories, including
    the ``batch_id=N`` layouts the streaming sinks write) are compacted
    PER LEAF PARTITION, in place: the layout is preserved exactly, the
    partition columns stay path-only (never duplicated into data files),
    and a later replayed ``batch_id=N`` overwrite still replaces exactly
    its own directory. A directory mixing data files and partition
    subdirectories is refused — that layout is already corrupt. Each leaf
    is an independent rewrite job, so a scheduler can also target hot
    partitions selectively instead of calling this on the root.

    Returns {"files_before", "files_after", "bytes"} aggregated over
    every compacted leaf.
    """
    import math
    import os
    import shutil

    def _parts(p: str) -> list[str]:
        return [
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith(".")
        ]

    def _hive_subdirs(p: str) -> list[str]:
        return [
            os.path.join(p, d)
            for d in sorted(os.listdir(p))
            if "=" in d
            and not d.startswith(".")
            and os.path.isdir(os.path.join(p, d))
        ]

    subdirs = _hive_subdirs(path)
    if subdirs:
        if _parts(path):
            raise ValueError(
                f"{path} mixes data files and partition subdirectories; "
                "refusing to compact a corrupt layout"
            )
        agg = {"files_before": 0, "files_after": 0, "bytes": 0}
        for sub in subdirs:
            res = compact_small_files(
                spark,
                sub,
                target_file_bytes=target_file_bytes,
                order_by=order_by,
            )
            for k in agg:
                agg[k] += res[k]
        return agg

    before = _parts(path)
    if not before:  # empty leaf (e.g. a fresh partition dir): nothing to do
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if order_by:
        df = df.repartitionByRange(n_files, *[F.col(c) for c in order_by])
    else:
        df = df.repartition(n_files)
    staging = path.rstrip("/") + ".__compact"
    old = path.rstrip("/") + ".__old"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    after = _parts(path)
    assert after, "compacted directory lost its data files"
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total,
    }


def drop_partitions_before(
    path: str,
    partition_col: str,
    cutoff: str,
) -> dict:
    """Retention purge by PARTITION DROP: remove every
    ``<partition_col>=<value>`` directory whose value sorts below
    ``cutoff``. O(1) filesystem work per expired partition — the reason
    time-partitioned layouts exist. Contrast with
    ParquetWarehouse.delete_where, which rewrites the table: row-level
    predicates need the rewrite; calendar retention never should.
    Hive-style lexicographic values (ISO dates, zero-padded ids) make the
    string comparison correct; values are compared raw, not parsed.

    Returns {"dropped": [...], "kept": n} for the audit log.
    """
    import os
    import shutil

    prefix = f"{partition_col}="
    dropped, kept = [], 0
    for name in sorted(os.listdir(path)):
        if not name.startswith(prefix):
            continue
        value = name[len(prefix):]
        if value < cutoff:
            shutil.rmtree(os.path.join(path, name))
            dropped.append(value)
        else:
            kept += 1
    return {"dropped": dropped, "kept": kept}
