"""Physical-layout maintenance: Z-order clustering and small-file
compaction — the OPTIMIZE / OPTIMIZE ZORDER BY shape a lakehouse
table needs at 100 TB.

Z-ordering maps multi-column locality onto a single sort key by bit
interleaving, so a range-partitioned write gives every output file a
tight bounding box in BOTH dimensions; parquet min/max footer stats
then let any engine skip files for 2-D box predicates, not just the
leading sort column. The interleave is pure integer bit arithmetic
(shift/and/or), identical in Spark and ANSI SQL.

Compaction bin-packs many small files into few large ones with
``coalesce`` — a narrow (no-shuffle) dependency: each output task
concatenates whole input splits, so 100 TB of 10k-row files compacts
with zero network shuffle and no sort.
"""

from __future__ import annotations

import math
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_key(cols: Sequence[Column | str], bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` bits of each integer column into a
    single Z-value (Morton code).

    Column i contributes its bit b to output bit ``b * ncols + i`` —
    for 2 columns and 16 bits, a 32-bit key. Inputs are masked to
    ``bits`` (callers normalize to that range); the expression is a
    flat OR of shift/AND terms, fully inside whole-stage codegen.
    """
    ncols = len(cols)
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cc, b).bitwiseAND(F.lit(1)),
                    b * ncols + i,
                )
            )
    return z


def zorder_key_sql(cols: Sequence[str], bits: int = ZORDER_BITS) -> str:
    """The same Morton code as ANSI SQL (DuckDB oracle parity)."""
    ncols = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * ncols + i})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = ZORDER_BITS,
    n_files: int = 8,
) -> None:
    """OPTIMIZE ZORDER BY: range-partition on the Z-value, sort within
    partitions, write parquet. Every output file covers a contiguous
    Z-range = a tight box in all clustered dimensions, so parquet
    min/max stats prune files for box predicates on ANY of ``cols``.

    The range partitioner samples the Z-distribution (one extra job),
    then a single shuffle places rows; no global sort."""
    (
        df.withColumn("__z", zorder_key(cols, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Bin-pack a small-files parquet directory into ~target_bytes
    files. Returns the output file count.

    Uses ``coalesce`` (narrow, NO shuffle): output tasks concatenate
    whole input splits. Row order within each input file is preserved
    and no data moves between executors — at 100 TB this is pure
    sequential read + write. (A Z-order rewrite is the operation that
    re-sorts; compaction deliberately does not.)"""
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, files in os.walk(src_path)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).coalesce(n_out).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return n_out
