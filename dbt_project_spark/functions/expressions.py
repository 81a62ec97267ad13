"""Shared column expressions — all JVM-side (whole-stage codegen), no UDFs.

The md5-prefix integer hash is the engine's cross-system deterministic
hash: identical results are obtainable in ANSI SQL (DuckDB:
``('0x' || substr(md5(x), 1, 8))::BIGINT``), which is what makes
MinHash/SimHash/fingerprint operators oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column | str, nchars: int = 8) -> Column:
    """Deterministic 32-bit-range integer hash of a string column.

    First ``nchars`` hex digits of md5, parsed base-16. nchars<=15 keeps
    the value exactly representable in a signed 64-bit integer.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, nchars), 16, 10).cast("bigint")


def engagement_score(
    page_views: Column | str,
    session_duration: Column | str,
    time_on_page: Column | str,
    weights: tuple[float, float, float] = (0.4, 0.3, 0.3),
) -> Column:
    """Weighted engagement score (reference: batch_stream.sql:61).

    The reference's own two paths disagree: its streaming job
    (spark_streaming_new.py:96) additionally divides
    session_duration and time_on_page by 60, its batch SQL does not.
    This repo deliberately uses the batch formula everywhere so
    stream and batch results are comparable."""
    pv = F.col(page_views) if isinstance(page_views, str) else page_views
    sd = F.col(session_duration) if isinstance(session_duration, str) else session_duration
    tp = F.col(time_on_page) if isinstance(time_on_page, str) else time_on_page
    w1, w2, w3 = weights
    return pv * F.lit(w1) + sd * F.lit(w2) + tp * F.lit(w3)


def window_bounds(ts_col: Column | str, width_sec: int) -> tuple[Column, Column]:
    """Tumbling-window bounds as 'yyyy-MM-dd HH:mm:ss' strings.

    Epoch-floor arithmetic (reference: batch_stream.sql:16-17
    ``FLOOR(UNIX_TIMESTAMP(ts)/w)*w``) — pure codegen arithmetic, no
    UDF, and bit-identical to the ANSI-SQL oracle formulation. String
    output sidesteps timestamp-timezone representation differences
    between engines.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    start_epoch = F.floor(F.unix_timestamp(c) / width_sec) * width_sec
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        F.date_format(F.timestamp_seconds(start_epoch), fmt),
        F.date_format(F.timestamp_seconds(start_epoch + width_sec), fmt),
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, JVM-side.

    ``zip_with`` + ``aggregate`` run inside codegen — no Python
    round-trip; accumulation is left-to-right in double precision.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two vector columns (double, JVM-side)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
