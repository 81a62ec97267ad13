"""Physical-layout tests: Z-order file pruning measured on real
parquet footers, and no-shuffle compaction with data parity."""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dbt_project_spark.operators.layout import (
    compact_files,
    zorder_key,
    zorder_write,
)
from dbt_project_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _file_stats(path: str, cols):
    """Per parquet file: {col: (min, max)} from row-group footers."""
    out = []
    for root, _d, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo = {c: None for c in cols}
            hi = {c: None for c in cols}
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    if name in cols and col.statistics is not None:
                        s = col.statistics
                        lo[name] = (
                            s.min if lo[name] is None else min(lo[name], s.min)
                        )
                        hi[name] = (
                            s.max if hi[name] is None else max(hi[name], s.max)
                        )
            out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _files_overlapping_box(stats, box):
    """How many files' footer ranges intersect the query box."""
    n = 0
    for st in stats:
        if all(
            st[c][0] is not None and st[c][0] <= hi and st[c][1] >= lo
            for c, (lo, hi) in box.items()
        ):
            n += 1
    return n


def test_zorder_write_prunes_2d_boxes(spark, tmp_path):
    """A Z-ordered layout must let footer min/max stats prune files
    for a predicate on the NON-leading dimension, where a 1-D sorted
    layout cannot prune at all."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("u"),
        F.round(F.col("value") * 100, 0)
        .cast("bigint")
        .bitwiseAND(F.lit(65535))
        .alias("v"),
    )
    n_files = 8
    zdir = str(tmp_path / "zorder")
    udir = str(tmp_path / "usorted")
    zorder_write(ev, zdir, ["u", "v"], n_files=n_files)
    # baseline: clustered on u only (the classic single-column sort)
    (
        ev.repartitionByRange(n_files, "u")
        .sortWithinPartitions("u")
        .write.mode("overwrite")
        .parquet(udir)
    )
    zstats = _file_stats(zdir, ["u", "v"])
    ustats = _file_stats(udir, ["u", "v"])
    assert len(zstats) == n_files and len(ustats) == n_files

    # a mid-quantile v band holding 12.5% of ROWS (the value
    # distribution is skewed, so an absolute slice like v<max/8 holds
    # ~80% of rows and legitimately touches most equal-count files)
    lo, hi = (
        ev.select(
            F.expr("percentile(v, array(0.5, 0.625))").alias("q")
        ).collect()[0]["q"]
    )
    box = {"v": (int(lo), int(hi))}
    pruned_z = _files_overlapping_box(zstats, box)
    pruned_u = _files_overlapping_box(ustats, box)
    # u-sorted files each span ~the full v range: nothing prunes
    assert pruned_u == n_files
    # z-ordered files are 2-D boxes: most exclude the v band
    assert pruned_z <= n_files // 2, (
        f"z-order should prune, touched {pruned_z}/{n_files}"
    )


def test_zorder_key_locality_beats_concat_sort(spark):
    """The Morton code must interleave, not concatenate: flipping a
    high bit of either dimension moves the Z-value far, flipping a low
    bit moves it a little — so nearby (u, v) points share prefixes."""
    df = spark.createDataFrame(
        [(3, 5), (3, 4), (3, 21), (19, 5)], ["u", "v"]
    ).withColumn("z", zorder_key(["u", "v"], bits=8))
    z = {(r["u"], r["v"]): r["z"] for r in df.collect()}
    # (3,5) and (3,4): low-bit v change → tiny z distance
    assert abs(z[(3, 5)] - z[(3, 4)]) < 8
    # (3,21) and (19,5): high-bit changes → larger z distance than any
    # low-bit move
    assert abs(z[(3, 21)] - z[(3, 5)]) > abs(z[(3, 5)] - z[(3, 4)])
    assert abs(z[(19, 5)] - z[(3, 5)]) > abs(z[(3, 5)] - z[(3, 4)])


def test_compact_files_parity_and_no_shuffle(spark, tmp_path):
    """Compaction must preserve data exactly, hit the requested file
    count, and plan WITHOUT a shuffle (coalesce is a narrow dep)."""
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compact")
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    ev.repartition(40).write.mode("overwrite").parquet(src)
    n_small = sum(
        1 for f in os.listdir(src) if f.endswith(".parquet")
    )
    assert n_small == 40

    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    n_out = compact_files(spark, src, dst, target_bytes=total // 3 + 1)
    n_files = sum(1 for f in os.listdir(dst) if f.endswith(".parquet"))
    assert n_files == n_out <= 4

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert (
        a.agg(F.sum("event_id"), F.sum("user_id")).collect()
        == b.agg(F.sum("event_id"), F.sum("user_id")).collect()
    )
    # narrow plan: no Exchange between scan and write
    plan = (
        spark.read.parquet(src)
        .coalesce(3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
