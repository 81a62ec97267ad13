"""Deterministic scale-out of the driver's parquet tables (bench only).

``ensure_scaled`` replicates a source scale-factor directory K× with
key offsets so joins keep their semantics at the larger scale:

- ``region`` / ``nation`` are fixed dimensions — copied once.
- Fact/dim keys are offset per copy by ``copy_k × (max_key + 1)``, the
  same scheme TPC-H itself uses between scale factors: every copy is a
  self-consistent universe (orders→customer, lineitem→orders/part/
  supplier, events→user all still join 1:1 with the original density).
- ``documents.text`` gets a copy-specific marker token spliced after
  every 2nd word (copy 0 keeps the original text). A verbatim 10×
  replication would turn every document into a 10-clique of exact
  dups and quadratically inflate every dedup verify stage; the marker
  destroys cross-copy shingle overlap while preserving each copy's
  internal near-dup structure, so dedup workloads scale linearly like
  a real corpus.
- ``embeddings.embedding`` is rotated by ``copy_k`` positions —
  norm-preserving, so each copy has the same magnitude distribution
  but cross-copy cosine collapses to noise (no artificial 10-cliques
  in ANN/embedding-dedup either).

Everything is a single narrow projection over a ``range(factor)``
cross join — no shuffle, no Python row code — so generating sf1 from
sf0.1 (~17 MB → ~170 MB) takes well under a minute and is fully
deterministic (no RNG, no timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_project_spark.sources.registry import load_table

# table -> columns to offset per copy (each gets + k * (max+1))
_OFFSET_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# key column -> table whose max defines the offset stride (foreign
# keys must use the REFERENCED table's stride so copy universes align)
_KEY_SOURCE: dict[str, tuple[str, str]] = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

_COPY_ONCE = ["region", "nation"]

# output files per table at factor 10 (≈64-128 MB-target splits would
# be overkill at this absolute size; 8 gives local[32] real read
# parallelism without a small-files problem)
_N_FILES = {"lineitem": 16, "orders": 8, "events": 8}


def _strides(
    spark: SparkSession, src_dir: str, keys: list[str] | None = None
) -> dict[str, int]:
    """Offset strides for ``keys`` (default: all). Restricting matters
    when the SOURCE is itself a subset directory (r11: sf100 composes
    on top of the docs+embeddings-only sf10) — the full sweep would
    try to read key-source tables the subset never generated."""
    out: dict[str, int] = {}
    cache: dict[tuple[str, str], int] = {}
    for key, (table, col) in _KEY_SOURCE.items():
        if keys is not None and key not in keys:
            continue
        if (table, col) not in cache:
            cache[(table, col)] = (
                load_table(spark, src_dir, table)
                .agg(F.max(col).cast("bigint").alias("m"))
                .collect()[0]["m"]
            )
        out[key] = cache[(table, col)] + 1
    return out


def _scaled_table(
    spark: SparkSession,
    src_dir: str,
    table: str,
    factor: int,
    strides: dict[str, int],
    decorrelate: bool = False,
) -> DataFrame:
    df = load_table(spark, src_dir, table)
    copies = spark.range(factor).select(F.col("id").cast("int").alias("__k"))
    out = df.crossJoin(copies)
    for key in _OFFSET_KEYS[table]:
        out = out.withColumn(
            key,
            (F.col(key) + F.col("__k").cast("bigint") * F.lit(strides[key])).cast(
                df.schema[key].dataType
            ),
        )
    if table == "documents":
        # Marker-aware COMPOSITION (r12 — VERDICT r11 item 5): when the
        # source is itself a generated directory its text already
        # carries zq<k1> markers every 3rd token, and re-splicing
        # inserted new markers between THEM — composed docs became
        # ~50% marker tokens, a different shingle-statistics regime
        # that CPU-bound the first sf100 dedup attempt. Instead,
        # rewrite each existing marker to zq<k1>x<k2>: marker density
        # is invariant in generation depth and every copy pair still
        # gets distinct markers (all 3-shingles contain one). Docs the
        # source left UNMARKED (its copy-0 universe) get the fresh
        # splice under a depth-qualified name, zq0x<k2> — a bare
        # zq<k2> would collide with the source's zq<k1> universe:
        # copies (k1, 0) and (0, k2=k1) would be verbatim twins.
        # The separator is 'x', NOT '_' or any non-alphanumeric: the
        # dedup tokenizer is [a-z0-9]+ (operators/dedup.tokens_col),
        # and a separator outside that class SPLITS the marker — the
        # '_'-variant made '<k2>' a standalone token shared across all
        # k1-copies, restoring exactly the cross-copy shingle overlap
        # the markers exist to destroy (measured: 70 GB of shuffle at
        # sf100 before the disk filled, vs 544 MB at sf10). 'zq\d+'
        # never collides with 'zq<a>x<b>' and x splits unambiguously.
        # Supported depth is 2 (sf0.1→sf10→sf100, the bench lineage);
        # single-generation output has no pre-existing markers and is
        # byte-identical to the old splice, so sf1/sf10 benchdata
        # stays reproducible.
        marker_re = r"(^|\s)zq[0-9x]+(\s|$)"
        src_marked = (
            df.filter(F.col("text").rlike(marker_re)).limit(1).count() > 0
        )
        prefix = "$1 zq0x" if src_marked else "$1 zq"
        marked = F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+ \S+) "),
            F.concat(F.lit(prefix), F.col("__k").cast("string"), F.lit(" ")),
        )
        composed = F.regexp_replace(
            F.col("text"),
            F.lit(r"(zq[0-9x]+)"),
            F.concat(F.lit("$1x"), F.col("__k").cast("string")),
        )
        has_marker = F.col("text").rlike(marker_re)
        out = out.withColumn(
            "text",
            F.when(F.col("__k") == 0, F.col("text")).otherwise(
                F.when(has_marker, composed).otherwise(marked)
            ),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings":
        # The rotation+flip transform below has period 2·dim: copy k
        # and copy k+2·dim get the identical rotation AND the same
        # (even) flip parity — i.e. exact cross-copy embedding twins,
        # precisely the duplicate cliques the transform exists to
        # avoid (ADVICE r10). Callers max out at factor=100 against
        # dim 64; enforce the bound instead of trusting it.
        dim_val = df.select(F.min(F.size("embedding")).alias("d")).first()["d"]
        if dim_val is not None and factor > 2 * dim_val and not decorrelate:
            raise ValueError(
                f"embeddings factor {factor} exceeds the transform period "
                f"2*dim = {2 * dim_val}: copies k and k+{2 * dim_val} would "
                "be exact twins; lower the factor, or pass decorrelate=True "
                "(per-copy hash-sign diagonal; also required when COMPOSING "
                "generations, where rotations add up and collide)"
            )
        dim = F.size("embedding")
        # Rotate by __k mod dim (a raw __k > dim produced negative
        # slice lengths at factor 100 / dim 64); copies that wrap the
        # dimension count additionally flip sign (norm-preserving, and
        # cosine(x, -x_rotated) collapses to noise) so within the
        # enforced factor ≤ 2·dim bound no copy is an exact twin of
        # another — a verbatim twin would plant cross-copy duplicate
        # cliques the replication exists to avoid.
        rot = F.pmod(F.col("__k"), dim)
        rotated = F.concat(
            F.slice(F.col("embedding"), rot + 1, dim - rot),
            F.slice(F.col("embedding"), F.lit(1), rot),
        )
        elem_t = df.schema["embedding"].dataType.elementType.simpleString()
        flipped = F.transform(rotated, lambda x: (-x).cast(elem_t))
        wrapped = (F.col("__k") / dim).cast("int") % 2 == 1
        xf = F.when(wrapped, flipped).otherwise(rotated)
        if decorrelate:
            # Per-copy ±1 diagonal keyed by xxhash64(__k, position):
            # norm-preserving, distinct per copy up to a 64-bit
            # pattern collision, and — unlike rotation — does NOT
            # compose additively, so sf10→sf100-style CHAINED
            # generations stop colliding (copies (k1,k2)=(0,1) and
            # (1,0) share rot 1 + even parity and would otherwise be
            # verbatim twins). Opt-in: the default path is untouched
            # so the existing sf1/sf10 benchdata lineage (and its
            # bench history) stays byte-reproducible.
            xf = F.transform(
                xf,
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(F.col("__k"), i), F.lit(2)) == 0, x
                ).otherwise((-x).cast(elem_t)),
            )
        out = out.withColumn(
            "embedding",
            F.when(F.col("__k") == 0, F.col("embedding")).otherwise(xf),
        )
    return out.drop("__k")


def ensure_scaled(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    factor: int = 10,
    tables: list[str] | None = None,
    decorrelate: bool = False,
) -> str:
    """Generate ``dst_dir`` as ``factor``× ``src_dir`` if not present.

    Idempotent: a ``_DONE`` marker written after the last table makes a
    half-finished generation (killed bench run) regenerate cleanly.

    ``tables`` restricts generation to a subset (r10: the sf10
    scale-proof needs only documents/embeddings — a full sf10 TPC-H
    universe would be wasted disk and generation time). The marker
    records which tables are present; a later call asking for more
    tables generates only the missing ones. ``None`` means everything.
    """
    marker = os.path.join(dst_dir, "_DONE")
    # A second call with a DIFFERENT factor against an existing dst
    # must never silently mix scales: all-present would return
    # wrong-scale data, and partially-present would generate only the
    # missing tables at the new factor while the marker records just
    # the latest one (ADVICE r10). Raise and make the caller choose.
    if os.path.exists(marker):
        with open(marker) as fh:
            for line in fh.read().splitlines():
                if line.startswith("factor="):
                    recorded = int(line.split("=", 1)[1].split()[0])
                    if recorded != factor:
                        raise ValueError(
                            f"{dst_dir} was generated at factor={recorded}; "
                            f"requested factor={factor} would mix scales — "
                            "delete the directory to regenerate"
                        )
                    break
    want_copy = (
        list(_COPY_ONCE)
        if tables is None
        else [t for t in _COPY_ONCE if t in tables]
    )
    want_fact = (
        list(_OFFSET_KEYS)
        if tables is None
        else [t for t in _OFFSET_KEYS if t in tables]
    )
    have: set[str] = set()
    if os.path.exists(marker):
        with open(marker) as fh:
            text = fh.read()
        for line in text.splitlines():
            if line.startswith("tables="):
                have = set(line.split("=", 1)[1].split(",")) - {""}
                break
        else:
            # legacy marker (pre-subset): all tables are present
            have = set(_COPY_ONCE) | set(_OFFSET_KEYS)
    missing_copy = [t for t in want_copy if t not in have]
    missing_fact = [t for t in want_fact if t not in have]
    if not missing_copy and not missing_fact:
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    strides = _strides(
        spark,
        src_dir,
        keys=sorted({k for t in missing_fact for k in _OFFSET_KEYS[t]}),
    )
    for table in missing_copy:
        load_table(spark, src_dir, table).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{table}.parquet")
        )
    for table in missing_fact:
        df = _scaled_table(
            spark, src_dir, table, factor, strides, decorrelate=decorrelate
        )
        # file-count scales with factor so partitions stay ~the same
        # byte size at any generated scale (sf10 with sf1's 4 files
        # per table would make 300+ MB splits the dominant skew) —
        # and never drops below the SOURCE's file count: a composed
        # generation (sf10→sf100, factor 10) under the factor//10 rule
        # alone wrote 10× the data into the base 4 files, leaving ~8
        # real row-group splits to carry a 5M-doc scan (r11: measured
        # as 8 straggler tasks throttling the sf100 dedup chain).
        src_path = os.path.join(src_dir, f"{table}.parquet")
        src_files = (
            len([f for f in os.listdir(src_path) if f.endswith(".parquet")])
            if os.path.isdir(src_path)
            else 1  # single-file source (the driver's testdata tables)
        )
        n_files = max(
            _N_FILES.get(table, 4) * max(1, factor // 10), src_files
        )
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{table}.parquet")
        )
    done = have | set(missing_copy) | set(missing_fact)
    with open(marker, "w") as fh:
        fh.write(f"factor={factor} src={src_dir}\n")
        fh.write("tables=" + ",".join(sorted(done)) + "\n")
    return dst_dir
