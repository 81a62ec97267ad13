"""Multimodal family: binary-column feature extraction via
``mapInPandas`` (Arrow-batched Python — the one deliberate non-JVM
path in the engine, since codec work is inherently Python/native)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbt_project_spark.catalog import register
from dbt_project_spark.operators.multimodal import attach_blob, extract_features
from dbt_project_spark.sources import load_table


@register(
    "mm_binary_features",
    oracle="""
    WITH b AS (SELECT doc_id, text, encode(text) AS content FROM documents),
    -- md5 of the UTF-8 payload == md5 of the text (DuckDB's md5 takes
    -- VARCHAR; the payload IS the UTF-8 encoding of that VARCHAR)
    h AS (SELECT doc_id,
                 CAST(octet_length(content) AS BIGINT) AS n_bytes,
                 md5(text) AS content_md5,
                 ('0x' || substr(md5(text), 1, 8))::BIGINT AS hint
          FROM b)
    SELECT doc_id, n_bytes, content_md5,
           CAST(64 + (hint % 1857) AS INT) AS fake_width,
           CAST(64 + ((hint >> 11) % 1017) AS INT) AS fake_height
    FROM h
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched feature extraction (decode step
    deterministic-fake; see operators/multimodal.py)."""
    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    return extract_features(docs)


@register(
    "mm_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, text,
                      greatest(octet_length(encode(text)) // 4, 1) AS step
               FROM documents),
    f AS (SELECT doc_id, step, unnest(range(0, 4)) AS frame_idx FROM d),
    -- documents are pure ASCII, so byte offsets == char offsets and
    -- md5(substr(text)) == md5 of the byte slice the Spark side hashes
    c AS (SELECT f.doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
                 substr(d.text, f.frame_idx * f.step + 1, f.step) AS chunk
          FROM f JOIN d ON d.doc_id = f.doc_id)
    SELECT doc_id, frame_idx, md5(chunk) AS frame_md5 FROM c
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frame sampling over binary payloads (mapInPandas,
    Arrow-batched): 4 evenly spaced byte-range 'frames' per payload,
    fingerprinted — the explode/partition shape of real video frame
    extraction with the codec stubbed (operators/multimodal.py)."""
    from dbt_project_spark.operators.multimodal import frame_sample

    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    return frame_sample(docs, n_frames=4)


@register(
    "mm_audio_windows",
    oracle="""
    WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS n
               FROM documents WHERE octet_length(encode(text)) > 0),
    w AS (SELECT doc_id, text, n,
                 unnest(range(0, (n + 31) // 32)) AS win_idx FROM d),
    -- documents are pure ASCII: byte k == ascii(char k)
    s AS (SELECT doc_id, win_idx,
                 list_transform(
                   range(1 + win_idx * 32, 1 + least((win_idx + 1) * 32, n)),
                   i -> ascii(substr(text, i::INT, 1))) AS bs
          FROM w)
    SELECT doc_id,
           CAST(win_idx AS INT) AS win_idx,
           CAST(len(bs) AS INT) AS n_samples,
           CAST(list_max(bs) AS INT) AS peak,
           CAST(list_sum(bs) AS BIGINT) AS amp_sum
    FROM s
    """,
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality stand-in: payload bytes as unsigned 8-bit
    samples → per-32-sample-window count/peak/amplitude-sum, computed
    with vectorized numpy over Arrow batches (frombuffer + reduceat —
    no per-sample Python). Integer outputs, bit-exact oracle."""
    from dbt_project_spark.operators.multimodal import audio_windows

    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    return audio_windows(docs, window=32)


@register(
    "mm_arrow_byte_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
                AS BIGINT) AS n_alpha,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digit,
           CAST(length(text)
                - length(regexp_replace(text, '[ \t\n\r]', '', 'g'))
                AS BIGINT) AS n_space
    FROM documents
    """,
)
def mm_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-class stats via mapInArrow (operators/multimodal.py
    arrow_byte_stats): Arrow buffers straight into numpy bincount —
    no pandas, no shuffle. Oracle counts the same classes with regex
    over the ASCII text (byte == char for this corpus)."""
    from dbt_project_spark.operators.multimodal import arrow_byte_stats

    docs = attach_blob(load_table(spark, sf_dir, "documents"))
    return arrow_byte_stats(docs)


# ---------------------------------------------------------------------------
# mm_chunk_dedup — binary chunk-level dedup ratio (r4s4)
# ---------------------------------------------------------------------------

MM_CHUNK_BYTES = 64


@register(
    "mm_chunk_dedup",
    oracle=f"""
    WITH b AS (SELECT doc_id, text,
                      GREATEST((length(text) + {MM_CHUNK_BYTES} - 1)
                               // {MM_CHUNK_BYTES}, 1) AS nch
               FROM documents),
    -- documents are pure ASCII: byte chunks == char chunks, and
    -- DuckDB's md5(VARCHAR) hashes the UTF-8 bytes Spark hashes
    c AS (SELECT doc_id,
                 md5(substr(text, CAST(i * {MM_CHUNK_BYTES} + 1 AS BIGINT),
                            {MM_CHUNK_BYTES})) AS h
          FROM b, unnest(range(0, nch)) AS t(i))
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_chunks,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS dup_chunks,
           CAST(COUNT(DISTINCT h) * 1000000 // COUNT(*) AS BIGINT)
               AS unique_ratio_micro
    FROM c
    """,
)
def mm_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level binary deduplication ratio: every payload is split
    into fixed {MM_CHUNK_BYTES}-byte blocks, each block fingerprinted,
    and the corpus-wide distinct/total chunk ratio reported — the
    storage-dedup primitive (Venti/backup-store shape) that tells a
    multimodal lake how much block-level redundancy full-file hashing
    (dedup_exact) misses. Production systems use content-defined
    chunking (gear/rolling hash) so insertions don't shift block
    boundaries; that needs per-byte state → a mapInArrow kernel, while
    this fixed-block variant stays ENTIRELY inside JVM codegen:
    substring on the binary column + md5 per block, exploded from a
    sequence — no Python boundary at all.

    Scale shape: one scan, per-row fan-out = payload/{MM_CHUNK_BYTES}
    rows carrying 32-byte hashes (not the payload bytes); the distinct
    count is Spark's standard two-phase distinct aggregate on the hash
    — the only shuffle, and it moves hashes, never content.
    """
    from pyspark.sql import functions as F

    b = attach_blob(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "content",
        F.expr(
            f"GREATEST((length(content) + {MM_CHUNK_BYTES} - 1)"
            f" div {MM_CHUNK_BYTES}, 1)"
        ).alias("nch"),
    )
    c = b.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, nch - 1),"
                f" i -> md5(substring(content,"
                f" CAST(i * {MM_CHUNK_BYTES} + 1 AS INT), {MM_CHUNK_BYTES})))"
            )
        ).alias("h"),
    )
    return c.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.countDistinct("h").cast("bigint").alias("n_distinct_chunks"),
        (F.count(F.lit(1)) - F.countDistinct("h"))
        .cast("bigint")
        .alias("dup_chunks"),
        F.expr(
            "CAST(COUNT(DISTINCT h) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("unique_ratio_micro"),
    )


def _cdc_oracle() -> str:
    """Replays the bounded-context gear rule with 8 LAGs over per-byte
    rows (oracle-only flattening — the Spark kernel never materializes
    per-byte rows). Documents are pure ASCII, so char positions ==
    byte offsets and ascii(substr(...)) == the payload byte."""
    from dbt_project_spark.operators.multimodal import (
        CDC_MASK,
        CDC_SHIFT,
        CDC_WINDOW,
    )

    lags = " + ".join(
        f"(COALESCE(LAG(g, {k}) OVER w, 0) << {k})"
        for k in range(CDC_WINDOW)
    )
    return f"""
    WITH gear AS (SELECT i AS bv,
                    ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))::BIGINT AS g
                  FROM range(0, 256) t(i)),
    docs AS (SELECT doc_id, text, length(text) AS n FROM documents
             WHERE length(text) > 0),
    pos AS (SELECT doc_id, CAST(i + 1 AS BIGINT) AS p
            FROM docs, unnest(range(0, n)) AS t(i)),
    by1 AS (SELECT p.doc_id, p.p, gear.g
            FROM pos p
                 JOIN docs d ON d.doc_id = p.doc_id
                 JOIN gear ON gear.bv = ascii(substr(d.text, CAST(p.p AS INT), 1))),
    roll AS (SELECT doc_id, p, {lags} AS r
             FROM by1 WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
    ends AS (SELECT doc_id, p AS e FROM roll
             WHERE p >= {CDC_WINDOW} AND ((r >> {CDC_SHIFT}) & {CDC_MASK}) = 0
             UNION
             SELECT doc_id, n FROM docs),
    ch AS (SELECT doc_id,
                  COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS s,
                  e
           FROM ends),
    hashes AS (SELECT c.doc_id,
                      md5(substr(d.text, CAST(c.s + 1 AS INT),
                                 CAST(c.e - c.s AS INT))) AS h
               FROM ch c JOIN docs d ON d.doc_id = c.doc_id)
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_chunks,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS dup_chunks,
           CAST(COUNT(DISTINCT h) * 1000000 // COUNT(*) AS BIGINT)
               AS unique_ratio_micro
    FROM hashes
    """


@register("mm_chunk_dedup_cdc", oracle=_cdc_oracle())
def mm_chunk_dedup_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk dedup (r05 — the production variant
    mm_chunk_dedup's docstring promises): payloads are cut where a
    gear-style rolling hash of the trailing 8 bytes hits the boundary
    mask (avg ≈ 64-byte chunks), so a 1-byte insertion shifts only the
    chunks up to the next content cut instead of rewriting every
    fixed-block hash downstream — the property that makes backup
    stores and multimodal lakes dedup across near-identical blobs.
    Same corpus-wide report as the fixed-block variant, so the two
    unique-ratios are directly comparable.

    Spark side: Arrow-batched numpy kernel (operators/multimodal.py
    cdc_chunk_hashes — the one family where Python is the right
    boundary, per-byte JVM codegen over binaries isn't expressible);
    aggregation is the standard two-phase distinct over 32-byte
    hashes. The oracle replays the identical rule with 8 LAGs over
    per-byte rows (oracle-only flattening)."""
    from pyspark.sql import functions as F

    from dbt_project_spark.operators.multimodal import cdc_chunk_hashes

    docs = attach_blob(load_table(spark, sf_dir, "documents")).filter(
        F.length("content") > 0
    )
    c = cdc_chunk_hashes(docs)
    return c.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.countDistinct("h").cast("bigint").alias("n_distinct_chunks"),
        (F.count(F.lit(1)) - F.countDistinct("h"))
        .cast("bigint")
        .alias("dup_chunks"),
        F.expr(
            "CAST(COUNT(DISTINCT h) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("unique_ratio_micro"),
    )


@register(
    "mm_byte_entropy",
    oracle="""
    WITH ch AS (SELECT doc_id,
                       unnest(list_transform(range(1, length(text) + 1),
                              i -> substring(text, i, 1))) AS c
                FROM documents WHERE length(text) > 0),
    hist AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
             FROM ch GROUP BY 1, 2),
    terms AS (SELECT doc_id,
                     CAST(COUNT(*) AS BIGINT) AS n_distinct,
                     CAST(SUM(n) AS BIGINT) AS n_bytes,
                     CAST(SUM(n * CAST(round(ln(n) * 1000000000) AS BIGINT))
                          AS BIGINT) AS sum_clnc9
              FROM hist GROUP BY doc_id)
    SELECT doc_id, n_bytes, n_distinct, sum_clnc9,
           CAST((n_bytes * CAST(round(ln(n_bytes) * 1000000000) AS BIGINT)
                 - sum_clnc9) // (n_bytes * 1000) AS BIGINT)
               AS entropy_nats_micro
    FROM terms
    """,
)
def mm_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level Shannon entropy per payload (mapInArrow, zero-copy
    numpy bincount — operators/multimodal.py:arrow_byte_entropy):
    the compressed/encrypted-blob detector. Natural English text sits
    near ~2.9 nats/byte over ASCII; gzip or cipher output saturates
    toward ln(256) ≈ 5.55; all-padding collapses to 0 — an ingest
    pipeline drops or reroutes payloads by this one number before
    wasting decoder time.

    Exactness: H = (n·ln n − Σc·ln c)/n is assembled from ×1e9
    integer log terms (one libm ln per distinct count, the repo-wide
    convention) and finished with a truncating integer division —
    the Python (Arrow) side and the SQL oracle produce identical
    BIGINTs. Oracle counts CHARS of the ASCII text (byte == char for
    this corpus; the Spark side hashes the actual UTF-8 payload).

    Scale shape: embarrassingly parallel map-only scan, C-speed
    bincount per Arrow buffer, no shuffle — the cheapest full-corpus
    pass over a binary column."""
    from dbt_project_spark.operators.multimodal import arrow_byte_entropy
    from pyspark.sql import functions as F

    docs = attach_blob(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") > 0
        )
    )
    t = arrow_byte_entropy(docs)
    return t.select(
        "doc_id",
        "n_bytes",
        "n_distinct",
        "sum_clnc9",
        F.expr(
            "CAST((n_bytes * CAST(round(ln(n_bytes) * 1000000000) AS BIGINT)"
            " - sum_clnc9) div (n_bytes * 1000) AS BIGINT)"
        ).alias("entropy_nats_micro"),
    )
