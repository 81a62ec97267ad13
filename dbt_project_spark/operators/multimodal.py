"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing
(schemas, batching, partitioning) is real; the actual codec call is
stubbed (no image/audio libs in this environment) behind
``decode_image``, with a deterministic md5-derived fake used for the
feature path so the pipeline is testable end-to-end.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow batches into Python). ``mapInPandas`` streams
batches — peak memory is one Arrow batch per core, not one partition;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds it when
payloads are large. Feature extraction is embarrassingly parallel:
no shuffle at all until a downstream aggregation.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, "
    "fake_width int, fake_height int"
)


def decode_image(payload: bytes):
    """Real codec hook — intentionally stubbed (no PIL/ffmpeg here).

    A deployment wires this to PIL/torchvision/ffmpeg; everything
    around it (batching, schema, partitioning) is identical.
    """
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in "
        "this environment; wire decode_image() to PIL/ffmpeg in a real "
        "deployment"
    )


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in payload: UTF-8 bytes of the text column as `content`
    (binary), plus a metadata struct — the schema a real multimodal
    table would have."""
    return df.withColumn("content", F.col(text_col).cast("binary")).withColumn(
        "meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col).cast("binary")).cast("bigint").alias("n_bytes"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The 'decode' is a deterministic md5-derived fake (so tests and the
    SQL oracle can verify the plumbing); swap the marked line for
    ``decode_image`` in deployment.
    """

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            md5s = [hashlib.md5(b).hexdigest() for b in pdf["content"]]
            hints = [int(h[:8], 16) for h in md5s]
            out = pdf[[id_col]].copy()
            out["n_bytes"] = [len(b) for b in pdf["content"]]
            out["content_md5"] = md5s
            # deployment: w, h = decode_image(b).size  — stubbed:
            out["fake_width"] = [64 + (h % 1857) for h in hints]
            out["fake_height"] = [64 + ((h >> 11) % 1017) for h in hints]
            yield out

    return df.select(id_col, "content").mapInPandas(batches, FEATURE_SCHEMA)


def audio_windows(
    df: DataFrame, id_col: str = "doc_id", window: int = 32
) -> DataFrame:
    """Windowed amplitude features over a binary 'audio' payload.

    Treats the payload as unsigned 8-bit samples and computes, per
    fixed-size window: sample count, peak, and amplitude sum — the
    RMS/VAD-style summarization shape of real audio pipelines, with
    the codec (resample/decode to PCM) stubbed exactly like
    decode_image. Vectorized numpy over Arrow batches: one
    frombuffer + reduceat per payload, no Python-per-sample loop.
    Integer outputs only, so the oracle compares bit-exactly."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out_rows = []
            for did, payload in zip(pdf[id_col], pdf["content"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                if len(a) == 0:
                    continue
                starts = np.arange(0, len(a), window)
                sums = np.add.reduceat(a.astype(np.int64), starts)
                peaks = np.maximum.reduceat(a, starts)
                ns = np.diff(np.append(starts, len(a)))
                for i in range(len(starts)):
                    out_rows.append(
                        {
                            id_col: did,
                            "win_idx": i,
                            "n_samples": int(ns[i]),
                            "peak": int(peaks[i]),
                            "amp_sum": int(sums[i]),
                        }
                    )
            yield pd.DataFrame(
                out_rows,
                columns=[id_col, "win_idx", "n_samples", "peak", "amp_sum"],
            )

    return df.select(id_col, "content").mapInPandas(
        batches,
        f"{id_col} bigint, win_idx int, n_samples int, peak int, amp_sum bigint",
    )


def frame_sample(df: DataFrame, id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling stub: emits n_frames rows per
    payload with byte-offset 'frames' — the explode/partition shape of
    real video sampling without the codec."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["content"]
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    off = i * step
                    chunk = payload[off : off + step]
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_idx": i,
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "content").mapInPandas(
        batches, f"{id_col} bigint, frame_idx int, frame_md5 string"
    )


def arrow_byte_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload byte-class statistics via ``mapInArrow`` — the
    zero-copy sibling of the mapInPandas operators above: batches stay
    as Arrow buffers end-to-end (no pandas materialization), and the
    per-byte work is one numpy ``frombuffer`` + ``bincount`` per
    batch, i.e. vectorized over the whole Arrow buffer rather than
    per-row Python. This is the shape a 100 TB byte-level scan wants:
    embarrassingly parallel, no shuffle, C-speed inner loop.

    Input needs (id_col, content: binary); emits byte-class counts
    (alpha / digit / space / other) per payload.
    """

    def batches(it):
        import numpy as np
        import pyarrow as pa

        alpha = np.zeros(256, dtype=bool)
        alpha[ord("a"): ord("z") + 1] = True
        alpha[ord("A"): ord("Z") + 1] = True
        digit = np.zeros(256, dtype=bool)
        digit[ord("0"): ord("9") + 1] = True
        space = np.zeros(256, dtype=bool)
        space[[ord(" "), ord("\t"), ord("\n"), ord("\r")]] = True

        for batch in it:
            ids = batch.column(0)
            content = batch.column(1)
            n_bytes, n_alpha, n_digit, n_space = [], [], [], []
            for v in content:
                buf = np.frombuffer(v.as_buffer(), dtype=np.uint8)
                counts = np.bincount(buf, minlength=256)
                n_bytes.append(int(buf.size))
                n_alpha.append(int(counts[alpha].sum()))
                n_digit.append(int(counts[digit].sum()))
                n_space.append(int(counts[space].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_bytes, pa.int64()),
                    pa.array(n_alpha, pa.int64()),
                    pa.array(n_digit, pa.int64()),
                    pa.array(n_space, pa.int64()),
                ],
                names=[id_col, "n_bytes", "n_alpha", "n_digit", "n_space"],
            )

    return df.select(id_col, "content").mapInArrow(
        batches,
        f"{id_col} bigint, n_bytes bigint, n_alpha bigint, "
        "n_digit bigint, n_space bigint",
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (r05): Gear-style rolling boundary detection
# ---------------------------------------------------------------------------

# Bounded-context Gear CDC: the rolling value at byte i is
#   roll_i = Σ_{k=0..7} GEAR[b_{i-k}] << k
# (an 8-byte sliding window — the bounded-context variant of Gear/
# FastCDC; classic gear's h=(h<<1)+GEAR[b] also forgets bytes after 64
# shifts, this just makes the horizon explicit so the boundary rule is
# POSITION-PARALLEL: every byte's verdict depends only on its trailing
# window, which is what lets the DuckDB oracle replay it with 8 LAGs
# and the numpy kernel vectorize it with 8 shifted adds — no sequential
# scan anywhere). A boundary closes the chunk at byte i when
# ((roll_i >> 4) & 63) == 0 — bits 4..9, chosen so ALL 8 window bytes
# feed the masked bits (avg chunk ≈ 64 bytes, the fixed-block size of
# mm_chunk_dedup, so the two variants are comparable). No min/max
# chunk clamps: those re-introduce a sequential dependency (FastCDC
# skips boundaries within min-distance of the PREVIOUS cut); the
# unclamped rule keeps chunking embarrassingly parallel per payload.
GEAR = [
    int(hashlib.md5(str(b).encode()).hexdigest()[:8], 16) for b in range(256)
]
CDC_WINDOW = 8
CDC_SHIFT = 4
CDC_MASK = 63


def cdc_chunk_hashes(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(doc_id, h): md5 per CONTENT-DEFINED chunk of each binary
    payload — the mapInArrow kernel the fixed-block variant
    (mm_chunk_dedup) documents as the production shape: insertions
    shift fixed-block boundaries and destroy every downstream hash,
    while gear boundaries re-synchronize at the next content cut
    (tests/test_multimodal.py plants a 1-byte insertion and checks
    the chunk hashes survive).

    Arrow-batched: payload bytes land in numpy once per batch; the
    rolling values are 8 shifted adds over the gear-mapped byte
    array (vectorized, no per-byte Python); only the ~n/64 chunk
    md5s run in a Python loop. Emits 32-hex hashes, never payload
    bytes — the downstream distinct-aggregate shuffle moves hashes
    only, same as the fixed-block variant."""
    import numpy as np
    import pyarrow as pa

    gear = None  # built lazily on the executor

    def batches(it: Iterator) -> Iterator:
        nonlocal gear
        if gear is None:
            gear = np.array(GEAR, dtype=np.int64)
        for rb in it:
            ids = rb.column(0).to_pylist()
            blobs = rb.column(1).to_pylist()
            out_ids: list[int] = []
            out_h: list[str] = []
            for did, blob in zip(ids, blobs):
                if not blob:
                    continue
                bs = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
                n = len(bs)
                g = gear[bs]
                roll = np.zeros(n, dtype=np.int64)
                for k in range(CDC_WINDOW):
                    roll[CDC_WINDOW - 1 :] += g[CDC_WINDOW - 1 - k : n - k] << k
                cut = np.nonzero(((roll >> CDC_SHIFT) & CDC_MASK) == 0)[0]
                cut = cut[cut >= CDC_WINDOW - 1]
                ends = [int(c) + 1 for c in cut]
                if not ends or ends[-1] != n:
                    ends.append(n)
                start = 0
                for e in ends:
                    out_h.append(hashlib.md5(blob[start:e]).hexdigest())
                    out_ids.append(did)
                    start = e
            yield pa.record_batch(
                [pa.array(out_ids, pa.int64()), pa.array(out_h, pa.string())],
                names=["doc_id", "h"],
            )

    return df.select(id_col, content_col).mapInArrow(
        batches, "doc_id long, h string"
    )


def arrow_byte_entropy(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload byte-level Shannon entropy via ``mapInArrow`` —
    the compressed/encrypted-blob detector an ingest pipeline runs on
    opaque binary columns (natural text ≈ 4.1 bits/byte; gzip/cipher
    output ≈ 8, truncation/padding ≈ 0).

    Exactness contract: the per-count log terms are rounded to ×1e9
    integers (``round(ln(c)·1e9)``, one libm double `ln` per distinct
    count value) and summed as exact int64 — the same one-ln-per-term
    convention the SQL families use, so a DuckDB oracle reproduces
    the sums bit-for-bit. Entropy itself is left to the caller as a
    truncating integer division over (n·ln9(n) − Σc·ln9(c)).

    Emits (id, n_bytes, n_distinct, sum_clnc9).
    """

    def batches(it):
        import math

        import numpy as np
        import pyarrow as pa

        for batch in it:
            ids = batch.column(0)
            content = batch.column(1)
            n_bytes, n_distinct, sums = [], [], []
            for v in content:
                buf = np.frombuffer(v.as_buffer(), dtype=np.uint8)
                counts = np.bincount(buf, minlength=256)
                nz = counts[counts > 0]
                s = 0
                for c in nz.tolist():
                    s += c * round(math.log(c) * 1_000_000_000)
                n_bytes.append(int(buf.size))
                n_distinct.append(int(nz.size))
                sums.append(s)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_bytes, pa.int64()),
                    pa.array(n_distinct, pa.int64()),
                    pa.array(sums, pa.int64()),
                ],
                names=[id_col, "n_bytes", "n_distinct", "sum_clnc9"],
            )

    return df.select(id_col, "content").mapInArrow(
        batches,
        f"{id_col} bigint, n_bytes bigint, n_distinct bigint,"
        " sum_clnc9 bigint",
    )
