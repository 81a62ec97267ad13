"""Planted-payload tests for the multimodal catalog family and the
vector-utility queries (r06 lint burn-down). Payloads are the UTF-8
bytes of planted ASCII texts, so every expected value below is
recomputed in plain Python (hashlib md5, byte windows, byte classes);
the vector fixtures use 3-4-5-style integer geometry so norms and
int8 codes are exact.
"""

import hashlib
import math
import os

import pytest

from dbt_project_spark.catalog import QUERIES, load_all

load_all()

MM_DOCS = {
    1: "abc",                                   # shorter than 4 bytes
    2: "Hello World 42\nline2\ttabbed 7",       # mixed byte classes
    3: "".join(chr(ord("a") + (i * 7) % 26) + str(i % 10)
               for i in range(75)),             # 150 bytes, no repeats
    4: "x" * 33,                                # crosses one 32B window
}


@pytest.fixture(scope="module")
def mm_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mm_planted") / "mmsf")
    rows = [(i, t, "en", "plant", len(t)) for i, t in MM_DOCS.items()]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_mm_binary_features_planted(spark, mm_dir):
    got = {r["doc_id"]: r for r in
           QUERIES["mm_binary_features"](spark, mm_dir).collect()}
    for i, t in MM_DOCS.items():
        md5 = hashlib.md5(t.encode()).hexdigest()
        hint = int(md5[:8], 16)
        r = got[i]
        assert r["n_bytes"] == len(t.encode())
        assert r["content_md5"] == md5
        assert r["fake_width"] == 64 + (hint % 1857)
        assert r["fake_height"] == 64 + ((hint >> 11) % 1017)


def test_mm_frame_sample_planted(spark, mm_dir):
    got = {(r["doc_id"], r["frame_idx"]): r["frame_md5"] for r in
           QUERIES["mm_frame_sample"](spark, mm_dir).collect()}
    want = {}
    for i, t in MM_DOCS.items():
        b = t.encode()
        step = max(len(b) // 4, 1)
        for f in range(4):
            want[(i, f)] = hashlib.md5(b[f * step: f * step + step]).hexdigest()
    assert got == want
    # the 3-byte doc's 4th frame is past the payload: md5 of empty
    assert got[(1, 3)] == hashlib.md5(b"").hexdigest()


def test_mm_audio_windows_planted(spark, mm_dir):
    got = {(r["doc_id"], r["win_idx"]):
           (r["n_samples"], r["peak"], r["amp_sum"]) for r in
           QUERIES["mm_audio_windows"](spark, mm_dir).collect()}
    want = {}
    for i, t in MM_DOCS.items():
        b = t.encode()
        for w in range(math.ceil(len(b) / 32)):
            win = b[w * 32: (w + 1) * 32]
            want[(i, w)] = (len(win), max(win), sum(win))
    assert got == want
    assert got[(4, 1)] == (1, ord("x"), ord("x"))  # the 1-byte tail


def test_mm_arrow_byte_stats_planted(spark, mm_dir):
    got = {r["doc_id"]: (r["n_bytes"], r["n_alpha"], r["n_digit"],
                         r["n_space"]) for r in
           QUERIES["mm_arrow_byte_stats"](spark, mm_dir).collect()}
    want = {}
    for i, t in MM_DOCS.items():
        b = t.encode()
        want[i] = (
            len(b),
            sum(1 for c in b if chr(c).isascii() and chr(c).isalpha()),
            sum(1 for c in b if chr(c).isdigit()),
            sum(1 for c in b if c in (0x20, 0x09, 0x0A, 0x0D)),
        )
    assert got == want


@pytest.fixture(scope="module")
def cdc_dir(spark, tmp_path_factory):
    # three byte-identical long payloads whose chunks are internally
    # unique (non-periodic content), so distinct-chunk math is exact
    d = str(tmp_path_factory.mktemp("cdc_planted") / "cdcsf")
    body = "".join(
        chr(ord("a") + (i * 11 + i * i) % 26) + str((i * 3) % 10)
        for i in range(160)
    )  # 320 bytes, aperiodic
    rows = [(i, body, "en", "plant", len(body)) for i in (1, 2, 3)]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_mm_chunk_dedup_cdc_planted(spark, cdc_dir):
    rows = QUERIES["mm_chunk_dedup_cdc"](spark, cdc_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # identical payloads cut at identical content-defined boundaries:
    # every chunk appears exactly 3 times, so dedup removes 2/3
    assert r["n_docs"] == 3
    assert r["n_chunks"] > 0 and r["n_chunks"] % 3 == 0
    assert r["n_distinct_chunks"] == r["n_chunks"] // 3


VECS = {
    0: [3.0, 4.0, 0.0, 0.0],        # norm 5, absmax 4
    1: [0.0, 0.0, 0.0, 5.0],        # norm 5, absmax 5
    2: [1.0, -1.0, 1.0, -1.0],      # norm 2, absmax 1
    3: [2.0, 2.0, 2.0, 2.0],        # norm 4
}


@pytest.fixture(scope="module")
def vec_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vec_planted") / "vecsf")
    rows = [(i, v, 0) for i, v in VECS.items()]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_vec_normalize_planted(spark, vec_dir):
    got = {r["vec_id"]: (r["l2_norm"], r["unit_norm_check"]) for r in
           QUERIES["vec_normalize"](spark, vec_dir).collect()}
    assert got == {0: (5.0, 1.0), 1: (5.0, 1.0), 2: (2.0, 1.0),
                   3: (4.0, 1.0)}


def test_vec_quantize_int8_planted(spark, vec_dir):
    got = {r["vec_id"]: (r["q_sum"], r["q_max"], r["q_min"], r["dim"])
           for r in QUERIES["vec_quantize_int8"](spark, vec_dir).collect()}
    # absmax scaling: 3/4·127 = 95.25 → 95; full-scale dims hit ±127
    assert got == {
        0: (95 + 127, 127, 0, 4),
        1: (127, 127, 0, 4),
        2: (0, 127, -127, 4),
        3: (4 * 127, 127, 127, 4),
    }
