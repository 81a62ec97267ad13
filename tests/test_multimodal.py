"""Multimodal plumbing tests: binary columns + mapInPandas stages."""

import hashlib

import pytest

from dbt_project_spark.operators.multimodal import (
    attach_blob,
    decode_image,
    extract_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def blobs(spark):
    df = spark.createDataFrame(
        [(1, "hello world payload"), (2, "another fake image bytes")],
        ["doc_id", "text"],
    )
    return attach_blob(df)


def test_blob_schema(blobs):
    d = dict(blobs.dtypes)
    assert d["content"] == "binary"
    assert d["meta"].startswith("struct<mime:string,n_bytes:bigint")


def test_extract_features_deterministic(blobs):
    rows = {r["doc_id"]: r for r in extract_features(blobs).collect()}
    want_md5 = hashlib.md5(b"hello world payload").hexdigest()
    assert rows[1]["content_md5"] == want_md5
    assert rows[1]["n_bytes"] == len(b"hello world payload")
    hint = int(want_md5[:8], 16)
    assert rows[1]["fake_width"] == 64 + hint % 1857
    assert rows[1]["fake_height"] == 64 + (hint >> 11) % 1017


def test_frame_sample_shape(blobs):
    rows = frame_sample(blobs, n_frames=4).collect()
    assert len(rows) == 8  # 2 docs × 4 frames
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert sorted(by_doc[1]) == [0, 1, 2, 3]


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG...")


def test_audio_windows_shapes_and_empty_payload(spark):
    from dbt_project_spark.operators.multimodal import audio_windows

    df = spark.createDataFrame(
        [(1, bytearray(range(70))), (2, bytearray()), (3, bytearray([255]))],
        "doc_id LONG, content BINARY",
    )
    rows = {(r["doc_id"], r["win_idx"]): r for r in audio_windows(df, window=32).collect()}
    # doc 1: 70 bytes -> windows of 32, 32, 6
    assert rows[(1, 0)]["n_samples"] == 32 and rows[(1, 0)]["amp_sum"] == sum(range(32))
    assert rows[(1, 1)]["peak"] == 63
    assert rows[(1, 2)]["n_samples"] == 6
    # doc 2 (empty payload) emits nothing; doc 3 is a single sample
    assert not any(d == 2 for d, _ in rows)
    assert rows[(3, 0)] ["peak"] == 255 and rows[(3, 0)]["n_samples"] == 1
