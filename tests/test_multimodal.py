"""Unit tests for multimodal binary-column plumbing."""

import pytest

from smalltsdb_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 100, 100), (1, "ab" * 50, 100), (2, "xyz" * 40, 120)],
        "doc_id long, text string, n_chars long",
    )
    return multimodal.media_from_documents(docs)


def test_media_schema_and_meta(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "data", "meta"]
    rows = {r.media_id: r for r in media.collect()}
    assert rows[0].kind == "image" and rows[1].kind == "audio" and rows[2].kind == "video"
    assert bytes(rows[0].data) == b"a" * 100
    assert rows[1].meta.sample_rate == 16000
    assert rows[0].meta.width is not None and rows[2].meta.width is None


def test_extract_features(media):
    feats = {r.media_id: r for r in multimodal.extract_features(media).collect()}
    assert feats[0].n_bytes == 100
    assert feats[0].byte_entropy == 0.0  # single repeated byte
    assert feats[1].byte_entropy == pytest.approx(1.0)  # two equiprobable bytes
    import hashlib

    assert feats[2].head_hash == hashlib.md5((b"xyz" * 40)[:64]).hexdigest()


def test_sample_frames(media):
    frames = multimodal.sample_frames(media, frame_bytes=16, every_n=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    # media 0: 100 bytes -> 7 chunks of 16 -> keep idx 0,2,4,6
    assert sorted(r.frame_idx for r in by_media[0]) == [0, 2, 4, 6]
    assert bytes(by_media[0][0].frame) == b"a" * 16


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"...", "image")


def test_resize_images(media):
    out = multimodal.resize_images(media, max_side=10).collect()
    # only the image row (media_id 0: width=101, height=101 from n_chars=100)
    assert [r.media_id for r in out] == [0]
    r = out[0]
    # aspect preserved, longest side capped, payload exactly w*h bytes
    assert max(r.width, r.height) <= 10 and min(r.width, r.height) >= 1
    assert len(r.data) == r.width * r.height
    # deterministic: same input → same bytes
    again = multimodal.resize_images(media, max_side=10).collect()[0]
    assert bytes(again.data) == bytes(r.data)


def test_resize_never_upscales(spark):
    docs = spark.createDataFrame(
        [(0, "tiny", 4)], "doc_id long, text string, n_chars long"
    )
    media = multimodal.media_from_documents(docs)
    r = multimodal.resize_images(media, max_side=640).collect()[0]
    # source is 5x5 (n_chars%640+1), max_side larger → dimensions unchanged
    assert (r.width, r.height) == (5, 5)
    assert len(r.data) == 25  # short payload zero-padded to w*h
