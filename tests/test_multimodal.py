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


def _wav_bytes(rate=8000, freq=440.0, seconds=0.1, amp=10000):
    """Synthesize a PCM16 mono WAV with pure struct/numpy."""
    import struct

    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    samples = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(samples)) + samples
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def _bmp_bytes(width=4, height=3):
    """Synthesize an uncompressed 24-bit BMP (value = x+y per channel)."""
    import struct

    import numpy as np

    row = (width * 3 + 3) // 4 * 4
    px = np.zeros((height, row), dtype=np.uint8)
    for y in range(height):
        for x in range(width):
            px[y, x * 3 : x * 3 + 3] = (x + y) % 256
    body = px.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    off = 14 + len(dib)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + dib + body


def test_decode_wav_real():
    from smalltsdb_spark.operators.multimodal import decode_wav

    d = decode_wav(_wav_bytes(rate=8000, seconds=0.1, amp=10000))
    assert d["format"] == "wav" and d["sample_rate"] == 8000
    assert d["n_channels"] == 1 and d["bits"] == 16
    assert d["duration_s"] == 0.1
    # RMS of a sine is amp/sqrt(2), tolerance for int16 quantization
    assert abs(d["rms"] - 10000 / 2**0.5) < 50


def test_decode_bmp_real():
    from smalltsdb_spark.operators.multimodal import decode_bmp

    d = decode_bmp(_bmp_bytes(4, 3))
    assert d["format"] == "bmp" and (d["width"], d["height"]) == (4, 3)
    assert d["bits"] == 24
    # mean over (x+y) for x<4,y<3: sum=30 over 12 px = 2.5
    assert d["mean_pixel"] == 2.5


def test_decode_media_stats_mixed_formats(spark):
    """The decode stage must decode WAV/BMP for real and skip (not crash
    on) payloads with no dependency-free decoder."""
    from smalltsdb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_stats,
    )

    rows = [
        (1, "audio", bytearray(_wav_bytes()), None),
        (2, "image", bytearray(_bmp_bytes(4, 3)), None),
        (3, "video", bytearray(b"\x00\x01\x02 not a real codec"), None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_media_stats(media).collect()}
    assert got[1].decoded and got[1].format == "wav" and got[1].sample_rate == 8000
    assert got[2].decoded and got[2].format == "bmp" and got[2].mean_pixel == 2.5
    assert not got[3].decoded and got[3].format is None


def _png_bytes(arr, filters):
    """Minimal PNG encoder for round-trip tests: forward-filters each
    scanline with the given per-row filter types (spec §9), so the
    decoder's unfiltering paths are all exercised against numpy ground
    truth."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y, ftype in zip(range(h), filters):
        cur, prev = flat[y], (flat[y - 1] if y else np.zeros(stride, np.int64))
        line = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(line.astype(np.uint8).tobytes())

    def chunk(cid, body):
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_decode_png_real_all_filters(channels):
    """Round-trip: synthesized images forward-filtered with EVERY spec
    filter type (None/Sub/Up/Average/Paeth) must unfilter back to the
    exact numpy ground truth."""
    import numpy as np

    from smalltsdb_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7 + channels)
    arr = rng.integers(0, 256, size=(5, 6, channels), dtype=np.uint8)
    d = decode_png(_png_bytes(arr, filters=[0, 1, 2, 3, 4]))
    assert d["format"] == "png"
    assert (d["width"], d["height"]) == (6, 5)
    assert d["bits"] == 8 * channels
    assert d["mean_pixel"] == round(float(arr.mean()), 6)


def test_decode_png_in_decode_stage(spark):
    """decode_media_stats must route PNG payloads to the real decoder."""
    import numpy as np

    from smalltsdb_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media_stats,
    )

    arr = np.full((3, 4, 3), 17, dtype=np.uint8)
    rows = [(9, "image", bytearray(_png_bytes(arr, [0, 1, 4])), None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = decode_media_stats(media).collect()[0]
    assert got.decoded and got.format == "png"
    assert (got.width, got.height) == (4, 3)
    assert got.mean_pixel == 17.0


def test_average_hash_properties():
    """Identical images hash equal; a small perturbation moves few bits;
    an inverted image is far."""
    import numpy as np

    from smalltsdb_spark.operators.multimodal import average_hash

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(16, 16, 1)).astype(np.uint8)
    tweaked = base.copy()
    tweaked[0, 0, 0] = (int(tweaked[0, 0, 0]) + 3) % 256
    inverted = (255 - base).astype(np.uint8)

    h0, h1, h2 = (average_hash(a) for a in (base, tweaked, inverted))
    assert h0 == average_hash(base)          # deterministic
    assert bin((h0 ^ h1) & (2**64 - 1)).count("1") <= 4
    assert bin((h0 ^ h2) & (2**64 - 1)).count("1") >= 32
    # signed-int64 packing contract (LongType-safe)
    for h in (h0, h1, h2):
        assert -(2**63) <= h < 2**63


def test_image_near_dup_pairs(spark):
    """The perceptual pair pipeline on real decoded PNGs: near-identical
    images pair up, a structurally different image does not, and an
    undecodable payload is skipped, not fatal."""
    import numpy as np

    from smalltsdb_spark.operators.multimodal import image_near_dup_pairs

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(16, 16, 1)).astype(np.uint8)
    near = base.copy()
    near[3, 3, 0] = (int(near[3, 3, 0]) + 2) % 256
    far = rng.randint(0, 256, size=(16, 16, 1)).astype(np.uint8)

    rows = [
        (1, "image", bytearray(_png_bytes(base, [0] * 16)), None),
        (2, "image", bytearray(_png_bytes(near, [1] * 16)), None),
        (3, "image", bytearray(_png_bytes(far, [4] * 16)), None),
        (4, "image", bytearray(b"JFIFnotdecodable"), None),
        (5, "audio", bytearray(b"RIFFxxxxWAVE"), None),  # filtered out pre-UDF
    ]
    from smalltsdb_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(media, max_hamming=10).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert all(3 not in p and 4 not in p and 5 not in p for p in pairs)


def test_synth_bmp_round_trip():
    """synth_bmp_payload is a spec-valid BMP whose decoded pixels follow
    the closed-form formula the oracle SQL re-derives."""
    import numpy as np

    from smalltsdb_spark.operators.multimodal import (
        average_hash,
        decode_bmp,
        synth_bmp_payload,
    )

    for doc_id in (0, 3, 7, 123, 4096):
        d = decode_bmp(synth_bmp_payload(doc_id))
        assert (d["width"], d["height"], d["bits"]) == (8, 8, 24)
        px = d["_pixels"]
        base = doc_id - doc_id % 4
        hot = (doc_id % 4) * 9
        expect = np.array(
            [
                (base * 31 + k * 17 + (40 if k == hot else 0)) % 256
                for k in range(64)
            ]
        ).reshape(8, 8)
        assert (px[:, :, 0] == expect).all()
        assert (px[:, :, 1] == expect).all() and (px[:, :, 2] == expect).all()
        # hash equals the straight formula recompute (gray = channel mean
        # = the single gray value; 8x8 pooling on 8x8 = identity)
        bits = (expect.astype(float) > expect.mean()).astype(int).reshape(-1)
        h = 0
        for i, b in enumerate(bits):
            h |= int(b) << i
        if h >= 1 << 63:
            h -= 1 << 64
        assert average_hash(px) == h


def test_synth_bmp_media_near_dup_groups(spark):
    """Documents sharing a base-of-4 group are near-duplicates by
    construction: the pipeline finds them within small Hamming radius."""
    from smalltsdb_spark.operators.multimodal import (
        image_near_dup_pairs,
        synth_bmp_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(
            synth_bmp_media(docs), max_hamming=10
        ).collect()
    }
    # within-group pairs (0..3) and (4..7) all near
    for g in (0, 4):
        for a in range(g, g + 4):
            for b in range(a + 1, g + 4):
                assert (a, b) in pairs, (a, b, pairs)


def test_image_near_dup_pairs_materialized_equal(spark, tmp_path):
    """signature_path materialization (decode-once boundary) changes the
    physical plan, never the pairs."""
    from smalltsdb_spark.operators.multimodal import (
        image_near_dup_pairs,
        synth_bmp_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    media = synth_bmp_media(docs)
    lazy = sorted(
        tuple(r) for r in image_near_dup_pairs(media, max_hamming=10).collect()
    )
    mat = sorted(
        tuple(r)
        for r in image_near_dup_pairs(
            media, max_hamming=10, signature_path=str(tmp_path / "sig")
        ).collect()
    )
    assert lazy == mat and len(lazy) > 0


def test_energy_hash_properties():
    """Gain invariance (threshold scales with the signal), stereo mono
    mix, and sensitivity to envelope shape."""
    import numpy as np

    rng = np.random.RandomState(9)
    quiet = rng.randn(256) * 10.0
    loud_burst = quiet.copy()
    loud_burst[32:64] += 500.0  # one loud region → different contour

    h1 = multimodal.energy_hash(quiet)
    assert multimodal.energy_hash(quiet * 2.0) == h1  # gain-invariant
    assert multimodal.energy_hash(loud_burst) != h1

    stereo = np.empty(512)
    stereo[0::2] = quiet
    stereo[1::2] = quiet
    assert multimodal.energy_hash(stereo, n_channels=2) == h1


def test_synth_wav_round_trip():
    """The synthesized WAV is a spec-valid container the REAL decoder
    parses back to the closed-form samples."""
    import numpy as np

    payload = multimodal.synth_wav_payload(7)
    d = multimodal.decode_wav(payload)
    assert d["sample_rate"] == 8000 and d["bits"] == 16 and d["n_channels"] == 1
    base, hot, slope = 4, 3 * 13, 23 + (4 * 7) % 97
    expect = [
        ((base * 37 + k * slope + (1000 if k == hot else 0)) % 4001) - 2000
        for k in range(multimodal.SYNTH_WAV_SAMPLES)
    ]
    assert np.array_equal(d["_samples"], np.array(expect, dtype=np.float64))


def test_audio_near_dup_pairs(spark):
    """Groups of 4 consecutive ids are near-dups (Hamming <= 2); an
    undecodable payload is excluded, not fatal."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    media = multimodal.synth_wav_media(docs)
    broken = spark.createDataFrame(
        [(99, "audio", bytearray(b"not a wav"))],
        "media_id long, kind string, data binary",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ),
    )
    pairs = multimodal.audio_near_dup_pairs(
        media.unionByName(broken), max_hamming=2
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    import itertools

    for g in (range(0, 4), range(4, 8)):
        for a, b in itertools.combinations(g, 2):
            assert (a, b) in got, (a, b, got)
    assert not any(99 in p for p in got)
    # the two groups have different slopes → no cross-group pair
    assert not any(a < 4 <= b for a, b in got)


def test_synth_video_payload_closed_form():
    """Length and byte formulas match the oracle CTE exactly, ragged
    tails included (the partial-last-frame driver for mm_video_frames)."""
    for d in (0, 5, 17, 100):
        raw = multimodal.synth_video_payload(d)
        assert len(raw) == 256 + (d % 7) * 48 + (d % 29)
        assert all(raw[k] == (d * 13 + k * 7) % 256 for k in range(len(raw)))
    # determinism
    assert multimodal.synth_video_payload(17) == multimodal.synth_video_payload(17)


def test_frame_stats_matches_hand_computation(spark):
    """sample_frames -> frame_stats over synthetic video payloads equals
    a pure-python model: every 2nd 64-byte frame, partial tail kept,
    checksum = byte sum."""
    docs = spark.createDataFrame([(2,), (3,), (5,)], "doc_id long")
    media = multimodal.synth_video_media(docs)
    frames = multimodal.sample_frames(media, frame_bytes=64, every_n=2)
    got = {
        (r.media_id, r.frame_idx): (r.frame_len, r.checksum)
        for r in multimodal.frame_stats(frames).collect()
    }
    want = {}
    for d in (2, 3, 5):
        raw = multimodal.synth_video_payload(d)
        chunks = [raw[i : i + 64] for i in range(0, len(raw), 64)]
        for idx in range(0, len(chunks), 2):
            want[(d, idx)] = (len(chunks[idx]), sum(chunks[idx]))
    assert got == want
    # at least one payload must actually end mid-frame on a SAMPLED
    # frame, or the partial-tail path went untested
    assert any(fl < 64 for fl, _ in want.values())


def test_temporal_hash_group_structure(spark):
    """Groups of 4 share a base pattern with one boosted frame each:
    within-group temporal-hash Hamming <= 2, and video_near_dup_pairs
    finds every in-group pair at threshold 4 on a small corpus."""
    ids = list(range(16))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    media = multimodal.synth_video_group_media(docs)
    sigs = {
        r.media_id: r.thash for r in multimodal.thash_videos(media).collect()
    }
    # signatures match the pure-python model byte for byte
    for d in ids:
        assert sigs[d] == multimodal.temporal_hash_bytes(
            multimodal.synth_video_group_payload(d)
        )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.video_near_dup_pairs(media, max_hamming=4).collect()
    }
    for g in range(0, 16, 4):
        for a in range(g, g + 4):
            for b in range(a + 1, g + 4):
                assert ham(sigs[a], sigs[b]) <= 2
                assert (a, b) in pairs, f"in-group pair {(a, b)} missed"


def test_temporal_hash_short_stream_is_null():
    """A stream shorter than the 64x8 frame grid has no stable profile
    to threshold — hash to None, excluded from pairing."""
    assert multimodal.temporal_hash_bytes(b"x" * 100) is None
    assert multimodal.temporal_hash_bytes(
        multimodal.synth_video_group_payload(3)
    ) is not None


def test_dedup_by_media_hash(spark):
    """Keep-min-per-hash over a signature relation: non-keepers pair
    with their group's deterministic keeper; unique hashes drop out."""
    sig = spark.createDataFrame(
        [(5, 100), (3, 100), (9, 100), (7, 200), (1, 300), (2, 300)],
        "media_id long, ahash long",
    )
    got = sorted(
        map(tuple, multimodal.dedup_by_media_hash(sig).collect())
    )
    assert got == [(2, 1), (5, 3), (9, 3)]
