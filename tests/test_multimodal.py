"""Multimodal plumbing: Arrow-batch kernels must preserve row identity,
produce the declared schema, and honor their size/cardinality
invariants; the decode kernel is a real PPM/WAV/PV01 parser and must
round-trip the deterministic generator exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_analysis_spark.operators import multimodal as M


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    return M.media_table(docs)


def test_decode_kernel_roundtrips_generator():
    """Pure-Python: every generated blob parses back to its generation
    parameters, for all three formats and a spread of ids."""
    for doc_id in list(range(24)) + [97, 1000, 4321, 65535]:
        mt, blob = M.encode_media(doc_id)
        got = M.decode_media(blob)
        assert got["media_type"] == mt
        assert got["n_bytes"] == len(blob)
        if mt == "image":
            w, h = doc_id % 16 + 1, doc_id % 12 + 1
            assert (got["width"], got["height"]) == (w, h)
            assert got["n_vals"] == w * h * 3
            assert got["duration_s"] == 0.0
        elif mt == "audio":
            n = doc_id % 2000 + 1
            assert got["n_vals"] == n
            assert got["duration_s"] == n / M.AUDIO_RATE
        else:
            k = doc_id % 8 + 1
            assert got["n_vals"] == k * 48
            assert got["duration_s"] == k / M.VIDEO_FPS
        if mt == "image":
            expect = sum((doc_id * 31 + i * 7) % 256
                         for i in range(got["n_vals"]))
        elif mt == "audio":
            expect = sum((doc_id * 17 + i * 5) % 256
                         for i in range(got["n_vals"]))
        else:
            k = doc_id % 8 + 1
            expect = sum((doc_id * 13 + f * 19 + i * 7) % 256
                         for f in range(k) for i in range(48))
        assert got["pixel_sum"] == expect


def test_decode_kernel_rejects_malformed():
    with pytest.raises(ValueError):
        M.decode_media(b"GIF89a not supported")
    with pytest.raises(ValueError):
        M.decode_media(b"P6\n4 4\n255\n\x00\x01")      # truncated pixels
    with pytest.raises(ValueError):
        M.decode_media(b"RIFF\x00\x00\x00\x00WAVE")    # no fmt/data

    def wav(fmt=1, channels=1, rate=8000, bits=8, fmt_len=16):
        import struct
        body = struct.pack("<HHIIHH", fmt, channels, rate,
                           rate * channels * (bits // 8 or 1),
                           channels * (bits // 8 or 1), bits)[:fmt_len]
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + 4)
                + b"WAVE" + b"fmt " + struct.pack("<I", len(body)) + body
                + b"data" + struct.pack("<I", 4) + b"\x01\x02\x03\x04")

    assert M.decode_media(wav())["media_type"] == "audio"  # template sane
    # every malformed-fmt shape must be the DOCUMENTED ValueError, not
    # ZeroDivisionError / struct.error escaping a mapInPandas task
    for bad in (wav(channels=0), wav(bits=0), wav(bits=4),
                wav(rate=0), wav(fmt_len=10)):
        with pytest.raises(ValueError):
            M.decode_media(bad)


def test_extract_features_schema_and_identity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = M.synthetic_media_table(docs)
    feats = M.extract_features(media)
    assert [f.name for f in feats.schema.fields] == \
        [f.name for f in M.FEATURE_SCHEMA.fields]
    assert feats.count() == media.count()          # 1:1, no drops
    # parser-detected type must agree with the generator's label
    joined = feats.alias("f").join(media.alias("m"), "doc_id")
    assert joined.where(
        F.col("f.media_type") != F.col("m.media_type")).count() == 0
    # checksum is deterministic: same input → same output across runs
    a = {r["doc_id"]: r["checksum"] for r in feats.collect()}
    b = {r["doc_id"]: r["checksum"] for r in M.extract_features(media).collect()}
    assert a == b


def test_frame_sample_real_frames(spark, sf_dir):
    """Every sampled frame is a parseable standalone P6 whose stats
    equal the source video's embedded frame; stride-2 keeps exactly
    the even frame indices; timestamps follow the 4 fps contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = M.synthetic_media_table(docs)
    frames = M.frame_sample(media, stride=2).collect()
    assert frames
    for r in frames:
        assert r["frame_idx"] % 2 == 0
        assert r["ts_s"] == r["frame_idx"] / 4.0
        d = M.decode_media(bytes(r["content"]))    # standalone parse
        assert d["media_type"] == "image"
        assert (d["width"], d["height"]) == (r["width"], r["height"])
        assert d["pixel_sum"] == r["pixel_sum"]
    # per-doc fan-out = ceil(n_frames / 2) with n_frames = doc_id%8+1
    import collections
    per = collections.Counter(r["doc_id"] for r in frames)
    for did, n in per.items():
        assert n == (did % 8 + 1 + 1) // 2


def test_resize_real_nearest_neighbor(spark, sf_dir):
    """Resized blobs are valid 8x6 P6 images, and the resampled pixels
    equal a reference nearest-neighbor resample of the source."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = M.synthetic_media_table(docs)
    out = {r["doc_id"]: r for r in M.resize(media, out_w=8, out_h=6)
           .collect()}
    src = {r["doc_id"]: bytes(r["content"])
           for r in media.where(F.col("media_type") == "image").collect()}
    assert set(out) == set(src)
    for did, r in out.items():
        d = M.decode_media(bytes(r["content"]))
        assert (d["width"], d["height"]) == (8, 6) == \
            (r["width"], r["height"])
        w, h, pix, _ = M._parse_ppm(src[did])
        want = 0
        for y in range(6):
            sy = (y * h) // 6
            for x in range(8):
                sx = (x * w) // 8
                base = (sy * w + sx) * 3
                want += pix[base] + pix[base + 1] + pix[base + 2]
        assert r["pixel_sum"] == want


def test_resample_audio_real(spark, sf_dir):
    """Resampled blobs are valid 4 kHz WAVs whose samples equal a
    reference nearest-neighbor pick from the source payload."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = M.synthetic_media_table(docs)
    out = {r["doc_id"]: r for r in
           M.resample_audio(media, target_rate=4000).collect()}
    src = {r["doc_id"]: bytes(r["content"])
           for r in media.where(F.col("media_type") == "audio").collect()}
    assert set(out) == set(src)
    for did, r in out.items():
        d = M.decode_media(bytes(r["content"]))
        assert d["media_type"] == "audio"
        rate, ch, bits, data = M._parse_wav(src[did])
        n = len(data)
        m = (n * 4000) // rate
        assert r["n_samples"] == m == d["n_vals"]
        assert r["duration_s"] == m / 4000.0
        want = sum(data[(j * n) // m] for j in range(m)) if m else 0
        assert r["sample_sum"] == want


def _ppm(w, h, pix):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(pix)


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(i, "image", bytearray(b)) for i, b in rows],
        "doc_id long, media_type string, content binary")


def _py_ahash(w, h, pix):
    """Pure-Python replay of the ahash_bands integer spec."""
    grays = []
    for s in range(64):
        x, y = s % 8, s // 8
        sx, sy = (x * w) // 8, (y * h) // 8
        base = (sy * w + sx) * 3
        grays.append((pix[base] + pix[base + 1] + pix[base + 2]) // 3)
    mean = sum(grays) // 64
    bits = [1 if g > mean else 0 for g in grays]
    return [sum(bits[k * 16 + i] << i for i in range(16))
            for k in range(4)]


def test_ahash_matches_python_replay(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for did, (w, h) in enumerate([(16, 12), (8, 8), (3, 5), (1, 1)]):
        pix = [rnd.randrange(256) for _ in range(w * h * 3)]
        rows.append((did, (w, h, pix)))
    df = _media_df(spark, [(d, _ppm(w, h, pix)) for d, (w, h, pix) in rows])
    got = {r["doc_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
           for r in M.ahash_bands(df).collect()}
    for d, (w, h, pix) in rows:
        assert got[d] == _py_ahash(w, h, pix), d


def test_ahash_pairs_find_planted_neardup(spark):
    import random

    rnd = random.Random(11)
    base = [rnd.randrange(256) for _ in range(16 * 12 * 3)]
    tweaked = list(base)
    tweaked[0] = (tweaked[0] + 120) % 256     # one corner pixel changed
    inverted = [255 - v for v in base]        # structurally different
    df = _media_df(spark, [
        (1, _ppm(16, 12, base)),
        (2, _ppm(16, 12, tweaked)),
        (3, _ppm(16, 12, inverted)),
    ])
    hashes = M.ahash_bands(df)
    pairs = {(r["a"], r["b"]): r["dist"]
             for r in M.ahash_pairs(hashes, max_dist=6).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 2          # only one resampled cell moved
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ahash_pairs_identical_images_distance_zero(spark):
    pix = [(i * 37) % 256 for i in range(8 * 8 * 3)]
    df = _media_df(spark, [(5, _ppm(8, 8, pix)), (9, _ppm(8, 8, pix))])
    pairs = M.ahash_pairs(M.ahash_bands(df), max_dist=0).collect()
    assert [(r["a"], r["b"], r["dist"]) for r in pairs] == [(5, 9, 0)]


def test_audio_stats_python_replay(spark, sf_dir):
    """The Spark kernel's integer loudness stats equal a direct Python
    replay over the same synthetic blobs."""
    from twitter_analysis_spark.operators import multimodal as M
    from twitter_analysis_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    got = {r.doc_id: (r.n_samples, r.peak_dev, r.sum_sq) for r in
           M.audio_stats(M.synthetic_media_table(docs)).collect()}
    assert got
    for did, (n, peak, ssq) in got.items():
        _mt, blob = M.encode_media(did)
        _r, _c, _b, data = M._parse_wav(blob)
        dev = [abs(b - 128) for b in data]
        assert (n, peak, ssq) == (len(data), max(dev),
                                  sum((b - 128) ** 2 for b in data))


def test_kernels_are_null_total(spark):
    """r14 NULL contract: NULL ids never reach the blob generator,
    NULL blobs never reach a parser — extract_features keeps the row
    with NULL features (1:1), the explode-shaped kernels skip it, and
    nothing raises."""
    media = M.synthetic_media_table(
        spark.createDataFrame([(0,), (None,), (1,), (2,)], "doc_id long"))
    assert media.where(F.col("doc_id").isNull()).count() == 0

    # hand-plant NULL blobs/types next to real rows
    planted = media.unionByName(spark.createDataFrame(
        [(99, "image", None), (98, None, None)],
        "doc_id long, media_type string, content binary"))
    feats = {r["doc_id"]: r["n_bytes"]
             for r in M.extract_features(planted).collect()}
    assert set(feats) == {0, 1, 2, 98, 99}       # 1:1, no rows lost
    assert feats[99] is None and feats[98] is None
    assert feats[0] is not None
    for fn in (M.resize, M.resample_audio, M.frame_sample,
               M.ahash_bands, M.audio_stats):
        out = fn(planted).collect()              # must not raise
        assert all(r["doc_id"] not in (98, 99) for r in out)


def test_media_table_null_id_has_no_media_type(spark):
    """Spark's element_at over a literal array resolves a NULL index
    to the LAST element (probed on 4.1) — media_table must guard it."""
    docs = spark.createDataFrame([(None, "t"), (2, "t")],
                                 "doc_id long, text string")
    rows = {r["doc_id"]: r["media_type"]
            for r in M.media_table(docs).collect()}
    assert rows[None] is None
    assert rows[2] == "video"
