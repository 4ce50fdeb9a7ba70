"""Multimodal column plumbing: opaque binary media + typed metadata.

Design: media lives in a ``binary`` column next to a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
row-at-a-time Python.

The decode kernel (``decode_media``) is a REAL stdlib-only parser for
three concrete on-disk formats:

* ``image`` — binary PPM (``P6``): ASCII header (magic, width, height,
  maxval) followed by ``width*height*3`` raw pixel bytes.
* ``audio`` — canonical 44-byte RIFF/WAVE PCM header (chunk sizes,
  sample rate, bits-per-sample, data length) followed by raw samples;
  duration is derived from the parsed data length and byte rate.
* ``video`` — a tiny frame-stream container (magic ``PV01`` + u32
  frame count, then each frame as a complete embedded P6 image);
  duration is frame count over a fixed 4 fps.

``synthetic_media_table`` fabricates deterministic blobs in these
formats from ``doc_id`` alone, so a SQL oracle can recompute every
parsed feature (dimensions, byte counts, pixel checksums) from first
principles — the kernel only ever sees the bytes, which makes the
oracle comparison a genuine end-to-end test of the parser. Swapping in
PIL/ffmpeg for JPEG/MP3/MP4 later touches only ``decode_media``.

At 100 TB the media table is partitioned by ``media_type`` and bucketed
by id; ``mapInPandas`` keeps per-task memory at
``spark.sql.execution.arrow.maxRecordsPerBatch`` granularity, so giant
blobs stream batch-by-batch instead of materializing a partition.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

#: Fixed parameters of the synthetic formats (shared by the Python
#: generator, the parser's expectations, and the SQL oracle).
AUDIO_RATE = 8000          # Hz, mono, 8-bit PCM
VIDEO_FPS = 4.0            # frames per second
VIDEO_FRAME_W = 4
VIDEO_FRAME_H = 4

#: Output schema of the feature-extraction stage. ``pixel_sum`` /
#: ``n_vals`` are exact-integer content digests (sum and count of all
#: payload bytes the parser visited) — integers so the oracle
#: comparison has no float-rounding seam.
FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("pixel_sum", T.LongType()),
    T.StructField("n_vals", T.LongType()),
])


def media_table(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from the documents corpus:
    content = utf-8 bytes of the text (an opaque stand-in blob),
    media_type cycled by id, metadata struct with fake-but-typed fields.
    """
    c = F.col(text_col)
    # The isNotNull guard is load-bearing: Spark's element_at over a
    # LITERAL array with a NULL index does NOT return NULL — it
    # resolves to the last element (probed on 4.1: both a NULL id and
    # id=2 yield 'video') — while SQL list indexing with a NULL
    # subscript is NULL. A NULL id has no media type.
    mt = F.when(
        F.col(id_col).isNotNull(),
        F.element_at(F.array(*[F.lit(m) for m in MEDIA_TYPES]),
                     (F.col(id_col) % 3 + 1).cast("int")))
    return docs.select(
        F.col(id_col),
        mt.alias("media_type"),
        F.encode(c, "UTF-8").alias("content"),
        F.struct(
            F.length(c).cast("long").alias("n_bytes"),
            (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
            (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
            (F.col(id_col) % 300 / 10.0).alias("duration_s"),
        ).alias("meta"),
    )


def encode_media(doc_id: int) -> tuple[str, bytes]:
    """Fabricate a deterministic, REAL-format media blob from the id.

    Formats match what ``decode_media`` parses (module docstring). All
    payload bytes follow closed-form formulas of ``doc_id`` so a SQL
    oracle can recompute the parser's outputs without seeing the bytes.
    """
    m = doc_id % 3
    if m == 0:                                   # image: binary PPM (P6)
        w, h = doc_id % 16 + 1, doc_id % 12 + 1
        pixels = bytes((doc_id * 31 + i * 7) % 256 for i in range(w * h * 3))
        return "image", b"P6\n%d %d\n255\n" % (w, h) + pixels
    if m == 1:                                   # audio: 44-byte WAV PCM
        n = doc_id % 2000 + 1                    # mono 8-bit samples
        samples = bytes((doc_id * 17 + i * 5) % 256 for i in range(n))
        hdr = (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, AUDIO_RATE,
                                       AUDIO_RATE * 1 * 1, 1, 8)
               + b"data" + struct.pack("<I", n))
        return "audio", hdr + samples
    k = doc_id % 8 + 1                           # video: PV01 frame stream
    frames = []
    npix = VIDEO_FRAME_W * VIDEO_FRAME_H * 3
    for f in range(k):
        pix = bytes((doc_id * 13 + f * 19 + i * 7) % 256
                    for i in range(npix))
        frames.append(b"P6\n%d %d\n255\n" % (VIDEO_FRAME_W, VIDEO_FRAME_H)
                      + pix)
    return "video", b"PV01" + struct.pack(">I", k) + b"".join(frames)


def _parse_ppm(blob: bytes, offset: int = 0) -> tuple[int, int, bytes, int]:
    """Parse one binary PPM (P6) image starting at ``offset``. Returns
    (width, height, pixel_bytes, next_offset). Raises ValueError on a
    malformed header or truncated pixel data."""
    if blob[offset:offset + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = offset + 2, []
    while len(fields) < 3:                       # width, height, maxval
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":            # comment line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1                                     # single ws after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    end = pos + w * h * 3
    if end > len(blob):
        raise ValueError("truncated PPM pixel data")
    return w, h, blob[pos:end], end


def _parse_wav(blob: bytes) -> tuple[int, int, int, bytes]:
    """Parse a canonical RIFF/WAVE PCM file. Returns (sample_rate,
    channels, bits_per_sample, data_bytes)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos:pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            # Validate before unpacking/dividing so every malformed-fmt
            # shape surfaces as the documented ValueError (not
            # struct.error on a short body or ZeroDivisionError in the
            # caller's frame-count arithmetic).
            if len(body) < 16:
                raise ValueError(f"fmt chunk too short ({len(body)} bytes)")
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1:
                raise ValueError(f"not PCM (fmt={fmt})")
            if channels < 1 or bits < 8 or rate < 1:
                raise ValueError(
                    f"malformed fmt chunk (channels={channels}, "
                    f"bits={bits}, rate={rate})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)             # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, bits, data


def decode_media(blob: bytes) -> dict:
    """REAL decode kernel: dispatch on magic bytes, parse the container
    for true dimensions/duration, and digest the payload bytes. The
    media type is *detected from the bytes*, never trusted from
    metadata. Raises ValueError for unrecognized or malformed blobs."""
    import hashlib
    out = {
        "n_bytes": len(blob),
        "checksum": hashlib.sha1(blob).hexdigest()[:16],
        "width": 0, "height": 0, "duration_s": 0.0,
    }
    if blob[:2] == b"P6":
        w, h, pix, _ = _parse_ppm(blob)
        out.update(media_type="image", width=w, height=h,
                   pixel_sum=sum(pix), n_vals=len(pix))
    elif blob[:4] == b"RIFF":
        rate, channels, bits, data = _parse_wav(blob)
        n_frames = len(data) // (channels * (bits // 8))
        out.update(media_type="audio", duration_s=n_frames / rate,
                   pixel_sum=sum(data), n_vals=len(data))
    elif blob[:4] == b"PV01":
        (k,) = struct.unpack_from(">I", blob, 4)
        pos, psum, nvals, w, h = 8, 0, 0, 0, 0
        for _ in range(k):
            w, h, pix, pos = _parse_ppm(blob, pos)
            psum += sum(pix)
            nvals += len(pix)
        out.update(media_type="video", width=w, height=h,
                   duration_s=k / VIDEO_FPS, pixel_sum=psum, n_vals=nvals)
    else:
        raise ValueError(f"unrecognized media magic {blob[:4]!r}")
    return out


def synthetic_media_table(docs: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """Real-format media table: one deterministic PPM/WAV/PV01 blob per
    document, generated Arrow-batch-at-a-time (the generation itself is
    a mapInPandas stage, so blob bytes are born on the executors and
    never pass through the driver).

    NULL contract (r14, null-audit class A): a blob cannot be
    fabricated from a missing id, so NULL ids are excluded by an
    explicit plan-visible filter (pushed to the scan) — an oracle
    recomputing features from the id formulas must carry the same
    ``doc_id IS NOT NULL``. The kernel itself also skips NULLs
    (belt-and-braces: a single NULL id reaching ``int()`` would
    otherwise kill the whole job at scale).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col] if pd.notna(i)]
            made = [encode_media(i) for i in ids]
            yield pd.DataFrame({
                "doc_id": ids,
                "media_type": [m for m, _ in made],
                "content": [b for _, b in made],
            })

    return docs.select(id_col).where(F.col(id_col).isNotNull()) \
        .mapInPandas(
            run, schema="doc_id long, media_type string, content binary")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each task receives pandas batches (bytes already
    Arrow-transferred, zero-copy where possible), runs the decode
    kernel per blob, and emits the typed feature schema. ``media_type``
    in the output is what the PARSER detected from the magic bytes —
    comparing it against the metadata column (or an oracle) catches
    mislabeled blobs.

    Null-total (1:1 contract): a NULL blob keeps its row with every
    feature NULL — decoding nothing yields no features, and a raising
    kernel would let one bad row kill a 100 TB job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        null_feats = dict.fromkeys(
            (f.name for f in FEATURE_SCHEMA.fields[1:]), None)
        for pdf in batches:
            feats = [decode_media(bytes(blob)) if blob is not None
                     else dict(null_feats)
                     for blob in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.select("doc_id", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = 2) -> DataFrame:
    """REAL frame sampling: parse each video row's PV01 container,
    keep every ``stride``-th frame, and re-emit each kept frame as a
    standalone P6 image blob — the explode-shaped (1→many) media stage
    a vision pipeline feeds to per-frame featurizers.

    The emitted width/height/pixel sums come from RE-PARSING the
    freshly written P6 blob (``decode_media``), so every output row
    has made the full writer→parser round trip — the same
    end-to-end-honesty contract as ``extract_features``. Fan-out per
    input row is ceil(n_frames/stride), bounded by the container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "frame_idx", "ts_s", "width", "height",
                "pixel_sum", "content")}
            for did, mt, blob in zip(pdf["doc_id"], pdf["media_type"],
                                     pdf["content"]):
                if mt != "video" or blob is None:
                    continue      # null-total: no container, no frames
                blob = bytes(blob)
                (k,) = struct.unpack_from(">I", blob, 4)
                pos = 8
                for f in range(k):
                    w, h, pix, pos = _parse_ppm(blob, pos)
                    if f % stride:
                        continue
                    fr = b"P6\n%d %d\n255\n" % (w, h) + pix
                    d = decode_media(fr)           # writer->parser loop
                    out["doc_id"].append(did)
                    out["frame_idx"].append(f)
                    out["ts_s"].append(f / VIDEO_FPS)
                    out["width"].append(d["width"])
                    out["height"].append(d["height"])
                    out["pixel_sum"].append(d["pixel_sum"])
                    out["content"].append(fr)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema=("doc_id long, frame_idx int, ts_s double, "
                     "width int, height int, pixel_sum long, "
                     "content binary"))


def resize(media: DataFrame, out_w: int = 8, out_h: int = 6) -> DataFrame:
    """REAL nearest-neighbor image resize: parse each image row's P6
    pixels, resample to ``out_w``×``out_h`` with the integer mapping
    src_x = (x*W)//out_w (exact, SQL-replayable), and re-emit a valid
    P6 blob. The numpy fancy-index does the resample per Arrow batch —
    no per-pixel Python in the hot loop.

    Post-conditions the pipeline relies on: every output blob is a
    parseable P6 of exactly out_w×out_h (fixed tensor stride
    downstream), verified per row by re-parsing the emitted blob.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "width", "height", "pixel_sum", "content")}
            for did, mt, blob in zip(pdf["doc_id"], pdf["media_type"],
                                     pdf["content"]):
                if mt != "image" or blob is None:
                    continue      # null-total: no pixels, no resample
                w, h, pix, _ = _parse_ppm(bytes(blob))
                arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                res = arr[ys][:, xs]
                fr = (b"P6\n%d %d\n255\n" % (out_w, out_h)
                      + res.tobytes())
                d = decode_media(fr)               # writer->parser loop
                out["doc_id"].append(did)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["pixel_sum"].append(d["pixel_sum"])
                out["content"].append(fr)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema=("doc_id long, width int, height int, "
                     "pixel_sum long, content binary"))


def resample_audio(media: DataFrame, target_rate: int = 4000) -> DataFrame:
    """REAL audio resample: parse each audio row's PCM payload,
    nearest-neighbor-pick samples at ``target_rate`` (integer mapping
    src = (j*n)//m over m = n*target_rate//rate output samples — the
    same exact-arithmetic contract as ``resize``), and re-emit a valid
    RIFF/WAVE blob at the new rate, re-parsed for its stats.

    Mono 8-bit PCM only (what the synthetic corpus carries); other
    layouts raise the parser's documented ValueError upstream.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "rate", "n_samples", "duration_s",
                "sample_sum", "content")}
            for did, mt, blob in zip(pdf["doc_id"], pdf["media_type"],
                                     pdf["content"]):
                if mt != "audio" or blob is None:
                    continue      # null-total: no samples, no resample
                rate, channels, bits, data = _parse_wav(bytes(blob))
                n = len(data)
                m = (n * target_rate) // rate
                arr = np.frombuffer(data, dtype=np.uint8)
                picked = (arr[(np.arange(m) * n) // m].tobytes()
                          if m > 0 else b"")
                hdr = (b"RIFF" + struct.pack("<I", 36 + m) + b"WAVE"
                       + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1,
                                               target_rate, target_rate,
                                               1, 8)
                       + b"data" + struct.pack("<I", m))
                fr = hdr + picked
                d = decode_media(fr)               # writer->parser loop
                out["doc_id"].append(did)
                out["rate"].append(target_rate)
                out["n_samples"].append(d["n_vals"])
                out["duration_s"].append(d["duration_s"])
                out["sample_sum"].append(d["pixel_sum"])
                out["content"].append(fr)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema=("doc_id long, rate int, n_samples long, "
                     "duration_s double, sample_sum long, content binary"))


def ahash_bands(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) each image as FOUR 16-bit band keys.

    The classic perceptual hash: NN-resize the image to 8x8 with the
    exact integer mapping ``src = (dst * size) // 8`` (the same
    SQL-replayable rule :func:`resize` uses), gray = (r+g+b) DIV 3,
    threshold each cell against the integer mean (strict >), giving 64
    bits. Bits are emitted as 4 x 16-bit ints (``b0``..``b3``, bit s
    of the hash = bit ``s - 16k`` of band ``s // 16``) rather than one
    BIGINT: bit 63 would overflow a signed shift in SQL replays, and
    the banded layout is directly the LSH bucket key a near-dup join
    needs — identical images share all four, near-identical images
    (<=16 differing bits in the worst spread) share at least one.

    Pure-integer spec end to end, so the DuckDB oracle recomputes every
    band from the synthetic blob formulas without seeing the bytes —
    the same closed-form contract as decode/resize.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "b0", "b1", "b2", "b3")}
            for did, mt, blob in zip(pdf["doc_id"], pdf["media_type"],
                                     pdf["content"]):
                if mt != "image" or blob is None:
                    continue      # null-total: no pixels, no hash
                w, h, pix, _ = _parse_ppm(bytes(blob))
                arr = np.frombuffer(pix, dtype=np.uint8) \
                    .reshape(h, w, 3).astype(np.int64)
                gray = arr.sum(axis=2) // 3            # (r+g+b) DIV 3
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                cells = gray[ys][:, xs].reshape(-1)    # row-major, s=y*8+x
                mean = int(cells.sum()) // 64
                bits = (cells > mean).astype(np.int64)
                bands = [int((bits[k * 16:(k + 1) * 16]
                              << np.arange(16)).sum()) for k in range(4)]
                out["doc_id"].append(did)
                for k in range(4):
                    out[f"b{k}"].append(bands[k])
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "content").mapInPandas(
        run, schema="doc_id long, b0 int, b1 int, b2 int, b3 int")


def ahash_pairs(hashes: DataFrame, max_dist: int = 6) -> DataFrame:
    """Near-duplicate image pairs from banded aHashes.

    Candidate pairs share at least one 16-bit band (one explode + one
    key-equi self-join — never all-pairs); candidates are verified by
    the exact Hamming distance, summed per band with xor + bit_count
    inside codegen. A pair with <= max_dist differing bits among 64
    must agree exactly on some band once max_dist < 4 bands' worth of
    spread; for max_dist <= 15 the four-band scheme misses only pairs
    whose differing bits land in all four bands — the standard LSH
    recall trade the MinHash/SimHash tiers document.

    Returns (a, b, dist), a < b, distinct.
    """
    bands = hashes.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.explode(F.array([
            F.struct(F.lit(k).alias("band"),
                     F.col(f"b{k}").alias("key")) for k in range(4)
        ])).alias("bk")).select("doc_id", "b0", "b1", "b2", "b3",
                                "bk.band", "bk.key")
    left = bands
    right = bands.select(*[F.col(c).alias(f"r_{c}")
                           for c in bands.columns])
    cand = (left.join(right,
                      (F.col("band") == F.col("r_band"))
                      & (F.col("key") == F.col("r_key"))
                      & (F.col("doc_id") < F.col("r_doc_id")))
            .select(F.col("doc_id").alias("a"),
                    F.col("r_doc_id").alias("b"),
                    *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
                    *[F.col(f"r_b{k}").alias(f"rb{k}") for k in range(4)])
            .distinct())
    dist = sum(F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"rb{k}")))
               for k in range(4))
    return (cand.select("a", "b", dist.cast("int").alias("dist"))
            .where(F.col("dist") <= max_dist))


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL loudness statistics per audio row: parse the RIFF/WAVE PCM
    payload and emit (doc_id, n_samples, peak_dev, sum_sq) where
    samples are centered on the 8-bit midpoint (128) — peak_dev is the
    max absolute deviation, sum_sq the integer energy (RMS^2 * n).
    All-integer outputs, so the DuckDB oracle can recompute them from
    the closed-form synthetic-blob formulas and a hash match certifies
    the parser + the vectorized numpy reduction end to end.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "n_samples", "peak_dev", "sum_sq")}
            for did, mt, blob in zip(pdf["doc_id"], pdf["media_type"],
                                     pdf["content"]):
                if mt != "audio" or blob is None:
                    continue      # null-total: no payload, no stats
                _rate, _ch, _bits, data = _parse_wav(bytes(blob))
                d = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
                out["doc_id"].append(did)
                out["n_samples"].append(len(d))
                out["peak_dev"].append(int(np.abs(d).max()) if len(d) else 0)
                out["sum_sq"].append(int((d * d).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, "doc_id long, n_samples long, peak_dev long, sum_sq long")
