"""Multimodal column plumbing: schema, Arrow-batched decode stage, frame
sampling. The decode kernel is a documented stub (no codecs in container) —
the Spark-side contracts are what's under test."""

import pytest
from pyspark.sql import functions as F

from bustub_vectordb_spark.multimodal import (
    attach_fake_media,
    decode_and_featurize,
    frame_sample,
    media_metadata,
)


@pytest.fixture(scope="module")
def media(tables):
    return attach_fake_media(tables["documents"].limit(50), "doc_id", kind="video")


def test_media_schema(media):
    assert dict(media.dtypes)["media"] == "binary"
    meta_type = dict(media.dtypes)["media_meta"]
    assert "format" in meta_type and "n_frames" in meta_type


def test_metadata_pass_is_native(media):
    out = media_metadata(media)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    rows = out.select("media_bytes", "media_sha").collect()
    assert all(r["media_bytes"] == 32 for r in rows)  # 256-bit digest → 32 bytes


def test_decode_featurize_batch_shape(media):
    out = decode_and_featurize(media)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same input → same features
    again = decode_and_featurize(media).collect()
    assert rows[0]["features"] == again[0]["features"]


def test_frame_sample_counts(media):
    out = frame_sample(media, every_n=10)
    got = out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    meta = {r["doc_id"]: r["media_meta"]["n_frames"] for r in media.collect()}
    for r in got:
        expect = (max(meta[r["doc_id"]] - 1, 0)) // 10 + 1
        assert r["n"] == expect


def _mk_wav(freq=440, sr=8000, n=800):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq * i / sr)))
                for i in range(n)
            )
        )
    return buf.getvalue()


def _mk_bmp(w=8, h=8):
    import struct

    rowsz = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(w):
            v = 255 if (x + y) % 2 == 0 else 0
            row += bytes([v, v, v])
        row += b"\x00" * (rowsz - len(row))
        data += row
    off = 54
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return bytes(hdr + dib + data)


def _mk_ppm(w=8, h=8):
    px = bytes(
        b for y in range(h) for x in range(w) for b in ([255, 0, 0] if x < w // 2 else [0, 0, 255])
    )
    return b"P6\n%d %d\n255\n" % (w, h) + px


def _mk_png(w=8, h=8, channels=3, filters=(0,), seed=7):
    """Minimal PNG encoder (stdlib struct/zlib): 8-bit, chosen per-row
    filter types — returns (payload, raw_image) so tests can compare the
    decoder's grid against the ground-truth pixels."""
    import struct
    import zlib

    import numpy as np

    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, channels), dtype=np.uint8
    )
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    flat = img.reshape(h, stride).astype(int)
    raw = bytearray()
    for y in range(h):
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(stride):
            a = flat[y][x - channels] if x >= channels else 0
            b = flat[y - 1][x] if y else 0
            c = flat[y - 1][x - channels] if (y and x >= channels) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((flat[y][x] - pred) % 256)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    return payload, img


def test_png_decoder_all_filters_and_color_types():
    """The pure stdlib+numpy PNG kernel must invert every scanline filter
    type (None/Sub/Up/Average/Paeth) for gray, gray+alpha, RGB and RGBA —
    grid values checked against the ground-truth pixels, not just shape."""
    import numpy as np

    from bustub_vectordb_spark.multimodal.binary import _decode_png

    for channels in (1, 2, 3, 4):
        payload, img = _mk_png(
            w=10, h=9, channels=channels, filters=(0, 1, 2, 3, 4), seed=channels
        )
        got = _decode_png(payload)
        px = img.astype(np.float64)
        gray = px[:, :, : min(3, channels) if channels != 2 else 1].mean(axis=2)
        gy = np.array_split(np.arange(9), 4)
        gx = np.array_split(np.arange(10), 4)
        want = [float(gray[np.ix_(ys, xs)].mean() / 255.0) for ys in gy for xs in gx]
        assert got == pytest.approx(want, abs=1e-12), f"channels={channels}"

    # unsupported variants raise (palette type 3) → fake-fallback path
    payload, _ = _mk_png(channels=3)
    bad = bytearray(payload)
    bad[8 + 8 + 9] = 3  # IHDR color_type byte → palette
    with pytest.raises(ValueError):
        _decode_png(bytes(bad))


def _mk_gif(w=8, h=8, interlace=False, seed=5):
    """Minimal GIF89a encoder: grayscale 256-entry palette, LZW stream of
    literal codes with periodic CLEARs (the classic 'uncompressed GIF'
    technique — keeps the code width pinned at 9 bits), optional interlace.
    Returns (payload, index_image)."""
    import struct

    import numpy as np

    img = np.random.RandomState(seed).randint(0, 256, size=(h, w), dtype=np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    out += bytes(b for i in range(256) for b in (i, i, i))  # gray palette
    # a Graphics Control Extension the decoder must skip
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        pix = img[order].flatten()
    else:
        pix = img.flatten()
    clear, end = 256, 257
    codes = [clear]
    for i, p in enumerate(pix):
        if i and i % 100 == 0:
            codes.append(clear)  # dict stays < 512 → width stays 9
        codes.append(int(p))
    codes.append(end)
    acc = nbits = 0
    data = bytearray()
    for c in codes:  # 9-bit codes, LSB-first
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    out.append(8)  # LZW min code size
    for i in range(0, len(data), 255):
        sub = data[i : i + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00\x3b"
    return bytes(out), img


def test_gif_decoder_plain_and_interlaced():
    """The pure stdlib+numpy GIF kernel: LZW codestream, palette lookup,
    extension skipping, and 4-pass de-interlacing — grid values checked
    against the ground-truth index image (gray palette: index == gray)."""
    import numpy as np

    from bustub_vectordb_spark.multimodal.binary import _decode_gif

    for interlace in (False, True):
        payload, img = _mk_gif(w=10, h=9, interlace=interlace, seed=11)
        got = _decode_gif(payload)
        gray = img.astype(np.float64)
        gy = np.array_split(np.arange(9), 4)
        gx = np.array_split(np.arange(10), 4)
        want = [float(gray[np.ix_(ys, xs)].mean() / 255.0) for ys in gy for xs in gx]
        assert got == pytest.approx(want, abs=1e-12), f"interlace={interlace}"

    with pytest.raises(ValueError):
        _decode_gif(b"GIF89a" + b"\x00" * 7)  # truncated: no image data


def test_gif_lzw_real_compression_roundtrip():
    """The decoder must also handle REAL LZW streams (dict growth, KwKwK
    case, width escalation) — exercised with a reference LZW compressor
    implemented independently in the test."""
    import numpy as np

    from bustub_vectordb_spark.multimodal.binary import _gif_lzw

    rng = np.random.RandomState(3)
    # repetitive data drives dict growth + the KwKwK pattern
    pix = list(rng.randint(0, 4, size=500)) + [1, 1, 1, 1, 1, 1] * 40
    min_code = 2
    clear, end = 1 << min_code, (1 << min_code) + 1

    # textbook GIF-LZW compressor
    table = {(i,): i for i in range(clear)}
    next_code, width = end + 1, min_code + 1
    codes, cur = [clear], ()
    for p in pix:
        if cur + (p,) in table:
            cur = cur + (p,)
            continue
        codes.append(table[cur])
        if next_code < 4096:
            table[cur + (p,)] = next_code
            next_code += 1
        cur = (p,)
    if cur:
        codes.append(table[cur])
    codes.append(end)

    data = bytearray()
    acc = nbits = 0
    next_code, width = end + 1, min_code + 1
    prev_data = False  # decoder adds NO entry on the first data code
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # mirror the decoder's width schedule exactly: it adds an entry on
        # every data code EXCEPT the first after a clear, and bumps the
        # width when its next slot reaches 2^width
        if c == clear:
            next_code, width, prev_data = end + 1, min_code + 1, False
        elif c != end:
            if prev_data and next_code < 4096:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev_data = True
    if nbits:
        data.append(acc & 0xFF)

    got = _gif_lzw(bytes(data), min_code, len(pix))
    assert got == pix


def test_real_decoders_via_spark_stage(spark):
    """Real WAV/BMP/PPM payloads decode to real features through the same
    Arrow-batched mapInPandas stage the fake path uses."""
    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from bustub_vectordb_spark.multimodal.binary import MEDIA_META_SCHEMA

    png_payload, png_img = _mk_png(filters=(0, 1, 2, 3, 4))
    rows = [
        (1, _mk_wav(), ("audio", 0, 0, 1, 8000)),
        (2, _mk_bmp(), ("image", 8, 8, 1, 0)),
        (3, _mk_ppm(), ("image", 8, 8, 1, 0)),
        (4, b"\x00garbage", ("image", 0, 0, 1, 0)),
        (5, png_payload, ("image", 8, 8, 1, 0)),
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_SCHEMA),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = {r["doc_id"]: r["features"] for r in decode_and_featurize(df).collect()}
    assert all(len(v) == 16 for v in out.values())
    # WAV: constant-amplitude sine → all 16 RMS bands equal and positive
    wavf = out[1]
    assert wavf[0] > 0.1 and max(wavf) - min(wavf) < 0.05
    # BMP checkerboard: every 4x4 cell averages mid-gray
    assert all(abs(v - 0.5) < 0.26 for v in out[2])
    # PPM half red / half blue: left cells and right cells same grayscale
    assert abs(out[3][0] - out[3][3]) < 1e-9
    # garbage falls back to the deterministic fake (still 16 floats in [0,1])
    assert all(0.0 <= v <= 1.0 for v in out[4])
    # PNG: real decode — overall mean matches the ground-truth pixel mean
    import numpy as np

    want_mean = float(png_img.astype(np.float64).mean(axis=2).mean() / 255.0)
    assert abs(sum(out[5]) / 16 - want_mean) < 0.02


def test_jpeg_decoder_bit_exact_gray_and_420():
    """The baseline-JPEG kernel (T.81 huffman + dequant + IDCT) must
    reproduce the encoder-implied reconstruction BIT-EXACTLY: the pure
    python encoder (multimodal/synth.encode_jpeg) returns the pixel planes
    its quantized coefficients imply, and the decoder must land on exactly
    those float64 values — gray, and YCbCr 4:2:0 with non-MCU-multiple
    dimensions and restart markers."""
    import random

    import numpy as np

    from bustub_vectordb_spark.multimodal.binary import _decode_jpeg, _jpeg_pixels
    from bustub_vectordb_spark.multimodal.synth import encode_jpeg

    def plane(seed, h, w):
        rng = random.Random(seed)
        return np.asarray(
            [[rng.randrange(256) for _ in range(w)] for _ in range(h)],
            dtype=np.float64,
        )

    # gray, 11x7 (padding on both axes)
    img = plane(7, 7, 11)
    payload, recon = encode_jpeg([img], [(1, 1)], [2], 11, 7)
    assert np.array_equal(_jpeg_pixels(payload), recon[0][:7, :11])

    # YCbCr 4:2:0, 20x12, restart interval 1 (RST markers + DC resets)
    w, h = 20, 12
    y, cb, cr = plane(1, h, w), plane(2, 6, 10), plane(3, 6, 10)
    payload, recon = encode_jpeg(
        [y, cb, cr], [(2, 2), (1, 1), (1, 1)], [2, 3, 3], w, h, restart=1
    )
    ry = recon[0][:h, :w]
    rcb = np.repeat(np.repeat(recon[1], 2, axis=0), 2, axis=1)[:h, :w]
    rcr = np.repeat(np.repeat(recon[2], 2, axis=0), 2, axis=1)[:h, :w]
    r = ry + 1.402 * (rcr - 128.0)
    g = ry - 0.344136 * (rcb - 128.0) - 0.714136 * (rcr - 128.0)
    b = ry + 1.772 * (rcb - 128.0)
    want = np.clip(np.stack([r, g, b]), 0.0, 255.0).mean(axis=0)
    assert np.array_equal(_jpeg_pixels(payload), want)

    # grid features: 16 floats in [0, 1]
    feats = _decode_jpeg(payload)
    assert len(feats) == 16 and all(0.0 <= f <= 1.0 for f in feats)

    # a constant-128 image survives the lossy round-trip exactly
    # (level shift 0 → all coefficients 0 → reconstruction 128)
    flat, _ = encode_jpeg([np.full((8, 8), 128.0)], [(1, 1)], [2], 8, 8)
    assert np.array_equal(_jpeg_pixels(flat), np.full((8, 8), 128.0))


def test_jpeg_unsupported_variants_raise():
    """Progressive (SOF2) and non-JPEG payloads raise → _decode_one falls
    through to the deterministic fake, like the other kernels."""
    import pytest as _pytest

    from bustub_vectordb_spark.multimodal.binary import (
        _decode_jpeg,
        _decode_one,
        _jpeg_pixels,
    )
    from bustub_vectordb_spark.multimodal.synth import synth_jpeg

    payload = bytearray(synth_jpeg(3, 8, 8, "gray"))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with _pytest.raises(ValueError):
        _jpeg_pixels(bytes(payload))
    feats = _decode_one(bytes(payload), None)  # falls back to the md5 fake
    assert len(feats) == 16

    with _pytest.raises(ValueError):
        _decode_jpeg(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_gif_offset_frame_raises():
    """A GIF frame offset within (or smaller than) the logical screen needs
    canvas compositing — the kernel must raise (→ fallback), not silently
    featurize the bare frame as if it were the screen."""
    import struct

    import pytest as _pytest

    from bustub_vectordb_spark.multimodal.binary import _decode_gif

    payload, _ = _mk_gif(w=8, h=8, seed=2)
    ba = bytearray(payload)
    # image descriptor starts after header(6)+LSD(7)+GCT(768)+GCE(8) = 789
    idesc = 6 + 7 + 768 + 8
    assert payload[idesc] == 0x2C
    struct.pack_into("<HH", ba, idesc + 1, 2, 0)  # left=2, top=0
    struct.pack_into("<H", ba, idesc + 5, 6)  # width=6 (was 8)
    with _pytest.raises(ValueError):
        _decode_gif(bytes(ba))
