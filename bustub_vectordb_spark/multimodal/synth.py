"""Synthetic media generation — deterministic test payloads at any scale.

Real media pipelines need load/regression corpora whose ground truth is
known; these generators emit valid, seeded PNG / GIF payloads from pure
stdlib (no codecs), so a cluster can fabricate N media rows as fast as it
can hash, and the decode stage (multimodal/binary.py) can be verified
end-to-end — the driver-gated `multimodal_real_decode` query decodes these
through the Arrow-batched stage against offline-computed expected features.
"""

from __future__ import annotations

import random
import struct
import zlib


def synth_png(seed: int, w: int = 8, h: int = 8) -> bytes:
    """Valid 8-bit grayscale PNG (filter type 0), seeded pixels."""
    rng = random.Random(seed)
    raw = bytearray()
    for _ in range(h):
        raw.append(0)  # scanline filter: None
        raw += bytes(rng.randrange(256) for _ in range(w))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synth_gif(seed: int, w: int = 8, h: int = 8) -> bytes:
    """Valid GIF89a, grayscale 256-entry palette, literal-code LZW stream
    (periodic CLEARs pin the code width at 9 bits), seeded pixels."""
    rng = random.Random(seed)
    pix = [rng.randrange(256) for _ in range(w * h)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    out += bytes(b for i in range(256) for b in (i, i, i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    clear, end = 256, 257
    codes = [clear]
    for i, p in enumerate(pix):
        if i and i % 100 == 0:
            codes.append(clear)
        codes.append(p)
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
    out.append(8)  # LZW minimum code size
    for i in range(0, len(data), 255):
        sub = data[i : i + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00\x3b"
    return bytes(out)
