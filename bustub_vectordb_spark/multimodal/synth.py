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


# -------------------------------------------------------------------------
# Baseline JPEG encoder (pure python + numpy) — the ground-truth producer
# for the JPEG decode kernel (multimodal/binary._decode_jpeg). Emits valid
# T.81 baseline streams: SOI/APP0/DQT/SOF0/DHT/[DRI]/SOS/EOI, canonical
# huffman tables (all DC categories at 5 bits, the full 162-symbol AC set
# at 8 bits — prefix-free by construction, no all-ones codes), byte
# stuffing, optional restart markers. encode_jpeg() also returns the
# reconstruction its quantized coefficients imply (same dequant+IDCT
# arithmetic the decoder runs), so tests can assert bit-exact decode.
# -------------------------------------------------------------------------


def _jpeg_enc_tables():
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    dc_counts = [0] * 16
    dc_counts[4] = 12  # every DC category coded in 5 bits
    ac_counts = [0] * 16
    ac_counts[7] = 162  # every AC run/size symbol coded in 8 bits

    def enc_map(counts, syms):
        m, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                m[syms[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return m

    return (
        (dc_counts, dc_syms, enc_map(dc_counts, dc_syms)),
        (ac_counts, ac_syms, enc_map(ac_counts, ac_syms)),
    )


class _JpegBitW:
    """MSB-first bit writer with T.81 byte stuffing (FF → FF 00)."""

    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = self.n = 0

    def flush(self) -> None:  # pad the last byte with 1-bits
        while self.n:
            self.put(1, 1)


def _jpeg_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(planes, samplings, quants, w, h, restart=0):
    """Encode component planes as baseline JPEG.

    planes: list of 2-D uint8-valued arrays (component i sized
      ceil(w*h_i/hmax) × … — e.g. full-res Y + half-res Cb/Cr for 4:2:0);
    samplings: [(h_i, v_i)]; quants: per-component uniform quantizer value
    (comp 0 → DQT table 0, the rest share table 1); restart: DRI interval
    in MCUs (0 = none).

    Returns (jpeg_bytes, recon_planes): recon_planes[i] is the pixel plane
    the quantized coefficients imply under the standard IDCT — computed
    with the exact arithmetic the decoder runs, so decode(bytes) must
    reproduce it bit-exactly (before chroma upsampling / color transform).
    """
    import numpy as np

    from .binary import _JPEG_ZZ, _jpeg_dct_matrix

    n_comp = len(planes)
    assert n_comp in (1, 3) and len(samplings) == n_comp
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    C = _jpeg_dct_matrix()
    zz = np.asarray(_JPEG_ZZ)

    (dc_counts, dc_syms, dc_map), (ac_counts, ac_syms, ac_map) = _jpeg_enc_tables()

    padded, recon = [], []
    for (sh, sv), pl in zip(samplings, planes):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        a = np.asarray(pl, dtype=np.float64)
        a = np.pad(a, ((0, ph - a.shape[0]), (0, pw - a.shape[1])), mode="edge")
        padded.append(a)
        recon.append(np.zeros_like(a))

    wr = _JpegBitW()
    dc_prev = [0] * n_comp
    chunks = []  # entropy segments split at restart boundaries
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            wr.flush()
            chunks.append(bytes(wr.out))
            wr = _JpegBitW()
            dc_prev = [0] * n_comp
        my, mx = divmod(m, mcux)
        for ci in range(n_comp):
            sh, sv = samplings[ci]
            q = quants[ci]
            for byy in range(sv):
                for bxx in range(sh):
                    y0 = (my * sv + byy) * 8
                    x0 = (mx * sh + bxx) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = C @ block @ C.T
                    # clamp to category ≤ 10 so DC diffs stay in-category
                    qc = np.clip(np.round(coef / q), -1023, 1023).astype(np.int64)
                    # the reconstruction these coefficients imply — the
                    # decoder's exact dequant + IDCT + round expression
                    deq = np.zeros(64, dtype=np.float64)
                    deq[zz] = (qc.flatten()[zz] * q).astype(np.float64)
                    recon[ci][y0 : y0 + 8, x0 : x0 + 8] = np.clip(
                        np.round(C.T @ deq.reshape(8, 8) @ C + 128.0), 0.0, 255.0
                    )
                    zzc = qc.flatten()[zz]
                    diff = int(zzc[0]) - dc_prev[ci]
                    dc_prev[ci] = int(zzc[0])
                    s = _jpeg_cat(diff)
                    code, ln = dc_map[s]
                    wr.put(code, ln)
                    if s:
                        wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                    run = 0
                    for k in range(1, 64):
                        v = int(zzc[k])
                        if v == 0:
                            run += 1
                            continue
                        while run >= 16:
                            code, ln = ac_map[0xF0]
                            wr.put(code, ln)
                            run -= 16
                        s = _jpeg_cat(v)
                        code, ln = ac_map[(run << 4) | s]
                        wr.put(code, ln)
                        wr.put(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = ac_map[0x00]  # EOB
                        wr.put(code, ln)
    wr.flush()
    chunks.append(bytes(wr.out))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    n_qt = 1 if n_comp == 1 else 2
    for tq in range(n_qt):
        qv = quants[0] if tq == 0 else quants[1]
        out += b"\xff\xdb" + struct.pack(">H", 3 + 64) + bytes([tq]) + bytes([qv] * 64)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes(
            [ci + 1, (samplings[ci][0] << 4) | samplings[ci][1], 0 if ci == 0 else 1]
        )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms, _m) in ((0, (dc_counts, dc_syms, None)), (1, (ac_counts, ac_syms, None))):
        payload = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all comps
    sos += b"\x00\x3f\x00"  # spectral 0..63, approx 0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    for i, ch in enumerate(chunks):
        out += ch
        if i < len(chunks) - 1:
            out += bytes([0xFF, 0xD0 + (i % 8)])  # RSTn
    out += b"\xff\xd9"  # EOI
    return bytes(out), recon


def synth_jpeg(seed: int, w: int = 8, h: int = 8, mode: str = "gray") -> bytes:
    """Valid baseline JPEG, seeded pixels: ``gray`` (one component) or
    ``420`` (YCbCr 2×2/1×1/1×1 subsampling)."""
    import numpy as np

    rng = random.Random(seed)

    def plane(ph, pw):
        return np.asarray(
            [[rng.randrange(256) for _ in range(pw)] for _ in range(ph)],
            dtype=np.float64,
        )

    if mode == "gray":
        return encode_jpeg([plane(h, w)], [(1, 1)], [2], w, h)[0]
    cw, ch_ = -(-w // 2), -(-h // 2)
    return encode_jpeg(
        [plane(h, w), plane(ch_, cw), plane(ch_, cw)],
        [(2, 2), (1, 1), (1, 1)],
        [2, 3, 3],
        w,
        h,
    )[0]
