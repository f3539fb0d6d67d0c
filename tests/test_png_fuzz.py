"""Adam7 goldens + property fuzz for the pure-python PNG codec.

The packer here is an INDEPENDENT second implementation (per-byte
python forward filters, its own bit packing, its own copy of the W3C
§8.2 pass grid) — the round-trip asserts the package decoder against
it, not against the package encoder, so a shared bug can't self-verify.
Mutation fuzz: the codec feeds a quarantine path, so every single-bit
flip must surface as ValueError (dirty-routed), never another
exception type and never silently-wrong pixels.
"""
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datax_spark.functions.multimodal import decode_png, encode_png

# W3C PNG §8.2, restated independently of the package table
ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _pack_rows(samples: np.ndarray, depth: int) -> list[bytes]:
    """(h, w, ch) uint16 → per-row packed bytes, big-endian bit order."""
    h, w, ch = samples.shape
    rows = []
    for y in range(h):
        if depth == 16:
            rows.append(b"".join(
                int(samples[y, x, c]).to_bytes(2, "big")
                for x in range(w) for c in range(ch)
            ))
        elif depth == 8:
            rows.append(bytes(
                int(samples[y, x, c]) for x in range(w) for c in range(ch)
            ))
        else:
            bits = []
            for x in range(w):
                v = int(samples[y, x, 0])
                bits.extend((v >> (depth - 1 - i)) & 1 for i in range(depth))
            while len(bits) % 8:
                bits.append(0)
            rows.append(bytes(
                int("".join(map(str, bits[i : i + 8])), 2)
                for i in range(0, len(bits), 8)
            ))
    return rows


def _filter_rows(rows: list[bytes], bpp: int, ftypes: list[int]) -> bytes:
    """Forward-filter packed rows per W3C §9 — reference, per byte."""
    out = b""
    prev = bytes(len(rows[0])) if rows else b""
    for row, ft in zip(rows, ftypes):
        enc = bytearray(len(row))
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            enc[i] = (row[i] - pred) & 0xFF
        out += bytes([ft]) + bytes(enc)
        prev = row
    return out


def ref_png(samples, depth, color, ftypes=None, interlace=0,
            plte=None, trns=None) -> bytes:
    """Reference writer: (h, w, ch) uint16 samples → PNG bytes."""
    samples = np.asarray(samples, dtype=np.uint16)
    h, w, ch = samples.shape
    assert ch == CHANNELS[color]
    bpp = max(1, depth * ch // 8)
    if interlace:
        body, fi = b"", 0
        for x0, y0, dx, dy in ADAM7:
            sub = samples[y0::dy, x0::dx, :]
            if sub.size == 0:
                continue
            fts = (ftypes or [0] * 10_000)[fi : fi + sub.shape[0]]
            fi += sub.shape[0]
            body += _filter_rows(_pack_rows(sub, depth), bpp, fts)
    else:
        body = _filter_rows(
            _pack_rows(samples, depth), bpp, ftypes or [0] * h
        )
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace),
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(body)) + _chunk(b"IEND", b"")


def expected_decode(samples, depth, color, plte=None, trns=None):
    """What decode_png documents: high-byte reduction for 16-bit,
    sub-byte gray scaled to 0..255, palette expansion, tRNS alpha."""
    samples = np.asarray(samples, dtype=np.uint16)
    h, w, ch = samples.shape
    arr = (samples >> 8 if depth == 16 else samples).astype(np.uint8)
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr[:, :, 0]
        out = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(a)] = a
            out = np.dstack([out, alpha[idx]])
        return out
    if color == 0:
        g = arr
        if depth < 8:
            g = (arr * (255 // ((1 << depth) - 1))).astype(np.uint8)
        gray = g.reshape(h, w)
        if trns is not None and len(trns) >= 2:
            key = int.from_bytes(trns[:2], "big")
            alpha = np.where(samples[:, :, 0] == key, 0, 255).astype(np.uint8)
            return np.dstack([gray, alpha])
        return gray
    if color == 2 and trns is not None and len(trns) >= 6:
        keys = struct.unpack(">HHH", trns[:6])
        mask = ((samples[:, :, 0] == keys[0])
                & (samples[:, :, 1] == keys[1])
                & (samples[:, :, 2] == keys[2]))
        return np.dstack([arr, np.where(mask, 0, 255).astype(np.uint8)])
    return arr


def test_adam7_grid_covers_each_pixel_once():
    from datax_spark.functions.multimodal import _ADAM7

    assert _ADAM7 == ADAM7  # package grid vs independent W3C restatement
    cover = np.zeros((8, 8), dtype=int)
    for x0, y0, dx, dy in ADAM7:
        cover[y0::dy, x0::dx] += 1
    assert (cover == 1).all()


def test_adam7_gray8_golden():
    """5x5 gray, X[y,x] = 10y + x, all seven pass shapes exercised
    (incl. empty passes for this size), mixed filters across passes."""
    x = (10 * np.arange(5)[:, None] + np.arange(5)[None, :]).astype(np.uint16)
    png = ref_png(x[:, :, None], 8, 0, ftypes=[0, 1, 2, 3, 4] * 4,
                  interlace=1)
    got = decode_png(png)
    assert got.shape == (5, 5) and (got == x.astype(np.uint8)).all()


def test_adam7_matches_noninterlaced_decode():
    rng = np.random.default_rng(11)
    for color in (0, 2, 4, 6):
        ch = CHANNELS[color]
        s = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint16)
        a = decode_png(ref_png(s, 8, color, interlace=0))
        b = decode_png(ref_png(s, 8, color, interlace=1,
                               ftypes=[4] * 200))
        assert (a == b).all()


def test_adam7_palette_trns_and_color_key():
    rng = np.random.default_rng(5)
    # interlaced palette + tRNS
    plte = bytes(rng.integers(0, 256, size=12, dtype=np.uint8))  # 4 entries
    idx = rng.integers(0, 4, size=(7, 6, 1), dtype=np.uint16)
    trns = bytes([0, 128, 255])  # entry 3 defaults opaque
    got = decode_png(ref_png(idx, 8, 3, interlace=1, plte=plte, trns=trns))
    want = expected_decode(idx, 8, 3, plte=plte, trns=trns)
    assert got.shape == (7, 6, 4) and (got == want).all()
    # interlaced 16-bit RGB with a full-sample color key: the key must
    # compare in the RAW 16-bit domain even through the deinterlacer
    s = rng.integers(0, 1 << 16, size=(9, 5, 3), dtype=np.uint16)
    s[3, 2] = (0x1234, 0xABCD, 0x00FF)
    near = np.array([0x1235, 0xABCD, 0x00FF])  # same high bytes
    s[4, 1] = near
    key = struct.pack(">HHH", 0x1234, 0xABCD, 0x00FF)
    got = decode_png(ref_png(s, 16, 2, interlace=1, trns=key))
    assert got[3, 2, 3] == 0 and got[4, 1, 3] == 255
    assert (got == expected_decode(s, 16, 2, trns=key)).all()


def test_adam7_subbyte_gray():
    rng = np.random.default_rng(6)
    for depth in (1, 2, 4):
        s = rng.integers(0, 1 << depth, size=(11, 10, 1), dtype=np.uint16)
        got = decode_png(ref_png(s, depth, 0, interlace=1))
        assert (got == expected_decode(s, depth, 0)).all(), depth


def test_encode_interlace_roundtrip_all_filters():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 10, 3),
                  (16, 17, 4), (3, 3, 2), (1, 9), (9, 1, 3)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(a, ft, interlace=True))
            assert out.shape == a.shape and (out == a).all(), (shape, ft)


@st.composite
def png_case(draw):
    depth_color = draw(st.sampled_from([
        (1, 0), (2, 0), (4, 0), (8, 0), (16, 0),           # gray
        (8, 2), (16, 2), (8, 4), (16, 4), (8, 6), (16, 6),  # rgb/ga/rgba
        (8, 3),                                             # palette
    ]))
    depth, color = depth_color
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    seed = draw(st.integers(0, 2**31 - 1))
    interlace = draw(st.booleans())
    # enough per-row filter types for every pass of an interlaced image
    ftypes = draw(st.lists(st.integers(0, 4), min_size=4 * h + 8,
                           max_size=4 * h + 8))
    return depth, color, h, w, seed, interlace, ftypes


@settings(max_examples=80, deadline=None)
@given(png_case())
def test_fuzz_reference_writer_roundtrip(case):
    depth, color, h, w, seed, interlace, ftypes = case
    rng = np.random.default_rng(seed)
    ch = CHANNELS[color]
    hi = 16 if color == 3 else (1 << depth)  # palette: 16-entry PLTE
    s = rng.integers(0, hi, size=(h, w, ch), dtype=np.uint16)
    plte = bytes(rng.integers(0, 256, size=48, dtype=np.uint8)) \
        if color == 3 else None
    png = ref_png(s, depth, color, ftypes=ftypes, interlace=int(interlace),
                  plte=plte)
    got = decode_png(png)
    want = expected_decode(s, depth, color, plte=plte)
    assert got.dtype == np.uint8 and got.shape == want.shape
    assert (got == want).all()


def test_every_single_bit_flip_dirty_routes():
    """CRC + structural checks must turn ANY single-bit corruption into
    ValueError — the pipeline's dirty-routing contract. Systematic
    sweep over every bit of a small interlaced PNG."""
    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    png = bytearray(encode_png(a, 4, interlace=True))
    for bit in range(len(png) * 8):
        png[bit // 8] ^= 1 << (bit % 8)
        with pytest.raises(ValueError):
            decode_png(bytes(png))
        png[bit // 8] ^= 1 << (bit % 8)
