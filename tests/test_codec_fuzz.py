"""Round-trip + robustness fuzz for the non-PNG codecs (WAV/BMP/PNM/
Y4M), mirroring test_png_fuzz.py.

Robustness property: these formats carry no CRC, so a corrupted
payload may legally decode to wrong pixels — but it must NEVER raise
anything outside decode_meta's dirty-route catch list
(NotImplementedError, ValueError, EOFError, wave.Error): any other
exception type escapes the quarantine and kills the whole scan task
for one bad object. Mutation fuzz on exactly this property found two
real escapes (struct.error from a truncated BMP header, bare
RuntimeError from the stdlib wave module on a corrupt fmt chunk) —
both now converted to ValueError in the decoders.
"""
import io
import struct
import wave

import numpy as np
from hypothesis import given, settings, strategies as st

from datax_spark.functions import multimodal as M

ROUTED = (NotImplementedError, ValueError, EOFError, wave.Error)


def ref_wav(pcm16: np.ndarray, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(pcm16.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm16.astype("<i2").tobytes())
    return buf.getvalue()


def ref_bmp(rgb: np.ndarray, top_down: bool = False) -> bytes:
    """Independent 24-bit BI_RGB writer (bottom-up unless top_down)."""
    h, w, _ = rgb.shape
    row = (w * 3 + 3) & ~3
    lines = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        line = rgb[y, :, ::-1].tobytes()  # RGB -> BGR
        lines.append(line + b"\x00" * (row - len(line)))
    px = b"".join(lines)
    return (
        b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
        + struct.pack("<Iii", 40, w, -h if top_down else h)
        + struct.pack("<HH", 1, 24)
        + struct.pack("<IIiiII", 0, len(px), 0, 0, 0, 0)
        + px
    )


def ref_y4m(frames: list[bytes], w: int, h: int, chroma: str) -> bytes:
    head = f"YUV4MPEG2 W{w} H{h} F25:1 C{chroma}\n".encode()
    return head + b"".join(b"FRAME\n" + f for f in frames)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 200), st.integers(1, 2), st.integers(0, 2**31 - 1))
def test_fuzz_wav_roundtrip(n, ch, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(1 << 15), 1 << 15, size=(n, ch)).astype(np.int16)
    d = M.decode_wav(ref_wav(pcm, 16000))
    assert d["n_channels"] == ch and d["n_samples"] == n
    assert d["sample_rate"] == 16000
    assert (d["pcm"] == pcm).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 100), st.integers(1, 2), st.integers(0, 2**31 - 1))
def test_fuzz_wav_24bit(n, ch, seed):
    """24-bit PCM narrows to the high 16 bits, sign preserved. The
    wire bytes are built independently (int16 << 8, 3-byte LE)."""
    rng = np.random.default_rng(seed)
    want = rng.integers(-(1 << 15), 1 << 15, size=(n, ch)).astype(np.int16)
    full = want.astype(np.int32) << 8  # bit-23-signed samples
    le = np.zeros((n * ch, 3), dtype=np.uint8)
    flat = full.reshape(-1) & 0xFFFFFF
    le[:, 0] = flat & 0xFF
    le[:, 1] = (flat >> 8) & 0xFF
    le[:, 2] = (flat >> 16) & 0xFF
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(3)
        w.setframerate(44100)
        w.writeframes(le.tobytes())
    d = M.decode_wav(buf.getvalue())
    assert d["n_channels"] == ch and d["n_samples"] == n
    assert (d["pcm"] == want).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.booleans(),
       st.integers(0, 2**31 - 1))
def test_fuzz_bmp_roundtrip(h, w, top_down, seed):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (M.decode_bmp(ref_bmp(rgb, top_down)) == rgb).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**31 - 1))
def test_fuzz_ppm_roundtrip(h, w, seed):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (M.decode_pnm(M.encode_ppm(rgb)) == rgb).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 4), st.sampled_from(["420", "444"]),
       st.integers(2, 8), st.integers(2, 8), st.integers(0, 2**31 - 1))
def test_fuzz_y4m_roundtrip(n_frames, chroma, w2, h2, seed):
    rng = np.random.default_rng(seed)
    w, h = w2 * 2, h2 * 2  # even dims so C420 planes are integral
    fb = w * h * 3 if chroma == "444" else w * h * 3 // 2
    frames = [bytes(rng.integers(0, 256, size=fb, dtype=np.uint8).tobytes())
              for _ in range(n_frames)]
    d = M.decode_y4m(ref_y4m(frames, w, h, chroma))
    assert d["width"] == w and d["height"] == h
    assert d["chroma"] == chroma and d["frames"] == frames


def _decode_never_escapes(raw: bytes, label: str) -> None:
    try:
        M.decode_payload(raw)
    except ROUTED:
        pass
    # anything else propagates and fails the test with its real type


def test_truncation_never_escapes_dirty_routing():
    """Every prefix of a valid payload decodes or raises a ROUTED type."""
    rng = np.random.default_rng(3)
    pcm = rng.integers(-100, 100, size=(50, 2)).astype(np.int16)
    rgb = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    samples = {
        "wav": ref_wav(pcm, 8000),
        "bmp": ref_bmp(rgb),
        "ppm": M.encode_ppm(rgb),
        "y4m": ref_y4m([b"\x00" * 24], 4, 4, "420"),
        "png": M.encode_png(rgb, 4, interlace=True),
    }
    for label, payload in samples.items():
        for cut in range(len(payload)):
            _decode_never_escapes(payload[:cut], f"{label}@{cut}")


def test_bit_flips_never_escape_dirty_routing():
    """Single-bit corruption anywhere in any payload: decode may
    succeed (headerless formats carry no CRC) but may only raise
    ROUTED exception types."""
    rng = np.random.default_rng(4)
    pcm = rng.integers(-100, 100, size=(30, 1)).astype(np.int16)
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    samples = {
        "wav": ref_wav(pcm, 8000),
        "bmp": ref_bmp(rgb, top_down=True),
        "ppm": M.encode_ppm(rgb),
        "y4m": ref_y4m([b"\x01" * 24], 4, 4, "420"),
    }
    for label, payload in samples.items():
        a = bytearray(payload)
        for bit in range(len(a) * 8):
            a[bit // 8] ^= 1 << (bit % 8)
            _decode_never_escapes(bytes(a), f"{label} bit{bit}")
            a[bit // 8] ^= 1 << (bit % 8)
