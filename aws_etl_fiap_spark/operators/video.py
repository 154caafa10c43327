"""Dependency-free AVI (RIFF rawvideo) codec — the VIDEO tier of the
multimodal story, completing the PNG (operators/imaging.py) / WAV
(operators/audio.py) pattern: real container parsing and real pixel math
with only stdlib ``struct`` + numpy, so the engine's media path handles
genuine video bytes instead of only ``fake/*`` payloads.

Scope: canonical uncompressed AVI — RIFF('AVI ') with a 'vids'/'DIB '
stream of BI_RGB 24-bit frames, the format ``ffmpeg -c:v rawvideo``
emits.  This is the honest dependency-free slice of the video surface:
the CONTAINER walk (RIFF chunk list, hdrl/strl headers, movi frame
chunks) and the raw-frame pixel layout (BGR byte order, bottom-up rows,
4-byte row stride padding — the three classic DIB quirks) are pure
public structure; COMPRESSED codecs (H.264/VP9/AV1) stay behind the
documented ``NotImplementedError`` boundary in
``operators/multimodal.py`` because their decoders need external
libraries this environment excludes — exactly the MP3-vs-WAV split on
the audio side.

Malformed input policy (mirrors imaging.PngFormatError and
audio.WavFormatError): every parse failure — short header, bad magic,
compressed stream, truncated frame chunk, dimension mismatch — raises
:class:`AviFormatError` (a ValueError), which the Spark-side poison-row
handling in ``multimodal.extract_features`` catches per row instead of
killing the 100 TB job.

Scale shape: payload bytes never shuffle — decode/featurize runs inside
Arrow ``mapInPandas`` stages next to the scan, and only fixed-width
stats/feature rows leave the stage (the same contract as the PNG and WAV
tiers; see multimodal.py).
"""

from __future__ import annotations

import struct


class AviFormatError(ValueError):
    """Raised for any malformed/unsupported AVI payload."""


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def avi_encode(frames, fps: int = 10) -> bytes:
    """Serialize uint8 RGB frames of shape ``(n, h, w, 3)`` into a
    canonical uncompressed AVI: one 'vids'/'DIB ' stream of BI_RGB
    24-bit '00db' chunks with real DIB layout (BGR, bottom-up rows,
    stride padded to 4 bytes)."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise AviFormatError(f"frames must be (n, h, w, 3) uint8, got {arr.shape}")
    if fps < 1:
        raise AviFormatError(f"fps must be >= 1, got {fps}")
    n, h, w, _ = arr.shape
    if n < 1 or h < 1 or w < 1:
        raise AviFormatError(f"need at least one non-empty frame, got {arr.shape}")
    # Header-field ranges: strh's rcFrame is signed 16-bit and fps feeds a
    # uint32 microseconds-per-frame — reject out-of-range geometry as
    # AviFormatError instead of letting struct.pack raise struct.error.
    if w > 32767 or h > 32767:
        raise AviFormatError(f"frame geometry {w}x{h} exceeds AVI's 16-bit rcFrame")
    if fps > 1_000_000:
        raise AviFormatError(f"fps {fps} exceeds the 1 MHz frame clock")
    stride = _pad4(w * 3)
    frame_bytes = stride * h

    def dib(frame) -> bytes:
        # RGB -> BGR, flip to bottom-up, pad each row's stride to 4 bytes
        bgr = frame[::-1, :, ::-1]
        row = np.zeros((h, stride), dtype=np.uint8)
        row[:, : w * 3] = bgr.reshape(h, w * 3)
        return row.tobytes()

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        min(frame_bytes * fps, 0xFFFFFFFF),  # dwMaxBytesPerSec (uint32 hint)
        0, 0,                  # padding granularity, flags
        n, 0, 1,               # total frames, initial frames, streams
        frame_bytes,           # suggested buffer size
        w, h, 0, 0, 0, 0,      # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIi",
            0, 0, 0, 0,        # flags, priority, language, initial frames
            1, fps,            # dwScale, dwRate  (rate/scale = fps)
            0, n,              # start, length (frames)
            frame_bytes, 0x7FFFFFFF, 0,  # bufsize, quality, samplesize
        ) + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,       # biSize, width, height, planes, bitcount
        0,                     # BI_RGB
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in arr))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _chunks(data: bytes, start: int, end: int):
    """Walk a RIFF chunk list in data[start:end] -> (fourcc, body_lo,
    body_hi); raises on truncation (a silently-short walk would report
    fewer frames than the header promised)."""
    off = start
    while off < end:
        if off + 8 > end:
            raise AviFormatError(f"truncated chunk header at offset {off}")
        fourcc = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        lo, hi = off + 8, off + 8 + size
        if hi > end:
            raise AviFormatError(
                f"chunk {fourcc!r} at {off} claims {size} bytes past the payload end"
            )
        yield fourcc, lo, hi
        off = hi + (size & 1)  # chunks are word-aligned


def avi_meta(data: bytes) -> dict:
    """Parse headers only -> {width, height, n_frames, fps} without
    touching frame data (the metadata tier: routing/dedup/planning can
    run on header bytes alone)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI payload")
    meta: dict = {}
    for fourcc, lo, hi in _chunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[lo : lo + 4] != b"hdrl":
            continue
        for c2, lo2, hi2 in _chunks(data, lo + 4, hi):
            if c2 == b"avih":
                if hi2 - lo2 < 40:
                    raise AviFormatError("avih header too short")
                v = struct.unpack_from("<10I", data, lo2)
                meta.update(n_frames=v[4], width=v[8], height=v[9])
                meta["fps"] = 1_000_000 // v[0] if v[0] else 0
            elif c2 == b"LIST" and data[lo2 : lo2 + 4] == b"strl":
                for c3, lo3, hi3 in _chunks(data, lo2 + 4, hi2):
                    if c3 == b"strh":
                        # Length-check BEFORE unpack_from: a fuzzed chunk
                        # whose declared body is short (or runs past the
                        # buffer) must fail as AviFormatError, never as a
                        # struct.error escaping the poison-row contract.
                        if hi3 - lo3 < 28:
                            raise AviFormatError(
                                f"strh chunk holds {hi3 - lo3} bytes, need 28"
                            )
                        if data[lo3 : lo3 + 4] != b"vids":
                            raise AviFormatError("first stream is not video")
                        if data[lo3 + 4 : lo3 + 8] not in (b"DIB ", b"\x00\x00\x00\x00"):
                            raise AviFormatError(
                                f"compressed stream {data[lo3 + 4:lo3 + 8]!r}: "
                                "only rawvideo/DIB is supported"
                            )
                        scale, rate = struct.unpack_from("<II", data, lo3 + 20)
                        if scale:
                            meta["fps"] = rate // scale
                    elif c3 == b"strf":
                        if hi3 - lo3 < 20:
                            raise AviFormatError(
                                f"strf chunk holds {hi3 - lo3} bytes, need 20"
                            )
                        bitcount, compression = struct.unpack_from("<HI", data, lo3 + 14)[0], struct.unpack_from("<I", data, lo3 + 16)[0]
                        if compression != 0:
                            raise AviFormatError(
                                f"biCompression={compression}: only BI_RGB raw frames"
                            )
                        if bitcount != 24:
                            raise AviFormatError(
                                f"biBitCount={bitcount}: only 24-bit RGB frames"
                            )
        break
    if "width" not in meta:
        raise AviFormatError("no hdrl/avih header found")
    # ok at the meta tier must mean "these headers describe a decodable
    # clip", not merely "the bytes parse" (r10 advice): a fuzzed avih with
    # zero geometry would otherwise route downstream as healthy and only
    # fail at the (more expensive) decode tier.
    if meta["width"] < 1 or meta["height"] < 1:
        raise AviFormatError(
            f"bad dimensions {meta['width']}x{meta['height']}"
        )
    if meta["n_frames"] < 0:
        raise AviFormatError(f"negative frame count {meta['n_frames']}")
    return meta


def avi_decode(data: bytes):
    """Parse AVI bytes -> (fps, frames as (n, h, w, 3) uint8 RGB ndarray),
    undoing all three DIB quirks (stride padding, bottom-up rows, BGR).

    Frame chunks: both '00db' (uncompressed) and '00dc' fourccs are
    accepted AS RAW DIBs — the strf header (validated BI_RGB/24-bit in
    :func:`avi_meta`) is authoritative over the per-chunk fourcc, matching
    how players treat rawvideo files from muxers that emit '00dc'
    regardless of compression; a file whose header lies about its frames
    being raw is out of contract (r10 advice note)."""
    import numpy as np

    meta = avi_meta(data)
    w, h = meta["width"], meta["height"]
    stride = _pad4(w * 3)
    frames = []
    for fourcc, lo, hi in _chunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[lo : lo + 4] != b"movi":
            continue
        for c2, lo2, hi2 in _chunks(data, lo + 4, hi):
            if c2 not in (b"00db", b"00dc"):
                continue
            if hi2 - lo2 != stride * h:
                raise AviFormatError(
                    f"frame chunk holds {hi2 - lo2} bytes, expected {stride * h} "
                    f"for {w}x{h}x24 (stride {stride})"
                )
            dib = np.frombuffer(data[lo2:hi2], dtype=np.uint8).reshape(h, stride)
            frames.append(dib[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1])
    if len(frames) != meta["n_frames"]:
        raise AviFormatError(
            f"header promises {meta['n_frames']} frames, movi holds {len(frames)}"
        )
    return meta["fps"], np.stack(frames)


def frame_sample(data: bytes, every: int = 2):
    """Deterministic frame sampling: frames 0, every, 2*every, ... as an
    (m, h, w, 3) uint8 RGB ndarray — the decode side of the frame-sample
    surface (the fake-payload twin lives in multimodal.py)."""
    if every < 1:
        raise AviFormatError(f"every must be >= 1, got {every}")
    _, frames = avi_decode(data)
    return frames[::every]


def video_features(data: bytes, dim: int = 8) -> list[float]:
    """Fixed-width feature row for :func:`multimodal.decode_payload`:
    dims, duration, luma moments, and mean inter-frame motion energy —
    the per-payload summary that leaves the Arrow stage (payload bytes
    never do)."""
    import numpy as np

    fps, frames = avi_decode(data)
    luma = frames.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    motion = float(np.abs(np.diff(luma, axis=0)).mean()) if len(frames) > 1 else 0.0
    feat = [
        min(frames.shape[2] / 4096.0, 1.0),
        min(frames.shape[1] / 4096.0, 1.0),
        min(len(frames) / 10_000.0, 1.0),
        min(fps / 120.0, 1.0),
        float(luma.mean()) / 255.0,
        float(luma.std()) / 255.0,
        min(motion / 255.0, 1.0),
        0.0,
    ]
    return feat[:dim]
