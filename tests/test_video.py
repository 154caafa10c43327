"""Rawvideo AVI codec (operators/video.py) — the video tier completing
the PNG/WAV pattern: real RIFF container walk, real DIB pixel quirks
(BGR, bottom-up, 4-byte stride), poison-row contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_etl_fiap_spark.operators import video as V


def _frames(n=4, h=6, w=5, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_roundtrip_exact_and_meta():
    frames = _frames()
    data = V.avi_encode(frames, fps=25)
    meta = V.avi_meta(data)
    assert (meta["width"], meta["height"], meta["n_frames"], meta["fps"]) == (
        5, 6, 4, 25,
    )
    fps, out = V.avi_decode(data)
    assert fps == 25
    assert out.dtype == np.uint8 and (out == frames).all()


def test_stride_padding_width_not_multiple_of_four():
    """w=3 -> raw row 9 bytes, DIB stride 12: the padding must be added on
    encode and stripped on decode (the classic raw-AVI corruption bug)."""
    frames = _frames(n=2, h=3, w=3)
    data = V.avi_encode(frames, fps=10)
    _, out = V.avi_decode(data)
    assert (out == frames).all()
    # and a width whose stride needs no padding still round-trips
    frames4 = _frames(n=2, h=3, w=4)
    _, out4 = V.avi_decode(V.avi_encode(frames4, fps=10))
    assert (out4 == frames4).all()


def test_dib_layout_is_real_bgr_bottom_up():
    """Pin the on-wire layout, not just the roundtrip: the first stored
    byte of the frame chunk is the BLUE channel of the BOTTOM-LEFT pixel."""
    frame = np.zeros((2, 1, 3), dtype=np.uint8)
    frame[0, 0] = (10, 20, 30)   # top pixel RGB
    frame[1, 0] = (40, 50, 60)   # bottom pixel RGB
    data = V.avi_encode(frame[None], fps=1)
    movi = data.index(b"movi")
    chunk = data.index(b"00db", movi)
    body = data[chunk + 8 : chunk + 8 + 8]  # stride(4) * h(2)
    assert body[:3] == bytes((60, 50, 40))  # bottom row first, BGR
    assert body[4:7] == bytes((30, 20, 10))


def test_frame_sample_and_features_deterministic():
    frames = _frames(n=6)
    data = V.avi_encode(frames, fps=12)
    sampled = V.frame_sample(data, every=3)
    assert (sampled == frames[::3]).all()
    f1, f2 = V.video_features(data), V.video_features(data)
    assert f1 == f2 and len(f1) == 8
    assert 0.0 <= min(f1) and max(f1) <= 1.0
    with pytest.raises(V.AviFormatError):
        V.frame_sample(data, every=0)


def test_malformed_payloads_raise_avi_format_error():
    frames = _frames()
    good = V.avi_encode(frames, fps=10)
    with pytest.raises(V.AviFormatError):
        V.avi_meta(b"RIFX" + good[4:])          # bad magic
    with pytest.raises(V.AviFormatError):
        V.avi_meta(good[:10])                   # short header
    with pytest.raises(V.AviFormatError):
        V.avi_decode(good[:-20])                # truncated frame chunk
    # header/movi mismatch: drop the last frame chunk but keep the header
    movi = good.index(b"00db")
    second = good.index(b"00db", movi + 4)
    clipped = (
        good[: good.index(b"movi") - 8]
        + b"LIST"
        + struct.pack("<I", 4 + (second - (good.index(b"movi") + 4)))
        + b"movi"
        + good[good.index(b"movi") + 4 : second]
    )
    with pytest.raises(V.AviFormatError, match="promises"):
        V.avi_decode(clipped)
    # compressed stream tag refused at the metadata tier
    comp = bytearray(good)
    strh = good.index(b"strh")
    comp[strh + 12 : strh + 16] = b"H264"
    with pytest.raises(V.AviFormatError, match="compressed|rawvideo"):
        V.avi_meta(bytes(comp))


def test_encode_rejects_bad_shapes():
    with pytest.raises(V.AviFormatError):
        V.avi_encode(np.zeros((2, 3, 4), dtype=np.uint8))         # no channel dim
    with pytest.raises(V.AviFormatError):
        V.avi_encode(np.zeros((0, 3, 4, 3), dtype=np.uint8))      # zero frames
    with pytest.raises(V.AviFormatError):
        V.avi_encode(_frames(), fps=0)


def test_decode_payload_routes_avi_and_poison_degrades(spark):
    """The Spark-side contract: real AVI rows featurize through the Arrow
    stage; a truncated AVI degrades to ok=false instead of killing the
    job (same poison-row policy as the PNG and WAV tiers)."""
    from aws_etl_fiap_spark.operators.multimodal import (
        decode_payload,
        extract_features,
    )

    frames = _frames()
    good = V.avi_encode(frames, fps=10)
    feat = decode_payload("video/x-msvideo", good)
    assert len(feat) == 8 and feat == V.video_features(good)

    rows = [
        (1, "video/x-msvideo", bytearray(good)),
        (2, "video/x-msvideo", bytearray(good[:-15])),  # poison: truncated
        (3, "video/mp4", bytearray(good)),              # compressed boundary
    ]
    df = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary"
    )
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out[1]["ok"] and out[1]["feature"] == pytest.approx(feat)
    assert not out[2]["ok"] and out[2]["feature"] is None
    assert not out[3]["ok"] and out[3]["feature"] is None


def test_documents_as_avi_generates_real_decodable_clips(spark):
    """The distributed generator: every document becomes a genuine AVI
    (decodable by the chunk walk, correct geometry), the payload is a
    deterministic function of the text, and the full
    generate -> decode -> featurize pipeline stays ok=true end-to-end."""
    from aws_etl_fiap_spark.operators.multimodal import (
        documents_as_avi,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "a different doc")],
        "doc_id long, text string",
    )
    media = documents_as_avi(docs, n_frames=3, height=4, width=5, fps=12)
    rows = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(rows) == {1, 2, 3}
    # identical text -> byte-identical payload; different text -> different
    assert rows[1] == rows[2] and rows[1] != rows[3]
    meta = V.avi_meta(rows[1])
    assert (meta["width"], meta["height"], meta["n_frames"], meta["fps"]) == (
        5, 4, 3, 12
    )
    _, frames = V.avi_decode(rows[1])
    assert frames.shape == (3, 4, 5, 3)

    out = extract_features(documents_as_avi(docs)).collect()
    assert all(r["ok"] and len(r["feature"]) == 8 for r in out)


def test_roundtrip_property():
    """Property: encode -> decode is byte-exact for ANY geometry, pixel
    content, and fps — including stride-padded widths (w*3 % 4 != 0),
    single-pixel frames, and 1-frame clips."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=5),    # frames
        st.integers(min_value=1, max_value=7),    # height
        st.integers(min_value=1, max_value=7),    # width
        st.integers(min_value=1, max_value=60),   # fps
        st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    )
    def prop(n, h, w, fps, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        data = V.avi_encode(frames, fps=fps)
        meta = V.avi_meta(data)
        assert (meta["n_frames"], meta["height"], meta["width"], meta["fps"]) == (
            n, h, w, fps
        )
        got_fps, back = V.avi_decode(data)
        assert got_fps == fps
        assert back.dtype == np.uint8 and np.array_equal(back, frames)
        every = max(1, n // 2)
        assert np.array_equal(V.frame_sample(data, every=every), frames[::every])

    prop()


def test_short_header_chunks_raise_avi_format_error_not_struct_error():
    """A fuzzed payload whose strh/strf declares a body shorter than the
    fields it must hold fails as AviFormatError (poison-row contract),
    never as a struct.error escaping the Arrow stage."""
    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(fourcc, body):
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, 0, 2, 2, 0, 0, 0, 0)
    for stream_hdr in (
        chunk(b"strh", b"vids" + b"DIB "),          # 8 bytes, need 28
        chunk(b"strh", b"vids" + b"DIB " + b"\x00" * 20)
        + chunk(b"strf", struct.pack("<Ii", 40, 2)),  # strf 8 bytes, need 20
    ):
        hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", stream_hdr))
        body = b"AVI " + hdrl
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(V.AviFormatError, match="chunk holds"):
            V.avi_meta(data)


def test_encode_rejects_header_field_overflow_as_avi_format_error():
    """Geometry past AVI's 16-bit rcFrame and fps past the 1 MHz frame
    clock raise AviFormatError, not struct.error."""
    wide = np.zeros((1, 1, 32768, 3), dtype=np.uint8)
    with pytest.raises(V.AviFormatError, match="16-bit"):
        V.avi_encode(wide, fps=1)
    with pytest.raises(V.AviFormatError, match="frame clock"):
        V.avi_encode(_frames(n=1), fps=1_000_001)


def test_meta_rejects_zero_geometry():
    """r10 advice: ok at the META tier means "headers describe a decodable
    clip" — a fuzzed avih with zero width/height must fail at avi_meta,
    not slip through as healthy routing metadata."""
    good = V.avi_encode(_frames(), fps=10)
    avih = good.index(b"avih")
    # avih body starts 8 bytes after the fourcc; dwWidth/dwHeight are
    # uint32 words 8 and 9 of the body.
    body = avih + 8
    for word in (8, 9):
        fuzzed = bytearray(good)
        fuzzed[body + 4 * word : body + 4 * word + 4] = b"\x00\x00\x00\x00"
        with pytest.raises(V.AviFormatError, match="bad dimensions"):
            V.avi_meta(bytes(fuzzed))
