"""Multimodal column plumbing ([EXT] north star): images/audio/video as
opaque ``binary`` columns with typed metadata, decoded/feature-extracted via
Arrow-batched Pandas functions.

Design for 100 TB of media:
- the payload column is ``binary`` and ONLY the Python stages that truly
  need bytes touch it — projections/filters/joins run on the (tiny)
  metadata struct, so Catalyst prunes the heavy column out of every scan
  that doesn't decode;
- decode/resize/frame-sample run in ``mapInPandas``: Arrow ships each
  partition's payloads to Python in batches (no per-row pickling), and the
  UDF yields small fixed-width feature frames, never re-emitting the bytes;
- the codec boundary is TIERED (``decode_payload``): ``image/png`` has a
  real zero-dependency codec (operators/imaging — stdlib zlib + numpy, the
  full filter set of the public PNG spec), other ``image/*`` mimes use
  Pillow when importable (production clusters), the synthetic ``fake/*``
  mimes keep the deterministic digest codec that the oracle-gated driver
  queries hash against, and audio/video fail loudly (ffmpeg/librosa are
  not installed) with per-row ok=false degradation instead of job death.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, mime string, width int, height int, n_bytes bigint, payload binary"
)

FEATURE_DIM = 8
FEATURE_SCHEMA = f"media_id bigint, mime string, ok boolean, feature array<double>"


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed JVM-side (no Python, no decode):
    size + content digest — enough for dedup/routing without touching codecs."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("bigint")).withColumn(
        "digest", F.sha2(F.col(payload_col), 256)
    )


def decode_stub(mime: str, payload: bytes) -> list[float]:
    """Codec boundary for the ORACLE-GATED tier: ``fake/*`` payloads
    produce a deterministic 8-dim feature from the sha256 digest (so the
    driver-graded queries and tests have stable expected values).  Real
    mime types route through :func:`decode_payload` instead."""
    if mime.startswith("fake/"):
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[:FEATURE_DIM]]
    raise NotImplementedError(
        f"decode_stub only handles fake/* payloads, got {mime!r}; "
        "use decode_payload for real formats"
    )


def decode_payload(mime: str, payload: bytes) -> list[float]:
    """Codec front door, tiered by what is actually importable:

    1. ``fake/*``   -> deterministic digest feature (oracle tier, above);
    2. ``image/png``-> the zero-dependency real codec in operators/imaging
                       (stdlib zlib + numpy — always available here), real
                       pixels -> dims/moments feature vector;
    3. other image/* -> Pillow if importable (production clusters);
    4. everything else (audio/video) -> loud NotImplementedError — callers
       degrade the row to ok=false rather than pretending.
    """
    if mime.startswith("fake/"):
        return decode_stub(mime, payload)
    if mime == "image/png":
        from aws_etl_fiap_spark.operators import imaging

        return imaging.image_features(imaging.decode_png(payload), FEATURE_DIM)
    if mime.startswith("image/"):
        try:
            import io

            from PIL import Image  # optional: present on real clusters

            import numpy as np

            from aws_etl_fiap_spark.operators import imaging

            arr = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
            return imaging.image_features(arr, FEATURE_DIM)
        except ImportError:
            raise NotImplementedError(
                f"decoder for {mime!r} requires Pillow, which is not "
                "installed in this environment (PNG works without it)"
            ) from None
    raise NotImplementedError(
        f"decoder for {mime!r} requires codec libraries (ffmpeg/librosa) "
        "not present in this environment"
    )


def extract_features(df: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, vectorized I/O).

    Per-row failures degrade to ok=false + NULL feature instead of killing
    the 100 TB job; ``batch_limit`` bounds peak Python memory per batch when
    payloads are large.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats, oks = [], []
                for mime, payload in zip(chunk["mime"], chunk["payload"]):
                    try:
                        feats.append(decode_payload(mime, bytes(payload)))
                        oks.append(True)
                    except (NotImplementedError, ValueError):
                        # unsupported codec OR malformed payload: poison
                        # rows degrade, they never kill the 100 TB job
                        feats.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "mime": chunk["mime"].values,
                        "ok": oks,
                        "feature": feats,
                    }
                )

    return df.select("media_id", "mime", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_BYTES = 16
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_digest string"
RESIZE_SCHEMA = "media_id bigint, mime string, width int, height int, ok boolean, payload binary"


def frame_sample(df: DataFrame, every_n: int = 4, batch_limit: int = 1024) -> DataFrame:
    """Sample every ``every_n``-th frame from video-like payloads — the
    one-to-MANY media shape (a row fans out to a row per kept frame).

    ``fake/*`` payloads model a video as consecutive FRAME_BYTES-sized
    frames; real codecs would seek keyframes instead (same dataflow, stubbed
    codec). Emitted rows carry a per-frame digest, never the frame bytes:
    downstream dedup/indexing works on fixed-width rows while the heavy
    payload column dies at this operator's input, which is what keeps the
    shuffle volume sane at 100 TB of video.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                ids, idxs, digests = [], [], []
                for media_id, mime, payload in zip(
                    chunk["media_id"], chunk["mime"], chunk["payload"]
                ):
                    if not mime.startswith("fake/"):
                        continue  # real codecs unavailable; route, don't crash
                    raw = bytes(payload)
                    n_frames = len(raw) // FRAME_BYTES
                    for i in range(0, n_frames, every_n):
                        frame = raw[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                        ids.append(media_id)
                        idxs.append(i)
                        digests.append(hashlib.sha256(frame).hexdigest())
                yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_digest": digests})

    return df.select("media_id", "mime", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int, batch_limit: int = 1024) -> DataFrame:
    """Resize payloads to ``width x height`` — the payload-in/payload-out
    shape (output stays binary for the next pipeline stage).

    ``fake/*`` resize is deterministic: the output payload is the sha256
    digest stream of (payload, width, height) truncated/cycled to
    width*height bytes, so tests can assert exact output sizes and content
    stability.  ``image/png`` payloads take the REAL path: decode
    (operators/imaging, zero-dependency), nearest-neighbor resample with a
    deterministic integer index map, re-encode PNG — the output is a valid
    PNG of the requested dimensions.  Unsupported mimes and malformed
    payloads degrade to ok=false + NULL payload per row (a poison image
    must not kill a 100 TB job)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_etl_fiap_spark.operators import imaging

        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                payloads, oks = [], []
                for mime, payload in zip(chunk["mime"], chunk["payload"]):
                    if mime.startswith("fake/"):
                        seed = hashlib.sha256(
                            bytes(payload) + f"|{width}x{height}".encode()
                        ).digest()
                        need = width * height
                        out = (seed * (need // len(seed) + 1))[:need]
                        payloads.append(out)
                        oks.append(True)
                    elif mime == "image/png":
                        try:
                            img = imaging.decode_png(bytes(payload))
                            small = imaging.resize_nearest(img, width, height)
                            payloads.append(imaging.encode_png(small))
                            oks.append(True)
                        except (imaging.PngFormatError, ValueError):
                            payloads.append(None)
                            oks.append(False)
                    else:
                        payloads.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "mime": chunk["mime"].values,
                        "width": width,
                        "height": height,
                        "ok": oks,
                        "payload": payloads,
                    }
                )

    return df.select("media_id", "mime", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for the testdata: treat each document's UTF-8 bytes as an
    opaque ``fake/text`` payload — realistic plumbing (binary column, mime
    routing, metadata) without needing media files in the fixture set."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("fake/text").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def write_payload_files(df: DataFrame, path: str, id_col: str = "media_id",
                        payload_col: str = "payload") -> int:
    """Materialize each binary payload as its own ``<id>.bin`` file under
    ``path`` — the on-disk shape real media corpora arrive in (one object
    per image/audio clip), written distributed via Arrow batches (no
    driver collect, no per-row pickling).  Returns the file count.

    Executors must share ``path``'s filesystem (true on local[*] and on any
    cluster writing to a mounted object store/NFS — same assumption as the
    writers.py sinks).
    """
    import os

    os.makedirs(path, exist_ok=True)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in batches:
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                with open(os.path.join(path, f"{int(mid):012d}.bin"), "wb") as fh:
                    fh.write(bytes(payload))
            n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    counts = df.select(id_col, payload_col).mapInPandas(dump, "n long")
    return int(counts.agg(F.sum("n")).collect()[0][0] or 0)


def read_payload_files(spark, path: str) -> DataFrame:
    """Ingest a blob directory through Spark's native ``binaryFile`` source:
    (path, modificationTime, length, content) rows, with the id parsed back
    from the file name.  This is the 100 TB media-ingest front door —
    distributed file listing, predicate pushdown on path/length, and
    ``spark.sql.files.maxPartitionBytes`` packing many small blobs per
    task.  Note: Spark's file-source planner skips ZERO-length files, so an
    empty payload written by write_payload_files will not reappear here —
    represent emptiness as metadata upstream, never as a 0-byte object."""
    raw = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), r"([0-9]{12})\.bin$", 1).cast("long").alias("media_id"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )
