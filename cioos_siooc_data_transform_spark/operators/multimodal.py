"""Multimodal column plumbing (beyond-reference scope).

Images/audio/video are opaque `binary` columns plus typed metadata structs.
The Spark-side plumbing — schema, Arrow batching, mapInPandas signatures,
partition sizing — is real and tested; the actual codec step is stubbed
(image/audio libraries are not in this container) behind
`decode_image_stub`, which either raises NotImplementedError (real mode)
or produces a deterministic fake (test mode).

Scale design (100 TB): binary payloads dominate partition size, so
`maxPartitionBytes`-sized input splits keep Arrow batches bounded;
mapInPandas streams batches (never materializes a partition); decoded
features are small fixed-width columns, so the stage output shrinks by
orders of magnitude — decode early, project immediately.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<mime:string, n_bytes:long, source:string>"
)

FEATURE_SCHEMA = (
    "doc_id long, width long, height long, n_pixels long, checksum string"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str, source_col: str) -> DataFrame:
    """Build a media table from a text corpus: payload = UTF-8 bytes
    (stands in for real image bytes; the plumbing is identical)."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def _sniff_dimensions(b: bytes) -> tuple[int, int] | None:
    """Pure-stdlib dimension decode from container headers — PNG IHDR,
    GIF logical-screen descriptor, JPEG SOF segment. Returns None for
    unrecognized formats (full pixel decode needs a codec library)."""
    import struct

    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a start-of-frame
        sof = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
        i = 2
        # <= so an SOF whose height/width fields end exactly at the
        # buffer end is still read (unpack needs bytes [i+5, i+9))
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                # spec-legal fill byte: the next byte is the real marker
                i += 1
                continue
            if marker in sof:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h)
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length field
                continue
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            i += 2 + seglen
    return None


def decode_image_stub(payload: bytes, fake: bool) -> tuple[int, int]:
    """Codec boundary.

    ``fake=True`` (test mode) derives deterministic dimensions from the
    payload length so downstream plumbing is exercised end-to-end.

    ``fake=False`` (real mode) decodes actual image bytes: via PIL when
    the library is importable (full decode), else via the pure-stdlib
    header sniffer for PNG/GIF/JPEG (real dimensions, no pixel access).
    Only an unrecognized format with no PIL raises NotImplementedError —
    the documented limit of a container with no image codec libraries.
    """
    if fake:
        n = len(payload)
        width = (n % 64) + 16
        height = (n % 48) + 16
        return width, height
    try:
        import io

        from PIL import Image  # optional dependency, absent in container
    except ImportError:
        pass
    else:
        # A payload PIL cannot identify (corrupt/unknown format) must
        # fall through to the header sniffer / NotImplementedError —
        # behavior should not flip with an unrelated installed package,
        # so only a SUCCESSFUL decode returns from this branch.
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height
        except Exception:
            pass
    dims = _sniff_dimensions(payload)
    if dims is None:
        raise NotImplementedError(
            "unrecognized image format and no PIL available; install an "
            "image codec library for full decode"
        )
    return dims


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Streams pandas batches; one python call per batch (not per row); output
    is narrow fixed-width columns.
    """
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            widths, heights, sums = [], [], []
            for payload in pdf["payload"]:
                w, h = decode_image_stub(bytes(payload), fake=fake_decode)
                widths.append(w)
                heights.append(h)
                sums.append(hashlib.md5(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": widths,
                    "height": heights,
                    "n_pixels": [w * h for w, h in zip(widths, heights)],
                    "checksum": sums,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_offset long, frame_sig string"


def sample_frames(media: DataFrame, every_k: int = 2, fake_decode: bool = True) -> DataFrame:
    """Frame sampling for video-typed payloads: every k-th frame of each
    payload is emitted as its own row — the 1→N mapInPandas shape (one
    input row explodes into a bounded set of frame rows), which is how a
    real frame sampler's batch plumbing differs from 1→1 feature
    extraction. The decode is the same stubbed codec boundary as
    decode_image_stub: frame count/stride derive deterministically from
    payload length, the frame signature from payload bytes + index.

    Scale: output rows ≈ input rows × frames/k with small fixed-width
    columns; the wide payload is dropped inside the stage, so the shuffle
    after sampling moves only the narrow frame rows.
    """
    import hashlib

    import pandas as pd

    if not fake_decode:
        raise NotImplementedError(
            "video frame decode requires a codec library; install one and "
            "replace the fake frame deriver"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, offs, sigs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                n_frames = (n % 10) + 2
                stride = n // n_frames
                for idx in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(idx)
                    offs.append(idx * stride)
                    sigs.append(hashlib.md5(b + str(idx).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame_sig": sigs,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


FPS_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_ts_ms long, native_fps long, "
    "frame_sig string"
)


def sample_frames_at_fps(
    media: DataFrame, target_fps: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Variable-frame-rate sampling: each payload has its OWN native frame
    rate (real corpora mix 10/12/15/24 fps material), and the sampler
    emits the frame nearest each uniform target-rate timestamp —
    frame_idx = (j · native_fps) DIV target_fps for j = 0, 1, … while the
    index stays inside the clip. All integer arithmetic so the stub is
    engine-mirrorable; the codec boundary is the same documented stub as
    sample_frames (native_fps and frame count derive deterministically
    from payload length).

    Scale: same 1→N mapInPandas shape as sample_frames; output rows ≈
    duration × target_fps per clip regardless of native rate, so skew
    follows clip length, not encoding.
    """
    import hashlib

    import pandas as pd

    if not fake_decode:
        raise NotImplementedError(
            "video frame decode requires a codec library; install one and "
            "replace the fake frame deriver"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, tss, fpss, sigs = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                native_fps = (n % 7) + 10
                n_frames = (n % 30) + 5
                j = 0
                while True:
                    idx = (j * native_fps) // target_fps
                    if idx >= n_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(idx)
                    tss.append(idx * 1000 // native_fps)
                    fpss.append(native_fps)
                    sigs.append(
                        hashlib.md5(b + b":" + str(idx).encode()).hexdigest()
                    )
                    j += 1
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_ts_ms": tss,
                    "native_fps": fpss,
                    "frame_sig": sigs,
                }
            )

    return media.mapInPandas(run, schema=FPS_FRAME_SCHEMA)
