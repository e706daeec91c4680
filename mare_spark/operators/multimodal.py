"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested — ``binary`` payload columns,
``struct`` metadata, Arrow-batched ``mapInPandas`` decode with a stable
output schema and bounded batch sizes. Decoding comes in three honesty
tiers: REAL header sniffing for PNG/GIF/BMP/JPEG/WAV (:func:`sniff_bytes`),
REAL pure-numpy payload decoding for the formats that are pure byte
arithmetic (24bpp BMP pixels, PCM WAV samples — :func:`decode_bmp` /
:func:`decode_wav`), and import-gated stubs for the codec-library formats
(``decoder="image"``/``"audio"`` raise ``NotImplementedError`` at the
point where PIL/librosa would be called; ``decoder="fake"`` is the
deterministic end-to-end test path).

At 100 TB: payloads stay opaque bytes until the latest possible stage
(decode is the expensive hop, so filter/dedup on metadata FIRST); decode
parallelism is partition-level; Arrow batching keeps the Python boundary
amortized. Frame-sampling/resize compose the same way — a mapInPandas over
(payload, params) → payload'.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from a text fixture: binary payload +
    typed metadata struct (what a real image/audio table looks like)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.lit(1).alias("channels"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a media decoder: md5 → FEATURE_DIM floats
    in [0, 1). Stable across runs/machines."""
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64) / 65536.0


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame" of the
    payload (here: fixed-stride byte slices — a real video decoder would
    substitute keyframe extraction; the Spark shape — explode to
    (id, frame_idx, frame_bytes) with bounded fan-out — is identical).
    """
    from pyspark.sql import functions as F

    # ceil, not floor+1: an exact-multiple payload must not emit a
    # spurious empty trailing frame, and an empty payload emits NO
    # frames (sequence(0,-1) would count DOWN, so the n=0 case is an
    # explicit empty array; explode drops it)
    n = F.least(
        F.ceil(F.length(payload_col) / every_n_bytes), F.lit(max_frames)
    ).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.select(id_col, payload_col, F.explode(idx).alias("frame_idx"))
        .select(
            id_col,
            "frame_idx",
            F.substring(
                F.col(payload_col), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target_bytes: int = 128,
) -> DataFrame:
    """Resize/downsample plumbing: truncate-or-pad each payload to a fixed
    size (stands in for image resize; same contract — fixed-shape binary
    out, map-only, no shuffle)."""
    from pyspark.sql import functions as F

    padded = F.rpad(F.col(payload_col), target_bytes, bytes([0]))
    return df.select(
        F.col(id_col),
        F.substring(padded, 1, target_bytes).alias("payload_resized"),
        F.length(payload_col).alias("original_bytes"),
    )


def decode_bmp(b) -> np.ndarray | None:
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP to a
    ``(height, width, 3)`` uint8 array in the file's own BGR channel
    order, logical top-down row order — REAL pixel decoding in pure
    numpy (the format is byte arithmetic: 54-byte header, rows stored
    bottom-up unless height is negative, each row padded to a 4-byte
    boundary). Anything this slice doesn't cover (other bit depths,
    RLE/bitfields compression, BITMAPCOREHEADER, truncated pixel data)
    returns ``None`` — the degrade-not-raise posture of
    :func:`sniff_bytes`, so a corrupt tail can't kill a scan."""
    import struct

    if b is None:
        return None
    b = bytes(b)
    if len(b) < 54 or b[:2] != b"BM":
        return None
    try:
        (offset,) = struct.unpack("<I", b[10:14])
        (dib,) = struct.unpack("<I", b[14:18])
        if dib < 40:
            return None
        w, h = struct.unpack("<ii", b[18:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        (compression,) = struct.unpack("<I", b[30:34])
    except struct.error:
        return None
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or planes != 1 or bpp != 24 or compression != 0:
        return None
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte multiples
    if offset + stride * h > len(b) or offset < 54:
        return None
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)
    return px if top_down else px[::-1]


def decode_wav(b) -> tuple[np.ndarray, int] | None:
    """Decode a PCM 16-bit RIFF/WAVE payload to ``(samples, rate)`` —
    samples as an ``(n_frames, channels)`` int16 array, little-endian as
    stored — by walking the RIFF chunk chain (fmt may be followed by
    other chunks before data; the canonical 44-byte layout is the common
    case, not an assumption). Non-PCM codecs (float, ADPCM, mp3-in-RIFF
    ...) and malformed chains return ``None``: compressed audio is the
    honest librosa-gated tier, this is the dependency-free PCM slice."""
    import struct

    if b is None:
        return None
    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            codec, channels = struct.unpack("<HH", body[:4])
            (rate,) = struct.unpack("<I", body[4:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if codec != 1 or bits != 16 or channels < 1:
                return None
            fmt = (channels, rate)
        elif cid == b"data":
            if fmt is None:
                return None
            if i + 8 + clen > len(b):
                # truncated data chunk (crawler-cut tail): decoding the
                # partial body would report a successful decode over
                # missing audio — degrade like decode_bmp's truncated-
                # pixel check instead
                return None
            channels, rate = fmt
            n = len(body) // (2 * channels)
            samples = np.frombuffer(
                body, dtype="<i2", count=n * channels
            ).reshape(n, channels)
            return samples, rate
        # chunks are word-aligned: odd lengths carry a pad byte
        i += 8 + clen + (clen & 1)
    return None


def _bmp_features(p) -> list | None:
    px = decode_bmp(p)
    if px is None:
        return None
    f = px.astype(np.float64)
    return [
        float(px.shape[1]), float(px.shape[0]), 3.0,
        float(f[:, :, 0].mean()), float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()), float(f.min()), float(f.max()),
    ]


def _wav_features(p) -> list | None:
    got = decode_wav(p)
    if got is None:
        return None
    samples, rate = got
    f = samples.astype(np.float64)
    n = samples.shape[0]
    return [
        float(samples.shape[1]), float(rate), float(n),
        float(f.mean()) if f.size else 0.0,
        float(np.sqrt((f ** 2).mean())) if f.size else 0.0,
        float(f.min()) if f.size else 0.0,
        float(f.max()) if f.size else 0.0,
        float(n) / rate * 1000.0 if rate else 0.0,
    ]


_REAL_DECODERS = {"bmp": _bmp_features, "wav": _wav_features}


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode binary payloads to fixed-size feature vectors via Arrow-batched
    mapInPandas (vectorized Python; one worker per partition).

    ``decoder="bmp"|"wav"`` are REAL dependency-free decoders
    (:func:`decode_bmp` / :func:`decode_wav`): BMP rows yield
    ``[width, height, channels, mean_b, mean_g, mean_r, min, max]``, WAV
    rows ``[channels, rate, n_frames, mean, rms, min, max, duration_ms]``
    — 8 doubles either way, the module's FEATURE_DIM contract. Payloads
    the decoder doesn't cover degrade to NULL features (n_bytes stays
    real), never an exception mid-scan.

    ``decoder="image"|"audio"|"video"`` remain stubs for the codec-library
    formats: the Spark plumbing (schema, batching, partitioning) is
    identical, only the per-bytes function differs — they raise
    ``NotImplementedError`` where PIL/librosa would be invoked.
    """
    if decoder in ("image", "audio", "video"):
        raise NotImplementedError(
            f"{decoder} decoding requires codec libraries not present in this "
            "environment; decoder='bmp'/'wav' are the dependency-free REAL "
            "slices, decoder='fake' the deterministic test path"
        )
    if decoder != "fake" and decoder not in _REAL_DECODERS:
        raise ValueError(f"unknown decoder: {decoder}")

    # id type derived from the input, not assumed bigint — binaryFile
    # sources naturally key on a string path
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_bytes int, features array<double>"
    decode = _REAL_DECODERS.get(
        decoder, lambda p: _fake_decode(bytes(p)).tolist()
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads propagate as NULL features/n_bytes (the
            # sniffing path's convention) — bytes(None) is a TypeError
            feats = [
                None if p is None else decode(p)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [
                        None if p is None else len(bytes(p))
                        for p in pdf[payload_col]
                    ],
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# REAL header sniffing — magic bytes + container headers, no media libraries
# ---------------------------------------------------------------------------

_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _i32(v: int) -> int | None:
    """Unsigned header fields land in an int32 output schema: a hostile
    or corrupt header with a value past 2^31-1 must DEGRADE to NULL, not
    abort the whole scan at Arrow serialization (the 'corrupt tail must
    not kill the scan' contract)."""
    return v if 0 <= v <= 0x7FFFFFFF else None


def sniff_bytes(b) -> tuple:
    """Parse ``(mime, width, height, channels, sample_rate)`` from raw
    bytes — REAL metadata extraction (unlike the decode stubs): magic-byte
    dispatch + the container's own header layout, pure ``struct``
    arithmetic, no media libraries. Unknown/truncated payloads degrade to
    ``application/octet-stream`` with NULL fields, never an exception —
    at corpus scale a crawler's corrupt tail must not kill the scan.

    Formats: PNG (IHDR dims + color-type channels), GIF87a/89a, BMP
    (BITMAPINFOHEADER, top-down negative heights normalized), JPEG (walks
    the segment chain to the first SOFn frame header), canonical WAV
    (fmt chunk channels + sample rate).
    """
    import struct

    none = ("application/octet-stream", None, None, None, None)
    if b is None:
        return (None, None, None, None, None)
    b = bytes(b)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("image/png", _i32(w), _i32(h),
                    _PNG_CHANNELS.get(b[25]), None)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return ("image/gif", w, h, 3, None)
        if b[:2] == b"BM" and len(b) >= 26:
            # only BITMAPINFOHEADER-or-later (DIB size >= 40) carries
            # 32-bit dims at offset 18 — a 12-byte BITMAPCOREHEADER has
            # 16-bit dims there and would parse to garbage, poisoning
            # metadata-first filtering; degrade instead
            (dib,) = struct.unpack("<I", b[14:18])
            if dib < 40:
                return ("image/bmp", None, None, None, None)
            w, h = struct.unpack("<ii", b[18:26])
            return ("image/bmp", _i32(abs(w)), _i32(abs(h)), 3, None)
        if b[:3] == b"\xff\xd8\xff":
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker = b[i + 1]
                if marker in _SOF_MARKERS:
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return ("image/jpeg", w, h, b[i + 9], None)
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                (seg_len,) = struct.unpack(">H", b[i + 2:i + 4])
                i += 2 + seg_len
            return ("image/jpeg", None, None, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and b[12:16] == b"fmt " and len(b) >= 28:
            (channels,) = struct.unpack("<H", b[22:24])
            (rate,) = struct.unpack("<I", b[24:28])
            return ("audio/wav", None, None, channels, _i32(rate))
    except (struct.error, IndexError):
        return none
    return none


def synthesize_media_payload(
    kind: str, *, width: int = 0, height: int = 0,
    channels: int = 1, sample_rate: int = 0, body: bytes = b"",
) -> bytes:
    """Build a minimal VALID header of the given format around ``body`` —
    the deterministic fixture generator for the sniffing path (the parquet
    fixtures carry no real media, so tests and the registered query
    synthesize payloads whose parsed metadata is known arithmetic).
    Headers follow the real specs (PNG IHDR color type 6 = RGBA, JPEG
    APP0+SOF0 chain, canonical 44-byte WAV preamble), so :func:`sniff_bytes`
    is exercised on format-true layouts, not just self-consistent bytes.
    """
    import struct

    if kind == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 6, 0, 0, 0])
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + ihdr + b"\x00\x00\x00\x00" + body)
    if kind == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + body
    if kind == "bmp":
        return (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
                + struct.pack("<ii", width, height) + body)
    if kind == "bmp24":
        # a COMPLETE uncompressed 24bpp BMP (not just a sniffable header):
        # ``body`` is the logical top-down unpadded BGR pixel bytes
        # (width*height*3); rows are stored bottom-up and padded to
        # 4-byte boundaries per the spec, so decode_bmp must really undo
        # the file layout to recover ``body``
        if len(body) != width * height * 3:
            raise ValueError(
                f"bmp24 body must be width*height*3={width * height * 3} "
                f"bytes, got {len(body)}"
            )
        stride = (width * 3 + 3) & ~3
        pad = b"\x00" * (stride - width * 3)
        rows = [
            body[y * width * 3 : (y + 1) * width * 3] + pad
            for y in range(height - 1, -1, -1)
        ]
        pixels = b"".join(rows)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
            len(pixels), 2835, 2835, 0, 0,
        )
        filehdr = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
        return filehdr + dib + pixels
    if kind == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof0 = (b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08"
                + struct.pack(">HH", height, width) + b"\x03"
                + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
        return b"\xff\xd8" + app0 + sof0 + body
    if kind == "wav":
        fmt = (b"fmt " + struct.pack("<I", 16)
               + struct.pack("<HH", 1, channels)
               + struct.pack("<I", sample_rate)
               + struct.pack("<IHH", sample_rate * channels * 2,
                             channels * 2, 16))
        data = b"data" + struct.pack("<I", len(body)) + body
        return (b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data))
                + b"WAVE" + fmt + data)
    raise ValueError(f"unknown kind: {kind}")


def sniff_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Append parsed ``(mime, width, height, channels, sample_rate)`` for a
    binary payload column via :func:`sniff_bytes` — Arrow-batched scalar
    UDF, scan-side (zero shuffle): the metadata-first posture the module
    docstring prescribes (filter/dedup/route on sniffed metadata BEFORE
    any expensive decode hop touches the bytes).
    """
    @F.pandas_udf(
        "struct<mime:string,width:int,height:int,"
        "channels:int,sample_rate:int>"
    )
    def sniff(payloads: pd.Series) -> pd.DataFrame:
        rows = [sniff_bytes(p) for p in payloads]
        # object dtype keeps None as None (no float-NaN coercion of the
        # nullable int fields on the way into Arrow)
        return pd.DataFrame(
            rows,
            columns=["mime", "width", "height", "channels", "sample_rate"],
            dtype=object,
        )

    out = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        sniff(F.col(payload_col)).alias("_m"),
    )
    return out.select(
        id_col, *keep_cols,
        F.col("_m.mime").alias("mime"),
        F.col("_m.width").alias("width"),
        F.col("_m.height").alias("height"),
        F.col("_m.channels").alias("channels"),
        F.col("_m.sample_rate").alias("sample_rate"),
    )


def decode_media_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mime-routed REAL decode report: sniff each payload's format from
    its magic bytes, run the dependency-free decoder for the formats
    pure byte arithmetic covers (BMP 24bpp pixels via :func:`decode_bmp`,
    PCM WAV samples via :func:`decode_wav`), and emit exact-integer
    stats over the decoded values — ``(id, mime, n_units, val_sum,
    val_min, val_max)`` where units are channel bytes (BMP) or int16
    samples (WAV). Integer sums make the row hash-stable across engines
    with no float rounding convention.

    Formats that genuinely need codec libraries (PNG/GIF/JPEG,
    compressed audio) report their sniffed mime with NULL stats — the
    import-gated tier stays gated; nothing raises mid-scan.

    Scale shape: one Arrow-batched mapInPandas riding the scan, zero
    shuffle — decode is the expensive hop, so this runs AFTER
    metadata-first filtering has cut the corpus, and the per-row output
    is 6 scalars regardless of payload size.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, mime string, n_units bigint, "
        "val_sum bigint, val_min int, val_max int"
    )

    def route(p):
        mime = sniff_bytes(p)[0]
        vals = None
        bb = None if p is None else bytes(p)
        # route on the container MAGIC, not the sniffed mime: sniff_bytes
        # checks the canonical layout (WAV fmt chunk at byte 12), but
        # decode_wav's chunk walk handles non-canonical chains (JUNK/LIST
        # before fmt) that sniffing reports as octet-stream — the decoder
        # decides, and a successful decode corrects the mime
        if bb and bb[:2] == b"BM":
            px = decode_bmp(p)
            if px is not None:
                vals = px.astype(np.int64).ravel()
                mime = "image/bmp"
        elif bb and bb[:4] == b"RIFF" and bb[8:12] == b"WAVE":
            got = decode_wav(p)
            if got is not None:
                vals = got[0].astype(np.int64).ravel()
                mime = "audio/wav"
        if vals is None or vals.size == 0:
            return (mime, None, None, None, None)
        return (
            mime, int(vals.size), int(vals.sum()),
            int(vals.min()), int(vals.max()),
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [route(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                rows,
                columns=["mime", "n_units", "val_sum", "val_min", "val_max"],
                dtype=object,
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)
