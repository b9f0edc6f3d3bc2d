"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (north-star requirement): image/audio/video payloads live in a
``binary`` column next to a typed metadata struct; decode / feature
extraction / resize / frame-sampling run as **Arrow-batched Pandas UDFs
over mapInPandas** so each Python worker touches a columnar batch, never a
row.

Decoding is REAL for header-parseable formats that need no codec library:
24-bit BMP (``decode_bmp`` — width/height/channel means from the raw
pixel array) and 16-bit PCM WAV (``decode_wav`` — sample rate / duration /
RMS from the RIFF chunk walk). ``extract_features`` dispatches on the
``mime`` column; payloads in any other format get deterministic byte-level
statistics (``_byte_features``) — the swap-point for PIL/ffmpeg in a
production image with codec libs is the ``_FEATURE_DECODERS`` table.

Scale: payloads dominate storage, so the asset table is partitioned by
(modality, size band) and feature extraction is a map-only pass — no
shuffle at all until features aggregate. Keep batches small
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so a batch of 10 MB
videos fits the Python worker heap.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every binary payload.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        # False when a decoder-mapped mime failed to parse and the row
        # fell back to byte statistics — corrupt assets are quarantinable
        # downstream instead of invisible
        T.StructField("decode_ok", T.BooleanType(), True),
    ]
)


# ---------------------------------------------------------------------------
# Dependency-free codecs: 24-bit BMP and 16-bit PCM WAV.  Both formats are
# fully described by their headers, so a struct-based parser IS a real
# decoder — no PIL/ffmpeg required.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Encode a 24-bit bottom-up BMP. ``pixels`` is ``width*height*3``
    BGR bytes, row-major from the top row (this function flips to BMP's
    bottom-up order and pads rows to 4 bytes)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 BGR bytes")
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = [
        pixels[r * row_bytes : (r + 1) * row_bytes] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    ]
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def _bmp_pixels(payload: bytes) -> np.ndarray:
    """The (height, width, 3) float64 pixel array of a 24-bit uncompressed
    BMP, top-down. Raises ValueError on anything that is not such a BMP.
    Shared by the statistics decoder and the perceptual hash."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    _, width, height, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    n_rows = abs(height)
    if width <= 0 or n_rows == 0:
        # a crafted header with zero/negative dimensions must fail as a
        # normal corrupt payload (the Arrow UDFs catch ValueError), not
        # surface later as an IndexError from empty-array indexing
        raise ValueError(f"degenerate BMP dimensions ({width}x{height})")
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * n_rows, offset=data_offset)
    px = px.reshape(n_rows, stride)[:, :row_bytes].reshape(n_rows, width, 3).astype(np.float64)
    if height > 0:  # bottom-up storage → flip to top-down
        px = px[::-1]
    return px


def ahash_bmp(payload: bytes, grid: int = 8) -> int:
    """64-bit average-hash (aHash) of a 24-bit BMP: grayscale, sample to
    a ``grid``×``grid`` raster (nearest-index sampling — defined for any
    image ≥ 1×1, unlike average pooling), threshold at the raster mean;
    bit (i·grid+j) is 1 when cell (i, j) is STRICTLY above the mean (ties
    → 0, so a constant image hashes to 0). Returned as a SIGNED 64-bit
    value (two's complement) so it stores in a Spark LongType — the same
    convention as the text simhash. Byte-identical images always collide;
    small pixel perturbations move few bits (verified by unit test)."""
    gray = _bmp_pixels(payload).mean(axis=2)
    h, w = gray.shape
    rows = (np.arange(grid) * h) // grid
    cols = (np.arange(grid) * w) // grid
    raster = gray[np.ix_(rows, cols)]
    bits = (raster > raster.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP: returns width, height, and
    per-channel (b, g, r) means plus gray min/max over the real pixel
    array. Raises ValueError on anything that is not such a BMP."""
    px = _bmp_pixels(payload)
    n_rows, width = px.shape[0], px.shape[1]
    gray = px.mean(axis=2)
    return {
        "width": width,
        "height": n_rows,
        "mean_b": float(px[:, :, 0].mean()),
        "mean_g": float(px[:, :, 1].mean()),
        "mean_r": float(px[:, :, 2].mean()),
        "gray_min": float(gray.min()),
        "gray_max": float(gray.max()),
    }


def encode_wav(samples: list[int] | np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono 16-bit PCM WAV from integer samples in [-32768, 32767]."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data


def decode_wav(payload: bytes) -> dict:
    """Parse a mono 16-bit PCM WAV by walking the RIFF chunk list: returns
    sample rate, sample count, duration_ms, and RMS/min/max of the real
    sample array. Raises ValueError on non-PCM or malformed payloads."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, bits, channels, pcm = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # declared size clamps short on truncation
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt}")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sample_rate is None or pcm is None or bits != 16 or channels != 1:
        raise ValueError("expected mono 16-bit PCM WAV with fmt+data chunks")
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
    n = len(samples)
    return {
        "sample_rate": sample_rate,
        "n_samples": n,
        "duration_ms": 0.0 if n == 0 else n * 1000.0 / sample_rate,
        "rms": 0.0 if n == 0 else float(np.sqrt((samples**2).mean())),
        "sample_min": 0.0 if n == 0 else float(samples.min()),
        "sample_max": 0.0 if n == 0 else float(samples.max()),
    }


def _byte_features(payload: bytes) -> list[float]:
    """Deterministic byte-level statistics for formats without a bundled
    decoder: 8 windowed byte-sum features over near-equal windows that
    cover EVERY byte (np.array_split — a trailing remainder folds into
    the windows rather than being dropped, so payloads differing only in
    their final bytes fingerprint differently). One vectorized numpy pass
    — this runs per-row on the Arrow hot path, where a per-byte Python
    loop would dominate the batch."""
    if not payload:
        return [0.0] * 8
    arr = np.frombuffer(payload, dtype=np.uint8)
    return [
        float(int(w.sum()) % 997) / 997.0 for w in np.array_split(arr.astype(np.int64), 8)
    ]


def _bmp_features(payload: bytes) -> list[float]:
    d = decode_bmp(payload)
    return [
        float(d["width"]), float(d["height"]), d["mean_b"], d["mean_g"],
        d["mean_r"], d["gray_min"], d["gray_max"], 24.0,
    ]


def _wav_features(payload: bytes) -> list[float]:
    d = decode_wav(payload)
    return [
        float(d["sample_rate"]), 1.0, float(d["n_samples"]), d["duration_ms"],
        d["rms"], d["sample_min"], d["sample_max"], 16.0,
    ]


#: mime → decoder producing the 8-float feature vector; the production
#: swap-point for PIL/ffmpeg-backed formats is adding entries here.
_FEATURE_DECODERS = {
    "image/bmp": _bmp_features,
    "audio/wav": _wav_features,
    "audio/x-wav": _wav_features,
}


def _decode(payload: bytes, mime: str | None) -> tuple[list[float], bool]:
    """(features, decode_ok). A corrupt payload of a decoder-mapped mime
    must NOT abort the Spark job — one bad asset in a 100 TB run would
    fail the task, every retry, and the whole job. It falls back to byte
    statistics with ``decode_ok=False`` so the pipeline continues AND the
    corruption is visible/quarantinable downstream (silent fallback would
    be the opposite failure mode)."""
    decoder = _FEATURE_DECODERS.get(mime or "")
    if decoder is None:
        return _byte_features(payload), True
    try:
        return decoder(payload), True
    except (ValueError, struct.error):
        return _byte_features(payload), False


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over asset batches.

    Arrow moves the binary column to Python in columnar batches; each batch
    yields a features frame. This is the canonical slow-path shape: the
    ONLY Python hop in the multimodal pipeline, explicitly batched.
    Per-row decode errors never fail the task (see ``_decode``).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            decoded = [
                _decode(p, m) if p is not None else (None, True)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [f for f, _ in decoded],
                    "decode_ok": [ok for _, ok in decoded],
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_bmp(payload: bytes, target_w: int) -> bytes:
    """REAL nearest-neighbor downsample of a 24-bit BMP to ``target_w``
    columns (height scales proportionally, min 1) — a genuine image
    resize with no codec libraries, built on the same struct parser the
    decode/perceptual-hash paths use. Upsampling requests return the
    payload unchanged (a thumbnail pass must never inflate). Raises
    ValueError on non-BMP input (callers route those to the stub path)."""
    px = _bmp_pixels(payload)  # (h, w, 3) float64, top-down
    h, w = px.shape[0], px.shape[1]
    tw = int(target_w)
    if tw <= 0:
        raise ValueError(f"target_w must be positive, got {target_w}")
    if tw >= w:
        return payload
    th = max(1, (h * tw) // w)
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    small = px[np.ix_(rows, cols)].astype(np.uint8)
    return encode_bmp(tw, th, small.tobytes())


def resize_assets(
    assets: DataFrame, max_bytes: int = 1024, target_w: int | None = None
) -> DataFrame:
    """Resize pass: emit a bounded-size payload per asset plus updated
    metadata — the Spark shape of an image-resize stage (map-only, binary
    in / binary out, metadata struct rewritten).

    With ``target_w`` set, ``image/bmp`` payloads go through a REAL
    nearest-neighbor downsample (``resize_bmp`` — actual pixel
    resampling on the parsed array, r9) with width/height metadata
    updated from the re-encoded image; every other mime — and corrupt
    BMPs — takes the documented STUB path (truncate + byte cap;
    production: PIL thumbnail / ffmpeg scale). Load-bearing either way:
    the mapInPandas batch iteration over binary columns, the output
    schema matching ``ASSET_SCHEMA``, and the no-shuffle plan.
    """

    def one(payload, mime, meta):
        if (
            target_w is not None
            and payload is not None
            and (mime or "") == "image/bmp"
        ):
            try:
                small = resize_bmp(bytes(payload), target_w)
                d = decode_bmp(small)
                return small, {
                    "width": d["width"],
                    "height": d["height"],
                    "duration_ms": meta.get("duration_ms") if meta else None,
                }
            except ValueError:
                pass  # corrupt BMP → stub path below
        p = payload[:max_bytes] if payload is not None and len(payload) > max_bytes else payload
        return p, {
            # `is not None`, not truthiness: width 0 is a KNOWN
            # zero, which a falsy check would erase into NULL
            "width": min(meta["width"], max_bytes)
            if meta and meta.get("width") is not None
            else None,
            "height": meta.get("height") if meta else None,
            "duration_ms": meta.get("duration_ms") if meta else None,
        }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            results = [
                one(p, mi, me)
                for p, mi, me in zip(pdf["payload"], pdf["mime"], pdf["meta"])
            ]
            out["payload"] = [r[0] for r in results]
            out["meta"] = [r[1] for r in results]
            yield out

    return assets.mapInPandas(batches, schema=ASSET_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one row per (asset, frame) — the video analogue of
    explode. STUB decode (equal byte slices stand in for decoded frames;
    production: ffmpeg keyframe extraction), REAL shape: mapInPandas
    yielding a multiplied row count with its own schema, so downstream
    per-frame feature extraction parallelizes over frames, not videos —
    the difference between 1 task per 2-hour video and 1 per frame batch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                step = max(1, len(p) // n_frames)
                for i in range(min(n_frames, len(p))):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(bytes(p[i * step : i * step + step]))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def synthesize_assets(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Build a deterministic asset table from the documents corpus (text
    bytes stand in for media payloads) — exercises the real binary-column
    path end-to-end; the octet-stream mime routes these payloads to the
    byte-statistics decoder."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length("text").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def synthesize_media_assets(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Build an asset table whose payloads are REAL media containers
    synthesized deterministically from document text: 24-bit BMPs whose
    pixel bytes are the text bytes (``modality='image'``) or mono 16-bit
    PCM WAVs whose samples derive from the text bytes
    (``modality='audio'``). The encode runs in the same Arrow-batched
    mapInPandas shape as decode, so both directions of the binary-column
    pipeline are exercised without codec libraries."""
    if modality not in ("image", "audio"):
        raise ValueError(f"unsupported modality {modality!r}")
    mime = "image/bmp" if modality == "image" else "audio/wav"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")
                if modality == "image":
                    # square-ish 24-bit image: pixel bytes = text bytes,
                    # zero-padded to fill width*height*3
                    width = max(1, min(16, (len(raw) + 2) // 3))
                    height = max(1, -(-len(raw) // (width * 3)))
                    pixels = raw.ljust(width * height * 3, b"\x00")
                    payloads.append(encode_bmp(width, height, pixels))
                    metas.append({"width": width, "height": height, "duration_ms": None})
                else:
                    samples = np.frombuffer(raw.ljust(len(raw) + len(raw) % 2, b"\x00"), dtype="<i2")
                    payloads.append(encode_wav(samples, sample_rate=8000))
                    dur = int(len(samples) * 1000 / 8000)
                    metas.append({"width": None, "height": None, "duration_ms": dur})
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": modality,
                    "mime": mime,
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return documents.select("doc_id", "text").mapInPandas(batches, schema=ASSET_SCHEMA)


def image_ahash_df(
    assets: DataFrame, payload_col: str = "payload", id_col: str = "asset_id"
) -> DataFrame:
    """(_id, _sim): the 64-bit perceptual average-hash of every BMP asset
    — the image analogue of ``dedup.simhash_df``. Arrow-batched pandas
    UDF (the binary-column slow-path discipline: one Python hop per
    batch, numpy inside); non-BMP/corrupt payloads yield a null ``_sim``
    and are dropped, never aborting the job (same contract as
    ``extract_features``'s decode_ok)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def ah(col: pd.Series) -> pd.Series:
        out = []
        for payload in col:
            try:
                out.append(ahash_bmp(bytes(payload)))
            except (ValueError, TypeError):
                out.append(None)
        return pd.Series(out, dtype="object")

    return (
        assets.select(F.col(id_col).alias("_id"), ah(F.col(payload_col)).alias("_sim"))
        .where(F.col("_sim").isNotNull())
    )


def near_dup_images_ahash(
    assets: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    max_hamming: int = 3,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Perceptual image near-dup pairs: aHash per asset, then the SAME
    quarter-blocking + exact-Hamming verify the text simhash uses
    (``dedup.hamming_pairs_64`` — pigeonhole-complete for hamming ≤ 3,
    shuffle O(assets × 4) on 16-bit keys, never quadratic). The hash
    table is persisted so both self-join sides read one materialization
    — decoding every image twice is the expensive half here.
    ``max_block`` (the hot-block cap, where degenerate media like blank
    frames pile onto one hash) makes the default LOSSY above 10k rows
    per quarter-key block; ``None`` restores pigeonhole-complete output.
    Returns (id_a, id_b, hamming)."""
    from pyspark import StorageLevel

    from . import dedup as dedup_ops

    sig = image_ahash_df(assets, payload_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    return dedup_ops.hamming_pairs_64(sig, max_hamming, max_block=max_block)


def fingerprint_wav(payload: bytes, n_windows: int = 65) -> int:
    """64-bit audio fingerprint of a mono 16-bit PCM WAV: mean absolute
    amplitude over ``n_windows`` near-equal sample windows (every sample
    covered, trailing remainder folded — the ``_byte_features`` split
    discipline), then bit i = window i+1's energy STRICTLY above window
    i's (the sign-of-delta chain — the shape Shazam-style fingerprints
    reduce to without an FFT dependency). 65 windows → 64 delta bits.
    Signed 64-bit (two's complement) for Spark LongType, same convention
    as ``ahash_bmp``/simhash. Byte-identical audio always collides; a
    localized edit moves only the bits whose windows it touches. Empty
    or shorter-than-``n_windows`` audio is well-defined (empty windows
    have zero energy). Raises ValueError on non-PCM payloads."""
    decode_wav(payload)  # validates the container (raises on non-PCM)
    # re-walk for the raw samples (decode_wav returns statistics only)
    pos, pcm = 12, b""
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"data":
            pcm = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    samples = np.abs(np.frombuffer(pcm, dtype="<i2").astype(np.float64))
    energies = [float(w.mean()) if len(w) else 0.0 for w in np.array_split(samples, n_windows)]
    val = 0
    for i in range(n_windows - 1):
        if energies[i + 1] > energies[i]:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def audio_fingerprint_df(
    assets: DataFrame, payload_col: str = "payload", id_col: str = "asset_id"
) -> DataFrame:
    """(_id, _sim): the 64-bit audio fingerprint of every WAV asset — the
    audio analogue of ``image_ahash_df``; corrupt/non-WAV payloads yield
    null and drop, never aborting the job."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fp(col: pd.Series) -> pd.Series:
        out = []
        for payload in col:
            try:
                out.append(fingerprint_wav(bytes(payload)))
            except (ValueError, TypeError):
                out.append(None)
        return pd.Series(out, dtype="object")

    return (
        assets.select(F.col(id_col).alias("_id"), fp(F.col(payload_col)).alias("_sim"))
        .where(F.col("_sim").isNotNull())
    )


def near_dup_audio_fingerprint(
    assets: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    max_hamming: int = 3,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Audio near-dup pairs: WAV fingerprint per asset through the shared
    quarter-blocking + exact-Hamming pipeline (``dedup.hamming_pairs_64``
    — the third family on that pipeline, after text simhash and image
    aHash). ``max_block`` as in ``near_dup_images_ahash`` (None =
    pigeonhole-complete, default 10k = hot-block lossy).
    Returns (id_a, id_b, hamming)."""
    from pyspark import StorageLevel

    from . import dedup as dedup_ops

    sig = audio_fingerprint_df(assets, payload_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return dedup_ops.hamming_pairs_64(sig, max_hamming, max_block=max_block)


# ---------------------------------------------------------------------------
# Video modality (r12) — frame container, sampling, per-frame near-dup
# ---------------------------------------------------------------------------

#: Magic for the deterministic multi-frame container the video path uses
#: in place of a codec-backed format (the container this repo DEFINES so
#: every stage downstream of the ffmpeg swap-point is real and testable:
#: parse, frame sampling, per-frame hashing, pair aggregation). Layout:
#: ``b"VID0" + u32 n_frames + n_frames * (u32 frame_len + frame_bytes)``,
#: little-endian; each frame is a full standalone 24-bit BMP.
VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[bytes]) -> bytes:
    """Pack standalone frame payloads (BMPs) into the VID0 container."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def decode_video_frames(payload: bytes) -> list[bytes]:
    """Parse a VID0 container into its frame payloads. Raises ValueError
    on malformed input (bad magic, truncated frame table) — the same
    corrupt-payload contract as ``decode_bmp``/``decode_wav``, so Arrow
    UDF callers quarantine instead of aborting the job."""
    if len(payload) < 8 or payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    n = struct.unpack_from("<I", payload, 4)[0]
    frames, pos = [], 8
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated VID0 frame table")
        ln = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        if pos + ln > len(payload):
            raise ValueError("truncated VID0 frame body")
        frames.append(payload[pos : pos + ln])
        pos += ln
    return frames


def synthesize_video_assets(documents: DataFrame, n_frames: int = 4) -> DataFrame:
    """Asset table whose payloads are REAL VID0 containers of ``n_frames``
    24-bit BMP frames synthesized deterministically from document text —
    frame i's pixel bytes are the text bytes rotated by i (np.roll), so
    consecutive frames differ the way real video frames do (same content,
    shifted) while byte-identical texts yield byte-identical videos (the
    planted-pair discipline). Same Arrow-batched mapInPandas shape as
    ``synthesize_media_assets``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for text in pdf["text"]:
                raw = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
                width = max(1, min(16, (len(raw) + 2) // 3))
                height = max(1, -(-max(1, len(raw)) // (width * 3)))
                frames = []
                for i in range(n_frames):
                    rolled = np.roll(raw, i).tobytes() if len(raw) else b""
                    pixels = rolled.ljust(width * height * 3, b"\x00")
                    frames.append(encode_bmp(width, height, pixels))
                payloads.append(encode_video(frames))
                metas.append(
                    {"width": width, "height": height, "duration_ms": n_frames * 40}
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "modality": "video",
                    "mime": "video/x-vid0",
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return documents.select("doc_id", "text").mapInPandas(batches, schema=ASSET_SCHEMA)


def sample_video_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Evenly-spaced frame sampling over REAL VID0 containers — the
    codec-backed upgrade of the byte-slice ``sample_frames`` stub: one
    row per (asset, sampled frame) under ``FRAME_SCHEMA``, each ``frame``
    a standalone BMP ready for per-frame feature extraction / hashing.
    Sampling picks ``n_frames`` evenly-spaced indexes (the ffmpeg
    ``fps=``-filter shape); shorter videos yield all their frames.
    Corrupt containers are skipped, never abort (decode contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    continue
                try:
                    all_frames = decode_video_frames(bytes(p))
                except ValueError:
                    continue
                total = len(all_frames)
                if total == 0:
                    continue
                take = min(n_frames, total)
                picks = [(j * total) // take for j in range(take)]
                for j, fi in enumerate(picks):
                    ids.append(aid)
                    idxs.append(fi)
                    frames.append(all_frames[fi])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def near_dup_videos_framehash(
    assets: DataFrame,
    id_col: str = "asset_id",
    n_frames: int = 4,
    max_hamming: int = 3,
    min_frames_matched: int = 3,
    max_block: int | None = 10_000,
    on_oversize: str = "drop",
) -> DataFrame:
    """Video near-dup pairs: sample frames from the VID0 containers, aHash
    each frame (the image kernel — fourth family on the shared hamming
    pipeline), find per-frame near-collisions with ``dedup.
    hamming_pairs_64``, then aggregate to video pairs that match on at
    least ``min_frames_matched`` ALIGNED frames (same frame_idx — the
    shifted-content invariance real video dedup wants; TMK/CSQ and
    frame-voting systems reduce to exactly this shape).

    Scale: the frame table is ``n_frames``× the asset count — still
    signature-sized (one long per frame) into the blocking join; the
    frame index rides INSIDE the blocking id (composite
    ``asset_id * (n_frames_cap) + frame_idx``, cap 16) so cross-index
    collisions are filtered AFTER the block-confined candidate join, and
    the final groupBy is on candidate pairs only. Returns
    (id_a, id_b, n_frames_matched, max_hamming)."""
    from pyspark import StorageLevel
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    from . import dedup as dedup_ops

    if n_frames > 16:
        raise ValueError("n_frames > 16 breaks the composite frame id")
    # id preconditions enforced, not assumed (r13, ADVICE): the composite
    # blocking id is asset_id*16 + frame_idx on int64, so the id column
    # must be integral (a string/double id would silently truncate or
    # collide) and every value must sit in [0, 2^59) (2^59 * 16 is the
    # int64 edge). Type checked at plan construction; the value bound is
    # an in-plan assert coalesced INTO the composite id so it cannot be
    # pruned and fails loudly on the first violating row.
    id_type = assets.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"near_dup_videos_framehash needs an integral id column; "
            f"{id_col!r} is {id_type.simpleString()}"
        )
    frames = sample_video_frames(assets.withColumnRenamed(id_col, "asset_id"), n_frames)
    # composite id: asset*16 + frame_idx (frame_idx < 16 enforced above)
    aid = F.col("asset_id").cast("long")
    in_range = (aid >= 0) & (aid < F.lit(1 << 59))
    fid = F.coalesce(
        F.assert_true(
            in_range,
            F.concat(
                F.lit("asset_id outside [0, 2^59) breaks the composite "
                      "frame id: "),
                aid.cast("string"),
            ),
        ).cast("long"),
        aid * 16 + F.col("frame_idx"),
    )
    sig = image_ahash_df(
        frames.select(fid.alias("fid"), "frame"),
        payload_col="frame",
        id_col="fid",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = dedup_ops.hamming_pairs_64(
        sig, max_hamming, max_block=max_block, on_oversize=on_oversize
    )
    aligned = pairs.where(
        (F.col("id_a") % 16 == F.col("id_b") % 16)
        & (F.floor(F.col("id_a") / 16) != F.floor(F.col("id_b") / 16))
    )
    return (
        aligned.select(
            F.floor(F.col("id_a") / 16).cast("long").alias("id_a"),
            F.floor(F.col("id_b") / 16).cast("long").alias("id_b"),
            "hamming",
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").cast("long").alias("n_frames_matched"),
            F.max("hamming").cast("int").alias("max_hamming"),
        )
        .where(F.col("n_frames_matched") >= min_frames_matched)
    )
