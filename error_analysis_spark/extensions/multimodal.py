"""Multimodal asset columns for training-data pipelines.

Assets (image/audio/video) are opaque `binary` payloads with typed
metadata, processed by Arrow-batched `mapInPandas` stages:

    assets: asset_id BIGINT, kind STRING ('image'|'audio'|'video'),
            payload BINARY, meta STRUCT<width INT, height INT,
            sample_rate INT, n_frames INT, codec STRING>

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes, deterministic outputs — is real and tested. Image decode is
REAL for PPM (P6), uncompressed 24-bit BMP, and PNG (stdlib-zlib
inflate + unfilter); audio decode is REAL for PCM16 WAV — actual
byte-level parsers, no codec library. Compressed formats beyond PNG
(jpeg/...) and video containers try PIL (images only) and otherwise
fall back to a deterministic fake decoder (payload
bytes → digest-tiled array of the shape the metadata declares); every
decoded row carries a `decode_src` column ('real'|'stub') so audits
can tell which rows exercised real bytes. Swapping in a full codec
library changes ONE function; every distributed piece stays as-is.

Scale notes: payload columns are large — the asset table should be
stored with `spark.sql.parquet.columnarReaderBatchSize` tuned down and
read with column pruning (metadata-only queries never touch `payload`;
verified by `.explain` ReadSchema). The `batch_rows` chunking bounds
peak NUMPY work per step; the number of payloads resident in one Arrow
batch is bounded by `spark.sql.execution.arrow.maxRecordsInBatch` —
for multi-MB payloads SET THAT CONF (e.g. 16) alongside batch_rows, it
is the only knob that limits Arrow-batch memory.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = ("asset_id bigint, kind string, payload binary, "
                "width int, height int, sample_rate int, n_frames int, "
                "codec string")

KINDS = ("image", "audio", "video")


# --------------------------------------------------------------------------
# deterministic synthetic assets (the fixture generator)
# --------------------------------------------------------------------------

def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42,
                 payload_bytes: int = 4096) -> DataFrame:
    """Deterministic fake asset table: payload = seeded bytes; metadata
    consistent with kind (images get width/height, audio sample_rate,
    video n_frames)."""
    rows = []
    for i in range(n):
        rs = np.random.RandomState(seed + i)
        kind = KINDS[i % len(KINDS)]
        payload = rs.bytes(payload_bytes)
        rows.append((
            i, kind, bytearray(payload),
            int(16 + 8 * (i % 13)) if kind in ("image", "video") else None,
            int(16 + 8 * (i % 7)) if kind in ("image", "video") else None,
            16000 if kind == "audio" else None,
            int(8 + i % 24) if kind == "video" else None,
            {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        ))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# probe real codecs ONCE per process (a failed import inside the per-row
# decode path re-runs the full import machinery on every asset)
try:  # pragma: no cover - real codec path needs PIL
    from PIL import Image as _PIL
except ImportError:
    _PIL = None


def _i(v) -> int | None:
    """Nullable INT columns surface as float (NaN) in Arrow→pandas
    batches; coerce back before shape arithmetic."""
    return None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v)


# --------------------------------------------------------------------------
# real byte-parsing decoders for the two trivial uncompressed image
# formats (pure numpy — no codec library needed), then the stub
# --------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → H×W×3 uint8. Real byte parsing:
    whitespace-delimited header with '#' comment lines, then raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: three ints after the magic, skipping comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # single whitespace byte after maxval
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                           offset=pos)
    return raster.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """H×W×3 uint8 → binary PPM bytes (the test-side inverse)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → H×W×3 uint8 (BGR→RGB, bottom-up rows,
    4-byte row padding — the real on-disk layout)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
    return (img[::-1] if bottom_up else img).copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """H×W×3 uint8 → uncompressed 24-bit BMP bytes (test-side inverse)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    data = rows.tobytes()
    header = (b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
              + (2835).to_bytes(4, "little") * 2
              + (0).to_bytes(4, "little") * 2)
    return header + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Real stdlib-only PNG decode → H×W×3 uint8: chunk walk, zlib
    inflate of the IDAT stream, per-scanline unfilter for all five
    filter types (None/Sub/Up/Average/Paeth). Supports bit depth 8,
    color types 0 (gray, expanded ×3), 2 (RGB), 6 (RGBA, alpha
    dropped), no interlace. Filters 1/3/4 carry a sequential per-byte
    data dependency, so those rows unfilter in a Python loop — fine for
    the bounded thumbnails this stage handles; a throughput deployment
    swaps in a codec library via the PIL branch below."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, bytearray()
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # data + 4-byte CRC
        if ctype == b"IHDR":
            w, h, depth, color, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or color not in (0, 2, 6) or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color}, "
                         f"interlace={interlace})")
    nch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(nch, stride):
                row[i] = (int(row[i]) + int(row[i - nch])) & 0xFF
        elif ft == 2:  # Up — no intra-row dependency, vectorized
            row = ((row.astype(np.int16) + prev) & 0xFF).astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(row[i - nch]) if i >= nch else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                         else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = row
        prev = row
    img = out.reshape(h, w, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    elif nch == 4:
        img = img[..., :3]
    return np.ascontiguousarray(img)


def encode_png(arr: np.ndarray, filters=None) -> bytes:
    """H×W×3 uint8 → PNG bytes (test-side inverse). `filters`: per-row
    filter types (ints 0-4) to exercise every unfilter branch in
    `decode_png`; default all-0 (None). Forward filtering reads only
    ORIGINAL byte values, so every type vectorizes."""
    h, w, _ = arr.shape
    arr = arr.astype(np.uint8)
    if filters is None:
        filters = [0] * h
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int16)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int16)
        left = np.concatenate([np.zeros(3, np.int16), row[:-3]])
        upleft = np.concatenate([np.zeros(3, np.int16), prev[:-3]])
        ft = int(filters[y])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - ((left + prev) >> 1)
        elif ft == 4:
            p = left + prev - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = row - pred
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        raw.append(ft)
        raw += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_wav(payload: bytes) -> np.ndarray:
    """Real stdlib-only WAV decode → float32[n] in [-1, 1]: RIFF chunk
    walk, PCM16 little-endian samples, multi-channel mixed to mono
    (mean of channels). Raises on non-PCM / non-16-bit payloads — those
    quarantine to the stub like any corrupt shard."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n_ch = bits = fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, n_ch, _rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt != 1 or bits != 16 or n_ch < 1:
        raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits}, "
                         f"channels={n_ch})")
    n = len(data) // (2 * n_ch)
    if n == 0:
        # a zero-sample payload would surface NaN feature stats where
        # the stub always yields a full-length array — treat like any
        # corrupt shard (quarantine to the stub)
        raise ValueError("WAV data chunk holds no complete sample")
    pcm = np.frombuffer(data, dtype="<i2", count=n * n_ch)
    samples = pcm.reshape(n, n_ch).astype(np.float32).mean(axis=1)
    return samples / 32768.0


def encode_wav(arr: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float array in [-1, 1] → mono PCM16 WAV bytes (test-side
    inverse)."""
    pcm = np.clip(np.asarray(arr, dtype=np.float64) * 32768.0,
                  -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# --------------------------------------------------------------------------
# decode dispatch — a real deployment replaces only the codec branch
# --------------------------------------------------------------------------

def decode_payload_src(payload: bytes, kind: str, width: int | None,
                       height: int | None, sample_rate: int | None,
                       n_frames: int | None) -> tuple[np.ndarray, str]:
    """Decode an asset payload to (array, decode_src) — image: H×W×3
    uint8, audio: float32[n], video: F×H×W×3 uint8. `decode_src` is
    'real' when actual payload bytes were parsed (PPM/BMP/PNG byte
    parsers or PIL) and 'stub' for the deterministic fallback, so
    downstream audits can tell which rows exercised real bytes.

    Image order: real in-container parsers first (uncompressed PPM/BMP
    + stdlib-zlib PNG by magic bytes — actual byte-level decoding, no
    codec library), then PIL if present (jpeg/...), then the
    DETERMINISTIC fake derived from the payload bytes — same payload ⇒
    same array on any executor, so downstream features stay testable
    either way.
    """
    if kind == "image":
        try:
            if payload[:2] == b"P6":
                return decode_ppm(payload), "real"
            if payload[:2] == b"BM":
                return decode_bmp(payload), "real"
            if payload[:8] == _PNG_SIG:
                return decode_png(payload), "real"
        except (ValueError, IndexError, zlib.error, struct.error):
            # corrupt/truncated shard: fall through (a real pipeline
            # quarantines these rows, it never fails the whole job)
            pass
    if kind == "audio":
        try:
            if payload[:4] == b"RIFF":
                return decode_wav(payload), "real"
        except (ValueError, IndexError, struct.error):
            pass  # corrupt shard: quarantine to the stub
    if _PIL is not None and kind == "image":  # pragma: no cover
        import io
        try:
            return np.asarray(_PIL.open(io.BytesIO(payload))), "real"
        except Exception:
            # undecodable bytes (synthetic fixtures, corrupt shards)
            # fall through to the deterministic fake — a real pipeline
            # quarantines these rows, it never fails the whole job
            pass
    # tile the payload's sha256 digest to the declared shape: same
    # payload ⇒ same array on any executor, at memcpy speed (a seeded
    # RNG fill costs ~100× more and measures the stub, not the
    # distributed plumbing around it)
    base = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    if kind == "image":
        return np.resize(base, (height, width, 3)), "stub"
    if kind == "audio":
        n = sample_rate or 16000
        return ((np.resize(base, n).astype(np.float32) - 127.5) / 127.5,
                "stub")
    if kind == "video":
        return np.resize(base, (n_frames, height, width, 3)), "stub"
    raise NotImplementedError(f"unknown asset kind: {kind}")


def decode_payload(payload: bytes, kind: str, width: int | None,
                   height: int | None, sample_rate: int | None,
                   n_frames: int | None) -> np.ndarray:
    """Array-only form of `decode_payload_src` (the common call)."""
    return decode_payload_src(payload, kind, width, height, sample_rate,
                              n_frames)[0]


# --------------------------------------------------------------------------
# distributed stages (mapInPandas — Arrow batches, bounded rows)
# --------------------------------------------------------------------------

FEATURE_SCHEMA = ("asset_id bigint, kind string, n_bytes int, "
                  "shape array<int>, mean_value double, std_value double, "
                  "decode_src string")


def extract_features(assets: DataFrame, batch_rows: int = 16) -> DataFrame:
    """Decode + per-asset feature stats via `mapInPandas`. Payloads are
    heavy, so batches are re-chunked to ≤ batch_rows rows before decode
    (one oversized Arrow batch would hold every payload in memory).
    `decode_src` records per row whether real bytes were parsed
    ('real') or the deterministic stub filled in ('stub')."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                out = []
                for r in chunk.itertuples(index=False):
                    arr, src = decode_payload_src(
                        bytes(r.payload), r.kind, _i(r.width), _i(r.height),
                        _i(r.sample_rate), _i(r.n_frames))
                    out.append({
                        "asset_id": r.asset_id, "kind": r.kind,
                        "n_bytes": len(r.payload),
                        "shape": list(arr.shape),
                        "mean_value": float(arr.mean()),
                        "std_value": float(arr.std()),
                        "decode_src": src,
                    })
                yield pd.DataFrame(out)

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, out_w: int = 32, out_h: int = 32,
                  batch_rows: int = 16) -> DataFrame:
    """Image resize stage (nearest-neighbor on the decoded array — works
    on both real and fake decodes). Output: asset_id, out payload stats
    (the resized array re-serialized as bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                out = []
                for r in chunk.itertuples(index=False):
                    arr = decode_payload(bytes(r.payload), r.kind, _i(r.width),
                                         _i(r.height), _i(r.sample_rate),
                                         _i(r.n_frames))
                    yi = (np.arange(out_h) * arr.shape[0] // out_h)
                    xi = (np.arange(out_w) * arr.shape[1] // out_w)
                    resized = arr[yi][:, xi]
                    out.append({
                        "asset_id": r.asset_id,
                        "payload": resized.tobytes(),
                        "width": out_w, "height": out_h,
                    })
                yield pd.DataFrame(out)

    return (assets.where(F.col("kind") == "image")
            .mapInPandas(run, "asset_id bigint, payload binary, "
                              "width int, height int"))


def sample_frames(assets: DataFrame, every: int = 4,
                  batch_rows: int = 8) -> DataFrame:
    """Video frame sampling: decode, keep every `every`-th frame, emit
    one row per kept frame (UDTF-style expansion inside mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                out = []
                for r in chunk.itertuples(index=False):
                    arr = decode_payload(bytes(r.payload), r.kind, _i(r.width),
                                         _i(r.height), _i(r.sample_rate),
                                         _i(r.n_frames))
                    for fi in range(0, arr.shape[0], every):
                        out.append({
                            "asset_id": r.asset_id, "frame_idx": fi,
                            "mean_value": float(arr[fi].mean()),
                        })
                yield pd.DataFrame(out)

    return (assets.where(F.col("kind") == "video")
            .mapInPandas(run, "asset_id bigint, frame_idx int, "
                              "mean_value double"))


def payload_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only scan: never touches decode, and with column pruning
    never reads `payload` bytes beyond the length/hash columns requested.
    Fully SQL-expressible → oracle-checkable."""
    return assets.groupBy("kind").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.count_distinct(F.md5("payload")).alias("n_distinct_payloads"),
        F.round(F.avg(F.coalesce(F.col("width"), F.lit(0))), 4)
         .alias("avg_width"),
    )
