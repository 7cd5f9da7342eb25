"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

Two tiers:

  * REAL metadata extraction — pure-stdlib container parsers for PNG
    (chunk walk), TIFF (IFD walk incl. EXIF tags), JPEG (segment walk +
    APP1 EXIF, which embeds a TIFF IFD), and RIFF/WAVE (fmt/data chunks +
    16-bit PCM decode). This is the Ray restatement of the reference's
    image metadata loader (image_loader.py:24-76: Pillow format/size +
    exifread tags) built directly on the public format specs — no imaging
    library needed for header/EXIF metadata.
  * STUBBED pixel/PCM *model* kernels — the vision-encoder projection and
    fake-PCM feature stand-ins (`_decode_*_stub`, clearly marked): heavier
    codecs aren't in this container, so these keep the actor-pool plumbing
    (constructor state, small batches for wide binary rows) testable.

The resize/feature/frame-sample stages are the scale additions a
training-data pipeline needs beyond the reference.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime_type", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


_EXIF_TAGS = {256: "width", 257: "height", 271: "make", 272: "model", 274: "orientation"}


def _parse_tiff_ifd(data: bytes) -> dict:
    """TIFF 6.0 IFD walk (also the EXIF payload format inside JPEG APP1).
    Returns width/height/make/model/orientation when present."""
    if len(data) < 8:
        raise ValueError("truncated TIFF")
    if data[:2] == b"II":
        end = "<"
    elif data[:2] == b"MM":
        end = ">"
    else:
        raise ValueError("bad TIFF byte order")
    magic, ifd_off = struct.unpack(end + "HI", data[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    out: dict = {}
    (n_entries,) = struct.unpack(end + "H", data[ifd_off : ifd_off + 2])
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack(end + "HHI", data[off : off + 8])
        if tag not in _EXIF_TAGS:
            continue
        name = _EXIF_TAGS[tag]
        if typ == 3:  # SHORT
            (val,) = struct.unpack(end + "H", data[off + 8 : off + 10])
            out[name] = int(val)
        elif typ == 4:  # LONG
            (val,) = struct.unpack(end + "I", data[off + 8 : off + 12])
            out[name] = int(val)
        elif typ == 2:  # ASCII (NUL-terminated, out-of-line when > 4 bytes)
            if count <= 4:
                raw = data[off + 8 : off + 8 + count]
            else:
                (ptr,) = struct.unpack(end + "I", data[off + 8 : off + 12])
                raw = data[ptr : ptr + count]
            out[name] = raw.rstrip(b"\x00").decode("ascii", "replace")
    return out


def parse_image_metadata(payload: bytes) -> dict:
    """Real image metadata extraction from raw bytes — the Ray-side
    counterpart of the reference's Pillow/exifread loader
    (image_loader.py:24-76): format sniff by magic bytes, dimensions from
    the container header, EXIF tags where the format carries them.

    Returns {format, width, height, make, model, orientation}; missing
    string tags are '', missing orientation is -1. Raises ValueError on
    unknown/corrupt containers (callers route these to error rows)."""
    meta = {"format": "", "width": -1, "height": -1, "make": "", "model": "", "orientation": -1}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandatory and first; walk chunks anyway per spec
        pos = 8
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            if typ == b"IHDR":
                w, h = struct.unpack(">II", payload[pos + 8 : pos + 16])
                meta.update(format="png", width=int(w), height=int(h))
                return meta
            pos += 12 + length
        raise ValueError("PNG without IHDR")
    if payload[:2] in (b"II", b"MM") and len(payload) >= 8:
        tags = _parse_tiff_ifd(payload)
        meta.update(format="tiff", **{k: tags[k] for k in tags})
        return meta
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("bad JPEG marker")
            # 0xFF fill bytes may pad between segments
            while pos < len(payload) and payload[pos + 1 : pos + 2] == b"\xff":
                pos += 1
            marker = payload[pos + 1]
            if marker in (0xD9, 0xDA):  # EOI, or SOS: entropy-coded scan
                break  # follows — metadata never decodes pixels, stop here
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no body
                pos += 2
                continue
            if pos + 4 > len(payload):
                raise ValueError("truncated JPEG segment")
            (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            body = payload[pos + 4 : pos + 2 + seg_len]
            if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                tags = _parse_tiff_ifd(body[6:])
                for k in ("make", "model", "orientation"):
                    if k in tags:
                        meta[k] = tags[k]
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2: frame dims win
                _, h, w = struct.unpack(">BHH", body[:5])
                meta.update(width=int(w), height=int(h))
            pos += 2 + seg_len
        meta["format"] = "jpeg"
        return meta
    raise ValueError("unknown image container")


def parse_wav_metadata(payload: bytes) -> dict:
    """RIFF/WAVE chunk walk: sample_rate, channels, bits, frame count and
    duration_ms from the canonical fmt/data chunks (public RIFF spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _, channels, sample_rate, byte_rate, block_align, bits = fmt
    frames = len(data) // max(1, block_align)
    return {
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_frames": int(frames),
        "duration_ms": int(frames * 1000 // max(1, sample_rate)),
        "pcm": data,
    }


def parse_mp4_metadata(payload: bytes) -> dict:
    """Real MP4/ISO-BMFF metadata from raw bytes (public ISO/IEC 14496-12
    layout, pure stdlib): top-level box walk to ``moov``, ``mvhd`` for
    timescale + movie duration (versions 0 and 1), ``trak`` count and the
    first ``tkhd``'s 16.16-fixed presentation width/height. The byte-real
    companion of the WAV/PNG/TIFF/JPEG parsers above — frame sampling can
    derive durations from bytes instead of a metadata column. Returns
    {brand, timescale, duration_ms, width, height, n_tracks}; raises
    ValueError on non-MP4/corrupt containers."""

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("bad MP4 box size")
            yield typ, pos + hdr, pos + size
            pos += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    meta = {
        "brand": payload[8:12].decode("ascii", "replace"),
        "timescale": -1,
        "duration_ms": -1,
        "width": -1,
        "height": -1,
        "n_tracks": 0,
    }
    try:
        for typ, s, e in walk(0, len(payload)):
            if typ != b"moov":
                continue
            for t2, s2, e2 in walk(s, e):
                if t2 == b"mvhd":
                    ver = payload[s2]
                    if ver == 1:
                        ts, dur = struct.unpack(">IQ", payload[s2 + 4 + 16 : s2 + 4 + 16 + 12])
                    else:
                        ts, dur = struct.unpack(">II", payload[s2 + 4 + 8 : s2 + 4 + 8 + 8])
                    meta["timescale"] = int(ts)
                    meta["duration_ms"] = int(dur * 1000 // ts) if ts else -1
                elif t2 == b"trak":
                    meta["n_tracks"] += 1
                    for t3, s3, _e3 in walk(s2, e2):
                        if t3 == b"tkhd" and meta["width"] < 0:
                            ver = payload[s3]
                            off = s3 + 4 + (84 if ver == 1 else 72)  # past times/ids/flags/matrix
                            w16, h16 = struct.unpack(">II", payload[off : off + 8])
                            meta["width"], meta["height"] = int(w16 >> 16), int(h16 >> 16)
    except (struct.error, IndexError) as exc:
        # truncated mid-box (short largesize header, undersized mvhd/tkhd
        # bodies): honor the documented contract — corrupt container ==
        # ValueError, whatever the stdlib surfaces internally
        raise ValueError(f"truncated MP4 box: {exc}") from exc
    if meta["timescale"] < 0:
        raise ValueError("MP4 without moov/mvhd")
    return meta


class ImageMetadata:
    """Actor-pool stage: binary image column -> real container metadata
    (format, dims, EXIF make/model/orientation). Parse failures become
    error rows (format='error'), mirroring the reference loader's
    None-on-failure contract (image_loader.py:71-76)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("format", "width", "height", "make", "model", "orientation")}
        for payload in batch["payload"].to_pylist():
            try:
                m = parse_image_metadata(payload or b"")
            except ValueError:
                m = {"format": "error", "width": -1, "height": -1, "make": "", "model": "", "orientation": -1}
            for k in rows:
                rows[k].append(m[k])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "format": pa.array(rows["format"], pa.string()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "exif_make": pa.array(rows["make"], pa.string()),
                "exif_model": pa.array(rows["model"], pa.string()),
                "exif_orientation": pa.array(rows["orientation"], pa.int32()),
            }
        )


class AudioMetadata:
    """Actor-pool stage: WAV bytes -> header metadata + real 16-bit PCM
    decode (numpy frombuffer) with integer sum-of-squares and RMS."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("sample_rate", "channels", "duration_ms", "n_samples", "sum_sq", "rms")}
        for payload in batch["payload"].to_pylist():
            try:
                m = parse_wav_metadata(payload or b"")
                pcm = np.frombuffer(m["pcm"], dtype="<i2").astype(np.int64)
                sum_sq = int((pcm * pcm).sum())
                n = len(pcm)
                out["sample_rate"].append(m["sample_rate"])
                out["channels"].append(m["channels"])
                out["duration_ms"].append(m["duration_ms"])
                out["n_samples"].append(n)
                out["sum_sq"].append(sum_sq)
                out["rms"].append(round(float(np.sqrt(sum_sq / n)) if n else 0.0, 6))
            except ValueError:
                for k, v in (("sample_rate", -1), ("channels", -1), ("duration_ms", -1), ("n_samples", -1), ("sum_sq", -1), ("rms", -1.0)):
                    out[k].append(v)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "channels": pa.array(out["channels"], pa.int32()),
                "duration_ms": pa.array(out["duration_ms"], pa.int32()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "sum_sq": pa.array(out["sum_sq"], pa.int64()),
                "rms": pa.array(out["rms"], pa.float64()),
            }
        )


class AudioResample:
    """Actor-pool stage: REAL WAV decode -> integer-factor frame
    decimation (nearest-neighbor resample, the audio analog of the PNG
    NN resize) -> byte-real re-encode at sample_rate // factor. Emits
    the resampled RIFF/WAVE payload plus the verifiable features
    (n_frames, sum_sq of the kept samples); malformed/non-16-bit
    payloads emit -1 error rows (the AudioMetadata convention)."""

    def __init__(self, factor: int = 2):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor

    @staticmethod
    def _encode(sample_rate: int, channels: int, pcm: np.ndarray) -> bytes:
        data = pcm.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16)
        riff_len = 4 + (8 + len(fmt)) + (8 + len(data))
        return (
            b"RIFF" + struct.pack("<I", riff_len) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("sample_rate", "channels", "n_frames", "sum_sq", "payload")}
        for payload in batch["payload"].to_pylist():
            try:
                m = parse_wav_metadata(payload or b"")
                if m["bits"] != 16:
                    raise ValueError("only 16-bit PCM resample supported")
                ch = max(1, m["channels"])
                pcm = np.frombuffer(m["pcm"], dtype="<i2")
                frames = len(pcm) // ch
                kept = pcm[: frames * ch].reshape(frames, ch)[:: self.factor]
                flat = kept.reshape(-1)
                new_sr = max(1, m["sample_rate"] // self.factor)
                out["sample_rate"].append(new_sr)
                out["channels"].append(ch)
                out["n_frames"].append(len(kept))
                out["sum_sq"].append(int((flat.astype(np.int64) ** 2).sum()))
                out["payload"].append(self._encode(new_sr, ch, flat))
            except ValueError:
                out["sample_rate"].append(-1)
                out["channels"].append(-1)
                out["n_frames"].append(-1)
                out["sum_sq"].append(-1)
                out["payload"].append(b"")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(out["sample_rate"], pa.int32()),
                "channels": pa.array(out["channels"], pa.int32()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "sum_sq": pa.array(out["sum_sq"], pa.int64()),
                "payload": pa.array(out["payload"], pa.binary()),
            }
        )


def audio_resample_pipeline(ds: Dataset, factor: int = 2, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    """Byte-real audio resample over a binary media column: small batches
    (wide binary rows), actor pool sized by ``concurrency``."""
    return ds.map_batches(
        AudioResample,
        fn_constructor_kwargs={"factor": factor},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def image_metadata_pipeline(ds: Dataset, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    """Real metadata extraction over a binary media column (S10 de-stubbed):
    small batches for wide binary rows, task/actor pool per ``concurrency``."""
    return ds.map_batches(
        ImageMetadata,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def audio_metadata_pipeline(ds: Dataset, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        AudioMetadata,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class VideoMetadata:
    """Actor-pool stage: binary MP4 column -> per-video container metadata
    + the derived frame-sample count (byte-real: duration comes from the
    parsed mvhd, not a metadata column). Unparseable payloads become error
    rows (brand '', -1 numerics) instead of poisoning the batch."""

    def __init__(self, frame_every_ms: int = 1000):
        self.frame_every_ms = frame_every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in ("brand", "timescale", "duration_ms", "width", "height", "n_tracks", "n_frames")}
        for payload in batch["payload"].to_pylist():
            try:
                m = parse_mp4_metadata(payload or b"")
                n_frames = max(1, m["duration_ms"] // self.frame_every_ms)
            except ValueError:
                # parse_mp4_metadata converts truncation (struct.error /
                # IndexError) to ValueError itself — corrupt payloads become
                # error rows, never a poisoned batch task
                m = {"brand": "", "timescale": -1, "duration_ms": -1, "width": -1, "height": -1, "n_tracks": 0}
                n_frames = 0
            for k in ("brand", "timescale", "duration_ms", "width", "height", "n_tracks"):
                cols[k].append(m[k])
            cols["n_frames"].append(n_frames)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "brand": pa.array(cols["brand"], pa.string()),
                "timescale": pa.array(cols["timescale"], pa.int32()),
                "duration_ms": pa.array(cols["duration_ms"], pa.int32()),
                "width": pa.array(cols["width"], pa.int32()),
                "height": pa.array(cols["height"], pa.int32()),
                "n_tracks": pa.array(cols["n_tracks"], pa.int32()),
                "n_frames": pa.array(cols["n_frames"], pa.int32()),
            }
        )


def video_metadata_pipeline(
    ds: Dataset, frame_every_ms: int = 1000, concurrency=(1, 4), batch_size: int = 16
) -> Dataset:
    """Byte-real video metadata over a binary MP4 column (same small-batch
    actor-pool shape as the image/audio pipelines)."""
    return ds.map_batches(
        VideoMetadata,
        fn_constructor_kwargs={"frame_every_ms": frame_every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake decode (replace with PIL.Image.open).

    Produces an 8x8 grayscale 'image' derived from the payload hash so
    downstream feature math is exercised with stable values."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8).astype(np.float32)


def _decode_audio_stub(payload: bytes, n_samples: int = 256) -> np.ndarray:
    """STUB: deterministic fake PCM decode (replace with soundfile/libav)."""
    h = hashlib.sha256(payload).digest()
    reps = -(-n_samples // len(h))
    return (np.frombuffer(h * reps, dtype=np.uint8)[:n_samples].astype(np.float32) - 127.5) / 127.5


class ImageFeatures:
    """Actor-pool stage: binary image column -> feature columns.

    Real plumbing: constructor-held 'model' state (here a fixed projection
    matrix as the stand-in for a vision encoder), small batch sizes for
    wide binary rows, arrow-native output.

    ``model_path``: plug point for a REAL vision kernel — a Python file
    defining ``image_features(payload: bytes) -> (feature_vector,
    mean_intensity)``; loaded once per actor. Default keeps the
    deterministic hash-decode stand-in (no image libs in this container)."""

    def __init__(self, feat_dim: int = 16, seed: int = 3, model_path: str | None = None):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((64, feat_dim)).astype(np.float32)
        self._plug = None
        if model_path:
            from clawrag_ray.functions.kernels import load_kernel

            self._plug = load_kernel(model_path, "image_features")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means = [], []
        for payload in batch["payload"].to_pylist():
            if self._plug is not None:
                vec, mean = self._plug(payload or b"")
                feats.append(np.asarray(vec, dtype=np.float32).tolist())
                means.append(float(mean))
                continue
            img = _decode_image_stub(payload or b"")
            flat = img.reshape(-1)
            feats.append((flat @ self.proj).tolist())
            means.append(float(flat.mean()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mean_intensity": pa.array(means, pa.float64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def decode_png_gray8(payload: bytes) -> np.ndarray:
    """Real PNG decode for 8-bit grayscale images: chunk walk, zlib
    inflate, and per-row unfiltering for all five PNG filter types
    (None/Sub/Up/Average/Paeth — RFC 2083 §6). Returns (h, w) uint8."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    bit_depth = color_type = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG without IHDR")
    if bit_depth != 8 or color_type != 0:
        raise ValueError("only 8-bit grayscale supported")
    raw = zlib.decompress(idat)
    stride = width + 1
    out = np.zeros((height, width), dtype=np.int32)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        filt, data = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        prev = out[y - 1] if y else np.zeros(width, dtype=np.int32)
        if filt == 0:
            out[y] = data
        elif filt == 1:  # Sub
            acc = 0
            for x in range(width):
                acc = (data[x] + acc) & 0xFF
                out[y, x] = acc
        elif filt == 2:  # Up
            out[y] = (data + prev) & 0xFF
        elif filt == 3:  # Average
            left = 0
            for x in range(width):
                left = (data[x] + (left + prev[x]) // 2) & 0xFF
                out[y, x] = left
        elif filt == 4:  # Paeth
            left = 0
            for x in range(width):
                up = int(prev[x])
                ul = int(prev[x - 1]) if x else 0
                p = left + up - ul
                pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                left = (data[x] + pred) & 0xFF
                out[y, x] = left
        else:
            raise ValueError(f"bad PNG filter {filt}")
    return out.astype(np.uint8)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the floor-index mapping out[y,x] =
    src[y*H//H2, x*W//W2]) — vectorized."""
    h, w = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return img[np.ix_(ys, xs)]


class ImageResize:
    """Actor-pool stage: REAL resize for PNG payloads — decode (chunk walk
    + inflate + unfilter), nearest-neighbor resample, re-encode as PNG.
    Non-PNG/corrupt payloads become error rows (width = -1), mirroring the
    metadata stage's error contract."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        from clawrag_ray.functions.mediafixtures import encode_png_from_array

        ids, payloads, ws, hs, sums = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            ids.append(mid)
            try:
                img = decode_png_gray8(payload or b"")
                small = resize_nearest(img, self.width, self.height)
                payloads.append(encode_png_from_array(small))
                ws.append(self.width)
                hs.append(self.height)
                sums.append(int(small.astype(np.int64).sum()))
            except ValueError:
                payloads.append(b"")
                ws.append(-1)
                hs.append(-1)
                sums.append(-1)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "pixel_sum": pa.array(sums, pa.int64()),
            }
        )


class AudioFeatures:
    """Actor-pool stage: binary audio -> (media_id, rms, zero_crossings).

    ``model_path``: plug point for a REAL audio decoder — a Python file
    defining ``decode_audio(payload: bytes, n_samples: int) -> float PCM
    array``; loaded once per actor. The rms/zero-crossing math downstream
    is decode-agnostic. Default keeps the deterministic stand-in."""

    def __init__(self, n_samples: int = 256, model_path: str | None = None):
        self.n_samples = n_samples
        self._decode = None
        if model_path:
            from clawrag_ray.functions.kernels import load_kernel

            self._decode = load_kernel(model_path, "decode_audio")

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zc = [], []
        decode = self._decode or _decode_audio_stub
        for payload in batch["payload"].to_pylist():
            pcm = np.asarray(decode(payload or b"", self.n_samples), dtype=np.float32)
            rms.append(float(np.sqrt((pcm**2).mean())))
            zc.append(int(((pcm[:-1] * pcm[1:]) < 0).sum()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "rms": pa.array(rms, pa.float64()),
                "zero_crossings": pa.array(zc, pa.int32()),
            }
        )


def frame_sample(ds: Dataset, every_ms: int = 1000, concurrency: int | None = None) -> Dataset:
    """Video frame sampling stub: explodes each video row into frame rows
    at ``every_ms`` intervals of its duration (payload decode stubbed; the
    explode/row-accounting plumbing is real). Stateless explode -> task
    pool (``concurrency`` caps workers; None lets the executor decide)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts_ms = [], [], []
        for mid, dur in zip(batch["media_id"].to_pylist(), batch["duration_ms"].to_pylist()):
            n = max(1, int(dur or 0) // every_ms)
            for i in range(n):
                ids.append(mid)
                frame_idx.append(i)
                ts_ms.append(i * every_ms)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int32()),
            }
        )

    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(explode, batch_format="pyarrow", batch_size=16, zero_copy_batch=True, **kw)


def image_feature_pipeline(ds: Dataset, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    """Flagship multimodal plumbing: small batches (wide binary rows),
    actor pool with constructor-held encoder state."""
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


class ImageDHash:
    """Actor-pool stage: perceptual difference hash (dHash, public
    aHash/dHash family — Krawetz 2013) over REAL decoded pixels: PNG
    chunk walk + inflate + unfilter (decode_png_gray8), nearest-neighbor
    resample to 9x8, then 64 bits b[y*8+x] = pixel(y,x) > pixel(y,x+1).
    The near-dup primitive for image corpora — near-identical images
    (recompression, small edits) land within a few Hamming bits, so the
    SimHash bit-band machinery applies downstream unchanged. Emitted as
    two int32-range halves (dhash_hi, dhash_lo) so engines without
    unsigned 64-bit types replay it exactly. Corrupt/non-PNG payloads
    become error rows (dhash_hi = -1)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, his, los = [], [], []
        powers = np.left_shift(np.int64(1), np.arange(32, dtype=np.int64))
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            ids.append(mid)
            try:
                img = decode_png_gray8(payload or b"")
                small = resize_nearest(img, 9, 8)
                bits = (small[:, :-1].astype(np.int64) > small[:, 1:].astype(np.int64)).flatten()
                los.append(int((bits[:32] * powers).sum()))
                his.append(int((bits[32:] * powers).sum()))
            except Exception:
                his.append(-1)
                los.append(-1)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "dhash_hi": pa.array(his, pa.int64()),
                "dhash_lo": pa.array(los, pa.int64()),
            }
        )


def image_dhash_pipeline(ds: Dataset, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        ImageDHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
