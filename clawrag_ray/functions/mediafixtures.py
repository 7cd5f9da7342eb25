"""Deterministic media-byte fixture encoders (PNG / TIFF / JPEG / WAV).

These produce REAL, structurally-valid format bytes from a handful of
scalar parameters, so the metadata parsers in stages/multimodal.py are
exercised against genuine encoded containers (magic bytes, chunk/IFD/
segment structure, checksums) without any imaging library in the
container. Encoders are test fixtures; the parsers are the product.

All formats follow the public specs: PNG (RFC 2083 chunk layout + CRC32),
TIFF 6.0 (little-endian IFD), JPEG/JFIF segment markers with an APP1 EXIF
block (which is itself a TIFF IFD), and RIFF/WAVE canonical fmt+data
chunks.
"""

from __future__ import annotations

import struct
import zlib

TIFF_TAG_WIDTH = 256
TIFF_TAG_HEIGHT = 257
TIFF_TAG_MAKE = 271
TIFF_TAG_MODEL = 272
TIFF_TAG_ORIENTATION = 274


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal 8-bit grayscale PNG with valid chunk CRCs."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(((seed + y * 31 + x * 7) % 256) for x in range(width)) for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_png_from_array(img) -> bytes:
    """8-bit grayscale PNG from a (h, w) uint8 array (filter 0 rows)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    height, width = img.shape
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(img[y].tolist()) for y in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _tiff_body(width: int, height: int, make: str, model: str, orientation: int) -> bytes:
    """Little-endian TIFF 6.0: header + one IFD with baseline metadata tags.
    ASCII values longer than 4 bytes are stored out-of-line per spec."""
    make_b = make.encode("ascii") + b"\x00"
    model_b = model.encode("ascii") + b"\x00"
    entries = []  # (tag, type, count, packed-value-or-None, extra-bytes)
    n_entries = 5
    ifd_offset = 8
    data_offset = ifd_offset + 2 + n_entries * 12 + 4  # after entry table + next-IFD ptr

    def short_entry(tag: int, value: int) -> bytes:
        return struct.pack("<HHI", tag, 3, 1) + struct.pack("<HH", value, 0)

    extra = b""

    def ascii_entry(tag: int, val: bytes) -> bytes:
        nonlocal extra
        if len(val) <= 4:
            return struct.pack("<HHI", tag, 2, len(val)) + val.ljust(4, b"\x00")
        off = data_offset + len(extra)
        extra += val
        return struct.pack("<HHI", tag, 2, len(val)) + struct.pack("<I", off)

    entries.append(short_entry(TIFF_TAG_WIDTH, width))
    entries.append(short_entry(TIFF_TAG_HEIGHT, height))
    entries.append(ascii_entry(TIFF_TAG_MAKE, make_b))
    entries.append(ascii_entry(TIFF_TAG_MODEL, model_b))
    entries.append(short_entry(TIFF_TAG_ORIENTATION, orientation))
    ifd = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    return struct.pack("<2sHI", b"II", 42, ifd_offset) + ifd + extra


def encode_tiff(width: int, height: int, make: str, model: str, orientation: int) -> bytes:
    return _tiff_body(width, height, make, model, orientation)


def encode_jpeg_with_exif(width: int, height: int, make: str, model: str, orientation: int) -> bytes:
    """JPEG metadata segments: SOI + APP1(EXIF = embedded TIFF IFD) + SOF0
    carrying the frame dimensions + EOI. No entropy-coded scan — metadata
    extraction never decodes pixels, and segment walking is identical."""
    exif = b"Exif\x00\x00" + _tiff_body(width, height, make, model, orientation)
    app1 = b"\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif
    # SOF0: length, precision, height, width, 1 component (grayscale)
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app1 + sof0 + b"\xff\xd9"


def encode_wav(sample_rate: int, channels: int, frames: int, sample_fn) -> bytes:
    """Canonical RIFF/WAVE: PCM fmt chunk + 16-bit LE data chunk.
    ``sample_fn(i)`` supplies the i-th interleaved sample value."""
    n_samples = frames * channels
    data = struct.pack(f"<{n_samples}h", *(sample_fn(i) for i in range(n_samples)))
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    riff_len = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_mp4(
    duration_ms: int, timescale: int, width: int, height: int, version: int = 0, brand: bytes = b"isom"
) -> bytes:
    """Minimal ISO BMFF (MP4) container: ftyp + moov(mvhd + trak(tkhd)) +
    mdat, per the public ISO/IEC 14496-12 box layout. ``version`` selects
    the mvhd/tkhd full-box version (0 = 32-bit times, 1 = 64-bit) so both
    parser paths are exercised. Duration is stored in timescale units
    (duration_ms * timescale // 1000 — the parser's read-back therefore
    floors to the representable millisecond value)."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full_box(typ: bytes, ver: int, payload: bytes) -> bytes:
        return box(typ, bytes([ver]) + b"\x00\x00\x00" + payload)

    dur_units = duration_ms * timescale // 1000
    matrix = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    if version == 1:
        mvhd = struct.pack(">QQIQ", 0, 0, timescale, dur_units)
    else:
        mvhd = struct.pack(">IIII", 0, 0, timescale, dur_units)
    mvhd += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100) + b"\x00" * 10 + matrix + b"\x00" * 24
    mvhd += struct.pack(">I", 2)  # next_track_ID
    if version == 1:
        tkhd = struct.pack(">QQI4xQ", 0, 0, 1, dur_units)
    else:
        tkhd = struct.pack(">III4xI", 0, 0, 1, dur_units)
    tkhd += b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + matrix
    tkhd += struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
    moov = box(b"moov", full_box(b"mvhd", version, mvhd) + box(b"trak", full_box(b"tkhd", version, tkhd)))
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0x200) + brand)
    return ftyp + moov + box(b"mdat", b"\x00" * 8)
