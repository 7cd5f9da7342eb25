"""Real container parsers (PNG/TIFF/JPEG-EXIF/WAV) over deterministic
fixture bytes, plus the Ray actor-pool metadata stages (S10 de-stubbed)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from clawrag_ray.functions.mediafixtures import (
    encode_jpeg_with_exif,
    encode_png,
    encode_tiff,
    encode_wav,
)
from clawrag_ray.stages.multimodal import (
    audio_metadata_pipeline,
    image_metadata_pipeline,
    parse_image_metadata,
    parse_wav_metadata,
)


class TestImageParsers:
    def test_png_ihdr(self):
        m = parse_image_metadata(encode_png(13, 9, seed=4))
        assert m == {"format": "png", "width": 13, "height": 9, "make": "", "model": "", "orientation": -1}

    def test_tiff_ifd_with_outofline_ascii(self):
        m = parse_image_metadata(encode_tiff(20, 11, "clawrag", "model-Y9", 5))
        assert (m["format"], m["width"], m["height"]) == ("tiff", 20, 11)
        assert (m["make"], m["model"], m["orientation"]) == ("clawrag", "model-Y9", 5)

    def test_tiff_inline_ascii(self):
        m = parse_image_metadata(encode_tiff(5, 6, "abc", "x", 1))
        assert m["make"] == "abc" and m["model"] == "x"

    def test_jpeg_segments_and_exif(self):
        m = parse_image_metadata(encode_jpeg_with_exif(17, 23, "clawrag", "m6", 2))
        assert m == {"format": "jpeg", "width": 17, "height": 23, "make": "clawrag", "model": "m6", "orientation": 2}

    @pytest.mark.parametrize("payload", [b"", b"garbage", b"\x89PNGbroken", b"\xff\xd8\x00\x00\x00\x00"])
    def test_corrupt_raises(self, payload):
        with pytest.raises(ValueError):
            parse_image_metadata(payload)


class TestWavParser:
    def test_header_and_pcm(self):
        w = parse_wav_metadata(encode_wav(16000, 2, 100, lambda i: i - 50))
        assert (w["sample_rate"], w["channels"], w["bits"], w["n_frames"]) == (16000, 2, 16, 100)
        assert w["duration_ms"] == 100 * 1000 // 16000
        pcm = np.frombuffer(w["pcm"], dtype="<i2")
        assert len(pcm) == 200 and pcm[0] == -50 and pcm[199] == 149

    def test_not_riff_raises(self):
        with pytest.raises(ValueError):
            parse_wav_metadata(b"OggS but not riff")


class TestStages:
    def test_image_metadata_stage_mixed_formats_and_errors(self):
        rows = [
            {"media_id": "a", "payload": encode_png(10, 12)},
            {"media_id": "b", "payload": encode_tiff(9, 9, "mk", "md", 3)},
            {"media_id": "c", "payload": encode_jpeg_with_exif(4, 5, "mk", "md", 7)},
            {"media_id": "d", "payload": b"corrupt"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
        got = image_metadata_pipeline(ds, concurrency=1).to_pandas().set_index("media_id")
        assert got.loc["a", "format"] == "png" and got.loc["a", "width"] == 10
        assert got.loc["b", "exif_model"] == "md" and got.loc["b", "exif_orientation"] == 3
        assert got.loc["c", "format"] == "jpeg" and got.loc["c", "height"] == 5
        assert got.loc["d", "format"] == "error" and got.loc["d", "width"] == -1

    def test_audio_metadata_stage(self):
        rows = [
            {"media_id": "x", "payload": encode_wav(8000, 1, 40, lambda i: 100)},
            {"media_id": "bad", "payload": b"nope"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = audio_metadata_pipeline(ds, concurrency=1).to_pandas().set_index("media_id")
        assert got.loc["x", "sample_rate"] == 8000
        assert got.loc["x", "n_samples"] == 40
        assert got.loc["x", "sum_sq"] == 40 * 100 * 100
        assert got.loc["x", "rms"] == 100.0
        assert got.loc["bad", "sample_rate"] == -1


class TestMagicValidation:
    def test_decision_procedure(self):
        from clawrag_ray.stages.routing import validate_magic

        assert validate_magic(b"%PDF-1.7 blah", ".pdf") == (True, "")
        assert validate_magic(b"PK\x03\x04rest", ".docx") == (True, "")
        assert validate_magic(b"\x89PNG\r\n\x1a\nxx", ".png") == (True, "")
        assert validate_magic(b"\x89PNG\r\n\x1a\nxx", ".pdf") == (False, "MAGIC_MISMATCH")
        assert validate_magic(b"# heading", ".md") == (True, "")
        assert validate_magic(b"\xff\xd8\xff", ".md") == (False, "BINARY_IN_TEXT")
        assert validate_magic(b"", ".pdf") == (False, "EMPTY")
        assert validate_magic(b"anything", ".exe") == (False, "MAGIC_MISMATCH")
        # case-insensitive extension, like the reference's .lower()
        assert validate_magic(b"%PDF", ".PDF") == (True, "")

    def test_stage(self):
        import ray.data

        from clawrag_ray.stages.routing import validate_magic_bytes

        rows = [
            {"doc_id": 1, "payload": b"%PDF-1.4", "extension": ".pdf"},
            {"doc_id": 2, "payload": b"\x89PNG\r\n\x1a\n", "extension": ".pdf"},
            {"doc_id": 3, "payload": b"plain text", "extension": ".csv"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
        got = validate_magic_bytes(ds).to_pandas().set_index("doc_id")
        assert bool(got.loc[1, "valid"]) and not bool(got.loc[2, "valid"])
        assert got.loc[2, "reason"] == "MAGIC_MISMATCH"
        assert bool(got.loc[3, "valid"])


class TestPngDecodeResize:
    def test_roundtrip_filter0(self):
        from clawrag_ray.functions.mediafixtures import encode_png_from_array
        from clawrag_ray.stages.multimodal import decode_png_gray8

        img = (np.arange(11 * 7, dtype=np.uint8).reshape(7, 11) * 3) % 256
        assert (decode_png_gray8(encode_png_from_array(img)) == img).all()

    def test_unfilter_all_five_types(self):
        """Forward-filter a known image with every PNG filter type, then
        decode — exercises Sub/Up/Average/Paeth reconstruction."""
        import struct
        import zlib

        from clawrag_ray.stages.multimodal import decode_png_gray8

        h, w = 5, 8
        rng = np.random.RandomState(0)
        src = rng.randint(0, 256, (h, w)).astype(np.int32)

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)

        rows = []
        for y in range(h):
            prev = src[y - 1] if y else np.zeros(w, dtype=np.int32)
            cur = src[y]
            f = y % 5
            if f == 0:
                data = cur.copy()
            elif f == 1:
                data = np.array([(cur[x] - (cur[x - 1] if x else 0)) & 0xFF for x in range(w)])
            elif f == 2:
                data = (cur - prev) & 0xFF
            elif f == 3:
                data = np.array(
                    [(cur[x] - ((cur[x - 1] if x else 0) + prev[x]) // 2) & 0xFF for x in range(w)]
                )
            else:
                data = np.array(
                    [
                        (cur[x] - paeth((cur[x - 1] if x else 0), prev[x], (prev[x - 1] if x else 0))) & 0xFF
                        for x in range(w)
                    ]
                )
            rows.append(bytes([f]) + bytes(data.astype(np.uint8).tolist()))

        def chunk(typ, data):
            body = typ + data
            return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert (decode_png_gray8(png) == src.astype(np.uint8)).all()

    def test_resize_stage_real_and_error(self):
        import ray.data

        from clawrag_ray.functions.mediafixtures import encode_png
        from clawrag_ray.stages.multimodal import ImageResize, decode_png_gray8, resize_nearest

        rows = [
            {"media_id": "a", "payload": encode_png(20, 14, seed=5)},
            {"media_id": "bad", "payload": b"not a png"},
        ]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        got = (
            ds.map_batches(
                ImageResize,
                fn_constructor_kwargs={"width": 6, "height": 4},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
            .set_index("media_id")
        )
        src = decode_png_gray8(encode_png(20, 14, seed=5))
        want = resize_nearest(src, 6, 4)
        assert got.loc["a", "pixel_sum"] == int(want.astype(np.int64).sum())
        # output payload is itself a decodable PNG of the resized image
        back = decode_png_gray8(got.loc["a", "payload"])
        assert (back == want).all()
        assert got.loc["bad", "width"] == -1


class TestJpegScanData:
    def test_sos_and_rst_markers_do_not_break_metadata(self):
        """Real camera JPEGs carry entropy-coded scan data after SOS; the
        metadata walker must stop there, and skip standalone RST/TEM
        markers, instead of erroring."""
        import struct

        base = encode_jpeg_with_exif(17, 23, "clawrag", "m6", 2)
        assert base.endswith(b"\xff\xd9")
        head = base[:-2]
        sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
        scan = bytes(range(251)) * 3  # arbitrary non-marker scan bytes
        jpeg = head + b"\xff\xd0" + sos + scan + b"\xff\xd9"
        m = parse_image_metadata(jpeg)
        assert (m["format"], m["width"], m["height"], m["make"]) == ("jpeg", 17, 23, "clawrag")


class TestMp4Parser:
    def test_round_trip_both_versions(self):
        from clawrag_ray.functions.mediafixtures import encode_mp4
        from clawrag_ray.stages.multimodal import parse_mp4_metadata

        for v in (0, 1):
            m = parse_mp4_metadata(encode_mp4(12345, 600, 320, 240, version=v))
            assert m == {
                "brand": "isom",
                "timescale": 600,
                "duration_ms": 12345,
                "width": 320,
                "height": 240,
                "n_tracks": 1,
            }

    def test_duration_floors_to_timescale_units(self):
        from clawrag_ray.functions.mediafixtures import encode_mp4
        from clawrag_ray.stages.multimodal import parse_mp4_metadata

        # 1001 ms at timescale 600 stores 600 units -> reads back 1000 ms
        m = parse_mp4_metadata(encode_mp4(1001, 600, 16, 16))
        assert m["duration_ms"] == (1001 * 600 // 1000) * 1000 // 600 == 1000

    def test_corrupt_payloads_raise(self):
        from clawrag_ray.functions.mediafixtures import encode_mp4
        from clawrag_ray.stages.multimodal import parse_mp4_metadata

        for bad in (b"", b"nope", b"\x00\x00\x00\x08ftypXXXX"):
            with pytest.raises(ValueError):
                parse_mp4_metadata(bad)
        # oversized inner box size must not walk past the buffer
        good = bytearray(encode_mp4(1000, 600, 16, 16))
        good[0:4] = (2 ** 31).to_bytes(4, "big")
        with pytest.raises(ValueError):
            parse_mp4_metadata(bytes(good))

    def test_video_metadata_pipeline(self):
        from clawrag_ray.functions.mediafixtures import encode_mp4
        from clawrag_ray.stages.multimodal import video_metadata_pipeline

        rows = [
            {"media_id": "a", "payload": encode_mp4(3500, 1000, 64, 48)},
            {"media_id": "bad", "payload": b"not mp4"},
        ]
        got = (
            video_metadata_pipeline(ray.data.from_arrow(pa.Table.from_pylist(rows)), frame_every_ms=1000)
            .to_pandas()
            .set_index("media_id")
        )
        assert got.loc["a", "duration_ms"] == 3500
        assert got.loc["a", "n_frames"] == 3
        assert got.loc["bad", "timescale"] == -1 and got.loc["bad", "n_frames"] == 0


class TestMp4TruncationContract:
    def test_truncated_largesize_header_raises_valueerror(self):
        import pytest as _pytest

        from clawrag_ray.stages.multimodal import parse_mp4_metadata

        # valid ftyp, then a box claiming a 64-bit largesize with fewer
        # than 16 bytes remaining -> struct.error internally, ValueError out
        payload = b"\x00\x00\x00\x0cftypisom" + b"\x00\x00\x00\x01moov" + b"\x00\x00"
        with _pytest.raises(ValueError):
            parse_mp4_metadata(payload)

    def test_undersized_mvhd_body_raises_valueerror(self):
        import pytest as _pytest

        from clawrag_ray.stages.multimodal import parse_mp4_metadata

        # moov containing an mvhd whose box size admits no timescale bytes
        mvhd = b"\x00\x00\x00\x0cmvhd" + b"\x00\x00\x00\x00"  # 4 body bytes only
        moov = len(mvhd).to_bytes(4, "big")
        moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
        payload = b"\x00\x00\x00\x0cftypisom" + moov
        with _pytest.raises(ValueError):
            parse_mp4_metadata(payload)


class TestAudioResample:
    def test_roundtrip_reparses_and_decimates(self):
        import numpy as np

        from clawrag_ray.functions.mediafixtures import encode_wav
        from clawrag_ray.stages.multimodal import AudioResample, parse_wav_metadata

        sr, ch, frames = 8000, 2, 33
        wav = encode_wav(sr, ch, frames, lambda i: (i * 7) % 200 - 100)
        import pyarrow as pa

        batch = pa.table({"media_id": ["m1"], "payload": pa.array([wav], pa.binary())})
        out = AudioResample(factor=2)(batch)
        assert out["sample_rate"][0].as_py() == 4000
        assert out["n_frames"][0].as_py() == 17  # ceil(33/2)
        # the emitted payload is a valid RIFF/WAVE whose PCM is exactly
        # every other frame of the original
        m = parse_wav_metadata(out["payload"][0].as_py())
        assert m["sample_rate"] == 4000 and m["channels"] == 2 and m["n_frames"] == 17
        orig = np.frombuffer(parse_wav_metadata(wav)["pcm"], "<i2").reshape(frames, ch)
        new = np.frombuffer(m["pcm"], "<i2").reshape(17, ch)
        assert (new == orig[::2]).all()
        assert out["sum_sq"][0].as_py() == int((orig[::2].astype(np.int64) ** 2).sum())

    def test_malformed_payload_error_row(self):
        import pyarrow as pa

        from clawrag_ray.stages.multimodal import AudioResample

        batch = pa.table({"media_id": ["bad"], "payload": pa.array([b"not a wav"], pa.binary())})
        out = AudioResample()(batch)
        assert out["sample_rate"][0].as_py() == -1
        assert out["payload"][0].as_py() == b""


class TestImageDHash:
    def test_near_identical_vs_different(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from clawrag_ray.functions.mediafixtures import encode_png_from_array
        from clawrag_ray.stages.multimodal import image_dhash_pipeline

        rng = np.random.RandomState(11)
        base = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
        near = base.copy()
        near[5, 5] = (int(near[5, 5]) + 3) % 256  # tiny edit
        other = rng.randint(0, 256, size=(32, 32)).astype(np.uint8)
        t = pa.table(
            {
                "media_id": ["base", "near", "other", "bad"],
                "payload": [
                    encode_png_from_array(base),
                    encode_png_from_array(near),
                    encode_png_from_array(other),
                    b"not a png",
                ],
            }
        )
        got = image_dhash_pipeline(ray.data.from_arrow(t), concurrency=1).to_pandas().set_index("media_id")

        def ham(a, b):
            return bin(
                (int(a["dhash_hi"]) ^ int(b["dhash_hi"])) & 0xFFFFFFFF
            ).count("1") + bin((int(a["dhash_lo"]) ^ int(b["dhash_lo"])) & 0xFFFFFFFF).count("1")

        d_near = ham(got.loc["base"], got.loc["near"])
        d_other = ham(got.loc["base"], got.loc["other"])
        assert d_near <= 4 and d_other > 10
        assert got.loc["bad", "dhash_hi"] == -1
