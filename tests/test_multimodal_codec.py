"""Stdlib image codec (datapipe.multimodal): PPM/PNG decode, PNG
filter reconstruction (known-answer vectors + round trips for every
filter and color type), nearest-neighbor resize, and the Spark-side
decode/resize stages."""

from __future__ import annotations

import numpy as np
import pytest

from flink_tpcds_spark.datapipe.multimodal import (
    _decode_png,
    _decode_ppm,
    _encode_png,
    _encode_ppm,
    _unfilter_scanlines,
    decode_image,
    decode_image_bytes,
    resize_image,
    resize_nearest_bytes,
)


def _gradient(h: int, w: int, c: int) -> bytes:
    """Deterministic non-constant pixels (exercises filter deltas)."""
    return bytes(
        (7 * y + 11 * x + 13 * k) % 256
        for y in range(h)
        for x in range(w)
        for k in range(c)
    )


# ---------------------------------------------------------------------------
# PPM
# ---------------------------------------------------------------------------


def test_ppm_round_trip_rgb_and_gray():
    for c in (3, 1):
        px = _gradient(5, 7, c)
        data = _encode_ppm(5, 7, c, px)
        assert _decode_ppm(data) == (5, 7, c, px)
        assert decode_image_bytes(data) == (5, 7, c, px)


def test_ppm_header_comments_and_whitespace():
    px = bytes(range(12))  # 2x2 RGB
    data = b"P6 # inline comment\n# full line\n 2\t2 \n255\n" + px
    assert _decode_ppm(data) == (2, 2, 3, px)


def test_ppm_truncated_raster_raises():
    data = _encode_ppm(2, 2, 3, bytes(12))[:-1]
    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(data)


# ---------------------------------------------------------------------------
# PNG filter reconstruction — known-answer vectors (hand-computed per
# the PNG spec §6, independent of the encoder, so an encoder/decoder
# sign error cannot cancel out)
# ---------------------------------------------------------------------------


def test_unfilter_sub_known_answer():
    # bpp=3, one scanline: recon[x] = filt[x] + recon[x-3]
    raw = bytes([1, 10, 20, 30, 30, 40, 50])
    assert _unfilter_scanlines(raw, 1, 6, 3) == bytes(
        [10, 20, 30, 40, 60, 80]
    )


def test_unfilter_up_known_answer():
    raw = bytes([0, 1, 2, 3]) + bytes([2, 4, 5, 6])
    assert _unfilter_scanlines(raw, 2, 3, 1) == bytes([1, 2, 3, 5, 7, 9])


def test_unfilter_average_known_answer():
    # row1 (None) = [2,4,6]; row2 filtered [2,2,2] →
    # recon2 = [2+(0+2)//2, 2+(3+4)//2, 2+(5+6)//2] = [3,5,7]
    raw = bytes([0, 2, 4, 6]) + bytes([3, 2, 2, 2])
    assert _unfilter_scanlines(raw, 2, 3, 1) == bytes([2, 4, 6, 3, 5, 7])


def test_unfilter_paeth_known_answer():
    # row1 (None) = [10,20]; row2 filtered [5,5]:
    #   x0: a=0 b=10 c=0  → p=10 → pred=b=10 → recon 15
    #   x1: a=15 b=20 c=10 → p=25, pa=10 pb=5 pc=15 → pred=b=20 → 25
    raw = bytes([0, 10, 20]) + bytes([4, 5, 5])
    assert _unfilter_scanlines(raw, 2, 2, 1) == bytes([10, 20, 15, 25])


def test_unfilter_unknown_filter_raises():
    with pytest.raises(ValueError, match="filter type"):
        _unfilter_scanlines(bytes([9, 0]), 1, 1, 1)


# ---------------------------------------------------------------------------
# PNG round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip_all_filters_and_color_types(
    filter_type: int, channels: int
):
    px = _gradient(6, 5, channels)
    data = _encode_png(6, 5, channels, px, filter_type=filter_type)
    assert _decode_png(data) == (6, 5, channels, px)
    assert decode_image_bytes(data) == (6, 5, channels, px)


def test_png_single_pixel_and_single_row():
    for h, w in ((1, 1), (1, 9), (9, 1)):
        px = _gradient(h, w, 3)
        for f in range(5):
            assert _decode_png(_encode_png(h, w, 3, px, f)) == (h, w, 3, px)


def test_unknown_magic_raises():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image_bytes(b"\xff\xd8\xff\xe0JFIF....")  # JPEG magic


# ---------------------------------------------------------------------------
# Nearest-neighbor resize
# ---------------------------------------------------------------------------


def test_resize_identity_and_reference():
    h, w, c = 6, 8, 3
    px = _gradient(h, w, c)
    assert resize_nearest_bytes(px, h, w, c, h, w) == px
    # down- and up-sample vs the floor-mapping reference
    for oh, ow in ((3, 4), (2, 2), (12, 16), (5, 7)):
        got = np.frombuffer(
            resize_nearest_bytes(px, h, w, c, oh, ow), dtype=np.uint8
        ).reshape(oh, ow, c)
        src = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)
        for y in range(oh):
            for x in range(ow):
                assert (
                    got[y, x] == src[(y * h) // oh, (x * w) // ow]
                ).all()


# ---------------------------------------------------------------------------
# BMP (DIB: bottom-up rows, 4-byte padding, BGR order)
# ---------------------------------------------------------------------------


def test_bmp_round_trip_padding_widths():
    from flink_tpcds_spark.datapipe.multimodal import _encode_bmp

    # widths 1,2,3,5,7 exercise every 4-byte-padding residue
    for h, w in ((3, 5), (2, 4), (1, 1), (4, 7), (2, 2), (3, 3)):
        px = _gradient(h, w, 3)
        assert decode_image_bytes(_encode_bmp(h, w, px)) == (h, w, 3, px)


def test_bmp_row_order_and_bgr_are_real():
    """The decoder must actually un-reverse rows and un-swap BGR —
    checked against hand-built DIB bits."""
    from flink_tpcds_spark.datapipe.multimodal import _decode_bmp, _encode_bmp

    # 2x1 image: top pixel RGB=(1,2,3), bottom pixel RGB=(4,5,6)
    px = bytes([1, 2, 3, 4, 5, 6])
    data = _encode_bmp(2, 1, px)
    bits = data[54:]  # after file (14) + info (40) headers
    # stored bottom-up + BGR + padded to 4 bytes per row
    assert bits[:3] == bytes([6, 5, 4]) and bits[4:7] == bytes([3, 2, 1])
    assert _decode_bmp(data) == (2, 1, 3, px)


# ---------------------------------------------------------------------------
# AVI video container
# ---------------------------------------------------------------------------


def test_avi_round_trip_and_header():
    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_avi,
        decode_avi_bytes,
    )

    frames = [_gradient(3, 5, 3), _gradient(3, 5, 3)[::-1], bytes(45)]
    h, w, usec, n, out = decode_avi_bytes(
        _encode_avi(3, 5, frames, usec_per_frame=33_333)
    )
    assert (h, w, usec, n) == (3, 5, 33_333, 3)
    assert out == frames


def test_avi_error_paths():
    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_avi,
        decode_avi_bytes,
    )

    with pytest.raises(ValueError, match="unsupported video format"):
        decode_avi_bytes(b"\x00\x00\x00\x18ftypmp42....")  # MP4-ish
    good = _encode_avi(2, 2, [bytes(12), bytes(12)])
    # physically truncated stream (chunk overruns the buffer)
    truncated = good[: good.rindex(b"00db") + 6]
    with pytest.raises(ValueError, match="truncated AVI chunk"):
        decode_avi_bytes(truncated)
    # header/stream frame-count mismatch: patch avih dwTotalFrames
    # (RIFF 12 + LIST hdr 8 + 'hdrl' 4 + 'avih'+size 8 → body; the
    # count is the 5th dword of the body)
    off = 12 + 8 + 4 + 8 + 16
    import struct as _s

    assert _s.unpack_from("<I", good, off)[0] == 2  # offset sanity
    patched = good[:off] + _s.pack("<I", 3) + good[off + 4 :]
    with pytest.raises(ValueError, match="declares 3 frames"):
        decode_avi_bytes(patched)


def test_sample_video_frames_stage(spark):
    import numpy as np

    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_avi,
        sample_video_frames,
    )

    rows = []
    for i in range(5):
        h, w, nfr = 2 + i % 2, 3 + i % 3, 4 + i
        frames = [_gradient(h, w, 3)[k:] + _gradient(h, w, 3)[:k] for k in range(nfr)]
        rows.append((i, _encode_avi(h, w, frames), h, w, frames))
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "doc_id long, payload binary"
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in sample_video_frames(df, stride=2).collect()
    }
    for i, _p, h, w, frames in rows:
        expected_idx = list(range(0, len(frames), 2))
        assert sorted(
            k for (d, k) in got if d == i
        ) == expected_idx
        for k in expected_idx:
            r = got[(i, k)]
            arr = np.frombuffer(frames[k], dtype=np.uint8)
            assert (r["height"], r["width"]) == (h, w)
            assert r["pixel_sum"] == int(arr.astype(np.int64).sum())
            assert r["corner_r"] == frames[k][0]


# ---------------------------------------------------------------------------
# WAV audio codec
# ---------------------------------------------------------------------------


def test_wav_round_trip():
    import struct

    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_wav,
        decode_audio_bytes,
    )

    vals = [0, 1, -1, 32767, -32768, 1234, -4321]
    pcm = b"".join(struct.pack("<h", v) for v in vals)
    for nch in (1, 2):
        n_frames = len(vals) // nch
        data = _encode_wav(16000, nch, pcm[: n_frames * nch * 2])
        got = decode_audio_bytes(data)
        assert got[:4] == (nch, 2, 16000, n_frames)
        assert got[4] == pcm[: n_frames * nch * 2]


def test_wav_unknown_magic_raises():
    from flink_tpcds_spark.datapipe.multimodal import decode_audio_bytes

    with pytest.raises(ValueError, match="unsupported audio format"):
        decode_audio_bytes(b"OggS....vorbis")


def test_decode_audio_stage(spark):
    import struct

    from flink_tpcds_spark.datapipe.multimodal import (
        _encode_wav,
        decode_audio,
    )

    rows = []
    for i in range(6):
        nch = 1 + i % 2
        vals = [((37 * i + 11 * j) % 4001) - 2000 for j in range(20 * nch)]
        pcm = b"".join(struct.pack("<h", v) for v in vals)
        rows.append((i, _encode_wav(8000, nch, pcm), nch, vals))
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    for i, _p, nch, vals in rows:
        r = got[i]
        assert r["n_channels"] == nch
        assert r["framerate"] == 8000
        assert r["n_frames"] == len(vals) // nch
        assert r["peak_abs"] == max(abs(v) for v in vals)
        assert r["sum_abs"] == sum(abs(v) for v in vals)


# ---------------------------------------------------------------------------
# Spark-side stages
# ---------------------------------------------------------------------------


def test_decode_and_resize_stages(spark):
    rows = []
    for i in range(8):
        h, w = 2 + i % 3, 3 + i % 4
        px = _gradient(h, w, 3)
        payload = (
            _encode_ppm(h, w, 3, px)
            if i % 2 == 0
            else _encode_png(h, w, 3, px, filter_type=i % 5)
        )
        rows.append((i, payload, h, w, px))
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "doc_id long, payload binary"
    )
    decoded = {
        r["doc_id"]: r for r in decode_image(df).collect()
    }
    for i, _p, h, w, px in rows:
        r = decoded[i]
        assert (r["height"], r["width"], r["channels"]) == (h, w, 3)
        assert bytes(r["pixels"]) == px
    resized = {r["doc_id"]: r for r in resize_image(df, 4, 4).collect()}
    for i, _p, h, w, px in rows:
        r = resized[i]
        assert (r["height"], r["width"]) == (4, 4)
        assert bytes(r["pixels"]) == resize_nearest_bytes(
            px, h, w, 3, 4, 4
        )
