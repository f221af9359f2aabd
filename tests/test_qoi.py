"""QOI codec tests — independent encoder/decoder, spec-exact ops
(RGB/RGBA raw, 64-slot index, 2-bit diff, luma delta, run-length)."""
import struct

import numpy as np
import pytest

from imagor_ray.stages.codecs import QoiCodec, encode_qoi, sniff_media


def test_rgb_random_roundtrip():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    enc = encode_qoi(px)
    assert sniff_media(enc) == "qoi"
    dec, ch = QoiCodec.decode(enc)
    assert ch == 3 and np.array_equal(dec, px)


def test_rgba_roundtrip_and_alpha_op():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    enc = encode_qoi(px)
    dec, ch = QoiCodec.decode(enc)
    assert ch == 4 and np.array_equal(dec, px)
    assert b"\xff" in enc                     # QOI_OP_RGBA used


def test_gray_input_promoted_to_rgb():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    dec, ch = QoiCodec.decode(encode_qoi(g))
    assert ch == 3 and np.array_equal(dec, np.repeat(g[:, :, None], 3, 2))


def test_smooth_gradient_uses_small_ops():
    g = np.clip(np.add.outer(np.arange(64), np.arange(64)), 0,
                255).astype(np.uint8)
    px = np.stack([g, g, g], axis=2)
    enc = encode_qoi(px)
    dec, _ = QoiCodec.decode(enc)
    assert np.array_equal(dec, px)
    assert len(enc) < 0.5 * px.size           # diff/luma/run actually fired


def test_flat_image_run_length():
    px = np.full((40, 40, 3), 7, dtype=np.uint8)
    enc = encode_qoi(px)
    assert np.array_equal(QoiCodec.decode(enc)[0], px)
    assert len(enc) < 100                     # 1600 px in ~run ops only


def test_index_op_hits_repeated_colors():
    # alternate two colors: after the first pair, every pixel is an
    # index or run op (1 byte each)
    px = np.zeros((2, 64, 3), dtype=np.uint8)
    px[:, 1::2] = (200, 10, 30)
    px[:, 0::2] = (5, 250, 100)
    enc = encode_qoi(px)
    assert np.array_equal(QoiCodec.decode(enc)[0], px)
    assert len(enc) < 14 + 2 * 4 + 128 + 8 + 8


def test_wraparound_diff():
    # 255 -> 0 is dr=+1 under wrapping: must round-trip exactly
    px = np.array([[[255, 255, 255], [0, 0, 255], [254, 1, 255]]],
                  dtype=np.uint8)
    assert np.array_equal(QoiCodec.decode(encode_qoi(px))[0], px)


def test_handbuilt_stream_decodes():
    # header + RGB(1,2,3) + RUN(2) + INDEX(of 1,2,3) + end marker
    hdr = b"qoif" + struct.pack(">II", 4, 1) + bytes([3, 0])
    k = (1 * 3 + 2 * 5 + 3 * 7 + 255 * 11) % 64
    body = bytes([0xFE, 1, 2, 3]) + bytes([0xC0 | 1]) + bytes([k])
    dec, ch = QoiCodec.decode(hdr + body + b"\x00" * 7 + b"\x01")
    assert np.array_equal(dec, np.tile([1, 2, 3], (1, 4, 1)))


def test_bad_magic_and_truncation_rejected():
    with pytest.raises(ValueError):
        QoiCodec.decode(b"nope" + b"\x00" * 20)
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    enc = encode_qoi(px)
    with pytest.raises(ValueError):
        QoiCodec.decode(enc[:-9])             # missing end marker / data
