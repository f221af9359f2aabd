"""FLAC codec tests — encoder/decoder are independent RFC 9639
implementations, so round trips certify both; hand-built streams pin
the decoder alone (LPC, Rice escapes, partitions, wasted bits)."""
import numpy as np
import pytest

import imagor_ray.stages.flac as F
from imagor_ray.stages.flac import FlacError, decode_flac, encode_flac


def test_mono_smooth_roundtrip_compresses():
    t = np.arange(5000)
    rng = np.random.default_rng(0)
    x = np.clip(np.round(60 * np.sin(t / 30) + rng.normal(0, 2, len(t))),
                -128, 127).astype(np.int64)
    enc = encode_flac(x, 8000, bps=8, block_size=1024)
    dec, sr, bps = decode_flac(enc)
    assert sr == 8000 and bps == 8
    assert np.array_equal(dec[:, 0], x)
    assert len(enc) < 0.7 * len(x)          # predictive coding actually won


def test_random_bytes_roundtrip_verbatim_fallback():
    rng = np.random.default_rng(1)
    x = rng.integers(-128, 128, 3001).astype(np.int64)
    enc = encode_flac(x, 44100, bps=8, block_size=777)
    dec, _, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], x)


def test_stereo_decorrelation_roundtrip():
    rng = np.random.default_rng(2)
    n = 8192
    base = np.clip(np.cumsum(rng.integers(-80, 81, n)), -30000, 30000)
    st = np.stack([base, base + rng.integers(-5, 6, n)], axis=1)
    enc = encode_flac(st, 44100, bps=16, block_size=4096)
    dec, _, bps = decode_flac(enc)
    assert bps == 16 and np.array_equal(dec, st)
    # correlated stereo must beat independent-channel raw size clearly
    assert len(enc) < 0.6 * st.size * 2


@pytest.mark.parametrize("assign", [8, 9, 10])
def test_each_stereo_assignment_decodes(assign):
    """Force one specific decorrelation mode through the public encoder
    by monkeypatch-free construction: encode, then assert the decoder
    handles a stream containing that assignment (build via internals)."""
    rng = np.random.default_rng(assign)
    n = 256
    left = rng.integers(-100, 100, n).astype(np.int64)
    right = left + rng.integers(-3, 4, n)
    side = left - right
    mid = (left + right) >> 1
    chans = {8: ([left, side], [8, 9]), 9: ([side, right], [9, 8]),
             10: ([mid, side], [8, 9])}[assign]
    import struct
    hdr = bytearray([0xFF, 0xF8, (0b0111 << 4), (assign << 4) | (0b001 << 1)])
    hdr += F._utf8_encode(0)
    hdr += struct.pack(">H", n - 1)
    hdr.append(F._crc8(bytes(hdr)))
    bw = F._BitWriter()
    for ch, bps_c in zip(*chans):
        F._encode_subframe(bw, ch, bps_c, True)
    bw.align()
    frame = bytes(hdr) + bw.getvalue()
    stream = bytearray(b"fLaC")
    import hashlib
    si = struct.pack(">HH", n, n) + b"\x00" * 6
    packed = (8000 << 44) | (1 << 41) | (7 << 36) | n
    si += struct.pack(">Q", packed)
    si += F._sample_md5(np.stack([left, right], axis=1), 8)
    stream += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    stream += frame + struct.pack(">H", F._crc16(frame))
    dec, _, _ = decode_flac(bytes(stream))
    assert np.array_equal(dec, np.stack([left, right], axis=1))


def test_wasted_bits_roundtrip():
    rng = np.random.default_rng(3)
    x = (rng.integers(-16, 16, 2000) * 8).astype(np.int64)
    enc = encode_flac(x, 8000, bps=16)
    dec, _, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], x)


def test_constant_and_empty():
    x = np.full(500, 42, dtype=np.int64)
    assert np.array_equal(decode_flac(encode_flac(x, 8000, bps=8))[0][:, 0], x)
    empty = encode_flac(np.zeros(0, dtype=np.int64), 8000, bps=8)
    assert decode_flac(empty)[0].shape[0] == 0


def test_multi_frame_short_tail():
    rng = np.random.default_rng(4)
    x = np.cumsum(rng.integers(-3, 4, 1000)).astype(np.int64)
    x = np.clip(x, -128, 127)
    enc = encode_flac(x, 8000, bps=8, block_size=192)  # 5 frames + tail 40
    dec, _, _ = decode_flac(enc)
    assert np.array_equal(dec[:, 0], x)


def test_corruption_detected_by_crc():
    x = np.arange(-100, 100, dtype=np.int64)
    enc = bytearray(encode_flac(x, 8000, bps=8))
    enc[55] ^= 0x10
    with pytest.raises(FlacError):
        decode_flac(bytes(enc))


def test_md5_mismatch_detected():
    x = np.arange(-100, 100, dtype=np.int64)
    enc = bytearray(encode_flac(x, 8000, bps=8))
    # STREAMINFO md5 lives at bytes 8+10+8 .. +16 of the metadata body
    enc[8 + 18] ^= 0xFF
    with pytest.raises(FlacError, match="MD5|CRC"):
        decode_flac(bytes(enc))


def test_handbuilt_lpc_subframe():
    rng = np.random.default_rng(5)
    warm = np.array([10, 12, 9, 11], dtype=np.int64)
    coefs = np.array([3, -3, 1, 0], dtype=np.int64)
    resid = rng.integers(-10, 11, 60).astype(np.int64)
    bw = F._BitWriter()
    bw.write(0, 1)
    bw.write(0b100000 | 3, 6)     # LPC order 4
    bw.write(0, 1)
    for v in warm:
        bw.write_signed(int(v), 16)
    bw.write(11, 4)               # precision-1
    bw.write(2, 5)                # shift
    for c in coefs:
        bw.write_signed(int(c), 12)
    F._write_residual(bw, resid)
    bw.align()
    out = F._decode_subframe(F._BitReader(bw.getvalue()), 64, 16)
    assert np.array_equal(out, F._predict_restore(warm, resid, coefs, 2))


def test_handbuilt_rice_partitions_and_escape():
    """Decoder handles partition order > 0 and the raw-bits escape the
    encoder itself never combines this way."""
    bw = F._BitWriter()
    bw.write(0, 2)                # method 0 (4-bit params)
    bw.write(1, 4)                # partition order 1 → 2 partitions
    vals = np.array([3, -2, 0, 7, -1, 5, 2, -4], dtype=np.int64)
    # partition 1: rice param 2 over first 4 (order 0 → 4 samples each)
    z = F._zigzag(vals[:4])
    bw.write(2, 4)
    for v in z:
        v = int(v)
        bw.write_unary(v >> 2)
        bw.write(v & 3, 2)
    # partition 2: escape, 5-bit raw
    bw.write(0b1111, 4)
    bw.write(5, 5)
    for v in vals[4:]:
        bw.write_signed(int(v), 5)
    bw.align()
    out = F._read_residual(F._BitReader(bw.getvalue()), 8, 0)
    assert np.array_equal(out, vals)


def test_utf8_coded_number_roundtrip():
    for v in [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x1FFFFF, (1 << 31) - 1]:
        enc = F._utf8_encode(v)
        assert F._utf8_decode(F._BitReader(enc)) == v


def test_fixed_restore_matches_sequential():
    rng = np.random.default_rng(6)
    for order in range(1, 5):
        x = np.cumsum(rng.integers(-5, 6, 200)).astype(np.int64)
        resid = F._fixed_residual(x, order)
        got = F._fixed_restore(x[:order], resid, order)
        assert np.array_equal(got, x), f"order {order}"
        seq = F._predict_restore(x[:order], resid, F._FIXED_COEFS[order], 0)
        assert np.array_equal(seq, x), f"order {order} sequential"


def test_bps_out_of_range_rejected():
    with pytest.raises(FlacError):
        encode_flac(np.array([200], dtype=np.int64), 8000, bps=8)


def test_malformed_partition_headers_raise():
    # partition count not dividing the blocksize must be rejected, not
    # decoded into uninitialized memory (review finding)
    bw = F._BitWriter()
    bw.write(0, 2)            # method 0
    bw.write(1, 4)            # partition order 1 → 2 partitions
    bw.write(0, 4)            # rice param 0
    bw.align()
    with pytest.raises(FlacError, match="divisible"):
        F._read_residual(F._BitReader(bw.getvalue()), 193, 0)
    # first partition emptied out by the predictor order
    bw2 = F._BitWriter()
    bw2.write(0, 2)
    bw2.write(0, 4)           # partition order 0
    bw2.write(0, 4)
    bw2.align()
    with pytest.raises(FlacError, match="partition order"):
        F._read_residual(F._BitReader(bw2.getvalue()), 4, 4)


def test_sample_md5_width_is_ceil_bps_over_8():
    # 12-bit samples must hash 2 LE bytes each (spec ceil(bps/8)),
    # not bps//8 = 1 (review finding)
    x = np.array([0x07FF, -0x0800], dtype=np.int64)
    d = F._sample_md5(x[:, None], 12)
    import hashlib
    exp = hashlib.md5(bytes([0xFF, 0x07, 0x00, 0xF8])).digest()
    assert d == exp
