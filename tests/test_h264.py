"""H.264 I_PCM-subset codec: Exp-Golomb, emulation prevention,
Annex B framing, SPS cropping, the CAVLC gate, and the MP4 avc1
integration (avcC record + AVCC samples through the real demuxer)."""

import numpy as np
import pytest

from imagor_ray.stages.h264 import (
    H264Codec, _BitReader, _BitWriter, decode_h264, decode_h264_samples,
    ebsp_to_rbsp, encode_h264, encode_h264_parts, rbsp_to_ebsp)


class TestPrimitives:
    def test_exp_golomb_vectors(self):
        # spec examples: ue(0)=1, ue(1)=010, ue(2)=011, ue(3)=00100
        bw = _BitWriter()
        for v in (0, 1, 2, 3, 7):
            bw.ue(v)
        bw.trailing()
        br = _BitReader(bytes(bw.bytes))
        assert [br.ue() for _ in range(5)] == [0, 1, 2, 3, 7]

    def test_signed_golomb_roundtrip(self):
        vals = [0, 1, -1, 2, -2, 13, -26]
        bw = _BitWriter()
        for v in vals:
            bw.se(v)
        bw.trailing()
        br = _BitReader(bytes(bw.bytes))
        assert [br.se() for _ in range(len(vals))] == vals

    def test_emulation_prevention_vectors(self):
        # the four escaped patterns (7.4.1) and a non-escaped 0x0004
        assert rbsp_to_ebsp(b"\x00\x00\x00") == b"\x00\x00\x03\x00"
        assert rbsp_to_ebsp(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
        assert rbsp_to_ebsp(b"\x00\x00\x02") == b"\x00\x00\x03\x02"
        assert rbsp_to_ebsp(b"\x00\x00\x03") == b"\x00\x00\x03\x03"
        assert rbsp_to_ebsp(b"\x00\x00\x04") == b"\x00\x00\x04"
        for rbsp in (b"\x00" * 7, b"\x00\x00\x01\x00\x00\x02",
                     bytes(range(256)) * 3):
            assert ebsp_to_rbsp(rbsp_to_ebsp(rbsp)) == rbsp

    def test_pcm_zero_runs_never_emulate_start_codes(self):
        # an all-zero frame is the worst case: its EBSP must contain
        # no 0x000001 (start code) and no unescaped 0x000000
        f = np.zeros((1, 16, 16), dtype=np.uint8)
        bs = encode_h264(f)
        body = bs[4:]
        # only the two legal start codes (SPS/PPS/IDR boundaries)
        assert body.count(b"\x00\x00\x00\x01") == 2
        assert decode_h264(bs).sum() == 0


class TestStream:
    def test_roundtrip_with_cropping(self):
        rng = np.random.RandomState(3)
        f = rng.randint(0, 256, size=(2, 18, 22)).astype(np.uint8)
        bs = encode_h264(f)
        assert (decode_h264(bs) == f).all()
        m = H264Codec.decode_meta(bs)
        assert (m["width"], m["height"], m["n_frames"]) == (22, 18, 2)
        assert m["profile"] == 66

    def test_three_byte_start_codes_accepted(self):
        # re-frame the stream with 3-byte start codes (equally legal)
        f = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
        bs = encode_h264(f)
        nals = bs.split(b"\x00\x00\x00\x01")[1:]
        bs3 = b"".join(b"\x00\x00\x01" + n for n in nals)
        assert (decode_h264(bs3) == f).all()

    def test_non_ipcm_macroblock_gated(self):
        # hand-build a slice whose first mb_type is I_4x4 (0): the
        # decoder must raise the documented CAVLC gate, not misread
        from imagor_ray.stages.h264 import _nal, _pps_rbsp, _sps_rbsp
        bw = _BitWriter()
        bw.ue(0)        # first_mb_in_slice
        bw.ue(7)        # slice_type I
        bw.ue(0)        # pps id
        bw.u(0, 4)      # frame_num
        bw.ue(0)        # idr_pic_id
        bw.se(0)        # slice_qp_delta
        bw.ue(0)        # mb_type 0 = I_4x4 -> gated
        slice_rbsp = bw.trailing()
        sc = b"\x00\x00\x00\x01"
        bs = (sc + _nal(7, _sps_rbsp(16, 16)) + sc + _nal(8, _pps_rbsp())
              + sc + _nal(5, slice_rbsp))
        with pytest.raises(NotImplementedError, match="CAVLC"):
            decode_h264(bs)

    def test_odd_dimensions_rejected(self):
        with pytest.raises(ValueError, match="even"):
            encode_h264(np.zeros((1, 17, 16), dtype=np.uint8))

    def test_slice_before_sps_rejected(self):
        f = np.zeros((1, 16, 16), dtype=np.uint8)
        bs = encode_h264(f)
        nals = bs.split(b"\x00\x00\x00\x01")[1:]
        # drop SPS+PPS, keep only the IDR slice
        with pytest.raises(ValueError, match="before SPS"):
            decode_h264(b"\x00\x00\x00\x01" + nals[2])

    def test_sniff(self):
        f = np.zeros((1, 16, 16), dtype=np.uint8)
        assert H264Codec.sniff(encode_h264(f))
        assert not H264Codec.sniff(b"\x00\x00\x00\x01\x65rest")  # IDR 1st
        from imagor_ray.stages.codecs import sniff_media
        assert sniff_media(encode_h264(f)) == "h264"


class TestMp4Integration:
    def test_avcc_samples_roundtrip(self):
        rng = np.random.RandomState(5)
        f = rng.randint(0, 256, size=(3, 34, 50)).astype(np.uint8)
        avcc, samples = encode_h264_parts(f)
        assert avcc[0] == 1 and avcc[1] == 66       # version, profile
        assert len(samples) == 3
        assert (decode_h264_samples(avcc, samples) == f).all()

    def test_avc1_track_roundtrip(self):
        from imagor_ray.stages.mp4 import Mp4Codec, encode_mp4
        rng = np.random.RandomState(6)
        f = rng.randint(0, 256, size=(4, 18, 30)).astype(np.uint8)
        p = encode_mp4(f, fourcc="avc1", samples_per_chunk=3)
        m = Mp4Codec.decode_meta(p)
        assert (m["fourcc"], m["width"], m["height"], m["n_frames"]) \
            == ("avc1", 30, 18, 4)
        assert (Mp4Codec.decode_frames(p) == f).all()
        # the demuxed samples ARE AVCC (4-byte length-prefixed NALs)
        s0 = Mp4Codec.extract_samples(p)[0]
        ln = int.from_bytes(s0[:4], "big")
        assert ln == len(s0) - 4 and (s0[4] & 0x1F) == 5

    def test_decode_stage_sniffs_h264(self):
        from imagor_ray.stages.multimodal import MediaDecodeStage
        import pyarrow as pa
        f = np.zeros((2, 18, 30), dtype=np.uint8)
        stage = MediaDecodeStage(codec="auto")
        out = stage(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["video"], pa.string()),
            "payload": pa.array([encode_h264(f)], pa.binary()),
            "source": pa.array(["t"], pa.string()),
        }))
        row = out.to_pylist()[0]
        assert (row["width"], row["height"], row["n_frames"]) == (30, 18, 2)

    def test_resize_stage_handles_h264(self):
        from imagor_ray.stages.multimodal import MediaResizeStage
        import pyarrow as pa
        rng = np.random.RandomState(7)
        f = rng.randint(0, 256, size=(2, 32, 48)).astype(np.uint8)
        stage = MediaResizeStage(16, 16, codec="auto")
        out = stage(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["video"], pa.string()),
            "payload": pa.array([encode_h264(f)], pa.binary()),
            "source": pa.array(["t"], pa.string()),
        }))
        small = out.to_pylist()[0]["payload"]
        g = decode_h264(small)
        assert g.shape[0] == 2 and max(g.shape[1:]) <= 16
        assert g.shape[1] % 2 == 0 and g.shape[2] % 2 == 0

    def test_mkv_avc_track_roundtrip(self):
        from imagor_ray.stages.mkv import MkvCodec, encode_mkv
        rng = np.random.RandomState(8)
        f = rng.randint(0, 256, size=(5, 18, 26)).astype(np.uint8)
        avcc, samples = encode_h264_parts(f)
        p = encode_mkv(samples, codec_id="V_MPEG4/ISO/AVC",
                       codec_private=avcc, blocks_per_cluster=2)
        m = MkvCodec.decode_meta(p)
        assert m["codec_id"] == "V_MPEG4/ISO/AVC" and m["n_frames"] == 5
        assert (MkvCodec.decode_frames(p) == f).all()
        # no CodecPrivate -> must refuse, not misdecode
        p2 = encode_mkv(samples, codec_id="V_MPEG4/ISO/AVC",
                        blocks_per_cluster=2)
        with pytest.raises(ValueError, match="CodecPrivate"):
            MkvCodec.decode_frames(p2)
