"""Real Matroska/WebM (EBML) container codec — stdlib/numpy only, the
companion of ``stages/mp4.py`` (together they close the "MP4/WebM" video
container plug point at the demux level).

What is REAL here: EBML variable-length-integer coding (IDs keep their
marker bit, sizes strip it, unknown-size elements honored), the
EBML header / DocType probe, Segment → Info (TimestampScale, Duration),
Segment → Tracks (track number/type, CodecID, Video PixelWidth/Height,
Audio SamplingFrequency/Channels) and Segment → Cluster → SimpleBlock
walking with per-block track demultiplexing and relative-timestamp
resolution. The muxer writes a spec-shaped single-track file this
demuxer (or any EBML reader) can walk.

What stays a plug point: compressed bitstream decoding (VP8/VP9/AV1
block payloads need a decoder library). Tracks with CodecID
``V_UNCOMPRESSED`` (a real Matroska codec id: raw 8-bit grayscale, one
frame per SimpleBlock) decode to actual pixels.

Reference parity: the reference's magic table sniffs containers by
leading bytes (``blob.go:163-211``); EBML's is the 4-byte
``1A 45 DF A3`` header, and WebM-family formats ride the same dispatch
in its ecosystem (ffmpeg-backed video, docs).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["MkvCodec", "encode_mkv", "EBML_MAGIC"]

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element ids (with marker bits, as stored)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_CODEC_PRIVATE = 0x63A2
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

_MASTERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO,
            _CLUSTER}


def _read_vint(payload: bytes, off: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_offset). EBML vint: leading-zero count of the first
    byte gives the width; element IDs keep the marker bit, sizes strip
    it (all-ones value bits = unknown size → -1)."""
    if off >= len(payload):
        raise ValueError("ebml: truncated vint")
    first = payload[off]
    if first == 0:
        raise ValueError("ebml: invalid vint")
    width = 8 - first.bit_length() + 1
    if off + width > len(payload):
        raise ValueError("ebml: truncated vint body")
    val = first if keep_marker else first & (0xFF >> width)
    for i in range(1, width):
        val = (val << 8) | payload[off + i]
    if not keep_marker:
        # unknown-size marker: every value bit set
        if val == (1 << (7 * width)) - 1:
            return -1, off + width
    return val, off + width


def _walk(payload: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) across [start, end)."""
    off = start
    while off < end:
        eid, off = _read_vint(payload, off, keep_marker=True)
        size, off = _read_vint(payload, off, keep_marker=False)
        body_end = end if size == -1 else off + size
        if body_end > end:
            raise ValueError("ebml: element overruns its parent")
        yield eid, off, body_end
        off = body_end


def _uint(payload: bytes, a: int, b: int) -> int:
    return int.from_bytes(payload[a:b], "big")


def _float(payload: bytes, a: int, b: int) -> float:
    n = b - a
    if n == 4:
        return struct.unpack(">f", payload[a:b])[0]
    if n == 8:
        return struct.unpack(">d", payload[a:b])[0]
    raise ValueError("ebml: bad float width")


def _parse(payload: bytes, want_blocks: bool) -> dict:
    if payload[:4] != EBML_MAGIC:
        raise ValueError("ebml: bad magic")
    info: dict = {"doc_type": "", "timestamp_scale": 1_000_000,
                  "duration": None, "tracks": [], "blocks": []}
    for eid, a, b in _walk(payload, 0, len(payload)):
        if eid == _EBML:
            for cid, ca, cb in _walk(payload, a, b):
                if cid == _DOCTYPE:
                    info["doc_type"] = payload[ca:cb].split(b"\x00")[0] \
                        .decode("ascii", "replace")
        elif eid == _SEGMENT:
            _parse_segment(payload, a, b, info, want_blocks)
    if not info["doc_type"]:
        raise ValueError("ebml: missing DocType")
    return info


def _parse_segment(payload, a, b, info, want_blocks):
    for eid, ca, cb in _walk(payload, a, b):
        if eid == _INFO:
            for iid, ia, ib in _walk(payload, ca, cb):
                if iid == _TS_SCALE:
                    info["timestamp_scale"] = _uint(payload, ia, ib)
                elif iid == _DURATION:
                    info["duration"] = _float(payload, ia, ib)
        elif eid == _TRACKS:
            for tid, ta, tb in _walk(payload, ca, cb):
                if tid == _TRACK_ENTRY:
                    info["tracks"].append(_parse_track(payload, ta, tb))
        elif eid == _CLUSTER:
            cluster_ts = 0
            for kid, ka, kb in _walk(payload, ca, cb):
                if kid == _CLUSTER_TS:
                    cluster_ts = _uint(payload, ka, kb)
                elif kid == _SIMPLE_BLOCK:
                    track, off = _read_vint(payload, ka, keep_marker=False)
                    (rel_ts,) = struct.unpack_from(">h", payload, off)
                    flags = payload[off + 2]
                    if flags & 0x06:
                        raise NotImplementedError(
                            "ebml: laced SimpleBlocks need lacing support;"
                            " this muxer never laces")
                    info["blocks"].append((
                        track, cluster_ts + rel_ts,
                        payload[off + 3: kb] if want_blocks else None,
                    ))


def _parse_track(payload, a, b) -> dict:
    t: dict = {}
    for eid, ca, cb in _walk(payload, a, b):
        if eid == _TRACK_NUM:
            t["track_num"] = _uint(payload, ca, cb)
        elif eid == _TRACK_TYPE:
            t["track_type"] = _uint(payload, ca, cb)
        elif eid == _CODEC_ID:
            t["codec_id"] = payload[ca:cb].split(b"\x00")[0] \
                .decode("ascii", "replace")
        elif eid == _CODEC_PRIVATE:
            t["codec_private"] = payload[ca:cb]
        elif eid == _VIDEO:
            for vid, va, vb in _walk(payload, ca, cb):
                if vid == _PIX_W:
                    t["width"] = _uint(payload, va, vb)
                elif vid == _PIX_H:
                    t["height"] = _uint(payload, va, vb)
        elif eid == _AUDIO:
            for aid, aa, ab in _walk(payload, ca, cb):
                if aid == _SAMPLE_FREQ:
                    t["sampling_frequency"] = _float(payload, aa, ab)
                elif aid == _CHANNELS:
                    t["channels"] = _uint(payload, aa, ab)
    return t


class MkvCodec:
    """Matroska/WebM demux — same surface shape as Mp4Codec."""

    @staticmethod
    def parse(payload: bytes) -> dict:
        """Full container info: doc_type, timestamp_scale, duration,
        tracks (num/type/codec/dims/audio params), blocks as
        (track, abs_timestamp, data)."""
        return _parse(payload, want_blocks=True)

    @staticmethod
    def decode_meta(payload: bytes) -> dict:
        """Primary-track metadata: doc_type, width, height, n_frames,
        codec_id, duration_ms, fps (from block timestamps), n_tracks."""
        info = _parse(payload, want_blocks=False)
        tracks = info["tracks"]
        if not tracks:
            raise ValueError("ebml: no tracks")
        vid = next((t for t in tracks if t.get("track_type") == 1),
                   tracks[0])
        blocks = [ts for tr, ts, _ in info["blocks"]
                  if tr == vid.get("track_num")]
        scale = info["timestamp_scale"]
        dur_ms = (int(round(info["duration"] * scale / 1e6))
                  if info["duration"] is not None else 0)
        fps = 0.0
        if len(blocks) >= 2:
            step = (max(blocks) - min(blocks)) / (len(blocks) - 1)
            if step > 0:
                fps = round(1e9 / (step * scale), 3)
        return {
            "doc_type": info["doc_type"],
            "width": int(vid.get("width", 0)),
            "height": int(vid.get("height", 0)),
            "n_frames": len(blocks),
            "codec_id": vid.get("codec_id", ""),
            "duration_ms": dur_ms,
            "fps": fps,
            "n_tracks": len(tracks),
        }

    @staticmethod
    def extract_blocks(payload: bytes, track_num: int | None = None) -> list[bytes]:
        """SimpleBlock payloads of a track (primary track by default) in
        timestamp order — real demuxing."""
        info = _parse(payload, want_blocks=True)
        if track_num is None:
            tracks = info["tracks"]
            if not tracks:
                raise ValueError("ebml: no tracks")
            vid = next((t for t in tracks if t.get("track_type") == 1),
                       tracks[0])
            track_num = vid.get("track_num")
        picked = [(ts, data) for tr, ts, data in info["blocks"]
                  if tr == track_num]
        picked.sort(key=lambda p: p[0])
        return [data for _, data in picked]

    @staticmethod
    def decode_frames(payload: bytes) -> np.ndarray:
        """(n_frames, h, w) uint8 luma for a ``V_UNCOMPRESSED`` gray
        track or a ``V_MJPEG`` track (every SimpleBlock a complete
        baseline JPEG, decoded for real by ``stages/jpeg.py``); other
        compressed bitstreams (VP8/VP9/AV1) raise — the documented
        decoder-library plug point."""
        info = _parse(payload, want_blocks=False)
        vid = next((t for t in info["tracks"] if t.get("track_type") == 1),
                   None)
        if vid is None:
            raise ValueError("ebml: no video track")
        codec = vid.get("codec_id")
        blocks = MkvCodec.extract_blocks(payload, vid.get("track_num"))
        if not blocks:
            raise ValueError("ebml: no blocks")
        if codec == "V_MJPEG":
            from .mp4 import _jpeg_luma

            return np.stack([_jpeg_luma(blk) for blk in blocks])
        if codec == "V_MPEG4/ISO/AVC":
            # spec layout: CodecPrivate = avcC configuration record,
            # every SimpleBlock AVCC length-prefixed NALs — decoded
            # for real by stages/h264.py (I_PCM subset)
            from .h264 import decode_h264_samples

            priv = vid.get("codec_private")
            if not priv:
                raise ValueError(
                    "ebml: V_MPEG4/ISO/AVC track without CodecPrivate")
            return decode_h264_samples(priv, blocks)
        if codec != "V_UNCOMPRESSED":
            raise NotImplementedError(
                f"ebml: compressed video bitstream "
                f"({codec!r}) needs a decoder library; "
                f"container demux is real — plug the decoder over "
                f"MkvCodec.extract_blocks()")
        w, h = int(vid.get("width", 0)), int(vid.get("height", 0))
        return np.stack([
            np.frombuffer(blk, dtype=np.uint8, count=h * w).reshape(h, w)
            for blk in blocks
        ])

    @staticmethod
    def decode_audio(payload: bytes) -> tuple[np.ndarray, int, int]:
        """(samples int64 (n, channels), sample_rate, bps) for an
        ``A_FLAC`` audio track — the spec layout: CodecPrivate holds
        the fLaC magic + STREAMINFO, each SimpleBlock one raw FLAC
        frame. The container demux, the per-frame predictive decode
        and the stream-level MD5 are all verified for real; other
        audio codec ids raise (the documented plug point)."""
        from .flac import decode_flac_blocks, parse_flac_header

        info = _parse(payload, want_blocks=False)
        aud = next((t for t in info["tracks"] if t.get("track_type") == 2),
                   None)
        if aud is None:
            raise ValueError("ebml: no audio track")
        codec = aud.get("codec_id")
        if codec != "A_FLAC":
            raise NotImplementedError(
                f"ebml: compressed audio bitstream ({codec!r}) needs a "
                f"decoder library; container demux is real — plug the "
                f"decoder over MkvCodec.extract_blocks()")
        priv = aud.get("codec_private")
        if not priv:
            raise ValueError("ebml: A_FLAC track without CodecPrivate")
        _, si = parse_flac_header(priv)
        blocks = MkvCodec.extract_blocks(payload, aud.get("track_num"))
        samples = decode_flac_blocks(blocks, si)
        return samples, si["sample_rate"], si["bps"]

    @staticmethod
    def decode_pixels(payload: bytes) -> np.ndarray:
        f0 = MkvCodec.decode_frames(payload)[0]
        return np.repeat(f0[:, :, None], 3, axis=2)

    decode_rgb = decode_pixels

    @staticmethod
    def resize(payload: bytes, width: int, height: int) -> bytes:
        """Nearest-neighbour resize of EVERY frame, remuxed."""
        meta = MkvCodec.decode_meta(payload)
        fr = MkvCodec.decode_frames(payload)
        n, h, w = fr.shape
        ri = (np.arange(height) * h // max(1, height)).clip(0, h - 1)
        ci = (np.arange(width) * w // max(1, width)).clip(0, w - 1)
        return encode_mkv(fr[:, ri][:, :, ci], fps=meta["fps"] or 10,
                          doc_type=meta["doc_type"])


# ---------------------------------------------------------------------------
# Muxer


def _vint_size(value: int) -> bytes:
    """Encode a size as the shortest EBML vint."""
    for width in range(1, 9):
        if value < (1 << (7 * width)) - 1:
            out = value | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise ValueError("ebml: size too large")


def _eid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _elem(eid: int, data: bytes) -> bytes:
    return _eid(eid) + _vint_size(len(data)) + data


def _uint_elem(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _elem(eid, value.to_bytes(n, "big"))


def encode_mkv(
    frames: "np.ndarray | list[bytes]",
    *,
    fps: float = 10.0,
    blocks_per_cluster: int = 4,
    doc_type: str = "matroska",
    codec_id: str | None = None,
    codec_private: bytes | None = None,
    sample_rate: int = 8000,
    channels: int = 1,
) -> bytes:
    """Mux samples into a single-track Matroska/WebM file.

    - ``frames`` as a (n, h, w) uint8 array → ``V_UNCOMPRESSED`` gray
      VIDEO track, one frame per SimpleBlock — round-trips through
      :meth:`MkvCodec.decode_frames`;
    - ``frames`` as a list of bytes → opaque video-track blocks under
      the given ``codec_id`` (default ``V_OPAQUE``) — round-trips
      through :meth:`MkvCodec.extract_blocks`;
    - an ``A_``-prefixed ``codec_id`` writes an AUDIO track (TrackType
      2, SamplingFrequency/Channels) instead; ``codec_private`` lands
      in CodecPrivate — the spec shape for ``A_FLAC``, whose
      CodecPrivate is the fLaC magic + STREAMINFO and whose
      SimpleBlocks are raw FLAC frames (round-trips through
      :meth:`MkvCodec.decode_audio`);
    - blocks are grouped ``blocks_per_cluster`` per Cluster with
      relative timestamps, so multi-cluster walking and timestamp
      resolution are on every round-trip path.
    """
    if isinstance(frames, np.ndarray):
        if frames.ndim != 3 or frames.dtype != np.uint8:
            raise ValueError("encode_mkv: video frames must be (n,h,w) uint8")
        n, h, w = frames.shape
        samples = [np.ascontiguousarray(f).tobytes() for f in frames]
        codec = "V_UNCOMPRESSED"
    else:
        samples = [bytes(s) for s in frames]
        h = w = 0
        codec = codec_id or "V_OPAQUE"
    if not samples:
        raise ValueError("encode_mkv: no samples")
    is_audio = codec.startswith("A_")

    scale = 1_000_000                         # 1 ms ticks
    step_ms = max(1, int(round(1000 / max(fps, 1e-9))))
    dur_ms = float(len(samples) * step_ms)

    header = _elem(_EBML, b"".join([
        _uint_elem(0x4286, 1),                # EBMLVersion
        _uint_elem(0x42F7, 1),                # EBMLReadVersion
        _uint_elem(0x42F2, 4),                # EBMLMaxIDLength
        _uint_elem(0x42F3, 8),                # EBMLMaxSizeLength
        _elem(_DOCTYPE, doc_type.encode("ascii")),
        _uint_elem(0x4287, 4),                # DocTypeVersion
        _uint_elem(0x4285, 2),                # DocTypeReadVersion
    ]))

    if is_audio:
        media = _elem(_AUDIO,
                      _elem(_SAMPLE_FREQ, struct.pack(">d", sample_rate))
                      + _uint_elem(_CHANNELS, channels))
    else:
        media = _elem(_VIDEO, _uint_elem(_PIX_W, w) + _uint_elem(_PIX_H, h))
    track = _elem(_TRACK_ENTRY, b"".join([
        _uint_elem(_TRACK_NUM, 1),
        _uint_elem(0x73C5, 1),                # TrackUID
        _uint_elem(_TRACK_TYPE, 2 if is_audio else 1),
        _elem(_CODEC_ID, codec.encode("ascii")),
        *([_elem(_CODEC_PRIVATE, codec_private)]
          if codec_private is not None else []),
        media,
    ]))
    info = _elem(_INFO, b"".join([
        _uint_elem(_TS_SCALE, scale),
        _elem(_DURATION, struct.pack(">d", dur_ms)),
        _elem(0x4D80, b"imagor-ray"),         # MuxingApp
        _elem(0x5741, b"imagor-ray"),         # WritingApp
    ]))

    clusters = []
    for c0 in range(0, len(samples), blocks_per_cluster):
        cluster_ts = c0 * step_ms
        body = [_uint_elem(_CLUSTER_TS, cluster_ts)]
        for i, s in enumerate(samples[c0: c0 + blocks_per_cluster]):
            rel = i * step_ms
            body.append(_elem(
                _SIMPLE_BLOCK,
                _vint_size(1) + struct.pack(">h", rel) + b"\x80" + s,
            ))
        clusters.append(_elem(_CLUSTER, b"".join(body)))

    segment = _elem(_SEGMENT,
                    info + _elem(_TRACKS, track) + b"".join(clusters))
    return header + segment
