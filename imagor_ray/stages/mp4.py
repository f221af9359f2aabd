"""Real MP4 (ISO BMFF, MPEG-4 Part 12) container codec — stdlib/numpy
only, closing the round-4 "video is the last plug point" gap at the
container level.

What is REAL here: box walking (32/64-bit sizes, nested containers),
``ftyp`` brand handling, full ``moov`` parsing (mvhd/tkhd/mdhd/hdlr,
version 0 AND 1 time fields), complete sample-table resolution — ``stts``
decoding-time deltas, ``stsc`` chunk-run expansion, ``stsz``/``stz2``
sizes, ``stco``/``co64`` chunk offsets — and per-sample byte extraction
straight out of ``mdat``. The muxer writes a spec-shaped single-track
file (ftyp + mdat + moov with a correct sample table) that this demuxer
and any ISO BMFF reader can walk.

What stays a plug point: compressed video BITSTREAM decoding (H.264 /
VP9 sample payloads need a real decoder library). Uncompressed 8-bit
grayscale tracks (sample entry fourcc ``'raw '``, one frame per sample)
decode to actual pixels here, so frame counts, durations, sampling and
thumbnail extraction run on real container data end to end.

Reference parity: the reference sniffs ISO BMFF by the ``ftyp`` box at
bytes 4:8 and dispatches on its brand (``blob.go:170-195`` magic table,
``blob.go:425-439`` — AVIF/HEIF/CR3 are all this same container); its
video-meta surface (dims / duration / fps / frame count + thumbnail
frame) is what ``Mp4Codec.decode_meta`` + ``decode_frames`` expose.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["Mp4Codec", "encode_mp4"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta"}


def _jpeg_luma(sample: bytes) -> np.ndarray:
    """Decode one Motion-JPEG sample to its (h, w) uint8 luma plane.
    Gray JPEGs pass through exactly; color samples reduce via the
    integer Rec.601 weights (the thumbnail-frame convention)."""
    from .jpeg import JpegCodec

    px = JpegCodec.decode_pixels(sample)
    if px.ndim == 3 and px.shape[2] == 1:
        return px[:, :, 0]
    if px.ndim == 2:
        return px
    r = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    b = px[:, :, 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def _walk(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end).
    Handles 32-bit sizes, size==1 (64-bit largesize) and size==0
    (extends to the end of the enclosing scope)."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, off)
        btype = payload[off + 4: off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack_from(">Q", payload, off + 8)
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError("mp4: corrupt box size")
        yield btype, off + hdr, off + size
        off += size


def _children(payload: bytes, start: int, end: int) -> dict[bytes, tuple[int, int]]:
    """First occurrence of each child box type → (body_start, body_end)."""
    out: dict[bytes, tuple[int, int]] = {}
    for btype, a, b in _walk(payload, start, end):
        out.setdefault(btype, (a, b))
    return out


def _full_box(payload: bytes, a: int) -> tuple[int, int, int]:
    """(version, flags, body_offset_after_verflags)."""
    ver = payload[a]
    flags = int.from_bytes(payload[a + 1: a + 4], "big")
    return ver, flags, a + 4


def _parse_track(payload: bytes, trak_a: int, trak_b: int) -> dict:
    kids = _children(payload, trak_a, trak_b)
    track: dict = {}

    if b"tkhd" in kids:
        a, _ = kids[b"tkhd"]
        ver, _, p = _full_box(payload, a)
        w = 8 if ver == 1 else 4
        p += 2 * w                               # creation, modification
        (track["track_id"],) = struct.unpack_from(">I", payload, p)
        p += 4 + 4 + w                           # track_id, reserved, duration
        p += 8 + 2 + 2 + 2 + 2 + 36              # reserved×2, layer, alt, vol, rsv, matrix
        tw, th = struct.unpack_from(">II", payload, p)
        track["width"] = tw >> 16                 # 16.16 fixed point
        track["height"] = th >> 16

    mdia = kids.get(b"mdia")
    if mdia is None:
        return track
    mkids = _children(payload, *mdia)

    if b"mdhd" in mkids:
        a, _ = mkids[b"mdhd"]
        ver, _, p = _full_box(payload, a)
        w = 8 if ver == 1 else 4
        p += 2 * w
        (track["timescale"],) = struct.unpack_from(">I", payload, p)
        p += 4
        (track["duration"],) = struct.unpack_from(">Q" if ver == 1 else ">I",
                                                  payload, p)
    if b"hdlr" in mkids:
        a, _ = mkids[b"hdlr"]
        _, _, p = _full_box(payload, a)
        track["handler"] = payload[p + 4: p + 8].decode("ascii", "replace")

    minf = mkids.get(b"minf")
    if minf is None:
        return track
    stbl = _children(payload, *minf).get(b"stbl")
    if stbl is None:
        return track
    skids = _children(payload, *stbl)

    if b"stsd" in skids:
        a, b = skids[b"stsd"]
        _, _, p = _full_box(payload, a)
        (n_entries,) = struct.unpack_from(">I", payload, p)
        if n_entries >= 1:
            entry_type = payload[p + 8: p + 12]
            track["fourcc"] = entry_type.decode("ascii", "replace")
            # first sample-entry box bytes (codec config boxes — e.g.
            # the fLaC entry's dfLa — live inside it)
            track["sample_entry"] = payload[p + 4: b]
            if track.get("handler") == "vide":
                # VideoSampleEntry: 6 rsv + 2 dri + 16 predefined, then dims
                q = p + 12 + 6 + 2 + 16
                sw, sh = struct.unpack_from(">HH", payload, q)
                track.setdefault("width", sw)
                track.setdefault("height", sh)
                track["sample_width"], track["sample_height"] = sw, sh

    if b"stts" in skids:
        a, _ = skids[b"stts"]
        _, _, p = _full_box(payload, a)
        (n,) = struct.unpack_from(">I", payload, p)
        arr = np.frombuffer(payload, dtype=">u4", count=2 * n,
                            offset=p + 4).reshape(n, 2)
        track["sample_deltas"] = np.repeat(arr[:, 1].astype(np.int64),
                                           arr[:, 0].astype(np.int64))

    sizes = None
    if b"stsz" in skids:
        a, _ = skids[b"stsz"]
        _, _, p = _full_box(payload, a)
        fixed, count = struct.unpack_from(">II", payload, p)
        if fixed:
            sizes = np.full(count, fixed, dtype=np.int64)
        else:
            sizes = np.frombuffer(payload, dtype=">u4", count=count,
                                  offset=p + 8).astype(np.int64)
        track["sample_sizes"] = sizes

    offsets = None
    if b"stco" in skids or b"co64" in skids:
        if b"stco" in skids:
            a, _ = skids[b"stco"]
            _, _, p = _full_box(payload, a)
            (n,) = struct.unpack_from(">I", payload, p)
            offsets = np.frombuffer(payload, dtype=">u4", count=n,
                                    offset=p + 4).astype(np.int64)
        else:
            a, _ = skids[b"co64"]
            _, _, p = _full_box(payload, a)
            (n,) = struct.unpack_from(">I", payload, p)
            offsets = np.frombuffer(payload, dtype=">u8", count=n,
                                    offset=p + 4).astype(np.int64)
        track["chunk_offsets"] = offsets

    if b"stsc" in skids and sizes is not None and offsets is not None:
        a, _ = skids[b"stsc"]
        _, _, p = _full_box(payload, a)
        (n,) = struct.unpack_from(">I", payload, p)
        runs = np.frombuffer(payload, dtype=">u4", count=3 * n,
                             offset=p + 4).reshape(n, 3).astype(np.int64)
        # Expand (first_chunk, samples_per_chunk) runs over the chunk list.
        n_chunks = len(offsets)
        spc = np.empty(n_chunks, dtype=np.int64)
        for i in range(n):
            first = runs[i, 0] - 1                        # 1-based → 0-based
            last = runs[i + 1, 0] - 1 if i + 1 < n else n_chunks
            spc[first:last] = runs[i, 1]
        # Absolute offset of every sample: chunk base + prefix sum of the
        # preceding sample sizes within its chunk.
        chunk_of_sample = np.repeat(np.arange(n_chunks), spc)[: len(sizes)]
        base = offsets[chunk_of_sample]
        csum = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        chunk_first = np.concatenate(([0], np.cumsum(spc)[:-1]))
        within = csum - csum[np.minimum(chunk_first[chunk_of_sample],
                                        len(sizes) - 1)]
        track["sample_offsets"] = base + within
    return track


def _parse(payload: bytes) -> dict:
    top = _children(payload, 0, len(payload))
    if b"ftyp" not in top:
        raise ValueError("mp4: missing ftyp")
    a, b = top[b"ftyp"]
    info: dict = {"brand": payload[a: a + 4].decode("ascii", "replace"),
                  "tracks": []}
    moov = top.get(b"moov")
    if moov is None:
        raise ValueError("mp4: missing moov")
    mkids_all = list(_walk(payload, *moov))
    for btype, ta, tb in mkids_all:
        if btype == b"mvhd":
            ver, _, p = _full_box(payload, ta)
            w = 8 if ver == 1 else 4
            p += 2 * w
            (info["timescale"],) = struct.unpack_from(">I", payload, p)
            (info["duration"],) = struct.unpack_from(
                ">Q" if ver == 1 else ">I", payload, p + 4)
        elif btype == b"trak":
            info["tracks"].append(_parse_track(payload, ta, tb))
    return info


class Mp4Codec:
    """ISO BMFF demux — same surface shape as the other codecs, plus
    sample extraction (the demuxer half of the reference's video
    integration: meta + frame access)."""

    @staticmethod
    def parse(payload: bytes) -> dict:
        """Full container info: brand, movie timescale/duration, and per
        track id/handler/fourcc/dims/timescale/duration plus resolved
        sample offsets/sizes/deltas."""
        return _parse(payload)

    @staticmethod
    def decode_meta(payload: bytes) -> dict:
        """Primary-track metadata: width, height, n_frames, channels,
        fps (rounded), duration_ms, fourcc, n_tracks."""
        info = _parse(payload)
        tracks = info["tracks"]
        if not tracks:
            raise ValueError("mp4: no tracks")
        vid = next((t for t in tracks if t.get("handler") == "vide"),
                   tracks[0])
        n = len(vid.get("sample_sizes", ()))
        ts = vid.get("timescale", info.get("timescale", 1)) or 1
        dur = vid.get("duration", info.get("duration", 0))
        deltas = vid.get("sample_deltas")
        fps = 0.0
        if deltas is not None and len(deltas) and deltas.mean() > 0:
            fps = round(ts / float(deltas.mean()), 3)
        return {
            "width": int(vid.get("width", 0)),
            "height": int(vid.get("height", 0)),
            "n_frames": n,
            "channels": 1 if vid.get("fourcc") == "raw " else 0,
            "fps": fps,
            "duration_ms": int(round(dur * 1000 / ts)),
            "fourcc": vid.get("fourcc", ""),
            "n_tracks": len(tracks),
        }

    @staticmethod
    def extract_samples(payload: bytes, track_id: int | None = None) -> list[bytes]:
        """Raw sample payloads of a track (first track by default), in
        decode order — real demuxing out of ``mdat`` via the resolved
        sample table."""
        info = _parse(payload)
        tracks = info["tracks"]
        if track_id is not None:
            tracks = [t for t in tracks if t.get("track_id") == track_id]
        if not tracks:
            raise ValueError("mp4: no matching track")
        t = tracks[0]
        offs, sizes = t.get("sample_offsets"), t.get("sample_sizes")
        if offs is None or sizes is None:
            raise ValueError("mp4: track has no resolvable sample table")
        view = memoryview(payload)
        return [bytes(view[o: o + s]) for o, s in zip(offs.tolist(),
                                                      sizes.tolist())]

    @staticmethod
    def decode_audio(payload: bytes) -> tuple[np.ndarray, int, int]:
        """(samples int64 (n, channels), sample_rate, bps) for an
        ISO-BMFF ``fLaC`` audio track: the ``dfLa`` box inside the
        sample entry carries the STREAMINFO, every sample is one raw
        FLAC frame. Container demux, per-frame predictive decode and
        the cross-sample stream MD5 all verify for real; other audio
        sample entries raise (the documented plug point)."""
        from .flac import decode_flac_blocks, parse_flac_header

        info = _parse(payload)
        aud = next((t for t in info["tracks"]
                    if t.get("handler") == "soun"), None)
        if aud is None:
            raise ValueError("mp4: no audio track")
        if aud.get("fourcc") != "fLaC":
            raise NotImplementedError(
                f"mp4: compressed audio bitstream ({aud.get('fourcc')!r}) "
                f"needs a decoder library; container demux is real — "
                f"plug the decoder over Mp4Codec.extract_samples()")
        entry = aud.get("sample_entry")
        if not entry:
            raise ValueError("mp4: fLaC track without a sample entry")
        # AudioSampleEntry fixed header is 36 bytes (8 box hdr + 28
        # fields); codec config boxes (dfLa) follow inside the entry
        kids = _children(entry, 36, len(entry))
        dfla = kids.get(b"dfLa")
        if dfla is None:
            raise ValueError("mp4: fLaC entry without dfLa box")
        _, _, p = _full_box(entry, dfla[0])
        _, si = parse_flac_header(b"fLaC" + entry[p: dfla[1]])
        blocks = Mp4Codec.extract_samples(payload, aud.get("track_id"))
        samples = decode_flac_blocks(blocks, si)
        return samples, si["sample_rate"], si["bps"]

    @staticmethod
    def decode_frames(payload: bytes) -> np.ndarray:
        """(n_frames, h, w) uint8 luma for an uncompressed-gray
        ``'raw '`` track, a Motion-JPEG ``'jpeg'`` track (every sample
        a complete baseline JPEG, ``stages/jpeg.py``) or an ``'avc1'``
        H.264 track (avcC record + AVCC samples through
        ``stages/h264.py`` — I_PCM subset, CAVLC residuals stay
        gated); other compressed bitstreams (VP9/HEVC) raise — the
        documented decoder-library plug point."""
        info = _parse(payload)
        vid = next((t for t in info["tracks"] if t.get("handler") == "vide"),
                   None)
        if vid is None:
            raise ValueError("mp4: no video track")
        fourcc = vid.get("fourcc")
        samples = Mp4Codec.extract_samples(payload, vid.get("track_id"))
        if not samples:
            raise ValueError("mp4: no samples")
        if fourcc == "jpeg":
            return np.stack([_jpeg_luma(s) for s in samples])
        if fourcc == "avc1":
            # real H.264 over the documented plug point: the avcC
            # configuration record from the sample entry + the AVCC
            # samples from extract_samples feed stages/h264.py (I_PCM
            # subset; CAVLC/CABAC residuals stay honestly gated there)
            from .h264 import decode_h264_samples

            entry = vid.get("sample_entry")
            if not entry:
                raise ValueError("mp4: avc1 track without a sample entry")
            # VisualSampleEntry fixed part is 86 bytes (8 box hdr + 78
            # fields); codec config boxes (avcC) follow inside the entry
            kids = _children(entry, 86, len(entry))
            avcc = kids.get(b"avcC")
            if avcc is None:
                raise ValueError("mp4: avc1 entry without avcC box")
            return decode_h264_samples(entry[avcc[0]: avcc[1]], samples)
        if fourcc != "raw ":
            raise NotImplementedError(
                f"mp4: compressed video bitstream "
                f"({fourcc!r}) needs a decoder library; "
                f"container demux is real — plug the decoder over "
                f"Mp4Codec.extract_samples()")
        w = int(vid.get("sample_width", vid.get("width", 0)))
        h = int(vid.get("sample_height", vid.get("height", 0)))
        return np.stack([
            np.frombuffer(s, dtype=np.uint8, count=h * w).reshape(h, w)
            for s in samples])

    @staticmethod
    def decode_pixels(payload: bytes) -> np.ndarray:
        """First frame as (h, w, 3) RGB — still-image surface (the
        thumbnail-frame analogue)."""
        f0 = Mp4Codec.decode_frames(payload)[0]
        return np.repeat(f0[:, :, None], 3, axis=2)

    decode_rgb = decode_pixels

    @staticmethod
    def resize(payload: bytes, width: int, height: int) -> bytes:
        """Nearest-neighbour resize of EVERY frame, remuxed — the
        n-pages thumbnail analogue over a real container."""
        meta = Mp4Codec.decode_meta(payload)
        fr = Mp4Codec.decode_frames(payload)
        n, h, w = fr.shape
        ri = (np.arange(height) * h // max(1, height)).clip(0, h - 1)
        ci = (np.arange(width) * w // max(1, width)).clip(0, w - 1)
        return encode_mp4(fr[:, ri][:, :, ci], fps=meta["fps"] or 10)


# ---------------------------------------------------------------------------
# Muxer


def _box(btype: bytes, *payloads: bytes) -> bytes:
    data = b"".join(payloads)
    return struct.pack(">I", 8 + len(data)) + btype + data


def _full(btype: bytes, version: int, flags: int, *payloads: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big"), *payloads)


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                            0x40000000)


def _stbl(samples: list[bytes], delta: int, sample_entry: bytes,
          chunk_offsets: list[int], spc_runs: list[tuple[int, int]]) -> bytes:
    n = len(samples)
    sizes = [len(s) for s in samples]
    fixed = sizes[0] if sizes and all(s == sizes[0] for s in sizes) else 0
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", fixed, n),
                 b"" if fixed else struct.pack(f">{n}I", *sizes))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(spc_runs)),
                 b"".join(struct.pack(">III", fc, c, 1) for fc, c in spc_runs))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offsets)),
                 struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1), sample_entry)
    return _box(b"stbl", stsd, stts, stsc, stsz, stco)


def encode_mp4(
    frames: "np.ndarray | list[bytes]",
    *,
    fps: float = 10.0,
    timescale: int = 1000,
    samples_per_chunk: int = 0,
    fourcc: str | None = None,
    codec_private: bytes | None = None,
    sample_rate: int = 8000,
    channels: int = 1,
) -> bytes:
    """Mux samples into a single-track ISO BMFF file (ftyp + mdat +
    moov, offsets exact).

    - ``frames`` as a (n, h, w) uint8 array → uncompressed grayscale
      VIDEO track (sample entry ``'raw '``), one frame per sample —
      round-trips through :meth:`Mp4Codec.decode_frames`.
    - ``frames`` as a list of bytes with ``fourcc="jpeg"`` → a
      Motion-JPEG VIDEO track (each sample a complete baseline JPEG,
      variable sizes, dims read from the first sample) — round-trips
      through :meth:`Mp4Codec.decode_frames`.
    - ``frames`` as a list of bytes with ``fourcc="fLaC"`` → an AUDIO
      track (handler ``soun``, the ISO-BMFF FLAC encapsulation): each
      sample one raw FLAC frame, the ``dfLa`` box inside the sample
      entry carrying the STREAMINFO (pass ``codec_private`` = the
      fLaC header from :func:`encode_flac_parts`) — round-trips
      through :meth:`Mp4Codec.decode_audio`.
    - ``frames`` as a list of bytes (no fourcc) → timed METADATA track
      (handler ``meta``, sample entry ``'mett'``) with variable sample
      sizes — round-trips through :meth:`Mp4Codec.extract_samples`.
    - ``samples_per_chunk`` > 0 splits samples into multiple chunks
      (exercises the stsc/stco expansion path); 0 = one chunk.
    """
    video_fourcc = b"raw "
    is_audio = False
    avcc_payload = None
    if isinstance(frames, np.ndarray) and fourcc == "avc1":
        # real H.264 (I_PCM subset, stages/h264.py): AVCC samples +
        # avcC configuration record in the sample entry
        from .h264 import encode_h264_parts

        if frames.ndim != 3 or frames.dtype != np.uint8:
            raise ValueError("encode_mp4: video frames must be (n,h,w) uint8")
        n, h, w = frames.shape
        avcc_payload, samples = encode_h264_parts(frames)
        handler, is_video, video_fourcc = b"vide", True, b"avc1"
    elif isinstance(frames, np.ndarray):
        if frames.ndim != 3 or frames.dtype != np.uint8:
            raise ValueError("encode_mp4: video frames must be (n,h,w) uint8")
        n, h, w = frames.shape
        samples = [np.ascontiguousarray(f).tobytes() for f in frames]
        handler, is_video = b"vide", True
    elif fourcc == "jpeg":
        from .jpeg import JpegCodec

        samples = [bytes(s) for s in frames]
        if not samples:
            raise ValueError("encode_mp4: no samples")
        meta0 = JpegCodec.decode_meta(samples[0])
        w, h = int(meta0["width"]), int(meta0["height"])
        handler, is_video, video_fourcc = b"vide", True, b"jpeg"
    elif fourcc == "fLaC":
        if codec_private is None:
            raise ValueError("encode_mp4: fLaC needs codec_private "
                             "(the fLaC header with STREAMINFO)")
        samples = [bytes(s) for s in frames]
        h = w = 0
        handler, is_video, is_audio = b"soun", False, True
    else:
        samples = [bytes(s) for s in frames]
        h = w = 0
        handler, is_video = b"meta", False
    if not samples:
        raise ValueError("encode_mp4: no samples")

    n = len(samples)
    delta = max(1, int(round(timescale / max(fps, 1e-9))))
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isomiso2mp41")

    # mdat precedes moov, so every chunk offset is known before moov is
    # built: ftyp + 8-byte mdat header + cumulative sample sizes.
    spc = min(samples_per_chunk, n) if samples_per_chunk > 0 else n
    sizes = [len(s) for s in samples]
    chunk_offsets: list[int] = []
    pos = len(ftyp) + 8
    for i in range(0, n, spc):
        chunk_offsets.append(pos)
        pos += sum(sizes[i: i + spc])
    spc_runs = [(1, spc)]
    if n % spc and n > spc:
        spc_runs.append((len(chunk_offsets), n % spc))

    if is_video:
        extra = ()
        comp = bytes([4]) + b"gray" + b"\x00" * 27       # compressorname
        if avcc_payload is not None:
            extra = (_box(b"avcC", avcc_payload),)
            comp = bytes([4]) + b"h264" + b"\x00" * 27
        sample_entry = _box(
            video_fourcc,
            b"\x00" * 6, struct.pack(">H", 1),          # reserved, dri
            b"\x00" * 16,                                # predefined/reserved
            struct.pack(">HH", w, h),
            struct.pack(">II", 0x00480000, 0x00480000),  # 72 dpi
            b"\x00" * 4, struct.pack(">H", 1),           # reserved, frame_count
            comp,
            struct.pack(">Hh", 8, -1),                   # depth, predefined
            *extra,
        )
        media_hdr = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        hdlr_name = b"VideoHandler\x00"
    elif is_audio:
        # AudioSampleEntry 'fLaC' with the dfLa config box (ISO-BMFF
        # FLAC encapsulation: dfLa holds the METADATA_BLOCKs without
        # the 4-byte stream magic)
        meta_blocks = (codec_private[4:]
                       if codec_private[:4] == b"fLaC" else codec_private)
        # samplesize comes from the STREAMINFO's bps (not a hardcoded
        # 16), and the samplerate field is 16.16 fixed point — a rate
        # that doesn't fit 16 bits can't be silently masked, so refuse
        from .flac import parse_flac_header
        _, _si = parse_flac_header(b"fLaC" + meta_blocks)
        if not 0 < sample_rate <= 0xFFFF:
            raise ValueError(
                "encode_mp4: fLaC sample_rate must fit the 16.16 "
                "AudioSampleEntry field (1..65535), got "
                f"{sample_rate}")
        # the sample entry must agree with the STREAMINFO it wraps —
        # a contradiction inside one box is a corrupt container
        if (sample_rate, channels) != (_si["sample_rate"],
                                       _si["channels"]):
            raise ValueError(
                "encode_mp4: sample_rate/channels "
                f"({sample_rate}, {channels}) contradict the "
                f"STREAMINFO ({_si['sample_rate']}, {_si['channels']})")
        sample_entry = _box(
            b"fLaC",
            b"\x00" * 6, struct.pack(">H", 1),           # reserved, dri
            b"\x00" * 8,                                 # reserved
            struct.pack(">HH", channels, _si["bps"]),    # channels, samplesize
            struct.pack(">HH", 0, 0),                    # predefined, reserved
            struct.pack(">I", sample_rate << 16),
            _full(b"dfLa", 0, 0, meta_blocks),
        )
        media_hdr = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        hdlr_name = b"SoundHandler\x00"
    else:
        sample_entry = _box(b"mett", b"\x00" * 6, struct.pack(">H", 1),
                            b"\x00",                     # content_encoding ""
                            b"application/octet-stream\x00")
        media_hdr = _full(b"nmhd", 0, 0)
        hdlr_name = b"MetaHandler\x00"

    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1),
                               _full(b"url ", 0, 1)))
    stbl = _stbl(samples, delta, sample_entry, chunk_offsets, spc_runs)
    minf = _box(b"minf", media_hdr, dinf, stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4, handler, b"\x00" * 12, hdlr_name)
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration),
                 struct.pack(">HH", 0x55C4, 0))          # language 'und'
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIIII", 0, 0, 1, 0, duration),
                 b"\x00" * 8, struct.pack(">HHHH", 0, 0, 0, 0),
                 _UNITY_MATRIX, struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration),
                 struct.pack(">IHH", 0x00010000, 0x0100, 0),
                 b"\x00" * 8, _UNITY_MATRIX, b"\x00" * 24,
                 struct.pack(">I", 2))                   # next_track_ID
    moov = _box(b"moov", mvhd, trak)
    mdat = _box(b"mdat", *samples)
    return ftyp + mdat + moov
