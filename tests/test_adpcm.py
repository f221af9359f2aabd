"""IMA ADPCM (WAV format tag 0x11): the adaptive-predictive audio
codec. Tests pin the spec tables, the decode recurrence against an
independent straight-line reference, the quantizer-inverse property on
the safe sub-domain, WAV block framing, and the catalog entry's exact
payload recovery."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from imagor_ray.stages.codecs import (
    _IMA_INDEX, _IMA_STEP, _ima_decode_nibbles, _ima_encode_samples,
    WavCodec, adpcm_decode_wav, adpcm_reencode_nibbles, encode_wav_adpcm,
)


def _ref_decode(nibbles, pred, index):
    """Independent straight-line reference of the IMA recurrence,
    written from the spec formula (diff = step/8 + b0*step/4 +
    b1*step/2 + b2*step with truncating shifts)."""
    out = []
    for n in nibbles:
        step = int(_IMA_STEP[index])
        diff = (step >> 3) + (step >> 2 if n & 1 else 0) \
            + (step >> 1 if n & 2 else 0) + (step if n & 4 else 0)
        pred = pred + (-diff if n & 8 else diff)
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[n & 7])))
        out.append(pred)
    return out


class TestImaTables:
    def test_step_table_shape(self):
        assert len(_IMA_STEP) == 89
        assert _IMA_STEP[0] == 7 and _IMA_STEP[-1] == 32767
        assert (np.diff(_IMA_STEP) > 0).all()

    def test_index_table(self):
        assert _IMA_INDEX.tolist() == [-1, -1, -1, -1, 2, 4, 6, 8]


class TestRecurrence:
    def test_decode_matches_reference(self):
        rng = np.random.RandomState(11)
        for _ in range(20):
            nib = rng.randint(0, 16, size=200).astype(np.uint8)
            pred = int(rng.randint(-20000, 20000))
            idx = int(rng.randint(0, 89))
            got = _ima_decode_nibbles(nib, pred, idx)
            assert got.tolist() == _ref_decode(nib, pred, idx)

    def test_quantizer_inverse_on_nondegenerate_codes(self):
        # encode(decode(n)) == n whenever reconstruction is nonzero or
        # the sign bit is 0 — the cell-containment property the catalog
        # entry's exactness rests on
        for idx in range(0, 89, 7):
            for pred0 in (-5000, 0, 1234):
                for n in range(16):
                    step = int(_IMA_STEP[idx])
                    recon = (step >> 3) + (step >> 2 if n & 1 else 0) \
                        + (step >> 1 if n & 2 else 0) \
                        + (step if n & 4 else 0)
                    s = pred0 + (-recon if n & 8 else recon)
                    if not (-32768 <= s <= 32767):
                        continue  # clamp excluded by the safe domain
                    if n & 8 and recon == 0:
                        continue  # sign-degenerate, excluded by design
                    got = _ima_encode_samples(
                        np.array([s]), pred0, idx)[0]
                    assert got == n, (idx, pred0, n)


class TestWavFraming:
    def test_block_headers_and_meta(self, tmp_path):
        nib = np.arange(1200, dtype=np.uint8) % 8  # sign-0 codes
        wav = encode_wav_adpcm(nib, 8000, block_align=256, init_index=40)
        samples, rate, headers = adpcm_decode_wav(wav)
        assert rate == 8000
        n_blocks = -(-len(nib) // ((256 - 4) * 2))
        assert len(headers) == n_blocks
        assert all(h == (0, 40) for h in headers)
        # one sample per nibble plus the per-block header sample
        assert len(samples) == n_blocks * ((256 - 4) * 2 + 1)
        # WavCodec front door decodes tag 0x11 too
        pcm, r = WavCodec.decode_pcm(wav)
        assert pcm.shape == (len(samples), 1) and r == 8000

    def test_stereo_is_a_documented_gate(self):
        fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 4055, 256, 4, 2, 505)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 0))
        wav = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError, match="stereo"):
            adpcm_decode_wav(wav)

    def test_reencode_recovers_nibbles_on_safe_domain(self):
        from imagor_ray.stages.multimodal import (
            _ADPCM_BLOCK, _ADPCM_INIT_INDEX, _adpcm_safe_nibbles,
        )

        rng = np.random.RandomState(13)
        for _ in range(10):
            raw = rng.bytes(int(rng.randint(1, 900)))
            nib = _adpcm_safe_nibbles(raw)
            wav = encode_wav_adpcm(nib, 8000, block_align=_ADPCM_BLOCK,
                                   init_index=_ADPCM_INIT_INDEX)
            samples, _r, headers = adpcm_decode_wav(wav)
            renib = adpcm_reencode_nibbles(samples, headers,
                                           block_align=_ADPCM_BLOCK)
            assert np.array_equal(renib[: len(nib)], nib)


class TestCatalogEntry:
    def test_media_adpcm_roundtrip_hashes(self, ray_session):
        import hashlib

        from imagor_ray.stages.multimodal import media_adpcm_roundtrip

        out = (media_adpcm_roundtrip("/root/testdata/sf0.001")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        import pandas as pd

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"]).head(20)
        got = out.set_index("doc_id")
        for r in docs.itertuples():
            raw = r.text.encode("utf-8")
            assert got.loc[r.doc_id, "n_bytes"] == len(raw)
            assert (got.loc[r.doc_id, "sha256"]
                    == hashlib.sha256(raw).hexdigest())
