"""Fast-mode MinHash (vectorized crc32/splitmix kernel) vs the md5
oracle-parity kernel: identical pair recall on planted duplicates, and
batch-splitting invariance of the vectorized kernel.

The md5 kernel is the DuckDB-parity contract (round-3 verdict item 2 keeps
it for the oracle); fast mode is the production path. Both feed the same
LSH banding and the same exact-Jaccard verification, so a planted
near-duplicate pair (jaccard >= 0.5, shingle similarity ~0.98) must appear
in BOTH outputs, and non-duplicates in NEITHER (exact verification filters
any spurious candidates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _planted_corpus(tmp_path):
    """60 random-word docs + 12 planted near-dups (one word appended:
    shingle jaccard (n-2)/(n-1) ~= 0.98 -> per-band match prob ~0.96,
    miss prob per pair ~2.5e-6 per band set; corpus is seeded, so the
    outcome is deterministic)."""
    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(4000)]
    texts, ids = [], []
    for i in range(60):
        texts.append(" ".join(rng.choice(vocab, size=50, replace=False)))
        ids.append(i)
    planted = []
    for j in range(12):
        base = texts[j]
        texts.append(base + f" extra{j}")
        ids.append(100 + j)
        planted.append((j, 100 + j))
    df = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64), "text": texts})
    df.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path), set(planted)


def _pairs(sf_dir: str, mode: str) -> set[tuple[int, int]]:
    from imagor_ray.pipelines.dedup import minhash_pairs_ds

    out = minhash_pairs_ds(sf_dir, mode=mode).to_pandas()
    if "doc_a" not in out.columns:
        return set()
    return set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))


def test_identical_pair_recall_on_planted_dups(ray_session, tmp_path):
    sf_dir, planted = _planted_corpus(tmp_path)
    md5_pairs = _pairs(sf_dir, "md5")
    fast_pairs = _pairs(sf_dir, "fast")
    # every planted pair recovered by both kernels
    assert planted <= md5_pairs
    assert planted <= fast_pairs
    # exact verification kills spurious candidates in both -> identical sets
    assert md5_pairs == fast_pairs == planted


def test_fast_kernel_batch_invariant():
    from imagor_ray.pipelines.dedup import _signature_batch_fast

    rng = np.random.RandomState(42)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 60)))
        for _ in range(200)
    ]
    texts += ["", "one", "two words"]  # <3-word docs take the small path
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    full = _signature_batch_fast(df).reset_index(drop=True)
    parts = pd.concat(
        [_signature_batch_fast(df.iloc[i : i + 1]) for i in range(len(df))],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(full, parts)
    assert all(full[f"mh{k}"].dtype == np.uint64 for k in range(8))


def test_mode_resolution_env_and_validation(monkeypatch):
    from imagor_ray.pipelines.dedup import _resolve_minhash_mode

    assert _resolve_minhash_mode("md5") == "md5"
    assert _resolve_minhash_mode("fast") == "fast"
    monkeypatch.setenv("IMAGOR_RAY_MINHASH_MODE", "fast")
    assert _resolve_minhash_mode(None) == "fast"
    monkeypatch.delenv("IMAGOR_RAY_MINHASH_MODE")
    assert _resolve_minhash_mode(None) == "md5"
    with pytest.raises(ValueError):
        _resolve_minhash_mode("sha1")
