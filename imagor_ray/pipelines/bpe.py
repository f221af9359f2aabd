"""Distributed BPE tokenizer TRAINING — the marquee iterative op of a
pre-training data pipeline (learn the merge table that the shard writer
later applies). Classic subword BPE over the corpus's word counts:

1. ONE pass over the corpus builds the word-frequency table via the
   engine's map-side-partial word count (``vocabulary`` topology) —
   after this, every round touches only UNIQUE words (the Zipf-pruned
   table is orders of magnitude smaller than the corpus: the standard
   reason BPE training is feasible at 100 TB);
2. each round is (a) a map over the word table emitting weighted
   adjacent-symbol-pair partials collapsed per batch, (b) one tiny
   bucket-grouped reduce that keeps only each bucket's ARGMAX pair
   (so O(num_buckets) rows — not the pair distribution — reach the
   driver), (c) a driver-side global argmax with the deterministic
   tie-break (count desc, then lexicographically smallest pair), and
   (d) a map rewriting each word's symbol sequence with the merge
   (greedy left-to-right, non-overlapping — the reference BPE rule);
3. the rewritten word table is re-materialized per round so round N+1
   does not re-execute rounds 1..N (same pattern as
   ``dedup_components``'s label-propagation loop).

Verification: iterative, so no SQL mirror (the driver records a
rows-only check) — pytest pins the learned merge list against an
independent pure-Python reference implementation on the real corpus
and on randomized corpora (``tests/test_bpe.py``), and pins
determinism across runs.

Reference seam: the reference's filter chain treats tokenization as a
text transform over each turn; this operator is the TRAINING side that
produces the merge table such a transform consumes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["bpe_train", "bpe_encode", "bpe_reference", "END_OF_WORD"]

END_OF_WORD = "</w>"


def _word_table(sf_dir: str, num_buckets: int) -> rd.Dataset:
    """(word, cnt) via map-side Counter partials + one bucket shuffle
    (the ``vocabulary`` topology, without the pruning floor so the
    merge table is exact)."""
    from collections import Counter

    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in b["text"].tolist():
            c.update(w for w in t.split(" ") if w)
        words = list(c.keys())
        return pd.DataFrame({
            "word": words,
            "cnt": np.fromiter(c.values(), dtype="int64", count=len(c)),
            "_tb": crc32_bucket(words, num_buckets),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word", sort=False)["cnt"].sum()
        return pd.DataFrame({"word": s.index.to_numpy(),
                             "cnt": s.to_numpy(dtype="int64")})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_tb")
            .map_groups(lambda g: reduce_bucket(g.drop(columns=["_tb"])),
                        batch_format="pandas"))


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Apply merge (a, b) → a+b greedily left-to-right, non-overlapping
    (the canonical BPE rewrite)."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(sf_dir: str, num_merges: int = 40,
              num_buckets: int = 32) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over the corpus's words (each
    word split into characters plus the ``</w>`` end marker, the
    original subword-BPE convention).

    Output: merge_idx (0-based), left, right, pair_count — the merge
    table in learned order.
    """
    import ray

    from ..functions.hashing import crc32_bucket

    def init_syms(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "syms": ["\x1f".join(list(w) + [END_OF_WORD])
                     for w in b["word"]],
            "cnt": b["cnt"].to_numpy(dtype="int64"),
        })

    table = (_word_table(sf_dir, num_buckets)
             .map_batches(init_syms, batch_format="pandas")
             .materialize())

    merges: list[tuple[int, str, str, int]] = []
    for round_idx in range(num_merges):

        def pair_partials(b: pd.DataFrame) -> pd.DataFrame:
            from collections import Counter

            c: Counter = Counter()
            for syms, cnt in zip(b["syms"], b["cnt"]):
                s = syms.split("\x1f")
                for pair in zip(s, s[1:]):
                    c[pair] += int(cnt)
            if not c:
                return pd.DataFrame({"left": [], "right": [],
                                     "c": np.array([], dtype="int64"),
                                     "_pb": np.array([], dtype="int64")})
            left = [p[0] for p in c.keys()]
            right = [p[1] for p in c.keys()]
            keys = [f"{a}\x1f{bb}" for a, bb in c.keys()]
            return pd.DataFrame({
                "left": left, "right": right,
                "c": np.fromiter(c.values(), dtype="int64", count=len(c)),
                "_pb": crc32_bucket(keys, num_buckets),
            })

        def bucket_argmax(g: pd.DataFrame) -> pd.DataFrame:
            s = (g.groupby(["left", "right"], sort=False)["c"].sum()
                 .reset_index())
            # deterministic per-bucket winner: count desc, pair asc
            s = s.sort_values(["c", "left", "right"],
                              ascending=[False, True, True],
                              kind="mergesort")
            return s.head(1)

        cands = (table.map_batches(pair_partials, batch_format="pandas")
                 .groupby("_pb")
                 .map_groups(lambda g: bucket_argmax(g.drop(columns=["_pb"])),
                             batch_format="pandas")
                 .to_pandas())
        if not len(cands):
            break
        cands = cands.sort_values(["c", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        a, b, c = (str(cands.iloc[0]["left"]), str(cands.iloc[0]["right"]),
                   int(cands.iloc[0]["c"]))
        if c <= 0:
            break
        merges.append((round_idx, a, b, c))
        pair_ref = ray.put((a, b))

        def apply_merge(batch: pd.DataFrame) -> pd.DataFrame:
            aa, bb = ray.get(pair_ref)
            out = []
            for syms in batch["syms"]:
                s = syms.split("\x1f")
                out.append("\x1f".join(_merge_word(s, aa, bb))
                           if aa in s else syms)
            return pd.DataFrame({
                "syms": out,
                "cnt": batch["cnt"].to_numpy(dtype="int64"),
            })

        table = table.map_batches(apply_merge,
                                  batch_format="pandas").materialize()

    return pd.DataFrame(merges, columns=["merge_idx", "left", "right",
                                         "pair_count"]) \
        .astype({"merge_idx": "int64", "pair_count": "int64"})


def bpe_reference(word_counts: dict[str, int],
                  num_merges: int) -> list[tuple[str, str, int]]:
    """Independent single-process reference (the textbook algorithm) —
    used by the differential tests, NOT by the engine path."""
    from collections import Counter

    table = {tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, cnt in table.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, c))
        table = {tuple(_merge_word(list(s), a, b)): c
                 for s, c in table.items()}
    return merges


def bpe_encode(sf_dir: str, num_merges: int = 40,
               num_buckets: int = 32) -> rd.Dataset:
    """TOKENIZER APPLICATION — the shard-writer side that consumes
    ``bpe_train``'s merge table, closing the train→apply loop a
    pre-training pipeline runs: learn merges once (the iterative op),
    broadcast the 40-row table, then ONE pure map over the corpus
    subword-encodes every document.

    Encode semantics match training exactly: each word splits into
    characters + ``</w>`` and the merges apply sequentially in learned
    order with the same greedy left-to-right rewrite (``_merge_word``).
    Per batch, the rewrite runs once per UNIQUE word (Zipf makes the
    cache hit rate high), so the hot loop is dict lookups.

    Rows-only entry (the merge table itself is the iterative artifact
    with no SQL mirror); the differential pytest encodes documents with
    an independent apply over the reference-trained merges and pins
    byte-identical token streams.

    Output: doc_id, n_subwords, token_md5 (md5 of the \\x1e-joined
    token stream).
    """
    import hashlib

    import ray

    merges = bpe_train(sf_dir, num_merges=num_merges,
                       num_buckets=num_buckets)
    merge_list = list(zip(merges["left"], merges["right"]))
    merges_ref = ray.put(merge_list)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        ms = ray.get(merges_ref)
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            toks = cache.get(w)
            if toks is None:
                toks = list(w) + [END_OF_WORD]
                for a, bb in ms:
                    if len(toks) > 1:
                        toks = _merge_word(toks, a, bb)
                cache[w] = toks
            return toks

        n_sub, digests = [], []
        for t in b["text"]:
            stream: list[str] = []
            for w in t.split(" "):
                stream.extend(enc_word(w))
            n_sub.append(len(stream))
            digests.append(hashlib.md5(
                "\x1e".join(stream).encode("utf-8")).hexdigest())
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "n_subwords": np.array(n_sub, dtype="int64"),
            "token_md5": digests,
        })

    return docs.map_batches(encode, batch_format="pandas")
