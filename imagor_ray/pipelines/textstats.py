"""Text analysis operators over ``documents``: token counting (whitespace
and BPE-ish regex), quality signals (stopword/punct ratios), document
fingerprinting (rolling polynomial hash), a stopword-marker language-ID
heuristic, and the per-row sketch "meta" outputs (avg-char / thumbhash /
blurhash — the engine's ``avgcolor()``/``thumbhash()``/``blurhash()``
analogues, reference ``processor/vipsprocessor/filter.go:391-513``).

Every column is computed with an exact DuckDB mirror (see
``__ray_entry__.oracle_sql``): whitespace tokens = ``string_split(text,' ')``,
BPE-ish tokens = RE2 pattern ``[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]``,
fingerprint = ``h←(h*31+codepoint) mod 2147483647`` folded left-to-right.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["text_stats", "lang_id", "doc_quality", "doc_sketches",
           "sequence_pack", "inverted_index", "tfidf_top_terms",
           "STOPWORDS", "BPE_PATTERN"]

STOPWORDS = ("the", "a", "of", "and", "to")
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
_BPE_RE = re.compile(BPE_PATTERN)
_FP_MOD = 2147483647


def _fingerprint(text: str) -> int:
    h = 0
    for c in text:
        h = (h * 31 + ord(c)) % _FP_MOD
    return h


def _stats_batch(b: pd.DataFrame) -> pd.DataFrame:
    texts = b["text"].tolist()
    words = [t.split(" ") for t in texts]
    stop = set(STOPWORDS)
    return pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy(),
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        "n_tokens": np.array([len(w) for w in words], dtype="int64"),
        "n_bpe_tokens": np.array([len(_BPE_RE.findall(t)) for t in texts], dtype="int64"),
        "stop_count": np.array(
            [sum(1 for x in w if x in stop) for w in words], dtype="int64"
        ),
        "fingerprint": np.array([_fingerprint(t) for t in texts], dtype="int64"),
    })


def text_stats(sf_dir: str) -> rd.Dataset:
    """doc_id, n_chars, n_tokens, n_bpe_tokens, stop_count, fingerprint."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_stats_batch, batch_format="pandas")


def lang_id(sf_dir: str) -> rd.Dataset:
    """Stopword-marker language heuristic: 'en' when the English-marker
    token ratio ≥ 5%, else 'unknown'. Deterministic; mirrored as SQL CASE."""
    ds = text_stats(sf_dir)

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        ratio = b["stop_count"] / b["n_tokens"].clip(lower=1)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "predicted_lang": np.where(ratio >= 0.05, "en", "unknown"),
        })

    return ds.map_batches(classify, batch_format="pandas")


_PUNCT_RE = re.compile(r"[^A-Za-z0-9 ]")


def doc_quality(sf_dir: str) -> rd.Dataset:
    """Training-data quality scoring (length / stopword / punctuation
    signals — the pre-training filter every corpus pipeline runs before
    dedup): a weighted composite floored to integer milli-units so the
    driver's value hash is immune to float formatting, plus a tier
    classification on the integer. The float expression is the SAME
    left-associated IEEE chain on both sides (CLAUDE.md float contract):

        q = 0.5*(min(n_chars,500)/500.0)
          + 0.3*(stop_count/max(n_tokens,1))
          + 0.2*(1.0 - n_punct/max(n_chars,1))

    Output: doc_id, n_punct, quality_milli, tier ('high'≥700 /
    'medium'≥400 / 'low'). Pure map over a column-pruned read — zero
    shuffle at any scale.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].tolist()
        stop = set(STOPWORDS)
        n_chars = np.array([len(t) for t in texts], dtype="int64")
        n_tokens = np.array([len(t.split(" ")) for t in texts], dtype="int64")
        stop_count = np.array(
            [sum(1 for x in t.split(" ") if x in stop) for t in texts],
            dtype="int64")
        n_punct = np.array([len(_PUNCT_RE.findall(t)) for t in texts],
                           dtype="int64")
        q = (0.5 * (np.minimum(n_chars, 500) / 500.0)
             + 0.3 * (stop_count / np.maximum(n_tokens, 1))
             + 0.2 * (1.0 - n_punct / np.maximum(n_chars, 1)))
        milli = np.floor(q * 1000).astype("int64")
        tier = np.where(milli >= 700, "high",
                        np.where(milli >= 400, "medium", "low"))
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_punct": n_punct,
            "quality_milli": milli,
            "tier": tier,
        })

    return ds.map_batches(score, batch_format="pandas")


def doc_sketches(sf_dir: str) -> rd.Dataset:
    """doc_id, avg_char (most-frequent char, ties→smallest), thumbhash
    (md5 hex prefix 8), blurhash (16-hex simhash over word 3-shingles)."""
    from ..functions.kernels import avgcolor_text, blurhash_text, thumbhash_text

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sk(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].tolist()
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "avg_char": [avgcolor_text(t) for t in texts],
            "thumbhash": [thumbhash_text(t) for t in texts],
            "blurhash": [blurhash_text(t) for t in texts],
        })

    return ds.map_batches(sk, batch_format="pandas")


def sequence_pack(sf_dir: str, seq_len: int = 512,
                  part_rows: int = 100_000) -> rd.Dataset:
    """GPT-style SEQUENCE PACKING (concat-and-chunk): concatenate every
    document's whitespace tokens in ``doc_id`` order and cut the stream
    into fixed ``seq_len`` training sequences; emit each document's
    placement — its global token offset and the first/last sequence it
    lands in. This is the composition step between dedup/quality
    filtering and the tokenizer shard writer in a pre-training pipeline.

    The global ordered prefix-sum runs as the classic two-pass
    DISTRIBUTED SCAN (no driver-side row loop, no global sort):

    1. one column-pruned map computes per-doc ``n_tokens`` and a range
       partition ``_part = doc_id // part_rows`` (doc_id is the dense
       orderable key of ``documents``);
    2. per-batch partials collapse to one (part, subtotal) row each —
       only O(#parts) rows reach the driver, which prefix-sums them
       into per-partition base offsets (at 100 TB that is #docs /
       part_rows integers — KBs, shipped back inside the task closure);
    3. one bucketed ``groupby(_part).map_groups`` sorts each partition
       by doc_id (partition-local sort, never all-to-all) and adds the
       vectorized within-partition cumsum to the partition base.

    Tokenization matches ``text_stats`` (``split(" ")``, empties kept),
    so ``n_tokens >= 1`` and the DuckDB window-function mirror is
    bit-exact. Output: doc_id, n_tokens, tok_start, seq_first,
    seq_last.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        doc_id = b["doc_id"].to_numpy()
        return pd.DataFrame({
            "doc_id": doc_id,
            "n_tokens": np.array([len(t.split(" ")) for t in b["text"]],
                                 dtype="int64"),
            "_part": doc_id // part_rows,
        })

    counted = ds.map_batches(count_tokens, batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("_part", sort=False)["n_tokens"].sum()
        return pd.DataFrame({"_part": s.index.to_numpy(),
                             "subtotal": s.to_numpy()})

    parts = (counted.map_batches(partial, batch_format="pandas")
             .to_pandas().groupby("_part", sort=True)["subtotal"].sum())
    base = dict(zip(parts.index.tolist(),
                    np.concatenate(([0], np.cumsum(parts.to_numpy())[:-1]))
                    .tolist()))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        tok_start = (base[int(g["_part"].iloc[0])]
                     + np.concatenate(([0], np.cumsum(n)[:-1])))
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "tok_start": tok_start,
            "seq_first": tok_start // seq_len,
            "seq_last": (tok_start + n - 1) // seq_len,
        })

    return counted.groupby("_part").map_groups(assign, batch_format="pandas")


def vocabulary(sf_dir: str, min_count: int = 5, num_buckets: int = 32) -> rd.Dataset:
    """Corpus vocabulary builder — global token counts with MAP-SIDE
    PARTIAL AGGREGATION, the canonical 100 TB word-count topology:

    - each batch collapses its tokens to one (token, cnt) row per
      UNIQUE token (a ``collections.Counter`` per batch), so what
      enters the shuffle is bounded by per-batch vocabulary, not token
      volume — Zipf head words (the hot keys) collapse hardest;
    - partials shuffle once on ``crc32(token) % num_buckets`` (the
      engine's shared bucketing, ``functions/hashing.py``) and each
      bucket task does ONE vectorized pandas groupby-sum;
    - the ``min_count`` floor (standard vocab-pruning semantics) is
      applied bucket-locally — correct because a token lives in
      exactly one bucket.

    Tokenization matches ``text_stats``' whitespace tokens exactly
    (``split(" ")``, empties kept) so DuckDB's ``string_split`` is a
    bit-exact mirror. Output: token, cnt (cnt >= min_count).
    """
    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in b["text"].tolist():
            c.update(t.split(" "))
        toks = list(c.keys())
        return pd.DataFrame({
            "token": toks,
            "cnt": np.fromiter(c.values(), dtype="int64", count=len(c)),
            "_tb": crc32_bucket(toks, num_buckets),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["cnt"].sum()
        s = s[s >= min_count]
        return pd.DataFrame({"token": s.index.to_numpy(), "cnt": s.to_numpy()})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_tb")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def inverted_index(sf_dir: str, min_df: int = 10, max_postings: int = 32,
                   num_buckets: int = 32) -> rd.Dataset:
    """Inverted-index builder — the retrieval-side sibling of
    :func:`vocabulary`: token → document frequency + a capped,
    doc_id-sorted posting list. Same 100 TB topology: per-batch
    partial dedup (a token lists a doc once, so what shuffles is
    (token, doc_id) pairs bounded by per-doc vocabulary), ONE shuffle
    on ``crc32(token) % num_buckets``, and a vectorized bucket-local
    reduce — the ``min_df`` floor and the ``max_postings`` cap (both
    standard index-pruning knobs; the cap is what keeps Zipf-head
    posting lists from becoming the hot payload) apply bucket-locally
    because a token lives in exactly one bucket.

    Output: token, df, postings (comma-joined first ``max_postings``
    doc_ids ascending) — df counts ALL docs, the cap only truncates
    the stored list, exactly like the SQL mirror.
    """
    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ids: list[int] = []
        for doc_id, t in zip(b["doc_id"].astype("int64"), b["text"]):
            uniq = set(t.split(" "))
            toks.extend(uniq)
            ids.extend([int(doc_id)] * len(uniq))
        return pd.DataFrame({
            "token": toks,
            "doc_id": np.array(ids, dtype="int64"),
            "_tb": crc32_bucket(toks, num_buckets),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        grp = g.groupby("token", sort=False)["doc_id"]
        df = grp.size()
        keep = df[df >= min_df]
        postings = grp.apply(
            lambda s: ",".join(map(str, s.iloc[:max_postings])))
        return pd.DataFrame({
            "token": keep.index.to_numpy(),
            "df": keep.to_numpy(dtype="int64"),
            "postings": postings[keep.index].to_numpy(),
        })

    return (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("_tb")
        .map_groups(lambda g: reduce_bucket(g.drop(columns=["_tb"])),
                    batch_format="pandas")
    )


def tfidf_top_terms(sf_dir: str, top_k: int = 3,
                    num_buckets: int = 32) -> rd.Dataset:
    """Per-document top-k TF-IDF terms — the relevance-scoring op of a
    text corpus pipeline. The score is kept in exact integer
    micro-units (``tf * 1_000_000 // df``) so the DuckDB mirror hashes
    bit-identically (CLAUDE.md float contract); ties break on token
    ascending.

    Topology: document frequencies come from the same bucketed
    (token, doc_id)-dedup reduce as :func:`inverted_index`, collapse
    to a token→df map on the driver (vocabulary ≪ corpus by Heaps'
    law; at extreme scale the bucketed-join variant of
    ``inverted_index`` replaces the broadcast), and ship back into a
    pure scoring map via the task closure — per-doc tf, score and
    top-k are then embarrassingly parallel, zero further shuffle.

    Output: doc_id, token, rank (1-based), score.
    """
    from collections import Counter

    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in b["text"]:
            toks.extend(set(t.split(" ")))
        return pd.DataFrame({
            "token": toks,
            "_tb": crc32_bucket(toks, num_buckets),
        })

    def df_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False).size()
        return pd.DataFrame({"token": s.index.to_numpy(),
                             "df": s.to_numpy(dtype="int64")})

    df_pdf = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("_tb")
        .map_groups(lambda g: df_bucket(g.drop(columns=["_tb"])),
                    batch_format="pandas")
        .to_pandas()                      # vocabulary-sized, driver-safe
    )
    df_map = dict(zip(df_pdf["token"], df_pdf["df"].astype("int64")))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        out_id, out_tok, out_rank, out_score = [], [], [], []
        for doc_id, t in zip(b["doc_id"].astype("int64"), b["text"]):
            tf = Counter(t.split(" "))
            scored = sorted(
                ((-(cnt * 1_000_000 // df_map[tok]), tok)
                 for tok, cnt in tf.items()),
            )[:top_k]
            for rank, (neg, tok) in enumerate(scored, start=1):
                out_id.append(int(doc_id))
                out_tok.append(tok)
                out_rank.append(rank)
                out_score.append(-neg)
        return pd.DataFrame({
            "doc_id": np.array(out_id, dtype="int64"),
            "token": out_tok,
            "rank": np.array(out_rank, dtype="int64"),
            "score": np.array(out_score, dtype="int64"),
        })

    return ds.map_batches(score, batch_format="pandas")


def doc_repetition(sf_dir: str, n: int = 3) -> rd.Dataset:
    """WITHIN-document repetition signal (the Gopher-rules family of
    repetition filters): how much of a document is repeated word
    n-grams of itself. Pure map over a column-pruned read — zero
    shuffle at any scale. ``rep_milli = (total - distinct) * 1000 //
    total`` in exact integer milli-units (0 for docs shorter than n
    tokens, which have no n-grams).

    Output: doc_id, n_ngrams, distinct_ngrams, rep_milli.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def rep(b: pd.DataFrame) -> pd.DataFrame:
        total, distinct = [], []
        for t in b["text"]:
            w = t.split(" ")
            grams = [tuple(w[i: i + n]) for i in range(len(w) - n + 1)]
            total.append(len(grams))
            distinct.append(len(set(grams)))
        total = np.array(total, dtype="int64")
        distinct = np.array(distinct, dtype="int64")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "n_ngrams": total,
            "distinct_ngrams": distinct,
            "rep_milli": np.where(
                total > 0, (total - distinct) * 1000 // np.maximum(total, 1),
                0).astype("int64"),
        })

    return ds.map_batches(rep, batch_format="pandas")


def doc_dup_fraction(sf_dir: str, n: int = 8,
                     num_buckets: int = 64) -> rd.Dataset:
    """CROSS-document duplication signal: for each document, the
    fraction of its distinct word n-grams that also appear in ANY
    other document — the doc-level dedup score a corpus pipeline
    thresholds before training. Same single gram-bucket shuffle as
    :func:`contamination` (a gram lives in exactly one bucket, so
    per-bucket shared-gram counts sum to the global count); the
    denominator rides the rows as a per-doc constant so no second
    join is needed. ``dup_milli = shared * 1000 // n_grams`` in exact
    integer milli-units. Docs with no n-grams (< n tokens) are
    excluded, like the SQL mirror.

    Output: doc_id, n_grams, shared_grams, dup_milli.
    """
    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def grams(b: pd.DataFrame) -> pd.DataFrame:
        out_g: list[str] = []
        out_id: list[int] = []
        out_n: list[int] = []
        for doc_id, t in zip(b["doc_id"].astype("int64"), b["text"]):
            w = t.split(" ")
            gset = {" ".join(w[i: i + n]) for i in range(len(w) - n + 1)}
            if not gset:
                continue
            out_g.extend(gset)
            out_id.extend([int(doc_id)] * len(gset))
            out_n.extend([len(gset)] * len(gset))
        return pd.DataFrame({
            "g": out_g,
            "doc_id": np.array(out_id, dtype="int64"),
            "n_grams": np.array(out_n, dtype="int64"),
            "_gb": crc32_bucket(out_g, num_buckets),
        })

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        # grams seen by >= 2 distinct docs are shared; count per doc
        counts = g.groupby("g", sort=False)["doc_id"].transform("nunique")
        shared = g[counts >= 2]
        s = shared.groupby("doc_id", sort=False).agg(
            shared_grams=("g", "size"), n_grams=("n_grams", "first"))
        # every doc's denominator must survive even with zero shared
        denom = g.groupby("doc_id", sort=False)["n_grams"].first()
        out = pd.DataFrame({"doc_id": denom.index.to_numpy(dtype="int64"),
                            "n_grams": denom.to_numpy(dtype="int64")})
        out["shared_grams"] = s["shared_grams"].reindex(
            denom.index, fill_value=0).to_numpy(dtype="int64")
        return out

    def sum_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("doc_id", sort=False).agg(
            n_grams=("n_grams", "first"), shared_grams=("shared_grams", "sum"))
        # n_grams is the per-doc TOTAL (constant on every row); shared
        # sums across gram buckets (disjoint gram sets)
        return pd.DataFrame({
            "doc_id": s.index.to_numpy(dtype="int64"),
            "n_grams": s["n_grams"].to_numpy(dtype="int64"),
            "shared_grams": s["shared_grams"].to_numpy(dtype="int64"),
            "dup_milli": (s["shared_grams"].to_numpy(dtype="int64") * 1000
                          // s["n_grams"].to_numpy(dtype="int64")),
        })

    def add_doc_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_db"] = (b["doc_id"].to_numpy(dtype="int64") % np.int64(32))
        return b

    return (
        ds.map_batches(grams, batch_format="pandas")
        .groupby("_gb")
        .map_groups(lambda g: bucket_partials(g.drop(columns=["_gb"])),
                    batch_format="pandas")
        .map_batches(add_doc_bucket, batch_format="pandas")
        .groupby("_db")
        .map_groups(lambda g: sum_per_doc(g.drop(columns=["_db"])),
                    batch_format="pandas")
    )


def doc_oov(sf_dir: str, min_count: int = 100,
            num_buckets: int = 32) -> rd.Dataset:
    """Perplexity-proxy scorer: per-document OUT-OF-VOCABULARY token
    fraction against the corpus's pruned vocabulary (the cheap stand-in
    for an n-gram LM score that corpus pipelines threshold on). The
    classic BROADCAST SEMI-JOIN topology:

    - phase 1 reuses :func:`vocabulary` (map-side partial counts, one
      token-bucket shuffle, ``min_count`` floor). The PRUNED vocab is
      the Zipf head — small even when the corpus is 100 TB — so it is
      collected once on the driver and broadcast via ``ray.put``;
    - phase 2 is a pure map over a column-pruned read: each task reads
      the broadcast set zero-copy from the object store and scores its
      batch. No per-document shuffle anywhere.

    ``oov_milli = n_oov * 1000 // n_tokens`` in exact integer
    milli-units (``n_tokens >= 1`` always: ``"".split(" ") == [""]``).
    Tokenization matches ``text_stats`` (whitespace, empties kept) so
    DuckDB's ``string_split`` mirrors bit-exactly.

    Output: doc_id, n_tokens, n_oov, oov_milli.
    """
    import ray

    vocab = vocabulary(sf_dir, min_count=min_count,
                       num_buckets=num_buckets).to_pandas()
    vocab_ref = ray.put(frozenset(vocab["token"].tolist()))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        toks = [t.split(" ") for t in b["text"]]
        n_tokens = np.array([len(w) for w in toks], dtype="int64")
        n_oov = np.array([sum(1 for x in w if x not in v) for w in toks],
                         dtype="int64")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "n_tokens": n_tokens,
            "n_oov": n_oov,
            "oov_milli": n_oov * 1000 // n_tokens,
        })

    return ds.map_batches(score, batch_format="pandas")


def quality_filter(sf_dir: str, q_pct: int = 25) -> rd.Dataset:
    """GLOBAL-QUANTILE quality filtering — drop the bottom ``q_pct``
    percent of the corpus by :func:`doc_quality` score (the standard
    pre-training corpus cut). The threshold is an EXACT discrete
    quantile, computed scale-free from the score's bounded integer
    domain ([0, 1000] milli-units):

    - phase 1: per-batch value-count partials (<= 1001 rows each)
      reduce through one bucketed ``groupby(value // 32)`` — the full
      histogram (<= 1001 rows total, regardless of corpus size)
      reaches the driver, which picks the smallest value whose
      cumulative count reaches ``ceil(q_pct * n / 100)`` — identical
      to the ``row_number() = k``-th smallest in the SQL mirror;
    - phase 2: a pure map re-scores and filters — the scalar threshold
      ships in the task closure, no shuffle of document rows ever.

    Output: doc_id, quality_milli for surviving docs.
    """
    ds = doc_quality(sf_dir)

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("quality_milli", sort=False).size()
        v = s.index.to_numpy(dtype="int64")
        return pd.DataFrame({"quality_milli": v,
                             "c": s.to_numpy(dtype="int64"),
                             "_hb": v // np.int64(32)})

    def reduce_hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("quality_milli", sort=False)["c"].sum()
        return pd.DataFrame({"quality_milli": s.index.to_numpy(),
                             "c": s.to_numpy(dtype="int64")})

    h = (ds.map_batches(hist, batch_format="pandas")
         .groupby("_hb")
         .map_groups(lambda g: reduce_hist(g.drop(columns=["_hb"])),
                     batch_format="pandas")
         .to_pandas().sort_values("quality_milli"))
    n = int(h["c"].sum())
    k = (n * q_pct + 99) // 100
    thr = int(h.loc[h["c"].cumsum() >= k, "quality_milli"].iloc[0])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        out = b.loc[b["quality_milli"] >= thr, ["doc_id", "quality_milli"]]
        return out.reset_index(drop=True)

    return ds.map_batches(keep, batch_format="pandas")


def curriculum_order(sf_dir: str, bucket_width: int = 8) -> rd.Dataset:
    """Curriculum ORDERING: the dense global rank of every document by
    (quality desc, doc_id asc) — the placement key a curriculum
    sampler reads sequences in. A global rank normally means a global
    sort; here it runs as the two-pass distributed scan over the
    score's bounded integer domain (same trick as
    :func:`sequence_pack`, range-partitioned on VALUE instead of key):

    1. pure-map scoring, ``_part = quality_milli // bucket_width``
       (disjoint value ranges — so cross-partition order is free);
    2. per-batch (part, count) partials; only O(#parts <= 126) rows
       reach the driver, which prefix-sums counts in DESCENDING part
       order into per-partition base ranks;
    3. one bucketed ``groupby(_part)`` sorts each partition locally by
       (quality_milli desc, doc_id) and adds the base.

    Partitioning assumption: score ties concentrate per value bucket,
    so a pathological corpus where most docs share one score puts that
    bucket on one node (document-scale skew, not row-duplication).
    Output: doc_id, quality_milli, rank (1-based, no gaps).
    """
    ds = doc_quality(sf_dir)

    def key(b: pd.DataFrame) -> pd.DataFrame:
        qm = b["quality_milli"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "quality_milli": qm,
            "_part": qm // np.int64(bucket_width),
        })

    keyed = ds.map_batches(key, batch_format="pandas")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("_part", sort=False).size()
        return pd.DataFrame({"_part": s.index.to_numpy(),
                             "c": s.to_numpy(dtype="int64")})

    parts = (keyed.map_batches(partial, batch_format="pandas")
             .to_pandas().groupby("_part", sort=True)["c"].sum()
             .sort_index(ascending=False))
    base = dict(zip(parts.index.tolist(),
                    np.concatenate(([0], np.cumsum(parts.to_numpy())[:-1]))
                    .tolist()))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["quality_milli", "doc_id"],
                          ascending=[False, True])
        b0 = base[int(g["_part"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "quality_milli": g["quality_milli"].to_numpy(),
            "rank": b0 + np.arange(1, len(g) + 1, dtype="int64"),
        })

    return keyed.groupby("_part").map_groups(assign, batch_format="pandas")


def collocations(sf_dir: str, min_count: int = 20, top_k: int = 20,
                 num_buckets: int = 32) -> pd.DataFrame:
    """Collocation mining: the corpus's top-k word bigrams by exact
    integer LIFT (``cnt(a,b) * N / (cnt(a) * cnt(b))`` in milli-units
    — the PMI family without the float log). ONE fused map-side
    partial pass emits all three statistics as tagged rows (bigram
    counts, unigram counts, the total-token count), so the corpus is
    read ONCE and shuffled ONCE on ``crc32(kind|w1|w2) % num_buckets``
    with Counter-collapsed partials (Zipf heads collapse map-side,
    same as :func:`vocabulary`):

    - the ``min_count`` floor applies bucket-locally to bigrams AND
      unigrams (safe: a token in a surviving bigram has
      ``cnt(token) >= cnt(bigram) >= min_count``);
    - only the pruned heads reach the driver, which joins them and
      computes lift with arbitrary-precision Python ints (the product
      ``cnt * N * 1000`` exceeds int64 at 100 TB — the SQL mirror uses
      HUGEINT the same way) and takes the top-k under the total order
      (lift desc, w1, w2).

    Output: w1, w2, cnt, lift_milli (top_k rows).
    """
    from collections import Counter

    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        uni: Counter = Counter()
        big: Counter = Counter()
        total = 0
        for t in b["text"].tolist():
            w = t.split(" ")
            total += len(w)
            uni.update(w)
            big.update(zip(w, w[1:]))
        kinds = (["u"] * len(uni)) + (["b"] * len(big)) + ["n"]
        w1 = list(uni.keys()) + [a for a, _ in big.keys()] + [""]
        w2 = ([""] * len(uni)) + [bb for _, bb in big.keys()] + [""]
        cnt = (list(uni.values()) + list(big.values()) + [total])
        keys = [f"{k}\x1f{a}\x1f{c}" for k, a, c in zip(kinds, w1, w2)]
        return pd.DataFrame({
            "kind": kinds, "w1": w1, "w2": w2,
            "cnt": np.array(cnt, dtype="int64"),
            "_tb": crc32_bucket(keys, num_buckets),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["kind", "w1", "w2"], sort=False)["cnt"].sum()
        s = s[(s >= min_count) | (s.index.get_level_values(0) == "n")]
        out = s.reset_index()
        return out

    pruned = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_tb")
        .map_groups(lambda g: reduce_bucket(g.drop(columns=["_tb"])),
                    batch_format="pandas")
        .to_pandas()
    )
    n_total = int(pruned.loc[pruned["kind"] == "n", "cnt"].sum())
    uni = dict(zip(pruned.loc[pruned["kind"] == "u", "w1"],
                   pruned.loc[pruned["kind"] == "u", "cnt"].astype(int)))
    big = pruned[pruned["kind"] == "b"]

    rows = []
    for w1, w2, cnt in zip(big["w1"], big["w2"], big["cnt"].astype(int)):
        ca, cb = uni.get(w1), uni.get(w2)
        if ca is None or cb is None:
            continue
        rows.append((w1, w2, cnt, (cnt * n_total * 1000) // (ca * cb)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:top_k]
    return pd.DataFrame(rows, columns=["w1", "w2", "cnt", "lift_milli"]) \
        .astype({"cnt": "int64", "lift_milli": "int64"})


def quality_percentile(sf_dir: str) -> rd.Dataset:
    """Percentile-rank NORMALIZATION of the quality score — the CDF
    feature-scaling step before mixing heterogeneous quality signals.
    Same scale-free trick as :func:`quality_filter`: the bounded
    integer histogram (≤1001 cells regardless of corpus size) reduces
    once and broadcasts as a cumulative table inside the task closure;
    the normalization itself is a pure map. ``pct_milli = (# docs with
    strictly smaller score) * 1000 // n`` — exactly ``(rank()-1) *
    1000 // n`` in the SQL mirror.

    Output: doc_id, quality_milli, pct_milli.
    """
    ds = doc_quality(sf_dir)

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("quality_milli", sort=False).size()
        v = s.index.to_numpy(dtype="int64")
        return pd.DataFrame({"quality_milli": v,
                             "c": s.to_numpy(dtype="int64"),
                             "_hb": v // np.int64(32)})

    def reduce_hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("quality_milli", sort=False)["c"].sum()
        return pd.DataFrame({"quality_milli": s.index.to_numpy(),
                             "c": s.to_numpy(dtype="int64")})

    h = (ds.map_batches(hist, batch_format="pandas")
         .groupby("_hb")
         .map_groups(lambda g: reduce_hist(g.drop(columns=["_hb"])),
                     batch_format="pandas")
         .to_pandas().sort_values("quality_milli"))
    n = int(h["c"].sum())
    vals = h["quality_milli"].to_numpy(dtype="int64")
    below = np.concatenate(([0], np.cumsum(h["c"].to_numpy(dtype="int64"))
                            [:-1]))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        qm = b["quality_milli"].to_numpy(dtype="int64")
        idx = np.searchsorted(vals, qm)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "quality_milli": qm,
            "pct_milli": below[idx] * 1000 // np.int64(n),
        })

    return ds.map_batches(score, batch_format="pandas")


def lexical_diversity(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Per-source lexical diversity: token count, DISTINCT token count
    and hapax-legomena count (tokens seen exactly once in that source)
    — the exact type/token-ratio inputs, integer end-to-end (the ratio
    itself is the caller's division; emitting it would break integer
    hash equality).

    Scale shape: the vocabulary topology (textstats.vocabulary) with a
    per-source dimension — per-batch (source, token) Counter partials,
    ONE shuffle on crc32(token) % num_buckets, bucket-local exact
    merge; because a token lives in exactly one bucket, each bucket's
    per-source (distinct, hapax, total) triples are disjoint and the
    final per-source fold is a sum over ≤ num_buckets tiny rows.
    Tokenization matches the repo convention (split(' '), empties
    kept ↔ DuckDB string_split).

    Output: source, n_tokens, n_distinct, n_hapax.
    """
    from ..functions.hashing import crc32_bucket

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for src, t in zip(b["source"].tolist(), b["text"].tolist()):
            for tok in t.split(" "):
                c[(src, tok)] += 1
        keys = list(c.keys())
        toks = [k[1] for k in keys]
        return pd.DataFrame({
            "source": [k[0] for k in keys],
            "token": toks,
            "n": np.fromiter(c.values(), dtype="int64", count=len(c)),
            "_tb": crc32_bucket(toks, num_buckets),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["source", "token"], sort=False)["n"].sum()
        per = s.reset_index().groupby("source", sort=False)["n"].agg(
            n_tokens="sum", n_distinct="size",
            n_hapax=lambda v: int((v == 1).sum()))
        return per.reset_index()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", sort=True).sum().reset_index()
        for c in ("n_tokens", "n_distinct", "n_hapax"):
            out[c] = out[c].astype("int64")
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_tb")
            .map_groups(lambda g: reduce_bucket(g.drop(columns=["_tb"])),
                        batch_format="pandas")
            .map_batches(lambda b: b.assign(_k=0), batch_format="pandas")
            .groupby("_k")
            .map_groups(lambda g: merge(g.drop(columns=["_k"])),
                        batch_format="pandas"))


LEXICAL_DIVERSITY_SQL = """
WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM t GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax
FROM c GROUP BY 1 ORDER BY 1
"""
