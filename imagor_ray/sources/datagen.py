"""Deterministic synthetic transcript generator (seeded) matching the
``input_hint`` schema — used by pytest fixtures and the skew tests; no
external data. Zipf-ish conversation lengths produce the hot-key skew the
salted repartition path must handle (SURVEY §7.4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_WORDS = (
    "the fast key order sort table scan merge part window small hash join "
    "spark group query row data slow filter customer line batch value stream"
).split()

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["signup", "click", "view", "purchase", "error"]


def gen_transcripts(
    n_convs: int = 50,
    mean_turns: int = 8,
    seed: int = 42,
    zipf_a: float = 1.5,
    start_ms: int = 1704067200000,  # 2024-01-01T00:00:00Z
    gap_range_s: tuple[int, int] = (1, 3600),
) -> pd.DataFrame:
    """Seeded transcripts with zipf-skewed conversation lengths."""
    rng = np.random.default_rng(seed)
    lengths = np.minimum(rng.zipf(zipf_a, n_convs) * mean_turns // 2 + 1, 2000)
    rows = []
    for c in range(n_convs):
        t_ms = start_ms + int(rng.integers(0, 86_400_000))
        for i in range(int(lengths[c])):
            nw = int(rng.integers(3, 20))
            words = rng.choice(_WORDS, nw)
            num = int(rng.integers(0, 10_000))
            text = " ".join(words) + f" ref{num:04d}"
            rows.append({
                "conv_id": f"conv_{c:06d}",
                "turn_idx": np.int32(i),
                "role": _ROLES[int(rng.integers(0, 4))],
                "text": text,
                "tool": _TOOLS[int(rng.integers(0, 5))],
                "ts": pd.Timestamp(t_ms, unit="ms"),
            })
            t_ms += int(rng.integers(gap_range_s[0] * 1000, gap_range_s[1] * 1000))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def gen_transcripts_table(**kw) -> pa.Table:
    return pa.Table.from_pandas(gen_transcripts(**kw), schema=SCHEMA, preserve_index=False)
