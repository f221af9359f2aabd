"""Raw two-stage hash exchange — the hand-rolled counterpart of
``ds.groupby(bucket_col).map_groups(fn)`` for a small-cardinality
integer bucket key already present on every row.

Why it exists (BENCH.md finding 20): Ray Data's sort-based shuffle pays
a per-execution fixed cost (quantile sampling, boundary exchange,
executor planning) that dominates short executions — measured 1.57×
end-to-end on 1M-row streaming cycles. The exchange moves the same
bytes through the same object store, but as plain tasks: map tasks
split each block into ``nb`` bucket shards with one argsort+slice
(``num_returns=nb`` — only O(blocks × buckets) object refs ever cross
the driver, never rows), reduce tasks concat their column of shards and
run the grouped function. Byte-identical outputs are asserted in tests
wherever a pipeline offers both engines.

Partitioning assumption: ``bucket_col`` holds ints in ``[0, nb)`` and a
group's rows are exactly the rows sharing its bucket value — identical
to what the groupby engine guarantees. Use the default dataset engine
when you want Ray Data's spill/retry machinery wholesale; use this for
short executions where the fixed cost dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["hash_exchange"]

_FNS = None


def _fns():
    global _FNS
    if _FNS is not None:
        return _FNS
    import ray

    @ray.remote
    def split_block(tbl, nb: int, bucket_col: str):
        import pyarrow as pa

        if tbl.num_rows == 0:
            # fully-filtered blocks arrive schema-less; emit empty
            # shards the reducer's num_rows guard drops
            return [tbl] * nb
        b = tbl[bucket_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(b, kind="stable")
        t = tbl.take(pa.array(order))
        bounds = np.searchsorted(b[order], np.arange(nb + 1))
        return [t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                for i in range(nb)]

    @ray.remote
    def reduce_bucket(fn, *parts):
        import pyarrow as pa

        parts = [p for p in parts if p.num_rows]
        if not parts:
            return None          # empty bucket → no group, like groupby
        return fn(pa.concat_tables(parts).to_pandas())

    _FNS = (split_block, reduce_bucket)
    return _FNS


def hash_exchange(ds, nb: int, grouped_fn, bucket_col: str = "_bucket"
                  ) -> pd.DataFrame:
    """Run ``grouped_fn`` once per non-empty bucket of ``ds`` (a Ray
    Dataset whose rows carry ``bucket_col`` ints in ``[0, nb)``) and
    return the concatenated pandas outputs. Triggers execution of
    ``ds`` (block refs are taken as Arrow tables)."""
    import ray

    split_block, reduce_bucket = _fns()
    refs = ds.to_arrow_refs()
    shards = [split_block.options(num_returns=nb).remote(r, nb, bucket_col)
              for r in refs]
    outs = ray.get([
        reduce_bucket.remote(grouped_fn, *[s[b] for s in shards])
        for b in range(nb)
    ])
    outs = [o for o in outs if o is not None]
    return (pd.concat(outs, ignore_index=True) if outs
            else pd.DataFrame())
