"""Sequence packing (distributed ordered prefix-sum) — textstats.py.

The two-pass scan must be invariant to the range-partition size: any
part_rows choice yields the same global token offsets.
"""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _run(part_rows, seq_len=512):
    from imagor_ray.pipelines.textstats import sequence_pack

    return (sequence_pack(SF, seq_len=seq_len, part_rows=part_rows)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


class TestSequencePack:
    @pytest.mark.parametrize("part_rows", [7, 64, 10**9])
    def test_partition_size_invariance(self, part_rows, ray_session):
        base = _run(10**9)          # single partition = plain cumsum
        got = _run(part_rows)
        pd.testing.assert_frame_equal(got, base)

    def test_offsets_are_a_prefix_sum(self, ray_session):
        df = _run(64)
        assert df["tok_start"].iloc[0] == 0
        expect = df["n_tokens"].cumsum().shift(fill_value=0)
        assert (df["tok_start"] == expect).all()
        # chunk arithmetic: seq ids consistent with the offsets
        assert (df["seq_first"] == df["tok_start"] // 512).all()
        assert (df["seq_last"] ==
                (df["tok_start"] + df["n_tokens"] - 1) // 512).all()
        # corpus is big enough that some docs straddle a boundary
        assert (df["seq_last"] > df["seq_first"]).any()
