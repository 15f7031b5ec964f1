"""Round-4 hardening tests: null-safety and exactness fixes from the
round-3 advisory (ADVICE.md) plus the rank-family cardinality guard.

Each test pins the FIXED behavior on the exact failure input the
advisory described, so a regression reintroducing the old code path
fails loudly.
"""

import numpy as np
import pyarrow as pa
import pytest


def _ray_ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_pack_sequences_null_text(ray_session):
    """A null text must count as 0 tokens, not poison the cumsum."""
    from console_log_parser_ray.stages.export import pack_sequences

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", None, "d e"], pa.string()),
        }
    )
    out = pack_sequences(
        _ray_ds(tbl), budget=4, n_shards=1
    ).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [3, 0, 2]
    # tape offsets 0,3,3 -> packs 0,0,0 under budget 4
    assert out["pack_id"].tolist() == [0, 0, 0]


def test_funnel_two_step_int64_exact_past_2_53(ray_session):
    """Timestamps beyond 2^53 us must stay exact (no float64 roundtrip):
    two conversion candidates 1 us apart must resolve to the earlier
    one bit-for-bit, and the window comparison must run in int64."""
    from console_log_parser_ray.stages.events import funnel_two_step

    base = (1 << 60) + 1  # odd, far past float64's 2^53 integer range
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [base, base + 7, base + 8, base], pa.int64()
            ),
            "event_type": pa.array(
                ["signup", "purchase", "purchase", "signup"], pa.string()
            ),
        }
    )
    out = (
        funnel_two_step(
            _ray_ds(tbl), "signup", "purchase", window_us=7
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["first_us"].tolist() == [base, base]
    assert out["second_us"][0] == base + 7  # exact, not rounded to base+8
    assert bool(out["converted"][0]) is True  # 7 <= 7 in int64
    assert out["second_us"].isna()[1]
    assert bool(out["converted"][1]) is False


def test_topk_per_group_keeps_null_group(ray_session):
    """Rows with a null group key survive the block-local partial
    (SQL GROUP BY keeps the null group)."""
    from console_log_parser_ray.stages.events import (
        sample_per_group,
        topk_per_group,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1, 9)), pa.int64()),
            "grp": pa.array(
                ["a", "a", "a", None, None, None, "b", None], pa.string()
            ),
            "score": pa.array([5, 3, 9, 8, 1, 6, 2, 7], pa.int64()),
        }
    )
    out = topk_per_group(
        _ray_ds(tbl), "grp", "score", k=2
    ).to_pandas()
    null_rows = out[out["grp"].isna()]
    assert sorted(null_rows["score"].tolist()) == [7, 8]
    assert sorted(out[out["grp"] == "a"]["score"].tolist()) == [5, 9]

    samp = sample_per_group(_ray_ds(tbl), "grp", k=2).to_pandas()
    assert len(samp[samp["grp"].isna()]) == 2


def test_conversation_texts_null_handling(ray_session):
    """Null turn text joins as '' (COALESCE semantics); null conv_id is
    rejected explicitly instead of crashing in the hash loop."""
    from console_log_parser_ray.stages.dedup import conversation_texts

    tbl = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int64()),
            "text": pa.array(["hello", None, "solo"], pa.string()),
        }
    )
    out = (
        conversation_texts(_ray_ds(tbl))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out["conv_text"].tolist() == ["hello\n", "solo"]
    assert out["n_turns"].tolist() == [2, 1]

    bad = pa.table(
        {
            "conv_id": pa.array(["c1", None], pa.string()),
            "turn_idx": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a", "b"], pa.string()),
        }
    )
    with pytest.raises(Exception, match="null 'conv_id'"):
        conversation_texts(_ray_ds(bad)).to_pandas()


def test_rank_family_cardinality_guard(ray_session):
    """A high-cardinality value column must raise the documented
    max_distinct error in every histogram-collecting rank operator
    instead of silently pulling the histogram to the driver; the same
    input under a sufficient cap still ranks correctly."""
    from console_log_parser_ray.stages.events import (
        filter_top_quantile,
        mad_outlier_flags,
    )
    from console_log_parser_ray.stages.relational import (
        dense_rank,
        global_row_number,
    )

    n = 500  # every value distinct, like a float score at scale
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "grp": pa.array(["g%d" % (i % 3) for i in range(n)]),
            "score": pa.array(
                [(i * 2654435761) % (1 << 31) for i in range(n)],
                pa.int64(),
            ),
        }
    )

    for build in (
        lambda: dense_rank(_ray_ds(tbl), "grp", "score", max_distinct=100),
        lambda: global_row_number(
            _ray_ds(tbl), "score", "doc_id", max_distinct=100
        ),
        lambda: filter_top_quantile(
            _ray_ds(tbl), "score", max_distinct=100
        ),
        lambda: mad_outlier_flags(
            _ray_ds(tbl), "score", "doc_id", max_distinct=100
        ),
    ):
        with pytest.raises(ValueError, match="max_distinct"):
            build()

    # under a sufficient cap the exact semantics are unchanged
    out = global_row_number(
        _ray_ds(tbl), "score", "doc_id", max_distinct=n
    ).to_pandas().sort_values("rank")
    scores = out["score"].to_numpy()
    assert (np.diff(scores) < 0).all()  # descending total order
    assert out["rank"].tolist() == list(range(1, n + 1))


def test_conv_bucket_col_matches_per_row_crc32(ray_session):
    """The dictionary-encoded bucket hash equals the old per-row crc32
    (same shuffle placement, so resume manifests stay stable)."""
    import zlib

    from console_log_parser_ray.stages.dedup import _conv_bucket_col

    convs = ["conv_%d" % (i % 7) for i in range(50)]
    tbl = pa.table({"conv_id": pa.array(convs, pa.string())})
    got = _conv_bucket_col(tbl, "conv_id", 64).to_pylist()
    want = [zlib.crc32(c.encode()) % 64 for c in convs]
    assert got == want
