"""Skew handling: giant conversations get dedicated partitions."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from console_log_parser_ray.sources.synth import gen_table


@pytest.fixture(scope="module")
def skewed_input(tmp_path_factory):
    import pyarrow as pa

    d = tmp_path_factory.mktemp("skewed")
    tbl = gen_table(8, seed=3, mean_turns=20)
    # one giant conversation: ~20x the mean
    giant = gen_table(1, seed=3, mean_turns=400, start=100)
    pq.write_table(pa.concat_tables([tbl, giant]), str(d / "part-0.parquet"))
    return str(d), giant.column("conv_id")[0].as_py()


def test_heavy_conv_detection(ray_session, skewed_input):
    from console_log_parser_ray.pipelines.run import find_heavy_conversations

    path, giant_id = skewed_input
    heavy = find_heavy_conversations(path, threshold=100)
    assert giant_id in heavy
    assert all(n > 100 for n in heavy.values())


def test_heavy_conv_isolated_partition(ray_session, skewed_input, tmp_path):
    from console_log_parser_ray.pipelines.run import run_flagship

    path, giant_id = skewed_input
    out = str(tmp_path / "out")
    res = run_flagship(
        path, out, n_buckets=4, wave_buckets=16, skew_threshold=100
    )
    # the giant conversation lives alone in a dedicated bucket >= 4
    found = None
    for f in glob.glob(
        os.path.join(out, "parsed", "bucket=*", "*.parquet")
    ):
        t = pq.read_table(f, columns=["conv_id"])
        convs = set(t.column("conv_id").to_pylist())
        bucket = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        if giant_id in convs:
            found = (bucket, convs)
    assert found is not None
    bucket, convs = found
    assert bucket >= 4 and convs == {giant_id}


def test_giant_conv_chunk_parallel_equals_sequential(
    ray_session, skewed_input, tmp_path
):
    """The chunk-parallel giant path produces the same parsed rows as a
    run without skew handling."""
    from console_log_parser_ray.pipelines.run import run_flagship

    path, giant_id = skewed_input
    plain_out = str(tmp_path / "plain")
    run_flagship(path, plain_out, n_buckets=4, wave_buckets=16)
    skew_out = str(tmp_path / "skew")
    run_flagship(
        path, skew_out, n_buckets=4, wave_buckets=16, skew_threshold=100
    )

    def rows(out):
        got = []
        for f in glob.glob(
            os.path.join(out, "parsed", "**", "*.parquet"), recursive=True
        ):
            t = pq.read_table(
                f,
                columns=[
                    "conv_id", "turn_idx", "clean_text", "role",
                    "cmd_count", "command", "vim_session_id", "sink",
                ],
            )
            got.extend(map(tuple, zip(*[t.column(c).to_pylist() for c in t.schema.names])))
        return sorted(got)

    assert rows(plain_out) == rows(skew_out)
