"""Three-way agreement: generator ground truth == reference oracle ==
engine, on synthetic conversations."""

import pyarrow as pa
import pytest

from console_log_parser_ray.sources.synth import gen_conversation, gen_table
from console_log_parser_ray.stages.scan import _fast_hints, scan_conversation


@pytest.mark.parametrize("ci", [0, 3, 7, 11, 19])
def test_three_way_agreement(ci):
    from refbridge import run_reference

    turns = gen_conversation(ci, seed=42, mean_turns=40)
    lines = [(t.text + "\n").encode() for t in turns]
    oracle = run_reference(lines)
    texts = [t.text for t in turns]
    hints = _fast_hints(pa.chunked_array([pa.array(texts)]))
    cols, _ = scan_conversation(
        "c", texts, list(range(len(texts))), [0] * len(texts), hints=hints
    )
    for i, t in enumerate(turns):
        assert t.clean == oracle.per_line[i], f"gen vs oracle, turn {i}"
        assert cols["clean_text"][i] == t.clean, f"engine vs gen, turn {i}"
        assert cols["role"][i] == t.role, f"role, turn {i}"
        assert cols["cmd_count"][i] == t.cmd, f"cmd, turn {i}"
        assert cols["in_vim"][i] == t.in_vim, f"in_vim, turn {i}"
        assert cols["command"][i] == t.command, f"command, turn {i}"


def test_gen_table_deterministic():
    a = gen_table(3, seed=42, mean_turns=20)
    b = gen_table(3, seed=42, mean_turns=20)
    assert a.equals(b)
    c = gen_table(2, seed=42, mean_turns=20, start=1)
    # shard starting at conv 1 reproduces the same conversations
    assert a.filter(
        pa.compute.equal(a.column("conv_id"), "conv000001")
    ).column("text").to_pylist() == c.filter(
        pa.compute.equal(c.column("conv_id"), "conv000001")
    ).column("text").to_pylist()
