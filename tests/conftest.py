import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools"), "/root/reference"):
    if p not in sys.path:
        sys.path.insert(0, p)

RESOURCES = "/root/reference/test/resources"
CORPUS = [
    "session_linux_1",
    "session_linux_2",
    "session_win_1",
    "session_win_2",
    "testtermlog_0",
    "testtermlog_1",
    "testtermlog_2",
    "testtermlog_3",
    "testtermlog_4",
]


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_lines():
    out = {}
    for stem in CORPUS:
        with open(os.path.join(RESOURCES, stem + ".log"), "rb") as fh:
            out[stem] = fh.readlines()
    return out


@pytest.fixture(scope="session")
def oracle_results(corpus_lines):
    from refbridge import run_reference

    return {stem: run_reference(lines) for stem, lines in corpus_lines.items()}
