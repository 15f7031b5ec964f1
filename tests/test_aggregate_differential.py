"""Random-table differential for the aggregate / dedup-signal family
vs in-process DuckDB: distinct counts, audience overlap, MAD flags,
and duplicated-span detection on a random small-vocab corpus (natural
span collisions, docs below the span width, within-doc repeats)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rand_events():
    rng = np.random.default_rng(42)
    n = 3000
    return pa.table(
        {
            "event_type": pa.array(
                rng.choice(["a", "b", "c", "d"], n)
            ),
            "user_id": pa.array(
                rng.integers(1, 80, n).astype(np.int64)
            ),
        }
    )


def test_distinct_count_random(ray_session, rand_events):
    ray = ray_session
    from console_log_parser_ray.stages.events import (
        distinct_count_per_group,
    )

    ds = distinct_count_per_group(
        ray.data.from_arrow(rand_events).repartition(9), n_buckets=16
    )
    con = duckdb.connect()
    con.register("events", rand_events)
    ref = dict(
        con.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events "
            "GROUP BY event_type"
        ).fetchall()
    )
    mine = {
        r["event_type"]: r["n_distinct"] for r in ds.take_all()
    }
    assert mine == ref


def test_audience_overlap_random(ray_session, rand_events):
    ray = ray_session
    from console_log_parser_ray.stages.events import audience_overlap

    df = audience_overlap(
        ray.data.from_arrow(rand_events).repartition(9),
        categories=("a", "b", "c", "d"),
        n_buckets=16,
    )
    con = duckdb.connect()
    con.register("events", rand_events)
    ref = {
        (a, b): n
        for a, b, n in con.execute(
            "WITH d AS (SELECT DISTINCT event_type, user_id "
            "FROM events) "
            "SELECT x.event_type, y.event_type, count(*) FROM d x "
            "JOIN d y ON x.user_id = y.user_id "
            "AND x.event_type < y.event_type GROUP BY 1, 2"
        ).fetchall()
    }
    mine = {(r.type_a, r.type_b): r.n_both for r in df.itertuples()}
    assert mine == ref


def test_mad_flags_random(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.events import mad_outlier_flags

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.integers(90, 111, 500),
            rng.integers(0, 1000, 30),  # genuine tails
        ]
    ).astype(np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(
                np.arange(len(vals), dtype=np.int64)
            ),
            "n_chars": pa.array(vals),
        }
    )
    ds = mad_outlier_flags(
        ray.data.from_arrow(tbl).repartition(9),
        value_col="n_chars",
        id_col="doc_id",
        k=3,
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    ref = dict(
        con.execute(
            "WITH med AS (SELECT quantile_disc(n_chars, 0.5) AS m "
            "FROM documents), "
            "mad AS (SELECT quantile_disc("
            "abs(n_chars - (SELECT m FROM med)), 0.5) AS d "
            "FROM documents) "
            "SELECT doc_id, abs(n_chars - (SELECT m FROM med)) "
            "> 3 * (SELECT d FROM mad) FROM documents"
        ).fetchall()
    )
    mine = {r["doc_id"]: r["is_outlier"] for r in ds.take_all()}
    assert mine == ref
    assert any(mine.values())  # the planted tails actually flag


def test_dup_spans_random(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import dup_spans

    rng = np.random.default_rng(13)
    vocab = ["w%d" % i for i in range(9)]  # tiny vocab -> collisions
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 12)))
        for _ in range(120)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(
                np.arange(1, 121, dtype=np.int64)
            ),
            "text": pa.array(texts),
        }
    )
    k = 3
    ds = dup_spans(
        ray.data.from_arrow(tbl).repartition(9), k=k, n_buckets=16
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    ref = {
        d: (ns, nd)
        for d, ns, nd in con.execute(
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(text, '\\S+') AS tk FROM documents), "
            "s AS (SELECT doc_id, tk, len(tk) AS n FROM t "
            "WHERE len(tk) >= 3), "
            "g AS (SELECT doc_id, tk, "
            "unnest(generate_series(0, n - 3)) AS i FROM s), "
            "d AS (SELECT DISTINCT doc_id, "
            "array_to_string(tk[i+1 : i+3], ' ') AS span FROM g), "
            "df AS (SELECT span, count(*) AS df FROM d GROUP BY span) "
            "SELECT d.doc_id, count(*), "
            "CAST(count(*) FILTER (WHERE df.df >= 2) AS BIGINT) "
            "FROM d JOIN df USING (span) GROUP BY d.doc_id"
        ).fetchall()
    }
    mine = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in ds.take_all()
    }
    assert mine == ref
