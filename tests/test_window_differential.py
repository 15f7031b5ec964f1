"""Random-table differential: the window / rank operator family vs
DuckDB window functions on a seeded random event table.  The driver
contract pins these ops on the fixed testdata tables; this suite pins
them on an adversarial layout -- many ties, interleaved users, skewed
block boundaries -- without leaving pytest."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _random_events(seed: int, n: int = 2000, n_users: int = 37):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "user_id": pa.array(
                rng.integers(1, n_users + 1, n).astype(np.int64)
            ),
            # coarse timestamps force heavy (user, ts) ties so the
            # event_id tie-break is actually exercised
            "ts": pa.array(
                rng.integers(0, 50, n).astype(np.int64),
                pa.timestamp("us"),
            ),
            "value": pa.array(
                np.floor(rng.uniform(-5, 5, n) * 100) / 100.0,
                pa.float64(),
            ),
        }
    )


def _duck(tbl: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("events", tbl)
    return con.execute(sql).fetchdf()


@pytest.fixture(scope="module")
def events_tbl():
    return _random_events(seed=20260818)


def _compare(ray_ds, tbl, sql, key_cols, val_cols):
    mine = ray_ds.to_pandas().sort_values(key_cols).reset_index(drop=True)
    ref = _duck(tbl, sql).sort_values(key_cols).reset_index(drop=True)
    assert len(mine) == len(ref)
    for c in val_cols:
        a, b = mine[c], ref[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert ((a - b).abs().fillna(0) < 1e-9).all(), c
            assert (a.isna() == b.isna()).all(), c
        else:
            assert a.astype("Int64").equals(b.astype("Int64")), c


def test_event_gaps_random(ray_session, events_tbl):
    ray = ray_session
    from console_log_parser_ray.stages.events import event_gaps

    ds = event_gaps(
        ray.data.from_arrow(events_tbl).repartition(7), n_buckets=16
    )
    sql = (
        "SELECT event_id, epoch_us(ts) - lag(epoch_us(ts)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us "
        "FROM events"
    )
    _compare(ds, events_tbl, sql, ["event_id"], ["gap_us"])


def test_running_totals_random(ray_session, events_tbl):
    ray = ray_session
    from console_log_parser_ray.stages.events import running_user_totals

    ds = running_user_totals(
        ray.data.from_arrow(events_tbl).repartition(7), n_buckets=16
    )
    sql = (
        "SELECT event_id, row_number() OVER w AS seq, "
        "CAST(sum(CAST(floor(value*100) AS BIGINT)) OVER w AS BIGINT) "
        "AS run_cents FROM events WINDOW w AS "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING)"
    )
    _compare(ds, events_tbl, sql, ["event_id"], ["seq", "run_cents"])


def test_rolling_sum_random(ray_session, events_tbl):
    ray = ray_session
    from console_log_parser_ray.stages.events import rolling_user_sum

    ds = rolling_user_sum(
        ray.data.from_arrow(events_tbl).repartition(7),
        window=4,
        n_buckets=16,
    )
    sql = (
        "SELECT event_id, CAST(sum(CAST(floor(value*100) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS win_cents FROM events"
    )
    _compare(ds, events_tbl, sql, ["event_id"], ["win_cents"])


def test_global_rank_and_ntile_random(ray_session, events_tbl):
    ray = ray_session
    from console_log_parser_ray.stages.relational import global_row_number

    # rank over a heavily tied integer value
    vals = pa.table(
        {
            "doc_id": events_tbl.column("event_id"),
            "n_chars": pa.array(
                (
                    events_tbl.column("ts")
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                    % 13
                ).astype(np.int64)
            ),
        }
    )
    ds = global_row_number(
        ray.data.from_arrow(vals).repartition(7),
        value_col="n_chars",
        id_col="doc_id",
        descending=True,
        n_buckets=16,
    )
    con = duckdb.connect()
    con.register("docs", vals)
    ref = con.execute(
        "SELECT doc_id, row_number() OVER "
        "(ORDER BY n_chars DESC, doc_id) AS rank FROM docs"
    ).fetchdf().sort_values("doc_id").reset_index(drop=True)
    mine = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (mine["rank"].to_numpy() == ref["rank"].to_numpy()).all()

    ds2 = global_row_number(
        ray.data.from_arrow(vals).repartition(7),
        value_col="n_chars",
        id_col="doc_id",
        descending=False,
        out_col="tile",
        ntile=7,
        n_buckets=16,
    )
    ref2 = con.execute(
        "SELECT doc_id, ntile(7) OVER "
        "(ORDER BY n_chars, doc_id) AS tile FROM docs"
    ).fetchdf().sort_values("doc_id").reset_index(drop=True)
    mine2 = ds2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (mine2["tile"].to_numpy() == ref2["tile"].to_numpy()).all()


def test_transition_counts_random(ray_session, events_tbl):
    ray = ray_session
    from console_log_parser_ray.stages.events import transition_counts

    # states from the value sign, keys from user_id (int path)
    t = pa.table(
        {
            "conv_id": events_tbl.column("user_id"),
            "turn_idx": events_tbl.column("event_id"),
            "role": pa.array(
                np.where(
                    events_tbl.column("value").to_numpy(
                        zero_copy_only=False
                    )
                    >= 0,
                    "pos",
                    "neg",
                )
            ),
        }
    )
    ds = transition_counts(
        ray.data.from_arrow(t).repartition(7), n_buckets=16
    )
    sql = (
        "WITH p AS (SELECT role, lead(role) OVER "
        "(PARTITION BY conv_id ORDER BY turn_idx) AS nxt FROM events) "
        "SELECT role AS from_state, nxt AS to_state, count(*) AS n "
        "FROM p WHERE nxt IS NOT NULL GROUP BY role, nxt"
    )
    con = duckdb.connect()
    con.register("events", t)
    ref = (
        con.execute(sql)
        .fetchdf()
        .sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    mine = (
        ds.to_pandas()
        .sort_values(["from_state", "to_state"])
        .reset_index(drop=True)
    )
    assert mine["n"].astype("int64").tolist() == ref["n"].astype(
        "int64"
    ).tolist()
