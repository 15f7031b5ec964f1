"""Tests for the graph (pagerank) and LM-quality (unigram logprob,
vocab/OOV, priority dedup) operator families."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _pagerank_reference(edges, iterations=3, quantum=10**12):
    """Pure-Python integer reference: same floor arithmetic."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    n = len(deg)
    r = {u: quantum // n for u in deg}
    base = (15 * quantum) // (100 * n)
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {v: base + (85 * sv) // 100 for v, sv in s.items()}
    return r


def test_pagerank_matches_integer_reference(ray_session):
    ray = ray_session
    rng = np.random.default_rng(7)
    # random symmetric graph: every node has outdeg and indeg >= 1
    pairs = set()
    for _ in range(300):
        a, b = rng.integers(0, 40, 2)
        if a != b:
            pairs.add((int(a), int(b)))
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    from console_log_parser_ray.stages.graph import pagerank

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["rank_q"] for r in pagerank(ds, iterations=3).take_all()}
    want = _pagerank_reference(edges, iterations=3)
    assert got == want
    # mass conserved up to floor losses (one unit per floor division)
    total = sum(got.values())
    assert 0 <= 10**12 - total < 10**12 * 1e-6
    # partition invariance: a different bucket count is bit-identical
    got17 = {
        r["node"]: r["rank_q"]
        for r in pagerank(ds, iterations=3, n_buckets=17).take_all()
    }
    assert got17 == got
    # the above-cap co-partitioned-join path is bit-identical to the
    # broadcast partial-fold path
    got_join = {
        r["node"]: r["rank_q"]
        for r in pagerank(
            ds, iterations=3, max_broadcast_nodes=0
        ).take_all()
    }
    assert got_join == got


def test_pagerank_hub_ranks_highest(ray_session):
    ray = ray_session
    # star graph: hub 0 linked to 1..9 both ways
    edges = [(0, i) for i in range(1, 10)] + [(i, 0) for i in range(1, 10)]
    from console_log_parser_ray.stages.graph import pagerank

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["rank_q"] for r in pagerank(ds).take_all()}
    assert got[0] == max(got.values())
    assert len(set(got[i] for i in range(1, 10))) == 1


def test_symmetric_edges_dedup_and_offset(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.graph import symmetric_edges

    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 2, 2], pa.int64()),
                "b": pa.array([5, 5, 5, 6], pa.int64()),
            }
        )
    )
    rows = sorted(
        (r["src"], r["dst"])
        for r in symmetric_edges(ds, "a", "b", b_offset=100).take_all()
    )
    assert rows == [
        (1, 105),
        (2, 105),
        (2, 106),
        (105, 1),
        (105, 2),
        (106, 2),
    ]


def test_unigram_logprob_hand_computed(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import unigram_logprob

    # corpus: 6 tokens total; counts: a=3, b=2, c=1
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a a b", "b a c", "", None], pa.string()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in unigram_logprob(
            ray.data.from_arrow(docs), n_buckets=4
        ).take_all()
    }
    # zero-token docs vanish (the unnest-based SQL shape)
    assert set(out) == {1, 2}
    lnc = math.log(6.0)
    lp = {
        t: math.floor((math.log(float(c)) - lnc) * 1e6)
        for t, c in {"a": 3, "b": 2, "c": 1}.items()
    }
    want1 = 2 * lp["a"] + lp["b"]
    want2 = lp["b"] + lp["a"] + lp["c"]
    assert out[1]["n_tokens"] == 3 and out[1]["logprob_q"] == want1
    assert out[2]["n_tokens"] == 3 and out[2]["logprob_q"] == want2
    assert out[1]["avg_logprob"] == np.float64(want1) / np.float64(3e6)
    # rarer vocabulary scores lower
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]


def test_unigram_logprob_partition_invariant(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import unigram_logprob

    rng = np.random.default_rng(11)
    texts = [
        " ".join(rng.choice(list("abcdefgh"), rng.integers(1, 30)))
        for _ in range(200)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = {
        r["doc_id"]: (r["n_tokens"], r["logprob_q"], r["avg_logprob"])
        for r in unigram_logprob(ray.data.from_arrow(tbl)).take_all()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["logprob_q"], r["avg_logprob"])
        for r in unigram_logprob(
            ray.data.from_arrow(tbl).repartition(7), n_buckets=5
        ).take_all()
    }
    assert a == b


def test_vocab_oov_cut_and_ties(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import vocab_oov

    # counts: x=3, y=2, z=2, w=1 -> V=2 vocab is {x, y} (tie y<z)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["x x y z", "x y z w", ""], pa.string()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in vocab_oov(
            ray.data.from_arrow(docs), vocab_size=2, n_buckets=3
        ).take_all()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 2
    assert out[2]["oov_rate"] == np.float64(2) / np.float64(4)


def test_exact_dedup_priority(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.dedup import exact_dedup_priority

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "source": pa.array(
                ["crawl", "curated", "other", "crawl", "crawl", "books"],
                pa.string(),
            ),
            "text": pa.array(
                ["dup", "dup", "dup", "solo", "tie", "tie"], pa.string()
            ),
        }
    )
    out = exact_dedup_priority(
        ray.data.from_arrow(docs),
        priority=("curated", "books", "crawl"),
        n_shuffle_buckets=4,
    ).take_all()
    kept = {r["text"]: (r["doc_id"], r["source"]) for r in out}
    # "dup": curated wins over crawl; "other" is unlisted -> last
    assert kept["dup"] == (2, "curated")
    assert kept["solo"] == (4, "crawl")
    # "tie": books (rank 1) beats crawl (rank 2) regardless of id
    assert kept["tie"] == (6, "books")
    assert len(out) == 3


def test_exact_dedup_priority_id_tiebreak(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.dedup import exact_dedup_priority

    docs = pa.table(
        {
            "doc_id": pa.array([9, 3, 5], pa.int64()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "text": pa.array(["t", "t", "t"], pa.string()),
        }
    )
    out = exact_dedup_priority(
        ray.data.from_arrow(docs), priority=("s",)
    ).take_all()
    assert [r["doc_id"] for r in out] == [3]


def test_bigram_logprob_hand_computed(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import bigram_logprob

    # bigrams: (a,b)x2 from docs 1,2; (b,a) once; c1(a)=2, c1(b)=1
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b a", "a b", "solo", ""], pa.string()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in bigram_logprob(
            ray.data.from_arrow(docs), n_buckets=4
        ).take_all()
    }
    # docs with < 2 tokens vanish
    assert set(out) == {1, 2}
    # c2(a,b)=2, c2(b,a)=1, c1(a)=2, c1(b)=1
    lp_ab = math.floor((math.log(2.0) - math.log(2.0)) * 1e6)
    lp_ba = math.floor((math.log(1.0) - math.log(1.0)) * 1e6)
    assert out[1]["n_bigrams"] == 2
    assert out[1]["logprob2_q"] == lp_ab + lp_ba == 0
    assert out[2]["n_bigrams"] == 1 and out[2]["logprob2_q"] == lp_ab


def test_bigram_logprob_partition_invariant(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import bigram_logprob

    rng = np.random.default_rng(23)
    texts = [
        " ".join(rng.choice(list("abcd"), rng.integers(0, 20)))
        for _ in range(150)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(150), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = {
        r["doc_id"]: (r["n_bigrams"], r["logprob2_q"], r["avg_logprob2"])
        for r in bigram_logprob(ray.data.from_arrow(tbl)).take_all()
    }
    b = {
        r["doc_id"]: (r["n_bigrams"], r["logprob2_q"], r["avg_logprob2"])
        for r in bigram_logprob(
            ray.data.from_arrow(tbl).repartition(6), n_buckets=7
        ).take_all()
    }
    assert a == b
    # conditional probs normalize: a doc of one repeated token pair
    # has logprob 0 only if that bigram is its w1's sole continuation
    assert len(a) > 0


def test_time_weighted_avg_hand_computed(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.events import time_weighted_avg

    us = 1_000  # 1ms in us
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8, 9, 9], pa.int64()),
            "ts": pa.array(
                [0, 10 * us, 30 * us, 5 * us, 100, 100], pa.timestamp("us")
            ),
            "value": pa.array([1.0, 2.0, 99.0, 5.0, 3.0, 4.0]),
        }
    )
    out = {
        r["user_id"]: r
        for r in time_weighted_avg(
            ray.data.from_arrow(tbl), n_buckets=4
        ).take_all()
    }
    # user 8 has one event -> vanishes; user 9's one interval is
    # zero-length (same ts, dt_ms = 0) -> kept with null twap
    assert set(out) == {7, 9}
    # user 7: 100c x 10ms + 200c x 20ms = 5000 cents-ms over 30ms
    r7 = out[7]
    assert r7["n_intervals"] == 2
    assert r7["weighted_cents_ms"] == 100 * 10 + 200 * 20
    assert r7["span_ms"] == 30
    assert r7["twap"] == np.float64(5000) / np.float64(3000)
    assert out[9]["span_ms"] == 0 and out[9]["twap"] is None


def test_time_weighted_avg_tie_order(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.events import time_weighted_avg

    # two events at the same ts: the (ts, id) order decides which
    # value holds through the following interval
    tbl = pa.table(
        {
            "event_id": pa.array([2, 1, 3], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array([0, 0, 1000], pa.timestamp("us")),
            "value": pa.array([9.0, 1.0, 0.0]),
        }
    )
    (row,) = time_weighted_avg(
        ray.data.from_arrow(tbl), n_buckets=2
    ).take_all()
    # order: id 1 (100c) then id 2 (900c) then id 3; the 1ms interval
    # belongs to id 2's value
    assert row["weighted_cents_ms"] == 900
    assert row["span_ms"] == 1


def _entropy_reference(text, scale=1_000_000):
    from collections import Counter

    toks = text.split()
    n = len(toks)
    cnt = Counter(toks)
    q = sum(
        c * math.floor((math.log(float(n)) - math.log(float(c))) * scale)
        for c in cnt.values()
    )
    return n, q, q / (scale * n)


def test_token_entropy_hand_computed(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import token_entropy

    docs = {
        1: "a b c d",            # uniform: max entropy ln(4)
        2: "x x x x x",          # single type: entropy 0
        3: "cat cat dog",        # 2/3, 1/3 mix
        4: "  lone  ",           # one token after split
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy_q"], r["avg_entropy"])
        for r in token_entropy(ds).take_all()
    }
    assert set(got) == set(docs)
    for did, text in docs.items():
        assert got[did] == _entropy_reference(text)
    assert got[2][1] == 0
    # uniform doc: avg == floor(ln(4)*scale)/scale exactly
    assert got[1][1] == 4 * math.floor(math.log(4.0) * 1_000_000)


def test_token_entropy_partition_invariant_and_empty(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import token_entropy

    rng = np.random.default_rng(11)
    vocab = ["t%d" % i for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 60)))
        for _ in range(200)
    ] + ["", "   "]  # zero-token docs vanish
    ds1 = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy_q"])
        for r in token_entropy(ds1).take_all()
    }
    assert len(got) == 200  # the two empty docs vanished
    rep = token_entropy(
        ds1.repartition(13)
    ).take_all()
    got13 = {r["doc_id"]: (r["n_tokens"], r["entropy_q"]) for r in rep}
    assert got13 == got
    for did, (n, q) in got.items():
        rn, rq, _ = _entropy_reference(texts[did])
        assert (n, q) == (rn, rq)


def test_kmv_distinct_matches_reference_and_partitioning(ray_session):
    ray = ray_session
    import hashlib

    from console_log_parser_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 4000, 20000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array(vals, pa.int64())})
    )
    k = 64
    got = kmv_distinct(ds, "user_id", k=k).take_all()
    # brute-force reference: same md5-prefix hash over distinct values
    hs = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in set(vals.tolist())
        }
    )[:k]
    assert [r["h"] for r in got] == hs
    assert [r["rank"] for r in got] == list(range(1, k + 1))
    for r in got:
        assert r["est"] == ((r["rank"] - 1) << 60) // r["h"]
    # point estimate lands within ~4/sqrt(k-2) of the truth
    true = len(set(vals.tolist()))
    est = got[-1]["est"]
    assert abs(est - true) / true < 4 / math.sqrt(k - 2)
    # partition-invariant (per-block partials fold to the same sketch)
    got7 = kmv_distinct(
        ds.repartition(7), "user_id", k=k
    ).take_all()
    assert [(r["rank"], r["h"], r["est"]) for r in got7] == [
        (r["rank"], r["h"], r["est"]) for r in got
    ]


def test_kmv_distinct_small_exact_and_nulls(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.sketch import kmv_distinct

    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(
                    [1, 2, 2, 3, None, 3, 3], pa.int64()
                )
            }
        )
    )
    got = kmv_distinct(ds, "user_id", k=16).take_all()
    # distinct {1,2,3} < k: the sketch IS the full distinct hash set
    assert len(got) == 3


def _kl_reference(docs_by_class, scale=1_000_000):
    """Pure-Python integer reference for domain_kl."""
    from collections import Counter

    ct = {c: Counter() for c in docs_by_class}
    for c, texts in docs_by_class.items():
        for t in texts:
            ct[c].update(t.split())
    cc = {c: sum(v.values()) for c, v in ct.items() if sum(v.values())}
    corpus = Counter()
    for c in cc:
        corpus.update(ct[c])
    ctot = sum(cc.values())
    out = {}
    for c in cc:
        q = sum(
            n
            * math.floor(
                (
                    math.log(float(n))
                    - math.log(float(cc[c]))
                    - math.log(float(corpus[t]))
                    + math.log(float(ctot))
                )
                * scale
            )
            for t, n in ct[c].items()
        )
        out[c] = (cc[c], q)
    return out


def test_domain_kl_reference_and_partitioning(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import domain_kl

    rng = np.random.default_rng(17)
    vocab = ["v%d" % i for i in range(25)]
    by_class = {
        "narrow": [
            " ".join(rng.choice(vocab[:5], rng.integers(1, 20)))
            for _ in range(60)
        ],
        "broad": [
            " ".join(rng.choice(vocab, rng.integers(1, 20)))
            for _ in range(60)
        ],
        "empty": ["", "  "],
    }
    rows = [
        (c, t) for c, texts in by_class.items() for t in texts
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    ref = _kl_reference(by_class)
    got = {
        r["source"]: (r["n_tokens"], r["kl_q"])
        for r in domain_kl(ds, n_buckets=9).take_all()
    }
    assert got == ref  # all-empty class vanished
    assert "empty" not in got
    # narrow vocabulary diverges more than the full-vocab class
    assert got["narrow"][1] / got["narrow"][0] > got["broad"][1] / (
        got["broad"][0]
    )
    got5 = {
        r["source"]: (r["n_tokens"], r["kl_q"])
        for r in domain_kl(
            ds.repartition(11), n_buckets=5
        ).take_all()
    }
    assert got5 == got


def test_pmi_topk_planted_collocation(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import pmi_topk

    rng = np.random.default_rng(23)
    vocab = ["u%d" % i for i in range(30)]
    texts = []
    for _ in range(150):
        toks = list(rng.choice(vocab, rng.integers(2, 25)))
        if rng.random() < 0.6:
            pos = int(rng.integers(0, len(toks)))
            toks[pos:pos] = ["san", "francisco"]
        texts.append(" ".join(toks))
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    )
    got = pmi_topk(ds, k=10, min_count=3, n_buckets=7).take_all()
    assert (got[0]["w1"], got[0]["w2"]) == ("san", "francisco")
    # exact integer PMI of the planted pair, recomputed by hand
    from collections import Counter

    uni, big = Counter(), Counter()
    for t in texts:
        tk = t.split()
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    n1, n2 = sum(uni.values()), sum(big.values())
    c2 = big[("san", "francisco")]
    want = math.floor(
        (
            math.log(float(c2))
            - math.log(float(n2))
            - math.log(float(uni["san"]))
            - math.log(float(uni["francisco"]))
            + math.log(float(n1))
            + math.log(float(n1))
        )
        * 1_000_000
    )
    assert got[0]["pmi_q"] == want and got[0]["c2"] == c2
    # partition/bucket invariance of the whole top-k
    got2 = pmi_topk(
        ds.repartition(9), k=10, min_count=3, n_buckets=13
    ).take_all()
    assert [(r["w1"], r["w2"], r["c2"], r["pmi_q"]) for r in got2] == [
        (r["w1"], r["w2"], r["c2"], r["pmi_q"]) for r in got
    ]
