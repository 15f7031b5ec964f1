"""Random-corpus differentials for the retrieval family
(stages/search.postings, stages/search.bm25_keyword) and the
token-budget quota gate (stages/export.token_budget) vs in-process
DuckDB -- richer vocabularies and edge rows (empty text, nulls,
whitespace-only docs, absent query terms) than the fixed sf tables
exercise."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rand_docs():
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i:03d}" for i in range(120)])
    texts = []
    for i in range(400):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(vocab, n)))
    # edge rows: empty, whitespace-only, single token, null
    texts[0] = ""
    texts[1] = "   \t  "
    texts[2] = "w000"
    texts[3] = None
    return pa.table(
        {
            "doc_id": pa.array(np.arange(400, dtype=np.int64)),
            "lang": pa.array(
                rng.choice(["en", "de", "fr"], 400).tolist()
            ),
            "text": pa.array(texts, pa.string()),
        }
    )


def _duck(rand_docs):
    con = duckdb.connect()
    con.register("documents", rand_docs)
    return con


def test_postings_random_vs_duckdb(ray_session, rand_docs):
    ray = ray_session
    from console_log_parser_ray.stages.search import postings

    ds = postings(
        ray.data.from_arrow(rand_docs).repartition(7),
        k=5,
        min_df=2,
        max_df=60,
        n_buckets=11,
    )
    mine = {
        r["tok"]: (r["df"], r["posting"]) for r in ds.take_all()
    }
    ref = {
        t: (d, p)
        for t, d, p in _duck(rand_docs).execute(
            "WITH raw AS (SELECT doc_id, "
            "unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) "
            "AS tok FROM documents), "
            "toks AS (SELECT DISTINCT doc_id, tok FROM raw), "
            "df AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok), "
            "r AS (SELECT tok, doc_id, row_number() OVER "
            "(PARTITION BY tok ORDER BY doc_id) AS rn FROM toks) "
            "SELECT d.tok, d.df, string_agg(CAST(r.doc_id AS VARCHAR), "
            "',' ORDER BY r.doc_id) FROM df d JOIN r USING (tok) "
            "WHERE r.rn <= 5 AND d.df BETWEEN 2 AND 60 "
            "GROUP BY d.tok, d.df"
        ).fetchall()
    }
    assert mine == ref
    assert len(mine) > 50  # the band actually selects a real slice


def test_postings_cap_shorter_than_df(ray_session):
    """A token in more docs than k keeps exactly the k smallest ids."""
    ray = ray_session
    from console_log_parser_ray.stages.search import postings

    tbl = pa.table(
        {
            "doc_id": pa.array([9, 3, 7, 1, 5], pa.int64()),
            "text": pa.array(["x y"] * 5),
        }
    )
    out = {
        r["tok"]: r
        for r in postings(
            ray.data.from_arrow(tbl), k=3, min_df=1
        ).take_all()
    }
    assert out["x"]["df"] == 5
    assert out["x"]["posting"] == "1,3,5"
    assert out["y"]["posting"] == "1,3,5"


def test_bm25_random_vs_duckdb_bit_exact(ray_session, rand_docs):
    """The float score column must be BIT-exact against DuckDB (both
    engines evaluate the same IEEE expression tree over the same
    integers) -- compared with ==, no tolerance."""
    ray = ray_session
    from console_log_parser_ray.stages.search import (
        bm25_keyword,
        bm25_oracle_sql,
    )

    terms = ("w000", "w001", "w117", "absent")
    ds = bm25_keyword(
        ray.data.from_arrow(rand_docs).repartition(5), terms
    )
    mine = {
        r["doc_id"]: (r["n_hits"], r["dl"], r["score"])
        for r in ds.take_all()
    }
    sql = bm25_oracle_sql(terms).replace(
        "regexp_extract_all(text", "regexp_extract_all(coalesce(text, '')"
    )
    ref = {
        i: (h, d, s)
        for i, h, d, s in _duck(rand_docs).execute(sql).fetchall()
    }
    assert set(mine) == set(ref)
    for k in mine:
        assert mine[k][:2] == ref[k][:2]
        assert mine[k][2] == ref[k][2], (k, mine[k], ref[k])
    # the absent term contributed nothing but didn't break anything
    assert all(h <= 3 for h, _, _ in mine.values())


def test_bm25_zero_hit_docs_dropped(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.search import bm25_keyword

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a", "c c", ""]),
        }
    )
    out = bm25_keyword(ray.data.from_arrow(tbl), ("a",)).take_all()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_hits"] == 1 and out[0]["dl"] == 3
    assert out[0]["score"] > 0.0


def test_token_budget_random_vs_duckdb(ray_session, rand_docs):
    ray = ray_session
    from console_log_parser_ray.stages.export import token_budget

    ds = token_budget(
        ray.data.from_arrow(rand_docs).repartition(7),
        budget=300,
        n_buckets=5,
    )
    mine = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["cum_tokens"])
        for r in ds.take_all()
    }
    ref = {
        i: (g, n, c)
        for i, g, n, c in _duck(rand_docs).execute(
            "WITH t AS (SELECT doc_id, lang, "
            "len(regexp_extract_all(coalesce(text, ''), '\\S+')) "
            "AS n_tokens, "
            "((doc_id & 2147483647) * 2654435761) % 4294967296 AS h "
            "FROM documents), "
            "c AS (SELECT doc_id, lang, n_tokens, "
            "sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id) "
            "AS cum FROM t) "
            "SELECT doc_id, lang, n_tokens, CAST(cum AS BIGINT) "
            "FROM c WHERE cum <= 300"
        ).fetchall()
    }
    assert mine == ref
    assert 0 < len(mine) < 400  # the budget genuinely gates


def test_hash_embed_random_vs_duckdb(ray_session, rand_docs):
    """Sparse feature-hash vectors vs the DuckDB md5 chain -- exact,
    including unicode tokens and sign cancellations."""
    ray = ray_session
    from console_log_parser_ray.stages.search import hash_embed

    # salt in unicode + punctuation tokens to pin utf-8 md5 parity
    tbl = rand_docs.set_column(
        2,
        "text",
        pa.array(
            [
                (t + " héllo §7 a.b!" if t else t)
                for t in rand_docs.column("text").to_pylist()
            ],
            pa.string(),
        ),
    )
    ds = hash_embed(
        ray.data.from_arrow(tbl).repartition(6), dim=16
    )
    mine = {
        (r["doc_id"], r["dim"]): r["weight"] for r in ds.take_all()
    }
    con = duckdb.connect()
    con.register("documents", tbl)
    ref = {
        (i, d): w
        for i, d, w in con.execute(
            "WITH raw AS (SELECT doc_id, "
            "unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) "
            "AS tok FROM documents), "
            "m AS (SELECT doc_id, "
            "('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 AS dim, "
            "CASE WHEN ('0x' || substr(md5(tok), 9, 1))::BIGINT < 8 "
            "THEN 1 ELSE -1 END AS s FROM raw) "
            "SELECT doc_id, dim, CAST(sum(s) AS BIGINT) FROM m "
            "GROUP BY doc_id, dim HAVING sum(s) <> 0"
        ).fetchall()
    }
    assert mine == ref and len(mine) > 100


def test_hash_embed_dense_matches_sparse(ray_session, rand_docs):
    ray = ray_session
    from console_log_parser_ray.stages.search import (
        hash_embed,
        hash_embed_dense,
    )

    dim = 8
    sparse = {
        (r["doc_id"], r["dim"]): r["weight"]
        for r in hash_embed(
            ray.data.from_arrow(rand_docs), dim=dim
        ).take_all()
    }
    for r in hash_embed_dense(
        ray.data.from_arrow(rand_docs), dim=dim
    ).take_all():
        vec = r["embedding"]
        assert len(vec) == dim
        for d in range(dim):
            assert vec[d] == float(sparse.get((r["doc_id"], d), 0))


def test_hash_embed_dense_chains_into_knn(ray_session, rand_docs):
    """The dense vectors feed the similarity family unchanged: exact
    kNN over hash embeddings equals a local numpy brute force."""
    ray = ray_session
    import numpy as np

    from console_log_parser_ray.stages.search import hash_embed_dense
    from console_log_parser_ray.stages.similarity import knn_bruteforce

    dim = 8
    emb = hash_embed_dense(ray.data.from_arrow(rand_docs), dim=dim)
    rows = emb.take_all()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float32)
    ids = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    nz = np.linalg.norm(mat, axis=1) > 0
    mat, ids = mat[nz], ids[nz]
    q = mat[:2].copy()
    got = knn_bruteforce(
        ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1)), dim
                    ),
                }
            )
        ),
        (np.array([0, 1], dtype=np.int64), q),
        k=3,
    ).take_all()
    # verify top-1 for query 0 against numpy cosine
    def cos(a, b):
        return float(
            a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        )

    best = max(range(len(mat)), key=lambda i: cos(mat[i], q[0]))
    top = [r for r in got if r["query_id"] == 0]
    assert any(r["vec_id"] == ids[best] for r in top)


def test_bpe_pairs_random_vs_duckdb(ray_session, rand_docs):
    """Occurrence-weighted char-pair counts (one BPE iteration) vs
    the DuckDB substr mirror, unicode tokens included."""
    ray = ray_session
    from console_log_parser_ray.stages.textan import bpe_pairs

    tbl = rand_docs.set_column(
        2,
        "text",
        pa.array(
            [
                (t + " héllo héllo §7" if t else t)
                for t in rand_docs.column("text").to_pylist()
            ],
            pa.string(),
        ),
    )
    k = 30
    mine = [
        (r["pair"], r["n"])
        for r in bpe_pairs(
            ray.data.from_arrow(tbl).repartition(6), k=k
        ).take_all()
    ]
    con = duckdb.connect()
    con.register("documents", tbl)
    ref = con.execute(
        "WITH toks AS (SELECT "
        "unnest(regexp_extract_all(coalesce(text, ''), '\\S+')) AS tok "
        "FROM documents), "
        "idx AS (SELECT tok, "
        "unnest(generate_series(1, length(tok) - 1)) AS i FROM toks), "
        "p AS (SELECT substr(tok, CAST(i AS INTEGER), 2) AS pair "
        "FROM idx), "
        "c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair) "
        "SELECT pair, CAST(n AS BIGINT) FROM c "
        f"ORDER BY n DESC, pair LIMIT {k}"
    ).fetchall()
    assert mine == [tuple(r) for r in ref]
    assert any("é" in p or "§" in p for p, _ in mine)


def test_bpe_pairs_single_char_tokens_drop(ray_session):
    ray = ray_session
    from console_log_parser_ray.stages.textan import bpe_pairs

    tbl = pa.table({"text": pa.array(["a b c", "ab ab", ""])})
    out = [
        (r["pair"], r["n"])
        for r in bpe_pairs(ray.data.from_arrow(tbl), k=10).take_all()
    ]
    assert out == [("ab", 2)]


def test_token_budget_boundary_inclusive(ray_session):
    """A doc whose inclusive running total EQUALS the budget is kept;
    the next one is dropped; zero-token docs ride along for free."""
    ray = ray_session
    from console_log_parser_ray.stages.export import token_budget

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["en"] * 4),
            "text": pa.array(["a b", "c d", "e f", ""]),
        }
    )
    out = token_budget(ray.data.from_arrow(tbl), budget=4).take_all()
    total = sum(r["n_tokens"] for r in out)
    assert total <= 4
    assert max(r["cum_tokens"] for r in out) <= 4
    # the zero-token doc never exceeds the budget, so it is kept
    # regardless of its hash position
    assert any(r["n_tokens"] == 0 for r in out)


def test_hybrid_rrf_fusion_arithmetic(ray_session):
    ray = ray_session
    import numpy as np
    import pyarrow as pa

    from console_log_parser_ray.stages.search import hybrid_rrf

    # doc 0: strong in BOTH legs; doc 1: keyword-only; doc 2:
    # vector-only; doc 3: in neither
    texts = [
        "alpha alpha alpha beta",
        "alpha beta alpha beta alpha",
        "nothing relevant here",
        "completely off topic",
    ]
    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    vecs = [
        (base + rng.normal(scale=0.01, size=8)).tolist(),  # ~query
        (-base + rng.normal(scale=0.01, size=8)).tolist(),
        (base + rng.normal(scale=0.02, size=8)).tolist(),
        (-base + rng.normal(scale=0.02, size=8)).tolist(),
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(vecs),
            }
        )
    )
    got = hybrid_rrf(
        docs, emb, ("alpha", "beta"), (0, base.tolist()), m=3, k=4
    ).take_all()
    by_id = {r["doc_id"]: r for r in got}
    # doc 0 leads both legs -> top fused score
    assert got[0]["doc_id"] == 0
    # fused score is exactly the two-division IEEE sum
    for r in got:
        a = (
            1.0 / np.float64(60 + r["rank_bm25"])
            if r["rank_bm25"] is not None
            else 0.0
        )
        b = (
            1.0 / np.float64(60 + r["rank_knn"])
            if r["rank_knn"] is not None
            else 0.0
        )
        assert r["rrf"] == a + b
    # single-leg docs carry a null rank on the missing leg
    assert by_id[1]["rank_bm25"] is not None
    assert 2 in by_id and by_id[2]["rank_bm25"] is None
    assert by_id[2]["rank_knn"] is not None
