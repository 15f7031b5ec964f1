"""Text analysis operators over document tables.

Vectorized (pyarrow.compute / numpy) per-batch transforms: token
counting, quality scoring, language identification (stopword n-gram
heuristic), and rolling-hash document fingerprinting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\S+"
# A BPE-ish subword proxy: word pieces, numbers, punctuation runs
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "y", "en", "que", "los", "un", "por", "con"},
    "de": {"der", "die", "das", "und", "in", "zu", "den", "mit", "von", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une"},
    "zh": {"的", "了", "是", "在", "我", "有", "和", "就", "不", "人"},
}


def token_stats(ds, text_col="text", id_col="doc_id"):
    """Adds n_tokens (whitespace), n_pieces (BPE-ish), n_chars."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(texts, _TOKEN_RE), pa.int64()
                ),
                "n_pieces": pc.cast(
                    pc.count_substring_regex(texts, _BPE_RE), pa.int64()
                ),
                "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_scores(ds, text_col="text", id_col="doc_id"):
    """Adds mechanical quality signals: mean token length, alpha ratio,
    space ratio, distinct-token ratio.

    Vectorized: token counts, character-class counts and lengths come
    from Arrow kernels (sum of token lengths == total chars minus
    whitespace chars, exactly, so the final float division matches the
    per-row formulation bit-for-bit); only the distinct-token ratio
    walks rows (per-row set semantics have no Arrow kernel).
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        n_chars = pc.cast(pc.utf8_length(texts), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        n_tokens = pc.cast(
            pc.count_substring_regex(texts, r"\S+"), pa.float64()
        ).to_numpy(zero_copy_only=False)
        n_ws = pc.cast(
            pc.count_substring_regex(texts, r"\s"), pa.float64()
        ).to_numpy(zero_copy_only=False)
        n_alpha = pc.cast(
            pc.count_substring_regex(texts, r"\p{L}"), pa.float64()
        ).to_numpy(zero_copy_only=False)
        n_space = pc.cast(
            pc.count_substring(texts, " "), pa.float64()
        ).to_numpy(zero_copy_only=False)
        safe_chars = np.where(n_chars > 0, n_chars, 1.0)
        safe_toks = np.where(n_tokens > 0, n_tokens, 1.0)
        mean_tok = np.where(n_tokens > 0, (n_chars - n_ws) / safe_toks, 0.0)
        alpha_ratio = np.where(n_chars > 0, n_alpha / safe_chars, 0.0)
        space_ratio = np.where(n_chars > 0, n_space / safe_chars, 0.0)
        distinct_ratio = [
            len(set(toks)) / len(toks) if (toks := t.split()) else 0.0
            for t in texts.to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "mean_token_len": pa.array(mean_tok, pa.float64()),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
                "space_ratio": pa.array(space_ratio, pa.float64()),
                "distinct_token_ratio": pa.array(distinct_ratio, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Actor-pool language identifier (stopword-hit heuristic).

    Tables are built once per actor in __init__ (the pattern for any
    model-loading stage); scoring is a per-token dict lookup.
    """

    def __init__(self):
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def detect(self, text: str) -> str:
        toks = text.split()[:200]
        best, best_hits = "unknown", 0
        for lang, table in self.tables.items():
            hits = sum(1 for t in toks if t in table)
            if hits > best_hits:
                best, best_hits = lang, hits
        if best == "unknown" and any("一" <= c <= "鿿" for c in text[:400]):
            return "zh"
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.detect(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def lang_id(ds, concurrency=(1, 4)):
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency
    )


_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def _fingerprint_scalar(t: str, base=_FP_BASE, mod=_FP_MOD) -> int:
    """Scalar reference implementation (kept for tests)."""
    h = 0
    for ch in " ".join(t.split()):
        h = (h * base + ord(ch)) % mod
    return h


def _fingerprint_vec(texts: list) -> np.ndarray:
    """Vectorized rolling hash: Horner across character positions.

    Texts are normalized, decoded to code-point rows (utf-32 buffer
    view, no per-char Python), padded into one (n_docs, max_len)
    matrix, and the Horner recurrence h = h*base + code runs once per
    COLUMN over the whole batch.  h*base mod 2^61-1 stays inside
    uint64 by splitting h into 31/30-bit halves and using
    2^61 = 1 (mod p) to fold the high product back -- no Python-int
    arithmetic in the loop.
    """
    p = np.uint64(_FP_MOD)
    base = np.uint64(_FP_BASE)
    norm = [" ".join(t.split()) for t in texts]
    lens = np.array([len(s) for s in norm], dtype=np.int64)
    n = len(norm)
    if n == 0 or lens.max(initial=0) == 0:
        return np.zeros(n, dtype=np.uint64)
    max_len = int(lens.max())
    codes = np.zeros((n, max_len), dtype=np.uint64)
    for i, s in enumerate(norm):
        if s:
            codes[i, : lens[i]] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    mask_lo = np.uint64((1 << 31) - 1)
    mask_30 = np.uint64((1 << 30) - 1)
    h = np.zeros(n, dtype=np.uint64)
    active = lens > 0
    for j in range(max_len):
        # h * base mod p  (h < p, base < 2^20)
        lo = (h & mask_lo) * base  # < 2^51
        hi = (h >> np.uint64(31)) * base  # < 2^50
        # (hi << 31) mod p via 2^61 == 1 (mod p)
        hi_red = (hi >> np.uint64(30)) + ((hi & mask_30) << np.uint64(31))
        t = lo + hi_red + codes[:, j]  # < 2^63
        t = (t & p) + (t >> np.uint64(61))
        t = np.where(t >= p, t - p, t)
        upd = active & (j < lens)
        h = np.where(upd, t, h)
    return h


def fingerprint(ds, text_col="text", id_col="doc_id"):
    """Deterministic rolling polynomial hash of the normalized text
    (whitespace runs collapsed to single spaces), mod 2^61-1."""

    def fn(batch: pa.Table) -> pa.Table:
        out = _fingerprint_vec(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "fingerprint": pa.array(out, pa.uint64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
