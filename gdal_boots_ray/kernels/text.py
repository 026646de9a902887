"""Text-analysis + dedup kernels for the training-data pipeline ops.

Vectorized/batched pure-Python+NumPy implementations of:
- exact content hashing (dedup key),
- character n-gram shingling + MinHash signatures + LSH band keys,
- SimHash (64-bit) fingerprints,
- n-gram Jaccard similarity,
- language-ID heuristic (stopword n-gram hit rates),
- quality scoring (length / punctuation / stopword ratios),
- token counting (whitespace + BPE-ish regex),
- rolling-hash document fingerprinting (Rabin-Karp windows).

These back the ``dedup_*`` / ``text_*`` queries() operators.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Iterable, List, Sequence, Tuple

import numpy as np

_WORD_RE = re.compile(r"[a-zA-Z0-9']+")
# BPE-ish token splitter: words, numbers, punctuation runs, whitespace collapsed
_BPE_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "for", "on", "with", "as", "at", "by"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "por", "con", "para"},
}


def content_hash(text: str) -> str:
    """Hex MD5 of the raw text — matches DuckDB ``md5(text)`` so the
    exact-dedup oracle can reproduce it."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def token_count_bpe(text: str) -> int:
    """BPE-ish token count (letters runs / digit runs / single punct)."""
    return len(_BPE_RE.findall(text))


def char_ngrams(text: str, n: int = 5) -> List[str]:
    t = " ".join(text.lower().split())
    if len(t) < n:
        return [t] if t else []
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def ngram_jaccard(a: str, b: str, n: int = 5) -> float:
    sa, sb = set(char_ngrams(a, n)), set(char_ngrams(b, n))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """k-permutation MinHash over character shingles. Seeded a/b params
    so signatures are deterministic across workers."""

    def __init__(self, num_perm: int = 64, ngram: int = 5, seed: int = 31415926):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def shingle_hashes(self, text: str) -> np.ndarray:
        """Vectorized shingle hashing: whitespace-normalize, then hash
        every n-byte window with a polynomial rolling hash (sliding
        window matmul — no per-gram Python loop)."""
        t = " ".join(text.lower().split()).encode("utf-8", "ignore")
        n = self.ngram
        if len(t) < n:
            if not t:
                return np.zeros(1, dtype=np.uint64)
            arr = np.frombuffer(t, dtype=np.uint8).astype(np.uint64)
            pw = np.uint64(1000003) ** np.arange(len(arr), dtype=np.uint64)[::-1]
            with np.errstate(over="ignore"):
                return np.array([np.dot(arr * pw, np.ones(1, np.uint64))], dtype=np.uint64)
        arr = np.frombuffer(t, dtype=np.uint8).astype(np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(arr, n)
        pw = np.uint64(1000003) ** np.arange(n, dtype=np.uint64)[::-1]
        with np.errstate(over="ignore"):
            h = (windows * pw[None, :]).sum(axis=1)
            # mix (splitmix64-style) so sequential windows decorrelate
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
        return np.unique(h)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        with np.errstate(over="ignore"):
            vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def band_keys(self, sig: np.ndarray, bands: int = 16) -> List[int]:
        """LSH band bucket keys: hash of each band's slice of the
        signature (band index folded in so buckets don't collide across
        bands)."""
        rows = self.num_perm // bands
        keys = []
        for b in range(bands):
            chunk = sig[b * rows : (b + 1) * rows].tobytes()
            h = zlib.crc32(chunk) ^ (b << 28)
            keys.append(int(np.int64(np.uint32(h)) + (b << 32)))
        return keys


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar 2002).  The word
    hash is the high 8 bytes of md5 (big-endian hex) so the DuckDB
    oracle can replay it verbatim:
    CAST('0x' || substring(md5(w),1,16) AS UBIGINT)."""
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    hs = np.array(
        [int(hashlib.md5(w.encode()).hexdigest()[:16], 16) for w in words], dtype=np.uint64
    )
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = np.where(bits == 1, 1, -1).sum(axis=0)
    out = sum(1 << i for i in range(64) if acc[i] > 0)
    return out - (1 << 64) if out >= (1 << 63) else out  # signed int64 for Arrow


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# Language ID / quality / fingerprint
# ---------------------------------------------------------------------------


def lang_id(text: str) -> Tuple[str, float]:
    """Stopword-hit-rate language heuristic. Returns (lang, score)."""
    words = set(_WORD_RE.findall(text.lower()))
    if not words:
        return "und", 0.0
    best, best_score = "und", 0.0
    for lang, stops in _STOPWORDS.items():
        score = len(words & stops) / len(stops)
        if score > best_score:
            best, best_score = lang, score
    return best, best_score


def quality_features(text: str) -> dict:
    """Deterministic quality features: lengths, punctuation / digit /
    stopword / whitespace ratios, mean word length."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    alpha = sum(c.isalpha() for c in text)
    digit = sum(c.isdigit() for c in text)
    space = sum(c.isspace() for c in text)
    punct = n_chars - alpha - digit - space
    lw = [w.lower().strip(".,!?;:") for w in words]
    stop = sum(w in _STOPWORDS["en"] for w in lw)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": alpha / n_chars if n_chars else 0.0,
        "digit_ratio": digit / n_chars if n_chars else 0.0,
        "punct_ratio": punct / n_chars if n_chars else 0.0,
        "stopword_ratio": stop / n_words if n_words else 0.0,
        "mean_word_len": sum(len(w) for w in words) / n_words if n_words else 0.0,
    }


def quality_score(text: str) -> float:
    f = quality_features(text)
    score = 1.0
    if f["n_words"] < 5:
        score *= 0.2
    score *= min(1.0, f["alpha_ratio"] * 1.5)
    score *= 1.0 - min(0.5, f["punct_ratio"])
    score *= 0.5 + min(0.5, f["stopword_ratio"] * 2)
    return float(score)


_FP_BASE = np.uint64(1000003)


def md5_fingerprints(text: str, ngram: int = 8, keep: int = 4) -> List[int]:
    """Winnowing-style fingerprint with SQL-replayable hashes: the
    ``keep`` smallest distinct md5-based n-gram hashes (mod 2^31-1)
    of the whitespace-normalized lowercase text.  The production
    fingerprint is ``rolling_fingerprints`` (Rabin-Karp, faster);
    this variant exists so the winnowing construction itself is
    hash-checked against the DuckDB twin (simhash/md5-minhash
    precedent)."""
    import hashlib as _hashlib

    t = " ".join(text.lower().split())
    grams = {t[i : i + ngram] for i in range(len(t) - ngram + 1)}
    if not grams:
        return []
    m = 2147483647
    hs = sorted({int(_hashlib.md5(g.encode()).hexdigest()[:16], 16) % m for g in grams})
    return hs[:keep]


def rolling_fingerprints(text: str, window: int = 16, keep: int = 4) -> List[int]:
    """Rabin-Karp rolling-hash windows; keeps the ``keep`` smallest
    hashes (winnowing-style document fingerprint)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < window:
        return [zlib.crc32(data)]
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - window + 1
    powers = _FP_BASE ** np.arange(window, dtype=np.uint64)
    with np.errstate(over="ignore"):
        first = np.uint64((arr[:window] * powers[::-1]).sum())
        hashes = np.empty(n, dtype=np.uint64)
        hashes[0] = first
        top = powers[-1]
        h = first
        for i in range(1, n):
            h = (h - arr[i - 1] * top) * _FP_BASE + arr[i + window - 1]
            hashes[i] = h
    uniq = np.unique(hashes)
    return [int(v) for v in uniq[: min(keep, len(uniq))]]
