"""Cell-index + text kernels: determinism, hierarchy, invariants."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.cells import (
    grid_cell_center,
    grid_cell_id,
    grid_cell_neighbors,
    grid_cells_covering_bounds,
    hex_cell_id,
    s2_cell_id,
    s2_level,
    s2_parent,
)
from gdal_boots_ray.kernels.text import (
    MinHasher,
    content_hash,
    hamming64,
    lang_id,
    minhash_jaccard_estimate,
    ngram_jaccard,
    quality_score,
    rolling_fingerprints,
    simhash64,
    token_count_bpe,
    token_count_ws,
)


class TestS2:
    def test_deterministic_and_distinct(self):
        lon = np.array([27.5, 27.5, -62.4, 2.29, 100.0, -100.0])
        lat = np.array([53.9, 53.9, -34.0, 48.86, 10.0, -45.0])
        c9 = s2_cell_id(lon, lat, 9)
        assert c9[0] == c9[1]
        assert len(set(c9.tolist())) == 5
        assert np.array_equal(c9, s2_cell_id(lon, lat, 9))

    def test_hierarchy(self):
        lon = np.linspace(-170, 170, 50)
        lat = np.linspace(-80, 80, 50)
        c9 = s2_cell_id(lon, lat, 9)
        c7 = s2_cell_id(lon, lat, 7)
        assert np.array_equal(s2_parent(c9, 7), c7)
        assert np.all(s2_level(c9) == 9)
        assert np.all(s2_level(c7) == 7)

    def test_locality(self):
        # nearby points share coarse cells far more often than far points
        rng = np.random.default_rng(3)
        lon = rng.uniform(-10, 10, 200)
        lat = rng.uniform(40, 50, 200)
        near = s2_cell_id(lon, lat, 7)
        near_eps = s2_cell_id(lon + 1e-5, lat + 1e-5, 7)
        assert (near == near_eps).mean() > 0.95

    def test_valid_faces(self):
        lon = np.linspace(-179, 179, 1000)
        lat = np.linspace(-89, 89, 1000)
        c = s2_cell_id(lon, lat, 5)
        faces = (c >> 61) & 0x7
        assert set(faces.tolist()) <= {0, 1, 2, 3, 4, 5}


class TestGridCells:
    def test_sql_formula(self):
        # id must equal the DuckDB-oracle formula
        x, y = np.array([12.34, -7.6]), np.array([45.0, -33.3])
        res = 0.5
        expect = (np.floor(x / res).astype(np.int64) + (1 << 19)) * (1 << 20) + (
            np.floor(y / res).astype(np.int64) + (1 << 19)
        )
        assert np.array_equal(grid_cell_id(x, y, res), expect)

    def test_neighbors(self):
        c = grid_cell_id(np.array([10.0]), np.array([10.0]), 1.0)[0]
        n = grid_cell_neighbors(c, 1)
        assert len(n) == 9 and c in n

    def test_covering(self):
        cells = grid_cells_covering_bounds((0.0, 0.0, 2.5, 1.5), 1.0)
        assert len(cells) == 3 * 2
        # an exact-boundary box does not spill into the next cell
        cells = grid_cells_covering_bounds((0.0, 0.0, 2.0, 1.0), 1.0)
        assert len(cells) == 2 * 1

    def test_center_roundtrip(self):
        x, y = np.array([5.2, -3.7]), np.array([1.1, -9.9])
        c = grid_cell_id(x, y, 1.0)
        cx, cy = grid_cell_center(c, 1.0)
        assert np.array_equal(grid_cell_id(cx, cy, 1.0), c)

    def test_hex_partitioning(self):
        rng = np.random.default_rng(5)
        x = rng.uniform(-100, 100, 1000)
        y = rng.uniform(-100, 100, 1000)
        h = hex_cell_id(x, y, 10.0)
        # neighbors of a point map to few distinct cells
        assert 20 < len(set(h.tolist())) < 500
        assert np.array_equal(h, hex_cell_id(x, y, 10.0))


class TestText:
    def test_content_hash_matches_md5(self):
        import hashlib

        assert content_hash("hello") == hashlib.md5(b"hello").hexdigest()

    def test_token_counts(self):
        assert token_count_ws("a b  c") == 3
        assert token_count_bpe("hello, world 42") == 4  # hello , world 42

    def test_minhash_similarity(self):
        mh = MinHasher(num_perm=128)
        a = "the quick brown fox jumps over the lazy dog " * 4
        b = "the quick brown fox jumps over the lazy cat " * 4
        c = "completely different text about ray data pipelines and arrow batches"
        sab = minhash_jaccard_estimate(mh.signature(a), mh.signature(b))
        sac = minhash_jaccard_estimate(mh.signature(a), mh.signature(c))
        assert sab > 0.5 > sac
        true_j = ngram_jaccard(a, b)
        assert abs(sab - true_j) < 0.25

    def test_minhash_band_keys(self):
        mh = MinHasher(num_perm=64)
        sig = mh.signature("some document text here")
        keys = mh.band_keys(sig, bands=16)
        assert len(keys) == 16
        assert keys == mh.band_keys(sig, bands=16)

    def test_simhash(self):
        a = simhash64("the quick brown fox jumps over the lazy dog")
        b = simhash64("the quick brown fox jumps over the lazy cat")
        c = simhash64("pyarrow compute kernels stream blocks with backpressure")
        assert hamming64(a, b) < hamming64(a, c)
        assert simhash64("") == 0

    def test_lang_id(self):
        lang, score = lang_id("the cat is on the mat and it is happy")
        assert lang == "en" and score > 0
        assert lang_id("")[0] == "und"

    def test_quality_score(self):
        good = quality_score("This is a well formed sentence with the usual words in it.")
        bad = quality_score("@@@ ### !!! $$$")
        assert good > bad

    def test_rolling_fingerprints(self):
        fp1 = rolling_fingerprints("a stable document body of reasonable length for hashing")
        fp2 = rolling_fingerprints("a stable document body of reasonable length for hashing")
        assert fp1 == fp2 and len(fp1) >= 1


def test_hll_sketch():
    """HLL: mergeable (split == whole), within 5% over 3 decades,
    string and int domains."""
    import numpy as np

    from gdal_boots_ray.kernels import sketch

    for n in (100, 5000, 200000):
        ids = np.arange(n, dtype=np.int64)
        est = sketch.hll_estimate(sketch.hll_partial(sketch.hash64(ids)))
        assert abs(est / n - 1) < 0.05, (n, est)
    ids = np.arange(50000, dtype=np.int64)
    whole = sketch.hll_partial(sketch.hash64(ids))
    parts = np.stack(
        [sketch.hll_partial(sketch.hash64(c)) for c in np.array_split(ids, 7)]
    )
    assert (sketch.hll_merge(parts) == whole).all()
    words = np.array([f"w{i}" for i in range(30000)])
    est = sketch.hll_estimate(sketch.hll_partial(sketch.hash64(words)))
    assert abs(est / 30000 - 1) < 0.05


def test_bloom_filter():
    """Bloom bitmap: zero false negatives, low false positives,
    OR-merge of partials == whole."""
    import numpy as np

    from gdal_boots_ray.stages.bloom import bloom_partial, bloom_test

    keys = np.arange(0, 50000, 7, dtype=np.int64)  # ~7150 keys
    words = bloom_partial(keys)
    assert bloom_test(words, keys).all()  # no false negatives
    absent = np.arange(1, 50000, 7, dtype=np.int64)
    fp = bloom_test(words, absent).mean()
    assert fp < 0.01, fp
    parts = np.array_split(keys, 5)
    merged = np.zeros_like(words)
    for p in parts:
        merged |= bloom_partial(p)
    assert (merged == words).all()
