"""Unit tests for the dedup kernels: MinHash accuracy, LSH banding recall,
SimHash hamming behavior, exact Jaccard."""

from __future__ import annotations

import numpy as np

from scrupyst_ray.functions.dedup import (
    MinHasher,
    band_keys,
    hamming64,
    jaccard_tokens,
    shingle_hashes,
    simhash64,
    simhash_band_keys,
)

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_B = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
DOC_C = "completely unrelated content about database engines and arrow batches"


class TestShingles:
    def test_dedup_and_determinism(self):
        h1 = shingle_hashes(DOC_A, 3)
        h2 = shingle_hashes(DOC_A, 3)
        assert sorted(h1) == sorted(h2)
        assert len(set(map(int, h1))) == len(h1)

    def test_short_text(self):
        assert len(shingle_hashes("one two", 3)) == 1
        assert len(shingle_hashes("", 3)) == 1


class TestMinHash:
    def test_estimate_close_to_true_jaccard(self):
        mh = MinHasher(num_perm=256)
        sa = mh.signature(shingle_hashes(DOC_A, 3))
        sb = mh.signature(shingle_hashes(DOC_B, 3))
        est = MinHasher.estimate_jaccard(sa, sb)
        true = jaccard_tokens(DOC_A, DOC_B, 3)
        assert abs(est - true) < 0.15
        # unrelated docs ≈ 0
        sc = mh.signature(shingle_hashes(DOC_C, 3))
        assert MinHasher.estimate_jaccard(sa, sc) < 0.1

    def test_identical_docs(self):
        mh = MinHasher()
        sa = mh.signature(shingle_hashes(DOC_A, 3))
        sb = mh.signature(shingle_hashes(DOC_A, 3))
        assert MinHasher.estimate_jaccard(sa, sb) == 1.0

    def test_deterministic_across_instances(self):
        s1 = MinHasher().signature(shingle_hashes(DOC_A))
        s2 = MinHasher().signature(shingle_hashes(DOC_A))
        assert (s1 == s2).all()


class TestLSH:
    def test_similar_docs_share_a_band(self):
        mh = MinHasher(num_perm=128)
        ka = band_keys(mh.signature(shingle_hashes(DOC_A)), bands=32)
        kb = band_keys(mh.signature(shingle_hashes(DOC_B)), bands=32)
        kc = band_keys(mh.signature(shingle_hashes(DOC_C)), bands=32)
        assert set(ka) & set(kb)  # near-dups collide in ≥1 band (j≈0.85)
        assert not (set(ka) & set(kc))

    def test_band_key_count(self):
        mh = MinHasher(num_perm=128)
        assert len(band_keys(mh.signature(shingle_hashes(DOC_A)), 32)) == 32


class TestSimHash:
    def test_similar_docs_small_hamming(self):
        d = int(hamming64(simhash64(DOC_A), simhash64(DOC_B)))
        assert d <= 12
        d_far = int(hamming64(simhash64(DOC_A), simhash64(DOC_C)))
        assert d_far > d

    def test_identical_zero(self):
        assert int(hamming64(simhash64(DOC_A), simhash64(DOC_A))) == 0

    def test_band_keys_pigeonhole(self):
        s = simhash64(DOC_A)
        keys = simhash_band_keys(s, bands=4)
        assert len(keys) == 4
        # flipping 3 bits leaves ≥1 of 4 16-bit chunks identical
        s2 = s ^ 0b111
        assert set(keys) & set(simhash_band_keys(s2, bands=4))

    def test_empty(self):
        assert simhash64("") == 0


class TestJaccard:
    def test_exact(self):
        assert jaccard_tokens(DOC_A, DOC_A) == 1.0
        assert jaccard_tokens(DOC_A, DOC_C) < 0.05
        j = jaccard_tokens(DOC_A, DOC_B)
        assert 0.6 < j < 1.0


def test_minhash_recall_gate(ray_session):
    """The LSH quality gate holds at both thresholds on the driver corpus,
    and an impossible floor proves the boolean reacts to the data."""
    from scrupyst_ray.pipelines.dedup import minhash_recall

    t = minhash_recall("/root/testdata/sf0.001")
    assert t["recall_floor_ok"].to_pylist() == [True, True]
    assert all(n > 0 for n in t["n_exact_pairs"].to_pylist())
    t2 = minhash_recall("/root/testdata/sf0.001", thresholds=(0.5,), floor=1.01)
    assert t2["recall_floor_ok"].to_pylist() == [False]


class TestSimhashMd5:
    def test_matches_bitwise_reference(self):
        """simhash64_md5 == the per-bit shift-loop definition the SQL
        oracle implements (md5 hex→uint64, (h>>p)&1 votes, >=0 sign)."""
        import hashlib
        from collections import Counter

        from scrupyst_ray.functions.dedup import simhash64_md5
        from scrupyst_ray.functions.textstats import ws_tokens

        def slow(text: str) -> int:
            toks = ws_tokens(text)
            if not toks:
                return 0
            votes = [0] * 64
            for t, c in Counter(toks).items():
                h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
                for p in range(64):
                    votes[p] += c if (h >> p) & 1 else -c
            return sum(1 << p for p in range(64) if votes[p] >= 0)

        for s in ["", "  ", "a", "b a a", "x\xa0y", "the quick brown fox " * 3]:
            assert simhash64_md5(s) == slow(s), repr(s)

    def test_near_dup_small_hamming(self):
        from scrupyst_ray.functions.dedup import hamming64, simhash64_md5

        a = simhash64_md5("the quick brown fox jumps over the lazy dog " * 5)
        b = simhash64_md5(
            "the quick brown fox jumps over the lazy cat "
            + "the quick brown fox jumps over the lazy dog " * 4
        )
        assert int(hamming64(a, b)) <= 10


def test_simhash_recall_gate(ray_session):
    """Banded-pipeline counts/id-sums are internally consistent and
    monotone in the hamming threshold (full independence vs the SQL
    brute-force oracle is checked by validate_entry / the driver)."""
    from scrupyst_ray.pipelines.dedup import simhash_recall

    t = simhash_recall("/root/testdata/sf0.001")
    assert t["max_hamming"].to_pylist() == ["2", "3"]
    n2, n3 = t["n_pairs"].to_pylist()
    assert 0 <= n2 <= n3
    s2, s3 = t["pair_id_sum"].to_pylist()
    assert (n2 == 0) == (s2 == 0)


def test_minhash_signature_check_gate(ray_session):
    """Per-doc signature checksums are deterministic and one per document
    (full arithmetic parity vs the SQL twin is the driver/validate gate)."""
    from scrupyst_ray.pipelines.dedup import minhash_signature_check

    t = minhash_signature_check("/root/testdata/sf0.001")
    t2 = minhash_signature_check("/root/testdata/sf0.001")
    assert t.to_pandas().equals(t2.to_pandas())
    df = t.to_pandas()
    assert len(df) == 500 and df.doc_id.is_unique
    assert (df.sig_checksum >= 0).all() and df.sig_checksum.nunique() > 100
