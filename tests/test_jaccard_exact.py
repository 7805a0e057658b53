"""Exact all-pairs k-shingle Jaccard (`pipelines/dedup.py::
jaccard_allpairs_exact` / `jaccard_dedup_keep`) vs a pure-Python reference
on a hand-built documents table, including the df-cap semantics."""

from __future__ import annotations

import itertools
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# doc 1/2: near-dups (one token differs); doc 3: exact dup of 1;
# doc 4: short (<3 tokens → whole text is the single shingle); doc 5: its
# exact short dup; doc 6: unrelated; doc 7: empty ('' single shingle).
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),
    (3, "the quick brown fox jumps over the lazy dog today"),
    (4, "hi there"),
    (5, "hi there"),
    (6, "completely different words appear in this one document here now"),
    (7, ""),
]


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else {""}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def ref_pairs(threshold: float = 0.4, max_df: int = 64):
    sets = {d: _shingles(t) for d, t in DOCS}
    df: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    universe = {sh for sh, n in df.items() if n <= max_df}
    fsets = {d: s & universe for d, s in sets.items()}
    out = {}
    for a, b in itertools.combinations(sorted(fsets), 2):
        inter = len(fsets[a] & fsets[b])
        if inter == 0:
            continue
        j = inter / (len(fsets[a]) + len(fsets[b]) - inter)
        if j >= threshold:
            out[(a, b)] = j
    return out


@pytest.fixture(scope="module")
def jac_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jacdocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([x[0] for x in DOCS], pa.int64()),
                "text": pa.array([x[1] for x in DOCS], pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def test_allpairs_match_reference(ray_session, jac_dir):
    from scrupyst_ray.pipelines.dedup import jaccard_allpairs_exact

    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_allpairs_exact(jac_dir).take_all()
    }
    want = ref_pairs()
    assert set(got) == set(want)
    for k, j in want.items():
        assert got[k] == f"{j:.4f}"
    # sanity on the hand-built shape: exact dups at 1.0, near-dups between
    assert got[(1, 3)] == "1.0000"
    assert got[(4, 5)] == "1.0000"
    assert 0.4 <= float(got[(1, 2)]) < 1.0


def test_df_cap_drops_stopword_shingles(ray_session, tmp_path):
    """With max_df=2, a shingle shared by 3 docs leaves the universe — the
    three otherwise-identical docs keep only their sub-cap shingles."""
    from scrupyst_ray.pipelines.dedup import jaccard_allpairs_exact

    texts = ["common shingle here extra one", "common shingle here extra two",
             "common shingle here extra three"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    rows = jaccard_allpairs_exact(str(tmp_path), max_df=2).take_all()
    # 'common shingle here' (df=3) is dropped; remaining per-doc shingles
    # ('shingle here extra', df=3, dropped too; 'here extra <n>' unique)
    # share nothing → no pairs at all
    assert rows == []


def test_dedup_keep_rule(ray_session, jac_dir):
    from scrupyst_ray.pipelines.dedup import jaccard_dedup_keep

    kept = [r["doc_id"] for r in jaccard_dedup_keep(jac_dir).take_all()]
    drops = {b for (_, b) in ref_pairs()}
    want = sorted(d for d, _ in DOCS if d not in drops)
    assert kept == want


def test_deterministic(ray_session, jac_dir):
    from scrupyst_ray.pipelines.dedup import jaccard_allpairs_exact

    a = jaccard_allpairs_exact(jac_dir).take_all()
    b = jaccard_allpairs_exact(jac_dir).take_all()
    assert a == b


def test_unicode_whitespace_matches_duckdb_oracle(ray_session, tmp_path):
    """\xa0/\x85 are token-INTERNAL for RE2's \\S (the DuckDB oracle) but
    token-splitting for Python's str.split() — the shingle tokenizer must
    side with RE2 or the oracle diverges on such corpora."""
    import duckdb

    from scrupyst_ray.pipelines.dedup import jaccard_allpairs_exact

    texts = [
        "a\xa0b c d e f",      # nbsp inside the first token
        "a\xa0b c d e g",      # near-dup of doc 0 under EITHER tokenizer,
        "x\x85y z w v u",      # but the shingle strings differ by tokenizer
        "p q r s t u",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    got = [
        (r["a"], r["b"], r["jaccard"])
        for r in jaccard_allpairs_exact(str(tmp_path), threshold=0.1).take_all()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(str(tmp_path), 'documents.parquet')}'"
    )
    import __ray_entry__ as entry

    sql = entry.oracle_sql()["jaccard_allpairs_exact"].replace(
        "jac >= 0.4", "jac >= 0.1"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want and len(got) >= 1
