"""Distributed BPE merge learning (`pipelines/bpe.py`) vs a pure-Python
reference implementation of Sennrich et al.'s algorithm."""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOCS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide",
]


def ref_bpe(texts: list[str], n_merges: int):
    """Textbook BPE on the word-frequency table; merges apply left-to-right
    non-overlapping; tie-break = (count desc, 'left\\x00right' asc)."""
    wf = Counter()
    for t in texts:
        wf.update(t.split())
    syms = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc_: Counter = Counter()
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pc_[(a, b)] += wf[w]
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x00" + kv[0][1]))
        (l, r), c = best
        if c < 2:
            break
        merges.append((l, r, c))
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return merges


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpedocs")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS, pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def test_merges_match_reference(ray_session, bpe_dir):
    from scrupyst_ray.pipelines.bpe import learn_bpe

    got = learn_bpe(bpe_dir, n_merges=8)
    want = ref_bpe(DOCS, 8)
    assert got == want
    assert len(got) >= 4  # the corpus has that much mergeable structure


def test_first_merge_tiebreak(ray_session, bpe_dir):
    """(d,e), (i,d), (w,i) all count 7 (wide×5 + wider + widest) — the
    deterministic tie-break (pair-string ascending) must pick ('d','e')."""
    from scrupyst_ray.pipelines.bpe import learn_bpe

    got = learn_bpe(bpe_dir, n_merges=1)
    assert got == [("d", "e", 7)]


def test_overlapping_run_merges_nonoverlapping(ray_session, tmp_path):
    """'aaaa' under merge (a,a): left-to-right scan yields (aa)(aa), not
    three overlapping matches — the reference implementation's semantics."""
    from scrupyst_ray.pipelines.bpe import merge_symbols

    assert merge_symbols(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_symbols(list("aaa"), "a", "a") == ["aa", "a"]


def test_segment_uses_rank_order(ray_session, bpe_dir):
    from scrupyst_ray.pipelines.bpe import bpe_segment, learn_bpe

    merges = learn_bpe(bpe_dir, n_merges=8)
    seg = bpe_segment("lowest", merges)
    assert "".join(seg) == "lowest"
    assert len(seg) < len("lowest")  # at least one merge applied


def _morph_corpus(tmp_path, name: str) -> tuple[str, list[str]]:
    import random

    rng = random.Random(13)
    stems = ["".join(rng.choices("abcdefghijklmnop", k=rng.randint(4, 9)))
             for _ in range(400)]
    suffixes = ["", "s", "ing", "ed", "er", "est", "ly", "tion"]
    words = [s + rng.choice(suffixes) for s in stems for _ in range(rng.randint(1, 6))]
    texts = [" ".join(words[i::17]) for i in range(17)]
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d), texts


def test_exact_batched_merges_match_sequential_at_scale(ray_session, tmp_path):
    """Exact batching (the default) must stay BYTE-IDENTICAL to sequential
    BPE at 256 merges while measurably beating one-merge-per-pass (the
    creation guard caps the win at ~1.5-2× on Zipf-flat counts — that is the
    price of bit-parity; the big win is exact=False below)."""
    from scrupyst_ray.pipelines.bpe import learn_bpe

    d, texts = _morph_corpus(tmp_path, "bpescale")
    stats: dict = {}
    got = learn_bpe(d, n_merges=256, stats=stats)
    want = ref_bpe(texts, 256)
    assert got == want
    assert len(got) == 256
    assert stats["supersteps"] <= int(256 * 0.75), stats


def test_standard_batched_merges_bounded_rounds(ray_session, tmp_path):
    """exact=False — standard top-K-non-conflicting batched BPE (the 32k-
    vocab scale path): 256 merges in a BOUNDED number of supersteps, merge
    SET near the sequential one (order may differ — the documented trade)."""
    from scrupyst_ray.pipelines.bpe import learn_bpe

    d, texts = _morph_corpus(tmp_path, "bpescale2")
    stats: dict = {}
    got = learn_bpe(d, n_merges=256, stats=stats, exact=False)
    assert len(got) == 256
    assert stats["supersteps"] <= 40, stats
    want = ref_bpe(texts, 256)
    got_set = {(l, r) for l, r, _ in got}
    want_set = {(l, r) for l, r, _ in want}
    overlap = len(got_set & want_set) / len(want_set)
    assert overlap >= 0.8, overlap


def test_nul_in_tokens_is_unambiguous(ray_session, tmp_path):
    """NUL is \\S (a legal token char); pairs travel as two columns, so a
    symbol containing NUL must not crash or misparse (ADVICE r2)."""
    from scrupyst_ray.pipelines.bpe import learn_bpe

    texts = ["a\x00b a\x00b a\x00b xy xy xy xy"] * 2
    d = tmp_path / "bpenul"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = learn_bpe(str(d), n_merges=4)
    want = ref_bpe(texts, 4)
    assert got == want
    assert any("\x00" in l or "\x00" in r for l, r, _ in got)


def test_vocab_stats_consistent(ray_session, bpe_dir):
    from scrupyst_ray.pipelines.bpe import bpe_vocab_stats

    t = bpe_vocab_stats(bpe_dir, n_merges=8)
    row = {c: t[c][0].as_py() for c in t.column_names}
    assert row["encoded_symbols"] < row["char_symbols"]
    assert row["n_merges"] == 8
    assert row["corpus_tokens"] == sum(len(d.split()) for d in DOCS)


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_exact_batching_property_random_corpora(ray_session, tmp_path, seed):
    """Property: exact-mode batched learning equals sequential BPE on
    arbitrary corpora (defends the conflict-break + creation-guard proof,
    not just the one morphology corpus)."""
    import random

    from scrupyst_ray.pipelines.bpe import learn_bpe

    rng = random.Random(seed)
    alphabet = "abcdef"
    words = [
        "".join(rng.choices(alphabet, k=rng.randint(1, 7)))
        for _ in range(rng.randint(50, 150))
    ]
    texts = [
        " ".join(rng.choices(words, k=rng.randint(5, 40))) for _ in range(9)
    ]
    d = tmp_path / f"bpeprop{seed}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    # small window forces the cutoff-marker path to participate too
    got = learn_bpe(str(d), n_merges=64, window=16)
    want = ref_bpe(texts, 64)
    assert got == want, seed
