"""BPE merge learning — distributed byte-pair-encoding tokenizer training
(Sennrich et al., ACL '16, arXiv:1508.07909).

The classic algorithm: start from characters, repeatedly merge the most
frequent adjacent symbol pair across the corpus.  The corpus statistic BPE
actually trains on is the WORD-FREQUENCY table (distinct word, count) —
tiny next to the corpus — so the distributed shape is:

1. one corpus pass builds the word-frequency table (per-batch ``Counter``
   partials → word-keyed groupby-sum, the combiner pattern);
2. each merge round is one small pipeline over that table: emit adjacent
   symbol pairs weighted by word count → pair-keyed groupby-sum →
   per-block argmax partials → the driver picks the single global best
   (count desc, pair-string asc — deterministic tie-break);
3. the winning merge applies to the symbol table in place (left-to-right,
   non-overlapping — the reference implementation's scan) and the next
   round runs on the result.

Only ONE (pair, count) row reaches the driver per round; the corpus is
read exactly once.  No end-of-word marker (the synthetic corpus carries no
morphology worth modelling; the marker is one extra symbol if needed).
Tokens are RE2-``\\S``-exact (`ws_tokens`), shared with every other text
operator.  k-merge learning is inherently iterative/argmax-driven, hence
rows-only: correctness is pytest-gated against a pure-Python reference
implementation of the same algorithm.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from scrupyst_ray.functions.textstats import ws_tokens
from scrupyst_ray.pipelines.joins import collect_table, rename
from scrupyst_ray.pipelines.textstats import _docs


def word_freqs(sf_dir: str):
    """(word, n) — the distinct-word frequency table BPE trains on."""

    def partial(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b["text"].to_pylist():
            c.update(ws_tokens(t))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return rename(
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("n"),
        ["word", "n"],
    )


def merge_symbols(syms: list[str], left: str, right: str) -> list[str]:
    """Apply one merge to a symbol sequence, left-to-right non-overlapping
    (the reference implementation's scan order)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(sf_dir: str, n_merges: int = 16):
    """[(left, right, count), ...] — the first *n_merges* BPE merges
    learned over the corpus, most frequent first."""
    syms = word_freqs(sf_dir).map_batches(
        lambda b: pa.table(
            {
                # symbols as a ' '-joined string (tokens are \S+ runs, so
                # ' ' is a safe separator); chars are the start alphabet
                "s": pa.array(
                    [" ".join(w) for w in b["word"].to_pylist()], pa.string()
                ),
                "n": b["n"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):

        def pair_rows(b: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for s, n in zip(b["s"].to_pylist(), b["n"].to_pylist()):
                toks = s.split(" ")
                for a, bb in zip(toks, toks[1:]):
                    c[a + "\x00" + bb] += n
            return pa.table(
                {
                    "pair": pa.array(list(c.keys()), pa.string()),
                    "n": pa.array(list(c.values()), pa.int64()),
                }
            )

        def local_best(b: pa.Table) -> pa.Table:
            # one candidate row per block: max count, pair-string tie-break
            if b.num_rows == 0:
                return b
            order = pc.sort_indices(
                b, sort_keys=[("sum(n)", "descending"), ("pair", "ascending")]
            )
            return b.take(order.slice(0, 1))

        cands = collect_table(
            syms.map_batches(pair_rows, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("n"))
            .map_batches(local_best, batch_format="pyarrow")
        )
        if cands.num_rows == 0:
            break
        rows = sorted(
            zip(cands["pair"].to_pylist(), cands["sum(n)"].to_pylist()),
            key=lambda r: (-r[1], r[0]),
        )
        pair, count = rows[0]
        if count < 2:
            break  # nothing left worth merging
        left, right = pair.split("\x00")
        merges.append((left, right, int(count)))

        def apply(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "s": pa.array(
                        [
                            " ".join(merge_symbols(s.split(" "), left, right))
                            for s in b["s"].to_pylist()
                        ],
                        pa.string(),
                    ),
                    "n": b["n"],
                }
            )

        syms = syms.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def bpe_merges(sf_dir: str, n_merges: int = 16):
    """(rank, left, right, count) — the learned merge table, the artifact a
    tokenizer trainer ships.  Rows-only (iterative argmax; pytest-gated
    against a pure-Python reference run of the same algorithm)."""
    rows = learn_bpe(sf_dir, n_merges)
    return pa.table(
        {
            "rank": pa.array(range(len(rows)), pa.int64()),
            "left": pa.array([r[0] for r in rows], pa.string()),
            "right": pa.array([r[1] for r in rows], pa.string()),
            "count": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def bpe_segment(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Tokenize one word with a learned merge table (merges apply in rank
    order — the standard BPE encoder)."""
    syms = list(word)
    for left, right, _ in merges:
        syms = merge_symbols(syms, left, right)
    return syms


def bpe_vocab_stats(sf_dir: str, n_merges: int = 16):
    """(n_merges, n_symbols, corpus_tokens_before, corpus_symbols_after) —
    one row: how much the learned merges compress the corpus (symbol count
    after encoding vs raw character-symbol count)."""
    merges = learn_bpe(sf_dir, n_merges)
    merges_ref = ray.put(merges)

    def partial(b: pa.Table) -> pa.Table:
        m = ray.get(merges_ref)
        before = after = toks = 0
        for t in b["text"].to_pylist():
            for w in ws_tokens(t):
                toks += 1
                before += len(w)
                after += len(bpe_segment(w, m))
        return pa.table(
            {
                "toks": pa.array([toks], pa.int64()),
                "before": pa.array([before], pa.int64()),
                "after": pa.array([after], pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .sum(["toks", "before", "after"])
    )
    vocab = {s for m in merges for s in (m[0], m[1], m[0] + m[1])}
    return pa.table(
        {
            "n_merges": pa.array([len(merges)], pa.int64()),
            "n_symbols": pa.array([len(vocab)], pa.int64()),
            "corpus_tokens": pa.array([agg["sum(toks)"]], pa.int64()),
            "char_symbols": pa.array([agg["sum(before)"]], pa.int64()),
            "encoded_symbols": pa.array([agg["sum(after)"]], pa.int64()),
        }
    )
