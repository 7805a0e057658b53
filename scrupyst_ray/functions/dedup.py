"""Near-duplicate detection kernels: shingling, MinHash, SimHash, Jaccard.

Standard public algorithms (Broder '97 MinHash, Charikar '02 SimHash,
banding-LSH from Mining of Massive Datasets).  All signature math is
vectorized numpy; the kernels run inside ``map_batches`` and the candidate
generation is a plain groupby on band keys (see ``pipelines/dedup.py``).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

from scrupyst_ray.functions.textstats import ws_tokens

_MERSENNE = np.uint64((1 << 61) - 1)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-token shingles of *text* (deduplicated).

    Tokens are RE2-\\S-exact (``ws_tokens``), NOT ``str.split()`` — Python
    treats \\xa0/\\x85/\\v as whitespace where RE2 (the DuckDB oracle
    regex) does not, and the exact-Jaccard oracles re-derive these shingles
    with ``regexp_extract_all(text, '\\S+')``; the two tokenizers must
    agree byte-for-byte (same guard as the bigram LM)."""
    toks = ws_tokens(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = {
        int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "big")
        for s in shingles
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


def shingle_hashes_md5(text: str, k: int = 3) -> np.ndarray:
    """``shingle_hashes`` with md5-derived shingle hashes (first 8 hex
    bytes, big-endian) — the SQL-recomputable twin (DuckDB rebuilds the
    same k-token shingles with ``array_to_string`` over
    ``regexp_extract_all(text, '\\S+')`` and the same hex-cast hash).
    Used by the driver-visible ``minhash_signature_check`` gate; the
    production pipeline keeps blake2b."""
    from hashlib import md5

    toks = ws_tokens(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = {
        int.from_bytes(md5(s.encode()).digest()[:8], "big") for s in shingles
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """num_perm universal hash functions h_i(x) = (a_i*x + b_i) mod p,
    vectorized over all shingles at once.  Deterministic (fixed seed)."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 MinHash signature of a shingle-hash set."""
        if len(hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        x = (hashes % _MERSENNE).astype(np.uint64)
        # (num_perm, n) — modular math in python-int free numpy (mod 2^64 is
        # fine for uniformity here; exact Carter-Wegman not required)
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


def band_keys(signature: np.ndarray, bands: int) -> list[bytes]:
    """LSH banding: split the signature into *bands* equal slices; the key of
    band j is (j, hash(slice bytes)).  Two docs sharing ANY band key are
    candidates."""
    rows = len(signature) // bands
    keys = []
    for j in range(bands):
        chunk = signature[j * rows : (j + 1) * rows].tobytes()
        digest = blake2b(chunk, digest_size=8).digest()
        keys.append(j.to_bytes(2, "big") + digest)
    return keys


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (term-frequency weighted;
    RE2-\\S-exact tokenizer, shared with the Jaccard shingles)."""
    toks = ws_tokens(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks), return_counts=True)
    hashes = np.fromiter(
        (
            int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = (bits.astype(np.int64) * 2 - 1) * counts[:, None]
    sign = votes.sum(axis=0) >= 0
    packed = np.packbits(sign.astype(np.uint8), bitorder="little")
    return int(packed.view(np.uint64)[0])


def simhash64_md5(text: str) -> int:
    """``simhash64`` with md5-derived token hashes (first 8 hex bytes,
    big-endian) instead of blake2b — the SQL-recomputable twin: DuckDB's
    ``CAST(('0x' || substr(md5(t),1,16)) AS UBIGINT)`` reproduces the
    per-token hash exactly, so a SQL oracle can re-derive the full signature
    (bit p = sign of the tf-weighted vote over ``(h >> p) & 1``) from the
    text alone.  Used by the driver-visible ``simhash_recall`` gate; the
    production pipeline keeps blake2b (faster, no hex round-trip)."""
    from hashlib import md5

    toks = ws_tokens(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks), return_counts=True)
    hashes = np.fromiter(
        (
            int.from_bytes(md5(t.encode()).digest()[:8], "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = (bits.astype(np.int64) * 2 - 1) * counts[:, None]
    sign = votes.sum(axis=0) >= 0
    packed = np.packbits(sign.astype(np.uint8), bitorder="little")
    return int(packed.view(np.uint64)[0])


def hamming64(a: int | np.ndarray, b: int | np.ndarray) -> np.ndarray | int:
    x = np.bitwise_xor(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    return np.bitwise_count(x) if hasattr(np, "bitwise_count") else _popcount64(x)


def _popcount64(x: np.ndarray) -> np.ndarray | int:
    x = np.asarray(x, dtype=np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt if cnt.shape else int(cnt)


def simhash_band_keys(sig: int, bands: int = 4) -> list[bytes]:
    """Split the 64-bit simhash into *bands* chunks; docs within small
    hamming distance share ≥1 exact chunk (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [
        j.to_bytes(1, "big") + (((sig >> (j * width)) & mask)).to_bytes(8, "big")
        for j in range(bands)
    ]


def jaccard_tokens(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-token-shingle Jaccard (verification step after LSH)."""
    a, b = set(map(int, shingle_hashes(text_a, k))), set(map(int, shingle_hashes(text_b, k)))
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
