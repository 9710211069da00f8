"""Suffix-automaton LCS verification — the actor-pool substring stage.

Candidate pairs from the winnow tier are verified by computing the longest
common token run between the two documents with a suffix automaton (public
algorithm; linear build over the first sequence, linear scan of the second).
This is the engine's "suffix-array stage over actor pools" (north_star): a
stateful callable class used with ``map_batches(..., concurrency=N)`` —
automaton reuse/caching lives in the actor (``__init__`` once per actor,
LRU across batches), per SURVEY §3.3.

The automaton runs over *token-hash* sequences (uint64), not characters, so
"substring" means a verbatim token run — whitespace-insensitive, matching
the tokenizer semantics used everywhere else.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa

from .config import DEFAULT_CONFIG, SigConfig
from .tokenize import tokenize_hashes


class _SuffixAutomaton:
    """Suffix automaton over a sequence of hashable symbols."""

    __slots__ = ("next", "link", "length", "last")

    def __init__(self, seq: np.ndarray):
        self.next: list[dict[int, int]] = [{}]
        self.link: list[int] = [-1]
        self.length: list[int] = [0]
        self.last = 0
        for c in seq.tolist():
            self._extend(c)

    def _extend(self, c: int) -> None:
        nxt, link, length = self.next, self.link, self.length
        cur = len(nxt)
        nxt.append({})
        length.append(length[self.last] + 1)
        link.append(-1)
        p = self.last
        while p != -1 and c not in nxt[p]:
            nxt[p][c] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = nxt[p][c]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(nxt)
                nxt.append(dict(nxt[q]))
                length.append(length[p] + 1)
                link.append(link[q])
                while p != -1 and nxt[p].get(c) == q:
                    nxt[p][c] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        self.last = cur

    def lcs_len(self, seq: np.ndarray) -> int:
        v, l, best = 0, 0, 0
        nxt, link, length = self.next, self.link, self.length
        for c in seq.tolist():
            while v and c not in nxt[v]:
                v = link[v]
                l = length[v]
            if c in nxt[v]:
                v = nxt[v][c]
                l += 1
                if l > best:
                    best = l
        return best


_P = np.uint64(0x9E3779B97F4A7C15)  # odd → multiplication is a bijection mod 2^64


def find_token_run(small: np.ndarray, big: np.ndarray) -> int:
    """Vectorized verbatim-run search: index of the first occurrence of
    ``small`` as a contiguous run inside ``big``, or -1.

    Rolling polynomial hash in wrapping uint64 arithmetic: with
    T[t] = Σ_{j<t} big[j]·P^j, window i equals
    (T[i+m] − T[i]) == H(small)·P^i, and because P is odd the P^i factor is
    a bijection mod 2^64 — no inverse powers needed, no false negatives.
    Hash-equal positions (64-bit collisions aside, ~never) are confirmed
    with one exact array compare. O(len(big)) numpy, no Python per token —
    this replaces the suffix-automaton build for containment checks
    (VERDICT r02 item 5)."""
    m, n = len(small), len(big)
    if m == 0 or m > n:
        return -1
    pw = np.empty(n, dtype=np.uint64)
    pw[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _P, dtype=np.uint64), out=pw[1:])
    t = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(big * pw, out=t[1:])
    hs = np.sum(small * pw[:m], dtype=np.uint64)
    win = t[m:] - t[: n - m + 1]
    target = hs * pw[: n - m + 1]
    for i in np.flatnonzero(win == target):
        if np.array_equal(big[i : i + m], small):
            return int(i)
    return -1


def _seq_key(seq: np.ndarray) -> bytes:
    from .hashing import xxh64_bytes

    b = seq.tobytes()
    return xxh64_bytes(b).to_bytes(8, "little") + len(b).to_bytes(8, "little")


class LcsVerifier:
    """Actor-pool stage: batches of candidate pairs with both contents →
    (src, dst, lcs_tokens, contained).

    ``contained`` is True iff the smaller document appears verbatim (as a
    token run) inside the larger — decided by the vectorized rolling-hash
    run search (``find_token_run``), no automaton and no Python per token.

    ``exact_lcs`` controls the lcs_tokens column for NON-contained pairs:
    False (the default) emits 0 for them — the right mode for
    ``containment_pairs``, whose downstream filter drops non-contained
    rows anyway, so the per-token-Python suffix automaton never builds
    unless explicitly requested; True computes the exact longest common
    run with an LRU-cached suffix automaton (the diagnostic contract,
    opt-in because the automaton build is a Python loop per token).
    Contained pairs always report lcs == len(small).
    """

    def __init__(
        self,
        cfg: SigConfig = DEFAULT_CONFIG,
        cache_size: int = 256,
        exact_lcs: bool = False,
    ):
        self.cfg = cfg
        self.cache: OrderedDict[bytes, _SuffixAutomaton] = OrderedDict()
        self.cache_size = cache_size
        self.exact_lcs = exact_lcs

    def _automaton(self, key: bytes, seq: np.ndarray) -> _SuffixAutomaton:
        a = self.cache.get(key)
        if a is None:
            a = _SuffixAutomaton(seq)
            self.cache[key] = a
            if len(self.cache) > self.cache_size:
                self.cache.popitem(last=False)
        else:
            self.cache.move_to_end(key)
        return a

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        flat_a, off_a = tokenize_hashes(batch.column("content_a"), seed=cfg.seed)
        flat_b, off_b = tokenize_hashes(batch.column("content_b"), seed=cfg.seed)
        src = batch.column("src").to_numpy()
        dst = batch.column("dst").to_numpy()
        n = len(batch)
        lcs = np.zeros(n, dtype=np.int64)
        contained = np.zeros(n, dtype=bool)
        for i in range(n):
            a = flat_a[off_a[i] : off_a[i + 1]]
            b = flat_b[off_b[i] : off_b[i + 1]]
            if len(a) == 0 or len(b) == 0:
                continue
            small, big = (a, b) if len(a) <= len(b) else (b, a)
            if find_token_run(small, big) >= 0:
                lcs[i] = len(small)
                contained[i] = True
            elif self.exact_lcs:
                auto = self._automaton(_seq_key(big), big)
                lcs[i] = auto.lcs_len(small)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "lcs_tokens": pa.array(lcs),
                "contained": pa.array(contained),
            }
        )
