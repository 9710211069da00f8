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


def _seq_key(seq: np.ndarray) -> bytes:
    from .hashing import xxh64_bytes

    b = seq.tobytes()
    return xxh64_bytes(b).to_bytes(8, "little") + len(b).to_bytes(8, "little")


class LcsVerifier:
    """Actor-pool stage: batches of candidate pairs with both contents →
    (src, dst, lcs_tokens, contained).

    ``contained`` is True iff the smaller document appears verbatim (as a
    token run) inside the larger. Automata are LRU-cached per actor: hot
    documents (one doc in many candidate pairs) build their automaton once.
    """

    def __init__(self, cfg: SigConfig = DEFAULT_CONFIG, cache_size: int = 256):
        self.cfg = cfg
        self.cache: OrderedDict[bytes, _SuffixAutomaton] = OrderedDict()
        self.cache_size = cache_size

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
            auto = self._automaton(_seq_key(big), big)
            l = auto.lcs_len(small)
            lcs[i] = l
            contained[i] = l == len(small)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "lcs_tokens": pa.array(lcs),
                "contained": pa.array(contained),
            }
        )
