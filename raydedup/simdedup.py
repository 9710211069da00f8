"""SimHash near-duplicate pair detection (pigeonhole banding), Ray-native.

For 64-bit SimHash fingerprints and a Hamming radius d, split the
fingerprint into d+1 equal chunks: any pair within distance d must agree on
at least one chunk (pigeonhole). Group by (chunk_idx, chunk_value), verify
Hamming distance inside buckets — the classic Manku/Jain/Sarma 2007
near-duplicate scheme, here as one Ray groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .config import DEFAULT_CONFIG, SigConfig
from .hashing import splitmix64
from .simhash import popcount64
from .stages import SignatureStage

U64 = np.uint64


class SimhashChunkEmit:
    """(id, simhash) → (chunk_key, id, simhash) rows, n_chunks per row."""

    def __init__(self, n_chunks: int):
        if 64 % n_chunks:
            raise ValueError("n_chunks must divide 64")
        self.n_chunks = n_chunks
        self.width = 64 // n_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        sim = batch.column("simhash").to_numpy().astype(np.uint64)
        ids = batch.column("id").to_numpy()
        nsh = (
            batch.column("n_shingles").to_numpy()
            if "n_shingles" in batch.column_names
            else np.ones(len(ids), dtype=np.int64)
        )
        valid = nsh > 0
        sim, ids = sim[valid], ids[valid]
        n = len(ids)
        mask = U64((1 << self.width) - 1)
        keys = np.empty(n * self.n_chunks, dtype=np.uint64)
        for c in range(self.n_chunks):
            chunk = (sim >> U64(c * self.width)) & mask
            # mix chunk idx into the key so chunks never cross-collide
            keys[c * n : (c + 1) * n] = splitmix64(
                chunk ^ (U64(0xC00C) + U64(c) * U64(0x9E3779B97F4A7C15))
            )
        return pa.table(
            {
                "chunk_key": pa.array(keys, type=pa.uint64()),
                "id": pa.array(np.tile(ids, self.n_chunks), type=pa.int64()),
                "simhash": pa.array(np.tile(sim, self.n_chunks), type=pa.uint64()),
            }
        )


def simhash_dup_pairs(
    corpus: "ray.data.Dataset",
    cfg: SigConfig = DEFAULT_CONFIG,
    max_hamming: int | None = None,
    max_bucket: int = 4096,
) -> "ray.data.Dataset":
    """→ (src, dst, hamming) pairs with Hamming(simhash) <= max_hamming.

    Guaranteed-complete for max_hamming <= n_chunks - 1 (pigeonhole). Uses
    n_chunks = max_hamming + 1 rounded to a divisor of 64.
    """
    d = cfg.simhash_max_hamming if max_hamming is None else max_hamming
    n_chunks = next(c for c in (1, 2, 4, 8, 16) if c >= d + 1)

    sigs = corpus.map_batches(SignatureStage(cfg), batch_format="pyarrow")
    chunked = sigs.select_columns(["id", "simhash", "n_shingles"]).map_batches(
        SimhashChunkEmit(n_chunks), batch_format="pyarrow"
    )

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column("id").to_numpy()
        sim = group.column("simhash").to_numpy().astype(np.uint64)
        order = np.argsort(ids)
        ids, sim = ids[order], sim[order]
        keep = np.concatenate([[True], ids[1:] != ids[:-1]])
        ids, sim = ids[keep], sim[keep]
        n = len(ids)
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if n < 2 or n > max_bucket:
            return empty
        iu = np.triu_indices(n, k=1)
        ham = popcount64(sim[iu[0]] ^ sim[iu[1]])
        m = ham <= d
        return pa.table(
            {
                "src": pa.array(ids[iu[0][m]]),
                "dst": pa.array(ids[iu[1][m]]),
                "hamming": pa.array(ham[m]),
            }
        )

    pairs = chunked.groupby("chunk_key").map_groups(verify, batch_format="pyarrow")

    def dedup(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pairs.groupby(["src", "dst"]).map_groups(dedup, batch_format="pyarrow")
