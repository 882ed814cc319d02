"""Device-resident BPE merge-rank table: host-built 2-way cuckoo hash.

Replaces the reference's `MergeMap: AHashMap<(u32,u32),(u32,u32)>`
(`tokenizers/src/models/bpe/model.rs:214-239`) with a structure a TPU kernel
can query in exactly two gathers per pair: two tables, two multiplicative
hash functions; every key resides in one of its two slots.

Layout per table (numpy, replicated to every chip):
    key_a int32[S], key_b int32[S]  (-1 = empty)
    rank  int32[S], new_id int32[S]

Device lookup (see bpe_encode.py): probe h1(t0) and h2(t1), compare (a, b),
select.  All int32 arithmetic, no int64 required.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# odd 32-bit mixing constants (Knuth-style multiplicative hashing)
_C1 = np.int32(np.uint32(0x9E3779B1).astype(np.int32))
_C2 = np.int32(np.uint32(0x85EBCA77).astype(np.int32))
_C3 = np.int32(np.uint32(0xC2B2AE3D).astype(np.int32))


def _hash(a: np.ndarray, b: np.ndarray, seed: int, mask: int, which: int) -> np.ndarray:
    """Vectorized 32-bit hash of (a,b) pairs -> slot index in [0, mask]."""
    a = a.astype(np.uint32)
    b = b.astype(np.uint32)
    c1, c2 = (np.uint32(_C1), np.uint32(_C2)) if which == 0 else (np.uint32(_C2), np.uint32(_C3))
    h = a * c1 + b * c2 + np.uint32(seed)
    h ^= h >> np.uint32(15)
    h *= np.uint32(0x2C1B3C6D)
    h ^= h >> np.uint32(12)
    return (h & np.uint32(mask)).astype(np.int64)


class CuckooMergeTable:
    """2-way cuckoo hash over (left_id, right_id) -> (rank, new_id)."""

    def __init__(self, merges: Dict[Tuple[int, int], Tuple[int, int]]):
        n = max(1, len(merges))
        size = 1
        while size < n:
            size <<= 1
        size <<= 1  # load factor <= 50% across the two tables combined
        self.seed = 0
        while not self._try_build(merges, size):
            self.seed += 1
            if self.seed % 8 == 0:
                size <<= 1
        self.size = size

    def _try_build(self, merges, size) -> bool:
        mask = size - 1
        # table index t in {0,1}; slot arrays shape [2, size]
        key_a = np.full((2, size), -1, dtype=np.int32)
        key_b = np.full((2, size), -1, dtype=np.int32)
        rank = np.zeros((2, size), dtype=np.int32)
        new_id = np.zeros((2, size), dtype=np.int32)
        max_kicks = 32 + 4 * int(np.log2(size) + 1)

        for (a, b), (r, nid) in merges.items():
            cur = (a, b, r, nid)
            t = 0
            placed = False
            for _ in range(max_kicks):
                h = int(
                    _hash(
                        np.array([cur[0]]), np.array([cur[1]]), self.seed, mask, t
                    )[0]
                )
                if key_a[t, h] == -1:
                    key_a[t, h], key_b[t, h] = cur[0], cur[1]
                    rank[t, h], new_id[t, h] = cur[2], cur[3]
                    placed = True
                    break
                # evict occupant, move it to its other table
                ev = (key_a[t, h], key_b[t, h], rank[t, h], new_id[t, h])
                key_a[t, h], key_b[t, h] = cur[0], cur[1]
                rank[t, h], new_id[t, h] = cur[2], cur[3]
                cur = ev
                t ^= 1
            if not placed:
                return False

        self.mask = mask
        self.key_a = key_a
        self.key_b = key_b
        self.rank = rank
        self.new_id = new_id
        return True

    def rows(self, t: int) -> np.ndarray:
        """Table t as [S, 4] rows (key_a, key_b, value0, value1) — one
        row-gather per probe on device instead of four scalar gathers."""
        return np.stack(
            [self.key_a[t], self.key_b[t], self.rank[t], self.new_id[t]],
            axis=-1,
        ).astype(np.int32)

    def rows8(self, t: int, mclr: np.ndarray) -> np.ndarray:
        """Table t as [S, 8] rows (key_a, key_b, rank, new_id,
        MCL(new_id), MCR(new_id), 0, 0).

        Embedding the merged token's consume-mins (`consume_mins`) in the
        row lets the merge loop carry per-position (MCL, MCR) as state
        updated from the lookup it already does — deleting the separate
        full-width `mclr[ids]` gather every round (gathers cost per index
        on this backend; the wider row is near-free)."""
        nid = self.new_id[t]
        V = mclr.shape[0]
        cl = np.clip(nid, 0, V - 1)
        empty = self.key_a[t] == -1
        mcl = np.where(empty, 0, mclr[cl, 0])
        mcr = np.where(empty, 0, mclr[cl, 1])
        zero = np.zeros_like(nid)
        return np.stack(
            [
                self.key_a[t],
                self.key_b[t],
                self.rank[t],
                nid,
                mcl,
                mcr,
                zero,
                zero,
            ],
            axis=-1,
        ).astype(np.int32)

    # ------------------------------------------------------------ host lookup

    def lookup_np(self, a: np.ndarray, b: np.ndarray):
        """Vectorized host-side lookup (used in tests): returns (rank, new_id)
        with rank = -1 where absent."""
        out_rank = np.full(a.shape, -1, dtype=np.int32)
        out_new = np.full(a.shape, -1, dtype=np.int32)
        for t in (0, 1):
            h = _hash(a, b, self.seed, self.mask, t)
            hit = (self.key_a[t][h] == a) & (self.key_b[t][h] == b)
            out_rank = np.where(hit, self.rank[t][h], out_rank)
            out_new = np.where(hit, self.new_id[t][h], out_new)
        return out_rank, out_new


def consume_mins(
    merges: Dict[Tuple[int, int], Tuple[int, int]], n_ids: int
) -> np.ndarray:
    """Per-token minimum consuming ranks, [n_ids, 2] int32:

        [:, 0] = MCL(t) = min rank over merges (x, t)  (t as right member)
        [:, 1] = MCR(t) = min rank over merges (t, y)  (t as left member)

    INF (0x7FFFFFFF) where no such merge exists.  Used by the safe-set
    merge round (`bpe_merge2.merge_round`) to bound the rank of any future
    merge that could consume a pair's neighbor tokens."""
    INF32 = np.int32(0x7FFFFFFF)
    out = np.full((n_ids, 2), INF32, dtype=np.int32)
    for (a, b), (r, _nid) in merges.items():
        if 0 <= b < n_ids and r < out[b, 0]:
            out[b, 0] = r
        if 0 <= a < n_ids and r < out[a, 1]:
            out[a, 1] = r
    return out


def take_row8(idx, flat_table):
    """`flat_table[idx]` with the flat-gather price (~8 ns/index on this
    backend) replaced by a width-8 ROW gather (~3.2 ns/row — width <= 16
    is free, PERF.md) + a 3-bit lane select (elementwise).  The table
    length must be a multiple of 8 (all class/page tables are)."""
    import jax.numpy as jnp

    n = flat_table.shape[0]
    rows = flat_table.reshape(n // 8, 8)
    r = rows[idx >> 3]
    lane = idx & 7
    out = r[..., 0]
    for k in range(1, 8):
        out = jnp.where(lane == k, r[..., k], out)
    return out


def hash_jnp(a, b, seed: int, mask: int, which: int):
    """Same hash as `_hash`, in jax.numpy (uint32 wraparound semantics)."""
    import jax.numpy as jnp

    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    c1 = jnp.uint32(0x9E3779B1) if which == 0 else jnp.uint32(0x85EBCA77)
    c2 = jnp.uint32(0x85EBCA77) if which == 0 else jnp.uint32(0xC2B2AE3D)
    h = a * c1 + b * c2 + jnp.uint32(seed)
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> jnp.uint32(12))
    return (h & jnp.uint32(mask)).astype(jnp.int32)
