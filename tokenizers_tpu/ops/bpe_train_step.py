"""Distributed BPE training rounds: data-parallel merge + psum'd pair counts.

TPU-native redesign of the reference trainer loop
(`tokenizers/src/models/bpe/trainer.rs:420-593`).  The reference keeps a heap
of pair counts with per-merge incremental updates applied word-by-word under
rayon; here the unique-word corpus is a packed `int32[W, K]` tensor sharded
over the mesh's `data` axis and each round is one SPMD program:

  1. **Selection** (replicated, deterministic): argmax over registry counts
     with the reference's exact tie-break — count desc, then pair (a, b)
     ascending (`trainer.rs:30-39`).
  2. **Merge application** (sharded): occurrences of the selected pair via
     the same linked-list + overlap-parity machinery as the encode kernel
     (leftmost-first within overlapping `aaa` chains, matching
     `Word::merge`, `word.rs:107-160`).
  3. **Exact incremental count deltas** (sharded compute, `psum` reduce).
     Mirroring the reference's left-to-right in-word merge pass: for a merge
     site the *left* neighbor is taken in post-merge state (it may already
     have merged this round) and the *right* neighbor in pre-merge state.
     Per site, weighted by the word count c:
       own pair (a, b): -c
       right adjacency (b, y_pre) dies with the absorbed symbol: -c
       new right pair (new, y_pre): +c   [gated by max_token_length]
       left adjacency (x_post, a): -c
       new left pair (x_post, new): +c   [gated by max_token_length]
     Deltas on pairs that existed before the round resolve to registry slots
     via a linear-probe hash and are scatter-added; deltas on pairs involving
     the freshly minted token (which has no slot yet) accumulate into dense
     per-token arrays — `dense_left[x]` for (x, new), `dense_right[y]` for
     (new, y) — that the host registers after the psum.  Token char lengths
     for the `max_token_length` gate are a pure function of token id
     (`id2len`), exactly as the reference's per-symbol `len` evolves.

Every reduction is a deterministic `psum` over the mesh: identical merges
regardless of shard count (tested sharded == host trainer merges).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .bpe_encode import _chain_parity

MAXPROBE = 32
INT_MIN = np.int32(-0x80000000)
INT_MAX = np.int32(0x7FFFFFFF)


def _hash_pair(a, b, mask):
    if isinstance(a, jnp.ndarray):
        xp = jnp
    else:
        xp = np
        a = np.asarray(a)  # array path avoids scalar-overflow warnings
        b = np.asarray(b)
    a = a.astype(xp.uint32)
    b = b.astype(xp.uint32)
    with np.errstate(over="ignore"):
        h = a * xp.uint32(0x9E3779B1) + b * xp.uint32(0x85EBCA77)
        h = h ^ (h >> xp.uint32(16))
        h = h * xp.uint32(0x7FEB352D)
        h = h ^ (h >> xp.uint32(15))
        return (h & xp.uint32(mask)).astype(xp.int32)


class PairRegistry:
    """Host-managed registry of distinct pairs + the device lookup hash.

    reg_a/reg_b/count: int32[p_cap] (first `n` live). slots: int32[H] ->
    registry index or -1, linear probing, probe length <= MAXPROBE enforced
    at insert (H is sized 4x capacity so this never trips in practice)."""

    def __init__(self, pairs: Dict[Tuple[int, int], int], p_cap: int):
        self.p_cap = p_cap
        self.n = 0
        self.reg_a = np.full(p_cap, -1, np.int32)
        self.reg_b = np.full(p_cap, -1, np.int32)
        self.count = np.zeros(p_cap, np.int32)
        self.H = 1
        while self.H < 4 * max(16, p_cap):
            self.H <<= 1
        self.slots = np.full(self.H, -1, np.int32)
        self.index: Dict[Tuple[int, int], int] = {}
        for (a, b), c in pairs.items():
            self.insert(a, b, c)

    def insert(self, a: int, b: int, c: int) -> int:
        idx = self.n
        if idx >= self.p_cap:
            raise RuntimeError("registry capacity exceeded")
        self.reg_a[idx] = a
        self.reg_b[idx] = b
        self.count[idx] = c
        self.index[(a, b)] = idx
        h = int(_hash_pair(np.int32(a), np.int32(b), self.H - 1))
        for probe in range(MAXPROBE):
            s = (h + probe) & (self.H - 1)
            if self.slots[s] < 0:
                self.slots[s] = idx
                break
        else:
            raise RuntimeError("probe length exceeded; resize the registry")
        self.n += 1
        return idx


def _lookup_slots(reg_a, reg_b, slots, a, b):
    """Device linear-probe lookup: registry index of (a, b), -1 if absent."""
    mask = slots.shape[0] - 1
    h = _hash_pair(a, b, mask)
    found = jnp.full(a.shape, -1, jnp.int32)
    for probe in range(MAXPROBE):
        s = (h + probe) & mask
        idx = slots[s]
        ok = (idx >= 0) & (reg_a[idx] == a) & (reg_b[idx] == b)
        found = jnp.where((found < 0) & ok, idx, found)
    return found


def select_pair(reg_a, count):
    """Replicated deterministic selection: (count desc, pair asc).

    reg_a here is the composite ordering helper — see make_round: we order by
    count desc then (a, b) ascending using two nested argmins."""
    raise NotImplementedError  # inlined in make_round


def make_round(mesh: Mesh, p_cap: int, v_cap: int):
    """Build the jitted SPMD merge round over `mesh` (axis name 'data')."""
    from jax.experimental.shard_map import shard_map

    def shard_body(
        words,
        nxt,
        prv,
        alive,
        wcount,
        sel_a,
        sel_b,
        new_id,
        new_len,
        max_len,
        id2len,
        reg_a,
        reg_b,
        slots,
    ):
        Ws, KP = words.shape
        K = KP - 1
        take = lambda x, idx: jnp.take_along_axis(x, idx, axis=1)

        nid = take(words, nxt)
        valid = alive & (nxt < K)
        is_pair = valid & (words == sel_a) & (nid == sel_b)
        parity = _chain_parity(is_pair, ~alive)
        site = is_pair & jnp.where(sel_a == sel_b, parity == 1, True)

        kill = take(site, prv)  # symbol absorbed because its left pair merged
        c_w = jnp.broadcast_to(wcount[:, None], (Ws, KP))

        # right neighbor (pre-merge state)
        rk = take(nxt, nxt)  # nxt[k]
        r_ok = site & (rk < K)
        y = take(words, rk)
        r_add_ok = r_ok & ((id2len[y] + new_len) < max_len)

        # left neighbor (post-merge state): skip over a just-absorbed symbol
        pv = prv
        lp = jnp.where(take(kill, pv), take(prv, pv), pv)
        l_ok = site & (lp < K)
        lp_site = take(site, jnp.clip(lp, 0, K))
        x_pre = take(words, lp)
        x_len = jnp.where(lp_site, new_len, id2len[x_pre])
        l_add_ok = l_ok & ((x_len + new_len) < max_len)

        # ---- deltas ------------------------------------------------------
        didx = []
        dval = []

        def hash_delta(a_arr, b_arr, mask, sign):
            idx = _lookup_slots(reg_a, reg_b, slots, a_arr, b_arr)
            didx.append(jnp.where(mask, idx, -1))
            dval.append(jnp.where(mask, sign * c_w, 0))

        a_bc = jnp.broadcast_to(sel_a, words.shape)
        b_bc = jnp.broadcast_to(sel_b, words.shape)
        hash_delta(a_bc, b_bc, site, -1)  # own
        hash_delta(b_bc, y, r_ok, -1)  # right adjacency dies
        hash_delta(x_pre, a_bc, l_ok & ~lp_site, -1)  # left adjacency (x, a)

        dense_left = jnp.zeros(v_cap + 1, jnp.int32)
        dense_right = jnp.zeros(v_cap + 1, jnp.int32)
        # (new, y): +c gated
        dense_right = dense_right.at[jnp.where(r_add_ok, y, v_cap)].add(
            jnp.where(r_add_ok, c_w, 0), mode="drop"
        )
        # left adjacency involving new: (new, a) -c when the left symbol
        # already merged this round
        dense_right = dense_right.at[
            jnp.where(l_ok & lp_site, a_bc, v_cap)
        ].add(jnp.where(l_ok & lp_site, -c_w, 0), mode="drop")
        # (x_post, new): +c gated; x_post == new routes through dense_right
        lx = l_add_ok & ~lp_site
        dense_left = dense_left.at[jnp.where(lx, x_pre, v_cap)].add(
            jnp.where(lx, c_w, 0), mode="drop"
        )
        ln = l_add_ok & lp_site  # (new, new)
        dense_right = dense_right.at[
            jnp.where(ln, jnp.broadcast_to(new_id, words.shape), v_cap)
        ].add(jnp.where(ln, c_w, 0), mode="drop")

        # ---- apply merges ------------------------------------------------
        words = jnp.where(site, new_id, words)
        alive = alive & ~kill
        nxt = jnp.where(site, take(nxt, nxt), nxt)
        kp = take(kill, prv)
        prv = jnp.where(kp, take(prv, prv), prv)

        delta = jnp.zeros(p_cap + 1, jnp.int32)
        for i, v in zip(didx, dval):
            delta = delta.at[jnp.where(i >= 0, i, p_cap)].add(v, mode="drop")
        delta = jax.lax.psum(delta[:p_cap], "data")
        dense_left = jax.lax.psum(dense_left[:v_cap], "data")
        dense_right = jax.lax.psum(dense_right[:v_cap], "data")
        merged = jax.lax.psum(jnp.sum(jnp.where(site, c_w, 0)), "data")
        return words, nxt, prv, alive, delta, dense_left, dense_right, merged

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(
            P("data"),
            P("data"),
            P("data"),
            P("data"),
            P("data"),
            P(),
            P(),
            P(),
            P(),
            P(),
            P(),
            P(),
            P(),
            P(),
        ),
        out_specs=(
            P("data"),
            P("data"),
            P("data"),
            P("data"),
            P(),
            P(),
            P(),
            P(),
        ),
    )

    def round_fn(
        words,
        nxt,
        prv,
        alive,
        wcount,
        reg_a,
        reg_b,
        count,
        slots,
        id2len,
        sel_a,
        sel_b,
        new_id,
        new_len,
        max_len,
    ):
        w2, n2, p2, al2, delta, dl, dr, merged = sharded(
            words,
            nxt,
            prv,
            alive,
            wcount,
            sel_a,
            sel_b,
            new_id,
            new_len,
            max_len,
            id2len,
            reg_a,
            reg_b,
            slots,
        )
        count = count + delta
        id2len = id2len.at[new_id].set(new_len)
        return w2, n2, p2, al2, count, id2len, dl, dr, merged

    round_jit = jax.jit(round_fn, donate_argnums=(0, 1, 2, 3, 7, 9))

    def select_fn(reg_a, reg_b, count):
        """(count desc, (a,b) asc) argmax; returns (best, a, b)."""
        live = reg_a >= 0
        c = jnp.where(live, count, INT_MIN)
        best = jnp.max(c)
        cand = live & (c == best)
        a_min = jnp.min(jnp.where(cand, reg_a, INT_MAX))
        cand2 = cand & (reg_a == a_min)
        b_min = jnp.min(jnp.where(cand2, reg_b, INT_MAX))
        return best, a_min, b_min

    select_jit = jax.jit(select_fn)
    return select_jit, round_jit
