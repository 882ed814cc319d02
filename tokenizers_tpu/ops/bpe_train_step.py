"""Distributed BPE training rounds: data-parallel merge + psum'd pair counts.

TPU-native redesign of the reference trainer loop
(`tokenizers/src/models/bpe/trainer.rs:420-593`).  The reference keeps a heap
of pair counts with per-merge incremental updates applied word-by-word under
rayon; here the unique-word corpus is a packed `int32[W, K]` tensor (one row
per word, -1 = dead symbol) sharded over the mesh's `data` axis and each
round is one SPMD program:

  1. **Selection** (replicated, deterministic): argmax over registry counts
     with the reference's exact tie-break — count desc, then pair (a, b)
     ascending (`trainer.rs:30-39`).
  2. **Merge application** (sharded, gather-free): occurrences of the
     selected pair via shift-fills and an overlap-parity scan (leftmost-
     first within `aaa` chains, matching `Word::merge`, `word.rs:107-160`).
  3. **Exact incremental count deltas** (sharded compute, `psum` reduce),
     mirroring the reference's left-to-right in-word pass: left neighbors in
     post-merge state, right neighbors in pre-merge state.  Per site,
     weighted by the word count c:
       own pair (a, b): -c                      [registry slot passed by host]
       right adjacency (b, y_pre) dies: -c      [registry lookup]
       new right pair (new, y_pre): +c          [dense, gated by max length]
       left adjacency (x_post, a): -c           [lookup, or dense if x = new]
       new left pair (x_post, new): +c          [dense, gated]
     Merge sites are *packed* into a fixed-capacity flat tensor so the
     registry hash lookups and delta scatters run on ~|sites| elements, not
     the whole corpus; rounds whose site count overflows the capacity fall
     back to full-tensor lookups (the first few frequent merges).
     Token char lengths for `max_token_length` are a function of token id
     (`id2len`), exactly as the reference's per-symbol lengths evolve.

Every reduction is a deterministic `psum` over the mesh: identical merges
regardless of shard count (tested sharded == host trainer merges).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .bpe_merge2 import _seg_count, _shift_prev, fill_next, fill_prev

MAXPROBE = 8
INT_MIN = np.int32(-0x80000000)
INT_MAX = np.int32(0x7FFFFFFF)
SITE_CAP = 1 << 16  # default packed-delta capacity per shard per round


def _hash_pair(a, b, mask):
    xp = jnp if isinstance(a, jnp.ndarray) else np
    if xp is np:
        a = np.asarray(a)
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

    reg_a/reg_b/count: int32[p_cap] (first `n` live).  slot_rows:
    int32[H, 4] = (key_a, key_b, registry_index, 0), linear probing with
    probe length <= MAXPROBE enforced at insert (H = 4x capacity)."""

    def __init__(self, pairs: Dict[Tuple[int, int], int], p_cap: int):
        self.p_cap = p_cap
        self.n = 0
        self.reg_a = np.full(p_cap, -1, np.int32)
        self.reg_b = np.full(p_cap, -1, np.int32)
        self.count = np.zeros(p_cap, np.int32)
        self.H = 1
        while self.H < 4 * max(16, p_cap):
            self.H <<= 1
        self.slot_rows = np.full((self.H, 4), -1, np.int32)
        self.index: Dict[Tuple[int, int], int] = {}
        for (a, b), c in pairs.items():
            self.insert(a, b, c)

    def insert(self, a: int, b: int, c: int, touched=None) -> int:
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
            if self.slot_rows[s, 2] < 0:
                self.slot_rows[s] = (a, b, idx, 0)
                if touched is not None:
                    touched.append(s)
                break
        else:
            raise RuntimeError("probe length exceeded; resize the registry")
        self.n += 1
        return idx


def _lookup_rows(slot_rows, a, b):
    """Device linear-probe lookup: registry index of (a, b), -1 if absent."""
    mask = slot_rows.shape[0] - 1
    h = _hash_pair(a, b, mask)
    found = jnp.full(a.shape, -1, jnp.int32)
    for probe in range(MAXPROBE):
        row = slot_rows[(h + probe) & mask]
        ok = (row[..., 0] == a) & (row[..., 1] == b)
        found = jnp.where((found < 0) & ok, row[..., 2], found)
    return found


def make_round(mesh: Mesh, p_cap: int, v_cap: int, site_cap: int = SITE_CAP):
    """Build the jitted SPMD merge round over `mesh` (axis name 'data')."""
    from jax.experimental.shard_map import shard_map

    def shard_body(
        words,
        wcount,
        sel_a,
        sel_b,
        sel_idx,
        new_id,
        new_len,
        max_len,
        id2len,
        slot_rows,
    ):
        Ws, K = words.shape
        alive = words >= 0
        (nid,), nfnd = fill_next([words], alive)
        is_pair = alive & nfnd & (words == sel_a) & (nid == sel_b)
        cnt = _seg_count(is_pair, alive & ~is_pair)
        site = is_pair & jnp.where(sel_a == sel_b, cnt % 2 == 1, True)

        # neighbor context via fills (no gathers)
        (nid2_raw, nf_raw), _ = fill_next(
            [jnp.where(nfnd, nid, -1), nfnd.astype(jnp.int32)], alive
        )
        # y = id of the symbol after the absorbed one (pre-merge state)
        y = nid2_raw
        r_ok = site & (nf_raw == 1) & (y >= 0)

        (p_id, p_site), pfnd = fill_prev(
            [words, site.astype(jnp.int32)], alive
        )
        # prev-prev values: fill of the filled arrays
        (pp_id, pp_site), _pp = fill_prev(
            [jnp.where(pfnd, p_id, -1), jnp.where(pfnd, p_site, 0)], alive
        )
        ppfnd = jnp.zeros_like(pfnd)
        (ppf_i,), _ = fill_prev([pfnd.astype(jnp.int32)], alive)
        ppfnd = ppf_i == 1
        # the prev symbol dies this round iff ITS left neighbor is a site;
        # the effective left neighbor is then that absorbing site
        pv_killed = pfnd & ppfnd & (pp_site == 1)
        l_exists = site & pfnd
        x_pre = jnp.where(pv_killed, pp_id, p_id)  # left id, pre-merge
        lp_site = jnp.where(pv_killed, True, p_site == 1)

        c_w = jnp.broadcast_to(wcount[:, None], (Ws, K))

        # ---- pack sites into a flat [site_cap] tensor --------------------
        sflat = site.reshape(-1)
        order = jnp.cumsum(sflat.astype(jnp.int32)) - 1
        n_sites = jnp.sum(sflat.astype(jnp.int32))
        overflow = n_sites > site_cap
        slot = jnp.where(sflat, jnp.minimum(order, site_cap - 1), site_cap)

        def pk(x, fill=0):
            return (
                jnp.full(site_cap + 1, fill, jnp.int32)
                .at[slot]
                .set(jnp.where(sflat, x.reshape(-1), fill), mode="drop")[
                    :site_cap
                ]
            )

        s_y = pk(y, -1)
        s_rok = pk(r_ok.astype(jnp.int32))
        s_x = pk(x_pre, -1)
        s_lex = pk(l_exists.astype(jnp.int32))
        s_lps = pk(lp_site.astype(jnp.int32))
        s_c = pk(c_w)
        s_used = (
            jax.lax.broadcasted_iota(jnp.int32, (site_cap,), 0)
            < jnp.minimum(n_sites, site_cap)
        )

        # ---- deltas over packed sites ------------------------------------
        delta = jnp.zeros(p_cap + 1, jnp.int32)
        dense_left = jnp.zeros(v_cap + 1, jnp.int32)
        dense_right = jnp.zeros(v_cap + 1, jnp.int32)

        # own pair: host passes its registry slot
        delta = delta.at[sel_idx].add(-jnp.sum(jnp.where(s_used, s_c, 0)))

        rmask = s_used & (s_rok == 1)
        ridx = _lookup_rows(slot_rows, jnp.broadcast_to(sel_b, s_y.shape), s_y)
        delta = delta.at[jnp.where(rmask, ridx, p_cap)].add(
            jnp.where(rmask, -s_c, 0), mode="drop"
        )
        r_add = rmask & ((id2len[jnp.clip(s_y, 0, v_cap - 1)] + new_len) < max_len)
        dense_right = dense_right.at[jnp.where(r_add, s_y, v_cap)].add(
            jnp.where(r_add, s_c, 0), mode="drop"
        )

        lmask = s_used & (s_lex == 1)
        l_plain = lmask & (s_lps == 0)
        lidx = _lookup_rows(
            slot_rows, s_x, jnp.broadcast_to(sel_a, s_x.shape)
        )
        delta = delta.at[jnp.where(l_plain, lidx, p_cap)].add(
            jnp.where(l_plain, -s_c, 0), mode="drop"
        )
        # left symbol already merged this round: pair (new, a) -c -> dense
        l_new = lmask & (s_lps == 1)
        dense_right = dense_right.at[
            jnp.where(l_new, jnp.broadcast_to(sel_a, s_x.shape), v_cap)
        ].add(jnp.where(l_new, -s_c, 0), mode="drop")
        # left-add (x_post, new) gated by length
        x_len = jnp.where(
            s_lps == 1, new_len, id2len[jnp.clip(s_x, 0, v_cap - 1)]
        )
        l_add = lmask & ((x_len + new_len) < max_len)
        la_plain = l_add & (s_lps == 0)
        dense_left = dense_left.at[jnp.where(la_plain, s_x, v_cap)].add(
            jnp.where(la_plain, s_c, 0), mode="drop"
        )
        la_new = l_add & (s_lps == 1)  # (new, new) routes through dense_right
        dense_right = dense_right.at[
            jnp.where(la_new, jnp.broadcast_to(new_id, s_x.shape), v_cap)
        ].add(jnp.where(la_new, s_c, 0), mode="drop")

        # ---- apply merges -------------------------------------------------
        (pm,), pf2 = fill_prev([site.astype(jnp.int32)], alive)
        kill = alive & pf2 & (pm == 1)
        words = jnp.where(site, new_id, words)
        words = jnp.where(kill, -1, words)

        delta = jax.lax.psum(delta[:p_cap], "data")
        dense_left = jax.lax.psum(dense_left[:v_cap], "data")
        dense_right = jax.lax.psum(dense_right[:v_cap], "data")
        merged = jax.lax.psum(jnp.sum(jnp.where(site, c_w, 0)), "data")
        overflow = jax.lax.psum(overflow.astype(jnp.int32), "data")
        return words, delta, dense_left, dense_right, merged, overflow

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(
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
        ),
        out_specs=(P("data"), P(), P(), P(), P(), P()),
    )

    def round_fn(
        words,
        wcount,
        count,
        slot_rows,
        id2len,
        sel_a,
        sel_b,
        sel_idx,
        new_id,
        new_len,
        max_len,
    ):
        w2, delta, dl, dr, merged, overflow = sharded(
            words,
            wcount,
            sel_a,
            sel_b,
            sel_idx,
            new_id,
            new_len,
            max_len,
            id2len,
            slot_rows,
        )
        count = count + delta
        id2len = id2len.at[new_id].set(new_len)
        return w2, count, id2len, dl, dr, merged, overflow

    round_jit = jax.jit(round_fn, donate_argnums=(0, 2, 4))

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
