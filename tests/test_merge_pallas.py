"""The Pallas-fused merge round (ops/merge_pallas.py, interpret mode on
CPU) must be bit-identical to the lax `merge_round` oracle on randomized
well-formed tables, word layouts, and fill depths, including row padding
(R not a multiple of RB)."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tokenizers_tpu.ops.bpe_merge2 import _seg_of, init_own, merge_round
from tokenizers_tpu.ops.merge_pallas import merge_round_pallas
from tokenizers_tpu.ops.merge_table import CuckooMergeTable, consume_mins


def random_table(rng, n_base, n_merges):
    merges = {}
    next_id = n_base
    for rank in range(n_merges):
        for _ in range(50):
            a = rng.randrange(next_id)
            b = rng.randrange(next_id)
            if (a, b) not in merges:
                merges[(a, b)] = (rank, next_id)
                next_id += 1
                break
    return merges


@pytest.mark.parametrize("seed,R,C,k", [(0, 8, 256, 9), (1, 5, 384, 9),
                                        (2, 8, 256, 2), (3, 16, 256, 4)])
def test_pallas_round_matches_lax(seed, R, C, k):
    rng = random.Random(seed)
    merges = random_table(rng, 8, 120)
    table = CuckooMergeTable(merges)
    n_ids = max(nid for _r, nid in merges.values()) + 1
    mclr_np = consume_mins(merges, n_ids)
    rows0 = jnp.asarray(table.rows8(0, mclr_np))
    rows1 = jnp.asarray(table.rows8(1, mclr_np))
    mclr = jnp.asarray(mclr_np)

    ids = np.full((R, C), -1, np.int32)
    wid = np.full((R, C), -1, np.int32)
    for r in range(R):
        col = 0
        w = 0
        while col < C - 4:
            wl = rng.randrange(1, 12)
            for _ in range(min(wl, C - 1 - col)):
                ids[r, col] = rng.randrange(8)
                wid[r, col] = w
                col += 1
            w += 1
            if rng.random() < 0.2:  # dead gap (mid-merge state)
                col += rng.randrange(1, 1 << min(k, 3))
        # punch dead holes inside words too (gap < 2^k)
        for _ in range(8):
            p = rng.randrange(C)
            ids[r, p] = -1

    ids = jnp.asarray(ids)
    wid = jnp.asarray(wid)
    own_l, own_r = init_own(ids, mclr)
    seed32 = jnp.int32(table.seed)

    a1, l1, r1_, f1 = merge_round(
        ids, own_l, own_r, wid, _seg_of(wid), rows0, rows1, seed32, k_steps=k
    )
    a2, l2, r2_, f2 = merge_round_pallas(
        ids, own_l, own_r, wid, rows0, rows1, seed32, k_steps=k,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    alive = np.asarray(a1) >= 0
    np.testing.assert_array_equal(
        np.asarray(l1)[alive], np.asarray(l2)[alive]
    )
    np.testing.assert_array_equal(
        np.asarray(r1_)[alive], np.asarray(r2_)[alive]
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # fused driver (carried keys): two back-to-back rounds must equal two
    # lax rounds — the carried h0/h1/nid are where a staleness bug would
    # show up, so the second round is the actual assertion
    from tokenizers_tpu.ops.merge_pallas import (
        _pad_rb,
        keys_pallas,
        merge_round_fused,
    )

    ids_p = _pad_rb(ids, -1)
    ol_p = _pad_rb(own_l, 0)
    or_p = _pad_rb(own_r, 0)
    wid_p = _pad_rb(wid, -1)
    h0, h1, nid = keys_pallas(ids_p, rows0, seed32, k_steps=k,
                              interpret=True)
    st = (ids_p, ol_p, or_p, h0, h1, nid)
    lax_st = (ids, own_l, own_r)
    R0 = ids.shape[0]
    for _ in range(2):
        i2, l2_, r2x, f2x, h0, h1, nid = merge_round_fused(
            st[0], st[1], st[2], wid_p, st[3], st[4], st[5], rows0, rows1,
            seed32, k_steps=k, interpret=True,
        )
        st = (i2, l2_, r2x, h0, h1, nid)
        a1x, l1x, r1x, f1x = merge_round(
            lax_st[0], lax_st[1], lax_st[2], wid, _seg_of(wid), rows0,
            rows1, seed32, k_steps=k,
        )
        lax_st = (a1x, l1x, r1x)
        np.testing.assert_array_equal(
            np.asarray(a1x), np.asarray(i2[:R0])
        )
        np.testing.assert_array_equal(
            np.asarray(f1x), np.asarray(f2x[:R0])
        )
