"""Stress-test the safe-set merge round (`bpe_merge2.merge_round`) against
a direct sequential (rank, pos) implementation of the reference merge loop
(`models/bpe/word.rs:162-250` semantics) on randomized well-formed tables.

The safe-set rule merges many pairs per round; bit-exactness vs the
sequential order is the whole game, so this fuzzes beyond the gpt2 table:
random alphabets, random merge DAGs (always well-formed: consuming merges
rank above producing merges — guaranteed by minting merges bottom-up), and
adversarial run/repeat patterns."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tokenizers_tpu.ops.bpe_merge2 import run_merge_phases
from tokenizers_tpu.ops.merge_table import CuckooMergeTable, consume_mins


def sequential_merge(ids, merges):
    """Reference semantics: repeatedly apply the lowest-(rank, pos) merge."""
    ids = list(ids)
    while True:
        best = None
        for i in range(len(ids) - 1):
            m = merges.get((ids[i], ids[i + 1]))
            if m is None:
                continue
            rank, _ = m
            if best is None or rank < best[0]:
                best = (rank, i)
        if best is None:
            return ids
        _, i = best
        new_id = merges[(ids[i], ids[i + 1])][1]
        ids[i : i + 2] = [new_id]


def random_table(rng, n_base, n_merges):
    """Random well-formed merge table: merge k joins two ids < n_base + k."""
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


def run_device(words, merges, width=128):
    """Pack words (lists of base ids) one per row and run the merge loop."""
    table = CuckooMergeTable(merges)
    n_ids = max(nid for _r, nid in merges.values()) + 1
    mclr_np = consume_mins(merges, n_ids)
    rows0 = jnp.asarray(table.rows8(0, mclr_np))
    rows1 = jnp.asarray(table.rows8(1, mclr_np))
    mclr = jnp.asarray(mclr_np)
    B = len(words)
    ids = np.full((B, width), -1, np.int32)
    wid = np.full((B, width), -1, np.int32)
    for r, w in enumerate(words):
        ids[r, : len(w)] = w
        wid[r, : len(w)] = 0
    out_ids, out_wid, bad, _ = run_merge_phases(
        jnp.asarray(ids),
        jnp.asarray(wid),
        rows0,
        rows1,
        jnp.int32(table.seed),
        mclr,
    )
    out = np.asarray(out_ids)
    assert not np.asarray(bad).any()
    return [[int(x) for x in row if x >= 0] for row in out]


def test_equal_rank_runs():
    # "aaaa..." parity: a single merge (0,0)->1 then (1,1)->2 etc.
    merges = {(0, 0): (0, 1), (1, 1): (1, 2), (2, 2): (2, 3)}
    words = [[0] * n for n in range(1, 33)]
    dev = run_device(words, merges)
    for w, d in zip(words, dev):
        assert d == sequential_merge(w, merges), f"len {len(w)}"


def test_mixed_runs_and_chains():
    rng = random.Random(0)
    merges = random_table(rng, 6, 40)
    words = []
    for _ in range(64):
        n = rng.randrange(1, 40)
        # bias toward repeats to exercise runs
        w = []
        while len(w) < n:
            s = rng.randrange(6)
            w.extend([s] * rng.randrange(1, 5))
        words.append(w[:n])
    dev = run_device(words, merges)
    for w, d in zip(words, dev):
        assert d == sequential_merge(w, merges), f"word {w}"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_tables(seed):
    rng = random.Random(seed)
    merges = random_table(rng, 8, 120)
    words = [
        [rng.randrange(8) for _ in range(rng.randrange(1, 64))]
        for _ in range(48)
    ]
    dev = run_device(words, merges)
    for w, d in zip(words, dev):
        assert d == sequential_merge(w, merges), f"word {w}"


def test_preemption_chain_shapes():
    # Hand-built chain: merge 0 creates a token that feeds merge 1 adjacent
    # to a tempting-but-preempted higher-rank pair (the [3,2,1]-style trap).
    merges = {
        (0, 1): (0, 4),  # rank 0
        (4, 2): (1, 5),  # rank 1 consumes token 4
        (2, 3): (2, 6),  # rank 2 would be a local min trap next to rank 1
        (5, 3): (3, 7),
        (6, 6): (4, 8),
    }
    words = [
        [0, 1, 2, 3],
        [0, 1, 2, 3, 2, 3],
        [2, 3, 0, 1, 2, 3],
        [3, 2, 0, 1, 2, 2, 3, 3],
        [0, 1, 2, 2, 3, 0, 1, 2, 3],
    ]
    dev = run_device(words, merges)
    for w, d in zip(words, dev):
        assert d == sequential_merge(w, merges), f"word {w}"
