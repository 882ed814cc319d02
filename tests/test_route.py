"""Fuzz the butterfly monotone router (ops/route.py) against numpy
fancy indexing: stable compaction, dense->increasing-target spreading,
and the composed general monotone route."""

import numpy as np
import pytest

import jax.numpy as jnp

from tokenizers_tpu.ops.route import (
    compact_left_flat,
    route_to_flat,
    spread_right_flat,
)

RNG = np.random.default_rng(7)


def _rand_case(n, density, rng=None):
    rng = RNG if rng is None else rng
    live = rng.random(n) < density
    vals = rng.integers(0, 1 << 20, n).astype(np.int32)
    return live, vals


@pytest.mark.parametrize("n", [8, 64, 257, 1024])
@pytest.mark.parametrize("density", [0.0, 0.15, 0.5, 0.95, 1.0])
def test_compact_left(n, density):
    live, vals = _rand_case(n, density)
    (out,), cnt = compact_left_flat(
        (jnp.asarray(vals)[None],), jnp.asarray(live)[None], (-1,)
    )
    out = np.asarray(out)[0]
    expect = vals[live]
    assert int(cnt[0]) == len(expect)
    np.testing.assert_array_equal(out[: len(expect)], expect)
    np.testing.assert_array_equal(out[len(expect) :], -1)


def test_compact_left_max_shift_hint():
    live = np.array([1, 0, 1, 1, 0, 1, 1, 1], bool)
    vals = np.arange(8, dtype=np.int32)
    (out,), cnt = compact_left_flat(
        (jnp.asarray(vals)[None],), jnp.asarray(live)[None], (-1,), max_shift=2
    )
    np.testing.assert_array_equal(
        np.asarray(out)[0][: int(cnt[0])], vals[live]
    )


@pytest.mark.parametrize("trial", range(25))
def test_spread_right_random(trial):
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(8, 600))
    n_out = int(rng.integers(n, 2 * n))
    k = int(rng.integers(0, n + 1))
    vals = rng.integers(0, 1 << 20, n).astype(np.int32)
    tgt = np.zeros(n, np.int32)
    if k:
        tgt[:k] = np.sort(
            rng.choice(np.arange(n_out), size=k, replace=False)
        ).astype(np.int32)
    (out,), live_o = spread_right_flat(
        (jnp.asarray(vals)[None],),
        jnp.asarray([k], np.int32),
        jnp.asarray(tgt)[None],
        (-1,),
        n_out=n_out,
    )
    out = np.asarray(out)[0]
    live_o = np.asarray(live_o)[0]
    expect = np.full(n_out, -1, np.int32)
    exp_live = np.zeros(n_out, bool)
    if k:
        expect[tgt[:k]] = vals[:k]
        exp_live[tgt[:k]] = True
    np.testing.assert_array_equal(live_o, exp_live)
    np.testing.assert_array_equal(np.where(exp_live, out, -1), expect)


@pytest.mark.parametrize("trial", range(25))
def test_route_to_general_monotone(trial):
    """Sources at arbitrary (increasing) live positions, targets strictly
    increasing with gaps, moves in both directions within one route."""
    rng = np.random.default_rng(200 + trial)
    n = int(rng.integers(16, 500))
    n_out = int(rng.integers(n // 2, 2 * n))
    live, vals = _rand_case(n, float(rng.random()) * 0.6 + 0.05, rng)
    idx = np.nonzero(live)[0]
    k = min(len(idx), n_out)
    idx = idx[:k]
    live = np.zeros(n, bool)
    live[idx] = True
    tgt_full = np.zeros(n, np.int32)
    if k:
        tgt = np.sort(rng.choice(np.arange(n_out), size=k, replace=False))
        tgt_full[idx] = tgt.astype(np.int32)
    (out,), live_o = route_to_flat(
        (jnp.asarray(vals)[None],),
        jnp.asarray(live)[None],
        jnp.asarray(tgt_full)[None],
        (-1,),
        n_out=n_out,
    )
    out = np.asarray(out)[0]
    live_o = np.asarray(live_o)[0]
    exp_live = np.zeros(n_out, bool)
    expect = np.full(n_out, -1, np.int32)
    if k:
        exp_live[tgt_full[idx]] = True
        expect[tgt_full[idx]] = vals[idx]
    np.testing.assert_array_equal(live_o, exp_live)
    np.testing.assert_array_equal(np.where(exp_live, out, -1), expect)


def test_multi_array_rides_along():
    live = np.array([0, 1, 1, 0, 1, 0, 0, 1], bool)
    a = np.arange(8, dtype=np.int32)
    b = (np.arange(8, dtype=np.int32) * 10).astype(np.int32)
    (oa, ob), cnt = compact_left_flat(
        (jnp.asarray(a)[None], jnp.asarray(b)[None]),
        jnp.asarray(live)[None],
        (-1, -1),
    )
    np.testing.assert_array_equal(np.asarray(oa)[0][:4], a[live])
    np.testing.assert_array_equal(np.asarray(ob)[0][:4], b[live])


# ---------------------------------------------------------------------------
# wrap (row-major multi-row stream) mode
# ---------------------------------------------------------------------------

from tokenizers_tpu.ops.route import compact_left, route_to, spread_right


@pytest.mark.parametrize("shape", [(4, 16), (7, 33), (16, 128)])
@pytest.mark.parametrize("density", [0.0, 0.3, 0.9])
def test_compact_left_wrap(shape, density):
    R, C = shape
    n = R * C
    live, vals = _rand_case(n, density)
    (out,), cnt = compact_left(
        (jnp.asarray(vals).reshape(R, C),),
        jnp.asarray(live).reshape(R, C),
        (-1,),
        wrap=True,
    )
    out = np.asarray(out).reshape(-1)
    expect = vals[live]
    assert int(cnt) == len(expect)
    np.testing.assert_array_equal(out[: len(expect)], expect)
    np.testing.assert_array_equal(out[len(expect) :], -1)


@pytest.mark.parametrize("trial", range(15))
def test_spread_right_wrap(trial):
    rng = np.random.default_rng(300 + trial)
    R = int(rng.integers(2, 9))
    C = int(rng.integers(8, 65))
    n = R * C
    R2 = int(rng.integers(R, 2 * R + 1))
    n_out = R2 * C
    k = int(rng.integers(0, n + 1))
    vals = rng.integers(0, 1 << 20, n).astype(np.int32)
    tgt = np.zeros(n, np.int32)
    if k:
        tgt[:k] = np.sort(
            rng.choice(np.arange(n_out), size=k, replace=False)
        ).astype(np.int32)
    (out,), live_o = spread_right(
        (jnp.asarray(vals).reshape(R, C),),
        jnp.int32(k),
        jnp.asarray(tgt).reshape(R, C),
        (-1,),
        wrap=True,
        n_out=n_out,
    )
    out = np.asarray(out).reshape(-1)
    live_o = np.asarray(live_o).reshape(-1)
    expect = np.full(n_out, -1, np.int32)
    exp_live = np.zeros(n_out, bool)
    if k:
        expect[tgt[:k]] = vals[:k]
        exp_live[tgt[:k]] = True
    np.testing.assert_array_equal(live_o, exp_live)
    np.testing.assert_array_equal(np.where(exp_live, out, -1), expect)


@pytest.mark.parametrize("trial", range(15))
def test_route_to_wrap(trial):
    rng = np.random.default_rng(400 + trial)
    R = int(rng.integers(2, 9))
    C = int(rng.integers(8, 65))
    n = R * C
    R2 = int(rng.integers(max(1, R - 2), 2 * R + 1))
    n_out = R2 * C
    live, vals = _rand_case(n, float(rng.random()) * 0.5 + 0.05, rng)
    idx = np.nonzero(live)[0]
    k = min(len(idx), n_out)
    idx = idx[:k]
    live = np.zeros(n, bool)
    live[idx] = True
    tgt_full = np.zeros(n, np.int32)
    if k:
        tgt = np.sort(rng.choice(np.arange(n_out), size=k, replace=False))
        tgt_full[idx] = tgt.astype(np.int32)
    (out,), live_o = route_to(
        (jnp.asarray(vals).reshape(R, C),),
        jnp.asarray(live).reshape(R, C),
        jnp.asarray(tgt_full).reshape(R, C),
        (-1,),
        wrap=True,
        n_out=n_out,
    )
    out = np.asarray(out).reshape(-1)
    live_o = np.asarray(live_o).reshape(-1)
    exp_live = np.zeros(n_out, bool)
    expect = np.full(n_out, -1, np.int32)
    if k:
        exp_live[tgt_full[idx]] = True
        expect[tgt_full[idx]] = vals[idx]
    np.testing.assert_array_equal(live_o, exp_live)
    np.testing.assert_array_equal(np.where(exp_live, out, -1), expect)


def test_compact_left_per_row_counts():
    x = np.array([[1, -1, 2, -1], [-1, -1, 3, 4]], np.int32)
    live = x > 0
    (out,), cnt = compact_left((jnp.asarray(x),), jnp.asarray(live), (0,))
    np.testing.assert_array_equal(np.asarray(cnt), [2, 2])
    np.testing.assert_array_equal(
        np.asarray(out), [[1, 2, 0, 0], [3, 4, 0, 0]]
    )
