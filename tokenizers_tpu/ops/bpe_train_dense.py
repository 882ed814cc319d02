"""Device-resident BPE training: ALL merges in one `lax.while_loop`.

The round-2 trainer (`bpe_train_step.py`) dispatched one device program per
merge with host registry upserts in between — ~10 ms of transport per merge
made 512 merges cost ~90 s.  This module keeps the *entire* merge loop on
device: pair counts live in a dense replicated `int32[v_cap, v_pad]` matrix
(the registry), selection is a flat argmax (first-max == the reference's
(count desc, pair asc) tie-break, `models/bpe/trainer.rs:30-39`), and the
per-merge corpus pass runs sharded over the mesh with `psum`'d count deltas.
One dispatch trains the whole vocabulary.

Token identity (the host's `word_to_id.get(new_token)` reuse check — two
different pairs can assemble the same string, e.g. ("ab","c") and ("a","bc"))
is tracked on device with composable rolling hashes: for token t the carry
holds h(t) (two independent 32-bit fold hashes of its bytes), h_strip(t) /
pw_strip(t) (hash and MULT^len of the string minus `continuing_subword_prefix`),
and byte lengths, so the candidate's identity is
    h(a·strip(b)) = h(a) * pw_strip(b) + h_strip(b)
and reuse is an equality sweep over the id axis.  The host verifies every
reuse decision against real strings after the loop (`verify_merges`); a hash
collision (~2^-64 per pair) falls back to the exact per-round path.

Per-word merge semantics are the flat-stream port of `bpe_train_step.py`'s
`shard_body` (overlap parity, post-merge left / pre-merge right neighbor
deltas, `max_token_length` gating via id2len) — tested merge-for-merge equal
to the host trainer and therefore to the reference
(`models/bpe/trainer.rs:420-593`, `word.rs:107-160`).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .bpe_merge2 import _seg_count, fill_next, fill_prev

INT_MIN = np.int32(-0x80000000)
H1_MULT = np.uint32(0x01000193)
H2_MULT = np.uint32(0x0000C597)

# dense registry cap: v_cap^2 * 4 bytes replicated per chip.  16384 -> 1 GB;
# beyond that the per-round registry path (bpe_train.py) takes over.
DENSE_VCAP_MAX = 16384


def fold_hash(data: bytes, mult: int) -> Tuple[int, int]:
    """(hash, MULT^len mod 2^32) of a byte string — matches the device
    composition h(A.B) = h(A)*pw(B) + h(B)."""
    h = 0
    pw = 1
    m = int(mult)
    for byte in data:
        h = (h * m + byte + 1) & 0xFFFFFFFF
        pw = (pw * m) & 0xFFFFFFFF
    return h, pw


def seed_hash_state(id_to_word: List[str], v_cap: int, prefix: str):
    """Host-side identity state for the initial vocabulary."""
    H1 = np.zeros(v_cap, np.uint32)
    H2 = np.zeros(v_cap, np.uint32)
    HS1 = np.zeros(v_cap, np.uint32)
    HS2 = np.zeros(v_cap, np.uint32)
    PS1 = np.ones(v_cap, np.uint32)
    PS2 = np.ones(v_cap, np.uint32)
    BF = np.zeros(v_cap, np.int32)
    BS = np.zeros(v_cap, np.int32)
    for i, w in enumerate(id_to_word):
        wb = w.encode("utf-8")
        sb = wb[len(prefix.encode("utf-8")):] if prefix and w.startswith(prefix) else wb
        H1[i], _ = fold_hash(wb, H1_MULT)
        H2[i], _ = fold_hash(wb, H2_MULT)
        HS1[i], PS1[i] = fold_hash(sb, H1_MULT)
        HS2[i], PS2[i] = fold_hash(sb, H2_MULT)
        BF[i] = len(wb)
        BS[i] = len(sb)
    return H1, H2, HS1, HS2, PS1, PS2, BF, BS


def pack_corpus(words, counts, ncol: int, nshard: int):
    """Pack tokenized words into a flat [R, ncol] symbol stream.

    Words never cross a row boundary; rows pad with -1.  Returns
    (ids [R, ncol] i32, wid [R, ncol] i32 global word index or -1,
    wcnt [R, ncol] i32 word count at every in-word position), with R a
    multiple of nshard."""
    rows: List[List[Tuple[int, int, int]]] = [[]]
    used = 0
    for i, (w, _lens) in enumerate(words):
        n = len(w)
        if n == 0:
            continue
        if n > ncol:
            raise ValueError(f"word of {n} symbols exceeds ncol={ncol}")
        if used + n > ncol:
            rows.append([])
            used = 0
        rows[-1].append((i, counts[i], n))
        used += n
    R = -(-max(len(rows), 1) // nshard) * nshard
    ids = np.full((R, ncol), -1, np.int32)
    wid = np.full((R, ncol), -1, np.int32)
    wcnt = np.zeros((R, ncol), np.int32)
    for r, row in enumerate(rows):
        c = 0
        for (i, cnt, n) in row:
            ids[r, c : c + n] = words[i][0]
            wid[r, c : c + n] = i
            wcnt[r, c : c + n] = cnt
            c += n
    return ids, wid, wcnt


def initial_pair_matrix(ids: np.ndarray, wid: np.ndarray, wcnt: np.ndarray,
                        v_cap: int, v_pad: int) -> np.ndarray:
    """Dense initial pair counts from the packed stream (host, vectorized)."""
    a = ids[:, :-1].reshape(-1).astype(np.int64)
    b = ids[:, 1:].reshape(-1).astype(np.int64)
    wa = wid[:, :-1].reshape(-1)
    wb = wid[:, 1:].reshape(-1)
    c = wcnt[:, :-1].reshape(-1).astype(np.int64)
    ok = (a >= 0) & (b >= 0) & (wa == wb)
    keys = a[ok] * v_pad + b[ok]
    C = np.zeros(v_cap * v_pad, np.int64)
    np.add.at(C, keys, c[ok])
    return C.reshape(v_cap, v_pad).astype(np.int32)


def _select(C, v_pad):
    """(best, a, b): max count, first flat index = (a, b) ascending."""
    idx = jnp.argmax(C.reshape(-1))
    best = C.reshape(-1)[idx]
    return best, (idx // v_pad).astype(jnp.int32), (idx % v_pad).astype(jnp.int32)


def _site_deltas(D, used, sa, sb, new_id, new_len, max_len,
                 y, r_ok, x_pre, l_exists, lp_site, c, id2len, v_cap, v_pad):
    """Scatter the per-site pair-count deltas into the local delta matrix D.

    Mirrors `bpe_train_step.shard_body`'s accounting exactly:
      own pair (sa, sb): -c per site
      right adjacency (sb, y_pre) dies: -c; (new, y_pre): +c gated by length
      left adjacency: (x_post, sa) dies (x_post = new when the left symbol
      merged earlier this round), (x_post, new): +c gated by length."""
    drop_r = jnp.int32(v_cap)
    drop_c = jnp.int32(v_pad)
    c = jnp.where(used, c, 0)

    # own pair
    D = D.at[sa, sb].add(-jnp.sum(c))

    rmask = used & r_ok
    yc = jnp.clip(y, 0, v_cap - 1)
    D = D.at[jnp.where(rmask, sb, drop_r), jnp.where(rmask, yc, drop_c)].add(
        jnp.where(rmask, -c, 0), mode="drop"
    )
    r_add = rmask & ((id2len[yc] + new_len) < max_len)
    D = D.at[jnp.where(r_add, new_id, drop_r), jnp.where(r_add, yc, drop_c)].add(
        jnp.where(r_add, c, 0), mode="drop"
    )

    lmask = used & l_exists
    xc = jnp.clip(x_pre, 0, v_cap - 1)
    l_plain = lmask & ~lp_site
    D = D.at[jnp.where(l_plain, xc, drop_r), jnp.where(l_plain, sa, drop_c)].add(
        jnp.where(l_plain, -c, 0), mode="drop"
    )
    l_new = lmask & lp_site
    D = D.at[jnp.where(l_new, new_id, drop_r), jnp.where(l_new, sa, drop_c)].add(
        jnp.where(l_new, -c, 0), mode="drop"
    )
    x_len = jnp.where(lp_site, new_len, id2len[xc])
    l_add = lmask & ((x_len + new_len) < max_len)
    xpost = jnp.where(lp_site, new_id, xc)
    D = D.at[jnp.where(l_add, xpost, drop_r), jnp.where(l_add, new_id, drop_c)].add(
        jnp.where(l_add, c, 0), mode="drop"
    )
    return D


def make_dense_train(mesh: Mesh, v_cap: int, v_pad: int, merge_cap: int,
                     site_cap: int, k_steps: int):
    """Build the jitted whole-training program over `mesh` (axis 'data').

    Returns train_fn(ids, wid, wcnt, C0, id2len0, hash-state..., next_id0,
    max_len, minf, vocab_size) -> (merges [merge_cap, 3], n_merges)."""
    from jax.experimental.shard_map import shard_map
    from .route import compact_left

    def shard_fn(ids, wid, wcnt, C, id2len,
                 H1, H2, HS1, HS2, PS1, PS2, BF, BS,
                 next_id0, max_len, minf, vocab_size):
        iota_v = jax.lax.iota(jnp.int32, v_cap)

        def merge_pass(words, sa, sb, new_id, new_len):
            """One sharded corpus pass: apply the merge, return
            (words', local delta matrix D)."""
            alive = words >= 0
            (nid, nwid), nfnd = fill_next([words, wid], alive, k_steps)
            is_pair = alive & nfnd & (words == sa) & (nid == sb) & (nwid == wid)
            cnt = _seg_count(is_pair, alive & ~is_pair)
            site = is_pair & jnp.where(sa == sb, cnt % 2 == 1, True)

            # right context: y = symbol after the absorbed one (pre-merge)
            (nid2, nwid2, nf2), _ = fill_next(
                [jnp.where(nfnd, nid, -1), jnp.where(nfnd, nwid, -1),
                 nfnd.astype(jnp.int32)], alive, k_steps
            )
            r_ok = site & (nf2 == 1) & (nwid2 == wid)

            # left context: previous alive symbol, and whether IT merges
            # this round (then the effective post-merge left id is new_id)
            (p_id, p_wid, p_site), pfnd = fill_prev(
                [words, wid, site.astype(jnp.int32)], alive, k_steps
            )
            (pp_id, pp_site), _ = fill_prev(
                [jnp.where(pfnd, p_id, -1), jnp.where(pfnd, p_site, 0)],
                alive, k_steps,
            )
            (ppf_i,), _ = fill_prev([pfnd.astype(jnp.int32)], alive, k_steps)
            pv_killed = pfnd & (ppf_i == 1) & (pp_site == 1)
            l_exists = site & pfnd & (p_wid == wid)
            x_pre = jnp.where(pv_killed, pp_id, p_id)
            lp_site = jnp.where(pv_killed, True, p_site == 1)

            # ---- deltas: butterfly-pack the sites, or full-width fallback
            n_sites = jnp.sum(site.astype(jnp.int32))
            rec = (y_f, rok_f, x_f, lex_f, lps_f, c_f) = (
                jnp.where(r_ok, nid2, -1),
                r_ok.astype(jnp.int32),
                jnp.where(l_exists, x_pre, -1),
                l_exists.astype(jnp.int32),
                lp_site.astype(jnp.int32),
                wcnt,
            )
            D0 = jnp.zeros((v_cap + 1, v_pad + 1), jnp.int32)

            def packed_branch(_):
                outs, _n = compact_left(rec, site, (-1, 0, -1, 0, 0, 0),
                                        wrap=True)
                flat = [o.reshape(-1)[:site_cap] for o in outs]
                used = (
                    jax.lax.iota(jnp.int32, site_cap)
                    < jnp.minimum(n_sites, site_cap)
                )
                return _site_deltas(
                    D0, used, sa, sb, new_id, new_len, max_len,
                    flat[0], flat[1] == 1, flat[2], flat[3] == 1,
                    flat[4] == 1, flat[5], id2len, v_cap, v_pad,
                )

            def full_branch(_):
                return _site_deltas(
                    D0, site.reshape(-1), sa, sb, new_id, new_len, max_len,
                    y_f.reshape(-1), rok_f.reshape(-1) == 1,
                    x_f.reshape(-1), lex_f.reshape(-1) == 1,
                    lps_f.reshape(-1) == 1, c_f.reshape(-1),
                    id2len, v_cap, v_pad,
                )

            D = jax.lax.cond(n_sites <= site_cap, packed_branch, full_branch,
                             None)

            # ---- apply the merge
            (pm,), pf2 = fill_prev([site.astype(jnp.int32)], alive, k_steps)
            kill = alive & pf2 & (pm == 1)
            words = jnp.where(site, new_id, words)
            words = jnp.where(kill, -1, words)
            return words, D[:v_cap, :v_pad]

        def cond(state):
            (_w, _C, _l, _h, next_id, _m, k, best, _a, _b) = state
            return (
                (next_id < vocab_size)
                & (best >= jnp.maximum(jnp.int32(1), minf))
                & (k < merge_cap)
            )

        def body(state):
            (words, C, id2len, hstate, next_id, merges, k, best, sa, sb) = state
            (H1, H2, HS1, HS2, PS1, PS2, BF, BS) = hstate

            # ---- mint / reuse the new token id (hash identity)
            h1n = H1[sa] * PS1[sb] + HS1[sb]
            h2n = H2[sa] * PS2[sb] + HS2[sb]
            bfn = BF[sa] + BS[sb]
            eq = (H1 == h1n) & (H2 == h2n) & (BF == bfn) & (iota_v < next_id)
            matched = jnp.any(eq)
            new_id = jnp.where(matched, jnp.argmax(eq).astype(jnp.int32),
                               next_id)
            next_id = next_id + jnp.where(matched, 0, 1)
            new_len = id2len[sa] + id2len[sb]

            hstate = (
                H1.at[new_id].set(h1n),
                H2.at[new_id].set(h2n),
                HS1.at[new_id].set(HS1[sa] * PS1[sb] + HS1[sb]),
                HS2.at[new_id].set(HS2[sa] * PS2[sb] + HS2[sb]),
                PS1.at[new_id].set(PS1[sa] * PS1[sb]),
                PS2.at[new_id].set(PS2[sa] * PS2[sb]),
                BF.at[new_id].set(bfn),
                BS.at[new_id].set(BS[sa] + BS[sb]),
            )
            id2len = id2len.at[new_id].set(new_len)
            merges = merges.at[k].set(jnp.stack([sa, sb, new_id]))

            words, D = merge_pass(words, sa, sb, new_id, new_len)
            C = C + jax.lax.psum(D, "data")

            best2, a2, b2 = _select(C, v_pad)
            return (words, C, id2len, hstate, next_id, merges, k + 1,
                    best2, a2, b2)

        best0, a0, b0 = _select(C, v_pad)
        merges0 = jnp.full((merge_cap, 3), -1, jnp.int32)
        hstate0 = (H1, H2, HS1, HS2, PS1, PS2, BF, BS)
        state = jax.lax.while_loop(
            cond, body,
            (ids, C, id2len, hstate0, next_id0, merges0, jnp.int32(0),
             best0, a0, b0),
        )
        return state[5], state[6]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")) + (P(),) * 14,
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded)


def train_dense(word_counts: Dict[str, int], cfg, word_to_id, id_to_word,
                words, counts, mesh: Mesh):
    """Run the device-resident loop; returns (merges [(a, b, new_id)], ok).

    `words`/`counts` are `cfg._tokenize_words` output; `word_to_id`/
    `id_to_word` already hold special tokens + alphabet.  `ok=False` means
    the configuration is out of this path's envelope (caller falls back)."""
    ndev = mesh.devices.size
    v_cap = max(cfg.vocab_size, len(id_to_word)) + 1
    if v_cap > DENSE_VCAP_MAX:
        return None, False
    maxw = max((len(w) for w, _ in words), default=1)
    ncol = 512
    while ncol < maxw:
        ncol <<= 1
    if ncol > 1 << 15:
        return None, False
    v_pad = -(-v_cap // 128) * 128

    ids, wid, wcnt = pack_corpus(words, counts, ncol, ndev)
    C0 = initial_pair_matrix(ids, wid, wcnt, v_cap, v_pad)
    prefix = cfg.continuing_subword_prefix or ""
    H1, H2, HS1, HS2, PS1, PS2, BF, BS = seed_hash_state(
        id_to_word, v_cap, prefix
    )
    id2len0 = np.ones(v_cap, np.int32)
    max_len = (
        cfg.max_token_length if cfg.max_token_length is not None else 1 << 30
    )
    merge_cap = max(1, cfg.vocab_size - len(id_to_word) + 8)
    # site cap: covers all but the most frequent merges; those rare rounds
    # take the full-width delta branch instead
    site_cap = min(8192, ids.size)
    k_steps = max(1, int(np.ceil(np.log2(max(2, maxw)))))

    train_fn = make_dense_train(mesh, v_cap, v_pad, merge_cap, site_cap,
                                k_steps)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    u32 = functools.partial(jax.device_put, device=repl)
    merges_arr, n = train_fn(
        jax.device_put(ids, shard), jax.device_put(wid, shard),
        jax.device_put(wcnt, shard),
        jax.device_put(C0, repl), jax.device_put(id2len0, repl),
        u32(H1), u32(H2), u32(HS1), u32(HS2), u32(PS1), u32(PS2),
        jax.device_put(BF, repl), jax.device_put(BS, repl),
        jnp.int32(len(id_to_word)), jnp.int32(min(max_len, 1 << 30)),
        jnp.int32(cfg.min_frequency), jnp.int32(cfg.vocab_size),
    )
    merges_np = np.asarray(jax.device_get(merges_arr))
    n = int(n)
    return [tuple(int(v) for v in merges_np[i]) for i in range(n)], True


def verify_merges(merges, cfg, word_to_id, id_to_word):
    """Replay minting on real strings; True iff every device id decision
    (hash-based reuse) matches exact string identity.  Mutates word_to_id/
    id_to_word to the final vocabulary as a side effect on success."""
    prefix = cfg.continuing_subword_prefix or ""
    for (sa, sb, nid) in merges:
        if sa >= len(id_to_word) or sb >= len(id_to_word):
            return False
        part_a = id_to_word[sa]
        part_b = id_to_word[sb]
        if prefix and part_b.startswith(prefix):
            part_b = part_b[len(prefix):]
        new_token = part_a + part_b
        expected = word_to_id.get(new_token, len(id_to_word))
        if nid != expected:
            return False
        if new_token not in word_to_id:
            id_to_word.append(new_token)
            word_to_id[new_token] = expected
    return True
