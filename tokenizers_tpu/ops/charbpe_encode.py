"""TPU char-level BPE encode: the non-byte-level BPE pipeline family.

One jitted program over packed uint8[B, L] byte batches covering the
reference configurations whose initial symbols are *characters* (possibly
with affixes), not bytes (`models/bpe/model.rs:382-460` `merge_word`):

  * **Whitespace/WhitespaceSplit/Bert + BPE** — e.g. tokenizers trained
    with `pre_tokenizers.Whitespace` and the `CharBPETokenizer` recipe
    (`bindings/python/py_src/tokenizers/implementations/char_level_bpe.py`).
  * **Metaspace + BPE** — the `SentencePieceBPETokenizer` recipe
    (`implementations/sentencepiece_bpe.py`): space -> `▁` replacement +
    optional prepend happen *on device* (byte expansion with scatters, as
    in `unigram_encode.py` stage 1), so long-document seam splitting keeps
    working on the raw byte stream.

Per-word symbol seeding mirrors `merge_word` exactly:

  1. each char becomes the vocab id of its affixed string — `prefix+c` for
     non-initial chars when `continuing_subword_prefix` is set, `c+suffix`
     for final chars when `end_of_word_suffix` is set (both for a
     non-initial final char) — via a two-stage codepoint -> [4 variant ids]
     table (one gather; misses are -1);
  2. a missing char falls back to per-byte `<0xXX>` ids when
     `byte_fallback` and all its bytes exist (affixed configs are gated
     out at build: the reference falls back on the *affixed* string's
     bytes, which no real config relies on);
  3. else `unk_token` (consecutive unk chars fuse to the first when
     `fuse_unk`, reference unk-flush behavior falls out of positional
     order); with no unk_token the char is dropped silently.

The merge loop itself is the shared `run_merge_phases` — merges operate on
ids, so char-level seeding composes with the same safe-set rounds as the
byte-level engine.  Output is ids-only (offset requests take the host
path; these configs are not offset benchmarks).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .bpe_encode import take256
from .bpe_merge2 import WORD_CAP, _shift_next, fill_prev, run_merge_phases
from .unicode_tables import MAX_CP, PAGE_BITS
from .wordlevel_encode import WL_END, WL_PUNCT, WL_WS, wordlevel_class_tables
from .wordpiece_encode import _decode_chars

# char emit kinds
K_KNOWN = 0
K_FB = 1
K_UNK = 2
K_DROP = 3

META = (0xE2, 0x96, 0x81)  # '▁'


def build_char_id_tables(vocab, prefix, suffix):
    """Two-stage codepoint -> [plain, prefix, suffix, prefix+suffix] vocab
    ids (-1 = miss).  Absent affixes collapse to the un-affixed column so
    the device variant select needs no config branches."""
    plain = {}
    pre = {}
    suf = {}
    presuf = {}
    lp = len(prefix) if prefix else 0
    ls = len(suffix) if suffix else 0
    for key, tid in vocab.items():
        if len(key) == 1:
            plain[ord(key)] = tid
        if prefix and key.startswith(prefix) and len(key) == lp + 1:
            pre[ord(key[lp])] = tid
        if suffix and key.endswith(suffix) and len(key) == ls + 1:
            suf[ord(key[0])] = tid
        if (
            prefix
            and suffix
            and key.startswith(prefix)
            and key.endswith(suffix)
            and len(key) == lp + ls + 1
        ):
            presuf[ord(key[lp])] = tid
    if not prefix:
        pre = plain
        presuf = suf
    if not suffix:
        suf = plain
        presuf = pre
    if not prefix and not suffix:
        presuf = plain

    cols = [plain, pre, suf, presuf]
    used = sorted({cp >> PAGE_BITS for col in cols for cp in col})
    page_of = np.zeros(MAX_CP >> PAGE_BITS, np.int32)  # 0 = all-miss page
    for i, p in enumerate(used):
        page_of[p] = i + 1
    s2 = np.full(((len(used) + 1) << PAGE_BITS, 4), -1, np.int32)
    for c, col in enumerate(cols):
        for cp, tid in col.items():
            s2[(page_of[cp >> PAGE_BITS] << PAGE_BITS) | (cp & 255), c] = tid
    return page_of, s2


def metaspace_expand(b, inb, lengths, prepend, split):
    """Device Metaspace: space -> ▁ (3 bytes) with optional prepend.

    Returns (nb int32[B, L2], ninb, total, wbnd, overflow) — wbnd marks
    word-head bytes (each ▁, original or replaced, plus the text start).
    Reference `pre_tokenizers/metaspace.rs:123-147`: replace first, then
    prepend only when the replaced text does not start with ▁."""
    B, L = b.shape
    L2 = L * 2 + 4
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)

    space = inb & (b == 0x20)
    out_len = jnp.where(inb, jnp.where(space, 3, 1), 0)
    # original ▁ chars: 0xE2 followed by 0x96 0x81
    b1 = _shift_next(b, 0)
    b2 = _shift_next(b, 0, 2)
    orig_meta = inb & (b == META[0]) & (b1 == META[1]) & (b2 == META[2])

    first_b = jnp.take_along_axis(
        b, jnp.zeros((B, 1), jnp.int32), axis=1
    )[:, 0]
    starts_meta = (first_b == 0x20) | (
        jnp.take_along_axis(orig_meta, jnp.zeros((B, 1), jnp.int32), axis=1)[
            :, 0
        ]
    )
    do_prepend = prepend & (lengths > 0) & ~starts_meta
    base = jnp.where(do_prepend, 3, 0)

    opos = base[:, None] + jnp.cumsum(out_len, axis=1) - out_len
    total = base + jnp.sum(out_len, axis=1)
    overflow = total > L2

    JUNK = L2 + 3
    nb = jnp.zeros((B, L2 + 4), jnp.uint8)
    for k, v in enumerate(META):
        nb = nb.at[:, k].set(
            jnp.where(do_prepend, np.uint8(v), nb[:, k])
        )
    for k, v in enumerate(META):
        tgt = jnp.where(space, opos + k, JUNK)
        nb = nb.at[rows, tgt].set(
            jnp.where(space, np.uint8(v), 0), mode="drop"
        )
    copy = inb & ~space
    tgt = jnp.where(copy, opos, JUNK)
    nb = nb.at[rows, tgt].set(
        jnp.where(copy, b, 0).astype(jnp.uint8), mode="drop"
    )

    wbnd = jnp.zeros((B, L2 + 4), bool)
    if split:
        head = space | orig_meta
        wbnd = wbnd.at[rows, jnp.where(head, opos, JUNK)].max(
            head, mode="drop"
        )
        wbnd = wbnd.at[:, 0].max(do_prepend | (lengths > 0))
    else:
        wbnd = wbnd.at[:, 0].max(lengths > 0)

    nb = nb[:, :L2].astype(jnp.int32)
    wbnd = wbnd[:, :L2]
    npos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)
    ninb = npos < total[:, None]
    nb = jnp.where(ninb, nb, 0)
    wbnd = wbnd & ninb
    return nb, ninb, total, wbnd, overflow


def wl_boundaries(b, inb, lengths, cls_s1, cls_s2):
    """Word-head / word-byte masks for the wordlevel-style pre-splits
    (whitespace, whitespace_split, bert) — same rule as
    `wordlevel_encode.wordlevel_program`."""
    B, L = b.shape
    cp, is_start, _ = _decode_chars(b, inb)
    from .merge_table import take_row8

    page = take_row8(cp >> PAGE_BITS, cls_s1)
    cls = take_row8(
        (page << PAGE_BITS) | (cp & ((1 << PAGE_BITS) - 1)), cls_s2
    ).astype(
        jnp.int32
    )
    f = jnp.where(is_start, cls, -1)
    for _ in range(3):
        f = jnp.where(
            f >= 0,
            f,
            jnp.concatenate(
                [jnp.full((B, 1), -1, jnp.int32), f[:, :-1]], axis=1
            ),
        )
    cls_fill = jnp.where(inb, f, WL_END)
    is_ws = inb & (cls_fill == WL_WS)
    is_word_b = inb & ~is_ws
    prev_cls = jnp.concatenate(
        [jnp.full((B, 1), WL_END, jnp.int32), cls_fill[:, :-1]], axis=1
    )
    bnd = (
        is_start
        & is_word_b
        & (
            (prev_cls == WL_WS)
            | (prev_cls == WL_END)
            | (cls != prev_cls)
            | (cls == WL_PUNCT)
        )
    )
    return bnd, is_word_b


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind",
        "byte_fallback",
        "has_unk",
        "fuse_unk",
        "prepend",
        "split",
        "with_offsets",
    ),
)
def charbpe_program(
    bytes_u8,
    lengths,
    id_s1,
    id_s2,
    fb256,
    unk_id,
    merge_rows0,
    merge_rows1,
    seed,
    merge_mclr,
    cls_s1=None,
    cls_s2=None,
    kind="whitespace",
    byte_fallback=False,
    has_unk=True,
    fuse_unk=False,
    prepend=True,
    split=True,
    with_offsets=False,
):
    """-> (ids int32[B, OUT], ntok int32[B], row_bad bool[B]); with
    `with_offsets`, additionally (starts, ends, words) byte spans in the
    prepared (host-normalized, and for kind="metaspace_pre" pre-expanded)
    text plus per-token word ids."""
    B, L = bytes_u8.shape
    b = bytes_u8.astype(jnp.int32)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    inb0 = pos0 < lengths[:, None]
    b = jnp.where(inb0, b, 0)

    if kind == "metaspace":
        b, inb, total, bnd, overflow = metaspace_expand(
            b, inb0, lengths, prepend, split
        )
        is_word_b = inb
    elif kind == "metaspace_pre":
        # offsets path: the ' '->▁ replacement (+ prepend) already ran
        # host-side on a NormalizedString (exact alignments), so the text
        # arrives pre-expanded; words start at each ▁ plus the text start
        b1m = _shift_next(b, 0)
        b2m = _shift_next(b, 0, 2)
        is_meta = (
            inb0 & (b == META[0]) & (b1m == META[1]) & (b2m == META[2])
        )
        if split:
            bnd = (is_meta | (pos0 == 0)) & inb0
        else:
            bnd = (pos0 == 0) & (lengths[:, None] > 0)
        inb = inb0
        total = lengths
        is_word_b = inb
        overflow = jnp.zeros((B,), bool)
    elif kind == "none":
        # no pre-tokenizer (Llama-2 SPM shape): the whole text is one
        # segment.  Gated at build on complete <0x00>..<0xFF> coverage, so
        # seeding never fuses unk runs and intra-segment dead gaps stay
        # bounded by the longest vocab piece (build also checks <= WORD_CAP)
        inb = inb0
        total = lengths
        bnd = (pos0 == 0) & (lengths[:, None] > 0)
        is_word_b = inb
        overflow = jnp.zeros((B,), bool)
    else:
        bnd, is_word_b = wl_boundaries(b, inb0, lengths, cls_s1, cls_s2)
        inb = inb0
        total = lengths
        overflow = jnp.zeros((B,), bool)
    B2, L2 = b.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L2), 1)

    cp, is_start, charlen = _decode_chars(b, inb)
    cstart = is_start & is_word_b

    # ---- word extents ------------------------------------------------
    BIGP = jnp.int32(0x7FFFFFFF)
    nbp = jax.lax.cummin(jnp.where(bnd, pos, BIGP), axis=1, reverse=True)
    nxt_bnd = _shift_next(nbp, BIGP)
    # last word byte before the next head (word bytes are contiguous from
    # the head in every supported kind)
    wb_inc = jnp.cumsum(is_word_b.astype(jnp.int32), axis=1)
    bnd_end = jnp.minimum(nxt_bnd, total[:, None])  # exclusive scan bound
    wlen_at_head = (
        jnp.take_along_axis(
            wb_inc, jnp.clip(bnd_end - 1, 0, L2 - 1), axis=1
        )
        - wb_inc
        + is_word_b.astype(jnp.int32)
    )  # word byte count, valid at head positions
    if kind == "none":
        # unbounded segment: dead gaps are capped by the longest vocab
        # piece instead (checked <= WORD_CAP at build)
        row_bad = overflow
    else:
        row_bad = jnp.any(bnd & (wlen_at_head > WORD_CAP), axis=1) | overflow
    wend = jnp.where(bnd, pos + wlen_at_head, 0)  # exclusive word end

    def op_fill(x, y):
        (v1,), (v2,) = x, y
        return (jnp.where(v2 > 0, v2, v1),)

    (wend_f,) = jax.lax.associative_scan(
        op_fill, (jnp.where(bnd, wend, 0),), axis=1
    )

    # ---- per-char variant + id lookup ---------------------------------
    is_first = cstart & bnd  # word head char (heads are char starts)
    is_last = cstart & ((pos + charlen) >= wend_f)
    variant = (
        jnp.where(is_first, 0, 1) + jnp.where(is_last, 2, 0)
    )  # 0=plain 1=prefix 2=suffix 3=prefix+suffix
    from .merge_table import take_row8

    page = take_row8(cp >> PAGE_BITS, id_s1)
    vrow = id_s2[(page << PAGE_BITS) | (cp & ((1 << PAGE_BITS) - 1))]
    cid = jnp.take_along_axis(vrow, variant[..., None], axis=-1)[..., 0]
    cid = jnp.where(cstart, cid, -1)

    # ---- miss handling: byte_fallback -> unk -> drop -------------------
    known = cstart & (cid >= 0)
    if byte_fallback:
        fb = take256(b, fb256)
        fb_ok_b = fb >= 0
        # all bytes of the char present?
        ok = fb_ok_b
        for k in range(1, 4):
            ok = ok & (_shift_next(fb_ok_b, True, k) | (charlen <= k))
        fb_char = cstart & ~known & ok
    else:
        fb_char = jnp.zeros_like(known)

    if has_unk:
        unk_char = cstart & ~known & ~fb_char
    else:
        unk_char = jnp.zeros_like(known)

    kind_c = jnp.where(
        known,
        K_KNOWN,
        jnp.where(fb_char, K_FB, jnp.where(unk_char, K_UNK, K_DROP)),
    )

    wid = jnp.where(
        is_word_b, jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1, -1
    )

    if has_unk and fuse_unk:
        (pk, pw), pf = fill_prev([kind_c, wid], cstart, k_steps=10)
        fused = unk_char & pf & (pw == wid) & (pk == K_UNK)
        unk_char = unk_char & ~fused

    ids0 = jnp.where(known, cid, -1)
    ids0 = jnp.where(unk_char, unk_id, ids0)
    if byte_fallback:
        # every byte of a fallback char emits its <0xXX> id
        fbm = jnp.where(cstart, fb_char.astype(jnp.int32), -1)

        def op_f(x, y):
            (v1,), (v2,) = x, y
            return (jnp.where(v2 >= 0, v2, v1),)

        (fb_fill,) = jax.lax.associative_scan(op_f, (fbm,), axis=1)
        in_fb = (fb_fill == 1) & is_word_b
        ids0 = jnp.where(in_fb, fb, ids0)

    # ---- merge + pack ---------------------------------------------------
    # k_min=9: char-level seeding leaves dead runs up to WORD_CAP inside
    # words (fused unk, dropped chars), so every phase-1 round must see the
    # full fill horizon (see run_merge_phases docstring)
    obp0 = pos if with_offsets else None
    ids, wid2, bad2, obp2 = run_merge_phases(
        ids0, wid, merge_rows0, merge_rows1, seed, merge_mclr, k_min=9,
        obp=obp0,
    )
    row_bad = row_bad | bad2

    out_w = ids.shape[1]
    alive = ids >= 0
    k = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    ntok = jnp.where(alive, k + 1, 0).max(axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    tgt = jnp.where(alive, k, out_w)

    def pack(x, fill=-1):
        return (
            jnp.full((B, out_w + 1), fill, jnp.int32)
            .at[rows, tgt]
            .set(jnp.where(alive, x, fill))[:, :out_w]
        )

    packed = pack(ids)
    row_bad = row_bad | (ntok > out_w)
    if not with_offsets:
        return packed, ntok, row_bad

    # token spans: start = kept (left) byte position; end = next token's
    # start when same word, else the word's exclusive end (the byte-level
    # BPE engine's rule, bpe_encode._encode_core)
    starts = pack(obp2, 0)
    wids_out = pack(wid2, -2)
    nstarts = _shift_next(starts, 0)
    nwids = _shift_next(wids_out, -3)
    tok_pos = jax.lax.broadcasted_iota(jnp.int32, starts.shape, 1)
    in_tok = tok_pos < ntok[:, None]
    wend_at = jnp.take_along_axis(
        wend_f, jnp.clip(starts, 0, L2 - 1), axis=1
    )
    ends = jnp.where(
        in_tok & (nwids == wids_out) & _shift_next(in_tok, False),
        nstarts,
        wend_at,
    )
    ends = jnp.where(in_tok, ends, 0)
    starts = jnp.where(in_tok, starts, 0)
    wids_out = jnp.where(in_tok, wids_out, -1)
    return packed, ntok, row_bad, starts, ends, wids_out
