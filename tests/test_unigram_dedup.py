"""The dedup'd compensated-f32 Unigram program (ops/unigram_dedup.py, the
TPU fast path) must match the f64 dense oracle token-for-token — and the
host pipeline on rows the dense program itself can't handle (its
MAX_TOKENS_PER_WORD shift-loop cap doesn't apply to the reverse-scan
backtrack here).  Near-tie DP comparisons flag rows for host fallback, so
every surviving row is bit-exact (reference `unigram/model.rs:240-329`)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tokenizers_tpu.ops.packing import pack_batch  # noqa: E402
from tokenizers_tpu.tokenizer import Tokenizer  # noqa: E402

UNIGRAM = "tests/fixtures/unigram/tokenizer.json"


def _lines():
    lines = [
        l
        for l in open("tests/fixtures/corpus.txt").read().split("\n")
        if l
    ][:32]
    lines += [
        "",
        "   ",
        "hello world",
        "a",
        "ninety-nine bottles",
        "日本語のテキストです",
        "mixed 日本語 and english",
        "x" * 200,  # 200-byte word: beyond UD_SLACK -> host flag
        "the the the the the the",  # heavy dedup
    ]
    return lines


def _check(p_ids, p_ntok, p_bad, dense, orig, lines, tok):
    d_ids, d_ntok, d_bad = (np.asarray(x) for x in dense)
    n_flagged = 0
    for r, i in enumerate(orig):
        if p_bad[r]:
            n_flagged += 1
            continue
        if d_bad[r]:
            # dense oracle bails (per-word token cap) but the dedup path
            # handles it: compare against the host pipeline directly
            ref = tok.encode(lines[i], add_special_tokens=False).ids
            assert p_ids[r, : p_ntok[r]].tolist() == ref, repr(lines[i])
            continue
        assert d_ntok[r] == p_ntok[r], (repr(lines[i]), d_ntok[r], p_ntok[r])
        n = d_ntok[r]
        np.testing.assert_array_equal(
            d_ids[r, :n], p_ids[r, :n], err_msg=repr(lines[i])
        )
    return n_flagged


def test_dedup_matches_dense_oracle():
    from tokenizers_tpu.ops.unigram_dedup import unigram_dedup_program

    tok = Tokenizer.from_file(UNIGRAM)
    eng = tok._get_device_engine()
    assert eng is not None

    lines = _lines()
    byte_strings = [eng._prepare(s) for s in lines]
    total_flagged = 0
    for buf, lengths, orig in pack_batch(byte_strings):
        with jax.enable_x64():
            dense = eng._program_x64(buf, lengths)
        dd = unigram_dedup_program(buf, lengths, **eng._dedup_args())
        p_ids, p_ntok, p_bad = (np.asarray(x) for x in dd)
        total_flagged += _check(
            p_ids, p_ntok, p_bad, dense, orig, lines, tok
        )
    # only the >UD_SLACK word may fall back on this corpus
    assert total_flagged <= 1


def test_dedup_scan_with_cache_matches_dense():
    from tokenizers_tpu.ops.unigram_dedup import unigram_dedup_scan

    tok = Tokenizer.from_file(UNIGRAM)
    eng = tok._get_device_engine()
    assert eng is not None

    lines = [
        l
        for l in open("tests/fixtures/corpus.txt").read().split("\n")
        if l and len(l) < 400
    ][:48]
    byte_strings = [eng._prepare(s) for s in lines]
    chunks = pack_batch(byte_strings)
    shapes = {}
    for buf, lens, orig in chunks:
        shapes.setdefault(buf.shape, []).append((buf, lens, orig))
    shape, items = max(shapes.items(), key=lambda kv: len(kv[1]))
    bufs = np.stack([b for b, _, _ in items] * 2)
    lens = np.stack([l for _, l, _ in items] * 2)

    st = eng._ensure_cache()
    ids, ntok, bad, st2 = unigram_dedup_scan(
        bufs, lens, word_cache=True, cache_rows=st[0], cache_buf=st[1],
        cache_p=st[2], **eng._dedup_args(),
    )
    ids, ntok, bad = np.asarray(ids), np.asarray(ntok), np.asarray(bad)
    for k, (buf, lens_k, orig) in enumerate(
        [(b, l, o) for (b, l, o) in items] * 2
    ):
        with jax.enable_x64():
            dense = eng._program_x64(buf, lens_k)
        _check(ids[k], ntok[k], bad[k], dense, orig, lines, tok)
