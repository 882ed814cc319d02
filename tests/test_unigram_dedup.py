"""The dedup'd compensated-f32 Unigram program (ops/unigram_dedup.py, the
TPU fast path) must match the f64 dense oracle token-for-token.  Words the
device cannot finish exactly — near-tie DP comparisons, words over the
UD_SLACK packing bound — surface as PER-WORD patch records (r5): the host
re-encodes just those words and splices at the recorded token offset, so
whole rows no longer fall back for one word.  Every surviving row is
bit-exact vs the reference (`unigram/model.rs:240-329`)."""

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
        "x" * 200,  # 200-byte word: beyond UD_SLACK -> patch record
        "the the the the the the",  # heavy dedup
    ]
    return lines


def _row_patches(ptab, nflag):
    """{row: [records]} from a chunk's patch table."""
    ptab = np.asarray(ptab)
    n = int(nflag)
    out: dict = {}
    if 0 < n <= ptab.shape[0]:
        for rec in ptab[:n]:
            out.setdefault(int(rec[0]), []).append(rec)
    return out


def _check(p_ids, p_ntok, p_bad, patches, dense, orig, lines, tok, eng,
           byte_strings):
    d_ids, d_ntok, d_bad = (np.asarray(x) for x in dense)
    n_flagged = 0
    n_patched = 0
    for r, i in enumerate(orig):
        if p_bad[r]:
            n_flagged += 1
            continue
        ids = p_ids[r, : p_ntok[r]]
        recs = patches.get(r)
        if recs:
            ids = eng._apply_patches(byte_strings[r], ids, recs)
            assert ids is not None, repr(lines[i])
            n_patched += len(recs)
        ref = tok.encode(lines[i], add_special_tokens=False).ids
        assert ids.tolist() == ref, repr(lines[i])
        if not d_bad[r] and not recs:
            # un-patched rows must equal the dense oracle exactly
            assert d_ntok[r] == p_ntok[r], (repr(lines[i]),)
            np.testing.assert_array_equal(
                d_ids[r, : d_ntok[r]], ids, err_msg=repr(lines[i])
            )
    return n_flagged, n_patched


def test_dedup_matches_dense_oracle():
    from tokenizers_tpu.ops.unigram_dedup import unigram_dedup_program

    tok = Tokenizer.from_file(UNIGRAM)
    eng = tok._get_device_engine()
    assert eng is not None

    lines = _lines()
    byte_strings = [eng._prepare(s) for s in lines]
    total_flagged = 0
    total_patched = 0
    for buf, lengths, orig in pack_batch(byte_strings):
        with jax.enable_x64():
            dense = eng._program_x64(buf, lengths)
        dd = unigram_dedup_program(buf, lengths, **eng._dedup_args())
        p_ids, p_ntok, p_bad, ptab, nflag = (np.asarray(x) for x in dd)
        nf, npatch = _check(
            p_ids, p_ntok, p_bad, _row_patches(ptab, nflag), dense, orig,
            lines, tok, eng, [byte_strings[i] for i in orig],
        )
        total_flagged += nf
        total_patched += npatch
    # the >UD_SLACK word patches (host splice) — NO whole-row fallback
    assert total_flagged == 0
    assert total_patched >= 1


def test_engine_run_device_applies_patches():
    """The engine path end-to-end: _run_device splices patch records and
    returns host-exact ids with no bad rows on this corpus."""
    tok = Tokenizer.from_file(UNIGRAM)
    eng = tok._get_device_engine()
    assert eng is not None
    eng._use_dedup = lambda: True  # CPU default is the x64 dense path

    from tokenizers_tpu.ops import engine_base

    engine_base.STATS.reset()
    lines = _lines()
    byte_strings = [eng._prepare(s) for s in lines]
    results, bad = eng._run_device(byte_strings)
    assert bad == []
    for i, s in enumerate(lines):
        ref = tok.encode(s, add_special_tokens=False).ids
        assert results[i].tolist() == ref, repr(s)
    assert engine_base.STATS.patched_words >= 1  # the 200-byte word


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
    ids, ntok, bad, ptab, nflag, st2 = unigram_dedup_scan(
        bufs, lens, word_cache=True, cache_rows=st[0], cache_buf=st[1],
        cache_p=st[2], **eng._dedup_args(),
    )
    ids, ntok, bad = np.asarray(ids), np.asarray(ntok), np.asarray(bad)
    for k, (buf, lens_k, orig) in enumerate(
        [(b, l, o) for (b, l, o) in items] * 2
    ):
        with jax.enable_x64():
            dense = eng._program_x64(buf, lens_k)
        _check(
            ids[k], ntok[k], bad[k], _row_patches(ptab[k], nflag[k]),
            dense, orig, lines, tok, eng, [byte_strings[i] for i in orig],
        )
