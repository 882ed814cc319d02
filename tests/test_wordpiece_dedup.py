"""The dedup'd WordPiece program (ops/wordpiece_dedup.py, the off-CPU
ASCII path) must match the dense oracle program token-for-token on the
fixture corpus and edge cases."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tokenizers_tpu.ops.packing import pack_batch
from tokenizers_tpu.tokenizer import Tokenizer

BERT = "tests/fixtures/bert/tokenizer.json"


def test_dedup_matches_dense():
    from tokenizers_tpu.ops.wordpiece_dedup import wordpiece_dedup_program

    tok = Tokenizer.from_file(BERT)
    eng = tok._get_device_engine()
    assert eng is not None and eng.ascii_ok

    lines = [
        l
        for l in open("tests/fixtures/corpus.txt").read().split("\n")
        if l and l.isascii()
    ][:48]
    lines += [
        "",
        "   ",
        "a",
        "hello world!",
        "unbelievable transformations",
        "x" * 600,  # word over WORD_CAP: whole row -> host flag
        "zzqqy zzqqy unmatchablezzz",  # repeated + [UNK] words
        "a.b.c!d?e",  # punctuation isolation
        "the the the the the the",  # heavy dedup
    ]
    byte_strings = [eng._prepare(s) for s in lines]
    for buf, lengths, orig in pack_batch(byte_strings):
        dense = eng._run(buf, lengths, False)
        dd = wordpiece_dedup_program(
            buf,
            lengths,
            eng.d_ascii_nb,
            eng.d_ascii_cls,
            eng.d_vrows0,
            eng.d_vrows1,
            eng.vseed,
            eng.d_pow1,
            eng.d_pow2,
            eng.unk_id,
            max_len=eng.max_len,
            max_word_chars=eng.max_word_chars,
        )
        d_ids, d_ntok, d_bad = (np.asarray(x) for x in dense)
        p_ids, p_ntok, p_bad = (np.asarray(x) for x in dd)
        for r, i in enumerate(orig):
            if p_bad[r]:
                continue  # dedup path may host-flag rows the dense handles
            assert not d_bad[r], lines[i]
            assert d_ntok[r] == p_ntok[r], (lines[i], d_ntok[r], p_ntok[r])
            n = d_ntok[r]
            np.testing.assert_array_equal(
                d_ids[r, :n], p_ids[r, :n], err_msg=repr(lines[i])
            )


def test_dedup_scan_with_cache_matches_dense():
    """The scan-batched program (one dispatch, word cache as carry) must
    match the dense oracle across chunks — including chunk k reading cache
    hits written by chunks < k, and a second warm pass."""
    import jax.numpy as jnp

    from tokenizers_tpu.ops.wordpiece_dedup import wordpiece_dedup_scan

    tok = Tokenizer.from_file(BERT)
    eng = tok._get_device_engine()
    assert eng is not None and eng.ascii_ok

    lines = [
        l
        for l in open("tests/fixtures/corpus.txt").read().split("\n")
        if l and l.isascii() and len(l) < 500
    ][:64]
    byte_strings = [eng._prepare(s) for s in lines]
    chunks = pack_batch(byte_strings)
    # stack the same-shape chunks; repeat them so later scan steps hit the
    # cache entries written by earlier ones
    shapes = {}
    for buf, lens, orig in chunks:
        shapes.setdefault(buf.shape, []).append((buf, lens, orig))
    (shape, items) = max(shapes.items(), key=lambda kv: len(kv[1]))
    bufs = np.stack([b for b, _, _ in items] * 2)
    lens = np.stack([l for _, l, _ in items] * 2)
    origs = [o for _, _, o in items] * 2

    st = eng._ensure_cache()
    ids, ntok, bad, st2 = wordpiece_dedup_scan(
        bufs, lens, word_cache=True, cache_rows=st[0], cache_buf=st[1],
        cache_p=st[2], **eng._dedup_args(),
    )
    eng._wc = list(st2)
    # warm second pass: everything should come from the cache
    ids2, ntok2, bad2, st3 = wordpiece_dedup_scan(
        jnp.asarray(bufs), jnp.asarray(lens), word_cache=True,
        cache_rows=eng._wc[0], cache_buf=eng._wc[1], cache_p=eng._wc[2],
        **eng._dedup_args(),
    )

    for pass_ids, pass_ntok, pass_bad in (
        (np.asarray(ids), np.asarray(ntok), np.asarray(bad)),
        (np.asarray(ids2), np.asarray(ntok2), np.asarray(bad2)),
    ):
        for k, (buf, lens_k, orig) in enumerate(
            [(b, l, o) for (b, l, o) in items] * 2
        ):
            dense = eng._run(buf, lens_k, False)
            d_ids, d_ntok, d_bad = (np.asarray(x) for x in dense)
            for r in range(len(orig)):
                if pass_bad[k][r]:
                    continue
                assert d_ntok[r] == pass_ntok[k][r]
                n = d_ntok[r]
                np.testing.assert_array_equal(
                    d_ids[r, :n], pass_ids[k][r, :n]
                )
