"""Measure lowered-program size for the bench device programs.

Compile cost is a first-class performance axis of this architecture (the
reference's analogue is a one-time Rust build; ours is per-(shape, flags)
XLA compiles whose serialized executables must load fast on warm start).
This tool lowers each bench program at its canonical shape and reports the
StableHLO module size — a backend-independent proxy for compile cost that
CI can bound (tests/test_program_size.py).

Usage:
    python tools/program_size.py [--small]

`--small` uses a 1/16-scale shape (CI-speed); op counts scale ~1:1 with
the full shape because the graph is shape-polymorphic in all but the
unrolled schedules.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def lowered_stats(lowered):
    txt = lowered.as_text()
    n_ops = txt.count("\n")
    return len(txt), n_ops


def gpt2_scan(n_chunks, B, L, ascii_only, word_cache, fixture="gpt2"):
    import jax.numpy as jnp
    import numpy as np

    import jax
    from tokenizers_tpu.ops.bpe_encode import encode_program_scan
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(
        os.path.join(REPO, f"tests/fixtures/{fixture}/tokenizer.json")
    )
    eng = tok._get_device_engine()
    kwargs = eng._program_args()
    bufs = jax.ShapeDtypeStruct((n_chunks, B, L), jnp.uint8)
    lens = jax.ShapeDtypeStruct((n_chunks, B), jnp.int32)
    kw = dict(ascii_only=ascii_only, **kwargs)
    if word_cache:
        st = [
            jax.ShapeDtypeStruct((eng.WC_SLOTS, 4), jnp.int32),
            jax.ShapeDtypeStruct((eng.WC_CAP + 1,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.int32),
        ]
        kw.update(cache_rows=st[0], cache_buf=st[1], cache_p=st[2])
    else:
        kw.update(word_cache=False)
    return jax.jit(
        encode_program_scan,
        static_argnames=("boundary", "whole_word", "ascii_only", "word_cache"),
    ).lower(bufs, lens, **kw)


def wordpiece_scan(n_chunks, B, L):
    import jax.numpy as jnp

    import jax
    from tokenizers_tpu.ops.wordpiece_dedup import wordpiece_dedup_scan
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(
        os.path.join(REPO, "tests/fixtures/bert/tokenizer.json")
    )
    eng = tok._get_device_engine()
    kwargs = eng._dedup_args()
    bufs = jax.ShapeDtypeStruct((n_chunks, B, L), jnp.uint8)
    lens = jax.ShapeDtypeStruct((n_chunks, B), jnp.int32)
    st = [
        jax.ShapeDtypeStruct((eng.WC_SLOTS, 4), jnp.int32),
        jax.ShapeDtypeStruct((eng.WC_CAP + 1,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    ]
    import functools

    fn = functools.partial(wordpiece_dedup_scan, word_cache=True, **kwargs)
    return jax.jit(fn).lower(
        bufs, lens, cache_rows=st[0], cache_buf=st[1], cache_p=st[2]
    )


def unigram_scan(n_chunks, B, L):
    import jax.numpy as jnp

    import jax
    from tokenizers_tpu.ops.unigram_dedup import unigram_dedup_scan
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(
        os.path.join(REPO, "tests/fixtures/unigram/tokenizer.json")
    )
    eng = tok._get_device_engine()
    kwargs = eng._dedup_args()
    bufs = jax.ShapeDtypeStruct((n_chunks, B, L), jnp.uint8)
    lens = jax.ShapeDtypeStruct((n_chunks, B), jnp.int32)
    st = [
        jax.ShapeDtypeStruct((eng.WC_SLOTS, 4), jnp.int32),
        jax.ShapeDtypeStruct((eng.WC_CAP + 1,), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    ]
    import functools

    fn = functools.partial(unigram_dedup_scan, word_cache=True, **kwargs)
    return jax.jit(fn).lower(
        bufs, lens, cache_rows=st[0], cache_buf=st[1], cache_p=st[2]
    )


def main():
    small = "--small" in sys.argv
    B, L = (16, 8192) if small else (256, 8192)
    N = 2 if small else 16
    rows = []
    for name, fn in [
        ("gpt2_cold", lambda: gpt2_scan(N, B, L, True, False)),
        ("gpt2_cached", lambda: gpt2_scan(N, B, L, True, True)),
        ("gpt2_nonascii", lambda: gpt2_scan(1, B, L, False, False)),
        ("llama3", lambda: gpt2_scan(N, B, L, True, False, "llama3_128k")),
        ("bert", lambda: wordpiece_scan(N, B, L)),
        ("unigram", lambda: unigram_scan(N, B, L)),
    ]:
        try:
            nbytes, nops = lowered_stats(fn())
            rows.append((name, nbytes, nops))
            print(f"{name:16s} stablehlo={nbytes/1e6:8.2f} MB  lines={nops}",
                  flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
    return rows


if __name__ == "__main__":
    main()
