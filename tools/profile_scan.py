#!/usr/bin/env python
"""Per-stage breakdown of the REAL bench scan program (gpt2, ascii group).

Unlike tools/profile_expand.py — which re-composes the pipeline stages by
hand and therefore misses the cond/scan/carry structure the compiled
program actually executes — this drives `encode_program_scan` itself with
`profile_stop` early exits threaded through the real code path (the
checksum rides out in ntok so every truncated variant keeps the real
output signature).  Stage cost = difference between consecutive stops.
r5 origin: the hand-composed harness claimed 37.8 ms/chunk while the real
program measured 66.7 — the difference is exactly what this tool exists
to attribute.

Usage: python tools/profile_scan.py [--cached]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("TOKENIZERS_PARALLELISM", "true")
import resource

_h = resource.getrlimit(resource.RLIMIT_STACK)[1]
resource.setrlimit(resource.RLIMIT_STACK, (256 << 20, _h))

STOPS = [
    "bnd",
    "dlayout",
    "ubuf",
    "merge",
    "segs",
    "stats",
    "stream",
    "gather",
    "offs",
    "route",
    "fill",
    None,  # full program
]


def main():
    cached = "--cached" in sys.argv
    import jax
    import jax.numpy as jnp

    import bench as B
    from tokenizers_tpu.ops.bpe_encode import encode_program_scan
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(B.FIXTURES["gpt2"])
    eng = tok._get_device_engine()
    docs = B.build_docs()
    groups, nbytes = B._stage_groups(eng, docs)
    bufs = lens = None
    for b, l, ascii_only, shape in groups:
        if ascii_only:
            bufs, lens = b, l
    N = bufs.shape[0]
    kwargs = eng._program_args()
    gb = float(jnp.sum(lens)) / 1e6
    print(f"ascii group: N={N} {gb:.1f}MB text", flush=True)

    prev = 0.0
    for stop in STOPS:
        def run():
            if cached:
                st = eng._ensure_cache()
                out = encode_program_scan(
                    bufs, lens, ascii_only=True, cache_rows=st[0],
                    cache_buf=st[1], cache_p=st[2],
                    profile_stop=stop, **kwargs,
                )
                eng._wc = list(out[3])
            else:
                out = encode_program_scan(
                    bufs, lens, ascii_only=True, word_cache=False,
                    profile_stop=stop, **kwargs,
                )
            return int(jnp.sum(out[1]))

        t0 = time.time()
        run()
        compile_s = time.time() - t0
        best = 9e9
        for _ in range(3):
            if cached:
                eng._wc = None  # fresh epoch per rep: comparable stage work
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        ms = best * 1e3 / N
        print(
            f"{str(stop):10s} {ms:8.2f} ms/chunk  (+{ms - prev:7.2f})"
            f"   compile {compile_s:5.1f}s",
            flush=True,
        )
        prev = ms


if __name__ == "__main__":
    main()
