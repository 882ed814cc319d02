#!/usr/bin/env python
"""Measure the reference wheel's throughput on this host -> REF_BASELINE.json.

Run offline (NOT inside the timed bench): bench.py reads the cached
constants for its vs_baseline column.  Uses the same corpus/doc framing as
bench.py (8KB docs, ~32MB batch) and the same fixtures, so the comparison
is like-for-like on this machine.  The reference is driven exactly like
its own benches: `encode_batch_fast` with internal rayon threads
(`tokenizers/benches/llama3_benchmark.rs:16-62` analogue).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (doc framing + fixture paths)


def measure_encode(name, reps=3):
    from tokenizers import Tokenizer as Ref

    ref = Ref.from_file(bench.FIXTURES[name])
    docs = bench.build_docs()
    nbytes = sum(len(d.encode("utf-8")) for d in docs)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ref.encode_batch_fast(docs)
        best = min(best, time.perf_counter() - t0)
    bps = nbytes / best
    print(f"{name}: {bps/1e6:.1f} MB/s ({nbytes} bytes)", flush=True)
    return bps


def measure_train():
    from tokenizers import Tokenizer as Ref
    import tokenizers as hf

    corpus = open(bench.CORPUS, encoding="utf-8").read()[: 1 << 20]
    lines = corpus.splitlines()
    tok = Ref(hf.models.BPE())
    tok.pre_tokenizer = hf.pre_tokenizers.Whitespace()
    trainer = hf.trainers.BpeTrainer(vocab_size=512, show_progress=False)
    t0 = time.perf_counter()
    tok.train_from_iterator(lines, trainer)
    dt = time.perf_counter() - t0
    print(f"train 1MB/vocab512: {dt:.2f} s", flush=True)
    return dt


def main():
    out = {}
    for name in ("gpt2", "llama3", "bert", "unigram"):
        out[f"{name}_encode_bps"] = measure_encode(name)
    out["bpe_train_1mb_vocab512_s"] = measure_train()
    out["host"] = (
        "bench-container CPU (throttled); see BASELINE.md for the "
        "reference's stated numbers"
    )
    with open(os.path.join(REPO, "REF_BASELINE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("REF_BASELINE.json written", flush=True)


if __name__ == "__main__":
    main()
