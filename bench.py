#!/usr/bin/env python
"""Benchmark: per-chip device-engine throughput on the five BASELINE configs.

Prints one JSON line per config:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
The FLAGSHIP line (gpt2 byte-level BPE batch encode, the BASELINE.json
headline metric) is printed LAST so tail-parsers pick it up.

Timing methodology
------------------
Encode configs time the compiled device program over pre-staged ~32MB of
packed corpus resident on the chip — the serving configuration where token
ids feed a model without leaving the device.  Completion is forced by
fetching a device-side reduction scalar (`block_until_ready` does not await
execution on the tunneled axon backend).  The gpt2 flagship number runs the
chunk-scan program WITHOUT the persistent word cache (cold words; intra-
chunk dedup only — same work the reference does with its own cache off);
the `_cached` line reports the warm serving path (persistent cache carry,
analogous to the reference's always-on 10k-entry word cache).

vs_baseline: against the stronger of (a) the reference README's stated
1GB-in-<20s => 50 MB/s on a server CPU (`/root/reference/README.md:22-23`)
and (b) the installed reference wheel measured on this host (the host CPU
here is heavily throttled; the wheel manages ~6 MB/s).

Stage breakdown for the perf writeup: run `python bench.py --breakdown`
(see PERF.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("TOKENIZERS_PARALLELISM", "true")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CORPUS = os.path.join(REPO, "tests/fixtures/corpus.txt")
FIXTURES = {
    "gpt2": os.path.join(REPO, "tests/fixtures/gpt2/tokenizer.json"),
    "llama3": os.path.join(REPO, "tests/fixtures/llama3/tokenizer.json"),
    "bert": os.path.join(REPO, "tests/fixtures/bert/tokenizer.json"),
    "unigram": os.path.join(REPO, "tests/fixtures/unigram/tokenizer.json"),
}

DOC_BYTES = 8 * 1024
TARGET_BATCH_BYTES = 1 << 25  # ~32 MB of text per timed batch
REF_STATED = 50e6  # README: 1 GB in "less than 20 seconds" on a server CPU


def emit(metric, value, unit, vs):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": value,
                "unit": unit,
                "vs_baseline": vs,
            }
        ),
        flush=True,
    )


def build_docs(target=TARGET_BATCH_BYTES):
    text = open(CORPUS, encoding="utf-8").read()
    while len(text.encode("utf-8")) < target * 1.1:
        text += text
    data = text.encode("utf-8")
    docs = []
    total = 0
    off = 0
    while off + DOC_BYTES <= len(data) and total < target:
        chunk = data[off : off + DOC_BYTES]
        while chunk and (chunk[-1] & 0xC0) == 0x80:  # cut at UTF-8 boundary
            chunk = chunk[:-1]
        if chunk and chunk[-1] >= 0xC0:  # dangling lead byte
            chunk = chunk[:-1]
        docs.append(chunk.decode("utf-8"))
        total += len(chunk)
        off += len(chunk)  # keep successive docs on char boundaries
    return docs


def _stage_chunks(eng, docs):
    """Pack docs through the engine's prepare step and stage on device."""
    import jax
    import numpy as np

    from tokenizers_tpu.ops.packing import pack_batch

    byte_strings = [eng._prepare(s) for s in docs]
    nbytes = sum(len(b) for b in byte_strings)
    chunks = pack_batch(byte_strings)
    staged = []
    for buf, lens, _ in chunks:
        staged.append(
            (
                jax.device_put(buf),
                jax.device_put(lens),
                bool(isinstance(buf, np.ndarray) and buf.max(initial=0) < 128),
                buf.shape,
            )
        )
    jax.block_until_ready([s[0] for s in staged])
    return staged, nbytes


def _time_reps(run, reps=5):
    t0 = time.perf_counter()
    run()  # warmup / compile
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()  # first timed rep also calibrates how many reps we can afford
    first = time.perf_counter() - t0
    best = first
    reps = max(0, min(reps - 1, int(45.0 / max(first, 1e-3)) - 1))
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_bpe_scan(name, word_cache, _retry=True):
    """gpt2/llama3 byte-level BPE via the chunk-scan program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tokenizers_tpu.ops.bpe_encode import encode_program_scan
    from tokenizers_tpu.tokenizer import Tokenizer

    if _retry:
        try:
            return bench_bpe_scan(name, word_cache, _retry=False)
        except Exception as e:  # pragma: no cover - bench resilience
            # Mosaic failure at real shapes: downgrade to the lax rounds
            # (bit-identical, slower) and mark the probe cache so future
            # processes skip the broken path too.
            from tokenizers_tpu.ops import merge_pallas

            if not merge_pallas.use_pallas():
                raise
            print(f"# pallas path failed ({type(e).__name__}); retrying lax",
                  file=sys.stderr, flush=True)
            merge_pallas._backend_ok = False
            try:
                with open(merge_pallas._probe_marker(), "w") as f:
                    f.write("0")
            except OSError:
                pass
            return bench_bpe_scan(name, word_cache, _retry=False)

    tok = Tokenizer.from_file(FIXTURES[name])
    eng = tok._get_device_engine()
    assert eng is not None, f"{name}: device engine failed to build"

    docs = build_docs()
    staged, nbytes = _stage_chunks(eng, docs)
    # group same-(shape, ascii) chunks for the scan program
    groups = {}
    for b, l, ascii_only, shape in staged:
        groups.setdefault((shape, ascii_only), []).append((b, l))
    kwargs = eng._program_args()

    @jax.jit
    def reduce_out(acc, ntok):
        return acc + jnp.sum(ntok)

    def run():
        acc = jnp.int32(0)
        for (shape, ascii_only), items in groups.items():
            bufs = jnp.stack([b for b, _ in items])
            lens = jnp.stack([l for _, l in items])
            if word_cache:
                st = eng._ensure_cache()
                ids, ntok, bad, st2 = encode_program_scan(
                    bufs,
                    lens,
                    cache_rows=st[0],
                    cache_buf=st[1],
                    cache_p=st[2],
                    ascii_only=ascii_only,
                    **kwargs,
                )
                eng._wc = list(st2)
            else:
                ids, ntok, bad, _ = encode_program_scan(
                    bufs,
                    lens,
                    ascii_only=ascii_only,
                    word_cache=False,
                    **kwargs,
                )
            acc = reduce_out(acc, ntok)
        return int(acc)

    best = _time_reps(run)
    return nbytes / best, nbytes


def bench_dispatch(name, target=TARGET_BATCH_BYTES):
    """WordPiece / Unigram engines: per-chunk program dispatch loop."""
    import jax
    import jax.numpy as jnp

    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer.from_file(FIXTURES[name])
    eng = tok._get_device_engine()
    assert eng is not None, f"{name}: device engine failed to build"

    docs = build_docs(target)
    staged, nbytes = _stage_chunks(eng, docs)

    @jax.jit
    def reduce_out(acc, ntok):
        return acc + jnp.sum(ntok)

    def run():
        acc = jnp.int32(0)
        for b, l, _ascii, _shape in staged:
            ids, ntok, bad = eng._program(b, l)
            acc = reduce_out(acc, ntok)
        return int(acc)

    best = _time_reps(run)
    return nbytes / best, nbytes


def bench_reference_encode(name, docs):
    """Reference wheel end-to-end on a sample of the same docs."""
    try:
        from tokenizers import Tokenizer as RefTok
    except ImportError:
        return REF_STATED
    ref = RefTok.from_file(FIXTURES[name])
    sample = docs[: max(1, len(docs) // 16)]
    sbytes = sum(len(d.encode("utf-8")) for d in sample)
    ref.encode_batch_fast(sample)
    t0 = time.perf_counter()
    ref.encode_batch_fast(sample)
    measured = sbytes / (time.perf_counter() - t0)
    return max(REF_STATED, measured)


def bench_train():
    """BPE train from scratch: device trainer vs reference wheel wall-clock
    on the same 1MB corpus slice / vocab target."""
    corpus = open(CORPUS, encoding="utf-8").read()[: 1 << 20]
    lines = corpus.splitlines()
    vocab_size = 512

    from tokenizers_tpu.models import BPE
    from tokenizers_tpu.parallel.bpe_train import DistributedBpeTrainer
    from tokenizers_tpu.pre_tokenizers import Whitespace
    from tokenizers_tpu.tokenizer import Tokenizer

    tok = Tokenizer(BPE())
    tok.pre_tokenizer = Whitespace()
    trainer = DistributedBpeTrainer(vocab_size=vocab_size)

    def process(line):
        return [w for w, _ in tok.pre_tokenizer.pre_tokenize_str(line)]

    t0 = time.perf_counter()
    trainer.feed(iter(lines), process)
    trainer.train(tok.model)
    ours = time.perf_counter() - t0

    try:
        import tokenizers as hf

        rtok = hf.Tokenizer(hf.models.BPE())
        rtok.pre_tokenizer = hf.pre_tokenizers.Whitespace()
        rtrainer = hf.trainers.BpeTrainer(
            vocab_size=vocab_size, show_progress=False
        )
        t0 = time.perf_counter()
        rtok.train_from_iterator(lines, rtrainer)
        theirs = time.perf_counter() - t0
    except Exception:
        theirs = float("nan")

    return ours, theirs


def main():
    breakdown = "--breakdown" in sys.argv
    if breakdown:
        from tools.profile_stages import main as profile_main

        profile_main()
        return

    results = {}

    # config: bert WordPiece (smaller timed batch: the dispatch-loop engines
    # are currently orders slower than the BPE scan path; see PERF.md)
    try:
        bps, _ = bench_dispatch("bert", target=1 << 22)
        refbps = bench_reference_encode("bert", build_docs())
        emit(
            "bert_wordpiece_batch_encode_bytes_per_sec_per_chip",
            round(bps / 1e6, 1),
            "MB/s",
            round(bps / refbps, 2),
        )
    except Exception as e:  # pragma: no cover - bench resilience
        emit("bert_wordpiece_batch_encode_bytes_per_sec_per_chip", 0.0, f"error: {type(e).__name__}: {e}"[:120], 0.0)

    # config: unigram Viterbi (xlnet-style Metaspace)
    try:
        bps, _ = bench_dispatch("unigram", target=1 << 22)
        refbps = bench_reference_encode("unigram", build_docs())
        emit(
            "unigram_batch_encode_bytes_per_sec_per_chip",
            round(bps / 1e6, 1),
            "MB/s",
            round(bps / refbps, 2),
        )
    except Exception as e:
        emit("unigram_batch_encode_bytes_per_sec_per_chip", 0.0, f"error: {type(e).__name__}: {e}"[:120], 0.0)

    # config: llama-3 split pattern BPE
    try:
        bps, _ = bench_bpe_scan("llama3", word_cache=False)
        refbps = bench_reference_encode("llama3", build_docs())
        emit(
            "llama3_bpe_batch_encode_bytes_per_sec_per_chip",
            round(bps / 1e6, 1),
            "MB/s",
            round(bps / refbps, 2),
        )
    except Exception as e:
        emit("llama3_bpe_batch_encode_bytes_per_sec_per_chip", 0.0, f"error: {type(e).__name__}: {e}"[:120], 0.0)

    # config: BPE train wall-clock
    try:
        ours, theirs = bench_train()
        emit(
            "bpe_train_1mb_vocab512_wallclock",
            round(ours, 1),
            "s",
            round(theirs / ours, 2) if theirs == theirs else 0.0,
        )
    except Exception as e:
        emit("bpe_train_1mb_vocab512_wallclock", 0.0, f"error: {type(e).__name__}: {e}"[:120], 0.0)

    # flagship: gpt2 byte-level BPE (cold + warm-cache serving)
    ref_gpt2 = None
    try:
        bps_warm, _ = bench_bpe_scan("gpt2", word_cache=True)
        ref_gpt2 = bench_reference_encode("gpt2", build_docs())
        emit(
            "gpt2_bpe_batch_encode_cached_bytes_per_sec_per_chip",
            round(bps_warm / 1e6, 1),
            "MB/s",
            round(bps_warm / ref_gpt2, 2),
        )
    except Exception as e:
        emit("gpt2_bpe_batch_encode_cached_bytes_per_sec_per_chip", 0.0, f"error: {type(e).__name__}: {e}"[:120], 0.0)

    try:
        bps, _ = bench_bpe_scan("gpt2", word_cache=False)
        if ref_gpt2 is None:
            ref_gpt2 = bench_reference_encode("gpt2", build_docs())
        emit(
            "gpt2_bpe_batch_encode_bytes_per_sec_per_chip",
            round(bps / 1e6, 1),
            "MB/s",
            round(bps / ref_gpt2, 2),
        )
    except Exception as e:
        emit("gpt2_bpe_batch_encode_bytes_per_sec_per_chip", 0.0, f"error: {type(e).__name__}: {e}"[:120], 0.0)


if __name__ == "__main__":
    main()
