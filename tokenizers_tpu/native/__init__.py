"""Native (C++) components, loaded via ctypes.

`suffix_substrings(chars)` — the esaxx equivalent used for Unigram trainer
seeding (reference `models/unigram/trainer.rs:227-230`): enumerate every
suffix-tree internal node of the char sequence as (offset, char_len, count).

The shared library compiles lazily with g++ into the user cache dir; if no
toolchain is available a pure-numpy doubling suffix array serves as
fallback (slower, same results).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_lib = None
_lib_tried = False


def _build_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(os.path.dirname(__file__), "esaxx.cpp")
    cache = os.path.join(os.path.expanduser("~"), ".cache", "tokenizers_tpu")
    os.makedirs(cache, exist_ok=True)
    sopath = os.path.join(cache, "libesaxx_v1.so")
    try:
        if not os.path.exists(sopath) or os.path.getmtime(sopath) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", sopath],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(sopath)
        lib.esaxx_enumerate.restype = ctypes.c_int64
        lib.esaxx_enumerate.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _suffix_array_numpy(s: np.ndarray) -> np.ndarray:
    """Doubling suffix array (O(n log^2 n)); fallback when g++ is absent."""
    n = len(s)
    rank = np.argsort(s, kind="stable")
    r = np.zeros(n, np.int64)
    sr = s[rank]
    r[rank] = np.cumsum(np.concatenate([[0], (sr[1:] != sr[:-1]).astype(np.int64)]))
    k = 1
    sa = rank
    while k < n:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = r[k:]
        order = np.lexsort((key2, r))
        nr = np.zeros(n, np.int64)
        prev_pair = None
        rr = np.stack([r[order], key2[order]], axis=1)
        neq = np.any(rr[1:] != rr[:-1], axis=1)
        nr[order] = np.cumsum(np.concatenate([[0], neq.astype(np.int64)]))
        r = nr
        sa = order
        if r[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa.astype(np.int64)


def _enumerate_numpy(s: np.ndarray) -> List[Tuple[int, int, int]]:
    n = len(s)
    sa = _suffix_array_numpy(s)
    # Kasai LCP
    rank = np.zeros(n, np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, np.int64)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    out = []
    stack = [(0, 0)]  # (lcp, left)
    for i in range(1, n + 1):
        cur = int(lcp[i]) if i < n else 0
        left = i - 1
        while stack and cur < stack[-1][0]:
            d, l0 = stack.pop()
            if d > 0:
                out.append((int(sa[l0]), d, i - l0))
            left = l0
        if not stack or cur > stack[-1][0]:
            stack.append((cur, left))
    return out


_trainer_lib = None
_trainer_tried = False


def _build_trainer_lib():
    """Lazy-compile the native BPE trainer core (bpe_trainer_core.cpp)."""
    global _trainer_lib, _trainer_tried
    if _trainer_tried:
        return _trainer_lib
    _trainer_tried = True
    src = os.path.join(os.path.dirname(__file__), "bpe_trainer_core.cpp")
    cache = os.path.join(os.path.expanduser("~"), ".cache", "tokenizers_tpu")
    os.makedirs(cache, exist_ok=True)
    sopath = os.path.join(cache, "libbpe_trainer_v1.so")
    try:
        if not os.path.exists(sopath) or os.path.getmtime(
            sopath
        ) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", sopath],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(sopath)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.bpe_train_core.restype = ctypes.c_int64
        lib.bpe_train_core.argtypes = [
            i32p, i64p, i64p, ctypes.c_int64,          # words
            u8p, i64p, ctypes.c_int64,                  # vocab strings
            u8p, ctypes.c_int64,                        # prefix
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # cfg
            i32p, ctypes.c_int64,                       # out
        ]
        _trainer_lib = lib
    except Exception:
        _trainer_lib = None
    return _trainer_lib


def bpe_train_merges(words, counts, id_to_word, prefix, vocab_size,
                     min_frequency, max_token_length):
    """Run the native trainer merge loop (steps 4-5 of BpeTrainer.do_train).

    words: list of (symbol-id list, lens list) — lens must be all-1 (fresh
    tokenization).  Returns a list of (a, b, new_id) merges, or None when
    the native core is unavailable (callers fall back to the Python loop).
    """
    lib = _build_trainer_lib()
    if lib is None:
        return None
    n = len(words)
    word_off = np.zeros(n + 1, np.int64)
    for i, (w, _l) in enumerate(words):
        word_off[i + 1] = word_off[i] + len(w)
    flat = np.zeros(int(word_off[-1]), np.int32)
    for i, (w, _l) in enumerate(words):
        flat[int(word_off[i]) : int(word_off[i + 1])] = w
    cnt = np.asarray(counts, np.int64)
    vb = [s.encode("utf-8") for s in id_to_word]
    voff = np.zeros(len(vb) + 1, np.int64)
    for i, s in enumerate(vb):
        voff[i + 1] = voff[i] + len(s)
    vbytes = np.frombuffer(b"".join(vb) or b"\x00", np.uint8).copy()
    pfx = np.frombuffer(
        (prefix or "").encode("utf-8") or b"\x00", np.uint8
    ).copy()
    cap = max(int(vocab_size) + 16, 64)
    out = np.zeros(cap * 3, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    got = lib.bpe_train_core(
        flat.ctypes.data_as(i32p),
        word_off.ctypes.data_as(i64p),
        cnt.ctypes.data_as(i64p),
        np.int64(n),
        vbytes.ctypes.data_as(u8p),
        voff.ctypes.data_as(i64p),
        np.int64(len(vb)),
        pfx.ctypes.data_as(u8p),
        np.int64(len((prefix or "").encode("utf-8"))),
        np.int64(vocab_size),
        np.int64(min_frequency),
        np.int64(max_token_length),
        out.ctypes.data_as(i32p),
        np.int64(cap),
    )
    if got < 0:
        return None
    return [
        (int(out[k * 3]), int(out[k * 3 + 1]), int(out[k * 3 + 2]))
        for k in range(int(got))
    ]


def build_c_api(force: bool = False) -> str:
    """Compile the C ABI shared library (c_api.cpp — reference parity with
    `bindings/c/src/lib.rs`) against the running interpreter's headers.

    Returns the .so path.  External C/C++ programs link against it; it
    embeds CPython and forwards to this package."""
    import sysconfig

    src = os.path.join(os.path.dirname(__file__), "c_api.cpp")
    cache = os.path.join(os.path.expanduser("~"), ".cache", "tokenizers_tpu")
    os.makedirs(cache, exist_ok=True)
    sopath = os.path.join(cache, "libtokenizers_tpu_c.so")
    if (
        not force
        and os.path.exists(sopath)
        and os.path.getmtime(sopath) >= os.path.getmtime(src)
    ):
        return sopath
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = sysconfig.get_config_var("LDVERSION")
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{inc}",
        src,
        "-o",
        sopath,
        f"-L{libdir}",
        f"-lpython{ver}",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return sopath


def suffix_substrings(chars: np.ndarray) -> List[Tuple[int, int, int]]:
    """All suffix-tree internal nodes of `chars` (int32 codepoints >= 0):
    list of (offset, char_len, occurrence_count)."""
    chars = np.asarray(chars, dtype=np.int32)
    n = len(chars)
    if n == 0:
        return []
    # remap symbols to a compact alphabet with a unique smallest sentinel
    uniq, inv = np.unique(chars, return_inverse=True)
    s = (inv + 1).astype(np.int32)
    s = np.concatenate([s, np.zeros(1, np.int32)])
    k = len(uniq) + 1

    lib = _build_lib()
    if lib is None:
        # fallback path enumerates on the sentinel-terminated string too
        nodes = _enumerate_numpy(s.astype(np.int64))
        return [(o, l, c) for (o, l, c) in nodes if o + l <= n]

    cap = 4 * (n + 1) + 16
    out_off = np.zeros(cap, np.int32)
    out_len = np.zeros(cap, np.int32)
    out_cnt = np.zeros(cap, np.int32)
    cnt = lib.esaxx_enumerate(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(n + 1),
        np.int32(k),
        out_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int64(cap),
    )
    if cnt > cap:
        raise RuntimeError("esaxx capacity exceeded")
    res = []
    for i in range(int(cnt)):
        o, l, c = int(out_off[i]), int(out_len[i]), int(out_cnt[i])
        if o + l <= n:  # exclude nodes that span the sentinel
            res.append((o, l, c))
    return res
