"""Host-built tables for the BERT/WordPiece device path.

BertNormalizer (reference `normalizers/bert.rs:53-137`) composes four
per-character transforms — clean_text, CJK space-padding, NFD+strip-Mn,
lowercase.  Because every stage maps one input char to an independent output
sequence, the whole normalizer collapses into a codepoint -> byte-sequence
table, gathered on device (the canonical-reorder step of NFD only permutes
Mn marks, which strip_accents deletes, so per-char decomposition is exact).

Also: the BertPreTokenizer char classes (whitespace-removed, punctuation-
isolated; `pre_tokenizers/bert.rs:11`) as a two-stage codepoint table.

Tables are built from the same predicates the host pipeline uses, so host
and device agree byte-for-byte; results are cached on disk per config.
"""

from __future__ import annotations

import os

import numpy as np

MAX_CP = 0x110000
PAGE_BITS = 8
PAGE = 1 << PAGE_BITS
NORM_K = 12  # max output bytes per input char (checked at build)

BERT_WS = 0
BERT_PUNCT = 1
BERT_OTHER = 2

_norm_cache = {}
_class_cache = None


def _cache_path(name):
    d = os.path.join(os.path.expanduser("~"), ".cache", "tokenizers_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def bert_normalizer_tables(clean_text, handle_chinese_chars, strip_accents, lowercase):
    """-> (stage1 int32[MAX_CP>>8], out_bytes uint8[n_pages*256, NORM_K],
            out_len int8[n_pages*256])

    out_len == -1 marks a char whose normalization exceeds NORM_K bytes
    (none exist for real configs; kept as a host-fallback escape hatch)."""
    key = (bool(clean_text), bool(handle_chinese_chars), strip_accents, bool(lowercase))
    if key in _norm_cache:
        return _norm_cache[key]
    fname = _cache_path(
        "bertnorm_%d%d%s%d_v1.npz"
        % (key[0], key[1], {None: "n", True: "t", False: "f"}[strip_accents], key[3])
    )
    if os.path.exists(fname):
        z = np.load(fname)
        _norm_cache[key] = (z["s1"], z["ob"], z["ol"])
        return _norm_cache[key]

    import unicodedata

    from ..normalizers import _is_bert_control, _is_bert_whitespace, is_chinese_char

    do_strip = strip_accents if strip_accents is not None else lowercase

    out_bytes = np.zeros((MAX_CP, NORM_K), np.uint8)
    out_len = np.zeros(MAX_CP, np.int8)

    for cp in range(MAX_CP):
        if 0xD800 <= cp < 0xE000:
            continue
        c = chr(cp)
        if True:
            s = c
            if clean_text:
                if cp == 0 or cp == 0xFFFD or _is_bert_control(c):
                    s = ""
                elif _is_bert_whitespace(c):
                    s = " "
            if s and handle_chinese_chars and is_chinese_char(ord(s)):
                s = " " + s + " "
            if s and do_strip:
                s = "".join(
                    ch
                    for ch in unicodedata.normalize("NFD", s)
                    if unicodedata.category(ch) != "Mn"
                )
            if s and lowercase:
                s = "".join(ch.lower() for ch in s)
        bs = s.encode("utf-8")
        if len(bs) > NORM_K:
            out_len[cp] = -1
        else:
            out_len[cp] = len(bs)
            out_bytes[cp, : len(bs)] = np.frombuffer(bs, np.uint8)

    # page dedup
    rec = np.concatenate(
        [out_bytes, out_len.astype(np.uint8)[:, None]], axis=1
    ).reshape(MAX_CP >> PAGE_BITS, -1)
    uniq, s1 = np.unique(rec, axis=0, return_inverse=True)
    n_pages = uniq.shape[0]
    uniq = uniq.reshape(n_pages * PAGE, NORM_K + 1)
    ob = np.ascontiguousarray(uniq[:, :NORM_K])
    ol = uniq[:, NORM_K].astype(np.int8)
    s1 = s1.astype(np.int32)
    np.savez_compressed(fname, s1=s1, ob=ob, ol=ol)
    _norm_cache[key] = (s1, ob, ol)
    return _norm_cache[key]


def bert_class_tables():
    """Char classes on *normalized* text for BertPreTokenizer:
    WS (split+remove), PUNCT (isolate), OTHER."""
    global _class_cache
    if _class_cache is not None:
        return _class_cache
    fname = _cache_path("bertclass_v1.npz")
    if os.path.exists(fname):
        z = np.load(fname)
        _class_cache = (z["s1"], z["s2"])
        return _class_cache

    import unicodedata

    from ..normalized import _is_whitespace
    from ..pre_tokenizers import _is_punc

    cls = np.full(MAX_CP, BERT_OTHER, np.int8)
    for cp in range(MAX_CP):
        if 0xD800 <= cp < 0xE000:
            continue
        c = chr(cp)
        if _is_whitespace(c):
            cls[cp] = BERT_WS
        elif _is_punc(c):
            cls[cp] = BERT_PUNCT
    pages = cls.reshape(-1, PAGE)
    uniq, s1 = np.unique(pages, axis=0, return_inverse=True)
    s2 = uniq.reshape(-1)
    _class_cache = (s1.astype(np.int32), s2.astype(np.int8))
    np.savez_compressed(fname, s1=_class_cache[0], s2=_class_cache[1])
    return _class_cache
