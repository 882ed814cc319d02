"""Generate training corpus + fixture tokenizers using the reference pip
package as the oracle (run offline, outputs committed).

Outputs (in tests/fixtures/):
  corpus.txt                 ~4MB mixed text (deterministic)
  gpt2/tokenizer.json        byte-level BPE, gpt2-style pipeline, 12k vocab
  llama3/tokenizer.json      byte-level BPE w/ llama-3 split regex, 16k vocab
  bert/tokenizer.json        BertNormalizer+WordPiece, 8k vocab
  unigram/tokenizer.json     Metaspace+Unigram, 8k vocab
  golden.json                reference encodings for sample lines per fixture
"""

import glob
import io
import json
import os
import random
import sys

import tokenizers as hf

HERE = os.path.dirname(os.path.abspath(__file__))

LLAMA3_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


def build_corpus(target_bytes=4_000_000, path=None):
    rng = random.Random(1234)
    chunks = []

    def add_file(f, limit=200_000):
        try:
            with io.open(f, "r", encoding="utf-8", errors="ignore") as fh:
                chunks.append(fh.read()[:limit])
        except OSError:
            pass

    # reference docs & code (prose + code mix)
    for pat in ["/root/reference/**/*.md", "/root/reference/docs/**/*.rst"]:
        for f in sorted(glob.glob(pat, recursive=True)):
            add_file(f)
    # python stdlib prose-ish sources
    import email, http, json as _json, logging, unittest  # noqa

    stdlib = os.path.dirname(os.__file__)
    for name in sorted(os.listdir(stdlib)):
        if name.endswith(".py"):
            add_file(os.path.join(stdlib, name), 80_000)

    base = "\n".join(chunks)
    # word pool for synthetic natural-ish sentences
    words = [w for w in base.split() if 1 <= len(w) <= 14 and w.isascii()]
    rng.shuffle(words)
    pool = words[:30000]
    cjk = "日本語の形態素解析は難しい中文分词也很有趣한국어형태소분석"
    accents = "café résumé naïve söße łódź",

    out = [base]
    size = len(base.encode("utf-8"))
    while size < target_bytes:
        n = rng.randint(4, 18)
        sent = " ".join(rng.choice(pool) for _ in range(n))
        if rng.random() < 0.05:
            start = rng.randint(0, len(cjk) - 8)
            sent += " " + cjk[start : start + rng.randint(2, 8)]
        if rng.random() < 0.05:
            sent += " café résumé naïve"
        if rng.random() < 0.3:
            sent = sent.capitalize() + rng.choice([".", "!", "?", ","])
        out.append(sent)
        size += len(sent) + 1
    corpus = "\n".join(out)
    if path:
        with io.open(path, "w", encoding="utf-8") as f:
            f.write(corpus)
    return corpus


def train_gpt2(lines, vocab_size=12000):
    tok = hf.Tokenizer(hf.models.BPE())
    tok.pre_tokenizer = hf.pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = hf.decoders.ByteLevel()
    tok.post_processor = hf.processors.ByteLevel(trim_offsets=True)
    trainer = hf.trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=hf.pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(lines, trainer)
    return tok


def train_llama3(lines, vocab_size=16000):
    tok = hf.Tokenizer(hf.models.BPE(byte_fallback=False, ignore_merges=True))
    tok.pre_tokenizer = hf.pre_tokenizers.Sequence(
        [
            hf.pre_tokenizers.Split(hf.Regex(LLAMA3_PATTERN), "isolated"),
            hf.pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
        ]
    )
    tok.decoder = hf.decoders.ByteLevel()
    tok.post_processor = hf.processors.TemplateProcessing(
        single="<|begin_of_text|> $A",
        pair="<|begin_of_text|> $A <|begin_of_text|>:1 $B:1",
        special_tokens=[("<|begin_of_text|>", 0)],
    )
    trainer = hf.trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<|begin_of_text|>", "<|end_of_text|>"],
        initial_alphabet=hf.pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(lines, trainer)
    return tok


def train_bert(lines, vocab_size=8000):
    tok = hf.Tokenizer(hf.models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = hf.normalizers.BertNormalizer()
    tok.pre_tokenizer = hf.pre_tokenizers.BertPreTokenizer()
    tok.decoder = hf.decoders.WordPiece()
    trainer = hf.trainers.WordPieceTrainer(
        vocab_size=vocab_size,
        special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"],
        show_progress=False,
    )
    tok.train_from_iterator(lines, trainer)
    cls_id = tok.token_to_id("[CLS]")
    sep_id = tok.token_to_id("[SEP]")
    tok.post_processor = hf.processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    return tok


def train_unigram(lines, vocab_size=8000):
    tok = hf.Tokenizer(hf.models.Unigram())
    tok.normalizer = hf.normalizers.Sequence(
        [hf.normalizers.Nmt(), hf.normalizers.Replace(hf.Regex(r" {2,}"), " ")]
    )
    tok.pre_tokenizer = hf.pre_tokenizers.Metaspace()
    tok.decoder = hf.decoders.Metaspace()
    trainer = hf.trainers.UnigramTrainer(
        vocab_size=vocab_size,
        special_tokens=["<unk>"],
        unk_token="<unk>",
        show_progress=False,
    )
    tok.train_from_iterator(lines, trainer)
    return tok


def make_unigram_bf():
    """Byte-fallback variant of the unigram fixture (Llama-2-style SPM
    semantics, reference `models/unigram/model.rs:429`): same pipeline, the
    vocab extended with all 256 `<0xXX>` pieces, `byte_fallback=True`."""
    base = hf.Tokenizer.from_file(os.path.join(HERE, "unigram", "tokenizer.json"))
    spec = json.loads(base.to_str())
    m = spec["model"]
    have = {p for p, _s in m["vocab"]}
    for b in range(256):
        piece = f"<0x{b:02X}>"
        if piece not in have:
            m["vocab"].append([piece, -12.5])
    m["byte_fallback"] = True
    tok = hf.Tokenizer.from_str(json.dumps(spec))
    return tok


def main():
    corpus_path = os.path.join(HERE, "corpus.txt")
    if os.path.exists(corpus_path):
        corpus = io.open(corpus_path, encoding="utf-8").read()
    else:
        corpus = build_corpus(path=corpus_path)
    lines = corpus.split("\n")
    print(f"corpus: {len(corpus.encode('utf-8'))} bytes, {len(lines)} lines")

    fixtures = {}
    for name, fn, n in [
        ("gpt2", train_gpt2, None),
        ("llama3", train_llama3, None),
        ("bert", train_bert, None),
        ("unigram", train_unigram, 40_000),  # unigram trainer is slower
    ]:
        d = os.path.join(HERE, name)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "tokenizer.json")
        if os.path.exists(path):
            fixtures[name] = hf.Tokenizer.from_file(path)
            print(f"{name}: exists")
            continue
        sub = lines[:n] if n else lines
        tok = fn(sub)
        tok.save(path)
        fixtures[name] = tok
        print(f"{name}: trained, vocab={tok.get_vocab_size()}")

    # derived fixture: unigram + byte_fallback (needs unigram built first)
    d = os.path.join(HERE, "unigram_bf")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "tokenizer.json")
    if os.path.exists(path):
        fixtures["unigram_bf"] = hf.Tokenizer.from_file(path)
        print("unigram_bf: exists")
    else:
        tok = make_unigram_bf()
        tok.save(path)
        fixtures["unigram_bf"] = tok
        print(f"unigram_bf: derived, vocab={tok.get_vocab_size()}")

    # golden encodings on a deterministic sample
    rng = random.Random(99)
    sample = [lines[rng.randrange(len(lines))] for _ in range(300)]
    sample += [
        "", " ", "Hello world!", "  doubled  spaces  ", "café RÉSUMÉ",
        "日本語テキスト processing", "don't you're", "a" * 300,
        "<|endoftext|> in text", "[CLS] special [SEP]",
    ]
    golden = {"sample": sample, "fixtures": {}}
    for name, tok in fixtures.items():
        encs = tok.encode_batch(sample)
        golden["fixtures"][name] = {
            "ids": [e.ids for e in encs],
            "offsets": [[list(o) for o in e.offsets] for e in encs],
        }
    with open(os.path.join(HERE, "golden.json"), "w") as f:
        json.dump(golden, f)
    print("golden.json written")


if __name__ == "__main__":
    main()
