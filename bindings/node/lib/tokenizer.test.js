// Jest tests mirroring the reference's
// bindings/node/lib/bindings/tokenizer.test.ts shapes, run against the
// gpt2 fixture.  Requires the addon built (`npm run build`) with the
// tokenizers_tpu Python package importable (see ../README.md).

const path = require("path");
const { Tokenizer } = require("./index");

const GPT2 = path.join(__dirname, "..", "..", "..", "tests", "fixtures", "gpt2", "tokenizer.json");

describe("Tokenizer", () => {
  let tok;
  beforeAll(() => {
    tok = Tokenizer.fromFile(GPT2);
  });

  it("encodes a single sequence", () => {
    const enc = tok.encode("Hello world!");
    expect(enc.ids.length).toBeGreaterThan(0);
    expect(enc.tokens.length).toBe(enc.ids.length);
    expect(enc.offsets.length).toBe(enc.ids.length);
    expect(enc.attentionMask.every((x) => x === 1)).toBe(true);
  });

  it("round-trips through decode", () => {
    const text = "don't stop believing";
    const enc = tok.encode(text);
    expect(tok.decode(enc.ids)).toBe(text);
  });

  it("encodes a batch, sync and async, identically", async () => {
    const batch = ["Hello world!", "don't stop", "", "  spaces  "];
    const sync = tok.encodeBatch(batch);
    const asyncRes = await tok.encodeBatchAsync(batch);
    expect(asyncRes.map((e) => e.ids)).toEqual(sync.map((e) => e.ids));
    expect(sync[0].ids).toEqual(tok.encode(batch[0]).ids);
  });

  it("maps tokens and ids", () => {
    const id = tok.tokenToId("hello");
    expect(typeof id).toBe("number");
    expect(tok.idToToken(id)).toBe("hello");
    expect(tok.tokenToId("definitely-not-a-token-xyz")).toBeNull();
  });

  it("exposes the vocab", () => {
    const vocab = tok.getVocab(true);
    expect(Object.keys(vocab).length).toBeGreaterThan(1000);
    expect(tok.getVocabSize()).toBe(Object.keys(vocab).length);
  });

  it("adds special tokens and routes them", () => {
    const n = tok.addSpecialTokens(["[MYTOK]"]);
    expect(n).toBe(1);
    const enc = tok.encode("a [MYTOK] b");
    expect(enc.ids).toContain(tok.tokenToId("[MYTOK]"));
  });

  it("pads and truncates", () => {
    tok.setPadding({ maxLength: 8, padToken: "<|endoftext|>", padId: 50256 });
    const enc = tok.encode("hi");
    expect(enc.ids.length).toBe(8);
    tok.disablePadding();
    tok.setTruncation(4);
    const enc2 = tok.encode("one two three four five six");
    expect(enc2.ids.length).toBe(4);
    tok.disableTruncation();
  });

  it("serializes back to JSON", () => {
    const json = tok.toString();
    const parsed = JSON.parse(json);
    expect(parsed.model.type).toBe("BPE");
    const clone = Tokenizer.fromString(json);
    expect(clone.encode("Hello world!").ids).toEqual(
      tok.encode("Hello world!").ids
    );
  });

  it("trains a BPE from files", () => {
    const fs = require("fs");
    const os = require("os");
    const tmp = path.join(os.tmpdir(), "node-train-corpus.txt");
    fs.writeFileSync(tmp, "hug hugs hugging pug pugs mug smug hug hugs\n");
    const fresh = Tokenizer.fromString(
      JSON.stringify({
        version: "1.0",
        model: { type: "BPE", vocab: {}, merges: [] },
        pre_tokenizer: { type: "Whitespace" },
      })
    );
    fresh.train([tmp], { type: "BpeTrainer", vocab_size: 40 });
    expect(fresh.getVocabSize()).toBeGreaterThan(10);
    expect(fresh.encode("hug").ids.length).toBeGreaterThan(0);
  });
});
