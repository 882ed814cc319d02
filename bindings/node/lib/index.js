// tokenizers-tpu Node API (reference-parity surface:
// /root/reference/bindings/node/lib/bindings/tokenizer.ts).
//
// The native addon wraps the framework's C ABI; pipeline components are
// configured through the tokenizer.json document (the framework compiles
// whole pipelines to TPU programs, so components are configuration, not
// live per-call objects).

"use strict";

const fs = require("fs");
const path = require("path");

const native = require(path.join(__dirname, "..", "build", "Release", "tokenizers_tpu.node"));

class Tokenizer {
  constructor(configJson) {
    this._native = new native.Tokenizer(configJson);
  }

  static fromString(json) {
    return new Tokenizer(json);
  }

  static fromFile(file) {
    return new Tokenizer(fs.readFileSync(file, "utf-8"));
  }

  encode(sequence, pair, options) {
    if (pair === undefined || pair === null) {
      return this._native.encode(sequence, options);
    }
    return this._native.encode(sequence, pair, options);
  }

  encodeBatch(sequences, options) {
    return this._native.encodeBatch(sequences, options);
  }

  // Promise-based, runs off the JS thread (reference: async tasks in
  // bindings/node/src/tasks/tokenizer.rs)
  encodeBatchAsync(sequences, options) {
    return this._native.encodeBatchAsync(sequences, options);
  }

  decode(ids, skipSpecialTokens = true) {
    return this._native.decode(ids, skipSpecialTokens);
  }

  tokenToId(token) {
    return this._native.tokenToId(token);
  }

  idToToken(id) {
    return this._native.idToToken(id);
  }

  getVocab(withAddedTokens = true) {
    return this._native.getVocab(withAddedTokens);
  }

  getVocabSize(withAddedTokens = true) {
    return Object.keys(this.getVocab(withAddedTokens)).length;
  }

  addTokens(tokens) {
    return this._native.addTokens(tokens);
  }

  addSpecialTokens(tokens) {
    return this._native.addSpecialTokens(tokens);
  }

  // trainerConfig: {type: "BpeTrainer"|"WordPieceTrainer"|"UnigramTrainer"|
  // "WordLevelTrainer", ...kwargs} or undefined for the model's default
  train(files, trainerConfig) {
    return this._native.train(files, trainerConfig);
  }

  setTruncation(maxLength, options) {
    return this._native.setTruncation(maxLength, options);
  }

  disableTruncation() {
    return this._native.disableTruncation();
  }

  setPadding(options) {
    return this._native.setPadding(options || {});
  }

  disablePadding() {
    return this._native.disablePadding();
  }

  toString(pretty = false) {
    return this._native.save(pretty);
  }

  save(file, pretty = true) {
    fs.writeFileSync(file, this._native.save(pretty));
  }
}

module.exports = { Tokenizer };
