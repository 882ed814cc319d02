// N-API (stable C ABI, NAPI_VERSION=8) Node binding for tokenizers_tpu,
// layered on the framework's C ABI (tokenizers_tpu/native/c_api.cpp) the
// same way the reference's Node binding layers napi-rs on its Rust core
// (`bindings/node/src/tokenizer.rs`).  Plain node_api.h — no node-addon-api
// or npm native deps — so the addon builds with node-gyp alone.
//
// Surface (mirrors the reference's lib/bindings/tokenizer.ts shape):
//   Tokenizer.fromString(json) / Tokenizer.fromFile(path)
//   tok.encode(sequence[, pair][, {addSpecialTokens}]) -> Encoding object
//   tok.encodeBatch([seqs], [opts]) -> [Encoding]        (sync)
//   tok.encodeBatchAsync([seqs], [opts]) -> Promise<[Encoding]>
//   tok.decode(ids[, skipSpecialTokens]) -> string
//   tok.tokenToId(token) / tok.idToToken(id)
//   tok.getVocab(withAdded) -> {} / tok.getVocabSize(withAdded)
//   tok.addTokens([...]) / tok.addSpecialTokens([...])
//   tok.setPadding({...}) / tok.setTruncation(maxLength, {...}) /
//   tok.disablePadding() / tok.disableTruncation()
//   tok.train([files], trainerConfig?) / tok.save() -> json string
//
// Encodings are plain JS objects {ids, typeIds, tokens, offsets, wordIds,
// sequenceIds, attentionMask, specialTokensMask, overflowing}: the C ABI
// flattens each Encoding into arrays at encode time, so there is no live
// handle to keep.

#include <node_api.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

// ---- C ABI (tokenizers_tpu/native/c_api.cpp) ----------------------------
extern "C" {
struct CTokenizer;
struct CEncoding;
const char *tokenizers_get_last_error();
CTokenizer *tokenizers_create(const char *json, int *status);
void tokenizers_free(CTokenizer *);
CEncoding *tokenizers_encode(CTokenizer *, const char *seq, const char *pair,
                             bool add_special, size_t *len, int *status);
CEncoding **tokenizers_encode_batch(CTokenizer *, const char **seqs, size_t n,
                                    bool add_special, int *status);
void tokenizers_encoding_array_free(CEncoding **, size_t n);
void tokenizers_encoding_free(CEncoding *);
void tokenizers_encoding_get_ids(const CEncoding *, uint32_t *, size_t);
void tokenizers_encoding_get_type_ids(const CEncoding *, uint32_t *, size_t);
void tokenizers_encoding_get_attention_mask(const CEncoding *, uint32_t *,
                                            size_t);
void tokenizers_encoding_get_special_tokens_mask(const CEncoding *,
                                                 uint32_t *, size_t);
void tokenizers_encoding_get_word_ids(const CEncoding *, int32_t *, size_t);
void tokenizers_encoding_get_sequence_ids(const CEncoding *, int32_t *,
                                          size_t);
void tokenizers_encoding_get_offsets(const CEncoding *, uint32_t *, size_t);
void tokenizers_encoding_get_tokens(const CEncoding *, char **, size_t);
size_t tokenizers_encoding_get_overflowing_count(const CEncoding *);
const CEncoding *tokenizers_encoding_get_overflowing(const CEncoding *,
                                                     size_t);
int32_t tokenizers_token_to_id(const CTokenizer *, const char *, int *);
char *tokenizers_id_to_token(const CTokenizer *, uint32_t, int *);
char *tokenizers_decode(const CTokenizer *, const uint32_t *, size_t,
                        bool skip_special, int *);
void tokenizers_free_string(char *);
char *tokenizers_get_vocab(const CTokenizer *, bool with_added, int *);
char *tokenizers_get_config(const CTokenizer *, bool pretty, int *);
int tokenizers_add_tokens(CTokenizer *, const char *tokens_json, int *);
int tokenizers_add_special_tokens(CTokenizer *, const char *tokens_json,
                                  int *);
int tokenizers_num_special_tokens_to_add(const CTokenizer *, bool pair,
                                         int *);
int tokenizers_enable_padding(CTokenizer *, int direction, uint32_t pad_id,
                              uint32_t pad_type_id, const char *pad_token,
                              size_t length, size_t pad_to_multiple_of,
                              int *);
int tokenizers_disable_padding(CTokenizer *, int *);
int tokenizers_enable_truncation(CTokenizer *, size_t max_length,
                                 size_t stride, int strategy, int direction,
                                 int *);
int tokenizers_disable_truncation(CTokenizer *, int *);
int tokenizers_train_from_files(CTokenizer *, const char **files, size_t n,
                                const char *trainer_json, int *);
}

namespace {

#define NAPI_CALL(env, call)                              \
  do {                                                    \
    if ((call) != napi_ok) {                              \
      napi_throw_error(env, nullptr, "N-API call failed: " #call); \
      return nullptr;                                     \
    }                                                     \
  } while (0)

napi_value throw_last(napi_env env, const char *fallback) {
  const char *msg = tokenizers_get_last_error();
  napi_throw_error(env, nullptr, msg != nullptr ? msg : fallback);
  return nullptr;
}

std::string get_string(napi_env env, napi_value v, bool *ok) {
  size_t len = 0;
  *ok = napi_get_value_string_utf8(env, v, nullptr, 0, &len) == napi_ok;
  if (!*ok) return "";
  std::string out(len, '\0');
  *ok = napi_get_value_string_utf8(env, v, out.data(), len + 1, &len) ==
        napi_ok;
  return out;
}

// wrapped native state
struct TokState {
  CTokenizer *tok;
};

void tok_finalize(napi_env, void *data, void *) {
  TokState *st = static_cast<TokState *>(data);
  tokenizers_free(st->tok);
  delete st;
}

TokState *unwrap(napi_env env, napi_callback_info info, size_t *argc,
                 napi_value *argv) {
  napi_value self;
  if (napi_get_cb_info(env, info, argc, argv, &self, nullptr) != napi_ok)
    return nullptr;
  void *data = nullptr;
  if (napi_unwrap(env, self, &data) != napi_ok || data == nullptr) {
    napi_throw_error(env, nullptr, "not a Tokenizer instance");
    return nullptr;
  }
  return static_cast<TokState *>(data);
}

// ---- Encoding -> JS object ----------------------------------------------

napi_value make_u32_array(napi_env env, const uint32_t *v, size_t n) {
  napi_value arr;
  napi_create_array_with_length(env, n, &arr);
  for (size_t i = 0; i < n; i++) {
    napi_value x;
    napi_create_uint32(env, v[i], &x);
    napi_set_element(env, arr, i, x);
  }
  return arr;
}

napi_value encode_to_js(napi_env env, const CEncoding *enc, size_t n) {
  std::vector<uint32_t> u(n);
  std::vector<int32_t> s(n);
  napi_value obj;
  napi_create_object(env, &obj);

  tokenizers_encoding_get_ids(enc, u.data(), n);
  napi_set_named_property(env, obj, "ids", make_u32_array(env, u.data(), n));
  tokenizers_encoding_get_type_ids(enc, u.data(), n);
  napi_set_named_property(env, obj, "typeIds",
                          make_u32_array(env, u.data(), n));
  tokenizers_encoding_get_attention_mask(enc, u.data(), n);
  napi_set_named_property(env, obj, "attentionMask",
                          make_u32_array(env, u.data(), n));
  tokenizers_encoding_get_special_tokens_mask(enc, u.data(), n);
  napi_set_named_property(env, obj, "specialTokensMask",
                          make_u32_array(env, u.data(), n));

  auto signed_arr = [&](void (*fn)(const CEncoding *, int32_t *, size_t)) {
    fn(enc, s.data(), n);
    napi_value arr;
    napi_create_array_with_length(env, n, &arr);
    for (size_t i = 0; i < n; i++) {
      napi_value x;
      if (s[i] < 0)
        napi_get_null(env, &x);
      else
        napi_create_int32(env, s[i], &x);
      napi_set_element(env, arr, i, x);
    }
    return arr;
  };
  napi_set_named_property(env, obj, "wordIds",
                          signed_arr(tokenizers_encoding_get_word_ids));
  napi_set_named_property(env, obj, "sequenceIds",
                          signed_arr(tokenizers_encoding_get_sequence_ids));

  std::vector<uint32_t> off(2 * n);
  tokenizers_encoding_get_offsets(enc, off.data(), 2 * n);
  napi_value offsets;
  napi_create_array_with_length(env, n, &offsets);
  for (size_t i = 0; i < n; i++) {
    napi_value pair, a, b;
    napi_create_array_with_length(env, 2, &pair);
    napi_create_uint32(env, off[2 * i], &a);
    napi_create_uint32(env, off[2 * i + 1], &b);
    napi_set_element(env, pair, 0, a);
    napi_set_element(env, pair, 1, b);
    napi_set_element(env, offsets, i, pair);
  }
  napi_set_named_property(env, obj, "offsets", offsets);

  std::vector<char *> toks(n, nullptr);
  tokenizers_encoding_get_tokens(enc, toks.data(), n);
  napi_value tokens;
  napi_create_array_with_length(env, n, &tokens);
  for (size_t i = 0; i < n; i++) {
    napi_value t;
    napi_create_string_utf8(env, toks[i] ? toks[i] : "", NAPI_AUTO_LENGTH,
                            &t);
    napi_set_element(env, tokens, i, t);
    free(toks[i]);
  }
  napi_set_named_property(env, obj, "tokens", tokens);

  size_t n_over = tokenizers_encoding_get_overflowing_count(enc);
  napi_value over;
  napi_create_array_with_length(env, n_over, &over);
  for (size_t i = 0; i < n_over; i++) {
    const CEncoding *oe = tokenizers_encoding_get_overflowing(enc, i);
    // overflow windows share the root's length
    napi_set_element(env, over, i, encode_to_js(env, oe, n));
  }
  napi_set_named_property(env, obj, "overflowing", over);
  return obj;
}

// ---- methods -------------------------------------------------------------

bool opt_add_special(napi_env env, napi_value opts, bool dflt) {
  if (opts == nullptr) return dflt;
  napi_valuetype t;
  if (napi_typeof(env, opts, &t) != napi_ok || t != napi_object) return dflt;
  napi_value v;
  if (napi_get_named_property(env, opts, "addSpecialTokens", &v) != napi_ok)
    return dflt;
  if (napi_typeof(env, v, &t) != napi_ok || t != napi_boolean) return dflt;
  bool out = dflt;
  napi_get_value_bool(env, v, &out);
  return out;
}

napi_value tok_encode(napi_env env, napi_callback_info info) {
  size_t argc = 3;
  napi_value argv[3] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  if (argc < 1) {
    napi_throw_type_error(env, nullptr, "encode(sequence[, pair][, opts])");
    return nullptr;
  }
  bool ok = false;
  std::string seq = get_string(env, argv[0], &ok);
  if (!ok) return nullptr;
  std::string pair;
  bool has_pair = false;
  napi_value opts = nullptr;
  if (argc >= 2) {
    napi_valuetype t;
    napi_typeof(env, argv[1], &t);
    if (t == napi_string) {
      pair = get_string(env, argv[1], &ok);
      has_pair = ok;
      if (argc >= 3) opts = argv[2];
    } else if (t == napi_object) {
      opts = argv[1];
    }
  }
  bool add_special = opt_add_special(env, opts, true);
  size_t n = 0;
  int status = 0;
  CEncoding *enc = tokenizers_encode(
      st->tok, seq.c_str(), has_pair ? pair.c_str() : nullptr, add_special,
      &n, &status);
  if (enc == nullptr) return throw_last(env, "encode failed");
  napi_value out = encode_to_js(env, enc, n);
  tokenizers_encoding_free(enc);
  return out;
}

// shared batch runner (sync core, reused by the async worker)
struct BatchWork {
  napi_async_work work = nullptr;
  napi_deferred deferred = nullptr;
  TokState *st = nullptr;
  std::vector<std::string> seqs;
  bool add_special = true;
  CEncoding **encs = nullptr;
  std::vector<size_t> lens;
  std::string error;
};

void batch_execute(napi_env, void *data) {
  BatchWork *w = static_cast<BatchWork *>(data);
  std::vector<const char *> ptrs(w->seqs.size());
  for (size_t i = 0; i < w->seqs.size(); i++) ptrs[i] = w->seqs[i].c_str();
  int status = 0;
  w->encs = tokenizers_encode_batch(w->st->tok, ptrs.data(), ptrs.size(),
                                    w->add_special, &status);
  if (w->encs == nullptr) {
    const char *msg = tokenizers_get_last_error();
    w->error = msg != nullptr ? msg : "encodeBatch failed";
  }
}

napi_value batch_to_js(napi_env env, BatchWork *w);

void batch_complete(napi_env env, napi_status, void *data) {
  BatchWork *w = static_cast<BatchWork *>(data);
  if (!w->error.empty()) {
    napi_value err, msg;
    napi_create_string_utf8(env, w->error.c_str(), NAPI_AUTO_LENGTH, &msg);
    napi_create_error(env, nullptr, msg, &err);
    napi_reject_deferred(env, w->deferred, err);
  } else {
    napi_value arr = batch_to_js(env, w);
    if (arr == nullptr) {
      napi_value err, msg;
      napi_create_string_utf8(env, "conversion failed", NAPI_AUTO_LENGTH,
                              &msg);
      napi_create_error(env, nullptr, msg, &err);
      napi_reject_deferred(env, w->deferred, err);
    } else {
      napi_resolve_deferred(env, w->deferred, arr);
    }
  }
  napi_delete_async_work(env, w->work);
  delete w;
}

}  // namespace

// length probe helper exposed by the C ABI via encode: the batch API
// returns encodings whose length we recover from a second single encode of
// the same input.  To avoid that cost the C ABI gains a length function:
extern "C" size_t tokenizers_encoding_len(const CEncoding *);

namespace {

napi_value batch_to_js(napi_env env, BatchWork *w) {
  napi_value arr;
  napi_create_array_with_length(env, w->seqs.size(), &arr);
  for (size_t i = 0; i < w->seqs.size(); i++) {
    CEncoding *e = w->encs[i];
    size_t n = e != nullptr ? tokenizers_encoding_len(e) : 0;
    napi_value obj = e != nullptr ? encode_to_js(env, e, n) : nullptr;
    if (obj == nullptr) napi_get_null(env, &obj);
    napi_set_element(env, arr, i, obj);
  }
  tokenizers_encoding_array_free(w->encs, w->seqs.size());
  w->encs = nullptr;
  return arr;
}

bool read_seqs(napi_env env, napi_value arr, std::vector<std::string> *out) {
  bool is_arr = false;
  if (napi_is_array(env, arr, &is_arr) != napi_ok || !is_arr) return false;
  uint32_t n = 0;
  napi_get_array_length(env, arr, &n);
  out->reserve(n);
  for (uint32_t i = 0; i < n; i++) {
    napi_value v;
    napi_get_element(env, arr, i, &v);
    bool ok = false;
    out->push_back(get_string(env, v, &ok));
    if (!ok) return false;
  }
  return true;
}

napi_value tok_encode_batch(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  std::vector<std::string> seqs;
  if (argc < 1 || !read_seqs(env, argv[0], &seqs)) {
    napi_throw_type_error(env, nullptr, "encodeBatch([sequences][, opts])");
    return nullptr;
  }
  bool add_special =
      opt_add_special(env, argc >= 2 ? argv[1] : nullptr, true);
  std::vector<const char *> ptrs(seqs.size());
  for (size_t i = 0; i < seqs.size(); i++) ptrs[i] = seqs[i].c_str();
  int status = 0;
  CEncoding **encs = tokenizers_encode_batch(st->tok, ptrs.data(),
                                             ptrs.size(), add_special,
                                             &status);
  if (encs == nullptr) return throw_last(env, "encodeBatch failed");
  BatchWork tmp;
  tmp.seqs = std::move(seqs);
  tmp.encs = encs;
  return batch_to_js(env, &tmp);
}

napi_value tok_encode_batch_async(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  BatchWork *w = new BatchWork();
  w->st = st;
  if (argc < 1 || !read_seqs(env, argv[0], &w->seqs)) {
    delete w;
    napi_throw_type_error(env, nullptr,
                          "encodeBatchAsync([sequences][, opts])");
    return nullptr;
  }
  w->add_special = opt_add_special(env, argc >= 2 ? argv[1] : nullptr, true);
  napi_value promise, name;
  napi_create_promise(env, &w->deferred, &promise);
  napi_create_string_utf8(env, "tokenizersEncodeBatch", NAPI_AUTO_LENGTH,
                          &name);
  napi_create_async_work(env, nullptr, name, batch_execute, batch_complete,
                         w, &w->work);
  napi_queue_async_work(env, w->work);
  return promise;
}

napi_value tok_decode(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  bool is_arr = false;
  if (argc < 1 || napi_is_array(env, argv[0], &is_arr) != napi_ok ||
      !is_arr) {
    napi_throw_type_error(env, nullptr, "decode(ids[, skipSpecialTokens])");
    return nullptr;
  }
  uint32_t n = 0;
  napi_get_array_length(env, argv[0], &n);
  std::vector<uint32_t> ids(n);
  for (uint32_t i = 0; i < n; i++) {
    napi_value v;
    napi_get_element(env, argv[0], i, &v);
    napi_get_value_uint32(env, v, &ids[i]);
  }
  bool skip = true;
  if (argc >= 2) napi_get_value_bool(env, argv[1], &skip);
  int status = 0;
  char *s = tokenizers_decode(st->tok, ids.data(), n, skip, &status);
  if (s == nullptr) return throw_last(env, "decode failed");
  napi_value out;
  napi_create_string_utf8(env, s, NAPI_AUTO_LENGTH, &out);
  tokenizers_free_string(s);
  return out;
}

napi_value tok_token_to_id(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr || argc < 1) return nullptr;
  bool ok = false;
  std::string token = get_string(env, argv[0], &ok);
  if (!ok) return nullptr;
  int status = 0;
  int32_t id = tokenizers_token_to_id(st->tok, token.c_str(), &status);
  napi_value out;
  if (id < 0)
    napi_get_null(env, &out);
  else
    napi_create_int32(env, id, &out);
  return out;
}

napi_value tok_id_to_token(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr || argc < 1) return nullptr;
  uint32_t id = 0;
  napi_get_value_uint32(env, argv[0], &id);
  int status = 0;
  char *s = tokenizers_id_to_token(st->tok, id, &status);
  napi_value out;
  if (s == nullptr) {
    napi_get_null(env, &out);
  } else {
    napi_create_string_utf8(env, s, NAPI_AUTO_LENGTH, &out);
    tokenizers_free_string(s);
  }
  return out;
}

napi_value json_parse(napi_env env, const char *json) {
  napi_value global, json_obj, parse, arg, out;
  napi_get_global(env, &global);
  napi_get_named_property(env, global, "JSON", &json_obj);
  napi_get_named_property(env, json_obj, "parse", &parse);
  napi_create_string_utf8(env, json, NAPI_AUTO_LENGTH, &arg);
  if (napi_call_function(env, json_obj, parse, 1, &arg, &out) != napi_ok)
    return nullptr;
  return out;
}

napi_value tok_get_vocab(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  bool with_added = true;
  if (argc >= 1) napi_get_value_bool(env, argv[0], &with_added);
  int status = 0;
  char *s = tokenizers_get_vocab(st->tok, with_added, &status);
  if (s == nullptr) return throw_last(env, "getVocab failed");
  napi_value out = json_parse(env, s);
  tokenizers_free_string(s);
  return out;
}

napi_value tok_save(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  bool pretty = false;
  if (argc >= 1) napi_get_value_bool(env, argv[0], &pretty);
  int status = 0;
  char *s = tokenizers_get_config(st->tok, pretty, &status);
  if (s == nullptr) return throw_last(env, "save failed");
  napi_value out;
  napi_create_string_utf8(env, s, NAPI_AUTO_LENGTH, &out);
  tokenizers_free_string(s);
  return out;
}

napi_value tok_add_tokens_impl(napi_env env, napi_callback_info info,
                               bool special) {
  size_t argc = 1;
  napi_value argv[1] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr || argc < 1) return nullptr;
  // stringify the JS array -> JSON payload for the C ABI
  napi_value global, json_obj, stringify, out_str;
  napi_get_global(env, &global);
  napi_get_named_property(env, global, "JSON", &json_obj);
  napi_get_named_property(env, json_obj, "stringify", &stringify);
  if (napi_call_function(env, json_obj, stringify, 1, argv, &out_str) !=
      napi_ok)
    return nullptr;
  bool ok = false;
  std::string payload = get_string(env, out_str, &ok);
  if (!ok) return nullptr;
  int status = 0;
  int n = special
              ? tokenizers_add_special_tokens(st->tok, payload.c_str(),
                                              &status)
              : tokenizers_add_tokens(st->tok, payload.c_str(), &status);
  if (n < 0) return throw_last(env, "addTokens failed");
  napi_value out;
  napi_create_int32(env, n, &out);
  return out;
}

napi_value tok_add_tokens(napi_env env, napi_callback_info info) {
  return tok_add_tokens_impl(env, info, false);
}

napi_value tok_add_special_tokens(napi_env env, napi_callback_info info) {
  return tok_add_tokens_impl(env, info, true);
}

napi_value tok_train(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  std::vector<std::string> files;
  if (argc < 1 || !read_seqs(env, argv[0], &files)) {
    napi_throw_type_error(env, nullptr, "train([files][, trainerConfig])");
    return nullptr;
  }
  std::string trainer;
  bool has_trainer = false;
  if (argc >= 2) {
    napi_valuetype t;
    napi_typeof(env, argv[1], &t);
    if (t == napi_object) {
      napi_value global, json_obj, stringify, out_str;
      napi_get_global(env, &global);
      napi_get_named_property(env, global, "JSON", &json_obj);
      napi_get_named_property(env, json_obj, "stringify", &stringify);
      napi_call_function(env, json_obj, stringify, 1, &argv[1], &out_str);
      bool ok = false;
      trainer = get_string(env, out_str, &ok);
      has_trainer = ok;
    }
  }
  std::vector<const char *> ptrs(files.size());
  for (size_t i = 0; i < files.size(); i++) ptrs[i] = files[i].c_str();
  int status = 0;
  int r = tokenizers_train_from_files(
      st->tok, ptrs.data(), ptrs.size(),
      has_trainer ? trainer.c_str() : nullptr, &status);
  if (r != 0) return throw_last(env, "train failed");
  napi_value undef;
  napi_get_undefined(env, &undef);
  return undef;
}

napi_value tok_set_truncation(napi_env env, napi_callback_info info) {
  size_t argc = 2;
  napi_value argv[2] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr || argc < 1) return nullptr;
  uint32_t max_length = 0;
  napi_get_value_uint32(env, argv[0], &max_length);
  uint32_t stride = 0;
  int strategy = 0, direction = 1;
  if (argc >= 2) {
    napi_value v;
    napi_valuetype t;
    if (napi_get_named_property(env, argv[1], "stride", &v) == napi_ok &&
        napi_typeof(env, v, &t) == napi_ok && t == napi_number)
      napi_get_value_uint32(env, v, &stride);
    if (napi_get_named_property(env, argv[1], "strategy", &v) == napi_ok &&
        napi_typeof(env, v, &t) == napi_ok && t == napi_string) {
      bool ok = false;
      std::string s = get_string(env, v, &ok);
      if (s == "only_first") strategy = 1;
      if (s == "only_second") strategy = 2;
    }
  }
  int status = 0;
  tokenizers_enable_truncation(st->tok, max_length, stride, strategy,
                               direction, &status);
  napi_value undef;
  napi_get_undefined(env, &undef);
  return undef;
}

napi_value tok_disable_truncation(napi_env env, napi_callback_info info) {
  size_t argc = 0;
  TokState *st = unwrap(env, info, &argc, nullptr);
  if (st == nullptr) return nullptr;
  int status = 0;
  tokenizers_disable_truncation(st->tok, &status);
  napi_value undef;
  napi_get_undefined(env, &undef);
  return undef;
}

napi_value tok_set_padding(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  TokState *st = unwrap(env, info, &argc, argv);
  if (st == nullptr) return nullptr;
  uint32_t pad_id = 0, pad_type_id = 0;
  std::string pad_token = "[PAD]";
  size_t length = 0, multiple = 0;
  int direction = 1;
  if (argc >= 1) {
    napi_value v;
    napi_valuetype t;
    auto num = [&](const char *k, uint32_t *out) {
      if (napi_get_named_property(env, argv[0], k, &v) == napi_ok &&
          napi_typeof(env, v, &t) == napi_ok && t == napi_number)
        napi_get_value_uint32(env, v, out);
    };
    num("padId", &pad_id);
    num("padTypeId", &pad_type_id);
    uint32_t tmp = 0;
    num("maxLength", &tmp);
    length = tmp;
    tmp = 0;
    num("padToMultipleOf", &tmp);
    multiple = tmp;
    if (napi_get_named_property(env, argv[0], "padToken", &v) == napi_ok &&
        napi_typeof(env, v, &t) == napi_ok && t == napi_string) {
      bool ok = false;
      pad_token = get_string(env, v, &ok);
    }
    if (napi_get_named_property(env, argv[0], "direction", &v) == napi_ok &&
        napi_typeof(env, v, &t) == napi_ok && t == napi_string) {
      bool ok = false;
      if (get_string(env, v, &ok) == "left") direction = 0;
    }
  }
  int status = 0;
  tokenizers_enable_padding(st->tok, direction, pad_id, pad_type_id,
                            pad_token.c_str(), length, multiple, &status);
  napi_value undef;
  napi_get_undefined(env, &undef);
  return undef;
}

napi_value tok_disable_padding(napi_env env, napi_callback_info info) {
  size_t argc = 0;
  TokState *st = unwrap(env, info, &argc, nullptr);
  if (st == nullptr) return nullptr;
  int status = 0;
  tokenizers_disable_padding(st->tok, &status);
  napi_value undef;
  napi_get_undefined(env, &undef);
  return undef;
}

// ---- constructor / statics ------------------------------------------------

napi_ref g_ctor_ref = nullptr;

napi_value tok_ctor(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  napi_value self;
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, &self, nullptr));
  if (argc < 1) {
    napi_throw_type_error(env, nullptr, "new Tokenizer(configJson)");
    return nullptr;
  }
  bool ok = false;
  std::string json = get_string(env, argv[0], &ok);
  if (!ok) return nullptr;
  int status = 0;
  CTokenizer *tok = tokenizers_create(json.c_str(), &status);
  if (tok == nullptr) return throw_last(env, "Tokenizer construction failed");
  TokState *st = new TokState{tok};
  NAPI_CALL(env, napi_wrap(env, self, st, tok_finalize, nullptr, nullptr));
  return self;
}

napi_value tok_from_string(napi_env env, napi_callback_info info) {
  size_t argc = 1;
  napi_value argv[1] = {};
  NAPI_CALL(env, napi_get_cb_info(env, info, &argc, argv, nullptr, nullptr));
  napi_value ctor;
  NAPI_CALL(env, napi_get_reference_value(env, g_ctor_ref, &ctor));
  napi_value out;
  NAPI_CALL(env, napi_new_instance(env, ctor, argc, argv, &out));
  return out;
}

napi_value module_init(napi_env env, napi_value exports) {
  napi_property_descriptor methods[] = {
      {"encode", nullptr, tok_encode, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"encodeBatch", nullptr, tok_encode_batch, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"encodeBatchAsync", nullptr, tok_encode_batch_async, nullptr, nullptr,
       nullptr, napi_default, nullptr},
      {"decode", nullptr, tok_decode, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"tokenToId", nullptr, tok_token_to_id, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"idToToken", nullptr, tok_id_to_token, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"getVocab", nullptr, tok_get_vocab, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"save", nullptr, tok_save, nullptr, nullptr, nullptr, napi_default,
       nullptr},
      {"addTokens", nullptr, tok_add_tokens, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"addSpecialTokens", nullptr, tok_add_special_tokens, nullptr, nullptr,
       nullptr, napi_default, nullptr},
      {"train", nullptr, tok_train, nullptr, nullptr, nullptr, napi_default,
       nullptr},
      {"setTruncation", nullptr, tok_set_truncation, nullptr, nullptr,
       nullptr, napi_default, nullptr},
      {"disableTruncation", nullptr, tok_disable_truncation, nullptr,
       nullptr, nullptr, napi_default, nullptr},
      {"setPadding", nullptr, tok_set_padding, nullptr, nullptr, nullptr,
       napi_default, nullptr},
      {"disablePadding", nullptr, tok_disable_padding, nullptr, nullptr,
       nullptr, napi_default, nullptr},
  };
  napi_value ctor;
  if (napi_define_class(env, "Tokenizer", NAPI_AUTO_LENGTH, tok_ctor,
                        nullptr, sizeof(methods) / sizeof(methods[0]),
                        methods, &ctor) != napi_ok)
    return nullptr;
  napi_create_reference(env, ctor, 1, &g_ctor_ref);
  napi_set_named_property(env, exports, "Tokenizer", ctor);

  napi_value from_str_fn;
  napi_create_function(env, "tokenizerFromString", NAPI_AUTO_LENGTH,
                       tok_from_string, nullptr, &from_str_fn);
  napi_set_named_property(env, exports, "tokenizerFromString", from_str_fn);
  return exports;
}

}  // namespace

NAPI_MODULE(tokenizers_tpu, module_init)
