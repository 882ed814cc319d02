/* Minimal driver for the tokenizers_tpu C ABI (used by
 * tests/test_c_api.py): load a tokenizer.json, encode argv[2], print ids,
 * tokens, offsets and a decode round-trip. */
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct CTokenizer CTokenizer;
typedef struct CEncoding CEncoding;

extern const char *tokenizers_get_last_error(void);
extern CTokenizer *tokenizers_create(const char *json, int *status);
extern void tokenizers_free(CTokenizer *);
extern CEncoding *tokenizers_encode(CTokenizer *, const char *seq,
                                    const char *pair, bool add_special,
                                    size_t *len, int *status);
extern void tokenizers_encoding_free(CEncoding *);
extern void tokenizers_encoding_get_ids(const CEncoding *, uint32_t *, size_t);
extern void tokenizers_encoding_get_tokens(const CEncoding *, char **, size_t);
extern void tokenizers_encoding_get_offsets(const CEncoding *, uint32_t *,
                                            size_t);
extern void tokenizers_encoding_get_word_ids(const CEncoding *, int32_t *,
                                             size_t);
extern char *tokenizers_decode(const CTokenizer *, const uint32_t *, size_t,
                               bool, int *);
extern void tokenizers_free_string(char *);
extern int32_t tokenizers_token_to_id(const CTokenizer *, const char *, int *);
extern size_t tokenizers_encoding_len(const CEncoding *);
extern CEncoding **tokenizers_encode_batch(CTokenizer *, const char **seqs,
                                           size_t n, bool add_special,
                                           int *status);
extern void tokenizers_encoding_array_free(CEncoding **, size_t n);
extern int tokenizers_train_from_files(CTokenizer *, const char **files,
                                       size_t n, const char *trainer_json,
                                       int *status);

static char *read_file(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  char *buf = malloc(n + 1);
  if (fread(buf, 1, n, f) != (size_t)n) {
    fclose(f);
    free(buf);
    return NULL;
  }
  buf[n] = 0;
  fclose(f);
  return buf;
}

/* --batch mode: encode argv[3..] as one batch, print per-input ids via
 * tokenizers_encode_batch + tokenizers_encoding_len. */
static int run_batch(CTokenizer *tok, int n, char **seqs) {
  int status = -1;
  CEncoding **encs =
      tokenizers_encode_batch(tok, (const char **)seqs, n, true, &status);
  if (!encs || status != 0) {
    fprintf(stderr, "encode_batch failed: %s\n", tokenizers_get_last_error());
    return 1;
  }
  for (int i = 0; i < n; i++) {
    size_t len = tokenizers_encoding_len(encs[i]);
    uint32_t *ids = malloc(len * sizeof(uint32_t));
    tokenizers_encoding_get_ids(encs[i], ids, len);
    printf("ids[%d]:", i);
    for (size_t j = 0; j < len; j++) printf(" %u", ids[j]);
    printf("\n");
    free(ids);
  }
  tokenizers_encoding_array_free(encs, n);
  return 0;
}

/* --train mode: argv[3] = corpus file; train BPE vocab 40, print size of
 * an encode of "hug". */
static int run_train(CTokenizer *tok, const char *corpus) {
  int status = -1;
  const char *files[1] = {corpus};
  int r = tokenizers_train_from_files(
      tok, files, 1, "{\"type\": \"BpeTrainer\", \"vocab_size\": 40}",
      &status);
  if (r != 0 || status != 0) {
    fprintf(stderr, "train failed: %s\n", tokenizers_get_last_error());
    return 1;
  }
  size_t len = 0;
  CEncoding *enc = tokenizers_encode(tok, "hug", NULL, true, &len, &status);
  if (!enc) {
    fprintf(stderr, "post-train encode failed\n");
    return 1;
  }
  printf("trained_encode_len: %zu\n", len);
  tokenizers_encoding_free(enc);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: %s tokenizer.json text [pair]\n", argv[0]);
    return 2;
  }
  char *json = read_file(argv[1]);
  if (!json) {
    fprintf(stderr, "cannot read %s\n", argv[1]);
    return 2;
  }
  int status = -1;
  CTokenizer *tok = tokenizers_create(json, &status);
  free(json);
  if (!tok || status != 0) {
    fprintf(stderr, "create failed: %s\n", tokenizers_get_last_error());
    return 1;
  }
  if (strcmp(argv[2], "--batch") == 0) {
    int r = run_batch(tok, argc - 3, argv + 3);
    tokenizers_free(tok);
    return r;
  }
  if (strcmp(argv[2], "--train") == 0 && argc > 3) {
    int r = run_train(tok, argv[3]);
    tokenizers_free(tok);
    return r;
  }
  size_t len = 0;
  CEncoding *enc = tokenizers_encode(tok, argv[2], argc > 3 ? argv[3] : NULL,
                                     true, &len, &status);
  if (!enc || status != 0) {
    fprintf(stderr, "encode failed: %s\n", tokenizers_get_last_error());
    return 1;
  }
  uint32_t *ids = malloc(len * sizeof(uint32_t));
  tokenizers_encoding_get_ids(enc, ids, len);
  printf("ids:");
  for (size_t i = 0; i < len; i++) printf(" %u", ids[i]);
  printf("\n");

  char **tokens = calloc(len, sizeof(char *));
  tokenizers_encoding_get_tokens(enc, tokens, len);
  printf("tokens:");
  for (size_t i = 0; i < len; i++) {
    printf(" %s", tokens[i] ? tokens[i] : "?");
    free(tokens[i]);
  }
  printf("\n");
  free(tokens);

  uint32_t *offs = malloc(2 * len * sizeof(uint32_t));
  tokenizers_encoding_get_offsets(enc, offs, 2 * len);
  printf("offsets:");
  for (size_t i = 0; i < len; i++) printf(" %u-%u", offs[2 * i], offs[2 * i + 1]);
  printf("\n");
  free(offs);

  char *text = tokenizers_decode(tok, ids, len, true, &status);
  printf("decode: %s\n", text ? text : "(null)");
  tokenizers_free_string(text);
  free(ids);
  tokenizers_encoding_free(enc);
  tokenizers_free(tok);
  return 0;
}
