#!/usr/bin/env python3
"""Train a small deterministic BPE vocabulary and emit goldens for the Scala
tokenizer (graft.pipeline.Bpe):

- src/test/resources/fixtures/bpe_merges.txt   — ranked merge list "a b"
- src/test/resources/fixtures/bpe_golden.tsv   — text<TAB>count<TAB>tokens
  (tokens space-joined; words never contain whitespace)
- src/test/resources/fixtures/bpe_vocab.txt    — one token per line, id =
  line index; line 0 is "<unk>", then all corpus-reachable symbols sorted
- src/test/resources/fixtures/bpe_ids_golden.tsv — text<TAB>space-joined ids
  (tokens absent from the vocab map to <unk> = 0)
- src/test/resources/fixtures/bpe_corpus.txt   — the training corpus itself
  (consumed by BpeTrainerSpec: the Scala distributed trainer must reproduce
  bpe_merges.txt token-for-token from this text)
- src/test/resources/fixtures/bpe_vocab_bytes.txt — byte-fallback vocab:
  "<unk>", the 256 "<0xNN>" byte tokens, then the corpus symbols sorted
- src/test/resources/fixtures/bpe_ids_bytes_golden.tsv — byte-fallback ids
  for the non-Latin texts: unknown tokens decompose to UTF-8 byte tokens
  (a "</w>"-suffixed unknown emits its stem's bytes then the "</w>" id) —
  no information loss, decode() round-trips the normalized text

Algorithm (Sennrich-style word-level BPE, character base):
- normalize: lowercase, split on whitespace
- a word's symbols start as its characters plus a terminal "</w>" marker
- training: repeatedly merge the most frequent adjacent symbol pair over the
  weighted corpus vocabulary; ties break lexicographically (deterministic)
- application: repeatedly merge the LOWEST-RANK pair present in the word,
  all occurrences left-to-right, until none applies

The Scala side must reproduce token counts exactly (BpeSpec).
"""
import json
import re
from collections import Counter

N_MERGES = 200
EOW = "</w>"

CORPUS = """
the quick brown fox jumps over the lazy dog and the dog barks back
large language models are trained on large corpora of text data
spark executes distributed data processing pipelines at scale
the training data pipeline deduplicates documents and counts tokens
feature engineering transforms raw columns into model inputs
conversations between users and assistants span many turns of dialogue
tokenization splits text into subword units for the model vocabulary
the optimizer rewrites the logical plan into an efficient physical plan
streaming queries process unbounded feeds with bounded state
embedding vectors support approximate nearest neighbor search
quality scoring filters low quality documents from the corpus
deterministic fixtures keep the test suite reproducible over time
"""

TEST_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "spark pipelines process large text corpora",
    "tokenization of unseen words like zymurgy and quixotic",
    "The Training DATA pipeline counts tokens",
    "singleword",
    "a b c",
    "",
]

# byte-fallback goldens: scripts absent from the (ASCII) corpus alphabet —
# already lowercase, so Python .lower() and Java toLowerCase(ROOT) agree
BYTELEVEL_TEXTS = [
    "γράφειν means to write",
    "日本語 テスト data",
    "mixed ørsted çünkü tokens",
    "the quick brown fox",  # fully in-vocab: ids must match the plain path
]

BYTE_TOKENS = ["<0x%02X>" % i for i in range(256)]
EOW_ID_NOTE = "a '</w>'-suffixed unknown emits stem bytes then the </w> id"


def encode_bytefallback(tok, ids):
    if tok in ids:
        return [ids[tok]]
    stem = tok[: -len(EOW)] if tok.endswith(EOW) else None
    if stem is not None:
        return [ids[BYTE_TOKENS[b]] for b in stem.encode("utf-8")] + [ids[EOW]]
    return [ids[BYTE_TOKENS[b]] for b in tok.encode("utf-8")]


def words(text):
    return [w for w in re.split(r"\s+", text.lower().strip()) if w]


def train(corpus, n_merges):
    vocab = Counter(tuple(w) + (EOW,) for w in words(corpus))
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        # max count, ties lexicographic (deterministic)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = Counter()
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


def apply_bpe(word, ranks):
    sym = list(word) + [EOW]
    while True:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            return sym
        out = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best_pair:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out


def main():
    merges = train(CORPUS, N_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}
    with open("src/test/resources/fixtures/bpe_merges.txt", "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    golden = {}
    for t in TEST_TEXTS:
        toks = [tok for w in words(t) for tok in apply_bpe(w, ranks)]
        golden[t] = [len(toks), toks]
    with open("src/test/resources/fixtures/bpe_golden.tsv", "w") as f:
        for t, (n, toks) in golden.items():
            f.write(f"{t}\t{n}\t{' '.join(toks)}\n")
    # vocab: <unk> + every corpus-reachable symbol (base chars + EOW +
    # merge components and results), sorted by code point — id = line index
    symbols = set()
    for w in words(CORPUS):
        symbols.update(w)
    symbols.add(EOW)
    for a, b in merges:
        symbols.update((a, b, a + b))
    vocab = ["<unk>"] + sorted(symbols)
    ids = {tok: i for i, tok in enumerate(vocab)}
    with open("src/test/resources/fixtures/bpe_vocab.txt", "w") as f:
        for tok in vocab:
            f.write(tok + "\n")
    with open("src/test/resources/fixtures/bpe_ids_golden.tsv", "w") as f:
        for t, (_, toks) in golden.items():
            f.write(f"{t}\t{' '.join(str(ids.get(tok, 0)) for tok in toks)}\n")
    # the corpus itself, for the Scala distributed-trainer parity spec
    with open("src/test/resources/fixtures/bpe_corpus.txt", "w") as f:
        f.write(CORPUS)
    # byte-fallback vocab + ids goldens (regenerate together with the above)
    vocab_b = ["<unk>"] + BYTE_TOKENS + sorted(symbols)
    ids_b = {tok: i for i, tok in enumerate(vocab_b)}
    with open("src/test/resources/fixtures/bpe_vocab_bytes.txt", "w") as f:
        for tok in vocab_b:
            f.write(tok + "\n")
    with open("src/test/resources/fixtures/bpe_ids_bytes_golden.tsv", "w") as f:
        for t in BYTELEVEL_TEXTS:
            toks = [tok for w in words(t) for tok in apply_bpe(w, ranks)]
            enc = [i for tok in toks for i in encode_bytefallback(tok, ids_b)]
            f.write(f"{t}\t{' '.join(map(str, enc))}\n")
    print(f"{len(merges)} merges; vocab {len(vocab)}; golden for {len(TEST_TEXTS)} texts")
    for t in TEST_TEXTS[:3]:
        print(repr(t), "->", golden[t][0], golden[t][1][:8])


if __name__ == "__main__":
    main()
