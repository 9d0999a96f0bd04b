#!/usr/bin/env python3
"""Train the committed BPE artifact (dev tooling, not part of the engine).

Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", arXiv:1508.07909) character-level BPE with an explicit
end-of-word symbol '</w>':

  - a word's initial symbol sequence is its characters plus '</w>'
  - each step merges the most frequent adjacent symbol pair across the
    (frequency-weighted) word vocabulary; ties break lexicographically
    so training is deterministic
  - the merge list IS the tokenizer: encoding replays merges in rank
    order (lowest rank first, all occurrences left-to-right)

Usage: python3 tools/train_bpe.py <documents.parquet> <n_merges> <outdir>

Writes <outdir>/merges.txt (rank-ordered 'left right' lines under a
header) and <outdir>/vocab.txt (one symbol per line: all single
characters seen, '</w>', then each merge's output in rank order).
The committed fixture under src/main/resources/graft/bpe/ was produced
from /root/testdata/sf0.01/documents.parquet with 40 merges.
"""
import sys, collections
import duckdb


def train(words, n_merges):
    # word -> frequency, word as tuple of symbols
    vocab = {}
    for w, f in words.items():
        vocab[tuple(list(w) + ["</w>"])] = f
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic: max frequency, then lexicographically smallest
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1
                        and syms[i] == best[0] and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def main(parquet, n_merges, outdir):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, COUNT(*) f FROM (SELECT unnest(string_split_regex(text,"
        " '\\s+')) w FROM read_parquet(?)) WHERE w <> '' GROUP BY w",
        [parquet]).fetchall()
    words = dict(rows)
    merges = train(words, n_merges)
    chars = sorted({c for w in words for c in w})
    import os
    os.makedirs(outdir, exist_ok=True)
    with open(f"{outdir}/merges.txt", "w") as f:
        f.write(f"#version: graft-bpe-1 merges={len(merges)}\n")
        for l, r in merges:
            f.write(f"{l} {r}\n")
    with open(f"{outdir}/vocab.txt", "w") as f:
        for c in chars:
            f.write(c + "\n")
        f.write("</w>\n")
        for l, r in merges:
            f.write(l + r + "\n")
    print(f"{len(words)} words, {len(merges)} merges, "
          f"{len(chars)} base chars -> {outdir}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), sys.argv[3])
