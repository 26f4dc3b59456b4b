#!/usr/bin/env python3
"""Generate the committed BPE fixtures that anchor graft's tokenizer ops.

Independent REFERENCE implementation of byte-pair-encoding training and
encoding (the canonical Sennrich/GPT-2 word-level algorithm), run over
the driver-generated documents tables:

 - src/test/resources/bpe_merges.parquet   (rank, left, right, freq)
     merge table trained on the sf0.01 corpus word frequencies
     (num_merges=24, min_freq=2; ties broken by lexicographic pair)
 - src/test/resources/bpe_word_tokens.parquet (word, n_tokens, tokens)
     every distinct word across sf0.001/sf0.01/sf0.1, encoded with that
     merge table by the reference encoder

The Scala ops (graft.ops.Tokenize) must reproduce BOTH tables exactly;
the t_bpe_encode oracle joins DuckDB-exploded words against
bpe_word_tokens, so any Spark-side divergence surfaces as a hash
mismatch. Pre-tokenization on both engines: lower(text) split on
[^a-z0-9]+, empty strings dropped.

Run from the repo root: python3 scripts/gen_bpe_fixture.py
"""
import duckdb

NUM_MERGES = 24
MIN_FREQ = 2
SFS = ["0.001", "0.01", "0.1"]
TRAIN_SF = "0.01"


def word_freqs(con, sf):
    return dict(con.execute(f"""
        SELECT w, COUNT(*)::BIGINT FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM read_parquet('/root/testdata/sf{sf}/documents.parquet'))
        WHERE w <> '' GROUP BY w""").fetchall())


def get_stats(vocab):
    """Adjacent-pair frequencies over the tokenized vocab (overlaps count:
    'aaa' contributes (a,a) twice)."""
    counts = {}
    for toks, freq in vocab:
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def merge_word(toks, pair):
    """Merge ALL occurrences of `pair`, greedy left-to-right (an emitted
    merge consumes both tokens, so overlapping occurrences skip)."""
    out, i = [], 0
    while i < len(toks):
        if i < len(toks) - 1 and (toks[i], toks[i + 1]) == pair:
            out.append(toks[i] + toks[i + 1])
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def train(freqs, num_merges, min_freq):
    vocab = [([c for c in w], f) for w, f in sorted(freqs.items())]
    merges = []
    for rank in range(num_merges):
        counts = get_stats([(t, f) for t, f in vocab if len(t) > 1])
        if not counts:
            break
        # deterministic: max freq, ties -> lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), f = best
        if f < min_freq:
            break
        merges.append((rank, l, r, f))
        vocab = [(merge_word(t, (l, r)), fq) for t, fq in vocab]
    return merges


def encode(word, ranks):
    """GPT-2-style encode: repeatedly merge the present pair with the
    lowest rank (all its occurrences at once) until none applies."""
    toks = [c for c in word]
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        toks = merge_word(toks, best)
    return toks


def main():
    con = duckdb.connect()
    merges = train(word_freqs(con, TRAIN_SF), NUM_MERGES, MIN_FREQ)
    ranks = {(l, r): k for k, l, r, _ in merges}
    all_words = set()
    for sf in SFS:
        all_words |= set(word_freqs(con, sf))
    rows = []
    for w in sorted(all_words):
        toks = encode(w, ranks)
        rows.append((w, len(toks), " ".join(toks)))
    con.execute('CREATE TABLE m (rank BIGINT, "left" VARCHAR, "right" VARCHAR, freq BIGINT)')
    con.executemany("INSERT INTO m VALUES (?,?,?,?)", merges)
    con.execute("COPY m TO 'src/test/resources/bpe_merges.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE t (word VARCHAR, n_tokens BIGINT, tokens VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    con.execute("COPY t TO 'src/test/resources/bpe_word_tokens.parquet' (FORMAT PARQUET)")
    print(f"merges: {len(merges)}; words: {len(rows)}")
    for m in merges[:8]:
        print(" ", m)
    for r in rows[:5]:
        print(" ", r)


if __name__ == "__main__":
    main()
