#!/usr/bin/env python3
"""Generate the committed BYTE-LEVEL BPE fixtures (GPT-2 scheme).

Independent reference implementation of the GPT-2 byte-level tokenizer
discipline — the byte-to-printable-unicode table, the pre-tokenization
pattern `'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|
\\s+(?!\\S)|\\s+` executed by the ACTUAL Python `regex` module (the
engine the published GPT-2 tokenizer uses — `regex.findall` on the
published pattern, so the cross-check against the Scala code-point
scanner is genuinely independent: a shared scanner bug cannot hide),
and the canonical BPE train/encode loops. Emits:

 - src/test/resources/bpe_bytes_merges.parquet (rank, left, right, freq)
     byte-level merge table trained on the sf0.01 documents corpus
     (num_merges=24, min_freq=2; mapped-symbol pairs)
 - src/test/resources/bpe_bytes_pretoken_tokens.parquet
     (pretoken, n_tokens, ids_sum): every distinct RAW pre-token across
     sf0.001/sf0.01/sf0.1 encoded with that merge table — the
     t_bpe_bytes / t_bpe_ids oracles join DuckDB-extracted pre-tokens
     against it. ids follow the GPT-2 vocabulary order: 0..255 the
     mapped byte symbols in byte order, 256+rank each merge's
     concatenation; ids_sum is the plain sum of the pre-token's ids
 - src/test/resources/bpe_bytes_spec.parquet
     (text_id, text, n_pretokens, n_tokens, tokens): gnarly constructed
     texts (case, contractions, punctuation, digits, tabs, multi-space,
     unicode incl. non-BMP) with expected encodings under the spec merge
     table — BpeSpec pins the Scala encoder against every row
 - src/test/resources/bpe_bytes_spec_merges.parquet
     (rank, left, right, freq): merge table trained on the gnarly corpus
     itself (num_merges=40), so merges cross case/space/punct boundaries
 - src/test/resources/bpe_bytes_special_spec.parquet
     (text_id, n_tokens, ids_sum, last_id): the same gnarly texts encoded
     WITH a document-boundary special token (<|endoftext|>, reserved id
     256 + num_spec_merges) appended — pins the Scala encoder's
     `boundary` insertion and id arithmetic; a text containing the
     special's literal spelling must still encode it as plain bytes

Run from the repo root: python3 scripts/gen_bpe_bytes_fixture.py
"""
import duckdb
import regex

NUM_MERGES = 24
SPEC_MERGES = 40
MIN_FREQ = 2
SFS = ["0.001", "0.01", "0.1"]
TRAIN_SF = "0.01"


# ---- byte <-> printable-unicode table (public GPT-2 construction) ----
def bytes_to_unicode():
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


B2U = bytes_to_unicode()


def byte_map(s):
    return "".join(B2U[b] for b in s.encode("utf-8"))


# ---- pre-tokenization: the ACTUAL published GPT-2 pattern, run by the
# ---- actual `regex` engine (Radford et al. 2019 tokenizer) — NOT a
# ---- port of the Scala scanner, so the fixture cross-check is a
# ---- genuinely independent second implementation
GPT2_PAT = regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
    r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


def pretokenize(text):
    return GPT2_PAT.findall(text)


# ---- canonical BPE train/encode (same loops as gen_bpe_fixture.py) ---
def get_stats(vocab):
    counts = {}
    for toks, freq in vocab:
        for i in range(len(toks) - 1):
            p = (toks[i], toks[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def merge_word(toks, pair):
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
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), f = best
        if f < min_freq:
            break
        merges.append((rank, l, r, f))
        vocab = [(merge_word(t, (l, r)), fq) for t, fq in vocab]
    return merges


def encode(word, ranks):
    toks = [c for c in word]
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        toks = merge_word(toks, best)
    return toks


def pretoken_freqs(con, sf):
    freqs = {}
    for (text,) in con.execute(
        f"SELECT text FROM read_parquet('/root/testdata/sf{sf}"
        "/documents.parquet')"
    ).fetchall():
        for p in pretokenize(text or ""):
            w = byte_map(p)
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


# gnarly spec corpus: case, contractions, punctuation runs, digits,
# tabs, multi-space, unicode (latin-1, CJK, non-BMP emoji), lone quotes
SPEC_TEXTS = [
    "Hello world",
    "hello world hello world hello",
    "She said: \"don't, won't, CAN'T!\"  (twice)",
    "It's the 3rd time... it's the 42nd time!!",
    "tabs\there\tand  double  spaces   triple",
    "trailing spaces   ",
    "   leading spaces",
    "MixedCASE Words And ALLCAPS",
    "café naïve über straße",
    "日本語のテキスト",
    "emoji \U0001f600 and \U0001f680 fly",
    "numbers 123 45.67 8,900 and IV",
    "don'tdon't they'll they'd we're I'm you've",
    "a'x 'start end' it'",
    "newline\nhere and\r\nwindows",
    "",
    "'s",
    " ",
    "  ",
    "hello   world",
    # the special's literal spelling INSIDE data — must encode as plain
    # bytes (data can never inject a control token)
    "injected <|endoftext|> literal",
    # Unicode whitespace — \s in the regex module is the Unicode
    # White_Space property, NOT the ASCII set: NBSP (HTML corpora),
    # ideographic space, NEL, thin/em spaces must pre-tokenize as
    # whitespace on both engines
    "nbsp glued here",
    "ideographic　space　run",
    "nelline and thin space",
    "mix     ws !",
]


def main():
    con = duckdb.connect()

    # corpus-trained table + pre-token encodings for the oracle
    merges = train(pretoken_freqs(con, TRAIN_SF), NUM_MERGES, MIN_FREQ)
    ranks = {(l, r): k for k, l, r, _ in merges}
    all_pre = set()
    for sf in SFS:
        for (text,) in con.execute(
            f"SELECT text FROM read_parquet('/root/testdata/sf{sf}"
            "/documents.parquet')"
        ).fetchall():
            all_pre |= set(pretokenize(text or ""))
    # GPT-2 vocabulary ids: byte symbols 0..255, then merges by rank
    # (duplicate strings keep the LAST id — dict semantics, mirrored by
    # the Scala side's toMap)
    tok_ids = {}
    for i, b in enumerate(range(256)):
        tok_ids[B2U[b]] = i
    for k, l, r, _ in merges:
        tok_ids[l + r] = 256 + k
    pre_rows = []
    for p in sorted(all_pre):
        toks = encode(byte_map(p), ranks)
        pre_rows.append((p, len(toks), sum(tok_ids[t] for t in toks)))
    con.execute(
        'CREATE TABLE m (rank BIGINT, "left" VARCHAR, "right" VARCHAR,'
        " freq BIGINT)"
    )
    con.executemany("INSERT INTO m VALUES (?,?,?,?)", merges)
    con.execute(
        "COPY m TO 'src/test/resources/bpe_bytes_merges.parquet'"
        " (FORMAT PARQUET)"
    )
    con.execute(
        "CREATE TABLE p (pretoken VARCHAR, n_tokens BIGINT,"
        " ids_sum BIGINT)"
    )
    con.executemany("INSERT INTO p VALUES (?,?,?)", pre_rows)
    con.execute(
        "COPY p TO 'src/test/resources/bpe_bytes_pretoken_tokens.parquet'"
        " (FORMAT PARQUET)"
    )

    # gnarly spec corpus: own merge table + expected per-text encodings
    spec_freqs = {}
    for t in SPEC_TEXTS:
        for p in pretokenize(t):
            w = byte_map(p)
            spec_freqs[w] = spec_freqs.get(w, 0) + 1
    smerges = train(spec_freqs, SPEC_MERGES, MIN_FREQ)
    sranks = {(l, r): k for k, l, r, _ in smerges}
    srows = []
    for tid, t in enumerate(SPEC_TEXTS):
        pres = pretokenize(t)
        toks = []
        for p in pres:
            toks.extend(encode(byte_map(p), sranks))
        srows.append((tid, t, len(pres), len(toks), " ".join(toks)))
    con.execute(
        'CREATE TABLE sm (rank BIGINT, "left" VARCHAR, "right" VARCHAR,'
        " freq BIGINT)"
    )
    con.executemany("INSERT INTO sm VALUES (?,?,?,?)", smerges)
    con.execute(
        "COPY sm TO 'src/test/resources/bpe_bytes_spec_merges.parquet'"
        " (FORMAT PARQUET)"
    )
    con.execute(
        "CREATE TABLE st (text_id BIGINT, text VARCHAR,"
        " n_pretokens BIGINT, n_tokens BIGINT, tokens VARCHAR)"
    )
    con.executemany("INSERT INTO st VALUES (?,?,?,?,?)", srows)
    con.execute(
        "COPY st TO 'src/test/resources/bpe_bytes_spec.parquet'"
        " (FORMAT PARQUET)"
    )

    # special-token expectations: document boundary <|endoftext|>
    # appended to every text; its reserved id sits after the merge ids.
    # Independent arithmetic (ids rebuilt here, not derived from srows).
    stok_ids = {}
    for i in range(256):
        stok_ids[B2U[i]] = i
    for k, l, r, _ in smerges:
        stok_ids[l + r] = 256 + k
    eot_id = 256 + len(smerges)
    sprows = []
    for tid, t in enumerate(SPEC_TEXTS):
        ids = []
        for p in pretokenize(t):
            ids.extend(stok_ids[x] for x in encode(byte_map(p), sranks))
        ids.append(eot_id)
        sprows.append((tid, len(ids), sum(ids), ids[-1]))
    con.execute(
        "CREATE TABLE sp (text_id BIGINT, n_tokens BIGINT,"
        " ids_sum BIGINT, last_id BIGINT)"
    )
    con.executemany("INSERT INTO sp VALUES (?,?,?,?)", sprows)
    con.execute(
        "COPY sp TO 'src/test/resources/bpe_bytes_special_spec.parquet'"
        " (FORMAT PARQUET)"
    )
    print(f"corpus merges: {len(merges)}; pretokens: {len(pre_rows)}")
    for m in merges[:8]:
        print(" ", m)
    print(f"spec merges: {len(smerges)}; spec texts: {len(srows)}")
    for r in srows[:6]:
        print(" ", r)


if __name__ == "__main__":
    main()
