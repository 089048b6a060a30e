"""BPE tokenizer training over a distributed corpus.

The reference engine tokenizes only for embedding inference (SURVEY.md §2,
`/root/reference/src/onnx.rs` loads a prebuilt tokenizer.json); it has no
tokenizer TRAINING. Training one is a canonical large-corpus job, and its
scale shape is well understood (Sennrich et al. 2016; the HuggingFace
tokenizers trainer does the same split):

1. **Word counting is the corpus-sized step** — one scan + one shuffle on
   the word with map-side combine. At 100 TB this is the only part that
   touches every byte, and it is exactly a `groupBy(word).count()`.
2. **Pair counting / merge learning runs over the VOCABULARY** — millions
   of distinct words with frequencies, not billions of tokens. Adjacent
   symbol pairs are generated per distinct word and weighted by the word's
   corpus frequency, so the explode is vocab-sized.

`bpe_pair_counts` keeps step 2 distributed too (a row-local zip of each
word's symbol array with its own tail, then one weighted groupBy) — this
is the oracle-checkable first BPE iteration. `learn_bpe` collects the
frequency-truncated vocab to the driver and runs the merge loop locally,
which is how production trainers work: after step 1 the vocab table is
KB-to-GB, not TB, and the merge loop is inherently sequential (merge i+1
depends on merge i), so distributing it buys nothing and costs a shuffle
per merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from valentinus_spark.functions.text import _TOKEN_REGEX, normalize_text, word_tokens
from valentinus_spark.functions.util import ensure_parallelism


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    letters_only: bool = True,
) -> DataFrame:
    """Distributed word count: ``word, freq``. The one corpus-sized
    shuffle of BPE training; partial aggregation makes the shuffle rows
    |vocab|-per-partition, not |tokens|.

    ``letters_only`` restricts to alphabetic tokens (digits/punctuation
    train degenerate merges); the full `_TOKEN_REGEX` is used otherwise.
    """
    s = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    pattern = "[a-zA-Z]+" if letters_only else _TOKEN_REGEX
    toks = F.regexp_extract_all(s, F.lit(pattern), 0)
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int | None = 20,
    lowercase: bool = True,
) -> DataFrame:
    """First BPE iteration, fully distributed: corpus-weighted counts of
    adjacent CHARACTER pairs within words → ``left_sym, right_sym,
    pair_count``, the merge candidates ranked ``pair_count desc,
    left_sym asc, right_sym asc`` (SQL-keyword-safe column names).

    Plan shape: word-count shuffle (corpus-sized, map-side combined) →
    row-local `arrays_zip(chars, tail(chars))` over the distinct-word
    table → weighted groupBy on the pair (vocab-sized shuffle) → global
    top-k (`TakeOrderedAndProject`, no full sort). Nothing after the
    word count is proportional to corpus size.
    """
    vocab = word_frequencies(df, text_col=text_col, lowercase=lowercase)
    chars = F.regexp_extract_all(F.col("word"), F.lit("."), 0)
    pairs = F.arrays_zip(
        F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0))).alias("left"),
        F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))).alias("right"),
    )
    counted = (
        vocab.filter(F.length("word") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p")["left"].alias("left_sym"),
            F.col("p")["right"].alias("right_sym"),
        )
        .agg(F.sum("freq").alias("pair_count"))
    )
    if k is not None:
        counted = counted.orderBy(
            F.col("pair_count").desc(),
            F.col("left_sym").asc(),
            F.col("right_sym").asc(),
        ).limit(k)
    return counted


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. Distributed word count, then the
    inherently-sequential merge loop runs locally over the collected
    vocab (frequency-truncated to ``max_vocab`` distinct words — the
    driver holds words+freqs, never documents). Ties break like
    `bpe_pair_counts`: count desc, then pair lexicographic asc, so the
    learned merge table is deterministic for a given corpus.
    """
    rows = (
        word_frequencies(df, text_col=text_col, lowercase=lowercase)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {tuple(r["word"]): r["freq"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
    letters_only: bool = True,
) -> DataFrame:
    """Apply a learned merge table: ``out_col`` = array<string> of subword
    tokens per document (greedy lowest-rank-first, the standard BPE
    encode — provably identical to replaying the merges in training
    order, since a merge can never re-create an earlier merge's pair).

    Scale shape: embarrassingly parallel — the merge table (a few 10k
    string pairs) ships once per executor inside the Arrow-batched UDF
    closure; a per-batch word cache collapses the Zipfian word
    distribution, so the merge loop runs once per DISTINCT word per
    batch, not once per token. No shuffle at all; tokenization cost is
    the same map-side pass the embedding UDF makes.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pairs = [tuple(p) for p in merges]
    pattern = "[a-zA-Z]+" if letters_only else _TOKEN_REGEX

    @pandas_udf("array<string>")
    def encode(texts):
        rx = _re.compile(pattern)
        cache: dict = {}

        def enc_word(w):
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            while len(syms) > 1:
                best = None
                for a, b in zip(syms, syms[1:]):
                    r = ranks.get((a, b))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                a, b = pairs[best]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = syms
            return syms

        result = []
        for t in texts:
            t = "" if t is None else (t.lower() if lowercase else t)
            toks: list = []
            for w in rx.findall(t):
                toks.extend(enc_word(w))
            result.append(toks)
        return pd.Series(result)

    return df.withColumn(out_col, encode(F.col(text_col)))

def unigram_encode(
    df: DataFrame,
    vocab: dict[str, float],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    unk_logprob: float = -100.0,
    lowercase: bool = True,
    letters_only: bool = True,
) -> DataFrame:
    """Unigram-LM (SentencePiece-style) encoding: per word, the Viterbi
    segmentation maximizing the sum of piece log-probabilities over the
    given ``vocab`` (Kudo 2018). Pieces absent from the vocab fall back
    to single characters at ``unk_logprob``, so every word segments.
    The OTHER standard subword scheme next to BPE (operators/tokenizer
    bpe_encode): probabilities instead of merge ranks.

    Determinism contract (what makes the planted driver oracle exact):
    ties in total log-probability break toward the segmentation with
    FEWER pieces, then lexicographically smaller piece sequence — the
    dp carries (score, -n_pieces) and compares piece strings on equal
    scores, so two engines agree bit-for-bit.

    Scale shape: identical to bpe_encode — vocab ships once per
    executor in the Arrow UDF closure, a per-batch word cache collapses
    the Zipfian distribution, zero shuffle."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    pattern = "[a-zA-Z]+" if letters_only else _TOKEN_REGEX
    max_piece = max((len(p) for p in vocab), default=1)

    @pandas_udf("array<string>")
    def encode(texts):
        rx = _re.compile(pattern)
        cache: dict = {}

        def enc_word(w):
            hit = cache.get(w)
            if hit is not None:
                return hit
            n = len(w)
            # dp[i] = (score, neg_pieces, pieces_tuple) best for w[:i]
            NEG = float("-inf")
            dp = [(NEG, 0, ())] * (n + 1)
            dp[0] = (0.0, 0, ())
            for i in range(1, n + 1):
                best = (NEG, 0, ())
                for j in range(max(0, i - max_piece), i):
                    if dp[j][0] == NEG:
                        continue
                    piece = w[j:i]
                    lp = vocab.get(piece)
                    if lp is None:
                        if i - j != 1:
                            continue
                        lp = unk_logprob
                    cand = (
                        dp[j][0] + lp,
                        dp[j][1] - 1,
                        dp[j][2] + (piece,),
                    )
                    if best[0] == NEG or cand[:2] > best[:2] or (
                        cand[:2] == best[:2] and cand[2] < best[2]
                    ):
                        best = cand
                dp[i] = best
            out = list(dp[n][2])
            cache[w] = out
            return out

        rows = []
        for t in texts:
            toks = []
            src_text = (t or "")
            if lowercase:
                src_text = src_text.lower()
            for w in rx.findall(src_text):
                toks.extend(enc_word(w))
            rows.append(toks)
        return pd.Series(rows)

    return df.withColumn(out_col, encode(F.col(text_col)))



def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 200,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-coverage panel: what fraction of each group's running
    text a top-``vocab_size`` corpus vocabulary covers, and how much is
    out-of-vocabulary. The go/no-go check before fixing a tokenizer
    vocab for a multilingual corpus — a group with a high ``oov_rate``
    will fragment into bytes/unknowns and train poorly.

    Output per group: ``n_tokens`` (occurrences), ``n_types`` (distinct
    tokens), ``covered_tokens`` (occurrences of in-vocab tokens),
    ``oov_types`` (distinct OOV tokens), ``oov_rate`` (occurrence-level,
    rounded to 4). The vocabulary is the corpus-global top-V by
    (count desc, token asc) — a total order, so the rank-V boundary is
    deterministic cross-engine.

    Plan: ONE tokenize+explode scan aggregated to (group, token) counts
    (map-side combined, vocab-bounded per group) and checkpointed — the
    global vocab, the per-group totals, and the coverage join all derive
    from that table, never from the corpus again. Vocab selection is
    orderBy+limit → TakeOrderedAndProject; the V-row vocab broadcasts
    into the coverage join. No shuffle exceeds |groups × vocab|."""
    toks = ensure_parallelism(docs.filter(F.trim(F.col(text_col)) != "")).select(
        group_col,
        F.explode(word_tokens(normalize_text(text_col))).alias("_tok"),
    )
    g_counts = (
        toks.groupBy(group_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    vocab = (
        g_counts.groupBy("_tok")
        .agg(F.sum("_c").alias("_cc"))
        .orderBy(F.desc("_cc"), "_tok")
        .limit(vocab_size)
        .select("_tok", F.lit(True).alias("_in_vocab"))
    )
    return (
        g_counts.join(F.broadcast(vocab), "_tok", "left")
        .groupBy(group_col)
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("_in_vocab"), F.col("_c")).otherwise(F.lit(0))).alias(
                "covered_tokens"
            ),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias(
                "oov_types"
            ),
        )
        .withColumn(
            "oov_rate",
            F.round(
                1.0 - F.col("covered_tokens") / F.col("n_tokens").cast("double"), 4
            ),
        )
    )


def bpe_decode(
    df: DataFrame,
    tokens_col: str = "bpe_tokens",
    out_col: str = "decoded",
) -> DataFrame:
    """Inverse of :func:`bpe_encode`: BPE merges only ever CONCATENATE
    adjacent symbols, so decoding is exact concatenation of the subword
    strings — ``out_col`` = the original matched-letter stream. The
    word boundaries themselves are not recoverable from the subword
    stream alone (encode tokenizes per word, then flattens), so decode
    restores the LETTER stream: the roundtrip identity is

        array_join(bpe_tokens, '') == concat(regexp matches of text)

    which the bpe_roundtrip driver query asserts corpus-wide — the
    lossless-ness proof every tokenizer deployment should gate on.

    Scale shape: one row-local array_join — zero shuffles, trivially
    parallel."""
    return df.withColumn(out_col, F.array_join(F.col(tokens_col), ""))


def tokenizer_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer FERTILITY panel (subwords per word — the standard
    tokenizer-evaluation metric, e.g. Rust et al., ACL 2021: fertility
    near 1 means the vocab covers the domain, high fertility means the
    text fragments into many pieces and every downstream token budget
    silently shrinks): encode every document with the learned BPE merge
    table (:func:`bpe_encode`) and report, per ``group_col``, the word
    count, subword count, and their ratio.

    Returns (``group_col``, ``n_docs``, ``n_words``, ``n_tokens``,
    ``fertility``) ordered by group; fertility is a single
    integer-count division rounded to 6 (bit-exact across engines),
    NULL for a group with no words.

    Scale shape: bpe_encode's map-side Arrow pass dominates; word
    counts come from the same row-local regex; ONE hash-aggregate on
    ``group_col`` finishes it — counters combine map-side, nothing
    corpus-sized shuffles."""
    enc = bpe_encode(
        df.select(group_col, id_col, text_col), merges, text_col=text_col
    )
    # the SAME word pattern bpe_encode tokenizes with (letters_only)
    n_words = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    )
    per_doc = enc.select(
        group_col,
        n_words.alias("_w"),
        F.size("bpe_tokens").alias("_t"),
    )
    return (
        per_doc.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_t").alias("n_tokens"),
            F.round(
                F.when(
                    F.sum("_w") > 0,
                    F.sum("_t").cast("double") / F.sum("_w"),
                ),
                6,
            ).alias("fertility"),
        )
        .orderBy(group_col)
    )
