"""Text-analysis primitives as JVM-side Catalyst expressions.

The reference has no text functions at all (its only text handling is
passing documents to the tokenizer, onnx.rs:61-68) — this module is part of
the north-star extension surface (BASELINE.json): the text-processing
toolkit a large-scale training-data pipeline needs, built from
``pyspark.sql.functions`` so everything stays inside whole-stage codegen.
No Python UDFs anywhere in this module.

Determinism note: hash-based functions use ``xxhash64`` (Spark built-in,
stable across runs/versions) so fingerprints are reproducible cluster-wide.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seeds for the n-gram/stopword language
# heuristic. Intentionally small: language ID at pipeline scale is a
# heuristic pre-filter, not a classifier.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "por", "con"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"] + [
    "on", "with", "as", "at", "by", "an", "be", "this", "are", "was",
]

_TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"  # BPE-ish: runs of letters / digits / single symbol


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Canonical form for dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), "\\s+", " "))


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty text → empty array)."""
    t = F.trim(_c(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "\\s+")
    )


def token_count(col: Column | str) -> Column:
    """BPE-ish token count: letter-runs + digit-runs + individual symbols."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(_TOKEN_REGEX), 0))


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """All character n-grams (shingles) of a string, as array<string>.

    JVM-side: ``transform(sequence(1, len-n+1), i -> substring(s, i, n))``.
    Strings shorter than n yield a single truncated shingle (the whole
    string) so short documents still participate in dedup.
    """
    s = _c(col)
    return F.when(F.length(s) <= n, F.array(s)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(s) - n + 1),
            lambda i: F.substring(s, i, F.lit(n)),
        )
    )


def shingles_from_tokens(tokens: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token-array
    column. Use this form in operators: expressions inside higher-order
    lambdas get no common-subexpression elimination, so if ``tokens`` were
    an inline split(...) expression it would re-tokenize the document once
    per shingle (measured 8s → 0.5s on 5k docs for the materialized form)."""
    toks = _c(tokens)
    k = F.size(toks)
    return F.when(k <= n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from normalized text, as array<string>.

    Convenience single-expression form — fine for one-off use on short
    text. In operators prefer ``withColumn("_toks", word_tokens(
    normalize_text(c)))`` + :func:`shingles_from_tokens` (see its note)."""
    return shingles_from_tokens(word_tokens(normalize_text(col)), n)


def stopword_count(col_tokens: Column, stopwords: Sequence[str]) -> Column:
    return F.size(F.filter(col_tokens, lambda t: t.isin(list(stopwords))))


def text_quality(col: Column | str) -> Column:
    """Quality-scoring features as a struct column (length, word stats,
    punctuation/digit/stopword ratios). All ratios are double in [0,1],
    null-safe for empty text."""
    s = _c(col)
    toks = word_tokens(s)
    n_chars = F.length(s).cast("double")
    n_words = F.size(toks).cast("double")
    n_punct = F.size(F.regexp_extract_all(s, F.lit("[\\.,;:!\\?'\"]"), 0)).cast("double")
    n_digit = F.size(F.regexp_extract_all(s, F.lit("[0-9]"), 0)).cast("double")
    n_stop = stopword_count(toks, ENGLISH_STOPWORDS).cast("double")
    safe_chars = F.when(n_chars > 0, n_chars)
    safe_words = F.when(n_words > 0, n_words)
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        (n_chars / safe_words).alias("avg_word_len"),
        (n_punct / safe_chars).alias("punct_ratio"),
        (n_digit / safe_chars).alias("digit_ratio"),
        (n_stop / safe_words).alias("stopword_ratio"),
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language heuristic → lang code or 'und'.

    Pure JVM expression: per language, count tokens in its stopword list;
    argmax wins, zero votes → 'und'.
    """
    toks = word_tokens(normalize_text(col))
    scored = F.array(
        *[
            F.struct(
                stopword_count(toks, words).alias("votes"), F.lit(lang).alias("lang")
            )
            for lang, words in LANG_STOPWORDS.items()
        ]
    )
    best = F.array_max(scored)  # struct ordering: by votes, then lang
    return F.when(best["votes"] > 0, best["lang"]).otherwise(F.lit("und"))


# Engine-portable 60-bit hash: the leading 15 hex chars of sha256, parsed
# as an integer. 60 bits keeps the value strictly inside BIGINT range in
# every engine (no unsigned/overflow divergence); the identical value is
# computable in DuckDB as ('0x'||substr(sha256(x),1,15))::UBIGINT::BIGINT,
# which is what lets sha256-variant sketches (minhash/simhash/fingerprint)
# be verified by the SQL oracle rather than rows-only. xxhash64 stays the
# default hash everywhere hot — sha256 costs a few× more per call — this
# is the reproducibility knob, not the fast path.
_SHA60_SQL = "cast(conv(substring(sha2({x}, 256), 1, 15), 16, 10) as bigint)"


def sha_hash60(col: Column | str) -> Column:
    """Portable 60-bit content hash (see ``_SHA60_SQL``): identical in
    Spark and DuckDB, so anything derived from it is oracle-checkable."""
    return (
        F.conv(F.substring(F.sha2(_c(col), 256), 1, 15), 16, 10).cast("long")
    )


def simhash_counts(
    tokens_col_name: str, bits: int = 64, hash_fn: str = "xxhash64"
) -> Column:
    """Per-bit SimHash vote sums (array<long> of ``bits``) over a
    token-array column, entirely JVM-side.

    For each bit position b: sum over tokens of ±1 according to bit b of
    hash(token). The token hashes are materialized FIRST (one hash per
    token) and the per-bit votes fan out from the hash array — lambdas get
    no common-subexpression elimination, so hashing inside the per-bit
    transform would recompute the hash ``bits`` times per token. Built as
    a SQL expression because Catalyst's ShiftRight accepts a column shift
    amount while the Python wrapper only takes an int; ``tokens_col_name``
    must be a real column (materialize the token array with withColumn
    first — this also keeps the expensive aggregate from being duplicated
    by projection collapse).

    ``hash_fn``: "xxhash64" (default, fast) or "sha256" (the 60-bit
    portable hash — use with ``bits=60`` — whose DuckDB twin makes the
    whole simhash pipeline oracle-verifiable)."""
    h = "xxhash64(t)" if hash_fn == "xxhash64" else _SHA60_SQL.format(x="t")
    return F.expr(
        f"""
        aggregate(
          transform({tokens_col_name}, t -> {h}),
          array_repeat(cast(0 as bigint), {bits}),
          (acc, hv) -> zip_with(
            acc,
            transform(sequence(0, {bits - 1}),
                      i -> cast(shiftright(hv, i) & 1 as bigint) * 2 - 1),
            (a, b) -> a + b))
        """
    )


def pack_simhash(counts_col_name: str, bits: int = 64) -> Column:
    """array<long> of ``bits`` vote sums → packed signed 64-bit simhash
    (bit b = 1 iff votes[b] > 0)."""
    return F.expr(
        f"""
        aggregate(
          zip_with(
            transform({counts_col_name},
                      c -> case when c > 0 then cast(1 as bigint) else cast(0 as bigint) end),
            sequence(0, {bits - 1}),
            (bit, i) -> shiftleft(bit, i)),
          cast(0 as bigint),
          (acc, x) -> acc | x)
        """
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash64 values (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def rolling_fingerprint(
    col: Column | str, n: int = 8, keep: int = 4, hash_fn: str = "xxhash64"
) -> Column:
    """Document fingerprint: the ``keep`` smallest hash values over the
    document's character n-grams (a winnowing-style min-sketch). Two
    documents sharing most content share most fingerprint entries.
    Returns array<long> of length ≤ keep, ascending.

    ``hash_fn="sha256"`` switches to the portable 60-bit hash
    (:func:`sha_hash60`) so the sketch is reproducible in the DuckDB
    oracle; xxhash64 stays the corpus-scale default."""
    grams = char_ngrams(_c(col), n)
    hasher = F.xxhash64 if hash_fn == "xxhash64" else sha_hash60
    hashes = F.transform(grams, lambda g: hasher(g))
    return F.slice(F.array_sort(hashes), 1, keep)


def stable_split(col: Column | str, weights: dict[str, float], salt: str = "v1") -> Column:
    """Deterministic train/val/test assignment from a key column.

    bucket = first 8 hex chars of sha256(salt || key) as an int in
    [0, 2^32); thresholds carve it by the given weights. Properties a
    training pipeline needs and random() cannot give: (a) reproducible
    across runs/engines/partitionings, (b) stable under corpus growth —
    a document's split never changes when others are added, (c) no
    coordination: pure per-row expression, no shuffle, no state. Change
    ``salt`` to draw a fresh independent split.
    """
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), _c(col).cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    span = float(2**32)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < F.lit(int(acc * span))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    return (expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)).alias("split")


def stratified_keep(
    key_col: Column | str,
    stratum_col: Column | str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "v1",
) -> Column:
    """Deterministic stratified downsampling predicate: keep a row iff
    its sha256 bucket falls under its stratum's rate — corpus balancing
    (e.g. cap over-represented languages) with the same guarantees as
    [stable_split]: reproducible, growth-stable, shuffle-free, and
    exactly re-computable by another engine (unlike `sampleBy`, whose
    RNG is seed+partitioning dependent)."""
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), _c(key_col).cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    span = float(2**32)
    stratum = _c(stratum_col)
    rate = F.lit(float(default_rate))
    for name, r in rates.items():
        rate = F.when(stratum == name, F.lit(float(r))).otherwise(rate)
    return bucket < (rate * span).cast("long")


def mixture_repeat_count(
    key_col: Column | str,
    stratum_col: Column | str,
    factors: dict[str, float],
    default_factor: float = 1.0,
    salt: str = "v1",
) -> Column:
    """Deterministic per-row repeat count for mixture re-weighting: a row
    in stratum s with factor f appears ``floor(f)`` times plus one more
    iff its sha256 bucket falls under ``frac(f)`` — so a source with
    factor 2.5 contributes every doc twice and half the docs (a stable,
    growth-invariant half) a third time. The up/down-sampling step of a
    pretraining data recipe ("3 epochs of wiki, 0.3 of crawl") with the
    same engine-reproducible guarantees as [stable_split]: no RNG, no
    shuffle, recomputable row-for-row by any engine. Factor 0 drops the
    stratum. Pair with ``F.explode(F.sequence(1, n))`` to materialize
    the repeats."""
    for name, f in factors.items():
        if f < 0:
            raise ValueError(f"factor for {name!r} must be >= 0, got {f}")
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), _c(key_col).cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    span = float(2**32)
    stratum = _c(stratum_col)
    factor = F.lit(float(default_factor))
    for name, f in factors.items():
        factor = F.when(stratum == name, F.lit(float(f))).otherwise(factor)
    base = F.floor(factor).cast("long")
    frac = factor - base
    extra = (bucket < (frac * span).cast("long")).cast("long")
    return (base + extra).alias("n_repeat")


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax both Java regex (Spark) and RE2 (DuckDB,
# the oracle engine) support identically: no lookarounds, no backrefs.
# Order matters for redaction: ssn before phone (a bare 3-2-4 digit group
# must become <SSN>, not a phone fragment), email before ipv4 (domains
# can contain dotted digits).
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn": "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "ipv4": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone": "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}\\b",
}


# UTF-8-decoded-as-Latin-1/Windows-1252 artifact sequences (the classic
# double-encoding mojibake: a UTF-8 multibyte lead byte rendered as
# 'Ã'/'â'/'Â' followed by a continuation-byte character), plus the
# replacement character U+FFFD and stray C0 controls. Patterns are plain
# char classes so Java regex (Spark) and RE2 (DuckDB oracle) agree.
ENCODING_ARTIFACT_PATTERNS = {
    "replacement": "\uFFFD",
    "mojibake": "\u00C3[\u0080-\u00BF\u00A9\u00A8]|\u00E2\u0080[\u0098\u0099\u009C\u009D\u0093\u0094\u00A6]|\u00C2[\u00A0\u00A9\u00AE]",
    "control": "[\u0000-\u0008\u000B\u000C\u000E-\u001F]",
}


def encoding_artifacts(col: Column | str) -> Column:
    """Per-kind encoding-artifact counts as a struct (replacement /
    mojibake / control -> long) — the ftfy-style corpus health signal:
    U+FFFD means a decoder already gave up, 'Ã©'/'â€™'-class sequences
    mean UTF-8 bytes were decoded as Latin-1 somewhere upstream, and
    stray C0 controls mean binary contamination. Pure Catalyst
    (``regexp_extract_all``): scanning 100 TB is one pass, zero Python."""
    s = _c(col)
    return F.struct(
        *[
            F.size(F.regexp_extract_all(s, F.lit(p), 0)).cast("long").alias(k)
            for k, p in ENCODING_ARTIFACT_PATTERNS.items()
        ]
    )


def pii_counts(col: Column | str) -> Column:
    """Per-kind PII match counts as a struct (email/ssn/ipv4/phone → long).
    Pure Catalyst (``regexp_extract_all``), so scrubbing 100 TB is a
    single scan with zero Python."""
    s = _c(col)
    return F.struct(
        *[
            F.size(F.regexp_extract_all(s, F.lit(p), 0)).cast("long").alias(k)
            for k, p in PII_PATTERNS.items()
        ]
    )


# Contiguous 13-16 digit runs — the payment-card candidate shape (ISO/IEC
# 7812 PAN lengths). Candidates are CHEAP and noisy; luhn_valid below is
# the checksum gate that separates real card numbers from order ids and
# timestamps (the distinction C4/CCNet-class scrubbers actually need:
# redacting every long digit run destroys innocent data).
CC_CANDIDATE_PATTERN = "\\b[0-9]{13,16}\\b"


def luhn_valid(col: Column | str) -> Column:
    """Luhn mod-10 checksum (ISO/IEC 7812) over a digit-string column:
    true when the checksum holds, false when it doesn't, NULL for empty
    or non-digit input. Doubling every second digit from the RIGHT
    (subtracting 9 on overflow) and summing — the validation step that
    turns the cheap CC_CANDIDATE_PATTERN regex into a usable
    card-number detector.

    Pure Catalyst: one ``aggregate`` fold over the reversed string's
    positions, fully codegen'd, zero Python — replayable verbatim in
    DuckDB as list_sum over list_transform(range(...))."""
    s = _c(col)
    rs = F.reverse(s)

    def _term(i: Column) -> Column:
        d = rs.substr(i, F.lit(1)).try_cast("int")
        doubled = d * 2
        return F.when(i % 2 == 1, d).otherwise(
            F.when(doubled < 10, doubled).otherwise(doubled - 9)
        )

    total = F.aggregate(
        F.sequence(F.lit(1), F.length(s)),
        F.lit(0).cast("int"),
        lambda acc, i: acc + _term(i),
    )
    return F.when(s.rlike("^[0-9]+$"), total % 10 == 0).otherwise(
        F.lit(None).cast("boolean")
    )


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with ``<KIND>`` (e.g. ``<EMAIL>``), applying
    the patterns in PII_PATTERNS order — the standard scrub step before a
    corpus enters training."""
    s = _c(col)
    for kind, pattern in PII_PATTERNS.items():
        s = F.regexp_replace(s, pattern, f"<{kind.upper()}>")
    return s


# ---------------------------------------------------------------------------
# Token-window chunking (context splitting for embedding / training)
# ---------------------------------------------------------------------------


def chunks_from_tokens(tokens: Column | str, size: int = 128, stride: int = 96) -> Column:
    """Overlapping token windows over an ALREADY-MATERIALIZED token-array
    column (see shingles_from_tokens for why the array must be
    materialized) → ``array<struct<chunk_id int, chunk string>>``.

    Window i covers tokens [i*stride, i*stride + size); the last window
    starts at the final stride position that still adds tokens, so every
    token appears in ≥ 1 chunk and chunks overlap by ``size - stride``.
    Explode the result for a (doc_id, chunk_id, chunk) table — the shape
    embedding pipelines feed to the encoder. JVM-side end to end."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    toks = _c(tokens)
    k = F.size(toks)
    n_chunks = F.when(k <= size, F.lit(1)).otherwise(
        F.ceil((k - F.lit(size)).cast("double") / F.lit(stride)).cast("int") + 1
    )
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.array_join(F.slice(toks, i * stride + 1, size), " ").alias("chunk"),
        ),
    )


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis-Spirakis order sampling, deterministic)
# ---------------------------------------------------------------------------


def weighted_sample_key(
    key_col: Column | str, weight_col: Column | str, salt: str = "ws-v1"
) -> Column:
    """Weighted sample without replacement (sequential PPS order sampling,
    Efraimidis & Spirakis 2006): the k rows with the LARGEST keys form
    the sample. Inclusion probability is exactly proportional to weight
    for k=1 and approximately so (sequential PPS) for general top-k.

    key = ln(u) / w  with u = (sha_bucket + 1) / 2^32  in (0, 1]

    (log-space form of the usual u^(1/w); same ordering, no overflow for
    tiny weights). Deterministic like [stable_split]: the sha256-derived u
    is reproducible across runs, engines, and partitionings, so the
    sample is auditable and re-computable — unlike rand()-based sampling.
    Selecting via ``orderBy(key, desc).limit(k)`` compiles to
    TakeOrderedAndProject: per-partition top-k heaps + a k-row driver
    merge, no global sort, no full shuffle — the scale path for "pick the
    best-weighted 1M docs out of 10B".

    The default salt is function-specific ON PURPOSE: u is derived from
    the same sha256(salt || key) bucket family as [stable_split] /
    [stratified_keep] / [mixture_repeat_count]; sharing a salt with any
    of those on the same key column makes u perfectly correlated with
    the split/keep assignment (sampling within a split would condition u
    to a sub-interval and silently bias the sample). Keep the salt
    distinct from every other bucketing applied to the same key.

    Weights must be > 0; ANSI-safe here via a NULL (not an error) on
    non-positive weights so callers can filter first.
    """
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), _c(key_col).cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    u = (bucket + F.lit(1).cast("long")).cast("double") / F.lit(float(2**32))
    w = _c(weight_col).cast("double")
    return F.when(w > 0, F.log(u) / w).otherwise(F.lit(None).cast("double"))


def kfold_assign(col: Column | str, k: int = 5, salt: str = "cv-v1") -> Column:
    """Deterministic k-fold assignment from a key column: fold =
    sha256(salt‖key) mod k. Pass the GROUP key (author, site, session)
    instead of the row id and the fold is automatically grouped —
    every row of a group lands in the same fold, which is the leakage
    rule group_split_leakage audits. Same guarantees as
    :func:`stable_split`: reproducible, growth-stable, per-row pure
    expression (no shuffle)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), _c(col).cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long")
    return (bucket % k).cast("int").alias("fold")
