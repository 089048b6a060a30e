"""Line-level corpus cleaning, C4-style (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning…", §2.2; same shape as RefinedWeb /
MassiveText line filters).

The reference engine (/root/reference, an embedded vector store) has no
text-cleaning surface; this extends the engine with the standard
web-corpus cleanup stage an LLM training pipeline runs BEFORE dedup and
quality gating:

- per-LINE rules: drop lines with fewer than N words, lines that do not
  end in terminal punctuation, lines containing blocklisted substrings
  ("javascript", cookie-notice boilerplate);
- per-DOC rules: drop whole documents containing blocklist substrings
  ("lorem ipsum", "{") or documents left with too few kept lines.

Scale shape: everything is a Catalyst higher-order function over the
split line array — filter/exists/array_join inside one projection. ZERO
shuffles, zero Python; the operator is a single codegen'd map stage, so
at 100 TB it runs at scan speed and composes with predicate pushdown on
any preceding metadata filter.

Determinism/portability: "word count" is defined as the single-space
split of the whitespace-normalized trimmed line, and pattern matching is
lower-cased substring `contains` — both reproducible verbatim in the
DuckDB oracle (list_filter/list_transform over string_split).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4's terminal-punctuation rule: keep lines ending in . ! ? or a
# closing quote (Raffel et al. 2020 §2.2 keeps the quote variant).
_TERMINAL_RE = r'[.!?"]\s*$'


def _word_count(line: Column) -> Column:
    norm = F.regexp_replace(F.trim(line), r"\s+", " ")
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def _line_keep(
    line: Column,
    min_words: int,
    require_terminal_punct: bool,
    drop_line_patterns: list[str],
) -> Column:
    keep = _word_count(line) >= F.lit(min_words)
    if require_terminal_punct:
        keep = keep & F.regexp_like(line, F.lit(_TERMINAL_RE))
    for pat in drop_line_patterns:
        keep = keep & ~F.lower(line).contains(pat.lower())
    return keep


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_line_patterns: list[str] | None = None,
    drop_doc_patterns: list[str] | None = None,
    min_kept_lines: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Apply C4-style line filters to ``text_col``.

    Returns the input rows that SURVIVE the document-level rules, with
    ``text_col`` replaced by the kept lines re-joined on ``sep``, plus
    diagnostics: ``n_lines`` (before), ``n_kept`` (after),
    ``n_chars_clean`` (length of the cleaned text). Dropped documents
    (doc-blocklist hit, or fewer than ``min_kept_lines`` surviving
    lines) are removed from the output.

    All rules evaluate in one codegen'd projection — see module
    docstring for the 100 TB rationale.
    """
    drop_line_patterns = drop_line_patterns or []
    drop_doc_patterns = drop_doc_patterns or []

    lines = F.split(F.col(text_col), sep)
    kept = F.filter(
        lines,
        lambda l: _line_keep(
            l, min_words, require_terminal_punct, drop_line_patterns
        ),
    )
    out = df.withColumn("_lines", lines).withColumn("_kept", kept)

    if drop_doc_patterns:
        # NB: the predicate must be a ONE-parameter lambda — a default
        # second arg (lambda l, p=pat: …) makes pyspark treat it as the
        # two-arg (element, index) form and bind the index Column to p
        def _doc_pred(pat: str):
            return lambda l: F.lower(l).contains(pat.lower())

        doc_hit = reduce(
            lambda a, b: a | b,
            [F.exists(F.col("_lines"), _doc_pred(p)) for p in drop_doc_patterns],
        )
        out = out.filter(~doc_hit)

    out = out.filter(F.size("_kept") >= F.lit(min_kept_lines))
    cleaned = F.array_join(F.col("_kept"), sep)
    keep_cols = [c for c in df.columns if c != text_col]
    return out.select(
        *keep_cols,
        cleaned.alias(text_col),
        F.size("_lines").alias("n_lines"),
        F.size("_kept").alias("n_kept"),
        F.length(cleaned).alias("n_chars_clean"),
    )


def line_filter_stats(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    drop_line_patterns: list[str] | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level audit of the line rules WITHOUT rewriting documents:
    one row with total/kept line counts and per-rule drop attribution
    (first-failing-rule order: min_words, then punctuation, then
    blocklist — attribution sums to dropped). Single scan, one
    1-row aggregate."""
    drop_line_patterns = drop_line_patterns or []
    lines = F.split(F.col(text_col), sep)

    def _count(pred) -> Column:
        return F.size(F.filter(lines, pred))

    short = _count(lambda l: _word_count(l) < F.lit(min_words))
    not_short = lambda l: _word_count(l) >= F.lit(min_words)  # noqa: E731
    if require_terminal_punct:
        no_punct = _count(
            lambda l: not_short(l) & ~F.regexp_like(l, F.lit(_TERMINAL_RE))
        )
        punct_ok = lambda l: not_short(l) & F.regexp_like(  # noqa: E731
            l, F.lit(_TERMINAL_RE)
        )
    else:
        no_punct = F.lit(0)
        punct_ok = not_short
    if drop_line_patterns:
        block_hit = lambda l: reduce(  # noqa: E731
            lambda a, b: a | b,
            [F.lower(l).contains(p.lower()) for p in drop_line_patterns],
        )
        blocked = _count(lambda l: punct_ok(l) & block_hit(l))
    else:
        blocked = F.lit(0)
    per_doc = df.select(
        F.size(lines).alias("_n"),
        short.alias("_short"),
        no_punct.alias("_nopunct"),
        blocked.alias("_blocked"),
    )
    return per_doc.agg(
        F.sum("_n").alias("total_lines"),
        F.sum(F.col("_n") - F.col("_short") - F.col("_nopunct") - F.col("_blocked")).alias(
            "kept_lines"
        ),
        F.sum("_short").alias("dropped_short"),
        F.sum("_nopunct").alias("dropped_no_punct"),
        F.sum("_blocked").alias("dropped_blocklist"),
    )


def boilerplate_line_stats(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_frac: float = 0.05,
    min_df: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Per-group boilerplate-line detection (the CCNet/jusText signal:
    Wenzek et al. LREC 2020 dedup at the PARAGRAPH level precisely
    because nav bars, cookie notices, and footers repeat across a
    site's pages while article bodies don't). A normalized line is
    boilerplate within a group when it appears in at least
    ``max(min_df, ceil(min_frac * group_docs))`` distinct documents of
    that group.

    Returns one row per group, ordered:
    (``group_col``, ``n_docs``, ``n_boilerplate_lines``,
    ``n_docs_affected``, ``boilerplate_occurrences`` — the total
    doc-line incidences a removal pass would strip). Groups with no
    boilerplate keep their row with zeros (the audit must show clean
    sources as clean, not silently drop them).

    Scale shape: explode to (group, doc, line), distinct, then ONE
    hash-aggregate keyed on (group, line) — partial aggregation
    map-side, so the shuffle carries one record per distinct line per
    mapper. The boilerplate set is joined back as a semi-join keyed on
    the same (group, line) — AQE broadcasts it when small. No windows,
    no driver state; line df-counting is the exact same posture as
    exact_dedup's digest aggregate."""
    from valentinus_spark.functions.text import normalize_text
    from valentinus_spark.functions.util import ensure_parallelism

    if not (0.0 < min_frac <= 1.0):
        raise ValueError(f"min_frac must be in (0, 1], got {min_frac}")
    per_doc = (
        ensure_parallelism(df)
        .select(
            F.col(group_col).alias("_g"),
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), sep)).alias("_raw"),
        )
        .select("_g", "_id", normalize_text("_raw").alias("_line"))
        .filter(F.col("_line") != "")
        .distinct()
        # materialized: consumed by BOTH the df-count and the affected-doc
        # semi-join below — without this the explode+normalize+distinct
        # subtree (the corpus-sized work) recomputes once per consumer
        .localCheckpoint()
    )
    gdocs = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count_distinct(id_col).alias("n_docs")
    )
    line_df = per_doc.groupBy("_g", "_line").agg(
        F.count(F.lit(1)).alias("_df")
    )
    boiler = (
        line_df.join(gdocs, "_g")
        .filter(
            F.col("_df")
            >= F.greatest(
                F.lit(int(min_df)),
                F.ceil(F.lit(float(min_frac)) * F.col("n_docs")),
            )
        )
        # boilerplate-sized (tiny): feeds the per-group stats AND the
        # affected semi-join
        .localCheckpoint()
    )
    per_group = boiler.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_boilerplate_lines"),
        F.sum("_df").alias("boilerplate_occurrences"),
    )
    affected = (
        per_doc.join(boiler.select("_g", "_line"), ["_g", "_line"], "semi")
        .groupBy("_g")
        .agg(F.count_distinct("_id").alias("n_docs_affected"))
    )
    return (
        gdocs.join(per_group, "_g", "left")
        .join(affected, "_g", "left")
        .select(
            F.col("_g").alias(group_col),
            "n_docs",
            F.coalesce("n_boilerplate_lines", F.lit(0)).alias("n_boilerplate_lines"),
            F.coalesce("n_docs_affected", F.lit(0)).alias("n_docs_affected"),
            F.coalesce("boilerplate_occurrences", F.lit(0)).alias(
                "boilerplate_occurrences"
            ),
        )
        .orderBy(group_col)
    )
