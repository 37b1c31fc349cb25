"""Text-analysis operators for large-scale training-data pipelines.

All pure-expression (JVM, codegen) — no Python in the hot path. Designed for
the ``documents`` table shape (doc_id, text, lang, source, n_chars) but
parameterized on column names.

Scale: every operator here is embarrassingly parallel per-row; at 100 TB the
only consideration is that ``regexp_extract_all`` materializes token arrays —
prefer the counting variants when only counts are needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Languages the heuristic distinguishes, with high-frequency marker words.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "it"]

# BPE-ish pre-tokenization: letter runs, single digits, punctuation marks —
# the GPT-2 style shape re-expressed in RE2/Java-compatible regex.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased, punctuation-stripped text."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (C40)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-style pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def marker_count(text: Column, word: str) -> Column:
    r"""Occurrences of ``word`` as a whole word (\b is RE2+Java compatible)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(rf"\b{word}\b"), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-word scores for language ID."""
    return {
        lang: sum(
            (marker_count(text, w) for w in words), start=F.lit(0)
        ).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def lang_predict(text: Column) -> Column:
    """Argmax language with deterministic alphabetical tie-break."""
    scores = lang_scores(text)
    langs = sorted(LANG_MARKERS)  # alphabetical: ties go to the earliest
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("unknown")
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, lang).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("unknown"))


def stopword_ratio(text: Column, toks: Column | None = None) -> Column:
    toks = tokens(text) if toks is None else toks
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.when(
        F.size(toks) > 0, F.size(stop) / F.size(toks)
    ).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(n > 0, digits / n).otherwise(F.lit(0.0))


def avg_token_len(text: Column, toks: Column | None = None) -> Column:
    toks = tokens(text) if toks is None else toks
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane word lengths,
    some-but-not-too-many stopwords, low punctuation/digit noise.

    The exact weighting is a convention, not a claim — what matters for a
    pipeline is determinism and monotonicity in the obvious directions.

    Pass ``toks`` (a materialized token-array column) in hot paths: without
    it the tokenizer expression is inlined once per metric (~6x per row).
    """
    toks = tokens(text) if toks is None else toks
    n_tok = F.size(toks)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.4)
    awl = avg_token_len(text, toks)
    wordlen_ok = F.when((awl >= 3.0) & (awl <= 10.0), 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(text, toks) >= 0.05, 1.0).otherwise(0.6)
    noise_ok = 1.0 - F.least(punct_ratio(text) + digit_ratio(text), F.lit(1.0))
    return 0.3 * len_ok + 0.2 * wordlen_ok + 0.2 * stop_ok + 0.3 * noise_ok


# --- document fingerprinting (rolling hash) --------------------------------

FP_MOD = 1_000_000_007
FP_BASE = 131


def token_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over tokens (document fingerprint, C40).

    Each token maps to ``length(t)*31 + ascii(t[0])``; the sequence folds as
    ``acc*131 + v (mod 1e9+7)``. Deliberately built only from functions with
    exact DuckDB equivalents (length/ascii/list folds) so the oracle can
    reproduce it bit-for-bit.
    """
    vals = F.transform(
        tokens(text),
        lambda t: (F.length(t).cast("long") * 31 + F.ascii(t).cast("long")),
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * FP_BASE + v) % FP_MOD,
    )


FP_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform({tokens}, t -> CAST(length(t)*31 + ascii(t) AS BIGINT))), "
    f"(a, b) -> (a * {FP_BASE} + b) % {FP_MOD})"
)

TOKENS_SQL = (
    "list_filter(string_split_regex(trim(regexp_replace(lower({col}), "
    "'[^a-z0-9\\s]', ' ', 'g')), '\\s+'), t -> t <> '')"
)


# --- PII scanning / redaction ----------------------------------------------

# Deliberately simple patterns valid in BOTH RE2/Java and DuckDB's RE2 —
# production deployments swap in their compliance patterns; the operator
# contract (scan counts + irreversible redaction, one pass) is what scales.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def pii_scan(text: Column) -> dict[str, Column]:
    """Counts of PII-shaped spans per document."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)),
        "n_urls": F.size(F.regexp_extract_all(text, F.lit(URL_RE), 0)),
    }


def pii_redact(text: Column) -> Column:
    """Replace PII spans with typed placeholders (emails first so URL
    redaction cannot eat an email's domain half)."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, URL_RE, "[URL]")
