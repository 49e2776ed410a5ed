"""Text-analysis operators for large-scale training-data pipelines.

Extensions beyond the reference (flagged per SURVEY §2.9/§7.2 step 7):
language-ID (stopword-profile heuristic), quality scoring, token counting,
and document fingerprinting. All pure Column expressions — per-document
work is a projection that fuses into the scan; nothing here shuffles.

At 100 TB this matters: a text-quality pass that is projection-only
scales linearly with input splits and can run fused with ingestion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Minimal stopword profiles for the language-ID heuristic. Real systems use
# char-n-gram models; the *pipeline shape* (per-doc scoring → argmax, no
# shuffle) is identical, so the profiles are deliberately small.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    "es": ["el", "de", "la", "que", "y", "en", "los", "una"],
}

WORD_SPLIT_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for empty/null
    handled by callers)."""
    return F.split(F.trim(text), WORD_SPLIT_RE)


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word-boundary pieces plus length/4
    continuation pieces for long words — a cheap deterministic proxy for a
    BPE tokenizer's token count (useful for corpus budgeting)."""
    ws = tokens(text)
    per_word = F.transform(
        ws, lambda w: F.greatest(F.lit(1), F.ceil(F.length(w) / 4).cast("int"))
    )
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)
    )


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Occurrences of any profile word (word-bounded, case-insensitive)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit rate, normalized by token count."""
    tc = token_count(text)
    return {
        lang: stopword_hits(text, words) / F.greatest(tc, F.lit(1))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language (deterministic alphabetic tiebreak); 'und' when no
    profile scores at all."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            for lang, s in sorted(scores.items())
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    return F.coalesce(best["lang"], F.lit("und"))


def punct_ratio(text: Column) -> Column:
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def mean_word_length(text: Column) -> Column:
    ws = tokens(text)
    total = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return total / F.greatest(F.size(ws), F.lit(1))


def quality_score(text: Column, stop_lang: str = "en") -> Column:
    """Heuristic quality score in [0,1] from length, punctuation ratio,
    stopword rate, and mean word length — the standard cheap pre-filter
    before expensive dedup/model scoring in a training-data pipeline.

    Deterministic double math (same expression both engines)."""
    length_ok = F.least(F.length(text) / F.lit(200.0), F.lit(1.0))
    stop_rate = F.least(
        stopword_hits(text, LANG_PROFILES[stop_lang])
        / F.greatest(token_count(text), F.lit(1))
        * 4.0,
        F.lit(1.0),
    )
    punct_ok = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0
    )
    mwl = mean_word_length(text)
    word_shape_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    return (
        length_ok * 0.3 + stop_rate * 0.3 + punct_ok * 0.2 + word_shape_ok * 0.2
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-word chars,
    collapse whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^\w\s]", ""), r"\s+", " "
        )
    )


def fingerprint(text: Column) -> Column:
    """Exact content fingerprint over the normalized text (md5 hex)."""
    return F.md5(normalize_text(text).cast("binary"))


def rolling_fingerprint(
    text: Column, window: int = 16, pre_normalized: bool = False
) -> Column:
    """Winnowing-style robust fingerprint: the minimum hash over the
    document's character ``window``-grams of the normalized text — stable
    under small edits anywhere except the minimal window itself.

    PERF: the lambda body references the source string PER ELEMENT, so
    ``text`` should be a plain column when possible — pass the normalized
    string as a materialized column + ``pre_normalized=True`` (see
    :func:`with_normalized`); inlining ``normalize_text`` here would rerun
    its regexes once per gram (O(len²) regex work per document)."""
    norm = text if pre_normalized else normalize_text(text)
    n = F.length(norm)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(window - 1))
    )
    return F.array_min(
        F.transform(
            starts, lambda i: F.md5(F.substring(norm, i, window).cast("binary"))
        )
    )


def with_normalized(
    docs: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Stage ``normalize_text`` as a real column so downstream per-element
    HOFs reference a cheap attribute. Catalyst's CollapseProject keeps the
    stage (it won't inline non-cheap expressions used more than once)."""
    return docs.withColumn(out_col, normalize_text(F.col(text_col)))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stats table (projection only — verify with
    .explain: no Exchange)."""
    t = F.col(text_col)
    return docs.select(
        *[c for c in docs.columns if c != text_col],
        F.length(t).alias("n_chars_actual"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_tokens_bpe_ish"),
        punct_ratio(t).alias("punct_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        lang_id(t).alias("lang_guess"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
