"""Text-analysis operators for training-data pipelines.

All operators are pure Spark built-ins (JVM-side, codegen'd) — no Python in
the hot path — so they run at parquet-scan speed on a 100 TB documents table
and their semantics can be replicated exactly in ANSI SQL for oracles.

Design: tokenization is whitespace split of lowercased text; hashes are md5
hex strings (stable across engines, unlike engine-private hash functions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .numeric import grid_round

# small multilingual stopword inventories for the language-ID heuristic;
# plain public common words (the synthetic corpus is english-ish token soup,
# but the operator is the real n-gram/stopword heuristic)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "im"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "他"],
}
DEFAULT_STOPWORDS = STOPWORDS["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text; empty text → []."""
    trimmed = F.trim(F.lower(col))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are common punctuation."""
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?'\"()\-]", ""))
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(punct / F.length(col))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or DEFAULT_STOPWORDS)])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(total / F.size(toks))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs and low
    punctuation density (the usual web-corpus pre-filters)."""
    n_tok = token_count(col)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
    mean_ok = F.when((mean_token_length(col) >= 2) & (mean_token_length(col) <= 12), F.lit(0.2)).otherwise(
        F.lit(0.0)
    )
    return length_ok + punct_ok + mean_ok


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID: count hits per language inventory, take the
    argmax (ties broken by language-code order). A real system would use
    char-n-gram profiles; the operator shape (per-language score → argmax) is
    identical and stays fully in Catalyst."""
    toks = tokens(col)
    scores = []
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(score.alias("score"), F.lit(code).alias("lang")))
    # array_max on (score, lang) structs: max score, then max lang — make the
    # tie-break deterministic by ordering codes so later codes win ties only
    # via the documented struct comparison
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercased text.
    Stable across engines and runs — the exact-dedup key."""
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(normalized)


# GPT-2-style pre-tokenization pattern (public, Radford et al. 2019),
# simplified to the Java-regex ∩ RE2 common subset (no lookahead): contraction
# suffixes, space-prefixed word / number runs, punctuation runs. Both engines
# use leftmost-first alternation, so match counts agree exactly.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate LLM token count via the BPE pre-tokenizer regex — a much
    better cost proxy than whitespace words (punctuation and digit runs
    tokenize separately). JVM-side regexp_count; zero shuffles."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


# PII patterns kept to the RE2-compatible common subset (no backrefs, no
# lookaround) so the same literal pattern runs in Spark (java.util.regex) and
# any RE2-based engine with identical semantics.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace e-mail / phone / SSN / IPv4 literals with typed placeholders.

    A chain of JVM-side regexp_replace calls (replace-all semantics, matching
    POSIX 'g'); order matters — SSN before phone would also work, but e-mail
    must run before IPv4 so host-part dots aren't half-eaten. The kinds list
    is applied in the declared order.
    """
    out = col
    for kind in kinds or list(PII_PATTERNS):
        pattern, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_hit_counts(col: Column) -> Column:
    """Struct of per-kind match counts (regexp_count, JVM-side)."""
    return F.struct(
        *[
            F.regexp_count(col, F.lit(pattern)).alias(kind)
            for kind, (pattern, _) in PII_PATTERNS.items()
        ]
    )


def with_text_stats(df: DataFrame, text_col: str = "text", stopwords: list[str] | None = None) -> DataFrame:
    """Attach the full stat block — zero shuffles, and the expensive
    subexpressions (regex tokenization, higher-order filters) are evaluated
    ONCE per row.

    Layered projections create deliberate materialization boundaries:
    Catalyst's CollapseProject declines to inline non-cheap expressions that
    are referenced more than once, so `_toks` (the regex split) is computed a
    single time and every downstream stat reads the materialized array —
    whereas composing the per-stat functions directly would re-evaluate the
    split ~20× per row (measured 23.7s → ~2s at sf0.1). Values are
    bit-identical to the compositional form: same expressions, just shared.
    """
    c = F.col(text_col)
    # stage 1: the expensive shared bases
    s1 = df.withColumns(
        {
            "_toks": tokens(c),
            "_n_chars": F.length(c),
            "_n_punct": F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\-]", "")),
            "fingerprint": fingerprint(c),
        }
    )
    # stage 2: one pass over the token array per derived quantity
    t = F.col("_toks")
    hit_cols = {}
    for code in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        hit_cols[f"_hits_{code}"] = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    custom_sw = F.array(*[F.lit(w) for w in (stopwords or DEFAULT_STOPWORDS)])
    s2 = s1.withColumns(
        {
            "_n_toks": F.size(t),
            "_tok_len_sum": F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)),
            "_hits_sw": F.size(F.filter(t, lambda x: F.array_contains(custom_sw, x))),
            **hit_cols,
        }
    )
    # stage 3: cheap arithmetic over the materialized bases
    n_tok = F.col("_n_toks")
    p_ratio = F.when(F.col("_n_chars") == 0, F.lit(0.0)).otherwise(F.col("_n_punct") / F.col("_n_chars"))
    mean_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(F.col("_tok_len_sum") / n_tok)
    scores = [
        F.struct(F.col(f"_hits_{code}").alias("score"), F.lit(code).alias("lang"))
        for code in sorted(STOPWORDS)
    ]
    best = F.array_max(F.array(*scores))
    s3 = s2.withColumns(
        {
            "n_tokens": n_tok,
            "n_chars_computed": F.col("_n_chars"),
            "punct_ratio": p_ratio,
            "stopword_ratio": F.when(n_tok == 0, F.lit(0.0)).otherwise(F.col("_hits_sw") / n_tok),
            "mean_token_len": mean_len,
            "quality": (
                F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
                + F.when(p_ratio < 0.2, F.lit(0.3)).otherwise(F.lit(0.0))
                + F.when((mean_len >= 2) & (mean_len <= 12), F.lit(0.2)).otherwise(F.lit(0.0))
            ),
            "lang_pred": F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"]),
        }
    )
    return s3.drop(
        "_toks", "_n_chars", "_n_punct", "_n_toks", "_tok_len_sum", "_hits_sw",
        *[f"_hits_{code}" for code in sorted(STOPWORDS)],
    )


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """One BPE-training iteration's pair-count step (Sennrich, Haddow &
    Birch 2016, "Neural machine translation of rare words with subword
    units"): word frequencies → adjacent character-pair counts weighted by
    word frequency → ranked merge candidates.

    This is the combinable-aggregate unit that dominates byte-pair-encoding
    tokenizer training at corpus scale: the corpus collapses to a
    vocabulary-bounded word-frequency table in one map-side-combined
    shuffle, and every later BPE iteration works on that tiny table
    (driver-side loop) — the 100 TB corpus is touched exactly once. Emits
    the first iteration's candidates; integer counts, so cross-engine
    exact.
    """
    from pyspark.sql import functions as F

    words = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.length("word") >= 2)
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(top_n)
    )


def syllable_count(col: Column) -> Column:
    """Approximate syllables = vowel GROUPS per word (the standard Flesch
    approximation): count maximal [aeiouy]+ runs, minimum 1 PER WORD — a
    vowel-less token ("tsk") contributes one syllable without eating into
    other words' counts. JVM regexp ops — zero shuffles."""
    groups = F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+"))
    words = token_count(col)
    words_with_vowels = F.size(F.filter(tokens(col), lambda x: x.rlike("[aeiouy]")))
    return groups + (words - words_with_vowels)


def flesch_reading_ease(col: Column, scale: int = 2) -> Column:
    """Flesch Reading Ease (Flesch 1948, public formula):
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    Sentences = terminal-punctuation runs (min 1). All three counts are
    exact integers; the score is a fixed arithmetic expression over them,
    rounded — deterministic across engines."""
    words = token_count(col)
    sentences = F.greatest(F.regexp_count(col, F.lit(r"[.!?]+")), F.lit(1))
    syllables = syllable_count(col)
    score = (
        F.lit(206.835)
        - F.lit(1.015) * words.cast("double") / sentences.cast("double")
        - F.lit(84.6) * syllables.cast("double") / words.cast("double")
    )
    # the score is RATIONAL (fixed arithmetic over exact integer counts) —
    # the half-grid cross-engine divergence class (r10 sweep): grid_round
    return F.when(words > 0, grid_round(score, scale))


def luhn_valid(digits_col: Column) -> Column:
    """Luhn checksum (public algorithm, ISO/IEC 7812): strip the customary
    space/dash separators, require the remainder to be ALL digits (anything
    else is False, never NULL — a data-quality filter must partition rows
    cleanly), then: double every second digit from the right, subtract 9
    when >9, valid iff the sum is divisible by 10. Pure in-row `aggregate`
    over the reversed digit array — JVM-side, no UDF."""
    cleaned = F.regexp_replace(digits_col, r"[ \-]", "")
    is_digits = cleaned.rlike(r"^[0-9]{2,}$")
    ds = F.reverse(F.split(cleaned, ""))
    ds = F.filter(ds, lambda x: x != "")
    total = F.aggregate(
        F.zip_with(
            ds,
            F.sequence(F.lit(0), F.greatest(F.size(ds) - 1, F.lit(0))),
            lambda d, i: F.when(
                i % 2 == 1,
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(d.cast("int") * 2),
            ).otherwise(d.cast("int")),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(is_digits, total % 10 == 0).otherwise(F.lit(False))
