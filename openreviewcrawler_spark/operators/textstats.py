"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own operators (its parse pass extracts and classifies
note content, /root/reference/acceptance_labeling.py:10-96), a 100 TB web-text
corpus needs per-document quality signals. Everything here is pure JVM-side
column expressions (whole-stage-codegen'd, no Python in the hot path); each
operator has a matching ANSI-SQL twin registered in ``__spark_entry__`` so
DuckDB oracle-checks it at sf0.01.

Cross-engine determinism rules used throughout this repo:
  * token split = regex-free single-space split (corpus text is
    single-space-joined; empties preserved identically by both engines),
  * all hashes derive from md5 (identical in Spark and DuckDB):
    ``hash32(s) = int(md5(s)[:8], 16)`` — Spark ``conv(substr(md5(x),1,8),16,10)``,
    DuckDB ``('0x' || substr(md5(x),1,8))::BIGINT``,
  * floats rounded to a fixed scale before comparison (both engines round
    half-away-from-zero on doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic argmax with alphabetical-language tie-break.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "y", "los", "que", "de"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "zh": ("的", "是", "了", "在"),
}


def hash32_col(s: Column) -> Column:
    """Cross-engine 32-bit hash: int value of the first 8 md5 hex chars."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    """Single-space tokenization (cross-engine identical)."""
    return F.split(text, " ")


def stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count (with multiplicity) tokens that are in ``words``."""
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def lang_id_col(tokens: Column) -> Column:
    """Language-ID heuristic: argmax stopword hits, ties broken by language
    code ascending, zero hits -> 'und'. Pure column expressions."""
    # build array<struct<neg_hits, lang>>, take array_min => (max hits, min lang)
    entries = [
        F.struct(
            (-stopword_hits(tokens, ws)).cast("long").alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    best = F.array_min(F.array(*entries))
    return F.when(best["neg_hits"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Quality signals: token count, mean token length, stopword ratio,
    punctuation ratio, and a composite [0,1] score.

    Mirrors the shape of C4/Gopher-style quality rules; thresholds are
    arbitrary but deterministic and documented in the SQL twin.
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    # mean token length over single-space-joined text: (chars - (n-1)) / n
    mean_tok = (n_chars - (n_tokens - F.lit(1))) / n_tokens
    stop_en = stopword_hits(toks, STOPWORDS["en"]).cast("long")
    stop_ratio = stop_en / n_tokens
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    punct_ratio = n_punct / n_chars
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok >= 2.0) & (mean_tok <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return {
        "n_tokens": n_tokens,
        "mean_token_len": F.round(mean_tok, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "quality_score": F.round(score, 2),
    }


def token_count_cols(text: Column) -> dict[str, Column]:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(chars/4), the common ~4-chars-per-token heuristic)."""
    toks = tokens_col(text)
    n_chars = F.length(text).cast("long")
    return {
        "ws_tokens": F.size(toks).cast("long"),
        "bpe_est_tokens": F.ceil(n_chars / F.lit(4.0)).cast("long"),
    }


def fingerprint_cols(text: Column) -> dict[str, Column]:
    """Document fingerprints:
    * ``fp_md5``  — md5 of the whitespace-normalized, lowercased text,
    * ``fp_roll`` — 31-ary rolling hash over token hash32s mod 2^31-1.
      DuckDB's ``list_reduce`` has no initial accumulator (folds from the
      first element), so the Spark fold mirrors that shape exactly:
      init = hash32(tok[0]) un-modded, then acc = (acc*31 + h) % p.
    """
    norm = F.lower(F.regexp_replace(F.trim(text), r" +", " "))
    toks = tokens_col(norm)
    hashes = F.transform(toks, hash32_col)
    roll = F.aggregate(
        F.slice(hashes, 2, F.greatest(F.size(hashes) - 1, F.lit(0))),
        F.element_at(hashes, 1),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(2147483647),
    )
    return {"fp_md5": F.md5(norm), "fp_roll": roll}


def stratified_sample_flag(
    doc_id: Column, stratum: Column, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "samp",
) -> Column:
    """Deterministic per-stratum Bernoulli sampling decision (boolean).

    A pretraining-corpus mixer needs "keep X% of lang A, Y% of lang B"
    decisions that are REPRODUCIBLE at any parallelism and on re-runs —
    ``rand()`` is banned engine-wide (SURVEY.md §4). The coin is
    ``hash32(salt|doc_id) % 10000 < rate * 10000``: md5-derived, so the
    same doc always gets the same verdict in Spark, DuckDB, or plain
    Python, and disjoint salts give independent samples. Pure column
    expression — at 100 TB this is a codegen'd filter with zero shuffle.
    """
    coin = hash32_col(F.concat(F.lit(f"{salt}|"), doc_id.cast("string"))) % 10000
    expr = F.lit(int(round(default_rate * 10000)))
    for key, rate in sorted(rates.items()):
        expr = F.when(stratum == key, F.lit(int(round(rate * 10000)))).otherwise(expr)
    return coin < expr


def repetition_cols(text: Column) -> dict[str, Column]:
    """Gopher-style repetition signals: distinct-token ratio and the
    duplicate-bigram fraction (share of 2-grams that are repeats of an
    earlier 2-gram in the same document).

    Highly repetitive documents (keyword stuffing, boilerplate loops,
    generator spam) score low on distinct ratios; training-data pipelines
    gate on these before anything expensive runs. Pure array expressions —
    whole-stage codegen, no Python, no shuffle beyond the enclosing
    projection. Bigrams are built by zipping two shifted SLICES of the token
    array (lambdas touch only their own arguments — the captured-expression
    re-inlining trap documented on ``dedup.shingles_df``).
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("long")
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    m = n_tokens.cast("int") - F.lit(1)
    bigrams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat_ws(" ", a, b)
    )
    dup_bigram_frac = F.when(
        m > 0, F.lit(1.0) - F.size(F.array_distinct(bigrams)) / m.cast("double")
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tokens,
        "distinct_token_ratio": F.round(distinct_ratio, 4),
        "dup_bigram_frac": F.round(dup_bigram_frac, 4),
    }


def word_diversity(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simpson-index lexical diversity — a rational-exact gibberish signal.

    Entropy is the textbook diversity measure but needs ``ln``, which is NOT
    bit-stable across engines (CLAUDE.md r4); the Simpson concentration
    index sum_i (c_i/N)^2 carries the same keep/drop signal for corpus
    filtering and is a RATIO OF INTEGERS: emit the exact numerator
    sum(c_i^2) and N, divide once per row in doubles (per-row double
    arithmetic IS bit-identical), round. ``inv_simpson`` = N^2/sum(c_i^2)
    reads as "effective vocabulary size": 1.0 = one token repeated (spam),
    N = all tokens distinct.

    Scale shape: explode tokens -> groupBy (doc, token) -> groupBy doc, both
    map-side combined, keys salted by nothing (doc_id already spreads);
    output one row per doc. No windows, no joins, no floats until the final
    per-row division.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = per_tok.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        "sum_sq",
        F.round(F.col("sum_sq") / (F.col("n_tokens") * F.col("n_tokens")), 6).alias("simpson"),
        F.round((F.col("n_tokens") * F.col("n_tokens")) / F.col("sum_sq"), 6).alias("inv_simpson"),
    )


def sentence_cols(text: Column) -> dict[str, Column]:
    """Sentence segmentation stats — boundary-char counting, not splitting
    (engines disagree on trailing-empty split semantics, so we never
    split): n_bounds = chars removed by stripping '[.!?]'; a text with no
    terminal punctuation is one sentence. mean_sentence_len divides the
    NON-boundary chars by the sentence count — one per-row double
    division, rounded once (cross-engine bit-identical)."""
    n_chars = F.length(text).cast("long")
    n_bounds = (n_chars - F.length(F.regexp_replace(text, "[.!?]", ""))).cast(
        "long"
    )
    n_sentences = F.greatest(F.lit(1).cast("long"), n_bounds)
    return {
        "n_sentences": n_sentences,
        "mean_sentence_len": F.round(
            (n_chars - n_bounds).cast("double") / n_sentences.cast("double"), 4
        ),
    }


def readability_cols(text: Column) -> dict[str, Column]:
    """Flesch-style readability signals — the classic reading-ease formula
    over three engine-shared integer counts (words, sentence boundaries,
    vowel-group syllable proxy). Corpus pipelines use the score as a cheap
    fluency gate next to the bigram LM (operators/lm.py) and the
    quality_score ladder; the reference's parse pass has no analog — this
    is 100 TB-pipeline surface, per the round brief.

    Cross-engine parity: the three counts are integers (sentence
    boundaries by strip-and-diff as in :func:`sentence_cols`; syllable
    groups by marking every '[aeiouy]+' run as a single 'V' in the
    LOWERCASED text — which cannot itself contain 'V' — then counting the
    markers by translate-and-diff); the Flesch formula is then pure
    per-row IEEE double arithmetic (identical in JVM and DuckDB), and the
    score is floor-truncated, never round()ed (the tie-digit trap,
    CLAUDE.md round-4 lessons)."""
    toks = tokens_col(text)
    n_words = F.size(toks).cast("long")  # split('',' ')=[''] => always >= 1
    n_chars = F.length(text).cast("long")
    n_bounds = (n_chars - F.length(F.regexp_replace(text, "[.!?]", ""))).cast(
        "long"
    )
    n_sentences = F.greatest(F.lit(1).cast("long"), n_bounds)
    marked = F.regexp_replace(F.lower(text), "[aeiouy]+", "V")
    n_syll = (
        F.length(marked) - F.length(F.translate(marked, "V", ""))
    ).cast("long")
    w, s = n_words.cast("double"), n_sentences.cast("double")
    y = n_syll.cast("double")
    flesch = (
        F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w)
    )
    flesch_t = F.floor(flesch * F.lit(1000000.0)) / F.lit(1000000.0)
    band = (
        F.when(flesch_t >= 90.0, F.lit("very_easy"))
        .when(flesch_t >= 60.0, F.lit("plain"))
        .when(flesch_t >= 30.0, F.lit("difficult"))
        .otherwise(F.lit("very_difficult"))
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sentences,
        "n_syllables": n_syll,
        "flesch": flesch_t,
        "band": band,
    }


def unicode_profile_cols(text: Column) -> dict[str, Column]:
    """Charset/encoding QA — the mojibake gate every web-text cleaning
    ladder runs before tokenization: ASCII ratio, C0-control count, and
    the classic UTF-8-decoded-as-Latin-1 marker ('Ã' — a corpus with
    real multilingual text has some, a corpus with double-decoded text
    has one per non-ASCII character). Pure codegen projection.

    Parity notes: counts by strip-and-diff (never split); `length` is
    codepoints in both engines; the regexes live in PYTHON string
    literals on the Spark side and a separate SQL string for DuckDB, so
    the Hive-backslash-escaping trap for shared snippets (CLAUDE.md)
    never applies; the one ratio is a per-row double division,
    floor-truncated."""
    n_chars = F.length(text).cast("long")
    n_ascii = F.length(F.regexp_replace(text, "[^\x00-\x7f]", "")).cast("long")
    n_control = (
        n_chars
        - F.length(
            F.regexp_replace(text, "[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
        )
    ).cast("long")
    n_moji = (n_chars - F.length(F.translate(text, "Ã", ""))).cast("long")
    ratio = n_ascii.cast("double") / F.greatest(
        F.lit(1).cast("long"), n_chars
    ).cast("double")
    ratio_t = F.floor(ratio * F.lit(1000000.0)) / F.lit(1000000.0)
    flag = (
        F.when((ratio_t < 0.95) | (n_moji > 0), F.lit("suspect"))
        .when(n_control > 0, F.lit("control_chars"))
        .otherwise(F.lit("clean"))
    )
    return {
        "n_chars": n_chars,
        "n_ascii": n_ascii,
        "n_control": n_control,
        "n_mojibake": n_moji,
        "ascii_ratio": ratio_t,
        "charset_flag": flag,
    }


def ngram_novelty(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Per-document n-gram NOVELTY — what fraction of a doc's shingles
    appear here for the first time (by doc_id order) anywhere in the
    corpus. The training-data freshness metric: a crawl snapshot whose
    new documents mostly re-state old shingles adds tokens but no
    information; dashboards watch the novelty distribution drift toward
    zero as a corpus saturates. Complements dedup (which finds PAIRS):
    novelty is a per-doc scalar even for docs with no near-duplicate.

    Not in the reference (its dedup is exact note-id `already_done`,
    /root/reference/crawler.py); standard corpus-curation practice.

    Shape (3 shuffles over the shingle table, all equi-keyed):
      1. groupBy(shingle) -> min(doc_id): map-side partial MIN, so the
         shuffle carries one row per distinct (partition, shingle);
      2. join back on shingle (1 row per side pair; boilerplate-hot
         shingles skew the key — AQE skew-join splits them, and the
         per-key payload is one BIGINT, not the text);
      3. groupBy(doc_id): partial-agg counts.
    No UDF, no broadcast of anything corpus-sized. ``first_doc ==
    doc_id`` ties are exact (min over BIGINT), so output is
    deterministic at any parallelism. The ratio is a single per-row
    double division, floor-truncated (round() tie-digit trap,
    CLAUDE.md r4)."""
    from .dedup import shingles_df

    sh = shingles_df(corpus, n)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    ratio = F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        (F.floor(ratio * F.lit(1000000.0)) / F.lit(1000000.0)).alias("novelty"),
    )


def kfold_assign(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    salt: str = "kfold",
) -> DataFrame:
    """Deterministic k-fold split audit — fold = md5(salt|id) % k, then a
    per-(fold, stratum) balance rollup. Training pipelines need splits
    that are (a) reproducible across re-runs and cluster sizes (content
    hash, never row position or rand()) and (b) balanced within every
    stratum so no fold over-samples one source. Output: one row per
    (fold, stratum) with its count and the deviation from the ideal
    stratum_total/k share in parts-per-million (integer arithmetic —
    exact at any scale, no float share).

    ONE groupBy on (fold, stratum) + a stratum-total window over the
    tiny k x |strata| rollup. The fold coin reuses the
    stratified-sample hash kit (hash32_col) so both samplers stay
    consistent."""
    fold = (
        hash32_col(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))) % k
    ).alias("fold")
    rolled = docs.select(fold, F.col(stratum_col).alias("stratum")).groupBy(
        "fold", "stratum"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = Window.partitionBy("stratum")
    total = F.sum("n_docs").over(w)
    # ppm deviation from the ideal total/k share: all-integer, exact
    dev = (F.col("n_docs") * k - total) * F.lit(1000000) / (total * k)
    return rolled.select(
        "fold",
        "stratum",
        "n_docs",
        total.cast("long").alias("stratum_total"),
        F.floor(dev).cast("long").alias("dev_ppm"),
    )


def quality_q10_col(text: Column) -> Column:
    """Composite quality score in integer TENTHS (0..10) — the exact
    predicates of :func:`quality_score_cols` with integer weights
    (4/3/2/1) instead of float literals. Use this wherever the score is
    COMPARED or aggregated (keeper selection, rollups): integers are
    exactly representable and totally ordered with no 0.1+0.2 float-sum
    artifacts, while the per-row double predicates (mean_tok, ratios)
    remain bit-identical across engines."""
    toks = tokens_col(text)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    mean_tok = (n_chars - (n_tokens - F.lit(1))) / n_tokens
    stop_ratio = stopword_hits(toks, STOPWORDS["en"]).cast("long") / n_tokens
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    ) / n_chars
    return (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(4)).otherwise(F.lit(0))
        + F.when((mean_tok >= 2.0) & (mean_tok <= 12.0), F.lit(3)).otherwise(F.lit(0))
        + F.when(stop_ratio >= 0.01, F.lit(2)).otherwise(F.lit(0))
        + F.when(punct_ratio <= 0.2, F.lit(1)).otherwise(F.lit(0))
    ).cast("long")


CODE_KEYWORDS = ("def ", "return ", "import ", "void ", "class ")


def code_detect_cols(text: Column) -> dict[str, Column]:
    """Code-vs-prose detection signals — brace/semicolon density and
    keyword hits: the training-data router that splits a web corpus into
    code and natural-language streams before per-stream quality gates
    (code tolerates high symbol density that the prose quality score
    would reject). All counts via the replace-trick (substring
    occurrence = length delta / pattern length — exact integers, no
    regex, identical in Spark and DuckDB); is_code is a conjunction of
    absolute-count gates so it is length-stable. Pure per-row codegen
    expressions, zero shuffle at scan time.
    """

    def _hits(sub: str) -> Column:
        diff = F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit("")))
        if len(sub) == 1:
            return diff.cast("long")
        return (diff / F.lit(len(sub))).cast("long")

    n_braces = (_hits("{") + _hits("}")).cast("long")
    n_semis = _hits(";")
    kw_hits = None
    for kw in CODE_KEYWORDS:
        h = _hits(kw)
        kw_hits = h if kw_hits is None else kw_hits + h
    kw_hits = kw_hits.cast("long")
    score = (n_braces * F.lit(3) + n_semis * F.lit(2) + kw_hits * F.lit(5)).cast(
        "long"
    )
    return {
        "n_braces": n_braces,
        "n_semis": n_semis,
        "kw_hits": kw_hits,
        "code_score": score,
        "is_code": (n_braces >= 2) & (n_semis >= 2) & (kw_hits >= 2),
    }


def code_detect_sql_cols(text_expr: str) -> dict[str, str]:
    """Oracle twin of :func:`code_detect_cols` — SQL expression strings
    over ``text_expr``, same replace-trick arithmetic."""

    def _hits(sub: str) -> str:
        esc = sub.replace("'", "''")
        diff = (
            f"(length({text_expr}) - length(replace({text_expr}, '{esc}', '')))"
        )
        if len(sub) == 1:
            return diff
        return f"({diff} / {len(sub)})"

    n_braces = f"({_hits('{')} + {_hits('}')})"
    n_semis = _hits(";")
    kw = " + ".join(_hits(k) for k in CODE_KEYWORDS)
    return {
        "n_braces": f"{n_braces}::BIGINT",
        "n_semis": f"{n_semis}::BIGINT",
        "kw_hits": f"({kw})::BIGINT",
        "code_score": f"({n_braces}::BIGINT * 3 + {n_semis}::BIGINT * 2"
        f" + ({kw})::BIGINT * 5)::BIGINT",
        "is_code": f"{n_braces}::BIGINT >= 2 and {n_semis}::BIGINT >= 2"
        f" and ({kw})::BIGINT >= 2",
    }
