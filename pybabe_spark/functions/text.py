"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All hot paths are built-in column expressions (JVM-side, whole-stage
codegen); no Python UDFs. Every function has a DuckDB-expressible mirror
(see pybabe_spark/queries_text.py) so the driver's oracle gate covers them.

These extend the reference surface (PyBabe has no text analytics) per the
project north star; the closest reference analogue is the scalar-enrichment
family (pybabe/geoip.py, pybabe/user_agent.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small public stopword lexicons per language (common-word heuristic).
LEXICONS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "zh": ["的", "一", "是", "不", "了", "人", "我", "在", "有", "他"],
}

#: Tokenizer pattern shared with the oracle SQL (ASCII classes only so the
#: regex dialects agree): words OR single non-word non-space symbols.
TOKEN_PATTERN = "([A-Za-z0-9]+|[^A-Za-z0-9 ])"


def words(text: Column | str) -> Column:
    """Whitespace word split."""
    return F.split(F.col(text) if isinstance(text, str) else text, " ", -1)


class CharPairTokenizer:
    """Deterministic reference tokenizer: non-overlapping 2-char chunks.

    Exists so the tokenizer SEAM itself is oracle-checkable: its token
    count is exactly ``(length(text)+1) // 2`` and a head token-slice
    decode is exactly ``substr(text, 1, 2*budget)`` — both ANSI-SQL
    expressions a DuckDB oracle can replay, so the registry carries
    driver-green rows for the seam's pandas-UDF count path AND the
    encode→slice→decode clip path (queries_text.py::
    pack_tokens_tokenizer_docs / clip_docs_tokenizer), not just unit
    tests with an injected toy. Shaped like the public protocol
    (tiktoken / HF): ``encode`` → token list, ``decode`` → exact text.
    """

    def encode(self, s):
        return [s[i:i + 2] for i in range(0, len(s), 2)]

    def decode(self, toks):
        return "".join(toks)


def resolve_tokenizer(tokenizer):
    """Normalize a user tokenizer to ``{'encode', 'encode_batch',
    'decode'}`` — resolved on the DRIVER at plan time and shipped to
    executors inside the pandas-UDF closure (the exact seam pattern of
    ``multimodal._image_decoder``, multimodal.py:66), so a misconfigured
    tokenizer fails at plan build, not as a worker ImportError.

    Accepted shapes (matching the public tokenizer ecosystems):

    - an object with ``.encode(str) -> Sequence`` (tiktoken,
      HF ``PreTrainedTokenizer``); ``.encode_batch(list[str])`` is used
      when present (HF fast tokenizers — one Python call per Arrow
      batch); ``.decode(Sequence) -> str`` enables exact token-slice
      clipping in :func:`pybabe_spark.operators.packing.clip_documents`;
    - a bare callable ``f(str) -> Sequence`` of tokens.

    Returns ``None`` for ``tokenizer=None`` (callers then take the
    default whitespace/symbol-regex heuristic — the codegen path every
    oracle-checked query uses).
    """
    if tokenizer is None:
        return None
    encode = getattr(tokenizer, "encode", None)
    if encode is None and callable(tokenizer):
        encode = tokenizer
    if encode is None:
        raise TypeError(
            "tokenizer must be a callable text -> tokens or expose "
            f".encode(); got {type(tokenizer).__name__}"
        )
    return {
        "encode": encode,
        "encode_batch": getattr(tokenizer, "encode_batch", None),
        "decode": getattr(tokenizer, "decode", None),
    }


def token_count(text: str, tokenizer=None) -> Column:
    """Token count of a text column.

    Default (``tokenizer=None``): BPE-ish heuristic — word runs +
    individual symbols via ``regexp_count``, pure codegen; the same
    pattern runs in DuckDB via len(regexp_extract_all(...)), which is
    what keeps the oracle gate on this path.

    With a ``tokenizer`` (see :func:`resolve_tokenizer`): real
    tokenizer-token counts through an Arrow-batched ``pandas_udf`` —
    one Python invocation per Arrow batch, vectorized through
    ``encode_batch`` when the tokenizer provides it. This is the
    pluggable seam real training pipelines budget with (BPE tokens);
    :func:`~pybabe_spark.operators.packing.pack_tokens`,
    :func:`~pybabe_spark.operators.packing.clip_documents` and
    ``Babe.text_stats`` all thread it through. NULL text counts 0.
    """
    if tokenizer is None:
        return F.regexp_count(F.col(text), F.lit(TOKEN_PATTERN))
    tok = resolve_tokenizer(tokenizer)
    encode, encode_batch = tok["encode"], tok["encode_batch"]

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _count(s):
        vals = s.fillna("")
        if encode_batch is not None:
            return pd.Series(
                [len(t) for t in encode_batch(vals.tolist())],
                index=s.index,
                dtype="int64",
            )
        return vals.map(lambda t: len(encode(t))).astype("int64")

    # real annotation objects: PEP-563 stringified hints (this module's
    # `from __future__ import annotations`) are invisible to pandas_udf
    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "bigint")(F.col(text))


def tokens(text: str, tokenizer=None) -> Column:
    """The token ARRAY of a text column (the materialized form
    downstream n-gram / embedding stages consume).

    Default: the heuristic pattern via ``regexp_extract_all`` — pure
    codegen, mirrored in DuckDB by the same ASCII-class regex (the
    parity the oracle-checked ``tokenize_docs`` key certifies). With a
    ``tokenizer``: the seam's Arrow-batched pandas UDF returning
    ``array<string>`` of real tokenizer tokens (NULL text → empty
    array).
    """
    if tokenizer is None:
        return F.regexp_extract_all(F.col(text), F.lit(TOKEN_PATTERN), 1)
    tok = resolve_tokenizer(tokenizer)
    encode, encode_batch = tok["encode"], tok["encode_batch"]

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _toks(s):
        vals = s.fillna("")
        if encode_batch is not None:
            return pd.Series(
                [list(map(str, t)) for t in encode_batch(vals.tolist())],
                index=s.index,
            )
        return vals.map(lambda t: list(map(str, encode(t))))

    _toks.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_toks, "array<string>")(F.col(text))


def word_count(text: str) -> Column:
    return F.size(words(text))


def lang_scores(text: str) -> dict[str, Column]:
    """Per-language distinct-stopword hit counts."""
    w = words(text)
    return {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(t) for t in terms])))
        for lang, terms in LEXICONS.items()
    }


def lang_id(text: str) -> Column:
    """Heuristic language ID: argmax of stopword hits.

    Deterministic tie-break: first language in alphabetical order reaching
    the max score; zero hits → 'unknown'. Mirrors exactly onto a SQL CASE
    chain over GREATEST(...).
    """
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    # build the CASE chain back-to-front so earlier langs win ties
    expr = F.when(best == F.lit(0), F.lit("unknown"))
    for lang in sorted(scores):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(out)


def quality_score(text: str) -> Column:
    """Composite quality heuristic in [0, 1].

    - stopword ratio (en lexicon) — fluency proxy (weight .3)
    - capped length score: min(words/100, 1) (weight .4)
    - mean word length in the readable 3-8 band → .3 else .1

    Pure double arithmetic over exact integer inputs with a fixed
    expression tree — bit-identical across engines.
    """
    w = words(text)
    n_words = F.size(w)
    en = LEXICONS["en"]
    stop_hits = F.size(F.array_intersect(w, F.array(*[F.lit(t) for t in en])))
    stop_ratio = stop_hits.cast("double") / n_words.cast("double")
    len_score = F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
    # chars excluding the separators, averaged per word
    avg_wlen = (F.length(F.col(text)) - (n_words - F.lit(1))).cast("double") / n_words.cast("double")
    wlen_score = F.when((avg_wlen >= 3.0) & (avg_wlen <= 8.0), F.lit(0.3)).otherwise(F.lit(0.1))
    return stop_ratio * F.lit(0.3) + len_score * F.lit(0.4) + wlen_score


def shingle_array(words_col: Column, n: int) -> Column:
    """Distinct word n-gram shingles from a PRE-SPLIT words array column.

    Splitting once into a projected column and shingling from it avoids
    re-evaluating ``split(text)`` inside the lambda per element (HOF
    bodies are interpreted; common subexpressions are not hoisted out of
    them). Docs shorter than n shingle to the rejoined text.
    """
    if n == 1:
        return F.array_distinct(words_col)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words_col, i + k + 1) for k in range(n)]
    )
    return F.array_distinct(
        F.when(
            F.size(words_col) >= n,
            F.transform(F.sequence(F.lit(0), F.size(words_col) - n), gram),
        ).otherwise(F.array(F.concat_ws(" ", words_col)))
    )


def shingles(text: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    0-based array indexing inside the SQL lambda; docs shorter than n
    shingle to the whole text. Built-ins only — no UDF.
    """
    if n == 1:
        return F.array_distinct(words(text))
    join_expr = ", ' ', ".join([f"__w[i + {k}]" for k in range(n)])
    return F.expr(
        f"array_distinct(CASE WHEN size(split({text}, ' ', -1)) >= {n} THEN "
        f"transform(sequence(0, size(split({text}, ' ', -1)) - {n}), "
        f"i -> concat({join_expr})) "
        f"ELSE array({text}) END)".replace("__w", f"split({text}, ' ', -1)")
    )


def fingerprint(text: str, n: int = 3) -> Column:
    """Document fingerprint: min md5 over word n-gram shingles.

    A 1-permutation MinHash — stable under word-order-preserving edits at
    the ends of the doc, cheap (one pass, no shuffle), and expressible in
    any SQL engine (min over md5 hex strings is a valid MinHash order).
    """
    return F.array_min(F.transform(shingles(text, n), lambda s: F.md5(s)))


def exact_key(text: str) -> Column:
    """Exact-dedup key: md5 of case/whitespace-normalized text."""
    norm = F.lower(F.regexp_replace(F.col(text), " +", " "))
    return F.md5(F.trim(norm))


def word_entropy(text: str) -> Column:
    """Shannon entropy (bits) of the document's word distribution — a
    cheap perplexity proxy: near-zero for degenerate repetition, high
    for diverse text. Used as a quality signal next to
    :func:`quality_score`.

    Pure higher-order-function codegen — per-row O(words × distinct),
    narrow map, no shuffle, no UDF; DECIMAL(18,6)-rounded so the DuckDB
    oracle's different summation order cannot flip a comparison.
    """
    ws = f"split({text}, ' ', -1)"
    counts = (
        f"transform(array_distinct({ws}), d -> "
        f"size(filter({ws}, w -> w = d)))"
    )
    n = f"cast(size({ws}) as double)"
    return (
        F.expr(
            f"-aggregate({counts}, 0D, (acc, c) -> "
            f"acc + (c / {n}) * log2(c / {n}))"
        )
        .cast("decimal(18,6)")
        .cast("double")
    )


# ---------------------------------------------------------------------------
# Repetition / quality-rule filters (Gopher & C4 style)
# ---------------------------------------------------------------------------

def dup_line_fraction(text: str, line_sep: str = "\n") -> Column:
    """Fraction of lines that are duplicates of an earlier line — the
    boilerplate detector from the Gopher quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A.2). 1 − distinct/total over the line split; pure
    array built-ins, codegen-side, no UDF."""
    lines = F.split(F.col(text), line_sep, -1)
    n = F.size(lines)
    return (
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / n.cast("double")
    )


def top_ngram_fraction(text: str, n: int = 2) -> Column:
    """Fraction of the document's words covered by its single most
    frequent word n-gram (Gopher repetition rule), clamped to [0, 1] —
    the occurrence-count approximation (count × n / words) overshoots 1
    for very short or self-overlapping docs ("single" → 2/1). aggregate()
    over the shingle counts — all higher-order built-ins, no shuffle,
    no UDF."""
    w = words(text)
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + k + F.lit(1)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g)),
        )
    )
    return F.least(
        F.lit(1.0),
        (top_count * F.lit(n)).cast("double") / F.size(w).cast("double"),
    )


def symbol_word_ratio(text: str) -> Column:
    """Non-alphanumeric symbol count per word (C4/Gopher junk detector)."""
    symbols = F.regexp_count(F.col(text), F.lit("[^A-Za-z0-9 ]"))
    return symbols.cast("double") / F.size(words(text)).cast("double")


def gopher_quality_flags(text: str) -> Column:
    """Struct of the standard repetition-rule verdicts: a doc passes when
    dup-line fraction ≤ 0.30, top-bigram coverage ≤ 0.18, symbol/word
    ratio ≤ 0.10, and 3 ≤ mean word length ≤ 10 (thresholds from the
    Gopher paper's filtering appendix). The bigram rule is waived below
    Gopher's 50-word document floor — a repetition-free short doc's top
    bigram trivially covers >18% of it (any doc under ~12 words would
    be unconditionally flagged), and the paper judges such docs by the
    length rule, not repetition."""
    w = words(text)
    n_words = F.size(w)
    mean_wlen = (
        F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_words.cast("double")
    )
    return F.struct(
        (dup_line_fraction(text) <= 0.30).alias("lines_ok"),
        ((n_words < 50) | (top_ngram_fraction(text, 2) <= 0.18)).alias(
            "bigram_ok"
        ),
        (symbol_word_ratio(text) <= 0.10).alias("symbols_ok"),
        ((mean_wlen >= 3.0) & (mean_wlen <= 10.0)).alias("wlen_ok"),
    )


# ---------------------------------------------------------------------------
# Readability
# ---------------------------------------------------------------------------

#: syllable heuristic: one syllable per maximal vowel group (y counts as
#: a vowel), floored at one per word — the standard cheap estimator the
#: Flesch formulas were tuned against. Shared verbatim with the oracle.
_SYLLABLE_RE = "[aeiouy]+"
_SENTENCE_RE = "[.!?]+"


def _floordiv_duck(num: str, den: str) -> str:
    """Portable FLOOR division for possibly-negative integer ``num``
    (DuckDB spelling): truncating div rounds toward zero, which differs
    from floor on negatives — subtracting the positive pmod first makes
    the numerator exactly divisible, so truncation IS floor. The Spark
    twin is ``_readability_struct``'s ``_floordiv``."""
    return (
        f"((({num}) - (((({num}) % ({den})) + ({den})) % ({den})))"
        f" // ({den}))"
    )


def readability(text: str) -> Column:
    """Flesch readability per document, EXACT integer arithmetic:
    struct ``(n_words, n_sentences, n_syllables, reading_ease_ppm,
    fk_grade_ppm)``.

    - words: whitespace split (``words``), so W ≥ 1 on any non-null
      text (empty text splits to one empty word — scored, not crashed).
    - sentences: maximal ``[.!?]+`` runs, floored at 1.
    - syllables: maximal vowel groups (``[aeiouy]+``, lowercased),
      floored at one per word.
    - Flesch reading ease ``206.835 − 1.015·W/S − 84.6·Y/W`` and
      Flesch–Kincaid grade ``0.39·W/S + 11.8·Y/W − 15.59`` are emitted
      as FLOORED integral ppm (×1e6) over the common denominator S·W —
      exact integer arithmetic end to end, with the quadratic count
      products formed in DECIMAL(38,0) so even pathological documents
      can't overflow int64 (the house integral-ppm idiom: no IEEE
      division, so any SQL engine replays the exact value; the
      pmod-floor construction keeps negative grades floor-consistent
      across engines, where plain integer division truncates).

    All counts are ``regexp_count``/``size`` — whole-stage codegen, no
    UDF, no shuffle; linear scan at any corpus size.
    """
    c = F.col(text)
    w_cnt = F.size(words(text)).cast("bigint")
    s_cnt = F.greatest(
        F.regexp_count(c, F.lit(_SENTENCE_RE)).cast("bigint"), F.lit(1)
    )
    y_cnt = F.greatest(
        F.regexp_count(F.lower(c), F.lit(_SYLLABLE_RE)).cast("bigint"),
        w_cnt,
    )
    return _readability_struct(w_cnt, s_cnt, y_cnt)


def _readability_struct(w_cnt: Column, s_cnt: Column, y_cnt: Column) -> Column:
    """Assemble the readability struct from the three counts (split out
    so the counts stay Column-typed — no string substitution of
    sub-expressions into one giant SQL text)."""

    def _floordiv(num: Column, den: Column) -> Column:
        # subtract the positive mod so the quotient is integral, then
        # divide in DECIMAL(38,0) — exact at any magnitude (a double
        # division would silently lose exactness past 2^53, i.e. on
        # ~100k-word documents)
        adj = (num - F.pmod(num, den)).cast("decimal(38,0)")
        return (adj / den.cast("decimal(38,0)")).cast("bigint")

    # numerators are formed in DECIMAL(38,0), not BIGINT: the ppm
    # constants are ~2e8 and the count products quadratic, so a very
    # large single document (~2e5+ words of short sentences) would
    # overflow int64 mid-product and abort the job under ANSI before
    # _floordiv's decimal exactness ever applied (the DuckDB twin
    # widens to HUGEINT for the same reason)
    wd = w_cnt.cast("decimal(38,0)")
    sd = s_cnt.cast("decimal(38,0)")
    yd = y_cnt.cast("decimal(38,0)")
    ease_num = (
        F.lit(206835000) * sd * wd
        - F.lit(1015000) * wd * wd
        - F.lit(84600000) * yd * sd
    )
    grade_num = (
        F.lit(390000) * wd * wd
        + F.lit(11800000) * yd * sd
        - F.lit(15590000) * sd * wd
    )
    den = sd * wd
    return F.struct(
        w_cnt.alias("n_words"),
        s_cnt.alias("n_sentences"),
        y_cnt.alias("n_syllables"),
        _floordiv(ease_num, den).alias("reading_ease_ppm"),
        _floordiv(grade_num, den).alias("fk_grade_ppm"),
    )


def readability_sql(
    text_col: str = "text", table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle of :func:`readability` — identical regexes, the
    same pmod-floor ppm arithmetic (``//`` after subtracting the
    positive mod; DuckDB ``%`` truncates like Spark's, so the
    construction is engine-identical)."""
    w = f"CAST(len(string_split({text_col}, ' ')) AS BIGINT)"
    s = (
        "GREATEST(CAST(len(regexp_extract_all("
        f"{text_col}, '{_SENTENCE_RE}')) AS BIGINT), 1)"
    )
    y = (
        "GREATEST(CAST(len(regexp_extract_all("
        f"lower({text_col}), '{_SYLLABLE_RE}')) AS BIGINT), {w})"
    )
    # HUGEINT inside the numerators (count columns stay BIGINT in the
    # output): the ppm constants are ~2e8 and the count products
    # quadratic, so int64 would overflow on very large single
    # documents (the Spark twin widens to DECIMAL(38,0))
    hw, hs, hy = (
        "CAST(__W AS HUGEINT)",
        "CAST(__S AS HUGEINT)",
        "CAST(__Y AS HUGEINT)",
    )
    ease_num = (
        f"(206835000 * {hs} * {hw} - 1015000 * {hw} * {hw}"
        f" - 84600000 * {hy} * {hs})"
    )
    grade_num = (
        f"(390000 * {hw} * {hw} + 11800000 * {hy} * {hs}"
        f" - 15590000 * {hs} * {hw})"
    )
    den = f"({hs} * {hw})"
    return f"""
    WITH cnts AS (
      SELECT {id_col}, {w} AS __W, {s} AS __S, {y} AS __Y
      FROM {table} WHERE {text_col} IS NOT NULL
    )
    SELECT {id_col},
           __W AS n_words, __S AS n_sentences, __Y AS n_syllables,
           CAST({_floordiv_duck(ease_num, den)} AS BIGINT)
             AS reading_ease_ppm,
           CAST({_floordiv_duck(grade_num, den)} AS BIGINT)
             AS fk_grade_ppm
    FROM cnts
    """


def compression_ratio(text: str, level: int = 6) -> Column:
    """zlib bytes-in / bytes-out per document as a double — the classic
    compressibility quality signal (Gopher / RefinedWeb): repetitive
    boilerplate compresses far better than natural prose, so a HIGH
    ratio flags template/spam text the n-gram rules can miss, and a
    ratio near 1.0 flags random/binary junk.

    Genuinely non-SQL-expressible (an actual DEFLATE pass), so this is
    the documented Arrow-batched ``pandas_udf`` seam — one Python
    invocation per Arrow batch, zlib at ``level`` (deterministic: zlib
    output is fully specified by input+level+strategy, so the same text
    scores identically on every executor and every run). NULL and
    empty text score NULL (no bytes to compress — 0/overhead would
    fabricate a misleading sub-1.0 ratio).

    Scale shape: narrow map, zero shuffle; the per-batch cost is the
    DEFLATE pass itself (~100 MB/s/core), which is why it runs over
    Arrow batches and not per row.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)
    if not 1 <= lvl <= 9:
        raise ValueError(f"compression_ratio: level {lvl} outside [1, 9]")

    def _ratio(s):
        import zlib

        def one(t):
            if t is None or t == "":
                return None
            raw = t.encode("utf-8")
            return len(raw) / len(zlib.compress(raw, lvl))

        return s.map(one).astype("float64")

    _ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_ratio, "double")(F.col(text))


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

#: Conservative ASCII patterns shared verbatim with the oracle SQL — the
#: goal is a deterministic, engine-agnostic scrub, not maximal recall.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IP": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "PHONE": r"\+[0-9][0-9 ()-]{6,}[0-9]",
}


def pii_scrub(text: str) -> Column:
    """Replace emails / IPv4s / intl-format phone numbers with
    ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` placeholder tags. Chained
    regexp_replace — JVM regex, whole-stage codegen, no UDF. Order
    matters: emails first (their host part would otherwise be left
    looking like a bare domain), then IPs, then phones."""
    out = F.col(text)
    for tag in ("EMAIL", "IP", "PHONE"):
        out = F.regexp_replace(out, PII_PATTERNS[tag], f"<{tag}>")
    return out


def pii_count(text: str) -> Column:
    """Total PII hits (emails + IPs + phones) in the document."""
    return sum(
        F.regexp_count(F.col(text), F.lit(p)) for p in PII_PATTERNS.values()
    )


def normalize_text(
    text: str,
    lower: bool = True,
    strip_punct: bool = False,
    collapse_ws: bool = True,
) -> Column:
    """Canonical text cleanup ahead of tokenization/dedup: lowercase →
    optional punctuation strip (conservative ``[^a-z0-9 ]`` class, same
    semantics in Java regex and RE2) → space-run collapse → trim.
    Chained codegen expressions, no UDF, no shuffle.

    The exact-dedup and shingle families key on the NORMALIZED form
    when this runs first — the standard "casing/punctuation shouldn't
    defeat dedup" step (cf. ``exact_key``'s md5 over raw text).
    """
    out: Column = F.col(text) if isinstance(text, str) else text
    if lower:
        out = F.lower(out)
    if strip_punct:
        cls = "[^a-z0-9 ]" if lower else "[^A-Za-z0-9 ]"
        out = F.regexp_replace(out, cls, "")
    if collapse_ws:
        out = F.regexp_replace(out, "  *", " ")
        out = F.trim(out)
    return out


def normalize_text_sql(
    col: str,
    lower: bool = True,
    strip_punct: bool = False,
    collapse_ws: bool = True,
) -> str:
    """DuckDB mirror of :func:`normalize_text` (RE2 needs the explicit
    ``'g'`` flag where Java's regexp_replace is global by default)."""
    out = col
    if lower:
        out = f"lower({out})"
    if strip_punct:
        cls = "[^a-z0-9 ]" if lower else "[^A-Za-z0-9 ]"
        out = f"regexp_replace({out}, '{cls}', '', 'g')"
    if collapse_ws:
        out = f"trim(regexp_replace({out}, '  *', ' ', 'g'))"
    return out
