"""Phonetic keys (Soundex) for record-linkage blocking — pure codegen.

Beyond-reference capability: phonetic blocking is the classic
complement to the engine's edit-distance blocking
(``operators/fuzzy.py`` — SymSpell deletion keys): deletion keys catch
typos, phonetic keys catch spelling-by-ear variants at any edit
distance ("Smith"/"Smyth", "Robert"/"Rupert"). Both produce a bounded
equi-join key, never an all-pairs comparison.

Variant (documented contract): American Soundex with H/W/Y treated as
vowels — code the whole name, collapse ADJACENT identical codes,
drop the first letter's code group, strip the vowel zeros, pad to
``letter + 3 digits``. This is the MySQL-family variant; it differs
from the archival-standard one only in that same-code consonants
separated by H or W stay separate ("Ashcraft" → A226 here, A261 in
the archival rule). Blocking quality is equivalent, and the simpler
pass structure keeps the Spark and DuckDB forms generated from ONE
pattern table (the functions/html.py idiom) — the cross-engine
contract cannot drift. Non-ASCII-letter characters are stripped before
coding; a string with no letters keys to the empty string.

Everything is JVM-side ``translate``/``regexp_replace``/``substring``
(whole-stage codegen, no Python), all patterns in the RE2 ∩ Java
common subset (no backreferences — the collapse is seven explicit
single-digit passes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: letter → code table (single source for both engines): vowels and
#: H/W/Y → 0, labials 1, gutturals/sibilants 2, dentals 3, L 4,
#: nasals 5, R 6
_SDX_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_SDX_TO = "00000000111122222222334556"

#: collapse passes: adjacent identical codes fold to one (RE2-safe —
#: one pass per digit instead of a backreference)
_COLLAPSE = [(f"{d}{d}+", d) for d in "0123456"]

_NON_LETTER = "[^A-Za-z]"


def soundex(col: Column | str) -> Column:
    """4-character Soundex key of ``col`` (module-docstring variant)."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.upper(F.regexp_replace(c, _NON_LETTER, ""))
    d = F.translate(u, _SDX_FROM, _SDX_TO)
    for pat, rep in _COLLAPSE:
        d = F.regexp_replace(d, pat, rep)
    digits = F.regexp_replace(F.substring(d, 2, 1 << 30), "0", "")
    code = F.rpad(
        F.substring(F.concat(F.substring(u, 1, 1), digits), 1, 4), 4, "0"
    )
    return F.when(u == "", F.lit("")).otherwise(code)


def soundex_sql(expr: str) -> str:
    """DuckDB mirror of :func:`soundex`, generated from the SAME
    letter table and collapse passes."""
    u = f"upper(regexp_replace({expr}, '{_NON_LETTER}', '', 'g'))"
    d = f"translate({u}, '{_SDX_FROM}', '{_SDX_TO}')"
    for pat, rep in _COLLAPSE:
        d = f"regexp_replace({d}, '{pat}', '{rep}', 'g')"
    digits = f"replace(substring({d}, 2), '0', '')"
    code = f"rpad(substring(substring({u}, 1, 1) || {digits}, 1, 4), 4, '0')"
    return f"(CASE WHEN {u} = '' THEN '' ELSE {code} END)"


def phonetic_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int | None = None,
) -> DataFrame:
    """Candidate id pairs whose names share a Soundex key →
    ``(id1, id2, name1, name2)`` with ``id1 < id2``; optionally
    confirmed by ``levenshtein ≤ max_dist`` (phonetic blocks are
    coarse — pass None to keep every phonetic match, e.g. when feeding
    a downstream scorer).

    Scale shape: one equi-join on the 4-char key over DISTINCT
    (id, name) rows — block sizes are bounded by name-frequency skew,
    the same profile as the fuzzy family's deletion-key join; never
    all-pairs. Compose with ``operators/graph.dup_clusters`` for
    transitive entity resolution exactly like
    ``operators/fuzzy.fuzzy_pairs``.
    """
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__nm"),
        soundex(name_col).alias("__sdx"),
    ).filter(F.col("__sdx") != "")
    a = keyed.select(
        F.col("__id").alias("id1"),
        F.col("__nm").alias("name1"),
        "__sdx",
    )
    b = keyed.select(
        F.col("__id").alias("id2"),
        F.col("__nm").alias("name2"),
        "__sdx",
    )
    pairs = a.join(b, "__sdx").filter(F.col("id1") < F.col("id2"))
    if max_dist is not None:
        pairs = pairs.filter(
            F.levenshtein("name1", "name2") <= int(max_dist)
        )
    return pairs.select("id1", "id2", "name1", "name2")
