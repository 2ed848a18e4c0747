"""Mojibake screen: detect + repair UTF-8-as-latin1 encoding artifacts.

The most common encoding corruption in web-scraped corpora: UTF-8 text
decoded once as latin-1/cp1252 and re-encoded, turning é into Ã©, ’ into
â€™, nbsp into Â + nbsp (ftfy's headline case; every production LLM data
pipeline runs some form of this screen before training). The repair map
lives in rules.MOJIBAKE_MAP (single source of truth): ordered LITERAL
(artifact, repaired) pairs that are prefix-disjoint and whose repairs
never create new artifacts, so the replace chain is order-insensitive
and per-pattern occurrence counts are independent.

Engine shape: pure JVM string algebra — a fold of F.replace for the
repair and length-difference arithmetic for the counts (zero Python,
zero shuffles, whole-stage codegen). Fully SQL-expressible, so the
driver oracle is a bit-for-bit DuckDB replica (mojibake_oracle_sql
generates the replace chain from the same rules table — no drift).

Reference lineage: ILLUMINACLIP adapter scrubbing (SURVEY §2 F2 —
remove known-bad substrings, keep the rest; reference config.py:42-43),
here with a repair (substitution) rather than a deletion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import rules

__all__ = ["repair_col", "mojibake_count_col", "mojibake_screen", "mojibake_oracle_sql"]


def repair_col(text: Column) -> Column:
    """The repair chain: one F.replace per rules.MOJIBAKE_MAP pair."""
    out = text
    for artifact, repaired in rules.MOJIBAKE_MAP:
        out = F.replace(out, F.lit(artifact), F.lit(repaired))
    return out


def mojibake_count_col(text: Column) -> Column:
    """Total artifact occurrences: per-pattern char-length-difference
    counts, summed (patterns are disjoint — rules.MOJIBAKE_MAP
    contract — so the counts are independent)."""
    total = F.lit(0).cast("long")
    for artifact, _ in rules.MOJIBAKE_MAP:
        removed = F.length(text) - F.length(F.replace(text, F.lit(artifact), F.lit("")))
        # exact multiple of len(artifact); double division is exact here
        total = total + (removed / F.lit(len(artifact))).cast("long")
    return total


def mojibake_screen(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_mojibake, len_raw, len_fixed, fixed_md5, is_mojibake) —
    one row per document. is_mojibake is an INT 0/1 flag (the repo's
    driver-portable flag convention) marking any artifact hit — the
    filter predicate a corpus build keys on; fixed_md5 fingerprints the
    repaired text without shipping it. JVM-only, shuffle-free."""
    t = F.col(text_col)
    fixed = repair_col(t)
    n = mojibake_count_col(t)
    return df.select(
        F.col(id_col),
        n.alias("n_mojibake"),
        F.length(t).cast("long").alias("len_raw"),
        F.length(fixed).cast("long").alias("len_fixed"),
        F.md5(fixed.cast("binary")).alias("fixed_md5"),
        F.when(n > 0, 1).otherwise(0).cast("int").alias("is_mojibake"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def mojibake_oracle_sql(id_col: str, text_col: str, source: str) -> str:
    """DuckDB replica generated from the SAME rules.MOJIBAKE_MAP (the
    generated-SQL pattern of simhash/hll: one rules table, two
    independent implementations, zero drift)."""
    fixed = text_col
    for artifact, repaired in rules.MOJIBAKE_MAP:
        fixed = f"replace({fixed}, {_sql_quote(artifact)}, {_sql_quote(repaired)})"
    counts = " + ".join(
        f"((length({text_col}) - length(replace({text_col}, {_sql_quote(a)}, '')))"
        f" // {len(a)})::BIGINT"
        for a, _ in rules.MOJIBAKE_MAP
    )
    return f"""
    SELECT {id_col},
           ({counts})::BIGINT AS n_mojibake,
           length({text_col})::BIGINT AS len_raw,
           length({fixed})::BIGINT AS len_fixed,
           md5({fixed}) AS fixed_md5,
           CAST(CASE WHEN ({counts}) > 0 THEN 1 ELSE 0 END AS INT) AS is_mojibake
    FROM {source}
    """
