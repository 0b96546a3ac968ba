"""Cleaning library (SURVEY.md §2.7 C1–C12).

Every pandas ``.loc[mask, col] = value`` in the reference's cleanData
(main.py:364-455) becomes a ``when/otherwise`` column expression — the
single most reused translation rule of the port (C11). All functions
return new DataFrames/Columns; nothing mutates.

Null policy (SURVEY §7 hard-part #1): the reference collapses null→''
mid-pipeline (main.py:373, 451). We keep NULL internally and collapse
only at the sink (``blank_fill``), so predicates must be blank-aware:
use ``non_blank(c)`` rather than ``isNotNull``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Column reference by EXACT name (backtick-quoted). Data and STM
    column names are arbitrary user strings — '.', '/', even backticks —
    which F.col() would run through the attribute parser; quoting makes
    the reference literal so frame-wide operators never crash on a
    hostile header."""
    return F.col("`" + name.replace("`", "``") + "`")


def non_blank(c: Column | str) -> Column:
    """F4: present AND not empty-string (the reference's notna() after
    its fillna('') means exactly this)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNotNull() & (col != "")


def masked_update(df: DataFrame, col: str, mask: Column,
                  value: Column | str) -> DataFrame:
    """C11: df.loc[mask, col] = value → when(mask, value).otherwise(col)."""
    val = F.lit(value) if isinstance(value, str) else value
    return df.withColumn(col, F.when(mask, val).otherwise(F.col(col)))


def scrub_control_chars(df: DataFrame, columns: Sequence[str] | None = None,
                        replacement: str = ", ") -> DataFrame:
    """C1: frame-wide regex replace of tab/newline/CR (and their
    literal-escaped spellings) with ', ' (reference main.py:376-378).
    One select over all columns — a single narrow projection, not a
    per-column pass."""
    cols = columns if columns is not None else [
        c for c, dt in df.dtypes if dt == "string"]
    exprs = []
    for c in df.columns:
        if c in cols:
            exprs.append(
                F.regexp_replace(qcol(c), r"[\t\n\r]|\\t|\\n|\\r",
                                 replacement).alias(c))
        else:
            exprs.append(qcol(c))
    return df.select(*exprs)


def strip_chars(df: DataFrame, col: str, chars: str,
                exempt: Sequence[str] = ()) -> DataFrame:
    """C2: remove literal characters from a column, with literal
    exemptions (reference main.py:381-383: commas stripped from Last
    Name except 'F. Queen, Jr.')."""
    mask = ~F.col(col).isin(list(exempt)) if exempt else F.lit(True)
    cleaned = F.regexp_replace(F.col(col), "[" + chars + "]", "")
    return df.withColumn(
        col, F.when(mask & F.col(col).isNotNull(), cleaned)
              .otherwise(F.col(col)))


def title_case(c: Column | str) -> Column:
    """C3: pandas str.title() semantics — uppercase after any
    non-letter, lowercase otherwise. Differs from F.initcap on tokens
    like "o'neill" (initcap only breaks on whitespace, SURVEY §7.4);
    implemented with a word-boundary regex transform to match the
    reference exactly. The boundary is the Unicode letter class
    (\\P{L}), not ASCII [^A-Za-z], so accented letters stay inside
    their word run ('café' → 'Café', matching str.title(), not
    'CafÉ')."""
    col = F.col(c) if isinstance(c, str) else c
    # Split into runs of letters / non-letters, initcap each letter run.
    return F.array_join(
        F.transform(
            F.split(col, r"(?<=\P{L})|(?=\P{L})"),
            lambda w: F.concat(F.upper(F.substring(w, 1, 1)),
                               F.lower(F.substring(w, 2, 2147483647))),
        ),
        "",
    )


def title_case_if(df: DataFrame, col: str, mask: Column) -> DataFrame:
    """C3 as used by the reference: title-case City only where it ends
    in an uppercase letter (main.py:390-391, F7 regex mask)."""
    return masked_update(df, col, mask, title_case(col))


def fix_html_entities(df: DataFrame, col: str) -> DataFrame:
    """C4 *intended* behavior: '&#039;' → apostrophe. The reference's
    line is a no-op (== instead of =, main.py:394); we implement the
    intent and document the divergence (SURVEY §7.3 policy)."""
    return df.withColumn(
        col, F.regexp_replace(F.col(col), "&#039;", "'"))


def blank_out(df: DataFrame, col: str, values: Sequence[str]) -> DataFrame:
    """F5/F6 + C11: membership scrub — listed junk values become NULL
    (reference sets them to '' at main.py:386-409; '' is our sink-side
    rendering of NULL)."""
    return masked_update(df, col, F.col(col).isin(list(values)), F.lit(None))


def rewrite_iso_date_to_us(df: DataFrame, col: str,
                           keep_parts: bool = False) -> DataFrame:
    """C5/C6: positional slice of ISO yyyy-mm-dd → MM/DD/YYYY
    (reference main.py:412-418). Strings in, strings out — faithful to
    the reference's no-date-type model; blank/short values yield NULL.
    """
    y = F.substring(F.col(col), 1, 4)
    m = F.substring(F.col(col), 6, 2)
    d = F.substring(F.col(col), 9, 2)
    us = F.when(F.length(F.col(col)) >= 10,
                F.concat_ws("/", m, d, y)).otherwise(F.lit(None))
    out = df.withColumn(col, us)
    if keep_parts:
        out = (out.withColumn(f"{col} - year", y)
                  .withColumn(f"{col} - month", m)
                  .withColumn(f"{col} - day", d))
    return out


def blank_fill(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """C10 at the sink boundary only: NULL → '' for string columns
    (reference fillna('') ×3, main.py:373/451/623 — applied once here
    because intermediate stages stay NULL-aware)."""
    cols = columns if columns is not None else [
        c for c, dt in df.dtypes if dt == "string"]
    return df.na.fill("", subset=list(cols))
