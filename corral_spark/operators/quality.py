"""Data-quality and text-hygiene operators for training pipelines.

North-star extension surface (SURVEY §2.4 "text analysis" family):
constraint reporting (null/uniqueness/referential checks in one pass
per table), text normalization, and PII redaction — the standard
pre-training hygiene steps. Everything is built-in expressions so the
checks run at scan speed and the report aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Conservative, mirrorable regexes (same semantics in Java and RE2).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def redact_pii(col: Column) -> Column:
    """Mask emails, IPv4s, and phone-shaped numbers with typed tokens.
    Order matters: emails first (an email contains no spaces, so later
    passes cannot re-match inside the token)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def normalize_text(col: Column) -> Column:
    """Canonical text form: lowercase, collapse whitespace runs, trim.
    (Unicode NFC normalization would slot here via a pandas UDF when
    corpora need it; the driver corpus is ASCII.)"""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def null_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row report: total rows + null count per column, single pass."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in cols
    ]
    return df.agg(*aggs)


def duplicate_key_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys violating uniqueness, with their multiplicities."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def orphan_report(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential integrity: child rows whose key has no parent
    (left-anti join — at scale the parent key set broadcasts when
    small, otherwise shuffles once)."""
    return child.join(
        parent.select(parent_key), child[child_key] == parent[parent_key], "left_anti"
    )
