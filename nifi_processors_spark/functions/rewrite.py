"""Vectorized content-rewrite transforms.

The reference's producer path can rewrite FlowFile content before
putting (the generic NiFi route/transform/put pattern); here content
rewriting is a vectorized stage over the ``text`` column — JVM
`regexp_replace` where expressible, Arrow-batched pandas UDFs when the
rewrite needs Python (never per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Redaction patterns applied JVM-side (codegen'd regexp_replace), in
#: order — broader/structured classes first so e.g. a URL swallows the
#: credentials inside it before the email pattern sees them, and an IP
#: claims its digit runs before the phone pattern can. Every pattern
#: must be valid in BOTH Java regex and RE2 (the DuckDB oracle renders
#: the same list — plans/cdc_queries._rewrite_oracle), so: ASCII
#: classes only, no backrefs, no lookarounds, no single quotes.
REDACTIONS = [
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
        r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    ),
    # requires a digit in the token body: plain prose "the bearer
    # receives ..." must NOT be destroyed (RE2 has no lookahead, so
    # the digit requirement is written positionally)
    (r"(?i)\bbearer +[A-Za-z._-]*\d[A-Za-z0-9._-]{6,}", "<TOKEN>"),
    (r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b", "<IBAN>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[- .]?\d{3}[- .]?\d{4}\b", "<PHONE>"),
    (r"\b\d{13,19}\b", "<CARDNUM>"),
]


def redact_text(df: DataFrame, col: str = "text") -> DataFrame:
    """PII-style redaction as pure built-in expressions (stays inside
    whole-stage codegen; zero Python)."""
    out = F.col(col)
    for pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(col, out)


def normalize_text_udf():
    """Arrow-batched pandas UDF for rewrites that genuinely need
    Python string handling (unicode normalization here as the
    exemplar). ~10-100x faster than row-at-a-time Python UDFs."""
    import unicodedata

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFKC", x).strip() if x is not None else None
        )

    return _norm


def make_transform(redact: bool = True, normalize: bool = False):
    """Compose a pipeline transform stage (CdcPipeline(transform=...)):
    applied to the validated batch before the LWW merge."""

    def transform(df: DataFrame) -> DataFrame:
        if normalize:
            df = df.withColumn("text", normalize_text_udf()(F.col("text")))
        if redact:
            df = redact_text(df)
        return df

    return transform
