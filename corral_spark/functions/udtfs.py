"""Python UDTF surface — table-valued functions registrable in SQL.

PySpark 4 user-defined table functions are the extension point for
one-row-to-many-rows logic that must be callable from SQL (``SELECT
... FROM tbl, LATERAL my_udtf(tbl.col)``) — the SQL-surface analog of
the DataFrame-side ``explode``/``mapInPandas`` paths this repo already
uses.  The reference engine's only comparable surface is the Go
``Mapper`` interface (/root/reference/internal/pkg/corral/job.go:14-20)
which also flat-maps one input record to many emitted pairs; a UDTF is
that same contract exposed to SQL users.

Caveat, stated up front: UDTFs evaluate row-at-a-time in Python
workers (Arrow-optimized transfer when ``useArrow`` is on, but still a
per-row ``eval`` call).  They are API surface, not the hot path — the
equivalent JVM formulation (``explode(split(...))``) is what the
registered query's docstring benchmarks against.  Use a UDTF when the
per-row logic genuinely needs Python; use built-ins otherwise.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

#: Sentence boundary: a run of terminal punctuation followed by
#: whitespace.  Deliberately lookaround-free so the DuckDB oracle
#: (RE2, no lookbehind) splits identically; the terminal punctuation
#: run itself is consumed by the split, matching DuckDB
#: string_split_regex semantics.  The whitespace class is spelled out
#: as RE2's ASCII ``\s`` = [\t\n\f\r ] — Python's Unicode ``\s`` also
#: matches NBSP/\x0b etc., which would silently diverge from the
#: oracle on non-ASCII whitespace.
_SENT_RE = re.compile(r"[.!?]+[\t\n\f\r ]+")


@udtf(returnType="idx int, sentence string", useArrow=True)
class SplitSentences:
    """text -> (idx, sentence) rows, one per sentence.

    ``idx`` is the 1-based position of the segment in the raw split
    (counting empty segments, which are then dropped) so it aligns
    exactly with DuckDB ``generate_subscripts`` over the same
    ``string_split_regex`` list.
    """

    def eval(self, text: str | None):  # noqa: D102 — contract above
        if text is None:
            return
        for idx, seg in enumerate(_SENT_RE.split(text), start=1):
            if seg != "":
                yield idx, seg


def register_udtfs(spark: SparkSession) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
