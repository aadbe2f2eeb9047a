"""Deterministic column tokenization — governance-grade masking that
PRESERVES JOINABILITY: the same (salt, value) always maps to the same
token, so masked tables still join/group/count correctly, while the
raw value never leaves the cluster.

This is the COLUMN-level companion to the free-text regex scrubber
(`text.pii_redact`): redaction handles PII embedded in prose; this
handles PII that IS the column (names, phone numbers, account ids).

Token = hex md5 of ``salt || value`` (optionally truncated).  Salted
keyed hashing, not encryption: re-identification requires the salt
(keep it in a secret store, never in the table), and rotating the
salt rotates the whole pseudonym space.  md5 is fine HERE — the
adversary model is linkage, not collision-crafting; for regulated
deployments swap ``sha2(... , 256)`` via ``algo='sha256'``
(both are single builtin calls on either engine).

Scale shape: pure scan-side column math — no shuffle, no UDF, no
driver state; masked columns stay pushdown/prune-friendly.  NULL
stays NULL (a masked null would fabricate a joinable token for
"unknown").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_token(value: Column, salt: str, algo: str = "md5", length: int | None = None) -> Column:
    """Deterministic pseudonym for ``value``: hex digest of
    salt-prefixed stringified value; NULL-preserving."""
    s = F.concat(F.lit(salt), value.cast("string"))
    if algo == "md5":
        tok = F.md5(s)
    elif algo == "sha256":
        tok = F.sha2(s, 256)
    else:
        raise ValueError(f"unknown algo {algo!r}")
    if length is not None:
        tok = F.substring(tok, 1, length)
    return F.when(value.isNull(), F.lit(None).cast("string")).otherwise(tok)


def mask_columns(
    df: DataFrame,
    cols: Sequence[str],
    salt: str,
    algo: str = "md5",
    length: int | None = None,
) -> DataFrame:
    """Replace each of ``cols`` with its deterministic token (same
    name, string type) — every other column passes through."""
    out = df
    for c in cols:
        out = out.withColumn(c, mask_token(F.col(c), salt, algo, length))
    return out
