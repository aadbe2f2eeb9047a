"""Skew-mitigated joins (salting).

A shuffled equi-join puts every row of one key into one task; a hot
key (the reference's analogue: one mega-celltower) turns the join
into a single straggler.  AQE's skew-join splits oversized partitions
at runtime and is the first line of defense (on in session.py); this
operator is the explicit fallback for keys so hot that even one key
exceeds a task — classic salting:

  * skewed side: key -> (key, salt) with a deterministic salt derived
    by hashing stable row columns into [0, n_salts);
  * small side: replicated n_salts times with every salt value;
  * equi-join on (key, salt) — the hot key now spreads over n_salts
    tasks.  Row multiplication is only on the SMALL side (n_salts x).

Result is row-identical to the plain join (salt is an internal
column, dropped on output).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side with a (replicable) small side on
    ``on`` keys, spreading each key over ``n_salts`` shuffle
    partitions.

    ``salt_cols``: columns whose hash assigns the salt (default: all
    of the skewed side's non-key columns — deterministic, no rand()).
    ``how``: inner or left (the skewed side must be the left/preserved
    side; right/full would need the salt on the other side).
    """
    assert how in ("inner", "left"), "salted_join supports inner/left"
    salt_src = list(salt_cols or [c for c in skewed.columns if c not in on])
    assert salt_src, "need at least one non-key column to derive the salt"
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt.cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, [*on, "_salt"], how)
    return out.drop("_salt")
