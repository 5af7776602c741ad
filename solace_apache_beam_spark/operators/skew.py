"""Skew mitigation: salted replicate join.

When one join key dominates (a hot user, a default value), a plain
shuffle join lands the whole hot key on one reducer. AQE's skew-join
splitting handles sort-merge joins at runtime; this operator is the
*explicit* form for when the planner can't help (e.g. the skew is known
upfront, or the join feeds an operator AQE won't re-split):

- the LEFT (big, skewed) side gets a uniform salt in [0, n_salts),
- the RIGHT side is replicated once per salt value,
- the join key becomes (key, salt) — the hot key now spreads over
  n_salts reducers.

Cost model: right side shuffles n_salts times its size; pick n_salts ~
(hot-key rows / target partition rows). The result set is provably
identical to the unsalted join (every left row meets every matching
right row exactly once — its own salt replica)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the left side salted and the right side
    replicated across all salt values. Output = left.join(right) with
    the helper columns dropped.

    Keys are referenced through their own frame (``l_salted[left_on]``)
    so ``left_on == right_on`` — the most common call shape for a
    generic join helper — resolves instead of raising an
    ambiguous-reference AnalysisException; when the names collide the
    output keeps both key columns (qualify or rename downstream, as
    with any Spark self-named join)."""
    l_salted = left.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(
        r_replicated,
        (l_salted[left_on] == r_replicated[right_on])
        & (l_salted["_salt"] == r_replicated["_salt"]),
    ).drop("_salt")
