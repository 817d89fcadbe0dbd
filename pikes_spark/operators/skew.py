"""Skew-mitigation join utilities.

At 10^12-row scale a shuffle join on a power-law key ("united states"
appears on millions of pages) sends one key's entire row set to one
reducer — the straggler that defines job wall time. AQE's skew-join
splitting handles sort-merge joins after the fact; this module gives
the explicit, planner-independent form the north rule asks for:

- salted_join: the fact side gets a uniform random salt in [0, salt);
  the dimension side is replicated salt-fold (explode over the salt
  range); the join key becomes (key, salt), so a hot key's rows fan
  out over `salt` reducers instead of one. Cost: dimension side
  shuffles salt× its size — use when the dimension is too big to
  broadcast but far smaller than the fact side (the classic middle
  regime between broadcast and plain shuffle join).

The salt values are random per run; the JOIN RESULT is independent of
them (every fact row still meets every matching dimension row exactly
once), which is what the equivalence oracle checks.
"""

from __future__ import annotations

from typing import List, Union

from pyspark.sql import DataFrame, functions as F


def salted_join(fact: DataFrame, dim: DataFrame,
                on: Union[str, List[str]], salt: int = 16,
                how: str = "inner", seed: int = 7) -> DataFrame:
    """Join a skewed fact table to a non-broadcastable dimension by
    salting the shuffle key. `on` must name equi-join column(s)
    present on both sides; output columns match fact.join(dim, on,
    how) with the fact side's key columns kept."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    f = fact.withColumn("_salt",
                        F.floor(F.rand(seed) * salt).cast("int"))
    d = dim.withColumn("_salt", F.explode(
        F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")))
    out = f.join(d, keys + ["_salt"], how)
    return out.drop("_salt")
