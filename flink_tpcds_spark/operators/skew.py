"""Skew-aware join: salting for hot keys.

AQE's skew-join split (enabled session-wide) handles most skew at
runtime by splitting oversized partitions. Salting is the static
fallback for the pathological case AQE can't fix: ONE key so hot that
even a split partition's build side won't fit. The technique:
replicate the build side R times with salt ids, scatter the probe side
uniformly over the salts, join on (key, salt) — the hot key's work
spreads over R reducers.

Semantics are identical to the plain join (asserted in
tests/test_operators.py); cost is R× the build side, so apply it to
the skewed keys only in production (pre-filter by a hot-key list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe ⋈ build`` on column ``on`` with the probe side
    salted over ``salt_buckets`` and the build side replicated.

    Only probe-preserving join types are allowed: the build side is
    replicated once per salt, so right/full-outer would emit every
    unmatched build row ``salt_buckets`` times."""
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "the replicated build side would duplicate unmatched rows"
        )
    salted_probe = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    replicated_build = build.withColumn(
        "__salt", F.explode(salts)
    )
    out = salted_probe.join(replicated_build, [on, "__salt"], how)
    return out.drop("__salt")
