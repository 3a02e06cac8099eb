"""Skew-mitigation join operators for hot keys at scale.

A hash-partitioned join sends every row of a key to one task; at 100 TB
a handful of hot keys (the null key, a default enum, a celebrity user)
turn into straggler tasks that dominate the stage. Two remedies ship
here, orthogonal to AQE's runtime skew splitting (which is ON in
session.py and handles skew it can *observe*; salting handles skew you
can *predict*, and works for aggregations-after-join where AQE's
split-by-size cannot):

- ``salted_join``: replicate-broadcast salting. The skewed (large, hot)
  side gets a uniform random salt in [0, n_salts); the small side is
  replicated n_salts times via a literal-range explode (pure JVM, no
  Python). The join key becomes (key, salt) — a hot key's rows now
  spread over n_salts tasks. Exact same result set as the plain join.
- ``null_safe_skew_join``: the degenerate but ubiquitous case — NULL
  join keys. Inner joins drop them anyway, so the fast path routes NULL
  keys around the shuffle entirely instead of hashing them all into
  partition 0 (left joins re-attach them with null payloads).

Reference parity: the reference is single-machine sequential
(copy_esrigrid_to_geotiff_rename_and_clip_w_Arguments.py:232-270 — a
nested loop over files × regions) and has no notion of data skew; this
is [EXT] scale hardening per SURVEY §4 "skewed keys → salting or AQE
skew-join".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (large, hot-keyed) to ``small`` (modest dimension)
    on ``on``, spreading each hot key across ``n_salts`` shuffle
    partitions. Result is column- and row-identical to
    ``skewed.join(small, on, how)``.

    ``how`` may be "inner" or "left" (left = left-outer on the skewed
    side; every salted row either matches or survives with nulls, and
    replication is on the small side only, so no duplicates appear).

    The salt on the skewed side is ``crc32(monotonically_increasing_id)
    % n_salts`` — deterministic per task layout, uniform, and cheaper
    than rand() (no RNG state in codegen). The small side explodes a
    0..n_salts-1 literal sequence: n_salts× replication of the SMALL
    side only, which is the whole trade — pay |small|·n_salts extra
    shuffle rows to split each hot key's |rows|/n_salts per task."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        _SALT, (F.crc32(F.monotonically_increasing_id().cast("string")) % n_salts).cast("int")
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, [*on, _SALT], how).drop(_SALT)


def null_safe_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Route NULL-keyed left rows around the shuffle: they can never
    match, so only non-null keys are hashed (the classic partition-0
    straggler fix). "left" re-attaches the null-keyed rows with null
    right payloads via a cheap union; "inner" just drops them."""
    if how not in ("inner", "left"):
        raise ValueError(f"null_safe_skew_join supports inner/left, got {how!r}")
    any_null = None
    for k in on:
        c = F.col(k).isNull()
        any_null = c if any_null is None else (any_null | c)
    matched = left.filter(~any_null).join(right, on, how)
    if how == "inner":
        return matched
    nulls = left.filter(any_null)
    for c in matched.columns:
        if c not in nulls.columns:
            nulls = nulls.withColumn(c, F.lit(None))
    return matched.unionByName(nulls.select(*matched.columns))
