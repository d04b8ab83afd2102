"""Deterministic sampling & splits for training-data pipelines.

`df.sample`/`sampleBy` use seeded per-partition RNG: resampling after
a repartition, an engine upgrade, or on a different engine yields a
DIFFERENT subset — unacceptable for train/val splits that must be
reproducible across reruns and auditable across systems. These
operators derive membership from a content hash instead:

    bucket(id) = int(md5(id || salt)[:4], 16)  ∈ [0, 65536)

A row's split is a pure function of its id and the salt — stable
under any partitioning, any engine (md5 is md5 everywhere), any day.
Changing the salt draws a fresh independent split. This is the
standard "hash-mod split" from large-scale ML data pipelines.

Everything is a map-only projection — no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "deterministic_split", "stratified_hash_sample"]

_BUCKETS = 65536


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Stable [0, 65536) bucket from md5 of the id (+ salt)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 4), 16, 10
    ).cast("long")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column: 'val' for ~val_fraction of rows, else
    'train' — reproducible across engines/partitionings/reruns."""
    threshold = int(round(val_fraction * _BUCKETS))
    return df.withColumn(
        "split",
        F.when(hash_bucket(id_col, salt) < threshold, "val").otherwise("train"),
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~fractions[stratum] of
    each stratum's rows (strata absent from the dict are dropped).
    The per-row decision is hash-based → exact set reproducibility,
    unlike sampleBy's RNG draw."""
    thresholds = F.create_map(
        *[
            x
            for k, v in fractions.items()
            for x in (F.lit(k), F.lit(int(round(v * _BUCKETS))))
        ]
    )
    return df.filter(
        hash_bucket(id_col, salt) < F.coalesce(thresholds[F.col(strata_col)], F.lit(0))
    )
