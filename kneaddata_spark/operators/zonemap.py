"""Zone maps: per-slice min/max/ndv stats tables + scan pruning.

The table-maintenance primitive next to small-file compaction
(operators/maintenance.py): Iceberg/Delta scan planning prunes files by
the per-file column ranges their manifests carry. Without those jars in
this sandbox, the same contract is a STATS TABLE keyed by a slice id (a
partition value, a file, a time grain): one combinable aggregation pass
builds it, and a range predicate consults it to skip every slice whose
[min, max] interval cannot intersect the predicate — at 10^12 rows the
scan you never start is the cheapest scan, and the stats table is
O(slices x columns), trivially broadcastable.

Soundness contract (oracle-proven in the driver query): pruning is an
OVER-approximation — a slice is kept whenever its interval intersects,
so `prune + exact filter == exact filter` exactly. The pytest demo
writes a partitioned copy, prunes via the stats table, reads ONLY the
qualifying partition directories, and checks both row equality and that
the pruned read plans strictly fewer partitions.

ndv is exact count_distinct by default (cross-engine deterministic —
the driver-oracle requirement); pass approx=True for
approx_count_distinct (HLL) at corpus scale, where exact ndv would carry
a per-slice distinct shuffle — the stats themselves stay one map-side-
combinable pass either way.

Reference lineage: the reference consults prebuilt index metadata
(bowtie2 .bt2 headers, utilities.py database checks) before running a
scan-shaped job; the zone map is that check as a first-class table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zone_maps(
    df: DataFrame,
    slice_expr: Column,
    cols: list[str],
    approx: bool = False,
) -> DataFrame:
    """One row per slice: (slice, n_rows, min_<c>, max_<c>, ndv_<c> for
    each c in cols). One combinable groupBy — no second pass, no
    per-column scans."""
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        ndv = F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        aggs.append(ndv.cast("long").alias(f"ndv_{c}"))
    return df.groupBy(slice_expr.alias("slice")).agg(*aggs)


def prune_slices(stats: DataFrame, col: str, lo, hi) -> DataFrame:
    """Slices whose [min_col, max_col] interval intersects [lo, hi] —
    the candidate set a range scan must read (sound over-approximation;
    NULL-range slices are kept: no evidence is not exclusion)."""
    excl = (F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi))
    return stats.where(~F.coalesce(excl, F.lit(False))).select("slice")


def pruned_scan(
    df: DataFrame,
    slice_expr: Column,
    stats: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range scan THROUGH the zone map: broadcast the qualifying slice
    ids (slices x 1 column — always small), semi-join the scan on its
    slice id, then apply the exact predicate. Equal to the plain filter
    by the soundness contract; at scale the semi-join becomes partition
    pruning when the table is physically laid out by the slice key (the
    pytest demo proves the directory-skipping version)."""
    keep = prune_slices(stats, col, lo, hi)
    return (
        df.withColumn("__slice", slice_expr)
        .join(F.broadcast(keep), F.col("__slice") == keep["slice"], "left_semi")
        .where(F.col(col).between(lo, hi))
        .drop("__slice")
    )


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) interleave of the low ``bits`` bits of two
    non-negative integer columns — the multi-dimensional clustering key
    Iceberg/Delta `OPTIMIZE ZORDER BY` sorts on. Sorting a table by this
    key makes per-file [min, max] ranges tight on BOTH dimensions at
    once, so zone-map pruning (``prune_slices``) works for predicates on
    either column — the property a single-column sort cannot give. Pure
    integer shift/and/add, identical in Spark Column algebra and DuckDB
    (``zorder_key_sql``); at 10^12 rows the key is one projection and
    the layout is a single range-partitioned sort-on-write.
    """
    from pyspark.sql import functions as F

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return out


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
