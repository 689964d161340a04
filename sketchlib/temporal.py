"""Temporal joins Spark lacks natively: as-of join and interval (range)
join, built from DataFrame primitives so Catalyst keeps optimizing around
them.

Reference scope note: the reference library (ascv/HyperLogLog) has no
relational layer at all — these operators extend the engine's dataflow
surface (SURVEY.md §2B "beyond the reference") with the two join shapes
every event/feature pipeline needs and a naive implementation gets
catastrophically wrong (a cartesian product, or a global-order window
that collapses onto ONE partition).

Scale doctrine, same as the rest of the library:

- ``asof_join`` with ``by`` keys is ONE hash-partitioned window — the
  union of both sides shuffles once on the keys, then a forward-fill
  (``last(..., ignoreNulls)``) resolves every left row's match inside the
  partition. No join node at all, no per-row Python.
- ``asof_join`` WITHOUT keys never plans a global window. It range-buckets
  time by sampled quantiles, seeds each bucket with the latest right row
  of all earlier buckets (and, for forward/nearest, the earliest right row
  of all later buckets) — a bounded, bucket-count-sized driver collect,
  never corpus-proportional — and runs the same forward-fill window
  partitioned by bucket.
- ``interval_join`` explodes each interval onto the fixed-width buckets
  it covers and equi-joins on the bucket id; a canonical-bucket clause
  (emit only in the bucket containing the overlap's start) deduplicates
  multi-bucket matches without a distinct. Cost is
  O(intervals x buckets-covered), never |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_DIRECTIONS = ("backward", "forward", "nearest")


def _as_num(col):
    """Orderable column -> double for range arithmetic (timestamps become
    fractional epoch seconds; numerics pass through)."""
    return col.cast("double")


def _num_py(v) -> float:
    """Driver-side counterpart of _as_num for carry-row comparison."""
    try:
        return float(v)
    except TypeError:
        return v.timestamp()  # datetime.datetime


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    n_buckets: int = 64,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: attach to every left row the right row whose ``on``
    value is the nearest at-or-before it (``backward``), at-or-after it
    (``forward``), or closest in either direction (``nearest``, ties
    prefer backward) — ``pandas.merge_asof`` semantics, distributed.

    Left rows are always preserved (right columns NULL when no match, or
    when the match violates ``tolerance``). ``tolerance`` is measured in
    the ``on`` column's numeric units (seconds for timestamps) and must be
    non-negative. Among right rows sharing an identical (by, on) value the
    matched row is arbitrary-but-one — pre-dedupe the right side if that
    matters. Right payload columns keep their names unless they collide
    with a left column, in which case they get ``suffix``.

    Plan shape: union both sides with NULL-padded payloads, then ONE
    window partitioned by ``by`` (or by a sampled time-range bucket when
    ``by`` is None — see module doc) forward-fills the right payload onto
    left rows; ``nearest`` fills both directions inside the same sort.
    Skew note: a single ``by`` key's full history lands in one partition —
    that is inherent to per-key as-of semantics; keys are the unit of
    parallelism.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    by = list(by or [])
    for c in [on, *by]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"join column {c!r} must exist on both sides")

    r_payload = [c for c in right.columns if c != on and c not in by]
    out_names = {c: (c + suffix if c in left.columns else c) for c in r_payload}
    l_struct_t = (
        "struct<"
        + ",".join(f"`{f.name}`:{f.dataType.simpleString()}" for f in left.schema.fields)
        + ">"
    )

    lu = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in r_payload
        ],
    )
    ru = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(False).alias("__is_left"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in r_payload],
    )
    u = lu.unionByName(ru)

    if by:
        part_cols = [F.col(c) for c in by]
    else:
        u, part_cols = _bucketize_global(u, r_payload, direction, n_buckets)

    # ordering: inclusive matching at equal __t means right rows must sort
    # BEFORE left rows for backward (they land in the preceding frame) and
    # for nearest (distance 0 resolves backward — the pandas tie rule);
    # AFTER left rows for pure forward (they land in the following frame)
    side_first_right = F.col("__is_left").cast("int")  # right(0) < left(1)
    side_first_left = (~F.col("__is_left")).cast("int")  # left(0) < right(1)
    right_t = F.when(~F.col("__is_left"), F.col("__t"))
    fills: list[tuple[str, list, object]] = []
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("__t").asc_nulls_last(), side_first_right)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fills.append(
            (
                "b",
                [F.last(f"__r_{c}", ignorenulls=True).over(wb) for c in r_payload],
                F.last(right_t, ignorenulls=True).over(wb),
            )
        )
    if direction in ("forward", "nearest"):
        side = side_first_right if direction == "nearest" else side_first_left
        wf = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("__t").asc_nulls_last(), side)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fills.append(
            (
                "f",
                [F.first(f"__r_{c}", ignorenulls=True).over(wf) for c in r_payload],
                F.first(right_t, ignorenulls=True).over(wf),
            )
        )

    cols = list(u.columns)
    for tag, payload_fills, t_fill in fills:
        u = u.select(
            *cols,
            *[pf.alias(f"__m{tag}_{c}") for pf, c in zip(payload_fills, r_payload)],
            t_fill.alias(f"__mt_{tag}"),
        )
        cols = list(u.columns)

    matched = u.where(F.col("__is_left"))
    tnum_l = _as_num(F.col("__t"))

    def _ok(tag: str):
        dist = F.abs(tnum_l - _as_num(F.col(f"__mt_{tag}")))
        cond = F.col(f"__mt_{tag}").isNotNull()
        if tolerance is not None:
            cond = cond & (dist <= F.lit(float(tolerance)))
        return cond, dist

    if direction == "nearest":
        ok_b, dist_b = _ok("b")
        ok_f, dist_f = _ok("f")
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))  # ties prefer backward
        picked = [
            F.when(use_b, F.col(f"__mb_{c}"))
            .when(ok_f, F.col(f"__mf_{c}"))
            .alias(out_names[c])
            for c in r_payload
        ]
    else:
        tag = "b" if direction == "backward" else "f"
        ok, _ = _ok(tag)
        picked = [
            F.when(ok, F.col(f"__m{tag}_{c}")).alias(out_names[c])
            for c in r_payload
        ]

    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns], *picked
    )


def _bucketize_global(
    u: DataFrame, r_payload: list[str], direction: str, n_buckets: int
):
    """Keyless as-of support: assign sampled-quantile range buckets and
    union in carry seeds so each bucket is self-contained.

    Backward carry: the latest right row of all EARLIER buckets, seeded
    into each bucket (it sorts before every in-bucket row, so the window's
    forward-fill sees it exactly as the fallback). Forward carry is
    symmetric (earliest right row of all LATER buckets). Both carries are
    computed from the PRISTINE union — never from a seeded one, where a
    duplicated early-t row could win a later bucket's min_by and mask that
    bucket's genuine earliest row. Driver-side work is bounded by the
    bucket count (one approxQuantile + one <=n_buckets-row collect per
    needed direction), never by the corpus.
    """
    n_b = max(2, int(n_buckets))
    qs = u.where(F.col("__t").isNotNull()).select(_as_num(F.col("__t")).alias("q"))
    bounds = sorted(set(qs.stat.approxQuantile("q", [i / n_b for i in range(1, n_b)], 0.01)))
    u = u.withColumn("__tn", _as_num(F.col("__t")))
    bucket_of = F.aggregate(
        F.lit(bounds).cast("array<double>"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("__tn") >= b, 1).otherwise(0),
    )
    u0 = u.withColumn("__bucket", bucket_of).drop("__tn")
    seeds_sdf = []

    def _carry(agg_fn, bucket_order, better):
        per_bucket = (
            u0.where(~F.col("__is_left"))
            .groupBy("__bucket")
            .agg(
                agg_fn(
                    F.struct(F.col("__t"), *[F.col(f"__r_{c}") for c in r_payload]),
                    _as_num(F.col("__t")),
                ).alias("r")
            )
            .collect()
        )
        got = {r["__bucket"]: r["r"] for r in per_bucket}
        rows, best = [], None
        for b in bucket_order:
            if best is not None:
                rows.append(
                    (best["__t"], False, None, *[best[f"__r_{c}"] for c in r_payload], b)
                )
            cur = got.get(b)
            if cur is not None and (best is None or better(_num_py(cur["__t"]), _num_py(best["__t"]))):
                best = cur
        return rows

    last_bucket = len(bounds)
    if direction in ("backward", "nearest"):
        seeds_sdf += _carry(F.max_by, range(last_bucket + 1), lambda a, b: a >= b)
    if direction in ("forward", "nearest"):
        seeds_sdf += _carry(F.min_by, range(last_bucket, -1, -1), lambda a, b: a <= b)
    if seeds_sdf:
        u0 = u0.unionByName(u0.sparkSession.createDataFrame(seeds_sdf, u0.schema))
    return u0, [F.col("__bucket")]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    by: list[str] | None = None,
    bucket_width: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval overlap join: pair every left interval with every right
    interval it overlaps (inclusive bounds: ``ls <= re AND rs <= le``)
    WITHOUT a cartesian product.

    Both sides explode onto the fixed-width time buckets their interval
    covers (``sequence(floor(s/w), floor(e/w))``) and equi-join on
    (by..., bucket), so the overlap predicate only runs inside same-bucket
    candidate groups — ONE equi-join shuffle. A pair overlapping k shared
    buckets would match k times; the canonical-bucket clause (keep only
    the bucket containing ``greatest(ls, rs)``, the overlap's start) emits
    each pair EXACTLY once with no distinct shuffle.

    ``bucket_width`` is in the bound columns' numeric units (seconds for
    timestamps); the default is twice the median right-interval length
    (one bounded approxQuantile job). Width trades replication for
    selectivity: a row replicates ~(len/width + 1) times, a bucket gathers
    width-proportional candidates. Intervals FAR longer than the width
    replicate accordingly — size the width to the long tail (or split
    giants upstream); degenerate inputs (``start > end``) are dropped, as
    in every interval algebra.

    Right columns colliding with left names get ``suffix``; ``by`` key
    columns appear once. Inner join semantics (overlapping pairs only).
    """
    by = list(by or [])
    ls, le = left_bounds
    rs, re_ = right_bounds
    for c in (ls, le):
        if c not in left.columns:
            raise ValueError(f"left bound column {c!r} missing")
    for c in (rs, re_):
        if c not in right.columns:
            raise ValueError(f"right bound column {c!r} missing")
    for c in by:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"by column {c!r} must exist on both sides")

    if bucket_width is None:
        med = right.select(
            (_as_num(F.col(re_)) - _as_num(F.col(rs))).alias("len")
        ).stat.approxQuantile("len", [0.5], 0.01)
        bucket_width = max(2.0 * (med[0] if med else 0.0), 1e-9)
    w = float(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    # rename right collisions (by keys stay shared join-key names)
    ren = {
        c: (c + suffix if (c in left.columns and c not in by) else c)
        for c in right.columns
    }
    r2 = right
    for c, nc in ren.items():
        if nc != c:
            r2 = r2.withColumnRenamed(c, nc)
    rs2, re2 = ren[rs], ren[re_]

    def covered(s: str, e: str):
        return F.sequence(
            F.floor(_as_num(F.col(s)) / w).cast("long"),
            F.floor(_as_num(F.col(e)) / w).cast("long"),
        )

    lx = left.where(F.col(ls) <= F.col(le)).withColumn(
        "__bkt", F.explode(covered(ls, le))
    )
    rx = r2.where(F.col(rs2) <= F.col(re2)).withColumn(
        "__bkt", F.explode(covered(rs2, re2))
    )
    overlap = (F.col(ls) <= F.col(re2)) & (F.col(rs2) <= F.col(le))
    canonical = (
        F.floor(F.greatest(_as_num(F.col(ls)), _as_num(F.col(rs2))) / w).cast("long")
        == F.col("__bkt")
    )
    out_cols = [*left.columns, *[ren[c] for c in right.columns if c not in by]]
    return (
        lx.join(rx, on=["__bkt", *by], how="inner")
        .where(overlap & canonical)
        .select(*out_cols)
    )
