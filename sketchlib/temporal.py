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
  (``last(matched_row_struct, ignoreNulls)``) resolves every left row's
  match inside the partition. The matched right row travels as ONE struct,
  never as independently-filled columns (per-column fill would stitch
  values from different rows whenever a payload value is NULL). No join
  node at all, no per-row Python.
- ``asof_join`` WITHOUT keys never plans a global window — and WITH keys
  it can spread a hot key over ``time_buckets`` tasks. Both range-bucket
  time by sampled quantiles and join each (key, bucket) cell's carry —
  the latest right row of all earlier buckets (backward) / earliest of
  all later buckets (forward) — computed FULLY DISTRIBUTED: per-cell
  extremes in one aggregation, then a tiny window over the bucket axis
  (within a key, bucket order is time order). Nothing collects to the
  driver at any key cardinality.
- ``interval_join`` explodes each interval onto the fixed-width buckets
  it covers and equi-joins on the bucket id; a canonical-bucket clause
  (emit only in the bucket containing the overlap's start) deduplicates
  multi-bucket matches without a distinct. Cost is
  O(intervals x buckets-covered), never |L| x |R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DataType,
    NumericType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)
from pyspark.sql.window import Window

_DIRECTIONS = ("backward", "forward", "nearest")


def _as_num(col):
    """Orderable column -> double for range arithmetic (timestamps become
    fractional epoch seconds; numerics pass through)."""
    return col.cast("double")


def _check_on_type(dt: DataType, side: str, on: str) -> None:
    if not isinstance(dt, (NumericType, TimestampType, TimestampNTZType)):
        raise ValueError(
            f"asof 'on' column {on!r} on the {side} side must be numeric or "
            f"timestamp, got {dt.simpleString()} (cast DateType/strings first)"
        )


def _fresh_names(
    wanted: list[str], taken: set[str], suffix: str
) -> dict[str, str]:
    """Collision-safe output naming: a wanted name colliding with anything
    already taken gets ``suffix`` appended until free (so a left side
    already holding both 'x' and 'x_r' still yields unique columns)."""
    out: dict[str, str] = {}
    taken = set(taken)
    # names that survive unchanged reserve their slot first, so a renamed
    # column can never land on a later verbatim one
    for c in wanted:
        if c not in taken:
            out[c] = c
            taken.add(c)
    for c in wanted:
        if c in out:
            continue
        nc = c
        while nc in taken:
            nc += suffix
        out[c] = nc
        taken.add(nc)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    n_buckets: int = 64,
    suffix: str = "_r",
    right_on_name: str | None = None,
    time_buckets: int = 1,
) -> DataFrame:
    """As-of join: attach to every left row the right row whose ``on``
    value is the nearest at-or-before it (``backward``), at-or-after it
    (``forward``), or closest in either direction (``nearest``, ties
    prefer backward) — ``pandas.merge_asof`` semantics, distributed.
    ``right_on_name`` additionally emits the matched right row's ``on``
    value under that name (e.g. to compute the match gap downstream).

    Left rows are always preserved (right columns NULL when no match, or
    when the match violates ``tolerance``). NULL never matches: a left row
    with a NULL ``on`` value — or any NULL ``by`` key — gets NULL right
    columns, and right rows with NULL ``on``/``by`` values are inert
    (pandas refuses NaN keys outright; an equi-join would drop them).
    ``tolerance`` is measured in the ``on`` column's numeric units
    (seconds for timestamps) and must be non-negative. Among right rows
    sharing an identical (by, on) value the matched row is
    arbitrary-but-one — pre-dedupe the right side if that matters. Right
    payload columns keep their names unless they collide with a left
    column, in which case they get ``suffix`` (repeatedly, until unique).

    Plan shape: union both sides with NULL-padded payloads, then ONE
    window partitioned by ``by`` (or by a sampled time-range bucket when
    ``by`` is None, with per-bucket carries joined in — see module doc)
    forward-fills the matched right row — one struct, so its columns
    always come from the SAME row; ``nearest`` fills both directions
    inside the same sort.

    Skew: by default a single ``by`` key's full history lands in one
    partition (keys are the unit of parallelism). For HOT keys set
    ``time_buckets > 1``: the window partitions by (by..., time bucket)
    so one key's history spreads over ``time_buckets`` tasks, and the
    cross-bucket fallback comes from the same fully-distributed carry
    table the keyless path uses — results are identical to
    ``time_buckets=1`` (tested), only the parallelism changes.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    by = list(by or [])
    for c in [on, *by]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"join column {c!r} must exist on both sides")
    _check_on_type(left.schema[on].dataType, "left", on)
    _check_on_type(right.schema[on].dataType, "right", on)

    r_payload = [c for c in right.columns if c != on and c not in by]
    out_names = _fresh_names(r_payload, set(left.columns), suffix)
    if right_on_name is not None:
        taken = set(left.columns) | set(out_names.values())
        if right_on_name in taken:
            raise ValueError(
                f"right_on_name {right_on_name!r} collides with an output column"
            )
    l_struct = StructType(left.schema.fields)
    r_struct = StructType(
        [StructField("__rt", right.schema[on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in r_payload]
    )

    lu = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct).alias("__rrow"),
    )
    ru = (
        right.where(F.col(on).isNotNull())
        .select(
            *[F.col(c) for c in by],
            F.col(on).alias("__t"),
            F.lit(False).alias("__is_left"),
            F.lit(None).cast(l_struct).alias("__l"),
            F.struct(
                F.col(on).alias("__rt"), *[F.col(c) for c in r_payload]
            ).alias("__rrow"),
        )
    )
    u = lu.unionByName(ru)

    if time_buckets < 1:
        raise ValueError(f"time_buckets must be >= 1, got {time_buckets}")
    carries = None
    join_cols: list[str] = []
    if by and time_buckets <= 1:
        part_cols = [F.col(c) for c in by]
    else:
        # keyed: time_buckets is the knob; keyless: n_buckets, unless the
        # caller explicitly passed time_buckets > 1 (honored, not ignored)
        nb = time_buckets if (by or time_buckets > 1) else n_buckets
        u, carries, join_cols = _bucket_and_carries(u, direction, nb, by)
        part_cols = [F.col(c) for c in by] + [F.col("__bucket")]

    # ordering: inclusive matching at equal __t means right rows must sort
    # BEFORE left rows for backward (they land in the preceding frame) and
    # for nearest (distance 0 resolves backward — the pandas tie rule);
    # AFTER left rows for pure forward (they land in the following frame)
    side_first_right = F.col("__is_left").cast("int")  # right(0) < left(1)
    side_first_left = (~F.col("__is_left")).cast("int")  # left(0) < right(1)
    fills = []
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("__t").asc_nulls_last(), side_first_right)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fills.append(("b", F.last("__rrow", ignorenulls=True).over(wb)))
    if direction in ("forward", "nearest"):
        side = side_first_right if direction == "nearest" else side_first_left
        wf = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("__t").asc_nulls_last(), side)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fills.append(("f", F.first("__rrow", ignorenulls=True).over(wf)))

    u = u.select("*", *[fill.alias(f"__fill_{tag}") for tag, fill in fills])
    matched = u.where(F.col("__is_left"))
    if carries is not None:
        # keyless: <= n_buckets rows — broadcast outright; keyed: keys x
        # buckets rows — AQE broadcasts when small, else shuffles on the
        # same (by, bucket) keys
        side = carries if by else F.broadcast(carries)
        matched = matched.join(side, on=join_cols, how="left")

    def _pick(tag: str):
        fill = F.col(f"__fill_{tag}")
        if carries is not None:
            fill = F.coalesce(fill, F.col(f"__carry_{tag}"))
        return fill

    tnum_l = _as_num(F.col("__t"))
    null_keys = F.lit(False)
    for k in by:
        null_keys = null_keys | F.col(k).isNull()

    def _ok(row):
        dist = F.abs(tnum_l - _as_num(row["__rt"]))
        cond = row.isNotNull() & F.col("__t").isNotNull() & ~null_keys
        if tolerance is not None:
            cond = cond & (dist <= F.lit(float(tolerance)))
        return cond, dist

    if direction == "nearest":
        row_b, row_f = _pick("b"), _pick("f")
        ok_b, dist_b = _ok(row_b)
        ok_f, dist_f = _ok(row_f)
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))  # ties prefer backward
        chosen = F.when(use_b, row_b).when(ok_f, row_f)
    else:
        row = _pick("b" if direction == "backward" else "f")
        ok, _ = _ok(row)
        chosen = F.when(ok, row)

    extra = (
        [chosen["__rt"].alias(right_on_name)] if right_on_name is not None else []
    )
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[chosen[c].alias(out_names[c]) for c in r_payload],
        *extra,
    )


def _bucket_and_carries(
    u: DataFrame, direction: str, n_buckets: int, by: list[str]
):
    """Bucketed-as-of support (keyless, and keyed with ``time_buckets``):
    assign sampled-quantile range buckets and build the per-(key, bucket)
    carry table — for each cell, the latest right row of all EARLIER
    buckets of the same key (``__carry_b``) and the earliest right row of
    all LATER buckets (``__carry_f``) — so a cell whose own rows can't
    answer falls back to the carry via ``coalesce``, and no window
    partition ever needs another partition's rows.

    Fully distributed at ANY key cardinality: one approxQuantile over the
    numeric time picks the bucket bounds, one aggregation computes each
    nonempty cell's right extremes (max_by / min_by in the same pass when
    both directions are needed), and a window over the BUCKET AXIS (one
    row per occupied cell — kilobytes per key) turns extremes into
    carries: within a key, bucket order IS time order, so the latest
    right row of earlier buckets is ``last(cell_max, ignoreNulls)`` over
    the preceding-buckets frame. Nothing is collected to the driver.
    Cells enumerate from BOTH sides of the union, so a left-only bucket
    still receives its carry.
    """
    n_b = max(2, int(n_buckets))
    qs = u.where(F.col("__t").isNotNull()).select(_as_num(F.col("__t")).alias("q"))
    bounds = sorted(
        set(qs.stat.approxQuantile("q", [i / n_b for i in range(1, n_b)], 0.01))
    )
    u = u.withColumn("__tn", _as_num(F.col("__t")))
    bucket_of = F.aggregate(
        F.lit(bounds).cast("array<double>"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("__tn") >= b, 1).otherwise(0),
    )
    u = u.withColumn("__bucket", F.coalesce(bucket_of, F.lit(0))).drop("__tn")

    keys = [*by, "__bucket"]
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    # ONE aggregation over the union enumerates every occupied cell AND
    # its right extremes: max_by/min_by ignore NULL ordering keys (and the
    # ordering is NULL on left rows), so left-only cells come out with
    # NULL extremes — exactly the rows that need a pure carry. No second
    # scan for the cell list, no join.
    right_tn = F.when(~F.col("__is_left"), _as_num(F.col("__t")))
    right_row = F.when(~F.col("__is_left"), F.col("__rrow"))
    aggs = []
    if need_b:
        aggs.append(F.max_by(right_row, right_tn).alias("__mx"))
    if need_f:
        aggs.append(F.min_by(right_row, right_tn).alias("__mn"))
    g = u.groupBy(*keys).agg(*aggs)

    sel: list = [F.col(c) for c in keys]
    if need_b:
        wb = (
            Window.partitionBy(*[F.col(c) for c in by])
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        sel.append(F.last("__mx", ignorenulls=True).over(wb).alias("__carry_b"))
    if need_f:
        wf = (
            Window.partitionBy(*[F.col(c) for c in by])
            .orderBy("__bucket")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        sel.append(F.first("__mn", ignorenulls=True).over(wf).alias("__carry_f"))
    return u, g.select(*sel), keys


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: list[str],
    gap: float,
    session_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: assign every row a per-key session
    sequence number (1-based, in time order) — a new session starts when
    the gap to the key's previous event exceeds ``gap`` (seconds for
    timestamps, plain units for numerics). The reusable operator behind
    the ``sessionized_events`` driver query (same lag + conditional-cumsum
    window recipe).

    Rows with a NULL ``ts_col`` or any NULL ``by`` key get a NULL session
    (undefined position in time — consistent with asof_join's NULL
    semantics). Session flags depend only on the sorted timestamps, so
    same-timestamp ties cannot flip assignments: the result is
    deterministic at any partitioning.

    Plan shape: ONE shuffle on the ``by`` keys (the window partition),
    sort within partitions — keys are the unit of parallelism, the usual
    shape for per-entity sessionization at any corpus size (user/session
    cardinality is the scale axis, not per-key history).
    """
    if not by:
        raise ValueError("sessionize requires at least one by key")
    if gap <= 0:
        raise ValueError(f"gap must be positive, got {gap}")
    for c in [ts_col, *by]:
        if c not in df.columns:
            raise ValueError(f"column {c!r} missing")
    _check_on_type(df.schema[ts_col].dataType, "input", ts_col)
    if session_col in df.columns:
        raise ValueError(f"session_col {session_col!r} collides with an input column")

    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(F.col(ts_col))
    tn = _as_num(F.col(ts_col))
    delta = tn - F.lag(tn).over(w)
    # NULL-ts rows sort first in the partition: keep them OUT of the
    # cumsum (flag 0) so real rows stay 1-based; the first real row sees a
    # NULL delta (its lag is a NULL-ts row or nothing) and opens session 1
    new_sess = F.when(
        F.col(ts_col).isNotNull(),
        (delta.isNull() | (delta > F.lit(float(gap)))).cast("long"),
    ).otherwise(F.lit(0))
    valid = F.col(ts_col).isNotNull()
    for c in by:
        valid = valid & F.col(c).isNotNull()
    # default RANGE frame: same-timestamp ties share one cumsum value, so
    # the arbitrary order among ties can never split a session number
    seq = F.sum(new_sess).over(w)
    return df.withColumn(session_col, F.when(valid, seq))


def streaming_asof_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    max_dim_rows: int = 5_000_000,
    suffix: str = "_r",
) -> DataFrame:
    """Stream-static as-of ENRICHMENT: attach to every streaming row the
    static dimension's as-of match (same semantics as ``asof_join`` /
    ``pandas.merge_asof``) — the streaming counterpart where the right
    side is a slowly-changing dimension snapshot.

    Plan shape: the dimension is collected ONCE (loud ``ValueError`` past
    ``max_dim_rows`` — at dimension sizes beyond broadcast, snapshot-join
    per window instead), sorted, and broadcast; each micro-batch is then
    matched inside a STATELESS ``mapInPandas`` (per-batch
    ``pandas.merge_asof`` over the broadcast frame — O(log |dim|) per
    row, Arrow-batched, no shuffle, no state store), so it composes with
    any output mode and any downstream aggregation. ``tolerance`` is in
    seconds for timestamp ``on`` columns, plain units for numerics.

    NULL semantics match ``asof_join``: stream rows with NULL ``on`` or
    any NULL ``by`` key pass through with NULL payloads; dimension rows
    with NULL ``on``/``by`` are dropped as inert. Integral payload columns
    come back as nullable integers; float payloads carry NaN for
    unmatched rows (Arrow null on the Spark side is not representable
    inside pandas float64 without boxing — documented trade).
    """
    import pandas as pd

    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance}")
    by = list(by or [])
    for c in [on, *by]:
        if c not in stream.columns or c not in dim.columns:
            raise ValueError(f"join column {c!r} must exist on both sides")
    _check_on_type(stream.schema[on].dataType, "stream", on)
    _check_on_type(dim.schema[on].dataType, "dim", on)

    r_payload = [c for c in dim.columns if c != on and c not in by]
    out_names = _fresh_names(r_payload, set(stream.columns), suffix)

    n_dim = dim.count()
    if n_dim > max_dim_rows:
        raise ValueError(
            f"streaming_asof_enrich broadcasts the dimension; {n_dim} rows "
            f"exceed max_dim_rows={max_dim_rows} — snapshot-join instead"
        )
    from pyspark.sql.types import IntegralType, StructField as _SF, StructType as _ST

    dim_pdf = (
        dim.na.drop(subset=[on, *by])
        .toPandas()
        .sort_values(on, kind="stable")
        .reset_index(drop=True)
    )
    # integral payloads must NOT ride merge_asof as plain int64: any
    # unmatched row in a batch upcasts the whole column to float64, which
    # silently corrupts values above 2^53 (ids, fingerprints). Nullable
    # Int64 carries pd.NA for misses losslessly.
    for c in r_payload:
        if isinstance(dim.schema[c].dataType, IntegralType):
            dim_pdf[c] = dim_pdf[c].astype("Int64")
    dim_bc = stream.sparkSession.sparkContext.broadcast(dim_pdf)

    out_schema = _ST(
        list(stream.schema.fields)
        + [_SF(out_names[c], dim.schema[c].dataType) for c in r_payload]
    )
    is_ts = not isinstance(stream.schema[on].dataType, NumericType)
    tol = (
        None
        if tolerance is None
        else (pd.Timedelta(seconds=float(tolerance)) if is_ts else float(tolerance))
    )
    integral = {c for c in r_payload if isinstance(dim.schema[c].dataType, IntegralType)}
    stream_cols = list(stream.columns)

    def enrich(pdfs):
        dimf = dim_bc.value
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ok = pdf[on].notna()
            for c in by:
                ok &= pdf[c].notna()
            left = pdf[ok].reset_index(drop=True)
            if len(left):
                # Arrow batches and toPandas can disagree on datetime/int
                # resolution (ns vs us, int32 vs int64) — align key dtypes
                # on BOTH sides via numpy promotion, never a lossy cast of
                # one side to the other (int64 batch + float64 dim would
                # otherwise truncate dim times and shift matches). Merge on
                # a CAST COPY; the output keeps the batch's original
                # columns so promoted dtypes never leak past the merge.
                import numpy as _np

                lmerge = left.copy()
                for c in (on, *by):
                    if dimf[c].dtype != lmerge[c].dtype:
                        common = _np.promote_types(dimf[c].dtype, lmerge[c].dtype)
                        dimf = dimf.copy()
                        dimf[c] = dimf[c].astype(common)
                        lmerge[c] = lmerge[c].astype(common)
                lmerge["__ord"] = range(len(lmerge))
                m = (
                    pd.merge_asof(
                        lmerge.sort_values(on, kind="stable"),
                        dimf,
                        on=on,
                        by=by or None,
                        direction=direction,
                        tolerance=tol,
                        suffixes=("", "__dim"),
                    )
                    .sort_values("__ord", kind="stable")
                    .reset_index(drop=True)
                )
                # dim columns colliding with stream names got '__dim';
                # __ord order == left's positional order, so .values aligns
                picked = {
                    out_names[c]: m[c + "__dim" if c in stream_cols else c].values
                    for c in r_payload
                }
                matched = left.assign(**picked)
            else:
                matched = left.reindex(columns=stream_cols)
            skipped = pdf[~ok][stream_cols]
            out = pd.concat([matched, skipped], ignore_index=True)
            for c in r_payload:
                oc = out_names[c]
                if oc not in out.columns:
                    out[oc] = None
                if c in integral:
                    out[oc] = out[oc].astype("Int64")
            yield out[list(out_schema.fieldNames())]

    return stream.mapInPandas(enrich, out_schema)


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
    each pair EXACTLY once with no distinct shuffle. NULL ``by`` keys
    never match (equi-join semantics).

    ``bucket_width`` is in the bound columns' numeric units (seconds for
    timestamps); the default is twice the larger median interval length of
    the two sides, measured AFTER dropping degenerate (start > end) rows —
    point-interval sides therefore never drag the default toward zero —
    and falls back to 1.0 when both sides are all points (any width gives
    one bucket per point). Width trades replication for selectivity: a row
    replicates ~(len/width + 1) times, a bucket gathers width-proportional
    candidates. Intervals FAR longer than the width replicate accordingly —
    size the width to the long tail (or split giants upstream).

    Right columns colliding with left names get ``suffix`` (repeatedly,
    until unique); ``by`` key columns appear once. Inner join semantics
    (overlapping pairs only).
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

    # degenerate intervals are dropped from the join; drop them BEFORE the
    # width estimate too, so negative lengths can't skew it
    lf = left.where(F.col(ls) <= F.col(le))
    rf = right.where(F.col(rs) <= F.col(re_))

    if bucket_width is None:
        def _median_len(df: DataFrame, s: str, e: str) -> float:
            q = df.select(
                (_as_num(F.col(e)) - _as_num(F.col(s))).alias("len")
            ).stat.approxQuantile("len", [0.5], 0.01)
            return q[0] if q else 0.0

        med = max(_median_len(lf, ls, le), _median_len(rf, rs, re_))
        bucket_width = 2.0 * med if med > 0 else 1.0
    w = float(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    # rename right collisions (by keys stay shared join-key names)
    keep = [c for c in right.columns if c not in by]
    ren = {**{c: c for c in by}, **_fresh_names(keep, set(left.columns), suffix)}
    r2 = rf
    for c, nc in ren.items():
        if nc != c:
            r2 = r2.withColumnRenamed(c, nc)
    rs2, re2 = ren[rs], ren[re_]

    def covered(s: str, e: str):
        return F.sequence(
            F.floor(_as_num(F.col(s)) / w).cast("long"),
            F.floor(_as_num(F.col(e)) / w).cast("long"),
        )

    lx = lf.withColumn("__bkt", F.explode(covered(ls, le)))
    rx = r2.withColumn("__bkt", F.explode(covered(rs2, re2)))
    overlap = (F.col(ls) <= F.col(re2)) & (F.col(rs2) <= F.col(le))
    canonical = (
        F.floor(F.greatest(_as_num(F.col(ls)), _as_num(F.col(rs2))) / w).cast("long")
        == F.col("__bkt")
    )
    out_cols = [*left.columns, *[ren[c] for c in keep]]
    return (
        lx.join(rx, on=["__bkt", *by], how="inner")
        .where(overlap & canonical)
        .select(*out_cols)
    )
