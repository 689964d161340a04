"""asof_join vs the pandas.merge_asof oracle; interval_join vs brute force.

The oracle is exact: for every direction/tolerance/keyed-ness combination
the distributed result must equal pandas row-for-row, and the physical
plan must contain no cartesian product and no single-partition global sort.
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.temporal import asof_join, interval_join


def _gen(rng, n_left, n_right, n_keys, t_span):
    left = pd.DataFrame(
        {
            "k": [rng.randrange(n_keys) for _ in range(n_left)],
            "t": [rng.uniform(0, t_span) for _ in range(n_left)],
            "lv": range(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": [rng.randrange(n_keys) for _ in range(n_right)],
            # unique right timestamps: duplicate (k, t) match order is
            # documented as arbitrary, so keep the oracle unambiguous
            "t": rng.sample(range(10 * t_span), n_right),
            "rv": [i * 10 for i in range(n_right)],
        }
    )
    right["t"] = right["t"] / 10.0
    return left, right


def _spark_asof(spark, left, right, **kw):
    out = asof_join(
        spark.createDataFrame(left, "k long, t double, lv long"),
        spark.createDataFrame(right, "k long, t double, rv long"),
        **kw,
    ).toPandas()
    return out.sort_values("lv").reset_index(drop=True)


def _pandas_asof(left, right, by=None, direction="backward", tolerance=None):
    out = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t",
        by=by,
        direction=direction,
        tolerance=tolerance,
        suffixes=("", "_r"),
    )
    return out.sort_values("lv").reset_index(drop=True)


@pytest.mark.parametrize("seed", [314, 7, 2026])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("keyed", [True, False])
def test_asof_matches_pandas(spark, direction, keyed, seed):
    rng = random.Random(seed)
    left, right = _gen(rng, 120, 80, 5 if keyed else 1, 1000)
    kw = dict(by=["k"] if keyed else None, direction=direction)
    got = _spark_asof(spark, left, right, on="t", n_buckets=7, **kw)
    want = _pandas_asof(left, right, by="k" if keyed else None, direction=direction)
    pd.testing.assert_series_equal(got["rv"], want["rv"], check_names=False)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_hot_key_time_buckets_identical(spark, direction):
    """time_buckets > 1 spreads a hot key's history over (key, bucket)
    window partitions with distributed carries — results must be
    IDENTICAL to the single-partition-per-key default AND to pandas."""
    rng = random.Random(11)
    left, right = _gen(rng, 150, 90, 2, 800)  # 2 keys -> both are hot
    got = _spark_asof(
        spark, left, right, on="t", by=["k"], direction=direction,
        time_buckets=6, tolerance=55.0,
    )
    want = _pandas_asof(left, right, by="k", direction=direction, tolerance=55.0)
    pd.testing.assert_series_equal(got["rv"], want["rv"], check_names=False)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_tolerance(spark, direction):
    rng = random.Random(271)
    left, right = _gen(rng, 80, 50, 3, 500)
    got = _spark_asof(
        spark, left, right, on="t", by=["k"], direction=direction, tolerance=7.5
    )
    want = _pandas_asof(left, right, by="k", direction=direction, tolerance=7.5)
    pd.testing.assert_series_equal(got["rv"], want["rv"], check_names=False)


def test_asof_equal_timestamps_inclusive(spark):
    """Backward and forward both match AT the exact timestamp; nearest ties
    prefer backward (the pandas rule)."""
    left = pd.DataFrame({"k": [1, 1], "t": [10.0, 20.0], "lv": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "t": [10.0, 20.0], "rv": [100, 200]})
    for direction in ("backward", "forward", "nearest"):
        got = _spark_asof(spark, left, right, on="t", by=["k"], direction=direction)
        assert list(got["rv"]) == [100, 200], direction


def test_asof_no_match_yields_null(spark):
    left = pd.DataFrame({"k": [1, 2], "t": [5.0, 6.0], "lv": [0, 1]})
    right = pd.DataFrame({"k": [1, 3], "t": [9.0, 1.0], "rv": [7, 8]})
    got = _spark_asof(spark, left, right, on="t", by=["k"], direction="backward")
    assert got["rv"].isna().all()  # k=1: right is later; k=2: no right rows
    fwd = _spark_asof(spark, left, right, on="t", by=["k"], direction="forward")
    assert list(fwd["rv"].fillna(-1)) == [7, -1]


def test_asof_global_carry_crosses_buckets(spark):
    """Keyless path: matches must cross bucket boundaries via the carry
    seeds — force many tiny buckets so nearly every match is a carry."""
    left = pd.DataFrame({"t": [float(i) for i in range(100)], "lv": range(100)})
    right = pd.DataFrame({"t": [0.5], "rv": [42]})
    l_df = spark.createDataFrame(left, "t double, lv long")
    r_df = spark.createDataFrame(right, "t double, rv long")
    got = (
        asof_join(l_df, r_df, on="t", direction="backward", n_buckets=16)
        .toPandas()
        .sort_values("lv")
    )
    assert pd.isna(got["rv"].iloc[0])  # t=0.0 precedes the only right row
    assert (got["rv"].iloc[1:] == 42).all()
    fwd = (
        asof_join(l_df, r_df, on="t", direction="forward", n_buckets=16)
        .toPandas()
        .sort_values("lv")
    )
    assert fwd["rv"].iloc[0] == 42 and fwd["rv"].iloc[1:].isna().all()


def test_asof_name_collision_and_validation(spark):
    left = spark.createDataFrame([(1, 1.0, 9)], "k long, t double, v long")
    right = spark.createDataFrame([(1, 1.0, 5)], "k long, t double, v long")
    out = asof_join(left, right, on="t", by=["k"])
    assert out.columns == ["k", "t", "v", "v_r"]
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", direction="sideways")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, on="t", tolerance=-1)
    with pytest.raises(ValueError, match="join column"):
        asof_join(left, right, on="nope")


def test_asof_plan_no_join_no_global_sort(spark):
    """The keyed as-of plans as a window over ONE union — no Join node at
    all; the keyless path must not plan a partitionBy-less Window (the
    single-partition collapse the bucket machinery exists to avoid)."""
    left = spark.createDataFrame([(1, 1.0, 9)], "k long, t double, lv long")
    right = spark.createDataFrame([(1, 1.0, 5)], "k long, t double, rv long")
    keyed = asof_join(left, right, on="t", by=["k"])
    plan = keyed._sc._jvm.PythonSQLUtils.explainString(
        keyed._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan.split("===== Subqueries")[0]
    unkeyed = asof_join(left, right, on="t", n_buckets=4)
    uplan = unkeyed._sc._jvm.PythonSQLUtils.explainString(
        unkeyed._jdf.queryExecution(), "formatted"
    )
    # every window spec involves only the range bucket as its leading
    # column: the corpus fill windows PARTITION by it (first element is a
    # bare partition column, no sort direction), and the carry windows —
    # which run over the bucket-count-sized carry table — ORDER by it.
    # No spec may lead with __t (a corpus-wide global sort).
    specs = [s for s in uplan.split("windowspecdefinition(")[1:]]
    assert specs, uplan[:800]
    assert all(s.startswith("__bucket#") for s in specs), uplan[:800]
    partitioned = [
        s for s in specs if not s.split(",")[0].rstrip().endswith(("FIRST", "LAST"))
    ]
    assert partitioned, "no window is PARTITIONED by __bucket:\n" + uplan[:800]


def _brute_overlap(left, right, by=None):
    out = []
    for _, lr in left.iterrows():
        for _, rr in right.iterrows():
            if by and any(lr[c] != rr[c] for c in by):
                continue
            if lr["s"] <= rr["e"] and rr["s"] <= lr["e"]:
                out.append((lr["lv"], rr["rv"]))
    return sorted(out)


@pytest.mark.parametrize("keyed", [False, True])
@pytest.mark.parametrize("width", [None, 3.0, 50.0])
def test_interval_join_matches_bruteforce(spark, keyed, width):
    rng = random.Random(99)

    def intervals(n, tag):
        s = [rng.uniform(0, 200) for _ in range(n)]
        return pd.DataFrame(
            {
                "k": [rng.randrange(3) for _ in range(n)],
                "s": s,
                "e": [x + abs(rng.gauss(4, 3)) for x in s],
                tag: range(n),
            }
        )

    left, right = intervals(60, "lv"), intervals(40, "rv")
    got = interval_join(
        spark.createDataFrame(left, "k long, s double, e double, lv long"),
        spark.createDataFrame(right, "k long, s double, e double, rv long"),
        ("s", "e"),
        ("s", "e"),
        by=["k"] if keyed else None,
        bucket_width=width,
    )
    assert sorted(
        (r["lv"], r["rv"]) for r in got.select("lv", "rv").collect()
    ) == _brute_overlap(left, right, by=["k"] if keyed else None)
    # exactly-once emission is part of the contract (canonical bucket):
    assert got.count() == got.dropDuplicates(["lv", "rv"]).count()


def test_interval_join_no_cartesian_and_naming(spark):
    left = spark.createDataFrame([(1, 0.0, 10.0, 1)], "k long, s double, e double, v long")
    right = spark.createDataFrame([(1, 5.0, 6.0, 2)], "k long, s double, e double, v long")
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by=["k"], bucket_width=4.0)
    assert out.columns == ["k", "s", "e", "v", "s_r", "e_r", "v_r"]
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert out.count() == 1
    # degenerate (start > end) intervals drop out
    bad = spark.createDataFrame([(1, 9.0, 1.0, 3)], "k long, s double, e double, v long")
    assert interval_join(bad, right, ("s", "e"), ("s", "e"), bucket_width=4.0).count() == 0
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(left, right, ("s", "e"), ("s", "e"), bucket_width=0.0)
    with pytest.raises(ValueError, match="bound column"):
        interval_join(left, right, ("s", "nope"), ("s", "e"))


def test_asof_null_payload_never_stitches_rows(spark):
    """The matched right row travels as ONE struct: a NULL payload value in
    the matched row must come through as NULL, never back-filled from an
    older row (per-column ignorenulls fill would stitch two rows together),
    and tolerance applies to the matched row, not per column."""
    left = spark.createDataFrame([(3.0, 0)], "t double, lv long")
    right = spark.createDataFrame(
        [(1.0, 5, 7), (2.0, None, 9)], "t double, x long, y long"
    )
    got = asof_join(left, right, on="t", direction="backward", n_buckets=2).collect()[0]
    assert (got["x"], got["y"]) == (None, 9)  # pandas.merge_asof agrees
    tol = asof_join(
        left, right, on="t", direction="backward", tolerance=1.5, n_buckets=2
    ).collect()[0]
    assert (tol["x"], tol["y"]) == (None, 9)  # t=1.0 is outside tolerance


def test_asof_localrelation_inputs(spark):
    """Keyless path on tuple-created (LocalRelation) inputs: the carry is
    broadcast-JOINED, not unioned, so the Catalyst constraint-rewrite crash
    a seeded union used to trip cannot occur."""
    left = spark.createDataFrame([(3.0, 0)], "t double, lv long")
    right = spark.createDataFrame(
        [(1.0, 5, 7), (2.0, 4, 9)], "t double, x long, y long"
    )
    got = asof_join(left, right, on="t", direction="backward", n_buckets=4).collect()
    assert [(r["x"], r["y"]) for r in got] == [(4, 9)]


def test_asof_null_on_and_null_by_never_match(spark):
    """NULL semantics: a left row with NULL `on`, or any NULL `by` key,
    gets NULL right columns; right rows with NULL `on`/`by` are inert."""
    left = spark.createDataFrame(
        [(1, 5.0, 0), (1, None, 1), (None, 5.0, 2)], "k long, t double, lv long"
    )
    right = spark.createDataFrame(
        [(1, 1.0, 10), (1, None, 66), (None, 1.0, 77)], "k long, t double, rv long"
    )
    for direction in ("backward", "nearest"):
        got = {
            r["lv"]: r["rv"]
            for r in asof_join(
                left, right, on="t", by=["k"], direction=direction
            ).collect()
        }
        assert got == {0: 10, 1: None, 2: None}, direction
    # keyless: NULL-t left rows still get no match
    gkl = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left.drop("k"), right.drop("k"), on="t", direction="backward", n_buckets=2
        ).collect()
    }
    # two right rows share t=1.0 once k is dropped: arbitrary-but-one match
    assert gkl[1] is None and gkl[0] == gkl[2] and gkl[0] in (10, 77)


def test_asof_suffix_collision_stays_unique(spark):
    left = spark.createDataFrame([(1.0, 1, 2)], "t double, x long, x_r long")
    right = spark.createDataFrame([(1.0, 9)], "t double, x long")
    out = asof_join(left, right, on="t")
    assert out.columns == ["t", "x", "x_r", "x_r_r"]
    assert len(set(out.columns)) == len(out.columns)


def test_asof_rejects_unorderable_on_type(spark):
    left = spark.createDataFrame([("2026-01-01", 0)], "t string, lv long")
    with pytest.raises(ValueError, match="numeric or timestamp"):
        asof_join(left, left, on="t")
    dated = left.withColumn("t", F.to_date("t"))
    with pytest.raises(ValueError, match="numeric or timestamp"):
        asof_join(dated, dated, on="t")


def test_interval_join_point_right_default_width(spark):
    """A point-event right side must not collapse the default width to ~0
    (which would explode a long left interval into billions of buckets)."""
    left = spark.createDataFrame([(0.0, 3600.0, 1)], "s double, e double, lv long")
    right = spark.createDataFrame(
        [(5.0, 5.0, 2), (9999.0, 9999.0, 3)], "s double, e double, rv long"
    )
    got = interval_join(left, right, ("s", "e"), ("s", "e"))
    assert [r["rv"] for r in got.collect()] == [2]
    # both sides points: falls back to width 1.0 and still joins exactly
    points = spark.createDataFrame([(5.0, 5.0, 7)], "s double, e double, lv long")
    assert interval_join(points, right, ("s", "e"), ("s", "e")).count() == 1


def test_asof_timestamps_and_tolerance_seconds(spark):
    """Timestamp on-columns work end-to-end; tolerance is in seconds."""
    left = spark.createDataFrame(
        [(1, "2026-01-01 00:00:30"), (2, "2026-01-01 00:10:00")],
        "lv long, t string",
    ).withColumn("t", F.to_timestamp("t"))
    right = spark.createDataFrame(
        [(100, "2026-01-01 00:00:00")], "rv long, t string"
    ).withColumn("t", F.to_timestamp("t"))
    got = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, on="t", tolerance=60.0, n_buckets=2).collect()
    }
    assert got == {1: 100, 2: None}


def test_streaming_asof_enrich_matches_pandas(spark, tmp_path):
    """Stream-static as-of enrichment across TWO micro-batches must equal
    pandas.merge_asof over the full input — including NULL on/by rows
    passing through with NULL payloads — and the map is stateless, so
    append mode needs no watermark."""
    import os

    rng = random.Random(41)
    pdf = pd.DataFrame(
        {
            "k": [rng.randrange(3) for _ in range(200)],
            "t": [rng.uniform(0, 500) for _ in range(200)],
            "lv": range(200),
        }
    )
    pdf.loc[5, "t"] = None  # NULL on
    pdf["k"] = pdf["k"].astype("object")
    pdf.loc[7, "k"] = None  # NULL by
    dim = pd.DataFrame(
        {
            "k": [i % 3 for i in range(30)],
            "t": [i * 16.7 for i in range(30)],
            "rv": [i * 10 for i in range(30)],
        }
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, t double, lv long"
    spark.createDataFrame(pdf.iloc[:100], schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    from sketchlib.temporal import streaming_asof_enrich

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    dim_df = spark.createDataFrame(dim, "k long, t double, rv long")
    out = streaming_asof_enrich(
        stream, dim_df, on="t", by=["k"], direction="backward", tolerance=40.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asof_enrich")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(pdf.iloc[100:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
        got = {
            r["lv"]: r["rv"] for r in spark.sql("select * from asof_enrich").collect()
        }
    finally:
        q.stop()

    valid = pdf[pdf["t"].notna() & pdf["k"].notna()].copy()
    valid["k"] = valid["k"].astype("int64")
    want_df = pd.merge_asof(
        valid.sort_values("t", kind="stable"),
        dim.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        tolerance=40.0,
        suffixes=("", "_r"),
    )
    want = {int(r.lv): (None if pd.isna(r.rv) else int(r.rv)) for r in want_df.itertuples()}
    want[5] = None  # NULL on passes through unmatched
    want[7] = None  # NULL by passes through unmatched
    assert len(got) == 200 and got == want


def test_streaming_asof_enrich_dim_cap(spark):
    left = spark.createDataFrame([(1.0, 1)], "t double, lv long")
    dim = spark.createDataFrame([(float(i), i) for i in range(50)], "t double, rv long")
    from sketchlib.temporal import streaming_asof_enrich

    with pytest.raises(ValueError, match="max_dim_rows"):
        streaming_asof_enrich(left, dim, on="t", max_dim_rows=10)


def test_streaming_asof_enrich_bigint_payload_exact(spark, tmp_path):
    """Integral payloads above 2^53 must survive exactly even when the
    batch contains unmatched rows (merge_asof would upcast a plain int64
    column to float64 and silently round; nullable Int64 must not)."""
    import os

    big = (1 << 53) + 1
    left = pd.DataFrame({"t": [0.5, 2.0], "lv": [0, 1]})  # t=0.5 unmatched
    dim = pd.DataFrame({"t": [1.0], "rv": [big]})
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(left, "t double, lv long").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    from sketchlib.temporal import streaming_asof_enrich

    stream = spark.readStream.schema("t double, lv long").parquet(in_dir)
    out = streaming_asof_enrich(
        stream, spark.createDataFrame(dim, "t double, rv long"), on="t"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("bigint_enrich")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["lv"]: r["rv"] for r in spark.sql("select * from bigint_enrich").collect()}
    finally:
        q.stop()
    assert got == {0: None, 1: big}


def test_streaming_asof_enrich_mixed_on_dtypes_lossless(spark, tmp_path):
    """A long-typed stream time against a double-typed dim time must
    promote BOTH sides (casting the dim to int64 would truncate t=100.9
    to 100 and wrongly match a future row backward)."""
    import os

    left = pd.DataFrame({"t": [100], "lv": [0]})
    dim = pd.DataFrame({"t": [100.9], "rv": [7]})
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(left, "t long, lv long").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    from sketchlib.temporal import streaming_asof_enrich

    stream = spark.readStream.schema("t long, lv long").parquet(in_dir)
    out = streaming_asof_enrich(
        stream, spark.createDataFrame(dim, "t double, rv long"), on="t",
        direction="backward",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("mixed_enrich")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from mixed_enrich").collect()
    finally:
        q.stop()
    assert len(rows) == 1 and rows[0]["rv"] is None  # 100.9 is in the future


def test_sessionize_matches_pandas_oracle(spark):
    """sessionize vs a per-key pandas sweep: same session boundaries at
    gap=30, NULL ts/key rows get NULL sessions, ties share a session."""
    from sketchlib.temporal import sessionize

    rng = random.Random(5)
    rows = [(rng.randrange(4), float(rng.randrange(0, 500)), i) for i in range(300)]
    rows += [(1, None, 900), (None, 5.0, 901), (2, 42.0, 902), (2, 42.0, 903)]
    df = spark.createDataFrame(rows, "k long, t double, lv long")
    got = {
        r["lv"]: r["session_seq"]
        for r in sessionize(df, "t", by=["k"], gap=30.0).collect()
    }

    import collections

    per_key = collections.defaultdict(list)
    for k, t, lv in rows:
        if k is not None and t is not None:
            per_key[k].append((t, lv))
    want = {}
    for k, evs in per_key.items():
        evs.sort()
        seq, prev = 0, None
        tie_seq = {}
        for t, lv in evs:
            if prev is None or t - prev > 30.0:
                seq += 1
            # ties share the session of their timestamp
            tie_seq.setdefault(t, seq)
            want[lv] = tie_seq[t]
            prev = t
    want[900] = None
    want[901] = None
    assert got == want
    # boundary semantics: gap EXACTLY equal does not split
    b = spark.createDataFrame([(1, 0.0, 0), (1, 30.0, 1), (1, 60.5, 2)], "k long, t double, lv long")
    gb = {r["lv"]: r["session_seq"] for r in sessionize(b, "t", ["k"], 30.0).collect()}
    assert gb == {0: 1, 1: 1, 2: 2}
    with pytest.raises(ValueError, match="gap"):
        sessionize(b, "t", ["k"], 0)
    with pytest.raises(ValueError, match="by key"):
        sessionize(b, "t", [], 30.0)
    with pytest.raises(ValueError, match="collides"):
        sessionize(b.withColumnRenamed("lv", "session_seq"), "t", ["k"], 30.0)
