"""Mixture sampling + sequence packing: the integer-exact laws.

The load-bearing property is PARTITION-COUNT INVARIANCE: the two-phase
distributed prefix-sum (sketchlib.pack) must produce byte-identical
selection and offsets at any parallelism — that is the whole point of
replacing a single-partition global Window cumsum.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.pack import (
    PRIO_MOD,
    PRIO_MULT,
    doc_priority,
    mixture_budgets,
    pack_offsets,
    select_mixture,
)

SEQ_LEN = 128


def make_docs(n=600, n_sources=7, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{int(i):02d}" for i in rng.integers(0, n_sources, n)],
            "n_tok": rng.integers(1, 400, n).astype(np.int64),
        }
    )


@pytest.fixture(scope="module")
def docs_pdf():
    return make_docs()


@pytest.fixture(scope="module")
def budgets(docs_pdf):
    tot = docs_pdf.groupby("source")["n_tok"].sum().to_dict()
    return mixture_budgets({k: int(v) for k, v in tot.items()})


def reference_pipeline(docs_pdf, budgets, seq_len=SEQ_LEN):
    """Single-threaded pandas oracle of the full selection + packing."""
    d = docs_pdf[docs_pdf["n_tok"] > 0].copy()
    d["prio"] = (d["doc_id"] * PRIO_MULT) % PRIO_MOD
    d = d.sort_values("prio").reset_index(drop=True)
    d["src_before"] = d.groupby("source")["n_tok"].cumsum() - d["n_tok"]
    d["budget"] = d["source"].map(budgets)
    sel = d[d["src_before"] < d["budget"]].copy()
    sel["tok_before"] = sel["n_tok"].cumsum() - sel["n_tok"]
    sel["first_seq"] = sel["tok_before"] // seq_len
    sel["last_seq"] = (sel["tok_before"] + sel["n_tok"] - 1) // seq_len
    return sel


def run_spark(spark, docs_pdf, budgets, num_partitions, seq_len=SEQ_LEN):
    df = spark.createDataFrame(docs_pdf)
    sel = select_mixture(spark, df, budgets, num_partitions=num_partitions)
    packed = pack_offsets(spark, sel, seq_len, num_partitions=num_partitions)
    out = packed.toPandas().sort_values("doc_id").reset_index(drop=True)
    from sketchlib.session import release

    release(sel)
    release(packed)
    return out


def test_mixture_budgets_integer_law():
    tokens = {"a": 1_000_000, "b": 10_000, "c": 100}
    b = mixture_budgets(tokens)
    total = sum(tokens.values())
    wsum = sum(math.isqrt(t) for t in tokens.values())
    for s, t in tokens.items():
        assert b[s] == (total // 2) * math.isqrt(t) // wsum
    # temperature flattening: the small source gets a share ABOVE its
    # proportional share, the big one below
    assert b["c"] / b["a"] > tokens["c"] / tokens["a"]


def test_mixture_budgets_empty_and_zero():
    assert mixture_budgets({}) == {}
    assert mixture_budgets({"a": 0}) == {"a": 0}


def test_priority_injective_and_deterministic():
    ids = np.arange(100_000, dtype=np.int64)
    prio = (ids * PRIO_MULT) % PRIO_MOD
    assert len(np.unique(prio)) == len(ids)


def test_selection_and_packing_match_pandas_oracle(spark, docs_pdf, budgets):
    ref = reference_pipeline(docs_pdf, budgets)
    got = run_spark(spark, docs_pdf, budgets, num_partitions=5)
    ref_s = ref.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(ref_s["doc_id"])
    for col in ("src_before", "tok_before", "first_seq", "last_seq"):
        assert list(got[col]) == list(ref_s[col]), col


def test_partition_count_invariance(spark, docs_pdf, budgets):
    """The prefix-sum law: 2, 5 and 17 partitions give identical offsets."""
    outs = [run_spark(spark, docs_pdf, budgets, n) for n in (2, 5, 17)]
    for other in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], other)


def test_budget_prefix_rule(spark, docs_pdf, budgets):
    """Each source's pre-doc running sum stays under budget (the exact
    prefix rule), and adding the doc overshoots by at most one doc."""
    got = run_spark(spark, docs_pdf, budgets, num_partitions=4)
    per = got.groupby("source").agg(sel_tok=("n_tok", "sum"), max_before=("src_before", "max"))
    for src, row in per.iterrows():
        assert row["max_before"] < budgets[src]
        # total selected < budget + the largest selected doc
        largest = got.loc[got["source"] == src, "n_tok"].max()
        assert row["sel_tok"] < budgets[src] + largest


def test_packing_contiguity(spark, docs_pdf, budgets):
    """Offsets tile the token stream exactly: sorted by prio, each doc
    starts where the previous ended, and seq ids follow from offsets."""
    got = run_spark(spark, docs_pdf, budgets, num_partitions=6).sort_values("prio")
    starts = got["tok_before"].to_numpy()
    lens = got["n_tok"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + lens[:-1]).all()
    assert (got["first_seq"] == got["tok_before"] // SEQ_LEN).all()
    assert (got["last_seq"] == (got["tok_before"] + got["n_tok"] - 1) // SEQ_LEN).all()


def test_zero_token_docs_dropped(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "source": ["a", "a", "a"], "n_tok": [0, 5, 7]}
    )
    df = spark.createDataFrame(pdf)
    sel = select_mixture(spark, df, {"a": 10**9}, num_partitions=2)
    got = sel.toPandas()
    from sketchlib.session import release

    release(sel)
    assert set(got["doc_id"]) == {2, 3}


def test_doc_priority_column_matches_numpy(spark):
    pdf = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    got = (
        spark.createDataFrame(pdf)
        .select("doc_id", doc_priority(F.col("doc_id")).alias("prio"))
        .toPandas()
        .sort_values("doc_id")
    )
    expect = (pdf["doc_id"].to_numpy() * PRIO_MULT) % PRIO_MOD
    assert (got["prio"].to_numpy() == expect).all()


def test_driver_query_shape(spark):
    """training_mix_pack end-to-end at sf0.001: schema, global n_sequences
    consistency, and the budget law per row."""
    from sketchlib.queries import training_mix_pack

    out = training_mix_pack(spark, "/root/testdata/sf0.001").toPandas()
    assert list(out.columns) == [
        "key",
        "token_budget",
        "docs_selected",
        "tokens_selected",
        "seq_spans",
        "n_sequences",
    ]
    assert out["n_sequences"].nunique() == 1
    total = out["tokens_selected"].sum()
    assert out["n_sequences"].iloc[0] == (total + 511) // 512
    assert (out["tokens_selected"] >= 1).all()


# ---- hypothesis properties (pure python/pandas — no Spark in the loop) ----

from hypothesis import given, settings
from hypothesis import strategies as st

_token_maps = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=3),
    st.integers(0, 10**12),
    min_size=1,
    max_size=8,
)


@given(_token_maps)
@settings(max_examples=100, deadline=None)
def test_budget_allocation_properties(tokens):
    b = mixture_budgets(tokens)
    total = sum(tokens.values())
    # never over-allocates the global budget, never negative
    assert sum(b.values()) <= total // 2
    assert all(0 <= v <= total // 2 for v in b.values())
    # monotone: a source with more tokens never gets a smaller budget
    items = sorted(tokens.items(), key=lambda kv: kv[1])
    for (s1, _), (s2, _) in zip(items, items[1:]):
        assert b[s1] <= b[s2]


@given(st.integers(1, 300), st.integers(1, 6), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_reference_prefix_and_contiguity_laws(n, nsrc, seed):
    pdf = make_docs(n, nsrc, seed)
    tot = pdf.groupby("source")["n_tok"].sum().to_dict()
    budgets = mixture_budgets({k: int(v) for k, v in tot.items()})
    sel = reference_pipeline(pdf, budgets)
    if not len(sel):
        return
    # exact prefix rule per source
    for src, grp in sel.groupby("source"):
        assert grp["src_before"].max() < budgets[src]
        assert grp["n_tok"].sum() < budgets[src] + grp["n_tok"].max()
    # packing tiles the stream with no gaps or overlaps
    s = sel.sort_values("prio")
    starts, lens = s["tok_before"].to_numpy(), s["n_tok"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + lens[:-1]).all()


def test_emit_sequences_tiles_docs_and_sequences(spark, docs_pdf, budgets):
    """Slice laws: slices partition every doc's tokens exactly AND tile
    every training sequence exactly (full seq_len except the last)."""
    from sketchlib.pack import emit_sequences, pack_offsets, select_mixture
    from sketchlib.session import release

    df = spark.createDataFrame(docs_pdf)
    sel = select_mixture(spark, df, budgets, num_partitions=4)
    packed = pack_offsets(spark, sel, SEQ_LEN, num_partitions=4)
    try:
        slices = emit_sequences(packed, SEQ_LEN).toPandas()
        pk = packed.toPandas()
    finally:
        release(sel)
        release(packed)
    # per-doc: slices sum to n_tok and are contiguous within the doc
    agg_doc = slices.groupby("doc_id")["slice_len"].sum()
    for _, r in pk.iterrows():
        assert agg_doc[r["doc_id"]] == r["n_tok"]
    for doc_id, grp in slices.sort_values("seq_id").groupby("doc_id"):
        starts, lens = grp["doc_start"].to_numpy(), grp["slice_len"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == starts[:-1] + lens[:-1]).all()
        assert (lens > 0).all()
    # per-sequence: full tiling at seq_len, partial last
    total = pk["n_tok"].sum()
    agg_seq = slices.groupby("seq_id")["slice_len"].sum().sort_index()
    n_seq = (total + SEQ_LEN - 1) // SEQ_LEN
    assert list(agg_seq.index) == list(range(n_seq))
    assert (agg_seq.iloc[:-1] == SEQ_LEN).all()
    assert agg_seq.iloc[-1] == total - (n_seq - 1) * SEQ_LEN
    # within-sequence offsets tile [0, seq_len)
    for seq_id, grp in slices.sort_values("seq_start").groupby("seq_id"):
        starts, lens = grp["seq_start"].to_numpy(), grp["slice_len"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == starts[:-1] + lens[:-1]).all()


def test_emit_sequences_is_a_pure_projection(spark, docs_pdf, budgets):
    """emit_sequences adds NO shuffle and no Window on top of the packed
    rows — it is the map-side projection a sequence writer runs in place."""
    from sketchlib.pack import emit_sequences, pack_offsets, select_mixture
    from sketchlib.session import release

    df = spark.createDataFrame(docs_pdf)
    sel = select_mixture(spark, df, budgets, num_partitions=4)
    packed = pack_offsets(spark, sel, SEQ_LEN, num_partitions=4)
    try:
        plan = emit_sequences(packed, SEQ_LEN)._sc._jvm.PythonSQLUtils.explainString(
            emit_sequences(packed, SEQ_LEN)._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
        assert "Window" not in plan
        assert "Generate" in plan  # the explode
    finally:
        release(sel)
        release(packed)


def test_layout_sorted_fast_path_identical(spark, docs_pdf, budgets):
    """pack_offsets(layout_sorted=True) on select_mixture output (which IS
    the layout) must equal the re-shuffling slow path bit for bit."""
    from sketchlib.pack import pack_offsets, select_mixture
    from sketchlib.session import release

    df = spark.createDataFrame(docs_pdf)
    sel = select_mixture(spark, df, budgets, num_partitions=5)
    fast = pack_offsets(spark, sel, SEQ_LEN, num_partitions=5, layout_sorted=True)
    slow = pack_offsets(spark, sel, SEQ_LEN, num_partitions=5)
    try:
        f = fast.toPandas().sort_values("doc_id").reset_index(drop=True)
        s = slow.toPandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(f, s)
    finally:
        release(sel)
        release(fast)
        release(slow)
