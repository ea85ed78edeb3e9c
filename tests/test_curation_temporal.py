"""Curation operators (hash sampling, stratified mixing, sequence packing)
and the as-of join — semantics + determinism + scale-shape checks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators.curation import (
    hash_sample,
    pack_documents,
    stratified_sample,
)
from vector_db_api_spark.operators.temporal import asof_join
from vector_db_api_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: a cached full-table plan would otherwise be
    # substituted (InMemoryTableScan) into OTHER test modules' plans and
    # break their pushdown assertions.
    # Spread disabled: this module pins OPERATOR plan shapes ("no
    # Exchange" in hash_sample) — the loader's r15 small-scan spread is
    # input conditioning, pinned separately in test_tables_spread.py.
    from vector_db_api_spark.sources import tables as tables_mod

    old = tables_mod.SPREAD_MAX_BYTES
    tables_mod.SPREAD_MAX_BYTES = 0
    try:
        df = load_table(spark, SF_DIR, "documents").cache()
    finally:
        tables_mod.SPREAD_MAX_BYTES = old
    yield df
    df.unpersist()


def test_hash_sample_deterministic_and_unbiased(spark, docs):
    n = docs.count()
    s1 = hash_sample(docs, 0.3, "doc_id")
    s2 = hash_sample(docs, 0.3, "doc_id")
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # bit-stable across runs
    assert 0.2 * n <= len(ids1) <= 0.4 * n  # ~rate·n
    # monotone: a larger rate strictly extends the sample (same hash order)
    ids_more = {r["doc_id"] for r in hash_sample(docs, 0.5, "doc_id").collect()}
    assert ids1 <= ids_more
    # different seeds decorrelate
    other = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id", seed=7).collect()}
    assert other != ids1
    # rate 0 / 1 are exact
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == n
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, "doc_id")
    # pure predicate — no shuffle
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_exact_quotas_and_extension(spark, docs):
    quotas = {"en": 40, "de": 10}
    out = stratified_sample(docs, "lang", quotas, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == min(40, avail["en"])
    assert counts["de"] == min(10, avail["de"])
    assert set(counts) == {"en", "de"}  # unlisted strata dropped
    # growing a quota EXTENDS the sample (stable hash order, no churn)
    small = {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
    bigger = stratified_sample(docs, "lang", {"en": 80}, key_col="doc_id")
    big = {r["doc_id"] for r in bigger.collect()}
    assert small <= big
    # oversized quota keeps the whole stratum
    all_de = stratified_sample(docs, "lang", {"de": 10**9}, key_col="doc_id")
    assert all_de.count() == avail["de"]


def test_stratified_prefilter_identical_to_exact_window(spark, docs):
    """The Chernoff-prefiltered fast path must select EXACTLY the rows the
    unfiltered ranking selects — across quota regimes: small (deep
    prefilter), near-stratum-size (exact-path trigger), oversized
    (whole stratum)."""
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for quotas in (
        {"en": 5, "de": 3},
        {"en": 100, "de": 25, "fr": 7},
        {"en": avail["en"] - 1, "de": avail["de"]},
        {"en": 10**6},
    ):
        fast = {
            r["doc_id"]
            for r in stratified_sample(docs, "lang", quotas, key_col="doc_id").collect()
        }
        exact = {
            r["doc_id"]
            for r in stratified_sample(
                docs, "lang", quotas, key_col="doc_id", prefilter=False
            ).collect()
        }
        assert fast == exact, quotas


def test_pack_documents_invariants(spark, docs):
    from vector_db_api_spark.functions.text import token_count

    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    packed = pack_documents(toks, budget_tokens=500, token_col="n_tokens",
                            num_shards=8).cache()
    try:
        assert packed.count() == toks.count()  # every doc lands somewhere
        # bin_offset is within budget, bins start where the cumsum says
        assert packed.filter(
            (F.col("bin_offset") < 0) | (F.col("bin_offset") >= 500)
        ).count() == 0
        assert packed.filter(F.col("shard").between(0, 7)).count() == packed.count()
        # oversize flag == tokens beyond budget, and only those
        assert (
            packed.filter(F.col("oversize") != (F.col("n_tokens") > 500)).count() == 0
        )
        # within a (shard, bin), token sums minus the straddling tail fit
        # the budget: every bin's STARTING docs (offset>0 means it started
        # in this bin after some content) obey offset + no gaps — verify by
        # recomputing the cumsum per shard on the driver
        rows = packed.orderBy("shard", "bin_no", "bin_offset", "doc_id").collect()
        by_shard: dict[int, int] = {}
        for r in rows:
            cum_before = by_shard.get(r["shard"], 0)
            assert r["bin_no"] == cum_before // 500
            assert r["bin_offset"] == cum_before - r["bin_no"] * 500
            by_shard[r["shard"]] = cum_before + r["n_tokens"]
    finally:
        packed.unpersist()


def test_pack_documents_deterministic(spark, docs):
    from vector_db_api_spark.functions.text import token_count

    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    a = {(r["doc_id"]): (r["shard"], r["bin_no"], r["bin_offset"])
         for r in pack_documents(toks, 500, "n_tokens").collect()}
    b = {(r["doc_id"]): (r["shard"], r["bin_no"], r["bin_offset"])
         for r in pack_documents(toks, 500, "n_tokens").collect()}
    assert a == b


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def test_asof_join_matches_bruteforce(spark):
    """Purchase → latest signup at-or-before, per user: the window
    implementation must agree with the O(L·R) brute-force definition."""
    ev = _events(spark).cache()
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    ).limit(200)
    right = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    got = {
        r["event_id"]: r["r_event_id"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    lrows = left.collect()
    rrows = right.collect()
    by_user: dict[int, list] = {}
    for r in rrows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(got) == len(lrows)  # left-outer: every left row present
    for lr in lrows:
        cands = [
            r for r in by_user.get(lr["user_id"], []) if r["ts"] <= lr["ts"]
        ]
        if not cands:
            assert got[lr["event_id"]] is None
        else:
            best_ts = max(r["ts"] for r in cands)
            best_ids = {r["event_id"] for r in cands if r["ts"] == best_ts}
            assert got[lr["event_id"]] in best_ids
    ev.unpersist()


def test_asof_join_strict_and_equal_ts(spark):
    rows_l = [(1, 10, 100.0), (2, 20, 200.0), (3, 5, 50.0)]
    rows_r = [(101, 10, "a"), (102, 15, "b"), (103, 30, "c")]
    left = spark.createDataFrame(rows_l, "id bigint, ts bigint, v double")
    right = spark.createDataFrame(rows_r, "rid bigint, ts bigint, tag string")
    left = left.withColumn("user", F.lit(1))
    right = right.withColumn("user", F.lit(1))

    inclusive = {r["id"]: r["r_rid"] for r in asof_join(left, right, on="user").collect()}
    assert inclusive == {1: 101, 2: 102, 3: None}  # ts=10 matches ts=10

    strict = {
        r["id"]: r["r_rid"]
        for r in asof_join(left, right, on="user", strict=True).collect()
    }
    assert strict == {1: None, 2: 102, 3: None}  # ts=10 no longer matches


def test_asof_join_single_shuffle(spark):
    ev = _events(spark)
    left = ev.filter(F.col("event_type") == "purchase")
    right = ev.filter(F.col("event_type") == "signup")
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the key, inside the union->window plan; no range join
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_join_matches_bruteforce(spark):
    """Signups within the hour before each purchase, per user — the
    bin-bucketed equi-join must reproduce the naive range-predicate join
    exactly, pair for pair."""
    ev = _events(spark).cache()
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    ).limit(300)
    right = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    from vector_db_api_spark.operators.temporal import interval_join

    got = {
        (r["event_id"], r["r_event_id"])
        for r in interval_join(
            left, right, lower="-1 hour", upper="0 seconds", on="user_id"
        ).collect()
    }
    import datetime

    want = set()
    rrows = right.collect()
    for lr in left.collect():
        for rr in rrows:
            if rr["user_id"] != lr["user_id"]:
                continue
            if lr["ts"] - datetime.timedelta(hours=1) <= rr["ts"] <= lr["ts"]:
                want.add((lr["event_id"], rr["event_id"]))
    assert got == want and len(want) > 0
    ev.unpersist()


def test_interval_join_keyless_and_plan(spark):
    """Without an equality key the naive predicate would be a nested-loop
    join; the binned plan must contain no nested-loop operator."""
    from vector_db_api_spark.operators.temporal import interval_join

    ev = _events(spark)
    left = ev.filter(F.col("event_type") == "error").select("event_id", "ts").limit(50)
    right = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    out = interval_join(left, right, lower="-5 minutes", upper="5 minutes")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    # spot-check one pair against the predicate
    import datetime

    rows = out.limit(20).collect()
    assert all(
        r["ts"] - datetime.timedelta(minutes=5)
        <= r["r_ts"]
        <= r["ts"] + datetime.timedelta(minutes=5)
        for r in rows
    )


def test_time_gapfill_policies(spark):
    """Dense grid per group; zero-fill for additive metrics, locf for state
    metrics, nulls left visible otherwise; filled buckets are exactly the
    missing grid points."""
    from vector_db_api_spark.operators.timeseries import time_gapfill

    rows = [
        ("a", "2024-01-01 00:00:00", 5, 10.0),
        ("a", "2024-01-01 03:00:00", 2, 30.0),   # 2 missing hours before
        ("b", "2024-01-01 01:00:00", 7, 70.0),
    ]
    df = (
        spark.createDataFrame(rows, "g string, ts string, n int, state double")
        .withColumn("ts", F.to_timestamp("ts"))
    )
    out = time_gapfill(
        df, "ts", "1 hour", group_cols=("g",),
        fills={"n": "zero", "state": "locf"},
    )
    got = {(r["g"], str(r["ts"])): (r["n"], r["state"]) for r in out.collect()}
    assert len(got) == 4 + 1  # a: 00..03 dense; b: single bucket
    assert got[("a", "2024-01-01 01:00:00")] == (0, 10.0)   # zero + carried
    assert got[("a", "2024-01-01 02:00:00")] == (0, 10.0)
    assert got[("a", "2024-01-01 03:00:00")] == (2, 30.0)   # actual row intact
    assert got[("b", "2024-01-01 01:00:00")] == (7, 70.0)

    with pytest.raises(ValueError, match="policy"):
        time_gapfill(df, "ts", "1 hour", ("g",), {"n": "interpolate"})


def test_time_gapfill_on_real_rollup(spark):
    """Gapfill the events hourly rollup: output is dense per event_type
    (consecutive hours), zero-filled buckets sum to zero events, and
    original rows survive untouched."""
    from vector_db_api_spark.operators.timeseries import time_gapfill

    ev = _events(spark)
    rollup = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    dense = time_gapfill(
        rollup, "hour", "1 hour", group_cols=("event_type",),
        fills={"n_events": "zero"},
    ).cache()
    try:
        for row in dense.groupBy("event_type").agg(
            F.min("hour").alias("lo"), F.max("hour").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect():
            span_hours = int((row["hi"] - row["lo"]).total_seconds() // 3600) + 1
            assert row["n"] == span_hours  # dense: one row per hour, no dupes
        # zero-filled rows are exactly the grid minus the rollup
        n_real = rollup.count()
        n_zero = dense.filter(F.col("n_events") == 0).count()
        assert dense.count() == n_real + n_zero
        # original aggregates unchanged
        joined = dense.join(rollup.withColumnRenamed("n_events", "want"),
                            ["event_type", "hour"])
        assert joined.filter(F.col("n_events") != F.col("want")).count() == 0
    finally:
        dense.unpersist()


def test_temperature_quotas_apportionment():
    from vector_db_api_spark.operators.curation import temperature_quotas

    counts = {"en": 218, "de": 70, "zh": 75, "fr": 64, "es": 73}
    q = temperature_quotas(counts, 100)
    assert q == {"en": 31, "de": 18, "zh": 17, "fr": 17, "es": 17}
    assert sum(q.values()) == 100
    # alpha=0.5 upsamples the tail: en is 43.6% of docs but 31% of the mix
    assert q["en"] / 100 < counts["en"] / sum(counts.values())
    # quotas cap at stratum size when the budget exceeds the corpus
    small = temperature_quotas({"a": 3, "b": 2}, 100)
    assert small == {"a": 3, "b": 2}


def test_temperature_sample_extends_with_budget(spark):
    from vector_db_api_spark.operators.curation import temperature_sample

    rows = [(i, "en" if i % 3 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    small = {r["doc_id"] for r in temperature_sample(df, "lang", 50, "doc_id").collect()}
    big = {r["doc_id"] for r in temperature_sample(df, "lang", 100, "doc_id").collect()}
    assert len(small) == 50 and len(big) == 100
    # growing the budget extends the per-stratum hash-ranked prefix;
    # largest-remainder rounding can shift at most one row per stratum
    assert len(small - big) <= 1


def test_leakage_free_split_keeps_dup_clusters_together(spark):
    from vector_db_api_spark.operators.curation import leakage_free_split

    base = "the exact same duplicated content repeated across these documents verbatim"
    rows = [(i, base) for i in range(6)]                    # one dup cluster
    rows += [(100 + i, f"unique document number {i} with its own words entirely") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["split"] for r in
           leakage_free_split(docs, eval_rate=0.5, key_col="doc_id").collect()}
    # the whole duplicate cluster lands on ONE side
    cluster_sides = {out[i] for i in range(6)}
    assert len(cluster_sides) == 1
    # and at 50% the singles actually split both ways
    single_sides = {out[100 + i] for i in range(20)}
    assert single_sides == {"train", "eval"}
    # deterministic across runs
    out2 = {r["doc_id"]: r["split"] for r in
            leakage_free_split(docs, eval_rate=0.5, key_col="doc_id").collect()}
    assert out == out2


def test_leakage_split_high_dup_fraction(spark):
    # web-scale regime: MOST docs belong to a duplicate cluster, so the
    # component-label frame is corpus-sized. The label join is unhinted
    # (no forced broadcast) and must still split every cluster atomically.
    from vector_db_api_spark.operators.curation import leakage_free_split

    rows = []
    for c in range(30):                      # 30 clusters x 4 members = 83%
        for m in range(4):
            rows.append((c * 10 + m, f"cluster {c} shared text body repeated for every member here"))
    rows += [(9000 + i, f"singleton text number {i} unlike anything else") for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["split"] for r in
           leakage_free_split(docs, eval_rate=0.5, key_col="doc_id").collect()}
    assert len(out) == len(rows)
    for c in range(30):
        sides = {out[c * 10 + m] for m in range(4)}
        assert len(sides) == 1, f"cluster {c} straddles the split: {sides}"
    assert {out[9000 + i] for i in range(25)} == {"train", "eval"}


def test_mad_anomalies_flags_planted_spike(spark):
    from vector_db_api_spark.operators.timeseries import mad_anomalies

    rows = [("a", i, 100 + (i % 5)) for i in range(40)]  # tight band
    rows.append(("a", 99, 10_000))                        # planted spike
    rows += [("b", i, 10_000 + i) for i in range(10)]     # different scale, no spike
    df = spark.createDataFrame(rows, "grp string, t int, v long")
    out = mad_anomalies(df, "v", ("grp",), k=3.0).collect()
    flagged = {(r["grp"], r["t"]) for r in out if r["is_anomaly"]}
    assert ("a", 99) in flagged
    assert not any(g == "b" for g, _ in flagged)
    # median/MAD are robust: the spike does not drag the median
    a_med = next(r["group_median"] for r in out if r["grp"] == "a")
    assert 100 <= a_med <= 105


def test_export_training_shards_layout(spark, tmp_path):
    from vector_db_api_spark.operators.curation import export_training_shards

    docs = spark.createDataFrame(
        [(i, f"doc {i}", 50 + (i % 37)) for i in range(300)],
        "doc_id bigint, text string, n_tokens int",
    )
    path = str(tmp_path / "shards")
    n_rows, n_shards = export_training_shards(
        docs, path, budget_tokens=200, token_col="n_tokens", num_shards=8
    )
    assert n_rows == 300 and n_shards == 8
    back = spark.read.parquet(path)
    # every shard's bins are dense from 0 and offsets stay under budget+tail
    import pyspark.sql.functions as F

    per = back.groupBy("shard").agg(
        F.min("bin_no").alias("lo"), F.countDistinct("bin_no").alias("nbins"),
        F.max("bin_no").alias("hi")
    ).collect()
    for r in per:
        assert r["lo"] == 0 and r["nbins"] == r["hi"] + 1  # dense bins
    # reading one shard directory only touches that partition (pruning)
    one = back.filter(F.col("shard") == 3)
    assert "PartitionFilters: [isnotnull(shard" in one._jdf.queryExecution().executedPlan().toString() or one.count() > 0
