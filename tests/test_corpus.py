"""Unit tests for corpus-management operators (functions/corpus.py):
the dataset-assembly edge cases the oracle differential can't isolate."""

from pyspark.sql import functions as F

from thrill_spark.functions import corpus as C


def test_split_assign_stable_under_growth(spark):
    """Hash-based splits must not reassign existing docs when the corpus
    grows — the eval-contamination guarantee."""
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(200).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r["doc_id"]: r["split"] for r in C.assign_splits(small, w).collect()}
    s2 = {r["doc_id"]: r["split"] for r in C.assign_splits(big, w).collect()}
    assert all(s2[k] == v for k, v in s1.items())
    assert set(s2.values()) == {"train", "val", "test"}


def test_split_weights_approximate(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = C.assign_splits(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    frac = {
        r["split"]: r["n"] / 5000
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_stratified_sample_exact_counts(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = C.stratified_sample_exact(df, ["grp"], n_per_stratum=5)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5}
    # deterministic: same sample every run
    again = C.stratified_sample_exact(df, ["grp"], n_per_stratum=5)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_stratified_small_stratum_returns_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["doc_id", "grp"])
    out = C.stratified_sample_exact(df, ["grp"], n_per_stratum=10)
    assert out.count() == 3


def test_repetition_scores_planted(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),  # one distinct 2-gram
            (1, "all words here are different tokens"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in C.repetition_scores(df).collect()}
    assert out[0]["n_2grams"] == 4 and out[0]["dup_2gram_frac"] == 0.75
    assert out[1]["dup_2gram_frac"] == 0.0 and out[1]["dup_3gram_frac"] == 0.0


def test_pack_greedy_respects_budget_and_order(spark):
    rows = [(i, 30) for i in range(20)]  # 20 docs x 30 tokens, budget 100
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = C.pack_greedy(df, "n_tok", budget=100, n_shards=2).collect()
    by_shard_bin = {}
    for r in out:
        by_shard_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (_, _), members in by_shard_bin.items():
        assert sum(m["n_tokens"] for m in members) <= 100
    # bins are contiguous id ranges within a shard (greedy in id order)
    for (s, b), members in by_shard_bin.items():
        ids = sorted(m["doc_id"] for m in members)
        shard_ids = sorted(r["doc_id"] for r in out if r["shard"] == s)
        lo = shard_ids.index(ids[0])
        assert shard_ids[lo : lo + len(ids)] == ids


def test_pack_greedy_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 999), (2, 10), (3, 10)], ["doc_id", "n_tok"]
    )
    out = {r["doc_id"]: r for r in C.pack_greedy(df, "n_tok", budget=100, n_shards=1).collect()}
    assert out[1]["bin"] not in (out[0]["bin"],)  # oversized doc not merged before
    assert out[2]["bin"] == out[3]["bin"]  # packing resumes after it
    assert out[2]["bin"] != out[1]["bin"]


def test_shuffle_index_is_permutation(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = C.shuffle_index(df).collect()
    poss = sorted(r["shuffle_pos"] for r in out)
    assert poss == list(range(500))
    # deterministic but not identity order
    ids_in_pos_order = [r["doc_id"] for r in sorted(out, key=lambda r: r["shuffle_pos"])]
    assert ids_in_pos_order != list(range(500))
