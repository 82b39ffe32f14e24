"""Dedup / similarity / text / multimodal function tests with planted
ground truth."""

import pytest
from pyspark.sql import functions as F

from thrill_spark.functions import dedup as D
from thrill_spark.functions import multimodal as MM
from thrill_spark.functions import similarity as S
from thrill_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("today", "tonight")  # near-dup of 0
    other = "completely different content about spark engines and distributed query processing"
    rows = [(0, base), (1, near), (2, other), (3, base)]  # 3 = exact dup of 0
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_finds_planted_dup(docs):
    out = D.exact_dedup(docs).collect()
    groups = {r["doc_id"]: r["n_copies"] for r in out}
    assert groups[0] == 2  # docs 0 and 3 collapse
    assert len(out) == 3


def test_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.jaccard_pairs(docs, threshold=0.3).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0
    assert (0, 2) not in pairs


def test_minhash_lsh_candidates_contain_dups(docs):
    sig = D.minhash_signatures(docs, num_hashes=16)
    cands = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(sig, num_hashes=16, bands=8).collect()}
    assert (0, 3) in cands  # exact dup always collides
    assert (0, 1) in cands  # near dup collides in some band w.h.p.


def test_simhash_similarity_structure(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, bits=32).collect()}
    assert sigs[0] == sigs[3]
    ham_near = bin(sigs[0] ^ sigs[1]).count("1")
    ham_far = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham_near < ham_far


def test_cosine_topk_self_similarity(spark):
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.cosine_topk_for_query(df, [1.0, 0, 0, 0, 0, 0, 0, 0.0], k=1).collect()
    assert out[0]["vec_id"] == 0 and abs(out[0]["cos_sim"] - 1.0) < 1e-12


def test_ann_lsh_recall_on_clusters(spark):
    # two tight clusters; ANN should retrieve same-cluster neighbors
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + 0.01 * i] * 4 + [0.0] * 4))
        rows.append((100 + i, [0.0] * 4 + [1.0 + 0.01 * i] * 4))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.ann_lsh_topk(df, dim=8, k=3, n_planes=4).collect()
    for r in out:
        same = (r["query_id"] < 100) == (r["neighbor_id"] < 100)
        assert same, f"cross-cluster neighbor {r}"


def test_cosine_self_join_topk(spark):
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.cosine_self_join_topk(df, k=2, probe_ids=[0]).collect()
    assert len(out) == 2 and all(r["query_id"] == 0 for r in out)


def test_text_tokens_and_fingerprint(spark):
    df = spark.createDataFrame([(0, "  Hello   WORLD  "), (1, "hello world")], ["doc_id", "text"])
    out = df.select("doc_id", TX.token_count("text").alias("n"), TX.fingerprint("text").alias("fp")).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n"] == 2
    assert by_id[0]["fp"] == by_id[1]["fp"]  # normalization collapses case+ws


def test_lang_id_markers(spark):
    rows = [
        (0, "the cat and the dog is a friend of mine"),
        (1, "der hund und die katze ist das beste"),
        (2, "le chat et la souris est les amis"),
        (3, "xyz qqq zzz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lang"] for r in df.select("doc_id", TX.lang_id("text").alias("lang")).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "und"


def test_quality_score_range(spark):
    df = spark.createDataFrame([(0, "good text " * 60), (1, "!!!...")], ["doc_id", "text"])
    out = {r["doc_id"]: r["q"] for r in df.select("doc_id", TX.quality_score("text").alias("q")).collect()}
    assert out[0] == 1.0
    assert out[1] < 0.2


def test_multimodal_feature_extraction(spark):
    df = MM.attach_fake_media(spark.range(20).withColumnRenamed("id", "id"), "id")
    feats = MM.extract_features(df).collect()
    assert len(feats) == 20
    r = next(x for x in feats if x["id"] == 7)
    assert r["format"] == "png" and r["n_bytes"] == len(b"png:7")


def test_multimodal_real_decoder_gate(spark):
    df = MM.attach_fake_media(spark.range(1), "id")
    if MM.have_pil():
        # real decoder runs; fake payload is not an image, so the
        # per-row fallback keeps the pipeline end-to-end runnable
        assert MM.extract_features(df, use_real_decoder=True).count() == 1
    else:
        with pytest.raises(Exception):  # NotImplementedError inside executor
            MM.extract_features(df, use_real_decoder=True).collect()


def test_multimodal_real_png_roundtrip(spark):
    """Real Pillow path: decode an actual PNG when the lib is present
    (skipped in containers without Pillow — the stub path is exercised
    by the other tests either way)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL.new("RGB", (3, 2)).save(buf, format="PNG")
    raw = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(raw))], "id long, media binary")
    out = MM.extract_features(df, use_real_decoder=True).collect()
    assert out[0]["format"] == "png" and out[0]["n_bytes"] == len(raw)


def test_multimodal_resize_and_framesample(spark):
    df = MM.attach_fake_media(spark.range(5), "id")
    rs = MM.resize_images(df, 64, 48).collect()
    assert all(r["media_meta"]["width"] == 64 for r in rs)
    fs = MM.frame_sample(df, every_n=2).collect()
    n7 = [r for r in fs if r["id"] == 3]  # id 3 -> 4 frames -> sampled 0,2
    assert [r["frame_idx"] for r in n7] == [0, 2]


def test_winnow_fingerprint_shared_run(spark):
    # docs sharing a long run must share at least one winnow fingerprint
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "PREFIX " + a  # shifted copy: shared 10-word run
    c = "totally unrelated words here none in common with others at all"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["doc_id", "text"])
    rows = D.winnow_fingerprints(df, "text", "doc_id", shingle_words=3, window=4).collect()
    assert all(sorted(r["fp"]) == list(r["fp"]) for r in rows)  # sorted-set output
    out = {r["doc_id"]: set(r["fp"]) for r in rows}
    assert out[0] & out[1], "shifted copy must share a fingerprint"
    assert not (out[0] & out[2]), "unrelated docs should not collide"


def test_cosine_near_dup_pairs_planted(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["a_id"], r["b_id"]) for r in S.cosine_near_dup_pairs(df, tau=0.95).collect()}
    assert pairs == {(0, 1)}


def test_ann_ivf_recall_vs_brute(spark):
    rows = []
    for i in range(12):
        rows.append((i, [1.0 + 0.01 * i] * 4 + [0.0] * 4))
        rows.append((100 + i, [0.0] * 4 + [1.0 + 0.01 * i] * 4))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.ann_ivf_topk(df, k=3, n_cells=4).collect()
    assert len(out) > 0
    for r in out:
        same = (r["query_id"] < 100) == (r["neighbor_id"] < 100)
        assert same, f"cross-cluster neighbor {r}"


def test_cosine_block_matches_allpairs(spark):
    """The distributed block matmul (default) must produce exactly the
    same pair set + bit-identical cos_sim as the pure-JVM all-pairs
    fold, including with a block grid forced to many blocks."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in S.cosine_near_dup_pairs(df, tau=0.3, method="allpairs").collect()
    }
    block = {
        (r["a_id"], r["b_id"]): r["cos_sim"]
        for r in S.cosine_near_dup_pairs(df, tau=0.3, method="block", block_rows=8).collect()
    }
    assert block == exact  # bit-identical values (shared confirm fold)


def test_lsh_hot_bucket_bounded(spark):
    """Adversarial corpus: hundreds of identical docs collapse into one
    LSH bucket in every band. bounded_self_join must still produce the
    full candidate set while splitting the bucket into capped tasks."""
    n = 300
    docs = [(i, "the same boilerplate text repeated again and again for all") for i in range(n)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = D.minhash_signatures(df, num_hashes=8, shingle_words=3)
    pairs = D.lsh_candidate_pairs(sigs, num_hashes=8, bands=2, bucket_cap=50)
    assert pairs.count() == n * (n - 1) // 2


def test_bounded_self_join_matches_plain(spark):
    """bounded_self_join == plain bucket self-join, pair for pair."""
    from thrill_spark.operators.skew import bounded_self_join

    rows = [(i, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, ["id", "bkt"])
    plain = (
        df.selectExpr("bkt", "id AS id_a")
        .join(df.selectExpr("bkt", "id AS id_b"), on="bkt")
        .select("id_a", "id_b")
    )
    bounded = bounded_self_join(
        df, ["bkt"], salt_on="id",
        left_cols={"id_a": "id"}, right_cols={"id_b": "id"}, cap=4,
    ).select("id_a", "id_b")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, bounded.collect()))
    assert a == b


def test_ann_lsh_cap_invariant(spark):
    """ann_lsh_topk results are identical whatever the bucket cap."""
    rows = [(i, [1.0, float(i % 5) / 10, 0.5]) for i in range(25)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    big = sorted(map(tuple, S.ann_lsh_topk(df, dim=3, k=3, bucket_cap=10_000).collect()))
    small = sorted(map(tuple, S.ann_lsh_topk(df, dim=3, k=3, bucket_cap=5).collect()))
    assert big == small


def test_derive_n_cells_grows_with_n():
    # sqrt(N/64) clamped to [4, 4096] — must be monotone in N and hit
    # both clamps at the extremes
    sizes = [0, 100, 1_000, 100_000, 10_000_000, 1_000_000_000]
    cells = [S.derive_n_cells(n) for n in sizes]
    assert cells == sorted(cells)
    assert cells[0] == 4 and cells[1] == 4          # floor clamp
    assert cells[-1] == 3953                         # sqrt(1e9/64)
    assert S.derive_n_cells(10**12) == 4096          # ceiling clamp
    # target_cell_size steers the count
    assert S.derive_n_cells(100_000, target_cell_size=16) > S.derive_n_cells(
        100_000, target_cell_size=256
    )


def test_train_sample_is_id_decorrelated_and_deterministic(spark):
    """An id-correlated corpus must not train on its lowest-id prefix:
    the capped sample is ordered by md5(id), so it draws from the whole
    id range — and stays deterministic across invocations."""
    rows = [(i, [float(i), 0.0]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    X1 = S._train_sample(df, "embedding", "vec_id", cap=50)
    X2 = S._train_sample(df, "embedding", "vec_id", cap=50)
    assert (X1 == X2).all()
    ids = sorted(int(v[0]) for v in X1)
    # a lowest-id sample would be exactly 0..49; the decorrelated one
    # must reach well past the prefix
    assert ids != list(range(50))
    assert max(ids) > 100


def test_lit_sql_rejects_non_finite():
    import math

    import pytest

    assert S._lit_sql(1.5) == "1.5D"
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            S._lit_sql(bad)
