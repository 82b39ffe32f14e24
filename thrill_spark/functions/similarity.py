"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single pass, JVM-side
F.aggregate/zip_with fold (no Python UDF). Scale path: LSH bucketing by
random-hyperplane signs (signature equi-join) so candidate generation
is linear; IVF-style coarse quantization against sampled centroids.

The dot-product fold is a *sequential left fold* (F.aggregate), which
DuckDB's list_reduce reproduces exactly — that makes brute-force cosine
oracle-checkable bit-for-bit despite floating point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum of an array<double> (deterministic FP)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_for_query(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by cosine vs a literal query vector.

    One scan + TakeOrdered(k); ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def cosine_self_join_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_ids: list[int] | None = None,
) -> DataFrame:
    """Top-k neighbors for each probe row (or all rows) by brute-force
    cosine: broadcast the probe set, score against the full table, rank
    per probe. Cost O(|probes| * n) — the exact baseline ANN variants
    are judged against."""
    from pyspark.sql import Window

    probes = df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    if probe_ids is not None:
        probes = probes.filter(F.col("query_id").isin(probe_ids))
    scored = df.join(F.broadcast(probes), on=F.col(id_col) != F.col("query_id")).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, n_planes: int, seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed xorshift, no RNG
    state) for sign-LSH. Values in [-1, 1). seed selects an independent
    plane family (one per LSH table)."""
    planes = []
    state = 88172645463325252 ^ ((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    if state == 0:
        state = 1
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append((state % (1 << 20)) / float(1 << 19) - 1.0)
        planes.append(row)
    return planes


def lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 0,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Sign-LSH bucket id: bit b = 1 iff dot(vec, plane_b) > 0. Vectors
    in the same bucket are ANN candidates; bucket join is an equi-join.
    seed picks an independent plane family for OR-amplified multi-table
    LSH."""
    sig = None
    for b, plane in enumerate(hyperplanes(dim, n_planes, seed)):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(F.col(vec_col), p) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.withColumn(out_col, sig.cast("long"))


def _seq_fold_sum(mat) -> "np.ndarray":  # noqa: F821 (np imported by callers)
    """Row-wise sequential left-fold sum of a float64 matrix — the exact
    addition order of the JVM F.aggregate fold (0.0 + x0 + x1 + ...) and
    of DuckDB's list_reduce, so results are bit-identical to both.
    np.cumsum adds strictly left-to-right (unlike np.sum's pairwise
    summation, which reorders and drifts)."""
    import numpy as np

    return np.cumsum(mat, axis=1, dtype=np.float64)[:, -1]


def cosine_near_dup_pairs(
    df: DataFrame,
    tau: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "block",
    block_rows: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b), a<b, with
    cosine(a, b) >= tau. EXACT (recall 1) under every method — the
    approximate scale paths are ann_lsh_topk / ann_ivf_topk.

    Two phases, both inside the SAME task (no confirm join):
    1. CANDIDATES: a vectorized numpy matmul flags id pairs with
       cos >= tau - 1e-9 (the epsilon absorbs summation-order FP drift).
    2. EXACT CONFIRM: for flagged pairs only, cos_sim is recomputed with
       the sequential left-fold addition order (_seq_fold_sum) — bit-
       identical to the JVM F.aggregate fold and DuckDB's list_reduce —
       and the >= tau filter applied exactly. Fusing the confirm into
       the candidate task removes two shuffle joins from the plan; the
       recompute touches only candidate pairs, not the n^2 grid.

    method:
    - 'block' (default): distributed block matmul. Rows are bucketed
      into ceil(n/block_rows) blocks; every block pair (i <= j) is a
      cogroup whose task multiplies a (<=block_rows, d) matrix against
      another — BLAS speed, per-task memory O(block_rows*d), NO
      driver-side materialization of the table and no broadcast of it.
      Shuffle volume is n*(n/block_rows) vector rows — the exact
      all-pairs search is inherently quadratic in compute; this spreads
      it evenly across the cluster instead of funnelling through one
      node. This is the 100 TB-safe exact strategy.
    - 'broadcast': the whole embedding matrix is collect()ed and
      broadcast; each partition matmuls against it. Fastest when the
      table fits comfortably in executor+driver memory (n*d*8 bytes) —
      an explicit small-table opt-in, never the default.
    - 'allpairs': pure-JVM theta-join fold, no Python. O(n^2) pair
      folds; the tiny-data reference baseline.
    """
    eps = 1e-9
    import numpy as np

    def _exact_cos(L, R, r, c):
        """Exact cos_sim for candidate index pairs (r into L, c into R):
        sequential-fold dot and norms, the oracle's addition order."""
        dots = _seq_fold_sum(L[r] * R[c])
        nl = np.sqrt(_seq_fold_sum(L * L))
        nr = nl if R is L else np.sqrt(_seq_fold_sum(R * R))
        return dots / (nl[r] * nr[c])

    if method == "allpairs":
        n = df.select(
            F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_nrm")
        )
        a = n.select(
            F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va"), F.col("_nrm").alias("_na")
        )
        b = n.select(
            F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"), F.col("_nrm").alias("_nb")
        )
        pairs = a.join(b, on=F.col("a_id") < F.col("b_id")).select(
            "a_id",
            "b_id",
            (dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias("cos_sim"),
        )
        return pairs.filter(F.col("cos_sim") >= tau)

    if method == "broadcast":
        spark = df.sparkSession
        rows = df.select(id_col, vec_col).collect()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
        b_ids = spark.sparkContext.broadcast(ids)
        b_mat = spark.sparkContext.broadcast(mat)

        def gen(batches):
            import pandas as pd

            M, I = b_mat.value, b_ids.value
            Mn = M / np.linalg.norm(M, axis=1)[:, None]
            for pdf in batches:
                if not len(pdf):
                    continue
                block = np.stack(pdf[vec_col].apply(lambda v: np.asarray(v, dtype=np.float64)))
                bn = block / np.linalg.norm(block, axis=1)[:, None]
                sims = bn @ Mn.T  # (rows_in_block, n)
                bi = pdf[id_col].to_numpy()
                r, c = np.nonzero((sims >= tau - eps) & (bi[:, None] < I[None, :]))
                if not len(r):
                    continue
                cos = _exact_cos(block, M, r, c)
                keep = cos >= tau
                yield pd.DataFrame(
                    {"a_id": bi[r[keep]], "b_id": I[c[keep]], "cos_sim": cos[keep]}
                )

        return df.select(id_col, vec_col).mapInPandas(
            gen, "a_id long, b_id long, cos_sim double"
        )

    if method != "block":
        raise ValueError(f"unknown method {method!r}")

    # --- distributed block matmul -------------------------------------
    # One scalar count job sizes the block grid; the data itself never
    # leaves the executors.
    total = df.count()
    n_blocks = max(1, -(-total // block_rows))
    spark = df.sparkSession
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    tagged = df.select(F.col(id_col), F.col(vec_col)).withColumn("_blk", blk)
    grid = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    # Two independent copies of the tiny grid avoid the ambiguous-self-
    # join trap when the cogroup recombines the two replicated sides.
    bpairs_a = spark.createDataFrame(grid, "ba int, bb int")
    bpairs_b = spark.createDataFrame(grid, "ba int, bb int")
    # a-side: rows of block ba in every pair (ba, bb); b-side: rows of bb.
    a_rep = tagged.join(F.broadcast(bpairs_a), tagged["_blk"] == bpairs_a["ba"]).select(
        "ba", "bb", F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    b_rep = tagged.join(F.broadcast(bpairs_b), tagged["_blk"] == bpairs_b["bb"]).select(
        "ba", "bb", F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )

    def block_pairs(key, left, right):
        import pandas as pd

        empty = pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []})
        if not len(left) or not len(right):
            return empty
        L = np.stack(left["_v"].apply(lambda v: np.asarray(v, dtype=np.float64)))
        R = np.stack(right["_v"].apply(lambda v: np.asarray(v, dtype=np.float64)))
        Ln = L / np.linalg.norm(L, axis=1)[:, None]
        Rn = R / np.linalg.norm(R, axis=1)[:, None]
        sims = Ln @ Rn.T
        li = left["_id"].to_numpy()
        ri = right["_id"].to_numpy()
        r, c = np.nonzero((sims >= tau - eps) & (li[:, None] != ri[None, :]))
        if not len(r):
            return empty
        cos = _exact_cos(L, R, r, c)
        keep = cos >= tau
        r, c, cos = r[keep], c[keep], cos[keep]
        # cos_sim is orientation-invariant even at the bit level (the
        # elementwise products commute exactly), so the a<b swap below
        # and the same-block drop_duplicates stay value-safe.
        lo = np.minimum(li[r], ri[c])
        hi = np.maximum(li[r], ri[c])
        out = pd.DataFrame({"a_id": lo, "b_id": hi, "cos_sim": cos})
        if key[0] == key[1]:  # same-block group sees both orientations
            out = out.drop_duplicates(subset=["a_id", "b_id"])
        return out

    return (
        a_rep.groupBy("ba", "bb")
        .cogroup(b_rep.groupBy("ba", "bb"))
        .applyInPandas(block_pairs, "a_id long, b_id long, cos_sim double")
    )


def ivf_centroids(df: DataFrame, n_cells: int, vec_col: str = "embedding",
                  id_col: str = "vec_id", iters: int = 2) -> DataFrame:
    """Trained coarse quantizer: spherical k-means with deterministic
    lowest-id initialization and `iters` distributed Lloyd rounds
    (examples/k-means/k-means.hpp loop shape: classify JVM-side against
    broadcast literal centroids, re-center via one groupBy per round).
    The driver only ever holds the k x dim codebook; iters=0 degrades
    to the old ids-as-codebook stand-in."""
    init = df.orderBy(id_col).limit(n_cells).select(F.col(vec_col).alias("c")).collect()
    cents = [[float(x) for x in r["c"]] for r in init]
    dim = len(cents[0])
    for _ in range(iters):
        best = None
        for ci, c in enumerate(cents):
            arr = F.array(*[F.lit(x) for x in c])
            cn = sum(x * x for x in c) ** 0.5 or 1.0
            sim = dot(F.col(vec_col), arr) / (norm(F.col(vec_col)) * F.lit(cn))
            cand = F.struct((-sim).alias("d"), F.lit(ci).alias("c"))
            best = cand if best is None else F.least(best, cand)
        assigned = df.select(F.col(vec_col), best["c"].alias("_cell"))
        sums = assigned.groupBy("_cell").agg(
            *[
                F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"s{i}")
                for i in range(dim)
            ],
            F.count("*").alias("n"),
        )
        rows = {r["_cell"]: r for r in sums.collect()}
        cents = [
            [rows[ci][f"s{i}"] / rows[ci]["n"] for i in range(dim)] if ci in rows else cents[ci]
            for ci in range(n_cells)
        ]
    return df.sparkSession.createDataFrame(
        [(ci, cents[ci]) for ci in range(n_cells)], ["cell_id", "centroid"]
    )


def ann_ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
    train_iters: int = 2,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (broadcast the tiny trained codebook, argmax cosine, tie-break on
    cell id), then search only the probe's top-`nprobe` cells —
    candidate count drops ~n_cells/nprobe-fold versus brute force.

    The cell equi-join shuffles both sides by cell_id only; the binary
    embedding payload never fans out n^2 ways."""
    from pyspark.sql import Window

    cents = F.broadcast(ivf_centroids(df, n_cells, vec_col, id_col, iters=train_iters))
    scored_cells = df.join(cents).select(
        F.col(id_col), F.col(vec_col), F.col("cell_id"),
        cosine(F.col(vec_col), F.col("centroid")).alias("_csim"),
    )
    wc = Window.partitionBy(id_col).orderBy(F.col("_csim").desc(), F.col("cell_id").asc())
    ranked = scored_cells.withColumn("_r", F.row_number().over(wc))
    assigned = ranked.filter(F.col("_r") == 1).select(id_col, vec_col, "cell_id")
    probes = ranked.filter(F.col("_r") <= nprobe).select(id_col, vec_col, "cell_id")
    a = probes.select(
        F.col("cell_id"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    b = assigned.select(F.col("cell_id"), F.col(id_col).alias("neighbor_id"), F.col(vec_col))
    scored = (
        a.join(b, on="cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_lsh_topk(
    df: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_cap: int = 10_000,
    n_tables: int = 1,
) -> DataFrame:
    """ANN via sign-LSH: candidates = same-bucket pairs, ranked by exact
    cosine within bucket. Recall < 1 by construction; the scale path
    when brute force is too expensive (candidates shrink by ~2^planes).

    OR-amplification: with n_tables > 1, candidates are the UNION of
    same-bucket pairs over n_tables independent plane families — the
    standard (AND over planes, OR over tables) construction. A single
    table of p planes only catches pairs agreeing on all p signs
    (recall ~ (1 - theta/pi)^p, poor for moderate similarity); L tables
    raise it to 1 - (1 - s^p)^L at L× candidate cost. Cost stays linear
    in rows: one signature scan + one bounded bucket join per table.

    Every bucket join goes through bounded_self_join so a hot bucket
    (many near-identical vectors) is decomposed into bounded tasks
    instead of one quadratic straggler; the candidate set is unchanged.
    """
    from pyspark.sql import Window

    from thrill_spark.operators.skew import bounded_self_join
    from thrill_spark.ordering import _persist

    from thrill_spark.functions.dedup import _spread

    # The (id, vec) projection feeds every table's signature scan plus
    # the two final vector joins — persist it once instead of re-reading
    # the source 2*n_tables+2 times, spread across tasks first (a small
    # parquet arrives as one split but the per-row plane dot-products
    # are the hot path). Drained via release_persisted().
    df = _persist(_spread(df.select(F.col(id_col), F.col(vec_col)), id_col))
    cands = None
    for t in range(n_tables):
        sig = lsh_signature(df, dim, n_planes, vec_col, seed=t)
        pairs = bounded_self_join(
            sig,
            ["lsh_bucket"],
            salt_on=id_col,
            left_cols={"query_id": id_col},
            right_cols={"neighbor_id": id_col},
            cap=bucket_cap,
        ).select("query_id", "neighbor_id")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.filter(F.col("query_id") != F.col("neighbor_id")).distinct()
    qv = df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    nv = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec"))
    scored = (
        cands.join(qv, on="query_id")
        .join(nv, on="neighbor_id")
        .select(
            "query_id", "neighbor_id", cosine(F.col("_nvec"), F.col("_qvec")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    block_rows: int = 4096,
) -> DataFrame:
    """Exact k-nearest-neighbor JOIN by cosine: for every left row, the
    k right rows with highest cosine (self-pairs excluded when ids
    collide; ties broken by neighbor id asc). The batch primitive
    behind retrieval-augmented dataset curation — "for each of these
    queries/docs, find the closest corpus items" — as a relational op.

    Strategy (the 100 TB-safe exact path, same grid discipline as
    cosine_near_dup_pairs 'block'): both sides are hash-bucketed into
    ceil(n/block_rows) blocks; every (left-block, right-block) cell is
    one cogroup task that matmuls (<=block_rows, d) matrices. Each task
    emits, per left row, the block-local top-k candidates — selected
    with an epsilon band below the k-th matmul score, then re-scored
    with the sequential-left-fold addition order (bit-identical to
    DuckDB list_reduce), so global exactness survives FP drift in the
    BLAS matmul. The global merge ranks <= k*n_right_blocks candidates
    per left row under a window — never the full n_left x n_right grid.
    """
    import numpy as np

    eps = 1e-9
    spark = left.sparkSession
    nl, nr = left.count(), right.count()
    bl = max(1, -(-nl // block_rows))
    br = max(1, -(-nr // block_rows))
    ltag = left.select(
        F.col(left_id).alias("query_id"), F.col(vec_col).alias("_v")
    ).withColumn("_bl", F.pmod(F.xxhash64(F.col("query_id")), F.lit(bl)).cast("int"))
    rtag = right.select(
        F.col(right_id).alias("neighbor_id"), F.col(vec_col).alias("_v")
    ).withColumn("_br", F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(br)).cast("int"))
    grid = [(i, j) for i in range(bl) for j in range(br)]
    grid_a = spark.createDataFrame(grid, "ga int, gb int")
    grid_b = spark.createDataFrame(grid, "ga int, gb int")
    l_rep = ltag.join(F.broadcast(grid_a), ltag["_bl"] == grid_a["ga"]).select(
        "ga", "gb", "query_id", "_v"
    )
    r_rep = rtag.join(F.broadcast(grid_b), rtag["_br"] == grid_b["gb"]).select(
        "ga", "gb", "neighbor_id", "_v"
    )

    def block_topk(key, lpdf, rpdf):
        import pandas as pd

        empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
        if not len(lpdf) or not len(rpdf):
            return empty
        L = np.stack(lpdf["_v"].apply(lambda v: np.asarray(v, dtype=np.float64)))
        R = np.stack(rpdf["_v"].apply(lambda v: np.asarray(v, dtype=np.float64)))
        Ln = L / np.linalg.norm(L, axis=1)[:, None]
        Rn = R / np.linalg.norm(R, axis=1)[:, None]
        sims = Ln @ Rn.T
        li = lpdf["query_id"].to_numpy()
        ri = rpdf["neighbor_id"].to_numpy()
        sims[li[:, None] == ri[None, :]] = -np.inf  # exclude self-pairs
        kk = min(k, sims.shape[1])
        kth = np.partition(sims, -kk, axis=1)[:, -kk]
        r, c = np.nonzero(sims >= (kth[:, None] - 2 * eps))
        if not len(r):
            return empty
        # Exact sequential-fold rescore for the candidates only.
        dots = _seq_fold_sum(L[r] * R[c])
        nlv = np.sqrt(_seq_fold_sum(L * L))
        nrv = np.sqrt(_seq_fold_sum(R * R))
        cos = dots / (nlv[r] * nrv[c])
        return pd.DataFrame({"query_id": li[r], "neighbor_id": ri[c], "cos_sim": cos})

    from pyspark.sql import Window

    cand = (
        l_rep.groupBy("ga", "gb")
        .cogroup(r_rep.groupBy("ga", "gb"))
        .applyInPandas(block_topk, "query_id long, neighbor_id long, cos_sim double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    df: DataFrame,
    dim: int,
    n_planes: int = 6,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_cap: int = 10_000,
) -> DataFrame:
    """SemDeDup-shaped semantic near-duplicate pruning (Abbas et al.,
    arXiv:2303.09540 shape): bucket vectors by deterministic sign-LSH,
    compare pairs ONLY within a bucket, and drop any vector that has a
    smaller-id neighbor with cosine >= threshold.

    The within-bucket restriction is the scale contract: candidate
    volume is sum over buckets of size^2 (placement bounded via
    bounded_self_join), never corpus^2. Cosines use the sequential
    left-fold, so the DuckDB oracle replays keep-decisions
    bit-for-bit.

    Returns (id, bucket, n_dom, keep): n_dom = number of
    smaller-id similar neighbors in the bucket; keep = (n_dom == 0).
    """
    from thrill_spark.operators.skew import bounded_self_join
    from thrill_spark.ordering import _persist

    sig = _persist(
        lsh_signature(df, dim, n_planes, vec_col=vec_col, seed=0).select(
            F.col(id_col), F.col(vec_col), F.col("lsh_bucket")
        )
    )
    pairs = bounded_self_join(
        sig,
        ["lsh_bucket"],
        salt_on=id_col,
        left_cols={"id_a": id_col, "_va": vec_col},
        right_cols={"id_b": id_col, "_vb": vec_col},
        cap=bucket_cap,
    ).filter(F.col("id_a") < F.col("id_b"))
    dom = (
        pairs.filter(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .groupBy("id_b")
        .agg(F.count(F.lit(1)).alias("n_dom"))
    )
    return (
        sig.select(F.col(id_col), F.col("lsh_bucket").alias("bucket"))
        .join(dom.withColumnRenamed("id_b", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.col("bucket"),
            F.coalesce(F.col("n_dom"), F.lit(0)).cast("long").alias("n_dom"),
            (F.coalesce(F.col("n_dom"), F.lit(0)) == 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): split each vector into M
# subvectors, k-means each subspace to a tiny codebook, store M small
# codes per vector. At 100 TB this is THE memory lever for ANN: a
# 64-dim float vector (256 B) compresses to M=4 bytes; the ADC search
# scans codes (JVM-side integer lookups into broadcast literal
# codebooks), never the raw vectors, and only the final rescore of
# ~3k candidates per query touches full embeddings.
# ---------------------------------------------------------------------------
def _argmin_code(sub: Column, cents: list[list[float]]) -> Column:
    """Index (0-based) of the squared-L2-nearest centroid, ties to the
    lowest index. One transform over a literal centroid array — a
    compact expression tree that stays inside whole-stage codegen,
    where a chain of ksub struct-least comparisons does not."""
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    dists = F.transform(
        carr,
        lambda c: _fold_sum(
            F.zip_with(
                sub, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            )
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train_codebooks(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 2,
) -> list[list[list[float]]]:
    """Train M per-subspace codebooks of ksub centroids each with
    deterministic lowest-id init + `iters` distributed Lloyd rounds
    (one groupBy per round per subspace; driver holds only the
    M x ksub x (dim/M) codebook floats)."""
    dim_row = df.agg(F.max(F.size(vec_col)).alias("n")).collect()[0]
    dim = dim_row["n"]
    if dim is None or dim <= 0 or dim % m != 0:
        raise ValueError(f"pq_train_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    init = (
        df.orderBy(id_col).limit(ksub).select(F.col(vec_col).alias("c")).collect()
    )
    books: list[list[list[float]]] = [
        [[float(x) for x in r["c"][s * dsub : (s + 1) * dsub]] for r in init]
        for s in range(m)
    ]
    # One Lloyd round = ONE distributed job for ALL subspaces: the
    # (row, subspace, centroid) assignment runs as a broadcast join
    # against the m*ksub centroid table — one SMALL fold expression
    # regardless of ksub (literal-argmin codegen grows with ksub*dsub
    # and its compile time dominates at these sizes), then a single
    # groupBy(s, cell) re-centers everything; the driver collects
    # m*ksub rows per round.
    spark = df.sparkSession
    subs = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("_s"),
                        F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("_sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("_e"),
    ).select("_id", "_e._s", "_e._sv")
    for _ in range(iters):
        cents_df = spark.createDataFrame(
            [(s, ci, books[s][ci]) for s in range(m) for ci in range(ksub)],
            "_s int, _cell int, _cent array<double>",
        )
        j = subs.join(F.broadcast(cents_df), "_s")
        dist = _fold_sum(
            F.zip_with(
                F.col("_sv"),
                F.col("_cent"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            )
        )
        assigned = (
            j.select(
                "_id",
                "_s",
                "_sv",
                F.struct(dist.alias("d"), F.col("_cell").alias("c")).alias("_dc"),
            )
            .groupBy("_id", "_s")
            .agg(F.min("_dc").alias("_m"), F.first("_sv").alias("_sv"))
            .select("_s", "_sv", F.col("_m.c").alias("_cell"))
        )
        sums = assigned.groupBy("_s", "_cell").agg(
            *[
                F.sum(F.element_at(F.col("_sv"), i + 1).cast("double")).alias(f"s{i}")
                for i in range(dsub)
            ],
            F.count("*").alias("n"),
        )
        rows = {(r["_s"], r["_cell"]): r for r in sums.collect()}
        books = [
            [
                [
                    rows[(s, ci)][f"s{i}"] / rows[(s, ci)]["n"]
                    for i in range(dsub)
                ]
                if (s, ci) in rows
                else books[s][ci]
                for ci in range(ksub)
            ]
            for s in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to M codes: per subspace, argmin squared-L2
    against the broadcast literal codebook (tie-break lowest code).
    Pure JVM expressions — the encode pass is a scan, no shuffle."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out_cols = [F.col(id_col)]
    for s in range(m):
        sub = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        out_cols.append(_argmin_code(sub, codebooks[s]).alias(f"code_{s}"))
    return df.select(*out_cols)


def pq_ann_topk(
    df: DataFrame,
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_mod: int = 25,
    rescore_factor: int = 8,
    train_iters: int = 2,
) -> DataFrame:
    """PQ-ANN with asymmetric distance computation (ADC) + exact
    rescore: candidates ranked by sum of per-subspace distances from
    the query subvector to the CENTROID named by each neighbor's code
    (codebooks ride along as broadcast literal array-of-array columns;
    the candidate scan never touches neighbor embeddings), then the
    top rescore_factor*k candidates per query are exactly rescored by
    cosine and the final top-k returned.

    Returns (query_id, neighbor_id, rank). Probes = id % probe_mod == 0.
    """
    from pyspark.sql import Window

    books = pq_train_codebooks(
        df, m=m, ksub=ksub, vec_col=vec_col, id_col=id_col, iters=train_iters
    )
    dsub = len(books[0][0])
    codes = pq_encode(df, books, vec_col=vec_col, id_col=id_col)
    probes = df.filter(F.col(id_col) % probe_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    # ADC: distance tables as literal nested arrays, indexed by code
    cand = codes.join(
        F.broadcast(probes), on=F.col(id_col) != F.col("query_id")
    )
    approx = None
    for s in range(m):
        qsub = F.slice(F.col("_qv"), s * dsub + 1, dsub)
        cents = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in books[s]]
        )
        csub = F.element_at(cents, F.col(f"code_{s}") + 1)
        d = _fold_sum(
            F.zip_with(
                qsub, csub, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            )
        )
        approx = d if approx is None else approx + d
    cand = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"), approx.alias("_ad")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_ad").asc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= rescore_factor * k)
        .drop("_rk", "_ad")
    )
    # exact rescore on the shortlist only
    nbr = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"))
    scored = (
        short.join(nbr, "neighbor_id")
        .join(F.broadcast(probes), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("_nv"), F.col("_qv")).alias("_cs"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
