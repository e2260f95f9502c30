"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline; IVF-bucketed search
as the scale path (assign to nearest centroid, probe only matching
clusters). All math is built-in expressions (``zip_with``/``aggregate``)
— JVM-side, codegen'd, no Python in the hot loop.

Scale notes: brute-force is O(|Q|·|C|) — fine when |Q| is small or as a
per-cluster refinement; the IVF variant turns the cross join into
|Q|·|C|/n_clusters with a broadcast centroid table. For 100 TB-scale
corpora, partition the corpus by cluster id (bucketBy) so probes are
partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns (double accumulation,
    left-to-right — matches DuckDB's list_dot_product order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-matches
    excluded). Deterministic output: ties broken by neighbor id.

    Norms are precomputed per side before the pair join — computing
    ``l2_norm`` inside the pair expression would redo |C| norm folds per
    query (3x the flops, and the dominant cost at corpus scale)."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.repartition(par).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cvec_col: str = "cvec",
    n_probe: int = 1,
) -> DataFrame:
    """IVF assignment: the ``n_probe`` nearest centroids per vector
    (broadcast centroids, ranked cosine with deterministic tie-break).
    ``n_probe=1`` (default) is ordinary single-cluster assignment; higher
    values produce one row per (vector, probed cluster) — the multi-probe
    front end of two-stage ANN search. Vector norms are computed once per
    row, not once per (row, centroid) pair."""
    par = emb.sparkSession.sparkContext.defaultParallelism
    with_norm = emb.repartition(par).select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_vnorm")
    )
    cents_norm = centroids.select(
        F.col(cid_col), F.col(cvec_col), l2_norm(F.col(cvec_col)).alias("_cnorm")
    )
    scored = with_norm.crossJoin(F.broadcast(cents_norm)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(cid_col),
        (dot(F.col(vec_col), F.col(cvec_col)) / (F.col("_vnorm") * F.col("_cnorm"))).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col(cid_col).asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select(id_col, vec_col, cid_col)
    )


def deterministic_centroids(
    emb: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """First ``n_clusters`` vectors by id as centroids — deterministic and
    oracle-reproducible (a k-means step would converge better but is not
    SQL-checkable; swap in ml.clustering.KMeans for production use)."""
    return emb.orderBy(id_col).limit(n_clusters).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    n_clusters: int = 16,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's own cluster. Recall trades
    off with n_clusters; probing is a co-partitioned equi-join on cid
    instead of a full cross join."""
    cents = deterministic_centroids(corpus, n_clusters, id_col, vec_col)
    c_assigned = assign_clusters(corpus, cents, id_col, vec_col)
    q_assigned = assign_clusters(queries, cents, id_col, vec_col)
    q = q_assigned.select(F.col("cid"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = c_assigned.select(F.col("cid"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        q.join(c, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine_sim(F.col("qvec"), F.col("cvec")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def knn_ivf_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    n_clusters: int = 16,
    n_probe: int = 4,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN (the standard IVF answer): probe the query's
    ``n_probe`` nearest clusters to gather a candidate pool, then EXACT
    cosine rerank over the pool for the final top-k. Recall approaches
    brute force as n_probe grows while cost stays
    |Q|·|C|·(n_probe/n_clusters): the probe is a co-partitioned equi-join
    on cluster id, and the rerank touches only the candidate pool — at
    corpus scale, bucket the corpus by cid so probes are partition-pruned
    scans. Output schema matches :func:`knn_bruteforce` (query_id,
    neighbor_id, rank), so brute force is the recall oracle.

    ``centroids`` (cid, cvec) overrides the default first-n coarse
    quantizer — pass :func:`kmeans_centroids` output (dequantized) to run
    the trained-IVF composition."""
    cents = (
        centroids
        if centroids is not None
        else deterministic_centroids(corpus, n_clusters, id_col, vec_col)
    )
    c_assigned = assign_clusters(corpus, cents, id_col, vec_col)
    q_probes = assign_clusters(queries, cents, id_col, vec_col, n_probe=n_probe)
    # each corpus vector lives in exactly one cluster, so (query, neighbor)
    # pairs are unique across probed clusters — no dedup needed
    q = q_probes.select(
        F.col("cid"), F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
    )
    c = c_assigned.select(
        F.col("cid"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnorm"),
    )
    reranked = (
        q.join(c, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (SimHash for vectors): deterministic planes derived
# from md5 so any engine reproduces the same buckets (Charikar, STOC 2002).
# ---------------------------------------------------------------------------

def _plane_component(j: int, i: int) -> int:
    """Plane j, dimension i → zero-mean integer in [-500, 499], derived from
    md5 — identical in SQL: ('0x'||substr(md5(j||'_'||i),1,8))::BIGINT % 1000 - 500."""
    import hashlib

    h = hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:8]
    return int(h, 16) % 1000 - 500


def hyperplane_planes(n_planes: int, dim: int) -> list[list[int]]:
    return [[_plane_component(j, i) for i in range(1, dim + 1)] for j in range(n_planes)]


def hyperplane_lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """LSH bucket id: one sign bit per hyperplane, concatenated to a bit
    string. Vectors in the same bucket are angular-similarity candidates;
    at scale, bucket becomes the shuffle/partition key so candidate search
    is an equi-join instead of a cross join."""
    planes = hyperplane_planes(n_planes, dim)
    bits = []
    for plane in planes:
        plane_col = F.array(*[F.lit(float(c)) for c in plane])
        d = dot(vec, plane_col)
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def hyperplane_lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    return emb.select(
        F.col(id_col),
        hyperplane_lsh_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Product quantization (round 4): the memory-compression layer of IVF-PQ.
# A d-dim vector becomes n_sub small integer codes (nearest codebook entry
# per subspace); search then uses Asymmetric Distance Computation — the
# query stays full-precision, corpus distances are sums of per-subspace
# table lookups. Codebooks here are deterministic (first-k vectors, same
# convention as deterministic_centroids) so every step is SQL-reproducible.
# ---------------------------------------------------------------------------

def _pq_subspaces(vec_col: str, out: str, n_sub: int, sub_dim: int):
    """posexplode a vector into (subspace, sub-vector) rows."""
    slices = F.array(
        *[F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim) for s in range(n_sub)]
    )
    return F.posexplode(slices).alias("subspace", out)


def _pq_dist2(a: str, b: str):
    """In-order left-fold squared L2 between two sub-vectors (mirrored by
    DuckDB's list_sum over list_transform, so doubles are bit-identical)."""
    return F.aggregate(
        F.zip_with(
            F.col(a), F.col(b),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    emb: DataFrame, n_sub: int = 4, sub_dim: int = 16, k: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(cid, subspace, cv): k codebook entries per subspace from the first-k
    vectors by id."""
    cents = emb.orderBy(id_col).limit(k).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cemb")
    )
    return cents.select("cid", _pq_subspaces("cemb", "cv", n_sub, sub_dim))


def pq_encode(
    emb: DataFrame, n_sub: int = 4, sub_dim: int = 16, k: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(id, subspace, code): nearest codebook entry per subspace, argmin
    tie-broken by centroid id. One broadcast join + one window — no
    pairwise corpus expansion at any scale."""
    csub = pq_codebook(emb, n_sub, sub_dim, k, id_col, vec_col)
    sub = emb.select(id_col, _pq_subspaces(vec_col, "v", n_sub, sub_dim))
    d = sub.join(F.broadcast(csub), "subspace").select(
        id_col, "subspace", "cid", _pq_dist2("v", "cv").alias("dist2")
    )
    w = Window.partitionBy(id_col, "subspace").orderBy(
        F.col("dist2").asc(), F.col("cid").asc()
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(id_col, "subspace", F.col("cid").alias("code"))
    )


def pq_adc_topk(
    queries: DataFrame, corpus: DataFrame, n_sub: int = 4, sub_dim: int = 16,
    k_codebook: int = 8, topk: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, a (subspace x code) distance
    table is built against the codebook (tiny, broadcast), then every
    corpus vector's approximate distance is n_sub table lookups added in
    FIXED subspace order (0+1+2+3) so the double is engine-stable.

    Scale shape: the only per-corpus work is an equi-join of the code table
    against the broadcast distance table plus one groupBy — never touches
    raw corpus vectors after encode."""
    codes = pq_encode(corpus, n_sub, sub_dim, k_codebook, id_col, vec_col)
    csub = pq_codebook(corpus, n_sub, sub_dim, k_codebook, id_col, vec_col)
    qsub = queries.select(
        F.col(id_col).alias("q_id"), _pq_subspaces(vec_col, "qv", n_sub, sub_dim)
    )
    dtable = qsub.join(F.broadcast(csub), "subspace").select(
        "q_id", "subspace", "cid", _pq_dist2("qv", "cv").alias("qd")
    )
    per_sub = codes.join(
        F.broadcast(dtable),
        (codes.subspace == dtable.subspace) & (codes.code == dtable.cid),
    ).select(id_col, "q_id", codes.subspace.alias("s"), "qd")
    fixed_sum = None
    for s in range(n_sub):
        term = F.coalesce(F.max(F.when(F.col("s") == s, F.col("qd"))), F.lit(0.0))
        fixed_sum = term if fixed_sum is None else fixed_sum + term
    adc = per_sub.groupBy("q_id", id_col).agg(fixed_sum.alias("adc_dist2"))
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("q_id", id_col, "adc_dist2", "rnk")
    )


def kmeans_lloyd_quantized(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means over integer-quantized embeddings;
    returns the final per-vector assignment (id, cl, d2).

    ``deterministic_centroids`` notes that a float k-means step "is not
    SQL-checkable" — float mean updates depend on summation order. This is
    the checkable form: vectors are quantized to integers (round(x*scale)),
    distances are exact integer sums (associative, order-free), and the
    centroid update is floor(sum/count) per dimension — so every iteration
    is bit-reproducible on any engine and a SQL oracle can replay the whole
    unrolled loop. Quantized k-means is also the production-honest variant:
    IVF/PQ coarse quantizers (Jegou et al., PAMI'11) cluster quantized
    vectors at billion scale for exactly this determinism/compactness.

    Scale shape per iteration: centroids live on the driver (k*d ints) and
    enter the plan as literals — the broadcast every distributed k-means
    uses; assignment is a map-only argmin over the literal centroids; the
    update is one posexplode + groupBy(cl, pos) whose map-side combine
    reduces each partition to k*d partial sums before the shuffle. Nothing
    driver-side ever exceeds k*d. Ties (equal d2) break to the lowest
    cluster id; empty clusters keep their previous centroid.
    """
    q, assign, cents = _kmeans_fit(emb, k, iterations, scale, id_col, vec_col)
    return assign(cents).select("id", "cl", "d2")


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iterations: int = 2,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """The fitted quantized centroids themselves (k lists of d ints) --
    e.g. as the coarse quantizer of an IVF index (the composition IVF-PQ
    systems actually train). Same determinism contract as
    :func:`kmeans_lloyd_quantized`."""
    _, _, cents = _kmeans_fit(emb, k, iterations, scale, id_col, vec_col)
    return cents


def _kmeans_fit(emb, k, iterations, scale, id_col, vec_col):
    q = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: F.round(x * scale).cast("long")).alias("qv"),
    ).localCheckpoint(eager=True)  # reused by every iteration's two passes

    cents = [list(r.qv) for r in q.orderBy("id").limit(k).collect()]

    def assign(centroids):
        # one array-of-arrays literal + a single transform lambda: the
        # unrolled per-centroid form generates k copies of the distance
        # loop in codegen (seconds of Janino compile per pass at k*d=512);
        # this form compiles one loop and iterates the centroid array
        carr = F.array(*[F.array(*[F.lit(int(v)) for v in c]) for c in centroids])
        choices = F.transform(
            carr,
            lambda c, j: F.struct(
                F.aggregate(
                    F.zip_with(F.col("qv"), c, lambda a_, b_: (a_ - b_) * (a_ - b_)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                j.cast("long").alias("cl"),
            ),
        )
        best = F.array_min(choices)
        return q.select("id", "qv", best["cl"].alias("cl"), best["d2"].alias("d2"))

    for _ in range(iterations):
        assigned = assign(cents)
        sums = (
            assigned.select("cl", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cl", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep prior centroid
        for r in sums:
            new[r.cl][r.pos] = r.s // r.n  # python // floors like the oracle
        cents = new

    return q, assign, cents


def kcenter_greedy(
    emb: DataFrame,
    k: int = 8,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, int]]:
    """Greedy k-center / farthest-point traversal (Gonzalez, TCS '85): seed
    with the lowest id, then repeatedly select the point FARTHEST from the
    chosen set — the classic 2-approximation for k-center and the geometric
    diversity selector coreset-based data curation uses (pick the k most
    mutually-distant examples instead of k random ones).

    Returns ``k + 1`` tuples ``(round, center_id, d2_at_selection)``: rounds
    ``0..k-1`` are the selected centers (the seed's d2 is 0), and the extra
    round ``k`` row is the next would-be selection — its d2 IS the exact
    coverage radius² of the chosen set (max-min distance), so the quality of
    the coreset ships with the coreset.

    Same determinism contract as :func:`kmeans_lloyd_quantized`: integer
    quantization, exact integer distances, ties broken to the lowest id — a
    SQL oracle replays the whole unrolled selection. Scale shape per round:
    selected centers enter the plan as literals (<= k*d ints), min-distance
    is a map-only array fold, the argmax is TakeOrdered(1) — k linear
    passes, driver traffic k rows (the algorithm is inherently k-round;
    each round must see the previous pick).
    """
    q = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: F.round(x * scale).cast("long")).alias("qv"),
    ).localCheckpoint(eager=True)  # reused by every round's pass

    seed = q.orderBy("id").limit(1).collect()[0]
    out = [(0, int(seed.id), 0)]
    centers = [list(seed.qv)]
    for rnd in range(1, k + 1):
        carr = F.array(*[F.array(*[F.lit(int(v)) for v in c]) for c in centers])
        mind2 = F.array_min(
            F.transform(
                carr,
                lambda c: F.aggregate(
                    F.zip_with(F.col("qv"), c, lambda a_, b_: (a_ - b_) * (a_ - b_)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
        )
        far = (
            q.select("id", "qv", mind2.alias("d2"))
            .orderBy(F.desc("d2"), F.asc("id"))
            .limit(1)
            .collect()[0]
        )
        out.append((rnd, int(far.id), int(far.d2)))
        centers.append(list(far.qv))
    return out


def ivfpq_search(
    queries: DataFrame,
    corpus: DataFrame,
    n_clusters: int = 16,
    n_probe: int = 4,
    n_sub: int = 4,
    sub_dim: int = 16,
    k_codebook: int = 8,
    shortlist: int = 10,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVF-PQ search (Jegou et al., PAMI'11 — the billion-vector ANN
    stack): coarse quantizer prunes the corpus to the query's ``n_probe``
    clusters, PQ codes give an asymmetric-distance shortlist WITHOUT
    touching raw candidate vectors, and only the ``shortlist`` survivors
    are reranked with exact cosine for the final top-k.

    Composition of the verified pieces: :func:`assign_clusters` (coarse),
    :func:`pq_encode` / :func:`pq_codebook` (compression),
    ADC lookup-sum in fixed subspace order (engine-stable doubles),
    exact rerank. Scale shape: after encode, the per-query work is an
    equi-join on cluster id against the code table plus ``shortlist``
    raw-vector reads — memory ~ codes (n_sub bytes/vector), never
    embeddings. Flat-PQ within IVF (no residual re-encoding): the
    standard memory/recall tradeoff point one notch below residual-PQ."""
    cents = deterministic_centroids(corpus, n_clusters, id_col, vec_col)
    c_assigned = assign_clusters(corpus, cents, id_col, vec_col).select(
        F.col(id_col), F.col("cid")
    )
    q_probes = assign_clusters(queries, cents, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("q_id"), F.col("cid")
    )
    codes = pq_encode(corpus, n_sub, sub_dim, k_codebook, id_col, vec_col)
    csub = pq_codebook(corpus, n_sub, sub_dim, k_codebook, id_col, vec_col)
    qsub = queries.select(
        F.col(id_col).alias("q_id"), _pq_subspaces(vec_col, "qv", n_sub, sub_dim)
    )
    dtable = qsub.join(F.broadcast(csub), "subspace").select(
        "q_id", "subspace", "cid", _pq_dist2("qv", "cv").alias("qd")
    )
    # candidates: codes of vectors living in the query's probed clusters
    cand = q_probes.join(c_assigned, "cid").filter(
        F.col("q_id") != F.col(id_col)
    ).select("q_id", id_col)
    per_sub = (
        cand.join(codes, id_col)
        .join(
            F.broadcast(dtable),
            # qualify every join column: "subspace"/"q_id" exist on BOTH
            # sides here (codes vs dtable, cand vs dtable) and the bare
            # F.col form raises AMBIGUOUS_REFERENCE (same discipline as
            # pq_adc_topk above)
            (codes.subspace == dtable.subspace)
            & (codes.code == dtable.cid)
            & (cand.q_id == dtable.q_id),
        )
        .select(cand.q_id.alias("q_id"), F.col(id_col), codes.subspace.alias("s"), "qd")
    )
    fixed_sum = None
    for s in range(n_sub):
        term = F.coalesce(F.max(F.when(F.col("s") == s, F.col("qd"))), F.lit(0.0))
        fixed_sum = term if fixed_sum is None else fixed_sum + term
    adc = per_sub.groupBy("q_id", id_col).agg(fixed_sum.alias("adc_dist2"))
    w_short = Window.partitionBy("q_id").orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
    short = (
        adc.withColumn("rnk", F.row_number().over(w_short))
        .filter(F.col("rnk") <= shortlist)
        .select("q_id", id_col)
    )
    qv = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
    )
    cv = corpus.select(
        F.col(id_col), F.col(vec_col).alias("nvec"), l2_norm(F.col(vec_col)).alias("nnorm")
    )
    reranked = (
        short.join(F.broadcast(qv), "q_id")
        .join(cv, id_col)
        .select(
            F.col("q_id").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            (dot(F.col("qvec"), F.col("nvec")) / (F.col("qnorm") * F.col("nnorm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for each
    anchor, the top-k most-similar corpus vectors with a DIFFERENT label —
    the negatives that actually move a contrastive loss (easy negatives
    are already far). Same brute-force shape as :func:`knn_bruteforce`
    (anchors broadcast, norms precomputed per side, anchor-partitioned
    top-k window); the IVF family is the scale path for the candidate
    generation when anchors are not a bounded set."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    a = anchors.select(
        F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("avec"),
        F.col(label_col).alias("alabel"), l2_norm(F.col(vec_col)).alias("anorm"),
    )
    c = corpus.repartition(par).select(
        F.col(id_col).alias("negative_id"), F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("clabel"), l2_norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("clabel") != F.col("alabel"))
        .select(
            "anchor_id",
            "negative_id",
            (dot(F.col("avec"), F.col("cvec"))
             / (F.col("anorm") * F.col("cnorm"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def gram_matrix_long(df: DataFrame, vec_col: str, dim: int, scale: int = 1000) -> DataFrame:
    """Exact integer Gram matrix of an embedding column: vectors are
    quantized to ``round(x * scale)`` longs (the k-means device, so any
    engine reproduces the same integers), then G = sum over rows of the
    outer product q q^T, returned as ``(idx, gsum)`` rows with
    ``idx = i * dim + j``.

    The naive formulation explodes d^2 rows per input row (a 4096x row
    blowup at d=64 — 20M rows per 5k vectors, forever linear-in-d^2 on
    the shuffle); this kernel instead computes each Arrow batch's partial
    Gram with ONE integer matmul (numpy/BLAS), ACCUMULATES the partials
    across every batch the invocation sees, and emits d^2 rows once per
    PARTITION. (ADVICE r9: partitions above
    spark.sql.execution.arrow.maxRecordsPerBatch rows span multiple Arrow
    batches, so the earlier per-batch yield made the shuffle
    O(batches * d^2) — accumulating in the kernel makes the claimed
    O(partitions * d^2) bound true by construction.) Partial Grams merge
    by elementwise sum — the map-side-combinable property the final
    groupBy exploits. int64 matmul keeps every partial exact (|q| <=
    scale, so a partition of n rows is bounded per cell by n * scale^2,
    under 2^63 until ~10^13 rows in ONE partition)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            y = np.array(
                [np.asarray(v, dtype=np.float64) * scale for v in pdf["_v"]],
                dtype=np.float64,
            )
            # round half AWAY FROM ZERO — SQL round() semantics on both
            # engines. np.round is banker's (diverges on exact .5), and
            # floor(abs+0.5) over-rounds the largest double BELOW k+0.5
            # (the +0.5 addition itself rounds up to k+1.0); comparing the
            # exact fractional part avoids both traps (a - floor(a) is
            # exact for doubles: Sterbenz for a >= 1, trivially for a < 1)
            a = np.abs(y)
            f = np.floor(a)
            q = (np.sign(y) * (f + (a - f >= 0.5))).astype(np.int64)
            acc += q.T @ q
        if seen:
            yield pd.DataFrame(
                {"idx": np.arange(dim * dim, dtype=np.int64), "gsum": acc.reshape(-1)}
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    partials = (
        df.select(F.col(vec_col).alias("_v"))
        .repartition(par)
        .mapInPandas(kernel, "idx long, gsum long")
    )
    return partials.groupBy("idx").agg(F.sum("gsum").cast("long").alias("gsum"))
