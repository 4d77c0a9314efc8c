"""Graph analytics over extracted KG triples (engine additions beyond the
reference — the queries a KG consumer runs once the triples exist: node
importance, degree structure).

Reference parity note: the reference (kiran94/dgraphpandas) emits triples
and stops; these operators consume the (subject, predicate, object) edge
tables the engine extracts (see operators/canonicalize.py for the
construction side).  Architecture mirrors ``dedup.connected_components``:
fixed/driver-bounded iteration over DataFrames, a checkpoint per round to
truncate lineage (``localCheckpoint`` by default, reliable
``checkpoint(dir)`` when ``checkpoint_dir`` is passed — see
operators/checkpointing.py), labels/ranks shuffled — never payloads.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import make_checkpointer


def pagerank(
    edges: DataFrame,
    src: str = 'src',
    dst: str = 'dst',
    iters: int = 3,
    damping: float = 0.85,
    ndigits: int = 6,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.  Returns
    DataFrame[id, pr].

    Deterministic and oracle-replayable by construction: rank vectors are
    rounded to ``ndigits`` after every iteration, so floating-point error
    cannot propagate between engines (the same re-synchronization trick as
    the k-means quantizer in simsearch.train_ivf_centroids) — a DuckDB
    oracle unrolls the same ``iters`` rounds as CTEs and matches exactly.

    Scale shape (the 100 TB story): per iteration ONE shuffle-join of
    (src, pr/outd) contributions against the edge list keyed on src and
    ONE shuffle-agg summing contributions by dst — both key+double rows,
    never payloads.  The edge list is checkpointed once (``checkpoint_dir``
    selects reliable vs local — operators/checkpointing.py) and AQE
    handles hub-node skew in the join (hubs
    are the web's power-law reality).  Dangling nodes (no out-edges)
    contribute no redistributed mass — the standard simplification; feed
    symmetrized edges if every node must have out-degree ≥ 1.  The single
    driver-side action is the node count (one long).
    """
    ckpt = make_checkpointer(checkpoint_dir)
    e = edges.select(F.col(src).alias('src'), F.col(dst).alias('dst'))
    nodes = ckpt(
        e.select(F.col('src').alias('id'))
        .unionByName(e.select(F.col('dst').alias('id')))
        .distinct()
    )
    n = nodes.count()
    outd = e.groupBy('src').agg(F.count('*').alias('outd'))
    ed = ckpt(e.join(outd, 'src'))

    # both engines compute 1.0/n and (1-d)/n in IEEE double identically;
    # the oracle interpolates repr(damping)/repr(1-damping) verbatim
    pr = nodes.withColumn('pr', F.lit(1.0) / F.lit(float(n)))
    base = F.lit(1.0 - damping) / F.lit(float(n))
    for _ in range(iters):
        # per-dst sums quantized to integer pico-units before aggregation
        # — double addition is order-dependent across engines' partial
        # aggregates and can flip the 6-dp round at a half-ulp boundary
        # on high-in-degree nodes (see pagerank_weighted); integer sums
        # are order-free
        contrib = (
            ed.join(pr.withColumnRenamed('id', 'src'), 'src')
            .select(
                F.col('dst').alias('id'),
                F.round(F.col('pr') / F.col('outd') * 1e12, 0).cast('long').alias('c_pico'),
            )
        )
        sums = contrib.groupBy('id').agg((F.sum('c_pico') / 1e12).alias('s'))
        # integer-space final quantize — see pagerank_weighted for why
        # round(x, ndigits) is NOT engine-consistent at decimal-fraction
        # boundaries while round-to-integer is
        scale = F.lit(float(10 ** ndigits))
        pr = (
            nodes.join(sums, 'id', 'left')
            .select(
                'id',
                (
                    F.round(
                        (base + F.lit(damping) * F.coalesce(F.col('s'), F.lit(0.0)))
                        * scale,
                        0,
                    ).cast('long')
                    / scale
                ).alias('pr'),
            )
        )
        pr = ckpt(pr, eager=False)
    return pr


def pagerank_weighted(
    edges: DataFrame,
    src: str = 'src',
    dst: str = 'dst',
    weight: str = 'weight',
    teleport: DataFrame | None = None,
    iters: int = 3,
    damping: float = 0.85,
    ndigits: int = 6,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Weighted / personalized PageRank over a weighted edge list —
    the ranking pass a KG consumer runs over the co-occurrence
    projection (``bipartite_project`` output), where edge multiplicity
    matters and the walk should restart near entities of interest.
    Returns DataFrame[id, pr].

    - **weighted**: a node's rank mass splits across out-edges in
      proportion to ``weight`` (contribution = pr·w / Σw(src)) instead
      of uniformly.  Keep weights INTEGER (co-occurrence counts are) —
      the per-src weight sums then stay exact on every engine; float
      weights would make Σw order-dependent across partial aggregates.
    - **personalized**: ``teleport`` is DataFrame[id, t] of restart
      weights (any positive integers — normalized by their sum; nodes
      absent from it get 0 restart mass, the true PPR semantics; ids
      must be UNIQUE — a duplicate id would fan out the node row in the
      teleport join).
      ``None`` means uniform 1/n — plain weighted PageRank.  The start
      vector pr₀ IS the normalized teleport vector.

    Determinism contract (same quantize-per-round trick as ``pagerank``
    /k-means): ranks are rounded to ``ndigits`` after every iteration;
    the teleport normalization is a single exact-integer division, so a
    DuckDB oracle unrolling the same rounds matches bit-for-bit.

    Scale shape: identical to ``pagerank`` — per iteration ONE
    shuffle-join of (src, pr·w/Σw) contributions keyed on src and ONE
    shuffle-agg by dst, key+double rows only; edge list and teleport
    vector are checkpointed once (``checkpoint_dir`` selects reliable vs
    local); dangling mass is not
    redistributed (standard simplification; symmetrized input — the
    projection is symmetrized — has none).  The only driver actions are
    the node count and the 1-row teleport total.
    """
    # checkpoint the edge list FIRST: nodes/wout/ed/teleport all derive
    # from it, and an upstream that is itself expensive (the bipartite
    # projection) would otherwise be recomputed once per consumer
    ckpt = make_checkpointer(checkpoint_dir)
    e = ckpt(edges.select(
        F.col(src).alias('src'), F.col(dst).alias('dst'), F.col(weight).alias('w')
    ))
    nodes = ckpt(
        e.select(F.col('src').alias('id'))
        .unionByName(e.select(F.col('dst').alias('id')))
        .distinct()
    )
    wout = e.groupBy('src').agg(F.sum('w').alias('wout'))
    ed = ckpt(e.join(wout, 'src'))

    if teleport is None:
        n = nodes.count()
        tvec = ckpt(nodes.withColumn('t', F.lit(1.0) / F.lit(float(n))))
    else:
        tid, tw = teleport.columns[0], teleport.columns[1]
        tp = teleport.select(F.col(tid).alias('id'), F.col(tw).alias('tw'))
        total = tp.agg(F.sum('tw')).first()[0]
        if not total:
            raise ValueError('teleport weights must sum to a positive value')
        tvec = ckpt(
            nodes.join(tp, 'id', 'left')
            .select('id', (F.coalesce(F.col('tw'), F.lit(0)) / F.lit(total)).alias('t'))
        )

    base = F.lit(1.0 - damping)
    pr = tvec.select('id', F.col('t').alias('pr'))
    for _ in range(iters):
        # contributions are quantized to integer PICO-units before the
        # per-dst sum (the unigram_logprob precedent): double addition is
        # not associative, so an unquantized Σ(pr·w/wout) depends on
        # partial-aggregate order — Spark's partials vs another engine's
        # scan order can flip the final quantize at a half-ulp boundary
        # on high-in-degree nodes; integer sums are order-free.  1e12
        # scale leaves ~1e5 in-degree of headroom under the 0.5e-6
        # rounding slack.
        contrib = (
            ed.join(pr.withColumnRenamed('id', 'src'), 'src')
            .select(
                F.col('dst').alias('id'),
                F.round(F.col('pr') * F.col('w') / F.col('wout') * 1e12, 0)
                .cast('long')
                .alias('c_pico'),
            )
        )
        sums = contrib.groupBy('id').agg((F.sum('c_pico') / 1e12).alias('s'))
        # final quantize in INTEGER space (×10^ndigits → round-to-integer
        # → ÷10^ndigits), not round(x, ndigits): the integer boundary X.5
        # is always exactly representable, so the half-up decision is
        # engine-consistent for ANY input double, whereas a
        # decimal-fraction boundary like 0.5153125 is NOT a double and
        # engines whose decimal rounding goes through shortest-string
        # conversion (Spark's BigDecimal.valueOf) can disagree with
        # arithmetic rounding about which side a value sits on
        scale = F.lit(float(10 ** ndigits))
        pr = (
            tvec.join(sums, 'id', 'left')
            .select(
                'id',
                (
                    F.round(
                        (
                            base * F.col('t')
                            + F.lit(damping) * F.coalesce(F.col('s'), F.lit(0.0))
                        )
                        * scale,
                        0,
                    ).cast('long')
                    / scale
                ).alias('pr'),
            )
        )
        pr = ckpt(pr, eager=False)
    return pr


def label_propagation(
    edges: DataFrame,
    src: str = 'src',
    dst: str = 'dst',
    iters: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label-propagation community detection (Raghavan et al. 2007) made
    fully deterministic: every node starts labeled with its own id; each
    round every node adopts the plurality label over its neighbors PLUS
    ITSELF (the self-vote damps the label-swapping oscillation pure
    synchronous LPA exhibits on bipartite graphs), ties broken by
    minimum label; ``iters`` is fixed (no convergence test) so both
    engines run the identical unrolled recurrence.  Returns
    DataFrame[id, label].

    All-integer/string arithmetic — counts and lexicographic min only,
    no floats — so the DuckDB oracle needs no quantization at all: the
    recurrence is exactly replayable by construction.

    Scale shape: the (symmetrized, distinct) adjacency is checkpointed
    once; per round ONE shuffle-join of labels against the adjacency
    (key + label rows only — payloads never move), ONE (node, label)
    HashAggregate with map-side combine, and one row_number window per
    node.  Hub skew lands in the join and the window the same way it
    does for pagerank — AQE splits the join; the per-node candidate
    label set is bounded by degree.
    """
    from pyspark.sql import Window

    ckpt = make_checkpointer(checkpoint_dir)
    und = (
        edges.select(F.col(src).alias('a'), F.col(dst).alias('b'))
        .unionByName(edges.select(F.col(dst).alias('a'), F.col(src).alias('b')))
        .distinct()
    )
    nodes = und.select(F.col('a').alias('id')).distinct()
    voters = ckpt(
        und.unionByName(nodes.select(F.col('id').alias('a'), F.col('id').alias('b')))
        .distinct()
    )
    labels = nodes.select('id', F.col('id').alias('label'))
    w = Window.partitionBy('id').orderBy(F.desc('c'), F.asc('label'))
    for _ in range(iters):
        votes = (
            voters.join(labels.select(F.col('id').alias('b'), 'label'), 'b')
            .select(F.col('a').alias('id'), 'label')
            .groupBy('id', 'label')
            .agg(F.count('*').alias('c'))
        )
        labels = (
            votes.withColumn('rn', F.row_number().over(w))
            .filter(F.col('rn') == 1)
            .select('id', 'label')
        )
        labels = ckpt(labels, eager=False)
    return labels


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    src: str = 'src',
    dst: str = 'dst',
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded-depth BFS: minimum hop distance (0..k) from the seed set
    for every reachable node.  Returns DataFrame[id, hop].

    The KG use: neighborhood expansion around an entity ("everything
    within 3 hops of this tool") — the query Dgraph answers with a
    recurse block; here it is k driver-bounded rounds of
    frontier-join + anti-join, the same iterate-on-DataFrames shape as
    ``pagerank``/``dedup.connected_components``.

    Scale shape: per hop ONE equi-join of the current frontier against
    the edge list keyed on ``src`` (AQE broadcasts the frontier while it
    is small — the common case for entity neighborhoods) and ONE
    anti-join against the visited set — both shuffle node-id strings
    only, never payloads.  Frontiers are checkpointed per round
    (``checkpoint_dir`` selects reliable vs local) so lineage stays O(1); k is
    a driver constant, so there are no data-dependent driver actions at
    all — the whole expansion is one lazy plan per hop.
    """
    ckpt = make_checkpointer(checkpoint_dir)
    e = edges.select(F.col(src).alias('src'), F.col(dst).alias('dst'))
    frontier = ckpt(seeds.select(F.col(seeds.columns[0]).alias('id')).distinct())
    visited = frontier.withColumn('hop', F.lit(0))
    for h in range(1, k + 1):
        frontier = ckpt(
            e.join(frontier.withColumnRenamed('id', 'src'), 'src')
            .select(F.col('dst').alias('id'))
            .distinct()
            .join(visited.select('id'), 'id', 'left_anti')
        )
        visited = visited.unionByName(frontier.withColumn('hop', F.lit(h)))
    return visited


def bipartite_project(
    edges: DataFrame,
    src: str = 'src',
    dst: str = 'dst',
    max_src_degree: int | None = 1000,
) -> DataFrame:
    """Project a bipartite edge list onto the ``dst`` side: two dst nodes
    are connected iff they share a src, weighted by the number of DISTINCT
    shared srcs.  Returns DataFrame[a, b, weight] with ``a < b``
    (undirected, each pair once).

    The KG use: a conversation↔tool graph projects to a tool co-usage
    graph ("which tools appear in the same conversations") — the standard
    entity-affinity view.

    Scale shape: the projection is the textbook bipartite explosion — a
    src with degree d emits d² pairs, so one hot conversation touching
    10^5 tools would emit 10^10 rows.  ``max_src_degree`` is therefore ON
    by default (same pattern as dedup's ``max_df`` hot-shingle guard):
    srcs above the cap are dropped from the projection via a key-only
    aggregate + broadcast-friendly anti-join BEFORE the self-join.  The
    self-join itself is an equi-join on src (never all-pairs); the final
    weight rollup is a hash-groupBy on the (a, b) pair with map-side
    partials.  Edges are deduped to DISTINCT (src, dst) first so weight
    counts conversations, not event multiplicity.
    """
    e = edges.select(F.col(src).alias('src'), F.col(dst).alias('dst')).distinct()
    if max_src_degree is not None:
        hot = (
            e.groupBy('src')
            .agg(F.count('*').alias('d'))
            .filter(F.col('d') > max_src_degree)
            .select('src')
        )
        e = e.join(hot, 'src', 'left_anti')
    a = e.select('src', F.col('dst').alias('a'))
    b = e.select('src', F.col('dst').alias('b'))
    return (
        a.join(b, 'src')
        .filter(F.col('a') < F.col('b'))
        .groupBy('a', 'b')
        .agg(F.count('*').alias('weight'))
    )


def triangle_count(pairs: DataFrame, a: str = 'a', b: str = 'b') -> DataFrame:
    """Count triangles in an undirected edge list given as canonical
    ``a < b`` pairs.  Returns a single-row DataFrame[n_triangles].

    Classic two-join formulation over the DIRECTED acyclic orientation
    (edges point low→high), which counts each triangle exactly once and
    caps the join fan-out by out-degree: wedges = e(x,y)⋈e(y,z), closed
    by probing e(x,z).  Both joins are equi-joins; at web scale the
    orientation trick is what keeps hub nodes from exploding (a hub's
    fan-out is its HIGHER-id neighbors only — the standard
    degree-ordering refinement would order by degree instead of id and
    is a drop-in swap of the comparison key).
    """
    e = pairs.select(F.col(a).alias('x'), F.col(b).alias('y'))
    wedge = (
        e.join(e.select(F.col('x').alias('y'), F.col('y').alias('z')), 'y')
        .select('x', 'y', 'z')
    )
    closed = wedge.join(
        e.select(F.col('x').alias('x'), F.col('y').alias('z')), ['x', 'z']
    )
    return closed.agg(F.count('*').alias('n_triangles'))


def degree_stats(edges: DataFrame, src: str = 'src', dst: str = 'dst') -> DataFrame:
    """Per-node (out_degree, in_degree) — one shuffle each side, full-outer
    merged on id.  Returns DataFrame[id, out_degree, in_degree]."""
    out = edges.groupBy(F.col(src).alias('id')).agg(F.count('*').alias('out_degree'))
    inn = edges.groupBy(F.col(dst).alias('id')).agg(F.count('*').alias('in_degree'))
    return (
        out.join(inn, 'id', 'full_outer')
        .select(
            'id',
            F.coalesce('out_degree', F.lit(0)).alias('out_degree'),
            F.coalesce('in_degree', F.lit(0)).alias('in_degree'),
        )
    )


def index_nodes(nodes: DataFrame, id_col: str = 'id', n_buckets: int = 64) -> DataFrame:
    """Assign every node a dense, deterministic integer index [0, n) WITHOUT
    a global sort: nodes hash into ``n_buckets`` buckets; per-bucket counts
    (one tiny aggregate) become driver-side prefix offsets; the final index
    is offset[bucket] + row_number within the bucket — the per-bucket
    window is PARTITIONED, so every bucket sorts in parallel.  The classic
    two-pass dense-id assignment (what zipWithIndex does under the hood,
    expressed in DataFrame ops so an oracle can replay it).  Returns
    DataFrame[id, idx].
    """
    from pyspark.sql import Window

    # md5-derived bucket (not xxhash64): every hash in this operator is
    # md5 so a DuckDB oracle reproduces the identical indices and draws
    # (same convention as operators/dedup.py)
    b = (
        F.conv(F.substring(F.md5(F.col(id_col).cast('binary')), 1, 8), 16, 10)
        .cast('long') % n_buckets
    ).cast('int')
    with_b = nodes.select(F.col(id_col).alias('id')).distinct().withColumn('__b', b)
    counts = {r['__b']: r['c'] for r in with_b.groupBy('__b').agg(F.count('*').alias('c')).collect()}
    offsets, acc = {}, 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]
    off_expr = None
    for bk, off in offsets.items():
        off_expr = F.when(F.col('__b') == bk, F.lit(off)) if off_expr is None else off_expr.when(F.col('__b') == bk, F.lit(off))
    w = Window.partitionBy('__b').orderBy('id')
    return with_b.select(
        'id',
        (off_expr + F.row_number().over(w) - 1).cast('long').alias('idx'),
    )


def negative_sample(
    edges: DataFrame,
    nodes: DataFrame,
    k: int = 2,
    seed: int = 42,
    src: str = 'subject',
    rel: str = 'predicate',
    dst: str = 'object',
    strict: bool = False,
) -> DataFrame:
    """Corrupt-tail negative sampling for KG-embedding training (TransE
    et al.): each positive edge emits ``k`` negatives whose tail is a
    deterministic pseudo-random node ≠ the true tail.  Returns
    DataFrame[subject, predicate, object, neg_idx, neg_object].

    Determinism: the draw is ``md5(edge || i || seed) mod n`` (md5, not
    xxhash64 — reproducible in any SQL engine) — stable under
    re-runs/retries (no rand()); a collision with the TRUE tail is
    resolved by one linear probe (+1 mod n), which lands on a different
    node because indices are dense and unique (n ≥ 2 required).

    Scale shape: node indexing is the two-pass parallel assignment
    (``index_nodes``); the k-fan-out is a posexplode of a constant
    sequence (narrow); resolving draws to node strings is ONE equi-join
    against the index table keyed on idx (AQE broadcasts it while the
    node universe fits — for web-scale universes it is a co-partitioned
    shuffle join, still never all-pairs).

    Contract: every edge tail must appear in ``nodes`` — the tail join is
    INNER, so an edge whose object is missing from the node universe is
    silently dropped from the output.  Pass ``strict=True`` to detect
    that instead: a left-anti probe (one metadata-scale action) raises
    ValueError naming the dangling-tail count.
    """
    idx = index_nodes(nodes)
    n = idx.count()
    if n < 2:
        raise ValueError('negative sampling needs >= 2 distinct nodes')
    if strict:
        n_dangling = (
            edges.select(F.col(dst).alias('id')).join(idx, 'id', 'left_anti').count()
        )
        if n_dangling:
            raise ValueError(
                f'negative_sample: {n_dangling} edge(s) have tails missing from '
                f'nodes and would be silently dropped (strict=True)'
            )

    fan = edges.select(
        src, rel, dst,
        F.posexplode(F.array(*[F.lit(i) for i in range(k)])).alias('neg_idx', '__i'),
    ).drop('__i')
    key = F.concat_ws('|', F.col(src), F.col(rel), F.col(dst),
                      F.col('neg_idx').cast('string'), F.lit(str(seed)))
    draw = (
        F.conv(F.substring(F.md5(key.cast('binary')), 1, 8), 16, 10).cast('long') % n
    )
    with_true = fan.join(
        idx.select(F.col('id').alias(dst), F.col('idx').alias('__true_idx')), dst
    )
    resolved = with_true.withColumn(
        '__neg_idx_node',
        F.when(draw == F.col('__true_idx'), (draw + 1) % n).otherwise(draw),
    )
    return (
        resolved.join(
            idx.select(F.col('idx').alias('__neg_idx_node'), F.col('id').alias('neg_object')),
            '__neg_idx_node',
        )
        .select(src, rel, dst, 'neg_idx', 'neg_object')
    )
