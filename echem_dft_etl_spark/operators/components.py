"""Connected components over near-duplicate pair graphs — the step
that turns pairwise dedup evidence into dedup DECISIONS.

Near-dup detection (``operators/dedup.py``) emits edges: "a duplicates
b". Acting on them — keep one canonical document per duplicate GROUP —
needs the transitive closure: a~b and b~c put a, b, c in one group even
if (a, c) was never emitted as a pair. This generalizes the reference's
per-key upsert dedup (``my_dag.py:201-202``, ``ON CONFLICT (MP_id) DO
NOTHING``) from identical keys to a similarity graph.

Algorithm: iterative **min-label propagation with pointer jumping**
(the hash-to-min family of Kiveris et al., "Connected Components in
MapReduce and Beyond"). Every vertex starts labeled with itself; each
round takes the min label over its neighbors (one shuffle keyed on
vertex), then shortcuts ``label(v) ← label(label(v))`` (a second join),
which squares the propagation distance per round — convergence in
O(log diameter) rounds instead of O(diameter). Dedup components are
near-cliques of duplicates (tiny diameter), so 2-3 rounds is typical;
the loop checks an exact convergence count and stops.

Scale notes (100 TB):

- Every round is hash-partitioned equi-joins on vertex ids — no
  broadcast of anything data-sized, no BNLJ; AQE handles skewed hub
  vertices.
- ``localCheckpoint`` after each round truncates the lineage: without
  it, round k's plan contains k copies of the edge scan and Catalyst
  re-analysis goes quadratic. (On a real cluster with a reliable
  checkpoint dir, ``checkpoint`` swaps in for fault tolerance —
  localCheckpoint trades re-computability for speed, exactly the
  documented trade-off.)
- The label invariant (labels only ever DECREASE, toward the component
  min) makes the convergence test exact: a round that changes nothing
  proves the fixpoint.
"""

from __future__ import annotations

from .guards import require_at_least, require_in_range
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# Storage lifecycle lives in operators/storage.py (public API); the
# underscore aliases remain for this module's historical call sites.
from .storage import persistent_rdd_ids as _persistent_rdd_ids  # noqa: F401
from .storage import release_rdds as _release_rdds
from .storage import scoped_shuffle_width
from .storage import tracked_checkpoint as _tracked_checkpoint


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a",
    dst_col: str = "b",
    max_rounds: int = 20,
    round_stats: list | None = None,
    relax_per_round: int | tuple = 1,
) -> DataFrame:
    """(id, cluster_id): cluster_id = min vertex id reachable in the
    undirected graph. Vertices with no edges are their own cluster.

    ``vertices``: one row per vertex id; ``edges``: undirected pairs
    (each pair listed once in either orientation).

    When ``round_stats`` is a list, one dict per executed round is
    appended — ``{"round", "changed", "n_labels"}`` — so harnesses
    (scripts/scale_probe.py) can record convergence shape and per-round
    label-frame size without re-running the loop. The extra
    distinct-label count only runs when stats are requested.

    ``relax_per_round`` chains N neighbor-min relaxations between
    checkpoints: each relaxation moves labels ONE edge-hop (a join +
    a groupBy over the edge list — linear in |E|, no multi-hop edge
    materialization, so no hub blowup), so N relaxations move them N
    hops per round while paying the round's fixed costs (eager
    checkpoint job, convergence-count job, driver sync) ONCE. Worth
    raising above 1 when the graph has real diameter (chained entity
    matches: 8 one-hop rounds measured at sf0.1); keep N=1 for graphs
    known to converge in 2-3 rounds (LSH dup clusters are
    near-cliques). A TUPLE gives a per-round schedule (the last entry
    repeats): ``(8, 1)`` spends 8 hops on the propagate round, then
    confirms the fixpoint with ONE relaxation — valid because labels
    are monotone under relax, so a single relax+jump that changes no
    label proves the N-hop fixpoint too. That makes the mandatory
    confirm round cost 1 join instead of N (entity resolution:
    2-round floor at sf0.1, the confirm round ~8× cheaper).
    """
    require_at_least("max_rounds", max_rounds, 1)
    # Materialize the (symmetrized) edge set ONCE: every round joins it,
    # and without the checkpoint each round would re-derive the edges'
    # whole upstream lineage — for duplicate_clusters that is the full
    # MinHash pipeline per iteration (measured: ~2s of the per-round
    # cost at sf0.1; at 100 TB it would dominate everything).
    spark = vertices.sparkSession
    # Storage discipline: every checkpoint's pinned blocks are released
    # as soon as they are superseded (previous round) or on exit (edge
    # set); only the FINAL labels checkpoint — which the returned frame
    # reads — stays pinned. All checkpoints here are materialized
    # eagerly, so releasing predecessors never recomputes lineage.
    sym_ids: list = []
    # The union's arms would otherwise each recompute the caller's
    # edge lineage (for duplicate_clusters that is the whole MinHash
    # pipeline — twice, inside one materialization job): pin the edge
    # projection first, symmetrize FROM the pin, release the pin once
    # sym is materialized.
    base_ids: list = []
    base = _tracked_checkpoint(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ),
        base_ids,
    )

    prev_ids: list = []
    labels = _tracked_checkpoint(
        vertices.select(F.col(id_col).alias("v"), F.col(id_col).alias("lbl")),
        prev_ids,
    )
    # Size the LOOP's exchanges to the graph, not the session default
    # (storage.scoped_shuffle_width; measured 14.8 s → 8.9 s for an
    # 8-round run at sf0.1 just from narrowing idle stages, and 24 s
    # vs 9 s at width 8 vs width 1 on the same graph). The count is
    # one cheap job over the already-materialized checkpoint (the same
    # authoring-time-probe class as grouped_percentiles_with_guard).
    # try/finally: failures (no-fixpoint, a mid-round task error) must
    # not leak the edge set or the in-flight round's blocks — leaking
    # on the error path would reintroduce the exact session-lifetime
    # storage growth this bookkeeping exists to prevent; the width
    # restore rides the scoped_shuffle_width context manager.
    converged = False
    try:
        with scoped_shuffle_width(spark, 2 * base.count()) as loop_width:
            # Symmetrized edges PLUS one self-loop per vertex: the
            # self-loop folds the vertex's own label into the neighbor-min
            # aggregate, so each relaxation is join+groupBy only — no
            # per-hop left-join to merge the old label back in. The frame
            # is pre-hash-partitioned on the join key and localCheckpoint
            # PRESERVES that partitioning, so every round's edge side
            # joins exchange-free; only the (much smaller after
            # contraction) label side shuffles.
            sym = _tracked_checkpoint(
                base.union(
                    base.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    )
                )
                .union(labels.select(F.col("v").alias("src"), F.col("v").alias("dst")))
                .repartition(*(
                    (loop_width, "src") if loop_width is not None else ("src",)
                )),
                sym_ids,
            )
            _release_rdds(spark, base_ids)

            # Labels are per-vertex MONOTONE non-increasing (relax takes a
            # min that includes self; jump follows pointers downward), so
            # "no label changed" ⟺ "the label sum is unchanged" — one
            # cheap aggregate over the materialized round result replaces
            # carrying an old_lbl column through every hop. decimal(38,0)
            # keeps the sum exact at any vertex-id scale.
            lbl_sum = F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            prev_sum = labels.agg(lbl_sum).collect()[0][0]
            schedule = (
                (relax_per_round,)
                if isinstance(relax_per_round, int)
                else tuple(relax_per_round)
            )
            for round_no in range(max_rounds):
                cur = labels
                n_hops = schedule[min(round_no, len(schedule) - 1)]
                for _hop in range(n_hops):
                    # 1-hop: min over {self} ∪ neighbors, keyed on dst.
                    cur = (
                        sym.join(cur, sym["src"] == cur["v"])
                        .groupBy("dst")
                        .agg(F.min("lbl").alias("lbl"))
                        .select(F.col("dst").alias("v"), "lbl")
                    )
                # Pointer jump: label(v) <- label(label(v)). Labels are
                # always live vertex ids, so the self-join total-resolves.
                m = cur.select(F.col("v").alias("mv"), F.col("lbl").alias("mlbl"))
                round_ids: list = []
                jumped = _tracked_checkpoint(
                    cur.join(m, cur["lbl"] == m["mv"]).select(
                        "v", F.col("mlbl").alias("lbl")
                    ),
                    round_ids,
                )
                # From here until the promote below, BOTH rounds' ids are
                # in prev_ids, so a throwing action (the stats join needs
                # the previous round's blocks alive) cannot leak either.
                prev_ids.extend(round_ids)
                if round_stats is not None:
                    changed = (
                        jumped.join(
                            labels.select("v", F.col("lbl").alias("prev_lbl")),
                            "v",
                        )
                        .filter(F.col("lbl") != F.col("prev_lbl"))
                        .count()
                    )
                _release_rdds(
                    spark, [i for i in prev_ids if i not in round_ids]
                )
                prev_ids = round_ids
                labels = jumped
                s = jumped.agg(lbl_sum).collect()[0][0]
                if round_stats is not None:
                    round_stats.append(
                        {
                            "round": round_no,
                            "changed": changed,
                            "n_labels": labels.select("lbl").distinct().count(),
                        }
                    )
                if s == prev_sum:
                    converged = True
                    break
                prev_sum = s
            if not converged:
                raise RuntimeError(
                    f"connected_components: no fixpoint in {max_rounds} rounds"
                )
    finally:
        _release_rdds(spark, sym_ids)
        _release_rdds(spark, base_ids)  # no-op unless sym build failed
        if not converged:  # error path: the last round's blocks are dead too
            _release_rdds(spark, prev_ids)
    return labels.select(F.col("v").alias(id_col), F.col("lbl").alias("cluster_id"))


def duplicate_clusters(
    docs: DataFrame, threshold: float = 0.8, round_stats: list | None = None
) -> DataFrame:
    """(doc_id, cluster_id, is_canonical, n_members): transitive
    near-duplicate groups from the MinHash-LSH pair graph, canonical
    survivor = lowest doc_id per group (the engine-wide first-wins
    convention, matching ``first_wins_dedup``).
    """
    from .dedup import near_dup_pairs_minhash

    pairs = near_dup_pairs_minhash(docs, threshold=threshold)
    labels = connected_components(
        docs.select("doc_id"), pairs.select("a", "b"), round_stats=round_stats
    )
    w = F.count("*").over(Window.partitionBy("cluster_id"))
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        w.cast("bigint").alias("n_members"),
    )


def forest_root_depth(
    nodes: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    max_rounds: int = 20,
) -> DataFrame:
    """Flatten a rooted forest: ``(node, root, depth)`` for every node,
    where ``parent`` is NULL at roots — the hierarchy/closure query
    (org charts, bill-of-materials, category trees) that SQL engines
    serve with ``WITH RECURSIVE`` and Spark has no native form for.

    Algorithm: **pointer doubling** over the parent relation treated as
    DATA (never as an arithmetic shortcut): state ``(v, anc, d)``
    starts at each node's parent (roots at themselves, d = 0) and each
    round substitutes ``anc ← anc's anc``, ``d ← d + anc's d`` via one
    equi-join of the state with itself — the known-ancestor distance
    DOUBLES per round, so convergence takes O(log depth) rounds, not
    O(depth) self-joins (the naive recursive-CTE translation). Rows
    whose ancestor is already a root are fixed points; the loop stops
    on an exact zero-changes count.

    Same storage discipline as :func:`connected_components`: per-round
    eager localCheckpoint (else round k's plan contains 2^k state
    scans), previous round's blocks released immediately, error paths
    release the in-flight round. Every round is a hash equi-join on
    node ids — no broadcast of data-sized frames; skewed fan-in (a hub
    parent) is ordinary join skew, absorbed by AQE.
    """
    spark = nodes.sparkSession
    prev_ids: list = []
    state = _tracked_checkpoint(
        nodes.select(
            F.col(id_col).alias("v"),
            F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"),
            F.when(F.col(parent_col).isNull(), 0)
            .otherwise(1)
            .cast("bigint")
            .alias("d"),
        ),
        prev_ids,
    )
    converged = False
    try:
        for _round in range(max_rounds):
            m = state.select(
                F.col("v").alias("mv"),
                F.col("anc").alias("manc"),
                F.col("d").alias("md"),
            )
            round_ids: list = []
            nxt = _tracked_checkpoint(
                state.join(m, state["anc"] == m["mv"]).select(
                    "v",
                    F.col("manc").alias("anc"),
                    (F.col("d") + F.col("md")).alias("d"),
                    (F.col("md") > 0).alias("_moved"),
                ),
                round_ids,
            )
            _release_rdds(spark, prev_ids)
            prev_ids = round_ids
            changed = nxt.filter(F.col("_moved")).count()
            state = nxt.drop("_moved")
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"forest_root_depth: no fixpoint in {max_rounds} rounds"
            )
    finally:
        if not converged:
            _release_rdds(spark, prev_ids)
    return state.select(
        F.col("v").alias(id_col),
        F.col("anc").alias("root"),
        F.col("d").alias("depth"),
    )


def integer_pagerank(
    edges: DataFrame,
    iterations: int = 5,
    node_mass: int = 10**12,
    damp_num: int = 17,
    damp_den: int = 20,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic.

    Floating-point PageRank is not reproducible across engines (or even
    across partitionings: the incoming-contribution sum is a float
    reduction whose order differs), so this variant keeps all mass in
    integers: every node starts with ``node_mass``; each iteration a
    node keeps the base grant ``node_mass * (1-d)`` and receives from
    each in-neighbor ``u`` the share ``mass(u) * d DIV outdeg(u)`` —
    damping ``d = damp_num/damp_den`` applied as integer
    multiply-then-floor-divide, so every intermediate is a bigint and
    the k-step fixpoint is bit-identical in any engine (integer sums
    are order-independent; floor division is deterministic). The
    floor's dropped remainder (< outdeg ulps per node per round) is
    the documented difference from real-valued PageRank — irrelevant
    for ranking at mass 10^12.

    ``edges`` is directed (src, dst); callers symmetrize for
    undirected graphs. Every node must appear as a src (no sinks) —
    symmetric graphs satisfy this by construction.

    Scale shape: per iteration one equi-join of the mass frame with
    the (static, checkpointed) edge list and one dst-keyed
    aggregation — hash-partitioned all the way. The edge side is
    exchanged fresh each round rather than pinned pre-partitioned: a
    per-round exchange is what lets AQE split a hub src's partition
    EVERY round, where a frozen checkpoint partitioning would lock
    the hub into one task for the whole loop. Out-degree is a
    NODE-sized aggregate carried on the mass frame, not joined onto
    the edges: annotating the edge list would cost a second
    edge-scale materialization (the r10 layout, +2 s setup at sf0.1)
    while the per-node column adds one bigint to the small side of
    every join. An eager ``localCheckpoint`` every THIRD round (plus
    the final round) truncates lineage while paying a third of the
    materialization round-trips — three rounds of join+agg lineage is
    well inside planner comfort, and the blocks of the superseded
    checkpoint are released as soon as the next materializes (the
    same storage discipline as :func:`connected_components`). Overflow bound: the binding
    constraint is the per-share multiply ``mass * damp_num`` — in the
    worst case (a sink-like hub) one node can accumulate nearly ALL
    circulating mass ``N * node_mass``, so bigint safety requires
    ``damp_num * N * node_mass < 2^63``: N < ~5e5 at the default
    (mass 10^12, damp_num 17). Scale node_mass down for larger graphs
    — mass 10^9 holds to N < ~5e8 while keeping plenty of ranking
    resolution (the floor remainder stays < outdeg per node-round)."""
    require_at_least("iterations", iterations, 1)
    require_at_least("node_mass", node_mass, 1)
    require_at_least("damp_den", damp_den, 1)
    require_in_range("damp_num", damp_num, 0, damp_den)
    spark = edges.sparkSession
    base = node_mass * (damp_den - damp_num) // damp_den

    owned: list = []
    # SINGLE edge-scale materialization (VERDICT r10 item 1): the
    # caller's edge plan (often a scan + explode + distinct) is pinned
    # exactly once, as-is — no pre-partitioning; each round's join
    # exchanges the pinned blocks at the narrowed loop width, which is
    # both cheaper than a session-width setup repartition at small
    # scale and strictly MORE skew-safe at large scale (AQE re-splits
    # a hub src's partition on every round's exchange, where a frozen
    # checkpoint partitioning would pin the hub to one task for the
    # whole loop). outdeg via groupBy rather than count().over(
    # Window.partitionBy("src")): a window partition cannot be
    # skew-split by AQE at all. The aggregate's result is NODE-sized,
    # so it rides the mass frame through the loop instead of being
    # joined back onto the edge list (the r10 annotate-the-edges
    # layout paid a second edge-scale checkpoint for it, +2 s setup
    # at sf0.1).
    ed = _tracked_checkpoint(edges, owned)
    n_edge_rows = ed.count()
    prev_ids: list = []
    ok = False
    try:
        # Same loop-width discipline as connected_components: size the
        # per-round exchanges to the edge frame, restored on exit
        # (serial-planning assumption documented in
        # storage.scoped_shuffle_width). The count above is one cheap
        # job over the already-pinned blocks.
        with scoped_shuffle_width(spark, n_edge_rows):
            # node set AND out-degree in one pass over the pinned
            # blocks, built at loop width so the per-round left join
            # stays narrow
            nodes = _tracked_checkpoint(
                ed.groupBy(F.col("src").alias("v")).agg(
                    F.count(F.lit(1)).alias("outdeg")
                ),
                owned,
            )
            mass = nodes.select(
                "v", F.lit(node_mass).cast("bigint").alias("mass"), "outdeg"
            )
            for i in range(iterations):
                shares = ed.join(
                    mass, ed["src"] == mass["v"]
                ).select(
                    F.col("dst").alias("v"),
                    # integer multiply-then-DIV, never double division:
                    # damp_num * mass stays < 2^63 for total graph mass
                    # < 5e17, and DIV keeps every bit exact where a
                    # double round-trip loses precision past 2^53
                    F.expr(
                        f"mass * {damp_num} DIV ({damp_den} * outdeg)"
                    ).alias("share"),
                )
                incoming = shares.groupBy("v").agg(
                    F.sum("share").alias("inc")
                )
                mass = nodes.join(incoming, "v", "left").select(
                    "v",
                    (
                        F.lit(base) + F.coalesce(F.col("inc"), F.lit(0))
                    ).cast("bigint").alias("mass"),
                    "outdeg",
                )
                # checkpoint every third round + the final round:
                # localCheckpoint is EAGER, so the blocks of the
                # superseded checkpoint are dead as soon as this
                # returns
                if i % 3 == 2 or i == iterations - 1:
                    round_ids: list = []
                    mass = _tracked_checkpoint(mass, round_ids)
                    _release_rdds(spark, prev_ids)
                    prev_ids = round_ids
        ok = True
        # outdeg was loop plumbing, never part of the contract
        return mass.select("v", "mass")
    finally:
        # statics (edge list, node/outdeg set) are never part of the
        # returned frame — always released; the FINAL round's blocks
        # back the returned frame and stay, except on failure
        _release_rdds(spark, owned)
        if not ok:
            _release_rdds(spark, prev_ids)


def triangle_counts(pairs: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Per-node exact triangle participation counts.

    ``pairs`` is an UNDIRECTED edge list in canonical form (a < b,
    distinct). The naive wedge join (neighbors-of-neighbors) explodes
    on hub nodes — a degree-d node contributes d²/2 wedges, and at
    corpus scale one celebrity vertex is a single-task straggler. The
    classic fix (Schank-Wagner): ORIENT each edge from its
    lower-(degree, id) endpoint to the higher one — a DAG in which
    every out-degree is O(sqrt(m)).

    Triangle closure is the EDGE-ITERATOR form, not the wedge
    self-join: build the oriented out-adjacency list once, attach it
    to both endpoints of every oriented edge (u→v), and intersect —
    ``N+(u) ∩ N+(v)`` are exactly the apexes w with u→w and v→w, so
    each triangle {u,v,w} materializes once, at its unique base edge
    (the DAG's two-out-edge corner). The wedge join would shuffle one
    row per WEDGE (Σ out-deg² — 41 M at sf0.1 for 1.2 M edges, and
    growing with density); the intersection shuffles one row per EDGE
    carrying an O(sqrt(m))-bounded array, with the per-edge wedge work
    done CPU-side inside ``array_intersect`` — measured ~30% faster
    end-to-end at sf0.1 and strictly less shuffle I/O at any scale.
    Found triangles explode to their three corners (base endpoints +
    each apex) for the per-node counts; every step is a
    hash-partitioned equi-join / aggregate — no windows, no broadcast
    of anything graph-sized (adjacency stays sharded by node).

    ``checkpoint`` (default on) materializes the multiply-consumed
    frames once — and r10 halved the round-trips (the pagerank
    treatment, VERDICT r9 item 3): ``pairs`` (feeds the degree count
    and the orientation join; the checkpoint also amortizes the
    caller's construction cost, e.g. a self-join+distinct) and ``adj``
    (the ONE frame the closure needs). ``oriented`` is no longer
    checkpointed — it has exactly one consumer now, because the edge
    probe is re-derived from ``adj`` itself: exploding the adjacency
    array yields the oriented edges WITH the u-side neighbor list
    already attached, so the closure needs a single equi-join (attach
    ``N+(v)``) instead of two. ``pairs`` drops out of the result
    lineage once ``adj`` is built, so its blocks are RELEASED before
    returning — the pinned storage backing the returned frame is
    ``adj`` alone (|V| rows of O(sqrt(m)) arrays ≈ |E| ids). Pass
    ``checkpoint=False`` to keep the fully-lazy lineage.
    """
    spark = pairs.sparkSession
    pair_ids: list = []
    result_ids: list = []  # adj: backs the returned frame
    ok = False
    n_pair_rows = 0
    try:
        if checkpoint:
            pairs = _tracked_checkpoint(pairs, pair_ids)
            # one cheap job over the pinned blocks; sizes the
            # adjacency-build narrowing below
            n_pair_rows = pairs.count()
        # symmetric degree via one exploded scan (not a 2-arm union)
        deg = (
            pairs.select(F.explode(F.array("a", "b")).alias("v"))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )

        da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
        db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
        ranked = pairs.join(da, "a").join(db, "b")
        lower_first = (F.col("deg_a") < F.col("deg_b")) | (
            (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
        )
        oriented = ranked.select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )

        adj = oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
        closure_width = None
        if checkpoint:
            # Width discipline (storage.scoped_shuffle_width): the
            # adjacency build — the ONE eager job here: degree +
            # orient + collect_list over the edge list — pays ~6
            # shuffle stages whose scheduling cost is proportional to
            # width even when partitions are tiny (measured 4.0 s →
            # 3.1 s at sf0.1's 1.2M edges from 32 → 8 idle-stage
            # narrowing; a 100 TB edge list keeps full width). Only
            # this materialization is wrapped: the returned closure
            # plan executes later, at the caller's session width.
            with scoped_shuffle_width(spark, n_pair_rows) as closure_width:
                adj = _tracked_checkpoint(adj, result_ids)

        # Edge probe derived FROM adj: (u, N+(u), v) per oriented edge —
        # the u-side adjacency rides along map-side, so the closure is
        # ONE shuffle join (attach N+(v)) instead of two. The join
        # ships |E| rows carrying an O(sqrt(m)) array + |V| adjacency
        # rows — strictly less wire than the two-join form's
        # |E| + 2|V| array transfers.
        e = adj.select(
            F.col("src").alias("u"),
            F.col("nbrs").alias("nu"),
            F.explode("nbrs").alias("v"),
        )
        av = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nv"))
        if closure_width is not None:
            # Pin the closure join's width into the PLAN: the returned
            # frame executes after this function exits (and after the
            # scoped conf is restored), so session-conf narrowing
            # cannot reach it — instead both join inputs are
            # explicitly hash-partitioned on the probe key at the same
            # graph-sized width, EnsureRequirements adds no further
            # exchange, and the closure's one wide shuffle runs at the
            # width the edge list justifies instead of the session
            # default (r11: 6.56 → 5.82 s min same-session A/B at
            # sf0.1 — the idle-stage story again). The corner count's
            # own exchange stays at session width deliberately: its
            # map-side partial combine shrinks the stream to |V| rows
            # per partition first. At 100 TB the computed width equals
            # the session width, so the pin is a no-op there.
            e = e.repartition(closure_width, "v")
            av = av.repartition(closure_width, "v")
        tri_base = (
            e.join(av, "v")
            .select("u", "v", F.array_intersect("nu", "nv").alias("apexes"))
            .filter(F.size("apexes") > 0)
        )
        # Corner counts via the flat triple explode: an algebraic
        # (node, weight)-struct spelling emits ~40% fewer rows but
        # builds a struct per element in an interpreted transform —
        # A/B-measured SLOWER (5.0 vs 4.65 s min at sf0.1), and the
        # two-branch union spelling re-executes the closure join.
        # Flat bigint rows through a map-side-combined count win.
        corners = tri_base.select(
            F.explode("apexes").alias("w"), "u", "v"
        ).select(F.explode(F.array("u", "v", "w")).alias("v"))
        ok = True
        return corners.groupBy("v").agg(
            F.count("*").cast("bigint").alias("n_triangles")
        )
    finally:
        # pairs is no longer in the returned frame's lineage (adj is
        # the checkpoint root) — always release it; on failure also
        # release the frames that would have backed the returned
        # frame, or they leak for the session lifetime.
        _release_rdds(spark, pair_ids)
        if not ok:
            _release_rdds(spark, result_ids)


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    round_stats: list | None = None,
) -> DataFrame:
    """Multi-source BFS hop distances, bounded at ``max_hops``.

    When ``round_stats`` is a list, one dict per executed expansion
    round is appended — ``{"round", "frontier"}`` (newly discovered
    nodes that round) — so harnesses (scripts/scale_probe.py) can
    record convergence shape without re-running the loop; the counts
    are the ones the loop already computes for eager materialization.

    ``edges`` is an UNDIRECTED canonical edge list (a < b, distinct);
    ``seeds`` a single-column frame of source node ids (hops 0 whether
    or not they touch the graph — mirrors the recursive-CTE oracle).
    Returns ``(v, hops)`` with the MINIMUM hop count per reached node,
    capped at ``max_hops``.

    This is the third iterative-join family member next to
    :func:`connected_components` (label fixpoint) and
    :func:`integer_pagerank` (mass diffusion): level-synchronous
    frontier expansion, the canonical distributed BFS. Per round one
    equi-join of the CURRENT FRONTIER (not the whole visited set)
    against the static symmetrized edge list, one distinct on the
    discovered layer, and one anti-join against the visited set — all
    hash-partitioned equi-joins; nothing graph-sized crosses the
    driver. First discovery IS the minimum distance (level-synchronous
    invariant), so no per-node min-aggregation loop is needed.

    Storage discipline matches the sibling loops: the static edge list
    is checkpointed once and released on exit; each layer is
    checkpointed (its ``count()`` doubles as the eager materialization
    AND the empty-frontier early-exit probe — convergence needs a
    driver-visible boolean, same class as CC's delta count), and layer
    blocks BACK the returned frame, so they are released only on
    failure. Loop exchanges are sized to the edge list, not the
    session default (idle-stage overhead dominates small-graph rounds
    otherwise), and the width is restored on exit.

    At 100 TB the frontier join is the textbook BSP BFS (Pregel's
    shape on vanilla DataFrames); hub fan-out is AQE-split, and the
    per-round state is one layer — O(reached nodes) total across the
    run, never O(edges).
    """
    require_at_least("max_hops", max_hops, 1)
    spark = edges.sparkSession
    sym = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))

    statics: list = []
    layer_ids: list = []
    ok = False
    try:
        sym = _tracked_checkpoint(sym, statics)
        n_sym_rows = sym.count()
        # Width discipline (storage.scoped_shuffle_width): the eager
        # work is the per-round frontier-expansion checkpoints inside
        # this block; the returned union-of-layers plan executes
        # later, at the caller's session width, reading pinned blocks.
        with scoped_shuffle_width(spark, n_sym_rows):
            frontier = _tracked_checkpoint(
                seeds.select(
                    F.col(seeds.columns[0]).cast("bigint").alias("v"),
                    F.lit(0).cast("bigint").alias("hops"),
                ).distinct(),
                layer_ids,
            )
            frontier.count()
            layers = [frontier]
            visited = frontier.select("v")
            for i in range(1, max_hops + 1):
                round_ids: list = []
                nxt = _tracked_checkpoint(
                    frontier.select("v")
                    .join(sym, F.col("v") == F.col("src"))
                    .select(F.col("dst").alias("v"))
                    .distinct()
                    .join(visited, "v", "left_anti")
                    .select("v", F.lit(i).cast("bigint").alias("hops")),
                    round_ids,
                )
                try:
                    n_new = nxt.count()  # eager + convergence probe in one
                except Exception:
                    _release_rdds(spark, round_ids)
                    raise
                if round_stats is not None:
                    round_stats.append({"round": i, "frontier": n_new})
                if n_new == 0:
                    _release_rdds(spark, round_ids)
                    break
                layer_ids.extend(round_ids)
                layers.append(nxt)
                visited = visited.unionAll(nxt.select("v"))
                frontier = nxt
        out = layers[0]
        for lay in layers[1:]:
            out = out.unionAll(lay)
        ok = True
        return out
    finally:
        _release_rdds(spark, statics)
        if not ok:
            _release_rdds(spark, layer_ids)


def kcore_nodes(
    pairs: DataFrame, k: int = 3, rounds: int = 8
) -> DataFrame:
    """Fixed-round k-core peeling: nodes surviving ``rounds`` rounds of
    "drop every node with degree < k, recompute degrees" over an
    undirected edge list (canonical a < b, distinct).

    The k-core is the classic graph-quality filter (spam/link-farm
    pruning keeps the dense core; sparse tendrils fall away), and
    peeling is its textbook distributed form: each round is one
    map-side-combinable degree aggregation plus two dropped-set
    anti-joins that shrink the edge list — cost tracks the SURVIVING
    edges (and the drop side tracks the peel cascade, so AQE
    broadcasts it once the core stabilizes), so rounds get cheaper as
    the graph contracts. Like
    :func:`integer_pagerank`, the round count is FIXED rather than
    converged: a fixed-round fixpoint prefix is bit-identical in any
    engine (and in the unrolled-CTE oracle), where a "loop until no
    change" would make the oracle inexpressible in one SQL statement.
    On graphs this corpus shape produces, peeling stabilizes well
    inside 8 rounds, and the loop EXITS EARLY at a proven fixpoint:
    edge counts are monotone non-increasing under peeling, so an
    unchanged count between two materialization points proves no node
    was dropped in between — in particular not in the first round
    after the earlier point — hence every later round is the identity
    and the early exit is bit-identical to running all ``rounds``
    (what the unrolled oracle does). At corpus scale this is the
    difference between paying the full round budget and paying only
    the cascade's true depth.

    Returns (v, core_degree): the node's degree within the surviving
    subgraph after the final round (NOT its original degree). Storage
    discipline: the edge frame is re-checkpointed every second round
    (the shrink makes later checkpoints cheap), superseded blocks
    released immediately; loop exchanges are sized to the edge list
    (storage.scoped_shuffle_width).
    """
    require_at_least("k", k, 1)
    require_at_least("rounds", rounds, 1)
    spark = pairs.sparkSession
    prev_ids: list = []
    ok = False
    try:
        ed = _tracked_checkpoint(pairs, prev_ids)
        n_edge_rows = ed.count()
        with scoped_shuffle_width(spark, n_edge_rows):
            for i in range(rounds):
                deg = (
                    ed.select(F.explode(F.array("a", "b")).alias("v"))
                    .groupBy("v")
                    .agg(F.count(F.lit(1)).alias("deg"))
                )
                # Filter by the DROPPED set (deg < k) with anti-joins,
                # not the kept set with semi-joins: every edge endpoint
                # appears in deg (deg is computed from ed) and ids are
                # non-null, so "both endpoints kept" ⟺ "neither endpoint
                # dropped" — identical edge set. The dropped side is the
                # peel CASCADE (shrinks toward zero as the core
                # stabilizes), so AQE broadcasts it from runtime size
                # and the surviving edge list is never shuffled for the
                # filter; worst case (first round of a sparse graph) the
                # anti-join degrades to the same shuffled join the
                # semi-join form always paid.
                drop = deg.filter(F.col("deg") < k).select("v")
                ed = (
                    ed.join(
                        drop.select(F.col("v").alias("a")), "a", "left_anti"
                    ).join(
                        drop.select(F.col("v").alias("b")), "b", "left_anti"
                    )
                )
                # checkpoint every second round + the final round: the
                # peel's lineage otherwise stacks two joins + an agg
                # per round, and the frame only ever SHRINKS, so later
                # materializations are cheap
                if i % 2 == 1 or i == rounds - 1:
                    round_ids: list = []
                    ed = _tracked_checkpoint(ed, round_ids)
                    _release_rdds(spark, prev_ids)
                    prev_ids = round_ids
                    # the count over the fresh blocks doubles as the
                    # convergence probe (docstring: equal counts
                    # across any gap prove the fixpoint, so breaking
                    # here cannot change the result)
                    n_now = ed.count()
                    if n_now == n_edge_rows:
                        break
                    n_edge_rows = n_now
            out = (
                ed.select(F.explode(F.array("a", "b")).alias("v"))
                .groupBy("v")
                .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
            )
        ok = True
        # the FINAL round's blocks back the returned frame and stay
        return out
    finally:
        if not ok:
            _release_rdds(spark, prev_ids)


def coreness_grid(
    pairs: DataFrame, ks: tuple = (60, 80, 90), rounds: int = 8
) -> DataFrame:
    """Graded coreness over a fixed k-grid: (v, coreness) for EVERY
    node, where coreness = the largest grid value k such that v
    survives fixed-round k-core peeling (0 if below the smallest).

    This turns :func:`kcore_nodes`' boolean quality filter into the
    graded signal production dedup pipelines rank with (keep grade-80
    pages outright, down-weight grade-60, drop grade-0 tendrils).

    The scale property is NESTING: k-cores satisfy core_{k+1} ⊆
    core_k, and the k-core of any subgraph containing core_k(G)
    equals core_k(G) — so each grade peels the PREVIOUS grade's
    surviving edge list, not the original graph. The expensive first
    grade pays the full edge list once; every later grade starts from
    an already-contracted graph (at corpus shape, grade 2+ inputs are
    a fraction of the original edges), instead of ``len(ks)``
    independent full-graph peels. Round counts are FIXED per grade
    (the kcore_nodes / integer_pagerank design) so the result is
    bit-identical to the unrolled-CTE oracle, with the same proven
    early exits: an unchanged edge count mid-grade proves that
    grade's fixpoint, and a zero edge count proves every HIGHER grade
    is empty (peeling an empty graph is the identity), so the loop
    stops outright.

    Storage discipline matches kcore_nodes: per-grade checkpoints
    every second round with tracked release of superseded blocks; the
    blocks backing each grade's survivor frame (and the base edges,
    which back the grade-0 node set) live until the caller drops the
    returned frame.
    """
    require_at_least("rounds", rounds, 1)
    if not ks or list(ks) != sorted(set(ks)) or min(ks) < 1:
        raise ValueError(
            f"ks must be strictly ascending positive grades, got {ks!r}"
        )
    spark = pairs.sparkSession
    keep_ids: list = []  # blocks the RETURNED frame depends on
    ok = False

    # no per-frame distinct(): every (v, grade) stream feeds ONE final
    # max-aggregate whose map-side partial combine collapses duplicates
    # before the single shuffle — five distincts' worth of exchanges
    # replaced by one (measured ~5 s at sf0.1)
    def _nodes(ed):
        return ed.select(F.explode(F.array("a", "b")).alias("v"))

    try:
        ed = _tracked_checkpoint(pairs, keep_ids)
        n_edges = ed.count()
        grades = [_nodes(ed).select("v", F.lit(0).alias("grade"))]
        with scoped_shuffle_width(spark, n_edges):
            for k in ks:
                if n_edges == 0:
                    break  # higher grades peel an empty graph: empty
                loop_ids: list = []
                cur = n_edges
                for i in range(rounds):
                    deg = (
                        ed.select(F.explode(F.array("a", "b")).alias("v"))
                        .groupBy("v")
                        .agg(F.count(F.lit(1)).alias("deg"))
                    )
                    # dropped-set anti-join: see kcore_nodes — same
                    # edge set, but the (cascade-sized) drop side is
                    # AQE-broadcastable so the surviving edges are not
                    # shuffled for the filter
                    drop = deg.filter(F.col("deg") < k).select("v")
                    ed = ed.join(
                        drop.select(F.col("v").alias("a")), "a", "left_anti"
                    ).join(
                        drop.select(F.col("v").alias("b")), "b", "left_anti"
                    )
                    if i % 2 == 1 or i == rounds - 1:
                        round_ids: list = []
                        ed = _tracked_checkpoint(ed, round_ids)
                        _release_rdds(spark, loop_ids)
                        loop_ids = round_ids
                        n_now = ed.count()
                        if n_now == cur:
                            break
                        cur = n_now
                # this grade's final blocks back its survivor frame
                keep_ids.extend(loop_ids)
                n_edges = cur
                if cur > 0:
                    grades.append(
                        _nodes(ed).select("v", F.lit(k).alias("grade"))
                    )
            out = grades[0]
            for g in grades[1:]:
                out = out.unionByName(g)
            out = out.groupBy("v").agg(
                F.max("grade").cast("bigint").alias("coreness")
            )
        ok = True
        return out
    finally:
        if not ok:
            _release_rdds(spark, keep_ids)


def label_communities(
    pairs: DataFrame, rounds: int = 3, checkpoint_every: int = 0
) -> DataFrame:
    """Fixed-round SYNCHRONOUS label propagation (LPA, Raghavan et
    al. 2007) over an undirected edge list (canonical a < b,
    distinct): every node starts labeled with itself; each round it
    adopts the most frequent label among its NEIGHBORS, ties broken
    toward the smallest label. Where :func:`connected_components`
    answers "which nodes are reachable" (one label per component),
    LPA finds MESOSCALE structure — densely intra-connected regions
    inside a connected graph — the granularity corpus stratification
    and per-community quality scoring act on.

    Determinism and oracle form: synchronous updates (every round
    reads only the previous round's labels) plus the count-then-min
    tie-break make each round a pure function of the last — no
    update-order dependence, so a FIXED round count is bit-identical
    to the unrolled-CTE oracle in any engine (the integer_pagerank /
    kcore_nodes design; asynchronous LPA, by contrast, is
    schedule-dependent and unverifiable). LPA on dense graphs can
    oscillate under synchronous updates; a fixed prefix sidesteps
    non-termination by construction — the returned labeling is
    "after R rounds" semantics, which is what a bounded production
    pass runs anyway.

    Scale shape: per round one hash equi-join (labels onto the static
    symmetric edge list, both sides keyed on node ids — AQE splits
    hub-node skew and may broadcast the label side from RUNTIME
    size, the sanctioned mechanism) and two map-side-combinable
    aggregations ((node, label) counts, then per-node argmax via one
    ``max(struct(count, -label))`` — no window over node partitions).
    Round 1 is computed in CLOSED FORM: identity starting labels over
    a distinct edge list mean every neighbor label occurs exactly
    once, so the count-then-min argmax is just ``min(neighbor id)`` —
    one aggregation instead of the initial distinct-label build plus
    the first join and both first-round aggregations (interleaved A/B
    at sf0.1: 6.46 → 5.38 s min-of-4 through x05_label_communities).
    Per-round wire cost is O(E) label rows — never the text, never
    pairs of anything.

    Storage: at the default ``checkpoint_every=0`` the WHOLE loop is
    one lazy plan — for a shallow fixed prefix that is one job, with
    the 2·rounds references to the pair construction collapsing to a
    single runtime stage via ReusedExchange (measured 8.9 s vs 13.3 s
    for the per-round-eager form at sf0.1: the eager loop pays
    rounds+1 job submissions and block writes that a bounded-depth
    lineage never needs — the OPPOSITE trade to connected_components,
    whose data-dependent round count grows lineage unboundedly).
    For deep prefixes pass ``checkpoint_every`` (the CC discipline:
    tracked checkpoints, superseded blocks released immediately).

    Returns ``(v, community, community_size)``.
    """
    require_at_least("rounds", rounds, 1)
    require_at_least("checkpoint_every", checkpoint_every, 0)
    spark = pairs.sparkSession
    owned: list = []
    ok = False
    try:
        sym = pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        labels = None
        for i in range(rounds):
            if i == 0:
                # Round 1 in closed form: labels start as the identity
                # over a DISTINCT edge list, so every neighbor label
                # occurs exactly once and the count-then-min argmax
                # reduces to the minimum neighbor id — one
                # map-side-combinable aggregation replaces the initial
                # distinct-label build, the first join and both
                # first-round aggregations. Exact: sym is symmetric, so
                # groupBy(dst) covers every node, matching the old
                # distinct-over-src node set.
                labels = sym.groupBy("dst").agg(F.min("src").alias("label"))
            else:
                cnt = (
                    sym.join(
                        labels.select(F.col("dst").alias("src"), "label"),
                        "src",
                    )
                    .groupBy("dst", "label")
                    .agg(F.count(F.lit(1)).alias("c"))
                )
                labels = (
                    cnt.groupBy("dst")
                    .agg(
                        F.max(
                            F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                        ).alias("m")
                    )
                    .select("dst", (-F.col("m")["nl"]).alias("label"))
                )
            if checkpoint_every and i % checkpoint_every == checkpoint_every - 1:
                round_ids: list = []
                labels = _tracked_checkpoint(labels, round_ids)
                _release_rdds(spark, owned)
                owned = round_ids
        labels = labels.select(F.col("dst").alias("v"), "label")
        sizes = labels.groupBy("label").agg(
            F.count(F.lit(1)).cast("bigint").alias("community_size")
        )
        out = labels.join(sizes, "label").select(
            "v",
            F.col("label").cast("bigint").alias("community"),
            "community_size",
        )
        ok = True
        # any final checkpoint blocks back the returned frame and stay
        return out
    finally:
        if not ok:
            _release_rdds(spark, owned)
