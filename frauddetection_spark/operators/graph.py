"""Graph semantics over plain edge-list DataFrames.

The reference keeps three graph representations (networkx per-window
call graphs, .npy edge arrays, DGL multi-relation graphs — SURVEY §1.1).
This engine's canonical representation is an edge-list DataFrame
``(src: long, dst: long)`` plus node DataFrames keyed by id; every graph
operation is a join + aggregate, so it shuffles instead of materializing
adjacency in driver RAM and scales to the reference's 7M-edge relations
and far beyond.

Reference parity:
- gather/scatter message passing  → `aggregate_messages`
  (DGL update_all(u_mul_e, sum), new_model_1.py:24-36; propagate,
  src/layers.py:85-100)
- common-neighbor similarity join → `common_neighbor_pairs`
  (buildLSN, data_process.py:20-48 — O(n²·set-intersect) python loop
  decorrelated into one inverted-index self-join)
- degree tables                   → `degrees`
  (nx degree loops, data_process.py:131-144; DGL in_degrees,
  new_train_1.py:131-138)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


# Cache lifetime registry lives in operators.caching since round 6;
# re-exported here (incl. the legacy private name) for back-compat.
from frauddetection_spark.operators.caching import (  # noqa: F401
    release_caches,
    track_cache,
    track_cache as _track,
)


def edges_from_events(events: DataFrame) -> DataFrame:
    """Canonical directed edge list: user → counterparty (props.k).

    Mirrors the reference's CDR graph build (caller phone_no_m →
    opposite_no_m, data_process.py:95-107) on the testdata schema.
    Distinct — the reference's networkx graph also collapses repeat
    edges (B9: last-write-wins on weight; we keep unweighted edges and
    model weights separately).
    """
    return (
        events.select(
            F.col("user_id").alias("src"),
            F.get_json_object("props", "$.k").cast("bigint").alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .distinct()
    )


def mirror(edges: DataFrame) -> DataFrame:
    """Undirected view: (src,dst) ∪ (dst,src), deduplicated
    (reference: edge mirroring main.py:102-110).

    Explode-scatter, not a self-union (r10): the union form planned
    its two branches as independent subtrees (no ReusedExchange), so
    an unpersisted upstream edge pipeline executed twice — the hazard
    the connected-components checkpoint-before-mirror comment profiled
    at 8.5s vs 3.1s. One reference → one evaluation, whatever the
    caller passes."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"), F.col("dst").alias("dst")
                    ),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node out/in/total degree over distinct directed edges.

    One pass: explode each edge into (node, is_out) and aggregate —
    avoids two scans + an outer join of separate in/out aggregations.
    """
    sides = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), F.lit(1).alias("is_out")),
                F.struct(F.col("dst").alias("node"), F.lit(0).alias("is_out")),
            )
        ).alias("s")
    ).select("s.node", "s.is_out")
    return sides.groupBy("node").agg(
        F.sum("is_out").cast("bigint").alias("out_degree"),
        F.sum(1 - F.col("is_out")).cast("bigint").alias("in_degree"),
        F.count("*").alias("degree"),
    )


def aggregate_messages(
    edges: DataFrame,
    node_values: DataFrame,
    id_col: str = "id",
    value_col: str = "value",
) -> DataFrame:
    """Gather-scatter: for each dst, aggregate the src nodes' values
    (DGL ``update_all(copy_u, sum)``; gated variant in
    new_model_1.py:24-36). Returns (node, msg_sum, msg_avg, n_msgs).

    Scale: one shuffle to join node values onto edge sources (or a
    broadcast when the node table is small), one to aggregate by dst.
    K propagation rounds = K such steps; checkpoint between rounds to
    cut lineage (SURVEY §7 watch-list #4).
    """
    msgs = edges.join(
        node_values.select(
            F.col(id_col).alias("src"), F.col(value_col).alias("_msg")
        ),
        "src",
    )
    return msgs.groupBy(F.col("dst").alias("node")).agg(
        F.sum("_msg").alias("msg_sum"),
        F.avg("_msg").alias("msg_avg"),
        F.count("*").alias("n_msgs"),
    )


BITMASK_MAX_CONTACTS = 4096  # 64 int64 words
# Cost model for the auto pick (replaces round-2's hard user cap —
# measured: at 10× users over a dense 100-contact domain the inverted
# index shuffles Σd² ≈ 5e9 rows while the bitmask nested loop does
# u²/2 ≈ 1.1e8 in-codegen word-AND+popcounts, ~40× cheaper; a cap on
# users alone picks the catastrophically wrong side exactly in the
# dense regime the bitmask exists for):
#   inverted_cost ≈ Σ_c d(c)²          shuffled+aggregated rows
#   bitmask_cost  ≈ (u²/2)·words       in-memory word operations
# One shuffled row costs roughly BITMASK_WORD_DISCOUNT word-ops
# (serialization + hash + agg vs a codegen popcount), so bitmask wins
# iff bitmask_cost ≤ BITMASK_WORD_DISCOUNT · inverted_cost, subject to
# an absolute nested-loop budget (beyond it, wall-clock is unbounded
# even when bitmask is the cheaper side — at that point the OUTPUT of
# min_common=1 over a dense domain is itself ~u²/2 and the caller
# must prune: raise min_common, cap max_contact_degree, or top-k).
BITMASK_WORD_DISCOUNT = 64
BITMASK_MAX_WORDOPS = int(2e10)


def _pick_cn_strategy(
    n_contacts: int,
    n_users: int,
    sum_d2: int | None = None,
) -> str:
    """Cost-based inverted-vs-bitmask pick; see the model above.
    Without Σd² stats (caller injected only coarse counts) fall back
    to the legacy coarse rule — bitmask iff the user count is ≤ 8192
    (small enough that even the worst-case nested loop is cheap);
    anything larger defaults to inverted, the strategy whose cost is
    bounded by data statistics we actually have."""
    if n_contacts > BITMASK_MAX_CONTACTS or n_contacts == 0:
        return "inverted"
    words = (n_contacts + 63) // 64
    pair_wordops = (n_users * n_users // 2) * words
    if pair_wordops > BITMASK_MAX_WORDOPS:
        return "inverted"
    if sum_d2 is None:
        # no Σd² available: legacy coarse rule (small frames only)
        return "bitmask" if n_users <= 8192 else "inverted"
    return (
        "bitmask"
        if pair_wordops <= BITMASK_WORD_DISCOUNT * sum_d2
        else "inverted"
    )


def common_neighbor_pairs(
    contacts: DataFrame,
    min_common: int = 1,
    max_contact_degree: int | None = None,
    strategy: str = "auto",
    n_contacts: int | None = None,
    n_users: int | None = None,
    sum_d2: int | None = None,
    contact_values: list | None = None,
) -> DataFrame:
    """Pairs of users sharing ≥ min_common contacts (buildLSN,
    data_process.py:20-48, live k=1 at :219-220). The reference's
    O(n²·m) python loop, decorrelated. Two physical strategies:

    - ``inverted``: self-join on contact + pair-count — the sparse,
      scale-default path. Cost is Σ_c d(c)² intermediate rows, so it
      explodes when contacts are hubs; `max_contact_degree` prunes hubs
      (documented semantic deviation — configurable, off by default for
      parity).
    - ``bitmask``: when the distinct-contact domain is small (≤4096)
      AND the user count is small (≤8192), encode each user's contact
      set as packed int64 words (bit_or aggregate) and count pair
      overlaps with `bit_count(a & b)` — no per-contact pair explosion
      at all; the pair space is the user×user nested loop over tiny
      mask rows. This is exactly the dense-domain regime where the
      inverted index is quadratic-per-hub: 100 contacts shared by ~700
      users each is 53M join rows inverted vs 1.1M masked pairs. The
      user-count bound matters as much as the domain bound: the nested
      loop is O(|users|²) no matter how dense the domain is.
    - ``auto``: COST-BASED pick from (distinct contacts, distinct
      users, Σd²) via :func:`_pick_cn_strategy` — an engine CBO
      decision driven by data statistics. If the caller already knows
      the stats (catalog / ANALYZE / prior round), pass
      ``n_contacts``/``n_users`` (and ideally ``sum_d2``) and NO
      probe job runs; otherwise a probe (contact-degree aggregate +
      distinct-user count) runs at plan-construction time (documented
      cost — the one query path that is not job-free at construction
      unless stats are injected). ``contact_values`` (r14): the sorted
      distinct contact domain from the same catalog probe; when given
      and the bitmask strategy runs, the contact→bit index becomes a
      driver literal (no distinct+window pass over the frame) and the
      persist moves from the input to the reused masks frame.

    Both strategies are semantically identical for min_common ≥ 1 (the
    join-based inverted path cannot observe zero-overlap pairs, so
    min_common=0 is rejected rather than silently strategy-dependent);
    the oracle twin pins the semantics.
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1 (0 would be strategy-dependent)")
    c = contacts.select(F.col("user").alias("u"), F.col("contact").alias("ct")).distinct()
    if max_contact_degree is not None:
        keep = (
            c.groupBy("ct")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_contact_degree)
            .select("ct")
        )
        c = c.join(F.broadcast(keep), "ct")

    if strategy == "auto":
        if n_contacts is None or n_users is None:
            # probe jobs over the persisted c (persist FIRST so the
            # probe's scan — typically a JSON extract over events, the
            # expensive part — fills the cache the chosen plan then
            # reuses; both strategies read c at least twice). The
            # degree aggregate gives nc AND exact Σd² in one pass.
            c = track_cache(c.persist())
            degs = c.groupBy("ct").agg(F.count("*").alias("d"))
            row = degs.agg(
                F.count("*").alias("nc"),
                F.sum(F.col("d") * F.col("d")).alias("sd2"),
            ).first()
            n_contacts = int(row["nc"]) if n_contacts is None else n_contacts
            sum_d2 = int(row["sd2"] or 0) if sum_d2 is None else sum_d2
            if n_users is None:
                n_users = c.select("u").distinct().count()
        strategy = _pick_cn_strategy(n_contacts, n_users, sum_d2)

    if strategy == "bitmask":
        return _common_neighbors_bitmask(
            c, min_common, n_contacts, contact_values
        )

    a = c.select(F.col("u").alias("user_a"), "ct")
    b = c.select(F.col("u").alias("user_b"), "ct")
    return (
        a.join(b, "ct")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def _dense_index(values: DataFrame, col: str) -> DataFrame:
    """(value → contiguous 0-based index) without a global-window sort.

    Two-phase zipWithIndex in DataFrame form: range-partition by value,
    rank locally, then add per-partition offsets (prefix sum over the
    tiny per-partition size table). The only single-partition window
    runs over #partitions rows — bounded by cluster shape, not data —
    unlike a bare ``row_number().over(Window.orderBy(...))`` which
    funnels every row through one task. Because range partitions are
    ordered and disjoint, local rank + offset equals the global rank,
    independent of where the sampled partition bounds land.
    """
    parts = values.repartitionByRange(8, col).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = parts.withColumn(
        "_r", F.row_number().over(Window.partitionBy("_pid").orderBy(col))
    )
    sizes = local.groupBy("_pid").agg(F.max("_r").alias("_n"))
    offs = sizes.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    return local.join(F.broadcast(offs), "_pid").select(
        F.col(col), (F.col("_r") - 1 + F.col("_off")).cast("bigint").alias("idx")
    )


def _common_neighbors_bitmask(
    c: DataFrame,
    min_common: int,
    n_contacts: int | None = None,
    contact_values: list | None = None,
) -> DataFrame:
    """Dense-domain strategy: contact sets as packed bit words.

    One small broadcast (contact → dense bit index), one groupBy(user)
    bit_or to build masks, then a self nested-loop join over mask rows
    with pure codegen popcounts. No Σd² blowup: work is
    O(|users|²·words), independent of hub degrees — which is why the
    caller budgets the pair space (_pick_cn_strategy's word-op budget)
    before picking this path.
    """
    from pyspark import StorageLevel

    if contact_values:
        # r14 (guide §2.3 fewer passes, VERDICT r13 #5): the caller's
        # driver-side catalog probe already enumerated the (≤ 4096)
        # distinct contacts, so the contact→bit index is a LITERAL
        # local relation — the per-run distinct + window index pass
        # over c is gone, and c is consumed exactly once (the mask
        # build), so the persist moves to the frame that IS read
        # twice: masks (n_users × n_words rows, both sides of the
        # pair loop). Bit order cannot affect results — any bijective
        # contact→bit mapping yields identical AND/popcount overlaps.
        spark = c.sparkSession
        idx = spark.createDataFrame(
            [(v, i) for i, v in enumerate(contact_values)], ["ct", "idx"]
        )
        n_words = max(1, (len(contact_values) + 63) // 64)
        persist_masks = True
    elif n_contacts is not None:
        # the distinct contact set feeds both the index build and the
        # mask build — persist the (≤ MAX_USERS × MAX_CONTACTS
        # distinct) frame so the upstream scan (typically a JSON
        # extract over events) runs once
        if c.storageLevel == StorageLevel.NONE:
            c = track_cache(c.persist())
        # domain known ≤ BITMASK_MAX_CONTACTS: a single window over
        # ≤4096 rows is bounded by construction and cheaper than the
        # two-phase range-partitioned index (no sampling pass/shuffle)
        idx = (
            c.select("ct")
            .distinct()
            .withColumn("idx", F.row_number().over(Window.orderBy("ct")) - 1)
        )
        n_words = max(1, (n_contacts + 63) // 64)
        persist_masks = False
    else:
        # domain size unknown (direct strategy="bitmask" call): use the
        # scalable two-phase index — no single-partition funnel
        if c.storageLevel == StorageLevel.NONE:
            c = track_cache(c.persist())
        idx = _dense_index(c.select("ct").distinct(), "ct")
        n_words = (
            idx.agg((F.floor(F.max("idx") / 64) + 1).alias("w")).first()[0] or 1
        )
        persist_masks = False
    masked = c.join(F.broadcast(idx), "ct").select(
        "u", (F.col("idx") / 64).cast("int").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 64 AS INT))").alias("bit"),
    )
    masks = masked.groupBy("u").agg(
        *[
            F.bit_or(F.when(F.col("w") == w, F.col("bit")).otherwise(0)).alias(f"m{w}")
            for w in range(int(n_words))
        ]
    )
    if persist_masks:
        masks = track_cache(masks.persist())
    a = masks.select(
        F.col("u").alias("user_a"), *[F.col(f"m{w}").alias(f"a{w}") for w in range(int(n_words))]
    )
    b = masks.select(
        F.col("u").alias("user_b"), *[F.col(f"m{w}").alias(f"b{w}") for w in range(int(n_words))]
    )
    overlap = None
    for w in range(int(n_words)):
        term = F.bit_count(F.col(f"a{w}").bitwiseAND(F.col(f"b{w}")))
        overlap = term if overlap is None else overlap + term
    # explicit broadcast: the pair loop is a non-equi join, and the
    # planner must never fall back to CartesianProduct when the cached
    # masks frame loses its size estimate (r14). Always safe here: the
    # strategy's word-op budget (BITMASK_MAX_WORDOPS) bounds the mask
    # table at ~79k users × ≤65 int64 columns ≈ 41 MB worst case.
    return (
        a.join(F.broadcast(b), F.col("user_a") < F.col("user_b"))
        .withColumn("n_common", overlap.cast("bigint"))
        .filter(F.col("n_common") >= min_common)
        .select("user_a", "user_b", "n_common")
    )


def undirected_canonical(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a < b), self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def node_triangles(und: DataFrame) -> DataFrame:
    """Per-node triangle counts over a canonical undirected edge set.

    Triangle enumeration by ordered wedge join: (a,b)⋈(b,c)⋈(a,c) with
    a<b<c finds each triangle exactly once; three projections then
    credit each corner. Cost is the wedge count Σ_v deg⁺(v)² on the
    ordered graph — the standard bound; for hub-heavy graphs the
    degree-ordering trick (orient edges low→high degree) caps deg⁺ at
    O(√|E|), which the canonical a<b orientation approximates on
    id-random graphs. Returns (node, triangles).
    """
    from frauddetection_spark.operators.caching import track_cache

    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    # tri feeds all three corner projections — persist it or the wedge
    # join replays 3× (r07 sweep)
    tri = track_cache(e1.join(e2, "y").join(e3, ["x", "z"]).persist())
    # one reference, three corners (r10): the 3-branch union read the
    # cached tri table three times; the explode credits all corners in
    # a single map pass
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient C(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)) over the undirected graph (reference:
    nx.clustering(net, id), data_process.py:147-148). Exact integer
    numerator/denominator; one final division."""
    from frauddetection_spark.operators.caching import track_cache

    # und feeds both degree branches AND the three wedge-join sides —
    # persist it or the canonical edge derivation replays 5× (r07
    # sweep: 11 parquet scans in q_clustering_coeff's executed plan)
    und = track_cache(undirected_canonical(edges).persist())
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    tri = node_triangles(und)
    return (
        deg.join(tri, "node", "left")
        .na.fill({"triangles": 0})
        .select(
            "node",
            "degree",
            "triangles",
            F.when(
                F.col("degree") >= 2,
                (2 * F.col("triangles")).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(0.0)
            .alias("clustering_coeff"),
        )
    )


# Size gate for connected_components' driver-side local finish. A
# MODULE-LEVEL constant (not only a parameter default) so forcing the
# distributed path in tests is one monkeypatch that covers every call
# site no matter how it passes the threshold (ADVICE r08: patching
# __defaults__ goes vacuous the day a consumer passes the gate
# explicitly — tests/test_plans.py also lints that none does).
CC_LOCAL_FINISH_EDGES = 200_000


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    local_finish_edges: int | None = None,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    component(v) = min node id reachable from v. Returns
    (node, component).

    Two-phase, size-gated (the GraphX/GraphFrames "local finish"
    pattern): once the edge set is materialized (the localCheckpoint
    below — a job either way), if it holds ≤ ``local_finish_edges``
    directed edges (≤ ~200k × 16 bytes ≈ 3 MB — constant-bounded
    driver memory, same discipline as the whitelisted grid union-find
    in operators/sampling.py) the components come from one driver-side
    min-id union-find instead of diameter-many distributed rounds:
    each distributed round costs 2+ jobs (checkpoint + convergence
    count), so a 500-node dup graph paid ~8 scheduler round-trips to
    label 477 nodes (profiled 3.4s → 0.2s at sf0.1). Above the gate —
    the only regime a 100-TB run sees — the iterative path below runs
    unchanged; both paths compute the identical min-reachable-id
    fixpoint (pinned by tests/test_plans.py::
    test_cc_local_finish_matches_distributed).

    Distributed path: each round label'(v) = min(label(v), min over
    neighbors of label(u)) — one join + groupBy-min per round over the
    undirected edge list; rounds = graph diameter (typically ≪ 20 on
    real graphs). Convergence is checked with a changed-row count; frames
    are persisted per round to cut lineage (same discipline as M2
    propagation). Deterministic fixpoint ⇒ oracle-verifiable even
    though the algorithm is iterative driver-side control flow.
    """
    # Lineage discipline (the round-3 7s→2s fix, profiled): persist
    # alone does NOT truncate the LOGICAL plan — each round's frame
    # references the previous round twice, so by round k the analyzer
    # walks an O(2^k)-node tree that embeds the (large) upstream edge
    # pipeline, and driver-side planning dwarfs the actual 3-shuffle
    # jobs. localCheckpoint materializes AND cuts lineage: the edge
    # pipeline (q_dedup_groups feeds the whole MinHash-LSH rerank in
    # here) runs exactly once, and every round plans against a leaf.
    # At cluster scale swap for checkpoint() on a fault-tolerant dir —
    # same semantics, survives executor loss (SURVEY §7 watch-list #4).
    #
    # Checkpoint BEFORE mirroring: mirror() is a self-union, and Spark
    # plans its two branches as independent subtrees (no reuse) — a
    # post-mirror checkpoint would execute the upstream pipeline twice
    # (profiled: 8.5s vs 3.1s on the MinHash pair feed). The union
    # itself stays lazy: re-deriving it from the checkpointed leaf per
    # round is two cached-block scans, nothing more.
    ck = edges.localCheckpoint()
    # The checkpoint above already ran the upstream pipeline; counting
    # its cached blocks is one cheap job, and gates the local finish.
    # Type gate: the local finish emits BOTH columns as the src type;
    # if dst's type differs, only the distributed union below defines
    # the coercion — take that path so the gate can never change the
    # output schema (a mixed-type edge frame would otherwise diverge
    # only below the size gate).
    same_type = ck.schema["src"].dataType == ck.schema["dst"].dataType
    gate = (
        CC_LOCAL_FINISH_EDGES
        if local_finish_edges is None
        else local_finish_edges
    )
    if same_type and ck.count() <= gate:
        spark = ck.sparkSession
        # Min-id union-find over the (constant-bounded) collected edge
        # list: union by smaller root, so every root IS the set's
        # minimum id and find(v) = min reachable id — exactly the
        # distributed fixpoint's labels. Construction-time jobs are
        # sanctioned for CC callers via ITERATIVE_FIXPOINT in
        # tests/test_scale_lint.py; the collect is bounded by the gate.
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        nodes = set()
        # Resolve src/dst by NAME and derive the output schema from the
        # input's field types (ADVICE r07): the distributed path below
        # is name-resolved and type-preserving, so the local finish
        # must be too — positional row[0]/row[1] plus a hardcoded
        # bigint schema would silently diverge for non-long node ids
        # or reordered/extra columns, and only below the size gate.
        for row in ck.select("src", "dst").collect():
            a, b = row["src"], row["dst"]
            if a is not None:
                nodes.add(a)
            if b is not None:
                nodes.add(b)
            if a is None or b is None:
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        node_type = ck.schema["src"].dataType
        out_schema = StructType(
            [
                StructField("node", node_type, True),
                StructField("component", node_type, True),
            ]
        )
        return spark.createDataFrame(
            [(n, find(n)) for n in sorted(nodes)], out_schema
        )

    und = mirror(ck)
    labels = (
        und.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        nbr_min = (
            und.join(
                labels.select(
                    F.col("node").alias("src"), F.col("component").alias("c_src")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("c_src").alias("nbr_component"))
        )
        # carry the previous label through the update so convergence is
        # a filter-count over the checkpointed frame, not a second join
        updated = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("_prev"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("component") != F.col("_prev")).count()
        labels = updated.select("node", "component")
        if changed == 0:
            break
    else:
        # exhausted max_iterations while labels were still moving: the
        # graph diameter exceeds the round budget (e.g. a long path
        # component) and the labels are NOT a fixpoint. Silent return
        # here would hand wrong components downstream.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing); raise "
            "max_iterations (rounds needed = graph diameter)"
        )
    # checkpointed blocks are released by the ContextCleaner when the
    # frames go out of scope — no persist bookkeeping to track here
    return labels


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank in exact int64 arithmetic:
    rank_k(v) = (1-d)·S + d · Σ_{(u,v)∈E} rank_{k-1}(u) div outdeg(u),
    every term an integer (ranks carried as micro-units, ``scale`` =
    one unit of rank). Returns (node, rank_micro).

    Why integer: float PageRank sums in shuffle order — different
    engines (or two runs of the same plan) produce last-ulp-different
    doubles, which breaks exact oracle comparison. With div/sum over
    int64 every operation is associative and engine-independent, so a
    DuckDB twin unrolled to the same ``iterations`` hash-matches
    bit-for-bit. Dangling-node mass is dropped (no out-edges ⇒ no
    contribution), the same simplification both twins apply.

    Scale shape: the (edge ⋈ outdeg) build is computed ONCE outside
    the loop — only ranks change per round — so each iteration is one
    shuffle join on src + one groupBy(dst) partial-aggregated sum +
    one left join back onto the node spine: 100 TB cost = iterations ×
    (2 shuffles over edges), no driver-side data movement. Reference
    counterpart: the propagation loop in src/layers.py:85-100 (score
    spreading over the call graph), reshaped from per-node python to
    joins.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [0,100], got {damping_pct}")
    nodes = track_cache(
        edges.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
        .persist()
    )
    # static per-edge divisor: outdeg never changes across rounds.
    # Both invariants are referenced by the returned lazy plan, so
    # they cannot be unpersisted here — tracked for release_caches()
    edges_out = track_cache(
        edges.join(
            edges.groupBy("src").agg(F.count("*").alias("outdeg")), "src"
        )
        .select("src", "dst", "outdeg")
        .persist()
    )
    base = (scale * (100 - damping_pct)) // 100
    ranks = nodes.withColumn("rank_micro", F.lit(int(scale)).cast("bigint"))
    for _ in range(iterations):
        inbound = (
            edges_out.join(
                ranks.select(
                    F.col("node").alias("src"),
                    F.col("rank_micro").alias("r_src"),
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("r_src div outdeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = nodes.join(inbound, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100")
            )
            .cast("bigint")
            .alias("rank_micro"),
        )
    return ranks
