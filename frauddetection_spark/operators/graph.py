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
    (reference: edge mirroring main.py:102-110)."""
    return edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


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


def common_neighbor_pairs(
    contacts: DataFrame,
    min_common: int = 1,
    max_contact_degree: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Pairs of users sharing ≥ min_common contacts (buildLSN,
    data_process.py:20-48, live k=1 at :219-220). The reference's
    O(n²·m) python loop, decorrelated. Two physical strategies:

    - ``inverted``: self-join on contact + pair-count — the sparse
      path. Cost is Σ_c d(c)² intermediate rows, so it explodes when
      contacts are hubs; `max_contact_degree` prunes hubs (documented
      semantic deviation — configurable, off by default for parity).
    - ``bitmask``: when the distinct-contact domain is small (≤4096),
      encode each user's contact set as packed int64 words (bit_or
      aggregate) and count pair overlaps with `bit_count(a & b)` —
      no per-contact pair explosion at all; the pair space is the
      user×user broadcast nested loop over tiny mask rows. This is
      exactly the dense-domain regime where the inverted index is
      quadratic-per-hub: 100 contacts shared by ~700 users each is
      53M join rows inverted vs 1.1M cheap bitwise pairs masked.
    - ``auto``: pick by a distinct-contact count (one cheap scalar
      aggregate at plan time — an engine CBO decision driven by a
      data statistic, not a guess).

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
        # the distinct contact set is re-read by whichever strategy
        # runs — persist it so the stats probe and the chosen plan
        # share one upstream scan (the JSON-extract over events is the
        # expensive part, not the 10^4-row contact set). The cache is
        # deliberately not unpersisted here: the returned plan still
        # references it; Spark's LRU reclaims it under pressure.
        c = c.persist()
        n_contacts = c.select("ct").distinct().count()
        strategy = "bitmask" if n_contacts <= BITMASK_MAX_CONTACTS else "inverted"
        if strategy == "bitmask":
            return _common_neighbors_bitmask(c, min_common, n_contacts)

    if strategy == "bitmask":
        return _common_neighbors_bitmask(c, min_common)

    a = c.select(F.col("u").alias("user_a"), "ct")
    b = c.select(F.col("u").alias("user_b"), "ct")
    return (
        a.join(b, "ct")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def _common_neighbors_bitmask(
    c: DataFrame, min_common: int, n_contacts: int | None = None
) -> DataFrame:
    """Dense-domain strategy: contact sets as packed bit words.

    One small broadcast (contact → dense bit index), one groupBy(user)
    bit_or to build masks, then a self nested-loop join over mask rows
    with pure codegen popcounts. No Σd² blowup: work is
    O(|users|²·words), independent of hub degrees.
    """
    idx = (
        c.select("ct")
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("ct")) - 1,
        )
    )
    if n_contacts is not None:
        n_words = max(1, (n_contacts + 63) // 64)
    else:
        n_words = (
            idx.agg((F.floor(F.max("idx") / 64) + 1).alias("w")).first()[0] or 1
        )
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
    return (
        a.join(b, F.col("user_a") < F.col("user_b"))
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
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient C(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)) over the undirected graph (reference:
    nx.clustering(net, id), data_process.py:147-148). Exact integer
    numerator/denominator; one final division."""
    und = undirected_canonical(edges)
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
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


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    component(v) = min node id reachable from v. Returns
    (node, component).

    Each round: label'(v) = min(label(v), min over neighbors of
    label(u)) — one join + groupBy-min per round over the undirected
    edge list; rounds = graph diameter (typically ≪ 20 on real
    graphs). Convergence is checked with a changed-row count; frames
    are persisted per round to cut lineage (same discipline as M2
    propagation). Deterministic fixpoint ⇒ oracle-verifiable even
    though the algorithm is iterative driver-side control flow.
    """
    und = mirror(edges)
    labels = (
        und.select(F.col("src").alias("node"))
        .union(und.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
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
        updated = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
    return labels
