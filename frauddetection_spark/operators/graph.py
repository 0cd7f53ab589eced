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

from pyspark.sql import DataFrame
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


def common_neighbor_pairs(
    contacts: DataFrame,
    min_common: int = 1,
    max_contact_degree: int | None = None,
) -> DataFrame:
    """Pairs of users sharing ≥ min_common contacts (buildLSN,
    data_process.py:20-48, live k=1 at :219-220).

    The reference's O(n²·m) python loop becomes an inverted-index
    self-join on contact: contacts(user, contact) ⋈ itself, user_a <
    user_b, group-count. At scale the join explodes on hub contacts
    (a contact shared by d users yields d² pair rows); hubs carry no
    discriminative similarity, so `max_contact_degree` prunes them
    before the join (documented semantic deviation, SURVEY §7
    watch-list #3 — configurable, off by default for parity).
    """
    c = contacts.select(F.col("user").alias("u"), F.col("contact").alias("ct")).distinct()
    if max_contact_degree is not None:
        keep = (
            c.groupBy("ct")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_contact_degree)
            .select("ct")
        )
        c = c.join(F.broadcast(keep), "ct")
    a = c.select(F.col("u").alias("user_a"), "ct")
    b = c.select(F.col("u").alias("user_b"), "ct")
    return (
        a.join(b, "ct")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
