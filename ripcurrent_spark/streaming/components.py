"""Incremental connected-components maintenance over an edge stream.

Batch `operators/dedup.connected_components` answers "what are the
components of THESE pairs"; an ingest pipeline needs the streaming
twin: as near-dup pairs arrive trigger by trigger, keep a persistent
node -> component map current WITHOUT re-running propagation over the
full accumulated edge set.

Design (union-find split into a node-sized immutable store and a
label-sized mutable remap):

- ``state`` holds ONE row per node ever seen: (node, label) — the
  component canonical AT THE TIME the node first appeared. Rows are
  written once and never rewritten; the dir is parquet partitioned by
  ``_bucket = pmod(xxhash64(node), n_buckets)`` and ``_batch_id``
  (the streaming-dedup index discipline: bucket-pruned reads, replay
  overwrites its own partition).
- ``remap`` records label merges: (old_label -> component). It is
  kept PATH-COMPRESSED (depth one) by composing it with each batch's
  merge map, and is rewritten whole under its own ``_batch_id``
  partition each trigger — the log is label-sized (one row per
  canonical that ever lost a merge), not corpus-sized; at extreme
  scale a deployment would delta-partition it, which this seam
  isolates to one writer.

Per trigger: look up the batch's nodes in the bucket-pruned state,
resolve their labels through the remap (one hop — the compression
invariant), run the BATCH-SIZED connected_components on the label
graph (batch edges projected onto current canonicals), write rows for
new nodes, and fold the merges into the remap. Per-trigger cost is
O(batch + affected labels + |remap|); the corpus-sized state is never
rewritten.

``components_snapshot`` is the consumer view: state LEFT JOIN remap,
component = COALESCE(remapped, stored label) — ONE join, no
propagation loop, exactly what dedup_keep_best-style batch consumers
need from an incrementally-maintained graph.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripcurrent_spark.operators import dedup as DD
from ripcurrent_spark.operators import cachereg
from ripcurrent_spark.sinks import has_bucketed_data, key_bucket


def _latest_remap(spark, remap_dir: str, exclude_batch: int) -> DataFrame | None:
    p = Path(remap_dir)
    ids = [
        int(d.name.split("=", 1)[1])
        for d in p.glob("_batch_id=*")
        if int(d.name.split("=", 1)[1]) != exclude_batch
    ]
    if not ids:
        return None
    return (
        spark.read.parquet(remap_dir)
        .filter(F.col("_batch_id") == max(ids))
        .select("old_label", "component")
    )


def streaming_components_foreach_batch(
    state_dir: str, remap_dir: str, n_buckets: int = 16
):
    """foreachBatch fn for an (id_a, id_b) edge stream maintaining the
    persistent node -> component map described in the module
    docstring. At-least-once safe: both writers use dynamic partition
    overwrite under the batch's own partition, and reads exclude the
    current batch id, so a replay recomputes against pre-batch state."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        edges = (
            batch.select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
            .persist()
        )
        nodes = (
            edges.select(F.col("id_a").alias("node"))
            .unionByName(edges.select(F.col("id_b").alias("node")))
            .distinct()
            .withColumn("_bucket", key_bucket(["node"], n_buckets))
            .persist()
        )
        touched = sorted({r[0] for r in nodes.select("_bucket").distinct().collect()})

        remap = _latest_remap(spark, remap_dir, exclude_batch=batch_id)
        known = None
        if touched and has_bucketed_data(state_dir):
            st = (
                spark.read.parquet(state_dir)
                .filter(F.col("_bucket").isin([int(b) for b in touched]))
                .filter(F.col("_batch_id") != batch_id)
                .select("node", "label")
            )
            known = st.join(nodes.select("node"), "node")
            if remap is not None:
                known = known.join(
                    remap, known.label == remap.old_label, "left"
                ).select("node", F.coalesce("component", "label").alias("label"))

        if known is not None:
            unknown = nodes.select("node").join(known.select("node"), "node", "left_anti")
            lab = known.unionByName(unknown.withColumn("label", F.col("node")))
        else:
            lab = nodes.select("node").withColumn("label", F.col("node"))
        lab = lab.persist()

        # Batch edges projected onto current canonical labels: the
        # mini-graph is batch-sized however big the corpus is.
        la = lab.select(F.col("node").alias("id_a"), F.col("label").alias("_la"))
        lb = lab.select(F.col("node").alias("id_b"), F.col("label").alias("_lb"))
        el = (
            edges.join(la, "id_a")
            .join(lb, "id_b")
            .filter(F.col("_la") != F.col("_lb"))
            .select(F.col("_la").alias("id_a"), F.col("_lb").alias("id_b"))
            .distinct()
        )
        if el.limit(1).count() > 0:
            # Scoped release: free ONLY the checkpoint handle this
            # connected_components call tracked — a global
            # release_tracked() here would permanently break
            # checkpoint-backed frames owned by concurrent batch
            # consumers sharing the session (ADVICE r9).
            with cachereg.scoped():
                comp = DD.connected_components(el)
                merge_rows = [
                    (int(r["node"]), int(r["component"]))
                    for r in comp.filter(F.col("node") != F.col("component")).collect()
                ]
        else:
            merge_rows = []
        merge = (
            spark.createDataFrame(merge_rows, "old_label long, component long")
            if merge_rows
            else None
        )

        # New nodes' rows: first-appearance label = post-merge canonical.
        new_rows = nodes.join(lab, "node").select("node", "label", "_bucket")
        if known is not None:
            new_rows = new_rows.join(known.select("node"), "node", "left_anti")
        if merge is not None:
            new_rows = new_rows.join(
                F.broadcast(merge), new_rows.label == merge.old_label, "left"
            ).select(
                "node", F.coalesce("component", "label").alias("label"), "_bucket"
            )
        (
            new_rows.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket", "_batch_id")
            .parquet(state_dir)
        )

        # Fold merges into the remap, keeping it depth-one: existing
        # targets route through the new merge map, then the merge rows
        # themselves join the log.
        if remap is None and merge is None:
            out = spark.createDataFrame([], "old_label long, component long")
        elif remap is None:
            out = merge
        elif merge is None:
            out = remap
        else:
            routed = remap.alias("r").join(
                F.broadcast(merge.select(
                    F.col("old_label").alias("_mo"), F.col("component").alias("_mc")
                )),
                F.col("r.component") == F.col("_mo"),
                "left",
            ).select(
                "old_label", F.coalesce("_mc", "component").alias("component")
            )
            out = routed.unionByName(merge).groupBy("old_label").agg(
                F.min("component").alias("component")
            )
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(remap_dir)
        )
        lab.unpersist()
        nodes.unpersist()
        edges.unpersist()

    return _apply


def compact_components_state(
    spark, state_dir: str, remap_dir: str, keep_latest_remaps: int = 2
) -> dict[str, list[int]]:
    """Long-run maintenance: the node state accrues one (bucket,
    trigger) partition forever — fold closed batches into the
    compacted base (sinks.compact_log_batches; crash-safe,
    replay-compatible: state rows are write-once per node, so folding
    preserves content exactly). The remap dir is different: each
    trigger writes a FULL self-contained snapshot, so old partitions
    are not folded (merging snapshots from different epochs would put
    CONFLICTING old_label rows in one partition) — they are PURGED,
    keeping the newest ``keep_latest_remaps``. Two, not one: an
    at-least-once replay of the newest batch reads the
    second-newest snapshot as its pre-batch state. Run offline
    between triggers, like any OPTIMIZE."""
    import shutil

    from ripcurrent_spark.sinks import compact_log_batches

    folded = compact_log_batches(spark, state_dir, keep_latest=1)
    p = Path(remap_dir)
    ids = sorted(
        int(d.name.split("=", 1)[1]) for d in p.glob("_batch_id=*")
    )
    purged = ids[:-keep_latest_remaps] if keep_latest_remaps else ids
    for i in purged:
        shutil.rmtree(p / f"_batch_id={i}", ignore_errors=True)
    return {"state": folded, "remap_purged": purged}


def components_snapshot(spark, state_dir: str, remap_dir: str) -> DataFrame:
    """The consumer view: (node, component) for every node ever seen —
    state LEFT JOIN the latest remap, ONE join, no propagation loop.
    Equal to batch connected_components over the union of all streamed
    edges (pinned by tests/test_streaming_components.py)."""
    st = spark.read.parquet(state_dir).select("node", "label")
    remap = _latest_remap(spark, remap_dir, exclude_batch=-1)
    if remap is None:
        return st.select("node", F.col("label").alias("component"))
    return st.join(remap, st.label == remap.old_label, "left").select(
        "node", F.coalesce("component", "label").alias("component")
    )
