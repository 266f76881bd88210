"""Shared exchange utilities: group-safe hash partitioning and
schema-conforming helpers used by the dedup, ANN and materialize stages.

Why not ``groupby().map_groups()``: under the default sort-shuffle, range
partitioning can split one key's run across output blocks when a
partition exceeds the target block size (observed as duplicated keys), so
whole-block grouped kernels would see partial groups. Hash partitioning
(`repartition(keys=..., sort=True)` with the HASH_SHUFFLE strategy) puts
ALL rows of a key into exactly one block and sorts the block by the key,
so ``map_batches(fn, batch_size=None)`` sees every group whole and
contiguous.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


# Pass as **NO_FUSE_ARGS to a heavy whole-group kernel's map_batches.
# Operator fusion requires identical ray_remote_args (only
# scheduling_strategy inherits); the off-default num_cpus therefore
# blocks fusion with any downstream finite-batch stage. Fused, the
# combined operator adopts the DOWNSTREAM's min_rows_per_bundle and
# coalesces every shuffle partition below it into one task — observed:
# the Jaccard verify at sf0.1 ran as ONE 19.5 s task (13 971 rows <
# the dedupe stage's 65 536-row batch) instead of 12 parallel tasks.
NO_FUSE_ARGS = {"num_cpus": 1.001}


def conform(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Force a block to an exact schema. Ray's groupby/aggregate and join
    operators emit schema-less EMPTY blocks under high parallelism; if one
    of those reaches a pyarrow hash join/sort, acero fails with 'No match
    ... for key field'. Conforming every block (empty included) before a
    keyed exchange removes that failure mode."""
    if t.num_rows == 0:
        return schema.empty_table()
    cols = []
    for f in schema:
        col = t[f.name]
        if col.type != f.type:
            col = col.cast(f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def shuffle_parallelism() -> int:
    """Target partition count for wide ops — ≥ 2×CPUs so every core owns
    several partitions (re-exported for stages that only need this)."""
    from ntto_ray.stages.canonicalize import _shuffle_parallelism

    return _shuffle_parallelism()


def hash_grouped(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    parallelism: int | None = None,
    sort: bool = True,
    reserve_cpus: bool = True,
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by ``keys`` with each output block sorted by
    them — the group-safe exchange for whole-block grouped kernels.

    The aggregator ACTOR pool costs ~0.3 s per actor to spin up; cap it at
    half the CPUs (partition count stays 2×CPUs — each aggregator just
    owns several partitions). Measured: 64 partitions / 16 actors = 2.5 s
    vs 64/64 = 21 s for the same 1M-row exchange. Scoped via the
    per-dataset context — the global strategy stays sort-shuffle for the
    pipelines tuned on it."""
    from ray.data.context import ShuffleStrategy

    nparts = parallelism or shuffle_parallelism()
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ctx = ds.context
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(1, min(16, cpus // 2))
    # Aggregator actors RESERVE CPU for the lifetime of the exchange while
    # upstream actor pools hold theirs — on a small session the default
    # reservation (min(1, CPU/2/partition) per partition) deadlocks the
    # topology (observed: 4-CPU session, 3 actor pools + aggregators =
    # 4/4 CPU used, one 1-CPU task pending forever). Reserve ~CPUs/4 in
    # total for aggregators on big sessions and a token ε on small ones —
    # finalize work transiently oversubscribes instead of deadlocking.
    # reserve_cpus=False: ZERO reservation like the aggregate override
    # below. REQUIRED when a pipeline chains TWO hash exchanges (e.g.
    # knn_join's pair exchange → top-k reduce): the second exchange's
    # aggregator actors otherwise pend forever behind the first
    # exchange's reserved actors + saturated task slots (observed
    # deadlock: 16/16 CPU used, 8 actors × 0.5 CPU pending).
    per_part = (
        min(1.0, (cpus / 4) / nparts) if (cpus >= 16 and reserve_cpus) else 0.0
    )
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_part
    # The per-dataset context flows DOWNSTREAM: a later groupby() on the
    # returned dataset also plans as a HASH aggregate and reads its own
    # override knob. That operator's partition count is NOT nparts — it
    # defaults to 200 — so a per-partition reservation sized for this
    # exchange multiplies out to 25 CPUs per aggregate (observed: the
    # two-stage degree groupby after canonicalize reserved 50/32 CPUs
    # and deadlocked a 32-CPU session). Aggregate actors get a ZERO
    # reservation: their finalize work transiently oversubscribes
    # instead of starving the pipeline.
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.0
    # downstream groupbys also default to 200 partitions — align them
    # with the session-sized partition count
    ctx.default_hash_shuffle_parallelism = nparts
    # sort=False still co-locates all rows of a key in one block — pass
    # False when the downstream kernel is a hash aggregate that doesn't
    # need contiguous runs (skips a per-partition sort). CAUTION: with
    # sort=True, a partition that receives ZERO blocks (possible when
    # the keyspace is smaller than nparts — empty upstream outputs are
    # dropped) finalizes a schema-less table and the aggregator's
    # sort_by crashes; for sparse keyspaces prefer sort=False and sort
    # inside the kernel.
    return ds.repartition(nparts, keys=keys, sort=sort)


def adaptive_parallelism(nrows: int, *, rows_per_part: int = 250_000) -> int:
    """Partition count for an exchange whose input size is KNOWN (e.g. a
    materialized upstream): enough partitions that each holds ~250k rows,
    floored at 8, capped at the session's 2×CPU target. At cluster scale
    the cap binds (data >> CPUs), so behavior is identical to
    :func:`shuffle_parallelism`; on small inputs this stops a 64-way
    exchange from paying 64 partitions' fixed actor/finalize overhead to
    move a few MB."""
    return max(8, min(shuffle_parallelism(), (nrows + rows_per_part - 1) // rows_per_part))


def join_parallelism(*dss: "ray.data.Dataset") -> int:
    """Join partition count from the inputs' KNOWN row counts — every
    join site materializes both sides first, so ``count()`` is metadata,
    not execution. Ray's hash-join spins aggregator actors per
    partition; at 2×CPU partitions a 32-CPU session pays ~64 actor
    spin-ups to join a few hundred thousand rows (measured:
    rel_multiway_join 8 s at 16 CPUs → 38-124 s at 32). At cluster
    scale the adaptive cap binds to 2×CPUs, so behavior is unchanged
    where it matters."""
    n = max((ds.count() or 0) for ds in dss)
    return adaptive_parallelism(n)


def runs(key: np.ndarray):
    """(start, end) pairs of contiguous equal-key runs in a sorted array."""
    if len(key) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]]).astype(np.int64)
    ends = np.r_[starts[1:], len(key)]
    return starts, ends
