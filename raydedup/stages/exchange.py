"""Hash-partition exchange on raw Ray tasks (custom shuffle primitive).

Ray Data's ``groupby`` co-locates keys via a comparison SORT shuffle
(~0.7M rows/s measured on skinny posting tables) and its HASH_SHUFFLE
strategy deadlocks chained with map stages on small CPU counts. Pair
emission only needs *co-location by hash bucket*, not order — so this
module implements the minimal exchange directly: map tasks split each
block into ``num_buckets`` sub-tables (vectorized take), reduce tasks
concatenate one bucket's sub-tables from every block and apply a
vectorized kernel. Two passes over the data, zero sorts, all-to-all
through the object store — the same movement a multi-node hash shuffle
performs, with the partitioning assumption (kernel sees ALL rows of its
buckets and nothing else) stated explicitly.

This is the SURVEY §2 case (c): a raw-Ray-core operator used only where
the Dataset API cannot express the semantics efficiently.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

I64 = np.int64


def default_buckets() -> int:
    """Bucket count sized to the cluster: ~2 reduce tasks per CPU keeps
    one task wave per exchange instead of several, while still bounding
    per-task memory. Callers pass num_buckets=None to use this."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return int(min(64, max(16, 2 * cpus)))


def _split_table(block: pa.Table, key_col: str, num_buckets: int) -> list[pa.Table]:
    """Hash-partition one in-memory table on ``key_col`` (vectorized
    argsort + zero-copy slices)."""
    if block.num_rows == 0:
        return [block] * num_buckets
    keys = block.column(key_col).to_numpy(zero_copy_only=False)
    bucket = (keys % num_buckets + num_buckets) % num_buckets
    order = np.argsort(bucket, kind="stable")
    sorted_b = bucket[order]
    boundaries = np.searchsorted(sorted_b, np.arange(num_buckets + 1))
    taken = block.take(pa.array(order))
    return [
        taken.slice(boundaries[i], boundaries[i + 1] - boundaries[i])
        for i in range(num_buckets)
    ]


def _schema_donor(parts) -> pa.Table | None:
    """First part that carries a schema. Ray's map_batches skips the UDF
    on 0-row input blocks and emits 0-COLUMN empties — those cannot seed
    a typed empty table or be handed to a kernel expecting columns."""
    return next((p for p in parts if p.num_columns), None)


@ray.remote
def _split_blocks(key_col: str, num_buckets: int, *blocks: pa.Table) -> list[pa.Table]:
    # several input blocks per split task: the object count is
    # O(split_tasks x buckets), not O(input_blocks x buckets) — tens of
    # thousands of tiny plasma objects serialize on the raylet otherwise
    nonempty = [b for b in blocks if b.num_rows]
    if not nonempty:
        donor = _schema_donor(blocks)
        empty = donor.slice(0, 0) if donor is not None else pa.table({})
        return [empty] * num_buckets
    return _split_table(pa.concat_tables(nonempty), key_col, num_buckets)


@ray.remote
def _reduce_bucket(kernel: Callable[[pa.Table], pa.Table], *parts: pa.Table) -> pa.Table:
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        donor = _schema_donor(parts)
        # no part carries a schema -> the kernel cannot run; emit a
        # 0-column empty (collectors filter on num_rows)
        return kernel(donor.slice(0, 0)) if donor is not None else pa.table({})
    return kernel(pa.concat_tables(nonempty))


@ray.remote
def _reduce_bucket_resplit(
    kernel: Callable[[pa.Table], pa.Table],
    out_key: str,
    out_buckets: int,
    *parts: pa.Table,
) -> list[pa.Table]:
    """Fused reduce + re-split: apply ``kernel`` to one bucket's rows and
    hash-partition the OUTPUT on ``out_key`` in the same task — the next
    reduce wave consumes the pieces directly, skipping a full split wave
    (and its materialize barrier) between two chained exchanges."""
    nonempty = [p for p in parts if p.num_rows]
    if nonempty:
        t = kernel(pa.concat_tables(nonempty))
    else:
        donor = _schema_donor(parts)
        if donor is None:
            return [pa.table({})] * out_buckets
        t = kernel(donor.slice(0, 0))
    return _split_table(t, out_key, out_buckets)


@ray.remote
def _reduce_bucket_join_resplit(
    kernel: Callable[[pa.Table, pa.Table], pa.Table],
    n_left: int,
    out_key: str,
    out_buckets: int,
    *parts: pa.Table,
) -> list[pa.Table]:
    """Fused join-reduce + re-split (two-sided variant)."""
    lt, rt = _join_sides(parts, n_left)
    return _split_table(kernel(lt, rt), out_key, out_buckets)


def reduce_apply_resplit(
    split_refs: list,
    kernel: Callable[[pa.Table], pa.Table],
    out_key: str,
    out_buckets: int,
    num_buckets: int,
) -> list:
    """Reduce each of ``num_buckets`` buckets with ``kernel`` and re-split
    every result on ``out_key``. Returns the same wave shape as
    split_dataset (``out[i][k]`` = reduce task i's out-bucket k), feedable
    to reduce_join_split / another reduce wave without re-splitting."""
    out = []
    for k in range(num_buckets):
        parts = [s[k] for s in split_refs]
        out.append(
            _reduce_bucket_resplit.options(num_returns=out_buckets).remote(
                kernel, out_key, out_buckets, *parts
            )
        )
    return out


def reduce_join_resplit(
    lsplit: list,
    rsplit: list,
    kernel: Callable[[pa.Table, pa.Table], pa.Table],
    out_key: str,
    out_buckets: int,
    num_buckets: int,
) -> list:
    """Two-sided join-reduce whose per-bucket outputs are re-split on
    ``out_key`` inside the reduce tasks (wave shape, see
    reduce_apply_resplit)."""
    out = []
    for k in range(num_buckets):
        lparts = [s[k] for s in lsplit]
        rparts = [s[k] for s in rsplit]
        out.append(
            _reduce_bucket_join_resplit.options(num_returns=out_buckets).remote(
                kernel, len(lparts), out_key, out_buckets, *lparts, *rparts
            )
        )
    return out


@ray.remote
def _reduce_bucket_join(
    kernel: Callable[[pa.Table, pa.Table], pa.Table],
    n_left: int,
    *parts: pa.Table,
) -> pa.Table:
    lt, rt = _join_sides(parts, n_left)
    return kernel(lt, rt)


def _join_sides(parts, n_left: int) -> tuple[pa.Table, pa.Table]:
    """Concatenated (left, right) bucket sides; an all-empty side falls
    back to a schema-bearing donor's empty slice (join kernels
    early-return on num_rows == 0, so a 0-column fallback is safe when
    NO part of that side has a schema)."""
    left = [p for p in parts[:n_left] if p.num_rows]
    right = [p for p in parts[n_left:] if p.num_rows]
    if left:
        lt = pa.concat_tables(left)
    else:
        donor = _schema_donor(parts[:n_left])
        lt = donor.slice(0, 0) if donor is not None else pa.table({})
    if right:
        rt = pa.concat_tables(right)
    else:
        donor = _schema_donor(parts[n_left:])
        rt = donor.slice(0, 0) if donor is not None else pa.table({})
    return lt, rt


def split_dataset(x: Dataset | list, key: str, num_buckets: int | None = None) -> list:
    """Hash-partition a Dataset (or list of block refs) on ``key`` into
    ``num_buckets`` buckets. Returns a list of per-split-task lists of
    bucket ObjectRefs (``splits[i][k]`` = split task i's bucket k) that
    can be fed to multiple reduce rounds WITHOUT re-splitting — reuse
    this when the same table joins on the same key more than once."""
    import math

    if num_buckets is None:
        num_buckets = default_buckets()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    refs = list(x.to_arrow_refs()) if isinstance(x, Dataset) else list(x)
    n_split = max(1, min(len(refs), 2 * cpus))
    group = math.ceil(len(refs) / n_split)
    return [
        _split_blocks.options(num_returns=num_buckets).remote(
            key, num_buckets, *refs[i : i + group]
        )
        for i in range(0, len(refs), group)
    ]


def reduce_join_split(
    lsplit: list,
    rsplit: list,
    kernel: Callable[[pa.Table, pa.Table], pa.Table],
    num_buckets: int,
) -> list:
    """Per-bucket join-reduce over two pre-split sides (see
    split_dataset). Returns per-bucket result ObjectRefs."""
    out = []
    for k in range(num_buckets):
        lparts = [s[k] for s in lsplit]
        rparts = [s[k] for s in rsplit]
        out.append(_reduce_bucket_join.remote(kernel, len(lparts), *lparts, *rparts))
    return out


def hash_exchange_join(
    left: Dataset | list,
    right: Dataset | list,
    left_key: str,
    right_key: str,
    kernel: Callable[[pa.Table, pa.Table], pa.Table],
    num_buckets: int | None = None,
) -> list:
    """Two-sided hash exchange: co-partition ``left`` and ``right`` on
    their key columns and apply ``kernel(left_bucket, right_bucket)``
    per bucket. Returns the per-bucket result ObjectRefs (callers
    ray.get / concat as needed). The explicit partitioned hash join from
    the Ray guide, on raw tasks."""
    if num_buckets is None:
        num_buckets = default_buckets()
    lsplit = split_dataset(left, left_key, num_buckets)
    rsplit = split_dataset(right, right_key, num_buckets)
    return reduce_join_split(lsplit, rsplit, kernel, num_buckets)


def hash_exchange_apply(
    ds: Dataset | list,
    key_col: str,
    kernel: Callable[[pa.Table], pa.Table],
    num_buckets: int | None = None,
    collect: bool = True,
):
    """Hash-partition ``ds`` on ``key_col`` into ``num_buckets`` groups
    and apply ``kernel`` to each group's full table; returns the
    concatenated (driver-side, assumed small) result.

    The kernel must be insensitive to row order within its bucket.
    num_buckets bounds reduce-task memory to ~|ds| / num_buckets rows.
    """
    import math

    if num_buckets is None:
        num_buckets = default_buckets()

    # NOTE: a streaming variant (split tasks launched per ref bundle via
    # iter_internal_ref_bundles) was measured 30-45% SLOWER end-to-end:
    # the iterator's output backpressure throttles the upstream kernel.
    # Materialize-then-split keeps the producer at full width.
    block_refs = list(ds.to_arrow_refs()) if isinstance(ds, Dataset) else list(ds)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_split = max(1, min(len(block_refs), 2 * cpus))
    group = math.ceil(len(block_refs) / n_split)
    split_refs = [
        _split_blocks.options(num_returns=num_buckets).remote(
            key_col, num_buckets, *block_refs[i : i + group]
        )
        for i in range(0, len(block_refs), group)
    ]
    # split_refs[i] is a list of num_buckets ObjectRefs (one per bucket)
    out_refs = []
    for k in range(num_buckets):
        parts = [s[k] for s in split_refs]
        out_refs.append(_reduce_bucket.remote(kernel, *parts))
    if not collect:
        return out_refs
    results = [t for t in ray.get(out_refs) if t.num_rows]
    if not results:
        return ray.get(out_refs[0]) if out_refs else pa.table({})
    return pa.concat_tables(results, promote_options="default")


@ray.remote
def _block_nrows(t: pa.Table) -> int:
    # 0-column blocks (the no-donor empty fallback) count as empty even
    # though concat-safe row counts could differ
    return t.num_rows if t.num_columns else 0


def refs_to_dataset(refs: list, schema: pa.Schema):
    """Per-bucket result ObjectRefs -> streaming Dataset WITHOUT pulling
    the tables to the driver: only each block's row count crosses the
    wire (a tiny int per bucket); empty buckets are dropped by ref. If
    every bucket is empty, a typed empty table built from ``schema``
    keeps the output schema stable for downstream hash comparison."""
    import ray.data as rd

    rows = ray.get([_block_nrows.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, rows) if n > 0]
    if not keep:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(keep)


def pa_schema_of(ds: Dataset, columns: list[str] | None = None) -> pa.Schema:
    """pyarrow schema of a Dataset (optionally projected to ``columns``),
    taken from metadata — does not execute the pipeline beyond schema
    resolution. Used to build typed empty fallbacks when a whole side of
    an exchange turns out to be 0 rows."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if not isinstance(base, pa.Schema):
        # pandas-backed datasets report numpy dtypes here, not
        # pa.DataType — map them (object/str dtypes -> string)
        def _pa_type(t):
            if isinstance(t, pa.DataType):
                return t
            try:
                return pa.from_numpy_dtype(np.dtype(t))
            except (TypeError, pa.ArrowNotImplementedError):
                return pa.string()

        base = pa.schema([(n, _pa_type(t)) for n, t in zip(s.names, s.types)])
    if columns is None:
        return base
    return pa.schema([(c, base.field(c).type) for c in columns])


def cast_columns(block: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project + cast ``block`` to exactly ``schema`` (shared prep for
    the events-table exchange stages). Handles the Ray 2.49 hazard of
    0-row/0-column blocks by returning a typed empty table."""
    if block.num_rows == 0 or block.num_columns == 0:
        return schema.empty_table()
    cols = {f.name: block.column(f.name).cast(f.type) for f in schema}
    return pa.table(cols, schema=schema)
