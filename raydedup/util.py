"""Small shared helpers (driver-side materialization for SMALL results)."""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset


def to_arrow_table(ds: Dataset) -> pa.Table:
    """Materialize a (small!) Dataset into one Arrow table on the driver.

    Use only for post-aggregation results (pairs, cluster maps, metrics)
    — never on the full corpus-sized datasets.
    """
    refs = ds.to_arrow_refs()
    blocks = [b for b in ray.get(list(refs)) if b.num_rows > 0]
    if not blocks:
        schema = ds.schema()  # ray.data.Schema: .names + .types (arrow DataTypes)
        return pa.table({n: pa.array([], type=t) for n, t in zip(schema.names, schema.types)})
    return pa.concat_tables(blocks, promote_options="default")
