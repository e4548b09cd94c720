"""Small shared helpers (driver-side materialization for SMALL results)."""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset


def to_arrow_table(ds: Dataset, empty_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small!) Dataset into one Arrow table on the driver.

    Use only for post-aggregation results (pairs, cluster maps, metrics)
    — never on the full corpus-sized datasets. ``empty_schema`` is used
    when the dataset is empty and Ray cannot infer a schema (fully-empty
    lineages report ``schema() is None``).
    """
    refs = ds.to_arrow_refs()
    blocks = [b for b in ray.get(list(refs)) if b.num_rows > 0]
    if not blocks:
        schema = ds.schema()  # ray.data.Schema: .names + .types (arrow DataTypes)
        if schema is None:
            if empty_schema is None:
                raise ValueError("empty dataset with no inferable schema")
            return empty_schema.empty_table()
        return pa.table({n: pa.array([], type=t) for n, t in zip(schema.names, schema.types)})
    return pa.concat_tables(blocks, promote_options="default")
