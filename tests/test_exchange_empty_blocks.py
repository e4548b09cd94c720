"""Exchange robustness to Ray's empty-block passthrough: map_batches
SKIPS the UDF on 0-row input blocks and emits 0-COLUMN schema-less
empties — any filter stage upstream of an exchange produces them. The
split/reduce kernels must never hand such a table to a kernel.

Kernels are defined INSIDE the tests so cloudpickle ships them by value
(the tests package is not importable in Ray workers).
"""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from raydedup.stages.exchange import hash_exchange_apply, hash_exchange_join


def _sum_kernel_factory():
    def sum_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        k = t.column("key").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        b = np.empty(k.shape[0], dtype=bool)
        b[0] = True
        b[1:] = k[1:] != k[:-1]
        st = np.flatnonzero(b)
        return pa.table(
            {
                "key": pa.array(k[st], type=pa.int64()),
                "s": pa.array(np.add.reduceat(v, st), type=pa.int64()),
            }
        )

    return sum_kernel


def _filtered_ds(threshold):
    """Two blocks; the filter map empties blocks whose keys exceed the
    threshold, and the NEXT map's passthrough turns them schema-less."""
    a = pa.table(
        {
            "key": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([10, 20, 30], pa.int64()),
        }
    )
    b = pa.table(
        {
            "key": pa.array([3, 3], pa.int64()),
            "v": pa.array([5, 5], pa.int64()),
        }
    )
    ds = rd.from_arrow([a, b])

    def filt(t: pa.Table) -> pa.Table:
        keys = t.column("key").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys < threshold))

    # second identity-ish map: Ray skips it on the emptied block and
    # emits the schema-less empty the exchange must survive
    return ds.map_batches(filt, batch_format="pyarrow").map_batches(
        lambda t: t, batch_format="pyarrow"
    )


def test_apply_survives_schemaless_empty_blocks(ray_session):
    ds = _filtered_ds(3)  # empties the second block
    out = hash_exchange_apply(ds, "key", _sum_kernel_factory())
    got = dict(zip(out.column("key").to_pylist(), out.column("s").to_pylist()))
    assert got == {1: 30, 2: 30}


def test_apply_all_blocks_schemaless(ray_session):
    ds = _filtered_ds(0)  # empties everything
    out = hash_exchange_apply(ds, "key", _sum_kernel_factory())
    assert out.num_rows == 0


def test_join_survives_schemaless_side(ray_session):
    left = _filtered_ds(3)
    right = _filtered_ds(0)  # fully schema-less side

    def join_kernel(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table({"key": pa.array([], pa.int64())})
        lk = np.unique(lt.column("key").to_numpy(zero_copy_only=False))
        rk = np.unique(rt.column("key").to_numpy(zero_copy_only=False))
        both = np.intersect1d(lk, rk)
        return pa.table({"key": pa.array(both, type=pa.int64())})

    refs = hash_exchange_join(left, right, "key", "key", join_kernel)
    rows = sum(t.num_rows for t in ray.get(refs) if t.num_columns)
    assert rows == 0  # no crash, empty join
