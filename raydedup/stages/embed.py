"""Text -> embedding production kernel (hashed bag-of-words random
projection), the missing front half of the embedding operator surface.

Reference analog: Panako's GPU event-point extractor runs a model
behind a transport once per process and streams features per resource
(``strategy/panako/PanakoGPUEventPointProcessor.java:34``). Here the
"model" is a frozen hashed-n-gram random-projection matrix built ONCE
per actor in ``__init__`` (the actor-pool ``map_batches`` shape for any
stateful encoder — a real sentence-transformer drops in by replacing
``_build_projection`` + the matmul with a forward pass); ``__call__``
is one vectorized count + one BLAS matmul per batch.

Model definition (deterministic, oracle-mirrorable end to end):
  token stream  = lowercased whitespace tokens of ``text`` (the exact
                  tokenization of ``stages/signatures.py``)
  token hash    = unmixed FNV-1a64 of the token (``hash_strings_u64``)
  bucket        = token_hash mod n_buckets        (hashed vocabulary)
  R[b, j]       = +1 if bit j of splitmix64(b * GOLDEN + seed) else -1
  embedding[j]  = sum over token occurrences of R[bucket(token), j]

Every output value is an integer (a signed count sum), stored as
float32 — exact as long as a doc keeps fewer than 2^24 tokens per
bucket — so the SQL mirror in ``__ray_entry__`` hash-matches the
distributed kernel with no float-boundary hazard, and the derived
table composes bit-exactly with every downstream embedding operator
(SemDeDup, sketch near-dup, IVF index, kNN, decontamination).

Scale shape: row-local ``map_batches`` over pruned (id, text) Arrow
batches — zero shuffles, zero driver state; the projection matrix is
n_buckets x dim int8 (16 KiB at the defaults) per actor. At 10^12 docs
this stage is embarrassingly parallel and DRAM-bandwidth-bound like
the signature kernel it sits beside.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from raydedup.hashing import POLY_B, U64, hash_strings_u64, mix64
from raydedup.stages.signatures import batch_word_hashes, tokenize

# Frozen model seed: any change is a different model -> different table.
EMBED_SEED = 0xC2B2AE3D27D4EB4F
DEFAULT_N_BUCKETS = 256
DEFAULT_DIM = 64


def _build_projection(n_buckets: int, dim: int, seed: int) -> np.ndarray:
    """The frozen ±1 projection matrix R (n_buckets x dim, int8).

    Sign of dim j for bucket b is bit j of splitmix64(b*GOLDEN + seed)
    — one mix per bucket row, so dim <= 64 (one u64 of signs per
    bucket; a wider model would chain extra mixes per 64-dim block).
    """
    if not 1 <= dim <= 64:
        raise ValueError(f"dim must be in [1, 64], got {dim}")
    with np.errstate(over="ignore"):
        bx = np.arange(n_buckets, dtype=U64) * POLY_B + U64(seed)
    g = mix64(bx)
    bits = (g[:, None] >> np.arange(dim, dtype=U64)[None, :]) & U64(1)
    return (2 * bits.astype(np.int64) - 1).astype(np.int8)


class EmbedKernel:
    """Actor-pool ``map_batches`` callable: (id, text) -> (vec_id,
    embedding list<float32>). Projection built once per actor."""

    def __init__(
        self,
        *,
        n_buckets: int = DEFAULT_N_BUCKETS,
        dim: int = DEFAULT_DIM,
        seed: int = EMBED_SEED,
        id_col: str = "doc_id",
        text_col: str = "text",
        out_id_col: str = "vec_id",
    ) -> None:
        self.n_buckets = n_buckets
        self.dim = dim
        self.id_col = id_col
        self.text_col = text_col
        self.out_id_col = out_id_col
        self.proj = _build_projection(n_buckets, dim, seed).astype(np.float64)

    def _counts(self, texts: pa.Array) -> np.ndarray:
        """Dense (n_docs x n_buckets) token-occurrence count matrix."""
        import pyarrow.compute as pc

        n = len(texts)
        B = self.n_buckets
        counts = np.zeros(n * B, dtype=np.int64)
        ascii_mask = pc.string_is_ascii(texts).to_numpy(zero_copy_only=False)
        if ascii_mask.all():
            flat, offs = batch_word_hashes(texts)
            rows = np.repeat(
                np.arange(n, dtype=np.int64), np.diff(offs)
            )
            idx = rows * B + (flat % U64(B)).astype(np.int64)
            counts += np.bincount(idx, minlength=n * B)
            return counts.reshape(n, B)
        # mixed batch: ASCII fast path on the mask, per-doc fallback for
        # the rest — values identical to the fast path by the shared
        # FNV core (batch-layout independence is pinned in tests).
        # Fallback cost is O(tokens): per-doc flat indices accumulate
        # and ONE bincount lands them (a per-doc n*B bincount was
        # O(batch * buckets) per doc — review finding); only the
        # non-ASCII texts are ever converted to Python strings.
        if ascii_mask.any():
            fast_idx = np.flatnonzero(ascii_mask)
            flat, offs = batch_word_hashes(texts.filter(pa.array(ascii_mask)))
            rows = fast_idx[
                np.repeat(np.arange(fast_idx.shape[0], dtype=np.int64), np.diff(offs))
            ]
            idx = rows * B + (flat % U64(B)).astype(np.int64)
            counts += np.bincount(idx, minlength=n * B)
        slow_idx = np.flatnonzero(~ascii_mask)
        slow_texts = texts.take(pa.array(slow_idx)).to_pylist()
        parts = []
        for d, text in zip(slow_idx, slow_texts):
            words = tokenize(text)
            if not words:
                continue
            h = hash_strings_u64(words, mixed=False)
            parts.append(d * B + (h % U64(B)).astype(np.int64))
        if parts:
            counts += np.bincount(np.concatenate(parts), minlength=n * B)
        return counts.reshape(n, B)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [(self.out_id_col, pa.int64()), ("embedding", pa.list_(pa.float32()))]
        )
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        counts = self._counts(texts)
        # int64 counts -> float64 BLAS matmul (exact: values < 2^53),
        # cast to float32 (exact while |v| < 2^24 — a 16M-token bucket)
        emb = (counts.astype(np.float64) @ self.proj).astype(np.float32)
        flat = pa.array(emb.reshape(-1), pa.float32())
        lists = pa.FixedSizeListArray.from_arrays(flat, self.dim).cast(
            pa.list_(pa.float32())
        )
        return pa.table(
            {
                self.out_id_col: ids.cast(pa.int64()),
                "embedding": lists,
            }
        )


# per-process kernel cache for the task path: the frozen model is
# 16 KiB at the defaults, so a stateless-task stage with a
# process-cached kernel beats an actor pool (actor spawn, ~0.5 s each,
# dominated the 50k bench; the semdedup sketch matrix uses the same
# pattern). A REAL model (GBs, GPU) would flip this trade — that is
# what the EmbedKernel actor-pool form above remains for.
_KERNEL_CACHE: dict[tuple, EmbedKernel] = {}


def _cached_kernel(**kw) -> EmbedKernel:
    key = tuple(sorted(kw.items()))
    k = _KERNEL_CACHE.get(key)
    if k is None:
        k = _KERNEL_CACHE[key] = EmbedKernel(**kw)
    return k


def embed_docs(
    docs: Dataset,
    *,
    n_buckets: int = DEFAULT_N_BUCKETS,
    dim: int = DEFAULT_DIM,
    seed: int = EMBED_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_id_col: str = "vec_id",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
) -> Dataset:
    """docs -> canonical embeddings table (vec_id, embedding) as a
    streaming Dataset. Columns are pruned before the kernel so only
    (id, text) ships; output composes directly with ``semdedup``,
    ``stages/ann.py`` and ``pipelines/embindex.py``.

    ``concurrency=None`` (default) runs as STATELESS TASKS with a
    per-process cached kernel — right for the 16 KiB frozen model
    (actor spawn dominated short jobs; measured in BASELINE.md). Pass
    a concurrency to get the actor-pool form for heavyweight models;
    use an AUTOSCALING (min, max) tuple — a fixed pool sized at-or-
    above the session's CPU count starves the upstream read of CPUs
    and deadlocks the streaming executor (reproduced at 4/4)."""
    kw = {
        "n_buckets": n_buckets,
        "dim": dim,
        "seed": seed,
        "id_col": id_col,
        "text_col": text_col,
        "out_id_col": out_id_col,
    }
    pruned = docs.select_columns([id_col, text_col])
    if concurrency is None:
        return pruned.map_batches(
            lambda t, _kw=kw: _cached_kernel(**_kw)(t),
            batch_size=batch_size,
            batch_format="pyarrow",
        )
    return pruned.map_batches(
        EmbedKernel,
        fn_constructor_kwargs=kw,
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
    )
