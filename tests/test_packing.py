"""Sequence packing: greedy reference, oversized docs, zero-token docs,
budget invariants, and partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from raydedup.hashing import U64, mix64
from raydedup.stages.packing import greedy_pack_bounds, pack_sequences


def _greedy_ref(tokens: list[int], budget: int) -> list[tuple[int, int]]:
    """(pack_id, pack_pos) per doc — direct transcription of the rule."""
    out, pack, pos, acc = [], 0, 0, 0
    for i, t in enumerate(tokens):
        if i > 0 and acc + t > budget:
            pack, pos, acc = pack + 1, 0, t
        else:
            pos = pos if i == 0 else pos + 1
            acc += t
        out.append((pack, pos))
    return out


def test_bounds_match_reference():
    rng = np.random.default_rng(3)
    for _ in range(20):
        toks = rng.integers(0, 900, size=int(rng.integers(0, 40))).tolist()
        if toks and rng.random() < 0.5:
            toks[int(rng.integers(len(toks)))] = 5000  # oversized
        starts = greedy_pack_bounds(np.asarray(toks, dtype=np.int64), 2048)
        ref = _greedy_ref(toks, 2048)
        got = []
        for i in range(len(toks)):
            p = int(np.searchsorted(starts, i, side="right")) - 1
            got.append((p, i - int(starts[p])))
        assert got == ref


def test_pack_sequences_end_to_end(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    texts = [" ".join(["w"] * int(rng.integers(1, 600))) for _ in range(n)]
    texts[5] = ""  # zero tokens
    texts[9] = " ".join(["w"] * 4000)  # oversized
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(6)
    out = pack_sequences(docs, budget=2048, n_buckets=8).to_pandas()
    assert len(out) == n
    assert out.doc_id.tolist() == sorted(ids.tolist())

    # per-bucket greedy reference over doc_id order
    tok_by_id = {
        int(i): (0 if not t.strip() else len(t.split())) for i, t in zip(ids, texts)
    }
    buckets = (mix64(ids.view(U64)) % U64(8)).astype(np.int64)
    b_by_id = dict(zip(ids.tolist(), buckets.tolist()))
    for b in range(8):
        sub = out[out.bucket == b].sort_values("doc_id")
        members = [int(i) for i in sorted(ids.tolist()) if b_by_id[i] == b]
        assert sub.doc_id.tolist() == members
        ref = _greedy_ref([tok_by_id[i] for i in members], 2048)
        assert list(zip(sub.pack_id, sub.pack_pos)) == ref
        # budget invariant: multi-doc packs never exceed the budget
        for pid, grp in sub.groupby("pack_id"):
            assert len(grp) == 1 or grp.n_tokens.sum() <= 2048

    # n_tokens matches the whitespace rule
    assert all(out.set_index("doc_id").n_tokens[i] == tok_by_id[i] for i in ids)


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(13)
    texts = [" ".join(["x"] * int(rng.integers(0, 300))) for _ in range(150)]
    tbl = pa.table(
        {"doc_id": np.arange(150, dtype=np.int64), "text": texts}
    )
    a = pack_sequences(rd.from_arrow(tbl).repartition(1), budget=512, n_buckets=4)
    b = pack_sequences(rd.from_arrow(tbl).repartition(11), budget=512, n_buckets=4)
    assert a.equals(b)


def test_empty_input(ray_session):
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = pack_sequences(docs, budget=128, n_buckets=4)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "bucket", "pack_id", "pack_pos", "n_tokens"]


def test_pack_cli_verb(ray_session, small_corpus, tmp_path, capsys, monkeypatch):
    import json

    import pyarrow.parquet as pq

    import raydedup.cli as cli
    from raydedup.cli import main

    monkeypatch.setattr(cli, "_shutdown_ray", lambda: None)
    _spec, paths = small_corpus
    out = str(tmp_path / "packs.parquet")
    rc = main(["pack", paths["pages"], out, "--budget", "512", "--buckets", "4"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    tbl = pq.read_table(out)
    assert info["docs"] == tbl.num_rows > 0
    assert tbl.schema.names == ["doc_id", "bucket", "pack_id", "pack_pos", "n_tokens"]
    df = tbl.to_pandas()
    assert info["packs"] == len(df.groupby(["bucket", "pack_id"]))
    # multi-doc packs respect the budget
    for _, grp in df.groupby(["bucket", "pack_id"]):
        assert len(grp) == 1 or grp.n_tokens.sum() <= 512
