"""Cross-corpus decontamination (pipelines/decontaminate.py): train
docs sharing word k-gram shingles with an eval corpus are flagged —
the query-against-index contract (cli/Query.java:60-93) on two
corpora."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.pipelines.decontaminate import decontaminate
from raydedup.stages.signatures import shingle_hashes


def _mkdocs(texts, start_id=0):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    range(start_id, start_id + len(texts)), pa.int64()
                ),
                "text": texts,
            }
        )
    )


def _naive(train_texts, eval_texts, cfg, min_hits=1):
    ev = set()
    for t in eval_texts:
        ev.update(shingle_hashes(t, cfg).tolist())
    rows = []
    for i, t in enumerate(train_texts):
        s = shingle_hashes(t, cfg)
        hits = int(np.isin(s, np.array(sorted(ev), dtype=np.uint64)).sum()) if ev else 0
        rows.append((i, int(s.shape[0]), hits, int(hits >= min_hits)))
    return rows


def _corpus(rng, n_train=60, n_eval=8, contaminated_every=5):
    words = [f"tok{i}" for i in range(300)]
    eval_texts = [
        " ".join(words[j] for j in rng.integers(0, 300, size=40))
        for _ in range(n_eval)
    ]
    train_texts = []
    for i in range(n_train):
        base = [words[j] for j in rng.integers(0, 300, size=50)]
        if i % contaminated_every == 0:
            # splice a verbatim 10-token span of some eval doc
            src = eval_texts[i % n_eval].split()
            base[20:20] = src[5:15]
        train_texts.append(" ".join(base))
    return train_texts, eval_texts


def test_broadcast_matches_naive(ray_session):
    rng = np.random.default_rng(11)
    train_texts, eval_texts = _corpus(rng)
    cfg = DedupConfig()
    got = (
        decontaminate(_mkdocs(train_texts), _mkdocs(eval_texts, 1000), cfg)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive(train_texts, eval_texts, cfg)
    assert len(got) == len(want)
    for (i, n_sh, hits, flag), row in zip(want, got.itertuples(index=False)):
        assert (row.doc_id, row.n_shingles, row.n_contaminated, row.contaminated) == (
            i,
            n_sh,
            hits,
            flag,
        )
    # every spliced doc is flagged; a 10-token splice yields >= 6 5-gram hits
    spliced = got[got.doc_id % 5 == 0]
    assert (spliced.n_contaminated >= 6).all()
    assert (spliced.contaminated == 1).all()


def test_exchange_matches_broadcast(ray_session):
    rng = np.random.default_rng(12)
    train_texts, eval_texts = _corpus(rng, n_train=40)
    cfg = DedupConfig()
    a = (
        decontaminate(
            _mkdocs(train_texts), _mkdocs(eval_texts, 1000), cfg, method="broadcast"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        decontaminate(
            _mkdocs(train_texts), _mkdocs(eval_texts, 1000), cfg, method="exchange"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert a.n_contaminated.sum() > 0  # corpus actually plants overlap


def test_auto_routes_to_exchange_on_large_eval(ray_session):
    rng = np.random.default_rng(13)
    train_texts, eval_texts = _corpus(rng, n_train=30)
    cfg = DedupConfig(decon_broadcast_max_keys=1)  # force the exchange route
    a = (
        decontaminate(_mkdocs(train_texts), _mkdocs(eval_texts, 1000), cfg)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        decontaminate(
            _mkdocs(train_texts),
            _mkdocs(eval_texts, 1000),
            DedupConfig(),
            method="broadcast",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_min_hits_threshold(ray_session):
    rng = np.random.default_rng(14)
    train_texts, eval_texts = _corpus(rng)
    cfg = DedupConfig()
    lo = decontaminate(
        _mkdocs(train_texts), _mkdocs(eval_texts, 1000), cfg, min_hits=1
    ).to_pandas()
    hi = decontaminate(
        _mkdocs(train_texts), _mkdocs(eval_texts, 1000), cfg, min_hits=10**9
    ).to_pandas()
    assert lo.contaminated.sum() > 0
    assert hi.contaminated.sum() == 0
    # counts identical; only the flag moves with the threshold
    assert lo.sort_values("doc_id").n_contaminated.tolist() == hi.sort_values(
        "doc_id"
    ).n_contaminated.tolist()


def test_empty_eval_and_empty_train(ray_session):
    cfg = DedupConfig()
    train = _mkdocs(["a b c d e f g", "h i j k l m n"])
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = decontaminate(train, empty, cfg).to_pandas()
    assert len(out) == 2
    assert (out.n_contaminated == 0).all() and (out.contaminated == 0).all()
    assert (out.n_shingles > 0).all()
    out2 = decontaminate(empty, train, cfg).to_pandas()
    assert len(out2) == 0


def test_scrub_spans(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.pipelines.decontaminate import decontaminate_scrub

    evald = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array(["the secret eval answer is forty two"], pa.large_string()),
            }
        )
    )
    train_rows = [
        # contains the eval 5-gram "the secret eval answer is" (+ more)
        (1, "PREFIX words here the secret eval answer is forty two SUFFIX words"),
        (2, "totally clean document with no overlap at all in any window"),
        (3, "short doc"),                      # < k tokens: untouched
        (4, ""),                               # empty
        (5, "héllo the secret eval answer is forty two wörld"),  # non-ASCII path
    ]
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in train_rows], pa.int64()),
                "text": pa.array([r[1] for r in train_rows], pa.large_string()),
            }
        )
    ).repartition(2)
    out = (
        decontaminate_scrub(train, evald, DedupConfig())
        .to_pandas()
        .sort_values("doc_id")
    )
    got = dict(zip(out.doc_id, out.text))
    rem = dict(zip(out.doc_id, out.n_removed))
    # every token covered by a shared 5-gram window is gone
    assert got[1] == "PREFIX words here SUFFIX words"
    assert rem[1] == 7  # 'the secret eval answer is forty two'
    assert "secret" not in got[1] and "forty" not in got[1]
    assert got[2] == train_rows[1][1]          # clean doc only ws-normalized
    assert rem[2] == 0
    assert got[3] == "short doc" and rem[3] == 0
    assert got[4] == "" and rem[4] == 0
    assert got[5] == "héllo wörld"  # non-ASCII path: span removed exactly
    assert rem[5] == 7
