"""Naive-Bayes classifier tests: naive-reference score parity, learned
separation on a planted per-class vocabulary, deterministic min-name
tie break, partition invariance, and degenerate inputs (single class,
empty text, unknown test-only tokens)."""

import numpy as np
import pyarrow as pa

from raydedup.stages.nbayes import nb_classify


def _docs_ds(rd, rows, parts=4):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _bl(x: int) -> int:
    return int(x).bit_length() - 1


def _naive(rows, test_mod=5):
    train = [r for r in rows if r[0] % test_mod != 0]
    test = [r for r in rows if r[0] % test_mod == 0]
    nd, cnt, ncls = {}, {}, {}
    for _, text, c in train:
        nd[c] = nd.get(c, 0) + 1
        for w in text.lower().split():
            cnt[(c, w)] = cnt.get((c, w), 0) + 1
            ncls[c] = ncls.get(c, 0) + 1
    n_train = sum(nd.values())
    classes = sorted(nd)
    out = {}
    for did, text, actual in test:
        best_c, best_s = None, None
        for c in classes:
            s = _bl(nd[c] + 1) - _bl(n_train + 1)
            for w in text.lower().split():
                s += _bl(cnt.get((c, w), 0) + 1) - _bl(ncls.get(c, 0) + 1)
            if best_s is None or s > best_s:  # classes ascending: ties keep first
                best_c, best_s = c, s
        out[did] = (actual, best_c, best_s)
    return out


def _corpus(seed=21):
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = {c: [f"{c}tok{i}" for i in range(12)] for c in ("alpha", "beta", "gamma")}
    shared = [f"com{i}" for i in range(6)]
    rows = []
    for d in range(90):
        c = ("alpha", "beta", "gamma")[d % 3]
        words = rng.choice(vocab[c] + shared, size=20).tolist()
        rows.append((d, " ".join(words), c))
    rows.append((100, "", "alpha"))           # empty test doc (100 % 5 == 0)
    rows.append((105, "zzz unseen tokens", "beta"))  # unknown-vocab test doc
    return rows


def test_matches_naive_reference(ray_session):
    import ray.data as rd

    rows = _corpus()
    df = (
        nb_classify(_docs_ds(rd, rows))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    ref = _naive(rows)
    assert set(df.index) == set(ref)
    for did, (actual, pred, score) in ref.items():
        assert df.loc[did, "actual"] == actual
        assert df.loc[did, "predicted"] == pred, did
        assert int(df.loc[did, "score_bits"]) == score
        assert int(df.loc[did, "correct"]) == int(pred == actual)


def test_learns_planted_separation(ray_session):
    import ray.data as rd

    rows = _corpus(seed=33)
    df = nb_classify(_docs_ds(rd, rows)).to_pandas()
    planted = df[df["doc_id"] < 90]
    assert planted["correct"].mean() == 1.0  # fully separable vocab


def test_partition_invariance(ray_session):
    import ray.data as rd

    rows = _corpus(seed=5)
    a = (
        nb_classify(_docs_ds(rd, rows, parts=2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        nb_classify(_docs_ds(rd, rows, parts=13))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_tie_breaks_to_smallest_class_name(ray_session):
    import ray.data as rd

    # two classes with IDENTICAL training text -> identical scores for
    # every test doc; the contract picks the lexicographically smaller
    rows = [
        (1, "x y z", "bbb"), (2, "x y z", "aaa"),
        (3, "x y z", "bbb"), (4, "x y z", "aaa"),
        (0, "x y", "bbb"), (5, "x y", "aaa"),
    ]
    df = nb_classify(_docs_ds(rd, rows, parts=2)).to_pandas()
    assert (df["predicted"] == "aaa").all()


def test_single_class_and_empty(ray_session):
    import ray.data as rd

    rows = [(i, "a b c", "only") for i in range(10)]
    df = nb_classify(_docs_ds(rd, rows)).to_pandas()
    assert (df["predicted"] == "only").all()
    assert (df["correct"] == 1).all()
