"""Content drift: naive set reference, duplicate-url rule, one-sided
urls, short docs, partition invariance."""

import pyarrow as pa

import ray.data as rd

from raydedup.stages.contentdrift import content_drift


def _side(rows, n_blocks=2):
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.large_string()),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


def _jac(a, b, k=5):
    def sh(s):
        w = s.lower().split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa and sb else None


def test_drift(ray_session):
    base = "the quick brown fox jumps over the lazy dog in the yard today"
    old = [
        ("u1", base),
        ("u2", base),
        ("u3", "totally different original content for this url right here now"),
        ("u4", "short doc"),                 # < 5 tokens: excluded
        ("u5", base),                        # only in old: excluded
        ("u6", base),                        # duplicate url in old: keep min text
        ("u6", "aaa " + base),
    ]
    new = [
        ("u1", base),                                        # unchanged -> 1.0
        ("u2", base + " appended drift words one two three"),  # drifted
        ("u3", "rewritten page about cooking pasta with olive oil tonight folks"),
        ("u4", "tiny"),
        ("u6", base),
        ("u7", base),                        # only in new: excluded
    ]
    out = content_drift(_side(old), _side(new)).to_pandas().set_index("url")
    assert list(out.index) == ["u1", "u2", "u3", "u6"]
    assert out.loc["u1"].jaccard == 1.0
    assert abs(out.loc["u2"].jaccard - _jac(base, new[1][1])) < 1e-12
    assert out.loc["u3"].jaccard == 0.0
    # duplicate old url resolved to min text ("aaa ..." < base? 'a'<'t' yes)
    assert abs(out.loc["u6"].jaccard - _jac("aaa " + base, base)) < 1e-12
    # partition invariance
    out2 = content_drift(_side(old, 1), _side(new, 5)).to_pandas().set_index("url")
    assert out.equals(out2)


def test_diff_content_verb(ray_session, small_corpus, tmp_path, capsys, monkeypatch):
    import json

    import raydedup.cli as cli

    monkeypatch.setattr(cli, "_shutdown_ray", lambda: None)
    _, paths = small_corpus
    # corpus against itself: zero drift
    assert cli.main(["diff", paths["pages"], paths["pages"], "--content"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["urls"] == 600 and out["drifted"] == 0
