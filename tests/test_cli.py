"""CLI surface tests: verb wiring + typed ``--set`` config overrides
(the analog of the reference's per-run property overrides,
``cli/Panako.java:247-268``)."""

import json
import os

import pytest

from raydedup.cli import _cfg_from_args, build_parser, main


def _ns(**kw):
    import argparse

    return argparse.Namespace(**kw)


def test_set_parses_typed_values():
    cfg = _cfg_from_args(
        _ns(set=["jaccard_tau=0.7", "n_bands=32", "rows_per_band=4", "shingle_mode=char"])
    )
    assert cfg.jaccard_tau == 0.7
    assert cfg.n_bands == 32 and cfg.rows_per_band == 4
    assert cfg.shingle_mode == "char"


def test_set_rejects_unknown_key_and_bad_syntax():
    with pytest.raises(SystemExit):
        _cfg_from_args(_ns(set=["no_such_key=1"]))
    with pytest.raises(SystemExit):
        _cfg_from_args(_ns(set=["jaccard_tau"]))


def test_set_defaults_to_plain_config():
    from raydedup.config import DedupConfig

    assert _cfg_from_args(_ns(set=None)) == DedupConfig()


def test_dedup_verb_set_changes_verified_pairs(
    ray_session, small_corpus, tmp_path, capsys, monkeypatch
):
    """`dedup --set jaccard_tau=...` must change the verified-pair count
    (a lower tau admits more near-dup pairs)."""
    import raydedup.cli as cli

    # keep the session-scoped Ray fixture alive through main()'s finally
    monkeypatch.setattr(cli, "_shutdown_ray", lambda: None)
    spec, paths = small_corpus

    def run(tau: float, ck: str) -> dict:
        rc = main(
            [
                "dedup",
                paths["pages"],
                str(tmp_path / ck),
                "--no-containment",
                "--set",
                f"jaccard_tau={tau}",
                "--set",
                "batch_size=256",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    strict = run(0.95, "ck_strict")
    loose = run(0.55, "ck_loose")
    n_strict = strict["pairs"]["n_verified"]
    n_loose = loose["pairs"]["n_verified"]
    assert n_loose > n_strict


def test_increment_verb_wiring():
    from raydedup.cli import cmd_increment

    p = build_parser()
    args = p.parse_args(["increment", "/tmp/idx", "/tmp/cl", "/tmp/pages"])
    assert args.fn is cmd_increment
    assert (args.index, args.clusters, args.pages) == ("/tmp/idx", "/tmp/cl", "/tmp/pages")
