"""Scrub-stage tests: pattern scan counts vs a naive ``re`` reference,
redaction output, JSON field extraction, nulls/empties/non-ASCII, and
partition invariance."""

from __future__ import annotations

import re

import pyarrow as pa
import pytest
import ray.data as rd

TEXTS = [
    "mail a.b-c@ex-ample.co.uk or x@y.io; call +1 (555) 123-4567 now",
    "ip 10.0.255.1 and 999.1.1.1 and 1.2.3.4.5",
    "",
    "nothing personal here",
    '{"k": 87, "email": "Ünïcode ü@x.de"}',
    "digits 123 456 and 789",
]


def _mk(texts, n_blocks: int = 1, key: str = "doc_id", text_col: str = "text"):
    ds = rd.from_arrow(
        pa.table({key: pa.array(range(len(texts)), pa.int64()), text_col: texts})
    )
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_scan_counts_match_re(ray_session):
    from raydedup.stages.scrub import PII_PATTERNS, scan_patterns

    pats = dict(PII_PATTERNS, number=r"[0-9]+")
    df = (
        scan_patterns(_mk(TEXTS), key_col="doc_id", text_col="text", patterns=pats)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(df) == len(TEXTS)
    for name, pat in pats.items():
        want = [len(re.findall(pat, t)) for t in TEXTS]
        assert df[f"n_{name}"].tolist() == want, name
    want_any = [
        any(re.search(p, t) for p in pats.values()) for t in TEXTS
    ]
    assert df["has_match"].tolist() == want_any


def test_scan_partition_invariance(ray_session):
    from raydedup.stages.scrub import scan_patterns

    one = (
        scan_patterns(_mk(TEXTS, 1), key_col="doc_id", text_col="text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    many = (
        scan_patterns(_mk(TEXTS, 5), key_col="doc_id", text_col="text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)


def test_redact_matches_re_sub(ray_session):
    from raydedup.stages.scrub import PII_REDACTIONS, redact_patterns

    df = (
        redact_patterns(_mk(TEXTS), key_col="doc_id", text_col="text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = []
    for t in TEXTS:
        for pat, repl in PII_REDACTIONS.values():
            t = re.sub(pat, repl, t)
        want.append(t)
    assert df["redacted"].tolist() == want
    # every raw digit is gone after the number rule
    assert not any(re.search(r"[0-9]", t) for t in df["redacted"])


def test_redact_null_text(ray_session):
    from raydedup.stages.scrub import redact_patterns

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["x 5", None], pa.string()),
            }
        )
    )
    df = redact_patterns(ds, key_col="doc_id", text_col="text").to_pandas()
    assert sorted(df["redacted"].tolist()) == ["", "x <NUM>"]


def test_extract_int_field(ray_session):
    from raydedup.stages.scrub import extract_int_field

    texts = ['{"k": 87}', '{"k": -3, "z": 1}', "no field", "", '{"k": 0}']
    ds = extract_int_field(
        _mk(texts, 2),
        key_col="doc_id",
        text_col="text",
        pattern=r'"k":\s*(?P<k>-?[0-9]+)',
        group="k",
        out_col="k",
    )
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["k"].tolist()[:2] == [87, -3]
    assert df["k"].isna().tolist() == [False, False, True, True, False]
    assert df["k"].tolist()[4] == 0


def test_extract_carry_columns(ray_session):
    from raydedup.stages.scrub import extract_int_field

    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "event_type": ["a", "b"],
                "props": ['{"k": 5}', '{"k": 7}'],
            }
        )
    )
    df = (
        extract_int_field(
            ds,
            key_col="event_id",
            text_col="props",
            pattern=r'"k":\s*(?P<k>-?[0-9]+)',
            group="k",
            out_col="k",
            carry=("event_type",),
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert df["event_type"].tolist() == ["a", "b"]
    assert df["k"].tolist() == [5, 7]


def test_empty_patterns_rejected(ray_session):
    from raydedup.stages.scrub import redact_patterns, scan_patterns

    with pytest.raises(ValueError):
        scan_patterns(_mk(["x"]), key_col="doc_id", text_col="text", patterns={})
    with pytest.raises(ValueError):
        redact_patterns(_mk(["x"]), key_col="doc_id", text_col="text", rules={})
