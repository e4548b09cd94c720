"""Pinned signature-format vectors (FIXTURES.md §3; analog of the
reference's constant content-hash test, ``UtilsTest.java:35``):
regenerating fixtures/signature_vectors.json means the on-disk
index/signature format changed — bump checkpoint lineage versions."""

import json
import os

import numpy as np
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.hashing import fnv1a64
from raydedup.stages.containment import winnowed_fingerprints
from raydedup.stages.signatures import SignatureKernel, shingle_hashes

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures", "signature_vectors.json")


def test_signature_vectors_pinned():
    with open(FIX) as f:
        fix = json.load(f)
    cfg = DedupConfig()
    assert fix["config"]["minhash_seed"] == cfg.minhash_seed
    texts = fix["texts"]
    kernel = SignatureKernel(cfg)
    tbl = kernel(
        pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()), "text": texts})
    )
    for i, (t, want) in enumerate(zip(texts, fix["vectors"])):
        sh = shingle_hashes(t, cfg)
        assert [int(x) for x in sh[:4]] == want["shingles_first4"]
        assert int(sh.shape[0]) == want["n_shingles"]
        assert [int(x) for x in tbl.column("minhash")[i].as_py()[:8]] == want["minhash_first8"]
        assert int(np.uint64(tbl.column("simhash")[i].as_py())) == want["simhash"]
        assert [int(x) for x in tbl.column("bands")[i].as_py()[:4]] == want["band_keys_first4"]
        assert [int(x) for x in winnowed_fingerprints(t, 40, 16)[:4]] == want["winnowed_first4"]
        assert int(fnv1a64(t.encode())) == want["fnv_text"]


def test_oph_vectors_pinned():
    from raydedup.stages.signatures import oph_minhash_batch

    with open(FIX) as f:
        fix = json.load(f)
    cfg = DedupConfig()
    for t, want in zip(fix["texts"], fix["vectors"]):
        sig = oph_minhash_batch([shingle_hashes(t, cfg)], cfg.n_perms)[0]
        assert [int(x) for x in sig[:8]] == want["oph_first8"]
