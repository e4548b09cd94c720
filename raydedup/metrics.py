"""Evaluation against planted-oracle corpora (the acceptance metric).

The north rule's gate — dup-pair recall >= 0.99 vs oracle cluster
assignments — as a reusable function (the analog of the reference's
scripted evaluation, ``resources/scripts/evaluation/evaluation.rb``:
seeded TP/TN split -> retrieval rate).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from raydedup.stages.extract import doc_ids_from_urls


def evaluate_against_oracle(
    clusters: pd.DataFrame,
    oracle_clusters_path: str,
    oracle_pairs_path: str,
    *,
    jaccard_tau: float = 0.8,
    containment_gate: float = 0.3,
) -> dict[str, Any]:
    """Score a (doc_id, cluster_id) assignment against the corpus oracle.

    Recall counts cluster co-membership over oracle pairs that the
    configured gates make detectable: exact/near pairs with true Jaccard
    >= tau, containment pairs with true coverage >= the gate.
    Boilerplate-twin pairs must NOT co-cluster (false-merge count).
    Unique docs must stay singletons (true-negative check).
    """
    oc = pq.read_table(oracle_clusters_path).to_pandas()
    op = pq.read_table(oracle_pairs_path).to_pandas()
    url2id = dict(zip(oc.url, doc_ids_from_urls(oc.url.tolist())))
    cmap = dict(zip(clusters.doc_id, clusters.cluster_id))

    def co(a: str, b: str) -> bool:
        return cmap[url2id[a]] == cmap[url2id[b]]

    incl = op[
        ((op.kind.isin(["exact", "near"])) & (op.jaccard_true >= jaccard_tau))
        | (
            (op.kind == "containment")
            & (op.get("containment_true", pd.Series(dtype=float)) >= containment_gate)
        )
    ]
    hits = sum(co(a, b) for a, b in zip(incl.a_url, incl.b_url))
    bp = op[op.kind == "boilerplate-twin"]
    merges = sum(co(a, b) for a, b in zip(bp.a_url, bp.b_url))
    uniq = oc[oc.variant == "unique"]
    broken_singletons = sum(cmap[url2id[u]] != url2id[u] for u in uniq.url)
    sub_gate = len(op) - len(incl) - len(bp)
    return {
        "recall": hits / max(len(incl), 1),
        "eligible_pairs": int(len(incl)),
        "recovered_pairs": int(hits),
        "boilerplate_false_merges": int(merges),
        "boilerplate_pairs": int(len(bp)),
        "broken_singletons": int(broken_singletons),
        "n_unique_docs": int(len(uniq)),
        "sub_gate_pairs_excluded": int(sub_gate),
    }
