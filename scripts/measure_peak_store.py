"""Peak object-store usage: streaming vs materialized phase-1.

Evidence for the streaming phase-1 bound (VERDICT r4 #3): runs
run_dedup_scale over the same synthetic corpus twice in THIS process
order (given on argv) while a background thread samples the plasma
usage reported by ray's memory summary; prints one JSON line per mode.
Run each mode in a FRESH process for honest peaks:

    python scripts/measure_peak_store.py materialize [n_docs]
    python scripts/measure_peak_store.py stream      [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plasma_used_bytes() -> int:
    # single-node plasma lives in /dev/shm (verified: a 200 MiB
    # materialize moves /dev/shm used by exactly 200 MiB); sampling the
    # filesystem needs no grpc/dashboard machinery
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "materialize"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    assert mode in ("materialize", "stream"), mode

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DedupConfig
    from raydedup.corpus import CorpusSpec, materialize_corpus
    from raydedup.pipelines.dedup_scale import run_dedup_scale
    from raydedup.sources.pages import pages_to_docs, read_pages

    corpus_dir = f"/tmp/raydedup_peakstore_corpus_{n_docs}"
    paths = materialize_corpus(
        corpus_dir, CorpusSpec(n_docs=n_docs, seed=1234), n_files=16
    )
    docs = pages_to_docs(read_pages(paths["pages"]))
    cfg = DedupConfig()

    peak = [0]
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            try:
                peak[0] = max(peak[0], _plasma_used_bytes())
            except Exception:
                pass
            time.sleep(0.25)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    spill = f"/tmp/raydedup_peakstore_spill_{n_docs}"
    shutil.rmtree(spill, ignore_errors=True)
    kw = {"stream_spill_dir": spill} if mode == "stream" else {}
    res = run_dedup_scale(docs, cfg, containment=True, **kw)
    n_out = res.clusters.count()
    dt = time.perf_counter() - t0
    stop.set()
    th.join(timeout=2)
    print(
        json.dumps(
            {
                "mode": mode,
                "n_docs": n_docs,
                "n_out": n_out,
                "wall_sec": round(dt, 3),
                "peak_plasma_bytes": peak[0],
                "peak_plasma_mib": peak[0] >> 20,
                "n_dup_docs": res.metrics.get("n_dup_docs"),
            }
        )
    )
    shutil.rmtree(spill, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
