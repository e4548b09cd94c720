"""Frozen pipeline configuration.

Analog of the reference's typed config-key system (Panako
``util/Key.java:43-439``: 85+ keys with defaults, overridable per run).
Here it is one frozen dataclass: every stage receives the same immutable
``DedupConfig`` so a run is fully reproducible from (input, config, seed).

Fixed by the north-star spec (BASELINE.json): 5-gram shingles, 128-perm
MinHash, 16 bands x 8 rows LSH, 64-bit SimHash.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling (analog of fingerprint packing, OlafEventPointProcessor.java:316-370)
    shingle_k: int = 5  # tokens per word shingle
    shingle_mode: str = "word"  # "word" | "char"
    char_shingle_k: int = 9  # chars per char shingle (when shingle_mode == "char")

    # --- MinHash (analog of the 64-bit fingerprint hash, OlafFingerprint.java:154-196)
    n_perms: int = 128
    minhash_seed: int = 0x5EED_0001
    # "classic" = n_perms multiply-shift permutations (reference-faithful,
    # SQL-mirrored); "oph" = one-permutation hashing with rotation
    # densification (Shrivastava & Li, ICML 2014): one pass over the
    # shingles instead of 128 — ~10x faster signature kernel at matched
    # (n_perms, banding) layout. Same downstream banding/verify path.
    minhash_scheme: str = "classic"  # "classic" | "oph"

    # --- LSH banding (replaces the LMDB hash->postings store,
    # PanakoStorageKV.java:204-228; +/-2 near-hash range scan -> band collision)
    n_bands: int = 16
    rows_per_band: int = 8  # n_bands * rows_per_band == n_perms

    # --- SimHash (secondary near-hash family; Hamming verify via util/Hamming.java:74-83)
    simhash_bits: int = 64
    simhash_max_hamming: int = 3

    # --- verification (analog of min-hit + geometric verification gates,
    # OlafStrategy.java:331-453; here: exact Jaccard >= tau)
    jaccard_tau: float = 0.80
    min_band_collisions: int = 1  # analog of MIN_HITS_UNFILTERED (Key.java:187)
    # candidate-doc count below which verification broadcasts the texts
    # (one zero-copy plasma object, copied once per node) instead of the
    # two-round hash-exchange join; the exchange remains the 10^12 path
    verify_broadcast_max_docs: int = 150_000

    # --- ingress normalization (M8 canonical-format surface on text;
    # stages/textnorm.py). When set, run_dedup/run_dedup_scale replace
    # the text column with its typographically-normalized form (and
    # recompute text_sha256) BEFORE any stage, so signatures, verify
    # re-shingling, containment winnowing and the exact pass all see the
    # one canonical text. Default off: byte-faithful to the extractor.
    normalize: bool = False

    # --- skew handling (north-rule requirement; reference has none --
    # a hot LMDB key is just a long duplicate chain, PanakoStorageKV.java:335-370)
    # Hot-key policy: runs above max_band_postings are degenerate
    # boilerplate -> dropped + counted (a 1000-posting band would emit
    # 500k junk pairs). Runs between salt_band_postings and the cap are
    # "hot": they stay correct because pair emission is a vectorized
    # kernel over a hash BUCKET (~1/64th of the keyspace), so one hot
    # run costs one numpy triu, not a straggler task; the count of such
    # runs is surfaced in band_size_stats()/containment_stats() metrics.
    max_band_postings: int = 1000
    salt_band_postings: int = 200
    # Over-cap run RECOVERY (SURVEY §4's salting alternative, off by
    # default — the default policy drops+counts): instead of dropping
    # an over-cap run, split its distinct-signature reps into
    # consecutive sub-groups of ``hot_run_group`` (sig order,
    # deterministic), emit the full clique within each sub-group plus
    # the run-min anchor rep replicated into every sub-group, and keep
    # the star edges. Pair volume is O(n_reps * hot_run_group) instead
    # of O(n_reps^2); anything similar to the anchor still merges
    # globally and verification filters the rest, so recall on genuine
    # near-dup families inside hot runs is recovered at a bounded
    # fan-out cost (tests/test_candidates.py pins it).
    recover_hot_runs: bool = False
    hot_run_group: int = 32

    # --- containment / suffix pass (analog of monitor windowing,
    # OlafStrategy.java:561-573: 25 s windows, 5 s overlap)
    containment_window: int = 40  # chars per rolling-hash window
    containment_stride: int = 32  # winnowing stride on the probe side
    containment_min_coverage: float = 0.20  # analog of percentOfSecondsWithMatches >= 0.2 (Key.java:205)
    # absolute floor on SHARED winnowed fingerprints per containment
    # link. Default 1 = the pure ratio gate (the reference's rule, and
    # what every SQL oracle mirrors). Short-doc corpora need 2: a
    # ~200-char doc carries only ~5 windows, so ONE chance window
    # collision already clears the 0.2 ratio — measured at 25M docs
    # (BASELINE.md round 5: ~430 spurious cross-corpus links per 1.5M
    # singletons at min_shared=1, 0 at 2; real contained fragments
    # share every window of the fragment and are unaffected).
    containment_min_shared: int = 1
    containment_max_postings: int = 10  # fp keys shared by more docs are site-wide boilerplate -> dropped
    substring_min_len: int = 64  # exact full-substring pass: min inner-doc bytes

    # --- decontamination (graft extension; eval-set k-gram overlap)
    # eval shingle-key sets up to this size broadcast (one sorted u64
    # array in plasma, ~8 B/key -> 400 MB at the cap); larger eval sets
    # route to the posting exchange
    decon_broadcast_max_keys: int = 50_000_000

    # --- clustering (graft extension; reference emits pairs only)
    cluster_backend: str = "driver"  # "driver" | "actors"
    n_cluster_shards: int = 8

    # --- pipeline dispatch: run_dedup_auto routes to the refs-only
    # run_dedup_scale at or above this doc count. Round-4 remeasurement
    # (32 CPUs, containment on, adaptive exchange width + early shard
    # spawn + single-task pointer collapse): the scale path now WINS at
    # every size tried — 1k 1.51 s vs 1.76, 5k 1.90 vs 2.14, 20k 2.35
    # vs 2.63, 50k 4.06 vs 4.51 — so the old 500k crossover is gone and
    # the default drops to 10k (VERDICT r3 #2). The residual threshold
    # only keeps trivially small inputs on the simpler driver-assisted
    # path; the scale route is the default wherever size matters and is
    # the only variant whose driver memory is corpus-independent.
    scale_min_docs: int = 10_000

    # --- streaming phase-1 (VERDICT r4 #3): at or above this doc count
    # run_dedup_auto asks run_dedup_scale to cache the corpus ONCE as
    # disk-backed parquet under ``stream_spill_dir`` (a streaming
    # write — blocks land on disk as their tasks finish) and consume it
    # lazily per stage, instead of pinning a full materialized copy in
    # the object store for the whole run. Peak object-store usage then
    # tracks the largest exchange, not the corpus (measured in
    # BASELINE.md). Requires ``stream_spill_dir``; with the dir unset
    # (default) the engine materializes as before — re-reading from
    # disk is the right trade only when the corpus outgrows the store.
    scale_stream_min_docs: int = 5_000_000
    stream_spill_dir: str | None = None

    # --- exact-dup-aware signature skip (scale path only, opt-in):
    # barrier the (cheap) sha exchange, broadcast the sorted member-id
    # array, and drop exact-dup MEMBERS inside the signature kernel —
    # signature + posting + pair work then scales with UNIQUE texts
    # (members reattach via the sha edges; clusters are identical by
    # the same representative-mirror argument as the demand-side drop).
    # Measured (500k docs, 32 CPUs, min-of-3 interleaved, BASELINE.md):
    # at the bench corpus's 12.6% member share the effect is within
    # host noise (12.8 vs 12.3 s); at a recrawl-heavy 35% share the
    # flag is 1.17x end-to-end (12.26 -> 10.52 s) with candidate
    # volume down 56%. Default OFF: the win only appears above the
    # bench mix's dup rate, and the conservative default keeps the
    # candidate-volume metrics comparable across rounds. The broadcast
    # is 8 B/member — beyond ~10^9 members route the drop through the
    # existing co-partitioned demand-side filter instead.
    sig_skip_exact_members: bool = False

    # --- execution
    batch_size: int = 4096
    target_block_rows: int = 65536
    signature_concurrency: int | None = None  # None -> stateless tasks

    # --- corpus / ids
    id_seed: int = 0x5EED_0002

    def __post_init__(self) -> None:
        if self.n_bands * self.rows_per_band != self.n_perms:
            raise ValueError("n_bands * rows_per_band must equal n_perms")

    def with_overrides(self, **kw: Any) -> "DedupConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = DedupConfig()
