"""Throughput benchmark: batched reads vs a static POA graph on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Configs (BASELINE.md shapes, scaled to one chip):

* uniform      — ~6k-node POA graph from 5 kb sequences; 1024 reads of
                 ~5 kb at ~10% divergence, scored exactly by the banded
                 Pallas wavefront fill (verify-and-retry keeps it exact).
                 This is the headline metric.
* mixed_div    — same graph; 95% of reads at ~2% divergence, 5% at ~15%:
                 exercises the tiered retry (low-divergence bulk resolves
                 in narrow bands; only the tail refills wide).
* mixed_len_sv — graph carries a 4 kb-deletion allele; reads come from
                 both alleles (~1 kb and ~5 kb): exercises the per-read
                 drifting windows (width stops paying the length spread).

Metrics: ``value`` is EFFECTIVE DP cells/s (full-fill-equivalent cells
credited to the banded engine because its scores are verified exact);
``raw_cells_per_sec`` counts only cells actually filled (the kernel-speed
number); ``reads_per_sec`` is the serving rate.  ``vs_baseline`` is
reads/s versus the native C++ exact engine on a 16-read sample
(single core; same algorithm family as the reference Rust aligner, which
publishes no numbers of its own — see BASELINE.md).

Timing notes: every iteration ends with a device->host copy of the
scores; block_until_ready() alone can return early on tethered
single-chip setups, and the copy is what a real mapping pipeline pays
per batch anyway.
"""

import json
import random
import sys
import time

sys.path.insert(0, ".")


def _mutate(rng, s, d, target_len=None):
    out = []
    for ch in s:
        r = rng.random()
        if r < d:
            continue
        out.append(rng.choice("ACGT") if r < 2.5 * d else ch)
        if rng.random() < d:
            out.append(rng.choice("ACGT"))
    s2 = "".join(out)
    if target_len is not None:
        s2 = s2[:target_len]
    return s2 or "A"


def _fuse(graph, seq, costs, name):
    from poasta_tpu.native import NativeAligner

    _, alignment, _ = NativeAligner(graph).align(seq, costs)
    graph.add_alignment_with_weights(name, seq, alignment, [1] * len(seq))


def build_uniform(costs, graph_len=5000, n_seqs=4, n_reads=1024, seed=7):
    from poasta_tpu.graphs import POAGraph

    rng = random.Random(seed)
    base = "".join(rng.choice("ACGT") for _ in range(graph_len))
    graph = POAGraph()
    graph.add_alignment_with_weights("s0", base.encode(), None,
                                     [1] * len(base))
    for i in range(1, n_seqs):
        _fuse(graph, _mutate(rng, base, 0.03, graph_len).encode(), costs,
              f"s{i}")
    reads = [_mutate(rng, base, 0.03, graph_len).encode()
             for _ in range(n_reads)]
    return graph, reads


def _time_scores(scorer, qshift, lengths, iters):
    """Median-of-N per-iteration wall + cells (tether jitter on this
    tunneled single-chip setup swings single runs ~2x; medians are the
    measurement protocol for every derived ratio below)."""
    import statistics

    import numpy as np

    scorer.scores(qshift, lengths)  # warm: compile + converge ub hint
    ts, raws = [], []
    for _ in range(iters):
        scorer.reset_stats()
        t0 = time.perf_counter()
        scores = scorer.scores(qshift, lengths)
        ts.append(time.perf_counter() - t0)
        raws.append(scorer.stats["cells_filled"])
    return np.asarray(scores), statistics.median(ts), statistics.median(raws)


def main():
    import numpy as np

    # fail fast (and report) if the tethered accelerator is unreachable —
    # device init otherwise blocks indefinitely and the bench looks hung
    from poasta_tpu.utils.device_probe import accelerator_available

    ok, detail = accelerator_available(timeout_s=900)
    if not ok:
        # no device numbers can be claimed, but record the
        # host-measurable native-engine figures (round-3 fill work) so
        # the artifact still carries this round's measured progress
        extras = {}
        try:
            import statistics

            from poasta_tpu.aligner import GapAffine
            from poasta_tpu.graphs import POAGraph
            from poasta_tpu.native import NativeAligner

            costs = GapAffine(4, 2, 6)
            rng = random.Random(11)
            base = "".join(rng.choice("ACGT") for _ in range(5000))
            graph = POAGraph()
            graph.add_alignment_with_weights("s0", base.encode(), None,
                                             [1] * 5000)
            na = NativeAligner(graph)
            qs = [_mutate(rng, base, 0.10).encode() for _ in range(4)]
            seeds = [na.align_banded(q, costs)[0] for q in qs]
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                for q, ub in zip(qs, seeds):
                    na.align_banded(q, costs, ub=ub, max_retries=1)
                ts.append((time.perf_counter() - t0) / len(qs))
            extras["native_hybrid_s_per_read_5kb"] = round(
                statistics.median(ts), 4)
        except Exception as exc:
            extras["native_probe_error"] = str(exc)[:120]
        print(json.dumps({
            "metric": "poa_affine_fill_cells_per_sec_per_chip",
            "value": 0,
            "unit": "cells/s",
            "vs_baseline": 0,
            "error": f"accelerator unavailable: {detail}",
            **extras,
        }))
        return

    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import pack_queries
    from poasta_tpu.graphs import POAGraph

    costs = GapAffine(4, 2, 6)
    extras = {}

    # blocked-lever visibility (VERDICT r3 #9): the int16 ring kernel's
    # toolchain verdict rides in every bench artifact
    try:
        from poasta_tpu.ops.pallas_fill import int16_probe_report

        extras.update(int16_probe_report())
    except Exception as exc:
        extras["int16_probe_error"] = str(exc)[:120]

    # --- uniform config (headline) ------------------------------------
    graph, reads = build_uniform(costs)
    flat = graph.flatten()
    scorer = BandedScorer(flat, costs)
    qshift, lengths = pack_queries(reads)
    scores, elapsed, raw_cells = _time_scores(scorer, qshift, lengths, 6)

    n_cells = flat.n_nodes * int(qshift.shape[1]) * len(reads)
    cells_per_sec = n_cells / elapsed
    reads_per_sec = len(reads) / elapsed
    extras["raw_cells_per_sec"] = round(raw_cells / elapsed)
    extras["reads_per_sec"] = round(reads_per_sec, 2)

    # Baseline: native (C++) exact engine — single-core, same A* algorithm
    # family and data structures as the reference's Rust implementation.
    # Rate from the MEDIAN per-read time: r03->r04 the mean-based figure
    # drifted 0.178 -> 0.2188 on contention alone and moved vs_baseline
    # 10390x -> 8532x with no device change (round-4 ADVICE).
    import statistics

    from poasta_tpu.native import NativeAligner

    na = NativeAligner(graph)
    sample = reads[:16]
    per_read = []
    for i, q in enumerate(sample):
        t0 = time.perf_counter()
        score, _, _ = na.align(q, costs)
        per_read.append(time.perf_counter() - t0)
        assert score == int(scores[i]), (score, int(scores[i]))
    host_reads_per_sec = 1.0 / statistics.median(per_read)
    extras["host_baseline_reads_per_sec"] = round(host_reads_per_sec, 4)
    extras["host_baseline_sample"] = len(sample)
    extras["host_baseline_protocol"] = "1/median_per_read_s"

    # --- hybrid end-to-end alignments (device scores + native seeded
    # backtrace — the lasagna long-read serving path; exercises round
    # 3's native fill work: row-pass, uninit tables, int16, tilted
    # insertion closure) ------------------------------------------------
    try:
        from poasta_tpu.parallel import BatchMapper

        hmap = BatchMapper(graph, costs)
        hsample = reads[:32]
        hout = hmap.align_batch(hsample)  # warm (device compile + seed)
        ts_h = []
        for _ in range(5):
            t0 = time.perf_counter()
            hout = hmap.align_batch(hsample)
            ts_h.append(time.perf_counter() - t0)
        el_h = statistics.median(ts_h)
        for i, (s, _aln) in enumerate(hout):
            assert s == int(scores[i]), (s, int(scores[i]))
        extras["hybrid_align_reads_per_sec"] = round(len(hsample) / el_h, 2)
        extras["hybrid_align_spread"] = [round(t, 4) for t in
                                         (min(ts_h), max(ts_h))]
    except AssertionError:
        raise  # a device-vs-native score mismatch must fail the run
    except Exception as exc:  # env-only leniency for the extra config
        extras["hybrid_align_error"] = str(exc)[:120]

    # --- mixed-divergence config (tiered retry) -----------------------
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(5000))
    gmix = POAGraph()
    gmix.add_alignment_with_weights("s0", base.encode(), None, [1] * 5000)
    _fuse(gmix, _mutate(rng, base, 0.02).encode(), costs, "s1")
    mixed = [
        _mutate(rng, base, 0.15 if i % 20 == 0 else 0.02).encode()
        for i in range(1024)
    ]
    fmix = gmix.flatten()
    smix = BandedScorer(fmix, costs)
    qm, lm = pack_queries(mixed)
    _, el_m, raw_m = _time_scores(smix, qm, lm, 5)
    extras["mixed_div_reads_per_sec"] = round(1024 / el_m, 2)
    extras["mixed_div_raw_cells_per_sec"] = round(raw_m / el_m)

    # --- mixed-length SV config (drifting windows) --------------------
    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(5000))
    variant = base[:500] + base[4500:]  # 4 kb deletion allele
    gsv = POAGraph()
    gsv.add_alignment_with_weights("s0", base.encode(), None, [1] * 5000)
    _fuse(gsv, variant.encode(), costs, "s1")
    sv_reads = [
        _mutate(rng, base if i % 2 else variant, 0.015).encode()
        for i in range(1024)
    ]
    fsv = gsv.flatten()
    qs, ls = pack_queries(sv_reads)
    ssv = BandedScorer(fsv, costs)
    sv_scores, el_s, raw_s = _time_scores(ssv, qs, ls, 5)
    extras["mixed_len_reads_per_sec"] = round(1024 / el_s, 2)
    shared = BandedScorer(fsv, costs)
    shared.DRIFT_MIN_SPREAD = 1 << 30
    sh_scores, el_sh, raw_sh = _time_scores(shared, qs, ls, 5)
    assert (sv_scores == sh_scores).all()
    extras["mixed_len_drift_cells_ratio"] = round(raw_sh / max(raw_s, 1), 2)
    extras["mixed_len_drift_speedup"] = round(el_sh / el_s, 2)

    # --- mixed-length bounded ends-free (drift x ef; VERDICT r2 #6) ---
    try:
        from poasta_tpu.aligner.costs import EndsFree, included

        cfg_ef = EndsFree(("unbounded", None), included(50), included(0),
                          included(50))
        sefd = BandedScorer(fsv, costs, aln_type=cfg_ef)
        ef_scores, el_e, raw_e = _time_scores(sefd, qs, ls, 5)
        sefs = BandedScorer(fsv, costs, aln_type=cfg_ef)
        sefs.DRIFT_MIN_SPREAD = 1 << 30  # shared-window reference
        efs_scores, el_es, raw_es = _time_scores(sefs, qs, ls, 5)
        assert (ef_scores == efs_scores).all()
        extras["ef_mixed_len_reads_per_sec"] = round(1024 / el_e, 2)
        extras["ef_drift_cells_ratio"] = round(raw_es / max(raw_e, 1), 2)
        extras["ef_drift_speedup"] = round(el_es / el_e, 2)
    except Exception as exc:  # never fail the bench on the extra config
        extras["ef_mixed_len_error"] = str(exc)[:120]

    # --- pangenome semi-global config (big kernel + anchored path) ----
    try:
        from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
        from poasta_tpu.parallel import BatchMapper

        rng = random.Random(17)
        N = 50_000
        pbase = "".join(rng.choice("ACGT") for _ in range(N))
        gp = POAGraph()
        gp.add_alignment_with_weights("s0", pbase.encode(), None, [1] * N)
        for v in range(0, N - 3, 500):
            gp.add_edge(v, v + 3, 0, 1)
        gp.post_process()
        preads = []
        for _ in range(64):
            a = rng.randrange(0, N - 5000)
            preads.append(_mutate(rng, pbase[a:a + 5000], 0.015).encode())
        cfgp = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
        pmap = BatchMapper(gp, costs, aln_type=cfgp)
        pmap.align_batch(preads)  # warm 1: compile + learn seed ub
        pmap.align_batch(preads)  # warm 2: compile the seeded corridor
        ts_p = []
        for _ in range(5):
            t0 = time.perf_counter()
            pout = pmap.align_batch(preads)
            ts_p.append(time.perf_counter() - t0)
        el_p = statistics.median(ts_p)
        extras["pangenome_semiglobal_reads_per_sec"] = round(64 / el_p, 2)
        extras["pangenome_spread"] = [round(t, 4) for t in
                                      (min(ts_p), max(ts_p))]
        extras["pangenome_graph_nodes"] = N
        # seeded-corridor engagement (round-4 VERDICT #2: an inert path
        # must never again look like a shipped win)
        sst = getattr(pmap, "last_seed_stats", None)
        extras["seed_engaged"] = bool(sst) and sst.get("seeded", 0) > 0
        if sst:
            extras["pangenome_seeded"] = sst.get("seeded", 0)
            extras["pangenome_seed_tail"] = sst.get("seed_tail", 0)
            extras["pangenome_seed_k"] = sst.get("seed_k", 0)
        _ = pout
    except Exception as exc:  # never fail the bench on the extra config
        extras["pangenome_semiglobal_error"] = str(exc)[:120]

    print(json.dumps({
        "metric": "poa_affine_fill_cells_per_sec_per_chip",
        "value": round(cells_per_sec),
        "unit": "cells/s",
        "vs_baseline": round(reads_per_sec / max(host_reads_per_sec, 1e-9),
                             2),
        **extras,
    }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as exc:  # still emit the one JSON line, then
        # fail loudly — a drivers' artifact should never be a bare
        # traceback, and a correctness assert must not exit 0
        print(json.dumps({
            "metric": "poa_affine_fill_cells_per_sec_per_chip",
            "value": 0,
            "unit": "cells/s",
            "vs_baseline": 0,
            "error": f"{type(exc).__name__}: {str(exc)[:200]}",
        }))
        raise
