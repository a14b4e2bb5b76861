"""Run the accelerator-only validation suite on the real TPU chip.

The pytest suite pins the CPU backend (tests/conftest.py) so the Pallas
kernel tests skip there; this runner executes them — plus an on-chip
cross-engine consistency pass — against the actual accelerator.

    python run_tpu_tests.py [--soak N]

--soak N additionally runs the randomized cross-engine consistency sweep
with N extra seeds on the chip.
"""

import re
import sys


def _run_test_file(path, names, param_calls=()):
    src = open(path).read()
    src = re.sub(r"pytestmark = pytest\.mark\.skipif\([^)]*\)\n", "", src,
                 flags=re.S)
    ns = {}
    exec(compile(src, path, "exec"), ns)
    for name in names:
        print(f"  {name} ...", end=" ", flush=True)
        ns[name]()
        print("OK")
    for name, args in param_calls:
        print(f"  {name}{args} ...", end=" ", flush=True)
        ns[name](*args)
        print("OK")


def main():
    # bounded probe first: on the tethered backend, device init blocks
    # indefinitely when the link is down, and this runner must report
    # that rather than hang
    from poasta_tpu.utils.device_probe import accelerator_available

    ok, detail = accelerator_available(timeout_s=900)
    if not ok:
        print(f"ERROR: no accelerator — {detail}")
        return 1

    from poasta_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend == "cpu":
        print("ERROR: no accelerator backend — nothing to validate here")
        return 1

    print("pallas kernel tests:")
    _run_test_file("tests/test_pallas_fill.py", [
        "test_pallas_matches_xla_scores",
        "test_pallas_2piece_matches_xla_scores",
    ], param_calls=[("test_pallas_free_ends_matches_xla", (True, True)),
                    ("test_pallas_free_ends_matches_xla", (True, False)),
                    ("test_pallas_free_ends_matches_xla", (False, True)),
                    ("test_pallas_2p_free_ends_matches_xla", (True, True)),
                    ("test_pallas_2p_free_ends_matches_xla", (True, False)),
                    ("test_pallas_2p_free_ends_matches_xla", (False, True))])

    print("on-chip consistency sweep:")
    sys.path.insert(0, "tests")
    import test_consistency as tc

    for seed in (101, 202):
        print(f"  one-piece seed {seed} ...", end=" ", flush=True)
        tc.test_all_engines_agree_one_piece(seed)
        print("OK")
    for seed in (404,):
        print(f"  two-piece seed {seed} ...", end=" ", flush=True)
        tc.test_all_engines_agree_two_piece(seed)
        print("OK")

    print("single-device mesh (shard_map around pallas kernels):")
    import random

    import numpy as np
    from jax.sharding import Mesh

    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import (
        DeviceGraph,
        dp_fill_scores,
        pack_queries,
    )
    from poasta_tpu.graphs import POAGraph
    from poasta_tpu.native import NativeAligner
    from poasta_tpu.parallel import make_sharded_score_fn

    costs = GapAffine(4, 2, 6)
    rng = random.Random(41)
    base = "".join(rng.choice("ACGT") for _ in range(500))

    def mutate(s, d=0.05):
        out = []
        for ch in s:
            r = rng.random()
            if r < d:
                continue
            out.append(rng.choice("ACGT") if r < 2 * d else ch)
            if rng.random() < d:
                out.append(rng.choice("ACGT"))
        return "".join(out) or "A"

    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * 500)
    for i in range(1, 3):
        s = mutate(base).encode()
        _, aln, _ = NativeAligner(g).align(s, costs)
        g.add_alignment_with_weights(f"s{i}", s, aln, [1] * len(s))
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    queries = [mutate(base).encode() for _ in range(64)]
    qshift, lengths = pack_queries(queries)
    full = np.asarray(dp_fill_scores(dg, qshift, lengths, costs))
    print("  dp-mesh pallas full fill ...", end=" ", flush=True)
    fn = make_sharded_score_fn(dg, costs, mesh)
    assert (np.asarray(fn(qshift, lengths)) == full).all()
    print("OK")
    print("  dp-mesh pallas banded fill ...", end=" ", flush=True)
    bs = BandedScorer(flat, costs, mesh=mesh)
    assert (np.asarray(bs.scores(qshift, lengths)) == full).all()
    print("OK")

    # the tilt/untilt and run-cap math is cost-parameterized — validate
    # the Mosaic-compiled banded route under random (x, e, o), not just
    # the defaults (twin of tests/test_pallas_interpret.py's
    # test_banded_tilted_randomized_costs)
    import random as _rnd

    for seed in (41, 43):
        rr = _rnd.Random(seed)
        rcosts = GapAffine(rr.randrange(1, 9), rr.randrange(1, 5),
                           rr.randrange(0, 12))
        print(f"  pallas banded, randomized costs {rcosts} ...", end=" ",
              flush=True)
        r_oracle = np.asarray(dp_fill_scores(dg, qshift, lengths, rcosts))
        r_bs = BandedScorer(flat, rcosts, dg=dg)
        assert (np.asarray(r_bs.scores(qshift, lengths)) == r_oracle).all()
        print("OK")

    print("drifting-window banded fill (pallas, mixed-length SV batch):")
    base2 = "".join(rng.choice("ACGT") for _ in range(2200))
    variant2 = base2[:300] + base2[1900:]  # 1.6 kb deletion allele
    g2 = POAGraph()
    g2.add_alignment_with_weights("s0", base2.encode(), None,
                                  [1] * len(base2))
    _, aln2, _ = NativeAligner(g2).align(variant2.encode(), costs)
    g2.add_alignment_with_weights("s1", variant2.encode(), aln2,
                                  [1] * len(variant2))
    flat2 = g2.flatten()
    dg2 = DeviceGraph.build(flat2)
    reads2 = []
    for i in range(64):
        src = base2 if i % 2 else variant2
        reads2.append(mutate(src, 0.015).encode())
    q2, l2 = pack_queries(reads2)
    oracle2 = np.asarray(dp_fill_scores(dg2, q2, l2, costs))
    print("  pallas drift scores == full fill ...", end=" ", flush=True)
    bs2 = BandedScorer(flat2, costs, dg=dg2)
    got2 = np.asarray(bs2.scores(q2, l2))
    assert (got2 == oracle2).all(), (got2, oracle2)
    assert not bs2._prep_cache.get(
        ("nodriftpallas", int(np.asarray(l2).min()),
         int(np.asarray(l2).max()))), \
        "pallas drift kernel fell back to the XLA body on this toolchain"
    print("OK")

    print("  big-banded kernel == standard banded (same windows) ...",
          end=" ", flush=True)
    from poasta_tpu.aligner.banded import band_windows
    from poasta_tpu.ops.pallas_fill import (
        pallas_banded_scores,
        pallas_banded_scores_big,
        prepare_banded,
        prepare_banded_big,
    )

    ws_s, wd_s, _, _ = band_windows(flat2, int(np.asarray(l2).min()),
                                    int(np.asarray(l2).max()), costs,
                                    800)
    ws_s = (ws_s // 128) * 128
    wd_s += 128
    Lq = int(q2.shape[1])
    prep_s = prepare_banded(dg2, costs, ws_s, wd_s, Lq)
    prep_b = prepare_banded_big(dg2, costs, ws_s, wd_s, Lq)
    a_std = np.asarray(pallas_banded_scores(dg2, q2, l2, costs,
                                            prep=prep_s))
    a_big = np.asarray(pallas_banded_scores_big(dg2, q2, l2, costs,
                                                prep_b))
    assert (a_std == a_big).all(), (a_std[:6], a_big[:6])
    print("OK")

    print("  chain-skip banded == standard banded (same windows) ...",
          end=" ", flush=True)
    a_cs = np.asarray(pallas_banded_scores(dg2, q2, l2, costs,
                                           prep=prep_s, chain_skip=True))
    assert (a_cs == a_std).all(), (a_cs[:6], a_std[:6])
    print(f"OK (chain_frac={prep_s['chain_frac']:.2f})")

    print("drifting-window banded fill (pallas, two-piece):")
    print("  pallas 2p drift scores == full fill ...", end=" ", flush=True)
    from poasta_tpu.aligner import GapAffine2Piece as _G2P

    c2p = _G2P(4, 2, 6, 1, 24)
    oracle2p = np.asarray(dp_fill_scores(dg2, q2, l2, c2p))
    bs2p = BandedScorer(flat2, c2p, dg=dg2)
    got2p = np.asarray(bs2p.scores(q2, l2))
    assert (got2p == oracle2p).all(), (got2p[:6], oracle2p[:6])
    assert not [k for k in bs2p._prep_cache
                if isinstance(k, tuple) and k
                and str(k[0]).startswith("nodrift")], \
        "2p drift pallas kernel fell back on this toolchain"
    print("OK")

    print("bounded ends-free pallas kernels:")
    from poasta_tpu.aligner.costs import (
        EndsFree,
        UNBOUNDED,
        excluded,
        included,
    )
    from poasta_tpu.aligner.wavefront import (
        dp_fill_full,
        dp_fill_scores_ends_free,
        ends_free_device_params,
    )

    ef_reads = []
    for _ in range(64):
        a = rng.randrange(0, 150)
        b = rng.randrange(a + 60, 500)
        ef_reads.append(mutate(base[a:b], 0.03).encode())
    qe, le = pack_queries(ef_reads)
    le_np = np.asarray(le)
    for cfg in (
        EndsFree(UNBOUNDED, UNBOUNDED, UNBOUNDED, UNBOUNDED),
        EndsFree(UNBOUNDED, included(25), UNBOUNDED, included(30)),
        EndsFree(UNBOUNDED, excluded(20), included(3), excluded(40)),
    ):
        print(f"  pallas bounded fill {cfg.qry_free_end}/"
              f"{cfg.graph_free_end} ...", end=" ", flush=True)
        fs, end_ok, jlo = ends_free_device_params(flat, cfg, le,
                                                  dg.n_nodes_padded)
        got = np.asarray(dp_fill_scores_ends_free(
            dg, flat, qe, le, costs, cfg, engine="pallas"))
        _, Mt, _, _ = dp_fill_full(dg, qe, le, costs, free_start=fs)
        Mt = np.asarray(Mt)
        eo = np.asarray(end_ok).astype(bool)
        jlo_np = np.asarray(jlo)
        for b in range(len(ef_reads)):
            n, lo = int(le_np[b]), int(jlo_np[b])
            sub = Mt[eo, b, lo:n + 1] if lo <= n else np.empty(0)
            want = int(sub.min()) if sub.size else (1 << 28)
            assert int(got[b]) == want, (b, int(got[b]), want)
        print("OK")

    print("  pallas bounded 2p fill == XLA 5-layer ...", end=" ",
          flush=True)
    from poasta_tpu.aligner import GapAffine2Piece

    costs2p = GapAffine2Piece(4, 2, 6, 1, 24)
    cfg2 = EndsFree(UNBOUNDED, included(25), UNBOUNDED, included(30))
    got2 = np.asarray(dp_fill_scores_ends_free(
        dg, flat, qe, le, costs2p, cfg2, engine="pallas"))
    ref2 = np.asarray(dp_fill_scores_ends_free(
        dg, flat, qe, le, costs2p, cfg2, engine="xla"))
    assert (got2 == ref2).all(), (got2[:8], ref2[:8])
    print("OK")

    print("  pallas banded ends-free ...", end=" ", flush=True)
    cfg = EndsFree(UNBOUNDED, included(40), UNBOUNDED, included(40))
    oracle_ef = np.asarray(dp_fill_scores_ends_free(
        dg, flat, qe, le, costs, cfg))
    bs_ef = BandedScorer(flat, costs, dg=dg, aln_type=cfg)
    got_ef = np.asarray(bs_ef.scores(qe, le))
    assert (got_ef == oracle_ef).all(), (got_ef, oracle_ef)
    print("OK")

    print("  pallas drift x bounded ends-free ...", end=" ", flush=True)
    cfg_de = EndsFree(UNBOUNDED, included(40), included(0), included(40))
    oracle_de = np.asarray(dp_fill_scores_ends_free(
        dg2, flat2, q2, l2, costs, cfg_de))
    bs_de = BandedScorer(flat2, costs, dg=dg2, aln_type=cfg_de)
    got_de = np.asarray(bs_de.scores(q2, l2))
    assert (got_de == oracle_de).all(), (got_de[:6], oracle_de[:6])
    assert not [k for k in bs_de._prep_cache
                if isinstance(k, tuple) and k
                and str(k[0]).startswith("nodrift")], \
        "drift-ef pallas kernel fell back on this toolchain"
    assert bs_de.stats["fills"] and not bs_de.stats["fullfill_fallbacks"]
    print("OK")

    print("big-graph kernel (HBM->SMEM chunked rank tables):")
    big_base = "".join(rng.choice("ACGT") for _ in range(60000))
    gb = POAGraph()
    gb.add_alignment_with_weights("s0", big_base.encode(), None,
                                  [1] * len(big_base))
    for v in range(0, 60000 - 3, 997):
        gb.add_edge(v, v + 3, 0, 1)
    gb.post_process()
    flatb = gb.flatten()
    dgb = DeviceGraph.build(flatb)
    big_reads = [mutate(big_base[i * 400:i * 400 + 1500], 0.02).encode()
                 for i in range(64)]
    qb, lb = pack_queries(big_reads)
    print("  60k-node semi-global big kernel == XLA oracle ...", end=" ",
          flush=True)
    cfgb = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    got_b = np.asarray(dp_fill_scores_ends_free(dgb, flatb, qb, lb, costs,
                                                cfgb))
    ref_b = np.asarray(dp_fill_scores_ends_free(dgb, flatb, qb, lb, costs,
                                                cfgb, engine="xla"))
    assert (got_b == ref_b).all(), (got_b[:8], ref_b[:8])
    print("OK")
    print("  60k-node global big kernel == XLA ...", end=" ", flush=True)
    got_g = np.asarray(dp_fill_scores(dgb, qb, lb, costs))
    ref_g = np.asarray(dp_fill_scores(dgb, qb, lb, costs, engine="xla"))
    assert (got_g == ref_g).all()
    print("OK")
    print("  end-anchor tracking + native corridor backtrace ...", end=" ",
          flush=True)
    from poasta_tpu.aligner.wavefront import (
        alignment_cost,
        dp_fill_ends_free_with_ends,
    )

    sc_b, er_b, ej_b = dp_fill_ends_free_with_ends(dgb, flatb, qb, lb,
                                                   costs, cfgb)
    sc_b = np.asarray(sc_b)
    er_b = np.asarray(er_b)
    ej_b = np.asarray(ej_b)
    assert (sc_b == ref_b).all()
    # anchor parity vs the XLA body (largest-offset tie-break fixed r3)
    sxb, erxb, ejxb = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dgb, flatb, qb, lb, costs, cfgb, engine="xla"))
    assert (sc_b == sxb).all() and (er_b == erxb).all() \
        and (ej_b == ejxb).all(), (er_b[:8], erxb[:8], ej_b[:8], ejxb[:8])
    nab = NativeAligner(gb)
    for b in (0, 17, 63):
        score, aln = nab.align_anchored(
            big_reads[b], costs, int(flatb.node_of_rank[er_b[b]]),
            int(ej_b[b]), int(sc_b[b]))
        assert score == sc_b[b]
        assert alignment_cost(gb, big_reads[b], aln, costs) == score
    print("OK")
    print("  insertion-run-capped bounded fill (r3) ...", end=" ",
          flush=True)
    # a deliberately tiny cap must only RAISE scores; reads it does not
    # bind keep exact scores AND identical anchors (the ladder's
    # exactness contract, mapper._fill_ends_free_capped)
    scap, ercap, ejcap = (np.asarray(a) for a in
                          dp_fill_ends_free_with_ends(
                              dgb, flatb, qb, lb, costs, cfgb,
                              engine="pallas", max_run=64))
    assert (scap >= sc_b).all(), (scap[:8], sc_b[:8])
    same = scap == sc_b
    assert same.any(), "cap=64 bound every read — widen the test config"
    assert (ercap[same] == er_b[same]).all()
    assert (ejcap[same] == ej_b[same]).all()
    # mapper-level ladder: exact end-to-end against the uncapped fill
    from poasta_tpu.parallel import BatchMapper

    bm = BatchMapper(gb, costs, aln_type=cfgb)
    sl, el_, jl_ = bm._fill_ends_free_capped(qb, lb, False)
    assert (sl == sc_b).all() and (el_ == er_b).all() \
        and (jl_ == ej_b).all()
    print("OK")

    print("  two-piece end anchors + 2p native corridor ...", end=" ",
          flush=True)
    from poasta_tpu.aligner.costs import GapAffine2Piece

    costs2p = GapAffine2Piece(4, 2, 8, 1, 24)
    # engine='pallas' raises on fallback: proves the big 2p with-ends
    # kernel (round 3) actually serves this path
    sc2, er2, ej2 = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dgb, flatb, qb, lb, costs2p, cfgb, engine="pallas"))
    ref2 = np.asarray(dp_fill_scores_ends_free(dgb, flatb, qb, lb,
                                               costs2p, cfgb))
    assert (sc2 == ref2).all(), (sc2[:8], ref2[:8])
    # anchor parity vs the XLA 5-layer body, incl. the largest-offset
    # tie-break convention
    sx, erx, ejx = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dgb, flatb, qb, lb, costs2p, cfgb, engine="xla"))
    assert (sc2 == sx).all() and (er2 == erx).all() and (ej2 == ejx).all(), \
        (er2[:8], erx[:8], ej2[:8], ejx[:8])
    for b in (3, 29, 55):
        score, aln = nab.align_anchored(
            big_reads[b], costs2p, int(flatb.node_of_rank[er2[b]]),
            int(ej2[b]), int(sc2[b]))
        assert score == sc2[b]
        assert alignment_cost(gb, big_reads[b], aln, costs2p) == score
    # capped 2p coupled scan: raises-only + exact where unbound
    scap2, ercap2, ejcap2 = (np.asarray(a) for a in
                             dp_fill_ends_free_with_ends(
                                 dgb, flatb, qb, lb, costs2p, cfgb,
                                 engine="pallas", max_run=256))
    assert (scap2 >= sc2).all()
    same2 = scap2 == sc2
    assert same2.any()
    assert (ercap2[same2] == er2[same2]).all()
    assert (ejcap2[same2] == ej2[same2]).all()
    print("OK")
    print("  two-piece anchors, standard 2p with-ends kernel ...", end=" ",
          flush=True)
    s2s, er2s, ej2s = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dg, flat, qe, le, costs2p, cfg, engine="pallas"))
    sxs, erxs, ejxs = (np.asarray(a) for a in dp_fill_ends_free_with_ends(
        dg, flat, qe, le, costs2p, cfg, engine="xla"))
    assert (s2s == sxs).all() and (er2s == erxs).all() \
        and (ej2s == ejxs).all(), (er2s[:8], erxs[:8])
    print("OK")

    print("device traceback kernels (byte-identity vs native):")
    _run_test_file("tests/test_trace.py", [
        "test_anchored_ends_free_trace_matches_native",
        "test_trace_edge_cases",
        "test_trace_cost_equals_score",
    ], param_calls=[
        ("test_global_trace_matches_native", (5, GapAffine(4, 2, 6))),
        ("test_global_trace_matches_native", (29, GapAffine(3, 1, 9))),
    ])
    print("  forced big-kernel trace path ...", end=" ", flush=True)
    import poasta_tpu.ops.pallas_trace as _pt

    class _MP:  # pytest-monkeypatch stand-in with explicit undo
        def __init__(self):
            self._saved = []

        def setattr(self, target, name, value):
            self._saved.append((target, name, getattr(target, name)))
            setattr(target, name, value)

        def undo(self):
            for t, n_, v in reversed(self._saved):
                setattr(t, n_, v)

    mp = _MP()
    try:
        _run_test_file("tests/test_trace.py", [],
                       param_calls=[("test_big_trace_matches_native",
                                     (mp,))])
    finally:
        mp.undo()

    print("  full-width band clamp (ladder terminal tier == full fill) "
          "...", end=" ", flush=True)
    # garbage reads drive the ladder past every band width; the clamped
    # zero-start full-width tier must accept them EXACTLY (no ub check)
    rngc = random.Random(83)
    basec = "".join(rngc.choice("ACGT") for _ in range(700))
    gc = POAGraph()
    gc.add_alignment_with_weights("s0", basec.encode(), None, [1] * 700)
    creads = []
    for i in range(64):
        if i % 8 == 7:
            creads.append("".join(rngc.choice("ACGT")
                                  for _ in range(700)).encode())
        else:
            creads.append(mutate(basec, 0.05).encode())
    flatc = gc.flatten()
    qc, lc = pack_queries(creads)
    bsc = BandedScorer(flatc, costs)
    gotc = np.asarray(bsc.scores(qc, lc, ub=120))
    dgc = DeviceGraph.build(flatc)
    refc = np.asarray(dp_fill_scores(dgc, qc, lc, costs))
    assert (gotc == refc).all(), (gotc[:8], refc[:8])
    gotc2 = np.asarray(bsc.scores(qc, lc))
    assert (gotc2 == refc).all()
    print("OK")

    print("seeded corridor fills (post-hoc certificate):")
    import os as _os

    _os.environ["POASTA_SEED"] = "all"
    _os.environ["POASTA_SEED_DEBUG"] = "1"
    try:
        from poasta_tpu.aligner.costs import UNBOUNDED, EndsFree, included
        from poasta_tpu.parallel import BatchMapper

        rng = random.Random(23)
        n = 3000
        base = "".join(rng.choice("ACGT") for _ in range(n))
        gsd = POAGraph()
        gsd.add_alignment_with_weights("s0", base.encode(), None, [1] * n)
        for v in range(0, n - 3, 97):
            gsd.add_edge(v, v + 3, 0, 1)
        gsd.post_process()

        def _mut(rng, s, d):
            out = []
            for ch in s:
                r = rng.random()
                if r < d:
                    continue
                out.append(rng.choice("ACGT") if r < 2.5 * d else ch)
                if rng.random() < d:
                    out.append(rng.choice("ACGT"))
            return "".join(out) or "A"

        cfgs = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
        # (costs, divergence): the engagement envelope scales with the
        # cost model — (3,1,9) at 1.5% has T<0 by design, so it runs at
        # the divergence where its certificate engages
        for costs_s, div in ((GapAffine(4, 2, 6), 0.015),
                             (GapAffine(3, 1, 9), 0.005)):
            print(f"  seeded == full fill, {costs_s} d={div} ...",
                  end=" ", flush=True)
            reads = []
            for _ in range(64):
                a = rng.randrange(0, n - 1200)
                reads.append(_mut(rng, base[a:a + 1200], div).encode())
            reads[11] = "".join(rng.choice("ACGT")
                                for _ in range(1200)).encode()  # garbage
            msd = BatchMapper(gsd, costs_s, aln_type=cfgs)
            qsd, lsd = pack_queries(reads)
            msd._ends_free_scores(reads, qsd, lsd, False)  # learn ub
            scs, ers, ejs = msd._ends_free_scores(reads, qsd, lsd, False)
            st = msd.last_seed_stats
            assert st["seeded"] >= 48 and st["seed_tail"] >= 1, st
            refs = msd._fill_ends_free_capped(qsd, lsd, False)
            assert (np.asarray(scs) == np.asarray(refs[0])).all()
            assert (np.asarray(ers) == np.asarray(refs[1])).all()
            assert (np.asarray(ejs) == np.asarray(refs[2])).all()
            print(f"OK (seeded {st['seeded']}/64, k={st['seed_k']})")
        # deep loci: nonzero block chunk entry (c0>0) + window entry
        # (sig0>0) through real Mosaic compilation
        _run_test_file("tests/test_seeds.py",
                       ["test_block_rank_skip_nonzero_entry"])
    finally:
        _os.environ.pop("POASTA_SEED", None)
        _os.environ.pop("POASTA_SEED_DEBUG", None)

    if "--soak" in sys.argv:
        at = sys.argv.index("--soak")
        if at + 1 >= len(sys.argv) or not sys.argv[at + 1].isdigit():
            print("usage: run_tpu_tests.py [--soak N]")
            return 2
        n = int(sys.argv[at + 1])
        print(f"soak: {n} extra consistency seeds on chip:")
        ok = 0
        for k in range(n):
            seed = 900 + k
            try:
                if k % 4 == 3:
                    tc.test_all_engines_agree_two_piece(seed)
                else:
                    tc.test_all_engines_agree_one_piece(seed)
                ok += 1
            except Exception as exc:
                print(f"  seed {seed} FAILED: {exc!r}")
        print(f"  {ok}/{n} clean")
        if ok != n:
            return 1

    print("all TPU validations passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
