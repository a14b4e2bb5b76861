"""Accelerator-path simulation: the Pallas kernels in interpret mode.

``set_interpret_mode(True)`` makes every ``pallas_call`` run as plain
JAX ops on the CPU backend, and patching ``jax.default_backend`` to a
non-"cpu" name makes the production dispatchers (wavefront fills,
``BandedScorer``) take their accelerator routes.  Together they execute
the real kernel code — the tilted-coordinate math, the insertion-run
caps, the drift rolls, the with-ends anchor extraction — end to end
without a chip.  Mosaic compilation/legalization is NOT covered here;
``run_tpu_tests.py`` stays authoritative for that.

Oracles are computed OUTSIDE the simulation (XLA bodies / the native
exact engine), so a kernel bug cannot cancel out of both sides.
"""

import random
from contextlib import contextmanager
from unittest import mock

import jax
import numpy as np
import pytest

from poasta_tpu.aligner import GapAffine, GapAffine2Piece
from poasta_tpu.aligner.banded import BandedScorer
from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
from poasta_tpu.aligner.wavefront import (
    DeviceGraph,
    dp_fill_ends_free_with_ends,
    dp_fill_scores,
    dp_fill_scores_ends_free,
    pack_queries,
)
from poasta_tpu.graphs import POAGraph
from poasta_tpu.native import NativeAligner
from poasta_tpu.ops.pallas_fill import set_interpret_mode

COSTS = GapAffine(4, 2, 6)
COSTS2P = GapAffine2Piece(4, 2, 6, 1, 24)


@contextmanager
def accel_sim():
    """Interpret mode + a non-cpu backend name for the dispatchers."""
    set_interpret_mode(True)
    try:
        with mock.patch.object(jax, "default_backend",
                               lambda: "interpret-sim"):
            yield
    finally:
        set_interpret_mode(False)


def _mutate(rng, s, d):
    out = []
    for ch in s:
        r = rng.random()
        if r < d:
            continue
        out.append(rng.choice("ACGT") if r < 2 * d else ch)
        if rng.random() < d:
            out.append(rng.choice("ACGT"))
    return "".join(out) or "A"


def _fused(rng, glen, n_seqs=3, div=0.04, costs=COSTS):
    base = "".join(rng.choice("ACGT") for _ in range(glen))
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)
    for i in range(1, n_seqs):
        s = _mutate(rng, base, div).encode()
        _, aln, _ = NativeAligner(g).align(s, costs)
        g.add_alignment_with_weights(f"s{i}", s, aln, [1] * len(s))
    return g, base


@pytest.mark.parametrize("costs", [COSTS, COSTS2P],
                         ids=["1p", "2p"])
def test_full_fill_matches_xla(costs):
    rng = random.Random(5)
    g, base = _fused(rng, 150, costs=costs)
    dg = DeviceGraph.build(g.flatten())
    reads = [_mutate(rng, base, 0.05).encode() for _ in range(64)]
    qshift, lengths = pack_queries(reads)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, costs,
                                    engine="xla"))
    with accel_sim():
        got = np.asarray(dp_fill_scores(dg, qshift, lengths, costs,
                                        engine="pallas"))
    assert (got == ref).all()


def test_banded_scorer_uniform_tilted():
    """The production BandedScorer accelerator route: tilted banded
    kernel + verify ladder; scores must equal the exact engine's."""
    rng = random.Random(9)
    g, base = _fused(rng, 300, n_seqs=4)
    flat = g.flatten()
    reads = [_mutate(rng, base, 0.03).encode() for _ in range(64)]
    na = NativeAligner(g)
    ref = np.array([na.align(q, COSTS)[0] for q in reads])
    qshift, lengths = pack_queries(reads)
    with accel_sim():
        scorer = BandedScorer(flat, COSTS)
        got = np.asarray(scorer.scores(qshift, lengths))
    assert (got == ref).all()


def test_banded_drift_tilted_mixed_lengths():
    """Drift kernel (tilted, per-read frame rolls) on a mixed-length SV
    batch, vs the XLA full fill."""
    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(800))
    variant = base[:100] + base[700:]  # 600 bp deletion allele
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * len(base))
    _, aln, _ = NativeAligner(g).align(variant.encode(), COSTS)
    g.add_alignment_with_weights("s1", variant.encode(), aln,
                                 [1] * len(variant))
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = [_mutate(rng, base if i % 2 else variant, 0.015).encode()
             for i in range(64)]
    qshift, lengths = pack_queries(reads)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS,
                                    engine="xla"))
    with accel_sim():
        scorer = BandedScorer(flat, COSTS, dg=dg)
        got = np.asarray(scorer.scores(qshift, lengths))
        fallbacks = [k for k in scorer._prep_cache
                     if isinstance(k, tuple) and k
                     and str(k[0]).startswith("nodrift")]
    assert (got == ref).all()
    assert not fallbacks, "drift pallas kernel fell back in interpret mode"


def test_banded_drift_2p_mixed_lengths():
    """The two-piece drift kernel (coupled I1/I2 scans under per-read
    frame rolls) on the same SV batch, vs the XLA full fill."""
    rng = random.Random(13)
    base = "".join(rng.choice("ACGT") for _ in range(800))
    variant = base[:100] + base[700:]
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * len(base))
    _, aln, _ = NativeAligner(g).align(variant.encode(), COSTS2P)
    g.add_alignment_with_weights("s1", variant.encode(), aln,
                                 [1] * len(variant))
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = [_mutate(rng, base if i % 2 else variant, 0.015).encode()
             for i in range(64)]
    qshift, lengths = pack_queries(reads)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS2P,
                                    engine="xla"))
    with accel_sim():
        scorer = BandedScorer(flat, COSTS2P, dg=dg)
        got = np.asarray(scorer.scores(qshift, lengths))
        fallbacks = [k for k in scorer._prep_cache
                     if isinstance(k, tuple) and k
                     and str(k[0]).startswith("nodrift")]
    assert (got == ref).all()
    assert not fallbacks, "2p drift kernel fell back in interpret mode"


@pytest.mark.parametrize("costs", [COSTS, COSTS2P], ids=["1p", "2p"])
def test_bounded_ends_free_with_ends(costs):
    """Bounded ends-free fill + end anchors (the pangenome path's score
    phase), pallas vs XLA — including the largest-offset anchor
    tie-break and the insertion-run-capped prefix scan."""
    rng = random.Random(17)
    g, base = _fused(rng, 250, costs=costs)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = []
    for _ in range(64):
        a = rng.randrange(0, 80)
        b = rng.randrange(a + 40, 250)
        reads.append(_mutate(rng, base[a:b], 0.03).encode())
    qshift, lengths = pack_queries(reads)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sc_r, er_r, ej_r = dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg, engine="xla")
    with accel_sim():
        sc, er, ej = dp_fill_ends_free_with_ends(
            dg, flat, qshift, lengths, costs, cfg, engine="pallas")
    assert (np.asarray(sc) == np.asarray(sc_r)).all()
    assert (np.asarray(er) == np.asarray(er_r)).all()
    assert (np.asarray(ej) == np.asarray(ej_r)).all()


@pytest.mark.parametrize("nreads", [1, 3, 65])
def test_banded_odd_batch_sizes(nreads):
    """lasagna's last chunk can be any size — the accelerator route must
    pad non-multiple-of-B_BLK batches itself (pallas_banded_scores
    asserts B % B_BLK == 0)."""
    rng = random.Random(5)
    g, base = _fused(rng, 300, n_seqs=2)
    flat = g.flatten()
    na = NativeAligner(g)
    reads = [_mutate(rng, base, 0.05).encode() for _ in range(nreads)]
    ref = np.array([na.align(q, COSTS)[0] for q in reads])
    qshift, lengths = pack_queries(reads)
    with accel_sim():
        got = np.asarray(BandedScorer(flat, COSTS).scores(qshift, lengths))
    assert (got == ref).all()


@pytest.mark.parametrize("nreads", [1, 3, 65])
def test_with_ends_odd_batch_sizes(nreads):
    """Same edge for the bounded with-ends dispatcher (its padding is
    separate from BandedScorer's)."""
    rng = random.Random(7)
    g, base = _fused(rng, 250, n_seqs=2)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    reads = [_mutate(rng, base[rng.randrange(0, 60):], 0.04).encode()
             for _ in range(nreads)]
    qshift, lengths = pack_queries(reads)
    ref = dp_fill_ends_free_with_ends(dg, flat, qshift, lengths, COSTS,
                                      cfg, engine="xla")
    with accel_sim():
        got = dp_fill_ends_free_with_ends(dg, flat, qshift, lengths,
                                          COSTS, cfg, engine="pallas")
    for a, b in zip(got, ref):
        assert (np.asarray(a) == np.asarray(b)).all()


@pytest.mark.parametrize("seed", [41, 43, 47])
def test_banded_tilted_randomized_costs(seed):
    """The tilt math (rows store X - e*j, I' = prefmin(A') + o, match
    costs -e / x-e, +e*length untilt) is cost-parameterized — run the
    production banded route under random (x, e, o), not just the
    defaults, against the exact engine."""
    rng = random.Random(seed)
    x = rng.randrange(1, 9)
    e = rng.randrange(1, 5)
    o = rng.randrange(0, 12)
    costs = GapAffine(x, e, o)
    g, base = _fused(rng, 260, n_seqs=3, div=0.04, costs=costs)
    flat = g.flatten()
    reads = [_mutate(rng, base, 0.05).encode() for _ in range(64)]
    na = NativeAligner(g)
    ref = np.array([na.align(q, costs)[0] for q in reads])
    qshift, lengths = pack_queries(reads)
    with accel_sim():
        scorer = BandedScorer(flat, costs)
        got = np.asarray(scorer.scores(qshift, lengths))
    assert (got == ref).all(), (x, e, o)


@pytest.mark.parametrize("seed", [61, 67])
def test_drift_randomized_costs(seed):
    """The drift kernel is tilted too (per-read frame rolls preserve the
    global-j tilt) — run it under random costs on a mixed-length batch."""
    rng = random.Random(seed)
    costs = GapAffine(rng.randrange(1, 9), rng.randrange(1, 5),
                      rng.randrange(0, 12))
    base = "".join(rng.choice("ACGT") for _ in range(800))
    variant = base[:100] + base[700:]
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * len(base))
    _, aln, _ = NativeAligner(g).align(variant.encode(), costs)
    g.add_alignment_with_weights("s1", variant.encode(), aln,
                                 [1] * len(variant))
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = [_mutate(rng, base if i % 2 else variant, 0.015).encode()
             for i in range(64)]
    qshift, lengths = pack_queries(reads)
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, costs,
                                    engine="xla"))
    with accel_sim():
        got = np.asarray(BandedScorer(flat, costs, dg=dg).scores(
            qshift, lengths))
    assert (got == ref).all(), (costs,)


@pytest.mark.parametrize("seed", [53, 59])
def test_bounded_with_ends_randomized_costs(seed):
    """Anchor extraction (scores + end ranks/offsets) under random
    costs — the run-capped prefix scans and the largest-offset
    tie-break are cost-parameterized too."""
    rng = random.Random(seed)
    costs = GapAffine(rng.randrange(1, 9), rng.randrange(1, 5),
                      rng.randrange(0, 12))
    g, base = _fused(rng, 220, costs=costs)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = []
    for _ in range(64):
        a = rng.randrange(0, 70)
        b = rng.randrange(a + 40, 220)
        reads.append(_mutate(rng, base[a:b], 0.04).encode())
    qshift, lengths = pack_queries(reads)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sc_r, er_r, ej_r = dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg, engine="xla")
    with accel_sim():
        sc, er, ej = dp_fill_ends_free_with_ends(
            dg, flat, qshift, lengths, costs, cfg, engine="pallas")
    assert (np.asarray(sc) == np.asarray(sc_r)).all()
    assert (np.asarray(er) == np.asarray(er_r)).all()
    assert (np.asarray(ej) == np.asarray(ej_r)).all()


@pytest.mark.parametrize("seed", [71, 73])
def test_bounded_with_ends_2p_randomized_costs(seed):
    """2p anchor extraction under random costs — the coupled I1/I2
    run-cap bound (max over both pieces) is cost-parameterized."""
    rng = random.Random(seed)
    e = rng.randrange(2, 6)
    e2 = rng.randrange(1, e + 1)
    costs = GapAffine2Piece(rng.randrange(1, 9), e, rng.randrange(0, 12),
                            e2, rng.randrange(12, 30))
    g, base = _fused(rng, 200, costs=costs)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = []
    for _ in range(64):
        a = rng.randrange(0, 60)
        b = rng.randrange(a + 40, 200)
        reads.append(_mutate(rng, base[a:b], 0.04).encode())
    qshift, lengths = pack_queries(reads)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    sc_r, er_r, ej_r = dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg, engine="xla")
    with accel_sim():
        sc, er, ej = dp_fill_ends_free_with_ends(
            dg, flat, qshift, lengths, costs, cfg, engine="pallas")
    assert (np.asarray(sc) == np.asarray(sc_r)).all(), (costs,)
    assert (np.asarray(er) == np.asarray(er_r)).all()
    assert (np.asarray(ej) == np.asarray(ej_r)).all()


def test_bounded_ends_free_run_cap_truncates_exactly():
    """max_run small enough to truncate rounds must still verify ≤ub
    semantics: scores at or below the implied ub are exact."""
    rng = random.Random(21)
    g, base = _fused(rng, 200)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = [_mutate(rng, base, 0.02).encode() for _ in range(64)]
    qshift, lengths = pack_queries(reads)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    ref = np.asarray(dp_fill_scores_ends_free(
        dg, flat, qshift, lengths, COSTS, cfg, engine="xla"))
    with accel_sim():
        capped = np.asarray(dp_fill_scores_ends_free(
            dg, flat, qshift, lengths, COSTS, cfg, engine="pallas",
            max_run=32))
    o, e = COSTS.gap_open, COSTS.gap_extend
    ub = o + e * 32  # runs ≤32 lanes are seen in full
    exact = ref <= ub
    assert exact.any()
    assert (capped[exact] == ref[exact]).all()
    assert (capped >= ref).all()  # truncation only over-estimates


def test_big_banded_matches_standard_and_chain_skip():
    """The HBM-streamed big banded kernel (chunked rank-table DMA +
    sliding q segment) against the standard kernel on identical windows,
    plus the chain-skip variant — all in interpret mode.  Also covers
    the width>L window clamp (_clamp_windows_to_row): the requested
    width exceeds the packed row here."""
    from poasta_tpu.aligner.banded import band_windows
    from poasta_tpu.ops.pallas_fill import (
        pallas_banded_scores,
        pallas_banded_scores_big,
        prepare_banded,
        prepare_banded_big,
    )

    rng = random.Random(31)
    g, base = _fused(rng, 600, n_seqs=2)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = [_mutate(rng, base, 0.03).encode() for _ in range(64)]
    qshift, lengths = pack_queries(reads)
    L = int(qshift.shape[1])
    ln = np.asarray(lengths)
    ws, wd, _, _ = band_windows(flat, int(ln.min()), int(ln.max()),
                                COSTS, 600)
    ws = (ws // 128) * 128
    wd += 128  # deliberately overshoot: wd can exceed L at wide tiers
    prep_s = prepare_banded(dg, COSTS, ws, wd, L)
    prep_b = prepare_banded_big(dg, COSTS, ws, wd, L)
    assert prep_s["width"] <= L and prep_b["qseg"] <= L
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS,
                                    engine="xla"))
    with accel_sim():
        a_std = np.asarray(pallas_banded_scores(dg, qshift, lengths,
                                                COSTS, prep=prep_s))
        a_big = np.asarray(pallas_banded_scores_big(dg, qshift, lengths,
                                                    COSTS, prep_b))
        a_cs = np.asarray(pallas_banded_scores(dg, qshift, lengths, COSTS,
                                               prep=prep_s,
                                               chain_skip=True))
    assert (a_std == a_big).all()
    assert (a_std == a_cs).all()
    covered = a_std <= 600
    assert covered.all()  # the clamp kept full coverage here
    assert (a_std[covered] == ref[covered]).all()


@pytest.mark.parametrize("costs", [COSTS, COSTS2P], ids=["1p", "2p"])
def test_big_bounded_with_ends(costs):
    """The HBM-streamed bounded with-ends kernels (the pangenome score
    phase at >50k nodes) against the XLA body, in interpret mode."""
    from poasta_tpu.aligner.wavefront import ends_free_device_params
    from poasta_tpu.ops.pallas_fill import (
        pallas_bounded_with_ends_big,
        pallas_bounded_with_ends_big_2p,
    )

    rng = random.Random(37)
    g, base = _fused(rng, 250, costs=costs)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = []
    for _ in range(64):
        a = rng.randrange(0, 80)
        b = rng.randrange(a + 40, 250)
        reads.append(_mutate(rng, base[a:b], 0.03).encode())
    qshift, lengths = pack_queries(reads)
    cfg = EndsFree(UNBOUNDED, included(0), UNBOUNDED, UNBOUNDED)
    two_piece = getattr(costs, "is_two_piece", False)
    fs, end_ok, jlo = ends_free_device_params(
        flat, cfg, lengths, dg.n_nodes_padded, two_piece=two_piece)
    sc_r, er_r, ej_r = dp_fill_ends_free_with_ends(
        dg, flat, qshift, lengths, costs, cfg, engine="xla")
    fill = (pallas_bounded_with_ends_big_2p if two_piece
            else pallas_bounded_with_ends_big)
    with accel_sim():
        sc, er, ej = fill(dg, qshift, lengths, costs, fs, end_ok, jlo)
    assert (np.asarray(sc) == np.asarray(sc_r)).all()
    assert (np.asarray(er) == np.asarray(er_r)).all()
    assert (np.asarray(ej) == np.asarray(ej_r)).all()


def test_drift_ends_free_kernel():
    """The drift × bounded-ends-free kernel (_banded_kernel_drift_ef) —
    never Mosaic-compiled yet; interpret mode executes its in-scan
    windowed-min best tile."""
    rng = random.Random(23)
    base = "".join(rng.choice("ACGT") for _ in range(800))
    variant = base[:100] + base[700:]
    g = POAGraph()
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * len(base))
    _, aln, _ = NativeAligner(g).align(variant.encode(), COSTS)
    g.add_alignment_with_weights("s1", variant.encode(), aln,
                                 [1] * len(variant))
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    reads = [_mutate(rng, base if i % 2 else variant, 0.015).encode()
             for i in range(64)]
    qshift, lengths = pack_queries(reads)
    cfg = EndsFree(UNBOUNDED, included(40), included(0), included(40))
    ref = np.asarray(dp_fill_scores_ends_free(
        dg, flat, qshift, lengths, COSTS, cfg, engine="xla"))
    with accel_sim():
        scorer = BandedScorer(flat, COSTS, dg=dg, aln_type=cfg)
        got = np.asarray(scorer.scores(qshift, lengths))
        fallbacks = [k for k in scorer._prep_cache
                     if isinstance(k, tuple) and k
                     and str(k[0]).startswith("nodrift")]
    assert (got == ref).all()
    assert not fallbacks, "drift-ef kernel fell back in interpret mode"
