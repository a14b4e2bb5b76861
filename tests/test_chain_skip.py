"""Chain-run ring-skip variant of the banded Pallas kernel (interpret mode).

Fused POA / pangenome graphs are mostly chains (single predecessor = the
previous rank, same band window); the ``chain_skip`` variant of
``_banded_kernel`` carries the previous rank's M/D rows in scratch and
skips the predecessor ring gather on those ranks, plus the ring stores
on ranks no ring consumer reads (``prepare_banded`` derives both flags).

Pallas interpret mode runs the kernels as plain JAX ops on the CPU
backend, so exactness — including the flag derivation and the
scratch-carry/ring consistency — is validated without an accelerator;
the on-chip timing A/B lives in scripts/chainskip_ab.py.
"""

import random

import numpy as np
import pytest

from poasta_tpu.aligner import GapAffine, Global, PoastaAligner
from poasta_tpu.aligner.banded import band_windows
from poasta_tpu.aligner.wavefront import (
    DeviceGraph,
    dp_fill_scores,
    pack_queries,
)
from poasta_tpu.graphs import POAGraph
from poasta_tpu.ops.pallas_fill import pallas_banded_scores, prepare_banded

COSTS = GapAffine(4, 2, 6)


def _fused_graph(rng, glen=200, n_seqs=4, div=0.05):
    base = "".join(rng.choice("ACGT") for _ in range(glen))

    def mutate(s, d):
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
    py = PoastaAligner(COSTS, Global(), heuristic="mingap")
    g.add_alignment_with_weights("s0", base.encode(), None, [1] * glen)
    for i in range(1, n_seqs):
        s = mutate(base, div).encode()
        r = py.align(g, s)
        g.add_alignment_with_weights(f"s{i}", s, r.alignment, [1] * len(s))
    reads = [mutate(base, div).encode() for _ in range(64)]
    return g, reads


def test_chain_flags_shape_and_fraction():
    rng = random.Random(3)
    g, reads = _fused_graph(rng)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    qshift, _ = pack_queries(reads)
    L = int(qshift.shape[1])
    ws = np.zeros(flat.n_nodes, dtype=np.int32)
    prep = prepare_banded(dg, COSTS, ws, ((L + 127) // 128) * 128, L)
    chain = np.asarray(prep["chain"])
    store = np.asarray(prep["store"])
    n = flat.n_nodes
    assert chain[0] == 0  # rank 0 has no predecessor carry
    # a fused POA graph is mostly chain ranks, and chain consumers let
    # their predecessors skip the ring store
    assert chain[:n].mean() > 0.5
    assert store[:n].mean() < 0.7
    # every rank that IS read from the ring stores: re-derive consumers
    pr, valid = dg.pred_ranks_np[:n], dg.pred_valid_np[:n]
    for r in range(1, n):
        if chain[r]:
            continue
        assert store[pr[r, 0]] == 1  # unconditional p=0 read
        for p in range(1, pr.shape[1]):
            if valid[r, p]:
                assert store[pr[r, p]] == 1


def test_chain_skip_full_width_matches_exact():
    rng = random.Random(7)
    g, reads = _fused_graph(rng)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    qshift, lengths = pack_queries(reads)
    L = int(qshift.shape[1])
    width = ((L + 127) // 128) * 128
    ws = np.zeros(flat.n_nodes, dtype=np.int32)
    prep = prepare_banded(dg, COSTS, ws, width, L)

    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS))
    for flag in (False, True):
        got = np.asarray(pallas_banded_scores(
            dg, qshift, lengths, COSTS, prep=prep, chain_skip=flag,
            interpret=True))
        assert (got == ref).all(), flag


@pytest.mark.parametrize("seed", [11, 13])
def test_chain_skip_banded_windows_match(seed):
    """Real (shifted) band windows: nonzero pred deltas break chain
    eligibility on some ranks and exercise the margin reads."""
    rng = random.Random(seed)
    g, reads = _fused_graph(rng, glen=300, div=0.04)
    flat = g.flatten()
    dg = DeviceGraph.build(flat)
    qshift, lengths = pack_queries(reads)
    L = int(qshift.shape[1])
    lens = [len(r) for r in reads]
    ub = 4 * COSTS.mismatch + COSTS.gap_open * 3 + max(lens) * COSTS.mismatch // 4
    ws, width, _, _ = band_windows(flat, min(lens), max(lens), COSTS, ub)
    prep = prepare_banded(dg, COSTS, ws, width, L)

    off = np.asarray(pallas_banded_scores(
        dg, qshift, lengths, COSTS, prep=prep, chain_skip=False,
        interpret=True))
    on = np.asarray(pallas_banded_scores(
        dg, qshift, lengths, COSTS, prep=prep, chain_skip=True,
        interpret=True))
    assert (on == off).all()
    # the band must have been wide enough that the scores are also exact
    ref = np.asarray(dp_fill_scores(dg, qshift, lengths, COSTS))
    covered = off <= ub
    assert covered.mean() > 0.9  # sanity: the ub actually covers most
    assert (off[covered] == ref[covered]).all()
