"""The insertion-run-capped ends-free fill ladder (control flow).

The Pallas kernels only run on an accelerator, so these tests stub the
fill primitive and verify the ladder's contract: caps flow through
engine='pallas' calls, unverified scores (> ub, or INF possibly capped
away) retry at 4x, verified batches stop and seed the ub hint, and a
fill that raises (pallas unavailable) falls back to one uncapped call.
"""

import numpy as np

from poasta_tpu.aligner import GapAffine
from poasta_tpu.aligner.banded import ins_run_cap
from poasta_tpu.aligner.costs import EndsFree, UNBOUNDED, included
from poasta_tpu.aligner.wavefront import INF, pack_queries
from poasta_tpu.graphs import POAGraph
from poasta_tpu.parallel import BatchMapper

COSTS = GapAffine(4, 2, 6)


def _mapper_and_batch():
    g = POAGraph()
    g.add_alignment_with_weights("s0", b"ACGTACGTACGTACGTACGT", None,
                                 [1] * 20)
    bm = BatchMapper(g, COSTS,
                     aln_type=EndsFree(UNBOUNDED, included(0), UNBOUNDED,
                                       UNBOUNDED))
    # long reads so the run cap has room to engage (L ~5k; with tiny L
    # every cap >= L and the ladder rightly degenerates to one fill)
    qshift, lengths = pack_queries([b"ACGT" * 1000, b"ACGT" * 1250])
    return bm, qshift, lengths


def _install_stub(monkeypatch, true_sc, run_needed, calls):
    """Fill stub: read i verifies only when the cap covers run_needed[i]
    (uncapped calls and wide-enough caps return the true values)."""
    import poasta_tpu.aligner.wavefront as wf

    true_er = np.arange(len(true_sc), dtype=np.int32) + 10
    true_ej = np.arange(len(true_sc), dtype=np.int32) + 3

    def stub(dg, flat, qshift, lengths, costs, aln_type, engine="auto",
             mesh=None, max_run=0):
        calls.append((engine, max_run))
        sc = np.array(true_sc, dtype=np.int64)
        if max_run:
            sc = np.where(np.asarray(run_needed) > max_run, INF, sc)
        return sc, true_er.copy(), true_ej.copy()

    # the mapper imports the symbol inside the method, so patch the
    # source module
    monkeypatch.setattr(wf, "dp_fill_ends_free_with_ends", stub)
    return true_er, true_ej


def test_ladder_retries_until_cap_covers(monkeypatch):
    bm, qshift, lengths = _mapper_and_batch()
    bm._ef_cap_enabled = lambda two_piece: True
    calls = []
    # read 1 scores 3000 with a 1400-run (physical: run <= (score-o)/e);
    # the first tier's cap misses the run -> INF -> retry at 4x ub
    er, ej = _install_stub(monkeypatch, [40, 3000], [4, 1400], calls)
    sc, er_out, ej_out = bm._fill_ends_free_capped(qshift, lengths, False)
    assert sc.tolist() == [40, 3000]
    assert (er_out == er).all() and (ej_out == ej).all()
    assert len(calls) == 2
    assert all(e == "pallas" and m > 0 for e, m in calls)
    caps = [m for _, m in calls]
    assert caps[-1] > caps[0] >= 1
    assert caps[-1] >= 1400  # final cap covered the run
    # hint seeds the next call at the observed max score: one fill
    calls.clear()
    sc2, _, _ = bm._fill_ends_free_capped(qshift, lengths, False)
    assert sc2.tolist() == [40, 3000]
    assert len(calls) == 1 and calls[0][0] == "pallas" \
        and calls[0][1] >= 1400


def test_ladder_single_fill_when_hint_warm(monkeypatch):
    bm, qshift, lengths = _mapper_and_batch()
    bm._ef_cap_enabled = lambda two_piece: True
    calls = []
    _install_stub(monkeypatch, [40, 56], [4, 8], calls)
    bm._fill_ends_free_capped(qshift, lengths, False)
    first = len(calls)
    calls.clear()
    bm._fill_ends_free_capped(qshift, lengths, False)
    assert len(calls) == 1 <= first


def test_ladder_falls_back_when_pallas_unavailable(monkeypatch):
    import poasta_tpu.aligner.wavefront as wf

    bm, qshift, lengths = _mapper_and_batch()
    bm._ef_cap_enabled = lambda two_piece: True
    calls = []

    def stub(dg, flat, qshift, lengths, costs, aln_type, engine="auto",
             mesh=None, max_run=0):
        calls.append((engine, max_run))
        if engine == "pallas":
            raise RuntimeError("no accelerator")
        return (np.array([12, 30], dtype=np.int64),
                np.array([1, 2], np.int32), np.array([3, 4], np.int32))

    monkeypatch.setattr(wf, "dp_fill_ends_free_with_ends", stub)
    sc, _, _ = bm._fill_ends_free_capped(qshift, lengths, False)
    assert sc.tolist() == [12, 30]
    # exactly one pallas attempt, then the uncapped call
    assert [e for e, _ in calls] == ["pallas", "auto"]


def test_ladder_disabled_paths_fill_once(monkeypatch):
    bm, qshift, lengths = _mapper_and_batch()
    calls = []
    _install_stub(monkeypatch, [40, 56], [1, 1], calls)
    # CPU backend: _ef_cap_enabled is False here -> single uncapped call
    sc, _, _ = bm._fill_ends_free_capped(qshift, lengths, False)
    assert sc.tolist() == [40, 56]
    assert calls == [("auto", 0)]
    assert not bm._ef_cap_enabled(False) and not bm._ef_cap_enabled(True)


def test_ladder_disables_on_unalignable_rows(monkeypatch):
    """A read whose TRUE score is INF (unsatisfiable bounds) can never
    verify under any ub.  The first call may climb the whole ladder, but
    it must record the outcome so subsequent calls for the same shape go
    straight to one uncapped fill instead of re-climbing every time."""
    bm, qshift, lengths = _mapper_and_batch()
    bm._ef_cap_enabled = lambda two_piece: True
    calls = []
    _install_stub(monkeypatch, [40, INF], [4, 0], calls)
    sc, _, _ = bm._fill_ends_free_capped(qshift, lengths, False)
    assert sc.tolist() == [40, INF]
    assert calls[-1] == ("auto", 0)  # ladder ended at the plain fill
    first = len(calls)
    assert first >= 2
    calls.clear()
    sc2, _, _ = bm._fill_ends_free_capped(qshift, lengths, False)
    assert sc2.tolist() == [40, INF]
    assert calls == [("auto", 0)], "ladder re-climbed on a known-INF shape"
    # ...but the back-off is a countdown, not a life sentence: after it
    # drains, the ladder re-probes (a capped pallas attempt reappears)
    for _ in range(16):
        calls.clear()
        bm._fill_ends_free_capped(qshift, lengths, False)
        if any(e == "pallas" for e, _ in calls):
            break
    else:
        raise AssertionError("ladder never re-probed a known-INF shape")


def test_caps_grow_with_ub():
    w = 1 << 20
    assert ins_run_cap(COSTS, 100, w) < ins_run_cap(COSTS, 400, w) \
        < ins_run_cap(COSTS, 1600, w)
