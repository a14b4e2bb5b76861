"""Roofline the banded fill kernel (VERDICT r3 #4).

Three parts, one JSON:

1. **Op mix by construction** — count the vector instructions
   `_banded_kernel` issues per (B_BLK, Wb) tile per rank, split into ALU
   (add/min/compare/select), lane-rotate (pltpu.roll), and VMEM
   row-moves (dynamic-slice ring reads + stores), using the uniform
   bench config's actual parameters (P, Wb, margin, max_run, B_BLK)
   captured from the production call path.
2. **Empirical VPU rates** — Pallas microkernels measure what this
   chip/toolchain actually sustains per op class: a dependent min/add
   chain (latency bound), an 8-way independent min/add mix (throughput
   bound ~ the practical ALU peak), and the same pair for roll+min.
3. **The verdict** — achieved ops/s at the bench's measured raw
   Gcells/s as a fraction of (a) the theoretical 8x128x4-ALU VPU peak
   at the MXU-derived clock and (b) the measured ALU throughput
   ceiling; plus a predicted cells/s from the op mix and measured
   rates, so the model can be checked against reality.

Run on the real chip: python scripts/vpu_roofline.py
"""

import functools
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e: 197 bf16 TFLOP/s published = 4 MXUs x (128x128x2) x clock
# -> clock = 1.5 GHz; VPU = 8x128 lanes x 4 ALUs = 4096 int32 ops/cycle
V5E_CLOCK_HZ = 1.5e9
V5E_VPU_OPS_PER_CYCLE = 8 * 128 * 4
V5E_VPU_PEAK = V5E_CLOCK_HZ * V5E_VPU_OPS_PER_CYCLE  # 6.14e12 int32 op/s

BLK, WB = 64, 512  # microbench tile (matches the bench kernel's shape)
INNER = 16         # op-steps per loop iteration
# big enough that the ~25-30 ms tethered dispatch is noise: the ilp8
# variants run ~1e12 ops/call (first attempt used 4096 loops = 3.4e10
# ops and measured the tunnel, not the VPU)
LOOPS = 1 << 17    # fori_loop trip count


def _time_fn(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _micro(kind: str, ways: int):
    """ops/s sustained by `ways` independent chains of `kind` steps.

    kind='alu': t = min(t + c, u)          (2 ALU ops/step)
    kind='roll': t = min(t, roll(t, 1))    (1 roll + 1 ALU op/step)
    kind='select': t = min(t, where(mask, u, c))  (2 ALU ops/step; the
        select compiles to the same vselect the fill's masks use)
    """
    def kernel(x_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (BLK, WB), 1)
        mask = col >= 1
        chains = [x_ref[...] + i for i in range(ways)]
        alts = [x_ref[...] - i for i in range(ways)]

        def body(i, carry):
            ts = list(carry)
            for k in range(INNER):
                for w in range(ways):
                    if kind == "alu":
                        ts[w] = jnp.minimum(ts[w] + i, alts[w])
                    elif kind == "roll":
                        ts[w] = jnp.minimum(ts[w], pltpu.roll(ts[w], 1, 1))
                    else:
                        ts[w] = jnp.minimum(
                            ts[w], jnp.where(mask, alts[w], i))
            return tuple(ts)

        out = jax.lax.fori_loop(0, LOOPS, body, tuple(chains))
        acc = out[0]
        for t in out[1:]:
            acc = jnp.minimum(acc, t)
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BLK, WB), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = jax.jit(call)
    x = jnp.arange(BLK * WB, dtype=jnp.int32).reshape(BLK, WB)
    el = _time_fn(fn, x)
    ops_per_step = 2
    n_ops = BLK * WB * LOOPS * INNER * ways * ops_per_step
    return n_ops / el


def captured_params():
    """Run the production uniform-config scorer once and capture the
    parameters `pallas_banded_scores` hands the kernel."""
    from bench import build_uniform
    from poasta_tpu.aligner import GapAffine
    from poasta_tpu.aligner.banded import BandedScorer
    from poasta_tpu.aligner.wavefront import pack_queries
    import poasta_tpu.ops.pallas_fill as pf

    costs = GapAffine(4, 2, 6)
    graph, reads = build_uniform(costs)
    flat = graph.flatten()
    scorer = BandedScorer(flat, costs)
    qshift, lengths = pack_queries(reads)

    rec = {}
    orig = pf._banded_exec

    @functools.wraps(orig)
    def spy(nblocks, W, P, Wb, MARGIN, L, o, e, x, B_BLK=64,
            use_int16=False, max_run=0, chain_skip=False, interpret=False):
        rec.setdefault("calls", []).append(dict(
            nblocks=nblocks, W=W, P=P, Wb=Wb, MARGIN=MARGIN, L=L,
            B_BLK=B_BLK, use_int16=use_int16, max_run=max_run))
        return orig(nblocks, W, P, Wb, MARGIN, L, o, e, x, B_BLK=B_BLK,
                    use_int16=use_int16, max_run=max_run,
                    chain_skip=chain_skip, interpret=interpret)

    pf._banded_exec = spy
    try:
        scorer.scores(qshift, lengths)  # converge tiers/ub hints
        rec["calls"] = []
        scorer.reset_stats()
        t0 = time.perf_counter()
        scorer.scores(qshift, lengths)
        el = time.perf_counter() - t0
    finally:
        pf._banded_exec = orig
    rec["raw_cells_per_sec"] = scorer.stats["cells_filled"] / el
    rec["n_nodes"] = flat.n_nodes
    return rec


def op_mix(P: int, Wb: int, max_run: int):
    """Vector instructions per (B_BLK, Wb) tile per rank in
    `_banded_kernel` (ops/pallas_fill.py:2059-2142), by construction.

    ALU = elementwise add/min/compare/select (1 op each);
    ROLL = pltpu.roll lane rotates; LOADS/STORES = (B_BLK, Wb) row moves.
    """
    cap = min(Wb, max_run) if max_run else Wb
    rounds = 0
    k = 1
    while k < cap:
        rounds += 1
        k <<= 1
    alu = 0
    alu += 4 * (P - 1)    # gather: 2 selects + 2 mins per extra pred
    alu += 3              # D: 2 adds + 1 min
    alu += 1              # j32 = col32 + w_r
    alu += 1              # diag_src mask select
    alu += 2              # match_cost: compare + select
    alu += 1              # diag add
    alu += 1              # A = min(diag, D)
    alu += 4              # zero_at_origin: cmp + select; r==0 min + select
    alu += 2 * rounds     # prefix-min: select + min per round
    alu += 1              # pref_m1 mask select
    alu += 2              # I: add + min
    alu += 2              # M: min + is_end select
    alu += 2              # D_st: min + select
    rolls = 1 + rounds + 1  # diag shift + prefix rounds + pref_m1 shift
    loads = 2 * P + 1       # ring reads (m+d per pred) + query window
    stores = 2              # M and D ring rows
    return dict(alu=alu, rolls=rolls, loads=loads, stores=stores,
                prefix_rounds=rounds, total_vec=alu + rolls)


def main():
    out = {"theoretical_vpu_peak_ops_per_sec": V5E_VPU_PEAK}

    params = captured_params()
    calls = params["calls"]
    # the bulk fill is the widest-batch call (tier 0 over the full batch)
    main_call = max(calls, key=lambda c: c["nblocks"] * c["B_BLK"])
    out["captured_kernel_params"] = main_call
    out["n_tier_calls"] = len(calls)
    out["raw_gcells_per_sec"] = round(params["raw_cells_per_sec"] / 1e9, 2)

    mix = op_mix(main_call["P"], main_call["Wb"], main_call["max_run"])
    out["op_mix_per_cell"] = mix

    # empirical rates (ops/s): dependent chain vs 8-way independent
    rates = {}
    for kind in ("alu", "roll", "select"):
        rates[f"{kind}_dep"] = _micro(kind, 1)
        rates[f"{kind}_ilp8"] = _micro(kind, 8)
    out["measured_ops_per_sec"] = {k: round(v / 1e12, 3)
                                   for k, v in rates.items()}

    raw = params["raw_cells_per_sec"]
    achieved_ops = raw * mix["total_vec"]
    out["achieved_vec_ops_per_sec_T"] = round(achieved_ops / 1e12, 3)
    out["fraction_of_theoretical_peak"] = round(
        achieved_ops / V5E_VPU_PEAK, 3)
    out["fraction_of_measured_alu_ceiling"] = round(
        achieved_ops / rates["alu_ilp8"], 3)

    # model check: predicted cells/s if every op ran at its measured
    # ILP-8 rate (ignores loads/stores and scalar work -> upper bound)
    t_cell = (mix["alu"] / rates["alu_ilp8"]
              + mix["rolls"] / rates["roll_ilp8"])
    out["model_predicted_gcells_per_sec"] = round(1.0 / t_cell / 1e9, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
