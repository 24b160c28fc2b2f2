#!/usr/bin/env python3
"""Ablation micro-bench behind the row-stacked-streams DEAD END (kept as
the measurement artifact; the production wiring was reverted).

Hypothesis tested: a short query (Q_pad=128) underfills the DP column, so
stacking S independent DATABASE chunk streams as row segments (the dual
of the multi-query stacking) should recover long-query amortization for
the headline's 110-aa query. Measured on v5e (2026-08-18, in-process):

  - A [512, 1024] column costs ~4.3 us in the production kernel shape vs
    ~1.13 us for a [128, 1024] column — i.e. per-column cost is LINEAR in
    rows (4 x 1.13 ~= 4.3). There is NO fixed per-column cost to
    amortize; the hypothesis is false. (The Q=110 vs Q=390 GCUPS gap in
    the perf tables comes from padding/bucketing ratios and per-block
    overheads, not column underfill.)
  - The stacked kernel itself paid 11.5 us/supercolumn: S meta-indexed
    output refs cost ~1.4 us per grid step EACH (a fixed per-step cost —
    NOT flush-on-index-change: a constant index map or 64-chunk blocks
    measure identically, see `outconst`). Multiple dynamic-index-mapped
    pallas outputs are expensive per se — relevant to any future
    multi-output kernel design.
  - End-to-end (tools level): S=0 92-98 GCUPS, S=2 68-75, S=4 51-55 on
    the 541k-seq bench protocol; oracle/parity exact throughout.

Variants (perf probes; some intentionally compute wrong results):
  full      - the stacked kernel column (S outputs)
  noprof    - profile replaced by a constant (no letters/onehot/dot)
  onedot    - single-segment-style profile: one letter row, [R,32] qp
  noemit    - per-segment emits replaced by one unconditional emit
  out1*     - single output ref (+qps/lett1/noseg/all combinations)
  outconst  - single output ref with a CONSTANT index map
  s1ctl     - this builder at S=1 (production-granularity control)
  single    - the production single-query ragged kernel at Q_pad ~= S*Qp

Usage: python tools/exp_sstack_ablate.py --S 4 --qpad 128 --chunks 256 \
           --variants full,out1,outconst,s1ctl,single
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from opal_tpu.engine import pallas_kernels as pk  # noqa: E402

TC = pk.T_CHUNK
NEG = pk.NEG
A_PAD = pk.A_PAD
SEG_M = pk.SEG_M


def build_variant(variant, S, Q_pad, B, go=3, ge=1):
    R = S * Q_pad
    n_out = (1 if variant.startswith("out1")
             or variant in ("outconst", "noinit") else S)
    small_lett = variant in ("lett1", "out1lett1", "out1all", "outconst",
                             "noinit")
    small_qp = variant in ("qps", "lett1", "noseg",
                           "out1qps", "out1all", "outconst", "noinit")

    def kernel(meta_ref, qp_ref, letters_ref, *refs):
        outs = refs[:n_out]
        h_ref, e_ref, m_ref, l32_ref = refs[n_out:]
        c = pl.program_id(0)
        i32, f32 = jnp.int32, jnp.float32
        row_ids = jax.lax.broadcasted_iota(i32, (R, B), 0)
        oh_letter = jax.lax.broadcasted_iota(i32, (S * A_PAD, B), 0) // S
        seg0 = row_ids == 0
        seg_idf = jnp.zeros((R, B), f32)
        start_vec = jnp.zeros((R, B), f32)
        for s in range(1, S):
            at = s * Q_pad
            seg0 = seg0 | (row_ids == at)
            seg_idf = seg_idf + (row_ids >= at).astype(f32)
            start_vec = jnp.where(row_ids >= at, float(at), start_vec)
        ramp2 = (row_ids.astype(f32) - start_vec) * ge + seg_idf * SEG_M
        if variant in ("noseg", "out1noseg", "out1all", "outconst"):
            # plain single-segment ramp (perf probe)
            seg0 = row_ids == 0
            ramp2 = row_ids.astype(f32) * ge

        @pl.when(c == 0)
        def _init():
            h_ref[:] = ramp2
            e_ref[:] = ramp2
            m_ref[:] = ramp2

        l32_ref[:] = letters_ref[0].astype(i32)

        def column(tt, _):
            if variant == "noprof":
                Pp = ramp2 * 0.25  # arbitrary constant work-free profile
            elif variant == "onedot" or small_qp:
                lt = l32_ref[pl.ds(tt, 1), :]
                lane_a = jax.lax.broadcasted_iota(i32, (A_PAD, B), 0)
                onehot = (lane_a == lt).astype(jnp.bfloat16)
                Pp = jnp.dot(qp_ref[:, :A_PAD], onehot,
                             preferred_element_type=f32)
            else:
                lts = jnp.concatenate(
                    [l32_ref[pl.ds((0 if small_lett else s * TC) + tt, 1),
                             :] for s in range(S)],
                    axis=0)
                onehot = (pltpu.repeat(lts, A_PAD, axis=0) == oh_letter
                          ).astype(jnp.bfloat16)
                Pp = jnp.dot(qp_ref[:], onehot, preferred_element_type=f32)
            Ht = h_ref[:]
            Et = e_ref[:]
            Enew = jnp.maximum(Ht - go, Et - ge)
            diag = pltpu.roll(Ht, 1, axis=0) + Pp
            diag = jnp.where(seg0, Pp + (ramp2 - ge), diag)
            Hp = jnp.maximum(Enew, diag)
            Hp = jnp.maximum(Hp, ramp2)
            X = pltpu.roll(Hp, 1, axis=0) + (ge - go)
            X = jnp.where(seg0, ramp2 - go, X)
            k = 1
            while k < R:
                X = jnp.maximum(
                    X,
                    jnp.where(row_ids >= k, pltpu.roll(X, k, axis=0), NEG))
                k *= 2
            Hnew = jnp.maximum(Hp, X)
            h_ref[:] = Hnew
            e_ref[:] = Enew
            m_ref[:] = jnp.maximum(m_ref[:], Hnew)
            return 0

        jax.lax.fori_loop(0, TC, column, 0)

        if variant != "full":
            @pl.when(c == pl.num_programs(0) - 1)
            def _em():
                best = jnp.max(m_ref[pl.ds(0, Q_pad), :], axis=0,
                               keepdims=True)
                outs[0][0, 0:1, :] = best.astype(outs[0].dtype)
        else:
            for s in range(S):
                @pl.when(meta_ref[5 * s + 2, c] == 1)
                def _em(s=s, out_ref=outs[s]):
                    sl = pl.ds(s * Q_pad, Q_pad)
                    r = (jax.lax.broadcasted_iota(i32, (Q_pad, B), 0)
                         .astype(f32) * ge + float(s) * SEG_M)
                    best = jnp.max(m_ref[sl, :] - r, axis=0, keepdims=True)
                    out_ref[0, 0:1, :] = best.astype(out_ref.dtype)

    qp_cols = A_PAD if small_qp else A_PAD * S
    lett_rows = TC if small_lett else S * TC

    def fn(meta, qp_bd, letters, nb):
        C = letters.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((R, qp_cols), lambda c, m: (0, 0)),
                pl.BlockSpec((1, lett_rows, B), lambda c, m: (c, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, B),
                             (lambda c, m: (0, 0, 0))
                             if variant == "outconst" else
                             functools.partial(
                                 lambda s, c, m: (m[5 * s, c], 0, 0), s))
                for s in range(n_out)
            ],
            scratch_shapes=[
                pltpu.VMEM((R, B), jnp.float32),
                pltpu.VMEM((R, B), jnp.float32),
                pltpu.VMEM((R, B), jnp.float32),
                pltpu.VMEM((lett_rows, B), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb, 1, B), jnp.int32)
                       for _ in range(n_out)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pk.VMEM_LIMIT),
        )(meta, qp_bd[:, :qp_cols], letters[:, :lett_rows])

    return jax.jit(fn, static_argnums=(3,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--qpad", type=int, default=128)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--chunks", type=int, default=512,
                    help="super-chunks per stream run")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--variants",
                    default="full,noprof,onedot,noemit,single")
    ap.add_argument("--per-block", type=int, default=8)
    args = ap.parse_args()
    S, Q_pad, B, C = args.S, args.qpad, args.B, args.chunks
    R = S * Q_pad
    rng = np.random.default_rng(0)

    # synthetic streams: each stream = blocks of per_block chunks
    per_block = args.per_block
    nb = C // per_block + 2
    meta = np.zeros((5 * S, C), np.int32)
    for s in range(S):
        meta[5 * s + 0] = np.arange(C) // per_block
        meta[5 * s + 1] = (np.arange(C) % per_block == 0)
        meta[5 * s + 2] = (np.arange(C) % per_block == per_block - 1)
        meta[5 * s + 3] = (np.arange(C) % per_block) * TC
        meta[5 * s + 4] = 1
    letters = rng.integers(0, 20, size=(C, S * TC, B)).astype(np.int8)
    qp = rng.integers(-4, 12, size=(Q_pad, A_PAD)).astype(np.float32)
    qp_bd = np.einsum("qa,st->sqat", qp, np.eye(S, dtype=np.float32)
                      ).reshape(R, A_PAD * S)
    meta_d = jax.device_put(meta)
    letters_d = jax.device_put(letters)
    qp_d = jax.device_put(jnp.asarray(qp_bd, jnp.bfloat16))

    # single-query control: same column height, C*S single chunks
    single_fn = pk.build_pallas_ragged_fn(
        3, 0, R - 8, 3, 1, B=B, out_i16=False)
    Cs = C * S
    smeta = np.zeros((5, Cs), np.int32)
    smeta[0] = np.arange(Cs) // per_block
    smeta[1] = (np.arange(Cs) % per_block == 0)
    smeta[2] = (np.arange(Cs) % per_block == per_block - 1)
    smeta[3] = (np.arange(Cs) % per_block) * TC
    smeta[4] = 1
    snb = Cs // per_block + 2
    sletters = rng.integers(0, 20, size=(Cs, TC, B)).astype(np.int8)
    slengths = np.full((snb, 1, B), per_block * TC, np.int32)
    sqp = pk.prepare_qp(
        rng.integers(-4, 12, size=(A_PAD - 8, R - 8)).astype(np.int32), 1)
    smeta_d = jax.device_put(smeta)
    sletters_d = jax.device_put(sletters)
    slengths_d = jax.device_put(slengths)
    sqp_d = jax.device_put(jnp.asarray(sqp, jnp.bfloat16))

    cells = C * S * TC * B * Q_pad  # stacked-real-cells equivalent

    # s1ctl: my builder at S=1, R-tall query, C*S single-width chunks —
    # the same column workload as the stacked variants but with the
    # production path's grid granularity (isolates grid-step count).
    s1_fn = build_variant("outconst", 1, R, B)
    s1meta = np.zeros((5, Cs), np.int32)
    s1meta[0] = np.arange(Cs) // per_block
    s1letters = letters.reshape(Cs, TC, B)
    s1meta_d = jax.device_put(s1meta)
    s1letters_d = jax.device_put(s1letters)
    s1qp_d = jax.device_put(jnp.asarray(qp_bd[:, :A_PAD], jnp.bfloat16))

    for variant in args.variants.split(","):
        if variant == "s1ctl":
            def run():
                return [np.asarray(o) for o in
                        s1_fn(s1meta_d, s1qp_d, s1letters_d, snb)]
        elif variant == "single":
            def run():
                return np.asarray(
                    single_fn(smeta_d, sqp_d, sletters_d, slengths_d))
        else:
            fn = build_variant(variant, S, Q_pad, B)

            def run(fn=fn):
                return [np.asarray(o)
                        for o in fn(meta_d, qp_d, letters_d, nb)]
        run()  # warm/compile
        ts = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{variant:8s} best {best*1e3:8.2f} ms  "
              f"{cells/best/1e9:7.1f} eff-GCUPS  "
              f"({best/ (C*TC) *1e6:6.2f} us/supercol)")


if __name__ == "__main__":
    sys.exit(main())
