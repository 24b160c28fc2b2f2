#!/usr/bin/env python3
"""2-column unroll probe for the SW score-only column loop (dev tool).

Processes two DP columns per fori_loop iteration with the running-max
update fused: m = max(m, max(H1, H2)) — exact by associativity — saving
one elementwise op and half the m read/write VMEM traffic per column,
plus half the loop bookkeeping. Times baseline vs unroll2 on synthetic
uniform streams in ONE process.
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


def build(variant, Q_pad, B, go=3, ge=1):
    def kernel(meta_ref, qp_ref, letters_ref, out_ref, h_ref, e_ref,
               m_ref, l32_ref):
        c = pl.program_id(0)
        i32, f32 = jnp.int32, jnp.float32
        row_ids = jax.lax.broadcasted_iota(i32, (Q_pad, B), 0)
        lane_a = jax.lax.broadcasted_iota(i32, (A_PAD, B), 0)
        is_row0 = row_ids == 0
        ramp = row_ids.astype(f32) * ge

        @pl.when(c == 0)
        def _init():
            h_ref[:] = ramp
            e_ref[:] = ramp
            m_ref[:] = ramp

        l32_ref[:] = letters_ref[0].astype(i32)

        def one_col(tt, Ht, Et):
            lt = l32_ref[pl.ds(tt, 1), :]
            onehot = (lane_a == lt).astype(jnp.bfloat16)
            Pp = jnp.dot(qp_ref[:], onehot, preferred_element_type=f32)
            Enew = jnp.maximum(Ht - go, Et - ge)
            diag = pltpu.roll(Ht, 1, axis=0) + Pp
            diag = jnp.where(is_row0, Pp - ge, diag)
            Hp = jnp.maximum(Enew, diag)
            Hp = jnp.maximum(Hp, ramp)
            X = pltpu.roll(Hp, 1, axis=0) + (ge - go)
            X = jnp.where(is_row0, -float(go), X)
            k = 1
            while k < Q_pad:
                X = jnp.maximum(
                    X,
                    jnp.where(row_ids >= k, pltpu.roll(X, k, axis=0), NEG))
                k *= 2
            return jnp.maximum(Hp, X), Enew

        if variant == "base":
            def column(tt, _):
                Hnew, Enew = one_col(tt, h_ref[:], e_ref[:])
                h_ref[:] = Hnew
                e_ref[:] = Enew
                m_ref[:] = jnp.maximum(m_ref[:], Hnew)
                return 0

            jax.lax.fori_loop(0, TC, column, 0)
        elif variant == "unroll2":  # fused m, one state write per 2 columns
            def column2(uu, _):
                H1, E1 = one_col(2 * uu, h_ref[:], e_ref[:])
                H2, E2 = one_col(2 * uu + 1, H1, E1)
                h_ref[:] = H2
                e_ref[:] = E2
                m_ref[:] = jnp.maximum(m_ref[:], jnp.maximum(H1, H2))
                return 0

            jax.lax.fori_loop(0, TC // 2, column2, 0)
        else:  # unrollN: one state write per N columns
            n = int(variant[len("unroll"):])

            def columnN(uu, _):
                H, E = h_ref[:], e_ref[:]
                ms = []
                for j in range(n):
                    H, E = one_col(n * uu + j, H, E)
                    ms.append(H)
                h_ref[:] = H
                e_ref[:] = E
                m_ref[:] = jnp.maximum(
                    m_ref[:], functools.reduce(jnp.maximum, ms))
                return 0

            jax.lax.fori_loop(0, TC // n, columnN, 0)

        @pl.when(c == pl.num_programs(0) - 1)
        def _emit():
            best = jnp.max(m_ref[:] - ramp, axis=0, keepdims=True)
            out_ref[0, 0:1, :] = best.astype(out_ref.dtype)

    def fn(meta, qp, letters, nb):
        C = letters.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((Q_pad, A_PAD), lambda c, m: (0, 0)),
                pl.BlockSpec((1, TC, B), lambda c, m: (c, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, 1, B), lambda c, m: (m[0, c], 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((Q_pad, B), jnp.float32),
                pltpu.VMEM((Q_pad, B), jnp.float32),
                pltpu.VMEM((Q_pad, B), jnp.float32),
                pltpu.VMEM((TC, B), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb, 1, B), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pk.VMEM_LIMIT),
        )(meta, qp, letters)

    return jax.jit(fn, static_argnums=(3,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qpad", type=int, default=112)
    ap.add_argument("--B", type=int, default=1024)
    ap.add_argument("--chunks", type=int, default=1024)
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()
    Q_pad, B, C = args.qpad, args.B, args.chunks
    rng = np.random.default_rng(0)
    nb = 2  # one stream-spanning block: only row 0 of the output is real
    meta = np.zeros((6, C), np.int32)
    letters = rng.integers(0, 20, size=(C, TC, B)).astype(np.int8)
    qp = pk.prepare_qp(
        rng.integers(-4, 12, size=(24, Q_pad - 8)).astype(np.int32), 1)
    meta_d = jax.device_put(meta)
    letters_d = jax.device_put(letters)
    qp_d = jax.device_put(jnp.asarray(qp, jnp.bfloat16))

    variants = ("base", "unroll2", "unroll4", "unroll8")
    fns = {v: build(v, Q_pad, B) for v in variants}
    outs = {}
    for v, fn in fns.items():
        outs[v] = [np.asarray(o) for o in fn(meta_d, qp_d, letters_d, nb)]
    for v in variants[1:]:
        assert np.array_equal(outs["base"][0][0], outs[v][0][0]), f"PARITY {v}"
    times = {v: [] for v in fns}
    for _ in range(args.rounds):
        for v, fn in fns.items():
            t0 = time.perf_counter()
            [np.asarray(o) for o in fn(meta_d, qp_d, letters_d, nb)]
            times[v].append(time.perf_counter() - t0)
    cells = C * TC * B * Q_pad
    for v, ts in times.items():
        b = min(ts)
        print(f"{v:8s} best {b*1e3:8.2f} ms  {cells/b/1e9:7.1f} padded-GCUPS")
    print("parity: MATCH")


if __name__ == "__main__":
    sys.exit(main())
