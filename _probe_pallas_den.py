"""TPU probe: variants of the single-read den matmul kernel.

Sweeps {pre-split-M vs in-kernel-split} x {terms} x {TM} at production
scale and prints accuracy + us/apply for 98 sequential applications.
Scratch experiment script (repo root for axon discovery); findings land
in ops/pallas_den_matmul.py + docs/PERFORMANCE.md.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_mpre(m0_ref, m1_ref, m2_ref, v_ref, o_ref, v0s, v1s, v2s, *,
                terms):
    @pl.when(pl.program_id(0) == 0)
    def _():
        v = v_ref[:]
        v0 = v.astype(jnp.bfloat16)
        rv = v - v0.astype(jnp.float32)
        v1 = rv.astype(jnp.bfloat16)
        v0s[:] = v0
        v1s[:] = v1
        v2s[:] = (rv - v1.astype(jnp.float32)).astype(jnp.bfloat16)

    m0, m1 = m0_ref[:], m1_ref[:]
    v0, v1 = v0s[:], v1s[:]
    acc = jnp.dot(m0, v0, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(m1, v0, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(m0, v1, preferred_element_type=jnp.float32)
    if terms == 6:
        m2, v2 = m2_ref[:], v2s[:]
        acc = acc + jnp.dot(m1, v1, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(m2, v0, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(m0, v2, preferred_element_type=jnp.float32)
    o_ref[:] = acc


def make_mpre(M, terms, TM):
    F = M.shape[0]
    Fp = -(-F // TM) * TM
    Mp = np.pad(np.asarray(M, np.float32), ((0, Fp - F), (0, Fp - F)))
    m0 = Mp.astype(jnp.bfloat16)
    r = Mp - np.asarray(m0, np.float32)
    m1 = r.astype(jnp.bfloat16)
    m2 = (r - np.asarray(m1, np.float32)).astype(jnp.bfloat16)
    m0, m1, m2 = jnp.asarray(m0), jnp.asarray(m1), jnp.asarray(m2)
    n = 128

    @jax.jit
    def apply(v):
        vp = jnp.pad(v, ((0, Fp - F), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel_mpre, terms=terms),
            grid=(Fp // TM,),
            in_specs=[
                pl.BlockSpec((TM, Fp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, Fp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TM, Fp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Fp, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Fp, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Fp, n), jnp.bfloat16)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=2 * Fp * Fp * n * terms,
                bytes_accessed=3 * Fp * Fp * 2 + Fp * n * 8,
                transcendentals=0),
        )(m0, m1, m2, vp)
        return out[:F]
    return apply


def kernel_msplit(m_ref, v_ref, o_ref, v0s, v1s, v2s, *, terms):
    @pl.when(pl.program_id(0) == 0)
    def _():
        v = v_ref[:]
        v0 = v.astype(jnp.bfloat16)
        rv = v - v0.astype(jnp.float32)
        v1 = rv.astype(jnp.bfloat16)
        v0s[:] = v0
        v1s[:] = v1
        v2s[:] = (rv - v1.astype(jnp.float32)).astype(jnp.bfloat16)

    m = m_ref[:]
    m0 = m.astype(jnp.bfloat16)
    r = m - m0.astype(jnp.float32)
    m1 = r.astype(jnp.bfloat16)
    v0, v1 = v0s[:], v1s[:]
    acc = jnp.dot(m0, v0, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(m1, v0, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(m0, v1, preferred_element_type=jnp.float32)
    if terms == 6:
        m2 = (r - m1.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(m1, v1, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(m2, v0, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(m0, v2s[:], preferred_element_type=jnp.float32)
    o_ref[:] = acc


def make_msplit(M, terms, TM):
    F = M.shape[0]
    Fp = -(-F // TM) * TM
    Mp = jnp.asarray(np.pad(np.asarray(M, np.float32),
                            ((0, Fp - F), (0, Fp - F))))
    n = 128

    @jax.jit
    def apply(v):
        vp = jnp.pad(v, ((0, Fp - F), (0, 0)))
        out = pl.pallas_call(
            functools.partial(kernel_msplit, terms=terms),
            grid=(Fp // TM,),
            in_specs=[
                pl.BlockSpec((TM, Fp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Fp, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Fp, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((Fp, n), jnp.bfloat16)] * 3,
            cost_estimate=pl.CostEstimate(
                flops=2 * Fp * Fp * n * terms,
                bytes_accessed=Fp * Fp * 4 + Fp * n * 8,
                transcendentals=0),
        )(Mp, vp)
        return out[:F]
    return apply


def main():
    rng = np.random.default_rng(0)
    F, N = 3526, 128
    M = (rng.random((F, F)) * (rng.random((F, F)) < 0.008)).astype(np.float32)
    v = jnp.asarray(rng.random((F, N)).astype(np.float32))
    ref = np.asarray(M, np.float64) @ np.asarray(v, np.float64)

    for name, maker in [("mpre", make_mpre), ("msplit", make_msplit)]:
        for terms in (3, 6):
            for TM in (64, 128, 256):
                try:
                    ap = maker(M, terms, TM)
                    out = np.asarray(ap(v), np.float64)
                    rel = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-10))

                    @jax.jit
                    def loop(x, _ap=ap):
                        def step(c, _):
                            c = _ap(c)
                            s = jnp.sum(jnp.abs(c), 0, keepdims=True)
                            return c / s, None
                        r, _ = jax.lax.scan(step, x, None, length=98)
                        return r
                    r = loop(v)
                    r.block_until_ready()
                    t0 = time.perf_counter()
                    for _ in range(10):
                        r = loop(v)
                    r.block_until_ready()
                    us = (time.perf_counter() - t0) / 10 / 98 * 1e6
                    print(f"{name} terms={terms} TM={TM}: rel={rel:.2e} "
                          f"{us:.0f} us/apply", flush=True)
                except Exception as e:
                    print(f"{name} terms={terms} TM={TM}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
