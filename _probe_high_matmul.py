"""Scratch probe: is the structured den's Precision.HIGH matmul paying
redundant HBM reads of the [F, F] M matrix that a manual hi/lo bf16
split would avoid?  Times a T-step scan of [R, F] @ [F, F] under:
  a) fp32 DEFAULT  (single-pass bf16 — the revoked fast class)
  b) fp32 HIGH     (bf16x3 — the current exact lowering)
  c) fp32 HIGHEST  (fp32 — reference)
  d) manual split: M = M_hi(bf16) + M_lo(bf16), 3 DEFAULT matmuls
     x@M ~ x_hi@M_hi + x_hi@M_lo + x_lo@M_hi (same decomposition HIGH
     uses), fp32 accumulate
Also reports per-variant COMPILE wall time (the exact den compiles
~15x slower than fast at cold geometries).
Run from repo root.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

F = 3526
R = 256          # B=128 x L=2 rows
T = 49
rng = np.random.default_rng(0)
M = jnp.asarray(rng.normal(size=(F, F)).astype(np.float32))
x0 = jnp.asarray(rng.normal(size=(R, F)).astype(np.float32))


def split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_scan(prec):
    @jax.jit
    def run(x, M):
        def step(c, _):
            y = jnp.dot(c, M, precision=prec,
                        preferred_element_type=jnp.float32)
            # normalize to keep values finite across 49 steps
            return y / (jnp.abs(y).max() + 1.0), None
        out, _ = jax.lax.scan(step, x, None, length=T)
        return out
    return run


@jax.jit
def run_split(x, M_hi, M_lo):
    def step(c, _):
        c_hi, c_lo = split_bf16(c)
        y = (jnp.dot(c_hi, M_hi, preferred_element_type=jnp.float32)
             + jnp.dot(c_hi, M_lo, preferred_element_type=jnp.float32)
             + jnp.dot(c_lo, M_hi, preferred_element_type=jnp.float32))
        return y / (jnp.abs(y).max() + 1.0), None
    out, _ = jax.lax.scan(step, x, None, length=T)
    return out


def bench(name, fn, *args):
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        r = fn(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:28s} {ms:8.2f} ms/scan   compile {compile_s:6.1f} s")
    return r


ref = bench("fp32 HIGHEST (6-pass)",
            make_scan(jax.lax.Precision.HIGHEST), x0, M)
a = bench("fp32 DEFAULT (1-pass bf16)",
          make_scan(jax.lax.Precision.DEFAULT), x0, M)
b = bench("fp32 HIGH (bf16x3)",
          make_scan(jax.lax.Precision.HIGH), x0, M)
M_hi, M_lo = split_bf16(M)
c = bench("manual split bf16x3", run_split, x0, M_hi, M_lo)

for name, r in (("DEFAULT", a), ("HIGH", b), ("split", c)):
    err = float(jnp.abs(r - ref).max() / (jnp.abs(ref).max() + 1e-30))
    print(f"rel err vs HIGHEST  {name:8s} {err:.3e}")
