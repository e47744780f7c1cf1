"""Single-HBM-read exact-class dense matmul for the structured denominator.

The structured den scans apply a constant [F, F] fp32 matrix M (the
phone-LM residual) to a [F, N] probability vector every frame, forward and
backward — ~2T applications per training step at production scale
(F=3526, T_out=49: docs/PERFORMANCE.md "the structured den's next lever").
XLA's Precision.HIGH lowering re-reads the fp32 matrix once per bf16 pass
(3 passes, ~150 MB of HBM per application for a 50 MB matrix), and the
round-4 stacked-split3 experiment showed the single-matmul alternative
goes compute-bound instead (9x FLOPs: 60.4 vs 38.4 ms den fwd-bwd at
B=128 — measured, tools/chainbench.py).

This kernel reads each fp32 M tile from HBM exactly ONCE (Pallas grid
pipelining double-buffers the tile DMA against compute), decomposes it
in-register into bf16 terms (m0 + m1 [+ m2] — fp32's 24 mantissa bits
split exactly into three 8-bit bf16 terms), and runs the cross-product
dots from VMEM at MXU rate:

  terms=3:  m0v0 + m1v0 + m0v1                (bf16x3 — XLA HIGH's class)
  terms=6:  + m1v1 + m2v0 + m0v2              (~fp32 class, no 2^-17
                                               representation error left)

The v operand ([F, N], ~1.8 MB) is split OUTSIDE the kernel (cheap
elementwise) and stays VMEM-resident across all row tiles (constant
index_map).  Traffic per application: 50 MB (the fp32 matrix, once)
vs HIGH's ~150 MB; FLOPs 3x/6x one bf16 pass — at N=128 the 6-term
variant is compute-memory balanced, the 3-term variant memory-bound.

Only used for the in-scan applications where n == N is small; the bulk
posterior pass amortizes its matrix read over Tc frames already and keeps
the XLA lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 128    # row-tile height (fp32 sublane multiple; VMEM-sized)
LANE = 128  # lane width: last-dim padding quantum


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split3_kernel(m_ref, v_ref, o_ref, v0s, v1s, v2s, *, terms: int):
    # Both operands split IN-KERNEL.  Two measured traps shaped this
    # (TPU v5e, 2026-08-19 sweep — docs/PERFORMANCE.md round 4):
    #   * pre-splitting on the host and feeding bf16 terms through
    #     constant BlockSpecs silently corrupts the correction terms
    #     (3e-4 rel gridded vs 3e-7 single-block — a bf16 const-block
    #     pipelining bug on this toolchain); pre-split bf16 M row
    #     streams are also simply SLOWER (148 vs 141 us/apply: 75 MB
    #     bf16x3 streamed vs 50 MB fp32 + VPU split — memory-bound).
    #   * re-splitting v at every grid step costs ~250 us/apply; the
    #     split runs ONCE at grid step 0 into VMEM scratch, which
    #     persists across the sequential row-tile steps.
    @pl.when(pl.program_id(0) == 0)
    def _():
        v = v_ref[:]                               # [Fp, n] fp32
        v0 = v.astype(jnp.bfloat16)
        rv = v - v0.astype(jnp.float32)
        v1 = rv.astype(jnp.bfloat16)
        v0s[:] = v0
        v1s[:] = v1
        v2s[:] = (rv - v1.astype(jnp.float32)).astype(jnp.bfloat16)

    m = m_ref[:]                                   # [TM, Fp] fp32
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


@functools.partial(jax.jit, static_argnames=("terms",))
def _apply_padded(M_pad, v_pad, terms: int):
    Fp_out, Fp_in = M_pad.shape
    n = v_pad.shape[1]
    flops = 2 * Fp_out * Fp_in * n * terms
    return pl.pallas_call(
        functools.partial(_split3_kernel, terms=terms),
        grid=(Fp_out // TM,),
        in_specs=[
            pl.BlockSpec((TM, Fp_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp_in, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp_out, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Fp_in, n), jnp.bfloat16)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=Fp_out * Fp_in * 4 + Fp_in * n * 4
            + Fp_out * n * 4,
            transcendentals=0),
    )(M_pad, v_pad)


class PallasDenMatmul:
    """Pre-padded constant matrix with single-read split-bf16 application.

    Holds M (and M.T) padded to [Fp, Fp] once; `apply(v, transpose)`
    pads/strips the vector axis per call.
    """

    def __init__(self, M: np.ndarray, terms: int = 6):
        assert terms in (3, 6)
        self.terms = terms
        self.F = int(M.shape[0])
        self.Fp = _round_up(self.F, TM)
        pad = self.Fp - self.F
        Mp = np.pad(np.asarray(M, np.float32), ((0, pad), (0, pad)))
        self._M = jnp.asarray(Mp)
        self._MT = jnp.asarray(Mp.T.copy())

    def apply(self, v: jnp.ndarray, transpose: bool) -> jnp.ndarray:
        """[F, ...] -> [F, ...] = (M.T if transpose else M) @ v."""
        vshape = v.shape
        v2d = v.reshape(self.F, -1)
        n = v2d.shape[1]
        npad = _round_up(n, LANE)
        v2d = jnp.pad(v2d, ((0, self.Fp - self.F), (0, npad - n)))
        out = _apply_padded(self._MT if transpose else self._M, v2d,
                            self.terms)
        return out[:self.F, :n].reshape(vshape)
