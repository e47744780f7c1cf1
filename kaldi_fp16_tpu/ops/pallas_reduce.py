"""Pallas TPU kernel: blocked segment reduction with on-the-fly one-hots.

The chain recursions (denominator/numerator forward-backward) reduce per-arc
values into per-state / per-pdf sums.  The XLA formulation is a batched
matmul against STORED one-hot block matrices — correct, but it streams
~NB*J*AC*SB bytes of constant one-hot from HBM every frame (31-62 MB at
den.fst scale, the dominant cost of the reduce).

This kernel builds the one-hot rows ON THE FLY in VMEM from int32 local
labels (4 bytes/arc instead of SB bytes/arc of one-hot) and feeds the MXU
directly:

    out[b, s, n] = sum_{k : labels[b, k] == s} vals[b, k, n]

Labels hold the LOCAL key (key - block*SB) in [0, SB); padding slots use
label SB (or anything >= SB), which matches no iota row and contributes
nothing — the same zero-row convention as the stored one-hots.

exact=True splits the fp32 values into bf16 hi+lo parts (one-hots are
exactly representable in bf16), two MXU passes, fp32 accumulate —
~1e-6 relative error.  exact=False rounds values to bf16 (single pass),
matching the 'fast' mode drift class.

The grid tiles the arc axis (accumulating into the output block, matmul
style) and the lane axis, so VMEM stays bounded for any K and N.
Falls back to interpreter mode off-TPU (tests run on the CPU backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reduce_kernel(labels_ref, vals_ref, out_ref, *, sb: int, kc: int,
                   exact: bool):
    b = pl.program_id(0)
    k = pl.program_id(2)
    lab = labels_ref[b, pl.ds(k * kc, kc)]                  # [Kc] int32
    oh = (jax.lax.broadcasted_iota(jnp.int32, (sb, kc), 0)
          == lab[None, :]).astype(jnp.bfloat16)             # [SB, Kc]
    v = vals_ref[0]                                         # [Kc, Nc] f32
    if exact:
        v_hi = v.astype(jnp.bfloat16)
        v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (jnp.dot(oh, v_hi, preferred_element_type=jnp.float32)
               + jnp.dot(oh, v_lo, preferred_element_type=jnp.float32))
    else:
        out = jnp.dot(oh, v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += out


@functools.partial(jax.jit, static_argnames=("sb", "exact", "n_block",
                                             "k_block"))
def blocked_segment_reduce(vals: jnp.ndarray, labels: jnp.ndarray,
                           sb: int = 128, exact: bool = True,
                           n_block: int = 512,
                           k_block: int = 2048) -> jnp.ndarray:
    """vals [NB, K, N] f32, labels [NB, K] int32 (local keys, >=sb = pad)
    -> [NB, sb, N] f32 per-block segment sums."""
    NB, K, N = vals.shape
    nb_n = max(1, -(-N // n_block))
    Nc = -(-N // nb_n)
    if N % Nc:
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, Nc * nb_n - N)))
    nb_k = max(1, -(-K // k_block))
    Kc = -(-K // nb_k)
    if Kc % 128:
        Kc = -(-Kc // 128) * 128
        nb_k = -(-K // Kc)
    if K % Kc or nb_k * Kc != K:
        pad_k = nb_k * Kc - K
        vals = jnp.pad(vals, ((0, 0), (0, pad_k), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad_k)),
                         constant_values=sb)
    grid = (NB, nb_n, nb_k)
    kernel = functools.partial(_reduce_kernel, sb=sb, kc=Kc, exact=exact)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole label table resident in VMEM (4 B/arc); indexed by
            # program_id — a blocked (1, Kc) spec would violate the
            # (8, 128) block-shape tiling rule
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kc, Nc), lambda b, n, k: (b, k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sb, Nc), lambda b, n, k: (b, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, sb, nb_n * Nc), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(labels, vals)
    return out[:, :, :N]
