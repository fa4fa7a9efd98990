"""Transpose-free dW GEMM for the interaction towers' sparse first layer.

The dense path of `models/layers.InteractionTower` computes
``pre = dense @ kernel`` with ``dense = [R, n_cols]`` (densified 0/1 CSR
rows, `/root/reference/algorithms/sgd_alg.py:1175-1181` is the reference
pattern). Its backward w.r.t. the kernel is ``dW = dense^T @ g`` — and XLA
on TPU materializes a physically transposed copy of the WHOLE dense matrix
to feed the MXU (376 MB bf16 at the Onion item-tower shape R=5632,
n_cols=50048; a custom-vjp respelling ``(g^T @ dense)^T`` measured as a
no-op because XLA canonicalizes both spellings to the same program —
tools/probe_bag_vs_dense.py).

This kernel computes the same contraction by blocking over (col-tile,
row-tile) and letting the MXU consume each ``[rb, cb]`` dense tile in its
NATIVE layout — `lax.dot_general` contracting dim 0 of both operands.
Mosaic handles the in-register orientation; nothing round-trips HBM
transposed. The out tile ``[cb, h]`` is revisited across the row-tile grid
axis (last axis fastest) and accumulated in VMEM.

CRITICAL sizing lesson (r3 probe): block sizes must be chosen as exact
DIVISORS of the operand dims. The first cut padded ``[R, C]`` to block
multiples with `jnp.pad` and sliced the result — four full-matrix HBM
copies (pad, two boundary relayouts, out slice, ~2.3 ms EACH at the
1.13 GB Onion dense shape) that cost 4x the transpose copy this kernel
exists to delete. `dw_viable` therefore requires dims that factor into
in-budget blocks and the caller falls back to plain XLA otherwise; only
``h`` (the small output width) is ever padded.

Numerics: f32 accumulation, MXU bf16-pass products — the framework-wide
f32-matmul norm (~5e-3 relative), same class as the XLA program it
replaces. Zero-filled h padding contributes exact zeros.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# VMEM budget for the scoped window (double-buffered inputs + out tile).
_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_blocks(r: int, c: int, h: int, itemsize: int):
    """(rb, cb, hp) with rb | r, cb | c, blocks within the VMEM budget and
    a sane grid — or None when no divisor pair fits (caller pads, which is
    only acceptable off the hot path / in tests)."""
    if r % 8 or c % 128:
        return None
    hp = -(-h // 128) * 128
    q = c // 128
    # largest 128-multiple col tile ≤ 4096 lanes that divides c
    cands = [d for d in range(min(q, 32), 0, -1) if q % d == 0]
    rbs = [x for x in (512, 256, 128, 64, 32, 16, 8) if x <= r]
    for d in cands:
        cb = d * 128
        out_bytes = cb * hp * 4
        for rb in rbs:
            if r % rb:
                continue
            need = 2 * rb * cb * itemsize + 2 * rb * hp * 4 + out_bytes
            if need <= _VMEM_BUDGET and (c // cb) * (r // rb) <= 4096:
                return rb, cb, hp
    return None


def dw_viable(r: int, c: int, h: int, itemsize: int = 4) -> bool:
    """Static gate: True when a no-copy block decomposition exists."""
    return _pick_blocks(r, c, h, itemsize) is not None


def _dw_kernel(vec_ref, g_ref, out_ref):
    from jax.experimental import pallas as pl

    ri = pl.program_id(1)

    @pl.when(ri == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    v = vec_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    out_ref[...] += lax.dot_general(
        v, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dw_matmul(vec: jax.Array, g: jax.Array, *,
              interpret: bool = False) -> jax.Array:
    """``dW[c, h] = Σ_r vec[r, c] · g[r, h]`` without an HBM transpose.

    vec: [R, C] (f32 or bf16 — 0/1 densified rows, possibly normalized),
    g: [R, h] f32 cotangent of ``vec @ kernel``. Returns [C, h] f32.
    Requires `dw_viable(R, C, h)`; only h is padded (small).
    """
    from jax.experimental import pallas as pl

    r, c = vec.shape
    r2, h = g.shape
    assert r == r2, (vec.shape, g.shape)
    picked = _pick_blocks(r, c, h, vec.dtype.itemsize)
    if picked is None:
        # pad path: full-matrix HBM copies — correctness fallback for
        # unaligned shapes (tests, small models); production callers gate
        # on dw_viable and ride XLA instead
        hp = -(-h // 128) * 128
        itemsize = vec.dtype.itemsize
        rb = cb = None
        # shrink blocks until the (double-buffered inputs + out tile) set
        # fits Mosaic's scoped-VMEM window — large h would otherwise
        # compile-fail ("scoped allocation exceeds 16.00M")
        for cb_try in (512, 256, 128):
            for rb_try in (256, 128, 64, 32, 16, 8):
                need = (2 * rb_try * cb_try * itemsize
                        + 2 * rb_try * hp * 4 + cb_try * hp * 4)
                if need <= _VMEM_BUDGET:
                    rb, cb = rb_try, cb_try
                    break
            if rb is not None:
                break
        if rb is None:
            raise ValueError(
                f"dw_matmul pad fallback cannot fit VMEM for h={h} "
                f"(hp={hp}); use the XLA matmul instead")
        rb, cb = min(rb, -(-r // 8) * 8), min(cb, -(-c // 128) * 128)
        rp, cp = -(-r // rb) * rb, -(-c // cb) * cb
        vec = jnp.pad(vec, ((0, rp - r), (0, cp - c)))
    else:
        rb, cb, hp = picked
        rp, cp = r, c
    if rp != r or hp != h:
        g = jnp.pad(g, ((0, rp - r), (0, hp - h)))
    grid = (cp // cb, rp // rb)
    out = pl.pallas_call(
        _dw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, cb), lambda ci, ri: (ri, ci)),
            pl.BlockSpec((rb, hp), lambda ci, ri: (ri, 0)),
        ],
        out_specs=pl.BlockSpec((cb, hp), lambda ci, ri: (ci, 0)),
        out_shape=jax.ShapeDtypeStruct((cp, hp), jnp.float32),
        interpret=interpret,
    )(vec, g)
    if cp != c or hp != h:
        out = out[:c, :h]
    return out
