"""TPU capability probe: can a Pallas kernel take a bool (pred) VMEM input
block, and can it reduce a [gb, kk, W] hit tensor to [gb, kk] vector outs?

Feeds the masked-gather + fused-recovery design (ops/pallas_peel.py): the
dead-lane mask is [B, m, W] bool; applying it on copy inside the gather
kernel deletes an 88 MB where-pass, but only if Mosaic accepts pred blocks
(fallback: int8). Run: python tools/probe_pred_input.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sibrar_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_kernel(d_ref, x_ref, o_ref):
    o_ref[...] = jnp.where(d_ref[...], -1e30, x_ref[...])


def try_mask(dtype_name: str):
    b, m, w = 16, 168, 128
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, m, w)),
                    jnp.float32)
    d_bool = jnp.asarray(np.random.default_rng(1).random((b, m, w)) < 0.1)
    d = d_bool if dtype_name == "bool" else d_bool.astype(jnp.int8)

    def kern(d_ref, x_ref, o_ref):
        dd = d_ref[...] if dtype_name == "bool" else d_ref[...] != 0
        o_ref[...] = jnp.where(dd, -1e30, x_ref[...])

    out = pl.pallas_call(
        kern,
        grid=(b // 8,),
        in_specs=[pl.BlockSpec((8, m, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, m, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, m, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, w), jnp.float32),
    )(d, x)
    ref = jnp.where(d_bool, -1e30, x)
    ok = bool(jnp.array_equal(out, ref))
    print(f"mask input dtype={dtype_name}: compile+run OK, exact={ok}")


def try_recover():
    """Compile + exactness + TIMING of the library recover_winners kernel at
    bench shapes (timing via profiler trace; wall probes through the tunnel
    lie)."""
    from sibrar_tpu.ops.pallas_peel import recover_winners

    b, m, w, kk = 1024, 168, 128, 100
    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(b, m, w)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, m, size=(b, kk)), jnp.int32)
    widx = jnp.asarray(rng.integers(0, 784, size=(b, m)), jnp.int32)
    v = jnp.take_along_axis(
        g.reshape(b, m * w),
        slots * w + jnp.asarray(rng.integers(0, w, (b, kk)), jnp.int32), 1)
    lane, nhit, wsel = recover_winners(g, widx, slots, v)
    # oracle
    rows = jnp.take_along_axis(g, slots[:, :, None], axis=1)
    hit = rows == v[:, :, None]
    lane_ref = jnp.min(jnp.where(hit, jnp.arange(w), w), axis=-1)
    nhit_ref = jnp.sum(hit, axis=-1)
    wsel_ref = jnp.take_along_axis(widx, slots, axis=1)
    print("recover kernel: lane exact=", bool(jnp.array_equal(lane, lane_ref)),
          "nhit exact=", bool(jnp.array_equal(nhit, nhit_ref)),
          "wsel exact=", bool(jnp.array_equal(wsel, wsel_ref)))
    import glob
    import gzip
    import json
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(8):
                lane, nhit, wsel = recover_winners(g, widx, slots, v)
            lane.block_until_ready()
        tot = 0.0
        for path in glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                              recursive=True):
            with gzip.open(path, "rt") as fh:
                for ev in json.load(fh).get("traceEvents", []):
                    if (ev.get("ph") == "X"
                            and "recover" in ev.get("name", "")):
                        tot += ev.get("dur", 0.0)
        print(f"recover_winners device time: {tot / 8 / 1e3:.3f} ms/it")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "bool"):
        try_mask("bool")
    if which in ("all", "int8"):
        try_mask("int8")
    if which in ("all", "recover"):
        try_recover()
