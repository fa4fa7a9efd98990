"""Mosaic capability probe: dynamic-shift roll / unaligned dynamic lane reads.

Usage: python tools/probe_roll.py {roll|unaligned|segment}
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def probe_roll():
    """pltpu.roll with a data-computed (traced) shift amount."""
    def kernel(s_ref, x_ref, o_ref):
        sh = s_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], -sh, 1)

    x = jnp.arange(256, dtype=jnp.float32).reshape(1, 256)
    s = jnp.asarray([37], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 256), jnp.float32),
    )(s, x)
    ref = np.roll(np.arange(256, dtype=np.float32), -37)
    return bool(np.array_equal(np.asarray(out)[0], ref))


def probe_unaligned():
    """dynamic lane ds with NO alignment proof (expected: rejected)."""
    def kernel(s_ref, x_ref, o_ref):
        sh = s_ref[0]
        o_ref[0, :] = x_ref[0, pl.ds(sh, 128)]

    x = jnp.arange(512, dtype=jnp.float32).reshape(1, 512)
    s = jnp.asarray([37], jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(s, x)
    return bool(np.array_equal(np.asarray(out)[0],
                               np.arange(37, 165, dtype=np.float32)))


def probe_segment():
    """Segment gather: out[b, :L] = flat[start[b] : start[b]+L] via aligned
    128-block reads + dynamic roll. The csr_row_gather replacement pattern."""
    L = 256  # padded row length (multiple of 128)
    N = 8192

    def kernel(st_ref, flat_ref, o_ref, *, gb):
        for bb in range(gb):
            s = st_ref[bb]
            base = pl.multiple_of((s // 128) * 128, 128)
            blk = flat_ref[:, pl.ds(base, L + 128)]  # [1, L+128] aligned
            rolled = pltpu.roll(blk, -(s % 128), 1)
            o_ref[bb:bb + 1, :] = rolled[:, :L]

    flat = jnp.arange(N, dtype=jnp.int32).reshape(1, N)
    starts = jnp.asarray([5, 131, 1000, 2047, 300, 0, 7777, 4095], jnp.int32)
    out = pl.pallas_call(
        functools.partial(kernel, gb=8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
    )(starts, flat)
    ref = np.stack([np.arange(s, s + L) for s in np.asarray(starts)])
    return bool(np.array_equal(np.asarray(out), ref))


def main():
    which = sys.argv[1]
    try:
        ok = {"roll": probe_roll, "unaligned": probe_unaligned,
              "segment": probe_segment}[which]()
        print(json.dumps({"probe": which, "ok": ok}))
    except Exception as e:
        print(json.dumps({"probe": which, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}))


if __name__ == "__main__":
    main()
