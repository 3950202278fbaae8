"""Minimal reproduction: pltpu.roll with a NEGATIVE dynamic shift along the
sublane axis (axis 0) silently corrupts data on TPU v5e (jax 0.9.0).

Positive dynamic shifts on axis 0, and both signs on axis 1, are exact.
videoquery works around it by always rolling by the positive complement
(size - shift); see kernels/tvl1_pallas.py.

Run on a TPU: python tools/mosaic_roll_repro.py
Expected output (buggy): axis=0 neg-shift max err ~1.0, all others 0.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 80, 256


def make_kernel(axis, negate):
    def k(x_ref, s_ref, o_ref):
        s = s_ref[0]
        o_ref[0] = pltpu.roll(x_ref[0], -s if negate else s, axis)

    return k


def main():
    x = jnp.asarray(np.random.default_rng(0).random((1, H, W)), jnp.float32)
    spec = pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
    for axis in (0, 1):
        for negate in (True, False):
            errs = []
            for s in (1, 5, 8):
                out = pl.pallas_call(
                    make_kernel(axis, negate), grid=(1,),
                    in_specs=[spec, sspec], out_specs=spec,
                    out_shape=jax.ShapeDtypeStruct((1, H, W), jnp.float32),
                )(x, jnp.asarray([s], jnp.int32))
                want = np.roll(np.asarray(x[0]), -s if negate else s, axis)
                errs.append(float(np.abs(np.asarray(out[0]) - want).max()))
            sign = "neg" if negate else "pos"
            print(f"axis={axis} {sign}-shift: max errs {errs}")


if __name__ == "__main__":
    main()
