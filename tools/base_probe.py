"""Split the fused kernel's fixed per-matvec base cost into:
wrapper (pad/halo/unpad XLA ops), coords (div/mod reconstruction),
and the remaining kernel floor.  Uses the real PallasBoxKernel with
surgical monkeypatches; numbers guide optimization, not correctness."""
import os
import sys
import time

os.environ.setdefault("PACMENSL_TPU_X64", "0")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pacmensl_tpu as pm
from pacmensl_tpu.ops import pallas_box as pb
from pacmensl_tpu.statespace.box_space import BoxStateSpace
from pacmensl_tpu.statespace.constraints import ConstraintSet


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ITERS = int(os.environ.get("ITERS", "160"))


def timeit(name, make_step, x0):
    def chain(k, v):
        return lax.fori_loop(0, k, lambda i, a: make_step(a), v)
    f = jax.jit(chain, static_argnums=0)
    lo, hi = ITERS, 4 * ITERS
    f(lo, x0).block_until_ready()
    f(hi, x0).block_until_ready()
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); f(lo, x0).block_until_ready()
        t1 = time.perf_counter(); f(hi, x0).block_until_ready()
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        best = d if best is None else min(best, d)
    log(f"{name:22s}: {best*1e6:8.1f} us/matvec")
    return best


def main():
    log(f"device: {jax.devices()[0]}")
    b = pm.models.repressilator()
    bounds = np.array([140] * 3, np.int64)
    cs = ConstraintSet(None, bounds, np.full(3, 0.2))
    space = BoxStateSpace(b.model.stoichiometry, cs, b.x0)

    def build(**kw):
        args = dict(propensity=b.model.propensity,
                    stoichiometry=b.model.stoichiometry,
                    shape=space.shape, enable_reactions=range(6),
                    dtype=jnp.float32,
                    components=tuple(b.constraint.components)[:3],
                    synth_mask=True)
        args.update(kw)
        return pb.PallasBoxKernel(**args)

    kern = build()
    c = jnp.ones((6,), jnp.float32)
    bnd = jnp.asarray(space.bounds, jnp.int32)
    key = jax.random.PRNGKey(0)
    p = jax.random.uniform(key, space.shape, jnp.float32)
    mask = space.mask.astype(jnp.float32)

    # 1) production path (fn wrapper: box in, box out)
    timeit("full (box wrapper)", lambda a: kern._call(c, bnd, a, mask)[0], p)

    # 2) padded path: feed [rows_pad, 128] directly, skip pad/unpad.
    #    Rebuild fn but wrap to keep a fixed-point signature.
    inner = kern._build.__wrapped__ if hasattr(kern._build, "__wrapped__") \
        else None
    rows_pad = kern.grid * kern.tile_rows

    # Reconstruct the inner pallas call chain on padded input by calling
    # fn with a pre-padded box reshaped back — measures wrapper delta
    # indirectly instead: time pad/unpad alone.
    n, n_pad = kern.n, kern.n_pad
    shape = kern.shape

    def pad_unpad(a):
        flat = a.reshape(n)
        flat = jnp.pad(flat, (0, n_pad - n))
        a2 = flat.reshape(rows_pad, 128)
        return (a2 * 1.0000001).reshape(n_pad)[:n].reshape(shape)
    timeit("pad+unpad only", pad_unpad, p)

    T, H, G = kern.tile_rows, kern.halo_rows, kern.grid

    def halo_only(a):
        flat = a.reshape(n)
        flat = jnp.pad(flat, (0, n_pad - n))
        a2 = flat.reshape(rows_pad, 128)
        a3 = a2.reshape(G, T, 128)
        z = jnp.zeros((1, H, 128), a.dtype)
        pv = jnp.concatenate([z, a3[:-1, T - H:, :]], axis=0)
        nx = jnp.concatenate([a3[1:, :H, :], z], axis=0)
        s = pv.sum() + nx.sum()
        return (a2 * (1.0 + 1e-12 * s)).reshape(n_pad)[:n].reshape(shape)
    timeit("pad+halo+unpad", halo_only, p)

    # 3) coords cost: patch _coords to constant zeros
    orig_coords = pb.PallasBoxKernel._coords

    def zero_coords(self, nrows, base_row=0):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
        idx = (row_iota + base_row) * 128 + lane_iota
        z = row_iota * 0
        return [z for _ in self.strides], lane_iota, idx
    if os.environ.get("ZERO_COORDS") == "1":   # crashes Mosaic on axon
        pb.PallasBoxKernel._coords = zero_coords
        kz = build()
        timeit("zero-coords kernel", lambda a: kz._call(c, bnd, a, mask)[0], p)
        pb.PallasBoxKernel._coords = orig_coords

    # 4) float-reciprocal coords (candidate optimization)
    def frc_coords(self, nrows, base_row=0):
        # mixed-radix decode with float-reciprocal division: q_d = idx//sd
        # via f32 multiply + correction (exact for idx < 2^24), then each
        # coordinate by subtraction — no integer div/mod ops at all.
        # Out-of-range tail indices decode to x0 >= shape[0] (no wrap),
        # which the synth mask / validity masks reject outright.
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
        idx = (row_iota + base_row) * 128 + lane_iota

        def div(a, sd):
            q = (a.astype(jnp.float32) *
                 np.float32(1.0 / sd)).astype(jnp.int32)
            r = a - q * sd
            q = jnp.where(r < 0, q - 1, q)
            q = jnp.where(r >= sd, q + 1, q)
            return q

        qs = []
        prev = idx
        coords = [None] * len(self.strides)
        q_hi = None
        for d, sd in enumerate(self.strides):
            q = div(idx, sd) if sd > 1 else idx
            coords[d] = q if q_hi is None else q - q_hi * self.shape[d]
            q_hi = q
        return coords, lane_iota, idx
    pb.PallasBoxKernel._coords = frc_coords
    kf = build()
    timeit("frc-coords kernel", lambda a: kf._call(c, bnd, a, mask)[0], p)
    # correctness spot check vs production kernel
    d0 = kern._call(c, bnd, p, mask)[0]
    d1 = kf._call(c, bnd, p, mask)[0]
    err = float(jnp.max(jnp.abs(d0 - d1)))
    log(f"frc-coords max|diff| = {err:.3e}")
    pb.PallasBoxKernel._coords = orig_coords


if __name__ == "__main__":
    main()
