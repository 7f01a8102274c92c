"""Measure achievable HBM bandwidth on the bench device three ways:
XLA elementwise stream, bare Pallas grid copy at the kernel's tile shape,
and the kernel's own XLA-side pad/halo assembly. Localizes the gap between
the fused kernel's 272 us/matvec and the traffic model's floor."""
import os
import sys
import time

os.environ.setdefault("PACMENSL_TPU_X64", "0")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(f, lo, hi, *args):
    f(lo, *args).block_until_ready()
    f(hi, *args).block_until_ready()
    best = None
    for _ in range(5):
        t0 = time.perf_counter(); f(lo, *args).block_until_ready()
        t1 = time.perf_counter(); f(hi, *args).block_until_ready()
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / (hi - lo)
        best = d if best is None else min(best, d)
    return best


def main():
    log(f"device: {jax.devices()[0]}")
    T, H, G, L = 4096, 160, 6, 128
    rows = G * T
    n = rows * L                       # 3.1M elems, 12.6 MB f32
    x = jnp.arange(n, dtype=jnp.float32).reshape(rows, L) * 1e-6
    nbytes = n * 4

    # 1) XLA stream: read+write one array per iteration
    def stream(k, v):
        return lax.fori_loop(0, k, lambda i, a: a * 1.0000001, v).sum()
    f = jax.jit(stream, static_argnums=0)
    dt = slope(f, 512, 2048, x)
    log(f"XLA stream      : {dt*1e6:8.1f} us/iter -> {2*nbytes/dt/1e9:7.1f} GB/s")

    # 2) bare pallas copy, same grid/tile as the box kernel
    def copy_kernel(p_ref, o_ref):
        o_ref[:] = p_ref[:] * 1.0000001

    blk = pl.BlockSpec((T, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    copy = pl.pallas_call(
        copy_kernel, grid=(G,), in_specs=[blk], out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32))

    def ploop(k, v):
        return lax.fori_loop(0, k, lambda i, a: copy(a), v).sum()
    f2 = jax.jit(ploop, static_argnums=0)
    dt2 = slope(f2, 512, 2048, x)
    log(f"pallas grid copy: {dt2*1e6:8.1f} us/iter -> {2*nbytes/dt2/1e9:7.1f} GB/s")

    # 3) pallas copy with halo blocks (window concat, same DMA pattern as
    #    the box kernel, zero compute)
    def win_kernel(c_ref, p_cu, p_pv, p_nx, o_ref):
        w = jnp.concatenate([p_pv[:], p_cu[:], p_nx[:]], axis=0)
        o_ref[:] = w[H:H + T] * c_ref[0, 0]

    blkH = pl.BlockSpec((H, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    win = pl.pallas_call(
        win_kernel, grid=(G,), in_specs=[smem, blk, blkH, blkH],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32))

    hv = jnp.zeros((G * H, L), jnp.float32)
    c = jnp.ones((1, 1), jnp.float32)

    def wloop(k, v):
        return lax.fori_loop(0, k, lambda i, a: win(c, a, hv, hv), v).sum()
    f3 = jax.jit(wloop, static_argnums=0)
    dt3 = slope(f3, 512, 2048, x)
    log(f"pallas win copy : {dt3*1e6:8.1f} us/iter -> {2*nbytes/dt3/1e9:7.1f} GB/s")

    # 4) roll cost: same window copy plus 6 reactions x (1 lane roll +
    #    2 row rolls + select) on the full window — the base machinery
    def roll_kernel(c_ref, p_cu, p_pv, p_nx, o_ref):
        w = jnp.concatenate([p_pv[:], p_cu[:], p_nx[:]], axis=0)
        lane_iota = lax.broadcasted_iota(jnp.int32, (T + 2 * H, L), 1)
        acc = jnp.zeros((T, L), jnp.float32)
        for k, k1, k2 in ((19881, 155, 41), (141, 1, 13), (1, 0, 1),
                          (-19881, -156, 87), (-141, -2, 115), (-1, -1, 127)):
            b = pltpu.roll(w, k2 % L, 1)
            lo = pltpu.roll(b, k1 % w.shape[0], 0)
            hi = pltpu.roll(b, (k1 + 1) % w.shape[0], 0)
            sh = jnp.where(lane_iota >= k2, lo, hi)
            acc = acc + c_ref[0, 0] * sh[H:H + T]
        o_ref[:] = acc

    roll = pl.pallas_call(
        roll_kernel, grid=(G,), in_specs=[smem, blk, blkH, blkH],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((rows, L), jnp.float32))

    def rloop(k, v):
        return lax.fori_loop(0, k, lambda i, a: roll(c, a, hv, hv), v).sum()
    f4 = jax.jit(rloop, static_argnums=0)
    dt4 = slope(f4, 128, 512, x)
    log(f"pallas 6x rolls : {dt4*1e6:8.1f} us/iter")

    # 5) XLA-side wrapper cost: pad + halo assembly + unpad, no kernel
    shape = (141, 141, 141)
    nbox = int(np.prod(shape))
    xb = jnp.arange(nbox, dtype=jnp.float32).reshape(shape) * 1e-6
    n_pad = rows * L

    def wrap(k, v):
        def body(i, a):
            flat = a.reshape(nbox)
            flat = jnp.pad(flat, (0, n_pad - nbox))
            a2 = flat.reshape(rows, L)
            a3 = a2.reshape(G, T, L)
            z = jnp.zeros((1, H, L), jnp.float32)
            pv = jnp.concatenate([z, a3[:-1, T - H:, :]], axis=0)
            nx = jnp.concatenate([a3[1:, :H, :], z], axis=0)
            out = (a2 + pv.sum() + nx.sum()).reshape(n_pad)[:nbox]
            return out.reshape(shape) * 0.9999
        return lax.fori_loop(0, k, body, v).sum()
    f5 = jax.jit(wrap, static_argnums=0)
    dt5 = slope(f5, 128, 512, xb)
    log(f"XLA pad+halo    : {dt5*1e6:8.1f} us/iter")


if __name__ == "__main__":
    main()
