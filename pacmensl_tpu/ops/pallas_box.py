"""Pallas TPU kernel for the dense-box CME operator action (the hot loop).

Single-pass fusion of the stencil part of the truncated-generator matvec

    (A(t) p)_x = sum_r c_r(t) [ a_r(x - s_r) p(x - s_r) - a_r(x) p(x) ]

(reference hot loop ``FspMatrixBase::Action``, src/Matrix/FspMatrixBase.cpp:
36-62).  The XLA stencil path (:mod:`box_operator`) materializes one
shifted copy of ``a_r * p`` per reaction (~3 HBM touches of an n-sized
buffer per reaction); this kernel holds the box in VMEM and touches HBM
exactly three times total — read ``p``, read the validity mask, write
``dp`` — the bandwidth floor for a mask-carrying operator.  Sink
derivatives are computed outside as one fused ``[1,n] x [n,n_c]`` matmul
(see ``BoxOperator.action``), which reads ``p`` once more.

Design notes (per /opt/skills/guides/pallas_guide.md):

* The N-d box is flattened C-order and viewed as ``[rows, 128]`` — lanes
  are always full, so no tile-padding waste regardless of box extents.
* An N-d stencil shift ``x -> x - s`` is a **flat** shift by
  ``k = sum_d s_d * stride_d``, decomposed into a lane rotate by
  ``k mod 128`` plus two row rotates (``k // 128`` and ``k // 128 + 1``)
  selected per lane — a carry-aware circular shift built entirely from
  ``pltpu.roll``.  Wrap artifacts are zeroed with per-axis coordinate
  masks (the mixed-radix carry positions are exactly the out-of-box
  sources).
* Propensities are **recomputed in-registers** from broadcasted-iota
  coordinates (zero HBM traffic), by ``jax.vmap``-ing the user's batched
  ``propensity(states[n, S], r)`` over the row axis so its internals are
  2-D ``[rows, 128]`` ops — Mosaic-friendly shapes.
* Time coefficients arrive via SMEM so one compiled kernel serves every
  expansion epoch at a fixed capacity, like the XLA path.

Boxes larger than the single-block VMEM budget run a **grid-tiled**
variant: the row space is cut into tiles of ``T`` rows and each grid step
sees three neighbor blocks (prev/cur/next, standard halo-block pattern) so
any stencil shift with ``|k| <= T*128`` resolves inside the concatenated
window.  Edge clamping (prev of block 0 / next of the last block repeat the
edge block) leaves *real data at wrong window positions* in those regions;
it is only ever read by middle-slice outputs whose N-d flat source lies
outside ``[0, n)``, and the per-axis source-validity masks zero exactly
those outputs — the same argument that handles the single-block rolls'
mixed-radix carry wrap.  Sink contributions accumulate
across sequential grid steps into an SMEM output block with a constant
index map (TPU revisiting semantics).  Only operators whose maximum flat
shift exceeds the tile budget (huge minor-axes product) fall back to the
XLA stencil path (`BoxOperator` handles selection).
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def is_tpu_device() -> bool:
    """True when the default JAX device is a TPU chip.

    Robust to experimental platform plugins (a tunneled chip may register
    under a plugin platform name while ``device_kind`` still reads
    "TPU v5 lite"): accept either the platform string or the kind.
    """
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return d.platform == "tpu" or "tpu" in str(d.device_kind).lower()


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


#: Box-size budget (bytes of one box-sized f32 buffer) below which the
#: kernel runs as a single block (whole box in VMEM — cheapest: each
#: propensity is evaluated exactly once, no halo duplication).  The kernel
#: keeps ~10 such buffers live (p, mask, inflow, outflow, propensity,
#: shift temps, coordinate fields), and v5e VMEM is 128 MB, so
#: 8 MB/buffer is conservative.
VMEM_BUDGET = int(os.environ.get("PACMENSL_PALLAS_VMEM_BUDGET",
                                 str(8 * 1024 * 1024)))

#: Tile size (rows of 128 lanes) for the grid-tiled variant.
TILE_ROWS = int(os.environ.get("PACMENSL_PALLAS_TILE_ROWS", "1024"))

#: Largest tile the VMEM budget supports (the tiled kernel holds ~15
#: window-sized [3T, 128] buffers between pipeline slots, the cat window,
#: coordinate fields, and per-reaction temps).
MAX_TILE_ROWS = int(os.environ.get("PACMENSL_PALLAS_MAX_TILE_ROWS", "4096"))


def max_flat_shift(stoichiometry, shape, enable_reactions) -> int:
    """Largest |flat shift| any enabled reaction induces on the C-order
    flattened box."""
    stoich = np.atleast_2d(np.asarray(stoichiometry, np.int64))
    strides = [_prod(shape[d + 1:]) for d in range(len(shape))]
    return max((abs(int(sum(int(stoich[r][d]) * strides[d]
                            for d in range(len(shape))))))
               for r in enable_reactions) if len(enable_reactions) else 0


def fits_vmem(shape: Tuple[int, ...], dtype, n_reactions: int,
              stoichiometry=None, enable_reactions=None) -> bool:
    """Kernel eligibility: either the whole box fits the single-block
    budget, or every stencil shift fits inside the largest tile window."""
    if _prod(shape) * jnp.dtype(dtype).itemsize <= VMEM_BUDGET:
        return True
    if stoichiometry is None:
        return False
    reactions = (list(range(n_reactions)) if enable_reactions is None
                 else list(enable_reactions))
    k_max = max_flat_shift(stoichiometry, shape, reactions)
    return -(-k_max // LANES) + 1 <= MAX_TILE_ROWS


class CoordStates:
    """Duck-typed ``states[n, S]`` view backed by per-species 2-D fields.

    Inside the kernel, materializing a real ``[rows, 128, S]`` coordinate
    array would tile-pad the minor S axis to 128 lanes (a ~128/S VMEM
    blowup); this adapter hands the user's batched propensity its columns
    as clean ``[rows, 128]`` arrays instead.  Propensities that only use
    column indexing (``x[:, i]``), elementwise math, and ``*_like``
    constructors trace through unchanged; anything else raises at kernel
    build time and the operator falls back to the XLA stencil path.
    """

    def __init__(self, cols):
        self._cols = list(cols)

    @property
    def dtype(self):
        return self._cols[0].dtype

    def astype(self, dt):
        return CoordStates([c.astype(dt) for c in self._cols])

    def __getitem__(self, key):
        if (isinstance(key, tuple) and len(key) == 2
                and isinstance(key[0], slice)
                and key[0] == slice(None)
                and isinstance(key[1], int)):
            return self._cols[key[1]]
        raise TypeError(
            f"CoordStates supports only x[:, i] column access, got {key!r}")

    def __len__(self):
        raise TypeError("CoordStates has no static length; use x[:, i]")


class PallasBoxKernel:
    """Fused single-pass stencil kernel: ``(c, p_box, mask_box) -> dp_box``.

    ``c: [R]`` time coefficients indexed by enabled reaction, arrays in the
    operator dtype.  Sinks are NOT computed here (see module docstring).
    """

    def __init__(self,
                 propensity: Callable,
                 stoichiometry: np.ndarray,
                 shape: Tuple[int, ...],
                 enable_reactions: Sequence[int],
                 dtype=jnp.float32,
                 components: Optional[Sequence[Callable]] = None,
                 interpret: Optional[bool] = None):
        self.shape = tuple(int(s) for s in shape)
        self.dtype = dtype
        self.reactions = tuple(int(r) for r in enable_reactions)
        self.stoich = np.atleast_2d(np.asarray(stoichiometry, np.int64))
        self.propensity = propensity
        # per-constraint score callables: when present, sink derivatives
        # are reduced in-kernel at VPU speed (a TPU gather over the sink
        # shell costs ~6 ns/element; dense VMEM-resident masked reductions
        # are far cheaper)
        self.components = tuple(components) if components else None
        if interpret is None:
            interpret = not is_tpu_device()
        self.interpret = bool(interpret)

        self.n = _prod(self.shape)
        self.rows = -(-self.n // LANES)           # ceil
        # C-order strides over the full box (coordinate reconstruction)
        nd = len(self.shape)
        self.strides = [
            _prod(self.shape[d + 1:]) for d in range(nd)]
        # --- tiling decision -------------------------------------------
        single_rows = VMEM_BUDGET // (LANES * jnp.dtype(dtype).itemsize)
        if self.rows <= single_rows:
            self.tile_rows = self.rows            # single block, no halo
            self.grid = 1
        else:
            k_max = max_flat_shift(self.stoich, self.shape, self.reactions)
            halo = -(-k_max // LANES) + 1
            self.tile_rows = min(max(TILE_ROWS, halo), MAX_TILE_ROWS)
            if halo > self.tile_rows:
                raise ValueError(
                    f"stencil halo {halo} rows exceeds the tile budget "
                    f"{self.tile_rows} (minor-axes product too large for "
                    "the tiled kernel)")
            self.grid = -(-self.rows // self.tile_rows)
        self.n_pad = self.grid * self.tile_rows * LANES
        self._call = jax.jit(self._build())

    # ------------------------------------------------------------ pieces
    def _coords(self, nrows: int, base_row=0):
        """Per-species coordinate fields [nrows, 128] int32, from the flat
        index ``idx = (base_row + row) * 128 + lane``.  ``base_row`` may be
        a traced int (tiled mode).  NOTE: negative flat indices (rows before
        the array start) wrap via floor-div/mod into *in-range-looking*
        coordinates, so window regions outside ``[0, n)`` hold plausible
        garbage.  Correctness invariant: such regions are only ever read by
        middle-slice outputs whose flat source is out-of-box, which the
        per-axis source-validity masks zero; only middle-slice values
        (``coords_m`` / ``ap_m``) may feed sinks or unmasked terms."""
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
        idx = (row_iota + base_row) * LANES + lane_iota
        coords = []
        for d, sd in enumerate(self.strides):
            c = idx // sd if sd > 1 else idx
            coords.append(c % self.shape[d])
        return coords, lane_iota

    def _roll(self, a, shift, axis):
        if shift % a.shape[axis] == 0:
            return a
        if self.interpret:
            return jnp.roll(a, shift, axis)
        return pltpu.roll(a, shift % a.shape[axis], axis)

    def _flat_shift(self, a2, lane_iota, k: int):
        """Circular flat shift: out[flat] = a[flat - k] on the [rows, 128]
        view (carry-aware: lane rotate + per-lane choice of two row
        rotates)."""
        if k == 0:
            return a2
        k1, k2 = k // LANES, k % LANES            # floor div: 0 <= k2 < 128
        b = self._roll(a2, k2, axis=1)
        lo = self._roll(b, k1, axis=0)            # lanes >= k2
        hi = self._roll(b, k1 + 1, axis=0)        # lanes <  k2 (carry)
        if k2 == 0:
            return lo
        return jnp.where(lane_iota >= k2, lo, hi)

    # ------------------------------------------------------------- build
    def _compute(self, c_ref, bounds_ref, p_w, mask_w, coords_w,
                 lane_iota, mid0: int, t_out: int):
        """Shared core: from window arrays ``p_w``/``mask_w`` [W, 128] and
        their coordinate fields, produce the middle-slice derivative
        ``acc`` [t_out, 128] (output rows ``[mid0, mid0 + t_out)`` of the
        window) and the per-constraint sink contributions of those rows."""
        dtype = self.dtype
        nd = len(self.shape)
        comps = self.components
        n_c = len(comps) if comps is not None else 0

        def mid(a):
            return a if (mid0 == 0 and a.shape[0] == t_out) \
                else a[mid0:mid0 + t_out]

        coords_m = [mid(cd) for cd in coords_w]
        mask_m = mid(mask_w)
        x_view = CoordStates([ci.astype(dtype) for ci in coords_w])

        acc = jnp.zeros((t_out, LANES), dtype)
        sink_acc = [jnp.zeros((), dtype) for _ in range(n_c)]
        for k, r in enumerate(self.reactions):
            c_r = c_ref[0, k]
            a_r = jnp.asarray(self.propensity(x_view, r)).astype(dtype)
            # where() (not multiply) so inf/nan propensities at padded or
            # clamped-garbage coordinates never reach the accumulators
            ap = jnp.where(mask_w > 0, a_r * p_w, jnp.zeros((), dtype))
            s = self.stoich[r]
            kk = int(sum(int(s[d]) * self.strides[d] for d in range(nd)))
            inflow = mid(self._flat_shift(ap, lane_iota, kk))
            valid = None
            for d in range(nd):
                sd = int(s[d])
                if sd == 0:
                    continue
                src = coords_m[d] - sd
                ok = (src >= 0) & (src < self.shape[d])
                valid = ok if valid is None else (valid & ok)
            if valid is not None:
                inflow = jnp.where(valid, inflow, jnp.zeros((), dtype))
            ap_m = mid(ap)
            acc = acc + c_r * (inflow * mask_m - ap_m)
            if comps is not None:
                # sinks: mass flowing to targets x + s_r that violate
                # constraint cc, one dense masked reduction each
                # (reference FspMatrixConstrained sink semantics incl.
                # multi-counting across violated constraints)
                tgt_view = CoordStates(
                    [coords_m[d].astype(dtype) + float(s[d])
                     for d in range(nd)])
                for cc in range(n_c):
                    v = jnp.asarray(comps[cc](tgt_view)).astype(dtype)
                    viol = v > bounds_ref[0, cc].astype(dtype)
                    sink_acc[cc] = sink_acc[cc] + c_r * jnp.sum(
                        jnp.where(viol, ap_m, jnp.zeros((), dtype)))
        return acc, sink_acc

    def _build(self):
        dtype = self.dtype
        R = len(self.reactions)
        comps = self.components
        n_c = len(comps) if comps is not None else 0
        T, grid = self.tile_rows, self.grid
        rows_pad = T * grid

        if grid == 1:
            def kernel_entry(c_ref, bounds_ref, p_ref, mask_ref,
                             dp_ref, dsinks_ref):
                coords, lane_iota = self._coords(T)
                acc, sink_acc = self._compute(
                    c_ref, bounds_ref, p_ref[:], mask_ref[:],
                    coords, lane_iota, 0, T)
                dp_ref[:] = acc
                for cc in range(n_c):
                    dsinks_ref[0, cc] = sink_acc[cc]
                if n_c == 0:
                    dsinks_ref[0, 0] = jnp.zeros((), dtype)

            grid_kw = {}
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),   # c  (1, R)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # bounds (1, n_c)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # p  (rows, 128)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            ]
            out_specs = (
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            )
        else:
            def kernel_entry(c_ref, bounds_ref, p_pv, p_cu, p_nx,
                             m_pv, m_cu, m_nx, dp_ref, dsinks_ref):
                pid = pl.program_id(0)
                p_w = jnp.concatenate([p_pv[:], p_cu[:], p_nx[:]], axis=0)
                mask_w = jnp.concatenate([m_pv[:], m_cu[:], m_nx[:]],
                                         axis=0)
                coords, lane_iota = self._coords(3 * T, (pid - 1) * T)
                acc, sink_acc = self._compute(
                    c_ref, bounds_ref, p_w, mask_w, coords, lane_iota,
                    T, T)
                dp_ref[:] = acc

                @pl.when(pid == 0)
                def _init():
                    for cc in range(max(n_c, 1)):
                        dsinks_ref[0, cc] = jnp.zeros((), dtype)

                for cc in range(n_c):
                    dsinks_ref[0, cc] = dsinks_ref[0, cc] + sink_acc[cc]

            prev = lambda i: (jnp.maximum(i - 1, 0), 0)
            cur = lambda i: (i, 0)
            nxt = lambda i: (jnp.minimum(i + 1, grid - 1), 0)
            blk = (T, LANES)
            grid_kw = {"grid": (grid,)}
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),   # c  (1, R)
                pl.BlockSpec(memory_space=pltpu.SMEM),   # bounds (1, n_c)
                pl.BlockSpec(blk, prev, memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, cur, memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, nxt, memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, prev, memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, cur, memory_space=pltpu.VMEM),
                pl.BlockSpec(blk, nxt, memory_space=pltpu.VMEM),
            ]
            out_specs = (
                pl.BlockSpec(blk, cur, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, max(n_c, 1)), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            )

        out_shape = (
            jax.ShapeDtypeStruct((rows_pad, LANES), dtype),
            jax.ShapeDtypeStruct((1, max(n_c, 1)), dtype),
        )
        itemsize = jnp.dtype(dtype).itemsize
        cost = pl.CostEstimate(
            flops=2 * (2 * R + 1 + R * n_c) * rows_pad * LANES,
            bytes_accessed=(3 if grid == 1 else 7) * rows_pad * LANES
            * itemsize,
            transcendentals=R * rows_pad * LANES * (1 if grid == 1 else 3))

        call = pl.pallas_call(
            kernel_entry,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            cost_estimate=cost,
            # the unrolled reaction loop keeps ~10 window-sized buffers
            # live; the default 16 MB scoped limit under-serves v5e's
            # 128 MB VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self.interpret,
            **grid_kw,
        )

        n, n_pad = self.n, self.n_pad

        def pad2(x):
            flat = x.reshape(n)
            if n_pad != n:
                flat = jnp.pad(flat, (0, n_pad - n))
            return flat.reshape(rows_pad, LANES)

        def fn(c, bounds, p_box, mask_box):
            c2 = jnp.asarray(c, dtype).reshape(1, R)
            b2 = jnp.asarray(bounds, jnp.int32).reshape(1, -1) \
                if n_c else jnp.zeros((1, 1), jnp.int32)
            p2 = pad2(p_box.astype(dtype))
            m2 = pad2(mask_box.astype(dtype))
            if grid == 1:
                dp2, dsinks = call(c2, b2, p2, m2)
            else:
                # one operand per declared BlockSpec: the prev/cur/next
                # views are the SAME padded array read through three
                # different block index maps
                dp2, dsinks = call(c2, b2, p2, p2, p2, m2, m2, m2)
            dp = dp2.reshape(n_pad)[:n].reshape(self.shape)
            return dp, (dsinks.reshape(-1) if n_c else None)

        return fn

    @property
    def has_sinks(self) -> bool:
        return self.components is not None

    def __call__(self, c, bounds, p_box, mask_box):
        return self._call(c, bounds, p_box, mask_box)
