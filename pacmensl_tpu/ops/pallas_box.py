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
variant: the row space is cut into tiles of ``T`` rows, and each grid step
reads its tile plus two *halo-sized* neighbor blocks of ``H`` rows
(``H = ceil(k_max / 128) + 1`` rounded to the sublane quantum), assembled
outside the kernel as ``[grid * H, 128]`` prev/next halo arrays.  Any
stencil shift with ``|k| <= H * 128`` then resolves inside the
``[T + 2H, 128]`` window, and HBM traffic is ``1 + 2H/T`` reads of the box
per operand instead of the 3 reads a full prev/cur/next blocking costs.
Window regions whose flat index falls outside ``[0, n)`` (edge halos hold
zeros; coordinates wrap) are only ever read by middle-slice outputs whose
N-d flat source is out-of-box, which the per-axis source-validity masks
zero — the same argument that handles the single-block rolls' mixed-radix
carry wrap.  Sink contributions accumulate across sequential grid steps
into an SMEM output block with a constant index map (TPU revisiting
semantics).  Only operators whose stencil halo exceeds the tile budget
(huge minor-axes product) fall back to the XLA stencil path
(`BoxOperator` handles selection).

**Synthesized masks** (``synth_mask=True``): when the validity mask is a
pure function of the constraint bounds (BFS reachability prunes nothing —
``BoxStateSpace.mask_is_constraint_only``), the kernel recomputes it
in-register from the per-constraint component callables and the SMEM
bounds instead of reading it from HBM, halving memory traffic.  The
synthesized mask agrees with the stored mask exactly on every window
position that can reach an accumulator (middle-slice positions decode
real coordinates; clamped/padded positions have ``p = 0`` or are zeroed
by the source-validity masks).
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


def is_tpu_device(device=None) -> bool:
    """True when ``device`` (default: the default JAX device) is a TPU.

    Robust to experimental platform plugins (a tunneled chip may register
    under a plugin platform name while ``device_kind`` still reads
    "TPU v5 lite"): accept either the platform string or the kind.
    """
    try:
        d = device if device is not None else jax.devices()[0]
    except Exception:
        return False
    return d.platform == "tpu" or "tpu" in str(d.device_kind).lower()


def mesh_is_tpu(mesh) -> bool:
    """True when every device of the mesh is a TPU (the kernel must compile
    for the MESH devices — a CPU mesh under a TPU default platform, e.g.
    the driver's virtual-device dry run, needs interpret mode)."""
    return all(is_tpu_device(d) for d in np.ravel(mesh.devices))


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

#: Tile size (rows of 128 lanes) for the grid-tiled variant.  Large tiles
#: amortize the halo reads (traffic ~ 1 + 2H/T per operand); the window
#: buffers are [T + 2H, 128], far under VMEM at this size.
TILE_ROWS = int(os.environ.get("PACMENSL_PALLAS_TILE_ROWS", "4096"))

#: Largest tile the VMEM budget supports (the tiled kernel holds ~15
#: window-sized [3T, 128] buffers between pipeline slots, the cat window,
#: coordinate fields, and per-reaction temps).
MAX_TILE_ROWS = int(os.environ.get("PACMENSL_PALLAS_MAX_TILE_ROWS", "4096"))

#: Mosaic scoped-VMEM ceiling handed to the compiler.  v5e carries 128 MB
#: of VMEM; the stock 16 MB (or a conservative 100 MB) limit rejects
#: single-block kernels whose unrolled reaction loop peaks near the
#: physical capacity.
VMEM_LIMIT = int(os.environ.get("PACMENSL_PALLAS_VMEM_LIMIT",
                                str(120 * 1024 * 1024)))


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
    live-set budget, or every stencil shift fits inside the largest tile
    window (the same live-set estimate as the tiling decision — a box
    passing a raw-size test but routed to tiled mode must still clear
    the halo check)."""
    itemsize = jnp.dtype(dtype).itemsize
    live = len(shape) + 12
    rows = -(-_prod(shape) // LANES)
    single_rows = min(VMEM_BUDGET // (LANES * itemsize),
                      int(0.9 * VMEM_LIMIT) // (live * LANES * itemsize))
    if rows <= single_rows:
        return True
    if stoichiometry is None:
        return False
    reactions = (list(range(n_reactions)) if enable_reactions is None
                 else list(enable_reactions))
    k_max = max_flat_shift(stoichiometry, shape, reactions)
    halo = -(-(-(-k_max // LANES) + 1) // 8) * 8
    budget_rows = int(0.9 * VMEM_LIMIT) // (live * LANES * itemsize)
    fit = ((budget_rows - 2 * halo) // 8) * 8
    return halo <= MAX_TILE_ROWS and fit >= halo


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
                 interpret: Optional[bool] = None,
                 synth_mask: bool = False,
                 sink_active: Optional[np.ndarray] = None,
                 global_extent0: Optional[int] = None):
        self.shape = tuple(int(s) for s in shape)
        # Sharded mode (global_extent0 set): ``shape`` is the device-LOCAL
        # axis-0 slab including halo planes; axis-0 coordinates are global
        # = local + origin0 (a traced per-call scalar), the axis-0 source
        # validity tests against the GLOBAL extent, and sink reductions
        # count only rows the device owns ([own_lo, own_hi) globally) so a
        # psum over the mesh recovers the reference's sink semantics
        # without double-counting halo rows.
        self.g0 = int(global_extent0) if global_extent0 is not None \
            else self.shape[0]
        self.sharded = global_extent0 is not None
        self.dtype = dtype
        self.reactions = tuple(int(r) for r in enable_reactions)
        self.stoich = np.atleast_2d(np.asarray(stoichiometry, np.int64))
        self.propensity = propensity
        # per-constraint score callables: when present, sink derivatives
        # are reduced in-kernel at VPU speed (a TPU gather over the sink
        # shell costs ~6 ns/element; dense VMEM-resident masked reductions
        # are far cheaper)
        self.components = tuple(components) if components else None
        # Structural sink sparsity [R_enabled, n_c] bool: combo (r, c)
        # needs in-kernel sink work only if reaction r can increase
        # constraint score c somewhere in the box (reference sink-row
        # sparsity, FspMatrixConstrained.cpp:173-195 — there the empty
        # combos simply assemble zero rows; here they skip VPU work).
        # None = all combos active.
        if sink_active is not None and self.components is not None:
            self.sink_active = np.asarray(sink_active, bool)
        else:
            self.sink_active = (np.ones(
                (len(self.reactions), len(self.components)), bool)
                if self.components is not None else None)
        # synthesize the validity mask from (coords, bounds) in-register
        # instead of reading it from HBM (see module docstring); only
        # meaningful with per-constraint components
        self.synth_mask = bool(synth_mask) and self.components is not None
        if interpret is None:
            interpret = not is_tpu_device()
        self.interpret = bool(interpret)

        self.n = _prod(self.shape)
        self.rows = -(-self.n // LANES)           # ceil
        # C-order strides over the full box (coordinate reconstruction)
        nd = len(self.shape)
        self.strides = [
            _prod(self.shape[d + 1:]) for d in range(nd)]
        # Lane-aligned fast path: when the minor extent is EXACTLY one
        # lane group, the minor coordinate IS the lane index ([1, 128]
        # field, free), every upper coordinate is a pure row function
        # ([rows, 1] fields — decode and all constraint/propensity
        # arithmetic on them costs 1/128th of a full box op, broadcast
        # only on contact with p), and every stencil shift k = 128*m +
        # s_minor resolves as lane-roll(s_minor) + row-roll(m) with NO
        # carry select: a lane-wrapped position's N-d minor source is
        # out of [0, 128) by construction, which the per-axis validity
        # mask zeroes.  (Exactly 128 — for multiples, a lane wrap can
        # land on a VALID interior minor coordinate and the no-carry
        # argument fails.)
        self.aligned = (nd >= 2 and self.shape[-1] == LANES)
        # --- tiling decision -------------------------------------------
        # Peak live VMEM in the single-block kernel scales with the
        # problem: S coordinate fields + p + mask/synth chain + acc +
        # ~8 reaction/shift temps.  hog1p (S=5, R=9, 7 constraints)
        # measured 127.09M scoped VMEM at 10 assumed buffers — the
        # eligibility row cap now uses the live-set estimate directly.
        live = len(self.shape) + 12
        single_rows = min(
            VMEM_BUDGET // (LANES * jnp.dtype(dtype).itemsize),
            int(0.9 * VMEM_LIMIT) // (live * LANES *
                                      jnp.dtype(dtype).itemsize))
        if self.rows <= single_rows:
            self.tile_rows = self.rows            # single block, no halo
            self.grid = 1
            self.halo_rows = 0
        else:
            k_max = max_flat_shift(self.stoich, self.shape, self.reactions)
            halo = -(-k_max // LANES) + 1
            halo = -(-halo // 8) * 8              # sublane quantum (f32)
            self.tile_rows = min(max(TILE_ROWS, halo), MAX_TILE_ROWS)
            # The tiled kernel's live set is ~`live` window-sized
            # [T + 2H, 128] buffers; at hog1p's largest rungs the
            # default T=4096 with H~3800 sits within a few MB of the
            # VMEM ceiling (a single extra live buffer faulted the
            # device).  Shrink T so the estimated live set fits the
            # budget with margin; if even T = H cannot fit, the shape is
            # kernel-infeasible and the caller (fits_vmem / solver
            # routing) must take the compressed backend instead.
            budget_rows = int(0.9 * VMEM_LIMIT) // (
                live * LANES * jnp.dtype(dtype).itemsize)
            fit = ((budget_rows - 2 * halo) // 8) * 8
            if fit >= halo:
                self.tile_rows = min(self.tile_rows, max(fit, 8))
            if halo > self.tile_rows or fit < halo:
                raise ValueError(
                    f"stencil halo {halo} rows exceeds the tile budget "
                    f"(T={self.tile_rows}, VMEM-fit {fit}; minor-axes "
                    "product too large for the tiled kernel)")
            self.grid = -(-self.rows // self.tile_rows)
            self.halo_rows = halo
        self.n_pad = self.grid * self.tile_rows * LANES
        self._fn = self._build()
        self._call = jax.jit(self._fn)
        self._call_padded = jax.jit(self._fn.padded)

    # ------------------------------------------------------------ pieces
    def _coords(self, nrows: int, base_row=0):
        """Per-species coordinate fields [nrows, 128] int32, from the flat
        index ``idx = (base_row + row) * 128 + lane``.  ``base_row`` may be
        a traced int (tiled mode).

        Mixed-radix decode WITHOUT integer div/mod (slow multi-op
        sequences on the VPU): each quotient ``q_d = idx // stride_d`` is
        an f32 reciprocal multiply with a +-1 floor correction (exact for
        |idx| < 2^23, enforced at kernel build), and each coordinate is
        then one mul+sub: ``x_d = q_d - q_{d-1} * shape[d]``.  The leading
        coordinate is NOT wrapped: out-of-range window positions (halo
        clamps, padded tail) decode to x0 < 0 or x0 >= shape[0], which the
        synthesized mask / axis-0 validity tests reject outright — middle
        positions always decode exactly.  Lower coordinates still hold
        plausible garbage at such positions; the correctness invariant is
        that any window value whose N-d source is out-of-box is zeroed by
        the per-axis source-validity masks before it can reach an
        accumulator, and only middle-slice values (``coords_m`` /
        ``ap_m``) may feed sinks or unmasked terms."""
        if self.aligned:
            return self._coords_aligned(nrows, base_row)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (nrows, LANES), 1)
        idx = (row_iota + base_row) * LANES + lane_iota

        # f32 reciprocal division is exact (after the +-1 correction) only
        # while |idx| < 2^23; huge boxes fall back to integer division.
        exact = (self.n_pad + (self.halo_rows + 1) * LANES) < (1 << 23)

        def fdiv(a, sd):
            if not exact:
                return a // sd
            q = (a.astype(jnp.float32) *
                 np.float32(1.0 / sd)).astype(jnp.int32)
            r = a - q * sd
            q = jnp.where(r < 0, q - 1, q)
            q = jnp.where(r >= sd, q + 1, q)
            return q

        coords = []
        q_hi = None
        for d, sd in enumerate(self.strides):
            q = fdiv(idx, sd) if sd > 1 else idx
            coords.append(q if q_hi is None
                          else q - q_hi * self.shape[d])
            q_hi = q
        return coords, lane_iota, idx

    def _coords_aligned(self, nrows: int, base_row=0):
        """Aligned-mode coordinate fields: minor = lane index [1, LANES],
        upper coordinates = mixed-radix decode of the ROW index carried
        as [nrows, 1] columns (row values are tiny, so the f32
        reciprocal-divide is always exact here).  Returns
        ``(coords, lane_field, row_start_idx)`` where ``row_start_idx``
        [nrows, 1] is ``row * LANES`` — rows are whole-box-aligned
        (n % LANES == 0), so the padded-tail test only needs the row."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        rvec = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0) + base_row
        rstrides = [sd // LANES for sd in self.strides[:-1]]

        def fdiv(a, sd):
            q = (a.astype(jnp.float32) *
                 np.float32(1.0 / sd)).astype(jnp.int32)
            r = a - q * sd
            q = jnp.where(r < 0, q - 1, q)
            q = jnp.where(r >= sd, q + 1, q)
            return q

        coords = []
        q_hi = None
        for d, sd in enumerate(rstrides):
            q = fdiv(rvec, sd) if sd > 1 else rvec
            coords.append(q if q_hi is None
                          else q - q_hi * self.shape[d])
            q_hi = q
        coords.append(lane)
        return coords, lane, rvec * LANES

    def _flat_shift_aligned(self, a2, s_minor: int, k: int):
        """Aligned-mode flat shift: k = LANES*m + s_minor with every
        upper stride a multiple of LANES, so the shift is lane-roll +
        row-roll with no carry select (wrapped lanes carry garbage whose
        N-d minor source is out of range — zeroed by the validity
        mask)."""
        if k == 0:
            return a2
        m = (k - s_minor) // LANES
        b = self._roll(a2, s_minor % LANES, axis=1) if s_minor % LANES \
            else a2
        return self._roll(b, m, axis=0)

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
    def _compute(self, c_ref, bounds_ref, meta_ref, p_w, mask_w, coords_w,
                 lane_iota, idx_w, mid0: int, t_out: int):
        """Shared core: from window arrays ``p_w``/``mask_w`` [W, 128] and
        their coordinate fields, produce the middle-slice derivative
        ``acc`` [t_out, 128] (output rows ``[mid0, mid0 + t_out)`` of the
        window) and the per-constraint sink contributions of those rows.

        ``mask_w`` may be None (synth-mask mode): the validity mask is
        then recomputed in-register as "every constraint component
        satisfies its SMEM bound" — exact wherever it matters (middle
        coordinates are real; clamped/padded window positions carry
        ``p = 0`` or feed only source-validity-masked outputs)."""
        dtype = self.dtype
        nd = len(self.shape)
        comps = self.components
        n_c = len(comps) if comps is not None else 0

        def mid(a):
            if a.shape[0] == 1:       # row-invariant broadcast field
                return a
            return a if (mid0 == 0 and a.shape[0] == t_out) \
                else a[mid0:mid0 + t_out]

        # Global coordinates: in sharded mode axis 0 is offset by the
        # device's origin (meta[0,0]); everything semantic — propensities,
        # constraints, source validity, sinks — sees GLOBAL coordinates,
        # while the flat-shift layout machinery stays local.
        if self.sharded:
            gcoords_w = [coords_w[0] + meta_ref[0, 0]] + list(coords_w[1:])
        else:
            gcoords_w = list(coords_w)
        coords_m = [mid(cd) for cd in gcoords_w]
        # Constraint components evaluate on int32 coordinates (no float
        # casts): constraint values are integers by contract — the generic
        # ConstraintSet path already hands comps int state arrays, and the
        # reference's fsp_constr_multi_fn returns int arrays
        # (StateSetConstrained.h:35-68) — so int compare against the SMEM
        # int bounds is exact and saves R*n_c casts per matvec.
        x_int = CoordStates(gcoords_w)

        if mask_w is None:
            mask_b = None
            for cc in range(n_c):
                v = jnp.asarray(comps[cc](x_int))
                okc = v <= bounds_ref[0, cc]
                mask_b = okc if mask_b is None else (mask_b & okc)
            if self.sharded:
                # halo planes beyond the global box decode negative /
                # overflowing axis-0 coordinates; they carry p = 0 (edge
                # ppermute zeros) but must not satisfy the synthesized mask
                mask_b = mask_b & (gcoords_w[0] >= 0) \
                    & (gcoords_w[0] < self.g0)
        else:
            mask_b = mask_w > 0
        mask_m = mid(mask_b)
        if self.sharded:
            own_m = (coords_m[0] >= meta_ref[0, 1]) \
                & (coords_m[0] < meta_ref[0, 2])
        else:
            own_m = None

        # NOTE a hoisted pre-masked p (one persistent window-sized VMEM
        # buffer saving one select per reaction) was tried and reverted:
        # hog1p's largest rungs run the tiled kernel within a few MB of
        # the VMEM ceiling, and the extra live buffer faulted the device
        # (round-5, t>170 rung).  The per-reaction where() stays.
        x_prop = CoordStates([ci.astype(dtype) for ci in gcoords_w])

        acc = jnp.zeros((t_out, LANES), dtype)
        # Per-constraint sink partials stay [1, LANES] (sublane-reduced
        # per combo, lane-reduced ONCE per constraint at the end): the
        # direct [T,128] -> scalar jnp.sum per (reaction, constraint)
        # combo measured ~18 us/combo on v5e — the cross-lane reduction
        # dominates — vs ~2 n-ops for the two-stage form.
        sink_acc = [jnp.zeros((1, LANES), dtype) for _ in range(n_c)]
        for k, r in enumerate(self.reactions):
            c_r = c_ref[0, k]
            a_r = jnp.asarray(self.propensity(x_prop, r)).astype(dtype)
            # where() (not multiply) so inf/nan propensities at padded or
            # clamped-garbage coordinates never reach the accumulators
            ap = jnp.where(mask_b, a_r * p_w, jnp.zeros((), dtype))
            s = self.stoich[r]
            kk = int(sum(int(s[d]) * self.strides[d] for d in range(nd)))
            if self.aligned:
                shifted = self._flat_shift_aligned(ap, int(s[-1]), kk)
            else:
                shifted = self._flat_shift(ap, lane_iota, kk)
            inflow = mid(shifted)
            valid = mask_m
            for d in range(nd):
                sd = int(s[d])
                if sd == 0:
                    continue
                src = coords_m[d] - sd
                # one-sided test: for sd > 0, src = x_d - sd < hi always
                # (x_d <= hi - 1); for sd < 0, src = x_d + |sd| >= 0 always
                if sd > 0:
                    ok = src >= 0
                else:
                    hi = self.g0 if d == 0 else self.shape[d]
                    ok = src < hi
                valid = valid & ok
            inflow = jnp.where(valid, inflow, jnp.zeros((), dtype))
            ap_m = mid(ap)
            acc = acc + c_r * (inflow - ap_m)
            # sinks credit the device OWNING the source row (halo copies
            # of the same row exist on neighbors; psum must not double
            # count them)
            ap_s = ap_m if own_m is None else \
                jnp.where(own_m, ap_m, jnp.zeros((), dtype))
            if comps is not None and self.sink_active[k].any():
                # sinks: mass flowing to targets x + s_r that violate
                # constraint cc, one dense masked reduction each
                # (reference FspMatrixConstrained sink semantics incl.
                # multi-counting across violated constraints); combos the
                # reaction cannot violate are skipped entirely
                tgt_view = CoordStates(
                    [coords_m[d] + int(s[d]) for d in range(nd)])
                for cc in range(n_c):
                    if not self.sink_active[k, cc]:
                        continue
                    v = jnp.asarray(comps[cc](tgt_view))
                    viol = v > bounds_ref[0, cc]
                    sink_acc[cc] = sink_acc[cc] + c_r * jnp.sum(
                        jnp.where(viol, ap_s, jnp.zeros((), dtype)),
                        axis=0, keepdims=True)
        # Zero the padded tail rows so the raw padded output is exactly 0
        # beyond the box — required by the padded-layout fast path (the
        # integrators carry [rows_pad, 128] vectors whose tail must stay
        # zero for norms/dots) and harmless otherwise.
        acc = jnp.where(mid(idx_w) < self.n, acc, jnp.zeros((), dtype))
        # lane-reduce the [1, LANES] sink partials to scalars, once per
        # constraint (not once per combo)
        return acc, [jnp.sum(sink_acc[cc]) for cc in range(n_c)]

    def _build(self):
        dtype = self.dtype
        R = len(self.reactions)
        comps = self.components
        n_c = len(comps) if comps is not None else 0
        T, grid, H = self.tile_rows, self.grid, self.halo_rows
        rows_pad = T * grid
        synth = self.synth_mask
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

        if grid == 1:
            def kernel_entry(*refs):
                c_ref, bounds_ref, meta_ref = refs[0], refs[1], refs[2]
                p_ref = refs[3]
                mask_ref = None if synth else refs[4]
                dp_ref, dsinks_ref = refs[-2], refs[-1]
                coords, lane_iota, idx = self._coords(T)
                acc, sink_acc = self._compute(
                    c_ref, bounds_ref, meta_ref, p_ref[:],
                    None if synth else mask_ref[:],
                    coords, lane_iota, idx, 0, T)
                dp_ref[:] = acc
                for cc in range(n_c):
                    dsinks_ref[0, cc] = sink_acc[cc]
                if n_c == 0:
                    dsinks_ref[0, 0] = jnp.zeros((), dtype)

            grid_kw = {}
            in_specs = [smem, smem, smem, vmem] + ([] if synth else [vmem])
            out_specs = (vmem, smem)
        else:
            def kernel_entry(*refs):
                c_ref, bounds_ref, meta_ref = refs[0], refs[1], refs[2]
                p_cu, p_pv, p_nx = refs[3], refs[4], refs[5]
                dp_ref, dsinks_ref = refs[-2], refs[-1]
                pid = pl.program_id(0)
                p_w = jnp.concatenate([p_pv[:], p_cu[:], p_nx[:]], axis=0)
                if synth:
                    mask_w = None
                else:
                    m_cu, m_pv, m_nx = refs[6], refs[7], refs[8]
                    mask_w = jnp.concatenate([m_pv[:], m_cu[:], m_nx[:]],
                                             axis=0)
                coords, lane_iota, idx = self._coords(T + 2 * H, pid * T - H)
                acc, sink_acc = self._compute(
                    c_ref, bounds_ref, meta_ref, p_w, mask_w, coords,
                    lane_iota, idx, H, T)
                dp_ref[:] = acc

                @pl.when(pid == 0)
                def _init():
                    for cc in range(max(n_c, 1)):
                        dsinks_ref[0, cc] = jnp.zeros((), dtype)

                for cc in range(n_c):
                    dsinks_ref[0, cc] = dsinks_ref[0, cc] + sink_acc[cc]

            cur = lambda i: (i, 0)
            blkT = pl.BlockSpec((T, LANES), cur, memory_space=pltpu.VMEM)
            blkH = pl.BlockSpec((H, LANES), cur, memory_space=pltpu.VMEM)
            grid_kw = {"grid": (grid,)}
            in_specs = [smem, smem, smem, blkT, blkH, blkH] \
                + ([] if synth else [blkT, blkH, blkH])
            out_specs = (
                blkT,
                pl.BlockSpec((1, max(n_c, 1)), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            )

        out_shape = (
            jax.ShapeDtypeStruct((rows_pad, LANES), dtype),
            jax.ShapeDtypeStruct((1, max(n_c, 1)), dtype),
        )
        itemsize = jnp.dtype(dtype).itemsize
        n_ops = (1 if synth else 2)                  # box-sized HBM reads
        halo_frac = 0.0 if grid == 1 else 2.0 * H / T
        cost = pl.CostEstimate(
            flops=2 * (2 * R + 1 + R * n_c) * rows_pad * LANES,
            bytes_accessed=int((n_ops * (1.0 + halo_frac) + 1.0)
                               * rows_pad * LANES * itemsize),
            transcendentals=R * rows_pad * LANES)

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
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=self.interpret,
            **grid_kw,
        )

        n, n_pad = self.n, self.n_pad

        def pad2(x):
            flat = x.reshape(n)
            if n_pad != n:
                flat = jnp.pad(flat, (0, n_pad - n))
            return flat.reshape(rows_pad, LANES)

        def halos(a2):
            """Prev/next halo arrays [grid * H, 128]: block i holds rows
            [i*T - H, i*T) (prev) / [(i+1)*T, (i+1)*T + H) (next) of the
            padded flat view, zero-filled at the edges."""
            a3 = a2.reshape(grid, T, LANES)
            z = jnp.zeros((1, H, LANES), a2.dtype)
            pv = jnp.concatenate([z, a3[:-1, T - H:, :]], axis=0)
            nx = jnp.concatenate([a3[1:, :H, :], z], axis=0)
            return pv.reshape(grid * H, LANES), nx.reshape(grid * H, LANES)

        g0 = self.g0

        def fn_padded(c, bounds, p2, m2, origin0=0, own_lo=0,
                      own_hi=None):
            """Padded-layout entry: ``p2``/``m2`` are [rows_pad, 128]
            views of the zero-padded flat box; returns ``dp2`` in the same
            layout (tail rows exactly zero) plus the sink vector.  Skips
            the per-matvec pad/unpad copies — the layout the integrators
            carry in the padded fast path."""
            c2 = jnp.asarray(c, dtype).reshape(1, R)
            b2 = jnp.asarray(bounds, jnp.int32).reshape(1, -1) \
                if n_c else jnp.zeros((1, 1), jnp.int32)
            meta = jnp.stack([
                jnp.asarray(origin0, jnp.int32),
                jnp.asarray(own_lo, jnp.int32),
                jnp.asarray(g0 if own_hi is None else own_hi,
                            jnp.int32)]).reshape(1, 3)
            args = [c2, b2, meta, p2]
            if grid > 1:
                args += list(halos(p2))
            if not synth:
                args.append(m2)
                if grid > 1:
                    args += list(halos(m2))
            dp2, dsinks = call(*args)
            return dp2, (dsinks.reshape(-1) if n_c else None)

        def fn(c, bounds, p_box, mask_box, origin0=0, own_lo=0,
               own_hi=None):
            p2 = pad2(p_box.astype(dtype))
            m2 = None if synth else pad2(mask_box.astype(dtype))
            dp2, sinks = fn_padded(c, bounds, p2, m2, origin0, own_lo,
                                   own_hi)
            dp = dp2.reshape(n_pad)[:n].reshape(self.shape)
            return dp, sinks

        fn.padded = fn_padded
        fn.pad2 = pad2
        return fn

    @property
    def has_sinks(self) -> bool:
        return self.components is not None

    def __call__(self, c, bounds, p_box, mask_box, origin0=0, own_lo=0,
                 own_hi=None):
        return self._call(c, bounds, p_box, mask_box, origin0, own_lo,
                          own_hi)

    def call_padded(self, c, bounds, p2, m2, origin0=0, own_lo=0,
                    own_hi=None):
        """Padded-layout matvec: [rows_pad, 128] in and out (see
        ``fn_padded``)."""
        return self._call_padded(c, bounds, p2, m2, origin0, own_lo,
                                 own_hi)

    def pad2(self, box_or_flat):
        """Zero-pad a box-shaped (or flat [n]) array into the kernel's
        [rows_pad, 128] layout (pure; traceable)."""
        return self._fn.pad2(box_or_flat)
