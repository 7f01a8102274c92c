"""Matrix-free dense-box CME operator (the TPU-native hot path).

Re-design of the reference operator stack (``FspMatrixBase`` +
``FspMatrixConstrained``, ``src/Matrix/*.cpp``) around TPU cost realities:

The reference assembles one sparse SELL matrix per time-varying reaction plus
a merged time-invariant matrix, and its matvec is bandwidth-bound on reading
matrix values + column indices (~2*8B + 4B per nonzero).  On TPU, VPU flops
are essentially free relative to HBM bandwidth, so this operator stores **no
matrix at all**: the action

    (A(t) p)_x = sum_r c_r(t) [ a_r(x - s_r) p(x - s_r) - a_r(x) p(x) ]

is computed by re-evaluating the propensities from the coordinate grid
(XLA fuses the iota-based coordinates into the elementwise graph — zero HBM
traffic) and turning the ``x -> x + s_r`` moves into static stencil shifts
of the dense box array.  Traffic per matvec drops from O((2R+1) * 8B * n)
to O(R reads of p + 1 write), and the shifts shard into ICI neighbor
exchanges under GSPMD.

Sink rows (``FspMatrixConstrained::GenerateValues``,
FspMatrixConstrained.cpp:121-282): a transition x -> x + s_r leaving the
constraint set contributes a_r(x) to the sink of **every** constraint the
target violates (reference semantics, including multi-counting).  Here the
sink derivative is a fused masked reduction per reaction.

**Epoch-stable compilation.**  Everything that changes between FSP
expansion epochs at a fixed array capacity — the validity mask and the
constraint bounds — travels as the :class:`BoxOpData` argument of
:meth:`action`, never as a closed-over constant.  One compiled solve
program therefore serves every epoch until the capacity itself grows
(the reference instead destroys + regenerates its matrices every epoch,
FspSolverMultiSinks.cpp:168-171 — cheap for PETSc assembly, ruinous if it
forced an XLA recompile).

``materialize=True`` precomputes the per-reaction propensity fields instead
(one dense array per reaction) — the stored-operator variant for propensity
functions too expensive to recompute; it is the closest analogue of the
reference's stored SELL values.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE
from ..models.model import Model
from ..statespace.box_space import BoxStateSpace
from .stencil import shift_nd, coord_grid
from .vecops import FspVector


class BoxOpData(NamedTuple):
    """Per-epoch operator data (a jax pytree; jit *argument*, not constant).

    ``mask_f``: validity mask over the box, as floats.
    ``bounds``: constraint RHS vector (the sink thresholds).
    ``sink_idx``/``sink_val``/``sink_rid``: the **sink shell** — per
    constraint, the flat indices, masked propensity values, and (global)
    reaction ids of every transition leaving the constraint set.  Sink
    rows are supported only on the thin boundary shell of the truncated
    set, so the per-matvec sink derivative reduces over ``[n_c, m_pad]``
    arrays instead of dense [n, n_c] violation fields (the dense form
    cost more than the whole stencil).  ``m_pad`` is capacity-laddered so
    expansion epochs usually reuse compiled programs.
    """
    mask_f: jnp.ndarray
    bounds: jnp.ndarray
    sink_idx: jnp.ndarray   # [n_c, m_pad] int32 flat box indices
    sink_val: jnp.ndarray   # [n_c, m_pad] masked propensity a_r(x), 0 = pad
    sink_rid: jnp.ndarray   # [n_c, m_pad] int32 global reaction index
    #: mask in the fused kernel's padded [rows_pad, 128] layout (None when
    #: no kernel is active or the kernel synthesizes its mask in-register)
    mask_p2: Optional[jnp.ndarray] = None


def _shell_ladder(n: int) -> int:
    c = 256
    while c < n:
        c = int(c * 3 / 2)
    return c


class BoxOperator:
    """Truncated CME generator on a :class:`BoxStateSpace`."""

    def __init__(self,
                 model: Model,
                 space: BoxStateSpace,
                 dtype=None,
                 materialize: bool = False,
                 enable_reactions: Optional[Sequence[int]] = None,
                 use_pallas="auto",
                 sink_m_floor: int = 0,
                 mesh=None):
        self.model = model
        self.space = space
        #: 1-D device mesh: the fused kernel then runs under shard_map
        #: with explicit ppermute halo exchange along axis 0 (see
        #: parallel/halo_box.py) instead of the single-device pallas_call
        self.mesh = mesh
        self.dtype = dtype or DEFAULT_DTYPE
        self.materialize = materialize
        self.enable_reactions = tuple(
            enable_reactions if enable_reactions is not None
            else range(model.num_reactions))

        self.shape = space.shape
        self._n = int(np.prod(self.shape))
        self._values_fn = space.constraints.values_fn
        self._shifts = tuple(tuple(int(v) for v in row)
                             for row in model.stoichiometry)
        self._data: Optional[BoxOpData] = None
        self._shell_eval = None
        self._use_pallas_mode = use_pallas
        # Monotone sink-shell padding: the padded shell width only ever
        # grows (and callers pass the previous operator's value through
        # rebuilds), so within-capacity expansion epochs keep the shapes
        # of BoxOpData stable and downstream jitted programs compiled.
        self.sink_m_pad = int(sink_m_floor)
        # kernel before data: refresh_data snapshots the mask in the
        # kernel's padded layout when a mask-reading kernel is active
        self._pallas = self._maybe_build_pallas(use_pallas)
        self.refresh_data()

        if materialize:
            self._prop_fields = [self._propensity_field(r)
                                 for r in self.enable_reactions]
        else:
            self._prop_fields = None
        # Violation fields are always computed on the fly: storing them
        # would cost n * n_constraints per reaction, and they are pure
        # constraint-function evaluations that XLA fuses for free.

    def _maybe_build_pallas(self, use_pallas):
        """Fused single-pass Pallas kernel for the action (see
        :mod:`pallas_box`).  'auto' enables it on TPU, f32, box within the
        VMEM budget; True forces it (interpret mode off-TPU, for tests);
        False disables."""
        if use_pallas is False or self.materialize:
            return None
        from .pallas_box import (PallasBoxKernel, fits_vmem, is_tpu_device,
                                 mesh_is_tpu)
        import jax as _jax
        on_tpu = (mesh_is_tpu(self.mesh) if self.mesh is not None
                  else is_tpu_device())
        if use_pallas == "auto":
            f32 = jnp.dtype(self.dtype) == jnp.dtype(jnp.float32)
            if self.mesh is not None:
                from ..parallel.halo_box import sharded_vmem_ok
                fits = sharded_vmem_ok(
                    self.shape, self.dtype, len(self.enable_reactions),
                    self.model.stoichiometry, self.enable_reactions,
                    int(self.mesh.devices.size))
            else:
                fits = fits_vmem(self.shape, self.dtype,
                                 len(self.enable_reactions),
                                 stoichiometry=self.model.stoichiometry,
                                 enable_reactions=self.enable_reactions)
            if not (on_tpu and f32 and fits):
                return None
        def build(components, synth=False):
            if self.mesh is not None:
                from ..parallel.halo_box import ShardedPallasBoxAction
                kern = ShardedPallasBoxAction(
                    self.model.propensity, self.model.stoichiometry,
                    self.shape, self.enable_reactions, self.mesh,
                    dtype=self.dtype, components=components,
                    synth_mask=synth, sink_active=self._sink_activity())
            else:
                kern = PallasBoxKernel(
                    self.model.propensity, self.model.stoichiometry,
                    self.shape, self.enable_reactions, dtype=self.dtype,
                    components=components, synth_mask=synth,
                    sink_active=self._sink_activity())
            # fail here (trace-time), not on the first matvec
            _jax.eval_shape(
                kern,
                jax.ShapeDtypeStruct((len(self.enable_reactions),),
                                     self.dtype),
                jax.ShapeDtypeStruct((self.num_constraints,), jnp.int32),
                jax.ShapeDtypeStruct(self.shape, self.dtype),
                jax.ShapeDtypeStruct(self.shape, self.dtype))
            return kern

        import warnings
        comps = self.space.constraints.components
        # Mask synthesis: when BFS reachability prunes nothing, the mask
        # is all-constraints-satisfied — recomputable in-register from the
        # SMEM bounds, halving the kernel's HBM traffic.  refresh_data
        # downgrades to the mask-reading kernel if a later epoch's mask
        # stops being constraint-pure.
        synth = bool(getattr(self.space, "mask_is_constraint_only", False))
        try:
            return build(comps, synth=synth and comps is not None)
        except Exception as e:
            if comps is None:
                if use_pallas is True:
                    raise
                warnings.warn(
                    "pallas box kernel unavailable, falling back to the XLA "
                    f"stencil path: {type(e).__name__}: {e}",
                    RuntimeWarning, stacklevel=2)
                return None
            err_sinks = e
        # constraint components that don't trace on coordinate fields:
        # retry without in-kernel sinks (shell-gather fallback)
        try:
            kern = build(None)
            warnings.warn(
                "pallas kernel: in-kernel sink evaluation unavailable "
                f"({type(err_sinks).__name__}: {err_sinks}); using the "
                "shell-gather sink fallback", RuntimeWarning, stacklevel=2)
            return kern
        except Exception as e:
            if use_pallas is True:
                raise
            warnings.warn(
                "pallas box kernel unavailable, falling back to the XLA "
                f"stencil path: {type(e).__name__}: {e}",
                RuntimeWarning, stacklevel=2)
            return None

    def _corner_sink_activity(self):
        """Corner-exact sink activity for multilinear constraint sets
        (see `_sink_activity`), or None when the multilinearity probe
        fails.  All evaluation happens on the host CPU backend with a
        handful of points — no device traffic."""
        import itertools
        from ..sys.environment import local_cpu_device

        S = len(self.shape)
        ext = np.asarray(self.shape, np.int64)
        cpu = local_cpu_device()

        with jax.default_device(cpu):
            def vals(pts):
                # int32: extents/values here are small, and requesting
                # int64 under a non-x64 runtime only emits a warning
                return np.asarray(jax.device_get(
                    self._values_fn(jnp.asarray(pts, jnp.int32))),
                    np.float64)

            # --- multilinearity probe: for each axis, f restricted to
            # the axis must be affine (zero second difference) at random
            # base points.  Exact for polynomials (random evaluation =
            # polynomial identity test); arbitrary smooth non-polynomials
            # fail w.h.p. with 4 independent base points per axis.
            rng = np.random.default_rng(0x5eed)
            n_base = 4
            for d in range(S):
                e = int(ext[d])
                if e < 3:
                    continue        # any f is affine on <= 2 points
                t0, t1, t2 = 0, (e - 1) // 2, e - 1
                if t1 == t0 or t1 == t2:
                    t1 = 1
                z = rng.integers(0, np.maximum(ext - 1, 1),
                                 size=(n_base, S)).astype(np.int64)
                pts = np.repeat(z, 3, axis=0)
                pts[0::3, d], pts[1::3, d], pts[2::3, d] = t0, t1, t2
                v = vals(pts)                       # [3*n_base, n_c]
                v0, v1, v2 = v[0::3], v[1::3], v[2::3]
                lhs = (v1 - v0) * (t2 - t1)
                rhs = (v2 - v1) * (t1 - t0)
                scale = 1.0 + np.maximum(np.abs(lhs), np.abs(rhs))
                if not np.all(np.abs(lhs - rhs) <= 1e-9 * scale):
                    return None

            corners = np.array(
                list(itertools.product(*[(0, int(e) - 1) for e in ext])),
                np.int64)                           # [2^S, S]
            base = vals(corners)                    # [2^S, n_c]
            rows = []
            for r in self.enable_reactions:
                s = np.asarray(self.model.stoichiometry[r], np.int64)
                rows.append(np.any(vals(corners + s[None, :]) > base,
                                   axis=0))
        return np.stack(rows, axis=0).astype(bool)

    def _sink_activity(self) -> np.ndarray:
        """Structural sink sparsity [R_enabled, n_c]: combo (r, c) is
        active iff reaction r increases constraint score c somewhere in
        the capacity box — a *bounds-independent* superset of the sink
        rows any epoch can populate (a valid x with f_c(x + s_r) > b_c
        implies f_c(x + s_r) > f_c(x) since f_c(x) <= b_c).  Lets the
        fused kernel skip the per-(reaction, constraint) violation
        reductions for impossible combos (e.g. death reactions never feed
        coordinate-bound sinks).  Evaluated once per capacity on the CPU
        backend."""
        if getattr(self, "_sink_active_cache", None) is not None:
            return self._sink_active_cache

        n = self._n
        S = len(self.shape)

        # Corner shortcut: when every constraint component is MULTILINEAR
        # in the coordinates (degree <= 1 per species — true for all
        # bundled models: coordinates, sums, pairwise products), the
        # difference g(x) = f_c(x + s_r) - f_c(x) is multilinear too, so
        # max over the box is attained at a CORNER: checking the 2^S box
        # corners is exact.  Multilinearity is certified by a
        # polynomial-identity probe (second differences along each axis
        # at random interior points vanish); non-multilinear components
        # fail it w.h.p. and take the full chunked box sweep below.
        # hog1p_5d measured ~5-8 s of full-capacity device sweep per
        # reorder rung (52.6 s MatrixGeneration total); the corner check
        # is O(2^S * R) host evaluations — microseconds.
        act = self._corner_sink_activity()
        if act is not None:
            self._sink_active_cache = act
            return act

        strides = [int(np.prod(self.shape[d + 1:])) for d in range(S)]
        CH = min(n, 1 << 21)
        n_ch = -(-n // CH)

        @jax.jit
        def act_all():
            # ONE compiled program for every reaction, CHUNKED over the
            # box: a whole-box sweep materializes [n, n_c] score arrays
            # per reaction simultaneously — measured 9 x 1.66 GB = 15 GB
            # on hog1p's 55M box (compile OOM).  Each chunk decodes its
            # coordinates from the flat C-order index.
            from jax import lax

            def body(i, acc):
                idx = jnp.minimum(i * CH + jnp.arange(CH, dtype=jnp.int32),
                                  n - 1)
                cols, rem = [], idx
                for sd in strides:
                    q = rem // sd if sd > 1 else rem
                    cols.append(q)
                    rem = rem - q * sd
                coords = jnp.stack(cols, axis=1)
                base = self._values_fn(coords)
                rows = []
                for r in self.enable_reactions:
                    s = jnp.asarray(self.model.stoichiometry[r],
                                    coords.dtype)
                    rows.append(jnp.any(
                        self._values_fn(coords + s[None, :]) > base,
                        axis=0))
                return acc | jnp.stack(rows, axis=0)

            n_c = self.num_constraints
            return lax.fori_loop(
                0, n_ch, body,
                jnp.zeros((len(self.enable_reactions), n_c), bool))

        if getattr(self.space, "build_on_device", False):
            # full-capacity sweep on the accelerator: the host CPU sweep
            # over a preallocated (tens-of-millions-element) box cost tens
            # of seconds of solve setup
            rows = np.asarray(jax.device_get(act_all()), bool)
        else:
            from ..sys.environment import local_cpu_device
            cpu = local_cpu_device()
            with jax.default_device(cpu):
                rows = np.asarray(jax.device_get(act_all()), bool)
        self._sink_active_cache = rows
        return self._sink_active_cache

    # ------------------------------------------------------------- data
    def refresh_data(self) -> BoxOpData:
        """Snapshot the space's current mask + bounds into the operator
        data pytree (and rebuild the sink shell).  Call after every
        ``space.set_bounds`` (the driver does); shapes are
        capacity-stable up to sink-shell ladder growth, so downstream
        jitted programs usually keep their compiled executables."""
        # Assembly never touches the accelerator: the first round-trip
        # through a tunneled TPU costs tens of seconds, so the mask is
        # cast host-side and bounds stay numpy until the final async
        # host->device transfers below.
        bounds_np = np.asarray(self.space.constraints.bounds)
        kern = getattr(self, "_pallas", None)
        if (kern is not None and kern.synth_mask
                and not getattr(self.space, "mask_is_constraint_only",
                                False)):
            # reachability started pruning states: the in-register mask no
            # longer equals the stored one — rebuild the kernel in
            # mask-reading mode (rare; costs one retrace)
            self._pallas = self._maybe_build_pallas(self._use_pallas_mode)
        kern = getattr(self, "_pallas", None)
        if kern is not None and getattr(kern, "has_sinks", False):
            # the kernel computes sink derivatives in-register from the
            # SMEM bounds — the boundary-shell arrays would never be read.
            # Skipping their (host-side) construction removes an O(R * n)
            # numpy sweep from every expansion epoch.
            n_c = self.num_constraints
            m_pad = max(self.sink_m_pad, 1)
            sink_idx = jnp.zeros((n_c, m_pad), jnp.int32)
            sink_val = jnp.zeros((n_c, m_pad), self.dtype)
            sink_rid = jnp.zeros((n_c, m_pad), jnp.int32)
        else:
            sink_idx, sink_val, sink_rid = self._build_sink_shell(bounds_np)
        if getattr(self.space, "build_on_device", False):
            # device-built mask: stays on device end-to-end (no host cast)
            mask_f = self.space.mask.astype(jnp.dtype(self.dtype))
        else:
            mask_f = jnp.asarray(
                self.space.mask_host.astype(jnp.dtype(self.dtype)))
        kern = getattr(self, "_pallas", None)
        if self.padded_layout:
            # Store the mask in the kernel's flat [rows_pad, 128] layout:
            # box-shaped epoch data whose trailing dims are far from
            # (8, 128) tile-pads catastrophically on TPU — measured 32x
            # (4.69 GB per copy) on hog1p's (..., 56, 4) box, an OOM.
            # The padded kernel only ever reads this layout anyway.
            mask_f = kern.pad2(mask_f)
            mask_p2 = None
        else:
            mask_p2 = None
        self._data = BoxOpData(mask_f=mask_f, bounds=jnp.asarray(bounds_np),
                               sink_idx=sink_idx, sink_val=sink_val,
                               sink_rid=sink_rid, mask_p2=mask_p2)
        return self._data

    def _build_sink_shell(self, bounds):
        """Extract the boundary shell: per constraint c, every state x with
        ``x + s_r`` violating c contributes ``a_r(x)·mask(x)`` under
        reaction r (reference sink-row sparsity,
        FspMatrixConstrained.cpp:156-241 — the reference stores these as
        per-rank sequential sink matrices; here they are padded index/value
        arrays reduced on-device)."""
        n_c = self.num_constraints
        per_c = [[] for _ in range(n_c)]
        # Host-side extraction: one stable jitted evaluation per reaction
        # then pure numpy — a device-side compaction would compile a fresh
        # gather program per (reaction, constraint, count), which through
        # a remote-compile TPU link costs seconds each, every epoch.
        mask_np = self.space.mask_host.reshape(-1) != 0
        if self._shell_eval is None:
            # compiled for the LOCAL CPU backend (bounds are committed to
            # the cpu device, steering the jit): compiles are local and
            # fast, and the result is already host memory
            def shell_eval(r, bounds):
                return (self._violation_field(r, bounds) != 0,
                        self._propensity_field(r).reshape(-1))
            self._shell_eval = jax.jit(shell_eval, static_argnums=0)
        from ..sys.environment import local_cpu_device
        cpu = local_cpu_device()
        bounds_cpu = jax.device_put(np.asarray(bounds), cpu)
        for k, r in enumerate(self.enable_reactions):
            with jax.default_device(cpu):
                viol_r, prop_r = self._shell_eval(r, bounds_cpu)
            viol_np = np.asarray(viol_r)
            prop_np = np.asarray(prop_r)
            # shell = VALID states whose target x + s_r violates c (invalid
            # sources have a·mask = 0 and would only bloat the shell)
            viol = viol_np & mask_np[:, None]
            a_m = prop_np * mask_np
            for c in range(n_c):
                idx = np.nonzero(viol[:, c])[0]
                if idx.size == 0:
                    continue
                per_c[c].append((idx.astype(np.int32), a_m[idx],
                                 np.full(idx.size, r, np.int32)))
        m_max = max((sum(int(i.shape[0]) for i, _, _ in parts)
                     for parts in per_c), default=0)
        self.sink_m_pad = max(_shell_ladder(max(m_max, 1)), self.sink_m_pad)
        m_pad = self.sink_m_pad
        sink_idx = np.zeros((n_c, m_pad), np.int32)
        sink_val = np.zeros((n_c, m_pad), np.float64)
        sink_rid = np.zeros((n_c, m_pad), np.int32)
        for c, parts in enumerate(per_c):
            o = 0
            for idx, val, rid in parts:
                m = int(idx.shape[0])
                sink_idx[c, o:o + m] = idx
                sink_val[c, o:o + m] = val
                sink_rid[c, o:o + m] = rid
                o += m
        return (jnp.asarray(sink_idx), jnp.asarray(sink_val, self.dtype),
                jnp.asarray(sink_rid))

    def data(self) -> BoxOpData:
        return self._data if self._data is not None else self.refresh_data()

    @property
    def mask_f(self) -> jnp.ndarray:
        """Box-shaped validity mask (the epoch data stores it flat when
        the padded kernel is active — see refresh_data)."""
        m = self.data().mask_f
        if m.ndim == 2 and m.shape[-1] == 128:
            return self.from_padded(m.reshape(-1))
        return m

    # ---------------------------------------------------------- assembly
    def _propensity_field(self, r: int) -> jnp.ndarray:
        """a_r over the box (unmasked).

        Coordinates are handed to the propensity in the operator's compute
        dtype so model arithmetic stays on the fast path (f32 on TPU).
        """
        coords = coord_grid(self.shape).astype(self.dtype)
        a = jnp.asarray(self.model.propensity(coords, r), self.dtype)
        return a.reshape(self.shape)

    def _violation_field(self, r: int, bounds) -> jnp.ndarray:
        """[n, n_c] float: 1 where x + s_r violates constraint c
        (reference sink-row sparsity; FspMatrixConstrained.cpp:173-195)."""
        coords = coord_grid(self.shape)
        target = coords + jnp.asarray(
            self.model.stoichiometry[r], jnp.int32)[None, :]
        vals = self._values_fn(target)
        return (vals > jnp.asarray(bounds)[None, :]).astype(self.dtype)

    # ------------------------------------------------------------ action
    def action(self, t, y: FspVector,
               data: Optional[BoxOpData] = None) -> FspVector:
        """dy/dt = A(t) y  (jnp-traceable; the hot loop).

        Pass ``data`` explicitly inside jitted programs to keep them
        epoch-stable; without it the current snapshot is baked in as a
        constant (fine for one-shot uses).
        """
        if data is None:
            data = self.data()
        mask_f = data.mask_f
        p = y.p
        c = self.model.coefficients(t, self.dtype)

        if self.padded_layout and data.mask_f.ndim == 2:
            mask_f = None          # flat-stored; only pad2 layouts exist
        if (p.ndim == 1 and self.padded_layout
                and p.shape[0] == self._pallas.n_pad):
            # padded fast path: p is the flat zero-padded [n_pad] vector in
            # the kernel's [rows_pad, 128] layout — no per-matvec pad/unpad
            # HBM copies (the integrators carry this layout end-to-end).
            # When n_pad == n (tile-aligned box) the padded layout IS the
            # C-order flattening, so taking this path is correct for flat
            # box vectors too — rejecting them (the old `!= self._n`
            # guard) sent a flat vector down the legacy path, whose
            # box-shaped output then crashed the integrator's axpy.
            kern = self._pallas
            c_sel = jnp.asarray([c[r] for r in self.enable_reactions],
                                self.dtype)
            p2 = p.reshape(-1, 128)
            m2 = None
            if not kern.synth_mask:
                m2 = (data.mask_f if data.mask_f.ndim == 2
                      else data.mask_p2)
            dp2, ks = kern.call_padded(c_sel, data.bounds, p2, m2)
            dp = dp2.reshape(p.shape)
            if ks is not None:
                return FspVector(p=dp, sinks=ks.astype(y.sinks.dtype))
            return FspVector(p=dp, sinks=self._shell_sinks(p, c, data, y))

        if self._pallas is not None:
            c_sel = jnp.asarray([c[r] for r in self.enable_reactions],
                                self.dtype)
            if mask_f is None and data.mask_f.ndim == 2:
                mask_f = self.from_padded(data.mask_f.reshape(-1))
            dp, ks = self._pallas(c_sel, data.bounds, p, mask_f)
            if ks is not None:
                return FspVector(p=dp, sinks=ks.astype(y.sinks.dtype))
            return FspVector(p=dp, sinks=self._shell_sinks(p, c, data, y))

        dsinks = self._shell_sinks(p, c, data, y)

        inflow = jnp.zeros_like(p)
        outflow = jnp.zeros_like(p)
        for k, r in enumerate(self.enable_reactions):

            a_r = (self._prop_fields[k] if self._prop_fields is not None
                   else self._propensity_field(r)) * mask_f
            ap = a_r * p
            inflow = inflow + c[r] * shift_nd(ap, self._shifts[r])
            outflow = outflow + c[r] * ap
        dp = inflow * mask_f - outflow
        return FspVector(p=dp, sinks=dsinks)

    def _shell_sinks(self, p, c, data: BoxOpData, y: FspVector):
        """Sink derivative over the boundary shell: gather the few p
        entries adjacent to each constraint surface and reduce (reference
        sink matvec, FspMatrixConstrained.cpp:31-64).  Used by the XLA
        path and as the fallback when constraint components cannot be
        evaluated in-kernel."""
        p_flat = p.reshape(-1)         # box [n] or padded [n_pad] layout:
        gathered = p_flat.at[data.sink_idx].get()    # shell indices < n

        return jnp.sum(data.sink_val * c[data.sink_rid] * gathered,
                       axis=1).astype(y.sinks.dtype)

    def __call__(self, t, y, data=None):
        return self.action(t, y, data)

    def diagonal(self, t=0.0, data: Optional[BoxOpData] = None
                 ) -> jnp.ndarray:
        """diag(A(t)) = -sum_r c_r(t) a_r(x), masked (used by the
        stationary solver's rank-one completion)."""
        if data is None:
            data = self.data()
        mask_f = (self.from_padded(data.mask_f.reshape(-1))
                  if data.mask_f.ndim == 2 else data.mask_f)
        c = self.model.coefficients(t, self.dtype)
        out = jnp.zeros(self.shape, self.dtype)
        for k, r in enumerate(self.enable_reactions):
            a_r = (self._prop_fields[k] if self._prop_fields is not None
                   else self._propensity_field(r)) * mask_f
            out = out - c[r] * a_r
        return out

    # ------------------------------------------------------------- misc
    @property
    def padded_layout(self) -> bool:
        """True when the single-device fused kernel is active, enabling the
        flat padded [n_pad] vector layout (``action`` dispatches on
        ``y.p.ndim``; the sharded kernel keeps the box layout — its halo
        exchange works on axis-0 planes)."""
        kern = getattr(self, "_pallas", None)
        return kern is not None and self.mesh is None \
            and hasattr(kern, "call_padded")

    @property
    def n_pad(self) -> int:
        return self._pallas.n_pad

    def to_padded(self, p) -> jnp.ndarray:
        """Box-shaped (or flat [n]) -> flat padded [n_pad] layout."""
        return self._pallas.pad2(jnp.asarray(p, self.dtype)).reshape(-1)

    def from_padded(self, p_flat) -> jnp.ndarray:
        """Flat padded [n_pad] -> box-shaped."""
        return p_flat[:self._n].reshape(self.shape)

    @property
    def num_constraints(self) -> int:
        return self.space.num_constraints

    def zero_vector(self) -> FspVector:
        return FspVector(p=jnp.zeros(self.shape, self.dtype),
                         sinks=jnp.zeros((self.num_constraints,), self.dtype))

    def local_mv_flops(self) -> float:
        """FLOP estimate per matvec (reference GetLocalMVFlops,
        FspMatrixBase.cpp:429-444): ~2 flops per nonzero; here counted on
        the padded box (the work actually done)."""
        R = len(self.enable_reactions)
        return float(2 * (2 * R + 1) * self._n)

    def nnz(self) -> int:
        """Structural nonzeros of the equivalent sparse operator (for
        nnz/s benchmarking parity with the reference)."""
        n_valid = self.space.num_states
        return (len(self.enable_reactions) + 1) * n_valid
