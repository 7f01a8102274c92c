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
    """
    mask_f: jnp.ndarray
    bounds: jnp.ndarray


class BoxOperator:
    """Truncated CME generator on a :class:`BoxStateSpace`."""

    def __init__(self,
                 model: Model,
                 space: BoxStateSpace,
                 dtype=None,
                 materialize: bool = False,
                 enable_reactions: Optional[Sequence[int]] = None):
        self.model = model
        self.space = space
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
        self.refresh_data()

        if materialize:
            self._prop_fields = [self._propensity_field(r)
                                 for r in self.enable_reactions]
        else:
            self._prop_fields = None
        # Violation fields are always computed on the fly: storing them
        # would cost n * n_constraints per reaction, and they are pure
        # constraint-function evaluations that XLA fuses for free.

    # ------------------------------------------------------------- data
    def refresh_data(self) -> BoxOpData:
        """Snapshot the space's current mask + bounds into the operator
        data pytree.  Call after every ``space.set_bounds`` (the driver
        does); shapes are capacity-stable, so downstream jitted programs
        keep their compiled executables."""
        self._data = BoxOpData(
            mask_f=self.space.mask.astype(self.dtype),
            bounds=jnp.asarray(self.space.constraints.bounds))
        return self._data

    def data(self) -> BoxOpData:
        return self._data if self._data is not None else self.refresh_data()

    @property
    def mask_f(self) -> jnp.ndarray:
        return self.data().mask_f

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
        inflow = jnp.zeros_like(p)
        outflow = jnp.zeros_like(p)
        dsinks = jnp.zeros_like(y.sinks)

        for k, r in enumerate(self.enable_reactions):
            a_r = (self._prop_fields[k] if self._prop_fields is not None
                   else self._propensity_field(r)) * mask_f
            viol = self._violation_field(r, data.bounds)
            ap = a_r * p
            inflow = inflow + c[r] * shift_nd(ap, self._shifts[r])
            outflow = outflow + c[r] * ap
            # sink mass: [1,n] x [n,n_c]
            dsinks = dsinks + c[r] * (ap.reshape(1, self._n)
                                      @ viol)[0]
        dp = inflow * mask_f - outflow
        return FspVector(p=dp, sinks=dsinks)

    def __call__(self, t, y, data=None):
        return self.action(t, y, data)

    def diagonal(self, t=0.0, data: Optional[BoxOpData] = None
                 ) -> jnp.ndarray:
        """diag(A(t)) = -sum_r c_r(t) a_r(x), masked (used by the
        stationary solver's rank-one completion)."""
        if data is None:
            data = self.data()
        c = self.model.coefficients(t, self.dtype)
        out = jnp.zeros(self.shape, self.dtype)
        for k, r in enumerate(self.enable_reactions):
            a_r = (self._prop_fields[k] if self._prop_fields is not None
                   else self._propensity_field(r)) * data.mask_f
            out = out - c[r] * a_r
        return out

    # ------------------------------------------------------------- misc
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
