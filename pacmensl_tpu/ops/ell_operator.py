"""ELL-format gather-based CME operator (general/compressed backend).

Direct TPU analogue of the reference's stored sparse operator
(``FspMatrixBase::GenerateValues``, ``src/Matrix/FspMatrixBase.cpp:76-251``):
every row (state) has at most one off-diagonal entry per reaction, so the
operator is naturally an ELL/SELL layout — exactly why the reference picked
PETSc MATMPISELL (FspMatrixBase.cpp:155).  Here the per-reaction column
indices and values are dense [n_pad] arrays and the matvec is a batched
gather — regular, static-shaped, and vmappable.

Used when the constraint set is too sparse inside its bounding box for the
dense stencil backend (see :mod:`box_operator`), or when propensities are
host-only callables that cannot trace into jit (they are evaluated once at
assembly, like the reference's ``PropFun`` callbacks).

Sink semantics identical to :class:`BoxOperator` / the reference: sinks
accumulate a_r(x) of every transition violating each constraint, stored as
packed bitmasks (one uint32 per state per reaction).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE
from ..models.model import Model
from ..statespace.state_set import StateSet
from .vecops import FspVector


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _capacity_ladder(n: int, quantum: int) -> int:
    """Padded capacity: the next rung of a 1.5x geometric ladder, in
    multiples of ``quantum``.  FSP expansion epochs at the same rung keep
    every array shape stable, so the jitted solve program is reused — the
    analogue of the reference's cheap PETSc re-assembly
    (FspMatrixConstrained.cpp:121-282) under XLA's static-shape rule."""
    c = quantum
    while c < n:
        c = _round_up(int(c * 3 / 2), quantum)
    return c


class EllOpData(NamedTuple):
    """Per-epoch operator arrays (a jax pytree; jit *argument*, never a
    closed-over constant — same epoch-stable-compilation design as
    :class:`~.box_operator.BoxOpData`)."""
    src_idx: jnp.ndarray    # [R, n_pad] int32 gather source per reaction
    off_val: jnp.ndarray    # [R, n_pad] off-diagonal a_r(x - s_r)
    diag_val: jnp.ndarray   # [R, n_pad] outflow a_r(x)
    sink_bits: jnp.ndarray  # [R, n_pad] uint32 packed violated-constraints


class EllOperator:
    """Truncated CME generator over an explicit state list."""

    def __init__(self,
                 model: Model,
                 state_set: StateSet,
                 dtype=None,
                 pad_to: int = 128,
                 capacity_floor: int = 0,
                 enable_reactions: Optional[Sequence[int]] = None):
        self.model = model
        self.state_set = state_set
        self.dtype = dtype or DEFAULT_DTYPE
        self.enable_reactions = tuple(
            enable_reactions if enable_reactions is not None
            else range(model.num_reactions))
        self._pad_quantum = int(pad_to)
        self.n_states = state_set.num_states
        self.n_pad = max(_capacity_ladder(self.n_states, self._pad_quantum),
                         int(capacity_floor))
        self._assemble()

    def reassemble(self) -> bool:
        """Refresh the operator arrays after the state set changed
        (expansion epoch).  Returns True when the padded capacity had to
        grow — i.e. array shapes changed and downstream jitted programs
        must recompile; within-capacity epochs return False and reuse the
        compiled solve via the :meth:`data` pytree argument."""
        self.n_states = self.state_set.num_states
        grew = self.n_states > self.n_pad
        if grew:
            self.n_pad = _capacity_ladder(self.n_states, self._pad_quantum)
        self._assemble()
        return grew

    def _assemble(self):
        states = self.state_set.states            # [n, S] host
        n, n_pad = self.n_states, self.n_pad
        R = len(self.enable_reactions)
        n_c = self.state_set.num_constraints
        stoich = self.model.stoichiometry

        src_idx = np.zeros((R, n_pad), dtype=np.int32)
        off_val = np.zeros((R, n_pad), dtype=np.float64)
        diag_val = np.zeros((R, n_pad), dtype=np.float64)
        sink_bits = np.zeros((R, n_pad), dtype=np.uint32)

        # Assembly runs on the process-LOCAL CPU backend: propensity
        # sweeps over the state list are microseconds of vectorized math,
        # but on a tunneled TPU each per-reaction eval + device_get is an
        # RPC round-trip — measured at 464 s of a 718 s repressilator
        # solve (55 epochs) before this was pinned to the host.  Mirrors
        # the reference, whose assembly is pure local CPU
        # (FspMatrixBase.cpp:76-251).
        from ..sys.environment import local_cpu_device
        cpu = local_cpu_device()
        if not hasattr(self, "_prop_jit"):
            self._prop_jit = jax.jit(self.model.propensity,
                                     static_argnums=1)
            # bounds as an ARGUMENT: the ConstraintSet object is replaced
            # with new bounds every expansion epoch, so a jit closing over
            # it would silently keep the stale bounds; the constraint
            # function itself is epoch-stable
            self._sat_jit = jax.jit(
                lambda s, b: self.state_set.constraints.satisfied_with(s, b))
        bounds_now = np.asarray(self.state_set.constraints.bounds)
        with jax.default_device(cpu):
            states_j = jax.device_put(states, cpu)
            for k, r in enumerate(self.enable_reactions):
                # Off-diagonal: who flows INTO row x (source x - s_r),
                # exactly the reference's column construction
                # (FspMatrixBase.cpp:132-145)
                src = states - stoich[r][None, :]
                idx = self.state_set.state2index(src)
                ok = idx >= 0
                src_idx[k, :n] = np.where(ok, idx, 0)
                a_src = np.asarray(
                    self._prop_jit(jax.device_put(src, cpu), r),
                    dtype=np.float64)
                off_val[k, :n] = np.where(ok, a_src, 0.0)
                # Diagonal: full outflow rate a_r(x)
                diag_val[k, :n] = np.asarray(self._prop_jit(states_j, r),
                                             dtype=np.float64)
                # Sink bits: constraints violated by the target x + s_r
                tgt = states + stoich[r][None, :]
                sat = np.asarray(self._sat_jit(
                    jax.device_put(tgt, cpu),
                    jax.device_put(bounds_now, cpu)))
                viol = ~sat                             # [n, n_c]
                bits = np.zeros(n, dtype=np.uint32)
                for c in range(n_c):
                    bits |= viol[:, c].astype(np.uint32) << c
                sink_bits[k, :n] = bits

        self.src_idx = jnp.asarray(src_idx)
        self.off_val = jnp.asarray(off_val, self.dtype)
        self.diag_val = jnp.asarray(diag_val, self.dtype)
        self.sink_bits = jnp.asarray(sink_bits)
        self._nnz = int((off_val != 0).sum() + n)
        self._data = EllOpData(src_idx=self.src_idx, off_val=self.off_val,
                               diag_val=self.diag_val,
                               sink_bits=self.sink_bits)

    def data(self) -> EllOpData:
        """Epoch data to thread through jitted solves as an argument."""
        return self._data

    # ------------------------------------------------------------ action
    def action(self, t, y: FspVector,
               data: Optional[EllOpData] = None) -> FspVector:
        if data is None:
            data = self._data
        p = y.p                                    # [n_pad]
        c_full = self.model.coefficients(t, self.dtype)
        c = jnp.asarray(
            [c_full[r] for r in self.enable_reactions])  # [R]

        gathered = data.off_val * p[data.src_idx]        # [R, n_pad]
        dp = c @ gathered - p * (c @ data.diag_val)

        n_c = self.num_constraints
        # [R, n_c, n_pad] bit test fused into the reduction
        bit = jnp.arange(n_c, dtype=jnp.uint32)
        viol = ((data.sink_bits[:, None, :] >> bit[None, :, None]) & 1
                ).astype(self.dtype)
        weighted = (c[:, None, None] * data.diag_val[:, None, :]) * viol
        dsinks = jnp.tensordot(weighted, p, axes=([2], [0])).sum(axis=0)
        return FspVector(p=dp, sinks=dsinks)

    def __call__(self, t, y, data=None):
        return self.action(t, y, data)

    def diagonal(self, t=0.0, data: Optional[EllOpData] = None
                 ) -> jnp.ndarray:
        """diag(A(t)) = -sum_r c_r(t) a_r(x) over the padded vector."""
        if data is None:
            data = self._data
        c_full = self.model.coefficients(t, self.dtype)
        c = jnp.asarray([c_full[r] for r in self.enable_reactions])
        return -(c @ data.diag_val)

    # ------------------------------------------------------------- misc
    @property
    def num_constraints(self) -> int:
        return self.state_set.num_constraints

    def zero_vector(self) -> FspVector:
        return FspVector(p=jnp.zeros((self.n_pad,), self.dtype),
                         sinks=jnp.zeros((self.num_constraints,), self.dtype))

    def local_mv_flops(self) -> float:
        """Reference GetLocalMVFlops analogue (2 flops per nonzero)."""
        return 2.0 * self._nnz

    def nnz(self) -> int:
        return self._nnz

    def dense_matrix(self, t: float = 0.0) -> np.ndarray:
        """Materialize the full operator incl. sink rows (tests only)."""
        n, n_c = self.n_states, self.num_constraints
        A = np.zeros((n + n_c, n))
        c = np.asarray(jax.device_get(
            self.model.coefficients(t, self.dtype)))
        off = np.asarray(jax.device_get(self.off_val))
        dia = np.asarray(jax.device_get(self.diag_val))
        src = np.asarray(jax.device_get(self.src_idx))
        bits = np.asarray(jax.device_get(self.sink_bits))
        for k, r in enumerate(self.enable_reactions):
            for i in range(n):
                if off[k, i] != 0:
                    A[i, src[k, i]] += c[r] * off[k, i]
                A[i, i] -= c[r] * dia[k, i]
                for cc in range(n_c):
                    if (bits[k, i] >> cc) & 1:
                        A[n + cc, i] += c[r] * dia[k, i]
        return A
