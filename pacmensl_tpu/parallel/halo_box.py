"""Sharded fused Pallas box action: shard_map + ppermute halo exchange.

Runs the single-pass fused stencil kernel (:mod:`..ops.pallas_box`) on a
box block-partitioned along axis 0 over a 1-D device mesh — the TPU
equivalent of the reference's MatMult-with-VecScatter-halo hot loop
(``src/Matrix/FspMatrixBase.cpp:36-62``): before the local kernel, each
device ships its first/last ``w0`` axis-0 planes to its neighbors over ICI
(``lax.ppermute``; edge devices receive zeros), runs the kernel on the
halo-extended local slab with a global-coordinate origin, slices out its
own rows, and ``psum``s the ownership-masked sink contributions.

Communication per matvec: 2 * w0 * (box surface) values over ICI —
surface-not-volume, like the reference's MPI halos.  ``w0`` is
``max_r |s_r[0]| + 1`` planes (a flat shift by k crosses at most
``ceil(k / plane)`` planes).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:                                     # jax >= 0.6
    from jax import shard_map as _shard_map
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from ..sys.environment import STATE_AXIS
from ..ops.pallas_box import PallasBoxKernel, fits_vmem, mesh_is_tpu


def sharded_vmem_ok(shape, dtype, n_reactions, stoichiometry,
                    enable_reactions, n_devices: int) -> bool:
    """Eligibility of the sharded kernel: the halo-extended LOCAL slab
    must satisfy the kernel's VMEM/tiling constraints, and axis 0 must
    split evenly."""
    if shape[0] % n_devices != 0:
        return False
    stoich = np.atleast_2d(np.asarray(stoichiometry, np.int64))
    w0 = int(np.abs(stoich[list(enable_reactions), 0]).max(initial=0)) + 1
    local = (shape[0] // n_devices + 2 * w0,) + tuple(shape[1:])
    return fits_vmem(local, dtype, n_reactions, stoichiometry=stoichiometry,
                     enable_reactions=enable_reactions)


class ShardedPallasBoxAction:
    """``(c, bounds, p_box, mask_box) -> (dp_box, sinks)`` over a mesh.

    ``p_box``/``mask_box`` carry a NamedSharding over axis 0; the result
    ``dp_box`` is sharded likewise and ``sinks`` is replicated.
    """

    def __init__(self,
                 propensity,
                 stoichiometry,
                 shape,
                 enable_reactions: Sequence[int],
                 mesh: Mesh,
                 dtype=jnp.float32,
                 components=None,
                 synth_mask: bool = False,
                 sink_active=None,
                 interpret: Optional[bool] = None):
        self.mesh = mesh
        D = int(mesh.devices.size)
        shape = tuple(int(s) for s in shape)
        if shape[0] % D != 0:
            raise ValueError(
                f"axis 0 ({shape[0]}) must divide the mesh size {D}")
        self.shape = shape
        stoich = np.atleast_2d(np.asarray(stoichiometry, np.int64))
        self.w0 = int(np.abs(
            stoich[list(enable_reactions), 0]).max(initial=0)) + 1
        self.L0 = shape[0] // D
        if interpret is None:
            # compile for the MESH devices, not the default platform
            interpret = not mesh_is_tpu(mesh)
        local_shape = (self.L0 + 2 * self.w0,) + shape[1:]
        self.kernel = PallasBoxKernel(
            propensity, stoichiometry, local_shape, enable_reactions,
            dtype=dtype, components=components, synth_mask=synth_mask,
            sink_active=sink_active, interpret=interpret,
            global_extent0=shape[0])
        self.synth_mask = self.kernel.synth_mask
        # Halo/compute overlap (SURVEY M3): the interior of the local slab
        # needs no remote data, so splitting the action into an interior
        # kernel plus two boundary-strip kernels removes the ppermute from
        # the interior's dependency chain — XLA's latency-hiding scheduler
        # then runs the ICI transfer concurrently with the interior
        # compute.  Needs L0 >= 2*w0 (a boundary strip on each side).
        import os
        self.overlap = (os.environ.get("PACMENSL_HALO_OVERLAP", "1") != "0"
                        and self.L0 >= 2 * self.w0)
        if self.overlap:
            try:
                self.kernel_int = PallasBoxKernel(
                    propensity, stoichiometry,
                    (self.L0,) + shape[1:], enable_reactions,
                    dtype=dtype, components=components,
                    synth_mask=synth_mask, sink_active=sink_active,
                    interpret=interpret, global_extent0=shape[0])
                self.kernel_strip = PallasBoxKernel(
                    propensity, stoichiometry,
                    (3 * self.w0,) + shape[1:], enable_reactions,
                    dtype=dtype, components=components,
                    synth_mask=synth_mask, sink_active=sink_active,
                    interpret=interpret, global_extent0=shape[0])
                # all three variants must agree on sink capability
                self.overlap = (self.kernel_int.has_sinks
                                == self.kernel.has_sinks
                                == self.kernel_strip.has_sinks)
            except Exception:
                self.overlap = False
        self._build(D, dtype)

    def _build(self, D: int, dtype):
        w0, L0 = self.w0, self.L0
        kern_fn = self.kernel._call
        synth = self.synth_mask
        nd = len(self.shape)
        row_spec = P(STATE_AXIS, *([None] * (nd - 1)))

        def halo_extend(a):
            """[L0, ...] -> [L0 + 2*w0, ...]: neighbors' boundary planes
            (zeros at the global edges)."""
            up = lax.ppermute(a[L0 - w0:], STATE_AXIS,
                              [(i, i + 1) for i in range(D - 1)])
            dn = lax.ppermute(a[:w0], STATE_AXIS,
                              [(i + 1, i) for i in range(D - 1)])
            return jnp.concatenate([up, a, dn], axis=0)

        def local_fn_monolithic(c, bounds, p_loc, mask_loc):
            idx = lax.axis_index(STATE_AXIS)
            origin0 = idx * L0 - w0
            p_ext = halo_extend(p_loc)
            mask_ext = p_ext if synth else halo_extend(mask_loc)
            dp_ext, ks = kern_fn(c, bounds, p_ext, mask_ext,
                                 origin0, idx * L0, (idx + 1) * L0)
            dp = dp_ext[w0:w0 + L0]
            if ks is not None:
                ks = lax.psum(ks, STATE_AXIS)
            return dp, (ks if ks is not None
                        else jnp.zeros((0,), p_loc.dtype))

        def local_fn_overlap(c, bounds, p_loc, mask_loc):
            """Interior/boundary split: the ppermute results feed only the
            two w0-plane boundary strips, so the interior kernel runs
            concurrently with the ICI transfer (XLA latency hiding)."""
            idx = lax.axis_index(STATE_AXIS)
            base = idx * L0
            # start the halo exchange first — nothing below depends on it
            # until the strips
            up = lax.ppermute(p_loc[L0 - w0:], STATE_AXIS,
                              [(i, i + 1) for i in range(D - 1)])
            dn = lax.ppermute(p_loc[:w0], STATE_AXIS,
                              [(i + 1, i) for i in range(D - 1)])
            if not synth:
                up_m = lax.ppermute(mask_loc[L0 - w0:], STATE_AXIS,
                                    [(i, i + 1) for i in range(D - 1)])
                dn_m = lax.ppermute(mask_loc[:w0], STATE_AXIS,
                                    [(i + 1, i) for i in range(D - 1)])
            # interior: output rows [w0, L0-w0) use only local rows
            dp_int, ks_int = self.kernel_int._call(
                c, bounds, p_loc, p_loc if synth else mask_loc,
                base, base + w0, base + L0 - w0)
            # top strip: window covers global [base-w0, base+2w0), owns
            # output rows [base, base+w0)
            ptop = jnp.concatenate([up, p_loc[:2 * w0]], axis=0)
            mtop = ptop if synth else jnp.concatenate(
                [up_m, mask_loc[:2 * w0]], axis=0)
            dp_top, ks_top = self.kernel_strip._call(
                c, bounds, ptop, mtop, base - w0, base, base + w0)
            # bottom strip: window covers [base+L0-2w0, base+L0+w0), owns
            # [base+L0-w0, base+L0)
            pbot = jnp.concatenate([p_loc[L0 - 2 * w0:], dn], axis=0)
            mbot = pbot if synth else jnp.concatenate(
                [mask_loc[L0 - 2 * w0:], dn_m], axis=0)
            dp_bot, ks_bot = self.kernel_strip._call(
                c, bounds, pbot, mbot, base + L0 - 2 * w0,
                base + L0 - w0, base + L0)
            dp = jnp.concatenate(
                [dp_top[w0:2 * w0], dp_int[w0:L0 - w0],
                 dp_bot[w0:2 * w0]], axis=0)
            if ks_int is not None:
                ks = lax.psum(ks_int + ks_top + ks_bot, STATE_AXIS)
            else:
                ks = None
            return dp, (ks if ks is not None
                        else jnp.zeros((0,), p_loc.dtype))

        local_fn = (local_fn_overlap if self.overlap
                    else local_fn_monolithic)

        # check_vma=False: pallas_call's out_shape carries no varying-mesh
        # annotation, which the shard_map VMA checker (jax >= 0.6) rejects
        self._smapped = _shard_map(
            local_fn, mesh=self.mesh,
            in_specs=(P(), P(), row_spec, row_spec),
            out_specs=(row_spec, P()), check_vma=False)
        self.has_sinks = self.kernel.has_sinks

    def __call__(self, c, bounds, p_box, mask_box):
        dp, ks = self._smapped(c, bounds, p_box, mask_box)
        return dp, (ks if self.has_sinks else None)

    def comm_values_per_matvec(self) -> int:
        """Values crossing ICI per matvec (surface * 2 halo directions)."""
        plane = int(np.prod(self.shape[1:]))
        n_ops = 1 if self.synth_mask else 2
        return 2 * self.w0 * plane * n_ops * int(self.mesh.devices.size - 1)
