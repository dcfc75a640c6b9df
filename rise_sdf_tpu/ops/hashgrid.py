"""Multiresolution hash-grid encoding (instant-ngp style), TPU-native.

Replaces tiny-cuda-nn's ``tcnn.Encoding(HashGrid)`` +
``ProgressiveBandHashGrid`` masking used by the reference
(``models/network_utils.py:43-68``).  Design notes:

* Pure-jnp reference path: per level, 8-corner gather from the level's
  table + trilinear interpolation.  Gathers autodiff to scatter-adds
  (XLA segment-sum style), which replaces tcnn's atomicAdd gradient
  kernel deterministically.
* The per-level feature mask (progressive band opening) is a pure
  function of the training step, so it lives inside ``jit`` without
  recompilation (reference mutates a buffer per step instead).
* Tables are stored as one ``[L, T, F]`` array so a Pallas kernel can be
  slotted in behind the same interface (see ``hashgrid_pallas.py``).

Level resolutions follow instant-ngp: ``res_l = floor(base * b^l)``;
levels whose dense grid fits in the table use dense (non-hashed) indexing,
like tcnn.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# instant-ngp spatial hash primes
_PRIMES = (1, 2654435761, 805459861)

# --------------------------------------------------------------------- #
# Trace-time gather accounting.  All table reads funnel through
# ``HashGridEncoding._lookup``; shapes are static under jit, so counting
# rows while *tracing* yields the exact per-execution gather volume of
# the compiled graph (bench.py's roofline uses this as the analytic
# post-fusion traffic floor — XLA's cost_analysis bytes are pre-fusion
# and overcount by >6x, VERDICT r3).  Not thread-safe; tracing here is
# single-threaded.  NOTE: an encode inside a lax.scan body would be
# counted once, not per iteration — no such path exists for the volume
# renderers (only ops/sphere_trace.py scans over SDF probes; its
# callers must scale by n_iters or skip the traffic model).
# --------------------------------------------------------------------- #
_GATHER_TRACE: Dict[str, int] = {}


class count_gather_rows:
    """Context manager: accumulate hash-table gather rows/bytes seen
    while tracing (use around ``jax.jit(f).lower(...)``)."""

    def __init__(self):
        self.rows = 0
        self.bytes = 0

    def __enter__(self):
        _GATHER_TRACE["rows"] = 0
        _GATHER_TRACE["bytes"] = 0
        _GATHER_TRACE["on"] = 1
        return self

    def __exit__(self, *exc):
        self.rows = _GATHER_TRACE.get("rows", 0)
        self.bytes = _GATHER_TRACE.get("bytes", 0)
        _GATHER_TRACE.clear()
        return False


class HashGridEncoding:
    def __init__(self, in_channels: int, config: Dict[str, Any]):
        assert in_channels == 3, "hash grid encode implemented for 3D inputs"
        self.n_input_dims = 3
        self.n_levels = int(config["n_levels"])
        self.n_features_per_level = int(config["n_features_per_level"])
        self.log2_hashmap_size = int(config["log2_hashmap_size"])
        self.base_resolution = int(config["base_resolution"])
        self.per_level_scale = float(config["per_level_scale"])
        self.table_size = 2 ** self.log2_hashmap_size
        self.n_output_dims = self.n_levels * self.n_features_per_level

        # table-gradient scatter implementation: 'auto' picks the Pallas
        # VMEM-accumulator kernel on TPU (17 vs 79 ns/row), XLA elsewhere
        self.scatter_impl = config.get("scatter_impl", "auto")
        self._scatter_mode = None  # resolved lazily (needs a backend)

        # progressive band opening (ProgressiveBandHashGrid); for plain
        # HashGrid all levels are always open
        self.progressive = config.get("otype", "HashGrid") == "ProgressiveBandHashGrid"
        self.start_level = int(config.get("start_level", self.n_levels))
        self.start_step = int(config.get("start_step", 0))
        self.update_steps = int(config.get("update_steps", 1))

        self.resolutions = np.array(
            [
                int(math.floor(self.base_resolution * self.per_level_scale ** l))
                for l in range(self.n_levels)
            ],
            dtype=np.int64,
        )
        # dense indexing when the full grid fits into the hash table
        self.dense = (self.resolutions.astype(np.int64) + 1) ** 3 <= self.table_size

    # ------------------------------------------------------------------ #
    def init(self, key) -> Dict[str, jnp.ndarray]:
        table = jax.random.uniform(
            key,
            (self.n_levels, self.table_size, self.n_features_per_level),
            minval=-1e-4,
            maxval=1e-4,
            dtype=jnp.float32,
        )
        return {"table": table}

    def set_scatter_impl(self, impl: str):
        """Runtime override (e.g. the trainer's non-finite-grads
        fallback, systems/neus.py): takes effect on the next trace."""
        self.scatter_impl = impl
        self._scatter_mode = None

    # ------------------------------------------------------------------ #
    def current_level(self, step) -> jnp.ndarray:
        """Number of open levels as a function of the global step."""
        if not self.progressive:
            return jnp.asarray(self.n_levels, jnp.int32)
        step = jnp.asarray(step, jnp.int32)
        lvl = self.start_level + jnp.maximum(step - self.start_step, 0) // self.update_steps
        return jnp.minimum(lvl, self.n_levels).astype(jnp.int32)

    def level_mask(self, step) -> jnp.ndarray:
        """[L] float mask of open levels (fn of step, traced under jit)."""
        cur = self.current_level(step)
        return (jnp.arange(self.n_levels) < cur).astype(jnp.float32)

    # ------------------------------------------------------------------ #
    def _lookup(self, table_l, flat):
        """``table_l[flat]`` whose table-gradient uses the Pallas
        scatter-add kernel on TPU (first-order in the table — safe here,
        position gradients flow through the interpolation weights)."""
        if _GATHER_TRACE.get("on"):
            n = int(np.prod(flat.shape))
            _GATHER_TRACE["rows"] += n
            _GATHER_TRACE["bytes"] += (n * int(table_l.shape[-1])
                                       * table_l.dtype.itemsize)
        if self._scatter_mode is None:
            impl = self.scatter_impl
            interp = False
            if impl == "auto":
                from .scatter_pallas import _use_tpu

                impl = "pallas" if _use_tpu() else "xla"
            elif impl == "pallas":
                from .scatter_pallas import _use_tpu

                interp = not _use_tpu()  # tests on CPU: interpret mode
            self._scatter_mode = (impl, interp)
        impl, interp = self._scatter_mode
        if impl == "pallas":
            from .scatter_pallas import table_grad_lookup

            return table_grad_lookup(table_l, flat, interp)
        return table_l[flat]

    # ------------------------------------------------------------------ #
    def _shard_ctx(self):
        """Active table-row sharding, iff tracing inside a shard_map body
        wrapped in ``parallel.table_sharding`` (tensor parallelism over
        the 'model' mesh axis).  Returns (axis_name, rows_per_shard) or
        None.  Outside that context the full table is used unsharded."""
        from ..parallel import current_table_sharding

        ctx = current_table_sharding()
        if ctx is None:
            return None
        axis, n = ctx
        assert self.table_size % n == 0, \
            f"table_size {self.table_size} not divisible by {n} shards"
        return axis, self.table_size // n

    @staticmethod
    def _allreduce_features(x, axis):
        """psum with an identity backward, applied leaf-wise.

        Forward: reassemble the per-shard feature contributions
        (each table row is owned by exactly one shard, so the sum is
        exact).  Backward: the replicated output's cotangent flows
        unchanged to each shard's local contribution — the exact
        transpose of the row-partitioned sum.  A raw ``lax.psum`` under
        ``check_vma=False`` shard_maps transposes to *another* psum,
        scaling table gradients by the shard count; the
        ``x + stop_gradient(psum(x) - x)`` form pins the backward to
        identity and stays correct at any differentiation order (the
        curvature probe differentiates the encode twice)."""
        return jax.tree_util.tree_map(
            lambda v: v + jax.lax.stop_gradient(jax.lax.psum(v, axis) - v),
            x)

    def _lookup_masked(self, table_l, flat, shard):
        """Row lookup under sharding: translate global row ids to this
        shard's local ids; rows owned elsewhere contribute zeros (the
        caller psums over the shard axis to reassemble).  The backward
        scatter-adds only into locally-owned rows — table gradients stay
        sharded."""
        if shard is None:
            return self._lookup(table_l, flat)
        axis, tloc = shard
        off = jax.lax.axis_index(axis).astype(jnp.int32) * tloc
        loc = flat - off
        valid = (loc >= 0) & (loc < tloc)
        vals = self._lookup(table_l, jnp.clip(loc, 0, tloc - 1))
        return vals * valid[..., None].astype(vals.dtype)

    # ------------------------------------------------------------------ #
    def _flat_index(self, idx3: jnp.ndarray, level: int) -> jnp.ndarray:
        """Integer grid points [..., 3] -> flat table rows (clipped to the
        level's grid; dense indexing or instant-ngp hash)."""
        res = int(self.resolutions[level])
        idx3 = jnp.clip(idx3, 0, res)  # grid has res+1 points per axis
        if self.dense[level]:
            stride = res + 1
            flat = idx3[..., 0] + stride * (idx3[..., 1] + stride * idx3[..., 2])
        else:
            h = idx3[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
            h = h ^ (idx3[..., 1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
            h = h ^ (idx3[..., 2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
            flat = (h & jnp.uint32(self.table_size - 1)).astype(jnp.int32)
        return flat.astype(jnp.int32)

    def _corner_indices(self, i0: jnp.ndarray, level: int) -> jnp.ndarray:
        """Flat table indices for the 8 corners. i0: [N, 3] int32."""
        corners = jnp.asarray(
            [[cx, cy, cz] for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)],
            dtype=jnp.int32,
        )  # [8,3]
        return self._flat_index(i0[:, None, :] + corners[None, :, :], level)

    def _corner_weights(self, w):
        """[N,3] frac -> ([N,8] trilinear weights, [N,8,3] d(w)/d(frac)).

        Corner order matches ``_corner_indices``: bit layout (cx, cy, cz)
        with cx major.
        """
        n = w.shape[0]
        wx = jnp.stack([1.0 - w[:, 0], w[:, 0]], axis=-1)  # [N,2]
        wy = jnp.stack([1.0 - w[:, 1], w[:, 1]], axis=-1)
        wz = jnp.stack([1.0 - w[:, 2], w[:, 2]], axis=-1)
        cw = (wx[:, :, None, None] * wy[:, None, :, None]
              * wz[:, None, None, :]).reshape(n, 8)
        wyz = (wy[:, :, None] * wz[:, None, :]).reshape(n, 4)
        wxz = (wx[:, :, None] * wz[:, None, :]).reshape(n, 4)
        wxy = (wx[:, :, None] * wy[:, None, :]).reshape(n, 4)
        dwx = jnp.concatenate([-wyz, wyz], axis=-1)
        dwy = jnp.stack([-wxz[:, 0:2], wxz[:, 0:2],
                         -wxz[:, 2:4], wxz[:, 2:4]], axis=1).reshape(n, 8)
        dwz = jnp.stack([-wxy, wxy], axis=-1).reshape(n, 8)
        return cw, jnp.stack([dwx, dwy, dwz], axis=-1)

    def _level_geometry(self, x, l):
        """Per-level frac/corner math (pure elementwise + hash, no gather)."""
        res = int(self.resolutions[l])
        pos = x * res
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
        w = pos - i0
        flat = self._corner_indices(i0, l)  # [N,8]
        return w, flat

    @staticmethod
    def _level_range(levels, n_levels):
        """Normalize the static ``levels`` spec to a (lo, hi) range."""
        if levels is None:
            return 0, n_levels
        if isinstance(levels, tuple):
            lo, hi = levels
            return int(lo), int(min(hi, n_levels))
        return 0, int(min(levels, n_levels))

    def _encode_plain(self, table, x, mask, levels=None):
        """Encode; static ``levels`` (int count or (lo, hi) range) skips the
        gathers of levels outside the range entirely — their feature slots
        are zeros (output width is always L*F for shape stability)."""
        lo, hi = self._level_range(levels, self.n_levels)
        shard = self._shard_ctx()
        n = x.shape[0]
        feats = []
        zero = None
        for l in range(self.n_levels):
            if l < lo or l >= hi:
                if zero is None:
                    zero = jnp.zeros((n, self.n_features_per_level), x.dtype)
                feats.append(zero)
                continue
            w, flat = self._level_geometry(x, l)
            vals = self._lookup_masked(table[l], flat, shard)  # [N,8,F]
            cw, _ = self._corner_weights(w)
            feats.append(jnp.einsum("nc,ncf->nf", cw, vals) * mask[l])
        out = jnp.concatenate(feats, axis=-1)
        if shard is not None:
            out = self._allreduce_features(out, shard[0])
        return out

    # 32-point "plus" neighborhood for axis-aligned FD probes: the 8 base
    # cell corners plus, per axis, the 8 points one cell before/after
    # (positions -1 and 2 on that axis, base {0,1} on the others).  A
    # central-difference probe displaces exactly one axis by <= 1 cell,
    # so base + 6 probes' 56 corner rows all live inside these 32.
    _OFF32 = None

    @classmethod
    def _off32(cls):
        if cls._OFF32 is None:
            off = [[a, b, c] for a in (0, 1) for b in (0, 1) for c in (0, 1)]
            for axis in range(3):
                for e in (-1, 2):
                    for o1 in (0, 1):
                        for o2 in (0, 1):
                            p = [0, 0, 0]
                            others = [a for a in range(3) if a != axis]
                            p[axis] = e
                            p[others[0]] = o1
                            p[others[1]] = o2
                            off.append(p)
            cls._OFF32 = np.asarray(off, np.int32)  # [32, 3]
        return cls._OFF32

    @staticmethod
    def _outer8(wx, wy, wz):
        """[N,2]x3 axis weights -> [N,8] corner weights (x-major, matching
        ``_corner_indices`` / ``_off32`` base-block order)."""
        n = wx.shape[0]
        return (wx[:, :, None, None] * wy[:, None, :, None]
                * wz[:, None, None, :]).reshape(n, 8)

    def encode_axis_probes(self, params, u, u_probes, probe_axes,
                           step=None, levels=None):
        """Fused encode of a base point + axis-aligned FD probes.

        ``u``: [N,3] base positions in [0,1]^3; ``u_probes``: [P,N,3],
        probe ``p`` differs from ``u`` only along static axis
        ``probe_axes[p]`` by at most one cell of every level in range
        (the hybrid-FD fine band guarantees this: the progressive eps is
        the finest open cell).  Instead of (P+1) x 8 corner gathers per
        level (56 rows for central-6), gathers the shared 32-point
        "plus" neighborhood once and reconstructs every probe's
        trilinear interpolation as a [P+1, 32] weight contraction —
        a 43% cut of both the forward gather rows and the backward
        scatter-add rows, replacing them with trivial VPU MACs.

        Returns [P+1, N, L*F] (base first), equal to stacking
        ``apply`` on each point (up to fp reduction order).
        """
        table = params["table"]
        mask = self.level_mask(step if step is not None else 10 ** 9)
        lo, hi = self._level_range(levels, self.n_levels)
        shard = self._shard_ctx()
        p_n, n = len(probe_axes), u.shape[0]
        assert u_probes.shape[0] == p_n
        off32 = jnp.asarray(self._off32())
        feats = []
        zero = None
        for l in range(self.n_levels):
            if l < lo or l >= hi:
                if zero is None:
                    zero = jnp.zeros((p_n + 1, n, self.n_features_per_level),
                                     u.dtype)
                feats.append(zero)
                continue
            res = int(self.resolutions[l])
            pos = u * res
            i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
            f = pos - i0
            w2 = [jnp.stack([1.0 - f[:, a], f[:, a]], -1) for a in range(3)]

            zero8 = jnp.zeros((n, 8), u.dtype)
            # base point touches only the base block of the 32
            rows = [jnp.concatenate([self._outer8(*w2),
                                     zero8, zero8, zero8], -1)]
            for p, axis in enumerate(probe_axes):
                pa = u_probes[p, :, axis] * res
                i0p = jnp.clip(jnp.floor(pa).astype(jnp.int32), 0, res - 1)
                fp = pa - i0p
                ox = i0p - i0[:, axis]  # in {-1, 0, 1} by the eps contract
                # probe axis weights over neighborhood positions
                # [-1, 0, 1, 2]: (1-fp) at ox, fp at ox+1
                pos4 = jnp.arange(4, dtype=jnp.int32)[None]
                w4 = ((pos4 == (ox[:, None] + 1)) * (1.0 - fp[:, None])
                      + (pos4 == (ox[:, None] + 2)) * fp[:, None])
                wb = list(w2)
                wb[axis] = w4[:, 1:3]  # base-grid share of the probe
                ext_w = w4[:, jnp.asarray([0, 3])]  # positions -1 and 2
                others = [a for a in range(3) if a != axis]
                # ext block order matches _off32: e-major, then the two
                # remaining axes in ascending order
                ext = self._outer8(ext_w, w2[others[0]], w2[others[1]])
                blocks = [self._outer8(*wb), zero8, zero8, zero8]
                blocks[1 + axis] = ext
                rows.append(jnp.concatenate(blocks, -1))
            w32 = jnp.stack(rows)  # [P+1, N, 32]

            flat = self._flat_index(i0[:, None, :] + off32[None], l)
            vals = self._lookup_masked(table[l], flat, shard)  # [N,32,F]
            feats.append(jnp.einsum("pnk,nkf->pnf", w32, vals) * mask[l])
        out = jnp.concatenate(feats, axis=-1)
        if shard is not None:
            out = self._allreduce_features(out, shard[0])
        return out

    def encode_with_grad(self, params, x, step=None, levels=None):
        """Features and their x-space Jacobian for levels in range.

        -> (feats [N, L*F], (jx, jy, jz) each [N, L*F]): the Jacobian is
        returned as three feature-width column arrays (not [N, D, 3]) so
        every buffer keeps a lane-friendly [N, D] layout — [*, small]
        minor dims tile-pad 16-43x on TPU and caused OOM with
        ``jax.linearize``'s residuals.  Levels outside the range
        contribute zeros.  Used by the hybrid-FD Taylor path: the
        Jacobian shares the base gathers (same ``vals``) so its table
        backward adds no new scatter rows.
        """
        table = params["table"]
        mask = self.level_mask(step if step is not None else 10 ** 9)
        lo, hi = self._level_range(levels, self.n_levels)
        shard = self._shard_ctx()
        n = x.shape[0]
        feats, jxs, jys, jzs = [], [], [], []
        zero = jnp.zeros((n, self.n_features_per_level), x.dtype)
        for l in range(self.n_levels):
            if l < lo or l >= hi:
                feats.append(zero)
                jxs.append(zero)
                jys.append(zero)
                jzs.append(zero)
                continue
            w, flat = self._level_geometry(x, l)
            vals = self._lookup_masked(table[l], flat, shard)  # [N,8,F]
            cw, dcw = self._corner_weights(w)
            m = mask[l]
            res = float(self.resolutions[l])
            feats.append(jnp.einsum("nc,ncf->nf", cw, vals) * m)
            jxs.append(jnp.einsum("nc,ncf->nf", dcw[..., 0], vals) * (m * res))
            jys.append(jnp.einsum("nc,ncf->nf", dcw[..., 1], vals) * (m * res))
            jzs.append(jnp.einsum("nc,ncf->nf", dcw[..., 2], vals) * (m * res))
        cat = lambda xs: jnp.concatenate(xs, axis=-1)
        out = (cat(feats), (cat(jxs), cat(jys), cat(jzs)))
        if shard is not None:
            out = self._allreduce_features(out, shard[0])
        return out

    def _encode_sorted_vjp(self, levels=None):
        """Encode with a custom first-order VJP.

        Table gradients avoid XLA's serialized scatter-add (~41 ns/row on
        TPU, 8x slower than gather) by sorting the (level, entry) ids of
        all corner contributions and reducing each segment as a
        difference of prefix sums — sort/cumsum/searchsorted/gather only.
        Residuals are just (x, mask): the backward recomputes the cheap
        elementwise index math, and the value regather needed for d_x is
        dead-code-eliminated whenever the position cotangent is unused
        (the training FD probes never need it).  First-order only: the
        curvature probe's grad-of-grad path uses the plain encode.
        """
        L, F, T = self.n_levels, self.n_features_per_level, self.table_size
        lo, hi = self._level_range(levels, L)

        @jax.custom_vjp
        def encode(table, x, mask):
            return self._encode_plain(table, x, mask, levels)

        def fwd(table, x, mask):
            return self._encode_plain(table, x, mask, levels), (table, x, mask)

        def bwd(resid, g):
            table, x, mask = resid
            n = x.shape[0]
            g_lvl = g.reshape(n, L, F)
            gids, contribs, dfracs = [], [], []
            for l in range(lo, hi):
                w, flat = self._level_geometry(x, l)
                cw, dcw = self._corner_weights(w)
                gm = g_lvl[:, l, :] * mask[l]                  # [N,F]
                contribs.append((cw[..., None] * gm[:, None, :]
                                 ).reshape(-1, F))             # [N*8,F]
                gids.append((flat + l * T).reshape(-1))
                # d_x path (DCE'd when unused): needs gathered values
                vals = self._lookup(table[l], flat)                          # [N,8,F]
                gv = jnp.einsum("ncf,nf->nc", vals, gm)        # [N,8]
                dfracs.append(jnp.einsum("nc,ncd->nd", gv, dcw)
                              * float(self.resolutions[l]))
            gid = jnp.concatenate(gids)
            vals_flat = jnp.concatenate(contribs, axis=0)
            order = jnp.argsort(gid)
            gid_s = gid[order]
            vals_s = vals_flat[order]
            prefix = jnp.concatenate(
                [jnp.zeros((1, F), vals_s.dtype),
                 jnp.cumsum(vals_s, axis=0)], axis=0)
            # method='sort': the default 'scan' lowers to a sequential
            # while-loop on TPU (seconds); sort-merge is ~100ms
            bounds = jnp.searchsorted(
                gid_s, jnp.arange(L * T + 1, dtype=jnp.int32),
                method="sort")
            d_table = (prefix[bounds[1:]] - prefix[bounds[:-1]]
                       ).reshape(L, T, F)
            d_x = sum(dfracs)
            return d_table, d_x, None

        encode.defvjp(fwd, bwd)
        return encode

    def apply(self, params, x: jnp.ndarray, step=None,
              grad_impl: str = "plain", levels=None) -> jnp.ndarray:
        """Encode ``x`` in [0,1]^3 -> [N, L*F] features (level-major).

        grad_impl='plain' (default) uses ordinary autodiff: XLA's
        scatter-add table gradient measured *faster* on this TPU (46
        ns/row) than the sorted prefix-sum VJP (62 ns/row — the sort
        permutation gathers dominate); 'sorted' keeps the deterministic
        segment-reduction VJP available (first-order only).

        ``levels`` (static: int count or (lo, hi) range) restricts the
        encode to those levels — closed levels cost nothing (progressive-
        level specialization: one recompile per opened band)."""
        table = params["table"]
        mask = self.level_mask(step if step is not None else 10 ** 9)
        if grad_impl == "sorted" and self._shard_ctx() is not None:
            grad_impl = "plain"  # sorted VJP assumes the full table
        if grad_impl == "sorted":
            key = self._level_range(levels, self.n_levels)
            cache = getattr(self, "_encode_vjp_cache", None)
            if cache is None:
                cache = self._encode_vjp_cache = {}
            if key not in cache:
                cache[key] = self._encode_sorted_vjp(levels)
            return cache[key](table, x, mask)
        return self._encode_plain(table, x, mask, levels)

    __call__ = apply
