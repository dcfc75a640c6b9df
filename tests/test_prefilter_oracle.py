"""End-to-end GGX prefilter parity bound vs a brute-force oracle.

``ops/prefilter.py`` deliberately deviates from the reference by
filtering at a reduced working resolution (then bilinearly upsampling)
when the 99%-energy GGX cone spans many texels
(``lib/renderutils/c_src/cubemap.cu:181-298`` filters at full
resolution inside per-texel cone bounds).  This test bounds the error
of the *filtered map the shading actually uses*: a numpy oracle
implements the exact ``SpecularCubemapFwdKernel`` formula —
``w = max(dot(L,V),0) * ndfGGX(alpha^2, dot(V,H)) * area(L)/4``
restricted to ``dot(L,V) >= costheta_cutoff`` and normalized by the
weight sum — at full resolution on a random 64^2 cubemap, across the
mip/roughness ladder of ``build_specular_filter_bank``.

The 64^2 ladder exercises both regimes of the approximation: the
finest level (roughness 0.08) runs at full resolution (narrow cone),
and the coarser levels (0.5, 1.0) run through the reduced work-res +
stencil-floor + upsample path — the same regimes a 512^2 production
light hits.

This test caught a real quality bug: a 2.5-texel "stencil floor" that
widened the mask past the reference's 99%-energy cutoff pulled in ~20%
spurious NDF-tail mass (the NDF is evaluated at the HALF angle, so its
tail decays slowly in L-angle) — max rel err 6.3 on noise.  With the
floor removed (exact cutoff only), measured errors on worst-case random
noise are (asserted with ~2-3x headroom):
  level 0 (64^2, r=0.08, work=64): max rel err 0.0030
  level 1 (32^2, r=0.50, work=16): max rel err 0.0039
  level 2 (16^2, r=1.00, work=16): max rel err ~ 0
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu.ops.cubemap import avg_pool_cubemap
from rise_sdf_tpu.ops.prefilter import (
    MAX_ROUGHNESS,
    MIN_ROUGHNESS,
    _np_areas,
    _np_face_dirs,
    apply_specular_level_filter,
    build_specular_level_filter,
    ggx_cutoff_costheta,
    ndf_ggx,
)


def oracle_specular(cube: np.ndarray, roughness: float,
                    cutoff: float = 0.99) -> np.ndarray:
    """Exact full-res cone-bounded GGX filter (cubemap.cu:246-298)."""
    n = cube.shape[1]
    dirs = _np_face_dirs(n)                  # [T, 3]
    areas = _np_areas(n)                     # [T]
    t = dirs.shape[0]
    flat = cube.reshape(t, -1).astype(np.float64)
    alpha = roughness * roughness
    alpha_sqr = alpha * alpha
    costheta_c = ggx_cutoff_costheta(roughness, cutoff)
    out = np.zeros_like(flat)
    block = 1024
    for s in range(0, t, block):
        v = dirs[s:s + block]
        dots = v @ dirs.T                    # [B, T] = dot(L, VNR)
        vnr_dot_h = np.sqrt(np.clip((1.0 + dots) / 2.0, 0.0, 1.0))
        w = np.maximum(dots, 0.0) * ndf_ggx(alpha_sqr, vnr_dot_h) \
            * areas[None, :] / 4.0
        w = np.where(dots >= costheta_c, w, 0.0)
        wsum = np.maximum(w.sum(axis=1, keepdims=True), 1e-20)
        out[s:s + block] = (w @ flat) / wsum
    return out.reshape(cube.shape)


def _ladder(base_res: int):
    """(resolution, roughness) mip ladder of build_specular_filter_bank
    (mirrors reference lib/pbr/light.py:169-180)."""
    res, r = [], base_res
    while r >= 16:
        res.append(r)
        if r == 16:
            break
        r //= 2
    n = len(res)
    lvls = [(res[i], (i / max(n - 2, 1)) * (MAX_ROUGHNESS - MIN_ROUGHNESS)
             + MIN_ROUGHNESS) for i in range(n - 1)]
    lvls.append((res[-1], 1.0))
    return lvls


# measured on random noise (worst case); asserted with ~2-3x headroom
_BOUNDS = {0: 0.01, 1: 0.012, 2: 0.005}


@pytest.mark.parametrize("level", [0, 1, 2])
def test_specular_ladder_error_bound(level):
    base = 64
    rng = np.random.RandomState(7)
    cube = rng.rand(6, base, base, 3).astype(np.float32)
    chain = [jnp.asarray(cube)]
    while chain[-1].shape[1] > 16:
        chain.append(avg_pool_cubemap(chain[-1]))

    res, rough = _ladder(base)[level]
    filt = build_specular_level_filter(res, rough)
    ours = np.asarray(apply_specular_level_filter(filt, chain))

    src = np.asarray(chain[int(math.log2(base // res))])
    ref = oracle_specular(src, rough)

    scale = np.abs(ref).mean()
    rel = np.abs(ours - ref) / (np.abs(ref) + 0.05 * scale)
    max_rel, mean_rel = float(rel.max()), float(rel.mean())
    print(f"level {level} (res {res}, rough {rough:.2f}, "
          f"work {filt.work_res}): max_rel={max_rel:.4f} "
          f"mean_rel={mean_rel:.5f}")
    assert max_rel < _BOUNDS[level], \
        f"level {level}: max rel err {max_rel:.4f} exceeds {_BOUNDS[level]}"
