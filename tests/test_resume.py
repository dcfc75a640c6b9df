"""Checkpoint/resume equivalence: an interrupted-and-resumed run must
reproduce the uninterrupted run bit-for-bit.

The per-step rng is ``fold_in(PRNGKey(seed+1), 2*step)`` (a pure function
of (seed, step), systems/neus.py fit), so the batch stream of a resumed
run is identical to the uninterrupted one — the property the long
production runs rely on when the host dies mid-run.  Mirrors the
reference's trainer resume (``/root/reference/launch.py:118-125``,
``--resume``) but strengthens it to exact-replay semantics the torch
DataLoader cannot give.
"""

import jax
import numpy as np
import pytest

from rise_sdf_tpu import datasets, systems
from rise_sdf_tpu.presets import tiny_neus_config as neus_config

pytestmark = pytest.mark.slow  # e2e: excluded from the fast gate


def _leaves(state):
    return [np.asarray(l) for l in jax.tree_util.tree_leaves(
        {"params": state["params"], "opt": state["opt_state"],
         "occs": state["occs"], "occ_binary": state["occ_binary"]})]


def test_resume_matches_uninterrupted(tmp_path):
    cfg = neus_config()
    seed = 7

    # arm A: uninterrupted 12 steps
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    sys_a = systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))
    state_a = sys_a.fit(max_steps=12, seed=seed, log_every=0)

    # arm B: 6 steps, checkpoint, fresh system instance, resume to 12
    sys_b = systems.make(cfg.system.name, cfg, dm, save_dir=str(tmp_path))
    state_mid = sys_b.fit(max_steps=6, seed=seed, log_every=0)
    path = sys_b.save_checkpoint(state_mid)

    dm2 = datasets.make(cfg.dataset.name, cfg.dataset)
    sys_c = systems.make(cfg.system.name, cfg, dm2, save_dir=str(tmp_path))
    resumed = sys_c.load_checkpoint(path, sys_c.init_state(0))
    assert int(resumed["step"]) == 6
    state_b = sys_c.fit(max_steps=12, seed=seed, state=resumed, log_every=0)

    assert int(state_a["step"]) == int(state_b["step"]) == 12
    for a, b in zip(_leaves(state_a), _leaves(state_b)):
        np.testing.assert_array_equal(a, b)
