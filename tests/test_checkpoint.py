"""Keyed checkpoint format: roundtrip, mismatch detection, legacy load."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rise_sdf_tpu import datasets, systems
from rise_sdf_tpu.presets import tiny_neus_config


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    cfg = tiny_neus_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    return systems.make(cfg.system.name, cfg, dm,
                        save_dir=str(tmp_path_factory.mktemp("ckpt")))


def test_keyed_roundtrip(system, tmp_path):
    state = system.init_state(0)
    path = system.save_checkpoint(state, str(tmp_path / "a.ckpt.npz"))
    data = np.load(path)
    # keys are tree paths, not positional leaf indices
    assert all(k.startswith("k:") for k in data.files)
    assert any("params/geometry" in k for k in data.files)
    loaded = system.load_checkpoint(path, system.init_state(1))
    for a, b in zip(jax.tree_util.tree_leaves(loaded),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_errors_with_path(system, tmp_path):
    state = system.init_state(0)
    path = system.save_checkpoint(state, str(tmp_path / "b.ckpt.npz"))
    bad = system.init_state(0)
    # corrupt the template: different occupancy grid shape
    bad["occs"] = jnp.zeros((17,))
    with pytest.raises(ValueError, match="occs"):
        system.load_checkpoint(path, bad)


def test_missing_key_errors(system, tmp_path):
    state = system.init_state(0)
    path = system.save_checkpoint(state, str(tmp_path / "c.ckpt.npz"))
    bad = dict(system.init_state(0))
    bad["extra_buffer"] = jnp.zeros((3,))
    with pytest.raises(KeyError, match="extra_buffer"):
        system.load_checkpoint(path, bad)


def test_legacy_positional_load(system, tmp_path):
    """Round-1 checkpoints (leaf_{i} by tree order) still load."""
    state = system.init_state(0)
    leaves = jax.tree_util.tree_leaves(state)
    path = str(tmp_path / "legacy.ckpt.npz")
    np.savez(path, **{f"leaf_{i}": np.asarray(l)
                      for i, l in enumerate(leaves)})
    loaded = system.load_checkpoint(path, system.init_state(1))
    for a, b in zip(jax.tree_util.tree_leaves(loaded), leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weights_only_load(system, tmp_path):
    state = system.init_state(0)
    path = system.save_checkpoint(state, str(tmp_path / "d.ckpt.npz"))
    restored = system.load_weights_only(path, system.init_state(1))
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state["params"])[0]))


def test_async_atomic_save_roundtrip(system, tmp_path):
    """Async save produces a loadable checkpoint identical to the sync
    one, via an atomic tmp+rename (no .tmp residue, no partial file)."""
    state = system.init_state(0)
    p_sync = system.save_checkpoint(state, str(tmp_path / "s.ckpt.npz"))
    p_async = system.save_checkpoint(state, str(tmp_path / "a.ckpt.npz"),
                                     async_write=True)
    system.wait_checkpoint_writer()
    assert not os.path.exists(p_async + ".tmp")
    a, b = np.load(p_sync), np.load(p_async)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])
    loaded = system.load_checkpoint(p_async, system.init_state(0))
    for got, want in zip(jax.tree_util.tree_leaves(loaded),
                         jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_overlapping_async_saves_serialize(system, tmp_path):
    """A second save joins the in-flight writer first — the newest file
    always wins and both are complete."""
    state = system.init_state(0)
    p = str(tmp_path / "latest.ckpt.npz")
    system.save_checkpoint(state, p, async_write=True)
    state2 = dict(state, step=state["step"] + 1)
    system.save_checkpoint(state2, p, async_write=True)
    system.wait_checkpoint_writer()
    data = np.load(p)
    assert int(data["k:step"]) == int(state["step"]) + 1
