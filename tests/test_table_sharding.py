"""Hash-table tensor parallelism (the 'model' mesh axis).

The multiresolution hash table is the dominant parameter tensor; these
tests validate the embedding-style row sharding (each device owns
T/tp rows, masked-gathers what it owns, one psum over 'model'
reassembles features — ``ops/hashgrid.py:_lookup_masked``) against the
unsharded encode, for values, table gradients, the full 2-D
(data, model) train step, and sharded eval rendering.  Runs on the
virtual 8-CPU mesh like the DDP tests (reference has no analog: its
tcnn table lives whole on one GPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from rise_sdf_tpu.ops.hashgrid import HashGridEncoding
from rise_sdf_tpu.parallel import get_mesh, table_sharding, table_specs

TP = 4


def small_encoding():
    return HashGridEncoding(3, {
        "otype": "HashGrid",
        "n_levels": 4,
        "n_features_per_level": 2,
        "log2_hashmap_size": 8,
        "base_resolution": 4,
        "per_level_scale": 1.6,
        "scatter_impl": "xla",
    })


@pytest.fixture(scope="module")
def enc_setup():
    enc = small_encoding()
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (96, 3))
    return enc, params, x


def tp_mesh():
    assert len(jax.devices()) >= TP
    return get_mesh(TP, table_shards=TP)  # (data=1, model=TP)


def test_sharded_encode_matches_plain(enc_setup):
    enc, params, x = enc_setup
    want = np.asarray(enc.apply(params, x))
    mesh = tp_mesh()

    def body(table, xs):
        with table_sharding("model", TP):
            return enc.apply({"table": table}, xs)

    got = shard_map(body, mesh=mesh,
                    in_specs=(P(None, "model", None), P()),
                    out_specs=P(), check_vma=False)(params["table"], x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


def test_sharded_table_grads_match(enc_setup):
    enc, params, x = enc_setup
    g = jax.random.normal(jax.random.PRNGKey(2),
                          (x.shape[0], enc.n_output_dims))

    def loss_plain(table):
        return jnp.sum(enc.apply({"table": table}, x) * g)

    want = np.asarray(jax.grad(loss_plain)(params["table"]))
    mesh = tp_mesh()

    def body(table, xs):
        def loss(t):
            with table_sharding("model", TP):
                return jnp.sum(enc.apply({"table": t}, xs) * g)

        return jax.grad(loss)(table)

    got = shard_map(body, mesh=mesh,
                    in_specs=(P(None, "model", None), P()),
                    out_specs=P(None, "model", None),
                    check_vma=False)(params["table"], x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-7)


def test_sharded_encode_with_grad_matches(enc_setup):
    enc, params, x = enc_setup
    f_want, (jx_w, jy_w, jz_w) = enc.encode_with_grad(params, x)
    mesh = tp_mesh()

    def body(table, xs):
        with table_sharding("model", TP):
            f, (jx, jy, jz) = enc.encode_with_grad({"table": table}, xs)
        return f, jx, jy, jz

    f, jx, jy, jz = shard_map(
        body, mesh=mesh, in_specs=(P(None, "model", None), P()),
        out_specs=(P(), P(), P(), P()), check_vma=False)(params["table"], x)
    for got, want in ((f, f_want), (jx, jx_w), (jy, jy_w), (jz, jz_w)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def _axis_probes(x, eps):
    axes = (0, 0, 1, 1, 2, 2)
    signs = (1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    probes = []
    for axis, sign in zip(axes, signs):
        xp = np.asarray(x).copy()
        xp[:, axis] = np.clip(xp[:, axis] + sign * eps, 0.0, 1.0)
        probes.append(xp)
    return axes, jnp.asarray(np.stack(probes))


def test_sharded_axis_probe_encode_matches(enc_setup):
    """The fused 32-point probe encode under table sharding: each device
    masked-gathers the neighborhood rows it owns; one psum reassembles
    the [P+1, N, L*F] features (and grads flow back to the owned rows
    only)."""
    enc, params, x = enc_setup
    axes, xp = _axis_probes(x, 1.0 / float(enc.resolutions[-1]))
    want = np.asarray(enc.encode_axis_probes(params, x, xp, axes))
    g = jax.random.normal(jax.random.PRNGKey(3), want.shape)

    def loss_plain(table):
        return jnp.sum(enc.encode_axis_probes({"table": table}, x, xp, axes)
                       * g)

    gw = np.asarray(jax.grad(loss_plain)(params["table"]))
    mesh = tp_mesh()

    def body(table, xs, xps):
        def loss(t):
            with table_sharding("model", TP):
                return jnp.sum(
                    enc.encode_axis_probes({"table": t}, xs, xps, axes) * g)

        with table_sharding("model", TP):
            f = enc.encode_axis_probes({"table": table}, xs, xps, axes)
        return f, jax.grad(loss)(table)

    f, gt = shard_map(
        body, mesh=mesh, in_specs=(P(None, "model", None), P(), P()),
        out_specs=(P(), P(None, "model", None)),
        check_vma=False)(params["table"], x, xp)
    np.testing.assert_allclose(np.asarray(f), want, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gt), gw, rtol=1e-5, atol=1e-7)


def test_table_specs_marks_only_tables(enc_setup):
    enc, params, _ = enc_setup
    import optax

    tx = optax.adam(1e-3)
    tree = {"geometry": {"table": params["table"],
                         "w": jnp.ones((4, 4))},
            "scalar": jnp.ones(())}
    specs = table_specs(tree)
    assert specs["geometry"]["table"] == P(None, "model", None)
    assert specs["geometry"]["w"] == P()
    assert specs["scalar"] == P()
    # optimizer state mirrors the param tree inside mu/nu
    ospecs = table_specs(tx.init(tree))
    leaves = jax.tree_util.tree_leaves(
        ospecs, is_leaf=lambda s: isinstance(s, P))
    assert P(None, "model", None) in leaves


# --------------------------------------------------------------------- #
@pytest.mark.slow
def test_tp_grads_match_manual_dp(tmp_path):
    """Full-model gradients on the (data=2, model=2) mesh — table rows
    sharded, features psum-reassembled — equal the hand-computed
    data-parallel mean of per-device full-table gradients.  (Gradients,
    not post-Adam params: Adam's first step is sign(g)*lr, which
    amplifies float-reassociation noise at g~0 into ±lr flips.)"""
    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.presets import tiny_split_config

    cfg = tiny_split_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm,
                          save_dir=str(tmp_path))
    state = system.init_state(0)
    data = system.device_data(system.datamodule.train())
    DP = 2
    rngs = jax.random.split(jax.random.PRNGKey(3), DP)
    local_rays = max(system.train_num_rays // DP, 1)
    local_cap = max(system.capacity // DP, 16)

    def one_dev(params, occ_binary, step, key):
        kb, km = jax.random.split(key)
        batch = system.sample_batch(kb, data, num_rays=local_rays)

        def loss_fn(p):
            return system.forward_loss(p, batch, occ_binary, step, km,
                                       0, local_cap)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads

    # manual reference: mean of per-device full-table grads
    gfn = jax.jit(one_dev)
    losses, grads = [], []
    for d in range(DP):
        l, g = gfn(state["params"], state["occ_binary"], state["step"],
                   rngs[d])
        losses.append(float(l))
        grads.append(jax.device_get(g))
    want = jax.tree_util.tree_map(lambda *gs: sum(gs) / len(gs), *grads)

    mesh = get_mesh(4, table_shards=2)
    p_specs = table_specs(state["params"])

    def per_dev(params, occ_binary, step, rngs_, data_):
        with table_sharding("model", 2):
            loss, grads_ = one_dev(params, occ_binary, step, rngs_[0])
        return (jax.lax.pmean(loss, "data"),
                jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(g, "data"), grads_))

    loss_tp, got = jax.jit(shard_map(
        per_dev, mesh=mesh,
        in_specs=(p_specs, P(), P(), P("data"), P()),
        out_specs=(P(), p_specs), check_vma=False))(
            state["params"], state["occ_binary"], state["step"], rngs, data)
    np.testing.assert_allclose(float(loss_tp), np.mean(losses), rtol=1e-5)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    flat_g, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(got))
    for (path, a), (_, b) in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_tp_eval_render_matches(tmp_path):
    """Sharded eval over (data=2, model=2) == single-device render."""
    from rise_sdf_tpu import datasets, systems
    from rise_sdf_tpu.presets import tiny_split_config

    cfg = tiny_split_config()
    dm = datasets.make(cfg.dataset.name, cfg.dataset)
    system = systems.make(cfg.system.name, cfg, dm,
                          save_dir=str(tmp_path))
    state = system.init_state(0)
    split = system.datamodule.val()

    system.mesh = None
    out_1 = system.render_image(state, split, 0)
    system.mesh = get_mesh(4, table_shards=2)
    out_tp = system.render_image(
        state, split, 0,
        render_chunk=system.make_render_chunk(mesh=system.mesh))
    np.testing.assert_allclose(out_tp["comp_rgb_full"],
                               out_1["comp_rgb_full"],
                               rtol=1e-4, atol=2e-5)
