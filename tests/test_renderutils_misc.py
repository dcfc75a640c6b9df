"""Golden parity for the renderutils normal/mesh/loss mirrors + full
PBR BSDF composition.  Goldens computed once (float64) from the
reference python oracles (lib/renderutils/bsdf.py, loss.py) on the
fixed inputs below; hard-coded, nothing touches the reference at test
time."""

import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops.renderutils_misc import (
    image_loss,
    prepare_shading_normal,
    xfm_points,
    xfm_vectors,
)
from rise_sdf_tpu.ops.warp import pbr_bsdf, phong

IN = {
    "pos": [[-0.5074478488, 0.6783432952, -0.3125705647],
            [-0.8342329824, -0.9129667155, 0.2163304112],
            [-0.7904709458, -0.7775934805, -0.6916576425],
            [0.1624407717, 0.1159337194, -0.4219967137]],
    "view_pos": [[0.6412173263, 1.3916849776, 1.2313067523],
                 [-0.8100038036, -0.6757877833, 1.8345068245],
                 [1.1530930429, 0.3651085681, 0.3188133482],
                 [0.5832529636, 0.7853431275, 0.9560643568]],
    "light_pos": [[0.3805453679, 1.2964461645, 2.0269194717],
                  [0.4959005313, -0.049978179, 1.5556672747],
                  [0.2272809477, 1.6899576796, 0.3935865178],
                  [2.6411906855, 2.4177416777, 1.5278331454]],
    "pert": [[-0.6980966345, 0.7125327302, -0.0704144683],
             [-0.7382042671, -0.4843870456, -0.4694929714],
             [0.6220212113, -0.7678871678, 0.1530977146],
             [0.5071011761, -0.3455899519, 0.7895669588]],
    "snrm": [[0.645821808, 0.6326886215, -0.4273397953],
             [0.8012428725, 0.194048101, 0.5659992878],
             [0.7762105778, -0.4715673488, -0.4184750584],
             [-0.7278584177, -0.5474542832, 0.4129357475]],
    "stng": [[-0.4186674252, 0.7861588495, 0.454611758],
             [-0.3866142546, 0.2839323085, 0.8774462162],
             [-0.4071739545, 0.5717101115, -0.7122899123],
             [0.1298763952, -0.9591275736, 0.2514088694]],
    "gnrm": [[0.6800962803, 0.4090088374, 0.6084248683],
             [-0.6012072185, 0.5447806897, 0.584605748],
             [-0.2500205721, 0.5979652718, 0.7615295445],
             [-0.6601856324, 0.5149961105, -0.5467485135]],
    "kd": [[0.4776661667, 0.1992296996, 0.3817003806],
           [0.4704597322, 0.0967873516, 0.8679318389],
           [0.0506782721, 0.4849277885, 0.0546878338],
           [0.7519689318, 0.5237707198, 0.7609663152]],
    "arm": [[0.221016329, 0.0969530842, 0.6197369539],
            [0.4577841793, 0.1355523164, 0.5583901116],
            [0.4106651111, 0.7585611251, 0.4892448904],
            [0.4883017869, 0.6810711534, 0.3610656048]],
}

GOLD = {
    "psn_ts_gl": [[0.7386665588, -0.632144533, 0.2340192392],
                  [-0.6012072185, 0.5447806897, 0.584605748],
                  [-0.2500205721, 0.5979652718, 0.7615295445],
                  [0.51423965, 0.8497178332, -0.1163494148]],
    "psn_1s_ocv": [[0.6800962803, 0.4090088374, 0.6084248683],
                   [-0.6012072185, 0.5447806897, 0.584605748],
                   [0.3360177889, 0.8879732216, -0.3139993683],
                   [-0.3373979548, -0.6877958377, 0.6427281741]],
    "pbr0": [[0.0512840644, 0.021393997, 0.0409821673],
             [0.0144580675, 0.0029749653, 0.026672545],
             [0.0079482222, 0.0679506581, 0.0085022434],
             [0.0, 0.0, 0.0]],
    "pbr1": [[0.1758263008, 0.073339297, 0.1405031767],
             [0.1571644982, 0.0323338594, 0.2899457782],
             [0.0226097714, 0.2082433781, 0.0243237846],
             [0.0, 0.0, 0.0]],
    "phong": [[0.0436253142], [0.0], [0.0], [0.0]],
}

LOSS_GOLD = {
    ("mse", "none"): 5.3826878995,
    ("mse", "log_srgb"): 0.2445671246,
    ("l1", "none"): 1.9014863170,
    ("l1", "log_srgb"): 0.3766002099,
    ("smape", "none"): 0.5087997166,
    ("smape", "log_srgb"): 0.2531147246,
    ("relmse", "none"): 0.4209231618,
    ("relmse", "log_srgb"): 0.1651871159,
}


def _a(k):
    return jnp.asarray(IN[k], jnp.float32)


def test_prepare_shading_normal_two_sided_opengl():
    got = prepare_shading_normal(_a("pos"), _a("view_pos"), _a("pert"),
                                 _a("snrm"), _a("stng"), _a("gnrm"),
                                 two_sided_shading=True, opengl=True)
    np.testing.assert_allclose(got, GOLD["psn_ts_gl"], rtol=2e-4, atol=2e-5)


def test_prepare_shading_normal_one_sided_opencv():
    got = prepare_shading_normal(_a("pos"), _a("view_pos"), _a("pert"),
                                 _a("snrm"), _a("stng"), _a("gnrm"),
                                 two_sided_shading=False, opengl=False)
    np.testing.assert_allclose(got, GOLD["psn_1s_ocv"], rtol=2e-4, atol=2e-5)


def test_pbr_bsdf_lambert_and_frostbite():
    got0 = pbr_bsdf(_a("kd"), _a("arm"), _a("pos"), _a("gnrm"),
                    _a("view_pos"), _a("light_pos"), bsdf=0)
    np.testing.assert_allclose(got0, GOLD["pbr0"], rtol=5e-4, atol=1e-6)
    got1 = pbr_bsdf(_a("kd"), _a("arm"), _a("pos"), _a("gnrm"),
                    _a("view_pos"), _a("light_pos"), bsdf=1)
    np.testing.assert_allclose(got1, GOLD["pbr1"], rtol=5e-4, atol=1e-6)


def test_phong_golden():
    def nrmz(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    got = phong(_a("gnrm"), nrmz(_a("view_pos") - _a("pos")),
                nrmz(_a("light_pos") - _a("pos")), 16.0)
    np.testing.assert_allclose(got, GOLD["phong"], rtol=2e-4, atol=1e-7)


def test_image_loss_goldens():
    i = np.arange(2 * 8 * 8 * 3, dtype=np.float64).reshape(2, 8, 8, 3)
    img = jnp.asarray(np.sin(i * 0.37) ** 2 * 5.0, jnp.float32)
    tgt = jnp.asarray(np.cos(i * 0.21) ** 2 * 4.0, jnp.float32)
    for (loss, tm), want in LOSS_GOLD.items():
        got = float(image_loss(img, tgt, loss, tm))
        np.testing.assert_allclose(got, want, rtol=2e-4,
                                   err_msg=f"{loss}/{tm}")


def test_xfm_points_and_vectors():
    mat = jnp.asarray([[0.0, -1.0, 0.0, 2.0],
                       [1.0, 0.0, 0.0, -1.0],
                       [0.0, 0.0, 1.0, 0.5],
                       [0.0, 0.0, 0.0, 1.0]])
    pts = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 3.0]])
    got = xfm_points(pts, mat)
    np.testing.assert_allclose(got, [[2.0, 0.0, 0.5, 1.0],
                                     [0.0, -1.0, 3.5, 1.0]], atol=1e-6)
    gotv = xfm_vectors(pts, mat)
    np.testing.assert_allclose(gotv, [[0.0, 1.0, 0.0],
                                      [-2.0, 0.0, 3.0]], atol=1e-6)
