"""Golden-value parity for the BSDF mirrors in ``ops/warp.py``.

Expected outputs were computed once (float64) from the reference's own
python oracles (``/root/reference/lib/renderutils/bsdf.py`` — the
``use_python=True`` test path for its CUDA kernels) on the fixed input
set below, including a gradient golden (d sum(pbr_specular) / d alpha).
The numbers are hard-coded; nothing at test time touches the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rise_sdf_tpu.ops.warp import (
    eval_ggx_ndf,
    fresnel_schlick,
    frostbite_diffuse,
    lambert,
    pbr_specular,
    smith_ggx_g_correlated,
    smith_ggx_lambda,
)

INPUTS = {
    "nrm": [[-0.6080915139, -0.6015464898, -0.5180410519],
            [-0.9969569771, 0.0583171623, -0.051729047],
            [0.6059023402, 0.5706542618, -0.5542887944],
            [-0.7094860069, -0.6623371892, -0.240705326],
            [0.6596818545, 0.7135729488, -0.2358675425],
            [0.2382207634, -0.8726767894, 0.4262465121]],
    "wi": [[0.275928944, -0.1402439829, -0.9508916043],
           [-0.564831407, -0.5123583898, -0.6468804851],
           [0.6151873679, 0.5561893856, -0.5587466955],
           [-0.6219980124, -0.4200990169, -0.6607838441],
           [0.2926632805, 0.3205731758, -0.9008779291],
           [-0.5666642684, -0.2662414442, 0.7797481005]],
    "wo": [[0.5685931252, -0.7616550584, -0.3107787477],
           [-0.1168139357, 0.7494086621, -0.6517216902],
           [0.8487899292, 0.5286994392, 0.0057060641],
           [0.4491447011, -0.3900207906, -0.8038363144],
           [0.5862101166, 0.295305291, 0.7544219538],
           [-0.0664726084, -0.965212161, 0.2528771967]],
    "col": [[0.4991520535, 0.998435653, 0.2326391079],
            [0.3729050259, 0.6254849249, 0.2765082572],
            [0.0110853898, 0.7228172015, 0.2544196066],
            [0.630810721, 0.3538797412, 0.4415871029],
            [0.6128121835, 0.899420817, 0.679718025],
            [0.1444427602, 0.5572926497, 0.9697166889]],
    "alpha": [[0.3283759654], [0.1085065741], [0.6294535829],
              [0.0560024792], [0.55549495], [0.6290914696]],
    "rough": [[0.1378052955], [0.2998241973], [0.635806489],
              [0.5145604369], [0.6791539647], [0.1675030569]],
}

GOLDEN = {
    "lambert": [[0.1302441654], [0.180384887], [0.3182597019],
                [0.2796671547], [0.2019055095], [0.1367829918]],
    "frostbite": [[0.7731308958], [0.7340197369], [0.7853423163],
                  [0.8204304508], [0.7560066864], [0.9055049823]],
    "fresnel": [[0.5074847778, 0.9984616794, 0.2454058704],
                [0.7358506566, 0.8422441332, 0.6952457336],
                [0.0113113211, 0.7228805277, 0.2545899448],
                [0.6559668016, 0.3979055409, 0.4796366363],
                [0.6397017631, 0.9064058817, 0.7019611001],
                [0.1734365005, 0.5722954354, 0.9707429515]],
    "ndf": [0.0474363776, 0.0080423457, 0.8026116745, 0.0187926697,
            0.1885230566, 0.1596020714],
    "lam": [1.1972360179e-01, 6.1837556454e-03, 3.1239518350e-05,
            2.3159188965e-04, 1.0381500220e-01, 3.2877147127e-01],
    "gcorr": [0.722698404, 0.9288572844, 0.9536990029, 0.9597544046,
              0.7216909926, 0.7446123873],
    "pbr_specular": [[0.0150722108, 0.0301477303, 0.0070250386],
                     [0.0030542751, 0.0051168, 0.0022671153],
                     [0.0019995507, 0.1303767672, 0.0458904783],
                     [0.0027742449, 0.0015565233, 0.0019421903],
                     [0.2196227954, 0.3189880645, 0.2428185968],
                     [0.0093369525, 0.0360153616, 0.0626662522]],
    "pbr_specular_dalpha": [[2.3128173080e-01], [1.7789066749e-01],
                            [-3.5672870568e-01], [2.1455911760e-01],
                            [-2.6049912204e+00], [4.7618016278e-04]],
}


def _a(name):
    return jnp.asarray(INPUTS[name], jnp.float32)


def test_lambert_golden():
    np.testing.assert_allclose(lambert(_a("nrm"), _a("wi")),
                               GOLDEN["lambert"], rtol=2e-5, atol=1e-7)


def test_frostbite_golden():
    got = frostbite_diffuse(_a("nrm"), _a("wi"), _a("wo"), _a("rough"))
    np.testing.assert_allclose(got, GOLDEN["frostbite"], rtol=2e-5)


def test_fresnel_golden():
    cos = jnp.abs(jnp.sum(_a("wo") * _a("wi"), -1, keepdims=True))
    got = fresnel_schlick(_a("col"), cos, f90=1.0)
    np.testing.assert_allclose(got, GOLDEN["fresnel"], rtol=2e-5)


def test_ndf_golden():
    cos = jnp.sum(_a("nrm") * _a("wi"), -1)
    got = eval_ggx_ndf(_a("alpha")[:, 0], cos)
    np.testing.assert_allclose(got, GOLDEN["ndf"], rtol=2e-5)


def test_lambda_golden():
    cos = jnp.sum(_a("nrm") * _a("wi"), -1)
    got = smith_ggx_lambda(_a("alpha")[:, 0], cos)
    np.testing.assert_allclose(got, GOLDEN["lam"], rtol=2e-4, atol=1e-7)


def test_masking_correlated_golden():
    ci = jnp.sum(_a("nrm") * _a("wi"), -1)
    co = jnp.sum(_a("nrm") * _a("wo"), -1)
    got = smith_ggx_g_correlated(_a("alpha")[:, 0], ci, co)
    np.testing.assert_allclose(got, GOLDEN["gcorr"], rtol=2e-5)


def test_pbr_specular_golden():
    got = pbr_specular(_a("col"), _a("nrm"), _a("wo"), _a("wi"), _a("alpha"))
    np.testing.assert_allclose(got, GOLDEN["pbr_specular"], rtol=5e-5,
                               atol=1e-7)


def test_pbr_specular_gradient_golden():
    """Gradients match the oracle too (the reference pattern compares
    CUDA vs python grads — here jnp-autodiff vs the torch oracle)."""
    def f(alpha):
        return pbr_specular(_a("col"), _a("nrm"), _a("wo"), _a("wi"),
                            alpha).sum()

    got = jax.grad(f)(_a("alpha"))
    np.testing.assert_allclose(got, GOLDEN["pbr_specular_dalpha"],
                               rtol=1e-3, atol=1e-6)
