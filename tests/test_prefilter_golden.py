"""Golden parity for the GGX prefilter cutoff (reference ops.py:428-443).

Expected values computed once with the reference's exact numpy recipe
(1e6-sample cumulative NDF energy, 99% cutoff) for the roughness ladder
the light model uses (0.08 -> 0.5 ramp + 1.0 final)."""

import numpy as np

from rise_sdf_tpu.ops.prefilter import ggx_cutoff_costheta, ndf_ggx

GOLDEN_CUTOFF = {
    0.08: 0.99976697,
    0.185: 0.99321244,
    0.29: 0.95501737,
    0.395: 0.80581940,
    0.5: 0.44621447,
    1.0: 0.01570576,
}


def test_cutoff_costheta_golden():
    for rough, want in GOLDEN_CUTOFF.items():
        got = ggx_cutoff_costheta(rough, 0.99)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"roughness {rough}")


def test_ndf_formula_golden():
    # spot values of the kernel NDF itself (alphaSqr = roughness^4)
    c = np.array([1.0, 0.9, 0.5, 0.1])
    got = ndf_ggx(0.3 ** 4, c)
    d = (c * 0.3 ** 4 - c) * c + 1.0
    want = 0.3 ** 4 / (d * d * np.pi)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # normalization direction: rougher -> flatter NDF at normal incidence
    assert ndf_ggx(0.1 ** 4, np.array([1.0]))[0] \
        > ndf_ggx(0.5 ** 4, np.array([1.0]))[0]
