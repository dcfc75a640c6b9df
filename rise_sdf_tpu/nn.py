"""Pure-functional NN building blocks (pytree params, jit-friendly).

TPU-native re-design of the reference's NN primitives
(``models/network_utils.py``): instead of stateful torch modules we use
plain parameter pytrees and pure ``apply`` functions so everything composes
under ``jax.jit`` / ``pjit``.  Covered semantics:

* ``VanillaMLP`` with geometric (sphere) init, weight normalization and
  Softplus(beta=100) activations (reference ``models/network_utils.py:109-157``).
* ``VanillaFrequency`` encoding with cosine-window progressive masking
  (reference ``models/network_utils.py:14-40``).
* Spherical-harmonics direction encoding (replaces
  ``tcnn.Encoding(SphericalHarmonics)``; inputs in [0,1] are mapped to
  [-1,1] like tiny-cuda-nn does).
* ``CompositeEncoding`` xyz passthrough (reference
  ``models/network_utils.py:71-88``).

The multiresolution hash grid lives in ``ops/hashgrid.py``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


# --------------------------------------------------------------------------- #
# Activations (reference models/utils.py:70-98)
# --------------------------------------------------------------------------- #


def trunc_exp(x):
    """exp with clamped input for stability (reference models/utils.py:54-69)."""
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name is None:
        return lambda x: x
    name = str(name).lower()
    if name in ("none", "identity"):
        return lambda x: x
    if name.startswith("scale"):
        s = float(name[5:])
        return lambda x: jnp.clip(x, 0.0, s) / s
    if name.startswith("clamp"):
        c = float(name[5:])
        return lambda x: jnp.clip(x, 0.0, c)
    if name.startswith("mul"):
        m = float(name[3:])
        return lambda x: x * m
    if name == "lin2srgb":
        return lambda x: jnp.clip(
            jnp.where(
                x > 0.0031308,
                jnp.power(jnp.clip(x, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
                12.92 * x,
            ),
            0.0,
            1.0,
        )
    if name == "trunc_exp":
        return trunc_exp
    if name.startswith("+") or name.startswith("-"):
        off = float(name)
        return lambda x: x + off
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return jax.nn.relu
    if name == "softplus":
        return jax.nn.softplus
    if name == "exp":
        return jnp.exp
    raise ValueError(f"Unknown activation '{name}'")


def softplus100(x):
    """Softplus with beta=100 (sphere-init activation), numerically stable."""
    return jax.nn.softplus(100.0 * x) / 100.0


# --------------------------------------------------------------------------- #
# MLP
# --------------------------------------------------------------------------- #


class MLP:
    """VanillaMLP equivalent.

    Params pytree: ``{'layers': [{'v','g','b'} or {'w','b'}, ...]}`` where
    weight-normalized layers store direction ``v`` [out,in] and gain ``g``
    [out] with effective weight ``w = v * (g / ||v||_row)``.
    """

    def __init__(self, dim_in: int, dim_out: int, config: Dict[str, Any]):
        self.dim_in = dim_in
        self.dim_out = dim_out
        self.n_neurons = int(config["n_neurons"])
        self.n_hidden_layers = int(config["n_hidden_layers"])
        self.sphere_init = bool(config.get("sphere_init", False))
        self.sphere_init_radius = float(config.get("sphere_init_radius", 0.5))
        self.inside_outside = bool(config.get("inside_outside", False))
        self.weight_norm = bool(config.get("weight_norm", False))
        self.output_activation = get_activation(config.get("output_activation"))
        # hidden activation: Softplus(100) under sphere init, else ReLU
        self.hidden_activation = softplus100 if self.sphere_init else jax.nn.relu
        # bf16 matmuls with f32 accumulation/params (MXU fast path);
        # params and outputs stay f32
        self.compute_dtype = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16,
        }[str(config.get("compute_dtype", "float32"))]
        dims = [dim_in] + [self.n_neurons] * self.n_hidden_layers + [dim_out]
        self.dims = dims

    # -- init --------------------------------------------------------------- #
    def _init_layer(self, key, d_in, d_out, is_first, is_last):
        wkey, _ = jax.random.split(key)
        if self.sphere_init:
            if is_last:
                mean = math.sqrt(math.pi) / math.sqrt(d_in)
                if self.inside_outside:
                    w = -mean + 1e-4 * jax.random.normal(wkey, (d_out, d_in))
                    b = jnp.full((d_out,), self.sphere_init_radius)
                else:
                    w = mean + 1e-4 * jax.random.normal(wkey, (d_out, d_in))
                    b = jnp.full((d_out,), -self.sphere_init_radius)
            elif is_first:
                w = jnp.zeros((d_out, d_in))
                w = w.at[:, :3].set(
                    math.sqrt(2.0) / math.sqrt(d_out)
                    * jax.random.normal(wkey, (d_out, 3))
                )
                b = jnp.zeros((d_out,))
            else:
                w = math.sqrt(2.0) / math.sqrt(d_out) * jax.random.normal(
                    wkey, (d_out, d_in)
                )
                b = jnp.zeros((d_out,))
        else:
            # kaiming uniform, fan_in mode with ReLU gain (torch default-ish)
            bound = math.sqrt(6.0 / d_in)
            w = jax.random.uniform(wkey, (d_out, d_in), minval=-bound, maxval=bound)
            b = jnp.zeros((d_out,))
        if self.weight_norm:
            g = jnp.linalg.norm(w, axis=1)
            return {"v": w.astype(jnp.float32), "g": g.astype(jnp.float32),
                    "b": b.astype(jnp.float32)}
        return {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}

    def init(self, key) -> Params:
        n_layers = len(self.dims) - 1
        keys = jax.random.split(key, n_layers)
        layers = []
        for i in range(n_layers):
            layers.append(
                self._init_layer(
                    keys[i], self.dims[i], self.dims[i + 1],
                    is_first=(i == 0), is_last=(i == n_layers - 1),
                )
            )
        return {"layers": layers}

    # -- apply -------------------------------------------------------------- #
    @staticmethod
    def _weight(layer):
        if "v" in layer:
            v = layer["v"]
            norm = jnp.linalg.norm(v, axis=1, keepdims=True)
            return v * (layer["g"][:, None] / jnp.maximum(norm, 1e-12))
        return layer["w"]

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        layers = params["layers"]
        cdt = self.compute_dtype
        h = x.astype(cdt) if cdt != jnp.float32 else x
        n = len(layers)
        for i, layer in enumerate(layers):
            w = self._weight(layer)
            if cdt != jnp.float32:
                h = jax.lax.dot_general(
                    h.astype(cdt), w.T.astype(cdt),
                    dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + layer["b"]
            else:
                h = h @ w.T + layer["b"]
            if i < n - 1:
                h = self.hidden_activation(h)
        return self.output_activation(h.astype(jnp.float32))

    def __call__(self, params, x):
        return self.apply(params, x)


class Identity:
    n_output_dims = None

    def init(self, key):
        return {}

    def apply(self, params, x):
        return x


# --------------------------------------------------------------------------- #
# Frequency encoding (reference models/network_utils.py:14-40)
# --------------------------------------------------------------------------- #


class FrequencyEncoding:
    def __init__(self, in_channels: int, config: Dict[str, Any]):
        self.n_freqs = int(config["n_frequencies"])
        self.n_input_dims = in_channels
        self.x_scale = float(config.get("x_scale", 1.0))
        self.x_offset = float(config.get("x_offset", 0.0))
        self.n_masking_step = int(config.get("n_masking_step", 0))
        self.freq_bands = 2.0 ** np.linspace(0, self.n_freqs - 1, self.n_freqs)
        self.n_output_dims = in_channels * 2 * self.n_freqs

    def init(self, key) -> Params:
        return {}

    def mask(self, step) -> jnp.ndarray:
        """Cosine-window progressive mask over frequencies, fn of step."""
        if self.n_masking_step <= 0:
            return jnp.ones((self.n_freqs,), dtype=jnp.float32)
        step = jnp.asarray(step, jnp.float32)
        arange = jnp.arange(self.n_freqs, dtype=jnp.float32)
        ptr = step / self.n_masking_step * self.n_freqs - arange
        return (1.0 - jnp.cos(math.pi * jnp.clip(ptr, 0.0, 1.0))) / 2.0

    def apply(self, params: Params, x: jnp.ndarray, step=None,
              **_kw) -> jnp.ndarray:
        x = x * self.x_scale + self.x_offset
        mask = self.mask(step if step is not None else self.n_masking_step + 1)
        outs = []
        for i, f in enumerate(self.freq_bands):
            outs.append(jnp.sin(f * x) * mask[i])
            outs.append(jnp.cos(f * x) * mask[i])
        return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------------- #
# Spherical harmonics encoding (replaces tcnn SH; real SH basis l<=4)
# --------------------------------------------------------------------------- #


def spherical_harmonics(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real spherical-harmonics basis for unit-ish ``dirs`` [..., 3].

    ``degree`` counts bands (degree=4 -> l in 0..3, 16 outputs; degree=5 ->
    25 outputs) matching tiny-cuda-nn's convention used by the reference
    configs (``configs/neus-blender.yaml:72``, ``split-mixed-occ``: degree 5).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    if degree >= 5:
        out += [
            2.5033429417967046 * xy * (xx - yy),
            -1.7701307697799304 * yz * (3.0 * xx - yy),
            0.94617469575756008 * xy * (7.0 * zz - 1.0),
            -0.66904654355728921 * yz * (3.0 - 7.0 * zz),
            -3.1735664074561294 * zz + 3.7024941420321507 * zz * zz
            + 0.31735664074561293,
            -0.66904654355728921 * xz * (3.0 - 7.0 * zz),
            0.47308734787878004 * (xx - yy) * (7.0 * zz - 1.0),
            -1.7701307697799304 * xz * (xx - 3.0 * yy),
            0.62583573544917614 * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    if degree >= 6:
        raise NotImplementedError("SH degree > 5 not implemented")
    return jnp.stack(out, axis=-1)


class SHEncoding:
    """Direction encoding; input expected in [0,1]^3 (tcnn convention)."""

    def __init__(self, in_channels: int, config: Dict[str, Any]):
        assert in_channels == 3
        self.degree = int(config["degree"])
        self.n_input_dims = 3
        self.n_output_dims = self.degree ** 2

    def init(self, key) -> Params:
        return {}

    def apply(self, params: Params, x: jnp.ndarray, step=None,
              **_kw) -> jnp.ndarray:
        d = x * 2.0 - 1.0
        return spherical_harmonics(d, self.degree)


# --------------------------------------------------------------------------- #
# Composite encoding + factory
# --------------------------------------------------------------------------- #


class CompositeEncoding:
    """Optionally prepend (scaled) xyz to the encoded features.

    Matches reference ``models/network_utils.py:71-88`` including the
    xyz-first ordering that the sphere-init MLP's first layer relies on.
    """

    def __init__(self, encoding, include_xyz=False, xyz_scale=2.0, xyz_offset=-1.0):
        self.encoding = encoding
        self.include_xyz = include_xyz
        self.xyz_scale = xyz_scale
        self.xyz_offset = xyz_offset
        self.n_input_dims = encoding.n_input_dims
        self.n_output_dims = (
            int(include_xyz) * encoding.n_input_dims + encoding.n_output_dims
        )

    def init(self, key) -> Params:
        return self.encoding.init(key)

    def apply(self, params, x, step=None, **kw):
        enc = self.encoding.apply(params, x, step, **kw)
        if not self.include_xyz:
            return enc
        return jnp.concatenate(
            [x * self.xyz_scale + self.xyz_offset, enc], axis=-1
        )


def get_encoding(n_input_dims: int, config) -> CompositeEncoding:
    otype = config["otype"]
    if otype == "VanillaFrequency":
        enc = FrequencyEncoding(n_input_dims, dict(config))
    elif otype == "SphericalHarmonics":
        enc = SHEncoding(n_input_dims, dict(config))
    elif otype in ("ProgressiveBandHashGrid", "HashGrid"):
        from .ops.hashgrid import HashGridEncoding

        enc = HashGridEncoding(n_input_dims, dict(config))
    else:
        raise ValueError(f"Unknown encoding otype '{otype}'")
    return CompositeEncoding(
        enc,
        include_xyz=bool(config.get("include_xyz", False)),
        xyz_scale=float(config.get("xyz_scale", 2.0)),
        xyz_offset=float(config.get("xyz_offset", -1.0)),
    )


def get_mlp(n_input_dims: int, n_output_dims: int, config) -> MLP:
    otype = config["otype"]
    if otype == "VanillaMLP":
        return MLP(n_input_dims, n_output_dims, dict(config))
    if otype == "Identity":
        return Identity()
    raise ValueError(f"Unknown MLP otype '{otype}'")
