"""Neural (MLP) signed-distance models distilled from exact SDFs.

A model family beyond the reference (which has no learned representations;
SURVEY §2): continuous, smooth SDFs encoded in a small MLP and trained by
direct (value, gradient) supervision against any exact
:class:`~pytorch_volumetric_tpu.sdf.ObjectFrameSDF` — the library's own
mesh/cached/composed SDFs act as the ground-truth oracle, so "training data"
is free and exact.  In the spirit of iSDF (arXiv:2204.02296) and
robot-as-distance-field models (arXiv:2307.00533, arXiv:2406.01137), but
distillation replaces depth-fusion since we *have* the true field.

Two models:

- :class:`NeuralSDF` — ``f(x) -> d`` for a single rigid object.
- :class:`ConfigSpaceNeuralSDF` — ``f(q, x) -> d`` for an articulated robot,
  conditioned on the joint configuration; mirrors the
  :class:`~pytorch_volumetric_tpu.model_to_sdf.RobotSDF` query API
  (``set_joint_configuration`` + ``__call__``) so it is a drop-in
  approximate replacement with MXU-bound query cost independent of link
  count, triangle count, and voxel resolution.

TPU-first shape: queries are two/three ``[N, width] x [width, width]``
matmuls — MXU work, not gather work — so throughput is compute-bound and
scales with chip FLOPs where the cached-voxel path is pinned at the gather
issue rate.  Widths default to multiples of 128 (one MXU tile); training
runs as a single jitted ``lax.scan`` over minibatches of a precomputed
(point, value, gradient) dataset.  Gradients of the learned field come from
autodiff (``jax.vjp`` of the forward), so they are analytically consistent
with the values — smooth everywhere, unlike voxel staircase fields.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_volumetric_tpu.sdf import ObjectFrameSDF
from pytorch_volumetric_tpu.utils.batching import as_float_array

__all__ = [
    "NeuralSDF", "ConfigSpaceNeuralSDF", "fit_neural_sdf",
    "fit_config_space_sdf", "mlp_init", "mlp_forward", "fourier_features",
]


# ---------------------------------------------------------------------------
# persistence (npz, like every other cache in the library — SURVEY §5)
# ---------------------------------------------------------------------------

def _params_to_arrays(params) -> dict:
    out = {}
    for i, (W, b) in enumerate(params):
        out[f"W{i}"] = np.asarray(W)
        out[f"b{i}"] = np.asarray(b)
    out["n_layers"] = np.asarray(len(params))
    return out


def _params_from_arrays(d) -> list:
    n = int(d["n_layers"])
    return [(jnp.asarray(d[f"W{i}"]), jnp.asarray(d[f"b{i}"]))
            for i in range(n)]


def _check_kind(d, expected: str, path: str) -> None:
    kind = str(d["kind"]) if "kind" in d else "<missing>"
    if kind != expected:
        raise ValueError(
            f"{path} holds a '{kind}' model, not a '{expected}' "
            f"(use the matching class's .load)")


# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------

_ACTIVATIONS = ("sine", "relu")


def _check_activation(activation: str) -> None:
    if activation not in _ACTIVATIONS:
        raise ValueError(f"activation must be one of {_ACTIVATIONS}, "
                         f"got {activation!r}")


def fourier_features(x: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Random Fourier positional features ``[.., d] -> [.., 2K]``:
    ``(sin, cos)(2π x·B)``.  Low-dimensional inputs (3D points) starve a
    plain MLP of high-frequency capacity; the projection fixes that
    (Tancik et al.).  True-f32 projection: TPU default matmul precision is
    bf16 passes, and phase noise before a sine is amplified by the
    frequency — the repo-wide precision rule (CLAUDE.md) applies here."""
    proj = (2.0 * jnp.pi) * jnp.dot(x, B, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def mlp_init(key, in_dim: int, width: int, depth: int, out_dim: int = 1,
             w0: float = 30.0, activation: str = "sine"):
    """``activation="sine"``: SIREN-style init (Sitzmann et al.) — first
    layer ``U(-1/in, 1/in)`` scaled by ``w0`` at apply time, hidden layers
    ``U(-sqrt(6/n)/w0, sqrt(6/n)/w0)`` so post-activation statistics stay
    stationary.  ``activation="relu"``: He-normal init (the Fourier lift
    supplies the frequency content; Tancik et al.)."""
    _check_activation(activation)
    keys = jax.random.split(key, depth)
    params = []
    dims = [in_dim] + [width] * (depth - 1) + [out_dim]
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        if activation == "relu":
            if i == depth - 1:
                # small final layer: a He-scaled output head makes the
                # initial value/gradient loss enormous, and the clipped
                # optimizer then collapses the fit to a near-constant
                bound = math.sqrt(6.0 / din) / w0
                W = jax.random.uniform(keys[i], (din, dout), minval=-bound,
                                       maxval=bound, dtype=jnp.float32)
            else:
                W = (math.sqrt(2.0 / din) * jax.random.normal(
                    keys[i], (din, dout), dtype=jnp.float32))
        else:
            if i == 0:
                bound = 1.0 / din
            else:
                bound = math.sqrt(6.0 / din) / w0
            W = jax.random.uniform(keys[i], (din, dout), minval=-bound,
                                   maxval=bound, dtype=jnp.float32)
        b = jnp.zeros((dout,), dtype=jnp.float32)
        params.append((W, b))
    return params


def mlp_forward(params, x: jnp.ndarray, w0: float = 30.0,
                compute_dtype=jnp.float32,
                activation: str = "sine") -> jnp.ndarray:
    """MLP ``[.., in_dim] -> [..]``.  ``compute_dtype=jnp.bfloat16`` runs
    the matmuls on the MXU in bf16 with f32 accumulation (the last layer
    stays f32 — distances need the mantissa).

    ``activation``: ``"sine"`` (SIREN; smoothest fields) or ``"relu"``
    (~4x faster queries on TPU — transcendentals dominate the sine net's
    cost, measured 33.5 ms vs 8.1 ms for the bare matmul chain at 3M
    points — at slightly less smooth gradients).

    With f32 compute the matmuls request ``Precision.HIGHEST``: the TPU
    default decomposes f32 matmuls into bf16 passes, whose noise a sine
    network amplifies enough to stall training (observed: diverging fits on
    TPU that converge on CPU)."""
    _check_activation(activation)
    f32 = compute_dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32 else None
    relu = activation == "relu"
    h = x.astype(compute_dtype)
    for i, (W, b) in enumerate(params[:-1]):
        z = jnp.dot(h, W.astype(compute_dtype), precision=prec,
                    preferred_element_type=jnp.float32) + b
        h = jax.nn.relu(z) if relu else jnp.sin((w0 if i == 0 else 1.0) * z)
        h = h.astype(compute_dtype)
    W, b = params[-1]
    out = jnp.dot(h.astype(jnp.float32), W,
                  precision=jax.lax.Precision.HIGHEST) + b
    return out[..., 0]


# ---------------------------------------------------------------------------
# dataset: distillation samples from an exact SDF
# ---------------------------------------------------------------------------

def _sample_dataset(gt_sdf, key, bounds: np.ndarray, n_uniform: int,
                    n_near: int, near_sigma: float):
    """(points, values, gradients) drawn from ``gt_sdf``: uniform points in
    the padded AABB plus near-surface points made by projecting uniform
    samples onto the surface along the exact gradient and re-perturbing along
    it — the thin shell where SDF accuracy matters most."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lo = jnp.asarray(bounds[:, 0], dtype=jnp.float32)
    hi = jnp.asarray(bounds[:, 1], dtype=jnp.float32)
    xu = jax.random.uniform(k1, (n_uniform, 3), minval=lo, maxval=hi,
                            dtype=jnp.float32)
    vu, gu = gt_sdf.raw_query(xu)
    if n_near:
        seeds = jax.random.uniform(k4, (n_near, 3), minval=lo, maxval=hi,
                                   dtype=jnp.float32)
        vs, gs = gt_sdf.raw_query(seeds)
        surf = seeds - vs[:, None] * gs
        eps = near_sigma * jax.random.normal(k2, (n_near, 1),
                                             dtype=jnp.float32)
        xn = jnp.clip(surf + eps * gs, lo, hi)
        vn, gn = gt_sdf.raw_query(xn)
        x = jnp.concatenate([xu, xn])
        v = jnp.concatenate([vu, vn])
        g = jnp.concatenate([gu, gn])
    else:
        x, v, g = xu, vu, gu
    perm = jax.random.permutation(k3, x.shape[0])
    return x[perm], v[perm], g[perm]


def _fit(params, feats_fn, key, x, v, g, steps: int, batch: int, lr: float,
         grad_weight: float, w0: float, compute_dtype,
         activation: str = "sine"):
    """Adam on ``|f - d|² + grad_weight·|∇f - ∇d|²`` over random minibatches,
    one jitted ``lax.scan`` over steps (single dispatch).

    ``x [N, D]`` may carry extra leading input dims (e.g. joint values for
    the config-space model); the gradient term supervises only the LAST 3
    components (the spatial point) — ``∂f/∂q`` is free to be whatever the
    value fit implies."""
    import optax

    # cosine-decayed adam with global-norm clipping: sine networks keep
    # refining as the step size anneals, and clipping prevents the
    # mid-training collapse long fits otherwise hit on hard targets
    # (observed: a 12k-step robot fit whose loss ended above its start)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05)))

    def value_fn(p, pts):
        return mlp_forward(p, feats_fn(pts), w0=w0,
                           compute_dtype=compute_dtype,
                           activation=activation)

    def loss_fn(p, pts, d, dg):
        def scalar(pt):
            return value_fn(p, pt[None])[0]
        f, fg = jax.vmap(jax.value_and_grad(scalar))(pts)
        return (jnp.mean((f - d) ** 2)
                + grad_weight * jnp.mean(
                    jnp.sum((fg[..., -3:] - dg) ** 2, axis=-1)))

    N = x.shape[0]

    # the dataset rides in as jit ARGUMENTS, not closure constants: baked-in
    # constants duplicate HBM and bloat the persistent compile cache at
    # large n_samples (repo rule: CLAUDE.md "no GB-scale jit closure
    # constants")
    @jax.jit
    def train(params, key, x, v, g):
        opt_state = opt.init(params)

        def body(carry, k):
            p, s = carry
            idx = jax.random.randint(k, (batch,), 0, N)
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x[idx], v[idx], g[idx])
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, _), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, steps))
        return params, losses

    return train(params, key, x, v, g)


# ---------------------------------------------------------------------------
# single-object model
# ---------------------------------------------------------------------------

class NeuralSDF(ObjectFrameSDF):
    """MLP SDF ``f(x) -> d`` (query-side object; build with
    :func:`fit_neural_sdf`).  ``raw_query`` returns the autodiff gradient of
    the learned field, so ``(val, grad)`` are analytically consistent."""

    # learned fields are not eikonal-constrained between training samples;
    # utils.debug.checked_query reads this instead of the unit bound
    max_grad_norm_hint = 10.0

    def __init__(self, params, fourier_B: jnp.ndarray, bounds,
                 w0: float = 30.0, compute_dtype=jnp.float32,
                 activation: str = "sine"):
        self.params = params
        self.fourier_B = fourier_B
        self.bounds = np.asarray(bounds)
        self.w0 = w0
        self.activation = activation
        self.compute_dtype = compute_dtype

    def _features(self, pts):
        return fourier_features(pts, self.fourier_B)

    def value(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Values only — one pass, no VJP (cheapest; use for collision
        checks where gradients are unused)."""
        return mlp_forward(self.params, self._features(pts), w0=self.w0,
                           compute_dtype=self.compute_dtype,
                           activation=self.activation)

    def raw_query(self, points):
        val, vjp = jax.vjp(self.value, points)
        grad, = vjp(jnp.ones_like(val))
        return val, grad

    def _jitted(self):
        # weights as ARGUMENTS: a jit of raw_query would bake self.params in
        # as constants, silently serving stale weights after a fine-tune
        # reassigns model.params
        if self._jit_cache is None:
            def rq(params, pts):
                def v(p):
                    return mlp_forward(params, self._features(p), w0=self.w0,
                                       compute_dtype=self.compute_dtype,
                                       activation=self.activation)

                val, vjp = jax.vjp(v, pts)
                grad, = vjp(jnp.ones_like(val))
                return val, grad

            self._jit_cache = jax.jit(rq)
        return lambda pts: self._jit_cache(self.params, pts)

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        from pytorch_volumetric_tpu.sdf import pad_aabb
        return jnp.asarray(pad_aabb(self.bounds, padding, padding_ratio))

    def save(self, path: str) -> None:
        """Persist weights + metadata to ``.npz`` (fits are minutes of TPU
        time; like the voxel caches, never retrain in a warm restart)."""
        np.savez_compressed(path, kind="neural_sdf", w0=self.w0,
                            activation=self.activation,
                            fourier_B=np.asarray(self.fourier_B),
                            bounds=self.bounds,
                            bf16=self.compute_dtype == jnp.bfloat16,
                            **_params_to_arrays(self.params))

    @classmethod
    def load(cls, path: str) -> "NeuralSDF":
        with np.load(path, allow_pickle=False) as d:
            _check_kind(d, "neural_sdf", path)
            return cls(_params_from_arrays(d), jnp.asarray(d["fourier_B"]),
                       np.asarray(d["bounds"]), w0=float(d["w0"]),
                       compute_dtype=jnp.bfloat16 if bool(d["bf16"])
                       else jnp.float32,
                       activation=str(d["activation"]) if "activation" in d
                       else "sine")


def fit_neural_sdf(gt_sdf: ObjectFrameSDF, key, padding: float = 0.1,
                   width: int = 128, depth: int = 4, fourier: int = 64,
                   fourier_scale: float = 1.5, w0: float = 30.0,
                   n_samples: int = 200_000, near_fraction: float = 0.5,
                   near_sigma: float = 0.02, steps: int = 2000,
                   batch: int = 8192, lr: float = 2e-4,
                   grad_weight: float = 0.1, compute_dtype=jnp.float32,
                   activation: str = "sine") -> Tuple[NeuralSDF, jnp.ndarray]:
    """Distill ``gt_sdf`` into a :class:`NeuralSDF`; returns
    ``(model, per-step losses)``.

    The oracle is queried once to build an ``n_samples``-point dataset
    (``near_fraction`` of it concentrated in a ``near_sigma``-thick shell
    around the surface), then training is pure MLP work.  ``compute_dtype=
    jnp.bfloat16`` for TPU-speed training/query of larger nets."""
    bounds = np.asarray(gt_sdf.surface_bounding_box(padding=padding))
    k_b, k_d, k_i, k_t = jax.random.split(jax.random.PRNGKey(key)
                                          if isinstance(key, int) else key, 4)
    extent = float(np.max(bounds[:, 1] - bounds[:, 0]))
    B = fourier_scale / extent * jax.random.normal(
        k_b, (3, fourier), dtype=jnp.float32)
    n_near = int(n_samples * near_fraction)
    x, v, g = _sample_dataset(gt_sdf, k_d, bounds, n_samples - n_near,
                              n_near, near_sigma)
    params = mlp_init(k_i, 2 * fourier, width, depth, w0=w0,
                      activation=activation)
    feats = lambda pts: fourier_features(pts, B)
    params, losses = _fit(params, feats, k_t, x, v, g, steps, batch, lr,
                          grad_weight, w0, compute_dtype, activation)
    return NeuralSDF(params, B, bounds, w0=w0,
                     compute_dtype=compute_dtype,
                     activation=activation), losses


# ---------------------------------------------------------------------------
# configuration-space robot model
# ---------------------------------------------------------------------------

class ConfigSpaceNeuralSDF:
    """Joint-conditioned robot SDF ``f(q, x) -> d`` (arXiv:2309.16085,
    arXiv:2406.01137 family), distilled from an exact
    :class:`~pytorch_volumetric_tpu.model_to_sdf.RobotSDF` oracle.

    Query API mirrors ``RobotSDF``: ``set_joint_configuration([A×]M)`` then
    ``__call__(pts [B×]N×3) -> (val [A×][B×]N, grad …×3)``.  One forward is
    ``O(width²·depth)`` per (config, point) regardless of link/triangle/voxel
    counts — no FK, no per-link union, no gathers at query time — and it is
    differentiable in ``q`` through plain autodiff (the exact path
    differentiates through FK + voxel fields instead)."""

    def __init__(self, params, fourier_B, q_lo, q_hi, bounds,
                 w0: float = 30.0, compute_dtype=jnp.float32,
                 activation: str = "sine"):
        self.params = params
        self.fourier_B = fourier_B
        self.q_lo = jnp.asarray(q_lo, dtype=jnp.float32)
        self.q_hi = jnp.asarray(q_hi, dtype=jnp.float32)
        self.bounds = np.asarray(bounds)
        self.w0 = w0
        self.activation = activation
        self.compute_dtype = compute_dtype
        self._q = None
        self._query_jit = None

    # -- core field ---------------------------------------------------------
    def _features(self, q, pts):
        # normalize joints to [-1, 1]; Fourier-lift the point.  A locked
        # joint (lower == upper) would divide by zero and NaN every feature,
        # so clamp the span (the joint contributes a constant feature)
        span = jnp.maximum(self.q_hi - self.q_lo, 1e-6)
        qn = 2.0 * (q - self.q_lo) / span - 1.0
        ff = fourier_features(pts, self.fourier_B)
        qb = jnp.broadcast_to(qn, pts.shape[:-1] + qn.shape[-1:])
        return jnp.concatenate([qb, ff], axis=-1)

    def value(self, q: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
        """``f(q [M], pts [.., 3]) -> [..]`` — values only, one pass."""
        return mlp_forward(self.params, self._features(q, pts), w0=self.w0,
                           compute_dtype=self.compute_dtype,
                           activation=self.activation)

    def _query_with(self, params, q: jnp.ndarray, pts: jnp.ndarray):
        """Like :meth:`query` but with the weights as an explicit argument
        (jit-cache-safe: reassigning ``model.params`` after a fine-tune must
        not keep serving stale baked-in weights)."""

        def one(qi):
            def v(p):
                return mlp_forward(params, self._features(qi, p), w0=self.w0,
                                   compute_dtype=self.compute_dtype,
                                   activation=self.activation)

            val, vjp = jax.vjp(v, pts)
            grad, = vjp(jnp.ones_like(val))
            return val, grad

        return jax.vmap(one)(q)

    def query(self, q: jnp.ndarray, pts: jnp.ndarray):
        """``(q [A, M], pts [N, 3]) -> (val [A, N], grad [A, N, 3])`` with
        the spatial autodiff gradient."""
        return self._query_with(self.params, q, pts)

    # -- RobotSDF-compatible surface ---------------------------------------
    def set_joint_configuration(self, joint_config):
        """Accepts ``[A×]M`` like ``RobotSDF.set_joint_configuration``
        (arbitrary leading batch dims, or none)."""
        self._q = as_float_array(joint_config)
        return self

    def __call__(self, points_in_object_frame):
        """Matches ``RobotSDF.__call__`` shape contract: a 1-D joint config
        yields ``[B×]N`` outputs (no config dim), an ``[A×]M`` config yields
        ``[A×][B×]N``."""
        if self._q is None:
            raise RuntimeError("call set_joint_configuration first")
        pts = as_float_array(points_in_object_frame)
        pts_batch = pts.shape[:-1]
        flat = pts.reshape(-1, 3)
        A = self._q.shape[:-1]  # () for a single 1-D configuration
        q2 = self._q.reshape(-1, self._q.shape[-1])
        if self._query_jit is None:
            self._query_jit = jax.jit(self._query_with)
        val, grad = self._query_jit(self.params, q2, flat)
        return (val.reshape(A + pts_batch),
                grad.reshape(A + pts_batch + (3,)))

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        from pytorch_volumetric_tpu.sdf import pad_aabb
        return jnp.asarray(pad_aabb(self.bounds, padding, padding_ratio))

    def at_config(self, joint_config) -> "_ConfigBoundSDF":
        """The field at one fixed configuration, as a first-class
        :class:`~pytorch_volumetric_tpu.sdf.ObjectFrameSDF` — every protocol
        tool (``draw_sdf_slice``, ``get_voxel_view``, ``get_filtered_points``,
        ``outside_surface``, chamfer metrics) works on it directly."""
        q = as_float_array(joint_config)
        if q.ndim != 1:
            raise ValueError(f"at_config takes a single [M] configuration, "
                             f"got shape {q.shape}")
        return _ConfigBoundSDF(self, q)

    def save(self, path: str) -> None:
        """Persist weights + metadata to ``.npz`` (see :meth:`NeuralSDF.save`)."""
        np.savez_compressed(path, kind="config_space_neural_sdf", w0=self.w0,
                            activation=self.activation,
                            fourier_B=np.asarray(self.fourier_B),
                            q_lo=np.asarray(self.q_lo),
                            q_hi=np.asarray(self.q_hi), bounds=self.bounds,
                            bf16=self.compute_dtype == jnp.bfloat16,
                            **_params_to_arrays(self.params))

    @classmethod
    def load(cls, path: str) -> "ConfigSpaceNeuralSDF":
        with np.load(path, allow_pickle=False) as d:
            _check_kind(d, "config_space_neural_sdf", path)
            return cls(_params_from_arrays(d), jnp.asarray(d["fourier_B"]),
                       np.asarray(d["q_lo"]), np.asarray(d["q_hi"]),
                       np.asarray(d["bounds"]), w0=float(d["w0"]),
                       compute_dtype=jnp.bfloat16 if bool(d["bf16"])
                       else jnp.float32,
                       activation=str(d["activation"]) if "activation" in d
                       else "sine")


class _ConfigBoundSDF(ObjectFrameSDF):
    """``ConfigSpaceNeuralSDF`` pinned to one joint configuration (see
    :meth:`ConfigSpaceNeuralSDF.at_config`)."""

    max_grad_norm_hint = NeuralSDF.max_grad_norm_hint

    def __init__(self, model: ConfigSpaceNeuralSDF, q: jnp.ndarray):
        self.model = model
        self.q = q

    def raw_query(self, points):
        val, vjp = jax.vjp(lambda p: self.model.value(self.q, p), points)
        grad, = vjp(jnp.ones_like(val))
        return val, grad

    def _jitted(self):
        # share ONE compiled (q, pts) program across every bound view of
        # the parent model: a per-instance jit of raw_query would bake q in
        # as a closure constant and recompile for each new configuration
        # (a planner calls at_config per candidate q)
        model = self.model
        if getattr(model, "_bound_jit", None) is None:
            def qp(params, q, pts):
                def v(p):
                    return mlp_forward(params, model._features(q, p),
                                       w0=model.w0,
                                       compute_dtype=model.compute_dtype,
                                       activation=model.activation)

                val, vjp = jax.vjp(v, pts)
                grad, = vjp(jnp.ones_like(val))
                return val, grad

            model._bound_jit = jax.jit(qp)
        return lambda pts: model._bound_jit(model.params, self.q, pts)

    def surface_bounding_box(self, padding=0.0, padding_ratio=0.0):
        return self.model.surface_bounding_box(padding=padding,
                                               padding_ratio=padding_ratio)


def fit_config_space_sdf(robot_sdf, key, joint_limits=None,
                         workspace_bounds=None, padding: float = 0.2,
                         width: int = 256, depth: int = 5, fourier: int = 96,
                         fourier_scale: float = 1.5, w0: float = 30.0,
                         n_configs: int = 256, pts_per_config: int = 2048,
                         near_fraction: float = 0.5, near_sigma: float = 0.02,
                         steps: int = 4000, batch: int = 8192, lr: float = 2e-4,
                         grad_weight: float = 0.1, compute_dtype=jnp.float32,
                         activation: str = "sine"
                         ) -> Tuple[ConfigSpaceNeuralSDF, jnp.ndarray]:
    """Distill a ``RobotSDF`` into a :class:`ConfigSpaceNeuralSDF`.

    ``joint_limits [M, 2]`` default to the chain's parsed URDF limits
    (falling back to ±π where absent); ``workspace_bounds [3, 2]`` default
    to the union AABB over a probe batch of sampled configurations, padded.
    The oracle is queried once per sampled configuration (batched), then
    training is pure MLP work.  Returns ``(model, per-step losses)``."""
    key = jax.random.PRNGKey(key) if isinstance(key, int) else key
    k_q, k_x, k_b, k_i, k_t, k_p = jax.random.split(key, 6)

    if joint_limits is None:
        joint_limits = robot_sdf.chain.get_joint_limits()
    joint_limits = np.asarray(joint_limits, dtype=np.float32)
    q_lo, q_hi = joint_limits[:, 0], joint_limits[:, 1]
    M = q_lo.shape[0]

    qs = jax.random.uniform(k_q, (n_configs, M), minval=q_lo, maxval=q_hi,
                            dtype=jnp.float32)
    # the oracle sweep re-poses the robot; restore the caller's
    # configuration afterwards so distillation is side-effect free
    q_prev = getattr(robot_sdf, "q", None)
    robot_sdf.set_joint_configuration(qs)
    try:
        if workspace_bounds is None:
            bb = np.asarray(robot_sdf.surface_bounding_box())  # [A, 3, 2]
            workspace_bounds = np.stack([bb[..., 0].min(axis=0) - padding,
                                         bb[..., 1].max(axis=0) + padding], -1)
        workspace_bounds = np.asarray(workspace_bounds, dtype=np.float32)
        lo = jnp.asarray(workspace_bounds[:, 0])
        hi = jnp.asarray(workspace_bounds[:, 1])

        # one batched oracle sweep: uniform points (shared across configs),
        # then per-config near-surface refinement via the exact gradient
        # projection (dedicated seed points, so near_fraction may take any
        # value in [0, 1))
        n_near = int(pts_per_config * near_fraction)
        n_uni = pts_per_config - n_near
        k_x2 = jax.random.fold_in(k_x, 1)
        xu = jax.random.uniform(k_x, (n_uni, 3), minval=lo, maxval=hi,
                                dtype=jnp.float32)
        vu, gu = robot_sdf(xu)                 # [A, n_uni], [A, n_uni, 3]
        seeds = jax.random.uniform(k_x2, (n_near, 3), minval=lo, maxval=hi,
                                   dtype=jnp.float32)
        vs, gs = robot_sdf(seeds)              # [A, n_near], [A, n_near, 3]
        surf = seeds[None] - vs[..., None] * gs
        eps = near_sigma * jax.random.normal(k_p, (n_configs, n_near, 1),
                                             dtype=jnp.float32)
        xn = jnp.clip(surf + eps * gs, lo, hi)  # [A, n_near, 3]
        vn, gn = _per_config_query(robot_sdf, qs, xn)
    finally:
        # distillation must be side-effect free even when the sweep raises
        # (OOM mid-distillation would otherwise leave the robot re-posed to
        # the random training batch)
        robot_sdf.set_joint_configuration(q_prev)

    x_all = jnp.concatenate(
        [jnp.broadcast_to(xu, (n_configs, n_uni, 3)), xn], axis=1)
    v_all = jnp.concatenate([vu, vn], axis=1)
    g_all = jnp.concatenate([gu, gn], axis=1)
    q_all = jnp.repeat(qs[:, None], pts_per_config, axis=1)

    x = x_all.reshape(-1, 3)
    v = v_all.reshape(-1)
    g = g_all.reshape(-1, 3)
    qflat = q_all.reshape(-1, M)

    extent = float(np.max(workspace_bounds[:, 1] - workspace_bounds[:, 0]))
    B = fourier_scale / extent * jax.random.normal(k_b, (3, fourier),
                                                   dtype=jnp.float32)
    model = ConfigSpaceNeuralSDF(None, B, q_lo, q_hi, workspace_bounds,
                                 w0=w0, compute_dtype=compute_dtype,
                                 activation=activation)
    params = mlp_init(k_i, M + 2 * fourier, width, depth, w0=w0,
                      activation=activation)

    # fold q into the feature function by training on the concatenated
    # (q, x) dataset: reuse the generic _fit over a combined input
    qx = jnp.concatenate([qflat, x], axis=-1)

    def feats(qx_batch):
        q_b, x_b = qx_batch[..., :M], qx_batch[..., M:]
        return model._features(q_b, x_b)

    params, losses = _fit(params, feats, k_t, qx, v, g,
                          steps, batch, lr, grad_weight, w0, compute_dtype,
                          activation)
    model.params = params
    return model, losses


def _per_config_query(robot_sdf, qs: jnp.ndarray, pts: jnp.ndarray):
    """Evaluate row ``a`` of ``pts [A, P, 3]`` only under configuration
    ``qs[a]`` (the diagonal of the config×points product) by vmapping the
    fused functional query over (config, point-row) pairs — O(A·P), not the
    O(A²·P) the batched ``RobotSDF.__call__`` product would cost."""
    from pytorch_volumetric_tpu.sdf import compose_query

    children = tuple(s.raw_query for s in robot_sdf.sdf.sdfs)

    def one(q, p):
        m, m_inv = robot_sdf._link_transforms(q[None])
        vv, gg = compose_query(children, m, m_inv, 1, p)
        return vv[0], gg[0]

    return jax.vmap(one)(qs, pts)
