"""Log-depth scan formulations of the reference's sequential bin sweeps.

The reference sweeps bins with first-order recurrences (energy slew smoothing,
signalsmith-stretch.h:816-848; formant envelope decay max/min passes,
:984-1007).  On TPU these become `lax.associative_scan`s:

  linear IIR      y_b = (1-s) y_{b-1} + s x_b      -> affine composition
  decay max       y_b = max(x_b, d y_{b-1})        -> (value, coef) max-plus
  decay min       y_b = min(x_b, d y_{b-1})        -> (value, coef) min-plus

Each element is (v, c) representing y -> op(v, c*y); composition is
  (v1,c1) then (v2,c2)  =  (op(v2, c2*v1), c2*c1)
with the coefficient product clamped to stay finite (the clamp only engages
once the initial value's contribution is far below/above every local term, so
results match the sequential sweep to float rounding).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_COEF_CLAMP = 1e20


def _cpp_min(a, b):
    """std::min(a, b) = (b < a) ? b : a — returns `a` when b is NaN.

    The formant envelope's inverse-decay pass runs with decay = 1/0 = inf
    when the pitch estimate is 0 (all-silent metric, reference :984-1007):
    the sequential C++ computes e*inf = NaN for e == 0 and std::min silently
    discards it (NaN < a is false).  jnp.minimum PROPAGATES NaNs, which
    turned silent-leading formant renders into all-NaN output — the where
    form reproduces the C++ selection exactly (including ±0 preference)."""
    return jnp.where(b < a, b, a)


def _cpp_max(a, b):
    """std::max(a, b) = (a < b) ? b : a — returns `a` when b is NaN."""
    return jnp.where(a < b, b, a)


def _use_shift_scan() -> bool:
    """Hillis-Steele shift form (closed-form level coefficients, one
    carried plane).  MEASURED REJECTION as the TPU default (round 5,
    tools/exp_formant.py at bench shapes): decay x8 193.3 ms shift vs
    99.1 ms associative — XLA's associative_scan lowering handles the
    minor axis fine, and Hillis-Steele's n*log n multiply/select work
    dominates the hoped-for relayout savings.  Kept behind
    SST_SHIFT_SCAN=1 with its equivalence tests; default associative on
    every backend."""
    import os
    return os.environ.get("SST_SHIFT_SCAN", "") == "1"


def _shift_right(x, k, fill):
    head = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([head, x[..., :-k]], -1)


def iir_forward(x: jnp.ndarray, init, slew) -> tuple:
    """y_b = y_{b-1} + (x_b - y_{b-1})*slew along the last axis.

    Returns (y, final) where final == y[..., -1].
    """
    if _use_shift_scan():
        B = x.shape[-1]
        a0 = jnp.float32(1.0 - slew)
        b = x * slew
        init_b = init[..., None] if jnp.ndim(init) else init
        b = jnp.concatenate([b[..., :1] + a0 * init_b, b[..., 1:]], -1)
        y = b
        ak = a0
        k = 1
        while k < B:
            y = y + ak * _shift_right(y, k, 0.0)
            ak = ak * ak
            k *= 2
        return y, y[..., -1]
    a = jnp.full_like(x, 1.0 - slew)
    b = x * slew

    def combine(l, r):
        return (r[0] * l[0], r[0] * l[1] + r[1])

    ca, cb = jax.lax.associative_scan(combine, (a, b), axis=-1)
    y = ca * init[..., None] + cb if jnp.ndim(init) else ca * init + cb
    return y, y[..., -1]


def iir_backward(x: jnp.ndarray, init, slew) -> tuple:
    y, fin = iir_forward(x[..., ::-1], init, slew)
    return y[..., ::-1], fin


def _decay_scan(x, init, coef, op):
    if _use_shift_scan():
        # y_b = op(x_b, d*y_{b-1}) as Hillis-Steele: level k folds in
        # values k bins back decayed by d^k (repeated squaring, clamped
        # like the associative form's coefficient product).  max/min are
        # idempotent so the inclusive-scan double-coverage is harmless,
        # and scaling by d^k >= 0 distributes over them.  The head fill is
        # op's identity; d = inf (silent-pitch inverse pass) follows the
        # same NaN-discard path as the associative form: op is the C++
        # min/max that drops NaNs.
        B = x.shape[-1]
        dk = (jnp.float32(coef) if jnp.ndim(coef) == 0
              else coef[..., None].astype(jnp.float32))
        dk = jnp.clip(dk, -_COEF_CLAMP, _COEF_CLAMP)
        fill = -jnp.inf if op is _cpp_max else jnp.inf
        init_b = init[..., None] if jnp.ndim(init) else init
        y = jnp.concatenate([op(x[..., :1], dk * init_b), x[..., 1:]], -1)
        k = 1
        while k < B:
            y = op(y, dk * _shift_right(y, k, fill))
            dk = jnp.clip(dk * dk, -_COEF_CLAMP, _COEF_CLAMP)
            k *= 2
        return y, y[..., -1]
    c = jnp.full_like(x, coef) if jnp.ndim(coef) == 0 else jnp.broadcast_to(
        coef[..., None], x.shape)

    def combine(l, r):
        v = op(r[0], r[1] * l[0])
        cc = jnp.clip(r[1] * l[1], -_COEF_CLAMP, _COEF_CLAMP)
        return (v, cc)

    cv, cc = jax.lax.associative_scan(combine, (x, c), axis=-1)
    init_b = init[..., None] if jnp.ndim(init) else init
    y = op(cv, cc * init_b)
    return y, y[..., -1]


def decay_max_forward(x, init, decay):
    """y_b = max(x_b, decay*y_{b-1}) along last axis -> (y, final)."""
    return _decay_scan(x, init, decay, _cpp_max)


def decay_max_backward(x, init, decay):
    y, fin = _decay_scan(x[..., ::-1], init, decay, _cpp_max)
    return y[..., ::-1], fin


def decay_min_forward(x, init, decay):
    return _decay_scan(x, init, decay, _cpp_min)


def decay_min_backward(x, init, decay):
    y, fin = _decay_scan(x[..., ::-1], init, decay, _cpp_min)
    return y[..., ::-1], fin
