#!/usr/bin/env python
"""Isolated costs of the formant stage's pieces at bench shapes.

The formant config (BASELINE #3) is the slowest mapped entry (270x vs the
400x ask); its extra work over pitch+12 is: the pitch estimator
(_top3_local_maxima + freqEstimate IIR), 8 full-width decay scans
(decay_max/min fwd/bwd x2 rounds), the envelope target interp, and the
energy-ratio scale.  Times each vmapped over batch on realistic data.
Reference: updateFormants, signalsmith-stretch.h:970-1036.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu import spectral
from signalsmith_stretch_tpu.ops import scan_ops
from signalsmith_stretch_tpu.ops.interp import (_WindowInterp,
                                                _window_geometry)
from tputime import timed

f32 = np.float32


def main():
    batch = int(os.environ.get("SST_PROF_BATCH", "32"))
    nB = int(os.environ.get("SST_NB", "418"))
    B = int(os.environ.get("SST_BANDS", "4096"))

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        metric = jax.random.uniform(k1, (batch, nB, B), jnp.float32) ** 2
        fe = jax.random.uniform(k2, (batch, nB), jnp.float32) * 40 + 10
        return metric, fe

    metric, freq_est = jax.block_until_ready(gen(jax.random.PRNGKey(0)))

    def estimator(m):
        def one(met):
            pe_est, weight = spectral._peak_estimate(
                *spectral._top3_local_maxima(met))
            few, _ = scan_ops.iir_forward(
                (pe_est.astype(jnp.float32) * weight)[None, :],
                jnp.float32(0), f32(0.25))
            fw, _ = scan_ops.iir_forward(weight[None, :], jnp.float32(0),
                                         f32(0.25))
            return jnp.sum(few[0] / (fw[0] + f32(1e-30)))
        return jnp.sum(jax.vmap(one)(m))

    def decay_scans(m, fe):
        def one(met, freq):
            decay = f32(1) - f32(1) / (freq * f32(0.5) + f32(1))
            env = met
            e = jnp.zeros(met.shape[0], jnp.float32)
            for _ in range(2):
                env, e = scan_ops.decay_max_backward(env, e, decay)
                env, e = scan_ops.decay_max_forward(env, e, decay)
            inv_decay = f32(1) / decay
            for _ in range(2):
                env, e = scan_ops.decay_min_backward(env, e, inv_decay)
                env, e = scan_ops.decay_min_forward(env, e, inv_decay)
            return jnp.sum(env)
        return jnp.sum(jax.vmap(one)(m, fe))

    geom = _window_geometry(4.0, 0.0)

    def env_interp(m):
        def one(env):
            fi = _WindowInterp(*geom)
            env_pad = jnp.concatenate(
                [env, jnp.zeros((nB, 128), env.dtype)], -1)
            tb = jnp.minimum(jnp.arange(B, dtype=jnp.float32) * f32(0.5),
                             f32(B))
            tbb = jnp.broadcast_to(tb, (nB, B))
            (v,) = fi([env_pad], tbb)
            return jnp.sum(v)
        return jnp.sum(jax.vmap(one)(m))

    def decay_chunked(m, fe):
        """EXPERIMENT: decayed max via per-chunk normalization — z = y/d^j
        turns the recurrence into a plain cummax within 128-bin chunks,
        plus a tiny cross-chunk carry scan.  Degenerate decays (0/inf)
        only occur on all-zero rows (silent formant), where both forms
        give 0 — product adoption would need that pinned."""
        CH = 128

        def one(met, freq):
            decay = f32(1) - f32(1) / (freq * f32(0.5) + f32(1))
            R, B = met.shape
            nc = B // CH
            j = jnp.arange(CH, dtype=jnp.float32)
            logd = jnp.log(decay)[:, None]
            dj = jnp.clip(jnp.exp(logd * j), 0, f32(1e20))      # [R, CH]
            inv = jnp.clip(jnp.exp(-logd * j), 0, f32(1e20))
            d128 = jnp.clip(jnp.exp(logd[:, 0] * CH), 0, f32(1e20))
            xv = met.reshape(R, nc, CH)
            z = jax.lax.cummax(xv * inv[:, None, :], axis=-1)
            ylocal = z * dj[:, None, :]
            ends = ylocal[..., -1]                              # [R, nc]

            def comb(l, r):
                return (jnp.where(l[0] * r[1] > r[0], l[0] * r[1], r[0]),
                        l[1] * r[1])

            E, _ = jax.lax.associative_scan(
                comb, (ends, jnp.broadcast_to(d128[:, None], ends.shape)),
                axis=-1)
            Eprev = jnp.concatenate(
                [jnp.zeros((R, 1), jnp.float32), E[:, :-1]], 1)
            carry = Eprev[..., None] * (dj * decay[:, None])[:, None, :]
            y = jnp.maximum(ylocal, carry)
            return jnp.sum(y)
        return jnp.sum(jax.vmap(one)(m, fe))

    for name, fn, args in [("estimator", estimator, (metric,)),
                           ("decay x8", decay_scans, (metric, freq_est)),
                           ("decay chunked x1", decay_chunked,
                            (metric, freq_est)),
                           ("env interp", env_interp, (metric,))]:
        dt, cs = timed(jax.jit(fn), *args)
        print(f"{name:10s} {dt*1e3:9.1f} ms (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
