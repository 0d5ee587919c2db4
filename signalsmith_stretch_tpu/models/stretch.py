"""The flagship model: the full stretch pipeline as one jittable callable.

Bundles (config, controls, flags, plan) into a functional "model" whose
forward pass maps [batch, ch, in_samples] -> [batch, ch, out_samples] — the
unit that bench.py, __graft_entry__ and the parallel layers instantiate.
"""
from __future__ import annotations

import dataclasses




import jax
import jax.numpy as jnp
import numpy as np

from .. import engine
from ..config import StretchConfig
from ..spectral import Controls, SpectralFlags


@dataclasses.dataclass
class StretchModel:
    cfg: StretchConfig
    controls: Controls
    flags: SpectralFlags
    in_samples: int
    out_samples: int
    plan: engine.ExactPlan = None

    def __post_init__(self):
        if self.plan is None:
            self.plan = engine.build_exact_plan(self.cfg, self.in_samples,
                                                self.out_samples)

    @classmethod
    def build(cls, channels: int, sample_rate: float, in_samples: int,
              out_samples: int, semitones: float = 0.0,
              tonality_hz: float = 0.0, formant_semitones: float = 0.0,
              formant_compensation: bool = False, formant_base_hz: float = 0.0,
              cheaper: bool = False, split: bool = False) -> "StretchModel":
        import math
        f32 = np.float32
        make = (StretchConfig.preset_cheaper if cheaper
                else StretchConfig.preset_default)
        cfg = make(channels, sample_rate, split)
        mult = f32(2.0 ** (f32(semitones) / f32(12)))
        limit = (f32(f32(tonality_hz / sample_rate) / f32(math.sqrt(mult)))
                 if tonality_hz > 0 else f32(1))
        fm = f32(2.0 ** (f32(formant_semitones) / f32(12)))
        controls = Controls(freq_multiplier=mult, freq_tonality_limit=limit,
                            formant_multiplier=fm,
                            inv_formant_multiplier=f32(1) / fm,
                            formant_base_freq=f32(formant_base_hz / sample_rate))
        from ..spectral import inv_grad_bound_for
        process_formants = (float(fm) != 1.0
                            or (formant_compensation and float(mult) != 1.0))
        flags = SpectralFlags(
            mapped=float(mult) != 1.0,
            process_formants=process_formants,
            formant_compensation=formant_compensation,
            formant_auto=formant_base_hz <= 0,
            inv_grad_bound=inv_grad_bound_for(
                float(mult), float(fm), formant_compensation,
                process_formants=process_formants))
        return cls(cfg=cfg, controls=controls, flags=flags,
                   in_samples=in_samples, out_samples=out_samples)

    def __call__(self, audio: jnp.ndarray, seed=0) -> jnp.ndarray:
        """Single clip [ch, in] -> [ch, out] (jit/vmap-friendly)."""
        return engine.render_exact(audio, self.plan, self.controls,
                                   self.flags, seed)

    def batched(self, audio: jnp.ndarray, seeds=None) -> jnp.ndarray:
        """[batch, ch, in] -> [batch, ch, out].

        Jitted (and cached on the model): an unjitted vmap dispatches
        primitive-by-primitive, which some TPU attachments reject for eager
        complex ops, and would retrace per call anyway.
        """
        if seeds is None:
            seeds = jnp.arange(audio.shape[0], dtype=jnp.int32)
        fn = getattr(self, "_batched_jit", None)
        if fn is None:
            fn = jax.jit(jax.vmap(lambda a, s: self(a, s)))
            object.__setattr__(self, "_batched_jit", fn)
        return fn(audio, seeds)
