"""User-facing API mirroring the reference `SignalsmithStretch` surface.

Control methods match signalsmith-stretch.h one-for-one:
  preset_default/preset_cheaper/configure        (:63-104)
  set_transpose_factor/set_transpose_semitones   (:107-117)
  set_freq_map                                   (:119-122)
  set_formant_factor/semitones/base              (:124-135)
  block_samples/interval_samples/latencies       (:42-47, 96-104)
  exact                                          (:467-491)

Offline rendering compiles one tensor program per (config, in_len, out_len)
shape; repeated calls with the same shape reuse the compiled executable.
Streaming process/seek/flush live in streaming.py.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import engine
from .config import StretchConfig
from .spectral import Controls, SpectralFlags


def _merge_bounds(bounds) -> Optional[float]:
    """Worst-case of several inv_grad_bound_for results: None (unbounded)
    poisons the merge so consumers fall back to the exact gather path."""
    out = None
    for b in bounds:
        if b is None:
            return None
        out = b if out is None else max(out, b)
    return out

f32 = np.float32


class SignalsmithStretch:
    def __init__(self, seed: int = 0, random_engine: Optional[Callable] = None):
        """`seed` mirrors the reference's seed ctor (signalsmith-stretch.h:39);
        `random_engine` mirrors its `RandomEngine` template parameter
        (:34-39, 610-616): a callable (key, shape, minval, maxval) -> float32
        draws, consumed only for the randomized binTimeFactors of >2x stretch.
        None = jax.random.uniform (seeded threefry)."""
        self._seed = seed
        self._random_engine = random_engine
        self._cfg: Optional[StretchConfig] = None
        self._freq_multiplier = f32(1)
        self._freq_tonality_limit = f32(0.5)
        self._custom_map: Optional[Callable] = None
        self._formant_multiplier = f32(1)
        self._formant_compensation = False
        self._formant_base_freq = f32(0)
        self._plan_cache = {}
        self._fn_cache = {}

    # ---- configuration ----------------------------------------------------
    def preset_default(self, channels: int, sample_rate: float,
                       split_computation: bool = False):
        self._cfg = StretchConfig.preset_default(channels, sample_rate,
                                                 split_computation)

    def preset_cheaper(self, channels: int, sample_rate: float,
                       split_computation: bool = True):
        self._cfg = StretchConfig.preset_cheaper(channels, sample_rate,
                                                 split_computation)

    def configure(self, channels: int, block_samples: int,
                  interval_samples: int, split_computation: bool = False):
        self._cfg = StretchConfig(channels, int(block_samples),
                                  int(interval_samples), split_computation)

    @property
    def config(self) -> StretchConfig:
        if self._cfg is None:
            raise RuntimeError("call preset_default/preset_cheaper/configure first")
        return self._cfg

    def block_samples(self) -> int:
        return self.config.block_samples

    def interval_samples(self) -> int:
        return self.config.interval_samples

    def split_computation(self) -> bool:
        return self.config.split_computation

    def input_latency(self) -> int:
        return self.config.input_latency

    def output_latency(self) -> int:
        return self.config.output_latency

    def seek_length(self) -> int:
        return self.config.seek_length

    def output_seek_length(self, playback_rate: float) -> int:
        return self.config.output_seek_length(f32(playback_rate))

    # ---- pitch / formant controls -----------------------------------------
    def set_transpose_factor(self, multiplier: float, tonality_limit: float = 0):
        self._freq_multiplier = f32(multiplier)
        if tonality_limit > 0:
            self._freq_tonality_limit = f32(
                f32(tonality_limit) / f32(math.sqrt(f32(multiplier))))
        else:
            self._freq_tonality_limit = f32(1)
        self._custom_map = None

    def set_transpose_semitones(self, semitones: float, tonality_limit: float = 0):
        self.set_transpose_factor(f32(2.0 ** (f32(semitones) / f32(12))),
                                  tonality_limit)

    def set_freq_map(self, input_to_output: Callable):
        """Custom monotonic frequency map (normalized cycles/sample), traced
        into the compiled program (reference :119-122)."""
        self._custom_map = input_to_output

    def set_formant_factor(self, multiplier: float, compensate_pitch: bool = False):
        self._formant_multiplier = f32(multiplier)
        self._formant_compensation = bool(compensate_pitch)

    def set_formant_semitones(self, semitones: float, compensate_pitch: bool = False):
        self.set_formant_factor(f32(2.0 ** (f32(semitones) / f32(12))),
                                compensate_pitch)

    def set_formant_base(self, base_freq: float = 0):
        self._formant_base_freq = f32(base_freq)

    # ---- traced controls / static flags -----------------------------------
    def _controls(self) -> Controls:
        return Controls(
            freq_multiplier=jnp.float32(self._freq_multiplier),
            freq_tonality_limit=jnp.float32(self._freq_tonality_limit),
            formant_multiplier=jnp.float32(self._formant_multiplier),
            inv_formant_multiplier=jnp.float32(f32(1) / self._formant_multiplier),
            formant_base_freq=jnp.float32(self._formant_base_freq),
        )

    def _flags(self) -> SpectralFlags:
        mapped = (self._custom_map is not None
                  or float(self._freq_multiplier) != 1.0)
        process_formants = (float(self._formant_multiplier) != 1.0
                            or (self._formant_compensation and mapped))
        from .spectral import inv_grad_bound_for
        return SpectralFlags(mapped=mapped, process_formants=process_formants,
                             formant_compensation=self._formant_compensation,
                             custom_map=self._custom_map,
                             formant_auto=float(self._formant_base_freq) <= 0,
                             random_engine=self._random_engine,
                             inv_grad_bound=inv_grad_bound_for(
                                 float(self._freq_multiplier),
                                 float(self._formant_multiplier),
                                 self._formant_compensation,
                                 has_custom_map=self._custom_map is not None,
                                 process_formants=process_formants))

    # ---- streaming (signalsmith-stretch.h:139-464) -------------------------
    def _stream(self):
        from .streaming import StreamingStretch
        flags = self._flags()
        key = ("stream", self.config, flags)
        eng = self._fn_cache.get(key)
        if eng is None:
            eng = StreamingStretch(self.config, self._controls(), flags,
                                   seed=self._seed)
            self._fn_cache[key] = eng
        else:
            eng.controls = self._controls()
        return eng

    def reset(self):
        if ("stream", self._cfg, self._flags()) in self._fn_cache:
            self._stream().reset(self._seed)

    def process(self, audio_in, output_samples: int) -> np.ndarray:
        """Streaming process() — state carries across calls (reference :209)."""
        return self._stream().process(audio_in, int(output_samples))

    def seek(self, audio_in, playback_rate: float):
        self._stream().seek(audio_in, playback_rate)

    def output_seek(self, audio_in):
        self._stream().output_seek(audio_in)

    def flush(self, output_samples: int, playback_rate: float = 0.0) -> np.ndarray:
        return self._stream().flush(int(output_samples), playback_rate)

    # ---- offline rendering -------------------------------------------------
    def exact(self, audio, output_samples: int,
              automation: Optional[dict] = None) -> Tuple[np.ndarray, bool]:
        """Whole-buffer render (reference exact(), :467-491).

        audio: [channels, input_samples] array.  Returns (output, ok); ok is
        False (and the output zero) when the input is shorter than
        outputSeekLength, matching the reference.

        `automation` varies controls over the render (the TPU-native form of
        the worklet's schedule() automation, BASELINE config #4): a dict with
        any of `semitones`, `transpose_factor`, `tonality_limit`,
        `formant_semitones`, `formant_base` mapping to a scalar, an array
        sampled at the render's block times, or a callable f(t_out_seconds)
        evaluated at each block's output time (needs `sample_rate=`).
        """
        audio = jnp.asarray(audio, jnp.float32)
        cfg = self.config
        if audio.ndim != 2 or audio.shape[0] != cfg.channels:
            raise ValueError(f"audio must be [channels={cfg.channels}, samples]")
        in_samples = int(audio.shape[1])
        key = (cfg, in_samples, int(output_samples))
        plan = self._plan_cache.get(key)
        if plan is None:
            plan = engine.build_exact_plan(cfg, in_samples, int(output_samples))
            self._plan_cache[key] = plan
        if not plan.sched.valid:
            return np.zeros((cfg.channels, int(output_samples)), np.float32), False
        if automation:
            controls, flags = self._automated(plan, automation)
            auto_key = True
        else:
            controls, flags = self._controls(), self._flags()
            auto_key = False
        fn_key = (key, flags, auto_key)
        fn = self._fn_cache.get(fn_key)
        if fn is None:
            fn = engine.jitted_render(plan, flags)
            self._fn_cache[fn_key] = fn
        out, viol = fn(audio, controls, self._seed)
        self.last_diagnostics = {"interp_violations": int(viol)}
        if self.last_diagnostics["interp_violations"]:
            import warnings
            warnings.warn(
                "render zeroed %d out-of-window interpolation taps — a "
                "host-side capacity bound is wrong; output is suspect"
                % self.last_diagnostics["interp_violations"])
        return np.asarray(out), True

    def block_output_times(self, plan_or_key) -> np.ndarray:
        """Output-sample index of each processing block for a plan."""
        return np.asarray(plan_or_key.arrays["out_pos"], np.int64)

    def _automated(self, plan, automation: dict):
        """Build per-block Controls from an automation dict."""
        n_b = len(plan.arrays["out_pos"])
        sr = automation.get("sample_rate", None)
        times = plan.arrays["out_pos"].astype(np.float64)
        if sr:
            times = times / float(sr)

        def series(value, default):
            if value is None:
                return np.full(n_b, default, f32)
            if callable(value):
                return np.asarray([value(t) for t in times], f32)
            arr = np.asarray(value, f32)
            if arr.ndim == 0:
                return np.full(n_b, arr, f32)
            if arr.shape != (n_b,):
                raise ValueError(f"automation arrays must have length {n_b} "
                                 f"(one value per block), got {arr.shape}")
            return arr

        if "transpose_factor" in automation:
            mult = series(automation["transpose_factor"], self._freq_multiplier)
        else:
            semis = series(automation.get("semitones"),
                           f32(12 * math.log2(float(self._freq_multiplier))))
            # bit-match set_transpose_semitones: double exp2 of f32(s)/f32(12)
            mult = np.exp2((semis.astype(f32) / f32(12)).astype(np.float64)
                           ).astype(f32)
        if "tonality_limit" in automation:
            tonality = series(automation["tonality_limit"], 0)
            limit = np.where(
                tonality > 0,
                (tonality.astype(f32)
                 / np.sqrt(mult.astype(np.float64)).astype(f32)).astype(f32),
                f32(1))
        else:
            limit = np.full(n_b, self._freq_tonality_limit, f32)
        fsemis = series(automation.get("formant_semitones"),
                        f32(12 * math.log2(float(self._formant_multiplier))))
        fm = np.exp2((fsemis.astype(f32) / f32(12)).astype(np.float64)
                     ).astype(f32)
        fbase = series(automation.get("formant_base"), self._formant_base_freq)

        mapped = bool((mult != 1).any()) or self._custom_map is not None
        process_formants = bool((fm != 1).any()) or (
            self._formant_compensation and mapped)
        from .spectral import inv_grad_bound_for
        flags = SpectralFlags(mapped=mapped, process_formants=process_formants,
                              formant_compensation=self._formant_compensation,
                              custom_map=self._custom_map,
                              formant_auto=bool((fbase <= 0).any()),
                              random_engine=self._random_engine,
                              # worst case over the automated range: the
                              # mapped slope peaks at mult.min(), the
                              # compensated formant slope at mult.max().
                              # Custom maps give None (unbounded -> gather)
                              # unless SST_INTERP_GRAD forces a bound.
                              inv_grad_bound=_merge_bounds(
                                  inv_grad_bound_for(
                                      float(m), float(fm.min()),
                                      self._formant_compensation,
                                      has_custom_map=self._custom_map is not None,
                                      process_formants=process_formants)
                                  for m in (mult.min(), mult.max())))
        controls = Controls(
            freq_multiplier=jnp.asarray(mult),
            freq_tonality_limit=jnp.asarray(limit.astype(f32)),
            formant_multiplier=jnp.asarray(fm),
            inv_formant_multiplier=jnp.asarray((f32(1) / fm).astype(f32)),
            formant_base_freq=jnp.asarray(fbase))
        return controls, flags
