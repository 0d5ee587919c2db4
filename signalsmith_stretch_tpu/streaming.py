"""Streaming engine: process/seek/outputSeek/flush with carried state.

Re-expresses the reference's streaming surface (signalsmith-stretch.h:139-464)
as jitted per-call programs over an explicit state pytree — the "checkpoint/
resume story" of SURVEY.md §5: all engine state (phase bands, input history,
output tail, counters) is a value, so streams can be stashed, duplicated and
resumed freely.

Ring buffers become linear per-call buffers:
  input   — the last block+interval+1 samples of history plus this call's
            input form a linear timeline; analysis frames gather from it.
  output  — the WOLA tail (block + 2*interval samples ahead of the read head)
            is carried; each call overlap-adds into [tail | zeros(n_out)] and
            returns the first n_out normalized samples.

Block scheduling inside a call is data-dependent (samplesSinceLast carries
across calls), so the per-call block loop is a masked lax.scan over the static
maximum block count, replicating the reference's float32 block arithmetic
(:281-325) with traced values.

Extreme time-compression (per-block input jumps > block+interval) takes the
reference's copyInput skip path (:215-229), which drops older ring history.
No special casing is needed here: analysis frames reach back at most
block+interval from the block's input offset, so neither engine ever reads
the dropped region — the linear timeline stays exact at any rate (gated by
test_stream_extreme_compression_parity).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spectral, stft
from .config import NOISE_FLOOR, StretchConfig

f32 = np.float32


class StreamState(NamedTuple):
    carry: spectral.SpectralCarry
    in_hist: jnp.ndarray        # [ch, block+H+1] float32 input history
    out_tail: jnp.ndarray       # [ch, block+2H] float32 WOLA signal tail
    weight_tail: jnp.ndarray    # [block+2H] float32 WOLA weight tail
    samples_since_last: jnp.ndarray   # int32
    prev_input_offset: jnp.ndarray    # int32
    did_seek: jnp.ndarray             # bool
    seek_time_factor: jnp.ndarray     # float32
    silence_counter: jnp.ndarray      # int32
    silence_first: jnp.ndarray        # bool


_BIG = np.int32(1 << 30)


def initial_state(cfg: StretchConfig, consts: spectral.SpectralConsts,
                  seed: int = 0) -> StreamState:
    """Fresh stream state.  Built under jit: eager complex-array creation is
    unimplemented on some backends (axon relay)."""
    import functools

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def build(ch, block, H, seed):
        return _initial_state_impl(ch, block, H, seed, consts)

    return build(cfg.channels, cfg.block_samples, cfg.interval_samples,
                 int(seed))


def _initial_state_impl(ch, block, H, seed, consts) -> StreamState:
    return StreamState(
        carry=spectral.SpectralCarry.initial(consts, seed),
        in_hist=jnp.zeros((ch, block + H + 1), jnp.float32),
        out_tail=jnp.zeros((ch, block + 2 * H), jnp.float32),
        weight_tail=jnp.zeros(block + 2 * H, jnp.float32),
        samples_since_last=jnp.asarray(_BIG),
        prev_input_offset=jnp.asarray(np.int32(-1)),
        did_seek=jnp.asarray(False),
        seek_time_factor=jnp.asarray(f32(1)),
        silence_counter=jnp.asarray(np.int32(0)),
        silence_first=jnp.asarray(True),
    )


def _round_f32(x):
    """std::round on float32 for non-negative values (:288)."""
    return jnp.floor(x + f32(0.5)).astype(jnp.int32)


def _process_impl(state: StreamState, audio_in: jnp.ndarray, n_out: int,
                  controls: spectral.Controls, flags: spectral.SpectralFlags,
                  cfg: StretchConfig, consts: spectral.SpectralConsts,
                  basis: stft.StftBasis) -> Tuple[StreamState, jnp.ndarray]:
    ch, block, H = cfg.channels, cfg.block_samples, cfg.interval_samples
    n_in = audio_in.shape[1]
    tail_len = block + 2 * H
    split_shift = H if cfg.split_computation else 0

    total_energy = jnp.sum(audio_in * audio_in)
    is_silent = total_energy < f32(NOISE_FLOOR)

    timeline = jnp.concatenate([state.in_hist, audio_in], axis=1)
    hist_base = block + H + 1
    new_hist = jax.lax.dynamic_slice_in_dim(
        timeline, timeline.shape[1] - hist_base, hist_base, axis=1)

    # ---------------- silence bypass (:240-278) ----------------------------
    def silent_path(st: StreamState):
        in_bypass = st.silence_counter >= 2 * block

        def bypass(st):
            carry = st.carry
            z = jnp.zeros_like(carry.input)
            cleared = st.silence_first  # first silent block clears bands
            carry = carry._replace(
                input=jnp.where(cleared, z, carry.input),
                prev_input=jnp.where(cleared, z, carry.prev_input),
                output=jnp.where(cleared, z, carry.output))
            ssl = jnp.where(cleared, _BIG, st.samples_since_last)
            if n_in > 0:
                idx = jnp.arange(n_out) % n_in
                out = audio_in[:, idx]
            else:
                out = jnp.zeros((ch, n_out), jnp.float32)
            st2 = st._replace(carry=carry, samples_since_last=ssl,
                              silence_first=jnp.asarray(False))
            return st2, out

        def count(st):
            st2 = st._replace(
                silence_counter=st.silence_counter + np.int32(n_in))
            return normal_path(st2)

        return jax.lax.cond(in_bypass, bypass, count, st)

    # ---------------- normal path (:280-419) -------------------------------
    def normal_path(st: StreamState):
        st = st._replace(silence_counter=jnp.where(is_silent, st.silence_counter,
                                                   np.int32(0)),
                         silence_first=jnp.where(is_silent, st.silence_first,
                                                 True))
        buf = jnp.concatenate(
            [st.out_tail, jnp.zeros((ch, n_out + block + H), jnp.float32)], 1)
        wbuf = jnp.concatenate(
            [st.weight_tail, jnp.zeros(n_out + block + H, jnp.float32)])

        ssl0 = jnp.minimum(st.samples_since_last, _BIG)
        o0 = jnp.where(ssl0 >= H, 0, H - ssl0).astype(jnp.int32)
        n_blocks = jnp.where(o0 < n_out, (n_out - o0 + H - 1) // H, 0)
        max_blocks = n_out // H + 1

        w2 = jnp.asarray((basis.window * basis.window).astype(np.float32))

        def block_body(loop, k):
            st, buf, wbuf = loop
            o_k = o0 + k * H
            valid = k < n_blocks
            input_offset = _round_f32(
                o_k.astype(jnp.float32) * f32(n_in) / f32(max(n_out, 1)))
            input_interval = input_offset - st.prev_input_offset
            new_spectrum = st.did_seek | (input_interval > 0)
            reanalyse = new_spectrum & (st.did_seek
                                        | (jnp.abs(input_interval - H) > 1))
            time_factor = jnp.where(
                st.did_seek, st.seek_time_factor,
                f32(H) / jnp.maximum(f32(1), input_interval.astype(jnp.float32)))

            head = hist_base + input_offset
            frame = jax.lax.dynamic_slice(
                timeline, (0, head - block), (ch, block))
            prev_frame = jax.lax.dynamic_slice(
                timeline, (0, head - H - block), (ch, block))
            spec = stft.analyze(frame, basis)
            prev_spec = stft.analyze(prev_frame, basis)

            xs = spectral.BlockInputs(spectrum=spec, prev_spectrum=prev_spec,
                                      new_spectrum=new_spectrum,
                                      reanalyse=reanalyse,
                                      time_factor=time_factor)
            carry2, out_spec = spectral.process_block(xs=xs, carry=st.carry,
                                                      controls=controls,
                                                      flags=flags,
                                                      consts=consts)
            block_t = stft.synthesize(out_spec, basis)   # [ch, block]
            pos = o_k + split_shift
            seg = jax.lax.dynamic_slice(buf, (0, pos), (ch, block))
            buf2 = jax.lax.dynamic_update_slice(buf, seg + block_t, (0, pos))
            wseg = jax.lax.dynamic_slice(wbuf, (pos,), (block,))
            wbuf2 = jax.lax.dynamic_update_slice(wbuf, wseg + w2, (pos,))

            sel = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(valid, x, y), a, b)
            st2 = st._replace(carry=carry2,
                              prev_input_offset=input_offset,
                              did_seek=jnp.asarray(False))
            return (sel(st2, st), sel(buf2, buf), sel(wbuf2, wbuf)), None

        (st, buf, wbuf), _ = jax.lax.scan(
            block_body, (st, buf, wbuf), jnp.arange(max_blocks))

        ssl_final = jnp.where(n_blocks > 0,
                              n_out - (o0 + (n_blocks - 1) * H),
                              jnp.minimum(ssl0 + n_out, _BIG))
        out = buf[:, :n_out] / jnp.maximum(wbuf[:n_out], f32(0.1))
        st = st._replace(
            out_tail=jax.lax.dynamic_slice(buf, (0, n_out), (ch, tail_len)),
            weight_tail=jax.lax.dynamic_slice(wbuf, (n_out,), (tail_len,)),
            samples_since_last=ssl_final.astype(jnp.int32),
            prev_input_offset=st.prev_input_offset - np.int32(n_in),
        )
        return st, out

    st2, out = jax.lax.cond(is_silent, silent_path, normal_path, state)
    st2 = st2._replace(in_hist=new_hist)
    return st2, out


def _seek_impl(state: StreamState, audio_in: jnp.ndarray,
               playback_rate: jnp.ndarray, cfg: StretchConfig,
               basis: stft.StftBasis) -> StreamState:
    """seek() (:139-165): prime the input history, latch the seek time factor."""
    ch, block, H = cfg.channels, cfg.block_samples, cfg.interval_samples
    n_in = audio_in.shape[1]
    buf_len = block + H
    if n_in >= buf_len:
        window = audio_in[:, n_in - buf_len:]
    else:
        window = jnp.concatenate(
            [jnp.zeros((ch, buf_len - n_in), jnp.float32), audio_in], 1)
    # history = last block+H+1 samples after writing the block+H window
    hist = jnp.concatenate([state.in_hist[:, -1:], window], axis=1)
    total_energy = jnp.sum(audio_in * audio_in)
    live = total_energy >= f32(NOISE_FLOOR)
    stf = jnp.where(playback_rate * f32(H) > 1,
                    f32(1) / playback_rate, f32(H))
    return state._replace(
        in_hist=hist,
        did_seek=jnp.asarray(True),
        seek_time_factor=stf.astype(jnp.float32),
        silence_counter=jnp.where(live, np.int32(0), state.silence_counter),
        silence_first=jnp.where(live, True, state.silence_first),
    )


@functools.partial(jax.jit, static_argnums=(2,))
def _add_preroll(state: StreamState, preroll, out_lat: int) -> StreamState:
    return state._replace(
        out_tail=state.out_tail.at[:, :out_lat].add(-preroll[:, ::-1]))


@jax.jit
def _flush_reset(state: StreamState) -> StreamState:
    return state._replace(
        out_tail=jnp.zeros_like(state.out_tail),
        weight_tail=jnp.zeros_like(state.weight_tail),
        in_hist=jnp.zeros_like(state.in_hist),
        carry=state.carry._replace(
            prev_input=jnp.zeros_like(state.carry.prev_input),
            output=jnp.zeros_like(state.carry.output)),
    )


class StreamingStretch:
    """Streaming facade bound to one configuration + control setting.

    Jitted per call-shape; state is an explicit pytree (checkpointable)."""

    def __init__(self, cfg: StretchConfig, controls: spectral.Controls,
                 flags: spectral.SpectralFlags, seed: int = 0):
        self.cfg = cfg
        self.controls = controls
        self.flags = flags
        self.basis = stft.StftBasis.for_config(cfg)
        self.consts = spectral.SpectralConsts.for_config(cfg)
        self.state = initial_state(cfg, self.consts, seed)
        self._process_cache = {}

    def reset(self, seed: int = 0):
        self.state = initial_state(self.cfg, self.consts, seed)

    # ---- process ----------------------------------------------------------
    def process(self, audio_in, n_out: int):
        audio_in = jnp.asarray(audio_in, jnp.float32)
        if audio_in.ndim != 2 or audio_in.shape[0] != self.cfg.channels:
            raise ValueError("audio_in must be [channels, samples]")
        key = (int(audio_in.shape[1]), int(n_out))
        fn = self._process_cache.get(key)
        if fn is None:
            cfg, consts, basis = self.cfg, self.consts, self.basis
            flags = self.flags

            @jax.jit
            def fn(state, x, controls):
                return _process_impl(state, x, n_out, controls, flags, cfg,
                                     consts, basis)

            self._process_cache[key] = fn
        self.state, out = fn(self.state, audio_in, self.controls)
        return np.asarray(out)

    # ---- seek -------------------------------------------------------------
    def seek(self, audio_in, playback_rate: float):
        audio_in = jnp.asarray(audio_in, jnp.float32)
        key = int(audio_in.shape[1])
        fn = self._process_cache.get(("seek", key))
        if fn is None:
            cfg, basis = self.cfg, self.basis

            @jax.jit
            def fn(state, x, rate):
                return _seek_impl(state, x, rate, cfg, basis)

            self._process_cache[("seek", key)] = fn
        self.state = fn(self.state, audio_in, jnp.float32(playback_rate))

    def seek_length(self) -> int:
        return self.cfg.seek_length

    # ---- outputSeek (:172-207) --------------------------------------------
    def output_seek(self, audio_in):
        audio_in = jnp.asarray(audio_in, jnp.float32)
        input_length = audio_in.shape[1]
        self.reset()
        out_lat = self.cfg.output_latency
        surplus = max(int(input_length) - self.cfg.input_latency, 0)
        playback_rate = f32(f32(surplus) / f32(out_lat))
        seek_samples = input_length - surplus
        self.seek(audio_in[:, :seek_samples], playback_rate)
        preroll = self.process(audio_in[:, seek_samples:], out_lat)
        # negate + reverse into the output tail (:198-203)
        self.state = _add_preroll(self.state, jnp.asarray(preroll.copy()),
                                  out_lat)

    def output_seek_length(self, playback_rate: float) -> int:
        return self.cfg.output_seek_length(playback_rate)

    # ---- flush (:426-464) --------------------------------------------------
    def flush(self, n_out: int, playback_rate: float = 0.0):
        H = self.cfg.interval_samples
        ch = self.cfg.channels
        out_block = max(0, n_out - H)
        parts = []
        if out_block > 0:
            zeros_in = int(f32(f32(out_block) * f32(playback_rate)))
            parts.append(self.process(
                np.zeros((ch, zeros_in), np.float32), out_block))
        tail = n_out - out_block
        sig = np.asarray(self.state.out_tail)
        w = np.maximum(np.asarray(self.state.weight_tail), f32(0.1))
        a = sig[:, :tail] / w[:tail]
        b = sig[:, tail:2 * tail] / w[tail:2 * tail]
        parts.append(a - b[:, ::-1])
        # full reset of rings + phase state (:456-463), keeping Band.input
        self.state = _flush_reset(self.state)
        return np.concatenate(parts, axis=1)

    # ---- batched multi-quantum dispatch -------------------------------------
    def process_many(self, histories, rates, n_out: int) -> np.ndarray:
        """Render M quanta in ONE device dispatch (the worklet's constant
        re-seek loop, web-wrapper.js:267-322, batched).

        histories: [M, ch, hist_len] — per-quantum seek windows (the buffer
        store history each re-seek would write); rates: [M] playback rates;
        n_out: output samples per quantum.  Equivalent to M sequential
        (seek(hist, rate); process(zeros, n_out)) calls — the spectral carry
        threads through the scan, so phase continuity across quanta is
        preserved — but pays ONE dispatch round-trip (~26 ms on this
        attachment) instead of 2M.  Returns [M, ch, n_out]."""
        histories = jnp.asarray(histories, jnp.float32)
        m, ch, hist_len = histories.shape
        rates = jnp.broadcast_to(jnp.asarray(rates, jnp.float32), (m,))
        key = ("many", hist_len, int(n_out))
        fn = self._process_cache.get(key)
        if fn is None:
            cfg, consts, basis = self.cfg, self.consts, self.basis
            flags = self.flags
            zeros_in = jnp.zeros((cfg.channels, 0), jnp.float32)

            @jax.jit
            def fn(state, hists, rs, controls):
                def body(st, x):
                    h, r = x
                    st = _seek_impl(st, h, r, cfg, basis)
                    st, out = _process_impl(st, zeros_in, n_out, controls,
                                            flags, cfg, consts, basis)
                    return st, out

                return jax.lax.scan(body, state, (hists, rs))

            self._process_cache[key] = fn
        self.state, outs = fn(self.state, histories, rates, self.controls)
        return np.asarray(outs)

    def process_many_live(self, inputs, n_out: int) -> np.ndarray:
        """M live-input quanta in one dispatch: inputs [M, ch, n] -> outputs
        [M, ch, n_out] (the wrapper's live mode, web-wrapper.js:255-266)."""
        inputs = jnp.asarray(inputs, jnp.float32)
        m, ch, n_in = inputs.shape
        key = ("many_live", n_in, int(n_out))
        fn = self._process_cache.get(key)
        if fn is None:
            cfg, consts, basis = self.cfg, self.consts, self.basis
            flags = self.flags

            @jax.jit
            def fn(state, xs, controls):
                def body(st, x):
                    return _process_impl(st, x, n_out, controls, flags, cfg,
                                         consts, basis)

                return jax.lax.scan(body, state, xs)

            self._process_cache[key] = fn
        self.state, outs = fn(self.state, inputs, self.controls)
        return np.asarray(outs)

    # ---- state checkpointing ----------------------------------------------
    def state_dict(self) -> dict:
        return jax.tree_util.tree_map(np.asarray, self.state)._asdict()

    def load_state_dict(self, d: dict):
        self.state = StreamState(**jax.tree_util.tree_map(jnp.asarray, d))
