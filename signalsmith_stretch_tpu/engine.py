"""Offline rendering engine: exact() as one compiled tensor program.

The reference's exact() (signalsmith-stretch.h:467-491) chains
outputSeek -> process -> flush over shared ring state.  Here the whole chain
becomes: static schedule (schedule.py) -> frame gather -> batched modified-FFT
analysis -> lax.scan of the spectral kernel over blocks -> batched inverse FFT
-> strided overlap-add -> WOLA-normalized assembly with the pre-roll
cancellation (outputSeek :198-203) and reversed-tail subtraction (flush
:444-454) as closed-form tensor ops.

The per-sample loop, step-split scheduler and ring buffers of the reference
are CPU-real-time idioms; on TPU the same semantics are static index
arithmetic around one scan (see SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import schedule as sched_mod
from . import spectral, stft
from .config import StretchConfig


@dataclasses.dataclass(frozen=True)
class ExactPlan:
    """Everything static needed to render one (config, in_len, out_len) shape."""
    cfg: StretchConfig
    sched: sched_mod.ExactSchedule
    basis: stft.StftBasis
    consts: spectral.SpectralConsts
    weight: np.ndarray          # [ring_len] float32, floored WOLA weights
    frame_idx: np.ndarray       # [nBlocks, block] timeline gather indices
    re_rows: np.ndarray         # indices of blocks needing re-analysis
    re_frame_idx: np.ndarray    # [nRe, block] gather indices for those
    arrays: dict                # per-block flag/factor arrays
    silence: "SilencePlan" = None


@dataclasses.dataclass(frozen=True)
class SilencePlan:
    """Static data for the silence bypass (signalsmith-stretch.h:240-278).

    In exact() the counter starts at 0 (reset, :56) so the pre-roll process
    always runs normally; the *main* process bypasses iff its whole input
    segment AND the pre-roll segment are sub-noisefloor and the pre-roll
    already pushed the counter past 2*block (surplus >= 2*block, i.e. heavy
    compression); the *flush* zero-input process bypasses iff the main
    segment was silent and the counter crosses 2*block by then.  Bypassed
    stages write passthrough/zeros directly, never touch the ring, and do
    not advance the output read head — so the bypass tails re-read a
    restricted-block ring at an un-advanced head.  All of that is static
    geometry; only the two energy scalars are traced.
    """
    possible: bool                      # any bypass statically reachable
    main_possible: bool                 # surplus >= 2*block
    flush_possible_pre: bool            # surplus + main_in >= 2*block
    flush_possible_alone: bool          # main_in >= 2*block
    pass_idx: np.ndarray                # [main_out] int32 into audio, or None
    # main-bypass tail: head stays at preroll_len; ring = preroll blocks only
    pre_spans: tuple                    # ((k, a, b, off), ...) block slices
    pre_weight: np.ndarray              # [2*T] float32 restricted WOLA weight
    # flush-bypass tail: head at L+main_out; ring = preroll+main blocks
    pm_spans: tuple
    pm_weight: np.ndarray


def _tail_window(basis: stft.StftBasis, out_pos: np.ndarray, ring_len: int,
                 w0: int, width: int):
    """Static contributions of the given blocks to ring[w0:w0+width]:
    spans (block row k, ring start a, ring end b, block-local offset) and the
    restricted floored WOLA weight over the window."""
    block = basis.block_samples
    spans = []
    for k, p in enumerate(out_pos):
        p = int(p)
        a, b = max(w0, p), min(w0 + width, p + block)
        if a < b:
            spans.append((k, a, b, a - p))
    weight = stft.wola_weight(basis, ring_len, out_pos)[w0:w0 + width]
    return tuple(spans), weight


def build_silence_plan(sch: sched_mod.ExactSchedule, basis: stft.StftBasis,
                       arrays: dict) -> SilencePlan:
    block = sch.cfg.block_samples
    main_possible = sch.surplus >= 2 * block and sch.main_out > 0
    flush_pre = sch.surplus + sch.main_in >= 2 * block
    flush_alone = sch.main_in >= 2 * block
    possible = (main_possible or
                ((flush_pre or flush_alone) and sch.flush_block_out > 0))
    if not possible:
        return SilencePlan(False, False, False, False, None, (),
                           np.zeros(0, np.float32), (), np.zeros(0, np.float32))
    L, T = sch.preroll_len, sch.tail_len
    # bypass passthrough: outputs[i] = inputs[seekLength + i % mainIn] (:253-256)
    if sch.main_in > 0:
        pass_idx = (sch.seek_length
                    + np.arange(sch.main_out, dtype=np.int64) % sch.main_in
                    ).astype(np.int32)
    else:
        pass_idx = None
    out_pos = arrays["out_pos"]
    n_pre, n_pm = sch.n_preroll_blocks, sch.n_preroll_blocks + sch.n_main_blocks
    pre_spans, pre_weight = _tail_window(basis, out_pos[:n_pre], sch.ring_len,
                                         L, 2 * T)
    pm_spans, pm_weight = _tail_window(basis, out_pos[:n_pm], sch.ring_len,
                                       L + sch.main_out, 2 * T)
    return SilencePlan(True, main_possible, flush_pre, flush_alone, pass_idx,
                       pre_spans, pre_weight, pm_spans, pm_weight)


def build_exact_plan(cfg: StretchConfig, in_samples: int,
                     out_samples: int) -> ExactPlan:
    sch = sched_mod.build_exact_schedule(cfg, in_samples, out_samples)
    basis = stft.StftBasis.for_config(cfg)
    consts = spectral.SpectralConsts.for_config(cfg)
    if not sch.valid:
        return ExactPlan(cfg, sch, basis, consts, np.zeros(1, np.float32),
                         np.zeros((0, 0), np.int32), np.zeros(0, np.int32),
                         np.zeros((0, 0), np.int32), {})
    arrays = sched_mod.block_arrays(sch)
    block = cfg.block_samples
    ends = arrays["analysis_end"]
    base = np.arange(block, dtype=np.int32)
    frame_idx = (ends[:, None] - block + base[None, :]).astype(np.int32)
    # analysis of the previous frame, one interval back (:335-341)
    re_rows = np.where(arrays["reanalyse"])[0].astype(np.int32)
    re_frame_idx = (ends[re_rows, None] - cfg.interval_samples - block
                    + base[None, :]).astype(np.int32)
    # frames may reach before the timeline start (conceptual zero history)
    weight = stft.wola_weight(basis, sch.ring_len, arrays["out_pos"])
    return ExactPlan(cfg, sch, basis, consts, weight, frame_idx, re_rows,
                     re_frame_idx, arrays,
                     silence=build_silence_plan(sch, basis, arrays))


def _build_timeline(audio: jnp.ndarray, plan: ExactPlan) -> jnp.ndarray:
    """audio [ch, in_samples] -> virtual input timeline [ch, timeline_len]."""
    ch = audio.shape[0]
    parts = []
    for seg in plan.sched.segments:
        if seg.kind == "zeros":
            parts.append(jnp.zeros((ch, seg.length), jnp.float32))
        else:
            parts.append(jax.lax.dynamic_slice_in_dim(
                audio, seg.src_offset, seg.length, axis=1).astype(jnp.float32))
    return jnp.concatenate(parts, axis=1)


def _overlap_add(blocks_t: jnp.ndarray, out_pos: np.ndarray,
                 ring_len: int, block: int, interval: int) -> jnp.ndarray:
    """blocks_t [ch, nB, block] -> ring [ch, ring_len] via group fold.

    Block placement is uniform every `interval` samples (the reference fires a
    block each interval of output, :281).  Blocks k = g, g+m, g+2m, ... (with
    m = ceil(block/interval)) are m*interval >= block apart, so within a group
    they never overlap: each group is just its blocks laid end to end (a free
    reshape when m*interval == block), and the ring is the sum of the m group
    strips at offsets first + g*interval.  This avoids reshaping to an
    [..., interval]-minor layout (interval is rarely a 128 multiple, and
    unaligned minor dims relayout at ~1/10 bandwidth on TPU).
    """
    ch, n_b, _ = blocks_t.shape
    first = int(out_pos[0])
    m = -(-block // interval)
    pad = m * interval - block
    total = jnp.zeros((ch, ring_len), jnp.float32)
    for g in range(m):
        grp = blocks_t[:, g::m]                    # [ch, n_g, block]
        n_g = grp.shape[1]
        if not n_g:
            continue
        if pad:
            grp = jnp.pad(grp, ((0, 0), (0, 0), (0, pad)))
        flat = grp.reshape(ch, n_g * m * interval)
        ofs = first + g * interval
        seg = max(0, min(n_g * m * interval, ring_len - ofs))
        if seg:
            total = total.at[:, ofs:ofs + seg].add(flat[:, :seg])
    return total


def gather_frames(timeline: jnp.ndarray, idx: np.ndarray,
                  block: int) -> jnp.ndarray:
    """Static window extraction: timeline [ch, T] -> frames [nB, ch, block].

    Frame starts are static -> static slices (fused memcpys), not gathers;
    starts may be negative for the first frames (conceptual zero history).
    Runs of uniform stride (the common constant-inputInterval case, e.g.
    every main block of a fixed-rate render) collapse to one reshape +
    ceil(block/stride)+1 shifted views instead of one slice per block —
    ~40x fewer HLO ops, which is most of the cold-compile cost of the
    static schedule."""
    ch_n = timeline.shape[0]
    starts = [int(s) for s in idx[:, 0]]
    n = len(starts)
    pieces = []
    k = 0
    while k < n:
        s0 = starts[k]
        j = k + 1
        stride = 0
        if s0 >= 0:
            while j < n:
                d = starts[j] - starts[j - 1]
                if d <= 0 or (stride and d != stride):
                    break
                stride = d
                j += 1
        run = j - k
        if run >= 8 and stride > 0:
            m = -(-block // stride) + 1
            need = (run + m - 1) * stride
            seg = timeline[:, s0:s0 + need]
            short = need - seg.shape[1]
            if short > 0:   # last rows reach past the timeline end; the
                # excess columns are sliced off below, zeros are fine
                seg = jnp.concatenate(
                    [seg, jnp.zeros((ch_n, short), jnp.float32)], axis=1)
            M = seg.reshape(ch_n, run + m - 1, stride)
            win = jnp.concatenate([M[:, i:i + run] for i in range(m)],
                                  axis=-1)[:, :, :block]
            pieces.append(jnp.moveaxis(win, 0, 1))    # [run, ch, block]
            k = j
        else:
            if s0 >= 0:
                row = timeline[:, s0:s0 + block]
            else:
                pad = jnp.zeros((ch_n, -s0), jnp.float32)
                row = jnp.concatenate([pad, timeline[:, 0:block + s0]], 1)
            pieces.append(row[None])
            k += 1
    return jnp.concatenate(pieces, axis=0)       # [nB, ch, block]


def analyze_stage(audio: jnp.ndarray, plan: ExactPlan, pair: bool = False):
    """Stage 1 of exact(): timeline + frame gathers + modified-FFT analysis.
    Returns (spectra, prev_spectra), both [nB, ch, B] complex64 — or, with
    pair=True, each as an f32 (re, im) plane pair (the TPU path: the matmul
    DFT computes planes natively and the wavefront planner consumes them, so
    complex64 never materializes; see wavefront.plan_spectral)."""
    timeline = _build_timeline(audio, plan)
    block = plan.cfg.block_samples
    nB = plan.frame_idx.shape[0]

    def per_plane(f):
        if len(plan.re_rows):
            # one combined gather + ONE batched FFT for main + re-analysis
            # frames: shares the timeline reads and doubles the DFT batch
            # (uniform-stride run collapsing applies to each half unchanged)
            all_idx = np.concatenate([plan.frame_idx, plan.re_frame_idx],
                                     axis=0)
            all_spec = f(gather_frames(timeline, all_idx, block))
            spectra = tuple(p[:nB] for p in all_spec)
            if len(plan.re_rows) == nB:   # fixed-rate renders reanalyse every
                prev = tuple(p[nB:] for p in all_spec)  # block: plain split
            else:
                rr = jnp.asarray(plan.re_rows)
                prev = tuple(jnp.zeros_like(s).at[rr].set(p[nB:])
                             for s, p in zip(spectra, all_spec))
        else:
            spectra = f(gather_frames(timeline, plan.frame_idx, block))
            prev = tuple(jnp.zeros_like(s) for s in spectra)
        return spectra, prev

    if pair:
        return per_plane(lambda fr: stft.analyze_pair(fr, plan.basis))
    spectra, prev = per_plane(lambda fr: (stft.analyze(fr, plan.basis),))
    return spectra[0], prev[0]


def spectral_stage(spectra, prev_spectra, plan: ExactPlan,
                   controls: spectral.Controls, flags: spectral.SpectralFlags,
                   seed=0, with_diag: bool = False):
    """Stage 2 of exact(): the spectral kernel over all blocks.

    Returns (re, im) float32 planes, each [ch, nB, B] — the sweep computes
    f32 pairs internally and the synthesis matmul iDFT consumes planes, so
    complex64 is never materialized at this boundary on TPU.  With
    with_diag=True returns (planes, violations) where violations counts
    windowed-interp taps zeroed for falling outside their capacity windows
    (always 0 unless a host bound is wrong; see wavefront.plan_spectral)."""
    mode = os.environ.get("SST_ENGINE", "wavefront")
    if mode == "wavefront":
        # batched precompute + diagonal sweep (wavefront.py); channels-major
        from . import wavefront
        return wavefront.spectral_all_blocks(
            spectra, prev_spectra, plan.arrays, controls, flags,
            plan.consts, seed, pair_out=True,
            with_diag=with_diag)                     # ([ch,nB,B], [ch,nB,B])
    else:
        # reference per-block scan (streaming-engine semantics)
        xs = spectral.BlockInputs(
            spectrum=spectra,
            prev_spectrum=prev_spectra,
            new_spectrum=jnp.asarray(plan.arrays["new_spectrum"]),
            reanalyse=jnp.asarray(plan.arrays["reanalyse"]),
            time_factor=jnp.asarray(plan.arrays["time_factor"]),
        )
        carry0 = spectral.SpectralCarry.initial(plan.consts, seed)

        def step(carry, x):
            return spectral.process_block(carry, x, controls, flags,
                                          plan.consts)

        _, out_specs = jax.lax.scan(step, carry0, xs)    # [nB, ch, B]
        out_specs = jnp.moveaxis(out_specs, 0, 1)        # [ch, nB, B]
    pair = (out_specs.real, out_specs.imag)
    if with_diag:   # the scan engine's gather paths have no capacity windows
        return pair, jnp.int32(0)
    return pair


def _bypass_tail(blocks_t, spans, weight, w0: int, T: int, L: int, preroll):
    """Flush tail (:444-454) read at an un-advanced head `w0` from a ring
    containing only the given block spans (bypassed stages never ran their
    synthesis steps).  The outputSeek pre-roll cancellation (:198-203) lives
    at ring [L, 2L) and is included where the window overlaps it."""
    ch = blocks_t.shape[0]
    buf = jnp.zeros((ch, 2 * T), jnp.float32)
    for k, a, b, off in spans:
        buf = buf.at[:, a - w0:b - w0].add(blocks_t[:, k, off:off + (b - a)])
    lo, hi = max(w0, L), min(w0 + 2 * T, 2 * L)
    if lo < hi:   # −preroll[L-1-(j-L)] at ring position j
        seg = preroll[:, 2 * L - hi:2 * L - lo][:, ::-1]
        buf = buf.at[:, lo - w0:hi - w0].add(-seg)
    t = buf / jnp.asarray(weight)
    return t[:, :T] - t[:, T:][:, ::-1]


def synthesis_stage(out_pair, plan: ExactPlan,
                    audio: jnp.ndarray = None,
                    silence_on=None) -> jnp.ndarray:
    """Stage 3 of exact(): inverse FFT + overlap-add + WOLA-normalized
    assembly (outputSeek pre-roll cancellation and flush-tail subtraction).
    `out_pair` is the (re, im) plane pair from spectral_stage.
    With `audio` given, the silence bypass (:240-278) is applied: scalar
    selects between the normal assembly and passthrough/zeros with
    restricted-ring tails (see SilencePlan).  `silence_on` optionally
    supplies the bypass enable as a TRACED argument (see the note below)."""
    cfg, sch = plan.cfg, plan.sched
    blocks_t = stft.synthesize_pair(out_pair[0], out_pair[1],
                                    plan.basis)          # [ch, nB, block]
    ring = _overlap_add(blocks_t, plan.arrays["out_pos"], sch.ring_len,
                        cfg.block_samples, cfg.interval_samples)

    w = jnp.asarray(plan.weight)
    L = sch.preroll_len
    preroll = ring[:, :L] / w[:L]
    # outputSeek: negate + reverse the pre-roll into the ring (:198-203)
    ring = ring.at[:, L:2 * L].add(-preroll[:, ::-1])
    main = ring[:, L:L + sch.main_out] / w[L:L + sch.main_out]
    fz0 = L + sch.main_out
    flush_zero = ring[:, fz0:fz0 + sch.flush_block_out] / w[fz0:fz0 + sch.flush_block_out]
    head = fz0 + sch.flush_block_out
    T = sch.tail_len
    tail_a = ring[:, head:head + T] / w[head:head + T]
    tail_b = ring[:, head + T:head + 2 * T] / w[head + T:head + 2 * T]
    tail = tail_a - tail_b[:, ::-1]

    sil = plan.silence
    if audio is not None and sil is not None and sil.possible:
        # SST_SILENCE=0 disables the bypass but MUST NOT change the compiled
        # program: removing the select region (or even flipping an embedded
        # literal — measured: XLA CPU's contraction choices vary with
        # unrelated earlier compiles in the same process) perturbs the
        # *shared* math at the 1e-5 level and breaks the bit-equality
        # contract between the on/off renders (tests/test_silence_exact.py).
        # The only airtight form is ONE executable with the enable as DATA:
        # jitted_render passes it as a traced argument; direct callers that
        # don't thread it (batched bench paths) fall back to a trace-time
        # literal behind an optimization barrier.
        if silence_on is not None:
            enabled = silence_on
        else:
            enabled = jax.lax.optimization_barrier(
                jnp.bool_(os.environ.get("SST_SILENCE", "1") != "0"))
        # total-energy scans (:231-238); f32 sums — the C++ accumulates in
        # sequential order, so inputs within ~1 ulp of noiseFloor may branch
        # differently (documented in docs/PARITY.md)
        nf = jnp.float32(1e-15)   # :508
        def seg_energy(start, length):
            if length <= 0:
                return jnp.float32(0)
            seg = audio[:, start:start + length].astype(jnp.float32)
            return jnp.sum(seg * seg)
        pre_silent = seg_energy(sch.seek_samples, sch.surplus) < nf
        main_silent = seg_energy(sch.seek_length, sch.main_in) < nf

        main_b = (main_silent & pre_silent & enabled) if sil.main_possible \
            else jnp.bool_(False)
        # counter at flush time: surplus (if pre silent) + main_in
        fp, fa = sil.flush_possible_pre, sil.flush_possible_alone
        if fp == fa:
            flush_b = main_silent & jnp.bool_(fp) & enabled
        else:   # only reachable when the pre-roll was silent too (fp, not fa)
            flush_b = main_silent & pre_silent & jnp.bool_(fp) & enabled

        if sil.pass_idx is not None:
            passthrough = jnp.take(audio, jnp.asarray(sil.pass_idx), axis=1)
        else:
            passthrough = jnp.zeros_like(main)
        main = jnp.where(main_b, passthrough, main)
        if sch.flush_block_out > 0:
            flush_zero = jnp.where(flush_b, jnp.zeros_like(flush_zero),
                                   flush_zero)
            tail_pm = _bypass_tail(blocks_t, sil.pm_spans, sil.pm_weight,
                                   L + sch.main_out, T, L, preroll)
            tail = jnp.where(flush_b, tail_pm, tail)
        if sil.main_possible and T > 0:
            tail_pre = _bypass_tail(blocks_t, sil.pre_spans, sil.pre_weight,
                                    L, T, L, preroll)
            tail = jnp.where(main_b, tail_pre, tail)
    return jnp.concatenate([main, flush_zero, tail], axis=1)


def render_exact(audio: jnp.ndarray, plan: ExactPlan,
                 controls: spectral.Controls, flags: spectral.SpectralFlags,
                 seed: int = 0, silence_on=None,
                 with_diag: bool = False) -> jnp.ndarray:
    """audio [ch, in_samples] float32 -> [ch, out_samples] float32.

    with_diag=True returns (audio_out, violations) — see spectral_stage."""
    if not plan.sched.valid:
        out = jnp.zeros((audio.shape[0], plan.sched.out_samples), jnp.float32)
        return (out, jnp.int32(0)) if with_diag else out
    # planar f32 spectra flow on the TPU wavefront path: the matmul DFT
    # emits (re, im) planes and the planner consumes them, so complex64
    # never materializes between analysis and the sweep (override with
    # SST_SPECTRA_PAIR=0/1; CPU keeps complex64 — its jnp.fft path is
    # complex anyway and the probe parity gates run there)
    pair = (os.environ.get("SST_SPECTRA_PAIR") or
            ("1" if jax.default_backend() != "cpu" else "0")) == "1"
    pair = pair and os.environ.get("SST_ENGINE", "wavefront") == "wavefront"
    spectra, prev_spectra = analyze_stage(audio, plan, pair=pair)
    out_specs = spectral_stage(spectra, prev_spectra, plan, controls, flags,
                               seed, with_diag=with_diag)
    viol = None
    if with_diag:
        out_specs, viol = out_specs
    out = synthesis_stage(out_specs, plan, audio=audio,
                          silence_on=silence_on)
    return (out, viol) if with_diag else out


def jitted_render(plan: ExactPlan, flags: spectral.SpectralFlags):
    """Compiled exact() renderer for one plan; vmap over a batch axis upstream.

    Single-clip path only: an ALL-ZERO clip short-circuits the whole
    spectral pipeline through lax.cond (the throughput side of the silence
    bypass, signalsmith-stretch.h:240-278).  The condition is total energy
    == 0, not the 1e-15 noise floor: sub-noisefloor-but-nonzero clips must
    keep the full path, whose traced bypass selects reproduce the
    reference's passthrough of those tiny values bit for bit.  For exact
    zeros every path — bypass passthrough, hard-zero flush, or the spectral
    path (zero spectra -> makeOutput scales by sqrt(0) -> 0) — produces
    exact zeros, so the shortcut is bit-identical (the sole corner: inputs
    whose f32 squares ALL underflow to zero, |x| < ~1e-19, also hit the
    zero branch; the reference's own f32 energy scan sees 0.0 there too and
    zeroes/bypasses, leaving at most an O(1e-19)-amplitude difference).
    Gated in tests/test_silence_exact.py.  (Batched renders keep the
    traced-select form: under vmap a cond becomes a select that would run
    BOTH branches.)
    """

    @jax.jit
    def run_impl(audio, controls, seed, silence_on):
        if not plan.sched.valid:
            return render_exact(audio, plan, controls, flags, seed,
                                silence_on, with_diag=True)
        # the cond shortcut is applied regardless of SST_SILENCE (which
        # gates only the traced region selects): it is exact on its own
        # terms (see the docstring)
        out_len = plan.sched.out_samples
        total = jnp.sum(audio.astype(jnp.float32) ** 2)
        return jax.lax.cond(
            total == jnp.float32(0),
            lambda a: (jnp.zeros((a.shape[0], out_len), jnp.float32),
                       jnp.int32(0)),
            lambda a: render_exact(a, plan, controls, flags, seed,
                                   silence_on, with_diag=True),
            audio)

    def run(audio, controls, seed=0):
        # the silence enable rides as a RUNTIME argument so SST_SILENCE=0/1
        # run the SAME executable — XLA's fma contraction is not stable
        # across even literal-only program changes (see synthesis_stage)
        # Returns (audio_out, violations): the interp-violation diagnostic
        # rides along so api.exact can refuse to silently ship a render
        # with zeroed out-of-window taps.
        return run_impl(audio, controls, seed,
                        np.bool_(os.environ.get("SST_SILENCE", "1") != "0"))

    return run
