"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import rel_err_db

from signalsmith_stretch_tpu import spectral
from signalsmith_stretch_tpu.config import StretchConfig
from signalsmith_stretch_tpu.models import StretchModel
from signalsmith_stretch_tpu.parallel import batch as pbatch
from signalsmith_stretch_tpu.parallel.timechunk import stretch_long


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_batch_render_sharded_matches_single(test_signal):
    """DP over the mesh must produce the same audio as unsharded vmap."""
    sig, rate = test_signal
    from signalsmith_stretch_tpu import engine
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    plan = engine.build_exact_plan(cfg, 8000, 10000)
    flags = spectral.SpectralFlags(False, False, False)
    controls = spectral.Controls.make()

    rng = np.random.default_rng(0)
    clips = (sig[:, :8000][None] + 0.01 * rng.standard_normal((8, 1, 8000))
             ).astype(np.float32)
    seeds = jnp.arange(8, dtype=jnp.int32)

    plain = pbatch.batch_render(plan, flags)
    mesh = pbatch.make_mesh()
    sharded = pbatch.batch_render(plan, flags, mesh=mesh)

    a = np.asarray(plain(jnp.asarray(clips), controls, seeds))
    x = pbatch.shard_batch(jnp.asarray(clips), mesh)
    b = np.asarray(sharded(x, controls, seeds))
    # partitioned compilation reorders float ops slightly; gate in dB
    assert rel_err_db(b, a) < -55, rel_err_db(b, a)


def test_timechunk_long_clip(test_signal):
    """SP: chunked render must match a monolithic render structurally.

    Each chunk re-anchors with fresh phase state, so harmonic content can
    carry a constant phase slip (within one fundamental period) per chunk —
    the phase-vocoder's own seek mechanism has the same property.  The gate is
    therefore on short-time RMS envelopes at lag zero, not raw samples."""
    sig, rate = test_signal
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    controls = spectral.Controls.make()
    flags = spectral.SpectralFlags(False, False, False)

    out_samples = int(sig.shape[1] * 1.25)
    chunked = stretch_long(sig, out_samples, cfg, controls, flags, n_chunks=4)
    assert chunked.shape == (1, out_samples)

    model = StretchModel.build(channels=1, sample_rate=rate,
                               in_samples=sig.shape[1],
                               out_samples=out_samples, cheaper=True)
    mono = np.asarray(model(jnp.asarray(sig)))

    win = rate // 50  # 20 ms
    n = out_samples // win

    def env(x):
        return np.sqrt(np.mean(x[0, :n * win].reshape(n, win) ** 2, axis=1))

    e_c, e_m = env(chunked), env(mono)
    ratio_db = 20 * np.log10((e_c + 1e-9) / (e_m + 1e-9))
    # exclude windows straddling a re-anchor seam (brief interference as the
    # slipped phase crossfades against the previous chunk's tail)
    per = -(-out_samples // 4)
    seam = {b // win + d for b in (per, 2 * per, 3 * per) for d in (-1, 0, 1)}
    keep = [i for i in range(1, n - 1) if i not in seam]
    assert np.max(np.abs(ratio_db[keep])) < 1.5, ratio_db
    # and the first chunk (shared anchor with mono) matches at sample level
    db0 = rel_err_db(chunked[:, 2000:out_samples // 4 - 8],
                     mono[:, 2000:out_samples // 4 - 8])
    assert db0 < -19, db0


def test_timechunk_energy_profile(test_signal):
    """Chunk boundaries must not produce gaps or level jumps."""
    sig, rate = test_signal
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    out_samples = int(sig.shape[1] * 1.25)
    out = stretch_long(sig, out_samples, cfg, spectral.Controls.make(),
                       spectral.SpectralFlags(False, False, False), n_chunks=4)
    seg = out_samples // 8
    rms = [float(np.sqrt(np.mean(out[:, i*seg:(i+1)*seg] ** 2)))
           for i in range(1, 7)]
    assert min(rms) > 0.5 * max(rms), rms


def test_timechunk_sharded_matches_local(test_signal):
    """SP with the chunk axis sharded across the 8-device mesh must equal
    the local (unsharded vmap) chunked render at partition-noise level."""
    sig, rate = test_signal
    cfg = StretchConfig.preset_cheaper(1, rate, False)
    controls = spectral.Controls.make()
    flags = spectral.SpectralFlags(False, False, False)
    out_samples = int(sig.shape[1] * 1.25)

    local = stretch_long(sig, out_samples, cfg, controls, flags, n_chunks=8)
    mesh = pbatch.make_mesh()
    sharded = stretch_long(sig, out_samples, cfg, controls, flags,
                           n_chunks=8, mesh=mesh)
    assert sharded.shape == local.shape
    assert rel_err_db(np.asarray(sharded), np.asarray(local)) < -55
