"""STFT substrate properties: perfect reconstruction, half-bin layout."""
import jax.numpy as jnp
import pytest
import numpy as np

from signalsmith_stretch_tpu import StretchConfig
from signalsmith_stretch_tpu import stft


def test_wola_perfect_reconstruction():
    """Identity spectra through analysis+synthesis+WOLA reproduce the input."""
    cfg = StretchConfig(1, 800, 320)
    basis = stft.StftBasis.for_config(cfg)
    rng = np.random.default_rng(0)
    H, block = cfg.interval_samples, cfg.block_samples
    n_blocks = 24
    sig = rng.standard_normal(H * n_blocks + block).astype(np.float32)

    frames = np.stack([sig[k * H:k * H + block] for k in range(n_blocks)])
    spec = stft.analyze(jnp.asarray(frames)[:, None, :], basis)
    recon_blocks = np.asarray(stft.synthesize(spec, basis))[:, 0, :]

    ring_len = H * n_blocks + block
    ring = np.zeros(ring_len, np.float32)
    for k in range(n_blocks):
        ring[k * H:k * H + block] += recon_blocks[k]
    weight = stft.wola_weight(basis, ring_len, np.arange(n_blocks) * H)
    out = ring / weight

    # steady-state region: input delayed by one block relative to frame grid
    sl = slice(block, H * (n_blocks - 1))
    err = out[sl] - sig[sl]
    db = 10 * np.log10(np.mean(err ** 2) / np.mean(sig[sl] ** 2))
    assert db < -100, db


def test_half_bin_frequencies():
    cfg = StretchConfig(1, 800, 320)
    basis = stft.StftBasis.for_config(cfg)
    freqs = stft.band_freqs(basis)
    assert freqs.shape == (512,)
    assert np.isclose(freqs[0], 0.5 / 1024)
    assert np.isclose(freqs[-1], 511.5 / 1024)
    # a sinusoid exactly on a bin centre concentrates there
    b = 40
    n = np.arange(cfg.block_samples)
    x = np.cos(2 * np.pi * freqs[b] * n).astype(np.float32)
    spec = np.asarray(stft.analyze(jnp.asarray(x)[None, None, :], basis))[0, 0]
    assert np.argmax(np.abs(spec)) == b


@pytest.mark.parametrize("block,interval", [(5760, 1440), (4800, 1920),
                                            (4410, 1764)])
def test_matmul_dft_matches_fft(monkeypatch, block, interval):
    """The MXU two-stage matmul DFT (TPU path, SST_FFT_MODE=matmul) must
    match the jnp.fft reference path on both transforms, including the
    stage-1/stage-2 column truncation that folds the fft zero-pad into the
    contraction (block 5760 = 45*128 exactly; 4800 and 4410 need a partial
    N2-multiple pad).  f32 matmul at HIGHEST precision carries ~1e-6
    relative error vs the fft path."""
    import jax
    cfg = StretchConfig(2, block, interval)
    basis = stft.StftBasis.for_config(cfg)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.standard_normal((5, 2, block)).astype(np.float32))
    spec = jnp.asarray((rng.standard_normal((5, 2, basis.bands))
                        + 1j * rng.standard_normal((5, 2, basis.bands))
                        ).astype(np.complex64))

    def run():
        jax.clear_caches()
        return (np.asarray(stft.analyze(frames, basis)),
                np.asarray(stft.synthesize(spec, basis)))

    monkeypatch.setenv("SST_FFT_MODE", "fft")
    a_ref, y_ref = run()
    monkeypatch.setenv("SST_FFT_MODE", "matmul")
    a, y = run()
    assert np.abs(a - a_ref).max() / np.abs(a_ref).max() < 3e-6
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 3e-6
