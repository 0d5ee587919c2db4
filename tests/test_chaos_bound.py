"""The reference algorithm's intrinsic sensitivity (see docs/PARITY.md).

Perturbing the oracle's input by one ulp changes its own output far beyond
-60 dB in the mapped/stretched regimes; these tests pin that fact (and that
the identity path is stable), which justifies the chaos-relative parity gates.
"""
import numpy as np

from conftest import rel_err_db, run_oracle


def _sensitivity(oracle_bin, tmpdir, sig, rate, **case):
    a = run_oracle(oracle_bin, tmpdir, sig, rate, **case)
    pert = np.nextafter(sig, np.float32(np.inf)).astype(np.float32)
    b = run_oracle(oracle_bin, tmpdir, pert, rate, **case)
    return rel_err_db(a, b)


def test_identity_is_stable(oracle_bin, test_signal, tmp_path):
    sig, rate = test_signal
    db = _sensitivity(oracle_bin, str(tmp_path), sig, rate)
    assert db < -100, db


def test_mapped_regime_is_chaotic(oracle_bin, test_signal, tmp_path):
    sig, rate = test_signal
    db = _sensitivity(oracle_bin, str(tmp_path), sig, rate,
                      semitones=5, tonality=2000)
    # 1 ulp of input -> way past the naive -60 dB gate
    assert db > -60, db
