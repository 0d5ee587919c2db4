"""Cross-thread worklet host (worklet.py): the MessagePort RPC analogue."""
import numpy as np

from signalsmith_stretch_tpu.scheduler import StretchNode
from signalsmith_stretch_tpu.worklet import WorkletHost


def test_worklet_host_matches_direct_node(test_signal):
    """Audio pulled through the render thread must equal the same schedule
    driven directly on a StretchNode (control ordering is the only
    difference, and both apply it before the first quantum)."""
    sig, rate = test_signal
    host = WorkletHost(rate, channels=1, quantum=128, preset="cheaper",
                       buffer_quanta=4)
    try:
        host.add_buffers(sig)
        host.start(input=0.0, rate=1.25, output=0.0)
        host.resume()             # AudioContext.resume(): quantum 0 = t 0
        got = host.read(32, timeout=120.0)
        t = host.poll_time()
    finally:
        host.close()

    node = StretchNode(rate, channels=1, quantum=128, preset="cheaper")
    node.add_buffers(sig)
    node.start(input=0.0, rate=1.25)
    want = node.render(32 * 128 / rate)
    np.testing.assert_array_equal(got, want)
    assert t is None or t >= 0.0


def test_worklet_control_between_quanta(test_signal):
    """stop() marshalled mid-stream takes effect on a later quantum without
    tearing (quanta are whole)."""
    sig, rate = test_signal
    host = WorkletHost(rate, channels=1, quantum=128, preset="cheaper",
                       buffer_quanta=2)
    try:
        host.add_buffers(sig)
        host.start(input=0.0, rate=1.0, output=0.0)
        host.resume()
        first = host.read(8, timeout=120.0)
        host.stop()
        # drain: after the command lands, quanta are silence
        for _ in range(40):
            q = host.read(1, timeout=120.0)
            if not q.any():
                break
        assert not q.any()
        assert first.shape == (1, 8 * 128)
    finally:
        host.close()


def test_batched_quanta_match_per_quantum(test_signal):
    """process_quanta (one dispatch per same-segment run) must reproduce the
    per-quantum loop: same history windows, re-seeks and carried state —
    gated chaos-tight since the scan body and the per-call program may
    contract fmas differently."""
    from conftest import rel_err_db
    sig, rate = test_signal

    def run(batched):
        node = StretchNode(rate, channels=1, quantum=128, preset="cheaper")
        node.add_buffers(sig)
        node.start(input=0.0, rate=1.25)
        node.schedule(output=24 * 128 / rate, input=0.5, rate=0.8)
        return node.render(48 * 128 / rate, batched=batched)

    a = run(False)
    b = run(True)
    assert a.shape == b.shape
    assert rel_err_db(b, a) < -60

    # live-input mode
    def run_live(batched):
        node = StretchNode(rate, channels=1, quantum=128, preset="cheaper")
        node.start(rate=1.0)
        return node.render(16 * 128 / rate, live_input=sig, batched=batched)

    la = run_live(False)
    lb = run_live(True)
    assert rel_err_db(lb, la) < -60

    # batched worklet host hands out identical-shape quanta
    host = WorkletHost(rate, channels=1, quantum=128, preset="cheaper",
                       buffer_quanta=8, batch_quanta=4)
    try:
        host.add_buffers(sig)
        host.start(input=0.0, rate=1.25, output=0.0)
        host.resume()
        got = host.read(16, timeout=120.0)
    finally:
        host.close()
    assert got.shape == (1, 16 * 128)
    assert np.isfinite(got).all()
