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
        got = host.read(32)
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
        first = host.read(8)
        host.stop()
        # drain: after the command lands, quanta are silence
        for _ in range(40):
            q = host.read(1)
            if not q.any():
                break
        assert not q.any()
        assert first.shape == (1, 8 * 128)
    finally:
        host.close()
