"""Cross-thread node host: the AudioWorklet MessagePort RPC analogue.

The reference splits its real-time wrapper across two threads: the engine
lives on the audio-render thread, and the main thread drives it through a
MessagePort RPC (web-wrapper.js:159-176 remoteMethods, :381-415 node facade)
with transferable buffers.  This module is the same topology in Python:

  - `WorkletHost` owns a `scheduler.StretchNode` on a dedicated render
    thread that pre-renders quanta into a bounded ring (the audio-callback
    consumer pulls from it with `read()` — never blocked by control work);
  - control methods (configure/schedule/start/stop/add_buffers/...) are
    marshalled to the render thread through a command queue and applied
    between quanta, exactly like postMessage'd RPC landing between
    process() calls;
  - the host starts suspended (AudioContext semantics): wire everything up,
    then `resume()` releases the render thread, so output quantum 0 is the
    schedule's output time 0;
  - `time` feedback flows back the other way (web-wrapper.js:104-105): the
    node's update callback posts [input_time] events onto a feedback queue
    drained by `poll_time()`.

Same-thread users should keep using `scheduler.StretchNode` directly; this
wrapper exists for hosts with a real-time consumer thread (sound-card
callback, network push) that must never run Python control code.
"""
from __future__ import annotations

import queue
import threading
from typing import List, Optional

import numpy as np

from .scheduler import StretchNode


class WorkletHost:
    def __init__(self, sample_rate: int, channels: int = 2,
                 quantum: int = 128, preset: str = "default",
                 buffer_quanta: int = 8, seed: int = 0,
                 batch_quanta: int = 1):
        """batch_quanta > 1 renders up to that many quanta per device
        dispatch on the render thread (scheduler.process_quanta), amortizing
        the fixed dispatch round-trip that a TPU-backed host cannot hide at
        quantum granularity; the ring still hands out single quanta.  Size
        buffer_quanta >= batch_quanta so a full batch fits the ring."""
        self._node = StretchNode(sample_rate, channels=channels,
                                 quantum=quantum, preset=preset, seed=seed)
        self.channels = channels
        self.quantum = quantum
        self.batch_quanta = max(1, int(batch_quanta))
        self._cmds: "queue.Queue[tuple]" = queue.Queue()
        self._ring: "queue.Queue[np.ndarray]" = queue.Queue(
            maxsize=buffer_quanta)
        self._times: "queue.Queue[float]" = queue.Queue()
        self._stop = threading.Event()
        self._running = threading.Event()
        self._node.set_update_interval(
            0.05, lambda t: self._times.put_nowait(t))
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ---- render thread -----------------------------------------------------
    def _run(self):
        while not self._stop.is_set():
            if not self._running.wait(timeout=0.05):
                # suspended: still drain control messages (wiring happens
                # before resume(), like an un-resumed AudioContext)
                self._drain_cmds()
                continue
            self._drain_cmds()
            if self.batch_quanta > 1:
                out = self._node.process_quanta(self.batch_quanta)
                quanta = [out[:, i * self.quantum:(i + 1) * self.quantum]
                          for i in range(self.batch_quanta)]
            else:
                quanta = [self._node.process_quantum()]
            for out in quanta:
                while not self._stop.is_set():
                    try:
                        self._ring.put(out, timeout=0.05)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    break

    def _drain_cmds(self):
        # apply queued control messages between quanta (the RPC landing
        # between process() calls)
        while True:
            try:
                name, args, kwargs, done = self._cmds.get_nowait()
            except queue.Empty:
                break
            try:
                getattr(self._node, name)(*args, **kwargs)
            finally:
                if done is not None:
                    done.set()

    # ---- consumer side (audio callback) -------------------------------------
    def read(self, n_quanta: int = 1, timeout: float = 5.0) -> np.ndarray:
        """Pull rendered quanta (blocks until available)."""
        outs: List[np.ndarray] = [self._ring.get(timeout=timeout)
                                  for _ in range(n_quanta)]
        return np.concatenate(outs, axis=1)

    def poll_time(self) -> Optional[float]:
        """Latest input-time feedback event, or None (['time', t] posts)."""
        t = None
        while True:
            try:
                t = self._times.get_nowait()
            except queue.Empty:
                return t

    # ---- control side (main thread) -----------------------------------------
    def _call(self, name, *args, wait: bool = False, **kwargs):
        done = threading.Event() if wait else None
        self._cmds.put((name, args, kwargs, done))
        if done is not None:
            done.wait(timeout=10.0)

    def resume(self):
        """Release the render thread (AudioContext.resume())."""
        self._running.set()

    def suspend(self):
        self._running.clear()

    def configure(self, **kwargs):
        self._call("configure", wait=True, **kwargs)

    def add_buffers(self, audio: np.ndarray):
        self._call("add_buffers", np.asarray(audio, np.float32), wait=True)

    def drop_buffers(self):
        self._call("drop_buffers", wait=True)

    def schedule(self, **kwargs):
        self._call("schedule", **kwargs)

    def start(self, **kwargs):
        self._call("start", **kwargs)

    def stop(self):
        self._call("stop")

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5.0)
        assert not self._thread.is_alive()
