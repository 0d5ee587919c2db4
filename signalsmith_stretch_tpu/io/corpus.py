"""Corpus pipeline: bucketing, padding and prefetch for batch rendering.

BASELINE config #5 is a 1000-clip corpus of mixed rates/shifts.  The compiled
engine is specialized per (in_len, out_len, flags), so the pipeline:

  1. loads clips (native codec when built),
  2. buckets them by (render settings, padded input length),
  3. yields device-resident batches with a background prefetch thread so the
     host->device transfer of batch k+1 overlaps the compute of batch k
     (the reference's closest analogue is the double-buffered stash/swap of
     ring states, signalsmith-stretch.h:293-297; here it is host I/O).

Multi-host: pass the full (deterministically ordered) item list through
`parallel.distributed.shard_items` before `batches()` so each host loads and
pads only its own corpus slice — clip audio never crosses DCN.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from .wav import read_wav

try:
    from .. import _sstio
except ImportError:  # pragma: no cover
    _sstio = None


@dataclasses.dataclass
class CorpusItem:
    audio: np.ndarray          # [ch, n] float32
    sample_rate: int
    name: str = ""
    time_factor: float = 1.0
    semitones: float = 0.0

    @property
    def seconds(self) -> float:
        return self.audio.shape[1] / self.sample_rate

    def stats(self) -> Tuple[float, float, float]:
        """(peak, rms, total_energy) — native scan when available."""
        if _sstio is not None:
            a = np.ascontiguousarray(self.audio, np.float32)
            return _sstio.scan_stats(a.tobytes(), a.shape[0])
        a = self.audio
        return (float(np.abs(a).max(initial=0.0)),
                float(np.sqrt(np.mean(a ** 2))) if a.size else 0.0,
                float(np.sum(a.astype(np.float64) ** 2)))


def load_directory(paths: Sequence[str], time_factor: float = 1.0,
                   semitones: float = 0.0) -> List[CorpusItem]:
    items = []
    for p in paths:
        audio, rate = read_wav(p)
        items.append(CorpusItem(audio=audio, sample_rate=rate, name=p,
                                time_factor=time_factor, semitones=semitones))
    return items


def _pad_len(n: int, granule: int) -> int:
    return -(-n // granule) * granule


def bucket(items: Sequence[CorpusItem], granule_seconds: float = 1.0
           ) -> Dict[tuple, List[CorpusItem]]:
    """Group by (rate, settings, padded length) so each bucket shares one
    compiled program."""
    buckets: Dict[tuple, List[CorpusItem]] = {}
    for it in items:
        granule = int(it.sample_rate * granule_seconds)
        key = (it.sample_rate, it.audio.shape[0],
               _pad_len(it.audio.shape[1], granule),
               round(it.time_factor, 6), round(it.semitones, 6))
        buckets.setdefault(key, []).append(it)
    return buckets


def batches(items: Sequence[CorpusItem], batch_size: int,
            granule_seconds: float = 1.0,
            prefetch: int = 2) -> Iterator[dict]:
    """Yield padded batches {key, audio [b, ch, n], names, lengths} with a
    background prefetch thread."""
    work: List[dict] = []
    for key, group in bucket(items, granule_seconds).items():
        pad_n = key[2]
        for i in range(0, len(group), batch_size):
            chunk = group[i:i + batch_size]
            arr = np.zeros((len(chunk), key[1], pad_n), np.float32)
            for j, it in enumerate(chunk):
                arr[j, :, :it.audio.shape[1]] = it.audio
            work.append(dict(key=key, audio=arr,
                             names=[c.name for c in chunk],
                             lengths=[c.audio.shape[1] for c in chunk],
                             time_factor=key[3], semitones=key[4]))

    if prefetch <= 0:
        yield from work
        return

    q: "queue.Queue[Optional[dict]]" = queue.Queue(maxsize=prefetch)

    def producer():
        try:
            import jax
            for w in work:
                w = dict(w)
                w["audio"] = jax.device_put(w["audio"])  # overlap H2D
                q.put(w)
        finally:
            q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        w = q.get()
        if w is None:
            break
        yield w
