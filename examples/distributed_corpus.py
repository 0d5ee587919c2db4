"""Multi-host corpus rendering over DCN (run the SAME program on every host).

Single host (uses all local chips):
    python examples/distributed_corpus.py out_dir clip1.wav clip2.wav ...

Multi-host (per host; audio never crosses DCN — each host loads and writes
only its own slice):
    SST_COORDINATOR=host0:8476 SST_NUM_PROCESSES=2 SST_PROCESS_ID=0 \\
        python examples/distributed_corpus.py out_dir *.wav
    SST_COORDINATOR=host0:8476 SST_NUM_PROCESSES=2 SST_PROCESS_ID=1 \\
        python examples/distributed_corpus.py out_dir *.wav

The reference processes one stream per engine instance (SURVEY.md §2.4);
this is the TPU-native corpus scale-out: DP over a global mesh, per-host
corpus sharding, bucketed compilation, prefetch overlap.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalsmith_stretch_tpu import engine, spectral
from signalsmith_stretch_tpu.config import StretchConfig
from signalsmith_stretch_tpu.io import corpus, wav
from signalsmith_stretch_tpu.parallel import batch as pbatch
from signalsmith_stretch_tpu.parallel import distributed as dist


def main():
    out_dir, paths = sys.argv[1], sorted(sys.argv[2:])
    time_factor = float(os.environ.get("SST_TIME", "1.25"))
    os.makedirs(out_dir, exist_ok=True)

    dist.initialize()        # no-op single-process
    mesh = dist.global_mesh()
    mine = dist.shard_items(paths)
    print(f"[{dist.process_index()}] {len(mine)}/{len(paths)} clips, "
          f"{mesh.devices.size} global devices")

    items = corpus.load_directory(mine, time_factor=time_factor)
    for b in corpus.batches(items, batch_size=8):
        rate, ch, pad_n = b["key"][0], b["key"][1], b["key"][2]
        out_n = int(round(pad_n * b["time_factor"]))
        cfg = StretchConfig.preset_default(ch, rate, False)
        plan = engine.build_exact_plan(cfg, pad_n, out_n)
        flags = spectral.SpectralFlags(False, False, False)
        fn = pbatch.batch_render(plan, flags, mesh=mesh)
        audio = np.asarray(b["audio"])
        # pad the local batch so the global batch divides the mesh
        n_dev = mesh.devices.size
        per_host = n_dev // max(1, dist.process_count())
        rem = (-audio.shape[0]) % max(1, per_host)
        if rem:
            audio = np.concatenate(
                [audio, np.zeros((rem,) + audio.shape[1:], audio.dtype)])
        seeds = np.arange(audio.shape[0], dtype=np.int32)
        x = dist.global_batch(audio, mesh)
        s = dist.global_batch(seeds, mesh)
        out = fn(x, spectral.Controls.make(), s)
        local = [shard.data for shard in out.addressable_shards]
        local = np.concatenate([np.asarray(a) for a in local], axis=0)
        for name, n_in, clip in zip(b["names"], b["lengths"], local):
            n_out = int(round(n_in * b["time_factor"]))
            dst = os.path.join(out_dir, os.path.basename(name))
            wav.write_wav(dst, clip[:, :n_out], rate)
            print(f"[{dist.process_index()}] {dst} ({n_out} samples)")


if __name__ == "__main__":
    main()
