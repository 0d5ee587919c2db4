"""Corpus-scale batched rendering over a device mesh (BASELINE config #5).

    python examples/batch_corpus.py 'clips/*.wav' out_dir 1.25
"""
import glob
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp
import numpy as np

from signalsmith_stretch_tpu.io import write_wav
from signalsmith_stretch_tpu.io.corpus import batches, load_directory
from signalsmith_stretch_tpu.models import StretchModel


def main():
    pattern, out_dir = sys.argv[1], sys.argv[2]
    time_factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    os.makedirs(out_dir, exist_ok=True)

    items = load_directory(sorted(glob.glob(pattern)),
                           time_factor=time_factor)
    models = {}
    for batch in batches(items, batch_size=16):
        rate, ch, in_len, tf, st = batch["key"]
        out_len = int(round(in_len * tf))
        key = batch["key"]
        if key not in models:
            models[key] = StretchModel.build(
                channels=ch, sample_rate=rate, in_samples=in_len,
                out_samples=out_len, semitones=st)
        out = np.asarray(models[key].batched(jnp.asarray(batch["audio"])))
        for i, name in enumerate(batch["names"]):
            n_out = int(round(batch["lengths"][i] * tf))
            dest = os.path.join(out_dir, os.path.basename(name))
            write_wav(dest, out[i, :, :n_out], rate)
            print(f"  {dest}")


if __name__ == "__main__":
    main()
