from .wav import read_wav, write_wav, read_raw, write_raw  # noqa: F401
