from . import scan_ops  # noqa: F401
