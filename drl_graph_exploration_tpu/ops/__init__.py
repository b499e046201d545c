from . import ci_fold, neighbors  # noqa: F401
