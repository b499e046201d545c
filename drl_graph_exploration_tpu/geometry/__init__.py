from . import se2, halton  # noqa: F401
