from . import a2c, dqn, replay  # noqa: F401
