"""Environment stack: world sim, belief backend, rasters, frontier/graph
extraction, macro-actions, rewards, planner, functional env."""

from . import (  # noqa: F401
    actions,
    belief,
    dubins,
    exploration_env,
    frontier,
    graph,
    planner,
    reward,
    virtual_map,
    world,
)
