"""Import the reference's shipped PyTorch checkpoints
(``/root/reference/data/torch_weights/*/MyModel.pt``) into our flax params.

The 2020-era PyG 1.x layouts:

* ``GCNConv``: ``weight`` (in, out) applied as ``x @ W`` before aggregation,
  ``bias`` added after aggregation — matching our :class:`~.gnn.GCNConv`.
* ``torch.nn.Linear``: ``weight`` (out, in) -> transpose.
* ``GatedGraphConv``: ``weight`` (num_layers, out, out) applied as
  ``x @ weight[i]``; ``rnn`` = ``torch.nn.GRUCell`` with ``weight_ih``
  (3H, H) -> transpose, biases kept.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy(), dtype=np.float32)


def load_state_dict(path: str) -> dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu")


def gcn_params_from_torch(sd: dict[str, Any]) -> dict:
    """Map a GCN / PolicyGCN / ValueGCN state_dict to flax params."""
    return {
        "params": {
            "conv1": {
                "lin": {"kernel": _t(sd["conv1.weight"])},
                "bias": _t(sd["conv1.bias"]),
            },
            "conv2": {
                "lin": {"kernel": _t(sd["conv2.weight"])},
                "bias": _t(sd["conv2.bias"]),
            },
            "fully_con1": {
                "kernel": _t(sd["fully_con1.weight"]).T,
                "bias": _t(sd["fully_con1.bias"]),
            },
        }
    }


def ggnn_params_from_torch(sd: dict[str, Any]) -> dict:
    """Map a GGNN / PolicyGGNN / ValueGGNN state_dict to flax params."""
    w = _t(sd["gconv1.weight"])  # (num_layers, out, out), applied as x @ W[i]
    params: dict[str, Any] = {
        "gconv1": {
            "rnn": {
                "ih": {
                    "kernel": _t(sd["gconv1.rnn.weight_ih"]).T,
                    "bias": _t(sd["gconv1.rnn.bias_ih"]),
                },
                "hh": {
                    "kernel": _t(sd["gconv1.rnn.weight_hh"]).T,
                    "bias": _t(sd["gconv1.rnn.bias_hh"]),
                },
            },
        },
        "fully_con1": {
            "kernel": _t(sd["fully_con1.weight"]).T,
            "bias": _t(sd["fully_con1.bias"]),
        },
    }
    for i in range(w.shape[0]):
        params["gconv1"][f"weight_{i}"] = {"kernel": w[i]}
    return {"params": params}


def graphunet_params_from_torch(sd: dict[str, Any], depth: int = 3) -> dict:
    """Map a GraphUNet / PolicyGraphUNet / ValueGraphUNet state_dict
    (``/root/reference/scripts/Networks.py:125-230``: ``down_convs.{i}``,
    ``pools.{i}.weight`` (1, C), ``up_convs.{i}``, ``fully_con1``) to flax
    params of :class:`~.gnn.GraphUNet`."""
    core: dict[str, Any] = {}
    for i in range(depth + 1):
        core[f"down_conv_{i}"] = {
            "lin": {"kernel": _t(sd[f"down_convs.{i}.weight"])},
            "bias": _t(sd[f"down_convs.{i}.bias"]),
        }
    for i in range(depth):
        core[f"pool_{i}"] = {"weight": _t(sd[f"pools.{i}.weight"]).reshape(-1)}
        core[f"up_conv_{i}"] = {
            "lin": {"kernel": _t(sd[f"up_convs.{i}.weight"])},
            "bias": _t(sd[f"up_convs.{i}.bias"]),
        }
    return {
        "params": {
            "core": core,
            "fully_con1": {
                "kernel": _t(sd["fully_con1.weight"]).T,
                "bias": _t(sd["fully_con1.bias"]),
            },
        }
    }
