"""Checkpointing: orbax-native + legacy-format interop.

Three channels (SURVEY.md §5 checkpoint/resume):
- **orbax**: the native path — full TrainState (params, BN state, optimizer
  state, step) with atomic async-capable saves and resume;
- **Darknet .weights**: byte-compatible export/import lives in
  ``models.darknet`` (save/load_darknet_weights);
- **torch .pt**: RektNet checkpoints in the reference layout
  ``{epoch, model: state_dict, optimizer}`` (train_eval.py:103-110) so
  reference tooling can consume our training runs and vice versa.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_orbax(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, item=like)
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# RektNet torch interop
# ---------------------------------------------------------------------------

_RES_BN = ["bn1", "bn2", "shortcut_bn"]


def rektnet_params_to_state_dict(params, state):
    """Our pytree → reference ``KeypointNet`` state_dict (numpy tensors,
    torch naming: conv/bn/res{1..4}.{conv1,bn1,conv2,bn2,shortcut_conv,
    shortcut_bn}/out). Conv weights transpose HWIO→OIHW."""
    import torch

    sd = {}

    def put_conv(prefix, p):
        w_oihw = np.ascontiguousarray(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
        sd[f"{prefix}.weight"] = torch.from_numpy(w_oihw)
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["b"]))

    def put_bn(prefix, bn_p, bn_s):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(bn_p["scale"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(bn_p["bias"]))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(np.asarray(bn_s["mean"]))
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.asarray(bn_s["var"]))
        sd[f"{prefix}.num_batches_tracked"] = torch.zeros((), dtype=torch.int64)

    put_conv("conv", {"w": params["stem"]["w"], "b": params["stem"]["b"]})
    put_bn("bn", params["stem"]["bn"], state["stem"])
    for i in range(1, 5):
        p, s = params[f"res{i}"], state[f"res{i}"]
        put_conv(f"res{i}.conv1", p["conv1"])
        put_bn(f"res{i}.bn1", p["bn1"], s["bn1"])
        put_conv(f"res{i}.conv2", p["conv2"])
        put_bn(f"res{i}.bn2", p["bn2"], s["bn2"])
        put_conv(f"res{i}.shortcut_conv", p["shortcut_conv"])
        put_bn(f"res{i}.shortcut_bn", p["shortcut_bn"], s["shortcut_bn"])
    put_conv("out", params["out"])
    return sd


def save_rektnet_pt(path: str, params, state, epoch: int = 0,
                    optimizer_state=None) -> None:
    """Write a reference-layout ``.pt`` checkpoint (train_eval.py:103-110)."""
    import torch

    ckpt = {
        "epoch": epoch,
        "model": rektnet_params_to_state_dict(params, state),
        "optimizer": optimizer_state if optimizer_state is not None else {},
    }
    torch.save(ckpt, path)
