"""BatchNorm folding for inference.

At eval time ``relu(BN(conv(x)))`` is exactly ``relu(conv'(x))`` with

    w' = w * scale / sqrt(var + eps)        (per output channel)
    b' = (b - mean) * scale / sqrt(var + eps) + bias

Folding removes every BN op (and its params/stats) from the serving path —
fewer HBM round trips and a shorter epilogue per conv.  Works on any of our
variable trees: each ``convN`` kernel with a sibling ``bnN`` is folded and
the ``bnN`` entries dropped.  The folded tree runs under the SAME module
definitions with ``fold_bn=True`` (blocks skip their BN call), so weight
names stay aligned.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ugpg_tpu.models.blocks import BN_EPS
from ugpg_tpu.progressive.transfer import flatten_tree, unflatten_tree

__all__ = ["fold_batchnorm"]


def fold_batchnorm(variables: Mapping[str, Any]) -> dict:
    """Return {'params': ...} with BN folded into the preceding convs.

    Input must contain 'params' and 'batch_stats'.  Every parameter path
    ``(..., convN, kernel)`` whose parent scope also holds ``bnN`` gets the
    fold; BN scopes are removed from the output.
    """
    params = flatten_tree(variables["params"])
    stats = flatten_tree(variables.get("batch_stats", {}))

    out: dict[tuple, Any] = {}
    for path, value in params.items():
        scope = path[:-1]  # (.., convN) or (.., bnN)
        leaf = path[-1]
        name = scope[-1] if scope else ""
        if name.startswith("bn"):
            continue  # consumed by the fold
        if name.startswith("conv") and name != "conv":
            bn_scope = scope[:-1] + ("bn" + name[len("conv"):],)
            scale = params.get(bn_scope + ("scale",))
            if scale is not None:
                bias = params[bn_scope + ("bias",)]
                mean = stats[bn_scope + ("mean",)]
                var = stats[bn_scope + ("var",)]
                factor = scale / jnp.sqrt(var + BN_EPS)
                if leaf == "kernel":
                    out[("params",) + path] = value * factor  # (..., out) broadcast
                elif leaf == "bias":
                    out[("params",) + path] = (value - mean) * factor + bias
                else:  # pragma: no cover
                    out[("params",) + path] = value
                continue
        out[("params",) + path] = value
    return unflatten_tree(out)
