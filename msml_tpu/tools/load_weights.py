"""Load pretrained weights into a train state.

Parity targets:
  * FRB pretrained load (`backbones/frb/iresnet.py:410-442`,
    `lightcnn.py:258-307`): overlay pretrained trunk weights, keep
    newly-initialised layers (FM ops etc.)
  * frozen peer load (`backbones/peer/arcface.py:199-237`)

Sources:
  * .npz produced by tools/export_frb.py (an msml_tpu-trained FRB)
  * .pth torch checkpoints (reference MSML `backbone.pth` or vanilla
    iresnet), transliterated via tools/import_torch.py

Config keys consumed by cli.train:
  * pretrained_backbone: path -> loaded into the frb (+ fm/osb/
    classification when the checkpoint has them)
  * peer_weights: path -> loaded into the frozen peer
"""

from __future__ import annotations

import logging
import os
from typing import Any, Tuple

import jax
import numpy as np

logger = logging.getLogger("msml_tpu")


def _load_source(path: str) -> Tuple[dict, dict]:
    """-> (params_tree, batch_stats_tree) covering some subset of MSML."""
    if path.endswith(".npz"):
        from msml_tpu.tools.export_frb import load_npz
        p, s = load_npz(path)
        return {"frb": p}, {"frb": s}
    if path.endswith((".pth", ".pt", ".tar")):
        import torch
        from msml_tpu.tools.import_torch import import_msml_checkpoint
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        if not any(k.startswith(("frb.", "osb.")) for k in sd):
            # vanilla iresnet .pth: treat as an frb trunk
            sd = {"frb." + k: v for k, v in sd.items()}
        return import_msml_checkpoint(sd)
    raise ValueError(f"unsupported weight file {path!r} (.npz or .pth)")


def _merge_subtree(params: dict, stats: dict, src_p: dict, src_s: dict,
                   src_key: str, dst_key: str) -> int:
    from msml_tpu.tools.import_torch import merge_into
    n = 0
    if src_key in src_p and dst_key in params:
        params[dst_key] = merge_into(params[dst_key], src_p[src_key])
        n += len(jax.tree.leaves(src_p[src_key]))
    if src_key in src_s and dst_key in stats:
        stats[dst_key] = merge_into(stats[dst_key], src_s[src_key])
    return n


def load_pretrained(state: Any, cfg) -> Any:
    """Overlay configured pretrained weights onto the state (no-op without
    the config keys; warns when a 'pretrained' recipe has no weights)."""
    backbone_path = cfg.get("pretrained_backbone", "")
    peer_path = cfg.get("peer_weights", "")
    if not backbone_path and not peer_path:
        if cfg.get("pretrained"):
            logger.warning(
                "cfg.pretrained is set but no pretrained_backbone/"
                "peer_weights path given — training from scratch while the "
                "pretrained LR groups (train.py:152-178) are in effect")
        return state

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    loaded = 0
    if backbone_path:
        if not os.path.exists(backbone_path):
            raise FileNotFoundError(backbone_path)
        src_p, src_s = _load_source(backbone_path)
        for key in ("frb", "osb", "classification", "fm_op0", "fm_op1",
                    "fm_op2", "fm_op3"):
            loaded += _merge_subtree(params, stats, src_p, src_s, key, key)
        logger.info("loaded %d pretrained backbone tensors from %s",
                    loaded, backbone_path)
    if peer_path:
        if not os.path.exists(peer_path):
            raise FileNotFoundError(peer_path)
        src_p, src_s = _load_source(peer_path)
        n = _merge_subtree(params, stats, src_p, src_s, "frb", "peer")
        n += _merge_subtree(params, stats, src_p, src_s, "peer", "peer")
        logger.info("loaded %d peer tensors from %s", n, peer_path)

    params = jax.tree.map(np.asarray, params)
    stats = jax.tree.map(np.asarray, stats)
    return state.replace(
        params=jax.device_put(params, _sharding_of(state.params)),
        batch_stats=jax.device_put(stats, _sharding_of(state.batch_stats)))


def _sharding_of(tree):
    return jax.tree.map(lambda x: x.sharding, tree)
