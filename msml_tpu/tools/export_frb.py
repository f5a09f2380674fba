"""Export the FRB weights out of a trained MSML checkpoint as a standalone
peer/teacher model.

Parity target: `backbones/peer/save_msml_to_iresnet.py` (`Saver`): copies the
`frb.*` weights of an MSML checkpoint into a vanilla iResNet so it can serve
as a frozen peer (`backbones/peer/arcface.py`) for the next training run.

Here: msml_tpu checkpoint -> {params, batch_stats} trees for PeerIResNet /
PeerLightCNN, saved via orbax (and optionally as a .npz for portability).

Usage:
  python -m msml_tpu.tools.export_frb --weight_folder out/arc18_1 \
      --out out/arc18_1/peer
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def extract_frb(params: dict, batch_stats: dict):
    """Pull the frb subtree (the FM ops and header are MSML-specific and are
    not part of a vanilla peer — same filtering as save_msml_to_iresnet)."""
    if "frb" not in params:
        raise KeyError("no 'frb' subtree in checkpoint params")
    return params["frb"], batch_stats.get("frb", {})


def save_npz(path: str, params: dict, batch_stats: dict) -> None:
    from flax import traverse_util
    flat = {}
    for prefix, tree in (("params", params), ("batch_stats", batch_stats)):
        for k, v in traverse_util.flatten_dict(tree).items():
            flat[prefix + "/" + "/".join(map(str, k))] = np.asarray(v)
    np.savez(path, **flat)


def load_npz(path: str):
    from flax import traverse_util
    data = np.load(path)
    params, batch_stats = {}, {}
    for key in data.files:
        prefix, rest = key.split("/", 1)
        tgt = params if prefix == "params" else batch_stats
        tgt[tuple(rest.split("/"))] = data[key]
    return (traverse_util.unflatten_dict(params),
            traverse_util.unflatten_dict(batch_stats))


def main(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from msml_tpu.core.weight_folder import load_weight_folder

    _, _, restored, _, _ = load_weight_folder(args.weight_folder, fp16=False)
    params = jax.device_get(restored.params)
    stats = jax.device_get(restored.batch_stats)
    frb_p, frb_s = extract_frb(params, stats)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_npz(args.out if args.out.endswith(".npz") else args.out + ".npz",
             frb_p, frb_s)
    print("exported frb to", args.out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weight_folder", required=True)
    p.add_argument("--out", required=True)
    main(p.parse_args())
