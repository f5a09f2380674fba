"""Load a self-describing weight folder (the reference's eval contract:
`config.yaml` next to the checkpoints, `eval/qeval_mxnet.py:515-517`).

One place for the restore recipe shared by cli.test, cli.eval_ijb and the
export tools: the template passed to orbax must be constructed exactly the
way training constructed the state (in particular, PFC-trained checkpoints
carry the class-sharded head weight, so `use_pfc` must be re-derived from
the persisted config)."""

from __future__ import annotations

import os
from typing import Optional


def load_weight_folder(weight_folder: str, *, mesh=None,
                       fp16: Optional[bool] = None, restore: bool = True):
    """-> (cfg, model, state, mesh, use_pfc).

    fp16=None uses the folder's own config (bf16 compute); pass False to
    force an f32 model (exports). restore=False returns the freshly
    initialised state (callers that overlay torch weights instead)."""
    import jax

    from msml_tpu.core import checkpoint as ckpt
    from msml_tpu.core.config import config_init, load_yaml
    from msml_tpu.core.mesh import make_mesh
    from msml_tpu.core.precision import policy_from_config
    from msml_tpu.nn.msml import msml_from_config
    from msml_tpu.train.train_step import init_train_state

    cfg = load_yaml(os.path.join(weight_folder, "config.yaml"))
    cfg.out_folder = os.path.dirname(weight_folder.rstrip("/")) or "out"
    config_init(cfg, make_output_dir=False)
    if mesh is None:
        mesh = make_mesh()
    use_pfc = float(cfg.get("sample_rate", 1.0)) < 1.0 or bool(
        cfg.get("use_partial_fc", False))
    if fp16 is None:
        fp16 = bool(cfg.get("fp16", True))
    model = msml_from_config(cfg, policy=policy_from_config(fp16),
                             external_header=use_pfc)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh,
                             use_pfc=use_pfc)
    if restore:
        restored = ckpt.restore_checkpoint(weight_folder, state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {weight_folder}")
        state = restored
    return cfg, model, state, mesh, use_pfc
