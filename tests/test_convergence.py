"""Learning smoke test: the full training system must actually learn a
separable synthetic task (class identity encoded in the image)."""

import jax
import numpy as np
import pytest

from msml_tpu.core.config import Config, config_init
from msml_tpu.core.mesh import make_mesh
from msml_tpu.core.precision import FULL_PRECISION
from msml_tpu.nn.msml import msml_from_config
from msml_tpu.train import optim
from msml_tpu.train.train_step import init_train_state, make_train_step

pytestmark = pytest.mark.slow  # multi-step training on the 8-dev mesh

N_CLASSES = 8


def _class_batch(rng, n, size=112):
    """Images whose low-frequency content identifies the class."""
    protos = np.random.RandomState(7).rand(N_CLASSES, 8, 8, 3) * 2 - 1
    labels = rng.randint(0, N_CLASSES, n)
    imgs = np.zeros((n, size, size, 3), np.float32)
    for i, c in enumerate(labels):
        base = np.kron(protos[c], np.ones((size // 8, size // 8, 1)))
        imgs[i] = base + rng.randn(size, size, 3) * 0.1
    msk = np.zeros((n, size, size), np.int32)
    return {"img": imgs.astype(np.float32), "msk": msk,
            "label": labels.astype(np.int32)}


def test_loss_decreases():
    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": 2,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1], "fm_params": [3, 2, "sigmoid", "mul"],
        "peer_params": {"use_ori": False, "use_conv": False,
                        "mask_trans": "conv", "use_decoder": False},
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0.0, 0.0],
        "exp_id": 0, "output_prefix": "conv", "num_classes": N_CLASSES,
        "out_folder": "/tmp/msml_test_out", "batch_size": 2,
    })
    config_init(cfg)
    cfg.lr = 1.0  # effective base lr = 1.0/512*16 = 0.03 (16 = global batch)

    mesh = make_mesh()
    model = msml_from_config(cfg, policy=FULL_PRECISION)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, rng, mesh)
    lr_scales = optim.build_lr_scales(state.params, cfg, mesh.shape["data"])
    step = make_train_step(model, cfg, mesh, lr_scales)

    data_rng = np.random.RandomState(0)
    losses = []
    for i in range(20):
        batch = _class_batch(data_rng, cfg.batch_size * mesh.shape["data"])
        state, metrics = step(state, batch, 1.0, rng)
        losses.append(float(metrics["cls_loss"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(last)
    # measured trajectory: ~33 -> ~26 by step 20, ~24 by step 30 (clip-5
    # limits step size exactly like the reference's clip_grad_norm_);
    # 0.9 at 20 steps is a robust bound
    assert last < first * 0.9, (first, last, losses)
