"""bench.py variants must read the SHIPPED configs/*.yaml (VERDICT r2 #7:
one source of truth for benched vs trained configs, incl. batch size)."""

import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import VARIANTS, load_variant_config  # noqa: E402

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_variants_read_shipped_yaml():
    for variant, (yaml_rel, overrides) in VARIANTS.items():
        raw = yaml.safe_load(open(os.path.join(_HERE, yaml_rel)))
        cfg = load_variant_config(variant)
        # every non-overridden user field flows through unchanged
        for k, v in raw.items():
            if k in overrides:
                continue
            got = cfg[k]
            if isinstance(got, tuple):  # config_init normalizes to tuples
                got = list(got)
            assert got == v, (variant, k, got, v)
        for k, v in overrides.items():
            assert cfg[k] == v, (variant, k)


def test_flagship_matches_measured_optimum():
    cfg = load_variant_config("flagship")
    assert cfg.batch_size == 128  # PERF.md: measured optimum on v5e
    assert cfg.num_classes == 10572  # CASIA-WebFace (paper arc18 protocol)
    assert not cfg.peer_params["use_ori"]


def test_peer_dec_matches_reference_shipped_config():
    # the reference's shipped config.yaml:1-36
    cfg = load_variant_config("peer_dec")
    assert cfg.batch_size == 256 and cfg.num_classes == 93431
    assert cfg.peer_params["use_ori"] and cfg.peer_params["use_decoder"]
    nokd = load_variant_config("peer_dec_nokd")
    assert nokd["kd_metric"] is False


def test_ir100_pfc_variant():
    cfg = load_variant_config("ir100_pfc")
    assert cfg.get("use_partial_fc") and float(cfg.sample_rate) == 0.1
    assert cfg.remat is False  # PERF.md sweep decision


def test_user_config_persists_model_affecting_keys():
    """kd_metric changes the module graph (conv2 towers exist or not), so a
    weight folder trained with kd_metric: false must persist it — else eval
    would rebuild a different module than the checkpoint holds."""
    from msml_tpu.core.config import Config, config_init, user_config_dict
    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": True, "batch_size": 4,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": True,
        "fm_layers": [1, 1, 1, 1],
        "fm_params": [3, 2, "sigmoid", "mul"],
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0, 0],
        "exp_id": 1, "output_prefix": "t", "kd_metric": False,
        "scan_unroll": 4,
    })
    config_init(cfg, make_output_dir=False)
    d = user_config_dict(cfg)
    assert d["kd_metric"] is False
    assert d["scan_unroll"] == 4
