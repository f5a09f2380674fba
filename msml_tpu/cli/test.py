"""Evaluation entry point (the reference `test.py` -> `eval/qeval_mxnet.py`).

Usage (reference README.md:39-43 analogue):
    python -m msml_tpu.cli.test --network msml --weight_folder out/arc18_1 \
        --dataset lfw --fill_type black [--no-occ]

Loads `config.yaml` from the weight folder (the self-describing-weights
contract, qeval_mxnet.py:515-517), restores the latest checkpoint, loads
`{rec}/{dataset}.bin`, and runs the occlusion sweep.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def main(args):
    from msml_tpu.core.tpu_flags import apply_tuned_flags
    apply_tuned_flags()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from msml_tpu.core.mesh import make_mesh
    from msml_tpu.data.bin_loader import load_bin_pil
    from msml_tpu.eval.occ_sweep import occlusion_sweep
    from msml_tpu.train.train_step import make_eval_step

    np.random.seed(0)
    mesh = make_mesh()

    if args.network != "msml":
        # baseline-network evaluation (reference test.py --network
        # {iresnet_v, cosface2018, from2021}, qeval_mxnet.py:106-171):
        # weights come from a torch .pth transliterated on the fly
        extract_fn, cfg = _build_baseline(args)
        if args.vis:
            raise SystemExit("--vis is MSML-only (FM internals)")
    else:
        if not args.weight_folder:
            raise SystemExit("--weight_folder required for --network msml")
        from msml_tpu.core.weight_folder import load_weight_folder
        # --weight: skip orbax restore, overlay torch weights instead
        cfg, model, state, mesh, _ = load_weight_folder(
            args.weight_folder, mesh=mesh, restore=not args.weight)
        if args.weight:
            # evaluate a reference torch checkpoint directly (the released
            # backbone.pth next to its config.yaml — runbook path,
            # BASELINE.md): transliterate on the fly, no orbax ckpt needed
            import torch as _torch
            from msml_tpu.tools.import_torch import (import_msml_checkpoint,
                                                     merge_into)
            sd = _torch.load(args.weight, map_location="cpu")
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
            p_in, s_in = import_msml_checkpoint(sd)
            # eval never touches the classification head; drop it when the
            # checkpoint's class count differs from the config-derived one
            host_p = jax.device_get(state.params)
            cls_in = p_in.get("classification", {})
            if "weight" in cls_in and "classification" in host_p and \
                    tuple(cls_in["weight"].shape) != tuple(
                        np.shape(host_p["classification"]["weight"])):
                print("note: dropping classification head "
                      f"{cls_in['weight'].shape} (config expects "
                      f"{np.shape(host_p['classification']['weight'])}; "
                      "unused in eval)")
                p_in = {k: v for k, v in p_in.items()
                        if k != "classification"}
            state = state.replace(
                params=merge_into(host_p, p_in),
                batch_stats=merge_into(jax.device_get(state.batch_stats),
                                       s_in))
        if args.quant:
            from msml_tpu.train.train_step import make_quantized_eval_step
            qstep = make_quantized_eval_step(model, state.params,
                                             state.batch_stats, mesh,
                                             quant=args.quant)

            def extract_fn(img_np):
                return qstep(img_np.astype(np.float32))
        else:
            eval_step = make_eval_step(model, mesh)

            def extract_fn(img_np):
                return eval_step(state.params, state.batch_stats,
                                 img_np.astype(np.float32))

    bin_path = args.bin or os.path.join(cfg.rec, args.dataset + ".bin")

    if args.device_sweep:
        # on-device protocol: occlusion + normalize fused on the TPU
        if args.protocol != "BB":
            raise SystemExit("--device-sweep supports protocol BB only; "
                             "use the host sweep for NB")
        from msml_tpu.data.bin_loader import load_bin
        from msml_tpu.eval.occ_sweep_device import occlusion_sweep_device
        data_list, issame = load_bin(bin_path, tuple(cfg.out_size))
        results = occlusion_sweep_device(
            data_list, issame, extract_fn, fill_type=args.fill_type,
            use_norm=bool(cfg.get("use_norm", True)),
            is_gray=bool(cfg.get("is_gray", False)), no_occ=args.no_occ)
        print("[protocol]: BB (device) [fill_type]", args.fill_type)
        for row in results:
            print("[%d ~ %d] | [avg_acc]: %.4f" % (row["lo"], row["hi"],
                                                   row["avg_acc"]))
        if args.out_json:
            with open(args.out_json, "w") as f:
                json.dump(results, f, indent=2)
        return results

    imgs, issame = load_bin_pil(bin_path)

    if args.vis:
        # FM-internals visualization mode (qeval_mxnet.py:341-376):
        # capture contaminated/mask/purified features and the predicted seg
        from msml_tpu.core.vis import plot_fm_features, save_training_snapshot
        from msml_tpu.eval.occ_sweep import center_crop
        from msml_tpu.data.rand_occ import RandomBlock

        block = RandomBlock(35, 36, args.fill_type)
        rng = np.random.RandomState(0)
        batch = []
        for img in imgs[:8]:
            one = center_crop(img, tuple(cfg.out_size))
            if cfg.get("is_gray", False) and one.mode != "L":
                one = one.convert("L")  # Grayscale before the block, like
                # the sweep protocol (qeval_mxnet.py:97-101)
            one = block(one, rng)
            a = np.asarray(one, np.float32) / 255.0
            if a.ndim == 2:
                a = a[..., None]
            batch.append((a - 0.5) / 0.5 if cfg.get("use_norm", True) else a)
        x = np.stack(batch)
        (feature, final_seg), inters = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, mutable=["intermediates"])
        seg = np.asarray(final_seg)
        occ = np.argmax(seg, -1)  # 0: occluded
        os.makedirs(args.vis_dir, exist_ok=True)
        save_training_snapshot(args.vis_dir, 0, x[0], seg[0],
                               is_gray=bool(cfg.get("is_gray", False)))
        for i in range(4):
            fm = inters["intermediates"].get(f"fm_op{i}")
            if not fm:
                continue
            import jax.image as jimage
            h = fm["contaminated"][0].shape[1]
            occ_r = np.asarray(jimage.resize(
                occ.astype(np.float32), (occ.shape[0], h, h), "nearest"))
            occ_r = np.repeat(occ_r[..., None],
                              fm["contaminated"][0].shape[-1], -1)
            plot_fm_features(np.asarray(fm["contaminated"][0]),
                             np.asarray(fm["mask"][0]),
                             np.asarray(fm["purified"][0]),
                             occ_r, args.vis_dir, tag=f"fm{i}")
        print("visualizations written to", args.vis_dir)
        return None
    results = occlusion_sweep(
        imgs, issame, extract_fn, out_size=tuple(cfg.out_size),
        fill_type=args.fill_type, batch_size=args.batch_size,
        use_norm=bool(cfg.get("use_norm", True)),
        is_gray=bool(cfg.get("is_gray", False)), no_occ=args.no_occ,
        dim_feature=cfg.dim_feature, feature_dir=args.save_features,
        protocol=args.protocol, repeats=args.repeats)

    print(f"[protocol]: {args.protocol} [fill_type]", args.fill_type)
    for row in results:
        print("[%d ~ %d] | [avg_acc]: %.4f" % (row["lo"], row["hi"],
                                               row["avg_acc"]))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)
    return results


def _build_baseline(args):
    """Vanilla-iResNet baseline evaluation path (qeval_mxnet.py:138-142):
    a torch .pth is transliterated into PeerIResNet on the fly. Other
    baselines (cosface2018, from2021) are checkpoint-bound torch releases;
    their architectures live in nn/baselines.py / nn/from2021.py."""
    import jax
    import jax.numpy as jnp
    import torch

    from msml_tpu.core.config import Config, config_init
    from msml_tpu.core.precision import FULL_PRECISION
    from msml_tpu.nn.iresnet import IRESNET_LAYERS, PeerIResNet
    from msml_tpu.tools.import_torch import (_TreeBuilder,
                                             import_iresnet_trunk,
                                             merge_into)

    if not args.weight:
        raise SystemExit(f"--network {args.network} requires --weight .pth")
    sd = torch.load(args.weight, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: np.asarray(v) for k, v in sd.items()}

    rng = jax.random.PRNGKey(0)
    out_size = [112, 112]  # (w, h) like qeval_mxnet's cfg.out_size

    if args.network.startswith("iresnet"):
        depth = args.network.replace("iresnet", "").replace("_v", "")
        model = PeerIResNet(layers=IRESNET_LAYERS[f"iresnet{depth}"],
                            policy=FULL_PRECISION)
        b = _TreeBuilder()
        import_iresnet_trunk(b, sd, "", ("m",))
        params_in, stats_in = b.params["m"], b.batch_stats["m"]
        x = jnp.zeros((1, 112, 112, 3), jnp.float32)
        variables = model.init(rng, x)

        def apply_fn(v, img):
            return model.apply(v, img)[0]
    elif args.network == "cosface2018":
        from msml_tpu.nn.baselines import cosface2018
        from msml_tpu.tools.import_torch import import_sphere
        model = cosface2018(input_size=(112, 96), policy=FULL_PRECISION)
        params_in, stats_in = import_sphere(sd)
        out_size = [96, 112]  # (w, h), qeval_mxnet.py:508-510
        x = jnp.zeros((1, 112, 96, 3), jnp.float32)
        variables = model.init(rng, x)

        def apply_fn(v, img):
            return model.apply({"params": v["params"]}, img)
    elif args.network == "from2021":
        from msml_tpu.nn.from2021 import From2021
        from msml_tpu.tools.import_torch import import_from2021
        model = From2021(policy=FULL_PRECISION)
        params_in, stats_in = import_from2021(sd)
        out_size = [96, 112]
        x = jnp.zeros((1, 112, 96, 3), jnp.float32)
        variables = model.init({"params": rng, "dropout": rng}, x,
                               train=False)

        def apply_fn(v, img):
            return model.apply(v, img, train=False)
    else:
        raise SystemExit(f"unknown --network {args.network}")

    params = merge_into(jax.device_get(variables["params"]), params_in)
    stats = merge_into(jax.device_get(variables.get("batch_stats", {})),
                       stats_in)

    def _fwd(img):
        return apply_fn({"params": params, "batch_stats": stats}, img)

    if args.quant == "int8":
        from msml_tpu.core.quantize import quantize_fn
        _fwd = quantize_fn(_fwd)
    fwd = jax.jit(_fwd)

    def extract_fn(img_np):
        return fwd(jnp.asarray(img_np, jnp.float32))

    cfg = Config.from_dict({
        "dataset": "synthetic", "fp16": False, "batch_size": 1,
        "frb_type": "iresnet18", "osb_type": "unet", "use_osb": False,
        "fm_layers": [0, 0, 0, 0], "fm_params": [3, 2, "sigmoid", "mul"],
        "header_type": "AMArcFace", "header_params": [64.0, 0.48, 0, 0],
        "exp_id": 0, "output_prefix": "baseline",
        "out_folder": "/tmp/msml_baseline_out"})
    config_init(cfg, make_output_dir=False)
    cfg.out_size = tuple(out_size)
    return extract_fn, cfg


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="msml_tpu testing")
    p.add_argument("--network", type=str, default="msml",
                   help="msml | iresnet18_v/34_v/50_v (vanilla baseline "
                        "from a torch .pth via --weight)")
    p.add_argument("--weight", type=str, default="",
                   help="torch .pth: for baseline networks, or (with "
                        "--network msml) a reference MSML backbone.pth "
                        "evaluated via on-the-fly transliteration")
    p.add_argument("--dataset", type=str, default="lfw",
                   help="lfw, cfp_fp, agedb_30")
    p.add_argument("--weight_folder", type=str, default="",
                   help="msml weight folder (required for --network msml)")
    p.add_argument("--fill_type", type=str, default="black",
                   choices=["black", "white", "gauss"])
    p.add_argument("--no-occ", action="store_true")
    p.add_argument("--protocol", type=str, default="BB",
                   choices=["BB", "NB"],
                   help="BB: occlude both pair images; NB: occlude only the "
                        "first (qeval_mxnet.py:173-187)")
    p.add_argument("--bin", type=str, default="",
                   help="explicit path to the .bin pair file")
    p.add_argument("--batch-size", type=int, default=25)
    p.add_argument("--repeats", type=int, default=10,
                   help="repeats per nonzero occlusion ratio "
                        "(reference: 10, qeval_mxnet.py:556)")
    p.add_argument("--out-json", type=str, default="")
    p.add_argument("--save-features", type=str, default="",
                   help="save flip-summed features per ratio/repeat as .npy "
                        "(qeval_mxnet.py:392-396 cache)")
    p.add_argument("--quant", type=str, default="", choices=["", "int8"],
                   help="post-training int8 quantization of the eval "
                        "forward (core/quantize.py); run against a "
                        "non-quantized baseline to bound accuracy impact")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--device-sweep", action="store_true",
                   help="run occlusion + normalize on the TPU "
                        "(eval/occ_sweep_device.py)")
    p.add_argument("--vis", action="store_true",
                   help="FM-internals visualization (qeval_mxnet --vis)")
    p.add_argument("--vis-dir", type=str, default="vis_out")
    return p.parse_args(argv)


def cli():
    """Console entry point (pyproject [project.scripts])."""
    main(parse_args())


if __name__ == "__main__":
    cli()
