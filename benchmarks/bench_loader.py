"""Host data-loader microbenchmark: native (C++ mmap recordio + libjpeg
thread pool) vs the Python path (recordio.py + cv2 + PIL transforms).

Measures, on a synthetic 112x112 rec:
  * decode-only rate: NativeRecordReader.decode_batch vs a Python
    read_idx+unpack+imdecode loop (both single-threaded — thread scaling is
    only meaningful on multi-core hosts; this benches per-core cost)
  * end-to-end plain-reader rate: MXFaceDataset epoch() native vs Python
    (decode + flip + normalize + batch assembly)

python benchmarks/bench_loader.py [--rec DIR] [--threads N] [--n 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_rec(root: str, n: int = 512, n_cls: int = 32, size: int = 112):
    from msml_tpu.data.recordio import (IRHeader, IndexedRecordIO, imencode,
                                        pack)
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    w = IndexedRecordIO(os.path.join(root, "train.idx"),
                        os.path.join(root, "train.rec"), "w")
    w.write_idx(0, pack(IRHeader(2, [n + 1, n_cls], 1, 0), b""))
    for i in range(1, n + 1):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        w.write_idx(i, pack(IRHeader(0, float(i % n_cls), 0, 0),
                            imencode(img)))
    w.close()
    return root


def rate(fn, total_imgs: int) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    fn()
    return total_imgs / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rec", default="", help="existing rec dir (else synth)")
    ap.add_argument("--threads", type=int, default=0,
                    help="native decode threads (0 = all cores, capped 16)")
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()

    from msml_tpu.data import native_loader
    from msml_tpu.data.face_dataset import MXFaceDataset
    from msml_tpu.data.recordio import IndexedRecordIO, imdecode, unpack

    root = args.rec or make_rec("/tmp/msml_loader_bench", n=args.n)
    idx_p, rec_p = (os.path.join(root, "train.idx"),
                    os.path.join(root, "train.rec"))
    nthreads = args.threads or min(os.cpu_count() or 1, 16)
    results = {"cpu_count": os.cpu_count(), "threads": nthreads}

    # ---- decode-only, single thread (per-core cost) ----
    py = IndexedRecordIO(idx_p, rec_p)
    keys = list(range(1, args.n + 1))

    def py_decode():
        for k in keys:
            _, raw = unpack(py.read_idx(k))
            imdecode(raw)
    results["py_decode_1t_img_s"] = round(rate(py_decode, len(keys)), 1)

    if native_loader.available():
        r1 = native_loader.NativeRecordReader(idx_p, rec_p, nthreads=1)
        results["native_decode_1t_img_s"] = round(
            rate(lambda: r1.decode_batch(keys, (112, 112)), len(keys)), 1)
        r1.close()
        if nthreads > 1:
            rn = native_loader.NativeRecordReader(idx_p, rec_p,
                                                  nthreads=nthreads)
            results[f"native_decode_{nthreads}t_img_s"] = round(
                rate(lambda: rn.decode_batch(keys, (112, 112)), len(keys)),
                1)
            rn.close()

    # ---- end-to-end plain reader (MXFaceDataset epoch) ----
    def e2e(native: bool):
        ds = MXFaceDataset(root, batch_size=128, native_decode=native,
                           num_workers=nthreads if native else 1,
                           use_ori=False)
        def run():
            for _ in ds.epoch(0):
                pass
        n_imgs = (len(ds) // 128) * 128
        v = rate(run, n_imgs)
        ds.close()
        return round(v, 1)

    results["py_plain_reader_img_s"] = e2e(False)
    if native_loader.available():
        results["native_plain_reader_img_s"] = e2e(True)
        results["e2e_speedup"] = round(
            results["native_plain_reader_img_s"]
            / results["py_plain_reader_img_s"], 2)

    # ---- full training loader (FaceByRandOccMask, occlusion on):
    # host float path vs device_light (raw_uint8 — relight/normalize move
    # into the jitted step), single worker = per-core cost ----
    from msml_tpu.data.face_dataset import FaceByRandOccMask

    def train_loader(raw_uint8: bool) -> float:
        ds = FaceByRandOccMask(
            root, batch_size=128, occluder_root="/nonexistent",
            use_ori=False, num_workers=1, raw_uint8=raw_uint8)
        def run():
            for _ in ds.epoch(0):
                pass
        n_imgs = (len(ds) // 128) * 128
        v = rate(run, n_imgs)
        ds.close()
        return round(v, 1)

    results["train_loader_f32_1t_img_s"] = train_loader(False)
    results["train_loader_u8_1t_img_s"] = train_loader(True)
    results["device_light_speedup"] = round(
        results["train_loader_u8_1t_img_s"]
        / results["train_loader_f32_1t_img_s"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
