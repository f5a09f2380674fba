"""Minimal MXNet inference runtime: .params parser + symbol-JSON executor.

Parity target: the RetinaFace detector the reference vendors for benchmark
prep (`datasets/benchmarks/RetinaFace/retinaface.py:209-247`) is not an
architecture in code — it loads an externally-downloaded MXNet checkpoint
(`mx.model.load_checkpoint`) and executes its serialized symbol graph with
`mx.mod.Module`. The TPU-native equivalent is therefore an *interpreter*:
parse the checkpoint's `-symbol.json` graph, bind the `.params` arrays, and
execute the ops with jax.numpy on NHWC tensors (mxnet is NCHW; weights are
transposed once at load). Works for any of the published RetinaFace
variants (net3/net5/...) because the graph defines the network.

No mxnet dependency: the .params file is parsed directly (dmlc NDArray-list
format, uint64 list header + V1/V2 NDArray records), the symbol JSON with
the stdlib. Supported ops cover the public face-detector graphs:
Convolution, BatchNorm, Activation, LeakyReLU, Pooling, FullyConnected,
elemwise add, Concat, UpSampling(nearest), Deconvolution, Crop, Reshape,
Flatten, SoftmaxActivation/softmax, Dropout(identity), Copy/identity.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ------------------------------------------------------------------ .params

# dmlc NDArray-list magics (mxnet src/ndarray/ndarray.cc)
_LIST_MAGIC = 0x112
_NDARRAY_V1_MAGIC = 0xF993FAC8   # adds int64 shape dims
_NDARRAY_V2_MAGIC = 0xF993FAC9   # adds storage type field
_NDARRAY_V3_MAGIC = 0xF993FACA   # adds ctx/aux for sparse (dense layout same)

_DTYPE = {0: np.float32, 1: np.float64, 2: np.float16, 3: np.uint8,
          4: np.int32, 5: np.int8, 6: np.int64}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.buf, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def bytes(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated .params file")
        self.pos += n
        return b


def _read_shape(r: _Reader, ndim: int, fmt: str) -> Tuple[int, ...]:
    if ndim == 0:
        return ()
    v = r.read(f"{ndim}{fmt}")
    return (v,) if ndim == 1 else tuple(v)


def _read_ndarray(r: _Reader) -> np.ndarray:
    magic = r.read("I")
    if magic in (_NDARRAY_V2_MAGIC, _NDARRAY_V3_MAGIC):
        stype = r.read("i")
        if stype not in (0,):  # kDefaultStorage
            raise ValueError(f"sparse NDArray (stype={stype}) not supported")
        shape = _read_shape(r, r.read("I"), "q")
    elif magic == _NDARRAY_V1_MAGIC:
        shape = _read_shape(r, r.read("I"), "q")
    else:
        # legacy (no magic): `magic` was the ndim of a uint32 TShape
        if magic > 8:
            raise ValueError(f"unrecognized NDArray record (magic=0x{magic:x})")
        shape = _read_shape(r, magic, "I")
    # context (dev_type, dev_id) + dtype flag
    _dev_type, _dev_id = r.read("ii")
    type_flag = r.read("i")
    dt = _DTYPE.get(type_flag)
    if dt is None:
        raise ValueError(f"unsupported dtype flag {type_flag}")
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    data = np.frombuffer(r.bytes(n * np.dtype(dt).itemsize), dtype=dt)
    return data.reshape(shape).copy()


def load_params(path: str) -> Dict[str, np.ndarray]:
    """Parse an mxnet .params checkpoint (mx.nd.save format) with numpy.

    Returns {name: array} with the mxnet `arg:`/`aux:` prefixes stripped
    (kept when both would collide)."""
    r = _Reader(open(path, "rb").read())
    magic = r.read("Q")
    if magic != _LIST_MAGIC:
        raise ValueError(f"not an mxnet NDArray-list file (magic=0x{magic:x})")
    _reserved = r.read("Q")
    count = r.read("Q")
    arrays = [_read_ndarray(r) for _ in range(count)]
    name_count = r.read("Q")
    names = []
    for _ in range(name_count):
        ln = r.read("Q")
        names.append(r.bytes(ln).decode("utf-8"))
    if name_count not in (0, count):
        raise ValueError(f"name/array count mismatch ({name_count}/{count})")
    if not names:
        names = [f"array_{i}" for i in range(count)]
    out: Dict[str, np.ndarray] = {}
    for name, arr in zip(names, arrays):
        short = name.split(":", 1)[1] if ":" in name else name
        out[short if short not in out else name] = arr
    return out


def save_params(path: str, arrays: Dict[str, np.ndarray],
                prefix: str = "arg:") -> None:
    """Write the same format (round-trip fixture for the parser; also lets
    tests fabricate checkpoints without mxnet)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", _LIST_MAGIC, 0))
        f.write(struct.pack("<Q", len(arrays)))
        for arr in arrays.values():
            arr = np.ascontiguousarray(arr)
            flag = {np.dtype(v): k for k, v in _DTYPE.items()}[arr.dtype]
            f.write(struct.pack("<Ii", _NDARRAY_V2_MAGIC, 0))
            f.write(struct.pack("<I", arr.ndim))
            f.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
            f.write(struct.pack("<iii", 1, 0, flag))  # cpu(0), dtype
            f.write(arr.tobytes())
        f.write(struct.pack("<Q", len(arrays)))
        for name in arrays:
            nm = (name if ":" in name else prefix + name).encode("utf-8")
            f.write(struct.pack("<Q", len(nm)))
            f.write(nm)


# ------------------------------------------------------------------- symbol

def _attr(node: dict) -> Dict[str, str]:
    return node.get("attrs") or node.get("attr") or node.get("param") or {}


def _tuple(s: Optional[str], default=()) -> Tuple[int, ...]:
    if not s:
        return tuple(default)
    return tuple(int(float(x)) for x in
                 s.strip("()[] ").replace(" ", "").split(",") if x != "")


def _bool(s: Optional[str], default=False) -> bool:
    if s is None:
        return default
    return str(s).lower() in ("true", "1")


class MXGraph:
    """Executable mxnet symbol graph on NHWC jax arrays.

    `prefix` loading mirrors `mx.model.load_checkpoint(prefix, epoch)`:
    reads `{prefix}-symbol.json` + `{prefix}-{epoch:04d}.params`.
    """

    def __init__(self, symbol: dict, params: Dict[str, np.ndarray],
                 data_name: str = "data"):
        self.nodes: List[dict] = symbol["nodes"]
        self.heads = [h[:2] for h in symbol["heads"]]
        self.data_name = data_name
        self.params = params
        self._jit_cache: Dict[Tuple[int, ...], object] = {}

    @classmethod
    def load(cls, prefix: str, epoch: int = 0) -> "MXGraph":
        symbol = json.load(open(f"{prefix}-symbol.json"))
        params = load_params(f"{prefix}-{epoch:04d}.params")
        return cls(symbol, params)

    # -------------------------------------------------------------- execute
    def _param(self, name: str) -> np.ndarray:
        if name not in self.params:
            raise KeyError(f"checkpoint is missing parameter '{name}'")
        return self.params[name]

    def __call__(self, data: np.ndarray) -> List[np.ndarray]:
        """Run the graph on one NHWC float32 image batch; returns the head
        outputs as NCHW numpy arrays (mxnet output convention, which the
        RetinaFace decode protocol expects)."""
        import jax

        key = tuple(data.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._trace)
        outs = self._jit_cache[key](np.asarray(data, np.float32))
        return [np.transpose(np.asarray(o), (0, 3, 1, 2))
                if np.asarray(o).ndim == 4 else np.asarray(o) for o in outs]

    def _trace(self, data):
        import jax.numpy as jnp
        from jax import lax

        vals: Dict[int, object] = {}

        def inp(i):
            nid, out_idx = i[0], i[1]
            v = vals[nid]
            return v[out_idx] if isinstance(v, tuple) else v

        for nid, node in enumerate(self.nodes):
            op = node["op"]
            name = node["name"]
            a = _attr(node)
            ins = [inp(i) for i in node["inputs"]]

            if op == "null":
                if name == self.data_name:
                    vals[nid] = data
                else:
                    vals[nid] = None  # parameter leaf; consumed by name
                continue

            if op == "Convolution":
                x = ins[0]
                w = self._param(name + "_weight")      # OIHW
                kh, kw = _tuple(a.get("kernel"))
                sh, sw = _tuple(a.get("stride"), (1, 1))
                ph, pw = _tuple(a.get("pad"), (0, 0))
                dh, dw = _tuple(a.get("dilate"), (1, 1))
                groups = int(a.get("num_group", 1))
                w = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # HWIO
                y = lax.conv_general_dilated(
                    x, w, (sh, sw), ((ph, ph), (pw, pw)),
                    rhs_dilation=(dh, dw), feature_group_count=groups,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if not _bool(a.get("no_bias")):
                    y = y + jnp.asarray(self._param(name + "_bias"))
                vals[nid] = y

            elif op == "Deconvolution":
                x = ins[0]
                w = self._param(name + "_weight")      # IOHW in mxnet deconv
                kh, kw = _tuple(a.get("kernel"))
                sh, sw = _tuple(a.get("stride"), (1, 1))
                ph, pw = _tuple(a.get("pad"), (0, 0))
                w = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # HWOI->HWIO?
                y = lax.conv_transpose(
                    x, w, (sh, sw), ((kh - 1 - ph, kh - 1 - ph),
                                     (kw - 1 - pw, kw - 1 - pw)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    transpose_kernel=True)
                if not _bool(a.get("no_bias")):
                    y = y + jnp.asarray(self._param(name + "_bias"))
                vals[nid] = y

            elif op == "BatchNorm":
                x = ins[0]
                eps = float(a.get("eps", 1e-3))
                gamma = self._param(name + "_gamma").astype(np.float32)
                if _bool(a.get("fix_gamma")):
                    gamma = np.ones_like(gamma)
                beta = self._param(name + "_beta").astype(np.float32)
                mean = self._param(name + "_moving_mean").astype(np.float32)
                var = self._param(name + "_moving_var").astype(np.float32)
                scale = gamma / np.sqrt(var + eps)
                bias = beta - mean * scale
                vals[nid] = x * jnp.asarray(scale) + jnp.asarray(bias)

            elif op == "Activation":
                act = a.get("act_type", "relu")
                x = ins[0]
                if act == "relu":
                    vals[nid] = jnp.maximum(x, 0)
                elif act == "sigmoid":
                    vals[nid] = jax_sigmoid(x)
                elif act == "tanh":
                    vals[nid] = jnp.tanh(x)
                else:
                    raise NotImplementedError(f"Activation {act}")

            elif op == "LeakyReLU":
                slope = float(a.get("slope", 0.25))
                x = ins[0]
                if a.get("act_type", "leaky") == "prelu":
                    alpha = jnp.asarray(self._param(name + "_gamma"))
                    vals[nid] = jnp.where(x >= 0, x, alpha * x)
                else:
                    vals[nid] = jnp.where(x >= 0, x, slope * x)

            elif op == "Pooling":
                x = ins[0]
                if _bool(a.get("global_pool")):
                    red = (jnp.max if a.get("pool_type", "max") == "max"
                           else jnp.mean)
                    vals[nid] = red(x, axis=(1, 2), keepdims=True)
                    continue
                kh, kw = _tuple(a.get("kernel"))
                sh, sw = _tuple(a.get("stride"), (1, 1))
                ph, pw = _tuple(a.get("pad"), (0, 0))
                full = a.get("pooling_convention", "valid") == "full"
                pads = []
                for dim, k, s, p in ((1, kh, sh, ph), (2, kw, sw, pw)):
                    lo = p
                    hi = p
                    if full:  # ceil output: pad high side up to one stride
                        size = x.shape[dim] + 2 * p
                        rem = (size - k) % s
                        if rem:
                            hi += s - rem
                    pads.append((lo, hi))
                if a.get("pool_type", "max") == "max":
                    y = lax.reduce_window(
                        x, -jnp.inf, lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
                        ((0, 0), pads[0], pads[1], (0, 0)))
                else:
                    win = lambda t: lax.reduce_window(
                        t, 0.0, lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
                        ((0, 0), pads[0], pads[1], (0, 0)))
                    if _bool(a.get("count_include_pad"), True):
                        y = win(x) / (kh * kw)   # mxnet default: pad counts
                    else:
                        y = win(x) / win(jnp.ones_like(x))
                vals[nid] = y

            elif op in ("elemwise_add", "_Plus", "_plus", "broadcast_add",
                        "_add"):
                vals[nid] = ins[0] + ins[1]

            elif op in ("elemwise_mul", "broadcast_mul", "_mul"):
                vals[nid] = ins[0] * ins[1]

            elif op == "Concat":
                axis = int(a.get("dim", 1))
                if ins[0].ndim == 4:  # graph dims are NCHW; tensors are NHWC
                    axis = {0: 0, 1: 3, 2: 1, 3: 2}[axis]
                vals[nid] = jnp.concatenate(ins, axis=axis)

            elif op == "UpSampling":
                st = a.get("sample_type", "nearest")
                if st != "nearest":
                    raise NotImplementedError(f"UpSampling sample_type {st}")
                scale = int(a.get("scale", 2))
                x = ins[0]
                vals[nid] = jnp.repeat(jnp.repeat(x, scale, axis=1),
                                       scale, axis=2)

            elif op == "Crop":
                # FPN usage: crop(upsampled, like) -> spatial dims of `like`;
                # single-input form crops to the h_w attr
                x = ins[0]
                if len(ins) > 1 and ins[1] is not None:
                    h, w = ins[1].shape[1], ins[1].shape[2]
                else:
                    h, w = _tuple(a.get("h_w"))
                if _bool(a.get("center_crop")):
                    oh = (x.shape[1] - h) // 2
                    ow = (x.shape[2] - w) // 2
                else:
                    oh, ow = _tuple(a.get("offset"), (0, 0))
                vals[nid] = x[:, oh:oh + h, ow:ow + w, :]

            elif op in ("Reshape", "reshape"):
                shape = _tuple(a.get("shape"))
                x = ins[0]
                # NHWC tensor semantics are NCHW in the graph: convert,
                # reshape, convert back if 4-D
                if x.ndim == 4:
                    x = jnp.transpose(x, (0, 3, 1, 2))
                shape = tuple(x.shape[i] if s == 0 else s
                              for i, s in enumerate(shape))
                y = jnp.reshape(x, shape)
                if y.ndim == 4:
                    y = jnp.transpose(y, (0, 2, 3, 1))
                vals[nid] = y

            elif op == "Flatten":
                x = ins[0]
                if x.ndim == 4:
                    x = jnp.transpose(x, (0, 3, 1, 2))
                vals[nid] = x.reshape(x.shape[0], -1)

            elif op == "FullyConnected":
                x = ins[0]
                if x.ndim == 4:
                    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(
                        x.shape[0], -1)
                w = jnp.asarray(self._param(name + "_weight"))  # (out, in)
                y = x @ w.T
                if not _bool(a.get("no_bias")):
                    y = y + jnp.asarray(self._param(name + "_bias"))
                vals[nid] = y

            elif op == "SoftmaxActivation":
                x = ins[0]
                import jax.nn
                if a.get("mode", "instance") == "channel":
                    vals[nid] = jax.nn.softmax(
                        x, axis=3 if x.ndim == 4 else 1)
                else:
                    # mxnet 'instance' (the default): normalize over the
                    # flattened non-batch elements, not the channel axis.
                    vals[nid] = jax.nn.softmax(
                        x.reshape(x.shape[0], -1), axis=1).reshape(x.shape)

            elif op == "SoftmaxOutput":
                x = ins[0]
                import jax.nn
                if x.ndim == 4 and _bool(a.get("multi_output")):
                    vals[nid] = jax.nn.softmax(x, axis=3)  # per-position C
                elif x.ndim <= 2:
                    vals[nid] = jax.nn.softmax(x, axis=-1)
                else:
                    vals[nid] = jax.nn.softmax(
                        x.reshape(x.shape[0], -1), axis=1).reshape(x.shape)

            elif op == "softmax":
                x = ins[0]
                import jax.nn
                axis = int(a.get("axis", -1))
                if x.ndim == 4 and axis in (1, 2, 3):  # NCHW axis -> NHWC
                    axis = {1: 3, 2: 1, 3: 2}[axis]
                vals[nid] = jax.nn.softmax(x, axis=axis)

            elif op in ("Dropout", "identity", "_copy", "BlockGrad"):
                vals[nid] = ins[0]

            else:
                raise NotImplementedError(f"mxnet op '{op}' (node {name})")

        return tuple(inp(h) for h in self.heads)


def jax_sigmoid(x):
    import jax
    return jax.nn.sigmoid(x)
