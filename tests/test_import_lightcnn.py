"""LightCNN-29v2 checkpoint transliteration parity.

Torch oracle built to `backbones/frb/lightcnn.py:145-237` (and the pretrained
checkpoint naming the reference loads at lightcnn.py:258-307) ->
tools/import_torch._import_lightcnn -> our NHWC PeerLightCNN must produce the
same embedding.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msml_tpu.core.precision import FULL_PRECISION  # noqa: E402
from msml_tpu.nn.lightcnn import PeerLightCNN  # noqa: E402
from msml_tpu.tools.import_torch import (_TreeBuilder,  # noqa: E402
                                         _import_lightcnn, merge_into)


class Tmfm(tnn.Module):
    def __init__(self, in_c, out_c, k=3, s=1, p=1):
        super().__init__()
        self.out_channels = out_c
        self.filter = tnn.Conv2d(in_c, 2 * out_c, k, s, p)

    def forward(self, x):
        a, b = torch.split(self.filter(x), self.out_channels, 1)
        return torch.max(a, b)


class TGroup(tnn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv_a = Tmfm(in_c, in_c, 1, 1, 0)
        self.conv = Tmfm(in_c, out_c, 3, 1, 1)

    def forward(self, x):
        return self.conv(self.conv_a(x))


class TResblock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = Tmfm(c, c)
        self.conv2 = Tmfm(c, c)

    def forward(self, x):
        return self.conv2(self.conv1(x)) + x


class TLightCNN29v2(tnn.Module):
    """network_29layers_v2 spec with the reference attribute names."""

    def __init__(self, dim=256):
        super().__init__()
        self.conv1 = Tmfm(1, 48, 5, 1, 2)
        self.block1 = tnn.Sequential(TResblock(48))
        self.group1 = TGroup(48, 96)
        self.block2 = tnn.Sequential(*[TResblock(96) for _ in range(2)])
        self.group2 = TGroup(96, 192)
        self.block3 = tnn.Sequential(*[TResblock(192) for _ in range(3)])
        self.group3 = TGroup(192, 128)
        self.block4 = tnn.Sequential(*[TResblock(128) for _ in range(4)])
        self.group4 = TGroup(128, 128)
        self.fc = tnn.Linear(8 * 8 * 128, dim)

    def _pool(self, x):
        return tF.max_pool2d(x, 2) + tF.avg_pool2d(x, 2)

    def forward(self, x):
        x = self._pool(self.conv1(x))
        x = self._pool(self.group1(self.block1(x)))
        x = self._pool(self.group2(self.block2(x)))
        x = self.group4(self.block4(self.group3(self.block3(x))))
        x = self._pool(x)
        return self.fc(torch.flatten(x, 1))


@pytest.mark.slow
def test_lightcnn_import_forward_parity():
    torch.manual_seed(0)
    tmodel = TLightCNN29v2().eval()
    for m in tmodel.modules():
        if isinstance(m, tnn.Conv2d):
            tnn.init.normal_(m.weight, 0, 0.05)
            tnn.init.normal_(m.bias, 0, 0.02)

    b = _TreeBuilder()
    sd = {"frb." + k: v.numpy() for k, v in tmodel.state_dict().items()}
    _import_lightcnn(b, sd, "frb", ("m",))

    model = PeerLightCNN(policy=FULL_PRECISION)
    x = np.random.RandomState(0).randn(2, 128, 128, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = merge_into(jax.device_get(variables["params"]), b.params["m"])

    feat, inters = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    got = np.asarray(feat)
    cos = (got * want).sum(1) / (np.linalg.norm(got, axis=1)
                                 * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos
    # stage features too (the peer-KD consumers)
    assert [tuple(i.shape) for i in inters] == [
        (2, 64, 64, 48), (2, 32, 32, 96), (2, 16, 16, 192), (2, 8, 8, 128)]
