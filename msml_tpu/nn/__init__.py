from msml_tpu.nn.common import PReLU, conv3x3, conv1x1, ConvTranspose2d, dap
from msml_tpu.nn.iresnet import IResNet, PeerIResNet, IBasicBlock, IRESNET_LAYERS
from msml_tpu.nn.unet import Unet, GlobalConvModule
from msml_tpu.nn.fm import FMCnn, FMNone
from msml_tpu.nn.lightcnn import LightCNN29v2, PeerLightCNN, mfm
from msml_tpu.nn.decoder import DeepMindDecoder
from msml_tpu.nn.msml import MSML
