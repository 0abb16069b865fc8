from .resnet import ResnetEncoder, encoder_channels
from .depth_decoder import DepthDecoder, Conv3x3, ConvBlock
from .pose import PoseDecoder, PoseCNN
from .simsiam import SimSiam
from .wrappers import (
    MonodepthModel,
    DepthPredictor,
    make_monodepth2,
    init_monodepth2,
    predictor_from,
    manydepth_rescale,
)
