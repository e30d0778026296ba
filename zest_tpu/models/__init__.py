from .embedding import positional_encoding, embedding_out_channels
from .nerf import NeRFField
from .feature_net import FeatureNet
from .cost_reg import CostRegNet
from .mvsnet import MVSEncoder
