"""Network engine (reference: ``odin/networks``)."""
from odin_tpu.networks.base import (
    BatchNorm,
    CenterAt0,
    Conv,
    ConvTranspose,
    Dense,
    Dropout,
    Flatten,
    Lambda,
    LogNorm,
    NetConf,
    Reshape,
    SequentialNetwork,
    conv_network,
    deconv_network,
    dense_network,
    get_activation,
)
from odin_tpu.networks.image_networks import (
    get_networks,
    get_optimizer_info,
)
