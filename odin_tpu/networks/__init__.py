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
    SpaceToDepthConv,
    conv_network,
    deconv_network,
    dense_network,
    get_activation,
)
from odin_tpu.networks.attention import (
    Attention,
    AttentionMechanism,
    GlobalAttention,
    LocalPredictiveAttention,
    MultiHeadAttention,
    SelfAttention,
)
from odin_tpu.networks.image_networks import (
    get_networks,
    get_optimizer_info,
)
from odin_tpu.networks.resnets import (
    DownSample,
    MaskedConv2D,
    PixelCNNDecoder,
    ResidualBlock,
    ResidualBottleneck,
    ResidualInverted,
    ResidualSequential,
    SqueezeExcitation,
    UpSample,
    residual_design,
)
from odin_tpu.networks.time_delay import (
    StatsPool,
    TimeDelay,
    TimeDelayConv,
    TimeDelayConvTied,
    TimeDelayDense,
    XVectorNet,
)
from odin_tpu.networks.conditional_embedding import (
    DictionaryEmbedding,
    Embedder,
    IdentityEmbedding,
    ProjectionEmbedding,
    RepetitionEmbedding,
    SequentialEmbedding,
    all_embedder,
    get_embedding,
)
from odin_tpu.networks.util_layers import (
    GRU,
    LSTM,
    BatchRenormalization,
    ConditionalEmbedding,
    ConditionalProjection,
    Conv1DTranspose,
    ExpandDims,
    Identity,
    ParallelNetwork,
    PositionalEncoder,
    Reduce,
    DepthToSpace,
    Resampling2D,
    SimpleRNN,
    SkipConnection,
)
from odin_tpu.networks.dropout import DiscreteDropout, DropBlock
