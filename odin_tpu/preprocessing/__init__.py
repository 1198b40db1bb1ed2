"""Speech/feature preprocessing (reference: ``odin/preprocessing``)."""
from odin_tpu.preprocessing import signal
from odin_tpu.preprocessing.base import (
    AsType,
    Converter,
    Delete,
    DeltaExtractor,
    Duplicate,
    EqualizeShape0,
    Extractor,
    ExtractorSignal,
    Pipeline,
    Rename,
    RunningStatistics,
    StackFeatures,
    make_pipeline,
)
from odin_tpu.preprocessing.processor import (
    FeatureProcessor,
    batch_speech_features,
    calculate_pca,
    validate_features,
)
from odin_tpu.preprocessing.speech import (
    AcousticNorm,
    ApplyingSAD,
    AudioReader,
    CalculateEnergy,
    Dithering,
    Framing,
    MelsSpecExtractor,
    MFCCsExtractor,
    Power2Db,
    PowerSpecExtractor,
    PreEmphasis,
    RASTAfilter,
    Read3ColSAD,
    SADgmm,
    SADthreshold,
    SpectraExtractor,
    STFTExtractor,
    read_wave,
)
