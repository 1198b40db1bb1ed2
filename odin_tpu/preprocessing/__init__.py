"""Speech/feature preprocessing (reference: ``odin/preprocessing``)."""
from odin_tpu.preprocessing import audio, kaldi, signal, text, textgrid, video
from odin_tpu.preprocessing.audio import (
    augment_audio,
    logscale_spec,
    pitch_shift,
    time_stretch,
)
from odin_tpu.preprocessing.opensmile import (
    openSMILEf0,
    openSMILEloudness,
    openSMILEpitch,
    openSMILEsad,
)
from odin_tpu.preprocessing.base import (
    AsType,
    set_extractor_debug,
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
    DeviceCorpusProcessor,
    FeatureProcessor,
    batch_speech_features,
    calculate_pca,
    validate_features,
)
from odin_tpu.preprocessing.speech import (
    AcousticNorm,
    ApplyingSAD,
    AudioAugmentor,
    AudioReader,
    BNFExtractor,
    CalculateEnergy,
    CQTExtractor,
    PitchExtractor,
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
    audio_segmenter,
    read_wave,
    read_wave_raw,
)
