from espresso_tpu.features.fbank import (
    fbank,
    fbank_numpy,
    mfcc_numpy,
    num_samples_to_num_frames,
)
from espresso_tpu.features.pallas_fbank import fbank_fused, fbank_pallas
from espresso_tpu.features.cmvn import GlobalCMVN, utterance_cmvn
from espresso_tpu.features.specaugment import (
    SpecAugmentConfig,
    apply_specaugment,
)

__all__ = [
    "fbank",
    "fbank_fused",
    "fbank_pallas",
    "fbank_numpy",
    "mfcc_numpy",
    "num_samples_to_num_frames",
    "GlobalCMVN",
    "utterance_cmvn",
    "SpecAugmentConfig",
    "apply_specaugment",
]
