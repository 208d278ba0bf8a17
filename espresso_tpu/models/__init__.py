from espresso_tpu.models.base import EncoderOut
from espresso_tpu.models import speech_lstm  # noqa: F401 (registration)
from espresso_tpu.models import speech_transformer  # noqa: F401
from espresso_tpu.models import transducer  # noqa: F401
from espresso_tpu.models import lstm_lm  # noqa: F401
from espresso_tpu.models import transformer_lm  # noqa: F401
from espresso_tpu.models import speech_tdnn  # noqa: F401
from espresso_tpu.models import encoder_models  # noqa: F401
from espresso_tpu.models import wav2vec2  # noqa: F401

__all__ = ["EncoderOut"]
