from espresso_tpu.modules.positional import (
    sinusoidal_positions,
    RelativePositionalEmbedding,
)
from espresso_tpu.modules.attention import MultiheadAttention
from espresso_tpu.modules.conv_frontend import ConvFrontend
from espresso_tpu.modules.lstm import LSTM, LSTMCell
from espresso_tpu.modules.conformer import ConformerEncoderLayer

__all__ = [
    "sinusoidal_positions",
    "RelativePositionalEmbedding",
    "MultiheadAttention",
    "ConvFrontend",
    "LSTM",
    "LSTMCell",
    "ConformerEncoderLayer",
]
