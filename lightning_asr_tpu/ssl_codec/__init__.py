from .confidence import sum_logprob, seq_sum_logprob
from .extractor import Wav2Vec2Extractor, convert_manifest

__all__ = ["sum_logprob", "seq_sum_logprob", "Wav2Vec2Extractor", "convert_manifest"]
