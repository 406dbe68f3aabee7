from .predict import AsrTranslator
from .streaming import StreamingTranscriber

__all__ = ["AsrTranslator", "StreamingTranscriber"]
