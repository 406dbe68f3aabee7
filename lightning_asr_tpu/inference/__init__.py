from .predict import AsrTranslator

__all__ = ["AsrTranslator"]
